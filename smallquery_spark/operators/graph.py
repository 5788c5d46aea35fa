"""Connected components — the transitive-closure endgame of dedup.

Near-dup detection yields PAIRS (a~b, b~c); the unit of deduplication is
the connected COMPONENT {a,b,c}. This is inherently iterative — Spark
has no native transitive closure — so we run min-label propagation:

    label(v) := min(label(v), min label over neighbors)

repeated until no label changes. Each iteration is one join + one
aggregation (all DataFrame ops, shuffle on vertex id); convergence needs
O(diameter) rounds (pointer-jumping variants cut that to O(log d) at the
cost of heavier rounds — for dedup graphs, whose components are small
and dense, plain propagation converges in a handful of rounds).

The driver-side loop holds only a changed-row COUNT per round — no
vertex data ever reaches the driver. Caching the label frame per round
and unpersisting the previous one keeps lineage short.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """(id, component) with component = min node id in the component.

    ``edges`` are undirected (each pair listed once is enough).

    ``shuffle_partitions`` sizes the per-round join/agg shuffles to the
    LABEL FRAME (one row per vertex), not to the session default — the
    iterative loop pays the per-partition scheduling cost every round,
    so 32 near-empty tasks per round dominate wall-clock on small
    graphs. Callers at cluster scale pass a value proportional to
    vertex count (or None to keep the session conf).
    """
    spark = nodes.sparkSession
    old_parts = None
    if shuffle_partitions is not None:
        old_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        return _cc_loop(nodes, edges, id_col, src, dst, max_iter)
    finally:
        if old_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def _cc_loop(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str,
    src: str,
    dst: str,
    max_iter: int,
) -> DataFrame:
    both = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    # the edge frame is re-joined EVERY round — materialize it once, or
    # an expensive upstream edge builder (all-pairs Jaccard, LSH
    # banding) re-executes per iteration.
    both.cache()

    labels = nodes.select(F.col(id_col).alias("v"), F.col(id_col).alias("lbl"))
    labels.cache()
    for it in range(max_iter):
        # every few rounds, cut the accumulated plan lineage: without
        # this, round N's plan nests N joins and Catalyst analysis cost
        # grows superlinearly on long-diameter graphs.
        if it > 0 and it % 5 == 0:
            labels = labels.localCheckpoint(eager=True)
        # smallest label among each vertex's neighbors this round
        neigh = (
            both.join(labels, both.a == labels.v)
            .groupBy("b")
            .agg(F.min("lbl").alias("nlbl"))
        )
        new_labels = (
            labels.join(neigh, labels.v == neigh.b, "left")
            .select(
                "v",
                F.least(
                    F.col("lbl"), F.coalesce("nlbl", F.col("lbl"))
                ).alias("lbl"),
            )
        )
        new_labels.cache()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "v")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    both.unpersist()
    return labels.select(F.col("v").alias(id_col), F.col("lbl").alias("component"))
