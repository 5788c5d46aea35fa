"""Bucketed range join (SURVEY.md §2 B19/B21) — scale-safe theta join.

A raw inequality join in Spark plans as BroadcastNestedLoopJoin —
quadratic work that dies at scale. When the range predicate has a
bounded width (``r.t - l.t ∈ [lower, upper]``), the standard
distributed decomposition is:

1. bucket both sides by time, bucket width = band width;
2. explode the probe side into the two buckets any in-band partner can
   occupy;
3. equi-join on (keys…, bucket) — a plain shuffled hash join Catalyst
   optimizes — then re-apply the exact band predicate as a filter.

Cost: 2x probe-side duplication but hash-join complexity O(n+m) instead
of the O(n·m) nested loop. Same decomposition Flink interval joins and
Databricks' range-join optimization use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def banded_time_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    lower_seconds: float,
    upper_seconds: float,
    how: str = "inner",
    suffix: str = "_r",
) -> DataFrame:
    """Join rows where ``right_time - left_time ∈ [lower, upper]`` seconds
    plus optional equi-keys ``on``. Right columns are renamed with
    ``suffix`` when they collide with left names (keys are kept once).
    Works for self-joins (sides are re-aliased internally).
    """
    width = float(upper_seconds - lower_seconds)
    if width <= 0:
        raise ValueError("upper must exceed lower")

    # Rename the right side up front: no lineage ambiguity on self-joins.
    ren = {
        c: (c + suffix if c in left.columns else c) for c in right.columns
    }
    rightr = right.select(*[F.col(c).alias(ren[c]) for c in right.columns])
    r_time = ren[right_time]

    l_sec = F.col(left_time).cast("double")
    r_sec = F.col(r_time).cast("double")

    lb = left.withColumn(
        "__bucket",
        F.explode(
            F.array(
                F.floor((l_sec + F.lit(lower_seconds)) / width),
                F.floor((l_sec + F.lit(lower_seconds)) / width) + 1,
            )
        ),
    )
    rb = rightr.withColumn("__bucket", F.floor(r_sec / width))
    joined = lb.join(
        rb,
        on=[lb["__bucket"] == rb["__bucket"]]
        + [F.col(k) == F.col(ren[k]) for k in on],
        how=how,
    )
    delta = F.col(r_time).cast("double") - F.col(left_time).cast("double")
    out = joined.filter(
        (delta >= F.lit(lower_seconds)) & (delta <= F.lit(upper_seconds))
    )
    drop_cols = [lb["__bucket"], rb["__bucket"]] + [
        F.col(ren[k]) for k in on if ren[k] != k
    ]
    for d in drop_cols:
        out = out.drop(d)
    # dedup pairs matched in both exploded buckets cannot occur: a given
    # (l, r) pair matches exactly one bucket equality since r has one bucket.
    return out
