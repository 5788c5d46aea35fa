"""Top-k operators (SURVEY.md §2 B34, B36).

Global top-k: ``orderBy().limit(k)`` — Catalyst plans
TakeOrderedAndProject: per-partition heap top-k, then a k-way merge of
k-row partial results on the driver. O(n) scan, no global sort — the
right plan at any scale.

Per-group top-k: ``row_number`` over a window partitioned by the group —
one shuffle on the group key, in-partition sort, early filter. For
heavily skewed groups at extreme scale, pre-aggregate with a per-
partition partial top-k first (``mapInPandas`` heap) — not needed at
fixture scale, noted for the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame,
    group: list[str],
    order: list[Column],
    k: int,
    rank_col: str = "rnk",
    keep_rank: bool = True,
) -> DataFrame:
    w = Window.partitionBy(*group).orderBy(*order)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
    return out if keep_rank else out.drop(rank_col)
