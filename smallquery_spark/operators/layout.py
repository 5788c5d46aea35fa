"""Z-order layout — multi-dimensional data clustering for scan pruning.

Sorting a table by one column gives perfect row-group pruning on that
column and none on any other. Interleaving the bits of two (or more)
key columns into one sort key (Morton / Z-order) spreads locality across
ALL of them: every row group then covers a narrow range of EACH
dimension, so min/max row-group stats prune scans filtered on either
column — the Delta OPTIMIZE ZORDER effect in plain Spark.

The key is a pure bitwise column expression (codegen'd, no UDF); the
write is an ordinary repartitionByRange + sortWithinPartitions write.
Effectiveness is MEASURED (tests/test_plans.py) from parquet row-group
stats: mean per-row-group span of each dimension, z-ordered vs
single-column-sorted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative int columns into
    a Morton key (a in even positions, b in odd)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    ca = ca.cast("long")
    cb = cb.cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(ca, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(cb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    a: str,
    b: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` clustered by the Z-order of (a, b): range-partition
    on the key (balanced files), sort within partitions, drop the key."""
    keyed = df.withColumn("__z", zorder_key(a, b, bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def rowgroup_spans(path: str, col_a: str, col_b: str) -> tuple[float, float]:
    """Mean per-row-group (max-min) span of two columns, normalized by
    their global ranges — the pruning-effectiveness metric (lower =
    narrower row groups = more skippable)."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = glob.glob(os.path.join(path, "*.parquet"))
    mins: dict[str, list] = {col_a: [], col_b: []}
    maxs: dict[str, list] = {col_a: [], col_b: []}
    spans: dict[str, list] = {col_a: [], col_b: []}
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            for col in (col_a, col_b):
                stats = rg.column(names.index(col)).statistics
                mins[col].append(stats.min)
                maxs[col].append(stats.max)
                spans[col].append(stats.max - stats.min)
    out = []
    for col in (col_a, col_b):
        rng = max(maxs[col]) - min(mins[col]) or 1
        out.append(sum(spans[col]) / len(spans[col]) / rng)
    return out[0], out[1]
