"""Bucketed co-located joins — shuffle-free fact⋈fact at scale.

The one join shape AQE cannot rescue at 100 TB is fact⋈fact on a high-
cardinality key (orders⋈lineitem on orderkey): both sides shuffle every
run. Bucketing pays that shuffle ONCE at write time: both tables are
written `bucketBy(n, key)` + `sortBy(key)` into the warehouse, and every
subsequent join on the key is a zero-Exchange sort-merge join (Spark
reads each bucket pair co-located).

Cluster posture: bucket count should be a multiple of total executor
cores and sized so one bucket of the bigger table fits in memory
(~100-500 MB of parquet per bucket); both tables MUST use the same
count. Spark's bucketing is hash(key) % n with its own Murmur3 hash —
both sides must be written by Spark (Hive-bucketed files don't match).

Reference grounding: the reference versions *transformations* over
datasets (/root/reference/README.md:7-8); a bucketed copy is exactly
such a derived, versioned artifact — pay-once layout for repeated query
workloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed managed table (overwrite).

    Pre-repartitioning by the bucket key onto ``n_buckets`` partitions
    gives exactly ONE file per bucket, so bucket-sorted reads skip the
    per-file merge sort as well as the exchange.
    """
    from pyspark.sql import functions as F

    df = df.repartition(n_buckets, F.col(key))
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key.

    With matching bucket specs the planner emits SortMergeJoin with NO
    Exchange on either side (asserted in tests/test_plans.py). Callers
    must keep `spark.sql.sources.bucketing.enabled=true` (default).
    """
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, on=key, how=how)
