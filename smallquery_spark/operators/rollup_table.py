"""Time-bucket rollup materialization ("hypertable rollup" shape).

A continuous-aggregate pattern: materialize a coarse time-bucketed
pre-aggregate of an event table once, then answer bucket-aligned
queries from the (tiny) rollup instead of the raw data. Classic
TimescaleDB/Druid shape, expressed as plain Spark:

- the rollup stores ALGEBRAIC partials (count, decimal sum, min, max)
  per (bucket, dims…) — any coarser regrouping (by day from an hourly
  rollup, by one dim from a two-dim rollup) recombines exactly;
- refresh is idempotent per bucket: overwrite the bucket partition
  (`partitionBy(bucket)` + dynamic overwrite at scale);
- correctness contract: query(rollup) == query(raw) for bucket-aligned
  questions — that is the oracle check in the tierc/rollup queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(18,2)"


def build_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    bucket: str = "1 hour",
    dims: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Aggregate raw events into (bucket_start, dims…, partials)."""
    dims = dims or []
    return (
        events.groupBy(
            F.window(ts_col, bucket).alias("__w"), *dims
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col(value_col).cast(_DEC)).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(F.col("__w.start").alias("bucket_start"), *dims, "n",
                "sum_value", "min_value", "max_value")
    )


def materialize_rollup(
    events: DataFrame,
    path: str,
    ts_col: str = "ts",
    bucket: str = "1 hour",
    dims: list[str] | None = None,
    value_col: str = "value",
) -> None:
    """Write the rollup partitioned by day-of-bucket (so per-day refresh
    overwrites only affected partitions at scale)."""
    roll = build_rollup(events, ts_col, bucket, dims, value_col).withColumn(
        "bucket_date", F.to_date("bucket_start")
    )
    roll.write.mode("overwrite").partitionBy("bucket_date").parquet(path)


def query_rollup(
    spark,
    path: str,
    regroup_bucket: str | None = None,
    dims: list[str] | None = None,
) -> DataFrame:
    """Answer from the materialized rollup, optionally regrouping to a
    coarser bucket (partials recombine exactly)."""
    roll = spark.read.parquet(path)
    dims = dims or []
    if regroup_bucket is None:
        return roll
    return (
        roll.groupBy(F.window("bucket_start", regroup_bucket).alias("__w"), *dims)
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        .select(F.col("__w.start").alias("bucket_start"), *dims, "n",
                "sum_value", "min_value", "max_value")
    )
