"""MERGE (upsert) and SCD2 history — versioned-transformation writes.

The reference's purpose is "versioning control for data transformations"
(/root/reference/README.md:7-8); these are the two standard mutation
shapes a table-versioning engine needs, expressed over plain parquet
with the same atomic-swap discipline as compaction:

- ``merge_upsert`` — Delta-style MERGE: update matched keys, insert
  unmatched; one full-outer-shaped pass (actually a right-priority
  union-dedup: updates win), rewrite, swap.
- ``scd2_apply`` — slowly-changing-dimension type 2: close the current
  row (valid_to = batch_ts) when attributes changed, append the new
  version (valid_from = batch_ts, valid_to = NULL), keep history.

At 100 TB both run per partition of the key space (write partitioned by
bucket(key) and merge only partitions with updates); here the whole-dir
rewrite keeps the semantics identical and the tests oracle-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from smallquery_spark.fsio import fs_for


def _atomic_overwrite(spark: SparkSession, df: DataFrame, path: str) -> None:
    # swap through the Hadoop FileSystem API so MERGE targets on
    # hdfs://-s3a:// warehouses work identically to file:// (fsio); a
    # crash between the renames leaves the aside copy, restored here
    fs = fs_for(spark, path)
    tmp = path.rstrip("/") + ".merge.tmp"
    old = path.rstrip("/") + ".merge.old"
    if not fs.exists(path) and fs.exists(old):
        fs.rename(old, path)
    fs.delete(tmp)
    df.write.mode("overwrite").parquet(tmp)
    fs.delete(old)
    if fs.exists(path):
        fs.rename(path, old)
    fs.rename(tmp, path)
    fs.delete(old)


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key: str,
) -> None:
    """MERGE updates INTO target ON key: matched rows are replaced by the
    update row, unmatched update rows are inserted, untouched target
    rows survive. Implemented as union + per-key priority pick (updates
    rank above current rows) — one shuffle on the key."""
    target = spark.read.parquet(target_path)
    tagged = target.withColumn("__prio", F.lit(0)).unionByName(
        updates.withColumn("__prio", F.lit(1))
    )
    w = Window.partitionBy(key).orderBy(F.col("__prio").desc())
    merged = (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__prio", "__rn")
    )
    _atomic_overwrite(spark, merged, target_path)


def scd2_apply(
    spark: SparkSession,
    dim_path: str,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    batch_ts: str,
) -> None:
    """Type-2 SCD: for keys whose ``attrs`` changed (or are new), close
    the open row (valid_to = batch_ts) and append a new open row.

    The dimension carries (key, *attrs, valid_from, valid_to) with
    valid_to NULL on the current row. Unchanged keys are untouched.
    """
    dim = spark.read.parquet(dim_path)
    ts = F.lit(batch_ts).cast("timestamp")

    cur = dim.filter(F.col("valid_to").isNull())
    hist = dim.filter(F.col("valid_to").isNotNull())

    joined = cur.alias("c").join(
        updates.alias("u"), F.col(f"c.{key}") == F.col(f"u.{key}"), "full"
    )
    changed_or_new = joined.filter(
        F.col(f"c.{key}").isNull()
        | (
            F.col(f"u.{key}").isNotNull()
            & ~F.concat_ws(
                "\x00", *[F.col(f"c.{a}").cast("string") for a in attrs]
            ).eqNullSafe(
                F.concat_ws(
                    "\x00", *[F.col(f"u.{a}").cast("string") for a in attrs]
                )
            )
        )
    )
    changed_keys = changed_or_new.filter(F.col(f"c.{key}").isNotNull()).select(
        F.col(f"c.{key}").alias(key)
    )
    # close current rows for changed keys
    closed = cur.join(changed_keys, key, "left_semi").withColumn("valid_to", ts)
    untouched_cur = cur.join(changed_keys, key, "left_anti")
    # open new rows for changed or brand-new keys
    new_rows = (
        changed_or_new.filter(F.col(f"u.{key}").isNotNull())
        .select(
            F.col(f"u.{key}").alias(key),
            *[F.col(f"u.{a}").alias(a) for a in attrs],
        )
        .withColumn("valid_from", ts)
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
    )
    out = hist.unionByName(closed).unionByName(untouched_cur).unionByName(new_rows)
    _atomic_overwrite(spark, out, dim_path)
