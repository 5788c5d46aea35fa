"""Small-files compaction — table maintenance for streaming/incremental
ingest at scale.

Micro-batch sinks (foreachBatch appends, per-trigger parquet writes)
accumulate thousands of small files; scans then pay per-file open cost
and lose row-group pruning. Compaction rewrites a directory to
~target-sized files. At 100 TB this runs per partition (day), only on
partitions whose small-file count crosses a threshold, and swaps the
directory atomically (write to .tmp, rename) — the same contract as
Delta OPTIMIZE / Iceberg rewrite_data_files, expressed in plain Spark.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def dir_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) of a parquet directory."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 8,
) -> tuple[int, int]:
    """Rewrite ``path`` to ceil(total/target) files if it has at least
    ``min_files`` data files. Returns (files_before, files_after).

    The rewrite is a pure repartition-and-write (no shuffle keys: file
    sizing only → ``coalesce`` would skip even the sizing shuffle but
    can under-parallelize the read; ``repartition`` keeps the read wide
    and pays one round-robin shuffle, the right trade for a maintenance
    job).
    """
    before, total = dir_stats(path)
    if before < min_files:
        return before, before
    n_out = max(1, math.ceil(total / target_file_bytes))
    tmp = path.rstrip("/") + ".compact.tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    spark.read.parquet(path).repartition(n_out).write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + ".compact.old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    after, _ = dir_stats(path)
    return before, after
