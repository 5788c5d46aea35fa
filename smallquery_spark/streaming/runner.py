"""Structured Streaming plumbing (SURVEY.md §2 B50, B59).

Batch-equivalence harness: every streaming query in the registry runs
with ``trigger(availableNow=True)`` into a memory sink, drains, and the
materialized table is returned as a normal DataFrame — deterministic,
oracle-comparable (SURVEY §5.2: "streaming ops use batch-equivalence
with availableNow triggers"). In production the same pipeline definition
would point at a live source and a real sink; nothing in the dataflow
definition changes.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File stream source over the events fixture (B50).

    Timestamp handling is shared with the batch reader via
    ``registry.normalize_events_ts`` — dtype-adaptive, so either fixture
    generation (nanos-long or µs timestamp) loads identically on the
    batch and stream paths.
    """
    from smallquery_spark.queries.registry import (
        ensure_driver_confs,
        normalize_events_ts,
    )

    ensure_driver_confs(spark)
    # abspath: the symlink target below is resolved relative to the
    # LINK's directory, not the caller's cwd — a relative sf_dir would
    # stage a dangling link and the file source would silently list
    # zero files (batch runs still work because spark.read resolves
    # against cwd, so only the stream goes quietly empty).
    path = os.path.abspath(os.path.join(sf_dir, "events.parquet"))
    # File stream sources read directories; stage one with a symlink to
    # the fixture file (testdata itself is read-only). Re-link each call
    # so a stale link from a previous fixture generation can't survive.
    import tempfile

    from smallquery_spark.queries.tmpdirs import prune_stale, register_cleanup

    prune_stale("smallquery_stream_src_")
    stage_root = register_cleanup(
        os.path.join(
            tempfile.gettempdir(), f"smallquery_stream_src_{os.getpid()}"
        )
    )
    stage = os.path.join(stage_root, os.path.basename(sf_dir.rstrip("/")))
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if os.path.islink(link) or os.path.exists(link):
        os.unlink(link)
    os.symlink(path, link)
    if not os.path.exists(link):  # exists() follows the link
        raise FileNotFoundError(
            f"staged stream source is a dangling link: {link} -> {path}"
        )
    schema = spark.read.parquet(path).schema
    sdf = spark.readStream.schema(schema).format("parquet").load(stage)
    return normalize_events_ts(sdf)


def state_partitions_for(
    sf_dir: str, default: int = 8, cap: int = 32
) -> int:
    """Size stateful-shuffle partitions to source volume.

    Streaming state partitioning is fixed at checkpoint creation, so it
    must be chosen up front: too few starves cores on big inputs (the
    per-row Python state transitions of applyInPandasWithState are the
    wall time), too many wastes a task + a RocksDB store per
    near-empty partition at fixture scale. Production jobs set this
    from key cardinality/throughput at job definition; here the events
    fixture footer row count stands in for that knowledge.
    """
    try:
        import pyarrow.parquet as pq

        rows = pq.ParquetFile(
            os.path.join(sf_dir, "events.parquet")
        ).metadata.num_rows
    except Exception:
        return default
    if rows >= 4_000_000:
        return cap
    if rows >= 1_000_000:
        return max(16, default)
    return default


def run_to_df(
    sdf: DataFrame,
    name: str,
    output_mode: str = "append",
    state_partitions: int = 8,
) -> DataFrame:
    """Drain a streaming DataFrame into a memory table; return the table.

    ``availableNow`` processes everything currently in the source then
    stops — the deterministic test trigger. The memory sink is bounded
    (fixture-scale only); real deployments use files/kafka/foreachBatch.

    ``state_partitions`` sizes the stateful operators: streaming state
    partitioning is FIXED at checkpoint creation from
    ``spark.sql.shuffle.partitions``, so production jobs size it to key
    cardinality and throughput up front (the default 200 — or this
    repo's batch 32 — wastes a task per near-empty state store at
    fixture scale, ~40% of micro-batch wall time). The conf is restored
    for batch queries after the stream drains.
    """
    qname = re.sub(r"[^A-Za-z0-9_]", "_", name)
    spark = sdf.sparkSession
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(qname)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(120)
        finally:
            if q.isActive:
                q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return spark.table(qname)
