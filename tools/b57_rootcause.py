"""Root-cause b57's RocksDB 3.0x overhead at gen100 (VERDICT r5 item 3).

STATESTORE_gen100.json measured the stream-stream join at 38.1 s under
the default provider vs 114.7 s under RocksDB (changelog trims only to
101.2 s) — inverting the gen10 "changelog ~ par" story. The structural
suspect: under join state format v1/v2 each join PARTITION carries
FOUR independent state stores (keyToNumValues + keyWithIndexToValue
for each side), so 32 partitions = 128 RocksDB instances, each paying
open/commit/checkpoint per batch. Spark 4's format v3 collapses them
into virtual column families of ONE store per partition (RocksDB
only).

This tool measures, per condition:
- wall seconds (availableNow drain of the exact b57 join shape)
- stateOperators rows/metrics from query progress
- summed RocksDB customMetrics (commit/checkpoint/compact latencies,
  bytes written, ...) — i.e. WHICH store phase dominates

across a grid of {provider} x {join stateFormatVersion} x {state
partitions} x {changelog}, with fresh checkpoints per run (format
version is fixed at checkpoint creation). Optionally over a
time-sliced staged source with maxFilesPerTrigger (the
ssj_state_bound trigger ladder) to separate single-batch replay from
multi-batch watermark-advancing operation.

Usage:
    python -m tools.b57_rootcause SF_DIR [--slices K] [--mft a,b]
        [--out OUT.json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

from pyspark.sql import functions as F

from smallquery_spark.queries.registry import ensure_driver_confs
from smallquery_spark.queries.tmpdirs import prune_stale, register_cleanup
from smallquery_spark.session import get_session
from smallquery_spark.streaming.runner import state_partitions_for
from tools.ssj_state_bound import stage_slices

_ROCKS = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
_FMT_KEY = "spark.sql.streaming.join.stateFormatVersion"
_CHANGELOG_KEY = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)


def run_case(
    spark,
    staged: str,
    max_files: int | None,
    state_partitions: int,
    provider: str,
    fmt_version: int | None,
    changelog: bool,
) -> dict:
    schema = spark.read.parquet(staged).schema

    def side(event_type: str, id_alias: str, user: str, ts: str):
        reader = spark.readStream.schema(schema).format("parquet")
        if max_files is not None:
            reader = reader.option("maxFilesPerTrigger", str(max_files))
        sdf = reader.load(staged)
        return (
            sdf.filter(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(id_alias),
                F.col("user_id").alias(user),
                F.col("ts").alias(ts),
            )
            .withWatermark(ts, "30 minutes")
        )

    errors = side("error", "error_id", "e_user", "e_ts")
    clicks = side("click", "click_id", "c_user", "c_ts")
    joined = errors.join(
        clicks,
        F.expr(
            "e_user = c_user AND c_ts >= e_ts - INTERVAL 10 MINUTES"
            " AND c_ts <= e_ts"
        ),
    ).select("error_id", "click_id")

    root = register_cleanup(tempfile.mkdtemp(prefix="smallquery_b57rc_"))
    data_dir = os.path.join(root, "out")

    def _sink(batch_df, epoch_id):
        epoch_dir = os.path.join(data_dir, f"epoch_{epoch_id:010d}")
        if not os.path.exists(os.path.join(epoch_dir, "_SUCCESS")):
            batch_df.write.mode("overwrite").parquet(epoch_dir)

    saved = {}
    confs = {"spark.sql.shuffle.partitions": str(state_partitions)}
    if provider == "rocksdb":
        confs[_PROVIDER_KEY] = _ROCKS
        confs[_CHANGELOG_KEY] = "true" if changelog else "false"
    if fmt_version is not None:
        confs[_FMT_KEY] = str(fmt_version)
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)

    t0 = time.time()
    try:
        q = (
            joined.writeStream.foreachBatch(_sink)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(3600), "stream did not drain in 3600s"
        finally:
            if q.isActive:
                q.stop()
        wall = round(time.time() - t0, 3)
        progress = [p for p in q.recentProgress if p is not None]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    ops = [
        op for p in progress for op in (p.get("stateOperators") or [])
    ]
    metrics: dict[str, int] = {}
    for op in ops:
        for k, v in (op.get("customMetrics") or {}).items():
            if isinstance(v, (int, float)):
                metrics[k] = metrics.get(k, 0) + int(v)
    rows = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(data_dir)
        .count()
        if os.path.isdir(data_dir)
        else 0
    )
    keep = {
        k: v
        for k, v in metrics.items()
        if any(
            s in k.lower()
            for s in (
                "commit", "checkpoint", "compact", "byteswritten",
                "fileswritten", "load", "snapshot", "pause", "flush",
            )
        )
    }
    return {
        "wall_sec": wall,
        "batches": sum(1 for p in progress if (p.get("numInputRows") or 0) > 0),
        "out_rows": rows,
        "state_rows_total": sum(op.get("numRowsTotal", 0) for op in ops),
        "state_rows_updated": sum(op.get("numRowsUpdated", 0) for op in ops),
        "custom_metrics": dict(sorted(keep.items())),
    }


def main() -> None:
    argv = sys.argv[1:]
    out_path, k_slices, mfts = None, 8, [None]
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    if "--slices" in argv:
        i = argv.index("--slices")
        k_slices = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    if "--mft" in argv:
        i = argv.index("--mft")
        mfts = [
            None if x in ("0", "none") else int(x)
            for x in argv[i + 1].split(",")
        ]
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"

    spark = get_session("smallquery-b57-rootcause")
    ensure_driver_confs(spark)
    prune_stale("smallquery_ssjbound_")
    staged = stage_slices(spark, sf_dir, k_slices)
    base_p = state_partitions_for(sf_dir)

    # (label, provider, fmt, partitions, changelog)
    conditions = [
        (f"hdfs_v2_p{base_p}", "hdfs", 2, base_p, False),
        (f"rocksdb_v2_p{base_p}_snapshot", "rocksdb", 2, base_p, False),
        (f"rocksdb_v2_p{base_p}_changelog", "rocksdb", 2, base_p, True),
        (f"rocksdb_v3_p{base_p}_changelog", "rocksdb", 3, base_p, True),
        (f"rocksdb_v3_p{base_p}_snapshot", "rocksdb", 3, base_p, False),
        ("rocksdb_v2_p8_changelog", "rocksdb", 2, 8, True),
        (f"rocksdb_v2_p{base_p * 2}_changelog", "rocksdb", 2, base_p * 2, True),
        ("hdfs_v2_p8", "hdfs", 2, 8, False),
    ]

    out: dict = {"sf_dir": sf_dir, "slices": k_slices, "cases": {}}
    for mft in mfts:
        for label, prov, fmt, parts, chlog in conditions:
            key = f"{label}_mft{mft if mft is not None else 'all'}"
            try:
                res = run_case(spark, staged, mft, parts, prov, fmt, chlog)
            except Exception as e:  # e.g. unsupported format version
                res = {"error": str(e)[:500]}
            out["cases"][key] = res
            print(
                f"  {key}: {res.get('wall_sec', res.get('error'))}",
                file=sys.stderr,
                flush=True,
            )

    # overhead ratios vs the hdfs baseline at the same mft
    for mft in mfts:
        tag = f"mft{mft if mft is not None else 'all'}"
        base = out["cases"].get(f"hdfs_v2_p{base_p}_{tag}", {}).get("wall_sec")
        if not base:
            continue
        out.setdefault("ratio_vs_hdfs", {})[tag] = {
            k: round(v["wall_sec"] / base, 2)
            for k, v in out["cases"].items()
            if k.endswith(tag) and "wall_sec" in v
        }

    line = json.dumps(out)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
