"""Is stream-stream join state corpus-bounded or watermark-bounded?

`SSJ_FLOOR_r5.json` decomposed b57's gen-sf10 cost: ~8s of ~10s is
dual-side state buffering. But that measurement replays the WHOLE
fixture as one availableNow batch — the watermark never advances
mid-run, so both sides buffer every filtered row and peak state equals
the corpus. That is an artifact of single-batch replay, not the
operator's 100 TB posture: in production the source trickles in event
time, the watermark advances every batch, and join state is evicted
down to the watermark window (join range + watermark delay).

This tool measures that directly. It stages the events fixture as K
non-overlapping, time-ordered parquet slices (repartitionByRange on
ts; part-file index = time order; mtimes set in the same order so the
file source consumes them chronologically), then runs the exact b57
join shape while sweeping `maxFilesPerTrigger`:

    1 batch   (all slices at once — the floor study's shape)
    K/2 .. 1 files per trigger (progressively finer event-time steps)

recording wall seconds, batch count, PEAK state rows across batches
(`stateOperators[].numRowsTotal` from query progress), and the output
row count (must be identical in every configuration — time-ordered
slices mean nothing ever arrives behind the watermark, so finer
batching cannot drop rows).

Expected shape (and what `SSJ_STATE_BOUND.json` records): peak state
falls roughly in proportion to the event-time span per batch while
output stays constant; wall rises modestly with per-batch overhead.
That is the measured version of the claim "b57's state term scales
with rate x watermark window, not with corpus size".

Usage:
    python -m tools.ssj_state_bound [sf_dir] [--slices K] [--out FILE]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

from smallquery_spark.queries.registry import (
    ensure_driver_confs,
    normalize_events_ts,
)
from smallquery_spark.queries.tmpdirs import prune_stale, register_cleanup
from smallquery_spark.session import get_session

from smallquery_spark.streaming.runner import state_partitions_for


def stage_slices(spark, sf_dir: str, k: int) -> str:
    """Write events as K time-ordered, non-overlapping parquet slices."""
    prune_stale("smallquery_ssjbound_")
    root = register_cleanup(tempfile.mkdtemp(prefix="smallquery_ssjbound_"))
    out = os.path.join(root, "slices")
    df = normalize_events_ts(
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    )
    # range partition index == time order == part-file index; the file
    # stream source breaks mtime ties by path, but set mtimes
    # explicitly anyway so consumption order is unambiguous.
    (
        df.repartitionByRange(k, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(out)
    )
    parts = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    base = time.time() - 10 * len(parts)
    for i, p in enumerate(parts):
        os.utime(p, (base + 10 * i, base + 10 * i))
    return out


def run_case(spark, staged: str, max_files: int | None, state_partitions: int) -> dict:
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

    root = register_cleanup(tempfile.mkdtemp(prefix="smallquery_ssjbound_"))
    data_dir = os.path.join(root, "out")

    def _sink(batch_df, epoch_id):
        batch_df.write.mode("append").parquet(data_dir)

    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
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
            assert q.awaitTermination(900), "stream did not drain in 900s"
        finally:
            if q.isActive:
                q.stop()
        wall = time.time() - t0
        progress = [p for p in q.recentProgress if p is not None]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)

    state_peaks = [
        op.get("numRowsTotal", 0)
        for p in progress
        for op in (p.get("stateOperators") or [])
    ]
    n_batches = sum(
        1 for p in progress if (p.get("numInputRows") or 0) > 0
    )
    rows = (
        spark.read.parquet(data_dir).count()
        if os.path.isdir(data_dir)
        else 0
    )
    shutil.rmtree(root, ignore_errors=True)
    return {
        "max_files_per_trigger": max_files,
        "batches": n_batches,
        "wall_sec": round(wall, 3),
        "peak_state_rows": max(state_peaks) if state_peaks else 0,
        "output_rows": rows,
    }


def main() -> None:
    argv = sys.argv[1:]
    out_path, k = None, 16
    if "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv):
            raise SystemExit("usage: ssj_state_bound [sf_dir] [--slices K] [--out FILE]")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    if "--slices" in argv:
        i = argv.index("--slices")
        if i + 1 >= len(argv):
            raise SystemExit("usage: ssj_state_bound [sf_dir] [--slices K] [--out FILE]")
        k = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    spark = get_session("smallquery-ssj-state-bound")
    ensure_driver_confs(spark)
    staged = stage_slices(spark, sf_dir, k)
    state_partitions = state_partitions_for(sf_dir)

    # batch-join reference row count (state-free ground truth)
    ev = normalize_events_ts(spark.read.parquet(staged))
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    ref_rows = (
        err.join(
            clk,
            F.expr(
                "e_user = c_user AND c_ts >= e_ts - INTERVAL 10 MINUTES"
                " AND c_ts <= e_ts"
            ),
        ).count()
    )

    sweep, seen = [], set()
    for mf in (None, k // 2, k // 4, k // 8, 1):
        if mf is not None and (mf < 1 or mf >= k or mf in seen):
            continue
        seen.add(mf)
        sweep.append(mf)
    cases = []
    for max_files in sweep:
        case = run_case(spark, staged, max_files, state_partitions)
        case["matches_reference"] = case["output_rows"] == ref_rows
        cases.append(case)
        print(json.dumps(case), flush=True)

    result = {
        "sf_dir": sf_dir,
        "slices": k,
        "state_partitions": state_partitions,
        "reference_rows": ref_rows,
        "cases": cases,
    }
    payload = json.dumps(result, indent=1)
    print(payload)
    if out_path:
        with open(out_path, "w") as f:
            f.write(payload + "\n")


if __name__ == "__main__":
    main()
