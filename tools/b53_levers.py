"""b53 session-window churn levers, measured (VERDICT r5 item 2).

The gen100 scaling row put b53 (session windows over ~600M events →
~99M mostly-singleton sessions) at a 16.2x fourth-decade ratio — the
worst stream entry — and SCALING.md NAMED the production levers
without measuring them. This tool measures them:

1. ``partitions`` — state-partition scaling (32/64/128): streaming
   state partitioning is fixed at checkpoint creation; more partitions
   = more parallel state stores (and more per-store overhead).
2. ``eviction`` — watermark-driven eviction: ``withWatermark`` +
   append mode finalizes sessions once the watermark passes their end
   and EVICTS their state, so peak state is open-sessions-sized, not
   corpus-sized. (Complete mode — the oracle-checked b53 shape — can
   never evict and re-emits the full result every epoch.)
3. ``prereduce`` — the in-batch pre-session reduce: foreachBatch
   sessionizes each epoch's events per user with plain BATCH window
   functions (lag/cumsum gaps-and-islands), writes per-epoch session
   SPANS (user, first_ts, last_ts, n), and a final interval gap-merge
   over the spans reconstructs exact global sessions. No streaming
   state store at all; the per-event work is a batch sort/shuffle —
   the thing Spark is already good at. Gap-merge over spans is exact
   (1-D transitive closure under a sorted running-max merge), and the
   tool ASSERTS result equality against the streaming operator's
   output via a full-result checksum.

Usage:
    python -m tools.b53_levers SF_DIR [--runs N] [--out OUT.json]
        [--skip prereduce,eviction,...]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from smallquery_spark.queries.registry import ensure_driver_confs
from smallquery_spark.queries.tmpdirs import prune_stale, register_cleanup
from smallquery_spark.session import get_session
from smallquery_spark.streaming.runner import (
    events_stream,
    run_to_df,
    state_partitions_for,
)

GAP_SEC = 300.0
_ROCKS = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


def _session_agg(spark, sf_dir):
    sdf = events_stream(spark, sf_dir)
    return (
        sdf.groupBy(F.session_window("ts", "5 minutes"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select("user_id", "n_events")
    )


def _checksum(df):
    """Order-free multiset checksum of (user_id, n_events)."""
    r = df.agg(
        F.count("*").alias("n"),
        F.sum("n_events").alias("se"),
        F.sum(F.xxhash64("user_id", "n_events")).alias("h"),
    ).collect()[0]
    return (r["n"], int(r["se"] or 0), int(r["h"] or 0))


def run_streaming(spark, sf_dir, n_parts, provider, mode="complete", staged=None):
    if mode != "complete" and staged is None:
        raise ValueError(
            "append mode requires staged slices; run stage_slices first"
        )
    if provider == "rocksdb":
        spark.conf.set(_PROVIDER_KEY, _ROCKS)
    try:
        if mode == "complete":
            agg = _session_agg(spark, sf_dir)
        else:
            # append: watermark-driven eviction; only closed sessions emit.
            # MUST consume time-ordered slices one per micro-batch — in a
            # single availableNow mega-batch the watermark never advances
            # mid-drain, nothing evicts, and the in-memory store holds the
            # full corpus state PLUS the emit bookkeeping (measured: OOM at
            # gen100/48g where complete mode survived). Eviction is only a
            # lever under steady arrival, which the sliced source models.
            schema = spark.read.parquet(staged).schema
            sdf = (
                spark.readStream.schema(schema)
                .format("parquet")
                .option("maxFilesPerTrigger", "1")
                .load(staged)
                .withWatermark("ts", "10 minutes")
            )
            agg = (
                sdf.groupBy(
                    F.session_window("ts", "5 minutes"), F.col("user_id")
                )
                .agg(F.count("*").alias("n_events"))
                .select("user_id", "n_events")
            )
        t0 = time.time()
        out = run_to_df(
            agg,
            f"b53lev_{mode}_{n_parts}_{provider}",
            output_mode=mode,
            state_partitions=n_parts,
            sink="files",
        )
        cs = _checksum(out)
        return round(time.time() - t0, 3), cs
    finally:
        if provider == "rocksdb":
            spark.conf.unset(_PROVIDER_KEY)


def _epoch_spans(batch_df):
    """Per-user gaps-and-islands WITHIN one epoch (pure batch ops)."""
    w = Window.partitionBy("user_id").orderBy("ts")
    ts = F.col("ts").cast("double")
    prev = F.lag(ts).over(w)
    new_sess = prev.isNull() | ((ts - prev) >= GAP_SEC)
    sid = F.sum(new_sess.cast("int")).over(w)
    return (
        batch_df.withColumn("__sid", sid)
        .groupBy("user_id", "__sid")
        .agg(
            F.min(ts).alias("first_ts"),
            F.max(ts).alias("last_ts"),
            F.count("*").alias("n"),
        )
        .drop("__sid")
    )


def _merge_spans(spans):
    """Exact global sessions from per-epoch spans: sorted running-max
    interval merge with the same >= GAP_SEC split rule."""
    w = Window.partitionBy("user_id").orderBy("first_ts")
    prev_max_end = F.max("last_ts").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_grp = prev_max_end.isNull() | (
        (F.col("first_ts") - prev_max_end) >= GAP_SEC
    )
    gid = F.sum(new_grp.cast("int")).over(w)
    return (
        spans.withColumn("__gid", gid)
        .groupBy("user_id", "__gid")
        .agg(F.sum("n").alias("n_events"))
        .select("user_id", "n_events")
    )


def run_prereduce(spark, sf_dir, n_parts):
    prune_stale("smallquery_b53lev_")
    root = register_cleanup(tempfile.mkdtemp(prefix="smallquery_b53lev_"))
    spans_dir = os.path.join(root, "spans")
    sdf = events_stream(spark, sf_dir)

    def _sink(batch_df, epoch_id):
        epoch_dir = os.path.join(spans_dir, f"epoch_{epoch_id:010d}")
        if os.path.exists(os.path.join(epoch_dir, "_SUCCESS")):
            return
        _epoch_spans(batch_df).write.mode("overwrite").parquet(epoch_dir)

    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
    t0 = time.time()
    try:
        q = (
            sdf.writeStream.foreachBatch(_sink)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            if not q.awaitTermination(3600):
                raise TimeoutError("b53 prereduce did not drain in 3600s")
        finally:
            if q.isActive:
                q.stop()
        spans = spark.read.option("recursiveFileLookup", "true").parquet(
            spans_dir
        )
        sessions = _merge_spans(spans)
        cs = _checksum(sessions)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    return round(time.time() - t0, 3), cs


def main() -> None:
    argv = sys.argv[1:]
    out_path, runs, skip, k_slices = None, 2, set(), 16
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    if "--runs" in argv:
        i = argv.index("--runs")
        runs = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    if "--slices" in argv:
        i = argv.index("--slices")
        k_slices = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    if "--skip" in argv:
        i = argv.index("--skip")
        skip = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"

    spark = get_session("smallquery-b53-levers")
    ensure_driver_confs(spark)
    base_parts = state_partitions_for(sf_dir)

    def timed(fn, *a):
        best, cs = None, None
        for _ in range(runs):
            sec, c = fn(spark, *a)
            best = sec if best is None else min(best, sec)
            cs = c
        return best, cs

    out: dict = {
        "sf_dir": sf_dir,
        "runs": runs,
        "base_state_partitions": base_parts,
        "append_slices": k_slices,
        "levers": {},
    }
    checksums: dict[str, tuple] = {}

    def flush():
        # incremental write: a crashed/OOM'd case must not lose the
        # cases already measured (the first gen100 run did exactly that)
        if out_path:
            with open(out_path, "w") as f:
                f.write(json.dumps(out) + "\n")

    def record(label, fn, *a, checksum_asserted=True):
        try:
            sec, cs = timed(fn, *a)
        except Exception as e:  # noqa: BLE001 — isolate case failures
            out["levers"][label] = None
            out.setdefault("errors", {})[label] = str(e)[:300]
            print(f"  {label}: ERROR {str(e)[:120]}", file=sys.stderr, flush=True)
            flush()
            return
        out["levers"][label] = sec
        if checksum_asserted:
            checksums[label] = cs
        else:
            out.setdefault("append_checksums", {})[label] = cs
        print(f"  {label}: {sec}s cs={cs}", file=sys.stderr, flush=True)
        flush()

    for n in (32, 64, 128):
        for prov in ("hdfs", "rocksdb"):
            label = f"complete_p{n}_{prov}"
            if label in skip or "partitions" in skip and n != base_parts:
                continue
            record(label, run_streaming, sf_dir, n, prov, "complete")

    if "eviction" not in skip:
        from tools.ssj_state_bound import stage_slices

        staged = stage_slices(spark, sf_dir, k_slices)
        for prov in ("hdfs", "rocksdb"):
            label = f"append_wm_p{base_parts}_{prov}"
            # append emits only watermark-closed sessions: checksum is
            # expected to differ from complete mode; recorded, not asserted
            record(
                label,
                run_streaming,
                sf_dir,
                base_parts,
                prov,
                "append",
                staged,
                checksum_asserted=False,
            )

    if "prereduce" not in skip:
        record("prereduce_foreachbatch", run_prereduce, sf_dir, base_parts)

    # every complete-mode/prereduce variant must produce the SAME multiset
    vals = list(checksums.values())
    out["results_identical"] = len(set(vals)) <= 1
    out["checksum"] = vals[0] if vals else None
    if not out["results_identical"]:
        out["checksums"] = {k: list(v) for k, v in checksums.items()}

    line = json.dumps(out)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
