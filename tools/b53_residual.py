"""b53 warm-rerun residual: isolate the attributed causes (VERDICT r7
item 6).

B53_LC_ANOM.json left one loose end: with the unload_state_stores fix,
back-to-back gen100 b53 runs in one 48 g JVM still CLIMB (54.2 → 65.0
→ 83.7 s, n=3) and the residual was *attributed* — not verified — to
files-sink writeback and shuffle-file cleaner lag. This tool runs the
same workload N times back-to-back under controlled variants that
remove one suspected mechanism at a time:

- ``baseline``      — the engine's documented posture for repeated
                      corpus-sized drains (r9): ``sink_scope`` — drain
                      to files, consume inside the scope, sink root
                      deleted on exit. (run_to_df's default rotation
                      is size-gated and correctly REFUSES to rotate a
                      result this big: a localCheckpoint of the ~99M
                      -row frame pinned gigabytes of block-manager
                      memory per run and measured a 2.22× climb, then
                      a JVM death at 4 runs — the first cut of this
                      very measurement.)
- ``keep_sink``     — rotate_sink=False: the pre-r9 behavior. Each
                      run leaves its sink tmpdir (≈1-2 GB of fresh
                      parquet + checkpoint) on disk until process
                      exit — the variant that exhibited the climb.
- ``rm_sink``       — rotate_sink=False + delete each run's
                      sink/checkpoint tmpdir manually right after the
                      checksum. If the climb is accumulated
                      dirty-page writeback / page-cache displacement
                      from retained sink dirs, this flattens it.
- ``gc_nudge``      — System.gc() + 8 s pause after each run. Spark's
                      ContextCleaner cleans shuffle files only when
                      the driver GC collects their references; a
                      ~55 s run in a 48 g heap may never trigger a
                      full GC, so shuffle dirs from run k are still on
                      disk (and in page cache) during run k+1. If the
                      climb is cleaner lag, this flattens it.
- ``rm_sink_gc``    — both removals together (the candidate posture).
- ``nosink``        — foreachBatch counts rows, writes nothing: no
                      parquet write, no read-back, no sink dirs. The
                      lower bound — isolates the aggregation+state
                      cost every variant shares.

Each variant runs in its OWN subprocess (fresh JVM) so heap aging in
one variant cannot contaminate the next; the parent assembles the
artifact. Timed region per run: stream drain + checksum (matching the
B53_LC_ANOM numbers).

Usage:
    python -m tools.b53_residual SF_DIR [--runs N] [--out OUT.json]
        [--variant V]          # internal: run one variant, print JSON
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

VARIANTS = (
    "baseline",
    "keep_sink",
    "rm_sink",
    "gc_nudge",
    "rm_sink_gc",
    "nosink",
)


def _run_variant(sf_dir: str, variant: str, n_runs: int) -> dict:
    from pyspark.sql import functions as F

    from smallquery_spark.queries.registry import ensure_driver_confs
    from smallquery_spark.session import get_session
    from smallquery_spark.streaming.runner import (
        events_stream,
        run_to_df,
        state_partitions_for,
    )

    spark = get_session(f"smallquery-b53res-{variant}")
    ensure_driver_confs(spark)
    n_parts = state_partitions_for(sf_dir)
    tmp = tempfile.gettempdir()

    def _sink_dirs() -> set[str]:
        return set(glob.glob(os.path.join(tmp, "smallquery_runsink_*")))

    walls: list[float] = []
    checksums: list[tuple] = []
    for i in range(n_runs):
        before = _sink_dirs()
        sdf = events_stream(spark, sf_dir)
        agg = (
            sdf.groupBy(F.session_window("ts", "5 minutes"), F.col("user_id"))
            .agg(F.count("*").alias("n_events"))
            .select("user_id", "n_events")
        )
        t0 = time.time()
        if variant == "nosink":
            counts: list[int] = []

            def _count_sink(batch_df, epoch_id):
                counts.append(batch_df.count())

            old = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
            try:
                q = (
                    agg.writeStream.foreachBatch(_count_sink)
                    .outputMode("complete")
                    .option(
                        "checkpointLocation",
                        tempfile.mkdtemp(prefix="smallquery_b53res_ckpt_"),
                    )
                    .trigger(availableNow=True)
                    .start()
                )
                try:
                    assert q.awaitTermination(600)
                finally:
                    if q.isActive:
                        q.stop()
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", old)
                from smallquery_spark.streaming.runner import (
                    unload_state_stores,
                )

                unload_state_stores(spark)
            cs = (counts[-1] if counts else 0,)
        elif variant == "baseline":
            # the engine's corpus-sized posture: consume inside the
            # scope, sink deleted on exit (see module docstring)
            from smallquery_spark.streaming.runner import sink_scope

            with sink_scope(
                agg,
                f"b53res_{variant}_{i}",
                output_mode="complete",
                state_partitions=n_parts,
                sink="files",
            ) as out:
                r = out.agg(
                    F.count("*").alias("n"),
                    F.sum("n_events").alias("se"),
                    F.sum(F.xxhash64("user_id", "n_events")).alias("h"),
                ).collect()[0]
            cs = (r["n"], int(r["se"] or 0), int(r["h"] or 0))
        else:
            out = run_to_df(
                agg,
                f"b53res_{variant}_{i}",
                output_mode="complete",
                state_partitions=n_parts,
                sink="files",
                rotate_sink=False,
            )
            r = out.agg(
                F.count("*").alias("n"),
                F.sum("n_events").alias("se"),
                F.sum(F.xxhash64("user_id", "n_events")).alias("h"),
            ).collect()[0]
            cs = (r["n"], int(r["se"] or 0), int(r["h"] or 0))
        walls.append(round(time.time() - t0, 3))
        checksums.append(cs)
        if variant in ("rm_sink", "rm_sink_gc"):
            for d in _sink_dirs() - before:
                shutil.rmtree(d, ignore_errors=True)
        if variant in ("gc_nudge", "rm_sink_gc"):
            spark._jvm.System.gc()
            time.sleep(8.0)
        print(
            f"  {variant} run{i + 1}: {walls[-1]}s cs={cs}",
            file=sys.stderr,
            flush=True,
        )
    return {
        "walls_sec": walls,
        "climb_last_over_first": (
            round(walls[-1] / walls[0], 2) if len(walls) >= 2 else None
        ),
        "results_identical": len(set(checksums)) <= 1,
    }


def main() -> None:
    argv = sys.argv[1:]
    out_path, n_runs, variant = None, 4, None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    if "--runs" in argv:
        i = argv.index("--runs")
        n_runs = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    if "--variant" in argv:
        i = argv.index("--variant")
        variant = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    run_variants = VARIANTS
    if "--variants" in argv:
        i = argv.index("--variants")
        run_variants = tuple(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"

    if variant is not None:
        print(json.dumps(_run_variant(sf_dir, variant, n_runs)))
        return

    from tools.diskguard import preflight

    disk = preflight(15)
    out: dict = {
        "sf_dir": sf_dir,
        "runs_per_variant": n_runs,
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "disk_preflight": disk,
        "variants": {},
    }
    for v in run_variants:
        # fresh JVM per variant: heap aging must not leak across cases
        proc = subprocess.run(
            [
                sys.executable,
                "-m",
                "tools.b53_residual",
                sf_dir,
                "--runs",
                str(n_runs),
                "--variant",
                v,
            ],
            capture_output=True,
            text=True,
            timeout=3600,
        )
        try:
            out["variants"][v] = json.loads(proc.stdout.strip().splitlines()[-1])
        except Exception:
            err = proc.stderr or proc.stdout
            # keep the HEAD too: Spark exceptions lead with the error
            # class and end in a py4j stack — a tail-only slice once
            # cost this tool its root cause
            out["variants"][v] = {
                "error": err[:1200] + (" ... " + err[-400:] if len(err) > 1600 else "")
            }
        print(f"{v}: {out['variants'][v]}", file=sys.stderr, flush=True)
        if out_path:
            with open(out_path, "w") as f:
                f.write(json.dumps(out) + "\n")
    print(json.dumps(out))
    if out_path:
        with open(out_path, "w") as f:
            f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
