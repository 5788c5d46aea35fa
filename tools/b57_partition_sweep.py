"""b57 stream-stream-join shuffle/state partition sweep (r15, VERDICT
r14 #7): the slowest bench query has sat at its microbatch floor since
r8; its stateful shuffle runs at ``state_partitions_for`` = 8 at sf0.1
(100k events). Every partition costs a task + a state store INSTANCE
per microbatch on EACH of the join's buffers, so at fixture scale the
floor may simply be partition-count overhead. This sweeps the count
with the declared methodology intact (same dataflow, same availableNow
trigger, same memory sink, same watermarks — only
``spark.sql.shuffle.partitions`` for the stateful operator changes,
which is the documented sizing knob production jobs set per workload).

Round-robin over the counts x repeats so box drift decorrelates from
the sweep variable; compare per-count MIN.

Usage: python -m tools.b57_partition_sweep [--counts 2,4,8,16,32]
       [--reps 3] [--sf /root/testdata/sf0.1] [--out B57_SWEEP_r15.json]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    args = sys.argv[1:]

    def _opt(name, default, cast=str):
        return cast(args[args.index(name) + 1]) if name in args else default

    counts = [
        int(c) for c in _opt("--counts", "2,4,8,16,32").split(",")
    ]
    reps = int(_opt("--reps", "3"))
    sf_dir = _opt("--sf", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = _opt("--out", os.path.join(here, "B57_SWEEP_r15.json"))

    from pyspark.sql import functions as F

    from smallquery_spark.session import get_session
    from smallquery_spark.streaming import events_stream, run_to_df

    spark = get_session("b57-partition-sweep")

    def run_b57(n_partitions: int) -> float:
        """The exact b57 dataflow (queries/streaming_queries.py) with a
        parameterized stateful partition count; returns drain wall."""
        errors = (
            events_stream(spark, sf_dir)
            .filter(F.col("event_type") == "error")
            .select(
                F.col("event_id").alias("error_id"),
                F.col("user_id").alias("e_user"),
                F.col("ts").alias("e_ts"),
            )
            .withWatermark("e_ts", "30 minutes")
        )
        clicks = (
            events_stream(spark, sf_dir)
            .filter(F.col("event_type") == "click")
            .select(
                F.col("event_id").alias("click_id"),
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("c_ts"),
            )
            .withWatermark("c_ts", "30 minutes")
        )
        joined = errors.join(
            clicks,
            F.expr(
                "e_user = c_user AND c_ts >= e_ts - INTERVAL 10 MINUTES"
                " AND c_ts <= e_ts"
            ),
        ).select("error_id", "click_id")
        t0 = time.time()
        out = run_to_df(joined, "b57_sweep", state_partitions=n_partitions)
        n = out.count()
        wall = round(time.time() - t0, 3)
        assert n > 0
        return wall

    walls: dict[int, list[float]] = {c: [] for c in counts}
    run_b57(counts[0])  # untimed: one-time plan/codegen warm-up
    for _ in range(reps):
        for c in counts:
            walls[c].append(run_b57(c))
    record = {
        "sf_dir": sf_dir,
        "reps": reps,
        "walls": {str(c): walls[c] for c in counts},
        "min_sec": {str(c): min(walls[c]) for c in counts},
        "note": "same declared dataflow/trigger/sink; only the stateful"
        " shuffle-partition count varies (the documented production"
        " sizing knob). Per-count MIN is the comparison statistic on"
        " this co-loaded box.",
    }
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    print(json.dumps(record["min_sec"]))
    print(f"-> {out_path}")


if __name__ == "__main__":
    main()
