"""Same-session partition-count isolation for the SIZED stateful bench
queries (r15, follows B57_SWEEP_r15.json): runs b53/b57/b58's exact
dataflows at alternating stateful-partition counts inside one session,
round-robin x reps, so the ONLY variable is the count — the cross-tree
process-level A/B proved too noisy for this question on this box.

Usage: python -m tools.state_parts_ab [--counts 4,8] [--reps 3]
       [--sf /root/testdata/sf0.1] [--out STATE_PARTS_AB_r15.json]
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

    counts = [int(c) for c in _opt("--counts", "4,8").split(",")]
    reps = int(_opt("--reps", "3"))
    sf_dir = _opt("--sf", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = _opt(
        "--out", os.path.join(here, "STATE_PARTS_AB_r15.json")
    )

    import pandas as pd
    from pyspark.sql import functions as F

    from smallquery_spark.session import get_session
    from smallquery_spark.streaming import events_stream, run_to_df

    spark = get_session("state-parts-ab")

    def b53(p: int) -> None:
        sdf = events_stream(spark, sf_dir)
        agg = (
            sdf.groupBy(
                F.session_window("ts", "5 minutes").alias("w"), F.col("user_id")
            )
            .agg(F.count("*").alias("n"))
            .select("user_id", F.col("w.start").alias("ws"), "n")
        )
        run_to_df(agg, "ab53", output_mode="complete", state_partitions=p).count()

    def b57(p: int) -> None:
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
        run_to_df(joined, "ab57", state_partitions=p).count()

    def b58(p: int) -> None:
        from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

        def track(key, pdfs, state: GroupState):
            n, cents = state.get if state.exists else (0, 0)
            for pdf in pdfs:
                n += len(pdf)
                cents += int(pdf["cents"].sum())
            state.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "cents": [cents]}
            )

        sdf = events_stream(spark, sf_dir).select(
            "user_id",
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
        out = sdf.groupBy("user_id").applyInPandasWithState(
            track,
            outputStructType="user_id long, n_events long, cents long",
            stateStructType="n long, cents long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        run_to_df(out, "ab58", output_mode="update", state_partitions=p).count()

    shapes = {"b53": b53, "b57": b57, "b58": b58}
    walls: dict[str, dict[int, list[float]]] = {
        s: {c: [] for c in counts} for s in shapes
    }
    for fn in shapes.values():  # untimed warm-up (codegen per shape)
        fn(counts[0])
    for _ in range(reps):
        for c in counts:
            for s, fn in shapes.items():
                t0 = time.time()
                fn(c)
                walls[s][c].append(round(time.time() - t0, 3))
    record = {
        "sf_dir": sf_dir,
        "reps": reps,
        "walls": {s: {str(c): w for c, w in per.items()} for s, per in walls.items()},
        "min_sec": {
            s: {str(c): min(w) for c, w in per.items()}
            for s, per in walls.items()
        },
        "note": "same-session round-robin — the only variable is the"
        " stateful shuffle-partition count; per-count MIN compares",
    }
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    print(json.dumps(record["min_sec"]))
    print(f"-> {out_path}")


if __name__ == "__main__":
    main()
