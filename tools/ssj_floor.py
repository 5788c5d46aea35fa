"""Stream-stream join cost decomposition (follow-on to stateful_floor).

b57 is the largest stateful-stream entry on the round-5 scaling curve
(~14s at gen-sf10). Unlike b58 there is no Python in it — the whole
pipeline is JVM — so the question is different: how much of the wall is
the JOIN, and how much is the streaming state machinery (symmetric
hash join state writes for every buffered row on both sides)? Three
pipelines over the SAME data price the layers:

  batch_join     the identical equi+time-range join as a plain batch
                 DataFrame op — the Catalyst floor, zero streaming.
  stream_static  errors side streamed, clicks side static — one scan
                 through micro-batch machinery, but NO join state
                 (static side is just hash-joined per batch).
  stream_stream  the registered b57 — both sides buffered in the state
                 store within the watermark.

All three produce the same matched pairs (asserted on row count).
stream_stream - batch_join is the full price of streamed execution;
its split vs stream_static shows how much is per-side state buffering
rather than micro-batch overhead. At 100 TB the decision rule: if one
side fits as a slowly-changing static table (dims, short windows),
stream-static saves the state-store term entirely.

Usage: python -m tools.ssj_floor [sf_dir] [--out out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

from smallquery_spark.queries import REGISTRY, load_all
from smallquery_spark.queries.registry import (
    ensure_driver_confs,
    normalize_events_ts,
    t,
)
from smallquery_spark.session import get_session
from smallquery_spark.streaming import (
    events_stream,
    run_to_df,
    state_partitions_for,
)


def _timed(fn) -> tuple[float, int]:
    t0 = time.time()
    n = fn().count()
    return round(time.time() - t0, 3), n


def main() -> None:
    argv = sys.argv[1:]
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv):
            raise SystemExit("usage: python -m tools.ssj_floor [sf_dir] [--out out.json]")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    load_all()
    spark = get_session("smallquery-ssj-floor")
    ensure_driver_confs(spark)
    parts = state_partitions_for(sf_dir)

    def _sides_batch():
        ev = normalize_events_ts(t(spark, sf_dir, "events"))
        errors = ev.filter(F.col("event_type") == "error").select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("e_ts"),
        )
        clicks = ev.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        return errors, clicks

    cond = """
        e_user = c_user AND
        c_ts >= e_ts - INTERVAL 10 MINUTES AND
        c_ts <= e_ts
    """

    def batch_join():
        errors, clicks = _sides_batch()
        return errors.join(clicks, F.expr(cond)).select("error_id", "click_id")

    def stream_static():
        errors = (
            events_stream(spark, sf_dir)
            .filter(F.col("event_type") == "error")
            .select(
                F.col("event_id").alias("error_id"),
                F.col("user_id").alias("e_user"),
                F.col("ts").alias("e_ts"),
            )
        )
        _, clicks = _sides_batch()
        joined = errors.join(clicks, F.expr(cond)).select(
            "error_id", "click_id"
        )
        return run_to_df(joined, "ssj_floor_ss", state_partitions=parts)

    def stream_stream():
        return REGISTRY["b57_stream_stream_join"].fn(spark, sf_dir)

    out: dict = {"sf_dir": sf_dir, "state_partitions": parts, "layers": {}}
    rows = {}
    for name, fn in (
        ("batch_join", batch_join),
        ("stream_static", stream_static),
        ("stream_stream", stream_stream),
    ):
        per = []
        for _ in range(2):
            sec, n = _timed(fn)
            per.append(sec)
            rows[name] = n
        out["layers"][name] = {"sec": min(per), "rows": rows[name]}
        print(f"  {name}: {min(per)}s ({rows[name]} rows)", file=sys.stderr)
    assert len(set(rows.values())) == 1, f"row mismatch: {rows}"
    b = out["layers"]["batch_join"]["sec"]
    ss = out["layers"]["stream_static"]["sec"]
    s2 = out["layers"]["stream_stream"]["sec"]
    out["streaming_overhead_sec"] = round(s2 - b, 3)
    out["state_buffering_sec"] = round(s2 - ss, 3)
    line = json.dumps(out)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
