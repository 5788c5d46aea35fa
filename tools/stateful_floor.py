"""applyInPandasWithState cost decomposition (VERDICT r4 item 1).

b58's per-row Python money fold was removed in round 5 (cents are cast
JVM-side, the fold is two vectorized pandas reductions). What remains
is the cost of the API itself. This tool prices each layer at a given
fixture scale by timing four pipelines over the SAME event stream:

  passthrough   stream -> projection -> memory sink (no stateful op):
                source + micro-batch + sink cost.
  groupby_jvm   stream -> groupBy(user).count() (complete mode): the
                built-in stateful aggregation — everything stays JVM.
  state_noop    applyInPandasWithState whose fold does NOTHING (no
                state read/write, emits one constant row per key):
                adds the Arrow round-trip + one Python call per
                (key, batch) — the irreducible API transport floor.
  state_real    the b58 fold (count + cents sum, state get/update).

floor_delta = state_noop - groupby_jvm is what ANY Python stateful op
pays regardless of fold logic; real_delta = state_real - state_noop is
the actual fold + state-store cost, which is all that optimization can
still touch. At 100 TB the decision rule: if the fold is expressible as
a built-in agg, groupby_jvm prices the saving from expressing it so.

Usage: python -m tools.stateful_floor [sf_dir] [--out out.json]
"""

from __future__ import annotations

import json
import sys
import time

import pandas as pd
from pyspark.sql import functions as F

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
            raise SystemExit("--out needs a value")
        out_path = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"

    spark = get_session("stateful-floor")
    spark.range(1).count()
    parts = state_partitions_for(sf_dir)

    def passthrough():
        sdf = events_stream(spark, sf_dir).select(
            "user_id",
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
        return run_to_df(sdf, "floor_pass", state_partitions=parts)

    def groupby_jvm():
        sdf = events_stream(spark, sf_dir).select("user_id", "value")
        agg = sdf.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("total_value_cents"),
        )
        return run_to_df(
            agg, "floor_jvm", output_mode="complete", state_partitions=parts
        )

    def state_noop():
        from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

        def noop(key, pdfs, state: GroupState):
            for _ in pdfs:
                pass
            yield pd.DataFrame({"user_id": [key[0]], "one": [1]})

        sdf = events_stream(spark, sf_dir).select("user_id")
        out = sdf.groupBy("user_id").applyInPandasWithState(
            noop,
            outputStructType="user_id long, one int",
            stateStructType="n long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        return run_to_df(
            out, "floor_noop", output_mode="update", state_partitions=parts
        )

    def state_real():
        from smallquery_spark.queries import REGISTRY, load_all

        load_all()
        return REGISTRY["b58_stream_stateful"].fn(spark, sf_dir)

    result: dict = {"sf_dir": sf_dir, "state_partitions": parts}
    for name, fn in (
        ("passthrough", passthrough),
        ("groupby_jvm", groupby_jvm),
        ("state_noop", state_noop),
        ("state_real", state_real),
    ):
        runs = [_timed(fn) for _ in range(2)]
        result[name] = {"sec": min(r[0] for r in runs), "rows": runs[-1][1]}
        print(f"{name}: {result[name]}", file=sys.stderr, flush=True)
    result["floor_delta_sec"] = round(
        result["state_noop"]["sec"] - result["groupby_jvm"]["sec"], 3
    )
    result["fold_delta_sec"] = round(
        result["state_real"]["sec"] - result["state_noop"]["sec"], 3
    )
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
