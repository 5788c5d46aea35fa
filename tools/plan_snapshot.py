"""Snapshot ``explain('formatted')`` for named queries into files.

The r14 optimization-round evidence trail: for each query touched this
round, ``plans/r14/<query>_before.txt`` and ``..._after.txt`` hold the
formatted physical plan the judge can diff against the code's claims
(guide §7.2 — Exchange count, join strategy, PushedFilters/ReadSchema,
Python-eval nodes) without running Spark.

Usage: python -m tools.plan_snapshot <suffix> <query> [query ...]
       [--sf <sf_dir>] [--exec]

``--exec`` runs the query to completion FIRST (a count()) so the
captured plan is AQE's FINAL executed plan — the only place runtime
effects like ReusedExchange, AQEShuffleRead coalescing and join-strategy
switches are visible (guide §7.2).

Writes plans/<round>/<query>_<suffix>.txt (round from $SPARK_GRAFT_PLAN_ROUND, default r15).
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    run_first = "--exec" in args
    if run_first:
        args.remove("--exec")
    suffix, names = args[0], args[1:]
    from smallquery_spark.queries import REGISTRY, load_all
    from smallquery_spark.session import get_session

    load_all()
    spark = get_session("smallquery-plan-snapshot")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r15"))
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        if run_first:
            # collect() executes THIS DataFrame's queryExecution (a
            # count() would wrap it in a new one and leave df's own
            # plan un-finalized), so the explain below carries AQE's
            # final plan — ReusedExchange, AQEShuffleRead, runtime
            # join switches all visible
            df.collect()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(
                f"# {name} — explain('formatted') at {sf_dir} [{suffix}]"
                f"{' (AQE final, post-execution)' if run_first else ''}\n"
            )
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")


if __name__ == "__main__":
    main()
