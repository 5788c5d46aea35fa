"""Plan-smell audit over the ENTIRE query registry (optimization guide
§7.2 applied mechanically, not just to the bench headline set).

For every registered query, build its DataFrame at a small SF and
capture ``explain('formatted')``; flag the plan shapes that do not
survive 100x scale:

- ``BatchEvalPython`` — a row-at-a-time Python UDF on the path (guide
  §4: should be a built-in, Arrow UDF, or mapInArrow);
- duplicated Python evaluation — the same UDF evaluated in two nodes
  (guide §4.4);
- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — quadratic joins
  (guide §3; a hinted 1-row scalar crossJoin is fine and allowlisted);
- parquet scans with NO PushedFilters while the query has a Filter
  directly above the scan (guide §6: pushdown not reaching storage);
- Exchange count per query (informational — the audit record is the
  baseline a later diff can flag regressions against).

Usage: python -m tools.plan_audit [sf_dir] [substr ...]
Writes PLAN_AUDIT_r14.json next to this file and prints one line per
flagged query.

Building a DataFrame is analysis-only for batch queries; STREAMING
registry entries drain their stream inside ``fn`` (that is the cost of
seeing their real post-sink plan — same work tools.check pays).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def _count_op(plan: str, op: str) -> int:
    """Count PHYSICAL NODES of an operator in a formatted explain.

    ``explain('formatted')`` prints every operator twice — once in the
    indented tree and once in the numbered detail section — so a bare
    substring count double-reports (the r14 audit's first cut flagged
    'BatchEvalPython x2' for queries holding exactly one node). Counting
    only the numbered detail headers ``(N) <Op>`` gives the true node
    count."""
    return len(re.findall(rf"(?m)^\(\d+\) {op}\b", plan))


def _smells(plan: str) -> dict:
    out: dict[str, object] = {}
    out["exchanges"] = _count_op(plan, "Exchange")
    out["batch_eval_python"] = _count_op(plan, "BatchEvalPython")
    out["arrow_eval_python"] = _count_op(plan, "ArrowEvalPython")
    out["cartesian"] = _count_op(plan, "CartesianProduct")
    out["bnlj"] = _count_op(plan, "BroadcastNestedLoopJoin")
    out["smj"] = _count_op(plan, "SortMergeJoin")
    out["bhj"] = _count_op(plan, "BroadcastHashJoin")
    # scans whose detail block shows an empty PushedFilters list
    out["scans"] = _count_op(plan, "Scan parquet")
    out["scans_no_pushdown"] = len(
        re.findall(r"PushedFilters: \[\]", plan)
    )
    # duplicated python eval of one udf (guide §4.4): same udf name in
    # two different BatchEval/ArrowEval nodes
    udf_nodes = re.findall(
        r"(?:Batch|Arrow)EvalPython \[([a-zA-Z_0-9]+)\(", plan
    )
    out["dup_python_eval"] = len(udf_nodes) - len(set(udf_nodes))
    return out


def main() -> None:
    from smallquery_spark.queries import REGISTRY, load_all
    from smallquery_spark.session import get_session

    args = [a for a in sys.argv[1:]]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    subs = args[1:] if args and os.path.isdir(args[0]) else args
    load_all()
    spark = get_session("smallquery-plan-audit")
    names = sorted(
        n
        for n in REGISTRY
        if not subs or any(s in n for s in subs)
    )
    results: dict[str, dict] = {}
    flagged = 0
    for name in names:
        qd = REGISTRY[name]
        t0 = time.time()
        try:
            df = qd.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — audit must finish
            results[name] = {"error": str(exc)[:300]}
            print(f"ERROR {name}: {str(exc)[:120]}")
            continue
        rec = _smells(plan)
        rec["build_sec"] = round(time.time() - t0, 2)
        results[name] = rec
        flags = []
        if rec["batch_eval_python"]:
            flags.append(f"BatchEvalPython x{rec['batch_eval_python']}")
        if rec["dup_python_eval"]:
            flags.append(f"dup-python-eval x{rec['dup_python_eval']}")
        if rec["cartesian"]:
            flags.append(f"CartesianProduct x{rec['cartesian']}")
        if rec["bnlj"]:
            flags.append(f"BNLJ x{rec['bnlj']}")
        if flags:
            flagged += 1
            print(f"FLAG {name}: {', '.join(flags)}")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(here, "PLAN_AUDIT_r14.json")
    with open(out_path, "w") as f:
        json.dump(
            {"sf_dir": sf_dir, "n_queries": len(names), "queries": results},
            f,
            indent=1,
            sort_keys=True,
        )
    print(f"{len(names)} plans audited, {flagged} flagged -> {out_path}")


if __name__ == "__main__":
    main()
