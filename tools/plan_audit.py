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
- parquet scans with NO PushedFilters whose nearest non-wrapper
  ancestor in the plan tree IS a Filter (guide §6: a predicate sits
  right on top of the scan but did not reach storage). Fixed per
  ADVICE r14 #4 — the r14 cut counted every ``PushedFilters: []``
  occurrence, over-reporting scans that simply have no filter at all;
  the r14 baseline's ``scans_no_pushdown`` values are therefore
  inflated and NOT comparable to r15+ records.
- Exchange count per query (informational — the audit record is the
  baseline a later diff can flag regressions against).

Usage:
  python -m tools.plan_audit [sf_dir] [substr ...]   # cut a new record
  python -m tools.plan_audit --diff [sf_dir] [substr ...]
The default mode writes PLAN_AUDIT_r15.json next to the repo root and
prints one line per flagged query. ``--diff`` re-audits and compares
against the committed baseline (the highest-numbered PLAN_AUDIT_r*.json)
instead of writing one: any query whose BatchEvalPython / dup-python /
CartesianProduct / BNLJ count ROSE, whose Exchange count rose, or whose
filter-topped pushdown misses rose, is printed and the exit code is 1.
The allowlist-update path is explicit: if a rise is intended (a new
declared feature surface), re-cut the baseline with the default mode
and commit it alongside the change that explains it.

Building a DataFrame is analysis-only for batch queries; STREAMING
registry entries drain their stream inside ``fn`` (that is the cost of
seeing their real post-sink plan — same work tools.check pays).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

BASELINE_NAME = "PLAN_AUDIT_r15.json"

# fields where an INCREASE vs baseline is a regression worth failing on
REGRESSIVE = (
    "batch_eval_python",
    "dup_python_eval",
    "cartesian",
    "bnlj",
    "exchanges",
    "scans_no_pushdown",
)


def _count_op(plan: str, op: str) -> int:
    """Count PHYSICAL NODES of an operator in a formatted explain.

    ``explain('formatted')`` prints every operator twice — once in the
    indented tree and once in the numbered detail section — so a bare
    substring count double-reports (the r14 audit's first cut flagged
    'BatchEvalPython x2' for queries holding exactly one node). Counting
    only the numbered detail headers ``(N) <Op>`` gives the true node
    count."""
    return len(re.findall(rf"(?m)^\(\d+\) {op}\b", plan))


# tree line: indentation prefix (+-, :-, :, spaces), operator name,
# trailing node id in parens
_TREE_LINE = re.compile(r"^([\s+:|-]*)(\*?\s*[A-Za-z][^()]*?)\s*\((\d+)\)\s*$")

# pure pass-through wrappers that sit between a Filter and the Scan it
# filters — skipped when deciding "Filter directly above the scan"
_WRAPPERS = {"ColumnarToRow", "InputAdapter", "WholeStageCodegen"}


def _scans_under_filter_no_pushdown(plan: str) -> int:
    """Scans with empty PushedFilters whose nearest non-wrapper tree
    ancestor is a Filter (the smell the module docstring names: a
    predicate is sitting right on the scan but did not push into the
    parquet reader). ADVICE r14 #4: counting every ``PushedFilters: []``
    over-reports scans that have no filter above them at all."""
    # parse the indented tree (everything before the first detail header)
    first_detail = re.search(r"(?m)^\(\d+\) ", plan)
    tree_text = plan[: first_detail.start()] if first_detail else plan
    nodes: list[tuple[int, str, int]] = []  # (indent, opname, node_id)
    for line in tree_text.splitlines():
        m = _TREE_LINE.match(line)
        if not m:
            continue
        prefix, name, nid = m.group(1), m.group(2).strip(), int(m.group(3))
        name = name.lstrip("* ").strip()
        nodes.append((len(prefix), name, nid))
    # detail blocks keyed by node id, to read each scan's PushedFilters
    details: dict[int, str] = {}
    for m in re.finditer(
        r"(?ms)^\((\d+)\) ([^\n]*)\n(.*?)(?=^\(\d+\) |\Z)", plan
    ):
        details[int(m.group(1))] = m.group(2) + "\n" + m.group(3)
    hits = 0
    for i, (indent, name, nid) in enumerate(nodes):
        if not name.startswith("Scan parquet"):
            continue
        det = details.get(nid, "")
        if "PushedFilters: []" not in det:
            continue
        # nearest ancestor: preceding tree line with smaller indent
        j, cur = i - 1, indent
        while j >= 0:
            pind, pname, _pid = nodes[j]
            if pind < cur:
                base = pname.split("(")[0].split("[")[0].strip()
                if base in _WRAPPERS:
                    cur = pind
                    j -= 1
                    continue
                if base == "Filter":
                    hits += 1
                break
            j -= 1
    return hits


def _smells(plan: str) -> dict:
    out: dict[str, object] = {}
    out["exchanges"] = _count_op(plan, "Exchange")
    out["batch_eval_python"] = _count_op(plan, "BatchEvalPython")
    out["arrow_eval_python"] = _count_op(plan, "ArrowEvalPython")
    out["cartesian"] = _count_op(plan, "CartesianProduct")
    out["bnlj"] = _count_op(plan, "BroadcastNestedLoopJoin")
    out["smj"] = _count_op(plan, "SortMergeJoin")
    out["bhj"] = _count_op(plan, "BroadcastHashJoin")
    out["scans"] = _count_op(plan, "Scan parquet")
    out["scans_no_pushdown"] = _scans_under_filter_no_pushdown(plan)
    # duplicated python eval of one udf (guide §4.4): same udf name in
    # two different BatchEval/ArrowEval nodes
    udf_nodes = re.findall(
        r"(?:Batch|Arrow)EvalPython \[([a-zA-Z_0-9]+)\(", plan
    )
    out["dup_python_eval"] = len(udf_nodes) - len(set(udf_nodes))
    return out


def _load_baseline(here: str) -> tuple[str, dict] | None:
    """Newest committed PLAN_AUDIT_r*.json (highest round number)."""
    cands = glob.glob(os.path.join(here, "PLAN_AUDIT_r[0-9]*.json"))
    if not cands:
        return None
    best = max(
        cands,
        key=lambda p: int(re.search(r"PLAN_AUDIT_r0*(\d+)", p).group(1)),
    )
    with open(best) as f:
        return os.path.basename(best), json.load(f)


def diff_against_baseline(
    current: dict[str, dict],
    baseline: dict[str, dict],
    baseline_name: str = "",
) -> list[str]:
    """Regression lines: per query, any REGRESSIVE field that rose vs
    the baseline (new queries are reported informationally when they
    carry a nonzero smell — they have no baseline to beat)."""
    problems: list[str] = []
    for name, rec in sorted(current.items()):
        if "error" in rec:
            problems.append(f"{name}: audit error: {rec['error'][:120]}")
            continue
        base = baseline.get(name)
        if base is None or "error" in base:
            smells = [
                f"{k}={rec[k]}"
                for k in ("batch_eval_python", "cartesian", "bnlj")
                if rec.get(k)
            ]
            if smells:
                problems.append(
                    f"{name}: NEW query with {', '.join(smells)} — add to"
                    " the baseline deliberately if intended"
                )
            continue
        for k in REGRESSIVE:
            now, was = rec.get(k), base.get(k)
            if now is None or was is None:
                continue
            if k == "scans_no_pushdown" and "r14" in baseline_name:
                continue  # r14 counted this field differently (inflated)
            if now > was:
                problems.append(f"{name}: {k} rose {was} -> {now}")
    return problems


def run_audit(sf_dir: str, subs: list[str]) -> dict[str, dict]:
    from smallquery_spark.queries import REGISTRY, load_all
    from smallquery_spark.session import get_session

    load_all()
    spark = get_session("smallquery-plan-audit")
    names = sorted(
        n for n in REGISTRY if not subs or any(s in n for s in subs)
    )
    results: dict[str, dict] = {}
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
    return results


def main() -> None:
    args = [a for a in sys.argv[1:]]
    diff_mode = "--diff" in args
    args = [a for a in args if a != "--diff"]
    sf_dir = (
        args[0]
        if args and os.path.isdir(args[0])
        else "/root/testdata/sf0.001"
    )
    subs = args[1:] if args and os.path.isdir(args[0]) else args
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    results = run_audit(sf_dir, subs)

    if diff_mode:
        loaded = _load_baseline(here)
        if loaded is None:
            print("no PLAN_AUDIT_r*.json baseline found")
            sys.exit(2)
        bname, baseline = loaded
        problems = diff_against_baseline(
            results, baseline.get("queries", {}), baseline_name=bname
        )
        if problems:
            print(f"{len(problems)} plan regression(s) vs {bname}:")
            for p in problems:
                print(f"  {p}")
            sys.exit(1)
        print(
            f"{len(results)} plans audited, no regressions vs {bname}"
        )
        return

    flagged = 0
    for name, rec in results.items():
        if "error" in rec:
            continue
        flags = []
        if rec["batch_eval_python"]:
            flags.append(f"BatchEvalPython x{rec['batch_eval_python']}")
        if rec["dup_python_eval"]:
            flags.append(f"dup-python-eval x{rec['dup_python_eval']}")
        if rec["cartesian"]:
            flags.append(f"CartesianProduct x{rec['cartesian']}")
        if rec["bnlj"]:
            flags.append(f"BNLJ x{rec['bnlj']}")
        if rec["scans_no_pushdown"]:
            flags.append(f"filter-no-pushdown x{rec['scans_no_pushdown']}")
        if flags:
            flagged += 1
            print(f"FLAG {name}: {', '.join(flags)}")
    # a SUBSTRING-FILTERED run must never overwrite the committed
    # full-registry baseline (it would silently shrink the gate)
    out_path = os.path.join(
        here, BASELINE_NAME if not subs else "PLAN_AUDIT_subset.json"
    )
    with open(out_path, "w") as f:
        json.dump(
            {"sf_dir": sf_dir, "n_queries": len(results), "queries": results},
            f,
            indent=1,
            sort_keys=True,
        )
    print(f"{len(results)} plans audited, {flagged} flagged -> {out_path}")


if __name__ == "__main__":
    main()
