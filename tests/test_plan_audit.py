"""tools/plan_audit.py unit pins: the filter-over-scan pushdown-miss
counter (ADVICE r14 #4 — the r14 cut counted every ``PushedFilters: []``
occurrence, inflating the baseline) and the --diff regression gate
(VERDICT r14 #6: a change that adds an Exchange/BatchEvalPython/BNLJ to
any registry plan should fail loudly against the committed baseline).

These are pure text/dict tests — no Spark session — so they run in the
default (fast) suite; the full-registry audit itself is the opt-in
``python -m tools.plan_audit --diff`` step."""

from __future__ import annotations

from tools.plan_audit import (
    _scans_under_filter_no_pushdown,
    _smells,
    diff_against_baseline,
)

_PLAN_FILTER_NO_PUSH = """== Physical Plan ==
* Project (4)
+- * Filter (3)
   +- * ColumnarToRow (2)
      +- Scan parquet  (1)


(1) Scan parquet\x20
Output [2]: [a#1, b#2]
Batched: true
Location: InMemoryFileIndex [file:/x]
PushedFilters: []
ReadSchema: struct<a:int,b:int>

(2) ColumnarToRow [codegen id : 1]
Input [2]: [a#1, b#2]

(3) Filter [codegen id : 1]
Input [2]: [a#1, b#2]
Condition : (cast(a#1 as bigint) > 1)

(4) Project [codegen id : 1]
Output [1]: [b#2]
Input [2]: [a#1, b#2]
"""

_PLAN_NO_FILTER = """== Physical Plan ==
* HashAggregate (3)
+- * ColumnarToRow (2)
   +- Scan parquet  (1)


(1) Scan parquet\x20
Output [1]: [a#1]
Batched: true
PushedFilters: []
ReadSchema: struct<a:int>

(2) ColumnarToRow [codegen id : 1]
Input [1]: [a#1]

(3) HashAggregate [codegen id : 1]
Input [1]: [a#1]
"""

_PLAN_PUSHED = _PLAN_FILTER_NO_PUSH.replace(
    "PushedFilters: []", "PushedFilters: [IsNotNull(a)]"
)


def test_filter_no_pushdown_counted():
    """A scan with empty PushedFilters under a Filter (through the
    ColumnarToRow wrapper) is the smell; count it."""
    assert _scans_under_filter_no_pushdown(_PLAN_FILTER_NO_PUSH) == 1
    assert _smells(_PLAN_FILTER_NO_PUSH)["scans_no_pushdown"] == 1


def test_unfiltered_scan_not_counted():
    """A scan with no Filter above it has nothing to push — the r14
    counter reported these as misses; the fixed one must not."""
    assert _scans_under_filter_no_pushdown(_PLAN_NO_FILTER) == 0


def test_pushed_scan_not_counted():
    assert _scans_under_filter_no_pushdown(_PLAN_PUSHED) == 0


def test_diff_flags_regressive_rises_only():
    base = {
        "q_a": {"exchanges": 2, "batch_eval_python": 0, "bnlj": 0},
        "q_b": {"exchanges": 3, "batch_eval_python": 1, "bnlj": 0},
    }
    cur = {
        # exchange count ROSE — regression
        "q_a": {"exchanges": 3, "batch_eval_python": 0, "bnlj": 0},
        # counts fell / held — fine
        "q_b": {"exchanges": 2, "batch_eval_python": 1, "bnlj": 0},
    }
    probs = diff_against_baseline(cur, base)
    assert probs == ["q_a: exchanges rose 2 -> 3"]


def test_diff_reports_new_query_with_smell_and_errors():
    base = {"q_a": {"exchanges": 1}}
    cur = {
        "q_a": {"exchanges": 1},
        "q_new": {"exchanges": 1, "batch_eval_python": 2, "cartesian": 0, "bnlj": 0},
        "q_err": {"error": "boom"},
    }
    probs = diff_against_baseline(cur, base)
    assert any("q_new" in p and "batch_eval_python=2" in p for p in probs)
    assert any("q_err" in p and "audit error" in p for p in probs)


def test_diff_skips_incomparable_r14_pushdown_field():
    """The r14 baseline's scans_no_pushdown used the inflated counting;
    diffs against an r14-named baseline must not flag that field."""
    base = {"q_a": {"scans_no_pushdown": 0, "exchanges": 1}}
    cur = {"q_a": {"scans_no_pushdown": 1, "exchanges": 1}}
    assert (
        diff_against_baseline(cur, base, baseline_name="PLAN_AUDIT_r14.json")
        == []
    )
    assert diff_against_baseline(
        cur, base, baseline_name="PLAN_AUDIT_r15.json"
    ) == ["q_a: scans_no_pushdown rose 0 -> 1"]
