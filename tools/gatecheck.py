"""Mechanical gate-record freshness check — the documented last step
of every round.

The rule this automates (VERDICT r9 #1, after PYTEST_r9.txt went stale
AND 0-byte at HEAD while README still cited it): the round's gate
records — the newest ``CHECKRUN_r*``, ``PYTEST_r*`` and
``BENCH_r*_local.json`` files — must be
(a) non-empty, (b) committed with no uncommitted drift, and (c) cut
AT-OR-AFTER the last commit that touched the engine (``
smallquery_spark/``, ``__spark_entry__.py``, ``bench.py``,
``tests/``). "Cut after" is ancestry, not wall time: the last commit
touching the engine must be an ancestor of (or equal to) the last
commit touching the record.

Usage (from the repo root)::

    python -m tools.gatecheck            # exit 0 = gates cover HEAD
    python -m tools.gatecheck --quiet    # same, one summary line

Exit codes: 0 fresh, 1 stale/empty/dirty/missing.
"""

from __future__ import annotations

import glob
import os
import re
import subprocess
import sys

ENGINE_PATHS = [
    "smallquery_spark",
    "tests",
    "__spark_entry__.py",
    "bench.py",
]


def _git(repo: str, *args: str) -> str:
    return subprocess.run(
        ["git", "-C", repo, *args],
        check=True,
        stdout=subprocess.PIPE,
        text=True,
    ).stdout.strip()


def _last_commit(repo: str, *paths: str) -> str | None:
    out = _git(repo, "log", "-1", "--format=%H", "--", *paths)
    return out or None


def _newest_record(repo: str, pattern: str) -> str | None:
    """The record file with the highest round number for ``pattern``
    (e.g. CHECKRUN_r10_sf0.01.txt beats CHECKRUN_r9_gen10.txt)."""
    best, best_round = None, -1
    for path in glob.glob(os.path.join(repo, pattern)):
        m = re.search(r"_r(\d+)", os.path.basename(path))
        if m and int(m.group(1)) > best_round:
            best, best_round = path, int(m.group(1))
    return best


def check(repo: str, quiet: bool = False) -> list[str]:
    """Return a list of problems (empty = gates cover HEAD)."""
    problems: list[str] = []
    eng = _last_commit(repo, *ENGINE_PATHS)
    if eng is None:
        return ["no engine commits found (not a repo?)"]

    dirty = _git(
        repo, "status", "--porcelain", "--", *ENGINE_PATHS
    )
    if dirty:
        problems.append(
            "uncommitted engine changes — no committed record can cover"
            f" them:\n{dirty}"
        )

    for pattern, kind in (
        ("CHECKRUN_r*", "CHECKRUN"),
        ("PYTEST_r*", "PYTEST"),
        # the local bench record (VERDICT r10 #7): same ancestry rule.
        # A documented host-drift note may ACCOMPANY a fresh cut (in
        # README/SCALE.md prose), but never replaces one — a stale
        # BENCH_r*_local.json fails here exactly like a stale CHECKRUN.
        ("BENCH_r*_local.json", "BENCH"),
    ):
        rec = _newest_record(repo, pattern)
        if rec is None:
            problems.append(f"{kind}: no record file matches {pattern}")
            continue
        rel = os.path.relpath(rec, repo)
        if os.path.getsize(rec) == 0:
            problems.append(f"{kind}: {rel} is EMPTY")
            continue
        if _git(repo, "status", "--porcelain", "--", rel):
            problems.append(f"{kind}: {rel} has uncommitted changes")
            continue
        rec_commit = _last_commit(repo, rel)
        if rec_commit is None:
            problems.append(f"{kind}: {rel} is untracked")
            continue
        fresh = eng == rec_commit or (
            subprocess.run(
                ["git", "-C", repo, "merge-base", "--is-ancestor", eng, rec_commit]
            ).returncode
            == 0
        )
        if not fresh:
            problems.append(
                f"{kind}: {rel} was cut at {rec_commit[:10]} but the engine"
                f" changed later (last engine commit {eng[:10]}) — re-cut it"
            )
        elif not quiet:
            print(f"ok    {kind}: {rel} covers engine HEAD {eng[:10]}")
    return problems


def main() -> None:
    quiet = "--quiet" in sys.argv[1:]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    problems = check(repo, quiet=quiet)
    if problems:
        for p in problems:
            print(f"STALE {p}")
        sys.exit(1)
    print("gatecheck: all gate records cover the engine at HEAD")


if __name__ == "__main__":
    main()
