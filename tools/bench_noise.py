"""Bench noise analysis (VERDICT r3 item 3): run bench.py N times in
fresh subprocesses (fresh JVM each — same protocol as the driver's
per-round run) and report mean ± population-σ per query, plus the
ratio of each query's mean to a reference run (BENCH_r01 by default)
so "regression vs r1" can be separated from run-to-run noise.

Usage: python -m tools.bench_noise [N] [out.json]
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once() -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
        check=True,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line in bench output:\n{out.stdout[-2000:]}")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    runs = []
    for i in range(n):
        r = run_once()
        runs.append(r["queries"])
        print(f"run {i + 1}/{n}: total {r['value']}s", file=sys.stderr, flush=True)

    names = sorted(runs[0])
    stats = {}
    for q in names:
        xs = [r[q] for r in runs if q in r]
        mean = sum(xs) / len(xs)
        sigma = math.sqrt(sum((x - mean) ** 2 for x in xs) / len(xs))
        stats[q] = {
            "mean": round(mean, 3),
            "sigma": round(sigma, 3),
            "min": min(xs),
            "max": max(xs),
        }

    ref_path = os.path.join(REPO, "BENCH_r01.json")
    if os.path.exists(ref_path):
        with open(ref_path) as f:
            ref = json.load(f)
        # driver format: {"parsed": {"queries": {...}}}
        ref_q = ref.get("parsed", ref).get("queries", {})
        for q in stats:
            if q in ref_q and ref_q[q]:
                stats[q]["vs_r1"] = round(stats[q]["mean"] / ref_q[q], 2)

    totals = [sum(r.values()) for r in runs]
    result = {
        "n_runs": n,
        "totals": [round(t, 3) for t in totals],
        "total_mean": round(sum(totals) / n, 3),
        "total_sigma": round(
            math.sqrt(sum((t - sum(totals) / n) ** 2 for t in totals) / n), 3
        ),
        "queries": stats,
    }
    print(json.dumps(result, indent=2))
    if out_path:
        with open(out_path, "w") as f:
            f.write(json.dumps(result) + "\n")


if __name__ == "__main__":
    main()
