"""Scan-floor probe: separate disk-IO from decode-CPU on scan-bound queries.

The fourth-decade bridge (SCALING_gen100.json) shows q6 — a pure
pushed-filter scan+agg — at 20.4× for 10× rows, which cannot be
per-row CPU. This tool times a scan-bound query repeatedly in one warm
session at two fixture scales, so the first run (cold page cache) and
the later runs (cache-resident file) bracket the scan cost: if the
warm-for-warm ratio is ~linear-or-less while the cold ratio explodes,
the decade blow-up is cache residency (the small fixture fits in page
cache for the whole bench; the big one does not), not a plan defect.
On a cluster the aggregate page cache across executors — or any real
columnar store's IO bandwidth scaling with nodes — restores the warm
ratio; local[32] has one machine's disk.

Usage:
    python -m tools.scan_floor [small_dir] [big_dir] [--query NAME]
        [--runs N] [--out out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

from smallquery_spark.queries import REGISTRY, load_all
from smallquery_spark.queries.registry import ensure_driver_confs
from smallquery_spark.session import get_session


def main() -> None:
    argv = sys.argv[1:]
    query = "q6_forecast_revenue"
    runs_n = 3
    out_path = None
    for flag, cast in (("--query", str), ("--runs", int), ("--out", str)):
        if flag in argv:
            i = argv.index(flag)
            if i + 1 >= len(argv):
                raise SystemExit(__doc__.strip().splitlines()[-2].strip())
            val = cast(argv[i + 1])
            argv = argv[:i] + argv[i + 2 :]
            if flag == "--query":
                query = val
            elif flag == "--runs":
                runs_n = val
            else:
                out_path = val
    small = argv[0] if len(argv) > 0 else ".fixtures/gen10"
    big = argv[1] if len(argv) > 1 else ".fixtures/gen100"

    load_all()
    spark = get_session("smallquery-scan-floor")
    ensure_driver_confs(spark)

    out: dict = {"query": query, "dirs": {}}
    for sf_dir in (small, big):
        runs = []
        for _ in range(runs_n):
            t0 = time.time()
            REGISTRY[query].fn(spark, sf_dir).collect()
            runs.append(round(time.time() - t0, 3))
        out["dirs"][sf_dir] = {
            "runs": runs,
            "cold": runs[0],
            "warm": round(min(runs[1:]), 3) if len(runs) > 1 else None,
        }
        print(f"  {sf_dir}: {runs}", file=sys.stderr)
    s, b = out["dirs"][small], out["dirs"][big]
    out["cold_ratio"] = round(b["cold"] / s["cold"], 2) if s["cold"] else None
    out["warm_ratio"] = (
        round(b["warm"] / s["warm"], 2) if s.get("warm") and b.get("warm") else None
    )
    line = json.dumps(out)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
