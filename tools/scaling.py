"""Scaling-curve runner: time a query set at N fixture scales.

Usage:
    python -m tools.scaling DIR1 DIR2 [DIR3 ...] [--out out.json]

Runs the bench headline set plus the heavy composite operators
(connected components, MinHash-LSH, k-means, sequence packing,
cluster-level dedup) at EVERY dir — two runs each, min taken, same
protocol as bench.py — and prints per-query wall times plus each dir's
ratio to the smallest dir. Dirs should be listed smallest-first and all
come from tools.gen_fixtures so ratios are apples-to-apples (same
generator, same distributions).

With three decades (gen0.1 / gen1 / gen10, row ratios 1:10:100) the
curve separates fixed overhead from data-proportional work far better
than a single 2-point ratio: a query that is truly linear shows its
second-decade ratio approaching 10x as overhead amortizes, while a
super-linear one accelerates. Those are the ones to fix before any
100x claim.
"""

from __future__ import annotations

import json
import sys
import time

from bench import HEADLINE
from smallquery_spark.queries import REGISTRY, load_all
from smallquery_spark.session import get_session

COMPOSITES = [
    "c15_connected_components",
    "c2_minhash_lsh",
    "c37_kmeans_embeddings",
    "c22_sequence_packing",
    "c28_cluster_dedup",
    # Stateful stream shapes with the largest state footprints after
    # b58 (VERDICT r4 item 6): session windows merge state per key,
    # stream-stream joins buffer both sides within the watermark.
    "b53_stream_session",
    "b57_stream_stream_join",
]


def time_set(spark, names, sf_dir):
    out = {}
    for name in names:
        qd = REGISTRY[name]
        per_run = []
        for _ in range(2):
            t0 = time.time()
            qd.fn(spark, sf_dir).count()
            per_run.append(time.time() - t0)
        out[name] = round(min(per_run), 3)
        print(f"  {name}: {out[name]}s", file=sys.stderr, flush=True)
    return out


def main() -> None:
    usage = (
        "usage: python -m tools.scaling DIR1 DIR2 [DIR3 ...]"
        " [--out out.json] [--only substr ...]"
    )
    argv = sys.argv[1:]
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv):
            raise SystemExit(usage)
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    only: list[str] = []
    if "--only" in argv:
        i = argv.index("--only")
        only = argv[i + 1 :]
        argv = argv[:i]
        if not only:
            raise SystemExit(usage)
    dirs = argv
    if len(dirs) < 2:
        raise SystemExit("need at least two fixture dirs, smallest first")

    load_all()
    names = [n for n in HEADLINE + COMPOSITES if n in REGISTRY]
    if only:
        names = [n for n in names if any(s in n for s in only)]
        if not names:
            raise SystemExit(f"--only matched no queries: {only}")
    spark = get_session("smallquery-scaling")
    spark.range(1).count()

    # Order: smallest .. largest, then smallest again. The first pass
    # runs on a colder JVM than the rest (codegen caches, JIT, GC
    # sizing); taking the min over the two smallest-dir passes removes
    # that asymmetry from every ratio.
    times: dict[str, dict[str, float]] = {}
    for d in dirs:
        print(f"== {d}", file=sys.stderr, flush=True)
        times[d] = time_set(spark, names, d)
    print(f"== {dirs[0]} (2nd pass)", file=sys.stderr, flush=True)
    t0_again = time_set(spark, names, dirs[0])
    times[dirs[0]] = {
        n: min(times[dirs[0]][n], t0_again[n]) for n in names
    }

    base = times[dirs[0]]
    result = {
        "dirs": dirs,
        "sec": times,
        "ratio_to_smallest": {
            d: {
                n: (round(times[d][n] / base[n], 2) if base[n] > 0 else None)
                for n in names
            }
            for d in dirs[1:]
        },
        "totals": {d: round(sum(times[d].values()), 3) for d in dirs},
    }
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
