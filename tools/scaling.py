"""Scaling-curve runner: time a query set at two fixture scales.

Usage:
    python -m tools.scaling SMALL_DIR BIG_DIR [out.json]

Runs the bench headline set plus the heavy composite operators
(connected components, MinHash-LSH, k-means, sequence packing,
cluster-level dedup) at BOTH dirs — two runs each, min taken, same
protocol as bench.py — and prints per-query wall times and the
big/small ratio. Both dirs should come from tools.gen_fixtures so the
ratio is apples-to-apples (same generator, same distributions).

At gen1/gen0.1 the row ratio is 10x; a wall-time ratio <= ~12x means
near-linear scaling on local[32]. Super-linear queries are the ones to
investigate before any 100x claim.
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
    small, big = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    load_all()
    names = [n for n in HEADLINE + COMPOSITES if n in REGISTRY]
    spark = get_session("smallquery-scaling")
    spark.range(1).count()

    # Order: small, big, small-again. The first small pass runs on a
    # colder JVM than the big pass (codegen caches, JIT, GC sizing);
    # taking the min over the two small passes removes that asymmetry
    # from the ratio.
    print(f"== small: {small}", file=sys.stderr, flush=True)
    t_small1 = time_set(spark, names, small)
    print(f"== big: {big}", file=sys.stderr, flush=True)
    t_big = time_set(spark, names, big)
    print(f"== small (2nd pass): {small}", file=sys.stderr, flush=True)
    t_small2 = time_set(spark, names, small)
    t_small = {n: min(t_small1[n], t_small2[n]) for n in names}

    ratios = {
        n: (round(t_big[n] / t_small[n], 2) if t_small[n] > 0 else None)
        for n in names
    }
    result = {
        "small_dir": small,
        "big_dir": big,
        "small_sec": t_small,
        "big_sec": t_big,
        "ratio": ratios,
        "total_small": round(sum(t_small.values()), 3),
        "total_big": round(sum(t_big.values()), 3),
    }
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
