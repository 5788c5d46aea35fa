"""IVF centroid-quality study (VERDICT r4 item 2).

Compares the two coarse-quantizer choices in
``operators/similarity.ivf_build_centroids`` — the round-4 ``first_n``
pick vs the round-5 sampled spherical k-means — at a given fixture
scale. For each: recall@10 against exact brute force over a fixed query
set, cells actually probed, and cell-balance (max/mean/empty cell
sizes), plus wall time for build/assign/search.

Usage:
    python -m tools.ivf_recall [sf_dir] [--queries N] [--cells N]
                               [--probe N] [--out out.json]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

from smallquery_spark.queries.registry import t
from smallquery_spark.session import get_session


def _actual_scan_fraction(queries, cents, n_probe, size_by_cell, n_corpus):
    """Mean fraction of the corpus scanned per query: sum of each
    query's probed-cell sizes, averaged, over n_corpus."""
    from smallquery_spark.operators.similarity import _top_cells_udf

    if not n_corpus:
        return None
    rows = queries.select(
        F.explode(_top_cells_udf(cents, n_probe)(F.col("vec"))).alias("cell")
    ).collect()
    n_q = queries.count()
    if not n_q:
        return None
    scanned = sum(size_by_cell.get(r["cell"], 0) for r in rows)
    return round(scanned / (n_q * n_corpus), 3)


def run(
    sf_dir: str,
    n_queries: int,
    n_cells: int,
    n_probe: int,
    probe_sweep: list[int] | None = None,
    methods: tuple[str, ...] = ("first_n", "kmeans", "kmeans_parallel"),
) -> dict:
    from smallquery_spark.operators.similarity import (
        ivf_assign,
        ivf_build_centroids,
        ivf_search,
        knn_bruteforce,
    )

    spark = get_session("smallquery-ivf-recall")
    emb = t(spark, sf_dir, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("vec")
    ).cache()
    n_corpus = corpus.count()
    # Queries come from the TAIL of the id range: the first_n quantizer
    # takes the FIRST n_cells vectors as centroids, so head-of-range
    # queries would sit at the exact center of their own cell and
    # inflate its low-probe recall (measured: probe-1 recall 0.946
    # biased vs 0.32 unbiased).
    queries = emb.filter(F.col("vec_id") >= n_corpus - n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("vec")
    )

    t0 = time.time()
    exact = (
        knn_bruteforce(
            queries.select("q_id", F.col("vec").alias("q_vec")),
            corpus.select("c_id", F.col("vec").alias("c_vec")),
            k=10,
        )
        .select("q_id", "c_id")
        .cache()
    )
    n_exact = exact.count()
    brute_sec = round(time.time() - t0, 3)

    out: dict = {
        "sf_dir": sf_dir,
        "n_corpus": n_corpus,
        "n_queries": n_queries,
        "n_cells": n_cells,
        "n_probe": n_probe,
        "bruteforce_sec": brute_sec,
        "methods": {},
    }
    for method in methods:
        t0 = time.time()
        cents = ivf_build_centroids(corpus, n_cells=n_cells, method=method)
        build_sec = round(time.time() - t0, 3)
        t0 = time.time()
        assigned = ivf_assign(corpus, cents).cache()
        assigned.count()  # materialize: the timed work is assignment only
        assign_sec = round(time.time() - t0, 3)
        # cell-size audit (untimed — it is measurement, not indexing)
        size_rows = (
            assigned.groupBy("cell").agg(F.count("*").alias("n")).collect()
        )
        sizes = [r["n"] for r in size_rows]
        size_by_cell = {r["cell"]: r["n"] for r in size_rows}
        t0 = time.time()
        approx = ivf_search(
            queries, assigned, cents, k=10, n_probe=n_probe
        ).select("q_id", "c_id")
        hits = exact.join(approx, ["q_id", "c_id"], "left_semi").count()
        search_sec = round(time.time() - t0, 3)
        # Low-probe regime: recall as the probe budget shrinks is where
        # centroid quality shows up — a bad quantizer puts a query's
        # true neighbours in cells the first few probes never open.
        sweep = {}
        for p in probe_sweep or []:
            ap = ivf_search(
                queries, assigned, cents, k=10, n_probe=p
            ).select("q_id", "c_id")
            h = exact.join(ap, ["q_id", "c_id"], "left_semi").count()
            sweep[p] = round(h / n_exact, 4) if n_exact else None
        mean_sz = sum(sizes) / len(sizes) if sizes else 0
        out["methods"][method] = {
            "recall_at_10": round(hits / n_exact, 4) if n_exact else None,
            "build_sec": build_sec,
            "assign_sec": assign_sec,
            "search_sec": search_sec,
            "cell_max": max(sizes) if sizes else 0,
            "cell_mean": round(mean_sz, 1),
            "cell_balance_max_over_mean": (
                round(max(sizes) / mean_sz, 2) if mean_sz else None
            ),
            "nonempty_cells": len(sizes),
            # fraction of the corpus the query set ACTUALLY scans:
            # mean over queries of the sizes of the cells each query
            # probes (measured via the same top-cells kernel the
            # search uses), not the worst-case top-n_probe bound.
            "scan_fraction": _actual_scan_fraction(
                queries, cents, n_probe, size_by_cell, n_corpus
            ),
            # worst case: the n_probe largest cells corpus-wide
            "scan_fraction_worst_cells": round(
                sum(sorted(sizes, reverse=True)[:n_probe]) / n_corpus, 3
            )
            if n_corpus
            else None,
        }
        if sweep:
            out["methods"][method]["recall_by_probe"] = sweep
        assigned.unpersist()
        print(f"{method}: {out['methods'][method]}", file=sys.stderr, flush=True)
    exact.unpersist()
    corpus.unpersist()
    return out


def main() -> None:
    usage = (
        "usage: python -m tools.ivf_recall [sf_dir] [--queries N]"
        " [--cells N] [--probe N] [--out out.json]"
    )
    argv = sys.argv[1:]

    def opt(flag: str, default: int) -> int:
        if flag in argv:
            i = argv.index(flag)
            if i + 1 >= len(argv):
                raise SystemExit(usage)
            v = int(argv[i + 1])
            del argv[i : i + 2]
            return v
        return default

    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv):
            raise SystemExit(usage)
        out_path = argv[i + 1]
        del argv[i : i + 2]
    sweep = None
    if "--sweep" in argv:
        argv.remove("--sweep")
        sweep = [1, 2, 4, 8]
    n_queries = opt("--queries", 50)
    n_cells = opt("--cells", 64)
    n_probe = opt("--probe", 8)
    methods = ("first_n", "kmeans", "kmeans_parallel")
    if "--methods" in argv:
        i = argv.index("--methods")
        methods = tuple(argv[i + 1].split(","))
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    result = run(
        sf_dir, n_queries, n_cells, n_probe, probe_sweep=sweep,
        methods=methods,
    )
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
