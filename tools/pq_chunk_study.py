"""ivfpq_search query-batch chunking: pick the default with numbers.

What the r10 dedup study exposed (PQ_DEDUP_gen100.json): a 25k-query
batch against a 500k-vector index took 438 s on the monolithic path —
the LUT/offset tensors are n_q-proportional (25k x 16 x 256 LUT +
25k x 512 offsets ≈ 460 MB of float32 riding the ADC UDF closure into
every task), and one monolithic probe unions every query's cells so
partition pruning buys nothing. Chunking bounds both: a chunk's
closure is chunk-proportional (~9 MB at 4096) and each chunk prunes
to ITS OWN probed cells.

This study re-runs the SAME search (same fixture, same index build,
ADC-only k=3 — the dedup candidate shape) at chunk sizes
{0 (monolithic), 8192, 4096, 1024}; result-set identity across
chunkings is asserted in-run (and pinned in tests/test_pq.py). Run it
BOTH ways (default and ``--reverse``) — each leg warms the page cache
for the next, so one ordering conflates chunk size with warmth.

What it measured (PQ_CHUNK_gen100.json + _rev.json, averaged over
both orderings): chunking is a ~1.25x wall win, NOT the order-of-
magnitude the closure arithmetic suggested — 4096 ≈ 240 s, 8192 ≈
227 s vs monolithic ≈ 299 s, with 1024 (256 s) already paying
per-chunk job overhead. The closure hypothesis survives only as the
BOUNDEDNESS argument (a 1M-query monolithic batch would ship an
~18 GB closure and die; chunks hold it at ~9 MB forever), and that —
plus the modest measured win — is why ``query_chunk=4096`` is the
default rather than a bigger speed claim.

Usage:
    python -m tools.pq_chunk_study [--n 500000] [--batch 25000] [--reverse]
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

from smallquery_spark.queries.registry import ensure_driver_confs
from smallquery_spark.session import get_session
from tools.pq_dedup_study import gen_fixture


def main() -> None:
    argv = sys.argv[1:]

    def opt(flag, default, cast):
        if flag in argv:
            i = argv.index(flag)
            v = cast(argv[i + 1])
            del argv[i : i + 2]
            return v
        return default

    n = opt("--n", 500_000, int)
    batch = opt("--batch", 25_000, int)
    out_path = opt("--out", "PQ_CHUNK_gen100.json", str)

    from tools.diskguard import preflight

    disk = preflight(10)

    from smallquery_spark.operators.pq import (
        ivfpq_search,
        materialize_ivfpq,
        pq_train,
    )
    from smallquery_spark.operators.similarity import (
        ivf_assign,
        ivf_build_centroids,
        ivf_defaults,
    )

    # reuse the dedup fixture: originals = corpus, incoming = batch
    fix_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".fixtures",
        f"pqdedup_{n}_20000_5000",
    )
    gen_fixture(n, 20_000, 5_000, fix_dir)

    spark = get_session("smallquery-pq-chunk")
    ensure_driver_confs(spark)

    corpus = (
        spark.read.parquet(os.path.join(fix_dir, "originals.parquet"))
        .select(F.col("doc_id").alias("c_id"), F.col("emb").alias("vec"))
        .cache()
    )
    corpus.count()
    queries = (
        spark.read.parquet(os.path.join(fix_dir, "incoming.parquet"))
        .limit(batch)
        .select(F.col("doc_id").alias("q_id"), F.col("emb").alias("vec"))
        .localCheckpoint(eager=True)
    )
    n_cells, n_probe = ivf_defaults(n)
    cents = ivf_build_centroids(corpus, n_cells=n_cells)
    books = pq_train(corpus, cents, m=16)
    tname = materialize_ivfpq(
        spark, ivf_assign(corpus, cents), cents, books,
        f"pqchunk_{os.getpid()}",
    )
    # --reverse runs the conditions warmest-last in the OPPOSITE
    # order: each leg warms the page cache for the next, so a single
    # ordering conflates chunk size with warmth — the decision uses
    # both orderings
    chunk_order = (1024, 4096, 8192, 0)
    if "--reverse" in argv:
        argv.remove("--reverse")
        chunk_order = tuple(reversed(chunk_order))
    out: dict = {
        "chunk_order": list(chunk_order),
        "n_corpus": n,
        "n_queries": batch,
        "n_cells": n_cells,
        "n_probe": n_probe,
        "disk_preflight": disk,
        "walls": {},
    }
    try:
        baseline = None
        for chunk in chunk_order:
            t0 = time.time()
            res = ivfpq_search(
                spark, queries, tname, cents, books, k=3,
                n_probe=n_probe, query_chunk=chunk,
            ).localCheckpoint(eager=True)
            n_rows = res.count()
            wall = round(time.time() - t0, 3)
            label = "monolithic" if chunk == 0 else f"chunk{chunk}"
            out["walls"][label] = wall
            out.setdefault("rows", n_rows)
            if baseline is None:
                baseline = res
            else:
                assert res.exceptAll(baseline).count() == 0
                assert baseline.exceptAll(res).count() == 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tname}")

    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
