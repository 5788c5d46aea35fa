"""Rerank point-fetch scan floor (VERDICT r10 #6).

ivfpq_search's rerank stage pushes the bounded candidate-id set into
the full-vector corpus scan as an IN-filter; the docstring asserted
"bucket the corpus by id at scale so point fetches prune to buckets"
— asserted, not measured. This study runs the SAME reranked search
against three corpus layouts and records the executed-plan metrics of
the corpus scan node (the IVFPQ_SCANIO method):

- **sorted_flat** — the corpus as generated: ascending ids, ~64 row
  groups with tight id ranges. File-level selection can't prune
  (Spark has no per-file stats for plain parquet), but the pushed
  IN-filter prunes ROW GROUPS inside the reader — visible as the scan
  node's ``numOutputRows`` (rows actually decoded), NOT as
  ``filesSize`` (which counts whole listed files).
- **shuffled_flat** — the same rows hash-scattered before writing:
  every row group's id range spans the corpus, so row-group pruning
  gets nothing. This is what an un-curated 100 TB corpus looks like.
- **bucketed** — ``bucketBy(id)`` managed table. Bucket pruning is
  file-level and only helps while the candidate set is SMALLER than
  the bucket count: a probe batch's rerank set (n_q x rerank x k ids)
  blankets the buckets long before it blankets the row groups, so the
  expectation stated up front is that bucketing does NOT prune the
  batch shape and the measured default should instead be "keep the
  corpus id-sorted (or re-sort on compaction) so row-group pruning
  carries the fetch". The numbers decide; both batch shapes (1 query,
  50 queries) are recorded so the crossover is visible.

Value gate: all three layouts return identical rows (layout moves
bytes, never values).

Usage:
    python -m tools.rerank_scanio [--n 2000000] [--queries 50]
        [--buckets 256] [--out RERANK_SCANIO_gen100.json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np
from pyspark.sql import functions as F

from smallquery_spark.queries.registry import ensure_driver_confs
from smallquery_spark.session import get_session
from tools.ivfpq_bytes import executed_scan_metrics
from tools.ivfpq_study import gen_embeddings


def main() -> None:
    argv = sys.argv[1:]

    def opt(flag, default, cast):
        if flag in argv:
            i = argv.index(flag)
            v = cast(argv[i + 1])
            del argv[i : i + 2]
            return v
        return default

    n = opt("--n", 2_000_000, int)
    n_queries = opt("--queries", 50, int)
    n_buckets = opt("--buckets", 256, int)
    out_path = opt("--out", "RERANK_SCANIO_gen100.json", str)

    from tools.diskguard import preflight

    disk = preflight(15)

    from smallquery_spark.operators.pq import (
        drop_index,
        ivfpq_search,
        materialize_ivfpq,
        pq_train,
    )
    from smallquery_spark.operators.similarity import (
        ivf_assign,
        ivf_build_centroids,
        ivf_defaults,
    )

    fix_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".fixtures",
        f"pqstudy_{n}",
    )
    emb_path = gen_embeddings(n, fix_dir)

    spark = get_session("smallquery-rerank-scanio")
    ensure_driver_confs(spark)

    corpus = spark.read.parquet(emb_path).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("vec")
    )
    n_cells, n_probe = ivf_defaults(n)

    # planted near-dup queries (the retrieval regime PQ is for)
    seed_rows = corpus.filter(F.col("c_id") < n_queries).collect()
    rng = np.random.RandomState(4242)
    planted = []
    for r in seed_rows:
        v = np.array(r["vec"], dtype=np.float64)
        v = v + rng.normal(0, 0.02, len(v))
        v = v / np.linalg.norm(v)
        planted.append((int(r["c_id"]) + 10_000_000, [float(x) for x in v]))
    queries = spark.createDataFrame(
        planted, "q_id long, vec array<double>"
    ).cache()
    queries.count()

    cents = ivf_build_centroids(corpus, n_cells=n_cells)
    books = pq_train(corpus, cents, m=16)
    t_pq = materialize_ivfpq(
        spark, ivf_assign(corpus, cents), cents, books,
        f"rrscan_{os.getpid()}",
    )

    work = tempfile.mkdtemp(prefix="smallquery_rrscan_")
    shuffled_path = os.path.join(work, "shuffled")
    (
        corpus.repartition(64, F.pmod(F.xxhash64("c_id"), F.lit(997)))
        .write.mode("overwrite")
        .parquet(shuffled_path)
    )
    t_bucketed = f"rrscan_bk_{os.getpid()}"
    spark.sql(f"DROP TABLE IF EXISTS {t_bucketed}")
    (
        corpus.repartition(n_buckets, "c_id")
        .write.bucketBy(n_buckets, "c_id")
        .sortBy("c_id")
        .saveAsTable(t_bucketed)
    )

    layouts = {
        "sorted_flat": lambda: spark.read.parquet(emb_path).select(
            F.col("vec_id").alias("c_id"), F.col("embedding").alias("vec")
        ),
        "shuffled_flat": lambda: spark.read.parquet(shuffled_path),
        "bucketed": lambda: spark.table(t_bucketed),
    }

    out: dict = {
        "n_corpus": n,
        "n_queries": n_queries,
        "n_cells": n_cells,
        "n_probe": n_probe,
        "n_buckets": n_buckets,
        "disk_preflight": disk,
        "batches": {},
    }
    try:
        for batch_label, qdf in (
            ("batch1", queries.limit(1).localCheckpoint(eager=True)),
            (f"batch{n_queries}", queries),
        ):
            row: dict = {}
            ref = None
            for name, mk in layouts.items():
                layout_df = mk()
                t0 = time.time()
                res = ivfpq_search(
                    spark, qdf, t_pq, cents, books, k=10,
                    n_probe=n_probe, rerank=4, rerank_corpus=layout_df,
                )
                # collect THEN walk the same DataFrame's executed plan
                # — checkpointing first would replace the plan with a
                # block scan and hide every parquet node (measured:
                # zero nodes in the first cut of this study)
                rows = res.collect()
                n_res = len(rows)
                wall = round(time.time() - t0, 3)
                # the corpus scan node = the one whose location is NOT
                # the PQ index table (the rerank fetch)
                nodes = [
                    m
                    for m in executed_scan_metrics(res)
                    if "ivfpqx_" not in m["location"]
                ]
                row[name] = {
                    "wall_sec": wall,
                    "n_results": n_res,
                    "corpus_scan_nodes": nodes,
                    "numFiles": sum(m["numFiles"] or 0 for m in nodes),
                    "filesSize": sum(m["filesSize"] or 0 for m in nodes),
                    "rows_decoded": sum(
                        m["numOutputRows"] or 0 for m in nodes
                    ),
                }
                key = sorted(
                    (r["q_id"], r["c_id"], r["rnk"], round(r["cos"], 9))
                    for r in rows
                )
                if ref is None:
                    ref = key
                else:
                    row[name]["same_values"] = key == ref
                print(
                    f"  {batch_label}/{name}: "
                    + json.dumps(
                        {
                            k: v
                            for k, v in row[name].items()
                            if k != "corpus_scan_nodes"
                        }
                    ),
                    file=sys.stderr,
                    flush=True,
                )
            out["batches"][batch_label] = row
    finally:
        drop_index(spark, t_pq)
        spark.sql(f"DROP TABLE IF EXISTS {t_bucketed}")

    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({
        b: {
            lay: {k: v for k, v in r.items() if k != "corpus_scan_nodes"}
            for lay, r in row.items()
        }
        for b, row in out["batches"].items()
    }))


if __name__ == "__main__":
    main()
