"""IVF-PQ at scale: recall / probe-bytes / wall vs the full-vector
index, measured head-to-head on the SAME corpus and centroids.

The claim under test (operators/pq.py): the PQ code table answers the
same probes at a fraction of the at-rest bytes — the quantity that IS
probe cost on a 100 TB cold store — with the recall gap closable by a
bounded exact rerank. This study builds both indexes over one
gen-recipe embeddings corpus (10-mode, unit-norm, 64-dim — the
gen_fixtures distribution) and measures, for the same query batch:

- full-vector `ivf_search_indexed`: wall + recall@10 vs brute force
  (the incumbent);
- `ivfpq_search` pure-ADC and rerank@{2,4,8}x k: wall + recall@10,
  for m in {8, 16} (the bytes-vs-fidelity knob);
- at-rest bytes of the tables (fsio.parquet_stats) and the implied
  per-probe byte ratio.

Two query regimes, because PQ recall is a property of the NEIGHBOR
GAP, not just the quantizer: "indist" queries are corpus members —
on this fixture (10 modes, sigma-0.6/dim jitter = ~96% isotropic
noise) a query's top-10..100 mode-mates are spaced ~0.002 cosine
apart, far inside ADC's quantization error, so no byte-bounded code
can rank them (measured, not asserted — the numpy floor study in
SCALE.md); "planted" queries are small perturbations of corpus points
(sigma 0.02/dim), the retrieval/near-dup shape where true neighbors
sit a full gap above the bulk and ADC ranking has something to grab.

Usage:
    python -m tools.ivfpq_study [--n 2000000] [--queries 50]
                                [--out IVFPQ_gen100.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq_pa

from pyspark.sql import functions as F

from smallquery_spark.queries.registry import ensure_driver_confs
from smallquery_spark.session import get_session


def gen_embeddings(n: int, out_dir: str) -> str:
    """embeddings-only fixture, gen_fixtures conventions (seed 42,
    10 unit-norm modes + sigma-0.6 jitter, 64-dim float32, ~64 row
    groups)."""
    path = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)
    labels = rng.integers(0, 10, n)
    centroids = rng.normal(0, 1, (10, 64))
    vecs = centroids[labels] + rng.normal(0, 0.6, (n, 64))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(
        "float32"
    )
    table = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq_pa.write_table(
        table, path, compression="snappy", row_group_size=max(4096, n // 64)
    )
    return path


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
    out_path = opt("--out", "IVFPQ_gen100.json", str)
    ms = tuple(
        int(x) for x in opt("--ms", "8,16", str).split(",")
    )

    from tools.diskguard import preflight

    disk = preflight(15)

    from smallquery_spark.fsio import fs_for, table_location
    from smallquery_spark.operators.pq import (
        ivfpq_search,
        materialize_ivfpq,
        pq_train,
    )
    from smallquery_spark.operators.similarity import (
        ivf_assign,
        ivf_build_centroids,
        ivf_defaults,
        ivf_search_indexed,
        knn_bruteforce,
        materialize_ivf,
    )

    fix_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".fixtures",
        f"pqstudy_{n}",
    )
    gen_embeddings(n, fix_dir)

    spark = get_session("smallquery-ivfpq-study")
    ensure_driver_confs(spark)

    emb = spark.read.parquet(os.path.join(fix_dir, "embeddings.parquet"))
    corpus = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("vec")
    ).cache()
    n_corpus = corpus.count()
    n_cells, n_probe = ivf_defaults(n_corpus)

    # two query regimes (see module docstring)
    seed_rows = corpus.filter(F.col("c_id") < n_queries).collect()
    rng = np.random.RandomState(4242)
    planted_rows = []
    for r in seed_rows:
        v = np.array(r["vec"], dtype=np.float64)
        v = v + rng.normal(0, 0.02, len(v))
        v = v / np.linalg.norm(v)
        planted_rows.append((int(r["c_id"]) + 10_000_000, [float(x) for x in v]))
    query_sets = {
        "indist": spark.createDataFrame(
            [(int(r["c_id"]), list(r["vec"])) for r in seed_rows],
            "q_id long, vec array<double>",
        ).cache(),
        "planted": spark.createDataFrame(
            planted_rows, "q_id long, vec array<double>"
        ).cache(),
    }

    out: dict = {
        "n_corpus": n_corpus,
        "n_queries": n_queries,
        "n_cells": n_cells,
        "n_probe": n_probe,
        "ms": list(ms),
        "disk_preflight": disk,
    }

    t0 = time.time()
    cents = ivf_build_centroids(corpus, n_cells=n_cells)
    out["coarse_train_sec"] = round(time.time() - t0, 3)

    assigned = ivf_assign(corpus, cents)
    name = f"pqstudy_{os.getpid()}"
    t0 = time.time()
    t_full = materialize_ivf(spark, assigned, name)
    out["materialize_full_sec"] = round(time.time() - t0, 3)
    loc = table_location(spark, t_full)
    out["full_files"], out["full_bytes"] = fs_for(spark, loc).parquet_stats(
        loc
    )

    exact_sets: dict = {}
    pq_tables: list[str] = []
    try:
        for qmode, queries in query_sets.items():
            t0 = time.time()
            exact_sets[qmode] = (
                knn_bruteforce(
                    queries.select("q_id", F.col("vec").alias("q_vec")),
                    corpus.select("c_id", F.col("vec").alias("c_vec")),
                    k=10,
                )
                .select("q_id", "c_id")
                .cache()
            )
            n_exact = exact_sets[qmode].count()
            out[f"bruteforce_{qmode}_sec"] = round(time.time() - t0, 3)

            t0 = time.time()
            full_res = ivf_search_indexed(
                spark, queries, t_full, cents, k=10, n_probe=n_probe
            ).localCheckpoint(eager=True)
            out[f"full_search_{qmode}_sec"] = round(time.time() - t0, 3)
            hits = exact_sets[qmode].join(
                full_res.select("q_id", "c_id"), ["q_id", "c_id"], "left_semi"
            ).count()
            out[f"full_recall_{qmode}_at_10"] = round(hits / n_exact, 4)
            if qmode == "planted":
                sh = (
                    full_res.filter(F.col("rnk") == 1)
                    .filter(F.col("c_id") == F.col("q_id") - 10_000_000)
                    .count()
                )
                out["full_seed_hit_at_1"] = round(sh / queries.count(), 4)

        out["pq"] = {}
        for m in ms:
            row: dict = {}
            t0 = time.time()
            books = pq_train(corpus, cents, m=m)
            row["train_sec"] = round(time.time() - t0, 3)
            row["ksub"] = books.ksub
            t0 = time.time()
            t_pq = materialize_ivfpq(
                spark, assigned, cents, books, f"{name}_m{m}"
            )
            pq_tables.append(t_pq)
            row["materialize_sec"] = round(time.time() - t0, 3)
            loc = table_location(spark, t_pq)
            row["files"], row["bytes"] = fs_for(spark, loc).parquet_stats(loc)
            row["bytes_ratio_full_over_pq"] = round(
                out["full_bytes"] / max(row["bytes"], 1), 2
            )

            for qmode, queries in query_sets.items():
                exact = exact_sets[qmode]
                n_exact = exact.count()
                n_q = queries.count()

                def recall(df) -> float:
                    hits = exact.join(
                        df.select("q_id", "c_id"),
                        ["q_id", "c_id"],
                        "left_semi",
                    ).count()
                    return round(hits / n_exact, 4)

                def seed_hit(df) -> float | None:
                    # planted regime only: each query's true top-1 is
                    # its seed point (c_id = q_id - 10_000_000) by
                    # construction — did the index FIND the near-dup,
                    # separate from ranking the undifferentiated
                    # mode-mates recall@10 averages in.
                    if qmode != "planted":
                        return None
                    hits = (
                        df.filter(F.col("rnk") == 1)
                        .filter(
                            F.col("c_id") == F.col("q_id") - 10_000_000
                        )
                        .count()
                    )
                    return round(hits / n_q, 4)

                t0 = time.time()
                adc_res = ivfpq_search(
                    spark, queries, t_pq, cents, books, k=10, n_probe=n_probe
                ).localCheckpoint(eager=True)
                row[f"adc_{qmode}"] = {
                    "search_sec": round(time.time() - t0, 3),
                    "recall_at_10": recall(adc_res),
                    "seed_hit_at_1": seed_hit(adc_res),
                }
                for r in (2, 4, 8):
                    t0 = time.time()
                    rr = ivfpq_search(
                        spark,
                        queries,
                        t_pq,
                        cents,
                        books,
                        k=10,
                        n_probe=n_probe,
                        rerank=r,
                        rerank_corpus=corpus,
                    ).localCheckpoint(eager=True)
                    row[f"rerank_x{r}_{qmode}"] = {
                        "search_sec": round(time.time() - t0, 3),
                        "recall_at_10": recall(rr),
                        "seed_hit_at_1": seed_hit(rr),
                    }
            out["pq"][f"m{m}"] = row
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_full}")
        for t_pq in pq_tables:
            spark.sql(f"DROP TABLE IF EXISTS {t_pq}")

    with open(out_path, "w") as f:
        json.dump(out, f)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
