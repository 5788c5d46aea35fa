"""IVF continuous-ingest curve (VERDICT r7 item 2, third deliverable).

append_ivf's scale claim is that embedding ingest is APPEND-BOUNDED:
each batch pays one assignment projection + one batch-sized clustered
write, independent of how large the at-rest index has grown. This tool
stages the embeddings corpus as K equal batches, builds the index from
batch 0 (training the quantizer there — the production shape: frozen
centroids, later arrivals assign to them), then appends batches 1..K-1,
recording per-append wall seconds, index rows before the append, the
cell-histogram drift statistic (ivf_retrain_trigger), and the
fragmented-cell compaction cadence (compact_ivf_cells every
``--compact-every`` appends, timed separately — file counts must stay
bounded without the compaction cost being hidden inside append wall).

After ingest, the VALUE gate: a probe batch over the appended index
must return exactly the rows the same probe returns over a full
materialize_ivf rebuild of the union (same centroids), and recall@10
vs brute force is recorded so the appended index's quality is a
number, not an assumption.

Usage:
    python -m tools.ivf_append_curve [sf_dir] [--batches K]
        [--queries N] [--compact-every M] [--out OUT.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

from smallquery_spark.queries.registry import ensure_driver_confs, t
from smallquery_spark.session import get_session


def main() -> None:
    argv = sys.argv[1:]
    out_path, k_batches, n_queries, compact_every = None, 8, 20, 4
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    if "--batches" in argv:
        i = argv.index("--batches")
        k_batches = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    if "--queries" in argv:
        i = argv.index("--queries")
        n_queries = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    if "--compact-every" in argv:
        i = argv.index("--compact-every")
        compact_every = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"

    from tools.diskguard import preflight

    disk = preflight(10)

    from smallquery_spark.operators.similarity import (
        append_ivf,
        assignment_fit,
        compact_ivf_cells,
        ivf_assign,
        ivf_build_centroids,
        ivf_defaults,
        ivf_retrain_trigger,
        ivf_search_indexed,
        knn_bruteforce,
        materialize_ivf,
    )

    spark = get_session("smallquery-ivf-append-curve")
    ensure_driver_confs(spark)

    emb = t(spark, sf_dir, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("vec")
    ).cache()
    n_corpus = corpus.count()
    n_cells, n_probe = ivf_defaults(n_corpus)
    batches = [
        corpus.filter(F.abs(F.hash("c_id")) % k_batches == i)
        for i in range(k_batches)
    ]
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("vec")
    )

    name = f"apcurve_{os.getpid()}"
    tname, tname_rb = f"ivfx_{name}", f"ivfx_{name}_rb"
    out: dict = {
        "sf_dir": sf_dir,
        "n_corpus": n_corpus,
        "n_cells": n_cells,
        "n_probe": n_probe,
        "batches": k_batches,
        "compact_every": compact_every,
        "disk_preflight": disk,
        "per_append": [],
    }
    try:
        t0 = time.time()
        cents = ivf_build_centroids(batches[0], n_cells=n_cells)
        out["train_sec"] = round(time.time() - t0, 3)
        t0 = time.time()
        materialize_ivf(spark, ivf_assign(batches[0], cents), name)
        out["initial_materialize_sec"] = round(time.time() - t0, 3)
        # drift baseline: the quantizer's own imbalance at build time —
        # the relative trigger asks "did the corpus MOVE", not "was the
        # quantizer coarse" (it is: 1024 cells over a 10-mode fixture)
        _, base_stats = ivf_retrain_trigger(spark, tname)
        out["baseline_imbalance"] = base_stats["imbalance"]
        # fit baseline for the r9 diffuse-drift signal: in-distribution
        # appends must stay ~1.0 of this (the false-positive side of
        # the 0.9 trigger ratio; the drift side measures 0.33-0.36)
        base_fit = assignment_fit(spark.table(tname), cents)
        out["baseline_fit"] = round(base_fit, 4)
        index_rows = base_stats["n_rows"]
        for i, batch in enumerate(batches[1:], start=1):
            n_batch = batch.count()
            batch_fit = assignment_fit(batch, cents)
            t0 = time.time()
            append_ivf(spark, tname, batch, cents)
            append_sec = round(time.time() - t0, 3)
            compact_sec, n_compacted = None, None
            if i % compact_every == 0:
                t0 = time.time()
                n_compacted = compact_ivf_cells(spark, tname)
                compact_sec = round(time.time() - t0, 3)
            retrain, stats = ivf_retrain_trigger(
                spark, tname, baseline_imbalance=out["baseline_imbalance"]
            )
            out["per_append"].append(
                {
                    "append": i,
                    "batch_rows": n_batch,
                    "index_rows_before": index_rows,
                    "append_sec": append_sec,
                    "compact_sec": compact_sec,
                    "cells_compacted": n_compacted,
                    "imbalance": stats["imbalance"],
                    "retrain_triggered": retrain,
                    "fit_ratio": round(batch_fit / base_fit, 3)
                    if base_fit
                    else None,
                }
            )
            index_rows = stats["n_rows"]
            print(f"  {out['per_append'][-1]}", file=sys.stderr, flush=True)
        walls = [e["append_sec"] for e in out["per_append"]]
        out["append_wall_drift"] = (
            round(walls[-1] / walls[0], 2) if len(walls) >= 2 else None
        )

        # value gate: appended index == full rebuild, probe-for-probe
        materialize_ivf(spark, ivf_assign(corpus, cents), f"{name}_rb")
        ap = ivf_search_indexed(
            spark, queries, tname, cents, k=10, n_probe=n_probe
        ).select("q_id", "c_id").localCheckpoint(eager=True)
        rb = ivf_search_indexed(
            spark, queries, tname_rb, cents, k=10, n_probe=n_probe
        ).select("q_id", "c_id")
        out["same_as_rebuild"] = (
            ap.exceptAll(rb).count() == 0 and rb.exceptAll(ap).count() == 0
        )
        exact = knn_bruteforce(
            queries.select("q_id", F.col("vec").alias("q_vec")),
            corpus.select("c_id", F.col("vec").alias("c_vec")),
            k=10,
        ).select("q_id", "c_id").localCheckpoint(eager=True)
        hits = exact.join(ap, ["q_id", "c_id"], "left_semi").count()
        n_exact = exact.count()
        out["recall_at_10"] = round(hits / n_exact, 4) if n_exact else None
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tname}")
        spark.sql(f"DROP TABLE IF EXISTS {tname_rb}")
        corpus.unpersist()

    line = json.dumps(out)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
