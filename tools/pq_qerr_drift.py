"""Third drift scenario: within-cell VARIANCE GROWTH, and the
codebook-fit signal that catches it (VERDICT r10 #6).

The two existing signals cover two drift shapes: the cell histogram
(ivf_retrain_trigger) catches CONCENTRATED drift, assignment_fit
catches DIFFUSE drift. Both are blind to a third: modes that stay PUT
but WIDEN. Nearest-centroid cosine barely moves (the centroid is still
the right centroid), cell proportions stay flat (same modes, same
mix), but the residuals outgrow the codebooks trained on the tight
corpus — ADC scoring error inflates and PQ ranking quietly degrades.

Scenario measured here (the σ-growth axis of the r9 hot-mode study,
now as an APPEND stream): 10 anchor modes in 64-dim, corpus at
per-dim jitter σ0.10 (residual norm ≈ 10% of signal), append batches
either quiet (σ0.10) or widened (σ0.30 — nearest-centroid cosine only
drops ~4%, far above assignment_fit's 0.9 ratio threshold, and the
mode MIX is unchanged so the cell histogram is flat). Recorded per
batch: pq_fit_gap (the ADC self-score gap), assignment_fit, the
post-append cell imbalance, and ADC recall@10 vs exact brute force
for 50 queries drawn from THAT batch — the ranking consequence that
makes the trigger worth paging on (ADC error grows ~40x while
neighbor spacing grows only ~3x, so error-over-spacing — what
ranking actually depends on — worsens an order of magnitude for
drifted rows).

Decision encoded from the result: pq_qerr_trigger fires at
batch_gap > 2 × build_gap (see PQ_QERR_gen100.json for the measured
separation; quiet batches sit within noise of baseline).

Usage:
    python -m tools.pq_qerr_drift [--n 500000] [--batch 50000] [--out PQ_QERR_gen100.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

from pyspark.sql import functions as F

from smallquery_spark.queries.registry import ensure_driver_confs
from smallquery_spark.session import get_session


def _gen(rng, modes, n, sigma):
    labels = rng.integers(0, len(modes), n)
    X = modes[labels] + rng.normal(0, sigma, (n, modes.shape[1]))
    return X / np.linalg.norm(X, axis=1, keepdims=True)


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
    batch_n = opt("--batch", 50_000, int)
    out_path = opt("--out", "PQ_QERR_gen100.json", str)

    from tools.diskguard import preflight

    disk = preflight(10)

    from smallquery_spark.operators.pq import (
        append_ivfpq,
        ivfpq_search,
        materialize_ivfpq,
        pq_fit_gap,
        pq_qerr_trigger,
        pq_train,
    )
    from smallquery_spark.operators.similarity import (
        assignment_fit,
        ivf_assign,
        ivf_build_centroids,
        ivf_defaults,
        ivf_retrain_trigger,
    )

    spark = get_session("smallquery-pq-qerr")
    ensure_driver_confs(spark)

    rng = np.random.default_rng(42)
    modes = rng.normal(0, 1, (10, 64))

    def to_df(X, id0):
        return spark.createDataFrame(
            [(id0 + i, [float(x) for x in X[i]]) for i in range(len(X))],
            "c_id long, vec array<double>",
        )

    X0 = _gen(rng, modes, n, 0.10)
    corpus = to_df(X0, 0).repartition(32).localCheckpoint(eager=True)
    n_cells, n_probe = ivf_defaults(n)

    t0 = time.time()
    cents = ivf_build_centroids(corpus, n_cells=n_cells)
    books = pq_train(corpus, cents, m=16)
    out: dict = {
        "n_corpus": n,
        "batch_n": batch_n,
        "n_cells": n_cells,
        "n_probe": n_probe,
        "train_sec": round(time.time() - t0, 3),
        "disk_preflight": disk,
    }

    tname = materialize_ivfpq(
        spark, ivf_assign(corpus, cents), cents, books, f"qerr_{os.getpid()}"
    )
    try:
        out["build_gap"] = round(pq_fit_gap(corpus, cents, books), 5)
        out["build_fit"] = round(assignment_fit(corpus, cents), 5)
        _, stats0 = ivf_retrain_trigger(spark, tname, n_cells=n_cells)
        out["build_imbalance"] = round(stats0["imbalance"], 3)

        from smallquery_spark.operators.similarity import knn_bruteforce

        def probe_recall_at_10(batch_X, id0):
            # ADC recall@10 vs exact brute force for 50 queries drawn
            # from THIS batch (offset ids, so the self-exclusion never
            # triggers): the ranking consequence of codebook misfit,
            # measured against the truth over the CURRENT index corpus
            qn = 50
            qdf = spark.createDataFrame(
                [
                    (id0 + i + 50_000_000, [float(x) for x in batch_X[i]])
                    for i in range(qn)
                ],
                "q_id long, vec array<double>",
            ).cache()
            res = ivfpq_search(
                spark, qdf, tname, cents, books, k=10, n_probe=n_probe
            ).select("q_id", "c_id")
            # exact set over everything appended so far
            corpus_now = corpus_all[0]
            exact = knn_bruteforce(
                qdf.select("q_id", F.col("vec").alias("q_vec")),
                corpus_now.select("c_id", F.col("vec").alias("c_vec")),
                k=10,
            ).select("q_id", "c_id")
            n_exact = exact.count()
            hits = exact.join(res, ["q_id", "c_id"], "left_semi").count()
            qdf.unpersist()
            return round(hits / max(n_exact, 1), 3)

        batches = []
        corpus_all = [corpus]  # grows with each append (exact-set base)
        id0 = n
        for i, sigma in enumerate((0.10, 0.10, 0.30, 0.30, 0.10)):
            Xb = _gen(rng, modes, batch_n, sigma)
            bdf = to_df(Xb, id0).localCheckpoint(eager=True)
            gap = pq_fit_gap(bdf, cents, books)
            fit = assignment_fit(bdf, cents)
            append_ivfpq(spark, tname, bdf, cents, books)
            corpus_all[0] = corpus_all[0].unionByName(bdf)
            _, stats = ivf_retrain_trigger(spark, tname, n_cells=n_cells)
            batches.append(
                {
                    "batch": i,
                    "sigma": sigma,
                    "gap": round(gap, 5),
                    "gap_ratio_vs_build": round(
                        gap / max(out["build_gap"], 1e-12), 3
                    ),
                    "qerr_trigger_fires": pq_qerr_trigger(
                        gap, out["build_gap"]
                    ),
                    "assignment_fit": round(fit, 5),
                    "fit_ratio_vs_build": round(
                        fit / max(out["build_fit"], 1e-12), 4
                    ),
                    "fit_trigger_fires(<0.9)": fit / out["build_fit"] < 0.9,
                    "imbalance": round(stats["imbalance"], 3),
                    "imbalance_ratio_vs_build": round(
                        stats["imbalance"] / max(out["build_imbalance"], 1e-12),
                        3,
                    ),
                    "adc_recall_at_10_vs_exact": probe_recall_at_10(
                        Xb, id0
                    ),
                }
            )
            id0 += batch_n
        out["batches"] = batches
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tname}")

    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
