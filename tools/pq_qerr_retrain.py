"""Close the qerr loop: signal → retrain_ivfpq → recovery, measured.

PQ_QERR_gen100.json proves `pq_fit_gap` FIRES (41x) on variance-
widened appends while the other two signals stay silent. This study
measures the RESPONSE the trigger's docstring prescribes: build the
same drifted state (500k σ0.10 corpus + two σ0.30 append batches),
then run `retrain_ivfpq` on the current corpus — one protocol, live
index, directory-swap commit — and record:

- the drifted batch's gap BEFORE retrain (vs the old quantizer) and
  AFTER (vs the new one): does codebook fit actually recover?
- ADC recall@10-vs-exact for drifted-batch queries before/after;
- probes against the retrained index with the OLD quantizer raise
  StaleQuantizerError (asserted in-run — the lifecycle holding under
  the exact workflow it was built for);
- the retrained quantizer served from RELOADED meta answers
  identically to the returned in-memory one (asserted in-run).

Usage:
    python -m tools.pq_qerr_retrain [--n 500000] [--batch 50000]
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
from tools.pq_qerr_drift import _gen


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
    out_path = opt("--out", "PQ_QERR_RETRAIN_gen100.json", str)

    from tools.diskguard import preflight

    disk = preflight(10)

    from smallquery_spark.errors import StaleQuantizerError
    from smallquery_spark.operators.pq import (
        append_ivfpq,
        ivfpq_search,
        load_index_meta,
        materialize_ivfpq,
        pq_fit_gap,
        pq_qerr_trigger,
        pq_train,
        retrain_ivfpq,
    )
    from smallquery_spark.operators.similarity import (
        ivf_assign,
        ivf_build_centroids,
        ivf_defaults,
        knn_bruteforce,
    )

    spark = get_session("smallquery-pq-qerr-retrain")
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
    cents = ivf_build_centroids(corpus, n_cells=n_cells)
    books = pq_train(corpus, cents, m=16)
    out: dict = {
        "n_corpus": n,
        "batch_n": batch_n,
        "n_cells": n_cells,
        "n_probe": n_probe,
        "disk_preflight": disk,
    }

    tname = materialize_ivfpq(
        spark, ivf_assign(corpus, cents), cents, books, f"qrt_{os.getpid()}"
    )
    try:
        out["build_gap"] = round(pq_fit_gap(corpus, cents, books), 5)

        # drift: two widened batches appended (the fired-trigger state)
        current = corpus
        drift_dfs = []
        id0 = n
        for _ in range(2):
            Xb = _gen(rng, modes, batch_n, 0.30)
            bdf = to_df(Xb, id0).localCheckpoint(eager=True)
            append_ivfpq(spark, tname, bdf, cents, books)
            current = current.unionByName(bdf)
            drift_dfs.append((Xb, id0))
            id0 += batch_n
        current = current.localCheckpoint(eager=True)

        drift_batch = to_df(drift_dfs[-1][0], drift_dfs[-1][1])
        gap_before = pq_fit_gap(drift_batch, cents, books)
        out["drift_gap_before"] = round(gap_before, 5)
        out["trigger_fired"] = pq_qerr_trigger(gap_before, out["build_gap"])

        def recall_at_10(c, b):
            qn = 50
            Xq, qid0 = drift_dfs[-1]
            qdf = spark.createDataFrame(
                [
                    (qid0 + i + 50_000_000, [float(x) for x in Xq[i]])
                    for i in range(qn)
                ],
                "q_id long, vec array<double>",
            ).cache()
            res = ivfpq_search(
                spark, qdf, tname, c, b, k=10, n_probe=n_probe
            ).select("q_id", "c_id")
            exact = knn_bruteforce(
                qdf.select("q_id", F.col("vec").alias("q_vec")),
                current.select("c_id", F.col("vec").alias("c_vec")),
                k=10,
            ).select("q_id", "c_id")
            n_exact = exact.count()
            hits = exact.join(res, ["q_id", "c_id"], "left_semi").count()
            qdf.unpersist()
            return round(hits / max(n_exact, 1), 3)

        out["drift_recall_before"] = recall_at_10(cents, books)

        # the response: one protocol over the CURRENT corpus
        t0 = time.time()
        cents2, books2 = retrain_ivfpq(spark, tname, current)
        out["retrain_sec"] = round(time.time() - t0, 3)

        # lifecycle holds: the old quantizer is refused
        try:
            ivfpq_search(
                spark,
                drift_batch.select(F.col("c_id").alias("q_id"), "vec").limit(3),
                tname, cents, books, k=3, n_probe=4,
            )
            out["old_quantizer_refused"] = False
        except StaleQuantizerError:
            out["old_quantizer_refused"] = True

        gap_after = pq_fit_gap(drift_batch, cents2, books2)
        out["drift_gap_after"] = round(gap_after, 5)
        out["corpus_gap_after"] = round(
            pq_fit_gap(corpus, cents2, books2), 5
        )
        out["trigger_after"] = pq_qerr_trigger(gap_after, out["build_gap"])
        out["drift_recall_after"] = recall_at_10(cents2, books2)

        # reloaded meta serves identically to the returned quantizer
        cl, bl = load_index_meta(spark, tname)
        qdf = drift_batch.select(F.col("c_id").alias("q_id"), "vec").limit(20)
        r1 = ivfpq_search(spark, qdf, tname, cents2, books2, k=5, n_probe=8)
        r2 = ivfpq_search(spark, qdf, tname, cl, bl, k=5, n_probe=8)
        out["reloaded_meta_identical"] = (
            r1.exceptAll(r2).count() == 0 and r2.exceptAll(r1).count() == 0
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tname}")

    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
