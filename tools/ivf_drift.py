"""IVF retrain-trigger positive case (VERDICT r8 item 2).

IVF_APPEND_CURVE_gen100.json proved the drift watch stays QUIET across
in-distribution appends; this tool proves the watch FIRES on real
drift and that firing is worth acting on — under BOTH drift shapes,
because the gen10 smoke run of the first cut produced a real finding:
the cell-histogram imbalance statistic is BLIND to diffuse drift. An
injected sigma-0.6 mode at cosine 0.38 from every trained centroid
spread across so many cells that imbalance DECLINED (6.13 -> 4.96
over 8 appends) while the mode's recall@10 sat at 0.44. The fix is a
second, batch-bounded signal — assignment_fit (mean nearest-centroid
cosine of each append batch vs the build-time corpus fit) — and this
tool measures both signals against both drift shapes:

- ``diffuse``      — new mode with the fixture's own spread
                     (sigma 0.6): imbalance stays quiet (measured),
                     fit craters -> the FIT trigger fires.
- ``concentrated`` — tight new mode (sigma 0.15): both signals watch;
                     fit fires first here too (measured) — drift is
                     visible at the first drifted batch.
- ``concentrated_imbonly`` — same tight mode with the fit signal
                     DISABLED: measured at gen100, this NEVER fires —
                     an out-of-distribution mode is near-equidistant
                     from ~all 1024 centroids (cos 0.38), so sigma-0.15
                     jitter still flips the argmax and the mass
                     diffuses across cells; no hot cell forms. The
                     histogram is structurally blind to OOD drift at
                     high cell counts, not just to diffuse OOD drift.
- ``hot_topic``    — the drift shape imbalance DOES own: a volume
                     explosion on an EXISTING mode (direction = a
                     trained centroid, sigma 0.15). Fit stays quiet
                     (the quantizer still fits every vector); the one
                     cell's mass crosses 2x baseline and the histogram
                     trigger fires. Together with fit this covers both
                     real drift shapes: new-mode arrival (fit) and
                     existing-mode skew (imbalance).

Per scenario: append batches until a watched signal fires (then keep
appending to --min-batches so retrain recovery is measured at a
stated drift level), recording imbalance, vs-baseline ratio, batch
fit, fit ratio; at the stop round measure drift-mode recall@10 vs
brute force and probe cost under the FROZEN centroids (the no-retrain
control), then retrain over the full current corpus, re-materialize,
and measure the same numbers — the recovery the trigger buys.

Usage:
    python -m tools.ivf_drift [sf_dir] [--batch-frac F=0.02]
        [--max-batches N=10] [--min-batches N=1] [--queries N=20]
        [--fit-ratio R=0.9] [--sigma S] [--scenarios a,b,c]
        [--out OUT.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
from pyspark.sql import functions as F

from smallquery_spark.queries.registry import ensure_driver_confs, t
from smallquery_spark.session import get_session


def _vec_df(spark, vecs, ids, id_name):
    import pandas as pd

    pdf = pd.DataFrame({id_name: ids, "vec": list(vecs.astype("float32"))})
    return spark.createDataFrame(pdf, f"{id_name} long, vec array<float>")


def _mode_vecs(rng, direction, n, sigma, dim):
    vecs = direction[None, :] + rng.normal(0, sigma, (n, dim))
    return vecs / np.linalg.norm(vecs, axis=1, keepdims=True)


def _recall_and_cost(spark, queries, tname, cents, n_probe):
    """(recall@10 vs brute force over the CURRENT index corpus, mean
    candidate rows per query) for a probe batch with ``cents``."""
    from smallquery_spark.operators.similarity import (
        ivf_probe_cells,
        ivf_search_indexed,
        knn_bruteforce,
    )

    cur = spark.table(tname).select("c_id", "vec")
    exact = (
        knn_bruteforce(
            queries.select("q_id", F.col("vec").alias("q_vec")),
            cur.select("c_id", F.col("vec").alias("c_vec")),
            k=10,
        )
        .select("q_id", "c_id")
        .localCheckpoint(eager=True)
    )
    approx = (
        ivf_search_indexed(
            spark, queries, tname, cents, k=10, n_probe=n_probe
        )
        .select("q_id", "c_id")
        .localCheckpoint(eager=True)
    )
    hits = exact.join(approx, ["q_id", "c_id"], "left_semi").count()
    n_exact = exact.count()
    hist = {
        r["cell"]: r["count"]
        for r in spark.table(tname).groupBy("cell").count().collect()
    }
    probes = ivf_probe_cells(queries, cents, n_probe).select("q_id", "cell")
    cost = sum(hist.get(r["cell"], 0) for r in probes.collect()) / max(
        queries.count(), 1
    )
    return (round(hits / n_exact, 4) if n_exact else None, round(cost, 1))


def main() -> None:
    argv = sys.argv[1:]
    out_path, batch_frac, max_batches = None, 0.02, 10
    n_queries, fit_ratio, min_batches = 20, 0.9, 1
    scenarios = ("diffuse", "concentrated", "concentrated_imbonly")
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    if "--batch-frac" in argv:
        i = argv.index("--batch-frac")
        batch_frac = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    if "--max-batches" in argv:
        i = argv.index("--max-batches")
        max_batches = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    if "--min-batches" in argv:
        # keep appending drift past the first fire (mode mass grows),
        # so the retrain recovery is measured at a stated drift level
        i = argv.index("--min-batches")
        min_batches = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    if "--queries" in argv:
        i = argv.index("--queries")
        n_queries = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    if "--fit-ratio" in argv:
        i = argv.index("--fit-ratio")
        fit_ratio = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    retrain_method = "kmeans"
    if "--retrain-method" in argv:
        # "kmeans_parallel" retrains the quantizer on the WHOLE drifted
        # corpus — the C37 seeding exists exactly for the case a
        # bounded sample under-represents a new mode (a 2% mode is
        # ~80 rows in the sampled trainer's 4096)
        i = argv.index("--retrain-method")
        retrain_method = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sigma_override = None
    if "--sigma" in argv:
        # high-dim note: sigma is PER-DIMENSION — at dim 64 the jitter
        # NORM is sigma*8, so 0.15 is already a wide mode (norm ~1.2 vs
        # the unit direction; measured fit 0.65). A genuinely tight
        # mode needs sigma ~0.03 (norm 0.24, fit ~0.97).
        i = argv.index("--sigma")
        sigma_override = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    if "--scenarios" in argv:
        i = argv.index("--scenarios")
        scenarios = tuple(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else "/root/repo/.fixtures/gen100"

    from tools.diskguard import preflight

    disk = preflight(15)

    from smallquery_spark.operators.similarity import (
        append_ivf,
        assignment_fit,
        ivf_assign,
        ivf_build_centroids,
        ivf_defaults,
        ivf_retrain_trigger,
        materialize_ivf,
    )

    spark = get_session("smallquery-ivf-drift")
    ensure_driver_confs(spark)

    emb = t(spark, sf_dir, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("vec")
    ).cache()
    n_corpus = corpus.count()
    dim = len(corpus.select("vec").first()["vec"])
    n_cells, n_probe = ivf_defaults(n_corpus)
    max_id = int(corpus.agg(F.max("c_id")).collect()[0][0])

    name = f"drift_{os.getpid()}"
    tname = f"ivfx_{name}"
    out: dict = {
        "sf_dir": sf_dir,
        "n_corpus": n_corpus,
        "n_cells": n_cells,
        "n_probe": n_probe,
        "batch_rows": int(batch_frac * n_corpus),
        "fit_ratio_threshold": fit_ratio,
        "min_batches": min_batches,
        "disk_preflight": disk,
        "scenarios": {},
    }
    # _imbonly: ignore the fit signal — the histogram trigger's own
    # positive case (concentrated mass must cross 2x baseline on its own)
    sigmas = {
        "diffuse": 0.6,
        "concentrated": 0.15,
        "concentrated_imbonly": 0.15,
        "hot_topic": 0.15,
    }
    try:
        t0 = time.time()
        cents = ivf_build_centroids(corpus, n_cells=n_cells)
        out["train_sec"] = round(time.time() - t0, 3)
        for scen in scenarios:
            sigma = sigma_override if sigma_override is not None else sigmas[scen]
            use_fit = not scen.endswith("_imbonly")
            materialize_ivf(spark, ivf_assign(corpus, cents), name)
            _, base_stats = ivf_retrain_trigger(spark, tname, n_cells=n_cells)
            base_fit = assignment_fit(spark.table(tname), cents)
            rng = np.random.RandomState(4242)
            if scen == "hot_topic":
                # existing-mode volume explosion: aim at a trained
                # centroid — the quantizer FITS this drift (fit stays
                # quiet); only the histogram can see it
                direction = np.array(cents[0], dtype=np.float64)
            else:
                direction = rng.normal(0, 1, dim)
            direction /= np.linalg.norm(direction)
            qvecs = _mode_vecs(rng, direction, n_queries, sigma, dim)
            queries = _vec_df(
                spark, qvecs, np.arange(n_queries, dtype=np.int64), "q_id"
            ).localCheckpoint(eager=True)
            sc: dict = {
                "sigma": sigma,
                "baseline": base_stats,
                "baseline_fit": round(base_fit, 4),
                "cos_mode_to_nearest_centroid": round(
                    float(
                        max(
                            float(
                                np.dot(
                                    direction,
                                    np.array(c) / np.linalg.norm(c),
                                )
                            )
                            for c in cents
                        )
                    ),
                    4,
                ),
                "curve": [],
            }
            n_batch = out["batch_rows"]
            next_id = max_id + 1
            trigger_round, trigger_signal = None, None
            for i in range(1, max_batches + 1):
                batch = _vec_df(
                    spark,
                    _mode_vecs(rng, direction, n_batch, sigma, dim),
                    np.arange(next_id, next_id + n_batch, dtype=np.int64),
                    "c_id",
                )
                next_id += n_batch
                batch_fit = assignment_fit(batch, cents)
                t0 = time.time()
                append_ivf(spark, tname, batch, cents)
                append_sec = round(time.time() - t0, 3)
                fired_imb, stats = ivf_retrain_trigger(
                    spark,
                    tname,
                    baseline_imbalance=sc["baseline"]["imbalance"],
                    n_cells=n_cells,
                )
                fr = batch_fit / base_fit if base_fit else 0.0
                fired_fit = use_fit and fr < fit_ratio
                sc["curve"].append(
                    {
                        "batch": i,
                        "append_sec": append_sec,
                        "imbalance": stats["imbalance"],
                        "vs_baseline": round(
                            stats["imbalance"] / sc["baseline"]["imbalance"],
                            2,
                        ),
                        "max_cell": stats["max_cell"],
                        "batch_fit": round(batch_fit, 4),
                        "fit_ratio": round(fr, 3),
                        "fired_imbalance": fired_imb,
                        "fired_fit": fired_fit,
                    }
                )
                print(f"  {scen} {sc['curve'][-1]}", file=sys.stderr, flush=True)
                if (fired_imb or fired_fit) and trigger_round is None:
                    trigger_round = i
                    trigger_signal = (
                        "imbalance" if fired_imb else "fit"
                    ) if not (fired_imb and fired_fit) else "both"
                if trigger_round is not None and i >= min_batches:
                    break
            sc["trigger_round"] = trigger_round
            sc["trigger_signal"] = trigger_signal

            if trigger_round is not None:
                # frozen-centroid numbers at the trigger point: the
                # no-retrain control
                recall_f, cost_f = _recall_and_cost(
                    spark, queries, tname, cents, n_probe
                )
                sc["recall_drift_frozen"] = recall_f
                sc["probe_rows_per_query_frozen"] = cost_f
                # act: retrain over the full current corpus, rebuild
                cur = (
                    spark.table(tname)
                    .select("c_id", "vec")
                    .localCheckpoint(eager=True)
                )
                t0 = time.time()
                cents2 = ivf_build_centroids(
                    cur, n_cells=n_cells, method=retrain_method
                )
                sc["retrain_sec"] = round(time.time() - t0, 3)
                sc["retrain_method"] = retrain_method
                t0 = time.time()
                materialize_ivf(spark, ivf_assign(cur, cents2), name)
                sc["rematerialize_sec"] = round(time.time() - t0, 3)
                _, post = ivf_retrain_trigger(spark, tname, n_cells=n_cells)
                sc["post_retrain_imbalance"] = post["imbalance"]
                sc["post_retrain_fit"] = round(
                    assignment_fit(spark.table(tname), cents2), 4
                )
                recall_r, cost_r = _recall_and_cost(
                    spark, queries, tname, cents2, n_probe
                )
                sc["recall_drift_retrained"] = recall_r
                sc["probe_rows_per_query_retrained"] = cost_r
            out["scenarios"][scen] = sc
            print(
                f"{scen}: trigger={trigger_signal}@{trigger_round}",
                file=sys.stderr,
                flush=True,
            )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tname}")
        corpus.unpersist()

    line = json.dumps(out)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
