"""Retrain pause decomposition — the measure-first input for the
non-blocking-retrain decision (VERDICT r12 #4).

RETRAIN_CYCLE_gen100.json measured the retrain PAUSE (190 s = 5.3 epoch
cadences at gen100) but not its composition. The candidate fixes differ
by which phase they move out of the lease-held window:

- **fit-outside-lease** (cheap): train the new centroids+codebooks from
  a corpus snapshot BEFORE acquiring the lease — epochs keep appending
  during the fit; the lease covers only encode+stage+swap. Sound
  because the quantizer is a statistical artifact (a fit on a snapshot
  missing the last in-flight epochs is as good as one including them),
  while the ENCODE must run under the lease so the staged tree captures
  exactly the corpus the swap publishes.
- **full retrain-aside** (expensive): encode outside the lease too,
  then replay the delta epochs under the new quantizer at swap time —
  requires deferring compaction/marker-GC for the aside window,
  double-encoding the delta, and a second fencing discipline.

This study times each phase of the REAL protocol's building blocks at
the same gen100 geometry the cycle curve used (600k x 64-dim, 1024
cells, m=16, the measured ivf_defaults shape), so the decision is a
ratio, not a guess: if fit dominates, fit-outside-lease captures most
of the win at none of the aside protocol's complexity; the remainder
(encode+swap) is the floor any aside design would still pay at swap
time in replay form.

Usage:
    python -m tools.retrain_split_study [--n 600000] [--dim 64]
        [--out RETRAIN_SPLIT_gen100.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

from smallquery_spark.queries.registry import ensure_driver_confs
from smallquery_spark.session import get_session


def main() -> None:
    argv = sys.argv[1:]

    def opt(flag, default, cast):
        if flag in argv:
            i = argv.index(flag)
            v = cast(argv[i + 1])
            del argv[i : i + 2]
            return v
        return default

    n = opt("--n", 600_000, int)
    dim = opt("--dim", 64, int)
    out_path = opt("--out", "RETRAIN_SPLIT_gen100.json", str)

    from tools.diskguard import preflight

    disk = preflight(10)

    from pyspark.sql import functions as F

    from smallquery_spark.fsio import fs_for, join_uri
    from smallquery_spark.operators.pq import (
        _meta_rows,
        _retrain_paths,
        _sync_partitions,
        _write_meta_fresh,
        EPOCHS_DIR,
        drop_index,
        index_gen,
        materialize_ivfpq,
        pq_encode,
        pq_train,
        quantizer_token,
        retrain_ivfpq,
    )
    from smallquery_spark.operators.similarity import (
        ivf_assign,
        ivf_build_centroids,
        ivf_defaults,
    )

    spark = get_session("smallquery-retrain-split")
    ensure_driver_confs(spark)

    rng = np.random.default_rng(42)
    modes = rng.normal(0, 1, (10, dim))
    labels = rng.integers(0, len(modes), n)
    X = modes[labels] + rng.normal(0, 0.10, (n, dim))
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    corpus = (
        spark.createDataFrame(
            [(i, [float(x) for x in X[i]]) for i in range(n)],
            "c_id long, vec array<double>",
        )
        .repartition(32)
        .localCheckpoint(eager=True)
    )
    n_cells, n_probe = ivf_defaults(n)
    out: dict = {
        "n": n,
        "dim": dim,
        "n_cells": n_cells,
        "m": 16,
        "disk_preflight": disk,
    }

    cents0 = ivf_build_centroids(corpus, n_cells=n_cells)
    books0 = pq_train(corpus, cents0, m=16)
    tname = materialize_ivfpq(
        spark, ivf_assign(corpus, cents0), cents0, books0, f"rts_{os.getpid()}"
    )
    try:
        # ---- phase-timed retrain: the SAME building blocks
        # _retrain_ivfpq_locked runs, in its order ----------------------
        t0 = time.time()
        cents = ivf_build_centroids(corpus, n_cells=n_cells)
        fit_centroids = time.time() - t0

        t0 = time.time()
        books = pq_train(corpus, cents, m=16)
        fit_codebooks = time.time() - t0

        token = quantizer_token(cents, books)
        loc, staged, old = _retrain_paths(spark, tname)
        fs = fs_for(spark, loc)
        t0 = time.time()
        (
            pq_encode(
                ivf_assign(corpus, cents), cents, books, code_format="array"
            )
            .select("c_id", "cell", "code")
            .repartition(F.col("cell"))
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(staged)
        )
        encode_stage = time.time() - t0

        t0 = time.time()
        for nm in fs.list_names(join_uri(loc, EPOCHS_DIR)):
            if nm.startswith("epoch-"):
                txt = fs.read_text(join_uri(loc, EPOCHS_DIR, nm))
                if txt is not None:
                    fs.write_text(join_uri(staged, EPOCHS_DIR, nm), txt)
        _write_meta_fresh(spark, staged, _meta_rows(cents, books, token))
        meta_ledger = time.time() - t0

        t0 = time.time()
        fs.rename(loc, old)
        fs.rename(staged, loc)
        fs.delete(old)
        fs.delete(staged)
        _sync_partitions(spark, tname)
        swap_sync = time.time() - t0

        assert index_gen(spark, tname) == token

        fit = fit_centroids + fit_codebooks
        held_today = fit + encode_stage + meta_ledger + swap_sync
        held_fit_outside = encode_stage + meta_ledger + swap_sync
        out["phases_sec"] = {
            "fit_centroids": round(fit_centroids, 3),
            "fit_codebooks": round(fit_codebooks, 3),
            "encode_stage": round(encode_stage, 3),
            "meta_ledger": round(meta_ledger, 3),
            "swap_sync": round(swap_sync, 3),
        }
        out["lease_held_today_sec"] = round(held_today, 3)
        out["lease_held_fit_outside_sec"] = round(held_fit_outside, 3)
        out["fit_fraction"] = round(fit / held_today, 3)
        out["pause_reduction_fit_outside"] = round(
            1 - held_fit_outside / held_today, 3
        )

        # ---- control: one UN-instrumented full retrain through the real
        # entry point, so the phase sum is sanity-checked against the
        # protocol's actual wall (same corpus, deterministic training) --
        t0 = time.time()
        retrain_ivfpq(spark, tname, corpus, m=16)
        out["control_full_retrain_sec"] = round(time.time() - t0, 3)
    finally:
        drop_index(spark, tname)

    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
