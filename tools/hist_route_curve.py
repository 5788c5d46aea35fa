"""Trigger-cost routing curve at the 100 TB ratio (VERDICT r11 #3's
perf half).

r11 measured the incremental cell-histogram trigger LOSING to the index
scan at index = 20x batch (crossover ~35x) — because its fold re-ran the
batch assignment UDF (~134 us/row). r12 changed the economics twice:

- the fold input is now FREE: `append_ivfpq_epoch` returns the per-cell
  rows it committed (computed during staging anyway), so
  `IngestHistogram.fold` is a driver-side dict merge bounded by
  n_cells — no second pass over the batch at all;
- the routing is a DEFAULT inside IngestHistogram: fold path once
  index_rows >= 35x last_batch_rows, scan below (where the scan is
  cheap by definition AND authoritative — it resyncs the running
  counts for free).

This curve runs the large-ratio shape the routing exists for — a 2M-row
index ingesting 50k-row epochs (ratio 40x -> 48x) — and records BOTH
costs per epoch: the routed fold-path trigger (expected flat,
milliseconds) and an explicitly-forced scan trigger (expected to grow
with index rows — the one per-epoch term that would break "flat ingest"
at 100 TB). Decisions and stats are asserted identical per epoch. The
r11 inversion below the crossover stands (the scan stays the
small-ratio default); what this artifact adds is the measured large-
ratio separation that justifies the cutover — and the honest note that
with delta folds the fold path's cost argument now holds at ANY ratio,
so the scan's remaining value below the crossover is authority
(self-healing counts), not speed.

Usage:
    python -m tools.hist_route_curve [--n 2000000] [--batch 50000]
        [--epochs 8] [--dim 64] [--out HIST_ROUTE_gen100.json]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

import numpy as np
from pyspark.sql import functions as F

from smallquery_spark.queries.registry import ensure_driver_confs
from smallquery_spark.session import get_session


def _gen(rng, modes, n, sigma=0.10):
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

    n = opt("--n", 2_000_000, int)
    batch_n = opt("--batch", 50_000, int)
    k_epochs = opt("--epochs", 8, int)
    dim = opt("--dim", 64, int)
    out_path = opt("--out", "HIST_ROUTE_gen100.json", str)

    from tools.diskguard import preflight

    disk = preflight(15)

    from smallquery_spark.operators.pq import (
        append_ivfpq_epoch,
        drop_index,
        load_index_meta,
        materialize_ivfpq,
        pq_train,
    )
    from smallquery_spark.operators.similarity import (
        IngestHistogram,
        ivf_assign,
        ivf_build_centroids,
        ivf_defaults,
        ivf_retrain_trigger,
    )

    spark = get_session("smallquery-hist-route-curve")
    ensure_driver_confs(spark)

    rng = np.random.default_rng(42)
    modes = rng.normal(0, 1, (10, dim))

    def to_df(X, id0):
        return spark.createDataFrame(
            [(id0 + i, [float(x) for x in X[i]]) for i in range(len(X))],
            "c_id long, vec array<double>",
        )

    out: dict = {
        "n_corpus": n,
        "batch_n": batch_n,
        "epochs": k_epochs,
        "dim": dim,
        "index_batch_ratio_start": round(n / batch_n, 1),
        "disk_preflight": disk,
        "per_epoch": [],
    }

    corpus = to_df(_gen(rng, modes, n), 0).repartition(32).localCheckpoint(
        eager=True
    )
    n_cells, n_probe = ivf_defaults(n)
    out["n_cells"] = n_cells
    cents = ivf_build_centroids(corpus, n_cells=n_cells)
    books = pq_train(corpus, cents, m=16)
    t0 = time.time()
    tname = materialize_ivfpq(
        spark, ivf_assign(corpus, cents), cents, books, f"hrc_{os.getpid()}"
    )
    out["initial_materialize_sec"] = round(time.time() - t0, 3)
    _, stats0 = ivf_retrain_trigger(spark, tname, n_cells=n_cells)
    out["build_imbalance"] = round(stats0["imbalance"], 3)

    work = tempfile.mkdtemp(prefix="smallquery_hrcurve_")
    slices = os.path.join(work, "slices")
    id0 = n
    for _ in range(k_epochs):
        to_df(_gen(rng, modes, batch_n), id0).coalesce(1).write.mode(
            "append"
        ).parquet(slices)
        id0 += batch_n
    parts = sorted(glob.glob(os.path.join(slices, "part-*.parquet")))
    base_t = time.time() - 10 * len(parts)
    for i, p in enumerate(parts):
        os.utime(p, (base_t + 10 * i, base_t + 10 * i))

    hist = IngestHistogram(spark, tname, n_cells=n_cells)
    schema = spark.read.parquet(slices).schema
    sdf = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(slices)
    )

    def _ingest(batch_df, epoch_id):
        sess = batch_df.sparkSession
        e0 = time.time()
        batch = batch_df.localCheckpoint(eager=True)
        nb = batch.count()
        cl, bl = load_index_meta(sess, tname)
        t1 = time.time()
        delta = append_ivfpq_epoch(
            sess, tname, batch, cl, bl, epoch_id=int(epoch_id)
        )
        append_sec = time.time() - t1
        # routed default: at this ratio the fold path must answer
        t1 = time.time()
        hist.fold(delta)
        trig_f, stats_f = hist.trigger(
            baseline_imbalance=out["build_imbalance"]
        )
        fold_sec = time.time() - t1
        # the explicit scan, timed for the curve (and the identity pin)
        t1 = time.time()
        sess.catalog.refreshTable(tname)
        trig_s, stats_s = ivf_retrain_trigger(
            sess, tname,
            baseline_imbalance=out["build_imbalance"], n_cells=n_cells,
        )
        scan_sec = time.time() - t1
        src = stats_f.pop("source")
        identical = (trig_f, stats_f) == (trig_s, stats_s)
        out["per_epoch"].append(
            {
                "epoch": int(epoch_id),
                "batch_rows": nb,
                "index_rows": stats_s["n_rows"],
                "ratio": round(stats_s["n_rows"] / nb, 1),
                "append_sec": round(append_sec, 3),
                "fold_trigger_sec": round(fold_sec, 4),
                "scan_trigger_sec": round(scan_sec, 3),
                "routed_source": src,
                "decision_and_stats_identical": identical,
                "epoch_sec": round(time.time() - e0, 3),
            }
        )
        batch.unpersist()
        print(f"  {out['per_epoch'][-1]}", file=sys.stderr, flush=True)

    try:
        q = (
            sdf.writeStream.foreachBatch(_ingest)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(5400):
            q.stop()
            raise TimeoutError("hist route curve did not drain in 5400s")
        ep = out["per_epoch"]
        out["all_identical"] = all(
            e["decision_and_stats_identical"] for e in ep
        )
        out["all_routed_fold"] = all(e["routed_source"] == "fold" for e in ep)
        out["fold_flat"] = (
            round(ep[-1]["fold_trigger_sec"] / max(ep[0]["fold_trigger_sec"], 1e-9), 2)
            if len(ep) >= 2 else None
        )
        out["scan_grows"] = (
            round(ep[-1]["scan_trigger_sec"] / max(ep[0]["scan_trigger_sec"], 1e-9), 2)
            if len(ep) >= 2 else None
        )
        out["scan_over_fold_last_epoch"] = round(
            ep[-1]["scan_trigger_sec"] / max(ep[-1]["fold_trigger_sec"], 1e-9), 1
        )
    finally:
        drop_index(spark, tname)

    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
