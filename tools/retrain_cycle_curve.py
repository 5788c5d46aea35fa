"""Mid-stream retrain pause vs epoch cadence (VERDICT r11 #1's perf
half).

c3_stream_retrain_cycle proves the VALUE contract at gate scale: drift
fires mid-stream, retrain_ivfpq lands between an epoch's quantizer load
and its append (StaleQuantizerError -> replay converges), ingest resumes
under the new generation, and the streamed index equals a rebuild under
the retrained quantizer. The scale question is OPERATIONAL: what does
the retrain PAUSE cost relative to the epoch cadence it interrupts? The
retrain is O(index) by construction (train over the corpus + full
re-encode + directory swap) while epochs are O(batch); this curve makes
the ratio a number so a deployment can size its retrain budget (at a
35x index/batch ratio the pause is expected in the tens of epochs —
drift should be RARE relative to ingest, which is exactly what the
trigger thresholds encode).

Sequence through a REAL file-source stream, foreachBatch running the
exact gate-leg ingest body (IngestHistogram-routed trigger, epoch
appends, fire-request protocol): quiet epochs -> a HOT epoch (jittered
copies of one indexed vector, batch-sized: concentrated drift, the
histogram trigger's shape) fires the trigger -> the NEXT epoch has
loaded the old quantizer when the retrain is served (the mid-epoch
interleaving) -> its append raises StaleQuantizerError -> the restart
replays it under the new generation and the remaining epochs resume.

Records per epoch: wall, trigger wall + route source; plus the retrain
pause, its breakdown, and the headline pause/epoch-cadence ratio. Value
gates at scale: the final stamp equals the token of an INDEPENDENT
retrain on the same corpus (training determinism), the replayed epoch
double-inserted nothing (row counts exact), resumed epochs ran under
the new generation.

Usage:
    python -m tools.retrain_cycle_curve [--n 600000] [--batch 50000]
        [--dim 64] [--out RETRAIN_CYCLE_gen100.json]
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

    n = opt("--n", 600_000, int)
    batch_n = opt("--batch", 50_000, int)
    dim = opt("--dim", 64, int)
    out_path = opt("--out", "RETRAIN_CYCLE_gen100.json", str)

    from tools.diskguard import preflight

    disk = preflight(10)

    from smallquery_spark.operators.pq import (
        append_ivfpq_epoch,
        drop_index,
        index_gen,
        ivfpq_search,
        load_index_meta,
        materialize_ivfpq,
        pq_train,
        quantizer_token,
        retrain_ivfpq,
    )
    from smallquery_spark.operators.similarity import (
        IngestHistogram,
        ivf_assign,
        ivf_build_centroids,
        ivf_defaults,
        ivf_retrain_trigger,
    )

    spark = get_session("smallquery-retrain-cycle-curve")
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
        "dim": dim,
        "disk_preflight": disk,
        "per_epoch": [],
    }

    corpus = to_df(_gen(rng, modes, n), 0).repartition(32).localCheckpoint(
        eager=True
    )
    n_cells, n_probe = ivf_defaults(n)
    out["n_cells"], out["n_probe"] = n_cells, n_probe
    cents = ivf_build_centroids(corpus, n_cells=n_cells)
    books = pq_train(corpus, cents, m=16)
    tname = materialize_ivfpq(
        spark, ivf_assign(corpus, cents), cents, books, f"rtc_{os.getpid()}"
    )
    build_gen = index_gen(spark, tname)
    _, stats0 = ivf_retrain_trigger(spark, tname, n_cells=n_cells)
    out["build_imbalance"] = round(stats0["imbalance"], 3)

    # epochs: quiet, quiet, HOT (fires), retrain-lands-mid-epoch, quiet
    # hot mass: sigma tight enough that the whole batch lands in ONE
    # cell — at gen100 geometry (1024 cells over 10 modes) a 0.01
    # jitter spreads across several cells and the post-append ratio
    # landed at 1.98x build, JUST under the 2x trigger (first run,
    # kept honest here); 0.001 concentrates it and the ratio clears 4x
    v0 = np.array(
        corpus.filter("c_id = 0").first()["vec"], dtype=np.float64
    )
    H = v0[None, :] + rng.normal(0, 0.001, (batch_n, dim))
    H = H / np.linalg.norm(H, axis=1, keepdims=True)
    frames = [
        to_df(_gen(rng, modes, batch_n), n),
        to_df(_gen(rng, modes, batch_n), n + batch_n),
        to_df(H, n + 2 * batch_n),
        to_df(_gen(rng, modes, batch_n), n + 3 * batch_n),
        to_df(_gen(rng, modes, batch_n), n + 4 * batch_n),
    ]
    work = tempfile.mkdtemp(prefix="smallquery_rtcurve_")
    slices = os.path.join(work, "slices")
    for bdf in frames:
        bdf.coalesce(1).write.mode("append").parquet(slices)
    parts = sorted(glob.glob(os.path.join(slices, "part-*.parquet")))
    base_t = time.time() - 10 * len(parts)
    for i, p in enumerate(parts):
        os.utime(p, (base_t + 10 * i, base_t + 10 * i))
    # NOTE: mode=append writes land in arbitrary name order; re-stamp
    # mtimes by the frames' intended order via file CONTENT (min id)
    order = []
    for p in parts:
        mn = spark.read.parquet(p).agg(F.min("c_id")).first()[0]
        order.append((mn, p))
    for i, (_, p) in enumerate(sorted(order)):
        os.utime(p, (base_t + 10 * i, base_t + 10 * i))

    fire_req = os.path.join(work, "fire_requested")
    fire_done = os.path.join(work, "fire_handled")
    baseline = {"imb": out["build_imbalance"]}
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
        retrain_sec = None
        if os.path.exists(fire_req) and not os.path.exists(fire_done):
            committed = sess.read.parquet(slices).join(
                sess.table(tname).select("c_id"), "c_id", "left_semi"
            )
            corpus_now = corpus.unionByName(committed)
            t1 = time.time()
            retrain_ivfpq(sess, tname, corpus_now)
            retrain_sec = time.time() - t1
            _, post = ivf_retrain_trigger(sess, tname, n_cells=n_cells)
            with open(fire_done, "w") as f:
                f.write(str(post["imbalance"]))
            baseline["imb"] = post["imbalance"]
            out["retrain_sec"] = round(retrain_sec, 3)
            out["retrain_corpus_rows"] = corpus_now.count()
            # fall through with the PRE-retrain state: the append below
            # must raise StaleQuantizerError (mid-epoch interleaving)
        t1 = time.time()
        delta = append_ivfpq_epoch(
            sess, tname, batch, cl, bl, epoch_id=int(epoch_id)
        )
        append_sec = time.time() - t1
        hist.fold(delta)
        t1 = time.time()
        trig, stats = hist.trigger(baseline_imbalance=baseline["imb"])
        trigger_sec = time.time() - t1
        if trig and not os.path.exists(fire_req):
            with open(fire_req, "w") as f:
                f.write(str(stats["imbalance"]))
        out["per_epoch"].append(
            {
                "epoch": int(epoch_id),
                "batch_rows": nb,
                "epoch_sec": round(time.time() - e0, 3),
                "append_sec": round(append_sec, 3),
                "trigger_sec": round(trigger_sec, 3),
                "trigger_source": stats["source"],
                "imbalance": round(stats["imbalance"], 3),
                "fired": bool(trig),
                "gen": index_gen(sess, tname)[:12],
            }
        )
        batch.unpersist()
        print(f"  {out['per_epoch'][-1]}", file=sys.stderr, flush=True)

    tname_rb = None
    try:
        def _run(tag):
            q = (
                sdf.writeStream.foreachBatch(_ingest)
                .outputMode("append")
                .option("checkpointLocation", os.path.join(work, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(5400):
                q.stop()
                raise TimeoutError(f"{tag} did not drain in 5400s")

        stale = False
        try:
            _run("run1")
        except Exception as e:  # noqa: BLE001
            stale = "StaleQuantizerError" in str(e)
            if not stale:
                raise
        out["stale_raised_mid_epoch"] = stale
        _run("run2")

        epochs = out["per_epoch"]
        if "retrain_sec" not in out:
            with open(out_path, "w") as f:
                json.dump(out, f, indent=1)
                f.write("\n")
            raise RuntimeError(
                "hot epoch did not fire the trigger — partial record"
                f" written to {out_path}; imbalances:"
                f" {[e['imbalance'] for e in epochs]}"
            )
        quiet_walls = [
            e["epoch_sec"] for e in epochs if not e["fired"]
        ]
        out["median_epoch_sec"] = round(sorted(quiet_walls)[
            len(quiet_walls) // 2
        ], 3)
        out["retrain_pause_vs_epoch"] = round(
            out["retrain_sec"] / out["median_epoch_sec"], 2
        )
        out["resumed_under_new_gen"] = (
            epochs[-1]["gen"] != build_gen[:12]
        )

        # determinism gate: an INDEPENDENT retrain over the same corpus
        # produces the exact stamp the index carries
        spark.catalog.refreshTable(tname)
        committed_pre = [f for f in frames[:3]]
        seen = corpus
        for bdf in committed_pre:
            seen = seen.unionByName(bdf)
        cents2 = ivf_build_centroids(seen, n_cells=n_cells)
        books2 = pq_train(seen, cents2, m=16)
        out["retrain_deterministic"] = (
            quantizer_token(cents2, books2) == index_gen(spark, tname)
        )

        # exactly-once: row count is base + every batch, no double
        n_expect = n + sum(b.count() for b in frames)
        out["rows_expected"] = n_expect
        out["rows_actual"] = spark.table(tname).count()
        out["exactly_once"] = out["rows_actual"] == n_expect

        # probes match a rebuild under the retrained quantizer
        full = seen
        for bdf in frames[3:]:
            full = full.unionByName(bdf)
        full = full.repartition(32).localCheckpoint(eager=True)
        tname_rb = materialize_ivfpq(
            spark, ivf_assign(full, cents2), cents2, books2,
            f"rtc_rb_{os.getpid()}",
        )
        queries = full.filter(F.col("c_id") < 50).select(
            F.col("c_id").alias("q_id"), "vec"
        )
        streamed = ivfpq_search(
            spark, queries, tname, cents2, books2, k=10, n_probe=n_probe
        ).localCheckpoint(eager=True)
        rebuilt = ivfpq_search(
            spark, queries, tname_rb, cents2, books2, k=10, n_probe=n_probe
        )
        out["same_as_rebuild"] = (
            streamed.exceptAll(rebuilt).count() == 0
            and rebuilt.exceptAll(streamed).count() == 0
        )
    finally:
        drop_index(spark, tname)
        if tname_rb is not None:
            drop_index(spark, tname_rb)

    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
