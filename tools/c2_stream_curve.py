"""Streaming near-dup ingest cost curve (VERDICT r5 item 7).

c2_streaming_neardup is correctness-green but had no perf entry. The
scale question for a streaming ingest pipeline is specific: as the
at-rest signature index GROWS, does per-epoch cost stay bounded by the
epoch (bucketed band-key anti-join against the index) or creep toward
index-sized work? This tool stages a docs fixture as K equal epochs,
runs the exact `neardup_ingest_step` loop through a real file-source
stream (maxFilesPerTrigger=1 → one epoch per micro-batch), and
records per-epoch wall seconds, index rows BEFORE the epoch, and
survivors — the committed curve is the evidence that ingest stays
viable as the corpus accumulates.

What "flat" should mean here: per-epoch wall ~ O(epoch size +
matching-bucket candidates). The index side of the bucket join grows,
but band keys are uniform md5 buckets, so the per-epoch candidate
count grows only with true near-dup density, not with index size. A
super-linear drift in the curve would falsify that.

Round 7: the tool now measures the BUCKETED at-rest index path
(operators/neardup_index.NearDupIndex) by default — the fix for the r6
finding that the read-parquet index path re-shuffled the whole
accumulated index every epoch (+40 s per ~580k index rows at 5M docs).
``--legacy`` runs the old path for comparison. A diskguard preflight
refuses runs that cannot fit (the r6 5M run died on spill-disk
exhaustion at epoch 4).

Round 8: defaults are the ENGINE's defaults — (b, r) derived from the
threshold via banded_config (t=0.5 → (8, 3)) and join strategy "auto"
(shuffle_hash with automatic merge retry on a hash-build failure) — so
an argument-free run measures exactly what a user of the default
posture gets. Explicit --bands/--rows-per-band/--join still override
for controlled comparisons.

Usage:
    python -m tools.c2_stream_curve [docs_dir] [--epochs K]
        [--threshold T] [--out OUT.json] [--legacy] [--require-gb G]
        [--bands B] [--rows-per-band R]
        [--join auto|shuffle_hash|merge] [--compact]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

from smallquery_spark.operators.dedup import (
    _banded_sig_df,
    neardup_ingest_step,
)
from smallquery_spark.queries.registry import ensure_driver_confs
from smallquery_spark.queries.tmpdirs import prune_stale, register_cleanup
from smallquery_spark.session import get_session


def main() -> None:
    argv = sys.argv[1:]
    out_path, k_epochs, threshold = None, 8, 0.5
    legacy, require_gb = False, 20.0
    bands, rows_per_band, join_strategy = None, None, "auto"
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    if "--epochs" in argv:
        i = argv.index("--epochs")
        k_epochs = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    if "--threshold" in argv:
        i = argv.index("--threshold")
        threshold = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    if "--require-gb" in argv:
        i = argv.index("--require-gb")
        require_gb = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    if "--bands" in argv:
        i = argv.index("--bands")
        bands = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    if "--rows-per-band" in argv:
        i = argv.index("--rows-per-band")
        rows_per_band = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    if "--join" in argv:
        i = argv.index("--join")
        join_strategy = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    do_compact = False
    if "--compact" in argv:
        do_compact = True
        argv.remove("--compact")
    if "--legacy" in argv:
        legacy = True
        argv.remove("--legacy")
    docs_dir = argv[0] if argv else ".fixtures/docs1000000"

    from smallquery_spark.operators.dedup import banded_config

    if bands is None or rows_per_band is None:
        d_bands, d_rows = banded_config(threshold)
        bands = d_bands if bands is None else bands
        rows_per_band = d_rows if rows_per_band is None else rows_per_band

    from tools.diskguard import preflight

    disk = preflight(require_gb)
    print(f"diskguard: {json.dumps(disk)}", file=sys.stderr, flush=True)

    spark = get_session("smallquery-c2-curve")
    ensure_driver_confs(spark)

    prune_stale("smallquery_c2curve_")
    root = register_cleanup(tempfile.mkdtemp(prefix="smallquery_c2curve_"))
    slices = os.path.join(root, "slices")
    docs = spark.read.parquet(os.path.join(docs_dir, "documents.parquet"))
    n_docs = docs.count()
    # doc_id-range slices; part index = ingest order (mtimes pin it)
    (
        docs.repartitionByRange(k_epochs, "doc_id")
        .write.mode("overwrite")
        .parquet(slices)
    )
    parts = sorted(glob.glob(os.path.join(slices, "part-*.parquet")))
    base = time.time() - 10 * len(parts)
    for i, p in enumerate(parts):
        os.utime(p, (base + 10 * i, base + 10 * i))

    index_dir = os.path.join(root, "sig_index")
    schema = spark.read.parquet(slices).schema
    sdf = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(slices)
    )

    epochs: list[dict] = []

    def _committed() -> list[str]:
        return sorted(
            d
            for d in glob.glob(os.path.join(index_dir, "epoch_*"))
            if os.path.exists(os.path.join(d, "_SUCCESS"))
        )

    ndx = None
    if not legacy:
        from smallquery_spark.operators.neardup_index import NearDupIndex

        ndx = NearDupIndex(
            spark, f"curve_{os.path.basename(root).rsplit('_', 1)[-1]}",
            n_buckets=32,
            join_strategy=join_strategy,
        )
        ndx.drop()

    def _ingest(batch_df, epoch_id):
        sess = batch_df.sparkSession
        # index size is instrumentation, not ingest work: count it
        # OUTSIDE the timed region (the legacy path keeps its count
        # inside because there the read IS part of the epoch's work)
        idx_rows = 0 if legacy else ndx.doc_count()
        t0 = time.time()
        batch_rows = batch_df.count()
        sig = _banded_sig_df(
            batch_df, bands=bands, rows_per_band=rows_per_band
        )
        surv = None
        epoch_dir = os.path.join(index_dir, f"epoch_{epoch_id:010d}")
        if legacy:
            committed = _committed()
            idx = sess.read.parquet(*committed) if committed else None
            idx_rows = idx.count() if idx is not None else 0
            surv = neardup_ingest_step(sig, idx, threshold=threshold)
        else:
            # materialize the signatures ONCE: ingest_epoch fans sig out
            # to ~5 consumers, and without this each re-runs the Arrow
            # signature UDF over the epoch
            sig = sig.localCheckpoint(eager=True)
            surv = ndx.ingest_epoch(sig, threshold=threshold)
            if not os.path.exists(os.path.join(epoch_dir, "_SUCCESS")):
                ndx.append(surv)
                if do_compact:
                    # doubling-rule compaction is real ingest work, so
                    # it stays INSIDE the timed region — the curve then
                    # honestly shows the occasional compaction epoch
                    ndx.maybe_compact()
        if not os.path.exists(os.path.join(epoch_dir, "_SUCCESS")):
            surv.write.mode("overwrite").parquet(epoch_dir)
        survivors = sess.read.parquet(epoch_dir).count()
        if not legacy:
            # drop this epoch's pinned blocks NOW: localCheckpoint blocks
            # otherwise accumulate one epoch-sized set per micro-batch in
            # the single shared heap until py4j's lazy finalizers run —
            # rising GC pressure masquerading as per-epoch cost growth
            sig.unpersist()
            surv.unpersist()
        epochs.append(
            {
                "epoch": int(epoch_id),
                "batch_rows": batch_rows,
                "index_rows_before": idx_rows,
                "survivors": survivors,
                "wall_sec": round(time.time() - t0, 3),
            }
        )
        print(f"  epoch {epoch_id}: {epochs[-1]}", file=sys.stderr, flush=True)

    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    t0 = time.time()
    try:
        q = (
            sdf.writeStream.foreachBatch(_ingest)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(7200), "ingest did not drain in 7200s"
        finally:
            if q.isActive:
                q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)

    total_wall = round(time.time() - t0, 1)
    accepted = sum(e["survivors"] for e in epochs)
    walls = [e["wall_sec"] for e in epochs if e["index_rows_before"] > 0]
    if ndx is not None:
        ndx.drop()
    out = {
        "docs_dir": docs_dir,
        "n_docs": n_docs,
        "path": "legacy_read_parquet" if legacy else "bucketed_index",
        "join_strategy": None if legacy else join_strategy,
        "compact": do_compact,
        "bands": bands,
        "rows_per_band": rows_per_band,
        "epochs_requested": k_epochs,
        "threshold": threshold,
        "disk_preflight": disk,
        "total_wall_sec": total_wall,
        "accepted_total": accepted,
        "dropped_total": n_docs - accepted,
        "per_epoch": epochs,
        # drift = last nonfirst-epoch wall / first nonfirst-epoch wall:
        # the index grew ~K-fold between them, so ~1.0 means per-epoch
        # cost is epoch-bounded, not index-bounded
        "epoch_wall_drift": (
            round(walls[-1] / walls[0], 2) if len(walls) >= 2 else None
        ),
    }
    line = json.dumps(out)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
