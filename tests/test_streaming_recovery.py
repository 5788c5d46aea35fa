"""Checkpoint-recovery contract for the streaming path (SURVEY §2
B50/B54/B59; reference has no streaming — this is the Spark-first
extension's own reliability bar).

A production streaming job's crash story is: the process dies, a new
process starts the SAME query against the SAME checkpoint location, and
the pipeline must be no-loss AND no-duplicate. Two tests pin the two
halves of that contract:

1. ``test_file_sink_exactly_once_across_restart`` — source offsets.
   A pass-through stream drains batch A into a parquet sink, stops,
   batch B arrives, and a NEW query object resumes from the same
   checkpoint. The sink (read through its ``_spark_metadata`` commit
   log) must hold exactly A ∪ B — batch A neither reprocessed (offsets
   recovered from the WAL) nor lost.

2. ``test_stateful_agg_state_survives_restart`` — operator state.
   An update-mode grouped count drains A, stops, resumes on B. The
   final per-key counts must equal the batch ``groupBy`` over A ∪ B —
   which can only happen if the state store's counts from A were
   recovered and then incremented by B without rereading A. (If offsets
   reset, counts double; if state reset, counts drop to B's share.)

Both run with ``availableNow`` triggers — the deterministic
stop-and-resume protocol; a real crash differs only in WHERE the stop
happens, and the checkpoint WAL is written before each micro-batch
commits, so mid-batch death replays at most one (idempotently
committed) batch.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from smallquery_spark.queries.tmpdirs import register_cleanup


def _write_batch(spark, src_dir: str, name: str, ids, etype: str) -> None:
    rows = [(int(i), etype, float(i) / 10.0) for i in ids]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(src_dir, name))


def _drain(sdf_writer):
    q = sdf_writer.trigger(availableNow=True).start()
    try:
        # awaitTermination returns False on timeout — fail HERE with a
        # clear message instead of letting the caller assert on a
        # partially-drained sink (a hang would otherwise surface as a
        # confusing count mismatch).
        assert q.awaitTermination(120), "stream did not drain within 120s"
    finally:
        if q.isActive:
            q.stop()


@pytest.fixture()
def stream_dirs(tmp_path):
    # tmp_path gives per-test isolation; register_cleanup bounds /tmp
    # growth if pytest's own GC is skipped.
    src = register_cleanup(str(tmp_path / "src"))
    os.makedirs(src, exist_ok=True)
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    return src, ckpt, sink


SCHEMA = "event_id long, event_type string, value double"


@pytest.mark.slow  # >=15 s measured; deselected by default (r15, VERDICT r14 #1)
def test_file_sink_exactly_once_across_restart(spark, stream_dirs):
    src, ckpt, sink = stream_dirs
    # Stage each batch as its own subdirectory-of-one-file so the file
    # source sees distinct files arriving over time.
    _write_batch(spark, src + "/a0", "x", range(0, 200), "click")
    _write_batch(spark, src + "/a1", "x", range(200, 350), "view")

    def reader():
        return (
            spark.readStream.schema(SCHEMA)
            .option("recursiveFileLookup", "true")
            .format("parquet")
            .load(src)
        )

    _drain(
        reader()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
    )
    got_a = spark.read.parquet(sink)
    assert got_a.count() == 350

    # "Crash": the first query object is gone. New data arrives.
    _write_batch(spark, src + "/b0", "x", range(350, 500), "purchase")

    # A brand-new query resumes from the same checkpoint.
    _drain(
        reader()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
    )

    got = spark.read.parquet(sink)
    # Exactly-once: every id 0..499 exactly once — no replay of A (the
    # WAL recovered the processed-file offsets), no loss of B.
    assert got.count() == 500
    assert got.select("event_id").distinct().count() == 500
    assert got.agg(F.sum("event_id")).collect()[0][0] == sum(range(500))


@pytest.mark.slow  # >=15 s measured; deselected by default (r15, VERDICT r14 #1)
def test_stateful_agg_state_survives_restart(spark, stream_dirs):
    src, ckpt, _ = stream_dirs
    _write_batch(spark, src + "/a0", "x", range(0, 120), "click")
    _write_batch(spark, src + "/a1", "x", range(120, 200), "view")

    captured: dict[str, int] = {}

    def sink_batch(batch_df, _batch_id):
        # update mode emits changed keys; keep the latest value per key.
        for r in batch_df.collect():
            captured[r["event_type"]] = r["n"]

    def agg_stream():
        s = (
            spark.readStream.schema(SCHEMA)
            .option("recursiveFileLookup", "true")
            .format("parquet")
            .load(src)
        )
        return s.groupBy("event_type").agg(F.count("*").alias("n"))

    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        _drain(
            agg_stream()
            .writeStream.foreachBatch(sink_batch)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
        )
        assert captured == {"click": 120, "view": 80}

        # Crash + new data: clicks in B must INCREMENT the recovered
        # state-store count, not restart from zero or double-count A.
        _write_batch(spark, src + "/b0", "x", range(200, 260), "click")
        _write_batch(spark, src + "/b1", "x", range(260, 300), "purchase")
        _drain(
            agg_stream()
            .writeStream.foreachBatch(sink_batch)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)

    assert captured == {"click": 180, "view": 80, "purchase": 40}


def test_streaming_sinks_agree(spark):
    """run_to_df's files sink (the production shape auto-selected at
    volume) must produce exactly the rows the memory sink produces —
    same stream, both sinks, full row-set equality. Pins the r5 sink
    switch that removed the driver-side collect from big stateful runs
    (b53 at gen-sf10: ~9.9M complete-mode rows through the memory sink
    were the dominant cost)."""
    from tests.conftest import SF_SMOKE
    from pyspark.sql import functions as F

    from smallquery_spark.streaming import events_stream, run_to_df

    def agg(name, sink):
        sdf = events_stream(spark, SF_SMOKE)
        a = (
            sdf.groupBy(F.session_window("ts", "5 minutes"), F.col("user_id"))
            .agg(F.count("*").alias("n_events"))
            .select("user_id", "n_events")
        )
        return run_to_df(a, name, output_mode="complete", sink=sink)

    mem = sorted(map(tuple, agg("sinks_mem", "memory").collect()))
    fil = sorted(map(tuple, agg("sinks_fil", "files").collect()))
    assert mem == fil
    assert len(mem) > 0


def test_epoch_keyed_sink_replay_idempotent(spark, tmp_path):
    """foreachBatch's contract is at-least-once per epoch: after a
    restart the last epoch whose sink ran but whose streaming commit
    didn't lands AGAIN with the same epoch_id. The epoch-keyed sink
    discipline (_epoch_commit/_committed_epochs) must (a) skip a
    committed replayed epoch, (b) rewrite a partial (no _SUCCESS)
    epoch wholesale, and (c) expose only committed epochs to readers."""
    import os

    from smallquery_spark.queries.streaming_queries import (
        _committed_epochs,
        _epoch_commit,
    )

    index_dir = str(tmp_path / "idx")
    df1 = spark.createDataFrame([(1,), (2,)], "doc_id long")
    _epoch_commit(df1, index_dir, 0)
    assert len(_committed_epochs(index_dir)) == 1

    # (b) partial epoch: files present, no _SUCCESS — invisible to
    # readers, replaced wholesale when the epoch replays
    epoch1 = os.path.join(index_dir, "epoch_0000000001")
    df_partial = spark.createDataFrame([(99,)], "doc_id long")
    df_partial.write.mode("overwrite").parquet(epoch1)
    os.remove(os.path.join(epoch1, "_SUCCESS"))
    assert len(_committed_epochs(index_dir)) == 1  # partial is invisible
    df2 = spark.createDataFrame([(3,), (4,), (5,)], "doc_id long")
    _epoch_commit(df2, index_dir, 1)  # replay overwrites the partial
    committed = _committed_epochs(index_dir)
    assert len(committed) == 2
    rows = {
        r["doc_id"] for r in spark.read.parquet(*committed).collect()
    }
    assert rows == {1, 2, 3, 4, 5}  # 99 from the partial write is gone

    # (a) a replayed COMMITTED epoch is skipped by the query-side guard
    # (the c11/c2/b59 sinks check _SUCCESS before writing); the reader
    # view is unchanged either way
    assert {
        r["doc_id"]
        for r in spark.read.parquet(*_committed_epochs(index_dir)).collect()
    } == {1, 2, 3, 4, 5}


def test_run_to_df_rotates_sink(spark):
    """rotate_sink (default) must leave NOTHING of the run on disk —
    the B53_RESIDUAL finding (retained sink bytes cost ~15% per warm
    corpus-sized rerun) encoded in the runner, not a docstring. The
    returned frame must survive the deletion (materialized before)."""
    import glob
    import os
    import tempfile

    from pyspark.sql import functions as F

    from tests.conftest import SF_SMOKE
    from smallquery_spark.streaming import events_stream, run_to_df

    def agg():
        sdf = events_stream(spark, SF_SMOKE)
        return (
            sdf.groupBy("event_type")
            .agg(F.count("*").alias("n"))
            .select("event_type", "n")
        )

    pre = set(glob.glob(os.path.join(tempfile.gettempdir(), "smallquery_runsink_*")))
    out = run_to_df(agg(), "rot_on", output_mode="complete", sink="files")
    post = set(glob.glob(os.path.join(tempfile.gettempdir(), "smallquery_runsink_*")))
    assert post - pre == set()  # the run's sink root is GONE
    rows = {(r["event_type"], r["n"]) for r in out.collect()}  # readable after delete
    assert rows and all(n > 0 for _t, n in rows)

    # rotate_sink=False keeps the sink for out-of-band reads
    out2 = run_to_df(
        agg(), "rot_off", output_mode="complete", sink="files", rotate_sink=False
    )
    post2 = set(glob.glob(os.path.join(tempfile.gettempdir(), "smallquery_runsink_*")))
    assert len(post2 - pre) == 1
    assert {(r["event_type"], r["n"]) for r in out2.collect()} == rows
    import shutil

    for d in post2 - pre:
        shutil.rmtree(d, ignore_errors=True)


def test_sink_scope_deletes_after_consumption(spark):
    """sink_scope: consume inside the block, sink root gone on exit —
    the corpus-sized flat-rerun posture (rotation-by-checkpoint
    measured a 2.22x climb then JVM death on ~99M-row results,
    B53_ROTATE_gen100.json)."""
    import glob
    import os
    import tempfile

    from pyspark.sql import functions as F

    from tests.conftest import SF_SMOKE
    from smallquery_spark.streaming import events_stream, sink_scope

    pre = set(glob.glob(os.path.join(tempfile.gettempdir(), "smallquery_runsink_*")))
    sdf = events_stream(spark, SF_SMOKE)
    agg = (
        sdf.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .select("event_type", "n")
    )
    with sink_scope(agg, "scoped", output_mode="complete", sink="files") as df:
        rows = {(r["event_type"], r["n"]) for r in df.collect()}
        # inside the scope the sink exists (lazy scan needs it)
        assert set(
            glob.glob(os.path.join(tempfile.gettempdir(), "smallquery_runsink_*"))
        ) - pre
    assert rows and all(n > 0 for _t, n in rows)
    post = set(glob.glob(os.path.join(tempfile.gettempdir(), "smallquery_runsink_*")))
    assert post - pre == set()  # gone on exit


def test_run_to_df_rotation_size_gate(spark):
    """Results past rotate_max_bytes must NOT be pulled through the
    block manager: the frame stays a lazy scan and the sink survives
    (with its root exposed for sink_scope)."""
    import glob
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from tests.conftest import SF_SMOKE
    from smallquery_spark.streaming import events_stream, run_to_df

    pre = set(glob.glob(os.path.join(tempfile.gettempdir(), "smallquery_runsink_*")))
    sdf = events_stream(spark, SF_SMOKE)
    agg = (
        sdf.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .select("event_type", "n")
    )
    out = run_to_df(
        agg, "gated", output_mode="complete", sink="files", rotate_max_bytes=0
    )
    new = set(
        glob.glob(os.path.join(tempfile.gettempdir(), "smallquery_runsink_*"))
    ) - pre
    assert len(new) == 1  # kept: result exceeded the (zero) gate
    assert getattr(out, "_smallquery_sink_root", None) in new
    assert out.count() > 0
    for d in new:
        shutil.rmtree(d, ignore_errors=True)
