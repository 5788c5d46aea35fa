"""Family-wide takedown (r13, VERDICT r12 #1): hard deletion from the
three at-rest stores delete_ivfpq did not cover — the id-bucketed
rerank full-vector corpus, the C2 banded-signature index, and the C11
digest (epoch-directory) index — plus the structural pins the bucketed
protocol stands on."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bkt_table(spark):
    """An id-bucketed table in the rerank-corpus shape (key + payload),
    16 buckets, sorted — rebuilt fresh for the module."""
    t = f"tkd_corpus_{os.getpid()}"
    df = spark.range(400).select(
        F.col("id").alias("c_id"),
        F.expr("transform(sequence(1, 4), j -> cast(id * j as double))").alias(
            "vec"
        ),
    )
    from smallquery_spark.operators.bucketing import write_bucketed

    write_bucketed(df, t, "c_id", 16)
    yield t
    spark.sql(f"DROP TABLE IF EXISTS {t}")


def _bucket_files(spark, table):
    """{bucket: set(file name)} from the live table directory."""
    from smallquery_spark.fsio import fs_for, table_location
    from smallquery_spark.operators.bucketing import _BUCKET_FILE

    loc = table_location(spark, table)
    fs = fs_for(spark, loc)
    out: dict[int, set[str]] = {}
    for n in fs.list_names(loc):
        m = _BUCKET_FILE.search(n)
        if m and not n.startswith(("_", ".")):
            out.setdefault(int(m.group(1)), set()).add(n)
    return out


def test_bucket_id_formula_pinned(spark):
    """The two structural facts delete_bucketed stands on, pinned
    against Spark-version drift: (a) a written bucketed file's
    name-encoded bucket id equals pmod(murmur3_hash(key), n) for long
    AND string keys; (b) a survivors file renamed in under the
    ``part-del-<token>_NNNNN.c000.parquet`` shape is read back as that
    bucket, with bucket pruning intact."""
    from smallquery_spark.fsio import fs_for, join_uri, table_location
    from smallquery_spark.operators.bucketing import _BUCKET_FILE

    for t, col, df in (
        (
            f"tkd_pin_l_{os.getpid()}",
            "c_id",
            spark.range(300).select(F.col("id").alias("c_id")),
        ),
        (
            f"tkd_pin_s_{os.getpid()}",
            "o_id",
            spark.range(300).select(
                F.concat(F.lit("doc_"), F.col("id")).alias("o_id")
            ),
        ),
    ):
        from smallquery_spark.operators.bucketing import write_bucketed

        write_bucketed(df, t, col, 8)
        try:
            mism = (
                spark.table(t)
                .withColumn("f", F.input_file_name())
                .withColumn(
                    "parsed",
                    F.regexp_extract("f", r"_(\d+)(?:\..*)?$", 1).cast("int"),
                )
                .withColumn("computed", F.pmod(F.hash(col), F.lit(8)))
                .filter(F.col("parsed") != F.col("computed"))
                .count()
            )
            assert mism == 0
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {t}")

    # (b): the renamed-in del-file shape
    t = f"tkd_pin_r_{os.getpid()}"
    from smallquery_spark.operators.bucketing import write_bucketed

    write_bucketed(
        spark.range(400).select(F.col("id").alias("c_id"), (F.col("id") * 2).alias("v")),
        t,
        "c_id",
        8,
    )
    old = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
        )
        loc = table_location(spark, t)
        fs = fs_for(spark, loc)
        name3 = next(
            n
            for n in fs.list_names(loc)
            if (m := _BUCKET_FILE.search(n)) and int(m.group(1)) == 3
        )
        fs.rename(
            join_uri(loc, name3),
            join_uri(loc, "part-del-4f3a9c_00003.c000.parquet"),
        )
        spark.catalog.refreshTable(t)
        assert spark.table(t).count() == 400
        cid = int(
            spark.table(t)
            .withColumn("b", F.pmod(F.hash("c_id"), F.lit(8)))
            .filter("b = 3")
            .first()["c_id"]
        )
        q = spark.table(t).filter(F.col("c_id") == cid)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 8" in plan
        assert q.first()["v"] == cid * 2
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", old
        )
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_delete_bucketed_by_bucket_key(spark, bkt_table):
    """delete_bucketed where the deletion key IS the bucket key (the
    rerank-corpus regime): only the victims' buckets are rewritten,
    untouched buckets keep their exact files, values equal a rebuild
    minus the ids, the retry is a no-op, a fully-emptied bucket's files
    disappear, and point fetches still bucket-prune post-delete."""
    from smallquery_spark.operators.bucketing import delete_bucketed

    before = _bucket_files(spark, bkt_table)
    n0 = spark.table(bkt_table).count()
    victims = [7, 40, 99, 123]
    vb = {
        int(r["b"])
        for r in spark.createDataFrame([(v,) for v in victims], "c_id long")
        .select(F.pmod(F.hash("c_id"), F.lit(16)).alias("b"))
        .collect()
    }
    assert delete_bucketed(spark, bkt_table, victims, "c_id") == len(victims)
    after = _bucket_files(spark, bkt_table)
    # untouched buckets: identical file sets; touched: rewritten
    for b in set(before) - vb:
        assert after.get(b) == before[b]
    for b in vb:
        assert after.get(b) != before[b]
    assert spark.table(bkt_table).count() == n0 - len(victims)
    assert (
        spark.table(bkt_table).filter(F.col("c_id").isin(victims)).count()
        == 0
    )
    # idempotent
    assert delete_bucketed(spark, bkt_table, victims, "c_id") == 0
    # point fetch still bucket-prunes on the rewritten layout
    old = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
        )
        survivor = int(spark.table(bkt_table).first()["c_id"])
        plan = (
            spark.table(bkt_table)
            .filter(F.col("c_id") == survivor)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "SelectedBucketsCount: 1 out of 16" in plan
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", old
        )
    # fully-empty a bucket: every id hashing to one bucket
    all_ids = [r["c_id"] for r in spark.table(bkt_table).collect()]
    b0 = sorted(_bucket_files(spark, bkt_table))[0]
    b0_ids = [
        r["c_id"]
        for r in spark.table(bkt_table)
        .withColumn("b", F.pmod(F.hash("c_id"), F.lit(16)))
        .filter(F.col("b") == b0)
        .collect()
    ]
    assert delete_bucketed(spark, bkt_table, b0_ids, "c_id") == len(b0_ids)
    assert b0 not in _bucket_files(spark, bkt_table)
    assert spark.table(bkt_table).count() == len(all_ids) - len(b0_ids)


def test_delete_bucketed_crash_recovery(spark, monkeypatch):
    """Per-bucket crash safety: (a) a crash between rename-aside and
    the staged rename-in is healed by the retry's HEAD recovery (the
    bucket's rows restored, then deleted — no silent 'not present');
    (b) a crash AFTER a bucket's commit rename keeps that bucket's
    deletion with no duplicate rows."""
    from smallquery_spark.fsio import HadoopFS
    from smallquery_spark.operators.bucketing import (
        delete_bucketed,
        write_bucketed,
    )

    t = f"tkd_crash_{os.getpid()}"
    write_bucketed(
        spark.range(400).select(
            F.col("id").alias("c_id"), (F.col("id") * 3).alias("v")
        ),
        t,
        "c_id",
        8,
    )
    orig_rename = HadoopFS.rename
    try:
        n0 = spark.table(t).count()
        victims = [11, 12, 13]

        # (a) die after the FIRST rename-aside, before any rename-in
        def die_on_first_aside(self, src, dst):
            orig_rename(self, src, dst)
            if ".delete_old/" in dst:
                raise RuntimeError("injected crash mid bucket swap")

        monkeypatch.setattr(HadoopFS, "rename", die_on_first_aside)
        with pytest.raises(RuntimeError, match="injected"):
            delete_bucketed(spark, t, victims, "c_id")
        monkeypatch.setattr(HadoopFS, "rename", orig_rename)
        # retry converges: recovery restores, then the delete applies
        assert delete_bucketed(spark, t, victims, "c_id") == len(victims)
        spark.catalog.refreshTable(t)
        assert spark.table(t).count() == n0 - len(victims)
        assert (
            spark.table(t).filter(F.col("c_id").isin(victims)).count() == 0
        )

        # (b) die right after a commit rename-in (aside not yet swept)
        victims2 = [101, 102]
        state = {"committed": 0}

        def die_after_commit(self, src, dst):
            orig_rename(self, src, dst)
            if "/part-del-" in dst:
                state["committed"] += 1
                raise RuntimeError("injected crash after bucket commit")

        monkeypatch.setattr(HadoopFS, "rename", die_after_commit)
        with pytest.raises(RuntimeError, match="injected"):
            delete_bucketed(spark, t, victims2, "c_id")
        monkeypatch.setattr(HadoopFS, "rename", orig_rename)
        assert state["committed"] == 1
        n_left = delete_bucketed(spark, t, victims2, "c_id")
        spark.catalog.refreshTable(t)
        # whatever the retry reports, the end state is exact: all gone,
        # no duplicates, every surviving row intact exactly once
        assert n_left <= len(victims2)
        assert (
            spark.table(t).filter(F.col("c_id").isin(victims2)).count() == 0
        )
        assert spark.table(t).count() == n0 - len(victims) - len(victims2)
        assert (
            spark.table(t).groupBy("c_id").count().filter("count > 1").count()
            == 0
        )
    finally:
        monkeypatch.setattr(HadoopFS, "rename", orig_rename)
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_delete_bucketed_concurrent_append_guard(spark, monkeypatch):
    """A lease-free append landing in a touched bucket between the
    survivors snapshot and its swap raises IndexBusyError before any
    rename (the appended file must not be swept aside and deleted)."""
    from smallquery_spark.errors import IndexBusyError
    from smallquery_spark.fsio import HadoopFS, fs_for, join_uri, table_location
    from smallquery_spark.operators.bucketing import (
        delete_bucketed,
        write_bucketed,
    )

    t = f"tkd_guard_{os.getpid()}"
    write_bucketed(
        spark.range(200).select(F.col("id").alias("c_id")), t, "c_id", 8
    )
    loc = table_location(spark, t)
    fs = fs_for(spark, loc)
    victim = 55
    vb = int(
        spark.createDataFrame([(victim,)], "c_id long")
        .select(F.pmod(F.hash("c_id"), F.lit(8)).alias("b"))
        .first()["b"]
    )
    planted = join_uri(loc, f"part-concurrent_{vb:05d}.c000.parquet")
    orig_write_text = HadoopFS.write_text

    def plant_on_token(self, uri, text):
        orig_write_text(self, uri, text)
        if uri.endswith("/_token"):
            # the 'appender': lands after the snapshot, before the swap
            orig_write_text(self, planted, "concurrent append")

    try:
        monkeypatch.setattr(HadoopFS, "write_text", plant_on_token)
        with pytest.raises(IndexBusyError, match="changed between"):
            delete_bucketed(spark, t, [victim], "c_id")
        monkeypatch.setattr(HadoopFS, "write_text", orig_write_text)
        assert fs.exists(planted)  # nothing swept it aside
        assert spark.table(t).filter(F.col("c_id") == victim).count() == 1
        fs.delete(planted)
        assert delete_bucketed(spark, t, [victim], "c_id") == 1
    finally:
        monkeypatch.setattr(HadoopFS, "write_text", orig_write_text)
        spark.sql(f"DROP TABLE IF EXISTS {t}")


@pytest.mark.slow  # >=15 s measured; deselected by default (r15, VERDICT r14 #1)
def test_neardup_index_delete(spark):
    """C2 takedown: NearDupIndex.delete removes a document's hash-set
    row AND all its band-key rows; a re-sent copy of the deleted
    document is accepted again (signatures gone — the stated re-ingest
    policy), while near-dup detection for everything else still works;
    the retry is a no-op."""
    from smallquery_spark.operators.dedup import _banded_sig_df, banded_config
    from smallquery_spark.operators.neardup_index import NearDupIndex

    b, r = banded_config(0.5)
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "an entirely different document about spark bucketing layouts"),
            (3, "a third text with its own unique shingle set for the index"),
        ],
        "doc_id long, text string",
    )
    docs2 = spark.createDataFrame(
        [
            (4, "a second epoch brings a fourth document into the index"),
            (5, "and a fifth one so the deletion crosses epoch file sets"),
        ],
        "doc_id long, text string",
    )
    idx = NearDupIndex(spark, f"tkd_{os.getpid()}", n_buckets=4)
    try:
        # TWO appends: buckets now hold multiple files each, the shape
        # epoch ingest produces — the per-bucket swap must rewrite ALL
        # of a touched bucket's files, not just the newest
        idx.append(_banded_sig_df(docs, bands=b, rows_per_band=r))
        idx.append(_banded_sig_df(docs2, bands=b, rows_per_band=r))
        assert idx.doc_count() == 5
        bands4 = (
            spark.table(idx.bands_table).filter(F.col("o_id") == 4).count()
        )
        assert idx.delete([4]) == {"hashes": 1, "bands": bands4}
        assert idx.doc_count() == 4
        assert (
            spark.table(idx.bands_table).filter(F.col("o_id") == 4).count()
            == 0
        )
        # the other epoch's rows in the same buckets survived the swap
        assert (
            spark.table(idx.hashes_table)
            .filter(F.col("o_id").isin([1, 2, 3, 5]))
            .count()
            == 4
        )
        bands0 = spark.table(idx.bands_table).count()
        my_bands = (
            spark.table(idx.bands_table).filter(F.col("o_id") == 1).count()
        )
        assert my_bands > 0
        out = idx.delete([1])
        assert out == {"hashes": 1, "bands": my_bands}
        assert idx.doc_count() == 3
        assert spark.table(idx.bands_table).count() == bands0 - my_bands
        assert (
            spark.table(idx.bands_table).filter(F.col("o_id") == 1).count()
            == 0
        )
        # idempotent
        assert idx.delete([1]) == {"hashes": 0, "bands": 0}
        # a re-sent copy of doc 1 is ACCEPTED now (policy: signatures
        # gone = re-ingest allowed; blocking is a C33 decision) …
        resend = _banded_sig_df(
            docs.filter("doc_id = 1").withColumn("doc_id", F.lit(10)),
            bands=b,
            rows_per_band=r,
        )
        assert idx.ingest_epoch(resend, threshold=0.5).count() == 1
        # … while a near-dup of a SURVIVING doc is still dropped
        dup2 = _banded_sig_df(
            docs.filter("doc_id = 2").withColumn("doc_id", F.lit(20)),
            bands=b,
            rows_per_band=r,
        )
        assert idx.ingest_epoch(dup2, threshold=0.5).count() == 0
    finally:
        idx.drop()


def test_takedown_compact_mutually_excluded(spark):
    """Takedown and maintenance on the same store are mutually excluded
    by the LEASE, not by the one-ingest-loop convention: a held lease
    on a bucketed table's location makes delete_bucketed (and therefore
    NearDupIndex.delete) raise IndexBusyError instead of interleaving
    its per-bucket renames with the holder's protocol."""
    from smallquery_spark.errors import IndexBusyError
    from smallquery_spark.fsio import (
        acquire_dir_lease,
        fs_for,
        release_dir_lease,
        table_location,
    )
    from smallquery_spark.operators.bucketing import (
        delete_bucketed,
        write_bucketed,
    )

    t = f"tkd_mutex_{os.getpid()}"
    write_bucketed(
        spark.range(100).select(F.col("id").alias("c_id")), t, "c_id", 4
    )
    loc = table_location(spark, t)
    fs = fs_for(spark, loc)
    try:
        tok = acquire_dir_lease(fs, loc, "compactor")
        with pytest.raises(IndexBusyError, match="live"):
            delete_bucketed(spark, t, [7], "c_id")
        release_dir_lease(fs, loc, tok)
        assert delete_bucketed(spark, t, [7], "c_id") == 1
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


@pytest.mark.slow  # >=10 s measured; deselected by default (r15, VERDICT r14 #1)
def test_delete_epoch_store(spark, tmp_path, monkeypatch):
    """C11 takedown: delete_epoch_store rewrites only the epochs
    holding victims, keeps their _SUCCESS commit markers (deletions
    stick through replays), refuses over an in-flight epoch, heals a
    mid-swap crash at the head of the retry, and is idempotent."""
    from smallquery_spark.errors import IndexBusyError
    from smallquery_spark.fsio import HadoopFS, fs_for, join_uri
    from smallquery_spark.operators.takedown import delete_epoch_store

    store = "file://" + str(tmp_path / "digest_index")
    fs = fs_for(spark, store)
    for e in range(3):
        (
            spark.range(e * 100, e * 100 + 100)
            .select(
                F.col("id").alias("doc_id"),
                F.md5(F.col("id").cast("string")).alias("__h"),
            )
            .write.mode("overwrite")
            .parquet(join_uri(store, f"epoch_{e:010d}"))
        )

    def rows():
        return spark.read.parquet(
            *[join_uri(store, f"epoch_{e:010d}") for e in range(3)]
        )

    epoch1_files = set(fs.list_names(join_uri(store, "epoch_0000000001")))
    # victims in epochs 0 and 2 only
    victims = [5, 7, 250]
    assert delete_epoch_store(spark, store, victims, "doc_id") == 3
    assert rows().filter(F.col("doc_id").isin(victims)).count() == 0
    assert rows().count() == 297
    # untouched epoch kept its exact DATA files (r15 pruning stats live
    # in ONE store-root _minmax_<col>.json, never inside epoch dirs —
    # the filter keeps this pin robust either way); rewritten epochs
    # recommitted
    assert {
        n
        for n in fs.list_names(join_uri(store, "epoch_0000000001"))
        if not n.startswith("_minmax_")
    } == epoch1_files
    for e in (0, 2):
        assert fs.exists(join_uri(store, f"epoch_{e:010d}", "_SUCCESS"))
    # idempotent
    assert delete_epoch_store(spark, store, victims, "doc_id") == 0
    # by-fingerprint deletion works too
    h = spark.read.parquet(join_uri(store, "epoch_0000000001")).first()["__h"]
    assert delete_epoch_store(spark, store, [h], "__h") == 1

    # in-flight epoch (no _SUCCESS): refuse BEFORE any scan
    inflight = join_uri(store, "epoch_0000000009")
    fs.mkdirs(inflight)
    with pytest.raises(IndexBusyError, match="uncommitted"):
        delete_epoch_store(spark, store, [42], "doc_id")
    fs.delete(inflight)

    # crash between the two renames: the epoch is hidden in the aside
    # tree; the retry's head recovery restores it, then deletes
    orig_rename = HadoopFS.rename

    def die_after_aside(self, src, dst):
        orig_rename(self, src, dst)
        if ".delete_old/epoch_" in dst:
            raise RuntimeError("injected crash mid epoch swap")

    n_before = rows().count()
    monkeypatch.setattr(HadoopFS, "rename", die_after_aside)
    with pytest.raises(RuntimeError, match="injected"):
        delete_epoch_store(spark, store, [42], "doc_id")
    monkeypatch.setattr(HadoopFS, "rename", orig_rename)
    assert delete_epoch_store(spark, store, [42], "doc_id") == 1
    assert rows().count() == n_before - 1


@pytest.mark.slow  # >=15 s measured; deselected by default (r15, VERDICT r14 #1)
def test_full_family_takedown(spark):
    """The four-store takedown composes: one document's ids deleted
    from the IVF-PQ index, the rerank full-vector corpus, the
    signature index, and the digest store — afterwards NO store holds
    its bytes and ANN probes (index + rerank) cannot surface it."""
    import numpy as np

    from smallquery_spark.fsio import fs_for, table_location
    from smallquery_spark.operators.pq import (
        delete_ivfpq,
        delete_rerank_corpus,
        drop_index,
        ivfpq_search,
        materialize_ivfpq,
        materialize_rerank_corpus,
        pq_train,
    )
    from smallquery_spark.operators.similarity import (
        ivf_assign,
        ivf_build_centroids,
    )

    rng = np.random.default_rng(11)
    X = rng.normal(0, 1, (240, 8))
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    corpus = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        "c_id long, vec array<double>",
    )
    cents = ivf_build_centroids(corpus, n_cells=4)
    books = pq_train(corpus, cents, m=4, nbits=8)
    pid = os.getpid()
    t = materialize_ivfpq(
        spark, ivf_assign(corpus, cents), cents, books, f"tkdfam_{pid}"
    )
    rr = materialize_rerank_corpus(
        spark, corpus, f"tkdfam_{pid}", point_fetch=4, n_buckets=8
    )
    victims = [3, 77]
    try:
        assert sum(delete_ivfpq(spark, t, victims).values()) == 2
        assert delete_rerank_corpus(spark, rr, victims) == 2
        # bytes gone from both stores
        assert (
            spark.table(t).filter(F.col("c_id").isin(victims)).count() == 0
        )
        assert (
            spark.table(rr).filter(F.col("c_id").isin(victims)).count() == 0
        )
        # probes (including the rerank path over the corpus) cannot
        # surface the ids — query AT a victim's own vector
        qs = spark.createDataFrame(
            [(0, [float(v) for v in X[3]])], "q_id long, vec array<double>"
        )
        res = ivfpq_search(
            spark,
            qs,
            t,
            cents,
            books,
            k=5,
            n_probe=4,
            rerank_corpus=spark.table(rr),
        )
        got = {r["c_id"] for r in res.collect()}
        assert got and not (got & set(victims))
    finally:
        drop_index(spark, t)
        spark.sql(f"DROP TABLE IF EXISTS {rr}")


def test_delete_bucketed_dtype_mismatched_ids(spark):
    """ADVICE r13 #2 pin: an ids DataFrame whose id column carries a
    NARROWER dtype than the table key (int vs bigint) must still find
    the victims — F.hash(int32) != F.hash(int64) for the same value, so
    without the cast the touched-bucket pruning hashes the caller's
    dtype, never scans the victim's real bucket, and silently returns 0
    with the victim rows still at rest."""
    from smallquery_spark.operators.bucketing import (
        delete_bucketed,
        write_bucketed,
    )

    t = f"tkd_dtype_{os.getpid()}"
    write_bucketed(
        spark.range(200).select(F.col("id").alias("c_id")), t, "c_id", 8
    )
    try:
        ids_int32 = spark.createDataFrame([(9,), (33,)], "c_id int")
        assert dict(ids_int32.dtypes)["c_id"] == "int"
        assert delete_bucketed(spark, t, ids_int32, "c_id") == 2
        spark.catalog.refreshTable(t)
        assert (
            spark.table(t).filter(F.col("c_id").isin([9, 33])).count() == 0
        )
        assert spark.table(t).count() == 198
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_delete_bucketed_sweep_keeps_token_last(spark, monkeypatch):
    """ADVICE r13 #1 pin: a crash DURING the final aside sweep (after
    all bucket commits) must leave ``_token`` behind with any surviving
    aside data files — recovery then proves each bucket's commit from
    the live ``part-del-`` file and sweeps, instead of restoring old
    files next to it (which would resurrect victims and duplicate
    survivors on the next scan)."""
    from smallquery_spark.fsio import HadoopFS, fs_for, join_uri, table_location
    from smallquery_spark.operators.bucketing import (
        delete_bucketed,
        write_bucketed,
    )

    t = f"tkd_sweep_{os.getpid()}"
    write_bucketed(
        spark.range(300).select(F.col("id").alias("c_id")), t, "c_id", 8
    )
    loc = table_location(spark, t)
    fs = fs_for(spark, loc)
    aside = loc.rstrip("/") + ".delete_old"
    orig_delete = HadoopFS.delete
    state = {"swept": 0}

    def die_mid_sweep(self, uri):
        if ".delete_old/" in uri and not uri.endswith("/_token"):
            state["swept"] += 1
            if state["swept"] == 2:
                raise RuntimeError("injected crash mid aside sweep")
        orig_delete(self, uri)

    n0 = spark.table(t).count()
    victims = [4, 71, 150, 222]  # ≥2 buckets so the sweep has ≥2 files
    try:
        monkeypatch.setattr(HadoopFS, "delete", die_mid_sweep)
        with pytest.raises(RuntimeError, match="injected"):
            delete_bucketed(spark, t, victims, "c_id")
        monkeypatch.setattr(HadoopFS, "delete", orig_delete)
        # the commit evidence survived the partial sweep
        assert fs.exists(join_uri(aside, "_token"))
        # retry: recovery sweeps (commits are live), does NOT restore
        assert delete_bucketed(spark, t, victims, "c_id") == 0
        spark.catalog.refreshTable(t)
        assert (
            spark.table(t).filter(F.col("c_id").isin(victims)).count() == 0
        )
        assert spark.table(t).count() == n0 - len(victims)
        assert (
            spark.table(t).groupBy("c_id").count().filter("count > 1").count()
            == 0
        )
        assert not fs.exists(aside)
    finally:
        monkeypatch.setattr(HadoopFS, "delete", orig_delete)
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_delete_bucketed_one_guard_listing(spark, monkeypatch):
    """VERDICT r13 #3 pin: the changed-since-scan guard takes ONE
    table-directory listing for ALL touched buckets — the listing count
    must not scale with the number of touched buckets (the old
    per-bucket re-list was O(buckets x files) driver work)."""
    from smallquery_spark.fsio import HadoopFS, table_location
    from smallquery_spark.operators.bucketing import (
        delete_bucketed,
        write_bucketed,
    )

    t = f"tkd_lists_{os.getpid()}"
    write_bucketed(
        spark.range(800).select(F.col("id").alias("c_id")), t, "c_id", 16
    )
    loc = table_location(spark, t).rstrip("/")
    orig_list = HadoopFS.list_names
    counts = {"loc": 0}

    def counting_list(self, uri):
        if uri.rstrip("/") == loc:
            counts["loc"] += 1
        return orig_list(self, uri)

    try:
        monkeypatch.setattr(HadoopFS, "list_names", counting_list)
        # victims spread over many buckets
        n = delete_bucketed(spark, t, list(range(0, 800, 37)), "c_id")
        monkeypatch.setattr(HadoopFS, "list_names", orig_list)
        assert n == len(range(0, 800, 37))
        # head recovery (≤2) + guard (1) + marker sweep (1): a small
        # CONSTANT, not O(touched buckets) — 22 victims span >4 buckets
        assert counts["loc"] <= 4
    finally:
        monkeypatch.setattr(HadoopFS, "list_names", orig_list)
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_delete_bucketed_staged_sort_survives(spark):
    """ADVICE r13 #3 pin: the rewritten bucket's single file must be
    internally sorted by the table's sortBy columns — the staging write
    leads its sort with the partition column so the partitionBy writer
    inserts no sort of its own (whose stability is not a contract).
    Read the del-file DIRECTLY (no table sort semantics) and require
    ascending key order."""
    from smallquery_spark.fsio import fs_for, join_uri, table_location
    from smallquery_spark.operators.bucketing import (
        delete_bucketed,
        write_bucketed,
    )

    t = f"tkd_sorted_{os.getpid()}"
    # sort=True (default): table carries sortBy(c_id)
    write_bucketed(
        spark.range(2000).select(F.col("id").alias("c_id")), t, "c_id", 4
    )
    try:
        victims = [8, 9, 1000, 1500]
        assert delete_bucketed(spark, t, victims, "c_id") == len(victims)
        loc = table_location(spark, t)
        fs = fs_for(spark, loc)
        del_files = [
            n for n in fs.list_names(loc) if n.startswith("part-del-")
        ]
        assert del_files
        for n in del_files:
            vals = [
                r["c_id"]
                for r in spark.read.parquet(join_uri(loc, n)).collect()
            ]
            assert vals == sorted(vals), f"{n} lost its sortBy order"
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_delete_epoch_store_epoch_in_ancestor_dir(spark, tmp_path):
    """ADVICE r13 #4 pin: a store whose PATH contains an ancestor
    directory named like an epoch (epoch_2031/…) must still key victim
    counts by the directory DIRECTLY containing each file — the old
    unanchored regexp matched the ancestor first, mis-keying every
    victim into one phantom epoch."""
    from smallquery_spark.fsio import fs_for, join_uri
    from smallquery_spark.operators.takedown import delete_epoch_store

    store = "file://" + str(tmp_path / "epoch_2031" / "digest_index")
    fs = fs_for(spark, store)
    for e in range(2):
        (
            spark.range(e * 50, e * 50 + 50)
            .select(F.col("id").alias("doc_id"))
            .write.mode("overwrite")
            .parquet(join_uri(store, f"epoch_{e:010d}"))
        )
    epoch0_files = set(fs.list_names(join_uri(store, "epoch_0000000000")))
    # victims live in epoch 1 ONLY
    assert delete_epoch_store(spark, store, [60, 75], "doc_id") == 2
    # epoch 0 untouched (the unanchored regexp would have keyed the
    # victims under ancestor 'epoch_2031' and rewritten the wrong
    # dirs); r15 pruning stats are advisory root-level files, not data
    assert {
        n
        for n in fs.list_names(join_uri(store, "epoch_0000000000"))
        if not n.startswith("_minmax_")
    } == epoch0_files
    survivors = spark.read.parquet(
        join_uri(store, "epoch_0000000000"), join_uri(store, "epoch_0000000001")
    )
    assert survivors.count() == 98
    assert survivors.filter(F.col("doc_id").isin([60, 75])).count() == 0
    assert fs.exists(join_uri(store, "epoch_0000000001", "_SUCCESS"))


@pytest.mark.slow  # >=15 s measured; deselected by default (r15, VERDICT r14 #1)
def test_delete_bucketed_lossy_id_cast_refused(spark):
    """ADVICE r14 #1 pin: this session runs ANSI off, so the id-dtype
    cast added for r13 #2 is SILENT when lossy — caller bigint ids
    against an int-keyed table wrap on overflow (2^32+5 -> 5) and would
    hash into and hard-delete a NON-victim row; non-castable values
    become NULL and silently skip their victims. delete_bucketed must
    verify the cast round-trips and refuse the whole delete otherwise."""
    from smallquery_spark.operators.bucketing import (
        delete_bucketed,
        write_bucketed,
    )

    t = f"tkd_lossy_{os.getpid()}"
    write_bucketed(
        spark.range(200).select(F.col("id").cast("int").alias("c_id")),
        t,
        "c_id",
        8,
    )
    try:
        assert dict(spark.table(t).dtypes)["c_id"] == "int"
        # 2^32 + 5 wraps to 5 under a non-ANSI int cast: row 5 is NOT a
        # victim and must not be deleted
        wrap = spark.createDataFrame([((1 << 32) + 5,)], "c_id long")
        with pytest.raises(ValueError, match="losslessly"):
            delete_bucketed(spark, t, wrap, "c_id")
        spark.catalog.refreshTable(t)
        assert spark.table(t).count() == 200  # nothing deleted
        assert spark.table(t).filter("c_id = 5").count() == 1

        # non-castable string ids would NULL out and silently skip the
        # victim — refused the same way
        bad = spark.createDataFrame([("not-an-id",)], "c_id string")
        with pytest.raises(ValueError, match="losslessly"):
            delete_bucketed(spark, t, bad, "c_id")

        # a LOSSLESS dtype mismatch still works (the r13 #2 behavior):
        # bigint 9 fits the int key exactly
        ok = spark.createDataFrame([(9,)], "c_id long")
        assert delete_bucketed(spark, t, ok, "c_id") == 1
        spark.catalog.refreshTable(t)
        assert spark.table(t).filter("c_id = 9").count() == 0
        assert spark.table(t).count() == 199
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


@pytest.mark.slow  # >=15 s measured; deselected by default (r15, VERDICT r14 #1)
def test_delete_epoch_store_nested_epoch_layout_refused(spark, tmp_path):
    """ADVICE r14 #2 pin: a data file NOT directly inside an epoch dir
    (e.g. a partitioned epoch write, epoch_0/lang=en/part-…) extracts an
    EMPTY epoch key; join_uri(store, "") is the store ROOT, so the
    rewrite loop would have staged and renamed the entire store aside.
    The protocol must refuse loudly instead."""
    from smallquery_spark.fsio import fs_for, join_uri
    from smallquery_spark.operators.takedown import delete_epoch_store

    store = "file://" + str(tmp_path / "nested_store")
    fs = fs_for(spark, store)
    (
        spark.range(100)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 2).cast("string").alias("lang"),
        )
        .write.mode("overwrite")
        .partitionBy("lang")
        .parquet(join_uri(store, "epoch_0000000000"))
    )
    before = set(fs.list_names(store))
    with pytest.raises(IOError, match="non-epoch key"):
        delete_epoch_store(spark, store, [7], "doc_id")
    # store layout untouched: nothing renamed aside, nothing rewritten
    assert set(fs.list_names(store)) == before
    assert (
        spark.read.parquet(join_uri(store, "epoch_0000000000")).count()
        == 100
    )


@pytest.mark.slow  # >=15 s measured; deselected by default (r15, VERDICT r14 #1)
def test_delete_epoch_store_sidecar_pruning(spark, tmp_path, monkeypatch):
    """r15 (VERDICT r14 #9) pin: victim discovery prunes epochs through
    the store-root _minmax_<col>.json stats file — a takedown whose ids
    fall in one epoch's range opens ONLY that epoch (plus the one
    footer-schema read); recorded ranges survive the rewrite (a delete
    only removes rows, so they stay supersets); a corrupt stats file
    falls back to scanning everything (conservative, never skips a
    victim) and is atomically re-cut."""
    import json as _json

    from pyspark.sql.readwriter import DataFrameReader

    from smallquery_spark.fsio import fs_for, join_uri
    from smallquery_spark.operators.takedown import delete_epoch_store

    store = "file://" + str(tmp_path / "pruned_store")
    fs = fs_for(spark, store)
    stats_uri = join_uri(store, "_minmax_doc_id.json")
    for e in range(4):
        (
            spark.range(e * 100, e * 100 + 100)
            .select(F.col("id").alias("doc_id"))
            .write.mode("overwrite")
            .parquet(join_uri(store, f"epoch_{e:010d}"))
        )
    # first call: no stats yet — the unified discovery pass (min/max +
    # victim counts in ONE scan) cuts the file with every epoch's range
    assert delete_epoch_store(spark, store, [150], "doc_id") == 1
    stats = _json.loads(fs.read_text(stats_uri))
    assert stats["col"] == "doc_id"
    assert set(stats["epochs"]) == {f"epoch_{e:010d}" for e in range(4)}
    assert stats["epochs"]["epoch_0000000003"] == {"min": 300, "max": 399}

    # second call: only the overlapping epoch's data may be opened
    calls: list[tuple[str, ...]] = []
    orig = DataFrameReader.parquet

    def recording(self, *paths, **kw):
        calls.append(tuple(paths))
        return orig(self, *paths, **kw)

    monkeypatch.setattr(DataFrameReader, "parquet", recording)
    assert delete_epoch_store(spark, store, [250, 255], "doc_id") == 2
    monkeypatch.setattr(DataFrameReader, "parquet", orig)
    flat = [p for ps in calls for p in ps]
    assert not any("epoch_0000000001" in p for p in flat)
    assert not any("epoch_0000000003" in p for p in flat)
    # epoch 0 appears only as the single-path id-dtype schema read
    e0 = [ps for ps in calls if any("epoch_0000000000" in p for p in ps)]
    assert all(len(ps) == 1 for ps in e0)
    # the rewritten epoch's recorded range survives (still a superset):
    # a same-epoch follow-up still prunes to it and works
    assert _json.loads(fs.read_text(stats_uri))["epochs"][
        "epoch_0000000002"
    ] == {"min": 200, "max": 299}
    assert delete_epoch_store(spark, store, [260], "doc_id") == 1

    # corrupt stats file -> conservative full rescan, victim still
    # found, file atomically re-cut with valid ranges
    fs.write_text(stats_uri, "{ not json")
    assert delete_epoch_store(spark, store, [160], "doc_id") == 1
    stats = _json.loads(fs.read_text(stats_uri))
    assert stats["col"] == "doc_id"
    assert stats["epochs"]["epoch_0000000001"]["min"] >= 100
