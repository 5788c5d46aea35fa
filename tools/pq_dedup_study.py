"""Which candidate index should near-dup dedup default to — banded
MinHash over text, or IVF-PQ over embeddings? (VERDICT r10 #7)

The r9 verdict noted the "PQ as the dedup-candidate index" story was
argued, not run. This study runs it, in the shape both paths actually
serve in a pipeline: an INCOMING batch deduped against an AT-REST
index of accepted documents.

Fixture (one corpus, both modalities): ``--n`` original docs of 60
random tokens (vocab 50k); incoming = ``--dups`` near-dup copies of
random originals (3 of 60 tokens replaced — shingle Jaccard ≈ 0.7,
embedding cosine ≈ 0.95) + ``--fresh`` genuinely new docs that must
SURVIVE. Embeddings are a deterministic token-hash model (normalized
sum of per-token Gaussian vectors), so the text edit and the embedding
displacement are the same event — the two paths hunt the same planted
pairs.

- **MinHash path**: NearDupIndex (bucketed at-rest signature index,
  the registered C2 pipeline) — ingest_epoch's banded candidate join +
  hash-Jaccard verdict at threshold 0.5.
- **PQ path**: materialize_ivfpq over the originals' embeddings
  (m=16, binary codes); incoming probed ADC-only (k=3, no full
  vectors read from the index); candidates verified by exact cosine
  ≥ 0.9 (query vec from the batch, corpus vec via the bounded id
  IN-fetch — the rerank mechanics as a verifier).

Recorded per path: planted recall, false drops among fresh docs,
at-rest index bytes, build + per-batch walls. The decision this
encodes (see PQ_DEDUP_gen100.json and the C2/C3 docstrings): text
near-dup keeps banded MinHash as default — its verdict is exact
set-similarity on the text itself; the PQ index is the candidate
generator when the similarity signal IS the embedding (semantic /
multimodal dedup, where no shingle set exists), at a fraction of the
full-vector index's bytes.

Usage:
    python -m tools.pq_dedup_study [--n 500000] [--dups 20000] [--fresh 5000]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq_pa

from pyspark.sql import functions as F

from smallquery_spark.queries.registry import ensure_driver_confs
from smallquery_spark.session import get_session

VOCAB = 50_000
DOC_LEN = 60
DIM = 64
N_EDITS = 3


def gen_fixture(n: int, n_dups: int, n_fresh: int, out_dir: str) -> None:
    """originals.parquet + incoming.parquet, both (doc_id, text, emb,
    src_id) — src_id marks a planted near-dup's source, -1 otherwise.
    Token-hash embeddings: emb(doc) = normalize(sum tv[token]), so a
    3-token edit moves the embedding by exactly the swapped tokens'
    vectors."""
    if os.path.exists(os.path.join(out_dir, "incoming.parquet")):
        return
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)
    vocab = np.array([f"t{i}" for i in range(VOCAB)])
    tv = rng.normal(0, 1, (VOCAB, DIM)).astype(np.float32)

    def embed(mat):
        out = np.empty((len(mat), DIM), dtype=np.float32)
        for lo in range(0, len(mat), 10_000):
            chunk = tv[mat[lo : lo + 10_000]].sum(axis=1)
            out[lo : lo + 10_000] = chunk
        return out / np.linalg.norm(out, axis=1, keepdims=True)

    def write(path, ids, mat, src):
        texts = [" ".join(vocab[row]) for row in mat]
        table = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "emb": pa.array(list(embed(mat)), pa.list_(pa.float32())),
                "src_id": pa.array(src, pa.int64()),
            }
        )
        pq_pa.write_table(table, path, compression="snappy")

    mat0 = rng.integers(0, VOCAB, (n, DOC_LEN))
    write(
        os.path.join(out_dir, "originals.parquet"),
        np.arange(n), mat0, np.full(n, -1),
    )

    src = rng.choice(n, n_dups, replace=False)
    dup_mat = mat0[src].copy()
    for i in range(n_dups):
        pos = rng.choice(DOC_LEN, N_EDITS, replace=False)
        dup_mat[i, pos] = rng.integers(0, VOCAB, N_EDITS)
    fresh_mat = rng.integers(0, VOCAB, (n_fresh, DOC_LEN))
    inc_mat = np.vstack([dup_mat, fresh_mat])
    inc_ids = np.arange(n, n + n_dups + n_fresh)
    inc_src = np.concatenate([src, np.full(n_fresh, -1)])
    write(
        os.path.join(out_dir, "incoming.parquet"), inc_ids, inc_mat, inc_src
    )


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
    n_dups = opt("--dups", 20_000, int)
    n_fresh = opt("--fresh", 5_000, int)
    out_path = opt("--out", "PQ_DEDUP_gen100.json", str)

    from tools.diskguard import preflight

    disk = preflight(10)

    from smallquery_spark.fsio import fs_for, table_location
    from smallquery_spark.operators.dedup import _banded_sig_df
    from smallquery_spark.operators.neardup_index import NearDupIndex
    from smallquery_spark.operators.pq import (
        ivfpq_search,
        materialize_ivfpq,
        pq_train,
    )
    from smallquery_spark.operators.similarity import (
        ivf_assign,
        ivf_build_centroids,
        ivf_defaults,
        pair_cosine_udf,
    )

    fix_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".fixtures",
        f"pqdedup_{n}_{n_dups}_{n_fresh}",
    )
    gen_fixture(n, n_dups, n_fresh, fix_dir)

    spark = get_session("smallquery-pq-dedup")
    ensure_driver_confs(spark)

    originals = spark.read.parquet(
        os.path.join(fix_dir, "originals.parquet")
    ).cache()
    incoming = spark.read.parquet(
        os.path.join(fix_dir, "incoming.parquet")
    ).cache()
    originals.count()
    incoming.count()
    planted = {
        int(r["doc_id"])
        for r in incoming.filter("src_id >= 0").select("doc_id").collect()
    }
    fresh = {
        int(r["doc_id"])
        for r in incoming.filter("src_id < 0").select("doc_id").collect()
    }

    out: dict = {
        "n_originals": n,
        "n_dups": n_dups,
        "n_fresh": n_fresh,
        "disk_preflight": disk,
    }

    def score(detected: set, wall_index: float, wall_batch: float,
              index_bytes: int) -> dict:
        return {
            "planted_recall": round(
                len(detected & planted) / max(len(planted), 1), 4
            ),
            "false_drops_fresh": len(detected & fresh),
            "index_bytes": index_bytes,
            "index_build_sec": round(wall_index, 3),
            "batch_sec": round(wall_batch, 3),
        }

    # ---- Path A: banded MinHash at-rest index ------------------------
    ndx = NearDupIndex(spark, f"pqdedup_{os.getpid()}")
    try:
        t0 = time.time()
        sig_orig = _banded_sig_df(originals)
        ndx.append(sig_orig, guard_existing=False)
        wall_idx = time.time() - t0
        mh_bytes = ndx._table_bytes(ndx.bands_table) + ndx._table_bytes(
            ndx.hashes_table
        )
        t0 = time.time()
        sig_in = _banded_sig_df(incoming)
        survivors = {
            int(r["doc_id"])
            for r in ndx.ingest_epoch(sig_in, threshold=0.5)
            .select("doc_id")
            .collect()
        }
        wall_batch = time.time() - t0
        detected = (planted | fresh) - survivors
        out["minhash"] = score(detected, wall_idx, wall_batch, mh_bytes)
    finally:
        ndx.drop()

    # ---- Path B: IVF-PQ over embeddings ------------------------------
    corpus = originals.select(
        F.col("doc_id").alias("c_id"), F.col("emb").alias("vec")
    )
    queries = incoming.select(
        F.col("doc_id").alias("q_id"), F.col("emb").alias("vec")
    )
    n_cells, n_probe = ivf_defaults(n)
    t0 = time.time()
    cents = ivf_build_centroids(corpus, n_cells=n_cells)
    books = pq_train(corpus, cents, m=16)
    t_pq = materialize_ivfpq(
        spark, ivf_assign(corpus, cents), cents, books,
        f"pqdedup_{os.getpid()}",
    )
    try:
        wall_idx = time.time() - t0
        loc = table_location(spark, t_pq)
        _, pq_bytes = fs_for(spark, loc).parquet_stats(loc)

        t0 = time.time()
        # ADC-only candidates (k=3): no full vectors read from the
        # index; the exact-cosine verdict fetches ONLY the bounded
        # candidate vectors (n_batch x 3 ids) through the IN-filter
        cand = ivfpq_search(
            spark, queries, t_pq, cents, books, k=3, n_probe=n_probe
        )
        cvec = corpus.select("c_id", F.col("vec").alias("__cv"))
        qvec = queries.select("q_id", F.col("vec").alias("__qv"))
        verified = (
            cand.join(cvec, "c_id")
            .join(qvec, "q_id")
            .withColumn("cos", pair_cosine_udf()("__qv", "__cv"))
            .filter(F.col("cos") >= 0.90)
            .select("q_id")
            .distinct()
        )
        detected_pq = {int(r["q_id"]) for r in verified.collect()}
        wall_batch = time.time() - t0
        out["ivfpq_adc"] = score(detected_pq, wall_idx, wall_batch, pq_bytes)
        # reference: what the FULL-VECTOR index costs at rest for the
        # same candidate job (the bytes PQ is avoiding)
        from smallquery_spark.operators.similarity import materialize_ivf

        t_full = materialize_ivf(
            spark, ivf_assign(corpus, cents), f"pqdedup_full_{os.getpid()}"
        )
        try:
            locf = table_location(spark, t_full)
            _, full_bytes = fs_for(spark, locf).parquet_stats(locf)
            out["full_vector_index_bytes"] = full_bytes
            out["pq_bytes_ratio_vs_full"] = round(
                full_bytes / max(pq_bytes, 1), 2
            )
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {t_full}")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_pq}")

    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
