"""Near-dup detection at multi-million-doc scale (VERDICT r4 item 3).

LSH_RECALL.json grades recall on the 5k-doc sf0.1 corpus, where exact
all-pairs ground truth is computable. This study pushes the corpus to
millions of documents, where all-pairs truth is impossible (25T pairs at
5M docs) — instead it uses the fixture generator's PLANTED truth: near
-dups are constructed as consecutive (i-1, i) pairs at i % 13 == 12
(tools/gen_fixtures.py), so the true-pair set is linear to compute
(join doc i with doc i-1, exact Jaccard on that single pair). Word-soup
texts drawn independently from the vocab make non-planted collisions at
J >= 0.5 vanishingly rare, and the banded path's exact re-check means
any such pair it finds is still a TRUE pair (precision 1.0 regardless).

Measured per method (banded (b,r) MinHash vs Spark ML MinHashLSH) and
threshold: wall time, candidate-pair count (the bucket-collision
volume), recall vs planted truth, and for the banded path a phase
profile (signature/explode pass vs bucket join) — the r4 verdict asked
where the banded constant factor goes.

Usage:
    python -m tools.lsh_scale [n_docs] [--skip-mllib] [--out out.json]
Fixture is cached at .fixtures/docs<n>/documents.parquet.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

THRESHOLDS = (0.5, 0.8)


def gen_documents(n_doc: int, out_dir: str) -> str:
    """documents-only fixture, gen_fixtures conventions (seed 42, same
    vocab, same planted-near-dup scheme, ~64 row groups)."""
    from tools.gen_fixtures import VOCAB

    path = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)
    vocab = np.array(VOCAB)
    texts: list[str] = []
    t0 = time.time()
    for i in range(n_doc):
        if i % 13 == 12 and i > 0:
            words = texts[-1].split()
            for j in rng.integers(0, len(words), 2):
                words[int(j)] = str(vocab[int(rng.integers(0, len(vocab)))])
            texts.append(" ".join(words))
        else:
            n_words = int(rng.integers(10, 100))
            texts.append(" ".join(vocab[rng.integers(0, len(vocab), n_words)]))
    langs = np.array(["en", "de", "fr", "es", "pt"])[
        rng.choice(5, n_doc, p=[0.6, 0.1, 0.1, 0.1, 0.1])
    ]
    table = pa.table(
        {
            "doc_id": pa.array(np.arange(n_doc), pa.int64()),
            "text": texts,
            "lang": pa.array(langs),
            "source": pa.array([f"src{i % 20}" for i in range(n_doc)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(table, path, row_group_size=max(1000, n_doc // 64))
    print(
        f"generated {n_doc} docs in {time.time() - t0:.1f}s -> {path}",
        file=sys.stderr,
        flush=True,
    )
    return path


def planted_truth(docs, threshold: float):
    """Exact-Jaccard-verified planted pairs — linear in corpus size."""
    from smallquery_spark.operators.dedup import word_shingles

    sh = docs.select(
        "doc_id", word_shingles("text", 3).alias("s")
    )
    a = sh.select((F.col("doc_id") + 1).alias("doc_id"), F.col("s").alias("a_s"))
    planted = (
        sh.filter((F.col("doc_id") % 13 == 12) & (F.col("doc_id") > 0))
        .join(a, "doc_id")
        .withColumn(
            "j",
            F.size(F.array_intersect("s", "a_s"))
            / (
                F.size("s")
                + F.size("a_s")
                - F.size(F.array_intersect("s", "a_s"))
            ),
        )
        .filter(F.col("j") >= threshold)
        .select(
            (F.col("doc_id") - 1).alias("a_id"), F.col("doc_id").alias("b_id")
        )
    )
    return planted


def main() -> None:
    argv = sys.argv[1:]
    skip_mllib = "--skip-mllib" in argv
    if skip_mllib:
        argv.remove("--skip-mllib")
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv):
            raise SystemExit("--out needs a value")
        out_path = argv[i + 1]
        del argv[i : i + 2]
    configs_arg = None
    if "--configs" in argv:
        i = argv.index("--configs")
        if i + 1 >= len(argv):
            raise SystemExit("--configs needs b:r[,b:r...]")
        configs_arg = tuple(
            tuple(int(x) for x in pair.split(":"))
            for pair in argv[i + 1].split(",")
        )
        del argv[i : i + 2]
    thresholds = THRESHOLDS
    if "--thresholds" in argv:
        i = argv.index("--thresholds")
        if i + 1 >= len(argv):
            raise SystemExit("--thresholds needs t[,t...]")
        thresholds = tuple(float(x) for x in argv[i + 1].split(","))
        del argv[i : i + 2]
    n_doc = int(argv[0]) if argv else 5_000_000

    from smallquery_spark.operators.dedup import (
        banded_minhash_pairs,
        minhash_lsh_pairs,
    )
    from smallquery_spark.session import get_session

    fixture_dir = os.path.join(".fixtures", f"docs{n_doc}")
    path = gen_documents(n_doc, fixture_dir)
    spark = get_session("lsh-scale")
    docs = spark.read.parquet(path)

    runs = []
    result = {"n_docs": n_doc, "thresholds": list(thresholds), "runs": runs}
    for threshold in thresholds:
        t0 = time.time()
        truth = planted_truth(docs, threshold).cache()
        n_truth = truth.count()
        truth_sec = round(time.time() - t0, 3)
        print(
            f"t={threshold}: {n_truth} planted truth pairs [{truth_sec}s]",
            file=sys.stderr,
            flush=True,
        )

        # --- banded (b, r), phase-profiled --------------------------------
        # Band selectivity must be sized to the corpus: chance band
        # collisions scale ~ n²·s^r (s = per-minhash agreement of
        # near-zero-J pairs). (8,2) is fine at 1M docs (13.5M raw
        # collisions) but its collision volume at 5M (~25×) exceeds
        # local spill capacity — the exact failure mode r exists to
        # kill, so multi-million corpora run the r=4 configs only.
        configs = configs_arg or (
            ((8, 2), (16, 4)) if n_doc < 2_000_000 else ((16, 4), (32, 4))
        )
        for bands, r in configs:
            # phase 1: signature + band keys alone (materialized count)
            from smallquery_spark.operators.dedup import (
                _banded_keys_df as keys_df,
            )

            t0 = time.time()
            banded = keys_df(docs, n=3, bands=bands, rows_per_band=r)
            n_bucket_rows = banded.count()
            sig_sec = round(time.time() - t0, 3)
            # full pipeline (includes a second signature pass — the
            # operator is a single lazy plan; the delta prices the join)
            t0 = time.time()
            cand = (
                banded_minhash_pairs(
                    docs, bands=bands, rows_per_band=r, threshold=threshold
                )
                .select("a_id", "b_id")
                .cache()
            )
            n_cand = cand.count()
            total_sec = round(time.time() - t0, 3)
            hits = cand.join(truth, ["a_id", "b_id"], "inner").count()
            runs.append(
                {
                    "method": f"banded b={bands},r={r}",
                    "threshold": threshold,
                    "truth_pairs": n_truth,
                    "bucket_rows": n_bucket_rows,
                    "sig_pass_sec": sig_sec,
                    "total_sec": total_sec,
                    "pairs_found": n_cand,
                    "recall_vs_planted": round(hits / n_truth, 4)
                    if n_truth
                    else None,
                }
            )
            cand.unpersist()
            print(json.dumps(runs[-1]), file=sys.stderr, flush=True)

        # --- Spark ML MinHashLSH (r=1 per table) --------------------------
        if not skip_mllib:
            t0 = time.time()
            cand = (
                minhash_lsh_pairs(
                    docs, num_hash_tables=8, jaccard_threshold=threshold
                )
                .select("a_id", "b_id")
                .cache()
            )
            n_cand = cand.count()
            total_sec = round(time.time() - t0, 3)
            hits = cand.join(truth, ["a_id", "b_id"], "inner").count()
            runs.append(
                {
                    "method": "mllib minhash 8 tables",
                    "threshold": threshold,
                    "truth_pairs": n_truth,
                    "total_sec": total_sec,
                    "pairs_found": n_cand,
                    "recall_vs_planted": round(hits / n_truth, 4)
                    if n_truth
                    else None,
                }
            )
            cand.unpersist()
            print(json.dumps(runs[-1]), file=sys.stderr, flush=True)
        truth.unpersist()

    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
