"""C2 MinHash-LSH recall/precision measurement at sf0.1 (VERDICT r3 item 6).

Ground truth: exact n-gram Jaccard over all (size-prefiltered) pairs of
the sf0.1 documents table (~5,000 docs → ~12.5M raw pairs — bounded,
validation-only; the quadratic path exists precisely to grade the LSH
path and never runs at production scale).

Measured: ``minhash_lsh_pairs`` at several numHashTables settings.
  recall    = |LSH-candidates ∩ truth| / |truth|
  precision = after exact-Jaccard re-check of candidates (the production
              pipeline always re-checks, so precision-after-verify is
              what downstream sees; raw candidate precision is also
              reported to price the re-check work).

Usage: python -m tools.lsh_recall [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

from smallquery_spark.operators.dedup import (
    banded_minhash_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    word_shingles,
)
from smallquery_spark.session import get_session

# 0.5: the production near-dup cutoff (pairs are bimodal here: injected
# near-dups sit at ~0.9 Jaccard, random word-soup pairs near 0 — easy).
# 0.8: cuts THROUGH the near-dup cluster, so pairs sit close to the
# threshold and bucket-collision recall is genuinely stressed.
THRESHOLDS = (0.5, 0.8)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_session("lsh-recall")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    # The exact ground-truth join is a theta join (a_id < b_id) → Spark
    # plans a BroadcastNestedLoopJoin whose parallelism is the LEFT
    # side's partition count; a single small parquet file reads as one
    # partition and would serialize the whole quadratic check onto one
    # core. Spread it across the machine first.
    docs = docs.repartition(64).cache()
    n_docs = docs.count()

    # One exact pass with Jaccard VALUES kept (min threshold of the
    # operating points), filtered per threshold afterwards.
    t0 = time.time()
    truth_all = ngram_jaccard_pairs(docs, threshold=min(THRESHOLDS)).cache()
    truth_all.count()
    truth_sec = round(time.time() - t0, 3)

    # exact shingle sets for the precision re-check
    sh = docs.select("doc_id", word_shingles("text", 3).alias("s"))
    a = sh.select(F.col("doc_id").alias("a_id"), F.col("s").alias("a_s"))
    b = sh.select(F.col("doc_id").alias("b_id"), F.col("s").alias("b_s"))

    runs = []
    for threshold in THRESHOLDS:
        truth = truth_all.filter(F.col("jaccard") >= threshold).select(
            "a_id", "b_id"
        )
        n_truth = truth.count()
        for n_tables in (4, 8, 16):
            t0 = time.time()
            cand = (
                minhash_lsh_pairs(
                    docs, num_hash_tables=n_tables, jaccard_threshold=threshold
                )
                .select("a_id", "b_id")
                .cache()
            )
            n_cand = cand.count()
            lsh_sec = round(time.time() - t0, 3)

            hits = cand.join(truth, ["a_id", "b_id"], "inner").count()
            # exact re-check of candidates (production post-filter)
            rechecked = (
                cand.join(a, "a_id")
                .join(b, "b_id")
                .withColumn(
                    "j",
                    F.size(F.array_intersect("a_s", "b_s"))
                    / (
                        F.size("a_s")
                        + F.size("b_s")
                        - F.size(F.array_intersect("a_s", "b_s"))
                    ),
                )
                .filter(F.col("j") >= threshold)
                .count()
            )
            runs.append(
                {
                    "threshold": threshold,
                    "num_hash_tables": n_tables,
                    "truth_pairs": n_truth,
                    "candidates": n_cand,
                    "lsh_sec": lsh_sec,
                    "recall": round(hits / n_truth, 4) if n_truth else None,
                    "precision_raw": round(hits / n_cand, 4)
                    if n_cand
                    else None,
                    "precision_after_recheck": round(rechecked / n_cand, 4)
                    if n_cand
                    else None,
                }
            )
            cand.unpersist()
            print(json.dumps(runs[-1]), file=sys.stderr, flush=True)

        # native (b, r)-banded MinHash at the same threshold. Its exact
        # re-check makes precision 1.0 by construction; measured anyway.
        for bands, r in ((8, 2), (16, 2), (8, 4)):
            t0 = time.time()
            cand = (
                banded_minhash_pairs(
                    docs, bands=bands, rows_per_band=r, threshold=threshold
                )
                .select("a_id", "b_id")
                .cache()
            )
            n_cand = cand.count()
            lsh_sec = round(time.time() - t0, 3)
            hits = cand.join(truth, ["a_id", "b_id"], "inner").count()
            runs.append(
                {
                    "threshold": threshold,
                    "banded": f"b={bands},r={r}",
                    "truth_pairs": n_truth,
                    "candidates": n_cand,
                    "lsh_sec": lsh_sec,
                    "recall": round(hits / n_truth, 4) if n_truth else None,
                    "precision_raw": round(hits / n_cand, 4)
                    if n_cand
                    else None,
                }
            )
            cand.unpersist()
            print(json.dumps(runs[-1]), file=sys.stderr, flush=True)

    result = {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "thresholds": list(THRESHOLDS),
        "truth_sec": truth_sec,
        "runs": runs,
    }
    print(json.dumps(result))
    if out_path:
        with open(out_path, "w") as f:
            f.write(json.dumps(result) + "\n")


if __name__ == "__main__":
    main()
