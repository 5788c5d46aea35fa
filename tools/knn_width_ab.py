"""knn_bruteforce norm-hoist demonstration at PRODUCTION embedding
width (r15, VERDICT r14 #5): the r14 hoist moved the two O(dim) norm
folds out of the |Q|x|C| pair expression, a claim unfalsifiable at the
dim=8 fixture. This measures the pair-scoring wall at dim>=768 with
deterministic synthetic vectors (xxhash64-derived — both trees score
identical data).

Run once per tree (PYTHONPATH picks the smallquery_spark under test),
alternating legs, and compare per-leg MIN (co-load only adds time):

  PYTHONPATH=/root/repo_before python tools/knn_width_ab.py --tag before
  PYTHONPATH=/root/repo        python tools/knn_width_ab.py --tag after

Prints one JSON line: {"tag", "dim", "n_corpus", "n_queries", "walls",
"min_sec"} — walls are n fresh executions of the scoring job (noop-
style count over the top-k result; the window/top-k cost is identical
in both trees, the delta is the per-pair expression work).
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    args = sys.argv[1:]

    def _opt(name, default, cast=int):
        return cast(args[args.index(name) + 1]) if name in args else default

    dim = _opt("--dim", 768)
    n_corpus = _opt("--corpus", 40_000)
    n_queries = _opt("--queries", 24)
    n_runs = _opt("--runs", 3)
    tag = _opt("--tag", "untagged", str)

    from pyspark.sql import functions as F

    from smallquery_spark.operators.similarity import knn_bruteforce
    from smallquery_spark.session import get_session

    spark = get_session("knn-width-ab")

    def vecs(n: int, prefix: str, idc: str, vc: str):
        return spark.range(n).select(
            F.col("id").alias(idc),
            F.expr(
                f"transform(sequence(1, {dim}),"
                f" j -> pmod(xxhash64(id, j, {prefix!r}), 1000000)"
                " / 1000000.0 - 0.5)"
            ).alias(vc),
        )

    corpus = vecs(n_corpus, "c", "c_id", "c_vec").localCheckpoint(eager=True)
    queries = vecs(n_queries, "q", "q_id", "q_vec").localCheckpoint(
        eager=True
    )
    # (materialized inputs: the measured region is the pair scoring +
    # top-k, not the synthetic-vector generation)

    walls = []
    for _ in range(n_runs):
        t0 = time.time()
        out = knn_bruteforce(
            queries, corpus, k=10, include_self=True
        )
        out.write.format("noop").mode("overwrite").save()
        walls.append(round(time.time() - t0, 3))
    print(
        json.dumps(
            {
                "tag": tag,
                "dim": dim,
                "n_corpus": n_corpus,
                "n_queries": n_queries,
                "walls": walls,
                "min_sec": min(walls),
            }
        )
    )


if __name__ == "__main__":
    main()
