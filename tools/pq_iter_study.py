"""Driver residency of ivfpq_search's chunk assembly (VERDICT r10 #3).

The r10 chunking bounded the executor-side scale-killer (n_q-
proportional LUT closures) but the DRIVER still materialized every
query Row before the first chunk ran: a 10M-query batch is ~5+ GB of
Rows up front. r11 drives chunk assembly off ``toLocalIterator`` —
peak driver residency is one chunk (plus the prefetching partition)
regardless of batch size. This study measures BOTH implementations in
separate processes (no shared interpreter state), with driver VmRSS
sampled at 50 ms DURING the search window — a lifetime high-water
mark (ru_maxrss) is the wrong instrument, because the index-build
phase peaks above the search and masks the comparison (measured:
both modes reported delta 0 against the build peak in the first cut).
Recorded per mode: search-window peak RSS delta, wall, and a result
checksum that must match between modes (identical results at any
assembly strategy — the r10 chunk-identity contract extended to the
iterator).

``--mode collect`` reproduces the r10 path faithfully OUTSIDE the
operator (full ``collect()``, then per-slice createDataFrame +
ivfpq_search + eager checkpoint + union) — the operator itself now
only has the iterator path; the measured default is encoded, not
flagged.

Queries are read from a parquet staged by the parent (a genuinely
distributed source — createDataFrame from driver lists would charge
the query bytes to the driver before the search even starts and void
the comparison).

Usage:
    python -m tools.pq_iter_study [--corpus 50000] [--queries 100000]
        [--chunk 4096] [--out PQ_ITER_gen100.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np
from pyspark.sql import functions as F


def _opt(argv, flag, default, cast):
    if flag in argv:
        i = argv.index(flag)
        v = cast(argv[i + 1])
        del argv[i : i + 2]
        return v
    return default


def _gen(rng, modes, n):
    labels = rng.integers(0, len(modes), n)
    X = modes[labels] + rng.normal(0, 0.10, (n, modes.shape[1]))
    return X / np.linalg.norm(X, axis=1, keepdims=True)


def _rss_kb() -> int:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1])
    return 0


class _RssSampler:
    """Max driver VmRSS sampled at 50 ms DURING a window — ru_maxrss
    is a lifetime high-water mark, so the index-build phase (numpy
    k-means, sample collects) would mask the search-time peak this
    study exists to compare (measured: both modes reported delta 0
    against the build peak)."""

    def __init__(self) -> None:
        import threading

        self.baseline = _rss_kb()
        self.peak = self.baseline
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)
        self._t.start()

    def _run(self) -> None:
        while not self._stop.is_set():
            self.peak = max(self.peak, _rss_kb())
            self._stop.wait(0.05)

    def stop(self) -> tuple[int, int]:
        self._stop.set()
        self._t.join()
        return self.baseline, self.peak


def _run_mode(mode: str, n_corpus: int, n_queries: int, chunk: int,
              qpath: str) -> None:
    from smallquery_spark.operators.pq import (
        drop_index,
        ivfpq_search,
        materialize_ivfpq,
        pq_train,
    )
    from smallquery_spark.operators.similarity import (
        ivf_assign,
        ivf_build_centroids,
        ivf_defaults,
    )
    from smallquery_spark.queries.registry import ensure_driver_confs
    from smallquery_spark.session import get_session
    from tools.ivfpq_study import gen_embeddings

    spark = get_session(f"smallquery-pq-iter-{mode}")
    ensure_driver_confs(spark)

    # corpus from a parquet fixture, NOT createDataFrame from driver
    # lists — the corpus bytes must never touch the driver heap, or
    # they dominate the very RSS comparison being measured
    fix_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".fixtures", f"pqiter_{n_corpus}",
    )
    emb_path = gen_embeddings(n_corpus, fix_dir)
    corpus = spark.read.parquet(emb_path).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("vec")
    )
    n_cells, n_probe = ivf_defaults(n_corpus)
    cents = ivf_build_centroids(corpus, n_cells=n_cells)
    books = pq_train(corpus, cents, m=16)
    tname = materialize_ivfpq(
        spark, ivf_assign(corpus, cents), cents, books,
        f"pqiter_{mode}_{os.getpid()}",
    )
    queries = spark.read.parquet(qpath)

    try:
        sampler = _RssSampler()
        t0 = time.time()
        if mode == "iterator":
            res = ivfpq_search(
                spark, queries, tname, cents, books,
                k=1, n_probe=n_probe, query_chunk=chunk,
            )
        else:  # the r10 collect-then-slice shape, reproduced faithfully
            qrows = queries.select("q_id", "vec").collect()
            schema = queries.select("q_id", "vec").schema
            parts = []
            for lo in range(0, len(qrows), chunk):
                cdf = spark.createDataFrame(qrows[lo : lo + chunk], schema)
                parts.append(
                    ivfpq_search(
                        spark, cdf, tname, cents, books,
                        k=1, n_probe=n_probe, query_chunk=chunk,
                    ).localCheckpoint(eager=True)
                )
            res = parts[0]
            for p in parts[1:]:
                res = res.unionByName(p)
        check = res.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("q_id", "c_id", "rnk")).alias("h"),
        ).collect()[0]
        wall = time.time() - t0
        rss0, rss1 = sampler.stop()
        print(
            "MODE_RESULT "
            + json.dumps(
                {
                    "mode": mode,
                    "wall_sec": round(wall, 2),
                    "rss_before_kb": rss0,
                    "rss_peak_kb": rss1,
                    "rss_delta_mb": round((rss1 - rss0) / 1024.0, 1),
                    "n_results": check["n"],
                    "checksum": int(check["h"]),
                }
            ),
            flush=True,
        )
    finally:
        drop_index(spark, tname)


def main() -> None:
    argv = sys.argv[1:]
    n_corpus = _opt(argv, "--corpus", 50_000, int)
    n_queries = _opt(argv, "--queries", 100_000, int)
    chunk = _opt(argv, "--chunk", 4096, int)
    out_path = _opt(argv, "--out", "PQ_ITER_gen100.json", str)
    mode = _opt(argv, "--mode", None, str)
    qpath = _opt(argv, "--qpath", None, str)

    if mode:  # child invocation
        _run_mode(mode, n_corpus, n_queries, chunk, qpath)
        return

    from tools.diskguard import preflight

    disk = preflight(10)

    # stage the query batch once: a distributed parquet source shared
    # by both child runs (identical bytes -> identical results)
    from smallquery_spark.queries.registry import ensure_driver_confs
    from smallquery_spark.session import get_session

    spark = get_session("smallquery-pq-iter-stage")
    ensure_driver_confs(spark)
    rng = np.random.default_rng(7)
    modes_arr = np.random.default_rng(42).normal(0, 1, (10, 64))
    Q = _gen(rng, modes_arr, n_queries)
    work = tempfile.mkdtemp(prefix="smallquery_pqiter_")
    qpath = os.path.join(work, "queries")
    spark.createDataFrame(
        [(10_000_000 + i, [float(x) for x in Q[i]]) for i in range(n_queries)],
        "q_id long, vec array<double>",
    ).repartition(16).write.mode("overwrite").parquet(qpath)
    spark.stop()

    out: dict = {
        "n_corpus": n_corpus,
        "n_queries": n_queries,
        "chunk": chunk,
        "disk_preflight": disk,
        "modes": {},
    }
    order = ("iterator", "collect")
    if "--reverse" in argv:  # ordering control, the PQ_CHUNK precedent
        order = ("collect", "iterator")
    for m in order:
        proc = subprocess.run(
            [
                sys.executable, "-m", "tools.pq_iter_study",
                "--mode", m, "--qpath", qpath,
                "--corpus", str(n_corpus), "--queries", str(n_queries),
                "--chunk", str(chunk),
            ],
            capture_output=True, text=True, cwd=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))
            ),
        )
        line = next(
            (ln for ln in proc.stdout.splitlines()
             if ln.startswith("MODE_RESULT ")),
            None,
        )
        if line is None:
            raise RuntimeError(
                f"mode {m} produced no result; stderr tail:\n"
                + proc.stderr[-2000:]
            )
        out["modes"][m] = json.loads(line[len("MODE_RESULT "):])
        print(f"  {out['modes'][m]}", file=sys.stderr, flush=True)

    it, co = out["modes"]["iterator"], out["modes"]["collect"]
    out["results_identical"] = (
        it["n_results"] == co["n_results"]
        and it["checksum"] == co["checksum"]
    )
    out["rss_delta_ratio_iter_vs_collect"] = round(
        it["rss_delta_mb"] / max(co["rss_delta_mb"], 0.1), 3
    )
    out["wall_ratio_iter_vs_collect"] = round(
        it["wall_sec"] / max(co["wall_sec"], 1e-9), 3
    )

    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
