"""IVF-PQ bytes, two ways the at-rest story must survive contact:

1. **Realized scan IO per probe** (VERDICT r10 #4) — the 12-19x
   "fewer at-rest bytes" of IVFPQ_gen100.json is parquet bytes on
   disk; the claim that matters at 100 TB is bytes READ per probe.
   This study executes the SAME probe batch against the full-vector
   index (ivf_search_indexed) and the PQ table (ivfpq_search), both
   routes, and records Spark's own executed-plan scan metrics
   (numFiles / filesSize / numOutputRows per parquet scan node,
   walked out of the AQE plan after collect) — the PQ analogue of
   SCANFLOOR_gen100.json. Expectation stated up front: on the pruned
   route both indexes read the same probed cell directories, so the
   per-probe input-bytes ratio should track the at-rest ratio; if
   parquet per-file overhead (headers/footers/dictionary pages) eats
   it at m=16's ~16-byte payloads, the number will say so.

2. **Code layout** (VERDICT r10 #5) — array<smallint> stores 16
   logical one-byte codes with parquet list overhead; a BinaryType
   column of m raw bytes should push m=16 from r9's 12.0x toward the
   theoretical 16x and shrink the Arrow width the ADC UDF decodes.
   Measured both ways at the same scale: at-rest bytes + pure-ADC
   wall (2 passes; pass 1 carries codegen). The winner is encoded as
   pq_encode's DEFAULT (the C4-counts-pass precedent: one measured
   representation decision, not a knob users must discover).

Usage:
    python -m tools.ivfpq_bytes [--n 2000000] [--queries 50]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

from pyspark.sql import functions as F

from smallquery_spark.queries.registry import ensure_driver_confs
from smallquery_spark.session import get_session
from tools.ivfpq_study import gen_embeddings


def executed_scan_metrics(df) -> list[dict]:
    """Parquet scan nodes' executed SQL metrics, walked out of the
    (adaptive) physical plan AFTER an action ran on ``df`` — the same
    numbers the Spark UI shows, no listener plumbing."""
    out: list[dict] = []

    def walk(p):
        s = p.getClass().getSimpleName()
        if s == "AdaptiveSparkPlanExec":
            walk(p.executedPlan())
            return
        if s.endswith("QueryStageExec"):
            walk(p.plan())
            return
        if s == "ReusedExchangeExec":
            walk(p.child())
            return
        if "Scan parquet" in p.nodeName():
            m = p.metrics()
            it = m.keysIterator()
            keys = []
            while it.hasNext():
                keys.append(it.next())
            vals = {k: int(m.apply(k).value()) for k in keys}
            try:
                loc = p.metadata().apply("Location")
            except Exception:
                loc = "?"
            out.append(
                {
                    "location": loc[-80:],
                    "numFiles": vals.get("numFiles"),
                    "filesSize": vals.get("filesSize"),
                    "numOutputRows": vals.get("numOutputRows"),
                }
            )
        it = p.children().iterator()
        while it.hasNext():
            walk(it.next())

    walk(df._jdf.queryExecution().executedPlan())
    return out


def main() -> None:
    argv = sys.argv[1:]

    def opt(flag, default, cast):
        if flag in argv:
            i = argv.index(flag)
            v = cast(argv[i + 1])
            del argv[i : i + 2]
            return v
        return default

    n = opt("--n", 2_000_000, int)
    n_queries = opt("--queries", 50, int)

    from tools.diskguard import preflight

    disk = preflight(15)

    from smallquery_spark.fsio import fs_for, table_location
    from smallquery_spark.operators.pq import (
        ivfpq_search,
        materialize_ivfpq,
        pq_train,
    )
    from smallquery_spark.operators.similarity import (
        ivf_assign,
        ivf_build_centroids,
        ivf_defaults,
        ivf_search_indexed,
        materialize_ivf,
    )

    fix_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".fixtures",
        f"pqstudy_{n}",
    )
    gen_embeddings(n, fix_dir)

    spark = get_session("smallquery-ivfpq-bytes")
    ensure_driver_confs(spark)

    emb_path = os.path.join(fix_dir, "embeddings.parquet")
    emb = spark.read.parquet(emb_path)
    corpus = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("vec")
    ).cache()
    n_corpus = corpus.count()
    n_cells, n_probe = ivf_defaults(n_corpus)

    # planted queries: the retrieval/near-dup regime PQ is for
    seed_rows = corpus.filter(F.col("c_id") < n_queries).collect()
    rng = np.random.RandomState(4242)
    planted = []
    for r in seed_rows:
        v = np.array(r["vec"], dtype=np.float64)
        v = v + rng.normal(0, 0.02, len(v))
        v = v / np.linalg.norm(v)
        planted.append((int(r["c_id"]) + 10_000_000, [float(x) for x in v]))
    queries = spark.createDataFrame(
        planted, "q_id long, vec array<double>"
    ).cache()
    queries.count()

    cents = ivf_build_centroids(corpus, n_cells=n_cells)
    assigned = ivf_assign(corpus, cents).localCheckpoint(eager=True)
    name = f"pqbytes_{os.getpid()}"

    def table_bytes(t):
        loc = table_location(spark, t)
        fs = fs_for(spark, loc)
        nfiles, nbytes = fs.parquet_stats(loc)
        meta_bytes = sum(
            size
            for path, size in fs.list_files_recursive(loc)
            if "/_meta" in path or path.endswith("_quantizer_gen")
        )
        return {"files": nfiles, "bytes": nbytes, "meta_bytes": meta_bytes}

    tables: list[str] = []
    out: dict = {
        "n_corpus": n_corpus,
        "n_queries": n_queries,
        "n_cells": n_cells,
        "n_probe": n_probe,
        "disk_preflight": disk,
    }
    try:
        t_full = materialize_ivf(spark, assigned, name)
        tables.append(t_full)
        out["full"] = table_bytes(t_full)

        books16 = pq_train(corpus, cents, m=16)
        books8 = pq_train(corpus, cents, m=8)
        builds = {
            "pq16_array": (books16, "array"),
            "pq16_binary": (books16, "binary"),
            "pq8_array": (books8, "array"),
        }
        t_by_key: dict[str, tuple[str, object]] = {}
        for key, (books, fmt) in builds.items():
            t0 = time.time()
            t = materialize_ivfpq(
                spark, assigned, cents, books, f"{name}_{key}",
                code_format=fmt,
            )
            tables.append(t)
            t_by_key[key] = (t, books)
            row = table_bytes(t)
            row["materialize_sec"] = round(time.time() - t0, 3)
            row["ratio_vs_full"] = round(
                out["full"]["bytes"] / max(row["bytes"], 1), 2
            )
            out[key] = row

        # ---- code-format wall: pure ADC, 2 passes each --------------
        fmt_walls: dict = {}
        for key in ("pq16_binary", "pq16_array"):
            t, books = t_by_key[key]
            walls = []
            res_prev = None
            for _ in range(2):
                t0 = time.time()
                res = ivfpq_search(
                    spark, queries, t, cents, books16, k=10, n_probe=n_probe
                ).localCheckpoint(eager=True)
                res.count()
                walls.append(round(time.time() - t0, 3))
                if res_prev is not None:
                    assert res.exceptAll(res_prev).count() == 0
                res_prev = res
            fmt_walls[key] = walls
        # cross-format value identity (the storage-only claim)
        out["codefmt"] = {
            "adc_wall_sec": fmt_walls,
            "bytes": {
                k: out[k]["bytes"] for k in ("pq16_binary", "pq16_array")
            },
            "ratio_vs_full": {
                k: out[k]["ratio_vs_full"]
                for k in ("pq16_binary", "pq16_array")
            },
        }

        # ---- realized scan IO per probe batch ------------------------
        # two batch sizes: 50 queries cover ~every cell (auto route
        # reads the whole index either way — pruning is a SMALL-batch
        # lever), 5 queries show the pruned directory read both
        # indexes share
        scan_io: dict = {}
        t_pq, _ = t_by_key["pq16_array"]
        for batch_label, qdf in (
            ("batch50", queries),
            ("batch5", queries.limit(5).localCheckpoint(eager=True)),
        ):
            for route in ("pruned", "full"):
                r_full = ivf_search_indexed(
                    spark, qdf, t_full, cents, k=10, n_probe=n_probe,
                    route=route,
                )
                r_full.collect()
                r_pq = ivfpq_search(
                    spark, qdf, t_pq, cents, books16, k=10,
                    n_probe=n_probe, route=route,
                )
                r_pq.collect()
                mf = executed_scan_metrics(r_full)
                mp = executed_scan_metrics(r_pq)
                fb = sum(m["filesSize"] or 0 for m in mf)
                pb = sum(m["filesSize"] or 0 for m in mp)
                scan_io[f"{batch_label}_{route}"] = {
                    "full_scan_nodes": mf,
                    "pq_scan_nodes": mp,
                    "full_probe_bytes": fb,
                    "pq_probe_bytes": pb,
                    "probe_bytes_ratio": round(fb / max(pb, 1), 2),
                }
        # reranked PQ probe: candidate fetch reads the UNcached parquet
        # corpus through the pushed id IN-filter — file-granularity
        # bytes for the point-fetch stage
        corpus_cold = spark.read.parquet(emb_path).select(
            F.col("vec_id").alias("c_id"), F.col("embedding").alias("vec")
        )
        r_rr = ivfpq_search(
            spark, queries, t_pq, cents, books16, k=10, n_probe=n_probe,
            rerank=4, rerank_corpus=corpus_cold,
        )
        r_rr.collect()
        scan_io["rerank_final_plan_nodes"] = executed_scan_metrics(r_rr)
        scan_io["at_rest_ratio_pq16_array"] = out["pq16_array"][
            "ratio_vs_full"
        ]
        out["scan_io"] = scan_io
    finally:
        for t in tables:
            spark.sql(f"DROP TABLE IF EXISTS {t}")

    with open("IVFPQ_CODEFMT_gen100.json", "w") as f:
        json.dump(
            {
                k: out[k]
                for k in (
                    "n_corpus", "n_queries", "n_cells", "n_probe",
                    "full", "pq16_array", "pq16_binary", "pq8_array",
                    "codefmt",
                )
            },
            f, indent=1,
        )
        f.write("\n")
    with open("IVFPQ_SCANIO_gen100.json", "w") as f:
        json.dump(
            {
                k: out[k]
                for k in (
                    "n_corpus", "n_queries", "n_cells", "n_probe",
                    "full", "pq16_array", "scan_io",
                )
            },
            f, indent=1,
        )
        f.write("\n")
    print(json.dumps(out["codefmt"]))
    print(json.dumps({r: {kk: vv for kk, vv in v.items() if "nodes" not in kk}
                      for r, v in out["scan_io"].items()
                      if isinstance(v, dict)}))


if __name__ == "__main__":
    main()
