"""Bucketed-table takedown: bucket-scoped rewrite vs full rewrite —
the measured choice behind delete_bucketed (VERDICT r12 #1: "bucketed
tables can't be partially rewritten by partition, so this needs a
bucket-preserving rewrite or a tombstone+compact recipe with the
choice measured").

Three candidate recipes for deleting k ids from an n-bucket table:

- **bucket-scoped rewrite** (shipped, operators/bucketing.py): rewrite
  only the ≤k buckets the ids hash to. Work ∝ touched-bucket bytes.
- **full rewrite**: read table, anti-join, write_bucketed to a fresh
  table, catalog-rename swap. Work ∝ table bytes, every time.
- **tombstone + compact** (REJECTED without measurement, on policy
  grounds): a ``_deleted`` side-table with reads anti-joining it defers
  the actual byte removal to the next compaction — but the takedown
  operator exists for PII/legal removal, where "the bytes are still at
  rest until some later maintenance runs" is not a deletion. A
  tombstone is a read-path filter, not a takedown; no wall measurement
  changes that.

This harness makes the first two a number at gen scale (2M rows, 256
buckets — the rerank-corpus shape) for a point takedown (8 ids) and a
bulk one (10k ids), recording wall and bytes rewritten. Expected
regime, then verified: point deletes rewrite ~k/n of the table (the
shipped default's win); bulk deletes touch every bucket, converging to
full-rewrite cost through a per-bucket protocol — at that point the
full rewrite's single job is the better plan, which is why
delete_bucketed's docstring tells bulk callers to expect table-sized
work either way. The id_col != bucket_col regime (NearDupIndex's bands
table) is the bulk row by construction: every bucket may hold victims.

Usage:
    python -m tools.takedown_study [--n 2000000] [--dim 64]
        [--buckets 256] [--out TAKEDOWN_gen100.json]
"""

from __future__ import annotations

import json
import os
import sys
import time


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
    dim = opt("--dim", 64, int)
    n_buckets = opt("--buckets", 256, int)
    out_path = opt("--out", "TAKEDOWN_gen100.json", str)

    from tools.diskguard import preflight

    disk = preflight(10)

    from pyspark.sql import functions as F

    from smallquery_spark.fsio import fs_for, table_location
    from smallquery_spark.operators.bucketing import (
        delete_bucketed,
        write_bucketed,
    )
    from smallquery_spark.queries.registry import ensure_driver_confs
    from smallquery_spark.session import get_session

    spark = get_session("smallquery-takedown-study")
    ensure_driver_confs(spark)

    out: dict = {
        "n": n,
        "dim": dim,
        "n_buckets": n_buckets,
        "disk_preflight": disk,
    }
    t_tbl = f"tkds_{os.getpid()}"
    corpus = spark.range(n).select(
        F.col("id").alias("c_id"),
        F.expr(
            f"transform(sequence(1, {dim}),"
            " j -> cast(pmod(hash(id, j), 2000) - 1000 as double) / 1000.0)"
        ).alias("vec"),
    )
    t0 = time.time()
    write_bucketed(corpus, t_tbl, "c_id", n_buckets)
    out["build_sec"] = round(time.time() - t0, 3)
    loc = table_location(spark, t_tbl)
    fs = fs_for(spark, loc)

    def table_bytes():
        return sum(
            sz
            for p, sz in fs.list_files_recursive(loc)
            if p.endswith(".parquet")
        )

    def del_bytes(token_round):
        # bytes REWRITTEN by a delete = the part-del files it renamed in
        return sum(
            sz
            for p, sz in fs.list_files_recursive(loc)
            if "/part-del-" in p and p.endswith(".parquet")
        ) - token_round

    out["table_bytes"] = table_bytes()

    try:
        # --- point takedown: 8 scattered ids -------------------------
        ids8 = [3, 250_001, 500_007, 750_013, 1_000_019, 1_250_023,
                1_500_029, 1_750_031]
        seen0 = del_bytes(0)
        t0 = time.time()
        assert delete_bucketed(spark, t_tbl, ids8, "c_id") == len(ids8)
        out["point_delete"] = {
            "n_ids": len(ids8),
            "wall_sec": round(time.time() - t0, 3),
            "buckets_touched": len(
                {
                    int(r["b"])
                    for r in spark.createDataFrame(
                        [(i,) for i in ids8], "c_id long"
                    )
                    .select(
                        F.pmod(F.hash("c_id"), F.lit(n_buckets)).alias("b")
                    )
                    .collect()
                }
            ),
            "bytes_rewritten": del_bytes(seen0),
        }
        out["point_delete"]["fraction_of_table"] = round(
            out["point_delete"]["bytes_rewritten"] / out["table_bytes"], 4
        )

        # --- bulk takedown: 10k ids (every bucket hit) ----------------
        bulk = spark.range(10_000).select(
            (F.col("id") * 199 + 11).alias("c_id")
        )
        seen1 = del_bytes(0)
        t0 = time.time()
        n_del = delete_bucketed(spark, t_tbl, bulk, "c_id")
        out["bulk_delete"] = {
            "n_ids": 10_000,
            "rows_deleted": n_del,
            "wall_sec": round(time.time() - t0, 3),
            "bytes_rewritten": del_bytes(seen1),
        }

        # --- full-rewrite alternative (the same 8-id point delete) ----
        t_full = f"tkds_full_{os.getpid()}"
        t0 = time.time()
        survivors = spark.table(t_tbl).join(
            spark.createDataFrame([(i,) for i in ids8], "c_id long"),
            "c_id",
            "left_anti",
        )
        write_bucketed(survivors, t_full, "c_id", n_buckets)
        out["full_rewrite"] = {
            "wall_sec": round(time.time() - t0, 3),
            "bytes_rewritten": sum(
                sz
                for p, sz in fs_for(
                    spark, table_location(spark, t_full)
                ).list_files_recursive(table_location(spark, t_full))
                if p.endswith(".parquet")
            ),
        }
        spark.sql(f"DROP TABLE IF EXISTS {t_full}")

        out["point_vs_full_wall"] = round(
            out["full_rewrite"]["wall_sec"]
            / max(out["point_delete"]["wall_sec"], 1e-9),
            2,
        )
        out["point_vs_full_bytes"] = round(
            out["full_rewrite"]["bytes_rewritten"]
            / max(out["point_delete"]["bytes_rewritten"], 1),
            2,
        )
        out["bulk_vs_full_wall"] = round(
            out["bulk_delete"]["wall_sec"]
            / max(out["full_rewrite"]["wall_sec"], 1e-9),
            2,
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_tbl}")

    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
