"""Parquet codec study for the ENGINE-WRITTEN at-rest stores (guide §6;
VERDICT r14 next-round #3): zstd vs snappy bytes-at-rest and walls for
the three store families the takedown/ingest protocols maintain —

- C9: the id-bucketed rerank full-vector corpus (write_bucketed),
- C2: the NearDupIndex banded-signature tables (bands + hashes,
  written through NearDupIndex.append — the real operator path),
- C11: the digest epoch-directory store (epoch_<id>/ parquet dirs).

Bytes are the 100 TB currency for cold stores (one-time write, many
reads, storage rent); walls are recorded but on this box only the
bytes are noise-free. Input data is synthesized DETERMINISTICALLY
(xxhash64/md5 of row ids — no rand(), so both codec legs compress the
exact same bytes).

Usage: python -m tools.zstd_stores_study [--rows-c9 N] [--docs-c2 N]
       [--epochs N] [--rows-per-epoch N] [--out out.json]
Writes ZSTD_STORES_r15.json at the repo root by default.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

from smallquery_spark.fsio import fs_for, table_location
from smallquery_spark.session import get_session

CODECS = ("snappy", "zstd")


def _dir_bytes(path: str) -> int:
    total = 0
    for dirpath, _d, files in os.walk(path):
        for f in files:
            if f.startswith((".", "_")):
                continue
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def _table_bytes(spark, tname: str) -> int:
    loc = table_location(spark, tname)
    fs = fs_for(spark, loc)
    return sum(
        sz
        for p, sz in fs.list_files_recursive(loc)
        if not p.rsplit("/", 1)[1].startswith((".", "_"))
    )


def _read_wall(df) -> float:
    walls = []
    for _ in range(2):
        t0 = time.time()
        df.selectExpr("count(*)", "sum(hash(*))").collect()
        walls.append(time.time() - t0)
    return round(min(walls), 3)


def main() -> None:
    args = sys.argv[1:]

    def _opt(name: str, default: int) -> int:
        if name in args:
            return int(args[args.index(name) + 1])
        return default

    rows_c9 = _opt("--rows-c9", 500_000)
    docs_c2 = _opt("--docs-c2", 400_000)
    n_epochs = _opt("--epochs", 16)
    rows_epoch = _opt("--rows-per-epoch", 250_000)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = (
        args[args.index("--out") + 1]
        if "--out" in args
        else os.path.join(here, "ZSTD_STORES_r15.json")
    )

    spark = get_session("zstd-stores-study")
    import tempfile

    from smallquery_spark.operators.bucketing import write_bucketed
    from smallquery_spark.operators.neardup_index import NearDupIndex
    from smallquery_spark.queries.tmpdirs import register_cleanup

    scratch = register_cleanup(tempfile.mkdtemp(prefix="zstd_study_"))

    # ---- deterministic synthetic inputs (identical for both legs) ----
    # C9 rerank corpus: (c_id, 64-dim double vector)
    c9_df = spark.range(rows_c9).select(
        F.col("id").alias("c_id"),
        F.expr(
            "transform(sequence(1, 64),"
            " j -> pmod(xxhash64(id, j), 1000000) / 1000000.0)"
        ).alias("vec"),
    )
    # C2 signature rows in the _banded_sig_df shape NearDupIndex.append
    # takes: (doc_id, __keys 8x 32-hex band keys, __hashes 64 longs, __sz)
    c2_df = spark.range(docs_c2).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "transform(sequence(1, 8),"
            " b -> md5(concat(cast(id as string), '_', cast(b as string))))"
        ).alias("__keys"),
        F.expr(
            "transform(sequence(1, 64), j -> xxhash64(id, j))"
        ).alias("__hashes"),
        (F.pmod(F.xxhash64("id"), F.lit(900)) + 100).alias("__sz"),
    )

    results: dict[str, dict] = {c: {} for c in CODECS}
    for codec in CODECS:
        spark.conf.set("spark.sql.parquet.compression.codec", codec)
        leg: dict[str, object] = {}

        # C9 — bucketed rerank corpus via the real writer
        t9 = f"zstd_study_c9_{codec}_{os.getpid()}"
        t0 = time.time()
        write_bucketed(c9_df, t9, "c_id", 64)
        leg["c9_write_sec"] = round(time.time() - t0, 2)
        leg["c9_bytes"] = _table_bytes(spark, t9)
        leg["c9_read_sec"] = _read_wall(spark.table(t9))

        # C2 — NearDupIndex bands + hashes via the real append path
        ndx = NearDupIndex(spark, f"zstd_{codec}_{os.getpid()}", n_buckets=16)
        t0 = time.time()
        ndx.append(c2_df, guard_existing=False)
        leg["c2_write_sec"] = round(time.time() - t0, 2)
        leg["c2_bytes"] = _table_bytes(spark, ndx.bands_table) + _table_bytes(
            spark, ndx.hashes_table
        )
        leg["c2_read_sec"] = _read_wall(
            spark.table(ndx.bands_table)
        ) + _read_wall(spark.table(ndx.hashes_table))

        # C11 — digest epoch store (doc_id + md5 fingerprint per epoch)
        store = os.path.join(scratch, f"c11_{codec}")
        t0 = time.time()
        for e in range(n_epochs):
            (
                spark.range(e * rows_epoch, (e + 1) * rows_epoch)
                .select(
                    F.col("id").alias("doc_id"),
                    F.md5(F.col("id").cast("string")).alias("__h"),
                )
                .write.mode("overwrite")
                .parquet(os.path.join(store, f"epoch_{e:010d}"))
            )
        leg["c11_write_sec"] = round(time.time() - t0, 2)
        leg["c11_bytes"] = _dir_bytes(store)
        leg["c11_read_sec"] = _read_wall(
            spark.read.parquet(*[
                os.path.join(store, f"epoch_{e:010d}")
                for e in range(n_epochs)
            ])
        )

        results[codec] = leg
        spark.sql(f"DROP TABLE IF EXISTS {t9}")
        ndx.drop()

    ratios = {
        f"{fam}_bytes_ratio_zstd_vs_snappy": round(
            results["zstd"][f"{fam}_bytes"]
            / max(results["snappy"][f"{fam}_bytes"], 1),
            4,
        )
        for fam in ("c9", "c2", "c11")
    }
    record = {
        "rows_c9": rows_c9,
        "docs_c2": docs_c2,
        "epochs": n_epochs,
        "rows_per_epoch": rows_epoch,
        "per_codec": results,
        "ratios": ratios,
        "note": "bytes are deterministic (seeded synthetic rows, same"
        " bytes both legs); walls on this box carry co-load noise —"
        " bytes are the decision metric (guide §6)",
    }
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    print(json.dumps(ratios))
    print(f"-> {out_path}")


if __name__ == "__main__":
    main()
