"""delete_epoch_store victim-discovery pruning A/B (r15, VERDICT r14
#9): gen-scale wall + epochs-opened for a point takedown against an
epoch store, comparing the r14 discovery (reads every committed epoch
every takedown) with the r15 sidecar-pruned discovery.

Run once per tree (PYTHONPATH decides which smallquery_spark is
imported), alternating legs; each invocation builds a fresh store,
runs takedown #1 (pays the one-time stats pass on the r15 tree) and
takedown #2 (steady state), and prints one JSON line with walls and
the count of epoch dirs opened by spark.read.parquet during each.

Usage:
  PYTHONPATH=/root/repo python tools/takedown_prune_study.py \
      --epochs 48 --rows 200000 --tag after
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    args = sys.argv[1:]

    def _opt(name, default, cast=int):
        return cast(args[args.index(name) + 1]) if name in args else default

    n_epochs = _opt("--epochs", 48)
    rows = _opt("--rows", 200_000)
    tag = _opt("--tag", "untagged", str)

    from pyspark.sql import functions as F
    from pyspark.sql.readwriter import DataFrameReader

    from smallquery_spark.fsio import fs_for, join_uri
    from smallquery_spark.operators.takedown import delete_epoch_store
    from smallquery_spark.queries.tmpdirs import register_cleanup
    from smallquery_spark.session import get_session

    spark = get_session("takedown-prune-study")
    import tempfile

    scratch = register_cleanup(tempfile.mkdtemp(prefix="tkdprune_"))
    store = os.path.join(scratch, "store")
    fs = fs_for(spark, store)
    for e in range(n_epochs):
        (
            spark.range(e * rows, (e + 1) * rows)
            .select(
                F.col("id").alias("doc_id"),
                F.md5(F.col("id").cast("string")).alias("__h"),
            )
            .write.mode("overwrite")
            .parquet(join_uri(store, f"epoch_{e:010d}"))
        )

    opened: list[str] = []
    orig = DataFrameReader.parquet

    def recording(self, *paths, **kw):
        opened.extend(paths)
        return orig(self, *paths, **kw)

    DataFrameReader.parquet = recording

    def epochs_opened() -> int:
        import re

        return len(
            {m.group(1) for p in opened for m in [re.search(r"(epoch_\d+)", p)] if m}
        )

    # takedown 1: two victims in two mid-store epochs
    v1 = [5 * rows + 17, 9 * rows + 3]
    opened.clear()
    t0 = time.time()
    n1 = delete_epoch_store(spark, store, v1, "doc_id")
    t1 = round(time.time() - t0, 3)
    e1 = epochs_opened()

    # takedown 2: steady state, two different epochs
    v2 = [20 * rows + 1, 33 * rows + 8]
    opened.clear()
    t0 = time.time()
    n2 = delete_epoch_store(spark, store, v2, "doc_id")
    t2 = round(time.time() - t0, 3)
    e2 = epochs_opened()

    DataFrameReader.parquet = orig
    assert n1 == 2 and n2 == 2, (n1, n2)
    print(
        json.dumps(
            {
                "tag": tag,
                "epochs": n_epochs,
                "rows_per_epoch": rows,
                "takedown1_sec": t1,
                "takedown1_epochs_opened": e1,
                "takedown2_sec": t2,
                "takedown2_epochs_opened": e2,
            }
        )
    )


if __name__ == "__main__":
    main()
