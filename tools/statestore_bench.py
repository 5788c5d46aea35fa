"""State-store provider cost at scale: default in-memory vs RocksDB.

The default HDFS-backed state store keeps every key's state on the
executor heap — at 100 TB of keyed state that is an OOM, not a config
choice. RocksDB (`b58_rocksdb_state` pins result-equality via its
oracle) bounds memory by spilling to local disk, at some per-batch
overhead. This tool measures that overhead on the three largest
stateful shapes at a given fixture scale, same min-of-2 protocol as
bench.py, so the "use RocksDB in production" advice ships with its
measured local price.

Usage:
    python -m tools.statestore_bench [sf_dir] [--out out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

from smallquery_spark.queries import REGISTRY, load_all
from smallquery_spark.queries.registry import ensure_driver_confs
from smallquery_spark.session import get_session

QUERIES = [
    "b58_stream_stateful",
    "b53_stream_session",
    "b57_stream_stream_join",
]

_ROCKS = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


def _time2(spark, name: str, sf_dir: str) -> float:
    runs = []
    for _ in range(2):
        t0 = time.time()
        REGISTRY[name].fn(spark, sf_dir).count()
        runs.append(time.time() - t0)
    return round(min(runs), 3)


def main() -> None:
    argv = sys.argv[1:]
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv):
            raise SystemExit(__doc__.strip().splitlines()[-1])
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    load_all()
    spark = get_session("smallquery-statestore-bench")
    ensure_driver_confs(spark)

    # rocksdb_changelog = RocksDB + changelog checkpointing (upload the
    # per-batch change log instead of full .snapshot files — the conf
    # Spark recommends for high-churn state in production).
    changelog_key = (
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    )
    out: dict = {"sf_dir": sf_dir, "providers": {}}
    configs = (
        ("default_hdfs", None, None),
        ("rocksdb", _ROCKS, "false"),
        ("rocksdb_changelog", _ROCKS, "true"),
    )
    for label, provider, changelog in configs:
        old = spark.conf.get(_PROVIDER_KEY, None)
        if provider:
            spark.conf.set(_PROVIDER_KEY, provider)
            spark.conf.set(changelog_key, changelog)
        try:
            secs = {}
            for name in QUERIES:
                secs[name] = _time2(spark, name, sf_dir)
                print(f"  {label} {name}: {secs[name]}s", file=sys.stderr)
            out["providers"][label] = secs
        finally:
            if provider:
                spark.conf.unset(changelog_key)
                if old:
                    spark.conf.set(_PROVIDER_KEY, old)
                else:
                    spark.conf.unset(_PROVIDER_KEY)
    d = out["providers"]["default_hdfs"]
    out["overhead_ratio"] = {
        label: {
            q: round(out["providers"][label][q] / d[q], 2) if d[q] else None
            for q in QUERIES
        }
        for label, _, _ in configs[1:]
    }
    line = json.dumps(out)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
