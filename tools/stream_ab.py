"""Streaming bench-query A/B runner (r15): times the five stateful
bench queries (plus c38) at a given SF — run once per tree
(PYTHONPATH picks the smallquery_spark under test), alternating legs,
compare per-query MIN across legs.

Usage: PYTHONPATH=<tree> python tools/stream_ab.py [--sf DIR] [--tag T]
Prints one JSON line {"tag", "queries": {name: min_of_2_sec}}.
"""

from __future__ import annotations

import json
import sys
import time

QUERIES = [
    "b51_stream_tumbling",
    "b53_stream_session",
    "b57_stream_stream_join",
    "b58_stream_stateful",
    "b68_state_store_reader",
    "c38_incremental_sessionize",
]


def main() -> None:
    args = sys.argv[1:]

    def _opt(name, default):
        return args[args.index(name) + 1] if name in args else default

    sf_dir = _opt("--sf", "/root/testdata/sf0.1")
    tag = _opt("--tag", "untagged")

    from smallquery_spark.queries import REGISTRY, load_all
    from smallquery_spark.session import get_session

    load_all()
    spark = get_session("stream-ab")
    spark.range(1).count()
    out = {}
    for name in QUERIES:
        walls = []
        for _ in range(2):
            t0 = time.time()
            REGISTRY[name].fn(spark, sf_dir).count()
            walls.append(round(time.time() - t0, 3))
        out[name] = min(walls)
    print(json.dumps({"tag": tag, "queries": out, "total": round(sum(out.values()), 3)}))


if __name__ == "__main__":
    main()
