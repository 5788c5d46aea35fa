"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The metric is total wall time of the headline query set (lower is
better). Each query is executed to completion via a count/collect of the
final DataFrame — the same work a user's action would trigger.
"""

from __future__ import annotations

import json
import os
import time

from smallquery_spark.queries import REGISTRY, load_all
from smallquery_spark.session import get_session

# Headline set: one representative per operator family, weighted toward
# the scale-sensitive ones (agg, join, window, dedup, similarity).
HEADLINE = [
    "q1_pricing_summary",
    "b10_filter_compound",
    "b12_distinct",
    "b35_sort_multikey",
    "b36_top10_orders",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_all()
    names = [n for n in HEADLINE if n in REGISTRY]
    # Include any registered query tagged as a benchmark headline later.
    spark = get_session("smallquery-bench")

    # Warm the JVM + parquet footers once (not timed): a trivial action.
    spark.range(1).count()

    timings: dict[str, float] = {}
    for name in names:
        qd = REGISTRY[name]
        t0 = time.time()
        df = qd.fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        _ = n
    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
            }
        )
    )


if __name__ == "__main__":
    main()
