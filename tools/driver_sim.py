"""Driver-session simulation: run the canonical window the way the
GRADING driver would, not the way this repo's own session would.

Round 2's red wall came from the gap between the two: this repo's
session sets ansi=false/UTC/Arrow (session.py), but the driver builds
its OWN SparkSession with Spark 4 defaults — ANSI ON, 200 shuffle
partitions, no repo confs. Every defensive conf in
``registry.ensure_driver_confs`` exists to close that gap at query
time; this harness proves the closure by executing all 50 window
queries on a deliberately driver-like session.

This only checks EXECUTION under the foreign session (no oracle
compare — tools/check.py does that); a query that silently produced
different values under ANSI would still be caught by check.py, because
ensure_driver_confs forces the same confs there too.

Usage: python -m tools.driver_sim [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def build_driver_session() -> SparkSession:
    """A deliberately driver-like session: Spark 4 defaults (ANSI ON),
    none of this repo's session.py confs."""
    spark = (
        SparkSession.builder.appName("driver-sim")
        .master("local[8]")
        # Spark 4 default the repo's own session overrides — the exact
        # divergence that broke round 2's a_b44_b45 cast row.
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def run_window(spark: SparkSession, sf_dir: str) -> list[tuple[str, str]]:
    """Execute the driver's ~50-query canonical window on ``spark``;
    return (name, error) for every red query (empty = all green)."""
    from smallquery_spark.queries import REGISTRY, load_all

    load_all()
    names = sorted(REGISTRY)[:50]
    fails: list[tuple[str, str]] = []
    for n in names:
        try:
            REGISTRY[n].fn(spark, sf_dir).count()
        except Exception as exc:  # noqa: BLE001 — report every red
            fails.append((n, str(exc).splitlines()[0][:150]))
            print("FAIL", n, fails[-1][1], flush=True)
    print(f"{len(names) - len(fails)}/{len(names)} ok under ANSI driver-like session")
    return fails


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    fails = run_window(build_driver_session(), sf_dir)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
