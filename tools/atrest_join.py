"""At-rest bucketing study: what killing the fact-table shuffle buys.

The scaling curve (SCALING.md) shows the residual gen-sf10 cost of
q5/q18/q21 is the single orders⋈lineitem shuffle becoming data-sized —
by design, that cost spreads across executors on a cluster. Bucketing
is the layout answer at 100 TB: pay the shuffle ONCE at write time
(`write_bucketed`, operators/bucketing.py), and every subsequent join
or aggregation on the bucket key is Exchange-free.

This tool measures that trade on a generated fixture: the q18-shaped
workload (orders⋈lineitem on orderkey → per-order quantity rollup →
HAVING filter) over plain parquet vs same-bucketed tables, plus the
one-time bucketed-write cost, and counts Exchange operators in both
final plans. The break-even query count (write cost / per-query
saving) is the number a warehouse owner actually decides with.

Usage:
    python -m tools.atrest_join [sf_dir] [--buckets N] [--out out.json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

from pyspark.sql import functions as F

from smallquery_spark.operators.bucketing import write_bucketed
from smallquery_spark.queries.registry import ensure_driver_confs, t
from smallquery_spark.queries.tmpdirs import register_cleanup
from smallquery_spark.session import get_session


def _workload(orders, lineitem):
    """q18's join+rollup core: per-order quantity over the full fact."""
    j = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
    return (
        j.groupBy("o_orderkey", "o_custkey")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.count("*").alias("n_items"),
        )
        .filter(F.col("sum_qty") > 300)
    )


def _time2(df) -> float:
    runs = []
    for _ in range(2):
        t0 = time.time()
        df.count()
        runs.append(time.time() - t0)
    return round(min(runs), 3)


def _exchanges(df) -> int:
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    return plan.count("Exchange")


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = None
    n_buckets = 32
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv):
            raise SystemExit(__doc__.splitlines()[-2].strip())
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    if "--buckets" in argv:
        i = argv.index("--buckets")
        if i + 1 >= len(argv):
            raise SystemExit(__doc__.splitlines()[-2].strip())
        n_buckets = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    if argv:
        sf_dir = argv[0]
    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    warehouse = register_cleanup(
        tempfile.mkdtemp(prefix=f"smallquery_atrest_{os.getpid()}_")
    )
    spark = get_session(
        "smallquery-atrest-join",
        extra_conf={"spark.sql.warehouse.dir": warehouse},
    )
    ensure_driver_confs(spark)

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    lineitem = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    n_orders = orders.count()
    n_lineitem = lineitem.count()

    plain = _workload(orders, lineitem)
    plain_sec = _time2(plain)
    plain_exchanges = _exchanges(plain)

    t0 = time.time()
    write_bucketed(orders, "atrest_orders", "o_orderkey", n_buckets)
    write_orders_sec = round(time.time() - t0, 3)
    t0 = time.time()
    write_bucketed(lineitem, "atrest_lineitem", "l_orderkey", n_buckets)
    write_lineitem_sec = round(time.time() - t0, 3)

    bo = spark.table("atrest_orders")
    bl = spark.table("atrest_lineitem")
    bucketed = _workload(bo, bl)
    bucketed_sec = _time2(bucketed)
    bucketed_exchanges = _exchanges(bucketed)

    # Sanity: identical results through both layouts, and the bare
    # bucketed join (before the rollup) is itself Exchange-free.
    plain_rows = plain.count()
    bucketed_rows = bucketed.count()
    helper_exchanges = _exchanges(
        bo.join(bl, bo.o_orderkey == bl.l_orderkey)
    )

    write_sec = round(write_orders_sec + write_lineitem_sec, 3)
    saving = round(plain_sec - bucketed_sec, 3)
    out = {
        "sf_dir": sf_dir,
        "n_orders": n_orders,
        "n_lineitem": n_lineitem,
        "n_buckets": n_buckets,
        "plain_sec": plain_sec,
        "plain_exchanges": plain_exchanges,
        "bucketed_sec": bucketed_sec,
        "bucketed_exchanges": bucketed_exchanges,
        "join_only_exchanges": helper_exchanges,
        "write_bucketed_sec": write_sec,
        "rows_match": plain_rows == bucketed_rows,
        "result_rows": plain_rows,
        "breakeven_queries": (
            round(write_sec / saving, 1) if saving > 0 else None
        ),
    }
    line = json.dumps(out)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
