"""TPC-H-shaped end-to-end queries (SURVEY.md §5.2 item 4).

Multi-operator integration goldens over the fixture star schema: each
composes scan → filter → join(s) → agg → sort the way real reporting
queries do. Join strategy notes are inline; plans are asserted in
tests/test_plans.py.

Money sums go through DECIMAL casts (exact, order-independent) per the
cross-engine float discipline (relational.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from smallquery_spark.queries.registry import query, t

_DEC = "decimal(18,2)"


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1996-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 20
    """,
    tags=("tpch", "B14", "B22", "B36"),
)
def q3_shipping_priority(spark, sf_dir):
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    # customer is the small side after the segment filter → broadcast it
    # into orders; lineitem (the fact) joins the result. AQE confirms /
    # re-picks at runtime from actual sizes.
    # An agg-BEFORE-join variant (group lineitem by l_orderkey, attach
    # o_orderdate/o_orderpriority after) was tried and REVERTED in r14:
    # value-identical, but the BUILDING segment filter is ~5x selective
    # and only reaches lineitem THROUGH this join, so aggregating first
    # processed 5x the rows — measured 1.78 s -> 3.53 s (interleaved
    # A/B medians, OPTIMIZATION_r14.md). Pre-filtering the fact through
    # the selective dim join before aggregating is the §3.2 call.
    return (
        li.join(
            o.join(F.broadcast(c), o.o_custkey == c.c_custkey),
            li.l_orderkey == o.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(_DEC)
                * (1 - F.col("l_discount")).cast(_DEC)
            ).cast("double").alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(20)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC
    """,
    tags=("tpch", "B14", "B17", "B22"),
)
def q5_local_supplier_volume(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # dims (supplier/nation/region, and customer at fixture scale) are
    # broadcast; the single shuffle is lineitem⋈orders on orderkey.
    dim = F.broadcast(
        s.join(n, s.s_nationkey == n.n_nationkey).join(
            r, n.n_regionkey == r.r_regionkey
        )
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            dim,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(_DEC)
                * (1 - F.col("l_discount")).cast(_DEC)
            ).cast("double").alias("revenue")
        )
        .orderBy(F.col("revenue").desc())
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.05
      AND l_quantity < 24
    """,
    tags=("tpch", "B10", "B22"),
)
def q6_forecast_revenue(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    # pure scan+filter+agg: every predicate pushes into the parquet scan
    # (asserted in test_plans), partial agg leaves one row per partition.
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.05)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(
            F.col("l_extendedprice").cast(_DEC) * F.col("l_discount").cast(_DEC)
        ).cast("double").alias("revenue")
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("tpch", "B14", "B22", "B36"),
)
def q10_returned_items(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    # Aggregate BEFORE the dim joins (guide §2.3, r14): c_custkey is
    # customer's key, so grouping the fact by o_custkey alone and
    # attaching c_name/n_name afterwards is value-identical to grouping
    # by (c_custkey, c_name, n_name) — but the agg exchange now carries
    # (custkey, decimal partial) instead of rows widened by two joined
    # strings, and the customer/nation joins probe ONE row per customer
    # instead of every returned lineitem. At 100 TB, where customer no
    # longer broadcasts, that join's shuffle moves the aggregated rows,
    # not the fact.
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(_DEC)
                * (1 - F.col("l_discount")).cast(_DEC)
            ).cast("double").alias("revenue")
        )
    )
    return (
        rev.join(F.broadcast(c), rev.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )
