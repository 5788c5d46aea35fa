"""Projection / filter / distinct / conditional / sort / limit queries.

SURVEY.md §2: B9-B13 (projection & predicates), B35-B38 (sort/limit/
offset/sample), plus the flagship TPC-H Q1-shaped aggregation (§7 step 1).

Cross-engine float discipline: double summation order differs between
Spark partial aggregation and DuckDB, so money aggregates are computed
over ``DECIMAL`` casts — decimal addition is exact and associative,
giving bit-identical results on both engines; averages are then derived
as exact-sum / exact-count in double (IEEE division is deterministic).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from smallquery_spark.queries.registry import query, t

# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1 shape over lineitem (scan→filter→agg→sort).
# ---------------------------------------------------------------------------

_DEC = "decimal(18,2)"


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("B22", "flagship"),
)
def q1_pricing_summary(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast(_DEC)  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # sums aggregate in exact decimal but are EMITTED as double:
            # decimal result columns are a driver-canonicalization trap
            # (integral values render "153457.00" vs "153457.0" — see
            # tools/check.py docstring).
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (1 - F.col("l_discount")).cast(_DEC))
            .cast("double")
            .alias("sum_disc_price"),
            (F.sum(dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / F.count("*")).alias(
                "avg_price"
            ),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# B9 — project / rename / computed columns
# ---------------------------------------------------------------------------


@query(
    "b09_project_compute",
    oracle="""
    SELECT c_custkey,
           c_name AS customer_name,
           c_acctbal * 2.0 AS double_bal,
           c_acctbal - 100.0 AS adj_bal
    FROM customer
    """,
    tags=("B9",),
)
def b09_project_compute(spark, sf_dir):
    return t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_name").alias("customer_name"),
        (F.col("c_acctbal") * 2.0).alias("double_bal"),
        (F.col("c_acctbal") - 100.0).alias("adj_bal"),
    )


# ---------------------------------------------------------------------------
# B10 — filters: comparison, boolean logic, IN, BETWEEN, LIKE, null-safe
# ---------------------------------------------------------------------------


@query(
    "b10_filter_compound",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_discount > 0.02
      AND l_returnflag IN ('A', 'R')
      AND NOT (l_linestatus = 'O')
    """,
    tags=("B10",),
)
def b10_filter_compound(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & (F.col("l_discount") > 0.02)
        & F.col("l_returnflag").isin("A", "R")
        & ~(F.col("l_linestatus") == "O")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


@query(
    "b10_filter_like",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_type LIKE '%ECO%' OR p_name LIKE 'red%'
    """,
    tags=("B10",),
)
def b10_filter_like(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("%ECO%") | F.col("p_name").like("red%")
    ).select("p_partkey", "p_name", "p_type")


# ---------------------------------------------------------------------------
# B11 — NULL handling
# ---------------------------------------------------------------------------


@query(
    "b11_null_handling",
    oracle="""
    WITH o AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_totalprice END AS maybe_price
      FROM orders
    )
    SELECT o_orderkey,
           maybe_price IS NULL AS is_missing,
           COALESCE(maybe_price, -1.0) AS price_or_default
    FROM o
    """,
    tags=("B11",),
)
def b11_null_handling(spark, sf_dir):
    o = t(spark, sf_dir, "orders").withColumn(
        "maybe_price",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(
            F.col("o_totalprice")
        ),
    )
    return o.select(
        "o_orderkey",
        F.col("maybe_price").isNull().alias("is_missing"),
        F.coalesce("maybe_price", F.lit(-1.0)).alias("price_or_default"),
    )


@query(
    "b11_null_safe_eq",
    oracle="""
    WITH a AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderstatus END AS s1,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderstatus END AS s2
      FROM orders
    )
    SELECT o_orderkey, (s1 IS NOT DISTINCT FROM s2) AS same
    FROM a
    """,
    tags=("B11",),
)
def b11_null_safe_eq(spark, sf_dir):
    o = (
        t(spark, sf_dir, "orders")
        .withColumn(
            "s1",
            F.when(F.col("o_orderkey") % 5 == 0, F.lit(None)).otherwise(
                F.col("o_orderstatus")
            ),
        )
        .withColumn(
            "s2",
            F.when(F.col("o_orderkey") % 3 == 0, F.lit(None)).otherwise(
                F.col("o_orderstatus")
            ),
        )
    )
    return o.select(
        "o_orderkey", F.col("s1").eqNullSafe(F.col("s2")).alias("same")
    )


# ---------------------------------------------------------------------------
# B12 — distinct / dropDuplicates
# ---------------------------------------------------------------------------


@query(
    "b12_distinct",
    oracle="SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders",
    tags=("B12",),
)
def b12_distinct(spark, sf_dir):
    return t(spark, sf_dir, "orders").select("o_orderpriority", "o_orderstatus").distinct()


# ---------------------------------------------------------------------------
# B13 — conditional expressions
# ---------------------------------------------------------------------------


@query(
    "b13_case_when",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity < 10 THEN 'small'
                WHEN l_quantity < 30 THEN 'medium'
                ELSE 'large' END AS qty_bucket
    FROM lineitem
    """,
    tags=("B13",),
)
def b13_case_when(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") < 10, "small")
        .when(F.col("l_quantity") < 30, "medium")
        .otherwise("large")
        .alias("qty_bucket"),
    )


# ---------------------------------------------------------------------------
# B35-B37 — sort / limit / offset
# ---------------------------------------------------------------------------


@query(
    "b35_sort_multikey",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC
    """,
    tags=("B35",),
)
def b35_sort_multikey(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy(
            F.col("o_orderpriority").asc(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey").asc(),
        )
    )


@query(
    "b35_sort_nulls_last",
    oracle="""
    WITH o AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_totalprice END AS p
      FROM orders
    )
    SELECT o_orderkey, p FROM o
    ORDER BY p DESC NULLS LAST, o_orderkey
    """,
    tags=("B35",),
)
def b35_sort_nulls_last(spark, sf_dir):
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 11 == 0, F.lit(None))
        .otherwise(F.col("o_totalprice"))
        .alias("p"),
    )
    return o.orderBy(F.col("p").desc_nulls_last(), F.col("o_orderkey"))


@query(
    "b36_top10_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("B36",),
)
def b36_top10_orders(spark, sf_dir):
    # Planner turns orderBy+limit into TakeOrderedAndProject — a per-
    # partition top-k then a k-merge on the driver: no global sort/shuffle,
    # exactly what you want at 100 TB.
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "b37_offset_page",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10 OFFSET 10
    """,
    tags=("B37",),
)
def b37_offset_page(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(10)
        .limit(10)
    )


@query(
    "b38_sample",
    # Bernoulli sampling is engine-specific even with a seed — the
    # contract is statistical: sampled fraction inside loose bounds and
    # every sampled row really comes from the source (semi-join check).
    oracle="SELECT TRUE AS fraction_ok, TRUE AS subset_ok",
    tags=("B38",),
)
def b38_sample(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    s = orders.sample(fraction=0.1, seed=42)
    n, total = s.count(), orders.count()
    fraction_ok = 0.05 * total <= n <= 0.2 * total
    subset_ok = s.join(orders, "o_orderkey", "left_semi").count() == n
    return spark.createDataFrame(
        [(fraction_ok, subset_ok)], "fraction_ok boolean, subset_ok boolean"
    )


@query(
    "b38_stratified_sample",
    oracle="SELECT TRUE AS fractions_ok, TRUE AS subset_ok",
    tags=("B38",),
)
def b38_stratified_sample(spark, sf_dir):
    """sampleBy: per-stratum Bernoulli fractions (oversample URGENT).
    Contract: each stratum's realized fraction within loose bounds of
    its target, and the sample is a true subset."""
    orders = t(spark, sf_dir, "orders")
    fracs = {"1-URGENT": 0.3, "5-LOW": 0.05}
    s = orders.sampleBy("o_orderpriority", fractions=fracs, seed=42)
    totals = {
        r["o_orderpriority"]: r["n"]
        for r in orders.groupBy("o_orderpriority").agg(F.count("*").alias("n")).collect()
    }
    got = {
        r["o_orderpriority"]: r["n"]
        for r in s.groupBy("o_orderpriority").agg(F.count("*").alias("n")).collect()
    }
    fractions_ok = all(
        0.3 * f * totals[k] <= got.get(k, 0) <= 2.5 * f * totals[k]
        for k, f in fracs.items()
    ) and all(k in fracs for k in got)
    subset_ok = s.join(orders, "o_orderkey", "left_semi").count() == s.count()
    return spark.createDataFrame(
        [(fractions_ok, subset_ok)], "fractions_ok boolean, subset_ok boolean"
    )


@query(
    "b22_histogram",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM orders
    GROUP BY 1
    """,
    tags=("B22", "B44"),
)
def b22_histogram(spark, sf_dir):
    """Fixed-width histogram as a plain hash aggregation — the
    distributed building block for percentile sketches and dashboards."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 50000).cast("bigint").alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )
