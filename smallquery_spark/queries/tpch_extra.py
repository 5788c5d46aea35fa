"""Extended TPC-H-shaped e2e suite (SURVEY.md §5.2 item 4, continued).

Adaptations of the remaining TPC-H query shapes to the fixture star
schema (FIXTURES.md). The fixtures have no partsupp table and no
comment/shipmode/phone columns, so each query keeps the SHAPE —
join topology, agg structure, predicate style — with these substitutions:

- supply cost → p_retailprice via the lineitem part link (q9, q11)
- l_shipmode → l_linestatus as the low-cardinality line dim (q12)
- phone country code → c_nationkey % 5 (q22)
- commit/receipt lateness → l_shipdate > o_orderdate (q4)

Join strategy notes inline; money aggregates go through DECIMAL casts
(exact, order-independent) and ratios divide AS DOUBLE only at the end,
per the cross-engine float discipline (relational.py docstring).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from smallquery_spark.queries.registry import query, t

_DEC = "decimal(18,2)"


def _rev(price="l_extendedprice", disc="l_discount"):
    """TPC-H revenue term: exact decimal product, safe to SUM."""
    return F.col(price).cast(_DEC) * (1 - F.col(disc)).cast(_DEC)


_REV_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))"


# ---------------------------------------------------------------------------
# Q4 — order priority checking (EXISTS → left-semi join)
# ---------------------------------------------------------------------------


@query(
    "q4_order_priority",
    oracle=f"""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    tags=("tpch", "B16", "B22"),
)
def q4_order_priority(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    # EXISTS compiles to a left-semi join: no row multiplication, the
    # lineitem side is reduced during the shuffle — scale-safe.
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# ---------------------------------------------------------------------------


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           YEAR(l.l_shipdate) AS l_year,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    WHERE l.l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
      AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
    GROUP BY 1, 2, 3
    """,
    tags=("tpch", "B14", "B17", "B22"),
)
def q7_volume_shipping(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    )
    o = t(spark, sf_dir, "orders")
    # nation-tagged dimension sides are tiny → broadcast both, so the
    # only shuffles are the two fact-side equi-joins.
    sn = t(spark, sf_dir, "supplier").join(
        F.broadcast(t(spark, sf_dir, "nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cn = t(spark, sf_dir, "customer").join(
        F.broadcast(t(spark, sf_dir, "nation")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cn), F.col("c_custkey") == F.col("o_custkey"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 — market share of one nation's suppliers in one region
# ---------------------------------------------------------------------------


@query(
    "q8_market_share",
    oracle=f"""
    WITH vol AS (
      SELECT YEAR(o.o_orderdate) AS o_year,
             {_REV_SQL} AS volume,
             sn.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = cn.n_regionkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM vol GROUP BY o_year
    """,
    tags=("tpch", "B14", "B17", "B22"),
)
def q8_market_share(spark, sf_dir):
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    cust_in_region = (
        t(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp_nation = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    )
    li = t(spark, sf_dir, "lineitem")
    vol = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust_in_region), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _rev().alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast(_DEC)
    return vol.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(zero)
            ).cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit (supply cost → retail price)
# ---------------------------------------------------------------------------


@query(
    "q9_product_profit",
    oracle="""
    SELECT sn.n_name AS nation, YEAR(o.o_orderdate) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))
               - CAST(p.p_retailprice AS DECIMAL(18,2)) * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
    tags=("tpch", "B14", "B17", "B22"),
)
def q9_product_profit(spark, sf_dir):
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    sn = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    profit = _rev() - F.col("p_retailprice").cast(_DEC) * F.col("l_quantity").cast(_DEC)
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


# ---------------------------------------------------------------------------
# Q11 — important parts by lineitem value (scalar-subquery threshold)
# ---------------------------------------------------------------------------


@query(
    "q11_important_parts",
    oracle=f"""
    WITH pv AS (
      SELECT l_partkey, SUM({_REV_SQL}) AS value
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(value AS DOUBLE) AS value FROM pv
    WHERE CAST(value AS DOUBLE)
          > CAST((SELECT SUM({_REV_SQL}) FROM lineitem) AS DOUBLE) * 0.0005
    """,
    tags=("tpch", "B22", "sql"),
)
def q11_important_parts(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(F.sum(_rev()).alias("value"))
    total = li.agg(F.sum(_rev()).alias("__total"))
    # scalar threshold: 1-row broadcast cross join — no shuffle added.
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("value").cast("double") > F.col("__total").cast("double") * 0.0005)
        .select("l_partkey", F.col("value").cast("double").alias("value"))
    )


# ---------------------------------------------------------------------------
# Q12 — line status vs order priority (shipmode stand-in)
# ---------------------------------------------------------------------------


@query(
    "q12_priority_lines",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    """,
    tags=("tpch", "B13", "B22"),
)
def q12_priority_lines(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = t(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (outer join + double agg)
# ---------------------------------------------------------------------------


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    tags=("tpch", "B15", "B22"),
)
def q13_customer_distribution(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    # the priority filter lives on the join's inner side (not a post-join
    # WHERE) so customers with only urgent orders still count as 0.
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


# ---------------------------------------------------------------------------
# Q14 — promo revenue percentage
# ---------------------------------------------------------------------------


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT (CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                          ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
            / CAST(SUM({_REV_SQL}) AS DOUBLE)) * 100.0 AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
    tags=("tpch", "B13", "B17", "B22"),
)
def q14_promo_revenue(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part")
    zero = F.lit(0).cast(_DEC)
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                (
                    F.sum(
                        F.when(F.col("p_type") == "PROMO", _rev()).otherwise(zero)
                    ).cast("double")
                    / F.sum(_rev()).cast("double")
                )
                * 100.0
            ).alias("promo_pct")
        )
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier(s) by quarterly revenue (exact decimal argmax)
# ---------------------------------------------------------------------------


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH sr AS (
      SELECT l_suppkey, SUM({_REV_SQL}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN sr ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM sr)
    """,
    tags=("tpch", "B22", "B36"),
)
def q15_top_supplier(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    sr = li.groupBy("l_suppkey").agg(F.sum(_rev()).alias("total_revenue"))
    mx = sr.agg(F.max("total_revenue").alias("__mx"))
    # decimal revenue is exact → equality against the max is well-defined
    # (double sums would make this comparison engine-dependent).
    return (
        sr.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .join(
            F.broadcast(t(spark, sf_dir, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Q16 — supplier count by part attributes (distinct agg after join)
# ---------------------------------------------------------------------------


@query(
    "q16_parts_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    GROUP BY p_brand, p_type, p_size
    """,
    tags=("tpch", "B23"),
)
def q16_parts_supplier_counts(spark, sf_dir):
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (per-part avg threshold)
# ---------------------------------------------------------------------------


@query(
    "q17_small_quantity",
    oracle="""
    WITH pa AS (
      SELECT l_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) AS qty_thresh
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pa ON pa.l_partkey = part.p_partkey
    WHERE p_brand = 'Brand#12' AND l_quantity < qty_thresh
    """,
    tags=("tpch", "B22", "sql"),
)
def q17_small_quantity(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12")
    # per-part threshold is an aggregate of the FULL lineitem (not the
    # brand-filtered slice) — computed once, broadcast into the probe.
    pa = li.groupBy("l_partkey").agg(
        (
            0.2 * (F.sum(F.col("l_quantity").cast(_DEC)).cast("double") / F.count("*"))
        ).alias("qty_thresh")
    ).withColumnRenamed("l_partkey", "pa_partkey")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(pa), F.col("p_partkey") == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double") / 7.0).alias(
                "avg_yearly"
            )
        )
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume customers (HAVING over fact agg, join back to dims)
# ---------------------------------------------------------------------------


@query(
    "q18_large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 180
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(sum_qty AS DOUBLE) AS sum_qty
    FROM big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
    tags=("tpch", "B22", "B29"),
)
def q18_large_volume_customers(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("sum_qty"))
        .filter(F.col("sum_qty") > 180)
    )
    return (
        big.join(
            t(spark, sf_dir, "orders"), F.col("o_orderkey") == F.col("l_orderkey")
        )
        .join(
            t(spark, sf_dir, "customer"), F.col("c_custkey") == F.col("o_custkey")
        )
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue (disjunctive multi-attribute predicate)
# ---------------------------------------------------------------------------


@query(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("tpch", "B10", "B17"),
)
def q19_discounted_revenue(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#15")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity (anti join + scalar avg threshold)
# ---------------------------------------------------------------------------


@query(
    "q22_sales_opportunity",
    oracle="""
    WITH pos AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey % 5 AS cntrycode,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer, pos
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY 1
    """,
    tags=("tpch", "B16", "B22"),
)
def q22_sales_opportunity(spark, sf_dir):
    """Every fixture customer has orders, so the classic "no orders at
    all" anti-join is vacuously empty; "no URGENT orders" keeps the
    anti-join shape with a non-trivial result."""
    c = t(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast(_DEC)).cast("double") / F.count("*")
        ).alias("avg_bal")
    )
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy((F.col("c_nationkey") % 5).alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast(_DEC)).cast("double").alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Q2-shape — cheapest supplier per part via the lineitem link (argmin)
# ---------------------------------------------------------------------------


@query(
    "q2_min_price_supplier",
    oracle="""
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS best_price
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), ranked AS (
      SELECT l_partkey, l_suppkey, best_price,
             ROW_NUMBER() OVER (PARTITION BY l_partkey
                                ORDER BY best_price, l_suppkey) AS rn
      FROM offers
    )
    SELECT p_partkey, p_brand, s_suppkey, s_name,
           CAST(best_price AS DOUBLE) AS best_price
    FROM ranked
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE rn = 1 AND p_size >= 40
    """,
    tags=("tpch", "B31", "B34"),
)
def q2_min_price_supplier(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice").cast(_DEC)).alias("best_price")
    )
    w = Window.partitionBy("l_partkey").orderBy("best_price", "l_suppkey")
    part = t(spark, sf_dir, "part").filter(F.col("p_size") >= 40)
    return (
        offers.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(t(spark, sf_dir, "supplier")),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .select(
            "p_partkey",
            "p_brand",
            "s_suppkey",
            "s_name",
            F.col("best_price").cast("double").alias("best_price"),
        )
    )


# ---------------------------------------------------------------------------
# Q20 — qualified suppliers (semi-join on a grouped HAVING subquery)
# ---------------------------------------------------------------------------


@query(
    "q20_qualified_suppliers",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#12'
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 50
    )
    """,
    tags=("tpch", "B16", "B29"),
)
def q20_qualified_suppliers(spark, sf_dir):
    """Suppliers that moved >50 units of some Brand#12 part: grouped
    HAVING subquery → distinct keys → semi-join into the dimension."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12")
    qualified = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("q"))
        .filter(F.col("q") > 50)
        .select("l_suppkey")
    )
    return (
        t(spark, sf_dir, "supplier")
        .join(qualified, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


# ---------------------------------------------------------------------------
# Q21 — waiting orders (sole late supplier in multi-supplier orders)
# ---------------------------------------------------------------------------


@query(
    "q21_waiting_suppliers",
    # decorrelated formulation (identical semantics to the classic
    # EXISTS/NOT EXISTS pair): per order count distinct suppliers and
    # distinct LATE suppliers; a supplier "waits" on an order iff it is
    # late, the order has >1 supplier, and it is the ONLY late one.
    oracle="""
    WITH l AS (
      SELECT l_orderkey, l_suppkey,
             CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
    ), per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late
      FROM l GROUP BY l_orderkey
    ), waiting AS (
      SELECT DISTINCT l.l_orderkey, l.l_suppkey
      FROM l JOIN per_order p ON p.l_orderkey = l.l_orderkey
      WHERE l.late = 1 AND p.n_supp > 1 AND p.n_late = 1
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM waiting JOIN supplier ON s_suppkey = l_suppkey
    GROUP BY s_name
    """,
    tags=("tpch", "B16", "B22", "B23"),
)
def q21_waiting_suppliers(spark, sf_dir):
    """The hardest TPC-H shape (EXISTS + NOT EXISTS over the same fact),
    decorrelated into per-order WINDOW aggregates: the joined fact
    shuffles ONCE on l_orderkey (vs. three correlated scans classic, or
    groupBy + join-back = recompute + double shuffle). At fixture scale
    the window's collect_set state roughly offsets the saved shuffle;
    at cluster scale shuffle bytes dominate and this wins."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            F.when(
                F.col("l_shipdate") > F.date_add(F.col("o_orderdate").cast("date"), 60).cast("timestamp"),
                1,
            ).otherwise(0).alias("late"),
        )
    )
    # per-order distinct counts as WINDOW collect_sets: one shuffle on
    # l_orderkey total, instead of groupBy + join back over the same
    # fact (which re-shuffles it twice).
    w = Window.partitionBy("l_orderkey")
    waiting = (
        l.withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late",
            F.size(
                F.collect_set(
                    F.when(F.col("late") == 1, F.col("l_suppkey"))
                ).over(w)
            ),
        )
        .filter(
            (F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1)
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        waiting.join(
            F.broadcast(t(spark, sf_dir, "supplier")),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
