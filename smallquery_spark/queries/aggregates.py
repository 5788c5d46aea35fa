"""Aggregation queries (SURVEY.md §2 B22-B30).

Cross-engine conventions:
- exact sums over doubles go through DECIMAL casts (see relational.py);
- approx aggregates (B24) emit a *validated tolerance boolean* — the
  oracle emits literal TRUE, so the hash matches iff the approximation
  is within its contract;
- skewness/kurtosis differ between engines (Spark = population moments,
  DuckDB = sample-corrected), so the oracle computes Spark's population
  formula explicitly from moments;
- collect_list/set results are sorted and stringified (engine-neutral
  value hashing).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from smallquery_spark.queries.registry import query, t

_DEC = "decimal(18,2)"


# ---------------------------------------------------------------------------
# B22 — grouped aggregates (count/sum/avg/min/max)
# ---------------------------------------------------------------------------


@query(
    "b22_grouped_agg",
    # Round-1 driver forensics (VERDICT.md): DECIMAL result columns
    # hash-fail whenever a value's cents end in 0 (Spark keeps
    # Decimal("153457.00"), the driver's DuckDB extraction renders
    # float 153457.0). Sums therefore aggregate in exact decimal but are
    # EMITTED as BIGINT centi-units; avg is one identical double
    # division of exact integers on both engines.
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty_cents,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS DOUBLE)
             / CAST(100 * COUNT(*) AS DOUBLE) AS avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("B22",),
)
def b22_grouped_agg(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        (F.sum(F.col("l_quantity").cast(_DEC)) * 100).cast("bigint").alias(
            "sum_qty_cents"
        ),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        (
            (F.sum(F.col("l_extendedprice").cast(_DEC)) * 100)
            .cast("bigint")
            .cast("double")
            / (F.lit(100) * F.count("*")).cast("double")
        ).alias("avg_price"),
    )


@query(
    "b22_global_agg",
    # total emitted as centi-units (exact BIGINT) — see b22_grouped_agg.
    oracle="""
    SELECT COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_cents,
           MIN(o_orderdate) AS first_date, MAX(o_orderdate) AS last_date
    FROM orders
    """,
    tags=("B22",),
)
def b22_global_agg(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n"),
        (F.sum(F.col("o_totalprice").cast(_DEC)) * 100).cast("bigint").alias(
            "total_cents"
        ),
        F.min("o_orderdate").alias("first_date"),
        F.max("o_orderdate").alias("last_date"),
    )


# ---------------------------------------------------------------------------
# B23 — distinct aggregates
# ---------------------------------------------------------------------------


@query(
    "b23_distinct_agg",
    oracle="""
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(DISTINCT c_custkey)  AS n_custs
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("B23",),
)
def b23_distinct_agg(spark, sf_dir):
    return (
        t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.countDistinct("c_custkey").alias("n_custs"),
        )
    )


# ---------------------------------------------------------------------------
# B24 — approx distinct: validated-tolerance pattern
# ---------------------------------------------------------------------------


@query(
    "b24_approx_distinct",
    oracle="SELECT TRUE AS within_tol",
    tags=("B24",),
)
def b24_approx_distinct(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.approx_count_distinct("l_orderkey", 0.05).alias("approx"),
        F.countDistinct("l_orderkey").alias("exact"),
    )
    return agg.select(
        (
            (F.col("approx") >= F.col("exact") * 0.85)
            & (F.col("approx") <= F.col("exact") * 1.15)
        ).alias("within_tol")
    )


# ---------------------------------------------------------------------------
# B25 — rollup / cube / grouping sets
# ---------------------------------------------------------------------------


@query(
    "b25_rollup",
    # sum_qty emitted as centi-unit BIGINT — see b22_grouped_agg note.
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) + 2 * GROUPING(l_linestatus) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty_cents
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("B25",),
)
def b25_rollup(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        (
            F.grouping("l_returnflag") + 2 * F.grouping("l_linestatus")
        ).cast("bigint").alias("gid"),
        F.count("*").alias("n"),
        (F.sum(F.col("l_quantity").cast(_DEC)) * 100).cast("bigint").alias(
            "sum_qty_cents"
        ),
    )


@query(
    "b25_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("B25",),
)
def b25_cube(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# B26 — statistical aggregates
# ---------------------------------------------------------------------------


@query(
    "b26_stats_agg",
    oracle="""
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_extendedprice), 4) AS sd_price,
           ROUND(VAR_SAMP(l_discount), 6) AS var_disc,
           ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS covar_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("B26",),
)
def b26_stats_agg(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "covar_qty_price"
        ),
    )


@query(
    "b26_skew_kurtosis",
    # Spark's skewness/kurtosis are population moments (g1, g2 = excess);
    # DuckDB's are sample-corrected — compute Spark's definition from
    # central moments explicitly.
    oracle="""
    WITH mu AS (SELECT AVG(l_extendedprice) AS m FROM lineitem),
         mom AS (
           SELECT AVG(POW(l_extendedprice - mu.m, 2)) AS m2,
                  AVG(POW(l_extendedprice - mu.m, 3)) AS m3,
                  AVG(POW(l_extendedprice - mu.m, 4)) AS m4
           FROM lineitem, mu
         )
    SELECT ROUND(m3 / POW(m2, 1.5), 6) AS skew_price,
           ROUND(m4 / (m2 * m2) - 3.0, 6) AS kurt_price
    FROM mom
    """,
    tags=("B26",),
)
def b26_skew_kurtosis(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.skewness("l_extendedprice"), 6).alias("skew_price"),
        F.round(F.kurtosis("l_extendedprice"), 6).alias("kurt_price"),
    )


# ---------------------------------------------------------------------------
# B27 — percentiles / median
# ---------------------------------------------------------------------------


@query(
    "b27_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           ROUND(median(l_quantity), 4) AS med_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("B27",),
)
def b27_percentiles(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("med_qty"),
    )


@query(
    "b27_approx_percentile",
    oracle="SELECT TRUE AS within_tol",
    tags=("B27",),
)
def b27_approx_percentile(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
    )
    return agg.select(
        (
            (F.col("approx") >= F.col("exact") * 0.95)
            & (F.col("approx") <= F.col("exact") * 1.05)
        ).alias("within_tol")
    )


# ---------------------------------------------------------------------------
# B28 — collect aggregates (sorted + stringified for engine-neutral hash)
# ---------------------------------------------------------------------------


@query(
    "b28_collect_set",
    oracle="""
    SELECT r.r_name,
           array_to_string(list_sort(list(DISTINCT n.n_name)), ',') AS nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    tags=("B28",),
)
def b28_collect_set(spark, sf_dir):
    r = t(spark, sf_dir, "region")
    n = t(spark, sf_dir, "nation")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_set("n_name")), ",").alias("nations")
        )
    )


# ---------------------------------------------------------------------------
# B29 — HAVING
# ---------------------------------------------------------------------------


@query(
    "b29_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) > 12
    """,
    tags=("B29",),
)
def b29_having(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") > 12)
    )


# ---------------------------------------------------------------------------
# B30 — pivot
# ---------------------------------------------------------------------------


@query(
    "b30_pivot",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_O,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_F,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_P
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("B30",),
)
def b30_pivot(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    # Spark pivot leaves NULL for empty cells; COUNT FILTER gives 0.
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).alias("status_O"),
        F.coalesce(F.col("F"), F.lit(0)).alias("status_F"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_P"),
    )


@query(
    "b25_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) + 2 * GROUPING(l_linestatus) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_price_cents
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("B25",),
)
def b25_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (not derivable from rollup/cube): per-flag,
    per-status, and grand-total groups in one pass over the fact."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) + 2 * GROUPING(l_linestatus) AS BIGINT) AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_price_cents
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "b22_column_profile",
    oracle="""
    SELECT 'l_quantity' AS col, COUNT(*) AS n, COUNT(l_quantity) AS n_nonnull,
           COUNT(DISTINCT l_quantity) AS n_distinct,
           MIN(l_quantity) AS min_d, MAX(l_quantity) AS max_d
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', COUNT(*), COUNT(l_extendedprice),
           COUNT(DISTINCT l_extendedprice), MIN(l_extendedprice), MAX(l_extendedprice)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(*), COUNT(l_discount),
           COUNT(DISTINCT l_discount), MIN(l_discount), MAX(l_discount)
    FROM lineitem
    """,
    tags=("B22", "B23"),
)
def b22_column_profile(spark, sf_dir):
    """ANALYZE-style column profile (null/distinct/min/max per column)
    computed in ONE scan: all per-column aggregates in a single agg node
    (vs the oracle's three passes), then unpivoted driver-side — the
    shape of stats collection feeding a CBO at scale."""
    li = t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    aggs = []
    for c in cols:
        aggs += [
            F.count("*").alias(f"{c}__n"),
            F.count(c).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(c).alias(f"{c}__mn"),
            F.max(c).alias(f"{c}__mx"),
        ]
    row = li.agg(*aggs).first()
    return spark.createDataFrame(
        [
            (c, row[f"{c}__n"], row[f"{c}__nn"], row[f"{c}__nd"],
             float(row[f"{c}__mn"]), float(row[f"{c}__mx"]))
            for c in cols
        ],
        "col string, n long, n_nonnull long, n_distinct long, min_d double, max_d double",
    )


@query(
    "b30_melt_unpivot",
    oracle="""
    SELECT c_custkey, metric, value FROM (
      SELECT c_custkey,
             UNNEST(['acctbal', 'nationkey']) AS metric,
             UNNEST([c_acctbal, CAST(c_nationkey AS DOUBLE)]) AS value
      FROM customer
    )
    """,
    tags=("B30",),
)
def b30_melt_unpivot(spark, sf_dir):
    """DataFrame-native unpivot/melt (wide -> long), the inverse of
    pivot — a narrow row expansion, no shuffle."""
    c = t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    )
    return c.unpivot(
        ids=["c_custkey"],
        values=["acctbal", "nationkey"],
        variableColumnName="metric",
        valueColumnName="value",
    )
