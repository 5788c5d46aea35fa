"""SQL-surface depth queries: subqueries, CTEs, unpivot, conditional
aggregation, arg-max, batch sessionization (SURVEY.md §3.4 entry 1 —
the ``engine.sql`` path; these run through ``spark.sql`` to prove the
SQL front-end end-to-end, not just the DataFrame builder).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from smallquery_spark.queries.registry import query, t


def _views(spark, sf_dir, *tables):
    for tbl in tables:
        t(spark, sf_dir, tbl).createOrReplaceTempView(tbl)


# ---------------------------------------------------------------------------
# subqueries
# ---------------------------------------------------------------------------


@query(
    "s01_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           o_totalprice - (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                  / COUNT(*) FROM orders) AS vs_avg
    FROM orders WHERE o_orderkey <= 2000
    """,
    tags=("sql", "B22"),
)
def s01_scalar_subquery(spark, sf_dir):
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               o_totalprice - (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                      / COUNT(*) FROM orders) AS vs_avg
        FROM orders WHERE o_orderkey <= 2000
        """
    )


@query(
    "s02_in_subquery",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
    """,
    tags=("sql", "B16"),
)
def s02_in_subquery(spark, sf_dir):
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        """
    )


@query(
    "s03_correlated_exists",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier s
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49)
    """,
    tags=("sql", "B16"),
)
def s03_correlated_exists(spark, sf_dir):
    _views(spark, sf_dir, "supplier", "lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM supplier s
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49)
        """
    )


@query(
    "s04_cte",
    oracle="""
    WITH seg AS (
      SELECT c_mktsegment, COUNT(*) AS n_cust
      FROM customer GROUP BY c_mktsegment
    ), ranked AS (
      SELECT c_mktsegment, n_cust,
             RANK() OVER (ORDER BY n_cust DESC, c_mktsegment) AS rnk
      FROM seg
    )
    SELECT * FROM ranked WHERE rnk <= 3
    """,
    tags=("sql", "B31"),
)
def s04_cte(spark, sf_dir):
    _views(spark, sf_dir, "customer")
    return spark.sql(
        """
        WITH seg AS (
          SELECT c_mktsegment, COUNT(*) AS n_cust
          FROM customer GROUP BY c_mktsegment
        ), ranked AS (
          SELECT c_mktsegment, n_cust,
                 RANK() OVER (ORDER BY n_cust DESC, c_mktsegment) AS rnk
          FROM seg
        )
        SELECT * FROM ranked WHERE rnk <= 3
        """
    )


# ---------------------------------------------------------------------------
# unpivot / conditional agg / arg-max
# ---------------------------------------------------------------------------


@query(
    "s05_unpivot",
    oracle="""
    SELECT c_custkey, metric, val FROM (
      SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
      UNION ALL
      SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
    ) WHERE c_custkey <= 100
    """,
    tags=("sql", "B30"),
)
def s05_unpivot(spark, sf_dir):
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    return c.selectExpr(
        "c_custkey",
        "stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE)) AS (metric, val)",
    )


@query(
    "s06_conditional_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
           COUNT(*) FILTER (WHERE l_discount = 0.0) AS n_nodisc,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
             FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS sum_f
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("sql", "B22"),
)
def s06_conditional_agg(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_quantity") > 25).alias("n_big"),
        F.count_if(F.col("l_discount") == 0.0).alias("n_nodisc"),
        F.sum(
            F.when(
                F.col("l_linestatus") == "F",
                F.col("l_extendedprice").cast("decimal(18,2)"),
            )
        ).cast("double").alias("sum_f"),
    )


@query(
    "s07_argmax",
    oracle="""
    SELECT o_custkey, o_orderkey AS best_order, best_price FROM (
      SELECT o_custkey, o_orderkey,
             MAX(o_totalprice) OVER (PARTITION BY o_custkey) AS best_price,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
    tags=("sql", "B22"),
)
def s07_argmax(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    # max_by with a (price, orderkey) struct: deterministic under ties.
    return o.groupBy("o_custkey").agg(
        F.expr(
            "max_by(o_orderkey, struct(o_totalprice, o_orderkey))"
        ).alias("best_order"),
        F.max("o_totalprice").alias("best_price"),
    )


# ---------------------------------------------------------------------------
# batch sessionization (gaps-and-islands — streaming B53's batch twin)
# ---------------------------------------------------------------------------


@query(
    "s08_sessionize_batch",
    oracle="""
    WITH lagd AS (
      SELECT user_id, event_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ), marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 5 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM lagd
    ), sess AS (
      SELECT user_id, event_id,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events, MIN(event_id) AS first_event
    FROM sess GROUP BY user_id, session_id
    """,
    tags=("sql", "B33", "C4"),
)
def s08_sessionize_batch(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    marked = ev.withColumn(
        "new_s",
        F.when(gap.isNull() | (gap >= 300.0), 1).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_s").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"), F.min("event_id").alias("first_event")
    )


# ---------------------------------------------------------------------------
# extra string functions
# ---------------------------------------------------------------------------


@query(
    "s09_string_extra",
    oracle="""
    SELECT p_partkey,
           translate(p_name, 'aeiou', '12345') AS translated,
           reverse(p_name) AS rev,
           repeat(p_brand, 2) AS twice,
           ascii(p_name) AS first_code,
           starts_with(p_name, 'red') AS is_red,
           CASE WHEN p_name LIKE '%bolt%' THEN 1 ELSE 0 END AS has_bolt
    FROM part
    """,
    tags=("sql", "B42"),
)
def s09_string_extra(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.translate("p_name", "aeiou", "12345").alias("translated"),
        F.reverse(F.col("p_name")).alias("rev"),
        F.repeat(F.col("p_brand"), 2).alias("twice"),
        F.ascii("p_name").alias("first_code"),
        F.startswith(F.col("p_name"), F.lit("red")).alias("is_red"),
        F.when(F.col("p_name").like("%bolt%"), 1).otherwise(0).alias("has_bolt"),
    )


# ---------------------------------------------------------------------------
# na.fill / na.drop (B11 depth)
# ---------------------------------------------------------------------------


@query(
    "s10_na_fill_drop",
    oracle="""
    WITH o AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 4 = 0 THEN NULL ELSE o_totalprice END AS p,
             CASE WHEN o_orderkey % 6 = 0 THEN NULL ELSE o_orderstatus END AS s
      FROM orders
    )
    SELECT o_orderkey, COALESCE(p, 0.0) AS p, s
    FROM o WHERE s IS NOT NULL
    """,
    tags=("sql", "B11"),
)
def s10_na_fill_drop(spark, sf_dir):
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 4 == 0, None)
        .otherwise(F.col("o_totalprice"))
        .alias("p"),
        F.when(F.col("o_orderkey") % 6 == 0, None)
        .otherwise(F.col("o_orderstatus"))
        .alias("s"),
    )
    return o.na.drop(subset=["s"]).na.fill({"p": 0.0})


@query(
    "s11_not_in_nulls",
    # NOT IN over a subquery CONTAINING NULL is three-valued: the
    # predicate is never TRUE, so zero rows survive — the classic SQL
    # footgun both engines must implement identically. The companion
    # branch (NULL-free subquery) returns the real anti-set.
    oracle="""
    SELECT 'with_null' AS variant, COUNT(*) AS n FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                            UNION ALL SELECT NULL)
    UNION ALL
    SELECT 'no_null' AS variant, COUNT(*) AS n FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderkey < 100)
    """,
    tags=("sql", "B10", "B16"),
)
def s11_not_in_nulls(spark, sf_dir):
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT 'with_null' AS variant, COUNT(*) AS n FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                UNION ALL SELECT NULL)
        UNION ALL
        SELECT 'no_null' AS variant, COUNT(*) AS n FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderkey < 100)
        """
    )


@query(
    "s12_funnel",
    oracle="""
    WITH stages AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS stage1,
           CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup
                         THEN 1 ELSE 0 END) AS BIGINT) AS stage2,
           CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup
                          AND t_purchase > t_click
                         THEN 1 ELSE 0 END) AS BIGINT) AS stage3
    FROM stages
    """,
    tags=("sql", "B22", "B13"),
)
def s12_funnel(spark, sf_dir):
    """Conversion funnel (signup -> click -> purchase, in order): one
    pass computes each user's first event per stage, a second tiny agg
    counts ordered completions — two shuffles total regardless of event
    volume, the scalable shape for funnel analytics."""
    ev = t(spark, sf_dir, "events")
    first = lambda et: F.min(F.when(F.col("event_type") == et, F.col("ts")))  # noqa: E731
    stages = ev.groupBy("user_id").agg(
        first("signup").alias("t_signup"),
        first("click").alias("t_click"),
        first("purchase").alias("t_purchase"),
    )
    s1 = F.col("t_signup").isNotNull()
    s2 = s1 & (F.col("t_click") > F.col("t_signup"))
    s3 = s2 & (F.col("t_purchase") > F.col("t_click"))
    as_n = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    return stages.agg(
        F.count("*").alias("n_users"),
        as_n(s1).alias("stage1"),
        as_n(s2).alias("stage2"),
        as_n(s3).alias("stage3"),
    )


@query(
    "s13_retention_cohorts",
    oracle="""
    WITH weekly AS (
      -- floor(day-diff / 7), NOT date_diff('week', ...): DuckDB's week
      -- variant counts Monday-boundary crossings, which truncates
      -- toward zero for events BEFORE the anchor while Spark's
      -- floor(datediff/7) rounds down — off by one per negative
      -- non-multiple week (caught by the generated-fixture check when
      -- a generator bug put events in 1970).
      SELECT DISTINCT user_id,
             CAST(FLOOR(date_diff('day', DATE '1996-01-01',
                                  CAST(ts AS DATE)) / 7.0) AS BIGINT) AS wk
      FROM events
    ), cohort AS (
      SELECT user_id, MIN(wk) AS wk0 FROM weekly GROUP BY user_id
    )
    SELECT c.wk0 AS cohort_week,
           w.wk - c.wk0 AS week_offset,
           COUNT(DISTINCT w.user_id) AS active_users
    FROM weekly w JOIN cohort c ON w.user_id = c.user_id
    WHERE w.wk - c.wk0 <= 8
    GROUP BY 1, 2
    """,
    tags=("sql", "B22", "B23", "B43"),
)
def s13_retention_cohorts(spark, sf_dir):
    """Cohort retention matrix: users bucketed by first-active week,
    counted in each later week they return (classic growth analytics).
    All-integer counts -> exact cross-engine."""
    ev = t(spark, sf_dir, "events")
    weekly = ev.select(
        "user_id",
        F.floor(
            F.datediff(F.col("ts").cast("date"), F.lit("1996-01-01").cast("date")) / 7
        ).cast("bigint").alias("wk"),
    ).distinct()
    cohort = weekly.groupBy("user_id").agg(F.min("wk").alias("wk0"))
    return (
        weekly.join(cohort, "user_id")
        .filter((F.col("wk") - F.col("wk0")) <= 8)
        .groupBy(
            F.col("wk0").alias("cohort_week"),
            (F.col("wk") - F.col("wk0")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@query(
    "s14_longest_streak",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events WHERE user_id < 100
    ), grp AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS island
      FROM days
    ), streaks AS (
      SELECT user_id, island, COUNT(*) AS len FROM grp GROUP BY user_id, island
    )
    SELECT user_id, MAX(len) AS longest_streak FROM streaks GROUP BY user_id
    """,
    tags=("sql", "B31", "B43"),
)
def s14_longest_streak(spark, sf_dir):
    """Gaps-and-islands: longest run of consecutive active days per user
    via the date-minus-row_number island key — windows and aggregation
    only, no self-join, no iteration."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    days = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.withColumn(
        "island", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = grp.groupBy("user_id", "island").agg(F.count("*").alias("len"))
    return streaks.groupBy("user_id").agg(F.max("len").alias("longest_streak"))


@query(
    "s15_parameterized_sql",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders
    WHERE o_totalprice > 400000 AND o_orderdate >= TIMESTAMP '1996-06-01'
    GROUP BY o_orderpriority
    """,
    tags=("sql", "B10"),
)
def s15_parameterized_sql(spark, sf_dir):
    """Spark 4 named-parameter SQL: literals bind server-side (no string
    interpolation, no injection surface) — the right way to template the
    same plan over changing thresholds."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n
        FROM orders
        WHERE o_totalprice > :min_price AND o_orderdate >= :since
        GROUP BY o_orderpriority
        """,
        args={"min_price": 400000, "since": "1996-06-01 00:00:00"},
    )


@query(
    "s16_lateral_join",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c,
         LATERAL (SELECT o_orderkey, o_totalprice
                  FROM orders
                  WHERE o_custkey = c.c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey
                  LIMIT 2) o
    WHERE c.c_custkey < 100
    """,
    tags=("sql", "B34", "B14"),
)
def s16_lateral_join(spark, sf_dir):
    """Correlated LATERAL subquery (Spark 3.4+ SQL): top-2 orders per
    customer expressed as a dependent join. Catalyst decorrelates it
    into the same window-rank plan as the top-k recipe — the point is
    that the LATERAL surface itself parses, decorrelates, and stays
    shuffle-bounded rather than re-executing per outer row."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_lat")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer_lat c,
             LATERAL (SELECT o_orderkey, o_totalprice
                      FROM orders_lat
                      WHERE o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey
                      LIMIT 2) o
        WHERE c.c_custkey < 100
        """
    )


@query(
    "s17_recursive_cte",
    oracle="""
    WITH RECURSIVE months(m) AS (
        SELECT 1 UNION ALL SELECT m + 1 FROM months WHERE m < 12
    )
    SELECT m.m AS month_num, CAST(COALESCE(o.n, 0) AS BIGINT) AS n_orders
    FROM months m
    LEFT JOIN (SELECT MONTH(o_orderdate) AS mo, COUNT(*) AS n
               FROM orders WHERE YEAR(o_orderdate) = 1995
               GROUP BY MONTH(o_orderdate)) o
      ON o.mo = m.m
    """,
    tags=("sql", "B39"),
)
def s17_recursive_cte(spark, sf_dir):
    """Recursive CTE (Spark 4.0, SPARK-24497): a 12-row month spine built
    by SQL recursion, left-joined to per-month 1995 order counts so
    zero-order months still appear. The recursion terminates on the
    driver after 12 tiny iterations; the only distributed work is the
    single groupBy on orders — the spine side is broadcast. DuckDB runs
    the identical text (its WITH RECURSIVE is the same dialect), so the
    oracle is a true same-SQL cross-check."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
            SELECT 1 UNION ALL SELECT m + 1 FROM months WHERE m < 12
        )
        SELECT m.m AS month_num, CAST(COALESCE(o.n, 0) AS BIGINT) AS n_orders
        FROM months m
        LEFT JOIN (SELECT MONTH(o_orderdate) AS mo, COUNT(*) AS n
                   FROM orders WHERE YEAR(o_orderdate) = 1995
                   GROUP BY MONTH(o_orderdate)) o
          ON o.mo = m.m
        """
    )


@query(
    "s18_pipe_syntax",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
    tags=("sql", "B22"),
)
def s18_pipe_syntax(spark, sf_dir):
    """SQL pipe syntax (Spark 4.0, SPARK-49555): the same
    filter→aggregate plan written as a left-to-right operator chain
    (`FROM … |> WHERE … |> AGGREGATE … GROUP BY …`). Parses to the
    identical Catalyst plan as the classic formulation the oracle uses —
    this query proves the surface, not a new execution path."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE COUNT(*) AS n_orders,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
           GROUP BY o_orderpriority
        """
    )


@query(
    "s19_collation",
    oracle="""
    SELECT source,
           COUNT(DISTINCT lower(CASE WHEN doc_id % 2 = 0 THEN UPPER(lang) ELSE lang END))
               AS n_langs_ci,
           CAST(SUM(CASE WHEN lower(CASE WHEN doc_id % 2 = 0 THEN UPPER(lang) ELSE lang END)
                              = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en
    FROM documents
    GROUP BY source
    """,
    tags=("sql", "B42"),
)
def s19_collation(spark, sf_dir):
    """String collations (Spark 4.0): case-insensitive distinct-count and
    equality via `COLLATE UTF8_LCASE` instead of lower() rewrites. The
    mixed-case input is derived deterministically (even doc_ids
    upper-cased) so the collation actually has work to do. Collation
    comparisons stay inside codegen — no UDF. The oracle lowers
    explicitly, which is semantically identical for ASCII lang codes;
    outputs are case-stable aggregates (counts only), never a collated
    group representative, because Spark may surface either case."""
    _views(spark, sf_dir, "documents")
    return spark.sql(
        """
        SELECT source,
               COUNT(DISTINCT (CASE WHEN doc_id % 2 = 0 THEN UPPER(lang) ELSE lang END)
                     COLLATE UTF8_LCASE) AS n_langs_ci,
               CAST(SUM(CASE WHEN (CASE WHEN doc_id % 2 = 0 THEN UPPER(lang) ELSE lang END)
                                  COLLATE UTF8_LCASE = 'en' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_en
        FROM documents
        GROUP BY source
        """
    )


# ---------------------------------------------------------------------------
# GROUP BY ALL / ORDER BY ALL + try_* safe arithmetic
# ---------------------------------------------------------------------------


@query(
    "s20_group_by_all_try",
    # the oracle spells out try_* semantics explicitly (NULL on /0 and
    # on BIGINT overflow) so the contract is engine-independent.
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN l_linenumber = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_div_null,
           CAST(SUM(CASE WHEN CAST(l_quantity * 100 AS BIGINT) > 2000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_add_overflow
    FROM lineitem
    GROUP BY ALL
    ORDER BY ALL
    """,
    tags=("sql", "B44", "B13"),
)
def s20_group_by_all_try(spark, sf_dir):
    """Spark 4 SQL ergonomics + ANSI-safe arithmetic in one surface:
    GROUP BY ALL / ORDER BY ALL infer the grouping and ordering keys,
    and the try_* family (try_divide, try_add) returns NULL instead of
    raising under ANSI mode on division-by-zero / BIGINT overflow —
    the production recipe for aggregating dirty data without a
    job-killing exception at hour 9 of a 10-hour run. The counts of
    NULL-producing rows are compared exactly against an oracle that
    states the same semantics as explicit CASE logic.
    """
    _views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n,
               CAST(SUM(CASE WHEN try_divide(1.0, CAST(l_linenumber - 1 AS DOUBLE))
                             IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_div_null,
               CAST(SUM(CASE WHEN try_add(CAST(l_quantity * 100 AS BIGINT),
                                          9223372036854775807 - 2000)
                             IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_add_overflow
        FROM lineitem
        GROUP BY ALL
        ORDER BY ALL
        """
    )
