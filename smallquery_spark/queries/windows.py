"""Window-function queries (SURVEY.md §2 B31-B34).

Determinism rule: every window ordering is made TOTAL with a unique
tie-break key (o_orderkey / event_id / l_linenumber) so both engines
produce identical ranks — `row_number` over a non-total order is
nondeterministic on any engine (SURVEY §4.3).

Scale note: a window partitioned by a key is one hash shuffle + an
in-partition sort — the same cost envelope as a sort-merge join. The
anti-pattern to avoid is `Window.partitionBy()` (empty) over big data —
it funnels everything into one task; none of these queries do that
(the single global-frame query runs over a pre-aggregated small frame).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from smallquery_spark.operators import top_k_per_group
from smallquery_spark.queries.registry import query, t


# ---------------------------------------------------------------------------
# B31 — ranking functions
# ---------------------------------------------------------------------------


@query(
    "b31_ranking",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    tags=("B31",),
)
def b31_ranking(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "b31_percent_rank",
    oracle="""
    SELECT l_returnflag, l_orderkey, l_linenumber,
           ROUND(PERCENT_RANK() OVER (
             PARTITION BY l_returnflag
             ORDER BY l_quantity, l_orderkey, l_linenumber), 6) AS pr
    FROM lineitem WHERE l_orderkey <= 3000
    """,
    tags=("B31",),
)
def b31_percent_rank(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 3000)
    w = W.partitionBy("l_returnflag").orderBy(
        "l_quantity", "l_orderkey", "l_linenumber"
    )
    return li.select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
    )


# ---------------------------------------------------------------------------
# B32 — analytic functions (lag/lead/first/last)
# ---------------------------------------------------------------------------


@query(
    "b32_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           LAG(value)  OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           FIRST_VALUE(event_id) OVER w AS first_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    """,
    tags=("B32",),
)
def b32_lag_lead(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("event_id").over(w).alias("first_event"),
    )


# ---------------------------------------------------------------------------
# B33 — frame aggregates: running / sliding
# ---------------------------------------------------------------------------


@query(
    "b33_running_sum",
    # Frame sums run over exact centi-unit BIGINTs (decimal result
    # columns are a driver-canonicalization trap — see tools/check.py);
    # the sliding avg is one identical double division of exact integers
    # on both engines. DuckDB SUM(BIGINT) widens to HUGEINT, which its
    # pandas extraction turns into float64 — hence the CAST back.
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders
    )
    SELECT o_custkey, o_orderkey,
           CAST(SUM(cents) OVER w1 AS BIGINT) AS running_spend_cents,
           CAST(CAST(SUM(cents) OVER w3 AS BIGINT) AS DOUBLE)
             / CAST(100 * COUNT(*) OVER w3 AS DOUBLE) AS sliding_avg3
    FROM o
    WINDOW w1 AS (PARTITION BY o_custkey ORDER BY o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w3 AS (PARTITION BY o_custkey ORDER BY o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    tags=("B33",),
)
def b33_running_sum(spark, sf_dir):
    o = t(spark, sf_dir, "orders").withColumn(
        "cents",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint"),
    )
    w = W.partitionBy("o_custkey").orderBy("o_orderkey")
    w1 = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    w3 = w.rowsBetween(-2, W.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum("cents").over(w1).alias("running_spend_cents"),
        (
            F.sum("cents").over(w3).cast("double")
            / (F.lit(100) * F.count(F.lit(1)).over(w3)).cast("double")
        ).alias("sliding_avg3"),
    )


@query(
    "b33_range_frame",
    oracle="""
    SELECT p_brand, p_partkey, p_size,
           COUNT(*) OVER (PARTITION BY p_brand ORDER BY p_size
                          RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS n_similar
    FROM part
    """,
    tags=("B33",),
)
def b33_range_frame(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    w = (
        W.partitionBy("p_brand")
        .orderBy("p_size")
        .rangeBetween(-5, W.currentRow)
    )
    return p.select(
        "p_brand", "p_partkey", "p_size", F.count("*").over(w).alias("n_similar")
    )


# ---------------------------------------------------------------------------
# B34 — top-k per group (composite operator)
# ---------------------------------------------------------------------------


@query(
    "b34_topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice, rnk FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rnk
      FROM part
    ) WHERE rnk <= 3
    """,
    tags=("B34",),
)
def b34_topk_per_group(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return top_k_per_group(
        p.select("p_brand", "p_partkey", "p_retailprice"),
        group=["p_brand"],
        order=[F.col("p_retailprice").desc(), F.col("p_partkey")],
        k=3,
        rank_col="rnk",
    )


@query(
    "b31_ntile_cume",
    oracle="""
    SELECT o_orderkey,
           NTILE(4) OVER w AS quartile,
           CUME_DIST() OVER w AS cume,
           ROUND(PERCENT_RANK() OVER w, 9) AS pct_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("B31",),
)
def b31_ntile_cume(spark, sf_dir):
    """ntile/cume_dist/percent_rank over a total order (unique tiebreak
    key ⇒ both engines agree); percent_rank rounds identically because
    the underlying ratio is exact (small integer / small integer)."""
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.cume_dist().over(w).alias("cume"),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
    )


@query(
    "b32_nth_first_last",
    oracle="""
    SELECT DISTINCT o_orderpriority,
           FIRST_VALUE(o_orderkey) OVER w AS cheapest_key,
           LAST_VALUE(o_orderkey) OVER w AS priciest_key,
           NTH_VALUE(o_orderkey, 2) OVER w AS runner_up_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("B32",),
)
def b32_nth_first_last(spark, sf_dir):
    """first/last/nth over the full-partition frame (the default frame
    would make last_value see only the running prefix — the explicit
    unbounded frame is the correct recipe both engines share)."""
    o = t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_orderpriority",
        F.first("o_orderkey").over(w).alias("cheapest_key"),
        F.last("o_orderkey").over(w).alias("priciest_key"),
        F.nth_value("o_orderkey", 2).over(w).alias("runner_up_key"),
    ).distinct()
