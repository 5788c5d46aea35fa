"""Join queries (SURVEY.md §2 B14-B21).

Equi joins are plain ``df.join`` — Catalyst picks broadcast / shuffled
hash / sort-merge; AQE re-picks at runtime from real sizes. The
composite operators (as-of B20, banded range B19/B21) come from
smallquery_spark.operators where the scalable decompositions live.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from smallquery_spark.operators import asof_join, banded_time_join
from smallquery_spark.queries.registry import query, t


# ---------------------------------------------------------------------------
# B14 — inner equi join
# ---------------------------------------------------------------------------


@query(
    "b14_inner_join",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    """,
    tags=("B14",),
)
def b14_inner_join(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


# ---------------------------------------------------------------------------
# B15 — outer joins
# ---------------------------------------------------------------------------


@query(
    "b15_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 400000
    """,
    tags=("B15",),
)
def b15_left_outer(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(
        o, (c.c_custkey == o.o_custkey) & (o.o_totalprice > 400000), "left"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@query(
    "b15_full_outer",
    oracle="""
    WITH big_cust AS (SELECT * FROM customer WHERE c_custkey <= 300),
         big_sup  AS (SELECT * FROM supplier WHERE s_suppkey <= 40)
    SELECT bc.c_custkey, bc.c_nationkey, bs.s_suppkey, bs.s_nationkey
    FROM big_cust bc FULL OUTER JOIN big_sup bs
      ON bc.c_nationkey = bs.s_nationkey AND bc.c_custkey < 100
    """,
    tags=("B15",),
)
def b15_full_outer(spark, sf_dir):
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 300)
    s = t(spark, sf_dir, "supplier").filter(F.col("s_suppkey") <= 40)
    return c.join(
        s,
        (c.c_nationkey == s.s_nationkey) & (c.c_custkey < 100),
        "full_outer",
    ).select("c_custkey", "c_nationkey", "s_suppkey", "s_nationkey")


# ---------------------------------------------------------------------------
# B16 — semi / anti
# ---------------------------------------------------------------------------


@query(
    "b16_left_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
    tags=("B16",),
)
def b16_left_semi(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "b16_left_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("B16",),
)
def b16_left_anti(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# ---------------------------------------------------------------------------
# B17 — broadcast join (plan asserted in tests/test_plans.py)
# ---------------------------------------------------------------------------


@query(
    "b17_broadcast_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, p.p_brand, p.p_type
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size >= 30
    """,
    tags=("B17",),
)
def b17_broadcast_join(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_size") >= 30)
    # part is the small dim → broadcast: no shuffle of the fact table at
    # any scale (dim stays << autoBroadcastJoinThreshold-sized per 100 TB
    # design; lineitem never moves).
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_orderkey", "l_linenumber", "p_brand", "p_type"
    )


# ---------------------------------------------------------------------------
# B18 — cross join
# ---------------------------------------------------------------------------


@query(
    "b18_cross_join",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
    tags=("B18",),
)
def b18_cross_join(spark, sf_dir):
    return (
        t(spark, sf_dir, "region")
        .crossJoin(t(spark, sf_dir, "nation"))
        .select("r_name", "n_name")
    )


# ---------------------------------------------------------------------------
# B19 — theta / range join (banded decomposition — no nested loop)
# ---------------------------------------------------------------------------


@query(
    "b19_range_join",
    oracle="""
    SELECT a.event_id AS probe_id, b.event_id AS match_id
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 1 HOUR
    WHERE a.event_type = 'error'
    """,
    tags=("B19",),
)
def b19_range_join(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    probes = ev.filter(F.col("event_type") == "error")
    joined = banded_time_join(
        probes,
        ev,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        lower_seconds=0.0,
        upper_seconds=3600.0,
    )
    # exclusive lower bound (b.ts > a.ts): banded join is inclusive, so
    # drop the zero-delta self pairs.
    return joined.filter(F.col("ts_r") > F.col("ts")).select(
        F.col("event_id").alias("probe_id"), F.col("event_id_r").alias("match_id")
    )


# ---------------------------------------------------------------------------
# B20 — as-of join (composite; oracle = DuckDB native ASOF JOIN)
# ---------------------------------------------------------------------------


@query(
    "b20_asof_join",
    oracle="""
    SELECT p.event_id, p.user_id, e.event_id AS last_click_id
    FROM (SELECT * FROM events WHERE event_type = 'error') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') e
      ON p.user_id = e.user_id AND p.ts >= e.ts
    """,
    tags=("B20",),
)
def b20_asof_join(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    probes = ev.filter(F.col("event_type") == "error")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("last_click_id")
    )
    out = asof_join(
        probes,
        clicks,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        value_cols=["last_click_id"],
        tiebreak="last_click_id",
    )
    return out.select("event_id", "user_id", "last_click_id")


# ---------------------------------------------------------------------------
# B21 — interval overlap join
# ---------------------------------------------------------------------------


@query(
    "b21_interval_overlap",
    oracle="""
    WITH s AS (
      SELECT event_id, user_id, ts, ts + INTERVAL 30 MINUTE AS te
      FROM events WHERE event_type = 'signup'
    ), p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT s.event_id AS session_id, p.event_id AS purchase_id
    FROM s JOIN p
      ON s.user_id = p.user_id AND p.ts >= s.ts AND p.ts <= s.te
    """,
    tags=("B21",),
)
def b21_interval_overlap(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    sessions = ev.filter(F.col("event_type") == "signup")
    purchases = ev.filter(F.col("event_type") == "purchase")
    joined = banded_time_join(
        sessions,
        purchases,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        lower_seconds=0.0,
        upper_seconds=1800.0,
    )
    return joined.select(
        F.col("event_id").alias("session_id"),
        F.col("event_id_r").alias("purchase_id"),
    )


@query(
    "b20_asof_forward",
    oracle="""
    SELECT p.event_id, p.user_id, e.event_id AS next_click_id
    FROM (SELECT * FROM events WHERE event_type = 'error') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') e
      ON p.user_id = e.user_id AND p.ts <= e.ts
    """,
    tags=("B20",),
)
def b20_asof_forward(spark, sf_dir):
    """Forward as-of: first click AT or AFTER each error — same
    single-shuffle window plan as backward, time sort reversed."""
    ev = t(spark, sf_dir, "events")
    probes = ev.filter(F.col("event_type") == "error")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("next_click_id")
    )
    out = asof_join(
        probes,
        clicks,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        value_cols=["next_click_id"],
        tiebreak="next_click_id",
        direction="forward",
    )
    return out.select("event_id", "user_id", "next_click_id")


@query(
    "b20_asof_tolerance",
    oracle="""
    SELECT p.event_id, p.user_id,
           CASE WHEN p.ts <= e.ts + INTERVAL 30 MINUTE
                THEN e.event_id END AS recent_click_id
    FROM (SELECT * FROM events WHERE event_type = 'error') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') e
      ON p.user_id = e.user_id AND p.ts >= e.ts
    """,
    tags=("B20",),
)
def b20_asof_tolerance(spark, sf_dir):
    """Backward as-of with a 30-minute tolerance (pandas merge_asof
    contract): stale matches are nulled, rows are kept."""
    ev = t(spark, sf_dir, "events")
    probes = ev.filter(F.col("event_type") == "error")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("recent_click_id")
    )
    out = asof_join(
        probes,
        clicks,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        value_cols=["recent_click_id"],
        tiebreak="recent_click_id",
        tolerance="30 minutes",
    )
    return out.select("event_id", "user_id", "recent_click_id")


@query(
    "b15_right_outer",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_custkey, c.c_name
    FROM orders o RIGHT JOIN customer c
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 400000
    """,
    tags=("B15",),
)
def b15_right_outer(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return o.join(
        c, (c.c_custkey == o.o_custkey) & (o.o_totalprice > 400000), "right"
    ).select("o_orderkey", "o_totalprice", "c_custkey", "c_name")
