"""Set-operation queries (SURVEY.md §2 B39-B41)."""

from __future__ import annotations

from pyspark.sql import functions as F

from smallquery_spark.queries.registry import query, t


def _halves(spark, sf_dir):
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderstatus")
    lo = o.filter(F.col("o_custkey") % 2 == 0)
    hi = o.filter(F.col("o_custkey") % 3 == 0)
    return lo, hi


@query(
    "b39_union_all",
    oracle="""
    SELECT o_custkey, o_orderstatus FROM orders WHERE o_custkey % 2 = 0
    UNION ALL
    SELECT o_custkey, o_orderstatus FROM orders WHERE o_custkey % 3 = 0
    """,
    tags=("B39",),
)
def b39_union_all(spark, sf_dir):
    lo, hi = _halves(spark, sf_dir)
    return lo.unionAll(hi)


@query(
    "b39_union_distinct",
    oracle="""
    SELECT o_custkey, o_orderstatus FROM orders WHERE o_custkey % 2 = 0
    UNION
    SELECT o_custkey, o_orderstatus FROM orders WHERE o_custkey % 3 = 0
    """,
    tags=("B39",),
)
def b39_union_distinct(spark, sf_dir):
    lo, hi = _halves(spark, sf_dir)
    return lo.union(hi).distinct()


@query(
    "b39_union_by_name",
    oracle="""
    SELECT c_custkey AS k, c_name AS name FROM customer WHERE c_custkey <= 50
    UNION ALL
    SELECT s_suppkey AS k, s_name AS name FROM supplier WHERE s_suppkey <= 20
    """,
    tags=("B39",),
)
def b39_union_by_name(spark, sf_dir):
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 50)
        .select(F.col("c_custkey").alias("k"), F.col("c_name").alias("name"))
    )
    s = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") <= 20)
        .select(F.col("s_name").alias("name"), F.col("s_suppkey").alias("k"))
    )
    return c.unionByName(s)  # column-name alignment, not positional


@query(
    "b40_intersect",
    oracle="""
    SELECT o_custkey, o_orderstatus FROM orders WHERE o_custkey % 2 = 0
    INTERSECT
    SELECT o_custkey, o_orderstatus FROM orders WHERE o_custkey % 3 = 0
    """,
    tags=("B40",),
)
def b40_intersect(spark, sf_dir):
    lo, hi = _halves(spark, sf_dir)
    return lo.intersect(hi)


@query(
    "b40_intersect_all",
    oracle="""
    SELECT o_custkey, o_orderstatus FROM orders WHERE o_custkey % 2 = 0
    INTERSECT ALL
    SELECT o_custkey, o_orderstatus FROM orders WHERE o_custkey % 3 = 0
    """,
    tags=("B40",),
)
def b40_intersect_all(spark, sf_dir):
    lo, hi = _halves(spark, sf_dir)
    return lo.intersectAll(hi)


@query(
    "b41_except",
    oracle="""
    SELECT o_custkey, o_orderstatus FROM orders WHERE o_custkey % 2 = 0
    EXCEPT
    SELECT o_custkey, o_orderstatus FROM orders WHERE o_custkey % 3 = 0
    """,
    tags=("B41",),
)
def b41_except(spark, sf_dir):
    lo, hi = _halves(spark, sf_dir)
    return lo.exceptAll(hi).distinct()


@query(
    "b41_except_all",
    oracle="""
    SELECT o_custkey, o_orderstatus FROM orders WHERE o_custkey % 2 = 0
    EXCEPT ALL
    SELECT o_custkey, o_orderstatus FROM orders WHERE o_custkey % 3 = 0
    """,
    tags=("B41",),
)
def b41_except_all(spark, sf_dir):
    lo, hi = _halves(spark, sf_dir)
    return lo.exceptAll(hi)
