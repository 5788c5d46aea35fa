"""UDF / UDAF / UDTF queries (SURVEY.md §2 B60-B65).

These exist to prove the full UDF surface; the engine's guidance stands:
built-ins first (B60's logic is expressible without a UDF — the UDF is
the point here), Pandas UDFs over row-at-a-time when Python is genuinely
needed (Arrow batch transfer, ~10-100x faster).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from smallquery_spark.queries.registry import query, t


# ---------------------------------------------------------------------------
# B60 — scalar Python UDF (row-at-a-time; the slow path, shown once)
# ---------------------------------------------------------------------------


@query(
    "b60_python_udf",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
    FROM lineitem WHERE l_orderkey <= 1000
    """,
    tags=("B60",),
)
def b60_python_udf(spark, sf_dir):
    # NOTE: no rounding anywhere — Spark's ROUND ties on the decimal
    # string repr while DuckDB ties on the binary value, so rounding is
    # what BREAKS parity; the raw IEEE product is deterministic on both.
    # useArrow=True (guide §4.3, r15): the function body is unchanged
    # and still called per row — that IS the declared B60 surface — but
    # batches cross the JVM↔Python boundary as Arrow instead of pickled
    # rows. Coercion-safe here: float64 in, float64 out, honestly
    # declared, no nulls in the inputs; oracle hash re-verified.
    @F.udf(T.DoubleType(), useArrow=True)
    def charge(price, disc, tax):
        return price * (1 - disc) * (1 + tax)

    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charge("l_extendedprice", "l_discount", "l_tax").alias("charged"),
    )


# ---------------------------------------------------------------------------
# B61 — vectorized (Arrow) pandas UDF
# ---------------------------------------------------------------------------


@query(
    "b61_pandas_udf",
    oracle="""
    SELECT o_orderkey,
           ROUND(LN(o_totalprice + 1.0), 6) AS log_price
    FROM orders
    """,
    tags=("B61",),
)
def b61_pandas_udf(spark, sf_dir):
    import numpy as np

    @F.pandas_udf(T.DoubleType())
    def log_price(s: pd.Series) -> pd.Series:
        return pd.Series(np.round(np.log(s + 1.0), 6))

    return t(spark, sf_dir, "orders").select(
        "o_orderkey", log_price("o_totalprice").alias("log_price")
    )


# ---------------------------------------------------------------------------
# B62 — grouped-map applyInPandas
# ---------------------------------------------------------------------------


@query(
    "b62_apply_in_pandas",
    oracle="""
    SELECT o_custkey, o_orderkey,
           o_totalprice - CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                               OVER (PARTITION BY o_custkey) AS DOUBLE)
                          / (COUNT(*) OVER (PARTITION BY o_custkey))
             AS centered
    FROM orders
    """,
    tags=("B62",),
)
def b62_apply_in_pandas(spark, sf_dir):
    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        # Exact-decimal group sum, then one double division: bit-identical
        # to the oracle's decimal window-sum / count (pandas' pairwise
        # float sum would NOT match a streaming sum).
        from decimal import Decimal

        pdf = pdf.copy()
        total = sum(Decimal(f"{v:.2f}") for v in pdf["o_totalprice"])
        mean = float(total) / len(pdf)
        pdf["centered"] = pdf["o_totalprice"] - mean
        return pdf[["o_custkey", "o_orderkey", "centered"]]

    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    return (
        o.groupBy("o_custkey")
        .applyInPandas(
            center, schema="o_custkey long, o_orderkey long, centered double"
        )
    )


# ---------------------------------------------------------------------------
# B63 — grouped-agg pandas UDF (UDAF)
# ---------------------------------------------------------------------------


@query(
    "b63_grouped_agg_udaf",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 6)
             AS weighted_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("B63",),
)
def b63_grouped_agg_udaf(spark, sf_dir):
    # Python-side per-group reduce via applyInPandas: whole group in one
    # pandas frame, single-row result. (A GROUPED_AGG pandas_udf is the
    # other spelling; applyInPandas handles multi-column inputs.)
    def wavg(pdf: pd.DataFrame) -> pd.DataFrame:
        w = (pdf["l_extendedprice"] * pdf["l_quantity"]).sum() / pdf[
            "l_quantity"
        ].sum()
        return pd.DataFrame(
            {"l_returnflag": [pdf["l_returnflag"].iloc[0]], "weighted_avg_price": [round(w, 6)]}
        )

    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )
    return li.groupBy("l_returnflag").applyInPandas(
        wavg, schema="l_returnflag string, weighted_avg_price double"
    )


# ---------------------------------------------------------------------------
# B64 — UDTF (table function)
# ---------------------------------------------------------------------------


@query(
    "b64_udtf",
    oracle="""
    SELECT p_partkey, UNNEST(string_split(p_name, ' ')) AS word
    FROM part WHERE p_partkey <= 50
    """,
    tags=("B64",),
)
def b64_udtf(spark, sf_dir):
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string")
    class SplitWords:
        def eval(self, name: str):
            for w in name.split(" "):
                yield (w,)

    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 50)
    return p.lateralJoin(SplitWords(F.col("p_name").outer())).select(
        "p_partkey", "word"
    )


# ---------------------------------------------------------------------------
# B65 — SQL registration
# ---------------------------------------------------------------------------


@query(
    "b65_sql_registered_udf",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bal_tier
    FROM customer
    """,
    tags=("B65",),
)
def b65_sql_registered_udf(spark, sf_dir):
    def tier(b: float) -> str:
        if b < 0:
            return "debt"
        return "low" if b < 5000 else "high"

    # registered as an Arrow-serialized UDF (guide §4.3, r15): still a
    # per-row Python function — the declared B65 surface — but the
    # boundary crossing is Arrow batches, not pickled rows. str return
    # honestly declared; oracle hash re-verified.
    spark.udf.register(
        "bal_tier_udf", F.udf(tier, T.StringType(), useArrow=True)
    )
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer_b65")
    return spark.sql(
        "SELECT c_custkey, bal_tier_udf(c_acctbal) AS bal_tier FROM customer_b65"
    )


@query(
    "b62_cogroup_in_pandas",
    oracle="""
    SELECT c.c_custkey,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(MAX(c.c_acctbal) AS DOUBLE) AS acctbal
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
    tags=("B62",),
)
def b62_cogroup_in_pandas(spark, sf_dir):
    """Cogrouped applyInPandas: both sides grouped on the key, each
    (left_group, right_group) pair handed to one Python function — the
    arbitrary-merge escape hatch when a join + agg can't express the
    pairing logic. Contract here IS join-expressible so the oracle can
    check it exactly."""

    def merge(cust: pd.DataFrame, orders: pd.DataFrame) -> pd.DataFrame:
        if cust.empty:
            return pd.DataFrame(columns=["c_custkey", "n_orders", "acctbal"])
        return pd.DataFrame(
            {
                "c_custkey": [int(cust["c_custkey"].iloc[0])],
                "n_orders": [int(len(orders))],
                "acctbal": [float(cust["c_acctbal"].max())],
            }
        )

    c = t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    return (
        c.groupBy("c_custkey")
        .cogroup(o.groupBy("o_custkey"))
        .applyInPandas(merge, schema="c_custkey long, n_orders long, acctbal double")
    )


@query(
    "b66_map_in_arrow",
    oracle="""
    SELECT vec_id,
           CAST(list_sum(list_transform(embedding,
                    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)
                         * CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)
           )) AS BIGINT) AS qnorm2
    FROM embeddings
    """,
    tags=("B61", "B66"),
)
def b66_map_in_arrow(spark, sf_dir):
    """mapInArrow: RecordBatch-in, RecordBatch-out — the lowest-overhead
    Python hook (no pandas conversion at all). Computes a quantized
    squared norm per row with vectorized numpy over the arrow buffers;
    integer domain keeps it exact for the oracle."""
    import numpy as np
    import pyarrow as pa

    def qnorm(batches):
        for batch in batches:
            vecs = batch.column("embedding")
            ids = batch.column("vec_id")
            out = []
            for i in range(len(batch)):
                v = np.asarray(vecs[i].as_py(), dtype=np.float64)
                q = np.floor(v * 1000).astype(np.int64)
                out.append(int((q * q).sum()))
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(out, pa.int64())], ["vec_id", "qnorm2"]
            )

    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return emb.mapInArrow(qnorm, schema="vec_id long, qnorm2 long")
