"""Scalar function queries (SURVEY.md §2 B42-B49).

Known engine divergences handled here (SURVEY §7 step 3):
- DuckDB lacks ``initcap`` → oracle reconstructs it from split/upper;
- ``months_between`` (fractional, 31-day months) vs DuckDB
  ``date_diff('month', …)`` (boundary count) → compare on
  month-truncated dates where both are integer month counts;
- Spark ``log`` is natural log → DuckDB ``ln`` (DuckDB ``log`` is base-10);
- double→int CAST truncates in Spark but rounds in DuckDB → oracle uses
  ``trunc`` explicitly;
- engine-specific hashes (xxhash64, murmur) → validated-boolean pattern;
  md5/sha2-256 are standard and compared directly.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from smallquery_spark.queries.registry import query, t


# ---------------------------------------------------------------------------
# B42 — string functions
# ---------------------------------------------------------------------------


@query(
    "b42_string_basic",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS up,
           LOWER(p_brand) AS lo,
           LENGTH(p_name) AS len,
           TRIM('  ' || p_name || ' ') AS trimmed,
           SUBSTRING(p_name, 2, 4) AS sub,
           CONCAT(p_brand, ':', p_type) AS joined,
           CONCAT_WS('-', p_brand, p_type, CAST(p_size AS VARCHAR)) AS dashed,
           REPLACE(p_name, ' ', '_') AS underscored,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS padded,
           INSTR(p_name, 'e') AS epos
    FROM part
    """,
    tags=("B42",),
)
def b42_string_basic(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.length("p_name").alias("len"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.substring("p_name", 2, 4).alias("sub"),
        F.concat("p_brand", F.lit(":"), "p_type").alias("joined"),
        F.concat_ws(
            "-", "p_brand", "p_type", F.col("p_size").cast("string")
        ).alias("dashed"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("underscored"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded"),
        F.instr(F.col("p_name"), "e").alias("epos"),
    )


@query(
    "b42_string_regex_split",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS noun,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
           array_to_string(string_split(p_name, ' '), '|') AS words,
           string_split(p_name, ' ')[1] AS first_word
    FROM part
    """,
    tags=("B42",),
)
def b42_string_regex_split(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+) ([a-z]+)", 2).alias("noun"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
        F.array_join(F.split("p_name", " "), "|").alias("words"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
    )


@query(
    "b42_initcap",
    # DuckDB has no initcap; rebuild word-wise (fixture names are
    # single-space separated).
    oracle="""
    SELECT p_partkey,
           array_to_string(
             list_transform(string_split(p_name, ' '),
                            x -> upper(x[1]) || lower(x[2:])),
             ' ') AS title_name
    FROM part
    """,
    tags=("B42",),
)
def b42_initcap(spark, sf_dir):
    return t(spark, sf_dir, "part").select(
        "p_partkey", F.initcap("p_name").alias("title_name")
    )


# ---------------------------------------------------------------------------
# B43 — date/time functions
# ---------------------------------------------------------------------------


@query(
    "b43_date_parts",
    oracle="""
    SELECT o_orderkey,
           YEAR(o_orderdate) AS y,
           MONTH(o_orderdate) AS m,
           DAYOFMONTH(o_orderdate) AS d,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
           date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_start,
           CAST(epoch(o_orderdate) AS BIGINT) AS unix_sec,
           strftime(o_orderdate, '%Y-%m') AS ym
    FROM orders
    """,
    tags=("B43",),
)
def b43_date_parts(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).cast("bigint").alias("days_since_epoch_start"),
        F.unix_timestamp("o_orderdate").alias("unix_sec"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


@query(
    "b43_months_between",
    oracle="""
    SELECT o_orderkey,
           CAST(date_diff('month', date_trunc('month', TIMESTAMP '1995-01-01'),
                          date_trunc('month', o_orderdate)) AS DOUBLE) AS months_out
    FROM orders
    """,
    tags=("B43",),
)
def b43_months_between(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.months_between(
            F.date_trunc("month", "o_orderdate"),
            F.date_trunc("month", F.lit("1995-01-01").cast("timestamp")),
        ).alias("months_out"),
    )


@query(
    "b43_time_bucket",
    oracle="""
    SELECT time_bucket(INTERVAL 6 HOUR, ts) AS bucket_start,
           COUNT(*) AS n
    FROM events
    GROUP BY 1
    """,
    tags=("B43",),
)
def b43_time_bucket(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("bucket_start"), "n")
    )


# ---------------------------------------------------------------------------
# B44 — math functions
# ---------------------------------------------------------------------------


@query(
    "b44_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1) AS r1,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS fl,
           CAST(CEIL(l_discount * 100) AS BIGINT) AS ce,
           ABS(l_quantity - 25.0) AS ab,
           ROUND(POW(l_quantity, 2), 6) AS sq,
           ROUND(SQRT(l_extendedprice), 6) AS rt,
           ROUND(LN(l_extendedprice + 1), 6) AS lg,
           ROUND(EXP(l_discount), 6) AS ex,
           GREATEST(l_quantity, l_discount * 100) AS gr,
           LEAST(l_quantity, l_discount * 100) AS le,
           CAST(SIGN(l_quantity - 25.0) AS BIGINT) AS sg,
           CAST(l_orderkey % 7 AS BIGINT) AS md
    FROM lineitem
    WHERE l_orderkey <= 2000
    """,
    tags=("B44",),
)
def b44_math(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("r1"),
        F.floor("l_extendedprice").alias("fl"),
        F.ceil(F.col("l_discount") * 100).alias("ce"),
        F.abs(F.col("l_quantity") - 25.0).alias("ab"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("rt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("lg"),
        F.round(F.exp("l_discount"), 6).alias("ex"),
        F.greatest("l_quantity", F.col("l_discount") * 100).alias("gr"),
        F.least("l_quantity", F.col("l_discount") * 100).alias("le"),
        F.signum(F.col("l_quantity") - 25.0).cast("bigint").alias("sg"),
        (F.col("l_orderkey") % 7).alias("md"),
    )


# ---------------------------------------------------------------------------
# B45 — casts
# ---------------------------------------------------------------------------


@query(
    "b45_casts",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS INTEGER) AS as_int,
           CAST(o_orderkey AS DOUBLE) AS as_double,
           CAST(o_orderkey AS VARCHAR) AS as_str,
           CAST(TRUNC(o_totalprice) AS BIGINT) AS price_trunc,
           CAST(o_orderdate AS DATE) AS as_date,
           CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS round_trip,
           CAST(o_orderkey % 2 AS BOOLEAN) AS as_bool,
           TRY_CAST(o_orderstatus AS BIGINT) AS bad_cast
    FROM orders
    """,
    tags=("B45",),
)
def b45_casts(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("int").alias("as_int"),
        F.col("o_orderkey").cast("double").alias("as_double"),
        F.col("o_orderkey").cast("string").alias("as_str"),
        # Spark double→bigint truncates toward zero; DuckDB rounds — make
        # truncation explicit on the oracle side.
        F.col("o_totalprice").cast("bigint").alias("price_trunc"),
        F.col("o_orderdate").cast("date").alias("as_date"),
        F.col("o_orderkey").cast("string").cast("bigint").alias("round_trip"),
        (F.col("o_orderkey") % 2).cast("boolean").alias("as_bool"),
        F.col("o_orderstatus").cast("bigint").alias("bad_cast"),  # NULL (non-ANSI)
    )


# ---------------------------------------------------------------------------
# B46 — array functions (over embeddings + built arrays)
# ---------------------------------------------------------------------------


@query(
    "b46_array_basic",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_el,
           ROUND(CAST(embedding[64] AS DOUBLE), 6) AS last_el,
           ROUND(CAST(list_aggregate(embedding[1:8], 'sum') AS DOUBLE), 6) AS head_sum
    FROM embeddings
    WHERE vec_id <= 200
    """,
    tags=("B46",),
)
def b46_array_basic(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") <= 200)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_el"),
        F.round(F.element_at("embedding", 64).cast("double"), 6).alias("last_el"),
        F.round(
            F.aggregate(
                F.slice("embedding", 1, 8),
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double"),
            ),
            6,
        ).alias("head_sum"),
    )


@query(
    "b46_array_higher_order",
    oracle="""
    WITH a AS (
      SELECT n_nationkey, [n_nationkey, n_regionkey, n_nationkey + 10] AS arr
      FROM nation
    )
    SELECT n_nationkey,
           array_to_string(list_sort(arr), ',') AS sorted_arr,
           array_to_string(list_transform(arr, x -> x * 2), ',') AS doubled,
           COALESCE(array_to_string(list_filter(arr, x -> x % 2 = 0), ','), '') AS evens,
           list_contains(arr, 3) AS has3,
           len(list_distinct(arr)) AS n_uniq
    FROM a
    """,
    tags=("B46",),
)
def b46_array_higher_order(spark, sf_dir):
    n = t(spark, sf_dir, "nation").withColumn(
        "arr",
        F.array(
            F.col("n_nationkey"),
            F.col("n_regionkey"),
            F.col("n_nationkey") + 10,
        ),
    )
    return n.select(
        "n_nationkey",
        F.array_join(F.array_sort("arr"), ",").alias("sorted_arr"),
        F.array_join(F.transform("arr", lambda x: x * 2), ",").alias("doubled"),
        F.array_join(F.filter("arr", lambda x: x % 2 == 0), ",").alias("evens"),
        F.array_contains("arr", 3).alias("has3"),
        F.size(F.array_distinct("arr")).alias("n_uniq"),
    )


@query(
    "b46_explode",
    oracle="""
    SELECT n_nationkey, UNNEST(string_split(n_name, '')) AS ch
    FROM nation WHERE n_nationkey < 5
    """,
    tags=("B46",),
)
def b46_explode(spark, sf_dir):
    n = t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 5)
    return n.select(
        "n_nationkey", F.explode(F.split("n_name", "")).alias("ch")
    ).filter(F.col("ch") != "")


@query(
    "b46_posexplode",
    oracle="""
    SELECT n_nationkey,
           UNNEST(range(3)) + 1 AS pos,
           UNNEST([n_name, r_name, 'x']) AS val
    FROM (SELECT n.n_nationkey, n.n_name, r.r_name
          FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey)
    WHERE n_nationkey < 5
    """,
    tags=("B46",),
)
def b46_posexplode(spark, sf_dir):
    n = t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 5)
    r = t(spark, sf_dir, "region")
    j = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return j.select(
        "n_nationkey",
        F.posexplode(F.array("n_name", "r_name", F.lit("x"))).alias("pos0", "val"),
    ).select("n_nationkey", (F.col("pos0") + 1).alias("pos"), "val")


# ---------------------------------------------------------------------------
# B47 — map functions
# ---------------------------------------------------------------------------


@query(
    "b47_map_ops",
    oracle="""
    WITH m AS (
      SELECT n_nationkey,
             MAP {'nk': n_nationkey, 'rk': n_regionkey} AS props
      FROM nation
    )
    SELECT n_nationkey,
           array_to_string(map_keys(props), ',') AS ks,
           array_to_string(map_values(props), ',') AS vs,
           props['nk'][1] AS nk_val
    FROM m
    """,
    tags=("B47",),
)
def b47_map_ops(spark, sf_dir):
    n = t(spark, sf_dir, "nation").withColumn(
        "props",
        F.create_map(
            F.lit("nk"), F.col("n_nationkey"), F.lit("rk"), F.col("n_regionkey")
        ),
    )
    return n.select(
        "n_nationkey",
        F.array_join(F.map_keys("props"), ",").alias("ks"),
        F.array_join(
            F.transform(F.map_values("props"), lambda v: v.cast("string")), ","
        ).alias("vs"),
        F.element_at("props", "nk").alias("nk_val"),
    )


@query(
    "b47_map_explode",
    oracle="""
    WITH m AS (
      SELECT n_nationkey, MAP {'nk': n_nationkey, 'rk': n_regionkey} AS props
      FROM nation WHERE n_nationkey < 3
    )
    SELECT n_nationkey, UNNEST(map_keys(props)) AS k, UNNEST(map_values(props)) AS v
    FROM m
    """,
    tags=("B47",),
)
def b47_map_explode(spark, sf_dir):
    n = (
        t(spark, sf_dir, "nation")
        .filter(F.col("n_nationkey") < 3)
        .withColumn(
            "props",
            F.create_map(
                F.lit("nk"), F.col("n_nationkey"), F.lit("rk"), F.col("n_regionkey")
            ),
        )
    )
    return n.select("n_nationkey", F.explode("props").alias("k", "v"))


# ---------------------------------------------------------------------------
# B48 — JSON functions (events.props is a JSON string {"k": int})
# ---------------------------------------------------------------------------


@query(
    "b48_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_path,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_typed,
           json_extract_string(props, '$.k') AS k_str
    FROM events
    """,
    tags=("B48",),
)
def b48_json(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "j", F.from_json("props", T.StructType([T.StructField("k", T.IntegerType())]))
    )
    return parsed.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_path"),
        F.col("j.k").alias("k_typed"),
        F.get_json_object("props", "$.k").alias("k_str"),
    )


@query(
    "b48_to_json",
    oracle="""
    SELECT n_nationkey,
           to_json({'name': n_name, 'region': n_regionkey}) AS j
    FROM nation
    """,
    tags=("B48",),
)
def b48_to_json(spark, sf_dir):
    n = t(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.to_json(
            F.struct(
                F.col("n_name").alias("name"), F.col("n_regionkey").alias("region")
            )
        ).alias("j"),
    )


# ---------------------------------------------------------------------------
# B49 — hashing / id functions
# ---------------------------------------------------------------------------


@query(
    "b49_hash_standard",
    oracle="""
    SELECT n_nationkey,
           md5(n_name) AS h_md5,
           sha256(n_name) AS h_sha256
    FROM nation
    """,
    tags=("B49",),
)
def b49_hash_standard(spark, sf_dir):
    n = t(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.md5("n_name").alias("h_md5"),
        F.sha2("n_name", 256).alias("h_sha256"),
    )


@query(
    "b49_ids_validated",
    # Engine-specific: xxhash64/murmur values and generated ids can't be
    # oracled; validate their contracts instead (stability, uniqueness).
    oracle="SELECT TRUE AS hash_stable, TRUE AS ids_unique",
    tags=("B49",),
)
def b49_ids_validated(spark, sf_dir):
    n = t(spark, sf_dir, "nation").select(
        "n_nationkey",
        F.xxhash64("n_name").alias("h1"),
        F.hash("n_name").alias("h2"),
        F.monotonically_increasing_id().alias("mid"),
    )
    agg = n.agg(
        (F.countDistinct("h1") == F.countDistinct("n_nationkey")).alias("hs"),
        (F.countDistinct("mid") == F.count("*")).alias("iu"),
    )
    return agg.select(
        F.col("hs").alias("hash_stable"), F.col("iu").alias("ids_unique")
    )


@query(
    "b48_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod
    FROM events
    """,
    tags=("B48",),
)
def b48_variant(spark, sf_dir):
    """Spark 4 VARIANT: parse once into the binary semi-structured type,
    extract typed paths with variant_get — the open-schema column that
    scales past from_json's fixed StructType (no schema agreement needed
    across 100 TB of evolving payloads)."""
    ev = t(spark, sf_dir, "events").withColumn(
        "v", F.parse_json(F.col("props"))
    )
    k = F.variant_get(F.col("v"), "$.k", "bigint")
    return ev.select(
        "event_id",
        k.alias("k"),
        (k % 10).alias("k_mod"),
    )
