"""Query registry — the correctness surface of the engine.

Every operator from SURVEY.md §2 registers here as a named query: a
Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) the equivalent DuckDB oracle SQL. ``__spark_entry__.py``
exposes the registry to the driver, which runs both sides at sf0.01 and
compares row-count + schema + order-insensitive value-hash.

Conventions (see FIXTURES.md "Harness conventions"):
- every computed column is aliased IDENTICALLY in Spark and SQL;
- no raw array/map/struct columns in results (stringified instead) so
  value hashing is engine-independent;
- orderings used inside window functions are made total with unique
  tie-break keys, so results are deterministic on both engines.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None for non-SQL-expressible ops
    tags: tuple[str, ...] = ()


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a query implementation."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Load one fixture table (parquet scan — SURVEY B2).

    ``events.ts`` is TIMESTAMP(NANOS) parquet, which Spark 4 refuses by
    default; we read it as a nanos-since-epoch long
    (``spark.sql.legacy.parquet.nanosAsLong`` — runtime-settable, works
    on the driver's session too) and rebuild a microsecond TimestampType
    column with exact integer division (truncation, like Spark's own
    µs semantics). Queries must therefore never RETURN raw ``ts``
    values — the DuckDB oracle keeps full nanos (see tools/check notes).
    """
    # Defensive session conf: the harness may run queries on its own
    # session — timestamp results must be UTC to match the UTC-naive
    # DuckDB oracle (both runtime-settable).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if table == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))


def load_all() -> None:
    """Import every query module so REGISTRY is fully populated."""
    import smallquery_spark.queries.relational  # noqa: F401
    import smallquery_spark.queries.aggregates  # noqa: F401
    import smallquery_spark.queries.joins  # noqa: F401
    import smallquery_spark.queries.windows  # noqa: F401
    import smallquery_spark.queries.scalar_functions  # noqa: F401
    import smallquery_spark.queries.setops  # noqa: F401
    import smallquery_spark.queries.udfs  # noqa: F401
    import smallquery_spark.queries.tierc  # noqa: F401
    import smallquery_spark.queries.streaming_queries  # noqa: F401
    import smallquery_spark.queries.sources_sinks  # noqa: F401
    import smallquery_spark.queries.tpch  # noqa: F401
    import smallquery_spark.queries.sql_surface  # noqa: F401
    import smallquery_spark.queries.scale  # noqa: F401
    import smallquery_spark.queries.tpch_extra  # noqa: F401
    import smallquery_spark.queries.llm_extra  # noqa: F401

    # canonical driver-window block LAST: it aliases entries from every
    # module above (the a_* names sort first, so the driver's ~50-entry
    # correctness window covers one query per §2 operator family).
    import smallquery_spark.queries.canonical  # noqa: F401


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    load_all()
    return {name: qd.fn for name, qd in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    load_all()
    return {
        name: qd.oracle for name, qd in sorted(REGISTRY.items()) if qd.oracle
    }
