from smallquery_spark.queries.registry import (
    REGISTRY,
    QueryDef,
    load_all,
    oracle_sql,
    queries,
    query,
    t,
)

__all__ = [
    "REGISTRY",
    "QueryDef",
    "load_all",
    "oracle_sql",
    "queries",
    "query",
    "t",
]
