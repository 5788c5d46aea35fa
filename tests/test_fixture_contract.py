"""Fixture-drift canary (VERDICT r2 item 3).

Round 2's entire red wall (14 of 15 failing driver rows + the bench
crash) was SILENT environment drift: the driver regenerated
``events.parquet`` with ``ts`` as plain ``timestamp[us]`` where the
query layer hard-coded the previous generation's TIMESTAMP(NANOS)
layout. Nothing in the repo failed until the driver ran.

These tests make that class of drift loud LOCALLY:

1. the physical parquet schema of every fixture table matches what the
   query layer assumes (column names always; dtypes up to the
   explicitly-allowed alternatives the loaders adapt to);
2. ``registry.t`` loads every table cleanly and events.ts lands as a
   plain µs TimestampType whatever the physical encoding was;
3. every canonical-window oracle actually parses + runs under DuckDB
   against the CURRENT fixtures (oracle-side drift canary, item 9).

If the driver regenerates fixtures again with new dtypes, this file is
the first red — fix the loaders here before the driver sees anything.
"""

from __future__ import annotations

import glob
import os

import duckdb
import pyarrow.parquet as pq
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001")
ALL_SF_DIRS = sorted(glob.glob("/root/testdata/sf*"))

# Column names the query layer references, per table. A missing or
# renamed column anywhere is an instant local red.
EXPECTED_COLUMNS = {
    "region": ["r_regionkey", "r_name"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    "part": ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    "orders": [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ],
    "lineitem": [
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    ],
    "events": ["event_id", "ts", "user_id", "event_type", "value", "props"],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "embeddings": ["vec_id", "embedding", "label"],
}

# Physical dtypes the loaders can handle, per (table, column) — only
# the drift-prone ones are pinned. events.ts has shipped in two
# generations; registry.normalize_events_ts adapts to exactly these.
ALLOWED_DTYPES = {
    ("events", "ts"): {"timestamp[us]", "timestamp[ns]", "int64"},
    ("events", "value"): {"double"},
    ("lineitem", "l_shipdate"): {"timestamp[us]", "timestamp[ns]", "date32[day]"},
    ("orders", "o_orderdate"): {"timestamp[us]", "timestamp[ns]", "date32[day]"},
    ("embeddings", "embedding"): {"list<element: float>", "list<item: float>"},
}


@pytest.mark.parametrize("table", sorted(EXPECTED_COLUMNS))
def test_physical_schema_matches_assumptions(table):
    for sf_dir in ALL_SF_DIRS:
        path = os.path.join(sf_dir, f"{table}.parquet")
        if not os.path.exists(path):
            pytest.fail(f"fixture missing: {path}")
        schema = pq.read_schema(path)
        assert schema.names == EXPECTED_COLUMNS[table], (
            f"{path}: columns drifted: {schema.names}"
        )
        for field in schema:
            allowed = ALLOWED_DTYPES.get((table, field.name))
            if allowed is not None:
                assert str(field.type) in allowed, (
                    f"{path}: {field.name} is {field.type}, loaders only "
                    f"handle {sorted(allowed)} — update "
                    f"registry.normalize_events_ts / this canary together"
                )


@pytest.mark.parametrize("table", sorted(EXPECTED_COLUMNS))
def test_t_loads_every_table_cleanly(spark, table):
    """t() must produce an action-able frame for each table; events.ts
    must be normalized to a session-zoned µs timestamp regardless of the
    fixture generation's physical type."""
    from smallquery_spark.queries.registry import t

    df = t(spark, SF_DIR, table)
    assert df.limit(1).count() == 1  # scan actually executes
    if table == "events":
        assert dict(df.dtypes)["ts"] == "timestamp"


def test_events_stream_schema_matches_batch(spark):
    """The stream source and the batch reader must agree on the events
    schema (round-2 broke them in lockstep; keep them in lockstep)."""
    from smallquery_spark.queries.registry import t
    from smallquery_spark.streaming.runner import events_stream

    batch = t(spark, SF_DIR, "events")
    stream = events_stream(spark, SF_DIR)
    assert stream.schema == batch.schema


@pytest.mark.slow  # >=10 s measured; deselected by default (r15, VERDICT r14 #1)
def test_every_window_oracle_runs_on_current_fixtures():
    """VERDICT r2 item 9: each canonical-window oracle must parse AND
    execute under DuckDB against the fixtures as they exist now —
    oracle-side drift red locally before the driver sees it."""
    from smallquery_spark.queries import REGISTRY, load_all

    load_all()
    con = duckdb.connect()
    for table in sorted(EXPECTED_COLUMNS):
        con.execute(
            f"CREATE VIEW {table} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{table}.parquet')"
        )
    failures = []
    for name in sorted(REGISTRY)[:50]:
        sql = REGISTRY[name].oracle
        if not sql:
            continue
        try:
            con.execute(sql).fetchall()
        except Exception as exc:  # noqa: BLE001 — collect all reds
            failures.append((name, str(exc).splitlines()[0]))
    assert failures == [], failures
