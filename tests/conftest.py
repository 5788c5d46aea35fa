from __future__ import annotations

import pytest

from smallquery_spark.session import get_session

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_session("smallquery-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    import os

    import duckdb

    from smallquery_spark.sources import TABLES

    con = duckdb.connect()
    for tbl in TABLES:
        p = os.path.join(SF_ORACLE, f"{tbl}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()
