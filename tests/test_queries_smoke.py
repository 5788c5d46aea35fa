"""t1 smoke: every registered query runs on sf0.001 without error
(SURVEY.md §5.2 item 1)."""

from __future__ import annotations

import pytest

from smallquery_spark.queries import REGISTRY, load_all
from tests.conftest import SF_SMOKE

load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_smoke(name, spark):
    qd = REGISTRY[name]
    df = qd.fn(spark, SF_SMOKE)
    rows = df.limit(5).collect()
    assert df.columns  # stable schema
    assert rows is not None
