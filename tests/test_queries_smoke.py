"""t1 smoke: every registered query runs on sf0.001 without error
(SURVEY.md §5.2 item 1).

Marked ``slow`` as a FILE (r15, VERDICT r14 #1): the 296-query sweep
costs ~24 min and is redundant with ``python -m tools.check`` (the
driver-mirror oracle gate, which the driver itself re-runs every
round); the default pytest selection must finish inside the driver's
verify budget. Run it with the full suite: ``pytest -m "not driver"``.
"""

from __future__ import annotations

import pytest

from smallquery_spark.queries import REGISTRY, load_all
from tests.conftest import SF_SMOKE

load_all()

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_smoke(name, spark):
    qd = REGISTRY[name]
    df = qd.fn(spark, SF_SMOKE)
    rows = df.limit(5).collect()
    assert df.columns  # stable schema
    assert rows is not None
