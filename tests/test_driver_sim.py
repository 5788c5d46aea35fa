"""Driver-session drift canary (`pytest -m driver`).

Replays the driver's canonical ~50-query window on a session built with
DRIVER defaults (Spark 4 ANSI ON, no repo confs) — the exact gap that
produced round 2's red wall. Run this after any change to session
confs, `registry.ensure_driver_confs`, or the canonical window, so
ANSI/UTC/Arrow drift is caught locally instead of by the next round's
grading driver. Deselected from the default suite (pytest.ini addopts):
it needs a session with different confs than the suite fixture's, which
would collide inside one JVM, and it adds minutes of wall time.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.driver

SF = "/root/testdata/sf0.001"


def test_window_green_on_driver_default_session():
    from tools.driver_sim import build_driver_session, run_window

    spark = build_driver_session()
    try:
        fails = run_window(spark, SF)
        assert not fails, f"window reds under driver-default session: {fails}"
    finally:
        spark.stop()
