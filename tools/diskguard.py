"""Disk-budget preflight for scale harnesses (VERDICT r6 item 5).

Two r6 scale runs died on "No space left on device" mid-measurement
(the 5M streaming-ingest curve at epoch 4; a gen100 run with fixtures
co-resident): the box has one filesystem shared by fixtures, the Spark
warehouse, shuffle/spill dirs under /tmp, and checkpoints. A run that
cannot fit should refuse to start — not die an hour in with a
half-written artifact.

`preflight(required_gb)`:
- reports free space plus the current footprint of the known consumers
  (.fixtures, spark-warehouse, smallquery_* temp dirs, Spark's own
  blockmgr-*/spark-* scratch),
- evicts stale digest-named warehouse artifacts (`bkt_*` bucketed
  copies, `ndx_*` near-dup index tables left by crashed runs) and
  stale smallquery temp dirs,
- raises RuntimeError if free space after eviction is still below the
  requested budget.

Usage (library):   from tools.diskguard import preflight; preflight(30)
Usage (CLI):       python -m tools.diskguard [required_gb]
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# digest-named warehouse artifacts safe to evict when stale: bucketed
# table copies (operators/bucketing.py) and near-dup index tables
# (operators/neardup_index.py) — both are derived, content-addressed
# or per-run, and rebuilt on demand
_EVICTABLE_WAREHOUSE = re.compile(r"^(bkt_[0-9a-f]{12}_\d+|ndx_.+)$")


def _du(path: str) -> int:
    total = 0
    for dirpath, _dirnames, filenames in os.walk(path, onerror=lambda e: None):
        for f in filenames:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def _owner_alive(name: str) -> bool:
    """True when the artifact's trailing ``_<pid>`` names a LIVE process.

    bkt_* tables are content-addressed and written ONCE (their mtime
    never refreshes while a long measurement keeps reusing them), so an
    age test alone could delete a bucketed table out from under a >6h
    run launched by another preflighted tool. The canonical
    implementation (incl. the EPERM-means-alive rule, ADVICE r8) lives
    in queries/tmpdirs.owner_pid_alive so the engine's own warehouse
    pruners apply the identical policy; this delegates."""
    from smallquery_spark.queries.tmpdirs import owner_pid_alive

    return owner_pid_alive(name)


def _evict_stale(max_age_hours: float) -> list[str]:
    """Remove stale evictable artifacts; returns what was removed."""
    from smallquery_spark.queries.tmpdirs import prune_stale

    removed: list[str] = []
    cutoff = time.time() - max_age_hours * 3600.0
    wh = os.path.join(_REPO, "spark-warehouse")
    try:
        entries = os.listdir(wh)
    except OSError:
        entries = []
    for name in entries:
        if not _EVICTABLE_WAREHOUSE.match(name):
            continue
        if _owner_alive(name):
            continue  # owning process still running — not stale
        full = os.path.join(wh, name)
        try:
            if os.path.isdir(full) and os.path.getmtime(full) < cutoff:
                shutil.rmtree(full, ignore_errors=True)
                removed.append(full)
        except OSError:
            continue
    prune_stale("smallquery_", max_age_hours=max_age_hours)
    prune_stale("ndx_scratch_", max_age_hours=max_age_hours)
    return removed


def footprint() -> dict:
    """Current disk picture: free space + known consumers, in GB."""
    tmp = tempfile.gettempdir()
    usage = shutil.disk_usage(tmp)
    spark_scratch = 0
    try:
        for name in os.listdir(tmp):
            if name.startswith(("blockmgr-", "spark-", "smallquery_")):
                spark_scratch += _du(os.path.join(tmp, name))
    except OSError:
        pass
    gb = 1024**3
    return {
        "free_gb": round(usage.free / gb, 1),
        "total_gb": round(usage.total / gb, 1),
        "fixtures_gb": round(_du(os.path.join(_REPO, ".fixtures")) / gb, 1),
        "warehouse_gb": round(
            _du(os.path.join(_REPO, "spark-warehouse")) / gb, 1
        ),
        "tmp_spark_scratch_gb": round(spark_scratch / gb, 1),
    }


def preflight(
    required_gb: float, evict: bool = True, max_age_hours: float = 24.0
) -> dict:
    """Refuse to start a run that cannot fit.

    ``required_gb`` should budget the run's PEAK transient need —
    shuffle spill + checkpoints + staged slices — not its final
    artifact size. Callers print the returned dict so every committed
    measurement records the disk picture it ran under.
    """
    report = footprint()
    evicted: list[str] = []
    if evict and report["free_gb"] < required_gb * 1.5:
        evicted = _evict_stale(max_age_hours)
        report = footprint()
    report["required_gb"] = required_gb
    report["evicted"] = evicted
    if report["free_gb"] < required_gb:
        raise RuntimeError(
            f"diskguard: {report['free_gb']} GB free < {required_gb} GB "
            f"required — free space or shrink the run "
            f"(footprint: {json.dumps(report)})"
        )
    return report


def main() -> None:
    required = float(sys.argv[1]) if len(sys.argv) > 1 else 0.0
    print(json.dumps(preflight(required)))


if __name__ == "__main__":
    main()
