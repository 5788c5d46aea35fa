"""Lifecycle for per-run scratch dirs under the system temp dir.

Query implementations create pid-suffixed workdirs (rollup caches,
source/sink round-trip dirs, streaming checkpoints). Without cleanup
those accumulate one set per harness/pytest process forever. Two
defenses, both best-effort and crash-safe:

- ``register_cleanup(path)``: remove the dir at interpreter exit
  (atexit), so a normal run leaves nothing behind.
- ``prune_stale(prefix, ...)``: on module import of the query packages,
  sweep sibling ``smallquery_*`` dirs older than a day — catches dirs
  left by crashed/killed runs that never reached atexit.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import time

_registered: set[str] = set()


def register_cleanup(path: str) -> str:
    """Remove ``path`` recursively at interpreter exit (idempotent)."""
    if path not in _registered:
        _registered.add(path)
        atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


def prune_stale(prefix: str, max_age_hours: float = 24.0) -> None:
    """Delete temp dirs matching ``prefix*`` older than ``max_age_hours``.

    Age is judged by the dir's own mtime; a dir in active use by a
    live concurrent run is hours, not days, old. Errors are ignored —
    this is scavenging, not correctness.
    """
    base = tempfile.gettempdir()
    cutoff = time.time() - max_age_hours * 3600.0
    try:
        entries = os.listdir(base)
    except OSError:
        return
    for name in entries:
        if not name.startswith(prefix):
            continue
        full = os.path.join(base, name)
        try:
            if os.path.isdir(full) and os.path.getmtime(full) < cutoff:
                shutil.rmtree(full, ignore_errors=True)
        except OSError:
            continue
