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
import re
import shutil
import tempfile
import time

_registered: set[str] = set()


def owner_pid_alive(name: str) -> bool:
    """True when the artifact name's trailing ``_<pid>`` names a LIVE
    process. Pid-suffixed scratch artifacts (``smallquery_rollups_<pid>``
    workdirs, ``bkt_<digest>_<pid>`` bucketed tables) are written ONCE
    and then reused — their mtime never refreshes — so an age test
    alone would evict them out from under a >24h run. EPERM from
    ``kill(pid, 0)`` means the pid EXISTS under another user: on a
    shared box that is exactly the live-run case the guard protects,
    so it counts as alive (the ADVICE-r8 diskguard rule; tools/
    diskguard delegates here). Names without a pid suffix return
    False — age is then the only signal."""
    m = re.search(r"_(\d+)$", name.rstrip("/"))
    if not m:
        return False
    pid = int(m.group(1))
    if pid <= 0 or pid > 2**31 - 1:
        # a numeric suffix outside the C pid_t range is not a pid at
        # all; os.kill would raise OverflowError, and the pruners call
        # this OUTSIDE their error-swallowing loops — one oddly named
        # dir must degrade to the age-only rule, not crash the
        # scavenger (ADVICE r9)
        return False
    try:
        os.kill(pid, 0)
        return True
    except PermissionError:
        return True
    except (ProcessLookupError, ValueError, OverflowError, OSError):
        return False


def register_cleanup(path: str) -> str:
    """Remove ``path`` recursively at interpreter exit (idempotent)."""
    if path not in _registered:
        _registered.add(path)
        atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


def prune_stale(prefix: str, max_age_hours: float = 24.0) -> None:
    """Delete temp dirs matching ``prefix*`` older than ``max_age_hours``,
    EXCEPT dirs whose trailing pid suffix names a live process (a
    written-once workdir's mtime never refreshes, so age alone would
    evict it from under a long-lived run — see owner_pid_alive).
    Errors are ignored — this is scavenging, not correctness.
    """
    base = tempfile.gettempdir()
    cutoff = time.time() - max_age_hours * 3600.0
    try:
        entries = os.listdir(base)
    except OSError:
        return
    for name in entries:
        if not name.startswith(prefix) or owner_pid_alive(name):
            continue
        full = os.path.join(base, name)
        try:
            if os.path.isdir(full) and os.path.getmtime(full) < cutoff:
                shutil.rmtree(full, ignore_errors=True)
        except OSError:
            continue
