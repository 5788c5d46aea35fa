"""Scheme-aware filesystem operations for the maintenance control plane.

The maintenance ops (small-file compaction, index compact/swap,
fragmentation scans, atomic table overwrite) must run wherever the
warehouse actually lives. On this sandbox that is a local ``file://``
directory, but a 100 TB index lives on HDFS or an object store — and
``os.listdir`` / ``os.rename`` / ``shutil`` cannot even LIST those.
Every table-path operation therefore goes through the Hadoop
FileSystem API (reached over py4j via the driver JVM), resolved
per-URI from the session's ``hadoopConfiguration`` — so ``file://``,
``hdfs://`` and ``s3a://`` all take the same code path, and a bare
``/path`` resolves through ``fs.defaultFS`` exactly as Spark's own
readers do.

Rename semantics by scheme (the atomic-swap contract): on HDFS and
``file://`` a directory rename is one atomic metadata op — the swap
patterns (write aside, rename in, drop aside) are crash-safe there. On
S3A rename is a copy+delete, so the swap window is seconds, not
atomic; the crash-recovery halves of the swap protocols (restore the
``_old``/aside copy) still make the data safe, only the invisibility
of the transition is lost. All helpers RAISE when the JVM reports a
failed rename/delete instead of returning the JVM's boolean — a
silently failed rename mid-swap is how tables get lost.

Driver-side metadata only: no helper here ever reads data bytes; the
heaviest call is one recursive ``listFiles`` per maintenance decision,
bounded by the table's file count (which compaction itself keeps
bounded).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def join_uri(base: str, *parts: str) -> str:
    """Join path components onto a base path OR URI (string-level: both
    Hadoop Path and every Spark reader accept the result)."""
    out = base.rstrip("/")
    for p in parts:
        out += "/" + p.strip("/")
    return out


def table_location(spark: SparkSession, table: str) -> str:
    """The storage location URI of a catalog table (managed or
    external), via DESCRIBE FORMATTED — catalog-implementation-neutral
    and always scheme-qualified, unlike string-joining onto
    ``spark.sql.warehouse.dir`` (which breaks the moment a table was
    created with an explicit LOCATION)."""
    for row in spark.sql(f"DESCRIBE FORMATTED {table}").collect():
        if (row["col_name"] or "").strip() == "Location":
            return row["data_type"].strip()
    raise ValueError(f"table {table!r} has no Location in DESCRIBE FORMATTED")


class HadoopFS:
    """Thin wrapper over ``org.apache.hadoop.fs.FileSystem`` for one
    scheme+authority, resolved from a representative URI. Methods take
    plain string paths/URIs of the SAME filesystem."""

    def __init__(self, spark: SparkSession, uri: str) -> None:
        jvm = spark._jvm
        self._jvm = jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(uri).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )

    # -- predicates ------------------------------------------------------

    def exists(self, uri: str) -> bool:
        return bool(self._fs.exists(self._Path(uri)))

    def is_dir(self, uri: str) -> bool:
        p = self._Path(uri)
        return bool(self._fs.exists(p)) and bool(
            self._fs.getFileStatus(p).isDirectory()
        )

    # -- listing ---------------------------------------------------------

    def list_status(self, uri: str) -> list[dict]:
        """Immediate children as dicts: name, is_dir, size, mtime (epoch
        seconds). Empty list when the path does not exist (the common
        'nothing to maintain yet' case)."""
        p = self._Path(uri)
        if not self._fs.exists(p):
            return []
        out = []
        for st in self._fs.listStatus(p):
            out.append(
                {
                    "name": st.getPath().getName(),
                    "is_dir": bool(st.isDirectory()),
                    "size": int(st.getLen()),
                    "mtime": st.getModificationTime() / 1000.0,
                }
            )
        return out

    def list_names(self, uri: str) -> list[str]:
        return [st["name"] for st in self.list_status(uri)]

    def list_files_recursive(self, uri: str) -> list[tuple[str, int]]:
        """All files under ``uri`` as (full path string, size bytes).
        One Hadoop ``listFiles(recursive)`` call — on object stores this
        is a flat LIST, not a directory walk."""
        p = self._Path(uri)
        if not self._fs.exists(p):
            return []
        out = []
        it = self._fs.listFiles(p, True)
        while it.hasNext():
            st = it.next()
            out.append((st.getPath().toString(), int(st.getLen())))
        return out

    def qualified(self, uri: str) -> str:
        """``uri`` fully qualified through THIS filesystem (scheme +
        authority), trailing slash stripped — the base every
        relative-path test against ``list_files_recursive`` output must
        use (listed paths come back qualified; a bare-path base would
        fail the prefix strip and silently degrade the hidden-segment
        test to the full path, the parquet_stats bug class)."""
        return self._fs.makeQualified(self._Path(uri)).toString().rstrip("/")

    def parquet_stats(self, uri: str) -> tuple[int, int]:
        """(n_parquet_files, total_parquet_bytes) under ``uri``,
        recursive — the sizing input for compaction decisions. Skips
        hidden paths (any ``_``/``.``-prefixed segment BELOW ``uri``),
        mirroring Spark's own hiddenFileFilter, which is likewise
        relative to the listing root: files under e.g. an index's
        ``_meta`` sidecar are metadata, not scannable data, and must
        not count toward compaction/size decisions about the data.

        The hidden test is applied to the path RELATIVE to the queried
        base, not the full qualified path (ADVICE r10): a warehouse
        under a dot- or underscore-prefixed ANCESTOR (``~/.local/
        share/wh``, an ``/_staging`` mount) would otherwise match every
        file and silently report (0, 0) — compaction then no-ops and
        size contracts compare zeros. The base is qualified through the
        same FileSystem as the listing, so both sides carry the same
        scheme/authority and the prefix strip is exact (pinned with a
        dotted-ancestor warehouse in tests/test_operators_props.py).

        A listed path that does NOT share the qualified base prefix
        RAISES instead of silently degrading to the full-path test
        (ADVICE r11): if the listing's qualification ever diverges from
        ``makeQualified`` (federated/viewfs authority differences),
        every file under a hidden ancestor would quietly revert to the
        (0, 0) bug the relative test fixed — a qualification mismatch
        must surface, not resurrect it. The one legitimate non-prefixed
        listing is ``uri`` naming a FILE (the listing returns the file
        itself, path == base): counted, no hidden segments below the
        base by definition."""
        base = self.qualified(uri)
        n = total = 0
        for path, size in self.list_files_recursive(uri):
            if path.startswith(base + "/"):
                rel = path[len(base):]
            elif path == base:
                rel = ""
            else:
                raise IOError(
                    f"parquet_stats: listed path {path!r} does not share"
                    f" the qualified base prefix {base!r} — filesystem"
                    " qualification mismatch; refusing to guess which"
                    " segments are hidden"
                )
            if any(
                seg.startswith(("_", "."))
                for seg in rel.split("/")
                if seg
            ):
                continue
            if path.endswith(".parquet"):
                n += 1
                total += size
        return n, total

    # -- mutation --------------------------------------------------------

    def rename(self, src: str, dst: str) -> None:
        """Rename ``src`` to ``dst`` (dst must not exist — Hadoop's
        rename-into-existing-directory behavior differs by scheme, so
        the swap protocols always clear dst first). Raises on failure:
        the JVM reports some failures as a False return, and a silent
        False mid-swap loses tables."""
        if not self._fs.rename(self._Path(src), self._Path(dst)):
            raise IOError(f"hadoop fs rename failed: {src} -> {dst}")

    def delete(self, uri: str, recursive: bool = True) -> None:
        """Delete if present. Raises when the FS reports a failed
        delete of an EXISTING path; absent paths are a no-op."""
        p = self._Path(uri)
        if not self._fs.exists(p):
            return
        if not self._fs.delete(p, recursive):
            raise IOError(f"hadoop fs delete failed: {uri}")

    def mkdirs(self, uri: str) -> None:
        if not self._fs.mkdirs(self._Path(uri)):
            raise IOError(f"hadoop fs mkdirs failed: {uri}")

    # -- small control files ----------------------------------------------

    def write_text(self, uri: str, text: str) -> None:
        """Create/overwrite a small UTF-8 control file (stamp/marker —
        bytes are bounded by construction; this is NOT a data path)."""
        out = self._fs.create(self._Path(uri), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def create_text_exclusive(self, uri: str, text: str) -> bool:
        """Create a small UTF-8 control file ONLY if it does not already
        exist — ``FileSystem.create(path, overwrite=False)``, which is an
        atomic create-or-fail on HDFS and ``file://`` (the lease-acquire
        primitive: two racing writers cannot both win). Returns False
        when the path already exists; re-raises any other failure. On
        S3A the no-overwrite create is a HEAD-then-PUT, not atomic —
        the same consistency caveat every rename protocol here carries
        (module docstring)."""
        try:
            out = self._fs.create(self._Path(uri), False)
        except Exception:
            if self.exists(uri):
                return False
            raise
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        return True

    def touch(self, uri: str, mtime_s: float | None = None) -> bool:
        """Set a path's modification time (now by default) — the lease
        RENEWAL primitive. Returns False instead of raising when the
        scheme does not support setTimes (object stores): renewal is
        best-effort liveness signalling; the commit-point FENCE is what
        keeps an eviction safe, renewal only makes it unlikely."""
        import time as _time

        try:
            self._fs.setTimes(
                self._Path(uri),
                int((mtime_s if mtime_s is not None else _time.time()) * 1000),
                -1,
            )
            return True
        except Exception:
            return False

    def mtime(self, uri: str) -> float | None:
        """Modification time (epoch seconds) of a path, or None when it
        does not exist — the lease-staleness input."""
        p = self._Path(uri)
        if not self._fs.exists(p):
            return None
        return self._fs.getFileStatus(p).getModificationTime() / 1000.0

    def read_text(self, uri: str) -> str | None:
        """Contents of a small UTF-8 control file, or None when the
        file does not exist (the 'never stamped' case callers branch
        on)."""
        p = self._Path(uri)
        if not self._fs.exists(p):
            return None
        stream = self._fs.open(p)
        try:
            data = self._jvm.org.apache.commons.io.IOUtils.toByteArray(
                stream
            )
            return bytes(data).decode("utf-8")
        finally:
            stream.close()


def fs_for(spark: SparkSession, uri: str) -> HadoopFS:
    """FileSystem handle for the scheme+authority of ``uri``."""
    return HadoopFS(spark, uri)


# ---------------------------------------------------------------------------
# Maintenance lease: enforce the single-writer assumption every swap
# protocol here carries (retrain's directory swap, compaction's per-cell
# swaps, epoch appends' staged moves). Until r12 that assumption was
# PROSE — "maintenance is single-writer" in four docstrings; two
# concurrent writers would interleave renames whose crash recovery each
# presumes it is alone. The lease turns it into an enforced invariant:
# one owner file per protected directory, atomic create-no-overwrite as
# the acquire, typed IndexBusyError for the loser.
#
# Staleness (crash-orphaned leases must not brick the index):
# - same-host owner whose pid is dead -> stale (os.kill(pid, 0) via the
#   tmpdirs liveness rule: EPERM counts as ALIVE — an existing pid under
#   another user is exactly the live-writer case);
# - any owner whose lease mtime is older than ``stale_after`` seconds
#   -> stale. ``stale_after`` defaults from the documented env knob
#   ``SMALLQUERY_LEASE_STALE_AFTER_S`` (unset = no TTL — same-host
#   pid-liveness only). Cross-host liveness is unknowable from here,
#   so a multi-host deployment that wants a crashed remote driver's
#   lease to expire MUST set the knob — without it such a lease wedges
#   every retrain/compact/epoch-append on that index until manually
#   removed (ADVICE r12 low);
# - an UNPARSEABLE lease (torn create: the file exists but the JSON
#   write never landed) is stale once older than a 60 s grace — a live
#   writer's create+write+close is milliseconds apart, and without the
#   grace a torn lease would brick maintenance forever.
#
# TTL takeover is SAFE to enable (r13) because holders renew and fence:
# - RENEWAL: every protocol fences at its phase boundaries, and the
#   fence re-touches the lease mtime — a live holder mid-retrain keeps
#   its TTL from expiring (best-effort: schemes without setTimes skip
#   the touch; the fence below still keeps an eviction safe there).
# - FENCING: immediately before each COMMIT rename (retrain's directory
#   swap, compaction's and deletion's per-cell swaps, the epoch
#   append's file moves and marker write) the protocol re-reads the
#   lease and verifies it still carries ITS token, raising
#   LeaseLostError otherwise — an evicted-but-alive writer aborts
#   instead of executing destructive renames against a directory the
#   new owner believes it exclusively holds (VERDICT r12 #3). The
#   residual is the instant between the token re-read and the rename —
#   the same window every rename-based protocol here carries; size
#   your TTL in minutes, not milliseconds. Pick it LONGER than the
#   worst phase gap between two fences (a gen100 retrain stages for
#   ~minutes between acquire and its pre-swap fence —
#   RETRAIN_CYCLE_gen100.json measured 190 s of lease-held work).
#
# Takeover deletes the stale file and retries the atomic create: two
# racing takeovers both delete (one a no-op), exactly one create wins,
# the loser re-reads a LIVE lease and raises. Two-writer interleavings
# pinned in tests/test_pq.py; injected mid-protocol eviction (victim's
# commit refused, index intact) pinned there too.
#
# The lease file is a SIBLING of the protected directory
# (``<dir>.maint_lease``, beside ``.retrain_tmp``/``.compact_tmp``),
# NOT inside it: retrain's commit is a rename of the directory itself,
# and a lease inside would be renamed away mid-protocol — leaving the
# live path unguarded between the swap and the protocol's remaining
# cleanup/MSCK steps. Siblings survive every swap; drop_index sweeps
# them with the other scratch trees.
# ---------------------------------------------------------------------------

LEASE_SUFFIX = ".maint_lease"
_TORN_LEASE_GRACE_S = 60.0


def default_stale_after() -> float | None:
    """The deployment-level lease TTL from ``SMALLQUERY_LEASE_STALE_AFTER_S``
    (seconds), or None when unset — the no-TTL posture, right for
    single-host deployments where pid-liveness already covers crashes."""
    import os

    v = os.environ.get("SMALLQUERY_LEASE_STALE_AFTER_S")
    return float(v) if v else None


def lease_path(dir_uri: str) -> str:
    return dir_uri.rstrip("/") + LEASE_SUFFIX


def _lease_stale(
    fs: HadoopFS, lease_uri: str, stale_after: float | None
) -> bool:
    import json
    import socket

    from smallquery_spark.queries.tmpdirs import owner_pid_alive

    text = fs.read_text(lease_uri)
    if text is None:
        return True  # vanished between exists-check and read: retry create
    mt = fs.mtime(lease_uri)
    import time as _time

    age = (_time.time() - mt) if mt is not None else 0.0
    try:
        owner = json.loads(text)
        pid, host = int(owner["pid"]), str(owner["host"])
    except Exception:
        return age > _TORN_LEASE_GRACE_S
    if stale_after is not None and age > stale_after:
        return True
    if host == socket.gethostname():
        return not owner_pid_alive(f"x_{pid}")
    return False


def acquire_dir_lease(
    fs: HadoopFS,
    dir_uri: str,
    op: str,
    stale_after: float | None = None,
) -> str:
    """Acquire the maintenance lease on ``dir_uri`` for operation
    ``op``; returns the lease token (pass it to release_dir_lease).
    Raises IndexBusyError when another LIVE writer holds it.
    ``stale_after=None`` (the default) resolves the TTL from the
    ``SMALLQUERY_LEASE_STALE_AFTER_S`` env knob — see the module
    comment for why enabling it is safe (renewal + commit fencing)."""
    import json
    import os
    import socket
    import time
    import uuid

    from smallquery_spark.errors import IndexBusyError

    if stale_after is None:
        stale_after = default_stale_after()
    lease = lease_path(dir_uri)
    token = uuid.uuid4().hex
    body = json.dumps(
        {
            "pid": os.getpid(),
            "host": socket.gethostname(),
            "op": op,
            "token": token,
            "acquired_at": time.time(),
        }
    )
    for _ in range(5):
        if fs.create_text_exclusive(lease, body):
            return token
        if not _lease_stale(fs, lease, stale_after):
            text = fs.read_text(lease) or "<torn>"
            raise IndexBusyError(
                f"{op}: maintenance lease on {dir_uri} is held by a live"
                f" writer ({text}) — single-writer maintenance is enforced;"
                " wait for it (or remove the lease if the owner is known"
                " dead on another host)"
            )
        fs.delete(lease)  # stale: take over, then re-race the create
    raise IndexBusyError(
        f"{op}: could not acquire maintenance lease on {dir_uri} after"
        " repeated takeover races"
    )


def release_dir_lease(fs: HadoopFS, dir_uri: str, token: str) -> None:
    """Release a held lease. Only deletes when the lease file still
    carries OUR token — a TTL takeover that raced us must not have its
    (new, live) lease deleted by the evicted owner's exit path."""
    import json

    lease = lease_path(dir_uri)
    text = fs.read_text(lease)
    if text is None:
        return
    try:
        if json.loads(text).get("token") != token:
            return
    except Exception:
        return
    fs.delete(lease)


class dir_lease:
    """Context manager form: ``with dir_lease(fs, loc, "retrain") as l:
    ... l.fence("swap") ...``"""

    def __init__(
        self,
        fs: HadoopFS,
        dir_uri: str,
        op: str,
        stale_after: float | None = None,
    ) -> None:
        self._fs, self._dir, self._op = fs, dir_uri, op
        self._stale_after = stale_after
        self._token: str | None = None

    def __enter__(self) -> "dir_lease":
        self._token = acquire_dir_lease(
            self._fs, self._dir, self._op, self._stale_after
        )
        return self

    def __exit__(self, *exc) -> None:
        if self._token is not None:
            release_dir_lease(self._fs, self._dir, self._token)

    def fence(self, phase: str = "") -> None:
        """Commit-point fence + renewal, called by the owning protocol
        immediately before each destructive rename (and at phase
        boundaries): re-read the lease, verify it still carries OUR
        token — a TTL takeover that evicted us means the directory now
        belongs to someone else, and executing our remaining renames
        against it would interleave two writers' swap protocols
        (VERDICT r12 #3) — then re-touch the mtime so a live holder's
        TTL never expires mid-protocol. Raises LeaseLostError on
        eviction; the caller aborts (every protocol here is
        crash-recoverable, so an abort is just a crash the new owner's
        head recovery heals)."""
        import json

        from smallquery_spark.errors import LeaseLostError

        lease = lease_path(self._dir)
        text = self._fs.read_text(lease)
        held = False
        if text is not None:
            try:
                held = json.loads(text).get("token") == self._token
            except Exception:
                held = False
        if not held:
            raise LeaseLostError(
                f"{self._op}: lost the maintenance lease on {self._dir}"
                + (f" before {phase}" if phase else "")
                + f" (lease now reads {text!r}) — a TTL takeover evicted"
                " this writer; aborting before any further commit rename."
                " The protocol is crash-recoverable: the new owner's head"
                " recovery converges the directory"
            )
        self._fs.touch(lease)  # renewal (best-effort on object stores)
