"""Concurrency stress for the git catalog (SURVEY §7 hard-part 4).

N worker PROCESSES (separate interpreters — the per-Workspace
threading.Lock cannot help them) hammer one workspace through a shared
snapshot cache while the parent commits new versions to the same repo.
Asserted invariants:

- **no torn reads**: every read of a pinned commit returns exactly that
  commit's content (verified against ``git show <commit>:file``), even
  while a writer is moving HEAD;
- **no duplicate checkouts**: after the dust settles the cache holds
  exactly one snapshot directory per distinct commit and ZERO leftover
  ``*.tmp*`` extraction dirs;
- **cache consistency**: a snapshot dir, once visible under its commit
  id, is complete (readers never observe a half-extracted tree — the
  publish is an atomic rename).

This is the behavior the reference gets wrong: it materializes a fresh
temp dir per request and never cleans up (http_server.rs:125-134, TODO
at :133) — no sharing, unbounded disk. The content-addressed cache
shares correctly only if the cross-process publish race is handled;
round-4's per-path ``.tmp`` staging was NOT (two processes interleaving
``tar -x`` into one tmp dir, loser crashing on rename-onto-nonempty) —
this test is the regression pin for that fix.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import subprocess

import pytest


def _git(repo, *args) -> str:
    out = subprocess.run(
        ["git", "-C", str(repo), *args],
        check=True,
        capture_output=True,
        text=True,
        env={
            **os.environ,
            "GIT_AUTHOR_NAME": "t",
            "GIT_AUTHOR_EMAIL": "t@t",
            "GIT_COMMITTER_NAME": "t",
            "GIT_COMMITTER_EMAIL": "t@t",
        },
    )
    return out.stdout.strip()


def _reader(mount, cache_dir, pinned_commits, rounds, barrier, errors):
    """Worker process: per round, cold-materialize both pinned commits
    (all workers racing through one shared cache dir) and verify reads;
    also chase `latest` while the writer moves it."""
    # fresh import state per process — module-level caches can't hide races
    from smallquery_spark.catalog.workspace import VersionedCatalog

    try:
        for r in range(rounds):
            barrier.wait(timeout=60)  # all workers hit the cache together
            cat = VersionedCatalog(mount, cache_dir=os.path.join(cache_dir, str(r)))
            ws = cat.workspace("stress")
            for commit in pinned_commits:
                got = ws.read_file("data.txt", commit)
                want = _git(
                    os.path.join(mount, "stress"), "show", f"{commit}:data.txt"
                )
                if got.strip() != want.strip():
                    errors.put(
                        f"torn read at round {r}: commit {commit[:8]} gave "
                        f"{got!r}, git says {want!r}"
                    )
                    return
            # chase latest: whatever commit resolves, content must match it
            head = ws.resolve_version("latest")
            got = ws.read_file("data.txt", head)
            want = _git(os.path.join(mount, "stress"), "show", f"{head}:data.txt")
            if got.strip() != want.strip():
                errors.put(
                    f"latest-chase mismatch at round {r}: {head[:8]} gave "
                    f"{got!r}, git says {want!r}"
                )
                return
    except Exception as e:  # surfaced as a test failure, not a hang
        errors.put(f"worker crashed: {type(e).__name__}: {e}")


@pytest.mark.slow  # >=10 s measured; deselected by default (r15, VERDICT r14 #1)
def test_concurrent_snapshot_cache(tmp_path):
    mount = tmp_path / "workspaces"
    repo = mount / "stress"
    repo.mkdir(parents=True)
    _git(repo, "init", "-b", "main")
    # a few hundred files make the extraction window wide enough to race
    for i in range(200):
        (repo / f"f{i:03d}.txt").write_text(f"filler {i}\n" * 20)
    (repo / "data.txt").write_text("payload v1\n")
    _git(repo, "add", "-A")
    _git(repo, "commit", "-m", "v1")
    c1 = _git(repo, "rev-parse", "HEAD")
    (repo / "data.txt").write_text("payload v2\n")
    _git(repo, "add", "-A")
    _git(repo, "commit", "-m", "v2")
    c2 = _git(repo, "rev-parse", "HEAD")

    cache_dir = str(tmp_path / "cache")
    n_procs, rounds = 6, 5
    ctx = mp.get_context("spawn")  # never fork a JVM-attached interpreter
    barrier = ctx.Barrier(n_procs + 1)  # workers + the writer loop below
    errors = ctx.Queue()
    procs = [
        ctx.Process(
            target=_reader,
            args=(str(mount), cache_dir, [c1, c2], rounds, barrier, errors),
        )
        for _ in range(n_procs)
    ]
    for p in procs:
        p.start()
    # the writer: join each round's barrier, then immediately commit a
    # new version so `latest` moves WHILE workers resolve and read
    new_commits = []
    for r in range(rounds):
        barrier.wait(timeout=60)
        (repo / "data.txt").write_text(f"payload w{r}\n")
        _git(repo, "add", "-A")
        _git(repo, "commit", "-m", f"w{r}")
        new_commits.append(_git(repo, "rev-parse", "HEAD"))
    for p in procs:
        p.join(timeout=120)
        assert not p.is_alive(), "stress worker hung"
        assert p.exitcode == 0, f"stress worker exit code {p.exitcode}"

    msgs = []
    while not errors.empty():
        msgs.append(errors.get())
    assert not msgs, "\n".join(msgs)

    # cache audit: one dir per materialized commit, zero tmp leftovers
    known = {c1, c2, *new_commits}
    for r in range(rounds):
        ws_cache = os.path.join(cache_dir, str(r), "stress")
        if not os.path.isdir(ws_cache):
            continue
        entries = sorted(os.listdir(ws_cache))
        tmp_left = [e for e in entries if ".tmp" in e]
        assert not tmp_left, f"leftover extraction dirs in round {r}: {tmp_left}"
        assert len(entries) == len(set(entries))
        for e in entries:
            assert e in known, f"cache entry {e} is not a known commit"
            # completeness: the atomic publish means a visible snapshot
            # always holds the full 201-file tree
            n_files = sum(
                len(fs) for _, _, fs in os.walk(os.path.join(ws_cache, e))
            )
            assert n_files == 201, f"half-extracted snapshot {e}: {n_files} files"
