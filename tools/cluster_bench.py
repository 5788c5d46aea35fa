"""Executor-boundary experiment: the same queries under local[N] vs
Spark's local-cluster master.

WHY (VERDICT r5 item 1): every number this repo has committed is one
JVM. The gen100 analysis attributes q5/q6/b53's super-linear fourth
decade to single-machine disk/page-cache terms that "a cluster
spreads" — argued and probe-supported (SCANFLOOR_*.json) but never
measured across a real executor boundary. ``local-cluster[n,c,mem]``
spawns n REAL Worker JVMs from the shipped jars: serialized
netty-path shuffle, per-executor heaps, separate Python worker pools —
everything a multi-node cluster has except separate machines (the
physical disks and the OS page cache are still shared, so this
isolates the EXECUTION-boundary term, not the disk-bandwidth term;
the JSON says so).

Protocol: one fresh subprocess per condition (master choice is
JVM-lifetime), two runs per query within the warm session — run1
carries cold-JVM/codegen bias, run2 is the warm number; both are
recorded because the warm-vs-cold split is exactly what the shuffle
-residency argument needs.

Usage:
    python -m tools.cluster_bench SF_DIR --queries q5,q6 \
        --conditions local32=local[32]/8g lc4x8=local-cluster[4,8,8192]/8g \
        [--out OUT.json]

Condition syntax: ``label=master/driver_mem``.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _inner(
    sf_dir: str, names: list[str], n_runs: int = 2, gap_sec: float = 0.0
) -> None:
    from smallquery_spark.queries import REGISTRY, load_all
    from smallquery_spark.session import get_session

    load_all()
    spark = get_session("smallquery-cluster-bench")
    spark.range(1_000_000).selectExpr("id % 97 as k").groupBy(
        "k"
    ).count().count()  # warm executors + python workers before timing
    out: dict[str, dict] = {}
    for name in names:
        qd = REGISTRY[name]
        runs = []
        for r in range(n_runs):
            # gap_sec > the state-store maintenance interval (60 s
            # default) lets executors UNLOAD the previous run's
            # deactivated state-store providers before the next run —
            # the lever that separates "stale state maps crowd the
            # heap" from genuine run-to-run variance (the b53 lc run2
            # anomaly, CLUSTER_gen100.json)
            if r > 0 and gap_sec > 0:
                time.sleep(gap_sec)
            t0 = time.time()
            qd.fn(spark, sf_dir).count()
            runs.append(round(time.time() - t0, 3))
        out[name] = {
            **{f"run{i + 1}": w for i, w in enumerate(runs)},
            "min": min(runs),
        }
        print(f"  {name}: {runs}", file=sys.stderr, flush=True)
    print(json.dumps(out))


def main() -> None:
    argv = sys.argv[1:]
    if argv and argv[0] == "--inner":
        n_runs = int(argv[3]) if len(argv) > 3 else 2
        gap = float(argv[4]) if len(argv) > 4 else 0.0
        _inner(argv[1], argv[2].split(","), n_runs, gap)
        return

    usage = (
        "usage: python -m tools.cluster_bench SF_DIR --queries a,b"
        " --conditions label=master/mem ... [--out OUT.json]"
    )
    if not argv:
        raise SystemExit(usage)
    sf_dir = argv[0]
    queries: list[str] = []
    conditions: list[tuple[str, str, str]] = []
    out_path = None
    n_runs, gap_sec = 2, 0.0
    i = 1
    while i < len(argv):
        a = argv[i]
        if a == "--queries":
            queries = argv[i + 1].split(",")
            i += 2
        elif a == "--out":
            out_path = argv[i + 1]
            i += 2
        elif a == "--runs":
            n_runs = int(argv[i + 1])
            i += 2
        elif a == "--gap-sec":
            gap_sec = float(argv[i + 1])
            i += 2
        elif a == "--conditions":
            i += 1
            while i < len(argv) and not argv[i].startswith("--"):
                label, spec = argv[i].split("=", 1)
                master, mem = spec.rsplit("/", 1)
                conditions.append((label, master, mem))
                i += 1
        else:
            raise SystemExit(usage)
    if not queries or not conditions:
        raise SystemExit(usage)

    results: dict[str, dict] = {}
    for label, master, mem in conditions:
        print(f"== {label}: {master} driver_mem={mem}", file=sys.stderr)
        env = {
            **os.environ,
            "SPARK_GRAFT_MASTER": master,
            "SPARK_GRAFT_DRIVER_MEM": mem,
        }
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-m", "tools.cluster_bench", "--inner",
             sf_dir, ",".join(queries), str(n_runs), str(gap_sec)],
            env=env,
            capture_output=True,
            text=True,
            timeout=5400,
        )
        if proc.returncode != 0:
            results[label] = {
                "error": proc.stderr[-2000:],
                "master": master,
            }
            print(proc.stderr[-2000:], file=sys.stderr)
            continue
        payload = json.loads(proc.stdout.strip().splitlines()[-1])
        results[label] = {
            "master": master,
            "driver_mem": mem,
            "wall_total": round(time.time() - t0, 1),
            "queries": payload,
        }
        print(f"   condition wall: {results[label]['wall_total']}s",
              file=sys.stderr)

    base_label = conditions[0][0]
    deltas = {}
    base = results.get(base_label, {}).get("queries")
    if base:
        for label, _m, _mem in conditions[1:]:
            q = results.get(label, {}).get("queries")
            if not q:
                continue
            deltas[label] = {
                n: {
                    "run2_ratio_vs_" + base_label: (
                        round(q[n]["run2"] / base[n]["run2"], 2)
                        if base[n]["run2"] > 0 else None
                    )
                }
                for n in q
            }
    result = {
        "sf_dir": sf_dir,
        "note": (
            "local-cluster isolates the executor/serialized-shuffle"
            " boundary only: disks and OS page cache are still shared"
            " with local[N] on this single machine"
        ),
        "conditions": results,
        "run2_ratios": deltas,
    }
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()


# Reference grounding: the reference repo publishes no performance
# numbers (README.md:1-13); these experiments exist to defend THIS
# repo's own scale claims, per VERDICT r5 item 1.
