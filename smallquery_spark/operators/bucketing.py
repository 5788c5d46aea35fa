"""Bucketed co-located joins — shuffle-free fact⋈fact at scale.

The one join shape AQE cannot rescue at 100 TB is fact⋈fact on a high-
cardinality key (orders⋈lineitem on orderkey): both sides shuffle every
run. Bucketing pays that shuffle ONCE at write time: both tables are
written `bucketBy(n, key)` + `sortBy(key)` into the warehouse, and every
subsequent join on the key is a zero-Exchange sort-merge join (Spark
reads each bucket pair co-located).

Cluster posture: bucket count should be a multiple of total executor
cores and sized so one bucket of the bigger table fits in memory
(~100-500 MB of parquet per bucket); both tables MUST use the same
count. Spark's bucketing is hash(key) % n with its own Murmur3 hash —
both sides must be written by Spark (Hive-bucketed files don't match).

Reference grounding: the reference versions *transformations* over
datasets (/root/reference/README.md:7-8); a bucketed copy is exactly
such a derived, versioned artifact — pay-once layout for repeated query
workloads.
"""

from __future__ import annotations

import hashlib
import os
import re
import time
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession

from smallquery_spark.fsio import HadoopFS, fs_for, join_uri


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed managed table (overwrite).

    Pre-repartitioning by the bucket key onto ``n_buckets`` partitions
    gives exactly ONE file per bucket, so bucket-sorted reads skip the
    per-file merge sort as well as the exchange.
    """
    from pyspark.sql import functions as F

    df = df.repartition(n_buckets, F.col(key))
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def materialize_bucketed(
    spark: SparkSession,
    df: DataFrame,
    identity: str,
    key: str,
    n_buckets: int,
) -> str:
    """Content-addressed bucketed materialization — the pay-once layout
    as an ENGINE feature rather than a per-query hand-roll.

    ``identity`` names the logical content of ``df`` (e.g.
    ``workspace@commit:table`` from the versioned catalog, or
    ``path|mtime`` for a raw fixture): the managed table name is a
    digest of ``(identity, key, n_buckets)``, so a second call with the
    same content returns the EXISTING table without re-writing — the
    measured economics (ATREST_gen100.json: write cost amortizes after
    ~3.6 queries) only materialize if the layout is actually reused.

    The table name carries a pid suffix like every other warehouse
    scratch artifact: Spark's default in-memory metastore is
    per-process, so the bucket SPEC (which lives in the metastore, not
    the parquet footers) cannot be shared across processes anyway, and
    pid-suffixed locations keep two concurrent runs from racing
    rmtree+saveAsTable on one directory. On a cluster with a shared
    metastore the same digest-named table would be shared; the
    content-addressing is what makes that safe.

    Returns the managed table name (query it via ``spark.table`` /
    ``bucketed_join``).
    """
    from smallquery_spark.queries.tmpdirs import register_cleanup

    digest = hashlib.md5(
        f"{identity}|{key}|{n_buckets}".encode()
    ).hexdigest()[:12]
    tname = f"bkt_{digest}_{os.getpid()}"
    if spark.catalog.tableExists(tname):
        return tname
    # warehouse ops through the Hadoop FileSystem API (fsio): the same
    # code maintains a file://, hdfs:// or s3a:// warehouse
    wh_uri = spark.conf.get("spark.sql.warehouse.dir")
    fs = fs_for(spark, wh_uri)
    # a killed previous session may have left the managed location on
    # disk without a catalog entry — clear it or saveAsTable fails with
    # LOCATION_ALREADY_EXISTS
    fs.delete(join_uri(wh_uri, tname))
    write_bucketed(df, tname, key, n_buckets)
    # exit-time cleanup is a local-process affordance; only meaningful
    # (and only expressible as a path) when the warehouse is local
    parsed = urlparse(wh_uri)
    if parsed.scheme in ("", "file"):
        register_cleanup(os.path.join(parsed.path, tname))
    _prune_stale_bucketed(fs, wh_uri)
    return tname


def _prune_stale_bucketed(
    fs: HadoopFS, wh_uri: str, max_age_hours: float = 24.0
) -> None:
    """Scavenge digest-named bucketed-table dirs left by killed runs.

    LOCAL warehouses only, with a live-owner check: bkt_* tables are
    written once (mtime never refreshes while a long run reuses them),
    so the age test alone would evict a live >24h run's table — skip
    any whose pid suffix is a live process (owner_pid_alive, the
    diskguard rule). On a remote warehouse (hdfs://, s3a://) pid
    liveness is meaningless across machines — another driver's pid is
    invisible here — so pruning is not attempted at all; remote
    warehouse hygiene belongs to a real catalog/TTL policy."""
    from urllib.parse import urlparse

    from smallquery_spark.queries.tmpdirs import owner_pid_alive

    if urlparse(wh_uri).scheme not in ("", "file"):
        return
    cutoff = time.time() - max_age_hours * 3600.0
    for st in fs.list_status(wh_uri):
        if not re.match(r"bkt_[0-9a-f]{12}_\d+$", st["name"]):
            continue
        if owner_pid_alive(st["name"]):
            continue
        try:
            if st["is_dir"] and st["mtime"] < cutoff:
                fs.delete(join_uri(wh_uri, st["name"]))
        except OSError:
            continue


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key.

    With matching bucket specs the planner emits SortMergeJoin with NO
    Exchange on either side (asserted in tests/test_plans.py). Callers
    must keep `spark.sql.sources.bucketing.enabled=true` (default).
    """
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, on=key, how=how)
