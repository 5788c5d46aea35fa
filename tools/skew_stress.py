"""Skew stress harness (VERDICT r3 item 2).

Builds an adversarial fixture — one hot key holding ~15% of a 3M-row
fact — then measures, not argues:

1. **Shuffle partition-size distribution**, plain hash-partition on the
   join key vs salted (key, salt): max/mean/stddev rows per partition.
   This is the before/after picture of what a hot key does to one
   reducer and what salting does to it.
2. **Fact ⋈ keyed-table join wall time** with broadcast disabled (forcing
   the shuffled regime a 100 TB fact⋈fact join lives in):
   plain SMJ with AQE off, AQE skew-join on, and
   ``operators.skew.salted_join``. Row counts cross-checked equal.
3. **Grouped aggregation** plain vs ``salted_aggregate``. For algebraic
   aggs Spark's map-side partial combine already bounds the hot reducer
   (each map task emits one partial per key), so the deltas here are
   expected to be small — the distribution numbers in (1) are the
   evidence for the non-combinable cases (collect_list, exact distinct).

Usage: python -m tools.skew_stress [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from smallquery_spark.operators.skew import salted_aggregate, salted_join
from smallquery_spark.session import get_session

N_FACT = 3_000_000
N_KEYS = 200_000
HOT_FRAC = 0.15
SALT = 16
DATA_DIR = "/root/repo/.fixtures/skew"


def gen_data() -> None:
    os.makedirs(DATA_DIR, exist_ok=True)
    rng = np.random.default_rng(42)
    n_hot = int(N_FACT * HOT_FRAC)
    keys = np.concatenate(
        [np.zeros(n_hot, dtype="int64"), rng.integers(1, N_KEYS, N_FACT - n_hot)]
    )
    rng.shuffle(keys)
    pq.write_table(
        pa.table(
            {
                "k": pa.array(keys, pa.int64()),
                "v": np.round(rng.uniform(0, 1000, N_FACT), 2),
            }
        ),
        os.path.join(DATA_DIR, "fact.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "k": pa.array(np.arange(N_KEYS), pa.int64()),
                "attr": pa.array(
                    (np.arange(N_KEYS) % 7).astype("int64"), pa.int64()
                ),
            }
        ),
        os.path.join(DATA_DIR, "dim.parquet"),
    )


def partition_histogram(df, parts=32):
    rows = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .agg(
            F.max("count").alias("max"),
            F.avg("count").alias("mean"),
            F.stddev_pop("count").alias("stddev"),
            F.count("*").alias("nonempty_partitions"),
        )
        .collect()[0]
    )
    return {
        "max_rows": rows["max"],
        "mean_rows": round(rows["mean"], 1),
        "stddev_rows": round(rows["stddev"], 1),
        "nonempty_partitions": rows["nonempty_partitions"],
        "max_over_mean": round(rows["max"] / rows["mean"], 2),
    }


def timed(fn):
    t0 = time.time()
    n = fn()
    return round(time.time() - t0, 3), n


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    if not os.path.exists(os.path.join(DATA_DIR, "fact.parquet")):
        gen_data()
    spark = get_session("skew-stress")
    spark.range(1).count()
    fact = spark.read.parquet(os.path.join(DATA_DIR, "fact.parquet"))
    dim = spark.read.parquet(os.path.join(DATA_DIR, "dim.parquet"))
    result: dict = {
        "n_fact": N_FACT,
        "n_keys": N_KEYS,
        "hot_frac": HOT_FRAC,
        "salt_buckets": SALT,
    }

    # 1. partition distribution: plain key shuffle vs salted
    plain = fact.repartition(32, "k")
    salted = fact.withColumn(
        "__salt", (F.rand(seed=7) * SALT).cast("int")
    ).repartition(32, "k", "__salt")
    result["partition_dist_plain"] = partition_histogram(plain)
    result["partition_dist_salted"] = partition_histogram(salted)

    # 2. join: forced shuffle (no broadcast)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    join_counts = {}

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t, n = timed(lambda: fact.join(dim, "k").count())
    result["join_plain_aqe_off_sec"] = t
    join_counts["plain"] = n

    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # Fixture partitions are ~11 MB; lower the skew thresholds so AQE
    # sees the hot partition at this scale the way it would see a
    # multi-GB one at cluster scale (defaults: 5x median AND >=256MB).
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
    t, n = timed(lambda: fact.join(dim, "k").count())
    result["join_aqe_skew_sec"] = t
    join_counts["aqe"] = n

    t, n = timed(lambda: salted_join(fact, dim, ["k"], SALT).count())
    result["join_salted_sec"] = t
    join_counts["salted"] = n

    # restore
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    result["join_counts_equal"] = len(set(join_counts.values())) == 1
    result["join_rows"] = join_counts["plain"]

    # 3. grouped agg: plain vs salted two-phase
    t, n = timed(
        lambda: fact.groupBy("k").agg(F.sum("v").alias("sv")).count()
    )
    result["agg_plain_sec"] = t
    t, n2 = timed(
        lambda: salted_aggregate(fact, ["k"], {"sv": ("v", "sum")}, SALT).count()
    )
    result["agg_salted_sec"] = t
    result["agg_counts_equal"] = n == n2

    line = json.dumps(result, indent=2)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(json.dumps(result) + "\n")


if __name__ == "__main__":
    main()
