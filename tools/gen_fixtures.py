"""Local fixture generator for scaling runs (sf1 and beyond).

The driver's own generator (TESTDATA.md, seed=42) only ships sf <= 0.1
and its code is not available, so scaling measurements use THIS
generator for BOTH ends of each ratio — e.g. gen0.1 vs gen1 — keeping
ratios apples-to-apples. Schemas, categorical domains, key ranges, and
value ranges mirror FIXTURES.md and were checked against the driver
parquet at sf0.01 (same columns/dtypes, same event_type / mktsegment /
priority / brand domains, same date spans), so every registered query
runs unmodified on generated dirs.

Usage:
    python -m tools.gen_fixtures 1 /root/repo/.fixtures/gen1
    python -m tools.gen_fixtures 0.1 /root/repo/.fixtures/gen0.1

Row counts scale linearly from the driver's observed counts:
  lineitem 6M/sf1, orders 1.5M, customer 150k, part 200k, supplier 10k,
  events 1M, documents 50k, embeddings 20k.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATIONS = [
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
    "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
    "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA",
    "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA", "UNITED KINGDOM",
    "UNITED STATES",
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "zh", "es", "de", "fr"]
LANG_W = [0.44, 0.15, 0.145, 0.14, 0.125]
PTYPES = [
    "ECONOMY ANODIZED", "LARGE BRUSHED", "MEDIUM POLISHED",
    "PROMO BURNISHED", "SMALL PLATED", "STANDARD TIN",
]
VOCAB = (
    "key agg row scan slow fast table value part hash the customer merge "
    "batch window spark order data column join small line query plan sort "
    "filter group shuffle stage task broadcast stream state event file "
    "read write schema null count distinct limit"
).split()

DAY_US = 86_400_000_000


def _ts_ms_days(rng, n, start_days, span_days):
    days = start_days + rng.integers(0, span_days, n)
    return (days.astype("int64") * DAY_US).astype("datetime64[us]")


def write(path, table):
    # Row-group sizing: Spark's scan parallelism is capped by row-group
    # count (byte-range splits only yield rows at row-group starts), so
    # a default single-row-group file serializes every scan onto one
    # task. ~64 groups per table keeps any local[N] fully fed while
    # staying far above the tiny-group regime that hurts compression.
    rg = min(1 << 20, max(4096, len(table) // 64))
    pq.write_table(table, path, compression="snappy", row_group_size=rg)


def gen(sf: float, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    n_users = max(int(15_000 * sf), 10)

    # region / nation (fixed)
    write(
        os.path.join(out, "region.parquet"),
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": REGIONS,
            }
        ),
    )
    write(
        os.path.join(out, "nation.parquet"),
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": NATIONS,
                "n_regionkey": pa.array(
                    [i % 5 for i in range(25)], pa.int32()
                ),
            }
        ),
    )

    write(
        os.path.join(out, "customer.parquet"),
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                "c_nationkey": pa.array(
                    rng.integers(0, 25, n_cust), pa.int32()
                ),
                "c_acctbal": np.round(
                    rng.uniform(-999.99, 9999.99, n_cust), 2
                ),
                "c_mktsegment": pa.array(
                    np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]
                ),
            }
        ),
    )
    write(
        os.path.join(out, "supplier.parquet"),
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
                "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                "s_nationkey": pa.array(
                    rng.integers(0, 25, n_supp), pa.int32()
                ),
                "s_acctbal": np.round(
                    rng.uniform(-999.99, 9999.99, n_supp), 2
                ),
            }
        ),
    )
    brands = np.array([f"Brand#{i}" for i in range(1, 26)])
    ptypes = np.array(PTYPES)
    write(
        os.path.join(out, "part.parquet"),
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n_part), pa.int64()),
                "p_name": [f"part {i} {VOCAB[i % len(VOCAB)]}" for i in range(n_part)],
                "p_brand": pa.array(brands[rng.integers(0, 25, n_part)]),
                "p_type": pa.array(ptypes[rng.integers(0, len(PTYPES), n_part)]),
                "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
                "p_retailprice": np.round(rng.uniform(900.0, 2099.0, n_part), 2),
            }
        ),
    )

    # orders: 1995-01-01 .. 2001-08-01 (~2404 days), day granularity
    start_1995 = (np.datetime64("1995-01-01") - np.datetime64("1970-01-01")).astype(int)
    odate = _ts_ms_days(rng, n_ord, start_1995, 2404)
    write(
        os.path.join(out, "orders.parquet"),
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
                "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
                "o_orderstatus": pa.array(
                    np.array(STATUSES)[rng.choice(3, n_ord, p=[0.45, 0.45, 0.1])]
                ),
                "o_totalprice": np.round(rng.uniform(900.0, 500_000.0, n_ord), 2),
                "o_orderdate": pa.array(odate, pa.timestamp("us")),
                "o_orderpriority": pa.array(
                    np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]
                ),
            }
        ),
    )

    def _li_chunk(m: int) -> pa.Table:
        sdate = _ts_ms_days(rng, m, start_1995, 2404 + 120)
        return pa.table(
            {
                "l_orderkey": pa.array(rng.integers(0, n_ord, m), pa.int64()),
                "l_partkey": pa.array(rng.integers(0, n_part, m), pa.int64()),
                "l_suppkey": pa.array(rng.integers(0, n_supp, m), pa.int64()),
                "l_linenumber": pa.array(rng.integers(1, 8, m), pa.int32()),
                "l_quantity": rng.integers(1, 51, m).astype("float64"),
                "l_extendedprice": np.round(rng.uniform(901.0, 105_000.0, m), 2),
                "l_discount": np.round(rng.integers(0, 11, m) / 100.0, 2),
                "l_tax": np.round(rng.integers(0, 9, m) / 100.0, 2),
                "l_returnflag": pa.array(
                    np.array(["A", "N", "R"])[rng.integers(0, 3, m)]
                ),
                "l_linestatus": pa.array(
                    np.array(["F", "O"])[rng.integers(0, 2, m)]
                ),
                "l_shipdate": pa.array(sdate, pa.timestamp("us")),
            }
        )

    li_path = os.path.join(out, "lineitem.parquet")
    _LI_CHUNK = 100_000_000
    if n_li <= _LI_CHUNK:
        # single-shot path: byte-identical output to every previous
        # fixture generation at these scales (draw order unchanged —
        # sdate first, then the columns)
        sdate = _ts_ms_days(rng, n_li, start_1995, 2404 + 120)
        write(
            li_path,
            pa.table(
                {
                    "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
                    "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
                    "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
                    "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
                    "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
                    "l_extendedprice": np.round(rng.uniform(901.0, 105_000.0, n_li), 2),
                    "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
                    "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
                    "l_returnflag": pa.array(
                        np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]
                    ),
                    "l_linestatus": pa.array(
                        np.array(["F", "O"])[rng.integers(0, 2, n_li)]
                    ),
                    "l_shipdate": pa.array(sdate, pa.timestamp("us")),
                }
            ),
        )
    else:
        # streamed path for beyond-memory scales (sf100 lineitem is
        # ~600M rows ≈ 50+ GB of live arrays single-shot). Chunked
        # draws change the rng interleaving vs the single-shot path,
        # so this branch only engages at scales that never existed
        # single-shot; row-group sizing matches write()'s ~64-group
        # target against the FULL table so scan parallelism holds.
        rg = min(1 << 20, max(4096, n_li // 64))
        writer = None
        done = 0
        try:
            while done < n_li:
                tbl = _li_chunk(min(_LI_CHUNK, n_li - done))
                if writer is None:
                    writer = pq.ParquetWriter(
                        li_path, tbl.schema, compression="snappy"
                    )
                writer.write_table(tbl, row_group_size=rg)
                done += len(tbl)
        finally:
            if writer is not None:
                writer.close()

    # events: 30-day span from 2024-01-01, ordered ts with jitter
    span_us = 30 * DAY_US
    # datetime64[D] subtraction yields DAYS — scale by DAY_US (a prior
    # *1e6 treated it as seconds and landed every event in 1970, which
    # is how the gen-fixture check caught the s13 sign bug).
    base = (
        np.datetime64("2024-01-01") - np.datetime64("1970-01-01")
    ).astype(int) * DAY_US
    ts = base + np.sort(rng.integers(0, span_us, n_ev))
    ks = rng.integers(0, 100, n_ev)
    write(
        os.path.join(out, "events.parquet"),
        pa.table(
            {
                "event_id": pa.array(np.arange(n_ev), pa.int64()),
                "ts": pa.array(ts.astype("datetime64[us]"), pa.timestamp("us")),
                "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
                "event_type": pa.array(
                    np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]
                ),
                "value": np.round(rng.uniform(0.0, 100.0, n_ev), 2),
                "props": [f'{{"k": {k}}}' for k in ks],
            }
        ),
    )

    # documents: word-soup with ~8% near-duplicates (a few words changed)
    vocab = np.array(VOCAB)
    texts: list[str] = []
    for i in range(n_doc):
        if i % 13 == 12 and i > 0:
            # near-dup of the previous doc: perturb 2 words
            words = texts[-1].split()
            for j in rng.integers(0, len(words), 2):
                words[int(j)] = str(vocab[int(rng.integers(0, len(vocab)))])
            texts.append(" ".join(words))
        else:
            n_words = int(rng.integers(10, 100))
            texts.append(" ".join(vocab[rng.integers(0, len(vocab), n_words)]))
    langs = np.array(LANGS)[rng.choice(5, n_doc, p=LANG_W)]
    write(
        os.path.join(out, "documents.parquet"),
        pa.table(
            {
                "doc_id": pa.array(np.arange(n_doc), pa.int64()),
                "text": texts,
                "lang": pa.array(langs),
                "source": pa.array([f"src{i % 20}" for i in range(n_doc)]),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
    )

    # embeddings: 10 label clusters, unit-normalized 64-dim float32
    labels = rng.integers(0, 10, n_emb)
    centroids = rng.normal(0, 1, (10, 64))
    vecs = centroids[labels] + rng.normal(0, 0.6, (n_emb, 64))
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs.astype("float32")
    write(
        os.path.join(out, "embeddings.parquet"),
        pa.table(
            {
                "vec_id": pa.array(np.arange(n_emb), pa.int64()),
                "embedding": pa.array(
                    list(vecs), pa.list_(pa.float32())
                ),
                "label": pa.array(labels, pa.int32()),
            }
        ),
    )


if __name__ == "__main__":
    sf = float(sys.argv[1])
    out = sys.argv[2]
    gen(sf, out)
    print(f"generated sf={sf} at {out}")
