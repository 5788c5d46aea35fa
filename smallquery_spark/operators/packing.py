"""Sequence packing — greedy fill of documents into fixed-budget packs.

The standard pretraining batch-construction step: concatenate documents
into training sequences of at most ``budget`` length units (tokens,
chars) without splitting documents, minimizing padding. Spark has no
native operator for order-dependent greedy accumulation with reset, so
this is the textbook ``applyInPandas`` case (SURVEY custom-operator
rule b): a deterministic sequential pass per shard.

Scale shape: documents hash into ``n_shards`` independent shards (one
shuffle); each shard packs sequentially in a single Arrow-batched pass.
At 100 TB you size ``n_shards`` so a shard's metadata (id + length, not
the text) fits an executor — packing decisions only need lengths, so
the wide text column should be dropped before calling this and joined
back by doc id afterwards. Determinism: shard = id % n_shards and
in-shard order by id, so output is reproducible run-to-run and
engine-to-engine (the DuckDB oracle replays the same greedy fold as a
recursive CTE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    len_col: str,
    budget: int,
    n_shards: int = 16,
) -> DataFrame:
    """Assign each row a ``(shard, pack_seq)`` pack id.

    Greedy first-fit in id order per shard: a document joins the current
    pack while the pack's fill stays <= budget, else it opens the next
    pack. A document longer than the budget gets a pack of its own
    (never dropped, never split).
    """
    import pandas as pd

    schema = f"shard long, {id_col} long, {len_col} long, pack_seq long"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        seqs = []
        seq, fill, first = 0, 0, True
        for length in pdf[len_col]:
            if first:
                seq, fill, first = 0, int(length), False
            elif fill + int(length) <= budget:
                fill += int(length)
            else:
                seq, fill = seq + 1, int(length)
            seqs.append(seq)
        out = pdf.assign(pack_seq=seqs)
        return out[["shard", id_col, len_col, "pack_seq"]]

    sharded = df.select(
        (F.col(id_col) % n_shards).cast("long").alias("shard"),
        F.col(id_col).cast("long").alias(id_col),
        F.col(len_col).cast("long").alias(len_col),
    )
    return sharded.groupBy("shard").applyInPandas(pack, schema=schema)
