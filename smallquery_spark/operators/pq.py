"""Product quantization over the at-rest IVF index (IVF-PQ).

Why this exists: the full-vector IVF index (similarity.materialize_ivf)
stores dim x 4 bytes per row, so a probe's cost — the bytes read from
the probed cell directories — is vector bytes. At 100 TB of embeddings
that IS the query cost. PQ (Jegou, Douze, Schmid — "Product
quantization for nearest neighbor search", TPAMI 2011; the Faiss
IVFPQ design) compresses each vector to ``m`` one-byte codes by
k-means-quantizing ``m`` subspaces of the RESIDUAL (vector minus its
cell centroid): measured at 2M x 64-dim (IVFPQ_gen100.json), the
code table is 19.3x smaller than the full-vector index at m=8 and
12.0x at m=16 as parquet bytes on disk, compounding with the cell
partition-pruning the IVF layout already does. Scoring is ADC
(asymmetric distance computation): the query stays full-precision, and
each candidate's approximate similarity is m table lookups into a
per-query lookup table (LUT) of subspace dot products. A bounded exact
rerank of the top ADC candidates restores recall.

Spark-first shape:

- **Training** is driver-side numpy over the SAME md5-thresholded
  bounded sample recipe the coarse quantizer uses
  (similarity.ivf_build_centroids) — Faiss likewise trains PQ on a
  sample. Codebooks are index METADATA: m x ksub x dsub floats
  (8 x 256 x 8 @ dim 64 = 64 KiB), driver-held, shipped in UDF
  closures like the centroid table.
- **Encoding** is one Arrow-vectorized projection (no shuffle) that
  composes with both materialize and append: the code table is
  cell-partitioned exactly like the full-vector index, so every probe
  partition-prunes identically.
- **ADC scoring** ships the query batch's LUT tensor
  (n_q x m x ksub float32 — search-batch-bounded, same boundedness as
  the probe IN-list collect in ivf_search_indexed) in a pandas-UDF
  closure: one numpy gather + sum per Arrow batch, no per-row Python.
  Cosine decomposes exactly over the residual: with unit-norm query q,
  cell centroid c and residual r = x - c,  q.x = q.c + q.r — the q.c
  offset comes from the (n_q x n_cells) centroid-similarity matrix and
  only q.r is quantized.
- **Rerank** collects the bounded top-R candidate id set (n_q x R) and
  pushes it into the full-vector corpus scan as an IN-filter (parquet
  row-group pruning; at 100 TB the corpus wants to be id-bucketed so
  the point lookups prune to buckets), then rescores with the exact
  Arrow pair cosine — the returned `cos` on the rerank path is exact,
  only the CANDIDATE SET is approximate.

Cosine geometry: vectors are L2-normalized before residual encoding
(queries likewise before LUT construction), so ADC inner product IS
cosine and rank order matches the exact scorer up to quantization
error.

What the measurement says about WHEN to use this
(IVFPQ_gen100.json at 2M x 64-dim; the numpy error-floor study in
SCALE.md): ADC's per-candidate score error is ~0.04 cosine at m=8,
so PQ ranking works exactly when true neighbors are separated by
MORE than that. Retrieval of genuinely-near items (the near-dup /
dedup shape: a planted sigma-0.02 perturbation sits a full gap above
the bulk) is the sweet spot — at m=16 the seed is retrieved at
rank 1 for EVERY query with no rerank at all (12.0x fewer bytes);
m=8 pushes to 19.3x and reads 0.92 with a x4 rerank. Ranking WITHIN
an undifferentiated noise cloud (this fixture's mode-mates are
spaced ~0.002 apart — tighter than any byte-bounded code can
resolve) is not: recall@10 degrades at any m and the full-vector
index is the right tool. Hence the measured default m=16. And the
win is AT-REST BYTES, not warm-box wall time: on this machine's
page-cached disk the ADC pass is mildly slower than the full-vector
probe (17.1s vs 12.5s at 2M) — the byte ratio pays off where reads
are the cost, i.e. the cold object store a 100 TB index lives on
(the same storage-tier dependence as the route cutoff in
ivf_search_indexed). State the regime, don't average over it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class PQCodebooks:
    """Trained PQ codebooks: ``books[j][b]`` is the ``dsub``-dim
    centroid of code ``b`` in subspace ``j``. Driver-held metadata
    (m x ksub x dsub float32), shipped to executors in UDF closures."""

    def __init__(self, books) -> None:
        import numpy as np

        b = np.asarray(books, dtype=np.float32)
        if b.ndim != 3:
            raise ValueError(f"codebooks must be (m, ksub, dsub), got {b.shape}")
        self.books = b

    @property
    def m(self) -> int:
        return self.books.shape[0]

    @property
    def ksub(self) -> int:
        return self.books.shape[1]

    @property
    def dsub(self) -> int:
        return self.books.shape[2]

    @property
    def dim(self) -> int:
        return self.m * self.dsub

    def code_bytes(self) -> int:
        """Stored bytes per vector (smallint codes in parquet dictionary-
        encode to ~1 byte at ksub<=256; the logical payload is m)."""
        return self.m


def _normalized(M, np):
    norms = np.linalg.norm(M, axis=1, keepdims=True)
    return M / np.where(norms == 0, 1.0, norms)


def pq_train(
    corpus: DataFrame,
    centroids: list[list[float]],
    m: int | None = None,
    nbits: int = 8,
    corpus_id: str = "c_id",
    vec_col: str = "vec",
    sample_size: int = 65536,
    iters: int = 8,
    seed: int = 42,
) -> PQCodebooks:
    """Train PQ codebooks on cell-RESIDUALS of a bounded deterministic
    sample (the md5-threshold recipe of ivf_build_centroids — one count
    + one sample_size-bounded collect, fine at 100 TB).

    Residual encoding (vs raw-vector encoding) is what makes m bytes
    enough: the coarse quantizer removes the between-cell variance, so
    the codebooks spend their 256 codes per subspace on the small
    WITHIN-cell spread. Per subspace: k-means++ init + Lloyd, dead
    codes reseeded to the farthest sample point (same recipe as the
    coarse trainer). Deterministic: md5-keyed sampling, seeded RNG per
    subspace. Raises when ``m`` does not divide the vector dim or the
    sample is empty; ``ksub`` clamps to the sample size when the corpus
    is smaller than 2**nbits (codes stay dense in [0, ksub)).

    ``m=None`` derives the measured default (IVFPQ_gen100.json,
    2M x 64-dim): the largest divisor of dim that is ≤ 16 — at dim 64
    that is m=16, the coarsest code that still retrieved every planted
    near-dup at rank 1 with NO rerank, at 12x fewer at-rest bytes;
    m=8 (19.3x) needs a x4 rerank and reads 0.92 on the same probe.
    Pass m=8 (or lower) when bytes dominate and a rerank pass is
    acceptable; an explicit m must divide dim."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    dim = C.shape[1]
    if m is None:
        m = next(d for d in range(min(16, dim), 0, -1) if dim % d == 0)
    if dim % m != 0:
        raise ValueError(f"m={m} must divide vector dim {dim}")
    n_total = corpus.count()
    if n_total == 0:
        raise ValueError("cannot train PQ codebooks on an empty corpus")
    frac = min(1.0, (4.0 * sample_size) / n_total)
    bucket = F.conv(
        F.substring(F.md5(F.col(corpus_id).cast("string")), 1, 6), 16, 10
    ).cast("bigint")
    rows = (
        corpus.filter(bucket < int(frac * (1 << 24)))
        .orderBy(bucket, F.col(corpus_id))
        .limit(sample_size)
        .select(vec_col)
        .collect()
    )
    X = np.array([[float(x) for x in r[0]] for r in rows], dtype=np.float64)
    X = _normalized(X, np)
    Cn = _normalized(C, np)
    # residuals vs the nearest (cosine) cell centroid — the same
    # assignment rule ivf_assign applies, so training and serving see
    # the same residual distribution
    assign = (X @ Cn.T).argmax(axis=1)
    R = (X - Cn[assign]).reshape(len(X), m, dim // m)

    ksub = min(1 << nbits, len(X))
    books = np.empty((m, ksub, dim // m), dtype=np.float64)
    for j in range(m):
        Xj = R[:, j, :]
        rng = np.random.RandomState(seed + j)
        cents = [Xj[int(rng.randint(len(Xj)))]]
        best_d2 = ((Xj - cents[0]) ** 2).sum(axis=1)
        for _ in range(1, ksub):
            total = best_d2.sum()
            if total <= 0:
                idx = int(rng.randint(len(Xj)))
            else:
                idx = int(rng.choice(len(Xj), p=best_d2 / total))
            cents.append(Xj[idx])
            best_d2 = np.minimum(best_d2, ((Xj - cents[-1]) ** 2).sum(axis=1))
        B = np.stack(cents)
        for _ in range(iters):
            d2 = (
                (Xj * Xj).sum(1, keepdims=True)
                - 2 * (Xj @ B.T)
                + (B * B).sum(1)[None, :]
            )
            a = d2.argmin(axis=1)
            far_order = np.argsort(-d2.min(axis=1))
            far_i = 0
            for b in range(ksub):
                members = Xj[a == b]
                if len(members):
                    B[b] = members.mean(axis=0)
                else:
                    B[b] = Xj[int(far_order[far_i])]
                    far_i += 1
        books[j] = B
    return PQCodebooks(books)


def _encode_udf(centroids, codebooks: PQCodebooks):
    """Arrow-vectorized (vec, cell) -> array<smallint> PQ codes.
    Centroids + codebooks ride the closure as numpy (index metadata);
    per batch: normalize, subtract the row's cell centroid, and argmin
    each subspace against its codebook — three matmuls per subspace."""
    import numpy as np
    import pandas as pd

    Cn = _normalized(np.asarray(centroids, dtype=np.float64), np)
    books = codebooks.books.astype(np.float64)
    m, dsub = codebooks.m, codebooks.dsub

    def encode(v, cell):
        X = _normalized(np.stack(v.to_numpy()).astype(np.float64), np)
        R = (X - Cn[cell.to_numpy().astype(np.int64)]).reshape(
            len(X), m, dsub
        )
        codes = np.empty((len(X), m), dtype=np.int16)
        for j in range(m):
            Xj = R[:, j, :]
            Bj = books[j]
            d2 = (
                (Xj * Xj).sum(1, keepdims=True)
                - 2 * (Xj @ Bj.T)
                + (Bj * Bj).sum(1)[None, :]
            )
            codes[:, j] = d2.argmin(axis=1).astype(np.int16)
        return pd.Series(list(codes))

    encode.__annotations__ = {
        "v": pd.Series,
        "cell": pd.Series,
        "return": pd.Series,
    }
    return F.pandas_udf(encode, "array<smallint>")


def pq_encode(
    assigned: DataFrame,
    centroids: list[list[float]],
    codebooks: PQCodebooks,
    vec_col: str = "vec",
    cell_col: str = "cell",
    code_col: str = "code",
) -> DataFrame:
    """Add the PQ ``code`` column to an ivf_assign output — a narrow
    partition-local projection (no shuffle), so it composes with both
    the initial materialize and every append batch."""
    return assigned.withColumn(
        code_col, _encode_udf(centroids, codebooks)(F.col(vec_col), F.col(cell_col))
    )


def materialize_ivfpq(
    spark,
    assigned: DataFrame,
    centroids: list[list[float]],
    codebooks: PQCodebooks,
    name: str,
    corpus_id: str = "c_id",
    vec_col: str = "vec",
) -> str:
    """Persist the PQ-coded corpus as a cell-partitioned table —
    (id, code) per row, the full vector DROPPED — and return the table
    name. Same directory-per-cell layout (and therefore the same
    partition-pruned probe IO) as materialize_ivf; the payload per row
    shrinks from dim x 4 vector bytes to m code bytes. Centroids and
    codebooks are caller-held index metadata, exactly as
    ivf_search_indexed takes ``centroids`` — persist them beside the
    table if the index must outlive the process."""
    tname = f"ivfpqx_{name}"
    spark.sql(f"DROP TABLE IF EXISTS {tname}")
    (
        pq_encode(assigned, centroids, codebooks, vec_col=vec_col)
        .select(corpus_id, "cell", "code")
        .repartition(F.col("cell"))
        .write.mode("overwrite")
        .partitionBy("cell")
        .saveAsTable(tname)
    )
    return tname


def append_ivfpq(
    spark,
    index_table: str,
    new_corpus: DataFrame,
    centroids: list[list[float]],
    codebooks: PQCodebooks,
    corpus_id: str = "c_id",
    vec_col: str = "vec",
) -> None:
    """Append new vectors to a materialized IVF-PQ index without a
    rewrite: assign to the frozen centroids, encode against the frozen
    codebooks, append into the matching cell partitions — the PQ
    analogue of similarity.append_ivf, and the same parity argument:
    codes are a pure function of (vector, centroids, codebooks), so the
    appended index holds exactly the rows a full rebuild over the
    unioned corpus would (pinned in tests/test_pq.py). What appends
    degrade is quantizer fit, watched by the same two signals as the
    full-vector index (assignment_fit per batch for diffuse drift,
    ivf_retrain_trigger for concentrated skew — a retrain that replaces
    centroids must re-encode, i.e. re-materialize, since residuals
    move); file-count growth is bounded by the same
    compact_ivf_cells (the code table shares the cell= layout)."""
    from smallquery_spark.operators.similarity import ivf_assign

    assigned = ivf_assign(
        new_corpus, centroids, corpus_id=corpus_id, vec_col=vec_col
    )
    (
        pq_encode(assigned, centroids, codebooks, vec_col=vec_col)
        .select(corpus_id, "cell", "code")
        .repartition(F.col("cell"))
        .write.mode("append")
        .partitionBy("cell")
        .saveAsTable(index_table)
    )
    try:
        spark.catalog.refreshTable(index_table)
    except Exception:
        pass


def save_index_meta(
    spark,
    index_table: str,
    centroids: list[list[float]],
    codebooks: PQCodebooks | None = None,
) -> str:
    """Persist the quantizer metadata BESIDE the index it serves, as a
    tiny parquet table ``<index_table>_meta`` — one row per centroid
    (kind='centroid', pos=cell id) and, for PQ indexes, one row per
    (subspace, code) codebook entry (kind='book', pos=j*ksub+b). An
    at-rest index is not at rest if probing it needs Python lists the
    builder process happened to keep alive; with this, any session can
    :func:`load_index_meta` and serve probes. Overwrites any previous
    meta for the table (the meta must describe the CURRENT index — a
    retrain that re-materializes must re-save). Returns the meta table
    name."""
    import numpy as np

    tname = f"{index_table}_meta"
    C = np.asarray(centroids, dtype=np.float64)
    rows = [
        ("centroid", int(i), 0, [float(x) for x in C[i]])
        for i in range(len(C))
    ]
    if codebooks is not None:
        b64 = codebooks.books.astype(np.float64)
        for j in range(codebooks.m):
            for b in range(codebooks.ksub):
                rows.append(
                    ("book", j * codebooks.ksub + b, codebooks.ksub,
                     [float(x) for x in b64[j, b]])
                )
    spark.sql(f"DROP TABLE IF EXISTS {tname}")
    (
        spark.createDataFrame(
            rows, "kind string, pos int, ksub int, vec array<double>"
        )
        .coalesce(1)
        .write.mode("overwrite")
        .saveAsTable(tname)
    )
    return tname


def load_index_meta(
    spark, index_table: str
) -> tuple[list[list[float]], PQCodebooks | None]:
    """Load (centroids, codebooks-or-None) saved by
    :func:`save_index_meta` — bounded driver metadata (n_cells + m*ksub
    rows). Float64 end-to-end, so a probe served from loaded meta is
    bit-identical to one served from the builder's in-memory copies
    (pinned in tests/test_pq.py)."""
    import numpy as np

    rows = spark.table(f"{index_table}_meta").collect()
    cents = [
        [float(x) for x in r["vec"]]
        for r in sorted(
            (r for r in rows if r["kind"] == "centroid"),
            key=lambda r: r["pos"],
        )
    ]
    book_rows = sorted(
        (r for r in rows if r["kind"] == "book"), key=lambda r: r["pos"]
    )
    if not book_rows:
        return cents, None
    ksub = int(book_rows[0]["ksub"])
    flat = np.array([r["vec"] for r in book_rows], dtype=np.float64)
    books = flat.reshape(len(book_rows) // ksub, ksub, flat.shape[1])
    return cents, PQCodebooks(books)


def _adc_udf(q_index: dict, luts, offsets):
    """Arrow-vectorized ADC score: (q_id, cell, code) -> double.
    ``luts`` (n_q, m, ksub) and ``offsets`` (n_q, n_cells) are
    search-batch-bounded driver metadata riding the closure; per batch
    the score is one fancy-indexed gather + row sum — no per-row
    Python, no per-row LUT rebuild."""
    import numpy as np
    import pandas as pd

    m = luts.shape[1]

    def adc(q_id, cell, code):
        qi = q_id.map(q_index).to_numpy().astype(np.int64)
        cells = cell.to_numpy().astype(np.int64)
        codes = np.stack(code.to_numpy()).astype(np.int64)
        scores = offsets[qi, cells] + luts[
            qi[:, None], np.arange(m)[None, :], codes
        ].sum(axis=1)
        return pd.Series(scores.astype(np.float64))

    adc.__annotations__ = {
        "q_id": pd.Series,
        "cell": pd.Series,
        "code": pd.Series,
        "return": pd.Series,
    }
    return F.pandas_udf(adc, "double")


def ivfpq_search(
    spark,
    queries: DataFrame,
    index_table: str,
    centroids: list[list[float]],
    codebooks: PQCodebooks,
    k: int = 10,
    n_probe: int | None = None,
    rerank: int = 4,
    rerank_corpus: DataFrame | None = None,
    query_id: str = "q_id",
    corpus_id: str = "c_id",
    vec_col: str = "vec",
    n_corpus: int | None = None,
    route: str = "auto",
    prune_coverage_cutoff: float = 0.25,
) -> DataFrame:
    """ANN over a materialized IVF-PQ index: probe the ``n_probe``
    nearest cells (partition-pruned under the same measured route rule
    as ivf_search_indexed), ADC-score the probed cells' CODES, keep the
    top ``rerank * k`` per query, then exactly rescore that bounded
    candidate set against ``rerank_corpus`` (full vectors fetched via
    an id IN-filter — parquet row-group pruning — and the Arrow pair
    cosine). Returns (q_id, c_id, cos|adc, rnk).

    ``rerank_corpus=None`` returns the pure-ADC top k (score column
    ``adc``): the cheapest path, recall bounded by quantization error.
    With rerank, the returned ``cos`` is EXACT — only the candidate set
    is approximate; IVFPQ_gen100.json measures the recall gap of both
    against the full-vector index at 2M x 64-dim.

    The query batch is collected once to build LUTs (n_q x m x ksub
    floats) and centroid offsets (n_q x n_cells) — bounded by the
    search batch exactly like the probe-cell IN-list collect."""
    import numpy as np

    from smallquery_spark.operators.similarity import (
        _default_probe,
        _use_pruned_scan,
        ivf_probe_cells,
        pair_cosine_udf,
    )

    if route not in ("auto", "pruned", "full"):
        raise ValueError(f"unknown route {route!r}")
    if n_probe is None:
        n_probe = _default_probe(len(centroids), n_corpus)

    def _empty_result(score: str) -> DataFrame:
        # derive the empty-result schema from the ACTUAL id types (the
        # populated path inherits them from the inputs): with string or
        # int ids a hardcoded `long` would make the empty case union-
        # incompatible with the non-empty one (ADVICE r9)
        from pyspark.sql.types import (
            DoubleType,
            IntegerType,
            StructField,
            StructType,
        )

        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField(query_id, queries.schema[query_id].dataType),
                    StructField(
                        corpus_id,
                        spark.table(index_table).schema[corpus_id].dataType,
                    ),
                    StructField(score, DoubleType()),
                    StructField("rnk", IntegerType(), False),
                ]
            ),
        )

    qrows = queries.select(query_id, vec_col).collect()
    if not qrows:
        return _empty_result("adc" if rerank_corpus is None else "cos")
    q_ids = [r[0] for r in qrows]
    Q = _normalized(
        np.array([[float(x) for x in r[1]] for r in qrows], dtype=np.float64),
        np,
    )
    Cn = _normalized(np.asarray(centroids, dtype=np.float64), np)
    n_q, dim = Q.shape
    m, dsub = codebooks.m, codebooks.dsub
    # LUT[q, j, b] = q_j . books[j][b]; offsets[q, cell] = q . c_cell
    luts = np.einsum(
        "qjd,jbd->qjb", Q.reshape(n_q, m, dsub), codebooks.books.astype(np.float64)
    ).astype(np.float32)
    offsets = (Q @ Cn.T).astype(np.float32)
    q_index = {qid: i for i, qid in enumerate(q_ids)}

    probes = ivf_probe_cells(queries, centroids, n_probe, vec_col=vec_col)
    cells = [r["cell"] for r in probes.select("cell").distinct().collect()]
    prune = route == "pruned" or (
        route == "auto"
        and _use_pruned_scan(len(cells), len(centroids), prune_coverage_cutoff)
    )
    cand = spark.table(index_table)
    if prune:
        cand = cand.filter(F.col("cell").isin(cells))
    pairs = cand.join(
        F.broadcast(probes.select(query_id, "cell")), "cell"
    ).filter(F.col(query_id) != F.col(corpus_id))
    scored = pairs.withColumn(
        "adc", _adc_udf(q_index, luts, offsets)(query_id, "cell", "code")
    )
    w = Window.partitionBy(query_id).orderBy(F.col("adc").desc(), F.col(corpus_id))
    keep = k if rerank_corpus is None else max(k, rerank * k)
    top = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= keep)
        .select(query_id, corpus_id, "adc", "rnk")
    )
    if rerank_corpus is None:
        return top

    # bounded exact rerank: n_q x (rerank*k) candidate ids, pushed into
    # the full-vector scan as an IN-filter (row-group pruning; bucket
    # the corpus by id at scale so point fetches prune to buckets)
    cand_ids = [r[0] for r in top.select(corpus_id).distinct().collect()]
    if not cand_ids:  # empty index / all-filtered probe: nothing to rerank
        return _empty_result("cos")
    vecs = rerank_corpus.select(
        corpus_id, F.col(vec_col).alias("__cvec")
    ).filter(F.col(corpus_id).isin(cand_ids))
    qv = queries.select(query_id, F.col(vec_col).alias("__qvec"))
    rescored = (
        top.drop("rnk")
        .join(vecs, corpus_id)
        .join(F.broadcast(qv), query_id)
        .withColumn("cos", pair_cosine_udf()("__qvec", "__cvec"))
    )
    w2 = Window.partitionBy(query_id).orderBy(
        F.col("cos").desc(), F.col(corpus_id)
    )
    return (
        rescored.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= k)
        .select(query_id, corpus_id, "cos", "rnk")
    )
