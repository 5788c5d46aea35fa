"""Similarity search over embedding columns (SURVEY.md §2 C3).

Two tiers:

- ``knn_bruteforce`` — exact top-k: broadcast the (small) query set,
  score every candidate JVM-side with the deterministic vector folds,
  keep top-k per query with the same TakeOrdered-style window pattern
  as B34. O(|queries| · |corpus|) scoring but embarrassingly parallel,
  no shuffle of the corpus: at 100 TB the corpus stays partition-local
  and only (query_id, candidate_id, score) survive the window.
- ``ann_lsh`` — approximate: BucketedRandomProjectionLSH buckets the
  corpus once; probes hit only colliding buckets. The recall contract
  is validated against brute force in the tierc queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from smallquery_spark.functions.vectors import cosine


def knn_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "q_id",
    corpus_id: str = "c_id",
    query_vec: str = "q_vec",
    corpus_vec: str = "c_vec",
    include_self: bool = False,
) -> DataFrame:
    """Exact cosine top-k per query. Ties break on candidate id (total
    order → deterministic, oracle-matchable)."""
    pairs = corpus.crossJoin(F.broadcast(queries))
    if not include_self:
        pairs = pairs.filter(F.col(query_id) != F.col(corpus_id))
    scored = pairs.withColumn("cos", cosine(query_vec, corpus_vec))
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos").desc(), F.col(corpus_id)
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id, corpus_id, "cos", "rnk")
    )


def ann_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "q_id",
    corpus_id: str = "c_id",
    vec_col: str = "vec",
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate NN via random-projection LSH on L2 distance.

    Embeddings are L2-normalized first so euclidean NN order == cosine
    NN order (|a-b|² = 2 - 2·cos for unit vectors).
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector

    def prep(df: DataFrame, id_col: str) -> DataFrame:
        v = df.select(
            F.col(id_col), array_to_vector(F.col(vec_col)).alias("raw_vec")
        )
        return Normalizer(inputCol="raw_vec", outputCol="nvec", p=2.0).transform(v)

    qv = prep(queries, query_id)
    cv = prep(corpus, corpus_id)
    lsh = BucketedRandomProjectionLSH(
        inputCol="nvec",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(cv)
    # approxSimilarityJoin keeps only bucket-colliding pairs.
    joined = model.approxSimilarityJoin(qv, cv, 2.0, distCol="dist")
    pairs = joined.select(
        F.col(f"datasetA.{query_id}").alias(query_id),
        F.col(f"datasetB.{corpus_id}").alias(corpus_id),
        F.col("dist"),
    ).filter(F.col(query_id) != F.col(corpus_id))
    w = Window.partitionBy(query_id).orderBy(F.col("dist"), F.col(corpus_id))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id, corpus_id, "dist", "rnk")
    )


def ivf_build_centroids(
    corpus: DataFrame,
    n_cells: int,
    corpus_id: str = "c_id",
    vec_col: str = "vec",
) -> list[list[float]]:
    """Coarse quantizer "training": deterministic centroid pick (the
    first ``n_cells`` vectors by id — at scale, replace with k-means
    over a sample; the index structure downstream is identical). The
    centroid table is index METADATA: tiny (cells × dim), lives on the
    driver and ships to executors as literals — never a shuffle."""
    rows = (
        corpus.orderBy(corpus_id).limit(n_cells).select(vec_col).collect()
    )
    return [[float(x) for x in r[0]] for r in rows]


def _cell_scores(vec_col: str, centroids: list[list[float]]):
    """array<struct<cos,cell>> of the vector's cosine to every centroid —
    a single narrow projection (no join, no shuffle)."""
    terms = []
    for cell, cvec in enumerate(centroids):
        lit_vec = F.array(*[F.lit(x) for x in cvec])
        terms.append(
            F.struct(
                cosine(F.col(vec_col), lit_vec).alias("cos"),
                F.lit(cell).alias("cell"),
            )
        )
    return F.array(*terms)


def ivf_assign(
    corpus: DataFrame,
    centroids: list[list[float]],
    corpus_id: str = "c_id",
    vec_col: str = "vec",
) -> DataFrame:
    """Tag every corpus vector with its nearest-centroid cell id.

    array_max over (cos, cell) structs = argmax with deterministic
    tie-break — narrow, partition-local, scales linearly. At 100 TB the
    assigned corpus is written out partitioned/bucketed BY cell so a
    probe reads only its cells' files.
    """
    return corpus.withColumn(
        "cell", F.array_max(_cell_scores(vec_col, centroids))["cell"]
    )


def ivf_search(
    queries: DataFrame,
    assigned_corpus: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 4,
    query_id: str = "q_id",
    corpus_id: str = "c_id",
    vec_col: str = "vec",
) -> DataFrame:
    """IVF probe: each query scores only the corpus vectors in its
    ``n_probe`` nearest cells (vs. the whole corpus for brute force).

    The query→cell fan-out is an explode of a sorted literal-scored
    array; the cell join is an equi-join on ``cell`` with the (small)
    query side broadcast — the corpus never shuffles.
    """
    probes = (
        queries.withColumn(
            "__cells",
            F.slice(
                F.reverse(F.array_sort(_cell_scores(vec_col, centroids))),
                1,
                n_probe,
            ),
        )
        .withColumn("cell", F.explode(F.col("__cells")["cell"]))
        .drop("__cells")
        .withColumnRenamed(vec_col, "__qvec")
    )
    pairs = assigned_corpus.join(F.broadcast(probes), "cell").filter(
        F.col(query_id) != F.col(corpus_id)
    )
    scored = pairs.withColumn("cos", cosine("__qvec", vec_col))
    w = Window.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id, corpus_id, "cos", "rnk")
    )
