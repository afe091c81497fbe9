"""Similarity search over embedding columns (engine extension,
BASELINE.json mandate).

Two tiers, same contract (query set -> top-k neighbors per query):

* brute force — exact, O(Q x N); right answer at verification scale and
  whenever Q is small enough that broadcast(queries) x scan(corpus) beats
  building an index. The per-pair cosine is a codegen'd fold, not a UDF.
* LSH-bucketed — random-hyperplane signs bucket the corpus once
  (deterministic planes -> reproducible); each query probes only its
  bucket(s). At 100 TB the corpus side stays partitioned by bucket on
  disk, so a query touches a fraction 1/2^m of the data. Approximate:
  recall < 1 (documented), which is why it is the scale path, not the
  oracle path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from s3_access_logs_spark.functions.vectors import (
    cosine_similarity,
    random_projection_bucket,
)

# Fixed pseudo-random hyperplanes (8 planes x 64 dims) generated from a
# linear-congruential sequence — deterministic across runs and engines.
_LCG_A, _LCG_C, _LCG_M = 1_103_515_245, 12_345, 1 << 31


def _lcg_planes(n_planes: int, dims: int) -> list[list[float]]:
    state = 42
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dims):
            state = (_LCG_A * state + _LCG_C) % _LCG_M
            row.append((state / _LCG_M) * 2.0 - 1.0)
        planes.append(row)
    return planes


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors: (query_id, neighbor_id, rank, sim).

    Queries are broadcast; the corpus is scanned once per partition with no
    shuffle until the final per-query top-k (window over query_id)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine_similarity("q_vec", "c_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("sim", 6).alias("sim"),
        )
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dims: int = 64,
) -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket. Same output
    contract as brute_force_topk (rank within bucket)."""
    planes = _lcg_planes(n_planes, dims)
    bucket = lambda col: random_projection_bucket(col, planes)  # noqa: E731
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    scored = (
        c.join(broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine_similarity("q_vec", "c_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim")
        )
    )
