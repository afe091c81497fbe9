"""Synthetic clustered embeddings (VERDICT r6 item 2).

The driver's ``embeddings.parquet`` vectors are near-random, so every
quantizer sits close to its worst case and recall@10 is only useful as a
*relative* regression signal — a genuine quality bug would drown in the
noise floor. This generator emits the complementary corpus: seeded
Gaussian blobs around well-separated unit centers, where the true top-k
of a query is overwhelmingly intra-blob and an IVF probe of the right
cell MUST recover it. On this table recall is assertable in absolute
terms (``tests/test_recall_clustered.py`` pins IVF at nprobe=4 to
>= 0.8; ``bench.py`` records the same block every round).

Geometry, so the floor is principled rather than tuned: random unit
centers in 64-d are near-orthogonal (pairwise |cos| ~ N(0, 1/64), so
< ~0.4 at 32 centers), while two members of one blob at sigma=0.05 have
cos >= ~0.85 — the intra/inter margin is wide enough that quantization
error, not data ambiguity, is the only thing recall can lose to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def clustered_embeddings(
    spark: SparkSession,
    n: int = 4000,
    dims: int = 64,
    n_clusters: int = 32,
    sigma: float = 0.05,
    seed: int = 7,
) -> DataFrame:
    """(vec_id bigint, label int, embedding array<double>): ``n`` points
    in ``n_clusters`` seeded Gaussian blobs around unit-norm centers.
    Deterministic for a given seed (one PCG64 stream, fixed draw order);
    components are O(1), far inside the well-formed magnitude contract
    (``operators.similarity.VEC_ABS_MAX``). Driver-side generation is
    fine at bench scale (n*dims doubles); a 100 TB analogue would be a
    seeded-per-partition ``mapInPandas`` over ``spark.range(n)`` — the
    geometry and the assertions carry over unchanged."""
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dims))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = np.arange(n) % n_clusters
    pts = centers[labels] + sigma * rng.standard_normal((n, dims))
    rows = [
        (i, int(labels[i]), [float(x) for x in pts[i]]) for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id bigint, label int, embedding array<double>"
    )
