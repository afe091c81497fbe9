"""Vector math over ``array<float>`` embedding columns — built-in
higher-order functions only (zip_with/aggregate run in codegen; no UDF, no
Python round-trip). All arithmetic is promoted to double so results are
reproducible cross-engine (DuckDB list_* on DOUBLE[] matches)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _d(col: Column | str) -> Column:
    return F.transform(_c(col), lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(_d(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def _no_nan(sim: Column) -> Column:
    """NaN cosine -> NULL, uniformly no-signal (review r6). A NaN sim
    (an inf vector component; inf/inf) is the ONE value whose sort
    order is engine- and stage-specific: Spark windows order NaN as the
    LARGEST double (it would rank FIRST under sim DESC), DuckDB also
    ranks NaN first under DESC, but Spark's struct-sort/pandas
    pre-reduces order it last — so a NaN-sim row could be crowned by
    one path and dropped by another. As NULL every order agrees: DESC
    NULLS LAST in windows, threshold compares are false, the JVM fold's
    +inf sentinel sends it last. Applied INSIDE the cosine helpers so
    every ranking call site shares one contract."""
    return F.nanvl(sim, F.lit(None).cast("double"))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return _no_nan(F.when(denom > 0, dot(a, b) / denom))


def cosine_from_norms(
    a: Column | str, b: Column | str, norm_a: Column | str, norm_b: Column | str
) -> Column:
    """Cosine with the norms supplied as precomputed columns.

    ``cosine_similarity`` re-evaluates both l2_norm folds per pair (HOF
    lambdas defeat Catalyst CSE), which is Q-fold redundant work on the
    corpus side of a top-k join. Project ``l2_norm`` once per side before
    the join and use this instead; the arithmetic (dot / (na * nb)) is
    identical, so results are bit-for-bit the same."""
    denom = _c(norm_a) * _c(norm_b)
    return _no_nan(F.when(denom > 0, dot(a, b) / denom))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(_d(a), _d(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def random_projection_bucket(a: Column | str, planes: list[list[float]]) -> Column:
    """LSH bucket id: sign pattern of dot products against fixed random
    hyperplanes (deterministic constants -> reproducible bucketing). With
    ``len(planes)`` = m, buckets are 0..2^m-1; near-identical vectors land
    in the same bucket, making ANN a per-bucket local search instead of a
    full cross join.

    When ``a`` is a column NAME the whole expression is generated as ONE
    parsed SQL string: building m x dims literal Columns costs ~m*dims py4j
    round trips of driver time per plan build (measured ~1.7 s per
    lsh_bucketed_topk build at 8x64; same trap as IVF's literal-centroid
    argmax). The SQL form is the identical left-to-right zip_with/aggregate
    fold, so bucket values are bit-for-bit unchanged."""
    if isinstance(a, str):
        terms = []
        for i, plane in enumerate(planes):
            vals = ", ".join(repr(float(v)) for v in plane)
            dot_s = (
                f"aggregate(zip_with(CAST(`{a}` AS ARRAY<DOUBLE>), "
                f"array({vals}), (p, q) -> p * q), "
                f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
            )
            terms.append(f"IF({dot_s} >= 0, {1 << i}, 0)")
        return F.expr("CAST(" + " + ".join(terms) + " AS BIGINT)")
    acc = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(v)) for v in plane])
        acc = acc + F.when(dot(_c(a), p) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return acc
