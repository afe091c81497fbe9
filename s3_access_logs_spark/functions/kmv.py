"""KMV (k-minimum-values) distinct-count sketch as a persistent,
mergeable table — generalizing the oracle-checked catalog query
(plans/relational.py:approx_distinct_users) into a storable artifact,
the same move the quantile sketch makes for percentiles.

Why next to ``approx_count_distinct``: HLL++ is the right in-query
estimator, but its sketch cannot be persisted or merged across days of
ingest batches from SQL. A KMV store holds the k smallest distinct
hash values (mapped into [0,1)); partitions union-merge by re-taking
the bottom-k DISTINCT values, so "distinct users over the whole stream
so far" is maintained incrementally under the same ``batch_id``
store pattern as the count-min and profile stores, and
``compact_ingest_store`` folds history without changing the estimate.

Estimate (Bar-Yossef et al. 2002): with U_k the k-th smallest of the
distinct hashes, E[distinct] = (k-1)/U_k; under k distinct values the
sketch IS the distinct set and the estimate is exact. The md5-based
hash mapping is the same cross-engine-deterministic construction the
catalog query's oracle pins, widened to 60 bits (see _unit_hash for
why 32 bits undercount at production cardinalities).

Representation: ``(u double)`` rows in [0,1) plus one meta row
``u = -k`` (hash values are never negative, so the sign is a safe
in-band sentinel).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from s3_access_logs_spark.functions.text import md5_long

DEFAULT_K = 1024


def _unit_hash(col: Column) -> Column:
    """md5 -> first-15-hex int -> /2^60: a uniform [0,1) hash built on
    the shared cross-engine primitive (functions.text.md5_long). 60
    bits, not the catalog query's 32: at hundreds of millions of
    distinct keys a 32-bit space loses ~n^2/2^33 values to collisions
    (a systematic undercount bigger than the sketch's own error) and
    saturates near 4.3B; 15 hex chars stay inside a signed 64-bit conv
    while pushing the collision term past any realistic cardinality."""
    return md5_long(col.cast("string"), hex_chars=15).cast(
        "double"
    ) / F.lit(float(1 << 60))


def kmv_build(df: DataFrame, col: str, k: int = DEFAULT_K) -> DataFrame:
    """Sketch the distinct values of ``df[col]``: the k smallest
    distinct unit-hashes. NULLs are excluded (they are not a value).
    One distinct shuffle on the hash, then a TakeOrderedAndProject —
    the k-row result is the only thing that ever reaches one place."""
    if k < 2:
        raise ValueError(f"kmv_build: need k >= 2, got {k}")
    rows = (
        df.filter(F.col(col).isNotNull())
        .select(_unit_hash(F.col(col)).alias("u"))
        .distinct()
        .orderBy("u")
        .limit(k)
    )
    meta = df.sparkSession.createDataFrame(
        [(-float(k),)], "u double"
    )
    return rows.unionByName(meta)


def kmv_merge(*sketches: DataFrame) -> DataFrame:
    """Union sketches built with the same ``k`` and re-take the k
    smallest DISTINCT values — identical to the sketch of the
    concatenated inputs (overlap collapses in the distinct).
    k-mismatch fails loudly."""
    if not sketches:
        raise ValueError("kmv_merge: need at least one sketch")
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    ks = [r["u"] for r in u.filter(F.col("u") < 0).distinct().collect()]
    if not ks:
        raise ValueError(
            "kmv_merge: no meta row (u < 0) in any input — not built by "
            "kmv_build, or the rows were filtered out"
        )
    if len(ks) > 1:
        raise ValueError(
            f"kmv_merge: sketches disagree on k ({sorted(-x for x in ks)})"
            " — rebuild with one k"
        )
    k = int(-ks[0])
    merged = (
        u.filter(F.col("u") >= 0)
        .distinct()
        .orderBy("u")
        .limit(k)
    )
    meta = u.sparkSession.createDataFrame([(-float(k),)], "u double")
    return merged.unionByName(meta)


def kmv_estimate(sketch: DataFrame | list) -> float:
    """Distinct-count estimate from a sketch (DataFrame or collected
    rows): exact below k, (k-1)/U_k at or above. Driver-side over the
    bounded k rows."""
    rows = sketch if isinstance(sketch, list) else sketch.collect()
    ks = {-r["u"] for r in rows if r["u"] < 0}
    if not ks:
        raise ValueError(
            "kmv_estimate: missing meta row (u < 0) — not built by "
            "kmv_build, or the row was filtered out"
        )
    if len(ks) > 1:
        raise ValueError(
            f"kmv_estimate: sketches disagree on k ({sorted(ks)})"
        )
    k = int(ks.pop())
    # DEDUPE before estimating: a raw union of same-k sketches (e.g. a
    # batch_id store read without kmv_merge) passes the meta check but
    # carries duplicate hashes from overlapping batches — counting them
    # would deflate U_k (overestimate) and fake "at least k" cardinality.
    # set() IS kmv_merge's distinct, so estimate(union) == estimate(merge).
    us = sorted({r["u"] for r in rows if r["u"] >= 0})
    if len(us) < k:
        return float(len(us))
    return (k - 1) / us[k - 1]
