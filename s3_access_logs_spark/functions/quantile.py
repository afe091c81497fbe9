"""Mergeable quantile sketch as plain DataFrame ops — the distribution
twin of ``functions.bloom`` (membership), ``functions.cms`` (frequency)
and the KMV distinct sketch: a persistent bounded table, no UDFs.

Why not ``approx_percentile`` alone: Spark's built-in is the right call
INSIDE one query, but its internal GK summary cannot be persisted,
merged across days of ingest batches, or handed to another engine. A
recurring pipeline wants a stored profile artifact — "p50/p95/p99 of
document length over the whole corpus so far" — maintained
incrementally without rescanning 100 TB of history.

Representation: the k rows of the corpus whose ``xxhash64(key)`` is
smallest, stored as ``(h bigint, v double)`` plus one ``(NULL, k)``
meta row (xxhash64 of a non-null key is never NULL, so NULL is a safe
in-band sentinel — the hash range spans all of int64, leaving no
numeric sentinel). Because the hash is uniform over keys, the kept rows
are a uniform-without-replacement sample of size k, and the sample's
empirical quantile estimates the population quantile with error
O(sqrt(q(1-q)/k)) — k=4096 gives ~±0.8 percentile points at the
median. Deterministic end-to-end: same corpus, same sketch.

Build cost: one narrow scan + a ``TakeOrderedAndProject`` (per-partition
partial bottom-k, then one k-row reduce) — the corpus never shuffles.
Merge: union then re-take the k smallest hashes; hash ties collapse via
MIN(v) so overlapping inputs (a replayed batch) cannot double-sample a
row. Linearity caveat vs the CMS: merging is idempotent under row
overlap but NOT under value re-weighting — it is a sample, not a sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_K = 4096


def quantile_sketch_build(
    df: DataFrame,
    value_col: str,
    key_col: str,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Sketch the distribution of ``df[value_col]``: keep the ``k`` rows
    with the smallest ``xxhash64(key_col)``. ``key_col`` must identify
    rows stably (a document id, a composite via ``F.struct`` upstream) —
    the hash IS the sampling coin, so a stable key makes the sample (and
    every downstream quantile) rerun-deterministic. NULL values are
    excluded: they have no place on the value axis."""
    if k < 1:
        raise ValueError(f"quantile_sketch_build: need k >= 1, got {k}")
    rows = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.xxhash64(F.col(key_col)).alias("h"),
            F.col(value_col).cast("double").alias("v"),
        )
        .orderBy("h")
        .limit(k)
    )
    meta = df.sparkSession.createDataFrame(
        [(None, float(k))], "h bigint, v double"
    )
    return rows.unionByName(meta)


def _split_meta(rows: list) -> tuple[int, list[tuple[int, float]]]:
    ks = {int(r["v"]) for r in rows if r["h"] is None}
    if not ks:
        raise ValueError(
            "quantile sketch is missing its meta row (h IS NULL) — not "
            "built by quantile_sketch_build, or the row was filtered out"
        )
    if len(ks) > 1:
        raise ValueError(
            f"quantile sketches disagree on k ({sorted(ks)}) — samples "
            "of different sizes are not comparable; rebuild with one k"
        )
    return ks.pop(), [(r["h"], r["v"]) for r in rows if r["h"] is not None]


def quantile_sketch_merge(*sketches: DataFrame) -> DataFrame:
    """Union several sketches built with the SAME ``k`` and re-take the
    k smallest hashes — the merged sketch equals the sketch of the
    concatenated inputs (hash ties collapse to MIN(v), so an overlapping
    or replayed slice cannot double-sample). k-mismatch fails loudly."""
    if not sketches:
        raise ValueError("quantile_sketch_merge: need at least one sketch")
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    ks = u.filter(F.col("h").isNull()).select("v").distinct()
    if ks.count() > 1:
        raise ValueError(
            "quantile_sketch_merge: sketches disagree on k — samples of "
            "different sizes are not comparable; rebuild with one k"
        )
    k_row = ks.first()
    if k_row is None:
        raise ValueError(
            "quantile_sketch_merge: no meta row in any input sketch"
        )
    k = int(k_row["v"])
    merged = (
        u.filter(F.col("h").isNotNull())
        .groupBy("h")
        .agg(F.min("v").alias("v"))
        .orderBy("h")
        .limit(k)
    )
    meta = u.sparkSession.createDataFrame(
        [(None, float(k))], "h bigint, v double"
    )
    return merged.unionByName(meta)


def quantile_values(
    sketch: DataFrame | list, qs: list[float]
) -> dict[float, float]:
    """Evaluate quantiles from a sketch (DataFrame or pre-collected
    rows): numpy-style linear interpolation over the sorted sample.
    Driver-side on purpose — the sample is bounded at k rows, so this is
    a constant-size computation, never a corpus operation."""
    for q in qs:
        if not (0.0 <= q <= 1.0):
            raise ValueError(f"quantile_values: q must be in [0, 1], got {q}")
    rows = sketch if isinstance(sketch, list) else sketch.collect()
    _, sample = _split_meta(rows)
    if not sample:
        raise ValueError(
            "quantile_values: empty sample — the sketched input had no "
            "non-null values"
        )
    vs = sorted(v for _, v in sample)
    n = len(vs)
    out: dict[float, float] = {}
    for q in qs:
        pos = q * (n - 1)
        lo = int(pos)
        hi = min(lo + 1, n - 1)
        frac = pos - lo
        out[q] = vs[lo] * (1.0 - frac) + vs[hi] * frac
    return out
