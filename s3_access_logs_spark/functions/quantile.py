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
    # ONE collect of the few meta rows validates everything (the
    # count+first pair re-scanned a parquet-backed union twice)
    metas = [
        r["v"]
        for r in u.filter(F.col("h").isNull())
        .select("v")
        .distinct()
        .collect()
    ]
    if not metas:
        raise ValueError(
            "quantile_sketch_merge: no meta row in any input sketch"
        )
    if len(metas) > 1:
        raise ValueError(
            "quantile_sketch_merge: sketches disagree on k — samples of "
            "different sizes are not comparable; rebuild with one k"
        )
    k = int(metas[0])
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


def grouped_quantile_sketch_build(
    df: DataFrame,
    value_col: str,
    key_col: str,
    group_cols: list[str],
    k: int = 512,
    nsalts: int = 32,
) -> DataFrame:
    """Per-group bottom-k-by-hash samples in one pass: the distribution
    profile "p50/p95 of document length PER SOURCE / PER DOMAIN" as a
    stored table ``(group cols..., h, v, k)``.

    Skew is the design constraint: a naive per-group window sends every
    row of a giant group to one task. Instead the bottom-k runs in two
    bounded phases — phase 1 windows over (group, pmod(h, nsalts)),
    which the uniform hash balances perfectly, keeping k rows per salt;
    phase 2 windows over the group alone on the <= k x nsalts survivors.
    Both shuffles move only (group, h, v) triples, and no task ever
    sorts more than max(rows/nsalts-ish, k x nsalts) rows regardless of
    group skew."""
    if k < 1 or nsalts < 1:
        raise ValueError(
            f"grouped_quantile_sketch_build: need k >= 1 and nsalts >= 1,"
            f" got ({k}, {nsalts})"
        )
    from pyspark.sql import Window

    base = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols,
        F.xxhash64(F.col(key_col)).alias("h"),
        F.col(value_col).cast("double").alias("v"),
    )
    w1 = Window.partitionBy(
        *group_cols, F.pmod(F.col("h"), F.lit(nsalts))
    ).orderBy("h", "v")
    w2 = Window.partitionBy(*group_cols).orderBy("h", "v")
    return (
        base.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
        .withColumn("k", F.lit(k))
    )


def grouped_quantile_sketch_merge(*sketches: DataFrame) -> DataFrame:
    """Union per-group sketches built with the same ``k`` and re-take
    each group's k smallest hashes ((group, h) duplicates collapse to
    MIN(v) first, so overlapping or replayed inputs cannot
    double-sample). k-mismatch fails loudly."""
    if not sketches:
        raise ValueError(
            "grouped_quantile_sketch_merge: need at least one sketch"
        )
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    ks = [r["k"] for r in u.select("k").distinct().collect()]
    if len(ks) != 1:
        raise ValueError(
            f"grouped_quantile_sketch_merge: sketches disagree on k "
            f"({sorted(ks)}) — rebuild with one k"
        )
    from pyspark.sql import Window

    k = ks[0]
    group_cols = [c for c in u.columns if c not in ("h", "v", "k")]
    w = Window.partitionBy(*group_cols).orderBy("h", "v")
    return (
        u.groupBy(*group_cols, "h")
        .agg(F.min("v").alias("v"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
        .withColumn("k", F.lit(k))
    )


def grouped_quantile_values(
    sketch: DataFrame, qs: list[float]
) -> DataFrame:
    """Per-group quantiles from a grouped sketch, fully in-engine (no
    driver collect — there may be millions of groups): one hash
    aggregation over the bounded samples, then the requested quantiles
    unpivot to ``(group cols..., q, value)``. Uses ``percentile``'s
    linear interpolation — the same rule as :func:`quantile_values`."""
    for q in qs:
        if not (0.0 <= q <= 1.0):
            raise ValueError(
                f"grouped_quantile_values: q must be in [0, 1], got {q}"
            )
    group_cols = [c for c in sketch.columns if c not in ("h", "v", "k")]
    q_arr = "array({})".format(
        ", ".join(f"{q!r}D" for q in qs)
    )
    agg = sketch.groupBy(*group_cols).agg(
        F.expr(f"percentile(v, {q_arr})").alias("_vals")
    )
    return agg.select(
        *group_cols,
        F.posexplode("_vals").alias("_pos", "value"),
    ).select(
        *group_cols,
        F.element_at(
            F.array(*[F.lit(float(q)) for q in qs]), F.col("_pos") + 1
        ).alias("q"),
        "value",
    )


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
