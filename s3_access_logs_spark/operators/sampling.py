"""Deterministic sampling operators (engine extension).

``mixture_sample`` (plans/text_queries.py) covers rate-based source mixing
— keep each row with probability p, decided by a hash. This module covers
the other sampling contract a pipeline needs: EXACT per-stratum counts
(eval sets, human-review batches, per-source quotas), still with no RNG
state: reruns pick the same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_access_logs_spark.functions.text import md5_long


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    key_col: str,
    salt: str = "sample0:",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum is
    smaller), chosen deterministically: rows ranked by ``md5(salt || key)``
    within each stratum, first n win. Same salt -> same sample on every
    rerun; a fresh draw is a new salt.

    Scale shape: one shuffle by ``strata_col`` for the ranking window.
    Skew note: a hot stratum puts its whole population through one task's
    window sort — for strata at the hundreds-of-millions scale, pre-filter
    with a hash-rate cut (keep ~10x the quota by bucket, exact-rank the
    remainder) so the window sees a bounded candidate set.
    """
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_sample_rank", F.row_number().over(w))
        .filter(F.col("_sample_rank") <= n_per_stratum)
        .drop("_sample_rank")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str,
    group_cols: list[str] | None = None,
    salt: str = "wsample0:",
    nsalts: int = 32,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES): exactly ``k`` rows (fewer if the population is
    smaller), each item's inclusion probability proportional to its
    weight — "sample 1M documents proportional to quality score" as one
    bounded-memory pass.

    Mechanics: item i draws u_i uniform from ``xxhash64(salt || key)``
    and gets key ``-ln(u_i) / w_i`` (an exponential with rate w_i); the
    k SMALLEST keys are the sample — provably equivalent to sequential
    weighted draws without replacement (Efraimidis & Spirakis 2006).
    The hash is the coin: same salt, same data -> same sample on every
    rerun; a fresh draw is a new salt.

    Scale shape is the grouped-quantile-sketch pattern: bottom-k runs in
    two bounded window phases — first over (group, pmod(hash, nsalts)),
    perfectly balanced by the uniform hash, then over the group on the
    <= k x nsalts survivors — so no task ever sorts a whole giant
    population. ``group_cols=None`` samples globally (one synthetic
    group). Rows with NULL or non-positive weight are excluded: they
    have no defined inclusion probability, and silently keeping them
    would distort every other row's odds."""
    if k < 1:
        raise ValueError(f"weighted_sample: need k >= 1, got {k}")
    groups = list(group_cols or [])
    h = F.xxhash64(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    # uniform (0, 1): shift int64 into [0, 1) then nudge off exact zero
    u = (h.cast("double") / F.lit(float(1 << 64)) + F.lit(0.5)) * F.lit(
        1.0 - 1e-12
    ) + F.lit(1e-13)
    es_key = -F.log(u) / F.col(weight_col).cast("double")
    base = df.filter(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn("_es", es_key)
    w1 = Window.partitionBy(
        *groups, F.pmod(F.xxhash64(F.lit(salt + "#"), F.col(key_col)), F.lit(nsalts))
    ).orderBy("_es", key_col)
    w2 = Window.partitionBy(*groups).orderBy("_es", key_col)
    return (
        base.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "_es")
    )


def temperature_mixture(
    df: DataFrame,
    source_col: str,
    key_col: str,
    alpha: float = 0.7,
    target_rows: int | None = None,
    salt: str = "temp0:",
    max_sources: int = 100_000,
) -> DataFrame:
    """Temperature-weighted source mixing — the ``count^alpha`` re-balancing
    LLM data recipes apply so giant web crawls don't drown small
    high-quality sources (alpha=1 keeps natural proportions, alpha=0 gives
    every source equal share). Per-source keep rates are derived from the
    observed source sizes, then applied as the same deterministic
    hash-rate filter ``mixture_sample`` uses: md5(salt || key) as a uniform
    [0,1) draw, so reruns keep identical rows and a fresh draw is a new
    salt.

    Scale shape: one tiny count aggregation (per-source row counts,
    map-side partial), broadcast back into a narrow filter — the corpus
    itself never shuffles. ``target_rows`` defaults to the input size
    (pure re-balancing); rates are capped at 1 (a source cannot be
    upsampled by filtering — log the shortfall and duplicate explicitly if
    the recipe demands it).

    Returns rows with a ``_keep_rate`` column (diagnostics; drop it for
    training).

    ``max_sources`` bounds the driver-side per-source collect: the
    design assumes NAMED corpus sources (dozens to thousands). A caller
    passing a high-cardinality column (a URL, a doc id) as
    ``source_col`` would otherwise collect one row per distinct value —
    a driver OOM presenting as a mystery crash. The guard costs one
    bounded ``limit(max_sources+1)`` count and fails loudly instead
    (ADVICE r4 / VERDICT r4 item 4)."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    # ONE aggregation job serves both the guard and the rate math: under
    # the bound, limit(max_sources + 1) returns every row — collecting it
    # IS the collect the rate computation needs (a separate count() would
    # re-execute the full shuffle just to measure it).
    rows = counts.limit(max_sources + 1).collect()
    if len(rows) > max_sources:
        raise ValueError(
            f"temperature_mixture: more than {max_sources} distinct "
            f"values in {source_col!r} — this operator derives one "
            "driver-side rate per SOURCE and expects named corpus "
            "sources, not a high-cardinality key. Group sources "
            "coarser, or raise max_sources if the cardinality is "
            "genuinely intended."
        )
    if not rows:
        # empty input flows through as empty, not a crash — with the SAME
        # column order the join path produces (df columns then the rate),
        # so the output schema never depends on the input's emptiness
        return df.withColumn("_keep_rate", F.lit(0.0))
    total = sum(r["_n"] for r in rows)
    budget = total if target_rows is None else target_rows
    wsum = sum(r["_n"] ** alpha for r in rows)
    rates = [
        (
            r[source_col],
            min(1.0, (budget * (r["_n"] ** alpha) / wsum) / r["_n"]),
        )
        for r in rows
    ]
    # explicit schema: an all-NULL source group would defeat type inference
    rates_schema = T.StructType(
        [
            T.StructField("_tm_source", df.schema[source_col].dataType),
            T.StructField("_keep_rate", T.DoubleType()),
        ]
    )
    rates_df = df.sparkSession.createDataFrame(
        [(s, float(r)) for s, r in rates], rates_schema
    )
    # md5 first 8 hex chars as a uniform draw in [0, 1) — the shared
    # cross-engine hash primitive, not a re-derivation of it
    draw = md5_long(
        F.concat(F.lit(salt), F.col(key_col).cast("string"))
    ).cast("double") / F.lit(float(1 << 32))
    # null-safe equality: a NULL source group was counted into the
    # budget/weight math above, so its rows must reach the rate filter
    # too — a plain equi-join would silently drop them (NULL != NULL)
    return (
        df.join(
            F.broadcast(rates_df),
            F.col(source_col).eqNullSafe(F.col("_tm_source")),
        )
        .drop("_tm_source")
        .filter(draw < F.col("_keep_rate"))
    )
