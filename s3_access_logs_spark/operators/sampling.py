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
