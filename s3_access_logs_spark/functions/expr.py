"""Expression/plan-control utilities."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def filter_unpushed(df: DataFrame, pred: Column) -> DataFrame:
    """Apply ``pred`` WITHOUT letting the optimizer push it below ``df``'s
    projections.

    Catalyst's ``PushPredicateThroughNonJoin`` substitutes a filtered
    column's defining expression into the predicate with no cost model: a
    filter on a parsed column re-runs the column's whole defining pipeline
    per reference — ``cidr_traffic``'s CIDR predicate inlined the
    tokenizer six times (into the Filter AND the scan's DataFilters) and
    ran ~6x slower than the same aggregation unfiltered. For cheap source
    columns that substitution is exactly what you want (predicate reaches
    the scan); for expensive derived columns it is pathological.

    Mechanics (verified on the optimized plan): the rule's determinism
    check is on the PROJECT FIELDS, not the filter condition — a
    nondeterministic conjunct is first split off (conjunctions are split
    and deterministic conjuncts pushed alone), and in Spark 4 a
    ``rand() >= -1`` guard is even folded away outright by range-based
    simplification. What does hold the line: a nondeterministic COLUMN in
    the projection, referenced by the predicate, survives column pruning
    and makes the projection ineligible for push-through. The guard column
    is one ``monotonically_increasing_id()`` per row (always >= 0, so the
    filter's value is exactly ``pred``) and is dropped from the output.
    """
    fence = "_no_pushdown_fence"
    return (
        df.withColumn(fence, F.monotonically_increasing_id())
        .filter(F.when(F.col(fence) >= 0, pred).otherwise(F.lit(False)))
        .drop(fence)
    )
