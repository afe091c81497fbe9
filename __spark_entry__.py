"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All three hooks are thin views over the engine's single query registry
(s3_access_logs_spark/plans/catalog.py) so the declared surface, the bench
set and the tests can never drift apart.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from s3_access_logs_spark.plans.catalog import driver_surface, load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the end-to-end ETL slice —
    synthesize S3 access-log lines, run the full parse pipeline (tokenizer,
    positional projection, derived columns), aggregate bytes/requests by
    bucket x operation x hour (SURVEY §7 Phase 1 target)."""
    q = load_all()["logs_hourly_agg"]
    return q.builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, with related
    capability groups composed into value-exact ``suite_*`` folds
    (plans/fold_queries.py) so the surface fits the driver's 50-row
    correctness window; the granular members remain in the registry for
    the bench set and pytest suite."""
    return {name: q.builder for name, q in sorted(driver_surface().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every query — the whole surface is
    value-checked: even the MinHash/SimHash/LSH/IVF/PQ/k-means paths and
    the learned quality filter (difference-of-document-frequency
    training, integer-count deterministic) are deterministic-by-design
    and verified value-for-value. The one non-replayable trainer (MLlib
    L-BFGS logistic regression) stays under pytest's separation-quality
    contract instead of a weakened rows-only driver row."""
    return {
        name: q.oracle
        for name, q in sorted(driver_surface().items())
        if q.oracle
    }
