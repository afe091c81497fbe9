"""Loaders for the driver's parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet per table under an sf dir.
"""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _nanos_ts_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark has no
    native type for (events.ts in TESTDATA is timestamp[ns])."""
    try:
        schema = pq.read_schema(path)
    except Exception:
        return []
    return [
        f.name
        for f in schema
        if str(f.type).startswith("timestamp[ns")
    ]


# Under-split remediation threshold: files smaller than this are dimension
# tables (region/nation/part/customer/...) that exist to be broadcast —
# parallelizing their scan would just add an exchange in front of the
# broadcast. Everything bigger is fact-side and worth splitting.
_MIN_SPLIT_BYTES = 512 << 10


def _ensure_splits(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """Fix under-split inputs: parquet is only task-parallel at row-group
    granularity, and the driver's test files are written as ONE row group —
    so every scan (and the whole query above it) runs as a single task no
    matter how many cores the session has, byte-range splits
    notwithstanding (tasks whose range holds no row-group midpoint read
    nothing). One round-robin repartition to the session's parallelism
    unlocks every core for the price of shuffling the (small) file once.

    At production scale this is a no-op by construction: a well-written
    100 TB table has thousands of row groups (>= cores), and single huge
    unsplittable files (the classic gzip problem) hit exactly this
    remediation — which is then the right call too.

    The size/row-group inspection uses local-filesystem access; on an
    object store it falls back to no remediation (the except branch) —
    there, rely on healthy row-group sizing at write time or repartition
    explicitly."""
    try:
        import os

        if os.path.getsize(path) < _MIN_SPLIT_BYTES:
            return df
        row_groups = pq.ParquetFile(path).metadata.num_row_groups
    except Exception:
        return df
    target = spark.sparkContext.defaultParallelism
    if row_groups >= max(target // 2, 1):
        return df
    return df.repartition(target)


def load_table(
    spark: SparkSession, sf_dir: str, name: str, parallelize: bool = True
) -> DataFrame:
    """Load one driver table. ``parallelize=True`` applies the under-split
    remediation (see ``_ensure_splits``) — right for pipelines whose
    per-row expression work dwarfs the scan (parse, shingles, vector
    folds). Scan/join-bound queries pass ``False``: for them the one-time
    reshuffle costs more than the single-task scan it fixes, the same
    call a cost-based planner would make."""
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    # Parquet TIMESTAMP(isAdjustedToUTC=false) — what pyarrow writes for a
    # tz-naive timestamp[us] column — would otherwise infer as TIMESTAMP_NTZ
    # (Spark 3.4+ default), which supports no numeric cast and breaks every
    # epoch-seconds expression downstream. Reading it as plain TIMESTAMP
    # treats the stored micros as the UTC instant — the same interpretation
    # DuckDB's epoch() applies — and keeps filters pushable at the scan
    # (no conversion projection in front of the relation). Runtime-settable;
    # left on for the session like nanosAsLong below.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # See session.py: the inferred explode filter re-evaluates expensive
    # generator inputs; excluded here too so sessions the driver builds
    # itself (bypassing get_spark) run with the same optimizer set.
    _excl = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    cur = spark.conf.get("spark.sql.optimizer.excludedRules", None) or ""
    if _excl not in cur:
        spark.conf.set(
            "spark.sql.optimizer.excludedRules",
            f"{cur},{_excl}" if cur else _excl,
        )
    # Engine parallelism default: a session still on Spark's stock 200
    # shuffle partitions pays ~200/cores empty-task overhead on every
    # small shuffle. Only the untouched default is replaced (a deliberate
    # setting, even if 200, is indistinguishable — but then the cost was
    # chosen); get_spark sessions already carry the tuned value. This is
    # deliberately a loader side effect because the harness sessions this
    # engine must run under are built elsewhere; a caller that wants the
    # stock default anyway opts out with SPARK_GRAFT_NO_SESSION_TUNING=1.
    import os as _os

    if not _os.environ.get("SPARK_GRAFT_NO_SESSION_TUNING"):
        if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(spark.sparkContext.defaultParallelism),
            )
    nanos_cols = _nanos_ts_columns(path)
    if not nanos_cols:
        df = spark.read.parquet(path)
        return _ensure_splits(spark, df, path) if parallelize else df
    # Read NANOS as raw int64 then truncate to microseconds — same
    # truncation DuckDB applies (its timestamps are microsecond), so both
    # engines see identical values.
    #
    # The conf is set once and left on: Spark may re-read session confs at
    # physical planning, so the old set/reset-in-finally pattern made
    # correctness depend on capture timing and broke under concurrent loads
    # (ADVICE r1). nanosAsLong only affects files that actually contain
    # NANOS columns, so leaving it enabled is safe for every other read.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos_cols:
        # `div` (exact integer division), NOT `/` (double): int64 nanosecond
        # epochs (~1.7e18) exceed double's 53-bit mantissa, so float division
        # lands ~1 in 8 values on the wrong microsecond vs DuckDB's exact
        # truncation (ADVICE r1, verified on sf0.01 events.parquet).
        df = df.withColumn(
            c, F.timestamp_micros(F.expr(f"`{c}` div 1000"))
        )
    return _ensure_splits(spark, df, path) if parallelize else df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> None:
    """Register each table as a temp view so spark.sql can reference it."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    n_buckets: int = 32,
    sort_cols: list[str] | str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) on its join key.

    Bucketing is the at-rest half of shuffle elimination: two tables
    bucketed on the same key with the same bucket count join with NO
    exchange — each task zips bucket i with bucket i. At 100 TB this turns
    the recurring fact-fact join (e.g. orders-lineitem on orderkey) from a
    full two-sided shuffle into a local merge, paid once at write time.
    Requires saveAsTable (bucket metadata lives in the catalog)."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *cols)
    if sort_cols:
        sc = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*sc)
    writer.format("parquet").saveAsTable(table)
