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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    nanos_cols = _nanos_ts_columns(path)
    if not nanos_cols:
        return spark.read.parquet(path)
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
    return df


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
