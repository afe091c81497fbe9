"""ETL sink + end-to-end job: parsed logs -> hive-partitioned Parquet.

Covers the reference's write path (write_dataset s3access/parquet.py:31-112,
invoked cmd/export.py:142-154):

* hive partition layout ``bucket_name/operation/year/month/day/hour``
  (cmd/export.py:146) via ``partitionBy`` — partition columns are dropped
  from data files automatically, matching s3access/parquet.py:50-61;
* SNAPPY compression (cmd/export.py:145);
* row-group clustering on (requester, remoteip_int, is_assumed_role,
  is_user) (cmd/export.py:148) expressed as ``sortWithinPartitions`` so
  parquet min/max stats give equivalent row-group skipping — the
  reference's literal one-row-group-per-combo would produce pathological
  tiny row groups at 100 TB;
* idempotent rerun via dynamic partition overwrite instead of tracking
  files (cmd/export.py:158-168, :319-324): re-running an hour replaces
  exactly that hour's partitions.

At scale: the write shuffles once on the partition keys (repartition before
sort) so each task writes few partitions; without it, every input task
writes a file into every output partition -> small-file explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3_access_logs_spark.operators.parse import parse_logs
from s3_access_logs_spark.schema import PARTITION_COLS, ROW_GROUP_COLS
from s3_access_logs_spark.sources.logs import read_logs


def write_logs(
    df: DataFrame,
    dst: str,
    mode: str = "overwrite",
    compression: str = "snappy",
    repartition: bool = True,
    files_per_partition: int = 1,
    max_records_per_file: int = 5_000_000,
) -> None:
    """Write the parsed table hive-partitioned, clustered, idempotent.

    Scale knobs:

    * ``files_per_partition`` — a single bucket x op x hour output partition
      is ONE task under plain ``repartition(part_cols)``; for a hot
      partition (one bucket taking most of an hour's traffic) that task is
      the straggler. >1 adds a deterministic salt (hash of the row-group
      cluster columns) to the shuffle key, spreading the partition across N
      writer tasks. Content is unchanged; only file layout varies, and
      dynamic partition overwrite still replaces whole directories on
      rerun, so idempotency is preserved.
    * ``max_records_per_file`` — hard upper bound per output file so a big
      partition can never produce a multi-GB parquet file that downstream
      readers can't split row-group-parallel.
    """
    part_cols = [c for c in PARTITION_COLS if c in df.columns]
    sort_cols = [c for c in ROW_GROUP_COLS if c in df.columns]
    out = df
    if repartition and part_cols:
        keys = [F.col(c) for c in part_cols]
        if files_per_partition > 1:
            salt_src = sort_cols if sort_cols else df.columns[:1]
            keys.append(
                F.pmod(
                    F.xxhash64(*[F.col(c) for c in salt_src]),
                    F.lit(files_per_partition),
                )
            )
        out = out.repartition(*keys)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    writer = (
        out.write.mode(mode)
        .option("compression", compression)
        .option("maxRecordsPerFile", max_records_per_file)
    )
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(dst)


def read_parsed(spark: SparkSession, path: str) -> DataFrame:
    """Read the partitioned parsed-log table back (partition pruning on the
    hive columns is automatic)."""
    return spark.read.parquet(path)


def export_hour(
    spark: SparkSession,
    src: str,
    dst: str,
    hour: str | None = None,
    compat_is_user: bool = True,
) -> int:
    """The reference's whole job (cmd/export.py main, :204-397) as one
    Spark plan: scan -> parse -> partitioned write. Returns rows written."""
    raw = read_logs(spark, src, hour=hour)
    parsed = parse_logs(raw, compat_is_user=compat_is_user)
    parsed.persist()
    try:
        n = parsed.count()
        if n:
            write_logs(parsed, dst)
    finally:
        parsed.unpersist()
    return n
