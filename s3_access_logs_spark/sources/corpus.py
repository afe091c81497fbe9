"""Batch corpus ingestion from JSONL (the wire format of web-crawl and
training-data dumps).

At 100 TB a crawl dump ALWAYS contains malformed lines — truncated
records, stray control bytes, schema drift. The job must neither die on
them (ANSI failfast) nor silently drop them (PERMISSIVE with no
accounting): ingestion keeps every line, tags the broken ones, and the
caller decides with numbers in hand. The quarantine pattern here is the
batch twin of the streaming ingest gate (streaming/pipeline.py:
ingest_documents_stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: StructType,
    multiline: bool = False,
) -> DataFrame:
    """Read JSONL with an explicit schema plus a corrupt-record column.

    An EXPLICIT schema is non-negotiable at scale: without one Spark runs
    a full inference pass over the data (a second 100 TB scan) and the
    inferred schema drifts with the sample. Lines that fail to parse come
    back with every data column NULL and the raw line in
    ``_corrupt_record`` — nothing is dropped at read time.
    """
    full = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("multiLine", "true" if multiline else "false")
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows lose the corrupt column; quarantine
    rows carry the raw line, the source file, and the (all-NULL) data
    columns. Both sides are narrow filters over the one scan — writing the
    quarantine to a side location costs no extra pass.

    The data columns stay in the quarantine output deliberately: Spark
    refuses plans whose required schema from a raw JSON scan is ONLY the
    corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN — the scan
    would have nothing real to parse), and the full row is what a repair
    job wants anyway."""
    bad = F.col(CORRUPT_COL).isNotNull()
    clean = df.filter(~bad).drop(CORRUPT_COL)
    data_cols = [c for c in df.columns if c != CORRUPT_COL]
    quarantine = df.filter(bad).select(
        F.col(CORRUPT_COL).alias("raw_line"),
        F.input_file_name().alias("source_file"),
        *data_cols,
    )
    return clean, quarantine


def ingest_report(df: DataFrame) -> dict:
    """One-pass ingest accounting: {rows, parsed, corrupt, corrupt_pct},
    with rows == parsed + corrupt always. A corrupt_pct spike between
    crawls is the cheapest possible schema-drift alarm — it fires before
    any downstream job sees the batch.

    ``parsed`` is derived as rows - corrupt, NOT as non-null counts of a
    data column — a cleanly parsed row whose first field is legitimately
    null must still count as parsed. The first data column is counted
    anyway (as ``first_field_nonnull``, a useful null-rate signal) because
    a raw-JSON scan whose required schema is only the corrupt-record
    column is rejected by Spark — see ``split_corrupt``."""
    first_data = next(c for c in df.columns if c != CORRUPT_COL)
    row = df.agg(
        F.count(F.lit(1)).alias("rows"),
        F.count(first_data).alias("first_nonnull"),
        F.sum(
            F.when(F.col(CORRUPT_COL).isNotNull(), 1).otherwise(0)
        ).alias("corrupt"),
    ).first()
    corrupt = row["corrupt"] or 0
    return {
        "rows": row["rows"],
        "parsed": row["rows"] - corrupt,
        "corrupt": corrupt,
        "corrupt_pct": (100.0 * corrupt / row["rows"]) if row["rows"] else 0.0,
        "first_field_nonnull": row["first_nonnull"],
    }
