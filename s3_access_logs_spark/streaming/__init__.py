from s3_access_logs_spark.streaming.pipeline import (  # noqa: F401
    backfill_bloom_store,
    compact_ingest_store,
    correlate_reads_after_writes,
    dedup_request_stream,
    hourly_rollup,
    ingest_documents_stream,
    parse_log_stream,
    read_log_stream,
    run_export_stream,
    sessionize,
    sliding_traffic,
    write_partitioned_stream,
)
