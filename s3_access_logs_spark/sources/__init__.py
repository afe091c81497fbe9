"""Sources: raw log files, parquet tables, streaming variants."""
