"""Declared-query catalog: the query surface of the engine.

Every operator claimed in SURVEY.md §2 has a named entry here with a Spark
builder and (where SQL-expressible) a DuckDB oracle string. The catalog
feeds ``__spark_entry__.py`` (driver correctness gate), ``bench.py`` and
the pytest suite from one registry.
"""

from s3_access_logs_spark.plans.catalog import QUERIES, Query, query  # noqa: F401
