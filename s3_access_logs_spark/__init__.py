"""s3_access_logs_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference ETL job
``deptofdefense/s3-access-logs`` (S3 server-access logs -> partitioned
Parquet; see ``/root/reference``), built Spark-first:

* the ETL surface (``sources.logs`` + ``operators.parse`` + ``operators.etl``)
  is a single declarative DataFrame plan — scan, regex tokenize, typed
  projection, derived columns, hive-partitioned Parquet sink — instead of the
  reference's three process pools and a driver-side gather
  (reference: cmd/export.py:79-168);
* the query surface the reference delegates to AWS Athena
  (reference: README.md:5-6) is owned natively via Spark SQL
  (``plans.catalog``): filters, aggregations, joins, windows, set ops;
* large-scale training-data-pipeline operators (dedup, similarity search,
  text analysis, multimodal columns) are first-class (``operators.dedup``,
  ``operators.similarity``, ``operators.multimodal``, ``functions.text``);
* the batch ETL re-runs unchanged as a Structured Streaming job
  (``streaming.pipeline``) with watermarked event-time windows replacing
  the reference's cron + tracking-file scheme.

Everything is built on the public Apache Spark / PySpark API only.
"""

__version__ = "0.1.0"

from s3_access_logs_spark.session import get_spark  # noqa: F401
