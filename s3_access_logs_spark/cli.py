"""`python -m s3_access_logs_spark` — the reference's cron entry point
(cmd/export.py main, :204-397) on Spark.

Flow parity: config from env -> idempotency gate (skip a completed hour)
-> scan/parse/partitioned-write as one Spark plan -> touch the tracking
marker. The three process pools, the WaitGroup, and the multiprocess log
listener all disappear: Spark's scheduler is the concurrency model and
actions block (SURVEY §3.1).

Exit codes match the reference: 0 on success *and* on "hour already done"
/ "no input files" (export.py:319-341).
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

from s3_access_logs_spark.config import JobConfig
from s3_access_logs_spark.operators.etl import export_hour
from s3_access_logs_spark.session import get_spark

log = logging.getLogger("s3_access_logs_spark")


def _marker(cfg: JobConfig) -> Path | None:
    if not cfg.tracking_dst:
        return None
    return Path(cfg.tracking_dst) / cfg.hour


def main(env: dict[str, str] | None = None) -> int:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    cfg = JobConfig.from_env(env)
    marker = _marker(cfg)
    if marker is not None and marker.exists():
        # idempotency gate (reference: cmd/export.py:319-324). Kept for
        # cron-contract parity even though the dynamic-partition-overwrite
        # write is itself idempotent.
        log.info("hour %s already exported, skipping", cfg.hour)
        return 0
    spark = get_spark("s3-access-logs-export", extra_conf=cfg.s3a_conf())
    n = export_hour(spark, cfg.src, cfg.dst, hour=cfg.hour)
    if n == 0:
        log.info("no input files for hour %s", cfg.hour)
        return 0
    if marker is not None:
        marker.parent.mkdir(parents=True, exist_ok=True)
        # same two-step touch-then-write as the reference (export.py:158-168)
        marker.touch()
        marker.write_text(f"exported {n} rows for {cfg.hour}\n")
    log.info("exported %d rows for hour %s", n, cfg.hour)
    return 0


if __name__ == "__main__":
    sys.exit(main())
