"""Env-var job configuration — drop-in parity with the reference's contract
(cmd/export.py:234-292) so an operator of the original can point the same
cron entry at this engine.

Variables honored (reference source lines cited):

* ``SRC`` / ``DST`` — input log dir, output parquet root (export.py:236-237)
* ``TRACKING_DST`` — completed-hour marker dir (export.py:242)
* ``HOUR`` — 'YYYY-MM-DD-HH'; defaults to the *previous* hour, the cron
  contract (export.py:238-241)
* ``INPUT_S3_ENDPOINT`` / ``OUTPUT_S3_ENDPOINT`` + regions — S3 endpoints.
  The reference reads the input endpoint from OUTPUT_S3_ENDPOINT
  (export.py:247-250) — a documented bug (SURVEY §2.1); we read the input
  one, with the buggy var as fallback for drop-in parity.
* ``TIMEOUT`` — job timeout in seconds, default 300 (export.py:259). The
  reference's WaitGroup abandons unfinished worker tasks
  (s3access/wg.py:27-31); here a watchdog cancels all Spark jobs and the
  CLI exits non-zero, which is the cron-friendly equivalent (the next
  invocation's idempotent write repairs the partial hour).

Trailing slashes are normalized off (the reference instead *requires* them,
export.py:276-292 — we accept both forms).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone


def _int_env(raw: str | None, default: int, name: str) -> int:
    """Env ints fail soft: compose-style passthrough of an unset host var
    arrives as the EMPTY STRING, and `TIMEOUT=300s` is a typo away — both
    should mean "use the default", not a traceback before preflight."""
    if raw is None or raw.strip() == "":
        return default
    try:
        return int(raw)
    except ValueError:
        import logging

        logging.getLogger(__name__).warning(
            "%s=%r is not an integer; using default %d", name, raw, default
        )
        return default


def previous_hour(now: datetime | None = None) -> str:
    """The reference's default unit of work: the hour before now, UTC
    (cmd/export.py:238-241)."""
    now = now or datetime.now(timezone.utc)
    return (now - timedelta(hours=1)).strftime("%Y-%m-%d-%H")


@dataclass(frozen=True)
class JobConfig:
    src: str
    dst: str
    tracking_dst: str | None
    hour: str
    input_endpoint: str | None
    output_endpoint: str | None
    input_region: str | None
    output_region: str | None
    timeout: int = 300
    # opt-in byte-parity with the reference's per-partition file naming
    # (cmd/export.py:147); see operators/etl.py apply_reference_filenames
    reference_filenames: bool = False

    @classmethod
    def from_env(cls, env: dict[str, str] | None = None) -> "JobConfig":
        e = os.environ if env is None else env

        def norm(v: str | None) -> str | None:
            return v.rstrip("/") if v else v

        src, dst = norm(e.get("SRC")), norm(e.get("DST"))
        if not src or not dst:
            raise ValueError("SRC and DST are required")
        return cls(
            src=src,
            dst=dst,
            tracking_dst=norm(e.get("TRACKING_DST")),
            hour=e.get("HOUR") or previous_hour(),
            input_endpoint=e.get("INPUT_S3_ENDPOINT")
            or e.get("OUTPUT_S3_ENDPOINT"),
            output_endpoint=e.get("OUTPUT_S3_ENDPOINT"),
            input_region=e.get("INPUT_S3_ENDPOINT_REGION"),
            output_region=e.get("OUTPUT_S3_ENDPOINT_REGION"),
            timeout=_int_env(e.get("TIMEOUT"), 300, "TIMEOUT"),
            reference_filenames=(e.get("REFERENCE_FILENAMES") or "").lower()
            in ("1", "true", "yes"),
        )

    def s3a_conf(self) -> dict[str, str]:
        """Hadoop S3A settings equivalent to the reference's s3fs factory
        (cmd/export.py:59-76): endpoint + bucket-owner-full-control ACL."""
        conf: dict[str, str] = {}
        endpoint = self.output_endpoint or self.input_endpoint
        if endpoint:
            conf["spark.hadoop.fs.s3a.endpoint"] = endpoint
        if self.output_region or self.input_region:
            conf["spark.hadoop.fs.s3a.endpoint.region"] = (
                self.output_region or self.input_region  # type: ignore[assignment]
            )
        conf["spark.hadoop.fs.s3a.acl.default"] = "BucketOwnerFullControl"
        return conf
