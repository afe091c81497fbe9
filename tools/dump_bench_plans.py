"""Dump `.explain("formatted")` for every bench-set query (and the bench
flagship builders) into plans/<round>/<query>_<tag>.txt (round via
$PLANS_ROUND, default r14).

Usage: python tools/dump_bench_plans.py <tag> [sf_dir] [query ...]

The iterative/eager builders (dedup_clusters, curate_corpus flagship,
export/repack flagships) execute jobs at build time; for those we capture
the plan of the final returned frame — the iterative loop's per-round
plans are pinned by their own docstrings/tests, and the returned frame's
plan is what the noop sink times last.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, ".")

from s3_access_logs_spark.plans.catalog import load_all  # noqa: E402
from s3_access_logs_spark.session import get_spark  # noqa: E402


def fmt(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    tag = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3:])
    import os

    out_dir = Path("plans") / os.environ.get("PLANS_ROUND", "r14")
    out_dir.mkdir(parents=True, exist_ok=True)
    queries = {
        name: q.builder
        for name, q in sorted(load_all().items())
        if q.bench and not q.members
    }
    import bench as B

    queries["curate_corpus"] = B._curate_flagship
    queries["export_training_set"] = B._export_flagship
    queries["repack_epoch"] = B._repack_flagship
    queries["bpe_arrow_50k"] = B._bpe_arrow_50k
    if only:
        queries = {n: b for n, b in queries.items() if n in only}
    spark = get_spark("dump_bench_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name, build in queries.items():
        try:
            df = build(spark, sf_dir)
            (out_dir / f"{name}_{tag}.txt").write_text(fmt(df))
            print(f"wrote {name}_{tag}.txt")
        except Exception as e:  # noqa: BLE001
            print(f"SKIP {name}: {type(e).__name__}: {e}")
    spark.stop()


if __name__ == "__main__":
    main()
