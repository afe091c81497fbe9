"""Focused query timer for optimization A/Bs: times ONLY the named
catalog queries (or bench flagships) with the bench.py methodology —
one untimed warm-up, then best-of-N noop-sink runs — and prints one
JSON line {name: sec}. Run once per leg in a fresh process; interleave
legs (A B A B) and take per-leg bests to cancel machine drift.

Usage: python tools/ab_queries.py <query> [query ...] [--runs N]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (the bench contract).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from s3_access_logs_spark.plans.catalog import load_all  # noqa: E402
from s3_access_logs_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=", 1)[1])
    catalog = load_all()
    builders = {}
    for name in args:
        if name in catalog:
            builders[name] = catalog[name].builder
        else:  # bench flagship rows (curate_corpus etc.)
            import bench

            builders[name] = {
                "curate_corpus": bench._curate_flagship,
                "export_training_set": bench._export_flagship,
                "repack_epoch": bench._repack_flagship,
                "bpe_arrow_50k": bench._bpe_arrow_50k,
            }[name]
    spark = get_spark("ab_queries")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name, build in builders.items():
        spark.sparkContext.setJobDescription(f"warmup: {name}")
        build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"timed[{i}]: {name}")
            t0 = time.perf_counter()
            build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 4)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
