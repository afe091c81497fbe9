"""Benchmark harness: runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query runs once as warm-up (JVM/codegen warm, file listing cached,
NOT counted), then best-of-2 — best-of-3 for queries tagged
``iterative``, whose multi-job lineage makes a single GC pause or
scheduler hiccup look like a real regression (the driver measured
dedup_clusters 3.83 s where an idle machine gives 2.06 s; VERDICT r4
item 7). ``--all`` benches every catalog query instead of the
bench=True subset.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from s3_access_logs_spark.plans.catalog import load_all  # noqa: E402
from s3_access_logs_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    bench_all = "--all" in sys.argv
    queries = {
        name: q
        for name, q in sorted(load_all().items())
        if bench_all or q.bench
    }
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    for name, q in queries.items():
        df = q.builder(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm-up
        best = float("inf")
        runs = 3 if "iterative" in q.tags else 2
        for _ in range(runs):  # best-of-N: a GC pause / scheduler hiccup
            t0 = time.perf_counter()  # can't inflate a query's number
            q.builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
