"""Measure the BPE replace-fold's Catalyst cliff vs merge count, and the
arrow path's flatness (VERDICT r8 item 1; results table in BASELINE.md).

The fold builds ONE nested ``replace()`` expression per merge, so two
costs grow with the merge count R: driver-side Catalyst analysis/codegen
of an R-deep tree (one-off per query), and O(R · doc_len) per-row
character scanning (per-row, but vectorized JVM code). The arrow path is
a pandas UDF whose per-row cost is dominated by the memoized pre-token
cache hit rate, flat in R once the table is broadcast.

Usage:  PYTHONPATH=/root/repo python tools/bpe_scale.py [sf_dir]
Prints one JSON line per (impl, n_merges) point:
  {"impl": "fold", "n_merges": 512, "analysis_sec": ..., "exec_sec": ...}
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from s3_access_logs_spark.functions import bpe as B

FOLD_POINTS = (91, 128, 192, 256, 320, 384, 448, 512)
ARROW_POINTS = (91, 256, 512, 4096, 16384, 50000)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")
    docs = docs.limit(2000).cache()
    n_docs = docs.count()

    # one big structurally-valid table; each point takes a rank prefix,
    # so point N's merges are exactly point M's first N for M > N
    table = B.synthetic_merges(max(max(FOLD_POINTS), max(ARROW_POINTS)))

    for impl, points in (("fold", FOLD_POINTS), ("arrow", ARROW_POINTS)):
        for n in points:
            ms = table[:n]
            t0 = time.time()
            try:
                col = (
                    B.bpe_token_count_exact("text", ms)
                    if impl == "fold"
                    else B.bpe_token_count_arrow("text", ms)
                )
                # .select is where the column-node -> Catalyst expression
                # conversion recurses over the R-deep tree: the fold's
                # StackOverflow cliff fires HERE, before analysis proper
                q = docs.select(F.sum(col).alias("total"))
                q._jdf.queryExecution().executedPlan()  # analysis+planning
                t1 = time.time()
                total = q.collect()[0]["total"]
                t2 = time.time()
            except Exception as e:  # noqa: BLE001 — the cliff IS the result
                print(
                    json.dumps(
                        {
                            "impl": impl,
                            "n_merges": n,
                            "error": f"{type(e).__name__}: {str(e)[:120]}",
                        }
                    ),
                    flush=True,
                )
                continue
            print(
                json.dumps(
                    {
                        "impl": impl,
                        "n_merges": n,
                        "n_docs": n_docs,
                        "analysis_sec": round(t1 - t0, 2),
                        "exec_sec": round(t2 - t1, 2),
                        "total_tokens": total,
                    }
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
