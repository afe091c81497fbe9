"""Deterministic production-regime probes (VERDICT r13 item 5, guide §1
measurement discipline): reproduces, from synthesized-in-Spark data, the
two scale points that justified round 13's biggest claimed wins but
previously lived only in the builder's session:

* ``assign_fold``  — `_assign_clusters(..., impl='fold')` over 64k rows
  x 64 dims x nlist=256: the compute-dominated regime where the r13
  dot-once rewrite measured 0.70x (assignment FLOPs dominate; at bench
  scale nlist=10 the saved fold is noise).
* ``semantic_dedup`` — 64k base rows + 6.5k exact clones x 64 dims x
  nlist=256: the regime where the r13 posting-array rewrite measured
  0.75x (clones guarantee a real dominated population).
* ``assign_arrow`` — same data through the mapInPandas/BLAS impl, the
  production default at nlist>=128, for context.

Everything is derived from ``xxhash64`` over literals, so the data (and
the timings' workload) are bit-identical across runs and machines — no
RNG, no files. Methodology matches tools/ab_queries.py: one untimed
warm-up, then best-of-N noop-sink runs, one JSON line out.

Usage: python tools/profile_production.py [--runs N]
Env:   SPARK_GRAFT_CPUS (the bench contract; master local[$CPUS]).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from s3_access_logs_spark.session import get_spark  # noqa: E402

N_BASE = 64_000
N_CLONES = 6_500
DIMS = 64
NLIST = 256


def _vec(id_col, salt: str):
    """64 deterministic doubles in [-1, 1) from xxhash64(salt, id, j)."""
    return F.array(
        *[
            (
                F.pmod(
                    F.xxhash64(F.lit(salt), id_col, F.lit(j)), F.lit(2000)
                ).cast("double")
                / F.lit(1000.0)
                - F.lit(1.0)
            )
            for j in range(DIMS)
        ]
    )


def _timed(spark, name: str, build, runs: int) -> float:
    spark.sparkContext.setJobDescription(f"warmup: {name}")
    build().write.format("noop").mode("overwrite").save()
    best = float("inf")
    for i in range(runs):
        spark.sparkContext.setJobDescription(f"timed[{i}]: {name}")
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    return round(best, 4)


def main() -> None:
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=", 1)[1])
    spark = get_spark("profile_production")
    spark.sparkContext.setLogLevel("ERROR")

    from s3_access_logs_spark.operators.similarity import (
        _assign_clusters,
        semantic_dedup,
    )

    base = spark.range(N_BASE).select(
        F.col("id"), _vec(F.col("id"), "corpus").alias("embedding")
    )
    # exact clones of the first N_CLONES base vectors under fresh ids:
    # guaranteed dominated pairs for the dedup probe (cosine == 1)
    clones = spark.range(N_CLONES).select(
        (F.col("id") + F.lit(N_BASE)).alias("id"),
        _vec(F.col("id"), "corpus").alias("embedding"),
    )
    corpus = base.unionByName(clones).withColumn("label", F.lit("x"))
    cents = spark.range(NLIST).select(
        F.col("id").alias("label"), _vec(F.col("id"), "cents").alias("centroid")
    )

    from s3_access_logs_spark.functions.vectors import l2_norm

    def assign(impl: str):
        c = base.select(
            "id",
            F.col("embedding").alias("v"),
            l2_norm("embedding").alias("n"),
        )
        return _assign_clusters(c, cents, "v", 1, impl=impl)

    out = {
        "assign_fold": _timed(
            spark, "assign_fold 64k x nlist=256", lambda: assign("fold"), runs
        ),
        "assign_arrow": _timed(
            spark,
            "assign_arrow 64k x nlist=256",
            lambda: assign("arrow"),
            runs,
        ),
        "semantic_dedup": _timed(
            spark,
            "semantic_dedup 70.5k x nlist=256",
            lambda: semantic_dedup(
                corpus, id_col="id", vec_col="embedding", centroids=cents
            ),
            runs,
        ),
        "rows": N_BASE + N_CLONES,
        "dims": DIMS,
        "nlist": NLIST,
        "runs": runs,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
