"""One-off attribution probe: times curate_corpus's report at sf0.1
under cumulative stage configurations, so the full-row seconds decompose
into in-context stage deltas (guide §1.1). Methodology = ab_queries
(one untimed warm-up, then best-of-N per variant).

Usage: python tools/curate_variants.py [--runs N]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from s3_access_logs_spark.session import get_spark  # noqa: E402
from s3_access_logs_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=", 1)[1])
    spark = get_spark("curate_variants")
    spark.sparkContext.setLogLevel("ERROR")

    from s3_access_logs_spark.operators.curate import curate_corpus
    from s3_access_logs_spark.plans.vector_queries import _cached_centroids

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    cents = _cached_centroids(spark, sf_dir)

    variants = {
        "gates_report": dict(min_quality=0.5, langs=("en",)),
        "plus_near_dup": dict(min_quality=0.5, langs=("en",), near_dup=True),
        "plus_semantic(full)": dict(
            min_quality=0.5,
            langs=("en",),
            near_dup=True,
            embeddings=emb,
            semantic_threshold=0.3,
            semantic_centroids=cents,
        ),
        "semantic_only": dict(
            min_quality=0.5,
            langs=("en",),
            embeddings=emb,
            semantic_threshold=0.3,
            semantic_centroids=cents,
        ),
    }

    out = {}
    for name, kw in variants.items():
        def build():
            _, rep = curate_corpus(docs, **kw)
            return rep

        spark.sparkContext.setJobDescription(f"warmup: {name}")
        build().write.format("noop").mode("overwrite").save()
        best = float("inf")
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"timed[{i}]: {name}")
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 4)
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
