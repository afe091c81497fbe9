"""Stage-isolation profiler for the bench flagships (optimization r13,
guide §1.1): times each internal stage of curate_corpus /
export_training_set in the bench's own configuration with the noop sink,
so the whole-row seconds decompose into attackable parts. Methodology
matches ab_queries.py (one untimed warm-up, then best-of-N).

Usage: python tools/profile_flagships.py [--runs N]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from s3_access_logs_spark.session import get_spark  # noqa: E402
from s3_access_logs_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=", 1)[1])
    spark = get_spark("profile_flagships")
    spark.sparkContext.setLogLevel("ERROR")

    from s3_access_logs_spark.functions import bpe as B
    from s3_access_logs_spark.functions.text import lang_id, quality_score
    from s3_access_logs_spark.operators.curate import curate_corpus
    from s3_access_logs_spark.operators.dedup import (
        dedup_clusters,
        normalized_digest,
    )
    from s3_access_logs_spark.operators.layout import (
        pack_id_windows,
        training_shards,
    )
    from s3_access_logs_spark.operators.similarity import semantic_dedup
    from s3_access_logs_spark.plans.vector_queries import _cached_centroids

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    cents = _cached_centroids(spark, sf_dir)
    ms = list(B.default_merges())
    vs = B.bpe_vocab(ms)
    eos = len(vs)

    def gates(d):
        return (
            d.withColumn(
                "_f_empty",
                F.col("text").isNull() | (F.trim("text") == ""),
            )
            .withColumn("_f_quality", quality_score("text") < 0.5)
            .withColumn("_f_language", ~lang_id("text").isin("en"))
        )

    def survivors(d):
        from pyspark.sql import Window

        g = gates(d)
        fail = (
            F.col("_f_empty") | F.col("_f_quality") | F.col("_f_language")
        )
        w = Window.partitionBy(normalized_digest(F.col("text"))).orderBy(
            fail.cast("int"), "doc_id"
        )
        return (
            g.withColumn(
                "_f_exact",
                (F.row_number().over(w) > 1) & ~F.col("_f_empty"),
            )
            .filter(~fail & ~F.col("_f_exact"))
            .select("doc_id", "text")
        )

    def streams(d):
        return survivors(d).select(
            F.col("doc_id").alias("id"),
            F.concat(
                F.coalesce(
                    B.bpe_token_ids("text", ms, vocab=vs, unk_id=-1),
                    F.array().cast("array<int>"),
                ),
                F.array(F.lit(eos)),
            ).alias("ids"),
        )

    def packed(d):
        sharded = training_shards(
            streams(d), 8, id_col="id", salt="shards:", order_salt="order:"
        )
        return pack_id_windows(
            sharded,
            256,
            ["shard"],
            [
                F.col("shard_order"),
                F.col("id").asc_nulls_first(),
                F.col("ids"),
            ],
        )

    stages = {
        # curate_corpus decomposition (bench config)
        "curate/gates_only": lambda: gates(docs),
        "curate/survivors_exact": lambda: survivors(docs),
        "curate/dedup_clusters": lambda: dedup_clusters(
            survivors(docs), id_col="doc_id", text_col="text"
        ),
        "curate/semantic": lambda: semantic_dedup(
            survivors(docs)
            .join(
                emb.filter(
                    F.col("embedding").isNotNull()
                    & (F.size("embedding") > 0)
                ).select(
                    F.col("vec_id").alias("doc_id"),
                    F.col("embedding").alias("_emb"),
                ),
                "doc_id",
            )
            .select("doc_id", "_emb"),
            threshold=0.3,
            id_col="doc_id",
            vec_col="_emb",
            centroids=cents,
        ),
        # export decomposition (bench config: quality+lang curate)
        "export/bpe_encode": lambda: streams(docs),
        "export/pack_windows": lambda: packed(docs),
    }

    out = {}
    for name, build in stages.items():
        spark.sparkContext.setJobDescription(f"warmup: {name}")
        build().write.format("noop").mode("overwrite").save()
        best = float("inf")
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"timed[{i}]: {name}")
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 4)

    # the full flagships for reference, same process
    def full_curate():
        _, rep = curate_corpus(
            docs,
            min_quality=0.5,
            langs=("en",),
            near_dup=True,
            embeddings=emb,
            semantic_threshold=0.3,
            semantic_centroids=cents,
        )
        return rep

    spark.sparkContext.setJobDescription("warmup: curate/full")
    full_curate().write.format("noop").mode("overwrite").save()
    best = float("inf")
    for i in range(runs):
        spark.sparkContext.setJobDescription(f"timed[{i}]: curate/full")
        t0 = time.perf_counter()
        full_curate().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    out["curate/full"] = round(best, 4)

    import bench as _b

    spark.sparkContext.setJobDescription("warmup: export/full")
    _b._export_flagship(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    best = float("inf")
    for i in range(runs):
        spark.sparkContext.setJobDescription(f"timed[{i}]: export/full")
        t0 = time.perf_counter()
        _b._export_flagship(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best, time.perf_counter() - t0)
    out["export/full"] = round(best, 4)
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
