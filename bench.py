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


def _curate_flagship(spark, sf_dir: str):
    """The composed LLM-curation pipeline at full stack — quality +
    language gates, MinHash near-dup, SemDeDup semantic stage — no write
    (VERDICT r5 item 5: the flagship needs a per-round BENCH row, not
    ad-hoc BASELINE notes). Executing the waterfall report executes the
    whole gate stack once (single lazy flags frame)."""
    from s3_access_logs_spark.operators.curate import curate_corpus
    from s3_access_logs_spark.plans.vector_queries import _cached_centroids
    from s3_access_logs_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    _, report = curate_corpus(
        docs,
        min_quality=0.5,
        langs=("en",),
        near_dup=True,
        embeddings=emb,
        semantic_threshold=0.3,
        semantic_centroids=_cached_centroids(spark, sf_dir),
    )
    return report


def _export_flagship(spark, sf_dir: str):
    """The one-call corpus→shards export at production window size
    (round 10, VERDICT r9 item 2): quality+language curate, exact
    demo-vocab token ids with EOS boundaries, 256-id windows, 8
    hash shards written to a scratch dir. The returned report frame is
    tiny; the timed work is the composed curate → tokenize → pack →
    shard-write pipeline."""
    import shutil
    import tempfile

    from s3_access_logs_spark.operators.export import export_training_set
    from s3_access_logs_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    td = tempfile.mkdtemp(prefix="bench_export_")
    try:
        _, report = export_training_set(
            docs,
            f"{td}/shards",
            n_shards=8,
            window_ids=256,
            curate={"min_quality": 0.5, "langs": ("en",)},
        )
    finally:
        shutil.rmtree(td, ignore_errors=True)
    return report


_TOKEN_STORE: str | None = None


def _repack_flagship(spark, sf_dir: str):
    """The cheap-epoch path as its own bench row (round 11): windows
    for a fresh epoch salt from a materialized token store. The store
    itself is built ONCE per process (same curate knobs as the export
    flagship) during the untimed warm-up pass — the row times exactly
    what a new epoch costs: store scan → order projection → pack →
    shard write."""
    import atexit
    import shutil
    import tempfile

    from s3_access_logs_spark.operators.export import (
        repack_epoch,
        write_token_store,
    )
    from s3_access_logs_spark.sources.tables import load_table

    global _TOKEN_STORE
    if _TOKEN_STORE is None:
        td = tempfile.mkdtemp(prefix="bench_token_store_")
        atexit.register(shutil.rmtree, td, ignore_errors=True)
        write_token_store(
            load_table(spark, sf_dir, "documents"),
            f"{td}/store",
            n_shards=8,
            curate={"min_quality": 0.5, "langs": ("en",)},
        )
        _TOKEN_STORE = td
    out = f"{_TOKEN_STORE}/epoch"
    shutil.rmtree(out, ignore_errors=True)
    return repack_epoch(
        spark, f"{_TOKEN_STORE}/store", out,
        window_ids=256, n_shards=8, order_salt="bench_epoch:",
    )


def _bpe_arrow_50k(spark, sf_dir: str):
    """The PRODUCTION BPE path as a driver-bench row (VERDICT r9 item
    4): exact token counts over the corpus under a 50k-merge synthetic
    table — the merge count real vocabularies ship, far past the fold's
    Catalyst cliff, so this exercises the Arrow encoder and its memo
    cache. Previously only BASELINE.md history covered it; a regression
    there would not have moved any BENCH_rN number."""
    from s3_access_logs_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        _bpe_token_count_50k("text").alias("n_bpe"),
    )


_SYNTH_50K = None


def _bpe_token_count_50k(col):
    """Build the 50k synthetic table once per process (7 s of driver
    rejection sampling — without the cache the bench row times table
    GENERATION, not the encoder it exists to guard)."""
    global _SYNTH_50K
    from s3_access_logs_spark.functions import bpe as B

    if _SYNTH_50K is None:
        _SYNTH_50K = B.synthetic_merges(50_000)
    return B.bpe_token_count(col, _SYNTH_50K)


def _recall_suite(
    spark,
    emb,
    cents,
    queries,
    k: int = 10,
    nprobe: int = 2,
    include_residual: bool = False,
) -> dict[str, float]:
    """recall@k vs the exact brute-force top-k for every approximate ANN
    path, over whichever corpus/quantizer the caller hands in."""
    import tempfile

    from s3_access_logs_spark.operators import similarity as S

    def pairs(df):
        got: dict[int, set[int]] = {}
        for r in df.select("query_id", "neighbor_id").collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return got

    exact = pairs(S.brute_force_topk(emb, queries, k=k))

    def recall(df) -> float:
        got = pairs(df)
        per_q = [
            len(got.get(q, set()) & hits) / len(hits)
            for q, hits in exact.items()
        ]
        return round(sum(per_q) / len(per_q), 4)

    out = {
        "embedding_ivf_topk": recall(
            S.ivf_topk(emb, queries, k=k, nprobe=nprobe, centroids=cents)
        ),
        "embedding_ann_lsh": recall(
            S.lsh_bucketed_topk(emb, queries, k=k, multiprobe=1)
        ),
    }
    with tempfile.TemporaryDirectory() as td:
        idx = f"{td}/ivfpq"
        cb_cents, codebook = S.build_ivfpq_index(
            emb, idx, centroids=cents
        )
        out["ivfpq_adc"] = recall(
            S.probe_ivfpq_index(
                spark, idx, queries, cb_cents, codebook, k=k, nprobe=nprobe
            )
        )
        out["ivfpq_refine"] = recall(
            S.probe_ivfpq_index(
                spark,
                idx,
                queries,
                cb_cents,
                codebook,
                k=k,
                nprobe=nprobe,
                refine_corpus=emb,
            )
        )
        if include_residual:
            # round-7 residual encoding: codes describe the within-cell
            # offset, not the cell position raw PQ wastes its budget on
            ridx = f"{td}/ivfpq_res"
            r_cents, r_cb = S.build_ivfpq_index(
                emb, ridx, centroids=cents, residual=True
            )
            out["ivfpq_adc_residual"] = recall(
                S.probe_ivfpq_index(
                    spark, ridx, queries, r_cents, r_cb,
                    k=k, nprobe=nprobe, residual=True,
                )
            )
            out["ivfpq_refine_residual"] = recall(
                S.probe_ivfpq_index(
                    spark, ridx, queries, r_cents, r_cb,
                    k=k, nprobe=nprobe, residual=True, refine_corpus=emb,
                )
            )
    return out


def _recall_at_k(spark, sf_dir: str, k: int = 10) -> dict[str, float]:
    """Relative regression signal (VERDICT r5 item 4): recall on the
    driver's near-random embeddings — every quantizer sits near its
    worst case here, so only a DROP means anything."""
    from pyspark.sql import functions as F

    from s3_access_logs_spark.plans.vector_queries import _cached_centroids
    from s3_access_logs_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    cents = _cached_centroids(spark, sf_dir)
    return _recall_suite(spark, emb, cents, queries, k=k, nprobe=2)


def _recall_clustered(spark, k: int = 10) -> dict[str, float]:
    """Absolute quality signal (VERDICT r6 item 2): the same ANN paths
    over seeded Gaussian blobs (sources/synthetic.py), where the true
    top-k is intra-blob by construction and IVF probing the right cells
    MUST recover it — ``floor`` is the asserted minimum for IVF at
    nprobe=4 (also pinned by tests/test_recall_clustered.py), so a real
    quantizer bug fails loudly instead of hiding in the near-random
    corpus's noise floor."""
    from pyspark.sql import functions as F

    from s3_access_logs_spark.operators.similarity import label_centroids
    from s3_access_logs_spark.sources.synthetic import clustered_embeddings

    emb = clustered_embeddings(spark).persist()
    try:
        queries = emb.filter(F.col("vec_id") < 8)
        cents = label_centroids(emb, "label", dims=64)
        out = _recall_suite(
            spark, emb, cents, queries, k=k, nprobe=4,
            include_residual=True,
        )
    finally:
        emb.unpersist()
    out["floor"] = 0.8
    out["ivf_clears_floor"] = out["embedding_ivf_topk"] >= out["floor"]
    # PQ family floors (VERDICT r7 item 1): the residual construction is
    # the production config (refine-when-residual codebook default,
    # measured ADC 0.2875 / refine 0.70 on this deterministic corpus) —
    # asserted so a PQ quality regression FAILS instead of printing a
    # smaller number; also pinned in tests/test_recall_clustered.py.
    out["pq_floor_adc_residual"] = 0.25
    out["pq_floor_refine_residual"] = 0.5
    # raw (non-residual) floors (VERDICT r8 item 4): the raw path is
    # legitimately weaker on this corpus (codes re-describe the blob
    # position — measured ADC 0.15 / refine 0.4125), but "weaker" must
    # not become "silently collapsing"; margins sit under the measured
    # values the same way the residual floors do. Also pinned in
    # tests/test_recall_clustered.py.
    out["pq_floor_adc_raw"] = 0.1
    out["pq_floor_refine_raw"] = 0.3
    out["pq_clears_floor"] = (
        out["ivfpq_adc_residual"] >= out["pq_floor_adc_residual"]
        and out["ivfpq_refine_residual"] >= out["pq_floor_refine_residual"]
        and out["ivfpq_adc"] >= out["pq_floor_adc_raw"]
        and out["ivfpq_refine"] >= out["pq_floor_refine_raw"]
    )
    return out


def _streaming_ingest_rate(spark, sf_dir: str, batches: int = 8) -> dict:
    """Streaming throughput row (VERDICT r6 item 6): drive the full
    ingest pipeline — quality + PII gates, exact-digest, MinHash
    near-dup AND semantic-IVF stores — over the sf documents corpus
    split into JSONL files at one file per micro-batch, and report
    docs/s over the whole drain.

    TWO regimes (VERDICT r7 item 4): the many-small-batches point
    (``batches`` micro-batches) is micro-batch-overhead bound (~3.5
    s/batch floor at sf0.1 — the headline docs/s there mostly measures
    trigger latency), while the production-batch point (same corpus, 2
    micro-batches) is compute bound and shows the real per-doc gate
    cost. Reporting both keeps a gate-cost regression visible against
    the right floor instead of hiding inside trigger overhead.

    WARM-FENCED (VERDICT r8 item 8): the first streaming drain of a
    session pays one-off costs — Python-worker pool spin-up, Arrow
    serializer init, stream-machinery classloading — that made the r8
    1× asset row read 8× slower than its 10× twin. An UNTIMED 200-doc
    warm drain runs first so every reported row measures the pipeline,
    not the session's cold start."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from s3_access_logs_spark.plans.vector_queries import _cached_centroids
    from s3_access_logs_spark.sources.tables import load_table
    from s3_access_logs_spark.streaming import ingest_documents_stream

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    # semantic gate inputs: the embeddings table keyed to doc ids (docs
    # without a vector pass un-probed — the gate's documented rule)
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    cents = _cached_centroids(spark, sf_dir)

    def drain(
        n_batches: int, semantic: bool, corpus=None
    ) -> tuple[float, int]:
        td = tempfile.mkdtemp(prefix="bench_stream_")
        try:
            src = f"{td}/in"
            # setup, not timed: the corpus as n JSONL files so
            # maxFilesPerTrigger=1 yields exactly n micro-batches
            (corpus if corpus is not None else docs).repartition(
                n_batches
            ).write.json(src)
            kw = (
                dict(
                    semantic_index=f"{td}/ivf",
                    semantic_centroids=cents,
                    semantic_embeddings=emb,
                    semantic_threshold=0.99,
                )
                if semantic
                else {}
            )
            t0 = time.perf_counter()
            ingest_documents_stream(
                spark,
                src,
                f"{td}/store",
                f"{td}/ckpt",
                min_quality=0.2,
                scrub_pii=True,
                band_store=f"{td}/bands",
                max_files_per_trigger=1,
                **kw,
            ).awaitTermination()
            elapsed = time.perf_counter() - t0
            kept = spark.read.parquet(f"{td}/store").count()
            return elapsed, kept
        finally:
            shutil.rmtree(td, ignore_errors=True)

    # untimed warm fence: one tiny drain through the full 5-gate stack
    # absorbs the session's one-off streaming costs (see docstring)
    drain(1, semantic=True, corpus=docs.limit(200))
    # headline regime: same 4-gate stack as every prior round, so the
    # round-over-round docs/s comparison stays apples-to-apples
    sec, kept = drain(batches, semantic=False)
    # production regime: compute-bound batch size AND the full 5-gate
    # stack (semantic-IVF included) — where a per-doc gate-cost
    # regression actually shows against the right floor
    prod_sec, prod_kept = drain(2, semantic=True)
    return {
        "warm_fenced": True,
        "docs_per_sec": round(n_docs / sec, 1),
        "docs": n_docs,
        "kept": kept,
        "batches": batches,
        "sec": round(sec, 4),
        "gates": ["quality", "pii_scrub", "exact_digest", "minhash_bands"],
        "docs_per_sec_production": round(n_docs / prod_sec, 1),
        "production_batches": 2,
        "production_sec": round(prod_sec, 4),
        "production_kept": prod_kept,
        "production_gates": [
            "quality", "pii_scrub", "exact_digest", "minhash_bands",
            "semantic_ivf",
        ],
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    bench_all = "--all" in sys.argv
    queries = {
        name: q
        for name, q in sorted(load_all().items())
        # folds re-execute their members (review r6): benching them under
        # --all would triple-run every folded member and double-count its
        # work in the output, so only granular entries are ever timed
        if (bench_all or q.bench) and not q.members
    }
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    # eager: the 50k synthetic merges table costs ~7 s of driver-side
    # rejection sampling — built HERE, before any timing starts, so no
    # run of the bpe_arrow_50k row (warm-up included) can ever mix table
    # generation into an encoder measurement (ADVICE r10)
    _bpe_token_count_50k("text")
    timings: dict[str, float] = {}
    builders = {name: q.builder for name, q in queries.items()}
    builders["curate_corpus"] = _curate_flagship  # flagship pipeline row
    builders["export_training_set"] = _export_flagship  # corpus→shards
    builders["repack_epoch"] = _repack_flagship  # cheap-epoch path
    builders["bpe_arrow_50k"] = _bpe_arrow_50k  # production-vocab path
    runs_of = {
        name: (3 if "iterative" in q.tags else 2)
        for name, q in queries.items()
    }
    for name, build in builders.items():
        df = build(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm-up
        best = float("inf")
        runs = runs_of.get(name, 2)
        for _ in range(runs):  # best-of-N: a GC pause / scheduler hiccup
            t0 = time.perf_counter()  # can't inflate a query's number
            build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        # computed before the print so a recall-job failure (full /tmp,
        # index-build error) can't discard the minutes of wall-time
        # measurements it was meant to sit next to (review r6)
        recall = _recall_at_k(spark, sf_dir)
    except Exception as e:  # noqa: BLE001 — secondary metric, keep timings
        recall = {"error": f"{type(e).__name__}: {e}"}
    try:
        recall_clustered = _recall_clustered(spark)
    except Exception as e:  # noqa: BLE001 — secondary metric, keep timings
        recall_clustered = {"error": f"{type(e).__name__}: {e}"}
    try:
        ingest_rate = _streaming_ingest_rate(spark, sf_dir)
    except Exception as e:  # noqa: BLE001 — secondary metric, keep timings
        ingest_rate = {"error": f"{type(e).__name__}: {e}"}
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "recall_at_10": recall,
                "recall_at_10_clustered": recall_clustered,
                "streaming_ingest_rate": ingest_rate,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
