"""Streaming ingest vs store depth: the decade measurement (VERDICT r8
item 5 closes the third decade).

Protocol (identical to the round-8 10x measurement, BASELINE.md):
`local[32]`, one session, `maxFilesPerTrigger=1`, 4 input files per
drain, FULL 5-gate stack (quality + pii + exact-digest + MinHash bands
+ semantic-IVF). The scaled corpus is split into two DISJOINT halves
(copy parity, so each half is a self-consistent sub-corpus) drained
SEQUENTIALLY into the same stores: drain 1 probes stores already
holding drain 0's full digest/band/IVF mass — store growth measured
the way a production stream experiences it. An untimed warm drain runs
first (VERDICT r8 item 8) so drain 0 is not charged the session's
Arrow/worker spin-up.

Usage:
    python tools/make_scaled_sf.py /root/testdata/sf0.1 /tmp/sf100_scaled \
        100 documents,embeddings
    python tools/stream_decade.py /tmp/sf100_scaled [copies=100] [mode=text]

Prints one JSON line per drain:
  {"drain": 0, "docs": N, "sec": S, "docs_per_sec": R,
   "store_docs_before": D, "store_vecs_before": V}

``mode=assets`` runs the multimodal twin instead: the image slice of
the scaled corpus (doc_id % 3 == 0) through ``synthesize_assets
(pixels=True)`` and ``ingest_assets_stream`` with digest + perceptual
dHash gates — the same halves-into-grown-stores protocol.

``mode=shards`` (round 11, VERDICT r10 item 6) measures the SHARD-SINK
overhead instead: the r10 interleaved A/B — the half-A corpus drained
with and without ``shard_store=`` (quality + PII + digest + band
gates, 4 batches, fresh stores+checkpoint per run, untimed warm drain
first, A B A B) — at whatever scale the given corpus is; r10 recorded
the 10× point (BASELINE.md: +0.13-0.18 ms/doc), this mode reproduces
it at 100× to close the per-doc-flat claim with data.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from s3_access_logs_spark.operators.similarity import (  # noqa: E402
    label_centroids,
)
from s3_access_logs_spark.session import get_spark  # noqa: E402
from s3_access_logs_spark.sources.tables import load_table  # noqa: E402
from s3_access_logs_spark.streaming import (  # noqa: E402
    ingest_assets_stream,
    ingest_documents_stream,
)


def _recover_offset(scaled_max: int, copies: int) -> int:
    """Invert make_scaled_sf's shift from a SCALED table's max id:
    scaled_max // copies always lands in [off*(c-1)/c, off) — the same
    digit count as off-1 — so 10^len(str(.)) is exactly the builder's
    offset for copies >= 2. copies < 2 is rejected loud (review r9):
    an unscaled corpus has no copy parity, so the halves split would
    silently put EVERY row in half A and report a meaningless
    trigger-only drain-1 rate."""
    if copies < 2:
        raise ValueError(
            f"stream_decade: copies={copies} — the halves protocol "
            "needs a scaled corpus (copies >= 2); build one with "
            "make_scaled_sf.py first"
        )
    return 10 ** len(str(scaled_max // copies))


def _run_drains(
    spark,
    td: str,
    halves,
    fmt: str,
    start_stream,
    unit: str,
    store_depth,
    extra: dict | None = None,
) -> None:
    """The halves-into-grown-stores protocol, encoded ONCE for every
    mode: ONE source dir + ONE checkpoint across both drains (the file
    source pins its root path in the checkpoint, so per-drain dirs
    would fail on drain 1); each half's part files are staged in under
    half-tagged names, so drain i processes exactly the files that are
    new since drain i-1. Staging is untimed; the drain (stream start →
    awaitTermination) is what the JSON row reports.

    ``start_stream(src)`` starts the mode's ingest against the shared
    source dir; ``store_depth(i)`` returns the store-size fields for
    drain i's row (queried BEFORE the drain); ``unit`` names the rate
    fields (docs/assets)."""
    src = f"{td}/in"
    os.makedirs(src, exist_ok=True)
    for i in (0, 1):
        stage = f"{td}/stage{i}"
        w = halves[i].repartition(4).write
        (w.json(stage) if fmt == "json" else w.parquet(stage))
        files = sorted(glob.glob(f"{stage}/part-*"))
        for j, p in enumerate(files):
            shutil.move(p, f"{src}/h{i}_{j}.{fmt}")
        n = halves[i].count()
        depth = store_depth(i)
        t0 = time.perf_counter()
        start_stream(src).awaitTermination()
        sec = time.perf_counter() - t0
        row = {
            **(extra or {}),
            "drain": i,
            unit: n,
            "batches": len(files),
            "sec": round(sec, 1),
            f"{unit}_per_sec": round(n / sec, 1),
            **depth,
        }
        print(json.dumps(row), flush=True)


def assets_main(
    spark, sf_dir: str, copies: int, unique_pixels: bool = False
) -> None:
    """``unique_pixels`` (round 10, VERDICT r9 item 6): the default
    fixture formula is periodic in doc_id mod 3840, so scaled corpora
    saturate at ~1.2k distinct images and the store-depth decade was
    unmeasurable (BASELINE r9); the doc_id-seeded aperiodic mode keeps
    distinct images growing with the corpus. The clean-corpus fixtures
    (and the perceptual-dup tests that rely on the formula's
    phase-shift structure) are untouched — the switch exists only on
    this measurement path."""
    from s3_access_logs_spark.operators.multimodal import synthesize_assets

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    imgs = docs.filter(F.col("doc_id") % 3 == 0)
    # assets need no embedding alignment, so the docs-only offset
    # reconstruction suffices (the builder's shared offset is >= the
    # docs-derived one, and a larger-but-wrong off would only skew the
    # halves, never alias ids)
    doc_off = _recover_offset(docs.agg(F.max("doc_id")).first()[0], copies)
    halves = [
        synthesize_assets(
            imgs.filter(F.floor(F.col("doc_id") / doc_off) % 2 == i),
            pixels=True,
            unique_pixels=unique_pixels,
        ).select(F.col("asset_id"), F.col("payload"))
        for i in (0, 1)
    ]
    td = tempfile.mkdtemp(prefix="asset_decade_")
    try:
        # untimed warm drain (VERDICT r8 item 8: the r8 1x row was 8x
        # off purely from Arrow-UDF/worker warm-up)
        warm_src = f"{td}/warm_in"
        halves[0].limit(200).coalesce(1).write.parquet(warm_src)
        ingest_assets_stream(
            spark, warm_src, f"{td}/warm_store", f"{td}/warm_ckpt",
            fingerprint_store=f"{td}/warm_fps", max_files_per_trigger=1,
        ).awaitTermination()

        store, fps, ckpt = f"{td}/store", f"{td}/fps", f"{td}/ckpt"
        _run_drains(
            spark,
            td,
            halves,
            fmt="parquet",
            start_stream=lambda src: ingest_assets_stream(
                spark, src, store, ckpt,
                fingerprint_store=fps, max_files_per_trigger=1,
            ),
            unit="assets",
            store_depth=lambda i: {
                "store_assets_before": (
                    spark.read.parquet(store).count() if i else 0
                ),
                # the distinct-fingerprint depth is the claim under
                # test in unique_pixels mode: it must GROW with the
                # corpus instead of saturating at the fixture period
                "store_distinct_fps_before": (
                    spark.read.parquet(fps)
                    .select("w0", "w1").distinct().count()
                    if i else 0
                ),
            },
            extra={"mode": "assets", "unique_pixels": unique_pixels},
        )
    finally:
        shutil.rmtree(td, ignore_errors=True)


def shards_main(spark, sf_dir: str, copies: int) -> None:
    """Interleaved shard-sink A/B (see module docstring). One staged
    source dir serves every run — each run gets a FRESH checkpoint, so
    the file source sees all four files as new; only the stores differ
    per run. ms/doc is the headline column; the overhead claim is
    with-minus-without per interleaving."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    off = _recover_offset(docs.agg(F.max("doc_id")).first()[0], copies)
    half = docs.filter(F.floor(F.col("doc_id") / off) % 2 == 0)
    n = half.count()
    td = tempfile.mkdtemp(prefix="shard_sink_ab_")
    try:
        src = f"{td}/in"
        stage = f"{td}/stage"
        half.repartition(4).write.json(stage)
        os.makedirs(src, exist_ok=True)
        for j, p in enumerate(sorted(glob.glob(f"{stage}/part-*"))):
            shutil.move(p, f"{src}/h0_{j}.json")
        # untimed warm drain THROUGH the shard sink (its Arrow id-UDF
        # workers are part of what must be warm)
        warm_src = f"{td}/warm_in"
        half.limit(200).coalesce(1).write.json(warm_src)
        ingest_documents_stream(
            spark, warm_src, f"{td}/warm_store", f"{td}/warm_ckpt",
            min_quality=0.2, scrub_pii=True, band_store=f"{td}/warm_bands",
            shard_store=f"{td}/warm_shards", n_shards=8,
            max_files_per_trigger=1,
        ).awaitTermination()
        run = 0
        for rep in range(2):
            for sink in (False, True):
                run += 1
                kw = (
                    {"shard_store": f"{td}/shards{run}", "n_shards": 8}
                    if sink
                    else {}
                )
                t0 = time.perf_counter()
                ingest_documents_stream(
                    spark, src, f"{td}/store{run}", f"{td}/ckpt{run}",
                    min_quality=0.2, scrub_pii=True,
                    band_store=f"{td}/bands{run}",
                    max_files_per_trigger=1, **kw,
                ).awaitTermination()
                sec = time.perf_counter() - t0
                print(json.dumps({
                    "mode": "shards", "rep": rep,
                    "shard_sink": sink, "docs": n, "batches": 4,
                    "sec": round(sec, 1),
                    "docs_per_sec": round(n / sec, 1),
                    "ms_per_doc": round(1000 * sec / n, 3),
                }), flush=True)
                # free the run's stores before the next interleave leg
                for d in ("store", "ckpt", "bands", "shards"):
                    shutil.rmtree(f"{td}/{d}{run}", ignore_errors=True)
    finally:
        shutil.rmtree(td, ignore_errors=True)


def main() -> None:
    sf_dir = sys.argv[1]
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    mode = sys.argv[3] if len(sys.argv) > 3 else "text"
    spark = get_spark("stream_decade")
    spark.sparkContext.setLogLevel("ERROR")
    if mode in ("assets", "assets_unique"):
        assets_main(
            spark, sf_dir, copies, unique_pixels=(mode == "assets_unique")
        )
        spark.stop()
        return
    if mode == "shards":
        shards_main(spark, sf_dir, copies)
        spark.stop()
        return

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding", "label"
    )
    # copy parity split: make_scaled_sf shifts ids by copy*10^k, so
    # (doc_id // off) is the copy index — even copies = half A, odd =
    # half B. Disjoint, equal-size, and each half is corpus-shaped
    # (every copy is a full mutated sf0.1). The offset is SHARED
    # between documents and embeddings by the builder (so copy i docs
    # keep their vectors); recover it from the max over both tables.
    off = _recover_offset(
        max(
            docs.agg(F.max("doc_id")).first()[0],
            emb.agg(F.max("doc_id")).first()[0],
        ),
        copies,
    )
    halves = [
        docs.filter(F.floor(F.col("doc_id") / off) % 2 == i)
        for i in (0, 1)
    ]
    emb_halves = [
        emb.filter(F.floor(F.col("doc_id") / off) % 2 == i)
        for i in (0, 1)
    ]
    cents = label_centroids(emb, "label", dims=64)
    cents = spark.createDataFrame(cents.collect(), cents.schema)

    td = tempfile.mkdtemp(prefix="stream_decade_")
    try:
        # untimed warm drain: absorbs worker-pool/Arrow spin-up so the
        # first measured row is like-for-like with the second
        warm_src = f"{td}/warm_in"
        halves[0].limit(200).coalesce(1).write.json(warm_src)
        ingest_documents_stream(
            spark, warm_src, f"{td}/warm_store", f"{td}/warm_ckpt",
            min_quality=0.2, scrub_pii=True, band_store=f"{td}/warm_bands",
            semantic_index=f"{td}/warm_ivf", semantic_centroids=cents,
            semantic_embeddings=emb_halves[0].limit(200),
            semantic_threshold=0.99, max_files_per_trigger=1,
        ).awaitTermination()

        store, bands, ivf, ckpt = (
            f"{td}/store", f"{td}/bands", f"{td}/ivf", f"{td}/ckpt"
        )
        drained = {"i": 0}

        def start(src):
            q = ingest_documents_stream(
                spark, src, store, ckpt,
                min_quality=0.2, scrub_pii=True, band_store=bands,
                semantic_index=ivf, semantic_centroids=cents,
                semantic_embeddings=emb_halves[drained["i"]],
                semantic_threshold=0.99, max_files_per_trigger=1,
            )
            drained["i"] += 1
            return q

        _run_drains(
            spark,
            td,
            halves,
            fmt="json",
            start_stream=start,
            unit="docs",
            store_depth=lambda i: {
                "store_docs_before": (
                    spark.read.parquet(store).count() if i else 0
                ),
                "store_vecs_before": (
                    spark.read.parquet(ivf).count() if i else 0
                ),
            },
        )
    finally:
        shutil.rmtree(td, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
