"""Token-store compaction: cost + post-compaction repack speedup at
scale (round 12, VERDICT r11 item 3's measurement half).

Protocol (the stream_decade conventions): `local[32]`, one session, a
scaled corpus (make_scaled_sf.py) written as ``n_files`` JSONL inputs
and drained with ``maxFilesPerTrigger=1`` — so the shard store ends
with ``n_files`` ``batch_id`` leaves per shard, the small-files state a
long-lived stream accumulates (months of streaming = thousands of
leaves; the measured trend per decade is the claim, not the absolute).
The drain itself is UNTIMED (it is the already-measured ingest path);
an untimed warm repack runs first (the r9 warm fence), then:

  repack_pre   — repack_epoch over the fragmented store, warm best-of-2
  compact_sec  — compact_token_store(keep_recent=0), timed once
  repack_post  — repack_epoch over the folded store, warm best-of-2

Usage:
    python tools/make_scaled_sf.py /root/testdata/sf0.1 /tmp/sf10_scaled \
        10 documents,embeddings
    python tools/compact_decade.py /tmp/sf10_scaled [n_files=16]

Prints ONE JSON line:
  {"docs": N, "n_files": F, "leaves_before": L0, "leaves_after": L1,
   "repack_pre_sec": A, "compact_sec": C, "repack_post_sec": B,
   "speedup": A/B}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from s3_access_logs_spark.operators.export import repack_epoch  # noqa: E402
from s3_access_logs_spark.session import get_spark  # noqa: E402
from s3_access_logs_spark.streaming import (  # noqa: E402
    ingest_documents_stream,
)
from s3_access_logs_spark.streaming.pipeline import (  # noqa: E402
    compact_token_store,
)


def _count_leaves(shards: str) -> int:
    n = 0
    for d in os.listdir(shards):
        if d.startswith("shard="):
            n += sum(
                1
                for b in os.listdir(os.path.join(shards, d))
                if b.startswith("batch_id=")
            )
    return n


def main() -> None:
    sf_dir = sys.argv[1]
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("compact-decade")
    work = tempfile.mkdtemp(prefix="compact_decade_")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        n_docs = docs.count()
        src = f"{work}/in"
        (
            docs.repartition(n_files)
            .select(F.to_json(F.struct("doc_id", "text")).alias("value"))
            .write.text(src)
        )
        shards = f"{work}/shards"
        print(
            f"# draining {n_docs} docs in {n_files} batches (untimed)",
            file=sys.stderr,
        )
        ingest_documents_stream(
            spark, src, f"{work}/store", f"{work}/ckpt",
            shard_store=shards, n_shards=8,
            max_files_per_trigger=1,
        ).awaitTermination()
        leaves_before = _count_leaves(shards)

        def timed_repack(tag: str) -> float:
            best = None
            for rep in range(2):
                dst = f"{work}/re_{tag}_{rep}"
                t0 = time.monotonic()
                repack_epoch(
                    spark, shards, dst, window_ids=256, n_shards=8,
                    order_salt="ep1:",
                ).count()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
                shutil.rmtree(dst, ignore_errors=True)
            return best

        # warm fence: first touch of the store + arrow path, untimed
        repack_epoch(
            spark, shards, f"{work}/warm", window_ids=256, n_shards=8
        ).count()
        shutil.rmtree(f"{work}/warm", ignore_errors=True)

        pre = timed_repack("pre")
        t0 = time.monotonic()
        compact_token_store(spark, shards, keep_recent=0)
        compact_sec = time.monotonic() - t0
        leaves_after = _count_leaves(shards)
        post = timed_repack("post")
        print(json.dumps({
            "docs": n_docs,
            "n_files": n_files,
            "leaves_before": leaves_before,
            "leaves_after": leaves_after,
            "repack_pre_sec": round(pre, 3),
            "compact_sec": round(compact_sec, 3),
            "repack_post_sec": round(post, 3),
            "speedup": round(pre / post, 3) if post else None,
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
