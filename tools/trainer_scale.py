"""Distributed vs in-driver BPE trainer: the round-12 scale point.

Protocol: one `local[32]` session, warm fence (one tiny distributed
train absorbing Arrow/worker spin-up), then per corpus: the in-driver
trainer (`train_bpe_from_corpus` — deterministic 1024-doc sample,
collect, pure-Python Sennrich loop) and the distributed trainer
(`train_bpe_distributed` — FULL-corpus pair counts per iteration,
driver argmax only), both at 64 merges, warm best-of-2. The two
compute different things by design (sample vs full corpus); the row
records that full-corpus counting is AFFORDABLE and how its cost
scales, not a race on equal work.

Usage: python tools/trainer_scale.py [sf_dir ...]
Prints one JSON line per (corpus, trainer).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from s3_access_logs_spark.functions.bpe import (  # noqa: E402
    train_bpe_distributed,
    train_bpe_from_corpus,
)
from s3_access_logs_spark.session import get_spark  # noqa: E402
from s3_access_logs_spark.sources.tables import load_table  # noqa: E402

MERGES = 64


def _best_of(n, fn):
    best = float("inf")
    out = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sf100_scaled"]
    spark = get_spark("trainer-scale")
    spark.sparkContext.setLogLevel("ERROR")
    # warm fence
    warm = load_table(spark, "/root/testdata/sf0.01", "documents")
    train_bpe_distributed(warm, num_merges=4, min_freq=1)
    for sf in dirs:
        docs = load_table(spark, sf, "documents").select("text")
        n = docs.count()
        sec_d, md = _best_of(
            2, lambda: train_bpe_distributed(docs, num_merges=MERGES)
        )
        sec_s, ms = _best_of(
            2, lambda: train_bpe_from_corpus(docs, num_merges=MERGES)
        )
        print(json.dumps({
            "sf": sf, "docs": n, "merges": MERGES,
            "distributed_full_corpus_sec": round(sec_d, 2),
            "driver_sampled_sec": round(sec_s, 2),
            "n_merges_distributed": len(md),
            "n_merges_driver": len(ms),
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
