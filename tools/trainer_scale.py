"""Distributed vs in-driver BPE trainer: scale + strategy points.

Protocol: one `local[32]` session, warm fence (one tiny distributed
train absorbing Arrow/worker spin-up), then per corpus: the in-driver
trainer (`train_bpe_from_corpus` — deterministic 1024-doc sample,
collect, pure-Python Sennrich loop) and the distributed trainer
(`train_bpe_distributed` — full-corpus pair counts, driver argmax
only) under BOTH strategies, warm best-of-2. The trainers compute
different things by design (sample vs full corpus); the rows record
that full-corpus counting is AFFORDABLE and how its cost scales, not a
race on equal work.

Round 13 additions (VERDICT r12 item 5):

* ``--equality [sf_dir]`` — the deep-horizon pin: train the sf0.01
  corpus to >= 1024 actual merges under BOTH strategies (min_freq=1)
  and assert merge-for-merge equality; prints the count and a boolean.
* ``--profile [sf_dir]`` — per-iteration wall time of each strategy in
  iteration-index BUCKETS (the merge-dimension cost curve the delta
  strategy exists to flatten): one train per strategy, per-iteration
  times sampled by wrapping the loop via num_merges increments is too
  noisy, so instead each strategy trains to N merges in one call and
  the CUMULATIVE time at checkpoints num_merges in {64, 128, 256, 512}
  is reported — recount grows ~linearly per decade of merges while
  delta's increments shrink with rank.

Usage: python tools/trainer_scale.py [sf_dir ...]
       python tools/trainer_scale.py --equality [sf_dir]
       python tools/trainer_scale.py --profile [sf_dir]
Prints one JSON line per row.
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


def _session():
    spark = get_spark("trainer-scale")
    spark.sparkContext.setLogLevel("ERROR")
    warm = load_table(spark, "/root/testdata/sf0.01", "documents")
    train_bpe_distributed(warm, num_merges=4, min_freq=1)  # warm fence
    return spark


def _rich_docs(spark, sf: str):
    """The fixture vocabulary is 31 distinct words (measured — the
    generator is formulaic), which exhausts Sennrich training at ~127
    merges; a >=1024-merge horizon needs a richer symbol space.
    Append one md5-hex word per document (deterministic in doc_id):
    unique pre-tokens then scale with the corpus and the merge horizon
    is tens of thousands."""
    from pyspark.sql import functions as F

    return load_table(spark, sf, "documents").select(
        F.concat(
            F.col("text"), F.lit(" "),
            F.md5(F.col("doc_id").cast("string")),
        ).alias("text")
    )


def run_equality(sf: str) -> None:
    spark = _session()
    docs = _rich_docs(spark, sf)
    t0 = time.perf_counter()
    d = train_bpe_distributed(
        docs, num_merges=1100, min_freq=1, strategy="delta"
    )
    t_d = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = train_bpe_distributed(
        docs, num_merges=1100, min_freq=1, strategy="recount"
    )
    t_r = time.perf_counter() - t0
    print(json.dumps({
        "row": "strategy_equality_1100",
        "sf": sf,
        "n_merges": len(d),
        "equal": d == r,
        "delta_sec": round(t_d, 1),
        "recount_sec": round(t_r, 1),
    }), flush=True)
    assert d == r, "strategy divergence — NOT recordable"
    assert len(d) >= 1024, "horizon not reached — NOT recordable"
    spark.stop()


def run_profile(sf: str) -> None:
    """The merge-dimension cost CURVE: one 512-merge train per
    strategy (min_freq=1, rich corpus), per-iteration wall times
    collected via the trainer's diagnostics hook and reported as
    64-iteration bucket means. Recount's bucket mean tracks the
    (roughly constant) full-corpus explode; delta's drops as the
    argmax pair's frequency — and with it the affected-words slice —
    falls with rank."""
    spark = _session()
    docs = _rich_docs(spark, sf)
    for strategy in ("delta", "recount"):
        times: list[float] = []
        t0 = time.perf_counter()
        out = train_bpe_distributed(
            docs, num_merges=512, min_freq=1, strategy=strategy,
            iteration_hook=lambda i, s: times.append(s),
        )
        total = time.perf_counter() - t0
        buckets = {
            f"iters_{lo + 1}_{lo + 64}": round(
                sum(times[lo:lo + 64]) / max(1, len(times[lo:lo + 64])), 3
            )
            for lo in range(0, 512, 64)
            if times[lo:lo + 64]
        }
        print(json.dumps({
            "row": "strategy_profile", "sf": sf, "strategy": strategy,
            "n_merges": len(out), "total_sec": round(total, 1),
            "per_iter_bucket_mean_sec": buckets,
        }), flush=True)
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--equality":
        run_equality(sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01")
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--profile":
        run_profile(sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01")
        return
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sf100_scaled"]
    spark = _session()
    for sf in dirs:
        docs = load_table(spark, sf, "documents").select("text")
        n = docs.count()
        sec_d, md = _best_of(
            2, lambda: train_bpe_distributed(docs, num_merges=MERGES)
        )
        sec_rc, mrc = _best_of(
            2,
            lambda: train_bpe_distributed(
                docs, num_merges=MERGES, strategy="recount"
            ),
        )
        sec_s, ms = _best_of(
            2, lambda: train_bpe_from_corpus(docs, num_merges=MERGES)
        )
        print(json.dumps({
            "sf": sf, "docs": n, "merges": MERGES,
            "distributed_delta_sec": round(sec_d, 2),
            "distributed_recount_sec": round(sec_rc, 2),
            "driver_sampled_sec": round(sec_s, 2),
            "n_merges_distributed": len(md),
            "equal_strategies": md == mrc,
            "n_merges_driver": len(ms),
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
