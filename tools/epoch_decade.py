"""Epoch re-pack vs full export: the decade measurement (round 11,
VERDICT r10 item 1 — "epoch cost ≪ full export at 10×/100×").

Protocol (the export-flagship decade's, BASELINE.md r10): one
`local[32]` session, untimed sf0.01 warm fence (one full export + one
store+repack, absorbing Arrow/worker spin-up), scaled corpora from
`make_scaled_sf.py` (documents), warm best-of-2 per timed cell. At
each scale three cells are timed:

* ``export``  — `export_training_set` (curate → tokenize → pack →
  write), the cost a trainer pays PER EPOCH without a store;
* ``store``   — `write_token_store` (curate → tokenize → store write),
  the one-off cost of materializing the id streams;
* ``repack``  — `repack_epoch` (store scan → order projection → pack →
  write), the cost a NEW EPOCH actually costs once the store exists.

The claim under test: repack ≪ export at every scale (N epochs cost
store + N·repack instead of N·export), with repack growing at most
data-linearly per decade.

Usage:
    python tools/epoch_decade.py /root/testdata/sf0.1 /tmp/sf10_scaled \
        /tmp/sf100_scaled
Prints one JSON line per (scale, cell).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from s3_access_logs_spark.operators.export import (  # noqa: E402
    export_training_set,
    repack_epoch,
    write_token_store,
)
from s3_access_logs_spark.session import get_spark  # noqa: E402
from s3_access_logs_spark.sources.tables import load_table  # noqa: E402

CURATE = {"min_quality": 0.5, "langs": ("en",)}
WINDOW, SHARDS = 256, 8
EPOCH = "epoch1:"


def _best_of(n, fn):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def run_scale(spark, sf_dir: str, tag: str) -> None:
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    td = tempfile.mkdtemp(prefix=f"epoch_decade_{tag}_")
    try:
        sec, (_, report) = _best_of(
            2,
            lambda: export_training_set(
                docs, f"{td}/export", n_shards=SHARDS, window_ids=WINDOW,
                curate=dict(CURATE), order_salt=EPOCH,
            ),
        )
        rep = {r["stage"]: r["dropped"] for r in report.collect()}
        print(json.dumps({
            "scale": tag, "cell": "export", "docs": n_docs,
            "sec": round(sec, 1),
            "tokens_kept": rep["tokens_kept"],
            "windows": rep["windows_emitted"],
        }), flush=True)
        store = f"{td}/store"
        sec, _ = _best_of(
            2,
            lambda: write_token_store(
                docs, store, n_shards=SHARDS, curate=dict(CURATE)
            ),
        )
        print(json.dumps({
            "scale": tag, "cell": "store", "docs": n_docs,
            "sec": round(sec, 1),
        }), flush=True)
        sec, wins = _best_of(
            2,
            lambda: repack_epoch(
                spark, store, f"{td}/repack", window_ids=WINDOW,
                n_shards=SHARDS, order_salt=EPOCH,
            ),
        )
        n_windows = wins.count()
        assert n_windows == rep["windows_emitted"], (
            "repack must reproduce the export's window count"
        )
        print(json.dumps({
            "scale": tag, "cell": "repack", "docs": n_docs,
            "sec": round(sec, 1), "windows": n_windows,
        }), flush=True)
    finally:
        shutil.rmtree(td, ignore_errors=True)


def main() -> None:
    scales = sys.argv[1:]
    if not scales:
        scales = ["/root/testdata/sf0.1", "/tmp/sf10_scaled",
                  "/tmp/sf100_scaled"]
    spark = get_spark("epoch_decade")
    spark.sparkContext.setLogLevel("ERROR")
    # untimed warm fence: one tiny export + store + repack
    warm = tempfile.mkdtemp(prefix="epoch_decade_warm_")
    try:
        wd = load_table(spark, "/root/testdata/sf0.01", "documents")
        export_training_set(wd, f"{warm}/e", curate=dict(CURATE))
        write_token_store(wd, f"{warm}/s", curate=dict(CURATE))
        repack_epoch(spark, f"{warm}/s", f"{warm}/r")
    finally:
        shutil.rmtree(warm, ignore_errors=True)
    for i, sf in enumerate(scales):
        run_scale(spark, sf, tag=f"{10 ** i}x")
    spark.stop()


if __name__ == "__main__":
    main()
