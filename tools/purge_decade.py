"""Purge cost vs affected-leaf fraction and store scale (round 13,
VERDICT r12 item 6): `test_purge.py` pins purge SEMANTICS; this records
the flagship-claim NUMBERS — "cost bounded by the affected leaves" —
the way every other flagship claim in BASELINE.md is recorded.

Protocol: one `local[32]` session. Per store scale, a synthetic
STREAMING-layout token store (`shard=<s>/batch_id=<b>` leaves — the
layout whose leaf count grows with ingest age, so a fixed hit set
stays a fixed set of leaves as the store grows) is written directly:
rows `(doc_id, ids[64 varied ints], shard_order)` — purge's cost is
I/O mechanics over stored bytes, so the ids carry VARIED values
(constant arrays would RLE-compress to nothing and fake the rewrite
cost) but not real BPE output; `write_token_store` semantics are
pinned elsewhere. Then, warm-fenced:

* `fixed_hits` — the SAME 128-id victim set (all inside batch 0,
  hash-spread over the shards) at every scale: affected leaves are the
  <= n_shards batch-0 leaves whose size is constant in store scale, so
  purge time should stay ~flat while the store grows 10x/100x (the
  only growing term is the column-pruned discovery scan).
* `fraction` sweep — 0.1% / 1% / 10% of doc ids (disjoint strides,
  purged sequentially on one store) at the largest scale: affected
  leaves — and cost — grow with the fraction, pinning
  cost-proportional-to-affected-bytes from the other side.

Usage: python tools/purge_decade.py [n_docs ...]   (default 50k 500k 5M)
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from s3_access_logs_spark.operators.purge import purge_documents  # noqa: E402
from s3_access_logs_spark.session import get_spark  # noqa: E402

N_SHARDS = 8
DOCS_PER_BATCH = 12_500
IDS_LEN = 64


def build_store(spark, path: str, n_docs: int) -> None:
    df = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(IDS_LEN - 1)),
            lambda i: F.pmod(F.col("id") * 31 + i * 7, F.lit(997)).cast(
                "int"
            ),
        ).alias("ids"),
        F.md5(F.concat(F.lit("order:"), F.col("id").cast("string"))).alias(
            "shard_order"
        ),
        F.pmod(F.xxhash64(F.col("id")), F.lit(N_SHARDS))
        .cast("int")
        .alias("shard"),
        (F.col("id") / DOCS_PER_BATCH).cast("int").alias("batch_id"),
    )
    (
        df.repartition(N_SHARDS, "shard")
        .sortWithinPartitions("shard", "batch_id", "shard_order", "doc_id")
        .write.mode("overwrite")
        .option("compression", "snappy")
        .partitionBy("shard", "batch_id")
        .parquet(path)
    )


def timed_purge(spark, store: str, ids: list[int]) -> dict:
    t0 = time.perf_counter()
    res = purge_documents(spark, ids, token_store=store)
    sec = time.perf_counter() - t0
    out = dict(res["token_store"])
    out["sec"] = round(sec, 2)
    out["n_ids"] = len(ids)
    return out


def main() -> None:
    scales = [int(x) for x in sys.argv[1:]] or [50_000, 500_000, 5_000_000]
    spark = get_spark("purge-decade")
    spark.sparkContext.setLogLevel("ERROR")
    base = "/tmp/purge_decade"
    shutil.rmtree(base, ignore_errors=True)
    # warm fence: one tiny build+purge absorbs writer/scan spin-up
    build_store(spark, f"{base}/warm", 5_000)
    timed_purge(spark, f"{base}/warm", [1, 2, 3])
    # fixed 128-id hit set, all inside batch 0, spread over shards —
    # bounded by the SMALLEST scale so the set exists identically at
    # every point (the same-work requirement the table exists for);
    # a shortfall is reported, never silent (review r13)
    lim = min(min(scales), DOCS_PER_BATCH)
    fixed = list(range(0, lim, max(1, lim // 128)))[:128]
    if len(fixed) < 128:
        print(json.dumps({
            "row": "note",
            "msg": f"fixed hit set only {len(fixed)} ids "
                   f"(smallest scale {min(scales)} bounds it)",
        }), flush=True)
    for n in scales:
        store = f"{base}/store_{n}"
        build_store(spark, store, n)
        row = timed_purge(spark, store, fixed)
        row.update({"row": "fixed_hits", "n_docs": n})
        print(json.dumps(row), flush=True)
        if n != scales[-1]:
            shutil.rmtree(store, ignore_errors=True)
    # fraction sweep on the largest store (disjoint strides so each
    # purge finds live victims)
    n = scales[-1]
    store = f"{base}/store_{n}"
    for frac, stride, offset in (
        (0.001, 1000, 1), (0.01, 100, 3), (0.10, 10, 5),
    ):
        victims = list(range(offset, n, stride))
        if len(victims) > 900_000:
            victims = victims[:900_000]
        row = timed_purge(spark, store, victims)
        row.update({"row": "fraction", "n_docs": n, "fraction": frac})
        print(json.dumps(row), flush=True)
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
