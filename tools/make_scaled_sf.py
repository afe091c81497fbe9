"""Replication-scale a driver testdata dir for bench validation.

The driver ships sf0.001/0.01/0.1 only; BASELINE.md's scaling fit
projects sf=1 from those three points (t(sf) = a + b*sf). This tool
manufactures an sf-equivalent dataset by replicating sf0.1 ``factor``
times with key shifts, so the fit's `b` coefficients can be validated
against a real measurement (VERDICT r3 item 7). Usage:

    python tools/make_scaled_sf.py /root/testdata/sf0.1 /root/repo/.sf1 10

Replication semantics (copy 0 is the identity, so the output is a strict
superset of the source):

* dims (region, nation, customer, supplier, part) — copied once;
  real deployments grow facts, not dims.
* orders / lineitem — o_orderkey / l_orderkey shifted by
  ``copy * key_offset`` (offset > max source key), preserving the
  orders<->lineitem FK and fan-out; o_custkey untouched (10x orders per
  customer models a longer history window).
* events — event_id and user_id both shifted: per-user event density
  (what sessionization / windows cost scales with) stays constant.
* documents — doc_id shifted; every 3rd word of each copy's text gets a
  per-copy suffix. Identical copies would make every pair-generation
  query (jaccard/minhash/simhash) quadratically explode on cross-copy
  near-dups that real corpus growth does not have; the 1-in-3 mutation
  kills shingle overlap across copies while keeping text volume and
  per-doc shingle counts identical.
* embeddings — vec_id shifted; per-copy deterministic perturbation on
  every component (so copies are not bit-identical vectors), and the
  label space is shifted per copy so CLUSTER COUNT grows with the
  corpus while per-cluster size stays constant — the real scale path
  for IVF/SemDeDup (nlist tracks corpus size), and the one that keeps
  within-cluster pair search linear in total rows.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from s3_access_logs_spark.session import get_spark  # noqa: E402
from s3_access_logs_spark.sources.tables import load_table  # noqa: E402

DIMS = ("region", "nation", "customer", "supplier", "part")


def _offset(df, key: str) -> int:
    mx = df.agg(F.max(key)).first()[0] or 0
    return int(10 ** (len(str(int(mx)))))  # next power of 10 past max


def scale(
    src: str, dst: str, factor: int, tables: tuple[str, ...] | None = None
) -> None:
    """``tables`` (round 9) restricts the build to a subset — the
    streaming decade measurements need only documents + embeddings, and
    skipping a 60M-row lineitem replication saves minutes and GBs.
    Coupled pairs load together even under a subset, because their key
    shift must be SHARED: orders+lineitem (the orderkey FK) and
    documents+embeddings (vec_id is a doc id in every consumer — the
    max-of-both offset keeps copy i docs attached to their vectors)."""
    spark = get_spark("make_scaled_sf")
    spark.sparkContext.setLogLevel("ERROR")
    out = Path(dst)
    out.mkdir(parents=True, exist_ok=True)

    def want(name: str) -> bool:
        return tables is None or name in tables

    def write(df, name):
        df.write.mode("overwrite").parquet(str(out / f"{name}.parquet"))

    for t in DIMS:
        if want(t):
            write(load_table(spark, src, t), t)

    if want("orders") or want("lineitem"):
        orders = load_table(spark, src, "orders")
        lineitem = load_table(spark, src, "lineitem")
        okey_off = max(
            _offset(orders, "o_orderkey"), _offset(lineitem, "l_orderkey")
        )
        if want("orders"):
            write(
                _replicate(orders, factor, {"o_orderkey": okey_off}),
                "orders",
            )
        if want("lineitem"):
            write(
                _replicate(lineitem, factor, {"l_orderkey": okey_off}),
                "lineitem",
            )

    if want("events"):
        events = load_table(spark, src, "events")
        write(
            _replicate(
                events,
                factor,
                {
                    "event_id": _offset(events, "event_id"),
                    "user_id": _offset(events, "user_id"),
                },
            ),
            "events",
        )

    if not want("documents") and not want("embeddings"):
        spark.stop()
        return

    # SHARED offset for documents + embeddings (round 9, review): the
    # embeddings table is keyed to documents (vec_id IS a doc id in
    # every consumer — the semantic gates join on it), so the two
    # tables must shift by the SAME amount or copy i>0 docs lose their
    # vectors. Independently-derived offsets only agreed on the shipped
    # testdata by digit-count coincidence (4999 vs 1999).
    docs = load_table(spark, src, "documents")
    emb = load_table(spark, src, "embeddings")
    doc_off = max(_offset(docs, "doc_id"), _offset(emb, "vec_id"))
    doc_copies = []
    for i in range(factor):
        c = docs.withColumn(
            "doc_id", F.col("doc_id") + F.lit(i * doc_off)
        )
        if i:
            mut = F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w, pos: F.when(
                        pos % 3 == 2, F.concat(w, F.lit(f"x{i}"))
                    ).otherwise(w),
                ),
                " ",
            )
            c = c.withColumn("text", mut)
        doc_copies.append(c)
    from functools import reduce

    if want("documents"):
        write(reduce(lambda a, b: a.unionByName(b), doc_copies), "documents")

    if want("embeddings"):
        vec_off = doc_off  # shared with documents — see the comment above
        # inside the guard (review r9): max(label) is a Spark action;
        # a documents-only build must not scan the embeddings table
        lab_off = (emb.agg(F.max("label")).first()[0] or 0) + 1
        emb_copies = []
        for i in range(factor):
            c = emb.withColumn(
                "vec_id", F.col("vec_id") + F.lit(i * vec_off)
            )
            if i:
                c = c.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, j: (
                            x + ((j + 1) % 7) * F.lit(i * 0.003)
                        ).cast("float"),
                    ),
                ).withColumn("label", F.col("label") + F.lit(i * lab_off))
            emb_copies.append(c)
        write(reduce(lambda a, b: a.unionByName(b), emb_copies), "embeddings")
    spark.stop()


def _replicate(df, factor: int, shifts: dict[str, int]):
    from functools import reduce

    copies = []
    for i in range(factor):
        c = df
        for col, off in shifts.items():
            c = c.withColumn(col, F.col(col) + F.lit(i * off))
        copies.append(c)
    return reduce(lambda a, b: a.unionByName(b), copies)


if __name__ == "__main__":
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    only = tuple(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    scale(src, dst, factor, tables=only)
    print(f"scaled {src} x{factor} -> {dst}"
          + (f" (tables: {','.join(only)})" if only else ""))
