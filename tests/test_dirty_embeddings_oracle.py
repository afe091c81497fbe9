"""Dirty-embeddings oracle sweep (round 7, completing the sweep family
with unicode / dirty-events / dirty-star).

Earlier rounds hardened individual vector entries against dirty
corpora with bespoke tests (kmeans, PQ, refine). This sweep makes the
coverage systematic: EVERY embeddings-only catalog entry runs against
its DuckDB oracle on a corpus salted with the full malformed-vector
taxonomy — NULL, short, over-length, interior-NULL, inf, NaN,
huge-but-finite (past ``VEC_ABS_MAX``), zero-norm, a NULL label, and
(round 8) NULL/negative vec_ids with well-formed vectors, which caught
``kmeans_assignments`` mishandling identity-less rows (Spark's
nulls-first seed order vs DuckDB's nulls-last, and the oracle's
per-row argmax collapsing same-id rows) — that entry is now KEYED on
vec_id: NULL ids excluded on both sides, uniqueness stays the schema
contract.
All 11 entries pass as-is (including the round-7 residual IVF-PQ
entry), evidence that the shared ``well_formed_vector`` /
``sql_well_formed`` contract holds across the whole vector surface,
not just the entries that got bespoke tests.
"""

from __future__ import annotations

import math
import re

import duckdb
import pytest

from s3_access_logs_spark.plans.catalog import load_all
from s3_access_logs_spark.sources.tables import TABLE_NAMES


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm(v):
        if isinstance(v, bool):
            return v
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else round(v, 6)
        if hasattr(v, "isoformat"):
            return v.isoformat()[:26]
        if isinstance(v, (list, tuple)):
            return tuple(norm(x) for x in v)
        return v

    return sorted((tuple(norm(r[i]) for i in order) for r in rows), key=repr)


@pytest.fixture(scope="module")
def dirty_emb_sf(spark, tmp_path_factory):
    rows = [
        (i, i % 5, [float((i * 7 + j * 3) % 11) / 10.0 for j in range(64)])
        for i in range(60)
    ]
    rows += [
        (100, 0, None),                                  # NULL vector
        (101, 1, [1.0, 2.0]),                            # short
        (102, None, [0.5] * 70),                         # over-length + NULL label
        (103, 2, [1.0] * 30 + [None] + [1.0] * 33),      # interior NULL
        (104, 3, [1.0] * 20 + [float("inf")] + [1.0] * 43),
        (105, 0, [float("nan")] + [2.0] * 63),
        (106, 1, [2e4] * 64),                            # huge-but-finite
        (107, 2, [0.0] * 64),                            # zero-norm
        # round 8: ID salting (the dirty-docs sweep's lesson applied to
        # vec_id) — a NEGATIVE id must sort/pair normally, and a NULL id
        # with a WELL-FORMED vector probes every id-ordered contract
        # (kmeans was the catch; it now excludes NULL ids as a KEYED
        # entry, see its builder note)
        (-7, 1, [float((3 + j * 5) % 11) / 10.0 for j in range(64)]),
        (None, 2, [float((5 + j * 2) % 11) / 10.0 for j in range(64)]),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    sf_dir = str(tmp_path_factory.mktemp("dirty_emb_sf"))
    emb.write.parquet(f"{sf_dir}/embeddings.parquet")
    return sf_dir


def _embeddings_only_entries():
    other = [t for t in TABLE_NAMES if t != "embeddings"]
    out = []
    for name, q in sorted(load_all().items()):
        if q.oracle is None or q.members:
            continue
        if "embeddings" not in q.oracle:
            continue
        if any(re.search(rf"\b{t}\b", q.oracle) for t in other):
            continue
        out.append(name)
    return out


@pytest.mark.parametrize("name", _embeddings_only_entries())
def test_dirty_embeddings_matches_oracle(spark, dirty_emb_sf, name):
    q = load_all()[name]
    sdf = q.builder(spark, dirty_emb_sf)
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{dirty_emb_sf}/embeddings.parquet/*.parquet')"
        )
        cur = con.execute(q.oracle)
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
    finally:
        con.close()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows), f"{name}: row count"
    assert _canon(srows, sdf.columns) == _canon(drows, dcols), name
