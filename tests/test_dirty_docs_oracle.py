"""Dirty-documents oracle sweep (round 8, completing the adversarial
family: unicode / dirty-events / dirty-star / dirty-embeddings — this
one salts the documents table's ID AND metadata columns, which the
unicode sweep's text-only salting never touched).

Motivation (review r8): three sketch entries split the corpus on
``doc_id % 2 == 0`` / ``== 1`` parity predicates that silently drop
NULL doc_ids (NULL % 2 is NULL) and negative odd ids (-3 % 2 = -1
under Spark's sign-keeping %) from BOTH halves — merge-equals-whole
would have broken on dirty data by the exact route the r7 dirty-star
sweep closed for kmv, but stayed latent because no sweep salted
doc_id. This sweep makes that class of bug impossible to reintroduce:
every documents-only catalog entry runs against its DuckDB oracle on a
corpus salted with NULL and NEGATIVE ids, NULL/empty text, and NULL
source/lang. (Duplicate ids are deliberately NOT salted — doc_id
uniqueness is a schema contract; see the fixture note.)
"""

from __future__ import annotations

import math
import re

import duckdb
import pytest

from s3_access_logs_spark.plans.catalog import load_all
from s3_access_logs_spark.sources.tables import TABLE_NAMES

_SRC = "/root/testdata/sf0.001/documents.parquet"


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
def dirty_docs_sf(spark, tmp_path_factory):
    sf_dir = str(tmp_path_factory.mktemp("dirty_docs_sf"))
    base = spark.read.parquet(_SRC)
    salt = spark.createDataFrame(
        [
            # negative ids, even and odd — Spark's % keeps the sign
            (-2, "negative even id doc with plenty of ordinary words "
                 "inside it for the token machinery", "en", "src0", 93),
            (-3, "negative odd id doc that a naive parity split drops "
                 "from both halves silently", "en", "src1", 83),
            # NULL id — NULL % anything is NULL
            (None, "null id doc whose length must still count in every "
                   "whole-corpus sketch", "en", "src2", 79),
            # NULL text / empty text
            (990001, None, "en", "src0", None),
            (990002, "", "en", "src1", 0),
            # NULL metadata columns
            (990003, "doc with null lang column", None, "src2", 25),
            (990004, "doc with null source column", "en", None, 27),
            # NO duplicate-id salt: doc_id uniqueness is a SCHEMA
            # contract of the corpus (every dedup/pair/cluster entry
            # keys on it; the streaming ingest handles genuine crawl
            # id-reuse via (id, digest) keys instead). Violating the
            # primary key makes per-id semantics engine-defined — an
            # upstream data bug, not a parity surface.
        ],
        base.schema,
    )
    base.unionByName(salt).write.parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def _documents_only_entries():
    other = [t for t in TABLE_NAMES if t != "documents"]
    out = []
    for name, q in sorted(load_all().items()):
        if q.oracle is None or q.members:
            continue
        if not re.search(r"\bdocuments\b", q.oracle):
            continue
        if any(re.search(rf"\b{t}\b", q.oracle) for t in other):
            continue
        out.append(name)
    return out


@pytest.mark.parametrize("name", _documents_only_entries())
def test_dirty_docs_matches_oracle(spark, dirty_docs_sf, name):
    q = load_all()[name]
    sdf = q.builder(spark, dirty_docs_sf)
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{dirty_docs_sf}/documents.parquet/*.parquet')"
        )
        cur = con.execute(q.oracle)
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
    finally:
        con.close()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows), f"{name}: row count"
    assert _canon(srows, sdf.columns) == _canon(drows, dcols), name
