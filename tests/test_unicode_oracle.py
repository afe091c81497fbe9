"""Unicode-corpus oracle sweep (round 7).

The driver's synthetic ``documents`` table is Latin word-soup, so a
cross-engine divergence that only fires on non-Latin text would never
hit the correctness gate. This sweep runs every documents-only catalog
entry on a multi-script corpus — CJK, Cyrillic, Greek, combining
accents, astral emoji, plus exact duplicates and pure-non-Latin docs
(zero ``[a-z0-9]`` tokens) — against its DuckDB oracle.

It already earned its keep: the MinHash pair/cluster oracles were
missing Spark's no-shingle sentinel exclusion (``minhash_bands``'
documented filter), so a pure-CJK doc collided with every other one in
every band oracle-side — a fabricated quadratic clique (664 vs 2204
pairs on this corpus) that the Latin fixture could never expose.
"""

from __future__ import annotations

import math
import re

import duckdb
import pytest
from pyspark.sql import functions as F  # noqa: F401 (parity with suite style)

from s3_access_logs_spark.plans.catalog import load_all

# entries whose oracles are closed-form replays of the DRIVER fixture's
# synthesized payloads (WAV bodies / video frames derive arithmetic from
# the fixture's text lengths) — out of contract for arbitrary corpora
_FIXTURE_BOUND = {"audio_fingerprints", "video_fingerprints"}

_SCRIPTS = [
    "víctor café déjà-vu naïve œuvre élan français señor",
    "中文文本 テキスト 漢字 ひらがな カタカナ 日本語 の 内容",
    "русский текст язык документ пример содержание слова",
    "ελληνικά κείμενο γλώσσα παράδειγμα περιεχόμενο λέξεις",
    "mixed 🎉 emoji 🚀 and ASCII words for balance here now",
    "the quick brown fox jumps over the lazy dog again and",
]


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
def unicode_sf(spark, tmp_path_factory):
    rows = []
    for i in range(120):
        base = _SCRIPTS[i % len(_SCRIPTS)]
        text = (base + " ") * (3 + i % 5) + f"tail-{i}"
        if i % 10 == 0 and i > 0:
            text = rows[i - 10][1]  # exact duplicate of an earlier doc
        rows.append((i, text))
    docs = spark.createDataFrame(
        [
            (i, t, ["en", "zh", "ru", "el", "xx", "en"][i % 6],
             f"src{i % 3}", len(t))
            for i, t in rows
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path_factory.mktemp("unicode_sf"))
    docs.write.parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def _documents_only_entries():
    other = (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split()
    out = []
    for name, q in sorted(load_all().items()):
        if q.oracle is None or q.members or name in _FIXTURE_BOUND:
            continue
        if "documents" not in q.oracle:
            continue
        if any(re.search(rf"\b{t}\b", q.oracle) for t in other):
            continue
        out.append(name)
    return out


@pytest.mark.parametrize("name", _documents_only_entries())
def test_unicode_corpus_matches_oracle(spark, unicode_sf, name):
    q = load_all()[name]
    sdf = q.builder(spark, unicode_sf)
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{unicode_sf}/documents.parquet/*.parquet')"
        )
        cur = con.execute(q.oracle)
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
    finally:
        con.close()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows), f"{name}: row count"
    assert _canon(srows, sdf.columns) == _canon(drows, dcols), name
