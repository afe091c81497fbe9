"""Exact merges-table BPE (functions/bpe.py, VERDICT r7 item 5).

Three implementations must agree token-for-token: the pure-Python
reference encoder (rank-order Sennrich sweep), the Spark expression
fold, and the generated DuckDB SQL — plus the trainer must be
deterministic (the whole oracle story rests on it).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from s3_access_logs_spark.functions import bpe as B

FIXTURES = [
    "the quick brown fox jumps over the lazy dog",
    "lll lllll llllllll",  # overlap: leftmost non-overlapping merges
    "training tokenizers, 1234 numbers! and punct...",
    "",
    None,
    "unseen zebra xylophone qqq zzz",
    "with sentinels ⟨stripped⟩ ¦ properly ⟩⟨",
    "  leading and   multiple   spaces  ",
    "mixed 12ab34 runs-with-dashes and_underscores",
    "the the the the the the",  # heavy repetition
]


@pytest.fixture(scope="module")
def merges():
    return list(B.default_merges())


class TestReferenceEncoder:
    def test_trainer_is_deterministic(self, merges):
        again = B.train_bpe_merges(B.SEED_CORPUS)
        assert list(merges) == list(again)
        assert len(merges) > 50  # the seed corpus supports a real table
        # rank ordering sanity: a merged symbol can only be used by a
        # LATER merge (the exactness argument for rank-order encoding)
        seen = set()
        for a, b in merges:
            for part in (a, b):
                if len(part) > 1:
                    assert part in seen, (a, b)
            seen.add(a + b)

    def test_encode_compresses_seed_text(self, merges):
        text = B.SEED_CORPUS[0]
        toks = B.bpe_encode_py(text, merges)
        assert "".join(toks) == "".join(B.pretokens_py(text))
        n_chars = sum(len(t) for t in B.pretokens_py(text))
        assert len(toks) < 0.6 * n_chars  # real merges fired
        assert any(len(t) >= 3 for t in toks)

    def test_overlap_is_leftmost_nonoverlapping(self):
        # single merge (l, l): "llll" -> ll ll; "lllll" -> ll ll l
        ms = [("l", "l")]
        assert B.bpe_encode_py("llll", ms) == ["ll", "ll"]
        assert B.bpe_encode_py("lllll", ms) == ["ll", "ll", "l"]


class TestEngineParity:
    def test_spark_matches_reference(self, spark, merges):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(FIXTURES)], "i int, text string"
        )
        rows = df.select(
            "i",
            B.bpe_tokens_exact("text").alias("toks"),
            B.bpe_token_count_exact("text").alias("n"),
        ).orderBy("i").collect()
        for r, text in zip(rows, FIXTURES):
            if text is None:
                assert r["n"] is None and r["toks"] is None
                continue
            ref = B.bpe_encode_py(text, merges)
            assert list(r["toks"]) == ref, text
            assert r["n"] == len(ref), text

    def test_duckdb_twin_matches_reference(self, merges):
        con = duckdb.connect()
        try:
            con.execute("CREATE TABLE t(i INT, text VARCHAR)")
            for i, t in enumerate(FIXTURES):
                con.execute("INSERT INTO t VALUES (?, ?)", [i, t])
            rows = con.execute(
                f"SELECT i, {B.bpe_tokens_sql('text')} AS toks, "
                f"{B.bpe_count_sql('text')} AS n FROM t ORDER BY i"
            ).fetchall()
        finally:
            con.close()
        for (i, toks, n), text in zip(rows, FIXTURES):
            if text is None:
                assert toks is None and n is None
                continue
            ref = B.bpe_encode_py(text, merges)
            # DuckDB's regexp_extract_all on '' gives [] like Spark
            assert (toks or []) == ref, text
            assert n == len(ref), text

    def test_encode_is_a_pure_projection(self, spark):
        df = spark.createDataFrame([(1, "hello world")], "i int, text string")
        q = df.select(B.bpe_token_count_exact("text").alias("n"))
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Join" not in plan


class TestRandomizedParity:
    def test_random_corpus_three_way_parity(self, spark, merges):
        """Seeded random strings (ASCII letters/digits/punct/spaces,
        lengths 0-200) through all three implementations in ONE batch
        per engine — the property-test complement to the hand-picked
        fixtures. The alphabet stays in the regime where the Python
        pre-tokenizer twin is exact (no exotic numerics/marks)."""
        import random
        import string

        rng = random.Random(80801)
        alphabet = string.ascii_letters + string.digits + "  .,!?-_'\"():;"
        texts = [
            "".join(rng.choice(alphabet) for _ in range(rng.randrange(201)))
            for _ in range(60)
        ]
        refs = [B.bpe_encode_py(t, merges) for t in texts]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "i int, text string"
        )
        rows = df.select(
            "i", B.bpe_tokens_exact("text").alias("toks")
        ).orderBy("i").collect()
        for r, ref in zip(rows, refs):
            assert list(r["toks"]) == ref
        con = duckdb.connect()
        try:
            con.execute("CREATE TABLE t(i INT, text VARCHAR)")
            for i, t in enumerate(texts):
                con.execute("INSERT INTO t VALUES (?, ?)", [i, t])
            drows = con.execute(
                f"SELECT i, {B.bpe_tokens_sql('text')} FROM t ORDER BY i"
            ).fetchall()
        finally:
            con.close()
        for (_, toks), ref in zip(drows, refs):
            assert (toks or []) == ref


class TestPackingBpeVariant:
    def test_bpe_packing_matches_duckdb(self, spark):
        """sequence_packing_bins(tokenizer='bpe_exact') against a DuckDB
        replay built from the same merges table — oracle-grade pin for
        the packing option without a driver-surface slot."""
        from s3_access_logs_spark.plans.text_queries import (
            sequence_packing_bins,
        )

        sf = "/root/testdata/sf0.001"
        sdf = sequence_packing_bins(spark, sf, tokenizer="bpe_exact")
        # fill is already rounded 6dp on both sides (Spark F.round /
        # DuckDB ROUND, same HALF_UP mode — Python's round() would
        # banker's-round .5 boundaries differently)
        srows = sorted(
            (r["source"], r["bin"], r["n_docs"], r["bin_tokens"], r["fill"])
            for r in sdf.collect()
        )
        con = duckdb.connect()
        try:
            con.execute(
                f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')"
            )
            drows = sorted(
                tuple(r)
                for r in con.execute(f"""
                    WITH t AS (
                      SELECT doc_id, source,
                             {B.bpe_count_sql('text')} AS n_tokens
                      FROM documents
                    ),
                    packed AS (
                      SELECT source, n_tokens,
                             ((SUM(n_tokens) OVER (
                                 PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens)
                              // 256)::BIGINT AS bin
                      FROM t
                    )
                    SELECT source, bin, COUNT(*) AS n_docs,
                           SUM(n_tokens)::BIGINT AS bin_tokens,
                           ROUND(SUM(n_tokens)::DOUBLE / 256.0, 6) AS fill
                    FROM packed GROUP BY source, bin
                """).fetchall()
            )
        finally:
            con.close()
        assert srows == drows

    def test_unknown_tokenizer_rejected(self, spark):
        from s3_access_logs_spark.plans.text_queries import (
            sequence_packing_bins,
        )

        with pytest.raises(ValueError, match="unknown tokenizer"):
            sequence_packing_bins(
                spark, "/root/testdata/sf0.001", tokenizer="nope"
            )
