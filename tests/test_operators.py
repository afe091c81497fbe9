"""Unit tests for engine operators on hand-computed fixtures."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from s3_access_logs_spark.functions.vectors import cosine_similarity
from s3_access_logs_spark.operators.dedup import (
    dedup_exact,
    jaccard_pairs,
    minhash_candidates,
    simhash_near_pairs,
)
from s3_access_logs_spark.operators.joins import asof_join
from s3_access_logs_spark.operators.similarity import brute_force_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestDedupExact:
    def test_survivor_is_min_id(self, spark):
        df = _docs(
            spark,
            [(1, "Hello  World"), (2, "hello world"), (3, "other doc")],
        )
        out = {r.keep_id: r.n_dupes for r in dedup_exact(df).collect()}
        # case/whitespace-normalized: 1 and 2 collapse, survivor = 1
        assert out == {1: 2, 3: 1}


class TestDedupIncremental:
    def test_batch_minus_store_and_within_batch(self, spark):
        from s3_access_logs_spark.operators.dedup import (
            dedup_incremental,
            normalized_digest,
        )

        store = (
            _docs(spark, [(1, "seen before"), (2, "also seen")])
            .select(normalized_digest(F.col("text")).alias("digest"))
        )
        batch = _docs(
            spark,
            [
                (10, "SEEN  before"),   # normalizes to a stored digest
                (11, "fresh text"),
                (12, "fresh text"),     # within-batch dup, survivor = 11
                (13, "another new one"),
            ],
        )
        out = {r.keep_id for r in dedup_incremental(batch, store).collect()}
        assert out == {11, 13}


class TestJaccard:
    def test_identical_docs_have_jaccard_one(self, spark):
        text = "a b c d e f g h"
        df = _docs(spark, [(1, text), (2, text), (3, "x y z w q r s t")])
        pairs = jaccard_pairs(df, threshold=0.99).collect()
        assert [(p.id_a, p.id_b, p.jaccard) for p in pairs] == [(1, 2, 1.0)]

    def test_disjoint_docs_no_pair(self, spark):
        df = _docs(spark, [(1, "a b c d"), (2, "x y z w")])
        assert jaccard_pairs(df, threshold=0.01).count() == 0

    def test_hot_shingle_cap_bounds_pair_explosion(self, spark):
        # 40 docs that share ONE stop-phrase shingle but nothing else: with
        # the cap below the shingle's document frequency the posting list is
        # dropped and no quadratic 40*39/2 pair fan-out happens; pairs that
        # share only capped shingles never materialize.
        docs = [(i, f"the quick fox u{i} v{i} w{i} x{i}") for i in range(40)]
        df = _docs(spark, docs)
        capped = jaccard_pairs(df, threshold=0.0, max_shingle_freq=10)
        assert capped.count() == 0
        uncapped = jaccard_pairs(df, threshold=0.0, max_shingle_freq=None)
        assert uncapped.count() == 40 * 39 // 2

    def test_cap_is_on_by_default(self):
        import inspect

        from s3_access_logs_spark.operators.dedup import (
            DEFAULT_MAX_SHINGLE_FREQ,
        )

        sig = inspect.signature(jaccard_pairs)
        assert (
            sig.parameters["max_shingle_freq"].default
            == DEFAULT_MAX_SHINGLE_FREQ
            is not None
        )


class TestMinhash:
    def test_identical_docs_always_candidates(self, spark):
        text = "the quick brown fox jumps over the lazy dog again"
        df = _docs(spark, [(1, text), (2, text), (3, "完全 different words entirely here now ok fine yes")])
        pairs = {(p.id_a, p.id_b) for p in minhash_candidates(df).collect()}
        assert (1, 2) in pairs
        assert (1, 3) not in pairs and (2, 3) not in pairs


class TestSimhash:
    def test_identical_docs_zero_hamming(self, spark):
        text = "alpha beta gamma delta epsilon zeta eta theta"
        df = _docs(spark, [(1, text), (2, text)])
        out = simhash_near_pairs(df, max_hamming=0).collect()
        assert [(r.id_a, r.id_b, r.hamming) for r in out] == [(1, 2, 0)]

    def test_64bit_banding_matches_brute_force(self, spark):
        """Pigeonhole banding at the 64-bit/16-bit-chunk default finds
        EXACTLY the pairs a brute-force all-pairs hamming scan finds."""
        import itertools

        from s3_access_logs_spark.operators.dedup import (
            simhash_fingerprint_words,
        )
        from s3_access_logs_spark.sources.tables import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        fps = simhash_fingerprint_words(docs).collect()
        expect = set()
        for a, b in itertools.combinations(fps, 2):
            h = bin(a.w0 ^ b.w0).count("1") + bin(a.w1 ^ b.w1).count("1")
            if h <= 3:
                expect.add((min(a.id, b.id), max(a.id, b.id), h))
        got = {
            (r.id_a, r.id_b, r.hamming)
            for r in simhash_near_pairs(docs, max_band_freq=None).collect()
        }
        assert got == expect

    def test_word0_is_the_historical_32bit_fingerprint(self, spark):
        from s3_access_logs_spark.operators.dedup import (
            simhash_fingerprint_words,
            simhash_fingerprints,
        )

        df = _docs(
            spark,
            [(1, "alpha beta gamma delta"), (2, "one two three four five")],
        )
        w = {r.id: r.w0 for r in simhash_fingerprint_words(df).collect()}
        old = {
            r.id: r.simhash
            for r in simhash_fingerprints(df, bits=32).collect()
        }
        assert w == old

    def test_hot_bucket_cap_degrades_to_lower_bound(self, spark):
        """max_band_freq drops any band bucket holding more distinct
        fingerprints than the cap: with cap=1 every multi-fingerprint
        bucket is dropped, so only identical-fingerprint (hamming 0)
        pairs — which bypass banding — survive. Cross pairs are a
        documented lower bound under the cap, never an OOM."""
        from s3_access_logs_spark.sources.tables import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        full = simhash_near_pairs(docs, max_band_freq=None)
        capped = simhash_near_pairs(docs, max_band_freq=1)
        n_cross_full = full.filter(F.col("hamming") > 0).count()
        assert n_cross_full > 0  # the corpus does carry near pairs
        assert capped.filter(F.col("hamming") > 0).count() == 0
        # hamming-0 pairs are unaffected by the cap
        assert (
            capped.filter(F.col("hamming") == 0).count()
            == full.filter(F.col("hamming") == 0).count()
        )

    def test_invalid_geometry_fails_loud(self, spark):
        import pytest

        df = _docs(spark, [(1, "a b c")])
        with pytest.raises(ValueError):
            simhash_near_pairs(df, bits=48)  # not a multiple of 32
        with pytest.raises(ValueError):
            simhash_near_pairs(df, bits=64, chunks=3)  # 64 % 3 != 0


class TestAsofJoin:
    def test_backward_picks_latest_prior(self, spark):
        left = spark.createDataFrame(
            [("u1", 100, "L1"), ("u1", 250, "L2"), ("u2", 50, "L3")],
            ["k", "ts", "lbl"],
        )
        right = spark.createDataFrame(
            [("u1", 90, "R1"), ("u1", 200, "R2"), ("u1", 300, "R3"), ("u3", 1, "R4")],
            ["k", "ts", "rlbl"],
        )
        out = {
            r.lbl: r.r_rlbl
            for r in asof_join(left, right, on="k", right_prefix="r_").collect()
        }
        assert out == {"L1": "R1", "L2": "R2", "L3": None}

    def test_equal_timestamp_matches(self, spark):
        left = spark.createDataFrame([("u1", 100, "L")], ["k", "ts", "lbl"])
        right = spark.createDataFrame([("u1", 100, "R")], ["k", "ts", "rlbl"])
        out = asof_join(left, right, on="k", right_prefix="r_").collect()
        assert out[0].r_rlbl == "R"

    def test_forward_direction(self, spark):
        left = spark.createDataFrame([("u1", 100, "L")], ["k", "ts", "lbl"])
        right = spark.createDataFrame(
            [("u1", 90, "R1"), ("u1", 150, "R2")], ["k", "ts", "rlbl"]
        )
        out = asof_join(
            left, right, on="k", right_prefix="r_", direction="forward"
        ).collect()
        assert out[0].r_rlbl == "R2"


class TestSimilarity:
    def test_cosine_matches_math(self, spark):
        df = spark.createDataFrame(
            [([1.0, 0.0], [0.6, 0.8])], ["a", "b"]
        ).select(cosine_similarity("a", "b").alias("sim"))
        assert math.isclose(df.collect()[0].sim, 0.6, rel_tol=1e-12)

    def test_topk_ranks_by_cosine(self, spark):
        emb = spark.createDataFrame(
            [
                (0, [1.0, 0.0]),
                (1, [0.9, 0.1]),   # closest to 0
                (2, [0.0, 1.0]),   # orthogonal to 0
                (3, [-1.0, 0.0]),  # opposite
            ],
            ["vec_id", "embedding"],
        )
        out = brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=3).collect()
        assert [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)] == [1, 2, 3]

    def test_zero_norm_vectors_never_evict_real_candidates(self, spark):
        """Review r6: cosine vs a zero-norm vector is NULL, and struct
        fields with NULLs sort FIRST in array_sort — un-sentineled, the
        JVM pre-reduce kept NULL-sim rows in the per-slice top-k and
        evicted true neighbors. Both engines must rank every real
        candidate ahead of the NULL-sim tail and agree exactly."""
        rows = [(0, [1.0, 0.0])] + [
            (i, [0.9 - 0.1 * i, 0.1 * i]) for i in range(1, 6)
        ] + [(10 + i, [0.0, 0.0]) for i in range(4)]  # 4 zero-norm vectors
        # one partition: zero-norm and real candidates must share a slice
        # for the pre-fix eviction to trigger deterministically
        emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).coalesce(1)
        q = emb.filter(F.col("vec_id") == 0)

        def ranked(pre_reduce):
            return [
                (r.rank, r.neighbor_id, r.sim)
                for r in sorted(
                    brute_force_topk(emb, q, k=5, pre_reduce=pre_reduce).collect(),
                    key=lambda r: r.rank,
                )
            ]

        jvm, arrow = ranked("jvm"), ranked("arrow")
        assert jvm == arrow
        assert [n for _, n, _ in jvm] == [1, 2, 3, 4, 5]  # no NULL-sim row
        assert all(s is not None for _, _, s in jvm)

    def test_nan_sims_rank_last_and_k_independently(self, spark):
        """Review r6 pass 6: a NaN sim (inf vector component) previously
        sorted LAST in both pre-reduces but FIRST in the final window's
        sim DESC (Spark orders NaN above +inf), so the same row's rank
        flipped with k and partitioning. Normalized to NULL, all three
        orders agree: NaN rows rank strictly after every real sim, and
        appear only when fewer than k real candidates exist."""
        rows = (
            [(0, [1.0, 0.0])]
            + [(i, [1.0, 0.1 * i]) for i in range(1, 8)]
            + [(20, [float("inf"), 1.0])]
        )
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).coalesce(1)
        q = emb.filter(F.col("vec_id") == 0)

        def ranked(k, pre_reduce):
            from s3_access_logs_spark.operators.similarity import (
                brute_force_topk,
            )

            return [
                (r.rank, r.neighbor_id, r.sim)
                for r in sorted(
                    brute_force_topk(emb, q, k=k, pre_reduce=pre_reduce).collect(),
                    key=lambda r: r.rank,
                )
            ]

        for k in (5, 8):
            jvm, arrow = ranked(k, "jvm"), ranked(k, "arrow")
            assert jvm == arrow
            real = [n for _, n, s in jvm if s is not None]
            assert 20 not in real  # the NaN row never outranks a real sim
        # k=5: dropped entirely; k=8: present, but dead last with NULL sim
        assert [n for _, n, _ in ranked(5, "jvm")] == [1, 2, 3, 4, 5]
        last = ranked(8, "jvm")[-1]
        assert last[1] == 20 and last[2] is None


class TestIvfTopk:
    def test_ivf_recall_vs_brute_force(self, spark):
        from s3_access_logs_spark.operators.similarity import ivf_topk
        from s3_access_logs_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        queries = emb.filter(F.col("vec_id") < 4)
        exact = {
            (r.query_id, r.neighbor_id)
            for r in brute_force_topk(emb, queries, k=5).collect()
        }
        def recall(nprobe: int) -> float:
            approx = {
                (r.query_id, r.neighbor_id)
                for r in ivf_topk(emb, queries, k=5, nprobe=nprobe).collect()
            }
            assert len(approx) == 20  # k neighbors per query regardless
            return len(exact & approx) / len(exact)

        # approximate path: recall grows with probed lists and is non-trivial
        # even at nprobe=2 (these embeddings are near-random — the worst case
        # for any coarse quantizer; real corpora cluster far better)
        r2, r4 = recall(2), recall(4)
        assert r2 >= 0.25
        assert r4 >= r2

    def test_ivf_deterministic(self, spark):
        from s3_access_logs_spark.operators.similarity import ivf_topk
        from s3_access_logs_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        q = emb.filter(F.col("vec_id") < 4)
        a = ivf_topk(emb, q, k=5, nprobe=2).collect()
        b = ivf_topk(emb, q, k=5, nprobe=2).collect()
        assert a == b


class TestLshMultiprobe:
    def test_multiprobe_dominates_single_probe(self, spark):
        """Distance-1 multi-probe searches a strict superset of the home
        bucket, so per rank position the multi-probe sim must be >= the
        single-probe sim for every query, and recall vs exact must not
        drop. (The query-side-only explode is pinned by
        test_plan_shapes.test_lsh_multiprobe_explodes_query_side_only.)"""
        from s3_access_logs_spark.operators.similarity import (
            brute_force_topk,
            lsh_bucketed_topk,
        )
        from s3_access_logs_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        q = emb.filter(F.col("vec_id") < 8)

        def by_query(df):
            out: dict[int, list] = {}
            for r in df.collect():
                out.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.sim))
            return {k: sorted(v) for k, v in out.items()}

        single = by_query(lsh_bucketed_topk(emb, q, k=5))
        multi = by_query(lsh_bucketed_topk(emb, q, k=5, multiprobe=1))
        assert set(single) <= set(multi)  # a probed query never loses results
        for qid, srows in single.items():
            mrows = multi[qid]
            assert len(mrows) >= len(srows)
            for (_, _, s_sim), (_, _, m_sim) in zip(srows, mrows):
                assert m_sim >= s_sim

        exact = {
            (r.query_id, r.neighbor_id)
            for r in brute_force_topk(emb, q, k=5).collect()
        }
        hits_s = len(exact & {(q_, n) for q_, v in single.items() for _, n, _ in v})
        hits_m = len(exact & {(q_, n) for q_, v in multi.items() for _, n, _ in v})
        assert hits_m >= hits_s

    def test_multiprobe_rejects_unsupported_radius(self, spark):
        from s3_access_logs_spark.operators.similarity import lsh_bucketed_topk
        from s3_access_logs_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        with pytest.raises(ValueError, match="multiprobe"):
            lsh_bucketed_topk(emb, emb, multiprobe=2)


class TestIvfIndex:
    def test_probe_matches_inline_ivf_and_prunes_partitions(
        self, spark, tmp_path
    ):
        from s3_access_logs_spark.operators.similarity import (
            build_ivf_index,
            ivf_topk,
            probe_ivf_index,
        )
        from s3_access_logs_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        queries = emb.filter(F.col("vec_id") < 4)
        dst = str(tmp_path / "ivf")
        cents = build_ivf_index(emb, dst)
        probed = probe_ivf_index(
            spark, dst, queries, cents, k=5, nprobe=2
        )
        inline = ivf_topk(emb, queries, k=5, nprobe=2)
        assert sorted(map(tuple, probed.collect())) == sorted(
            map(tuple, inline.collect())
        )
        # the posting-list scan must carry cluster partition filters —
        # nprobe/nlist of the index subtree never enters the scan
        plan = probed._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan and "cluster" in plan


class TestIvfAppend:
    """Incremental index maintenance: grow a materialized IVF index from
    a new slice without re-shuffling the indexed corpus."""

    @staticmethod
    def _halves(spark):
        from s3_access_logs_spark.operators.similarity import label_centroids
        from s3_access_logs_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        mid = emb.agg(F.expr("percentile(vec_id, 0.5)")).first()[0]
        # ONE quantizer for both paths: append must reuse the saved
        # centroids, so trained-on-full vs trained-on-half is not the
        # variable under test
        cents = label_centroids(emb, "label", "embedding")
        return emb, emb.filter(F.col("vec_id") <= mid), emb.filter(
            F.col("vec_id") > mid
        ), cents

    def test_append_equals_full_build(self, spark, tmp_path):
        from s3_access_logs_spark.operators.similarity import (
            append_to_ivf_index,
            build_ivf_index,
            probe_ivf_index,
        )

        emb, first, rest, cents = self._halves(spark)
        queries = emb.filter(F.col("vec_id") < 4)
        grown, full = str(tmp_path / "grown"), str(tmp_path / "full")
        build_ivf_index(first, grown, centroids=cents)
        stats = append_to_ivf_index(spark, rest, grown, cents)
        assert stats == {
            "appended": rest.count(), "skipped_existing": 0
        }
        build_ivf_index(emb, full, centroids=cents)
        got = probe_ivf_index(spark, grown, queries, cents, k=5, nprobe=2)
        want = probe_ivf_index(spark, full, queries, cents, k=5, nprobe=2)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )

    def test_replayed_append_is_noop(self, spark, tmp_path):
        from s3_access_logs_spark.operators.similarity import (
            append_to_ivf_index,
            build_ivf_index,
            probe_ivf_index,
        )

        emb, first, rest, cents = self._halves(spark)
        dst = str(tmp_path / "ivf")
        build_ivf_index(first, dst, centroids=cents)
        append_to_ivf_index(spark, rest, dst, cents)
        before = sorted(
            map(
                tuple,
                probe_ivf_index(
                    spark, dst, emb.filter(F.col("vec_id") < 4), cents
                ).collect(),
            )
        )
        # at-least-once caller replays the same slice: every id is
        # already in its (partition-pruned) posting list -> no-op
        stats = append_to_ivf_index(spark, rest, dst, cents)
        assert stats == {
            "appended": 0, "skipped_existing": rest.count()
        }
        after = sorted(
            map(
                tuple,
                probe_ivf_index(
                    spark, dst, emb.filter(F.col("vec_id") < 4), cents
                ).collect(),
            )
        )
        assert before == after

    def test_missing_index_raises(self, spark, tmp_path):
        from s3_access_logs_spark.operators.similarity import (
            append_to_ivf_index,
        )

        emb, _, rest, cents = self._halves(spark)
        with pytest.raises(ValueError, match="build_ivf_index first"):
            append_to_ivf_index(
                spark, rest, str(tmp_path / "nothing_here"), cents
            )

    def test_compaction_keeps_probe_results(self, spark, tmp_path):
        from s3_access_logs_spark.operators.etl import compact_partitions
        from s3_access_logs_spark.operators.similarity import (
            append_to_ivf_index,
            build_ivf_index,
            probe_ivf_index,
        )

        emb, first, rest, cents = self._halves(spark)
        dst = str(tmp_path / "ivf")
        build_ivf_index(first, dst, centroids=cents)
        # several appends -> several file-sets per posting list
        thirds = [
            rest.filter(F.col("vec_id") % 3 == i) for i in range(3)
        ]
        for part in thirds:
            append_to_ivf_index(spark, part, dst, cents)
        queries = emb.filter(F.col("vec_id") < 4)
        before = sorted(
            map(
                tuple,
                probe_ivf_index(spark, dst, queries, cents).collect(),
            )
        )
        compact_partitions(spark, dst, target_file_bytes=1 << 30)
        after = sorted(
            map(
                tuple,
                probe_ivf_index(spark, dst, queries, cents).collect(),
            )
        )
        assert before == after


class TestKmeansFit:
    """Distributed Lloyd's training (spherical k-means) — the trainer that
    frees IVF from pre-labeled corpora."""

    @staticmethod
    def _blobs(spark):
        # 3 well-separated directions in R^4, 30 points each, deterministic
        # small offsets; cosine assignment must recover the generator
        base = {0: [10, 0, 0, 1], 1: [0, 10, 0, 1], 2: [0, 0, 10, 1]}
        rows = []
        for label, b in base.items():
            for i in range(30):
                off = [((i * 7 + d * 3) % 5) / 10.0 for d in range(4)]
                rows.append(
                    (label * 30 + i, label, [b[d] + off[d] for d in range(4)])
                )
        return spark.createDataFrame(
            rows, "vec_id int, true_label int, embedding array<double>"
        )

    def test_recovers_separated_blobs(self, spark):
        from s3_access_logs_spark.operators.similarity import (
            _assign_clusters,
            kmeans_fit,
        )

        df = self._blobs(spark)
        cents = kmeans_fit(df, k=3, max_iter=10)
        assert cents.count() == 3
        assigned = _assign_clusters(df, cents, "embedding", 1)
        # every trained cluster maps 1:1 onto one generator blob
        purity = (
            assigned.groupBy("true_label")
            .agg(F.countDistinct("cluster").alias("nc"))
            .collect()
        )
        assert all(r.nc == 1 for r in purity)
        assert assigned.select("cluster").distinct().count() == 3

    def test_deterministic_across_runs(self, spark):
        from s3_access_logs_spark.operators.similarity import kmeans_fit

        df = self._blobs(spark)
        a = sorted(map(tuple, kmeans_fit(df, k=3).collect()))
        b = sorted(map(tuple, kmeans_fit(df, k=3).collect()))
        assert a == b

    def test_empty_cluster_keeps_seed_position(self, spark):
        from s3_access_logs_spark.operators.similarity import kmeans_fit

        df = self._blobs(spark)
        # an init centroid pointing AWAY from every blob captures nothing
        dead = [-10.0, -10.0, -10.0, -10.0]
        cents = kmeans_fit(
            df,
            k=4,
            init=[[10, 0, 0, 1], [0, 10, 0, 1], [0, 0, 10, 1], dead],
        )
        rows = {r.label: list(r.centroid) for r in cents.collect()}
        assert len(rows) == 4
        assert rows[3] == dead  # unmoved, not dropped, not NaN

    def test_sample_fraction_is_deterministic(self, spark):
        from s3_access_logs_spark.operators.similarity import kmeans_fit

        df = self._blobs(spark)
        a = sorted(
            map(tuple, kmeans_fit(df, k=3, sample_fraction=0.5).collect())
        )
        b = sorted(
            map(tuple, kmeans_fit(df, k=3, sample_fraction=0.5).collect())
        )
        assert a == b and len(a) == 3

    def test_trained_centroids_plug_into_ivf(self, spark):
        from s3_access_logs_spark.operators.similarity import (
            ivf_topk,
            kmeans_fit,
        )
        from s3_access_logs_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        cents = kmeans_fit(emb, k=5, max_iter=5, vec_col="embedding")
        queries = emb.filter(F.col("vec_id") < 2)
        out = ivf_topk(emb, queries, k=3, nprobe=5, centroids=cents)
        # nprobe == nlist probes every posting list -> exact: must equal
        # the brute-force oracle
        from s3_access_logs_spark.operators.similarity import (
            brute_force_topk,
        )

        exact = brute_force_topk(emb, queries, k=3)
        assert sorted(map(tuple, out.collect())) == sorted(
            map(tuple, exact.collect())
        )

    def test_validation_failures_are_loud(self, spark):
        import pytest

        from s3_access_logs_spark.operators.similarity import kmeans_fit

        df = self._blobs(spark)
        with pytest.raises(ValueError, match="k must be"):
            kmeans_fit(df, k=0)
        with pytest.raises(ValueError, match="init has"):
            kmeans_fit(df, k=3, init=[[1.0, 0, 0, 0]])
        with pytest.raises(ValueError, match="sample_fraction"):
            kmeans_fit(df, k=2, sample_fraction=1.5)
        two = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])],
            "vec_id int, embedding array<double>",
        )
        with pytest.raises(ValueError, match="distinct"):
            kmeans_fit(two, k=3)
        ragged = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.5])],
            "vec_id int, embedding array<double>",
        )
        with pytest.raises(ValueError, match="dims"):
            kmeans_fit(ragged, k=2)


class TestSaltedJoin:
    def test_matches_plain_join_under_skew(self, spark):
        from s3_access_logs_spark.operators.joins import salted_join

        # 90% of left rows share one hot key
        left = spark.createDataFrame(
            [(1 if i % 10 else i, f"v{i}") for i in range(1000)], ["k", "lv"]
        )
        right = spark.createDataFrame(
            [(i, f"r{i}") for i in range(20)], ["k", "rv"]
        )
        plain = {tuple(r) for r in left.join(right, "k").collect()}
        salted = {tuple(r) for r in salted_join(left, right, "k", salt=8).collect()}
        assert salted == plain and len(salted) > 800

    def test_left_join_preserves_unmatched(self, spark):
        from s3_access_logs_spark.operators.joins import salted_join

        left = spark.createDataFrame([(1, "a"), (99, "b")], ["k", "lv"])
        right = spark.createDataFrame([(1, "r")], ["k", "rv"])
        out = {(r.k, r.rv) for r in salted_join(left, right, "k", 4, "left").collect()}
        assert out == {(1, "r"), (99, None)}


class TestSkewVsAqe:
    """Pins the salted_join-vs-AQE decision rule (VERDICT r3 item 8):
    AQE's skew split handles a standalone skewed SMJ, but DECLINES when
    the join's output partitioning is reused by a same-key aggregation —
    the case salted_join exists for."""

    SKEW_CONF = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }

    def _skewed_sides(self, spark):
        left = spark.range(500_000).select(
            F.when(F.col("id") % 4 == 0, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("rv")
        )
        return left, right

    def _with_conf(self, spark):
        saved = {
            k: spark.conf.get(k, None) for k in self.SKEW_CONF
        }
        for k, v in self.SKEW_CONF.items():
            spark.conf.set(k, v)
        return saved

    def _restore(self, spark, saved):
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    def test_aqe_splits_standalone_skewed_join(self, spark):
        saved = self._with_conf(spark)
        try:
            left, right = self._skewed_sides(spark)
            # global count is partitioning-agnostic: AQE may split freely
            j = left.join(right, "k").groupBy().count()
            assert j.collect()[0][0] == 500_000
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "isFinalPlan=true" in plan
            assert "skew=true" in plan  # AQE handled it: don't salt here
        finally:
            self._restore(spark, saved)

    def test_aqe_declines_when_same_key_agg_reuses_partitioning(self, spark):
        saved = self._with_conf(spark)
        try:
            left, right = self._skewed_sides(spark)
            agg = (
                left.join(right, "k")
                .groupBy("k")
                .agg(F.sum("v").alias("s"))
            )
            rows = agg.collect()
            plan = agg._jdf.queryExecution().executedPlan().toString()
            assert "isFinalPlan=true" in plan
            # the split would break the distribution the agg reuses, so
            # AQE leaves the hot key on one straggler — salting territory
            assert "skew=true" not in plan
            # 1000 % 4 == 0, so keys divisible by 4 all collapse into the
            # hot key 7: 750 surviving groups
            assert len(rows) == 750
        finally:
            self._restore(spark, saved)

    def test_salted_join_spreads_the_declined_case(self, spark):
        from s3_access_logs_spark.operators.joins import salted_join

        saved = self._with_conf(spark)
        try:
            left, right = self._skewed_sides(spark)
            plain = {
                (r.k, r.s)
                for r in left.join(right, "k")
                .groupBy("k")
                .agg(F.sum("v").alias("s"))
                .collect()
            }
            salted = salted_join(left, right, "k", salt=8).groupBy("k").agg(
                F.sum("v").alias("s")
            )
            assert {(r.k, r.s) for r in salted.collect()} == plain
            plan = salted._jdf.queryExecution().executedPlan().toString()
            # the join key is (k, _salt): the hot key occupies 8 shuffle
            # partitions of the join instead of one
            assert "_salt" in plan
        finally:
            self._restore(spark, saved)


class TestBucketedJoin:
    def test_bucketed_join_has_no_exchange(self, spark, tmp_path):
        from s3_access_logs_spark.sources.tables import load_table, write_bucketed

        sf = "/root/testdata/sf0.001"
        write_bucketed(load_table(spark, sf, "orders"), "b_orders",
                       "o_orderkey", 8)
        write_bucketed(load_table(spark, sf, "lineitem"), "b_lineitem",
                       "l_orderkey", 8)
        # force the sort-merge path: at sf0.001 AQE would broadcast these
        # tiny tables, hiding the property under test (at real scale both
        # sides are far past any broadcast threshold)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        try:
            o, li = spark.table("b_orders"), spark.table("b_lineitem")
            joined = o.join(li, o.o_orderkey == li.l_orderkey)
            # co-located buckets: the join itself needs no shuffle
            joined_plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in joined_plan
            assert "Exchange" not in joined_plan
            assert joined.count() > 0  # and it still computes
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
            spark.sql("DROP TABLE IF EXISTS b_orders")
            spark.sql("DROP TABLE IF EXISTS b_lineitem")


class TestUdtf:
    def test_tokenize_diagnostics_udtf(self, spark):
        from s3_access_logs_spark.functions.udtfs import TokenizeDiagnostics

        spark.udtf.register("tokenize_diag", TokenizeDiagnostics)
        rows = spark.sql(
            """SELECT t.* FROM (SELECT 'a "b c" [d e] f' AS line),
               LATERAL tokenize_diag(line) t"""
        ).collect()
        got = [(r.pos, r.token, r.kind) for r in rows]
        assert got == [
            (0, "a", "bare"),
            (1, "b c", "quoted"),
            (2, "d e", "bracketed"),
            (3, "f", "bare"),
        ]
        # spans index into the stripped line
        assert [(r.start, r.end) for r in rows] == [(0, 1), (2, 7), (8, 13), (14, 15)]


class TestConnectedComponents:
    def test_components_and_singletons(self, spark):
        from s3_access_logs_spark.operators.dedup import connected_components

        # chain 1-2-3, pair 10-11, singleton 20
        nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 20]], ["id"])
        edges = spark.createDataFrame(
            [(2, 1), (2, 3), (10, 11)], ["id_a", "id_b"]
        )
        out = {r.id: r.cluster_id for r in connected_components(nodes, edges).collect()}
        assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}

    def test_long_chain_converges(self, spark):
        from s3_access_logs_spark.operators.dedup import connected_components

        n = 12
        nodes = spark.createDataFrame([(i,) for i in range(n)], ["id"])
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"]
        )
        out = {r.id: r.cluster_id for r in connected_components(nodes, edges).collect()}
        assert out == {i: 0 for i in range(n)}

    def test_reliable_checkpoint_mode(self, spark, tmp_path):
        # cluster-durable path: reliable checkpoint() to a checkpoint dir
        # instead of executor-local blocks (VERDICT r1 item 7)
        from s3_access_logs_spark.operators.dedup import connected_components

        nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 9]], ["id"])
        edges = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
        spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
        try:
            # auto-detect (dir set -> reliable) and forced both agree
            for kw in ({}, {"reliable_checkpoint": True}):
                out = {
                    r.id: r.cluster_id
                    for r in connected_components(nodes, edges, **kw).collect()
                }
                assert out == {1: 1, 2: 1, 3: 1, 9: 9}
        finally:
            # no public unset; null through the JVM API clears it
            spark.sparkContext._jsc.sc().setCheckpointDir(None)

    def test_unconverged_raises(self, spark):
        import pytest as _pytest

        from s3_access_logs_spark.operators.dedup import connected_components

        n = 8
        nodes = spark.createDataFrame([(i,) for i in range(n)], ["id"])
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"]
        )
        with _pytest.raises(RuntimeError, match="did not converge"):
            connected_components(nodes, edges, max_iterations=2)

    def test_star_matches_min_label_on_mixed_graph(self, spark):
        from s3_access_logs_spark.operators.dedup import connected_components

        # components of every shape: chain, clique-ish, pair, singletons
        edge_rows = (
            [(i, i + 1) for i in range(20, 28)]  # chain
            + [(1, 2), (2, 3), (1, 3), (3, 4)]  # near-clique
            + [(50, 51)]
            + [(60, 61), (62, 61), (60, 63)]  # star shape
        )
        node_rows = sorted({a for a, _ in edge_rows}
                           | {b for _, b in edge_rows} | {99, 100})
        nodes = spark.createDataFrame([(i,) for i in node_rows], ["id"])
        edges = spark.createDataFrame(edge_rows, ["id_a", "id_b"])
        base = {
            r.id: r.cluster_id
            for r in connected_components(nodes, edges).collect()
        }
        star = {
            r.id: r.cluster_id
            for r in connected_components(
                nodes, edges, algorithm="star"
            ).collect()
        }
        assert star == base
        assert star[99] == 99 and star[27] == 20

    def test_star_long_chain_converges_in_log_rounds(self, spark):
        """VERDICT r3 item 5: a 64-node chain (diameter 63) must converge
        within log2(64)+2 = 8 star rounds — min-label propagation would
        need 63."""
        from s3_access_logs_spark.operators.dedup import connected_components

        n = 64
        nodes = spark.createDataFrame([(i,) for i in range(n)], ["id"])
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"]
        )
        out = {
            r.id: r.cluster_id
            for r in connected_components(
                nodes, edges, algorithm="star", max_iterations=8
            ).collect()
        }
        assert out == {i: 0 for i in range(n)}

    def test_star_unconverged_raises(self, spark):
        import pytest as _pytest

        from s3_access_logs_spark.operators.dedup import connected_components

        n = 40
        nodes = spark.createDataFrame([(i,) for i in range(n)], ["id"])
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"]
        )
        with _pytest.raises(RuntimeError, match="did not converge"):
            connected_components(
                nodes, edges, algorithm="star", max_iterations=1
            )

    def test_dedup_clusters_keep_policy(self, spark):
        from s3_access_logs_spark.operators.dedup import dedup_clusters

        text = "the quick brown fox jumps over the lazy dog again and again"
        rows = [
            (1, text),
            (2, text + " extra"),
            (3, "completely different content about spark engines at scale"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r.doc_id: r.cluster_id for r in dedup_clusters(df).collect()}
        # near-dups 1,2 share a band; 3 is its own cluster
        assert out[1] == 1 and out[2] == 1 and out[3] == 3


class TestZOrder:
    def test_interleave_matches_python(self, spark):
        from s3_access_logs_spark.operators.layout import zvalue

        def py_z(a, b, bits=16):
            z = 0
            for i in range(bits):
                z |= ((a >> i) & 1) << (2 * i + 1) | ((b >> i) & 1) << (2 * i)
            return z

        rows = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (12345, 54321)]
        df = spark.createDataFrame(rows, ["a", "b"])
        got = [r.z for r in df.select(zvalue("a", "b").alias("z")).collect()]
        assert got == [py_z(a, b) for a, b in rows]

    def test_zorder_write_clusters_both_dims(self, spark, tmp_path):
        from s3_access_logs_spark.operators.layout import zorder_write

        df = spark.range(4096).select(
            (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
        )
        out = str(tmp_path / "z")
        zorder_write(df, out, "x", "y", bits=6)
        back = spark.read.parquet(out)
        assert back.count() == 4096
        # within each file, both dims should span far less than their full
        # range (z-curve locality) — check via per-file min/max spread
        import pyspark.sql.functions as sf

        spread = (
            back.withColumn("f", sf.input_file_name())
            .groupBy("f")
            .agg(
                (sf.max("x") - sf.min("x")).alias("dx"),
                (sf.max("y") - sf.min("y")).alias("dy"),
            )
            .agg(sf.avg("dx").alias("adx"), sf.avg("dy").alias("ady"))
            .collect()[0]
        )
        n_files = back.select(sf.input_file_name()).distinct().count()
        if n_files > 4:
            assert spread.adx < 63 and spread.ady < 63


class TestRepetitionMetrics:
    def test_top_bigram_fraction_hand_computed(self, spark):
        from s3_access_logs_spark.functions.text import (
            repeated_token_ratio,
            top_bigram_fraction,
        )

        rows = [
            (1, "a b a b a b"),      # bigrams: ab ba ab ba ab -> top 'a b' x3 of 5
            (2, "x x x x"),          # bigrams: xx xx xx -> 3 of 3
            (3, "one two three"),    # all distinct -> 1 of 2
            (4, "solo"),             # no bigrams -> 0
            (5, ""),                 # no tokens -> 0
        ]
        df = _docs(spark, rows)
        out = {
            r.doc_id: (r.rep, r.top)
            for r in df.select(
                "doc_id",
                F.round(repeated_token_ratio("text"), 6).alias("rep"),
                F.round(top_bigram_fraction("text"), 6).alias("top"),
            ).collect()
        }
        assert out[1] == (round(4 / 6, 6), 0.6)
        assert out[2] == (0.75, 1.0)
        assert out[3] == (0.0, 0.5)
        assert out[4] == (0.0, 0.0)
        assert out[5] == (0.0, 0.0)


class TestChunkSpans:
    def test_spans_cover_and_overlap(self, spark):
        from s3_access_logs_spark.plans.catalog import load_all
        import tempfile

        # 30 tokens -> starts 0,12,24; lens 16,16,6
        text = " ".join(f"t{i}" for i in range(30))
        with tempfile.TemporaryDirectory() as d:
            df = spark.createDataFrame(
                [(7, text, "en", "web", len(text))],
                ["doc_id", "text", "lang", "source", "n_chars"],
            )
            df.write.parquet(f"{d}/documents.parquet")
            q = load_all()["doc_chunk_spans"]
            rows = sorted(
                (r.chunk_idx, r.tok_start, r.tok_len, r.head_tok)
                for r in q.builder(spark, d).collect()
            )
        assert rows == [(0, 0, 16, "t0"), (1, 12, 16, "t12"), (2, 24, 6, "t24")]


class TestNormalizeUnicode:
    """NFKC + mojibake repair (functions.text.normalize_unicode), the
    byte-canonicalization step upstream of every digest/shingle/gram."""

    def test_nfkc_and_mojibake_repair(self, spark):
        from s3_access_logs_spark.functions.text import normalize_unicode

        df = spark.createDataFrame(
            [
                (1, "cafÃ© society"),          # UTF-8 read as cp1252
                (2, "ﬁne Ａscii"),             # ligature + fullwidth
                (3, "NÃO"),                    # legit Portuguese, no repair
                (4, None),
                (5, "plain ascii"),
            ],
            "doc_id bigint, text string",
        )
        got = {r.doc_id: r.text for r in normalize_unicode(df).collect()}
        assert got[1] == "café society"
        assert got[2] == "fine Ascii"
        assert got[3] == "NÃO"  # strict round-trip rejects false repair
        assert got[4] is None
        assert got[5] == "plain ascii"

    def test_out_col_and_other_columns_pass_through(self, spark):
        from s3_access_logs_spark.functions.text import normalize_unicode

        df = spark.createDataFrame(
            [(1, "ﬁx", 3.5)], "doc_id bigint, text string, score double"
        )
        row = normalize_unicode(df, out_col="clean").first()
        assert row.text == "ﬁx" and row.clean == "fix" and row.score == 3.5

    def test_normalization_unifies_digests(self, spark):
        # the reason this exists: NFC/NFD/mojibake variants of one text
        # must collapse to one digest after normalization
        from s3_access_logs_spark.functions.text import normalize_unicode
        from s3_access_logs_spark.operators.dedup import dedup_exact

        nfc = "café"
        nfd = "cafe\u0301"  # e + combining acute
        moj = "cafÃ©"
        df = spark.createDataFrame(
            [(1, nfc), (2, nfd), (3, moj)], "doc_id bigint, text string"
        )
        assert dedup_exact(df).count() == 3  # distinct bytes pre-norm
        assert dedup_exact(normalize_unicode(df)).count() == 1


class TestPiiScrub:
    def test_redacts_and_counts(self, spark):
        from s3_access_logs_spark.functions.text import pii_count, pii_redact

        rows = [
            (1, "contact bob.smith+x@example.co.uk or 10.1.2.3 now"),
            (2, "card 1234567890123456 ok, short 12345 kept"),
            (3, "nothing sensitive here"),
        ]
        df = _docs(spark, rows)
        out = {
            r.doc_id: (r.clean, r.n)
            for r in df.select(
                "doc_id",
                pii_redact("text").alias("clean"),
                pii_count("text").alias("n"),
            ).collect()
        }
        assert out[1] == ("contact <EMAIL> or <IP> now", 2)
        assert out[2] == ("card <NUM> ok, short 12345 kept", 1)
        assert out[3] == ("nothing sensitive here", 0)


class TestRepetitionProperty:
    def test_run_length_equals_brute_force_multiplicity(self, spark):
        """The sorted-run-length fold must equal brute-force max bigram
        multiplicity on arbitrary token streams (incl. heavy repeats)."""
        from collections import Counter

        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from s3_access_logs_spark.functions.text import top_bigram_fraction

        token = st.sampled_from(["a", "b", "ab", "x1", "zz"])
        docs_strategy = st.lists(
            st.lists(token, min_size=0, max_size=12), min_size=1, max_size=8
        )

        @given(docs_strategy)
        @settings(
            max_examples=15,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        def check(docs):
            rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
            got = {
                r.doc_id: r.frac
                for r in _docs(spark, rows)
                .select(
                    "doc_id",
                    F.round(top_bigram_fraction("text"), 6).alias("frac"),
                )
                .collect()
            }
            for i, toks in enumerate(docs):
                bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
                want = (
                    round(max(Counter(bgs).values()) / len(bgs), 6)
                    if bgs
                    else 0.0
                )
                assert got[i] == want, (toks, got[i], want)

        check()


class TestBpeTokenCount:
    def test_hand_computed_counts(self, spark):
        from s3_access_logs_spark.functions.text import bpe_token_count

        rows = [
            (1, "abc def"),        # 2 letter runs
            (2, "abc, def!"),      # abc , _def ! -> 4
            (3, "a1b2"),           # a 1 b 2 -> 4
            (4, "price is 1234"),  # price _is _1234 -> 3
            (5, ""),               # 0
        ]
        got = {
            r.doc_id: r.n
            for r in _docs(spark, rows)
            .select("doc_id", bpe_token_count("text").alias("n"))
            .collect()
        }
        assert got == {1: 2, 2: 4, 3: 4, 4: 3, 5: 0}


class TestNgramOverlap:
    def test_hand_computed_overlap(self, spark):
        from s3_access_logs_spark.operators.dedup import ngram_overlap

        # benchmark doc: words a b c d  -> 3-gram shingles {abc, bcd}
        bench = spark.createDataFrame([(100, "a b c d")], ["doc_id", "text"])
        corpus = spark.createDataFrame(
            [
                # shares shingle (a,b,c) only: 3 shingles {abc, bcx, cxy}
                (1, "a b c x y", "s1"),
                # identical to bench: both shingles hit, 2/2
                (2, "a b c d", "s1"),
                # no overlap
                (3, "p q r s t", "s2"),
                # too short for any 3-gram
                (4, "a b", "s2"),
            ],
            ["doc_id", "text", "source"],
        )
        rows = {
            r.id: (r.source, r.n_sh, r.n_hit, round(r.overlap, 6))
            for r in ngram_overlap(corpus, bench, keep_cols=("source",)).collect()
        }
        # only contaminated docs appear
        assert set(rows) == {1, 2}
        assert rows[1] == ("s1", 3, 1, round(1 / 3, 6))
        assert rows[2] == ("s1", 2, 2, 1.0)

    def test_benchmark_side_is_broadcast(self, spark):
        from s3_access_logs_spark.operators.dedup import ngram_overlap

        bench = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
        corpus = spark.createDataFrame([(2, "a b c x")], ["doc_id", "text"])
        plan = ngram_overlap(corpus, bench)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestSemanticDedup:
    def test_keep_drop_within_clusters(self, spark):
        from s3_access_logs_spark.operators.similarity import semantic_dedup

        # Two well-separated clusters on axes x and y. Within cluster A,
        # ids 1/2 are near-identical (cos ~ 1 > 0.9); id 5 is orthogonal-ish
        # to nothing in its own cluster. Cross-cluster near-dups must NOT
        # drop anything (pair search is within-cluster only).
        rows = [
            (1, [1.0, 0.0, 0.0], "a"),
            (2, [0.999, 0.01, 0.0], "a"),   # dominated by id 1
            (3, [0.0, 1.0, 0.0], "b"),
            (4, [0.01, 0.999, 0.0], "b"),   # dominated by id 3
            (5, [0.9, 0.1, 0.0], "a"),       # near id 1 too -> dominated
        ]
        emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
        out = {
            r.id: (r.cluster, r.keep)
            for r in semantic_dedup(emb, threshold=0.9).collect()
        }
        assert out[1] == ("a", True)
        assert out[2] == ("a", False)
        assert out[3] == ("b", True)
        assert out[4] == ("b", False)
        assert out[5] == ("a", False)

    def test_below_threshold_keeps_all(self, spark):
        from s3_access_logs_spark.operators.similarity import semantic_dedup

        rows = [
            (1, [1.0, 0.0], "a"),
            (2, [0.0, 1.0], "a"),  # orthogonal: cos 0 < any threshold
        ]
        emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
        out = semantic_dedup(emb, threshold=0.5).collect()
        assert all(r.keep for r in out)

    def test_skewed_cluster_cap_reroutes_without_semantics_change(
        self, spark
    ):
        """Optimization r14 (VERDICT r13 item 3, guide §2.5): a cluster
        bigger than ``max_cluster_size`` must NOT be collected into one
        unspillable posting array — it reroutes to the spillable
        self-join — and the rerouting must not change a single output
        row. One hot cluster holds ~all rows (the boilerplate-embedding
        collapse), a second small cluster rides the array path, so the
        union covers both branches."""
        import math

        from s3_access_logs_spark.operators.similarity import (
            semantic_dedup,
        )

        # 60 vectors fanned tightly around +x (one centroid wins all of
        # them) + 3 around +y. Deterministic angles; neighbors inside
        # the fan are near-duplicates at threshold 0.9.
        rows = []
        for i in range(60):
            t = 0.001 * i
            rows.append((i, [math.cos(t), math.sin(t), 0.0], "x"))
        for i in range(60, 63):
            t = 0.001 * (i - 60)
            rows.append((i, [0.0, math.cos(t), math.sin(t)], "y"))
        emb = spark.createDataFrame(
            rows, ["vec_id", "embedding", "label"]
        )
        uncapped = {
            (r.id, r.cluster, r.keep)
            for r in semantic_dedup(
                emb, threshold=0.9, max_cluster_size=None
            ).collect()
        }
        capped = semantic_dedup(emb, threshold=0.9, max_cluster_size=8)
        got = [(r.id, r.cluster, r.keep) for r in capped.collect()]
        assert len(got) == len(rows)  # one output row per input row
        assert set(got) == uncapped  # bit-for-bit the same decisions
        # the hot branch really is a join (the spillable form), not a
        # posting-array collect
        plan = capped._jdf.queryExecution().executedPlan().toString()
        assert "Join" in plan
        # sanity on the decisions themselves: in the hot fan every row
        # is dominated by id 0; the small cluster keeps its lowest id
        by_id = dict((i, k) for i, _, k in got)
        assert by_id[0] is True and by_id[60] is True
        assert not any(by_id[i] for i in range(1, 60))


class TestPackedSequencesTies:
    def test_duplicate_and_null_id_tie_order_matches_oracle(
        self, spark, tmp_path
    ):
        """Review r9: the packed stream's concatenation order must be
        engine-identical even on doc_id TIES — duplicate ids (the
        uniqueness gate is opt-out-able) and multiple NULL ids (always
        exempt). Both engines order by (doc_id NULLS FIRST, toks), so
        the tie-break is the lexicographic list compare, not each
        engine's input order."""
        import duckdb

        from s3_access_logs_spark.plans.catalog import load_all

        rows = [
            (None, "zebra words here", "srcA", 16),
            (None, "alpha words here", "srcA", 16),  # NULL-id tie
            (7, "m m m m", "srcA", 7),
            (7, "a a a a", "srcA", 7),               # duplicate-id tie
            (8, "tail doc", "srcA", 8),
        ]
        sf = str(tmp_path)
        spark.createDataFrame(
            rows, "doc_id bigint, text string, source string, n_chars bigint"
        ).write.parquet(f"{sf}/documents.parquet")
        q = load_all()["packed_sequences"]
        srows = sorted(
            (r["source"], r["bin"], r["n_docs"], r["seq_tokens"],
             r["seq_text"])
            for r in q.builder(spark, sf).collect()
        )
        con = duckdb.connect()
        try:
            con.execute(
                f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet/*.parquet')"
            )
            drows = sorted(tuple(r) for r in con.execute(q.oracle).fetchall())
        finally:
            con.close()
        assert srows == drows


class TestTrainingShards:
    """Round 9: the training-export layout — deterministic hash shards
    + per-shard epoch permutation (operators/layout.py)."""

    def _df(self, spark, n=200):
        return spark.createDataFrame(
            [(i, f"word{i} " * (3 + i % 7)) for i in range(n)],
            ["doc_id", "text"],
        )

    def test_assignment_matches_python_md5_and_partitioning_invariant(
        self, spark
    ):
        import hashlib

        from s3_access_logs_spark.operators.layout import training_shards

        df = self._df(spark)
        got = {
            r.doc_id: (r.shard, r.shard_order)
            for r in training_shards(df, 8).collect()
        }
        for i in range(200):
            shard = int(hashlib.md5(f"shards:{i}".encode()).hexdigest()[:8], 16) % 8
            order = hashlib.md5(f"order:{i}".encode()).hexdigest()
            assert got[i] == (shard, order), i
        again = {
            r.doc_id: (r.shard, r.shard_order)
            for r in training_shards(df.repartition(13), 8).collect()
        }
        assert again == got

    def test_write_layout_and_within_shard_order(self, spark, tmp_path):
        import hashlib
        import os

        from s3_access_logs_spark.operators.layout import (
            write_training_shards,
        )

        df = self._df(spark, 150)
        dst = str(tmp_path / "shards")
        write_training_shards(df, dst, n_shards=4)
        dirs = sorted(
            d for d in os.listdir(dst) if d.startswith("shard=")
        )
        assert dirs == [f"shard={i}" for i in range(4)]
        back = spark.read.parquet(dst)
        assert back.count() == 150
        assert sorted(r.doc_id for r in back.collect()) == list(range(150))
        # within-shard FILE order replays the epoch permutation: read
        # one shard's files in order and compare to the md5 sort
        ids0 = [
            r.doc_id
            for r in spark.read.parquet(f"{dst}/shard=0").collect()
        ]
        expect0 = sorted(
            ids0,
            key=lambda i: hashlib.md5(f"order:{i}".encode()).hexdigest(),
        )
        assert ids0 == expect0 and len(ids0) > 0
        # a new epoch (order_salt) is a different permutation, same rows
        write_training_shards(
            df, dst, n_shards=4, order_salt="epoch1:"
        )
        ids0b = [
            r.doc_id
            for r in spark.read.parquet(f"{dst}/shard=0").collect()
        ]
        assert sorted(ids0b) == sorted(ids0) and ids0b != ids0

    def test_balance_holds_at_small_scale(self, spark):
        from s3_access_logs_spark.operators.layout import training_shards
        from tests.conftest import SF_CORRECT

        docs = spark.read.parquet(
            f"{SF_CORRECT}/documents.parquet"
        ).select("doc_id", "text")
        import pyspark.sql.functions as F

        sizes = [
            r.n
            for r in training_shards(docs, 8)
            .groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ]
        assert len(sizes) == 8
        avg = sum(sizes) / 8
        assert max(sizes) < 1.5 * avg and min(sizes) > 0.5 * avg

    def test_bad_n_shards_rejected(self, spark):
        from s3_access_logs_spark.operators.layout import training_shards

        with pytest.raises(ValueError, match="n_shards"):
            training_shards(self._df(spark, 5), 0)


class TestExportTrainingSet:
    """Round 10 (VERDICT r9 item 2): the one-call corpus→shards
    flagship — curate → token ids → EOS-marked fixed windows →
    hash-sharded hive layout, one extended waterfall."""

    def _docs(self, spark, n=120):
        # unique text per doc (curate's always-on exact dedup would
        # otherwise collapse repeated bodies to one keeper)
        rows = [
            (i, f"document number {i} the quick brown fox jumps over "
                "the lazy dog " * (1 + i % 5))
            for i in range(n)
        ]
        rows += [(n, ""), (n + 1, None)]  # dropped as empty
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_windows_reconstruct_the_exact_id_streams(
        self, spark, tmp_path
    ):
        """Read the written shards back and verify BOTH layout
        invariants and content: every window is exactly W ids except
        each shard's last; concatenating a shard's windows in index
        order reproduces precisely the per-shard stream built
        independently in Python (shard hash, order hash, reference
        encoder, EOS) — documents split across windows, nothing
        reordered, dropped or padded."""
        import hashlib

        from s3_access_logs_spark.functions import bpe as B
        from s3_access_logs_spark.operators.export import (
            export_training_set,
        )

        W = 32
        docs = self._docs(spark)
        dst = str(tmp_path / "shards")
        wins, report = export_training_set(
            docs, dst, n_shards=4, window_ids=W
        )
        ms = list(B.default_merges())
        vocab = B.bpe_vocab(ms)
        ids = {t: i for i, t in enumerate(vocab)}
        eos = len(vocab)
        expected: dict = {}
        for r in docs.filter("text is not null and trim(text) <> ''") \
                     .collect():
            shard = (
                int(
                    hashlib.md5(f"shards:{r.doc_id}".encode())
                    .hexdigest()[:8],
                    16,
                )
                % 4
            )
            order = hashlib.md5(f"order:{r.doc_id}".encode()).hexdigest()
            stream = [
                ids.get(t, -1) for t in B.bpe_encode_py(r.text, ms)
            ] + [eos]
            expected.setdefault(shard, []).append((order, r.doc_id, stream))
        ref_streams = {
            s: [x for _, _, st in sorted(v) for x in st]
            for s, v in expected.items()
        }
        got = wins.collect()
        by_shard: dict = {}
        for r in got:
            by_shard.setdefault(r.shard, []).append(r)
        assert set(by_shard) == set(ref_streams)
        for s, rows in by_shard.items():
            rows.sort(key=lambda r: r.window_idx)
            assert [r.window_idx for r in rows] == list(range(len(rows)))
            for r in rows[:-1]:
                assert len(r.ids) == W
            flat = [x for r in rows for x in r.ids]
            assert flat == ref_streams[s], f"shard {s}"
        rep = {r.stage: r.dropped for r in report.collect()}
        n_kept = sum(len(v) for v in expected.values())
        assert rep["empty"] == 2
        assert rep["shards_written"] == len(ref_streams)
        assert rep["windows_emitted"] == sum(
            len(v) for v in by_shard.values()
        )
        assert rep["tokens_kept"] == (
            sum(len(st) for st in ref_streams.values()) - n_kept
        )

    def test_rerun_is_bit_identical_and_curate_gates_apply(
        self, spark, tmp_path
    ):
        from s3_access_logs_spark.operators.export import (
            export_training_set,
        )

        docs = self._docs(spark, 60)
        d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
        w1, r1 = export_training_set(
            docs, d1, n_shards=3, window_ids=16,
            curate={"min_quality": 0.2},
        )
        w2, r2 = export_training_set(
            docs.repartition(7), d2, n_shards=3, window_ids=16,
            curate={"min_quality": 0.2},
        )
        k = lambda df: sorted(  # noqa: E731
            (r.shard, r.window_idx, tuple(r.ids)) for r in df.collect()
        )
        assert k(w1) == k(w2)
        assert sorted(map(tuple, r1.collect())) == sorted(
            map(tuple, r2.collect())
        )

    def test_emit_spans_marks_document_segments(self, spark, tmp_path):
        """emit_spans: every window carries (start, len) spans that
        tile it exactly, each span is one document's contiguous
        segment, and a split document's continuation span starts at 0
        in the next window — the mask metadata a trainer consumes,
        derived from the same sorted segment list as the ids so it can
        never disagree with them."""
        from s3_access_logs_spark.operators.export import (
            export_training_set,
        )

        docs = self._docs(spark, 40)
        wins, _ = export_training_set(
            docs, str(tmp_path / "s"), n_shards=2, window_ids=16,
            emit_spans=True,
        )
        rows = wins.collect()
        assert rows and "doc_spans" in wins.columns
        eos_seen = 0
        by_shard: dict = {}
        for r in rows:
            by_shard.setdefault(r.shard, []).append(r)
        for s_, srows in by_shard.items():
            srows.sort(key=lambda r: r.window_idx)
            for r in srows:
                spans = [(sp["start"], sp["len"]) for sp in r.doc_spans]
                # spans tile the window contiguously from 0
                pos = 0
                for st, ln in spans:
                    assert st == pos and ln >= 1, (s_, r.window_idx)
                    pos += ln
                assert pos == len(r.ids)
                # a span ending mid-window must end with EOS (a whole
                # document ended); the final span may continue into
                # the next window
                eos = max(r.ids)  # EOS is one past every vocab id
                for st, ln in spans[:-1]:
                    assert r.ids[st + ln - 1] == eos
                    eos_seen += 1
            # continuation: any window after one whose last span had
            # no EOS must begin a span at 0 (always true by tiling) —
            # and the shard's LAST window ends with EOS
            last = srows[-1]
            assert last.ids[-1] == eos
        assert eos_seen > 0  # multiple docs actually shared windows

    def test_mixture_rebalances_sources_and_waterfall_stays_exact(
        self, spark, tmp_path
    ):
        """mixture: count^alpha re-balancing between curation and
        tokenize — the skewed source shrinks toward the small one's
        share, mixture drops land as a waterfall row, and the
        docs-conservation identity (input == curate drops + mixture
        drops + EOS count) holds exactly."""
        from s3_access_logs_spark.operators.export import (
            export_training_set,
        )

        rows = [
            (i, f"big source document {i} full of words", "web")
            for i in range(180)
        ] + [
            (1000 + i, f"small source document {i} quality text", "books")
            for i in range(20)
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        wins, report = export_training_set(
            docs, str(tmp_path / "s"), n_shards=2, window_ids=16,
            mixture={"alpha": 0.5},
        )
        rep = {r.stage: r.dropped for r in report.collect()}
        assert rep["mixture"] > 0
        # CROSS-CHECK against the operator's own independent output
        # (review r10, second pass: the old identity was derivable
        # from the report itself): the mixture row and the windows'
        # document mass must equal what temperature_mixture actually
        # keeps on this corpus, per source
        from pyspark.sql import functions as F

        from s3_access_logs_spark.operators.sampling import (
            temperature_mixture,
        )

        kept = temperature_mixture(docs, "source", "doc_id", alpha=0.5)
        per_src = {
            r["source"]: r["n"]
            for r in kept.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        # the small source's rate caps at 1 (kept whole); the big one
        # genuinely downsamples — the count^alpha headline behavior
        assert per_src["books"] == 20
        assert per_src["web"] < 180
        n_kept = sum(per_src.values())
        assert rep["mixture"] == 200 - n_kept
        # every kept doc contributes exactly one EOS to the windows
        total_ids = wins.agg(
            F.sum(F.size("ids")).alias("t")
        ).first()["t"]
        assert total_ids == rep["tokens_kept"] + n_kept
        # rerun determinism: same salt -> same kept set
        wins2, rep2 = export_training_set(
            docs.repartition(5), str(tmp_path / "s2"), n_shards=2,
            window_ids=16, mixture={"alpha": 0.5},
        )
        k = lambda df: sorted(  # noqa: E731
            (r.shard, r.window_idx, tuple(r.ids)) for r in df.collect()
        )
        assert k(wins) == k(wins2)

    def test_colliding_eos_id_fails_loud(self, spark, tmp_path):
        """An EOS id inside the vocab id space (or equal to unk) would
        make real tokens count as document boundaries — the report's
        accounting silently wrong (review r10, second pass)."""
        from s3_access_logs_spark.operators.export import (
            export_training_set,
        )

        docs = self._docs(spark, 4)
        with pytest.raises(ValueError, match="eos_id"):
            export_training_set(
                docs, str(tmp_path / "s"), eos_id=5
            )
        with pytest.raises(ValueError, match="eos_id"):
            export_training_set(
                docs, str(tmp_path / "s"), eos_id=-1
            )

    def test_zero_survivors_yields_empty_export(self, spark, tmp_path):
        from s3_access_logs_spark.operators.export import (
            export_training_set,
        )

        docs = spark.createDataFrame(
            [(1, ""), (2, None)], "doc_id long, text string"
        )
        wins, report = export_training_set(
            docs, str(tmp_path / "s"), n_shards=2, window_ids=8
        )
        assert wins.count() == 0
        # empty-export columns must match a real read-back's order
        # (data cols then partition col — review r10, second pass)
        assert wins.columns == ["window_idx", "ids", "shard"]
        rep = {r.stage: r.dropped for r in report.collect()}
        assert rep["tokens_kept"] == 0
        assert rep["windows_emitted"] == 0
        assert rep["shards_written"] == 0
        assert rep["empty"] == 2


    def test_pad_id_fixed_shapes_and_accounting(self, spark, tmp_path):
        """pad_id (round 11, VERDICT r10 item 2): EVERY window is
        exactly window_ids long; pads appear only as a contiguous tail
        of each shard's final window; doc_spans never cover the pad
        tail; tokens_kept excludes pads; stripping the pads reproduces
        the unpadded export bit-for-bit."""
        from s3_access_logs_spark.functions import bpe as B
        from s3_access_logs_spark.operators.export import (
            export_training_set,
        )

        W = 16
        pad = len(B.bpe_vocab(list(B.default_merges()))) + 1
        docs = self._docs(spark, 40)
        wins, report = export_training_set(
            docs, str(tmp_path / "p"), n_shards=2, window_ids=W,
            pad_id=pad, emit_spans=True,
        )
        plain, rep0 = export_training_set(
            docs, str(tmp_path / "u"), n_shards=2, window_ids=W,
        )
        rows = wins.collect()
        assert rows
        by_shard: dict = {}
        for r in rows:
            assert len(r.ids) == W, "every padded window is exact-shape"
            by_shard.setdefault(r.shard, []).append(r)
        n_pads = 0
        for s_, srows in by_shard.items():
            srows.sort(key=lambda r: r.window_idx)
            for r in srows[:-1]:
                assert pad not in r.ids, "pads only in the last window"
            last = srows[-1].ids
            k = len(last)
            while k > 0 and last[k - 1] == pad:
                k -= 1
            assert pad not in last[:k], "pad tail is contiguous"
            n_pads += W - k
            # spans tile exactly the REAL ids, never the pad tail
            spans = [
                (sp["start"], sp["len"]) for sp in srows[-1].doc_spans
            ]
            assert spans and spans[-1][0] + spans[-1][1] == k
        # stripping pads == the unpadded export
        strip = sorted(
            (r.shard, r.window_idx,
             tuple(x for x in r.ids if x != pad))
            for r in rows
        )
        assert strip == sorted(
            (r.shard, r.window_idx, tuple(r.ids))
            for r in plain.collect()
        )
        rep = {r.stage: r.dropped for r in report.collect()}
        rep_plain = {r.stage: r.dropped for r in rep0.collect()}
        assert rep["tokens_kept"] == rep_plain["tokens_kept"]
        assert rep["windows_emitted"] == rep_plain["windows_emitted"]
        assert n_pads > 0  # the corpus genuinely exercised padding

    def test_colliding_pad_id_fails_loud(self, spark, tmp_path):
        from s3_access_logs_spark.operators.export import (
            export_training_set,
        )

        docs = self._docs(spark, 4)
        for bad in (5, -1):  # inside the vocab space / the unk id
            with pytest.raises(ValueError, match="pad_id"):
                export_training_set(
                    docs, str(tmp_path / "s"), pad_id=bad
                )
        # pad == eos is also a collision even though both sit outside
        # the vocab — masks could not tell boundaries from padding
        from s3_access_logs_spark.functions import bpe as B

        eos = len(B.bpe_vocab(list(B.default_merges())))
        with pytest.raises(ValueError, match="pad_id"):
            export_training_set(
                docs, str(tmp_path / "s"), pad_id=eos
            )


class TestTokenStoreEpochs:
    """write_token_store + repack_epoch (round 11, VERDICT r10 item 1):
    the expensive half materialized once, epochs as cheap re-packs."""

    def _docs(self, spark, n=80):
        rows = [
            (
                i,
                f"document number {i} with some shared words and "
                f"unique token u{i} " * (1 + i % 4),
                f"src{i % 3}",
            )
            for i in range(n)
        ]
        rows += [(n, "", "src0"), (n + 1, None, "src1")]
        return spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )

    def test_repack_epoch_bit_identical_to_export(self, spark, tmp_path):
        """The headline pin: for ANY epoch salt, repack_epoch over the
        store == export_training_set over the corpus, window for
        window, id for id — so N epochs cost one tokenize plus N
        re-packs instead of N full pipelines."""
        from s3_access_logs_spark.operators.export import (
            export_training_set,
            repack_epoch,
            write_token_store,
        )

        docs = self._docs(spark)
        store = str(tmp_path / "store")
        report = write_token_store(docs, store, n_shards=3)
        rep = {r.stage: r.dropped for r in report.collect()}
        assert rep["empty"] == 2
        assert rep["docs_stored"] == 80
        assert rep["shards_written"] == 3
        key = lambda df: sorted(  # noqa: E731
            (r.shard, r.window_idx, tuple(r.ids)) for r in df.collect()
        )
        for i, salt in enumerate(("order:", "epoch17:")):
            got = repack_epoch(
                spark, store, str(tmp_path / f"re{i}"),
                window_ids=16, n_shards=3, order_salt=salt,
            )
            want, erep = export_training_set(
                docs, str(tmp_path / f"ex{i}"), n_shards=3,
                window_ids=16, order_salt=salt,
            )
            assert key(got) == key(want), salt
            # the store report's token accounting matches the export's
            er = {r.stage: r.dropped for r in erep.collect()}
            assert rep["tokens_stored"] == er["tokens_kept"]

    def test_repack_epoch_options_and_empty_store(self, spark, tmp_path):
        """pad/spans thread through the re-pack (the two artifact paths
        must not diverge in capability — ADVICE r10), and a
        never-written store yields the empty artifact frame."""
        from s3_access_logs_spark.functions import bpe as B
        from s3_access_logs_spark.operators.export import (
            repack_epoch,
            write_token_store,
        )

        W = 16
        pad = len(B.bpe_vocab(list(B.default_merges()))) + 1
        docs = self._docs(spark, 30)
        store = str(tmp_path / "store")
        write_token_store(docs, store, n_shards=2)
        wins = repack_epoch(
            spark, store, str(tmp_path / "w"), window_ids=W,
            n_shards=2, emit_spans=True, pad_id=pad,
        )
        rows = wins.collect()
        assert rows and "doc_spans" in wins.columns
        for r in rows:
            assert len(r.ids) == W
            pos = 0
            for sp in r.doc_spans:
                assert sp["start"] == pos
                pos += sp["len"]
            # spans tile the real ids; any remainder is all pad
            assert all(x == pad for x in r.ids[pos:])
        empty = repack_epoch(
            spark, str(tmp_path / "nowhere"), str(tmp_path / "e"),
            emit_spans=True,
        )
        assert empty.count() == 0
        assert empty.columns == ["window_idx", "ids", "doc_spans", "shard"]

    def test_repack_pad_collision_fails_loud(self, spark, tmp_path):
        """The store's sidecar carries the id-space contract, so a pad
        id inside it fails the SAME way the export path fails (review
        r11: the two artifact paths must not diverge in the fail-loud
        guarantee); a valid pad still repacks."""
        from s3_access_logs_spark.functions import bpe as B
        from s3_access_logs_spark.operators.export import (
            repack_epoch,
            write_token_store,
        )

        docs = self._docs(spark, 10)
        store = str(tmp_path / "store")
        write_token_store(docs, store, n_shards=2)
        vocab_size = len(B.bpe_vocab(list(B.default_merges())))
        for bad in (5, -1, vocab_size):  # in-vocab / unk / eos
            with pytest.raises(ValueError, match="pad_id"):
                repack_epoch(
                    spark, store, str(tmp_path / "w"), pad_id=bad
                )
        ok = repack_epoch(
            spark, store, str(tmp_path / "w"),
            window_ids=16, n_shards=2, pad_id=vocab_size + 1,
        )
        assert ok.filter(F.size("ids") != 16).count() == 0
        # the CLI surfaces the collision as a usage-class exit 2
        from s3_access_logs_spark.cli import run_repack_epoch

        assert run_repack_epoch(
            [store, str(tmp_path / "w2"), "--pad-id", "5"]
        ) == 2
        assert run_repack_epoch(
            [store, str(tmp_path / "w2"), "--window", "0"]
        ) == 2

    def test_repack_mixture_bit_identical_to_export(self, spark, tmp_path):
        """Per-epoch CURRICULUM (round 12, VERDICT r11 item 2): the
        store persists `source`, and repack_epoch(mixture=) applies the
        SAME deterministic hash-rate filter the export applies to
        curate survivors — so for ANY (alpha, epoch salt) the windows
        are bit-identical to export_training_set(mixture=...), without
        re-running curate or tokenize."""
        from s3_access_logs_spark.operators.export import (
            export_training_set,
            repack_epoch,
            write_token_store,
        )

        rows = [
            (i, f"big source document {i} full of words", "web")
            for i in range(150)
        ] + [
            (1000 + i, f"small source document {i} quality text", "books")
            for i in range(30)
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        store = str(tmp_path / "store")
        write_token_store(docs, store, n_shards=3)  # UNMIXED store
        stored = spark.read.parquet(store)
        assert "source" in stored.columns  # persisted for curricula
        key = lambda df: sorted(  # noqa: E731
            (r.shard, r.window_idx, tuple(r.ids)) for r in df.collect()
        )
        # epoch-varying mixtures over ONE store — each equal to the
        # full export under the same mixture + salt
        for i, (alpha, salt) in enumerate(
            ((0.5, "order:"), (0.0, "ep2:"), (0.5, "ep3:"))
        ):
            got = repack_epoch(
                spark, store, str(tmp_path / f"re{i}"),
                window_ids=16, n_shards=3, order_salt=salt,
                mixture={"alpha": alpha},
            )
            want, _ = export_training_set(
                docs, str(tmp_path / f"ex{i}"), n_shards=3,
                window_ids=16, order_salt=salt,
                mixture={"alpha": alpha},
            )
            assert key(got) == key(want), (alpha, salt)
            assert got.count() > 0
        # alpha=0 equalizes: strictly fewer windows than the unmixed
        # epoch under the same salt
        unmixed = repack_epoch(
            spark, store, str(tmp_path / "u"), window_ids=16,
            n_shards=3, order_salt="ep2:",
        )
        mixed = spark.read.parquet(str(tmp_path / "re1"))
        assert mixed.count() < unmixed.count()

    def test_repack_mixture_on_sourceless_store_fails_loud(
        self, spark, tmp_path
    ):
        from s3_access_logs_spark.operators.export import (
            repack_epoch,
            write_token_store,
        )

        docs = spark.createDataFrame(
            [(i, f"plain document {i} words") for i in range(20)],
            "doc_id long, text string",
        )
        store = str(tmp_path / "store")
        write_token_store(docs, store, n_shards=2)
        assert "source" not in spark.read.parquet(store).columns
        with pytest.raises(ValueError, match="no 'source' column"):
            repack_epoch(
                spark, store, str(tmp_path / "w"),
                mixture={"alpha": 0.5},
            )
        # without mixture the sourceless store still repacks fine
        assert repack_epoch(
            spark, store, str(tmp_path / "w2"), window_ids=16,
            n_shards=2,
        ).count() > 0

    def test_repack_pad_on_prescheme_store_warns(
        self, spark, tmp_path, caplog
    ):
        """A store with data but NO sidecar (pre-scheme, or a writer
        that crashed between the parquet overwrite and the stamp —
        ADVICE r11) must not skip pad validation SILENTLY: the repack
        proceeds (the caller owns pad validity there, as documented)
        but says so out loud."""
        import logging

        from s3_access_logs_spark.operators.export import (
            TOKEN_STORE_META,
            repack_epoch,
            write_token_store,
        )
        from s3_access_logs_spark.sources.fsutil import hadoop_fs

        docs = self._docs(spark, 10)
        store = str(tmp_path / "store")
        write_token_store(docs, store, n_shards=2)
        fs, _ = hadoop_fs(spark, store)
        HPath = spark._jvm.org.apache.hadoop.fs.Path
        fs.delete(HPath(f"{store}/{TOKEN_STORE_META}"), False)
        with caplog.at_level(
            logging.WARNING, logger="s3_access_logs_spark"
        ):
            wins = repack_epoch(
                spark, store, str(tmp_path / "w"),
                window_ids=16, n_shards=2, pad_id=10_000,
            )
        assert wins.count() > 0
        assert any(
            "pad-collision validation SKIPPED" in r.message
            for r in caplog.records
        )
        # no pad requested -> no warning either (nothing was skipped)
        caplog.clear()
        with caplog.at_level(
            logging.WARNING, logger="s3_access_logs_spark"
        ):
            repack_epoch(
                spark, store, str(tmp_path / "w2"),
                window_ids=16, n_shards=2,
            )
        assert not any(
            "SKIPPED" in r.message for r in caplog.records
        )

    def test_sidecar_records_tokenizer_provenance(self, spark, tmp_path):
        """Round 12: the sidecar names WHICH tokenizer the stored ids
        are bound to (pretokenizer + merges fingerprint) — two stores
        with equal vocab sizes but different tables are otherwise
        indistinguishable on disk. Consumers still require only the
        three id-space keys, so pre-round-12 stores stay valid."""
        from s3_access_logs_spark.functions import bpe as B
        from s3_access_logs_spark.operators.export import (
            TOKEN_STORE_META,
            merges_fingerprint,
            write_token_store,
        )
        from s3_access_logs_spark.plans.text_queries import _fit_merges
        from s3_access_logs_spark.sources.fsutil import read_json_sidecar

        docs = self._docs(spark, 10)
        s1 = str(tmp_path / "s1")
        write_token_store(docs, s1, n_shards=2)
        m1 = read_json_sidecar(spark, s1, TOKEN_STORE_META)
        assert m1["pretokenizer"] == "default"
        assert m1["merges_md5"] == merges_fingerprint(
            list(B.default_merges())
        )
        s2 = str(tmp_path / "s2")
        write_token_store(docs, s2, n_shards=2, merges=_fit_merges())
        m2 = read_json_sidecar(spark, s2, TOKEN_STORE_META)
        assert m2["merges_md5"] != m1["merges_md5"]
        # the fingerprint hashes the TABLE, not the concatenations
        assert merges_fingerprint([("a", "b"), ("ab", "c")]) != (
            merges_fingerprint([("a", "bc")])
        )

    def test_store_preflight_report_from_stored_ids(
        self, spark, tmp_path
    ):
        """Store-mode pre-flight (round 12, VERDICT r11 item 5): unk +
        layout stats from the STORED ids alone, with the layout half
        pinned against the real artifact — the report's n_windows must
        equal what repack_epoch actually cuts."""
        from s3_access_logs_spark.functions import bpe as B
        from s3_access_logs_spark.operators.export import (
            TOKEN_STORE_META,
            repack_epoch,
            store_preflight_report,
            write_token_store,
        )
        from s3_access_logs_spark.plans.text_queries import _fit_merges

        docs = self._docs(spark)  # two-ish sources, 80 real docs
        store = str(tmp_path / "store")
        # the 40-merge prefix leaves 7 letters out of the charset, so
        # unk_rate is non-trivially > 0 (the r11 oracle lesson)
        write_token_store(docs, store, n_shards=3, merges=_fit_merges())
        W = 16
        rep = store_preflight_report(spark, store, window_ids=W)
        rows = rep.collect()
        assert sorted(r.source for r in rows) == ["src0", "src1", "src2"]
        assert all(r.unk_rate > 0 for r in rows)
        assert all(not r.unk_flag for r in rows)  # under 0.25 here
        # layout half is GLOBAL (identical on every row) and matches
        # the artifact repack_epoch cuts at the same window size
        assert len({(r.n_windows, r.pad_ids) for r in rows}) == 1
        wins = repack_epoch(
            spark, store, str(tmp_path / "w"), window_ids=W, n_shards=3
        )
        assert rows[0].n_windows == wins.count()
        # id-mass identity: windows * W == real ids (+EOS) + pads
        total_stream = sum(r.total_ids + r.n_docs for r in rows)
        assert rows[0].n_windows * W == total_stream + rows[0].pad_ids
        # a hair-trigger threshold flips the flag
        flagged = store_preflight_report(
            spark, store, window_ids=W, unk_threshold=0.0001
        )
        assert all(r.unk_flag for r in flagged.collect())
        # sourceless store -> one NULL-source row
        plain = spark.createDataFrame(
            [(i, f"plain doc {i} words") for i in range(10)],
            "doc_id long, text string",
        )
        store2 = str(tmp_path / "s2")
        write_token_store(plain, store2, n_shards=2)
        r2 = store_preflight_report(spark, store2, window_ids=W).collect()
        assert len(r2) == 1 and r2[0].source is None
        # pre-scheme store: no sidecar and no explicit ids fails loud;
        # explicit ids work
        from s3_access_logs_spark.sources.fsutil import hadoop_fs

        fs, _ = hadoop_fs(spark, store2)
        HPath = spark._jvm.org.apache.hadoop.fs.Path
        fs.delete(HPath(f"{store2}/{TOKEN_STORE_META}"), False)
        with pytest.raises(ValueError, match="unk_id"):
            store_preflight_report(spark, store2, window_ids=W)
        eos = len(B.bpe_vocab(list(B.default_merges())))
        ok = store_preflight_report(
            spark, store2, window_ids=W, unk_id=-1, eos_id=eos
        ).collect()
        # explicit ids reproduce exactly what the sidecar gave
        assert ok == r2

    def test_store_preflight_counts_eos_not_assumes(self, spark, tmp_path):
        """ADVICE r12 (pinned r14): the pre-flight COUNTS EOS markers
        instead of assuming exactly one per stored stream — a foreign /
        pre-scheme store with multi-document rows or missing trailing
        EOS must report total_ids and docs_per_window from the observed
        boundaries, not off-by-n_docs."""
        from s3_access_logs_spark.operators.export import (
            store_preflight_report,
        )

        store = str(tmp_path / "foreign")
        rows = [
            (1, [1, 9, 2, 9], 0),  # two documents in one stored row
            (2, [0, 2, 3], 0),     # no trailing EOS at all (id 0 = unk)
            (3, [7], 1),           # no EOS either
        ]
        spark.createDataFrame(
            rows, "doc_id long, ids array<int>, shard int"
        ).write.partitionBy("shard").parquet(store)
        rep = store_preflight_report(
            spark, store, window_ids=4, unk_id=0, eos_id=9
        ).collect()
        assert len(rep) == 1
        r = rep[0]
        # counted: 8 stored ids minus the 2 OBSERVED EOS (assuming one
        # per row would report 5); unk id 0 appears once
        assert r.n_docs == 3
        assert r.total_ids == 6
        assert r.unk_ids == 1
        # layout: shard0 stream 7 -> 2 windows, shard1 stream 1 -> 1
        assert r.n_windows == 3
        assert r.pad_ids == 3 * 4 - 8
        # docs_per_window counts EOS BOUNDARIES (2), not rows (3)
        assert r.docs_per_window == round(2 / 3, 6)

    def test_write_token_store_mixture_accounting(self, spark, tmp_path):
        """The store path's mixture row keeps the exact conservation
        identity: input == curate drops + mixture drops + docs_stored."""
        from s3_access_logs_spark.operators.export import (
            write_token_store,
        )

        rows = [
            (i, f"big source document {i} full of words", "web")
            for i in range(180)
        ] + [
            (1000 + i, f"small source document {i} quality text", "books")
            for i in range(20)
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        report = write_token_store(
            docs, str(tmp_path / "store"), n_shards=2,
            mixture={"alpha": 0.5},
        )
        rep = {r.stage: r.dropped for r in report.collect()}
        assert rep["mixture"] > 0
        curate_drops = sum(
            v for k, v in rep.items()
            if k not in ("mixture", "docs_stored", "tokens_stored",
                         "shards_written")
        )
        assert curate_drops + rep["mixture"] + rep["docs_stored"] == 200


class TestShuffleRows:
    def test_permutation_matches_md5_order_and_is_rerun_stable(self, spark):
        import hashlib

        from s3_access_logs_spark.operators.layout import shuffle_rows

        rows = [(i, f"doc{i}") for i in range(100)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = [r.doc_id for r in shuffle_rows(df, "doc_id", salt="s1:", partitions=4).collect()]
        expect = [
            i for i in sorted(
                range(100),
                key=lambda i: hashlib.md5(f"s1:{i}".encode()).hexdigest(),
            )
        ]
        assert got == expect
        # rerun-stable
        again = [r.doc_id for r in shuffle_rows(df, "doc_id", salt="s1:", partitions=4).collect()]
        assert again == got
        # a different salt is a different permutation
        other = [r.doc_id for r in shuffle_rows(df, "doc_id", salt="s2:", partitions=4).collect()]
        assert other != got and sorted(other) == sorted(got)


class TestStratifiedSample:
    def test_exact_counts_and_determinism(self, spark):
        import hashlib

        from s3_access_logs_spark.operators.sampling import stratified_sample

        rows = [(i, f"s{i % 3}") for i in range(60)]
        df = spark.createDataFrame(rows, ["doc_id", "source"])
        out = stratified_sample(df, "source", 4, "doc_id", salt="x:")
        got = sorted((r.source, r.doc_id) for r in out.collect())
        assert len(got) == 12
        # per-stratum expectation straight from Python md5
        expect = []
        for s in ["s0", "s1", "s2"]:
            ids = [i for i, src in rows if src == s]
            ids.sort(key=lambda i: (hashlib.md5(f"x:{i}".encode()).hexdigest(), i))
            expect += [(s, i) for i in ids[:4]]
        assert got == sorted(expect)
        # rerun-stable
        again = sorted((r.source, r.doc_id) for r in out.collect())
        assert again == got

    def test_small_stratum_returns_all(self, spark):
        from s3_access_logs_spark.operators.sampling import stratified_sample

        df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], ["id", "g"])
        out = stratified_sample(df, "g", 5, "id")
        assert out.count() == 3


class TestFilterUnpushed:
    def test_same_rows_as_plain_filter(self, spark):
        from pyspark.sql import functions as F

        from s3_access_logs_spark.functions.expr import filter_unpushed

        df = spark.range(100).select(
            "id", (F.col("id") * 3 % 7).alias("derived")
        )
        pred = F.col("derived") > 3
        a = sorted(r.id for r in filter_unpushed(df, pred).collect())
        b = sorted(r.id for r in df.filter(pred).collect())
        assert a == b and len(a) > 0
        assert filter_unpushed(df, pred).columns == df.columns


class TestProductQuantization:
    def _load(self, spark):
        from s3_access_logs_spark.sources.tables import load_table

        return load_table(spark, "/root/testdata/sf0.001", "embeddings")

    def test_codebook_shape_and_determinism(self, spark):
        from s3_access_logs_spark.operators.similarity import (
            train_pq_codebook,
        )

        emb = self._load(spark)
        cb = train_pq_codebook(emb, dims=64, m=8, n_planes=4)
        rows = cb.collect()
        subs = {r.subspace for r in rows}
        assert subs == set(range(8))
        for j in range(8):
            codes = sorted(r.code for r in rows if r.subspace == j)
            assert codes == list(range(len(codes)))  # dense 0..ks-1
            assert 1 <= len(codes) <= 16  # <= 2^n_planes buckets
            for r in rows:
                assert len(r.centroid) == 8  # dims/m
        again = train_pq_codebook(emb, dims=64, m=8, n_planes=4).collect()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    def test_encode_compresses_and_reconstruction_beats_zero(self, spark):
        from s3_access_logs_spark.functions.vectors import l2_distance
        from s3_access_logs_spark.operators.similarity import (
            pq_encode,
            pq_reconstruct,
            train_pq_codebook,
        )

        emb = self._load(spark)
        cb = train_pq_codebook(emb)
        enc = pq_encode(emb, cb)
        first = enc.select("pq_codes").first()[0]
        assert len(first) == 8 and all(c >= 0 for c in first)
        # quantization error must beat the null codebook (predicting 0):
        # mean ||v - reconstruct(v)|| < mean ||v||
        rec = pq_reconstruct(enc, cb)
        err, norm = rec.select(
            F.avg(l2_distance("embedding", "reconstructed")).alias("e"),
            F.avg(
                F.sqrt(
                    F.aggregate(
                        F.transform(
                            "embedding", lambda x: x.cast("double")
                        ),
                        F.lit(0.0),
                        lambda a, x: a + x * x,
                    )
                )
            ).alias("n"),
        ).first()
        assert err < norm

    def test_adc_topk_recall_vs_exact_l2(self, spark):
        from s3_access_logs_spark.functions.vectors import l2_distance
        from s3_access_logs_spark.operators.similarity import (
            pq_encode,
            pq_topk,
            train_pq_codebook,
        )
        from pyspark.sql import Window

        emb = self._load(spark)
        cb = train_pq_codebook(emb)
        enc = pq_encode(emb, cb)
        queries = emb.filter(F.col("vec_id") < 4)
        approx = pq_topk(enc, queries, cb, k=10)
        assert approx.count() == 40  # 10 per query
        # exact L2 top-10 per query
        scored = (
            emb.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("c_vec"),
            )
            .join(
                queries.select(
                    F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("q_vec"),
                ),
                F.col("query_id") != F.col("neighbor_id"),
            )
            .withColumn("d", l2_distance("q_vec", "c_vec"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("d").asc(), F.col("neighbor_id")
        )
        exact = scored.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= 10
        )
        e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
        a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
        recall = len(e & a) / len(e)
        # near-random embeddings are PQ's worst case; still must beat the
        # ~2% hit rate of chance at 10-of-500 by a wide margin
        assert recall >= 0.2

    def test_adc_deterministic(self, spark):
        from s3_access_logs_spark.operators.similarity import (
            pq_encode,
            pq_topk,
            train_pq_codebook,
        )

        emb = self._load(spark)
        cb = train_pq_codebook(emb)
        enc = pq_encode(emb, cb)
        q = emb.filter(F.col("vec_id") < 4)
        assert (
            pq_topk(enc, q, cb, k=5).collect()
            == pq_topk(enc, q, cb, k=5).collect()
        )


class TestTemperatureMixture:
    def _df(self, spark):
        rows = (
            [("web", i) for i in range(300)]
            + [("books", 1000 + i) for i in range(30)]
            + [("code", 2000 + i) for i in range(3)]
        )
        return spark.createDataFrame(rows, ["source", "doc_id"])

    def test_alpha_zero_equalizes_and_caps_small_sources(self, spark):
        from s3_access_logs_spark.operators.sampling import (
            temperature_mixture,
        )

        df = self._df(spark)
        out = temperature_mixture(df, "source", "doc_id", alpha=0.0)
        rates = {
            r.source: r._keep_rate
            for r in out.select("source", "_keep_rate").distinct().collect()
        }
        # equal 111-row budget per source: big source downsampled, small
        # sources capped at keep-everything
        assert rates["books"] == 1.0 and rates["code"] == 1.0
        assert abs(rates["web"] - 111 / 300) < 1e-9
        kept = out.groupBy("source").count().collect()
        by = {r.source: r["count"] for r in kept}
        assert by["books"] == 30 and by["code"] == 3
        assert 60 <= by["web"] <= 160  # hash-rate keep around 111

    def test_alpha_one_is_identity(self, spark):
        from s3_access_logs_spark.operators.sampling import (
            temperature_mixture,
        )

        df = self._df(spark)
        assert temperature_mixture(df, "source", "doc_id", alpha=1.0).count() == 333

    def test_deterministic_and_matches_python_md5(self, spark):
        import hashlib

        from s3_access_logs_spark.operators.sampling import (
            temperature_mixture,
        )

        df = self._df(spark)
        out = temperature_mixture(df, "source", "doc_id", alpha=0.0)
        kept = sorted(r.doc_id for r in out.select("doc_id").collect())
        assert kept == sorted(
            r.doc_id for r in
            temperature_mixture(df, "source", "doc_id", alpha=0.0)
            .select("doc_id").collect()
        )
        # replicate the draw for the downsampled source in plain Python
        rate = 111 / 300
        expect = [
            i
            for i in range(300)
            if int(
                hashlib.md5(f"temp0:{i}".encode()).hexdigest()[:8], 16
            ) / 2**32 < rate
        ] + list(range(1000, 1030)) + list(range(2000, 2003))
        assert kept == sorted(expect)


class TestDropRepeatedParagraphs:
    def test_keeps_first_occurrence_in_order(self, spark):
        from s3_access_logs_spark.operators.dedup import (
            drop_repeated_paragraphs,
        )

        df = spark.createDataFrame(
            [
                (1, "a\n\nb\n\na\n\nc"),
                (2, "x\n\nx\n\nx"),
                (3, "p\n\nq"),
            ],
            ["doc_id", "text"],
        )
        out = {
            r.doc_id: r.text
            for r in drop_repeated_paragraphs(df).collect()
        }
        assert out == {1: "a\n\nb\n\nc", 2: "x", 3: "p\n\nq"}

    def test_fully_narrow_plan(self, spark):
        from s3_access_logs_spark.operators.dedup import (
            drop_repeated_paragraphs,
        )
        from s3_access_logs_spark.sources.tables import load_table

        docs = load_table(
            spark, "/root/testdata/sf0.001", "documents", parallelize=False
        )
        plan = (
            drop_repeated_paragraphs(docs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan  # split/filter/rejoin are in-row


class TestApproxDistinct:
    def test_hll_within_rsd_and_kmv_within_sketch_error(self, spark):
        """HLL++ stays the production distinct-sketch path (engine-internal
        estimate, so the catalog's oracle-checked query uses a
        deterministic KMV instead); pin both estimators' accuracy against
        the exact count on real testdata."""
        from s3_access_logs_spark.plans.catalog import load_all
        from s3_access_logs_spark.sources.tables import load_table

        ev = load_table(spark, "/root/testdata/sf0.001", "events")
        exact = {
            r.event_type: r.n
            for r in ev.groupBy("event_type")
            .agg(F.count_distinct("user_id").alias("n"))
            .collect()
        }
        hll = {
            r.event_type: r.approx
            for r in ev.groupBy("event_type")
            .agg(
                F.approx_count_distinct("user_id", rsd=0.01).alias("approx")
            )
            .collect()
        }
        for et, n in exact.items():
            assert abs(hll[et] - n) / n < 0.05
        kmv = {
            r.event_type: r.approx_users
            for r in load_all()["approx_distinct_users"]
            .builder(spark, "/root/testdata/sf0.001")
            .collect()
        }
        for et, n in exact.items():
            # k=64 KMV: ~1/sqrt(k-2) ≈ 13% rsd; allow 4 sigma
            assert abs(kmv[et] - n) / n < 0.5


class TestDropRepeatedParagraphsEdges:
    def _run(self, spark, texts):
        from s3_access_logs_spark.operators.dedup import (
            drop_repeated_paragraphs,
        )

        df = spark.createDataFrame(
            list(enumerate(texts)), ["doc_id", "text"]
        )
        return [
            r.text
            for r in drop_repeated_paragraphs(df).orderBy("doc_id").collect()
        ]

    def test_empty_and_no_separator_and_unicode(self, spark):
        out = self._run(
            spark,
            ["", "single paragraph no sep", "héllo\n\nwörld\n\nhéllo"],
        )
        assert out == ["", "single paragraph no sep", "héllo\n\nwörld"]

    def test_idempotent(self, spark):
        texts = ["a\n\nb\n\na\n\nc\n\nb", "x\n\nx", "p"]
        once = self._run(spark, texts)
        assert self._run(spark, once) == once


class TestTemperatureMixtureEdges:
    def test_output_is_subset_and_rates_bounded(self, spark):
        from s3_access_logs_spark.operators.sampling import (
            temperature_mixture,
        )

        df = spark.createDataFrame(
            [("a", i) for i in range(50)] + [("b", 100 + i) for i in range(5)],
            ["source", "doc_id"],
        )
        out = temperature_mixture(df, "source", "doc_id", alpha=0.5)
        ids_in = {r.doc_id for r in df.collect()}
        for r in out.collect():
            assert r.doc_id in ids_in
            assert 0.0 < r._keep_rate <= 1.0

    def test_target_rows_shrinks_output(self, spark):
        from s3_access_logs_spark.operators.sampling import (
            temperature_mixture,
        )

        df = spark.createDataFrame(
            [("a", i) for i in range(200)], ["source", "doc_id"]
        )
        out = temperature_mixture(
            df, "source", "doc_id", alpha=1.0, target_rows=50
        )
        n = out.count()
        assert 20 <= n <= 90  # hash-rate keep around 50


class TestKeySkew:
    def _skewed(self, spark):
        rows = [("hot", i) for i in range(900)] + [
            (f"k{j}", j) for j in range(100)
        ]
        return spark.createDataFrame(rows, ["k", "v"])

    def test_stats_find_the_hot_key(self, spark):
        from s3_access_logs_spark.operators.joins import key_skew_stats

        s = key_skew_stats(self._skewed(spark), "k")
        assert s["rows"] == 1000 and s["n_keys"] == 101
        assert s["max_count"] == 900
        assert s["top_keys"][0] == ({"k": "hot"}, 900)
        assert s["skew_ratio"] > 80  # 900 / (1000/101) ≈ 91
        assert s["p50"] == 1

    def test_suggest_salt_scales_with_hot_key(self, spark):
        from s3_access_logs_spark.operators.joins import suggest_salt

        df = self._skewed(spark)
        assert suggest_salt(df, "k", target_rows_per_task=100) == 9
        assert suggest_salt(df, "k", target_rows_per_task=10**6) == 1
        assert suggest_salt(df, "k", target_rows_per_task=1, max_salt=64) == 64

    def test_composes_with_salted_join(self, spark):
        from s3_access_logs_spark.operators.joins import (
            salted_join,
            suggest_salt,
        )

        left = self._skewed(spark)
        right = spark.createDataFrame(
            [("hot", "H")] + [(f"k{j}", f"V{j}") for j in range(100)],
            ["k", "lbl"],
        )
        n = suggest_salt(left, "k", target_rows_per_task=100)
        out = salted_join(left, right, "k", salt=n)
        assert out.count() == 1000  # every left row matched exactly once


class TestKmvSketch:
    def test_exact_below_k_distinct(self, spark):
        """KMV falls back to the exact distinct count when a group holds
        fewer than k distinct hashes — the sketch IS the set."""
        from s3_access_logs_spark.plans.catalog import load_all
        import tempfile, os

        with tempfile.TemporaryDirectory() as d:
            rows = [(i, "click", i % 30) for i in range(500)] + [
                (1000 + i, "view", i % 7) for i in range(100)
            ]
            spark.createDataFrame(
                rows, ["event_id", "event_type", "user_id"]
            ).write.parquet(os.path.join(d, "events.parquet"))
            out = {
                r.event_type: r.approx_users
                for r in load_all()["approx_distinct_users"]
                .builder(spark, d)
                .collect()
            }
        assert out == {"click": 30.0, "view": 7.0}


class TestCountMin:
    """Count-min sketch (functions/cms.py): mergeable bounded-memory
    frequency estimation, overestimate-only."""

    def test_never_underestimates_and_is_exact_without_collisions(
        self, spark
    ):
        from s3_access_logs_spark.functions.cms import cms_build, cms_estimate

        # zipf-ish: key i appears (50 - i) times
        rows = [(f"k{i}",) for i in range(50) for _ in range(50 - i)]
        df = spark.createDataFrame(rows, "k string")
        sk = cms_build(df, "k", width=1 << 12, depth=5)
        keys = spark.createDataFrame([(f"k{i}", 50 - i) for i in range(50)],
                                     "k string, true_cnt bigint")
        est = cms_estimate(keys, "k", sk)
        for r in est.collect():
            assert r.est_count >= r.true_cnt  # CMS never underestimates
        # 50 keys in 4096 columns x 5 rows: collisions essentially never
        # survive the min, so estimates are exact here
        assert est.filter(F.col("est_count") != F.col("true_cnt")).count() == 0

    def test_additive_error_within_bound_under_pressure(self, spark):
        from s3_access_logs_spark.functions.cms import (
            cms_build,
            cms_error_bound,
            cms_estimate,
        )

        n_keys, width, depth = 2000, 1 << 8, 5  # heavy collision pressure
        df = spark.createDataFrame([(f"k{i}",) for i in range(n_keys)], "k string")
        sk = cms_build(df, "k", width=width, depth=depth)
        eps, delta = cms_error_bound(n_keys, width, depth)
        est = cms_estimate(df.distinct(), "k", sk)
        over = est.filter(F.col("est_count") > 1 + eps).count()
        assert over <= max(1, 2 * delta * n_keys)

    def test_merge_is_linear_and_rejects_mismatch(self, spark):
        import pytest

        from s3_access_logs_spark.functions.cms import (
            cms_build,
            cms_estimate,
            cms_merge,
        )

        a = spark.createDataFrame([("x",), ("x",), ("y",)], "k string")
        b = spark.createDataFrame([("x",), ("z",)], "k string")
        sa = cms_build(a, "k", width=1 << 10, depth=4)
        sb = cms_build(b, "k", width=1 << 10, depth=4)
        both = cms_build(a.unionByName(b), "k", width=1 << 10, depth=4)
        merged = cms_merge(sa, sb)
        keys = spark.createDataFrame([("x",), ("y",), ("z",)], "k string")
        got = {
            r.k: r.est_count for r in cms_estimate(keys, "k", merged).collect()
        }
        want = {
            r.k: r.est_count for r in cms_estimate(keys, "k", both).collect()
        }
        assert got == want == {"x": 3, "y": 1, "z": 1}
        with pytest.raises(ValueError, match="disagree"):
            cms_merge(sa, cms_build(b, "k", width=1 << 11, depth=4))

    def test_weighted_counts_and_nulls(self, spark):
        from s3_access_logs_spark.functions.cms import cms_build, cms_estimate

        df = spark.createDataFrame(
            [("a", 10), ("a", 5), ("b", 2), (None, 99)],
            "k string, w bigint",
        )
        sk = cms_build(df, "k", width=1 << 10, depth=4, weight_col="w")
        keys = spark.createDataFrame([("a",), ("b",), (None,)], "k string")
        got = {r.k: r.est_count for r in cms_estimate(keys, "k", sk).collect()}
        assert got["a"] == 15 and got["b"] == 2
        assert got[None] is None  # NULL estimates NULL, and NULLs not counted

    def test_probe_is_udf_free(self, spark):
        from s3_access_logs_spark.functions.cms import cms_build, cms_estimate

        df = spark.createDataFrame([("a",)], "k string")
        est = cms_estimate(df, "k", cms_build(df, "k", width=64, depth=3))
        plan = est._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestWinnowing:
    """Winnowing fingerprints + verbatim-span detection (SIGMOD'03 MOSS
    guarantee: any shared substring of length >= window + k - 1 is
    caught)."""

    K, W = 8, 17  # guarantee t = 24 chars for fast tests

    @staticmethod
    def _mk(spark, rows):
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    def _spans(self, df, **kw):
        from s3_access_logs_spark.operators.dedup import duplicate_spans

        return duplicate_spans(df, k=self.K, window=self.W, **kw)

    def test_copied_paragraph_detected_with_positions(self, spark):
        shared = (
            "the quick brown fox jumps over the lazy dog while the "
            "cat watches from the warm windowsill in the afternoon sun"
        )  # 112 chars, well past t=24
        a = "AAAA unique lead-in text. " + shared + " AAAA trailing."
        b = "totally different document opening here -- " + shared
        df = self._mk(spark, [(1, a), (2, b), (3, "unrelated text body")])
        rows = self._spans(df).collect()
        assert len(rows) == 1
        (r,) = rows
        assert (r.id_a, r.id_b) == (1, 2)
        # the reported span must actually BE the shared text region
        assert r.span_len >= len(shared) - 2 * (self.W + self.K)
        assert a[r.start_a : r.start_a + r.span_len] == \
            b[r.start_b : r.start_b + r.span_len]

    def test_no_spans_between_distinct_texts(self, spark):
        df = self._mk(spark, [
            (1, "completely original sentence number one about rivers"),
            (2, "an entirely different musing on mountain weather here"),
        ])
        assert self._spans(df).count() == 0

    def test_guarantee_boundary(self, spark):
        # a shared substring of exactly t chars must be detected
        t = self.W + self.K - 1
        shared = "Zq3vLm8xRw5tYp2sNd7kQa9u"[:t]
        assert len(shared) == t
        df = self._mk(spark, [
            (1, "prefix_one_" + shared + "_suffix_one"),
            (2, "other_lead_" + shared + "_other_tail"),
        ])
        rows = self._spans(df, min_span_len=self.K).collect()
        assert any(r.id_a == 1 and r.id_b == 2 for r in rows)

    def test_two_separate_copies_give_two_spans(self, spark):
        s1 = "first shared passage with plenty of characters in it ok"
        s2 = "second borrowed fragment also long enough to be caught!!"
        df = self._mk(spark, [
            (1, s1 + " ### middle filler junk text here ### " + s2),
            (2, s2 + " --- unrelated middle part of doc 2 --- " + s1),
        ])
        rows = self._spans(df).collect()
        assert len(rows) == 2  # distinct diagonals -> distinct spans

    def test_hot_gram_cap_drops_boilerplate(self, spark):
        header = "SPDX-License-Identifier: Apache-2.0 standard header"
        docs = [(i, header + f" body variant {i}") for i in range(20)]
        capped = self._spans(self._mk(spark, docs), max_gram_freq=10)
        assert capped.count() == 0  # boilerplate suppressed, not 190 pairs
        uncapped = self._spans(self._mk(spark, docs), max_gram_freq=None)
        assert uncapped.count() == 190  # every ordered pair, for contrast

    def test_fingerprints_are_zero_shuffle_and_sparse(self, spark):
        from s3_access_logs_spark.operators.dedup import winnow_fingerprints

        text = "x" * 50 + "abcdefghijklmnopqrstuvwxyz" * 40
        df = self._mk(spark, [(1, text)])
        fps = winnow_fingerprints(df, k=self.K, window=self.W)
        plan = fps._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # pure projection
        n = fps.count()
        # density ~ 2/(w+1): sparse, not every position
        assert 0 < n < 2 * len(text) * 3 // (self.W + 1)
        # every emitted gram matches the text at its position
        for r in fps.collect():
            assert text[r.pos : r.pos + self.K] == r.gram

    def test_short_and_null_docs_are_safe(self, spark):
        from s3_access_logs_spark.operators.dedup import winnow_fingerprints

        df = self._mk(spark, [
            (1, None), (2, ""), (3, "tiny"), (4, "exactly8"),
        ])
        fps = winnow_fingerprints(df, k=self.K, window=self.W)
        rows = fps.collect()
        assert {r.id for r in rows} == {4}  # only the k-length doc emits
        assert rows[0].gram == "exactly8" and rows[0].pos == 0

    def test_gram_count_cap_is_an_explicit_filter(self, spark):
        """Position packing caps documents at 2^24 grams; past it the
        packed-key arithmetic overflows BIGINT — Spark would wrap
        silently while DuckDB raises, so the cap is an explicit
        contract: over-cap documents are filtered OUT of
        fingerprinting, never fingerprinted wrongly (ADVICE r7). The
        filter sits before the hash projection, so the oversized text
        is never hashed."""
        from s3_access_logs_spark.operators.dedup import winnow_fingerprints

        k = self.K
        over = "a" * ((1 << 24) + k)  # (1<<24) + 1 grams: past the cap
        df = self._mk(spark, [(1, "exactly8"), (2, over)])
        fps = winnow_fingerprints(df, k=k, window=self.W)
        assert {r.id for r in fps.collect()} == {1}

    def test_periodic_text_and_packed_selection_contract(self, spark):
        """Round-7 packed selection keys: the degenerate inputs the
        packing's tie-break touches. Periodic text makes EVERY window's
        hashes equal — leftmost-min must pick each window's first
        position (selection = every position up to the last window
        start), and a verbatim copy of a periodic region must still be
        detected; the emitted grams must match the text at the decoded
        positions (the low-24-bit decode)."""
        from s3_access_logs_spark.operators.dedup import (
            duplicate_spans,
            winnow_fingerprints,
        )

        flat = "a" * 400  # every k-gram IS the same gram: all hashes tie
        df = self._mk(spark, [(1, flat)])
        flat_fps = winnow_fingerprints(df, k=self.K, window=self.W).collect()
        # all-equal hashes in every window -> leftmost wins -> the
        # selected positions are exactly the window starts (0-based)
        n_grams = len(flat) - self.K + 1
        assert {r.pos for r in flat_fps} == set(
            range(0, max(n_grams - self.W, 0) + 1)
        )
        period = "ab" * 200  # two alternating gram hashes
        df = self._mk(spark, [(1, period)])
        fps = winnow_fingerprints(df, k=self.K, window=self.W).collect()
        assert fps, "periodic text must still fingerprint"
        for r in fps:
            assert period[r.pos : r.pos + self.K] == r.gram
        # the smaller of the two hashes lives on one parity; each window
        # selects its leftmost position of that parity
        parities = {r.pos % 2 for r in fps}
        assert len(parities) == 1
        # a copy of the periodic region across documents is detected
        spans = duplicate_spans(
            self._mk(spark, [(1, period), (2, "Z" * 60 + period)]),
            k=self.K,
            window=self.W,
        ).collect()
        assert any(
            {r.id_a, r.id_b} == {1, 2}
            and r.span_len >= self.W + self.K - 1
            for r in spans
        )

    def test_unicode_text_matches_oracle(self, spark, tmp_path):
        """Cross-engine winnowing on multi-script text: the md5 portable
        selection, substr gram extraction and length arithmetic must
        agree code-point-for-code-point between Spark (UTF8String) and
        DuckDB on CJK, Cyrillic, Greek, combining accents and astral
        emoji — a byte-vs-codepoint slip in either engine's
        substr/length would shift every position and hash. Verified
        value-exact, including detection of a 330-char multi-script
        verbatim region."""
        import duckdb

        from s3_access_logs_spark.operators.dedup import duplicate_spans
        from s3_access_logs_spark.plans.curation_queries import (
            _duplicate_spans_sql,
        )

        core = (
            "víctor 中文テキスト🎉 déjà-vu naïve café œuvre 🚀🌟 "
            "ελληνικά русский ТЕКСТ "
        )
        shared = (core * 6)[:330]
        rows = [
            (1, "prefix-один язык " + shared + " suffix-eins"),
            (2, "totally different start 完全に別の内容 " + shared + " end"),
            (3, "unrelated 内容 τρίτο документ with no shared span here"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = sorted(
            map(tuple, duplicate_spans(docs, portable_hash=True).collect())
        )
        assert got and all(
            {r[0], r[1]} == {1, 2} for r in got
        ), "the multi-script verbatim region must be detected"
        docs.write.parquet(f"{tmp_path}/documents.parquet")
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
        )
        # the catalog oracle minus its synthesized-copy input CTE: the
        # raw table stands in, the whole winnow/pair/island replay stays
        sql = _duplicate_spans_sql()
        start = sql.index("WITH inp AS (")
        end = sql.index("),", start)
        sql = (
            sql[:start]
            + "WITH inp AS (SELECT doc_id, text FROM documents"
            + sql[end:]
        )
        want = sorted(tuple(r) for r in con.execute(sql).fetchall())
        assert got == want

    def test_guarantee_property_random_plants(self, spark):
        # property sweep without hypothesis-per-Spark-job overhead: many
        # random plantings checked in ONE job. Any shared substring of
        # length >= t must be detected regardless of content/position.
        import random

        from s3_access_logs_spark.operators.dedup import duplicate_spans

        rng = random.Random(42)
        alpha = "abcdefghijklmnopqrstuvwxyz 0123456789"
        t = self.W + self.K - 1
        rows, expected = [], set()
        for case in range(25):
            shared_len = rng.randint(t, t + 60)
            shared = "".join(rng.choice(alpha) for _ in range(shared_len))
            pad = lambda n: "".join(  # noqa: E731
                rng.choice(alpha) for _ in range(n)
            )
            a_id, b_id = 1000 + case * 2, 1001 + case * 2
            rows.append((a_id, pad(rng.randint(0, 40)) + shared + pad(rng.randint(0, 40))))
            rows.append((b_id, pad(rng.randint(0, 40)) + shared + pad(rng.randint(0, 40))))
            expected.add((a_id, b_id))
        df = self._mk(spark, rows)
        got = {
            (r.id_a, r.id_b)
            for r in self._spans(df, min_span_len=self.K).collect()
        }
        # every planted pair found (random filler may add a few extra
        # coincidental short matches between pad regions — allowed)
        assert expected <= got

    def test_cut_duplicate_spans_removes_later_copy(self, spark):
        from s3_access_logs_spark.operators.dedup import cut_duplicate_spans

        shared = (
            "the quick brown fox jumps over the lazy dog while the "
            "cat watches from the warm windowsill in the afternoon sun"
        )
        a = "AAAA unique lead-in text. " + shared + " AAAA trailing."
        b_head, b_tail = "totally different document opening here -- ", "!!"
        df = self._mk(spark, [
            (1, a), (2, b_head + shared + b_tail), (3, "unrelated body"),
        ])
        spans = self._spans(df)
        out = {r.doc_id: r.text for r in cut_duplicate_spans(df, spans).collect()}
        # lower id keeps the canonical copy, untouched bystander untouched
        assert out[1] == a
        assert out[3] == "unrelated body"
        # higher id loses the detected span but keeps its own head/tail
        assert shared not in out[2]
        assert out[2].startswith(b_head[: len(b_head) - self.W - self.K])
        assert out[2].endswith(b_tail)
        assert len(out[2]) < len(b_head + shared + b_tail) - 50

    def test_cut_merges_overlapping_intervals(self, spark):
        from s3_access_logs_spark.operators.dedup import cut_duplicate_spans

        # hand-built overlapping + disjoint spans against one doc
        text = "0123456789" * 6  # 60 chars
        df = self._mk(spark, [(7, text)])
        spans = spark.createDataFrame(
            [
                (1, 7, 0, 10, 20, 3),   # cut [10, 30)
                (1, 7, 0, 25, 10, 2),   # overlaps -> merged to [10, 35)
                (1, 7, 0, 50, 5, 1),    # disjoint  [50, 55)
            ],
            "id_a bigint, id_b bigint, start_a bigint, start_b bigint, "
            "span_len bigint, n_grams bigint",
        )
        (r,) = cut_duplicate_spans(df, spans).collect()
        assert r.text == text[:10] + text[35:50] + text[55:]


class TestBloomFilter:
    """DataFrame-native Bloom filter (functions/bloom.py): persistent,
    mergeable, UDF-free — the store pre-filter for incremental dedup."""

    def test_no_false_negatives_and_low_fp(self, spark):
        from s3_access_logs_spark.functions.bloom import (
            bloom_build,
            bloom_fp_rate,
            bloom_probe,
        )

        inserted = spark.range(0, 2000).select(
            F.concat(F.lit("key-"), F.col("id")).alias("k")
        )
        bloom = bloom_build(inserted, "k", num_bits=1 << 16, num_hashes=5)
        # every inserted key must flag maybe (no false negatives)
        hits = bloom_probe(inserted, "k", bloom, "m")
        assert hits.filter(~F.col("m")).count() == 0
        # disjoint keys: measured fp stays near the analytic rate
        fresh = spark.range(10_000, 14_000).select(
            F.concat(F.lit("key-"), F.col("id")).alias("k")
        )
        fp = bloom_probe(fresh, "k", bloom, "m").filter(F.col("m")).count()
        expect = bloom_fp_rate(2000, 1 << 16, 5)
        assert fp / 4000 < max(4 * expect, 0.02)

    def test_probe_is_udf_free_and_null_safe(self, spark):
        from s3_access_logs_spark.functions.bloom import (
            bloom_build,
            bloom_probe,
        )

        df = spark.createDataFrame([("a",), ("b",), (None,)], "k string")
        bloom = bloom_build(df, "k", num_bits=1 << 10, num_hashes=3)
        probed = bloom_probe(df, "k", bloom, "m")
        plan = probed._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        rows = {r.k: r.m for r in probed.collect()}
        assert rows["a"] is True and rows["b"] is True
        assert rows[None] is None  # NULL probes stay NULL, not False

    def test_merge_unions_sets_and_rejects_mismatched_params(self, spark):
        import pytest

        from s3_access_logs_spark.functions.bloom import (
            bloom_build,
            bloom_merge,
            bloom_probe,
        )

        a = spark.createDataFrame([("a1",), ("a2",)], "k string")
        b = spark.createDataFrame([("b1",), ("b2",)], "k string")
        fa = bloom_build(a, "k", num_bits=1 << 12, num_hashes=4)
        fb = bloom_build(b, "k", num_bits=1 << 12, num_hashes=4)
        merged = bloom_merge(fa, fb)
        both = a.unionByName(b)
        assert (
            bloom_probe(both, "k", merged, "m").filter(~F.col("m")).count()
            == 0
        )
        wrong = bloom_build(b, "k", num_bits=1 << 13, num_hashes=4)
        with pytest.raises(ValueError, match="disagree"):
            bloom_merge(fa, wrong)

    def test_probe_requires_meta_rows(self, spark):
        import pytest

        from s3_access_logs_spark.functions.bloom import (
            bloom_build,
            bloom_probe,
        )

        df = spark.createDataFrame([("a",)], "k string")
        bloom = bloom_build(df, "k", num_bits=1 << 10)
        stripped = bloom.filter(F.col("word") >= 0)
        with pytest.raises(ValueError, match="meta rows"):
            bloom_probe(df, "k", stripped, "m")

    def test_incremental_bloom_equals_plain(self, spark):
        from s3_access_logs_spark.functions.bloom import bloom_build
        from s3_access_logs_spark.operators.dedup import (
            dedup_incremental,
            dedup_incremental_bloom,
            normalized_digest,
        )

        store_docs = spark.createDataFrame(
            [(i, f"seen doc {i % 50}") for i in range(100)],
            "doc_id bigint, text string",
        )
        store = store_docs.select(
            normalized_digest(F.col("text")).alias("digest")
        ).distinct()
        bloom = bloom_build(store, "digest", num_bits=1 << 14)
        batch = spark.createDataFrame(
            # 10 dup texts (in store), 40 new, plus an intra-batch dup
            [(1000 + i, f"seen doc {i}") for i in range(10)]
            + [(2000 + i, f"new doc {i}") for i in range(40)]
            + [(3000, "new doc 0")],
            "doc_id bigint, text string",
        )
        plain = dedup_incremental(batch, store)
        fast = dedup_incremental_bloom(batch, store, bloom)
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, fast.collect())
        )
        assert fast.count() == 40  # dups dropped, intra-batch folded
        # the store side must never shuffle: both store joins are
        # broadcast (scan-and-probe), no sort-merge join anywhere
        plan = fast._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan
        assert plan.count("BroadcastHashJoin") >= 2

    def test_null_text_parity_with_plain(self, spark):
        # NULL-text docs are EXCLUDED by both paths (they are not
        # duplicates of each other — collapsing them to min-id was
        # silent data loss); bit-for-bit parity must hold on the rest
        from s3_access_logs_spark.functions.bloom import bloom_build
        from s3_access_logs_spark.operators.dedup import (
            dedup_incremental,
            dedup_incremental_bloom,
        )

        store = spark.createDataFrame([("d1",)], "digest string")
        bloom = bloom_build(store, "digest", num_bits=1 << 10)
        batch = spark.createDataFrame(
            [(1, None), (2, "real text")], "doc_id bigint, text string"
        )
        plain = sorted(
            map(tuple, dedup_incremental(batch, store).collect()),
            key=lambda t: (t[0] or "", t[1]),
        )
        fast = sorted(
            map(tuple, dedup_incremental_bloom(batch, store, bloom).collect()),
            key=lambda t: (t[0] or "", t[1]),
        )
        assert plain == fast
        assert [kid for _, kid in fast] == [2]  # NULL row excluded

    def test_sizing_helper_round_trips(self, spark):
        from s3_access_logs_spark.functions.bloom import (
            bloom_fp_rate,
            bloom_size_for,
        )

        m, k = bloom_size_for(1_000_000, 0.01)
        assert m % 64 == 0
        assert bloom_fp_rate(1_000_000, m, k) < 0.011


class TestNearDupIncremental:
    def test_cross_batch_near_dup_detected(self, spark):
        from s3_access_logs_spark.operators.dedup import (
            near_dup_incremental,
        )

        base = "the quick brown fox jumps over the lazy dog again and again"
        batch1 = _docs(spark, [(1, base), (2, "totally different words here now ok fine yes sure")])
        empty = spark.createDataFrame(
            [], "id long, band_idx int, band_key string"
        )
        hits1, bands1 = near_dup_incremental(batch1, empty)
        assert hits1.count() == 0  # empty store, nothing to collide with
        # batch 2: one near-copy of doc 1, one unrelated doc
        batch2 = _docs(
            spark,
            [
                (10, base),  # exact near-dup of seen doc 1
                (11, "unrelated fresh content that matches nothing at all"),
            ],
        )
        hits2, bands2 = near_dup_incremental(batch2, bands1)
        got = {(r.new_id, r.seen_id) for r in hits2.collect()}
        assert got == {(10, 1)}
        # store append keeps working: a third batch collides with batch 2
        store = bands1.unionByName(bands2)
        batch3 = _docs(spark, [(20, base)])
        hits3, _ = near_dup_incremental(batch3, store)
        assert {(r.new_id, r.seen_id) for r in hits3.collect()} == {
            (20, 1),
            (20, 10),
        }

    def test_replay_idempotent(self, spark):
        from s3_access_logs_spark.operators.dedup import (
            near_dup_incremental,
        )

        batch = _docs(spark, [(1, "alpha beta gamma delta epsilon zeta")])
        empty = spark.createDataFrame(
            [], "id long, band_idx int, band_key string"
        )
        _, b1 = near_dup_incremental(batch, empty)
        _, b2 = near_dup_incremental(batch, empty)
        assert sorted(map(tuple, b1.collect())) == sorted(
            map(tuple, b2.collect())
        )


class TestSentiment:
    def test_valence_sign_and_null_on_no_hits(self, spark):
        from s3_access_logs_spark.functions.text import sentiment_score

        df = spark.createDataFrame(
            [
                (1, "this release is great and works perfect, love it"),
                (2, "terrible update, broken and slow, crashes always"),
                (3, "the quarterly report covers fiscal obligations"),
                (4, "good but slow"),
            ],
            ["doc_id", "text"],
        )
        out = {
            r.doc_id: r.s
            for r in df.select(
                "doc_id", sentiment_score("text").alias("s")
            ).collect()
        }
        assert out[1] > 2  # (3+1+5+4)/4
        assert out[2] < -2
        assert out[3] is None  # no lexicon hits ≠ neutral
        assert abs(out[4] - 1.0) < 1e-9  # (3 + -1)/2
    def test_custom_lexicon_and_narrow_plan(self, spark):
        from s3_access_logs_spark.functions.text import sentiment_score

        df = spark.createDataFrame([(1, "foo bar baz")], ["doc_id", "text"])
        q = df.select(
            sentiment_score("text", {"foo": 5, "bar": -1}).alias("s")
        )
        assert abs(q.first()["s"] - 2.0) < 1e-9
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Join" not in plan


class TestIvfPq:
    def test_build_probe_prunes_and_recalls(self, spark, tmp_path):
        from s3_access_logs_spark.functions.vectors import l2_distance
        from s3_access_logs_spark.operators.similarity import (
            build_ivfpq_index,
            probe_ivfpq_index,
        )
        from s3_access_logs_spark.sources.tables import load_table
        from pyspark.sql import Window

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        queries = emb.filter(F.col("vec_id") < 4)
        dst = str(tmp_path / "ivfpq")
        cents, cb = build_ivfpq_index(emb, dst)
        # index stores codes, not vectors: m bytes of codes per row
        stored = spark.read.parquet(dst)
        assert set(stored.columns) == {"neighbor_id", "pq_codes", "cluster"}
        assert len(stored.select("pq_codes").first()[0]) == 8

        probed = probe_ivfpq_index(
            spark, dst, queries, cents, cb, k=10, nprobe=4
        )
        plan = probed._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan and "cluster" in plan
        rows = probed.collect()
        assert len(rows) == 40  # 10 per query
        again = probe_ivfpq_index(
            spark, dst, queries, cents, cb, k=10, nprobe=4
        ).collect()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

        # recall vs exact L2 over the whole corpus: IVF restricts the
        # candidate set AND PQ approximates the metric — on near-random
        # vectors (worst case for both) demand clear daylight over the
        # ~2% chance rate
        scored = (
            emb.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("c_vec"),
            )
            .join(
                queries.select(
                    F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("q_vec"),
                ),
                F.col("query_id") != F.col("neighbor_id"),
            )
            .withColumn("d", l2_distance("q_vec", "c_vec"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("d").asc(), F.col("neighbor_id")
        )
        exact = {
            (r.query_id, r.neighbor_id)
            for r in scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 10)
            .collect()
        }
        approx = {(r.query_id, r.neighbor_id) for r in rows}
        assert len(exact & approx) / len(exact) >= 0.15

    def test_meta_sidecar_rejects_mismatched_flags(self, spark, tmp_path):
        """The index's encode contract (residual/dims/m) is persisted as
        a store-root sidecar at build time; a probe or append whose
        flags disagree must fail loudly instead of returning garbage
        distances (ADVICE r7)."""
        from s3_access_logs_spark.operators.similarity import (
            IVFPQ_META_SIDECAR,
            append_to_ivfpq_index,
            build_ivfpq_index,
            probe_ivfpq_index,
        )
        from s3_access_logs_spark.sources.fsutil import read_json_sidecar
        from s3_access_logs_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        queries = emb.filter(F.col("vec_id") < 2)
        dst = str(tmp_path / "ivfpq_res")
        cents, cb = build_ivfpq_index(emb, dst, residual=True)
        assert read_json_sidecar(spark, dst, IVFPQ_META_SIDECAR) == {
            "dims": 64, "m": 8, "residual": True,
        }
        # matching flags: works
        ok = probe_ivfpq_index(
            spark, dst, queries, cents, cb, k=3, nprobe=2, residual=True
        )
        assert ok.count() > 0
        # mismatched residual flag: loud failure, not garbage
        with pytest.raises(ValueError, match="encode contract"):
            probe_ivfpq_index(
                spark, dst, queries, cents, cb, k=3, nprobe=2,
                residual=False,
            )
        with pytest.raises(ValueError, match="encode contract"):
            append_to_ivfpq_index(
                spark, queries, dst, cents, cb, residual=False
            )
        # mismatched dims/m: also rejected
        with pytest.raises(ValueError, match="encode contract"):
            probe_ivfpq_index(
                spark, dst, queries, cents, cb, k=3, nprobe=2,
                dims=32, m=4, residual=True,
            )

    def test_missing_sidecar_fails_loud_until_explicit_stamp(
        self, spark, tmp_path
    ):
        """An index with no sidecar (pre-sidecar build, or a build that
        crashed between its data write and the stamp) must FAIL LOUDLY
        on probe and append — silently trusting caller flags is the
        garbage-distance footgun the sidecar closes, and an implicit
        adoption would let one wrong caller permanently self-certify
        the wrong contract (review r8). Recovery is one explicit
        stamp_ivfpq_meta call with the known build-time flags."""
        from s3_access_logs_spark.operators.similarity import (
            IVFPQ_META_SIDECAR,
            append_to_ivfpq_index,
            build_ivfpq_index,
            probe_ivfpq_index,
            stamp_ivfpq_meta,
        )
        from s3_access_logs_spark.sources.fsutil import (
            hadoop_fs,
            read_json_sidecar,
        )
        from s3_access_logs_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        queries = emb.filter(F.col("vec_id") < 2)
        dst = str(tmp_path / "ivfpq_legacy")
        cents, cb = build_ivfpq_index(
            emb.filter(F.col("vec_id") >= 10), dst
        )
        # simulate the crash window / pre-sidecar index
        fs, _ = hadoop_fs(spark, dst)
        fs.delete(
            spark._jvm.org.apache.hadoop.fs.Path(
                f"{dst}/{IVFPQ_META_SIDECAR}"
            ),
            False,
        )
        assert read_json_sidecar(spark, dst, IVFPQ_META_SIDECAR) is None
        with pytest.raises(ValueError, match="stamp_ivfpq_meta"):
            probe_ivfpq_index(spark, dst, queries, cents, cb, k=3)
        with pytest.raises(ValueError, match="stamp_ivfpq_meta"):
            append_to_ivfpq_index(
                spark, emb.filter(F.col("vec_id") < 10), dst, cents, cb
            )
        # an empty append must not dodge the check either (it would
        # have been the implicit-adoption hole)
        with pytest.raises(ValueError, match="stamp_ivfpq_meta"):
            append_to_ivfpq_index(
                spark, emb.filter(F.col("vec_id") < 0), dst, cents, cb
            )
        stamp_ivfpq_meta(spark, dst, dims=64, m=8, residual=False)
        append_to_ivfpq_index(
            spark, emb.filter(F.col("vec_id") < 10), dst, cents, cb
        )
        assert probe_ivfpq_index(
            spark, dst, queries, cents, cb, k=3
        ).count() > 0

    def test_corrupt_sidecar_raises_recoverable_error(self, spark, tmp_path):
        """ADVICE r8: a truncated/garbage sidecar (pre-rename-era crash
        or out-of-band damage) must surface as the documented
        recoverable ValueError naming stamp_ivfpq_meta — not an opaque
        JSONDecodeError — and the writer now goes through temp+rename
        so a fresh stamp heals it."""
        from s3_access_logs_spark.sources.fsutil import (
            read_json_sidecar,
            write_json_sidecar,
        )

        dst = str(tmp_path / "store")
        (tmp_path / "store").mkdir()
        (tmp_path / "store" / "_meta.json").write_text('{"dims": 64, "m"')
        with pytest.raises(ValueError, match="stamp_ivfpq_meta"):
            read_json_sidecar(spark, dst, "_meta.json")
        # re-stamping over the corrupt file recovers (temp+rename write)
        write_json_sidecar(spark, dst, "_meta.json", {"dims": 64})
        assert read_json_sidecar(spark, dst, "_meta.json") == {"dims": 64}
        assert not (tmp_path / "store" / "._meta.json.tmp").exists()


class TestReviewFixes:
    def test_pq_null_vector_skipped_not_crashing(self, spark):
        from s3_access_logs_spark.operators.similarity import (
            pq_encode,
            pq_topk,
            train_pq_codebook,
        )
        from s3_access_logs_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        cb = train_pq_codebook(emb)
        broken = spark.createDataFrame(
            [(9999, None)], "vec_id long, embedding array<float>"
        )
        enc = pq_encode(
            emb.unionByName(broken, allowMissingColumns=True), cb
        )
        assert (
            enc.filter(F.col("vec_id") == 9999).first()["pq_codes"] is None
        )
        out = pq_topk(enc, emb.filter(F.col("vec_id") < 2), cb, k=5)
        rows = out.collect()  # must not raise element_at(lut, 0)
        assert len(rows) == 10
        assert all(r.neighbor_id != 9999 for r in rows)

    def test_pq_training_excludes_malformed_vectors(self, spark):
        """Review r6: a NULL or short vector in the TRAINING corpus must
        not perturb the codebook — un-filtered, a short vector's
        padded-NULL dots bucketed it to 0 (polluting that centroid) and a
        NULL bucket densified to code 0, shifting every real code. The
        codebook over a dirtied corpus must equal the clean one, and the
        dirty rows must come back NULL-coded."""
        from s3_access_logs_spark.operators.similarity import (
            pq_encode,
            train_pq_codebook,
        )
        from s3_access_logs_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        dirty = emb.unionByName(
            spark.createDataFrame(
                [(9998, None), (9999, [1.0, 2.0, 3.0])],
                "vec_id long, embedding array<float>",
            ),
            allowMissingColumns=True,
        )
        clean_cb = sorted(
            map(tuple, train_pq_codebook(emb).collect())
        )
        dirty_cb = sorted(
            map(tuple, train_pq_codebook(dirty).collect())
        )
        assert clean_cb == dirty_cb
        enc = pq_encode(dirty, train_pq_codebook(dirty))
        bad = enc.filter(F.col("vec_id") >= 9998).collect()
        assert len(bad) == 2
        assert all(r["pq_codes"] is None for r in bad)

    def test_pq_malformed_query_yields_no_rows(self, spark):
        """Review r6 pass 3: a NULL/short QUERY vector must vanish from
        the result (the oracle's filtered `e` CTE feeds queries too) —
        un-filtered, its all-NULL LUT produced k NULL-adist rows under
        the NULLS-FIRST window. Both the ADC and refine paths."""
        from s3_access_logs_spark.operators.similarity import (
            pq_encode,
            pq_topk,
            train_pq_codebook,
        )
        from s3_access_logs_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        cb = train_pq_codebook(emb)
        enc = pq_encode(emb, cb)
        queries = emb.filter(F.col("vec_id") < 2).unionByName(
            spark.createDataFrame(
                [(7777, None), (7778, [1.0, 2.0])],
                "vec_id long, embedding array<float>",
            ),
            allowMissingColumns=True,
        )
        adc = pq_topk(enc, queries, cb, k=5).collect()
        assert {r.query_id for r in adc} == {0, 1} and len(adc) == 10
        assert all(r.adist is not None for r in adc)
        ref = pq_topk(enc, queries, cb, k=5, refine_corpus=emb).collect()
        assert {r.query_id for r in ref} == {0, 1} and len(ref) == 10
        assert all(r.dist is not None for r in ref)

    def test_kmeans_entry_matches_oracle_on_dirty_corpus(self, spark, tmp_path):
        """Review r6 pass 5: the kmeans_assignments entry must stay
        value-exact vs its DuckDB oracle on a corpus holding NULL, short
        AND over-length vectors — the dirty classes that previously
        crashed the fit (NULL seed), leaked leading dims (short), or
        tripped the ragged check (over-length)."""
        import duckdb

        from s3_access_logs_spark.plans.catalog import load_all

        rows = [
            (i, [float((i * 7 + j * 3) % 11) for j in range(64)])
            for i in range(20)
        ]
        rows += [
            (100, None),
            (101, [1.0, 2.0]),
            (102, [0.5] * 70),
            (103, [1.0] * 30 + [None] + [1.0] * 33),  # interior NULL:
            # crashes DuckDB list_dot_product if not filtered out
            # non-finite components (review r6 pass 7): an inf dim
            # makes every later cosine vs its cluster's centroid NaN,
            # which DuckDB ranks FIRST under DESC and Spark ranks last
            # — assignments would diverge wholesale if not filtered
            (104, [1.0] * 20 + [float("inf")] + [1.0] * 43),
            (105, [float("nan")] + [2.0] * 63),
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )
        sf_dir = str(tmp_path)
        emb.write.parquet(f"{sf_dir}/embeddings.parquet")

        q = load_all()["kmeans_assignments"]
        got = sorted(
            (r.vec_id, r.cluster)
            for r in q.builder(spark, sf_dir).collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{sf_dir}/embeddings.parquet/*.parquet')"
        )
        want = sorted((r[0], r[1]) for r in con.execute(q.oracle).fetchall())
        # over-length 102 participates (sliced); NULL 100 / short 101 don't
        assert {v for v, _ in got} == set(range(20)) | {102}
        assert got == want

    def test_pq_entries_match_oracle_on_dirty_corpus(self, spark, tmp_path):
        """Review r6 pass 7: the value-pinned PQ entries must stay exact
        vs DuckDB on a corpus holding non-finite components, not just
        NULL/short/interior-NULL rows — un-filtered, an inf-component
        vector's all-inf subspace dsq never fires Spark's strict-less
        argmin (row NULL-codes and vanishes) while the oracle's
        ROW_NUMBER always assigned a code and RANKED the row."""
        import duckdb

        from s3_access_logs_spark.plans.catalog import load_all

        rows = [
            # label rides along (ignored by the raw PQ entries; trains
            # the residual entry's coarse centroids)
            (i, i % 4, [float((i * 7 + j * 3) % 11) for j in range(64)])
            for i in range(20)
        ]
        rows += [
            (100, 0, None),
            (101, 1, [1.0, 2.0]),
            # over-length AND NULL-label: usable on its leading dims,
            # assigned to a real cluster, trains no centroid (both
            # engines exclude NULL labels from centroid means)
            (102, None, [0.5] * 70),
            (103, 2, [1.0] * 30 + [None] + [1.0] * 33),
            (104, 3, [1.0] * 20 + [float("inf")] + [1.0] * 43),
            (105, 0, [float("nan")] + [2.0] * 63),
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, label int, embedding array<float>"
        )
        sf_dir = str(tmp_path)
        emb.write.parquet(f"{sf_dir}/embeddings.parquet")
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{sf_dir}/embeddings.parquet/*.parquet')"
        )
        cat = load_all()
        for name in (
            "embedding_pq_topk",
            "embedding_pq_refine",
            "embedding_pq_residual_topk",
        ):
            q = cat[name]
            got = sorted(
                map(tuple, q.builder(spark, sf_dir).collect())
            )
            want = sorted(map(tuple, con.execute(q.oracle).fetchall()))
            assert got == want, name
            ids = {r[1] for r in got}
            assert ids and ids.isdisjoint({100, 101, 103, 104, 105}), name

    def test_pq_residual_topk_matches_indexed_probe(self, spark, tmp_path):
        """The catalog's in-memory residual entry and the production
        build_ivfpq_index/probe_ivfpq_index residual path must rank
        identically — same assignment, residual, codebook, encode and
        ADC stages, the parquet hop being the only difference."""
        from s3_access_logs_spark.operators.similarity import (
            build_ivfpq_index,
            label_centroids,
            pq_residual_topk,
            probe_ivfpq_index,
            train_pq_codebook,
            _assign_clusters,
            _residual_col,
        )
        from s3_access_logs_spark.plans.vector_queries import (
            well_formed_embeddings,
        )
        from s3_access_logs_spark.sources.tables import load_table

        emb = well_formed_embeddings(
            load_table(spark, "/root/testdata/sf0.001", "embeddings")
        )
        cents = label_centroids(emb, "label", dims=64)
        queries = emb.filter(F.col("vec_id") < 4)
        mem = sorted(
            map(
                tuple,
                pq_residual_topk(
                    emb, queries, cents, k=5, nprobe=2
                ).collect(),
            )
        )
        # shared codebook: train once on the residual frame, hand it to
        # both paths. NOTE (round 8): with codebook=None the two paths'
        # DEFAULTS now diverge deliberately — build_ivfpq_index trains
        # refine_iters=4 (production policy) while pq_residual_topk
        # stays init-only (its oracle replays that trainer); the
        # default-vs-default case is pinned below.
        c = emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("c_vec"),
        )
        assigned = _assign_clusters(c, cents, "c_vec", 1)
        cv = cents.select(
            F.col("label").alias("cluster"),
            F.col("centroid").alias("_cent"),
        )
        resid = assigned.join(F.broadcast(cv), "cluster").withColumn(
            "r_vec", _residual_col("c_vec", "_cent", 64)
        )
        cb = train_pq_codebook(resid, "r_vec", dims=64, m=8)
        idx = str(tmp_path / "ivfpq_res")
        b_cents, b_cb = build_ivfpq_index(
            emb, idx, centroids=cents, codebook=cb, residual=True
        )
        probed = sorted(
            map(
                tuple,
                probe_ivfpq_index(
                    spark, idx, queries, b_cents, b_cb,
                    k=5, nprobe=2, residual=True,
                ).collect(),
            )
        )
        assert mem == probed
        # default-vs-default: a DEFAULT-built index (refined codebook)
        # is mirrored by the twin at codebook_refine_iters=4 — the
        # documented way to validate a default build in memory
        idx2 = str(tmp_path / "ivfpq_res_default")
        d_cents, d_cb = build_ivfpq_index(
            emb, idx2, centroids=cents, residual=True
        )
        probed_default = sorted(
            map(
                tuple,
                probe_ivfpq_index(
                    spark, idx2, queries, d_cents, d_cb,
                    k=5, nprobe=2, residual=True,
                ).collect(),
            )
        )
        mem_refined = sorted(
            map(
                tuple,
                pq_residual_topk(
                    emb, queries, cents, k=5, nprobe=2,
                    codebook_refine_iters=4,
                ).collect(),
            )
        )
        assert mem_refined == probed_default

    def test_append_residual_matches_full_rebuild(self, spark, tmp_path):
        """append_to_ivfpq_index(residual=True) must leave the index in
        the same probe-visible state as building it from the full corpus
        in one shot — appending raw codes into a residual index would
        poison every probe of the touched cells, so the append path must
        replay the build path's residual construction exactly."""
        from s3_access_logs_spark.operators.similarity import (
            append_to_ivfpq_index,
            build_ivfpq_index,
            label_centroids,
            probe_ivfpq_index,
        )
        from s3_access_logs_spark.plans.vector_queries import (
            well_formed_embeddings,
        )
        from s3_access_logs_spark.sources.tables import load_table

        emb = well_formed_embeddings(
            load_table(spark, "/root/testdata/sf0.001", "embeddings")
        )
        cents = label_centroids(emb, "label", dims=64)
        queries = emb.filter(F.col("vec_id") < 4)
        full_idx = str(tmp_path / "full")
        f_cents, f_cb = build_ivfpq_index(
            emb, full_idx, centroids=cents, residual=True
        )
        # incremental: build from the first half, append the rest with
        # the SAME artifacts (the codebook-compatibility contract)
        lo = emb.filter(F.col("vec_id") % 2 == 0)
        hi = emb.filter(F.col("vec_id") % 2 == 1)
        inc_idx = str(tmp_path / "inc")
        build_ivfpq_index(
            lo, inc_idx, centroids=cents, codebook=f_cb, residual=True
        )
        stats = append_to_ivfpq_index(
            spark, hi, inc_idx, f_cents, f_cb, residual=True
        )
        assert stats["appended"] == hi.count()
        probe = lambda idx: sorted(  # noqa: E731
            map(
                tuple,
                probe_ivfpq_index(
                    spark, idx, queries, f_cents, f_cb,
                    k=5, nprobe=2, residual=True,
                ).collect(),
            )
        )
        assert probe(inc_idx) == probe(full_idx)

    def test_refine_skips_stale_malformed_corpus_rows(self, spark):
        """Review r6 pass 7: a row can be encoded in the index (vector
        was well-formed at build time) yet NULL/short in TODAY'S
        refine_corpus — its exact dist folds to NULL, which the asc
        window ranked FIRST, crowning the stale row and evicting a true
        neighbor. The contract is the oracle's: malformed candidates
        VANISH (inner join vs the well-formed CTE), ranks close up."""
        from s3_access_logs_spark.operators.similarity import (
            pq_encode,
            pq_topk,
            train_pq_codebook,
        )
        from s3_access_logs_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        cb = train_pq_codebook(emb)
        enc = pq_encode(emb, cb)
        queries = emb.filter(F.col("vec_id") < 2)
        base = pq_topk(
            enc, queries, cb, k=5, refine_corpus=emb, refine_factor=4
        ).collect()
        stale_id = next(
            r.neighbor_id for r in base if r.query_id == 0 and r.rank == 1
        )
        stale = emb.withColumn(
            "embedding",
            F.when(F.col("vec_id") != stale_id, F.col("embedding")),
        )
        out = pq_topk(
            enc, queries, cb, k=5, refine_corpus=stale, refine_factor=4
        ).collect()
        assert all(r.neighbor_id != stale_id for r in out)
        assert all(r.dist is not None for r in out)
        # ranks close up: still k rows per query, contiguous from 1
        for qid in (0, 1):
            ranks = sorted(r.rank for r in out if r.query_id == qid)
            assert ranks == [1, 2, 3, 4, 5]

    def test_vector_entries_match_oracle_on_dirty_corpus(
        self, spark, tmp_path
    ):
        """Review r6 pass 8: EVERY embeddings-table entry must stay
        value-exact vs DuckDB on a dirty corpus, not just kmeans/PQ —
        un-filtered, DuckDB ranks a NaN cosine FIRST under DESC (and
        `NaN >= t` is true there) while Spark's NULL-normalized sim
        ranks last and fails thresholds; an interior NULL crashes
        list_dot_product; a ragged vector trips random_projection's
        size assert. The driver's canon (sort cols/rows, round floats,
        int/float kinds) is replicated via tools/check_oracle.canon."""
        import importlib.util
        from pathlib import Path

        import duckdb

        from s3_access_logs_spark.plans.catalog import load_all

        spec = importlib.util.spec_from_file_location(
            "check_oracle",
            Path(__file__).resolve().parents[1] / "tools" / "check_oracle.py",
        )
        co = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(co)

        rows = [
            (i, [float((i * 7 + j * 3) % 11) for j in range(64)], i % 4)
            for i in range(20)
        ]
        rows += [
            (100, None, 0),
            (101, [1.0, 2.0], 1),
            (102, [0.5] * 70, 2),
            (103, [1.0] * 30 + [None] + [1.0] * 33, 3),
            (104, [1.0] * 20 + [float("inf")] + [1.0] * 43, 0),
            (105, [float("nan")] + [2.0] * 63, 1),
            # clean vector, NULL label (review r6 pass 12): defines no
            # centroid on either engine but still gets assigned/ranked
            (106, [float((j * 5 + 3) % 11) for j in range(64)], None),
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        sf_dir = str(tmp_path)
        emb.write.parquet(f"{sf_dir}/embeddings.parquet")
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{sf_dir}/embeddings.parquet/*.parquet')"
        )
        cat = load_all()
        for name in (
            "embedding_topk",
            "embedding_ann_lsh",
            "embedding_ivf_topk",
            "embedding_near_pairs",
            "embedding_semantic_dedup",
            "embedding_quantize_int8",
            "jl_projection",
        ):
            q = cat[name]
            sdf = q.builder(spark, sf_dir)
            spdf = sdf.toPandas()
            srows = [
                tuple(r) for r in spdf.itertuples(index=False, name=None)
            ]
            odf = con.execute(q.oracle).fetchdf()
            drows = [
                tuple(r) for r in odf.itertuples(index=False, name=None)
            ]
            assert sorted(sdf.columns) == sorted(odf.columns), name
            got = co.canon(srows, sdf.columns)
            want = co.canon(drows, list(odf.columns))
            assert got == want, f"{name}: {len(got)} vs {len(want)} rows"
            assert got, f"{name}: empty result on the clean subset"

    def test_curate_semantic_matches_oracle_on_dirty_corpus(
        self, spark, tmp_path
    ):
        """Review r6 pass 9: the curate_semantic entry must stay
        value-exact vs DuckDB when the EMBEDDINGS side is dirty — the
        oracle's 64-dim CTEs error on an over-length vector
        (list_dot_product length mismatch) and rank a NaN cosine first,
        while an un-pre-filtered Spark stage crashes the quantizer fit
        on a ragged row. Docs whose embedding is malformed must PASS the
        semantic stage on both engines (no signal != rejection)."""
        import duckdb

        from s3_access_logs_spark.plans.catalog import load_all

        docs = [(i, f"document body number {i} with words " * 3) for i in range(20)]
        docs += [(100, None), (101, "   "), (102, docs[5][1])]  # empty + dup
        spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
            f"{tmp_path}/documents.parquet"
        )
        # docs 0-14,16,17: clean embeddings; doc 15: NO embedding row;
        # docs 18/19: ONLY a malformed row (ragged / NaN — must pass the
        # semantic stage as no-signal, not crash the fit); ids 30-33:
        # malformed rows with no matching doc (an interior NULL here
        # crashes the unfiltered oracle's centroid training outright)
        rows = [
            (i, [float((i * 7 + j * 3) % 11) for j in range(64)], i % 4)
            for i in range(18)
            if i != 15
        ]
        rows += [
            (18, [1.0, 2.0], 1),
            (19, [float("nan")] + [2.0] * 63, 1),
            (30, None, 0),
            (31, [0.5] * 70, 2),
            (32, [1.0] * 30 + [None] + [1.0] * 33, 3),
            (33, [1.0] * 20 + [float("inf")] + [1.0] * 43, 0),
        ]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.parquet(f"{tmp_path}/embeddings.parquet")
        con = duckdb.connect()
        for t in ("documents", "embeddings"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{tmp_path}/{t}.parquet/*.parquet')"
            )
        q = load_all()["curate_semantic"]
        got = sorted(map(tuple, q.builder(spark, str(tmp_path)).collect()))
        want = sorted(map(tuple, con.execute(q.oracle).fetchall()))
        assert got == want
        assert ("empty", 2) in got and ("exact_dup", 1) in got

    def test_assign_clusters_arrow_matches_fold(self, spark):
        """Review r6 pass 10: the Arrow matmul assignment must emit
        EXACTLY the fold's assignments — the 6dp-rounded cosine key
        makes the summation order immaterial, ties break on the smaller
        label in both, and every malformed-row class (NULL / ragged /
        interior-NULL / NaN / zero-norm) lands on the same no-signal
        outcome (the n_best smallest labels)."""
        from s3_access_logs_spark.operators.similarity import (
            _assign_clusters,
            label_centroids,
        )
        from s3_access_logs_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        cents = label_centroids(emb, "label", "embedding", dims=64)
        dirty = emb.unionByName(
            spark.createDataFrame(
                [
                    (9000, None, 0),
                    (9001, [1.0, 2.0], 0),
                    (9002, [0.0] * 64, 1),
                    (9003, [float("nan")] * 64, 1),
                    (9004, [1.0] * 30 + [None] + [1.0] * 33, 2),
                    (9005, [float("inf")] + [1.0] * 63, 2),
                ],
                "vec_id long, embedding array<float>, label int",
            ),
            allowMissingColumns=True,
        )
        for nb in (1, 2):
            fold = sorted(
                (r.vec_id, r.cluster)
                for r in _assign_clusters(
                    dirty, cents, "embedding", nb, impl="fold"
                ).collect()
            )
            arrow = sorted(
                (r.vec_id, r.cluster)
                for r in _assign_clusters(
                    dirty, cents, "embedding", nb, impl="arrow"
                ).collect()
            )
            assert fold == arrow, f"n_best={nb}"
        # the malformed rows all landed on the smallest labels
        byid = dict(
            (r.vec_id, r.cluster)
            for r in _assign_clusters(
                dirty, cents, "embedding", 1, impl="arrow"
            ).collect()
        )
        assert all(byid[i] == 0 for i in range(9000, 9006))

    def test_assign_clusters_auto_switches_at_large_nlist(self, spark):
        """The impl=None auto path must pick the Arrow matmul at
        _ARROW_NLIST_MIN centroids and stay on the Python-free fold
        below it — and both produce identical assignments either way."""
        from s3_access_logs_spark.operators.similarity import (
            _ARROW_NLIST_MIN,
            _assign_clusters,
        )

        k = _ARROW_NLIST_MIN
        cents = spark.createDataFrame(
            [(i, [float((i * 3 + j) % 7) for j in range(8)]) for i in range(k)],
            "label int, centroid array<double>",
        )
        rows = spark.createDataFrame(
            [(i, [float((i + j) % 5) for j in range(8)]) for i in range(50)],
            "vec_id long, embedding array<float>",
        )
        auto = sorted(
            (r.vec_id, r.cluster)
            for r in _assign_clusters(rows, cents, "embedding", 1).collect()
        )
        fold = sorted(
            (r.vec_id, r.cluster)
            for r in _assign_clusters(
                rows, cents, "embedding", 1, impl="fold"
            ).collect()
        )
        assert auto == fold
        # auto on a large-nlist quantizer goes through mapInPandas
        plan = _assign_clusters(
            rows, cents, "embedding", 1
        )._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan
        small = cents.filter(F.col("label") < k - 1)
        plan_small = _assign_clusters(
            rows, small, "embedding", 1
        )._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" not in plan_small

    def test_round_fixed_three_way_parity(self, spark):
        """Review r7 (ADVICE r6): the repo-wide key rounding is
        floor(x*1e6+0.5)/1e6 in three places — the Spark expression
        (round_fixed), its numpy Arrow-path replay (_round6_floor) and
        the DuckDB oracle fragment (sql_round_fixed). All three must be
        bit-identical over the in-contract domain, .5-boundary doubles
        included (0.5222235 is the value where decimal F.round and
        binary rounding historically diverged)."""
        import duckdb
        import numpy as np

        from s3_access_logs_spark.operators.similarity import (
            _round6_floor,
            round_fixed,
        )
        from s3_access_logs_spark.plans.vector_queries import (
            sql_round_fixed,
        )

        vals = [
            0.5222235,
            -0.5202505,
            -0.9806954999999999,
            0.1234565,
            -0.1234575,
            0.9999995,
            -0.9999995,
            -2.5e-06,  # negative half: floor rounds toward +inf
            0.0,
            1.0,
            -1.0,
            2.0,
            # in-contract key magnitudes: means <= VEC_ABS_MAX, squared
            # distances <= dims*(2*VEC_ABS_MAX)^2 ~ 2.6e10
            32774.1234565,
            -32774.1234565,
            123456.7890625,
            9.8765432155e6,
            2.56e10,
            4.611686018427388e9,
        ] + [
            ((i * 7919) % 20001 - 10000) / 10007.0 for i in range(500)
        ] + [
            ((i * 104729) % 999983) * 1.0009765625 for i in range(200)
        ]
        got_np = list(_round6_floor(np.asarray(vals, dtype=np.float64)))
        got_spark = [
            r[0]
            for r in spark.createDataFrame([(v,) for v in vals], "x double")
            .select(round_fixed(F.col("x")))
            .collect()
        ]
        got_duck = [
            r[0]
            for r in duckdb.connect()
            .execute(
                "SELECT "
                + sql_round_fixed("x")
                + " FROM (SELECT unnest(?::DOUBLE[]) AS x)",
                [vals],
            )
            .fetchall()
        ]
        assert got_np == got_spark == got_duck
        # out-of-contract garbage stays visibly non-finite on the numpy
        # walk (callers detect bad rows AFTER rounding)
        weird = _round6_floor(
            np.asarray([float("inf"), float("nan")], dtype=np.float64)
        )
        assert np.isinf(weird[0]) and np.isnan(weird[1])

    def test_assign_clusters_zero_norm_centroid_never_wins(self, spark):
        """Review r6 pass 11: the Arrow path's per-cell sentinel was
        NEGATED (-2.0, the best key) so a zero-norm centroid captured
        every row where the fold keys it +2.0 (worst). Both impls must
        agree and never assign a valid row to the zero centroid."""
        from s3_access_logs_spark.operators.similarity import (
            _assign_clusters,
        )

        cents = spark.createDataFrame(
            [(0, [0.0] * 8), (1, [1.0] * 8), (2, [0.5] * 4 + [1.5] * 4)],
            "label int, centroid array<double>",
        )
        rows = spark.createDataFrame(
            [(i, [float((i + j) % 5 + 1) for j in range(8)]) for i in range(40)],
            "vec_id long, embedding array<float>",
        )
        outs = {}
        for impl in ("fold", "arrow"):
            outs[impl] = sorted(
                (r.vec_id, r.cluster)
                for r in _assign_clusters(
                    rows, cents, "embedding", 1, impl=impl
                ).collect()
            )
            assert all(c != 0 for _, c in outs[impl]), impl
        assert outs["fold"] == outs["arrow"]

    def test_assign_clusters_rejects_broken_quantizer(self, spark):
        """Review r6 pass 11: a NULL/ragged/non-finite centroid must be
        a loud named error on BOTH impls — the fold buried it in
        engine-specific NaN orderings and the Arrow argmin inverted
        them (np.argmin treats NaN as the minimum)."""
        from s3_access_logs_spark.operators.similarity import (
            _assign_clusters,
        )

        rows = spark.createDataFrame(
            [(0, [1.0] * 8)], "vec_id long, embedding array<float>"
        )
        for broken in (
            [(0, None), (1, [1.0] * 8)],
            [(0, [1.0, 2.0]), (1, [1.0] * 8)],
            [(0, [float("nan")] * 8), (1, [1.0] * 8)],
            [(0, [float("inf")] + [1.0] * 7), (1, [1.0] * 8)],
            [(0, [1.0] * 4 + [None] + [1.0] * 3), (1, [1.0] * 8)],
            [(None, [2.0] * 8), (1, [1.0] * 8)],  # NULL label
        ):
            cents = spark.createDataFrame(
                broken, "label int, centroid array<double>"
            )
            for impl in ("fold", "arrow"):
                with pytest.raises(ValueError, match="quantizer holds"):
                    _assign_clusters(rows, cents, "embedding", 1, impl=impl)

    def test_label_centroids_drops_null_label_groups(self, spark):
        """Review r6 pass 12: a NULL label defines no centroid — the
        NULL-label group's tie-break order is engine-specific and the
        quantizer guard now rejects it loud, so training must drop it
        (rows with NULL labels still get assigned downstream)."""
        from s3_access_logs_spark.operators.similarity import (
            label_centroids,
        )

        emb = spark.createDataFrame(
            [(0, [1.0] * 4, 0), (1, [2.0] * 4, None), (2, [3.0] * 4, 1)],
            "vec_id long, embedding array<float>, label int",
        )
        cents = label_centroids(emb, "label", "embedding", dims=4)
        assert sorted(r.label for r in cents.collect()) == [0, 1]

    def test_assign_clusters_arrow_string_labels(self, spark):
        """Review r6 pass 12: the arrow path coerced labels to int64,
        crashing on string label types the fold supports."""
        from s3_access_logs_spark.operators.similarity import (
            _assign_clusters,
        )

        cents = spark.createDataFrame(
            [("en", [1.0] * 4), ("fr", [-1.0] * 4), ("de", [0.5] * 4)],
            "label string, centroid array<double>",
        )
        rows = spark.createDataFrame(
            [(0, [1.0] * 4), (1, [-2.0] * 4)],
            "vec_id long, embedding array<float>",
        )
        outs = {}
        for impl in ("fold", "arrow"):
            out = _assign_clusters(rows, cents, "embedding", 1, impl=impl)
            assert dict(out.dtypes)["cluster"] == "string", impl
            outs[impl] = sorted(
                (r.vec_id, r.cluster) for r in out.collect()
            )
        # "de" and "en" are colinear with row 0 (cosine 1.0 tie) — the
        # smaller label wins lexicographically on both impls
        assert outs["fold"] == outs["arrow"] == [(0, "de"), (1, "fr")]

    def test_assign_clusters_out_of_bound_rows_are_no_signal(self, spark):
        """Review r6 pass 12 + r7: a huge-but-finite DOUBLE vector (it
        overflows the norm product to inf, degenerating the cosine to
        NaN — or worse, to a FINITE 0 that could spuriously capture the
        row) is out of the magnitude-bound contract and must key as the
        no-signal sentinel on BOTH impls; and a quantizer holding such a
        centroid is rejected loudly instead of handing out finite
        garbage keys."""
        import pytest

        from s3_access_logs_spark.operators.similarity import (
            _assign_clusters,
        )

        dirty_cents = spark.createDataFrame(
            [(0, [1e200] * 8), (1, [1.0] * 8), (2, [2.0] * 8)],
            "label int, centroid array<double>",
        )
        rows = spark.createDataFrame(
            [(0, [1e200] * 8), (1, [1.0] * 8), (2, [2e4] * 8)],
            "vec_id long, embedding array<double>",
        )
        with pytest.raises(ValueError, match="magnitude"):
            _assign_clusters(rows, dirty_cents, "embedding", 1)
        cents = dirty_cents.filter(F.col("label") > 0)
        outs = {}
        for impl in ("fold", "arrow"):
            outs[impl] = sorted(
                (r.vec_id, r.cluster)
                for r in _assign_clusters(
                    rows, cents, "embedding", 1, impl=impl
                ).collect()
            )
            got = dict(outs[impl])
            # rows 0 and 2 are out of contract -> all-sentinel keys ->
            # the smallest label; row 1 (valid, colinear with both
            # centroids) ties at cos 1.0 and takes the smaller label
            assert got == {0: 1, 1: 1, 2: 1}, impl
        assert outs["fold"] == outs["arrow"]

    def test_assign_clusters_arrow_keeps_label_type(self, spark):
        """Review r6 pass 11: the Arrow path hard-coded cluster to
        int32; it must inherit the source label type like the fold."""
        from s3_access_logs_spark.operators.similarity import (
            _assign_clusters,
        )

        cents = spark.createDataFrame(
            [(int(2**40 + i), [float(i + 1)] * 4) for i in range(3)],
            "label long, centroid array<double>",
        )
        rows = spark.createDataFrame(
            [(0, [1.0] * 4)], "vec_id long, embedding array<float>"
        )
        for impl in ("fold", "arrow"):
            out = _assign_clusters(rows, cents, "embedding", 1, impl=impl)
            assert dict(out.dtypes)["cluster"] == "bigint", impl
            assert out.first()["cluster"] >= 2**40, impl

    def test_pq_encode_overflow_dsq_null_codes(self, spark):
        """Review r6 pass 11: a huge-but-finite vector whose squared
        subspace distances overflow to inf must NULL-code on BOTH impls
        — the fold's strict-less argmin never fires on all-inf, while
        np.argmin over an all-inf row would have emitted code 0."""
        from s3_access_logs_spark.operators.similarity import (
            pq_encode,
            train_pq_codebook,
        )

        base = spark.createDataFrame(
            [
                (i, [float((i * 7 + j * 3) % 11) for j in range(64)])
                for i in range(10)
            ],
            "vec_id long, embedding array<double>",
        )
        dirty = base.unionByName(
            spark.createDataFrame(
                [(99, [1e200] * 64)], "vec_id long, embedding array<double>"
            )
        )
        cb = train_pq_codebook(base)
        for impl in ("fold", "arrow"):
            got = {
                r.vec_id: r.pq_codes
                for r in pq_encode(dirty, cb, impl=impl)
                .select("vec_id", "pq_codes")
                .collect()
            }
            assert got[99] is None, impl
            assert all(got[i] is not None for i in range(10)), impl

    def test_pq_encode_arrow_matches_fold(self, spark):
        """Review r6 pass 10: the Arrow bulk-encode must emit EXACTLY
        the fold's codes — per-dim left-to-right accumulation matches
        _l2sq bit-for-bit, the 6dp rounding and first-min tie-break
        match, and every malformed class NULL-codes identically."""
        from s3_access_logs_spark.operators.similarity import (
            pq_encode,
            train_pq_codebook,
        )
        from s3_access_logs_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        dirty = emb.unionByName(
            spark.createDataFrame(
                [
                    (9000, None),
                    (9001, [1.0, 2.0]),
                    (9002, [0.5] * 70),  # over-length encodes on dims
                    (9003, [1.0] * 30 + [None] + [1.0] * 33),
                    (9004, [float("inf")] + [1.0] * 63),
                    (9005, [float("nan")] * 64),
                ],
                "vec_id long, embedding array<float>",
            ),
            allowMissingColumns=True,
        )
        cb = train_pq_codebook(emb)
        fold = {
            r.vec_id: r.pq_codes
            for r in pq_encode(dirty, cb, impl="fold")
            .select("vec_id", "pq_codes")
            .collect()
        }
        arrow = {
            r.vec_id: r.pq_codes
            for r in pq_encode(dirty, cb, impl="arrow")
            .select("vec_id", "pq_codes")
            .collect()
        }
        assert fold == arrow
        assert arrow[9002] is not None  # over-length: leading dims encode
        assert all(arrow[i] is None for i in (9000, 9001, 9003, 9004, 9005))

    def test_cosine_nan_is_null_uniformly(self, spark):
        """Review r6 pass 8: NaN cosine -> NULL lives INSIDE the cosine
        helpers now (functions/vectors._no_nan), so every ranking call
        site — brute force, LSH, IVF probes, semantic dedup — shares
        one no-signal contract instead of only brute_force_topk."""
        from s3_access_logs_spark.functions.vectors import (
            cosine_from_norms,
            cosine_similarity,
            l2_norm,
        )

        df = spark.createDataFrame(
            [([float("inf"), 1.0], [1.0, 1.0])], "a array<float>, b array<float>"
        )
        row = df.select(
            cosine_similarity("a", "b").alias("s1"),
            cosine_from_norms(
                "a", "b", l2_norm("a"), l2_norm("b")
            ).alias("s2"),
        ).first()
        assert row["s1"] is None and row["s2"] is None

    def test_well_formed_predicate_sql_parity(self, spark, tmp_path):
        """The Python and DuckDB copies of the well-formedness contract
        (well_formed_vector / sql_well_formed) must accept identical
        rows — every value-pinned vector oracle leans on this parity."""
        import duckdb

        from s3_access_logs_spark.operators.similarity import (
            well_formed_vector,
        )
        from s3_access_logs_spark.plans.vector_queries import (
            sql_well_formed,
        )

        rows = [
            (0, [1.0] * 64),  # clean
            (1, [0.0] * 64),  # zero vector: well-formed (no-signal later)
            (2, None),
            (3, [1.0, 2.0]),  # short
            (4, [0.5] * 70),  # over-length: OK on leading dims
            (5, [1.0] * 30 + [None] + [1.0] * 33),  # interior NULL
            (6, [1.0] * 20 + [float("inf")] + [1.0] * 43),
            (7, [-float("inf")] + [1.0] * 63),
            (8, [float("nan")] + [2.0] * 63),
            (9, [1.0] * 64 + [float("inf")]),  # inf PAST dims: OK
            # magnitude bound (review r7, ADVICE r6): huge-but-finite
            # components overflow downstream math — out of contract
            (10, [1e20] + [1.0] * 63),
            (11, [-2e4] + [1.0] * 63),
            (12, [1e4] * 64),  # exactly AT the bound: well-formed
            (13, [1.0] * 64 + [1e20]),  # past dims: OK
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )
        path = f"{tmp_path}/embeddings.parquet"
        emb.write.parquet(path)
        got = {
            r.vec_id
            for r in emb.filter(
                well_formed_vector("embedding", 64)
            ).collect()
        }
        con = duckdb.connect()
        want = {
            r[0]
            for r in con.execute(
                "SELECT vec_id FROM "
                f"read_parquet('{path}/*.parquet') "
                f"WHERE {sql_well_formed(64)}"
            ).fetchall()
        }
        assert got == want == {0, 1, 4, 9, 12, 13}

    def test_kmeans_null_seed_raises_loudly(self, spark):
        """Review r6 pass 3 (+ pass 8): a NULL seed — or one holding an
        interior NULL or non-finite component — must fail with a named
        error at validation, not a TypeError deep inside the float cast
        (interior NULL) or silent centroid poisoning (inf/NaN)."""
        from s3_access_logs_spark.operators.similarity import kmeans_fit
        from s3_access_logs_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        for bad_seed in (
            None,
            [1.0, None] + [1.0] * 62,
            [float("inf")] + [1.0] * 63,
            [float("nan")] * 64,
        ):
            with pytest.raises(ValueError, match="init vectors at positions"):
                kmeans_fit(emb, k=2, init=[bad_seed, [1.0] * 64])
        # ragged seeds (review r6 pass 9): in EITHER position they must
        # name the seeds, not mis-infer dims and blame the corpus (short
        # seed first) or silently return a ragged centroid set (short
        # seed later)
        for ragged in ([[1.0, 2.0], [1.0] * 64], [[1.0] * 64, [1.0, 2.0]]):
            with pytest.raises(ValueError, match="init vectors have lengths"):
                kmeans_fit(emb, k=2, init=ragged)
        # explicit dims: uniform seeds of the wrong length are ragged too
        with pytest.raises(ValueError, match="init vectors have lengths"):
            kmeans_fit(emb, k=2, init=[[1.0] * 4, [2.0] * 4], dims=64)

    def test_skew_stats_empty_input(self, spark):
        from s3_access_logs_spark.operators.joins import (
            key_skew_stats,
            suggest_salt,
        )

        empty = spark.createDataFrame([], "k string, v long")
        s = key_skew_stats(empty, "k")
        assert s["rows"] == 0 and s["top_keys"] == []
        assert suggest_salt(empty, "k") == 1

    def test_temperature_mixture_empty_input(self, spark):
        from s3_access_logs_spark.operators.sampling import (
            temperature_mixture,
        )

        empty = spark.createDataFrame([], "source string, doc_id long")
        assert temperature_mixture(empty, "source", "doc_id").count() == 0

    def test_paragraph_sep_is_literal_for_rejoin(self, spark):
        from s3_access_logs_spark.operators.dedup import (
            drop_repeated_paragraphs,
        )

        df = spark.createDataFrame([(1, "a|b|a|c")], ["doc_id", "text"])
        # '|' is a regex alternation if passed raw; must be escaped for
        # the split and used literally for the rejoin
        out = drop_repeated_paragraphs(df, sep="|").first()["text"]
        assert out == "a|b|c"
        # custom split pattern, literal rejoin
        df2 = spark.createDataFrame([(1, "a\n\nb\n\n\na")], ["doc_id", "text"])
        out2 = drop_repeated_paragraphs(
            df2, sep="\n\n", split_pattern=r"\n{2,}"
        ).first()["text"]
        assert out2 == "a\n\nb"


class TestAdviceR4Fixes:
    """Regression tests for the round-3 ADVICE findings."""

    def test_temperature_mixture_keeps_null_source_rows(self, spark):
        from s3_access_logs_spark.operators.sampling import (
            temperature_mixture,
        )

        # 100 NULL-source rows + 100 'web' rows; alpha=1 is pure
        # re-balancing, so every row's keep rate is 1.0 — before the
        # null-safe join fix the NULL group vanished entirely
        rows = [(None if i < 100 else "web", i) for i in range(200)]
        df = spark.createDataFrame(rows, "source string, doc_id long")
        out = temperature_mixture(df, "source", "doc_id", alpha=1.0)
        kept_null = out.filter(F.col("source").isNull()).count()
        assert kept_null == 100
        assert out.count() == 200
        # rate math still sees the NULL group as its own source
        assert (
            out.filter(F.col("source").isNull())
            .select("_keep_rate")
            .first()[0]
            == 1.0
        )

    def test_assign_clusters_empty_centroids_fails_loud(self, spark):
        import pytest

        from s3_access_logs_spark.operators.similarity import (
            _assign_clusters,
        )

        vecs = spark.createDataFrame(
            [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
        )
        empty_cents = spark.createDataFrame(
            [], "label string, centroid array<double>"
        )
        with pytest.raises(ValueError, match="empty centroid set"):
            _assign_clusters(vecs, empty_cents, "embedding", 1)

    def test_paragraph_dedup_preserves_null_text(self, spark):
        from s3_access_logs_spark.operators.dedup import (
            drop_repeated_paragraphs,
        )

        df = spark.createDataFrame(
            [(1, None), (2, "a\n\na\n\nb")], "doc_id long, text string"
        )
        out = {
            r["doc_id"]: r["text"]
            for r in drop_repeated_paragraphs(df).collect()
        }
        assert out[1] is None  # NULL in, NULL out — not ''
        assert out[2] == "a\n\nb"


class TestQuantileSketch:
    """Mergeable bottom-k-by-hash quantile sample — the distribution
    member of the sketch family (bloom/cms/kmv)."""

    def _docs(self, spark):
        from s3_access_logs_spark.sources.tables import load_table

        return load_table(spark, "/root/testdata/sf0.001", "documents")

    def test_full_sample_is_exact(self, spark):
        from s3_access_logs_spark.functions.quantile import (
            quantile_sketch_build,
            quantile_values,
        )

        docs = self._docs(spark)
        n = docs.count()
        sk = quantile_sketch_build(docs, "n_chars", "doc_id", k=n + 100)
        got = quantile_values(sk, [0.0, 0.5, 0.9, 1.0])
        want = docs.agg(
            F.expr(
                "percentile(CAST(n_chars AS DOUBLE), "
                "array(0.0D, 0.5D, 0.9D, 1.0D))"
            )
        ).first()[0]
        # k >= n -> the sample IS the population; both sides use the
        # same linear interpolation -> exact agreement
        for q, w in zip([0.0, 0.5, 0.9, 1.0], want):
            assert abs(got[q] - w) < 1e-9

    def test_small_sample_within_tolerance(self, spark):
        from s3_access_logs_spark.functions.quantile import (
            quantile_sketch_build,
            quantile_values,
        )

        docs = self._docs(spark)
        sk = quantile_sketch_build(docs, "n_chars", "doc_id", k=128)
        got = quantile_values(sk, [0.5])
        exact = docs.agg(
            F.expr("percentile(CAST(n_chars AS DOUBLE), 0.5D)")
        ).first()[0]
        # sample error ~ sqrt(.25/128) ~ 4.4 percentile points; assert
        # the VALUE at the estimated rank is within the p35-p65 band
        lo, hi = docs.agg(
            F.expr(
                "percentile(CAST(n_chars AS DOUBLE), array(0.35D, 0.65D))"
            )
        ).first()[0]
        assert lo <= got[0.5] <= hi

    def test_merge_equals_whole_and_tolerates_overlap(self, spark):
        from s3_access_logs_spark.functions.quantile import (
            quantile_sketch_build,
            quantile_sketch_merge,
        )

        docs = self._docs(spark)
        a = docs.filter(F.col("doc_id") % 2 == 0)
        b = docs.filter(F.col("doc_id") % 2 == 1)
        whole = quantile_sketch_build(docs, "n_chars", "doc_id", k=64)
        merged = quantile_sketch_merge(
            quantile_sketch_build(a, "n_chars", "doc_id", k=64),
            quantile_sketch_build(b, "n_chars", "doc_id", k=64),
            # replayed slice: same rows again must not double-sample
            quantile_sketch_build(a, "n_chars", "doc_id", k=64),
        )
        assert set(map(tuple, whole.collect())) == set(
            map(tuple, merged.collect())
        )

    def test_k_mismatch_and_missing_meta_fail_loud(self, spark):
        from s3_access_logs_spark.functions.quantile import (
            quantile_sketch_build,
            quantile_sketch_merge,
            quantile_values,
        )

        docs = self._docs(spark)
        s64 = quantile_sketch_build(docs, "n_chars", "doc_id", k=64)
        s32 = quantile_sketch_build(docs, "n_chars", "doc_id", k=32)
        with pytest.raises(ValueError, match="disagree on k"):
            quantile_sketch_merge(s64, s32)
        with pytest.raises(ValueError, match="meta row"):
            quantile_values(s64.filter(F.col("h").isNotNull()), [0.5])
        with pytest.raises(ValueError, match="in \\[0, 1\\]"):
            quantile_values(s64, [1.5])

    def test_bottomk_avoids_global_sort(self, spark):
        from s3_access_logs_spark.functions.quantile import (
            quantile_sketch_build,
        )

        docs = self._docs(spark)
        sk = quantile_sketch_build(docs, "n_chars", "doc_id", k=64)
        plan = sk._jdf.queryExecution().executedPlan().toString()
        # per-partition partial bottom-k + single k-row reduce, never a
        # full shuffle sort of the corpus
        assert "TakeOrderedAndProject" in plan


class TestUrlFunctions:
    """Domain normalization + blocks-all-subdomains list filtering."""

    def test_url_host_normalizes(self, spark):
        from s3_access_logs_spark.functions.url import url_host

        df = spark.createDataFrame(
            [
                ("https://News.Example.COM:8080/path?q=1",),
                ("example.com/path",),          # scheme-less fallback
                ("http://trailing.dot.",),
                (None,),
            ],
            ["u"],
        )
        got = [r[0] for r in df.select(url_host("u")).collect()]
        assert got == [
            "news.example.com", "example.com", "trailing.dot", None
        ]

    def test_registrable_domain_heuristic(self, spark):
        from s3_access_logs_spark.functions.url import registrable_domain

        df = spark.createDataFrame(
            [
                ("news.bbc.co.uk",),
                ("a.b.example.com",),
                ("example.com",),
                ("localhost",),
            ],
            ["h"],
        )
        got = [r[0] for r in df.select(registrable_domain("h")).collect()]
        assert got == ["bbc.co.uk", "example.com", "example.com", "localhost"]

    def test_host_suffixes(self, spark):
        from s3_access_logs_spark.functions.url import host_suffixes

        df = spark.createDataFrame([("a.b.c",)], ["h"])
        [r] = df.select(host_suffixes("h")).collect()
        assert r[0] == ["a.b.c", "b.c", "c"]

    def test_blocklist_filter_subdomain_semantics(self, spark):
        from s3_access_logs_spark.functions.url import (
            domain_blocklist_filter,
        )

        df = spark.createDataFrame(
            [
                (1, "https://cdn.example.com/page"),   # subdomain -> block
                (2, "http://notexample.com"),          # suffix!=label bound
                (3, "BAD.co.uk/page"),                 # scheme-less + case
                (4, "https://sub.bad.co.uk"),
                (5, "https://spam.net"),
                (6, "https://ok.org/fine"),
            ],
            ["doc_id", "url"],
        )
        # raw list lines: bare domain, cased, scheme'd-with-path
        bl = ["example.com", "Bad.co.uk", "http://spam.net/x"]
        clean = domain_blocklist_filter(df, "url", bl, "doc_id")
        assert {r.doc_id for r in clean.collect()} == {2, 6}
        hit = domain_blocklist_filter(df, "url", bl, "doc_id", keep="blocked")
        assert {r.doc_id for r in hit.collect()} == {1, 3, 4, 5}

    def test_blocklist_probe_is_broadcast(self, spark):
        from s3_access_logs_spark.functions.url import (
            domain_blocklist_filter,
        )

        df = spark.createDataFrame(
            [(i, f"https://site{i}.com") for i in range(100)],
            ["doc_id", "url"],
        )
        out = domain_blocklist_filter(
            df, "url", ["site7.com"], "doc_id", keep="blocked"
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the suffix-membership probe must be a broadcast hash join —
        # the corpus-side branch never shuffles on the exploded fanout
        assert "BroadcastHashJoin" in plan
        assert {r.doc_id for r in out.collect()} == {7}


class TestGroupedQuantileSketch:
    """Per-group distribution profiles with skew-proof two-phase
    bottom-k."""

    def _docs(self, spark):
        from s3_access_logs_spark.sources.tables import load_table

        return load_table(spark, "/root/testdata/sf0.001", "documents")

    def test_full_sample_matches_exact_per_group(self, spark):
        from s3_access_logs_spark.functions.quantile import (
            grouped_quantile_sketch_build,
            grouped_quantile_values,
        )

        docs = self._docs(spark)
        n = docs.count()
        sk = grouped_quantile_sketch_build(
            docs, "n_chars", "doc_id", ["source"], k=n + 10
        )
        got = {
            (r["source"], r["q"]): r["value"]
            for r in grouped_quantile_values(sk, [0.5, 0.9]).collect()
        }
        want = {
            (r["source"], q): v
            for r in docs.groupBy("source")
            .agg(
                F.expr(
                    "percentile(CAST(n_chars AS DOUBLE), "
                    "array(0.5D, 0.9D))"
                ).alias("vals")
            )
            .collect()
            for q, v in zip([0.5, 0.9], r["vals"])
        }
        assert set(got) == set(want)
        for key in want:
            assert abs(got[key] - want[key]) < 1e-9

    def test_merge_halves_equals_whole(self, spark):
        from s3_access_logs_spark.functions.quantile import (
            grouped_quantile_sketch_build,
            grouped_quantile_sketch_merge,
        )

        docs = self._docs(spark)
        a = docs.filter(F.col("doc_id") % 2 == 0)
        b = docs.filter(F.col("doc_id") % 2 == 1)
        whole = grouped_quantile_sketch_build(
            docs, "n_chars", "doc_id", ["source"], k=16
        )
        merged = grouped_quantile_sketch_merge(
            grouped_quantile_sketch_build(
                a, "n_chars", "doc_id", ["source"], k=16
            ),
            grouped_quantile_sketch_build(
                b, "n_chars", "doc_id", ["source"], k=16
            ),
            # replay overlap must not double-sample
            grouped_quantile_sketch_build(
                b, "n_chars", "doc_id", ["source"], k=16
            ),
        )
        assert set(map(tuple, whole.collect())) == set(
            map(tuple, merged.collect())
        )

    def test_k_mismatch_fails_loud(self, spark):
        from s3_access_logs_spark.functions.quantile import (
            grouped_quantile_sketch_build,
            grouped_quantile_sketch_merge,
        )

        docs = self._docs(spark)
        with pytest.raises(ValueError, match="disagree on k"):
            grouped_quantile_sketch_merge(
                grouped_quantile_sketch_build(
                    docs, "n_chars", "doc_id", ["source"], k=8
                ),
                grouped_quantile_sketch_build(
                    docs, "n_chars", "doc_id", ["source"], k=16
                ),
            )

    def test_salted_phase_bounds_group_fanin(self, spark):
        from s3_access_logs_spark.functions.quantile import (
            grouped_quantile_sketch_build,
        )

        docs = self._docs(spark)
        sk = grouped_quantile_sketch_build(
            docs, "n_chars", "doc_id", ["source"], k=8, nsalts=4
        )
        plan = sk._jdf.queryExecution().executedPlan().toString()
        # two window phases: the first partitions on (group, pmod(h, n))
        # so no single task ever sorts a whole giant group
        assert plan.count("Window") >= 2 and "pmod" in plan
        # and the result is still exactly bottom-k per group
        import collections

        rows = sk.collect()
        per_group = collections.Counter(r["source"] for r in rows)
        assert all(c <= 8 for c in per_group.values())


class TestBigramLm:
    """CCNet-style perplexity-vs-reference quality scoring, UDF-free."""

    @staticmethod
    def _model(spark):
        from s3_access_logs_spark.functions.lm import train_bigram_lm
        from s3_access_logs_spark.sources.tables import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        return docs, train_bigram_lm(docs)

    def test_natural_text_beats_scrambled(self, spark):
        from s3_access_logs_spark.functions.lm import perplexity_score

        docs, model = self._model(spark)
        # scramble = sort each doc's words alphabetically: identical
        # unigram mass, destroyed bigram structure
        scrambled = docs.withColumn(
            "text",
            F.array_join(
                F.array_sort(F.split(F.lower("text"), r"\s+")), " "
            ),
        )
        real = perplexity_score(docs, model).agg(F.avg("xent")).first()[0]
        scr = perplexity_score(scrambled, model).agg(
            F.avg("xent")
        ).first()[0]
        assert real < scr

    def test_short_docs_null_oov_finite(self, spark):
        from s3_access_logs_spark.functions.lm import perplexity_score

        _, model = self._model(spark)
        probe = spark.createDataFrame(
            [
                (1, "oneword"),
                (2, ""),
                (3, "zzqx9 vvkk7 zzqx9 wwjj3"),  # all-OOV
            ],
            ["doc_id", "text"],
        )
        rows = {
            r["doc_id"]: r
            for r in perplexity_score(probe, model).collect()
        }
        assert rows[1]["ppl"] is None and rows[2]["ppl"] is None
        assert rows[3]["ppl"] is not None and rows[3]["ppl"] > 1.0

    def test_model_is_deterministic_and_bounded(self, spark):
        from s3_access_logs_spark.functions.lm import train_bigram_lm
        from s3_access_logs_spark.sources.tables import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        m1 = train_bigram_lm(docs, max_entries=64).collect()
        m2 = train_bigram_lm(docs, max_entries=64).collect()
        assert sorted(map(str, m1)) == sorted(map(str, m2))
        kinds = {}
        for r in m1:
            kinds[r["kind"]] = kinds.get(r["kind"], 0) + 1
        assert kinds["u"] <= 64 and kinds["b"] <= 64 and kinds["m"] == 2

    def test_score_plan_is_broadcast_only(self, spark):
        from s3_access_logs_spark.functions.lm import perplexity_score

        docs, model = self._model(spark)
        out = perplexity_score(docs, model)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        assert "Python" not in plan


class TestQualityClassifier:
    """Learned quality filter: hashed-BoW logistic regression (MLlib)."""

    @staticmethod
    def _seed(spark):
        from s3_access_logs_spark.sources.tables import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        # degenerate negatives from the same corpus: first word repeated
        # to the original length — same sources, destroyed content
        neg = docs.withColumn(
            "text",
            F.array_join(
                F.array_repeat(
                    F.element_at(F.split(F.lower("text"), r"\s+"), 1),
                    F.greatest(
                        F.size(F.split("text", r"\s+")), F.lit(1)
                    ),
                ),
                " ",
            ),
        )
        return docs, neg

    def test_separates_held_out(self, spark):
        from s3_access_logs_spark.operators.quality_classifier import (
            score_quality,
            train_quality_classifier,
        )

        docs, neg = self._seed(spark)
        train_pos = docs.filter(F.col("doc_id") % 2 == 0)
        train_neg = neg.filter(F.col("doc_id") % 2 == 0)
        model = train_quality_classifier(
            train_pos, train_neg, num_features=1 << 12, max_iter=20
        )
        held_pos = score_quality(
            docs.filter(F.col("doc_id") % 2 == 1), model
        )
        held_neg = score_quality(
            neg.filter(F.col("doc_id") % 2 == 1), model
        )
        acc_pos = held_pos.filter(F.col("quality_prob") > 0.5).count() / max(
            held_pos.count(), 1
        )
        acc_neg = held_neg.filter(F.col("quality_prob") < 0.5).count() / max(
            held_neg.count(), 1
        )
        assert acc_pos > 0.9 and acc_neg > 0.9

    def test_score_preserves_columns_no_shuffle(self, spark):
        from s3_access_logs_spark.operators.quality_classifier import (
            score_quality,
            train_quality_classifier,
        )

        docs, neg = self._seed(spark)
        model = train_quality_classifier(
            docs, neg, num_features=1 << 10, max_iter=5
        )
        out = score_quality(docs, model)
        assert set(out.columns) == set(docs.columns) | {"quality_prob"}
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # scoring is a narrow pass
        # r13: the training summary (which pins the live session into
        # scoring closures) is stripped from the returned model
        assert not model.stages[-1].hasSummary

    def test_model_roundtrips_to_disk(self, spark, tmp_path):
        from pyspark.ml import PipelineModel

        from s3_access_logs_spark.operators.quality_classifier import (
            score_quality,
            train_quality_classifier,
        )

        docs, neg = self._seed(spark)
        model = train_quality_classifier(
            docs, neg, num_features=1 << 10, max_iter=5
        )
        path = str(tmp_path / "clf")
        model.write().save(path)
        loaded = PipelineModel.load(path)
        a = score_quality(docs, model).select("doc_id", "quality_prob")
        b = score_quality(docs, loaded).select("doc_id", "quality_prob")
        assert sorted(map(tuple, a.collect())) == sorted(
            map(tuple, b.collect())
        )

    def test_summary_strip_failure_degrades_to_slower_not_broken(
        self, spark, monkeypatch
    ):
        """ADVICE r13 / VERDICT r13 item 8: the summary strip reaches a
        package-private JVM setter; if a Spark bump removes it, training
        must WARN and return a model that still scores (summary kept =
        slower closures), never raise."""
        import warnings as _w

        import s3_access_logs_spark.operators.quality_classifier as QC
        from s3_access_logs_spark.operators.quality_classifier import (
            score_quality,
            train_quality_classifier,
        )

        docs, neg = self._seed(spark)

        # simulate the Spark-bump failure at the isolated seam (fit()
        # itself must stay healthy — patching session internals breaks
        # pyspark far beyond the guard under test)
        def _gone(lr_model, sess):
            raise AttributeError("setSummary removed in this Spark")

        monkeypatch.setattr(QC, "_strip_summary", _gone)
        with _w.catch_warnings(record=True) as caught:
            _w.simplefilter("always")
            model = train_quality_classifier(
                docs, neg, num_features=1 << 10, max_iter=5
            )
        assert any(
            issubclass(w.category, RuntimeWarning)
            and "could not strip" in str(w.message)
            for w in caught
        )
        # degraded, not broken: the summary is kept and the model is
        # otherwise healthy. Scoring WITH the summary can legitimately
        # hit the documented "Task not serializable" when an earlier
        # test armed the session's ObservationManager (that hazard is
        # the very reason the strip exists), so prove health by
        # stripping through the restored real seam and scoring.
        assert model.stages[-1].hasSummary
        monkeypatch.undo()
        QC._strip_summary(model.stages[-1], spark)
        scored = score_quality(docs.limit(5), model)
        assert scored.filter(F.col("quality_prob").isNotNull()).count() == 5

    def test_difference_classifier_separates_and_is_deterministic(
        self, spark
    ):
        """Review r7 (VERDICT r6 item 1): the value-pinnable sibling of
        the L-BFGS path — integer-count training must be bit-identical
        under repartitioning (the property L-BFGS lacks), and it must
        still separate the held-out classes."""
        from s3_access_logs_spark.operators.quality_classifier import (
            score_difference_classifier,
            train_difference_classifier,
        )

        docs, _ = self._seed(spark)
        # vocabulary-shifted negatives (caesar-rotated spelling): the
        # difference model is a PRESENCE-based scorer, so its honest
        # test is distribution shift — the repeated-single-word
        # degeneracy of _seed's negatives is a token-COUNT signal that
        # only the L-BFGS intercept (or the rep_token_ratio heuristic
        # gate) captures, as the operator docstring documents
        neg = docs.withColumn(
            "text",
            F.translate(
                F.lower("text"),
                "abcdefghijklmnopqrstuvwxyz",
                "bcdefghijklmnopqrstuvwxyza",
            ),
        )
        train_pos = docs.filter(F.col("doc_id") % 2 == 0)
        train_neg = neg.filter(F.col("doc_id") % 2 == 0)
        w1 = train_difference_classifier(
            train_pos, train_neg, num_features=1 << 10
        )
        w2 = train_difference_classifier(
            train_pos.repartition(7),
            train_neg.repartition(3),
            num_features=1 << 10,
        )
        assert sorted(map(tuple, w1.collect())) == sorted(
            map(tuple, w2.collect())
        )
        held_pos = score_difference_classifier(
            docs.filter(F.col("doc_id") % 2 == 1), w1, num_features=1 << 10
        )
        held_neg = score_difference_classifier(
            neg.filter(F.col("doc_id") % 2 == 1), w1, num_features=1 << 10
        )
        acc_pos = held_pos.filter(F.col("logit") > 0).count() / max(
            held_pos.count(), 1
        )
        acc_neg = held_neg.filter(F.col("logit") < 0).count() / max(
            held_neg.count(), 1
        )
        assert acc_pos > 0.9 and acc_neg > 0.9
        # with a MATERIALIZED weights artifact (the deployment shape —
        # train once, persist, score many), scoring is a pure broadcast
        # pass: no join of any kind over the corpus, no corpus shuffle,
        # no Python; the only Exchange is the SinglePartition collapse
        # of the <= num_features-row weights into the map row
        frozen = spark.createDataFrame(w1.collect(), w1.schema)
        plan = (
            score_difference_classifier(
                docs, frozen, num_features=1 << 10
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "SortMergeJoin" not in plan
        assert "Python" not in plan
        assert "Exchange hashpartitioning" not in plan

    def test_difference_classifier_empty_class_raises(self, spark):
        from s3_access_logs_spark.operators.quality_classifier import (
            train_difference_classifier,
        )

        docs, _ = self._seed(spark)
        with pytest.raises(ValueError, match="non-empty"):
            train_difference_classifier(
                docs, docs.filter(F.lit(False)), num_features=1 << 10
            )


class TestIvfPqAppend:
    """Incremental growth of the compressed index — same contract as
    TestIvfAppend, plus artifact-compatibility semantics."""

    @staticmethod
    def _setup(spark, tmp_path):
        from s3_access_logs_spark.operators.similarity import (
            build_ivfpq_index,
            label_centroids,
            train_pq_codebook,
        )
        from s3_access_logs_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        mid = emb.agg(F.expr("percentile(vec_id, 0.5)")).first()[0]
        first = emb.filter(F.col("vec_id") <= mid)
        rest = emb.filter(F.col("vec_id") > mid)
        # both artifacts trained ONCE on the full corpus so the two
        # paths differ only in how rows reached the index
        cents = label_centroids(emb, "label", "embedding")
        cb = train_pq_codebook(emb, "embedding")
        grown = str(tmp_path / "grown")
        build_ivfpq_index(
            first, grown, centroids=cents, codebook=cb
        )
        return emb, first, rest, cents, cb, grown

    def test_append_equals_full_build(self, spark, tmp_path):
        from s3_access_logs_spark.operators.similarity import (
            append_to_ivfpq_index,
            build_ivfpq_index,
            probe_ivfpq_index,
        )

        emb, first, rest, cents, cb, grown = self._setup(spark, tmp_path)
        stats = append_to_ivfpq_index(spark, rest, grown, cents, cb)
        assert stats == {
            "appended": rest.count(), "skipped_existing": 0
        }
        full = str(tmp_path / "full")
        build_ivfpq_index(emb, full, centroids=cents, codebook=cb)
        queries = emb.filter(F.col("vec_id") < 4)
        got = probe_ivfpq_index(
            spark, grown, queries, cents, cb, k=5, nprobe=2
        )
        want = probe_ivfpq_index(
            spark, full, queries, cents, cb, k=5, nprobe=2
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
        # replay is a no-op
        stats = append_to_ivfpq_index(spark, rest, grown, cents, cb)
        assert stats == {
            "appended": 0, "skipped_existing": rest.count()
        }

    def test_missing_index_raises(self, spark, tmp_path):
        from s3_access_logs_spark.operators.similarity import (
            append_to_ivfpq_index,
            label_centroids,
            train_pq_codebook,
        )
        from s3_access_logs_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        cents = label_centroids(emb, "label", "embedding")
        cb = train_pq_codebook(emb, "embedding")
        with pytest.raises(ValueError, match="build_ivfpq_index first"):
            append_to_ivfpq_index(
                spark, emb, str(tmp_path / "void"), cents, cb
            )


class TestIvfIndexStats:
    def test_balance_report(self, spark, tmp_path):
        from s3_access_logs_spark.operators.similarity import (
            build_ivf_index,
            ivf_index_stats,
        )
        from s3_access_logs_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        dst = str(tmp_path / "ivf")
        build_ivf_index(emb, dst)
        stats = ivf_index_stats(spark, dst).collect()
        assert sum(r["n"] for r in stats) == emb.count()
        assert abs(sum(r["share"] for r in stats) - 1.0) < 1e-9
        mean = sum(r["n"] for r in stats) / len(stats)
        for r in stats:
            assert r["skew"] == pytest.approx(r["n"] / mean)
        # ordered heaviest-first
        ns = [r["n"] for r in stats]
        assert ns == sorted(ns, reverse=True)


class TestCurateCorpus:
    """The one-call composed pipeline: waterfall accounting must be
    exact and stages must reuse the tested single-purpose operators."""

    def _docs(self, spark):
        from s3_access_logs_spark.sources.tables import load_table

        return load_table(spark, "/root/testdata/sf0.001", "documents")

    def test_accounting_is_exact(self, spark):
        from s3_access_logs_spark.operators.curate import curate_corpus

        docs = self._docs(spark)
        survivors, report = curate_corpus(
            docs, min_quality=0.5, langs=("en",)
        )
        n_in = docs.count()
        n_kept = survivors.count()
        dropped = {r["stage"]: r["dropped"] for r in report.collect()}
        assert n_kept + sum(dropped.values()) == n_in
        assert set(dropped) <= {"exact_dup", "quality", "language"}
        assert set(survivors.columns) == set(docs.columns)

    def test_waterfall_attributes_first_stage(self, spark):
        from s3_access_logs_spark.operators.curate import curate_corpus

        # one doc that is BOTH a duplicate and low-quality must count
        # against exact_dup only
        df = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog today", "en", "a", 49),
                (2, "the quick brown fox jumps over the lazy dog today", "en", "a", 49),
                (3, "zz zz zz", "xx", "a", 8),
            ],
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        survivors, report = curate_corpus(df, min_quality=0.5)
        dropped = {r["stage"]: r["dropped"] for r in report.collect()}
        assert dropped.get("exact_dup") == 1
        assert dropped.get("quality", 0) >= 1
        assert {r["doc_id"] for r in survivors.collect()} == {1}

    def test_duplicate_ids_fail_loud(self, spark):
        """VERDICT r8 item 6: doc_id uniqueness was a documented-but-
        unchecked schema contract — a duplicate-id corpus silently
        corrupted join-backs and waterfall counts. Now it raises at
        entry; NULL ids stay exempt (their handling is the documented
        per-consumer contract the dirty sweeps pin); and the flag opts
        perf-critical callers out."""
        from s3_access_logs_spark.operators.curate import curate_corpus

        dup = spark.createDataFrame(
            [
                (1, "first body of text here", "en", "a", 23),
                (1, "a DIFFERENT body under the same id", "en", "a", 34),
                (2, "an honest unique document", "en", "a", 25),
            ],
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        with pytest.raises(ValueError, match="duplicate doc_id"):
            curate_corpus(dup, min_quality=0.5)
        # opt-out still runs (key enforced upstream is the caller's call)
        survivors, _ = curate_corpus(
            dup, min_quality=0.5, verify_unique_ids=False
        )
        assert survivors.count() > 0
        # multiple NULL ids are NOT a uniqueness violation
        nulls = spark.createDataFrame(
            [
                (None, "null id doc one with words", "en", "a", 26),
                (None, "null id doc two with words", "en", "a", 26),
                (7, "a unique one", "en", "a", 12),
            ],
            "doc_id bigint, text string, lang string, source string, "
            "n_chars bigint",
        )
        survivors, _ = curate_corpus(nulls)
        assert survivors.count() == 3

    def test_optional_stages_compose(self, spark):
        from s3_access_logs_spark.functions.lm import train_bigram_lm
        from s3_access_logs_spark.operators.curate import curate_corpus

        docs = self._docs(spark)
        model = train_bigram_lm(docs)
        bench = docs.filter(F.col("doc_id") % 97 == 0)
        survivors, report = curate_corpus(
            docs,
            lm_model=model,
            max_xent=20.0,
            near_dup=True,
            benchmark=bench,
            max_overlap=0.8,
        )
        n_in = docs.count()
        dropped = {r["stage"]: r["dropped"] for r in report.collect()}
        assert survivors.count() + sum(dropped.values()) == n_in
        # the benchmark docs themselves overlap 100% -> contaminated
        # (unless already gone at an earlier stage)
        assert dropped.get("contaminated", 0) >= 1


class TestScriptProfile:
    """Unicode-script histogram + dominant-script routing signal."""

    def test_profiles_and_dominance(self, spark):
        from s3_access_logs_spark.functions.text import (
            dominant_script,
            script_profile,
        )

        df = spark.createDataFrame(
            [
                (1, "hello plain english text"),
                (2, "Привет мир это русский текст"),
                (3, "日本語のテキストです"),          # Han+Hiragana mix
                (4, "abc абв αβγ"),  # 1/3 latin, 1/3 cyrillic, 1/3 greek
                (5, "12345 !!! ..."),
            ],
            ["i", "t"],
        )
        rows = {
            r["i"]: r
            for r in df.select(
                "i",
                script_profile("t").alias("p"),
                dominant_script("t").alias("d"),
            ).collect()
        }
        assert rows[1]["p"]["latin"] == 1.0 and rows[1]["d"] == "latin"
        assert rows[2]["p"]["cyrillic"] == 1.0 and rows[2]["d"] == "cyrillic"
        # Japanese: han+hiragana+katakana together cover everything
        jp = rows[3]["p"]
        assert jp["han"] + jp["hiragana"] + jp["katakana"] == 1.0
        assert rows[3]["d"] == "mixed" or rows[3]["d"] in (
            "hiragana", "katakana", "han"
        )
        assert rows[4]["d"] == "mixed"
        assert rows[5]["d"] == "none"
        # fractions, not counts: every value in [0, 1]
        for r in rows.values():
            for v in r["p"].values():
                assert 0.0 <= v <= 1.0

    def test_homoglyph_salting_is_visible(self, spark):
        from s3_access_logs_spark.functions.text import script_profile

        # Latin text with Cyrillic homoglyph 'о' substituted in
        df = spark.createDataFrame(
            [("wоrd wоrk bоok lооk",)], ["t"]
        )
        [r] = df.select(script_profile("t").alias("p")).collect()
        assert 0.2 < r["p"]["cyrillic"] < 0.5
        assert r["p"]["latin"] < 0.8

    def test_plan_is_pure_projection(self, spark):
        from s3_access_logs_spark.functions.text import dominant_script
        from s3_access_logs_spark.sources.tables import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        out = docs.select("doc_id", dominant_script("text").alias("d"))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Python" not in plan


class TestRandomProjection:
    """JL reduction: deterministic planes, bounded distance distortion."""

    def test_norm_and_distance_preservation(self, spark):
        from s3_access_logs_spark.functions.vectors import l2_distance
        from s3_access_logs_spark.operators.similarity import (
            random_projection,
        )
        from s3_access_logs_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        proj = random_projection(emb, dims=64, out_dims=32)
        # expected-norm preservation: mean ratio of projected to
        # original squared norm near 1 (unbiased estimator)
        sq = lambda c: F.aggregate(
            F.transform(c, lambda x: x.cast("double")),
            F.lit(0.0),
            lambda a, x: a + x * x,
        )
        ratio = proj.select(
            (sq(F.col("projection")) / sq(F.col("embedding"))).alias("r")
        ).agg(F.avg("r")).first()[0]
        assert 0.8 < ratio < 1.2
        # pairwise distances on a sample concentrate around truth
        a = proj.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("ia"),
            F.col("embedding").alias("ea"),
            F.col("projection").alias("pa"),
        )
        b = proj.filter((F.col("vec_id") >= 10) & (F.col("vec_id") < 20)).select(
            F.col("vec_id").alias("ib"),
            F.col("embedding").alias("eb"),
            F.col("projection").alias("pb"),
        )
        pairs = a.crossJoin(b).select(
            l2_distance("ea", "eb").alias("d"),
            l2_distance("pa", "pb").alias("dp"),
        ).collect()
        mean_ratio = sum(r["dp"] / r["d"] for r in pairs) / len(pairs)
        assert 0.75 < mean_ratio < 1.25

    def test_deterministic_and_narrow(self, spark):
        from s3_access_logs_spark.operators.similarity import (
            random_projection,
        )
        from s3_access_logs_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        p1 = random_projection(emb, out_dims=8).select("vec_id", "projection")
        p2 = random_projection(emb, out_dims=8).select("vec_id", "projection")
        assert sorted(map(str, p1.collect())) == sorted(map(str, p2.collect()))
        plan = p1._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan.replace(
            "BroadcastExchange", ""
        ) and "Python" not in plan

    def test_validation(self, spark):
        from s3_access_logs_spark.operators.similarity import (
            random_projection,
        )
        from s3_access_logs_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        with pytest.raises(ValueError, match="out_dims"):
            random_projection(emb, out_dims=0)


class TestStripHtml:
    def test_strips_blocks_tags_entities(self, spark):
        from s3_access_logs_spark.functions.text import strip_html

        df = spark.createDataFrame(
            [
                (1, "<html><head><style>p{color:red}</style>"
                    "<script>var x=1;\nalert(x)</script></head>"
                    "<body><!-- note -->\n<p>Tom &amp; Jerry say "
                    "&quot;hi&quot;</p>&nbsp;<br/>next&#39;s line</body>"),
                (2, "no markup at all"),
                (3, "escaped entity shown: &amp;lt; stays literal"),
                (4, None),
            ],
            ["i", "t"],
        )
        rows = {
            r["i"]: r[1]
            for r in df.select("i", strip_html("t")).collect()
        }
        # block tags (<p>, <br/>) become newlines — line structure is
        # what the line-wise cleaners key on
        assert rows[1] == 'Tom & Jerry say "hi"\nnext\'s line'
        assert rows[2] == "no markup at all"
        # single decode only: the page DISPLAYED "&lt;", keep it
        assert rows[3] == "escaped entity shown: &lt; stays literal"
        assert rows[4] is None

    def test_unclosed_tag_cannot_eat_document(self, spark):
        from s3_access_logs_spark.functions.text import strip_html

        df = spark.createDataFrame(
            [("before < after and more text",)], ["t"]
        )
        [r] = df.select(strip_html("t")).collect()
        # a bare '<' with no closing '>' is not a tag match
        assert "after and more text" in r[0]


class TestCurateScriptGate:
    def test_script_gate_waterfall(self, spark):
        from s3_access_logs_spark.operators.curate import curate_corpus

        df = spark.createDataFrame(
            [
                (1, "plain latin text that is long enough to keep going"),
                (2, "Привет мир это русский текст для проверки скрипта"),
            ],
            ["doc_id", "text"],
        )
        survivors, report = curate_corpus(df, scripts=("latin",))
        assert {r["doc_id"] for r in survivors.collect()} == {1}
        dropped = {r["stage"]: r["dropped"] for r in report.collect()}
        assert dropped == {"script": 1}


class TestWeightedSample:
    """Efraimidis-Spirakis deterministic weighted sampling."""

    def test_exact_k_and_determinism(self, spark):
        from s3_access_logs_spark.operators.sampling import weighted_sample

        df = spark.createDataFrame(
            [(i, 1.0 + (i % 7)) for i in range(500)], ["id", "w"]
        )
        s1 = weighted_sample(df, 50, "w", "id")
        s2 = weighted_sample(df, 50, "w", "id")
        assert s1.count() == 50
        assert sorted(r["id"] for r in s1.collect()) == sorted(
            r["id"] for r in s2.collect()
        )
        # a fresh salt is a different draw
        s3 = weighted_sample(df, 50, "w", "id", salt="wsample1:")
        assert sorted(r["id"] for r in s3.collect()) != sorted(
            r["id"] for r in s1.collect()
        )

    def test_weight_proportionality(self, spark):
        from s3_access_logs_spark.operators.sampling import weighted_sample

        # 1000 light rows (w=1) + 1000 heavy rows (w=10): in a k=400
        # sample the heavy class must dominate roughly 10:1 per item
        rows = [(i, 1.0) for i in range(1000)] + [
            (1000 + i, 10.0) for i in range(1000)
        ]
        df = spark.createDataFrame(rows, ["id", "w"])
        got = weighted_sample(df, 400, "w", "id").collect()
        heavy = sum(1 for r in got if r["id"] >= 1000)
        # expected ~364 heavy (inclusion odds under A-ES); wide band
        assert 300 <= heavy <= 400

    def test_grouped_and_filters_bad_weights(self, spark):
        from s3_access_logs_spark.operators.sampling import weighted_sample

        rows = (
            [(i, "a", 1.0) for i in range(100)]
            + [(100 + i, "b", 1.0) for i in range(5)]
            + [(990, "a", None), (991, "a", -3.0), (992, "a", 0.0)]
        )
        df = spark.createDataFrame(rows, ["id", "g", "w"])
        got = weighted_sample(df, 10, "w", "id", group_cols=["g"]).collect()
        by_g = {}
        for r in got:
            by_g.setdefault(r["g"], []).append(r["id"])
        assert len(by_g["a"]) == 10
        assert len(by_g["b"]) == 5  # smaller population -> all of it
        assert all(i < 990 for i in by_g["a"])  # bad weights excluded

    def test_two_phase_plan(self, spark):
        from s3_access_logs_spark.operators.sampling import weighted_sample

        df = spark.createDataFrame(
            [(i, 1.0) for i in range(100)], ["id", "w"]
        )
        out = weighted_sample(df, 5, "w", "id", nsalts=4)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Window") >= 2 and "pmod" in plan


class TestContainmentPairs:
    """Asymmetric containment: the subset-dup signal Jaccard misses."""

    def test_embedded_doc_found_jaccard_blind(self, spark):
        from s3_access_logs_spark.operators.dedup import (
            containment_pairs,
            jaccard_pairs,
        )

        short = "alpha beta gamma delta epsilon zeta eta theta"
        filler = " ".join(f"word{i} note{i} item{i}" for i in range(60))
        df = spark.createDataFrame(
            [
                (1, short),
                (2, filler + " " + short + " " + filler),
                (3, "completely different content about other things"),
            ],
            ["doc_id", "text"],
        )
        cont = containment_pairs(df, threshold=0.8).collect()
        assert len(cont) == 1
        [r] = cont
        assert {r["id_a"], r["id_b"]} == {1, 2}
        assert r["containment"] >= 0.8
        # removal policy drops the smaller (embedded) side
        assert r["contained_id"] == 1
        # symmetric jaccard at the same bar sees nothing
        assert (
            jaccard_pairs(df, threshold=0.8)
            .filter(
                (F.col("id_a").isin(1, 2)) & (F.col("id_b").isin(1, 2))
            )
            .count()
            == 0
        )

    def test_jaccard_refactor_unchanged(self, spark):
        # the shared-core refactor must not perturb jaccard_pairs: the
        # catalog query's oracle pins exact values at sf0.01; here pin
        # the plan is still join-free and one value spot-checks
        from s3_access_logs_spark.operators.dedup import jaccard_pairs
        from s3_access_logs_spark.sources.tables import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        out = jaccard_pairs(docs, threshold=0.5)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan
        assert out.columns == ["id_a", "id_b", "n_inter", "jaccard"]


class TestCurateContainedStage:
    def test_embedded_doc_dropped_superset_kept(self, spark):
        from s3_access_logs_spark.operators.curate import curate_corpus

        short = "alpha beta gamma delta epsilon zeta eta theta"
        filler = " ".join(f"word{i} note{i} item{i}" for i in range(60))
        df = spark.createDataFrame(
            [
                (1, short),
                (2, filler + " " + short + " " + filler),
                (3, "completely different content about other things"),
            ],
            ["doc_id", "text"],
        )
        survivors, report = curate_corpus(df, drop_contained=True)
        assert {r["doc_id"] for r in survivors.collect()} == {2, 3}
        dropped = {r["stage"]: r["dropped"] for r in report.collect()}
        assert dropped == {"contained": 1}


class TestCurateEmptyGate:
    def test_null_and_blank_text_cannot_slip_through(self, spark):
        from s3_access_logs_spark.operators.curate import curate_corpus

        df = spark.createDataFrame(
            [
                (1, "a real document with enough text to keep around"),
                (2, None),
                (3, "   "),
                (4, ""),
            ],
            ["doc_id", "text"],
        )
        # no optional gates at all — the permissive configuration where
        # NULLs previously had nothing to stop them
        survivors, report = curate_corpus(df)
        assert {r["doc_id"] for r in survivors.collect()} == {1}
        dropped = {r["stage"]: r["dropped"] for r in report.collect()}
        assert dropped == {"empty": 3}


class TestDropBoilerplateLines:
    """Cross-document furniture removal (cookie banners, nav, footers)."""

    def test_furniture_cut_content_kept(self, spark):
        from s3_access_logs_spark.operators.dedup import (
            drop_boilerplate_lines,
        )

        banner = "Accept all cookies"
        footer = "(c) 2026 Example Site"
        rows = [
            (i, f"{banner}\nunique article {i} body text\n{footer}")
            for i in range(10)
        ] + [(99, "indented variant doc\n  " + banner + "  \nmore text")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {
            r["doc_id"]: r["text"]
            for r in drop_boilerplate_lines(df, min_docs=5).collect()
        }
        assert got[0] == "unique article 0 body text"
        # trimmed matching: the indented banner variant dies too
        assert got[99] == "indented variant doc\nmore text"
        assert all(banner not in t and footer not in t for t in got.values())

    def test_self_repetition_does_not_promote(self, spark):
        from s3_access_logs_spark.operators.dedup import (
            drop_boilerplate_lines,
        )

        spammy = "\n".join(["repeat me"] * 50) + "\nreal content"
        df = spark.createDataFrame(
            [(1, spammy), (2, "other text entirely")],
            ["doc_id", "text"],
        )
        got = {
            r["doc_id"]: r["text"]
            for r in drop_boilerplate_lines(df, min_docs=5).collect()
        }
        # one doc repeating its own line 50x: count_distinct(doc)=1 < 5
        assert "repeat me" in got[1]

    def test_null_and_all_boilerplate_docs(self, spark):
        from s3_access_logs_spark.operators.dedup import (
            drop_boilerplate_lines,
        )

        rows = [(i, "only banner line") for i in range(6)] + [(9, None)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {
            r["doc_id"]: r["text"]
            for r in drop_boilerplate_lines(df, min_docs=5).collect()
        }
        assert got[0] == ""   # everything was furniture
        assert got[9] is None  # NULL stays NULL


class TestCleanLines:
    def test_filters_and_ratio(self, spark):
        from s3_access_logs_spark.functions.text import (
            clean_lines,
            line_kept_ratio,
        )

        doc = "\n".join(
            [
                "A perfectly normal prose line here.",
                "OK",                        # too short
                "CLICK HERE TO SUBSCRIBE NOW",  # shouty
                "12:34 2026-01-01 99%",      # numeric-only
                "Another good sentence follows the noise.",
                "NASA and IBM are fine in prose.",  # acronyms in prose
            ]
        )
        df = spark.createDataFrame([(1, doc), (2, None)], ["i", "t"])
        rows = {
            r["i"]: r
            for r in df.select(
                "i",
                clean_lines("t").alias("c"),
                F.round(line_kept_ratio("t"), 4).alias("r"),
            ).collect()
        }
        assert rows[1]["c"] == "\n".join(
            [
                "A perfectly normal prose line here.",
                "Another good sentence follows the noise.",
                "NASA and IBM are fine in prose.",
            ]
        )
        assert rows[1]["r"] == 0.5
        assert rows[2]["c"] is None and rows[2]["r"] is None

    def test_sentence_split(self, spark):
        from s3_access_logs_spark.functions.text import sentence_split

        df = spark.createDataFrame(
            [("First one. Second two! Third three? tail",)], ["t"]
        )
        [r] = df.select(sentence_split("t")).collect()
        assert r[0] == [
            "First one.", "Second two!", "Third three?", "tail"
        ]

    def test_pure_projection(self, spark):
        from s3_access_logs_spark.functions.text import clean_lines
        from s3_access_logs_spark.sources.tables import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        out = docs.select("doc_id", clean_lines("text").alias("c"))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Python" not in plan


class TestSentenceChunks:
    def test_packs_at_boundaries(self, spark):
        from s3_access_logs_spark.functions.text import sentence_chunks

        # sentences of 4, 4, 4, 2 tokens; budget 8 -> [s1 s2], [s3 s4]
        doc = "one two three four. five six seven eight. a b c d. y z."
        df = spark.createDataFrame([(doc,)], ["t"])
        [r] = df.select(sentence_chunks("t", max_tokens=8)).collect()
        assert r[0] == [
            "one two three four. five six seven eight.",
            "a b c d. y z.",
        ]
        # every chunk within budget, no sentence split across chunks
        for ch in r[0]:
            assert len(ch.split()) <= 8

    def test_overlong_sentence_owns_a_chunk(self, spark):
        from s3_access_logs_spark.functions.text import sentence_chunks

        doc = "short one. " + " ".join(f"w{i}" for i in range(20)) + ". tail two."
        df = spark.createDataFrame([(doc,)], ["t"])
        [r] = df.select(sentence_chunks("t", max_tokens=5)).collect()
        chunks = r[0]
        assert chunks[0] == "short one."
        assert len(chunks[1].split()) == 20  # over budget but intact
        assert chunks[2] == "tail two."

    def test_null_and_blank(self, spark):
        from s3_access_logs_spark.functions.text import sentence_chunks

        df = spark.createDataFrame([(1, None), (2, "   ")], ["i", "t"])
        rows = {
            r["i"]: r[1]
            for r in df.select("i", sentence_chunks("t")).collect()
        }
        assert rows[1] is None and rows[2] == []


class TestReviewFixesR4b:
    """Regression pins for the round-4 second review pass."""

    def test_deep_host_cannot_evade_blocklist(self, spark):
        from s3_access_logs_spark.functions.url import (
            domain_blocklist_filter,
            host_suffixes,
        )

        deep = ".".join(f"s{i}" for i in range(12)) + ".example.com"
        df = spark.createDataFrame(
            [(1, f"https://{deep}/x"), (2, "https://fine.org")],
            ["doc_id", "url"],
        )
        hit = domain_blocklist_filter(
            df, "url", ["example.com"], "doc_id", keep="blocked"
        )
        # 14 labels > max_labels: the SHORT suffixes must still be
        # enumerated or nesting subdomains evades the list
        assert {r.doc_id for r in hit.collect()} == {1}
        [r] = spark.createDataFrame([(deep,)], ["h"]).select(
            host_suffixes("h")
        ).collect()
        assert "example.com" in r[0] and r[0][0] == deep

    def test_classifier_null_text_scores_not_crashes(self, spark):
        from s3_access_logs_spark.operators.quality_classifier import (
            score_quality,
            train_quality_classifier,
        )

        pos = spark.createDataFrame(
            [(1, "good clean prose here"), (2, None)], ["doc_id", "text"]
        )
        neg = spark.createDataFrame(
            [(3, "spam spam spam spam"), (4, None)], ["doc_id", "text"]
        )
        model = train_quality_classifier(
            pos, neg, num_features=1 << 8, max_iter=3
        )
        out = score_quality(pos, model).collect()
        assert len(out) == 2  # NULL row scored (as empty doc), no NPE

    def test_near_dup_keeper_interplay(self, spark):
        from s3_access_logs_spark.operators.curate import curate_corpus

        # A (min id) is a near-dup of B but fails the quality gate; B
        # must survive as the cluster's representative, not vanish
        base = (
            "the quick brown fox jumps over the lazy dog and keeps "
            "running through the quiet forest toward the river bank "
            "where it finally rests for the evening hours"
        )
        # doc 1 (min id) = base plus a long repeated-word tail: shingle
        # set ~= base's (near-dup of 2, jaccard ~0.86) but diversity and
        # stopword ratio collapse -> quality ~0.52, under the 0.6 bar
        # that base itself (~0.70) clears
        df = spark.createDataFrame(
            [
                (1, base + " spam" * 120),
                (2, base),
                (3, "entirely different content on another topic"),
            ],
            ["doc_id", "text"],
        )
        survivors, report = curate_corpus(
            df, min_quality=0.6, near_dup=True
        )
        kept = {r["doc_id"] for r in survivors.collect()}
        assert 2 in kept  # the good copy survives
        dropped = {r["stage"]: r["dropped"] for r in report.collect()}
        assert dropped.get("quality", 0) >= 1
        assert dropped.get("near_dup", 0) == 0

    def test_lam_one_rejected(self, spark):
        from s3_access_logs_spark.functions.lm import (
            perplexity_score,
            train_bigram_lm,
        )
        from s3_access_logs_spark.sources.tables import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        model = train_bigram_lm(docs, max_entries=32)
        with pytest.raises(ValueError, match="lam"):
            perplexity_score(docs, model, lam=1.0)

    def test_fold_store_rejects_unknown_flags(self, spark, tmp_path):
        from s3_access_logs_spark.cli import run_fold_store

        assert run_fold_store(
            [str(tmp_path / "s"), "--keep_recent", "0"]
        ) == 2
        assert run_fold_store([str(tmp_path / "s"), "extra"]) == 2


class TestCurateTransformStages:
    def test_html_line_clean_and_ratio_gate(self, spark):
        from s3_access_logs_spark.operators.curate import curate_corpus

        good = "\n".join(
            [
                "A normal prose line with enough words here.",
                "Another good line of article content follows.",
                "And one further sentence completes the body.",
            ]
        )
        furniture_page = "\n".join(
            ["OK", "CLICK HERE NOW", "12:45", "99%",
             "One real line of text."]
        )
        df = spark.createDataFrame(
            [
                (1, "<p>" + good.replace("\n", "</p>\n<p>") + "</p>"),
                (2, furniture_page),
                (3, "<script>var x=1</script>"),
            ],
            ["doc_id", "text"],
        )
        survivors, report = curate_corpus(
            df, html=True, line_clean=True, min_line_ratio=0.5
        )
        rows = {r["doc_id"]: r["text"] for r in survivors.collect()}
        # doc1 survives with markup gone and lines intact
        assert set(rows) == {1}
        assert "<p>" not in rows[1] and "prose line" in rows[1]
        dropped = {r["stage"]: r["dropped"] for r in report.collect()}
        # doc2: only 1/5 lines kept -> line_ratio; doc3: stripped to
        # nothing -> empty
        assert dropped == {"empty": 1, "line_ratio": 1}

    def test_min_line_ratio_requires_line_clean(self, spark):
        from s3_access_logs_spark.operators.curate import curate_corpus

        df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
        with pytest.raises(ValueError, match="line_clean"):
            curate_corpus(df, min_line_ratio=0.5)


class TestCurateDstPath:
    def test_written_survivors_match_lazy(self, spark, tmp_path):
        from s3_access_logs_spark.operators.curate import curate_corpus
        from s3_access_logs_spark.sources.tables import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        lazy_surv, lazy_rep = curate_corpus(
            docs, min_quality=0.5, langs=("en",)
        )
        dst = str(tmp_path / "curated")
        w_surv, w_rep = curate_corpus(
            docs, min_quality=0.5, langs=("en",), dst=dst
        )
        # written path returns the re-read: plan is a bare scan of dst
        plan = w_surv._jdf.queryExecution().executedPlan().toString()
        assert "FileScan parquet" in plan and "Window" not in plan
        assert sorted(
            map(tuple, lazy_surv.select("doc_id").collect())
        ) == sorted(map(tuple, w_surv.select("doc_id").collect()))
        assert sorted(map(tuple, lazy_rep.collect())) == sorted(
            map(tuple, w_rep.collect())
        )


class TestHammingIncremental:
    """The store-probe primitive behind streaming perceptual dedup."""

    def test_probe_and_band_contract(self, spark):
        from s3_access_logs_spark.operators.dedup import (
            fingerprint_bands,
            hamming_incremental,
        )

        def words(fp):
            return fp & 0xFFFFFFFF, (fp >> 32) & 0xFFFFFFFF

        seen_fp = spark.createDataFrame(
            [(1, *words(0xDEADBEEFCAFEF00D))], "id long, w0 long, w1 long"
        )
        store = fingerprint_bands(seen_fp)
        batch = spark.createDataFrame(
            [
                (10, *words(0xDEADBEEFCAFEF00D)),           # hamming 0
                (11, *words(0xDEADBEEFCAFEF00D ^ 0b101)),   # hamming 2
                (12, *words(0xDEADBEEFCAFEF00D ^ ((1 << 50) | 1))),  # h=2
                (13, *words(0x0123456789ABCDEF)),           # far away
            ],
            "id long, w0 long, w1 long",
        )
        hits, bands = hamming_incremental(batch, store, max_hamming=3)
        got = {
            (r["new_id"], r["seen_id"]): r["hamming"]
            for r in hits.collect()
        }
        assert got == {(10, 1): 0, (11, 1): 2, (12, 1): 2}
        # new_bands: chunks rows per fingerprint, words carried
        rows = bands.collect()
        assert len(rows) == 4 * 4
        assert {r["id"] for r in rows} == {10, 11, 12, 13}
        assert all("w0" in r and "chunk_val" in r for r in
                   (row.asDict() for row in rows))

    def test_empty_store_no_hits(self, spark):
        from s3_access_logs_spark.operators.dedup import (
            hamming_incremental,
        )

        batch = spark.createDataFrame(
            [(1, 5, 9)], "id long, w0 long, w1 long"
        )
        empty = spark.createDataFrame(
            [], "id long, w0 long, w1 long, chunk_idx int, chunk_val long"
        )
        hits, bands = hamming_incremental(batch, empty)
        assert hits.count() == 0 and bands.count() == 4


class TestKmvStore:
    """Persistable KMV distinct sketch: exact below k, mergeable above."""

    def test_exact_below_k_and_accurate_above(self, spark):
        from s3_access_logs_spark.functions.kmv import (
            kmv_build,
            kmv_estimate,
        )

        small = spark.range(100).select(F.col("id").alias("v"))
        assert kmv_estimate(kmv_build(small, "v", k=256)) == 100.0
        big = spark.range(50_000).select(F.col("id").alias("v"))
        est = kmv_estimate(kmv_build(big, "v", k=1024))
        assert abs(est - 50_000) / 50_000 < 0.10  # ~1/sqrt(k) error

    def test_merge_equals_whole_with_overlap(self, spark):
        from s3_access_logs_spark.functions.kmv import (
            kmv_build,
            kmv_estimate,
            kmv_merge,
        )

        a = spark.range(0, 6000).select(F.col("id").alias("v"))
        b = spark.range(4000, 10_000).select(F.col("id").alias("v"))
        merged = kmv_merge(
            kmv_build(a, "v", k=512), kmv_build(b, "v", k=512)
        )
        whole = kmv_build(
            spark.range(10_000).select(F.col("id").alias("v")), "v", k=512
        )
        assert sorted(r["u"] for r in merged.collect()) == sorted(
            r["u"] for r in whole.collect()
        )
        # overlap (4000-5999 in both) must not inflate the estimate
        est = kmv_estimate(merged)
        assert abs(est - 10_000) / 10_000 < 0.15

    def test_batch_store_pattern(self, spark, tmp_path):
        from s3_access_logs_spark.functions.kmv import (
            kmv_build,
            kmv_estimate,
            kmv_merge,
        )

        store = str(tmp_path / "kmv")
        for b in range(3):
            batch = spark.range(b * 3000, (b + 1) * 3000).select(
                F.col("id").alias("v")
            )
            (
                kmv_build(batch, "v", k=512)
                .withColumn("batch_id", F.lit(b))
                .write.mode("append")
                .partitionBy("batch_id")
                .parquet(store)
            )
        est = kmv_estimate(
            kmv_merge(spark.read.parquet(store).select("u"))
        )
        assert abs(est - 9000) / 9000 < 0.15

    def test_k_mismatch_and_meta_loud(self, spark):
        from s3_access_logs_spark.functions.kmv import (
            kmv_build,
            kmv_estimate,
            kmv_merge,
        )

        df = spark.range(100).select(F.col("id").alias("v"))
        with pytest.raises(ValueError, match="disagree on k"):
            kmv_merge(kmv_build(df, "v", k=64), kmv_build(df, "v", k=128))
        with pytest.raises(ValueError, match="meta row"):
            kmv_estimate(
                kmv_build(df, "v", k=64).filter(F.col("u") >= 0)
            )


class TestKmvReviewFixes:
    def test_estimate_on_raw_union_equals_merge(self, spark):
        from s3_access_logs_spark.functions.kmv import (
            kmv_build,
            kmv_estimate,
            kmv_merge,
        )

        a = spark.range(0, 6000).select(F.col("id").alias("v"))
        b = spark.range(4000, 10_000).select(F.col("id").alias("v"))
        sa, sb = kmv_build(a, "v", k=512), kmv_build(b, "v", k=512)
        raw_union = sa.unionByName(sb)  # store read without kmv_merge
        assert kmv_estimate(raw_union) == kmv_estimate(
            kmv_merge(sa, sb)
        )

    def test_merge_missing_meta_message(self, spark):
        from s3_access_logs_spark.functions.kmv import kmv_build, kmv_merge

        df = spark.range(100).select(F.col("id").alias("v"))
        with pytest.raises(ValueError, match="no meta row"):
            kmv_merge(kmv_build(df, "v", k=64).filter(F.col("u") >= 0))


class TestReviewFixesR4c:
    """Regression pins for the high-effort review pass."""

    def test_contaminated_superset_spares_clean_subset(self, spark):
        from s3_access_logs_spark.operators.curate import curate_corpus

        article = (
            "a long article body with many distinct words that keeps "
            "going for quite a while across several sentences here"
        )
        bench_text = "benchmark question answer pair xyzzy qwerty"
        df = spark.createDataFrame(
            [
                # id 1 = article + benchmark text (superset, contaminated)
                (1, article + " " + bench_text + " " + bench_text),
                # id 2 = the clean article alone (contained subset)
                (2, article),
            ],
            ["doc_id", "text"],
        )
        bench = spark.createDataFrame([(1, bench_text)], ["doc_id", "text"])
        survivors, report = curate_corpus(
            df, drop_contained=True, benchmark=bench, max_overlap=0.1
        )
        kept = {r["doc_id"] for r in survivors.collect()}
        # the clean subset must survive the contaminated superset
        assert kept == {2}
        dropped = {r["stage"]: r["dropped"] for r in report.collect()}
        assert dropped == {"contaminated": 1}

    def test_dominant_script_null_in_null_out(self, spark):
        from s3_access_logs_spark.functions.text import dominant_script

        df = spark.createDataFrame([(1, None), (2, "abc")], ["i", "t"])
        rows = {
            r["i"]: r[1]
            for r in df.select("i", dominant_script("t")).collect()
        }
        assert rows[1] is None and rows[2] == "latin"

    def test_lm_empty_corpus_fails_loud(self, spark):
        from s3_access_logs_spark.functions.lm import (
            perplexity_score,
            train_bigram_lm,
        )

        empty = spark.createDataFrame(
            [(1, None), (2, "   ")], ["doc_id", "text"]
        )
        model = train_bigram_lm(empty)
        probe = spark.createDataFrame([(1, "some text")], ["doc_id", "text"])
        with pytest.raises(ValueError, match="no tokens"):
            perplexity_score(probe, model)

    def test_random_projection_dims_mismatch_raises(self, spark):
        from s3_access_logs_spark.operators.similarity import (
            random_projection,
        )

        df = spark.createDataFrame(
            [(1, [1.0, 2.0, 3.0])], "id long, embedding array<double>"
        )
        out = random_projection(df, dims=64, out_dims=4)
        with pytest.raises(Exception, match="dims=64 but vector has"):
            out.collect()

    def test_hamming_incremental_band_cap(self, spark):
        from s3_access_logs_spark.operators.dedup import (
            fingerprint_bands,
            hamming_incremental,
        )

        # a degenerate store: many distinct fingerprints that all share
        # chunk 0 (low 16 bits identical) — the hot bucket
        seen = spark.createDataFrame(
            [(i, 0xBEEF, i) for i in range(50)],
            "id long, w0 long, w1 long",
        )
        store = fingerprint_bands(seen)
        probe = spark.createDataFrame(
            [(999, 0xBEEF, 7)], "id long, w0 long, w1 long"
        )
        # uncapped: the probe pairs with the whole hot bucket's matches
        hits_all, _ = hamming_incremental(
            probe, store, max_hamming=64, max_band_freq=None
        )
        n_all = hits_all.count()
        assert n_all == 50
        # capped at 10: the hot chunk-0 bucket drops; only candidates
        # via the OTHER chunks remain (w1=7 matches seen id=7 exactly)
        hits_cap, _ = hamming_incremental(
            probe, store, max_hamming=64, max_band_freq=10
        )
        ids = {r["seen_id"] for r in hits_cap.collect()}
        assert 7 in ids and len(ids) < n_all


class TestCurateBoilerplateStage:
    def test_furniture_cut_then_gates_see_clean_text(self, spark):
        from s3_access_logs_spark.operators.curate import curate_corpus

        banner = "Accept all cookies now please"
        rows = [
            (i, f"{banner}\nunique article body number {i} runs along")
            for i in range(8)
        ] + [(99, banner)]  # banner-only page -> empty after the cut
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        survivors, report = curate_corpus(df, boilerplate_min_docs=5)
        rows_out = {r["doc_id"]: r["text"] for r in survivors.collect()}
        assert set(rows_out) == set(range(8))
        assert all(banner not in t for t in rows_out.values())
        dropped = {r["stage"]: r["dropped"] for r in report.collect()}
        # the banner-only page became '' and the empty gate caught it
        assert dropped == {"empty": 1}


class TestDedupReviewFixes:
    """Regression pins for the dedup-file review pass."""

    def test_digest_normalizes_edge_whitespace(self, spark):
        from s3_access_logs_spark.operators.dedup import dedup_exact

        df = spark.createDataFrame(
            [(1, "abc def"), (2, "abc def\n"), (3, "\tabc def "),
             (4, "other text")],
            ["doc_id", "text"],
        )
        out = {r["digest"]: r for r in dedup_exact(df).collect()}
        assert len(out) == 2  # newline/tab-bounded variants collapse
        assert {r["n_dupes"] for r in out.values()} == {3, 1}

    def test_short_docs_do_not_cluster_together(self, spark):
        from s3_access_logs_spark.operators.dedup import (
            dedup_clusters,
            minhash_candidates,
        )

        df = spark.createDataFrame(
            [(1, "hi"), (2, "ok thanks"), (3, "yes"),
             (4, "a genuinely long document with many words inside it"),
             (5, "a genuinely long document with many words inside it!")],
            ["doc_id", "text"],
        )
        pairs = minhash_candidates(df).collect()
        # the all-sentinel short docs must not pair with each other
        assert all(
            {r["id_a"], r["id_b"]} == {4, 5} for r in pairs
        )
        clusters = {
            r["doc_id"]: r["cluster_id"]
            for r in dedup_clusters(df).collect()
        }
        assert clusters[1] == 1 and clusters[2] == 2 and clusters[3] == 3

    def test_tokenless_docs_out_of_simhash(self, spark):
        from s3_access_logs_spark.operators.dedup import simhash_near_pairs

        df = spark.createDataFrame(
            [(1, "!!!"), (2, "???"), (3, "..."),
             (4, "real words in this one here today"),
             (5, "real words in this one here today now")],
            ["doc_id", "text"],
        )
        pairs = simhash_near_pairs(df, max_hamming=10).collect()
        assert all(
            r["id_a"] not in (1, 2, 3) and r["id_b"] not in (1, 2, 3)
            for r in pairs
        )

    def test_minhash_bands_validates_split(self, spark):
        from s3_access_logs_spark.operators.dedup import minhash_bands

        df = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
        with pytest.raises(ValueError, match="divide evenly"):
            minhash_bands(df, k=16, bands=20)
        with pytest.raises(ValueError, match="divide evenly"):
            minhash_bands(df, k=16, bands=5)

    def test_null_text_docs_not_collapsed_in_incremental(self, spark):
        from s3_access_logs_spark.operators.dedup import dedup_incremental

        batch = spark.createDataFrame(
            [(1, None), (2, None), (3, "real text")], ["doc_id", "text"]
        )
        seen = spark.createDataFrame([], "digest string")
        out = dedup_incremental(batch, seen).collect()
        # NULL-text docs are excluded (not silently collapsed to min-id)
        assert [r["keep_id"] for r in out] == [3]

    def test_minhash_hot_bucket_cap(self, spark):
        from s3_access_logs_spark.operators.dedup import minhash_candidates

        text = "identical boilerplate page body repeated many times over"
        df = spark.createDataFrame(
            [(i, text) for i in range(30)], ["doc_id", "text"]
        )
        uncapped = minhash_candidates(df, max_band_freq=None).count()
        assert uncapped == 30 * 29 // 2
        capped = minhash_candidates(df, max_band_freq=10).count()
        assert capped == 0  # every band bucket holds all 30 -> dropped


class TestCurateKeeperElection:
    def test_exact_dup_keeper_elected_among_gate_passers(self, spark):
        """ADVICE r4: normalized_digest collapses case/whitespace, so
        digest-sharing rows can get different line-sensitive verdicts. A
        blind min-id keeper (doc 1, mostly furniture) would fail
        line_ratio while doc 2 was dropped as its exact dup — erasing
        the content entirely. The keeper must be a gate-passing variant."""
        from s3_access_logs_spark.operators.curate import curate_corpus

        real = "A normal prose line with enough words here."
        furniture_page = "\n".join(
            ["OK", "CLICK HERE NOW", "12:45", "99%", real]
        )
        df = spark.createDataFrame(
            [(1, furniture_page), (2, real)], ["doc_id", "text"]
        )
        survivors, report = curate_corpus(
            df, line_clean=True, min_line_ratio=0.5
        )
        assert {r["doc_id"] for r in survivors.collect()} == {2}
        dropped = {r["stage"]: r["dropped"] for r in report.collect()}
        # doc 1's first failing stage is line_ratio; it is NOT the keeper
        assert dropped == {"line_ratio": 1}

    def test_exact_dup_min_id_kept_when_group_passes(self, spark):
        from s3_access_logs_spark.operators.curate import curate_corpus

        df = spark.createDataFrame(
            [(5, "same text body"), (2, "SAME  text body"),
             (9, "other body entirely")],
            ["doc_id", "text"],
        )
        survivors, report = curate_corpus(df)
        assert {r["doc_id"] for r in survivors.collect()} == {2, 9}
        dropped = {r["stage"]: r["dropped"] for r in report.collect()}
        assert dropped == {"exact_dup": 1}


class TestTemperatureMixtureGuard:
    def test_high_cardinality_source_fails_loud(self, spark):
        """VERDICT r4 item 4: a high-cardinality source_col must raise a
        clear error, not collect one row per distinct value (driver OOM)."""
        from s3_access_logs_spark.operators.sampling import (
            temperature_mixture,
        )

        df = spark.range(200).select(
            F.col("id").alias("doc_id"),
            F.col("id").cast("string").alias("source"),
        )
        with pytest.raises(ValueError, match="distinct"):
            temperature_mixture(
                df, "source", "doc_id", max_sources=100
            )
        # at or under the bound it still works
        out = temperature_mixture(df, "source", "doc_id", max_sources=200)
        assert out.count() == 200  # every source rate is 1.0 at alpha<1


class TestIvfPqRefine:
    def test_refine_beats_adc_only_recall(self, spark, tmp_path):
        """VERDICT r4 item 6: the two-stage refine (ADC top-k' -> exact
        re-rank over only those candidates' full vectors) must recover
        recall@k lost to PQ quantization, with the refine read id-pruned
        and the probe plan still partition-pruned."""
        from pyspark.sql import Window

        from s3_access_logs_spark.functions.vectors import l2_distance
        from s3_access_logs_spark.operators.similarity import (
            build_ivfpq_index,
            probe_ivfpq_index,
        )
        from s3_access_logs_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        queries = emb.filter(F.col("vec_id") < 4)
        dst = str(tmp_path / "ivfpq")
        cents, cb = build_ivfpq_index(emb, dst)

        k, nprobe = 10, 4
        adc = probe_ivfpq_index(
            spark, dst, queries, cents, cb, k=k, nprobe=nprobe
        )
        refined = probe_ivfpq_index(
            spark, dst, queries, cents, cb, k=k, nprobe=nprobe,
            refine_corpus=emb, refine_factor=5,
        )
        # schema switches to exact distances; plan stays partition-pruned
        assert refined.columns == ["query_id", "neighbor_id", "rank", "dist"]
        rows = refined.collect()
        assert len(rows) == 4 * k

        # ground truth: exact L2 top-k over the whole corpus
        scored = (
            emb.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("c_vec"),
            )
            .join(
                queries.select(
                    F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("q_vec"),
                ),
                F.col("query_id") != F.col("neighbor_id"),
            )
            .withColumn("d", l2_distance("q_vec", "c_vec"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("d").asc(), F.col("neighbor_id")
        )
        exact = {
            (r.query_id, r.neighbor_id)
            for r in scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .collect()
        }
        adc_set = {(r.query_id, r.neighbor_id) for r in adc.collect()}
        ref_set = {(r.query_id, r.neighbor_id) for r in rows}
        adc_recall = len(exact & adc_set) / len(exact)
        ref_recall = len(exact & ref_set) / len(exact)
        # the refine re-orders the SAME candidate pool by the exact
        # metric, so it can only match or beat ADC ordering — and on
        # these fixtures it must strictly beat it
        assert ref_recall > adc_recall

        # within the probed candidate pool, refine@k is optimal: every
        # ground-truth neighbor it misses must live in an unprobed
        # cluster, so widening refine_factor alone never loses results
        wider = probe_ivfpq_index(
            spark, dst, queries, cents, cb, k=k, nprobe=nprobe,
            refine_corpus=emb, refine_factor=8,
        )
        wide_set = {(r.query_id, r.neighbor_id) for r in wider.collect()}
        assert len(exact & wide_set) >= len(exact & ref_set)


class TestCurateIncremental:
    def test_batch2_dedups_against_batch1_history(self, spark, tmp_path):
        """VERDICT r4 item 5: curate_corpus wired to the digest/band
        stores — a daily batch curates against corpus history. Batch 2
        carries an exact dup and an edited near-dup of batch-1 docs;
        both drop, the waterfall attributes them, and the stores grow
        one replay-idempotent batch_id partition per run."""
        from s3_access_logs_spark.operators.curate import curate_corpus

        dstore = str(tmp_path / "digests")
        bstore = str(tmp_path / "bands")
        base = (
            "the quick brown fox jumps over the lazy dog and then it runs "
            "far away into the deep green forest to rest for a long while"
        )
        other = (
            "completely unrelated fresh content about cooking pasta with "
            "garlic and olive oil for dinner again tonight with friends"
        )
        b1 = spark.createDataFrame(
            [(1, base), (2, other)], ["doc_id", "text"]
        )
        s1, r1 = curate_corpus(
            b1, digest_store=dstore, band_store=bstore, store_batch_id=0
        )
        assert {r["doc_id"] for r in s1.collect()} == {1, 2}
        assert spark.read.parquet(dstore).count() == 2

        b2 = spark.createDataFrame(
            [
                (10, base),                          # exact dup of doc 1
                (11, base + " minor footer edit"),   # near dup of doc 1
                (12, "entirely new material on growing tomatoes in small "
                     "gardens with plenty of afternoon sun and rich soil"),
            ],
            ["doc_id", "text"],
        )
        s2, r2 = curate_corpus(
            b2, digest_store=dstore, band_store=bstore, store_batch_id=1
        )
        assert {r["doc_id"] for r in s2.collect()} == {12}
        dropped = {r["stage"]: r["dropped"] for r in r2.collect()}
        assert dropped == {"exact_dup": 1, "near_dup": 1}
        # stores carry exactly the survivors' history
        dig = spark.read.parquet(dstore)
        assert {r.keep_id for r in dig.collect()} == {1, 2, 12}
        band_ids = {r.id for r in spark.read.parquet(bstore).collect()}
        assert band_ids == {1, 2, 12}

        # at-least-once rerun of batch 2: same verdicts, no store dupes
        s2b, r2b = curate_corpus(
            b2, digest_store=dstore, band_store=bstore, store_batch_id=1
        )
        assert {r["doc_id"] for r in s2b.collect()} == {12}
        assert spark.read.parquet(dstore).count() == 3

    def test_read_only_gate_and_guards(self, spark, tmp_path):
        from s3_access_logs_spark.operators.curate import curate_corpus

        dstore = str(tmp_path / "digests")
        b1 = spark.createDataFrame(
            [(1, "some document body here")], ["doc_id", "text"]
        )
        curate_corpus(b1, digest_store=dstore, store_batch_id=0)
        # read-only: no store_batch_id -> gate fires, nothing appended
        b2 = spark.createDataFrame(
            [(5, "some document body here"), (6, "another body entirely")],
            ["doc_id", "text"],
        )
        s, r = curate_corpus(b2, digest_store=dstore)
        assert {row["doc_id"] for row in s.collect()} == {6}
        assert {row.keep_id for row in spark.read.parquet(dstore).collect()} == {1}
        with pytest.raises(ValueError, match="appends nothing"):
            curate_corpus(b2, store_batch_id=3)
        with pytest.raises(ValueError, match="non-negative"):
            curate_corpus(b2, digest_store=dstore, store_batch_id=-1)


class TestPslSnapshot:
    def test_registrable_domain_psl_coverage(self, spark):
        """VERDICT r4 item 3: the vendored PSL snapshot splits ccTLD
        second-level registrations correctly — co.uk-style suffixes far
        beyond the old hand-picked table."""
        from s3_access_logs_spark.functions.url import registrable_domain

        cases = [
            ("news.bbc.co.uk", "bbc.co.uk"),
            ("shop.example.com.au", "example.com.au"),
            ("www.city.kawasaki.co.jp", "kawasaki.co.jp"),
            ("a.b.example.gc.ca", "example.gc.ca"),      # Canada gc.ca
            ("service.ontario.on.ca", "ontario.on.ca"),  # province suffix
            ("portal.example.gob.mx", "example.gob.mx"),
            ("x.example.com.ua", "example.com.ua"),
            ("mail.example.co.ke", "example.co.ke"),
            ("example.waw.pl", "example.waw.pl"),        # already eTLD+1
            ("deep.sub.example.ac.il", "example.ac.il"),
            ("plain.example.org", "example.org"),
            ("co.uk", "co.uk"),                          # bare suffix
        ]
        df = spark.createDataFrame([(h,) for h, _ in cases], ["h"])
        got = [r[0] for r in df.select(registrable_domain("h")).collect()]
        assert got == [want for _, want in cases]

    def test_snapshot_wellformed_and_blocklist_unchanged(self, spark):
        from s3_access_logs_spark.functions.psl_snapshot import (
            PSL_SECOND_LEVEL,
        )
        from s3_access_logs_spark.functions.url import (
            SECOND_LEVEL_SUFFIXES,
            domain_blocklist_filter,
        )

        assert len(PSL_SECOND_LEVEL) > 250
        assert all(
            s.count(".") == 1 and s == s.lower() and " " not in s
            for s in PSL_SECOND_LEVEL
        )
        assert SECOND_LEVEL_SUFFIXES is PSL_SECOND_LEVEL
        # blocklist semantics are PSL-independent (every suffix walked):
        # a blocked registrable domain under a ccTLD suffix still fires
        df = spark.createDataFrame(
            [(1, "https://cdn.badsite.co.uk/x"), (2, "https://fine.co.uk/y")],
            ["doc_id", "url"],
        )
        kept = domain_blocklist_filter(
            df, "url", ["badsite.co.uk"], "doc_id"
        )
        assert [r.doc_id for r in kept.collect()] == [2]


class TestCurateSemantic:
    def test_semantic_stage_drops_dominated_docs(self, spark):
        """The SemDeDup stage: a doc whose embedding has cosine
        similarity above the threshold to a lower-id GATE-PASSING doc
        drops as `semantic`; docs with no embedding pass (no signal);
        a rejected doc (here: empty text) cannot dominate anyone."""
        from s3_access_logs_spark.operators.curate import curate_corpus

        docs = spark.createDataFrame(
            [
                (0, "   "),  # fails the empty gate; vector twins doc 3
                (1, "first unique document body"),
                (2, "second unique document body"),
                (3, "third unique document body"),
                (4, "fourth unique document body"),  # no embedding row
                (5, "fifth unique document body"),
            ],
            ["doc_id", "text"],
        )
        emb = spark.createDataFrame(
            [
                (0, [0.0, 0.0, 1.0, 0.0]),
                (1, [1.0, 0.0, 0.0, 0.0]),
                (2, [0.99, 0.14, 0.0, 0.0]),  # cos ~0.99 vs doc 1
                (3, [0.0, 0.0, 1.0, 0.0]),
                (5, [1.0, 0.0, 0.0, 0.0]),  # identical to doc 1
            ],
            "vec_id long, embedding array<double>",
        )
        survivors, report = curate_corpus(
            docs, embeddings=emb, semantic_threshold=0.9
        )
        assert {r.doc_id for r in survivors.collect()} == {1, 3, 4}
        water = {r.stage: r.dropped for r in report.collect()}
        assert water == {"empty": 1, "semantic": 2}

    def test_duplicate_heavy_embeddings_size_kmeans_down(self, spark):
        """Review r5: the auto nlist is ~sqrt(row count), but kmeans
        seeds need k DISTINCT vectors — duplicate-heavy embeddings
        (SemDeDup's primary target input) must size the quantizer down,
        not crash the curation call."""
        from s3_access_logs_spark.operators.curate import curate_corpus

        docs = spark.createDataFrame(
            [(i, f"doc body number {i} entirely unique") for i in range(9)],
            ["doc_id", "text"],
        )
        emb = spark.createDataFrame(
            [(i, [1.0, 0.0]) for i in range(9)],  # ONE distinct vector
            "vec_id long, embedding array<double>",
        )
        survivors, report = curate_corpus(docs, embeddings=emb)
        assert {r.doc_id for r in survivors.collect()} == {0}
        assert {(r.stage, r.dropped) for r in report.collect()} == {
            ("semantic", 8)
        }

    def test_duplicate_embedding_rows_do_not_inflate_waterfall(self, spark):
        """Review r5: duplicate vec_id rows must not fan the flags join
        out — dropped + survivors must equal the input row count."""
        from s3_access_logs_spark.operators.curate import curate_corpus

        docs = spark.createDataFrame(
            [(1, "first document body"), (2, "second document body")],
            ["doc_id", "text"],
        )
        emb = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (2, [1.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        survivors, report = curate_corpus(docs, embeddings=emb)
        assert [r.doc_id for r in survivors.collect()] == [1]
        assert {(r.stage, r.dropped) for r in report.collect()} == {
            ("semantic", 1)
        }

    def test_all_null_vectors_skip_the_stage(self, spark):
        """Review r5: embedding rows whose vector is NULL or zero-length
        carry no signal — they pass like rowless docs, and a frame with
        no usable vector skips the quantizer fit instead of crashing it,
        explicit nlist included (emptiness has benign causes — empty
        batch, earlier-gate drops, docs without embedding rows — so a
        raise here would misfire; the loud error lives where kmeans can
        detect a real misconfiguration)."""
        from s3_access_logs_spark.operators.curate import curate_corpus

        docs = spark.createDataFrame(
            [(1, "one document body"), (2, "two document body")],
            ["doc_id", "text"],
        )
        emb = spark.createDataFrame(
            [(1, None), (2, [])],
            "vec_id long, embedding array<double>",
        )
        for kwargs in ({}, {"semantic_nlist": 2}):
            survivors, report = curate_corpus(
                docs, embeddings=emb, **kwargs
            )
            assert {r.doc_id for r in survivors.collect()} == {1, 2}
            assert report.count() == 0

    def test_nlist_zero_rejected(self, spark):
        from s3_access_logs_spark.operators.curate import curate_corpus

        docs = spark.createDataFrame([(1, "x y z")], ["doc_id", "text"])
        emb = spark.createDataFrame(
            [(1, [1.0])], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError, match="semantic_nlist"):
            curate_corpus(docs, embeddings=emb, semantic_nlist=0)

    def test_explicit_nlist_still_fails_loud(self, spark):
        """Review r5: only the AUTO-sized quantizer sizes down on too
        few distinct vectors; an explicit semantic_nlist that cannot be
        honored must keep kmeans' loud error — silently coarsening a
        user-chosen quantizer would hide a misconfiguration."""
        from s3_access_logs_spark.operators.curate import curate_corpus

        docs = spark.createDataFrame(
            [(i, f"body {i} words all different") for i in range(4)],
            ["doc_id", "text"],
        )
        emb = spark.createDataFrame(
            [(i, [1.0, 0.0]) for i in range(4)],
            "vec_id long, embedding array<double>",
        )
        with pytest.raises(ValueError, match="distinct"):
            curate_corpus(docs, embeddings=emb, semantic_nlist=3)

    def test_failing_stage_releases_scoped_caches(self, spark):
        """Review r5: an exception inside a dedup stage (here: a ragged
        embedding vector failing kmeans_fit) must release the scoped
        persists instead of pinning the gate stack in executor storage
        for the session lifetime."""
        from s3_access_logs_spark.operators.curate import curate_corpus

        def rdd_ids():
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            return {int(k) for k in jmap.keySet().toArray()}

        before = rdd_ids()
        docs = spark.createDataFrame(
            [(i, f"body {i} all distinct words here") for i in range(4)],
            ["doc_id", "text"],
        )
        emb = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 0.0, 9.9])],
            "vec_id long, embedding array<double>",
        )
        with pytest.raises(ValueError, match="dims"):
            curate_corpus(docs, embeddings=emb)
        # id-SET difference, not a count compare: the async
        # ContextCleaner may reap OLDER tests' checkpointed RDDs
        # between the snapshots (count would flake), while a count
        # compare could also MASK a real new leak behind such a reap.
        # The invariant: the failing call leaves no new pinned entry.
        assert not (rdd_ids() - before)


class TestCurateStoreOwnership:
    def test_colliding_stream_partition_fails_loud(self, spark, tmp_path):
        """Review r5: curate_corpus shares the streaming stores' batch_id
        space; appending over a partition another writer committed would
        silently replace that history via dynamic overwrite. A foreign
        partition (no curate ownership marker) must fail loudly; a
        curate-written one (replay) must pass."""
        import json

        from s3_access_logs_spark.operators.curate import curate_corpus
        from s3_access_logs_spark.streaming import ingest_documents_stream

        src = tmp_path / "in"
        src.mkdir()
        store = str(tmp_path / "store")
        (src / "b0.jsonl").write_text(
            json.dumps({"doc_id": 1, "text": "stream written history"})
            + "\n"
        )
        ingest_documents_stream(
            spark, str(src), store, str(tmp_path / "ckpt")
        ).awaitTermination(120)  # commits batch_id=0 WITHOUT a marker

        docs = spark.createDataFrame(
            [(5, "a brand new curated document")], ["doc_id", "text"]
        )
        with pytest.raises(ValueError, match="not written by curate"):
            curate_corpus(docs, digest_store=store, store_batch_id=0)
        # a fresh id appends fine, and replaying THAT id passes the guard
        curate_corpus(docs, digest_store=store, store_batch_id=1)
        curate_corpus(docs, digest_store=store, store_batch_id=1)
        kept = {r.keep_id for r in spark.read.parquet(store).collect()}
        assert kept == {1, 5}

        # review r5, reverse direction: a streaming epoch reaching the
        # curate-committed id must fail loudly instead of silently
        # dynamic-overwriting the marked partition…
        from s3_access_logs_spark.streaming.pipeline import (
            write_batch_partition,
        )

        stream_rows = spark.createDataFrame(
            [("d", 9, "t")], "digest string, keep_id bigint, text string"
        )
        with pytest.raises(RuntimeError, match="curate_corpus"):
            write_batch_partition(stream_rows, 1, store)
        # …while the stream's replay of its OWN unmarked partition passes
        write_batch_partition(stream_rows, 0, store)
        kept = {r.keep_id for r in spark.read.parquet(store).collect()}
        assert kept == {9, 5}

    def test_failed_write_releases_fresh_claim_only(self, spark, tmp_path):
        """Review r5: a claim-first marker must be released when the
        write itself fails (else the id sits poisoned for stream sinks
        with a misleading 'committed by curate' refusal) — but a
        PRE-EXISTING claim guards a prior commit's rows and must
        survive a failed replay write."""
        from s3_access_logs_spark.operators.curate import _claimed_append
        from s3_access_logs_spark.sources.fsutil import (
            partition_has_marker,
            touch_partition_marker,
        )

        store = str(tmp_path / "store")
        # a frame whose WRITE fails at execution time (ANSI division)
        bad = spark.range(1).selectExpr("1/0 AS boom")
        with pytest.raises(Exception):
            _claimed_append(bad, 3, store)
        assert not partition_has_marker(spark, store, 3)
        # pre-existing claim: failure must NOT release it
        touch_partition_marker(spark, store, 4)
        with pytest.raises(Exception):
            _claimed_append(bad, 4, store)
        assert partition_has_marker(spark, store, 4)

    def test_legacy_in_partition_marker_recognized(self, spark, tmp_path):
        """A store marked by the first (in-partition) scheme keeps its
        protection after the relocation to store-root markers."""
        import os

        from s3_access_logs_spark.sources.fsutil import partition_has_marker
        from s3_access_logs_spark.streaming.pipeline import (
            write_batch_partition,
        )

        store = str(tmp_path / "store")
        rows = spark.createDataFrame([("d", 1, "t")],
                                     "digest string, keep_id bigint, text string")
        write_batch_partition(rows, 0, store)
        os.makedirs(f"{store}/batch_id=0", exist_ok=True)
        open(f"{store}/batch_id=0/_curate_batch", "w").close()
        assert partition_has_marker(spark, store, 0)
        with pytest.raises(RuntimeError, match="curate_corpus"):
            write_batch_partition(rows, 0, store)

    def test_compaction_sweeps_orphan_markers(self, spark, tmp_path):
        """Review r5: markers for folded or never-committed ids are
        retired by the next maintenance run, so a crash between a
        fold's commit and its marker cleanup cannot leak a marker (and
        a permanently refused epoch id) forever."""
        from s3_access_logs_spark.operators.curate import curate_corpus
        from s3_access_logs_spark.sources.fsutil import (
            partition_has_marker,
            touch_partition_marker,
        )
        from s3_access_logs_spark.streaming import compact_ingest_store

        store = str(tmp_path / "store")
        docs = spark.createDataFrame(
            [(5, "a curated document body")], ["doc_id", "text"]
        )
        curate_corpus(docs, digest_store=store, store_batch_id=0)
        docs2 = spark.createDataFrame(
            [(6, "a different second document body")], ["doc_id", "text"]
        )
        curate_corpus(docs2, digest_store=store, store_batch_id=1)
        touch_partition_marker(spark, store, 99)  # crashed claim, no data
        res = compact_ingest_store(spark, store, keep_recent=0)
        assert res["folded"] == [0, 1]
        for b in (0, 1, 99):
            assert not partition_has_marker(spark, store, b)
        # folded curate rows survive under the base partition
        kept = {r.keep_id for r in spark.read.parquet(store).collect()}
        assert kept == {5, 6}
