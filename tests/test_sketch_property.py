"""Property-based invariants for the sketch family and URL functions
(SURVEY §5 strategy 4 applied to the round-4 additions).

Driver-side properties (interpolation parity vs numpy) run at full
hypothesis example counts; Spark-backed properties cap max_examples —
each example is a real plan execution.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from s3_access_logs_spark.functions.quantile import (
    quantile_sketch_build,
    quantile_sketch_merge,
    quantile_values,
)

values = st.lists(
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ),
    min_size=1,
    max_size=50,
)


class TestQuantileInterpolationProperty:
    @given(vs=values)
    @settings(max_examples=200, deadline=None)
    def test_matches_numpy_linear(self, vs):
        # fabricate a collected sketch: unique hashes, one meta row
        rows = [{"h": i, "v": float(v)} for i, v in enumerate(vs)]
        rows.append({"h": None, "v": float(len(vs) + 10)})
        qs = [0.0, 0.25, 0.5, 0.75, 1.0]
        got = quantile_values(rows, qs)
        for q in qs:
            want = float(
                np.percentile(np.array(vs), q * 100, method="linear")
            )
            assert got[q] == pytest.approx(want, rel=1e-12, abs=1e-9)


class TestQuantileMergeProperty:
    """merge(sketch(parts)) == sketch(whole) for ANY split, including
    overlapping/replayed parts — the invariant that makes the store
    design sound."""

    @given(
        data=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=10_000),
                st.floats(
                    min_value=-100,
                    max_value=100,
                    allow_nan=False,
                    allow_infinity=False,
                ),
            ),
            min_size=1,
            max_size=30,
            unique_by=lambda t: t[0],
        ),
        cut=st.integers(min_value=0, max_value=30),
        k=st.integers(min_value=1, max_value=8),
    )
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_split_invariance(self, spark, data, cut, k):
        cut = min(cut, len(data))
        whole = spark.createDataFrame(data, "id long, v double")
        a = spark.createDataFrame(data[:cut] or data[:1], "id long, v double")
        b = spark.createDataFrame(data[cut:] or data[-1:], "id long, v double")
        s_whole = quantile_sketch_build(whole, "v", "id", k=k)
        merged = quantile_sketch_merge(
            quantile_sketch_build(a, "v", "id", k=k),
            quantile_sketch_build(b, "v", "id", k=k),
            # replay: part a again
            quantile_sketch_build(a, "v", "id", k=k),
        )
        assert set(map(tuple, s_whole.collect())) == set(
            map(tuple, merged.collect())
        )


label = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789-", min_size=1, max_size=8
).filter(lambda s: not s.startswith("-") and not s.endswith("-"))
host = st.lists(label, min_size=1, max_size=6).map(".".join)


class TestUrlProperties:
    @given(hosts=st.lists(host, min_size=1, max_size=50))
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_registrable_domain_invariants(self, spark, hosts):
        from s3_access_logs_spark.functions.url import (
            host_suffixes,
            registrable_domain,
        )

        df = spark.createDataFrame([(h,) for h in hosts], ["h"])
        rows = df.select(
            "h",
            registrable_domain("h").alias("rd"),
            host_suffixes("h").alias("sufs"),
        ).collect()
        for r in rows:
            labels = r["h"].split(".")
            # the registrable domain is always a label-suffix of the host
            assert r["h"] == r["rd"] or r["h"].endswith("." + r["rd"])
            # with <= 2 labels the host passes through unchanged
            if len(labels) <= 2:
                assert r["rd"] == r["h"]
            else:
                assert r["rd"].count(".") in (1, 2)
            # suffix enumeration: longest-first, every entry a suffix,
            # the registrable domain among them
            assert r["sufs"][0] == r["h"]
            assert r["sufs"] == [
                ".".join(labels[i:]) for i in range(len(labels))
            ]
            assert r["rd"] in r["sufs"]
            # idempotence: a registrable domain maps to itself
        df2 = spark.createDataFrame(
            [(r["rd"],) for r in rows], ["h"]
        )
        again = [
            x["rd"]
            for x in df2.select(
                registrable_domain("h").alias("rd")
            ).collect()
        ]
        assert again == [r["rd"] for r in rows]


class TestCleanLinesIdempotent:
    @given(
        lines=st.lists(
            st.text(
                alphabet="abcDEFGH0123 .,!%:-",
                max_size=30,
            ),
            min_size=1,
            max_size=10,
        )
    )
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_second_pass_is_noop(self, spark, lines):
        from s3_access_logs_spark.functions.text import clean_lines

        doc = "\n".join(lines)
        df = spark.createDataFrame([(doc,)], ["t"])
        once = df.select(clean_lines("t").alias("c"))
        [r1] = once.collect()
        [r2] = once.select(clean_lines("c").alias("c")).collect()
        # every kept line passes the filter again -> fixpoint after one
        assert r2["c"] == r1["c"]


class TestHammingBandingComplete:
    """The pigeonhole banding must find EXACTLY the brute-force pairs
    whenever max_hamming < chunks (the pigeonhole guarantee bound)."""

    @given(
        fps=st.lists(
            st.integers(min_value=0, max_value=(1 << 64) - 1),
            min_size=2,
            max_size=12,
            unique=True,
        ),
        max_h=st.integers(min_value=0, max_value=3),
    )
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_matches_brute_force(self, spark, fps, max_h):
        from s3_access_logs_spark.operators.dedup import hamming_near_pairs

        rows = [
            (i, fp & 0xFFFFFFFF, (fp >> 32) & 0xFFFFFFFF)
            for i, fp in enumerate(fps)
        ]
        fp_df = spark.createDataFrame(rows, "id long, w0 long, w1 long")
        got = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in hamming_near_pairs(
                fp_df, bits=64, max_hamming=max_h, chunks=4,
                max_band_freq=None,
            ).collect()
        }
        want = {}
        for i in range(len(fps)):
            for j in range(i + 1, len(fps)):
                h = bin(fps[i] ^ fps[j]).count("1")
                if h <= max_h:
                    want[(i, j)] = h
        assert got == want
