"""Count-min sketch as plain DataFrame ops — the frequency twin of
``functions.bloom`` (same representation philosophy: a persistent,
mergeable table, no UDFs, broadcast-row probes).

Why it exists: exact per-key counts (``groupBy(key).count()``) shuffle
one row per DISTINCT key — at 100 TB of free-text tokens or URLs the
distinct set itself is the cost, and a recurring pipeline rarely needs
exact counts for the long tail. A CMS bounds the state at depth x width
counters FOREVER (overestimates only, never under), so per-batch
frequency tracking, heavy-hitter screens and join-skew detection can run
with fixed memory and a mergeable on-disk artifact, exactly like the
Bloom filter store.

Representation: (row bigint, col bigint, cnt bigint) — counter (i, j)
holds the sum of every item whose i-th hash lands in column j. Only
nonzero counters materialize; two negative-row meta rows make the table
self-describing (row=-1 -> width, row=-2 -> depth). Guarantees (Cormode
& Muthukrishnan 2005): estimate >= true count always; with width w and
depth d, P[estimate > true + e*N/w] <= (1/2)^d-ish (formally e = e/w
relative to the L1 mass N, delta = e^-d with w = ceil(e/eps),
d = ceil(ln(1/delta))).

Build: d hash rows per item explode -> ONE hash aggregation whose
shuffle is bounded by d x w counters, never the corpus. Weighted counts
ride a ``weight_col``. Merge: per-counter SUM (sketches are linear).
Estimate: the dense counter matrix rides in ONE broadcast row; each
probe is d constant-time ``element_at`` lookups folded with
``array_min`` — codegen end-to-end.

Size envelope: the probe broadcasts depth x width x 8 bytes — the
default 5 x 65536 is 2.5 MiB; w = 2^22 at d=5 is 160 MiB, the practical
broadcast ceiling. Past that, shard by key prefix like the Bloom store.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

DEFAULT_WIDTH = 1 << 16
DEFAULT_DEPTH = 5

_META_WIDTH = -1
_META_DEPTH = -2


def _cols_for(col: Column, width: int, depth: int) -> Column:
    """array<bigint> of the item's column index per hash row
    (Kirsch-Mitzenmacher double hashing, like functions.bloom)."""
    h1 = F.pmod(F.xxhash64(col), F.lit(width))
    h2 = F.pmod(
        F.xxhash64(col, F.lit(0x9E3779B97F4A7C15 - (1 << 64))),
        F.lit(width),
    )
    return F.array(
        *[F.pmod(h1 + F.lit(i) * h2, F.lit(width)) for i in range(depth)]
    )


def cms_build(
    df: DataFrame,
    col: str,
    width: int = DEFAULT_WIDTH,
    depth: int = DEFAULT_DEPTH,
    weight_col: str | None = None,
) -> DataFrame:
    """Sketch every non-null value of ``df[col]`` (optionally weighted by
    ``weight_col``). One shuffle, bounded by depth x width counters."""
    if width < 1 or depth < 1:
        raise ValueError(
            f"cms_build: need width >= 1 and depth >= 1, got "
            f"({width}, {depth})"
        )
    w = (
        F.col(weight_col).cast("bigint")
        if weight_col is not None
        else F.lit(1).cast("bigint")
    )
    rows = (
        df.filter(F.col(col).isNotNull())
        .select(
            F.posexplode(_cols_for(F.col(col), width, depth)).alias(
                "row", "col"
            ),
            w.alias("_w"),
        )
        .groupBy("row", "col")
        .agg(F.sum("_w").alias("cnt"))
    )
    meta = df.sparkSession.createDataFrame(
        [(_META_WIDTH, 0, width), (_META_DEPTH, 0, depth)],
        "row bigint, col bigint, cnt bigint",
    )
    return rows.selectExpr(
        "CAST(row AS BIGINT) row", "CAST(col AS BIGINT) col", "cnt"
    ).unionByName(meta)


def _read_meta(rows: list) -> tuple[int, int, dict[tuple[int, int], int]]:
    counters: dict[tuple[int, int], int] = {}
    meta: dict[int, int] = {}
    for r in rows:
        if r["row"] < 0:
            if r["row"] in meta and meta[r["row"]] != r["cnt"]:
                raise ValueError(
                    "count-min rows disagree on width/depth — mixed "
                    "sketches built with different parameters"
                )
            meta[r["row"]] = r["cnt"]
        else:
            key = (r["row"], r["col"])
            counters[key] = counters.get(key, 0) + r["cnt"]
    if _META_WIDTH not in meta or _META_DEPTH not in meta:
        raise ValueError(
            "count-min table is missing its meta rows (row=-1/-2) — "
            "not built by cms_build, or the rows were filtered out"
        )
    return meta[_META_WIDTH], meta[_META_DEPTH], counters


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """SUM several sketches built with IDENTICAL (width, depth) — CMS is
    linear, so the merged sketch equals the sketch of the concatenated
    input. Parameter mismatch fails loudly; meta rows pass through
    (identical values, MAX keeps one)."""
    if not sketches:
        raise ValueError("cms_merge: need at least one sketch")
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    bad = (
        u.filter(F.col("row") < 0)
        .groupBy("row")
        .agg(F.count_distinct("cnt").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    if bad:
        raise ValueError(
            "cms_merge: sketches disagree on width/depth — rebuild with "
            "one parameter set"
        )
    return (
        u.groupBy("row", "col")
        .agg(
            F.when(F.col("row") < 0, F.max("cnt"))
            .otherwise(F.sum("cnt"))
            .alias("cnt")
        )
        .select("row", "col", "cnt")
    )


def cms_estimate(
    df: DataFrame,
    col: str,
    sketch: DataFrame | list,
    result_col: str = "est_count",
) -> DataFrame:
    """Attach the sketch's count estimate for every row of ``df[col]`` —
    an OVERestimate of the true count, exact when no hash collision
    touched the key's counters. NULL values estimate NULL.

    The dense depth x width counter matrix is densified driver-side and
    rides in one broadcast row (flattened: counter (i, j) at array index
    i*width + j); each probe folds d element_at lookups with array_min.
    ``sketch`` may be the DataFrame or its pre-collected rows."""
    rows = sketch if isinstance(sketch, list) else sketch.collect()
    width, depth, counters = _read_meta(rows)
    dense = [0] * (width * depth)
    for (i, j), c in counters.items():
        dense[i * width + j] = c
    one = df.sparkSession.createDataFrame(
        [(dense,)], "_cms array<bigint>"
    )
    # transform's binary lambda receives (value, index): value j is the
    # item's column in hash row index i -> flat counter i*width + j
    est = F.array_min(
        F.transform(
            _cols_for(F.col(col), width, depth),
            lambda j, i: F.element_at(
                F.col("_cms"), (i * F.lit(width) + j).cast("int") + F.lit(1)
            ),
        )
    )
    return (
        df.crossJoin(broadcast(one))
        .withColumn(
            result_col, F.when(F.col(col).isNotNull(), est)
        )
        .drop("_cms")
    )


def cms_error_bound(
    n_total: int, width: int, depth: int
) -> tuple[float, float]:
    """(epsilon_additive, delta): with probability >= 1 - delta the
    estimate exceeds the true count by at most epsilon_additive
    (= e/width x N over the summed mass N), per Cormode-Muthukrishnan."""
    return (math.e / width) * n_total, math.exp(-depth)


def cms_size_for(
    eps_relative: float = 0.0001, delta: float = 0.01
) -> tuple[int, int]:
    """(width, depth) for additive error <= eps_relative * N with
    probability >= 1 - delta."""
    if not (0 < eps_relative < 1) or not (0 < delta < 1):
        raise ValueError("cms_size_for: need 0 < eps < 1 and 0 < delta < 1")
    return math.ceil(math.e / eps_relative), math.ceil(math.log(1 / delta))
