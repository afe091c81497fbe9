"""Data-layout operators: multi-dimensional clustering for row-group
skipping (engine extension; the reference's single hand-rolled layout —
partition dirs + one row group per requester/ip combo,
s3access/parquet.py:13-27 — generalizes to this at scale).

A single sort column gives min/max locality on that column only. Z-order
interleaves the bits of several columns so a lexicographic sort on the
z-value keeps *every* interleaved column locally clustered — after
``sortWithinPartitions(zvalue)``, parquet row-group min/max stats prune
scans filtered on any of the dimensions, not just the first sort key.
The interleave is plain integer arithmetic (shifts/masks), so it is
whole-stage-codegen'd and, being deterministic, DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def zvalue(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative int columns into
    a single z-curve value (a's bit i -> position 2i+1, b's -> 2i).
    Columns must already be range-reduced (e.g. ``% (1 << bits)``) —
    at scale that range reduction comes from one global min/max pass."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    ca, cb = ca.cast("long"), cb.cast("long")
    # disjoint bit positions, so summation == bitwise OR (and Column `|`
    # is logical OR in PySpark, not bitwise)
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(ca, i) % 2, 2 * i + 1)
            + F.shiftleft(F.shiftright(cb, i) % 2, 2 * i)
        )
    return z


def zvalue_sql(a: str, b: str, bits: int = 16) -> str:
    """The identical interleave as DuckDB SQL (generated from the same bit
    positions, so Spark and the oracle agree term for term)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i})")
    return " | ".join(terms)


def zorder_write(
    df: DataFrame,
    path: str,
    a: str,
    b: str,
    bits: int = 16,
    partition_cols: list[str] | None = None,
) -> None:
    """Write parquet clustered on the z-curve of (a, b): repartition by the
    z-value range (keeps each output task's key span tight), sort within
    partitions by z, drop the helper column. Filters on either dimension
    then skip row groups via min/max stats.

    Range reduction is pmod, not ``%`` (dirty-id sweep, round 8): a
    negative key's sign-kept remainder violates zvalue's non-negative
    precondition — the interleave's per-bit ``% 2`` terms go negative
    and such rows land in an arbitrary range band where neither
    dimension's min/max pruning works."""
    z = df.withColumn(
        "__z",
        zvalue(
            F.pmod(F.col(a), 1 << bits), F.pmod(F.col(b), 1 << bits), bits
        ),
    )
    w = z.repartitionByRange("__z").sortWithinPartitions("__z").drop("__z")
    writer = w.write.mode("overwrite").option("compression", "snappy")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def _salted_bucket(key_col: str, salt: str, modulus: int) -> Column:
    """Deterministic bucket in [0, modulus): ``md5_long`` (the repo-wide
    cross-engine hash primitive, functions/text.py) of salt || key, mod.
    md5, not xxhash64, so DuckDB oracles replay it exactly
    (``SQL_MD5_LONG`` is the oracle-side twin)."""
    from s3_access_logs_spark.functions.text import md5_long

    return (
        md5_long(F.concat(F.lit(salt), F.col(key_col).cast("string")))
        % modulus
    )


def training_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shards:",
    order_salt: str = "order:",
) -> DataFrame:
    """The training-export layout step: every row gets a deterministic
    ``shard`` in [0, n_shards) (salted id-hash — balanced in expectation,
    and at training-corpus sizes the law of large numbers makes per-shard
    token mass equal to within a fraction of a percent) and a
    ``shard_order`` key (independently-salted hash) that defines the
    within-shard read order — ``shuffle_rows``'s epoch-permutation idea,
    per shard. Both columns are pure projections: assignment costs ZERO
    shuffle at any corpus size, reruns are bit-identical, and a new
    training epoch is a new ``order_salt``.

    Hash assignment — not greedy bin-packing — is the deliberate 100 TB
    choice: packing needs a serialized pass over global token counts,
    while hashing is stateless per row; the `training_shard_stats`
    catalog entry is the evidence the balance actually holds."""
    if n_shards < 1:
        raise ValueError(f"training_shards: n_shards must be >= 1, got {n_shards}")
    return df.withColumn(
        "shard", _salted_bucket(id_col, salt, n_shards)
    ).withColumn(
        "shard_order",
        F.md5(F.concat(F.lit(order_salt), F.col(id_col).cast("string"))),
    )


def write_training_shards(
    df: DataFrame,
    dst: str,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shards:",
    order_salt: str = "order:",
) -> None:
    """Materialize the training export: hive dirs ``shard=<n>``, rows
    inside each shard parquet-ordered by the epoch permutation (trainers
    stream the files in order and get the shuffled corpus without a
    shuffle buffer). One shuffle total — ``repartition(shard)`` keys
    writer tasks to shards so each shard is one writer's output (no
    small-files blowup from every task appending to every shard dir);
    within-task ``sortWithinPartitions`` orders the rows. The order key
    is dropped from the data files: it is derivable from the id, and
    re-deriving is cheaper than storing 32 bytes/row at corpus scale."""
    out = training_shards(df, n_shards, id_col, salt, order_salt)
    (
        out.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shard_order")
        .drop("shard_order")
        .write.mode("overwrite")
        .option("compression", "snappy")
        .partitionBy("shard")
        .parquet(dst)
    )


def pack_id_windows(
    df: DataFrame,
    window_ids: int,
    part_cols: list[str],
    order_cols: list[Column],
    ids_col: str = "ids",
    emit_spans: bool = False,
    pad_id: int | None = None,
) -> DataFrame:
    """Cut each partition's concatenated id stream into EXACT
    fixed-length windows of ``window_ids`` ids (only the last window
    per partition may be short) — the shared core of
    ``plans/text_queries.packed_token_windows`` and
    ``operators/export.export_training_set``. Rows of ``df`` carry an
    ``ids_col`` array; per ``part_cols`` group, rows concatenate in
    ``order_cols`` order and documents SPLIT across window boundaries.

    Scale shape: the cumulative offset is one partition-keyed window
    function; each row then emits only the (window, slice) segments it
    overlaps — a transform+explode over ~(len/W) segments, never a
    per-token explode — and the (part, window) groupBy reuses the
    window's hash partitioning (one exchange total, verified in the
    catalog entry's plan). Offsets are exact to 2^53 stream positions
    (double-floor window index — ~25T tokens per 100 TB corpus sits
    4 orders under the cliff).

    Returns ``(*part_cols, window_idx bigint, ids_col array)``;
    ``emit_spans=True`` adds ``doc_spans array<struct<start,len>>`` —
    the contributing documents' segment offsets WITHIN the window, in
    concatenation order (a doc split across windows contributes one
    span per window, the continuation starting at 0). Trainers use
    this for attention/loss masking without re-scanning for boundary
    markers; it is derived from the same sorted segment list the
    concatenation uses, so it can never disagree with the ids.
    Callers must ensure ``order_cols`` is a total order within each
    partition (ties would make segment order engine-defined) and that
    ``ids_col`` is never NULL (``F.coalesce(..., F.array())`` upstream
    — ``size(NULL)`` is -1 and would corrupt the cumulative offsets);
    zero-length arrays contribute nothing and emit no segments.

    ``pad_id`` (round 11, VERDICT r10 item 2): pad each partition's
    final short window to exactly ``window_ids`` ids with the given id
    — trainers wanting static tensor shapes read every window at the
    same length. Padding is appended AFTER the span aggregation, so
    ``doc_spans`` tiles only the real ids (the pad tail is exactly the
    positions past the last span's end) and the id mass identity moves
    from "sum of sizes" to "sum of sizes minus pads". Validation that
    the pad id sits outside the vocab id space is the CALLER's job
    (``export_training_set`` enforces it the same way it does
    ``eos_id``); this operator just appends."""
    W = int(window_ids)
    if W < 1:
        raise ValueError(
            f"pack_id_windows: window_ids must be >= 1, got {window_ids}"
        )
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    b = (
        df.withColumn("_n", F.size(ids_col).cast("long"))
        .withColumn("_end", F.sum("_n").over(w))
        .withColumn("_start", F.col("_end") - F.col("_n"))
        .filter(F.col("_n") > 0)
    )
    segs = F.transform(
        F.sequence(
            (F.col("_start") / W).cast("bigint"),
            ((F.col("_end") - 1) / W).cast("bigint"),
        ),
        lambda k: F.struct(
            k.alias("window_idx"),
            F.slice(
                F.col(ids_col),
                (
                    F.greatest(k * W, F.col("_start"))
                    - F.col("_start")
                    + 1
                ).cast("int"),
                (
                    F.least(F.col("_end"), (k + 1) * W)
                    - F.greatest(k * W, F.col("_start"))
                ).cast("int"),
            ).alias("seg"),
        ),
    )
    e = b.select(
        *part_cols, "_start", F.explode(segs).alias("_s")
    ).select(
        *part_cols,
        F.col("_s.window_idx").alias("window_idx"),
        F.col("_s.seg").alias("_seg"),
        "_start",
    )
    sorted_segs = F.array_sort(F.collect_list(F.struct("_start", "_seg")))
    aggs = [
        F.flatten(
            F.transform(sorted_segs, lambda s: s["_seg"])
        ).alias(ids_col)
    ]
    if emit_spans:
        aggs.append(
            F.aggregate(
                sorted_segs,
                F.struct(
                    F.lit(0).cast("int").alias("off"),
                    F.array().cast(
                        "array<struct<start:int,len:int>>"
                    ).alias("sp"),
                ),
                lambda acc, s: F.struct(
                    (acc["off"] + F.size(s["_seg"]))
                    .cast("int")
                    .alias("off"),
                    F.concat(
                        acc["sp"],
                        F.array(
                            F.struct(
                                acc["off"].alias("start"),
                                F.size(s["_seg"])
                                .cast("int")
                                .alias("len"),
                            )
                        ),
                    ).alias("sp"),
                ),
                lambda acc: acc["sp"],
            ).alias("doc_spans")
        )
    out = e.groupBy(*part_cols, "window_idx").agg(*aggs)
    if pad_id is not None:
        # one projection over the assembled windows: concat a repeated
        # pad tail sized to the shortfall (zero for every full window,
        # so only each partition's last window actually grows). The pad
        # literal casts to the ids' own element type so a caller's
        # array<bigint> stream doesn't silently widen/narrow.
        elem = df.schema[ids_col].dataType.elementType.simpleString()
        out = out.withColumn(
            ids_col,
            F.concat(
                F.col(ids_col),
                F.array_repeat(
                    F.lit(int(pad_id)).cast(elem),
                    (F.lit(W) - F.size(ids_col)).cast("int"),
                ),
            ),
        )
    return out


def shuffle_rows(
    df: DataFrame,
    key_col: str,
    salt: str = "epoch0:",
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle — the training-order randomization step
    of a data pipeline, without RNG state: total order by
    ``md5(salt || key)``. Same salt -> the same permutation on every rerun
    (downstream caches and resumable training stay valid); a new epoch is
    just a new salt.

    Scale shape: ``repartitionByRange`` on the hash samples range bounds
    and gives a TOTAL order across output partitions (partition i's keys
    all sort before partition i+1's) without ever materializing a global
    single-task sort; ``sortWithinPartitions`` orders inside each range.
    Reading the output files in partition order replays the permutation.
    Rows whose keys collide on md5 have no defined relative order — use a
    unique key."""
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    out = df.withColumn("_shuffle_hash", h)
    out = (
        out.repartitionByRange(partitions, "_shuffle_hash")
        if partitions
        else out.repartitionByRange("_shuffle_hash")
    )
    return out.sortWithinPartitions("_shuffle_hash").drop("_shuffle_hash")
