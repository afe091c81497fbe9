"""`python -m s3_access_logs_spark` — the reference's cron entry point
(cmd/export.py main, :204-397) on Spark.

Flow parity: config from env -> idempotency gate (skip a completed hour)
-> scan/parse/partitioned-write as one Spark plan -> touch the tracking
marker. The three process pools, the WaitGroup, and the multiprocess log
listener all disappear: Spark's scheduler is the concurrency model and
actions block (SURVEY §3.1).

Exit codes match the reference: 0 on success *and* on "hour already done"
/ "no input files" (export.py:319-341).
"""

from __future__ import annotations

import logging
import sys
import threading
import uuid
from pathlib import Path

from pyspark.sql import SparkSession

from s3_access_logs_spark.config import JobConfig
from s3_access_logs_spark.operators.etl import export_hour
from s3_access_logs_spark.session import get_spark

log = logging.getLogger("s3_access_logs_spark")


def _marker(cfg: JobConfig) -> Path | None:
    if not cfg.tracking_dst:
        return None
    return Path(cfg.tracking_dst) / cfg.hour


def _hadoop_fs(spark: SparkSession, path_str: str):
    """(FileSystem, Path) — shared plumbing in sources/fsutil.py."""
    from s3_access_logs_spark.sources.fsutil import hadoop_fs

    return hadoop_fs(spark, path_str)


def preflight(spark: SparkSession, cfg: JobConfig) -> int:
    """Source/sink self-tests before committing to the hour (reference
    cmd/export.py:346-376): prove the first matched input file is readable
    (line-count it) and that DST accepts a create/write/delete round-trip.
    Returns 0 when healthy; logs and returns 1 on the first failure — a
    mis-permissioned bucket fails here with a clear message instead of
    somewhere inside a Spark stage."""
    # --- read test (export.py:346-360) ------------------------------------
    try:
        fs, src_path = _hadoop_fs(spark, cfg.src)
        if not fs.exists(src_path):
            log.error("preflight: source %s does not exist", cfg.src)
            return 1
        first = None
        it = fs.listFiles(src_path, True)
        while it.hasNext():
            p = it.next().getPath()
            if not cfg.hour or p.getName().startswith(cfg.hour):
                first = p
                break
        if first is None:
            # empty hour is NOT a failure (exit-0 contract); nothing to read
            log.info("preflight: no input files for hour %s", cfg.hour)
        else:
            n_lines = spark.read.format("text").load(first.toString()).count()
            log.info(
                "preflight: read test ok — %d lines in %s", n_lines, first
            )
    except Exception:
        log.exception("preflight: read test failed for %s", cfg.src)
        return 1
    # --- write test (export.py:362-376) -----------------------------------
    probe = f"{cfg.dst.rstrip('/')}/_preflight-{uuid.uuid4()}"
    try:
        fs, probe_path = _hadoop_fs(spark, probe)
        out = fs.create(probe_path, True)
        out.write(bytearray(f"preflight for {cfg.hour}\n", "utf-8"))
        out.close()
        fs.delete(probe_path, False)
        log.info("preflight: write test ok — %s", probe)
    except Exception:
        log.exception("preflight: write test failed for %s", cfg.dst)
        return 1
    return 0


def _parse_tail(
    argv: list[str], usage: str, flags: tuple[str, ...] = ()
) -> "tuple[list[str], str | None, set[str]] | None":
    """Shared tail-argument parse for the query/sql subcommands (ONE
    copy — the two had started to drift, review r8): ``argv`` is
    everything AFTER the leading positional (name/statement), which the
    caller has already taken verbatim. Returns (positionals, out_path,
    seen_flags) or ``None`` after logging (caller exits 2). Unknown
    ``--`` tokens are REJECTED, not silently ignored — a misspelled
    ``--out-file`` that prints instead of writing is the
    fold-store-subcommand lesson."""
    out = None
    consumed: set[int] = set()
    if "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv):
            log.error("--out needs a path; %s", usage)
            return None
        out = argv[i + 1]
        # consume by INDEX — an sf_dir equal to the out path (or an out
        # path that looks like a flag) must not be matched by value
        consumed = {i, i + 1}
    seen: set[str] = set()
    positionals: list[str] = []
    for j, a in enumerate(argv):
        if j in consumed:
            continue
        if a.startswith("--"):
            if a in flags:
                seen.add(a)
                continue
            log.error("unknown flag %r; %s", a, usage)
            return None
        positionals.append(a)
    return positionals, out, seen


def _default_sf_dir() -> str:
    import os

    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_query(argv: list[str]) -> int:
    """`python -m s3_access_logs_spark query <name> [sf_dir] [--out PATH]`
    — run one catalog query against the table directory and print (or
    write) the result. The reference delegates all querying to Athena
    (SURVEY §2.2); this engine owns the query layer, so the CLI exposes
    it: `query list` enumerates the catalog."""
    from s3_access_logs_spark.plans.catalog import load_all

    queries = load_all()
    if not argv or argv[0] in ("list", "--list"):
        for name in sorted(queries):
            print(name)
        return 0
    name = argv[0]
    if name not in queries:
        log.error(
            "unknown query %r — `query list` prints the catalog", name
        )
        return 2
    parsed = _parse_tail(
        argv[1:], "usage: query <name> [sf_dir] [--out PATH]"
    )
    if parsed is None:
        return 2
    rest, out, _ = parsed
    sf_dir = rest[0] if rest else _default_sf_dir()
    spark = get_spark("s3-access-logs-query")
    df = queries[name].builder(spark, sf_dir)
    if out:
        df.write.mode("overwrite").parquet(out)
        log.info("query %s -> %s", name, out)
    else:
        df.show(50, truncate=False)
    return 0


def run_sql(argv: list[str]) -> int:
    """`python -m s3_access_logs_spark sql "<statement>" [sf_dir]
    [--out PATH] [--no-logs]` — arbitrary ANSI SQL over the registered
    warehouse views (plans/sql_surface.py:sql_catalog), the
    Athena-replacement entry point from the command line: what a
    reference user typed into the Athena console runs here verbatim.
    The statement is ALWAYS the first argument, taken verbatim — SQL
    legitimately starts with `--` line comments, so it must never be
    mistaken for a flag. ``--no-logs`` skips synthesizing + parsing the
    ``logs`` view (the one non-trivial registration) for
    star-schema-only statements."""
    from s3_access_logs_spark.plans.sql_surface import sql_catalog

    usage = 'usage: sql "<statement>" [sf_dir] [--out PATH] [--no-logs]'
    if not argv:
        log.error(usage)
        return 2
    statement = argv[0]
    parsed = _parse_tail(argv[1:], usage, flags=("--no-logs",))
    if parsed is None:
        return 2
    rest, out, seen = parsed
    sf_dir = rest[0] if rest else _default_sf_dir()
    spark = get_spark("s3-access-logs-sql")
    sql_catalog(spark, sf_dir, include_logs="--no-logs" not in seen)
    try:
        df = spark.sql(statement)
    except Exception as e:  # noqa: BLE001 — a typo'd statement is exit 2
        log.error("SQL failed to parse/analyze: %s", e)
        return 2
    # execution-time failures (runtime cast errors, unreadable sf_dir,
    # bad --out path) only surface at the ACTION below — same exit-2
    # contract as parse failures, not an unhandled traceback (review r8)
    try:
        if out:
            df.write.mode("overwrite").parquet(out)
            log.info("sql -> %s", out)
        else:
            df.show(50, truncate=False)
    except Exception as e:  # noqa: BLE001 — ad-hoc entry point
        log.error("SQL failed during execution: %s", e)
        return 2
    return 0


def run_compact(argv: list[str]) -> int:
    """`python -m s3_access_logs_spark compact <table_root> [--target-mb N]
    [--dry-run]` — the maintenance half of the incremental write paths:
    inventory the hive partitions and rewrite over-fragmented ones (see
    operators.etl.compact_partitions). ``--dry-run`` prints the plan."""
    from s3_access_logs_spark.operators.etl import compact_partitions

    usage = "usage: compact <table_root> [--target-mb N] [--dry-run]"
    parsed = _parse_flags(
        argv, {"--target-mb": int}, usage, bool_flags=("--dry-run",)
    )
    if parsed is None:
        return 2
    pos, vals = parsed
    if len(pos) != 1:
        log.error(usage)
        return 2
    root = pos[0]
    target_mb = int(vals.get("--target-mb", 128))
    dry = bool(vals.get("--dry-run", False))
    spark = get_spark("s3-access-logs-compact")
    victims = compact_partitions(
        spark, root, target_file_bytes=target_mb << 20, dry_run=dry
    )
    verb = "would rewrite" if dry else "rewrote"
    for v in victims:
        log.info(
            "%s %s: %d files (%d bytes) -> %d",
            verb, v["partition"], v["n_files"], v["bytes"], v["target_files"],
        )
    log.info("%d partition(s) %s", len(victims), verb)
    return 0


def run_fold_store(argv: list[str]) -> int:
    """`python -m s3_access_logs_spark fold-store <store> [--keep-recent N]
    [--target-mb N] [--token]` — maintenance for the batch_id-partitioned
    streaming stores (digest/band/bloom/frequency/profile): fold committed
    history into the negative-id base partition and size-normalize files
    (see streaming.pipeline.compact_ingest_store, incl. why --keep-recent
    defaults to 1 for a live stream). ``--token`` folds a streaming TOKEN
    shard store instead (``shard=<s>/batch_id=<b>`` leaves → one base
    file per shard; see compact_token_store — round 12)."""
    from s3_access_logs_spark.streaming.pipeline import (
        compact_ingest_store,
        compact_token_store,
    )

    usage = (
        "usage: fold-store <store> [--keep-recent N] [--target-mb N]"
        " [--token]"
    )
    # strict parse via the shared helper (review r11: this command's
    # own loop was the policy's namesake, and the helper superseded it)
    parsed = _parse_flags(
        argv, {"--keep-recent": int, "--target-mb": int}, usage,
        bool_flags=("--token",),
    )
    if parsed is None:
        return 2
    pos, vals = parsed
    if len(pos) != 1:
        log.error(usage)
        return 2
    store = pos[0]
    keep_recent = int(vals.get("--keep-recent", 1))
    target_mb = int(vals.get("--target-mb", 128))
    if vals.get("--token") and "--target-mb" in vals:
        # strict-parse rule: a flag with no effect in this mode must
        # exit 2, not be silently dropped (review r12) — and BEFORE
        # the session spins up, like every other usage-error path
        log.error(
            "--target-mb has no effect with --token (the token "
            "fold writes one file per shard); %s", usage,
        )
        return 2
    spark = get_spark("s3-access-logs-fold-store")
    if vals.get("--token"):
        try:
            tres = compact_token_store(
                spark, store, keep_recent=keep_recent
            )
        except ValueError as e:  # wrong layout / bad args — usage-class
            log.error("fold-store --token: %s", e)
            return 2
        log.info(
            "folded %d token-store batch leaf id(s) %s, kept %s",
            len(tres["folded"]), tres["folded"], tres["kept"],
        )
        return 0
    res = compact_ingest_store(
        spark,
        store,
        keep_recent=keep_recent,
        target_file_bytes=target_mb << 20,
    )
    log.info(
        "folded %d batch partition(s) %s, kept %s, compacted %d dir(s)",
        len(res["folded"]), res["folded"], res["kept"], len(res["compacted"]),
    )
    return 0


def run_export_training(argv: list[str]) -> int:
    """`python -m s3_access_logs_spark export-training <src> <dst>
    [--shards N] [--window N] [--epoch SALT] [--mixture-alpha A]
    [--min-quality Q] [--pad-id P]` — the one-call corpus→training-
    shards flagship at the operational layer (round 11, VERDICT r10
    item 4: the library's `export_training_set` had no CLI, so the
    one-call story stopped at Python). ``src`` is an sf-style table
    dir (containing ``documents.parquet``) or a documents parquet
    path; ``dst`` receives the hive ``shard=<n>`` window dirs. The
    curation waterfall is printed stage by stage, and a run that
    curates away EVERY document exits 3 — an empty training set is an
    operational failure a cron wrapper must see, not a quiet success
    (contrast the hourly ETL's empty-hour exit 0, which IS routine)."""
    from s3_access_logs_spark.operators.export import export_training_set

    usage = (
        "usage: export-training <src> <dst> [--shards N] [--window N]"
        " [--epoch SALT] [--mixture-alpha A] [--min-quality Q]"
        " [--pad-id P]"
    )
    parsed = _parse_flags(
        argv,
        {"--shards": int, "--window": int, "--epoch": str,
         "--mixture-alpha": float, "--min-quality": float,
         "--pad-id": int},
        usage,
    )
    if parsed is None:
        return 2
    pos, vals = parsed
    if len(pos) != 2:
        log.error(usage)
        return 2
    src, dst = pos
    n_shards = int(vals.get("--shards", 8))
    window_ids = int(vals.get("--window", 256))
    epoch = str(vals.get("--epoch", "order:"))
    pad_id = int(vals["--pad-id"]) if "--pad-id" in vals else None  # type: ignore[arg-type]
    spark = get_spark("s3-access-logs-export-training")
    docs = _load_docs(spark, src)
    curate = (
        {"min_quality": float(vals["--min-quality"])}  # type: ignore[arg-type]
        if "--min-quality" in vals else None
    )
    mixture = (
        {"alpha": float(vals["--mixture-alpha"])}  # type: ignore[arg-type]
        if "--mixture-alpha" in vals else None
    )
    try:
        windows, report = export_training_set(
            docs, dst, n_shards=n_shards, window_ids=window_ids,
            order_salt=epoch, curate=curate, mixture=mixture,
            pad_id=pad_id,
        )
    except ValueError as e:  # bad pad/eos id etc. — usage-class error
        log.error("export-training: %s", e)
        return 2
    rep = {r["stage"]: r["dropped"] for r in report.collect()}
    for stage, n in rep.items():
        log.info("  %-16s %d", stage, n)
    if rep.get("windows_emitted", 0) == 0:
        log.error(
            "export-training: zero survivors — every document was "
            "curated away; nothing written to %s", dst,
        )
        return 3
    log.info(
        "exported %d windows across %d shards to %s (epoch %r)",
        rep["windows_emitted"], rep["shards_written"], dst, epoch,
    )
    return 0


def _parse_flags(
    argv: list[str], flag_types: dict[str, type], usage: str,
    bool_flags: tuple[str, ...] = (),
) -> "tuple[list[str], dict[str, object]] | None":
    """Strict flag parse shared by the export-family subcommands (the
    fold-store rule: a misspelled flag must exit 2, never silently run
    with defaults). Returns (positionals, values) or None after
    logging."""
    pos: list[str] = []
    vals: dict[str, object] = {}
    rest = list(argv)
    while rest:
        a = rest.pop(0)
        if not a.startswith("--"):
            pos.append(a)
            continue
        if a in bool_flags:
            vals[a] = True
            continue
        if a not in flag_types:
            log.error("unrecognized argument %r; %s", a, usage)
            return None
        if not rest or rest[0].startswith("--"):
            # a following `--token` is a FLAG, not this flag's value
            # (ADVICE r11: `repack-epoch s d --epoch --spans` would
            # otherwise silently use '--spans' as the epoch salt) —
            # rejected for ALL value types, string included: no
            # subcommand's value space legitimately starts with '--',
            # and the strict-parse intent is "misuse exits 2"
            log.error("%s needs a value; %s", a, usage)
            return None
        raw = rest.pop(0)
        try:
            vals[a] = flag_types[a](raw)
        except ValueError:
            log.error("%s: invalid value %r; %s", a, raw, usage)
            return None
    return pos, vals


def _load_docs(spark, src: str):
    """A documents frame from either an sf-style table dir or a bare
    parquet path — shared by the export-family subcommands."""
    from s3_access_logs_spark.sources.fsutil import has_data_files

    if has_data_files(spark, f"{src.rstrip('/')}/documents.parquet"):
        from s3_access_logs_spark.sources.tables import load_table

        return load_table(spark, src, "documents")
    return spark.read.parquet(src)


def run_token_store(argv: list[str]) -> int:
    """`python -m s3_access_logs_spark token-store <src> <store>
    [--shards N] [--mixture-alpha A] [--min-quality Q]` — materialize
    the EXPENSIVE half of the training export once (curate → tokenize
    → sharded id streams); each epoch is then a cheap `repack-epoch`
    run. Prints the waterfall; exits 3 when zero documents survive
    (same contract as export-training)."""
    from s3_access_logs_spark.operators.export import write_token_store

    usage = (
        "usage: token-store <src> <store> [--shards N]"
        " [--mixture-alpha A] [--min-quality Q]"
    )
    parsed = _parse_flags(
        argv,
        {"--shards": int, "--mixture-alpha": float, "--min-quality": float},
        usage,
    )
    if parsed is None:
        return 2
    pos, vals = parsed
    if len(pos) != 2:
        log.error(usage)
        return 2
    src, store = pos
    spark = get_spark("s3-access-logs-token-store")
    docs = _load_docs(spark, src)
    curate = (
        {"min_quality": float(vals["--min-quality"])}  # type: ignore[arg-type]
        if "--min-quality" in vals else None
    )
    mixture = (
        {"alpha": float(vals["--mixture-alpha"])}  # type: ignore[arg-type]
        if "--mixture-alpha" in vals else None
    )
    report = write_token_store(
        docs, store, n_shards=int(vals.get("--shards", 8)),
        curate=curate, mixture=mixture,
    )
    rep = {r["stage"]: r["dropped"] for r in report.collect()}
    for stage, n in rep.items():
        log.info("  %-16s %d", stage, n)
    if rep.get("docs_stored", 0) == 0:
        log.error(
            "token-store: zero survivors — every document was curated "
            "away; nothing stored at %s", store,
        )
        return 3
    log.info(
        "stored %d docs (%d tokens) across %d shards at %s",
        rep["docs_stored"], rep["tokens_stored"], rep["shards_written"],
        store,
    )
    return 0


def run_repack_epoch(argv: list[str]) -> int:
    """`python -m s3_access_logs_spark repack-epoch <store> <dst>
    [--window N] [--shards N] [--epoch SALT] [--pad-id P] [--spans]
    [--mixture-alpha A]` — cut a NEW training epoch's windows from a
    materialized token store (`token-store`, or a streaming
    `shard_store`) without re-running curate/tokenize; bit-identical
    to `export-training` under the same epoch salt (+ mixture).
    `--mixture-alpha` re-weights sources PER EPOCH over the store's
    persisted `source` column — the curriculum knob (round 12); a
    sourceless store exits 2. Exits 3 on an empty/never-written
    store."""
    from s3_access_logs_spark.operators.export import repack_epoch

    usage = (
        "usage: repack-epoch <store> <dst> [--window N] [--shards N]"
        " [--epoch SALT] [--pad-id P] [--spans] [--mixture-alpha A]"
    )
    parsed = _parse_flags(
        argv,
        {"--window": int, "--shards": int, "--epoch": str, "--pad-id": int,
         "--mixture-alpha": float},
        usage,
        bool_flags=("--spans",),
    )
    if parsed is None:
        return 2
    pos, vals = parsed
    if len(pos) != 2:
        log.error(usage)
        return 2
    store, dst = pos
    spark = get_spark("s3-access-logs-repack-epoch")
    try:
        windows = repack_epoch(
            spark, store, dst,
            window_ids=int(vals.get("--window", 256)),
            n_shards=int(vals.get("--shards", 8)),
            order_salt=str(vals.get("--epoch", "order:")),
            emit_spans=bool(vals.get("--spans", False)),
            pad_id=(
                int(vals["--pad-id"]) if "--pad-id" in vals else None  # type: ignore[arg-type]
            ),
            mixture=(
                {"alpha": float(vals["--mixture-alpha"])}  # type: ignore[arg-type]
                if "--mixture-alpha" in vals else None
            ),
        )
    except ValueError as e:  # bad window/pad — usage-class error, like
        log.error("repack-epoch: %s", e)  # export-training's contract
        return 2
    n = windows.count()
    if n == 0:
        log.error(
            "repack-epoch: store %s is empty or missing — run "
            "token-store (or a shard-sink stream) first", store,
        )
        return 3
    log.info("repacked %d windows to %s", n, dst)
    return 0


def run_preflight(argv: list[str]) -> int:
    """`python -m s3_access_logs_spark preflight <src-or-store>
    [--window N] [--unk-threshold T]` — the export pre-flight at the
    operational layer (round 12, VERDICT r11 item 5): prints the
    per-source fit + layout gate rows and exits 3 when any source's
    `unk_flag` fires (the id streams would train noise — a cron
    wrapper must see it). A TOKEN STORE argument (detected by its
    `_token_store_meta.json` sidecar or `shard=` layout) is scanned
    directly via `store_preflight_report` — ids only, no
    re-tokenizing; anything else is treated as a corpus (an sf-style
    table dir containing documents.parquet) and gated through the
    corpus-mode `sql_preflight_gate` views. Exit 2 on
    usage/unreadable input."""
    from pyspark.sql import functions as F

    usage = (
        "usage: preflight <src-or-store> [--window N]"
        " [--unk-threshold T]"
    )
    parsed = _parse_flags(
        argv, {"--window": int, "--unk-threshold": float}, usage
    )
    if parsed is None:
        return 2
    pos, vals = parsed
    if len(pos) != 1:
        log.error(usage)
        return 2
    src = pos[0]
    threshold = float(vals.get("--unk-threshold", 0.25))
    spark = get_spark("s3-access-logs-preflight")

    def _is_token_store() -> bool:
        from s3_access_logs_spark.operators.export import (
            TOKEN_STORE_META,
        )
        from s3_access_logs_spark.sources.fsutil import hadoop_fs

        fs, root = hadoop_fs(spark, src)
        if not fs.exists(root):
            return False
        HPath = spark._jvm.org.apache.hadoop.fs.Path
        if fs.exists(HPath(f"{src.rstrip('/')}/{TOKEN_STORE_META}")):
            return True
        return any(
            st.isDirectory()
            and st.getPath().getName().startswith("shard=")
            for st in fs.listStatus(root)
        )

    try:
        if _is_token_store():
            from s3_access_logs_spark.operators.export import (
                store_preflight_report,
            )

            df = store_preflight_report(
                spark, src,
                window_ids=int(vals.get("--window", 256)),
                unk_threshold=threshold,
            )
        else:
            # corpus mode: the sql_preflight_gate views over the given
            # sf dir / documents parquet, re-thresholded to the flag
            from s3_access_logs_spark.plans.catalog import load_all

            if "--window" in vals:
                log.error(
                    "preflight: --window applies to token stores only "
                    "(the corpus-mode gate packs at its fixed demo "
                    "window); %s", usage,
                )
                return 2
            df = load_all()["sql_preflight_gate"].builder(spark, src)
            df = df.withColumn(
                "unk_flag",
                F.coalesce(F.col("unk_rate"), F.lit(0.0))
                > F.lit(threshold),
            )
        rows = df.collect()
    except Exception as e:  # noqa: BLE001 — unreadable input is exit 2
        log.error("preflight: %s", e)
        return 2
    if not rows:
        log.error("preflight: %s holds no documents/ids", src)
        return 3
    for r in rows:
        log.info("  %s", r.asDict())
    flagged = [r["source"] for r in rows if r["unk_flag"]]
    if flagged:
        log.error(
            "preflight: unk_flag fired for source(s) %s (unk_rate > "
            "%s) — the vocab and this corpus disagree; exporting would "
            "train on unk soup", flagged, threshold,
        )
        return 3
    log.info("preflight: all %d source row(s) under the gate", len(rows))
    return 0


def run_purge(argv: list[str]) -> int:
    """`python -m s3_access_logs_spark purge <ids> [--token-store P]
    [--digest-store P] [--band-store P] [--ivf-index P]` — the
    takedown / retroactive-decontamination path at the operational
    layer (round 12): remove a document-id set from every given store
    (operators/purge.py — affected leaves only, stage-and-swap,
    sidecars untouched). ``ids`` is a comma-separated id list, or
    ``@<path>`` naming a one-id-per-line text file (the shape a
    decontamination report exports). At least one store is required;
    per-store purge counts are printed. Idempotent — re-running after
    a crash or a partial run converges, exit 0 either way; exit 2 on
    usage errors (no stores, unparseable ids, wrong store kind)."""
    from s3_access_logs_spark.operators.purge import purge_documents

    usage = (
        "usage: purge <ids|@ids-file> [--token-store P]"
        " [--digest-store P] [--band-store P] [--ivf-index P]"
    )
    parsed = _parse_flags(
        argv,
        {"--token-store": str, "--digest-store": str,
         "--band-store": str, "--ivf-index": str},
        usage,
    )
    if parsed is None:
        return 2
    pos, vals = parsed
    if len(pos) != 1:
        log.error(usage)
        return 2
    stores = {
        "token_store": vals.get("--token-store"),
        "digest_store": vals.get("--digest-store"),
        "band_store": vals.get("--band-store"),
        "ivf_index": vals.get("--ivf-index"),
    }
    if not any(stores.values()):
        log.error("purge: no store given — nothing to purge; %s", usage)
        return 2
    raw = pos[0]
    try:
        if raw.startswith("@"):
            with open(raw[1:], encoding="utf-8") as f:
                ids = [int(x) for x in f.read().split() if x.strip()]
        else:
            ids = [int(x) for x in raw.split(",") if x.strip()]
    except (OSError, ValueError) as e:
        log.error("purge: cannot read id set %r: %s; %s", raw, e, usage)
        return 2
    if not ids:
        log.error("purge: empty id set; %s", usage)
        return 2
    spark = get_spark("s3-access-logs-purge")
    try:
        res = purge_documents(spark, ids, **{
            k: v for k, v in stores.items() if v
        })
    except ValueError as e:  # wrong store kind / id-set guard
        log.error("purge: %s", e)
        return 2
    total = 0
    for kind, r in res.items():
        log.info(
            "  %-12s purged %d row(s), rewrote %d leaf dir(s)",
            kind, r["rows_purged"], r["leaves_rewritten"],
        )
        total += r["rows_purged"]
    log.info(
        "purged %d row(s) for %d id(s) across %d store(s)",
        total, len(ids), len(res),
    )
    return 0


def main(env: dict[str, str] | None = None) -> int:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    if len(sys.argv) > 1 and sys.argv[1] == "query":
        return run_query(sys.argv[2:])
    if len(sys.argv) > 1 and sys.argv[1] == "sql":
        return run_sql(sys.argv[2:])
    if len(sys.argv) > 1 and sys.argv[1] == "compact":
        return run_compact(sys.argv[2:])
    if len(sys.argv) > 1 and sys.argv[1] == "fold-store":
        return run_fold_store(sys.argv[2:])
    if len(sys.argv) > 1 and sys.argv[1] == "export-training":
        return run_export_training(sys.argv[2:])
    if len(sys.argv) > 1 and sys.argv[1] == "token-store":
        return run_token_store(sys.argv[2:])
    if len(sys.argv) > 1 and sys.argv[1] == "repack-epoch":
        return run_repack_epoch(sys.argv[2:])
    if len(sys.argv) > 1 and sys.argv[1] == "preflight":
        return run_preflight(sys.argv[2:])
    if len(sys.argv) > 1 and sys.argv[1] == "purge":
        return run_purge(sys.argv[2:])
    cfg = JobConfig.from_env(env)
    marker = _marker(cfg)
    if marker is not None and marker.exists():
        # idempotency gate (reference: cmd/export.py:319-324). Kept for
        # cron-contract parity even though the dynamic-partition-overwrite
        # write is itself idempotent.
        log.info("hour %s already exported, skipping", cfg.hour)
        return 0
    spark = get_spark("s3-access-logs-export", extra_conf=cfg.s3a_conf())
    # Job-level timeout (reference: TIMEOUT env, 300 s default,
    # export.py:259 + wg.py:27-31). A watchdog cancels every Spark job at
    # the deadline; the interrupted action raises, we exit 1, and the next
    # cron invocation's idempotent dynamic-overwrite write repairs the
    # partial hour. Armed BEFORE preflight: its read test counts lines of
    # a real input file, which is exactly where a stalling endpoint (or a
    # multi-GB first file) would otherwise hang the cron slot forever.
    timed_out = threading.Event()

    def _cancel() -> None:
        timed_out.set()
        log.error(
            "timeout: %ds elapsed, cancelling all Spark jobs", cfg.timeout
        )
        spark.sparkContext.cancelAllJobs()

    timer: threading.Timer | None = None
    if cfg.timeout and cfg.timeout > 0:
        timer = threading.Timer(cfg.timeout, _cancel)
        timer.daemon = True
        timer.start()
    try:
        rc = preflight(spark, cfg)
        if rc != 0:
            return rc
        n = export_hour(
            spark,
            cfg.src,
            cfg.dst,
            hour=cfg.hour,
            reference_filenames=cfg.reference_filenames,
        )
    except Exception:
        if timed_out.is_set():
            log.exception("export killed by %ds timeout", cfg.timeout)
            return 1
        raise
    finally:
        if timer is not None:
            timer.cancel()
    if n == 0:
        log.info("no input files for hour %s", cfg.hour)
        return 0
    if marker is not None:
        marker.parent.mkdir(parents=True, exist_ok=True)
        # same two-step touch-then-write as the reference (export.py:158-168)
        marker.touch()
        marker.write_text(f"exported {n} rows for {cfg.hour}\n")
    log.info("exported %d rows for hour %s", n, cfg.hour)
    return 0


if __name__ == "__main__":
    sys.exit(main())
