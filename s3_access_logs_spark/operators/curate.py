"""One-call batch corpus curation: the full training-data cleaning
pipeline (exact dedup -> heuristic gates -> optional LM / classifier
gates -> near-dup clustering -> benchmark decontamination) composed as
ONE lazy flags frame, so the per-stage accounting costs one aggregation
and the survivor write costs one more pass — never one job per stage.

Every stage reuses the tested single-purpose operators (operators.dedup,
functions.text, functions.lm, operators.quality_classifier); this module
adds only the sequencing, the waterfall accounting, and the persist that
keeps the two consumers (report + output) from recomputing the lineage.

Waterfall semantics: a document counts against the FIRST stage that
rejects it, in the fixed order above — the numbers answer "what did each
gate uniquely cost me", and summing the report's ``dropped`` column plus
the survivors equals the input row count exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from s3_access_logs_spark.functions.text import lang_id, quality_score
from s3_access_logs_spark.operators.dedup import (
    dedup_clusters,
    first_duplicate_id,
    ngram_overlap,
    normalized_digest,
)

STAGES = (
    "empty",
    "line_ratio",
    "exact_dup",
    "quality",
    "language",
    "script",
    "perplexity",
    "classifier",
    "near_dup",
    "contained",
    "semantic",
    "contaminated",
)

def _assert_owns_partition(spark, store: str, batch_id: int) -> None:
    """Refuse to append over a ``batch_id`` partition this pipeline did
    not write. curate_corpus shares the streaming ingest's store layout
    and id space; without the check, a colliding id would silently
    REPLACE a stream-committed history partition via dynamic partition
    overwrite — those documents' digests vanish and future batches
    re-ingest them as new (review r5). Ownership is a ``_``-prefixed
    STORE-ROOT marker file (invisible to every parquet reader, and —
    unlike an in-partition file — untouched by the partition overwrite
    itself) stamped BEFORE the first write, so a crashed-attempt REPLAY
    of the same curate batch passes while a foreign partition fails
    loudly, with no crash window in which committed curate rows sit
    unmarked. The reverse direction is enforced inside
    ``streaming.pipeline.write_batch_partition``: stream sinks refuse
    MARKED partitions, so neither writer can clobber the other. The
    check-then-claim window is not transactional — the store contract
    assumes one maintenance writer at a time (the same assumption
    ``compact_ingest_store`` documents); a stream and a curate run
    racing the SAME new batch_id within milliseconds is outside it."""
    from s3_access_logs_spark.sources.fsutil import (
        CURATE_MARKER,
        hadoop_fs,
        partition_has_marker,
    )

    fs, _ = hadoop_fs(spark, store)
    HPath = spark._jvm.org.apache.hadoop.fs.Path
    part = f"{store.rstrip('/')}/batch_id={batch_id}"
    if fs.exists(HPath(part)) and not partition_has_marker(
        spark, store, batch_id
    ):
        raise ValueError(
            f"curate_corpus: batch_id={batch_id} already exists in "
            f"{store!r} and was not written by curate_corpus (no "
            f"{CURATE_MARKER} marker) — appending would overwrite "
            "another writer's history partition (silent duplicate "
            "re-ingestion downstream). Pick an unused batch id; if this "
            "partition is a crashed curate attempt whose marker was "
            "lost, delete the partition directory and rerun."
        )


class _DeferredReport:
    """Handle returned by ``curate_corpus(..., _observe_report=True)``:
    the waterfall is collected as CollectMetrics (``DataFrame.observe``)
    riding the CALLER'S first action over the survivors frame, instead
    of an eager report pass of its own — the batch export paths
    (``export_training_set`` / ``write_token_store``) execute the gate
    stack exactly once this way (guide §2.4: remove whole passes; the
    r13 flags-cache handoff attempt bought the same single execution by
    persisting corpus text + flags and lost 4-25 s to memory pressure —
    an observation ships twelve counters instead). ``resolve()`` blocks
    until that first action has run, then builds the exact report frame
    the eager path builds (stages with >= 1 drop, same schema).

    One measured corner: when the caller persists a result that comes
    out EMPTY (zero survivors), AQE's empty-relation propagation can
    eliminate the CollectMetrics node from the outer cached-read query,
    which then completes the observation with a schemaless empty row —
    ``Observation.get`` raises (KeyError on the stage names) instead of
    returning counts. A non-empty trunk cannot hit this (the node sits
    on the main lineage, so empty propagation implies zero output
    rows). ``resolve`` falls back to the eager aggregate over the
    retained flags lineage in exactly that corner — one extra gate pass
    on the rare all-dropped export, zero cost everywhere else.

    ORDERING (ADVICE r13): the observation only completes when the
    caller's first action over the survivors frame runs. ``resolve``
    therefore waits a BOUNDED 2 s for the metrics row instead of
    blocking forever — a caller that resolves before acting (nothing in
    this repo does, but ``export.resolve_report`` is public) gets a
    RuntimeWarning and the eager recompute, never a deadlock. Any
    failure mode other than the two known ones (empty-cache corner,
    no-action-yet) also warns before recomputing, so unexpected
    observation breakage is visible instead of a quiet 2x-cost pass."""

    def __init__(self, observation, spark, flags: DataFrame) -> None:
        self._obs = observation
        self._spark = spark
        self._flags = flags  # lineage handle only (never persisted here)

    def _eager_rows(self):
        return (
            self._flags.groupBy(F.col("_verdict").alias("stage"))
            .agg(F.count("*").alias("dropped"))
            .filter(F.col("stage") != "kept")
            .collect()
        )

    def resolve(self) -> DataFrame:
        import threading
        import warnings

        # bounded wait in a daemon thread (no JVM-private API): in the
        # contract flow the caller's action already ran, so .get returns
        # in milliseconds; a mis-ordered caller hits the timeout instead
        # of deadlocking (the thread completes harmlessly later, or dies
        # with the process)
        box: dict = {}

        def _fetch() -> None:
            try:
                box["got"] = self._obs.get
            except Exception as e:  # noqa: BLE001 — classified below
                box["err"] = e

        t = threading.Thread(
            target=_fetch, daemon=True, name="curate-report-observation"
        )
        t.start()
        t.join(2.0)
        if t.is_alive():
            warnings.warn(
                "curate report observation not completed after 2 s — "
                "resolve_report was called before the caller's first "
                "action over the survivors frame; recomputing the "
                "report eagerly (one extra gate pass). Run the export/"
                "store action first to avoid the recompute.",
                RuntimeWarning,
                stacklevel=2,
            )
            rows = self._eager_rows()
        else:
            try:
                if "err" in box:
                    raise box["err"]
                got = box["got"]
                rows = [(s, int(got[s])) for s in STAGES if got[s]]
            except KeyError:  # the empty-cached-result corner (see above)
                rows = self._eager_rows()
            except Exception as e:  # noqa: BLE001 — unexpected: warn loud
                warnings.warn(
                    f"curate report observation failed unexpectedly "
                    f"({type(e).__name__}: {e}); recomputing the report "
                    "eagerly — investigate, this costs a full gate pass",
                    RuntimeWarning,
                    stacklevel=2,
                )
                rows = self._eager_rows()
        return self._spark.createDataFrame(
            rows or [], "stage string, dropped bigint"
        )


def _claimed_append(df, batch_id: int, store: str) -> None:
    """Claim-first store append: stamp the root ownership marker, then
    write. The marker survives the partition overwrite and any crash,
    so the partition is never committed-but-unmarked (review r5). If
    the WRITE fails without a crash, a claim this call created is
    released again — otherwise the failed id would sit permanently
    poisoned for stream sinks with a misleading 'committed by
    curate_corpus' refusal (review r5). A pre-existing claim (replay
    over a previously committed curate partition) is NOT released on
    failure: the prior commit's surviving rows must stay guarded."""
    from s3_access_logs_spark.sources.fsutil import (
        partition_has_marker,
        remove_partition_marker,
        touch_partition_marker,
    )
    from s3_access_logs_spark.streaming.pipeline import (
        write_batch_partition,
    )

    spark = df.sparkSession
    fresh_claim = not partition_has_marker(spark, store, batch_id)
    touch_partition_marker(spark, store, batch_id)
    try:
        write_batch_partition(df, batch_id, store, allow_curate=True)
    except BaseException:
        if fresh_claim:
            remove_partition_marker(spark, store, batch_id)
        raise


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float | None = None,
    langs: tuple[str, ...] | None = None,
    scripts: tuple[str, ...] | None = None,
    lm_model: DataFrame | None = None,
    max_xent: float | None = None,
    classifier=None,
    min_prob: float = 0.5,
    near_dup: bool = False,
    drop_contained: bool = False,
    containment_threshold: float = 0.8,
    embeddings: DataFrame | None = None,
    emb_id_col: str = "vec_id",
    emb_col: str = "embedding",
    semantic_threshold: float = 0.9,
    semantic_centroids: DataFrame | None = None,
    semantic_nlist: int | None = None,
    benchmark: DataFrame | None = None,
    max_overlap: float = 0.5,
    html: bool = False,
    normalize: bool = False,
    line_clean: bool = False,
    min_line_ratio: float | None = None,
    boilerplate_min_docs: int | None = None,
    dst: str | None = None,
    digest_store: str | None = None,
    band_store: str | None = None,
    store_batch_id: int | None = None,
    verify_unique_ids: bool = True,
    _observe_report: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Returns ``(survivors, report)``: the kept rows (original columns)
    and a waterfall ``(stage, dropped)`` with one row per enabled stage.

    Optional stages activate by argument: ``min_quality`` (heuristic
    score gate), ``langs`` (allow-list), ``scripts`` (dominant-Unicode-
    script allow-list, functions.text.dominant_script — the wordlist-
    free multilingual gate), ``lm_model`` + ``max_xent``
    (bigram-LM cross-entropy gate, functions.lm), ``classifier`` +
    ``min_prob`` (trained quality model, operators.quality_classifier),
    ``near_dup`` (MinHash+LSH cluster keep-first), ``drop_contained`` +
    ``containment_threshold`` (asymmetric subset-dup removal,
    operators.dedup.containment_pairs — keeps the superset),
    ``embeddings`` (+ ``semantic_threshold``/``semantic_centroids``/
    ``semantic_nlist``) — SemDeDup-style semantic dedup
    (operators.similarity.semantic_dedup): an ``(emb_id_col, emb_col)``
    frame keyed by document id; a doc whose embedding has cosine
    similarity above the threshold to a lower-id GATE-PASSING doc in
    the same quantizer cluster drops as ``semantic``; docs with no
    embedding row pass (no signal is not a rejection, the perplexity
    convention). NULL and zero-length vectors are likewise no-signal;
    RAGGED vectors fail LOUD in the quantizer fit's dims check — on a
    dirty corpus pre-filter with ``similarity.well_formed_vector`` (the
    catalog entry routes through ``well_formed_embeddings``).
    Centroids come from ``semantic_centroids`` or a
    spherical k-means fit over the eligible embeddings
    (``semantic_nlist`` clusters, default ~sqrt(n) — the standard IVF
    sizing keeping every within-cluster pair block sub-quadratic); and
    ``benchmark`` + ``max_overlap`` (n-gram decontamination). Exact
    dedup always runs — a curation pass that can emit byte-duplicates
    is not curation.

    ``_observe_report`` (INTERNAL — the batch export paths): return a
    ``_DeferredReport`` handle in place of the report frame, its counts
    collected as CollectMetrics during the caller's first action over
    the survivors, so the gate stack executes once per export. Ignored
    (eager path) when ``dst``/``store_batch_id`` is set — those already
    materialize survivors under the scoped cache.

    ``verify_unique_ids`` (default True) enforces the ``id_col``
    uniqueness contract at entry with one column-pruned aggregation —
    a duplicate-id corpus raises instead of silently corrupting
    join-backs and waterfall counts; NULL ids are exempt (their
    handling is the documented per-consumer contract). Pass False on
    perf-critical reruns where the key is enforced upstream.

    TRANSFORM options rewrite the text before any gate (same order as
    the streaming ingest): ``html`` (strip_html), ``normalize``
    (NFKC + mojibake repair), ``line_clean`` (line-furniture removal)
    with ``min_line_ratio`` dropping documents whose kept-line fraction
    fell below the bar — measured before the rewrite — and
    ``boilerplate_min_docs`` cutting lines shared by that many distinct
    documents (operators.dedup.drop_boilerplate_lines; the one
    corpus-wide transform). Survivors carry the transformed text.

    INCREMENTAL mode (VERDICT r4 item 5): ``digest_store`` /
    ``band_store`` point the exact-dup and near-dup stages at the same
    append-only hive stores the streaming ingest maintains
    (streaming/pipeline.py:ingest_documents_stream), so a daily crawl
    batch curates against corpus HISTORY, not just itself. A document
    whose normalized digest is already committed drops as ``exact_dup``
    (the whole digest group — there is no keeper to elect against
    history); a gate-passing document whose MinHash bands collide with
    the stored bands drops as ``near_dup`` (and is excluded from the
    within-batch clustering so it cannot be elected a keeper that then
    vanishes). With ``store_batch_id`` set (non-negative; negative ids
    are the fold base), the batch's surviving digests (and bands, when
    ``band_store`` is given) append under ``batch_id=<n>`` with dynamic
    partition overwrite — the identical replay-idempotent layout the
    streaming gates read, the digest partition committing before the
    band partition (a crash between them loses future detections,
    never documents). Reads exclude the current ``store_batch_id`` so
    an at-least-once rerun never self-collides. Without
    ``store_batch_id`` the stores are read-only gates.

    ``dst`` is the production path: survivors are written to parquet
    while the call's scoped cache is live and the returned frame is the
    re-read — later consumption costs a scan, not a pipeline recompute.
    Without ``dst`` the returned survivors re-derive their lineage on
    use (the price of returning a composable lazy frame with no
    session-lifetime cache retained).

    Cost model: heuristic gates are pure columns (free in the scan);
    exact dedup is one window shuffle; the LM gate adds the bigram
    explode + one doc-grain join; the classifier is a narrow pass;
    near-dup runs the full candidate+connected-components machinery
    (the expensive stage — leave it off when the incremental band store
    already guards ingest); decontamination is a broadcast-shingle
    join. The report materializes EAGERLY at call time (a handful of
    rows) under a scoped persist that is released before returning —
    no session-lifetime cache leak; consuming ``survivors`` afterwards
    re-derives the cheap column flags while the expensive sub-results
    (connected components) are lineage-truncated internally."""
    # ``_observe_report`` (internal, the batch export paths): collect
    # the waterfall via CollectMetrics on the survivors lineage and
    # return a ``_DeferredReport`` instead of an eager report frame —
    # the caller's own first action over the survivors both computes
    # its artifact AND yields the counts, so the gate stack (quality/
    # lang regexes + the exact-dup digest window shuffle) executes ONCE
    # per export instead of once for the report and again for the
    # write. Falls back to the eager path when this call itself
    # materializes survivors (``dst``/``store_batch_id``): those paths
    # already reuse the scoped flags cache, and deferring would ADD an
    # execution rather than remove one.
    if _observe_report and (dst is not None or store_batch_id is not None):
        _observe_report = False
    # cheap (driver-only / metadata-only) argument validation FIRST
    # (review r9): an invalid-argument call must not pay the
    # id-uniqueness corpus scan below before it fails
    if min_line_ratio is not None and not line_clean:
        raise ValueError(
            "curate_corpus: min_line_ratio needs line_clean=True — the "
            "ratio is defined by the line filter's verdicts"
        )
    if semantic_nlist is not None and semantic_nlist < 1:
        # without this, 0 would fall through `semantic_nlist or ...` to
        # the auto size while keeping explicit-k crash semantics — an
        # inconsistent hybrid the caller never chose (review r5)
        raise ValueError(
            f"curate_corpus: semantic_nlist must be >= 1, got "
            f"{semantic_nlist}"
        )
    if store_batch_id is not None:
        if digest_store is None and band_store is None:
            raise ValueError(
                "curate_corpus: store_batch_id without digest_store or "
                "band_store appends nothing — pass a store path, or drop "
                "the batch id"
            )
        if store_batch_id < 0:
            raise ValueError(
                f"curate_corpus: store_batch_id must be non-negative "
                f"(negative ids are compact_ingest_store's fold base), "
                f"got {store_batch_id}"
            )
        for _store in (digest_store, band_store):
            if _store is not None:
                _assert_owns_partition(
                    docs.sparkSession, _store, store_batch_id
                )
    # id-uniqueness gate (VERDICT r8 item 6): doc_id uniqueness was a
    # documented schema contract but unchecked — a duplicate-id corpus
    # silently corrupts every join-back and waterfall count (per-id
    # semantics become engine-defined). One column-pruned agg +
    # limit(1) over the id column, fail-loud with an example id; NULL
    # ids stay exempt (their handling is the per-consumer contract the
    # dirty sweeps pin). ``verify_unique_ids=False`` skips the scan for
    # perf-critical callers who enforce the key upstream.
    if verify_unique_ids:
        dup = first_duplicate_id(docs, id_col)
        if dup is not None:
            raise ValueError(
                f"curate_corpus: duplicate {id_col} "
                f"{dup[id_col]!r} (x{dup['_n']}) — doc ids must "
                "be unique (join-backs and waterfall counts key on "
                "them); fix the corpus, or pass "
                "verify_unique_ids=False if the key is enforced "
                "upstream"
            )
    # TRANSFORM stages (same order as the streaming ingest: markup off,
    # then byte canonicalization, then line furniture) — every gate
    # below, the stored digest included, sees the cleaned text, and
    # survivors carry it. ``min_line_ratio`` turns line-cleaning loss
    # into a drop gate: a page that was mostly furniture is not made
    # good by deleting its furniture.
    if html:
        from s3_access_logs_spark.functions.text import strip_html

        docs = docs.withColumn(text_col, strip_html(text_col))
    if normalize:
        from s3_access_logs_spark.functions.text import normalize_unicode

        docs = normalize_unicode(docs, text_col=text_col)
    _line_ratio = None
    if line_clean:
        from s3_access_logs_spark.functions.text import (
            clean_lines,
            line_kept_ratio,
        )

        # ratio measured BEFORE the rewrite (afterwards every doc keeps
        # 100% of its remaining lines by construction)
        _line_ratio = line_kept_ratio(text_col)
        docs = docs.withColumn("_line_ratio", _line_ratio).withColumn(
            text_col, clean_lines(text_col)
        )
    if boilerplate_min_docs is not None:
        from s3_access_logs_spark.operators.dedup import (
            drop_boilerplate_lines,
        )

        # the one transform that is corpus-wide rather than in-row (its
        # line-hash count is a shuffle — cost stated in its docstring);
        # runs LAST so per-document cleaners have already removed local
        # noise before lines are compared across documents
        docs = drop_boilerplate_lines(
            docs,
            id_col=id_col,
            text_col=text_col,
            min_docs=boilerplate_min_docs,
        )
    flags = docs
    # NULL/blank text first and explicitly: every later gate compares
    # against NULL (quality_score(NULL) < t is NULL, which the waterfall
    # reads as "passed"), so without this stage empty documents would
    # slip through the whole stack and land in the output
    flags = flags.withColumn(
        "_f_empty",
        F.col(text_col).isNull() | (F.trim(F.col(text_col)) == ""),
    )
    flags = flags.withColumn(
        "_f_line_ratio",
        (
            (F.col("_line_ratio") < min_line_ratio)
            & ~F.col("_f_empty")
        )
        if min_line_ratio is not None
        else F.lit(False),
    )
    flags = flags.withColumn(
        "_f_quality",
        (quality_score(text_col) < min_quality)
        if min_quality is not None
        else F.lit(False),
    )
    flags = flags.withColumn(
        "_f_language",
        (~lang_id(text_col).isin(*langs))
        if langs is not None
        else F.lit(False),
    )
    if scripts is not None:
        from s3_access_logs_spark.functions.text import dominant_script

        flags = flags.withColumn(
            "_f_script", ~dominant_script(text_col).isin(*scripts)
        )
    else:
        flags = flags.withColumn("_f_script", F.lit(False))
    if lm_model is not None and max_xent is not None:
        from s3_access_logs_spark.functions.lm import perplexity_score

        ppl = perplexity_score(
            docs, lm_model, text_col=text_col, id_col=id_col
        ).select(id_col, "xent")
        flags = flags.join(ppl, id_col, "left").withColumn(
            # no bigram evidence (NULL xent) passes — don't reject on
            # absence of signal
            "_f_perplexity",
            F.coalesce(F.col("xent") > max_xent, F.lit(False)),
        ).drop("xent")
    else:
        flags = flags.withColumn("_f_perplexity", F.lit(False))
    if classifier is not None:
        from s3_access_logs_spark.operators.quality_classifier import (
            score_quality,
        )

        flags = score_quality(
            flags, classifier, text_col=text_col
        ).withColumn(
            "_f_classifier", F.col("quality_prob") < min_prob
        ).drop("quality_prob")
    else:
        flags = flags.withColumn("_f_classifier", F.lit(False))
    # Contamination is COMPUTED before the dedup stages (attribution
    # order in STAGES is unchanged): it is a per-document property, and
    # a contaminated document must not elect itself keeper/superset —
    # the benchmark-bearing superset would otherwise drop its clean
    # subset and then be dropped itself, erasing the content entirely.
    if benchmark is not None:
        dirty = ngram_overlap(
            docs, benchmark, id_col=id_col, text_col=text_col
        ).filter(F.col("overlap") >= max_overlap).select(
            F.col("id").alias(id_col), F.lit(True).alias("_hit")
        )
        flags = flags.join(dirty, id_col, "left").withColumn(
            "_f_contaminated", F.coalesce(F.col("_hit"), F.lit(False))
        ).drop("_hit")
    else:
        flags = flags.withColumn("_f_contaminated", F.lit(False))
    # Exact-dup keeper election — among rows passing the per-document
    # gates, not blindly by min id: normalized_digest collapses case and
    # whitespace, so digest-sharing rows are NOT byte-identical and can
    # get different verdicts from the case/line-sensitive gates
    # (line_ratio's kept-line measure, uppercase-sensitive quality/
    # script checks). A blind min-id keeper could fail such a gate while
    # its passing variant was dropped as exact_dup — erasing the content
    # entirely, the exact failure mode the near_dup/contained stages are
    # structured to avoid (ADVICE r4). Ordering each digest group by
    # "fails any per-document gate" first and id second makes the keeper
    # the min-id PASSING row; when the whole group fails, min id wins
    # and attribution lands on the real gate.
    _doc_gates = [
        s
        for s in STAGES
        if s not in ("exact_dup", "near_dup", "contained", "semantic")
    ]
    gate_fail = F.lit(False)
    for s in _doc_gates:
        gate_fail = gate_fail | F.col(f"_f_{s}")
    flags = flags.withColumn("_gate_fail", gate_fail.cast("int"))
    w = Window.partitionBy(normalized_digest(F.col(text_col))).orderBy(
        "_gate_fail", id_col
    )
    flags = flags.withColumn(
        "_f_exact_dup",
        (F.row_number().over(w) > 1) & ~F.col("_f_empty"),
    ).drop("_gate_fail")
    if digest_store is not None:
        # history gate: a digest already committed to the store drops the
        # WHOLE batch group (keeper included — history holds the keeper).
        # Replay safety mirrors the streaming read: the current batch's
        # own partition is excluded so a rerun never self-collides.
        from s3_access_logs_spark.sources.fsutil import has_data_files
        from s3_access_logs_spark.streaming.pipeline import (
            check_no_fold_residue,
        )

        sess = docs.sparkSession
        check_no_fold_residue(sess, digest_store)
        if has_data_files(sess, digest_store):
            hist = sess.read.parquet(digest_store)
            if store_batch_id is not None:
                hist = hist.filter(F.col("batch_id") != store_batch_id)
            seen = (
                hist.select(F.col("digest").alias("_seen_digest"))
                .distinct()
                .withColumn("_seen", F.lit(True))
            )
            flags = (
                flags.withColumn(
                    "_digest", normalized_digest(F.col(text_col))
                )
                .join(
                    seen,
                    F.col("_digest") == F.col("_seen_digest"),
                    "left",
                )
                .withColumn(
                    "_f_exact_dup",
                    F.col("_f_exact_dup")
                    | (
                        F.coalesce(F.col("_seen"), F.lit(False))
                        & ~F.col("_f_empty")
                    ),
                )
                .drop("_seen_digest", "_seen", "_digest")
            )
    # The dedup stages run over the SURVIVORS of every other gate, not
    # the raw corpus: clustering raw docs could elect a keeper (min-id
    # representative / containment superset) that another gate already
    # rejected, dropping every member of the group and erasing the
    # content entirely.
    _pre_dedup = [
        s for s in STAGES if s not in ("near_dup", "contained", "semantic")
    ]
    eligible_pred = F.lit(True)
    for s in _pre_dedup:
        eligible_pred = eligible_pred & ~F.col(f"_f_{s}")
    # ONE scoped persist of the pre-dedup flags frame covers everything
    # downstream: the dedup stages filter it (their several input scans
    # hit the cache), the report aggregates it, and the dst write reads
    # it — the whole gate stack (LM join included) executes once per
    # call. Both dedup RESULTS are lineage-truncated (CC checkpoints
    # internally; the contained-id set localCheckpoints eagerly below),
    # so the cache can release before returning and the survivors frame
    # never re-enters the expensive stages.
    _scoped: list[DataFrame] = []
    # ONE try/finally covers the whole stage + report + write sequence:
    # every scoped persist is released on ANY exit — a failing stage
    # (ragged vector, store error) must not pin the cached gate stack
    # in executor storage for the session lifetime (review r5).
    # localCheckpointed intermediates (store_hits/contained/dropped_sem)
    # are NOT in _scoped: on success the survivors' lineage references
    # them (the whole point of the truncation), and on failure the
    # ContextCleaner reclaims them when the frames go unreferenced —
    # explicit release here would corrupt the success path.
    try:
        if (
            near_dup
            or drop_contained
            or band_store is not None
            or embeddings is not None
        ):
            flags = flags.persist()
            _scoped.append(flags)
        _bands_for_append = None
        if band_store is not None:
            # history near-dup gate BEFORE within-batch clustering: a doc
            # colliding with the stored bands must drop, and excluding it
            # from the clustering below keeps it from being elected a
            # keeper whose batch-mates vanish with it.
            from s3_access_logs_spark.operators.dedup import (
                near_dup_incremental,
            )
            from s3_access_logs_spark.sources.fsutil import has_data_files
            from s3_access_logs_spark.streaming.pipeline import (
                check_no_fold_residue,
            )

            sess = docs.sparkSession
            check_no_fold_residue(sess, band_store)
            if has_data_files(sess, band_store):
                hist_bands = sess.read.parquet(band_store)
                if store_batch_id is not None:
                    hist_bands = hist_bands.filter(
                        F.col("batch_id") != store_batch_id
                    )
                seen_bands = hist_bands.select("id", "band_idx", "band_key")
            else:
                seen_bands = sess.createDataFrame(
                    [], "id long, band_idx int, band_key string"
                )
            eligible0 = flags.filter(eligible_pred).select(id_col, text_col)
            hits, _bands_for_append = near_dup_incremental(
                eligible0, seen_bands, id_col=id_col, text_col=text_col
            )
            store_hits = (
                hits.select(F.col("new_id").alias(id_col))
                .distinct()
                .withColumn("_bhit", F.lit(True))
                .localCheckpoint()
            )
            flags = flags.join(store_hits, id_col, "left").withColumn(
                "_f_near_dup_store",
                F.coalesce(F.col("_bhit"), F.lit(False)),
            ).drop("_bhit")
        else:
            flags = flags.withColumn("_f_near_dup_store", F.lit(False))
        if near_dup:
            eligible = flags.filter(
                eligible_pred & ~F.col("_f_near_dup_store")
            ).select(id_col, text_col)
            clusters = dedup_clusters(
                eligible, id_col=id_col, text_col=text_col
            )
            flags = flags.join(clusters, id_col, "left").withColumn(
                "_f_near_dup",
                F.coalesce(
                    F.col("cluster_id") != F.col(id_col), F.lit(False)
                ),
            ).drop("cluster_id")
        else:
            flags = flags.withColumn("_f_near_dup", F.lit(False))
        flags = flags.withColumn(
            "_f_near_dup", F.col("_f_near_dup") | F.col("_f_near_dup_store")
        ).drop("_f_near_dup_store")
        if drop_contained:
            from s3_access_logs_spark.operators.dedup import containment_pairs

            eligible2 = flags.filter(
                eligible_pred & ~F.col("_f_near_dup")
            ).select(id_col, text_col)
            contained = (
                containment_pairs(
                    eligible2,
                    id_col=id_col,
                    text_col=text_col,
                    threshold=containment_threshold,
                )
                .select(F.col("contained_id").alias(id_col))
                .distinct()
                .withColumn("_sub", F.lit(True))
                .localCheckpoint()
            )
            flags = flags.join(contained, id_col, "left").withColumn(
                "_f_contained", F.coalesce(F.col("_sub"), F.lit(False))
            ).drop("_sub")
        else:
            flags = flags.withColumn("_f_contained", F.lit(False))
        if embeddings is not None:
            from s3_access_logs_spark.operators.similarity import (
                kmeans_fit,
                semantic_dedup,
            )

            # keeper election among GATE-PASSING docs only (the shared
            # dedup-stage pattern): a doc may only be dominated by a doc
            # that itself survives every earlier stage, so dropping it
            # never erases content whose canonical copy was rejected
            eligible3 = flags.filter(
                eligible_pred
                & ~F.col("_f_near_dup")
                & ~F.col("_f_contained")
            ).select(id_col)
            # persisted: the frame below is read by the nlist sizing job,
            # every kmeans iteration, and three references inside the dedup
            # self-join plan — without the cache each would re-scan the
            # embeddings source and re-run the join (review r5). NULL
            # and zero-length vectors are out here, not downstream: a
            # doc whose embedding row carries no usable vector has no
            # signal — it passes, same as a doc with no row at all (and
            # a frame with none must skip the fit, not crash it —
            # review r5)
            cand = eligible3.join(
                embeddings.filter(
                    F.col(emb_col).isNotNull()
                    & (F.size(F.col(emb_col)) > 0)
                ).select(
                    F.col(emb_id_col).alias(id_col),
                    F.col(emb_col).alias("_emb"),
                ),
                id_col,
            ).persist()
            _scoped.append(cand)
            cents = semantic_centroids
            if cents is None:
                # ~sqrt(n) clusters (standard IVF sizing) keeps every
                # within-cluster pair block sub-quadratic. The auto-sized
                # fit passes allow_fewer: kmeans clamps k to the distinct
                # seeds its own seed collect finds, so duplicate-heavy
                # embeddings (SemDeDup's primary target) size the quantizer
                # down — no crash, and no extra distinct pass (review r5).
                # An EXPLICIT semantic_nlist keeps kmeans' loud too-few-
                # distinct-vectors error: silently coarsening a user-chosen
                # quantizer would hide a misconfiguration.
                n_emb = cand.count()
                if n_emb > 0:
                    k = semantic_nlist or max(1, int(n_emb**0.5))
                    cents = kmeans_fit(
                        cand,
                        k,
                        vec_col="_emb",
                        allow_fewer=semantic_nlist is None,
                    )
                # empty cand skips the stage SILENTLY even with an
                # explicit nlist: emptiness has benign causes a raise
                # would misfire on — an empty batch, every doc dropped
                # by an earlier gate (routine in incremental mode), or
                # eligible docs simply having no embedding rows (the
                # documented pass condition). Distinguishing those from
                # an all-NULL embeddings frame would cost extra jobs;
                # the loud misconfiguration error stays where kmeans
                # can actually detect it — usable vectors exist but
                # fewer distinct than the explicitly requested k
                # (review r5, twice).
            if cents is None:  # no eligible embeddings: nothing to judge
                flags = flags.withColumn("_f_semantic", F.lit(False))
            else:
                # distinct BEFORE the join back (the contained/store_hits
                # pattern): duplicate embedding rows for one id would fan
                # the flags join out and inflate the waterfall past the
                # "dropped + survivors == input" invariant (review r5)
                dropped_sem = (
                    semantic_dedup(
                        cand,
                        threshold=semantic_threshold,
                        id_col=id_col,
                        vec_col="_emb",
                        centroids=cents,
                    )
                    .filter(~F.col("keep"))
                    .select(F.col("id").alias(id_col))
                    .distinct()
                    .withColumn("_sem", F.lit(True))
                    .localCheckpoint()
                )
                flags = flags.join(dropped_sem, id_col, "left").withColumn(
                    "_f_semantic", F.coalesce(F.col("_sem"), F.lit(False))
                ).drop("_sem")
        else:
            flags = flags.withColumn("_f_semantic", F.lit(False))
        # waterfall attribution: first failing stage wins
        verdict = F.lit("kept")
        for stage in reversed(STAGES):
            verdict = F.when(F.col(f"_f_{stage}"), F.lit(stage)).otherwise(
                verdict
            )
        flags = flags.withColumn("_verdict", verdict)
        _obs = None
        if _observe_report:
            # per-stage counts as CollectMetrics below the survivor
            # filter: the node sees every row (kept + dropped) during
            # the CALLER'S first action, and the survivor filter needs
            # the same flag columns anyway — zero extra passes, zero
            # extra state (see _DeferredReport)
            from pyspark.sql import Observation

            _obs = Observation()
            flags = flags.observe(
                _obs,
                *[
                    F.sum(
                        F.when(
                            F.col("_verdict") == s, F.lit(1)
                        ).otherwise(F.lit(0))
                    ).cast("long").alias(s)
                    for s in STAGES
                ],
            )
        survivors = flags.filter(F.col("_verdict") == "kept").drop(
            "_verdict", "_line_ratio", *[f"_f_{s}" for s in STAGES]
        )
        rows: list = []
        if not _observe_report:
            # the report materializes EAGERLY (it is <= len(STAGES) rows)
            # and the lineage is then released — a session-lifetime
            # persist per call would leak executor storage with no handle
            # to unpersist. The persist is scoped to this call and only
            # taken when a SECOND consumer follows the report collect
            # (the dst write / store appends): for report-only calls the
            # collect is the final flags frame's one and only action, so
            # caching corpus text + flags for it is pure storage-write
            # overhead (the measured lesson of the reverted r13
            # flags-cache handoff, at smaller stakes). The expensive
            # sub-results (connected components) are already
            # lineage-truncated internally, so the survivor pass that
            # follows re-derives only the cheap column flags either way.
            if dst is not None or store_batch_id is not None:
                flags = flags.persist()
            rows = (
                flags.groupBy(F.col("_verdict").alias("stage"))
                .agg(F.count("*").alias("dropped"))
                .filter(F.col("stage") != "kept")
                .collect()
            )
        if store_batch_id is not None:
            # incremental append, streaming-sink ordering: the digest
            # (document) partition commits BEFORE the band partition —
            # a crash between the two loses future near-dup detections,
            # never documents — and both are dynamic-overwrite keyed on
            # batch_id, so an at-least-once rerun rewrites exactly its
            # own partitions. Reads above excluded this batch_id, so
            # the rerun's gates see only true history.
            if digest_store is not None:
                _claimed_append(
                    survivors.select(
                        normalized_digest(F.col(text_col)).alias("digest"),
                        F.col(id_col).alias("keep_id"),
                        F.col(text_col).alias("text"),
                    ).dropDuplicates(["digest"]),
                    store_batch_id,
                    digest_store,
                )
            if band_store is not None:
                _claimed_append(
                    _bands_for_append.join(
                        survivors.select(F.col(id_col).alias("id")), "id"
                    ),
                    store_batch_id,
                    band_store,
                )
        if dst is not None:
            # production path: materialize survivors WHILE the scoped
            # cache is live (the write reads the cached flags, not the
            # lineage) and hand back the re-read — zero recompute on
            # every later consumption, zero retained cache, and the
            # corpus lands where a 100 TB run wants it anyway
            survivors.write.mode("overwrite").parquet(dst)
            survivors = docs.sparkSession.read.parquet(dst)
    finally:
        flags.unpersist()  # no-op in the _observe_report path
        for df_ in _scoped:
            df_.unpersist()
    if _obs is not None:
        return survivors, _DeferredReport(_obs, docs.sparkSession, flags)
    report = docs.sparkSession.createDataFrame(
        rows or [], "stage string, dropped bigint"
    )
    return survivors, report
