"""Driver-surface folds (VERDICT r5 item 1).

The round driver's correctness gate records the first 50 sorted names of
``__spark_entry__.queries()``. The round-5 catalog grew to 74 entries, so
24 names sorted past the window and silently lost their driver row. Each
fold below composes 2-5 related granular entries into ONE driver-facing
entry:

* Spark side: every member result gets an ``entry`` tag column (its
  catalog name) and the tagged frames are unioned **by name** with
  missing columns null-filled (``unionByName(allowMissingColumns=True)``);
* oracle side: the member oracles are wrapped identically and combined
  with DuckDB's ``UNION ALL BY NAME``.

Because both sides align columns by name and null-fill the same way, a
fold is value-exact iff every member is — no canonicalization layer, no
stringified floats, and a fold failure names the member via the ``entry``
column. Granular members stay registered: the bench set, pytest suite and
``tools/check_oracle.py`` keep their per-entry diagnostics; only
``__spark_entry__`` swaps in :func:`catalog.driver_surface`.

Shared-name columns across a fold's members must agree in type family
(else Spark and DuckDB could coerce differently); ``tests/
test_driver_surface.py`` pins the surface size and the fold wiring.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3_access_logs_spark.plans.catalog import QUERIES, Query

TAG = "entry"  # fold tag column; no granular entry may use this name


def _fold(name: str, members: tuple[str, ...], tags: tuple[str, ...]) -> None:
    if name in QUERIES:
        # same loud guard the @query decorator enforces (review r6):
        # writing QUERIES[name] directly must not silently clobber an
        # existing entry
        raise ValueError(f"fold {name}: duplicate query name")
    missing = [m for m in members if m not in QUERIES]
    if missing:
        raise ValueError(f"fold {name}: unknown members {missing}")
    no_oracle = [m for m in members if QUERIES[m].oracle is None]
    if no_oracle:
        raise ValueError(
            f"fold {name}: members without oracles {no_oracle} — a fold "
            f"must stay value-checked; keep rows-only entries granular"
        )

    def builder(
        spark: SparkSession, sf_dir: str, _members: tuple[str, ...] = members
    ) -> DataFrame:
        tagged = []
        for m in _members:
            df = QUERIES[m].builder(spark, sf_dir)
            if TAG in df.columns:
                # loud at plan-build time, not a runtime unionByName
                # surprise (or a silent DuckDB BY-NAME merge of the tag
                # with member data)
                raise ValueError(
                    f"fold member {m} emits a column named {TAG!r}, "
                    f"colliding with the fold tag — rename it"
                )
            tagged.append(df.select(F.lit(m).alias(TAG), "*"))
        return reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), tagged
        )

    oracle = "\nUNION ALL BY NAME\n".join(
        f"SELECT '{m}' AS {TAG}, * FROM (\n{QUERIES[m].oracle}\n) _f{i}"
        for i, m in enumerate(members)
    )
    QUERIES[name] = Query(
        name, builder, oracle, tags, bench=False, members=members
    )


# One fold per related capability group. Member lists are the single
# source of truth — driver_surface() derives the folded-out set from them.
_fold(
    "suite_perceptual_fps",
    ("audio_fingerprints", "image_dhash_fingerprints", "video_fingerprints"),
    ("multimodal", "llm", "dedup", "perceptual", "fold"),
)
_fold(
    "suite_ann_topk",
    (
        "embedding_topk",
        "embedding_ivf_topk",
        "embedding_ann_lsh",
        "embedding_pq_topk",
        "embedding_pq_refine",
    ),
    ("similarity", "llm", "ann", "fold"),
)
_fold(
    "suite_near_pairs",
    (
        "dedup_minhash_pairs",
        "simhash_near_pairs",
        "image_near_pairs",
        "embedding_near_pairs",
    ),
    ("dedup", "llm", "fold"),
)
_fold(
    "suite_doc_excision",
    ("paragraph_dedup", "boilerplate_lines", "cut_duplicate_spans"),
    ("dedup", "llm", "text", "fold"),
)
_fold(
    "suite_curate_stages",
    ("curate_waterfall", "curate_semantic", "export_training_report"),
    ("llm", "pipeline", "curation", "fold"),
)
_fold(
    "suite_sampling",
    ("mixture_sample", "temperature_mixture_rates"),
    ("llm", "sampling", "fold"),
)
_fold(
    "suite_tpch_subqueries",
    ("q17_small_quantity_revenue", "q22_idle_rich_customers"),
    ("tpch", "subquery", "fold"),
)
_fold(
    "suite_sketches",
    (
        "kmv_distinct_estimate",
        "quantile_profile",
        "cms_token_frequencies",
        "approx_distinct_users",
        "bloom_digest_membership",
    ),
    ("sketch", "llm", "fold"),
)
_fold(
    "suite_semi_anti_joins",
    ("customers_without_orders", "suppliers_in_region"),
    ("join", "semi", "anti", "fold"),
)
_fold(
    "suite_grouping_shapes",
    ("brand_set_ops", "cube_grouping_sets", "returnflag_pivot"),
    ("agg", "setop", "cube", "pivot", "fold"),
)
_fold(
    "suite_event_props",
    ("events_json_extract", "props_map_explode"),
    ("json", "map", "fold"),
)
_fold(
    "suite_doc_facets",
    ("domain_blocklist", "stratified_sample_quota"),
    ("llm", "url", "sampling", "fold"),
)
_fold(
    "suite_doc_quality",
    ("quality_scores", "perplexity_scores"),
    ("llm", "text", "quality", "fold"),
)
_fold(
    "suite_vector_transforms",
    ("jl_projection", "embedding_quantize_int8"),
    ("llm", "vector", "fold"),
)
_fold(
    "suite_corpus_reports",
    # + vocab_fit_report (round 11): the tokenizer pre-flight gate
    ("corpus_cleaning_pipeline", "decontaminate_ngrams", "vocab_fit_report"),
    ("llm", "pipeline", "fold"),
)
_fold(
    "suite_chunk_pack",
    # + packed_window_spans / packed_padded_windows (round 11): the
    # loss-mask span arithmetic and the fixed-shape pad arithmetic,
    # both replayed in DuckDB
    (
        "doc_chunk_spans",
        "sequence_packing_bins",
        "packed_sequences",
        "packed_token_windows",
        "packed_window_spans",
        "packed_padded_windows",
        "window_fill_report",
        "training_shard_stats",
    ),
    ("llm", "text", "chunking", "packing", "fold"),
)
_fold(
    "suite_windows",
    ("running_revenue_window", "running_distinct_users", "rank_parts_window"),
    ("window", "fold"),
)
_fold(
    # round 13 (VERDICT r12 items 3+4): the tokenizer/store lifecycle
    # as one driver row — the default-fold exact encode, the NEW
    # byte-level (gpt2) oracle entry, and the store-mode pre-flight
    # (previously a granular surface row; the surface sat AT the
    # 50-name cap, so this fold both admits the gpt2 entry AND frees a
    # slot: surface 50 -> 49)
    "suite_tokenizer_lifecycle",
    ("bpe_exact_tokens", "bpe_gpt2_byte_tokens", "store_preflight_report"),
    ("llm", "bpe", "tokenize", "store", "fold"),
)
_fold(
    # the whole SQL-text entry surface (round 8: 2 -> 6 entries;
    # round 9: + the two curation-artifact views) as one driver row;
    # shared column names across members (revenue2 DOUBLE, n_items
    # BIGINT) agree in type family per the fold contract
    "suite_sql_surface",
    (
        "sql_tpch_q6",
        "sql_logs_report",
        "sql_window_top_orders",
        "sql_rollup_linestatus",
        "sql_semi_anti_segments",
        "sql_corpus_report",
        "sql_cluster_sizes",
        "sql_waterfall_report",
        "sql_shard_balance",
        "sql_preflight_gate",
    ),
    ("sql-surface", "fold"),
)
