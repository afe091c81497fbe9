"""Arbitrary-SQL entry surface (VERDICT r6 item 8).

The reference never runs a query itself — its ETL exists so Athena can
run SQL over the partitioned parquet it writes (reference README "Use
Athena" / SURVEY §2.2); the repo's catalog replaces those Athena queries
with DataFrame plans. What was missing is the *entry point* story: a
user who today types ad-hoc SQL into Athena should be able to point
``spark.sql`` at the same warehouse with one call. :func:`sql_catalog`
is that call — it registers the ten driver tables plus the parsed
``logs`` table as temp views, and from then on every query is plain
ANSI SQL. No separate engine path is involved: ``spark.sql`` compiles
to the same Catalyst logical plans as the DataFrame catalog, so
pushdown, pruning, AQE and broadcast behave identically.

At 100 TB the views would be Hive-metastore/Unity tables over the
partitioned layout ``operators/etl.py`` writes (hour-partitioned,
row-group-clustered); temp views over the parquet dirs are the exact
local[32] analogue — the scan, pruning and join plans are the same.

Two catalog entries smoke the surface end to end under the driver's
value gate:

* ``sql_tpch_q6`` — one PORTABLE SQL string executed verbatim by BOTH
  engines (Spark result, DuckDB oracle): the sharpest possible
  demonstration that the surface speaks ANSI, not a dialect.
* ``sql_logs_report`` — pure SQL over the parsed ``logs`` view (the
  reference's actual Athena use case: traffic report per bucket and
  operation), oracle recomputed from the source ``events`` columns like
  ``log_line_parse`` does, so a parse-pipeline bug cannot hide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from s3_access_logs_spark.operators.parse import parse_logs
from s3_access_logs_spark.plans.catalog import query
from s3_access_logs_spark.plans.etl_queries import (
    SQL_EVENTS_WELL_FORMED,
    _synthetic_log_lines,
    sql_pmod,
)
from s3_access_logs_spark.sources.tables import TABLE_NAMES, register_views

#: Everything :func:`sql_catalog` registers: the driver tables plus the
#: parsed access-log table (the reference's Athena target).
SQL_VIEW_NAMES: tuple[str, ...] = TABLE_NAMES + ("logs",)


def sql_catalog(
    spark: SparkSession,
    sf_dir: str,
    include_logs: bool = True,
    tables: tuple[str, ...] | None = None,
) -> tuple[str, ...]:
    """Register the warehouse for arbitrary ``spark.sql`` — the
    Athena-replacement entry point. Returns the registered view names.

    ``include_logs=False`` skips synthesizing + parsing the log lines
    (the one non-trivial view) for callers that only need the star
    schema. ``tables`` restricts registration to a subset — a query
    that touches one table shouldn't require the whole warehouse to
    exist (the adversarial sweeps run single-table corpora)."""
    names = TABLE_NAMES if tables is None else tuple(tables)
    register_views(spark, sf_dir, names)
    if not include_logs:
        return names
    parse_logs(_synthetic_log_lines(spark, sf_dir)).createOrReplaceTempView(
        "logs"
    )
    return names + ("logs",)


# One string, two engines. Portability constraints, and why each holds:
# * floor(x*1e2+0.5)/1e2 is the repo-wide cross-engine rounding
#   (operators/similarity.py round_fixed) — Spark's floor returns BIGINT
#   and DuckDB's DOUBLE, but the division lands both on the same DOUBLE.
#   The scale literal MUST be written 1e2, not 100.0: a decimal-point
#   literal is DECIMAL in Spark SQL (and BIGINT/DECIMAL division yields
#   DECIMAL(38,6) — a Decimal result, not the oracle's float), while
#   scientific notation is DOUBLE in BOTH dialects;
# * CAST(year(...) AS BIGINT): both engines have year(); the cast pins
#   one integer kind so the driver's schema record matches;
# * the float literals 0.05/0.07 parse to the same IEEE doubles
#   everywhere (nearest-even).
TPCH_Q6_PORTABLE_SQL = """
    SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           floor(SUM(l_extendedprice * l_discount) * 1e2 + 0.5) / 1e2
               AS revenue2,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    GROUP BY year(l_shipdate)
"""


@query(
    "sql_tpch_q6",
    oracle=TPCH_Q6_PORTABLE_SQL,
    tags=("sql-surface", "relational", "tpch"),
)
def sql_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape through the SQL entry surface: register views, run
    the IDENTICAL SQL string the DuckDB oracle runs. Scan-only plan —
    both predicates push down to the parquet scan and the agg is
    map-side partial, exactly as if written via the DataFrame API."""
    sql_catalog(spark, sf_dir, include_logs=False)
    return spark.sql(TPCH_Q6_PORTABLE_SQL)


LOGS_REPORT_SQL = """
    SELECT bucket_name, operation,
           COUNT(*) AS n_requests,
           SUM(bytessent) AS total_bytes,
           MAX(totaltime) AS max_totaltime,
           COUNT(DISTINCT remoteip) AS n_ips
    FROM logs
    WHERE is_user
    GROUP BY bucket_name, operation
"""


@query(
    "sql_logs_report",
    oracle=f"""
    SELECT 'bucket' || (user_id % 3) AS bucket_name,
           'REST.' || upper(event_type) || '.OBJECT' AS operation,
           COUNT(*) AS n_requests,
           SUM(CASE WHEN event_id % 5 = 0 THEN 0
                    ELSE event_id % 10000 END)::BIGINT AS total_bytes,
           MAX(event_id % 500)::BIGINT AS max_totaltime,
           COUNT(DISTINCT '10.' || {sql_pmod('user_id', 256)} || '.'
                 || {sql_pmod('event_id', 256)} || '.'
                 || {sql_pmod('event_id * 7', 256)}) AS n_ips
    FROM events
    WHERE event_id % 3 = 0 AND {SQL_EVENTS_WELL_FORMED}
    GROUP BY 1, 2
    """,
    tags=("sql-surface", "etl", "agg"),
)
def sql_logs_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's Athena use case as pure SQL over the registered
    ``logs`` view: per bucket x operation traffic for IAM-user requests
    (requests, bytes, worst latency, distinct client IPs). The oracle
    recomputes every figure straight from the ``events`` source columns
    (the ``log_line_parse`` pattern), so the whole synthesize -> parse
    -> view -> SQL chain is value-checked, not self-checked."""
    sql_catalog(spark, sf_dir)
    return spark.sql(LOGS_REPORT_SQL)


# ---------------------------------------------------------------------------
# Round 8 (VERDICT r7 item 6): the catalog's remaining query SHAPES
# re-exercised through SQL TEXT — window, rollup/grouping-sets,
# semi/anti join, curation report. Each is ONE portable string executed
# verbatim by both engines, the sql_tpch_q6 discipline: what proves the
# surface speaks ANSI is that the oracle is the same bytes.
# Portability rules (see TPCH_Q6_PORTABLE_SQL): floor(x*1e2+0.5)/1e2
# rounding, scientific-notation scale literals, CAST(... AS BIGINT) to
# pin integer kinds, deterministic ORDER BY keys inside every window.
# ---------------------------------------------------------------------------

SQL_WINDOW_TOP_ORDERS = """
    SELECT o_custkey, o_orderkey, rnk,
           floor(run_total * 1e2 + 0.5) / 1e2 AS run_total2
    FROM (
        SELECT o_custkey, o_orderkey,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
               SUM(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
                   ROWS UNBOUNDED PRECEDING) AS run_total
        FROM orders
        WHERE o_custkey IS NOT NULL AND o_orderkey IS NOT NULL
              AND o_totalprice IS NOT NULL
    ) ranked
    WHERE rnk <= 3
"""


@query(
    "sql_window_top_orders",
    oracle=SQL_WINDOW_TOP_ORDERS,
    tags=("sql-surface", "window", "relational"),
)
def sql_window_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window shapes through the SQL surface: each customer's top-3
    orders by price with the running total — rank + running-frame
    window in one pass. The frame's ORDER BY carries a full tie-break
    (price DESC, then orderkey), so the running double SUM accumulates
    in the identical order on both engines and the 2dp floor-rounding
    is exact, not luck."""
    sql_catalog(spark, sf_dir, include_logs=False)
    return spark.sql(SQL_WINDOW_TOP_ORDERS)


SQL_ROLLUP_LINESTATUS = """
    SELECT COALESCE(l_returnflag, '<null>') AS returnflag,
           COALESCE(l_linestatus, '<null>') AS linestatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
           COUNT(*) AS n_items,
           floor(SUM(l_extendedprice * (1 - l_discount)) * 1e2 + 0.5) / 1e2
               AS revenue2
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


@query(
    "sql_rollup_linestatus",
    oracle=SQL_ROLLUP_LINESTATUS,
    tags=("sql-surface", "rollup", "grouping", "relational"),
)
def sql_rollup_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup/grouping-sets through the SQL surface: revenue by
    returnflag x linestatus with subtotal and grand-total rows.
    ``GROUPING()`` columns disambiguate rollup-NULLs from SOURCE
    NULLs (the dirty-star sweep salts both flag columns), so the
    COALESCE labels cannot alias two different rows together."""
    sql_catalog(spark, sf_dir, include_logs=False)
    return spark.sql(SQL_ROLLUP_LINESTATUS)


SQL_SEMI_ANTI_SEGMENTS = """
    SELECT c_mktsegment AS segment,
           COUNT(*) AS n_active_no_f
    FROM customer c
    WHERE EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey)
      AND NOT EXISTS (
              SELECT 1 FROM orders o2
              WHERE o2.o_custkey = c.c_custkey
                    AND o2.o_orderstatus = 'F')
    GROUP BY c_mktsegment
"""


@query(
    "sql_semi_anti_segments",
    oracle=SQL_SEMI_ANTI_SEGMENTS,
    tags=("sql-surface", "semi-join", "anti-join", "relational"),
)
def sql_semi_anti_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi + anti join through the SQL surface: per market segment,
    customers with at least one order and no finished ('F') order —
    EXISTS compiles to a left-semi join and NOT EXISTS to a left-anti,
    the same physical shapes ``suite_semi_anti_joins`` pins for the
    DataFrame API."""
    sql_catalog(spark, sf_dir, include_logs=False)
    return spark.sql(SQL_SEMI_ANTI_SEGMENTS)


SQL_CORPUS_REPORT = """
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           floor(AVG(length(text)) * 1e2 + 0.5) / 1e2 AS avg_chars2,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM documents
    GROUP BY source
"""


@query(
    "sql_corpus_report",
    oracle=SQL_CORPUS_REPORT,
    tags=("sql-surface", "llm", "corpus", "report"),
)
def sql_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A curation report through the SQL surface: per-source corpus
    shape (doc counts, character mass, id range). ``length()`` counts
    CHARACTERS in both engines (the unicode sweep pins that parity);
    AVG divides an exact integer sum by the count, so the double is
    identical cross-engine without ordered summation."""
    sql_catalog(spark, sf_dir, include_logs=False, tables=("documents",))
    return spark.sql(SQL_CORPUS_REPORT)


# ---------------------------------------------------------------------------
# Round 9 (VERDICT r8 item 7): the CURATION ARTIFACTS join the SQL
# surface. The six entries above cover relational shapes and raw-corpus
# reports; a real Athena replacement must also let an analyst type SQL
# against what the pipeline PRODUCES — dedup clusters, the waterfall.
# Pattern: the Spark side registers the operator output as a temp view
# (at 100 TB these are the persisted parquet artifacts `curate_corpus
# (dst=...)` / the ingest stores already write — a temp view over the
# operator output is the local[32] analogue, same scan shape) and runs
# ONE portable SQL string; the oracle wraps the artifact's EXISTING
# generated oracle in a `WITH <view> AS (...)` prefix and runs the SAME
# string, so the artifact computation stays value-checked end to end,
# not re-derived loosely.
# ---------------------------------------------------------------------------

SQL_CLUSTER_SIZES = """
    SELECT d.source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN s.cluster_size > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_in_dup_clusters,
           CAST(SUM(CASE WHEN s.cluster_size > 1
                              AND c.doc_id <> c.cluster_id
                         THEN 1 ELSE 0 END)
                AS BIGINT) AS n_redundant,
           CAST(MAX(s.cluster_size) AS BIGINT) AS max_cluster_size
    FROM dedup_clusters c
    JOIN (SELECT cluster_id, COUNT(*) AS cluster_size
          FROM dedup_clusters GROUP BY cluster_id) s
         ON c.cluster_id = s.cluster_id
    JOIN documents d ON d.doc_id = c.doc_id
    GROUP BY d.source
"""


@query(
    "sql_cluster_sizes",
    oracle=None,  # filled below: WITH dedup_clusters AS (<generated>) ...
    tags=("sql-surface", "llm", "dedup", "curation"),
)
def sql_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The near-dup clustering ARTIFACT through the SQL surface: per
    source, how many documents sit in multi-member clusters, how many
    are redundant (non-keeper members — what dedup would delete), and
    the worst cluster size. The ``dedup_clusters`` view is the same
    operator output the ``dedup_clusters`` catalog entry value-checks
    (operators/dedup.py connected components, k=16/bands=4/shingle=3);
    the oracle recomputes it with the recursive-CTE closure inside a
    ``WITH`` prefix and then runs the identical report SQL — artifact
    and report are both value-exact, not self-checked."""
    from s3_access_logs_spark.operators import dedup as D
    from s3_access_logs_spark.sources.tables import load_table

    sql_catalog(spark, sf_dir, include_logs=False, tables=("documents",))
    docs = load_table(spark, sf_dir, "documents")
    D.dedup_clusters(docs, k=16, bands=4, shingle_n=3).createOrReplaceTempView(
        "dedup_clusters"
    )
    return spark.sql(SQL_CLUSTER_SIZES)


SQL_WATERFALL_REPORT = """
    SELECT stage,
           CAST(dropped AS BIGINT) AS dropped,
           floor(CAST(dropped AS DOUBLE) * 1e4
                 / NULLIF(t.total_dropped, 0) + 0.5) / 1e4 AS drop_share4
    FROM curation_waterfall
    CROSS JOIN (SELECT SUM(dropped) AS total_dropped
                FROM curation_waterfall) t
"""


@query(
    "sql_waterfall_report",
    oracle=None,  # filled below: WITH curation_waterfall AS (<generated>) ...
    tags=("sql-surface", "llm", "pipeline", "curation"),
)
def sql_waterfall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation WATERFALL artifact through the SQL surface: each
    stage's drop count and its share of all drops (4dp floor-rounding;
    NULLIF keeps a nothing-dropped corpus NULL on both engines instead
    of diverging on x/0). The ``curation_waterfall`` view is the same
    ``curate_corpus(min_quality=0.5, langs=('en',))`` report the
    ``curate_waterfall`` catalog entry value-checks; its generated
    DuckDB replay becomes the oracle's ``WITH`` prefix."""
    from s3_access_logs_spark.operators.curate import curate_corpus
    from s3_access_logs_spark.sources.tables import load_table

    sql_catalog(spark, sf_dir, include_logs=False, tables=("documents",))
    docs = load_table(spark, sf_dir, "documents")
    _, report = curate_corpus(docs, min_quality=0.5, langs=("en",))
    report.createOrReplaceTempView("curation_waterfall")
    return spark.sql(SQL_WATERFALL_REPORT)


SQL_SHARD_BALANCE = """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_shards,
           CAST(SUM(n_docs) AS BIGINT) AS total_docs,
           CAST(MAX(shard_tokens) AS BIGINT) AS max_shard_tokens,
           CAST(MIN(shard_tokens) AS BIGINT) AS min_shard_tokens,
           floor(CAST(MAX(shard_tokens) AS DOUBLE) * 1e4
                 / NULLIF(SUM(shard_tokens), 0) + 0.5) / 1e4
             AS max_token_share4,
           floor(CAST(MIN(shard_tokens) AS DOUBLE) * 1e4
                 / NULLIF(SUM(shard_tokens), 0) + 0.5) / 1e4
             AS min_token_share4,
           floor(CAST(MAX(shard_tokens) AS DOUBLE) * 1e4
                 / NULLIF(MIN(shard_tokens), 0) + 0.5) / 1e4
             AS spread_ratio4
    FROM training_shards
"""


#: Portable pre-flight report: the tokenizer gate (vocab_fit) joined
#: to the layout gate (window_fill) per source — one row set an
#: operator reads before committing to an expensive export. The flag
#: threshold compares 6dp-rounded doubles to an exact literal, so both
#: engines decide identically; an inner join on source drops the
#: NULL-source salt row on both engines alike.
SQL_PREFLIGHT_GATE = """
    SELECT f.source,
           f.n_docs,
           f.unk_rate,
           f.tokens_per_word,
           f.bytes_per_token,
           w.n_windows,
           w.pad_rate,
           w.docs_per_window,
           (f.unk_rate > 0.25) AS unk_flag
    FROM vocab_fit f JOIN window_fill w ON f.source = w.source
"""


@query(
    "sql_preflight_gate",
    oracle=None,  # filled below: WITH vocab_fit AS (...), window_fill AS (...)
    tags=("sql-surface", "llm", "tokenize", "packing", "report"),
)
def sql_preflight_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The export PRE-FLIGHT through the SQL surface (round 11): the
    tokenizer-fit and packing-efficiency artifacts registered as views
    and joined per source by one portable SQL string — what an
    operator would run in the Athena console before green-lighting a
    training export (unk_rate gates the TOKENIZER, pad_rate/
    docs_per_window gate the LAYOUT; `unk_flag` marks sources whose
    id streams would train noise). Oracle = both views' generated
    replays as WITH prefixes + the identical report SQL — artifact
    and report value-exact, the r9 curation-artifact pattern.

    Fixture note (ADVICE r11): the two joined views deliberately use
    DIFFERENT demo tokenizers — `vocab_fit` a 40-merge PREFIX (so its
    unk arithmetic is value-checked at a non-zero point, see
    ``_fit_merges``) and `window_fill` the full demo vocab (so its
    layout stats describe the vocabulary the packing entries use).
    The join is therefore a DEMO of the report SHAPE, not one
    coherent pre-flight: in production both views come from the one
    shipped merges+vocab pair, and the store-mode
    ``store_preflight_report`` (round 12) computes both halves from
    a single token store, where the inconsistency cannot arise."""
    from s3_access_logs_spark.plans.catalog import QUERIES

    sql_catalog(spark, sf_dir, include_logs=False, tables=("documents",))
    QUERIES["vocab_fit_report"].builder(
        spark, sf_dir
    ).createOrReplaceTempView("vocab_fit")
    QUERIES["window_fill_report"].builder(
        spark, sf_dir
    ).createOrReplaceTempView("window_fill")
    return spark.sql(SQL_PREFLIGHT_GATE)


@query(
    "sql_shard_balance",
    oracle=None,  # filled below: WITH training_shards AS (<generated>) ...
    tags=("sql-surface", "llm", "layout", "shards"),
)
def sql_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-shard LAYOUT artifact through the SQL surface
    (round 10, VERDICT r9 item 7): one row of balance evidence — shard
    count, total docs, max/min per-shard token mass, each extreme's
    share of all tokens and the max/min spread ratio (4dp
    floor-rounding; NULLIF keeps degenerate corpora NULL on both
    engines). The ``training_shards`` view is the same per-shard stats
    the ``training_shard_stats`` catalog entry value-checks
    (operators/layout.py salted-hash assignment); its generated DuckDB
    replay becomes the oracle's ``WITH`` prefix — artifact and report
    both value-exact, the r9 curation-artifact pattern."""
    from s3_access_logs_spark.plans.catalog import QUERIES

    sql_catalog(spark, sf_dir, include_logs=False, tables=("documents",))
    QUERIES["training_shard_stats"].builder(
        spark, sf_dir
    ).createOrReplaceTempView("training_shards")
    return spark.sql(SQL_SHARD_BALANCE)


def _fill_curation_sql_oracles() -> None:
    """Late-bind the two artifact-view oracles (the generated artifact
    SQL lives in other modules; importing it at decoration time would
    cycle)."""
    import dataclasses

    from s3_access_logs_spark.plans.catalog import QUERIES
    from s3_access_logs_spark.plans.curation_queries import (
        _curate_waterfall_sql,
    )
    from s3_access_logs_spark.plans.text_queries import _dedup_clusters_sql

    QUERIES["sql_cluster_sizes"] = dataclasses.replace(
        QUERIES["sql_cluster_sizes"],
        oracle=f"WITH dedup_clusters AS ({_dedup_clusters_sql()})\n"
        f"{SQL_CLUSTER_SIZES}",
    )
    QUERIES["sql_waterfall_report"] = dataclasses.replace(
        QUERIES["sql_waterfall_report"],
        oracle=f"WITH curation_waterfall AS ({_curate_waterfall_sql()})\n"
        f"{SQL_WATERFALL_REPORT}",
    )
    # the import above registered text_queries' entries, so the
    # shard-stats oracle is present to prefix
    QUERIES["sql_shard_balance"] = dataclasses.replace(
        QUERIES["sql_shard_balance"],
        oracle="WITH training_shards AS ("
        f"{QUERIES['training_shard_stats'].oracle})\n"
        f"{SQL_SHARD_BALANCE}",
    )
    QUERIES["sql_preflight_gate"] = dataclasses.replace(
        QUERIES["sql_preflight_gate"],
        oracle="WITH vocab_fit AS ("
        f"{QUERIES['vocab_fit_report'].oracle}),\n"
        "window_fill AS ("
        f"{QUERIES['window_fill_report'].oracle})\n"
        f"{SQL_PREFLIGHT_GATE}",
    )


_fill_curation_sql_oracles()
