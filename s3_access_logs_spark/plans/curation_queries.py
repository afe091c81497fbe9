"""Round-5 catalog promotions: the round-4 curation / sketch / span /
perceptual operators as oracle-checked query entries (VERDICT r4 item 1 —
"every operator has a passing CORRECTNESS row").

Design rules shared with plans/text_queries.py:

* deterministic-by-design operators only; the DuckDB SQL is generated
  from the SAME constants as the Spark expressions (md5-based hashes,
  LCG plane literals, suffix tables), so values match bit-for-bit;
* operators whose internals hash with ``xxhash64`` (no DuckDB
  equivalent) are checked through hash-independent surfaces: the
  count-min / Bloom entries compare ESTIMATES against exact answers at
  a scale where the collision probability is ~0 **and the run is
  deterministic** (same data, same hashes, same verdict every round);
  the quantile entries run with per-group k >= group size, where the
  bottom-k-by-hash sample is provably the whole group and the quantile
  is exact regardless of which hash ordered it;
* several inputs synthesize structure the flat ``documents`` table
  lacks (newlines for the line operators, duplicated spans for
  winnowing, URLs for the blocklist) — as pure deterministic column
  expressions mirrored verbatim in the oracle, the same move the
  ``decontaminate_ngrams`` entry made for its benchmark split;
* genuinely non-SQL-expressible operators (MLlib classifier, iterative
  k-means/PQ training) register with ``oracle=None`` — the driver
  records the documented weaker rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3_access_logs_spark.operators import dedup as D
from s3_access_logs_spark.plans.catalog import query
from s3_access_logs_spark.plans.etl_queries import SQL_ASSET_DOCS
from s3_access_logs_spark.sources.tables import load_table

NL = "chr(10)"
PARA = "chr(10) || chr(10)"


# ---------------------------------------------------------------------------
# Containment (asymmetric subset near-dup)

def _offset_copies(docs: DataFrame, copies: DataFrame) -> DataFrame:
    """Shift synthesized-copy ids above the real id space by
    ``max(doc_id)+1`` (one broadcast single-row agg — no data shuffle).
    A fixed constant offset collides with real ids on a large-enough
    corpus and silently unions two unrelated texts under one id on both
    the Spark and oracle sides (review r5); the dynamic offset also
    keeps every copy HIGHER-id than its source, which
    ``cut_duplicate_spans`` relies on (spans are excised from the
    higher id of a pair — the copy, never the canonical original).
    The SQL twin is ``doc_id + (SELECT max(doc_id) + 1 FROM documents)``.
    """
    off = docs.agg((F.max("doc_id") + F.lit(1)).alias("_off"))
    return copies.crossJoin(F.broadcast(off)).select(
        (F.col("doc_id") + F.col("_off")).alias("doc_id"), "text"
    )


_SQL_COPY_OFF = "(SELECT max(doc_id) + 1 FROM documents)"


@query(
    "containment_pairs",
    oracle=None,  # filled below (generated SQL, shares text_queries fragments)
    tags=("dedup", "llm", "containment"),
    bench=True,
)
def containment_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup (|A ∩ B| / min(|A|,|B|) >= 0.5)
    over documents plus synthesized truncated copies (id ``max+1+orig``
    carries the first 25 words of every 5th doc) — guaranteeing
    embedded-subset pairs the symmetric Jaccard entry structurally
    misses. The copy-id offset is ``max(doc_id)+1`` (one broadcast agg
    row), not a constant: a fixed ``+10000`` collides with real ids on
    any corpus of >=10k documents — including the 10x validation corpus,
    whose replica shift is exactly 10000 (review r5) — silently merging
    two unrelated texts under one id on BOTH the Spark and oracle sides.
    Same single-pass posting-list pipeline and stop-shingle cap as
    ``ngram_jaccard_pairs`` (shared ``_intersection_pairs``)."""
    from s3_access_logs_spark.functions.text import words

    docs = load_table(spark, sf_dir, "documents")
    toks = words("text")
    copies = _offset_copies(
        docs,
        docs.filter(F.col("doc_id") % 5 == 0).select(
            "doc_id", F.concat_ws(" ", F.slice(toks, 1, 25)).alias("text")
        ),
    )
    inp = docs.select("doc_id", "text").unionByName(copies)
    return D.containment_pairs(inp, threshold=0.5)


def _containment_sql() -> str:
    from s3_access_logs_spark.plans.text_queries import (
        SQL_SHINGLE_HASHES,
        SQL_WORD_HASHES,
        SQL_WORDS,
    )

    return f"""
    WITH inp AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {_SQL_COPY_OFF} AS doc_id,
             array_to_string(({SQL_WORDS})[1:25], ' ') AS text
      FROM documents WHERE doc_id % 5 = 0
    ),
    t AS (SELECT doc_id, {SQL_WORDS} AS toks FROM inp),
    w AS (SELECT doc_id, {SQL_WORD_HASHES} AS wh FROM t),
    h AS (SELECT doc_id, {SQL_SHINGLE_HASHES} AS sh FROM w),
    sizes AS (SELECT doc_id, len(sh) AS n_sh FROM h),
    inv0 AS (SELECT doc_id, unnest(sh) AS shingle FROM h),
    inv AS (
      SELECT doc_id, shingle FROM inv0
      QUALIFY COUNT(*) OVER (PARTITION BY shingle)
              <= {D.DEFAULT_MAX_SHINGLE_FREQ}
    ),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT id_a, id_b, n_inter, sa.n_sh AS n_a, sb.n_sh AS n_b,
             n_inter::DOUBLE / least(sa.n_sh, sb.n_sh)::DOUBLE AS c
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
    )
    SELECT id_a, id_b, n_inter, ROUND(c, 6) AS containment,
           CASE WHEN n_a < n_b THEN id_a
                WHEN n_b < n_a THEN id_b
                ELSE greatest(id_a, id_b) END AS contained_id
    FROM scored WHERE c >= 0.5
    """


# ---------------------------------------------------------------------------
# Intra-document paragraph dedup

@query(
    "paragraph_dedup",
    oracle=f"""
    WITH inp AS (
      SELECT doc_id,
             text || {PARA} || substr(text, 1, 50) || {PARA} || text AS text
      FROM documents
    )
    SELECT doc_id,
           array_to_string(
             list_filter(str_split(text, {PARA}),
                         (p, i) -> list_position(str_split(text, {PARA}), p) = i),
             {PARA}) AS cleaned
    FROM inp
    """,
    tags=("dedup", "llm", "text"),
)
def paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style intra-document paragraph dedup (keep-first, order
    preserved) over documents with a synthesized repeated paragraph —
    each doc becomes ``text ¶ first-50-chars ¶ text``, so the trailing
    full repeat must vanish and the distinct truncation must survive.
    Pure in-row projection: no shuffle at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    inp = docs.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit("\n\n"),
            F.substring("text", 1, 50), F.lit("\n\n"),
            F.col("text"),
        ).alias("text"),
    )
    return D.drop_repeated_paragraphs(inp).select(
        "doc_id", F.col("text").alias("cleaned")
    )


# ---------------------------------------------------------------------------
# Cross-document boilerplate line removal

@query(
    "boilerplate_lines",
    oracle=f"""
    WITH inp AS (
      SELECT doc_id,
             text || {NL} || 'Subscribe to our newsletter ' || (doc_id % 3)
                  || {NL} || 'unique marker line ' || doc_id AS text
      FROM documents
    ),
    lines AS (
      SELECT doc_id, s.pos AS pos, s.line AS line FROM (
        SELECT doc_id,
               unnest(list_transform(str_split(text, {NL}),
                      (x, i) -> struct_pack(pos := i, line := x))) AS s
        FROM inp)
    ),
    boiler AS (
      SELECT trim(line) AS key FROM lines WHERE trim(line) <> ''
      GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 10
    ),
    kept AS (
      SELECT l.doc_id, l.pos, l.line FROM lines l
      LEFT JOIN boiler b ON trim(l.line) = b.key
      WHERE b.key IS NULL
    ),
    agg AS (
      SELECT doc_id, string_agg(line, {NL} ORDER BY pos) AS cleaned
      FROM kept GROUP BY doc_id
    )
    -- row-preserving join-back (dirty-docs sweep, round 8): a NULL
    -- text (or NULL doc_id, whose synthesized text concats to NULL)
    -- yields no lines, so the unnest path LOSES the document entirely
    -- while Spark keeps the row with cleaned NULL; null-safe so the
    -- NULL-id doc re-attaches to its own (absent) group
    SELECT d.doc_id, a.cleaned
    FROM documents d
    LEFT JOIN agg a ON d.doc_id IS NOT DISTINCT FROM a.doc_id
    """,
    tags=("dedup", "llm", "text", "boilerplate"),
)
def boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate removal over synthesized line
    structure: every doc gains one of three shared footer lines (site
    furniture, appears in ~167 docs >= min_docs=10 -> cut everywhere)
    and one unique marker line (kept). The count is
    ``count_distinct(doc)`` on the TRIMMED line — one shuffle by
    line-hash, one rebuild by id (operators/dedup.py:1347)."""
    docs = load_table(spark, sf_dir, "documents")
    inp = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\nSubscribe to our newsletter "),
            (F.col("doc_id") % 3).cast("string"),
            F.lit("\nunique marker line "),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    out = D.drop_boilerplate_lines(inp, min_docs=10)
    return out.select("doc_id", F.col("text").alias("cleaned"))


# ---------------------------------------------------------------------------
# RefinedWeb line cleanup + script profile

_SHOUT = "upper(substr(text, 1, 40))"


@query(
    "refinedweb_cleanup",
    oracle=f"""
    WITH inp AS (
      SELECT doc_id, lang,
             'OK' || {NL} || {_SHOUT} || {NL} || '12:45' || {NL}
                  || text || CASE WHEN lang = 'zh'
                                  THEN ' 模型 数据 训练' ELSE '' END
                  || {NL} || '99%' AS text
      FROM documents
    ),
    verdicts AS (
      SELECT doc_id, lang, text,
             list_filter(str_split(text, {NL}), l ->
               NOT (length(trim(l)) < 3
                    OR (regexp_extract_all(trim(l), '\\p{{L}}') != []
                        AND len(regexp_extract_all(trim(l), '\\p{{L}}')) >= 4
                        AND len(regexp_extract_all(trim(l), '\\p{{Lu}}'))::DOUBLE
                            / greatest(len(regexp_extract_all(trim(l), '\\p{{L}}')), 1)::DOUBLE
                            > 0.8)
                    OR regexp_full_match(trim(l), '[\\d\\s.,:;%/()+-]+'))
             ) AS kept
      FROM inp
    )
    SELECT doc_id,
           ROUND(len(kept)::DOUBLE / greatest(len(str_split(text, {NL})), 1)::DOUBLE,
                 6) AS kept_ratio6,
           -- all-lines-dropped must clean to '' like Spark's
           -- array_join([]), not DuckDB's array_to_string([]) = NULL;
           -- NULL text stays NULL (dirty-docs sweep, round 8)
           (CASE WHEN text IS NULL THEN NULL
                 ELSE coalesce(array_to_string(kept, {NL}), '') END)
             AS cleaned,
           ROUND(len(regexp_extract_all(text, '\\p{{Han}}'))::DOUBLE
                 / greatest(len(regexp_extract_all(text, '\\p{{L}}')), 1)::DOUBLE,
                 6) AS han6
    FROM verdicts
    """,
    tags=("text", "llm", "cleanup", "script"),
)
def refinedweb_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb line-wise cleanup over synthesized furniture: each doc
    gains a too-short line, a SHOUTING line, two numeric-only lines, and
    (for zh docs) a Han-script suffix. Returns the kept-line ratio, the
    cleaned text, and the Unicode-script Han fraction
    (functions/text.py:303,329,421) — all pure in-row projections."""
    from s3_access_logs_spark.functions.text import (
        clean_lines,
        line_kept_ratio,
        script_profile,
    )

    docs = load_table(spark, sf_dir, "documents")
    inp = docs.select(
        "doc_id",
        F.concat(
            F.lit("OK\n"),
            F.upper(F.substring("text", 1, 40)),
            F.lit("\n12:45\n"),
            F.col("text"),
            F.when(F.col("lang") == "zh", F.lit(" 模型 数据 训练")).otherwise(
                F.lit("")
            ),
            F.lit("\n99%"),
        ).alias("text"),
    )
    return inp.select(
        "doc_id",
        F.round(line_kept_ratio("text"), 6).alias("kept_ratio6"),
        clean_lines("text").alias("cleaned"),
        F.round(
            F.element_at(script_profile("text"), F.lit("han")), 6
        ).alias("han6"),
    )


# ---------------------------------------------------------------------------
# Domain blocklist + registrable domain

_HOSTS = [
    "example.com", "news.bbc.co.uk", "spam.example.org",
    "cdn.badsite.net", "shop.goodsite.io", "evil.co.uk",
]
_BLOCKLIST = ["example.com", "badsite.net", "evil.co.uk", "HTTPS://Nope.ORG"]
# pmod form (round 8, dirty-docs sweep): Spark's % keeps the dividend's
# sign, so `doc_id % 6 + 1` for a NEGATIVE id indexes from the ARRAY END
# in element_at/list_extract — sign-safe pmod pins one host per id on
# both engines for any key value
_PMOD6 = "(((doc_id % 6) + 6) % 6)"
_HOST_SQL = (
    "list_extract(["
    + ", ".join(f"'{h}'" for h in _HOSTS)
    + f"], {_PMOD6}::INT + 1)"
)
_RDOM = {
    "example.com": "example.com",
    "news.bbc.co.uk": "bbc.co.uk",
    "spam.example.org": "example.org",
    "cdn.badsite.net": "badsite.net",
    "shop.goodsite.io": "goodsite.io",
    "evil.co.uk": "evil.co.uk",
}
_RDOM_SQL = (
    "list_extract(["
    + ", ".join(f"'{_RDOM[h]}'" for h in _HOSTS)
    + f"], {_PMOD6}::INT + 1)"
)


@query(
    "domain_blocklist",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, {_HOST_SQL} AS host, {_RDOM_SQL} AS rdomain
      FROM documents
    )
    SELECT doc_id, rdomain FROM u
    -- a NULL doc_id synthesizes a NULL url: the blocklist keeps it
    -- un-filtered (absence of signal is not rejection, the repo-wide
    -- rule) with a NULL rdomain — dirty-docs sweep, round 8
    WHERE doc_id IS NULL OR {_PMOD6} NOT IN (0, 3, 5)
    """,
    tags=("llm", "url", "blocklist"),
)
def domain_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocks-all-subdomains domain filtering + eTLD+1 extraction over
    synthesized URLs: each doc gets one of six hosts (some under
    second-level suffixes like co.uk), half behind a www. label and an
    upper-cased scheme, and the blocklist carries a scheme'd entry that
    must normalize before matching. Suffix-explode -> broadcast semi
    join (functions/url.py:105); the oracle derives blocked-ness and the
    registrable domain from the same doc_id formula, so every parse,
    suffix walk and join verdict is value-checked."""
    from s3_access_logs_spark.functions.url import (
        domain_blocklist_filter,
        registrable_domain,
        url_host,
    )

    docs = load_table(spark, sf_dir, "documents")
    # pmod, not % (round 8): a negative id's sign-kept remainder would
    # index element_at from the array END — a different host than the
    # oracle's formula, and an accidental one
    host = F.element_at(
        F.array(*[F.lit(h) for h in _HOSTS]),
        F.pmod(F.col("doc_id"), 6).cast("int") + 1,
    )
    sub = F.when(F.col("doc_id") % 2 == 0, F.lit("www.")).otherwise(F.lit(""))
    url = F.concat(
        F.lit("HTTPS://"), sub, host, F.lit("/p/"),
        F.col("doc_id").cast("string"),
    )
    inp = docs.select("doc_id", url.alias("url"))
    clean = domain_blocklist_filter(inp, "url", _BLOCKLIST, "doc_id")
    return clean.select(
        "doc_id",
        registrable_domain(
            F.regexp_replace(url_host(F.col("url")), r"^www\.", "")
        ).alias("rdomain"),
    )


# ---------------------------------------------------------------------------
# Bigram-LM perplexity scoring

@query(
    "perplexity_scores",
    oracle=None,  # filled below (generated SQL with the smoothing constants)
    tags=("llm", "text", "lm", "quality"),
)
def perplexity_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality gate: train the capped bigram model on the
    English slice, score EVERY document's cross-entropy under it
    (Jelinek-Mercer lambda=0.7, add-one unigram backoff). Three
    broadcast joins + one doc-grain aggregation (functions/lm.py);
    non-English and degenerate docs must score visibly worse, and
    sub-2-token docs yield NULL (no bigram evidence)."""
    from s3_access_logs_spark.functions.lm import (
        perplexity_score,
        train_bigram_lm,
    )

    docs = load_table(spark, sf_dir, "documents")
    model = train_bigram_lm(docs.filter(F.col("lang") == "en"))
    out = perplexity_score(docs, model)
    return out.select(
        "doc_id",
        "n_bigrams",
        F.round("xent", 6).alias("xent6"),
    )


def _perplexity_sql(lam: float = 0.7) -> str:
    from s3_access_logs_spark.plans.text_queries import SQL_WORDS

    return f"""
    WITH ref AS (
      SELECT {SQL_WORDS} AS toks FROM documents
      WHERE lang = 'en' AND len({SQL_WORDS}) > 0
    ),
    uni AS (
      SELECT w1, COUNT(*) AS cnt FROM (SELECT unnest(toks) AS w1 FROM ref)
      GROUP BY 1
    ),
    bi AS (
      SELECT w1, w2, COUNT(*) AS cnt FROM (
        SELECT toks[i] AS w1, toks[i + 1] AS w2
        FROM ref, unnest(range(1, len(toks))) AS t(i)
      ) GROUP BY 1, 2
    ),
    meta AS (SELECT SUM(cnt) AS total, COUNT(*) AS vocab FROM uni),
    pairs AS (
      SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      FROM (SELECT doc_id, {SQL_WORDS} AS toks FROM documents)
           , unnest(range(1, len(toks))) AS t(i)
      WHERE len(toks) >= 2
    ),
    scored AS (
      SELECT p.doc_id,
             ln({lam} * (CASE WHEN b.cnt IS NOT NULL AND u1.cnt IS NOT NULL
                              THEN b.cnt::DOUBLE / u1.cnt::DOUBLE
                              ELSE 0.0 END)
                + {1.0 - lam} * ((COALESCE(u2.cnt, 0)::DOUBLE + 1.0)
                                 / (m.total + m.vocab)::DOUBLE)) AS logp
      FROM pairs p
      LEFT JOIN bi b ON p.w1 = b.w1 AND p.w2 = b.w2
      LEFT JOIN uni u1 ON p.w1 = u1.w1
      LEFT JOIN uni u2 ON p.w2 = u2.w1
      CROSS JOIN meta m
    ),
    agg AS (
      SELECT doc_id, COUNT(*) AS n_bigrams, -AVG(logp) AS xent
      FROM scored GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(a.n_bigrams, 0) AS n_bigrams,
           ROUND(a.xent, 6) AS xent6
    FROM documents d
    -- null-SAFE join-back (dirty-docs sweep, round 8): a NULL doc_id
    -- never equality-matches its own agg group, which silently zeroed
    -- the NULL-id doc's score while Spark's groupBy scored it
    LEFT JOIN agg a ON d.doc_id IS NOT DISTINCT FROM a.doc_id
    """


# ---------------------------------------------------------------------------
# Temperature mixing + stratified sampling

@query(
    "temperature_mixture_rates",
    oracle="""
    WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY 1),
    t AS (SELECT SUM(n) AS total, SUM(n ** 0.7) AS wsum FROM c),
    r AS (
      SELECT source, n,
             least(1.0, (t.total * (n ** 0.7) / t.wsum) / n) AS rate
      FROM c CROSS JOIN t
    ),
    kept AS (
      -- null-SAFE source join (dirty-docs sweep, round 8): a NULL
      -- source is its own mixture group on the Spark side (groupBy
      -- keeps NULL), so the equality join must not drop its docs
      SELECT d.source, r.rate FROM documents d
      JOIN r ON d.source IS NOT DISTINCT FROM r.source
      WHERE (('0x' || substr(md5('temp0:' || d.doc_id::VARCHAR), 1, 8))::BIGINT
             / 4294967296.0) < r.rate
    )
    SELECT source, COUNT(*) AS n_kept, ROUND(MIN(rate), 6) AS rate6
    FROM kept GROUP BY source
    """,
    tags=("llm", "sampling", "mixture"),
)
def temperature_mixture_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count^0.7 temperature re-balancing of sources: per-source keep
    rates derived from observed sizes, applied as the deterministic
    md5 hash-rate filter (operators/sampling.py:101). Output = per-source
    kept counts + the applied rate; one tiny count aggregation, the
    corpus itself never shuffles."""
    from s3_access_logs_spark.operators.sampling import temperature_mixture

    docs = load_table(spark, sf_dir, "documents")
    out = temperature_mixture(docs, "source", "doc_id", alpha=0.7)
    return out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.round(F.min("_keep_rate"), 6).alias("rate6"),
    )


@query(
    "stratified_sample_quota",
    oracle="""
    SELECT doc_id, lang, source FROM documents
    WHERE doc_id IS NOT NULL
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY lang
      ORDER BY md5('sample0:' || doc_id::VARCHAR), doc_id) <= 20
    """,
    tags=("llm", "sampling", "stratified"),
)
def stratified_sample_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 20 docs per language, chosen by salted-md5 rank within
    each stratum (operators/sampling.py:19) — the deterministic eval-set
    drawer: same salt, same sample, every rerun. Sampling KEYS on
    doc_id, so NULL-id rows are out of contract and excluded on both
    sides (dirty-docs sweep, round 8): a NULL rank key sorts
    engine-specifically, and an identity-less draw could never be
    deduplicated or reproduced downstream anyway."""
    from s3_access_logs_spark.operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    return stratified_sample(docs, "lang", 20, "doc_id").select(
        "doc_id", "lang", "source"
    )


# ---------------------------------------------------------------------------
# Patch in generated oracle SQL (text_queries' convention).

import dataclasses as _dc  # noqa: E402

from s3_access_logs_spark.plans.catalog import QUERIES as _Q  # noqa: E402

_Q["containment_pairs"] = _dc.replace(
    _Q["containment_pairs"], oracle=_containment_sql()
)
_Q["perplexity_scores"] = _dc.replace(
    _Q["perplexity_scores"], oracle=_perplexity_sql()
)


# ---------------------------------------------------------------------------
# Sketch stores: KMV distinct, quantile profile, count-min, Bloom

@query(
    "kmv_distinct_estimate",
    oracle="""
    WITH h AS (
      -- NULLs are not a value (kmv_build's documented exclusion); the
      -- dirty-star sweep (round 7) caught the oracle hashing NULL into
      -- a NULL unit-hash that the exact-count branch then counted
      SELECT DISTINCT ('0x' || substr(md5(l_partkey::VARCHAR), 1, 15))::BIGINT
             / 1152921504606846976.0 AS u
      FROM lineitem
      WHERE l_partkey IS NOT NULL
    ),
    b AS (SELECT u FROM h ORDER BY u LIMIT 256),
    est AS (
      SELECT CASE WHEN COUNT(*) < 256 THEN COUNT(*)::DOUBLE
                  ELSE 255.0 / MAX(u) END AS e
      FROM b
    )
    SELECT ROUND(e, 4) AS est_merged4, ROUND(e, 4) AS est_whole4,
           256::BIGINT AS k
    FROM est
    """,
    tags=("sketch", "distinct", "llm"),
)
def kmv_distinct_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch (functions/kmv.py): two sketches built
    over disjoint halves of lineitem (l_orderkey parity), merged, and
    evaluated IN-ENGINE against the single-pass sketch of the whole
    table — the merge-equals-whole property is the entire point of a
    persistent sketch store, and the oracle recomputes the (k-1)/U_k
    estimate from the same md5-based bottom-k."""
    from s3_access_logs_spark.functions.kmv import kmv_build, kmv_merge

    li = load_table(spark, sf_dir, "lineitem")
    k = 256
    # the halves must PARTITION the table or merge-equals-whole breaks:
    # a NULL l_orderkey fails BOTH parity predicates (NULL % 2 is NULL),
    # and Spark's `%` keeps the dividend's sign so a NEGATIVE key
    # (-3 % 2 = -1) matches neither `== 0` nor `== 1` (dirty-star sweep
    # round 7 caught the NULL route; round 8 closes the sign route).
    # The second half is therefore the exact COMPLEMENT of the first —
    # `~first` is never NULL because the isNull disjunct absorbs the
    # only NULL-producing input — so the two predicates partition the
    # table for ANY key value by construction.
    first_half = (F.col("l_orderkey") % 2 == 0) | F.col("l_orderkey").isNull()
    merged = kmv_merge(
        kmv_build(li.filter(first_half), "l_partkey", k),
        kmv_build(li.filter(~first_half), "l_partkey", k),
    )
    whole = kmv_build(li, "l_partkey", k)

    def est(sk: DataFrame, name: str) -> DataFrame:
        vals = sk.filter(F.col("u") >= 0)
        return vals.agg(
            F.round(
                F.when(
                    F.count(F.lit(1)) < k,
                    F.count(F.lit(1)).cast("double"),
                ).otherwise(F.lit(float(k - 1)) / F.max("u")),
                4,
            ).alias(name)
        )

    return (
        est(merged, "est_merged4")
        .crossJoin(est(whole, "est_whole4"))
        .withColumn("k", F.lit(k).cast("bigint"))
    )


@query(
    "quantile_profile",
    oracle="""
    WITH q AS (
      SELECT source,
             quantile_cont(length(text), [0.25, 0.5, 0.9]) AS vs
      FROM documents GROUP BY source
    )
    SELECT source,
           (CASE t.i WHEN 1 THEN 0.25 WHEN 2 THEN 0.5 ELSE 0.9 END)::DOUBLE
             AS q,
           ROUND(vs[t.i]::DOUBLE, 6) AS value
    FROM q, unnest(range(1, 4)) AS t(i)
    """,
    tags=("sketch", "quantile", "llm"),
)
def quantile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length quantiles through the mergeable
    grouped bottom-k-by-hash sketch (functions/quantile.py:124): two
    sketches over disjoint halves, merged, evaluated fully in-engine.
    With per-group k=512 >= every group size the sample provably IS the
    group, so the linear-interpolation quantiles are exact and
    hash-independent — the oracle checks them against quantile_cont
    while build/merge/evaluate all exercise the shipped machinery."""
    from s3_access_logs_spark.functions.quantile import (
        grouped_quantile_sketch_build,
        grouped_quantile_sketch_merge,
        grouped_quantile_values,
    )

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "_len", F.length("text")
    )
    # exact-complement halves (the kmv_distinct_estimate rule, review
    # r8): `== 0` / `== 1` parity would drop NULL doc_ids (NULL % 2 is
    # NULL) and negative odd ids (-3 % 2 = -1 under Spark's
    # sign-keeping %) from BOTH halves — merge-equals-whole would break
    # on dirty data by the exact route the r7 sweep closed for kmv
    first_half = (F.col("doc_id") % 2 == 0) | F.col("doc_id").isNull()
    ska = grouped_quantile_sketch_build(
        docs.filter(first_half), "_len", "doc_id", ["source"], k=512
    )
    skb = grouped_quantile_sketch_build(
        docs.filter(~first_half), "_len", "doc_id", ["source"], k=512
    )
    merged = grouped_quantile_sketch_merge(ska, skb)
    out = grouped_quantile_values(merged, [0.25, 0.5, 0.9])
    return out.select(
        "source", "q", F.round(F.col("value"), 6).alias("value")
    )


@query(
    "cms_token_frequencies",
    oracle=None,  # filled below (exact counts; see entry docstring)
    tags=("sketch", "frequency", "llm"),
)
def cms_token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency store (functions/cms.py): sketch the corpus
    token stream into the default 5x65536 counter grid — built as two
    per-half sketches SUMMED by cms_merge, the linearity the streaming
    store's fold relies on — then probe every distinct token via the
    broadcast dense-grid estimate. The internal hashes are xxhash64 (no
    DuckDB equivalent), so the oracle checks the hash-independent
    surface: at ~40 distinct tokens against 5 rows of 65536 counters a
    full-depth collision is impossible in practice, the run is
    deterministic, and every estimate must equal the exact count."""
    from s3_access_logs_spark.functions.cms import (
        cms_build,
        cms_estimate,
        cms_merge,
    )
    from s3_access_logs_spark.functions.text import words

    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id", F.explode(words("text")).alias("token")
    )
    # exact-complement halves (see quantile_profile / kmv_distinct_
    # estimate): parity `== 0`/`== 1` drops NULL and negative-odd ids
    # from both halves, silently undercounting the merged sketch
    first_half = (F.col("doc_id") % 2 == 0) | F.col("doc_id").isNull()
    sk = cms_merge(
        cms_build(tokens.filter(first_half), "token"),
        cms_build(tokens.filter(~first_half), "token"),
    )
    probe = tokens.select("token").distinct()
    return cms_estimate(probe, "token", sk).select("token", "est_count")


_CMS_ORACLE = """
    WITH tok AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
      FROM documents
    )
    SELECT token, COUNT(*) AS est_count FROM tok GROUP BY token
    """


@query(
    "bloom_digest_membership",
    oracle="""
    -- NULL text digests to NULL and probes NULL (membership of nothing
    -- is unknowable); a NULL doc_id's parity is NULL but its digest is
    -- real and definitely NOT in the even-id filter -> FALSE
    -- (dirty-docs sweep, round 8)
    SELECT doc_id,
           CASE WHEN text IS NULL THEN NULL
                ELSE coalesce(doc_id % 2 = 0, FALSE) END AS maybe_seen
    FROM documents
    """,
    tags=("sketch", "membership", "llm"),
)
def bloom_digest_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persistent Bloom filter store (functions/bloom.py): build the
    filter over the even-id half's text digests — as two quarter-filters
    OR-merged by bloom_merge, the append path the streaming ingest gate
    uses — and probe every document. No false negatives is the hard
    guarantee (every member MUST probe true); at 250 keys in 2^20 bits
    the deterministic false-positive count is zero, so the oracle pins
    the exact membership vector."""
    from s3_access_logs_spark.functions.bloom import (
        bloom_build,
        bloom_merge,
        bloom_probe,
    )

    docs = load_table(spark, sf_dir, "documents")
    digests = docs.select("doc_id", F.md5("text").alias("digest"))
    # membership predicate `% 2 == 0` is SHARED with the oracle, so
    # NULL/negative ids resolve identically on both engines; the
    # quarter split below must still be an exact complement (review
    # r8): `% 4 == 0` / `% 4 == 2` would drop a NEGATIVE even member
    # (-2 % 4 = -2 under Spark's sign-keeping %) from both quarters —
    # a false negative, the one thing a Bloom filter must never produce
    members = digests.filter(F.col("doc_id") % 2 == 0)
    first_quarter = F.col("doc_id") % 4 == 0
    bl = bloom_merge(
        bloom_build(
            members.filter(first_quarter).select("digest"),
            "digest", num_bits=1 << 20,
        ),
        bloom_build(
            members.filter(~first_quarter).select("digest"),
            "digest", num_bits=1 << 20,
        ),
    )
    return bloom_probe(digests, "digest", bl).select(
        "doc_id", "maybe_seen"
    )


_Q["cms_token_frequencies"] = _dc.replace(
    _Q["cms_token_frequencies"], oracle=_CMS_ORACLE
)


# ---------------------------------------------------------------------------
# Winnowing verbatim-span detection

@query(
    "duplicate_spans",
    oracle=None,  # filled below (generated winnowing SQL)
    tags=("dedup", "llm", "winnowing", "spans"),
    bench=True,
)
def duplicate_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document verbatim-span detection (winnowing fingerprints ->
    gram posting lists -> alignment-diagonal islands,
    operators/dedup.py:1098) over documents plus synthesized copies:
    every 5th doc spawns a ``max(doc_id)+1``-offset copy (collision-proof
    — see ``_offset_copies``) carrying 120 characters lifted from
    offset 10 inside new framing text — a guaranteed verbatim copy well
    past the t = window+k-1 = 50 detection threshold. Runs at the
    PRODUCTION parameters (k=8, window=43, hot-gram cap 1000) with the
    portable md5 selection hash so the DuckDB oracle replays the exact
    fingerprint selection; natural 50+-char repeats between word-soup
    documents are detected identically on both sides."""
    docs = load_table(spark, sf_dir, "documents")
    copies = _offset_copies(
        docs,
        docs.filter(F.col("doc_id") % 5 == 0).select(
            "doc_id",
            F.concat(
                F.lit("prefix-"), F.col("doc_id").cast("string"),
                F.lit("> "), F.substring("text", 10, 120), F.lit(" <copied"),
            ).alias("text"),
        ),
    )
    inp = docs.select("doc_id", "text").unionByName(copies)
    return D.duplicate_spans(inp, portable_hash=True)


def _duplicate_spans_sql(k: int = 8, window: int = 43) -> str:
    t = window + k - 1
    return f"""
    WITH inp AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {_SQL_COPY_OFF} AS doc_id,
             'prefix-' || doc_id || '> ' || substr(text, 10, 120)
                       || ' <copied' AS text
      FROM documents WHERE doc_id % 5 = 0
    ),
    -- the 2^24-gram cap mirrors winnow_fingerprints' explicit contract
    -- (position packing would overflow BIGINT past it)
    g AS (SELECT doc_id, text, length(text) - {k - 1} AS m
          FROM inp
          WHERE length(text) >= {k}
            AND length(text) - {k - 1} <= 16777216),
    -- packed (hash, position) selection keys, the exact Spark-side
    -- construction (winnow_fingerprints round 7): (md5 mod 2^39) * 2^24
    -- + 0-based position, so list_min alone returns the leftmost
    -- minimum and its position in one scan
    h AS (SELECT doc_id, text, m,
          list_transform(range(1, m + 1),
            i -> ((('0x' || substr(md5(substr(text, i::INT, {k})), 1, 15))::BIGINT
                   % 549755813888) * 16777216) + (i - 1)
          ) AS hs
          FROM g),
    sel AS (SELECT doc_id, text,
            list_distinct(list_transform(
              range(0, greatest(m - {window}, 0) + 1),
              j -> list_min(hs[(j+1)::INT:(j+{window})::INT]) % 16777216
            )) AS poss
            FROM h),
    fp0 AS (SELECT doc_id, u.p AS pos, substr(text, (u.p + 1)::INT, {k}) AS gram
            FROM sel, unnest(poss) AS u(p)),
    fp AS (SELECT doc_id, pos, gram FROM fp0
           QUALIFY COUNT(*) OVER (PARTITION BY gram)
                   <= {D.DEFAULT_MAX_GRAM_FREQ}),
    m0 AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  a.pos - b.pos AS diag, a.pos AS pos_a
           FROM fp a JOIN fp b
             ON a.gram = b.gram AND a.doc_id < b.doc_id),
    isl AS (SELECT id_a, id_b, diag, pos_a,
            CASE WHEN pos_a - lag(pos_a) OVER (
                   PARTITION BY id_a, id_b, diag ORDER BY pos_a)
                 <= {window} THEN 0 ELSE 1 END AS newf
            FROM m0),
    isl2 AS (SELECT *, SUM(newf) OVER (
               PARTITION BY id_a, id_b, diag ORDER BY pos_a
               ROWS UNBOUNDED PRECEDING) AS island
             FROM isl),
    sp AS (SELECT id_a, id_b, diag, island,
                  MIN(pos_a) AS start_a,
                  MAX(pos_a) - MIN(pos_a) + {k} AS span_len,
                  COUNT(*) AS n_grams
           FROM isl2 GROUP BY 1, 2, 3, 4)
    SELECT id_a, id_b, start_a, start_a - diag AS start_b, span_len, n_grams
    FROM sp WHERE span_len >= {t}
    """


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection

@query(
    "jl_projection",
    oracle=None,  # filled below (LCG plane literals)
    tags=("similarity", "llm", "projection"),
)
def jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL dimensionality reduction 64 -> 16 (operators/similarity.py:638):
    the deterministic LCG plane family rides in one broadcast row and
    the projection is a zero-exchange fold. The oracle inlines the same
    plane values as SQL literals and folds in the same left-to-right
    order, so every component matches to the rounding digit. Malformed
    vectors are out of contract on both engines (review r6 pass 8):
    un-filtered, a ragged vector trips random_projection's loud
    size-assert while the oracle emits NULL-component rows for it."""
    from s3_access_logs_spark.operators.similarity import random_projection
    from s3_access_logs_spark.plans.vector_queries import (
        well_formed_embeddings,
    )

    emb = well_formed_embeddings(load_table(spark, sf_dir, "embeddings"))
    out = random_projection(emb, "embedding", dims=64, out_dims=16)
    return out.select(
        "vec_id", F.posexplode("projection").alias("dim", "value")
    ).select(
        "vec_id", "dim", F.round(F.col("value"), 6).alias("proj6")
    )


def _jl_sql(out_dims: int = 16, dims: int = 64, seed: int = 42) -> str:
    from s3_access_logs_spark.operators.similarity import _lcg_planes
    from s3_access_logs_spark.plans.vector_queries import sql_well_formed

    planes = _lcg_planes(out_dims, dims, seed)
    scale = (3.0 / out_dims) ** 0.5
    pl = (
        "["
        + ", ".join(
            "[" + ", ".join(repr(x) for x in row) + "]" for row in planes
        )
        + "]"
    )
    # well-formed rows only (shared sql_well_formed; the builder routes
    # through well_formed_embeddings) — no slice needed: i is bounded by
    # dims, so over-length rows project on their leading dims either way
    return f"""
    WITH p AS (SELECT {pl} AS pl)
    SELECT vec_id, u.j - 1 AS dim,
           ROUND(list_reduce(
                   list_transform(range(1, {dims + 1}),
                                  i -> embedding[i]::DOUBLE * pl[u.j][i]),
                   (a, b) -> a + b) * {scale!r}, 6) AS proj6
    FROM embeddings, p, unnest(range(1, {out_dims + 1})) AS u(j)
    WHERE {sql_well_formed(dims)}
    """


# ---------------------------------------------------------------------------
# Perceptual image dedup (dHash + banded Hamming)

def _rhe(v: str) -> str:
    """Round-half-even (numpy .round()) as SQL — shared by the image
    resample grid and the audio/video envelope oracles; ties only occur
    on power-of-two divisors, where the CASE picks the even floor."""
    return (
        f"(floor({v}) + CASE WHEN ({v}) - floor({v}) > 0.5 "
        f"OR (({v}) - floor({v}) = 0.5 AND (floor({v})::BIGINT % 2) = 1) "
        f"THEN 1 ELSE 0 END)::BIGINT"
    )


def _dhash_fp_sql() -> str:
    """Fingerprint CTE body: recompute the dHash of every synthesized
    image (operators/multimodal.py:478) from the closed-form pixel
    pattern — grayscale ordering equals the integer channel-sum
    ordering, and the 9x8 nearest-sample grid replays numpy's
    linspace-then-round-half-even exactly (i * ((n-1)/step) with the
    same float evaluation order, .5 ties only possible on the /8 axis
    where the bankers'-rounding CASE handles them)."""

    def s3(x: str, y: str) -> str:
        b = f"(({x}) * 3 + ({y}) * 5 + doc_id * 7)"
        return f"(({b}) % 256 + ({b} + 11) % 256 + ({b} + 22) % 256)"

    bit = (
        f"CASE WHEN {s3('xs[(i % 8)::INT + 1]', 'ys[(i // 8)::INT + 1]')} "
        f"< {s3('xs[(i % 8)::INT + 2]', 'ys[(i // 8)::INT + 1]')} "
        f"THEN 1::BIGINT ELSE 0::BIGINT END"
    )
    return f"""
    img AS (
      -- synthesis domain (SQL_ASSET_DOCS, dirty-docs sweep r8): the
      -- closed-form parameters replay Python's floor-mod only for
      -- non-negative ids, and synthesis needs a real text body
      SELECT doc_id, 16 + doc_id % 240 AS w, 16 + (doc_id * 7) % 240 AS h
      FROM documents
      WHERE {SQL_ASSET_DOCS} AND doc_id % 3 = 0
    ),
    grid AS (
      SELECT doc_id,
             list_transform(range(0, 8),
               i -> {_rhe('i * ((h - 1) / 7.0)')}) AS ys,
             list_transform(range(0, 9),
               i -> {_rhe('i * ((w - 1) / 8.0)')}) AS xs
      FROM img
    ),
    fp AS (
      SELECT doc_id AS id,
             list_sum(list_transform(range(0, 32),
               i -> ({bit}) << (i % 32)::INT))::BIGINT AS w0,
             list_sum(list_transform(range(32, 64),
               i -> ({bit}) << ((i - 32) % 32)::INT))::BIGINT AS w1
      FROM grid
    )
    """


@query(
    "image_dhash_fingerprints",
    oracle=None,  # filled below
    tags=("multimodal", "llm", "dedup", "perceptual"),
)
def image_dhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual 64-bit dHash fingerprints of real decoded PNGs: the
    synthesized asset table's image payloads are fully valid PNGs of a
    closed-form pixel pattern; Spark decodes the actual bytes
    (pillow or the pure-stdlib PNG decoder) and hashes the pixels
    (operators/multimodal.py:494), while the oracle recomputes the hash
    from the pattern formula — byte round-trip, decoder, grayscale,
    resample grid and bit packing all value-checked."""
    from s3_access_logs_spark.operators import multimodal as MM

    docs = load_table(spark, sf_dir, "documents").filter(SQL_ASSET_DOCS)
    assets = MM.synthesize_assets(docs, pixels=True).filter(
        F.col("modality") == "image"
    )
    return MM.image_dhash(assets)


@query(
    "image_near_pairs",
    oracle=None,  # filled below
    tags=("multimodal", "llm", "dedup", "perceptual", "hamming"),
)
def image_near_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup pairs at Hamming <= 6 over the dHash
    fingerprints, through the shared pigeonhole-banded machinery
    (operators/dedup.py:654 — 16-bit chunk equi-join candidates, exact
    popcount verify; banding is COMPLETE for <= chunks-1 differing
    bits, so the oracle's brute-force pair scan is the same row set)."""
    from s3_access_logs_spark.operators import multimodal as MM

    docs = load_table(spark, sf_dir, "documents").filter(SQL_ASSET_DOCS)
    assets = MM.synthesize_assets(docs, pixels=True).filter(
        F.col("modality") == "image"
    )
    return MM.image_near_pairs(assets, max_hamming=6, max_band_freq=None)


_Q["duplicate_spans"] = _dc.replace(
    _Q["duplicate_spans"], oracle=_duplicate_spans_sql()
)
_Q["jl_projection"] = _dc.replace(_Q["jl_projection"], oracle=_jl_sql())
_Q["image_dhash_fingerprints"] = _dc.replace(
    _Q["image_dhash_fingerprints"],
    oracle=f"WITH {_dhash_fp_sql()} SELECT id, w0, w1 FROM fp",
)
_Q["image_near_pairs"] = _dc.replace(
    _Q["image_near_pairs"],
    oracle=f"""
    WITH {_dhash_fp_sql()}
    SELECT a.id AS id_a, b.id AS id_b,
           (bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1)))::INT
             AS hamming
    FROM fp a JOIN fp b ON a.id < b.id
    WHERE bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1)) <= 6
    """,
)


# ---------------------------------------------------------------------------
# Composed curation waterfall

@query(
    "curate_waterfall",
    oracle=None,  # filled below (reuses text_queries' quality/lang fragments)
    tags=("llm", "pipeline", "curation"),
)
def curate_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-call curation pipeline's waterfall report
    (operators/curate.py:45) with the quality and language gates on:
    each document counts against the FIRST stage that rejects it
    (empty -> exact_dup -> quality -> language), the exact-dup keeper
    is elected among gate-passing digest-mates (the r5 election fix),
    and dropped-per-stage plus survivors sums to the input exactly."""
    from s3_access_logs_spark.operators.curate import curate_corpus

    docs = load_table(spark, sf_dir, "documents")
    _, report = curate_corpus(docs, min_quality=0.5, langs=("en",))
    return report


def _waterfall_ctes() -> str:
    """The quality+language curate_corpus waterfall as a reusable CTE
    stack ending in ``v(doc_id, text, stage)`` — shared by the
    ``curate_waterfall`` oracle and the ``export_training_report``
    oracle (which continues past the waterfall into the export
    metrics)."""
    from s3_access_logs_spark.plans.text_queries import (
        SQL_WORDS,
        _lang_hits_sql,
    )

    q_expr = f"""
        0.4 * least(len(toks)::DOUBLE / 100.0, 1.0)
        + 0.3 * (len(list_distinct(toks))::DOUBLE
                 / greatest(len(toks), 1)::DOUBLE)
        + 0.3 * least(({_lang_hits_sql('en')})::DOUBLE
                      / greatest(len(toks), 1)::DOUBLE * 4.0, 1.0)
    """
    is_en = f"""
        {_lang_hits_sql('en')} = greatest({_lang_hits_sql('en')},
            {_lang_hits_sql('de')}, {_lang_hits_sql('es')},
            {_lang_hits_sql('fr')}, {_lang_hits_sql('zh')})
        AND {_lang_hits_sql('en')} > 0
    """
    return f"""
    WITH t AS (SELECT doc_id, text, {SQL_WORDS} AS toks FROM documents),
    f AS (
      SELECT doc_id, text,
             (text IS NULL OR trim(text) = '') AS f_empty,
             COALESCE(({q_expr}) < 0.5, FALSE) AS f_quality,
             NOT COALESCE({is_en}, FALSE) AS f_language
      FROM t
    ),
    e AS (
      SELECT *,
             (ROW_NUMBER() OVER (
                PARTITION BY md5(trim(regexp_replace(lower(text),
                                                     '\\s+', ' ', 'g')))
                ORDER BY (f_empty OR f_quality OR f_language)::INT, doc_id)
              > 1) AND NOT f_empty AS f_exact
      FROM f
    ),
    v AS (
      SELECT doc_id, text,
             CASE WHEN f_empty THEN 'empty'
                  WHEN f_exact THEN 'exact_dup'
                  WHEN f_quality THEN 'quality'
                  WHEN f_language THEN 'language'
                  ELSE 'kept' END AS stage
      FROM e
    )"""


def _curate_waterfall_sql() -> str:
    return f"""
    {_waterfall_ctes()}
    SELECT stage, COUNT(*) AS dropped FROM v
    WHERE stage <> 'kept' GROUP BY stage
    """


_Q["curate_waterfall"] = _dc.replace(
    _Q["curate_waterfall"], oracle=_curate_waterfall_sql()
)


#: export_training_report's layout parameters — small enough that the
#: sf0.01 corpus exercises multi-window shards and every shard.
_EXPORT_SHARDS = 8
_EXPORT_WINDOW = 64


def _export_training_report_sql() -> str:
    from s3_access_logs_spark.functions import bpe as B
    from s3_access_logs_spark.plans.text_queries import SQL_MD5_LONG

    shard = (
        SQL_MD5_LONG.format(x="'shards:' || doc_id::VARCHAR")
        + f" % {_EXPORT_SHARDS}"
    )
    return f"""
    {_waterfall_ctes()},
    wf AS (
      SELECT stage, COUNT(*)::BIGINT AS dropped FROM v
      WHERE stage <> 'kept' GROUP BY stage
    ),
    tok AS (
      SELECT ({shard}) AS shard,
             COALESCE({B.bpe_count_sql("text")}, 0) AS n_tok
      FROM v WHERE stage = 'kept'
    ),
    per_shard AS (
      SELECT shard, SUM(n_tok + 1) AS stream_len FROM tok GROUP BY shard
    ),
    metrics AS (
      SELECT 'tokens_kept' AS stage,
             COALESCE(SUM(n_tok), 0)::BIGINT AS dropped FROM tok
      UNION ALL
      SELECT 'windows_emitted',
             COALESCE(SUM((stream_len + {_EXPORT_WINDOW - 1})
                          // {_EXPORT_WINDOW}), 0)::BIGINT
      FROM per_shard
      UNION ALL
      SELECT 'shards_written', COUNT(DISTINCT shard)::BIGINT FROM tok
    )
    SELECT stage, dropped FROM wf
    UNION ALL
    SELECT stage, dropped FROM metrics
    """


@query(
    "export_training_report",
    oracle=None,  # filled below (waterfall CTEs + export metrics)
    tags=("llm", "pipeline", "curation", "export", "shards"),
)
def export_training_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-call corpus→shards flagship's report
    (operators/export.py:export_training_set — round 10, VERDICT r9
    item 2): curate (quality + language, the `curate_waterfall`
    config) → exact demo-vocab token-id streams with EOS boundaries →
    fixed 64-id windows per salted-hash shard → hive ``shard=<n>``
    parquet, all in one call whose waterfall gains ``tokens_kept`` /
    ``windows_emitted`` / ``shards_written`` rows. The oracle replays
    the ENTIRE composition — waterfall verdicts, per-kept-doc exact
    BPE counts, shard hash, per-shard window arithmetic — so a drift
    anywhere in the curate→tokenize→shard→pack chain hash-fails here.
    The written windows themselves are value-pinned by
    `packed_token_windows` (same packer) and
    `tests/test_operators.py`'s export invariants; this entry
    value-checks the composed accounting."""
    import shutil
    import tempfile

    from s3_access_logs_spark.operators.export import export_training_set

    docs = load_table(spark, sf_dir, "documents")
    td = tempfile.mkdtemp(prefix="export_train_")
    try:
        _, report = export_training_set(
            docs,
            f"{td}/shards",
            n_shards=_EXPORT_SHARDS,
            window_ids=_EXPORT_WINDOW,
            curate={"min_quality": 0.5, "langs": ("en",)},
        )
    finally:
        shutil.rmtree(td, ignore_errors=True)
    return report


_Q["export_training_report"] = _dc.replace(
    _Q["export_training_report"], oracle=_export_training_report_sql()
)


@query(
    "curate_semantic",
    oracle=None,  # filled below (reuses the semantic-dedup SQL fragments)
    tags=("llm", "pipeline", "curation", "semantic", "dedup"),
)
def curate_semantic_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline's SemDeDup stage (operators/curate.py):
    documents joined to their embeddings (vec_id = doc_id), label
    centroids as the quantizer (deterministic 6-dp per-dim means — the
    SQL-replayable path; production fits them with kmeans_fit), cosine
    threshold 0.3. The waterfall must attribute empty -> exact_dup ->
    semantic with domination elected ONLY among gate-passing docs, and
    dropped-per-stage plus survivors sums to the corpus exactly.
    Embeddings route through well_formed_embeddings (review r6 pass 9):
    curate_corpus itself treats NULL/zero-length vectors as no-signal
    but fails LOUD on ragged ones (the quantizer fit's dims check), and
    the oracle's 64-dim CTEs would error on an over-length vector and
    rank a NaN cosine engine-specifically — malformed vectors are out
    of contract on both engines, like every other embeddings entry."""
    from s3_access_logs_spark.operators.curate import curate_corpus
    from s3_access_logs_spark.plans.vector_queries import (
        _cached_centroids,
        well_formed_embeddings,
    )

    docs = load_table(spark, sf_dir, "documents")
    emb = well_formed_embeddings(load_table(spark, sf_dir, "embeddings"))
    _, report = curate_corpus(
        docs,
        embeddings=emb,
        semantic_threshold=0.3,
        semantic_centroids=_cached_centroids(spark, sf_dir),
    )
    return report


def _curate_semantic_sql() -> str:
    from s3_access_logs_spark.plans.vector_queries import (
        semantic_sql_ctes,
        sql_well_formed,
    )

    return f"""
    WITH f AS (
      SELECT doc_id, text,
             (text IS NULL OR trim(text) = '') AS f_empty
      FROM documents
    ),
    e AS (
      SELECT *,
             (ROW_NUMBER() OVER (
                PARTITION BY md5(trim(regexp_replace(lower(text),
                                                     '\\s+', ' ', 'g')))
                ORDER BY f_empty::INT, doc_id)
              > 1) AND NOT f_empty AS f_exact
      FROM f
    ),
    elig AS (SELECT doc_id FROM e WHERE NOT f_empty AND NOT f_exact),
    emb AS (SELECT vec_id, label, (embedding::DOUBLE[])[1:64] AS v
            FROM embeddings WHERE {sql_well_formed(64)}),
    ee AS (SELECT emb.vec_id, emb.v
           FROM emb JOIN elig ON emb.vec_id = elig.doc_id),
    {semantic_sql_ctes(train_src='emb', assign_src='ee')},
    v AS (
      SELECT CASE WHEN f_empty THEN 'empty'
                  WHEN f_exact THEN 'exact_dup'
                  WHEN doc_id IN (SELECT vec_id FROM dropped)
                       THEN 'semantic'
                  ELSE 'kept' END AS stage
      FROM e
    )
    SELECT stage, COUNT(*) AS dropped FROM v
    WHERE stage <> 'kept' GROUP BY stage
    """


_Q["curate_semantic"] = _dc.replace(
    _Q["curate_semantic"], oracle=_curate_semantic_sql()
)


_CLS_NF = 1 << 12  # hashed-BoW feature-space size of the learned filter


def _classifier_scores_sql(nf: int = _CLS_NF) -> str:
    """Full train+score replay of the deterministic learned filter
    (operators/quality_classifier.py:train_difference_classifier):
    heuristic quality labels -> per-bucket document frequencies
    (integer counts, order-free) -> w = df_pos/Npos - df_neg/Nneg ->
    per-doc ordered fold of w over the sorted distinct buckets. The
    fold order is pinned by ``list(... ORDER BY bucket)`` +
    ``list_reduce`` (sequential, like Spark's F.aggregate starting at
    an exact 0.0), and the output key is ``sql_round_fixed`` on both
    engines."""
    from s3_access_logs_spark.plans.text_queries import (
        SQL_MD5_LONG,
        SQL_WORDS,
        _lang_hits_sql,
    )
    from s3_access_logs_spark.plans.vector_queries import sql_round_fixed

    bucket = f"{SQL_MD5_LONG.format(x='t')} % {nf}"
    return f"""
    WITH d AS (SELECT doc_id, COALESCE(text, '') AS text FROM documents),
    q AS (
      SELECT doc_id,
             0.4 * least(len(toks)::DOUBLE / 100.0, 1.0)
             + 0.3 * (len(list_distinct(toks))::DOUBLE
                      / greatest(len(toks), 1)::DOUBLE)
             + 0.3 * least(({_lang_hits_sql('en')})::DOUBLE
                           / greatest(len(toks), 1)::DOUBLE * 4.0,
                           1.0) AS qs,
             list_sort(list_distinct(
               list_transform(toks, t -> {bucket}))) AS bl
      FROM (SELECT doc_id, text, {SQL_WORDS} AS toks FROM d)
    ),
    pc AS (SELECT COUNT(*) AS n FROM q WHERE qs >= 0.5),
    nc AS (SELECT COUNT(*) AS n FROM q WHERE qs < 0.5),
    pf AS (SELECT b AS bucket, COUNT(*) AS pn
           FROM (SELECT unnest(bl) AS b FROM q WHERE qs >= 0.5)
           GROUP BY b),
    nf AS (SELECT b AS bucket, COUNT(*) AS nn
           FROM (SELECT unnest(bl) AS b FROM q WHERE qs < 0.5)
           GROUP BY b),
    w AS (SELECT COALESCE(pf.bucket, nf.bucket) AS bucket,
                 COALESCE(pn, 0)::DOUBLE / (SELECT n FROM pc)::DOUBLE
                 - COALESCE(nn, 0)::DOUBLE / (SELECT n FROM nc)::DOUBLE
                   AS w
          FROM pf FULL OUTER JOIN nf ON pf.bucket = nf.bucket),
    db AS (SELECT doc_id, unnest(bl) AS bucket FROM q),
    dw AS (SELECT db.doc_id,
                  list(COALESCE(w.w, 0.0) ORDER BY db.bucket) AS ws
           FROM db LEFT JOIN w ON w.bucket = db.bucket
           GROUP BY db.doc_id),
    s AS (SELECT q.doc_id, len(q.bl)::BIGINT AS n_feats,
                 CASE WHEN dw.ws IS NULL THEN 0.0
                      ELSE list_reduce(list_prepend(0.0, dw.ws),
                                       (a, b) -> a + b) END AS logit
          -- null-SAFE join-back (dirty-docs sweep, round 8): Spark
          -- scores each row from its own text, so a NULL-id doc gets a
          -- real logit; the equality join dropped it to the 0.0 arm
          FROM q LEFT JOIN dw ON dw.doc_id IS NOT DISTINCT FROM q.doc_id)
    SELECT doc_id, n_feats,
           {sql_round_fixed('logit')} AS logit6,
           {sql_round_fixed('logit')} > 0.0 AS keep
    FROM s
    """


@query(
    "quality_classifier_scores",
    oracle=_classifier_scores_sql(),
    tags=("llm", "quality", "classifier"),
)
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned quality filter, value-pinned end to end (VERDICT r6
    item 1): heuristic-score labels (quality_score >= 0.5 vs < 0.5)
    train a deterministic difference-of-document-frequency linear model
    over md5-hashed binary BoW features
    (operators/quality_classifier.py:train_difference_classifier —
    integer-count training, so the weights are bit-identical across
    engines, unlike the L-BFGS sibling whose coefficients are
    float-order sensitive and which stays under pytest's
    separation-quality contract); every document then scores via a
    zero-shuffle broadcast-map fold over its sorted feature buckets.
    One row per document: (doc_id, n_feats, logit6, keep)."""
    from s3_access_logs_spark.functions.text import quality_score
    from s3_access_logs_spark.operators.quality_classifier import (
        doc_feature_buckets,
        score_difference_classifier,
        train_difference_classifier,
    )

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text", F.coalesce(F.col("text"), F.lit(""))
    )
    labeled = docs.withColumn("_q", quality_score("text"))
    weights = train_difference_classifier(
        labeled.filter(F.col("_q") >= 0.5),
        labeled.filter(F.col("_q") < 0.5),
        num_features=_CLS_NF,
    )
    from s3_access_logs_spark.operators.similarity import round_fixed

    scored = score_difference_classifier(docs, weights, num_features=_CLS_NF)
    return scored.select(
        "doc_id",
        F.size(doc_feature_buckets("text", _CLS_NF))
        .cast("long")
        .alias("n_feats"),
        round_fixed(F.col("logit")).alias("logit6"),
        (round_fixed(F.col("logit")) > F.lit(0.0)).alias("keep"),
    )


@query(
    "kmeans_assignments",
    oracle=None,  # filled below (generated unrolled-Lloyd SQL)
    tags=("similarity", "llm", "kmeans"),
)
def kmeans_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed spherical k-means (operators/similarity.py:168):
    broadcast-assign + per-dim mean per iteration, corpus never shuffles.
    The full training loop is value-pinned (VERDICT r5 item 2): seeds are
    the k lowest-vec_id embeddings (SQL-expressible, unlike the library
    default's xxhash64 order), ``tol=0.0`` so the early-stop fires only at
    an exact fixpoint (where further unrolled iterations are no-ops), and
    per-iteration means round to 6dp — so the oracle replays all 5 Lloyd
    iterations in SQL and checks every assignment value-exactly."""
    from s3_access_logs_spark.operators.similarity import (
        _assign_clusters,
        kmeans_fit,
    )
    from s3_access_logs_spark.plans.vector_queries import (
        well_formed_embeddings,
    )

    # seed, train AND assign over well-formed vectors only — sliced to
    # 64 dims — mirroring the oracle's filtered+sliced `e` (review r6):
    # un-filtered, a NULL in the k lowest vec_ids crashed kmeans_fit
    # while the oracle silently took it as a centroid; NULL-cosine
    # ordering is engine-specific; a short vector would leak its leading
    # dims into the training means; and an over-length vector passes the
    # size filter but trips kmeans_fit's ragged check un-sliced (the PQ
    # entries slice and proceed on the same row — same posture here)
    # KEYED on vec_id (review r8): NULL-id rows are out of contract —
    # the oracle's per-row argmax partitions by vec_id, so identity-less
    # rows would collapse there while Spark assigned each one (and
    # Spark's nulls-FIRST ASC would additionally make a NULL-id vector
    # seed #1 on one engine only). Same disposition as the stratified
    # sampler; vec_id uniqueness stays the schema contract.
    well_formed = well_formed_embeddings(
        load_table(spark, sf_dir, "embeddings")
    ).filter(F.col("vec_id").isNotNull()).select("vec_id", "embedding")
    seeds = [
        r["embedding"]
        for r in well_formed.orderBy("vec_id").limit(8).collect()
    ]
    if not seeds:
        # no seedable vector: zero assignments, exactly like the
        # oracle's empty cent0 cross join
        return spark.createDataFrame([], "vec_id long, cluster int")
    # fewer than 8 well-formed vectors fits that many clusters, matching
    # the oracle's `LIMIT 8` silently yielding fewer seed rows
    centroids = kmeans_fit(
        well_formed, k=len(seeds), max_iter=5, tol=0.0, init=seeds
    )
    return _assign_clusters(well_formed, centroids, "embedding", 1).select(
        "vec_id", "cluster"
    )


def _kmeans_sql(k: int = 8, iters: int = 5, dims: int = 64) -> str:
    """Unrolled-Lloyd oracle for ``kmeans_assignments``: cent0 = the k
    lowest-vec_id vectors; each iteration argmax-assigns by cosine
    (smaller-label tie-break, the ``_assign_clusters`` contract) then
    re-centers with ``sql_round_fixed(AVG)`` per dimension (the floor
    formula — decimal ROUND vs F.round diverge on .5-boundary doubles,
    ADVICE r6), empty clusters keeping their previous centroid via the
    LEFT JOIN + COALESCE. Rounding at every iteration is what makes the
    replay cross-engine exact — raw float means would drift apart in
    summation order."""
    from s3_access_logs_spark.plans.vector_queries import (
        SQL_COSINE,
        sql_round_fixed,
        sql_well_formed,
    )

    parts = [
        # well-formed vectors only (shared sql_well_formed fragment —
        # the Python twin filters the builder's frame), sliced to dims:
        # NULL- and NaN-cosine ordering is engine-specific (DuckDB
        # ranks NaN FIRST under DESC, Spark's struct sort last), so
        # malformed and non-finite rows are out of contract;
        # over-length rows participate on their leading dims
        # well-formed vectors with NON-NULL ids: the entry is KEYED on
        # vec_id (review r8) — the per-row argmax below is expressed as
        # ROW_NUMBER PARTITION BY vec_id, which would collapse two
        # NULL-id (or duplicate-id) rows into one while Spark assigns
        # every row; like the stratified sampler, identity-less rows
        # are out of contract on both sides (uniqueness stays the
        # schema contract)
        f"""e AS (SELECT vec_id, (embedding::DOUBLE[])[1:{dims}] AS v
           FROM embeddings
           WHERE vec_id IS NOT NULL AND {sql_well_formed(dims)})""",
        f"dims AS (SELECT i::INT AS i FROM range(1, {dims + 1}) t(i))",
        f"""cent0 AS (
      SELECT (ROW_NUMBER() OVER (ORDER BY vec_id) - 1)::INT
               AS label, v AS c
      FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {k}))""",
    ]
    # assignment key = floor(cos*1e6 + 0.5), the _assign_clusters
    # contract (review r6 passes 10/12: summation-order-independent AND
    # bit-identical across engines — decimal ROUND vs DuckDB's binary
    # ROUND diverge on exact .5 boundary doubles)
    for j in range(iters):
        cos = SQL_COSINE.format(a="e.v", b=f"cent{j}.c")
        parts.append(f"""a{j} AS (
      SELECT vec_id, v, cl FROM (
        SELECT e.vec_id, e.v, cent{j}.label AS cl,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY floor(({cos}) * 1e6 + 0.5) DESC,
                                           cent{j}.label) AS rn
        FROM e CROSS JOIN cent{j}) WHERE rn = 1)""")
        parts.append(f"""m{j} AS (
      SELECT cl AS label, i, {sql_round_fixed('AVG(v[i])')} AS mval
      FROM a{j} CROSS JOIN dims GROUP BY cl, i)""")
        parts.append(f"""cent{j + 1} AS (
      SELECT c.label, list(COALESCE(m.mval, c.c[d.i]) ORDER BY d.i) AS c
      FROM cent{j} c CROSS JOIN dims d
      LEFT JOIN m{j} m ON m.label = c.label AND m.i = d.i
      GROUP BY c.label)""")
    cos = SQL_COSINE.format(a="e.v", b=f"cent{iters}.c")
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT vec_id, cl AS cluster FROM (
      SELECT e.vec_id, cent{iters}.label AS cl,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                ORDER BY floor(({cos}) * 1e6 + 0.5) DESC,
                                         cent{iters}.label) AS rn
      FROM e CROSS JOIN cent{iters}) WHERE rn = 1
    """
    )


@query(
    "embedding_pq_topk",
    oracle=None,  # filled below (generated SQL with plane literals)
    tags=("similarity", "llm", "ann", "pq"),
)
def embedding_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC search (operators/similarity.py:889,1013):
    per-subspace hyperplane-bucket codebooks with 6dp-rounded means,
    32x-compressed codes, asymmetric-distance top-5 for 4 query vectors.
    Every stage is deterministic given the LCG plane literals, so the
    oracle replays bucketing -> codebook -> encode -> ADC ranking and
    checks neighbor/rank/adist value-exactly (VERDICT r5 item 2)."""
    from s3_access_logs_spark.operators.similarity import pq_encode, pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    codebook = _cached_codebook(spark, sf_dir)
    encoded = pq_encode(emb, codebook, dims=64, m=8)
    queries = emb.filter(F.col("vec_id") < 4)
    return pq_topk(encoded, queries, codebook, k=5, dims=64, m=8)


# Trained-codebook cache via vector_queries.cached_artifact (review r6):
# the PQ codebook is a build-once artifact shared by the ADC and refine
# entries — both had run the full-corpus bucketing/means training from
# scratch in every catalog pass. Deterministic (6dp-rounded means of
# deterministic buckets), so caching cannot change any result; a
# rewritten corpus retrains via the mtime key.
_PQ_CODEBOOKS: dict[tuple, tuple] = {}


def _cached_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    from s3_access_logs_spark.operators.similarity import train_pq_codebook
    from s3_access_logs_spark.plans.vector_queries import cached_artifact

    return cached_artifact(
        spark,
        sf_dir,
        _PQ_CODEBOOKS,
        lambda emb: train_pq_codebook(emb, dims=64, m=8),
    )


@query(
    "embedding_pq_refine",
    oracle=None,  # filled below (generated SQL with plane literals)
    tags=("similarity", "llm", "ann", "pq", "refine"),
)
def embedding_pq_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF-PQ exact re-rank refine stage as a first-class entry
    (operators/similarity.py:pq_topk refine path, mirroring
    probe_ivfpq_index's): ADC generates top-20 candidates per query,
    which re-rank by exact L2 over the original vectors to top-5 —
    recovering the recall PQ quantization loses while reading only the
    bounded candidate set (the broadcast candidate probe prunes the
    corpus join; at index scale the posting-list variant id-prunes the
    parquet read). The oracle replays the full chain plus the exact
    re-rank; dist is 6dp-rounded before ranking on both engines."""
    from s3_access_logs_spark.operators.similarity import pq_encode, pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    codebook = _cached_codebook(spark, sf_dir)
    encoded = pq_encode(emb, codebook, dims=64, m=8)
    queries = emb.filter(F.col("vec_id") < 4)
    return pq_topk(
        encoded,
        queries,
        codebook,
        k=5,
        dims=64,
        m=8,
        refine_corpus=emb,
        refine_factor=4,
    )


@query(
    "embedding_pq_residual_topk",
    oracle=None,  # filled below (generated SQL with plane literals)
    tags=("similarity", "llm", "ann", "pq", "residual"),
)
def embedding_pq_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual IVF-PQ ADC search (operators/similarity.py:
    pq_residual_topk — the in-memory twin of build_ivfpq_index/
    probe_ivfpq_index with residual=True): codes describe
    v - coarse_centroid(cluster) so the code budget captures the
    within-cell offset instead of re-describing the cell position, and
    each query's LUT is built from its residual against EACH probed
    cell. Every stage is deterministic (6dp label-centroid means, floor
    cosine assignment keys, LCG plane literals, rounded codebook means
    and distance keys), so the oracle replays centroids -> assignment ->
    residual -> bucketing -> codebook -> encode -> per-probe residual
    LUT -> ADC ranking and checks neighbor/rank/adist value-exactly —
    the same pedigree as the raw-PQ entries."""
    from s3_access_logs_spark.operators.similarity import pq_residual_topk
    from s3_access_logs_spark.plans.vector_queries import (
        _cached_centroids,
        well_formed_embeddings,
    )

    emb = well_formed_embeddings(load_table(spark, sf_dir, "embeddings"))
    return pq_residual_topk(
        emb,
        emb.filter(F.col("vec_id") < 4),
        centroids=_cached_centroids(spark, sf_dir),
        k=5,
        nprobe=2,
    )


def _pq_residual_sql(
    dims: int = 64,
    m: int = 8,
    n_planes: int = 4,
    k: int = 5,
    nprobe: int = 2,
) -> str:
    """DuckDB replay of the residual IVF-PQ chain. Value-exactness
    discipline as the raw `_pq_ctes`: plane literals round-trip through
    repr, centroid means / codebook means / encode dsq / LUT dsq /
    adist all go through ``sql_round_fixed`` before any comparison, and
    the assignment keys are the floor-quantized cosines. The corpus
    residual CTE applies the well-formed magnitude bound to the
    RESIDUAL (mirroring pq_encode's NULL-code guard on r_vec — a
    residual component can reach 2x VEC_ABS_MAX from in-contract
    inputs and such rows vanish from the posting side on both
    engines); query residuals carry no such bound, exactly like the
    Spark LUT side."""
    from s3_access_logs_spark.operators.similarity import _lcg_planes
    from s3_access_logs_spark.plans.vector_queries import (
        SQL_COSINE,
        sql_round_fixed,
        sql_well_formed,
    )

    d = dims // m
    rows = []
    for j in range(m):
        for pid, row in enumerate(_lcg_planes(n_planes, d, seed=42 + j)):
            vals = ", ".join(repr(v) for v in row)
            rows.append(f"({j}, {pid}, [{vals}]::DOUBLE[])")
    plane_values = ",\n      ".join(rows)
    rf = sql_round_fixed
    cos_ec = SQL_COSINE.format(a="e.v", b="cent.c")
    cos_qc = SQL_COSINE.format(a="q.qv", b="cent.c")
    return f"""
    WITH p(j, pid, pv) AS (VALUES
      {plane_values}
    ),
    subs AS (SELECT j::INT AS j FROM range(0, {m}) t(j)),
    dims8 AS (SELECT i::INT AS i FROM range(1, {d + 1}) t(i)),
    dimsF AS (SELECT i::INT AS i FROM range(1, {dims + 1}) t(i)),
    e AS (SELECT vec_id, label, (embedding::DOUBLE[])[1:{dims}] AS v
          FROM embeddings WHERE {sql_well_formed(dims)}),
    cm AS (SELECT label, i, {rf('AVG(v[i])')} AS mval
           FROM e CROSS JOIN dimsF dd(i)
           WHERE label IS NOT NULL GROUP BY label, i),
    cent AS (SELECT label, list(mval ORDER BY i) AS c FROM cm GROUP BY label),
    ca AS (
      SELECT vec_id, v, cl FROM (
        SELECT e.vec_id, e.v, cent.label AS cl,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY floor(({cos_ec}) * 1e6 + 0.5) DESC,
                          cent.label) AS rn
        FROM e CROSS JOIN cent
      ) WHERE rn = 1
    ),
    -- corpus residuals, bounded like pq_encode's r_vec guard
    res AS (SELECT * FROM (
              SELECT ca.vec_id, ca.cl,
                     list(ca.v[dd.i] - cent.c[dd.i] ORDER BY dd.i) AS rv
              FROM ca JOIN cent ON ca.cl = cent.label
              CROSS JOIN dimsF dd
              GROUP BY ca.vec_id, ca.cl
            ) WHERE {sql_well_formed(dims, col='rv')}),
    sub AS (SELECT vec_id, cl, s.j,
                   rv[(s.j * {d} + 1)::INT:(s.j * {d} + {d})::INT] AS sv
            FROM res CROSS JOIN subs s),
    b AS (SELECT vec_id, cl, j, sv,
                 SUM(CASE WHEN list_dot_product(sv, pv) >= 0
                     THEN (1 << pid) ELSE 0 END)::BIGINT AS bucket
          FROM sub JOIN p USING (j) GROUP BY vec_id, cl, j, sv),
    cbm AS (SELECT j, bucket, i, {rf('AVG(sv[i])')} AS mval
            FROM b CROSS JOIN dims8 GROUP BY j, bucket, i),
    cb AS (SELECT j, bucket, list(mval ORDER BY i) AS c
           FROM cbm GROUP BY j, bucket),
    codes AS (SELECT j, bucket,
                     (ROW_NUMBER() OVER (PARTITION BY j ORDER BY bucket)
                      - 1)::INT AS code,
                     c
              FROM cb),
    dist AS (SELECT b.vec_id, b.j, codes.code,
                    {rf(
                        'SUM((b.sv[dd.i] - codes.c[dd.i])'
                        ' * (b.sv[dd.i] - codes.c[dd.i]))'
                    )} AS dsq
             FROM b JOIN codes USING (j) CROSS JOIN dims8 dd
             GROUP BY b.vec_id, b.j, codes.code),
    enc AS (SELECT vec_id, j, code FROM (
              SELECT vec_id, j, code,
                     ROW_NUMBER() OVER (PARTITION BY vec_id, j
                                        ORDER BY dsq, code) AS rn
              FROM dist) WHERE rn = 1),
    encc AS (SELECT enc.vec_id, res.cl, enc.j, enc.code
             FROM enc JOIN res ON enc.vec_id = res.vec_id),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 4),
    probes AS (
      SELECT query_id, qv, cl FROM (
        SELECT q.query_id, q.qv, cent.label AS cl,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY floor(({cos_qc}) * 1e6 + 0.5) DESC,
                          cent.label) AS rn
        FROM q CROSS JOIN cent
      ) WHERE rn <= {nprobe}
    ),
    qres AS (SELECT pr.query_id, pr.cl,
                    list(pr.qv[dd.i] - cent.c[dd.i] ORDER BY dd.i) AS rqv
             FROM probes pr JOIN cent ON pr.cl = cent.label
             CROSS JOIN dimsF dd
             GROUP BY pr.query_id, pr.cl),
    qsub AS (SELECT query_id, cl, s.j,
                    rqv[(s.j * {d} + 1)::INT:(s.j * {d} + {d})::INT] AS qsv
             FROM qres CROSS JOIN subs s),
    qdist AS (SELECT qsub.query_id, qsub.cl, qsub.j, codes.code,
                     {rf(
                         'SUM((qsub.qsv[dd.i] - codes.c[dd.i])'
                         ' * (qsub.qsv[dd.i] - codes.c[dd.i]))'
                     )} AS dsq
              FROM qsub JOIN codes USING (j) CROSS JOIN dims8 dd
              GROUP BY qsub.query_id, qsub.cl, qsub.j, codes.code),
    ad AS (SELECT qd.query_id, n.vec_id AS neighbor_id,
                  {rf('SUM(qd.dsq)')} AS adist_raw
           FROM encc n
           JOIN qdist qd ON qd.cl = n.cl AND qd.j = n.j
                        AND qd.code = n.code
           WHERE qd.query_id <> n.vec_id
           GROUP BY qd.query_id, n.vec_id),
    ranked AS (SELECT query_id, neighbor_id, adist_raw,
                      ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY adist_raw, neighbor_id
                                         ) AS rank
               FROM ad)
    SELECT query_id, neighbor_id, rank, adist_raw AS adist
    FROM ranked WHERE rank <= {k}
    """


def _pq_ctes(dims: int = 64, m: int = 8, n_planes: int = 4) -> str:
    """The ONE copy of the PQ oracle's CTE chain (plane literals →
    bucketing → codebook → encode → ADC ranking, ending at ``ranked``
    with an unfiltered per-query ROW_NUMBER), shared by the ADC top-k
    and exact-refine oracles. Same LCG plane constants (float literals
    round-trip exactly through repr), same sign-bucket formula, dense
    code ids by bucket order, argmin encode with the smaller-code
    tie-break, ADC distance as the sum of per-subspace LUT entries.
    Both comparison keys — the encode argmin's dsq and the ranking's
    adist — are ``sql_round_fixed`` on BOTH engines before any ORDER BY
    (review r6 + r7): DuckDB's hash-agg SUM has no defined summation
    order, so raw float keys could flip a near-tie that Spark's ordered
    fold resolves the other way — and the floor formula keeps the
    rounding itself bit-identical where decimal ROUND vs F.round
    diverge on .5-boundary doubles (ADVICE r6)."""
    from s3_access_logs_spark.operators.similarity import _lcg_planes
    from s3_access_logs_spark.plans.vector_queries import (
        sql_round_fixed,
        sql_well_formed,
    )

    d = dims // m
    rows = []
    for j in range(m):
        for pid, row in enumerate(_lcg_planes(n_planes, d, seed=42 + j)):
            vals = ", ".join(repr(v) for v in row)
            rows.append(f"({j}, {pid}, [{vals}]::DOUBLE[])")
    plane_values = ",\n      ".join(rows)
    return f"""
    WITH p(j, pid, pv) AS (VALUES
      {plane_values}
    ),
    subs AS (SELECT j::INT AS j FROM range(0, {m}) t(j)),
    dims8 AS (SELECT i::INT AS i FROM range(1, {d + 1}) t(i)),
    -- malformed vectors excluded exactly like well_formed_vector /
    -- pq_encode's NULL-code marking (review r6; shared sql_well_formed
    -- fragment): without the filter the two engines diverge the moment
    -- the corpus holds a NULL/short row (interior NULL crashes
    -- list_dot_product outright) or a non-finite component (all-inf
    -- dsq never fires Spark's strict-less argmin while ROW_NUMBER here
    -- always assigns a code)
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
          WHERE {sql_well_formed(dims)}),
    sub AS (SELECT vec_id, s.j,
                   v[(s.j * {d} + 1)::INT:(s.j * {d} + {d})::INT] AS sv
            FROM e CROSS JOIN subs s),
    b AS (SELECT vec_id, j, sv,
                 SUM(CASE WHEN list_dot_product(sv, pv) >= 0
                     THEN (1 << pid) ELSE 0 END)::BIGINT AS bucket
          FROM sub JOIN p USING (j) GROUP BY vec_id, j, sv),
    cbm AS (SELECT j, bucket, i, {sql_round_fixed('AVG(sv[i])')} AS mval
            FROM b CROSS JOIN dims8 GROUP BY j, bucket, i),
    cb AS (SELECT j, bucket, list(mval ORDER BY i) AS c
           FROM cbm GROUP BY j, bucket),
    codes AS (SELECT j, bucket,
                     (ROW_NUMBER() OVER (PARTITION BY j ORDER BY bucket)
                      - 1)::INT AS code,
                     c
              FROM cb),
    dist AS (SELECT b.vec_id, b.j, codes.code,
                    {sql_round_fixed(
                        'SUM((b.sv[d.i] - codes.c[d.i])'
                        ' * (b.sv[d.i] - codes.c[d.i]))'
                    )} AS dsq
             FROM b JOIN codes USING (j) CROSS JOIN dims8 d
             GROUP BY b.vec_id, b.j, codes.code),
    enc AS (SELECT vec_id, j, code FROM (
              SELECT vec_id, j, code,
                     ROW_NUMBER() OVER (PARTITION BY vec_id, j
                                        ORDER BY dsq, code) AS rn
              FROM dist) WHERE rn = 1),
    qdist AS (SELECT vec_id AS query_id, j, code, dsq
              FROM dist WHERE vec_id < 4),
    ad AS (SELECT qd.query_id, n.vec_id AS neighbor_id,
                  {sql_round_fixed('SUM(qd.dsq)')} AS adist_raw
           FROM enc n JOIN qdist qd ON qd.j = n.j AND qd.code = n.code
           WHERE qd.query_id <> n.vec_id
           GROUP BY qd.query_id, n.vec_id),
    ranked AS (SELECT query_id, neighbor_id, adist_raw,
                      ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY adist_raw, neighbor_id
                                         ) AS rank
               FROM ad)"""


def _pq_topk_sql(
    dims: int = 64, m: int = 8, n_planes: int = 4, k: int = 5
) -> str:
    """ADC-only final select over the shared PQ CTE chain."""
    return f"""{_pq_ctes(dims, m, n_planes)}
    SELECT query_id, neighbor_id, rank, adist_raw AS adist
    FROM ranked WHERE rank <= {k}
    """


def _pq_refine_sql(
    dims: int = 64,
    m: int = 8,
    n_planes: int = 4,
    k: int = 5,
    refine_factor: int = 4,
) -> str:
    """Exact-re-rank final stage over the shared PQ CTE chain: the top
    k*refine_factor ADC candidates re-rank by exact L2 over the original
    vectors — dist ``sql_round_fixed`` before the ORDER BY, exactly
    like the Spark side's ranking key."""
    from s3_access_logs_spark.plans.vector_queries import sql_round_fixed

    return f"""{_pq_ctes(dims, m, n_planes)},
    cand AS (SELECT query_id, neighbor_id FROM ranked
             WHERE rank <= {k * refine_factor}),
    dimsF AS (SELECT i::INT AS i FROM range(1, {dims + 1}) t(i)),
    ex AS (SELECT c.query_id, c.neighbor_id,
                  {sql_round_fixed(
                      'sqrt(SUM((q.v[d.i] - n.v[d.i])'
                      ' * (q.v[d.i] - n.v[d.i])))'
                  )} AS dist
           FROM cand c
           JOIN e q ON q.vec_id = c.query_id
           JOIN e n ON n.vec_id = c.neighbor_id
           CROSS JOIN dimsF d
           GROUP BY c.query_id, c.neighbor_id),
    r2 AS (SELECT query_id, neighbor_id, dist,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY dist, neighbor_id) AS rank
           FROM ex)
    SELECT query_id, neighbor_id, rank, dist FROM r2 WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# Audio / video perceptual fingerprints (closed-form oracle: the synthesized
# WAV body is the ASCII document text as little-endian int16 PCM, the MVID
# frames are the (i*31+j*7)%256 pattern — both recomputable in SQL)

def _audio_fp_sql() -> str:
    byte = lambda idx: f"ord(text[({idx})::INT])"
    raw = f"({byte('2*j+1')} + 256 * {byte('2*j+2')})"
    smp = f"CASE WHEN {raw} >= 32768 THEN {raw} - 65536 ELSE {raw} END"
    edge = (
        f"CASE WHEN i = 65 THEN n ELSE {_rhe('i * (n / 65.0)')} END"
    )
    win = (
        "CASE WHEN ed[wi+2] > ed[wi+1] THEN "
        "list_sum(list_transform(smp[(ed[wi+1]+1)::INT:(ed[wi+2])::INT], "
        "x -> x * x))::DOUBLE / (ed[wi+2] - ed[wi+1]) ELSE 0.0 END"
    )
    bit = "CASE WHEN en[i+2] > en[i+1] THEN 1::BIGINT ELSE 0::BIGINT END"
    return f"""
    WITH aud AS (
      -- synthesis domain (SQL_ASSET_DOCS, dirty-docs sweep r8)
      SELECT doc_id, text, (length(text) // 2)::BIGINT AS n FROM documents
      WHERE {SQL_ASSET_DOCS}
            AND doc_id % 3 = 1 AND length(text) // 2 >= 65
    ),
    s AS (SELECT doc_id, n,
                 list_transform(range(0, n), j -> {smp}) AS smp
          FROM aud),
    ed AS (SELECT doc_id, smp,
                  list_transform(range(0, 66), i -> {edge}) AS ed
           FROM s),
    en AS (SELECT doc_id,
                  list_transform(range(0, 65), wi -> {win}) AS en
           FROM ed),
    fp AS (SELECT doc_id AS id,
                  list_sum(list_transform(range(0, 32),
                    i -> ({bit}) << (i % 32)::INT))::BIGINT AS w0,
                  list_sum(list_transform(range(32, 64),
                    i -> ({bit}) << ((i - 32) % 32)::INT))::BIGINT AS w1
           FROM en)
    SELECT id, w0, w1 FROM fp
    """


@query(
    "audio_fingerprints",
    oracle=None,  # filled below
    tags=("multimodal", "llm", "dedup", "perceptual", "audio"),
)
def audio_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit audio energy-envelope fingerprints of real WAV containers
    (operators/multimodal.py:595): Spark walks the RIFF chunks, extracts
    int16 PCM, frames 65 energy windows and packs rise bits; the oracle
    recomputes every bit from the ASCII text the synthesized WAV wraps —
    chunk walk, sample decode, numpy-parity window edges and packing all
    value-checked. Sub-65-sample payloads drop (both sides)."""
    from s3_access_logs_spark.operators import multimodal as MM

    docs = load_table(spark, sf_dir, "documents").filter(SQL_ASSET_DOCS)
    assets = MM.synthesize_assets(docs).filter(F.col("modality") == "audio")
    return MM.audio_fingerprint(assets)


def _video_fp_sql() -> str:
    fsum = (
        "list_sum(list_transform(range(0, 16), "
        "j -> (i * 31 + j * 7) % 256))::BIGINT"
    )
    idx = (
        f"CASE WHEN i = 64 THEN nf - 1 "
        f"ELSE {_rhe('i * ((nf - 1) / 64.0)')} END"
    )
    bit = (
        "CASE WHEN sums[(ix[i+2]+1)::INT] > sums[(ix[i+1]+1)::INT] "
        "THEN 1::BIGINT ELSE 0::BIGINT END"
    )
    return f"""
    WITH vid AS (
      -- synthesis domain (SQL_ASSET_DOCS, dirty-docs sweep r8)
      SELECT doc_id, (1 + doc_id % 120)::BIGINT AS nf FROM documents
      WHERE {SQL_ASSET_DOCS}
            AND doc_id % 3 = 2 AND 1 + doc_id % 120 >= 2
    ),
    m AS (SELECT doc_id, nf,
                 list_transform(range(0, nf), i -> {fsum}) AS sums
          FROM vid),
    ix AS (SELECT doc_id, sums,
                  list_transform(range(0, 65), i -> {idx}) AS ix
           FROM m),
    fp AS (SELECT doc_id AS id,
                  list_sum(list_transform(range(0, 32),
                    i -> ({bit}) << (i % 32)::INT))::BIGINT AS w0,
                  list_sum(list_transform(range(32, 64),
                    i -> ({bit}) << ((i - 32) % 32)::INT))::BIGINT AS w1
           FROM ix)
    SELECT id, w0, w1 FROM fp
    """


@query(
    "video_fingerprints",
    oracle=None,  # filled below
    tags=("multimodal", "llm", "dedup", "perceptual", "video"),
)
def video_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit video temporal-envelope fingerprints of real MVID
    containers (operators/multimodal.py:649): per-frame mean brightness
    resampled to 65 points, rise bits packed into the shared word
    layout. The oracle recomputes every bit from the closed-form frame
    pattern; single-frame payloads drop (no temporal structure), both
    sides. Frame-mean comparisons are integer-sum comparisons, so the
    check is exact."""
    from s3_access_logs_spark.operators import multimodal as MM

    docs = load_table(spark, sf_dir, "documents").filter(SQL_ASSET_DOCS)
    assets = MM.synthesize_assets(docs).filter(F.col("modality") == "video")
    return MM.video_fingerprint(assets)


_Q["audio_fingerprints"] = _dc.replace(
    _Q["audio_fingerprints"], oracle=_audio_fp_sql()
)
_Q["video_fingerprints"] = _dc.replace(
    _Q["video_fingerprints"], oracle=_video_fp_sql()
)


# ---------------------------------------------------------------------------
# Span excision (completes the winnowing family: detect + excise)

@query(
    "cut_duplicate_spans",
    oracle=None,  # filled below (reuses the duplicate_spans SQL as a CTE)
    tags=("dedup", "llm", "winnowing", "spans"),
)
def cut_duplicate_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the detected verbatim spans (operators/dedup.py:1226):
    excise each span from the HIGHER-id document of its pair (the lower
    id keeps the canonical copy — Lee et al.'s remove-all-but-one),
    merging overlapping cut intervals and rebuilding against ORIGINAL
    offsets. Same synthesized input as ``duplicate_spans``; the oracle
    re-derives the spans, merges intervals gaps-and-islands style and
    stitches the surviving text, so the interval-merge fold and the
    rebuild concatenation are value-checked character-for-character."""
    from s3_access_logs_spark.functions.text import words  # noqa: F401

    docs = load_table(spark, sf_dir, "documents")
    copies = _offset_copies(
        docs,
        docs.filter(F.col("doc_id") % 5 == 0).select(
            "doc_id",
            F.concat(
                F.lit("prefix-"), F.col("doc_id").cast("string"),
                F.lit("> "), F.substring("text", 10, 120), F.lit(" <copied"),
            ).alias("text"),
        ),
    )
    inp = docs.select("doc_id", "text").unionByName(copies)
    spans = D.duplicate_spans(inp, portable_hash=True)
    return D.cut_duplicate_spans(inp, spans).select(
        "doc_id", F.col("text").alias("cleaned")
    )


def _cut_spans_sql() -> str:
    return f"""
    WITH inp AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {_SQL_COPY_OFF} AS doc_id,
             'prefix-' || doc_id || '> ' || substr(text, 10, 120)
                       || ' <copied' AS text
      FROM documents WHERE doc_id % 5 = 0
    ),
    sp AS ({_duplicate_spans_sql()}),
    iv AS (SELECT id_b AS cid, start_b AS s, start_b + span_len AS e FROM sp),
    o AS (SELECT cid, s, e,
                 MAX(e) OVER (PARTITION BY cid ORDER BY s, e
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS pmax
          FROM iv),
    isl AS (SELECT *, SUM(CASE WHEN pmax IS NULL OR s > pmax
                               THEN 1 ELSE 0 END)
                      OVER (PARTITION BY cid ORDER BY s, e) AS g
            FROM o),
    mi AS (SELECT cid, g, MIN(s) AS s, MAX(e) AS e
           FROM isl GROUP BY cid, g),
    seg AS (SELECT cid, s, e,
                   LAG(e, 1, 0) OVER (PARTITION BY cid ORDER BY s)
                     AS prev_e
            FROM mi),
    reb AS (
      SELECT seg.cid,
             string_agg(substr(t.text, (seg.prev_e + 1)::INT,
                               (seg.s - seg.prev_e)::INT),
                        '' ORDER BY seg.s) AS head,
             MAX(seg.e) AS last_e
      FROM seg JOIN inp t ON t.doc_id = seg.cid
      GROUP BY seg.cid
    )
    SELECT i.doc_id,
           CASE WHEN r.cid IS NULL THEN i.text
                ELSE r.head || substr(i.text, (r.last_e + 1)::INT,
                                      greatest(length(i.text) - r.last_e,
                                               0)::INT)
           END AS cleaned
    FROM inp i LEFT JOIN reb r ON i.doc_id = r.cid
    """


_Q["cut_duplicate_spans"] = _dc.replace(
    _Q["cut_duplicate_spans"], oracle=_cut_spans_sql()
)


_Q["kmeans_assignments"] = _dc.replace(
    _Q["kmeans_assignments"], oracle=_kmeans_sql()
)
_Q["embedding_pq_refine"] = _dc.replace(
    _Q["embedding_pq_refine"], oracle=_pq_refine_sql()
)
_Q["embedding_pq_topk"] = _dc.replace(
    _Q["embedding_pq_topk"], oracle=_pq_topk_sql()
)
_Q["embedding_pq_residual_topk"] = _dc.replace(
    _Q["embedding_pq_residual_topk"], oracle=_pq_residual_sql()
)


# ---------------------------------------------------------------------------
# Store-mode pre-flight (round 12, VERDICT r11 item 5)

def _store_preflight_sql() -> str:
    from s3_access_logs_spark.functions import bpe as B
    from s3_access_logs_spark.plans.text_queries import (
        SQL_MD5_LONG,
        _fit_merges,
    )

    ms = _fit_merges()
    vocab = B.bpe_vocab(ms)
    eos = len(vocab)
    vlit = "[" + ", ".join(B._sql_quote(t) for t in vocab) + "]"
    W = _EXPORT_WINDOW
    shard = (
        SQL_MD5_LONG.format(x="'shards:' || doc_id::VARCHAR")
        + f" % {_EXPORT_SHARDS}"
    )
    return f"""
    WITH f AS (
      SELECT doc_id, source, text,
             (text IS NULL OR trim(text) = '') AS f_empty
      FROM documents
    ),
    e AS (
      SELECT *,
             (ROW_NUMBER() OVER (
                PARTITION BY md5(trim(regexp_replace(lower(text),
                                                     '\\s+', ' ', 'g')))
                ORDER BY f_empty::INT, doc_id)
              > 1) AND NOT f_empty AS f_exact
      FROM f
    ),
    kept AS (
      SELECT doc_id, source, text FROM e
      WHERE NOT f_empty AND NOT f_exact
    ),
    ids AS (
      SELECT doc_id, source,
             list_append(
               COALESCE(
                 list_transform(
                   {B.bpe_tokens_sql("text", ms)},
                   tk -> COALESCE(list_position({vlit}, tk) - 1, -1)
                 ), []),
               {eos}) AS ids,
             ({shard}) AS shard
      FROM kept
    ),
    fit AS (
      -- EOS markers are COUNTED, not assumed one-per-stream, matching
      -- the engine (ADVICE r12); this store appends exactly one, so
      -- the two forms agree here
      SELECT source, COUNT(*)::BIGINT AS n_docs,
             (SUM(len(ids))
              - SUM(len(list_filter(ids, x -> x = {eos}))))::BIGINT
               AS total_ids,
             SUM(len(list_filter(ids, x -> x = -1)))::BIGINT AS unk_ids
      FROM ids GROUP BY source
    ),
    per_shard AS (
      -- nd counts EOS BOUNDARIES (exactly one per row in this store,
      -- so value-identical to COUNT(*) here) — the engine's counted
      -- form (review r13)
      SELECT shard, SUM(len(ids)) AS stream_len,
             SUM(len(list_filter(ids, x -> x = {eos}))) AS nd
      FROM ids GROUP BY shard
    ),
    layout AS (
      SELECT SUM((stream_len + {W - 1}) // {W})::BIGINT AS n_windows,
             SUM(stream_len) AS stream_total,
             SUM(nd) AS nd_total
      FROM per_shard
    )
    SELECT f.source, f.n_docs, f.total_ids, f.unk_ids,
           ROUND(f.unk_ids / NULLIF(f.total_ids, 0), 6) AS unk_rate,
           (COALESCE(ROUND(f.unk_ids / NULLIF(f.total_ids, 0), 6), 0.0)
              > 0.25) AS unk_flag,
           l.n_windows,
           (l.n_windows * {W} - l.stream_total)::BIGINT AS pad_ids,
           ROUND((l.n_windows * {W} - l.stream_total)
                 / NULLIF(l.n_windows * {W}, 0), 6) AS pad_rate,
           ROUND(l.nd_total / NULLIF(l.n_windows, 0)::DOUBLE, 6)
             AS docs_per_window
    FROM fit f CROSS JOIN layout l
    """


@query(
    "store_preflight_report",
    oracle=None,  # filled below (default-curate + tokenize + shard replay)
    tags=("llm", "pipeline", "tokenize", "packing", "report", "store"),
)
def store_preflight_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STORE-MODE pre-flight (round 12, VERDICT r11 item 5): build
    the token store once (``write_token_store`` — default curate, the
    40-merge ``_fit_merges`` table so the unk arithmetic is
    value-checked at a non-trivial point, the r11 lesson), then derive
    unk/fill statistics from the STORED ids alone
    (``operators/export.store_preflight_report``) — no re-tokenizing,
    the scan is ~4 bytes/token of parquet. Per-source fit columns join
    a GLOBAL layout half (the artifact packs per shard; both halves
    come from ONE store and ONE tokenizer, which is what closes the
    corpus-mode demo's two-tokenizer fixture caveat — ADVICE r11). The
    oracle replays the whole composition from ``documents``: default
    waterfall verdicts, exact 40-merge BPE ids, shard hash, per-shard
    ceil-window arithmetic."""
    import shutil
    import tempfile

    from s3_access_logs_spark.operators.export import (
        store_preflight_report,
        write_token_store,
    )
    from s3_access_logs_spark.plans.text_queries import _fit_merges

    docs = load_table(spark, sf_dir, "documents")
    td = tempfile.mkdtemp(prefix="store_preflight_")
    try:
        write_token_store(
            docs, f"{td}/store", n_shards=_EXPORT_SHARDS,
            merges=_fit_merges(),
        )
        out = store_preflight_report(
            spark, f"{td}/store", window_ids=_EXPORT_WINDOW
        )
        # materialize before the store dir vanishes
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(td, ignore_errors=True)


_Q["store_preflight_report"] = _dc.replace(
    _Q["store_preflight_report"], oracle=_store_preflight_sql()
)
