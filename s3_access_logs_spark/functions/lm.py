"""N-gram language-model quality scoring — the CCNet-style "perplexity
against a clean reference corpus" filter as pure DataFrame ops.

The strongest cheap quality signal for web text is how surprising it
looks to a small LM trained on known-good text: boilerplate, lorem
ipsum, keyword stuffing and mojibake all score high cross-entropy. The
classic pipeline trains a 5-gram KenLM; this module keeps the idea and
re-expresses it Spark-first at bigram order with Jelinek-Mercer
interpolation — enough to separate natural from degenerate text, and
every step is a broadcast equi-join or a hash aggregation, no UDFs.

Model = one small DataFrame (kind, w1, w2, cnt):
  kind 'u'  unigram counts   (w2 = NULL)
  kind 'b'  bigram counts
  kind 'm'  meta             (w1 = 'total' | 'vocab', cnt = value)
Capped at ``max_entries`` per kind via TakeOrderedAndProject, so the
model stays broadcast-sized no matter the training corpus; training is
two hash aggregations over the token stream — the corpus shuffles only
as (token) / (token, next-token) pairs with map-side partial counts.

Scoring: p(w2 | w1) = lambda * cnt(w1 w2)/cnt(w1)
                    + (1-lambda) * (cnt(w2)+1)/(total+vocab)
Per document: cross-entropy = -mean(log p) over its bigrams; perplexity
= exp(cross-entropy). Dropped-from-cap and OOV words degrade smoothly
through the add-one unigram backoff — no NULLs, no special cases in
the score path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from s3_access_logs_spark.functions.text import words

DEFAULT_MAX_ENTRIES = 1 << 16


def train_bigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    max_entries: int = DEFAULT_MAX_ENTRIES,
) -> DataFrame:
    """Count unigrams and bigrams over the token stream of
    ``docs[text_col]`` (lowercased [a-z0-9]+ runs via
    ``functions.text.words``), keeping the ``max_entries`` most
    frequent of each so the model broadcasts. Ties break on the token
    text — same corpus, same model, always."""
    if max_entries < 1:
        raise ValueError(
            f"train_bigram_lm: need max_entries >= 1, got {max_entries}"
        )
    toks = docs.select(words(text_col).alias("_w")).filter(
        F.size("_w") > 0
    )
    uni = (
        toks.select(F.explode("_w").alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("cnt"))
    )
    uni_top = (
        uni.orderBy(F.col("cnt").desc(), "w1")
        .limit(max_entries)
        .select(F.lit("u").alias("kind"), "w1", F.lit(None).cast("string").alias("w2"), "cnt")
    )
    bi = (
        toks.select(
            F.explode(
                F.zip_with(
                    F.slice("_w", 1, F.size("_w") - 1),
                    F.slice("_w", 2, F.size("_w") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("cnt"))
    )
    bi_top = (
        bi.orderBy(F.col("cnt").desc(), "w1", "w2")
        .limit(max_entries)
        .select(F.lit("b").alias("kind"), "w1", "w2", "cnt")
    )
    meta = (
        uni.agg(
            F.sum("cnt").alias("_total"), F.count("*").alias("_vocab")
        )
        .select(
            F.explode(
                F.create_map(
                    F.lit("total"), F.col("_total"),
                    F.lit("vocab"), F.col("_vocab"),
                )
            ).alias("w1", "cnt")
        )
        .select(
            F.lit("m").alias("kind"),
            "w1",
            F.lit(None).cast("string").alias("w2"),
            "cnt",
        )
    )
    return uni_top.unionByName(bi_top).unionByName(meta)


def _meta(model: DataFrame) -> tuple[int, int]:
    rows = {
        r["w1"]: r["cnt"]
        for r in model.filter(F.col("kind") == "m").collect()
    }
    if "total" not in rows or "vocab" not in rows:
        raise ValueError(
            "bigram LM is missing its meta rows — not built by "
            "train_bigram_lm, or the rows were filtered out"
        )
    if rows["total"] is None or not rows["vocab"]:
        # a token-free training corpus stores total=NULL / vocab=0 —
        # fail with a diagnosis, not a NoneType arithmetic TypeError
        raise ValueError(
            "bigram LM was trained on a corpus with no tokens (total "
            f"={rows['total']}, vocab={rows['vocab']}) — it cannot "
            "score anything; train on non-empty text"
        )
    return rows["total"], rows["vocab"]


def perplexity_score(
    docs: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.7,
    result_col: str = "ppl",
) -> DataFrame:
    """Attach per-document perplexity under the model: ``(id_col,
    n_bigrams, xent, result_col)``. Documents with fewer than two tokens
    get NULL (no bigram evidence — let the caller decide, don't invent a
    score). Plan: one narrow explode of (id, bigram), three broadcast
    hash joins against the model slices, ONE hash aggregation back to
    the document grain — no other shuffle at any corpus size."""
    if not (0.0 <= lam < 1.0):
        # lam=1.0 would make every unseen bigram log(0) = NULL, which
        # avg() silently SKIPS — a 99%-garbage document would score as
        # its one in-model bigram. The backoff term must keep mass.
        raise ValueError(
            f"perplexity_score: lam must be in [0, 1), got {lam} — "
            "lam=1.0 removes the backoff and makes OOV bigrams vanish "
            "from the average instead of penalizing it"
        )
    total, vocab = _meta(model)
    uni = model.filter(F.col("kind") == "u").select(
        F.col("w1").alias("_u_w"), F.col("cnt").alias("_u_cnt")
    )
    bi = model.filter(F.col("kind") == "b").select(
        F.col("w1").alias("_b_w1"),
        F.col("w2").alias("_b_w2"),
        F.col("cnt").alias("_b_cnt"),
    )
    toks = docs.select(
        F.col(id_col), words(text_col).alias("_w")
    )
    # explode_outer keeps sub-2-token docs as ONE null-pair row, so the
    # single groupBy below yields every document and a join-back to
    # attach the NULL scores (a full doc-grain shuffle) never happens
    pairs = toks.select(
        id_col,
        F.explode_outer(
            F.when(
                F.size("_w") >= 2,
                F.zip_with(
                    F.slice("_w", 1, F.size("_w") - 1),
                    F.slice("_w", 2, F.size("_w") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                ),
            )
        ).alias("p"),
    ).select(id_col, "p.w1", "p.w2")
    scored = (
        pairs.join(
            broadcast(bi),
            (F.col("w1") == F.col("_b_w1")) & (F.col("w2") == F.col("_b_w2")),
            "left",
        )
        # denominator for the ML bigram term AND the backoff numerator
        # both come from the unigram slice; join twice (w1, then w2) —
        # broadcast hash probes, no exchange either time
        .join(broadcast(uni), F.col("w1") == F.col("_u_w"), "left")
        .withColumnRenamed("_u_cnt", "_u1_cnt")
        .drop("_u_w")
        .join(broadcast(uni), F.col("w2") == F.col("_u_w"), "left")
        .withColumnRenamed("_u_cnt", "_u2_cnt")
        .drop("_u_w")
    )
    ml = F.when(
        F.col("_b_cnt").isNotNull() & F.col("_u1_cnt").isNotNull(),
        F.col("_b_cnt").cast("double") / F.col("_u1_cnt").cast("double"),
    ).otherwise(F.lit(0.0))
    backoff = (
        F.coalesce(F.col("_u2_cnt"), F.lit(0)).cast("double") + 1.0
    ) / F.lit(float(total + vocab))
    # a null-pair row contributes NULL logp; count counts only real
    # bigrams and avg skips NULLs entirely -> NULL xent for short docs
    logp = F.when(
        F.col("w1").isNotNull(),
        F.log(F.lit(lam) * ml + F.lit(1.0 - lam) * backoff),
    )
    return scored.groupBy(id_col).agg(
        F.count("w1").alias("n_bigrams"),
        (-F.avg(logp)).alias("xent"),
        F.exp(-F.avg(logp)).alias(result_col),
    )
