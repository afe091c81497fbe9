"""Learned quality filtering — the fastText-classifier stage of a
training-data pipeline (positives = known-good text, negatives =
rejected/degenerate text) on Spark MLlib primitives.

Heuristic scores (functions.text.quality_score) and LM perplexity
(functions.lm) are fixed rules; real pipelines add a LEARNED filter:
label a seed set, train a linear classifier over hashed token features,
score the corpus, keep above threshold. MLlib's HashingTF +
LogisticRegression is exactly that shape and is already
executor-parallel: featurization is a narrow map over the token arrays,
training is L-BFGS over treeAggregated gradients (driver holds only the
coefficient vector — ``num_features`` floats), and scoring is one
narrow pass, no shuffle at any corpus size.

Determinism note: coefficient values depend on float summation order
across partitions, so tests assert separation quality (held-out
accuracy), never exact coefficients — the honest contract for iterative
numeric training, unlike the bit-exact contracts of the sketch family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from s3_access_logs_spark.functions.text import words

DEFAULT_NUM_FEATURES = 1 << 18


def train_quality_classifier(
    positives: DataFrame,
    negatives: DataFrame,
    text_col: str = "text",
    num_features: int = DEFAULT_NUM_FEATURES,
    max_iter: int = 30,
    reg_param: float = 1e-4,
    binary: bool = True,
):
    """Fit a hashed-bag-of-words logistic regression separating
    ``positives`` (label 1) from ``negatives`` (label 0). Returns the
    fitted ``PipelineModel``; persist with ``model.write().save(path)``
    and reload with ``PipelineModel.load`` — the artifact is
    coefficient-sized, never data-sized."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    if num_features < 2:
        raise ValueError(
            f"train_quality_classifier: need num_features >= 2, got "
            f"{num_features}"
        )
    # words(NULL) is NULL and HashingTF NPEs on a null token Seq —
    # coalesce so NULL-text rows featurize as the empty document
    toks = F.coalesce(
        words(text_col), F.array().cast("array<string>")
    )
    labeled = positives.select(
        toks.alias("_tokens"), F.lit(1.0).alias("label")
    ).unionByName(
        negatives.select(toks.alias("_tokens"), F.lit(0.0).alias("label"))
    )
    pipeline = Pipeline(
        stages=[
            HashingTF(
                inputCol="_tokens",
                outputCol="features",
                numFeatures=num_features,
                # binary presence features by default: raw counts let a
                # single repeated token dominate the dot product, which
                # is exactly the degenerate text the filter must reject
                binary=binary,
            ),
            LogisticRegression(
                maxIter=max_iter,
                regParam=reg_param,
                standardization=False,
            ),
        ]
    )
    return pipeline.fit(labeled)


def score_quality(
    docs: DataFrame,
    model,
    text_col: str = "text",
    result_col: str = "quality_prob",
) -> DataFrame:
    """Attach P(good) under a trained classifier to every row — one
    narrow pass (tokenize -> hash -> dot product), the corpus never
    shuffles. All original columns pass through."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(
        docs.withColumn(
            "_tokens",
            # NULL text scores as the empty document instead of NPE-ing
            # the whole job inside HashingTF
            F.coalesce(words(text_col), F.array().cast("array<string>")),
        )
    )
    return scored.withColumn(
        result_col,
        F.element_at(vector_to_array("probability"), 2),
    ).drop("_tokens", "features", "rawPrediction", "probability", "prediction")
