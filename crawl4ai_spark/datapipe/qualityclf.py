"""Model-based document quality scoring — the FineWeb-Edu / DCLM-style
classifier tier restated on Spark MLlib (the reference pipelines train a
fastText / linear classifier on labeled seed data and score the whole
corpus; fastText itself is out of sandbox, so the honest stand-in is the
same model CLASS — a linear bag-of-words classifier — trained and scored
with public Spark primitives).

Shape at 100 TB:

- featurize: tokens (textstats.tokens_col — the same tokenizer every
  other text operator uses) → hashing trick term frequencies
  (HashingTF, fixed 2^18 dims, no vocabulary state to ship) → optional
  IDF (one corpus aggregate, produces a broadcastable vector).
- train: MLlib LogisticRegression (distributed L-BFGS — each iteration
  is one treeAggregate over the corpus; the model is a single dense
  vector). Training normally runs on a SMALL labeled seed set
  (FineWeb-Edu: ~500k LLM-annotated docs), not the corpus.
- score: model.transform is a per-row projection against the
  broadcast coefficient vector — shuffle-free, embarrassingly parallel,
  exactly the plan shape you want for the 100 TB scoring pass.

Determinism: HashingTF is stateless-deterministic; LogisticRegression
from a fixed dataset converges to the convex optimum, so scores are
reproducible to optimizer tolerance (tests assert separation and
stability bounds, not bit-equality — this tier is honest about being a
trained model, unlike the closed-form operators with DuckDB oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawl4ai_spark.datapipe.textstats import tokens_col

N_FEATURES = 1 << 18


def _tf_frame(df: DataFrame, text_col: str) -> DataFrame:
    """Add ``_tf``: hashed term-frequency vector of the lower-cased
    whitespace tokens (stateless — nothing to fit or ship)."""
    from pyspark.ml.feature import HashingTF

    toks = df.withColumn("_toks", tokens_col(F.col(text_col)))
    return HashingTF(
        inputCol="_toks", outputCol="_tf", numFeatures=N_FEATURES
    ).transform(toks).drop("_toks")


def _features(tf: DataFrame, idf_model) -> DataFrame:
    """``_tf`` → ``features``, through the fitted IDF when present."""
    if idf_model is not None:
        return idf_model.transform(tf).drop("_tf")
    return tf.withColumnRenamed("_tf", "features")


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    use_idf: bool = True,
    reg_param: float = 1e-4,
    max_iter: int = 50,
):
    """Fit the linear quality classifier on a labeled seed frame
    (label 1 = keep-quality, 0 = reject). Returns (idf_model | None,
    lr_model) — both are small broadcastable objects (one vector of at
    most 2^18 doubles each). The seed set is the only data this ever
    iterates over; corpus-sized input belongs in ``score_quality``."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import IDF

    tf = _tf_frame(labeled, text_col)
    idf_model = (
        IDF(inputCol="_tf", outputCol="features").fit(tf) if use_idf else None
    )
    feats = _features(tf, idf_model)
    lr = LogisticRegression(
        featuresCol="features",
        labelCol=label_col,
        regParam=reg_param,
        maxIter=max_iter,
        standardization=False,
    )
    return idf_model, lr.fit(feats)


def score_quality(
    df: DataFrame,
    idf_model,
    lr_model,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_threshold: float | None = None,
) -> DataFrame:
    """Score every document: (id, quality_prob[, quality_keep]).
    quality_prob is P(label=1). One per-row projection against the
    broadcast model — the plan has no exchange, so the 100 TB scoring
    pass is a single scan."""
    from pyspark.ml.functions import vector_to_array

    feats = _features(_tf_frame(df.select(id_col, text_col), text_col),
                      idf_model)
    scored = lr_model.transform(feats)
    out = scored.select(
        id_col,
        F.round(
            F.element_at(vector_to_array("probability"), 2), 6
        ).alias("quality_prob"),
    )
    if keep_threshold is not None:
        out = out.withColumn(
            "quality_keep", F.col("quality_prob") >= keep_threshold
        )
    return out
