"""Model-based quality classifier (datapipe/qualityclf.py): separation,
generalization to held-out docs, scoring-plan shape, and stability."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.datapipe.qualityclf import (
    score_quality,
    train_quality_classifier,
)

_GOOD = "informative article with careful analysis and citations. "
_SPAM = "click here buy now free casino pills winner!!! "


@pytest.fixture(scope="module")
def labeled(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    return docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0, F.concat(F.lit(_GOOD), "text")
        ).otherwise(F.concat(F.lit(_SPAM), "text")).alias("text"),
        (F.col("doc_id") % 2 == 0).cast("double").alias("label"),
    )


@pytest.fixture(scope="module")
def model(labeled):
    return train_quality_classifier(labeled)


def test_separates_salted_classes(labeled, model):
    idf, lr = model
    j = score_quality(labeled, idf, lr).join(
        labeled.select("doc_id", "label"), "doc_id"
    )
    means = {
        r.label: r.m
        for r in j.groupBy("label").agg(F.avg("quality_prob").alias("m")).collect()
    }
    assert means[1.0] > 0.9 and means[0.0] < 0.1


def test_generalizes_to_heldout(spark, labeled):
    train = labeled.filter("doc_id % 4 < 2")
    test = labeled.filter("doc_id % 4 >= 2")
    idf, lr = train_quality_classifier(train)
    j = score_quality(test, idf, lr).join(
        test.select("doc_id", "label"), "doc_id"
    )
    means = {
        r.label: r.m
        for r in j.groupBy("label").agg(F.avg("quality_prob").alias("m")).collect()
    }
    # held-out docs share the salt phrases but not the body text
    assert means[1.0] > means[0.0] + 0.5


def test_scoring_plan_is_exchange_free(spark, sf_dir, model):
    """The corpus scoring pass must be a single scan — an exchange here
    would shuffle the whole 100 TB corpus to apply a broadcastable
    vector."""
    idf, lr = model
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    plan = (
        score_quality(docs, idf, lr)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_keep_threshold_and_no_idf_path(spark, labeled):
    idf, lr = train_quality_classifier(labeled, use_idf=False)
    assert idf is None
    out = score_quality(labeled, idf, lr, keep_threshold=0.5)
    rows = out.join(labeled.select("doc_id", "label"), "doc_id").collect()
    agree = sum(1 for r in rows if r.quality_keep == (r.label == 1.0))
    assert agree / len(rows) > 0.95


def test_refit_is_stable(labeled, model):
    idf1, lr1 = model
    idf2, lr2 = train_quality_classifier(labeled)
    a = {r.doc_id: r.quality_prob
         for r in score_quality(labeled, idf1, lr1).collect()}
    b = {r.doc_id: r.quality_prob
         for r in score_quality(labeled, idf2, lr2).collect()}
    assert max(abs(a[k] - b[k]) for k in a) < 1e-4
