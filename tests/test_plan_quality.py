"""Physical-plan assertions: the plans we ship are the plans we designed.

These guard against silent regressions in join strategy and pushdown —
an operator that stops broadcasting or stops pushing filters down would
still be correct but wrong at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_parquet_pushdown(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(docs.filter("doc_id < 10").select("doc_id"))
    assert "PushedFilters" in plan and "LessThan(doc_id,10)" in plan.replace(" ", "")
    # column pruning: the scan must not read the text column
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" not in read_schema


def test_robots_gate_broadcasts(spark, pages):
    from crawl4ai_spark.operators.robots import apply_robots_gate
    from crawl4ai_spark.sources.synthetic import build_robots
    from crawl4ai_spark.functions.urls import host_col

    fr = pages.select("url", host_col(F.col("url")).alias("host"))
    plan = _plan(apply_robots_gate(fr, build_robots(spark)))
    assert "BroadcastHashJoin" in plan


def test_fetch_join_broadcasts_frontier(spark, pages):
    frontier = pages.select("url").limit(5)
    hits = pages.join(F.broadcast(frontier), on="url")
    plan = _plan(hits)
    assert "BroadcastHashJoin" in plan


def test_ann_sheds_vectors_before_window(spark, sf_dir):
    from crawl4ai_spark.datapipe.similarity import ann_bruteforce_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter("vec_id < 2").select(F.col("vec_id").alias("query_id"), "embedding")
    plan = _plan(ann_bruteforce_topk(e, q, k=3))
    # the exchange feeding the rank window must not carry embedding arrays
    window_part = plan.split("Window")[0] if "Window" in plan else plan
    exchange_sections = [s for s in plan.split("Exchange") if "hashpartitioning(query_id" in s]
    assert exchange_sections, "expected a hash partitioning on query_id"
    assert "_qvec" not in exchange_sections[0].split("+-")[0]


def test_extraction_is_single_python_stage(spark, pages):
    from crawl4ai_spark.plans.extract import extract_pages

    plan = _plan(extract_pages(pages.limit(3)))
    # fused UDF ⇒ exactly one ArrowEvalPython node in the plan
    assert plan.count("ArrowEvalPython") == 1
