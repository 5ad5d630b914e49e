"""Adaptive-crawler knowledge-base statistics (SURVEY.md §2.5 A8).

Spark restatement of the reference AdaptiveCrawler's state aggregations
(behavioral spec: /root/reference/crawl4ai/adaptive_crawler.py —
update_state term/document frequencies :526-575, coverage :306-345,
saturation :375-390, tokenizer :576-585): plain groupBy aggregations over
the knowledge-base text column, no driver-side loops.

Note: the reference tokenizes with Python's unicode ``\\w``; Spark and the
DuckDB oracle both use ASCII word chars — the documented divergence for
non-ASCII word characters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def adaptive_tokens_col(text: Column | str) -> Column:
    """Punctuation → space, lower, split, keep tokens of length > 2."""
    c = F.col(text) if isinstance(text, str) else text
    cleaned = F.regexp_replace(F.lower(c), r"[^\w\s]", " ")
    return F.filter(F.split(cleaned, r"\s+"), lambda t: F.length(t) > 2)


def kb_term_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(term, tf, df) over the knowledge base: tf = total occurrences,
    df = number of documents containing the term. One explode + one
    groupBy — shuffle key is the term (uniform), map-side combine applies."""
    terms = df.select(
        F.col(id_col), F.explode(adaptive_tokens_col(text_col)).alias("term")
    )
    return terms.groupBy("term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct(id_col).alias("df"),
    )


def coverage_per_term(
    stats: DataFrame, query_terms: list[str], n_docs: int
) -> DataFrame:
    """Per-query-term coverage components (coverage spec :306-345):
    term_score = (df/N) · (1 + 0.5·ln(1+tf)/ln(1+max_tf)) for df>0 else 0.
    Returns (term, tf, df, term_score)."""
    spark = stats.sparkSession
    q = spark.createDataFrame([(t,) for t in query_terms], "term string")
    max_tf = stats.agg(F.max("tf")).first()[0] or 1
    joined = q.join(stats, "term", "left").fillna({"tf": 0, "df": 0})
    freq_signal = F.log(F.lit(1.0) + F.col("tf")) / F.log(F.lit(1.0) + F.lit(max_tf))
    score = (F.col("df") / F.lit(float(n_docs))) * (F.lit(1.0) + F.lit(0.5) * freq_signal)
    return joined.select(
        "term",
        F.col("tf").cast("long").alias("tf"),
        F.col("df").cast("long").alias("df"),
        F.when(F.col("df") > 0, score).otherwise(F.lit(0.0)).alias("term_score"),
    )


def coverage_score(per_term: DataFrame) -> float:
    """min(1, sqrt(mean(term_score))) — the crawler's stop signal."""
    avg = per_term.agg(F.avg("term_score")).first()[0] or 0.0
    return float(min(1.0, avg ** 0.5))


def saturation_score(
    new_terms_history: list[int], pages_history: list[int] | None = None
) -> float:
    """1 − recent_rate/initial_rate over the per-iteration new-term counts
    (spec :375-390); <2 entries → 0.

    ``pages_history``: pages fetched per iteration. The reference appends
    one history entry per crawled DOCUMENT; the Spark loop appends one per
    BATCH iteration, so without normalization the decay signal scales with
    batch size. When given, counts are normalized to new-terms-per-page
    (zero entries floor at 1 term/batch, the count-space floor the
    reference uses) — a documented Spark-shape adaptation that makes the
    signal batch-size-invariant."""
    if len(new_terms_history) < 2:
        return 0.0
    if pages_history:
        recent_pages = max(1, pages_history[-1])
        initial_pages = max(1, pages_history[0])
        recent = max(new_terms_history[-1], 1) / recent_pages
        initial = max(new_terms_history[0], 1) / initial_pages
    else:
        recent = new_terms_history[-1] if new_terms_history[-1] > 0 else 1
        initial = new_terms_history[0] if new_terms_history[0] > 0 else 1
    return max(0.0, min(1.0 - recent / initial, 1.0))
