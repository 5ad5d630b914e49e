"""Adaptive crawl-until-confident loop (SURVEY.md §2 A8 / the reference's
AdaptiveCrawler, behavioral spec: /root/reference/crawl4ai/
adaptive_crawler.py — StatisticalStrategy: confidence = 0.4·coverage +
0.3·consistency + 0.3·saturation :~300; should_stop on confidence ≥
threshold / page budget / empty frontier / saturation :~500; KB statistics
update :526-575).

Spark shape: each adaptive step is ONE batch frontier iteration (CrawlRun,
best-first with a query-derived URL scorer standing in for the reference's
link-preview relevance ranking), followed by knowledge-base statistics as
groupBy aggregations over the accumulated results:

- coverage: per-query-term document frequency + log-tf signal
  (datapipe.adaptive_stats — oracle-checked separately);
- consistency: mean pairwise Jaccard of document term sets over a BOUNDED
  sample (the reference computes all pairs over its in-memory KB; at scale
  the pairwise step must be capped — ``consistency_max_docs``);
- saturation: decay of the new-terms-per-iteration rate (driver-side list,
  as the reference keeps it).

No driver-side loops over rows — the driver only sequences iterations and
reads scalar aggregates.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawl4ai_spark.datapipe.adaptive_stats import (
    adaptive_tokens_col,
    coverage_per_term,
    coverage_score,
    kb_term_stats,
    saturation_score,
)
from crawl4ai_spark.operators.scorers import keyword_relevance_score
from crawl4ai_spark.plans.crawl import CrawlConfig, CrawlRun


def _tokenize_query(query: str) -> list[str]:
    """The reference's tokenizer applied to the query (len > 2)."""
    import re

    return [t for t in re.sub(r"[^\w\s]", " ", query.lower()).split() if len(t) > 2]


@dataclass
class AdaptiveConfig:
    confidence_threshold: float = 0.7
    saturation_threshold: float = 0.8
    max_pages: int = 50
    batch_size: int = 10          # pages fetched per adaptive step
    max_depth: int = 5
    consistency_max_docs: int = 50
    crawl: CrawlConfig | None = None  # advanced override of the inner config


class AdaptiveCrawl:
    """Crawl-until-confident driver over a CrawlRun."""

    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        robots: DataFrame | None,
        seeds: DataFrame,
        workdir: str,
        query: str,
        config: AdaptiveConfig | None = None,
    ):
        self.query = query
        self.query_terms = _tokenize_query(query)
        self.config = config or AdaptiveConfig()
        cfg = self.config.crawl or CrawlConfig(
            mode="best_first",
            max_pages=self.config.max_pages,
            max_depth=self.config.max_depth,
            iteration_budget=self.config.batch_size,
            # stand-in for the reference's link-preview relevance ranking:
            # a keyword scorer over the URL (negated — best-first pops the
            # MINIMUM score first, the reference's min-heap quirk)
            scorer=lambda url: -keyword_relevance_score(
                url, self.query_terms, weight=1.0
            ),
        )
        self.run = CrawlRun(spark, pages, robots, seeds, workdir, cfg)
        self.new_terms_history: list[int] = []
        self.pages_history: list[int] = []
        # mutable RUN state lives on the instance (a config reused across
        # two AdaptiveCrawl runs must not interleave their histories)
        self.metrics_history: list[dict] = []
        self._prev_term_count = 0
        # resume: the workdir may already hold a KB (crawl_until_confident
        # is "resumable like the underlying CrawlRun"). Without seeding,
        # the first step() would book the ENTIRE existing KB vocabulary as
        # that step's "new terms", and the next step's small real delta
        # would read as a collapsed discovery rate — a premature
        # 'saturated' stop. One count job, paid only on actual resume.
        kb = self._kb()
        if kb is not None:
            self._prev_term_count = kb_term_stats(kb, "url", "text").count()

    # -- statistics over the accumulated knowledge base ----------------------

    def _kb(self) -> DataFrame | None:
        res = self.run.results()
        if res is None:
            return None
        return res.filter("success").select(
            "url", F.coalesce("raw_markdown", F.lit("")).alias("text")
        )

    def _consistency(self, kb: DataFrame, n_docs: int) -> float:
        """Mean pairwise Jaccard of document term sets (spec :346-373),
        bounded sample; <2 docs → 1.0. ``n_docs`` is the caller's KB row
        count — the sample size is min(n_docs, cap), so no extra count job."""
        cap = self.config.consistency_max_docs
        if min(n_docs, cap) < 2:
            return 1.0
        # deterministic sample: an unordered limit() can pick different rows
        # per run, which would make the confidence signal itself flaky
        docs = kb.orderBy("url").limit(cap).select(
            "url", F.array_distinct(adaptive_tokens_col("text")).alias("terms")
        )
        a = docs.alias("a")
        b = docs.alias("b")
        pairs = a.join(b, F.col("a.url") < F.col("b.url"))
        inter = F.size(F.array_intersect(F.col("a.terms"), F.col("b.terms")))
        union = F.size(F.array_union(F.col("a.terms"), F.col("b.terms")))
        row = (
            pairs.filter((F.size(F.col("a.terms")) > 0) & (F.size(F.col("b.terms")) > 0))
            .select((inter.cast("double") / union.cast("double")).alias("j"))
            .agg(F.avg("j").alias("avg"))
            .first()
        )
        return float(row["avg"] or 0.0)

    def _metrics_from(
        self, kb: DataFrame, stats: DataFrame, n_docs: int, term_count: int
    ) -> dict:
        """Metrics over PREPARED inputs (cached kb + cached term stats with
        their counts) — the single code path for step() and metrics(), so
        the stats table is computed exactly once per adaptive step."""
        coverage = coverage_score(
            coverage_per_term(stats, self.query_terms, n_docs)
        )
        consistency = self._consistency(kb, n_docs)
        saturation = saturation_score(self.new_terms_history, self.pages_history)
        confidence = 0.4 * coverage + 0.3 * consistency + 0.3 * saturation
        return {
            "coverage": round(coverage, 6),
            "consistency": round(consistency, 6),
            "saturation": round(saturation, 6),
            "confidence": round(confidence, 6),
            "pages": n_docs,
            "terms": term_count,
        }

    _EMPTY_METRICS = {
        "coverage": 0.0, "consistency": 0.0, "saturation": 0.0,
        "confidence": 0.0, "pages": 0, "terms": 0,
    }

    def metrics(self) -> dict:
        """coverage/consistency/saturation/confidence over the current KB."""
        kb = self._kb()
        if kb is None:
            return dict(self._EMPTY_METRICS)
        kb = kb.cache()
        n_docs = kb.count()
        if n_docs == 0:
            kb.unpersist()
            return dict(self._EMPTY_METRICS)
        stats = kb_term_stats(kb, "url", "text").cache()
        term_count = stats.count()
        m = self._metrics_from(kb, stats, n_docs, term_count)
        stats.unpersist()
        kb.unpersist()
        return m

    # -- the loop -------------------------------------------------------------

    def step(self) -> dict:
        """One frontier iteration + refreshed KB metrics. The KB and its
        term-stats table are cached and counted ONCE; the saturation
        history update and every metric read the same cached pair (the
        previous shape recomputed the full stats aggregation twice per
        step — VERDICT r02 hygiene item)."""
        s = self.run.run_iteration()
        if s.get("done"):
            return {**s, **self.metrics()}
        kb = self._kb()
        if kb is None:
            return {**s, **dict(self._EMPTY_METRICS)}
        kb = kb.cache()
        n_docs = kb.count()
        stats = kb_term_stats(kb, "url", "text").cache()
        term_count = stats.count()
        self.new_terms_history.append(term_count - self._prev_term_count)
        self.pages_history.append(int(s.get("fetched") or 0))
        self._prev_term_count = term_count
        m = self._metrics_from(kb, stats, n_docs, term_count)
        stats.unpersist()
        kb.unpersist()
        self.metrics_history.append(m)
        return {**s, **m}

    def should_stop(self, m: dict) -> str | None:
        """The reference's stop rules; returns the reason or None."""
        if m.get("done"):
            return m.get("reason", "frontier_empty")
        if m["confidence"] >= self.config.confidence_threshold:
            return "confident"
        if m.get("pages", 0) >= self.config.max_pages:
            return "max_pages"
        if m["saturation"] >= self.config.saturation_threshold:
            return "saturated"
        return None

    def crawl_until_confident(self, max_iterations: int = 20) -> dict:
        """Iterate until a stop rule fires; returns the final metrics +
        stop reason. Resumable like the underlying CrawlRun."""
        last: dict = {"confidence": 0.0}
        for _ in range(max_iterations):
            last = self.step()
            reason = self.should_stop(last)
            if reason:
                last["stop_reason"] = reason
                return last
        last["stop_reason"] = "max_iterations"
        return last
