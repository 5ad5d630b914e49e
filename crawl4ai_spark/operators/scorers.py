"""URL scorers as Catalyst Column expressions (SURVEY.md §2.9, U1-U6).

Behavioral spec: /root/reference/crawl4ai/deep_crawling/scorers.py —
KeywordRelevanceScorer :160-188, PathDepthScorer :190-245 (lookup
[1.0, .5, 1/3, .25] by |depth-optimal|, else 1/(1+d)), ContentTypeScorer
:247-330 (extension → weight, else 0), FreshnessScorer :332-412 (latest
year ≤ current_year → [1.0,.9,.8,.7,.6,.5] by age else max(.1, 1-.1·age);
no year → 0.5), DomainAuthorityScorer :414-519 (domain → weight, default),
CompositeScorer :91-158 (sum of weighted child scores, ÷count if normalize).

All pure URL→float — perfectly columnar; the reference's lru_cache layers
(scorers.py:115,169,230,...) are unnecessary under whole-stage codegen.
Weights are squashed through float32 exactly as the reference stores them
(ctypes.c_float, scorers.py:66-68) so composite tie-breaks match.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from crawl4ai_spark.functions.urls import path_col

_PATH_SCORE_LOOKUP = [1.0, 0.5, 0.3333333333333333, 0.25]
_FRESHNESS_SCORES = [1.0, 0.9, 0.8, 0.7, 0.6, 0.5]


def _w(weight: float) -> float:
    """float32-squash a scorer weight, as the reference stores them."""
    return float(np.float32(weight))


def keyword_relevance_score(
    url: Column, keywords: list[str], weight: float = 1.0, case_sensitive: bool = False
) -> Column:
    """matches/len(keywords) by substring containment (U1)."""
    if not keywords:
        return F.lit(0.0)
    u = url if case_sensitive else F.lower(url)
    hits = [
        u.contains(k if case_sensitive else k.lower()).cast("int") for k in keywords
    ]
    total = hits[0]
    for h in hits[1:]:
        total = total + h
    return (total.cast("double") / F.lit(float(len(keywords)))) * _w(weight)


def path_depth_score(url: Column, optimal_depth: int = 3, weight: float = 1.0) -> Column:
    """Lookup score by |path_depth − optimal| (U2)."""
    segs = F.filter(F.split(path_col(url), "/"), lambda x: x != "")
    depth = F.size(segs)
    dist = F.abs(depth - F.lit(optimal_depth))
    lookup = F.array(*[F.lit(v) for v in _PATH_SCORE_LOOKUP])
    score = F.when(dist < 4, F.element_at(lookup, dist + 1)).otherwise(
        F.lit(1.0) / (F.lit(1.0) + dist.cast("double"))
    )
    return score * _w(weight)


def _quick_extension(url: Column) -> Column:
    """Alnum run after the LAST dot anywhere in the URL (matches the
    reference's _quick_extension, scorers.py:273-302 — not path-limited)."""
    after_last_dot = F.substring_index(url, ".", -1)
    return F.when(
        url.contains("."), F.lower(F.regexp_extract(after_last_dot, r"^([A-Za-z0-9]+)", 1))
    ).otherwise(F.lit(""))


def content_type_score(
    url: Column, type_weights: dict[str, float], weight: float = 1.0
) -> Column:
    """Extension → weight map; 0.0 when no pattern matches (U3). Keys in
    the reference's '.ext$' form are exact-extension entries; other keys are
    treated as regex against the whole URL."""
    ext = _quick_extension(url)
    exact: dict[str, float] = {}
    regexes: list[tuple[str, float]] = []
    for pattern, score in type_weights.items():
        if pattern.startswith(".") and pattern.endswith("$"):
            exact[pattern[1:-1]] = score
        else:
            regexes.append((pattern, score))
    regexes.sort(key=lambda x: -x[1])

    expr = F.lit(0.0)
    for pattern, score in reversed(regexes):
        expr = F.when(url.rlike(pattern), F.lit(score)).otherwise(expr)
    for e, score in exact.items():
        expr = F.when(ext == e, F.lit(score)).otherwise(expr)
    return expr * _w(weight)


def freshness_score(url: Column, current_year: int = 2024, weight: float = 1.0) -> Column:
    """Latest plausible year in the URL → freshness lookup (U4)."""
    years = F.transform(
        F.regexp_extract_all(
            url,
            F.lit(r"(?:/|[-_])((?:19|20)\d{2})(?:(?:/|[-_])\d{2}(?:(?:/|[-_])\d{2})?)?"),
            F.lit(1),
        ),
        lambda x: x.cast("int"),
    )
    valid = F.filter(years, lambda y: y <= F.lit(current_year))
    latest = F.array_max(valid)
    diff = F.lit(current_year) - latest
    lookup = F.array(*[F.lit(v) for v in _FRESHNESS_SCORES])
    score = F.when(latest.isNull(), F.lit(0.5)).otherwise(
        F.when(diff < len(_FRESHNESS_SCORES), F.element_at(lookup, diff + 1)).otherwise(
            F.greatest(F.lit(0.1), F.lit(1.0) - diff.cast("double") * 0.1)
        )
    )
    return score * _w(weight)


def domain_authority_score(
    url: Column, domain_weights: dict[str, float], default_weight: float = 0.5, weight: float = 1.0
) -> Column:
    """Domain → authority weight map with default (U5). The lookup key is
    the RAW lower-cased host, port stripped — the reference's
    _extract_domain (scorers.py:455-493) does NOT fold 'www.', so a
    weights map keyed 'python.org' misses 'www.python.org' there too;
    stripping it here would silently diverge frontier ordering."""
    from crawl4ai_spark.functions.urls import host_col

    host = host_col(url)
    expr = F.lit(default_weight)
    for d, s in domain_weights.items():
        expr = F.when(host == d.lower(), F.lit(s)).otherwise(expr)
    return expr * _w(weight)


def composite_score(scores: list[Column], normalize: bool = True) -> Column:
    """Sum of already-weighted child scores, ÷count if normalize (U6)."""
    if not scores:
        return F.lit(0.0)
    total = scores[0]
    for s in scores[1:]:
        total = total + s
    if normalize:
        return total / F.lit(float(len(scores)))
    return total


def scoring_stats(df, score_col: str = "score"):
    """A2 — ScoringStats (behavioral spec: deep_crawling/scorers.py:26-62:
    urls_scored / total_score / min / max / average, updated per scored
    URL) as ONE distributed aggregate over the score column. The running
    total is accumulated in micro-units (round(score·1e6) as bigint) so the
    sum is exact and associative — a float running sum would depend on
    partition order at scale. ``average`` follows get_average (:49-51):
    0.0 when nothing was scored."""
    from pyspark.sql import DataFrame  # noqa: F401  (documented return type)

    micros = F.round(F.col(score_col) * 1e6).cast("long")
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("urls_scored"),
        F.coalesce(F.sum(micros), F.lit(0)).cast("long").alias("total_micro"),
        F.round(F.coalesce(F.min(score_col), F.lit(0.0)), 6).alias("min_score"),
        F.round(F.coalesce(F.max(score_col), F.lit(0.0)), 6).alias("max_score"),
        F.round(
            F.when(
                F.count(F.lit(1)) > 0,
                F.coalesce(F.sum(micros), F.lit(0)) / 1e6 / F.count(F.lit(1)),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("avg_score"),
    )
