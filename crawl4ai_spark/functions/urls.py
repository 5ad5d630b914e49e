"""Catalyst-native URL column expressions (no Python in the hot path).

These cover the URL-pure functions the reference computes per-URL in Python
with lru_cache (scorers.py / filters.py) — columnar execution makes the
caching moot (SURVEY.md §4). Everything here compiles to JVM expressions
inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_CCSLD = ["co", "com", "org", "gov", "edu", "net", "mil", "int", "ac", "ad", "ae", "af", "ag"]


def host_col(url: Column) -> Column:
    """Lower-cased netloc (with port stripped)."""
    return F.lower(F.coalesce(F.parse_url(url, F.lit("HOST")), F.lit("")))


def path_col(url: Column) -> Column:
    return F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))


def base_domain_col(url: Column) -> Column:
    """Native version of get_base_domain (spec: reference utils.py:2320-2368):
    drop port + leading www., keep last 3 labels when 2nd-to-last is a known
    ccSLD (co.uk etc.), else last 2."""
    domain = F.regexp_replace(host_col(url), r"^www\.", "")
    parts = F.split(domain, r"\.")
    n = F.size(parts)
    second_last = F.element_at(parts, -2)
    take3 = (n > 2) & second_last.isin(_CCSLD)
    last3 = F.concat_ws(".", F.slice(parts, n - 2, 3))
    last2 = F.concat_ws(".", F.slice(parts, n - 1, 2))
    return F.when(domain == "", "").when(n < 2, domain).otherwise(
        F.when(take3, last3).otherwise(last2)
    )


def path_depth_col(url: Column) -> Column:
    """Number of non-empty path segments (PathDepthScorer input,
    spec: reference scorers.py:190-245)."""
    segs = F.filter(F.split(path_col(url), "/"), lambda x: x != "")
    return F.size(segs)


def extension_col(url: Column) -> Column:
    """Lower-cased file extension of the path ('' if none)."""
    return F.lower(F.regexp_extract(path_col(url), r"\.([A-Za-z0-9]{1,8})$", 1))


def url_valid_col(url: Column) -> Column:
    """URL validity gate (F8, spec: reference bfs_strategy.py:46-66):
    scheme http/https, non-empty netloc containing a dot."""
    scheme_ok = url.rlike("^(?i)https?://")
    host = host_col(url)
    return scheme_ok & (host != "") & host.contains(".")
