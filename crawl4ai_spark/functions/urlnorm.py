"""URL normalization — from-scratch reimplementation of the reference
semantics (behavioral spec: /root/reference/crawl4ai/utils.py:2122-2205
``normalize_url`` and :2208-2253 ``normalize_url_for_deep_crawl``).

The two normalizers differ deliberately and BOTH are needed for parity
(SURVEY.md §2.3 T1/T2): link records use ``normalize_url`` (sorted,
lower-cased query keys; wide tracking-param list), while the frontier /
URL-seen key uses ``normalize_url_for_deep_crawl`` (no key sort, values
regrouped per key, narrow tracking list, root path also stripped).

Vectorization: exposed both as plain Python (for use inside the scrape UDF,
which already iterates links per page) and as Arrow pandas UDFs for
column-level normalization of frontier candidates.
"""

from __future__ import annotations

from urllib.parse import (
    parse_qs,
    parse_qsl,
    quote,
    unquote,
    urlencode,
    urljoin,
    urlparse,
    urlunparse,
)

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Wide list used by normalize_url (link records).
_TRACKING_WIDE = frozenset(
    {
        "utm_source",
        "utm_medium",
        "utm_campaign",
        "utm_term",
        "utm_content",
        "gclid",
        "fbclid",
        "ref",
        "ref_src",
    }
)

# Narrow list used by normalize_url_for_deep_crawl (frontier/seen key).
_TRACKING_NARROW = ("utm_source", "utm_medium", "utm_campaign", "ref", "fbclid")


def normalize_url(
    href: str | None,
    base_url: str,
    *,
    drop_query_tracking: bool = True,
    sort_query: bool = True,
    keep_fragment: bool = False,
    extra_drop_params=None,
) -> str | None:
    """Canonical link-record normalizer (T1)."""
    if not href:
        return None
    parsed = urlparse(urljoin(base_url, href.strip()))

    netloc = parsed.netloc.lower()

    path = quote(unquote(parsed.path))
    if path.endswith("/") and path != "/":
        path = path.rstrip("/")

    query = parsed.query
    if query:
        pairs = [(k.lower(), v) for k, v in parse_qsl(query, keep_blank_values=True)]
        if drop_query_tracking:
            drop = _TRACKING_WIDE
            if extra_drop_params:
                drop = drop | {p.lower() for p in extra_drop_params}
            pairs = [kv for kv in pairs if kv[0] not in drop]
        if sort_query:
            pairs.sort(key=lambda kv: kv[0])
        query = urlencode(pairs, doseq=True) if pairs else ""

    fragment = parsed.fragment if keep_fragment else ""
    return urlunparse((parsed.scheme, netloc, path, parsed.params, query, fragment))


def normalize_url_for_deep_crawl(href: str | None, base_url: str) -> str | None:
    """Frontier/seen-key normalizer (T2). Quirks preserved on purpose:
    values are regrouped per key via parse_qs (duplicate keys merge, key
    order = first occurrence, NO sorting), and the root path '/' is also
    stripped (unlike T1)."""
    if not href:
        return None
    parsed = urlparse(urljoin(base_url, href.strip()))

    query = parsed.query
    if query:
        grouped = parse_qs(query)
        for p in _TRACKING_NARROW:
            grouped.pop(p, None)
        query = urlencode(grouped, doseq=True) if grouped else ""

    return urlunparse(
        (
            parsed.scheme,
            parsed.netloc.lower(),
            parsed.path.rstrip("/"),
            parsed.params,
            query,
            "",
        )
    )


_CCSLD = frozenset(
    {"co", "com", "org", "gov", "edu", "net", "mil", "int", "ac", "ad", "ae", "af", "ag"}
)


def get_base_domain(url: str) -> str:
    """Registrable-domain heuristic (behavioral spec: utils.py:2320-2368).
    Naive ccTLD handling: keep 3 labels when the 2nd-to-last is a known
    country-code SLD, else 2."""
    try:
        domain = urlparse(url).netloc.lower()
        if not domain:
            return ""
        domain = domain.split(":")[0]
        if domain.startswith("www."):
            domain = domain[4:]
        parts = domain.split(".")
        if len(parts) > 2 and parts[-2] in _CCSLD:
            return ".".join(parts[-3:])
        return ".".join(parts[-2:])
    except Exception:
        return ""


_SPECIAL_SCHEMES = ("mailto:", "tel:", "ftp:", "file:", "data:", "javascript:")


def is_external_url(url: str, base_domain: str) -> bool:
    """Behavioral spec: utils.py:2371-2402. NB the reference strips 'www.'
    with str.replace (anywhere in the string, not only as prefix) — kept."""
    low = url.lower()
    if any(low.startswith(p) for p in _SPECIAL_SCHEMES):
        return True
    try:
        parsed = urlparse(url)
        if not parsed.netloc:
            return False
        url_domain = parsed.netloc.lower().replace("www.", "")
        base = base_domain.lower().replace("www.", "")
        return not url_domain.endswith(base)
    except Exception:
        return False


# ---- Arrow pandas UDFs ------------------------------------------------------


@F.pandas_udf(T.StringType())
def _norm_udf(href: pd.Series, base: pd.Series) -> pd.Series:
    return pd.Series(
        [normalize_url(h, b) for h, b in zip(href, base)], dtype="object"
    )


@F.pandas_udf(T.StringType())
def _norm_deep_udf(href: pd.Series, base: pd.Series) -> pd.Series:
    return pd.Series(
        [normalize_url_for_deep_crawl(h, b) for h, b in zip(href, base)],
        dtype="object",
    )


def normalize_url_udf(href, base):
    """Column-level T1 normalizer (Arrow-batched)."""
    return _norm_udf(href, base)


def normalize_deep_udf(href, base):
    """Column-level T2 normalizer (Arrow-batched) — the frontier key."""
    return _norm_deep_udf(href, base)
