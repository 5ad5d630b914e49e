"""URL filters as Catalyst Column expressions (SURVEY.md §2.2, F1-F9).

Behavioral spec: /root/reference/crawl4ai/deep_crawling/filters.py —
FilterChain :69-116, URLPatternFilter :119-255 (categorized suffix/prefix/
domain/path matchers incl. the /api/ path-boundary rule :234-244),
ContentTypeFilter :258-421 (extension→MIME, extensionless URLs PASS
:412-413), DomainFilter :424-498 (subdomain-inclusive allow/block);
nonsense-URL filter: async_url_seeder.py:1284-1378 (NB sections 4-8 are
commented out in the reference — only robots/sitemap/utility files, hidden
paths, non-content paths, print patterns, and too-short paths are active).

Everything compiles to JVM predicates; Catalyst pushes what it can into the
parquet scan. A FilterChain is a conjunction — no short-circuit machinery
needed, the row-level evaluator already stops at the first false conjunct.
"""

from __future__ import annotations

import fnmatch
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawl4ai_spark.functions.urls import host_col, path_col


def _path_no_query(url: Column) -> Column:
    return F.substring_index(url, "?", 1)


def url_pattern_filter(url: Column, patterns: list[str], reverse: bool = False) -> Column:
    """Glob/regex URL pattern match with the reference's categorized
    semantics: ``*.ext`` suffix, ``prefix/*`` with path-boundary check,
    ``*.domain.com`` with scheme, regex passthrough for ^/$/\\d patterns,
    fnmatch-translated globs otherwise. OR across patterns; ``reverse``
    negates the result.

    DOCUMENTED DIVERGENCE (deliberate, the reference's substitutions are
    applied BEFORE fnmatch.translate, which then re-escapes them —
    deep_crawling/filters.py:193-204): upstream ``'**'`` becomes
    ``'.*'`` and translate escapes the dot, so ``a/**`` compiles to
    ``a/\\..*`` — it only matches paths whose next char is a literal
    ``'.'``; upstream ``{a,b}`` becomes ``(a|b)`` and translate escapes
    the parens/pipe, matching the literal text ``(a|b)``. This port
    implements the evident intent instead: ``**`` matches any characters
    and ``{a,b}`` is a real alternation (the oracle-checked contract
    encodes these semantics)."""
    if isinstance(patterns, str):
        patterns = [patterns]
    conds: list[Column] = []
    for p in patterns:
        is_regex = p.startswith("^") or p.endswith("$") or "\\d" in p
        if is_regex:
            conds.append(url.rlike(p))
        elif p.count("*") == 1 and p.startswith("*."):
            suffix = p[2:]
            last_seg = F.substring_index(F.substring_index(_path_no_query(url), "/", -1), ".", -1)
            conds.append(last_seg == suffix)
        elif p.count("*") == 1 and p.endswith("/*"):
            prefix = p[:-2]
            path = _path_no_query(url)
            after = F.substring(path, len(prefix) + 1, 1)
            conds.append(
                path.startswith(prefix) & ((after == "") | after.isin("/", "?", "#"))
            )
        elif "://" in p and p.startswith("*."):
            conds.append(url.rlike("^" + re.escape(p).replace(r"\*\.", r"[^/]+\.")))
        else:
            g = p
            if "**" in g:
                g = g.replace("**", "*")
            if "{" in g:
                g = re.sub(r"\{([^}]+)\}", lambda m: f'({"|".join(m.group(1).split(","))})', g)
                # fnmatch would escape our alternation; translate around it
                rx = fnmatch.translate(g)
                rx = rx.replace(r"\(", "(").replace(r"\)", ")").replace(r"\|", "|")
            else:
                rx = fnmatch.translate(g)
            conds.append(url.rlike(rx))
    # empty pattern list matches nothing (reference apply() returns False),
    # not an IndexError at plan-build time
    result = conds[0] if conds else F.lit(False)
    for c in conds[1:]:
        result = result | c
    return ~result if reverse else result


# Common extension→MIME prefixes (subset of the reference's 95-entry map,
# filters.py:264-360; same shape, re-derived from public MIME tables).
_EXT_MIME = {
    "html": "text/html", "htm": "text/html", "xhtml": "application/xhtml+xml",
    "txt": "text/plain", "md": "text/plain", "css": "text/css",
    "js": "application/javascript", "json": "application/json",
    "xml": "application/xml", "rss": "application/rss+xml",
    "pdf": "application/pdf", "doc": "application/msword",
    "docx": "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "xls": "application/vnd.ms-excel", "csv": "text/csv",
    "jpg": "image/jpeg", "jpeg": "image/jpeg", "png": "image/png",
    "gif": "image/gif", "webp": "image/webp", "svg": "image/svg+xml",
    "ico": "image/x-icon", "mp4": "video/mp4", "webm": "video/webm",
    "mp3": "audio/mpeg", "wav": "audio/wav", "ogg": "audio/ogg",
    "zip": "application/zip", "gz": "application/gzip",
    "tar": "application/x-tar", "woff": "font/woff", "woff2": "font/woff2",
}


def content_type_filter(url: Column, allowed_types: list[str]) -> Column:
    """Keep URLs whose path extension maps to an allowed MIME family;
    extensionless URLs always pass (reference filters.py:412-413).

    Extension extraction mirrors the reference's _extract_extension
    (filters.py:362-381) exactly: strip the scheme, take the PATH from the
    first '/', last path segment, text after its last dot. A path-less URL
    ('https://example.com', 'https://example.com?q=1') therefore has NO
    extension and passes — the hostname's TLD is not an extension. The
    reference does not strip the query either, so 'a.php?x=1.jpg' scores
    extension 'jpg' (quirk preserved)."""
    allowed_exts = [
        ext for ext, mime in _EXT_MIME.items()
        if any(a in mime for a in allowed_types)
    ]
    after_scheme = F.regexp_replace(url, r"^.*?://", "")
    slash = F.instr(after_scheme, "/")
    path = F.when(
        slash > 0, F.substring(after_scheme, slash, 2_000_000)
    ).otherwise(F.lit(""))
    filename = F.substring_index(path, "/", -1)
    ext = F.when(
        filename.contains("."), F.lower(F.substring_index(filename, ".", -1))
    ).otherwise(F.lit(""))
    return (ext == "") | ext.isin(allowed_exts)


def domain_filter(
    url: Column,
    allowed_domains: list[str] | None = None,
    blocked_domains: list[str] | None = None,
) -> Column:
    """Subdomain-inclusive allow/block (d == p or d.endswith('.'+p)).
    NB the reference extracts the domain with ``://([^/]+)`` — the PORT is
    kept — so we match on the raw netloc, not host_col."""
    netloc = F.lower(F.regexp_extract(url, r"://([^/]+)", 1))

    def matches(domains: list[str]) -> Column:
        cond = F.lit(False)
        for d in domains:
            d = d.lower()
            cond = cond | (netloc == d) | netloc.endswith("." + d)
        return cond

    result = F.lit(True)
    if blocked_domains:
        result = result & ~matches(blocked_domains)
    if allowed_domains:
        result = result & matches(allowed_domains)
    return result


_UTILITY_FILES = [
    "ads.txt", "humans.txt", "security.txt", ".well-known/security.txt",
    "crossdomain.xml", "browserconfig.xml", "manifest.json",
    "apple-app-site-association", ".well-known/apple-app-site-association",
    "favicon.ico", "apple-touch-icon.png", "android-chrome-192x192.png",
]

_NON_CONTENT_PATHS = [
    "/wp-admin", "/wp-includes", "/wp-content/uploads",
    "/admin", "/login", "/signin", "/signup", "/register",
    "/checkout", "/cart", "/account", "/profile",
    "/search", "/404", "/error",
    "/.git", "/.svn", "/.hg",
    "/cgi-bin", "/scripts", "/includes",
]

_SHORT_PATH_WHITELIST = ["/", "/en", "/de", "/fr", "/es", "/it"]


def nonsense_url_filter(url: Column) -> Column:
    """TRUE when the URL is worth crawling (i.e. NOT nonsense). Mirrors the
    ACTIVE branches of the reference's _is_nonsense_url only."""
    path = F.lower(path_col(url))
    url_lower = F.lower(url)

    robots_sitemap = (
        path.endswith("/robots.txt")
        | path.endswith("/sitemap.xml")
        | path.endswith("/sitemap_index.xml")
    )
    sitemap_variant = path.contains("/sitemap") & (
        path.endswith(".xml") | path.endswith(".xml.gz") | path.endswith(".txt")
    )
    utility = F.lit(False)
    for f in _UTILITY_FILES:
        utility = utility | path.endswith("/" + f)
    hidden = F.exists(
        F.filter(F.split(path, "/"), lambda seg: seg != ""),
        lambda seg: seg.startswith("."),
    )
    non_content = F.lit(False)
    for ncp in _NON_CONTENT_PATHS:
        non_content = non_content | path.contains(ncp)
    printish = (
        url_lower.contains("?print=")
        | url_lower.contains("&print=")
        | url_lower.contains("/print/")
        | url_lower.contains("_print.")
    )
    too_short = (F.length(F.regexp_replace(path, "^/+|/+$", "")) < 3) & ~path.isin(
        _SHORT_PATH_WHITELIST
    )
    nonsense = (
        robots_sitemap | sitemap_variant | utility | hidden | non_content | printish | too_short
    )
    return ~nonsense


def url_validity_filter(url: Column, depth: Column | None = None) -> Column:
    """F8 validity gate with the depth-0 bypass (reference
    bfs_strategy.py:46-66: seeds skip filtering)."""
    from crawl4ai_spark.functions.urls import url_valid_col

    valid = url_valid_col(url)
    if depth is not None:
        return (depth == 0) | valid
    return valid


def head_title_col(head: Column) -> Column:
    """HeadPeekr title (utils.py:2846-2849): case-insensitive DOTALL
    regex over the raw head string."""
    return F.regexp_extract(head, "(?is)<title>(.*?)</title>", 1)


def head_meta_tags_col(head: Column) -> Column:
    """HeadPeekr meta-tag extraction (utils.py:2840-2861): ``<meta ...>``
    blobs that carry ``content=`` and a ``name=``/``property=`` key, any
    attribute order, either quote style; tags missing either are dropped.
    The ONE spelling of this regex surface — F5 relevance scoring and the
    link-preview context extraction both consume it, so a fix to the known
    quirks (case-sensitive ``name=``/``property=`` matching, non-greedy
    ``content=["'](.*?)["']`` truncating values that contain the other
    quote char) lands everywhere together."""
    return F.filter(
        F.regexp_extract_all(head, F.lit(r"<meta[^>]+>"), 0),
        lambda t: t.rlike("content=[\"']")
        & (t.rlike("name=[\"']") | t.rlike("property=[\"']")),
    )


def meta_tag_content_col(tag: Column) -> Column:
    """The ``content=`` value of ONE extracted meta-tag blob (not to be
    confused with ``meta_content_col(head, key)`` below, HeadPeekr's
    one-key getter over a whole head)."""
    return F.regexp_extract(tag, "content=[\"'](.*?)[\"']", 1)


def meta_tag_key_col(tag: Column) -> Column:
    """One blob's key: ``name=`` if present, else ``property=``."""
    name = F.regexp_extract(tag, "name=[\"'](.*?)[\"']", 1)
    prop = F.regexp_extract(tag, "property=[\"'](.*?)[\"']", 1)
    return F.when(name != "", name).otherwise(prop)


def head_meta_get(metas: Column, name: str) -> Column:
    """meta dict ``.get(name, '')`` — last tag with that key wins, like
    the reference's dict insertion order."""

    # one-arg lambda only: a two-param lambda would receive the array
    # INDEX as its second argument
    def _match(t):
        return meta_tag_key_col(t) == name

    hits = F.filter(metas, _match)
    return F.when(
        F.size(hits) > 0, meta_tag_content_col(F.element_at(hits, -1))
    ).otherwise(F.lit(""))


def content_relevance_score_col(
    head: Column,
    query: str,
    k1: float = 1.2,
    b: float = 0.75,
    avgdl: int = 1000,
) -> Column:
    """F5 ContentRelevanceFilter score — exact restatement of the
    reference's head-section BM25 (deep_crawling/filters.py:501-575):
    weighted document = title·3 ⊕ description·2 ⊕ keywords ⊕ all meta
    values (string REPETITION, so copy boundaries merge tokens — quirk
    preserved), simplified idf = ln(2/(tf+0.5)+1), fixed avgdl."""
    title = head_title_col(head)
    metas = head_meta_tags_col(head)
    _content = meta_tag_content_col

    desc = head_meta_get(metas, "description")
    kw = head_meta_get(metas, "keywords")
    # "all meta values" = ' '.join(meta_dict.values()) (filters.py:546) —
    # og:, twitter:, author, ... included, document order. Dict-key dedup of
    # repeated meta names is the one divergence left: a head repeating a
    # meta name contributes the value once there, each occurrence here.
    meta_values = F.array_join(F.transform(metas, _content), " ")
    doc = F.concat(
        F.repeat(title, 3), F.lit(" "),
        F.repeat(desc, 2), F.lit(" "),
        kw, F.lit(" "),
        meta_values,
    )
    tokens = F.filter(F.split(F.lower(doc), r"\s+"), lambda t: t != "")
    doc_len = F.size(tokens).cast("double")
    score = F.lit(0.0)
    for term in sorted(set(query.lower().split())):
        tf = F.size(F.filter(tokens, _isin_term(term))).cast("double")
        idf = F.log(F.lit(2.0) / (tf + F.lit(0.5)) + F.lit(1.0))
        numerator = tf * F.lit(k1 + 1)
        denominator = tf + F.lit(k1) * (
            F.lit(1.0) - F.lit(b) + F.lit(b) * (doc_len / F.lit(float(avgdl)))
        )
        score = score + idf * (numerator / denominator)
    return score


def _isin_term(term: str):
    """One-arg lambda factory (two-param lambdas get the array index)."""
    return lambda t: t == term


def content_relevance_filter(
    head: Column, query: str, threshold: float, **kwargs
) -> Column:
    """Boolean F5 gate: head-BM25 relevance ≥ threshold."""
    return content_relevance_score_col(head, query, **kwargs) >= F.lit(threshold)


SEO_DEFAULT_WEIGHTS = {
    "title_length": 0.15,
    "title_kw": 0.18,
    "meta_description": 0.12,
    "canonical": 0.10,
    "robot_ok": 0.20,
    "schema_org": 0.10,
    "url_quality": 0.15,
}


_META_NAME_RE = "name=[\"'](.*?)[\"']"
_META_PROP_RE = "property=[\"'](.*?)[\"']"
_META_CONTENT_RE = "content=[\"'](.*?)[\"']"


def meta_content_col(head: Column, key: str) -> Column:
    """HeadPeekr.extract_meta_tags for one key (utils.py:2840-2857,
    restated expression-for-expression): scan ``<meta[^>]+>`` tags in any
    attribute order / either quote style; a tag contributes when it has a
    content attr AND a name (preferred over property) attr equal to
    ``key``; the LAST matching tag wins (the reference overwrites its dict
    in finditer order). NULL when no tag matches."""
    metas = F.regexp_extract_all(head, F.lit(r"<meta[^>]+>"), F.lit(0))

    def tag_key(t: Column) -> Column:
        return F.when(
            t.rlike(_META_NAME_RE), F.regexp_extract(t, _META_NAME_RE, 1)
        ).otherwise(F.regexp_extract(t, _META_PROP_RE, 1))

    matched = F.filter(
        metas, lambda t: t.rlike(_META_CONTENT_RE) & (tag_key(t) == key)
    )
    # try_: no matching tag → NULL, not an ANSI index error
    return F.regexp_extract(
        F.try_element_at(matched, F.lit(-1)), _META_CONTENT_RE, 1
    )


def seo_score_col(
    head: Column,
    url: Column,
    keywords: list[str] | None = None,
    weights: dict[str, float] | None = None,
) -> Column:
    """F6 SEOFilter score — exact restatement of the reference's weighted
    head-section assessment (deep_crawling/filters.py:576-687): title
    length banding, keyword hits (0.3 each, capped), meta-description
    length, canonical match, robots noindex gate, ld+json detection, and
    URL-quality penalty multipliers. Pure Catalyst over the head string.

    HeadPeekr parity notes: the title regex is IGNORECASE|DOTALL
    (utils.py:2860); description/robots/canonical come from META tags via
    ``meta_content_col`` — attr order and quote style free — and in
    particular 'canonical' means ``<meta name="canonical">``: a
    ``<link rel="canonical">`` is INVISIBLE to the reference's scorer
    (quirk preserved), so typical pages score the neutral 0.5."""
    w = weights or SEO_DEFAULT_WEIGHTS
    title = F.coalesce(
        F.regexp_extract(head, "(?is)<title>(.*?)</title>", 1), F.lit("")
    )
    tlen = F.length(title)
    title_length = (
        F.when((tlen >= 50) & (tlen <= 60), 1.0)
        .when(((tlen >= 40) & (tlen < 50)) | ((tlen > 60) & (tlen <= 70)), 0.7)
        .otherwise(0.3)
    )
    if keywords:
        pat = r"(?i)\b(" + "|".join(re.escape(k) for k in keywords) + r")\b"
        hits = F.size(F.regexp_extract_all(title, F.lit(pat), F.lit(0)))
        title_kw = F.least(hits.cast("double") * 0.3, F.lit(1.0))
    else:
        title_kw = F.lit(0.0)
    desc = F.coalesce(meta_content_col(head, "description"), F.lit(""))
    dlen = F.length(desc)
    meta_description = (
        F.when((dlen >= 140) & (dlen <= 160), 1.0)
        .when((dlen >= 120) & (dlen <= 200), 0.5)
        .otherwise(0.2)
    )
    canonical = meta_content_col(head, "canonical")
    canonical_score = (
        F.when(canonical.isNull() | (canonical == ""), 0.5)
        .when(canonical == url, 1.0)
        .otherwise(0.2)
    )
    robots = F.coalesce(meta_content_col(head, "robots"), F.lit(""))
    robot_ok = F.when(robots.contains("noindex"), 0.0).otherwise(1.0)
    schema_org = F.when(
        head.rlike(r"<script[^>]+type=[\"']application/ld\+json"), 1.0
    ).otherwise(0.0)
    path = F.lower(F.regexp_extract(url, r"^[a-zA-Z+]+://[^/]+([^?#]*)", 1))
    has_query = url.rlike(r"\?")
    url_quality = (
        F.lit(1.0)
        * F.when(F.length(path) > 80, 0.7).otherwise(1.0)
        * F.when(path.rlike(r"\d{4}"), 0.8).otherwise(1.0)
        * F.when(has_query, 0.6).otherwise(1.0)
        * F.when(path.contains("_"), 0.9).otherwise(1.0)
    )
    parts = {
        "title_length": title_length,
        "title_kw": title_kw,
        "meta_description": meta_description,
        "canonical": canonical_score,
        "robot_ok": robot_ok,
        "schema_org": schema_org,
        "url_quality": url_quality,
    }
    total = None
    for factor, weight in w.items():
        term = F.lit(weight) * parts[factor]
        total = term if total is None else total + term
    return total


def seo_filter(
    head: Column,
    url: Column,
    threshold: float = 0.65,
    keywords: list[str] | None = None,
    weights: dict[str, float] | None = None,
) -> Column:
    """Boolean F6 gate: seo_score ≥ threshold."""
    return seo_score_col(head, url, keywords, weights) >= F.lit(threshold)


class FilterChain:
    """Conjunction of filter Columns with pass/reject stats (F1).

    Usage::

        chain = FilterChain([cond1, cond2, ...])
        kept = chain.apply(df)        # filtered DataFrame
        stats = chain.stats(df)       # one-row DataFrame: total/passed/rejected
    """

    def __init__(self, conditions: list[Column]):
        self.conditions = conditions

    def condition(self) -> Column:
        if not self.conditions:
            return F.lit(True)
        cond = self.conditions[0]
        for c in self.conditions[1:]:
            cond = cond & c
        return cond

    def apply(self, df: DataFrame) -> DataFrame:
        return df.filter(self.condition())

    def stats(self, df: DataFrame) -> DataFrame:
        passed = F.sum(self.condition().cast("long")).alias("passed")
        total = F.count(F.lit(1)).alias("total")
        return df.agg(total, passed).select(
            "total", "passed", (F.col("total") - F.col("passed")).alias("rejected")
        )
