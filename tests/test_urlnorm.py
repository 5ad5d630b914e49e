"""URL normalizer parity tests.

Expected values mirror the reference's own unit suite
(/root/reference/tests/test_normalize_url.py) plus tracking/sort-query cases
for the extended normalizer (utils.py:2122-2205) and the deep-crawl variant
(utils.py:2208-2253). Cases restated, not copied.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.functions.urlnorm import (
    get_base_domain,
    is_external_url,
    normalize_url,
    normalize_url_for_deep_crawl,
)

BASE = "https://example.com/dir/page.html"


@pytest.mark.parametrize(
    "href,expected",
    [
        # relative resolution
        ("other.html", "https://example.com/dir/other.html"),
        ("/rooted.html", "https://example.com/rooted.html"),
        ("../up.html", "https://example.com/up.html"),
        ("./same.html", "https://example.com/dir/same.html"),
        # absolute passthrough + netloc lowering
        ("HTTPS://EXAMPLE.COM/A", "https://example.com/A"),
        # protocol-relative
        ("//cdn.example.com/x.js", "https://cdn.example.com/x.js"),
        # fragment dropped
        ("page2.html#sec", "https://example.com/dir/page2.html"),
        # trailing slash stripped (non-root)
        ("https://example.com/a/b/", "https://example.com/a/b"),
        # root slash kept by T1
        ("https://example.com/", "https://example.com/"),
        # tracking params dropped, keys sorted + lowercased
        (
            "https://example.com/x?utm_source=a&B=2&a=1",
            "https://example.com/x?a=1&b=2",
        ),
        ("https://example.com/x?gclid=1&fbclid=2&ref=3", "https://example.com/x"),
        # blank values kept
        ("https://example.com/x?a=&b=1", "https://example.com/x?a=&b=1"),
        # whitespace stripped
        ("  spaced.html  ", "https://example.com/dir/spaced.html"),
    ],
)
def test_normalize_url(href, expected):
    assert normalize_url(href, BASE) == expected


def test_normalize_url_empty():
    assert normalize_url("", BASE) is None
    assert normalize_url(None, BASE) is None


@pytest.mark.parametrize(
    "href,expected",
    [
        # root path also stripped by T2 (unlike T1)
        ("https://example.com/", "https://example.com"),
        # narrow tracking list: gclid is NOT dropped by T2
        ("https://example.com/x?gclid=1&utm_source=a", "https://example.com/x?gclid=1"),
        # duplicate keys regrouped (parse_qs+doseq): a=1&b=2&a=3 -> a=1&a=3&b=2
        ("https://example.com/x?a=1&b=2&a=3", "https://example.com/x?a=1&a=3&b=2"),
        # keys NOT sorted, NOT lowercased by T2
        ("https://example.com/x?B=2&a=1", "https://example.com/x?B=2&a=1"),
        # fragment dropped
        ("https://example.com/x#frag", "https://example.com/x"),
    ],
)
def test_normalize_deep(href, expected):
    assert normalize_url_for_deep_crawl(href, BASE) == expected


def test_two_normalizers_differ():
    u = "https://example.com/x?utm_source=x&b=2&a=1#frag"
    assert normalize_url(u, BASE) == "https://example.com/x?a=1&b=2"
    assert normalize_url_for_deep_crawl(u, BASE) == "https://example.com/x?b=2&a=1"


@pytest.mark.parametrize(
    "url,expected",
    [
        ("https://www.example.com/a", "example.com"),
        ("https://sub.example.com/a", "example.com"),
        ("https://example.co.uk/a", "example.co.uk"),
        ("https://www.bbc.co.uk:8080/a", "bbc.co.uk"),
        ("https://ac.uk", "ac.uk"),
        ("not a url", ""),
    ],
)
def test_get_base_domain(url, expected):
    assert get_base_domain(url) == expected


@pytest.mark.parametrize(
    "url,base,expected",
    [
        ("mailto:x@y.com", "example.com", True),
        ("javascript:void(0)", "example.com", True),
        ("/relative/path", "example.com", False),
        ("https://example.com/x", "example.com", False),
        ("https://sub.example.com/x", "example.com", False),
        ("https://www.example.com/x", "example.com", False),
        ("https://other.org/x", "example.com", True),
    ],
)
def test_is_external(url, base, expected):
    assert is_external_url(url, base) == expected


def test_udfs_match_python(spark):
    from pyspark.sql import functions as F

    from crawl4ai_spark.functions.urlnorm import normalize_deep_udf, normalize_url_udf

    hrefs = [
        "other.html",
        "https://example.com/x?utm_source=x&b=2&a=1#frag",
        "/rooted",
        "//cdn.example.com/y",
    ]
    df = spark.createDataFrame([(h, BASE) for h in hrefs], ["href", "base"])
    out = df.select(
        normalize_url_udf(F.col("href"), F.col("base")).alias("n1"),
        normalize_deep_udf(F.col("href"), F.col("base")).alias("n2"),
    ).collect()
    for h, row in zip(hrefs, out):
        assert row.n1 == normalize_url(h, BASE)
        assert row.n2 == normalize_url_for_deep_crawl(h, BASE)


def test_content_type_filter_bare_domain_passes(spark):
    """Reference parity (_extract_extension filters.py:362-381): a URL with
    no path has no extension — the hostname TLD is not an extension."""
    from crawl4ai_spark.operators.filters import content_type_filter

    df = spark.createDataFrame(
        [("https://example.com",), ("https://example.com:8080",),
         ("https://example.com?q=1",), ("https://example.com/x.html",),
         ("https://example.com/x.exe",), ("https://example.com/a.php?x=1.jpg",)],
        "url string",
    )
    got = {
        r.url: r.ok
        for r in df.select(
            "url", content_type_filter(F.col("url"), ["text/html"]).alias("ok")
        ).collect()
    }
    assert got["https://example.com"] is True
    assert got["https://example.com:8080"] is True
    assert got["https://example.com?q=1"] is True
    assert got["https://example.com/x.html"] is True
    assert got["https://example.com/x.exe"] is False
    # reference quirk: the query is NOT stripped, 'jpg' is the extension
    assert got["https://example.com/a.php?x=1.jpg"] is False


def test_url_pattern_filter_empty_list_matches_nothing(spark):
    from crawl4ai_spark.operators.filters import url_pattern_filter

    df = spark.createDataFrame([("https://e.example/x",)], "url string")
    assert df.filter(url_pattern_filter(F.col("url"), [])).count() == 0
    assert df.filter(url_pattern_filter(F.col("url"), [], reverse=True)).count() == 1


def test_domain_authority_raw_host_lookup(spark):
    """Reference parity (_extract_domain scorers.py:455-493): the lookup key
    is the raw host — 'www.python.org' does NOT match 'python.org'."""
    from crawl4ai_spark.operators.scorers import domain_authority_score

    df = spark.createDataFrame(
        [("https://www.python.org/x",), ("https://python.org/x",)], "url string"
    )
    got = [
        r.s
        for r in df.select(
            domain_authority_score(F.col("url"), {"python.org": 1.0}).alias("s")
        ).collect()
    ]
    assert got == [0.5, 1.0]


def test_seo_score_headpeekr_parity(spark):
    """Hand-picked adversarial heads vs the shared reference transcription
    (_ref_seo_score below): attr order/quote-style freedom,
    IGNORECASE|DOTALL title, meta-only canonical, last-meta-wins,
    property= fallback."""
    from crawl4ai_spark.operators.filters import seo_score_col

    cases = [
        ('<TITLE>Doc 1 - web crawl doc here padding padding pad</TITLE>'
         '<meta content="noindex" name="robots">', "https://a.example/p/1"),
        ("<title>T</title><meta name='description' content='%s'>" % ("x" * 150),
         "https://a.example/p_2?q=1"),
        ('<title>x</title><link rel="canonical" href="https://a.example/p/3">',
         "https://a.example/p/3"),
        ('<title>x</title><meta name="canonical" content="https://a.example/p/4">',
         "https://a.example/p/4"),
        ('<title>x</title><meta name="canonical" content="https://other/">',
         "https://a.example/p/5"),
        ('<title>x</title><meta property="robots" content="noindex">',
         "https://a.example/2024/x"),
        ('<title>x</title><meta name="robots" content="index">'
         '<meta name="robots" content="noindex">', "https://a.example/a"),
        ('<title>mult\niline crawl doc</title>'
         '<script type="application/ld+json">{}</script>', "https://a.example/a"),
        ('<meta name="description2" content="%s">' % ("y" * 150), "https://a.example/a"),
    ]
    df = spark.createDataFrame(cases, "head string, url string")
    got = [
        r.s
        for r in df.select(
            F.round(seo_score_col(F.col("head"), F.col("url"), keywords=["doc", "crawl"]), 6).alias("s")
        ).collect()
    ]
    want = [_ref_seo_score(h, u, ["doc", "crawl"]) for h, u in cases]
    assert all(abs(g - w) < 1e-9 for g, w in zip(got, want)), list(zip(got, want))


def _ref_seo_score(head, url, kws):
    """Python transcription of the reference SEOFilter scoring
    (filters.py:576-687 + HeadPeekr utils.py:2840-2862)."""
    import re
    from urllib.parse import urlparse

    from crawl4ai_spark.operators.filters import SEO_DEFAULT_WEIGHTS

    meta = {}
    for m in re.finditer(r"<meta[^>]+>", head):
        t = m.group(0)
        nm = re.search(r'name=["\'](.*?)["\']', t)
        pm = re.search(r'property=["\'](.*?)["\']', t)
        cm = re.search(r'content=["\'](.*?)["\']', t)
        if cm and (nm or pm):
            meta[(nm or pm).group(1)] = cm.group(1)
    tm = re.search(r"<title>(.*?)</title>", head, re.I | re.S)
    title = tm.group(1) if tm else ""
    ln = len(title)
    tl = 1.0 if 50 <= ln <= 60 else (0.7 if (40 <= ln < 50 or 60 < ln <= 70) else 0.3)
    kw = min(len(re.findall(r"\b(%s)\b" % "|".join(map(re.escape, kws)), title, re.I)) * 0.3, 1.0)
    d = len(meta.get("description", ""))
    md = 1.0 if 140 <= d <= 160 else (0.5 if 120 <= d <= 200 else 0.2)
    c = meta.get("canonical")
    canon = 0.5 if not c else (1.0 if c == url else 0.2)
    robot = 1.0 if "noindex" not in meta.get("robots", "") else 0.0
    schema = 1.0 if re.search(r'<script[^>]+type=["\']application/ld\+json', head) else 0.0
    pu = urlparse(url)
    p = pu.path.lower()
    q = 1.0
    if len(p) > 80:
        q *= 0.7
    if re.search(r"\d{4}", p):
        q *= 0.8
    if pu.query:
        q *= 0.6
    if "_" in p:
        q *= 0.9
    parts = dict(title_length=tl, title_kw=kw, meta_description=md, canonical=canon,
                 robot_ok=robot, schema_org=schema, url_quality=q)
    return round(sum(SEO_DEFAULT_WEIGHTS[k] * v for k, v in parts.items()), 6)


def test_seo_score_fuzz_differential(spark):
    """150 seeded-random heads (shuffled attr order, mixed quotes, cased/
    multiline titles, duplicate metas, name/property keys) batch-scored in
    Spark vs the reference transcription."""
    import random

    from crawl4ai_spark.operators.filters import seo_score_col

    rng = random.Random(0)
    kws = ["doc", "crawl"]
    words = ["doc", "crawl", "spark", "page", "words", "title", "x"]

    def rand_head_url(i):
        parts = []
        if rng.random() < 0.9:
            t = " ".join(rng.choices(words, k=rng.randint(0, 14)))
            if rng.random() < 0.3:
                t = t.replace(" ", "\n", 1)
            tag = "TITLE" if rng.random() < 0.3 else "title"
            parts.append(f"<{tag}>{t}</{tag}>")
        for _ in range(rng.randint(0, 4)):
            key = rng.choice(["description", "robots", "canonical", "keywords", "og:x"])
            kattr = rng.choice(["name", "property"])
            qch = rng.choice(['"', "'"])
            content = rng.choice([
                "x" * rng.randint(0, 210), "noindex, nofollow", "index",
                f"https://h{i}.example/p", "short",
            ])
            attrs = [f"{kattr}={qch}{key}{qch}", f"content={qch}{content}{qch}"]
            rng.shuffle(attrs)
            parts.append("<meta " + " ".join(attrs) + ">")
        if rng.random() < 0.3:
            parts.append('<script type="application/ld+json">{}</script>')
        rng.shuffle(parts)
        path = "/" + "/".join(rng.choices(["a", "2024", "x_y", "p" * 30], k=rng.randint(0, 4)))
        url = f"https://h{i}.example{path}" + ("?q=1" if rng.random() < 0.4 else "")
        return "".join(parts), url

    cases = [rand_head_url(i) for i in range(150)]
    df = spark.createDataFrame(cases, "head string, url string")
    got = [
        r.s
        for r in df.select(
            F.round(seo_score_col(F.col("head"), F.col("url"), keywords=kws), 6).alias("s")
        ).collect()
    ]
    want = [_ref_seo_score(h, u, kws) for h, u in cases]
    bad = [(i, g, w) for i, (g, w) in enumerate(zip(got, want)) if abs(g - w) > 1e-9]
    assert not bad, (bad[:5], cases[bad[0][0]] if bad else None)


def test_content_type_filter_fuzz_differential(spark):
    """Seeded-random URLs vs a transcription of the reference's
    _extract_extension (filters.py:362-381)."""
    import random

    from crawl4ai_spark.operators.filters import _EXT_MIME, content_type_filter

    allowed = ["text/html", "text/plain"]
    allowed_exts = {e for e, m in _EXT_MIME.items() if any(a in m for a in allowed)}

    def ref_pass(url):
        u = url.split("://", 1)[-1] if "://" in url else url
        start = u.find("/")
        path = u[start:] if start != -1 else ""
        filename = path.rsplit("/", 1)[-1] if "/" in path else ""
        if "." not in filename:
            return True
        return filename.rpartition(".")[-1].lower() in allowed_exts

    rng = random.Random(1)
    segs = ["a", "b.html", "x.exe", "y.txt", "img.PNG", "q?z=1.jpg", "no-dot", "v1.2.pdf"]
    urls = []
    for i in range(200):
        scheme = rng.choice(["https://", "http://", ""])
        host = f"h{i}.example" + rng.choice(["", ":8080"])
        path = "".join("/" + rng.choice(segs) for _ in range(rng.randint(0, 3)))
        urls.append(scheme + host + path)
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r.url: r.ok
        for r in df.select(
            "url", content_type_filter(F.col("url"), allowed).alias("ok")
        ).collect()
    }
    bad = [u for u in urls if got[u] != ref_pass(u)]
    assert not bad, bad[:5]
