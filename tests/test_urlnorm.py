"""URL normalizer parity tests.

Expected values mirror the reference's own unit suite
(/root/reference/tests/test_normalize_url.py) plus tracking/sort-query cases
for the extended normalizer (utils.py:2122-2205) and the deep-crawl variant
(utils.py:2208-2253). Cases restated, not copied.
"""

from __future__ import annotations

import pytest

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
