"""Property-based tests (hypothesis) for the URL normalizers — the
frontier/seen keys must be stable under re-normalization or the dedup
breaks silently."""

from __future__ import annotations

from urllib.parse import parse_qsl, urlparse

from hypothesis import given, settings
from hypothesis import strategies as st

from crawl4ai_spark.functions.urlnorm import (
    get_base_domain,
    normalize_url,
    normalize_url_for_deep_crawl,
)

label = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=8)
seg = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789-_", min_size=1, max_size=10)
qkey = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=8)
qval = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=0, max_size=8)


@st.composite
def urls(draw):
    host = ".".join(draw(st.lists(label, min_size=2, max_size=4)))
    path = "/" + "/".join(draw(st.lists(seg, min_size=0, max_size=4)))
    pairs = draw(st.lists(st.tuples(qkey, qval), min_size=0, max_size=4))
    q = "&".join(f"{k}={v}" for k, v in pairs)
    frag = draw(st.sampled_from(["", "#frag"]))
    return f"https://{host}{path}" + (f"?{q}" if q else "") + frag


@settings(max_examples=200, deadline=None)
@given(urls())
def test_t2_idempotent(u):
    once = normalize_url_for_deep_crawl(u, u)
    twice = normalize_url_for_deep_crawl(once, once)
    assert once == twice


@settings(max_examples=200, deadline=None)
@given(urls())
def test_t1_idempotent(u):
    once = normalize_url(u, u)
    twice = normalize_url(once, once)
    assert once == twice


@settings(max_examples=200, deadline=None)
@given(urls())
def test_t1_invariants(u):
    n = normalize_url(u + ("&" if "?" in u else "?") + "utm_source=x&gclid=1", u)
    qs = dict(parse_qsl(urlparse(n).query))
    assert "utm_source" not in qs and "gclid" not in qs  # tracking dropped
    assert "#" not in n  # fragment dropped
    keys = [k for k, _ in parse_qsl(urlparse(n).query)]
    assert keys == sorted(keys)  # query keys sorted


@settings(max_examples=200, deadline=None)
@given(urls())
def test_base_domain_suffix_of_host(u):
    host = urlparse(u).netloc.lower().split(":")[0].removeprefix("www.")
    bd = get_base_domain(u)
    assert bd and host.endswith(bd)
