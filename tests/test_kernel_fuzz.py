"""Crash-freedom fuzz for the remaining per-row/per-group executor kernels:
link-preview BM25 + URL-relevance scoring, TextTiling segmentation, and
CSS/XPath schema extraction.

Rationale as in test_extract_fuzz.py: these run inside Arrow-batch tasks
over crawled content; one unhandled exception fails the task and — past
Spark's retry budget — the whole job. The link-preview group kernel
already produced exactly this bug class once (a whitespace-only <title>
group divided by zero), so the scoring kernels get the heaviest fuzz.
Value parity with the reference is covered elsewhere (oracle gate,
transcription unit tests); here we only assert: never raise, and the
cheap structural invariants always hold.
"""

from __future__ import annotations

import math

from crawl4ai_spark.operators.extraction import extract_schema
from crawl4ai_spark.operators.link_preview import (
    _bm25_corpus_scores,
    url_relevance_score,
)
from crawl4ai_spark.operators.texttiling import segment_keywords, texttile_segments

_token = None  # populated lazily inside tests (hypothesis import stays local)


def test_bm25_corpus_scores_never_raise():
    """Arbitrary tokenized groups (non-empty corpus — the caller's
    contract: the group kernel only scores groups with >=1 scorable row).
    Scores must come back one-per-doc and finite — BM25 over finite term
    counts has no legitimate inf/nan outcome, and a nan would poison the
    min-max normalization silently rather than loudly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    token = st.text(min_size=0, max_size=6)
    doc = st.lists(token, max_size=12)

    @settings(max_examples=300, deadline=None)
    @given(st.lists(token, max_size=6), st.lists(doc, min_size=1, max_size=8))
    def check(query_terms, corpus):
        scores = _bm25_corpus_scores(query_terms, corpus)
        assert len(scores) == len(corpus)
        assert all(isinstance(s, float) and math.isfinite(s) for s in scores)

    check()


def test_url_relevance_score_never_raises():
    """Arbitrary query text against arbitrary (often non-URL) strings —
    the fallback scorer sees whatever href survived the link filters."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=40), st.text(max_size=80))
    def check(query, url):
        s = url_relevance_score(query, url)
        assert isinstance(s, float)
        assert 0.0 <= s <= 1.0

    check()


def test_texttiling_never_raises_and_covers_text():
    """Arbitrary text in, segments out: segmentation must never raise, and
    the segments must reassemble to a prefix of the text with only
    whitespace left over (no dropped or duplicated characters)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=250, deadline=None)
    @given(st.text(max_size=800), st.integers(1, 25), st.integers(1, 8))
    def check(text, w, k):
        segs = texttile_segments(text, w=w, k=k)
        assert isinstance(segs, list)
        if text.strip():
            joined = "".join(segs)
            assert text.startswith(joined)
            assert not text[len(joined):].strip()
        else:
            assert segs == []
        for seg in segs:
            assert isinstance(segment_keywords(seg), list)

    check()


def test_schema_extraction_never_raises_on_tag_soup():
    """A fixed VALID schema (invalid selectors are a caller error surfaced
    at plan-build time, not a data hazard) over hostile markup — the
    extraction kernel must degrade to defaults/empties, never raise."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    fields = [
        {"name": "t", "selector": "a", "type": "text"},
        {"name": "href", "selector": "a", "type": "attribute", "attribute": "href"},
        {"name": "price", "selector": ".price", "type": "regex",
         "pattern": r"\$([\d.]+)", "default": ""},
        {"name": "items", "type": "list", "selector": "li",
         "fields": [{"name": "x", "type": "text"}]},
    ]
    frag = st.sampled_from([
        "<ul class='price'>", "<li>", "</li>", "</ul>", "<a href='/x'>",
        "<a href=>", "</a>", "<div class='price'>$9.99", "</div>",
        "<table><td>", "<!--", "-->", "<![CDATA[", "]]>", "<li", ">",
        "text", "$", "9.", "\x00", "\n", "&#xZZ;", "<p class=\"",
        "<script>", "</script>", "li>", "<",
    ])

    @settings(max_examples=250, deadline=None)
    @given(st.lists(frag, max_size=25))
    def check(parts):
        doc = "".join(parts)
        for engine, base in (("css", "ul li"), ("xpath", ".//li")):
            recs = extract_schema(doc, base, fields, engine=engine)
            assert isinstance(recs, list)
            for rec in recs:
                assert set(rec) <= {"t", "href", "price", "items"}

    check()
