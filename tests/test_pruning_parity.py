"""PruningContentFilter parity: the reference's own test battery
(tests/async/test_content_filter_prune.py), ported verbatim against our
restatement (html/pruning.py). bs4 is absent from this container so the
reference filter cannot be executed directly — its published assertions
are the oracle (provenance + the one documented adaptation:
crawl4ai_spark/html/prune_fixtures.py docstring).
"""

from __future__ import annotations

import pytest

from crawl4ai_spark.html.prune_fixtures import (
    BASIC_HTML,
    DISCRIMINATING_HTML,
    EXPECTED,
    LINK_HEAVY_HTML,
    MALFORMED_HTML,
    MIXED_CONTENT_HTML,
    N_CASES,
    evaluate_case,
)
from crawl4ai_spark.html.pruning import prune_content_blocks


# -- direct ports (reference test names kept) ---------------------------------


def test_basic_pruning():
    contents = prune_content_blocks(BASIC_HTML, min_word_threshold=5)
    combined = " ".join(contents).lower()
    assert "high-quality paragraph" in combined
    assert "sidebar content" not in combined
    assert "share buttons" not in combined


def test_min_word_threshold():
    contents = prune_content_blocks(MIXED_CONTENT_HTML, min_word_threshold=10)
    combined = " ".join(contents).lower()
    assert "short summary" not in combined
    assert "long high-quality paragraph" in combined
    assert "short comment" not in combined


def test_threshold_types():
    # adapted fixture — reference :88-99; rationale in prune_fixtures.py
    fixed = prune_content_blocks(
        DISCRIMINATING_HTML, threshold=0.48, threshold_type="fixed"
    )
    dynamic = prune_content_blocks(
        DISCRIMINATING_HTML, threshold=0.45, threshold_type="dynamic"
    )
    assert len(fixed) != len(dynamic), (
        "Fixed and dynamic thresholds should yield different results"
    )


def test_link_density_impact():
    contents = prune_content_blocks(LINK_HEAVY_HTML, threshold_type="dynamic")
    combined = " ".join(contents).lower()
    assert "good content paragraph" in combined
    assert len([c for c in contents if "href" in c]) < 2, (
        "Should prune link-heavy sections"
    )


def test_tag_importance():
    contents = prune_content_blocks(MIXED_CONTENT_HTML, threshold_type="dynamic")
    has_article = any("article" in c.lower() for c in contents)
    has_h1 = any("h1" in c.lower() for c in contents)
    assert has_article or has_h1, "Should retain important tags"


def test_empty_input():
    assert prune_content_blocks("") == []
    assert prune_content_blocks(None) == []


def test_malformed_html():
    assert isinstance(prune_content_blocks(MALFORMED_HTML), list)


@pytest.mark.parametrize(
    "threshold,expected_count",
    [(0.3, 4), (0.48, 2), (0.7, 1)],
)
def test_threshold_levels(threshold, expected_count):
    contents = prune_content_blocks(
        MIXED_CONTENT_HTML, threshold=threshold, threshold_type="fixed"
    )
    assert len(contents) <= expected_count


def test_consistent_output():
    assert prune_content_blocks(BASIC_HTML) == prune_content_blocks(BASIC_HTML)


# -- the contract surface ------------------------------------------------------


def test_evaluate_cases_match_expected_table():
    got = sorted(r for cid in range(N_CASES) for r in evaluate_case(cid))
    assert got == sorted(EXPECTED)
