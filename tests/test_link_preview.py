"""Unit tests for the link-preview 3-score system (operators/link_preview.py).

The driver's `link_extract` oracle covers the default path (include_internal,
BM25 scoring, total-score blend) value-exactly; these tests cover the
configuration branches the oracle can't reach: include/exclude fnmatch
patterns, the max_links cap ordering (internal before external),
score_threshold dropping, score_links=False, the URL-relevance fallback for
context-less valid targets, and the head-text context extraction order.

Reference: link_preview.py:120-176 (_filter_links), async_url_seeder.py:
1143-1194 (_extract_text_context), :1196-1290 (_calculate_url_relevance_score),
utils.py:3238-3283 (calculate_total_score).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.link_preview import (
    head_text_context_col,
    link_preview_scores,
    url_relevance_score,
)


def _links(spark, rows=None):
    rows = rows if rows is not None else [
        # (src_url, href, link_text, is_external, intrinsic_score, ord)
        ("https://a.test/", "https://a.test/p1", "page one", False, 3.0, 0),
        ("https://a.test/", "https://a.test/p2", "page two", False, 2.5, 1),
        ("https://a.test/", "https://other.test/x", "ext link", True, 2.0, 2),
        ("https://a.test/", "https://a.test/missing", "gone", False, 1.0, 3),
    ]
    return spark.createDataFrame(
        rows, "src_url string, href string, link_text string, "
        "is_external boolean, intrinsic_score double, ord int"
    )


def _pages(spark, rows=None):
    rows = rows if rows is not None else [
        ("https://a.test/p1",
         "<html><head><title>Spark crawl engine</title>"
         '<meta name="description" content="distributed spark pipeline">'
         "</head><body>b</body></html>"),
        ("https://a.test/p2",
         "<html><head><title>Cooking recipes</title>"
         '<meta name="description" content="pasta and soup">'
         "</head><body>b</body></html>"),
        ("https://other.test/x",
         "<html><head><title>External spark doc</title></head><b>x</b></html>"),
    ]
    return spark.createDataFrame(rows, "url string, html_str string")


def _by_href(df):
    return {r["href"]: r.asDict() for r in df.collect()}


class TestFilters:
    def test_external_links_unselected_by_default(self, spark):
        out = _by_href(link_preview_scores(_links(spark), _pages(spark)))
        ext = out["https://other.test/x"]
        # reference leaves unselected links untouched: no status, no totals
        assert ext["head_status"] is None
        assert ext["contextual_score"] is None
        assert ext["total_score"] is None
        # selected + found in corpus -> valid; selected + missing -> not_valid
        assert out["https://a.test/p1"]["head_status"] == "valid"
        assert out["https://a.test/missing"]["head_status"] == "not_valid"

    def test_include_external(self, spark):
        out = _by_href(
            link_preview_scores(
                _links(spark), _pages(spark), include_external=True
            )
        )
        assert out["https://other.test/x"]["head_status"] == "valid"

    def test_fnmatch_include_exclude(self, spark):
        out = _by_href(
            link_preview_scores(
                _links(spark), _pages(spark),
                include_patterns=["*a.test/p*"],
                exclude_patterns=["*p2*"],
            )
        )
        assert out["https://a.test/p1"]["head_status"] == "valid"
        assert out["https://a.test/p2"]["head_status"] is None  # excluded
        assert out["https://a.test/missing"]["head_status"] is None  # not included

    def test_fnmatch_is_start_anchored(self, spark):
        """fnmatch.fnmatch anchors at position 0 (re.match); a pattern
        without a leading '*' must NOT match mid-URL the way a bare
        rlike would."""
        out = _by_href(
            link_preview_scores(
                _links(spark), _pages(spark),
                include_patterns=["p1*"],  # fnmatch: matches NO full URL
            )
        )
        assert all(r["head_status"] is None for r in out.values())
        out2 = _by_href(
            link_preview_scores(
                _links(spark), _pages(spark),
                include_patterns=["https://a.test/p1"],
            )
        )
        assert out2["https://a.test/p1"]["head_status"] == "valid"
        assert out2["https://a.test/p2"]["head_status"] is None

    def test_max_links_caps_internal_before_external(self, spark):
        # reference concatenates internal-then-external before the cap
        # (link_preview.py:126-162): cap=2 keeps the two internal links even
        # though the external one has an earlier discovery order than p2
        rows = [
            ("https://a.test/", "https://other.test/x", "ext", True, 2.0, 0),
            ("https://a.test/", "https://a.test/p1", "one", False, 3.0, 1),
            ("https://a.test/", "https://a.test/p2", "two", False, 2.5, 2),
        ]
        out = _by_href(
            link_preview_scores(
                _links(spark, rows), _pages(spark),
                include_external=True, max_links=2,
            )
        )
        assert out["https://a.test/p1"]["head_status"] == "valid"
        assert out["https://a.test/p2"]["head_status"] == "valid"
        assert out["https://other.test/x"]["head_status"] is None


class TestScoring:
    def test_score_links_false_gives_flat_5(self, spark):
        out = _by_href(
            link_preview_scores(
                _links(spark), _pages(spark), query="spark", score_links=False
            )
        )
        assert out["https://a.test/p1"]["total_score"] == 5.0
        assert out["https://other.test/x"]["total_score"] is None  # unselected

    def test_no_query_total_is_clamped_intrinsic(self, spark):
        rows = [
            ("https://a.test/", "https://a.test/p1", "one", False, 12.0, 0),
            ("https://a.test/", "https://a.test/p2", "two", False, -1.0, 1),
        ]
        out = _by_href(link_preview_scores(_links(spark, rows), _pages(spark)))
        assert out["https://a.test/p1"]["total_score"] == 10.0  # clamped high
        assert out["https://a.test/p2"]["total_score"] == 0.0  # clamped low
        assert out["https://a.test/p1"]["contextual_score"] is None

    def test_bm25_blend_and_group_minmax(self, spark):
        # 3-doc group so 'spark' (df=1) has positive idf — with N=2, df=1
        # BM25Okapi's idf is ln((2-1+.5)/(1+.5)) = 0 and min-max degenerates
        links = _links(spark, [
            ("https://a.test/", "https://a.test/p1", "one", False, 3.0, 0),
            ("https://a.test/", "https://a.test/p2", "two", False, 2.5, 1),
            ("https://a.test/", "https://a.test/p3", "three", False, 2.5, 2),
            ("https://a.test/", "https://a.test/missing", "gone", False, 1.0, 3),
        ])
        pages = _pages(spark, [
            ("https://a.test/p1",
             "<html><head><title>Spark crawl engine</title>"
             '<meta name="description" content="distributed spark pipeline">'
             "</head><body>b</body></html>"),
            ("https://a.test/p2",
             "<html><head><title>Cooking recipes</title>"
             '<meta name="description" content="pasta and soup">'
             "</head><body>b</body></html>"),
            ("https://a.test/p3",
             "<html><head><title>Gardening tips</title>"
             '<meta name="description" content="roses and tulips">'
             "</head><body>b</body></html>"),
        ])
        out = _by_href(link_preview_scores(links, pages, query="spark"))
        p1, p2 = out["https://a.test/p1"], out["https://a.test/p2"]
        # p1's head mentions 'spark' twice, the others not at all: after
        # min-max over the 3-doc group p1 is 1 and the zero-scores are 0
        assert p1["contextual_score"] == pytest.approx(1.0)
        assert p2["contextual_score"] == pytest.approx(0.0)
        assert p1["total_score"] == pytest.approx(
            min(max(3.0 * 0.7 + min(1.0 * 10, 10.0) * 0.3, 0.0), 10.0)
        )
        # not_valid target: no context -> total falls back to intrinsic
        assert out["https://a.test/missing"]["contextual_score"] is None
        assert out["https://a.test/missing"]["total_score"] == 1.0

    def test_context_less_valid_target_uses_url_relevance(self, spark):
        pages = _pages(spark, [
            # head present but yields no text context (no title, no metas)
            ("https://a.test/spark-docs", "<html><head></head><b>x</b></html>"),
        ])
        rows = [("https://a.test/", "https://a.test/spark-docs", "d", False, 2.5, 0)]
        out = _by_href(
            link_preview_scores(_links(spark, rows), pages, query="spark docs")
        )
        got = out["https://a.test/spark-docs"]
        assert got["head_status"] == "valid"
        assert got["contextual_score"] == pytest.approx(
            url_relevance_score("spark docs", "https://a.test/spark-docs")
        )

    def test_score_threshold_drops_to_untouched(self, spark):
        links = _links(spark, [
            ("https://a.test/", "https://a.test/p1", "one", False, 3.0, 0),
            ("https://a.test/", "https://a.test/p2", "two", False, 2.5, 1),
            ("https://a.test/", "https://a.test/p3", "three", False, 2.5, 2),
            ("https://a.test/", "https://a.test/missing", "gone", False, 1.0, 3),
        ])
        pages = _pages(spark, [
            ("https://a.test/p1",
             "<html><head><title>Spark crawl engine</title></head></html>"),
            ("https://a.test/p2",
             "<html><head><title>Cooking recipes</title></head></html>"),
            ("https://a.test/p3",
             "<html><head><title>Gardening tips</title></head></html>"),
        ])
        out = _by_href(
            link_preview_scores(links, pages, query="spark", score_threshold=0.9)
        )
        # p2/p3 scored 0.0 < 0.9 -> dropped entirely, merge back untouched
        p2 = out["https://a.test/p2"]
        assert p2["head_status"] is None
        assert p2["contextual_score"] is None
        assert p2["total_score"] is None
        # missing target has no score (counts as 0) -> also dropped
        assert out["https://a.test/missing"]["head_status"] is None
        assert out["https://a.test/p1"]["head_status"] == "valid"

    def test_whitespace_only_contexts_score_zero(self, spark):
        """A whitespace-only <title> yields a non-empty context that
        tokenizes to zero tokens. The reference's own guard
        (async_url_seeder.py:1396-1398) returns [0.0]*n for an all-empty
        tokenized batch BEFORE BM25Okapi and BEFORE min-max — so these
        links score exactly 0.0 (NOT the all-equal min-max 0.5), and the
        executor must not see rank_bm25's ZeroDivisionError."""
        pages = _pages(spark, [
            ("https://a.test/p1",
             "<html><head><title>   </title></head><b>x</b></html>"),
            ("https://a.test/p2",
             "<html><head><title>\t </title></head><b>y</b></html>"),
        ])
        rows = [
            ("https://a.test/", "https://a.test/p1", "one", False, 3.0, 0),
            ("https://a.test/", "https://a.test/p2", "two", False, 2.5, 1),
        ]
        out = _by_href(
            link_preview_scores(_links(spark, rows), pages, query="spark")
        )
        assert out["https://a.test/p1"]["contextual_score"] == 0.0
        assert out["https://a.test/p2"]["contextual_score"] == 0.0

    def test_single_doc_group_minmax_degenerates_to_half(self, spark):
        rows = [("https://a.test/", "https://a.test/p1", "one", False, 3.0, 0)]
        out = _by_href(
            link_preview_scores(_links(spark, rows), _pages(spark), query="spark")
        )
        assert out["https://a.test/p1"]["contextual_score"] == 0.5

    def test_threshold_without_query_drops_all_selected(self, spark):
        """extract_head_for_urls applies score_threshold unconditionally
        (async_url_seeder.py:630-631): with no query, no result carries a
        relevance_score, so get('relevance_score', 0) >= threshold drops
        EVERY selected link for any positive threshold — they merge back
        untouched (all three outputs NULL), like never-selected links."""
        out = _by_href(
            link_preview_scores(
                _links(spark), _pages(spark), query=None, score_threshold=0.3
            )
        )
        for href in ("https://a.test/p1", "https://a.test/p2",
                     "https://a.test/missing"):
            assert out[href]["head_status"] is None
            assert out[href]["contextual_score"] is None
            assert out[href]["total_score"] is None
        # threshold 0.0 keeps everything (0 >= 0), scores as usual
        out0 = _by_href(
            link_preview_scores(
                _links(spark), _pages(spark), query=None, score_threshold=0.0
            )
        )
        assert out0["https://a.test/p1"]["head_status"] == "valid"
        assert out0["https://a.test/p1"]["total_score"] == 3.0

    def test_multi_capture_pages_do_not_fan_out(self, spark):
        """A WARC-style corpus holding several captures of one URL must
        not duplicate output link rows or double-count that head in the
        per-page BM25 corpus: the head join collapses to one
        deterministic capture per href (lexicographic max head without
        warc_ts — the same collapse the crawl fetch join makes)."""
        pages = _pages(spark, [
            ("https://a.test/p1",
             "<html><head><title>AAA old capture</title></head></html>"),
            ("https://a.test/p1",
             "<html><head><title>ZZZ new capture spark</title></head></html>"),
            ("https://a.test/p2",
             "<html><head><title>Cooking recipes</title></head></html>"),
            ("https://a.test/p3",
             "<html><head><title>Gardening tips</title></head></html>"),
        ])
        rows = [
            ("https://a.test/", "https://a.test/p1", "one", False, 3.0, 0),
            ("https://a.test/", "https://a.test/p2", "two", False, 2.5, 1),
            ("https://a.test/", "https://a.test/p3", "three", False, 2.0, 2),
        ]
        res = link_preview_scores(_links(spark, rows), pages, query="spark")
        collected = res.collect()
        assert len(collected) == 3  # one row per input link, no fan-out
        out = {r["href"]: r.asDict() for r in collected}
        # the lexicographic max head ('ZZZ...' > 'AAA...') carries 'spark'
        # -> p1 tops the 3-doc BM25 group (df=1 of 3: positive idf)
        assert out["https://a.test/p1"]["contextual_score"] == 1.0
        assert out["https://a.test/p2"]["contextual_score"] == 0.0
        assert out["https://a.test/p3"]["contextual_score"] == 0.0

    def test_multi_capture_prefers_latest_warc_ts(self, spark):
        """When the pages frame carries warc_ts, the collapse keeps the
        LATEST capture (not the lexicographic max head)."""
        pages = spark.createDataFrame(
            [
                ("https://a.test/p1",
                 "<html><head><title>ZZZ stale spark spark</title></head></html>",
                 "2020-01-01 00:00:00"),
                ("https://a.test/p1",
                 "<html><head><title>AAA fresh cooking</title></head></html>",
                 "2024-01-01 00:00:00"),
                ("https://a.test/p2",
                 "<html><head><title>unrelated words</title></head></html>",
                 "2024-01-01 00:00:00"),
                ("https://a.test/p3",
                 "<html><head><title>gardening tips</title></head></html>",
                 "2024-01-01 00:00:00"),
            ],
            "url string, html_str string, warc_ts string",
        ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
        rows = [
            ("https://a.test/", "https://a.test/p1", "one", False, 3.0, 0),
            ("https://a.test/", "https://a.test/p2", "two", False, 2.5, 1),
            ("https://a.test/", "https://a.test/p3", "three", False, 2.0, 2),
        ]
        out = _by_href(
            link_preview_scores(_links(spark, rows), pages, query="cooking")
        )
        # the FRESH p1 head carries 'cooking' -> p1 tops the 3-doc group.
        # Had the stale (lexicographically larger ZZZ) capture won the
        # collapse, 'cooking' would miss p1's vocabulary too and the
        # all-equal group would min-max everyone to 0.5.
        assert out["https://a.test/p1"]["contextual_score"] == 1.0
        assert out["https://a.test/p2"]["contextual_score"] == 0.0
        assert out["https://a.test/p3"]["contextual_score"] == 0.0


class TestHeadTextContext:
    def _ctx(self, spark, head: str) -> str:
        df = spark.createDataFrame([(head,)], "h string")
        return df.select(head_text_context_col(F.col("h")).alias("c")).first()["c"]

    def test_title_then_meta_reference_order(self, spark):
        head = (
            '<meta property="og:description" content="OGD">'
            '<meta name="description" content="DESC">'
            "<title>TTL</title>"
            '<meta name="keywords" content="KW">'
        )
        # reference order: title, description, keywords, ..., og:description
        assert self._ctx(spark, head) == "TTL DESC KW OGD"

    def test_last_meta_wins_and_empty_skipped(self, spark):
        head = (
            "<title>T</title>"
            '<meta name="description" content="first">'
            '<meta name="description" content="second">'
        )
        assert self._ctx(spark, head) == "T second"
        assert self._ctx(spark, "<b>no head content</b>") == ""


class TestUrlRelevance:
    """Value checks on the _calculate_url_relevance_score transcription
    (async_url_seeder.py:1196-1290)."""

    def test_exact_part_match(self):
        # query 'docs' == path part 'docs' -> substring both ways: 1.0 hit
        # plus token-coverage and trigram contributions; bounded by 1.0
        s = url_relevance_score("docs", "https://a.test/docs")
        assert 0.0 < s <= 1.0
        # hand-computed: parts = [a.test (split: a.test? no — netloc split
        # on '.') ...] — assert monotonicity instead of brittle constants:
        assert s > url_relevance_score("docs", "https://a.test/other")

    def test_no_match_zero(self):
        assert url_relevance_score("zzz", "https://a.test/p1") == 0.0
        # reference quirk preserved: '' is a substring of every URL part, so
        # an empty query scores a perfect 1.0 (async_url_seeder.py:1240-1244)
        assert url_relevance_score("", "https://a.test/p1") == 1.0

    def test_weighted_rank_average_formula(self):
        # single matching part: exact formula check
        # query 'abc', url path part 'abc' -> scores [1.0 (substring),
        # 0.7*3/3 (token coverage)] + trigram jaccard over 'a abc' vs 'abc'
        q, url = "abc", "https://x.y/abc"
        s = url_relevance_score(q, url)
        parts = ["x.y", "abc"]  # domain 'x.y' splits to ['x','y']; recompute:
        # replicate the transcription independently
        from urllib.parse import urlparse
        p = urlparse(url)
        domain_parts = p.netloc.replace("www.", "").split(".")
        all_parts = domain_parts + [pp for pp in p.path.strip("/").split("/") if pp]
        scores = []
        ql = q.lower()
        for part in all_parts:
            pl = part.lower()
            if ql in pl:
                scores.append(1.0)
            elif pl in ql:
                scores.append(0.9)
        for token in ql.split():
            ts = []
            for part in all_parts:
                pl = part.lower()
                if token in pl:
                    ts.append(0.7 * len(token) / len(pl))
                elif pl in token:
                    ts.append(0.6 * len(pl) / len(token))
            if ts:
                scores.append(max(ts))
        url_text = " ".join(all_parts).lower()
        if len(ql) >= 3 and len(url_text) >= 3:
            qn = {ql[i:i + 3] for i in range(len(ql) - 2)}
            un = {url_text[i:i + 3] for i in range(len(url_text) - 2)}
            if qn and un:
                union = len(qn | un)
                scores.append(0.5 * (len(qn & un) / union if union else 0))
        scores.sort(reverse=True)
        expect = min(
            sum(v / (i + 1) for i, v in enumerate(scores))
            / sum(1 / (i + 1) for i in range(len(scores))),
            1.0,
        ) if scores else 0.0
        assert s == pytest.approx(expect)
        assert not math.isnan(s)
