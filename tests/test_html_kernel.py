"""Extraction kernel unit tests: parser, scrape, markdown, pruning.

Test style mirrors the reference's own suites (golden substrings + counts on
fixture HTML — tests/async/test_content_filter_prune.py,
test_content_scraper_strategy.py), re-hosted over our stdlib kernel.
"""

from __future__ import annotations

from crawl4ai_spark.html import (
    html_to_markdown,
    links_to_citations,
    parse_html,
    prune_fit_html,
    scrape_page,
)

FIXTURE = """<html lang="de"><head>
<title>Fixture Page</title>
<meta name="description" content="a test page">
<meta property="og:title" content="OG Fixture">
<script>var x = 1;</script>
<style>.a { color: red }</style>
</head><body>
<nav class="nav"><a href="/">home</a> <a href="/about">about</a></nav>
<article>
<h1>Main Heading</h1>
<p>This is the main article body with enough words to be considered real
content by any density heuristic. It talks about crawling, parsing and
markdown generation at length, sentence after sentence.</p>
<p>Second paragraph with <strong>bold</strong> and <em>italic</em> and
<code>inline code</code> and a <a href="deep/page.html" title="t">relative link</a>.</p>
<pre><code>def f():
    return 1</code></pre>
<ul><li>alpha</li><li>beta</li></ul>
<table><thead><tr><th>col1</th><th>col2</th></tr></thead>
<tbody><tr><td>v1</td><td>v2</td></tr><tr><td>v3</td><td>v4</td></tr></tbody></table>
<img src="/big.png" alt="big image" width="400" height="300">
<img src="/tiny.gif" width="10" height="10">
<a href="https://other.example/x?utm_source=t&z=1&a=2#f">external tracked</a>
</article>
<div class="sidebar">short ad text</div>
<footer class="footer">copyright boilerplate</footer>
</body></html>"""

URL = "https://www.site.example/dir/page.html"


def test_parser_roundtrip():
    root = parse_html("<div a=1><p>x <b>y</b></p></div>")
    assert root.find("b").text() == "y"
    assert root.find("div").attrs["a"] == "1"
    # bs4-parity: get_text(strip=True) concatenates stripped runs with no
    # separator, so 'x <b>y</b>' is 'xy' — ONE word, the count the
    # reference's word_count_threshold prune actually uses
    assert root.find("p").word_count() == 1
    assert parse_html("<p>two words</p>").find("p").word_count() == 2


def test_parser_malformed():
    # unclosed + misnested tags must not crash and still yield text
    root = parse_html("<div><p>one<span>two</div></p>three")
    assert "one" in root.text() and "two" in root.text()


def test_scrape_metadata_and_lang():
    r = scrape_page(FIXTURE, URL)
    assert r["success"]
    assert r["lang"] == "de"
    assert r["metadata"]["title"] == "Fixture Page"
    assert r["metadata"]["description"] == "a test page"
    assert r["metadata"]["og:title"] == "OG Fixture"


def test_scrape_links():
    r = scrape_page(FIXTURE, URL)
    hrefs = {l["href"]: l for l in r["links"]}
    # relative resolved
    assert "https://www.site.example/dir/deep/page.html" in hrefs
    # tracking params dropped + sorted by the link normalizer (T1)
    assert "https://other.example/x?a=2&z=1" in hrefs
    ext = hrefs["https://other.example/x?a=2&z=1"]
    assert ext["is_external"] is True
    internal = hrefs["https://www.site.example/dir/deep/page.html"]
    assert internal["is_external"] is False
    assert internal["title"] == "t"


def test_scrape_media_scoring():
    r = scrape_page(FIXTURE, URL)
    srcs = [m["src"] for m in r["media"]]
    assert "/big.png" in srcs  # large + alt + format → kept
    assert "/tiny.gif" not in srcs  # tiny, no alt → dropped


def test_scrape_tables():
    r = scrape_page(FIXTURE, URL)
    assert len(r["tables"]) == 1
    t = r["tables"][0]
    assert t["headers"] == ["col1", "col2"]
    assert t["rows"] == [["v1", "v2"], ["v3", "v4"]]


def test_scrape_removes_script_style():
    r = scrape_page(FIXTURE, URL)
    assert "var x" not in r["cleaned_html"]
    assert "color: red" not in r["cleaned_html"]
    assert "var x" not in r["text"]


def test_markdown_blocks():
    r = scrape_page(FIXTURE, URL)
    md = html_to_markdown(r["cleaned_html"])
    assert "# Main Heading" in md
    assert "**bold**" in md
    assert "_italic_" in md
    assert "`inline code`" in md
    assert "[relative link](deep/page.html \"t\")" in md
    # NB: cleaned_html's whitespace squeeze (replace("  "," "), one pass —
    # same quirk as the reference's cleanup, content_scraping_strategy.py:1089)
    # halves the 4-space indent before markdown sees it.
    assert "```\ndef f():\n  return 1\n```" in md
    assert "* alpha" in md and "* beta" in md
    assert "col1| col2" in md and "---|---" in md
    assert "v1| v2" in md
    assert "![big image](/big.png)" in md


def test_citations():
    md = "see [one](https://a.example/1) and [two](https://a.example/2) and [one again](https://a.example/1)"
    cited, refs = links_to_citations(md, "")
    assert "one⟨1⟩" in cited and "two⟨2⟩" in cited and "one again⟨1⟩" in cited
    assert "## References" in refs
    assert "⟨1⟩ https://a.example/1: one" in refs
    assert "⟨2⟩ https://a.example/2: two" in refs


def test_citations_relative_join():
    md = "[x](deep/a.html)"
    cited, refs = links_to_citations(md, URL)
    assert "⟨1⟩ https://www.site.example/dir/deep/a.html" in refs


def test_pruning_keeps_article_drops_chrome():
    blocks, fit_html = prune_fit_html(FIXTURE)
    joined = "\n".join(blocks)
    assert "main article body" in joined
    assert "home" not in joined  # nav removed as an excluded tag
    assert "copyright" not in joined  # footer removed as an excluded tag
    # EXACT reference semantics: the short sidebar div SURVIVES — its text
    # density is high, and the class/id metric is max(0, ·)-floored so a
    # negative class can never sink a node (content_filter_strategy.py:762)
    assert "short ad text" in joined
    assert fit_html.startswith("<div>")


def test_pruning_drops_link_farms():
    farm = (
        "<body><article><p>Real content paragraph with plenty of words to"
        " keep the density credible and long.</p></article>"
        "<div><a href='/1'>x</a> <a href='/2'>y</a> <a href='/3'>z</a></div>"
        "</body>"
    )
    blocks, _ = prune_fit_html(farm)
    joined = "\n".join(blocks)
    assert "Real content" in joined
    assert "href='/1'" not in joined and '/1' not in joined


def test_pruning_min_word_threshold_and_dynamic():
    html = "<body><p>one two three</p><p>longer paragraph with many words present here</p></body>"
    keep_all, _ = prune_fit_html(html, threshold=0.1)
    assert len(keep_all) == 2
    few, _ = prune_fit_html(html, threshold=0.1, min_word_threshold=4)
    assert len(few) == 1 and "longer paragraph" in few[0]
    dyn, _ = prune_fit_html(FIXTURE, threshold_type="dynamic")
    assert any("main article body" in b for b in dyn)


def test_pruning_deterministic():
    a = prune_fit_html(FIXTURE)
    b = prune_fit_html(FIXTURE)
    assert a == b


def test_pruning_threshold_monotone():
    lo, _ = prune_fit_html(FIXTURE, threshold=0.1)
    hi, _ = prune_fit_html(FIXTURE, threshold=0.9)
    assert len("".join(hi)) <= len("".join(lo))


def test_scrape_empty_and_garbage():
    assert scrape_page("", URL)["success"]
    r = scrape_page("<<<%%% not html at all", URL)
    assert r["success"]
    assert r["links"] == []


def test_extract_pages_spark(pages, spark):
    from pyspark.sql import functions as F

    from crawl4ai_spark.plans import extract_pages

    out = extract_pages(pages.limit(50)).cache()
    assert out.count() == 50
    agg = out.select(
        F.sum(F.when(F.col("scrape.lang") == F.col("lang"), 1).otherwise(0)).alias("lang_ok"),
        F.sum(F.size("scrape.links")).alias("links"),
        F.sum(F.size("scrape.tables")).alias("tables"),
    ).collect()[0]
    assert agg.lang_ok == 50
    assert agg.links == 50 * 6
    assert agg.tables == 50
    row = out.select("markdown.*").first()
    assert row.raw_markdown and "# Heading" in row.raw_markdown
    assert "⟨1⟩" in row.markdown_with_citations or "⟨1⟩" in row.references_markdown


def test_scrape_config_knobs():
    """T5/T6 config surface vs reference semantics
    (content_scraping_strategy.py:845-1097)."""
    r = scrape_page(
        FIXTURE, URL,
        excluded_tags=["nav", "footer"],
        excluded_selector=".sidebar",
        exclude_external_links=True,
    )
    c = r["cleaned_html"]
    assert "<nav" not in c and "home" not in c
    assert "copyright boilerplate" not in c
    assert "short ad text" not in c
    # external tracked link excluded from both tree and links list
    assert "other.example" not in c
    assert all(not lk["is_external"] for lk in r["links"])
    # attribute whitelist: class/id gone, src/href/alt/title/width/height kept
    assert "class=" not in c
    assert 'src="/big.png"' in c and 'width="400"' in c


def test_scrape_attr_whitelist_and_keep_attrs():
    html = '<body><p class="x" data-k="v" id="p1" title="t">words here</p></body>'
    c1 = scrape_page(html, URL)["cleaned_html"]
    assert "class=" not in c1 and "data-k" not in c1 and 'title="t"' in c1
    c2 = scrape_page(html, URL, keep_attrs=["id"], keep_data_attributes=True)["cleaned_html"]
    assert 'id="p1"' in c2 and 'data-k="v"' in c2
    c3 = scrape_page(html, URL, prune_attrs=False)["cleaned_html"]
    assert 'class="x"' in c3


def test_scrape_word_count_threshold():
    html = "<body><div><p>one two</p></div><div><span></span></div></body>"
    c = scrape_page(html, URL, word_count_threshold=2)["cleaned_html"]
    assert "one two" in c
    assert "<span>" not in c  # empty wrapper pruned


def test_scrape_flatten_and_base64():
    html = ('<body><div><div><p>deep text</p></div></div>'
            '<img src="data:image/png;base64,AAAA" alt="b64" width="200" height="200">'
            '</body>')
    c = scrape_page(html, URL)["cleaned_html"]
    assert c.count("<div>") == 1  # same-tag nesting flattened
    assert "base64,AAAA" not in c  # base64 payload stripped
    assert 'alt="b64"' in c


def test_scrape_only_text():
    html = "<body><p>keep <b>bold</b> and <span>span</span> text</p></body>"
    c = scrape_page(html, URL, only_text=True)["cleaned_html"]
    assert "<b>" not in c and "<span>" not in c
    assert "bold" in c and "span" in c


def test_link_intrinsic_score_exact_formula():
    """Exact restatement of utils.py:3123-3237 on hand-computed cases."""
    from crawl4ai_spark.html.scrape import extract_page_context, link_intrinsic_score

    ctx = extract_page_context("Spark Guide", "Intro Heading", "about spark", 
                               "https://docs.site.example/x")
    assert ctx["is_docs_site"]
    assert "spark" in ctx["terms"] and "guide" in ctx["terms"]
    # https(0.5) + depth<=2(1.0) + /guide/(2.0) + text>3(1.0) + 2words(0.5)
    # + overlap {spark,guide}/2*2 (2.0) + docs-site keyword 'guide' (1.0) = 8.0
    s = link_intrinsic_score("spark guide", "https://docs.site.example/guide/a",
                             "", "", "", ctx)
    assert abs(s - 8.0) < 1e-9
    # generic text penalty + no-context baseline
    s2 = link_intrinsic_score("here", "http://x.example/a/b/c/d/e/f/g", "", "", "", {})
    # depth 7 > 5 (-0.5), no https, len('here')>3 (+1.0), 1 word, generic (-1.0)
    assert abs(s2 - (-0.5 + 1.0 - 1.0 + 0.0)) < 1e-9 or s2 == 0.0
    assert s2 == 0.0  # clamped at 0
    s3 = link_intrinsic_score("x", "https://a.example/", "Long Title Here",
                              "menu primary", "nofollow", {})
    # title(1.0) + nav class(1.5) + bad rel(-0.5) + depth(1.0) + https(0.5)
    assert abs(s3 - 3.5) < 1e-9


def test_extract_fit_filter_choice(pages, spark):
    from pyspark.sql import functions as F

    from crawl4ai_spark.plans import extract_pages

    sample = pages.limit(5)
    bm25 = extract_pages(sample, fit_filter="bm25", bm25_threshold=0.5,
                         use_stemming=False)
    none = extract_pages(sample, fit_filter=None)
    b = bm25.select(F.sum(F.length("markdown.fit_markdown")).alias("n")).first()
    z = none.select(F.sum(F.length("markdown.fit_markdown")).alias("n")).first()
    assert b.n > 0      # bm25 filter produced fit content
    assert z.n == 0     # reference default: no filter -> empty fit output


def test_content_relevance_matches_reference_formula(spark):
    """Differential: the Catalyst head-BM25 column vs a direct Python
    transcription of the reference's ContentRelevanceFilter
    (deep_crawling/filters.py:501-575 + utils.py HeadPeekr:2840-2861) —
    including heads with og:/twitter:/author metas, which feed the
    'all meta values' term of the weighted document."""
    import math
    import re

    from pyspark.sql import functions as F

    from crawl4ai_spark.operators.filters import content_relevance_score_col

    def ref_score(head: str, query: str, k1=1.2, b=0.75, avgdl=1000) -> float:
        m = re.search(r"<title>(.*?)</title>", head, re.IGNORECASE | re.DOTALL)
        title = m.group(1) if m else ""
        metas: dict[str, str] = {}
        for mt in re.finditer(r"<meta[^>]+>", head):
            tag = mt.group(0)
            name = re.search(r'name=["\'](.*?)["\']', tag)
            prop = re.search(r'property=["\'](.*?)["\']', tag)
            content = re.search(r'content=["\'](.*?)["\']', tag)
            if content and (name or prop):
                metas[(name or prop).group(1)] = content.group(1)
        doc = " ".join(
            [
                title * 3,
                metas.get("description", "") * 2,
                metas.get("keywords", ""),
                " ".join(metas.values()),
            ]
        )
        toks = doc.lower().split()
        tf: dict[str, int] = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        score = 0.0
        for term in set(query.lower().split()):
            f = tf.get(term, 0)
            idf = math.log((1 + 1) / (f + 0.5) + 1)
            score += idf * (f * (k1 + 1)) / (
                f + k1 * (1 - b + b * (len(toks) / avgdl))
            )
        return score

    heads = [
        '<html><head><title>Spark crawl guide</title>'
        '<meta name="description" content="deep crawl spark pages">'
        '<meta name="keywords" content="crawl, spark"></head>',
        '<html><head><title>OG page</title>'
        '<meta property="og:title" content="spark spark spark">'
        '<meta name="author" content="crawl author">'
        '<meta name="twitter:card" content="summary spark"></head>',
        "<html><head><title>Sparse</title></head>",
        '<html><head><title>Quotes</title>'
        "<meta name='description' content='single quoted spark'></head>",
    ]
    query = "spark crawl zebra"
    df = spark.createDataFrame([(h,) for h in heads], "head string")
    got = {
        r.head: r.score
        for r in df.select(
            "head",
            content_relevance_score_col(F.col("head"), query).alias("score"),
        ).collect()
    }
    for h in heads:
        assert abs(got[h] - ref_score(h, query)) < 1e-9, h
    # the og:/author head must actually differ from a desc+kw-only reading
    assert got[heads[1]] > 0.0


def test_image_quick_validation_excludes_logos_and_hidden():
    """Reference parity (content_scraping_strategy.py:463-470): hidden,
    button-parented, and logo/icon/button images never reach the media
    list regardless of score."""
    from crawl4ai_spark.html.scrape import scrape_page

    html = (
        "<html><body>"
        '<img src="/logo.png" width="300" height="300" alt="Company logo">'
        '<img src="/hero.png" width="300" height="300" alt="A hero image">'
        '<img src="/h2.png" width="300" height="300" alt="kept" style="display:none">'
        '<button><img src="/b.png" width="300" height="300" alt="inside button"></button>'
        "</body></html>"
    )
    out = scrape_page(html, "https://e.example/p")
    assert [m["src"] for m in out["media"]] == ["/hero.png"]
