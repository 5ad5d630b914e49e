"""Full BM25 content filter (SURVEY.md §2.3 T14).

From-scratch restatement of the reference's BM25ContentFilter
(behavioral spec: /root/reference/crawl4ai/content_filter_strategy.py:381-530
— DOM-walk chunker :161-271, page-query extraction :125-160, element
cleaning :329-379; token cleaning utils.py:2405-2632) over the stdlib
DOM-lite tree, with the Okapi BM25 ranking function (public algorithm:
Robertson/Spärck Jones; parameterization matching the rank_bm25 package's
BM25Okapi defaults k1=1.5, b=0.75, epsilon=0.25) and a from-scratch
English Snowball (porter2) stemmer.

Pure Python — runs inside Arrow pandas UDFs.
"""

from __future__ import annotations

import math

from crawl4ai_spark.html.parser import Node, parse_html

# inline elements that don't break text flow (spec :175-208)
INLINE_TAGS = frozenset(
    "a abbr acronym b bdo big br button cite code dfn em i img input kbd "
    "label map object q samp script select small span strong sub sup "
    "textarea time tt var".split()
)
HEADER_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6", "header"})

PRIORITY_TAGS = {
    "h1": 5.0, "h2": 4.0, "h3": 3.0, "title": 4.0, "strong": 2.0, "b": 1.5,
    "em": 1.5, "blockquote": 2.0, "code": 2.0, "pre": 1.5, "th": 1.5,
}

_NOISE = {"ccp", "up", "↑", "▲", "⬆️", "a", "an", "at", "by", "in", "of",
          "on", "to", "the"}

STOP_WORDS = frozenset(
    """a an and are as at be by for from has he in is it its of on that the
    to was were will with i you she we they me him her us them my your his
    our their mine yours hers ours theirs myself yourself himself herself
    itself ourselves themselves am been being have had having do does did
    doing about above across after against along among around before behind
    below beneath beside between beyond down during except inside into near
    off out outside over past through toward under underneath until up upon
    within but or nor yet so although because since unless this that these
    those what which who whom whose when where why how all any both each few
    more most other some such can cannot can't could couldn't may might must
    mustn't shall should shouldn't won't would wouldn't not n't no none""".split()
)


def clean_tokens(tokens: list[str]) -> list[str]:
    """len>2, not noise/stopword, not an arrow glyph (utils.py:2405-2632)."""
    return [
        t
        for t in tokens
        if len(t) > 2
        and t not in _NOISE
        and t not in STOP_WORDS
        and not t.startswith(("↑", "▲", "⬆"))
    ]


# ---------------------------------------------------------------- chunker


def extract_text_chunks(
    body: Node, min_word_threshold: int | None = None
) -> list[tuple[int, str, str, Node]]:
    """Document-order (index, text, 'header'|'content', element) chunks:
    text accumulates across inline elements and flushes at each block-element
    close (stripped runs concatenated, then whitespace-normalized — matching
    the reference's join quirk)."""
    chunks: list[tuple[int, str, str, Node]] = []
    buf: list[str] = []
    idx = 0
    stack: list[tuple[Node, bool]] = [(body, False)]
    while stack:
        el, closed = stack.pop()
        if closed:
            if buf and el.tag not in INLINE_TAGS:
                text = " ".join("".join(buf).split())
                if text:
                    kind = "header" if el.tag in HEADER_TAGS else "content"
                    chunks.append((idx, text, kind, el))
                    idx += 1
                buf = []
            continue
        if el.is_text:
            if el.attrs["text"].strip():
                buf.append(el.attrs["text"].strip())
            continue
        if not el.children:
            continue
        stack.append((el, True))
        for child in reversed(el.children):
            stack.append((child, False))
    if buf:
        text = " ".join("".join(buf).split())
        if text:
            chunks.append((idx, text, "content", body))
    if min_word_threshold:
        chunks = [c for c in chunks if len(c[1].split()) >= min_word_threshold]
    return chunks


def extract_page_query(root: Node, body: Node, user_query: str | None = None) -> str:
    """title + first h1 + meta keywords/description, falling back to the
    first >150-char paragraph (spec :125-160)."""
    if user_query:
        return user_query
    parts: list[str] = []
    title = root.find("title")
    if title is not None and title.text():
        parts.append(title.text())
    h1 = root.find("h1")
    if h1 is not None:
        parts.append(h1.text())
    meta_found = ""
    for want in ("keywords", "description"):
        for m in root.find_all("meta"):
            if (m.attrs.get("name") or "").lower() == want and m.attrs.get("content"):
                parts.append(m.attrs["content"])
                meta_found += m.attrs["content"]
                break
    if not meta_found:
        for p in body.find_all("p"):
            if len(p.text()) > 150:
                parts.append(p.text()[:150])
                break
    return " ".join(filter(None, parts))


def clean_element(el: Node) -> str:
    """Serialize dropping script/style/aside/form/iframe/noscript and
    presentation attributes (spec :329-379)."""
    unwanted_tags = {"script", "style", "aside", "form", "iframe", "noscript"}
    unwanted_attrs = {"style", "onclick", "onmouseover", "align", "bgcolor",
                      "class", "id"}
    out: list[str] = []

    def render(node: Node) -> None:
        if node.is_text:
            out.append(node.attrs["text"].strip())
            return
        if node.tag in unwanted_tags:
            return
        out.append(f"<{node.tag}")
        for k, v in node.attrs.items():
            if k not in unwanted_attrs:
                out.append(f' {k}="{v}"')
        out.append(">")
        for c in node.children:
            render(c)
        out.append(f"</{node.tag}>")

    render(el)
    return "".join(out)


# ------------------------------------------------------------- BM25 Okapi


def bm25_okapi_scores(
    corpus: list[list[str]],
    query: list[str],
    k1: float = 1.5,
    b: float = 0.75,
    epsilon: float = 0.25,
) -> list[float]:
    """Okapi BM25 with the negative-idf floor at epsilon·avg_idf (the
    rank_bm25 BM25Okapi parameterization the reference runs with)."""
    n_docs = len(corpus)
    if n_docs == 0:
        return []
    doc_lens = [len(d) for d in corpus]
    avgdl = sum(doc_lens) / n_docs
    if avgdl == 0:
        # every chunk tokenized to nothing (all-stopword page): tf is 0
        # everywhere so every score is 0 — return that instead of letting
        # the dl/avgdl term ZeroDivisionError the whole Spark task
        return [0.0] * n_docs
    df: dict[str, int] = {}
    for doc in corpus:
        for term in set(doc):
            df[term] = df.get(term, 0) + 1
    idf: dict[str, float] = {}
    idf_sum = 0.0
    negative: list[str] = []
    for term, freq in df.items():
        v = math.log(n_docs - freq + 0.5) - math.log(freq + 0.5)
        idf[term] = v
        idf_sum += v
        if v < 0:
            negative.append(term)
    avg_idf = idf_sum / len(idf) if idf else 0.0
    for term in negative:
        idf[term] = epsilon * avg_idf
    scores = []
    for doc, dl in zip(corpus, doc_lens):
        tf: dict[str, int] = {}
        for t in doc:
            tf[t] = tf.get(t, 0) + 1
        s = 0.0
        for q in query:
            f = tf.get(q, 0)
            s += (idf.get(q) or 0.0) * (
                f * (k1 + 1) / (f + k1 * (1 - b + b * dl / avgdl))
            )
        scores.append(s)
    return scores


# ---------------------------------------------------------------- filter


def _scored_chunks(
    html: str,
    user_query: str | None,
    use_stemming: bool,
    min_word_threshold: int | None,
) -> list[tuple[int, str, "object", float]]:
    """ONE parse + chunk + tokenize + score pass shared by every public
    surface: [(chunk_index, text, element_node, adjusted_score)] in
    document order. (The previous shape re-ran the whole parse/chunk
    pipeline per surface, so the fit-markdown path paid it twice.)"""
    if not html or not isinstance(html, str):
        return []
    root = parse_html(html)
    body = root.find("body") or root
    query = extract_page_query(root, body, user_query)
    if not query:
        return []
    candidates = extract_text_chunks(body, min_word_threshold)
    if not candidates:
        return []
    if use_stemming:
        from crawl4ai_spark.html.stemmer import porter2_stem

        corpus = [[porter2_stem(w) for w in c[1].lower().split()] for c in candidates]
        q_tokens = [porter2_stem(w) for w in query.lower().split()]
    else:
        corpus = [c[1].lower().split() for c in candidates]
        q_tokens = query.lower().split()
    corpus = [clean_tokens(doc) for doc in corpus]
    q_tokens = clean_tokens(q_tokens)
    scores = bm25_okapi_scores(corpus, q_tokens)
    return [
        (index, chunk, tag, score * PRIORITY_TAGS.get(tag.tag, 1.0))
        for score, (index, chunk, _kind, tag) in zip(scores, candidates)
    ]


def bm25_score_all_chunks(
    html: str,
    user_query: str | None = None,
    use_stemming: bool = True,
    min_word_threshold: int | None = None,
) -> list[tuple[int, str, str, float]]:
    """All chunks with their tag-weight-adjusted BM25 scores, document
    order: [(chunk_index, text, tag, adjusted_score)]."""
    return [
        (i, chunk, tag.tag, s)
        for i, chunk, tag, s in _scored_chunks(
            html, user_query, use_stemming, min_word_threshold
        )
    ]


def bm25_filter_chunks(
    html: str,
    user_query: str | None = None,
    bm25_threshold: float = 1.0,
    use_stemming: bool = True,
    min_word_threshold: int | None = None,
) -> list[tuple[int, str, str, float]]:
    """Scored pipeline surface: [(chunk_index, text, tag, adjusted_score)]
    for chunks at/above threshold, in original document order."""
    return [
        (i, chunk, tag.tag, s)
        for i, chunk, tag, s in _scored_chunks(
            html, user_query, use_stemming, min_word_threshold
        )
        if s >= bm25_threshold
    ]


def bm25_filter_content(
    html: str,
    user_query: str | None = None,
    bm25_threshold: float = 1.0,
    use_stemming: bool = True,
    min_word_threshold: int | None = None,
) -> list[str]:
    """The reference surface: cleaned HTML of the selected chunks' elements
    in document order (feeds fit_markdown)."""
    return [
        clean_element(tag)
        for _i, _chunk, tag, s in _scored_chunks(
            html, user_query, use_stemming, min_word_threshold
        )
        if s >= bm25_threshold
    ]
