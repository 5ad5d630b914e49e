"""Link preview — the reference's 3-score link system, Spark-first.

Reference surface: ``link_preview.py:18-394`` (LinkPreview.extract_link_heads:
filter links → head-fetch the targets → BM25-score head text against a query
→ merge scores), ``models.py:343-353`` (Link.intrinsic_score /
contextual_score / total_score), ``utils.py:3238-3283``
(calculate_total_score), ``async_url_seeder.py:645-677`` (BM25 application +
URL-relevance fallback), ``:1143-1194`` (_extract_text_context),
``:1196-1290`` (_calculate_url_relevance_score), ``:1380-1410``
(_calculate_bm25_score — rank_bm25.BM25Okapi + min-max normalization).

Spark restatement: the reference head-fetches each link target over HTTP;
here the "fetch" is the same offline corpus join the crawl loop uses (S4/J6)
— link href ⋈ pages.url, head = everything before ``</head>`` (the S7
64 KB head peek). Filtering, the max_links cap, head-context extraction and
the total-score blend are Catalyst; the BM25 stage is ONE ``applyInPandas``
keyed by ``src_url``:

- per-source-page link batches are the BM25 corpora (the reference builds
  one BM25Okapi per ``extract_link_heads`` call, i.e. per page) — an
  inherently group-collective computation (corpus idf + min-max), so the
  idiomatic shape is a group kernel: the narrow post-fetch link rows
  exchange once on src_url (the head blob is shed first), each ≤max_links
  group scores in Python, and the page corpus is scanned exactly once
  (plan-asserted). A Catalyst join-web restatement of the same math
  re-executed the corpus-sized fetch join once per branch — seven scans;
- BM25Okapi semantics from scratch (public rank_bm25 algorithm): raw
  idf(t) = ln((N−n+0.5)/(n+0.5)); negative idfs are replaced by
  ``epsilon · average_idf`` where average_idf averages the RAW idfs over
  the group's whole vocabulary (quirk preserved: the average includes the
  negative values, and can itself be negative); query terms missing from
  the group vocabulary contribute idf 0; scores are min-max normalized
  within the group (all-equal → 0.5).

Documented parity gap: ``_extract_text_context``'s JSON-LD fields
(``async_url_seeder.py:1173-1191``) are not extracted — the head context
covers title + the full standard/og/twitter/dc meta keys. (Scoring JSON-LD
would need JSON parsing of ``<script type="application/ld+json">`` blobs;
no page in the test corpus carries one.)
"""

from __future__ import annotations

import fnmatch

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from crawl4ai_spark.operators.capture import latest_capture
from crawl4ai_spark.operators.filters import (
    head_meta_get,
    head_meta_tags_col,
    head_title_col,
)

# rank_bm25.BM25Okapi defaults (the reference passes none)
BM25_K1 = 1.5
BM25_B = 0.75
BM25_EPSILON = 0.25

# _extract_text_context meta keys, in the reference's append order
# (async_url_seeder.py:1152-1171)
_CONTEXT_META_KEYS = [
    "description", "keywords", "author", "subject", "summary", "abstract",
    "og:title", "og:description", "og:site_name", "article:tag",
    "twitter:title", "twitter:description", "twitter:image:alt",
    "dc.title", "dc.description", "dc.subject", "dc.creator",
]


def _fnmatch_col(url: Column, patterns: list[str]) -> Column:
    """OR of plain ``fnmatch.fnmatch`` globs — link preview filters with
    fnmatch directly (link_preview.py:139-155), NOT the categorized
    URLPatternFilter semantics. ``fnmatch.translate`` end-anchors with
    ``\\Z`` but start-anchoring comes from Python applying it via
    ``re.match``; ``rlike`` is find-based, so the ``^`` must be explicit or
    a pattern like ``'docs*'`` would match mid-URL."""
    cond = F.lit(False)
    for p in patterns:
        cond = cond | url.rlike("^" + fnmatch.translate(p))
    return cond


def head_text_context_col(head: Column) -> Column:
    """_extract_text_context (async_url_seeder.py:1143-1194) over a raw
    head string: title, then each meta key in reference order; non-empty
    parts joined with single spaces. Meta parsing is HeadPeekr's — shared
    with F5 via filters.head_meta_tags_col/head_meta_get, so the regex
    surface has exactly one spelling."""
    title = head_title_col(head)
    metas = head_meta_tags_col(head)
    parts = [title] + [head_meta_get(metas, k) for k in _CONTEXT_META_KEYS]
    return F.array_join(
        F.filter(F.array(*parts), lambda p: p != ""), " "
    )


def url_relevance_score(query: str, url: str) -> float:
    """_calculate_url_relevance_score (async_url_seeder.py:1196-1290) —
    the fallback contextual score for links that fetched 'valid' but
    yielded no head text context: exact/substring matches over URL parts,
    per-query-token coverage scores, character-trigram Jaccard, combined
    by a 1/(rank+1)-weighted average of the scores sorted descending.
    Pure Python (unit-tested transcription); applied per batch inside an
    Arrow pandas UDF only to the context-less tail."""
    from urllib.parse import urlparse

    query_lower = query.lower()
    parsed = urlparse(url)
    domain = parsed.netloc.replace("www.", "")
    path = parsed.path.strip("/")
    domain_parts = domain.split(".")
    path_parts = [p for p in path.split("/") if p]
    param_parts: list[str] = []
    if parsed.query:
        for param in parsed.query.split("&"):
            if "=" in param:
                key, value = param.split("=", 1)
                param_parts.extend([key, value])
    all_parts = domain_parts + path_parts + param_parts

    scores: list[float] = []
    query_tokens = query_lower.split()
    for part in all_parts:
        part_lower = part.lower()
        if query_lower in part_lower:
            scores.append(1.0)
        elif part_lower in query_lower:
            scores.append(0.9)
    for token in query_tokens:
        token_scores = []
        for part in all_parts:
            part_lower = part.lower()
            if token in part_lower:
                token_scores.append(0.7 * len(token) / len(part_lower))
            elif part_lower in token:
                token_scores.append(0.6 * len(part_lower) / len(token))
        if token_scores:
            scores.append(max(token_scores))

    def _ngrams(text: str, n: int = 3) -> set[str]:
        return set(text[i : i + n] for i in range(len(text) - n + 1))

    url_text = " ".join(all_parts).lower()
    if len(query_lower) >= 3 and len(url_text) >= 3:
        qn, un = _ngrams(query_lower), _ngrams(url_text)
        if qn and un:
            union = len(qn | un)
            scores.append(0.5 * (len(qn & un) / union if union > 0 else 0))

    if not scores:
        return 0.0
    scores.sort(reverse=True)
    weighted = sum(s / (i + 1) for i, s in enumerate(scores))
    total_weight = sum(1 / (i + 1) for i in range(len(scores)))
    return min(weighted / total_weight if total_weight > 0 else 0.0, 1.0)


def link_preview_scores(
    links: DataFrame,
    pages: DataFrame,
    query: str | None = None,
    include_internal: bool = True,
    include_external: bool = False,
    include_patterns: list[str] | None = None,
    exclude_patterns: list[str] | None = None,
    max_links: int = 100,
    score_links: bool = True,
    score_threshold: float | None = None,
) -> DataFrame:
    """The full link-preview pass over exploded links.

    ``links`` columns: ``src_url`` (the page the link was found on),
    ``href``, ``link_text``, ``is_external``, ``intrinsic_score``, ``ord``
    (discovery order within the page; hrefs are assumed already first-wins
    deduped per page, which the scrape explode guarantees).
    ``pages``: the offline corpus (``url``, ``html_str``) standing in for
    HTTP head fetches.

    Returns every input link row plus:

    - ``head_status`` — 'valid' (target found in the corpus) / 'not_valid'
      (filtered but unreachable) / NULL (link not selected by the filters
      — the reference leaves such links untouched);
    - ``contextual_score`` — BM25Okapi of the target's head text context
      against ``query``, min-max normalized within the source page's
      scored batch (async_url_seeder.py:1380-1410); NULL when unscored;
    - ``total_score`` — calculate_total_score (utils.py:3238-3283):
      5.0 when ``score_links`` is off, clamped intrinsic when no
      contextual score exists, else 0.7·intrinsic + 0.3·min(ctx·10, 10),
      clamped to [0, 10]; NULL for links the filters never selected.
    """
    base = links.select(
        "src_url", "href", "link_text", "is_external", "intrinsic_score", "ord"
    )

    # -- _filter_links (link_preview.py:120-176): internal list first, then
    # external (when included), fnmatch include/exclude, max_links cap in
    # that order — realized as one selection flag + a per-page rank
    selected = F.when(F.col("is_external"), F.lit(include_external)).otherwise(
        F.lit(include_internal)
    )
    if include_patterns:
        selected = selected & _fnmatch_col(F.col("href"), include_patterns)
    if exclude_patterns:
        selected = selected & ~_fnmatch_col(F.col("href"), exclude_patterns)
    flagged = base.withColumn("_sel", selected)
    if max_links > 0:
        # the reference caps the concatenated internal-then-external list
        # (link_preview.py:157-162); rank only the selected rows in that
        # order — partitioning by (src_url, _sel) keeps unselected rows out
        # of the rank without a second pass
        flagged = flagged.withColumn(
            "_rk",
            F.when(F.col("_sel"), F.row_number().over(
                Window.partitionBy("src_url", "_sel").orderBy(
                    F.col("is_external").cast("int"), F.col("ord")
                )
            )),
        ).withColumn(
            "_sel", F.col("_sel") & (F.coalesce(F.col("_rk"), F.lit(0)) <= max_links)
        ).drop("_rk")

    # -- offline head fetch (S4/J6 join shape): selected hrefs ⋈ pages.url;
    # head = the S7 peek (everything before </head>)
    heads = pages.select(
        F.col("url").alias("href"),
        F.substring_index(F.col("html_str"), "</head>", 1).alias("_head"),
        *(["warc_ts"] if "warc_ts" in pages.columns else []),
    )
    # multi-capture corpora (several rows per url — normal in WARC
    # snapshots) must not fan the link rows out: a duplicated href would
    # emit duplicate (src_url, href) output rows AND double-count that
    # head in the per-page BM25 corpus (shifting df/idf and min-max for
    # every link on the page). Collapse to ONE deterministic capture per
    # href — the SAME ``latest_capture`` collapse (and tie-break) the
    # crawl loop's fetch join uses (plans/crawl.py step 3).
    heads = latest_capture(heads, "href").select("href", "_head")
    fetched = flagged.join(heads, "href", "left")
    fetched = fetched.withColumn(
        "head_status",
        F.when(~F.col("_sel"), F.lit(None).cast("string"))
        .when(F.col("_head").isNotNull(), F.lit("valid"))
        .otherwise(F.lit("not_valid")),
    ).withColumn(
        "_ctx",
        F.when(
            F.col("_sel") & F.col("_head").isNotNull(),
            head_text_context_col(F.col("_head")),
        ),
    )

    if query:
        scored = _bm25_group_scores(fetched, query)
    else:
        scored = fetched.withColumn(
            "contextual_score", F.lit(None).cast("double")
        )
    if score_threshold is not None:
        # extract_head_for_urls applies the threshold UNCONDITIONALLY
        # (async_url_seeder.py:630-631) — even with no query, where no
        # result carries a relevance_score, so `r.get("relevance_score",
        # 0) >= threshold` drops EVERY selected link for any positive
        # threshold (quirk preserved: threshold-without-query is a
        # select-nothing config). Dropped links merge back as UNTOUCHED,
        # exactly like never-selected ones.
        # materialize the flag BEFORE touching _sel: `dropped` is lazy,
        # so rewriting _sel first would re-resolve it against the
        # already-falsified column and the nulling below would never fire
        scored = scored.withColumn(
            "_dropped",
            F.col("_sel")
            & (
                F.coalesce(F.col("contextual_score"), F.lit(0.0))
                < F.lit(score_threshold)
            ),
        )
        scored = (
            scored.withColumn("_sel", F.col("_sel") & ~F.col("_dropped"))
            .withColumn(
                "head_status",
                F.when(F.col("_dropped"), F.lit(None).cast("string"))
                .otherwise(F.col("head_status")),
            )
            .withColumn(
                "contextual_score",
                F.when(F.col("_dropped"), F.lit(None).cast("double"))
                .otherwise(F.col("contextual_score")),
            )
            .drop("_dropped")
        )

    # -- calculate_total_score (utils.py:3238-3283), applied only to links
    # the filters selected (the reference leaves the rest untouched)
    intrinsic = F.coalesce(F.col("intrinsic_score"), F.lit(0.0))
    ctx = F.col("contextual_score")
    if not score_links:
        total_for_selected = F.lit(5.0)
    else:
        blend = F.least(
            F.greatest(
                intrinsic * 0.7 + F.least(ctx * 10.0, F.lit(10.0)) * 0.3,
                F.lit(0.0),
            ),
            F.lit(10.0),
        )
        clamped_intrinsic = F.least(F.greatest(intrinsic, F.lit(0.0)), F.lit(10.0))
        total_for_selected = (
            F.when(ctx.isNull() | F.lit(not bool(query)), clamped_intrinsic)
            .otherwise(blend)
        )
    return scored.withColumn(
        "total_score",
        F.when(F.col("_sel"), total_for_selected),
    ).drop("_sel", "_head", "_ctx")  # drop() ignores the columns the
    # query branch already consumed inside the group kernel


def _bm25_corpus_scores(query_terms: list[str], corpus: list[list[str]]) -> list[float]:
    """rank_bm25.BM25Okapi, transcribed (public algorithm; defaults k1=1.5
    b=0.75 epsilon=0.25): raw idf(t) = ln((N−n+0.5)/(n+0.5)); negatives
    replaced by epsilon · average of the RAW idfs over the whole corpus
    vocabulary (quirk: the average includes the negatives); query terms
    NOT deduplicated; terms missing from the vocabulary contribute 0."""
    import math

    n_docs = len(corpus)
    dls = [float(len(t)) for t in corpus]
    avgdl = sum(dls) / n_docs
    if avgdl == 0.0:
        # defensive only — the caller (score_group) already short-circuits
        # the all-empty batch to 0.0 per the reference's own guard
        # (async_url_seeder.py:1396-1398), which returns [0.0]*n before
        # instantiating BM25Okapi, so this branch is unreachable from the
        # group kernel; kept so a direct caller can never divide by zero
        return [0.0] * n_docs
    df: dict[str, int] = {}
    for toks in corpus:
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    idf_raw = {t: math.log((n_docs - n + 0.5) / (n + 0.5)) for t, n in df.items()}
    eps = BM25_EPSILON * (sum(idf_raw.values()) / len(idf_raw)) if idf_raw else 0.0
    idf = {t: (eps if v < 0 else v) for t, v in idf_raw.items()}
    scores = []
    for toks, dl in zip(corpus, dls):
        s = 0.0
        for qt in query_terms:
            tf = float(toks.count(qt))
            s += idf.get(qt, 0.0) * (tf * (BM25_K1 + 1.0)) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
            )
        scores.append(s)
    return scores


def _bm25_group_scores(fetched: DataFrame, query: str) -> DataFrame:
    """contextual_score for every link: ONE ``applyInPandas`` keyed by
    ``src_url``. The reference builds one BM25Okapi per page's link batch —
    an inherently group-collective computation (corpus-wide idf + min-max
    normalization), so the idiomatic Spark shape is a single group kernel:
    the head-fetch join's output (pages already shed — only the narrow
    link rows ship) exchanges once on src_url, each ≤max_links group
    scores in vectorized Python, done.

    The previous shape expressed the same math as a Catalyst join web
    (stats ⋈ vocab ⋈ eps ⋈ per-term ⋈ min-max-window ⋈ back onto the
    fetch join); correct, but Catalyst does not de-duplicate common
    subplans across join branches, so the href ⋈ pages fetch join — the
    one corpus-sized operation — re-executed SEVEN times, once per branch.
    One group kernel = one pages scan (plan-asserted in
    tests/test_plan_quality.py).

    The URL-relevance fallback for valid-but-context-less targets
    (async_url_seeder.py:661-668) rides the same kernel — it is pure
    Python anyway, and it stays OUTSIDE the min-max group, exactly like
    the reference."""
    q_terms = [t for t in query.lower().split() if t]
    slim = fetched.drop("_head")  # the 64KB head peek must not ride the shuffle
    out_fields = [f for f in slim.schema.fields if f.name != "_ctx"]
    schema_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in out_fields
    ) + ", contextual_score double"
    out_cols = [f.name for f in out_fields]

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        scorable = (
            pdf["_sel"].fillna(False)
            & (pdf["head_status"] == "valid")
            & pdf["_ctx"].notna()
            & (pdf["_ctx"] != "")
        )
        ctx_scores = pd.Series([None] * len(pdf), dtype=object, index=pdf.index)
        idx = pdf.index[scorable]
        if len(idx) > 0:
            corpus = [
                [t for t in str(c).lower().split() if t]
                for c in pdf.loc[idx, "_ctx"]
            ]
            if all(len(t) == 0 for t in corpus):
                # reference guard (async_url_seeder.py:1396-1398): a batch
                # whose every document tokenizes to nothing (e.g.
                # whitespace-only titles) returns [0.0]*n BEFORE BM25Okapi
                # and BEFORE min-max — so these links score exactly 0.0,
                # NOT the all-equal min-max value of 0.5
                ctx_scores.loc[idx] = 0.0
            else:
                raw = _bm25_corpus_scores(q_terms, corpus)
                lo, hi = min(raw), max(raw)
                normed = [
                    0.5 if hi == lo else (r - lo) / (hi - lo) for r in raw
                ]
                ctx_scores.loc[idx] = normed
        # fallback: 'valid' target whose head yielded no text context
        fb = (
            pdf["_sel"].fillna(False)
            & (pdf["head_status"] == "valid")
            & pdf["_ctx"].notna()
            & (pdf["_ctx"] == "")
        )
        for i in pdf.index[fb]:
            ctx_scores.loc[i] = url_relevance_score(query, pdf.loc[i, "href"] or "")
        out = pdf[out_cols].copy()
        out["contextual_score"] = ctx_scores.astype("float64")
        return out

    return slim.groupBy("src_url").applyInPandas(score_group, schema_ddl)
