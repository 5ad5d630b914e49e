"""Chunking strategies (SURVEY.md §2.3 T20) as Catalyst expressions.

Behavioral spec: /root/reference/crawl4ai/chunking_strategy.py:8-257 —
RegexChunking (split on patterns, default paragraph breaks),
FixedLengthWordChunking (:180-197, word windows of ``chunk_size``),
SlidingWindowChunking (:200-226, window_size/step over words),
OverlappingWindowChunking (:229-257, window_size with ``overlap`` words).

All pure array expressions — chunking 100 TB of text is shuffle-free and
whole-stage-codegen'd; each function returns ``array<string>``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def regex_chunks_col(text: Column | str, pattern: str = r"\n\n") -> Column:
    """Split on a regex (reference default: blank lines); empties dropped."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, pattern), lambda s: F.trim(s) != "")


def sentence_chunks_col(text: Column | str) -> Column:
    """Sentence chunks (reference NlpSentenceChunking, chunking_strategy.py
    :62-100). The reference tokenizes with an NLP model (nltk punkt —
    unavailable here); this is the deterministic regex determinization:
    maximal runs up to sentence-final punctuation. Trimmed, empties
    dropped."""
    c = F.col(text) if isinstance(text, str) else text
    sents = F.regexp_extract_all(c, F.lit(r"[^.!?]+(?:[.!?]+|$)"), F.lit(0))
    return F.filter(F.transform(sents, lambda s: F.trim(s)), lambda s: s != "")


def _words(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


# Frequent English abbreviations that do NOT end a sentence when followed
# by a period — the rule-based core of punkt's learned abbreviation set
# (Kiss & Strunk 2006; the nltk-trained parameters themselves are not
# reproducible without the model, see sentence_chunks_punkt_col).
PUNKT_ABBREVS = [
    "mr", "mrs", "ms", "dr", "prof", "rev", "fr", "sr", "jr", "st", "ave",
    "blvd", "rd", "mt", "no", "vol", "fig", "al", "etc", "vs", "cf", "ca",
    "approx", "dept", "est", "inc", "ltd", "co", "corp", "gen", "col",
    "lt", "sgt", "capt", "maj", "adm", "hon", "gov", "pres", "sec",
    "univ", "assn", "bros", "jan", "feb", "mar", "apr", "jun", "jul",
    "aug", "sep", "sept", "oct", "nov", "dec", "e.g", "i.e", "a.m", "p.m",
    "u.s", "u.k", "ph.d", "m.d", "b.a", "m.a", "d.c",
]

_CLOSERS = "[\"'’”)\\]»]"


def sentence_chunks_punkt_col(text: Column | str) -> Column:
    """Punkt-style sentence chunks (reference NlpSentenceChunking,
    chunking_strategy.py:62-100, which calls nltk ``sent_tokenize`` and
    returns ``list(set(...))``). nltk and its trained punkt model are not
    installed here and the learned parameters aren't reproducible without
    them, so this is the documented rule-based restatement of punkt's
    published behavior (Kiss & Strunk 2006):

    - a sentence ends at a token whose core ends in ``.``/``!``/``?``
      (closing quotes/brackets may follow the terminator);
    - a ``.`` does NOT end a sentence after a known abbreviation
      (PUNKT_ABBREVS), a single initial (``J.``), or a dotted
      multi-initialism (``U.S.A.``), and not when the next token starts
      lowercase (punkt's orthographic sentence-starter heuristic);
    - ``!``/``?`` always end a sentence;
    - the reference's ``set()`` is determinized to first-occurrence-order
      distinct; internal whitespace is squashed to single spaces (the
      token-join normalization every operator here shares).

    Pure Catalyst (array lambdas over whitespace tokens) — shuffle-free,
    with an exact DuckDB twin in the contract's ``chunking`` oracle."""
    c = F.col(text) if isinstance(text, str) else text
    toks = _words(c)
    n = F.size(toks)
    abbrevs = F.array(*[F.lit(a) for a in PUNKT_ABBREVS])

    def _is_break(i: Column) -> Column:
        t = F.element_at(toks, i)
        nxt = F.try_element_at(toks, i + F.lit(1))  # null past the end
        core = F.regexp_replace(t, _CLOSERS + "+$", "")
        ends_term = core.rlike(r"[.!?]$")
        ends_bang = core.rlike(r"[!?]$")
        word = F.lower(F.regexp_replace(core, r"\.+$", ""))
        is_abbrev = (
            F.array_contains(abbrevs, word)
            | word.rlike(r"^[a-z]$")  # single initial: "J."
            | core.rlike(r"^([A-Za-z]\.){2,}$")  # "U.S.A."
        )
        nxt_ok = nxt.isNull() | nxt.rlike("^[\"'‘“(\\[«]?[A-Z0-9]")
        return ends_term & (ends_bang | (~is_abbrev & nxt_ok))

    idx = F.sequence(F.lit(1), F.when(n > 0, n).otherwise(F.lit(1)))
    breaks = F.filter(idx, _is_break)
    # a trailing fragment with no terminator is still a sentence
    bounded = F.when(
        (F.size(breaks) == 0) | (F.try_element_at(breaks, F.lit(-1)) != n),
        F.concat(breaks, F.array(n)),
    ).otherwise(breaks)
    sents = F.transform(
        bounded,
        lambda b, j: F.concat_ws(
            " ",
            F.slice(
                toks,
                F.when(j == 0, F.lit(0)).otherwise(F.element_at(bounded, j)) + 1,
                b - F.when(j == 0, F.lit(0)).otherwise(F.element_at(bounded, j)),
            ),
        ),
    )
    deduped = F.array_distinct(F.filter(sents, lambda s: s != ""))
    return F.when(n > 0, deduped).otherwise(F.array().cast("array<string>"))


def fixed_window_chunks_col(text: Column | str, chunk_size: int = 100) -> Column:
    """Non-overlapping word windows of ``chunk_size``."""
    w = _words(text)
    n = F.size(w)
    starts = F.sequence(F.lit(1), F.when(n > 0, n).otherwise(F.lit(1)), F.lit(chunk_size))
    return F.when(n == 0, F.array().cast("array<string>")).otherwise(
        F.transform(starts, lambda i: F.concat_ws(" ", F.slice(w, i, chunk_size)))
    )


def sliding_window_chunks_col(
    text: Column | str, window_size: int = 100, step: int = 50
) -> Column:
    """Overlapping word windows advancing by ``step`` (reference :200-223):
    texts of ≤ ``window_size`` words yield the RAW text as one chunk;
    otherwise aligned windows at 0, step, 2·step, … plus — when the last
    aligned window doesn't reach the end — one tail chunk of the final
    ``window_size`` words."""
    c = F.col(text) if isinstance(text, str) else text
    w = _words(c)
    n = F.size(w)
    starts = F.sequence(F.lit(1), n - window_size + 1, F.lit(step))
    aligned = F.transform(starts, lambda i: F.concat_ws(" ", F.slice(w, i, window_size)))
    tail = F.concat_ws(" ", F.slice(w, n - window_size + 1, window_size))
    has_tail = F.pmod(n - window_size, F.lit(step)) != 0
    return F.when(n <= window_size, F.array(c)).otherwise(
        F.when(has_tail, F.concat(aligned, F.array(tail))).otherwise(aligned)
    )


def overlapping_window_chunks_col(
    text: Column | str, window_size: int = 1000, overlap: int = 100
) -> Column:
    """Windows of ``window_size`` whose next window starts ``overlap`` words
    before the previous end (reference :229-257): texts of ≤ ``window_size``
    words yield the RAW text; generation stops at the first window reaching
    the end (that window is clamped to the remaining words)."""
    if overlap >= window_size:
        raise ValueError("overlap must be smaller than window_size")
    step = window_size - overlap
    c = F.col(text) if isinstance(text, str) else text
    w = _words(c)
    n = F.size(w)
    # chunks = ceil((n - window)/step) + 1 for n > window; last start 1-based
    n_extra = F.ceil((n - window_size) / F.lit(step).cast("double"))
    last_start = (n_extra * step + 1).cast("int")
    starts = F.sequence(F.lit(1), last_start, F.lit(step))
    return F.when(n <= window_size, F.array(c)).otherwise(
        F.transform(starts, lambda i: F.concat_ws(" ", F.slice(w, i, window_size)))
    )
