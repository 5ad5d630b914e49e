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


def _words(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


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
    """Overlapping word windows advancing by ``step``; short texts yield the
    whole text as one chunk (reference :207-211)."""
    w = _words(text)
    n = F.size(w)
    last_start = n - F.lit(window_size) + 1
    starts = F.sequence(F.lit(1), F.greatest(last_start, F.lit(1)), F.lit(step))
    return F.when(n == 0, F.array().cast("array<string>")).otherwise(
        F.when(
            n <= window_size, F.array(F.concat_ws(" ", w))
        ).otherwise(
            F.transform(starts, lambda i: F.concat_ws(" ", F.slice(w, i, window_size)))
        )
    )


def overlapping_window_chunks_col(
    text: Column | str, window_size: int = 1000, overlap: int = 100
) -> Column:
    """Windows of ``window_size`` whose next window starts ``overlap`` words
    before the previous end (reference :238-257)."""
    step = max(window_size - overlap, 1)
    w = _words(text)
    n = F.size(w)
    starts = F.sequence(F.lit(1), F.when(n > 0, n).otherwise(F.lit(1)), F.lit(step))
    return F.when(n == 0, F.array().cast("array<string>")).otherwise(
        F.transform(starts, lambda i: F.concat_ws(" ", F.slice(w, i, window_size)))
    )
