"""Topic segmentation (SURVEY.md §2.3 T20 — TopicSegmentationChunking).

The reference delegates to nltk's TextTilingTokenizer (chunking_strategy.py
:103-160), which is unavailable here; this is a from-scratch implementation
of the published TextTiling algorithm (Hearst 1997, public): lower-cased
word stream → pseudo-sentences of ``w`` tokens → cosine similarity between
adjacent blocks of ``k`` pseudo-sentences → gap depth scores → boundaries
at gaps deeper than mean(depth) − stddev(depth)/2 → paragraph-aligned
segments. Deterministic, stdlib-only; keyword extraction per segment is a
stopword-filtered frequency top-N (the reference's extract_keywords shape).

Runs per document inside Arrow pandas UDFs; Spark-side callers wrap it in
``mapInPandas``/``pandas_udf`` like the other per-page kernels.
"""

from __future__ import annotations

import math
import re
from collections import Counter

from crawl4ai_spark.html.bm25_filter import STOP_WORDS

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def _cosine(a: Counter, b: Counter) -> float:
    if not a or not b:
        return 0.0
    dot = sum(v * b.get(t, 0) for t, v in a.items())
    na = math.sqrt(sum(v * v for v in a.values()))
    nb = math.sqrt(sum(v * v for v in b.values()))
    return dot / (na * nb) if na and nb else 0.0


def texttile_segments(text: str, w: int = 20, k: int = 6) -> list[str]:
    """Topic segments of ``text``. ``w`` = pseudo-sentence size in tokens,
    ``k`` = block size in pseudo-sentences. Short texts → [text]."""
    if not text or not text.strip():
        return []
    tokens = _TOKEN_RE.findall(text.lower())
    n_ps = len(tokens) // w
    if n_ps < 2 * k:
        return [text]
    pseudo = [Counter(tokens[i * w:(i + 1) * w]) for i in range(n_ps)]

    # lexical score at each gap: cosine of the k-blocks on either side
    gaps = range(1, n_ps)
    sims: list[float] = []
    for g in gaps:
        left: Counter = Counter()
        for c in pseudo[max(0, g - k):g]:
            left.update(c)
        right: Counter = Counter()
        for c in pseudo[g:min(n_ps, g + k)]:
            right.update(c)
        sims.append(_cosine(left, right))

    # depth score: how far the valley at gap i sits below its flanking peaks
    depths: list[float] = []
    for i, s in enumerate(sims):
        lpeak = s
        for j in range(i, -1, -1):
            if sims[j] >= lpeak:
                lpeak = sims[j]
            else:
                break
        rpeak = s
        for j in range(i, len(sims)):
            if sims[j] >= rpeak:
                rpeak = sims[j]
            else:
                break
        depths.append((lpeak - s) + (rpeak - s))

    mean = sum(depths) / len(depths)
    var = sum((d - mean) ** 2 for d in depths) / len(depths)
    cutoff = mean - math.sqrt(var) / 2.0
    boundaries = [
        i + 1 for i, d in enumerate(depths) if d > cutoff and d > 0.0
    ]
    if not boundaries:
        return [text]

    # map pseudo-sentence boundaries back to character offsets (the end of
    # the boundary'th pseudo-sentence's last token occurrence), then snap
    # each to the NEAREST paragraph break as Hearst's algorithm does —
    # published TextTiling emits paragraph-aligned segments, not
    # mid-sentence token cuts. Texts without paragraph breaks (single-line
    # word streams) keep the raw token-aligned offset.
    spans = [m.span() for m in _TOKEN_RE.finditer(text.lower())]
    para_breaks = [m.end() for m in re.finditer(r"\n[ \t]*\n+", text)]
    cuts: list[int] = []
    for b in boundaries:
        tok_idx = b * w - 1
        if tok_idx >= len(spans):
            continue
        cut = spans[tok_idx][1]
        if para_breaks:
            cut = min(para_breaks, key=lambda p: (abs(p - cut), p))
        if 0 < cut < len(text) and (not cuts or cut > cuts[-1]):
            cuts.append(cut)
    segments: list[str] = []
    prev_char = 0
    for cut in cuts:
        seg = text[prev_char:cut]
        if seg.strip():
            segments.append(seg)
            prev_char = cut
    tail = text[prev_char:]
    if tail.strip():
        segments.append(tail)
    return segments or [text]


def segment_keywords(segment: str, num_keywords: int = 3) -> list[str]:
    """Top-N frequent non-stopword tokens of a segment (the reference's
    extract_keywords shape, nltk-free)."""
    tokens = [
        t for t in _TOKEN_RE.findall(segment.lower())
        if t not in STOP_WORDS and len(t) > 2
    ]
    return [t for t, _ in Counter(tokens).most_common(num_keywords)]


def topic_segmentation_chunks(
    text: str, w: int = 20, k: int = 6, num_keywords: int = 3
) -> list[dict]:
    """[{segment, keywords}] — the chunking-strategy surface."""
    return [
        {"segment": seg, "keywords": segment_keywords(seg, num_keywords)}
        for seg in texttile_segments(text, w, k)
    ]
