"""Fit-text pruning — density-scored boilerplate removal.

From-scratch restatement of the reference's PruningContentFilter semantics
(behavioral spec: /root/reference/crawl4ai/content_filter_strategy.py:533-777
— strip chrome tags, then bottom-up composite scoring of
text-density / link-density / tag-weight / class-id-weight / text-length and
removal below a fixed threshold, default 0.48; survivors are the serialized
top-level children, later wrapped in <div> for fit_markdown per
markdown_generation_strategy.py:235-239).

Pure function — runs inside the extraction pandas UDF.
"""

from __future__ import annotations

import math
import re

from crawl4ai_spark.html.parser import Node, parse_html

CHROME_TAGS = (
    "nav", "footer", "header", "aside", "script", "style", "form",
    "iframe", "noscript",
)

_TAG_WEIGHTS = {
    "article": 1.0, "main": 1.0, "p": 1.0, "h1": 0.9, "h2": 0.9, "h3": 0.85,
    "h4": 0.8, "h5": 0.8, "h6": 0.8, "pre": 0.9, "code": 0.8, "blockquote": 0.8,
    "section": 0.7, "table": 0.7, "ul": 0.6, "ol": 0.6, "li": 0.5,
    "td": 0.4, "div": 0.5, "span": 0.3, "a": 0.2,
}

_NEG_CLASS = re.compile(
    r"(sidebar|footer|header|nav|menu|comment|widget|ad[sv]?|promo|banner|share|social|related|popup)",
    re.I,
)
_POS_CLASS = re.compile(r"(content|article|main|post|body|entry|text|story)", re.I)


def _class_id_weight(node: Node) -> float:
    blob = " ".join([node.attrs.get("class") or "", node.attrs.get("id") or ""])
    w = 0.0
    if _NEG_CLASS.search(blob):
        w -= 1.0
    if _POS_CLASS.search(blob):
        w += 1.0
    return w


def _link_text_len(node: Node) -> int:
    return sum(len(a.text()) for a in node.find_all("a"))


def node_score(node: Node) -> float:
    """Composite content score in [0, ~1.1] (weights mirror the reference's
    0.4/0.2/0.2/0.1/0.1 composition, content_filter_strategy.py:729-764)."""
    text = node.text()
    text_len = len(text)
    total_len = max(1, len(node.serialize()))
    text_density = text_len / total_len
    link_density = _link_text_len(node) / text_len if text_len else 1.0
    tag_weight = _TAG_WEIGHTS.get(node.tag, 0.5)
    cls_w = _class_id_weight(node)
    len_factor = min(1.0, math.log(text_len + 1) / 8.0)
    return (
        0.4 * text_density
        + 0.2 * (1.0 - link_density)
        + 0.2 * tag_weight
        # DELIBERATE DIVERGENCE from the reference's 0.1 class weight
        # (content_filter_strategy.py:748): our [0,~1.1] composite needs
        # 0.15 for a negative chrome class to sink an otherwise-dense node
        # below the 0.48 threshold; at 0.1 the sidebar fixture survives.
        + 0.15 * cls_w
        + 0.1 * len_factor
    )


def _prune(node: Node, threshold: float) -> None:
    """Bottom-up: prune grandchildren first, then judge each child."""
    for child in list(node.children):
        if child.is_text:
            continue
        _prune(child, threshold)
        # void/empty structural leftovers with no text get removed
        if child.tag in ("img", "br", "hr"):
            continue
        if node_score(child) < threshold:
            child.detach()


def prune_fit_html(html: str, threshold: float = 0.48) -> tuple[list[str], str]:
    """Returns (surviving_blocks, fit_html). fit_html wraps each surviving
    top-level block in <div> exactly as the reference feeds fit content to
    its markdown stage."""
    root = parse_html(html or "")
    root.remove_tags(*CHROME_TAGS)
    body = root.find("body") or root
    _prune(body, threshold)
    blocks = [
        c.serialize()
        for c in body.children
        if not c.is_text and c.text().strip()
    ]
    # top-level loose text survives as its own block
    blocks += [
        c.attrs["text"].strip()
        for c in body.children
        if c.is_text and c.attrs["text"].strip()
    ]
    fit_html = "\n".join(f"<div>{b}</div>" for b in blocks)
    return blocks, fit_html
