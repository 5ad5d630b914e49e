"""HTML → markdown + citation rewriting.

From-scratch markdown engine over the stdlib DOM-lite tree (the reference
vendors a html2text fork — /root/reference/crawl4ai/html2text/ — which is
unavailable here and may not be copied; this module re-implements the
html→markdown contract: headings, paragraphs, emphasis, inline/fenced code,
links, images, lists, blockquotes, tables, hr/br), plus the link→citation
pass (behavioral spec: markdown_generation_strategy.py:82-146 — number links
by first occurrence, rewrite as ``text⟨n⟩``, emit a ``## References``
block).

Pure functions — run inside Arrow pandas UDFs.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

from crawl4ai_spark.html.parser import Node, parse_html

_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
_SKIP = frozenset({"script", "style", "noscript", "meta", "link", "head", "title"})
_BLOCK_CONTAINERS = frozenset(
    {"#root", "html", "body", "div", "section", "article", "main", "aside",
     "header", "footer", "nav", "figure", "details", "summary"}
)


def _inline_el(c: Node) -> str:
    """Render one element node as inline markdown."""
    tag = c.tag
    if tag in _SKIP:
        return ""
    if tag in ("strong", "b"):
        inner = _inline(c)
        return f"**{inner}**" if inner else ""
    if tag in ("em", "i"):
        inner = _inline(c)
        return f"*{inner}*" if inner else ""
    if tag == "code":
        inner = c.text()
        return f"`{inner}`" if inner else ""
    if tag == "a":
        inner = _inline(c) or c.attrs.get("href", "")
        href = c.attrs.get("href", "")
        title = c.attrs.get("title")
        if href:
            return f'[{inner}]({href} "{title}")' if title else f"[{inner}]({href})"
        return inner
    if tag == "img":
        alt = c.attrs.get("alt", "")
        src = c.attrs.get("src", "")
        return f"![{alt}]({src})" if src else ""
    if tag == "br":
        return "\n"
    return _inline(c)


def _inline(node: Node) -> str:
    """Render a node's content as inline markdown."""
    parts: list[str] = []
    for c in node.children:
        if c.is_text:
            t = " ".join(c.attrs["text"].split())
            if t:
                parts.append(t)
            continue
        rendered = _inline_el(c)
        if rendered:
            parts.append(rendered)
    out = " ".join(p for p in parts if p)
    # un-space around forced line breaks
    return re.sub(r" ?\n ?", "\n", out)


def _table_md(node: Node) -> str:
    headers = [th.text() for th in node.find_all("th")]
    rows = []
    for tr in node.find_all("tr"):
        cells = [td.text() for td in tr.find_all("td")]
        if cells:
            rows.append(cells)
    if not headers and rows:
        headers = rows.pop(0)
    if not headers:
        return ""
    lines = [
        "| " + " | ".join(headers) + " |",
        "| " + " | ".join("---" for _ in headers) + " |",
    ]
    for r in rows:
        lines.append("| " + " | ".join(r) + " |")
    return "\n".join(lines)


def _blocks(node: Node, out: list[str], list_depth: int = 0) -> None:
    for c in node.children:
        if c.is_text:
            t = " ".join(c.attrs["text"].split())
            if t:
                out.append(t)
            continue
        tag = c.tag
        if tag in _SKIP:
            continue
        if tag in _HEADINGS:
            text = _inline(c)
            if text:
                out.append("#" * _HEADINGS[tag] + " " + text)
        elif tag == "p":
            text = _inline(c)
            if text:
                out.append(text)
        elif tag == "pre":
            code = c.find("code")
            raw = (code if code is not None else c).raw_text().strip("\n")
            out.append(f"```\n{raw}\n```")
        elif tag in ("ul", "ol"):
            items = []
            idx = 1
            for li in c.children:
                if li.is_text or li.tag != "li":
                    continue
                marker = f"{idx}. " if tag == "ol" else "- "
                idx += 1
                sub: list[str] = []
                _blocks(li, sub, list_depth + 1)
                inline_text = _inline(li)
                body = inline_text if inline_text else " ".join(sub)
                items.append("  " * list_depth + marker + body)
            if items:
                out.append("\n".join(items))
        elif tag == "blockquote":
            sub: list[str] = []
            _blocks(c, sub, list_depth)
            if sub:
                out.append("\n".join("> " + line for line in "\n\n".join(sub).split("\n")))
        elif tag == "table":
            md = _table_md(c)
            if md:
                out.append(md)
        elif tag == "hr":
            out.append("---")
        elif tag in _BLOCK_CONTAINERS:
            _blocks(c, out, list_depth)
        else:
            # inline element at block level (e.g. a bare <a> or <img>) —
            # render the element itself, not just its children
            text = _inline_el(c)
            if text:
                out.append(text)


def html_to_markdown(html: str) -> str:
    root = parse_html(html or "")
    out: list[str] = []
    _blocks(root, out)
    md = "\n\n".join(b for b in out if b.strip())
    return md.strip()


_LINK_RE = re.compile(r"!?\[([^\]]*)\]\(([^)\s]+)(?:\s+\"[^\"]*\")?\)")


def links_to_citations(markdown: str, base_url: str = "") -> tuple[str, str]:
    """Rewrite markdown links as ``text⟨n⟩`` numbered by first URL occurrence
    and return (markdown_with_citations, references_markdown). Image links
    keep their alt text but are cited too (spec: reference
    markdown_generation_strategy.py:82-146)."""
    numbers: dict[str, int] = {}
    titles: dict[str, str] = {}

    def sub(m: re.Match) -> str:
        text, href = m.group(1), m.group(2)
        url = urljoin(base_url, href) if base_url else href
        if url not in numbers:
            numbers[url] = len(numbers) + 1
            titles[url] = text
        n = numbers[url]
        if m.group(0).startswith("!"):
            return f"![{text}⟨{n}⟩]"
        return f"{text}⟨{n}⟩"

    cited = _LINK_RE.sub(sub, markdown)
    if not numbers:
        return cited, ""
    lines = ["## References", ""]
    for url, n in sorted(numbers.items(), key=lambda kv: kv[1]):
        t = titles[url]
        lines.append(f"⟨{n}⟩ {url}" + (f": {t}" if t else ""))
    return cited, "\n".join(lines)
