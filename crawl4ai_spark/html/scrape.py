"""Per-page scrape: cleaned_html, text, links, media, tables, metadata, lang.

From-scratch restatement of the reference's scraping contract
(behavioral spec: /root/reference/crawl4ai/content_scraping_strategy.py —
``WebScrapingStrategy._scrap`` :845-1097 and the LXML default variant
:1100-1864; image scoring :420-566; data-table detection :201-346; metadata
extraction utils.py:1562-1643; link intrinsic scoring utils.py:3123-3237).

Pure function of (html, url) — safe to run inside an Arrow pandas UDF.
"""

from __future__ import annotations

import re

from crawl4ai_spark.functions.urlnorm import (
    get_base_domain,
    is_external_url,
    normalize_url,
)
from crawl4ai_spark.html.parser import Node, parse_html

REMOVE_TAGS = ("script", "style", "link", "meta", "noscript")

_IMG_FORMATS = (".jpg", ".jpeg", ".png", ".webp", ".gif", ".svg", ".avif")

_META_KEEP = frozenset({"description", "keywords", "author"})
_META_PROP_PREFIXES = ("og:", "twitter:", "article:")

_BAD_LINK_CLASS = re.compile(r"(nav|menu|footer|sidebar|ad[sv]?|promo|banner)", re.I)
_GOOD_PATH = re.compile(r"/(docs?|blog|articles?|guide|tutorial|news)(/|$)", re.I)
_BAD_PATH = re.compile(r"/(login|signin|signup|register|admin|cart|checkout)(/|$)", re.I)


def link_intrinsic_score(text: str, href: str, title: str, class_attr: str, rel: str) -> float:
    """0-10 link quality score (spec: reference utils.py:3123-3237 — same
    signals, reimplemented formula)."""
    score = 5.0
    words = len(text.split())
    if 2 <= words <= 10:
        score += 1.5
    elif words == 0:
        score -= 2.0
    if title:
        score += 0.5
    if _BAD_LINK_CLASS.search(class_attr or ""):
        score -= 2.0
    rel_vals = (rel or "").lower().split()
    if "nofollow" in rel_vals or "sponsored" in rel_vals:
        score -= 1.0
    if _GOOD_PATH.search(href):
        score += 1.5
    if _BAD_PATH.search(href):
        score -= 2.5
    if len(href) > 200:
        score -= 1.0
    return max(0.0, min(10.0, score))


def score_image(node: Node, index: int, total: int) -> int:
    """Image usefulness score (spec: reference content_scraping_strategy.py
    :420-566): size, alt, early position, known format, srcset/picture."""
    score = 0
    try:
        w = int(node.attrs.get("width") or 0)
        h = int(node.attrs.get("height") or 0)
    except ValueError:
        w = h = 0
    if w >= 150 or h >= 150:
        score += 2
    if (node.attrs.get("alt") or "").strip():
        score += 1
    if total > 0 and index < max(1, total / 2):
        score += 1
    src = (node.attrs.get("src") or "").lower()
    if any(src.split("?")[0].endswith(f) for f in _IMG_FORMATS):
        score += 1
    if node.attrs.get("srcset") or (node.parent is not None and node.parent.tag == "picture"):
        score += 1
    return score


def is_data_table(table: Node) -> tuple[int, list[Node]]:
    """Heuristic data-table score (spec: reference :201-273, threshold 7).
    Returns (score, body_rows)."""
    score = 0
    if table.find("thead") is not None:
        score += 2
    if table.find("tbody") is not None:
        score += 1
    ths = table.find_all("th")
    if ths:
        score += 2
    rows = [r for r in table.find_all("tr")]
    body_rows = [r for r in rows if r.find("td") is not None]
    if body_rows:
        score += 1
    col_counts = {len(r.find_all("td", "th")) for r in rows}
    if len(col_counts) == 1 and col_counts != {0}:
        score += 2
    if table.find("caption") is not None:
        score += 1
    if (table.attrs.get("role") or "").lower() == "table":
        score += 1
    if any("data-" in k for k in table.attrs):
        score += 1
    return score, body_rows


def extract_table(table: Node) -> dict:
    headers = [th.text() for th in table.find_all("th")]
    rows = []
    for tr in table.find_all("tr"):
        cells = [td.text() for td in tr.find_all("td")]
        if cells:
            rows.append(cells)
    cap = table.find("caption")
    return {
        "headers": headers,
        "rows": rows,
        "caption": cap.text() if cap is not None else "",
    }


def extract_metadata(root: Node) -> dict[str, str]:
    meta: dict[str, str] = {}
    title = root.find("title")
    if title is not None:
        meta["title"] = title.text()
    for m in root.find_all("meta"):
        name = (m.attrs.get("name") or "").lower()
        prop = (m.attrs.get("property") or "").lower()
        content = m.attrs.get("content") or ""
        if name in _META_KEEP:
            meta[name] = content
        elif prop and prop.startswith(_META_PROP_PREFIXES):
            meta[prop] = content
    return meta


def scrape_page(html: str, url: str, table_score_threshold: int = 7, image_score_threshold: int = 2) -> dict:
    """Full scrape of one page. Returns a dict matching SCRAPE_RESULT_STRUCT."""
    try:
        root = parse_html(html or "")
    except Exception:
        root = Node("#root")

    html_el = root.find("html")
    lang = (html_el.attrs.get("lang") or "") if html_el is not None else ""

    metadata = extract_metadata(root)  # before <meta> removal
    base_domain = get_base_domain(url)

    # -- links (first-wins dedup by normalized href, spec :683-691) ----------
    links: list[dict] = []
    seen_hrefs: set[str] = set()
    for a in root.find_all("a"):
        href = a.attrs.get("href")
        if not href:
            continue
        norm = normalize_url(href, url)
        if not norm or norm in seen_hrefs:
            continue
        seen_hrefs.add(norm)
        text = a.text()
        title = a.attrs.get("title") or ""
        links.append(
            {
                "href": norm,
                "text": text,
                "title": title,
                "base_domain": get_base_domain(norm),
                "is_external": is_external_url(norm, base_domain),
                "intrinsic_score": link_intrinsic_score(
                    text, norm, title, a.attrs.get("class") or "", a.attrs.get("rel") or ""
                ),
            }
        )

    # -- media ----------------------------------------------------------------
    media: list[dict] = []
    imgs = root.find_all("img")
    for i, img in enumerate(imgs):
        score = score_image(img, i, len(imgs))
        if score < image_score_threshold:
            continue
        def _int(v):
            try:
                return int(v)
            except (TypeError, ValueError):
                return None
        media.append(
            {
                "src": img.attrs.get("src") or "",
                "alt": img.attrs.get("alt") or "",
                "media_type": "image",
                "score": score,
                "width": _int(img.attrs.get("width")),
                "height": _int(img.attrs.get("height")),
            }
        )
    for tag, mt in (("video", "video"), ("audio", "audio")):
        for el in root.find_all(tag):
            src = el.attrs.get("src") or ""
            if not src:
                s = el.find("source")
                src = (s.attrs.get("src") if s is not None else "") or ""
            media.append(
                {"src": src, "alt": el.attrs.get("title") or "", "media_type": mt,
                 "score": 0, "width": None, "height": None}
            )

    # -- tables ---------------------------------------------------------------
    tables: list[dict] = []
    for t in root.find_all("table"):
        score, body_rows = is_data_table(t)
        if score >= table_score_threshold and body_rows:
            tables.append(extract_table(t))

    # -- cleaned html + text --------------------------------------------------
    root.remove_tags(*REMOVE_TAGS)
    body = root.find("body") or root
    cleaned_html = body.serialize_children().strip()
    # final whitespace squeeze, mirroring the reference's cleanup pass
    # (spec content_scraping_strategy.py:1089)
    cleaned_html = cleaned_html.replace("\n\n", "\n").replace("  ", " ")
    text = body.text(separator=" ")

    return {
        "cleaned_html": cleaned_html,
        "text": text,
        "links": links,
        "media": media,
        "tables": tables,
        "metadata": metadata,
        "lang": lang,
        "success": True,
    }
