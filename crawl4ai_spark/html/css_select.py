"""Minimal CSS selector engine over the stdlib DOM-lite tree.

Supports the selector subset that covers the reference's shipped
JsonCssExtractionStrategy schemas (spec: /root/reference/crawl4ai/
extraction_strategy.py:804-1196 — baseSelector + per-field selectors):

- simple selectors: ``tag``, ``.class``, ``#id``, ``[attr]``, ``[attr=val]``
  and compounds thereof (``a.btn[href]``)
- combinators: descendant (whitespace) and child (``>``)
- selector lists: ``sel1, sel2`` (union, document order)

Pure-Python, used only inside Arrow pandas UDF batches.
"""

from __future__ import annotations

import re

from crawl4ai_spark.html.parser import Node

_SIMPLE_RE = re.compile(
    r"(?P<tag>[a-zA-Z][a-zA-Z0-9-]*|\*)?"
    r"(?P<rest>(?:[.#][\w-]+|\[[^\]]+\])*)"
)
_PART_RE = re.compile(r"([.#][\w-]+|\[[^\]]+\])")


def _parse_simple(token: str) -> dict:
    m = _SIMPLE_RE.match(token)
    if not m or (m.end() != len(token)):
        raise ValueError(f"unsupported selector: {token!r}")
    out = {"tag": m.group("tag") or "*", "classes": [], "id": None, "attrs": []}
    for part in _PART_RE.findall(m.group("rest") or ""):
        if part.startswith("."):
            out["classes"].append(part[1:])
        elif part.startswith("#"):
            out["id"] = part[1:]
        else:  # [attr] or [attr=val] / [attr="val"]
            body = part[1:-1]
            if "=" in body:
                k, v = body.split("=", 1)
                out["attrs"].append((k.strip(), v.strip().strip("\"'")))
            else:
                out["attrs"].append((body.strip(), None))
    return out


def _matches(node: Node, simple: dict) -> bool:
    if node.is_text:
        return False
    if simple["tag"] != "*" and node.tag != simple["tag"]:
        return False
    if simple["id"] is not None and node.attrs.get("id") != simple["id"]:
        return False
    if simple["classes"]:
        classes = set(node.classes())
        if not all(c in classes for c in simple["classes"]):
            return False
    for k, v in simple["attrs"]:
        if k not in node.attrs:
            return False
        if v is not None and (node.attrs.get(k) or "") != v:
            return False
    return True


def _scan_outside(selector: str):
    """Yield (char, outside) where ``outside`` means "at bracket depth 0
    and not inside a quoted string" — the ONE spelling of the depth scan
    both tokenizers share. Quote tracking keeps a '[' inside a quoted
    attribute value (e.g. ``[alt="a[b"]``) from corrupting the depth.
    (A literal ']' inside a quoted value is still unsupported — the
    simple-selector regex shares that limit.)"""
    depth = 0
    quote: str | None = None
    for ch in selector:
        if quote is not None:
            if ch == quote:
                quote = None
            yield ch, False
            continue
        if ch in "\"'":
            quote = ch
            yield ch, depth == 0
            continue
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth = max(0, depth - 1)
        yield ch, depth == 0


def _split_branches(selector: str) -> list[str]:
    """Split a selector list on commas OUTSIDE attribute brackets and
    quotes, so '[alt="x,y"]' stays one branch."""
    parts, buf = [], []
    for ch, outside in _scan_outside(selector):
        if ch == "," and outside:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    return parts


def _tokenize(selector: str) -> list[str]:
    """Whitespace/'>' tokenization that keeps bracketed attribute values
    intact, so '[title="a b"]' is one token."""
    toks: list[str] = []
    buf: list[str] = []
    for ch, outside in _scan_outside(selector):
        if outside and ch.isspace():
            if buf:
                toks.append("".join(buf))
                buf = []
        elif outside and ch == ">":
            if buf:
                toks.append("".join(buf))
                buf = []
            toks.append(">")
        else:
            buf.append(ch)
    if buf:
        toks.append("".join(buf))
    return toks


def _compile(selector: str) -> list[tuple[str, dict]]:
    """'a > b c' → [('desc', a), ('child', b), ('desc', c)]."""
    tokens = _tokenize(selector)
    steps: list[tuple[str, dict]] = []
    comb = "desc"
    for tok in tokens:
        if tok == ">":
            comb = "child"
            continue
        steps.append((comb, _parse_simple(tok)))
        comb = "desc"
    if not steps:
        raise ValueError(f"empty selector: {selector!r}")
    return steps


def select(root: Node, selector: str) -> list[Node]:
    """All elements under ``root`` matching ``selector``, document order."""
    results: list[Node] = []
    seen: set[int] = set()
    for branch in _split_branches(selector):
        branch = branch.strip()
        if not branch:
            continue
        steps = _compile(branch)
        current = [root]
        for comb, simple in steps:
            nxt: list[Node] = []
            nseen: set[int] = set()
            for base in current:
                if comb == "child":
                    cands = [c for c in base.children if not c.is_text]
                else:
                    cands = [n for n in base.iter() if n is not base]
                for c in cands:
                    if _matches(c, simple) and id(c) not in nseen:
                        nseen.add(id(c))
                        nxt.append(c)
            current = nxt
        for n in current:
            if id(n) not in seen:
                seen.add(id(n))
                results.append(n)
    # document order: index by pre-order position
    order = {id(n): i for i, n in enumerate(root.iter())}
    results.sort(key=lambda n: order.get(id(n), 1 << 30))
    return results


def select_one(root: Node, selector: str) -> Node | None:
    found = select(root, selector)
    return found[0] if found else None
