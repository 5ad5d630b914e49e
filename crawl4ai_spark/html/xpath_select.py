"""Minimal XPath engine over the stdlib DOM-lite tree.

Covers the selector subset the reference's JsonXPathExtractionStrategy
schemas use in practice (spec: /root/reference/crawl4ai/
extraction_strategy.py:1612-1705 — element-returning location paths):

- axes: ``//tag`` (descendant), ``/tag`` (child), relative ``.//tag`` /
  ``./tag``; chains thereof (``//div/ul//li``)
- node tests: tag names and ``*``
- predicates: ``[@attr]``, ``[@attr='v']`` / ``[@attr="v"]``, positional
  ``[n]`` (1-based, per context element)

Pure Python, runs only inside Arrow pandas UDF batches.
"""

from __future__ import annotations

import re

from crawl4ai_spark.html.parser import Node

_STEP_RE = re.compile(
    r"(?P<tag>[a-zA-Z][a-zA-Z0-9-]*|\*)(?P<preds>(?:\[[^\]]*\])*)"
)
_PRED_RE = re.compile(r"\[([^\]]*)\]")
_ATTR_EQ_RE = re.compile(r"^@([\w:-]+)\s*=\s*(['\"])(.*)\2$")
_ATTR_RE = re.compile(r"^@([\w:-]+)$")


def _parse_steps(path: str) -> list[tuple[str, str, list[str]]]:
    """path → [(axis, tag, predicates)] with axis ∈ {'desc','child'}."""
    s = path.strip()
    if s.startswith("."):
        s = s[1:]
    steps: list[tuple[str, str, list[str]]] = []
    i = 0
    axis = "child"
    while i < len(s):
        if s.startswith("//", i):
            axis = "desc"
            i += 2
        elif s.startswith("/", i):
            axis = "child"
            i += 1
        m = _STEP_RE.match(s, i)
        if not m:
            raise ValueError(f"unsupported xpath step at {s[i:]!r} in {path!r}")
        steps.append((axis, m.group("tag"), _PRED_RE.findall(m.group("preds") or "")))
        i = m.end()
    if not steps:
        raise ValueError(f"empty xpath: {path!r}")
    return steps


def _match_preds(node: Node, preds: list[str]) -> bool:
    """Attribute predicates only (positional handled by the caller)."""
    for p in preds:
        p = p.strip()
        if p.isdigit():
            continue
        m = _ATTR_EQ_RE.match(p)
        if m:
            if (node.attrs.get(m.group(1)) or "") != m.group(3):
                return False
            continue
        m = _ATTR_RE.match(p)
        if m:
            if m.group(1) not in node.attrs:
                return False
            continue
        raise ValueError(f"unsupported xpath predicate: {p!r}")
    return True


def _positions(preds: list[str]) -> int | None:
    for p in preds:
        if p.strip().isdigit():
            return int(p.strip())
    return None


def xpath_select(root: Node, path: str) -> list[Node]:
    """All elements matching ``path`` relative to ``root``, document order."""
    steps = _parse_steps(path)
    current = [root]
    for axis, tag, preds in steps:
        pos = _positions(preds)
        nxt: list[Node] = []
        seen: set[int] = set()
        for base in current:
            if axis == "child":
                cands = [c for c in base.children if not c.is_text]
            else:
                cands = [n for n in base.iter() if n is not base]
            matched = [
                c
                for c in cands
                if (tag == "*" or c.tag == tag) and _match_preds(c, preds)
            ]
            if pos is not None:
                # positional predicates count within each parent element
                # (XPath proximity position: //li[1] is every first-li)
                by_parent: dict[int, list[Node]] = {}
                for c in matched:
                    by_parent.setdefault(id(c.parent), []).append(c)
                matched = [
                    grp[pos - 1] for grp in by_parent.values() if len(grp) >= pos
                ]
            for c in matched:
                if id(c) not in seen:
                    seen.add(id(c))
                    nxt.append(c)
        current = nxt
    order = {id(n): i for i, n in enumerate(root.iter())}
    current.sort(key=lambda n: order.get(id(n), 1 << 30))
    return current
