"""isProbablyReaderable heuristic.

Semantics: Mozilla Readability-readerable.js (behavior reference:
/root/reference/tmp-readability/Readability-readerable.js; reference port
Readability.swift:234-308).  Non-destructive scan: selects ``p``/``pre``/
``article`` plus parents of ``div > br``, drops invisible / unlikely-class
nodes and ``p`` inside ``li``, and accumulates sqrt(textLen - minLen) until
the score crosses the threshold.
"""

from __future__ import annotations

import math

from .. import regexps as R
from ..dom import Document, Element


def _is_node_visible(node: Element) -> bool:
    style = node.get_attribute("style") or ""
    if style and R.DISPLAY_NONE.search(style):
        return False
    if node.has_attribute("hidden"):
        return False
    if (
        node.has_attribute("aria-hidden")
        and node.get_attribute("aria-hidden") == "true"
        and "fallback-image" not in node.class_name
    ):
        return False
    return True


def _has_ancestor_li(node: Element) -> bool:
    cur = node.parent
    while cur is not None and isinstance(cur, Element):
        if cur.tag == "li":
            return True
        cur = cur.parent
    return False


def is_probably_readerable(
    doc: Document,
    min_content_length: int = 140,
    min_score: float = 20.0,
    visibility_checker=None,
) -> bool:
    checker = visibility_checker or _is_node_visible

    nodes: list[Element] = []
    seen: set[int] = set()
    for el in doc.iter_elements():
        if el.tag in ("p", "pre", "article"):
            if id(el) not in seen:
                seen.add(id(el))
                nodes.append(el)
        elif el.tag == "br" and el.parent is not None and el.parent.tag == "div":
            parent = el.parent
            if id(parent) not in seen:
                seen.add(id(parent))
                nodes.append(parent)

    score = 0.0
    for node in nodes:
        if not checker(node):
            continue
        match_string = node.class_name + " " + node.id
        if R.UNLIKELY_CANDIDATES.search(match_string) and not R.OK_MAYBE_ITS_A_CANDIDATE.search(
            match_string
        ):
            continue
        # matches("li p"): a <p> with an <li> ancestor
        if node.tag == "p" and _has_ancestor_li(node):
            continue
        text_content_length = len(node.text_content.strip())
        if text_content_length < min_content_length:
            continue
        score += math.sqrt(text_content_length - min_content_length)
        if score > min_score:
            return True
    return False


def is_probably_readerable_html(
    html: str,
    min_content_length: int = 140,
    min_score: float = 20.0,
    visibility_checker=None,
) -> bool:
    """String-input convenience (reference static entry point,
    Readability.isProbablyReaderable(html:), Readability.swift:197-208)."""
    from ..dom import parse

    return is_probably_readerable(
        parse(html), min_content_length, min_score, visibility_checker
    )
