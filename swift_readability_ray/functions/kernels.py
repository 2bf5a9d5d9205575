"""Reusable scalar kernels (SURVEY.md §2.8).

Pure functions over strings / DOM nodes; unit-tested table-driven. Semantics
follow Mozilla Readability.js v0.6.0 (behavior reference:
/root/reference/tmp-readability/Readability.js, and the reference port's
ProcessorBase.swift:49-56 / ArticleGrabber.swift:667-703).
"""

from __future__ import annotations

from urllib.parse import urljoin, urlparse

from .. import regexps as R
from ..dom import Element


def get_inner_text(el: Element, normalize_spaces: bool = True) -> str:
    """textContent trimmed; optionally collapse 2+ whitespace to one space."""
    text = el.text_content.strip()
    if normalize_spaces:
        return R.NORMALIZE.sub(" ", text)
    return text


def text_similarity(text_a: str, text_b: str) -> float:
    """1 - (length of B-tokens unique to B / length of all B tokens).

    Token split on non-word runs, lowercased (Readability.js _textSimilarity).
    """
    tokens_a = [t for t in R.TOKENIZE.split(text_a.lower()) if t]
    tokens_b = [t for t in R.TOKENIZE.split(text_b.lower()) if t]
    if not tokens_a or not tokens_b:
        return 0.0
    set_a = set(tokens_a)
    uniq_b = [t for t in tokens_b if t not in set_a]
    distance_b = len(" ".join(uniq_b)) / len(" ".join(tokens_b))
    return 1.0 - distance_b


def unescape_html_entities(s: str | None) -> str | None:
    """Named (quot/amp/apos/lt/gt) + numeric entities; invalid → U+FFFD."""
    if not s:
        return s

    def named(m):
        return R.HTML_ESCAPE_MAP[m.group(1)]

    def numeric(m):
        hex_part, dec_part = m.group(1), m.group(2)
        num = int(hex_part, 16) if hex_part else int(dec_part)
        if num == 0 or num > 0x10FFFF or (0xD800 <= num <= 0xDFFF):
            num = 0xFFFD
        return chr(num)

    return R.ENTITY_NUMERIC.sub(numeric, R.ENTITY_NAMED.sub(named, s))


def comma_segments(text: str) -> int:
    """Number of segments when splitting on the multi-script comma class.

    (= comma count + 1; Readability.js scores `split(commas).length`.)
    """
    return len(R.COMMAS.split(text))


def js_word_count(s: str) -> int:
    """JS `str.split(/\\s+/).length` — counts empty leading/trailing pieces."""
    import re

    return len(re.split(r"\s+", s))


def is_url(s: str) -> bool:
    """True when the string parses as an absolute URL (JS `new URL(str)`)."""
    try:
        p = urlparse(s)
    except ValueError:
        return False
    if not p.scheme:
        return False
    if p.netloc:
        return True
    return p.scheme in ("data", "mailto", "javascript", "about", "file", "tel", "urn")


def resolve_url(uri: str, base: str) -> str:
    """WHATWG-ish URL resolution (JS `new URL(uri, base).href`).

    Built on urllib.parse.urljoin with the divergences that matter patched
    (origin-only URLs gain a "/" path; absolute non-hierarchical schemes pass
    through untouched). Falls back to the input on error.
    """
    try:
        p = urlparse(uri)
        if p.scheme and p.scheme not in ("http", "https", "ftp"):
            return uri  # data:, mailto:, javascript:, file: … pass through
        resolved = urljoin(base, uri)
        rp = urlparse(resolved)
        if rp.scheme in ("http", "https", "ftp") and rp.netloc and rp.path == "":
            # new URL("http://x.com").href == "http://x.com/"
            resolved = resolved.split("#")[0].split("?")[0] + "/"
            if rp.query:
                resolved += "?" + rp.query
            if rp.fragment:
                resolved += "#" + rp.fragment
        return resolved
    except ValueError:
        return uri


def get_link_density(element: Element) -> float:
    """Σ(linkText·coeff)/textLen; coeff 0.3 for in-page `#…` hrefs."""
    text_length = len(get_inner_text(element))
    if text_length == 0:
        return 0.0
    link_length = 0.0
    for link in element.get_elements_by_tag_name("a"):
        href = link.get_attribute("href")
        coefficient = 0.3 if (href and R.HASH_URL.match(href)) else 1.0
        link_length += len(get_inner_text(link)) * coefficient
    return link_length / text_length
