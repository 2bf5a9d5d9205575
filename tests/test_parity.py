"""Golden-corpus parity vs the Mozilla Readability test pages.

The reference repo vendors Mozilla's 130 test pages (source.html +
expected.html + expected-metadata.json).  We read them in place (read-only)
and assert full parity: every metadata field, the readerable flag, and the
whitespace-normalized article text must match on ALL fixtures.

Mirrors the reference's own test strategy (SURVEY.md §5) without copying any
fixture files into this repo.
"""

import difflib
import json
import os
import re

import pytest

from swift_readability_ray import ExtractOptions, extract
from swift_readability_ray.dom import parse

FIXTURES = "/root/reference/tmp-readability/test/test-pages"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference fixture corpus not available"
)

_WS = re.compile(r"\s+")


def _squash(t: str) -> str:
    return _WS.sub("", t)


def _names():
    return sorted(os.listdir(FIXTURES)) if os.path.isdir(FIXTURES) else []


@pytest.mark.parametrize("name", _names())
def test_fixture_parity(name):
    d = os.path.join(FIXTURES, name)
    with open(os.path.join(d, "source.html"), encoding="utf-8", errors="replace") as f:
        src = f.read()
    with open(os.path.join(d, "expected-metadata.json")) as f:
        exp = json.load(f)
    with open(os.path.join(d, "expected.html"), encoding="utf-8", errors="replace") as f:
        exp_html = f.read()

    r = extract(
        src,
        "http://fakehost/test/page.html",
        ExtractOptions(classes_to_preserve=("caption",)),
    )
    assert r is not None, "extraction returned no article"

    for key in ("title", "byline", "dir", "lang", "excerpt", "siteName", "publishedTime"):
        got = r[key]
        want = exp.get(key)
        assert (got or None) == (want or None), f"{key}: {want!r} != {got!r}"

    if "readerable" in exp:
        assert r["readerable"] == exp["readerable"]

    expected_text = _squash(parse(exp_html).text_content)
    got_text = _squash(r["textContent"])
    if expected_text != got_text:
        ratio = difflib.SequenceMatcher(
            None, expected_text[:30000], got_text[:30000]
        ).quick_ratio()
        pytest.fail(f"text mismatch (similarity {ratio:.4f})")

    # structural parity: order-preserving DOM walk comparing tag + ALL
    # attributes and whitespace-collapsed text, skipping blank text nodes
    # (mirrors the reference's DOMComparator, ReadabilityTests.swift:164-283)
    want = _dom_events(parse(exp_html))
    got = _dom_events(parse(r["content"]))
    if want != got:
        for i, (a, b) in enumerate(zip(want, got)):
            if a != b:
                pytest.fail(f"DOM diverges at event {i}: want={a!r} got={b!r}")
        pytest.fail(f"DOM event-count mismatch: {len(want)} vs {len(got)}")


def _dom_events(root):
    from swift_readability_ray.dom import Element, TextNode

    out = []
    stack = [root]
    while stack:
        n = stack.pop()
        if isinstance(n, TextNode):
            t = _WS.sub(" ", n.data).strip()
            if t:
                out.append(("#text", t))
            continue
        if isinstance(n, Element):
            if n.tag != "#document":
                out.append((n.tag, tuple(sorted(n.attrs.items()))))
            stack.extend(reversed(n.child_nodes))
    return out
