"""Property tests (hypothesis) for the scalar kernels of SURVEY.md §2.8."""

import html as _html

from hypothesis import given, settings
from hypothesis import strategies as st

from swift_readability_ray.functions import text_stats as T
from swift_readability_ray.functions.kernels import (
    comma_segments,
    text_similarity,
    unescape_html_entities,
)

FAST = settings(max_examples=60, deadline=None)


@FAST
@given(st.text(max_size=200))
def test_unescape_roundtrips_stdlib_escape(s):
    # html.escape emits only the named/numeric entities the reference
    # supports (quot amp apos lt gt + hex), so unescape must invert it
    assert unescape_html_entities(_html.escape(s, quote=True)) == s


@FAST
@given(st.text(max_size=200))
def test_text_similarity_bounds_and_identity(s):
    sim = text_similarity(s, s)
    assert 0.0 <= sim <= 1.0
    # JS \W is ASCII: tokens are [A-Za-z0-9_]+ runs (upstream parity)
    import re

    tokens = re.findall(r"[A-Za-z0-9_]+", s)
    if tokens:
        assert sim == 1.0


@FAST
@given(st.text(max_size=200), st.text(max_size=200))
def test_text_similarity_range(a, b):
    assert 0.0 <= text_similarity(a, b) <= 1.0


@FAST
@given(st.text(max_size=300))
def test_comma_segments_positive(s):
    # splitting on the comma class yields at least one segment
    assert comma_segments(s) >= 1


@FAST
@given(st.text(max_size=300))
def test_simhash_deterministic_and_self_distance(s):
    h1, h2 = T.simhash64(s), T.simhash64(s)
    assert h1 == h2
    assert 0 <= h1 < (1 << 64)
    assert T.hamming64(h1, h2) == 0


@FAST
@given(st.text(max_size=300))
def test_ngram_jaccard_bounds_and_identity(s):
    j = T.ngram_jaccard(s, s)
    assert 0.0 <= j <= 1.0
    if len(T.word_shingles(s)) > 0:
        assert j == 1.0


@FAST
@given(st.text(max_size=300))
def test_token_counts_consistent(s):
    ws = T.ws_token_count(s)
    bpe = T.bpe_token_count(s)
    assert ws >= 0 and bpe >= 0
    # BPE-ish tokenization never merges across whitespace → at least as many
    assert bpe >= ws


@FAST
@given(st.text(max_size=300))
def test_quality_score_bounds(s):
    assert 0.0 <= T.quality_score(s) <= 1.0


@FAST
@given(st.text(max_size=200))
def test_lang_id_returns_known_code(s):
    assert isinstance(T.lang_id(s), str)


@FAST
@given(st.integers(min_value=0, max_value=1 << 63), st.integers(min_value=0, max_value=1 << 63))
def test_hamming_symmetry(a, b):
    assert T.hamming64(a, b) == T.hamming64(b, a)
    assert T.hamming64(a, a) == 0


# --------------------------------------------------------------- extraction

_HTML_BITS = st.sampled_from([
    "<div>", "</div>", "<p>", "</p>", "<a href='/x'>", "</a>", "<br>",
    "<!-- c -->", "<script>x()</script>", "<img src=i.png>", "&amp;", "&#65;",
    "text one, two, three. ", "<table><tr><td>c</td></tr></table>",
    "<h1>Head</h1>", "<span>", "</span>", "<b>", "словá ", "漢字テスト ",
    "<noscript><img src=n.png></noscript>", "<style>p{}</style>", "<<>>",
    "\x00", "<p attr='v\"w'>", "</bogus>", "<?pi?>", "<![CDATA[x]]>",
    # tree-construction fixup fodder (round 2): misnested formatting,
    # table fostering, stray table structure, nested/unclosed tables
    "</b>", "<table>", "</table>", "<tr>", "<td>", "</td>", "</tr>",
    "<tbody>", "<i>", "</i>", "<em>x<p>y</em>z</p>",
    "<table>loose<td>cell", "<li>", "</li>", "<ul>", "</ul>",
    '<input type="hidden">', "<caption>",
])


@settings(max_examples=40, deadline=None)
@given(st.lists(_HTML_BITS, min_size=1, max_size=40))
def test_extract_never_raises_and_invariants_hold(bits):
    from swift_readability_ray import extract
    from swift_readability_ray.spans import emit_spans

    html = "".join(bits)
    r = extract(html, "http://x.com/a/")  # must not raise on any input
    if r is None:
        return
    assert r["length"] == len(r["textContent"])
    spans = emit_spans(r["article_element"])
    # span invariant: offsets are the emission order, media refs non-empty
    assert [s["offset"] for s in spans] == list(range(len(spans)))
    for s in spans:
        assert s["kind"] in ("text", "media")
        if s["kind"] == "media":
            assert s["media_ref"]
        else:
            assert s["text"]


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.sampled_from("abc defg hij klmno pq rstu vwx yz".split()),
             min_size=0, max_size=30),
    st.lists(st.sampled_from("abc defg hij klmno pq rstu vwx yz".split()),
             min_size=0, max_size=30),
    st.lists(st.sampled_from("one two three four five six seven eight".split()),
             min_size=6, max_size=10),
)
def test_winnowing_shared_run_guarantee(prefix_a, prefix_b, shared):
    # Schleimer et al. 2003 §3: documents sharing a run of
    # >= window + gram_n - 1 tokens (6 with the defaults) share at least
    # one selected fingerprint HASH; and winnowing density is bounded
    from swift_readability_ray.pipelines.training_data import _winnow_doc

    a = " ".join(prefix_a + shared)
    b = " ".join(prefix_b + shared)
    _, ha = _winnow_doc(a, 3, 4)
    _, hb = _winnow_doc(b, 3, 4)
    assert set(ha.tolist()) & set(hb.tolist())
    # every window selects something: gaps between consecutive selected
    # positions never exceed the window length
    pa_, _ = _winnow_doc(a, 3, 4)
    if len(pa_) > 1:
        import numpy as np

        assert int(np.diff(pa_).max()) <= 4
