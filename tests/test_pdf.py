"""PDF/layout parse: writer round-trip, escapes, compression, reading
order, image media blocks, and per-row error isolation in the Ray stage."""

import pyarrow as pa
import pytest

from swift_readability_ray.functions.pdf import (
    extract_pdf_blocks,
    make_simple_pdf,
    pdf_to_spans,
)


def test_roundtrip_plain_and_compressed():
    paras = ["First paragraph with words.", "Second (with parens) and \\ slash.",
             "Third: umlauts äöü survive latin-1."]
    for compress in (False, True):
        pdf = make_simple_pdf(paras, page_paras=2, compress=compress)
        assert pdf.startswith(b"%PDF-1.4")
        blocks = extract_pdf_blocks(pdf)
        texts = [b["text"] for b in blocks if b["kind"] == "text"]
        assert texts == paras, compress
        assert max(b["page"] for b in blocks) == 1  # 2 paras/page -> 2 pages


def test_string_escapes_decoded():
    pdf = (b"1 0 obj << /Length 60 >> stream\n"
           b"BT 36 700 Td (line\\none\\ttab \\(x\\) \\\\ \\101) Tj ET\n"
           b"endstream\n")
    blocks = extract_pdf_blocks(pdf)
    assert blocks[0]["text"] == "line\none\ttab (x) \\ A"  # \101 is octal 'A'


def test_reading_order_resorts_content():
    pdf = (b"1 0 obj << /Length 90 >> stream\n"
           b"BT 36 100 Td (bottom) Tj ET\n"
           b"BT 36 700 Td (top) Tj ET\n"
           b"BT 200 700 Td (right) Tj ET\n"
           b"endstream\n")
    assert [b["text"] for b in extract_pdf_blocks(pdf)] == ["top", "right", "bottom"]


def test_tj_array_concatenates():
    pdf = (b"1 0 obj << /Length 60 >> stream\n"
           b"BT 36 700 Td [ (Hel) -20 (lo ) 5 (world) ] TJ ET\n"
           b"endstream\n")
    assert extract_pdf_blocks(pdf)[0]["text"] == "Hello world"


def test_image_xobject_becomes_media_span():
    pdf = (b"1 0 obj << /Subtype /Image /Length 3 >> stream\n"
           b"\x00\x01\x02endstream\n"
           b"2 0 obj << /Length 40 >> stream\n"
           b"BT 36 700 Td (text) Tj ET\nendstream\n")
    spans = pdf_to_spans(pdf)
    kinds = [(s["kind"], s["media_ref"]) for s in spans]
    assert ("media", "pdf:img1") in kinds
    assert [s["offset"] for s in spans] == list(range(len(spans)))


def test_empty_and_garbage_inputs():
    assert extract_pdf_blocks(b"") == []
    assert extract_pdf_blocks(b"not a pdf at all") == []
    # corrupt flate stream is skipped, not fatal
    bad = b"1 0 obj << /Filter /FlateDecode /Length 5 >> stream\nXXXXXendstream\n"
    assert extract_pdf_blocks(bad) == []


def test_stage_error_isolation(ray_session):
    import ray.data as rd

    from swift_readability_ray.stages.pdf_layout import PdfLayoutParser

    good = make_simple_pdf(["alpha beta"], compress=True)
    tbl = pa.table(
        {"doc_id": pa.array([1, 2], pa.int64()),
         "payload": pa.array([good, None], pa.binary())}
    )
    out = pa.concat_tables(list(
        rd.from_arrow(tbl)
        .map_batches(PdfLayoutParser, batch_format="pyarrow", concurrency=(1, 2), batch_size=2)
        .iter_batches(batch_format="pyarrow")
    )).sort_by("doc_id")
    rows = out.to_pylist()
    assert rows[0]["n_blocks"] == 1 and rows[0]["error"] is None
    assert rows[0]["spans"][0]["text"] == "alpha beta"
    assert rows[1]["n_blocks"] == 0 and rows[1]["error"] is None  # empty, not a crash


def test_operator_names_inside_text_do_not_truncate():
    """'ET'/'BT'/'Tj' as substrings of shown text (BUDGET, ROBOT...) must
    not be mistaken for operators — the tokenizer consumes strings first."""
    pdf = (b"1 0 obj << /Length 120 >> stream\n"
           b"BT 36 700 Td (BUDGET REPORT) Tj ET\n"
           b"BT 36 660 Td (ROBOT BT ET Tj TJ inside) Tj ET\n"
           b"endstream\n")
    texts = [b["text"] for b in extract_pdf_blocks(pdf)]
    assert texts == ["BUDGET REPORT", "ROBOT BT ET Tj TJ inside"]


def test_balanced_parens_in_string():
    pdf = (b"1 0 obj << /Length 60 >> stream\n"
           b"BT 36 700 Td (outer (nested) tail) Tj ET\n"
           b"endstream\n")
    assert extract_pdf_blocks(pdf)[0]["text"] == "outer (nested) tail"


def test_pdf_roundtrip_property():
    """Property: any latin-1 paragraph list round-trips through write+parse
    in order, compressed or not (incl. parens, backslashes, newlines)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    alphabet = st.characters(min_codepoint=32, max_codepoint=255, blacklist_characters="\x7f")
    paras_strategy = st.lists(
        st.text(alphabet=alphabet, min_size=0, max_size=60), min_size=1, max_size=6
    )

    @settings(max_examples=40, deadline=None)
    @given(paras=paras_strategy, compress=st.booleans(), per_page=st.integers(1, 3))
    def check(paras, compress, per_page):
        pdf = make_simple_pdf(paras, page_paras=per_page, compress=compress)
        texts = [b["text"] for b in extract_pdf_blocks(pdf) if b["kind"] == "text"]
        assert texts == paras

    check()
