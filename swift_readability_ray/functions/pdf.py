"""Minimal PDF generation + text/layout extraction (pure Python + zlib).

The north rule names "PDF/layout parse" as an extraction capability.  No
PDF library ships in this container, so this module implements the real
subset directly:

- **make_simple_pdf**: a correct single-file PDF writer (one page per
  ``page_paras`` paragraphs, Helvetica, optional Flate-compressed content
  streams) used to synthesize deterministic PDF corpora for tests/benches.
- **extract_pdf_blocks**: a content-stream scanner covering the common
  text-showing machinery: ``stream``/``endstream`` objects (raw or
  /FlateDecode via zlib), ``BT``/``ET`` text objects, ``Tj`` and ``TJ``
  show operators, PDF string escapes (``\\``, ``\(``, ``\)``, ``\n`` etc.
  and octal), and text positioning via ``Td``/``TD``/``Tm`` so blocks can
  be re-ordered into reading order (page, top-to-bottom, left-to-right).
  Image XObjects (``/Subtype /Image``) are surfaced as media blocks.

Limitations (documented, by design): no xref/incremental-update walking
(streams are discovered by scanning, which is robust for linear files),
no font-encoding translation (text is treated as Latin-1/ASCII, which the
synthesized corpora and most simple generators satisfy), no encryption.
"""

from __future__ import annotations

import re
import zlib

# ----------------------------------------------------------------- writer

_ESC = {ord("\\"): "\\\\", ord("("): "\\(", ord(")"): "\\)"}


def _pdf_escape(s: str) -> str:
    return s.translate(_ESC)


def make_simple_pdf(
    paragraphs: list[str], page_paras: int = 20, compress: bool = False
) -> bytes:
    """A valid minimal PDF: ``page_paras`` paragraphs per page, one
    ``BT … Tj … ET`` text object per paragraph, descending y positions."""
    paras = paragraphs or [""]
    pages = [paras[i : i + page_paras] for i in range(0, len(paras), page_paras)]

    objs: list[bytes] = []  # 1-indexed object bodies (without obj header)

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    page_ids: list[int] = []
    content_ids: list[int] = []
    for page in pages:
        parts = []
        y = 760
        for p in page:
            parts.append(
                f"BT /F1 10 Tf 36 {y} Td ({_pdf_escape(p)}) Tj ET".encode("latin-1", "replace")
            )
            y -= 36
        content = b"\n".join(parts)
        if compress:
            data = zlib.compress(content)
            body = (
                b"<< /Length " + str(len(data)).encode() + b" /Filter /FlateDecode >>\n"
                b"stream\n" + data + b"\nendstream"
            )
        else:
            body = (
                b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
                + content + b"\nendstream"
            )
        content_ids.append(add(body))
    pages_id = len(objs) + len(pages) + 1  # after page objects
    for cid in content_ids:
        page_ids.append(
            add(
                b"<< /Type /Page /Parent " + str(pages_id).encode() + b" 0 R "
                b"/MediaBox [0 0 612 792] /Contents " + str(cid).encode() + b" 0 R "
                b"/Resources << /Font << /F1 " + str(font).encode() + b" 0 R >> >> >>"
            )
        )
    kids = b" ".join(str(i).encode() + b" 0 R" for i in page_ids)
    real_pages_id = add(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count " + str(len(page_ids)).encode() + b" >>"
    )
    assert real_pages_id == pages_id
    catalog = add(b"<< /Type /Catalog /Pages " + str(pages_id).encode() + b" 0 R >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for n, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += str(n).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += ("%010d 00000 n \n" % off).encode()
    out += (
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root " + str(catalog).encode() + b" 0 R >>\n"
        b"startxref\n" + str(xref_at).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


# ----------------------------------------------------------------- reader

# dict head must not span other objects: no bare '<'/'>' except one level
# of nested <<...>> (Resources etc.)
_STREAM_RE = re.compile(
    rb"<<((?:[^<>]|<<[^<>]*>>)*)>>\s*stream\r?\n(.*?)endstream", re.S
)
# one string-literal token with escapes and one level of balanced parens
_PDF_STR = rb"\(((?:[^()\\]|\\.|\((?:[^()\\]|\\.)*\))*)\)"
# content-stream tokenizer: strings are consumed as whole tokens FIRST, so
# operator names occurring inside shown text (…BUDGET…, "(ET)") can never
# be mistaken for the ET / Tj operators — the bug class a naive
# BT(.*?)ET regex has
_CONTENT_TOKEN = re.compile(
    _PDF_STR                                    # 1: string literal
    + rb"|(-?[\d.]+)"                           # 2: numeric operand
    + rb"|(BT|ET|Tj|TJ|Td|TD|Tm)(?![A-Za-z])"  # 3: operators we track
    + rb"|/[^\s/<>\[\]()]*"                     # name object (skipped)
    + rb"|<[0-9A-Fa-f\s]*>",                    # hex string (skipped)
    re.S,
)
_OCTAL_RE = re.compile(rb"\\([0-7]{1,3})")
_IMAGE_RE = re.compile(rb"/Subtype\s*/Image")

_SIMPLE_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\x08", b"f": b"\x0c",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _decode_pdf_string(raw: bytes) -> str:
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        m = _OCTAL_RE.match(raw, i)
        if m:
            out.append(int(m.group(1), 8) & 0xFF)
            i = m.end()
            continue
        nxt = raw[i + 1 : i + 2]
        if nxt in _SIMPLE_ESCAPES:
            out += _SIMPLE_ESCAPES[nxt]
            i += 2
        elif nxt in (b"\n", b"\r"):  # line continuation: consume the EOL
            i += 2
            if nxt == b"\r" and raw[i : i + 1] == b"\n":
                i += 1  # backslash-CRLF is ONE line continuation, not \r + \n
        else:  # unknown escape: PDF spec says drop the backslash
            out += nxt
            i += 2
    return out.decode("latin-1")


def extract_pdf_blocks(payload: bytes) -> list[dict]:
    """Ordered layout blocks from a PDF byte string.

    Returns dicts ``{kind: "text"|"media", text, media_ref, page, x, y}``
    sorted into reading order (page, y descending, x ascending); media
    blocks (image XObjects) keep stream order at the end of their page
    group (page -1 when unknown — scan-based discovery has no page map).
    """
    blocks: list[dict] = []
    page = -1
    img_n = 0
    for m in _STREAM_RE.finditer(payload):
        head, data = m.group(1), m.group(2)
        if _IMAGE_RE.search(head):
            img_n += 1
            blocks.append(
                {"kind": "media", "text": "", "media_ref": f"pdf:img{img_n}",
                 "page": page, "x": 0.0, "y": float("-inf")}
            )
            continue
        if b"/FlateDecode" in head:
            try:
                data = zlib.decompress(data)
            except zlib.error:
                continue
        if b"BT" not in data:
            continue
        page += 1
        # single-pass token scan with string-aware tokenization
        in_text = False
        nums: list[float] = []
        strs: list[bytes] = []
        texts: list[str] = []
        x = y = bx = by = 0.0
        for tok in _CONTENT_TOKEN.finditer(data):
            if tok.group(1) is not None:  # string literal
                strs.append(tok.group(1))
                continue
            if tok.group(2) is not None:  # number
                try:
                    nums.append(float(tok.group(2)))
                except ValueError:
                    pass
                continue
            op = tok.group(3)
            if op is None:  # name / hex string: operand we don't use
                continue
            if op == b"BT":
                in_text = True
                texts = []
                x = y = bx = by = 0.0
            elif op == b"ET":
                if in_text and texts:
                    blocks.append(
                        {"kind": "text", "text": "\n".join(texts),
                         "media_ref": "", "page": page, "x": bx, "y": by}
                    )
                in_text = False
            elif in_text and op == b"Tj":
                if strs:
                    if not texts:
                        bx, by = x, y
                    texts.append(_decode_pdf_string(strs[-1]))
            elif in_text and op == b"TJ":
                if strs:
                    if not texts:
                        bx, by = x, y
                    texts.append("".join(_decode_pdf_string(s) for s in strs))
            elif in_text and op in (b"Td", b"TD") and len(nums) >= 2:
                x += nums[-2]
                y += nums[-1]
            elif in_text and op == b"Tm" and len(nums) >= 6:
                x = nums[-2]
                y = nums[-1]
            nums = []
            strs = []
    blocks.sort(key=lambda b: (b["page"], -b["y"], b["x"]))
    return blocks


def pdf_to_spans(payload: bytes) -> list[dict]:
    """Layout blocks as DOCUMENTS-schema spans (kind, text, media_ref,
    offset) in reading order — the bridge from PDF input to every other
    stage of this engine."""
    spans = []
    for i, b in enumerate(extract_pdf_blocks(payload)):
        spans.append(
            {"kind": b["kind"], "text": b["text"] if b["kind"] == "text" else "",
             "media_ref": b["media_ref"], "offset": i}
        )
    return spans
