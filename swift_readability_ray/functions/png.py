"""Pure-Python PNG codec (8-bit grayscale, non-interlaced).

The stdlib provides the DEFLATE layer (``zlib``); everything else —
signature, chunk framing + CRC32 verification, IHDR geometry, the five
scanline filter types — is implemented here, so the multimodal decode
stage has a REAL image decoder in this container (no PIL required; the
same feasibility argument as the pure-Python PDF writer/scanner in
``functions/pdf.py``).

Scope: encode writes 8-bit grayscale with a selectable per-image filter
type; decode reads any 8-bit grayscale non-interlaced PNG, implementing
all five RFC-2083 filters (None/Sub/Up/Average/Paeth) so it also reads
files other encoders produce.  Color, 16-bit and interlaced images raise
``ValueError`` — the decode stage turns that into ``decode_ok=False``.

The per-byte unfilter loops are sequential by definition (each byte
depends on the previous reconstructed byte); images move through the
actor pool in small batches so the kernel cost stays per-image-bounded.
"""

from __future__ import annotations

import struct
import zlib

SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa = abs(p - a)
    pb = abs(p - b)
    pc = abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(ftype: int, row: bytes, prev: bytes) -> bytes:
    """Apply filter ``ftype`` to one scanline (bpp=1: left neighbor is the
    previous byte, up is the same index in ``prev``)."""
    if ftype == 0:
        return row
    out = bytearray(len(row))
    for x, v in enumerate(row):
        a = row[x - 1] if x > 0 else 0
        b = prev[x]
        c = prev[x - 1] if x > 0 else 0
        if ftype == 1:  # Sub
            out[x] = (v - a) & 0xFF
        elif ftype == 2:  # Up
            out[x] = (v - b) & 0xFF
        elif ftype == 3:  # Average
            out[x] = (v - (a + b) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            out[x] = (v - _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return bytes(out)


def _unfilter_row(ftype: int, row: bytes, prev: bytes) -> bytes:
    if ftype == 0:
        return row
    out = bytearray(len(row))
    for x, v in enumerate(row):
        a = out[x - 1] if x > 0 else 0
        b = prev[x]
        c = prev[x - 1] if x > 0 else 0
        if ftype == 1:
            out[x] = (v + a) & 0xFF
        elif ftype == 2:
            out[x] = (v + b) & 0xFF
        elif ftype == 3:
            out[x] = (v + (a + b) // 2) & 0xFF
        elif ftype == 4:
            out[x] = (v + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return bytes(out)


def encode_png_gray(
    width: int, height: int, pixels: bytes, filter_type: int = 0, level: int = 6
) -> bytes:
    """Encode row-major 8-bit grayscale ``pixels`` as a valid PNG."""
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid geometry {width}x{height}")
    if len(pixels) != width * height:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, expected {width * height}"
        )
    raw = bytearray()
    prev = bytes(width)
    for y in range(height):
        row = bytes(pixels[y * width : (y + 1) * width])
        raw.append(filter_type)
        raw += _filter_row(filter_type, row, prev)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), level))
        + _chunk(b"IEND", b"")
    )


def decode_png_gray(data: bytes) -> tuple[int, int, bytes]:
    """Decode an 8-bit grayscale non-interlaced PNG → (width, height, pixels).

    Verifies chunk CRCs and the filtered-stream length; raises ``ValueError``
    on anything outside the supported subset (color, 16-bit, interlace).
    """
    if not data.startswith(SIGNATURE):
        raise ValueError("not a PNG (bad signature)")
    pos = len(SIGNATURE)
    width = height = None
    idat = bytearray()
    while pos + 12 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if crc != zlib.crc32(tag + payload) & 0xFFFFFFFF:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or color != 0:
                raise ValueError(
                    f"unsupported PNG (bit depth {depth}, color type {color}); "
                    "only 8-bit grayscale is implemented"
                )
            if comp != 0 or filt != 0:
                raise ValueError("unsupported PNG compression/filter method")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG has no IHDR chunk")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:  # CRC-valid chunk, non-DEFLATE payload
        raise ValueError(f"bad IDAT stream: {exc}") from exc
    if len(raw) != (width + 1) * height:
        raise ValueError(
            f"filtered stream is {len(raw)} bytes, expected {(width + 1) * height}"
        )
    out = bytearray()
    prev = bytes(width)
    for y in range(height):
        start = y * (width + 1)
        row = _unfilter_row(raw[start], raw[start + 1 : start + 1 + width], prev)
        out += row
        prev = row
    return width, height, bytes(out)
