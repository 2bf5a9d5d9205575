"""Frame-packed video container ("FPK1"): length-prefixed PNG frames.

No video codec ships in this container (no ffmpeg, no PyAV), so the
video modality uses an explicit toy-but-real container: a magic header,
a frame count, and one length-prefixed 8-bit grayscale PNG per frame.
Every byte is accounted for and every sampled frame goes through the
REAL PNG decode in ``functions/png.py`` — what stays out of scope is
only inter-frame compression.

The length prefixes double as a seek table: ``frame_offsets`` walks the
headers without touching frame payloads, so a sampling stage decodes
ONLY the frames it keeps — the property that makes frame sampling
cheaper than full decode at scale.
"""

from __future__ import annotations

import struct

MAGIC = b"FPK1"


def encode_framepack(frames: list[bytes]) -> bytes:
    """Pack encoded frames into one payload: MAGIC, u32 count, then a
    u32 length prefix + bytes per frame (all little-endian)."""
    out = bytearray(MAGIC)
    out += struct.pack("<I", len(frames))
    for frame in frames:
        out += struct.pack("<I", len(frame))
        out += frame
    return bytes(out)


def frame_offsets(data: bytes) -> list[tuple[int, int]]:
    """(offset, length) of each frame payload, validated end to end."""
    if len(data) < 8 or data[:4] != MAGIC:
        raise ValueError("not an FPK1 frame pack")
    (count,) = struct.unpack_from("<I", data, 4)
    pos = 8
    spans = []
    for _ in range(count):
        if pos + 4 > len(data):
            raise ValueError("truncated frame header")
        (length,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if pos + length > len(data):
            raise ValueError("truncated frame payload")
        spans.append((pos, length))
        pos += length
    if pos != len(data):
        raise ValueError(f"{len(data) - pos} trailing bytes after last frame")
    return spans


def decode_framepack(data: bytes) -> list[bytes]:
    """All frame payloads (tests / small inputs; samplers should seek)."""
    return [data[o : o + n] for o, n in frame_offsets(data)]
