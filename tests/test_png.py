"""Pure-Python PNG codec: round-trip and robustness.

The codec is the real decode kernel behind the multimodal feature stage
(``decoder="png"``), so its correctness carries the media_features oracle.
"""

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from swift_readability_ray.functions.png import (
    SIGNATURE,
    decode_png_gray,
    encode_png_gray,
)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    ftype=st.integers(min_value=0, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_round_trip_all_filters(w, h, ftype, seed):
    import random

    rng = random.Random(seed)
    pixels = bytes(rng.getrandbits(8) for _ in range(w * h))
    enc = encode_png_gray(w, h, pixels, filter_type=ftype)
    assert enc.startswith(SIGNATURE)
    assert decode_png_gray(enc) == (w, h, pixels)


def test_crc_valid_garbage_idat_raises_valueerror():
    """A CRC-correct IDAT whose payload is not DEFLATE must raise
    ValueError (stage contract: decode_ok=False), not leak zlib.error."""
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    bogus = (
        SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"IDAT", b"garbage!")
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="bad IDAT"):
        decode_png_gray(bogus)
    # the feature stage downgrades instead of crashing the batch
    import pyarrow as pa

    from swift_readability_ray.stages.multimodal import MediaFeatureExtractor

    tbl = pa.table(
        {
            "media_ref": pa.array(["mem://x/0"]),
            "media_type": pa.array(["image"]),
            "payload": pa.array([bogus], pa.binary()),
        }
    )
    out = MediaFeatureExtractor(decoder="png", feature_dim=4)(tbl)
    assert out.column("decode_ok").to_pylist() == [False]


def test_extreme_pixel_values_round_trip():
    # all-0 and all-255 rasters stress the filter arithmetic's wraparound
    for fill in (0, 255):
        for ftype in range(5):
            px = bytes([fill]) * 64
            assert decode_png_gray(encode_png_gray(8, 8, px, filter_type=ftype)) == (
                8, 8, px,
            )


def test_geometry_validation():
    with pytest.raises(ValueError, match="geometry"):
        encode_png_gray(0, 4, b"")
    with pytest.raises(ValueError, match="pixel buffer"):
        encode_png_gray(4, 4, b"\x00" * 15)


def test_decode_rejects_non_png():
    with pytest.raises(ValueError, match="signature"):
        decode_png_gray(b"JFIF not a png")


def test_decode_rejects_corrupt_crc():
    enc = bytearray(encode_png_gray(4, 4, bytes(range(16))))
    # flip a byte inside the IHDR payload (offset 8 sig + 8 header + 4)
    enc[20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png_gray(bytes(enc))


def test_decode_rejects_unsupported_color_type():
    # hand-build an RGB IHDR (color type 2) with a valid CRC
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + struct.pack(
        ">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="grayscale"):
        decode_png_gray(SIGNATURE + chunk)


def test_decode_rejects_truncated_stream():
    enc = encode_png_gray(4, 4, bytes(range(16)))
    # corrupt the geometry: claim 8 rows but keep the 4-row IDAT
    bad = bytearray(enc)
    struct.pack_into(">I", bad, 8 + 8 + 4, 8)  # IHDR height field
    # fix the CRC so the size check (not the CRC) is what trips
    ihdr = bytes(bad[16 : 16 + 13])
    struct.pack_into(">I", bad, 16 + 13, zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="filtered stream"):
        decode_png_gray(bytes(bad))


def test_multichunk_idat():
    """Decoders must concatenate split IDAT chunks (real encoders split)."""
    enc = encode_png_gray(6, 6, bytes(range(36)))
    # find the IDAT chunk and split its payload into two chunks
    pos = len(SIGNATURE)
    out = bytearray(enc[:pos])
    while pos + 12 <= len(enc):
        (length,) = struct.unpack_from(">I", enc, pos)
        tag = enc[pos + 4 : pos + 8]
        payload = enc[pos + 8 : pos + 8 + length]
        if tag == b"IDAT" and length > 2:
            for part in (payload[: length // 2], payload[length // 2 :]):
                out += struct.pack(">I", len(part)) + b"IDAT" + part
                out += struct.pack(">I", zlib.crc32(b"IDAT" + part) & 0xFFFFFFFF)
        else:
            out += enc[pos : pos + 12 + length]
        pos += 12 + length
    assert decode_png_gray(bytes(out)) == (6, 6, bytes(range(36)))


def test_media_stage_png_decoder():
    """Actor-stage integration: real decode emits true geometry + stats."""
    import pyarrow as pa

    from swift_readability_ray.stages.multimodal import MediaFeatureExtractor

    px = bytes(range(200)) + bytes(56)  # 16x16
    tbl = pa.table(
        {
            "media_ref": pa.array(["m/good", "m/bad"], pa.string()),
            "media_type": pa.array(["image", "image"], pa.string()),
            "payload": pa.array(
                [encode_png_gray(16, 16, px, filter_type=3), b"garbage"],
                pa.binary(),
            ),
            "width": pa.array([0, 0], pa.int32()),
            "height": pa.array([0, 0], pa.int32()),
        }
    )
    out = MediaFeatureExtractor(decoder="png", feature_dim=8)(tbl)
    rows = {r["media_ref"]: r for r in out.to_pylist()}
    good, bad = rows["m/good"], rows["m/bad"]
    assert good["decode_ok"] and (good["width"], good["height"]) == (16, 16)
    assert good["n_pixels"] == 256 and good["pixel_sum"] == sum(px)
    assert len(good["feature"]) == 8
    # undecodable input degrades to decode_ok=False, never a failed batch
    assert not bad["decode_ok"] and bad["pixel_sum"] == 0
