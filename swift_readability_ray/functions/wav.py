"""Pure-Python WAV (RIFF/WAVE) codec, 16-bit PCM.

Companion to the PNG codec in ``functions/png.py``: the stdlib gives us
nothing to decode here (we deliberately do not route through the stdlib
``wave`` module in the pipeline — the tests cross-validate against it
instead), so the multimodal AUDIO decode stage has a REAL decoder in
this container.

Scope: encode writes canonical little-endian RIFF/WAVE with a PCM
``fmt `` chunk and a ``data`` chunk; decode walks the chunk list
generically (unknown chunks are skipped, word-aligned per RIFF), checks
the declared sizes, and accepts only uncompressed 16-bit PCM — anything
else raises ``ValueError``, which the decode stage turns into
``decode_ok=False``.
"""

from __future__ import annotations

import struct

import numpy as np

_FMT_PCM = 1


def encode_wav_pcm16(
    samples: np.ndarray, sample_rate: int, channels: int = 1
) -> bytes:
    """Encode int16 ``samples`` (frame-major interleaved) as a WAV file."""
    if sample_rate <= 0:
        raise ValueError(f"invalid sample rate {sample_rate}")
    if channels <= 0:
        raise ValueError(f"invalid channel count {channels}")
    pcm = np.asarray(samples, dtype="<i2")
    if pcm.size % channels:
        raise ValueError(
            f"{pcm.size} samples do not divide into {channels} channels"
        )
    data = pcm.tobytes()
    block_align = 2 * channels
    fmt = struct.pack(
        "<HHIIHH",
        _FMT_PCM,
        channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        16,
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm16(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a 16-bit PCM WAV → (sample_rate, channels, int16 samples).

    The returned array is interleaved frame-major, exactly as stored.
    Unknown RIFF chunks are skipped (word-aligned); compressed formats,
    other bit depths, and truncated chunks raise ``ValueError``.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    if riff_size + 8 > len(data):
        raise ValueError("truncated RIFF payload")
    pos = 12
    sample_rate = channels = bits = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError(f"truncated WAV chunk {tag!r}")
        if tag == b"fmt ":
            if length < 16:
                raise ValueError("fmt chunk too short")
            fmt_code, channels, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload
            )
            if channels < 1:
                raise ValueError(f"invalid channel count {channels}")
            if sample_rate < 1:
                raise ValueError(f"invalid sample rate {sample_rate}")
            if fmt_code != _FMT_PCM:
                raise ValueError(
                    f"unsupported WAV format code {fmt_code}; only PCM"
                )
            if bits != 16:
                raise ValueError(
                    f"unsupported bit depth {bits}; only 16-bit PCM"
                )
        elif tag == b"data":
            pcm = payload
        # RIFF chunks are word-aligned: odd lengths carry one pad byte
        pos += 8 + length + (length & 1)
    if sample_rate is None:
        raise ValueError("WAV has no fmt chunk")
    if pcm is None:
        raise ValueError("WAV has no data chunk")
    if len(pcm) % (2 * channels):
        raise ValueError(
            f"data chunk of {len(pcm)} bytes is not whole 16-bit frames "
            f"for {channels} channels"
        )
    return sample_rate, channels, np.frombuffer(pcm, dtype="<i2")
