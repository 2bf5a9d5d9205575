"""WAV codec, frame-pack container, and the real audio/video/resize stages.

The WAV codec is cross-validated against the stdlib ``wave`` module in
both directions (our writer → stdlib reader, stdlib writer → our
reader), which pins the format to the real RIFF/WAVE spec rather than
to our own round trip.
"""

import io
import struct
import wave

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from swift_readability_ray.functions.png import decode_png_gray, encode_png_gray
from swift_readability_ray.functions.video import (
    decode_framepack,
    encode_framepack,
    frame_offsets,
)
from swift_readability_ray.functions.wav import decode_wav_pcm16, encode_wav_pcm16
from swift_readability_ray.stages.multimodal import (
    AudioFeatureExtractor,
    FrameSampleStage,
    ImageResizeStage,
    resize_box_gray,
)


# ---------------------------------------------------------------- WAV codec


@settings(max_examples=50, deadline=None)
@given(
    n_frames=st.integers(min_value=0, max_value=200),
    channels=st.integers(min_value=1, max_value=3),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_round_trip(n_frames, channels, rate, seed):
    rng = np.random.RandomState(seed)
    samples = rng.randint(-32768, 32768, n_frames * channels).astype(np.int16)
    enc = encode_wav_pcm16(samples, rate, channels)
    got_rate, got_ch, got = decode_wav_pcm16(enc)
    assert (got_rate, got_ch) == (rate, channels)
    assert np.array_equal(got, samples)


def test_wav_our_writer_read_by_stdlib():
    samples = np.arange(-50, 50, dtype=np.int16)
    enc = encode_wav_pcm16(samples, 16000, channels=2)
    with wave.open(io.BytesIO(enc)) as wf:
        assert wf.getframerate() == 16000
        assert wf.getnchannels() == 2
        assert wf.getsampwidth() == 2
        raw = wf.readframes(wf.getnframes())
    assert np.array_equal(np.frombuffer(raw, dtype="<i2"), samples)


def test_wav_stdlib_writer_read_by_us():
    samples = (np.sin(np.linspace(0, 6.0, 300)) * 20000).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(samples.tobytes())
    rate, ch, got = decode_wav_pcm16(buf.getvalue())
    assert (rate, ch) == (8000, 1)
    assert np.array_equal(got, samples)


def test_wav_skips_unknown_chunks_with_odd_padding():
    samples = np.array([1, -2, 3], dtype=np.int16)
    enc = bytearray(encode_wav_pcm16(samples, 8000))
    # splice a 5-byte (odd → 1 pad byte) LIST chunk between fmt and data
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    data_at = bytes(enc).index(b"data")
    spliced = bytes(enc[:data_at]) + junk + bytes(enc[data_at:])
    spliced = (
        spliced[:4]
        + struct.pack("<I", len(spliced) - 8)
        + spliced[8:]
    )
    rate, ch, got = decode_wav_pcm16(spliced)
    assert (rate, ch) == (8000, 1)
    assert np.array_equal(got, samples)


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda b: b"JUNK" + b[4:], "not a RIFF"),
        (lambda b: b[:-3], "truncated"),
        # format code 3 = IEEE float, unsupported
        (
            lambda b: b.replace(
                struct.pack("<HH", 1, 1), struct.pack("<HH", 3, 1), 1
            ),
            "format code",
        ),
    ],
)
def test_wav_rejects_malformed(mutate, msg):
    enc = encode_wav_pcm16(np.array([7, 8, 9, 10], dtype=np.int16), 8000)
    with pytest.raises(ValueError, match=msg):
        decode_wav_pcm16(mutate(enc))


def test_wav_rejects_zero_channels_and_rate():
    """Corrupt fmt fields must raise ValueError (→ decode_ok=False), never
    ZeroDivisionError out of the stage's exception contract."""
    enc = bytearray(encode_wav_pcm16(np.array([5, 6], dtype=np.int16), 8000))
    zero_ch = bytes(enc[:22]) + b"\x00\x00" + bytes(enc[24:])
    with pytest.raises(ValueError, match="channel count"):
        decode_wav_pcm16(zero_ch)
    zero_rate = bytes(enc[:24]) + b"\x00\x00\x00\x00" + bytes(enc[28:])
    with pytest.raises(ValueError, match="sample rate"):
        decode_wav_pcm16(zero_rate)
    # and the stage downgrades instead of crashing the batch
    out = AudioFeatureExtractor(decoder="wav")(
        _media_corrupt([zero_ch, zero_rate])
    )
    assert out.column("decode_ok").to_pylist() == [False, False]


def _media_corrupt(payloads):
    return pa.table(
        {
            "media_ref": pa.array([f"mem://x/{i}" for i in range(len(payloads))]),
            "media_type": pa.array(["audio"] * len(payloads)),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def test_wav_encode_validates():
    with pytest.raises(ValueError, match="sample rate"):
        encode_wav_pcm16(np.array([], dtype=np.int16), 0)
    with pytest.raises(ValueError, match="divide"):
        encode_wav_pcm16(np.array([1, 2, 3], dtype=np.int16), 8000, channels=2)


# ------------------------------------------------------------- frame pack


def test_framepack_round_trip():
    frames = [b"", b"a", b"frame2" * 10]
    packed = encode_framepack(frames)
    assert decode_framepack(packed) == frames
    offs = frame_offsets(packed)
    assert [packed[o : o + n] for o, n in offs] == frames


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda b: b"XXXX" + b[4:], "not an FPK1"),
        (lambda b: b[:-1], "truncated frame payload"),
        (lambda b: b + b"!", "trailing bytes"),
    ],
)
def test_framepack_rejects_malformed(mutate, msg):
    packed = encode_framepack([b"one", b"two"])
    with pytest.raises(ValueError, match=msg):
        frame_offsets(mutate(packed))


# ------------------------------------------------------------- resize kernel


def test_resize_box_exact_means():
    arr = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = resize_box_gray(arr, 2, 2)
    # 2x2 blocks: mean of {0,1,4,5}=2, {2,3,6,7}=4, {8,9,12,13}=10, ...=12
    assert out.tolist() == [[2, 4], [10, 12]]


def test_resize_box_uneven_geometry():
    arr = np.arange(15, dtype=np.uint8).reshape(5, 3)
    out = resize_box_gray(arr, 2, 2)
    # floor map (i*out)//n: rows 0,1,2→0 / 3,4→1; cols 0,1→0 / 2→1
    r0c0 = (0 + 1 + 3 + 4 + 6 + 7) // 6
    r0c1 = (2 + 5 + 8) // 3
    r1c0 = (9 + 10 + 12 + 13) // 4
    r1c1 = (11 + 14) // 2
    assert out.tolist() == [[r0c0, r0c1], [r1c0, r1c1]]


def test_resize_nearest_upsample():
    arr = np.array([[1, 2], [3, 4]], dtype=np.uint8)
    out = resize_box_gray(arr, 4, 4)
    assert out.tolist() == [
        [1, 1, 2, 2],
        [1, 1, 2, 2],
        [3, 3, 4, 4],
        [3, 3, 4, 4],
    ]


def test_resize_validates_target():
    with pytest.raises(ValueError, match="target geometry"):
        resize_box_gray(np.zeros((2, 2), dtype=np.uint8), 0, 2)


# ----------------------------------------------------------------- stages


def _media(payloads, mtype):
    n = len(payloads)
    return pa.table(
        {
            "media_ref": pa.array([f"mem://{mtype}/{i}" for i in range(n)]),
            "media_type": pa.array([mtype] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([0] * n, pa.int32()),
            "height": pa.array([0] * n, pa.int32()),
        }
    )


def test_audio_extractor_real_wav():
    s0 = np.array([100, -200, 300, -400], dtype=np.int16)
    s1 = np.array([-32768, 32767], dtype=np.int16)
    tbl = _media(
        [
            encode_wav_pcm16(s0, 8000),
            encode_wav_pcm16(s1, 16000, channels=2),
            b"not audio",
        ],
        "audio",
    )
    out = AudioFeatureExtractor(decoder="wav", feature_dim=4)(tbl)
    assert out.column("decode_ok").to_pylist() == [True, True, False]
    assert out.column("sample_rate").to_pylist() == [8000, 16000, 0]
    assert out.column("channels").to_pylist() == [1, 2, 0]
    assert out.column("n_samples").to_pylist() == [4, 2, 0]
    # 4 frames @8kHz = 0ms (floor); 1 frame @16kHz = 0ms
    assert out.column("duration_ms").to_pylist() == [0, 0, 0]
    assert out.column("sample_sum").to_pylist() == [-200, -1, 0]
    assert out.column("peak_abs").to_pylist() == [400, 32768, 0]
    feats = out.column("feature").to_pylist()
    assert len(feats[0]) == 4 and abs(feats[0][0] - 100 / 32768.0) < 1e-6


def test_audio_extractor_duration():
    samples = np.zeros(8000, dtype=np.int16)
    out = AudioFeatureExtractor(decoder="wav")(
        _media([encode_wav_pcm16(samples, 16000)], "audio")
    )
    assert out.column("duration_ms").to_pylist() == [500]


def test_audio_extractor_fake_mode():
    out = AudioFeatureExtractor(decoder="fake", feature_dim=4)(
        _media([b"anything"], "audio")
    )
    assert out.column("decode_ok").to_pylist() == [True]
    assert out.column("sample_rate").to_pylist() == [0]
    assert len(out.column("feature").to_pylist()[0]) == 4
    with pytest.raises(ValueError, match="unknown decoder"):
        AudioFeatureExtractor(decoder="bogus")


def test_image_resize_real_png():
    pixels = bytes(range(64))
    tbl = _media([encode_png_gray(8, 8, pixels), b"junk"], "image")
    out = ImageResizeStage(4, 4, decoder="png")(tbl)
    assert out.column("width").to_pylist() == [4, 0]
    assert out.column("height").to_pylist() == [4, 0]
    w, h, px = decode_png_gray(out.column("payload").to_pylist()[0])
    assert (w, h) == (4, 4)
    expect = resize_box_gray(
        np.frombuffer(pixels, dtype=np.uint8).reshape(8, 8), 4, 4
    )
    assert np.array_equal(np.frombuffer(px, dtype=np.uint8).reshape(4, 4), expect)
    # undecodable payload passes through unchanged
    assert out.column("payload").to_pylist()[1] == b"junk"


def test_frame_sample_real_framepack():
    frames = [
        encode_png_gray(2, 2, bytes([i, i, i, i])) for i in range(5)
    ]
    tbl = _media([encode_framepack(frames), b"bad"], "video")
    out = FrameSampleStage(every_n=2, max_frames=2, decoder="framepack")(tbl)
    rows = out.to_pylist()
    good = [r for r in rows if r["media_ref"] == "mem://video/0"]
    assert [r["frame_index"] for r in good] == [0, 2]
    assert [r["pixel_sum"] for r in good] == [0, 8]
    assert all(r["width"] == 2 and r["height"] == 2 and r["decode_ok"]
               for r in good)
    bad = [r for r in rows if r["media_ref"] == "mem://video/1"]
    assert len(bad) == 1 and bad[0]["frame_index"] == -1
    assert not bad[0]["decode_ok"]
