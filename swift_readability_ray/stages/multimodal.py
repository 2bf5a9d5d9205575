"""Multimodal column plumbing: opaque binary media + typed metadata.

All three modalities have REAL decode paths in this container, each on
a pure-Python codec (no PIL / ffmpeg / soundfile needed):

- image — ``decoder="png"``: the PNG codec in ``functions/png.py``
  (zlib DEFLATE + all five RFC-2083 scanline filters, CRC-verified).
  Emits true geometry and pixel statistics from the decoded raster;
  :class:`ImageResizeStage` adds a real integer-mean box-pooling resize
  with a re-encode round trip.
- audio — ``decoder="wav"``: the RIFF/WAVE 16-bit-PCM codec in
  ``functions/wav.py``.  Emits true sample rate / channel / duration /
  amplitude statistics from the decoded PCM.
- video — ``decoder="framepack"``: the length-prefixed PNG-frame
  container in ``functions/video.py``; :class:`FrameSampleStage` seeks
  by the length prefixes and decodes ONLY the sampled frames.

Two further modes exist on the image path: ``decoder="real"`` (PIL,
import-gated — PIL absent in this container → ``decode_ok=False``) and
``decoder="fake"`` (deterministic hash stand-in for anything else).

Everything Ray-side is real and tested: schemas, actor-pool signature,
per-actor setup, batch sizing, output layout.

Schema convention::

    MEDIA = pa.schema([("media_ref", pa.string()),
                       ("media_type", pa.string()),   # "image" | "audio" | "video"
                       ("payload", pa.binary()),      # opaque encoded bytes
                       ("width", pa.int32()), ("height", pa.int32())])

Large binary payloads → small ``batch_size`` (8–16) so batch × concurrency
fits the worker heap (SURVEY.md memory guidance).
"""

from __future__ import annotations

import hashlib
import io

import numpy as np
import pyarrow as pa

# import-gated real decoder (mirrors the lance gate in sources/io.py): the
# stage lights up automatically when the environment provides PIL
try:  # pragma: no cover - PIL absent in this container
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:
    _PILImage = None
    HAS_PIL = False

MEDIA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("media_type", pa.string()),
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)

FEATURES = pa.schema(
    [
        ("media_ref", pa.string()),
        ("media_type", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_pixels", pa.int64()),
        ("pixel_sum", pa.int64()),
        ("feature", pa.list_(pa.float32())),
        ("decode_ok", pa.bool_()),
    ]
)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for formats this container cannot decode."""
    digest = hashlib.blake2b(payload or b"", digest_size=8).digest()
    rng = np.random.RandomState(int.from_bytes(digest[:4], "big"))
    return rng.rand(dim).astype(np.float32)


def _chunk_means(pixels: np.ndarray, dim: int) -> np.ndarray:
    """feature_dim chunk means of the raster in [0,1] — a deterministic
    low-resolution intensity profile (the shape a real embedding head
    would consume)."""
    if pixels.size == 0:
        return np.zeros(dim, dtype=np.float32)
    chunks = np.array_split(pixels.astype(np.float64), dim)
    return np.asarray(
        [c.mean() / 255.0 if c.size else 0.0 for c in chunks], dtype=np.float32
    )


class MediaFeatureExtractor:
    """Actor-pool stage: decode + feature-extract media payloads.

    ``__init__`` is the once-per-actor model/decoder load; ``__call__`` is
    per-batch.  Use ``map_batches(MediaFeatureExtractor, concurrency=(a,b),
    batch_size=8, num_cpus=1)``.

    Output adds true geometry and integer pixel statistics when a real
    decode ran (``png``/``real``); the stubbed ``fake`` path reports zero
    geometry with ``decode_ok=True`` and hash-based features.
    """

    def __init__(self, decoder: str = "fake", feature_dim: int = 32) -> None:
        if decoder not in ("fake", "real", "png"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self.decoder = decoder
        self.feature_dim = feature_dim
        # once-per-actor decoder load: with PIL present this is where a real
        # build would also warm any model weights
        self._model_loaded = True

    def _decode(self, payload: bytes) -> np.ndarray:
        """Feature vector only (back-compat surface used by tests)."""
        return self._decode_full(payload)[0]

    def _decode_full(self, payload: bytes) -> tuple[np.ndarray, int, int, int]:
        """(feature, width, height, pixel_sum); raises on undecodable input."""
        if self.decoder == "png":
            # REAL decode: pure-Python PNG codec (zlib + unfilter), no PIL
            from ..functions.png import decode_png_gray

            w, h, px = decode_png_gray(payload)
            arr = np.frombuffer(px, dtype=np.uint8)
            return _chunk_means(arr, self.feature_dim), w, h, int(arr.sum())
        if self.decoder == "real":
            if not HAS_PIL:
                # STUB: PIL absent in this container; plumbing is real
                raise NotImplementedError("real media decoding requires PIL")
            img = _PILImage.open(io.BytesIO(payload)).convert("L")
            arr = np.asarray(img, dtype=np.uint8)
            strip = img.resize((self.feature_dim, 1))
            feat = np.asarray(strip, dtype=np.float32).reshape(-1) / 255.0
            return feat, img.width, img.height, int(arr.sum())
        return _fake_decode(payload, self.feature_dim), 0, 0, 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        types = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        feats, ok, ws, hs, sums = [], [], [], [], []
        for payload in payloads:
            try:
                feat, w, h, psum = self._decode_full(payload or b"")
                feats.append(feat.tolist())
                ws.append(w)
                hs.append(h)
                sums.append(psum)
                ok.append(True)
            except (NotImplementedError, ValueError):
                feats.append([0.0] * self.feature_dim)
                ws.append(0)
                hs.append(0)
                sums.append(0)
                ok.append(False)
        return pa.Table.from_arrays(
            [
                pa.array(refs, pa.string()),
                pa.array(types, pa.string()),
                pa.array(ws, pa.int32()),
                pa.array(hs, pa.int32()),
                pa.array([w * h for w, h in zip(ws, hs)], pa.int64()),
                pa.array(sums, pa.int64()),
                pa.array(feats, pa.list_(pa.float32())),
                pa.array(ok, pa.bool_()),
            ],
            schema=FEATURES,
        )


def resize_box_gray(arr: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Resize a 2-D uint8 raster to (th, tw).

    Downsampling (both target axes ≤ source) uses joint integer-mean box
    pooling over the floor cell map ``src(y,x) → dst(y*th//h, x*tw//w)``
    — pure integer arithmetic, so the result is exactly reconstructable
    (the media_resize SQL oracle mirrors it).  Any upsampling axis falls
    back to nearest-neighbor index mapping (exact replication).
    """
    if tw <= 0 or th <= 0:
        raise ValueError(f"invalid target geometry {tw}x{th}")
    h, w = arr.shape
    if th <= h and tw <= w:
        rmap = (np.arange(h, dtype=np.int64) * th) // h
        cmap = (np.arange(w, dtype=np.int64) * tw) // w
        acc = np.zeros((th, tw), dtype=np.int64)
        np.add.at(acc, (rmap[:, None], cmap[None, :]), arr.astype(np.int64))
        cnt = (
            np.bincount(rmap, minlength=th)[:, None]
            * np.bincount(cmap, minlength=tw)[None, :]
        )
        return (acc // cnt).astype(np.uint8)
    rows = (np.arange(th, dtype=np.int64) * h) // th
    cols = (np.arange(tw, dtype=np.int64) * w) // tw
    return arr[rows[:, None], cols[None, :]]


class ImageResizeStage:
    """Actor-pool resize stage.

    ``decoder="png"`` is the REAL path: decode via the pure-Python PNG
    codec, :func:`resize_box_gray`, re-encode — the output payload is a
    valid PNG of the target geometry (undecodable inputs pass through
    with their original geometry columns so downstream feature stages
    report ``decode_ok=False``).  ``"real"`` is the PIL route
    (import-gated), ``"fake"`` passes the payload through unchanged.
    """

    def __init__(self, target_width: int = 224, target_height: int = 224,
                 decoder: str = "fake") -> None:
        if decoder not in ("fake", "real", "png"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self.tw = target_width
        self.th = target_height
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "png":
            from ..functions.png import decode_png_gray, encode_png_gray

            payloads, resized = [], []
            for payload in batch.column("payload").to_pylist():
                try:
                    w, h, px = decode_png_gray(payload or b"")
                except ValueError:
                    payloads.append(payload)
                    resized.append(False)
                    continue
                arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
                out = resize_box_gray(arr, self.tw, self.th)
                payloads.append(
                    encode_png_gray(self.tw, self.th, out.tobytes())
                )
                resized.append(True)
            batch = batch.set_column(
                batch.schema.get_field_index("payload"),
                "payload",
                pa.array(payloads, pa.binary()),
            )
            if not all(resized):
                # keep original geometry columns on pass-through rows
                ws = batch.column("width").to_pylist()
                hs = batch.column("height").to_pylist()
                return batch.set_column(
                    batch.schema.get_field_index("width"), "width",
                    pa.array(
                        [self.tw if r else ws[i] for i, r in enumerate(resized)],
                        pa.int32(),
                    ),
                ).set_column(
                    batch.schema.get_field_index("height"), "height",
                    pa.array(
                        [self.th if r else hs[i] for i, r in enumerate(resized)],
                        pa.int32(),
                    ),
                )
        if self.decoder == "real":
            if not HAS_PIL:
                raise NotImplementedError("real image resize requires PIL")
            payloads = []
            for payload in batch.column("payload").to_pylist():
                img = _PILImage.open(io.BytesIO(payload or b""))
                buf = io.BytesIO()
                img.resize((self.tw, self.th)).save(buf, format="PNG")
                payloads.append(buf.getvalue())
            batch = batch.set_column(
                batch.schema.get_field_index("payload"),
                "payload",
                pa.array(payloads, pa.binary()),
            )
        n = batch.num_rows
        batch = batch.set_column(
            batch.schema.get_field_index("width"),
            "width",
            pa.array([self.tw] * n, pa.int32()),
        )
        return batch.set_column(
            batch.schema.get_field_index("height"),
            "height",
            pa.array([self.th] * n, pa.int32()),
        )


AUDIO_FEATURES = pa.schema(
    [
        ("media_ref", pa.string()),
        ("media_type", pa.string()),
        ("sample_rate", pa.int32()),
        ("channels", pa.int32()),
        ("n_samples", pa.int64()),
        ("duration_ms", pa.int64()),
        ("sample_sum", pa.int64()),
        ("peak_abs", pa.int32()),
        ("feature", pa.list_(pa.float32())),
        ("decode_ok", pa.bool_()),
    ]
)


class AudioFeatureExtractor:
    """Actor-pool stage: decode + feature-extract audio payloads.

    ``decoder="wav"`` is the REAL path — the pure-Python RIFF/WAVE
    16-bit-PCM codec in ``functions/wav.py`` — emitting true sample
    rate, channel count, frame-derived duration, and integer amplitude
    statistics (all SQL-reconstructable for the audio_features oracle).
    ``decoder="fake"`` is the hash stand-in.  Undecodable payloads set
    ``decode_ok=False``.
    """

    def __init__(self, decoder: str = "wav", feature_dim: int = 16) -> None:
        if decoder not in ("fake", "wav"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self.decoder = decoder
        self.feature_dim = feature_dim

    def _features(self, samples: np.ndarray) -> list[float]:
        if samples.size == 0:
            return [0.0] * self.feature_dim
        chunks = np.array_split(samples.astype(np.float64) / 32768.0,
                                self.feature_dim)
        return [float(c.mean()) if c.size else 0.0 for c in chunks]

    def __call__(self, batch: pa.Table) -> pa.Table:
        rates, chans, counts, durs, sums, peaks, feats, ok = (
            [], [], [], [], [], [], [], []
        )
        from ..functions.wav import decode_wav_pcm16

        for payload in batch.column("payload").to_pylist():
            try:
                if self.decoder == "fake":
                    raise ValueError("fake decoder")
                rate, ch, pcm = decode_wav_pcm16(payload or b"")
                wide = pcm.astype(np.int64)
                rates.append(rate)
                chans.append(ch)
                counts.append(int(pcm.size))
                durs.append(int(pcm.size // ch) * 1000 // rate)
                sums.append(int(wide.sum()))
                peaks.append(int(np.abs(wide).max()) if pcm.size else 0)
                feats.append(self._features(pcm))
                ok.append(True)
            except ValueError:
                rates.append(0)
                chans.append(0)
                counts.append(0)
                durs.append(0)
                sums.append(0)
                peaks.append(0)
                feats.append(
                    _fake_decode(payload or b"", self.feature_dim).tolist()
                    if self.decoder == "fake"
                    else [0.0] * self.feature_dim
                )
                ok.append(self.decoder == "fake")
        return pa.Table.from_arrays(
            [
                batch.column("media_ref").cast(pa.string()),
                batch.column("media_type").cast(pa.string()),
                pa.array(rates, pa.int32()),
                pa.array(chans, pa.int32()),
                pa.array(counts, pa.int64()),
                pa.array(durs, pa.int64()),
                pa.array(sums, pa.int64()),
                pa.array(peaks, pa.int32()),
                pa.array(feats, pa.list_(pa.float32())),
                pa.array(ok, pa.bool_()),
            ],
            schema=AUDIO_FEATURES,
        )


class FrameSampleStage:
    """Video frame sampling: one row per sampled frame.

    ``decoder="framepack"`` is the REAL path — seek the FPK1 length
    prefixes (``functions/video.py``), decode ONLY every ``every_n``-th
    frame (up to ``max_frames``) with the pure-Python PNG codec, and
    emit true per-frame geometry + pixel sums.  ``decoder="fake"`` keeps
    the legacy index-only plumbing (frame count from payload size);
    ``"real"`` (a containerized codec) stays gated.
    """

    def __init__(self, every_n: int = 30, max_frames: int = 8, decoder: str = "fake") -> None:
        self.every_n = every_n
        self.max_frames = max_frames
        self.decoder = decoder

    def _sample_framepack(self, payload: bytes):
        """(frame_index, width, height, pixel_sum) per sampled frame."""
        from ..functions.png import decode_png_gray
        from ..functions.video import frame_offsets

        spans = frame_offsets(payload)
        out = []
        for fi in range(0, len(spans), self.every_n)[: self.max_frames]:
            off, length = spans[fi]
            w, h, px = decode_png_gray(payload[off : off + length])
            psum = int(np.frombuffer(px, dtype=np.uint8).sum(dtype=np.int64))
            out.append((fi, w, h, psum))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, types, frames = [], [], []
        ws, hs, sums, ok = [], [], [], []
        for ref, mtype, payload in zip(
            batch.column("media_ref").to_pylist(),
            batch.column("media_type").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if self.decoder == "real":
                raise NotImplementedError("real frame sampling requires ffmpeg")
            if self.decoder == "framepack":
                try:
                    sampled = self._sample_framepack(payload or b"")
                except ValueError:
                    sampled = None
                if sampled is None:
                    refs.append(ref)
                    types.append(mtype)
                    frames.append(-1)
                    ws.append(0)
                    hs.append(0)
                    sums.append(0)
                    ok.append(False)
                    continue
                for fi, w, h, psum in sampled:
                    refs.append(ref)
                    types.append(mtype)
                    frames.append(fi)
                    ws.append(w)
                    hs.append(h)
                    sums.append(psum)
                    ok.append(True)
                continue
            # legacy fake plumbing: frame count from payload size
            n_frames = min(self.max_frames, max(1, len(payload or b"") // self.every_n))
            for fi in range(n_frames):
                refs.append(ref)
                types.append(mtype)
                frames.append(fi * self.every_n)
        cols = {
            "media_ref": pa.array(refs, pa.string()),
            "media_type": pa.array(types, pa.string()),
            "frame_index": pa.array(frames, pa.int32()),
        }
        if self.decoder == "framepack":
            cols.update(
                {
                    "width": pa.array(ws, pa.int32()),
                    "height": pa.array(hs, pa.int32()),
                    "pixel_sum": pa.array(sums, pa.int64()),
                    "decode_ok": pa.array(ok, pa.bool_()),
                }
            )
        return pa.table(cols)


_CACHED_EXTRACTORS: dict = {}


def media_features_batch(
    batch: pa.Table, decoder: str = "fake", feature_dim: int = 32
) -> pa.Table:
    """Task-pool form of :class:`MediaFeatureExtractor`: one cached instance
    per (decoder, feature_dim) per worker process — skips actor-pool
    spin-up for pipelines that run on warm workers."""
    key = (decoder, feature_dim)
    ex = _CACHED_EXTRACTORS.get(key)
    if ex is None:
        ex = MediaFeatureExtractor(decoder=decoder, feature_dim=feature_dim)
        _CACHED_EXTRACTORS[key] = ex
    return ex(batch)


def audio_features_batch(
    batch: pa.Table, decoder: str = "wav", feature_dim: int = 16
) -> pa.Table:
    """Task-pool form of :class:`AudioFeatureExtractor` (module-cached)."""
    key = ("audio", decoder, feature_dim)
    ex = _CACHED_EXTRACTORS.get(key)
    if ex is None:
        ex = AudioFeatureExtractor(decoder=decoder, feature_dim=feature_dim)
        _CACHED_EXTRACTORS[key] = ex
    return ex(batch)


def image_resize_batch(
    batch: pa.Table, target_width: int, target_height: int, decoder: str = "png"
) -> pa.Table:
    """Task-pool form of :class:`ImageResizeStage` (module-cached)."""
    key = ("resize", target_width, target_height, decoder)
    ex = _CACHED_EXTRACTORS.get(key)
    if ex is None:
        ex = ImageResizeStage(target_width, target_height, decoder=decoder)
        _CACHED_EXTRACTORS[key] = ex
    return ex(batch)


def frame_sample_batch(
    batch: pa.Table, every_n: int, max_frames: int, decoder: str = "framepack"
) -> pa.Table:
    """Task-pool form of :class:`FrameSampleStage` (module-cached)."""
    key = ("frames", every_n, max_frames, decoder)
    ex = _CACHED_EXTRACTORS.get(key)
    if ex is None:
        ex = FrameSampleStage(every_n, max_frames, decoder=decoder)
        _CACHED_EXTRACTORS[key] = ex
    return ex(batch)
