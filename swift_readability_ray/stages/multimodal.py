"""Multimodal column plumbing: opaque binary media + typed metadata.

Three decode modes:

- ``decoder="png"`` — a REAL image decode path: the pure-Python PNG codec
  in ``functions/png.py`` (zlib DEFLATE + all five RFC-2083 scanline
  filters, CRC-verified), no external library needed.  Emits true
  geometry (width/height) and pixel statistics from the decoded raster.
- ``decoder="real"`` — PIL-backed decode for arbitrary formats,
  import-gated (PIL absent in this container → ``decode_ok=False``).
- ``decoder="fake"`` — deterministic hash-based stand-in for formats the
  container cannot decode (audio/video).

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


class ImageResizeStage:
    """Actor-pool resize stage (stubbed pixel work, real plumbing).

    Emits the target geometry columns; with ``decoder="fake"`` the payload
    passes through unchanged (deterministic), ``"real"`` raises.
    """

    def __init__(self, target_width: int = 224, target_height: int = 224,
                 decoder: str = "fake") -> None:
        self.tw = target_width
        self.th = target_height
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
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


class FrameSampleStage:
    """Video frame sampling plumbing: one row per sampled frame index."""

    def __init__(self, every_n: int = 30, max_frames: int = 8, decoder: str = "fake") -> None:
        self.every_n = every_n
        self.max_frames = max_frames
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, types, frames = [], [], []
        for ref, mtype, payload in zip(
            batch.column("media_ref").to_pylist(),
            batch.column("media_type").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if self.decoder == "real":
                raise NotImplementedError("real frame sampling requires ffmpeg")
            # STUB: frame count derived deterministically from payload size
            n_frames = min(self.max_frames, max(1, len(payload or b"") // self.every_n))
            for fi in range(n_frames):
                refs.append(ref)
                types.append(mtype)
                frames.append(fi * self.every_n)
        return pa.table(
            {
                "media_ref": pa.array(refs, pa.string()),
                "media_type": pa.array(types, pa.string()),
                "frame_index": pa.array(frames, pa.int32()),
            }
        )


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
