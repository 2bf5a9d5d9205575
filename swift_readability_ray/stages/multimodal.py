"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio decode libraries are not available in this container, so the
decode kernels are STUBBED (clearly marked) behind ``decoder="fake"`` — a
deterministic hash-based feature generator — or ``decoder="real"`` which
raises ``NotImplementedError``.  Everything Ray-side is real and tested:
schemas, actor-pool signature, per-actor setup, batch sizing, output layout.

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
        ("feature", pa.list_(pa.float32())),
        ("decode_ok", pa.bool_()),
    ]
)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: hash-seeded features."""
    digest = hashlib.blake2b(payload or b"", digest_size=8).digest()
    rng = np.random.RandomState(int.from_bytes(digest[:4], "big"))
    return rng.rand(dim).astype(np.float32)


class MediaFeatureExtractor:
    """Actor-pool stage: decode + feature-extract media payloads.

    ``__init__`` is the once-per-actor model/decoder load; ``__call__`` is
    per-batch.  Use ``map_batches(MediaFeatureExtractor, concurrency=(a,b),
    batch_size=8, num_cpus=1)``.
    """

    def __init__(self, decoder: str = "fake", feature_dim: int = 32) -> None:
        if decoder not in ("fake", "real"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self.decoder = decoder
        self.feature_dim = feature_dim
        # once-per-actor decoder load: with PIL present this is where a real
        # build would also warm any model weights
        self._model_loaded = True

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.decoder == "real":
            if not HAS_PIL:
                # STUB: decode libs absent in this container; plumbing real
                raise NotImplementedError("real media decoding requires PIL")
            img = _PILImage.open(io.BytesIO(payload)).convert("L")
            # deterministic thumbnail feature: feature_dim × 1 grayscale strip
            strip = img.resize((self.feature_dim, 1))
            return (np.asarray(strip, dtype=np.float32).reshape(-1) / 255.0)
        return _fake_decode(payload, self.feature_dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        types = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        feats, ok = [], []
        for payload in payloads:
            try:
                feats.append(self._decode(payload or b"").tolist())
                ok.append(True)
            except NotImplementedError:
                feats.append([0.0] * self.feature_dim)
                ok.append(False)
        return pa.Table.from_arrays(
            [
                pa.array(refs, pa.string()),
                pa.array(types, pa.string()),
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
