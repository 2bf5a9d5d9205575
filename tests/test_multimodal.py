"""Multimodal plumbing tests: binary media columns through actor-pool
stages (decode is stubbed behind a deterministic fake / NotImplementedError;
the Ray-side schema, batching and actor signatures are real)."""

import pyarrow as pa
import pytest

from swift_readability_ray.stages.multimodal import (
    FEATURES,
    FrameSampleStage,
    ImageResizeStage,
    MediaFeatureExtractor,
)


def _media_table(n=12):
    return pa.table(
        {
            "media_ref": pa.array([f"mem://m/{i}" for i in range(n)], pa.string()),
            "media_type": pa.array(
                ["image" if i % 2 == 0 else "video" for i in range(n)], pa.string()
            ),
            "payload": pa.array([bytes([i]) * (40 + i) for i in range(n)], pa.binary()),
            "width": pa.array([0] * n, pa.int32()),
            "height": pa.array([0] * n, pa.int32()),
        }
    )


def test_feature_extractor_deterministic_actor_pool(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_media_table())
    out = ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"decoder": "fake", "feature_dim": 8},
        batch_format="pyarrow",
        batch_size=4,
        concurrency=2,
    )
    rows = sorted(out.take_all(), key=lambda r: r["media_ref"])
    assert len(rows) == 12
    assert all(r["decode_ok"] for r in rows)
    assert all(len(r["feature"]) == 8 for r in rows)
    # determinism: same payload → same feature across runs/actors
    rows2 = sorted(
        ray.data.from_arrow(_media_table())
        .map_batches(
            MediaFeatureExtractor,
            fn_constructor_kwargs={"decoder": "fake", "feature_dim": 8},
            batch_format="pyarrow",
            batch_size=4,
            concurrency=2,
        )
        .take_all(),
        key=lambda r: r["media_ref"],
    )
    for a, b in zip(rows, rows2):
        assert list(a["feature"]) == list(b["feature"])


def test_feature_extractor_real_decoder_is_isolated():
    ex = MediaFeatureExtractor(decoder="real", feature_dim=4)
    out = ex(_media_table(3))
    assert out.schema.equals(FEATURES)
    assert out.column("decode_ok").to_pylist() == [False, False, False]


def test_feature_extractor_rejects_unknown_decoder():
    with pytest.raises(ValueError, match="unknown decoder"):
        MediaFeatureExtractor(decoder="bogus")


def test_resize_stage_sets_geometry():
    out = ImageResizeStage(target_width=64, target_height=48)(_media_table(5))
    assert out.column("width").to_pylist() == [64] * 5
    assert out.column("height").to_pylist() == [48] * 5
    # payload passes through unchanged
    assert out.column("payload").to_pylist() == _media_table(5).column("payload").to_pylist()


def test_frame_sample_stage_rows_per_frame():
    out = FrameSampleStage(every_n=10, max_frames=3)(_media_table(4))
    # payload sizes 40..43 → min(3, size//10)=3 frames each (stub rule)
    assert out.num_rows == 12
    assert set(out.column("frame_index").to_pylist()) == {0, 10, 20}


def test_frame_sample_real_decoder_raises():
    with pytest.raises(NotImplementedError):
        FrameSampleStage(decoder="real")(_media_table(1))


def test_real_decoder_gated_on_pil():
    """decoder='real' works when PIL is present, raises cleanly when not."""
    import numpy as np
    import pyarrow as pa
    import pytest

    from swift_readability_ray.stages.multimodal import HAS_PIL, MediaFeatureExtractor

    ex = MediaFeatureExtractor(decoder="real", feature_dim=8)
    if not HAS_PIL:
        with pytest.raises(NotImplementedError, match="PIL"):
            ex._decode(b"\x89PNG")
        # the batch path degrades to decode_ok=False, never a failed batch
        batch = pa.table(
            {
                "media_ref": pa.array(["m1"]),
                "media_type": pa.array(["image"]),
                "payload": pa.array([b"notanimage"], pa.binary()),
                "width": pa.array([0], pa.int32()),
                "height": pa.array([0], pa.int32()),
            }
        )
        out = ex(batch)
        assert out.column("decode_ok").to_pylist() == [False]
    else:  # pragma: no cover - PIL absent in this container
        from PIL import Image
        import io

        buf = io.BytesIO()
        Image.new("RGB", (16, 16), (128, 0, 0)).save(buf, format="PNG")
        feat = ex._decode(buf.getvalue())
        assert feat.shape == (8,)
        assert np.all((0 <= feat) & (feat <= 1))
