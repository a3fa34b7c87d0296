"""Multimodal plumbing: schema, actor stages, deterministic fake decode."""

import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def media_ds(ray_session):
    import ray.data

    from searchengine_ray.ops.multimodal import synthesize_media

    texts = [f"document number {i} with content {i * 7}" for i in range(30)]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(30), type=pa.int64()),
            "text": pa.array(texts),
        }
    )
    return synthesize_media(ray.data.from_arrow(tbl))


class TestSchema:
    def test_media_schema(self, media_ds):
        from searchengine_ray.ops.multimodal import MEDIA_SCHEMA

        got = media_ds.schema()
        assert set(got.names) == set(MEDIA_SCHEMA.names)

    def test_kinds_deterministic(self, media_ds):
        kinds1 = [r["kind"] for r in media_ds.take_all()]
        assert set(kinds1) <= {"image", "audio", "video"}


class TestImageStage:
    def test_decode_resize(self, media_ds):
        from searchengine_ray.ops.multimodal import (
            ImageDecodeResize,
            media_stage,
        )

        out = media_stage(
            media_ds, ImageDecodeResize, "image", batch_size=8,
            target=(8, 8),
        ).take_all()
        n_images = sum(1 for r in media_ds.take_all() if r["kind"] == "image")
        assert len(out) == n_images
        for r in out:
            assert len(r["pixels"]) == 8 * 8 * 3
            assert 0.0 <= r["mean_intensity"] <= 255.0

    def test_fake_decode_deterministic(self):
        from searchengine_ray.ops.multimodal import ImageDecodeResize

        a = ImageDecodeResize(target=(4, 4))._decode(b"payload", 10, 10)
        b = ImageDecodeResize(target=(4, 4))._decode(b"payload", 10, 10)
        assert (a == b).all()

    def test_real_backend_is_marked_stub(self):
        from searchengine_ray.ops.multimodal import ImageDecodeResize

        with pytest.raises(NotImplementedError):
            ImageDecodeResize(backend="real")._decode(b"x", 1, 1)

    def test_mean_intensity_is_digest_mean(self, media_ds):
        """The content-arithmetic fake makes mean_intensity exactly the
        mean of the 32 sha256 payload bytes (the SQL oracle's value)."""
        import hashlib

        import numpy as np

        from searchengine_ray.ops.multimodal import (
            ImageDecodeResize,
            media_stage,
        )

        payloads = {r["media_id"]: r["payload"]
                    for r in media_ds.take_all() if r["kind"] == "image"}
        out = media_stage(
            media_ds, ImageDecodeResize, "image", batch_size=8
        ).take_all()
        for r in out:
            d = np.frombuffer(
                hashlib.sha256(payloads[r["media_id"]]).digest(),
                dtype=np.uint8,
            )
            assert r["mean_intensity"] == d.mean()

    def test_pixels_are_fixed_size_list(self, media_ds):
        from searchengine_ray.ops.multimodal import (
            ImageDecodeResize,
            media_stage,
        )

        out = media_stage(media_ds, ImageDecodeResize, "image")
        batch = next(iter(out.iter_batches(batch_format="pyarrow")))
        assert pa.types.is_fixed_size_list(batch.schema.field("pixels").type)


class TestAudioVideo:
    def test_audio_features(self, media_ds):
        from searchengine_ray.ops.multimodal import AudioFeatures, media_stage

        out = media_stage(
            media_ds, AudioFeatures, "audio", n_features=4
        ).take_all()
        for r in out:
            assert len(r["features"]) == 4

    def test_audio_features_are_digest_arithmetic(self, media_ds):
        import hashlib

        from searchengine_ray.ops.multimodal import AudioFeatures, media_stage

        payloads = {r["media_id"]: r["payload"]
                    for r in media_ds.take_all() if r["kind"] == "audio"}
        out = media_stage(media_ds, AudioFeatures, "audio").take_all()
        for r in out:
            d = hashlib.sha256(payloads[r["media_id"]]).digest()
            for j, f in enumerate(r["features"]):
                assert f == (d[j] - 127.5) / 128.0

    def test_video_frame_offsets(self, media_ds):
        from searchengine_ray.ops.multimodal import (
            VideoFrameSample,
            media_stage,
        )

        out = media_stage(
            media_ds, VideoFrameSample, "video", n_frames=3
        ).take_all()
        for r in out:
            offs = r["frame_offsets_ms"]
            assert len(offs) == 3
            assert offs == sorted(offs)
