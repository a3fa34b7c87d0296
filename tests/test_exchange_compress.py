"""Exchange wire compression (SE_RAY_EXCHANGE_COMPRESS / cfg
.exchange_compress): framing roundtrip + end-to-end index equality."""

import os

import pyarrow.parquet as pq
import pytest


class TestFrameRoundtrip:
    def test_roundtrip(self):
        from searchengine_ray.build import _frame_compress, _iter_wire_blobs

        blobs = [b"alpha", b"", b"x" * 10000, bytes(range(256)) * 7]
        frame = _frame_compress(blobs, "lz4")
        assert isinstance(frame, bytes)
        got = [bytes(b) for b in _iter_wire_blobs(frame)]
        assert got == blobs

    def test_empty_list(self):
        from searchengine_ray.build import _frame_compress, _iter_wire_blobs

        assert list(_iter_wire_blobs(_frame_compress([], "lz4"))) == []

    def test_uncompressed_passthrough(self):
        from searchengine_ray.build import _iter_wire_blobs

        assert list(_iter_wire_blobs([b"a", b"bb"])) == [b"a", b"bb"]

    def test_bad_magic_raises(self):
        from searchengine_ray.build import _iter_wire_blobs

        with pytest.raises(ValueError):
            list(_iter_wire_blobs(b"NOTAFRAME" * 3))

    def test_zstd_codec(self):
        from searchengine_ray.build import _frame_compress, _iter_wire_blobs

        blobs = [b"repeat " * 500]
        frame = _frame_compress(blobs, "zstd")
        assert len(frame) < len(blobs[0])
        assert [bytes(b) for b in _iter_wire_blobs(frame)] == blobs


class TestCompressedBuildEquality:
    def test_segments_identical(self, ray_session, small_corpus,
                                built_index, tmp_path_factory):
        """A build with lz4 exchange compression produces byte-identical
        segment tables (and therefore identical query results) to the
        uncompressed session index."""
        import ray.data

        from searchengine_ray.build import IndexBuildConfig, build_index

        base_dir, _ = built_index
        comp_dir = str(tmp_path_factory.mktemp("index_lz4"))
        cfg = IndexBuildConfig(
            num_buckets=4,
            tokenize_concurrency=(1, 2),
            skip_block=8,
            heavy_df_threshold=50,
            docs_per_shard=128,
            exchange_compress="lz4",
        )
        ds = ray.data.from_arrow(small_corpus).repartition(4)
        build_index(ds, comp_dir, cfg, input_description="test300")

        base_segs = sorted(os.listdir(os.path.join(base_dir, "segments")))
        comp_segs = sorted(os.listdir(os.path.join(comp_dir, "segments")))
        assert base_segs == comp_segs
        for name in base_segs:
            a = pq.read_table(os.path.join(base_dir, "segments", name))
            b = pq.read_table(os.path.join(comp_dir, "segments", name))
            assert a.equals(b), f"segment {name} differs under compression"
