"""S10/T8 parity: legacy v0 export and the merged text-format parser.

Byte-layout oracle: the expected blobs are hand-packed with ``struct``
in the tests, straight from the reference's loop
(/root/reference/engine/indexing/diskindexwriter.py:57-71), so the
vectorized encoder is checked against an independent spelling of the
format, not against itself.
"""

import math
import struct

import numpy as np
import pyarrow.parquet as pq
import pytest

from searchengine_ray.legacy import (
    decode_term_postings_legacy,
    encode_term_postings_legacy,
    export_legacy_index,
    format_merged,
    parse_merged_lines,
    process_merged,
)


def _ref_encode(postings: list[tuple[int, list[int]]]) -> bytes:
    """The reference's _encode_postings, re-spelled with plain loops."""
    out = struct.pack("<I", len(postings))
    last_doc = 0
    for doc_id, positions in postings:
        out += struct.pack("<I", doc_id - last_doc)
        last_doc = doc_id
        out += struct.pack("<I", len(positions))
        last_pos = 0
        for p in positions:
            out += struct.pack("<I", p - last_pos)
            last_pos = p
    return out


def _to_arrays(postings):
    doc_ids = np.array([d for d, _ in postings], dtype=np.int64)
    off = np.zeros(len(postings) + 1, dtype=np.int64)
    np.cumsum([len(p) for _, p in postings], out=off[1:])
    pos = np.array([x for _, ps in postings for x in ps], dtype=np.int64)
    return doc_ids, off, pos


class TestLegacyEncode:
    CASES = [
        [(0, [1])],
        [(3, [1, 5, 9]), (7, [2]), (8, [4, 6])],
        [(2, [10]), (40, [1, 2, 3, 4]), (41, [7]), (1000, [500, 501])],
    ]

    @pytest.mark.parametrize("postings", CASES)
    def test_bytes_match_reference_layout(self, postings):
        got = encode_term_postings_legacy(*_to_arrays(postings))
        assert got == _ref_encode(postings)

    @pytest.mark.parametrize("postings", CASES)
    def test_roundtrip(self, postings):
        doc_ids, off, pos = _to_arrays(postings)
        blob = encode_term_postings_legacy(doc_ids, off, pos)
        d2, o2, p2, end = decode_term_postings_legacy(blob)
        assert end == len(blob)
        np.testing.assert_array_equal(d2, doc_ids)
        np.testing.assert_array_equal(o2, off)
        np.testing.assert_array_equal(p2, pos)

    def test_empty(self):
        blob = encode_term_postings_legacy(
            np.empty(0, np.int64), np.zeros(1, np.int64),
            np.empty(0, np.int64))
        assert blob == struct.pack("<I", 0)


class TestLegacyExport:
    @pytest.fixture(scope="class")
    def exported(self, built_index, tmp_path_factory):
        index_dir, _ = built_index
        out = str(tmp_path_factory.mktemp("legacy"))
        manifest = export_legacy_index(index_dir, out)
        return index_dir, out, manifest

    def test_postings_parity_via_offsets(self, exported):
        from searchengine_ray.query.reader import DiskIndexReader

        index_dir, out, _ = exported
        reader = DiskIndexReader(index_dir)
        tp = pq.read_table(f"{out}/term_positions.parquet")
        terms = tp.column("term").to_pylist()
        offs = tp.column("position").to_pylist()
        assert terms == reader.get_vocabulary()  # legacy keeps O1 order
        blob = open(f"{out}/postings.bin", "rb").read()
        # spot-check a deterministic sample of terms + the first/last
        idxs = sorted({0, len(terms) - 1, *range(3, len(terms), 97)})
        for i in idxs:
            pl = reader.get_postings(terms[i], with_positions=True)
            d2, o2, p2, end = decode_term_postings_legacy(blob, offs[i])
            np.testing.assert_array_equal(d2, pl.doc_ids)
            np.testing.assert_array_equal(o2, pl.pos_offsets)
            np.testing.assert_array_equal(p2, pl.positions)
            if i + 1 < len(terms):
                assert end == offs[i + 1]  # blocks are contiguous
            else:
                assert end == len(blob)

    def test_doc_weights_use_legacy_formula(self, exported, oracle):
        """L_d here is sqrt(sum tf^2) — the dead writer's formula, NOT
        the live sqrt(sum (1+ln tf)^2) (SURVEY §2.5 quirk)."""
        index_dir, out, manifest = exported
        w = np.frombuffer(open(f"{out}/doc_weights.bin", "rb").read(),
                          dtype="<f8")
        assert w.size == manifest["num_weighted_docs"]
        # independent accumulation from the oracle's postings model
        tf_sq: dict[int, float] = {}
        for postings in oracle.index.values():
            for doc_id, positions in postings.items():
                tf_sq[doc_id] = tf_sq.get(doc_id, 0.0) + len(positions) ** 2
        expect = np.array([math.sqrt(tf_sq[d]) for d in sorted(tf_sq)])
        np.testing.assert_allclose(w, expect, rtol=1e-12)
        # and it really is a different number from the live formula
        live: dict[int, float] = {}
        for postings in oracle.index.values():
            for doc_id, positions in postings.items():
                tf = len(positions)
                live[doc_id] = live.get(doc_id, 0.0) + (1 + math.log(tf)) ** 2
        live_arr = np.sqrt(np.array([live[d] for d in sorted(live)]))
        assert not np.allclose(w, live_arr)

    def test_doc_metadata_covers_whole_corpus(self, exported, small_corpus):
        _, out, _ = exported
        md = pq.read_table(f"{out}/doc_metadata.parquet")
        assert md.num_rows == small_corpus.num_rows
        assert md.column("doc_id").to_pylist() == list(
            range(small_corpus.num_rows))


class TestProcessMerged:
    def test_parse_reference_shapes(self):
        lines = [
            "alpha: 0,[1, 3];2,[2]",
            "beta: 5,['1', '7', '9']",   # quote-noise variant
            "",                           # blank line tolerated
            "gamma: 10,[4]",
        ]
        t = parse_merged_lines(lines)
        rows = list(zip(t.column("term").to_pylist(),
                        t.column("doc_id").to_pylist(),
                        t.column("position").to_pylist()))
        assert rows == [
            ("alpha", 0, 1), ("alpha", 0, 3), ("alpha", 2, 2),
            ("beta", 5, 1), ("beta", 5, 7), ("beta", 5, 9),
            ("gamma", 10, 4),
        ]

    def test_format_parse_roundtrip(self):
        index = {
            "zeta": [(1, [2, 8]), (4, [1])],
            "ab": [(0, [1])],
        }
        t = parse_merged_lines(format_merged(index))
        rebuilt: dict[str, list] = {}
        for term, doc, pos in zip(t.column("term").to_pylist(),
                                  t.column("doc_id").to_pylist(),
                                  t.column("position").to_pylist()):
            rebuilt.setdefault(term, [])
            if not rebuilt[term] or rebuilt[term][-1][0] != doc:
                rebuilt[term].append((doc, []))
            rebuilt[term][-1][1].append(pos)
        assert {k: [(d, ps) for d, ps in v] for k, v in rebuilt.items()} \
            == index

    def test_ray_dataset_path(self, ray_session, tmp_path):
        p = tmp_path / "merged.txt"
        p.write_text("\n".join(format_merged(
            {"tok": [(0, [1, 2]), (3, [5])]})) + "\n")
        ds = process_merged(str(p))
        rows = sorted(
            (r["term"], r["doc_id"], r["position"]) for r in ds.take_all())
        assert rows == [("tok", 0, 1), ("tok", 0, 2), ("tok", 3, 5)]
