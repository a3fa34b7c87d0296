"""Unit tests for the fragment-encoded postings exchange (wire v2 /
segment format v4): the map-side ``_encode_file_fragments`` kernel and the
reduce-side ``_finalize_segment`` merge, exercised directly on synthetic
posting arrays — no Ray, no parquet corpus.

Invariants under test (build.py ``_WIRE_SCHEMA`` / ``_finalize_segment``
docstrings):
- a merged term's doc-gap blob decodes to the exact ascending doc ids
  across fragments (the non-first fragments' leading absolute ids are
  rewritten into gaps, deltas continuous across the whole list);
- tf and pos streams are pure byte concatenations in posting order;
- every skip block slice-decodes independently given the previous block's
  last doc, and ``skip_count`` sums to df;
- seam blocks coalesce to >= skip_block postings (except a term's last);
- df/cf/max_wdt and the per-block maxima aggregate exactly.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings as hyp_settings, strategies as st

from searchengine_ray import vbyte
from searchengine_ray.build import (
    SALT_WIDTH,
    WDT_QUANT,
    IndexBuildConfig,
    _encode_file_fragments,
    _finalize_segment,
    _reducer_of,
    _reducer_of_vec,
    wdt_quantized,
)

AVGDL = 10.0


def _gkey(shard: int, bucket: int, salt: int, B: int) -> int:
    return (shard * B + bucket) * SALT_WIDTH + salt


def _encode_file(cfg, rows, seg_of=None):
    """rows: list of (gkey, term, doc_id, tftd, dl, pos_payload bytes).

    Replays _map_runs' prep: stable sort by (gkey, first-seen term code)
    preserving ascending doc order inside each run.  ``seg_of``
    (doc_id -> dense-segment id, i.e. the first doc of the doc's dense
    run — the docterms v4 ``seg`` column) defaults to reconstructing
    dense runs from the file's own doc set, which matches production for
    every fixture whose segments ARE the file's dense runs; fixtures
    with interleaved segmentations pass the true mapping explicitly.
    """
    code_of: dict = {}
    for _, term, *_ in rows:
        code_of.setdefault(term, len(code_of))
    if seg_of is None:
        docs_sorted = sorted({r[2] for r in rows})
        seg_of, lo = {}, None
        for prev, d in zip([None] + docs_sorted, docs_sorted):
            if prev is None or d != prev + 1:
                lo = d
            seg_of[d] = lo
    rows = sorted(rows, key=lambda r: (r[0], code_of[r[1]]))
    gk = np.array([r[0] for r in rows], dtype=np.int64)
    codes = np.array([code_of[r[1]] for r in rows], dtype=np.int64)
    doc = np.array([r[2] for r in rows], dtype=np.int64)
    tf = np.array([r[3] for r in rows], dtype=np.int32)
    dl = np.array([r[4] for r in rows], dtype=np.float64)
    wq = wdt_quantized(tf, dl, AVGDL)
    pos = pa.array([r[5] for r in rows], type=pa.binary())
    uniq = np.array(list(code_of), dtype=object)
    seg = np.array([seg_of[r[2]] for r in rows], dtype=np.int64)
    return _encode_file_fragments(cfg, gk, codes, doc, wq, tf, pos, uniq,
                                  seg=seg)


def _finalize(cfg, tables, tmp_path):
    out = os.path.join(str(tmp_path), "segment_test.parquet")
    prof = {"merge": 0.0, "write": 0.0, "bytes_in": 0}
    meta = _finalize_segment(list(tables), cfg, AVGDL, out, prof)
    return pq.read_table(out), meta


def _decode_docs(blob: bytes, df: int) -> np.ndarray:
    gaps = vbyte.decode(blob, count=df).astype(np.int64)
    return np.cumsum(gaps)


def _expected(rows_by_file):
    """{(gkey, term): dict(docs, tfs, pos, dls)} over all files, doc-asc."""
    exp: dict = {}
    for rows in rows_by_file:
        for gkey, term, doc, tf, dl, pos in rows:
            e = exp.setdefault((gkey, term),
                               {"docs": [], "tfs": [], "pos": b"",
                                "dls": []})
            e["docs"].append(doc)
            e["tfs"].append(tf)
            e["dls"].append(dl)
            e["pos"] += pos
    for e in exp.values():
        order = np.argsort(e["docs"], kind="stable")
        assert list(order) == sorted(order), "spec rows must be doc-asc"
    return exp


def _make_rows(file_idx: int, docs: range, terms: list[str], B: int,
               shard_of=lambda d: 0, salt_of=lambda t, d: 0):
    """Deterministic synthetic postings: term t appears in doc d when
    (d + hash-ish) % (t_idx + 2) == 0, tf/dl/pos derived from (t, d)."""
    rows = []
    for d in docs:
        for ti, t in enumerate(terms):
            if (d + ti) % (ti + 2):
                continue
            tf = 1 + (d + ti) % 5
            dl = 5.0 + (d % 7)
            pos = bytes([(d + ti) % 251 + 1]) * (1 + (d + ti) % 3)
            import zlib

            bucket = zlib.crc32(t.encode()) % B
            rows.append((
                _gkey(shard_of(d), bucket, salt_of(t, d), B),
                t, d, tf, dl, pos,
            ))
    return rows


@pytest.mark.parametrize("skip_block", [4, 128])
def test_fragment_merge_roundtrip(tmp_path, skip_block):
    cfg = IndexBuildConfig(num_buckets=8, skip_block=skip_block)
    terms = [f"t{i:02d}" for i in range(9)]
    files = [
        _make_rows(0, range(0, 40), terms, cfg.num_buckets),
        _make_rows(1, range(40, 90), terms, cfg.num_buckets),
        _make_rows(2, range(90, 101), terms, cfg.num_buckets),
    ]
    tables = [_encode_file(cfg, rows)[0] for rows in files]
    seg, meta = _finalize(cfg, tables, tmp_path)
    exp = _expected(files)

    assert seg.num_rows == len(exp)
    assert meta["rows"] == len(exp)
    by_key = {}
    for i in range(seg.num_rows):
        row = {c: seg.column(c)[i].as_py() for c in seg.column_names}
        gk = _gkey(row["shard"], row["bucket"], row["salt"],
                   cfg.num_buckets)
        by_key[(gk, row["term"])] = row

    assert set(by_key) == set(exp)
    for key, e in exp.items():
        row = by_key[key]
        df = row["df"]
        assert df == len(e["docs"])
        assert row["cf"] == sum(e["tfs"])
        docs = _decode_docs(row["blob"], df)
        assert docs.tolist() == e["docs"]
        tfs = vbyte.decode(row["tf_blob"], count=df).astype(np.int64)
        assert tfs.tolist() == e["tfs"]
        assert row["pos_blob"] == e["pos"]
        wq = wdt_quantized(np.asarray(e["tfs"], np.int32),
                           np.asarray(e["dls"]), AVGDL)
        assert row["max_wdt"] == pytest.approx(int(wq.max()) / WDT_QUANT)

        # ---- skip-block invariants ----
        counts = row["skip_count"]
        assert sum(counts) == df
        offs = row["skip_offset"]
        toffs = row["skip_tf_offset"]
        lasts = row["skip_last_doc"]
        maxtf = row["skip_max_tftd"]
        maxw = row["skip_max_wdt"]
        assert offs[0] == 0 and toffs[0] == 0
        base = 0
        p = 0
        for b, cnt in enumerate(counts):
            end = offs[b + 1] if b + 1 < len(offs) else len(row["blob"])
            gaps = vbyte.decode(row["blob"][offs[b]:end], count=cnt)
            bdocs = base + np.cumsum(gaps.astype(np.int64))
            assert bdocs.tolist() == e["docs"][p:p + cnt]
            assert lasts[b] == bdocs[-1]
            tend = (toffs[b + 1] if b + 1 < len(toffs)
                    else len(row["tf_blob"]))
            btfs = vbyte.decode(row["tf_blob"][toffs[b]:tend], count=cnt)
            assert btfs.tolist() == e["tfs"][p:p + cnt]
            assert maxtf[b] == max(e["tfs"][p:p + cnt])
            assert maxw[b] == pytest.approx(int(wq[p:p + cnt].max())
                                            / WDT_QUANT)
            base = bdocs[-1]
            p += cnt
        # coalescing bound: each merged block owns a distinct
        # floor(cum_postings / skip_block) value, so the skip table is
        # never LARGER than a perfectly regular one ...
        assert len(counts) <= -(-df // skip_block)
        # ... and no block exceeds 2x skip_block (map-side blocks are
        # capped at skip_block; a group spans at most one boundary)
        assert all(1 <= c < 2 * skip_block for c in counts)


def test_fragment_first_gap_rewrite_lengths(tmp_path):
    """Fragments whose leading absolute doc id encodes WIDER than its
    rewritten gap (3-byte absolute vs 1-byte gap) must still slice-decode
    at every skip offset — exercises the delta shift in skip_offset."""
    cfg = IndexBuildConfig(num_buckets=2, skip_block=2)
    gk = _gkey(0, 1, 0, 2)
    f1 = [(gk, "alpha", d, 1, 8.0, b"\x01") for d in (100000, 100001,
                                                      100002)]
    f2 = [(gk, "alpha", d, 2, 8.0, b"\x02") for d in (100003, 100005)]
    tables = [_encode_file(cfg, f1)[0], _encode_file(cfg, f2)[0]]
    seg, _ = _finalize(cfg, tables, tmp_path)
    row = {c: seg.column(c)[0].as_py() for c in seg.column_names}
    assert row["df"] == 5
    docs = _decode_docs(row["blob"], 5)
    assert docs.tolist() == [100000, 100001, 100002, 100003, 100005]
    # decode each block independently from its offset
    base = 0
    p = 0
    for b, cnt in enumerate(row["skip_count"]):
        end = (row["skip_offset"][b + 1]
               if b + 1 < len(row["skip_offset"]) else len(row["blob"]))
        gaps = vbyte.decode(row["blob"][row["skip_offset"][b]:end],
                            count=cnt)
        bdocs = base + np.cumsum(gaps.astype(np.int64))
        assert bdocs.tolist() == docs[p:p + cnt].tolist()
        base = int(bdocs[-1])
        p += cnt


def test_fragment_salted_term_stays_split(tmp_path):
    """A salted heavy term lands in one segment row PER SALT — fragments
    never merge across gkeys."""
    cfg = IndexBuildConfig(num_buckets=4, skip_block=4)
    rows = (
        [(_gkey(0, 3, 0, 4), "hot", d, 1, 6.0, b"p") for d in range(10)]
        + [(_gkey(0, 3, 1, 4), "hot", d, 1, 6.0, b"p")
           for d in range(10, 20)]
    )
    seg, _ = _finalize(cfg, [_encode_file(cfg, rows)[0]], tmp_path)
    assert seg.num_rows == 2
    salts = sorted(seg.column("salt").to_pylist())
    assert salts == [0, 1]
    for i in range(2):
        row = {c: seg.column(c)[i].as_py() for c in seg.column_names}
        docs = _decode_docs(row["blob"], row["df"])
        lo = 0 if row["salt"] == 0 else 10
        assert docs.tolist() == list(range(lo, lo + 10))


def test_reducer_of_vec_matches_scalar():
    gkeys = np.array([0, 1, 5, 4096, 123456789, 2**40 + 17], dtype=np.int64)
    for p in (1, 8, 32, 37):
        vec = _reducer_of_vec(gkeys, p)
        for g, r in zip(gkeys.tolist(), vec.tolist()):
            assert r == _reducer_of(g, p)


def test_tf_wide_values_roundtrip(tmp_path):
    """tftds >= 128 force the VByte (non-plain-byte) tf stream on the map
    side; merged stream must still decode per block."""
    cfg = IndexBuildConfig(num_buckets=2, skip_block=2)
    gk = _gkey(0, 0, 0, 2)
    f1 = [(gk, "big", d, 100 + 40 * d, 9.0, b"x") for d in range(3)]
    f2 = [(gk, "big", d, 300, 9.0, b"x") for d in range(3, 5)]
    seg, _ = _finalize(
        cfg, [_encode_file(cfg, f1)[0], _encode_file(cfg, f2)[0]], tmp_path)
    row = {c: seg.column(c)[0].as_py() for c in seg.column_names}
    tfs = vbyte.decode(row["tf_blob"], count=row["df"]).tolist()
    assert tfs == [100, 140, 180, 300, 300]
    p = 0
    for b, cnt in enumerate(row["skip_count"]):
        tend = (row["skip_tf_offset"][b + 1]
                if b + 1 < len(row["skip_tf_offset"])
                else len(row["tf_blob"]))
        btfs = vbyte.decode(
            row["tf_blob"][row["skip_tf_offset"][b]:tend], count=cnt)
        assert btfs.tolist() == tfs[p:p + cnt]
        assert row["skip_max_tftd"][b] == max(tfs[p:p + cnt])
        p += cnt


def _tok_table(doc_ids, terms_per_doc):
    """Minimal v2-shaped tokenized table (what _group_postings_batch
    consumes): per-doc rows with list columns."""
    n = len(doc_ids)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "title": pa.array([f"t{d}" for d in doc_ids]),
            "doc_length": pa.array([len(t) for t in terms_per_doc],
                                   type=pa.int64()),
            "l_d": pa.array([1.0] * n),
            "sha256": pa.array(["0" * 64] * n),
            "terms": pa.array(terms_per_doc, type=pa.list_(pa.string())),
            "tftds": pa.array([[1] * len(t) for t in terms_per_doc],
                              type=pa.list_(pa.int32())),
            "pos_blob": pa.array([[b"\x01"] * len(t)
                                  for t in terms_per_doc],
                                 type=pa.list_(pa.binary())),
        }
    )


def test_group_postings_interleaved_blocks_stay_disjoint():
    """An out-of-order rebatched block (streaming executor interleaving,
    docterms v3) must split at dense-doc seams: every (bucket, term) run
    in the output has strictly ascending docs, and same-term runs cover
    disjoint doc ranges — the invariant _finalize_segment's seam gap
    rewrite relies on."""
    from searchengine_ray.build import IndexBuildConfig, _group_postings_batch

    cfg = IndexBuildConfig(num_buckets=2)
    # blocks [0..3], [8..11], [4..7] interleaved into one batch, with a
    # term 'x' present in every doc and block-local terms sprinkled in
    docs = list(range(0, 4)) + list(range(8, 12)) + list(range(4, 8))
    terms = [["x", f"blk{d // 4}"] for d in docs]
    postings, docstats = _group_postings_batch(cfg, _tok_table(docs, terms))
    assert docstats.num_rows == len(docs)
    assert postings.num_rows == sum(len(t) for t in terms)
    term_col = postings.column("term").to_pylist()
    doc_col = postings.column("doc_id").to_pylist()
    # collect runs: maximal stretches of one term
    runs = []
    for t, d in zip(term_col, doc_col):
        if runs and runs[-1][0] == t:
            runs[-1][1].append(d)
        else:
            runs.append((t, [d]))
    ranges: dict[str, list[tuple[int, int]]] = {}
    for t, ds in runs:
        assert ds == sorted(ds), f"run of {t!r} not ascending: {ds}"
        ranges.setdefault(t, []).append((min(ds), max(ds)))
    for t, rs in ranges.items():
        rs = sorted(rs)
        for (alo, ahi), (blo, bhi) in zip(rs, rs[1:]):
            assert ahi < blo, f"overlapping runs for {t!r}: {rs}"
    # 'x' spans all three segments -> exactly 3 disjoint runs
    assert len(ranges["x"]) == 3


def test_finalize_rejects_overlapping_fragments(tmp_path):
    """The reducer backstop: overlapping doc ranges for one term must
    raise, never silently encode a non-positive seam gap."""
    cfg = IndexBuildConfig(num_buckets=2, skip_block=4)
    gk = _gkey(0, 0, 0, 2)
    f1 = [(gk, "t", d, 1, 5.0, b"x") for d in (0, 5)]
    f2 = [(gk, "t", d, 1, 5.0, b"x") for d in (3, 9)]  # overlaps f1
    # explicit seg ids simulate a BROKEN upstream that stamped holes-
    # spanning postings as one dense segment each (a correct group stage
    # would emit four single-doc segments here, which merge cleanly) —
    # the reducer must reject the resulting range overlap loudly
    with pytest.raises(ValueError, match="overlapping doc ranges"):
        _finalize(
            cfg,
            [_encode_file(cfg, f1, seg_of={0: 0, 5: 0})[0],
             _encode_file(cfg, f2, seg_of={3: 3, 9: 3})[0]],
            tmp_path)


def test_abutting_segments_same_term_split_and_roundtrip(tmp_path):
    """Regression (r4 advice, build.py run detector): one docterms file
    holding two dense segments whose group orders abut on the same
    (gkey, term) — segment A covers docs 8..11, segment B covers docs
    4..7 and lands AFTER A in the file.  Pre-fix the encoder merged both
    runs into one fragment and delta-encoded the negative seam gap as a
    huge unsigned doc id with no error; the run detector must now break
    on the non-ascending doc id so each segment's occurrence is its own
    fragment, and the reducer merges them by first_doc."""
    cfg = IndexBuildConfig(num_buckets=2, skip_block=4)
    gk = _gkey(0, 1, 0, 2)
    rows = (
        [(gk, "alpha", d, 1 + d % 3, 8.0, bytes([d]))
         for d in range(8, 12)]
        + [(gk, "alpha", d, 1 + d % 3, 8.0, bytes([d]))
           for d in range(4, 8)]
    )
    tbl, _ = _encode_file(cfg, rows)
    # the same-(gkey, term) abutting runs stay separate fragments
    assert tbl.num_rows == 2
    assert tbl.column("first_doc").to_pylist() == [8, 4]
    # every fragment's own doc stream must decode ascending and clean
    for i, df in enumerate(tbl.column("df").to_pylist()):
        frag_docs = _decode_docs(tbl.column("blob")[i].as_py(), df)
        assert frag_docs.tolist() == sorted(frag_docs.tolist())
        assert int(frag_docs.max()) < 1 << 32  # no unsigned wrap

    seg, _ = _finalize(cfg, [tbl], tmp_path)
    assert seg.num_rows == 1
    df = seg.column("df")[0].as_py()
    assert df == 8
    docs = _decode_docs(seg.column("blob")[0].as_py(), df)
    assert docs.tolist() == list(range(4, 12))
    tfs = vbyte.decode(seg.column("tf_blob")[0].as_py(), count=df)
    assert tfs.tolist() == [1 + d % 3 for d in range(4, 12)]
    assert seg.column("pos_blob")[0].as_py() == bytes(range(4, 12))


@st.composite
def _segment_layouts(draw):
    """A random dense corpus cut into consecutive segments, the segments
    permuted and packed into files — the general form of the abutting-
    segments regression (any same-(gkey, term) adjacency, any order,
    including lower-doc-range-after-higher within one file)."""
    n_docs = draw(st.integers(min_value=4, max_value=40))
    n_cuts = draw(st.integers(min_value=0, max_value=5))
    cuts = sorted(draw(st.sets(
        st.integers(min_value=1, max_value=n_docs - 1),
        min_size=min(n_cuts, n_docs - 1),
        max_size=min(n_cuts, n_docs - 1))))
    bounds = [0] + cuts + [n_docs]
    segments = [range(lo, hi) for lo, hi in zip(bounds, bounds[1:])]
    # permute by drawn priorities (stable argsort keeps shrinking sane)
    prios = draw(st.lists(st.integers(min_value=0, max_value=100),
                          min_size=len(segments), max_size=len(segments)))
    order = sorted(range(len(segments)), key=lambda i: (prios[i], i))
    segments = [segments[i] for i in order]
    n_files = draw(st.integers(min_value=1, max_value=3))
    file_of = draw(st.lists(st.integers(min_value=0, max_value=n_files - 1),
                            min_size=len(segments), max_size=len(segments)))
    # term membership rules: term i appears in doc d iff (d+off) % m == 0;
    # the first term has m=1 so every doc (hence every file with a
    # segment) carries at least one posting
    n_terms = draw(st.integers(min_value=1, max_value=4))
    rules = [(1, 0)] + [
        (draw(st.integers(min_value=2, max_value=4)),
         draw(st.integers(min_value=0, max_value=3)))
        for _ in range(n_terms - 1)
    ]
    return segments, file_of, n_files, rules


@given(_segment_layouts(), st.sampled_from([2, 4]))
@hyp_settings(max_examples=40, deadline=None)
def test_fragment_roundtrip_random_segment_interleavings(layout, skip_block):
    """Property form of the r4-advice regression: for ANY partition of a
    dense doc range into segments, ANY segment order, and ANY packing of
    segments into files, encode-per-file + reduce must reproduce the
    exact doc/tf/pos streams per (gkey, term) — fragments split wherever
    doc ids stop ascending and the reducer reassembles them by first_doc."""
    import tempfile
    import zlib

    segments, file_of, n_files, rules = layout
    cfg = IndexBuildConfig(num_buckets=2, skip_block=skip_block)

    def postings_of(seg):
        rows = []
        for d in seg:
            for ti, (m, off) in enumerate(rules):
                if (d + off) % m:
                    continue
                t = f"t{ti}"
                rows.append((
                    _gkey(0, zlib.crc32(t.encode()) % cfg.num_buckets, 0,
                          cfg.num_buckets),
                    t, d, 1 + (d + ti) % 5, 5.0 + d % 7,
                    bytes([(d + ti) % 251 + 1]) * (1 + d % 2),
                ))
        return rows

    files = [[] for _ in range(n_files)]
    seg_of = {}
    for seg, f in zip(segments, file_of):
        files[f].extend(postings_of(seg))
        for d in seg:
            seg_of[d] = seg.start
    tables = [_encode_file(cfg, rows, seg_of=seg_of)[0]
              for rows in files if rows]

    # expectation: per (gkey, term), triples sorted by doc id
    exp: dict = {}
    for rows in files:
        for gkey, term, doc, tf, dl, pos in rows:
            exp.setdefault((gkey, term), []).append((doc, tf, pos))
    for key in exp:
        exp[key].sort()

    with tempfile.TemporaryDirectory() as td:
        seg_tbl, meta = _finalize(cfg, tables, td)
    assert seg_tbl.num_rows == len(exp)
    for i in range(seg_tbl.num_rows):
        row = {c: seg_tbl.column(c)[i].as_py()
               for c in seg_tbl.column_names}
        key = (_gkey(row["shard"], row["bucket"], row["salt"],
                     cfg.num_buckets), row["term"])
        triples = exp[key]
        df = row["df"]
        assert df == len(triples)
        docs = _decode_docs(row["blob"], df)
        assert docs.tolist() == [t[0] for t in triples]
        tfs = vbyte.decode(row["tf_blob"], count=df)
        assert tfs.tolist() == [t[1] for t in triples]
        assert row["pos_blob"] == b"".join(t[2] for t in triples)
        # every skip block slice-decodes independently
        offs, counts = row["skip_offset"], row["skip_count"]
        assert sum(counts) == df
        base, p = 0, 0
        for b, cnt in enumerate(counts):
            end = offs[b + 1] if b + 1 < len(offs) else len(row["blob"])
            gaps = vbyte.decode(row["blob"][offs[b]:end], count=cnt)
            bdocs = base + np.cumsum(gaps.astype(np.int64))
            assert bdocs.tolist() == [t[0] for t in triples[p:p + cnt]]
            assert row["skip_last_doc"][b] == bdocs[-1]
            base, p = int(bdocs[-1]), p + cnt


def test_hole_straddling_segments_end_to_end(tmp_path):
    """End-to-end over the PRODUCTION row order (grouped parts
    concatenated by _group_postings_batch, round-tripped through a
    docterms parquet file): a batch interleaved as dense blocks
    [0], [2..3], [1] — the first two ASCEND across their seam while
    straddling the hole that block [1] owns.  Pre-v4 the encoder merged
    the straddling runs into one fragment whose doc range overlapped
    block [1]'s fragment and the reducer aborted a legal build; the seg
    column must keep every fragment inside its dense run so the merge
    succeeds and reproduces the exact postings."""
    from searchengine_ray.build import _explode_arrays, _group_postings_batch

    cfg = IndexBuildConfig(num_buckets=2, skip_block=4)
    docs = [0, 2, 3, 1]
    terms = [["x", "y"] for _ in docs]  # every term in every doc
    postings, _ = _group_postings_batch(cfg, _tok_table(docs, terms))
    path = os.path.join(str(tmp_path), "docterms_test.parquet")
    pq.write_table(postings, path)

    tbl = pq.read_table(
        path,
        columns=["term", "bucket", "doc_id", "doc_length", "tftd",
                 "pos_blob", "seg"],
        read_dictionary=["term"],
    )
    arrs = _explode_arrays(cfg, {}, tbl)
    wq = wdt_quantized(arrs["tftds"], arrs["dls"].astype(np.float64), AVGDL)
    frag_tbl, _ = _encode_file_fragments(
        cfg, arrs["gkey"], arrs["codes"], arrs["doc_ids"], wq,
        arrs["tftds"], arrs["pos_blob"], arrs["uniq"], seg=arrs["seg"])
    # 3 dense segments x 2 terms -> one fragment each, ranges disjoint
    assert frag_tbl.num_rows == 6

    seg_tbl, _ = _finalize(cfg, [frag_tbl], tmp_path)
    assert seg_tbl.num_rows == 2
    for i in range(seg_tbl.num_rows):
        row = {c: seg_tbl.column(c)[i].as_py()
               for c in seg_tbl.column_names}
        assert row["df"] == 4
        assert _decode_docs(row["blob"], 4).tolist() == [0, 1, 2, 3]


def test_equal_doc_id_runs_also_split(tmp_path):
    """Duplicate (gkey, term, doc) occurrences (can only arise from a
    broken upstream) must not silently zero-gap encode: the run detector
    breaks on <=, and the reducer's seam check then rejects the overlap
    loudly instead of emitting a corrupt list."""
    cfg = IndexBuildConfig(num_buckets=2, skip_block=4)
    gk = _gkey(0, 1, 0, 2)
    rows = [(gk, "t", 7, 1, 5.0, b"a"), (gk, "t", 7, 2, 5.0, b"b")]
    tbl, _ = _encode_file(cfg, rows)
    assert tbl.num_rows == 2  # split, not one fragment with gap 0
    with pytest.raises(ValueError, match="overlapping doc ranges"):
        _finalize(cfg, [tbl], tmp_path)
