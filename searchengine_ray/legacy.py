"""Legacy v0 index export and the dev text merged-postings parser.

Parity targets (the last two reference components SURVEY §2 had scoped
out as dead code — rebuilt here so a reference user's *whole* surface,
including its dev/interop utilities, has an equivalent):

- S10 ``DiskIndexWriter`` (/root/reference/engine/indexing/diskindexwriter.py:27-91):
  the older non-SPIMI writer.  Byte format: per term a fixed 4-byte
  little-endian unsigned ``df`` followed by, per posting,
  ``doc_gap`` (delta from previous doc_id, first absolute),
  ``len(positions)`` and the position gaps (first absolute) — all
  4-byte unsigned, no varint (diskindexwriter.py:57-71).  Doc weights
  are packed float64 ``L_d = sqrt(sum tf^2)`` — the LEGACY formula,
  deliberately different from the live SPIMI
  ``sqrt(sum (1+ln tf)^2)`` (SURVEY §2.5 discrepancy note) — written
  doc_id-ascending for exactly the docs that appear in >=1 postings
  list (diskindexwriter.py:73-91).  The term->offset and doc metadata
  SQLite tables (diskindexwriter.py:14-25) become parquet side files,
  the same SQLite->manifest-file substitution the live path already
  makes for ST7.

- T8 ``Preprocessing.process_merged``
  (/root/reference/engine/text/preprocessing.py:82-98): parse the dev
  text postings format ``term: doc,[p1, p2];doc,[p3]`` back into a
  positional index.  The Ray-native equivalent yields a Dataset of
  ``(term, doc_id, position)`` rows — the columnar form of the
  reference's reconstructed in-memory index.

Neither utility is on the live 100-TB path (the live writer is the
fragment exchange, SURVEY S5/S6); the legacy binary format itself is a
single sequential file with byte offsets, so the export is a
driver-side stream over the vocabulary by design.  The per-term encode
is vectorized (one numpy scatter per term, no Python loop over
postings).
"""

from __future__ import annotations

import json
import os
import re
import struct

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = [
    "encode_term_postings_legacy",
    "decode_term_postings_legacy",
    "export_legacy_index",
    "parse_merged_lines",
    "process_merged",
    "format_merged",
]

_U4 = np.dtype("<u4")


# ---------------------------------------------------------------------------
# S10: legacy binary postings encode / export
# ---------------------------------------------------------------------------

def encode_term_postings_legacy(
    doc_ids: np.ndarray,
    pos_offsets: np.ndarray,
    positions: np.ndarray,
) -> bytes:
    """One term's postings in the legacy fixed-4-byte layout.

    Mirrors ``DiskIndexWriter._encode_postings``
    (/root/reference/engine/indexing/diskindexwriter.py:57-71):
    ``df | (doc_gap, n_pos, pos_gap...)*`` — every word a 4-byte
    little-endian unsigned int (the reference's ``struct.pack('I')`` on
    its little-endian CPython hosts).  Vectorized: the word stream is
    assembled with numpy scatters, no per-posting Python loop.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    pos_offsets = np.asarray(pos_offsets, dtype=np.int64)
    positions = np.asarray(positions, dtype=np.int64)
    df = int(doc_ids.size)
    cf = int(positions.size)
    n_pos = pos_offsets[1:] - pos_offsets[:-1]

    words = np.empty(1 + 2 * df + cf, dtype=_U4)
    words[0] = df
    # posting i's (doc_gap, n_pos) words start at 1 + 2*i + pos_offsets[i]
    slots = 1 + 2 * np.arange(df, dtype=np.int64) + pos_offsets[:-1]
    doc_gaps = np.empty(df, dtype=np.int64)
    if df:
        doc_gaps[0] = doc_ids[0]
        np.subtract(doc_ids[1:], doc_ids[:-1], out=doc_gaps[1:])
    words[slots] = doc_gaps
    words[slots + 1] = n_pos
    # position words: gaps restarting at each posting (first absolute)
    if cf:
        pos_gaps = np.empty(cf, dtype=np.int64)
        pos_gaps[0] = positions[0]
        np.subtract(positions[1:], positions[:-1], out=pos_gaps[1:])
        starts = pos_offsets[:-1][n_pos > 0]
        pos_gaps[starts] = positions[starts]
        pos_slots = slots[np.repeat(np.arange(df), n_pos)] + 2 + (
            np.arange(cf) - np.repeat(pos_offsets[:-1], n_pos)
        )
        words[pos_slots] = pos_gaps
    return words.tobytes()


def decode_term_postings_legacy(
    buf: bytes, offset: int = 0
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Inverse of :func:`encode_term_postings_legacy` (for tests and
    interop reads).  Returns (doc_ids, pos_offsets, positions,
    end_offset)."""
    words = np.frombuffer(buf, dtype=_U4, offset=offset)
    df = int(words[0])
    doc_ids = np.empty(df, dtype=np.int64)
    pos_off = np.zeros(df + 1, dtype=np.int64)
    pos_chunks: list[np.ndarray] = []
    w = 1
    last_doc = 0
    for i in range(df):
        last_doc += int(words[w])
        doc_ids[i] = last_doc
        k = int(words[w + 1])
        gaps = words[w + 2:w + 2 + k].astype(np.int64)
        pos_chunks.append(np.cumsum(gaps))
        pos_off[i + 1] = pos_off[i] + k
        w += 2 + k
    positions = (np.concatenate(pos_chunks) if pos_chunks
                 else np.empty(0, dtype=np.int64))
    return doc_ids, pos_off, positions, offset + 4 * w


def export_legacy_index(index_dir: str, out_dir: str) -> dict:
    """Export a live index directory to the legacy v0 on-disk format.

    ONE bulk columnar scan of the segment files (never per-term point
    reads — those re-decompress a whole blob row group per term),
    sorted by (term, shard, salt) — the same fragment order the live
    reader's dictionary uses, so fragment concatenation is doc_id-
    ascending per term exactly as in ``DiskIndexReader.get_postings``.
    Each term's fragments are VByte-decoded and re-encoded to the
    legacy layout while the legacy ``L_d = sqrt(sum tf^2)`` accumulator
    (diskindexwriter.py:73-82) collects per-doc tf^2 from the same
    pass.  Side files:

    - ``term_positions.parquet`` (term, position): the byte offset of
      each term's block, the SQLite ``term_positions`` table's content
      (diskindexwriter.py:14-18).
    - ``doc_weights.bin``: packed little-endian float64 legacy L_d,
      doc_id-ascending over docs with >=1 posting
      (diskindexwriter.py:84-91).
    - ``doc_metadata.parquet`` (doc_id, title): every corpus doc
      (diskindexwriter.py:46-52 iterates the whole corpus).

    The legacy format is one sequential byte-offset file, so the export
    is a driver-side dev/interop utility by the format's own nature
    (the live 100-TB writer is the fragment exchange, SURVEY S5/S6);
    the scan materializes the segment table, which is the right trade
    at interop scale.
    """
    import glob as _glob

    import pyarrow.dataset as pads

    from . import vbyte
    from .query.reader import DiskIndexReader, _segmented_cumsum

    os.makedirs(out_dir, exist_ok=True)
    reader = DiskIndexReader(index_dir)
    if reader.manifest.get("merged_from"):
        # generations may disagree on per-term salting (heavy detection
        # sees only its own corpus), and this bulk scan's (term, shard,
        # salt) sort is only doc-ascending when salting is uniform — the
        # live reader orders fragments by first doc instead, but the
        # legacy layout needs one sequential pass
        raise ValueError(
            "legacy export of a merged generational index is not "
            "supported: re-export each generation, or rebuild the "
            "merged corpus into a single-generation index"
        )
    tf_sq = np.zeros(reader.num_docs, dtype=np.float64)

    seg_files = sorted(_glob.glob(os.path.join(index_dir, "segments",
                                               "*.parquet")))
    tbl = pads.dataset(seg_files).to_table(
        columns=["term", "shard", "salt", "df", "cf",
                 "blob", "tf_blob", "pos_blob"])
    # UTF-8 byte order == code-point order, so Arrow's sort matches the
    # reader's Python sorted() vocabulary order.
    tbl = tbl.sort_by([("term", "ascending"), ("shard", "ascending"),
                       ("salt", "ascending")])
    t_terms = tbl.column("term").to_pylist()
    t_df = tbl.column("df").to_numpy()
    t_cf = tbl.column("cf").to_numpy()
    t_blob = tbl.column("blob").to_pylist()
    t_tf = tbl.column("tf_blob").to_pylist()
    t_pos = tbl.column("pos_blob").to_pylist()

    def _decode_fragment(i: int):
        doc_ids = np.cumsum(
            vbyte.decode(t_blob[i], count=int(t_df[i])).astype(np.int64))
        tftds = vbyte.decode(t_tf[i], count=int(t_df[i])).astype(np.int64)
        off = np.zeros(int(t_df[i]) + 1, dtype=np.int64)
        np.cumsum(tftds, out=off[1:])
        gaps = vbyte.decode(t_pos[i], count=int(t_cf[i])).astype(np.int64)
        return doc_ids, tftds, _segmented_cumsum(gaps, off), off

    terms: list[str] = []
    offsets: list[int] = []
    n = len(t_terms)
    with open(os.path.join(out_dir, "postings.bin"), "wb") as f:
        i = 0
        while i < n:
            j = i + 1
            while j < n and t_terms[j] == t_terms[i]:
                j += 1
            parts = [_decode_fragment(k) for k in range(i, j)]
            if len(parts) == 1:
                doc_ids, tftds, positions, pos_off = parts[0]
            else:
                doc_ids = np.concatenate([p[0] for p in parts])
                tftds = np.concatenate([p[1] for p in parts])
                positions = np.concatenate([p[2] for p in parts])
                pos_off = np.zeros(doc_ids.size + 1, dtype=np.int64)
                np.cumsum(tftds, out=pos_off[1:])
            terms.append(t_terms[i])
            offsets.append(f.tell())
            f.write(encode_term_postings_legacy(doc_ids, pos_off, positions))
            np.add.at(tf_sq, doc_ids, tftds.astype(np.float64) ** 2)
            i = j

    pq.write_table(
        pa.table({"term": pa.array(terms, pa.string()),
                  "position": pa.array(offsets, pa.int64())}),
        os.path.join(out_dir, "term_positions.parquet"),
    )

    indexed = np.flatnonzero(tf_sq > 0.0)
    weights = np.sqrt(tf_sq[indexed])
    with open(os.path.join(out_dir, "doc_weights.bin"), "wb") as f:
        f.write(weights.astype("<f8").tobytes())

    all_ids = list(range(reader.num_docs))
    pq.write_table(
        pa.table({"doc_id": pa.array(all_ids, pa.int64()),
                  "title": pa.array(reader.get_titles(all_ids),
                                    pa.string())}),
        os.path.join(out_dir, "doc_metadata.parquet"),
    )

    manifest = {
        "format": "legacy-v0",
        "num_terms": len(terms),
        "num_weighted_docs": int(indexed.size),
        "num_docs": reader.num_docs,
        "source_index": os.path.abspath(index_dir),
    }
    with open(os.path.join(out_dir, "legacy_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


# ---------------------------------------------------------------------------
# T8: merged text postings format
# ---------------------------------------------------------------------------

#: a posting inside one line: ``doc_id,[p1, p2, ...]`` with optional
#: quote noise (the reference strips ``'`` wholesale,
#: preprocessing.py:91-93)
_POSTING_RE = re.compile(r"\s*(\d+)\s*,?\s*\[([^\]]*)\]")


def parse_merged_lines(lines: list[str]) -> pa.Table:
    """Parse merged-format lines to (term, doc_id, position) rows.

    Accepts exactly what ``process_merged``
    (/root/reference/engine/text/preprocessing.py:82-98) accepts:
    ``term: doc,[p1, p2];doc,[p3]`` with tolerated whitespace and
    single-quote noise inside the brackets.  Dev utility, not a hot
    path (SURVEY T8): a compiled-regex loop per line is deliberate.
    """
    terms: list[str] = []
    docs: list[int] = []
    poss: list[int] = []
    for line in lines:
        line = line.strip()
        if not line:
            continue
        term, _, postings_str = line.partition(": ")
        for m in _POSTING_RE.finditer(postings_str.replace("'", "")):
            doc_id = int(m.group(1))
            inner = m.group(2).strip()
            if not inner:
                continue
            for p in inner.split(","):
                terms.append(term)
                docs.append(doc_id)
                poss.append(int(p))
    return pa.table({
        "term": pa.array(terms, pa.string()),
        "doc_id": pa.array(docs, pa.int64()),
        "position": pa.array(poss, pa.int64()),
    })


def process_merged(path: str):
    """Ray-native ``process_merged``: read the merged text file(s) and
    return a Dataset of (term, doc_id, position) rows — the columnar
    equivalent of the reference's reconstructed ``PositionalIndex``
    (preprocessing.py:96-98 replays addTerm per position)."""
    import ray.data

    ds = ray.data.read_text(path)

    def _parse(batch: pa.Table) -> pa.Table:
        return parse_merged_lines(batch.column("text").to_pylist())

    return ds.map_batches(_parse, batch_format="pyarrow")


def format_merged(index: dict[str, list[tuple[int, list[int]]]]) -> list[str]:
    """Write postings in the merged text format (the round-trip partner
    of :func:`parse_merged_lines`; the reference never shipped its
    writer side, so the format is pinned by what its parser accepts)."""
    lines = []
    for term in sorted(index):
        parts = [f"{doc_id},{list(map(str, pos))}"
                 for doc_id, pos in index[term]]
        lines.append(f"{term}: " + ";".join(parts))
    return lines
