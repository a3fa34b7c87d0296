"""Distributed index build — the Ray-Data-native SPIMI equivalent.

Reference pipeline (/root/reference/engine/indexing/spimi.py:56-123): one
thread streams documents, accumulates an in-memory positional index, flushes
sorted buckets at a memory limit, then k-way heap-merges buckets into one
postings file + SQLite offset catalog + docWeights.bin.

Ray-Data-native rebuild:

  read_parquet(corpus)
    -> assign_doc_ids (one explicit global decision, ids.py)
    -> map_batches(TokenizeDocs actor pool)          # SPIMI block ≙ Ray block
         emits per-doc rows: doc stats + per-term (tftd, VByte pos blob)
    -> write docterms/ (resumable intermediate, columnar, format v2)
  docterms -> doc stats parquet + corpus scalars (pruned-column re-read)
  docterms -> heavy-hitter df detection (per-block partial counts -> tiny
              groupby-sum; the combiner-before-shuffle pattern)
  docterms -> explode to (term, doc_id, tftd, pos_blob) with keys
              shard   = doc_id // docs_per_shard      (bounds posting lists)
              bucket  = crc32(term) % num_buckets     (merge shuffle key)
              salt    = contiguous doc-range split for heavy terms
    -> groupby(gkey).map_groups(merge+encode)         # replaces heap merge
    -> segments/ parquet: one posting-list *fragment* per (term, shard,
       salt): parallel VByte streams (doc gaps / tftds / position gaps)
       + skip-block metadata (last doc id, max tftd, byte offsets per
       128 postings)
  manifest.json: corpus scalars, per-stage lineage + per-file metrics,
       committed last -> a re-run skips completed stages (resume).

Salting uses contiguous doc sub-ranges (not hashes) so a heavy term's
fragments are doc_id-range-disjoint: the query reader concatenates fragments
in (shard, salt) order and postings stay globally doc_id-sorted with no
second merge pass.
"""

from __future__ import annotations

import json
import os
import struct
import time
import zlib
from dataclasses import dataclass, field, asdict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from .tokenizer import TokenTermCache, analyze_document, euclidean_weight, sha256_hex

MANIFEST_NAME = "manifest.json"
SALT_WIDTH = 4096  # max fragments per (term, shard)


def _as_array(col) -> pa.Array:
    """Normalize a Table column to a single contiguous pa.Array."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            # combine_chunks returns an Array on pyarrow>=16; on versions
            # where it can still yield a ChunkedArray, concatenate rather
            # than silently dropping data past the first chunk
            if col.num_chunks == 0:
                col = pa.array([], type=col.type)
            else:
                col = pa.concat_arrays(col.chunks)
    return col


def term_bucket(term: str, num_buckets: int) -> int:
    return zlib.crc32(term.encode("utf-8")) % num_buckets


@dataclass
class IndexBuildConfig:
    docs_per_shard: int = 1 << 20
    num_buckets: int = 32
    heavy_df_threshold: int | None = 100_000  # df within a shard before salting
    max_salt: int = 64
    skip_block: int = 128
    tokenize_batch_size: int = 64
    # docterms output block/row-group size: tokenize emits small blocks
    # (batch_size docs each) and the parquet writer makes one row group
    # per block — 63-row groups made the exchange maps re-decode the
    # terms dictionary ~65x more often than needed.  An identity rebatch
    # before the write coalesces blocks to this many rows.
    docterms_block_rows: int = 4096
    # None -> fixed pool of one actor per cluster CPU (a fixed-size pool:
    # Ray Data's autoscaling pool ramps from min and starves short stages)
    tokenize_concurrency: tuple | int | None = None
    content_col: str = "content"
    title_col: str = "path"
    id_col: str = "doc_id"  # pre-assigned dense id column (None -> assign)
    segment_row_group_size: int = 512
    analyzer: str = "reference"  # key into tokenizer.ANALYZERS
    num_reducers: int | None = None  # postings-exchange reduce partitions
    # CPU slots per exchange task; None -> 2 above 8 cluster CPUs (the
    # bandwidth-contention cap measured in BASELINE.md §3), 1 otherwise.
    # Env SE_RAY_EXCHANGE_CPUS overrides for A/B runs.
    exchange_task_cpus: int | None = None
    # Streaming reduce: reducers launch with the maps and unpack each
    # map output as it lands (ray.wait), overlapping IPC decode with the
    # map tail.  Env SE_RAY_EXCHANGE_STREAMING=0/1 overrides for A/Bs.
    exchange_streaming: bool = False
    # Block-compress each (map, reducer) wire object ("lz4"/"zstd"/None):
    # trades idle CPU for bus bytes — the binding resource on saturated
    # hosts.  Joined-piece ratio measured 2.8x (lz4).  Env
    # SE_RAY_EXCHANGE_COMPRESS overrides ("0"/"none" disables).
    exchange_compress: str | None = None

    def to_json(self) -> dict:
        d = asdict(self)
        if isinstance(self.tokenize_concurrency, tuple):
            d["tokenize_concurrency"] = list(self.tokenize_concurrency)
        return d

    def resolved_concurrency(self):
        if self.tokenize_concurrency is None:
            return max(2, int(ray.cluster_resources().get("CPU", 8)))
        return self.tokenize_concurrency


def _sha256_column(arr: pa.Array) -> list[str]:
    """sha256 per row straight off the Arrow utf-8 data buffer (zero
    re-encode; the per-row invariant vs the source parquet).  The hash
    itself is the cost — this loop is not the hot path."""
    import hashlib

    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=off_dtype,
                         count=len(arr) + 1, offset=arr.offset *
                         np.dtype(off_dtype).itemsize)
    data = memoryview(arr.buffers()[2]) if arr.buffers()[2] else memoryview(b"")
    return [
        hashlib.sha256(data[offs[i]:offs[i + 1]]).hexdigest()
        for i in range(len(arr))
    ]


_WORKER_CACHES: dict[str, TokenTermCache] = {}


def _worker_cache(analyzer: str) -> TokenTermCache:
    """Process-global stemmer/token cache.  Ray reuses worker processes
    across tasks, so a module-level cache gives actor-style state reuse
    for stateless task pools — without paying actor-pool spin-up (~5s for
    32 actors, measured) on every short build."""
    cache = _WORKER_CACHES.get(analyzer)
    if cache is None:
        cache = _WORKER_CACHES[analyzer] = TokenTermCache()
    return cache


class TokenizeDocs:
    """Tokenizer stage: per-worker stemmer/token cache (the north-star
    'stemmer cache' stateful stage), per-batch vector output.  Usable both
    as an actor-pool class and, via ``tokenize_batch_factory``, as a plain
    task function with process-global cache."""

    def __init__(self, config: IndexBuildConfig):
        self.cfg = config

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .batch_tokenize import VECTORIZED_ANALYZERS

        cfg = self.cfg
        # resolved HERE (on the worker, not at driver pickle time) so the
        # cache is the executing process's one, shared across its tasks
        cache = _worker_cache(cfg.analyzer)
        content_arr = _as_array(batch.column(cfg.content_col))
        if cfg.analyzer in VECTORIZED_ANALYZERS:
            from .batch_tokenize import analyze_batch

            cols = analyze_batch(content_arr, cfg.analyzer, cache)
            return pa.table(
                {
                    "doc_id": _as_array(batch.column(cfg.id_col)).cast(
                        pa.int64()),
                    "title": _as_array(batch.column(cfg.title_col)),
                    "doc_length": pa.array(cols["doc_length"]),
                    "l_d": pa.array(cols["l_d"]),
                    "sha256": pa.array(_sha256_column(content_arr),
                                       type=pa.string()),
                    "terms": cols["terms"],
                    "tftds": cols["tftds"],
                    "pos_blob": cols["pos_blob"],
                }
            )
        return self._call_per_doc(batch, cache)

    def _call_per_doc(self, batch: pa.Table, cache) -> pa.Table:
        """Per-doc fallback for analyzers without a vectorized batch path
        (e.g. spanish); also the parity oracle for the vectorized path."""
        from .tokenizer import ANALYZERS

        cfg = self.cfg
        analyze = ANALYZERS[cfg.analyzer]
        contents = batch.column(cfg.content_col).to_pylist()
        titles = batch.column(cfg.title_col).to_pylist()
        doc_ids = batch.column(cfg.id_col).to_pylist()

        out_doc_id, out_title, out_len, out_ld, out_sha = [], [], [], [], []
        out_terms, out_tftds, out_positions = [], [], []
        for doc_id, title, content in zip(doc_ids, titles, contents):
            term_pos, doc_length = analyze(content, cache)
            # L_d includes the empty term (spimi.py:72-79,110-117); the
            # index itself never stores it (postionalinvertedindex.py:28).
            l_d = euclidean_weight(len(v) for v in term_pos.values())
            term_pos.pop("", None)
            terms = sorted(term_pos)
            out_doc_id.append(doc_id)
            out_title.append(title)
            out_len.append(doc_length)
            out_ld.append(l_d)
            out_sha.append(sha256_hex(content))
            out_terms.append(terms)
            out_tftds.append([len(term_pos[t]) for t in terms])
            out_positions.append([term_pos[t] for t in terms])
        return pa.table(
            {
                "doc_id": pa.array(out_doc_id, type=pa.int64()),
                "title": pa.array(out_title, type=pa.string()),
                "doc_length": pa.array(out_len, type=pa.int64()),
                "l_d": pa.array(out_ld, type=pa.float64()),
                "sha256": pa.array(out_sha, type=pa.string()),
                "terms": pa.array(out_terms, type=pa.list_(pa.string())),
                "tftds": pa.array(out_tftds, type=pa.list_(pa.int32())),
                "pos_blob": _encode_positions_nested(out_positions),
            }
        )


def _encode_positions_nested(out_positions: list) -> pa.ListArray:
    """Per-doc python lists of per-term position lists -> list<binary>
    of VByte gap blobs (docterms format v2); the per-doc fallback path's
    counterpart of the vectorized encode in batch_tokenize."""
    from . import vbyte

    nested = pa.array(out_positions, type=pa.list_(pa.list_(pa.int32())))
    return pa.ListArray.from_arrays(
        nested.offsets, vbyte.encode_position_lists(nested.flatten()))


_BUCKET_CACHES: dict[int, dict] = {}


def _explode_arrays(
    cfg: IndexBuildConfig, heavy: dict[str, int], batch: pa.Table
) -> dict | None:
    """docterms table -> flat per-(doc, term) arrays for the exchange.

    Positions arrive ALREADY VByte-encoded per row (docterms format v2:
    the tokenize stage encodes gaps, first absolute) — the encode-early
    SPIMI move taken one stage earlier: the embarrassingly-parallel
    tokenize stage pays the encode once, docterms stores ~4x fewer
    position bytes than raw int32 lists, and both the exchange read and
    the shuffle ship final on-disk bytes that reducers concatenate by
    slice.  Term hashing and lexicographic ranks are computed once per
    *distinct* term via dictionary codes — which come straight from the
    parquet dictionary pages when the caller read with
    ``read_dictionary`` (no per-term re-hash of the flat string column;
    that hash was 3/4 of map CPU at the 1M-doc scale).
    """
    B = cfg.num_buckets
    dps = cfg.docs_per_shard

    terms_col = _as_array(batch.column("terms"))
    tftds_col = _as_array(batch.column("tftds"))
    pos_col = _as_array(batch.column("pos_blob"))

    lens = pa.compute.list_value_length(terms_col).to_numpy(zero_copy_only=False)
    doc_ids = np.repeat(
        _as_array(batch.column("doc_id")).to_numpy(zero_copy_only=False), lens
    )
    dls = np.repeat(
        _as_array(batch.column("doc_length")).to_numpy(zero_copy_only=False),
        lens,
    )
    flat_terms = terms_col.flatten()
    if len(flat_terms) == 0:
        return None
    flat_tftds = tftds_col.flatten()
    pos_blob = pos_col.flatten()  # binary VByte blob per (doc, term)

    if isinstance(flat_terms, pa.DictionaryArray):
        dic = flat_terms
    else:
        dic = flat_terms.dictionary_encode()
    codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = np.asarray(dic.dictionary.to_pylist(), dtype=object)
    # crc32 per distinct term, memoized across files in this worker
    # process: with a realistic vocab every file repeats most terms, and
    # recomputing per file cost ~0.5 s/file at 20k distinct terms
    cache = _BUCKET_CACHES.setdefault(B, {})
    uniq_buckets = np.empty(len(uniq), dtype=np.int64)
    for i, t in enumerate(uniq):
        b = cache.get(t)
        if b is None:
            b = cache[t] = zlib.crc32(t.encode("utf-8")) % B
        uniq_buckets[i] = b

    buckets = uniq_buckets[codes]
    shards = doc_ids // dps
    salts = np.zeros(codes.size, dtype=np.int64)
    if heavy:
        uniq_width = np.fromiter(
            (heavy.get(t, 0) for t in uniq), dtype=np.int64, count=len(uniq)
        )
        widths = uniq_width[codes]
        rel = doc_ids - shards * dps
        np.floor_divide(rel * widths, dps, out=salts, where=widths > 0)
    gkey = (shards * B + buckets) * SALT_WIDTH + salts

    return {
        "terms": flat_terms,
        "codes": codes,
        "uniq": uniq,
        "doc_ids": doc_ids,
        "dls": dls,
        # stays int32 (the docterms list dtype): every consumer either
        # promotes to float (wdt) or ships int32 (exchange rows)
        "tftds": flat_tftds.to_numpy(zero_copy_only=False),
        "pos_blob": pos_blob,
        "gkey": gkey,
    }


_SEGMENT_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("shard", pa.int32()),
        ("salt", pa.int32()),
        ("bucket", pa.int32()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("max_wdt", pa.float64()),
        ("blob", pa.binary()),      # VByte doc-gap stream (format v3)
        ("tf_blob", pa.binary()),   # VByte tftd stream, same posting order
        ("pos_blob", pa.binary()),
        ("skip_last_doc", pa.list_(pa.int64())),
        ("skip_max_tftd", pa.list_(pa.int64())),
        ("skip_max_wdt", pa.list_(pa.float64())),
        ("skip_offset", pa.list_(pa.int64())),     # block start in blob
        ("skip_tf_offset", pa.list_(pa.int64())),  # block start in tf_blob
    ]
)

# Segment layout version, folded into stage fingerprints so an index built
# by an older code revision is rebuilt rather than misread.  v3: the doc/tf
# stream is split into two per-term columns (blob = gaps, tf_blob = tftds)
# — the interleaved 2n-wide uint64 stream build was the single largest
# memory-traffic source on the bandwidth-bound reduce side.
SEGMENT_FORMAT = 3

# Docterms (resumable intermediate) layout version, folded into the stage
# fingerprints the same way.  v2: positions stored as per-(doc,term) VByte
# gap blobs (list<binary> pos_blob) encoded in the tokenize stage, not raw
# list<list<int32>> encoded in the exchange maps — the encode runs in the
# embarrassingly-parallel stage and docterms shrinks ~4x on positions.
DOCTERMS_FORMAT = 2

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_wdt(tftds: np.ndarray, dls: np.ndarray, avgdl: float) -> np.ndarray:
    """Okapi wdt exactly as the reference computes it
    (/root/reference/engine/querying/rankedquery.py:22): k1=1.2, b=0.75."""
    tf = tftds.astype(np.float64)
    return (BM25_K1 + 1.0) * tf / (
        BM25_K1 * ((1.0 - BM25_B) + BM25_B * (dls / avgdl)) + tf
    )


# wdt < k1+1 = 2.2, so ceil(wdt * 115) fits uint8 (max 253).  The exchange
# ships this 1-byte upper bound instead of the 4-byte per-row doc length:
# max_wdt / skip_max_wdt are ONLY WAND pruning bounds (ranked.py:209,244),
# and a quantized-UP bound keeps block-max WAND exact while cutting both
# shuffle bytes and the reduce-side float work (exact scorers recompute
# wdt from tftd + doc stats at query time).
WDT_QUANT = 115.0


def wdt_quantized(tftds: np.ndarray, dls: np.ndarray, avgdl: float) -> np.ndarray:
    return np.ceil(bm25_wdt(tftds, dls, avgdl) * WDT_QUANT).astype(np.uint8)


def _pin_arrow_threads() -> None:
    """Cap Arrow's internal pools inside Ray tasks.  Arrow defaults to one
    thread per hardware core *per process*; with 32 concurrent single-CPU
    tasks that is 1024 threads fighting over 32 cores (measured: the
    postings exchange ran 2.4x slower at 32 CPUs than at 8 until pinned)."""
    try:
        if pa.cpu_count() > 2:
            pa.set_cpu_count(2)
            pa.set_io_thread_count(2)
    except (RuntimeError, OSError):
        pass


# Uncompressed IPC, deliberately: LZ4 frames were measured on this box
# (1M docs, 16 CPUs) to shrink blobs only 28% (gaps/tftd/pos are already
# VByte-packed) while adding ~400 CPU-s of (de)compression — a net loss,
# because plasma transfer is a single memcpy per side while the codec adds
# full extra passes over the data on a memory-bandwidth-starved host.
_IPC_OPTS = pa.ipc.IpcWriteOptions()


def _ipc_bytes(tbl: pa.Table) -> bytes:
    """Serialize a run table as an uncompressed IPC stream (see _IPC_OPTS
    note above; per-frame compression was a measured net loss here — the
    optional whole-object wire compression lives in _frame_compress)."""
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, tbl.schema, options=_IPC_OPTS) as w:
        w.write_table(tbl)
    return sink.getvalue().to_pybytes()


def _prof_write(kind: str, rec: dict) -> None:
    """Append a per-task profile record when SE_RAY_PROF points at a dir."""
    d = os.environ.get("SE_RAY_PROF")
    if not d:
        return
    try:
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"{kind}_{os.getpid()}.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")
    except OSError:
        pass


@ray.remote
def _map_runs(
    paths: list[str], cfg: IndexBuildConfig, heavy: dict[str, int],
    num_reducers: int, avgdl: float,
):
    """Map side of the postings exchange: a group of docterms files -> one
    lean, sorted partial run per (gkey) routed to its reduce partition.

    Raw Ray task (not a Dataset op) by design: Ray Data's sort-based
    groupby materialises an M x M task grid whose fixed scheduling cost
    *grows* with parallelism — measured 2.8s @ 8 cpus vs 13.6s @ 32 cpus
    for the identical 50k-doc merge, inverting scaling.  A classic
    map/reduce exchange with ``num_returns=num_reducers`` is M + P tasks
    and M x P objects (the information-theoretic minimum for a shuffle),
    and each reducer fetches only its own partition.

    Run blob layout: 8-byte little-endian gkey header + Arrow IPC stream
    of (term, doc_local:int32, dl:int32, tftd:int32, pos_blob) — the
    partition key columns are NOT shipped per row (28B/row saved), and
    doc ids travel as int32 offsets within their shard.
    """
    _pin_arrow_threads()
    B = cfg.num_buckets
    dps = cfg.docs_per_shard
    prof = {"read": 0.0, "explode": 0.0, "sort": 0.0, "pack": 0.0,
            "bytes_out": 0, "t0": time.time()}
    out: list[list[bytes]] = [[] for _ in range(num_reducers)]
    for path in paths:
        t = time.perf_counter()
        tbl = pq.read_table(
            path,
            columns=["doc_id", "doc_length", "terms", "tftds", "pos_blob"],
            read_dictionary=["terms.list.element"],
        )
        prof["read"] += time.perf_counter() - t
        t = time.perf_counter()
        arrs = _explode_arrays(cfg, heavy, tbl)
        prof["explode"] += time.perf_counter() - t
        if arrs is None:
            continue
        # sort by (gkey, term-code): term-grouped runs let each piece
        # carry every term ONCE with a run length, instead of one string
        # per (doc, term) row — the dominant remaining shuffle bytes
        t = time.perf_counter()
        # pack (gkey, code) into one int64 when it fits: a single-key
        # argsort makes one pass over the keys where lexsort makes two —
        # real savings on a memory-bandwidth-starved host
        n_uniq = len(arrs["uniq"])
        gk_max = int(arrs["gkey"].max()) if arrs["gkey"].size else 0
        if n_uniq and (gk_max + 1) < (1 << 62) // n_uniq:
            packed = arrs["gkey"] * n_uniq + arrs["codes"]
            order = np.argsort(packed, kind="stable")
        else:
            order = np.lexsort((arrs["codes"], arrs["gkey"]))
        gk = arrs["gkey"][order]
        codes_s = arrs["codes"][order]
        pos_s = arrs["pos_blob"].take(pa.array(order))
        doc_s = arrs["doc_ids"][order]
        wq_s = wdt_quantized(arrs["tftds"], arrs["dls"], avgdl)[order]
        tf_s = arrs["tftds"][order]
        uniq = arrs["uniq"]
        new = np.ones(gk.size, dtype=bool)
        new[1:] = gk[1:] != gk[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], gk.size)
        prof["sort"] += time.perf_counter() - t
        t = time.perf_counter()
        # pack per file (not per task) so each file's exploded arrays can
        # be freed before the next file is read — slices keep their parent
        # buffers alive, and holding a whole file group's data made big
        # maps page-cache hostile at the 2M-doc scale
        for s_, e_ in zip(starts, ends):
            s_i, e_i = int(s_), int(e_)
            gkey = int(gk[s_i])
            shard = gkey // (SALT_WIDTH * B)
            piece_codes = codes_s[s_i:e_i]
            run_new = np.ones(piece_codes.size, dtype=bool)
            run_new[1:] = piece_codes[1:] != piece_codes[:-1]
            run_starts = np.flatnonzero(run_new)
            run_lens = np.diff(np.append(run_starts, piece_codes.size))
            runs_tbl = pa.table(
                {
                    "term": pa.array(
                        [str(t) for t in uniq[piece_codes[run_starts]]],
                        type=pa.string(),
                    ),
                    "n": pa.array(run_lens.astype(np.int32)),
                }
            )
            rows_tbl = pa.table(
                {
                    "doc_local": pa.array(
                        (doc_s[s_i:e_i] - shard * dps).astype(np.int32)
                    ),
                    "wq": pa.array(wq_s[s_i:e_i]),
                    "tftd": pa.array(tf_s[s_i:e_i].astype(np.int32,
                                                          copy=False)),
                    "pos_blob": pos_s.slice(s_i, e_i - s_i),
                }
            )
            runs_bytes = _ipc_bytes(runs_tbl)
            blob = (struct.pack("<qq", gkey, len(runs_bytes))
                    + runs_bytes + _ipc_bytes(rows_tbl))
            prof["bytes_out"] += len(blob)
            out[_reducer_of(gkey, num_reducers)].append(blob)
        prof["pack"] += time.perf_counter() - t
    codec_name = _exchange_codec(cfg)
    if codec_name:
        t = time.perf_counter()
        out = [_frame_compress(blobs, codec_name) for blobs in out]
        prof["compress"] = time.perf_counter() - t
        prof["bytes_wire"] = sum(len(o) for o in out)
    prof["t1"] = time.time()
    _prof_write("map", prof)
    return out if num_reducers > 1 else out[0]


_EXCHANGE_MAGIC = b"SECX"
_CODEC_IDS = {"lz4": 1, "zstd": 2}
_CODEC_BY_ID = {v: k for k, v in _CODEC_IDS.items()}


def _exchange_codec(cfg: IndexBuildConfig) -> str | None:
    env = os.environ.get("SE_RAY_EXCHANGE_COMPRESS")
    if env is not None:
        return None if env.lower() in ("", "0", "none") else env.lower()
    return cfg.exchange_compress


def _frame_compress(blobs: list[bytes], codec_name: str) -> bytes:
    """One wire object per (map, reducer): length-prefixed pieces joined,
    then block-compressed.  Joining before compressing matters — pieces
    share term and IPC-schema bytes (measured 2.8x joined vs 1.4x
    per-piece with lz4), and one big buffer amortises codec call cost."""
    joined = b"".join(struct.pack("<q", len(b)) + b for b in blobs)
    comp = pa.Codec(codec_name).compress(joined, asbytes=True)
    return (_EXCHANGE_MAGIC + bytes([_CODEC_IDS[codec_name]])
            + struct.pack("<q", len(joined)) + comp)


def _iter_wire_blobs(lst):
    """Yield per-piece buffers from one map-output wire object — either
    a plain list of piece blobs (uncompressed path) or a compressed
    frame from :func:`_frame_compress`.  Yields memoryviews; piece
    parsing is zero-copy off the decompressed buffer."""
    if isinstance(lst, (bytes, bytearray, memoryview)):
        mv = memoryview(lst)
        if bytes(mv[:4]) != _EXCHANGE_MAGIC:
            raise ValueError("bad exchange wire frame")
        codec = pa.Codec(_CODEC_BY_ID[mv[4]])
        (rawlen,) = struct.unpack_from("<q", mv, 5)
        raw = memoryview(codec.decompress(mv[13:], rawlen))
        off = 0
        while off < rawlen:
            (blen,) = struct.unpack_from("<q", raw, off)
            yield raw[off + 8: off + 8 + blen]
            off += 8 + blen
    else:
        yield from lst


def _reducer_of(gkey: int, num_reducers: int) -> int:
    """Mix before modulo: gkey is (shard*B + bucket)*SALT_WIDTH + salt, so a
    plain ``gkey % P`` with P dividing SALT_WIDTH=4096 maps every unsalted
    key to reducer 0 (this serialised the whole merge until fixed)."""
    return (((gkey * 0x9E3779B97F4A7C15) % (1 << 64)) >> 17) % num_reducers


def _unpack_blob_lists(
    by_gkey: dict[int, dict],
    blob_lists,
    prof: dict,
) -> None:
    """Decode a batch of map-output blob lists into the per-gkey
    accumulator (shared by the barrier and streaming reduce paths).

    Blob layout: gkey (8B) + runs-IPC length (8B) + runs IPC stream
    (term, n) + rows IPC stream (doc_local, dl, tftd, pos_blob).  Terms
    are interned into a per-reducer dictionary; per-row term ids come
    from np.repeat over run lengths — no per-row strings anywhere."""
    _pt = time.perf_counter()
    for lst in blob_lists:
        for b in _iter_wire_blobs(lst):
            prof["bytes_in"] += len(b)
            # memoryview slices are zero-copy (bytes slices would memcpy
            # every wire byte a second time on the bus-bound reduce path);
            # Arrow IPC then reads table bodies zero-copy off the views.
            mv = b if isinstance(b, memoryview) else memoryview(b)
            gkey, runs_len = struct.unpack_from("<qq", mv)
            runs = pa.ipc.open_stream(
                pa.py_buffer(mv[16:16 + runs_len])).read_all()
            rows = pa.ipc.open_stream(
                pa.py_buffer(mv[16 + runs_len:])).read_all()
            if rows.num_rows == 0:
                continue
            acc = by_gkey.setdefault(
                gkey,
                {"terms": {}, "gids": [], "doc": [], "wq": [],
                 "tf": [], "pos": []},
            )
            interned = acc["terms"]
            piece_gids = np.empty(runs.num_rows, dtype=np.int64)
            for i, t in enumerate(runs.column("term").to_pylist()):
                gid = interned.get(t)
                if gid is None:
                    gid = interned[t] = len(interned)
                piece_gids[i] = gid
            lens = runs.column("n").to_numpy(zero_copy_only=False)
            acc["gids"].append(np.repeat(piece_gids, lens))
            acc["doc"].append(
                _as_array(rows.column("doc_local")).to_numpy(
                    zero_copy_only=False)
            )
            acc["wq"].append(
                _as_array(rows.column("wq")).to_numpy(zero_copy_only=False)
            )
            acc["tf"].append(
                _as_array(rows.column("tftd")).to_numpy(zero_copy_only=False)
            )
            acc["pos"].append(_as_array(rows.column("pos_blob")))
    prof["unpack"] = prof.get("unpack", 0.0) + (time.perf_counter() - _pt)


def _finalize_segment(
    by_gkey: dict[int, dict],
    cfg: IndexBuildConfig,
    avgdl: float,
    out_path: str,
    prof: dict,
):
    """Merge the accumulated runs per gkey and write one segment parquet
    idempotently (tmp + atomic rename)."""
    if not by_gkey:
        return None
    inner = _merge_group_factory(cfg, avgdl)
    _pt = time.perf_counter()
    parts = []
    for gkey, acc in sorted(by_gkey.items()):
        terms_global = np.empty(len(acc["terms"]), dtype=object)
        for t, gid in acc["terms"].items():
            terms_global[gid] = t
        if len(acc["pos"]) == 1:
            pos_chunks = acc["pos"]
        else:
            # map tasks emit pa.binary() (32-bit offsets) when a file's
            # encoded positions fit in 2 GB, else large_binary; a group
            # merging chunks of mixed types — or whose combined blobs
            # exceed 2^31 bytes — must widen to large_binary first
            # (offsets-only cost; values buffers are shared).  Chunks stay
            # a list: merge() gathers straight from the chunked array, so
            # the pos bytes move ONCE (the sort gather), not twice.
            total = sum(c.nbytes for c in acc["pos"])
            mixed = len({str(c.type) for c in acc["pos"]}) > 1
            if mixed or total >= 2**31 - 1:
                pos_chunks = [
                    c if pa.types.is_large_binary(c.type)
                    else c.cast(pa.large_binary())
                    for c in acc["pos"]
                ]
            else:
                pos_chunks = acc["pos"]
        _ct = time.perf_counter()
        gids_c = np.concatenate(acc["gids"])
        doc_c = np.concatenate(acc["doc"])
        wq_c = np.concatenate(acc["wq"])
        tf_c = np.concatenate(acc["tf"])
        prof["m_concat"] = prof.get("m_concat", 0.0) + (
            time.perf_counter() - _ct)
        parts.append(
            inner(gkey, terms_global, gids_c, doc_c, wq_c, tf_c,
                  pos_chunks, prof=prof)
        )
    seg = pa.concat_tables(parts)
    prof["merge"] = time.perf_counter() - _pt
    _pt = time.perf_counter()
    tmp = out_path + ".tmp"
    # no statistics on the blob columns: parquet min/max for a binary
    # column stores two whole values per row group in the footer —
    # for multi-KB posting blobs that DOUBLED the on-disk index (measured
    # 92 -> 44 KB on one segment) and nothing predicate-filters on blobs
    pq.write_table(
        seg, tmp, row_group_size=cfg.segment_row_group_size,
        write_statistics=[c for c in seg.column_names
                          if not c.endswith("blob")],
    )
    os.replace(tmp, out_path)
    prof["write"] = time.perf_counter() - _pt
    prof["t1"] = time.time()
    _prof_write("reduce", prof)
    terms_col = seg.column("term")
    return {
        "file": os.path.basename(out_path),
        "rows": seg.num_rows,
        "buckets": sorted(set(seg.column("bucket").to_pylist())),
        "shards": sorted(set(seg.column("shard").to_pylist())),
        "term_min": pa.compute.min(terms_col).as_py(),
        "term_max": pa.compute.max(terms_col).as_py(),
    }


@ray.remote
def _reduce_runs(
    cfg: IndexBuildConfig,
    avgdl: float,
    out_path: str,
    *blob_lists: list[bytes],
):
    """Barrier reduce: all of this partition's map outputs arrive as
    resolved args (Ray schedules the task only once every map is done),
    then unpack + merge + write."""
    _pin_arrow_threads()
    prof = {"merge": 0.0, "write": 0.0, "bytes_in": 0, "t0": time.time()}
    by_gkey: dict[int, dict] = {}
    _unpack_blob_lists(by_gkey, blob_lists, prof)
    return _finalize_segment(by_gkey, cfg, avgdl, out_path, prof)


@ray.remote
def _reduce_runs_streaming(
    cfg: IndexBuildConfig,
    avgdl: float,
    out_path: str,
    blob_refs: list,
):
    """Streaming reduce (the r3-verdict prefetch-overlap lever): the
    partition's map outputs arrive as a list of UNRESOLVED ObjectRefs
    (refs nested in a list are not awaited by Ray), so this task starts
    alongside the maps, ``ray.wait``s for outputs as they land, and
    unpacks each one immediately — the IPC-decode/intern phase overlaps
    the map tail instead of serialising after it.  While blocked in
    ``ray.wait`` the worker releases its CPU slots, so idle streaming
    reducers do not starve the map wave.  The merge+write still needs
    every input, so only unpack moves off the critical path."""
    _pin_arrow_threads()
    prof = {"merge": 0.0, "write": 0.0, "bytes_in": 0, "t0": time.time(),
            "streamed_batches": 0}
    by_gkey: dict[int, dict] = {}
    pending = list(blob_refs)
    while pending:
        done, pending = ray.wait(pending, num_returns=1)
        _unpack_blob_lists(by_gkey, ray.get(done), prof)
        prof["streamed_batches"] += 1
    return _finalize_segment(by_gkey, cfg, avgdl, out_path, prof)


def build_segments_exchange(
    docterms_dir: str,
    segments_dir: str,
    cfg: IndexBuildConfig,
    heavy: dict[str, int],
    avgdl: float,
    num_reducers: int | None = None,
) -> list[dict]:
    """Run the postings exchange over the docterms files."""
    files = sorted(
        os.path.join(docterms_dir, f)
        for f in os.listdir(docterms_dir)
        if f.endswith(".parquet")
    )
    cpus = int(ray.cluster_resources().get("CPU", 8))
    if num_reducers is None:
        num_reducers = max(8, min(len(files), 2 * cpus))
    os.makedirs(segments_dir, exist_ok=True)
    # coarsen maps so the shuffle's M x P object count stays ~linear in
    # cluster size: M ~= 4 x cpus map tasks regardless of file count
    n_maps = max(1, min(len(files), 4 * cpus))
    groups = [files[i::n_maps] for i in range(n_maps)]
    # exchange tasks are memory-bandwidth-heavy, and this class of host
    # saturates its bus well below one-stream-per-core: above 8 CPUs,
    # schedule each task with 2 CPU slots so at most cpus/2 run at once —
    # each gets a bigger bandwidth share instead of thrashing caches
    env_cpus = os.environ.get("SE_RAY_EXCHANGE_CPUS")
    if env_cpus:
        task_cpus = int(env_cpus)
    elif cfg.exchange_task_cpus is not None:
        task_cpus = cfg.exchange_task_cpus
    else:
        task_cpus = 2 if cpus > 8 else 1
    map_refs = [
        _map_runs.options(num_returns=num_reducers,
                          num_cpus=task_cpus).remote(
            g, cfg, heavy, num_reducers, avgdl
        )
        for g in groups
    ]
    if num_reducers == 1:
        map_refs = [[r] for r in map_refs]
    env_streaming = os.environ.get("SE_RAY_EXCHANGE_STREAMING")
    if env_streaming is not None:
        streaming = env_streaming not in ("", "0")
    else:
        streaming = cfg.exchange_streaming
    if streaming:
        # prefetch overlap: reducers launch alongside the maps and
        # unpack outputs as they land (refs nested in a list are not
        # awaited by Ray — the reducer ray.waits on them itself)
        reduce_refs = [
            _reduce_runs_streaming.options(num_cpus=task_cpus).remote(
                cfg, avgdl,
                os.path.join(segments_dir, f"segment_{r:05d}.parquet"),
                [m[r] for m in map_refs],
            )
            for r in range(num_reducers)
        ]
    else:
        reduce_refs = [
            _reduce_runs.options(num_cpus=task_cpus).remote(
                cfg, avgdl,
                os.path.join(segments_dir, f"segment_{r:05d}.parquet"),
                *[m[r] for m in map_refs],
            )
            for r in range(num_reducers)
        ]
    return [m for m in ray.get(reduce_refs) if m]


def _merge_group_factory(cfg: IndexBuildConfig, avgdl: float):
    """One gkey's postings (columns term, doc_local, dl, tftd, pos_blob)
    -> encoded posting-list fragments.

    Encoding (north rule: delta + VByte + block-max skip metadata;
    SEGMENT_FORMAT v3 stores doc gaps and tftds as two parallel streams):
    - ``blob``: VByte stream of doc gaps, one per posting.  First gap of
      the fragment is the absolute doc_id; gaps are continuous across skip
      blocks, so block k decodes independently given skip_last_doc[k-1] as
      its base.
    - ``tf_blob``: VByte stream of tftds, same posting order
      (``skip_tf_offset`` gives each skip block's start within it).
    - ``pos_blob``: VByte stream of position gaps (absolute at each
      posting's first position, delta inside a posting's list) — arrives
      pre-encoded per row from the maps; a term's stream is a pure
      byte-slice concat.
    - skip arrays, one entry per ``skip_block`` postings: last doc_id,
      max tftd, max BM25 wdt (precomputed against the corpus avgdl so the
      query-time WAND bound is wqt * skip_max_wdt), byte offset into blob.

    All sorting runs on integer arrays (dictionary codes ranked
    lexicographically), never on strings.
    """
    from . import vbyte

    skip_n = cfg.skip_block
    B = cfg.num_buckets
    dps = cfg.docs_per_shard

    def merge(
        gkey: int,
        terms_global: np.ndarray,
        gids: np.ndarray,
        doc_local: np.ndarray,
        wq8: np.ndarray,
        tftds32: np.ndarray,
        pos_chunks: list[pa.Array],
        prof: dict | None = None,
    ) -> pa.Table:
        n = gids.size
        if n == 0:
            return _SEGMENT_SCHEMA.empty_table()
        _pt = time.perf_counter()
        salt = gkey % SALT_WIDTH
        rest = gkey // SALT_WIDTH
        bucket = rest % B
        shard = rest // B

        uniq = terms_global
        rank_of_uniq = np.empty(len(uniq), dtype=np.int32)
        rank_of_uniq[np.argsort(uniq, kind="stable")] = np.arange(
            len(uniq), dtype=np.int32)

        ranks = rank_of_uniq[gids]
        if len(uniq) * dps < (1 << 31):
            # int32 packed key (rank * dps + doc_local): half the
            # radix-sort + key-build traffic of the int64 variant; the
            # guard makes overflow impossible
            order = np.argsort(ranks * np.int32(dps) + doc_local,
                               kind="stable")
        elif len(uniq) < (1 << 62) // dps:
            order = np.argsort(
                ranks.astype(np.int64) * dps + doc_local.astype(np.int64),
                kind="stable")
        else:
            # rows in a gkey share one shard, so doc_local orders
            # identically to the absolute doc_id
            order = np.lexsort((doc_local, ranks))
        codes = gids[order]
        dloc = doc_local[order]          # int32; doc_id = shard*dps + dloc
        wq = wq8[order]
        tf32 = tftds32[order]            # int32, encoded directly (v3)
        tftds = tf32.astype(np.int64)    # int64 view for stats/reduceat
        if prof is not None:
            prof["m_sort"] = prof.get("m_sort", 0.0) + (
                time.perf_counter() - _pt)
            _pt = time.perf_counter()
        # gather pos rows straight from the (possibly chunked) input —
        # the bytes move ONCE, in this gather, instead of a concat pass
        # followed by a take pass
        idx = pa.array(order)
        if len(pos_chunks) == 1:
            pos_arr = pos_chunks[0].take(idx)
        else:
            taken = pa.chunked_array(pos_chunks).take(idx)
            pos_arr = (taken.combine_chunks() if taken.num_chunks != 1
                       else taken.chunk(0))
        # the gather rebuilt the binary array, so its data buffer holds
        # the per-row blobs contiguous in (term, doc_id) order: a term's
        # pos_blob is a pure slice, no decode/re-encode
        off_width = 8 if pa.types.is_large_binary(pos_arr.type) else 4
        pos_row_off = np.frombuffer(
            pos_arr.buffers()[1],
            dtype=np.int64 if off_width == 8 else np.int32,
            count=len(pos_arr) + 1, offset=off_width * pos_arr.offset,
        ).astype(np.int64)
        pos_data = memoryview(pos_arr.buffers()[2])
        if prof is not None:
            prof["m_gather"] = prof.get("m_gather", 0.0) + (
                time.perf_counter() - _pt)
            _pt = time.perf_counter()

        # term-run boundaries (codes are int-sorted by lexicographic rank)
        new_term = np.empty(n, dtype=bool)
        new_term[0] = True
        new_term[1:] = codes[1:] != codes[:-1]
        run_starts = np.flatnonzero(new_term)          # posting index
        run_ends = np.append(run_starts[1:], n)

        # doc gaps: absolute at run start, delta inside run.  Rows in a
        # gkey share ONE shard, so gaps are int32 doc_local diffs (no
        # full int64 doc_ids array) with shard*dps + dloc patched in at
        # the sparse run starts.
        shard_base = np.int64(shard) * dps
        # int32 gap array when even the absolute run-start ids fit (all
        # corpora below 2^31 docs): halves the encode path's memory
        # traffic (diff, length-scan, byte-emit all read this array) on
        # the bandwidth-bound reduce side; int64 only for the huge tail
        gap_dt = np.int32 if shard_base + dps < (1 << 31) else np.int64
        doc_gap = np.empty(n, dtype=gap_dt)
        doc_gap[0] = 0
        np.subtract(dloc[1:], dloc[:-1], out=doc_gap[1:])
        doc_gap[run_starts] = (shard_base + dloc[run_starts]).astype(gap_dt)

        # doc-gap and tf streams encoded separately (format v3): the old
        # interleaved 2n-wide uint64 stream build (strided writes + 2n
        # int64 lengths/cumsum) was the single largest memory-traffic
        # source on the bandwidth-bound reduce side.  All helper arrays
        # here are uint8/int32 for the same reason.
        blen_d = vbyte.encoded_lengths(doc_gap)            # uint8
        if (int(blen_d.sum()) >= 2**31 - 1
                or int(pos_row_off[n]) >= 2**31 - 1):
            raise ValueError(
                "gkey fragment exceeds 2 GB binary-offset range; raise "
                "max_salt / num_buckets so salted sub-ranges stay smaller"
            )
        dbyte_ends = np.cumsum(blen_d, dtype=np.int32)
        dbyte_starts = dbyte_ends - blen_d
        encoded_d = vbyte.encode(doc_gap, blen_d)
        term_byte_start = dbyte_starts[run_starts]
        term_byte_end = dbyte_ends[run_ends - 1]
        tf_plain = bool(int(tf32.max()) < 128)
        if tf_plain:
            # tftds all < 128 (the overwhelmingly common case): the
            # VByte stream IS the low bytes, so byte offsets are posting
            # indices — no length/cumsum arrays at all
            encoded_t = np.ascontiguousarray(tf32).astype(np.uint8).tobytes()
            term_tf_start = run_starts
            term_tf_end = run_ends
            tbyte_starts = None
        else:
            blen_t = vbyte.encoded_lengths(tf32)
            if int(blen_t.sum()) >= 2**31 - 1:
                raise ValueError(
                    "gkey fragment exceeds 2 GB binary-offset range; "
                    "raise max_salt / num_buckets so salted sub-ranges "
                    "stay smaller"
                )
            tbyte_ends = np.cumsum(blen_t, dtype=np.int32)
            tbyte_starts = tbyte_ends - blen_t
            encoded_t = vbyte.encode(tf32, blen_t)
            term_tf_start = tbyte_starts[run_starts]
            term_tf_end = tbyte_ends[run_ends - 1]
        if prof is not None:
            prof["m_encode"] = prof.get("m_encode", 0.0) + (
                time.perf_counter() - _pt)
            _pt = time.perf_counter()

        # byte range of each term run in the row-contiguous pos data
        term_pos_byte_start = pos_row_off[run_starts]
        term_pos_byte_end = pos_row_off[run_ends]

        df = (run_ends - run_starts).astype(np.int64)
        cf = np.add.reduceat(tftds, run_starts).astype(np.int64)
        max_wdt_per_term = (
            np.maximum.reduceat(wq, run_starts).astype(np.float64) / WDT_QUANT
        )

        # fully vectorized fragment assembly (the per-term Python loop
        # with bytes()/.tolist() copies was the dominant merge cost AND
        # doubled the memcpy volume on the bandwidth-bound reduce side):
        # term byte ranges tile `encoded`/`pos_data` contiguously, so
        # both blob columns are zero-copy BinaryArrays over those
        # buffers, and every skip array falls out of ONE global reduceat
        # over strictly-increasing block starts.
        n_terms = len(run_starts)
        blob_off = np.empty(n_terms + 1, dtype=np.int32)
        blob_off[:-1] = term_byte_start
        blob_off[-1] = term_byte_end[-1]
        blob_arr = pa.Array.from_buffers(
            pa.binary(), n_terms,
            [None, pa.py_buffer(blob_off.tobytes()), pa.py_buffer(encoded_d)],
        )
        tf_off = np.empty(n_terms + 1, dtype=np.int32)
        tf_off[:-1] = term_tf_start
        tf_off[-1] = term_tf_end[-1]
        tf_blob_arr = pa.Array.from_buffers(
            pa.binary(), n_terms,
            [None, pa.py_buffer(tf_off.tobytes()), pa.py_buffer(encoded_t)],
        )
        pos_off = np.empty(n_terms + 1, dtype=np.int32)
        pos_off[:-1] = term_pos_byte_start
        pos_off[-1] = term_pos_byte_end[-1]
        pos_blob_arr = pa.Array.from_buffers(
            pa.binary(), n_terms,
            [None, pa.py_buffer(pos_off.tobytes()), pa.py_buffer(pos_data)],
        )

        lens_t = run_ends - run_starts
        nblocks = (lens_t + skip_n - 1) // skip_n
        tot_blocks = int(nblocks.sum())
        block_term = np.repeat(np.arange(n_terms), nblocks)
        first_block = np.cumsum(nblocks) - nblocks
        within = np.arange(tot_blocks) - first_block[block_term]
        gbs = run_starts[block_term] + skip_n * within   # global block starts
        gbe = np.minimum(gbs + skip_n, run_ends[block_term])
        skip_last_v = shard_base + dloc[gbe - 1]
        skip_max_tf_v = np.maximum.reduceat(tftds, gbs).astype(np.int64)
        skip_max_w_v = (
            np.maximum.reduceat(wq, gbs).astype(np.float64) / WDT_QUANT
        )
        skip_off_v = dbyte_starts[gbs] - term_byte_start[block_term]
        if tf_plain:
            skip_tf_off_v = gbs - run_starts[block_term]
        else:
            skip_tf_off_v = tbyte_starts[gbs] - term_tf_start[block_term]
        list_off = pa.array(
            np.concatenate([[0], np.cumsum(nblocks)]).astype(np.int32)
        )

        out_terms = uniq[codes[run_starts]]
        out_tbl = pa.table(
            {
                "term": pa.array(out_terms, type=pa.string()),
                "shard": pa.array(
                    np.full(n_terms, shard, dtype=np.int32)),
                "salt": pa.array(np.full(n_terms, salt, dtype=np.int32)),
                "bucket": pa.array(
                    np.full(n_terms, bucket, dtype=np.int32)),
                "df": pa.array(df, type=pa.int64()),
                "cf": pa.array(cf, type=pa.int64()),
                "max_wdt": pa.array(max_wdt_per_term, type=pa.float64()),
                "blob": blob_arr,
                "tf_blob": tf_blob_arr,
                "pos_blob": pos_blob_arr,
                "skip_last_doc": pa.ListArray.from_arrays(
                    list_off, pa.array(skip_last_v, type=pa.int64())),
                "skip_max_tftd": pa.ListArray.from_arrays(
                    list_off, pa.array(skip_max_tf_v, type=pa.int64())),
                "skip_max_wdt": pa.ListArray.from_arrays(
                    list_off, pa.array(skip_max_w_v, type=pa.float64())),
                "skip_offset": pa.ListArray.from_arrays(
                    list_off, pa.array(skip_off_v, type=pa.int64())),
                "skip_tf_offset": pa.ListArray.from_arrays(
                    list_off, pa.array(skip_tf_off_v, type=pa.int64())),
            },
            schema=_SEGMENT_SCHEMA,
        )
        if prof is not None:
            prof["m_skip_tbl"] = prof.get("m_skip_tbl", 0.0) + (
                time.perf_counter() - _pt)
        return out_tbl

    return merge


def _stage_done(index_dir: str, stage: str, fingerprint: str) -> bool:
    marker = os.path.join(index_dir, f"_STAGE_{stage}.json")
    if not os.path.exists(marker):
        return False
    try:
        with open(marker) as f:
            return json.load(f).get("fingerprint") == fingerprint
    except (json.JSONDecodeError, OSError):
        return False


def _commit_stage(index_dir: str, stage: str, fingerprint: str, **metrics) -> None:
    marker = os.path.join(index_dir, f"_STAGE_{stage}.json")
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"stage": stage, "fingerprint": fingerprint, **metrics}, f, indent=1)
    os.replace(tmp, marker)


def _dir_lineage(path: str) -> list[dict]:
    """Per-file lineage/metrics from parquet footers (no data read)."""
    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        full = os.path.join(path, name)
        md = pq.ParquetFile(full).metadata
        out.append(
            {"file": name, "rows": md.num_rows, "bytes": os.path.getsize(full)}
        )
    return out


def _sum_counts(tbls: list[pa.Table]) -> pa.Table:
    """Sum (term, n) tables by term, vectorized via dictionary codes."""
    combined = pa.concat_tables(tbls).combine_chunks()
    dic = _as_array(combined.column("term")).dictionary_encode()
    codes = dic.indices.to_numpy(zero_copy_only=False)
    ns = combined.column("n").to_numpy(zero_copy_only=False)
    sums = np.zeros(len(dic.dictionary), dtype=np.int64)
    np.add.at(sums, codes, ns)
    keep = np.flatnonzero(sums > 0)
    return pa.table(
        {
            "term": dic.dictionary.take(pa.array(keep)),
            "n": pa.array(sums[keep], type=pa.int64()),
        }
    )


@ray.remote
def _merge_counts(*tbls) -> pa.Table:
    """Tree-reduce node: sum a fan-in of (term, n) partials."""
    _pin_arrow_threads()
    return _sum_counts([t for t in tbls if t is not None])


@ray.remote
def _filter_heavy(tbl: pa.Table, cutoff: float) -> pa.Table:
    """Tree-reduce root: keep only terms whose summed sample count
    clears the heavy cutoff — the driver then receives O(heavy set)
    rows, never the vocabulary."""
    _pin_arrow_threads()
    ns = tbl.column("n").to_numpy(zero_copy_only=False)
    keep = np.flatnonzero(ns >= cutoff)
    return tbl.take(pa.array(keep))


# engage the tree reduce above this many summed partial rows (tasks x
# per-task distinct vocab); below it the driver-side sum is faster.
# Env override for tests/A-Bs.
HEAVY_TREE_ROWS = int(os.environ.get("SE_RAY_HEAVY_TREE_ROWS", "4000000"))
_HEAVY_TREE_FANIN = 8


@ray.remote
def _heavy_partial_counts(files: list[str]) -> tuple[pa.Table | None, int]:
    """Per-task combiner for heavy-hitter detection: df counts of this
    task's sample files, summed over per-chunk dictionary codes (no flat
    term strings are ever materialized) and combined to one
    (term, n) row per distinct term before leaving the task.  Returns
    (table, row count) as two objects so the driver can inspect sizes
    (to pick driver-sum vs tree-reduce) without fetching the tables."""
    _pin_arrow_threads()
    parts = []
    for f in files:
        tbl = pq.read_table(f, columns=["terms"],
                            read_dictionary=["terms.list.element"])
        for chunk in tbl.column("terms").chunks:
            flat = chunk.flatten()
            if not isinstance(flat, pa.DictionaryArray):
                flat = flat.dictionary_encode()
            codes = flat.indices.to_numpy(zero_copy_only=False)
            counts = np.bincount(codes[codes >= 0],
                                 minlength=len(flat.dictionary))
            keep = np.flatnonzero(counts > 0)
            parts.append(
                pa.table(
                    {
                        "term": flat.dictionary.take(pa.array(keep)),
                        "n": pa.array(counts[keep], type=pa.int64()),
                    }
                )
            )
    if not parts:
        return None, 0
    out = _sum_counts(parts)
    return out, out.num_rows


def detect_heavy_terms(
    docterms_dir: str, cfg: IndexBuildConfig
) -> dict[str, int]:
    """Heavy-hitter detection: per-task partial df counts (combiner,
    dictionary-code bincounts) -> driver final sum -> {term: salt_width}
    for terms whose df within one shard could exceed the threshold."""
    if cfg.heavy_df_threshold is None:
        return {}
    threshold = cfg.heavy_df_threshold

    # deterministic file sample: df-threshold detection only steers
    # salting (a miss means one hot reducer group, not wrong results), so
    # estimating df from ~1/10 of the files and extrapolating with a 1.5x
    # safety margin is enough — and keeps this pass O(sample) at any scale
    all_files = sorted(
        os.path.join(docterms_dir, f)
        for f in os.listdir(docterms_dir)
        if f.endswith(".parquet")
    )
    step = max(1, len(all_files) // max(4, len(all_files) // 10))
    sample_files = all_files[::step] or all_files
    scale_up = 1.5 * len(all_files) / len(sample_files)
    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_tasks = max(1, min(len(sample_files), 2 * cpus))
    groups = [sample_files[i::n_tasks] for i in range(n_tasks)]
    # raw tasks reading terms DICTIONARY-ENCODED (same idiom as
    # _map_runs): the parquet dictionary pages decode straight to codes,
    # so counting is bincount over ints — the previous Ray Data path
    # re-hashed every flat term string per batch, which made the stage a
    # fixed ~10 s at ANY cpu count at 1M docs (anti-scaling, measured)
    partial_refs = [
        _heavy_partial_counts.options(num_returns=2).remote(g)
        for g in groups
    ]
    tbl_refs = [r[0] for r in partial_refs]
    part_rows = ray.get([r[1] for r in partial_refs])
    total_rows = sum(part_rows)
    if total_rows == 0:
        return {}
    if total_rows > HEAVY_TREE_ROWS and len(tbl_refs) > 1:
        # tree reduce (VERDICT r3 #8): pairwise merge tasks sum the
        # partials and the ROOT applies the heavy cutoff, so the driver
        # receives O(heavy set) rows — never tasks x vocab
        refs = [r for r, n in zip(tbl_refs, part_rows) if n]
        while len(refs) > 1:
            refs = [
                _merge_counts.remote(*refs[i:i + _HEAVY_TREE_FANIN])
                for i in range(0, len(refs), _HEAVY_TREE_FANIN)
            ]
        heavy_tbl = ray.get(
            _filter_heavy.remote(refs[0], threshold / scale_up))
    else:
        # small vocab: one vectorized driver-side sum + local filter
        tbls = [t for t in ray.get(tbl_refs)
                if t is not None and t.num_rows]
        all_parts = _sum_counts(tbls)
        ns = all_parts.column("n").to_numpy(zero_copy_only=False)
        keep = np.flatnonzero(ns >= threshold / scale_up)
        heavy_tbl = all_parts.take(pa.array(keep))

    ns = heavy_tbl.column("n").to_numpy(zero_copy_only=False)
    est = ns * scale_up  # extrapolate sample -> corpus df estimate
    heavy = {}
    for t, e in zip(heavy_tbl.column("term").to_pylist(), est):
        if t:
            heavy[t] = min(
                cfg.max_salt, max(2, int(np.ceil(e / threshold)))
            )
    return heavy


@ray.remote
def _sum_doc_lengths(files: list[str]) -> tuple[int, int]:
    """(rows, sum(doc_length)) over a group of docterms files — the
    distributed corpus-scalar aggregate (one int64 column per file in
    memory at a time, never the corpus)."""
    _pin_arrow_threads()
    rows, tot = 0, 0
    for f in files:
        t = pq.read_table(f, columns=["doc_length"])
        rows += t.num_rows
        tot += int(pa.compute.sum(t.column("doc_length")).as_py() or 0)
    return rows, tot


def corpus_scalars(docterms_dir: str) -> tuple[int, int]:
    """(num_docs, total_tokens) via a small remote tree: the driver holds
    O(tasks) partials, never an O(corpus) column (VERDICT r3 #4 — the old
    single-process ``pq.read_table(columns=["doc_length"])`` materialised
    8 GB on the driver at 10^9 docs)."""
    files = sorted(
        os.path.join(docterms_dir, f)
        for f in os.listdir(docterms_dir)
        if f.endswith(".parquet")
    )
    if not files:
        return 0, 0
    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_tasks = max(1, min(len(files), 2 * cpus))
    groups = [files[i::n_tasks] for i in range(n_tasks)]
    parts = ray.get([_sum_doc_lengths.remote(g) for g in groups])
    return sum(p[0] for p in parts), sum(p[1] for p in parts)


def build_index(
    corpus: ray.data.Dataset,
    index_dir: str,
    cfg: IndexBuildConfig | None = None,
    input_description: str = "",
) -> dict:
    """Run the full build; returns the manifest dict.  Resumable: completed
    stages (matching fingerprint markers) are skipped on re-run."""
    cfg = cfg or IndexBuildConfig()
    os.makedirs(index_dir, exist_ok=True)
    fingerprint = json.dumps(
        {"input": input_description, "cfg": cfg.to_json(),
         "fmt": SEGMENT_FORMAT, "dfmt": DOCTERMS_FORMAT}, sort_keys=True
    )
    t0 = time.perf_counter()
    stage_seconds: dict[str, float] = {}

    docterms_dir = os.path.join(index_dir, "docterms")
    segments_dir = os.path.join(index_dir, "segments")

    # ---- stage 1: tokenize -> docterms ----
    if not _stage_done(index_dir, "docterms", fingerprint):
        if cfg.id_col not in corpus.schema().names:
            from .ids import assign_doc_ids

            corpus = assign_doc_ids(corpus)
        else:
            # the reader indexes num_docs-sized arrays by doc_id: a sparse or
            # non-zero-based pre-assigned id column would crash at query time,
            # so validate density up front (one pruned aggregate pass)
            from ray.data.aggregate import Count, Max, Min

            agg = corpus.select_columns([cfg.id_col]).aggregate(
                Min(cfg.id_col), Max(cfg.id_col), Count()
            )
            lo, hi, n = (agg[f"min({cfg.id_col})"], agg[f"max({cfg.id_col})"],
                         agg["count()"])
            if n and (lo != 0 or hi != n - 1):
                raise ValueError(
                    f"pre-assigned {cfg.id_col!r} must be dense 0..N-1 "
                    f"(got min={lo}, max={hi}, rows={n}); drop the column to "
                    f"have build_index assign ids, or re-assign with "
                    f"searchengine_ray.ids.assign_doc_ids"
                )
        import shutil

        shutil.rmtree(docterms_dir, ignore_errors=True)
        tokenizer = TokenizeDocs(cfg)  # plain-task stage; cache resolves
        # per worker process via _worker_cache (state without actor pools)
        corpus.map_batches(
            lambda batch, _t=tokenizer: _t(batch),
            batch_format="pyarrow",
            batch_size=cfg.tokenize_batch_size,
        ).map_batches(
            # identity rebatch: coalesce the per-tokenize-batch blocks so
            # parquet row groups are docterms_block_rows, not batch_size
            lambda b: b,
            batch_format="pyarrow",
            batch_size=cfg.docterms_block_rows,
        ).write_parquet(docterms_dir)
        stage_seconds["tokenize"] = time.perf_counter() - t0
        _commit_stage(
            index_dir, "docterms", fingerprint, files=_dir_lineage(docterms_dir)
        )

    # doc stats are a pure column projection of docterms: served by parquet
    # column pruning on the docterms files directly (no second pass/copy)

    # ---- stage 2: heavy-hitter detection + postings merge -> segments ----
    if not _stage_done(index_dir, "segments", fingerprint):
        import shutil

        # corpus scalars via a distributed pruned-column aggregate —
        # needed now so block-max BM25 wdt bounds go into the segments
        n_docs, tot = corpus_scalars(docterms_dir)
        avgdl = (tot / n_docs) if n_docs else 1.0

        heavy = detect_heavy_terms(docterms_dir, cfg)
        stage_seconds["heavy_detect"] = (
            time.perf_counter() - t0 - sum(stage_seconds.values())
        )
        shutil.rmtree(segments_dir, ignore_errors=True)
        seg_metrics = build_segments_exchange(
            docterms_dir, segments_dir, cfg, heavy, avgdl,
            num_reducers=cfg.num_reducers,
        )
        stage_seconds["exchange"] = (
            time.perf_counter() - t0 - sum(stage_seconds.values())
        )
        _commit_stage(
            index_dir,
            "segments",
            fingerprint,
            heavy_terms={t: w for t, w in heavy.items()},
            num_docs=n_docs,
            total_tokens=tot,
            segment_metrics=seg_metrics,
            files=[{"file": m["file"], "rows": m["rows"]}
                   for m in seg_metrics],
        )

    # ---- finalize: manifest (commit point) ----
    with open(os.path.join(index_dir, "_STAGE_segments.json")) as f:
        seg_marker = json.load(f)
    seg_files = seg_marker.get("segment_metrics", [])
    num_docs = seg_marker.get("num_docs")
    total_tokens = seg_marker.get("total_tokens")
    if num_docs is None or total_tokens is None:
        num_docs, total_tokens = corpus_scalars(docterms_dir)

    with open(os.path.join(index_dir, "_STAGE_segments.json")) as f:
        heavy_terms = json.load(f).get("heavy_terms", {})

    manifest = {
        "version": 1,
        "segment_format": SEGMENT_FORMAT,
        "input": input_description,
        "config": cfg.to_json(),
        "fingerprint": fingerprint,
        "num_docs": num_docs,
        "total_tokens": total_tokens,
        "avg_doc_length": (total_tokens / num_docs) if num_docs else 0.0,
        "num_buckets": cfg.num_buckets,
        "docs_per_shard": cfg.docs_per_shard,
        "heavy_terms": heavy_terms,
        "segments": seg_files,
        "doc_stats_dir": "docterms",
        "docstats_files": _dir_lineage(docterms_dir),
        "build_seconds": time.perf_counter() - t0,
        "stage_seconds": {
            **{k: round(v, 3) for k, v in stage_seconds.items()},
            "finalize": round(
                time.perf_counter() - t0 - sum(stage_seconds.values()), 3
            ),
        },
    }
    tmp = os.path.join(index_dir, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(index_dir, MANIFEST_NAME))
    return manifest
