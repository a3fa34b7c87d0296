"""Deduplication operators for large-scale training-data pipelines.

All operators take/return ``ray.data.Dataset`` and are shuffle- and
driver-conscious.  Shapes (round-2 redesign — no driver-side union-find,
``take_all()`` or text fetch anywhere; see ops/graph.py):

- exact:      shuffle (sha256, id) only — never the text; non-min ids per
              digest group become an on-disk drop list; the corpus is
              filtered with per-batch pruned anti-join reads.
- minhash:    per-batch *vectorized* token-hash -> gram-fold -> minhash
              signatures (numpy reduceat; md5 only per unique token with a
              per-actor cache); signatures materialized once as bucketed
              parquet; LSH band shuffle carries (band_key, id) = 16 B/row;
              candidate pairs verified distributedly by joining signatures
              from the bucketed store (Jaccard estimate = matching
              signature fraction, the standard MinHash estimator);
              clusters via distributed star-contraction components.
- simhash:    4x16-bit band shuffle carrying (band_key, id, fp) = 24 B/row;
              Hamming verify in-bucket (vectorized popcount); distributed
              components.
- embedding:  random-hyperplane LSH; the band shuffle carries
              (band_key, id) ONLY — unit vectors are materialized once as
              bucketed parquet and re-read for exact in-task cosine verify
              (fixes round-1's full-vector-per-band shuffle).

Every hash here is deliberately SQL-replicable (md5-derived token hashes,
mod-2^32 polynomial gram folds, (a*g+b) mod 2^31-1 minhash family) so the
driver's DuckDB oracles can recompute the exact same pipeline; see
``oracle_sql()`` in __ray_entry__.py.  Mega-buckets (e.g. all-empty docs
sharing one band key) are capped: buckets wider than ``bucket_cap`` emit
an anchor-star pairing instead of O(n^2) pairs — for identical content the
star still connects the whole cluster through verification.

Scale notes: the all-to-all volume is tens of bytes/doc; candidate pairs
stay a Dataset end-to-end; cluster labels come from
``graph.connected_components`` (one groupby per round); the final filter
streams the corpus against an on-disk sorted drop list.  No stage holds
O(corpus) — or even O(duplicates) — state on the driver.
"""

from __future__ import annotations

import hashlib
import itertools
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from .graph import (
    anti_join_ids,
    attach_bucketed,
    connected_components,
    labels_to_drop_dir,
    scratch_dir,
    write_bucketed,
    write_drop_ids,
)

P31 = (1 << 31) - 1    # Mersenne prime minhash modulus: a*g' wraps ~2^31
                       # times (good mixing) yet products stay < 2^62, so
                       # the SQL oracle replays it in plain BIGINT math
MASK32 = (1 << 32) - 1
FOLD_P = 1000003       # gram-fold multiplier (< 2^31: products stay < 2^63)
BAND_C1 = 1000000007   # band-fold multipliers: two independent 32-bit
BAND_C2 = 998244353    # folds give an effectively collision-free 64-bit key

_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount for uint64 arrays of any shape."""
    b = np.ascontiguousarray(x, dtype=np.uint64).view(np.uint8)
    return _POPCOUNT8[b].reshape(*x.shape, 8).sum(axis=-1, dtype=np.int64)


def md5_hash32(token: str) -> int:
    """First 4 md5 bytes as an int — replicable in SQL as
    ('0x' || substring(md5(t), 1, 8))::BIGINT."""
    return int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:4], "big")


def md5_hash64(token: str) -> int:
    """First 8 md5 bytes as an int — replicable in SQL via substring 1,16."""
    return int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:8], "big")


class _TokenHashCache:
    """Per-actor token -> hash memo (Zipfian vocabularies make repeated
    md5 calls the hot cost; the cache turns them into dict hits)."""

    def __init__(self, fn, max_size: int = 2_000_000):
        self.fn = fn
        self.max_size = max_size
        self.memo: dict[str, int] = {}

    def hash_all(self, tokens: list[str]) -> np.ndarray:
        memo = self.memo
        if len(memo) > self.max_size:
            memo.clear()
        fn = self.fn
        out = np.empty(len(tokens), dtype=np.uint64)
        for i, t in enumerate(tokens):
            v = memo.get(t)
            if v is None:
                v = memo[t] = fn(t)
            out[i] = v
        return out


def _flat_tokens(texts: list[str]) -> tuple[list[str], np.ndarray]:
    """Whitespace tokens of all docs flattened + per-doc offsets."""
    toks = [t.lower().split() for t in texts]
    lens = np.fromiter((len(x) for x in toks), dtype=np.int64, count=len(toks))
    offsets = np.concatenate([[0], np.cumsum(lens)])
    return list(itertools.chain.from_iterable(toks)), offsets


# Process-global hasher instances for plain-task map stages: Ray reuses
# worker processes, so module state gives actor-style cache reuse without
# paying actor-pool spin-up (~2-4 s for a short stage; same pattern as
# build._worker_cache, measured in BASELINE.md §4).
_GLOBAL_STAGES: dict = {}


def stage_task_fn(cls, **kwargs):
    """A plain map_batches task fn that lazily builds (once per worker
    process) and reuses a stateful stage instance of ``cls``."""
    key = (cls.__module__, cls.__qualname__, tuple(sorted(kwargs.items())))

    def fn(batch: pa.Table) -> pa.Table:
        inst = _GLOBAL_STAGES.get(key)
        if inst is None:
            inst = _GLOBAL_STAGES[key] = cls(**kwargs)
        return inst(batch)

    return fn


# ---------------------------------------------------------------- exact ----

def exact_dedup(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Keep the lowest-id row per exact content (sha256) group.  Only
    (digest, id) rows enter the shuffle — the text never moves."""

    def digests(batch: pa.Table) -> pa.Table:
        d = [hashlib.sha256(t.encode("utf-8")).digest()
             for t in batch.column(text_col).to_pylist()]
        return pa.table(
            {"_digest": pa.array(d, type=pa.binary(32)),
             id_col: batch.column(id_col)}
        )

    def non_min(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table({"drop_id": pa.array(np.sort(ids)[1:], type=pa.int64())})

    drops = (
        ds.map_batches(digests, batch_format="pyarrow")
        .groupby("_digest")
        .map_groups(non_min, batch_format="pyarrow")
    )
    drop_dir = scratch_dir("exact_drop")
    if write_drop_ids(drops, drop_dir) == 0:
        return ds
    return anti_join_ids(ds, drop_dir, id_col)


# -------------------------------------------------------------- shingles ----

def _blake8(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(),
                          "big")


def _char_shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct 64-bit hashes of the text's character k-shingles (test /
    verifier utility; the dedup hot path uses vectorized gram folds)."""
    t = text.lower()
    views = [t] if len(t) < k else [t[i:i + k] for i in range(len(t) - k + 1)]
    return np.fromiter((_blake8(s) for s in set(views)), dtype=np.uint64)


def _word_shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    words = text.lower().split()
    if len(words) < k:
        grams = [" ".join(words)] if words else [""]
    else:
        grams = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    return np.fromiter((_blake8(s) for s in set(grams)), dtype=np.uint64)


SHINGLERS = {"char": _char_shingle_hashes, "word": _word_shingle_hashes}


def ngram_jaccard(a: str, b: str, shingler: str = "word", k: int = 3) -> float:
    """Exact n-gram Jaccard similarity of two texts."""
    ha = set(SHINGLERS[shingler](a, k).tolist())
    hb = set(SHINGLERS[shingler](b, k).tolist())
    if not ha and not hb:
        return 1.0
    return len(ha & hb) / len(ha | hb)


# -------------------------------------------------------------- minhash ----

def minhash_family(num_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """The (a, b) coefficients of the (a*(g mod p) + b) mod p family with
    p = 2^31-1: a uniform in [1, p) makes the affine map wrap the modulus
    ~2^31 times (proper min-wise mixing) while every product stays < 2^62,
    fitting signed 64-bit in both numpy and the DuckDB oracle."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, P31, size=num_hashes).astype(np.uint64)
    b = rng.integers(0, P31, size=num_hashes).astype(np.uint64)
    return a, b


def gram_fold(h: np.ndarray, lens: np.ndarray, offsets: np.ndarray,
              k: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc word k-gram polynomial fold over 32-bit token hashes.

    Returns (grams flat uint64 < 2^32, per-doc gram start offsets).  A doc
    with n >= k tokens yields n-k+1 grams; 0 < n < k yields one gram over
    all its tokens; an empty doc yields the single gram 0 (so identical
    empty docs still dedup together).  fold: acc = (acc*P + h) mod 2^32.
    """
    n_docs = len(lens)
    if len(h) >= k:
        acc = h[: len(h) - k + 1].copy()
        for j in range(1, k):
            acc = (acc * FOLD_P + h[j: len(h) - k + 1 + j]) & MASK32
    else:
        acc = np.empty(0, dtype=np.uint64)
    parts = []
    gram_counts = np.empty(n_docs, dtype=np.int64)
    for d in range(n_docs):
        ln = lens[d]
        if ln >= k:
            parts.append(acc[offsets[d]: offsets[d] + ln - k + 1])
            gram_counts[d] = ln - k + 1
        elif ln > 0:
            g = np.uint64(0)
            for j in range(offsets[d], offsets[d + 1]):
                g = (g * np.uint64(FOLD_P) + h[j]) & np.uint64(MASK32)
            parts.append(np.array([g], dtype=np.uint64))
            gram_counts[d] = 1
        else:
            parts.append(np.zeros(1, dtype=np.uint64))
            gram_counts[d] = 1
    grams = np.concatenate(parts) if parts else np.empty(0, dtype=np.uint64)
    gram_offsets = np.concatenate([[0], np.cumsum(gram_counts)])
    return grams, gram_offsets


class MinHasher:
    """Stateful signature stage: hash-family coefficients and the token
    hash memo live per actor (__init__ once, __call__ per batch).  The
    per-batch path is fully vectorized: one (chunked) broadcast multiply
    over all grams of the batch + np.minimum.reduceat at doc boundaries.
    """

    HASH_CHUNK = 32  # family rows per broadcast chunk (bounds temp memory)

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        num_hashes: int = 128,
        shingle_k: int = 3,
        seed: int = 1234,
    ):
        self.a, self.b = minhash_family(num_hashes, seed)
        self.text_col = text_col
        self.id_col = id_col
        self.shingle_k = shingle_k
        self.num_hashes = num_hashes
        self.cache = _TokenHashCache(md5_hash32)

    def signatures(self, texts: list[str]) -> np.ndarray:
        """(n_docs, num_hashes) uint64 signature matrix."""
        flat, offsets = _flat_tokens(texts)
        h = self.cache.hash_all(flat)
        lens = np.diff(offsets)
        grams, goff = gram_fold(h, lens, offsets, self.shingle_k)
        gp = grams % np.uint64(P31)
        n = len(texts)
        sig = np.empty((n, self.num_hashes), dtype=np.uint64)
        starts = goff[:-1]
        for c in range(0, self.num_hashes, self.HASH_CHUNK):
            a = self.a[c: c + self.HASH_CHUNK, None]
            b = self.b[c: c + self.HASH_CHUNK, None]
            vals = (a * gp[None, :] + b) % np.uint64(P31)
            sig[:, c: c + a.shape[0]] = np.minimum.reduceat(
                vals, starts, axis=1
            ).T
        return sig

    def signature(self, text: str) -> np.ndarray:
        return self.signatures([text])[0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        sig = self.signatures(batch.column(self.text_col).to_pylist())
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "signature": pa.FixedSizeListArray.from_arrays(
                    pa.array(sig.reshape(-1), type=pa.uint64()),
                    self.num_hashes,
                ),
            }
        )


def _sig_matrix(col: pa.ChunkedArray | pa.Array, width: int) -> np.ndarray:
    """(n, width) matrix from a (fixed-size) list column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.flatten().to_numpy(zero_copy_only=False).reshape(-1, width)


def band_keys(sig: np.ndarray, num_bands: int) -> np.ndarray:
    """(n, num_bands) uint64 LSH band keys: two mod-2^32 polynomial folds
    of the band's signature values under different multipliers, packed
    into 64 bits — SQL-replicable with BIGINT-safe arithmetic; a pair of
    distinct bands colliding on both folds is ~2^-64."""
    n, h = sig.shape
    r = h // num_bands
    s = sig.reshape(n, num_bands, r)
    binit = np.arange(1, num_bands + 1, dtype=np.uint64)[None, :]
    acc1 = np.broadcast_to(binit, (n, num_bands)).copy()
    acc2 = acc1.copy()
    for j in range(r):
        acc1 = (acc1 * np.uint64(BAND_C1) + s[:, :, j]) & np.uint64(MASK32)
        acc2 = (acc2 * np.uint64(BAND_C2) + s[:, :, j]) & np.uint64(MASK32)
    return (acc1 << np.uint64(32)) | acc2


def _pairs_from_ids(ids: np.ndarray, cap: int) -> tuple[np.ndarray, np.ndarray]:
    """All unordered pairs of sorted-unique ids; buckets wider than ``cap``
    fall back to an anchor star (min id vs rest) to stay O(n)."""
    n = len(ids)
    if n <= cap:
        ii, jj = np.triu_indices(n, k=1)
        return ids[ii], ids[jj]
    print(f"[dedup] capping LSH bucket of {n} ids to an anchor star "
          f"(cap={cap})")
    return np.full(n - 1, ids[0], dtype=np.int64), ids[1:]


def _bucket_pairs_factory(id_col: str, cap: int):
    def pairs(group: pa.Table) -> pa.Table:
        ids = np.unique(group.column(id_col).to_numpy(zero_copy_only=False))
        if len(ids) < 2:
            return pa.table(
                {"id_a": pa.array([], type=pa.int64()),
                 "id_b": pa.array([], type=pa.int64())}
            )
        a, b = _pairs_from_ids(ids.astype(np.int64), cap)
        return pa.table(
            {"id_a": pa.array(a, type=pa.int64()),
             "id_b": pa.array(b, type=pa.int64())}
        )

    return pairs


def _dedup_pair_arrays(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    if len(a):
        keep = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        a, b = a[keep], b[keep]
    return a, b


def _collapse_local(a: np.ndarray, b: np.ndarray) -> pa.Table:
    """Task-LOCAL union-find over this group's verified pairs, emitting
    star edges (node, local_root).  Connectivity is preserved exactly
    (components within the group collapse to stars; shared nodes still
    join components across groups) while typical dup cliques reach the
    global star-contraction fixpoint in a single round.  This is
    per-task state over one group's pairs — nothing driver-side."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        p = parent.setdefault(x, x)
        while p != x:
            parent[x] = p = parent.setdefault(p, p)
            x = p
            p = parent[x]
        return x

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    out_a, out_b = [], []
    for n in parent:
        r = find(n)
        if r != n:
            out_a.append(n)
            out_b.append(r)
    return pa.table(
        {"id_a": pa.array(out_a, type=pa.int64()),
         "id_b": pa.array(out_b, type=pa.int64())}
    )


def _finish_dedup(
    ds: ray.data.Dataset, verified: ray.data.Dataset, id_col: str, tag: str
) -> ray.data.Dataset:
    """verified edges -> distributed components -> on-disk drop list ->
    streamed anti-join of the input."""
    labels = connected_components(verified)
    drop_dir = scratch_dir(f"{tag}_drop")
    if labels_to_drop_dir(labels, drop_dir) == 0:
        return ds
    return anti_join_ids(ds, drop_dir, id_col)


def _write_store_batch(
    tbl: pa.Table, sig_dir: str, id_col: str, num_buckets: int
) -> None:
    """Append one map batch's side-table rows to a bucketed store.
    File names derive from the batch's min id, so a retried task that
    re-reads the same input batch overwrites its own files.  A retry
    that REBATCHES differently (observed on the docstats side-writes
    under storm-window retries) can instead strand a stale file whose
    rows duplicate the retry's — benign HERE, unlike docstats: every
    store row is a pure function of its doc (signature / unit vector),
    and every consumer resolves ids via ``np.searchsorted`` over the
    id-sorted side table, which lands on one of the identical copies;
    nothing counts or sums store rows.  File count is O(batches x
    touched buckets) — the caller's ``batch_size`` IS the write
    granularity, so at large scale raise it together with
    ``num_join_buckets`` (e.g. 8192-row batches -> ~2k files per
    billion rows per bucket)."""
    ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
    if not len(ids):
        return
    jb = (ids % num_buckets).astype(np.int32)
    tag = int(ids.min())
    for b in np.unique(jb):
        d = os.path.join(sig_dir, f"jb={int(b)}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            tbl.filter(pa.array(jb == b)),
            os.path.join(d, f"part-{tag:015d}.parquet"),
            # id-column stats power read_bucket's row-group pruning;
            # stats on payload columns (text / signature blobs) would
            # store whole values as min/max in the footer
            write_statistics=[id_col],
        )


def _minhash_band_pairs(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    num_hashes: int,
    num_bands: int,
    shingle_k: int,
    seed: int,
    bucket_cap: int,
    sig_dir: str | None = None,
    num_join_buckets: int = 16,
) -> ray.data.Dataset:
    """Lazy MinHash LSH candidate pairs: ONE fused map stage computes
    signatures and emits the exploded (band_key, id) rows, then the band
    groupby yields deduped in-bucket pairs.  When ``sig_dir`` is given
    the same map stage also writes each batch's signature rows to the
    id-bucketed parquet store — the band groupby is a barrier, so the
    store is complete before any downstream stage can read it.  (Fuses
    round-2's three sequential executions — signature materialize, band
    shuffle, store write — into one; VERDICT r2 "Next round" #2.)"""
    hasher_key = dict(
        text_col=text_col, id_col=id_col, num_hashes=num_hashes,
        shingle_k=shingle_k, seed=seed,
    )
    hasher_fn = stage_task_fn(MinHasher, **hasher_key)

    def sig_and_explode(batch: pa.Table) -> pa.Table:
        sigtbl = hasher_fn(batch)
        if sig_dir is not None:
            _write_store_batch(sigtbl, sig_dir, id_col, num_join_buckets)
        sig = _sig_matrix(sigtbl.column("signature"), num_hashes)
        keys = band_keys(sig, num_bands)
        ids = sigtbl.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "band_key": pa.array(keys.reshape(-1)),
                id_col: pa.array(np.repeat(ids, num_bands), type=pa.int64()),
            }
        )

    return (
        ds.map_batches(sig_and_explode, batch_format="pyarrow",
                       batch_size=256)
        .groupby("band_key")
        .map_groups(_bucket_pairs_factory(id_col, bucket_cap),
                    batch_format="pyarrow")
    )


def minhash_lsh_dedup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 128,
    num_bands: int = 32,
    threshold: float = 0.8,
    shingle_k: int = 3,
    seed: int = 1234,
    num_join_buckets: int = 16,
    bucket_cap: int = 256,
) -> ray.data.Dataset:
    """Near-dup removal: vectorized MinHash signatures -> LSH band shuffle
    (16 B/row) -> distributed signature-estimate verification (matching
    signature fraction >= threshold, the unbiased MinHash Jaccard
    estimator) -> distributed components -> keep the min id per cluster.

    Single-pass candidate generation: the signature map stage writes the
    id-bucketed signature store as a side effect while feeding the band
    shuffle, so neither text nor signatures are ever collected on the
    driver, nothing is materialized before the verification groupby, and
    the empty-candidate case flows through (zero drop ids -> the input
    Dataset is returned unchanged)."""
    assert num_hashes % num_bands == 0
    sig_dir = scratch_dir("minhash_sigs")
    pairs = _minhash_band_pairs(
        ds, text_col, id_col, num_hashes, num_bands, shingle_k, seed,
        bucket_cap, sig_dir=sig_dir, num_join_buckets=num_join_buckets,
    )

    def verify(group: pa.Table, lookup) -> pa.Table:
        a = group.column("id_a").to_numpy(zero_copy_only=False)
        b = group.column("id_b").to_numpy(zero_copy_only=False)
        a, b = _dedup_pair_arrays(a, b)
        side = lookup(np.concatenate([a, b]))
        sid = side.column(id_col).to_numpy(zero_copy_only=False)
        order = np.argsort(sid)
        sid = sid[order]
        sig = _sig_matrix(side.column("signature"), num_hashes)[order]
        est = (sig[np.searchsorted(sid, a)]
               == sig[np.searchsorted(sid, b)]).mean(axis=1)
        m = est >= threshold
        return _collapse_local(a[m], b[m])

    verified = attach_bucketed(
        pairs, sig_dir, num_join_buckets, id_col, ["signature"], verify
    )
    return _finish_dedup(ds, verified, id_col, "minhash")


def ngram_jaccard_dedup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 128,
    num_bands: int = 32,
    threshold: float = 0.8,
    shingle_k: int = 3,
    seed: int = 1234,
    num_join_buckets: int = 16,
    bucket_cap: int = 256,
) -> ray.data.Dataset:
    """Near-dup removal with EXACT n-gram Jaccard verification: MinHash
    LSH generates candidates exactly as ``minhash_lsh_dedup``, but each
    pair is verified by recomputing the distinct word-k-gram sets from
    the TEXTS (joined distributedly from an id-bucketed text store) and
    comparing |A∩B| / |A∪B| >= threshold — no estimator error.

    Cost note vs the estimate variant: the text store is a bucketed
    corpus copy and each verification task re-tokenizes its pair texts,
    so at 100 TB prefer ``minhash_lsh_dedup`` (estimate std with 128
    hashes is ~0.035) unless exactness at the threshold matters."""
    assert num_hashes % num_bands == 0
    pairs = _minhash_band_pairs(
        ds, text_col, id_col, num_hashes, num_bands, shingle_k, seed,
        bucket_cap,
    ).materialize()
    # candidates materialized (one fused pass) so the no-dup case can
    # skip the text store entirely — a full corpus copy, the expensive
    # part of the exact-verification variant
    if pairs.count() == 0:
        return ds
    text_dir = scratch_dir("jaccard_texts")
    write_bucketed(
        ds.map_batches(
            lambda b: b.select([id_col, text_col]), batch_format="pyarrow"
        ),
        id_col, text_dir, num_join_buckets,
    )
    cache = _TokenHashCache(md5_hash32)

    def gram_sets(texts: list[str]) -> list[np.ndarray]:
        flat, off = _flat_tokens(texts)
        h = cache.hash_all(flat)
        grams, goff = gram_fold(h, np.diff(off), off, shingle_k)
        return [np.unique(grams[goff[i]:goff[i + 1]])
                for i in range(len(texts))]

    def verify(group: pa.Table, lookup) -> pa.Table:
        a = group.column("id_a").to_numpy(zero_copy_only=False)
        b = group.column("id_b").to_numpy(zero_copy_only=False)
        a, b = _dedup_pair_arrays(a, b)
        side = lookup(np.concatenate([a, b]))
        sid = side.column(id_col).to_numpy(zero_copy_only=False)
        sets = gram_sets(side.column(text_col).to_pylist())
        by_id = dict(zip(sid.tolist(), sets))
        keep = np.zeros(len(a), dtype=bool)
        for i in range(len(a)):
            ga, gb = by_id[int(a[i])], by_id[int(b[i])]
            inter = np.intersect1d(ga, gb, assume_unique=True).size
            union = ga.size + gb.size - inter
            keep[i] = union > 0 and inter / union >= threshold
        return _collapse_local(a[keep], b[keep])

    verified = attach_bucketed(
        pairs, text_dir, num_join_buckets, id_col, [text_col], verify
    )
    return _finish_dedup(ds, verified, id_col, "jaccard")


# -------------------------------------------------------------- simhash ----

class SimHasher:
    """64-bit SimHash over md5-derived word hashes, weighted by term
    frequency; vectorized per batch (bit matrix + np.add.reduceat at doc
    boundaries).  Hash choice is SQL-replicable for the DuckDB oracle."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.cache = _TokenHashCache(md5_hash64)

    def fingerprints(self, texts: list[str]) -> np.ndarray:
        flat, offsets = _flat_tokens(texts)
        h = self.cache.hash_all(flat)
        shifts = np.arange(64, dtype=np.uint64)
        bits = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int8)
        contrib = (2 * bits - 1).astype(np.int64)
        n = len(texts)
        votes = np.zeros((n, 64), dtype=np.int64)
        nonempty = np.flatnonzero(np.diff(offsets) > 0)
        if len(h):
            # reduceat at the starts of non-empty docs: the segment between
            # consecutive non-empty starts is exactly one doc's tokens
            # (empty docs contribute no rows in between)
            summed = np.add.reduceat(contrib, offsets[:-1][nonempty], axis=0)
            votes[nonempty] = summed
        fp_bits = (votes > 0).astype(np.uint64)
        weights = np.uint64(1) << shifts
        return (fp_bits * weights[None, :]).sum(axis=1, dtype=np.uint64)

    @staticmethod
    def simhash(text: str) -> int:
        return int(SimHasher().fingerprints([text])[0])

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = self.fingerprints(batch.column(self.text_col).to_pylist())
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "simhash": pa.array(fps, type=pa.uint64()),
            }
        )


def simhash_dedup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bucket_cap: int = 256,
) -> ray.data.Dataset:
    """Near-dup removal via SimHash: 4x16-bit band shuffle (any pair
    within Hamming distance <= 3 agrees on at least one band), vectorized
    in-bucket Hamming verify, distributed components, min-id survivor."""
    sigs = ds.map_batches(
        stage_task_fn(SimHasher, text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
    )

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        fps = batch.column("simhash").to_numpy(zero_copy_only=False)
        bands = np.arange(4, dtype=np.uint64)
        vals = (fps[:, None] >> (np.uint64(16) * bands[None, :])) & np.uint64(0xFFFF)
        keys = (bands[None, :] << np.uint64(16)) | vals
        return pa.table(
            {
                "band_key": pa.array(keys.reshape(-1)),
                id_col: pa.array(np.repeat(ids, 4), type=pa.int64()),
                "simhash": pa.array(np.repeat(fps, 4)),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        fps = group.column("simhash").to_numpy(zero_copy_only=False)
        ids, first = np.unique(ids, return_index=True)
        fps = fps[first]
        empty = pa.table(
            {"id_a": pa.array([], type=pa.int64()),
             "id_b": pa.array([], type=pa.int64())}
        )
        if len(ids) < 2:
            return empty
        a_idx, b_idx = _pairs_from_ids(np.arange(len(ids)), bucket_cap)
        ham = popcount64(fps[a_idx] ^ fps[b_idx])
        m = ham <= max_hamming
        if not m.any():
            return empty
        return _collapse_local(ids[a_idx[m]].astype(np.int64),
                               ids[b_idx[m]].astype(np.int64))

    verified = (
        sigs.map_batches(explode, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    return _finish_dedup(ds, verified, id_col, "simhash")


# ------------------------------------------------- embedding near-dup ----

def hyperplanes(dim: int, num_planes: int, seed: int) -> np.ndarray:
    """The (dim, num_planes) random hyperplane matrix — shared with the
    SQL oracle, which inlines the same seeded values as literals."""
    return np.random.default_rng(seed).standard_normal((dim, num_planes))


def _unit_matrix(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = len(col[0]) if len(col) else 1
    return col.flatten().to_numpy(zero_copy_only=False).reshape(-1, d)


class UnitVectors:
    """Normalization stage: (id, unit) rows; zero vectors stay zero."""

    def __init__(self, vec_col: str = "embedding", id_col: str = "vec_id"):
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .similarity import vec_matrix

        vecs = vec_matrix(batch.column(self.vec_col))
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        unit = vecs / np.where(norms == 0, 1.0, norms)
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "unit": pa.FixedSizeListArray.from_arrays(
                    pa.array(unit.reshape(-1), type=pa.float64()),
                    unit.shape[1],
                ),
            }
        )


class HyperplaneBands:
    """Random-hyperplane LSH band stage over unit vectors; the plane
    matrix is drawn lazily (seeded, so identical across workers) and
    cached per worker process."""

    def __init__(self, id_col: str = "vec_id", num_planes: int = 16,
                 num_bands: int = 4, seed: int = 99):
        self.id_col = id_col
        self.num_planes = num_planes
        self.num_bands = num_bands
        self.seed = seed
        self.planes: np.ndarray | None = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        unit = _unit_matrix(batch.column("unit"))
        if self.planes is None:
            self.planes = hyperplanes(unit.shape[1], self.num_planes,
                                      self.seed)
        ppb = self.num_planes // self.num_bands
        bits = (unit @ self.planes) > 0
        pows = 1 << np.arange(ppb, dtype=np.int64)
        keys = np.empty((len(unit), self.num_bands), dtype=np.int64)
        for b in range(self.num_bands):
            chunk = bits[:, b * ppb:(b + 1) * ppb]
            keys[:, b] = (b << ppb) + chunk @ pows
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "band_key": pa.array(keys.reshape(-1)),
                self.id_col: pa.array(np.repeat(ids, self.num_bands),
                                      type=pa.int64()),
            }
        )


def embedding_dedup(
    ds: ray.data.Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.97,
    num_planes: int = 16,
    num_bands: int = 4,
    seed: int = 99,
    num_join_buckets: int = 16,
    bucket_cap: int = 512,
) -> ray.data.Dataset:
    """Cosine near-dup removal: ONE fused map stage normalizes vectors,
    writes the id-bucketed unit-vector store, and emits the
    random-hyperplane band rows — the band shuffle carries
    (band_key, id) only; candidate pairs verify exact cosine by
    re-reading the bucketed vectors in-task (the band groupby barrier
    guarantees the store is complete first); distributed components pick
    survivors.

    Sizing: pick ``num_planes`` so a band's value space
    2^(num_planes/num_bands) is much larger than n/num_bands, or buckets
    exceed ``bucket_cap`` and the anchor-star fallback costs recall —
    e.g. 64 planes / 4 bands (16-bit bands) for ~10^5-10^9 vectors.  The
    driver-contract default stays 16/4 to match the inlined SQL oracle."""
    unit_dir = scratch_dir("embdedup_units")
    ufn = stage_task_fn(UnitVectors, vec_col=vec_col, id_col=id_col)
    bfn = stage_task_fn(HyperplaneBands, id_col=id_col,
                        num_planes=num_planes, num_bands=num_bands,
                        seed=seed)

    def unit_and_bands(batch: pa.Table) -> pa.Table:
        utbl = ufn(batch)
        _write_store_batch(utbl, unit_dir, id_col, num_join_buckets)
        return bfn(utbl)

    pairs = (
        ds.map_batches(unit_and_bands, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(_bucket_pairs_factory(id_col, bucket_cap),
                    batch_format="pyarrow")
    )

    def verify(group: pa.Table, lookup) -> pa.Table:
        a = group.column("id_a").to_numpy(zero_copy_only=False)
        b = group.column("id_b").to_numpy(zero_copy_only=False)
        a, b = _dedup_pair_arrays(a, b)
        side = lookup(np.concatenate([a, b]))
        sid = side.column(id_col).to_numpy(zero_copy_only=False)
        order = np.argsort(sid)
        sid = sid[order]
        unit = _unit_matrix(side.column("unit"))[order]
        cos = (unit[np.searchsorted(sid, a)]
               * unit[np.searchsorted(sid, b)]).sum(axis=1)
        m = cos >= threshold
        return _collapse_local(a[m], b[m])

    verified = attach_bucketed(
        pairs, unit_dir, num_join_buckets, id_col, ["unit"], verify
    )
    return _finish_dedup(ds, verified, id_col, "embdedup")
