"""Deduplication operators for large-scale training-data pipelines.

All operators take/return ``ray.data.Dataset`` and are shuffle-conscious:

- exact:      one hash shuffle on the content digest (groupby), min-id wins
- minhash:    per-batch vectorized shingle->minhash signatures, LSH band
              shuffle to form candidate buckets, in-bucket Jaccard verify,
              driver-side union-find over the (small) surviving pairs
- simhash:    64-bit simhash, 4x16-bit band shuffle, Hamming verify
- embedding:  cosine near-dup via normalized-vector LSH (random hyperplane
              bands) with in-bucket exact cosine verify

Scale notes: every method shuffles only (key, id) pairs or short
signatures — never the document text — so the all-to-all volume is a few
dozen bytes/doc at 100 TB corpus scale.  Union-find runs on candidate
*pairs that passed verification*, which is O(duplicates), not O(corpus);
at extreme scale it would become an iterative label-propagation pass over
a pairs Dataset, documented here as the upgrade path.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_MERSENNE = (1 << 61) - 1


def _text_col(batch: pa.Table, col: str) -> list[str]:
    return batch.column(col).to_pylist()


# ---------------------------------------------------------------- exact ----

def exact_dedup(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Keep the lowest-id row per exact content (sha256) group."""

    def add_digest(batch: pa.Table) -> pa.Table:
        digests = [
            hashlib.sha256(t.encode("utf-8")).hexdigest()
            for t in _text_col(batch, text_col)
        ]
        return batch.append_column("_digest", pa.array(digests))

    def keep_first(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[(id_col, "ascending")])
        return group.take(idx[:1]).drop_columns(["_digest"])

    return (
        ds.map_batches(add_digest, batch_format="pyarrow")
        .groupby("_digest")
        .map_groups(keep_first, batch_format="pyarrow")
    )


# -------------------------------------------------------------- shingles ----

def _char_shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct 64-bit hashes of the text's character k-shingles."""
    t = text.lower()
    if len(t) < k:
        views = [t]
    else:
        views = [t[i:i + k] for i in range(len(t) - k + 1)]
    hs = np.fromiter(
        (int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
         for s in set(views)),
        dtype=np.uint64,
    )
    return hs


def _word_shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    words = text.lower().split()
    if len(words) < k:
        grams = [" ".join(words)] if words else [""]
    else:
        grams = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    return np.fromiter(
        (int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
         for s in set(grams)),
        dtype=np.uint64,
    )

SHINGLERS = {"char": _char_shingle_hashes, "word": _word_shingle_hashes}


def ngram_jaccard(a: str, b: str, shingler: str = "word", k: int = 3) -> float:
    """Exact n-gram Jaccard similarity of two texts (the verifier)."""
    ha = set(SHINGLERS[shingler](a, k).tolist())
    hb = set(SHINGLERS[shingler](b, k).tolist())
    if not ha and not hb:
        return 1.0
    return len(ha & hb) / len(ha | hb)


# -------------------------------------------------------------- minhash ----

class MinHasher:
    """Stateful stage: the (a, b) hash-family coefficients are drawn once
    per actor in __init__ (seeded -> identical across actors)."""

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        num_hashes: int = 128,
        shingler: str = "word",
        shingle_k: int = 3,
        seed: int = 1234,
    ):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_hashes, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_hashes, dtype=np.uint64)
        self.text_col = text_col
        self.id_col = id_col
        self.shingle = SHINGLERS[shingler]
        self.shingle_k = shingle_k
        self.num_hashes = num_hashes

    def signature(self, text: str) -> np.ndarray:
        hs = self.shingle(text, self.shingle_k)
        if hs.size == 0:
            return np.zeros(self.num_hashes, dtype=np.uint64)
        # multiply-shift family: odd multiplier, mod-2^64 wraparound.
        # Vectorizes natively in uint64 (the exact Mersenne modmul needed
        # object-dtype bigints and was ~10x slower); universality is ample
        # for MinHash collision estimates.
        with np.errstate(over="ignore"):
            vals = (self.a[:, None] | np.uint64(1)) * hs[None, :]
            vals += self.b[:, None]
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) for t in _text_col(batch, self.text_col)]
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "signature": pa.array(
                    [s.tolist() for s in sigs], type=pa.list_(pa.uint64())
                ),
            }
        )


def _band_explode_factory(num_bands: int, rows_per_band: int, id_col: str):
    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sigs = batch.column("signature")
        out_band, out_key, out_id = [], [], []
        for i in range(len(batch)):
            sig = np.asarray(sigs[i].as_py(), dtype=np.uint64)
            for b in range(num_bands):
                chunk = sig[b * rows_per_band:(b + 1) * rows_per_band]
                key = hashlib.blake2b(
                    chunk.tobytes() + bytes([b]), digest_size=8
                ).hexdigest()
                out_band.append(b)
                out_key.append(key)
                out_id.append(int(ids[i]))
        return pa.table(
            {
                "band_key": pa.array(out_key),
                id_col: pa.array(out_id, type=pa.int64()),
            }
        )

    return explode


def _bucket_pairs_factory(id_col: str):
    def pairs(group: pa.Table) -> pa.Table:
        ids = sorted(set(group.column(id_col).to_pylist()))
        if len(ids) < 2:
            return pa.table(
                {"id_a": pa.array([], type=pa.int64()),
                 "id_b": pa.array([], type=pa.int64())}
            )
        # candidate pairs within one LSH bucket (buckets are tiny for any
        # sane banding config; a pathological mega-bucket means the band
        # key collided massively and should be re-banded, logged upstream)
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table(
            {"id_a": pa.array(a, type=pa.int64()),
             "id_b": pa.array(b, type=pa.int64())}
        )

    return pairs


class _UnionFind:
    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent.setdefault(p, p)
            x = p
            p = self.parent[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def minhash_lsh_dedup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 128,
    num_bands: int = 32,
    threshold: float = 0.8,
    shingler: str = "word",
    shingle_k: int = 3,
) -> ray.data.Dataset:
    """Near-dup removal: MinHash signatures -> LSH band shuffle -> exact
    Jaccard verify on candidate pairs -> union-find clusters -> keep the
    min id of each cluster.  Returns the surviving rows of ``ds``."""
    assert num_hashes % num_bands == 0
    rows_per_band = num_hashes // num_bands

    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(
            text_col=text_col, id_col=id_col, num_hashes=num_hashes,
            shingler=shingler, shingle_k=shingle_k,
        ),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    candidates = (
        sigs.map_batches(
            _band_explode_factory(num_bands, rows_per_band, id_col),
            batch_format="pyarrow",
        )
        .groupby("band_key")
        .map_groups(_bucket_pairs_factory(id_col), batch_format="pyarrow")
    )
    pair_rows = candidates.take_all()
    pairs = sorted({(r["id_a"], r["id_b"]) for r in pair_rows})

    # verify candidates with exact Jaccard on the original text
    if pairs:
        need = sorted({i for p in pairs for i in p})
        texts = _fetch_texts(ds, need, text_col, id_col)
        uf = _UnionFind()
        for a, b in pairs:
            if ngram_jaccard(texts[a], texts[b], shingler, shingle_k) >= threshold:
                uf.union(a, b)
        drop = {x for x in uf.parent if uf.find(x) != x}
    else:
        drop = set()
    return _drop_ids(ds, drop, id_col)


def _fetch_texts(
    ds: ray.data.Dataset, ids: list[int], text_col: str, id_col: str
) -> dict[int, str]:
    want = set(ids)

    def pick(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column(id_col), pa.array(list(want), type=pa.int64()))
        return batch.filter(mask).select([id_col, text_col])

    rows = ds.map_batches(pick, batch_format="pyarrow").take_all()
    return {r[id_col]: r[text_col] for r in rows}


def _drop_ids(ds: ray.data.Dataset, drop: set, id_col: str) -> ray.data.Dataset:
    if not drop:
        return ds
    drop_arr = pa.array(sorted(drop), type=pa.int64())

    def flt(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.invert(pc.is_in(batch.column(id_col), drop_arr))
        )

    return ds.map_batches(flt, batch_format="pyarrow")


# -------------------------------------------------------------- simhash ----

class SimHasher:
    """64-bit SimHash over word-unigram blake2b hashes, weighted by term
    frequency; stateful stage for symmetry with MinHasher (no RNG state)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    @staticmethod
    def simhash(text: str) -> int:
        words = text.lower().split()
        if not words:
            return 0
        uniq, counts = np.unique(np.asarray(words, dtype=object), return_counts=True)
        hs = np.fromiter(
            (int.from_bytes(
                hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
             for w in uniq),
            dtype=np.uint64, count=uniq.size,
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        votes = ((2 * bits - 1) * counts[:, None]).sum(axis=0)
        out = np.uint64(0)
        for i in range(64):
            if votes[i] > 0:
                out |= np.uint64(1) << np.uint64(i)
        return int(out)

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [self.simhash(t) for t in _text_col(batch, self.text_col)]
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
) -> ray.data.Dataset:
    """Near-dup removal via SimHash: 4x16-bit band shuffle (any pair within
    Hamming distance <= 3 of a 64-bit hash agrees on at least one of 4
    bands), Hamming verify, min-id survivor per cluster."""
    sigs = ds.map_batches(
        SimHasher,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        fps = batch.column("simhash").to_numpy(zero_copy_only=False)
        out_key, out_id, out_fp = [], [], []
        for i in range(len(ids)):
            fp = int(fps[i])
            for b in range(4):
                band = (fp >> (16 * b)) & 0xFFFF
                out_key.append((b << 16) | band)
                out_id.append(int(ids[i]))
                out_fp.append(fp)
        return pa.table(
            {
                "band_key": pa.array(out_key, type=pa.int64()),
                id_col: pa.array(out_id, type=pa.int64()),
                "simhash": pa.array(out_fp, type=pa.uint64()),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_pylist()
        fps = group.column("simhash").to_pylist()
        seen = sorted(set(zip(ids, fps)))
        a_out, b_out = [], []
        for i in range(len(seen)):
            for j in range(i + 1, len(seen)):
                if bin(seen[i][1] ^ seen[j][1]).count("1") <= max_hamming:
                    a_out.append(seen[i][0])
                    b_out.append(seen[j][0])
        return pa.table(
            {"id_a": pa.array(a_out, type=pa.int64()),
             "id_b": pa.array(b_out, type=pa.int64())}
        )

    pair_rows = (
        sigs.map_batches(explode, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .take_all()
    )
    uf = _UnionFind()
    for r in pair_rows:
        uf.union(r["id_a"], r["id_b"])
    drop = {x for x in uf.parent if uf.find(x) != x}
    return _drop_ids(ds, drop, id_col)


# ------------------------------------------------- embedding near-dup ----

def embedding_dedup(
    ds: ray.data.Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.97,
    num_planes: int = 16,
    num_bands: int = 4,
    seed: int = 99,
) -> ray.data.Dataset:
    """Cosine near-dup removal over an embedding column: random-hyperplane
    LSH (num_bands bands of num_planes/num_bands sign bits) -> in-bucket
    exact cosine verify -> min-id survivor."""
    planes_per_band = num_planes // num_bands

    class Project:
        def __init__(self):
            self.planes = None  # lazily sized to the embedding dim

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64)
            if self.planes is None:
                rng = np.random.default_rng(seed)
                self.planes = rng.standard_normal((vecs.shape[1], num_planes))
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            unit = vecs / np.where(norms == 0, 1.0, norms)
            bits = (unit @ self.planes) > 0
            pows = 1 << np.arange(planes_per_band, dtype=np.int64)
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            out_key, out_id, out_vec = [], [], []
            for i in range(len(ids)):
                for b in range(num_bands):
                    chunk = bits[i, b * planes_per_band:(b + 1) * planes_per_band]
                    key = b * (1 << planes_per_band) + int(chunk @ pows)
                    out_key.append(key)
                    out_id.append(int(ids[i]))
                    out_vec.append(unit[i].tolist())
            return pa.table(
                {
                    "band_key": pa.array(out_key, type=pa.int64()),
                    id_col: pa.array(out_id, type=pa.int64()),
                    "unit": pa.array(out_vec, type=pa.list_(pa.float64())),
                }
            )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_pylist()
        vecs = np.asarray(group.column("unit").to_pylist(), dtype=np.float64)
        uniq: dict[int, np.ndarray] = {}
        for i, d in enumerate(ids):
            uniq.setdefault(d, vecs[i])
        keys = sorted(uniq)
        a_out, b_out = [], []
        if len(keys) > 1:
            m = np.stack([uniq[k] for k in keys])
            sims = m @ m.T
            ii, jj = np.triu_indices(len(keys), k=1)
            hit = sims[ii, jj] >= threshold
            for i, j in zip(ii[hit], jj[hit]):
                a_out.append(keys[i])
                b_out.append(keys[j])
        return pa.table(
            {"id_a": pa.array(a_out, type=pa.int64()),
             "id_b": pa.array(b_out, type=pa.int64())}
        )

    pair_rows = (
        ds.map_batches(Project, batch_format="pyarrow", concurrency=(1, 8))
        .groupby("band_key")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .take_all()
    )
    uf = _UnionFind()
    for r in pair_rows:
        uf.union(r["id_a"], r["id_b"])
    drop = {x for x in uf.parent if uf.find(x) != x}
    return _drop_ids(ds, drop, id_col)
