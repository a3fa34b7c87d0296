"""Hypothesis property tests for the pure kernels: VByte codec, minhash
gram folds / signatures / band keys, popcount, local pair collapse, and
the stemmers (no Ray in the loop — these run hundreds of examples)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from searchengine_ray import vbyte
from searchengine_ray.ops.dedup import (
    MinHasher,
    _collapse_local,
    band_keys,
    gram_fold,
    popcount64,
)
from searchengine_ray.porter2 import stem as en_stem
from searchengine_ray.spanish import stem as es_stem

u64s = st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
                max_size=200)


class TestVByteProperties:
    @given(u64s)
    @settings(max_examples=200, deadline=None)
    def test_roundtrip(self, vals):
        arr = np.array(vals, dtype=np.uint64)
        lens = vbyte.encoded_lengths(arr)
        buf = vbyte.encode(arr, lens)
        out = vbyte.decode(buf, count=len(arr) if len(arr) else None)
        assert np.array_equal(out, arr)

    @given(st.lists(st.integers(min_value=128, max_value=(1 << 64) - 1),
                    min_size=1, max_size=50))
    @settings(max_examples=100, deadline=None)
    def test_truncation_raises(self, vals):
        arr = np.array(vals, dtype=np.uint64)
        buf = vbyte.encode(arr, vbyte.encoded_lengths(arr))
        try:
            vbyte.decode(buf[:-1])
        except ValueError:
            pass  # either a clean truncation error...
        else:
            # ...or the stream happened to stay well-formed with one
            # fewer byte - then it must decode to fewer/different values
            assert not np.array_equal(vbyte.decode(buf[:-1]), arr)


class TestMinHashProperties:
    @given(st.lists(st.text(alphabet="abcdef ", min_size=0, max_size=60),
                    min_size=1, max_size=8))
    @settings(max_examples=50, deadline=None)
    def test_signature_batch_equals_single(self, texts):
        mh = MinHasher()
        batch = mh.signatures(texts)
        for i, t in enumerate(texts):
            assert np.array_equal(batch[i], MinHasher().signature(t))

    @given(st.text(alphabet="abcdefgh ", min_size=0, max_size=100))
    @settings(max_examples=100, deadline=None)
    def test_identical_texts_estimate_one(self, t):
        mh = MinHasher()
        sigs = mh.signatures([t, t])
        assert (sigs[0] == sigs[1]).all()
        keys = band_keys(sigs, 32)
        assert (keys[0] == keys[1]).all()

    @given(st.lists(st.integers(min_value=0, max_value=(1 << 32) - 1),
                    min_size=0, max_size=60),
           st.integers(min_value=1, max_value=10))
    @settings(max_examples=100, deadline=None)
    def test_gram_fold_counts(self, hashes, k):
        h = np.array(hashes, dtype=np.uint64)
        lens = np.array([len(h)], dtype=np.int64)
        offsets = np.array([0, len(h)], dtype=np.int64)
        grams, goff = gram_fold(h, lens, offsets, k)
        expected = max(len(h) - k + 1, 1)
        assert goff.tolist() == [0, expected]
        assert (grams < (1 << 32)).all()


class TestPopcountProperty:
    @given(u64s)
    @settings(max_examples=100, deadline=None)
    def test_matches_python_bitcount(self, vals):
        arr = np.array(vals, dtype=np.uint64)
        got = popcount64(arr)
        want = [bin(v).count("1") for v in vals]
        assert got.tolist() == want


class TestCollapseLocalProperty:
    @given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                    max_size=60).map(
                        lambda ps: [(a, b) for a, b in ps if a != b]))
    @settings(max_examples=100, deadline=None)
    def test_preserves_connectivity(self, pairs):
        a = np.array([p[0] for p in pairs], dtype=np.int64)
        b = np.array([p[1] for p in pairs], dtype=np.int64)
        out = _collapse_local(a, b)

        def components(edges, nodes):
            parent = {n: n for n in nodes}

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for x, y in edges:
                rx, ry = find(x), find(y)
                if rx != ry:
                    parent[max(rx, ry)] = min(rx, ry)
            return {n: find(n) for n in nodes}

        nodes = sorted({*a.tolist(), *b.tolist()})
        before = components(pairs, nodes)
        after_edges = list(zip(out.column("id_a").to_pylist(),
                               out.column("id_b").to_pylist()))
        after = components(after_edges, nodes)
        assert before == after


class TestStemmersNeverCrash:
    @given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz'", max_size=30))
    @settings(max_examples=300, deadline=None)
    def test_porter2_total(self, w):
        out = en_stem(w)
        assert isinstance(out, str) and len(out) <= max(len(w), 1) + 1

    @given(st.text(alphabet="abcdefghijklmnopqrstuvwxyzáéíóúüñ", max_size=30))
    @settings(max_examples=300, deadline=None)
    def test_spanish_total(self, w):
        out = es_stem(w)
        assert isinstance(out, str) and len(out) <= len(w) + 1
