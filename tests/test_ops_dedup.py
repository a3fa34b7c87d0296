"""Dedup operators over corpora with planted exact and near duplicates."""

import numpy as np
import pyarrow as pa
import pytest


def _docs_table():
    """12 docs: 0/1/2 exact dups; 3/4 near dups (one word changed);
    5..9 distinct; 10/11 near dups of each other."""
    base = ("the quick brown fox jumps over the lazy dog while the cat "
            "sleeps on the warm windowsill in the afternoon sun light")
    pair = ("compilers parse tokens into syntax trees then lower them to "
            "intermediate representation before emitting machine code")
    texts = [
        base,                                    # 0
        base,                                    # 1  exact dup of 0
        base,                                    # 2  exact dup of 0
        pair,                                    # 3
        pair.replace("machine", "native"),       # 4  near dup of 3
        "completely different content about database internals and btree "
        "pages with write ahead logging for crash recovery semantics",
        "rust borrow checker ownership lifetimes move semantics zero cost",
        "python generators coroutines asyncio event loop scheduling tasks",
        "linear algebra matrix decomposition eigenvalues singular values",
        "distributed consensus raft leader election log replication terms",
        "streaming data pipelines watermark windowing state checkpoints "
        "exactly once processing guarantees with idempotent sinks retry",
        "streaming data pipelines watermark windowing state checkpoints "
        "exactly once processing guarantees with idempotent sinks replay",
    ]
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
        }
    )


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data

    return ray.data.from_arrow(_docs_table()).repartition(3)


class TestExactDedup:
    def test_keeps_min_id_per_group(self, docs_ds):
        from searchengine_ray.ops.dedup import exact_dedup

        out = sorted(r["doc_id"] for r in exact_dedup(docs_ds).take_all())
        assert out == [0, 3, 4, 5, 6, 7, 8, 9, 10, 11]


class TestMinHash:
    def test_near_dups_removed(self, docs_ds):
        from searchengine_ray.ops.dedup import minhash_lsh_dedup

        out = sorted(
            r["doc_id"]
            for r in minhash_lsh_dedup(docs_ds, threshold=0.5).take_all()
        )
        assert 0 in out and 1 not in out and 2 not in out
        assert 3 in out and 4 not in out      # near pair keeps min id
        assert 10 in out and 11 not in out
        assert {5, 6, 7, 8, 9} <= set(out)    # distinct docs survive

    def test_jaccard_verifier(self):
        from searchengine_ray.ops.dedup import ngram_jaccard

        assert ngram_jaccard("a b c d e", "a b c d e") == 1.0
        assert ngram_jaccard("a b c d e", "v w x y z") == 0.0
        mid = ngram_jaccard("a b c d e f g h", "a b c d e f g z")
        assert 0.0 < mid < 1.0

    def test_signature_deterministic_across_actors(self):
        from searchengine_ray.ops.dedup import MinHasher

        a = MinHasher().signature("hello world foo bar baz")
        b = MinHasher().signature("hello world foo bar baz")
        assert np.array_equal(a, b)

    def test_store_batch_write_is_retry_idempotent(self, tmp_path):
        """A retried map task re-writes its batch's store files under the
        same min-id-derived names — re-running must not duplicate rows."""
        import pyarrow as pa
        import pyarrow.dataset as pads

        from searchengine_ray.ops.dedup import _write_store_batch

        tbl = pa.table(
            {
                "doc_id": pa.array([3, 17, 42, 5], type=pa.int64()),
                "payload": pa.array([1.0, 2.0, 3.0, 4.0]),
            }
        )
        d = str(tmp_path / "store")
        _write_store_batch(tbl, d, "doc_id", num_buckets=4)
        _write_store_batch(tbl, d, "doc_id", num_buckets=4)  # the retry
        got = pads.dataset(d, format="parquet").to_table()
        assert got.num_rows == 4
        assert sorted(got.column("doc_id").to_pylist()) == [3, 5, 17, 42]


class TestNgramJaccardDedup:
    def test_exact_verification_removes_near_dups(self, docs_ds):
        from searchengine_ray.ops.dedup import ngram_jaccard_dedup

        out = sorted(
            r["doc_id"]
            for r in ngram_jaccard_dedup(docs_ds, threshold=0.5).take_all()
        )
        assert 0 in out and 1 not in out and 2 not in out
        assert 3 in out and 4 not in out
        assert 10 in out and 11 not in out
        assert {5, 6, 7, 8, 9} <= set(out)

    def test_exact_rejects_below_threshold(self, ray_session):
        """A pair that the LSH proposes but whose true Jaccard is below
        the threshold must survive (exact verification, no estimator)."""
        import pyarrow as pa
        import ray.data

        from searchengine_ray.ops.dedup import ngram_jaccard_dedup

        base = "alpha beta gamma delta epsilon zeta eta theta"
        half = "alpha beta gamma delta other words entirely changed"
        tbl = pa.table(
            {
                "doc_id": pa.array([0, 1], type=pa.int64()),
                "text": pa.array([base, half]),
            }
        )
        out = sorted(
            r["doc_id"]
            for r in ngram_jaccard_dedup(
                ray.data.from_arrow(tbl), threshold=0.9
            ).take_all()
        )
        assert out == [0, 1]


class TestSimHash:
    def test_exact_and_near_dups_removed(self, docs_ds):
        from searchengine_ray.ops.dedup import simhash_dedup

        out = sorted(
            r["doc_id"]
            for r in simhash_dedup(docs_ds, max_hamming=6).take_all()
        )
        assert 0 in out and 1 not in out and 2 not in out
        assert {5, 6, 7, 8, 9} <= set(out)

    def test_simhash_similarity_property(self):
        from searchengine_ray.ops.dedup import SimHasher

        a = SimHasher.simhash("one two three four five six seven eight")
        b = SimHasher.simhash("one two three four five six seven nine")
        c = SimHasher.simhash("totally unrelated words appear here now")
        d_ab = bin(a ^ b).count("1")
        d_ac = bin(a ^ c).count("1")
        assert d_ab < d_ac


class TestMinHashScale:
    """VERDICT r1 #2 'done' criterion: >=100k synthetic docs with planted
    dupes, no driver-side pair list anywhere in the implementation."""

    def test_100k_planted_dups(self, ray_session):
        import ray.data

        from searchengine_ray.ops.dedup import minhash_lsh_dedup

        rng = np.random.default_rng(123)
        vocab = np.array([f"w{i:04d}" for i in range(2000)])
        n_base, n_dup = 100_000, 1_000
        words = vocab[rng.integers(0, len(vocab), size=(n_base, 30))]
        base_texts = [" ".join(row) for row in words]
        # planted dups: doc n_base+j duplicates base doc j (even j exact,
        # odd j with one word swapped -> sig estimate stays >= ~0.8)
        dup_texts = []
        for j in range(n_dup):
            if j % 2 == 0:
                dup_texts.append(base_texts[j])
            else:
                w = words[j].copy()
                w[5] = "zzchanged"
                dup_texts.append(" ".join(w))
        tbl = pa.table(
            {
                "doc_id": pa.array(range(n_base + n_dup), type=pa.int64()),
                "text": pa.array(base_texts + dup_texts),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(16)
        out = minhash_lsh_dedup(ds, threshold=0.5)
        kept = set()
        for b in out.select_columns(["doc_id"]).iter_batches(
            batch_format="pyarrow"
        ):
            kept.update(b.column("doc_id").to_pylist())
        dup_ids = set(range(n_base, n_base + n_dup))
        # every planted dup must be dropped, its base doc kept
        assert not (kept & dup_ids), sorted(kept & dup_ids)[:10]
        assert set(range(n_dup)) <= kept
        # distinct random docs essentially all survive (allow a handful of
        # chance near-dup collisions in 100k random draws)
        assert len(kept) >= n_base - 10

    def test_mega_bucket_cap_star_fallback(self, ray_session):
        """A degenerate bucket (300 identical docs) wider than bucket_cap
        must still dedup to the single min id via the anchor star."""
        import ray.data

        from searchengine_ray.ops.dedup import minhash_lsh_dedup

        n = 300
        tbl = pa.table(
            {
                "doc_id": pa.array(range(n), type=pa.int64()),
                "text": pa.array(["same exact boilerplate text here"] * n),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(4)
        out = sorted(
            r["doc_id"]
            for r in minhash_lsh_dedup(ds, threshold=0.8,
                                       bucket_cap=50).take_all()
        )
        assert out == [0]

    def test_empty_docs_dedup_together(self, ray_session):
        import ray.data

        from searchengine_ray.ops.dedup import minhash_lsh_dedup

        tbl = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
                "text": pa.array(["", "", "real content words here", "   "]),
            }
        )
        out = sorted(
            r["doc_id"]
            for r in minhash_lsh_dedup(
                ray.data.from_arrow(tbl), threshold=0.8
            ).take_all()
        )
        assert out == [0, 2]


class TestSimHashScale:
    def test_100k_planted_exact_dups(self, ray_session):
        """VERDICT r1 #8 'done' criterion: large-scale simhash pytest,
        no driver-side pair list."""
        import ray.data

        from searchengine_ray.ops.dedup import simhash_dedup

        rng = np.random.default_rng(77)
        vocab = np.array([f"w{i:04d}" for i in range(2000)])
        n_base, n_dup = 100_000, 1_000
        words = vocab[rng.integers(0, len(vocab), size=(n_base, 30))]
        base_texts = [" ".join(row) for row in words]
        dup_texts = [base_texts[j] for j in range(n_dup)]  # exact copies
        tbl = pa.table(
            {
                "doc_id": pa.array(range(n_base + n_dup), type=pa.int64()),
                "text": pa.array(base_texts + dup_texts),
            }
        )
        out = simhash_dedup(
            ray.data.from_arrow(tbl).repartition(16), max_hamming=3
        )
        kept = set()
        for b in out.select_columns(["doc_id"]).iter_batches(
            batch_format="pyarrow"
        ):
            kept.update(b.column("doc_id").to_pylist())
        dup_ids = set(range(n_base, n_base + n_dup))
        assert not (kept & dup_ids), sorted(kept & dup_ids)[:10]
        assert set(range(n_dup)) <= kept
        # 64-bit fingerprints of distinct random docs essentially never
        # fall within Hamming 3; allow a handful of chance collisions
        assert len(kept) >= n_base - 10


class TestEmbeddingScale:
    def test_30k_planted_dups(self, ray_session):
        import ray.data

        from searchengine_ray.ops.dedup import embedding_dedup

        rng = np.random.default_rng(9)
        n_base, n_dup, d = 30_000, 500, 32
        base = rng.standard_normal((n_base, d))
        dups = base[:n_dup] + 1e-4 * rng.standard_normal((n_dup, d))
        vecs = np.concatenate([base, dups])
        tbl = pa.table(
            {
                "vec_id": pa.array(range(n_base + n_dup), type=pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], type=pa.list_(pa.float32())
                ),
            }
        )
        # num_planes must scale with the corpus: 2^(planes/bands) band
        # values >> n/bands keeps buckets under bucket_cap (the default
        # 16 planes = 4-bit bands is a toy setting; 64 planes = 16-bit
        # bands holds ~65k values per band)
        out = embedding_dedup(
            ray.data.from_arrow(tbl).repartition(16), threshold=0.99,
            num_planes=64, num_bands=4,
        )
        kept = set()
        for b in out.select_columns(["vec_id"]).iter_batches(
            batch_format="pyarrow"
        ):
            kept.update(b.column("vec_id").to_pylist())
        dup_ids = set(range(n_base, n_base + n_dup))
        assert not (kept & dup_ids), sorted(kept & dup_ids)[:10]
        # random gaussian vectors in 32-d are essentially never cosine
        # >= 0.99 of each other
        assert len(kept) >= n_base - 5


class TestEmbeddingDedup:
    def test_near_identical_vectors_removed(self, ray_session):
        import ray.data

        from searchengine_ray.ops.dedup import embedding_dedup

        rng = np.random.default_rng(5)
        base = rng.standard_normal((8, 16))
        vecs = list(base) + [base[0] + 1e-4 * rng.standard_normal(16)]
        tbl = pa.table(
            {
                "vec_id": pa.array(range(9), type=pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], type=pa.list_(pa.float32())
                ),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(2)
        out = sorted(
            r["vec_id"]
            for r in embedding_dedup(ds, threshold=0.99).take_all()
        )
        assert out == list(range(8))  # vec 8 (dup of 0) removed


class TestCuration:
    def test_composed_pipeline(self, ray_session):
        """quality gate -> language gate -> exact dedup -> near-dup dedup
        as one streaming composition."""
        import ray.data

        from searchengine_ray.ops.curate import curate_corpus

        texts = [
            # passes everything
            "the quick brown fox jumps over the lazy dog and it runs on "
            "through the field for a while as the sun sets in the west "
            "and the birds come home to rest for the long quiet night",
            # exact duplicate of 0 -> dropped by exact dedup
            "the quick brown fox jumps over the lazy dog and it runs on "
            "through the field for a while as the sun sets in the west "
            "and the birds come home to rest for the long quiet night",
            # too short -> dropped by quality gate
            "tiny",
            # Spanish -> dropped by language gate (languages=('en',))
            "el perro corre por la casa y el gato duerme en una silla "
            "mientras los vecinos hablan en el patio con una taza de "
            "un buen cafe por la tarde como casi todos los dias del mes",
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts),
            }
        )
        out = sorted(
            r["doc_id"]
            for r in curate_corpus(
                ray.data.from_arrow(tbl).repartition(2)
            ).select_columns(["doc_id"]).take_all()
        )
        assert out == [0]

    def test_gates_optional(self, ray_session):
        import ray.data

        from searchengine_ray.ops.curate import curate_corpus

        tbl = pa.table(
            {
                "doc_id": pa.array([0, 1], type=pa.int64()),
                "text": pa.array(["corto", "otro texto"]),
            }
        )
        out = sorted(
            r["doc_id"]
            for r in curate_corpus(
                ray.data.from_arrow(tbl), min_quality=0.0,
                languages=None, near_dup_threshold=None,
            ).select_columns(["doc_id"]).take_all()
        )
        assert out == [0, 1]
