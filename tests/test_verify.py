"""Content-integrity verification (verify.py): the per-row sha256
invariant vs the source corpus, as an order-independent multiset
checksum with optional doc_id binding."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest


class TestDigestPrimitives:
    def test_hex_matches_content_digest(self):
        from searchengine_ray.verify import (
            digest64_from_content,
            digest64_from_hex,
        )

        texts = ["", "hello", "μultibyte ✓ content", "x" * 5000]
        arr = pa.array(texts, type=pa.string())
        hexes = pa.array(
            [hashlib.sha256(t.encode()).hexdigest() for t in texts]
        )
        np.testing.assert_array_equal(
            digest64_from_content(arr), digest64_from_hex(hexes)
        )

    def test_hex_vectorization_vs_scalar(self):
        from searchengine_ray.verify import digest64_from_hex

        hexes = [hashlib.sha256(str(i).encode()).hexdigest() for i in range(50)]
        want = np.array(
            [int.from_bytes(bytes.fromhex(h)[:8], "little") for h in hexes],
            dtype=np.uint64,
        )
        np.testing.assert_array_equal(
            digest64_from_hex(pa.array(hexes)), want
        )

    def test_hex_rejects_non_sha_strings(self):
        from searchengine_ray.verify import digest64_from_hex

        with pytest.raises(ValueError):
            digest64_from_hex(pa.array(["abc"]))

    def test_sliced_array_offsets(self):
        from searchengine_ray.verify import digest64_from_content

        arr = pa.array(["aa", "bb", "cc", "dd"])
        full = digest64_from_content(arr)
        np.testing.assert_array_equal(
            digest64_from_content(arr.slice(1, 2)), full[1:3]
        )


class TestChecksum60SqlParity:
    """mix60 / digest60 vs the DuckDB oracle SQL, value for value."""

    SQL = """
        WITH base AS (
          SELECT CAST(concat('0x', substr(sha256(text), 1, 15))
                      AS BIGINT) AS w,
                 CAST((CAST(doc_id AS HUGEINT) * 2654435761)
                      % 1152921504606846976 AS BIGINT) AS a
          FROM docs
        ), m1 AS (
          SELECT w, xor(a, a // 1073741824) AS b FROM base
        ), m2 AS (
          SELECT w, CAST((CAST(b AS HUGEINT) * 2246822519)
                         % 1152921504606846976 AS BIGINT) AS c
          FROM m1
        ), mixed AS (
          SELECT xor(w, xor(c, c // 1073741824)) AS v FROM m2
        )
        SELECT count(*) AS n_docs,
               CAST(sum(CAST(v AS HUGEINT))
                    % 1152921504606846976 AS BIGINT) AS sum60,
               bit_xor(v) AS xor60
        FROM mixed
    """

    def test_parity_on_mixed_texts(self):
        import duckdb

        from searchengine_ray.verify import digest60_hex_prefix, mix60

        texts = ["hello", "", "naïve ✓ mixed", "x" * 999, "zz", "0"]
        ids = np.arange(len(texts), dtype=np.int64) * 13 + 5
        hexes = pa.array(
            [hashlib.sha256(t.encode()).hexdigest() for t in texts]
        )
        v = digest60_hex_prefix(hexes) ^ mix60(ids.astype(np.uint64))
        n = len(v)
        s = int(v.sum(dtype=np.uint64)) % (1 << 60)
        x = int(np.bitwise_xor.reduce(v))

        con = duckdb.connect()
        con.register("docs", pa.table({"doc_id": ids, "text": texts}))
        (got,) = con.sql(self.SQL).fetchall()
        assert got == (n, s, x)

    def test_index_checksum60_matches_source(self, ray_session, built_index,
                                             small_corpus):
        import duckdb

        from searchengine_ray.verify import index_checksum60

        index_dir, _ = built_index
        tbl = index_checksum60(index_dir)
        # the built_index corpus has no doc_id column: re-derive the
        # deterministic assignment the build used for the source side
        import ray.data

        from searchengine_ray.ids import assign_doc_ids

        with_ids = assign_doc_ids(
            ray.data.from_arrow(small_corpus)
        ).select_columns(["doc_id", "content"]).to_pandas()
        con = duckdb.connect()
        con.register(
            "docs",
            pa.table({"doc_id": with_ids["doc_id"].to_numpy(),
                      "text": with_ids["content"].tolist()}),
        )
        (got,) = con.sql(self.SQL).fetchall()
        assert got == (
            tbl.column("n_docs")[0].as_py(),
            tbl.column("sum60")[0].as_py(),
            tbl.column("xor60")[0].as_py(),
        )


class TestVerifyIndex:
    def test_built_index_passes(self, ray_session, built_index, small_corpus):
        import ray.data

        from searchengine_ray.verify import verify_index_content

        index_dir, manifest = built_index
        report = verify_index_content(
            ray.data.from_arrow(small_corpus).repartition(3),
            index_dir,
            check_ids=True,
        )
        assert report["passed"], report
        assert report["source"]["count"] == manifest["num_docs"]

    def test_detects_content_corruption(self, ray_session, small_corpus):
        import ray.data

        from searchengine_ray.verify import corpus_checksum

        base = corpus_checksum(ray.data.from_arrow(small_corpus))
        contents = small_corpus.column("content").to_pylist()
        contents[7] = contents[7] + " tampered"
        bad = small_corpus.set_column(
            small_corpus.schema.get_field_index("content"),
            "content",
            pa.array(contents),
        )
        tampered = corpus_checksum(ray.data.from_arrow(bad))
        assert tampered["count"] == base["count"]
        assert tampered != base

    def test_id_binding_detects_swapped_contents(self, ray_session):
        """Two rows with exchanged contents: the content multiset is
        identical, only the id-bound checksum may catch it."""
        import ray.data

        from searchengine_ray.verify import corpus_checksum

        tbl = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                "content": pa.array(["alpha", "beta", "gamma"]),
            }
        )
        swapped = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                "content": pa.array(["beta", "alpha", "gamma"]),
            }
        )
        a = corpus_checksum(ray.data.from_arrow(tbl))
        b = corpus_checksum(ray.data.from_arrow(swapped))
        assert a == b  # content-only view cannot tell them apart
        a_id = corpus_checksum(ray.data.from_arrow(tbl), id_col="doc_id")
        b_id = corpus_checksum(ray.data.from_arrow(swapped), id_col="doc_id")
        assert a_id != b_id
