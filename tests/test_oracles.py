"""The DuckDB oracle SQL (searchengine_ray/oracles.py) must replay the
Ray pipelines exactly.  The driver enforces this at sf0.01; this suite
guards the oracles in CI at sf0.001 so a pipeline or SQL regression
surfaces before the driver run."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "embeddings"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    return c


@pytest.fixture(scope="module")
def docs(ray_session):
    import ray.data

    return ray.data.read_parquet(f"{SF}/documents.parquet")


def _ids(ds, col="doc_id"):
    return sorted(r[col] for r in ds.select_columns([col]).take_all())


class TestDedupOracles:
    def test_minhash(self, con, docs):
        from searchengine_ray import oracles
        from searchengine_ray.ops.dedup import minhash_lsh_dedup

        got = _ids(minhash_lsh_dedup(docs, threshold=0.8))
        want = sorted(
            con.execute(oracles.minhash_dedup_sql(threshold=0.8))
            .df()["doc_id"]
        )
        assert got == want

    def test_ngram_jaccard(self, con, docs):
        from searchengine_ray import oracles
        from searchengine_ray.ops.dedup import ngram_jaccard_dedup

        got = _ids(ngram_jaccard_dedup(docs, threshold=0.8))
        want = sorted(
            con.execute(
                oracles.minhash_dedup_sql(threshold=0.8, verify="exact")
            ).df()["doc_id"]
        )
        assert got == want

    def test_simhash(self, con, docs):
        from searchengine_ray import oracles
        from searchengine_ray.ops.dedup import simhash_dedup

        got = _ids(simhash_dedup(docs, max_hamming=2))
        want = sorted(
            con.execute(oracles.simhash_dedup_sql(max_hamming=2))
            .df()["doc_id"]
        )
        assert got == want

    def test_embedding(self, con, ray_session):
        import ray.data

        from searchengine_ray import oracles
        from searchengine_ray.ops.dedup import embedding_dedup

        embs = ray.data.read_parquet(f"{SF}/embeddings.parquet")
        got = _ids(embedding_dedup(embs, threshold=0.97), "vec_id")
        want = sorted(
            con.execute(oracles.embedding_dedup_sql(64, threshold=0.97))
            .df()["vec_id"]
        )
        assert got == want


class TestTextstatOracles:
    def test_fingerprints_rolling(self, con, docs):
        from searchengine_ray import oracles
        from searchengine_ray.ops.textstats import fingerprints

        got = {
            r["doc_id"]: (r["content_md5"], r["rolling_fingerprint"])
            for r in fingerprints(docs).take_all()
        }
        want = {
            r.doc_id: (r.content_md5, r.rolling_fingerprint)
            for r in con.execute(oracles.fingerprints_rolling_sql())
            .df().itertuples()
        }
        assert got == want

    def test_detect_language(self, con, docs):
        import numpy as np

        from searchengine_ray import oracles
        from searchengine_ray.ops.textstats import detect_language

        got = {
            r["doc_id"]: (r["detected_lang"],
                          round(r["lang_confidence"], 6))
            for r in detect_language(docs).take_all()
        }
        want = {
            r.doc_id: (r.detected_lang, round(r.lang_confidence, 6))
            for r in con.execute(oracles.detect_language_sql())
            .df().itertuples()
        }
        assert got == want
