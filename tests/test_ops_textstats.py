"""Text-analysis operators: token counting, quality, language ID,
fingerprints."""

import hashlib

import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def text_ds(ray_session):
    import ray.data

    texts = [
        "the quick brown fox is in the park and it is sunny",       # en
        "el perro y el gato se fueron a la casa de la abuela",      # es
        "le chat est dans la maison avec les enfants et le chien",  # fr
        "der hund und die katze sind in dem haus mit der maus",     # de
        "",                                                          # empty
        "xyzzy plugh qwerty",                                        # und
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
        }
    )
    return ray.data.from_arrow(tbl), texts


class TestTokenCounts:
    def test_ws_and_bpe(self, text_ds):
        from searchengine_ray.ops.textstats import token_counts

        ds, texts = text_ds
        rows = {r["doc_id"]: r for r in token_counts(ds).take_all()}
        for i, t in enumerate(texts):
            assert rows[i]["ws_tokens"] == len(t.split())
        assert rows[4]["ws_tokens"] == 0 and rows[4]["bpe_tokens"] == 0
        # BPE-ish splitter counts punctuation runs separately
        from searchengine_ray.ops.textstats import _BPE_RE

        assert len(_BPE_RE.findall("don't stop!")) == 4  # don 't stop !


class TestQuality:
    def test_signal_ranges_and_ordering(self, text_ds):
        from searchengine_ray.ops.textstats import quality_scores

        ds, texts = text_ds
        rows = {r["doc_id"]: r for r in quality_scores(ds).take_all()}
        for i in range(len(texts)):
            assert 0.0 <= rows[i]["quality_score"] <= 1.0
            assert rows[i]["n_chars"] == len(texts[i])
        # stopword-rich English text scores above gibberish
        assert rows[0]["quality_score"] > rows[5]["quality_score"]
        assert rows[4]["n_tokens"] == 0


class TestLanguage:
    def test_profiles(self, text_ds):
        from searchengine_ray.ops.textstats import detect_language

        ds, _ = text_ds
        rows = {r["doc_id"]: r for r in detect_language(ds).take_all()}
        assert rows[0]["detected_lang"] == "en"
        assert rows[1]["detected_lang"] == "es"
        assert rows[2]["detected_lang"] == "fr"
        assert rows[3]["detected_lang"] == "de"
        assert rows[4]["detected_lang"] == "und"
        assert rows[5]["detected_lang"] == "und"


class TestFingerprints:
    def test_md5_and_rolling(self, text_ds):
        from searchengine_ray.ops.textstats import fingerprints

        ds, texts = text_ds
        rows = {r["doc_id"]: r for r in fingerprints(ds).take_all()}
        for i, t in enumerate(texts):
            assert rows[i]["content_md5"] == hashlib.md5(t.encode()).hexdigest()

    def test_rolling_robust_to_local_edit(self, ray_session):
        """Winnowing min-hash should often survive a single word edit in a
        long doc (shared windows keep the minimum)."""
        import ray.data

        from searchengine_ray.ops.textstats import fingerprints

        words = [f"w{i}" for i in range(300)]
        a = " ".join(words)
        b_words = list(words)
        b_words[150] = "EDITED"
        b = " ".join(b_words)
        tbl = pa.table(
            {"doc_id": pa.array([0, 1], type=pa.int64()),
             "text": pa.array([a, b])}
        )
        rows = {
            r["doc_id"]: r
            for r in fingerprints(ray.data.from_arrow(tbl)).take_all()
        }
        assert rows[0]["rolling_fingerprint"] == rows[1]["rolling_fingerprint"]
        assert rows[0]["content_md5"] != rows[1]["content_md5"]


class TestLanguageIdRealText:
    """The synthetic corpus's lang column is decorative (all texts are
    English-ish tokens), so real-language validation lives here: the
    stopword heuristic must identify authentic sentences in each
    profiled language."""

    SAMPLES = {
        "en": "the quick brown fox jumps over the lazy dog and it was fine",
        "es": "el perro corre por la casa y el gato duerme en una silla",
        "fr": "le chat est dans la maison et les enfants jouent dans le jardin",
        "de": "der hund läuft durch das haus und die katze schläft auf dem sofa",
        "it": "il cane corre per la casa e non sono sicuro che il gatto dorma",
        "pt": "o cachorro corre pela casa e o gato dorme em uma cadeira",
        "nl": "de hond rent door het huis en de kat slaapt op een stoel",
    }

    def test_detects_each_profiled_language(self, ray_session):
        import pyarrow as pa
        import ray.data

        from searchengine_ray.ops.textstats import detect_language

        langs = sorted(self.SAMPLES)
        tbl = pa.table(
            {
                "doc_id": pa.array(range(len(langs)), type=pa.int64()),
                "text": pa.array([self.SAMPLES[lg] for lg in langs]),
            }
        )
        out = {r["doc_id"]: r["detected_lang"]
               for r in detect_language(
                   ray.data.from_arrow(tbl)).take_all()}
        got = {langs[i]: out[i] for i in range(len(langs))}
        assert got == {lg: lg for lg in langs}, got

    def test_cjk_is_undetermined_by_design(self, ray_session):
        import pyarrow as pa
        import ray.data

        from searchengine_ray.ops.textstats import detect_language

        tbl = pa.table(
            {
                "doc_id": pa.array([0], type=pa.int64()),
                "text": pa.array(["这是一个中文句子没有空格分词"]),
            }
        )
        out = detect_language(ray.data.from_arrow(tbl)).take_all()
        assert out[0]["detected_lang"] == "und"
