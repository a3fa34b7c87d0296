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

    # Real-text CJK samples (public-domain sentence fragments): Japanese
    # mixes kanji with kana, Chinese is pure han, Korean is hangul.
    CJK_SAMPLES = {
        "ja": "吾輩は猫である。名前はまだ無い。どこで生れたか見当がつかぬ。",
        "zh": "这是一个中文句子没有空格分词，包含很多汉字的例子。",
        "ko": "나는 한국어를 공부하고 있습니다. 서울은 대한민국의 수도입니다.",
    }

    def test_detects_cjk_languages(self, ray_session):
        import pyarrow as pa
        import ray.data

        from searchengine_ray.ops.textstats import detect_language

        langs = sorted(self.CJK_SAMPLES)
        tbl = pa.table(
            {
                "doc_id": pa.array(range(len(langs)), type=pa.int64()),
                "text": pa.array([self.CJK_SAMPLES[lg] for lg in langs]),
            }
        )
        out = {r["doc_id"]: r for r in
               detect_language(ray.data.from_arrow(tbl)).take_all()}
        got = {langs[i]: out[i]["detected_lang"] for i in range(len(langs))}
        assert got == {lg: lg for lg in langs}, got
        # CJK confidences are script-char ratios — high for pure-script text
        assert all(out[i]["lang_confidence"] > 0.5 for i in range(len(langs)))

    def test_kana_beats_han_for_japanese(self, ray_session):
        """Japanese text is mostly kanji by character count in some
        registers; the kana-first decision must still call it ja."""
        from searchengine_ray.ops.textstats import detect_langs

        langs, confs = detect_langs(["日本経済新聞の記事です"])  # 2 kana, 9 kanji
        assert langs == ["ja"]

    def test_cjk_oracle_parity(self, ray_session):
        """detect_langs and the DuckDB oracle agree on mixed CJK + latin
        + edge-case docs (threshold boundaries, empty, digits-only)."""
        import duckdb
        import pyarrow as pa

        from searchengine_ray import oracles
        from searchengine_ray.ops.textstats import detect_langs

        texts = (
            list(self.CJK_SAMPLES.values())
            + list(self.SAMPLES.values())
            + ["", "12345 #### !!!",
               "mostly english text の with one kana char here and there",
               "カタカナだけのテキスト",
               "안녕하세요", "漢字"]
        )
        py_langs, py_confs = detect_langs(texts)
        tbl = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                        "text": pa.array(texts)})
        con = duckdb.connect()
        con.register("documents", tbl)
        rows = con.execute(oracles.detect_language_sql()).fetchall()
        for i, (doc_id, sql_lang, sql_conf) in enumerate(rows):
            assert sql_lang == py_langs[i], (i, texts[i], sql_lang, py_langs[i])
            assert abs(float(sql_conf) - round(py_confs[i], 6)) < 1e-9


class TestLangIdBackends:
    """Feature-flagged langdetect adapter (VERDICT r3 #10): the package
    is absent in this container, so the tests cover the flag plumbing —
    missing-package error, fake-module dispatch, heuristic default."""

    def test_absent_backend_raises_clear_importerror(self):
        import pytest as _pytest

        from searchengine_ray.ops.textstats import detect_langs

        with _pytest.raises(ImportError, match="langdetect"):
            detect_langs(["hello world"], backend="langdetect")

    def test_unknown_backend_rejected(self):
        import pytest as _pytest

        from searchengine_ray.ops.textstats import detect_langs

        with _pytest.raises(ValueError, match="unknown"):
            detect_langs(["x"], backend="nope")

    def test_env_default_is_heuristic(self, monkeypatch):
        from searchengine_ray.ops.textstats import detect_langs

        monkeypatch.delenv("SE_RAY_LANGID_BACKEND", raising=False)
        langs, _ = detect_langs(["the cat sat on the mat and it was good"])
        assert langs == ["en"]

    def test_fake_langdetect_module_dispatch(self, monkeypatch):
        """A stub langdetect in sys.modules is picked up by both the
        explicit arg and the env var (the adapter's real seam)."""
        import sys
        import types

        from searchengine_ray.ops import textstats

        class _Best:
            lang, prob = "xx", 0.75

        class _Exc(Exception):
            pass

        fake = types.ModuleType("langdetect")
        fake.DetectorFactory = types.SimpleNamespace(seed=None)
        fake.detect_langs = lambda t: ([_Best()] if t.strip() else
                                       (_ for _ in ()).throw(_Exc()))
        fake.lang_detect_exception = types.SimpleNamespace(
            LangDetectException=_Exc)
        monkeypatch.setitem(sys.modules, "langdetect", fake)

        langs, confs = textstats.detect_langs(
            ["hola", ""], backend="langdetect")
        assert langs == ["xx", "und"]
        assert confs == [0.75, 0.0]
        assert fake.DetectorFactory.seed == 0  # pinned for determinism

        monkeypatch.setenv("SE_RAY_LANGID_BACKEND", "langdetect")
        langs2, _ = textstats.detect_langs(["hola"])
        assert langs2 == ["xx"]
