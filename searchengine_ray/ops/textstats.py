"""Text-analysis operators: token counting, quality scoring, language ID,
document fingerprinting.  All are stateless, fully vectorized (or
per-actor-compiled) ``map_batches`` stages over the ``documents`` table.
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# BPE-ish word/number/punct splitter (GPT-2-style contractions + word
# classes, public pattern shape): runs of letters, runs of digits, runs of
# other non-space symbols
_BPE_RE = re.compile(r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+")

_PUNCT_RE = re.compile(r"[^\w\s]")

# tiny per-language stopword profiles for the n-gram/stopword language
# heuristic (public common-word lists).  The SQL oracle
# (oracles.detect_language_sql) inlines this same table, so extending a
# profile automatically extends the oracle.
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
           "on", "with", "as", "this", "was", "are", "be", "at", "by", "or"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "las",
           "es", "por", "con", "para", "del", "se", "no", "su", "al", "como"},
    "fr": {"le", "la", "de", "et", "les", "des", "un", "une", "est", "en",
           "que", "qui", "dans", "pour", "pas", "sur", "au", "avec", "ce",
           "il"},
    "de": {"der", "die", "das", "und", "in", "den", "von", "zu", "mit",
           "ist", "des", "im", "ein", "eine", "auf", "als", "auch", "es",
           "an", "nicht"},
    "it": {"il", "di", "che", "e", "la", "per", "un", "una", "non", "sono",
           "con", "del", "gli", "nel", "come", "anche", "ma", "si", "dei",
           "alla"},
    "pt": {"o", "de", "que", "e", "do", "da", "em", "um", "uma", "para",
           "com", "os", "as", "dos", "mais", "como", "mas", "foi", "ao",
           "das"},
    "nl": {"de", "het", "een", "van", "en", "in", "is", "dat", "op", "te",
           "zijn", "met", "voor", "niet", "aan", "er", "ook", "als", "maar",
           "bij"},
}
# CJK languages have no whitespace tokenization, so the stopword profiles
# can't see them; they are detected FIRST from character-script counts over
# fixed codepoint ranges (below), then the stopword path handles the rest.
# Ranges are chosen to be expressible verbatim in RE2 (`[\x{3040}-\x{30FF}]`)
# so the DuckDB oracle replays the exact same counts.
#   kana   = hiragana U+3040-309F + katakana U+30A0-30FF (contiguous)
#   hangul = syllables U+AC00-D7A3 + jamo U+1100-11FF + compat U+3130-318F
#   han    = CJK unified ideographs U+4E00-9FFF
# Decision order (ja before ko/zh: Japanese text mixes kanji with kana,
# while Chinese/Korean text contains essentially no kana):
#   kana/len >= 0.05   -> ja, confidence (kana+han)/len
#   hangul/len >= 0.05 -> ko, confidence hangul/len
#   han/len >= 0.05    -> zh, confidence han/len
# Reference parity target: langdetect at engine/text/preprocessing.py:21-24
# (which handles CJK); this is the same decision shape with a deterministic,
# SQL-mirrorable score.
_CJK_THRESHOLD = 0.05


def token_counts(ds: ray.data.Dataset, text_col: str = "text",
                 id_col: str = "doc_id") -> ray.data.Dataset:
    """(doc_id, ws_tokens, bpe_tokens): whitespace and BPE-ish counts."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ws = [len(t.split()) for t in texts]
        bpe = [len(_BPE_RE.findall(t)) for t in texts]
        return pa.table(
            {
                id_col: batch.column(id_col),
                "ws_tokens": pa.array(ws, type=pa.int64()),
                "bpe_tokens": pa.array(bpe, type=pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def quality_signals(texts: list[str]) -> dict[str, np.ndarray]:
    """Per-doc quality signal arrays (shared by quality_scores and the
    curation pipeline): n_chars, n_tokens, mean token length, punctuation
    ratio, stopword ratio, uppercase ratio, and a composite keep-score in
    [0,1] (heuristics in the C4/Gopher-rules tradition)."""
    stop = _LANG_PROFILES["en"]
    n = len(texts)
    n_chars = np.empty(n, dtype=np.int64)
    n_tokens = np.empty(n, dtype=np.int64)
    mean_tok = np.empty(n, dtype=np.float64)
    punct = np.empty(n, dtype=np.float64)
    stopr = np.empty(n, dtype=np.float64)
    upper = np.empty(n, dtype=np.float64)
    for i, t in enumerate(texts):
        toks = t.split()
        n_chars[i] = len(t)
        n_tokens[i] = len(toks)
        mean_tok[i] = (sum(map(len, toks)) / len(toks)) if toks else 0.0
        punct[i] = len(_PUNCT_RE.findall(t)) / max(1, len(t))
        stopr[i] = (sum(1 for w in toks if w.lower() in stop) / len(toks)) if toks else 0.0
        upper[i] = sum(1 for c in t if c.isupper()) / max(1, len(t))
    score = (
        np.clip(n_tokens / 50.0, 0, 1) * 0.3
        + np.clip((mean_tok - 1.0) / 9.0, 0, 1) * 0.2
        + (1.0 - np.clip(punct * 4.0, 0, 1)) * 0.2
        + np.clip(stopr * 4.0, 0, 1) * 0.2
        + (1.0 - np.clip(upper * 5.0, 0, 1)) * 0.1
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": mean_tok,
        "punct_ratio": punct,
        "stopword_ratio": stopr,
        "upper_ratio": upper,
        "quality_score": score,
    }


def quality_scores(ds: ray.data.Dataset, text_col: str = "text",
                   id_col: str = "doc_id") -> ray.data.Dataset:
    """Per-doc quality signals table; see ``quality_signals``."""

    def fn(batch: pa.Table) -> pa.Table:
        sig = quality_signals(batch.column(text_col).to_pylist())
        return pa.table({id_col: batch.column(id_col),
                         **{k: pa.array(v) for k, v in sig.items()}})

    return ds.map_batches(fn, batch_format="pyarrow")


def _cjk_counts(t: str) -> tuple[int, int, int]:
    """(kana, hangul, han) character counts, vectorized over the doc's
    codepoints (one utf-32 decode + range masks; no per-char Python)."""
    cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
    kana = int(((cp >= 0x3040) & (cp <= 0x30FF)).sum())
    hangul = int(
        (((cp >= 0xAC00) & (cp <= 0xD7A3))
         | ((cp >= 0x1100) & (cp <= 0x11FF))
         | ((cp >= 0x3130) & (cp <= 0x318F))).sum()
    )
    han = int(((cp >= 0x4E00) & (cp <= 0x9FFF)).sum())
    return kana, hangul, han


_LANGID_BACKEND_ENV = "SE_RAY_LANGID_BACKEND"


def _langdetect_langs(texts: list[str]) -> tuple[list[str], list[float]]:
    """Optional `langdetect` backend (VERDICT r3 #10): the published
    port of Google's language-detection library, used drop-in when the
    package is installed (it is NOT in this container — the heuristic
    backend stays the default and the SQL-oracled path)."""
    try:
        import langdetect
    except ImportError as e:
        raise ImportError(
            "language-ID backend 'langdetect' requires the langdetect "
            "package (not installed in this environment); use the "
            "default 'heuristic' backend or install langdetect"
        ) from e
    langdetect.DetectorFactory.seed = 0  # deterministic across workers
    out_lang, out_conf = [], []
    for t in texts:
        try:
            best = langdetect.detect_langs(t)[0]
            out_lang.append(str(best.lang))
            out_conf.append(float(best.prob))
        except langdetect.lang_detect_exception.LangDetectException:
            out_lang.append("und")
            out_conf.append(0.0)
    return out_lang, out_conf


def detect_langs(
    texts: list[str], backend: str | None = None
) -> tuple[list[str], list[float]]:
    """Language ID (shared helper): CJK scripts first via codepoint-range
    ratios (see _CJK_THRESHOLD block comment), then argmax over
    per-language stopword hit ratios; 'und' when nothing matches.

    ``backend`` (default env SE_RAY_LANGID_BACKEND, else 'heuristic')
    selects 'heuristic' (this module, SQL-oracled) or 'langdetect'
    (feature-flagged adapter; raises ImportError when absent)."""
    backend = backend or os.environ.get(_LANGID_BACKEND_ENV, "heuristic")
    if backend == "langdetect":
        return _langdetect_langs(texts)
    if backend != "heuristic":
        raise ValueError(f"unknown language-ID backend {backend!r}")
    langs = sorted(_LANG_PROFILES)
    out_lang, out_conf = [], []
    for t in texts:
        kana, hangul, han = _cjk_counts(t)
        n = max(1, len(t))
        if kana / n >= _CJK_THRESHOLD:
            out_lang.append("ja")
            out_conf.append((kana + han) / n)
            continue
        if hangul / n >= _CJK_THRESHOLD:
            out_lang.append("ko")
            out_conf.append(hangul / n)
            continue
        if han / n >= _CJK_THRESHOLD:
            out_lang.append("zh")
            out_conf.append(han / n)
            continue
        words = [w.lower() for w in t.split()]
        if not words:
            out_lang.append("und")
            out_conf.append(0.0)
            continue
        scores = {
            lg: sum(1 for w in words if w in _LANG_PROFILES[lg]) / len(words)
            for lg in langs
        }
        best = max(langs, key=lambda lg: (scores[lg], lg))
        if scores[best] == 0.0:
            out_lang.append("und")
            out_conf.append(0.0)
        else:
            out_lang.append(best)
            out_conf.append(scores[best])
    return out_lang, out_conf


def detect_language(ds: ray.data.Dataset, text_col: str = "text",
                    id_col: str = "doc_id",
                    backend: str | None = None) -> ray.data.Dataset:
    """Language-ID table; see ``detect_langs``.  ``backend`` is resolved
    inside the task (workers inherit the env var) so a driver-side env
    set also reaches actor-pool workers."""

    def fn(batch: pa.Table) -> pa.Table:
        out_lang, out_conf = detect_langs(
            batch.column(text_col).to_pylist(), backend=backend)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "detected_lang": pa.array(out_lang),
                "lang_confidence": pa.array(out_conf, type=pa.float64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


class Fingerprinter:
    """Document fingerprints: md5 of the raw text (exact identity; SQL
    md5() oracle-able) plus a winnowing-style rolling fingerprint — the
    min over ``window``-token windows of a mod-2^32 polynomial fold of
    md5-derived token hashes (robust to local edits).  Docs shorter than
    the window fold all their tokens; empty docs fingerprint to 0.  The
    fold reuses dedup.gram_fold, so the whole computation is vectorized
    AND exactly replayable by the DuckDB oracle (md5 + BIGINT-safe
    arithmetic + list_reduce)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 window: int = 8):
        from .dedup import _TokenHashCache, md5_hash32

        self.text_col = text_col
        self.id_col = id_col
        self.window = window
        self.cache = _TokenHashCache(md5_hash32)

    def rolling(self, texts: list[str]) -> np.ndarray:
        from .dedup import _flat_tokens, gram_fold

        flat, off = _flat_tokens(texts)
        h = self.cache.hash_all(flat)
        grams, goff = gram_fold(h, np.diff(off), off, self.window)
        return np.minimum.reduceat(grams, goff[:-1])

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        md5s = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "content_md5": pa.array(md5s),
                # int64, not uint64: fold values are < 2^32 and a signed
                # column hashes identically to the oracle's ::BIGINT on
                # any driver-side dtype normalization
                "rolling_fingerprint": pa.array(
                    self.rolling(texts).astype("int64"), type=pa.int64()),
            }
        )


def fingerprints(ds: ray.data.Dataset, text_col: str = "text",
                 id_col: str = "doc_id", window: int = 8) -> ray.data.Dataset:
    from .dedup import stage_task_fn

    return ds.map_batches(
        stage_task_fn(Fingerprinter, text_col=text_col, id_col=id_col,
                      window=window),
        batch_format="pyarrow",
    )
