"""Spelling correction — semantics of the reference's SpellingCorrection
(/root/reference/engine/text/spellingcorrection.py:1-37):

- vocabulary = the index's full term dictionary (ST6),
- candidate score = Levenshtein distance, top-5 ascending (O6),
- query correction: strip non-letters, split on whitespace, replace each
  word with its best candidate.

The reference iterates a Python set, so its tie order is unspecified; we
break ties (distance asc, candidate asc) for determinism.  The distance
loop is vectorized over the whole vocabulary with numpy (one DP row per
step across all candidates at once) instead of the reference's per-word
two-row loop — same distances.
"""

from __future__ import annotations

import re

import numpy as np

_LETTERS_RE = re.compile(r"[^a-zA-Z\s]")


def levenshtein(s1: str, s2: str) -> int:
    """Classic two-row DP edit distance."""
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    if not s2:
        return len(s1)
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1):
        cur = [i + 1]
        for j, c2 in enumerate(s2):
            cur.append(
                min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (c1 != c2))
            )
        prev = cur
    return prev[-1]


class SpellingCorrection:
    def __init__(self, index):
        self.vocabulary = sorted(index.get_vocabulary())
        # fixed-width uint32 codepoint matrix for vectorized DP
        if self.vocabulary:
            self._max_len = max(len(w) for w in self.vocabulary)
            self._mat = np.zeros(
                (len(self.vocabulary), self._max_len), dtype=np.uint32
            )
            for i, w in enumerate(self.vocabulary):
                self._mat[i, : len(w)] = np.frombuffer(
                    w.encode("utf-32-le"), dtype=np.uint32
                )
            self._lens = np.array(
                [len(w) for w in self.vocabulary], dtype=np.int64
            )
        else:
            self._max_len = 0
            self._mat = np.zeros((0, 0), dtype=np.uint32)
            self._lens = np.zeros(0, dtype=np.int64)

    def distances(self, word: str) -> np.ndarray:
        """Levenshtein distance from ``word`` to every vocabulary term,
        one numpy DP sweep over all terms simultaneously."""
        n_vocab = len(self.vocabulary)
        if n_vocab == 0:
            return np.zeros(0, dtype=np.int64)
        w = np.frombuffer(word.encode("utf-32-le"), dtype=np.uint32)
        m = w.size
        # dp[v, j] = distance between word[:i] and vocab[v][:j]
        dp = np.tile(np.arange(self._max_len + 1, dtype=np.int64), (n_vocab, 1))
        for i in range(m):
            prev_diag = dp[:, :-1].copy()
            new0 = np.full(n_vocab, i + 1, dtype=np.int64)
            sub = prev_diag + (self._mat != w[i])
            ins = dp[:, 1:] + 1
            dp[:, 0] = new0
            for j in range(self._max_len):
                dp[:, j + 1] = np.minimum(
                    np.minimum(ins[:, j], sub[:, j]), dp[:, j] + 1
                )
        return dp[np.arange(n_vocab), self._lens]

    def suggest_for_word(self, word: str, max_suggestions: int = 5) -> list[str]:
        d = self.distances(word)
        if d.size == 0:
            return []
        order = np.lexsort((np.arange(d.size), d))[:max_suggestions]
        return [self.vocabulary[int(i)] for i in order]

    def suggest(self, query: str, max_suggestions: int = 5) -> str:
        """Whole-query correction (spellingcorrection.py:32-37)."""
        out = []
        for word in _LETTERS_RE.sub("", query).split():
            cands = self.suggest_for_word(word, max_suggestions)
            out.append(cands[0] if cands else word)
        return " ".join(out)
