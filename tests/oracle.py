"""Independent in-memory model of the reference engine's semantics.

Built with plain dicts and loops (no numpy, no Ray) so it shares no merge /
encode / shuffle code with the engine under test.  Formulas follow
SURVEY.md §2.5–2.6 (cites into /root/reference/engine/querying/rankedquery.py
and engine/indexing/spimi.py).
"""

from __future__ import annotations

import math

from searchengine_ray.tokenizer import iter_term_positions


class ReferenceOracle:
    def __init__(self, corpus_table):
        rows = corpus_table.to_pylist()
        # doc_id = rank in (repo, path, commit) order — the engine's
        # deterministic analogue of directory-walk enumeration
        rows.sort(key=lambda r: (r["repo"], r["path"], r["commit"]))
        self.index: dict[str, dict[int, list[int]]] = {}
        self.doc_length: dict[int, int] = {}
        self.l_d: dict[int, float] = {}
        for doc_id, row in enumerate(rows):
            tf: dict[str, int] = {}
            n_types = 0
            for term, pos in iter_term_positions(row["content"]):
                n_types += 1
                tf[term] = tf.get(term, 0) + 1
                if term:
                    self.index.setdefault(term, {}).setdefault(doc_id, []).append(pos)
            self.doc_length[doc_id] = n_types
            self.l_d[doc_id] = math.sqrt(
                sum((1.0 + math.log(c)) ** 2 for c in tf.values())
            )
        self.num_docs = len(rows)
        self.total_tokens = sum(self.doc_length.values())
        self.avg_doc_length = self.total_tokens / self.num_docs

    # ---- Boolean (set semantics) ----

    def docs_with_term(self, term: str) -> set[int]:
        return set(self.index.get(term, {}))

    def docs_with_phrase(self, terms: list[str]) -> set[int]:
        out = set()
        candidates = set.intersection(*(self.docs_with_term(t) for t in terms)) \
            if terms else set()
        for d in candidates:
            first = self.index[terms[0]][d]
            for p in first:
                if all((p + k) in self.index[terms[k]][d] for k in range(1, len(terms))):
                    out.add(d)
                    break
        return out

    # ---- ranked ----

    def rank(self, raw_query: str, use_okapi: bool, top_k=None):
        terms = raw_query.lower().split()
        acc: dict[int, float] = {}
        for term in terms:
            postings = self.index.get(term, {})
            df = len(postings)
            if df == 0:
                continue
            if use_okapi:
                wqt = max(0.1, math.log((self.num_docs - df + 0.5) / (df + 0.5)))
            else:
                wqt = math.log(1 + self.num_docs / df)
            for doc_id, positions in postings.items():
                tf = len(positions)
                if use_okapi:
                    dl = self.doc_length[doc_id]
                    wdt = 2.2 * tf / (
                        1.2 * (0.25 + 0.75 * (dl / self.avg_doc_length)) + tf
                    )
                    ld = 1.0
                else:
                    wdt = 1 + math.log(tf)
                    ld = self.l_d.get(doc_id, 1.0) or 1.0
                acc[doc_id] = acc.get(doc_id, 0.0) + wqt * wdt / ld
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:top_k] if top_k else ranked
