"""Boolean query parser — same surface grammar as the reference
(/root/reference/engine/querying/booleanqueryparser.py:124-178):

- ``+`` separates disjunctive subqueries (OR),
- whitespace within a subquery separates conjunctive literals (AND),
- ``-literal`` wraps the literal in NotQuery,
- ``"..."`` is a phrase; after preprocessing, a single-word phrase
  collapses to a TermLiteral, a multi-word phrase re-parses its contents
  and lifts the resulting And/Or components into a PhraseLiteral,
- bare terms are preprocessed through the full T1→T3 chain at parse time
  (booleanqueryparser.py:83,118) and the *space-joined* result string
  becomes the TermLiteral's term.

Implementation is a fresh tokenizing scanner, not the reference's
index-arithmetic walk — behavior-equivalent on its test grammar
(tests/test_query.py).
"""

from __future__ import annotations

from ..tokenizer import process_query_terms
from .ast import AndQuery, NotQuery, OrQuery, PhraseLiteral, QueryNode, TermLiteral


def _process_for(analyzer: str, text: str) -> str:
    """T5 query preprocessing, matched to the analyzer that BUILT the
    index — query terms must normalize exactly like indexed terms or
    Boolean queries silently miss (e.g. Porter2-stemming a query against
    a whitespace or Spanish index)."""
    if analyzer == "whitespace":
        return " ".join(text.lower().split())
    if analyzer == "spanish":
        from ..spanish import _ALPHA_RE, stem

        return " ".join(
            stem(m.group(0).lower()) for m in _ALPHA_RE.finditer(text)
        )
    # reference chain (preprocessing.py:36-48)
    return " ".join(process_query_terms(text))


def parse_query(query: str, analyzer: str = "reference") -> QueryNode:
    subqueries = [s for s in query.split("+") if s.strip()]
    if not subqueries:
        raise ValueError("No valid subqueries found in the query.")
    components: list[QueryNode] = []
    for sub in subqueries:
        literals = _parse_subquery(sub, analyzer)
        if len(literals) == 1:
            components.append(literals[0])
        else:
            components.append(AndQuery(literals))
    if len(components) == 1:
        return components[0]
    return OrQuery(components)


def _parse_subquery(sub: str, analyzer: str = "reference") -> list[QueryNode]:
    literals: list[QueryNode] = []
    i, n = 0, len(sub)
    while i < n:
        ch = sub[i]
        if ch == " ":
            i += 1
            continue
        negate = False
        if ch == "-" and i + 1 < n:
            # leading '-' marks NOT (booleanqueryparser.py:66-77); a '-'
            # inside a word is hyphenation, handled by preprocessing
            negate = True
            i += 1
            while i < n and sub[i] == " ":
                i += 1
            ch = sub[i] if i < n else ""
        if ch == '"':
            end = sub.find('"', i + 1)
            if end < 0:
                raise ValueError(
                    "Malformed phrase, missing a closing quotation mark."
                )
            contents = _process_for(analyzer, sub[i + 1:end])
            i = end + 1
            if " " in contents:
                node: QueryNode = PhraseLiteral(
                    [TermLiteral(t) for t in contents.split(" ")]
                )
            else:
                node = TermLiteral(contents)
        else:
            end = sub.find(" ", i)
            if end < 0:
                end = n
            word = sub[i:end]
            i = end
            node = TermLiteral(_process_for(analyzer, word))
        literals.append(NotQuery(node) if negate else node)
    return literals
