"""Boolean query AST — semantics from /root/reference/engine/querying/*.

Nodes mirror the reference's QueryComponent tree
(querycomponent.py:5-27): TermLiteral, PhraseLiteral, AndQuery, OrQuery,
NotQuery.  Merges are numpy set operations over doc_id-sorted PostingLists,
with the reference's exact result conventions:

- AND keeps the *first* operand's postings for matching docs
  (andquery.py:30-34: ``result.append(first_postings[i])``).
- AND-NOT emits left postings absent from right.  Deliberate deviation:
  the reference's merge (andquery.py:35-37) stops when the right list
  exhausts, silently dropping left postings beyond the right list's last
  doc (left=[1,5,9], right=[2,3] -> reference [1]); we compute the true
  set difference ([1,5,9]), which is what NOT means.
- OR dedups by first occurrence (orquery.py:10-20); since our inputs are
  always doc_id-sorted we produce the sorted union keeping the leftmost
  component's posting.
- Phrase chains positional intersects with offset 1, carrying the matched
  right-side positions (phraseliteral.py:36-63).
"""

from __future__ import annotations

import numpy as np

from .postings import PostingList


class QueryNode:
    def get_postings(self, index, with_positions: bool = False) -> PostingList:
        raise NotImplementedError

    def is_positive(self) -> bool:
        return True

    def terms(self) -> list[str]:
        """All term strings in the subtree (for phrase detection etc.)."""
        return []


class TermLiteral(QueryNode):
    """One term.  Like the reference (booleanqueryparser.py:118-123), the
    stored string is the full space-joined processed query token — a token
    that expands to several terms (hyphens) produces a multi-word string
    that matches nothing in the index, faithfully."""

    def __init__(self, term: str):
        self.term = term

    def get_postings(self, index, with_positions: bool = False) -> PostingList:
        return index.get_postings(self.term, with_positions)

    def terms(self) -> list[str]:
        return [self.term]

    def __repr__(self):
        return f"Term({self.term!r})"


class NotQuery(QueryNode):
    def __init__(self, component: QueryNode):
        self.component = component

    def is_positive(self) -> bool:
        return False

    def get_postings(self, index, with_positions: bool = False) -> PostingList:
        return self.component.get_postings(index, with_positions)

    def terms(self) -> list[str]:
        return self.component.terms()

    def __repr__(self):
        return f"Not({self.component!r})"


class AndQuery(QueryNode):
    def __init__(self, components: list[QueryNode]):
        self.components = components

    def get_postings(self, index, with_positions: bool = False) -> PostingList:
        result = self.components[0].get_postings(index, with_positions)
        for comp in self.components[1:]:
            other = comp.get_postings(index, with_positions)
            if comp.is_positive():
                result = intersect_keep_left(result, other)
            else:
                result = difference(result, other)
        return result

    def terms(self) -> list[str]:
        return [t for c in self.components for t in c.terms()]

    def __repr__(self):
        return f"And({self.components!r})"


class OrQuery(QueryNode):
    def __init__(self, components: list[QueryNode]):
        self.components = components

    def get_postings(self, index, with_positions: bool = False) -> PostingList:
        parts = [c.get_postings(index, with_positions) for c in self.components]
        return union_first_wins(parts)

    def terms(self) -> list[str]:
        return [t for c in self.components for t in c.terms()]

    def __repr__(self):
        return f"Or({self.components!r})"


class PhraseLiteral(QueryNode):
    def __init__(self, literals: list[QueryNode]):
        self.literals = literals

    def get_postings(self, index, with_positions: bool = True) -> PostingList:
        if not self.literals or not isinstance(self.literals[0], TermLiteral):
            return PostingList.empty(True)
        lists = [lit.get_postings(index, with_positions=True) for lit in self.literals]
        if not lists or any(len(pl) == 0 for pl in lists):
            return PostingList.empty(True)
        result = lists[0]
        for nxt in lists[1:]:
            result = positional_intersect(result, nxt)
            if len(result) == 0:
                break
        return result

    def terms(self) -> list[str]:
        return [t for lit in self.literals for t in lit.terms()]

    def __repr__(self):
        return f"Phrase({self.literals!r})"


def contains_phrase(node: QueryNode) -> bool:
    """Reference's _is_phrase_query walk (interface/model.py:170-196):
    positional reads are used iff the tree contains a PhraseLiteral."""
    if isinstance(node, PhraseLiteral):
        return True
    if isinstance(node, (AndQuery, OrQuery)):
        return any(contains_phrase(c) for c in node.components)
    if isinstance(node, NotQuery):
        return contains_phrase(node.component)
    return False


# ---- vectorized merges ----

def intersect_keep_left(left: PostingList, right: PostingList) -> PostingList:
    idx = np.flatnonzero(np.isin(left.doc_ids, right.doc_ids, assume_unique=True))
    return left.take(idx)


def difference(left: PostingList, right: PostingList) -> PostingList:
    idx = np.flatnonzero(
        ~np.isin(left.doc_ids, right.doc_ids, assume_unique=True)
    )
    return left.take(idx)


def union_first_wins(parts: list[PostingList]) -> PostingList:
    """Sorted union of doc_ids; for a doc in several lists keep the posting
    from the earliest component (orquery.py first-seen-dedup)."""
    parts = [p for p in parts if len(p)]
    if not parts:
        return PostingList.empty()
    if len(parts) == 1:
        return parts[0]
    all_ids = np.concatenate([p.doc_ids for p in parts])
    comp = np.concatenate(
        [np.full(len(p), i, dtype=np.int64) for i, p in enumerate(parts)]
    )
    within = np.concatenate([np.arange(len(p), dtype=np.int64) for p in parts])
    order = np.lexsort((comp, all_ids))  # doc_id asc, then component asc
    ids_sorted = all_ids[order]
    first = np.ones(ids_sorted.size, dtype=bool)
    first[1:] = ids_sorted[1:] != ids_sorted[:-1]
    sel = order[first]             # winning (component, within) per doc
    sel_comp = comp[sel]
    sel_within = within[sel]
    doc_ids = ids_sorted[first]
    tftds = np.empty(doc_ids.size, dtype=np.int64)
    for i, p in enumerate(parts):
        mask = sel_comp == i
        tftds[mask] = p.tftds[sel_within[mask]]
    if not all(p.positions is not None for p in parts):
        return PostingList(doc_ids, tftds)
    offsets = np.zeros(doc_ids.size + 1, dtype=np.int64)
    np.cumsum(tftds, out=offsets[1:])
    positions = np.empty(int(tftds.sum()), dtype=np.int64)
    for j in range(doc_ids.size):
        positions[offsets[j]:offsets[j + 1]] = parts[
            int(sel_comp[j])
        ].positions_of(int(sel_within[j]))
    return PostingList(doc_ids, tftds, positions, offsets)


def positional_intersect(left: PostingList, right: PostingList) -> PostingList:
    """Docs in both lists where some left position p has p+1 in right;
    result positions are the matching p+1 values
    (phraseliteral.py:36-63)."""
    common = np.intersect1d(left.doc_ids, right.doc_ids, assume_unique=True)
    if common.size == 0:
        return PostingList.empty(True)
    li = np.searchsorted(left.doc_ids, common)
    ri = np.searchsorted(right.doc_ids, common)

    out_ids, out_lens, out_pos = [], [], []
    for l_idx, r_idx, doc in zip(li, ri, common):
        lp = left.positions_of(int(l_idx)) + 1
        rp = right.positions_of(int(r_idx))
        matched = lp[np.isin(lp, rp)]
        if matched.size:
            out_ids.append(doc)
            out_lens.append(matched.size)
            out_pos.append(matched)
    if not out_ids:
        return PostingList.empty(True)
    doc_ids = np.asarray(out_ids, dtype=np.int64)
    lens = np.asarray(out_lens, dtype=np.int64)
    offsets = np.zeros(doc_ids.size + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    positions = np.concatenate(out_pos)
    return PostingList(doc_ids, lens, positions, offsets)
