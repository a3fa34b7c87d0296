"""Boolean parser AST shapes — the reference's own parser tests
(/root/reference/tests/test_query.py:18-58) re-targeted at our parser."""

from searchengine_ray.query.ast import (
    AndQuery,
    NotQuery,
    OrQuery,
    PhraseLiteral,
    TermLiteral,
)
from searchengine_ray.query.parser import parse_query
from searchengine_ray.porter2 import stem


def test_two_words_is_and():
    q = parse_query("cat dog")
    assert isinstance(q, AndQuery)
    assert [c.term for c in q.components] == [stem("cat"), stem("dog")]


def test_plus_is_or():
    q = parse_query("cat + dog")
    assert isinstance(q, OrQuery)
    assert [c.term for c in q.components] == [stem("cat"), stem("dog")]


def test_mixed_or_of_ands():
    q = parse_query('cat dog + mouse "quick fox"')
    assert isinstance(q, OrQuery)
    left, right = q.components
    assert isinstance(left, AndQuery)
    assert [c.term for c in left.components] == [stem("cat"), stem("dog")]
    assert isinstance(right, AndQuery)
    assert isinstance(right.components[0], TermLiteral)
    assert right.components[0].term == stem("mouse")
    phrase = right.components[1]
    assert isinstance(phrase, PhraseLiteral)
    assert [lit.term for lit in phrase.literals] == [stem("quick"), stem("fox")]


def test_not_query():
    q = parse_query("cat -dog")
    assert isinstance(q, AndQuery)
    assert isinstance(q.components[0], TermLiteral)
    assert isinstance(q.components[1], NotQuery)
    assert q.components[1].component.term == stem("dog")


def test_single_word_phrase_collapses_to_term():
    q = parse_query('"cat"')
    assert isinstance(q, TermLiteral)
    assert q.term == stem("cat")


def test_terms_are_preprocessed_at_parse_time():
    q = parse_query("Running!")
    assert isinstance(q, TermLiteral)
    assert q.term == "run"


def test_hyphenated_query_token_joins_types():
    # the reference stores the space-joined processed string as the term
    # (booleanqueryparser.py:118-123) — faithful even though it can never
    # match a single indexed term
    q = parse_query("data-driven")
    assert isinstance(q, TermLiteral)
    assert q.term == f"{stem('data')} {stem('driven')} {stem('datadriven')}"


def test_malformed_phrase_raises():
    import pytest

    with pytest.raises(ValueError):
        parse_query('"unclosed phrase')


def test_empty_query_raises():
    import pytest

    with pytest.raises(ValueError):
        parse_query("   ")
