"""Tokenization conformance — the reference's own test vectors
(/root/reference/engine/text/testprocessing.py:18-58) plus the T1/T4
stream-and-position semantics."""

from searchengine_ray.tokenizer import (
    analyze_document,
    iter_term_positions,
    process_token,
    ranked_query_terms,
    stream_tokens,
)
from searchengine_ray.porter2 import stem


def clean(token):
    """Processed types minus empties (what actually gets indexed)."""
    return [t for t in process_token(token) if t]


def test_punctuation_strip():
    assert clean("Hello,") == ["hello"]
    assert clean("world!") == ["world"]


def test_quotes_removed():
    assert clean('"quoted"') == ["quoted"]
    assert clean("it's") == ["its"]


def test_lowercase():
    assert clean("MixedCase") == ["mixedcase"]


def test_inner_punctuation_kept():
    # edge-strip only: inner dots survive (testprocessing.py:41)
    assert clean("192.168.1.1") == ["192.168.1.1"]


def test_hyphen_expansion():
    # each part + the concatenation (testprocessing.py:48-54)
    assert clean("Hewlett-Packard-Computing") == [
        "hewlett",
        "packard",
        "computing",
        "hewlettpackardcomputing",
    ]


def test_hyphen_keeps_duplicates():
    # reference uses a list, not a set (basictokenprocessor.py:11-21)
    assert clean("a-a") == ["a", "a", "aa"]


def test_empty_types_kept_in_raw_output():
    # "--" -> ['', '', ''] parts + '' concat; empties are kept in the raw
    # list (they count toward doc_length) but dropped by clean()
    assert process_token("--") == ["", "", "", ""]
    assert clean("--") == []


def test_non_ascii_stripped():
    assert clean("naïve") == ["nave"]
    assert clean("café") == ["caf"]


def test_stemming():
    assert stem("running") == "run"
    assert stem("runner") == "runner"


def test_stream_splits_on_space_only():
    # literal-space split per line; tabs survive inside tokens (T1)
    assert list(stream_tokens("a b\tc d")) == ["a", "b\tc", "d"]
    assert list(stream_tokens("x\ny z")) == ["x", "y", "z"]
    assert list(stream_tokens("  a   b ")) == ["a", "b"]


def test_positions_start_at_one_and_shared():
    pairs = list(iter_term_positions("alpha beta-gamma"))
    # token 1: alpha@1; token 2: beta,gamma,betagamma all @2
    assert pairs == [
        (stem("alpha"), 1),
        (stem("beta"), 2),
        (stem("gamma"), 2),
        (stem("betagamma"), 2),
    ]


def test_doc_length_counts_all_types():
    term_pos, doc_length = analyze_document("alpha beta-gamma --")
    # alpha(1) + beta/gamma/betagamma(3) + four empties from "--"(4)
    assert doc_length == 8
    assert "" in term_pos and len(term_pos[""]) == 4


def test_ranked_query_terms_quirk():
    # T9: lowercase + whitespace split ONLY (rankedquery.py:55-57)
    assert ranked_query_terms('Running "Fast" data-driven') == [
        "running",
        '"fast"',
        "data-driven",
    ]
