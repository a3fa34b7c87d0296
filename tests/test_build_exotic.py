"""End-to-end distributed build + read with MULTI-BYTE terms.

The driver-contract whitespace index is built over plain-ASCII synthetic
content, so exotic codepoints in TERM strings (multi-byte UTF-8 through
the docterms files, the exchange wire, the parquet term dictionary, the
vocabulary sort, and the postings reader) had no coverage.  This builds
a corpus of Greek (incl. final sigma), Turkish dotted-I, CJK, emoji,
combining marks, and unicode-whitespace-delimited docs with the
``whitespace`` analyzer and checks the whole index against a pure-Python
per-doc oracle (tokenizer.analyze_document_whitespace)."""

import pyarrow as pa
import pytest
import ray

from searchengine_ray.build import IndexBuildConfig, build_index
from searchengine_ray.query.reader import DiskIndexReader
from searchengine_ray.tokenizer import analyze_document_whitespace

DOCS = [
    "\u0391\u03a3 \u0392\u0397\u03a4\u0391\u03a3 \u03b1\u03c2",      # ΑΣ ΒΗΤΑΣ ας — final sigma collisions
    "\u0130stanbul I\u0130 \u0131",                                # İstanbul, dotted/dotless i
    "\u4e16\u754c \u4e16\u754c\u8bed caf\xe9 CAF\xc9",          # CJK + accented pairs
    "na\u00efve nai\u0308ve",                                      # composed vs combining
    "\U0001f600 \U0001f600\U0001f680 x",                          # emoji (4-byte UTF-8)
    "tab\tsep\u00a0nbsp\u2003em\u3000ideo",                       # exotic whitespace delims
    "",                                                             # empty doc
    "\u03a3 \u03a3\u03a3 \u03a3.",                                  # sigma edge contexts
    "mixed \u0391\u03a3 ascii",
    "\x1cfs\x1dgs\x1ers\x1fus",                                    # control separators
] * 3  # repeat so terms cross block/bucket boundaries


@pytest.fixture(scope="module")
def exotic_index(ray_session, tmp_path_factory):
    tbl = pa.table({
        "repo": pa.array(["r"] * len(DOCS)),
        "path": pa.array([f"f{i:03d}.py" for i in range(len(DOCS))]),
        "commit": pa.array(["c"] * len(DOCS)),
        "lang": pa.array(["py"] * len(DOCS)),
        "content": pa.array(DOCS, type=pa.string()),
    })
    out = str(tmp_path_factory.mktemp("exotic_idx"))
    src = str(tmp_path_factory.mktemp("exotic_src") / "corpus.parquet")
    import pyarrow.parquet as pq

    pq.write_table(tbl, src)
    ds = ray.data.read_parquet(src)
    cfg = IndexBuildConfig(analyzer="whitespace", num_buckets=4)
    build_index(ds, out, cfg, input_description=src)
    return out


def _oracle():
    # doc_id = rank in (repo, path, commit) order == DOCS order here
    index = {}
    lengths = {}
    for doc_id, content in enumerate(DOCS):
        term_pos, dl = analyze_document_whitespace(content)
        lengths[doc_id] = dl
        for t, ps in term_pos.items():
            index.setdefault(t, {})[doc_id] = ps
    return index, lengths


def test_vocabulary_and_postings_match_python_oracle(exotic_index):
    index, lengths = _oracle()
    r = DiskIndexReader(exotic_index)
    assert r.get_vocabulary() == sorted(index)
    for term, want in index.items():
        pl = r.get_postings(term, with_positions=True)
        assert pl.doc_ids.tolist() == sorted(want), term
        for i, d in enumerate(pl.doc_ids.tolist()):
            assert pl.positions_of(i).tolist() == want[d], (term, d)


def test_doc_lengths_match(exotic_index):
    _, lengths = _oracle()
    r = DiskIndexReader(exotic_index)
    for d, dl in lengths.items():
        assert r.get_document_length(d) == dl, d
    assert r.num_docs == len(DOCS)
