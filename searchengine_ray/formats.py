"""Per-format document content extraction — the Ray-side equivalents of the
reference's Document subclasses (SURVEY.md §2.1 S2-S4):

- text  (TextFileDocument, /root/reference/engine/documents/textfiledocument.py:6-25):
  title = file stem, content = raw text (line semantics live in the
  tokenizer's \\n split).
- json  (JsonDocument + json.load at directorycorpus.py:69-74):
  title = payload["title"], content = payload["body"] as ONE string.
- xml   (XMLDocument, /root/reference/engine/documents/xmldocument.py:25-52):
  title from a priority list of tags, content = all non-space text nodes
  joined by newlines.  lxml is not in this container, so the parser uses
  the stdlib ElementTree with the same semantics.

Each extractor is a stateless map_batches stage taking a table with a raw
``payload`` string column and emitting (title, content); ``extract_documents``
dispatches per-row on ``fmt`` like the reference's extension->factory dict
(directorycorpus.py:30-42, user-extension surface §2.11).
"""

from __future__ import annotations

import json
import posixpath
import xml.etree.ElementTree as ET

import pyarrow as pa
import ray.data

XML_TITLE_TAGS = ["title", "head", "name"]


def text_extract(payload: str, path: str) -> tuple[str, str]:
    stem = posixpath.splitext(posixpath.basename(path))[0]
    return stem, payload


def json_extract(payload: str, path: str) -> tuple[str, str]:
    obj = json.loads(payload)
    return str(obj.get("title", "")), str(obj.get("body", ""))


def _local_name(tag) -> str:
    if isinstance(tag, str):
        return tag.rsplit("}", 1)[-1]
    return ""


def xml_extract(payload: str, path: str) -> tuple[str, str]:
    root = ET.fromstring(payload)
    title = ""
    for want in XML_TITLE_TAGS:
        for el in root.iter():
            if _local_name(el.tag) == want and el.text and el.text.strip():
                title = el.text.strip()
                break
        if title:
            break
    if not title:
        title = posixpath.splitext(posixpath.basename(path))[0]
    chunks = []
    for el in root.iter():
        for piece in (el.text, el.tail):
            if piece and piece.strip():
                chunks.append(piece.strip())
    return title, "\n".join(chunks)


EXTRACTORS = {"text": text_extract, "txt": text_extract,
              "json": json_extract, "xml": xml_extract}


def extract_documents(
    ds: ray.data.Dataset,
    payload_col: str = "payload",
    fmt_col: str = "fmt",
    path_col: str = "path",
) -> ray.data.Dataset:
    """(payload, fmt, path, ...) -> rows with title/content extracted
    per-format; unknown formats pass payload through as content."""

    def fn(batch: pa.Table) -> pa.Table:
        payloads = batch.column(payload_col).to_pylist()
        fmts = batch.column(fmt_col).to_pylist()
        paths = batch.column(path_col).to_pylist()
        titles, contents = [], []
        for p, f, pth in zip(payloads, fmts, paths):
            extractor = EXTRACTORS.get(f, text_extract)
            t, c = extractor(p, pth)
            titles.append(t)
            contents.append(c)
        out = batch.drop_columns([payload_col])
        out = out.append_column("title", pa.array(titles, type=pa.string()))
        return out.append_column("content", pa.array(contents, type=pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


# ---- language dispatch (T6/T7) ----

def spanish_analyzer_available() -> bool:
    try:
        import spacy  # noqa: F401

        return True
    except ImportError:
        return False


def analyze_document_spanish(content: str, cache=None):
    """T7: Spanish analyzer.  The reference tokenizes + lemmatizes with
    spaCy ``es_core_news_sm`` (engine/text/spanishtokenstream.py:11-21,
    spanishtokenprocessor.py:9-27); spaCy is not installable in this
    container, so the registered implementation is the pure-Python
    Snowball Spanish stemmer approximation in spanish.py (same alphabetic
    tokenization, stem instead of lemma — the documented drop-in point
    for the spaCy model is spanish._normalize)."""
    from .spanish import analyze_document_spanish as _impl

    return _impl(content, cache)
