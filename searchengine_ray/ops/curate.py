"""Corpus curation: the canonical training-data composition —

    quality filter -> language filter -> exact dedup -> MinHash near-dup
    dedup

expressed as one streaming Ray Data pipeline.  The quality/language
gates run IN PLACE on each batch (no join back: the signal helpers are
row-aligned, so the mask applies directly), then the dedup stages chain
on the surviving rows.  Everything stays a lazy ``Dataset`` end-to-end;
the only materializations are the dedup side tables (see ops/dedup.py).

Every gate is SQL-replicable, so the whole composed pipeline has a
DuckDB oracle (oracles.curated_corpus_sql) — the filters in SQL, the
dedups as the existing oracle blocks applied to the filtered subset.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from .dedup import exact_dedup, minhash_lsh_dedup
from .textstats import detect_langs, quality_signals


def curate_corpus(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.3,
    languages: tuple[str, ...] | None = ("en",),
    near_dup_threshold: float = 0.8,
) -> ray.data.Dataset:
    """Rows of ``ds`` that pass the quality gate, the language gate, and
    both dedup passes (exact sha256, then MinHash-LSH near-dup at
    ``near_dup_threshold``).  Set ``languages=None`` to skip the
    language gate; ``near_dup_threshold=None`` to skip near-dup."""

    lang_set = set(languages) if languages is not None else None

    def gates(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        keep = quality_signals(texts)["quality_score"] >= min_quality
        if lang_set is not None:
            langs, _ = detect_langs(texts)
            keep &= np.fromiter((lg in lang_set for lg in langs),
                                dtype=bool, count=len(langs))
        return batch.filter(pa.array(keep))

    out = ds.map_batches(gates, batch_format="pyarrow")
    out = exact_dedup(out, text_col=text_col, id_col=id_col)
    if near_dup_threshold is not None:
        out = minhash_lsh_dedup(out, text_col=text_col, id_col=id_col,
                                threshold=near_dup_threshold)
    return out
