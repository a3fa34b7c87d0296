"""A/B the docterms v4 ``seg`` run-break rule's wire cost on identical
data: encode every docterms file of a built index twice — with the
v4 seg-aware break rule and with the v3 rule (seg=None) — and compare
total fragment counts and IPC wire bytes.  Byte counts are
deterministic, so this measures the format delta itself, immune to the
host's weather (unlike wall-clock A/Bs).

Usage:
    python scripts/seg_wire_ab.py [n_docs] [out_json]

Builds (or reuses) the deterministic synthetic corpus + index under
/tmp, then runs the encode comparison single-process (no Ray needed
for the encode pass itself).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    out_json = sys.argv[2] if len(sys.argv) > 2 else None

    import ray

    from searchengine_ray.build import (
        IndexBuildConfig,
        _encode_file_fragments,
        _explode_arrays,
        _ipc_bytes,
        build_index,
        wdt_quantized,
    )
    from searchengine_ray.corpus import ensure_synthetic_corpus_parquet

    corpus_dir = f"/tmp/bench_scale_corpus_{n_docs}"
    index_dir = f"/tmp/seg_wire_ab_idx_{n_docs}"
    ensure_synthetic_corpus_parquet(corpus_dir, n_docs)
    cfg = IndexBuildConfig(num_buckets=64)  # the scaling bench's config
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False)
    manifest = build_index(ray.data.read_parquet(corpus_dir), index_dir,
                           cfg=cfg,
                           input_description=f"seg_wire_ab_{n_docs}")
    avgdl = manifest["avg_doc_length"]
    ray.shutdown()
    docterms = sorted(
        os.path.join(index_dir, "docterms", f)
        for f in os.listdir(os.path.join(index_dir, "docterms"))
        if f.endswith(".parquet")
    )
    totals = {"v4": {"frags": 0, "bytes": 0, "encode_s": 0.0},
              "v3": {"frags": 0, "bytes": 0, "encode_s": 0.0}}
    for path in docterms:
        tbl = pq.read_table(
            path,
            columns=["term", "bucket", "doc_id", "doc_length", "tftd",
                     "pos_blob", "seg"],
            read_dictionary=["term"],
        )
        arrs = _explode_arrays(cfg, {}, tbl)
        if arrs is None:
            continue
        wq = wdt_quantized(arrs["tftds"], arrs["dls"].astype(np.float64),
                           avgdl)
        for label, seg in (("v4", arrs["seg"]), ("v3", None)):
            t = time.perf_counter()
            frag_tbl, _ = _encode_file_fragments(
                cfg, arrs["gkey"], arrs["codes"], arrs["doc_ids"], wq,
                arrs["tftds"], arrs["pos_blob"], arrs["uniq"], seg=seg)
            totals[label]["encode_s"] += time.perf_counter() - t
            totals[label]["frags"] += frag_tbl.num_rows
            totals[label]["bytes"] += len(_ipc_bytes(frag_tbl))
    out = {
        "n_docs": n_docs,
        "docterms_files": len(docterms),
        "v4_fragments": totals["v4"]["frags"],
        "v3_fragments": totals["v3"]["frags"],
        "v4_wire_bytes": totals["v4"]["bytes"],
        "v3_wire_bytes": totals["v3"]["bytes"],
        "wire_overhead_pct": round(
            100.0 * (totals["v4"]["bytes"] - totals["v3"]["bytes"])
            / totals["v3"]["bytes"], 4),
        "fragment_overhead_pct": round(
            100.0 * (totals["v4"]["frags"] - totals["v3"]["frags"])
            / totals["v3"]["frags"], 4),
        "v4_encode_s": round(totals["v4"]["encode_s"], 3),
        "v3_encode_s": round(totals["v3"]["encode_s"], 3),
    }
    print(json.dumps(out))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
