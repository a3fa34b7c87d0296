"""Exchange-only scaling probe: run the postings exchange over an
existing docterms directory (skipping tokenize) so the shuffle can be
measured and A/B-tested in isolation.

Usage:
    python scripts/exchange_probe.py <docterms_dir> <num_cpus> [reps] [buckets]

Prints one JSON line per rep with wall seconds and, when SE_RAY_PROF is
set (in the shell, BEFORE launch — workers inherit it at fork), per-task
map/reduce phase aggregates.  Use one rep per process when profiling:
all reps of a process append to the same SE_RAY_PROF dir.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def prof_summary(prof_dir: str) -> dict:
    out: dict = {}
    for kind in ("map", "reduce"):
        recs = []
        for p in glob.glob(os.path.join(prof_dir, f"{kind}_*.jsonl")):
            with open(p) as f:
                recs.extend(json.loads(ln) for ln in f if ln.strip())
        if not recs:
            continue
        t0 = min(r["t0"] for r in recs)
        t1 = max(r["t1"] for r in recs)
        agg = {"tasks": len(recs), "wall_span": round(t1 - t0, 2),
               "first_start": round(t0, 2), "last_end": round(t1, 2)}
        for k in recs[0]:
            if k in ("t0", "t1"):
                continue
            agg[f"sum_{k}"] = round(sum(r.get(k, 0) for r in recs), 2)
        out[kind] = agg
    if "map" in out and "reduce" in out:
        out["reduce_after_maps"] = round(
            out["reduce"]["last_end"] - out["map"]["last_end"], 2)
        out["overlap_start_gap"] = round(
            out["reduce"]["first_start"] - out["map"]["last_end"], 2)
    return out


def main() -> None:
    docterms_dir = sys.argv[1]
    num_cpus = int(sys.argv[2])
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    buckets = int(sys.argv[4]) if len(sys.argv) > 4 else 64

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, object_store_memory=24 << 30)

    from searchengine_ray.build import (
        IndexBuildConfig, build_segments_exchange, corpus_scalars,
        detect_heavy_terms,
    )

    cfg = IndexBuildConfig(num_buckets=buckets)
    # prefer the sibling docstats dir (true per-doc rows, dense-unique
    # checked); fall back to the docterms postings themselves, where
    # doc ids repeat per term — good enough for a wdt-bound avgdl
    docstats_dir = os.path.join(os.path.dirname(docterms_dir.rstrip("/")),
                                "docstats")
    if os.path.isdir(docstats_dir):
        # read-only diagnostic: never mutate the index under inspection
        n_docs, tot = corpus_scalars(docstats_dir, allow_cleanup=False)
    else:
        n_docs, tot = corpus_scalars(docterms_dir, check_dense=False,
                                     allow_cleanup=False)
    avgdl = tot / max(1, n_docs)
    heavy = detect_heavy_terms(docterms_dir, cfg)

    prof_dir = os.environ.get("SE_RAY_PROF")
    for rep in range(reps):
        seg_dir = f"/tmp/exchange_probe_seg_{num_cpus}"
        shutil.rmtree(seg_dir, ignore_errors=True)
        t = time.perf_counter()
        metrics, plan = build_segments_exchange(
            docterms_dir, seg_dir, cfg, heavy, avgdl)
        wall = time.perf_counter() - t
        rec = {"num_cpus": num_cpus, "rep": rep, "n_docs": n_docs,
               "buckets": buckets, "exchange_sec": round(wall, 2),
               "segments": len(metrics),
               "rows": sum(m["rows"] for m in metrics),
               "plan": plan}
        if prof_dir:
            rec["prof"] = prof_summary(prof_dir)
        print(json.dumps(rec), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
