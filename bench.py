"""Benchmark harness.

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) with num_cpus=$RAY_GRAFT_CPUS (default 32) and print
ONE JSON line.

--scaling: run the index build twice in fresh subprocesses (num_cpus=8 and
num_cpus=32) on the same input and report both throughputs + scaling
efficiency — the sandbox evidence for the N->4N cluster criterion.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

BM25_QUERIES = [
    "hash join merge scan",
    "table row value",
    "agg slow fast",
    "batch part key",
    "merge sort scan table",
    "value hash agg row",
    "fast slow key part",
    "scan scan scan",
    "join value",
    "row batch merge",
]

BOOL_QUERIES = [
    "hash join", "merge + sort", "table -row", '"hash join"', "scan value part",
]


def _build(num_cpus: int, index_dir: str, analyzer: str = "reference"):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    from searchengine_ray.build import IndexBuildConfig, build_index
    from searchengine_ray.corpus import corpus_from_documents

    shutil.rmtree(index_dir, ignore_errors=True)
    corpus = corpus_from_documents(SF_DIR)
    n_docs = corpus.count()
    cfg = IndexBuildConfig(
        analyzer=analyzer,
        num_buckets=max(16, num_cpus),
        tokenize_concurrency=(2, num_cpus),
    )
    t0 = time.perf_counter()
    manifest = build_index(
        corpus, index_dir, cfg,
        input_description=f"{SF_DIR}#bench-{num_cpus}",
    )
    build_s = time.perf_counter() - t0
    return n_docs, build_s, manifest


def run_single(num_cpus: int) -> dict:
    """One full bench pass; returns the metrics dict."""
    index_dir = f"/tmp/bench_idx_{num_cpus}"
    n_docs, build_s, manifest = _build(num_cpus, index_dir)
    out: dict = {
        "sf": SF_DIR,
        "num_cpus": num_cpus,
        "n_docs": n_docs,
        "queries": {},
    }
    out["queries"]["index_build"] = round(build_s, 3)
    out["build_files_per_sec"] = round(n_docs / build_s, 1)

    from searchengine_ray.query.engine import QueryEngine

    t0 = time.perf_counter()
    eng = QueryEngine(index_dir)
    out["queries"]["engine_init"] = round(time.perf_counter() - t0, 3)

    lat = []
    for q in BM25_QUERIES:
        t0 = time.perf_counter()
        eng.ranked_query(q, use_okapi=True, top_k=10)
        lat.append(time.perf_counter() - t0)
    out["bm25_p50_ms"] = round(1000 * statistics.median(lat), 2)
    out["bm25_p95_ms"] = round(
        1000 * sorted(lat)[max(0, int(len(lat) * 0.95) - 1)], 2
    )
    out["queries"]["bm25_queryset"] = round(sum(lat), 3)

    lat_b = []
    for q in BOOL_QUERIES:
        t0 = time.perf_counter()
        eng.boolean_query(q)
        lat_b.append(time.perf_counter() - t0)
    out["queries"]["boolean_queryset"] = round(sum(lat_b), 3)

    # training-data ops over the same documents table
    import ray.data

    from searchengine_ray.ops.dedup import minhash_lsh_dedup
    from searchengine_ray.ops.similarity import knn_bruteforce
    from searchengine_ray.ops.textstats import quality_scores

    docs = ray.data.read_parquet(f"{SF_DIR}/documents.parquet")
    t0 = time.perf_counter()
    minhash_lsh_dedup(docs).count()
    out["queries"]["minhash_dedup"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    quality_scores(docs).count()
    out["queries"]["quality_scores"] = round(time.perf_counter() - t0, 3)

    import numpy as np
    import pyarrow.parquet as pq

    emb = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
    qv = np.asarray(
        pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["embedding"])
        .column("embedding").to_pylist()[:8],
        dtype=np.float64,
    )
    t0 = time.perf_counter()
    knn_bruteforce(emb, qv, k=10)
    out["queries"]["knn_bruteforce"] = round(time.perf_counter() - t0, 3)

    # index size accounting
    seg_bytes = sum(
        os.path.getsize(os.path.join(index_dir, "segments", f))
        for f in os.listdir(os.path.join(index_dir, "segments"))
    )
    out["index_bytes_per_doc"] = round(seg_bytes / max(1, n_docs), 1)
    out["value"] = round(sum(out["queries"].values()), 3)
    out["metric"] = "total pipeline seconds (build + query set + ops)"
    out["unit"] = "sec"
    return out


SCALING_DOCS = int(os.environ.get("GRAFT_SCALING_DOCS", "1000000"))
SCALING_CORPUS_DIR = f"/tmp/bench_scale_corpus_{SCALING_DOCS}"


def _scaling_build(num_cpus: int) -> dict:
    """One timed disk->index build over the big deterministic corpus.

    Workers are warmed (package import, process spawn) before t0: the
    criterion is steady-state indexing throughput on a long-lived cluster,
    not cold-start amortised over an artificially short job.
    """
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    from searchengine_ray.build import IndexBuildConfig, build_index
    from searchengine_ray.corpus import ensure_synthetic_corpus_parquet

    ensure_synthetic_corpus_parquet(SCALING_CORPUS_DIR, SCALING_DOCS)

    @ray.remote
    def warm():
        import searchengine_ray.build  # noqa: F401

        return 0

    ray.get([warm.remote() for _ in range(num_cpus * 2)])

    index_dir = f"/tmp/bench_scale_idx_{num_cpus}"
    shutil.rmtree(index_dir, ignore_errors=True)
    corpus = ray.data.read_parquet(SCALING_CORPUS_DIR)
    cfg = IndexBuildConfig(num_buckets=64)
    t0 = time.perf_counter()
    manifest = build_index(
        corpus, index_dir, cfg,
        input_description=f"{SCALING_CORPUS_DIR}#scaling-{num_cpus}",
    )
    build_s = time.perf_counter() - t0
    n_docs = manifest["num_docs"]
    return {"num_cpus": num_cpus, "build_sec": round(build_s, 3),
            "n_docs": n_docs,
            "files_per_sec": round(n_docs / build_s, 1)}


def run_scaling() -> dict:
    """Same disk->index build at 8 and 32 CPUs in fresh processes."""
    results = {}
    for n in (8, 32):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--_single-build",
             str(n)],
            capture_output=True, text=True, timeout=3600,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if not line:
            raise RuntimeError(
                f"scaling run n={n} produced no JSON:\n{proc.stdout}\n{proc.stderr}"
            )
        results[n] = json.loads(line[-1])
    tp8 = results[8]["files_per_sec"]
    tp32 = results[32]["files_per_sec"]
    eff = (tp32 / tp8) / (32 / 8)
    return {
        "metric": "index-build scaling efficiency (8 -> 32 cpus)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sf": SCALING_CORPUS_DIR,
        "n_docs": SCALING_DOCS,
        "num_cpus": 32,
        "queries": {
            "build_8cpu_files_per_sec": tp8,
            "build_32cpu_files_per_sec": tp32,
            "build_8cpu_sec": results[8]["build_sec"],
            "build_32cpu_sec": results[32]["build_sec"],
        },
    }


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--_single-build":
        n = int(sys.argv[2])
        print(json.dumps(_scaling_build(n)))
        import ray

        ray.shutdown()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        print(json.dumps(run_scaling()))
        return
    out = run_single(NUM_CPUS)
    print(json.dumps(out))
    import ray

    ray.shutdown()


if __name__ == "__main__":
    main()
