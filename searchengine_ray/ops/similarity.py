"""Similarity search over an embedding column (list<float>).

- ``knn_bruteforce``: exact cosine top-k.  The query matrix is broadcast
  once via ``ray.put`` and read zero-copy in every batch task; each batch
  computes a local top-k (numpy matmul), and the driver merges the
  per-batch candidates (k per query per batch — tiny).
- ``knn_ivf``: the scale path.  A sampled k-means (fit on a driver-side
  sample, centroids broadcast) assigns every vector to a coarse cell; a
  query probes only the ``nprobe`` nearest cells.  Same merge scheme.

Both return (query_id, vec_id, score, rank) rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(norms == 0, 1.0, norms)


def _topk_merge(rows: list[dict], k: int) -> pa.Table:
    """Merge per-batch candidate rows into global top-k per query."""
    by_q: dict[int, list[tuple[float, int]]] = {}
    for r in rows:
        by_q.setdefault(int(r["query_id"]), []).append(
            (float(r["score"]), int(r["vec_id"]))
        )
    out_q, out_v, out_s, out_r = [], [], [], []
    for q in sorted(by_q):
        cand = sorted(by_q[q], key=lambda sv: (-sv[0], sv[1]))[:k]
        for rank, (s, v) in enumerate(cand, start=1):
            out_q.append(q)
            out_v.append(v)
            out_s.append(s)
            out_r.append(rank)
    return pa.table(
        {
            "query_id": pa.array(out_q, type=pa.int64()),
            "vec_id": pa.array(out_v, type=pa.int64()),
            "score": pa.array(out_s, type=pa.float64()),
            "rank": pa.array(out_r, type=pa.int64()),
        }
    )


def knn_bruteforce(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: list[int] | None = None,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Exact cosine top-k of every query against the dataset."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    qids = query_ids if query_ids is not None else list(range(q.shape[0]))
    q_ref = ray.put(q)

    def local_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        vecs = np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        unit = _normalize(vecs)
        sims = qm @ unit.T  # (nq, nbatch)
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kth=kk - 1, axis=1)[:, :kk]
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[0]):
            for j in part[qi]:
                out_q.append(qi)
                out_v.append(int(ids[j]))
                out_s.append(float(sims[qi, j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )

    rows = ds.map_batches(local_topk, batch_format="pyarrow").take_all()
    tbl = _topk_merge(rows, k)
    # map positional query index -> caller's query_ids
    qmap = {i: qid for i, qid in enumerate(qids)}
    return tbl.set_column(
        0, "query_id",
        pa.array([qmap[int(x)] for x in tbl.column("query_id").to_pylist()],
                 type=pa.int64()),
    )


def _kmeans_fit(sample: np.ndarray, n_clusters: int, iters: int = 10,
                seed: int = 0) -> np.ndarray:
    """Small deterministic k-means on a driver-side sample (unit vectors)."""
    rng = np.random.default_rng(seed)
    n = sample.shape[0]
    centroids = sample[rng.choice(n, size=min(n_clusters, n), replace=False)]
    for _ in range(iters):
        sims = sample @ centroids.T
        assign = np.argmax(sims, axis=1)
        for c in range(centroids.shape[0]):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def knn_ivf(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: list[int] | None = None,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 4096,
    seed: int = 0,
) -> pa.Table:
    """IVF approximate top-k: coarse-quantize the corpus once (centroids
    broadcast), then scan only vectors whose cell is among each query's
    ``nprobe`` nearest cells.  At scale the assignment is written
    partitioned-by-cell so a query reads ~nprobe/n_clusters of the data."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    qids = query_ids if query_ids is not None else list(range(q.shape[0]))

    sample_rows = ds.limit(sample_size).take_all()
    sample = _normalize(
        np.asarray([r[vec_col] for r in sample_rows], dtype=np.float64)
    )
    centroids = _kmeans_fit(sample, n_clusters, seed=seed)
    cent_ref = ray.put(centroids)
    q_ref = ray.put(q)
    # cells each query probes
    probe = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]
    probe_ref = ray.put(probe)

    def local_topk(batch: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref)
        qm = ray.get(q_ref)
        pr = ray.get(probe_ref)
        vecs = np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        unit = _normalize(vecs)
        cell = np.argmax(unit @ cents.T, axis=1)
        out_q, out_v, out_s = [], [], []
        for qi in range(qm.shape[0]):
            mask = np.isin(cell, pr[qi])
            if not mask.any():
                continue
            sims = unit[mask] @ qm[qi]
            sub_ids = ids[mask]
            kk = min(k, sims.size)
            part = np.argpartition(-sims, kth=kk - 1)[:kk]
            for j in part:
                out_q.append(qi)
                out_v.append(int(sub_ids[j]))
                out_s.append(float(sims[j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )

    rows = ds.map_batches(local_topk, batch_format="pyarrow").take_all()
    tbl = _topk_merge(rows, k)
    qmap = {i: qid for i, qid in enumerate(qids)}
    return tbl.set_column(
        0, "query_id",
        pa.array([qmap[int(x)] for x in tbl.column("query_id").to_pylist()],
                 type=pa.int64()),
    )
