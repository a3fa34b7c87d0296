"""Deterministic dense doc_id assignment under arbitrary parallelism.

The reference gets doc ids "for free" from sequential directory-walk
enumeration (/root/reference/engine/documents/directorycorpus.py:64-79).  In a
distributed build the equivalent global decision is made once, explicitly:

1. sample the sort key to pick ``num_buckets - 1`` range boundaries,
2. bucket every row by key range (stateless map),
3. count rows per bucket (tiny groupby) and cumsum on the driver to get each
   bucket's base offset,
4. ``groupby(bucket).map_groups``: sort the bucket by key and assign
   ``base + arange`` — dense, collision-free, reproducible, and independent
   of input partitioning.

Cost: one all-to-all exchange (the groupby), same order as any global sort.
Buckets are sized so one bucket fits a worker (num_buckets scales with the
input).  doc_ids are therefore globally ordered by (repo, path, commit) —
the analogue of the reference's rglob order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

DEFAULT_KEY = ("repo", "path", "commit")


def _composite_key(batch: pa.Table, key_cols: tuple[str, ...]) -> pa.Array:
    """NUL-joined composite key, vectorized (pc.binary_join_element_wise)."""
    cols = [batch.column(c) for c in key_cols]
    if len(cols) == 1:
        joined = cols[0]
    else:
        joined = pc.binary_join_element_wise(*cols, "\x00")
    if isinstance(joined, pa.ChunkedArray):
        joined = joined.combine_chunks()
    return joined


def boundary_sample(
    ds: ray.data.Dataset,
    key_cols: tuple[str, ...],
    num_buckets: int,
    samples_per_bucket: int = 64,
) -> list:
    """Sorted driver-side key sample of size ~``num_buckets x
    samples_per_bucket`` (+ at most one key per block), independent of
    corpus row count."""
    n_rows = ds.count() or 0
    target = max(1, num_buckets * samples_per_bucket)
    sample_rate = min(1.0, target / max(1, n_rows))

    def sample_keys(batch: pa.Table) -> pa.Table:
        keys = _composite_key(batch, key_cols)
        n = max(1, int(len(keys) * sample_rate))
        step = max(1, len(keys) // n)
        return pa.table({"key": keys.take(np.arange(0, len(keys), step))})

    sampled = ds.map_batches(sample_keys, batch_format="pyarrow").take_all()
    return sorted(r["key"] for r in sampled)


def assign_doc_ids(
    ds: ray.data.Dataset,
    key_cols: tuple[str, ...] = DEFAULT_KEY,
    num_buckets: int | None = None,
    samples_per_bucket: int = 64,
) -> ray.data.Dataset:
    """Add a dense int64 ``doc_id`` column ordered by ``key_cols``.

    The driver-side boundary sample is O(buckets), not O(corpus): the
    per-batch stride is scaled so the whole pass yields ~``num_buckets x
    samples_per_bucket`` keys (plus one per block — blocks are O(corpus
    bytes / block size), not O(rows)).  ``ds.count()`` is metadata-only
    for parquet sources, the input shape at real scale."""
    if num_buckets is None:
        # ~128 MiB of input per bucket keeps one bucket within a worker heap;
        # floor of 8 keeps small inputs parallel.
        nbytes = ds.size_bytes() or 0
        num_buckets = max(8, int(nbytes // (128 << 20)) + 1)

    # 1. boundary sample (driver-side take of keys only, capped at
    #    ~samples_per_bucket keys per bucket regardless of corpus rows)
    keys_sorted = boundary_sample(ds, key_cols, num_buckets,
                                  samples_per_bucket)
    if keys_sorted:
        idx = np.linspace(0, len(keys_sorted) - 1, num_buckets + 1).astype(int)[1:-1]
        boundaries = sorted(set(keys_sorted[i] for i in idx))
    else:
        boundaries = []
    boundary_arr = np.array(boundaries, dtype=object)

    def add_bucket(batch: pa.Table) -> pa.Table:
        keys = _composite_key(batch, key_cols)
        keys_np = keys.to_numpy(zero_copy_only=False)
        buckets = np.searchsorted(boundary_arr, keys_np,
                                  side="right").astype(np.int32)
        return batch.append_column("_key", keys).append_column(
            "_bucket", pa.array(buckets)
        )

    keyed = ds.map_batches(add_bucket, batch_format="pyarrow")

    # 2. per-bucket counts -> base offsets (tiny; num_buckets rows)
    counts = keyed.groupby("_bucket").count().take_all()
    counts_by_bucket = {r["_bucket"]: r["count()"] for r in counts}
    bases = {}
    running = 0
    for b in sorted(counts_by_bucket):
        bases[b] = running
        running += counts_by_bucket[b]

    # 3. sort within bucket, assign base + arange
    def assign(group: pa.Table) -> pa.Table:
        bucket = group.column("_bucket")[0].as_py()
        order = pc.sort_indices(group, sort_keys=[("_key", "ascending")])
        group = group.take(order)
        base = bases[bucket]
        ids = pa.array(np.arange(base, base + len(group), dtype=np.int64))
        group = group.append_column("doc_id", ids)
        return group.drop_columns(["_key", "_bucket"])

    return keyed.groupby("_bucket").map_groups(assign, batch_format="pyarrow")
