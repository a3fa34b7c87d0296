"""Vectorized VByte (variable-byte) integer codec.

The reference encodes postings as fixed 4-byte little-endian ints with gap
(delta) encoding (/root/reference/engine/indexing/spimi.py:145-187).  Per the
north rule we keep the gap encoding but compress with VByte: each integer is
written as 1-10 bytes, 7 payload bits per byte, high bit set on continuation
bytes (little-endian groups; the final byte of each integer has high bit 0).

Both encode and decode are numpy-vectorized — no Python loop over values;
the decode loop runs at most ``max_bytes_per_value`` (≤10) numpy passes.
"""

from __future__ import annotations

import numpy as np


def encoded_lengths(values: np.ndarray) -> np.ndarray:
    """Byte length of each value's VByte encoding (vectorized)."""
    v = values.astype(np.uint64, copy=False)
    lengths = np.ones(v.shape, dtype=np.int64)
    threshold = np.uint64(128)
    work = v.copy()
    while True:
        mask = work >= threshold
        if not mask.any():
            break
        lengths[mask] += 1
        work[mask] >>= np.uint64(7)
    return lengths


def encode(values: np.ndarray, lengths: np.ndarray | None = None) -> bytes:
    """VByte-encode an array of non-negative integers.  Pass precomputed
    ``lengths`` (from ``encoded_lengths``) to avoid recomputing them."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    if lengths is None:
        lengths = encoded_lengths(v)
    total = int(lengths.sum())
    out = np.empty(total, dtype=np.uint8)
    # End offset of each value's byte group; bytes are little-endian within
    # the group, continuation bit on all but the last byte.
    ends = np.cumsum(lengths)
    starts = ends - lengths
    work = v.copy()
    # Round k writes byte k of every value that has at least k+1 bytes.
    max_len = int(lengths.max())
    idx = starts.copy()
    for k in range(max_len):
        alive = lengths > k
        byte_vals = (work[alive] & np.uint64(0x7F)).astype(np.uint8)
        is_last = (lengths[alive] - 1) == k
        byte_vals = np.where(is_last, byte_vals, byte_vals | np.uint8(0x80))
        out[idx[alive]] = byte_vals
        idx[alive] += 1
        work >>= np.uint64(7)
    return out.tobytes()


def decode(buf: bytes | memoryview | np.ndarray, count: int | None = None) -> np.ndarray:
    """Decode a VByte stream into a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = b < 128
    n_values = int(is_last.sum())
    # group id of each byte = number of terminators before it
    group = np.cumsum(is_last) - is_last  # 0-based group index per byte
    # position of each byte within its group
    starts_of_group = np.flatnonzero(np.concatenate(([True], is_last[:-1])))
    pos_in_group = np.arange(b.size) - starts_of_group[group]
    payload = (b & np.uint8(0x7F)).astype(np.uint64) << (
        np.uint64(7) * pos_in_group.astype(np.uint64)
    )
    out = np.zeros(n_values, dtype=np.uint64)
    np.add.at(out, group, payload)
    if count is not None and n_values != count:
        raise ValueError(f"expected {count} values, decoded {n_values}")
    return out
