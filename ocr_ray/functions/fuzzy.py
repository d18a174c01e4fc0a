"""Vectorized string-similarity kernels (edit distance).

The scale shape is a *fuzzy semi join with broadcast probes*: a small probe
set ships once (``ray.put``), the big side streams through ``map_batches``,
and each batch computes distances to every probe with a numpy
dynamic-program vectorized over the BATCH dimension — no Python loop over
rows. Cost per (batch, probe) is ``O(max_len * probe_len)`` vector ops.

Semantics: unit-cost Levenshtein (insert / delete / substitute = 1) over
UTF-8 *bytes* — which is exactly DuckDB's ``levenshtein()`` semantics
(measured: ``levenshtein('café','cafe') = 2``), so the oracle comparison
is byte-for-byte on any input, ASCII or not.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _padded_bytes(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(matrix[n, max_len] of uint8, lengths[n]) from a pa.StringArray,
    built from the Arrow buffers without a per-row Python loop."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    n = len(arr)
    odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(
        arr.buffers()[1], dtype=odt, count=n + 1, offset=arr.offset * np.dtype(odt).itemsize
    )
    lens = (offs[1:] - offs[:-1]).astype(np.int64)
    if arr.buffers()[2] is None or n == 0:
        return np.zeros((n, 0), dtype=np.uint8), lens
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    max_len = int(lens.max()) if n else 0
    if max_len == 0:
        return np.zeros((n, 0), dtype=np.uint8), lens
    idx = offs[:-1].astype(np.int64)[:, None] + np.arange(max_len)[None, :]
    valid = np.arange(max_len)[None, :] < lens[:, None]
    mat = np.where(valid, data[np.minimum(idx, len(data) - 1)], 0).astype(np.uint8)
    return mat, lens


def levenshtein_to_probe(arr: pa.Array, probe: str) -> np.ndarray:
    """Levenshtein distance from every string in ``arr`` to ``probe``,
    vectorized over the batch.

    DP orientation: iterate the probe's characters (rows of the classic
    matrix); the in-row left-to-right dependency ``cur[j] = min(cur[j],
    cur[j-1]+1)`` is closed in one vector op via the standard
    ``min.accumulate(cur - arange) + arange`` identity.
    """
    mat, lens = _padded_bytes(arr)
    n, L = mat.shape
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    p = np.frombuffer(probe.encode("utf-8"), dtype=np.uint8)
    m = len(p)
    ar = np.arange(L + 1, dtype=np.int64)
    # dp over candidate positions j = 0..L for all rows at once
    prev = np.broadcast_to(ar, (n, L + 1)).copy()
    for i in range(1, m + 1):
        sub = prev[:, :-1] + (mat != p[i - 1])  # substitution / match
        ins = prev[:, 1:] + 1  # insertion (into probe axis)
        cand = np.minimum(sub, ins)
        cur = np.empty_like(prev)
        cur[:, 0] = i
        cur[:, 1:] = cand
        cur = np.minimum.accumulate(cur - ar, axis=1) + ar
        prev = cur
    return prev[np.arange(n), lens]
