"""Vectorized string hashing for partitioning and checksums.

One implementation shared by the reassembly bucketer, the resumable-sink
partitioner and the lineage checksum, so "which fragment owns doc X" has
exactly one answer everywhere — the engine's analogue of the reference's
single GUID provider behind every runtime object
(``/root/reference/src/guid/ptr/ptr-guid.c:27-52``): one authority for
identity, here for placement. The single-assignment invariant (a doc in
exactly one fragment; sticky events assert on double-put,
``/root/reference/src/event/hc/hc-event.c:176-208``) depends on it.
Hashes are computed straight off Arrow utf8 value buffers — no Python
string materialization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_BASE = np.uint64(1_000_003)
_EMPTY_SEED = np.uint64(0x9E3779B97F4A7C15)


def hash_utf8_column(arr) -> np.ndarray:
    """Per-row uint64 polynomial hash of a string/binary Arrow array.

    Implementation note: iterates over CHARACTER POSITIONS (rows sorted by
    length, so position ``i`` touches a shrinking suffix — total work is
    ``sum(lens)``) instead of materializing flat position/power/term arrays
    over every byte. The flat formulation allocated 4x8-byte temporaries
    per input byte; on this host, *fresh* large allocations intermittently
    fault in ~1000x slower than steady-state (hypervisor memory stalls
    measured via paired fresh/warm numpy runs), which made the old
    checksum path the dominant serial cost of the extraction sink. The
    per-position loop keeps temporaries ~row-count-sized (malloc-recycled
    across iterations), at identical output values.
    """
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if arr.buffers()[2] is None:
        # all-null/all-empty arrays (e.g. pa.nulls) carry no data buffer
        return np.full(n, _EMPTY_SEED, dtype=np.uint64)
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lens = np.diff(offs)
    if int(lens.sum()) == 0:
        return np.full(n, _EMPTY_SEED, dtype=np.uint64)
    order = np.argsort(lens, kind="stable")
    sstarts = offs[:-1][order]
    slens = lens[order]
    max_len = int(slens[-1])
    acc = np.zeros(n, dtype=np.uint64)
    p = np.uint64(1)
    with np.errstate(over="ignore"):
        for i in range(max_len):
            k0 = int(np.searchsorted(slens, i, side="right"))  # first row with len > i
            acc[k0:] += data[sstarts[k0:] + i].astype(np.uint64) * p
            p = p * _BASE
    out = np.empty(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        out[order] = _EMPTY_SEED + acc
    return out


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — spreads the polynomial hash before modulo."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def doc_bucket(doc_ids, num_buckets: int) -> np.ndarray:
    """THE doc_id -> bucket/partition function (int32). Used by reassembly
    bucketing AND the resumable sink's partition filter — identical by
    construction. Accepts string OR integer id columns (raw tables carry
    int64 doc ids; the extraction corpus carries 'doc-...' strings)."""
    if not isinstance(doc_ids, (pa.Array, pa.ChunkedArray)):
        doc_ids = pa.array(list(doc_ids))
    typ = doc_ids.type
    if pa.types.is_integer(typ):
        h = mix64(
            doc_ids.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        )
    else:
        h = mix64(hash_utf8_column(doc_ids))
    return (h % np.uint64(num_buckets)).astype(np.int32)


def _spread16(x: np.ndarray) -> np.ndarray:
    """Interleave-prep: spread each 16-bit value's bits into the even bit
    positions of a 32-bit lane (classic Morton bit tricks, vectorized)."""
    x = x.astype(np.uint64)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x33333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x55555555)
    return x


def morton_code(
    a: np.ndarray,
    b: np.ndarray,
    *,
    bounds_a: tuple,
    bounds_b: tuple,
) -> np.ndarray:
    """Z-ORDER (Morton) code of two numeric columns: each is normalized
    to 16 bits against its EXPLICIT global [lo, hi] bounds, then
    bit-interleaved into one uint32 key. Sorting by this key clusters
    rows so that BOTH columns are locally contiguous — per-fragment
    min/max stats then prune range predicates on either column, which no
    single-column sort can do.

    Bounds are required, not inferred: callers run inside map_batches,
    and per-batch min/max would normalize every batch differently and
    break the global ordering. Normalization is linear (skew caveat:
    heavily skewed columns deserve a quantile-rank transform first)."""

    def norm16(v: np.ndarray, lo: float, hi: float) -> np.ndarray:
        v = v.astype(np.float64)
        return np.clip((v - lo) / max(hi - lo, 1e-300) * 65535, 0, 65535).astype(
            np.uint64
        )

    return (
        _spread16(norm16(a, *map(float, bounds_a)))
        | (_spread16(norm16(b, *map(float, bounds_b))) << np.uint64(1))
    ).astype(np.int64)
