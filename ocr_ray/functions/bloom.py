"""Bloom-filter semi join: the scale path when the key side is too large
to broadcast exactly.

Shape (all distributed, one key shuffle total):

1. **Partial blooms** — each block of the key side builds a local bitset
   (``map_batches``); the fixed-size partials (``num_bits/8`` bytes each,
   independent of row count) OR-merge on the driver and ship once via
   ``ray.put``. This is the mergeable-sketch pattern: driver input is
   bounded by ``blocks x filter size``, never by key cardinality.
2. **Prefilter** — the big side streams through a task-pool ``map_batches``
   testing membership vectorized (double hashing, Kirsch–Mitzenmacher
   ``h1 + i*h2``); only survivors (true matches + ~``fpp`` false
   positives) continue.
3. **Exact verify** — survivors co-group with the key side through ONE
   bucketed shuffle (same machinery as every groupby here) and each bucket
   keeps left rows whose key is present — false positives die here, so the
   result is exactly the semi join.

The end-to-end result is byte-identical to a plain semi join; the bloom
stage only cuts the shuffle volume of step 3 by ~``|left|/|matches|``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ocr_ray.functions.relational import _key_hash, _prepared


def _hash_pair(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    h1 = pd.util.hash_array(vals, categorize=False)
    h2 = (h1 >> np.uint64(29)) | np.uint64(1)  # odd -> full-period stride
    return h1, h2


def _col_values(col) -> np.ndarray:
    if pa.types.is_integer(col.type) or pa.types.is_floating(col.type):
        return col.to_numpy(zero_copy_only=False)
    return np.asarray(col.to_pylist(), dtype=object)


def bloom_partial(col, num_bits: int, num_hashes: int) -> np.ndarray:
    """Local bloom bitset (uint64 words) for one batch's key column."""
    words = np.zeros(num_bits // 64, dtype=np.uint64)
    if len(col) == 0:
        return words
    h1, h2 = _hash_pair(_col_values(col))
    for i in range(num_hashes):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(num_bits)
        np.bitwise_or.at(words, (idx >> np.uint64(6)).astype(np.int64), np.uint64(1) << (idx & np.uint64(63)))
    return words


def bloom_contains(words: np.ndarray, col, num_bits: int, num_hashes: int) -> np.ndarray:
    """Vectorized may-contain mask for a batch's key column."""
    if len(col) == 0:
        return np.zeros(0, dtype=bool)
    h1, h2 = _hash_pair(_col_values(col))
    mask = np.ones(len(h1), dtype=bool)
    for i in range(num_hashes):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(num_bits)
        bit = (words[(idx >> np.uint64(6)).astype(np.int64)] >> (idx & np.uint64(63))) & np.uint64(1)
        mask &= bit.astype(bool)
    return mask


def build_bloom(keys_ds, key_col: str, *, num_bits: int = 1 << 20, num_hashes: int = 4):
    """Distributed bloom build: per-block partials, driver OR-merge,
    returns a ``ray.put`` ref of the packed words."""

    def partial(t: pa.Table) -> pa.Table:
        w = bloom_partial(t[key_col], num_bits, num_hashes)
        return pa.table({"words": pa.array([w.tobytes()], type=pa.binary())})

    merged = np.zeros(num_bits // 64, dtype=np.uint64)
    for blob in keys_ds.map_batches(partial, batch_format="pyarrow").take_all():
        merged |= np.frombuffer(blob["words"], dtype=np.uint64)
    return ray.put(merged)


def bloom_semi_join(
    left,
    keys_ds,
    *,
    on: str,
    right_on: str | None = None,
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
    num_buckets: int = 32,
    left_schema: pa.Schema | None = None,
):
    """Exact semi join of ``left`` against a large key Dataset, bloom-
    prefiltered. See module docstring for the three stages."""
    right_on = right_on or on
    bloom_ref = build_bloom(keys_ds, right_on, num_bits=num_bits, num_hashes=num_hashes)

    def prefilter(t: pa.Table) -> pa.Table:
        words = _prepared(("bloom", bloom_ref.hex()), lambda: ray.get(bloom_ref))
        return t.filter(pa.array(bloom_contains(words, t[on], num_bits, num_hashes)))

    survivors = left.map_batches(prefilter, batch_format="pyarrow")

    # exact verify: tag sides, ONE bucketed co-group, keep left rows whose
    # key appears on the right side of the same bucket.
    lschema = left_schema if left_schema is not None else left.schema()
    lnames = list(lschema.names)

    def tag_left(t: pa.Table) -> pa.Table:
        out = t.append_column("_side", pa.array(np.zeros(t.num_rows, dtype=np.int8)))
        return out.append_column("_bucket", pa.array(_key_hash(t[on], num_buckets)))

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {}
        for name, typ in zip(lschema.names, lschema.types):
            if name == on:
                cols[name] = pc.cast(t[right_on], typ)
            else:
                cols[name] = pa.nulls(n, type=typ)
        out = pa.table(cols)
        out = out.append_column("_side", pa.array(np.ones(n, dtype=np.int8)))
        return out.append_column("_bucket", pa.array(_key_hash(t[right_on], num_buckets)))

    both = survivors.map_batches(tag_left, batch_format="pyarrow").union(
        keys_ds.map_batches(tag_right, batch_format="pyarrow")
    )

    def body(g: pa.Table) -> pa.Table:
        lt = g.filter(pc.equal(g["_side"], 0)).select(lnames)
        rkeys = pc.unique(g.filter(pc.equal(g["_side"], 1))[on])
        return lt.filter(pc.is_in(lt[on], value_set=rkeys))

    return both.groupby("_bucket").map_groups(body, batch_format="pyarrow")


def bloom_anti_join(
    left,
    keys_ds,
    *,
    on: str,
    right_on: str | None = None,
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
    num_buckets: int = 32,
    left_schema: pa.Schema | None = None,
):
    """Exact ANTI join of ``left`` against a large (non-broadcastable) key
    Dataset. The bloom filter works in reverse here: a bloom-NEGATIVE row
    is *definitely* absent from the key set and passes the anti join with
    no shuffle at all; only bloom-positive rows (true matches + the small
    false-positive fraction) go through the exact bucketed co-group,
    which keeps those whose key does NOT appear on the right side.
    Output = negatives ∪ exact-anti(positives); rows shuffle only if the
    bloom says they might match."""
    right_on = right_on or on
    bloom_ref = build_bloom(keys_ds, right_on, num_bits=num_bits, num_hashes=num_hashes)

    def split(want_positive: bool):
        def fn(t: pa.Table) -> pa.Table:
            words = _prepared(("bloom", bloom_ref.hex()), lambda: ray.get(bloom_ref))
            hit = bloom_contains(words, t[on], num_bits, num_hashes)
            return t.filter(pa.array(hit if want_positive else ~hit))

        return fn

    negatives = left.map_batches(split(False), batch_format="pyarrow")
    positives = left.map_batches(split(True), batch_format="pyarrow")

    lschema = left_schema if left_schema is not None else left.schema()
    lnames = list(lschema.names)

    def tag_left(t: pa.Table) -> pa.Table:
        out = t.append_column("_side", pa.array(np.zeros(t.num_rows, dtype=np.int8)))
        return out.append_column("_bucket", pa.array(_key_hash(t[on], num_buckets)))

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {}
        for name, typ in zip(lschema.names, lschema.types):
            if name == on:
                cols[name] = pc.cast(t[right_on], typ)
            else:
                cols[name] = pa.nulls(n, type=typ)
        out = pa.table(cols)
        out = out.append_column("_side", pa.array(np.ones(n, dtype=np.int8)))
        return out.append_column("_bucket", pa.array(_key_hash(t[right_on], num_buckets)))

    both = positives.map_batches(tag_left, batch_format="pyarrow").union(
        keys_ds.map_batches(tag_right, batch_format="pyarrow")
    )

    def body(g: pa.Table) -> pa.Table:
        lt = g.filter(pc.equal(g["_side"], 0)).select(lnames)
        rkeys = pc.unique(g.filter(pc.equal(g["_side"], 1))[on])
        return lt.filter(pc.invert(pc.is_in(lt[on], value_set=rkeys)))

    exact = both.groupby("_bucket").map_groups(body, batch_format="pyarrow")
    return negatives.union(exact)
