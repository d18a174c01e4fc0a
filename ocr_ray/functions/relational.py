"""Relational building blocks over Ray Data: exact money arithmetic,
broadcast lookups, semi/anti joins.

Design rules for oracle parity and scale:

- **Exact money math.** 2-decimal columns are scaled to int64 "cents"
  before aggregation, summed exactly, and divided back at the end. The
  DuckDB oracle uses DECIMAL sums cast to DOUBLE — both sides produce the
  *same* nearest-double of the same exact rational, so value hashes match
  bit-for-bit (no float-summation-order drift).
- **Broadcast small sides.** Dimension tables / key sets ship once via
  ``ray.put`` and are read inside tasks — never a shuffle for a lookup
  (the reference's shared-table-by-pointer pattern,
  ``/root/reference/examples/smith-waterman/smithwaterman.c:334-344``,
  made explicit and distributed-safe).
- **Large-large joins** use ``Dataset.join`` (hash partitioned).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

INT64 = pa.int64()


def to_units(col: pa.ChunkedArray | pa.Array, decimals: int = 2) -> pa.ChunkedArray:
    """Scale an exact-decimal double column to integer units (e.g. cents)."""
    scaled = pc.multiply(col, pa.scalar(float(10**decimals)))
    return pc.cast(pc.round(scaled), INT64)


def units_to_double(values, decimals: int):
    """Integer units -> double, matching DECIMAL->DOUBLE casts in SQL."""
    return np.asarray(values, dtype=np.float64) / float(10**decimals)


def broadcast(obj) -> "ray.ObjectRef":
    """Put a small driver-side object in the object store once."""
    return ray.put(obj)


class BroadcastSemiFilter:
    """Actor-pool/task stage: keep rows whose ``key_col`` is (or is not) in a
    broadcast key set. The set is fetched from the object store once per
    actor/task instance, not per batch."""

    def __init__(self, keys_ref, key_col: str, *, anti: bool = False):
        self.keys = pa.array(sorted(ray.get(keys_ref)))
        self.key_col = key_col
        self.anti = anti

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[self.key_col], value_set=self.keys)
        if self.anti:
            mask = pc.invert(mask)
        return batch.filter(mask)


class BroadcastLookup:
    """Map-side hash lookup: append columns from a broadcast key->row dict.

    ``mapping_ref`` is a ray.put of ``dict[key, tuple]``; ``out_cols`` names
    and types the appended columns. Missing keys drop the row (inner-join
    semantics) — the reference's event-keyed assembly with a small side.
    """

    def __init__(self, mapping_ref, key_col: str, out_cols: list[tuple[str, pa.DataType]]):
        self.mapping = ray.get(mapping_ref)
        self.key_col = key_col
        self.out_cols = out_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch[self.key_col].to_pylist()
        hit = np.fromiter((k in self.mapping for k in keys), dtype=bool, count=len(keys))
        batch = batch.filter(pa.array(hit))
        rows = [self.mapping[k] for k, h in zip(keys, hit) if h]
        for i, (name, typ) in enumerate(self.out_cols):
            batch = batch.append_column(name, pa.array([r[i] for r in rows], type=typ))
        return batch
