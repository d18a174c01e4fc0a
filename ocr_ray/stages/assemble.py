"""Reading-order reassembly — the engine's one logical shuffle.

This re-expresses the reference's ordered dependence-slot assembly +
finish-scope barrier (signal frontier
``/root/reference/src/task/hc/hc-task.c:236-270``; finish latch
``/root/reference/src/event/hc/hc-event.c:271-307``) as a hash-bucketed
``groupby`` with a fully vectorized per-bucket body:

1. ``add_bucket`` tags every exploded span with
   ``bucket = hash64(doc_id) % num_buckets`` (stable across processes);
2. ``groupby('bucket').map_groups(reassemble_bucket)`` brings all spans of
   a document to one task (all docs of a bucket at once — *one* Python
   call per bucket, not per document), sorts by ``(doc_id, offset)`` with a
   deterministic tiebreak, re-indexes offsets 0..k-1, and implodes to the
   nested documents schema.

Scale note (100 TB): the only all-to-all exchange in the extraction
pipeline. ``num_buckets`` must be sized so one bucket's spans fit in a
worker's heap (buckets ~ total_bytes / 512 MB is a sane default);
pathological giant documents are pre-chunked upstream (skew handling,
SURVEY.md §7.4) so no single group exceeds a block.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ocr_ray.schema import KIND_DOC_SENTINEL
from ocr_ray.stages.explode import implode_spans

if True:  # typing-only import kept lazy for ray worker pickling
    import ray.data


def hash_bucket(ids: pa.ChunkedArray | pa.Array, num_buckets: int) -> np.ndarray:
    """Deterministic uint64 hash of a string column -> int32 bucket ids."""
    arr = np.asarray(ids.to_pylist() if hasattr(ids, "to_pylist") else ids, dtype=object)
    h = pd.util.hash_array(arr, categorize=False)
    return (h % np.uint64(num_buckets)).astype(np.int32)


def add_bucket(batch: pa.Table, *, num_buckets: int) -> pa.Table:
    return batch.append_column("bucket", pa.array(hash_bucket(batch["doc_id"], num_buckets)))


def reassemble_bucket(group: pa.Table) -> pa.Table:
    """Vectorized reassembly of every document in one hash bucket."""
    if group.num_rows == 0:
        return pa.table({"doc_id": pa.array([], type=pa.string())})
    tbl = group.drop_columns([c for c in ("bucket",) if c in group.column_names])
    tbl = tbl.sort_by(
        [("doc_id", "ascending"), ("offset", "ascending"), ("kind", "ascending"), ("media_ref", "ascending")]
    )
    doc_codes = pc.dictionary_encode(tbl["doc_id"]).combine_chunks()
    codes = doc_codes.indices.to_numpy(zero_copy_only=False)
    # Run boundaries over the sorted doc ids (runs are contiguous post-sort).
    change = np.flatnonzero(np.diff(codes)) + 1
    starts = np.concatenate([[0], change])
    counts = np.diff(np.concatenate([starts, [len(codes)]]))

    nonsent = pc.not_equal(tbl["kind"], KIND_DOC_SENTINEL).combine_chunks().to_numpy(
        zero_copy_only=False
    )
    span_counts = np.add.reduceat(nonsent.astype(np.int64), starts) if len(codes) else np.array([], dtype=np.int64)
    # reduceat quirk: a start index repeated at the end (single-row runs) is fine,
    # but reduceat over an empty array is not — guarded above.
    list_offsets = np.concatenate([[0], np.cumsum(span_counts)])

    span_tbl = tbl.filter(pa.array(nonsent))
    n_spans = span_tbl.num_rows
    new_offsets = (
        np.arange(n_spans, dtype=np.int32)
        - np.repeat(list_offsets[:-1], span_counts).astype(np.int32)
    )
    span_tbl = span_tbl.set_column(
        span_tbl.column_names.index("offset"), "offset", pa.array(new_offsets, type=pa.int32())
    )
    first_doc_ids = pc.take(tbl["doc_id"].combine_chunks(), pa.array(starts, type=pa.int64()))
    return implode_spans(first_doc_ids, span_tbl, list_offsets)


def reassemble(ds: "ray.data.Dataset", *, num_buckets: int = 64) -> "ray.data.Dataset":
    """Exploded spans Dataset -> nested documents Dataset (the shuffle)."""
    ds = ds.map_batches(
        add_bucket, batch_format="pyarrow", fn_kwargs={"num_buckets": num_buckets}
    )
    return ds.groupby("bucket").map_groups(reassemble_bucket, batch_format="pyarrow")
