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

from ocr_ray.schema import KIND_DOC_SENTINEL, SPAN_STRUCT
from ocr_ray.stages.explode import implode_spans

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # typing-only: annotations are strings, no runtime need
    import ray.data


def hash_bucket(ids: pa.ChunkedArray | pa.Array, num_buckets: int) -> np.ndarray:
    """Deterministic uint64 hash of a string column -> int32 bucket ids
    (shared with the resumable sink's partitioner — see functions/hashing)."""
    from ocr_ray.functions.hashing import doc_bucket

    return doc_bucket(ids, num_buckets)


def add_bucket(batch: pa.Table, *, num_buckets: int) -> pa.Table:
    return batch.append_column("bucket", pa.array(hash_bucket(batch["doc_id"], num_buckets)))


def _empty_docs() -> pa.Table:
    """Typed empty output: a zero-row group must still carry the spans
    column or the block stream (and any committed fragment) goes
    mixed-schema."""
    from ocr_ray.schema import DOCUMENTS_SCHEMA

    return DOCUMENTS_SCHEMA.empty_table()


def reassemble_bucket(group: pa.Table) -> pa.Table:
    """Vectorized reassembly of every document in one hash bucket."""
    if group.num_rows == 0:
        return _empty_docs()
    tbl = group.drop_columns([c for c in ("bucket",) if c in group.column_names])
    # text included: without it, spans equal in the first four keys would
    # keep nondeterministic shuffle arrival order (stable sort)
    tbl = tbl.sort_by(
        [
            ("doc_id", "ascending"),
            ("offset", "ascending"),
            ("kind", "ascending"),
            ("media_ref", "ascending"),
            ("text", "ascending"),
        ]
    )
    return _implode_sorted(tbl)


def assemble_local(batch: pa.Table) -> pa.Table:
    """Batch-local reassembly (the zero-shuffle path's kernel): sort by
    (dictionary-encoded doc code, offset) — two INT keys instead of the
    bucket path's string-led 4-key sort — then the same implode.
    ``(doc, offset)`` ties (degenerate duplicate offsets) fall back to the
    full-key sort so the deterministic tiebreak semantics are identical;
    output doc order is first-occurrence rather than lexicographic, which
    no downstream consumer depends on (nested rows; checksums are
    order-insensitive)."""
    if batch.num_rows == 0:
        return _empty_docs()
    codes = (
        pc.dictionary_encode(batch["doc_id"]).combine_chunks().indices
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    offs = batch["offset"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    key = (codes << np.int64(32)) | (offs + np.int64(1 << 31))
    order = np.argsort(key, kind="stable")
    sk = key[order]
    if len(sk) > 1 and (sk[1:] == sk[:-1]).any():  # dup (doc, offset):
        return reassemble_bucket(batch)  # full-key deterministic tiebreak
    tbl = batch.take(pa.array(order))
    return _implode_sorted(tbl)


def _implode_sorted(tbl: pa.Table) -> pa.Table:
    """Sorted exploded spans (doc runs contiguous, reading order within
    run) -> nested documents: run boundaries, sentinel drop, offset
    re-index, implode."""
    doc_codes = pc.dictionary_encode(tbl["doc_id"]).combine_chunks()
    codes = doc_codes.indices.to_numpy(zero_copy_only=False)
    # Run boundaries over the sorted doc ids (runs are contiguous post-sort).
    change = np.flatnonzero(np.diff(codes)) + 1
    starts = np.concatenate([[0], change])

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


def _with_sink(body, sink):
    """Wrap a per-bucket reassembly body so the bucket's nested output is
    committed to its fragment INSIDE the same group task (fused sink —
    bucket id == partition id, no extra shuffle between reassembly and
    write; the group result becomes the manifest row)."""
    if sink is None:
        return body

    def fused(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {
                    "partition": pa.array([], type=pa.int64()),
                    "row_count": pa.array([], type=pa.int64()),
                    "span_count": pa.array([], type=pa.int64()),
                }
            )
        part = int(group["bucket"][0].as_py())
        return sink.write(body(group), part)

    return fused


def reassemble(
    ds: "ray.data.Dataset", *, num_buckets: int = 64, sink=None
) -> "ray.data.Dataset":
    """Exploded spans Dataset -> nested documents Dataset (the shuffle).

    With ``sink`` (a ``ResumableSink``), each bucket is also written as
    output fragment ``bucket`` in the same task and the returned Dataset
    carries the manifest rows instead of the documents."""
    if sink is not None:
        from ocr_ray.state.manifest import _check_layout

        _check_layout(sink.out_dir, num_buckets, write=True)
    ds = ds.map_batches(
        add_bucket, batch_format="pyarrow", fn_kwargs={"num_buckets": num_buckets}
    )
    return ds.groupby("bucket").map_groups(
        _with_sink(reassemble_bucket, sink), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Two-phase (skew-safe) reassembly
# ---------------------------------------------------------------------------
#
# Pathological documents (100-1000x the median span count, per the f_skew
# fixture and SURVEY.md §7.5) would make single groups larger than a block.
# Phase 1 partial-assembles on the salted key (doc_id, chunk_id = offset //
# chunk_size) — bounded groups regardless of doc size; phase 2 merges the
# (few, large) chunk rows per document. This is the partial+final
# aggregation shape of the reference's nested finish scopes
# (/root/reference/src/task/hc/hc-task.c:168-215).


def add_chunk_bucket(batch: pa.Table, *, num_buckets: int, chunk_size: int) -> pa.Table:
    """Salted shuffle key: mix the doc hash with the chunk index numerically
    (no per-row string building) so one pathological document spreads over
    many buckets while (doc, chunk) stays co-located."""
    from ocr_ray.functions.hashing import hash_utf8_column, mix64

    offs = batch["offset"].combine_chunks().to_numpy(zero_copy_only=False)
    chunk = (offs.astype(np.int64) // chunk_size).astype(np.int32)
    ids = batch["doc_id"].combine_chunks()
    if pa.types.is_integer(ids.type):  # raw tables carry int64 doc ids
        h = mix64(ids.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64))
    else:
        h = mix64(hash_utf8_column(ids))
    with np.errstate(over="ignore"):
        salted = h ^ (chunk.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    out = batch.append_column("chunk_id", pa.array(chunk))
    return out.append_column(
        "bucket", pa.array((salted % np.uint64(num_buckets)).astype(np.int32))
    )


def partial_assemble_bucket(group: pa.Table) -> pa.Table:
    """Phase 1: one row per (doc_id, chunk_id) with its spans imploded in
    chunk-local order (original offsets preserved for the final merge)."""
    if group.num_rows == 0:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.string()),
                "chunk_id": pa.array([], type=pa.int32()),
                "spans": pa.array([], type=pa.large_list(SPAN_STRUCT)),
            }
        )
    tbl = group.drop_columns(["bucket"])
    tbl = tbl.sort_by(
        [
            ("doc_id", "ascending"),
            ("chunk_id", "ascending"),
            ("offset", "ascending"),
            ("kind", "ascending"),
            ("media_ref", "ascending"),
            ("text", "ascending"),
        ]
    )
    doc_codes = pc.dictionary_encode(tbl["doc_id"]).combine_chunks().indices.to_numpy(
        zero_copy_only=False
    )
    chunks = tbl["chunk_id"].combine_chunks().to_numpy(zero_copy_only=False)
    is_new = np.empty(len(doc_codes), dtype=bool)
    is_new[0] = True
    is_new[1:] = (doc_codes[1:] != doc_codes[:-1]) | (chunks[1:] != chunks[:-1])
    starts = np.flatnonzero(is_new)
    counts = np.diff(np.concatenate([starts, [len(doc_codes)]]))
    struct_arr = pa.StructArray.from_arrays(
        [
            tbl["kind"].combine_chunks(),
            tbl["text"].combine_chunks(),
            tbl["media_ref"].combine_chunks(),
            tbl["offset"].combine_chunks(),
        ],
        fields=list(SPAN_STRUCT),
    )
    list_offsets = np.concatenate([[0], np.cumsum(counts)])
    spans = pa.LargeListArray.from_arrays(pa.array(list_offsets, type=pa.int64()), struct_arr)
    return pa.table(
        {
            "doc_id": pc.take(tbl["doc_id"].combine_chunks(), pa.array(starts, type=pa.int64())),
            "chunk_id": pc.take(tbl["chunk_id"].combine_chunks(), pa.array(starts, type=pa.int64())),
            "spans": spans,
        }
    )


def merge_chunks_bucket(group: pa.Table) -> pa.Table:
    """Phase 2: merge a doc's chunk rows (sorted by chunk_id) into the final
    nested row — drop sentinels, re-index offsets 0..k-1."""
    if group.num_rows == 0:
        return _empty_docs()
    tbl = group.drop_columns([c for c in ("bucket",) if c in group.column_names])
    tbl = tbl.sort_by([("doc_id", "ascending"), ("chunk_id", "ascending")])
    doc_codes = pc.dictionary_encode(tbl["doc_id"]).combine_chunks().indices.to_numpy(
        zero_copy_only=False
    )
    change = np.flatnonzero(np.diff(doc_codes)) + 1
    doc_starts = np.concatenate([[0], change])  # row index of each doc's first chunk

    spans = tbl["spans"].combine_chunks()
    row_lens = pc.list_value_length(spans).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(spans)  # struct array, already in final order
    kind = pc.struct_field(flat, "kind")
    nonsent = pc.not_equal(kind, KIND_DOC_SENTINEL).to_numpy(zero_copy_only=False)

    # map each flat span to its doc run
    row_doc = np.zeros(len(doc_codes), dtype=np.int64)
    row_doc[doc_starts[1:]] = 1
    row_doc = np.cumsum(row_doc)
    flat_doc = np.repeat(row_doc, row_lens)
    n_docs = len(doc_starts)
    span_counts = np.bincount(flat_doc[nonsent], minlength=n_docs).astype(np.int64)
    list_offsets = np.concatenate([[0], np.cumsum(span_counts)])

    keep_flat = pa.array(nonsent)
    kept = pa.table(
        {
            "kind": pc.filter(kind, keep_flat),
            "text": pc.filter(pc.struct_field(flat, "text"), keep_flat),
            "media_ref": pc.filter(pc.struct_field(flat, "media_ref"), keep_flat),
        }
    )
    new_offsets = (
        np.arange(int(span_counts.sum()), dtype=np.int32)
        - np.repeat(list_offsets[:-1], span_counts).astype(np.int32)
    )
    struct_arr = pa.StructArray.from_arrays(
        [
            kept["kind"].combine_chunks(),
            kept["text"].combine_chunks(),
            kept["media_ref"].combine_chunks(),
            pa.array(new_offsets, type=pa.int32()),
        ],
        fields=list(SPAN_STRUCT),
    )
    spans_out = pa.LargeListArray.from_arrays(pa.array(list_offsets, type=pa.int64()), struct_arr)
    first_doc_ids = pc.take(
        tbl["doc_id"].combine_chunks(), pa.array(doc_starts, type=pa.int64())
    )
    return pa.table({"doc_id": first_doc_ids, "spans": spans_out})


def reassemble_two_phase(
    ds: "ray.data.Dataset",
    *,
    num_buckets: int = 64,
    chunk_size: int = 1024,
    final_buckets: int | None = None,
    sink=None,
) -> "ray.data.Dataset":
    """Skew-safe reassembly: chunk-level partial assembly, then doc-level
    merge. Two bounded shuffles instead of one unbounded-group shuffle.
    ``final_buckets`` sets the doc-level bucket count (== output fragment
    count when ``sink`` is given)."""
    ds = ds.map_batches(
        add_chunk_bucket,
        batch_format="pyarrow",
        fn_kwargs={"num_buckets": num_buckets, "chunk_size": chunk_size},
    )
    partial = ds.groupby("bucket").map_groups(partial_assemble_bucket, batch_format="pyarrow")
    nb2 = final_buckets if final_buckets is not None else max(num_buckets // 4, 1)
    if sink is not None:
        from ocr_ray.state.manifest import _check_layout

        _check_layout(sink.out_dir, nb2, write=True)
    partial = partial.map_batches(
        add_bucket, batch_format="pyarrow", fn_kwargs={"num_buckets": nb2}
    )
    return partial.groupby("bucket").map_groups(
        _with_sink(merge_chunks_bucket, sink), batch_format="pyarrow"
    )
