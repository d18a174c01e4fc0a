"""Explode nested documents into per-span rows, and the inverse.

The exploded form is the engine's inter-stage currency (SURVEY.md §7.1):
Ray Data shuffles rows, and vectorized Arrow kernels want flat columns.
Both directions are zero-copy-ish Arrow (``list_flatten`` +
``list_parent_indices`` / ``LargeListArray.from_arrays``) — no Python per
row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ocr_ray.schema import SPAN_STRUCT


def explode_documents(batch: pa.Table, *, sentinels: bool = True) -> pa.Table:
    """(doc_id, spans[list<struct>]) -> one row per span, plus (by default)
    one ``kind='__doc__'`` sentinel row per document.

    The sentinel (offset ``SENTINEL_OFFSET``, sorts last) guarantees every
    input document reappears exactly once at reassembly even if all its
    spans are filtered away. Pass ``sentinels=False`` for a plain explode
    (e.g. producing flat output tables). Output columns: doc_id, kind,
    text, media_ref, offset and, when the span struct carries one, payload.
    """
    from ocr_ray.schema import KIND_DOC_SENTINEL, SENTINEL_OFFSET

    spans = batch["spans"].combine_chunks()
    parent = pc.list_parent_indices(spans)
    doc_id = pc.take(batch["doc_id"].combine_chunks(), parent)
    flat = pc.list_flatten(spans)
    cols: dict[str, pa.Array] = {"doc_id": doc_id}
    names = [f.name for f in flat.type] if pa.types.is_struct(flat.type) else []
    for name in names:
        cols[name] = pc.struct_field(flat, name)
    exploded = pa.table(cols)
    if not sentinels:
        return exploded

    # Sentinel rows: one per input document.
    n_docs = batch.num_rows
    sent_cols: dict[str, pa.Array] = {
        "doc_id": batch["doc_id"].combine_chunks(),
        "kind": pa.array([KIND_DOC_SENTINEL] * n_docs, type=pa.string()),
        "text": pa.array([""] * n_docs, type=pa.string()),
        "media_ref": pa.array([""] * n_docs, type=pa.string()),
        "offset": pa.array(np.full(n_docs, SENTINEL_OFFSET, dtype=np.int32)),
    }
    if "payload" in names:
        sent_cols["payload"] = pa.array([None] * n_docs, type=exploded["payload"].type)
    sentinels = pa.table({n: sent_cols[n] for n in exploded.column_names})
    return pa.concat_tables([exploded, sentinels])


def implode_spans(
    doc_ids: pa.Array | np.ndarray,
    span_table: pa.Table,
    list_offsets: np.ndarray,
) -> pa.Table:
    """Build the nested documents table from sorted exploded spans.

    ``list_offsets`` is the (n_docs + 1,) int64 boundary array into
    ``span_table`` rows; rows must already be in final span order.
    """
    struct_arr = pa.StructArray.from_arrays(
        [
            span_table["kind"].combine_chunks(),
            span_table["text"].combine_chunks(),
            span_table["media_ref"].combine_chunks(),
            span_table["offset"].combine_chunks(),
        ],
        fields=list(SPAN_STRUCT),
    )
    spans = pa.LargeListArray.from_arrays(pa.array(list_offsets, type=pa.int64()), struct_arr)
    if not isinstance(doc_ids, (pa.Array, pa.ChunkedArray)):
        doc_ids = pa.array(doc_ids, type=pa.string())
    return pa.table({"doc_id": doc_ids, "spans": spans})
