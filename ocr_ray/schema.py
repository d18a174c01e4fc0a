"""Canonical Arrow schemas and the span-sequence equality invariant.

The reference's data plane is untyped bytes behind GUIDs (datablocks,
``/root/reference/inc/ocr-db.h:22-41``); this engine replaces byte-casting
with explicit Arrow schemas validated at stage boundaries, per
``BASELINE.json`` ``input_hint``:

    documents(doc_id: string,
              spans: large_list<struct<kind: string, text: string,
                                       media_ref: string, offset: int32>>)

Between stages the engine uses the *exploded* per-span form
``(doc_id, kind, text, media_ref, offset [, payload])`` — one Arrow row per
span — which is what Ray Data shuffles and vectorized kernels want.

The per-row correctness invariant carried over from the reference's
ordered dependence-slot semantics (signal frontier,
``/root/reference/src/task/hc/hc-task.c:236-270``) is span-sequence
equality ``(kind, text, media_ref, order)`` per ``doc_id`` —
implemented here as both the test-oracle predicate and the reassembly
postcondition.
"""

from __future__ import annotations

import pyarrow as pa

# Span kinds.
KIND_TEXT = "text"
KIND_MEDIA = "media"
KIND_BOILERPLATE = "boilerplate"
KIND_GLYPHS = "glyphs"

#: Per-document presence sentinel emitted by the explode stage — the row-level
#: analogue of the reference's finish-latch (one completion token per scope,
#: ``/root/reference/src/event/hc/hc-event.c:271-307``). It survives every
#: filter so that a document whose spans are all stripped still appears in
#: the reassembled output exactly once (single-assignment invariant).
KIND_DOC_SENTINEL = "__doc__"
SENTINEL_OFFSET = 2**31 - 1

SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)

#: Nested (document-level) schema — the engine's input/output table shape.
DOCUMENTS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.large_list(SPAN_STRUCT)),
    ]
)

#: Exploded (span-level) schema used between stages.
SPANS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)

#: Exploded schema on the decode path (glyph spans carry an encoded payload).
SPANS_PAYLOAD_SCHEMA = SPANS_SCHEMA.append(pa.field("payload", pa.large_binary()))


class SchemaError(ValueError):
    """Raised when a table violates the canonical schema (the analogue of the
    reference's ``*_MustFailRun`` arity/type assertion tests,
    ``/root/reference/tests/non-regression-tests/edt/``)."""


def validate_documents_schema(table: pa.Table) -> None:
    """Loudly reject tables that do not conform to ``DOCUMENTS_SCHEMA``."""
    names = set(table.schema.names)
    missing = {"doc_id", "spans"} - names
    if missing:
        raise SchemaError(f"documents table missing columns: {sorted(missing)}")
    if not pa.types.is_string(table.schema.field("doc_id").type):
        raise SchemaError(f"doc_id must be string, got {table.schema.field('doc_id').type}")
    spans_t = table.schema.field("spans").type
    if not (pa.types.is_large_list(spans_t) or pa.types.is_list(spans_t)):
        raise SchemaError(f"spans must be a list type, got {spans_t}")
    value_t = spans_t.value_type
    if not pa.types.is_struct(value_t):
        raise SchemaError(f"spans values must be struct, got {value_t}")
    fields = {value_t.field(i).name: value_t.field(i).type for i in range(value_t.num_fields)}
    for req, typ in (
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ):
        if req not in fields:
            raise SchemaError(f"span struct missing field {req!r}")
        if fields[req] != typ:
            raise SchemaError(f"span field {req!r} must be {typ}, got {fields[req]}")


def validate_spans_schema(table: pa.Table, payload: bool = False) -> None:
    """Validate the exploded span-level schema at a stage boundary."""
    want = SPANS_PAYLOAD_SCHEMA if payload else SPANS_SCHEMA
    names = set(table.schema.names)
    missing = set(want.names) - names
    if missing:
        raise SchemaError(f"span table missing columns: {sorted(missing)}")
    for field in want:
        got = table.schema.field(field.name).type
        ok = got == field.type or (
            field.name == "payload" and pa.types.is_binary(got)
        )
        if not ok:
            raise SchemaError(f"span column {field.name!r} must be {field.type}, got {got}")


def span_key(span: dict) -> tuple:
    """The order-sensitive identity of one span for the equality invariant."""
    return (span["kind"], span["text"], span["media_ref"])


def span_sequences_equal(a: list[dict], b: list[dict]) -> bool:
    """Span-sequence equality ``(kind, text, media_ref, order)`` for one doc.

    ``offset`` participates as *order* (relative position), not value — two
    sequences with identical spans in identical order are equal even if
    their absolute offsets differ (offsets are re-indexed by extraction).
    """
    if len(a) != len(b):
        return False
    return all(span_key(x) == span_key(y) for x, y in zip(a, b))


def docs_table_to_dict(table: pa.Table) -> dict[str, list[dict]]:
    """Nested documents table -> {doc_id: [span dicts in sequence order]}."""
    out: dict[str, list[dict]] = {}
    for row in table.select(["doc_id", "spans"]).to_pylist():
        out[row["doc_id"]] = list(row["spans"] or [])
    return out
