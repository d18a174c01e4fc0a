"""Mixed-format extraction: ONE pipeline over a corpus whose documents
arrive in different formats (HTML page, typeset PDF, WARC archive).

Real web-scale corpora are format-heterogeneous; a per-format pipeline
would force a driver-side split or three passes over the input. This
stage closes that gap on top of the three existing single-format legs
(``stages/html.py``, ``stages/pdf.py``, ``stages/warc.py``):

- ``attach_mixed_payloads`` (fixture): rotates each interleaved-corpus
  document through the three formats by its numeric id (d % 3 -> HTML /
  PDF / single-document WARC archive). No format column is emitted — the
  payload bytes are the only evidence.
- ``MixedSpanExtractor`` (actor pool): detects the format per payload by
  CONTENT (magic bytes: ``%PDF-`` -> PDF, ``WARC/1.0`` -> WARC, else
  HTML — the order a real ingest pipeline sniffs), routes each document
  through the matching parser stack, and emits the flagship flat span
  schema (doc_id, kind, text, media_ref, offset). All three routes must
  agree with the flagship ``extract_spans`` oracle bit-exactly.

Scale shape: identical to the single-format legs — fixture attach is a
task-pool ``map_batches``, extraction an actor pool over small pyarrow
batches of wide binary rows; detection is O(16 bytes) per document, so
heterogeneity costs nothing beyond the per-format parse itself.

Reference parity note: the reference runtime (pombreda/ocr) has no
format layer; this module serves the BASELINE.json north rule
(main-content extraction over interleaved web corpora).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MIXED_FORMATS = ("html", "pdf", "warc")


def mixed_format_for(doc_id_s: str) -> str:
    """Deterministic format rotation by the numeric doc-id suffix."""
    return MIXED_FORMATS[int(doc_id_s.rsplit("-", 1)[-1]) % 3]


def detect_payload_format(payload: bytes) -> str:
    """Content-based format detection (magic bytes), the way a real
    ingest pipeline routes heterogeneous crawl output. HTML is the
    fallback: it has no reliable magic (fragments are legal pages)."""
    if payload.startswith(b"%PDF-"):
        return "pdf"
    if payload.startswith(b"WARC/"):
        return "warc"
    return "html"


def attach_mixed_payloads(batch: pa.Table) -> pa.Table:
    """Fixture stage: nested (doc_id, spans) -> (doc_id, payload) where
    the payload format rotates HTML / PDF / WARC by doc id. The spans
    column is dropped — downstream recovers the sequence from the
    format alone (and must detect WHICH format first)."""
    from ocr_ray.stages.html import render_span_html
    from ocr_ray.stages.pdf import encode_span_pdf
    from ocr_ray.stages.warc import build_warc_from_pages

    ids = batch["doc_id"].to_pylist()
    payloads: list[bytes] = []
    for i, sp in zip(ids, batch["spans"].to_pylist()):
        fmt = mixed_format_for(i)
        if fmt == "html":
            payloads.append(render_span_html(i, sp).encode("utf-8"))
        elif fmt == "pdf":
            payloads.append(encode_span_pdf(i, sp))
        else:  # single-document archive: the unit a crawler hands over
            payloads.append(build_warc_from_pages([i], [render_span_html(i, sp)]))
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.string()),
            "payload": pa.array(payloads, type=pa.large_binary()),
        }
    )


class MixedSpanExtractor:
    """Decode/extract stage (task-pooled with per-worker instance reuse via ``stateless_stage`` — an actor pool would pay its spin-up per query): sniff each payload's format, route it through
    the matching parser stack (DOM traversal / PDF object graph / WARC +
    HTTP + DOM), and emit the flagship span sequence — one flat row per
    content span, offsets in reading order."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ocr_ray.stages.html import extract_spans_from_html
        from ocr_ray.stages.pdf import decode_span_pdf
        from ocr_ray.stages.warc import parse_http_response, parse_warc

        doc_ids, kinds, texts, refs, offsets = [], [], [], [], []

        def emit(doc_id: str, spans: list[tuple[str, str, str]]) -> None:
            for off, (kind, text, ref) in enumerate(spans):
                doc_ids.append(doc_id)
                kinds.append(kind)
                texts.append(text)
                refs.append(ref)
                offsets.append(off)

        for doc_id, payload in zip(
            batch["doc_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            fmt = detect_payload_format(payload)
            if fmt == "pdf":
                emit(doc_id, decode_span_pdf(payload))
            elif fmt == "warc":
                for rec_type, _h, body in parse_warc(payload):
                    if rec_type != "response":
                        continue
                    status, headers, entity = parse_http_response(body)
                    if status != 200:
                        continue
                    emit(
                        headers["X-Doc"],
                        extract_spans_from_html(entity.decode("utf-8")),
                    )
            else:
                emit(doc_id, extract_spans_from_html(payload.decode("utf-8")))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.string()),
                "kind": pa.array(kinds, type=pa.string()),
                "text": pa.array(texts, type=pa.string()),
                "media_ref": pa.array(refs, type=pa.string()),
                "offset": pa.array(np.asarray(offsets, dtype=np.int32)),
            }
        )
