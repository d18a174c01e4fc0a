"""REAL WARC → HTTP → HTML extraction stack: the web-archive input path.

Web-scale extraction pipelines (the north rule's domain) consume WARC
(ISO 28500) web-archive files: many captured HTTP exchanges per file.
This module implements the full stack with zero external dependencies,
composing with the HTML leg (``stages/html.py``):

Writer (``build_warc``): a genuine WARC/1.0 byte stream — one
``warcinfo`` record plus, per document, a ``request`` and a ``response``
record, each framed by ``Content-Length`` with CRLF discipline and the
mandatory two-CRLF record trailer. The response payload is a real HTTP/1.1
message whose body is the document's rendered HTML page
(``render_html``), and the HTTP layer rotates through the real transfer
shapes: ``Content-Encoding: gzip`` (deterministic mtime=0) for odd
doc_ids, ``Transfer-Encoding: chunked`` (hex-size chunks that split the
HTML mid-tag) for doc_id % 3 == 0, both composed when both apply
(gzip first, then chunked — wire order). The warcinfo and request bodies
contain header-lookalike TRAP text (``WARC/1.0``, ``WARC-Type:
response``), so only Content-Length arithmetic — not delimiter scanning —
walks the file correctly.

Parser (``parse_warc`` / ``parse_http_response``): sequential
record walk driven by Content-Length, header parsing, record-type
dispatch, chunked-body reassembly, gzip decode, then the full HTML
main-content extraction. The ``extract_warc_main`` query is
oracle-checked bit-exactly: the text recovered through ALL FOUR layers
(WARC framing → HTTP message → transfer/content decoding → HTML
boilerplate strip) must equal the source document text, and the HTTP
metadata must equal its closed forms.

Reference parity note: the reference runtime (pombreda/ocr) has no
network-archive layer; this module exists for the BASELINE.json north
rule (web-scale main-content extraction), not for reference parity.
"""

from __future__ import annotations

import gzip
import numpy as np
import pyarrow as pa

from ocr_ray.stages.html import extract_main_text, render_html

CRLF = b"\r\n"
WARC_DATE = "2026-01-01T00:00:00Z"
CHUNK_SIZE = 997  # prime, so chunk boundaries land mid-tag/mid-word


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------


def _warc_record(rec_type: str, headers: list[tuple[str, str]], body: bytes) -> bytes:
    head = [b"WARC/1.0"]
    head.append(f"WARC-Type: {rec_type}".encode())
    for k, v in headers:
        head.append(f"{k}: {v}".encode())
    head.append(f"Content-Length: {len(body)}".encode())
    return CRLF.join(head) + CRLF + CRLF + body + CRLF + CRLF


def _chunk_body(body: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(body), CHUNK_SIZE):
        piece = body[i : i + CHUNK_SIZE]
        out += f"{len(piece):x}".encode() + CRLF + piece + CRLF
    out += b"0" + CRLF + CRLF
    return bytes(out)


def http_response_for_doc(doc_id: int, text: str) -> bytes:
    """Document -> a real HTTP/1.1 response message carrying its rendered
    HTML page, with gzip/chunked shapes rotated by doc_id. For a
    non-negative integer id, the digits of ``str(d)`` ARE ``d``, so this
    is exactly the page-keyed builder with key = str(d) and rot = d."""
    d = int(doc_id)
    return _http_response_for_page(str(d), render_html(d, text), d)


def _http_response_for_page(key: str, html: str, rot: int) -> bytes:
    """One HTML page -> a real HTTP/1.1 response; gzip/chunked shapes
    rotate by ``rot`` (same rotation law as ``http_response_for_doc``).
    ``key`` rides the X-Doc header for downstream identification."""
    body = html.encode("utf-8")
    headers = [
        ("Content-Type", "text/html; charset=utf-8"),
        ("X-Doc", key),
    ]
    if rot % 2 == 1:
        body = gzip.compress(body, compresslevel=6, mtime=0)
        headers.append(("Content-Encoding", "gzip"))
    if rot % 3 == 0:
        body = _chunk_body(body)
        headers.append(("Transfer-Encoding", "chunked"))
    else:
        headers.append(("Content-Length", str(len(body))))
    head = b"HTTP/1.1 200 OK" + CRLF
    head += CRLF.join(f"{k}: {v}".encode() for k, v in headers) + CRLF + CRLF
    return head + body


def build_warc_from_pages(keys: list[str], pages: list[str]) -> bytes:
    """One WARC/1.0 file from pre-rendered HTML pages: warcinfo + a
    (request, response) pair per page. Bodies of the non-response records
    are header-lookalike traps: a delimiter-scanning parser mis-frames."""
    out = bytearray()
    info_body = (
        b"software: ocr-ray\r\n"
        b"WARC/1.0 trap line that is not a record header\r\n\r\n"
        b"WARC-Type: response trap\r\nContent-Length: 99999 trap\r\n"
    )
    out += _warc_record(
        "warcinfo",
        [("WARC-Record-ID", "<urn:ocr-ray:warcinfo>"), ("WARC-Date", WARC_DATE)],
        info_body,
    )
    for key, page in zip(keys, pages):
        rot = int("".join(c for c in key if c.isdigit()) or 0)
        req = (
            f"GET /doc/{key} HTTP/1.1\r\nHost: example.org\r\n"
            f"X-Trap: WARC/1.0\r\n\r\n"
        ).encode()
        out += _warc_record(
            "request",
            [
                ("WARC-Record-ID", f"<urn:ocr-ray:req:{key}>"),
                ("WARC-Date", WARC_DATE),
                ("WARC-Target-URI", f"http://example.org/doc/{key}"),
                ("Content-Type", "application/http;msgtype=request"),
            ],
            req,
        )
        out += _warc_record(
            "response",
            [
                ("WARC-Record-ID", f"<urn:ocr-ray:resp:{key}>"),
                ("WARC-Date", WARC_DATE),
                ("WARC-Target-URI", f"http://example.org/doc/{key}"),
                ("Content-Type", "application/http;msgtype=response"),
            ],
            _http_response_for_page(key, page, rot),
        )
    return bytes(out)


def build_warc(doc_ids: list[int], texts: list[str]) -> bytes:
    """One WARC/1.0 file holding a warcinfo record plus a (request,
    response) pair per document. Byte-identical to the page-keyed
    builder with key = str(d) (non-negative ids: digit-rot == d), page =
    the document's rendered HTML — one builder, one rotation law."""
    ids = [int(d) for d in doc_ids]
    return build_warc_from_pages(
        [str(d) for d in ids],
        [render_html(d, t) for d, t in zip(ids, texts)],
    )


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------


def _parse_headers(block: bytes) -> list[tuple[str, str]]:
    headers = []
    for line in block.split(CRLF):
        if not line:
            continue
        k, sep, v = line.partition(b":")
        if not sep:
            raise ValueError(f"malformed header line {line!r}")
        headers.append((k.decode("latin-1").strip(), v.decode("latin-1").strip()))
    return headers


def parse_warc(buf: bytes) -> list[tuple[str, dict[str, str], bytes]]:
    """Sequential Content-Length-driven record walk ->
    [(warc_type, headers, body)]. Raises on framing violations."""
    records = []
    pos = 0
    n = len(buf)
    while pos < n:
        if not buf.startswith(b"WARC/1.0" + CRLF, pos):
            raise ValueError(f"expected WARC/1.0 version line at byte {pos}")
        head_end = buf.find(CRLF + CRLF, pos)
        if head_end < 0:
            raise ValueError("unterminated WARC header block")
        headers = dict(_parse_headers(buf[pos + 10 : head_end]))
        try:
            length = int(headers["Content-Length"])
        except (KeyError, ValueError):
            raise ValueError("missing/bad Content-Length in WARC header")
        body_start = head_end + 4
        body = buf[body_start : body_start + length]
        if len(body) != length:
            raise ValueError("truncated WARC record body")
        trailer = buf[body_start + length : body_start + length + 4]
        if trailer != CRLF + CRLF:
            raise ValueError("missing WARC record trailer (two CRLFs)")
        records.append((headers.get("WARC-Type", ""), headers, body))
        pos = body_start + length + 4
    return records


def _dechunk(body: bytes) -> bytes:
    out = bytearray()
    pos = 0
    while True:
        eol = body.find(CRLF, pos)
        if eol < 0:
            raise ValueError("missing chunk-size line")
        size = int(body[pos:eol].split(b";")[0], 16)
        pos = eol + 2
        if size == 0:
            return bytes(out)
        out += body[pos : pos + size]
        if body[pos + size : pos + size + 2] != CRLF:
            raise ValueError("missing CRLF after chunk data")
        pos += size + 2


def parse_http_response(msg: bytes) -> tuple[int, dict[str, str], bytes]:
    """HTTP/1.1 message -> (status, headers, decoded entity body):
    de-chunks Transfer-Encoding: chunked, then decodes Content-Encoding:
    gzip — wire order in reverse."""
    head_end = msg.find(CRLF + CRLF)
    if head_end < 0:
        raise ValueError("no HTTP header terminator")
    status_line, _, header_block = msg[:head_end].partition(CRLF)
    parts = status_line.split(b" ", 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        raise ValueError(f"bad HTTP status line {status_line!r}")
    status = int(parts[1])
    headers = dict(_parse_headers(header_block))
    body = msg[head_end + 4 :]
    if headers.get("Transfer-Encoding", "").lower() == "chunked":
        body = _dechunk(body)
    elif "Content-Length" in headers:
        body = body[: int(headers["Content-Length"])]
    if headers.get("Content-Encoding", "").lower() == "gzip":
        body = gzip.decompress(body)
    return status, headers, body


# ---------------------------------------------------------------------------
# Ray stages
# ---------------------------------------------------------------------------


def attach_warc_payloads(batch: pa.Table) -> pa.Table:
    """Fixture stage: pack the batch's documents into ONE WARC file (real
    archives hold many captures per file). Output: a single-row table
    (warc_id, payload); the text column is dropped — downstream can only
    recover it through all four protocol layers."""
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    if not ids:
        return pa.table(
            {"warc_id": pa.array([], type=pa.int64()),
             "payload": pa.array([], type=pa.large_binary())}
        )
    payload = build_warc(ids, texts)
    return pa.table(
        {
            "warc_id": pa.array([int(ids[0])], type=pa.int64()),
            "payload": pa.array([payload], type=pa.large_binary()),
        }
    )


def attach_span_warc_payloads(batch: pa.Table) -> pa.Table:
    """Fixture stage for the interleaved-corpus archive leg: render each
    document's (shuffled) spans as a page, then pack the batch into ONE
    WARC file. Output: single-row (warc_id, payload)."""
    from ocr_ray.stages.html import render_span_html

    ids = batch["doc_id"].to_pylist()
    if not ids:
        return pa.table(
            {"warc_id": pa.array([], type=pa.string()),
             "payload": pa.array([], type=pa.large_binary())}
        )
    pages = [
        render_span_html(i, sp) for i, sp in zip(ids, batch["spans"].to_pylist())
    ]
    payload = build_warc_from_pages(ids, pages)
    return pa.table(
        {
            "warc_id": pa.array([ids[0]], type=pa.string()),
            "payload": pa.array([payload], type=pa.large_binary()),
        }
    )


class WarcSpanExtractor:
    """Decode/extract stage (task-pooled with per-worker instance reuse via ``stateless_stage`` — an actor pool would pay its spin-up per query): WARC walk -> HTTP decode -> DOM span-sequence
    recovery. One output row per content span, same flat schema (and
    oracle) as the flagship ``extract_spans``."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ocr_ray.stages.html import extract_spans_from_html

        doc_ids, kinds, texts, refs, offsets = [], [], [], [], []
        for payload in batch["payload"].to_pylist():
            for rec_type, _rec_headers, body in parse_warc(payload):
                if rec_type != "response":
                    continue
                status, headers, entity = parse_http_response(body)
                if status != 200:
                    continue
                doc_id = headers["X-Doc"]
                spans = extract_spans_from_html(entity.decode("utf-8"))
                for off, (kind, text, ref) in enumerate(spans):
                    doc_ids.append(doc_id)
                    kinds.append(kind)
                    texts.append(text)
                    refs.append(ref)
                    offsets.append(off)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.string()),
                "kind": pa.array(kinds, type=pa.string()),
                "text": pa.array(texts, type=pa.string()),
                "media_ref": pa.array(refs, type=pa.string()),
                "offset": pa.array(np.asarray(offsets, dtype=np.int32)),
            }
        )


class WarcMainExtractor:
    """Decode/extract stage (task-pooled with per-worker instance reuse via ``stateless_stage`` — an actor pool would pay its spin-up per query): WARC walk -> response records only -> HTTP parse
    (chunked/gzip) -> HTML main-content extraction. One output row per
    archived response. Output schema: doc_id, extracted_text, n_blocks,
    n_content_blocks, n_boiler_words, http_status, content_encoding,
    transfer_chunked, n_http_headers."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, texts, nb, nc, bw = [], [], [], [], []
        status_l, enc_l, chunked_l, nh_l = [], [], [], []
        for payload in batch["payload"].to_pylist():
            for rec_type, rec_headers, body in parse_warc(payload):
                if rec_type != "response":
                    continue
                status, headers, entity = parse_http_response(body)
                main, n_blocks, n_content, n_boiler = extract_main_text(
                    entity.decode("utf-8")
                )
                ids.append(int(headers["X-Doc"]))
                texts.append(main)
                nb.append(n_blocks)
                nc.append(n_content)
                bw.append(n_boiler)
                status_l.append(status)
                enc_l.append(headers.get("Content-Encoding", "identity"))
                chunked_l.append(
                    headers.get("Transfer-Encoding", "").lower() == "chunked"
                )
                nh_l.append(len(headers))
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(ids, dtype=np.int64)),
                "extracted_text": pa.array(texts, type=pa.string()),
                "n_blocks": pa.array(np.asarray(nb, dtype=np.int64)),
                "n_content_blocks": pa.array(np.asarray(nc, dtype=np.int64)),
                "n_boiler_words": pa.array(np.asarray(bw, dtype=np.int64)),
                "http_status": pa.array(np.asarray(status_l, dtype=np.int64)),
                "content_encoding": pa.array(enc_l, type=pa.string()),
                "transfer_chunked": pa.array(chunked_l, type=pa.bool_()),
                "n_http_headers": pa.array(np.asarray(nh_l, dtype=np.int64)),
            }
        )
