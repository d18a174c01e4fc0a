"""REAL PDF layout parse: minimal writer + parser with reading-order text.

The north-star rule names "PDF/layout parse" as a first-class extraction
leg. This module implements both directions with zero external
dependencies, the same contract as the codec stages (``stages/png.py``,
``stages/jpeg.py``):

Writer (``encode_pdf``): a genuine PDF 1.4 file — header, numbered
indirect objects (catalog, page tree, Type1 font, per-page dict +
FlateDecode content stream), a byte-offset-correct ``xref`` table,
``trailer`` + ``startxref``. Text is laid out 8 words/line, 10
lines/page, and each line is emitted as up to two chunks at different x
positions (``Tm`` absolute positioning plus a relative ``Td`` leg) —
and, crucially, lines are written into the content stream in a
deterministically ROTATED order, and within a line the right-hand chunk
is written before the left-hand one. Stream order is therefore wrong as
reading order: an extractor that just concatenates ``Tj`` strings fails.
String encodings rotate across the three PDF forms — literal strings
(with ``\\(``/``\\)``/``\\\\`` and octal ``\\ddd`` escapes), hex strings
``<...>``, and ``TJ`` arrays with kerning numbers (numbers between array
elements do NOT produce spaces).

Parser (``decode_pdf`` + ``extract_pdf_text``): finds ``startxref``,
parses the xref table and trailer, resolves the catalog → page tree →
per-page content streams by byte offset, inflates them, interprets the
text operators (``BT``/``ET``/``Tm``/``Td``/``Tj``/``TJ``) tracking the
text-line matrix, and re-assembles READING ORDER by sorting chunks on
(page, -y, x). The ``extract_pdf_text`` query is oracle-checked
bit-exactly: the extracted text must equal the original document text —
an xref, stream, escape, matrix, or ordering bug fails the hash.

Reference parity note: the reference runtime (pombreda/ocr) has no PDF
layer; this module exists for the BASELINE.json north rule (main-content
extraction over layout formats), not for reference parity.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pyarrow as pa

WORDS_PER_LINE = 8
LINES_PER_PAGE = 10
CHUNK_SPLIT = 4  # words 0..3 -> left chunk at X_LEFT, 4..7 -> right at X_RIGHT
X_LEFT, X_RIGHT = 72.0, 300.0
Y_TOP, LEADING = 720.0, 14.0


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------


def _escape_literal(s: str, d: int, base_i: int) -> str:
    """PDF literal-string escape; additionally octal-escape the first
    character of words whose global index i satisfies (d+i) % 7 == 0,
    so real payloads exercise the \\ddd decode path.

    Text outside latin-1 is carried as UTF-8 bytes at the stream layer
    (the content stream is encoded UTF-8, see the ``zlib.compress``
    call sites); the octal-escape rotation only applies to ASCII word
    heads, where \\ddd denotes the byte directly."""
    words = s.split(" ")
    out = []
    for j, w in enumerate(words):
        esc = w.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        if w and (d + base_i + j) % 7 == 0:
            first = w[0]
            if first not in "\\()" and ord(first) < 0x80:
                esc = f"\\{ord(first):03o}" + esc[1:]
        out.append(esc)
    return " ".join(out)


def _chunk_ops(text: str, d: int, g: int, base_i: int) -> str:
    """One text-showing op for a chunk, rotating across the string forms."""
    if (d + g) % 3 == 0:
        return f"<{text.encode('utf-8').hex()}> Tj"
    words = text.split(" ")
    if (d + g) % 4 == 0 and len(words) >= 2:
        a = _escape_literal(words[0] + " ", d, base_i)
        b = _escape_literal(" ".join(words[1:]), d, base_i + 1)
        return f"[({a}) -120 ({b})] TJ"
    return f"({_escape_literal(text, d, base_i)}) Tj"


def _lines(words: list[str]) -> list[list[str]]:
    return [words[i : i + WORDS_PER_LINE] for i in range(0, len(words), WORDS_PER_LINE)]


def _serialize_pdf(objs: dict[int, bytes]) -> bytes:
    """Header + numbered objects (catalog LAST in the byte stream, so
    offsets are only resolvable through the xref) + offset-correct xref
    table + trailer + startxref."""
    write_order = sorted(objs.keys(), reverse=True)
    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for oid in write_order:
        offsets[oid] = len(buf)
        buf += f"{oid} 0 obj\n".encode() + objs[oid] + b"\nendobj\n"
    xref_pos = len(buf)
    n_obj = max(objs) + 1
    buf += f"xref\n0 {n_obj}\n".encode()
    buf += b"0000000000 65535 f \n"
    for oid in range(1, n_obj):
        buf += f"{offsets[oid]:010d} 00000 n \n".encode()
    buf += (
        f"trailer\n<< /Size {n_obj} /Root 1 0 R >>\nstartxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(buf)


def encode_pdf(doc_id: int, text: str) -> bytes:
    """Document text -> a complete single-font PDF 1.4 byte stream."""
    d = int(doc_id)
    words = text.split(" ")
    lines = _lines(words)
    pages = [lines[i : i + LINES_PER_PAGE] for i in range(0, len(lines), LINES_PER_PAGE)]
    n_pages = max(1, len(pages))
    if not pages:
        pages = [[]]

    # Object numbering: 1 catalog, 2 pages, 3 font, then per page p:
    # content = 4 + 2p, page dict = 5 + 2p.
    page_ids = [5 + 2 * p for p in range(n_pages)]
    kids = " ".join(f"{pid} 0 R" for pid in page_ids)
    objs: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode(),
        3: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }

    word_base = 0  # global word index of the first word of each line
    line_bases = []
    for ln in lines:
        line_bases.append(word_base)
        word_base += len(ln)

    for p, page_lines in enumerate(pages):
        ops = ["BT /F1 12 Tf"]
        k = len(page_lines)
        # Rotated emission order: stream order != reading order.
        for j in range(k):
            jl = (j + d) % k
            g = LINES_PER_PAGE * p + jl  # global line index
            line = page_lines[jl]
            y = Y_TOP - LEADING * jl
            base = line_bases[g]
            left = " ".join(line[:CHUNK_SPLIT])
            right = " ".join(line[CHUNK_SPLIT:])
            if right:
                # Right chunk first (absolute Tm), then the left chunk via
                # a relative Td from the line matrix.
                ops.append(f"1 0 0 1 {X_RIGHT:g} {y:g} Tm")
                ops.append(_chunk_ops(right, d, g, base + CHUNK_SPLIT))
                ops.append(f"{X_LEFT - X_RIGHT:g} 0 Td")
                ops.append(_chunk_ops(left, d, g, base))
            else:
                ops.append(f"1 0 0 1 {X_LEFT:g} {y:g} Tm")
                ops.append(_chunk_ops(left, d, g, base))
        ops.append("ET")
        stream = zlib.compress("\n".join(ops).encode("utf-8"), 6)
        objs[4 + 2 * p] = (
            f"<< /Length {len(stream)} /Filter /FlateDecode >>\nstream\n".encode()
            + stream
            + b"\nendstream"
        )
        objs[5 + 2 * p] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {4 + 2 * p} 0 R >>"
        ).encode()

    # Content/page objects first, catalog last: offsets only resolvable
    # through the xref table.
    return _serialize_pdf(objs)


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------

def _parse_literal_string(buf: bytes, pos: int) -> tuple[str, int]:
    """Parse a ( ... ) literal string starting at the '('. Returns
    (decoded text, position after the closing paren)."""
    assert buf[pos : pos + 1] == b"("
    pos += 1
    depth = 1
    out = bytearray()
    n = len(buf)
    while pos < n:
        c = buf[pos]
        if c == 0x5C:  # backslash
            pos += 1
            e = buf[pos : pos + 1]
            if e == b"n":
                out += b"\n"
            elif e == b"r":
                out += b"\r"
            elif e == b"t":
                out += b"\t"
            elif e == b"b":
                out += b"\b"
            elif e == b"f":
                out += b"\f"
            elif e in (b"(", b")", b"\\"):
                out += e
            elif e and e in b"01234567":
                # Octal escapes are 1-3 OCTAL digits (PDF 32000 §7.3.4.2);
                # \8 and \9 are not octal and fall to the drop-the-backslash
                # rule below, and digit gathering must stop at 8/9.
                oct_digits = e
                while (
                    len(oct_digits) < 3
                    and (nxt := buf[pos + 1 : pos + 2])
                    and nxt in b"01234567"
                ):
                    pos += 1
                    oct_digits += nxt
                out.append(int(oct_digits, 8) & 0xFF)
            elif e in (b"\n", b"\r"):
                pass  # line continuation
            else:
                out += e  # backslash before a non-escape char is dropped
            pos += 1
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return _decode_text_bytes(out), pos + 1
        out.append(c)
        pos += 1
    raise ValueError("unterminated literal string")


def _decode_text_bytes(raw: bytes | bytearray) -> str:
    """String bytes -> text: UTF-8 (the in-repo writer's encoding; ASCII
    PDFs are unaffected) with a latin-1 fallback for foreign byte
    strings that are not valid UTF-8."""
    try:
        return bytes(raw).decode("utf-8")
    except UnicodeDecodeError:
        return bytes(raw).decode("latin-1")


def _parse_hex_string(buf: bytes, pos: int) -> tuple[str, int]:
    end = buf.index(b">", pos)
    hexes = bytes(buf[pos + 1 : end]).translate(None, b" \t\r\n")
    if len(hexes) % 2:
        hexes += b"0"
    return _decode_text_bytes(bytes.fromhex(hexes.decode("ascii"))), end + 1


class _ObjParser:
    """Recursive parser for PDF object syntax (dicts, arrays, names,
    numbers, refs, strings, booleans, null)."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos

    def _skip_ws(self) -> None:
        n = len(self.buf)
        while self.pos < n:
            c = self.buf[self.pos]
            if c in b" \t\r\n\x00":
                self.pos += 1
            elif c == 0x25:  # % comment
                eol = self.buf.find(b"\n", self.pos)
                self.pos = n if eol < 0 else eol + 1
            else:
                return

    def parse_value(self):
        self._skip_ws()
        buf, pos = self.buf, self.pos
        if buf.startswith(b"<<", pos):
            self.pos += 2
            d: dict[str, object] = {}
            while True:
                self._skip_ws()
                if self.buf.startswith(b">>", self.pos):
                    self.pos += 2
                    return d
                key = self.parse_value()
                if not isinstance(key, _Name):
                    raise ValueError(f"dict key is not a name: {key!r}")
                d[str(key)] = self.parse_value()
        if buf.startswith(b"<", pos):
            s, self.pos = _parse_hex_string(buf, pos)
            return s
        if buf.startswith(b"(", pos):
            s, self.pos = _parse_literal_string(buf, pos)
            return s
        if buf.startswith(b"[", pos):
            self.pos += 1
            arr = []
            while True:
                self._skip_ws()
                if self.buf.startswith(b"]", self.pos):
                    self.pos += 1
                    return arr
                arr.append(self.parse_value())
        if buf.startswith(b"/", pos):
            m = re.match(rb"/([^\s/<>\[\]()]*)", buf[pos:])
            self.pos += m.end()
            return _Name(m.group(1).decode("latin-1"))
        if buf.startswith(b"true", pos):
            self.pos += 4
            return True
        if buf.startswith(b"false", pos):
            self.pos += 5
            return False
        if buf.startswith(b"null", pos):
            self.pos += 4
            return None
        m = re.match(rb"(\d+)\s+(\d+)\s+R\b", buf[pos:])
        if m:
            self.pos += m.end()
            return _Ref(int(m.group(1)))
        m = re.match(rb"-?(?:\d+\.?\d*|\.\d+)", buf[pos:])
        if m:
            self.pos += m.end()
            tok = m.group(0)
            return float(tok) if b"." in tok else int(tok)
        raise ValueError(f"cannot parse object at byte {pos}: {buf[pos:pos+20]!r}")


class _Name(str):
    pass


class _Ref(int):
    pass


class PdfDocument:
    """Parsed PDF: xref-driven object access + page walk."""

    def __init__(self, buf: bytes) -> None:
        if not buf.startswith(b"%PDF-"):
            raise ValueError("not a PDF (bad header)")
        self.buf = buf
        sx = buf.rfind(b"startxref")
        if sx < 0:
            raise ValueError("missing startxref")
        m = re.search(rb"startxref\s+(\d+)", buf[sx:])
        if not m:
            raise ValueError("malformed startxref (no offset digits)")
        xref_pos = int(m.group(1))
        if not buf.startswith(b"xref", xref_pos):
            raise ValueError("xref table not at startxref offset")
        self.offsets: dict[int, int] = {}
        pos = xref_pos + 4
        while True:
            m = re.match(rb"\s*(\d+)\s+(\d+)\s*\n", buf[pos:])
            if not m:
                break
            start, count = int(m.group(1)), int(m.group(2))
            pos += m.end()
            for k in range(count):
                entry = buf[pos : pos + 20]
                off, _gen, kind = entry[:10], entry[11:16], entry[17:18]
                if kind == b"n":
                    self.offsets[start + k] = int(off)
                pos += 20
        m = re.search(rb"trailer", buf[pos - 1 :])
        if not m:
            raise ValueError("missing trailer")
        tp = _ObjParser(buf, pos - 1 + m.end())
        self.trailer = tp.parse_value()
        self._cache: dict[int, object] = {}

    def obj(self, ref):
        if not isinstance(ref, _Ref):
            return ref
        oid = int(ref)
        if oid in self._cache:
            return self._cache[oid]
        off = self.offsets[oid]
        m = re.match(rb"(\d+)\s+(\d+)\s+obj\b", self.buf[off:])
        if not m or int(m.group(1)) != oid:
            raise ValueError(f"object {oid} not found at xref offset {off}")
        p = _ObjParser(self.buf, off + m.end())
        val = p.parse_value()
        if isinstance(val, dict):
            p._skip_ws()
            if self.buf.startswith(b"stream", p.pos):
                sp = p.pos + 6
                if self.buf[sp : sp + 2] == b"\r\n":
                    sp += 2
                elif self.buf[sp : sp + 1] == b"\n":
                    sp += 1
                length = self.obj(val["Length"])
                data = self.buf[sp : sp + int(length)]
                filt = val.get("Filter")
                if isinstance(filt, _Name) and str(filt) == "FlateDecode":
                    data = zlib.decompress(bytes(data))
                elif filt is not None:
                    raise ValueError(f"unsupported stream filter {filt!r}")
                val = dict(val)
                val["__stream__"] = data
        self._cache[oid] = val
        return val

    def pages(self) -> list[dict]:
        root = self.obj(self.trailer["Root"])
        out: list[dict] = []

        def walk(node) -> None:
            node = self.obj(node)
            t = str(node.get("Type", ""))
            if t == "Pages":
                for kid in node["Kids"]:
                    walk(kid)
            elif t == "Page":
                out.append(node)
            else:
                raise ValueError(f"unexpected page-tree node type {t!r}")

        walk(root["Pages"])
        return out


def _content_chunks(stream: bytes) -> list[tuple[float, float, str]]:
    """Text-only view of the content-stream interpreter: (x, y, text) per
    text-showing op (delegates to ``_content_events`` so there is exactly
    ONE tokenizer for content streams)."""
    return [
        (x, y, payload)
        for x, y, kind, payload in _content_events(stream)
        if kind == "text"
    ]


def decode_pdf(buf: bytes) -> tuple[str, int, int]:
    """PDF bytes -> (reading-order text, n_pages, n_chunks)."""
    doc = PdfDocument(buf)
    rows: list[tuple[int, float, float, str]] = []
    pages = doc.pages()
    for pi, page in enumerate(pages):
        content = doc.obj(page["Contents"])
        stream = content["__stream__"]
        for cx, cy, text in _content_chunks(stream):
            rows.append((pi, cy, cx, text))
    rows.sort(key=lambda r: (r[0], -r[1], r[2]))
    text = " ".join(r[3] for r in rows)
    return text, len(pages), len(rows)


# ---------------------------------------------------------------------------
# Interleaved-span corpus leg: spans -> typeset pages -> span sequence
# ---------------------------------------------------------------------------

SPANS_PER_PAGE = 10
CONTENT_BAND = (100.0, 730.0)  # chunks outside [lo, hi] are running chrome


def encode_span_pdf(doc_id_s: str, spans: list[dict]) -> bytes:
    """Typeset one interleaved-corpus document (spans possibly in shuffled
    storage order) as a real multi-page PDF in READING ORDER: text spans
    are positioned lines; media spans are image XObjects placed via
    ``q cm /Name Do Q`` whose media_ref is recoverable ONLY through the
    page's resource dictionary (opaque per-page resource names, the ref
    stored as the XObject's /Name entry); the corpus's boilerplate spans
    are typeset as running header/footer marginalia OUTSIDE the content
    band, which the extractor must strip by the position heuristic.
    Content-stream emission order is rotated as in ``encode_pdf``."""
    d = int(doc_id_s.rsplit("-", 1)[-1])
    ordered = sorted(spans, key=lambda s: s["offset"])
    content = [s for s in ordered if s["kind"] != "boilerplate"]
    marginalia = [s for s in ordered if s["kind"] == "boilerplate"]
    pages = [
        content[i : i + SPANS_PER_PAGE] for i in range(0, len(content), SPANS_PER_PAGE)
    ]
    if not pages:
        pages = [[]]

    objs: dict[int, bytes] = {
        3: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    next_id = 4
    page_ids = []
    mi = 0  # marginalia cursor: spread over pages round-robin
    for p, page_spans in enumerate(pages):
        # Image XObjects for this page's media spans, under opaque names.
        xobjects: dict[str, int] = {}
        for k, sp in enumerate(page_spans):
            if sp["kind"] != "media":
                continue
            ref = sp["media_ref"]
            w, h = 16, 8
            m = int(ref.split("-")[-1]) if ref.split("-")[-1].isdigit() else 0
            pix = bytes(
                (41 * m + 23 + 17 * (i // (w * 3)) + 5 * ((i // 3) % w) + 31 * (i % 3))
                % 256
                for i in range(w * h * 3)
            )
            body = (
                f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
                f"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Name /{ref} "
                f"/Length {len(pix)} >>\nstream\n"
            ).encode() + pix + b"\nendstream"
            objs[next_id] = body
            xobjects[f"X{k}"] = next_id
            next_id += 1

        ops = ["BT /F1 12 Tf"]
        k = len(page_spans)
        for j in range(k):
            jl = (j + d) % k  # rotated emission order
            sp = page_spans[jl]
            g = SPANS_PER_PAGE * p + jl
            y = Y_TOP - LEADING * jl
            if sp["kind"] == "media":
                ops.append("ET")
                ops.append(f"q 100 0 0 50 {X_LEFT:g} {y - 40:g} cm /X{jl} Do Q")
                ops.append("BT /F1 12 Tf")
            else:
                ops.append(f"1 0 0 1 {X_LEFT:g} {y:g} Tm")
                ops.append(_chunk_ops(sp["text"], d, g, int(sp["offset"]) * 8))
        # Running chrome: title in the header zone, and this page's share
        # of the corpus boilerplate spans split header/footer — all
        # OUTSIDE the content band.
        ops.append(f"1 0 0 1 {X_LEFT:g} 770 Tm")
        ops.append(f"({_escape_literal(doc_id_s + ' running head', d, 0)}) Tj")
        share = marginalia[mi::len(pages)]
        for q, sp in enumerate(share):
            # Alternate header/footer zones; positions cycle INSIDE each
            # zone so any marginalia count stays outside the content band.
            if q % 2 == 0:
                my = 740.0 + 4 * ((q // 2) % 12)
            else:
                my = 90.0 - 4 * ((q // 2) % 12)
            ops.append(f"1 0 0 1 {X_LEFT:g} {my:g} Tm")
            ops.append(f"({_escape_literal(sp['text'], d, 0)}) Tj")
        mi += 1
        ops.append(f"1 0 0 1 {X_LEFT:g} 30 Tm")
        ops.append(f"(page {p + 1}) Tj")
        ops.append("ET")

        stream = zlib.compress("\n".join(ops).encode("utf-8"), 6)
        objs[next_id] = (
            f"<< /Length {len(stream)} /Filter /FlateDecode >>\nstream\n".encode()
            + stream
            + b"\nendstream"
        )
        content_id = next_id
        next_id += 1
        xo = " ".join(f"/{name} {oid} 0 R" for name, oid in xobjects.items())
        objs[next_id] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> /XObject << {xo} >> >> "
            f"/Contents {content_id} 0 R >>"
        ).encode()
        page_ids.append(next_id)
        next_id += 1

    kids = " ".join(f"{pid} 0 R" for pid in page_ids)
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = f"<< /Type /Pages /Kids [{kids}] /Count {len(page_ids)} >>".encode()

    return _serialize_pdf(objs)


def _content_events(stream: bytes) -> list[tuple[float, float, str, str]]:
    """Like ``_content_chunks`` but also yields image placements:
    -> [(x, y, kind, payload)] where kind is 'text' (payload = shown
    string) or 'media' (payload = XObject resource name). Tracks the
    last ``cm`` translation for Do placement."""
    events: list[tuple[float, float, str, str]] = []
    operands: list[object] = []
    x = y = 0.0
    cmx = cmy = 0.0
    pos = 0
    n = len(stream)
    while pos < n:
        c = stream[pos : pos + 1]
        if c in b" \t\r\n":
            pos += 1
            continue
        if c == b"(":
            s, pos = _parse_literal_string(stream, pos)
            operands.append(s)
            continue
        if c == b"<" and not stream.startswith(b"<<", pos):
            s, pos = _parse_hex_string(stream, pos)
            operands.append(s)
            continue
        if c == b"[":
            p = _ObjParser(stream, pos)
            operands.append(p.parse_value())
            pos = p.pos
            continue
        if c == b"/":
            m = re.match(rb"/([^\s/<>\[\]()]*)", stream[pos:])
            operands.append(_Name(m.group(1).decode("latin-1")))
            pos += m.end()
            continue
        m = re.match(rb"-?(?:\d+\.?\d*|\.\d+)", stream[pos:])
        if m:
            operands.append(float(m.group(0)))
            pos += m.end()
            continue
        m = re.match(rb"[A-Za-z'\"*]+", stream[pos:])
        if not m:
            raise ValueError(f"bad content token at {pos}: {stream[pos:pos+10]!r}")
        op = m.group(0).decode("latin-1")
        pos += m.end()
        if op == "BT":
            x = y = 0.0
        elif op == "Tm":
            x, y = float(operands[-2]), float(operands[-1])
        elif op in ("Td", "TD"):
            x += float(operands[-2])
            y += float(operands[-1])
        elif op == "cm":
            cmx, cmy = float(operands[-2]), float(operands[-1])
        elif op == "Do":
            events.append((cmx, cmy, "media", str(operands[-1])))
        elif op == "Tj":
            events.append((x, y, "text", str(operands[-1])))
        elif op == "TJ":
            arr = operands[-1]
            events.append((x, y, "text", "".join(e for e in arr if isinstance(e, str))))
        operands = []
    return events


def decode_span_pdf(buf: bytes) -> list[tuple[str, str, str]]:
    """-> [(kind, text, media_ref)] in reading order, chrome stripped.

    Media refs resolve through the page resource dictionary: Do's operand
    names an /XObject entry whose object's /Name carries the ref. Chunks
    outside the content band (running heads, folios, marginalia) are
    dropped by the position heuristic; media placements are normalized to
    their line anchor (the cm translation is the image's bottom-left)."""
    doc = PdfDocument(buf)
    rows: list[tuple[int, float, float, str, str, str]] = []
    for pi, page in enumerate(doc.pages()):
        stream = doc.obj(page["Contents"])["__stream__"]
        resources = doc.obj(page.get("Resources", {}))
        xobj_map = doc.obj(resources.get("XObject", {})) if resources else {}
        for cx, cy, kind, payload in _content_events(stream):
            if kind == "media":
                entry = doc.obj(xobj_map[str(payload)])
                ref = str(entry.get("Name", ""))
                cy = cy + 40.0  # bottom-left anchor -> line anchor
                rows.append((pi, cy, cx, "media", "", ref))
            else:
                rows.append((pi, cy, cx, "text", payload, ""))
    lo, hi = CONTENT_BAND
    rows = [r for r in rows if lo <= r[1] <= hi]
    rows.sort(key=lambda r: (r[0], -r[1], r[2]))
    return [(r[3], r[4], r[5]) for r in rows]


# ---------------------------------------------------------------------------
# Ray stages
# ---------------------------------------------------------------------------


def attach_span_pdf_payloads(batch: pa.Table) -> pa.Table:
    """Fixture stage for the interleaved-corpus leg: nested (doc_id,
    spans) -> (doc_id, payload) typeset PDFs; spans column dropped."""
    ids = batch["doc_id"].to_pylist()
    span_lists = batch["spans"].to_pylist()
    pdfs = [encode_span_pdf(i, sp) for i, sp in zip(ids, span_lists)]
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.string()),
            "payload": pa.array(pdfs, type=pa.large_binary()),
        }
    )


class PdfSpanExtractor:
    """Decode/extract stage (task-pooled with per-worker instance reuse via ``stateless_stage`` — an actor pool would pay its spin-up per query): recover the flagship span sequence (kind, text,
    media_ref, order) from typeset PDFs — object-graph XObject resolution
    for media refs, position-band chrome strip, reading-order sort. Same
    flat output schema (and oracle) as the flagship ``extract_spans``."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, kinds, texts, refs, offsets = [], [], [], [], []
        for doc_id, buf in zip(
            batch["doc_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            for off, (kind, text, ref) in enumerate(decode_span_pdf(buf)):
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


def attach_pdf_payloads(batch: pa.Table) -> pa.Table:
    """Fixture stage: (doc_id, text) -> (doc_id, payload) with the text
    typeset into a real PDF. The text column is DROPPED so the extractor
    can only recover it by parsing the file."""
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    pdfs = [encode_pdf(d, t) for d, t in zip(ids, texts)]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "payload": pa.array(pdfs, type=pa.large_binary()),
        }
    )


class PdfTextExtractor:
    """Decode/extract stage (task-pooled with per-worker instance reuse via ``stateless_stage`` — an actor pool would pay its spin-up per query): full PDF parse (xref, object graph, inflate,
    text operators) + reading-order reassembly. Output schema: doc_id,
    extracted_text, n_pages, n_chunks."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts, np_l, nc_l = [], [], []
        for buf in batch["payload"].to_pylist():
            text, n_pages, n_chunks = decode_pdf(buf)
            texts.append(text)
            np_l.append(n_pages)
            nc_l.append(n_chunks)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "extracted_text": pa.array(texts, type=pa.string()),
                "n_pages": pa.array(np.asarray(np_l, dtype=np.int64)),
                "n_chunks": pa.array(np.asarray(nc_l, dtype=np.int64)),
            }
        )


# ---------------------------------------------------------------------------
# Two-column (newspaper) layout leg: column detection for reading order
# ---------------------------------------------------------------------------

COL_WORDS_PER_LINE = 4
COL_ROWS = 10
X_COLS = (72.0, 320.0)
COLUMN_GAP_MIN = 60.0  # x gap that separates two columns


def encode_twocol_pdf(doc_id: int, text: str) -> bytes:
    """Typeset a document in TWO newspaper columns per page: 4-word
    lines fill the LEFT column top-to-bottom (10 rows), then the RIGHT
    column, then the next page. Reading order is column-major, so a
    naive (-y, x) sort interleaves the columns and scrambles the text —
    the extractor must detect the column structure. Content-stream
    emission order is rotated as in ``encode_pdf`` (stream order is
    neither reading order nor row order), and the string-form rotation
    (hex / literal / TJ-array) applies per chunk."""
    d = int(doc_id)
    words = text.split(" ")
    lines = [
        words[i : i + COL_WORDS_PER_LINE]
        for i in range(0, len(words), COL_WORDS_PER_LINE)
    ]
    per_page = 2 * COL_ROWS
    pages = [lines[i : i + per_page] for i in range(0, len(lines), per_page)]
    if not pages:
        pages = [[]]
    n_pages = len(pages)

    page_ids = [5 + 2 * p for p in range(n_pages)]
    kids = " ".join(f"{pid} 0 R" for pid in page_ids)
    objs: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode(),
        3: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }

    base = 0
    line_bases = []
    for ln in lines:
        line_bases.append(base)
        base += len(ln)

    for p, page_lines in enumerate(pages):
        ops = ["BT /F1 12 Tf"]
        k = len(page_lines)
        for j in range(k):
            jl = (j + d) % k if k else 0  # rotated emission order
            g = per_page * p + jl
            col, row = divmod(jl, COL_ROWS)
            x = X_COLS[col]
            y = Y_TOP - LEADING * row
            ops.append(f"1 0 0 1 {x:g} {y:g} Tm")
            ops.append(
                _chunk_ops(" ".join(page_lines[jl]), d, g, line_bases[g])
            )
        ops.append("ET")
        stream = zlib.compress("\n".join(ops).encode("utf-8"), 6)
        objs[4 + 2 * p] = (
            f"<< /Length {len(stream)} /Filter /FlateDecode >>\nstream\n".encode()
            + stream
            + b"\nendstream"
        )
        objs[5 + 2 * p] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {4 + 2 * p} 0 R >>"
        ).encode()
    return _serialize_pdf(objs)


def detect_columns(xs: list[float]) -> list[float]:
    """1-D cluster of chunk x-positions into column anchors: sort the
    distinct x values and split wherever adjacent values are more than
    ``COLUMN_GAP_MIN`` apart; each cluster's anchor is its minimum.
    Returns anchors left-to-right (single-column pages yield one)."""
    uniq = sorted(set(xs))
    if not uniq:
        return []
    anchors = [uniq[0]]
    for a, b in zip(uniq, uniq[1:]):
        if b - a > COLUMN_GAP_MIN:
            anchors.append(b)
    return anchors


def decode_twocol_pdf(buf: bytes) -> tuple[str, int, int]:
    """PDF bytes -> (reading-order text, n_pages, n_lines) with COLUMN
    detection: chunks cluster into columns by x-gap, columns read
    left-to-right, each top-to-bottom — the layout heuristic a
    single-sort reading order cannot express."""
    doc = PdfDocument(buf)
    pages = doc.pages()
    parts: list[str] = []
    n_lines = 0
    for page in pages:
        content = doc.obj(page["Contents"])
        chunks = _content_chunks(content["__stream__"])
        if not chunks:
            continue
        anchors = detect_columns([c[0] for c in chunks])

        def col_of(x: float) -> int:
            ci = 0
            for i, a in enumerate(anchors):
                if x >= a - 1e-6:
                    ci = i
            return ci

        ordered = sorted(chunks, key=lambda c: (col_of(c[0]), -c[1], c[0]))
        parts.extend(c[2] for c in ordered)
        n_lines += len(chunks)
    return " ".join(parts), len(pages), n_lines


def attach_twocol_payloads(batch: pa.Table) -> pa.Table:
    """Fixture stage: (doc_id, text) -> (doc_id, payload), two-column
    typeset; the text column is dropped."""
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    pdfs = [encode_twocol_pdf(d, t) for d, t in zip(ids, texts)]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "payload": pa.array(pdfs, type=pa.large_binary()),
        }
    )


class PdfTwoColExtractor:
    """Decode/extract stage (task-pooled with per-worker instance reuse via ``stateless_stage`` — an actor pool would pay its spin-up per query): two-column PDF parse + column-aware reading
    order. Output schema: doc_id, extracted_text, n_pages, n_lines."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts, np_l, nl_l = [], [], []
        for buf in batch["payload"].to_pylist():
            text, n_pages, n_lines = decode_twocol_pdf(buf)
            texts.append(text)
            np_l.append(n_pages)
            nl_l.append(n_lines)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "extracted_text": pa.array(texts, type=pa.string()),
                "n_pages": pa.array(np.asarray(np_l, dtype=np.int64)),
                "n_lines": pa.array(np.asarray(nl_l, dtype=np.int64)),
            }
        )


# ---------------------------------------------------------------------------
# Hyphenation leg: line-width typesetting with word splits the extractor
# must rejoin (de-hyphenation)
# ---------------------------------------------------------------------------

HYPH_LINE_CHARS = 12
HYPH_LINES_PER_PAGE = 12


def _hyphen_lines(words: list[str]) -> list[str]:
    """Greedy fixed-width line fill: words join with single spaces; a
    word that does not fit is SPLIT with a trailing hyphen whenever at
    least two of its characters (plus the hyphen) fit, else it moves to
    the next line whole (splitting recurses for words longer than a full
    line). Corpus words never contain '-', so every trailing hyphen is a
    break — the invariant de-hyphenation relies on."""
    lines: list[str] = []
    cur = ""
    for w in words:
        rest = w
        while True:
            need = (1 if cur else 0) + len(rest)
            room = HYPH_LINE_CHARS - len(cur)
            if need <= room:
                cur = f"{cur} {rest}" if cur else rest
                break
            # room for at least 2 chars + '-' after the separator?
            avail = room - (1 if cur else 0)
            if avail >= 3 and len(rest) >= 4:
                head, rest = rest[: avail - 1], rest[avail - 1 :]
                cur = (f"{cur} {head}" if cur else head) + "-"
            lines.append(cur)
            cur = ""
    if cur:
        lines.append(cur)
    return lines


def encode_hyphen_pdf(doc_id: int, text: str) -> bytes:
    """Typeset with fixed line width and hyphenated word breaks — the
    layout every justified-text PDF exhibits and every extractor must
    undo. Single column; rotated stream-emission order and rotating
    string forms as in ``encode_pdf``."""
    d = int(doc_id)
    lines = _hyphen_lines(text.split(" "))
    pages = [
        lines[i : i + HYPH_LINES_PER_PAGE]
        for i in range(0, len(lines), HYPH_LINES_PER_PAGE)
    ]
    if not pages:
        pages = [[""]]
    n_pages = len(pages)

    page_ids = [5 + 2 * p for p in range(n_pages)]
    kids = " ".join(f"{pid} 0 R" for pid in page_ids)
    objs: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode(),
        3: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    for p, page_lines in enumerate(pages):
        ops = ["BT /F1 12 Tf"]
        k = len(page_lines)
        for j in range(k):
            jl = (j + d) % k if k else 0
            g = HYPH_LINES_PER_PAGE * p + jl
            y = Y_TOP - LEADING * jl
            ops.append(f"1 0 0 1 {X_LEFT:g} {y:g} Tm")
            ops.append(_chunk_ops(page_lines[jl], d, g, g * 8))
        ops.append("ET")
        stream = zlib.compress("\n".join(ops).encode("utf-8"), 6)
        objs[4 + 2 * p] = (
            f"<< /Length {len(stream)} /Filter /FlateDecode >>\nstream\n".encode()
            + stream
            + b"\nendstream"
        )
        objs[5 + 2 * p] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {4 + 2 * p} 0 R >>"
        ).encode()
    return _serialize_pdf(objs)


def decode_hyphen_pdf(buf: bytes) -> tuple[str, int, int]:
    """PDF bytes -> (de-hyphenated reading-order text, n_pages,
    n_hyphen_joins): reading-order sort, then every line ending in '-'
    merges with the following line's first token (no space, hyphen
    dropped) — iterated, so a word split across three lines rejoins."""
    doc = PdfDocument(buf)
    pages = doc.pages()
    lines: list[str] = []
    for pi, page in enumerate(pages):
        content = doc.obj(page["Contents"])
        chunks = _content_chunks(content["__stream__"])
        chunks.sort(key=lambda c: (-c[1], c[0]))
        lines.extend(c[2] for c in chunks)
    joins = 0
    out_words: list[str] = []
    carry = ""
    for line in lines:
        if not line:
            continue
        words = line.split(" ")
        if carry:
            words[0] = carry + words[0]
            carry = ""
        if words and words[-1].endswith("-"):
            joins += 1
            carry = words.pop()[:-1]
        out_words.extend(w for w in words if w)
    if carry:
        out_words.append(carry)
    return " ".join(out_words), len(pages), joins


def attach_hyphen_payloads(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    pdfs = [encode_hyphen_pdf(d, t) for d, t in zip(ids, texts)]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "payload": pa.array(pdfs, type=pa.large_binary()),
        }
    )


class PdfDehyphenExtractor:
    """Decode/extract stage (task-pooled with per-worker instance reuse via ``stateless_stage`` — an actor pool would pay its spin-up per query): fixed-width hyphenated typesetting -> original
    text. Output schema: doc_id, extracted_text, n_pages, n_joins."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts, np_l, nj_l = [], [], []
        for buf in batch["payload"].to_pylist():
            text, n_pages, n_joins = decode_hyphen_pdf(buf)
            texts.append(text)
            np_l.append(n_pages)
            nj_l.append(n_joins)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "extracted_text": pa.array(texts, type=pa.string()),
                "n_pages": pa.array(np.asarray(np_l, dtype=np.int64)),
                "n_joins": pa.array(np.asarray(nj_l, dtype=np.int64)),
            }
        )
