"""REAL compressed-image codec #3: GIF87a (LZW, implemented from the spec).

PNG answered the DEFLATE leg and JPEG the lossy-DCT leg; GIF closes the
dictionary-coder leg with a complete from-scratch LZW — no stdlib codec
exists for LZW, so unlike PNG both directions here are hand-rolled:
variable-width codes (9..12 bits, LSB-first bit packing), CLEAR/EOI
control codes, dictionary growth with the 4096-entry reset, and the
KwKwK corner case on decode. Framing is full GIF87a: logical screen
descriptor, 256-entry global color table (grayscale ramp, so palette
index == sample value), image descriptor, 255-byte data sub-blocks,
trailer.

GIF is lossless over a paletted source, so the closed-form fixture image
round-trips bit-exactly and ``media_gif_features``'s decoded statistics
are oracle-checked end to end — a bit-packing, dictionary, or sub-block
framing bug fails the hash.

Scale shape: identical contract to ``stages/png.py`` — per-payload decode
(each payload is its own file) inside small pyarrow batches of wide
binary rows on an actor pool; parallelism comes from the pool, state
(none needed here) would live in ``__init__``.

Reference parity note: the reference runtime (pombreda/ocr) has no media
codecs; this module serves the BASELINE.json extraction target
(interleaved text + media documents), like the other codec stages.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

GIF_W, GIF_H = 16, 8  # fixture dims (match the PPM/PNG fixture raster)

_CLEAR = 256
_EOI = 257
_MAX_CODE = 4095  # 12-bit ceiling per the GIF spec


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


class _BitPacker:
    """LSB-first bit packer (GIF packs code bits little-endian)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def put(self, code: int, width: int) -> None:
        self.cur |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.cur & 0xFF)
            self.cur >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.cur & 0xFF)
            self.cur = 0
            self.nbits = 0
        return bytes(self.out)


def _lzw_encode(data: bytes, min_code_size: int = 8) -> bytes:
    """GIF-variant LZW: emit CLEAR, grow code width as the dictionary
    fills, reset at 4096 entries, finish with EOI."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    pk = _BitPacker()

    def fresh() -> tuple[dict[bytes, int], int, int]:
        return (
            {bytes([i]): i for i in range(1 << min_code_size)},
            eoi + 1,
            min_code_size + 1,
        )

    table, next_code, width = fresh()
    pk.put(clear, width)
    w = b""
    for ch in data:
        wk = w + bytes([ch])
        if wk in table:
            w = wk
            continue
        pk.put(table[w], width)
        if next_code <= _MAX_CODE:
            table[wk] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            pk.put(clear, width)
            table, next_code, width = fresh()
        w = bytes([ch])
    if w:
        pk.put(table[w], width)
    pk.put(eoi, width)
    return pk.flush()


def encode_gif(img: np.ndarray) -> bytes:
    """Encode a (h, w) uint8 grayscale raster as a GIF87a file with a
    256-entry grayscale global color table (index == sample value)."""
    assert img.ndim == 2 and img.dtype == np.uint8
    h, w = img.shape
    out = bytearray(b"GIF87a")
    # logical screen descriptor: GCT present, 8-bit color, 256 entries
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    ramp = np.repeat(np.arange(256, dtype=np.uint8), 3)
    out += ramp.tobytes()  # grayscale palette
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x00)  # image descriptor
    out.append(8)  # LZW minimum code size
    comp = _lzw_encode(img.tobytes(), 8)
    for lo in range(0, len(comp), 255):
        chunk = comp[lo : lo + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0x00)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """LSB-first bit reader over the concatenated data sub-blocks."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.cur = 0
        self.nbits = 0

    def get(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("GIF: LZW stream truncated")
            self.cur |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.cur & ((1 << width) - 1)
        self.cur >>= width
        self.nbits -= width
        return v


def _lzw_decode(data: bytes, min_code_size: int, n_out: int) -> bytes:
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    rd = _BitReader(data)
    out = bytearray()

    def fresh() -> tuple[list[bytes], int]:
        return [bytes([i]) for i in range(1 << min_code_size)] + [b"", b""], min_code_size + 1

    table, width = fresh()
    prev: bytes | None = None
    while len(out) < n_out:
        code = rd.get(width)
        if code == clear:
            table, width = fresh()
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK: code not yet in the table
        else:
            raise ValueError(f"GIF: invalid LZW code {code}")
        out += entry
        if prev is not None and len(table) <= _MAX_CODE:
            table.append(prev + entry[:1])
            # width grows when the NEXT code would not fit
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_out:
        raise ValueError("GIF: decoded fewer pixels than the raster needs")
    return bytes(out[:n_out])


def decode_gif(buf: bytes) -> np.ndarray:
    """Decode a GIF87a/89a file to a (h, w, 3) uint8 RGB raster via the
    global color table (local tables and interlace are rejected loudly —
    the fixture never writes them, and silent misdecodes are worse than
    an error)."""
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("GIF: bad signature")
    sw, sh, packed, _bg, _par = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(buf, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(buf):
        block = buf[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 2
            while pos < len(buf) and buf[pos] != 0:
                pos += 1 + buf[pos]
            if pos >= len(buf):
                raise ValueError("GIF: truncated extension block")
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{block:02x}")
        _l, _t, w, h, ipacked = struct.unpack_from("<HHHHB", buf, pos + 1)
        pos += 10
        if ipacked & 0x40:
            raise ValueError("GIF: interlaced images not supported")
        if ipacked & 0x80:
            raise ValueError("GIF: local color tables not supported")
        if gct is None:
            raise ValueError("GIF: no color table")
        if pos >= len(buf):
            raise ValueError("GIF: truncated before LZW code size")
        min_code = buf[pos]
        pos += 1
        comp = bytearray()
        while True:
            if pos >= len(buf):
                raise ValueError("GIF: truncated inside data sub-blocks")
            ln = buf[pos]
            if ln == 0:
                pos += 1
                break
            if pos + 1 + ln > len(buf):
                raise ValueError("GIF: truncated data sub-block")
            comp += buf[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        idx = np.frombuffer(
            _lzw_decode(bytes(comp), min_code, w * h), np.uint8
        ).reshape(h, w)
        return gct[idx]  # palette lookup -> (h, w, 3)
    raise ValueError("GIF: no image block")


# ---------------------------------------------------------------------------
# Fixture + stage
# ---------------------------------------------------------------------------


def gif_image(m: int) -> np.ndarray:
    """Deterministic (GIF_H, GIF_W) grayscale test raster for media_ref
    suffix m: pixel = (41*m + 23 + 17*y + 5*x) mod 256 — closed form, so
    the decoded statistics are SQL-expressible."""
    y = np.arange(GIF_H, dtype=np.int64)[:, None]
    x = np.arange(GIF_W, dtype=np.int64)[None, :]
    return ((41 * m + 23 + 17 * y + 5 * x) % 256).astype(np.uint8)


def attach_gif_payloads(batch: pa.Table) -> pa.Table:
    """Fixture stage: attach real GIF87a-encoded payloads to media rows."""
    from ocr_ray.stages.media import _ref_numbers

    ms = _ref_numbers(batch["media_ref"])
    payloads = [encode_gif(gif_image(int(m))) for m in ms]
    batch = batch.append_column("payload", pa.array(payloads, type=pa.large_binary()))
    return batch.append_column(
        "media_kind", pa.array(np.full(batch.num_rows, "image/gif"), type=pa.string())
    )


class GifDecoder:
    """Decode/extract stage (task-pooled with per-worker instance reuse via ``stateless_stage`` — an actor pool would pay its spin-up per query): REAL GIF decode (sub-block walk, LZW, palette
    lookup) + grayscale statistics. Output schema mirrors the other image
    decoders (width/height + per-image stats)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        w_l, h_l, mean_l, first_l, last_l = [], [], [], [], []
        for buf in batch["payload"].to_pylist():
            rgb = decode_gif(buf)
            gray = rgb[:, :, 0]  # grayscale ramp palette: R==G==B
            h_l.append(gray.shape[0])
            w_l.append(gray.shape[1])
            mean_l.append(float(gray.sum(dtype=np.int64)) / gray.size)
            first_l.append(int(gray[0, 0]))
            last_l.append(int(gray[-1, -1]))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media_ref": batch["media_ref"],
                "width": pa.array(np.asarray(w_l, dtype=np.int64)),
                "height": pa.array(np.asarray(h_l, dtype=np.int64)),
                "mean_gray": pa.array(np.asarray(mean_l, dtype=np.float64)),
                "first_px": pa.array(np.asarray(first_l, dtype=np.int64)),
                "last_px": pa.array(np.asarray(last_l, dtype=np.int64)),
            }
        )
