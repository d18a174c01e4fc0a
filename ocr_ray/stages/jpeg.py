"""REAL codec path #4: baseline JPEG (ITU-T T.81 sequential DCT, grayscale).

The one compressed format feasible without native libs: a genuine
encoder + decoder in pure numpy/Python — markers (SOI/DQT/SOF0/DHT/SOS/
EOI), quantization, zigzag, canonical Huffman entropy coding with byte
stuffing, and a full dequantize -> IDCT -> level-shift -> clamp decode.
MP3/H.264 stay stubbed (``stages/media.py``) — they are not feasible
without ffmpeg-class dependencies.

Two deliberate choices keep the *pipeline* oracle-checkable even though
JPEG is lossy:

- **Huffman tables are custom but valid.** T.81 allows any table that
  satisfies the canonical-code constraints (Annex K's tables are only
  "typical"); we declare flat tables in the DHT segment (12 DC symbols
  at 5 bits, 162 AC symbols at 8 bits), so the bytestream is honest
  baseline JPEG that any standard decoder could read.
- **The synthetic test image is constant within each 8x8 block** and
  the DC quantizer step is 8. The DCT of a constant block is DC-only
  with DC = 8*(v-128), so quantization at step 8 is EXACT and the
  encode->decode round trip is lossless for these images — the decoded
  statistics are closed-form in (media_ref, block index) and therefore
  SQL-expressible (see ``media_jpeg_features``). The decoder itself is
  general: the AC path (run-lengths, ZRL, EOB, coefficient extend) is
  exercised by tests on non-constant images.

Reference parity note: the reference runtime (pombreda/ocr) has no
codecs at all — this module exists for the LLM-data-pipeline multimodal
surface (SURVEY.md §2.5), mirroring the PPM/WAV/Y4M real-decode trio in
``stages/media.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# ---------------------------------------------------------------------------
# Tables
# ---------------------------------------------------------------------------

JPG_W, JPG_H = 16, 16  # fixture dims: 2x2 grid of 8x8 blocks


def _zigzag_order() -> np.ndarray:
    """The T.81 zigzag scan as flat indices into a row-major 8x8 block."""
    cells = [(i, j) for i in range(8) for j in range(8)]
    cells.sort(key=lambda p: (p[0] + p[1], p[0] if (p[0] + p[1]) % 2 else -p[0]))
    return np.array([i * 8 + j for i, j in cells], dtype=np.int64)


ZIGZAG = _zigzag_order()
UNZIGZAG = np.argsort(ZIGZAG)

# Quantization table (in zigzag order inside the file, natural order here):
# DC step 8 (exact for block-constant images, see module doc), AC step 16.
QUANT = np.full((8, 8), 16, dtype=np.int64)
QUANT[0, 0] = 8

# Huffman specs: (bits[1..16] counts, symbol values). Canonical codes are
# assigned shortest-first in value order (T.81 Annex C).
_DC_BITS = [0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))  # categories 0..11
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0]
_AC_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical assignment per T.81 Annex C."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _build_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _build_codes(_AC_BITS, _AC_VALS)

# 8x8 DCT-II basis with JPEG normalization: F = M @ f @ M.T, f = M.T @ F @ M
_x = np.arange(8)
_M = 0.5 * np.cos((2 * _x[None, :] + 1) * _x[:, None] * np.pi / 16)
_M[0, :] *= 1 / np.sqrt(2)


# ---------------------------------------------------------------------------
# Bit I/O (per-image; images are small, batches are small — the same
# per-item shape as every real codec stage in stages/media.py)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


class _BitReader:
    """Reads the entropy-coded segment with 0xFF00 unstuffing."""

    def __init__(self, buf: bytes, start: int):
        self.buf = buf
        self.i = start
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.buf[self.i]
        if b == 0xFF:
            nxt = self.buf[self.i + 1]
            if nxt == 0x00:
                self.i += 2
            else:
                raise ValueError(f"marker 0xFF{nxt:02X} inside entropy data")
        else:
            self.i += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_magnitude(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _quantize(coefs: np.ndarray) -> np.ndarray:
    """Round-half-away-from-zero quantization (sign-symmetric, like the
    reference descale in every baseline implementation)."""
    q = coefs / QUANT
    return np.where(q >= 0, np.floor(q + 0.5), np.ceil(q - 0.5)).astype(np.int64)


def encode_jpeg(img: np.ndarray) -> bytes:
    """(h, w) uint8 grayscale -> baseline sequential JPEG bytes. Any dims:
    SOF0 declares the true (h, w); the sample grid is padded to full 8x8
    MCUs by edge replication per T.81 (the decoder crops back)."""
    h, w = img.shape
    assert img.dtype == np.uint8 and h > 0 and w > 0, (img.shape, img.dtype)
    pad_h, pad_w = (-h) % 8, (-w) % 8
    if pad_h or pad_w:
        img = np.pad(img, ((0, pad_h), (0, pad_w)), mode="edge")

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT: Pq=0 (8-bit), Tq=0, 64 entries in zigzag order
    out += seg(0xDB, bytes([0x00]) + bytes(int(v) for v in QUANT.reshape(-1)[ZIGZAG]))
    # SOF0: precision 8, dims, 1 component (id 1, sampling 1x1, quant table 0)
    out += seg(
        0xC0,
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([1, 1, 0x11, 0]),
    )
    # DHT: DC table (class 0, id 0) then AC table (class 1, id 0)
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    # SOS: 1 component, DC/AC table 0, spectral selection 0..63
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    bw = _BitWriter()
    pred = 0
    shifted = img.astype(np.float64) - 128.0
    ph, pw = img.shape  # padded MCU grid; SOF0 above declares the true dims
    for by in range(ph // 8):
        for bx in range(pw // 8):
            block = shifted[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            zz = _quantize(_M @ block @ _M.T).reshape(-1)[ZIGZAG]
            # DC: differential + category bits
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            size = _category(diff)
            c, l = _DC_CODES[size]
            bw.write(c, l)
            if size:
                bw.write(_encode_magnitude(diff, size), size)
            # AC: run-length of zeros, ZRL for 16, EOB for trailing zeros
            run = 0
            nz = np.nonzero(zz[1:])[0]
            last = nz[-1] + 1 if len(nz) else 0
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    c, l = _AC_CODES[0xF0]
                    bw.write(c, l)
                    run -= 16
                size = _category(v)
                c, l = _AC_CODES[(run << 4) | size]
                bw.write(c, l)
                bw.write(_encode_magnitude(v, size), size)
                run = 0
            if last < 63:
                c, l = _AC_CODES[0x00]
                bw.write(c, l)
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline sequential grayscale JPEG -> (h, w) uint8. A real decoder:
    marker walk, DQT/DHT/SOF0/SOS parsing, canonical Huffman decode with
    byte unstuffing, coefficient extend, dequantize, de-zigzag, IDCT,
    level shift + clamp."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError(f"not a JPEG (no SOI, got {buf[:2]!r})")
    i = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = None
    comp_dc = comp_ac = comp_q = 0
    scan_start = None
    while scan_start is None:
        if buf[i] != 0xFF:
            raise ValueError(f"expected marker at {i}, got {buf[i]:#x}")
        marker = buf[i + 1]
        if marker == 0xD9:
            raise ValueError("EOI before SOS (no image data)")
        ln = int.from_bytes(buf[i + 2 : i + 4], "big")
        body = buf[i + 4 : i + 2 + ln]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0xF
                if pq != 0:
                    raise ValueError("only 8-bit quant tables supported")
                tbl = np.frombuffer(body[j + 1 : j + 65], dtype=np.uint8).astype(np.int64)
                quant[tq] = tbl[UNZIGZAG].reshape(8, 8)
                j += 65
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0xF
                bits = list(body[j + 1 : j + 17])
                nvals = sum(bits)
                vals = list(body[j + 17 : j + 17 + nvals])
                table = {}
                code = 0
                k = 0
                for length in range(1, 17):
                    for _ in range(bits[length - 1]):
                        table[(length, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(tc, th)] = table
                j += 17 + nvals
        elif marker == 0xC0:  # SOF0 baseline
            if body[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            if body[5] != 1:
                raise ValueError("only single-component (grayscale) supported")
            comp_q = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            raise ValueError(f"non-baseline SOF marker 0xFF{marker:02X} unsupported")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            if ns != 1:
                raise ValueError("only single-component scans supported")
            comp_dc, comp_ac = body[2] >> 4, body[2] & 0xF
            scan_start = i + 2 + ln
        i += 2 + ln
    if h is None or w is None:
        raise ValueError("no SOF0 before SOS")
    dc_tbl = huff[(0, comp_dc)]
    ac_tbl = huff[(1, comp_ac)]
    q = quant[comp_q]

    br = _BitReader(buf, scan_start)

    def read_symbol(table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy data")

    # Decode the full MCU grid (ceil division: partial MCUs at the right/
    # bottom edges are whole 8x8 blocks in the entropy data, T.81 A.2.1),
    # then crop to the SOF-declared dims.
    bh, bw_ = (h + 7) // 8, (w + 7) // 8
    img = np.empty((bh * 8, bw_ * 8), dtype=np.uint8)
    pred = 0
    for by in range(bh):
        for bx in range(bw_):
            zz = np.zeros(64, dtype=np.int64)
            size = read_symbol(dc_tbl)
            if size:
                pred += _extend(br.read_bits(size), size)
            zz[0] = pred
            k = 1
            while k < 64:
                sym = read_symbol(ac_tbl)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                run, size = sym >> 4, sym & 0xF
                k += run
                if k > 63:
                    raise ValueError("AC run past end of block")
                zz[k] = _extend(br.read_bits(size), size)
                k += 1
            coefs = np.zeros(64, dtype=np.int64)
            coefs[ZIGZAG] = zz
            block = _M.T @ (coefs.reshape(8, 8) * q).astype(np.float64) @ _M
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                np.round(block + 128.0), 0, 255
            ).astype(np.uint8)
    return img[:h, :w]


# ---------------------------------------------------------------------------
# Fixture + actor stage (the same contract as PPM/WAV/Y4M in stages/media.py)
# ---------------------------------------------------------------------------


def jpeg_block_value(m: int, b: int) -> int:
    """Closed-form value of 8x8 block b (row-major) for media_ref suffix m."""
    return (37 * m + 11 + 53 * b) % 256


def jpeg_image(m: int) -> np.ndarray:
    """Deterministic (JPG_H, JPG_W) uint8 grayscale image, CONSTANT within
    each 8x8 block — DC-only under DCT, so the q00=8 round trip is exact
    and the decoded per-image luma sum is SQL-expressible."""
    bh, bw_ = JPG_H // 8, JPG_W // 8
    vals = np.array(
        [[jpeg_block_value(m, by * bw_ + bx) for bx in range(bw_)] for by in range(bh)],
        dtype=np.uint8,
    )
    return np.kron(vals, np.ones((8, 8), dtype=np.uint8))


def attach_jpeg_payloads(batch: pa.Table) -> pa.Table:
    """Fixture stage: attach real baseline-JPEG payloads to media rows."""
    from ocr_ray.stages.media import _ref_numbers

    ms = _ref_numbers(batch["media_ref"])
    payloads = [encode_jpeg(jpeg_image(int(m))) for m in ms]
    batch = batch.append_column("payload", pa.array(payloads, type=pa.large_binary()))
    return batch.append_column(
        "media_kind",
        pa.array(np.full(batch.num_rows, "image/jpeg"), type=pa.string()),
    )


class JpegDecoder:
    """Decode/extract stage (task-pooled with per-worker instance reuse via ``stateless_stage`` — an actor pool would pay its spin-up per query): REAL baseline-JPEG decode + integer-exact image
    statistics (dims, luma sum, first/last pixel). Decoding is per item
    (each payload is its own bytestream) inside small batches of wide
    binary rows — the real-codec shape shared by PpmDecoder/WavDecoder."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        w_l, h_l, s_l, p0, p1 = [], [], [], [], []
        for buf in batch["payload"].to_pylist():
            img = decode_jpeg(buf)
            h_l.append(img.shape[0])
            w_l.append(img.shape[1])
            s_l.append(int(img.sum(dtype=np.int64)))
            p0.append(int(img[0, 0]))
            p1.append(int(img[-1, -1]))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media_ref": batch["media_ref"],
                "width": pa.array(np.asarray(w_l, dtype=np.int64)),
                "height": pa.array(np.asarray(h_l, dtype=np.int64)),
                "luma_sum": pa.array(np.asarray(s_l, dtype=np.int64)),
                "first_px": pa.array(np.asarray(p0, dtype=np.int64)),
                "last_px": pa.array(np.asarray(p1, dtype=np.int64)),
            }
        )
