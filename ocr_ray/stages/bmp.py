"""REAL codec: BMP (Windows DIB, 24-bit uncompressed) — pure numpy.

Third real image format beside PPM (stages/media.py) and PNG
(stages/png.py), chosen because its quirks are DIFFERENT from both:
BGR channel order, BOTTOM-UP row storage, and 4-byte row padding — the
three classic BMP decode bugs. The fixture width (18 px → 54-byte rows
padded to 56) makes the padding nonzero so a stride bug cannot pass.

Same contract as the other codec legs: genuine parser (magic, header
sizes, bpp/compression validation, signed height for row order),
closed-form synthetic image, oracle-checked decoded statistics.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ocr_ray.stages.media import _ref_numbers

BMP_W, BMP_H = 18, 6


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed BMP bytes (bottom-up
    BGR rows, 4-byte-aligned stride)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8, (img.shape, img.dtype)
    stride = (w * 3 + 3) & ~3
    pad = stride - w * 3
    # bottom-up rows, RGB -> BGR
    rows = img[::-1, :, ::-1]
    raster = bytearray()
    padding = b"\x00" * pad
    for row in rows:
        raster += row.tobytes() + padding
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(raster), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0
    )
    return header + info + bytes(raster)


def decode_bmp(buf: bytes) -> np.ndarray:
    """BMP bytes -> (h, w, 3) uint8 RGB. Real parser: validates the BM
    magic, header size, planes/bpp/compression; honors the pixel-data
    offset from the file header; handles BOTH bottom-up (positive
    height) and top-down (negative) row order; strips row padding and
    swaps BGR back to RGB."""
    if buf[:2] != b"BM":
        raise ValueError(f"not a BMP (magic {buf[:2]!r})")
    _, _size, _r1, _r2, off = struct.unpack_from("<2sIHHI", buf, 0)
    hdr_size, w, h = struct.unpack_from("<Iii", buf, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    planes, bpp, compression = struct.unpack_from("<HHI", buf, 26)
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"only 24-bit uncompressed BMP supported (planes={planes}, "
            f"bpp={bpp}, compression={compression})"
        )
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    raster = np.frombuffer(buf, dtype=np.uint8, count=stride * h, offset=off)
    rows = raster.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1]  # BGR -> RGB


def bmp_image(m: int) -> np.ndarray:
    """Deterministic (BMP_H, BMP_W, 3) test image for media_ref suffix m:
    pixel = (43*m + 7 + 19*y + 11*x + 23*c) mod 256 — closed-form, so the
    decoded channel means are SQL-expressible."""
    y = np.arange(BMP_H, dtype=np.int64)[:, None, None]
    x = np.arange(BMP_W, dtype=np.int64)[None, :, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]
    return ((43 * m + 7 + 19 * y + 11 * x + 23 * c) % 256).astype(np.uint8)


def attach_bmp_payloads(batch: pa.Table) -> pa.Table:
    """Fixture stage: attach real BMP-encoded payloads to media rows."""
    ms = _ref_numbers(batch["media_ref"])
    payloads = [encode_bmp(bmp_image(int(m))) for m in ms]
    batch = batch.append_column(
        "payload", pa.array(payloads, type=pa.large_binary())
    )
    return batch.append_column(
        "media_kind",
        pa.array(np.full(batch.num_rows, "image/bmp"), type=pa.string()),
    )


class BmpDecoder:
    """Decode/extract stage (task-pooled with per-worker instance reuse via ``stateless_stage`` — an actor pool would pay its spin-up per query): REAL BMP decode + per-channel statistics (same
    output contract as ``PpmDecoder``)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        w_l, h_l, means = [], [], []
        for buf in payloads:
            img = decode_bmp(buf)
            h_l.append(img.shape[0])
            w_l.append(img.shape[1])
            means.append(
                img.reshape(-1, 3).sum(axis=0, dtype=np.int64).astype(np.float64)
                / float(img.shape[0] * img.shape[1])
            )
        mm = np.stack(means) if means else np.empty((0, 3))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media_ref": batch["media_ref"],
                "width": pa.array(np.asarray(w_l, dtype=np.int64)),
                "height": pa.array(np.asarray(h_l, dtype=np.int64)),
                "mean_r": pa.array(mm[:, 0] if len(mm) else np.empty(0)),
                "mean_g": pa.array(mm[:, 1] if len(mm) else np.empty(0)),
                "mean_b": pa.array(mm[:, 2] if len(mm) else np.empty(0)),
            }
        )
