"""TFRecord source + sink: the training-ecosystem interchange format.

From-scratch implementations of the two public wire formats involved —
no TensorFlow dependency:

* the TFRecord framing (per record: uint64-LE length, masked CRC32C of
  the length bytes, payload, masked CRC32C of the payload; CRC32C is the
  Castagnoli polynomial, mask = ``((crc >> 15) | (crc << 17)) + 0xa282ead8``),
* the ``tf.train.Example`` protobuf payload (``Features`` map of name ->
  ``Feature`` with one of ``bytes_list`` / ``float_list`` / ``int64_list``),
  encoded/decoded directly at the varint/tag wire level.

Scale contract matches ``sources/formats.py``: the sink is block-parallel
(one ``part-*.tfrecord`` per Dataset block, written inside the task that
holds the block), and the reader fans out ONE TASK PER FILE — TFRecord has
no block index, so the file is the natural parallelism unit, exactly how
TF's own sharded-file convention (``name-00001-of-00128``) is consumed.
The driver never touches record bytes.

Fidelity note (inherent to the format, documented not hidden): ``float_list``
is IEEE float32, so float64 columns are written with float32 precision;
int64 and bytes/string columns round-trip bit-exact. CRCs are verified on
read by default — a flipped payload byte raises, it does not pass silently.
"""

from __future__ import annotations

import os
import struct
import uuid
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# --------------------------------------------------------------------------
# CRC32C (Castagnoli), table-driven, with the TFRecord mask
# --------------------------------------------------------------------------

_CRC_POLY = 0x82F63B78  # reflected Castagnoli polynomial


def _make_table() -> list[int]:
    tab = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ _CRC_POLY if c & 1 else c >> 1
        tab.append(c)
    return tab


_CRC_TABLE = _make_table()


def crc32c(data: bytes) -> int:
    tab = _CRC_TABLE
    c = 0xFFFFFFFF
    for b in data:
        c = tab[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def masked_crc32c(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def masked_crc32c_many(records: list[bytes]) -> np.ndarray:
    """Masked CRC32C of MANY byte strings at once, vectorized in lockstep
    across records: the per-byte table update is sequential *within* a
    record but independent *between* records, so iterating over byte
    POSITIONS (ragged rows padded into one uint8 matrix) turns N×L scalar
    steps into L numpy ops over N-vectors — the orientation that makes
    CRC verification of a whole TFRecord block ~25× cheaper than a
    python loop. Returns uint32 array aligned with ``records``."""
    n = len(records)
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    lens = np.fromiter((len(r) for r in records), dtype=np.int64, count=n)
    maxlen = int(lens.max())
    # Skew guard: the padded matrix costs n * maxlen, not total bytes. A
    # few giant records among many small ones (a 10 MB image bytes_list in
    # a sea of 100 B Examples) would blow the pad factor up — route length
    # outliers through the scalar kernel and vectorize the dense rest.
    mean_len = float(lens.mean())
    if maxlen > max(4 * mean_len, 4096):
        cut = max(int(4 * mean_len), 4096)
        out = np.empty(n, dtype=np.uint32)
        big = lens > cut
        for i in np.flatnonzero(big):
            out[i] = masked_crc32c(records[i])
        small_idx = np.flatnonzero(~big)
        if len(small_idx):
            out[small_idx] = masked_crc32c_many([records[i] for i in small_idx])
        return out
    total = int(lens.sum())
    flat = np.frombuffer(b"".join(records), dtype=np.uint8)
    mat = np.zeros((n, maxlen), dtype=np.uint8)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    rows = np.repeat(np.arange(n), lens)
    cols = np.arange(total) - np.repeat(starts, lens)
    mat[rows, cols] = flat
    tab = np.asarray(_CRC_TABLE, dtype=np.uint32)
    c = np.full(n, 0xFFFFFFFF, dtype=np.uint32)
    for j in range(maxlen):
        nc = tab[(c ^ mat[:, j]) & 0xFF] ^ (c >> np.uint32(8))
        c = np.where(lens > j, nc, c)
    c ^= np.uint32(0xFFFFFFFF)
    return ((c >> np.uint32(15)) | (c << np.uint32(17))) + np.uint32(0xA282EAD8)


# --------------------------------------------------------------------------
# minimal protobuf wire codec for tf.train.Example
# --------------------------------------------------------------------------
# Example{ features:1 } ; Features{ map<string,Feature> feature:1 } ;
# map entry { key:1 value:2 } ;
# Feature{ bytes_list:1 | float_list:2 | int64_list:3 } ;
# BytesList{ repeated bytes value:1 } ; FloatList{ repeated float value:1
# packed } ; Int64List{ repeated int64 value:1 packed }.

_WT_VARINT, _WT_LEN = 0, 2


def _uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _varint64(n: int) -> bytes:
    # protobuf int64: negative values encode as 10-byte two's complement
    return _uvarint(n & 0xFFFFFFFFFFFFFFFF)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _uvarint((field << 3) | _WT_LEN) + _uvarint(len(payload)) + payload


def _feature_bytes(v: bytes) -> bytes:
    return _len_delim(1, _len_delim(1, v))  # Feature.bytes_list.value


def _feature_float(v: float) -> bytes:
    return _len_delim(2, _len_delim(1, struct.pack("<f", v)))


def _feature_int64(v: int) -> bytes:
    return _len_delim(3, _len_delim(1, _varint64(v)))


def _example(feats: list[tuple[bytes, bytes]]) -> bytes:
    """feats: (utf-8 name, encoded Feature message) pairs."""
    body = bytearray()
    for name, feat in feats:
        entry = _len_delim(1, name) + _len_delim(2, feat)
        body += _len_delim(1, entry)  # Features.feature map entry
    return _len_delim(1, bytes(body))  # Example.features


class _PB:
    """Cursor over one protobuf message's wire bytes."""

    __slots__ = ("data", "pos", "end")

    def __init__(self, data, pos: int, end: int):
        self.data, self.pos, self.end = data, pos, end

    def uvarint(self) -> int:
        n = shift = 0
        d = self.data
        while True:
            b = d[self.pos]
            self.pos += 1
            n |= (b & 0x7F) << shift
            if not b & 0x80:
                return n
            shift += 7

    def tag(self) -> tuple[int, int]:
        t = self.uvarint()
        return t >> 3, t & 7

    def sub(self) -> "_PB":
        ln = self.uvarint()
        s = _PB(self.data, self.pos, self.pos + ln)
        self.pos += ln
        return s

    def raw(self) -> bytes:
        ln = self.uvarint()
        out = bytes(self.data[self.pos : self.pos + ln])
        self.pos += ln
        return out

    def skip(self, wt: int) -> None:
        if wt == _WT_VARINT:
            self.uvarint()
        elif wt == _WT_LEN:
            self.pos += self.uvarint()
        elif wt == 1:
            self.pos += 8
        elif wt == 5:
            self.pos += 4
        else:  # pragma: no cover - malformed input
            raise ValueError(f"tfrecord: unsupported wire type {wt}")


def _decode_feature(p: _PB):
    """Feature message -> python scalar (first value of its list)."""
    while p.pos < p.end:
        field, wt = p.tag()
        if field == 1 and wt == _WT_LEN:  # bytes_list
            bl = p.sub()
            while bl.pos < bl.end:
                f2, w2 = bl.tag()
                if f2 == 1 and w2 == _WT_LEN:
                    return bl.raw()
                bl.skip(w2)
            return None
        if field == 2 and wt == _WT_LEN:  # float_list (packed)
            fl = p.sub()
            while fl.pos < fl.end:
                f2, w2 = fl.tag()
                if f2 == 1 and w2 == _WT_LEN:
                    buf = fl.raw()
                    return struct.unpack(f"<{len(buf) // 4}f", buf)[0] if buf else None
                if f2 == 1 and w2 == 5:
                    v = struct.unpack_from("<f", fl.data, fl.pos)[0]
                    fl.pos += 4
                    return v
                fl.skip(w2)
            return None
        if field == 3 and wt == _WT_LEN:  # int64_list (packed)
            il = p.sub()
            while il.pos < il.end:
                f2, w2 = il.tag()
                if f2 == 1 and w2 == _WT_LEN:
                    pk = il.sub()
                    if pk.pos < pk.end:
                        u = pk.uvarint()
                        return u - 0x10000000000000000 if u >= 0x8000000000000000 else u
                    return None
                if f2 == 1 and w2 == _WT_VARINT:
                    u = il.uvarint()
                    return u - 0x10000000000000000 if u >= 0x8000000000000000 else u
                il.skip(w2)
            return None
        p.skip(wt)
    return None


def _decode_example(rec: bytes) -> dict:
    """tf.train.Example bytes -> {name: scalar} (missing features absent)."""
    row: dict = {}
    ex = _PB(memoryview(rec), 0, len(rec))
    while ex.pos < ex.end:
        field, wt = ex.tag()
        if field == 1 and wt == _WT_LEN:  # Example.features
            feats = ex.sub()
            while feats.pos < feats.end:
                f2, w2 = feats.tag()
                if f2 == 1 and w2 == _WT_LEN:  # map entry
                    ent = feats.sub()
                    name, feat = None, None
                    while ent.pos < ent.end:
                        f3, w3 = ent.tag()
                        if f3 == 1 and w3 == _WT_LEN:
                            name = ent.raw().decode()
                        elif f3 == 2 and w3 == _WT_LEN:
                            feat = ent.sub()
                        else:
                            ent.skip(w3)
                    if name is not None and feat is not None:
                        row[name] = _decode_feature(feat)
                else:
                    feats.skip(w2)
        else:
            ex.skip(wt)
    return row


# --------------------------------------------------------------------------
# write
# --------------------------------------------------------------------------

_ENCODERS = {
    "string": lambda v: _feature_bytes(v.encode()),
    "binary": _feature_bytes,
    "int": _feature_int64,
    "float": _feature_float,
    "bool": lambda v: _feature_int64(int(v)),
}


def _column_kind(t: pa.DataType) -> str:
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    raise ValueError(f"tfrecord sink: unsupported column type {t}")


# --------------------------------------------------------------------------
# vectorized Example encoding
# --------------------------------------------------------------------------
# A tf.train.Example is one map entry per non-null cell; with a fixed
# schema the entry structure repeats, so everything varies only in the
# VALUE bytes and the nested LENGTH varints. The encoder below builds
# each column's entries with ragged numpy scatters and gathers all
# columns into row-major records with ONE fancy-index per column — no
# per-row python in the sink's hot path. Varints above 2 bytes (values
# needing >= 3 varint bytes, i.e. huge strings or wide ints) route the
# whole block through the scalar encoder — correctness first, the fast
# path covers the common shapes.


_ARANGE = np.empty(0, dtype=np.int64)


def _arange(n: int) -> np.ndarray:
    """Recycled iota buffer: this host faults fresh large allocations
    ~1000x slow (see BENCH/BASELINE.md round-2b), so the ragged-copy
    index base reuses one growing buffer instead of re-allocating per
    column."""
    global _ARANGE
    if len(_ARANGE) < n:
        _ARANGE = np.arange(max(n, 2 * len(_ARANGE)), dtype=np.int64)
    return _ARANGE[:n]


def _ragged_dst(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Flat destination indices for ragged copies: for each i, the run
    starts[i] .. starts[i]+lens[i]."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    firsts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    return np.repeat(starts - firsts, lens) + _arange(total)


def _varint_lens(v: np.ndarray) -> np.ndarray:
    """Byte length of the unsigned varint of each value (v >= 0)."""
    out = np.ones(len(v), dtype=np.int64)
    x = v >> np.uint64(7)
    while (x > 0).any():
        out += (x > 0).astype(np.int64)
        x = x >> np.uint64(7)
    return out


def _write_varints(buf: np.ndarray, starts: np.ndarray, v: np.ndarray, lens: np.ndarray) -> None:
    """Scatter the varint bytes of v (uint64) at buf[starts...], given
    precomputed lens. Vectorized per byte-position (max 10 rounds)."""
    maxlen = int(lens.max()) if len(lens) else 0
    x = v.copy()
    for k in range(maxlen):
        alive = lens > k
        b = (x & np.uint64(0x7F)).astype(np.uint8)
        more = lens > k + 1
        b = np.where(more, b | np.uint8(0x80), b)
        buf[starts[alive] + k] = b[alive]
        x = x >> np.uint64(7)


def _encode_rows_vector(t: pa.Table, kinds) -> list[bytes] | None:
    """Vectorized encode of every row's Example. Returns None when the
    block needs the scalar fallback (a piece requiring a >2-byte varint
    or a non-castable column)."""
    n = t.num_rows
    col_entries: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    for (name, kind), col in zip(kinds, (t.column(i) for i in range(t.num_columns))):
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        valid = ~np.asarray(pc.is_null(col).to_numpy(zero_copy_only=False))
        m = len(name)
        if m >= 128:
            return None
        if kind in ("string", "binary"):
            offs_col = pc.cast(
                col, pa.large_binary() if kind == "binary" else pa.large_string()
            )
            arr = offs_col.combine_chunks() if isinstance(offs_col, pa.ChunkedArray) else offs_col
            raw = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
            # a sliced array's offsets window starts at arr.offset; the
            # offset VALUES stay absolute into the data buffer, so the
            # windowed view is all the slice-correction needed
            offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
                arr.offset : arr.offset + n + 1
            ]
            L = (offs[1:] - offs[:-1]).astype(np.int64)
            L = np.where(valid, L, 0)
            if (L >= 16384).any():
                return None  # needs 3-byte varints: scalar path
            lv = np.where(L >= 128, 2, 1)  # varint_len(L)
            bl_len = 1 + lv + L                      # BytesList bytes
            f_len = 1 + np.where(bl_len >= 128, 2, 1) + bl_len  # Feature bytes
            tag_feat = 0x0A  # Feature.bytes_list
        elif kind in ("int", "bool"):
            # fill nulls BEFORE to_numpy: a null-bearing int column
            # converts via float64 and silently rounds wide ints. Unsigned
            # columns go via uint64 (an int64 cast rejects values >= 2^63
            # that the wire format carries fine as raw 64-bit varints).
            wide = pa.uint64() if pa.types.is_unsigned_integer(col.type) else pa.int64()
            iv = pc.fill_null(pc.cast(col, wide), 0).to_numpy(zero_copy_only=False)
            u = iv.astype(np.uint64) if iv.dtype.kind == "u" else iv.astype(
                np.int64
            ).view(np.uint64)
            L = _varint_lens(u)                      # varint64 bytes
            lv = np.ones(n, dtype=np.int64)          # L <= 10 < 128
            bl_len = 1 + lv + L                      # Int64List
            f_len = 1 + 1 + bl_len                   # bl_len <= 13 < 128
            tag_feat = 0x1A  # Feature.int64_list
        elif kind == "float":
            fv = pc.cast(col, pa.float32()).to_numpy(zero_copy_only=False)
            L = np.full(n, 4, dtype=np.int64)
            lv = np.ones(n, dtype=np.int64)
            bl_len = np.full(n, 6, dtype=np.int64)   # 0x0A 0x04 + 4 bytes
            f_len = np.full(n, 8, dtype=np.int64)
            tag_feat = 0x12  # Feature.float_list
        else:  # pragma: no cover - _column_kind validated
            return None
        if (f_len >= 16384).any():
            return None
        fv_lv = np.where(f_len >= 128, 2, 1)
        body_len = (1 + 1 + m) + (1 + fv_lv + f_len)  # name field + value field
        if (body_len >= 16384).any():
            return None
        entry_len = 1 + np.where(body_len >= 128, 2, 1) + body_len
        entry_len = np.where(valid, entry_len, 0)

        buf = np.zeros(int(entry_len.sum()), dtype=np.uint8)
        starts = np.concatenate([[0], np.cumsum(entry_len)[:-1]]).astype(np.int64)
        vi = valid
        s = starts[vi]
        # entry header: 0x0A varint(body_len)
        buf[s] = 0x0A
        _write_varints(buf, s + 1, body_len[vi].astype(np.uint64), np.where(body_len[vi] >= 128, 2, 1))
        p0 = s + 1 + np.where(body_len[vi] >= 128, 2, 1)
        # name field: 0x0A varint(m) name-bytes
        buf[p0] = 0x0A
        buf[p0 + 1] = m
        nm = np.frombuffer(name, dtype=np.uint8)
        buf[(p0[:, None] + 2 + np.arange(m)[None, :]).ravel()] = np.tile(nm, len(p0))
        p1 = p0 + 2 + m
        # value field: 0x12 varint(f_len) feature
        buf[p1] = 0x12
        _write_varints(buf, p1 + 1, f_len[vi].astype(np.uint64), fv_lv[vi])
        p2 = p1 + 1 + fv_lv[vi]
        # feature: tag varint(bl_len) 0x0A varint(L) payload
        buf[p2] = tag_feat
        _write_varints(buf, p2 + 1, bl_len[vi].astype(np.uint64), np.where(bl_len[vi] >= 128, 2, 1))
        p3 = p2 + 1 + np.where(bl_len[vi] >= 128, 2, 1)
        buf[p3] = 0x0A
        _write_varints(buf, p3 + 1, L[vi].astype(np.uint64), lv[vi])
        p4 = p3 + 1 + lv[vi]
        if kind in ("string", "binary"):
            src_starts = offs[:-1].astype(np.int64)[vi]
            dst = _ragged_dst(p4, L[vi])
            srcm = _ragged_dst(src_starts, L[vi])
            buf[dst] = raw[srcm]
        elif kind in ("int", "bool"):
            _write_varints(buf, p4, u[vi], L[vi])
        else:  # float
            fb = fv.astype("<f4").view(np.uint8).reshape(n, 4)[vi]
            buf[(p4[:, None] + np.arange(4)[None, :]).ravel()] = fb.ravel()
        col_entries.append((buf, starts, entry_len))

    # per-row record body length = sum of entry lens; Example wrapper
    body = np.zeros(n, dtype=np.int64)
    for _, _, el in col_entries:
        body += el
    if (body >= 16384).any():
        return None
    bv = np.where(body >= 128, 2, 1)
    rec_len = 1 + bv + body
    out = np.zeros(int(rec_len.sum()), dtype=np.uint8)
    rstarts = np.concatenate([[0], np.cumsum(rec_len)[:-1]]).astype(np.int64)
    out[rstarts] = 0x0A  # Example.features
    _write_varints(out, rstarts + 1, body.astype(np.uint64), bv)
    pos = rstarts + 1 + bv
    for buf, starts, el in col_entries:
        dst = _ragged_dst(pos, el)
        src = _ragged_dst(starts, el)
        out[dst] = buf[src]
        pos = pos + el
    ob = out.tobytes()
    ends = np.cumsum(rec_len)
    rstarts_l = ends - rec_len
    return [ob[a:b] for a, b in zip(rstarts_l, ends)]


def write_tfrecord_file(t: pa.Table, path: str) -> None:
    """One Arrow table -> one TFRecord file of tf.train.Example records.

    Row-wise by nature of the format (a record IS a row); runs inside a
    distributed task, never on the driver. Null cells are written as an
    absent feature (Example has no null encoding) and read back as null.
    """
    kinds = [(f.name.encode(), _column_kind(f.type)) for f in t.schema]
    recs = _encode_rows_vector(t, kinds) if t.num_rows else []
    if recs is None:  # oversized pieces: scalar fallback, same bytes
        cols = [t.column(i).to_pylist() for i in range(t.num_columns)]
        recs = []
        for r in range(t.num_rows):
            feats = []
            for (name, kind), col in zip(kinds, cols):
                v = col[r]
                if v is None:
                    continue
                feats.append((name, _ENCODERS[kind](v)))
            recs.append(_example(feats))
    hdrs = [struct.pack("<Q", len(rec)) for rec in recs]
    hcrcs = masked_crc32c_many(hdrs)
    dcrcs = masked_crc32c_many(recs)
    with open(path, "wb") as f:
        for hdr, hc, rec, dc in zip(hdrs, hcrcs, recs, dcrcs):
            f.write(hdr)
            f.write(struct.pack("<I", int(hc)))
            f.write(rec)
            f.write(struct.pack("<I", int(dc)))


def write_tfrecord(ds: ray.data.Dataset, path: str) -> ray.data.Dataset:
    """Block-parallel TFRecord sink: one ``part-*.tfrecord`` per Dataset
    block. Returns the (path, rows) manifest Dataset."""
    os.makedirs(path, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        name = os.path.join(path, f"part-{uuid.uuid4().hex}.tfrecord")
        write_tfrecord_file(t, name)
        return pa.table({"path": [name], "rows": pa.array([t.num_rows], pa.int64())})

    return ds.map_batches(write_block, batch_size=None, batch_format="pyarrow")


# --------------------------------------------------------------------------
# read
# --------------------------------------------------------------------------


def _iter_records(data: bytes, path: str, verify_crc: bool) -> list[bytes]:
    """Split a TFRecord byte stream into record payloads. The offset walk
    is a cheap sequential scan; CRC verification (when on) runs over ALL
    records at once through the lockstep-vectorized kernel."""
    pos, n = 0, len(data)
    recs: list[bytes] = []
    hdrs: list[bytes] = []
    want: list[tuple[int, int, int]] = []  # (hcrc, dcrc, pos)
    while pos < n:
        if pos + 12 > n:
            raise ValueError(f"tfrecord: truncated header in {path} @ {pos}")
        (ln,) = struct.unpack_from("<Q", data, pos)
        (hcrc,) = struct.unpack_from("<I", data, pos + 8)
        if pos + 12 + ln + 4 > n:
            raise ValueError(f"tfrecord: truncated record in {path} @ {pos}")
        rec = data[pos + 12 : pos + 12 + ln]
        (dcrc,) = struct.unpack_from("<I", data, pos + 12 + ln)
        hdrs.append(data[pos : pos + 8])
        recs.append(rec)
        want.append((hcrc, dcrc, pos))
        pos += 12 + ln + 4
    if verify_crc and recs:
        got_h = masked_crc32c_many(hdrs)
        got_d = masked_crc32c_many(recs)
        for (hcrc, dcrc, at), gh, gd in zip(want, got_h, got_d):
            if int(gh) != hcrc:
                raise ValueError(f"tfrecord: length CRC mismatch in {path} @ {at}")
            if int(gd) != dcrc:
                raise ValueError(f"tfrecord: data CRC mismatch in {path} @ {at}")
    return recs


def _cast_column(vals: list, typ: pa.DataType) -> pa.Array:
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        vals = [v.decode() if isinstance(v, bytes) else v for v in vals]
    elif pa.types.is_boolean(typ):
        vals = [None if v is None else bool(v) for v in vals]
    return pa.array(vals, typ)


def read_tfrecord(
    path: str,
    schema: pa.Schema,
    *,
    columns: list[str] | None = None,
    verify_crc: bool = True,
) -> ray.data.Dataset:
    """Distributed TFRecord reader: one task per file (the format has no
    internal index, matching TF's sharded-file consumption model).

    ``schema`` plays the role of TF's ``feature_description`` — the wire
    carries only bytes/float/int64 kinds, so the caller names the logical
    types (string vs binary, float64 vs float32, bool). ``columns`` prunes
    after decode (the record must be parsed to be skipped — inherent to
    row-wise formats); CRCs of pruned records are still verified.
    """
    p = Path(path)
    files = (
        sorted(str(f) for f in p.iterdir() if f.suffix == ".tfrecord")
        if p.is_dir()
        else [str(p)]
    )
    if not files:
        raise ValueError(f"no .tfrecord files under {path}")
    out_schema = (
        pa.schema([schema.field(c) for c in columns]) if columns else schema
    )
    names = [f.name for f in out_schema]

    def decode_file(batch: pa.Table) -> pa.Table:
        tables = []
        for fp in batch.column("path").to_pylist():
            with open(fp, "rb") as f:
                data = f.read()
            rows = [_decode_example(r) for r in _iter_records(data, fp, verify_crc)]
            tables.append(
                pa.table(
                    {
                        c: _cast_column(
                            [row.get(c) for row in rows], out_schema.field(c).type
                        )
                        for c in names
                    }
                )
            )
        return pa.concat_tables(tables) if tables else out_schema.empty_table()

    paths = ray.data.from_arrow(pa.table({"path": pa.array(files, pa.string())}))
    return paths.repartition(len(files)).map_batches(
        decode_file, batch_format="pyarrow", batch_size=None
    )
