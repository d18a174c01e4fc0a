"""Avro Object Container File source + sink, from scratch (no avro lib).

Warehouse exports and Kafka archive dumps arrive as ``.avro`` container
files; this module closes that ingest gap with a pure-Python codec for
the format's documented wire layout (the Apache Avro 1.x spec):

- header: magic ``Obj\\x01``, a string->bytes metadata map carrying
  ``avro.schema`` (JSON) and ``avro.codec``, then a 16-byte sync marker;
- data blocks: ``long n_objects``, ``long n_bytes``, the serialized rows
  (optionally raw-DEFLATE compressed), then the sync marker again;
- primitives: int/long are zigzag varints, string/bytes are
  length-prefixed, float/double little-endian IEEE, boolean one byte,
  null zero bytes; records are their fields in schema order; a nullable
  field is the union ``["null", T]`` encoded as a branch index + value.

Scale contract matches ``sources/formats.py``: the DRIVER walks only
block HEADERS (two varints per block, body bytes skipped with seek) to
build a (offset, rows, bytes) block list; row decode happens inside one
distributed task per block-range, so a single giant file fans out and
blocks stream with backpressure. Supported type subset: the flat
record schemas the engine's tables use (bool/int/long/float/double/
string/bytes, each optionally nullable). Row materialization is a
per-row loop by necessity — Avro is row-major with variable-width
values, so there is no columnar fast path; the loop runs inside read
tasks, never on the driver.

Sink: block-parallel like ``write_orc`` — one ``part-*.avro`` per
Dataset block, deflate-compressed, returning the per-file manifest.
"""

from __future__ import annotations

import io
import json
import os
import struct
import uuid
import zlib
from pathlib import Path

import numpy as np
import pyarrow as pa
import ray.data

MAGIC = b"Obj\x01"
SYNC = bytes.fromhex("6f63725f7261795f6176726f5f73796e63")[:16].ljust(16, b"\x00")

_ARROW_TO_AVRO = [
    (pa.types.is_boolean, "boolean"),
    (pa.types.is_int32, "int"),
    (pa.types.is_integer, "long"),
    (pa.types.is_float32, "float"),
    (pa.types.is_floating, "double"),
    (pa.types.is_string, "string"),
    (pa.types.is_large_string, "string"),
    (pa.types.is_binary, "bytes"),
    (pa.types.is_large_binary, "bytes"),
]

_AVRO_TO_ARROW = {
    "boolean": pa.bool_(),
    "int": pa.int32(),
    "long": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "string": pa.string(),
    "bytes": pa.binary(),
}


def _avro_type(t: pa.DataType) -> str:
    for pred, name in _ARROW_TO_AVRO:
        if pred(t):
            return name
    raise ValueError(f"avro sink: unsupported Arrow type {t}")


def arrow_schema_to_avro(schema: pa.Schema, *, name: str = "row") -> dict:
    """Flat Arrow schema -> Avro record schema dict (nullable fields
    become ``["null", T]`` unions, the standard Avro idiom)."""
    fields = []
    for f in schema:
        at = _avro_type(f.type)
        fields.append({"name": f.name, "type": ["null", at] if f.nullable else at})
    return {"type": "record", "name": name, "fields": fields}


def _field_plan(avro_schema: dict) -> list[tuple[str, str, bool]]:
    """(name, primitive, nullable) per field; validates the supported
    subset loudly instead of mis-decoding."""
    if avro_schema.get("type") != "record":
        raise ValueError(f"avro: only record schemas supported, got {avro_schema.get('type')}")
    plan = []
    for f in avro_schema["fields"]:
        t = f["type"]
        nullable = False
        if isinstance(t, list):
            branches = [b for b in t if b != "null"]
            if len(t) != 2 or "null" not in t or len(branches) != 1:
                raise ValueError(f"avro: unsupported union {t} for field {f['name']}")
            t, nullable = branches[0], True
        if not isinstance(t, str) or t not in _AVRO_TO_ARROW:
            raise ValueError(f"avro: unsupported type {t} for field {f['name']}")
        plan.append((f["name"], t, nullable))
    return plan


# --------------------------------------------------------------------------
# primitive codecs
# --------------------------------------------------------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _write_long(buf: bytearray, n: int) -> None:
    u = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


class _Reader:
    __slots__ = ("b", "i")

    def __init__(self, data: bytes, pos: int = 0):
        self.b = data
        self.i = pos

    def long(self) -> int:
        u = 0
        shift = 0
        b = self.b
        i = self.i
        while True:
            c = b[i]
            i += 1
            u |= (c & 0x7F) << shift
            if not (c & 0x80):
                break
            shift += 7
        self.i = i
        return _unzigzag(u)

    def bytes_(self) -> bytes:
        n = self.long()
        out = self.b[self.i : self.i + n]
        self.i += n
        return out

    def skip(self, n: int) -> None:
        self.i += n


# --------------------------------------------------------------------------
# write
# --------------------------------------------------------------------------


def _encode_rows(t: pa.Table, plan: list[tuple[str, str, bool]]) -> bytes:
    cols = []
    for name, prim, nullable in plan:
        c = t[name]
        py = c.to_pylist()
        cols.append((py, prim, nullable))
    buf = bytearray()
    pack_f = struct.Struct("<f").pack
    pack_d = struct.Struct("<d").pack
    for r in range(t.num_rows):
        for py, prim, nullable in cols:
            v = py[r]
            if nullable:
                if v is None:
                    _write_long(buf, 0)
                    continue
                _write_long(buf, 1)
            elif v is None:
                raise ValueError("avro sink: null in non-nullable field")
            if prim in ("long", "int"):
                _write_long(buf, int(v))
            elif prim == "double":
                buf += pack_d(v)
            elif prim == "float":
                buf += pack_f(v)
            elif prim == "string":
                enc = v.encode("utf-8")
                _write_long(buf, len(enc))
                buf += enc
            elif prim == "bytes":
                _write_long(buf, len(v))
                buf += v
            elif prim == "boolean":
                buf.append(1 if v else 0)
            else:  # pragma: no cover - _field_plan validated
                raise AssertionError(prim)
    return bytes(buf)


def write_avro_file(t: pa.Table, path: str, *, codec: str = "deflate", rows_per_block: int = 4096) -> None:
    """One Arrow table -> one Avro container file (header + N blocks)."""
    avro_schema = arrow_schema_to_avro(t.schema)
    plan = _field_plan(avro_schema)
    with open(path, "wb") as f:
        f.write(MAGIC)
        meta = {
            "avro.schema": json.dumps(avro_schema).encode(),
            "avro.codec": codec.encode(),
        }
        head = bytearray()
        _write_long(head, len(meta))
        for k, v in meta.items():
            ke = k.encode()
            _write_long(head, len(ke))
            head += ke
            _write_long(head, len(v))
            head += v
        _write_long(head, 0)
        f.write(head)
        f.write(SYNC)
        for lo in range(0, t.num_rows, rows_per_block):
            chunk = t.slice(lo, rows_per_block)
            body = _encode_rows(chunk, plan)
            if codec == "deflate":
                body = zlib.compress(body, 6)[2:-4]  # raw DEFLATE per spec
            elif codec != "null":
                raise ValueError(f"avro sink: unsupported codec {codec}")
            blk = bytearray()
            _write_long(blk, chunk.num_rows)
            _write_long(blk, len(body))
            f.write(blk)
            f.write(body)
            f.write(SYNC)


def write_avro(ds: ray.data.Dataset, path: str, *, codec: str = "deflate") -> ray.data.Dataset:
    """Block-parallel Avro sink: one ``part-*.avro`` per Dataset block,
    written inside the task holding the block. Returns the per-file
    manifest Dataset (path, rows)."""
    os.makedirs(path, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        name = os.path.join(path, f"part-{uuid.uuid4().hex}.avro")
        write_avro_file(t, name, codec=codec)
        return pa.table({"path": [name], "rows": pa.array([t.num_rows], pa.int64())})

    return ds.map_batches(write_block, batch_size=None, batch_format="pyarrow")


# --------------------------------------------------------------------------
# read
# --------------------------------------------------------------------------


def _read_header(f) -> tuple[dict, str, bytes, int]:
    """Parse magic + metadata map + sync; return (schema, codec, sync,
    first-block offset). Reads a bounded prefix — never the body."""
    prefix = f.read(1 << 20)
    if prefix[:4] != MAGIC:
        raise ValueError("not an Avro object container file")
    rd = _Reader(prefix, 4)
    meta: dict[str, bytes] = {}
    while True:
        n = rd.long()
        if n == 0:
            break
        if n < 0:  # size-prefixed negative-count block form
            n = -n
            rd.long()
        for _ in range(n):
            k = rd.bytes_().decode()
            meta[k] = rd.bytes_()
    sync = prefix[rd.i : rd.i + 16]
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    return schema, codec, sync, rd.i + 16


def _block_index(path: str) -> tuple[dict, str, list[dict]]:
    """Driver-side block walk: header + per-block (offset, rows, nbytes)
    by reading two varints and SEEKING over each body — metadata-only."""
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        schema, codec, sync, pos = _read_header(f)
        blocks = []
        while pos < size:
            f.seek(pos)
            head = f.read(20)  # two varints fit in <= 20 bytes
            if len(head) < 2:
                break
            rd = _Reader(head)
            nrows = rd.long()
            nbytes = rd.long()
            body_at = pos + rd.i
            blocks.append({"path": path, "offset": body_at, "rows": nrows, "nbytes": nbytes})
            pos = body_at + nbytes + 16  # body + sync
    return schema, codec, blocks


def _decode_block(raw: bytes, nrows: int, plan, codec: str) -> dict[str, list]:
    if codec == "deflate":
        raw = zlib.decompress(raw, -15)
    elif codec != "null":
        raise ValueError(f"avro: unsupported codec {codec}")
    rd = _Reader(raw)
    out: dict[str, list] = {name: [] for name, _, _ in plan}
    unpack_f = struct.Struct("<f").unpack_from
    unpack_d = struct.Struct("<d").unpack_from
    for _ in range(nrows):
        for name, prim, nullable in plan:
            if nullable:
                if rd.long() == 0:
                    out[name].append(None)
                    continue
            if prim in ("long", "int"):
                out[name].append(rd.long())
            elif prim == "double":
                out[name].append(unpack_d(rd.b, rd.i)[0])
                rd.skip(8)
            elif prim == "float":
                out[name].append(unpack_f(rd.b, rd.i)[0])
                rd.skip(4)
            elif prim == "string":
                out[name].append(rd.bytes_().decode("utf-8"))
            elif prim == "bytes":
                out[name].append(rd.bytes_())
            elif prim == "boolean":
                out[name].append(rd.b[rd.i] == 1)
                rd.skip(1)
            else:  # pragma: no cover
                raise AssertionError(prim)
    return out


def read_avro(path: str, *, columns: list[str] | None = None) -> ray.data.Dataset:
    """Streaming Avro read: driver walks block headers only; one
    distributed task decodes a range of blocks (~64k rows per task).
    Column pruning applies at materialization (Avro is row-major, so
    pruned columns are still SKIPPED over, not materialized)."""
    p = Path(path)
    files = (
        sorted(str(f) for f in p.iterdir() if f.suffix.lower() == ".avro")
        if p.is_dir()
        else [str(p)]
    )
    if not files:
        raise ValueError(f"no .avro files under {path}")

    work = []
    plans: dict[str, tuple[list, str]] = {}
    for f in files:
        schema, codec, blocks = _block_index(f)
        plans[f] = (_field_plan(schema), codec)
        group: list[dict] = []
        grows = 0
        for b in blocks:
            group.append(b)
            grows += b["rows"]
            if grows >= 65536:
                work.append({"path": f, "blocks": json.dumps(group)})
                group, grows = [], 0
        if group:
            work.append({"path": f, "blocks": json.dumps(group)})

    if not work:
        # header-only files: typed empty Dataset from the first schema
        plan, _ = next(iter(plans.values()))
        empty = pa.schema(
            [(n, _AVRO_TO_ARROW[p]) for n, p, _ in plan if columns is None or n in columns]
        ).empty_table()
        return ray.data.from_arrow(empty)

    plans_json = {f: (pl, co) for f, (pl, co) in plans.items()}

    def decode_range(batch: pa.Table) -> pa.Table:
        tables = []
        for fp, blocks_js in zip(batch["path"].to_pylist(), batch["blocks"].to_pylist()):
            plan, codec = plans_json[fp]
            cols: dict[str, list] = {name: [] for name, _, _ in plan}
            with open(fp, "rb") as fh:
                for b in json.loads(blocks_js):
                    fh.seek(b["offset"])
                    raw = fh.read(b["nbytes"])
                    part = _decode_block(raw, b["rows"], plan, codec)
                    for k, v in part.items():
                        cols[k].extend(v)
            arrays = {
                name: pa.array(cols[name], type=_AVRO_TO_ARROW[prim])
                for name, prim, _ in plan
                if columns is None or name in columns
            }
            tables.append(pa.table(arrays))
        return pa.concat_tables(tables)

    ids = ray.data.from_items(work)
    return ids.map_batches(decode_range, batch_size=1, batch_format="pyarrow")
