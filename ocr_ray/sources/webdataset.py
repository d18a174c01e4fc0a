"""WebDataset sharded-tar source + sink.

WebDataset is the de-facto layout for large multimodal training corpora:
a corpus is a set of POSIX tar shards; a SAMPLE is the run of consecutive
members sharing one basename (``{key}.{field}[.{ext}]``), so a shard
streams sequentially with no index and shards are the parallelism unit.
This module implements that convention with the stdlib ``tarfile`` —
no ``webdataset`` package dependency.

Column <-> member mapping (by Arrow type, extension conveys the codec as
in the WebDataset convention):

* string  -> ``{key}.{col}.txt``  (UTF-8 bytes)
* binary  -> ``{key}.{col}.bin``  (raw payload bytes — images/audio ride
  here untouched)
* int     -> ``{key}.{col}.cls``  (ASCII decimal, the class-label style)
* float   -> ``{key}.{col}.num``  (``repr`` text — round-trips float64
  exactly, unlike float32-bound TFRecord)
* bool    -> ``{key}.{col}.cls``  (0/1)

Null cells are written as an absent member and read back as null.

Scale contract: the sink is block-parallel (one ``part-*.tar`` per Dataset
block, written inside the task holding the block, members mtime-zeroed so
bytes are deterministic given the block); the reader fans out ONE TASK PER
SHARD and streams members sequentially — the driver only lists shard
paths. ``columns`` pruning skips non-selected members WITHOUT reading
their payload bytes (tar stores sizes in headers, so a pruned read of a
multimodal shard never touches the media bytes).
"""

from __future__ import annotations

import io
import os
import tarfile
import uuid
from pathlib import Path

import pyarrow as pa
import ray.data

_EXT = {"string": "txt", "binary": "bin", "int": "cls", "float": "num", "bool": "cls"}


def _kind(t: pa.DataType) -> str:
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
    raise ValueError(f"webdataset sink: unsupported column type {t}")


def _encode(kind: str, v) -> bytes:
    if kind == "string":
        return v.encode()
    if kind == "binary":
        return bytes(v)
    if kind == "int":
        return str(int(v)).encode()
    if kind == "bool":
        return (b"1" if v else b"0")
    return repr(float(v)).encode()  # float: repr round-trips float64


def _decode(payload: bytes, typ: pa.DataType):
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return payload.decode()
    if pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
        return payload
    if pa.types.is_boolean(typ):
        return payload == b"1"
    if pa.types.is_integer(typ):
        return int(payload)
    return float(payload)


def write_webdataset_shard(t: pa.Table, path: str, *, key_column: str | None) -> None:
    """One Arrow table -> one tar shard. Keys are ``key_column`` values
    (must be unique per row) or zero-padded row ordinals."""
    fields = [(f.name, _kind(f.type)) for f in t.schema]
    cols = {f.name: t.column(f.name).to_pylist() for f in t.schema}
    if key_column is not None:
        keys = [str(k) for k in t.column(key_column).to_pylist()]
        if len(set(keys)) != len(keys):  # merged samples would be silent
            raise ValueError(
                f"webdataset sink: key_column {key_column!r} has duplicate "
                "values in this block — samples would merge on read"
            )
    else:
        keys = [f"{i:09d}" for i in range(t.num_rows)]
    with tarfile.open(path, "w") as tar:
        for r, key in enumerate(keys):
            wrote = 0
            for name, kind in fields:
                v = cols[name][r]
                if v is None:
                    continue
                payload = _encode(kind, v)
                info = tarfile.TarInfo(f"{key}.{name}.{_EXT[kind]}")
                info.size = len(payload)
                info.mtime = 0
                tar.addfile(info, io.BytesIO(payload))
                wrote += 1
            if wrote == 0:  # a member-less sample vanishes on read: refuse
                raise ValueError(
                    f"webdataset sink: row with key {key!r} is entirely "
                    "null — the tar layout cannot represent it"
                )


def write_webdataset(
    ds: ray.data.Dataset, path: str, *, key_column: str | None = None
) -> ray.data.Dataset:
    """Block-parallel WebDataset sink: one ``part-*.tar`` shard per
    Dataset block. Returns the (path, rows) manifest Dataset."""
    os.makedirs(path, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        name = os.path.join(path, f"part-{uuid.uuid4().hex}.tar")
        write_webdataset_shard(t, name, key_column=key_column)
        return pa.table({"path": [name], "rows": pa.array([t.num_rows], pa.int64())})

    return ds.map_batches(write_block, batch_size=None, batch_format="pyarrow")


def read_webdataset(
    path: str,
    schema: pa.Schema,
    *,
    columns: list[str] | None = None,
    key_column: str | None = None,
) -> ray.data.Dataset:
    """Distributed WebDataset reader: one task per tar shard, sequential
    member stream inside the task (the WebDataset access pattern).

    ``schema`` names the logical column types (member payloads are bytes on
    the wire). ``columns`` pruning skips unselected members' payloads via
    the tar size headers — media bytes in a ``.bin`` member are never read
    when the query doesn't select that column. ``key_column`` surfaces the
    sample key as a column (e.g. the doc_id it was written with).
    """
    p = Path(path)
    files = (
        sorted(str(f) for f in p.iterdir() if f.suffix == ".tar")
        if p.is_dir()
        else [str(p)]
    )
    if not files:
        raise ValueError(f"no .tar shards under {path}")
    sel = list(columns) if columns else [f.name for f in schema]
    data_cols = [c for c in sel if c != key_column]
    out_fields = [
        pa.field(c, pa.string()) if c == key_column else schema.field(c) for c in sel
    ]
    out_schema = pa.schema(out_fields)

    def read_shard(batch: pa.Table) -> pa.Table:
        tables = []
        for fp in batch.column("path").to_pylist():
            keys: list[str] = []
            rows: dict[str, list] = {c: [] for c in data_cols}
            cur_key = None
            with tarfile.open(fp, "r") as tar:
                for info in tar:
                    base, col = info.name.rsplit(".", 2)[0:2]
                    if base != cur_key:
                        cur_key = base
                        keys.append(base)
                        for c in data_cols:
                            rows[c].append(None)
                    if col in rows:
                        fobj = tar.extractfile(info)
                        rows[col][-1] = _decode(
                            fobj.read(), schema.field(col).type
                        )
                    # unselected member: payload bytes skipped via header
            arrs = {}
            for c in sel:
                if c == key_column:
                    arrs[c] = pa.array(keys, pa.string())
                else:
                    arrs[c] = pa.array(rows[c], schema.field(c).type)
            tables.append(pa.table(arrs))
        return pa.concat_tables(tables) if tables else out_schema.empty_table()

    paths = ray.data.from_arrow(pa.table({"path": pa.array(files, pa.string())}))
    return paths.repartition(len(files)).map_batches(
        read_shard, batch_format="pyarrow", batch_size=None
    )
