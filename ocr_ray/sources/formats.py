"""Columnar interchange formats beyond Parquet/Lance: ORC and Arrow IPC
(Feather v2) sources + sinks, and compressed-JSONL ingest/egress.

A long-lived corpus accumulates formats: warehouse exports arrive as ORC,
inter-service handoffs as Arrow IPC streams, crawler output as gzipped
JSONL. These readers follow the same scale contract as
``sources/readers.py``: the DRIVER touches only file-level metadata
(footers — bytes per file, like ``read_parquet_evolved``); row data is
read inside distributed tasks, one task per stripe / batch-range / file,
so blocks flow through the streaming executor with backpressure and no
stage materializes the corpus. Column pruning is pushed into each format's
native projection (ORC stripe read and IPC both project columns without
touching the other columns' bytes).

Sinks are block-parallel: one output file per Dataset block (the
resumable, partition-manifested write path stays ``ocr_ray.state``; these
sinks cover the interchange/export case where the consumer is another
system, not a resumed run).
"""

from __future__ import annotations

import gzip
import os
import uuid
from pathlib import Path

import pyarrow as pa
import ray.data


def _expand_files(path: str, suffixes: tuple[str, ...]) -> list[str]:
    p = Path(path)
    if p.is_dir():
        files = sorted(
            str(f) for f in p.iterdir() if f.suffix.lower() in suffixes
        )
        if not files:
            raise ValueError(f"no {suffixes} files under {path}")
        return files
    return [str(p)]


# --------------------------------------------------------------------------
# ORC
# --------------------------------------------------------------------------


def read_orc(path: str, *, columns: list[str] | None = None) -> ray.data.Dataset:
    """Streaming ORC read: one distributed task per STRIPE (ORC's native
    row-group unit — each stripe is independently decodable with its own
    index/footer, so stripe granularity gives the same parallelism and
    memory bound as Parquet row-group reads). The driver reads only each
    file's tail footer for the stripe count."""
    import pyarrow.orc as orc

    files = _expand_files(path, (".orc",))
    work = []
    for f in files:
        nstripes = orc.ORCFile(f).nstripes
        work.extend({"path": f, "stripe": s} for s in range(nstripes))

    def read_stripe(batch: pa.Table) -> pa.Table:
        tables = []
        for fp, s in zip(batch["path"].to_pylist(), batch["stripe"].to_pylist()):
            rb = orc.ORCFile(fp).read_stripe(int(s), columns=columns)
            tables.append(pa.Table.from_batches([rb]))
        return pa.concat_tables(tables)

    ids = ray.data.from_items(work)
    return ids.map_batches(read_stripe, batch_size=1, batch_format="pyarrow")


def write_orc(ds: ray.data.Dataset, path: str) -> ray.data.Dataset:
    """Block-parallel ORC sink: one ``part-*.orc`` file per block, written
    inside the map task that holds the block (no driver funnel). Returns
    the per-file manifest (path, rows) — a bounded Dataset, one row per
    output file."""
    import pyarrow.orc as orc

    os.makedirs(path, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        name = os.path.join(path, f"part-{uuid.uuid4().hex}.orc")
        orc.write_table(t, name)
        return pa.table({"path": [name], "rows": pa.array([t.num_rows], pa.int64())})

    return ds.map_batches(write_block, batch_size=None, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Arrow IPC (Feather v2)
# --------------------------------------------------------------------------


def read_ipc(path: str, *, columns: list[str] | None = None) -> ray.data.Dataset:
    """Streaming Arrow IPC (file-format / Feather v2) read: the driver
    opens each footer for the record-batch count only; one distributed
    task reads a contiguous RANGE of record batches (zero-copy mmap +
    per-batch column projection), so a single giant IPC file still fans
    out across the cluster."""
    files = _expand_files(path, (".arrow", ".ipc", ".feather"))
    work = []
    for f in files:
        with pa.memory_map(f, "r") as src:
            n = pa.ipc.open_file(src).num_record_batches
        # ~8 batches per task: batch-range granularity bounds task count
        # for many-batch files while keeping per-task memory at a few
        # record batches.
        step = 8
        work.extend(
            {"path": f, "lo": lo, "hi": min(lo + step, n)}
            for lo in range(0, n, step)
        )

    def read_range(batch: pa.Table) -> pa.Table:
        tables = []
        for fp, lo, hi in zip(
            batch["path"].to_pylist(),
            batch["lo"].to_pylist(),
            batch["hi"].to_pylist(),
        ):
            with pa.memory_map(fp, "r") as src:
                rd = pa.ipc.open_file(src)
                t = pa.Table.from_batches(
                    [rd.get_batch(i) for i in range(int(lo), int(hi))]
                )
            if columns:
                t = t.select(columns)
            tables.append(t)
        return pa.concat_tables(tables)

    ids = ray.data.from_items(work)
    return ids.map_batches(read_range, batch_size=1, batch_format="pyarrow")


def write_ipc(ds: ray.data.Dataset, path: str) -> ray.data.Dataset:
    """Block-parallel Arrow IPC sink (one ``part-*.arrow`` per block,
    IPC file format so readers get random access). Returns the per-file
    manifest Dataset."""
    os.makedirs(path, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        name = os.path.join(path, f"part-{uuid.uuid4().hex}.arrow")
        with pa.OSFile(name, "wb") as sink:
            with pa.ipc.new_file(sink, t.schema) as wr:
                wr.write_table(t)
        return pa.table({"path": [name], "rows": pa.array([t.num_rows], pa.int64())})

    return ds.map_batches(write_block, batch_size=None, batch_format="pyarrow")


# --------------------------------------------------------------------------
# CSV
# --------------------------------------------------------------------------


def read_csv_dir(
    path: str,
    *,
    columns: list[str] | None = None,
    schema: pa.Schema | None = None,
) -> ray.data.Dataset:
    """CSV ingest (the lowest-common-denominator export format). CSV has
    no footer and no row-group structure, so parallelism is per-FILE —
    the same contract as gzipped JSONL; a large estate arrives as many
    part files and that is the partitioning. Parsing happens inside read
    tasks via Arrow's multithreaded CSV reader; an explicit ``schema``
    pins column types (CSV is untyped text — without it, a file of
    all-integral doubles infers int64 and poisons the union downstream).
    Column pruning is pushed into the parse (``include_columns``), so
    unneeded columns are never materialized."""
    from pyarrow import csv as pacsv

    files = _expand_files(path, (".csv",))
    convert = pacsv.ConvertOptions(
        include_columns=columns or None,
        column_types=schema,
        # NULL fidelity: Arrow's writer quotes every VALID string (empty
        # included) and emits nulls bare, so bare-empty -> NULL and
        # quoted-empty -> "" round-trips both exactly
        strings_can_be_null=True,
        quoted_strings_can_be_null=False,
    )

    def parse(batch: pa.Table) -> pa.Table:
        tables = [
            pacsv.read_csv(fp, convert_options=convert)
            for fp in batch["path"].to_pylist()
        ]
        return pa.concat_tables(tables)

    ids = ray.data.from_items([{"path": f} for f in files])
    return ids.map_batches(parse, batch_size=1, batch_format="pyarrow")


def write_csv_dir(ds: ray.data.Dataset, path: str) -> ray.data.Dataset:
    """Block-parallel CSV sink: one ``part-*.csv`` per block, serialized
    by Arrow's CSV writer inside the task that holds the block. Returns
    the per-file manifest Dataset (path, rows)."""
    from pyarrow import csv as pacsv

    os.makedirs(path, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        name = os.path.join(path, f"part-{uuid.uuid4().hex}.csv")
        pacsv.write_csv(t, name)
        return pa.table({"path": [name], "rows": pa.array([t.num_rows], pa.int64())})

    return ds.map_batches(write_block, batch_size=None, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Compressed JSONL
# --------------------------------------------------------------------------


def read_jsonl_gz(path: str, *, columns: list[str] | None = None) -> ray.data.Dataset:
    """Gzipped-JSONL ingest (the standard crawler/export wire format).
    Decompression happens inside the read tasks via Arrow's stream codec
    (``open_input_stream(compression="gzip")``) — gzip is not splittable,
    so parallelism is per-FILE; a 100 TB crawl arrives as many files and
    that is the partitioning. Columns prune right after parse."""
    ds = ray.data.read_json(
        path,
        arrow_open_stream_args={"compression": "gzip"},
        file_extensions=["gz"],
    )
    if columns:
        ds = ds.select_columns(columns)
    return ds


def write_jsonl_gz(ds: ray.data.Dataset, path: str) -> ray.data.Dataset:
    """Block-parallel gzipped-JSONL sink: one ``part-*.jsonl.gz`` per
    block, serialized vectorized-ish (pandas ``to_json`` per block) and
    gzip-compressed inside the task. Returns the per-file manifest."""
    os.makedirs(path, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        name = os.path.join(path, f"part-{uuid.uuid4().hex}.jsonl.gz")
        payload = t.to_pandas().to_json(
            orient="records", lines=True, date_format="iso"
        )
        with gzip.open(name, "wb", compresslevel=5) as f:
            f.write(payload.encode("utf-8"))
        return pa.table({"path": [name], "rows": pa.array([t.num_rows], pa.int64())})

    return ds.map_batches(write_block, batch_size=None, batch_format="pyarrow")
