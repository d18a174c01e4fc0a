"""Sources: Lance-first readers with Parquet fallback.

The north rule targets Lance tables; the ``lance`` package is not
available in this sandbox, so the reader dispatches on availability /
path shape and falls back to Parquet (the fixtures' on-disk format).
Column pruning is always pushed into the read.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

try:  # pragma: no cover - not installed in this environment
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    lance = None
    HAVE_LANCE = False


# Prefer ray.data.read_lance (streaming per-fragment datasource) when the
# runtime has it; tests force the fragment fallback by flipping this off.
PREFER_NATIVE_LANCE = True


def _read_lance_fragments(path: str, *, columns: list[str] | None = None) -> ray.data.Dataset:
    """STREAMING per-fragment Lance read: only the fragment-id list touches
    the driver; each fragment's rows are read inside a distributed task
    (one task per fragment, blocks flow through the streaming executor
    with backpressure). Replaces the round-1 whole-dataset
    ``pa.Table.from_batches`` driver materialization — a driver OOM at any
    real corpus size."""
    lance_mod = lance
    frag_ids = [int(f.fragment_id) for f in lance_mod.dataset(path).get_fragments()]
    ids = ray.data.from_items([{"fragment_id": i} for i in frag_ids])

    def read_frag(batch: pa.Table) -> pa.Table:
        dset = lance_mod.dataset(path)
        tables = [
            dset.get_fragment(int(fid)).to_table(columns=columns)
            for fid in batch["fragment_id"].to_pylist()
        ]
        return pa.concat_tables(tables)

    return ids.map_batches(read_frag, batch_size=1, batch_format="pyarrow")


def read_documents(path: str, *, columns: list[str] | None = None, **kwargs) -> ray.data.Dataset:
    """Read a documents corpus (Lance dataset dir or Parquet file/dir).
    Both Lance paths STREAM: the native ``ray.data.read_lance`` datasource
    when available, else per-fragment read tasks — never a whole-dataset
    driver materialization."""
    p = Path(path)
    if p.suffix == ".lance" or (p / "_versions").exists():
        if not HAVE_LANCE:
            raise ImportError(
                "Lance dataset at %s but the 'lance' package is unavailable; "
                "convert to Parquet or install lance" % path
            )
        if PREFER_NATIVE_LANCE and hasattr(ray.data, "read_lance"):
            return ray.data.read_lance(path, columns=columns, **kwargs)
        return _read_lance_fragments(path, columns=columns)
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def read_table(
    sf_dir: str,
    name: str,
    columns: list[str] | None = None,
    *,
    per_block: int = 4 << 20,
    **kwargs,
) -> ray.data.Dataset:
    """Read one testdata table with column pruning pushed to the scan.

    Block count is byte-proportional for small files (see
    ``sizing.read_blocks_for_bytes``): Ray's default ~2x-CPU read
    parallelism shreds a few-MB table into dozens of near-empty blocks,
    and every downstream sort shuffle inherits that block count as its
    reduce-partition count — the dominant fixed cost of small-input
    queries. ``per_block`` tunes the bytes-per-block target: map-task
    parallelism equals block count, so callers whose downstream is
    CPU-HEAVY per byte (shingling, hashing, matmul) pass a smaller
    target (see ``_shared.read_docs`` / ``read_embeddings``) — the
    relational default of 4 MB would serialize those kernels onto a
    handful of cores at small scale. Callers passing their own
    ``override_num_blocks`` / ``parallelism`` win."""
    import os

    from ocr_ray.sizing import read_blocks_for_bytes

    path = f"{sf_dir}/{name}.parquet"
    if "override_num_blocks" not in kwargs and "parallelism" not in kwargs:
        try:
            nb = read_blocks_for_bytes(os.path.getsize(path), per_block=per_block)
        except OSError:
            nb = None
        if nb is not None:
            kwargs["override_num_blocks"] = nb
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def read_any(path: str, *, columns: list[str] | None = None, **kwargs) -> ray.data.Dataset:
    """Format-dispatched reader: parquet / lance / orc / arrow-ipc / csv /
    json(l) / json(l).gz by extension (directory -> parquet/lance detection
    via ``read_documents``). Column pruning is pushed into the scan where
    the format supports it (parquet/lance/orc/ipc); CSV/JSONL prune right
    after parse (still before any shuffle)."""
    from ocr_ray.sources import formats

    p = Path(path)
    suffix = p.suffix.lower()
    if suffix == ".gz":
        inner = Path(p.stem).suffix.lower()
        if inner in (".json", ".jsonl"):
            return formats.read_jsonl_gz(path, columns=columns)
        raise ValueError(f"read_any: unsupported compressed format {path}")
    if suffix == ".avro":
        from ocr_ray.sources.avro import read_avro

        return read_avro(path, columns=columns)
    if suffix in (".tfrecord", ".tar"):
        raise ValueError(
            "read_any: TFRecord/WebDataset carry no logical schema — call "
            "sources.tfrecord.read_tfrecord / sources.webdataset.read_webdataset "
            "with an explicit pyarrow schema"
        )
    if suffix == ".orc":
        return formats.read_orc(path, columns=columns)
    if suffix in (".arrow", ".ipc", ".feather"):
        return formats.read_ipc(path, columns=columns)
    if suffix in (".csv",):
        ds = ray.data.read_csv(path, **kwargs)
    elif suffix in (".json", ".jsonl"):
        ds = ray.data.read_json(path, **kwargs)
    elif suffix in (".parquet", ".pq"):
        return ray.data.read_parquet(path, columns=columns, **kwargs)
    else:
        return read_documents(path, columns=columns, **kwargs)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def read_parquet_evolved(
    paths: list[str] | str, *, columns: list[str] | None = None, **kwargs
) -> ray.data.Dataset:
    """Read parquet files whose schemas DRIFTED over time (columns added
    or dropped between writes — the normal state of a long-lived corpus):
    every batch is aligned to the UNION schema (by name, in first-seen
    order), missing columns null-filled with their exact type.

    Only footers are read to build the union schema (metadata-only, like
    the engine's other sizing probes); the data scan itself stays a
    parallel ``read_parquet`` per file, so column pruning still pushes
    down for columns present in a file.
    """
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq

    if isinstance(paths, str):
        p = Path(paths)
        # recursive: partitioned layouts (part=NNN/data.parquet) are the
        # sink's own output shape (local paths; remote URIs go through the
        # native read_parquet)
        paths = sorted(str(f) for f in p.rglob("*.parquet")) if p.is_dir() else [paths]
    if not paths:
        raise ValueError("read_parquet_evolved: no parquet files found")

    def _footer(f: str):
        pf = pq.ParquetFile(f)
        return f, pf.schema_arrow, pf.metadata.num_rows

    # footer probes are independent I/O — do them concurrently, not as a
    # serial driver loop over arbitrarily many files
    with ThreadPoolExecutor(max_workers=16) as ex:
        footers = list(ex.map(_footer, paths))
    schemas = {f: sch for f, sch, _ in footers}
    nrows = {f: n for f, _, n in footers}
    # permissive unification PROMOTES drifted types (int32 -> int64, ...)
    # instead of keeping the first-seen type and crashing on a narrowing
    # cast mid-scan
    union_all = pa.unify_schemas(
        list({tuple(zip(s.names, (str(t) for t in s.types))): s for s in schemas.values()}.values()),
        promote_options="permissive",
    )
    if columns is not None:
        missing = [c for c in columns if c not in union_all.names]
        if missing:
            raise ValueError(f"read_parquet_evolved: column(s) {missing} exist in no file")
        union = pa.schema([(c, union_all.field(c).type) for c in columns])  # caller's order
    else:
        union = union_all

    def align(t: pa.Table) -> pa.Table:
        cols = {}
        for name, typ in zip(union.names, union.types):
            if name in t.column_names:
                cols[name] = t[name].cast(typ)
            else:
                cols[name] = pa.nulls(t.num_rows, type=typ)
        return pa.table(cols)

    # one read op per schema GENERATION (files grouped by identical
    # schema), not per file — drifted corpora have a handful of
    # generations but arbitrarily many files.
    by_gen: dict[tuple, list[str]] = {}
    for f, sch in schemas.items():
        by_gen.setdefault(tuple(zip(sch.names, (str(t) for t in sch.types))), []).append(f)
    parts = []
    for gen, files in by_gen.items():
        present = [c for c in union.names if c in {n for n, _ in gen}]
        if not present:
            # no requested column exists in this generation: emit pure-null
            # blocks from the footer row counts — zero data bytes read
            # (columns=None here would scan EVERY byte just to discard it)
            counts = [nrows[f] for f in files]

            def null_blocks(t: pa.Table, _u=union) -> pa.Table:
                n = int(pc.sum(t["_rows"]).as_py() or 0)
                return pa.table({c: pa.nulls(n, type=typ) for c, typ in zip(_u.names, _u.types)})

            parts.append(
                ray.data.from_items([{"_rows": c} for c in counts]).map_batches(
                    null_blocks, batch_format="pyarrow"
                )
            )
            continue
        parts.append(
            ray.data.read_parquet(files, columns=present, **kwargs).map_batches(
                align, batch_format="pyarrow"
            )
        )
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


def sample_parquet_rows(
    path: str, n: int, columns: list[str] | None = None
) -> "pa.Table":
    """~``n`` systematically sampled rows via ROW-GROUP PRUNING — reads a
    bounded number of row groups (evenly spaced across the file) and
    stride-subsamples rows inside them, never a full scan. The sampling
    pattern a 100 TB training step needs (e.g. IVF centroid seeding):
    representative of the whole table, I/O proportional to the sample,
    not to the data. Deterministic (position-based)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    n_groups = pf.metadata.num_row_groups
    pick = max(1, min(n_groups, 8))
    group_idx = sorted({int(i * n_groups / pick) for i in range(pick)})
    tbl = pf.read_row_groups(group_idx, columns=columns)
    stride = max(1, tbl.num_rows // max(n, 1))
    import numpy as np

    return tbl.take(np.arange(0, tbl.num_rows, stride, dtype=np.int64))


def write_documents(ds: ray.data.Dataset, path: str, **kwargs) -> None:
    """Write a documents Dataset: Lance when available, else partitioned
    Parquet (one file per block — resumable writes go through
    ``ocr_ray.state`` instead)."""
    if HAVE_LANCE and hasattr(ds, "write_lance"):
        ds.write_lance(path, **kwargs)  # pragma: no cover - lance absent here
    else:
        ds.write_parquet(path, **kwargs)
