"""Sources: Lance-first readers with Parquet fallback.

The north rule targets Lance tables; the ``lance`` package is not
available in this sandbox, so the reader dispatches on availability /
path shape and falls back to Parquet (the fixtures' on-disk format).
Column pruning is always pushed into the read.
"""

from __future__ import annotations

from pathlib import Path

import ray.data

try:  # pragma: no cover - not installed in this environment
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    lance = None
    HAVE_LANCE = False


def read_documents(path: str, *, columns: list[str] | None = None, **kwargs) -> ray.data.Dataset:
    """Read a documents corpus (Lance dataset dir or Parquet file/dir)."""
    p = Path(path)
    if p.suffix == ".lance" or (p / "_versions").exists():
        if not HAVE_LANCE:
            raise ImportError(
                "Lance dataset at %s but the 'lance' package is unavailable; "
                "convert to Parquet or install lance" % path
            )
        frags = lance.dataset(path).to_batches(columns=columns)
        import pyarrow as pa

        return ray.data.from_arrow(pa.Table.from_batches(frags))
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def read_table(sf_dir: str, name: str, columns: list[str] | None = None, **kwargs) -> ray.data.Dataset:
    """Read one testdata table with column pruning pushed to the scan."""
    return ray.data.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns, **kwargs)


def read_any(path: str, *, columns: list[str] | None = None, **kwargs) -> ray.data.Dataset:
    """Format-dispatched reader: parquet / lance / csv / json(l) by
    extension (directory -> parquet/lance detection via ``read_documents``).
    Column pruning is pushed into the scan where the format supports it;
    CSV/JSONL prune right after parse (still before any shuffle)."""
    p = Path(path)
    suffix = p.suffix.lower()
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


def write_documents(ds: ray.data.Dataset, path: str, **kwargs) -> None:
    """Write a documents Dataset: Lance when available, else partitioned
    Parquet (one file per block — resumable writes go through
    ``ocr_ray.state`` instead)."""
    if HAVE_LANCE and hasattr(ds, "write_lance"):
        ds.write_lance(path, **kwargs)  # pragma: no cover - lance absent here
    else:
        ds.write_parquet(path, **kwargs)
