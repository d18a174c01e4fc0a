"""Source readers: streaming Lance fragment path (with a monkeypatched
fake lance module — the real package is absent here) and format dispatch.
The invariant under test: NO code path materializes a whole Lance dataset
on the driver; only the fragment-id list does."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ocr_ray.sources.readers as readers
from ocr_ray.testing import FakeFragment, FakeLanceModule


def _fragments(n_frags: int = 3, rows_per: int = 4):
    frags = []
    for i in range(n_frags):
        ids = np.arange(i * rows_per, (i + 1) * rows_per, dtype=np.int64)
        t = pa.table(
            {
                "doc_id": pa.array(ids),
                "text": pa.array([f"doc {j}" for j in ids], type=pa.string()),
                "extra": pa.array(ids * 2),
            }
        )
        frags.append(FakeFragment(i, t))
    return frags


@pytest.fixture()
def fake_lance(monkeypatch, tmp_path):
    frags = _fragments()
    mod = FakeLanceModule(frags)
    monkeypatch.setattr(readers, "lance", mod)
    monkeypatch.setattr(readers, "HAVE_LANCE", True)
    monkeypatch.setattr(readers, "PREFER_NATIVE_LANCE", False)  # force fragment path
    path = tmp_path / "corpus.lance"
    path.mkdir()
    return str(path), mod, frags


def test_lance_fragment_read_streams_all_rows(ray_session, fake_lance):
    path, mod, frags = fake_lance
    ds = readers.read_documents(path)
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(df) == 12
    assert df["doc_id"].tolist() == list(range(12))
    # the driver only listed fragments; rows were read inside tasks
    assert set(df.columns) == {"doc_id", "text", "extra"}


def test_lance_fragment_read_prunes_columns(ray_session, fake_lance):
    path, mod, frags = fake_lance
    ds = readers.read_documents(path, columns=["doc_id", "text"])
    df = ds.to_pandas()
    assert set(df.columns) == {"doc_id", "text"}
    assert len(df) == 12


def test_lance_missing_package_raises(monkeypatch, tmp_path):
    monkeypatch.setattr(readers, "HAVE_LANCE", False)
    path = tmp_path / "corpus.lance"
    path.mkdir()
    with pytest.raises(ImportError, match="lance"):
        readers.read_documents(str(path))


def test_read_any_dispatch_parquet(ray_session, sf_smoke):
    ds = readers.read_any(f"{sf_smoke}/nation.parquet", columns=["n_nationkey"])
    assert ds.count() == 25


def test_read_parquet_evolved_aligns_schema_generations(tmp_path):
    import pyarrow.parquet as pq

    from ocr_ray.sources.readers import read_parquet_evolved

    # generation 1: (id, a); generation 2: (id, b) — a dropped, b added
    pq.write_table(
        pa.table({"id": pa.array([1, 2], pa.int64()), "a": pa.array(["x", "y"])}),
        tmp_path / "g1.parquet",
    )
    pq.write_table(
        pa.table({"id": pa.array([3], pa.int64()), "b": pa.array([7.5], pa.float64())}),
        tmp_path / "g2.parquet",
    )
    ds = read_parquet_evolved(str(tmp_path))
    df = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert list(df.columns) == ["id", "a", "b"]
    assert df["a"].tolist()[:2] == ["x", "y"] and pd.isna(df["a"][2])
    assert pd.isna(df["b"][0]) and df["b"][2] == 7.5


def test_read_parquet_evolved_promotes_and_null_fills(tmp_path, ray_session):
    """Schema drift handling: int32->int64 promotion (narrowing casts used
    to crash mid-scan), null blocks for generations lacking every requested
    column, caller's column order, recursive partitioned layout, and loud
    errors for empty dirs / unknown columns."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from ocr_ray.sources.readers import read_parquet_evolved

    d = tmp_path / "corpus" / "part=0"
    d.mkdir(parents=True)
    big = 2**40
    pq.write_table(
        pa.table({"id": pa.array([1, 2], pa.int32()), "a": pa.array(["x", "y"])}),
        d / "gen1.parquet",
    )
    pq.write_table(
        pa.table({"id": pa.array([big], pa.int64()), "b": pa.array([7], pa.int64())}),
        d / "gen2.parquet",
    )

    out = read_parquet_evolved(str(tmp_path / "corpus")).to_pandas()
    assert sorted(int(v) for v in out["id"]) == [1, 2, big]  # promoted, not crashed
    assert out["b"].notna().sum() == 1 and out["a"].notna().sum() == 2

    # caller's column order wins; a gen with NO requested column yields nulls
    cols = read_parquet_evolved(str(tmp_path / "corpus"), columns=["b", "a"])
    assert cols.schema().names == ["b", "a"]
    df = cols.to_pandas()
    assert len(df) == 3 and df["b"].notna().sum() == 1

    with pytest.raises(FileNotFoundError):  # non-dir path = single file
        read_parquet_evolved(str(tmp_path / "nothing_here"))
    (tmp_path / "nothing_here").mkdir()
    with pytest.raises(ValueError, match="no parquet files"):
        read_parquet_evolved(str(tmp_path / "nothing_here"))
    with pytest.raises(ValueError, match="exist in no file"):
        read_parquet_evolved(str(tmp_path / "corpus"), columns=["typo"])
