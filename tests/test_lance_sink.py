"""ResumableSink Lance write branch (with a monkeypatched fake lance
module — the real package is absent here; same trick as test_sources.py).

Invariants under test:
- ``data_format="auto"`` resolves by package availability, mirroring the
  readers' dispatch;
- the Lance branch commits a fragment DIRECTORY with no temp leftovers,
  and the manifest sidecar (the commit point) records the format;
- rewriting a partition (resume overwrite) replaces the fragment cleanly;
- a manifest written under one format refuses to resume under another
  (layout sidecar guard);
- ``read_fragments`` dispatches ``.lance`` entries through the streaming
  Lance reader and everything else through ``read_parquet``.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pytest

import ocr_ray.state.manifest as manifest
from ocr_ray.state.manifest import ResumableSink, _check_layout, read_fragments
from ocr_ray.testing import FakeLanceWriterModule


def _tbl(ids):
    return pa.table(
        {
            "doc_id": pa.array(list(ids), type=pa.int64()),
            "text": pa.array([f"doc {i}" for i in ids], type=pa.string()),
        }
    )


@pytest.fixture()
def fake_lance(monkeypatch):
    mod = FakeLanceWriterModule()
    monkeypatch.setattr(manifest, "lance", mod)
    monkeypatch.setattr(manifest, "HAVE_LANCE", True)
    return mod


def test_auto_resolves_parquet_without_lance(monkeypatch, tmp_path):
    monkeypatch.setattr(manifest, "HAVE_LANCE", False)
    sink = ResumableSink(str(tmp_path), data_format="auto")
    assert sink.data_format == "parquet"


def test_auto_resolves_lance_with_lance(fake_lance, tmp_path):
    sink = ResumableSink(str(tmp_path), data_format="auto")
    assert sink.data_format == "lance"


def test_explicit_lance_without_package_raises(monkeypatch, tmp_path):
    monkeypatch.setattr(manifest, "HAVE_LANCE", False)
    with pytest.raises(ImportError, match="lance"):
        ResumableSink(str(tmp_path), data_format="lance")


def test_unknown_format_raises(tmp_path):
    with pytest.raises(ValueError, match="data_format"):
        ResumableSink(str(tmp_path), data_format="orc")


def test_lance_fragment_commit_and_manifest(fake_lance, tmp_path):
    out = str(tmp_path / "out")
    sink = ResumableSink(out, data_format="lance")
    row = sink.write(_tbl([1, 2, 3]), 3)
    assert row["row_count"][0].as_py() == 3

    frag = Path(out) / "part=00003" / "data.lance"
    assert frag.is_dir()
    assert fake_lance.dataset_table(frag).num_rows == 3
    # no temp leftovers: the tmp dir was renamed into place
    stray = [p for p in frag.parent.iterdir() if p.name.startswith(".tmp-")]
    assert stray == []

    recs = manifest.load_manifest(out)
    assert set(recs) == {3}
    assert recs[3]["format"] == "lance"
    assert recs[3]["file"].endswith("data.lance")
    assert recs[3]["row_count"] == 3


def test_lance_rewrite_replaces_fragment(fake_lance, tmp_path):
    out = str(tmp_path / "out")
    sink = ResumableSink(out, data_format="lance")
    sink.write(_tbl([1, 2, 3]), 0)
    # resume overwrite: a partition rewritten after a partial run must
    # replace the old directory, not merge into it
    sink.write(_tbl([7, 8]), 0)
    frag = Path(out) / "part=00000" / "data.lance"
    got = fake_lance.dataset_table(frag)
    assert got["doc_id"].to_pylist() == [7, 8]
    assert manifest.load_manifest(out)[0]["row_count"] == 2


def test_layout_guard_rejects_format_change(tmp_path):
    out = str(tmp_path / "out")
    _check_layout(out, 4, write=True, extra={"data_format": "parquet"})
    with pytest.raises(ValueError, match="data_format"):
        _check_layout(out, 4, write=True, extra={"data_format": "lance"})
    # same format resumes fine
    _check_layout(out, 4, write=True, extra={"data_format": "parquet"})


def test_read_fragments_dispatch(fake_lance, monkeypatch, ray_session, tmp_path):
    import pyarrow.parquet as pq

    import ocr_ray.sources.readers as readers

    pq_file = tmp_path / "a.parquet"
    pq.write_table(_tbl([1, 2]), pq_file)

    lance_dir = tmp_path / "b" / "data.lance"
    fake_lance.write_dataset(_tbl([5, 6, 7]), lance_dir)

    def fake_read_documents(path, *, columns=None, **kwargs):
        import ray.data

        return ray.data.from_arrow(fake_lance.dataset_table(path))

    monkeypatch.setattr(readers, "read_documents", fake_read_documents)
    ds = read_fragments([str(pq_file), str(lance_dir)])
    got = sorted(ds.to_pandas()["doc_id"].tolist())
    assert got == [1, 2, 5, 6, 7]


def test_read_fragments_empty_raises():
    with pytest.raises(ValueError, match="empty"):
        read_fragments([])


def test_lance_rewrite_demotes_manifest_until_recommit(fake_lance, tmp_path):
    """Crash-safety of the rewrite window: the sidecar is demoted to
    status='rewriting' BEFORE the old fragment dir is destroyed, so a
    crash mid-swap leaves the partition out of load_manifest (and the
    next resume rewrites it) instead of pointing at missing data."""
    from ocr_ray.state.manifest import load_manifest

    sink = ResumableSink(str(tmp_path), data_format="lance")
    sink.write(_tbl([1, 2]), 0)
    assert 0 in load_manifest(str(tmp_path))
    # Simulate the crash point: demotion happened, swap did not finish.
    sink._demote(0)
    assert 0 not in load_manifest(str(tmp_path))  # excluded -> will rewrite
    # A successful rewrite re-commits and the partition is complete again.
    sink.write(_tbl([1, 2, 3]), 0)
    rec = load_manifest(str(tmp_path))[0]
    assert rec["status"] == "complete" and rec["row_count"] == 3


def test_layout_merges_keys_introduced_after_creation(tmp_path):
    """skip_completed_partitions creates layout.json without data_format;
    the sink's later _check_layout must PERSIST the key so the format
    guard is live on subsequent resumes."""
    import json

    _check_layout(str(tmp_path), 8, write=True)  # layout without the key
    _check_layout(str(tmp_path), 8, write=True, extra={"data_format": "parquet"})
    saved = json.loads((tmp_path / "_manifest" / "layout.json").read_text())
    assert saved["data_format"] == "parquet"
    with pytest.raises(ValueError, match="data_format"):
        _check_layout(str(tmp_path), 8, write=True, extra={"data_format": "lance"})


def test_mor_delete_vectors_and_compaction(ray_session, tmp_path):
    """Deletion vectors: sidecar-only delete, idempotent merge, MoR read
    equals post-compaction physical read, vectors removed after fold."""
    import pandas as pd
    import pyarrow as pa
    import ray

    from ocr_ray.state.manifest import (
        compact_deletes,
        delete_keys_mor,
        load_delete_vectors,
        load_manifest,
        read_fragments,
        read_with_deletes,
        write_extracted_resumable,
    )

    docs = pa.table(
        {
            "doc_id": pa.array([f"doc-{i:08d}" for i in range(40)]),
            "spans": pa.array([[{"kind": "text", "text": f"t{i}", "media_ref": "", "offset": 0}] for i in range(40)]),
        }
    )
    out = str(tmp_path / "mor")
    write_extracted_resumable(ray.data.from_arrow(docs), out, num_parts=4)

    victims = [f"doc-{i:08d}" for i in (0, 7, 19, 33)]
    rep = delete_keys_mor(out, victims)
    assert int(rep["n_delete_keys"].sum()) == 4
    rep2 = delete_keys_mor(out, victims)  # idempotent merge
    assert int(rep2["n_delete_keys"].sum()) == 4
    assert len(load_delete_vectors(out)) == len(set(rep["partition"]))

    live = read_with_deletes(out)
    ids = set(r["doc_id"] for r in live.select_columns(["doc_id"]).take_all())
    assert ids == {f"doc-{i:08d}" for i in range(40)} - set(victims)

    compact_deletes(out)
    assert load_delete_vectors(out) == {}
    phys = read_fragments([r["file"] for r in load_manifest(out).values()])
    ids2 = set(r["doc_id"] for r in phys.select_columns(["doc_id"]).take_all())
    assert ids2 == ids
