"""Checkpoint/resume (manifest) + skew (two-phase reassembly) tests —
the f_idem_resume and f_skew fixture families of FIXTURES.md."""

from __future__ import annotations

import shutil
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from ocr_ray.corpus import ensure_corpus
from ocr_ray.oracle import expected_extraction
from ocr_ray.pipelines.extract import extract_documents
from ocr_ray.schema import SPAN_STRUCT, docs_table_to_dict, span_sequences_equal
from ocr_ray.sources import read_documents
from ocr_ray.state import load_manifest, write_extracted_resumable
from ocr_ray.state.manifest import skip_completed_partitions

OUT = "/tmp/ocr_ray_test_resume"


def _read_all_fragments(out_dir: str) -> pa.Table:
    files = sorted(Path(out_dir).glob("part=*/data.parquet"))
    return pa.concat_tables([pq.read_table(f) for f in files])


def test_resumable_write_and_resume(sf_smoke):
    shutil.rmtree(OUT, ignore_errors=True)
    corpus = ensure_corpus(sf_smoke, glyphs=False)
    num_parts = 8

    # Run 1: process only a *subset* of partitions by simulating a kill —
    # write fragments for docs in partitions 0..3 (filter the input), as if
    # the job died halfway.
    from ocr_ray.state.manifest import partition_of

    def keep_low_parts(t: pa.Table) -> pa.Table:
        parts = partition_of(t["doc_id"], num_parts)
        return t.filter(pa.array(parts < 4))

    ds1 = read_documents(corpus).map_batches(keep_low_parts, batch_format="pyarrow")
    m1 = write_extracted_resumable(
        extract_documents(ds1, num_buckets=8, recognizer_concurrency=2), OUT, num_parts=num_parts
    )
    assert set(m1["partition"]) == {0, 1, 2, 3}
    assert len(load_manifest(OUT)) == 4

    # Run 2 (resume): full input, completed partitions skipped at the read.
    ds2, n_done = skip_completed_partitions(read_documents(corpus), OUT, num_parts)
    assert n_done == 4
    m2 = write_extracted_resumable(
        extract_documents(ds2, num_buckets=8, recognizer_concurrency=2), OUT, num_parts=num_parts
    )
    assert set(m2["partition"]) == {4, 5, 6, 7}, "resume must process only unfinished partitions"

    # Exactly-once: every doc in exactly one fragment, content == oracle.
    tbl = _read_all_fragments(OUT)
    got = docs_table_to_dict(tbl)
    want = expected_extraction(sf_smoke)
    assert sorted(got) == sorted(want)
    assert len(tbl["doc_id"]) == len(set(tbl["doc_id"].to_pylist())), "doc duplicated across fragments"
    for d in want:
        assert span_sequences_equal(got[d], want[d]), d

    # Manifest lineage records carry metrics.
    rec = load_manifest(OUT)[0]
    assert rec["status"] == "complete" and rec["row_count"] > 0 and "span_checksum" in rec


def test_rerun_after_complete_is_noop(sf_smoke):
    corpus = ensure_corpus(sf_smoke, glyphs=False)
    ds, n_done = skip_completed_partitions(read_documents(corpus), OUT, 8)
    assert n_done == 8
    assert ds.count() == 0  # nothing left to do


def _skew_corpus(n_small: int = 99, n_big: int = 2, big_spans: int = 3000) -> pa.Table:
    """990-small + pathological-docs shape (f_skew), deterministic."""
    rng = np.random.default_rng(7)
    rows_ids, rows_spans = [], []
    for i in range(n_small):
        k = int(rng.integers(3, 10))
        rows_ids.append(f"s-{i:05d}")
        rows_spans.append(
            [
                {"kind": "text", "text": f"small {i} {j}", "media_ref": "", "offset": j}
                for j in range(k)
            ]
        )
    for i in range(n_big):
        rows_ids.append(f"big-{i:03d}")
        spans = [
            {
                "kind": ("media" if j % 11 == 3 else "text"),
                "text": ("" if j % 11 == 3 else f"big {i} {j}"),
                "media_ref": (f"m-{j}" if j % 11 == 3 else ""),
                "offset": j,
            }
            for j in range(big_spans)
        ]
        rng.shuffle(spans)
        rows_spans.append(spans)
    return pa.table(
        {
            "doc_id": pa.array(rows_ids, type=pa.string()),
            "spans": pa.array(rows_spans, type=pa.large_list(SPAN_STRUCT)),
        }
    )


@pytest.mark.parametrize("two_phase", [False, True], ids=["single", "two_phase"])
def test_skew_reassembly_equivalence(two_phase):
    corpus = _skew_corpus()
    out = extract_documents(
        rd.from_arrow(corpus),
        num_buckets=8,
        recognizer_concurrency=2,
        two_phase=two_phase,
        chunk_size=256,
    ).to_pandas()
    got = {r["doc_id"]: list(r["spans"]) for _, r in out.iterrows()}
    assert len(got) == corpus.num_rows
    # every doc reassembled in offset order with re-indexed offsets
    src = docs_table_to_dict(corpus)
    for doc_id, spans in src.items():
        expect = sorted(spans, key=lambda s: s["offset"])
        g = got[doc_id]
        assert [s["offset"] for s in g] == list(range(len(g)))
        assert span_sequences_equal(g, [{**s, "offset": i} for i, s in enumerate(expect)]), doc_id


def test_two_phase_agrees_with_single_phase(sf_smoke):
    corpus = ensure_corpus(sf_smoke, glyphs=True)
    a = extract_documents(read_documents(corpus), num_buckets=8, two_phase=False).to_pandas()
    b = extract_documents(
        read_documents(corpus), num_buckets=8, two_phase=True, chunk_size=4
    ).to_pandas()
    da = {r["doc_id"]: list(r["spans"]) for _, r in a.iterrows()}
    db = {r["doc_id"]: list(r["spans"]) for _, r in b.iterrows()}
    assert set(da) == set(db)
    for d in da:
        assert span_sequences_equal(da[d], db[d]), d


def test_fused_extract_and_write_matches_oracle(sf_smoke, tmp_path):
    from ocr_ray.pipelines.extract import extract_and_write

    corpus = ensure_corpus(sf_smoke, glyphs=True)
    out = str(tmp_path / "fused")
    m, skipped = extract_and_write(
        read_documents(corpus), out, num_parts=8, recognizer_concurrency=2,
        num_buckets=8, two_phase=True, chunk_size=64,
    )
    assert skipped == 0 and int(m["row_count"].sum()) > 0
    got = docs_table_to_dict(_read_all_fragments(out))
    want = expected_extraction(sf_smoke)
    assert sorted(got) == sorted(want)
    for d in want:
        assert span_sequences_equal(got[d], want[d]), d
    # resume: second run skips everything
    m2, skipped2 = extract_and_write(
        read_documents(corpus), out, num_parts=8, recognizer_concurrency=2,
        num_buckets=8, two_phase=True, chunk_size=64,
    )
    assert skipped2 == 8 and len(m2) == 0


def test_compact_partitions_preserves_content(sf_smoke, tmp_path):
    """Compaction rewrites a fine-grained fragment directory at a coarser
    partition count; the layout-invariant checksum must self-verify and
    the row set (by doc_id and span sequence) must be identical."""
    from ocr_ray.state.manifest import compact_partitions

    src_dir = str(tmp_path / "fine")
    dst_dir = str(tmp_path / "coarse")
    corpus = ensure_corpus(sf_smoke, glyphs=False)
    ds = read_documents(corpus)
    write_extracted_resumable(
        extract_documents(ds, num_buckets=8, recognizer_concurrency=2),
        src_dir,
        num_parts=16,
    )
    assert len(load_manifest(src_dir)) == 16

    m = compact_partitions(src_dir, dst_dir, num_parts=4)
    assert len(load_manifest(dst_dir)) == 4
    assert set(m["partition"]) == {0, 1, 2, 3}

    before = _read_all_fragments(src_dir)
    after = _read_all_fragments(dst_dir)
    assert after.num_rows == before.num_rows
    bd, ad = docs_table_to_dict(before), docs_table_to_dict(after)
    assert set(bd) == set(ad)
    assert all(span_sequences_equal(bd[k], ad[k]) for k in bd)

    # tampering with a fragment must make compaction fail loudly
    bad_dir = str(tmp_path / "bad")
    frag = sorted(Path(src_dir).glob("part=*/data.parquet"))[0]
    t = pq.read_table(frag)
    pq.write_table(t.slice(0, max(t.num_rows - 1, 0)), frag)
    with pytest.raises(RuntimeError, match="compaction verification failed"):
        compact_partitions(src_dir, bad_dir, num_parts=4)


def test_sorted_export_fragments(ray_session, tmp_path):
    """Range-partitioned sorted export: value-ordered non-overlapping
    fragments, each internally sorted, covering every input row."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray

    from ocr_ray.state.manifest import load_manifest, sorted_export

    src = pq.read_table("/root/testdata/sf0.001/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    out = str(tmp_path / "sorted")
    df = sorted_export(
        ray.data.from_arrow(src).repartition(5),
        out,
        value_col="o_totalprice",
        tiebreak_col="o_orderkey",
        out_cols=["o_orderkey", "o_totalprice"],
        num_fragments=8,
    )
    recs = sorted(load_manifest(out).values(), key=lambda r: r["partition"])
    assert len(recs) == 8
    assert sum(r["row_count"] for r in recs) == src.num_rows
    prev_max = -np.inf
    seen = []
    for r in recs:
        frag = pq.read_table(r["file"])
        v = frag["o_totalprice"].to_numpy()
        assert np.all(np.diff(v) >= 0), "fragment not internally sorted"
        assert v[0] >= prev_max, "fragment ranges overlap"
        assert (v[0], v[-1]) == (r["min_value"], r["max_value"])
        prev_max = v[-1]
        seen.append(frag["o_orderkey"].to_numpy())
    # exact cover: same multiset of keys
    assert sorted(np.concatenate(seen).tolist()) == sorted(src["o_orderkey"].to_numpy().tolist())


def test_sink_rejects_changed_num_parts(sf_smoke, tmp_path):
    """partition_of membership is positional in num_parts: resuming (or
    re-writing) a sink directory under a different partition count must
    fail loudly instead of silently dropping/duplicating documents."""
    import pytest as _pytest

    from ocr_ray.pipelines.extract import extract_documents_local
    from ocr_ray.state.manifest import skip_completed_partitions, write_extracted_resumable

    corpus = ensure_corpus(sf_smoke, glyphs=False)
    out = str(tmp_path / "law")
    nested = extract_documents_local(read_documents(corpus))
    write_extracted_resumable(nested, out, num_parts=8)
    with _pytest.raises(ValueError, match="num_parts=8"):
        skip_completed_partitions(read_documents(corpus), out, 16)
    with _pytest.raises(ValueError, match="num_parts=8"):
        write_extracted_resumable(nested, out, num_parts=4)
    # matching law still resumes
    _, n_done = skip_completed_partitions(read_documents(corpus), out, 8)
    assert n_done == 8


# --------------------------------------------------------------------------
# Snapshots (time travel over the resumable sink)
# --------------------------------------------------------------------------


def _mini_frag_table(lo: int, n: int) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([f"doc-{i:08d}" for i in range(lo, lo + n)]),
            "payload": pa.array(np.arange(lo, lo + n, dtype=np.int64)),
        }
    )


def _write_parts(out, parts):
    from ocr_ray.state.manifest import ResumableSink

    sink = ResumableSink(str(out), data_format="parquet")
    for p, tbl in parts.items():
        sink.write(tbl, p)


def test_snapshot_isolated_from_rewrite(ray_session, tmp_path):
    """A snapshot read returns the pinned bytes even after the live
    partition is rewritten in place (hard link keeps the old inode)."""
    from ocr_ray.state.manifest import read_snapshot, snapshot_commit

    out = tmp_path / "t"
    _write_parts(out, {0: _mini_frag_table(0, 10), 1: _mini_frag_table(10, 5)})
    v1 = snapshot_commit(str(out), note="v1")
    _write_parts(out, {0: _mini_frag_table(0, 3)})  # destructive rewrite
    back = read_snapshot(str(out), v1).to_pandas().sort_values("payload")
    assert len(back) == 15 and list(back["payload"]) == list(range(15))


def test_snapshot_log_diff_and_errors(ray_session, tmp_path):
    from ocr_ray.state.manifest import (
        list_snapshots,
        read_snapshot,
        snapshot_commit,
        snapshot_diff,
    )

    out = tmp_path / "t"
    with pytest.raises(ValueError, match="no committed fragments"):
        snapshot_commit(str(out))
    _write_parts(out, {0: _mini_frag_table(0, 10), 1: _mini_frag_table(10, 5)})
    v1 = snapshot_commit(str(out), note="first")
    _write_parts(out, {1: _mini_frag_table(10, 2), 2: _mini_frag_table(20, 4)})
    v2 = snapshot_commit(str(out), note="second")
    log = list_snapshots(str(out))
    assert [s["snapshot"] for s in log] == [v1, v2]
    assert log[0]["parent"] is None and log[1]["parent"] == v1
    assert log[0]["row_count"] == 15 and log[1]["row_count"] == 16
    d = snapshot_diff(str(out), v1, v2)
    assert d["added"] == [2] and d["changed"] == [1] and d["removed"] == []
    with pytest.raises(ValueError, match="snapshot 99 not found"):
        read_snapshot(str(out), 99)


def test_snapshot_crashed_commit_orphan_is_cleared(ray_session, tmp_path):
    """A files dir without its JSON (crash before the commit rename) is
    invisible to readers and cleared by the next commit."""
    from ocr_ray.state.manifest import list_snapshots, snapshot_commit

    out = tmp_path / "t"
    _write_parts(out, {0: _mini_frag_table(0, 6)})
    # simulate a crashed attempt: files dir exists, no snap-00001.json
    orphan = out / "_snapshots" / "snap-00001-files"
    orphan.mkdir(parents=True)
    (orphan / "junk").write_text("partial")
    assert list_snapshots(str(out)) == []
    v1 = snapshot_commit(str(out))
    assert v1 == 1 and not (orphan / "junk").exists()
    assert list_snapshots(str(out))[0]["n_fragments"] == 1


def test_read_range_pruned_skips_by_manifest(ray_session, tmp_path):
    """Fragments outside [lo, hi] are skipped from the manifest alone;
    kept fragments still carry out-of-band rows (residual filter is the
    caller's job); missing stats are a loud error."""
    from ocr_ray.state.manifest import ResumableSink, read_range_pruned

    out = tmp_path / "t"
    sink = ResumableSink(str(out), data_format="parquet")
    for p, (lo, hi) in enumerate([(0, 9), (10, 19), (20, 29)]):
        tbl = pa.table({"v": pa.array(np.arange(lo, hi + 1, dtype=np.int64))})
        sink.write(tbl, p, extra={"min_value": lo, "max_value": hi})
    ds, skipped = read_range_pruned(str(out), lo=12, hi=14)
    assert skipped == 2
    vals = sorted(ds.to_pandas()["v"])
    assert vals == list(range(10, 20))  # whole fragment, pre-residual
    ds2, skipped2 = read_range_pruned(str(out), lo=100)
    assert skipped2 == 3 and ds2.count() == 0
    ds3, skipped3 = read_range_pruned(str(out))  # unbounded = full scan
    assert skipped3 == 0 and ds3.count() == 30

    sink.write(pa.table({"v": pa.array([99])}), 7)  # no sort-key interval
    with pytest.raises(ValueError, match="no sort-key min/max"):
        read_range_pruned(str(out), lo=0, hi=1)
    # ...but the AUTOMATIC per-column stats cover the same fragment
    ds4, skipped4 = read_range_pruned(str(out), lo=99, hi=99, column="v")
    assert skipped4 == 3 and ds4.count() == 1


def test_expire_snapshots_retention(ray_session, tmp_path):
    """Vacuum keeps the newest K snapshots readable and removes the rest;
    the live table and surviving snapshots are untouched."""
    from ocr_ray.state.manifest import (
        expire_snapshots,
        list_snapshots,
        read_snapshot,
        snapshot_commit,
    )

    out = tmp_path / "t"
    _write_parts(out, {0: _mini_frag_table(0, 4)})
    v1 = snapshot_commit(str(out))
    _write_parts(out, {0: _mini_frag_table(0, 6)})
    v2 = snapshot_commit(str(out))
    _write_parts(out, {0: _mini_frag_table(0, 8)})
    v3 = snapshot_commit(str(out))
    expired = expire_snapshots(str(out), keep_last=2)
    assert expired == [v1]
    assert [s["snapshot"] for s in list_snapshots(str(out))] == [v2, v3]
    assert read_snapshot(str(out), v2).count() == 6
    with pytest.raises(ValueError, match="not found"):
        read_snapshot(str(out), v1)
    with pytest.raises(ValueError, match="keep_last"):
        expire_snapshots(str(out), keep_last=0)


def test_bloom_filter_membership_and_fp_rate():
    """All inserted keys probe True; the false-positive rate on disjoint
    probes stays near the design point (< 2% at 4 hashes, 131072 bits,
    10k keys)."""
    from ocr_ray.state.manifest import bloom_may_contain, column_bloom

    keys = np.arange(10_000, dtype=np.int64) * 7 + 3
    b = column_bloom(keys)
    assert bloom_may_contain(b, keys).all()
    probes = np.arange(1_000_000, 1_050_000, dtype=np.int64)
    fp = bloom_may_contain(b, probes).mean()
    assert fp < 0.02, fp


def test_read_key_pruned_skips_and_errors(ray_session, tmp_path):
    from ocr_ray.state.manifest import (
        ResumableSink,
        column_bloom,
        read_key_pruned,
    )

    out = tmp_path / "t"
    sink = ResumableSink(str(out), data_format="parquet")
    for p in range(4):
        ks = np.arange(p * 100, p * 100 + 100, dtype=np.int64)
        sink.write(
            pa.table({"k": pa.array(ks)}),
            p,
            extra={"bloom_k": column_bloom(ks)},
        )
    ds, skipped, checks = read_key_pruned(str(out), "bloom_k", [5, 250])
    assert skipped == 2 and checks == 2
    got = sorted(ds.to_pandas()["k"])
    assert 5 in got and 250 in got and len(got) == 200  # whole fragments
    ds2, skipped2, checks2 = read_key_pruned(str(out), "bloom_k", [999_999])
    assert skipped2 == 4 and checks2 == 0 and ds2.count() == 0
    sink.write(pa.table({"k": pa.array([1], pa.int64())}), 9)
    with pytest.raises(ValueError, match="no 'bloom_k'"):
        read_key_pruned(str(out), "bloom_k", [1])


def test_delete_keys_rewrites_only_affected(ray_session, tmp_path):
    """delete_keys touches exactly the partition-law fragments, commits
    emptied fragments as complete empty tables, and a pre-delete snapshot
    still reads the deleted rows (hard-link isolation composes)."""
    from ocr_ray.state.manifest import (
        ResumableSink,
        _check_layout,
        delete_keys,
        load_manifest,
        partition_of,
        read_fragments,
        read_snapshot,
        snapshot_commit,
    )

    out = tmp_path / "t"
    num_parts = 4
    ids = [f"doc-{i:04d}" for i in range(40)]
    parts = partition_of(ids, num_parts)
    _check_layout(str(out), num_parts, write=True)
    sink = ResumableSink(str(out), data_format="parquet")
    for p in range(num_parts):
        sel = [i for i, q in enumerate(parts) if q == p]
        sink.write(
            pa.table(
                {
                    "doc_id": pa.array([ids[i] for i in sel]),
                    "v": pa.array(np.asarray(sel, dtype=np.int64)),
                }
            ),
            p,
        )
    v1 = snapshot_commit(str(out))

    # delete one whole partition's docs + one doc from another
    victim_part = int(parts[0])
    victims = [ids[i] for i, q in enumerate(parts) if q == victim_part]
    other = next(ids[i] for i, q in enumerate(parts) if q != victim_part)
    victims.append(other)
    res = delete_keys(str(out), victims)
    expect_parts = sorted({victim_part, int(partition_of([other], num_parts)[0])})
    assert sorted(res["partition"]) == expect_parts
    assert int(res["deleted"].sum()) == len(victims)

    man = load_manifest(str(out))
    assert len(man) == num_parts  # emptied fragment still complete
    assert man[victim_part]["row_count"] == 0 and man[victim_part]["deleted"] > 0
    live = read_fragments([r["file"] for r in man.values()]).to_pandas()
    assert len(live) == 40 - len(victims)
    assert not set(victims) & set(live["doc_id"])
    # pre-delete snapshot unaffected
    assert read_snapshot(str(out), v1).count() == 40

    assert delete_keys(str(out), []).empty
    assert delete_keys(str(out), ["doc-9999"])["deleted"].sum() == 0


def test_copartitioned_join_zero_shuffle_semantics(ray_session, tmp_path):
    """Partition-pair join matches a plain merge; missing partitions on
    one side behave per join type; mismatched layouts are refused."""
    import pandas as pd

    from ocr_ray.state.manifest import (
        ResumableSink,
        _check_layout,
        partition_of,
        read_copartitioned_join,
    )

    def write(dirname, df, key, num_parts=4, skip_parts=()):
        out = str(tmp_path / dirname)
        _check_layout(out, num_parts, write=True)
        sink = ResumableSink(out, data_format="parquet")
        parts = partition_of(df[key].tolist(), num_parts)
        for p in range(num_parts):
            if p in skip_parts:
                continue
            sub = df[parts == p]
            sink.write(
                pa.Table.from_pandas(sub, preserve_index=False).replace_schema_metadata(None),
                p,
            )
        return out

    a = pd.DataFrame({"k": np.arange(20, dtype=np.int64), "va": np.arange(20) * 10})
    b = pd.DataFrame(
        {"k": np.repeat(np.arange(20, dtype=np.int64), 2), "vb": np.arange(40)}
    )
    da = write("a", a, "k")
    db = write("b", b, "k")
    schema = pa.schema({"k": pa.int64(), "va": pa.int64(), "vb": pa.int64()})
    got = (
        read_copartitioned_join(da, db, on="k", schema=schema)
        .to_pandas()
        .sort_values(["k", "vb"], ignore_index=True)
    )
    want = a.merge(b, on="k").sort_values(["k", "vb"], ignore_index=True)
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))

    # a partition absent on the right: inner join drops those keys
    db2 = write("b2", b, "k", skip_parts=(0,))
    got2 = read_copartitioned_join(da, db2, on="k", schema=schema).to_pandas()
    dropped = partition_of(a["k"].tolist(), 4) == 0
    assert len(got2) == 2 * (20 - int(dropped.sum()))

    # layout mismatch is loud
    dc = write("c", a, "k", num_parts=8)
    with pytest.raises(ValueError, match="equal partition counts"):
        read_copartitioned_join(da, dc, on="k", schema=schema)


def test_copartitioned_left_join_null_fills_missing_side(ray_session, tmp_path):
    """Regression: a partition present on the left but absent on the right
    must null-fill the right columns under how='left', not KeyError."""
    import pandas as pd

    from ocr_ray.state.manifest import (
        ResumableSink,
        _check_layout,
        partition_of,
        read_copartitioned_join,
    )

    def write(dirname, df, skip=()):
        out = str(tmp_path / dirname)
        _check_layout(out, 4, write=True)
        sink = ResumableSink(out, data_format="parquet")
        parts = partition_of(df["k"].tolist(), 4)
        for p in range(4):
            if p in skip:
                continue
            sink.write(
                pa.Table.from_pandas(df[parts == p], preserve_index=False)
                .replace_schema_metadata(None),
                p,
            )
        return out

    a = pd.DataFrame({"k": np.arange(12, dtype=np.int64), "va": np.arange(12) * 10})
    b = pd.DataFrame({"k": np.arange(12, dtype=np.int64), "vb": np.arange(12) + 100})
    missing = 0
    da = write("la", a)
    db = write("lb", b, skip=(missing,))
    schema = pa.schema({"k": pa.int64(), "va": pa.int64(), "vb": pa.int64()})
    got = (
        read_copartitioned_join(da, db, on="k", schema=schema, how="left")
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    assert len(got) == 12  # every left row kept
    dropped = partition_of(a["k"].tolist(), 4) == missing
    assert got["vb"].isna().sum() == int(dropped.sum()) and got["vb"].isna().sum() > 0
    assert got["va"].notna().all()


def test_sink_auto_column_stats_and_pruned_read(ray_session, tmp_path):
    """Every sink write records per-column min/max automatically; a range
    scan on ANY primitive column can file-skip via column=..., and
    all-null/nested columns are cleanly absent from the stats."""
    from ocr_ray.state.manifest import ResumableSink, load_manifest, read_range_pruned

    out = tmp_path / "t"
    sink = ResumableSink(str(out), data_format="parquet")
    for p, lo in enumerate([0, 100, 200]):
        sink.write(
            pa.table(
                {
                    "k": pa.array(np.arange(lo, lo + 50, dtype=np.int64)),
                    "name": pa.array([f"n{j:05d}" for j in range(lo, lo + 50)]),
                    "blob": pa.array([b"x"] * 50, pa.binary()),
                    "allnull": pa.array([None] * 50, pa.float64()),
                }
            ),
            p,
        )
    rec = load_manifest(str(out))[1]
    assert rec["stats"]["k"] == [100, 149]
    assert rec["stats"]["name"] == ["n00100", "n00149"]
    assert "blob" not in rec["stats"] and "allnull" not in rec["stats"]

    ds, skipped = read_range_pruned(str(out), lo=120, hi=130, column="k")
    assert skipped == 2 and sorted(ds.to_pandas()["k"])[:1] == [100]
    ds2, skipped2 = read_range_pruned(
        str(out), lo="n00200", hi="n00210", column="name"
    )
    assert skipped2 == 2 and len(ds2.to_pandas()) == 50
    with pytest.raises(ValueError, match="stats for column 'blob'"):
        read_range_pruned(str(out), lo=0, column="blob")


def test_zorder_export_prunes_both_columns(ray_session, tmp_path):
    """Morton tiling makes the automatic stats selective on BOTH columns;
    a single-column sort is the control: perfect on its own column,
    useless (0 skipped) on the other."""
    import pandas as pd
    import ray.data as _rd

    from ocr_ray.state.manifest import (
        read_range_pruned,
        sorted_export,
        zorder_export,
    )

    rng = np.random.default_rng(3)
    n = 4000
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "x": rng.integers(0, 10_000, n),
            "y": rng.integers(0, 10_000, n),
        }
    )
    ds = _rd.from_pandas(df)
    zdir = str(tmp_path / "z")
    zorder_export(
        ds, zdir, cols=("x", "y"), tiebreak_col="id",
        out_cols=["id", "x", "y"], num_fragments=16,
    )
    _, skip_x = read_range_pruned(zdir, lo=4000, hi=6000, column="x")
    _, skip_y = read_range_pruned(zdir, lo=4000, hi=6000, column="y")
    assert skip_x >= 2 and skip_y >= 2, (skip_x, skip_y)

    sdir = str(tmp_path / "s")
    sorted_export(
        _rd.from_pandas(df), sdir, value_col="x", tiebreak_col="id",
        out_cols=["id", "x", "y"], num_fragments=16,
    )
    _, cskip_x = read_range_pruned(sdir, lo=4000, hi=6000, column="x")
    _, cskip_y = read_range_pruned(sdir, lo=4000, hi=6000, column="y")
    assert cskip_x >= 10 and cskip_y == 0  # the control: one-dim layouts

    # pruned read returns every in-range row (completeness, not just counts)
    got, _ = read_range_pruned(zdir, lo=4000, hi=6000, column="x")
    rows = got.to_pandas()
    rows = rows[(rows["x"] >= 4000) & (rows["x"] <= 6000)]
    want = df[(df["x"] >= 4000) & (df["x"] <= 6000)]
    assert sorted(rows["id"]) == sorted(want["id"])


def test_read_range_pruned_empty_fragment_and_date_bounds(ray_session, tmp_path):
    """Regressions from review: an EMPTIED fragment (post-delete) is
    trivially skipped, not a stats error; datetime bounds coerce to the
    str() form date/timestamp stats are stored as."""
    import datetime

    from ocr_ray.state.manifest import ResumableSink, read_range_pruned

    out = tmp_path / "t"
    sink = ResumableSink(str(out), data_format="parquet")
    sink.write(
        pa.table(
            {
                "k": pa.array([1, 2], pa.int64()),
                "ts": pa.array(
                    [datetime.datetime(2024, 1, 2), datetime.datetime(2024, 1, 5)],
                    pa.timestamp("us"),
                ),
            }
        ),
        0,
    )
    sink.write(
        pa.table({"k": pa.array([], pa.int64()), "ts": pa.array([], pa.timestamp("us"))}),
        1,
    )  # empty fragment: no stats, must be skippable
    ds, skipped = read_range_pruned(str(out), lo=0, hi=10, column="k")
    assert skipped == 1 and ds.count() == 2
    ds2, skipped2 = read_range_pruned(
        str(out),
        lo=datetime.datetime(2024, 1, 1),
        hi=datetime.datetime(2024, 1, 3),
        column="ts",
    )
    assert skipped2 == 1 and ds2.count() == 2
    ds3, skipped3 = read_range_pruned(
        str(out), lo=datetime.datetime(2025, 1, 1), column="ts"
    )
    assert skipped3 == 2 and ds3.count() == 0
