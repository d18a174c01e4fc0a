"""Shard-aligned (zero-shuffle) extraction: equivalence with the shuffle
path, resume semantics, and fragment-slicing invariants.

The path's validity assumption — input rows are whole documents, so
reassembly is batch-local (``pipelines/extract.py``) — is exactly the
input_hint corpus shape; these tests pin the equivalence via the
layout-invariant manifest checksums (order-insensitive wrap-sums, so any
fragment layout of the same docs must agree).
"""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pytest

from ocr_ray.corpus import ensure_corpus
from ocr_ray.pipelines.extract import (
    _shard_fragments,
    extract_documents,
    extract_documents_local,
    extract_shard_aligned,
    list_parquet_shards,
)
from ocr_ray.sources import read_documents
from ocr_ray.state.manifest import load_manifest, write_extracted_resumable

SF = "/root/testdata/sf0.001"


def _totals(out_dir: str) -> tuple[int, int, int]:
    m = load_manifest(out_dir)
    return (
        sum(r["row_count"] for r in m.values()),
        sum(r["span_count"] for r in m.values()),
        sum(r["span_checksum"] for r in m.values()) % (1 << 64),
    )


@pytest.fixture(scope="module")
def corpus(ray_session):
    return ensure_corpus(SF, glyphs=True)


@pytest.fixture(scope="module")
def shuffle_totals(corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("shuffle_sink"))
    nested = extract_documents(read_documents(corpus), num_buckets=8)
    write_extracted_resumable(nested, out, num_parts=8)
    return _totals(out)


def test_shard_aligned_matches_shuffle_path(corpus, shuffle_totals, tmp_path):
    out = str(tmp_path / "shard")
    df, skipped = extract_shard_aligned(corpus, out, max_docs_per_fragment=20)
    assert skipped == 0
    assert _totals(out) == shuffle_totals
    # manifest rows returned through the Dataset match the sidecars
    assert int(df["row_count"].sum()) == shuffle_totals[0]


def test_fragment_slicing_is_layout_invariant(corpus, shuffle_totals, tmp_path):
    out = str(tmp_path / "coarse")
    extract_shard_aligned(corpus, out, max_docs_per_fragment=None)
    assert _totals(out) == shuffle_totals
    n_coarse = len(load_manifest(out))
    out2 = str(tmp_path / "fine")
    extract_shard_aligned(corpus, out2, max_docs_per_fragment=7)
    assert _totals(out2) == shuffle_totals
    assert len(load_manifest(out2)) > n_coarse


def test_resume_skips_committed_fragments(corpus, tmp_path):
    out = str(tmp_path / "resume")
    extract_shard_aligned(corpus, out, max_docs_per_fragment=20)
    before = _totals(out)
    total = len(load_manifest(out))
    victims = sorted(f for f in os.listdir(f"{out}/_manifest") if f.startswith("part-"))[:2]
    for v in victims:
        os.remove(f"{out}/_manifest/{v}")
    df, skipped = extract_shard_aligned(corpus, out, max_docs_per_fragment=20)
    assert skipped == total - 2
    assert len(df) == 2
    assert _totals(out) == before
    # fully-complete rerun does no work at all
    df2, skipped2 = extract_shard_aligned(corpus, out, max_docs_per_fragment=20)
    assert len(df2) == 0 and skipped2 == total


def test_fragment_ids_are_deterministic(corpus):
    shards = list_parquet_shards(corpus)
    assert shards == list_parquet_shards(corpus)
    frags = _shard_fragments(shards, 20)
    assert [f["fragment"] for f in frags] == list(range(len(frags)))
    # every source row is covered exactly once
    by_shard: dict[tuple, int] = {}
    for f in frags:
        by_shard[(f["path"], f["row_group"])] = by_shard.get(
            (f["path"], f["row_group"]), 0
        ) + f["row_len"]
    for s in shards:
        assert by_shard[(s["path"], s["row_group"])] == s["rows"]


def test_local_extraction_equals_shuffle_extraction(corpus):
    local = extract_documents_local(read_documents(corpus)).to_pandas()
    shuffled = extract_documents(read_documents(corpus), num_buckets=8).to_pandas()

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["spans"] = df["spans"].map(
            lambda spans: tuple(tuple(sorted(s.items())) for s in spans)
        )
        return df.sort_values("doc_id").reset_index(drop=True)

    pd.testing.assert_frame_equal(canon(local), canon(shuffled))


def test_crash_artifacts_do_not_corrupt_resume(corpus, tmp_path):
    """A killed writer leaves .tmp files and no manifest record; resume
    must rewrite the fragment atomically and double-commits (task retry)
    must be idempotent."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_ray.state.manifest import ResumableSink, load_manifest

    out = str(tmp_path / "crashy")
    extract_shard_aligned(corpus, out, max_docs_per_fragment=20)
    before = _totals(out)
    total = len(load_manifest(out))

    # simulate a crash mid-write of fragment 0: stray tmp + lost manifest
    os.remove(f"{out}/_manifest/part-00000.json")
    stray = f"{out}/part=00000/.tmp-deadbeef.parquet"
    pq.write_table(pa.table({"junk": pa.array([1])}), stray)

    df, skipped = extract_shard_aligned(corpus, out, max_docs_per_fragment=20)
    assert skipped == total - 1 and len(df) == 1
    assert _totals(out) == before
    assert os.path.exists(stray)  # never picked up; data.parquet is the commit

    # task-retry idempotence: re-committing the same fragment content is a no-op
    frag = pq.read_table(f"{out}/part=00000/data.parquet")
    ResumableSink(out).write(frag, 0)
    assert _totals(out) == before


def test_resume_rejects_changed_fragment_layout(corpus, tmp_path):
    """Fragment ids are positional: resuming a manifest written under a
    different layout (changed max_docs_per_fragment) must fail loudly
    instead of silently skipping unprocessed row slices."""
    import pytest

    out = str(tmp_path / "layout")
    extract_shard_aligned(corpus, out, max_docs_per_fragment=20)
    with pytest.raises(ValueError, match="different fragment layout"):
        extract_shard_aligned(corpus, out, max_docs_per_fragment=7)
    # unchanged layout still resumes as a no-op
    df, skipped = extract_shard_aligned(corpus, out, max_docs_per_fragment=20)
    assert len(df) == 0 and skipped == len(load_manifest(out))


def _split_corpus(corpus: str, dst: str, first_n: int) -> list[str]:
    """Copy the corpus dir, returning its sorted shard files; the caller
    stages the first ``first_n`` files then appends the rest."""
    files = sorted(f for f in os.listdir(corpus) if f.endswith(".parquet"))
    os.makedirs(dst, exist_ok=True)
    return files


def test_content_mode_incremental_append(corpus, shuffle_totals, tmp_path):
    """CONTINUOUS-INGEST resume: extract a partial corpus in content-id
    mode, append the remaining shard files, re-run — only the new files'
    fragments are processed, nothing is recomputed, and the final
    manifest equals a one-shot full run (layout-invariant checksums)."""
    files = sorted(f for f in os.listdir(corpus) if f.endswith(".parquet"))
    if len(files) < 2:
        pytest.skip("corpus has a single shard file; append needs >= 2")
    staged = str(tmp_path / "staged_corpus")
    os.makedirs(staged)
    half = max(1, len(files) // 2)
    for f in files[:half]:
        shutil.copy(os.path.join(corpus, f), os.path.join(staged, f))

    out = str(tmp_path / "incr_sink")
    df1, skipped1 = extract_shard_aligned(staged, out, fragment_ids="content")
    assert skipped1 == 0 and len(df1) > 0
    n_first = len(load_manifest(out))

    # append the rest and re-run: committed fragments must be skipped
    for f in files[half:]:
        shutil.copy(os.path.join(corpus, f), os.path.join(staged, f))
    df2, skipped2 = extract_shard_aligned(staged, out, fragment_ids="content")
    assert skipped2 == n_first, (skipped2, n_first)
    assert len(df2) > 0  # only the appended files' fragments ran

    assert _totals(out) == shuffle_totals

    # third run: full no-op
    df3, skipped3 = extract_shard_aligned(staged, out, fragment_ids="content")
    assert len(df3) == 0 and skipped3 == len(load_manifest(out))


def test_content_mode_rejects_inplace_rewrite(corpus, tmp_path):
    """A previously-extracted file rewritten in place (different shape)
    must refuse content-mode resume instead of serving stale fragments."""
    import pyarrow.parquet as pq

    files = sorted(f for f in os.listdir(corpus) if f.endswith(".parquet"))
    staged = str(tmp_path / "staged_corpus")
    os.makedirs(staged)
    for f in files:
        shutil.copy(os.path.join(corpus, f), os.path.join(staged, f))
    out = str(tmp_path / "sink")
    extract_shard_aligned(staged, out, fragment_ids="content")

    # rewrite the first file with half its rows
    victim = os.path.join(staged, files[0])
    t = pq.read_table(victim)
    pq.write_table(t.slice(0, max(1, t.num_rows // 2)), victim)
    with pytest.raises(ValueError, match="changed in place"):
        extract_shard_aligned(staged, out, fragment_ids="content")


def test_mode_mismatch_refuses_resume(corpus, tmp_path):
    out = str(tmp_path / "sink")
    extract_shard_aligned(corpus, out)  # positional
    with pytest.raises(ValueError, match="mode"):
        extract_shard_aligned(corpus, out, fragment_ids="content")
