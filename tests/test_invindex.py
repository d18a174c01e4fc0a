"""Materialized inverted-index build/lookup: partition-law pruning,
resume behavior, and postings exactness vs a pandas oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs_ds(rows):
    import ray

    return ray.data.from_pandas(pd.DataFrame(rows)).map_batches(
        lambda t: t, batch_format="pyarrow", batch_size=3
    )


def test_build_and_lookup_exact_vs_pandas(ray_session, tmp_path):
    from ocr_ray.functions.invindex import build_inverted_index, index_lookup

    rows = {
        "doc_id": [1, 2, 3, 4],
        "text": [
            "spark join spark window",
            "join join",
            "window",
            "nothing here",
        ],
    }
    out = str(tmp_path / "idx")
    manifest = build_inverted_index(_docs_ds(rows), out, num_parts=8)
    assert manifest["row_count"].sum() > 0
    got = (
        index_lookup(out, ["spark", "join"], num_parts=8)
        .to_pandas()
        .sort_values(["token", "doc_id"], ignore_index=True)
    )
    expect = pd.DataFrame(
        {
            "token": ["join", "join", "spark"],
            "doc_id": [1, 2, 1],
            "tf": [1, 2, 2],
        }
    )
    pd.testing.assert_frame_equal(got, expect.astype(got.dtypes.to_dict()))


def test_lookup_opens_only_named_partitions(ray_session, tmp_path):
    from ocr_ray.functions.invindex import (
        build_inverted_index,
        index_lookup,
        token_partition,
    )
    from ocr_ray.state.manifest import load_manifest

    rows = {"doc_id": list(range(20)), "text": [f"tok{i} common" for i in range(20)]}
    out = str(tmp_path / "idx")
    build_inverted_index(_docs_ds(rows), out, num_parts=16)
    assert len(load_manifest(out)) == 16
    # the partition law names the fragment; a term's postings must live there
    part = int(token_partition(["common"], 16)[0])
    got = index_lookup(out, ["common"], num_parts=16).to_pandas()
    assert len(got) == 20
    import pyarrow.parquet as pq

    frag = pq.read_table(load_manifest(out)[part]["file"])
    assert "common" in set(frag["token"].to_pylist())


def test_missing_term_and_empty_result(ray_session, tmp_path):
    from ocr_ray.functions.invindex import build_inverted_index, index_lookup

    out = str(tmp_path / "idx")
    build_inverted_index(
        _docs_ds({"doc_id": [1], "text": ["alpha beta"]}), out, num_parts=4
    )
    got = index_lookup(out, ["zzz_absent"], num_parts=4).to_pandas()
    assert len(got) == 0
    assert list(got.columns) == ["token", "doc_id", "tf"]


def test_incremental_minhash_equals_full_cross_pairs(ray_session, sf_smoke, tmp_path):
    """The incremental probe against the persisted store must produce
    exactly the full-pipeline pair set restricted to (old, new) cross
    pairs — the bit-equality the SQL oracle states."""
    import pyarrow.compute as pc
    import ray

    import __ray_entry__ as e
    from ocr_ray.functions.dedup import MUTANT_OFFSET, with_mutants
    from ocr_ray.functions.dedup_store import (
        build_minhash_store,
        incremental_minhash_pairs,
        store_complete,
    )
    from ocr_ray.sources import read_table

    docs = read_table(sf_smoke, "documents", columns=["doc_id", "text"])
    store = str(tmp_path / "store")
    build_minhash_store(docs, store, num_parts=8)
    assert store_complete(store, 8)

    off = pa.scalar(MUTANT_OFFSET, type=pa.int64())
    new_docs = docs.map_batches(with_mutants, batch_format="pyarrow").map_batches(
        lambda t: t.filter(pc.greater_equal(t["doc_id"], off)),
        batch_format="pyarrow",
    )
    inc = (
        incremental_minhash_pairs(new_docs, store, tau=0.5)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"], ignore_index=True)
    )
    full = e.queries()["minhash_dedup_pairs"](sf_smoke).to_pandas()
    cross = full[
        (full["doc_a"] < MUTANT_OFFSET) & (full["doc_b"] >= MUTANT_OFFSET)
    ].sort_values(["doc_a", "doc_b"], ignore_index=True)
    pd.testing.assert_frame_equal(inc[["doc_a", "doc_b"]], cross[["doc_a", "doc_b"]])
    assert len(inc) > 0  # seeded mutants guarantee a nonempty pair set
