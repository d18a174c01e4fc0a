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
