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


def test_ivf_store_prunes_and_recalls(ray_session, sf_smoke, tmp_path):
    """nprobe < n_cells reads only the probed cells' fragments, and its
    top-k still recalls most of brute force on this corpus family."""
    import ray

    from ocr_ray.functions.ann import brute_topk, make_centroids
    from ocr_ray.functions.ann_store import (
        build_ivf_store,
        ivf_store_topk,
        load_ivf_centroids,
    )
    from ocr_ray.functions.ann import _normalize
    from ocr_ray.sources import read_table

    emb = read_table(sf_smoke, "embeddings", columns=["vec_id", "embedding"])
    sample = emb.limit(128).to_pandas()
    cent = make_centroids(
        np.stack(sample["embedding"].to_numpy()).astype(np.float64), n_centroids=8
    )
    store = str(tmp_path / "ivf")
    build_ivf_store(emb, store, cent)
    assert load_ivf_centroids(store).shape == (8, cent.shape[1])

    q = emb.limit(4).to_pandas()
    qids = q["vec_id"].to_numpy(dtype=np.int64)
    qmat = np.stack(q["embedding"].to_numpy()).astype(np.float64)
    qref = ray.put((qids, qmat))

    # probe-all equals brute force exactly
    exact = (
        ivf_store_topk(store, qref, k=5, nprobe=8)
        .to_pandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    brute = (
        brute_topk(emb, qref, k=5)
        .to_pandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        exact[["query_id", "vec_id", "rank"]], brute[["query_id", "vec_id", "rank"]]
    )

    # nprobe=2: results only come from probed cells, recall stays useful
    approx = ivf_store_topk(store, qref, k=5, nprobe=2).to_pandas()
    centn = _normalize(load_ivf_centroids(store))
    probe = np.argsort(-(_normalize(qmat) @ centn.T), axis=1)[:, :2]
    allowed = {int(qid): set(map(int, probe[i])) for i, qid in enumerate(qids)}
    emb_df = emb.to_pandas()
    vecs = {int(r["vec_id"]): np.asarray(r["embedding"]) for _, r in emb_df.iterrows()}
    for _, r in approx.iterrows():
        v = _normalize(vecs[int(r["vec_id"])][None, :])[0]
        cell = int(np.argmax(centn @ v))
        assert cell in allowed[int(r["query_id"])]
    hit = len(
        set(map(tuple, approx[["query_id", "vec_id"]].to_numpy()))
        & set(map(tuple, brute[["query_id", "vec_id"]].to_numpy()))
    )
    assert hit >= len(brute) // 2, (hit, len(brute))


def test_incomplete_store_raises_instead_of_partial_answers(ray_session, tmp_path):
    """A crashed build (missing manifest partitions) must make lookups
    FAIL LOUDLY, not silently answer from the fragments that exist."""
    import os

    from ocr_ray.functions.invindex import build_inverted_index, index_lookup

    out = str(tmp_path / "idx")
    build_inverted_index(
        _docs_ds({"doc_id": [1, 2], "text": ["alpha beta", "beta gamma"]}),
        out,
        num_parts=4,
    )
    # simulate the crash: remove one committed sidecar
    victim = os.path.join(out, "_manifest", "part-00002.json")
    os.remove(victim)
    with pytest.raises(ValueError, match="incomplete"):
        index_lookup(out, ["alpha"], num_parts=4)


def test_incremental_update_equals_rebuild_and_compacts(ray_session, tmp_path):
    """Delta-generation update: lookups over base+delta must bit-equal a
    from-scratch rebuild over the unioned corpus, compaction must fold
    the layers without changing any answer, and an UNREGISTERED delta
    directory (crashed update) must stay invisible."""
    import os

    from ocr_ray.functions.invindex import (
        build_inverted_index,
        compact_inverted_index,
        index_lookup,
        update_inverted_index,
    )
    from ocr_ray.state.manifest import load_generations as _load_generations

    base_rows = {
        "doc_id": [1, 2, 3],
        "text": ["spark join spark", "join window", "quiet text"],
    }
    shard_rows = {
        "doc_id": [11, 12],
        "text": ["spark window", "join join join"],
    }
    out = str(tmp_path / "idx")
    build_inverted_index(_docs_ds(base_rows), out, num_parts=8)
    update_inverted_index(_docs_ds(shard_rows), out, num_parts=8)
    assert len(_load_generations(out)) == 1

    rebuilt = str(tmp_path / "rebuilt")
    union_rows = {
        "doc_id": base_rows["doc_id"] + shard_rows["doc_id"],
        "text": base_rows["text"] + shard_rows["text"],
    }
    build_inverted_index(_docs_ds(union_rows), rebuilt, num_parts=8)

    terms = ["spark", "join", "window"]
    key = ["token", "doc_id"]
    got = index_lookup(out, terms, num_parts=8).to_pandas().sort_values(key, ignore_index=True)
    exp = index_lookup(rebuilt, terms, num_parts=8).to_pandas().sort_values(key, ignore_index=True)
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) > 0

    # compaction into a fresh single-layer store preserves every answer
    compacted = str(tmp_path / "compacted")
    compact_inverted_index(out, compacted, num_parts=8)
    assert _load_generations(compacted) == []
    got_c = (
        index_lookup(compacted, terms, num_parts=8)
        .to_pandas()
        .sort_values(key, ignore_index=True)
    )
    pd.testing.assert_frame_equal(got_c, exp)

    # a crashed (unregistered) delta build is invisible to lookups:
    # deleting the per-generation commit marker de-registers it
    from ocr_ray.state.manifest import GEN_MARKER

    (gen_name,) = _load_generations(out)
    os.remove(os.path.join(out, gen_name, GEN_MARKER))
    assert _load_generations(out) == []
    base_only = (
        index_lookup(out, terms, num_parts=8)
        .to_pandas()
        .sort_values(key, ignore_index=True)
    )
    base_direct = str(tmp_path / "base_direct")
    build_inverted_index(_docs_ds(base_rows), base_direct, num_parts=8)
    exp_base = (
        index_lookup(base_direct, terms, num_parts=8)
        .to_pandas()
        .sort_values(key, ignore_index=True)
    )
    pd.testing.assert_frame_equal(base_only, exp_base)


def test_ivf_update_equals_rebuild_with_frozen_centroids(ray_session, sf_smoke, tmp_path):
    """A store grown by update_ivf_store must answer every probe exactly
    like a store rebuilt from the unioned corpus with the SAME (frozen)
    centroid matrix — at nprobe = n_cells (brute equivalence) AND at
    nprobe < n_cells (layered cell planning)."""
    import ray

    from ocr_ray.functions.ann import make_centroids
    from ocr_ray.functions.ann_store import (
        build_ivf_store,
        ivf_store_topk,
        load_ivf_centroids,
        update_ivf_store,
    )
    from ocr_ray.sources import read_table

    emb = read_table(sf_smoke, "embeddings", columns=["vec_id", "embedding"])
    sample = emb.limit(128).to_pandas()
    cent = make_centroids(
        np.stack(sample["embedding"].to_numpy()).astype(np.float64), n_centroids=8
    )
    store = str(tmp_path / "ivf")
    build_ivf_store(emb, store, cent)

    import pyarrow.compute as pc

    shard = emb.map_batches(
        lambda t: t.filter(
            pa.array(t["vec_id"].to_numpy(zero_copy_only=False) % 7 == 0)
        ),
        batch_format="pyarrow",
    ).map_batches(
        lambda t: pa.table(
            {
                "vec_id": pc.add(t["vec_id"], pa.scalar(500_000, pa.int64())),
                "embedding": t["embedding"],
            }
        ),
        batch_format="pyarrow",
    )
    update_ivf_store(shard, store)

    rebuilt = str(tmp_path / "rebuilt")
    build_ivf_store(emb.union(shard), rebuilt, load_ivf_centroids(store))

    q = emb.limit(4).to_pandas()
    qref = ray.put(
        (
            q["vec_id"].to_numpy(dtype=np.int64),
            np.stack(q["embedding"].to_numpy()).astype(np.float64),
        )
    )
    for nprobe in (8, 2):
        got = (
            ivf_store_topk(store, qref, k=5, nprobe=nprobe)
            .to_pandas()
            .sort_values(["query_id", "rank"], ignore_index=True)
        )
        exp = (
            ivf_store_topk(rebuilt, qref, k=5, nprobe=nprobe)
            .to_pandas()
            .sort_values(["query_id", "rank"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(
            got[["query_id", "vec_id", "rank"]], exp[["query_id", "vec_id", "rank"]]
        )


def test_bm25_update_equals_rebuild_over_union(ray_session, tmp_path):
    """A BM25 store grown by update_bm25_index must score bit-equal to a
    from-scratch build over the unioned corpus (N/sum_dl/df/dl/tf all
    layered correctly), and a shard that re-ingests an existing doc_id
    must fail loudly."""
    from ocr_ray.functions.invindex import (
        bm25_from_index,
        build_bm25_index,
        update_bm25_index,
    )

    base_rows = {
        "doc_id": [1, 2, 3, 4],
        "text": [
            "spark join spark window",
            "join join filler words here",
            "window pane",
            "unrelated prose entirely",
        ],
    }
    shard_rows = {
        "doc_id": [11, 12],
        "text": ["spark window spark", "join me"],
    }
    out = str(tmp_path / "bm25")
    build_bm25_index(_docs_ds(base_rows), out, num_parts=8)
    update_bm25_index(_docs_ds(shard_rows), out, num_parts=8)

    rebuilt = str(tmp_path / "rebuilt")
    build_bm25_index(
        _docs_ds(
            {
                "doc_id": base_rows["doc_id"] + shard_rows["doc_id"],
                "text": base_rows["text"] + shard_rows["text"],
            }
        ),
        rebuilt,
        num_parts=8,
    )

    terms = ["spark", "join", "window"]
    got = bm25_from_index(out, terms, k=6, num_parts=8).to_pandas()
    exp = bm25_from_index(rebuilt, terms, k=6, num_parts=8).to_pandas()
    pd.testing.assert_frame_equal(got, exp, check_exact=True)

    # duplicate doc_id across layers -> loud failure, not silent mis-scoring
    update_bm25_index(_docs_ds({"doc_id": [1], "text": ["spark again"]}), out, num_parts=8)
    with pytest.raises(ValueError, match="duplicate doc ids"):
        bm25_from_index(out, terms, k=6, num_parts=8)


def test_minhash_store_append_layers_and_refuses_duplicates(ray_session, sf_smoke, tmp_path):
    """update_minhash_store: a probe against base+appended-shard must
    bit-equal a probe against a store REBUILT over corpus ∪ shard, and
    re-ingesting existing doc ids is refused before registration."""
    import pyarrow.compute as pc
    import ray

    from ocr_ray.functions.dedup import MUTANT_OFFSET, with_mutants
    from ocr_ray.functions.dedup_store import (
        build_minhash_store,
        incremental_minhash_pairs,
        update_minhash_store,
    )
    from ocr_ray.sources import read_table
    from ocr_ray.state.manifest import load_generations

    docs = read_table(sf_smoke, "documents", columns=["doc_id", "text"])
    off = pa.scalar(MUTANT_OFFSET, type=pa.int64())
    shard1 = docs.map_batches(with_mutants, batch_format="pyarrow").map_batches(
        lambda t: t.filter(pc.greater_equal(t["doc_id"], off)),
        batch_format="pyarrow",
    )
    # probe shard: the mutants re-tagged once more (disjoint from both)
    shard2 = shard1.map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.add(t["doc_id"], pa.scalar(10_000_000, pa.int64())),
                "text": t["text"],
            }
        ),
        batch_format="pyarrow",
    )

    grown = str(tmp_path / "grown")
    build_minhash_store(docs, grown, num_parts=8)
    update_minhash_store(shard1, grown, num_parts=8)
    assert len(load_generations(grown)) == 1

    rebuilt = str(tmp_path / "rebuilt")
    build_minhash_store(docs.union(shard1), rebuilt, num_parts=8)

    key = ["doc_a", "doc_b"]
    got = (
        incremental_minhash_pairs(shard2, grown, tau=0.5)
        .to_pandas()
        .sort_values(key, ignore_index=True)
    )
    exp = (
        incremental_minhash_pairs(shard2, rebuilt, tau=0.5)
        .to_pandas()
        .sort_values(key, ignore_index=True)
    )
    pd.testing.assert_frame_equal(got[key], exp[key])
    assert len(got) > 0  # every shard2 doc is a near-dup of its shard1 source

    # re-ingesting shard1 again: refused loudly, store unchanged
    with pytest.raises(ValueError, match="re-ingests"):
        update_minhash_store(shard1, grown, num_parts=8)
    assert len(load_generations(grown)) == 1


def test_ivf_update_refuses_duplicate_ids(ray_session, sf_smoke, tmp_path):
    """update_ivf_store's disjoint-shard guard: a shard re-using existing
    vec_ids is refused BEFORE registration."""
    from ocr_ray.functions.ann import make_centroids
    from ocr_ray.functions.ann_store import build_ivf_store, update_ivf_store
    from ocr_ray.sources import read_table
    from ocr_ray.state.manifest import load_generations

    emb = read_table(sf_smoke, "embeddings", columns=["vec_id", "embedding"])
    sample = emb.limit(64).to_pandas()
    cent = make_centroids(
        np.stack(sample["embedding"].to_numpy()).astype(np.float64), n_centroids=4
    )
    store = str(tmp_path / "ivf")
    build_ivf_store(emb, store, cent)
    with pytest.raises(ValueError, match="re-ingests"):
        update_ivf_store(emb.limit(16), store)
    assert load_generations(store) == []


def test_concurrent_registrations_both_stay_visible(tmp_path):
    """Registration is one atomic marker create per generation — two
    updaters committing 'at once' can never erase each other (the old
    root-file read-modify-write lost the first registration when both
    loaded the same snapshot)."""
    import os

    from ocr_ray.state.manifest import load_generations, register_generation

    store = str(tmp_path / "store")
    for name in ("delta-0000-aaaa", "delta-0000-bbbb"):
        os.makedirs(os.path.join(store, name))
    # interleave as a concurrent pair would: both saw zero generations,
    # then both register
    register_generation(store, "delta-0000-aaaa")
    register_generation(store, "delta-0000-bbbb")
    assert load_generations(store) == ["delta-0000-aaaa", "delta-0000-bbbb"]


def test_compact_refuses_in_place_and_ghost_deltas(ray_session, tmp_path):
    """Compaction must refuse in_dir == out_dir and a target that already
    holds registered generations (ghost layers would double-count)."""
    import os

    from ocr_ray.functions.invindex import (
        build_inverted_index,
        compact_inverted_index,
    )
    from ocr_ray.state.manifest import register_generation

    src = str(tmp_path / "src")
    build_inverted_index(
        _docs_ds({"doc_id": [1], "text": ["alpha beta"]}), src, num_parts=4
    )
    with pytest.raises(ValueError, match="in-place"):
        compact_inverted_index(src, src, num_parts=4)

    tgt = str(tmp_path / "tgt")
    os.makedirs(os.path.join(tgt, "delta-0000-ghost"))
    register_generation(tgt, "delta-0000-ghost")
    with pytest.raises(ValueError, match="generations"):
        compact_inverted_index(src, tgt, num_parts=4)


def test_update_refuses_incomplete_base(ray_session, tmp_path):
    """update_inverted_index on a crashed/missing base must fail loudly,
    not write a delta next to garbage."""
    from ocr_ray.functions.invindex import update_inverted_index

    with pytest.raises(ValueError, match="incomplete"):
        update_inverted_index(
            _docs_ds({"doc_id": [1], "text": ["a"]}),
            str(tmp_path / "nonexistent"),
            num_parts=4,
        )

    from ocr_ray.functions.invindex import update_bm25_index

    with pytest.raises(ValueError, match="incomplete"):
        update_bm25_index(
            _docs_ds({"doc_id": [1], "text": ["a"]}),
            str(tmp_path / "nonexistent2"),
            num_parts=4,
        )


def test_index_lookup_empty_terms_returns_empty_table(ray_session, tmp_path):
    """An empty term list short-circuits to an empty postings table
    instead of propagating read_fragments' empty-file-list ValueError
    (ADVICE r4)."""
    from ocr_ray.functions.invindex import build_inverted_index, index_lookup

    out = str(tmp_path / "idx")
    build_inverted_index(
        _docs_ds({"doc_id": [1], "text": ["alpha beta"]}), out, num_parts=4
    )
    got = index_lookup(out, [], num_parts=4).to_pandas()
    assert len(got) == 0
    assert list(got.columns) == ["token", "doc_id", "tf"]


def test_bm25_from_index_rejects_duplicate_terms(ray_session, tmp_path):
    """Duplicate query terms would double-count idf (diverging from the
    fixed-distinct-term full scan) — refused loudly (ADVICE r4)."""
    from ocr_ray.functions.invindex import bm25_from_index, build_bm25_index

    out = str(tmp_path / "bm25")
    build_bm25_index(
        _docs_ds({"doc_id": [1, 2], "text": ["alpha beta", "beta gamma"]}),
        out,
        num_parts=4,
    )
    with pytest.raises(ValueError, match="distinct"):
        bm25_from_index(out, ["alpha", "alpha"], k=5, num_parts=4)


def test_bm25_from_index_pads_to_k_like_full_scan(ray_session, tmp_path):
    """Fewer than k matching docs: the full scan pads the top-k with
    zero-score docs ordered by doc_id — the index path must too
    (ADVICE r4; previously it returned only the matches)."""
    from ocr_ray.functions.invindex import bm25_from_index, build_bm25_index

    rows = {
        "doc_id": [10, 11, 12, 13, 14, 15],
        "text": [
            "spark rules",
            "plain prose",
            "more prose",
            "spark again",
            "filler text",
            "yet more",
        ],
    }
    out = str(tmp_path / "bm25")
    build_bm25_index(_docs_ds(rows), out, num_parts=4)
    got = bm25_from_index(out, ["spark"], k=5, num_parts=4).to_pandas()
    assert len(got) == 5
    # candidates (positive score) first, by score desc then doc_id asc
    assert set(got.loc[got["score"] > 0, "doc_id"]) == {10, 13}
    # then the zero-score pad: the smallest non-candidate doc ids, ordered
    assert got.loc[got["score"] == 0.0, "doc_id"].tolist() == [11, 12, 14]

    # no matching docs at all: k smallest doc ids, all zero
    none = bm25_from_index(out, ["zzz_absent"], k=3, num_parts=4).to_pandas()
    assert none["doc_id"].tolist() == [10, 11, 12]
    assert (none["score"] == 0.0).all()


def test_bm25_from_index_bit_equals_full_scan(ray_session, sf_smoke, tmp_path):
    """The index-served scorer must reproduce the full-scan BM25 scores
    bit-for-bit (same operands, same float op order)."""
    import __ray_entry__ as e
    from ocr_ray.functions.invindex import bm25_from_index, build_bm25_index
    from ocr_ray.sources import read_table

    docs = read_table(sf_smoke, "documents", columns=["doc_id", "text"])
    out = str(tmp_path / "bm25")
    meta = build_bm25_index(docs, out, num_parts=8)
    assert meta["n_docs"] == docs.count()

    got = (
        bm25_from_index(out, ["spark", "join", "window"], k=20, num_parts=8)
        .to_pandas()
        .reset_index(drop=True)
    )
    full = e.queries()["bm25_search"](sf_smoke).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["doc_id", "score"]],
        full[["doc_id", "score"]].astype(got.dtypes.to_dict()),
        check_exact=True,
    )
