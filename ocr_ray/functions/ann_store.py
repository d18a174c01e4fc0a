"""Persisted IVF cell store — the materialized inverted-file ANN index.

`ivf_topk` (functions/ann.py) re-scans and re-assigns the whole
embedding table on every query batch; at 100 TB the index must instead
be MATERIALIZED once: vectors are partitioned by their assigned
centroid cell through the engine's atomic fragment+manifest sink (one
fragment per cell, the assignment stored as a ``cid`` column), and the
centroid matrix commits beside the manifest. A query batch then plans
its scan from the manifest alone — the union of the queries' ``nprobe``
nearest cells names the only fragments read, so probe cost scales with
``nprobe / n_cells`` of the corpus, not with the corpus.

Driven at ``nprobe = n_cells`` the mask is a no-op and the result is
EXACTLY brute-force cosine top-k — which turns the shared brute SQL
oracle into a bit-exact driver-visible check of the whole store path
(build partitioning, stored assignments, probe planning, masked
scoring, partial merge); tests exercise the ``nprobe < n_cells``
pruning bound and its recall on top.
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa

from ocr_ray.functions.ann import _as_matrix, _normalize, _partial_table, merge_topk


def build_ivf_store(
    emb_ds,
    store_dir: str,
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    col: str = "embedding",
):
    """Partition the embedding table into per-cell fragments (+ commit
    the centroid matrix). Returns the manifest rows of this run."""
    import ray

    from ocr_ray.state.manifest import sink_partitioned

    cent = _normalize(np.asarray(centroids, dtype=np.float64))
    n_cells = len(cent)
    # centroids commit FIRST: the build-complete condition is
    # (centroids.json present AND manifest has n_cells rows) — see
    # ivf_store_complete — so a crash anywhere leaves an incomplete store
    # that probes refuse and callers rebuild (rebuild overwrites both)
    os.makedirs(store_dir, exist_ok=True)
    tmp = os.path.join(store_dir, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump({"centroids": cent.tolist()}, f)
    os.replace(tmp, os.path.join(store_dir, "centroids.json"))
    cent_ref = ray.put(cent)

    def tag(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        x = _normalize(_as_matrix(t[col]))
        cid = np.argmax(x @ c.T, axis=1).astype(np.int32)
        return pa.table(
            {
                id_col: t[id_col],
                col: t[col],
                "cid": pa.array(cid),
                "_part": pa.array(cid),
            }
        )

    # empty backfill fragments must carry the SAME schema as real ones
    # (the source's embedding type, not a hardcoded one — a cell that
    # captures zero vectors must not change the store's unified schema)
    src_schema = emb_ds.schema()
    src_fields = dict(zip(src_schema.names, src_schema.types))
    empty = pa.schema(
        {id_col: src_fields[id_col], col: src_fields[col], "cid": pa.int32()}
    ).empty_table()
    return sink_partitioned(
        emb_ds.map_batches(tag, batch_format="pyarrow"),
        store_dir,
        n_cells,
        empty,
        {"store": "ivf-cells"},
    )


def update_ivf_store(
    new_emb_ds,
    store_dir: str,
    *,
    id_col: str = "vec_id",
    col: str = "embedding",
    check_duplicates: bool = True,
) -> str:
    """Append a shard of vectors to a committed IVF store WITHOUT
    touching the base cell fragments: the new vectors are assigned to
    the EXISTING (frozen) centroids and written as their own per-cell
    delta-generation store, registered by its atomic per-generation
    commit marker (the same commit-point protocol as the
    incremental inverted-index / BM25 / minhash stores — a crashed
    update is invisible, never half-visible). Probes then read the
    probed cells' fragments from every layer; at ``nprobe = n_cells``
    the result is exactly brute force over the grown corpus. Centroid
    RETRAINING is deliberately a separate (compaction-class) event —
    appending must not silently shift existing assignments."""
    import ray  # noqa: F401  (parity with build path; ray session owned by caller)

    from ocr_ray.state.manifest import (
        load_generations,
        register_generation,
        require_complete_manifest,
    )

    cent = load_ivf_centroids(store_dir)
    require_complete_manifest(store_dir, len(cent), what="update_ivf_store(base)")
    name = f"gen-{len(load_generations(store_dir)):04d}-{uuid.uuid4().hex[:8]}"
    gdir = os.path.join(store_dir, name)
    build_ivf_store(new_emb_ds, gdir, cent, id_col=id_col, col=col)
    if check_duplicates:
        _refuse_duplicate_ids(store_dir, gdir, len(cent), id_col=id_col)
    register_generation(store_dir, name)
    return name


def _refuse_duplicate_ids(store_dir: str, delta_dir: str, n_cells: int, *, id_col: str) -> None:
    """Update-time disjoint-shard guard: raise if any of the delta's ids
    already exists in the base or a registered generation. Column-pruned
    and cell-pruned (only the id column of the cells the delta touched,
    across prior layers) and distributed (the shard id set broadcasts
    once; the driver folds one count). Runs BEFORE registration, so a
    refused delta leaves the store unchanged (an unregistered directory
    is invisible)."""
    import ray

    from ocr_ray.state.manifest import (
        load_generations,
        load_manifest,
        read_fragments,
        require_complete_manifest,
    )

    dm = load_manifest(delta_dir)
    touched = [p for p, r in dm.items() if r.get("row_count", 0) > 0]
    if not touched:
        return
    shard_ids = np.sort(
        read_fragments([dm[p]["file"] for p in touched])
        .select_columns([id_col])
        .to_pandas()[id_col]
        .to_numpy(dtype=np.int64)
    )
    ids_ref = ray.put(shard_ids)
    layer_dirs = [store_dir] + [
        os.path.join(store_dir, g) for g in load_generations(store_dir)
    ]
    files = []
    for d in layer_dirs:
        m = require_complete_manifest(d, n_cells, what="update_ivf_store(guard)")
        files.extend(m[p]["file"] for p in touched)

    def count_dups(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ex = ray.get(ids_ref)
        hit = ids[np.isin(ids, ex)]
        return pa.table({"dup": pa.array(hit[:8], type=pa.int64())})

    hits = [
        t
        for t in ray.get(
            read_fragments(files)
            .map_batches(count_dups, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if hits:
        sample = sorted(pa.concat_tables(hits)["dup"].to_pylist())[:8]
        raise ValueError(
            f"update_ivf_store: shard re-ingests existing ids "
            f"(e.g. {sample}) — the disjoint-shard contract is violated; "
            "the delta was NOT registered"
        )


def ivf_store_complete(store_dir: str, n_cells: int) -> bool:
    """Build-complete = centroid matrix committed AND every cell fragment
    in the manifest (both are rewritten by a rebuild, so either missing
    means 'rebuild')."""
    from ocr_ray.state.manifest import load_manifest

    return (
        os.path.exists(os.path.join(store_dir, "centroids.json"))
        and len(load_manifest(store_dir)) == n_cells
    )


def load_ivf_centroids(store_dir: str) -> np.ndarray:
    with open(os.path.join(store_dir, "centroids.json")) as f:
        return np.asarray(json.load(f)["centroids"], dtype=np.float64)


def ivf_store_topk(
    store_dir: str,
    queries_ref,
    *,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    col: str = "embedding",
):
    """Top-k over the materialized store: read ONLY the fragments of the
    queries' probed cells (asserted — a planning regression fails loudly
    instead of silently scanning every cell)."""
    import ray

    from ocr_ray.state.manifest import read_fragments, require_complete_manifest

    cent = load_ivf_centroids(store_dir)
    qids, qmat = ray.get(queries_ref)
    qids = np.asarray(qids, dtype=np.int64)
    qn = _normalize(np.asarray(qmat, dtype=np.float64))
    npb = min(nprobe, len(cent))
    qc = qn @ cent.T
    probe = np.argpartition(-qc, npb - 1, axis=1)[:, :npb]  # (Q, nprobe)

    # loud on a crashed build: a partial store must not silently answer
    # from the fragments it happens to have. Layers = base + registered
    # delta generations (appended shards assigned to the same frozen
    # centroids), each complete.
    from ocr_ray.state.manifest import load_generations

    layer_dirs = [store_dir] + [
        os.path.join(store_dir, g) for g in load_generations(store_dir)
    ]
    manifests = [
        require_complete_manifest(d, len(cent), what="ivf_store_topk")
        for d in layer_dirs
    ]
    needed = sorted(set(int(p) for p in probe.reshape(-1)))
    files = [m[p]["file"] for m in manifests for p in needed]
    if not files:
        # zero queries probe zero cells: an empty typed result in the
        # live path's merged schema, not a read-planner error
        return ray.data.from_arrow(
            pa.schema(
                {
                    "query_id": pa.int64(),
                    "vec_id": pa.int64(),
                    "score": pa.float64(),
                    "rank": pa.int64(),
                }
            ).empty_table()
        )
    probe_ref = ray.put((qids, qn, probe))

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _partial_table()
        ids_, q, pr = ray.get(probe_ref)
        vids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cid = batch["cid"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_as_matrix(batch[col]))
        # a vector is a candidate only for queries that probed its cell
        mask = (pr[:, :, None] == cid[None, None, :]).any(axis=1)  # (Q, n)
        scores = q @ m.T
        scores[~mask] = -np.inf
        scores[ids_[:, None] == vids[None, :]] = -np.inf
        kk = min(k, scores.shape[1])
        idx = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
        rows_q = np.repeat(ids_, kk)
        rows_v = vids[idx.reshape(-1)]
        rows_s = np.take_along_axis(scores, idx, axis=1).reshape(-1)
        keep = np.isfinite(rows_s)
        return _partial_table(rows_q[keep], rows_v[keep], rows_s[keep])

    partial = read_fragments(files).map_batches(score, batch_format="pyarrow")
    return partial.groupby("query_id").map_groups(
        lambda g: merge_topk(g, k=k), batch_format="pandas"
    )
