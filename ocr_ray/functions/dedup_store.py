"""Persisted MinHash signature store + incremental near-dup probe.

The continuous-ingest dedup shape: a 100 TB committed corpus should not
be re-tokenized every time a new shard arrives. ``build_minhash_store``
persists the corpus's dedup state ONCE through the engine's atomic
fragment+manifest sink (``state/manifest.ResumableSink``):

- ``bands/``  — the LSH band table ``(pair_key, doc_id)``, partitioned
  by ``pair_key % P`` (one row per band per doc, ~32 x 16 bytes/doc);
- ``sigs/``   — per-doc unique-sorted shingle-hash signatures
  ``(doc_id, shingles: large_list<uint64>)``, partitioned by doc bucket
  (the exact-Jaccard verify input, ~8 bytes/token — an order of
  magnitude smaller than the text it summarizes).

``incremental_minhash_pairs`` then dedups a NEW shard against the store
by reading ONLY these two signature tables (never the corpus): new
bands are computed from the new text, candidate pairs are old x new
rows sharing a ``pair_key`` (same coarse-bucket discipline and hot-key
cap as the full pipeline, so the candidate set equals the full-corpus
run restricted to cross pairs), and the exact set-Jaccard verify joins
stored old signatures with freshly computed new ones through the same
``attach_verify_pairs`` two-shuffle machinery. Every stage is the same
deterministic mod-2^64 arithmetic as ``minhash_dedup_pairs``, so the
result is bit-equal to re-running the full pipeline on (corpus ∪ shard)
and keeping the cross pairs — which is exactly what the SQL oracle
states.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ocr_ray.functions.dedup import (
    SHINGLES_TYPE,
    attach_verify_pairs,
    bucketed_pairs,
    doc_shingle_lists,
    keyed_run_pairs,
    minhash_bands,
)

BANDS_SCHEMA = pa.schema({"pair_key": pa.uint64(), "doc_id": pa.int64()})
SIGS_SCHEMA = pa.schema({"doc_id": pa.int64(), "shingles": SHINGLES_TYPE})


def build_minhash_store(docs_ds, store_dir: str, *, num_parts: int = 16):
    """Persist the corpus's dedup state (band table + signatures)."""
    from ocr_ray.functions.hashing import doc_bucket

    def tag_bands(t: pa.Table) -> pa.Table:
        b = minhash_bands(t).select(["pair_key", "doc_id"])
        part = (
            b["pair_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
            % np.uint64(num_parts)
        ).astype(np.int32)
        return b.append_column("_part", pa.array(part))

    def tag_sigs(t: pa.Table) -> pa.Table:
        s = doc_shingle_lists(t)
        part = doc_bucket(s["doc_id"], num_parts).astype(np.int32)
        return s.append_column("_part", pa.array(part))

    from ocr_ray.state.manifest import sink_partitioned

    bands_df = sink_partitioned(
        docs_ds.map_batches(tag_bands, batch_format="pyarrow"),
        os.path.join(store_dir, "bands"),
        num_parts,
        BANDS_SCHEMA.empty_table(),
        {"store": "minhash-bands", "key": "pair_key"},
    )
    sigs_df = sink_partitioned(
        docs_ds.map_batches(tag_sigs, batch_format="pyarrow"),
        os.path.join(store_dir, "sigs"),
        num_parts,
        SIGS_SCHEMA.empty_table(),
        {"store": "minhash-sigs", "key": "doc_id"},
    )
    return bands_df, sigs_df


def update_minhash_store(new_docs_ds, store_dir: str, *, num_parts: int = 16,
                         check_duplicates: bool = True) -> str:
    """Append a shard's dedup state (bands + signatures) to a committed
    store as a delta generation on the shared commit-marker protocol
    (see ``state/manifest.register_generation``): the shard is
    tokenized ONCE into its own mini bands/sigs store inside a ``gen-*``
    directory, then registered by one atomic marker create — so the
    NEXT arriving shard dedups against corpus ∪ appended shards without
    the corpus (or any earlier shard) ever being re-read. A crashed
    update is invisible; re-ingesting existing doc ids is refused
    loudly BEFORE registration (column-pruned, bucket-pruned id check
    across prior layers — disable via ``check_duplicates=False`` for
    trusted disjoint pipelines)."""
    import uuid

    import numpy as np
    import ray

    from ocr_ray.functions.hashing import doc_bucket
    from ocr_ray.state.manifest import (
        load_generations,
        load_manifest,
        read_fragments,
        register_generation,
        require_complete_manifest,
    )

    if not store_complete(store_dir, num_parts):
        raise ValueError(
            f"update_minhash_store: base store at {store_dir} is incomplete — "
            "build it first (crashed build?)"
        )
    name = f"gen-{len(load_generations(store_dir)):04d}-{uuid.uuid4().hex[:8]}"
    gdir = os.path.join(store_dir, name)
    build_minhash_store(new_docs_ds, gdir, num_parts=num_parts)

    if check_duplicates:
        dm = load_manifest(os.path.join(gdir, "sigs"))
        touched = [p for p, r in dm.items() if r.get("row_count", 0) > 0]
        if touched:
            shard_ids = np.sort(
                read_fragments([dm[p]["file"] for p in touched])
                .select_columns(["doc_id"])
                .to_pandas()["doc_id"]
                .to_numpy(dtype=np.int64)
            )
            ids_ref = ray.put(shard_ids)
            layer_dirs = [store_dir] + [
                os.path.join(store_dir, g) for g in load_generations(store_dir)
            ]
            files = []
            for d in layer_dirs:
                m = require_complete_manifest(
                    os.path.join(d, "sigs"), num_parts, what="update_minhash_store(guard)"
                )
                files.extend(m[p]["file"] for p in touched)

            def dups(t: pa.Table) -> pa.Table:
                ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
                hit = ids[np.isin(ids, ray.get(ids_ref))]
                return pa.table({"dup": pa.array(hit[:8], type=pa.int64())})

            hits = [
                t
                for t in ray.get(
                    read_fragments(files)
                    .select_columns(["doc_id"])
                    .map_batches(dups, batch_format="pyarrow")
                    .to_arrow_refs()
                )
                if t.num_rows
            ]
            if hits:
                sample = sorted(pa.concat_tables(hits)["dup"].to_pylist())[:8]
                raise ValueError(
                    f"update_minhash_store: shard re-ingests existing doc ids "
                    f"(e.g. {sample}) — refused; the delta was NOT registered"
                )
    register_generation(store_dir, name)
    return name


def store_complete(store_dir: str, num_parts: int = 16) -> bool:
    from ocr_ray.state.manifest import load_manifest

    return (
        len(load_manifest(os.path.join(store_dir, "bands"))) == num_parts
        and len(load_manifest(os.path.join(store_dir, "sigs"))) == num_parts
    )


def incremental_minhash_pairs(
    new_docs_ds,
    store_dir: str,
    *,
    tau: float = 0.5,
    num_buckets: int = 64,
    max_group: int = 256,
):
    """Near-dup pairs (old_doc, new_doc) of a new shard vs the committed
    store — no corpus text is read; old state comes entirely from the
    persisted band + signature tables."""
    from ocr_ray.state.manifest import (
        load_manifest,
        read_fragments,
        require_complete_manifest,
    )

    from ocr_ray.state.manifest import load_generations

    nb_parts = len(load_manifest(os.path.join(store_dir, "bands"))) or 16
    # the OLD side = base + every registered delta generation (appended
    # shards) — each layer a complete bands+sigs mini-store
    layer_dirs = [store_dir] + [
        os.path.join(store_dir, g) for g in load_generations(store_dir)
    ]
    bands_files, sigs_files = [], []
    for d in layer_dirs:
        bm = require_complete_manifest(
            os.path.join(d, "bands"), nb_parts, what="incremental_minhash_pairs"
        )
        sm = require_complete_manifest(
            os.path.join(d, "sigs"), nb_parts, what="incremental_minhash_pairs"
        )
        bands_files.extend(r["file"] for r in bm.values())
        sigs_files.extend(r["file"] for r in sm.values())

    def tag_side(side: int):
        def fx(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 and "pair_key" not in t.column_names:
                t = BANDS_SCHEMA.empty_table()
            return pa.table(
                {
                    "pair_key": pa.compute.cast(t["pair_key"], pa.uint64()),
                    "doc_id": t["doc_id"],
                    "side": pa.array(np.full(t.num_rows, side, dtype=np.int8)),
                }
            )

        return fx

    old_bands = read_fragments(bands_files).map_batches(
        tag_side(0), batch_format="pyarrow"
    )
    new_bands = (
        new_docs_ds.map_batches(minhash_bands, batch_format="pyarrow")
        .map_batches(
            lambda t: t.select(["pair_key", "doc_id"]), batch_format="pyarrow"
        )
        .map_batches(tag_side(1), batch_format="pyarrow")
    )

    def cross_body(g: pa.Table) -> pa.Table:
        # the SHARED pair body with the cross-side filter — one
        # implementation with the full pipeline, so bit-equality holds
        # by construction
        return keyed_run_pairs(g, side_col="side", max_group=max_group)

    cands = bucketed_pairs(
        old_bands.union(new_bands),
        key_col="pair_key",
        id_col="doc_id",
        pair_body=cross_body,
        num_buckets=num_buckets,
    )
    sigs = read_fragments(sigs_files).union(
        new_docs_ds.map_batches(doc_shingle_lists, batch_format="pyarrow")
    )
    return attach_verify_pairs(cands, sigs, tau=tau)
