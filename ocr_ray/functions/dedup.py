"""Deduplication operators: exact, key-based, MinHash-LSH, SimHash,
n-gram Jaccard, embedding near-dup.

All are expressed Ray-Data-first:

- hashing/minhashing/simhashing are vectorized per batch (numpy over the
  flattened token stream — no Python per row/shingle);
- candidate generation is a ``groupby`` on a *bounded* key (band hash,
  shingle bucket, LSH bucket) — the only shuffles;
- pair verification touches only candidate docs (broadcast of the
  involved subset), mirroring the reference's idempotent-event dedup
  semantics (duplicate satisfactions dropped,
  ``/root/reference/src/event/hc/hc-event.c:202-208``).

Scale notes are on each operator: group-size caps guard hot keys, and
every "collect to driver" step is over data already reduced to candidate
pairs (<< corpus).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# content hashing / exact dedup
# ---------------------------------------------------------------------------


def add_md5(batch: pa.Table, *, col: str = "text", out: str = "content_md5") -> pa.Table:
    """Append an md5 content hash (hex). md5 chosen ONLY for SQL-oracle
    parity (DuckDB ``md5()``); it is a per-row hashlib loop. Production
    exact-dedup should use ``add_content_hash`` below (buffer-level
    vectorized, no Python per row) — the dedup semantics are identical."""
    hashes = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in batch[col].to_pylist()]
    return batch.append_column(out, pa.array(hashes, type=pa.string()))


def add_content_hash(batch: pa.Table, *, col: str = "text", out: str = "content_hash") -> pa.Table:
    """Vectorized 64-bit content hash straight off the Arrow string value
    buffer (``hash_utf8_column`` + splitmix64 finalizer) — the scale path
    for exact dedup keys; no Python string materialization."""
    from ocr_ray.functions.hashing import hash_utf8_column, mix64

    h = mix64(hash_utf8_column(batch[col]))
    return batch.append_column(out, pa.array(h, type=pa.uint64()))


def _word_hashes(flat: pa.Array) -> np.ndarray:
    """uint64 hashes of a flat token array — buffer-level vectorized
    (no to_pylist / object-array materialization), splitmix64-finalized."""
    from ocr_ray.functions.hashing import hash_utf8_column, mix64

    return mix64(hash_utf8_column(flat))


def first_per_key(group: pd.DataFrame, *, key: str, order: str) -> pd.DataFrame:
    """Vectorized keep-first-by-order within a hash bucket of keys."""
    g = group.sort_values([key, order], kind="mergesort")
    return g[~g[key].duplicated()].drop(columns=["_bucket"], errors="ignore")


def dedup_by_key(ds, *, key: str, order: str, num_buckets: int = 16):
    """Exact dedup: hash-partition on ``key``, keep the first row by
    ``order`` in each key group. One shuffle; per-bucket body vectorized
    (string keys hash straight off the Arrow value buffer)."""
    def bucketize(t: pa.Table) -> pa.Table:
        col = t[key]
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            from ocr_ray.functions.hashing import hash_utf8_column, mix64

            h = mix64(hash_utf8_column(col))
        else:
            h = pd.util.hash_array(col.to_numpy(zero_copy_only=False))
        return t.append_column("_bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int32)))

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda g: first_per_key(g, key=key, order=order), batch_format="pandas"
        )
    )


# ---------------------------------------------------------------------------
# shingles + MinHash
# ---------------------------------------------------------------------------

_HASH_SEED = 0x5EED


def _perm_params(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(_HASH_SEED)
    a = rng.integers(1, 1 << 61, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 61, size=num_perm, dtype=np.uint64)
    return a, b


def shingle_hashes(texts: pa.ChunkedArray | pa.Array, *, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """k-word shingle hashes for a batch of texts.

    Returns ``(flat_shingle_hash_u64, shingles_per_doc)``; the whole batch
    tokenizes with one Arrow split and hashes with numpy rolling windows.
    """
    toks = pc.split_pattern(texts, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    word_h = _word_hashes(flat)
    # rolling combine of k consecutive word hashes within each doc
    n_sh = np.maximum(counts - (k - 1), 0)
    if word_h.size == 0 or int(n_sh.sum()) == 0:
        return np.empty(0, dtype=np.uint64), n_sh
    doc_starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    sh_starts = np.concatenate([[0], np.cumsum(n_sh)])[:-1]
    # index of first word of each shingle (flat):
    first_word_idx = (
        np.arange(int(n_sh.sum()), dtype=np.int64)
        - np.repeat(sh_starts, n_sh)
        + np.repeat(doc_starts, n_sh)
    )
    with np.errstate(over="ignore"):
        acc = np.zeros(int(n_sh.sum()), dtype=np.uint64)
        mult = np.uint64(0x9E3779B97F4A7C15)
        for j in range(k):
            acc = acc * mult + word_h[first_word_idx + j]
    return acc, n_sh


def minhash_signatures(texts, *, num_perm: int = 64, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """(n_docs, num_perm) uint64 MinHash signatures (empty docs -> MAX).

    One pass per permutation over a single reused S-sized buffer: each
    permutation is ``x -> a*x + b (mod 2^64)`` with odd ``a`` — a bijection
    on uint64, so the min statistic is well defined. The earlier
    ``(S, num_perm) % mersenne`` formulation materialized ~0.5 GB per 10k-doc
    batch (this host intermittently services fresh large-allocation page
    faults ~1000x slow, see functions/hashing.py) and paid numpy's scalar
    uint64-modulo loop — 82 CPU-s per 10k docs; this form is ~100x cheaper
    with identical detection semantics (the exact-Jaccard verify stage is
    unchanged)."""
    sh, n_sh = shingle_hashes(texts, k=k)
    a, b = _perm_params(num_perm)
    n_docs = len(n_sh)
    sig = np.full((n_docs, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(sh) == 0:
        return sig, n_sh
    starts = np.concatenate([[0], np.cumsum(n_sh)])[:-1]
    ne_starts = starts[n_sh > 0]
    nonempty = np.flatnonzero(n_sh > 0)
    buf = np.empty(len(sh), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(num_perm):
            np.multiply(sh, a[j], out=buf)
            buf += b[j]
            sig[nonempty, j] = np.minimum.reduceat(buf, ne_starts)
    return sig, n_sh


def minhash_bands(batch: pa.Table, *, num_perm: int = 64, bands: int = 32, k: int = 3) -> pa.Table:
    """Per doc: emit one row per LSH band -> (band_id, band_hash, doc_id).

    Downstream ``groupby(['band_id','band_hash'])`` brings candidate
    duplicates together (the shuffle). 32 bands x 2 rows over 64 perms:
    detection probability 1-(1-J^2)^32 (≈0.9999 at J=0.5) — the exact
    verify stage removes the extra false candidates this admits."""
    sig, _ = minhash_signatures(batch["text"], num_perm=num_perm, k=k)
    rows_per = num_perm // bands
    n = batch.num_rows
    band_sig = sig.reshape(n, bands, rows_per)
    with np.errstate(over="ignore"):
        mult = np.uint64(0xC2B2AE3D27D4EB4F)
        bh = np.zeros((n, bands), dtype=np.uint64)
        for j in range(rows_per):
            bh = bh * mult + band_sig[:, :, j]
    doc_ids = np.repeat(batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64), bands)
    band_ids = np.tile(np.arange(bands, dtype=np.uint64), n)
    with np.errstate(over="ignore"):
        pair_key = bh.reshape(-1) ^ (band_ids * np.uint64(0x9E3779B97F4A7C15))
    return pa.table(
        {
            "band_id": pa.array(band_ids.astype(np.int32)),
            "band_hash": pa.array(bh.reshape(-1)),
            "pair_key": pa.array(pair_key, type=pa.uint64()),
            "doc_id": pa.array(doc_ids, type=pa.int64()),
        }
    )


def candidate_pairs_from_band(group: pd.DataFrame, *, max_group: int = 256) -> pd.DataFrame:
    """All doc pairs sharing one (band_id, band_hash) bucket.

    Hot buckets above ``max_group`` are truncated (logged upstream) — at
    100 TB a hot band hash means near-identical boilerplate docs; cap and
    let the exact-verify stage handle the rest via transitivity."""
    ids = np.unique(group["doc_id"].to_numpy())[:max_group]
    if len(ids) < 2:
        return pd.DataFrame({"doc_a": [], "doc_b": []}, dtype=np.int64)
    ia, ib = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})


# ---------------------------------------------------------------------------
# coarse-bucket pair generation (the shape every *_pairs operator uses)
# ---------------------------------------------------------------------------
#
# A groupby on the raw LSH key (band hash / sign bucket / shingle) creates
# millions of tiny groups and pays a Python call per group. Instead every
# key is folded into one of ``num_buckets`` coarse hash buckets — the ONLY
# shuffle key — and the per-bucket body sorts by (key, id) once and detects
# key runs with numpy. One Python call per bucket, vectorized inside; the
# number of buckets scales with the cluster, not with the key cardinality.


def run_index_pairs(
    keys: np.ndarray, *, max_group: int, presorted: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """Index pairs (ia, ib) of same-key runs in a key array.

    ``keys`` must be sortable (uint64); rows within a run pair all-vs-all
    up to ``max_group`` rows per run (hot-key cap). Returns indices into
    the *sorted* order — callers sort their payload arrays the same way.
    """
    n = len(keys)
    if n < 2:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    assert presorted, "sort keys (and payloads) before calling run_index_pairs"
    change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [n]])
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    for s, e in zip(starts, ends):
        m = min(e - s, max_group)
        if m >= 2:
            ia, ib = np.triu_indices(m, k=1)
            out_a.append(ia + s)
            out_b.append(ib + s)
    if not out_a:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return np.concatenate(out_a), np.concatenate(out_b)


def keyed_run_pairs(
    g: pa.Table,
    *,
    key_col: str = "pair_key",
    id_col: str = "doc_id",
    side_col: str | None = None,
    max_group: int = 256,
) -> pa.Table:
    """Same-key candidate pairs within one coarse bucket — THE shared
    pair body of the LSH family (one implementation, so the full and
    incremental pipelines cannot drift apart; their bit-equality is what
    the incremental oracle states). Rows sort by (key, id), same-key runs
    pair all-vs-all up to ``max_group`` (hot-key cap), and the pair set
    dedups. Without ``side_col``: all pairs, ``doc_a < doc_b`` by the
    sorted order. With ``side_col`` (int8, 0 = old / 1 = new): only
    CROSS-side pairs, oriented ``doc_a`` = side-0 id, ``doc_b`` = side-1
    id — the incremental probe's shape."""
    keys = g[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
    ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((ids, keys))
    keys, ids = keys[order], ids[order]
    side = (
        g[side_col].to_numpy(zero_copy_only=False).astype(np.int8)[order]
        if side_col is not None
        else None
    )
    ia, ib = run_index_pairs(keys, max_group=max_group, presorted=True)
    if side is not None:
        cross = side[ia] != side[ib]
        ia, ib = ia[cross], ib[cross]
        swap = side[ia] == 1
        a = np.where(swap, ids[ib], ids[ia])
        b = np.where(swap, ids[ia], ids[ib])
    else:
        a, b = ids[ia], ids[ib]
    if len(a):
        o2 = np.lexsort((b, a))
        a, b = a[o2], b[o2]
        first = np.empty(len(a), dtype=bool)
        first[0] = True
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        a, b = a[first], b[first]
    return pa.table(
        {"doc_a": pa.array(a, type=pa.int64()), "doc_b": pa.array(b, type=pa.int64())}
    )


def bucketed_pairs(
    ds,
    *,
    key_col: str,
    id_col: str,
    pair_body,
    num_buckets: int = 64,
):
    """keyed rows -> candidate pairs via coarse hash buckets.

    ``pair_body(g: pa.Table) -> pa.Table`` runs once per coarse bucket
    (vectorized inside; Arrow in AND out, so the pair stream downstream —
    dedup, verify joins — stays in Arrow blocks). The bucket is
    ``key % num_buckets`` so all rows of one key land together regardless
    of bucket count.
    """

    def bucketize(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "_bucket", pa.array((k % np.uint64(num_buckets)).astype(np.int32))
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(pair_body, batch_format="pyarrow")
    )


def doc_shingle_lists(batch: pa.Table, *, k: int = 3) -> pa.Table:
    """Per-doc UNIQUE-SORTED shingle-hash signatures as a list<uint64>
    column — the distributed-verify side input (one row per doc; Jaccard
    over these hash sets equals Jaccard over word-tuple shingle sets up to
    u64 collisions). Fully vectorized: one Arrow split, one lexsort, one
    run-boundary mask for the whole batch."""
    sh, n_sh = shingle_hashes(batch["text"], k=k)
    n_docs = len(n_sh)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), n_sh)
    order = np.lexsort((sh, doc_idx))
    di, ss = doc_idx[order], sh[order]
    keep = np.empty(len(ss), dtype=bool)
    if len(ss):
        keep[0] = True
        keep[1:] = (di[1:] != di[:-1]) | (ss[1:] != ss[:-1])
    di2, ss2 = di[keep], ss[keep]
    counts = np.bincount(di2, minlength=n_docs)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    arr = pa.LargeListArray.from_arrays(
        pa.array(offsets, type=pa.int64()), pa.array(ss2, type=pa.uint64())
    )
    return pa.table({"doc_id": batch["doc_id"], "shingles": arr})


SHINGLES_TYPE = pa.large_list(pa.uint64())


def pairwise_jaccard_lists(col_a, col_b) -> np.ndarray:
    """Vectorized Jaccard between row-aligned list<uint64> columns of
    unique-sorted hash sets: |A∩B| = |A| + |B| - |A∪B|, with the union
    counted by one lexsort + run-boundary mask over (row, value) — no
    Python per pair."""
    la = col_a.combine_chunks() if isinstance(col_a, pa.ChunkedArray) else col_a
    lb = col_b.combine_chunks() if isinstance(col_b, pa.ChunkedArray) else col_b
    n = len(la)
    na = pc.list_value_length(la).to_numpy(zero_copy_only=False).astype(np.int64)
    nb = pc.list_value_length(lb).to_numpy(zero_copy_only=False).astype(np.int64)
    va = pc.list_flatten(la).to_numpy(zero_copy_only=False).astype(np.uint64)
    vb = pc.list_flatten(lb).to_numpy(zero_copy_only=False).astype(np.uint64)
    rows = np.concatenate(
        [np.repeat(np.arange(n, dtype=np.int64), na), np.repeat(np.arange(n, dtype=np.int64), nb)]
    )
    vals = np.concatenate([va, vb])
    if len(vals) == 0:
        return np.ones(n, dtype=np.float64)
    order = np.lexsort((vals, rows))
    rs, vs = rows[order], vals[order]
    new = np.empty(len(rs), dtype=np.int64)
    new[0] = 1
    new[1:] = ((rs[1:] != rs[:-1]) | (vs[1:] != vs[:-1])).astype(np.int64)
    union = np.bincount(rs, weights=new, minlength=n).astype(np.int64)
    inter = na + nb - union
    jac = inter / np.maximum(union, 1)
    jac[(na == 0) & (nb == 0)] = 1.0
    return jac


def dedup_pairs(ds, *, cols: tuple[str, str] = ("doc_a", "doc_b"), num_buckets: int | None = None):
    """Distributed pair dedup: a (a, b) pair always hashes to one coarse
    bucket, so per-bucket ``drop_duplicates`` is globally exact — replaces
    the round-1 driver-side ``to_pandas().drop_duplicates()``."""
    from ocr_ray.functions.hashing import mix64
    from ocr_ray.sizing import default_buckets

    nb = num_buckets or default_buckets()
    a_col, b_col = cols

    def bucketize(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = mix64(a * np.uint64(0x9E3779B97F4A7C15) + b)
        return t.append_column("_bucket", pa.array((h % np.uint64(nb)).astype(np.int32)))

    def body(g: pa.Table) -> pa.Table:
        # first-occurrence dedup on (a, b), survivors in original order —
        # same semantics as pandas drop_duplicates, but Arrow in/out so
        # downstream stages never see pandas blocks
        a = g[a_col].to_numpy(zero_copy_only=False)
        b = g[b_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((np.arange(len(a)), b, a))
        sa, sb = a[order], b[order]
        first = np.empty(len(sa), dtype=bool)
        if len(sa):
            first[0] = True
            first[1:] = (sa[1:] != sa[:-1]) | (sb[1:] != sb[:-1])
        keep = np.sort(order[first])
        return g.drop_columns(["_bucket"]).take(pa.array(keep, type=pa.int64()))

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(body, batch_format="pyarrow")
    )


def attach_verify_pairs(
    pairs,
    sigs,
    *,
    tau: float,
    num_buckets: int | None = None,
    cols: tuple[str, str] = ("doc_a", "doc_b"),
    min_count: int = 1,
):
    """Candidate pairs + per-doc signatures -> verified pairs with exact
    set-Jaccard >= ``tau``, in exactly TWO bucketed shuffles with
    all-Arrow bucket bodies.

    ``cols`` names the pair id columns on BOTH the input ``pairs`` and the
    verified output (duplicates fine — multiple LSH bands emitting the
    same pair collapse for free below); ``sigs`` has
    ``doc_id`` + ``shingles`` (unique-sorted ``list<uint64>``, one row per
    doc, from :func:`doc_shingle_lists`).

    Shuffle 1 groups by DOC bucket: each pair is emitted once per side,
    keyed by that side's doc id, so every copy of a duplicate pair lands
    in the same bucket and dedups there, then picks up the side's
    signature by sorted lookup. Shuffle 2 regroups by PAIR bucket: the
    two sides of each pair meet and a vectorized set-Jaccard
    (:func:`pairwise_jaccard_lists`) filters on ``tau``. Replaces the
    dedup-shuffle + two pandas-merging hash joins (3 shuffles, signatures
    computed twice) of the first distributed-verify cut.

    ``min_count`` keeps only pairs emitted at least that many times — the
    PPJoin-style candidate filter for inverted-index generators: a pair
    with Jaccard >= tau must share >= tau/(1+tau) * (|A|+|B|) features,
    so ``min_count=2`` discards the long tail of single-feature
    collisions before signatures attach. It is NOT free: pairs that
    legitimately share only one feature are dropped — exactly when
    |A|+|B| < 2*(1+tau)/tau (very short docs), plus a small sampled-
    overlap tail when the generator bottom-samples shingles. Callers
    whose corpus has tiny documents should pass ``min_count=1``; oracles
    must mirror the same threshold (HAVING count >= min_count).
    """
    from ocr_ray.functions.hashing import mix64
    from ocr_ray.sizing import default_buckets

    nb = num_buckets or default_buckets()
    GOLD = np.uint64(0x9E3779B97F4A7C15)

    def _pair_bucket(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            return (mix64(a.astype(np.uint64) * GOLD + b.astype(np.uint64)) % np.uint64(nb)).astype(
                np.int32
            )

    union_schema = pa.schema(
        {
            "key": pa.int64(),
            "a": pa.int64(),
            "b": pa.int64(),
            "side": pa.int8(),
            "shingles": SHINGLES_TYPE,
            "_bucket": pa.int32(),
        }
    )

    def emit_pair_sides(t: pa.Table) -> pa.Table:
        a = t[cols[0]].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[cols[1]].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(a)
        key = np.concatenate([a, b])
        aa = np.concatenate([a, a])
        bb = np.concatenate([b, b])
        side = np.concatenate([np.zeros(n, np.int8), np.ones(n, np.int8)])
        return pa.table(
            {
                "key": pa.array(key),
                "a": pa.array(aa),
                "b": pa.array(bb),
                "side": pa.array(side),
                "shingles": pa.nulls(2 * n, type=SHINGLES_TYPE),
                "_bucket": pa.array(
                    (key.astype(np.uint64) % np.uint64(nb)).astype(np.int32)
                ),
            },
            schema=union_schema,  # both union branches MUST agree exactly
        )

    def emit_sigs(t: pa.Table) -> pa.Table:
        key = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(key)
        return pa.table(
            {
                "key": pa.array(key),
                "a": pa.nulls(n, type=pa.int64()),
                "b": pa.nulls(n, type=pa.int64()),
                "side": pa.array(np.full(n, -1, dtype=np.int8)),
                "shingles": pc.cast(t["shingles"], SHINGLES_TYPE),
                "_bucket": pa.array(
                    (key.astype(np.uint64) % np.uint64(nb)).astype(np.int32)
                ),
            },
            schema=union_schema,
        )

    both = pairs.map_batches(emit_pair_sides, batch_format="pyarrow").union(
        sigs.map_batches(emit_sigs, batch_format="pyarrow")
    )

    attach_schema = pa.schema(
        {
            "a": pa.int64(),
            "b": pa.int64(),
            "side": pa.int8(),
            "shingles": SHINGLES_TYPE,
            "_pb": pa.int32(),
        }
    )

    def attach_bucket(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        is_sig = side == -1
        sig_t = g.filter(pa.array(is_sig))
        pr_t = g.filter(pa.array(~is_sig))
        if pr_t.num_rows == 0 or sig_t.num_rows == 0:
            return attach_schema.empty_table()
        sk = sig_t["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(sk, kind="stable")
        sk_sorted = sk[order]
        sig_sh = pc.take(sig_t["shingles"].combine_chunks(), pa.array(order))
        key = pr_t["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        a = pr_t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = pr_t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = pr_t["side"].to_numpy(zero_copy_only=False)
        # dedup identical (a, b, side) rows — all duplicates of a pair
        # carry the same key, so this bucket sees every copy; with
        # min_count > 1, runs shorter than min_count are dropped here
        # (the emit-count filter, see docstring).
        po = np.lexsort((s, b, a))
        a, b, s, key = a[po], b[po], s[po], key[po]
        first = np.empty(len(a), dtype=bool)
        if len(a):
            first[0] = True
            first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1]) | (s[1:] != s[:-1])
        if min_count > 1:
            gid = np.cumsum(first) - 1
            keep = first & (np.bincount(gid)[gid] >= min_count)
        else:
            keep = first
        a, b, s, key = a[keep], b[keep], s[keep], key[keep]
        pos = np.searchsorted(sk_sorted, key)
        pos_c = np.minimum(pos, len(sk_sorted) - 1)
        valid = sk_sorted[pos_c] == key
        a, b, s = a[valid], b[valid], s[valid]
        taken = pc.take(sig_sh, pa.array(pos_c[valid]))
        return pa.table(
            {
                "a": pa.array(a),
                "b": pa.array(b),
                "side": pa.array(s),
                "shingles": taken,
                "_pb": pa.array(_pair_bucket(a, b)),
            },
            schema=attach_schema,
        )

    attached = both.groupby("_bucket").map_groups(attach_bucket, batch_format="pyarrow")

    out_schema = pa.schema({cols[0]: pa.int64(), cols[1]: pa.int64()})

    def verify_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        a = g["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = g["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = g["side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((s, b, a))
        a, b, s = a[order], b[order], s[order]
        sh = pc.take(g["shingles"].combine_chunks(), pa.array(order))
        # complete pairs contribute exactly two adjacent rows (side 0, 1)
        first = np.empty(len(a), dtype=bool)
        if len(a):
            first[0] = True
            first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        gid = np.cumsum(first) - 1
        sizes = np.bincount(gid)
        full = sizes[gid] == 2
        lead = first & full  # side-0 row of a complete pair
        trail = full & ~first  # side-1 row
        sh_a = sh.filter(pa.array(lead))
        sh_b = sh.filter(pa.array(trail))
        jac = pairwise_jaccard_lists(sh_a, sh_b)
        ok = jac >= tau
        return pa.table(
            {cols[0]: pa.array(a[lead][ok]), cols[1]: pa.array(b[lead][ok])},
            schema=out_schema,
        )

    return attached.groupby("_pb").map_groups(verify_bucket, batch_format="pyarrow")


def shingle_set(text: str, *, k: int = 3) -> set:
    """The k-word shingle set of one text (for cached pair verification)."""
    t = text.split(" ")
    return {tuple(t[i : i + k]) for i in range(max(len(t) - k + 1, 0))}


def exact_jaccard(text_a: str, text_b: str, *, k: int = 3) -> float:
    """Oracle-grade exact k-shingle Jaccard for a verified pair."""
    ta, tb = text_a.split(" "), text_b.split(" ")
    sa = {tuple(ta[i : i + k]) for i in range(max(len(ta) - k + 1, 0))}
    sb = {tuple(tb[i : i + k]) for i in range(max(len(tb) - k + 1, 0))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(batch: pa.Table) -> pa.Table:
    """64-bit SimHash per doc from word hashes (vectorized bit voting)."""
    toks = pc.split_pattern(batch["text"], " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    word_h = _word_hashes(flat)
    # One pass per bit over a reused W-sized buffer. A word gets a +1 vote
    # on bit j iff the bit is set, -1 otherwise; the summed vote is
    # positive iff 2*ones > words — computed per doc with reduceat. (The
    # (W, 64) bit-matrix form materialized ~1 GB per 10k-doc batch; fresh
    # large allocations intermittently page-fault ~1000x slow on this
    # host, see functions/hashing.py.)
    starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    n = batch.num_rows
    sh = np.zeros(n, dtype=np.uint64)
    ne = np.flatnonzero(counts > 0)
    if word_h.size and ne.size:
        ne_starts = starts[ne]
        ne_counts = counts[ne]
        buf = np.empty(word_h.size, dtype=np.uint64)
        for j in range(64):
            np.right_shift(word_h, np.uint64(j), out=buf)
            buf &= np.uint64(1)
            ones = np.add.reduceat(buf, ne_starts)
            sh[ne] |= (2 * ones > ne_counts).astype(np.uint64) << np.uint64(j)
    return pa.table({"doc_id": batch["doc_id"], "simhash": pa.array(sh, type=pa.uint64())})


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def hamming_u64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a^b via byte-view + 256-entry lookup."""
    x = np.ascontiguousarray(a ^ b)
    if len(x) == 0:
        return np.empty(0, dtype=np.int64)
    return _POP8[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1).astype(np.int64)


# ---------------------------------------------------------------------------
# derived near-dup corpora (deterministic; no external data)
# ---------------------------------------------------------------------------

MUTANT_OFFSET = 1_000_000


def with_mutants(batch: pa.Table, *, drop_every: int = 10) -> pa.Table:
    """Union each doc with a deterministic mutated copy (every
    ``drop_every``-th word removed; doc_id + MUTANT_OFFSET) — the seeded
    near-duplicate population for dedup operators."""
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    mut_texts = [
        " ".join(w for i, w in enumerate(t.split(" ")) if (i + 1) % drop_every != 0)
        for t in texts
    ]
    out_ids = list(ids) + [int(d) + MUTANT_OFFSET for d in ids]
    return pa.table(
        {
            "doc_id": pa.array(out_ids, type=pa.int64()),
            "text": pa.array(list(texts) + mut_texts, type=pa.string()),
        }
    )
