"""Similarity search over embedding columns.

- ``brute_topk``: exact cosine top-k — the query matrix is broadcast once
  (``ray.put``), each batch does one numpy matmul and emits only its local
  top-k per query (partial top-k combiner), and a tiny final reduce merges
  partials. No full-similarity materialization.
- ``IvfIndex`` / ``ivf_topk``: the scale path — deterministic centroids,
  per-batch cluster assignment, candidate search restricted to the
  ``nprobe`` closest centroids per query. Recall measured vs brute force
  in tests.
- ``lsh_buckets`` + near-dup pairs: random-hyperplane signatures for
  cosine near-duplicate detection.

Reference parity: the broadcast-query pattern re-expresses the
reference's shared-read-only-table-by-pointer idiom
(``/root/reference/examples/smith-waterman/smithwaterman.c:334-344``)
distributed-safely (``ray.put`` once, fetched per actor); the partial
top-k + tiny final merge is the tree-reduction user pattern
(``/root/reference/examples/treesum_2level/treesum_2level.c:56-142``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ocr_ray.functions.relational import _prepared

_RNG_SEED = 0xA11

_PARTIAL_SCHEMA = pa.schema(
    {"query_id": pa.int64(), "vec_id": pa.int64(), "score": pa.float64()}
)


def _partial_table(q=(), v=(), s=()) -> pa.Table:
    """Typed partial-top-k rows — explicit types so empty batches emit the
    SAME schema as full ones (no RefBundle schema-mismatch warnings)."""
    return pa.table(
        {
            "query_id": pa.array(np.asarray(q, dtype=np.int64), type=pa.int64()),
            "vec_id": pa.array(np.asarray(v, dtype=np.int64), type=pa.int64()),
            "score": pa.array(np.asarray(s, dtype=np.float64), type=pa.float64()),
        }
    )


def _as_matrix(col) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix (zero-copy flatten)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    d = len(arr[0])
    return flat.reshape(len(arr), d).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class BatchTopK:
    """map_batches stage: local cosine top-k of each broadcast query
    against the batch's vectors. Emits (query_id, vec_id, score) partials."""

    def __init__(self, queries_ref, *, k: int, exclude_self: bool = True):
        qids, qmat = ray.get(queries_ref)
        self.qids = np.asarray(qids, dtype=np.int64)
        self.q = _normalize(qmat)  # (Q, d)
        self.k = k
        self.exclude_self = exclude_self

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _partial_table()
        vids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_as_matrix(batch["embedding"]))
        scores = self.q @ m.T  # (Q, n)
        if self.exclude_self:
            scores[self.qids[:, None] == vids[None, :]] = -np.inf
        k = min(self.k, scores.shape[1])
        idx = np.argpartition(-scores, k - 1, axis=1)[:, :k]
        rows_q = np.repeat(self.qids, k)
        rows_v = vids[idx.reshape(-1)]
        rows_s = np.take_along_axis(scores, idx, axis=1).reshape(-1)
        keep = np.isfinite(rows_s)
        return _partial_table(rows_q[keep], rows_v[keep], rows_s[keep])


def merge_topk(group: pd.DataFrame, *, k: int) -> pd.DataFrame:
    """Final reduce: global top-k per query from the batch partials,
    deterministic tiebreak (score desc, vec_id asc)."""
    g = group.sort_values(["score", "vec_id"], ascending=[False, True], kind="mergesort").head(k)
    g = g.reset_index(drop=True)
    g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
    return g


def brute_topk(ds, queries_ref, *, k: int = 5):
    """Exact cosine top-k for a broadcast query set over an embedding
    Dataset. Task-pool stage: the normalized query matrix is prepared once
    per worker process (worker-global broadcast cache), not per batch."""

    def fn(batch):
        st = _prepared(
            (queries_ref.hex(), "brute", k),
            lambda: BatchTopK(queries_ref, k=k),
        )
        return st(batch)

    partial = ds.map_batches(fn, batch_format="pyarrow")
    return partial.groupby("query_id").map_groups(
        lambda g: merge_topk(g, k=k), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# IVF (scale path)
# ---------------------------------------------------------------------------


def make_centroids(sample: np.ndarray, *, n_centroids: int) -> np.ndarray:
    """Deterministic centroids: seeded sample of rows + one refinement step."""
    rng = np.random.default_rng(_RNG_SEED)
    pick = rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)
    cent = _normalize(sample[pick])
    # one Lloyd step for stability
    assign = np.argmax(_normalize(sample) @ cent.T, axis=1)
    for c in range(len(cent)):
        members = sample[assign == c]
        if len(members):
            cent[c] = members.mean(axis=0)
    return _normalize(cent)


class IvfPartial:
    """Per-batch IVF search: score queries only against vectors whose
    cluster is among each query's nprobe nearest centroids."""

    def __init__(self, queries_ref, centroids_ref, *, k: int, nprobe: int):
        qids, qmat = ray.get(queries_ref)
        self.qids = np.asarray(qids, dtype=np.int64)
        self.q = _normalize(qmat)
        self.cent = ray.get(centroids_ref)  # (C, d), normalized
        self.k = k
        qc = self.q @ self.cent.T
        npb = min(nprobe, self.cent.shape[0])
        self.probe = np.argpartition(-qc, npb - 1, axis=1)[:, :npb]  # (Q, nprobe)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _partial_table()
        vids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_as_matrix(batch["embedding"]))
        clusters = np.argmax(m @ self.cent.T, axis=1)  # (n,)
        mask = (self.probe[:, :, None] == clusters[None, None, :]).any(axis=1)  # (Q, n)
        scores = self.q @ m.T
        scores[~mask] = -np.inf
        scores[self.qids[:, None] == vids[None, :]] = -np.inf
        k = min(self.k, scores.shape[1])
        idx = np.argpartition(-scores, k - 1, axis=1)[:, :k]
        rows_q = np.repeat(self.qids, k)
        rows_v = vids[idx.reshape(-1)]
        rows_s = np.take_along_axis(scores, idx, axis=1).reshape(-1)
        keep = np.isfinite(rows_s)
        return _partial_table(rows_q[keep], rows_v[keep], rows_s[keep])


def ivf_topk(ds, queries_ref, centroids_ref, *, k: int = 5, nprobe: int = 4):
    """IVF top-k as a task-pool stage (probe lists prepared once per worker)."""

    def fn(batch):
        st = _prepared(
            (queries_ref.hex(), centroids_ref.hex(), "ivf", k, nprobe),
            lambda: IvfPartial(queries_ref, centroids_ref, k=k, nprobe=nprobe),
        )
        return st(batch)

    partial = ds.map_batches(fn, batch_format="pyarrow")
    return partial.groupby("query_id").map_groups(
        lambda g: merge_topk(g, k=k), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# LSH buckets for cosine near-dup
# ---------------------------------------------------------------------------


def hyperplanes(dim: int, n_bits: int = 8, n_tables: int = 4) -> np.ndarray:
    """(n_tables, dim, n_bits) independent sign-LSH tables. Multiple tables
    drive the miss probability down multiplicatively: a pair at angle θ
    collides in one table with p=(1-θ/π)^n_bits and misses all tables with
    (1-p)^n_tables."""
    rng = np.random.default_rng(_RNG_SEED + 1)
    return rng.standard_normal((n_tables, dim, n_bits))


def lsh_buckets(batch: pa.Table, *, planes: np.ndarray) -> pa.Table:
    """Sign-LSH bucket rows per vector — one row per (table, vector).

    ``pair_key`` folds (table_id, bucket) into one uint64 so downstream
    candidate generation shuffles on a single coarse-bucketable key."""
    m = _normalize(_as_matrix(batch["embedding"]))
    n_tables, _, n_bits = planes.shape
    tables = []
    for t in range(n_tables):
        bits = (m @ planes[t]) > 0  # (n, b)
        bucket = (
            bits.astype(np.uint64) << np.arange(n_bits, dtype=np.uint64)[None, :]
        ).sum(axis=1, dtype=np.uint64)
        with np.errstate(over="ignore"):
            pair_key = bucket ^ (np.uint64(t) * np.uint64(0x9E3779B97F4A7C15))
        tables.append(
            pa.table(
                {
                    "table_id": pa.array(np.full(len(bucket), t, dtype=np.int32)),
                    "vec_id": batch["vec_id"],
                    "bucket": pa.array(bucket, type=pa.uint64()),
                    "pair_key": pa.array(pair_key, type=pa.uint64()),
                    "embedding": batch["embedding"],
                }
            )
        )
    return pa.concat_tables(tables)


def neardup_pairs_in_bucket(group: pd.DataFrame, *, tau: float, max_group: int = 512) -> pd.DataFrame:
    """Exact cosine verification of all pairs inside one LSH bucket."""
    g = group.sort_values("vec_id").head(max_group)
    vids = g["vec_id"].to_numpy(dtype=np.int64)
    if len(vids) < 2:
        return pd.DataFrame(
            {
                "vec_a": pd.Series([], dtype=np.int64),
                "vec_b": pd.Series([], dtype=np.int64),
                "cosine": pd.Series([], dtype=np.float64),
            }
        )
    m = _normalize(np.stack(g["embedding"].to_numpy()).astype(np.float64))
    s = m @ m.T
    ia, ib = np.triu_indices(len(vids), k=1)
    keep = s[ia, ib] >= tau
    return pd.DataFrame(
        {"vec_a": vids[ia[keep]], "vec_b": vids[ib[keep]], "cosine": s[ia, ib][keep]}
    )


def with_perturbed(batch: pa.Table, *, scale: float = 0.05, offset: int = 1_000_000) -> pa.Table:
    """Union each embedding with a deterministic perturbed copy
    (vec_id + offset) — the seeded near-duplicate population.

    Noise is splitmix64-derived and BOUNDED: ``u[v, j] = mix64(v*d + j + 1)
    / 2^64 - 0.5`` in [-0.5, 0.5), so the perturbation norm satisfies
    ``|eps| <= (scale/2) * |m|`` and ``cos(m, pert) >= (1-r)/(1+r)`` with
    ``r = scale/2`` — at scale=0.05 that is a GUARANTEED cosine >= 0.951,
    which makes planted-pair membership above the near-dup tau a theorem
    (the SQL oracles of the near-dup queries rely on this; an unbounded
    Gaussian could in principle push a planted pair below tau). Fully
    vectorized (no per-row RNG construction)."""
    from ocr_ray.functions.hashing import mix64

    vids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = _as_matrix(batch["embedding"])
    d = m.shape[1]
    with np.errstate(over="ignore"):
        keys = (
            vids[:, None].astype(np.uint64) * np.uint64(d)
            + np.arange(d, dtype=np.uint64)[None, :]
            + np.uint64(1)
        )
    noise = mix64(keys.reshape(-1)).reshape(len(vids), d).astype(np.float64) / 2.0**64 - 0.5
    pert = m + scale * noise * np.linalg.norm(m, axis=1, keepdims=True) / np.sqrt(m.shape[1])
    out_ids = np.concatenate([vids, vids + offset])
    out_vecs = np.concatenate([m, pert]).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(out_ids),
            "embedding": pa.array(list(out_vecs)),
        }
    )


def kmeans_fit(ds, init_centroids: np.ndarray, *, col: str = "embedding", iters: int = 4):
    """Distributed spherical k-means (Lloyd's) — the IVF centroid
    training the scale path needs (reference recognizer analogue:
    template refinement; seeding comes from ``sample_parquet_rows``).

    Each iteration is ONE streaming pass: every batch assigns its
    vectors to the nearest centroid by cosine (one (B,d)x(d,k) matmul)
    and emits exactly k partial rows (per-centroid sum vector, member
    count, similarity mass); a DISTRIBUTED ``groupby('cid').sum``
    reduces the partials, and only the k reduced rows reach the driver
    for the centroid update — no step holds the dataset, and driver
    state is k x d regardless of input size.

    Returns ``(centroids, objective_per_iter)`` where the objective is
    total cosine similarity mass (non-decreasing under Lloyd updates).
    """
    import ray
    from ray.data.aggregate import Sum

    cent = _normalize(np.asarray(init_centroids, dtype=np.float64))
    k, d = cent.shape
    history: list[float] = []

    def partial(t: pa.Table, *, cent_ref) -> pa.Table:
        c = ray.get(cent_ref)
        x = _normalize(_as_matrix(t[col]))
        sims = x @ c.T
        assign = np.argmax(sims, axis=1)
        best = sims[np.arange(len(x)), assign]
        sums = np.zeros((k, d), dtype=np.float64)
        np.add.at(sums, assign, x)
        cols = {
            "cid": pa.array(np.arange(k, dtype=np.int64)),
            "n": pa.array(np.bincount(assign, minlength=k).astype(np.int64)),
            "sim_sum": pa.array(np.bincount(assign, weights=best, minlength=k)),
        }
        for j in range(d):
            cols[f"s{j}"] = pa.array(sums[:, j])
        return pa.table(cols)

    for _ in range(iters):
        cent_ref = ray.put(cent)
        reduced = (
            ds.map_batches(partial, batch_format="pyarrow", fn_kwargs={"cent_ref": cent_ref})
            .groupby("cid")
            .aggregate(Sum("n"), Sum("sim_sum"), *[Sum(f"s{j}") for j in range(d)])
            .to_pandas()
            .sort_values("cid")
        )
        n = reduced["sum(n)"].to_numpy(dtype=np.float64)
        sums = np.stack([reduced[f"sum(s{j})"].to_numpy(dtype=np.float64) for j in range(d)], axis=1)
        newc = np.where(n[:, None] > 0, sums / np.maximum(n[:, None], 1.0), cent)
        cent = _normalize(newc)
        history.append(float(reduced["sum(sim_sum)"].sum()))
    return cent, history


def assign_clusters(ds, centroids_ref, *, col: str = "embedding", id_col: str = "vec_id"):
    """Final cluster assignment pass: (id, cid, cos_sim) per vector."""
    import ray

    def fx(t: pa.Table, *, cent_ref) -> pa.Table:
        c = ray.get(cent_ref)
        x = _normalize(_as_matrix(t[col]))
        sims = x @ c.T
        assign = np.argmax(sims, axis=1)
        return pa.table(
            {
                id_col: t[id_col],
                "cid": pa.array(assign.astype(np.int64)),
                "cos_sim": pa.array(sims[np.arange(len(x)), assign]),
            }
        )

    return ds.map_batches(fx, batch_format="pyarrow", fn_kwargs={"cent_ref": centroids_ref})


def farthest_point_init(sample: np.ndarray, *, k: int) -> np.ndarray:
    """Deterministic k-means++-style seeding on a (driver-sized) sample:
    start from the max-norm row, then greedily take the row farthest (in
    cosine distance) from all chosen centers. Avoids the merged-cluster
    local optimum that uniform-sample seeding hits when two picks land
    in one cluster; O(k * n_sample * d) on the driver sample only."""
    x = _normalize(np.asarray(sample, dtype=np.float64))
    first = int(np.argmax(np.linalg.norm(np.asarray(sample, dtype=np.float64), axis=1)))
    chosen = [first]
    best_sim = x @ x[first]
    for _ in range(min(k, len(x)) - 1):
        nxt = int(np.argmin(best_sim))
        chosen.append(nxt)
        best_sim = np.maximum(best_sim, x @ x[nxt])
    return x[chosen]


def pca_fit(ds, *, col: str = "embedding", k: int = 2):
    """Distributed PCA fit in ONE streaming pass.

    Each batch emits d fixed-size partial rows — row j carries the batch's
    row count, the j-th column sum, and the j-th row of the batch Gram
    matrix X^T X — and a distributed ``groupby(j).sum`` folds the
    partials; only the (d, d+2) reduced table reaches the driver, where
    the covariance eigendecomposition is O(d^3) regardless of input size
    (same fixed-size-model discipline as ``kmeans_fit``).

    Returns ``(components[k, d], explained_ratio[k], mean[d])`` with a
    deterministic sign convention (largest-|entry| positive) so the fit is
    reproducible across block layouts.
    """
    from ray.data.aggregate import Sum

    d = len(ds.take(1)[0][col])

    def partial(t: pa.Table) -> pa.Table:
        x = _as_matrix(t[col]).astype(np.float64)
        g = x.T @ x
        cols = {
            "j": pa.array(np.arange(d, dtype=np.int64)),
            "n": pa.array(np.full(d, len(x), dtype=np.int64)),
            "colsum": pa.array(x.sum(axis=0)),
        }
        for i in range(d):
            cols[f"g{i}"] = pa.array(g[:, i])
        return pa.table(cols)

    red = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("j")
        .aggregate(Sum("n"), Sum("colsum"), *[Sum(f"g{i}") for i in range(d)])
        .to_pandas()
        .sort_values("j")
    )
    n = int(red["sum(n)"].iloc[0])
    s = red["sum(colsum)"].to_numpy(dtype=np.float64)
    gram = np.stack([red[f"sum(g{i})"].to_numpy(dtype=np.float64) for i in range(d)], axis=1)
    mean = s / n
    cov = (gram - np.outer(s, mean)) / max(n - 1, 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    flip = np.sign(comps[np.arange(len(order)), np.argmax(np.abs(comps), axis=1)])
    comps = comps * flip[:, None]
    total = float(np.clip(evals.sum(), 1e-300, None))
    return comps, evals[order] / total, mean


def pca_transform(ds, components: np.ndarray, mean: np.ndarray, *, col: str = "embedding", id_col: str = "vec_id"):
    """Project embeddings onto fitted components — broadcast model,
    map-side matmul, (id, pc0..pc{k-1}) per row."""
    import ray

    model_ref = ray.put((np.asarray(components, dtype=np.float64), np.asarray(mean, dtype=np.float64)))

    def fx(t: pa.Table) -> pa.Table:
        comps, mu = ray.get(model_ref)
        x = _as_matrix(t[col]).astype(np.float64)
        proj = (x - mu) @ comps.T
        cols = {id_col: t[id_col]}
        for i in range(comps.shape[0]):
            cols[f"pc{i}"] = pa.array(proj[:, i])
        return pa.table(cols)

    return ds.map_batches(fx, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# int8-quantized search (memory-scale path: 4x smaller vectors than float32)
# ---------------------------------------------------------------------------


class QuantizedTopK:
    """map_batches stage: int8 symmetric quantization + exact rescore.

    Cosine inputs are unit-normalized, so the quantization grid is FIXED
    (scale = 1/127, no calibration pass): ``q = round(127 * x)``. The
    approximate score is the int8 dot product (exactly representable in
    float32 — BLAS does the matmul); each batch takes its approx top
    ``k * oversample`` candidates per query and RESCORES them with the
    exact float64 cosine, so the partials carry exact scores and the only
    approximation is candidate *selection*. At index scale the int8
    matrix is what you'd persist (4x smaller than float32, 8x than
    float64); here it is built per batch to exercise the kernel. Recall
    vs brute force is asserted in tests.
    """

    def __init__(self, queries_ref, *, k: int, oversample: int = 4, exclude_self: bool = True):
        qids, qmat = ray.get(queries_ref)
        self.qids = np.asarray(qids, dtype=np.int64)
        self.q = _normalize(qmat)  # (Q, d) float64, exact-rescore side
        # the f32 int8-dot exactness bound: |sum| <= d * 127^2 must stay
        # below 2^24 or the matmul rounds and candidate ranking drifts
        if self.q.shape[1] * 127 * 127 >= 1 << 24:
            raise ValueError(
                f"QuantizedTopK: dim {self.q.shape[1]} breaks the float32 "
                "int-exact dot-product bound (d <= 1040); accumulate in "
                "float64 for wider embeddings"
            )
        self.q8 = np.rint(self.q * 127.0).astype(np.float32)  # int8-valued
        self.k = k
        self.oversample = oversample
        self.exclude_self = exclude_self

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _partial_table()
        vids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_as_matrix(batch["embedding"]))
        m8 = np.rint(m * 127.0).astype(np.int8)  # the persisted form
        approx = self.q8 @ m8.astype(np.float32).T  # (Q, n), int-exact in f32
        if self.exclude_self:
            approx[self.qids[:, None] == vids[None, :]] = -np.inf
        c = min(self.k * self.oversample, approx.shape[1])
        # int-valued approx scores tie often; order (-score, vec_id) so the
        # candidate cut is deterministic across block layouts
        order = np.lexsort((vids[None, :].repeat(len(self.qids), 0), -approx), axis=1)
        cand = order[:, :c]  # (Q, c)
        # exact float64 rescore of the candidates only
        rows_q, rows_v, rows_s = [], [], []
        for qi in range(len(self.qids)):
            cols = cand[qi]
            if self.exclude_self:
                cols = cols[vids[cols] != self.qids[qi]]
            exact = self.q[qi] @ m[cols].T
            k = min(self.k, len(cols))
            if k == 0:
                continue
            top = np.argpartition(-exact, k - 1)[:k]
            rows_q.append(np.full(k, self.qids[qi], dtype=np.int64))
            rows_v.append(vids[cols[top]])
            rows_s.append(exact[top])
        if not rows_q:
            return _partial_table()
        return _partial_table(
            np.concatenate(rows_q), np.concatenate(rows_v), np.concatenate(rows_s)
        )


def quantized_topk(ds, queries_ref, *, k: int = 5, oversample: int = 4):
    """int8-candidate + exact-rescore top-k — same partial/merge shape as
    ``brute_topk`` (per-batch partials, tiny per-query merge)."""

    def fn(batch):
        st = _prepared(
            (queries_ref.hex(), "quant", k, oversample),
            lambda: QuantizedTopK(queries_ref, k=k, oversample=oversample),
        )
        return st(batch)

    partial = ds.map_batches(fn, batch_format="pyarrow")
    return partial.groupby("query_id").map_groups(
        lambda g: merge_topk(g, k=k), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Product quantization (IVFADC-style memory-scale path)
# ---------------------------------------------------------------------------
#
# At 10^12 vectors the full float matrix cannot stream per query; PQ stores
# m uint8 codes per vector (d*8 bytes -> m bytes) and scores by table
# lookup (ADC). The pipeline is the standard two-stage shape: ADC shortlist
# over the CODES (memory-light scan), then an EXACT cosine rescore of the
# shortlist members only — returned ranks are exact-cosine ranks of the
# shortlist, so quantization error can only cost recall, never corrupt a
# returned score. Jegou, Douze, Schmid, "Product Quantization for Nearest
# Neighbor Search" (TPAMI 2011) is the public reference for the method.


def pq_train(sample: np.ndarray, *, m: int = 8, n_codes: int = 16, iters: int = 8) -> np.ndarray:
    """(m, n_codes, d/m) codebooks: per-subspace Lloyd (L2) on a
    driver-sized sample, deterministic (farthest-point seeding per
    subspace, ties broken by index). d must divide by m."""
    x = _normalize(np.asarray(sample, dtype=np.float64))
    n, d = x.shape
    if d % m:
        raise ValueError(f"pq_train: d={d} not divisible by m={m}")
    sub = d // m
    kk = min(n_codes, n)
    books = np.empty((m, kk, sub), dtype=np.float64)
    for j in range(m):
        xj = x[:, j * sub : (j + 1) * sub]
        # farthest-point seeding in L2 on the subspace
        first = int(np.argmax(np.einsum("ij,ij->i", xj, xj)))
        chosen = [first]
        dist = np.einsum("ij,ij->i", xj - xj[first], xj - xj[first])
        for _ in range(kk - 1):
            nxt = int(np.argmax(dist))
            chosen.append(nxt)
            dn = np.einsum("ij,ij->i", xj - xj[nxt], xj - xj[nxt])
            dist = np.minimum(dist, dn)
        cent = xj[chosen].copy()
        for _ in range(iters):
            d2 = (
                np.einsum("ij,ij->i", xj, xj)[:, None]
                - 2.0 * (xj @ cent.T)
                + np.einsum("ij,ij->i", cent, cent)[None, :]
            )
            assign = np.argmin(d2, axis=1)
            for c in range(kk):
                hit = assign == c
                if hit.any():
                    cent[c] = xj[hit].mean(axis=0)
        books[j] = cent
    return books


def pq_encode_matrix(x: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) float -> (n, m) uint8 codes (argmin L2 per subspace; input
    rows are unit-normalized first, matching ``pq_train``)."""
    x = _normalize(np.asarray(x, dtype=np.float64))
    m, kk, sub = books.shape
    codes = np.empty((len(x), m), dtype=np.uint8)
    for j in range(m):
        xj = x[:, j * sub : (j + 1) * sub]
        cent = books[j]
        d2 = -2.0 * (xj @ cent.T) + np.einsum("ij,ij->i", cent, cent)[None, :]
        codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


def pq_encode(ds, books_ref, *, id_col: str = "vec_id", col: str = "embedding"):
    """Distributed encode pass: (vec_id, codes fixed_size_list<uint8, m>).
    The code table is the ONLY thing the shortlist scan reads — m bytes
    per vector regardless of d."""

    def fn(batch: pa.Table) -> pa.Table:
        books = _prepared((books_ref.hex(), "pq_books"), lambda: ray.get(books_ref))
        codes = pq_encode_matrix(_as_matrix(batch[col]), books)
        m = codes.shape[1]
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(codes.reshape(-1), type=pa.uint8()), m
        )
        return pa.table({id_col: batch[id_col], "codes": arr})

    return ds.map_batches(fn, batch_format="pyarrow")


class _PQShortlist:
    """map_batches stage over the CODE table: ADC top-``shortlist`` per
    broadcast query via per-subspace lookup tables."""

    def __init__(self, queries_ref, books_ref, *, shortlist: int):
        qids, qmat = ray.get(queries_ref)
        self.qids = np.asarray(qids, dtype=np.int64)
        q = _normalize(np.asarray(qmat, dtype=np.float64))
        books = ray.get(books_ref)  # (m, kk, sub)
        m, kk, sub = books.shape
        # table[i, j, c] = q_i[subspace j] . books[j, c]
        self.tables = np.einsum("ijs,jcs->ijc", q.reshape(len(q), m, sub), books)
        self.shortlist = shortlist

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _partial_table()
        vids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        codes_col = batch["codes"].combine_chunks()
        m = self.tables.shape[1]
        codes = (
            codes_col.flatten().to_numpy(zero_copy_only=False).reshape(len(vids), m)
        )
        nq = len(self.qids)
        scores = np.zeros((nq, len(vids)), dtype=np.float64)
        for j in range(m):
            scores += self.tables[:, j, :][:, codes[:, j]]
        scores[self.qids[:, None] == vids[None, :]] = -np.inf
        k = min(self.shortlist, scores.shape[1])
        idx = np.argpartition(-scores, k - 1, axis=1)[:, :k]
        rows_q = np.repeat(self.qids, k)
        rows_v = vids[idx.reshape(-1)]
        rows_s = np.take_along_axis(scores, idx, axis=1).reshape(-1)
        keep = np.isfinite(rows_s)
        return _partial_table(rows_q[keep], rows_v[keep], rows_s[keep])


def pq_topk(ds, queries_ref, books_ref, *, k: int = 5, shortlist: int = 64):
    """Two-stage PQ top-k: ADC shortlist over a materialized code table,
    exact cosine rescore of shortlist members only. Returns
    (query_id, vec_id, rank) where rank is by EXACT cosine among the
    ADC shortlist (deterministic tiebreak on vec_id)."""
    codes = pq_encode(ds, books_ref).materialize()

    def scan(batch):
        st = _prepared(
            (queries_ref.hex(), books_ref.hex(), "pq_scan", shortlist),
            lambda: _PQShortlist(queries_ref, books_ref, shortlist=shortlist),
        )
        return st(batch)

    partial = codes.map_batches(scan, batch_format="pyarrow")
    cand = partial.groupby("query_id").map_groups(
        lambda g: merge_topk(g, k=shortlist), batch_format="pandas"
    )
    # shortlist is Q x shortlist rows — a broadcastable candidate set.
    # Both membership tests below are vectorized: sorted int64 arrays +
    # np.isin, never per-row Python `in` over a set (that was a per-row
    # interpreter loop across the full rescore scan).
    cdf = cand.to_pandas()
    cand_ids = np.unique(cdf["vec_id"].to_numpy(dtype=np.int64))
    ids_ref = ray.put(cand_ids)

    def keep_cands(batch: pa.Table) -> pa.Table:
        wanted = _prepared((ids_ref.hex(), "pq_cands"), lambda: ray.get(ids_ref))
        vids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mask = np.isin(vids, wanted, assume_unique=False)
        return batch.filter(pa.array(mask))

    # exact rescore scans only candidate rows; per-query membership is
    # enforced by a final in-group filter (a candidate of query A is not
    # a candidate of query B). (q, v) pairs pack into one int64 key.
    q_arr = cdf["query_id"].to_numpy(dtype=np.int64)
    v_arr = cdf["vec_id"].to_numpy(dtype=np.int64)
    if q_arr.size and not (
        q_arr.min() >= 0
        and v_arr.min() >= 0
        and q_arr.max() < (1 << 31)
        and v_arr.max() < (1 << 31)
    ):
        # explicit raise (an assert disappears under python -O and a
        # packed-key collision silently corrupts a query's top-k)
        raise ValueError("pq_topk pair packing requires non-negative ids < 2^31")
    allowed = np.unique((q_arr << np.int64(31)) | v_arr)
    allowed_ref = ray.put(allowed)
    exact = brute_topk(ds.map_batches(keep_cands, batch_format="pyarrow"), queries_ref, k=shortlist)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        ok = _prepared((allowed_ref.hex(), "pq_allowed"), lambda: ray.get(allowed_ref))
        keys = (g["query_id"].to_numpy(dtype=np.int64) << np.int64(31)) | g[
            "vec_id"
        ].to_numpy(dtype=np.int64)
        g = g[np.isin(keys, ok)]
        g = g.sort_values(["score", "vec_id"], ascending=[False, True], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "vec_id", "rank"]]

    return exact.groupby("query_id").map_groups(final, batch_format="pandas")
