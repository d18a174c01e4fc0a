"""Distributed global ranking: row_number / ntile over partitions.

The scale problem: ``row_number() OVER (PARTITION BY p ORDER BY v)`` with
low-cardinality ``p`` is the canonical skew killer if implemented as
``groupby(p).map_groups`` — one task holds a whole partition. The
distributed shape used everywhere (Spark's window ranking, range
partitioners) is range-bucket + prefix offsets:

1. one cheap ``min/max`` aggregate of the order key;
2. per-(partition, range-bin) counts — map-side combined, distributed
   ``groupby.sum``; the driver sees <= partitions x bins rows and builds
   the exclusive prefix sum (how many rows of the partition sort before
   each bin);
3. ONE coarse-bucket shuffle keyed by (partition, bin): inside a bucket,
   sort by (partition, bin, value, tiebreak) and add the broadcast
   offset — every row gets its exact global rank without any task ever
   holding a whole partition.

Ties are broken by ``tiebreak_col`` (must be unique within a partition)
so ranks are deterministic and match SQL's ``ORDER BY v, tiebreak``.

Skew caveat: the shape bounds tasks by (partition, value-range bin), so a
partition whose ORDER key is (near-)constant collapses into one bin and
one bucket — for such keys pre-salt the value or accept the single-task
partition. NaN order keys and NULL weights are rejected loudly (their
silent int casts are undefined and would diverge from the SQL oracles).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_NULL_KEY = "\x00NULL"  # canonical partition key for NULL (collision-safe prefix)


def _part_keys(vals) -> np.ndarray:
    """Canonical string keys for partition values: supports non-string
    partition columns and keeps NULL as its own partition (pandas groupby
    would silently drop it; a stringified None would collide with
    'None'). Vectorized via Arrow cast (r5 — was a per-row Python loop
    in every histogram/bucketize body); the key REPRESENTATION is
    internal, so the only requirement is that the histogram and the scan
    derive keys from the SAME exact values. The histogram bodies call
    this on the exact Arrow column; the scan bodies do NOT re-derive
    from their pandas frame (a bucket slice containing a null arrives
    int64->float64-converted, which rounds ids >= 2^53 to a DIFFERENT
    key) — bucketize computes the key once and carries it through the
    shuffle as the ``_pk`` column. Float NaN maps to the NULL
    partition, matching the old loop."""
    arr = vals if isinstance(vals, (pa.Array, pa.ChunkedArray)) else pa.array(vals)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_floating(arr.type):
        if arr.type == pa.float16():  # no is_nan kernel for halffloat
            arr = pc.cast(arr, pa.float32())
        arr = pc.if_else(pc.is_nan(arr), pa.scalar(None, arr.type), arr)
    keys = pc.fill_null(pc.cast(arr, pa.string()), _NULL_KEY)
    return keys.to_numpy(zero_copy_only=False)


def _checked_values(t: pa.Table, value_col: str) -> np.ndarray:
    v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
    if np.isnan(v).any():
        raise ValueError(
            f"partitioned ranking: NULL/NaN in order column {value_col!r} — "
            "the range-bin cast is undefined for NaN and SQL NULL ordering "
            "is not implemented; filter or fill first"
        )
    return v


def partitioned_rank(
    ds,
    *,
    part_col: str,
    value_col: str,
    tiebreak_col: str,
    out_cols: list[str],
    num_buckets: int | None = None,
    ntile: int | None = None,
    emit_count: bool = False,
):
    """Append ``rn`` (1-based row_number per ``part_col`` ordered by
    ``(value_col, tiebreak_col)``) — and ``tile`` when ``ntile`` is set,
    with SQL NTILE semantics (sizes differ by at most one, larger tiles
    first); ``emit_count`` adds ``n_part`` (the partition's row count,
    for percent_rank / cume_dist arithmetic downstream). Returns a
    Dataset with ``out_cols + [rn (+ tile) (+ n_part)]``.
    """
    import ray
    from ray.data.aggregate import Max, Min

    from ocr_ray.sizing import default_buckets

    nb = num_buckets or default_buckets()
    bins = 1024

    # ADAPTIVE uniform binning (not the selection primitives' bit-pattern
    # key): ranking shuffles EVERY row through its (part, bin) cells, so
    # cell size must track the data's actual range — a narrow-range key
    # under fixed bit-pattern bins would concentrate a whole partition
    # into one cell (the straggler this module exists to prevent). The
    # min/max pass is one cheap scan; the expensive part (the histogram
    # fold) stays bucketed.
    mm = ds.aggregate(Min(value_col), Max(value_col))
    if mm is None:
        raise ValueError("partitioned_rank: empty input dataset")
    lo, hi = float(mm[f"min({value_col})"]), float(mm[f"max({value_col})"])
    span = max(hi - lo, 1e-300)

    def bin_of(v: np.ndarray) -> np.ndarray:
        return np.clip((v - lo) / span * bins, 0, bins - 1).astype(np.int64)

    def hist(t: pa.Table) -> pa.Table:
        v = _checked_values(t, value_col)
        df = pd.DataFrame({"part": _part_keys(t[part_col]), "bin": bin_of(v)})
        red = df.groupby(["part", "bin"], sort=False).size().reset_index(name="count")
        return pa.table(
            {
                "part": pa.array(red["part"], type=pa.string()),
                "bin": pa.array(red["bin"].to_numpy(dtype=np.int64)),
                "count": pa.array(red["count"].to_numpy(dtype=np.int64)),
            }
        )

    from ocr_ray.functions.relational import bucketed_aggregate

    merged = bucketed_aggregate(
        ds.map_batches(hist, batch_format="pyarrow"),
        keys=["part", "bin"],
        aggs={"count": ("count", "sum")},
    ).to_pandas()
    if len(merged) == 0:
        raise ValueError("partitioned_rank: empty input dataset")

    # exclusive prefix: rows of the partition strictly before each bin
    offsets: dict[tuple[str, int], int] = {}
    totals: dict[str, int] = {}
    for g, sub in merged.groupby("part"):
        sub = sub.sort_values("bin")
        cum = np.concatenate([[0], np.cumsum(sub["count"].to_numpy(dtype=np.int64))])
        for b, off in zip(sub["bin"].to_numpy(dtype=np.int64), cum[:-1]):
            offsets[(g, int(b))] = int(off)
        totals[g] = int(cum[-1])
    state_ref = ray.put((offsets, totals))

    def bucketize(t: pa.Table) -> pa.Table:
        v = _checked_values(t, value_col)
        b = bin_of(v)
        pk = _part_keys(t[part_col])
        part_h = pd.util.hash_array(pk)
        key = (part_h.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) + b.astype(np.uint64)
        t = t.append_column("_bin", pa.array(b))
        # the key string rides the shuffle: the group body must NOT
        # re-derive it from its pandas frame (null-bearing int64 slices
        # arrive as float64 — ids >= 2^53 would key differently)
        t = t.append_column("_pk", pa.array(pk, type=pa.string()))
        return t.append_column("_bucket", pa.array((key % np.uint64(nb)).astype(np.int32)))

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        from ocr_ray.functions.relational import _prepared

        offs, tots = _prepared((state_ref.hex(), "rank_state"), lambda: __import__("ray").get(state_ref))
        if len(g) == 0:
            cols = {c: [] for c in out_cols}
            cols["rn"] = pd.Series([], dtype=np.int64)
            if ntile:
                cols["tile"] = pd.Series([], dtype=np.int64)
            if emit_count:
                cols["n_part"] = pd.Series([], dtype=np.int64)
            return pd.DataFrame(cols)
        g = g.sort_values(["_pk", "_bin", value_col, tiebreak_col], kind="mergesort")
        parts = g["_pk"].to_numpy()
        bins_a = g["_bin"].to_numpy(dtype=np.int64)
        # cell boundaries: consecutive rows of the same (part, bin)
        new = np.empty(len(g), dtype=bool)
        new[0] = True
        new[1:] = (parts[1:] != parts[:-1]) | (bins_a[1:] != bins_a[:-1])
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(g)))
        cell_off = np.array(
            [offs[(parts[s], int(bins_a[s]))] for s in starts], dtype=np.int64
        )
        within = np.arange(len(g), dtype=np.int64) - np.repeat(starts, sizes)
        rn = np.repeat(cell_off, sizes) + within + 1
        out = g[out_cols].copy()
        out["rn"] = rn
        if ntile or emit_count:
            # one dict lookup per CELL, repeated — not one per row
            n_part = np.repeat(
                np.array([tots[parts[s]] for s in starts], dtype=np.int64), sizes
            )
        if ntile:
            base, extra = n_part // ntile, n_part % ntile
            big_rows = extra * (base + 1)  # rows covered by the larger tiles
            in_big = rn <= big_rows
            tile = np.where(
                in_big,
                (rn - 1) // (base + 1) + 1,
                extra + np.where(base > 0, (rn - big_rows - 1) // np.maximum(base, 1), 0) + 1,
            )
            out["tile"] = tile.astype(np.int64)
        if emit_count:
            out["n_part"] = n_part
        return out

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(rank_bucket, batch_format="pandas")
    )


def partitioned_prefix_sum(
    ds,
    *,
    part_col: str,
    value_col: str,
    tiebreak_col: str,
    weight_col: str,
    out_cols: list[str],
    num_buckets: int | None = None,
    extra_weight_cols: tuple[str, ...] = (),
):
    """Distributed PREFIX SUM: append ``running_before`` = the sum of
    ``weight_col`` over all rows of the same ``part_col`` that sort
    strictly before this row in ``(value_col, tiebreak_col)`` order —
    SQL's ``SUM(w) OVER (PARTITION BY p ORDER BY v, t ROWS UNBOUNDED
    PRECEDING) - w``. Same two-pass range-bucket shape as
    :func:`partitioned_rank` (histogram of per-bin weight sums, driver
    exclusive scan, one coarse-bucket shuffle with in-cell cumsum), so no
    task ever holds a whole partition. The scan primitive behind
    training-sequence packing, byte-offset assignment, and quota splits.

    ``extra_weight_cols``: additional weight columns scanned IN THE SAME
    PASS (same histogram, same shuffle — the marginal cost is one more
    per-cell sum each); each emits ``running_before_<col>``. A caller
    needing both a rank (weight 1) and a weighted running total (the
    dense_rank/cume_dist pair) pays one pass instead of two.
    """
    import ray
    from ray.data.aggregate import Max, Min

    from ocr_ray.sizing import default_buckets

    nb = num_buckets or default_buckets()
    bins = 1024

    # adaptive uniform binning — see partitioned_rank's note: every row
    # shuffles through the cells, so cell width must track the range
    mm = ds.aggregate(Min(value_col), Max(value_col))
    if mm is None:
        raise ValueError("partitioned_prefix_sum: empty input dataset")
    lo, hi = float(mm[f"min({value_col})"]), float(mm[f"max({value_col})"])
    span = max(hi - lo, 1e-300)

    def bin_of(v: np.ndarray) -> np.ndarray:
        return np.clip((v - lo) / span * bins, 0, bins - 1).astype(np.int64)

    def _weights(t_or_g, col):
        # float weight columns sum in float64 (the previous int64 cast
        # silently truncated fractional weights); integer weights stay
        # int64-exact. Dtype comes from the batch itself (ds.schema() may
        # execute the plan or return a pandas block schema).
        w = (
            t_or_g[col].to_numpy(zero_copy_only=False)
            if isinstance(t_or_g, pa.Table)
            else t_or_g[col].to_numpy()
        )
        if w.dtype.kind == "f":
            if np.isnan(w).any():
                raise ValueError(
                    f"partitioned_prefix_sum: NULL/NaN in weight column {col!r}"
                )
            return w.astype(np.float64)
        return w.astype(np.int64)

    wcols = [weight_col, *extra_weight_cols]
    wnames = ["w"] + [f"w{i}" for i in range(1, len(wcols))]

    def hist(t: pa.Table) -> pa.Table:
        v = _checked_values(t, value_col)
        cols = {
            "part": _part_keys(t[part_col]),
            "bin": bin_of(v),
        }
        for nm, wc in zip(wnames, wcols):
            cols[nm] = _weights(t, wc)
        df = pd.DataFrame(cols)
        red = df.groupby(["part", "bin"], sort=False)[wnames].sum().reset_index()
        out = {
            "part": pa.array(red["part"], type=pa.string()),
            "bin": pa.array(red["bin"].to_numpy(dtype=np.int64)),
        }
        for nm in wnames:
            out[nm] = pa.array(red[nm].to_numpy())
        return pa.table(out)

    from ocr_ray.functions.relational import bucketed_aggregate

    merged = bucketed_aggregate(
        ds.map_batches(hist, batch_format="pyarrow"),
        keys=["part", "bin"],
        aggs={nm: (nm, "sum") for nm in wnames},
    ).to_pandas()
    if len(merged) == 0:
        raise ValueError("partitioned_prefix_sum: empty input dataset")

    wdtypes = [
        np.float64 if merged[nm].dtype.kind == "f" else np.int64 for nm in wnames
    ]
    wdtype = wdtypes[0]
    offsets: dict = {}
    for g, sub in merged.groupby("part"):
        sub = sub.sort_values("bin")
        cums = [
            np.concatenate([[0], np.cumsum(sub[nm].to_numpy(dtype=dt))])
            for nm, dt in zip(wnames, wdtypes)
        ]
        for j, b in enumerate(sub["bin"].to_numpy(dtype=np.int64)):
            offsets[(g, int(b))] = tuple(c[j].item() for c in cums)
    state_ref = ray.put(offsets)
    out_names = ["running_before"] + [f"running_before_{c}" for c in wcols[1:]]

    def bucketize(t: pa.Table) -> pa.Table:
        v = _checked_values(t, value_col)
        b = bin_of(v)
        pk = _part_keys(t[part_col])
        part_h = pd.util.hash_array(pk)
        key = (part_h.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) + b.astype(np.uint64)
        t = t.append_column("_bin", pa.array(b))
        t = t.append_column("_pk", pa.array(pk, type=pa.string()))  # see partitioned_rank
        return t.append_column("_bucket", pa.array((key % np.uint64(nb)).astype(np.int32)))

    def scan_bucket(g: pd.DataFrame) -> pd.DataFrame:
        from ocr_ray.functions.relational import _prepared

        offs = _prepared((state_ref.hex(), "scan_state"), lambda: __import__("ray").get(state_ref))
        if len(g) == 0:
            cols = {c: [] for c in out_cols}
            for nm, dt in zip(out_names, wdtypes):
                cols[nm] = pd.Series([], dtype=dt)
            return pd.DataFrame(cols)
        g = g.sort_values(["_pk", "_bin", value_col, tiebreak_col], kind="mergesort")
        parts = g["_pk"].to_numpy()
        bins_a = g["_bin"].to_numpy(dtype=np.int64)
        new = np.empty(len(g), dtype=bool)
        new[0] = True
        new[1:] = (parts[1:] != parts[:-1]) | (bins_a[1:] != bins_a[:-1])
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(g)))
        out = g[out_cols].copy()
        for k, (nm, wc, dt) in enumerate(zip(out_names, wcols, wdtypes)):
            w = _weights(g, wc)
            cell_off = np.array(
                [offs[(parts[s], int(bins_a[s]))][k] for s in starts], dtype=dt
            )
            cum = np.cumsum(w) - w  # inclusive-before within the whole frame
            # subtract the running total at each cell start -> cell-local
            cum_local = cum - np.repeat(cum[starts], sizes)
            out[nm] = np.repeat(cell_off, sizes) + cum_local
        return out

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(scan_bucket, batch_format="pandas")
    )
