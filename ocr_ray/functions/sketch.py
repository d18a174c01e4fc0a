"""Cardinality sketches — HyperLogLog over Ray Data.

The sketch is expressed as the engine's standard partial+final aggregate
shape (the reference's tree-reduction user pattern,
``/root/reference/examples/treesum_2level/treesum_2level.c:56-142``):

1. ``hll_partial_registers``: per batch, hash keys, split into
   (register index, rho = leading-zero rank), reduce to the per-batch max
   per (group, register) — the combiner, so the shuffle carries at most
   ``groups x NUM_REGISTERS`` rows per batch regardless of batch size;
2. a tiny ``groupby(group, register).aggregate(Max)`` merges partials;
3. ``hll_estimate``: harmonic-mean estimate with linear-counting
   correction for small cardinalities (the regime of the test corpus).

Fully deterministic (seeded 64-bit mix hash), vectorized end to end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

P_BITS = 8  # 2^8 = 256 registers
NUM_REGISTERS = 1 << P_BITS
_ALPHA = 0.7213 / (1 + 1.079 / NUM_REGISTERS)  # standard HLL bias constant


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — deterministic across processes."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def _rho(tail: np.ndarray, width: int) -> np.ndarray:
    """Position of the first 1-bit (1-based) in the low ``width`` bits."""
    out = np.full(len(tail), width + 1, dtype=np.int32)
    found = np.zeros(len(tail), dtype=bool)
    for bit in range(width):
        hit = ~found & (((tail >> np.uint64(bit)) & np.uint64(1)) == 1)
        out[hit] = bit + 1
        found |= hit
    return out


def hll_partial_registers(batch: pa.Table, *, group_col: str = "event_type", key_col: str = "user_id") -> pa.Table:
    """One batch -> per-(group, register) max rho rows (the combiner)."""
    import pyarrow.compute as pc

    valid = pc.is_valid(batch[key_col])
    if not pc.all(valid).as_py():
        batch = batch.filter(valid)  # SQL COUNT(DISTINCT) ignores NULL keys
    keys = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
    h = _mix64(keys.astype(np.uint64))
    reg = (h >> np.uint64(64 - P_BITS)).astype(np.int64)
    rho = _rho(h, 64 - P_BITS).astype(np.int64)
    groups = np.asarray(batch[group_col].to_pylist(), dtype=object)

    df = pd.DataFrame({"event_type": groups, "register": reg, "rho": rho})
    # dropna=False: a NULL group is a group in SQL GROUP BY
    red = df.groupby(["event_type", "register"], sort=False, dropna=False)["rho"].max().reset_index()
    return pa.table(
        {
            "event_type": pa.array(red["event_type"], type=pa.string()),
            "register": pa.array(red["register"].to_numpy(dtype=np.int64)),
            "rho": pa.array(red["rho"].to_numpy(dtype=np.int64)),
        }
    )


MG_CAPACITY = 256


def misra_gries_partial(batch: pa.Table, *, col: str = "text", k: int = MG_CAPACITY) -> pa.Table:
    """Misra-Gries summary of one batch's token stream (bounded to ``k``
    counters). Summaries merge by counter addition and keep the
    frequent-item guarantee (any item with global frequency > N/k appears
    in the merged summary); counts are lower bounds, so callers recount
    the surviving candidates exactly."""
    import pyarrow.compute as pc

    toks = pc.split_pattern(batch[col], " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    vc = pc.value_counts(pc.list_flatten(toks))  # Arrow kernel, no Python strs
    counts = pd.Series(
        pc.struct_field(vc, "counts").to_numpy(zero_copy_only=False),
        index=pc.struct_field(vc, "values").to_pylist(),
    ).sort_values(ascending=False, kind="mergesort")
    if len(counts) > k:
        # decrement-by-threshold: subtract the (k+1)-th largest count from
        # all, keep positives — the batched equivalent of MG decrements.
        thresh = counts.iloc[k]
        counts = (counts - thresh).iloc[:k]
        counts = counts[counts > 0]
    return pa.table(
        {
            "token": pa.array(counts.index, type=pa.string()),
            "count": pa.array(counts.to_numpy(dtype=np.int64)),
        }
    )


def histogram_partial(
    batch: pa.Table, *, col: str, lo: float, hi: float, bins: int = 4096
) -> pa.Table:
    """Fixed-range histogram of one batch (the mergeable quantile summary:
    histograms merge by addition). Range [lo, hi] comes from a cheap
    min/max pre-pass; values outside clamp to the edge bins."""
    v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
    v = v[np.isfinite(v)]  # NULL/NaN contributes to no bin (SQL ignores it)
    # clamp the FLOAT first: a value far outside [lo, hi] would overflow
    # the int64 cast and wrap to the bottom bin instead of the edge bin
    pos = np.clip((v - lo) / max(hi - lo, 1e-300) * bins, 0, bins - 1)
    counts = np.bincount(pos.astype(np.int64), minlength=bins)
    nz = np.flatnonzero(counts)
    return pa.table(
        {
            "bin": pa.array(nz.astype(np.int64)),
            "count": pa.array(counts[nz].astype(np.int64)),
        }
    )


def histogram_quantiles(
    merged: pd.DataFrame, qs: list[float], *, lo: float, hi: float, bins: int = 4096
) -> list[float]:
    """Quantiles from merged histogram rows (linear interpolation within a
    bin — error bounded by bin width (hi-lo)/bins)."""
    counts = np.zeros(bins, dtype=np.int64)
    agg = merged.groupby("bin")["count"].sum()
    counts[agg.index.to_numpy(dtype=np.int64)] = agg.to_numpy(dtype=np.int64)
    cum = np.cumsum(counts)
    n = cum[-1]
    if n == 0:
        return [float("nan")] * len(qs)
    width = (hi - lo) / bins
    out = []
    for q in qs:
        target = q * (n - 1)
        b = int(np.searchsorted(cum, target + 1))
        prev = cum[b - 1] if b > 0 else 0
        inside = (target - prev) / max(counts[b], 1)
        out.append(lo + (b + inside) * width)
    return out


def _bitpattern_bin_of(v: np.ndarray) -> np.ndarray:
    """Data-INDEPENDENT monotone binning for the distributed-selection
    primitives: the top 18 bits of the sign-flipped IEEE-754 pattern
    (sign, exponent, top-6 mantissa bits). Order-preserving, ~64 bins
    per occupied octave, and — unlike uniform [lo, hi] binning — it
    needs no min/max pre-pass, which removes one full data pass per
    selection. int64 inputs cast to float64 exactly below 2^53."""
    u = np.ascontiguousarray(v.astype(np.float64)).view(np.uint64)
    # -0.0 -> +0.0: the only EQUAL values with different bit patterns;
    # selection consumers need equal values to share a bin
    u = np.where(u == np.uint64(1 << 63), np.uint64(0), u)
    neg = (u >> np.uint64(63)) == 1
    k = np.where(neg, ~u, u | np.uint64(1 << 63))
    return (k >> np.uint64(64 - 18)).astype(np.int64)


bitpattern_bin_of = _bitpattern_bin_of  # public alias


def grouped_exact_median(
    ds,
    *,
    group_col: str,
    value_col: str,
    bins: int = 4096,
    value_range: tuple | None = None,
) -> pd.DataFrame:
    """EXACT per-group median without ever holding a whole group in one
    task (the round-1 ``groupby.map_groups`` held O(table/groups) rows —
    the canonical low-cardinality-key skew killer). Two streaming passes
    (plus none for min/max — the default bit-pattern binning is
    data-independent; a caller-supplied ``value_range`` switches to
    uniform bins over that range):

    1. per-(group, bin) histogram — map-side combine, bucketed fold,
       driver gets <= groups x bins-present rows;
    2. exact values of ONLY the bracketing bin(s) per group (broadcast
       (group, bin) filter), then exact order-statistic selection
       driver-side on those cells.

    Matches ``median()`` semantics (even counts average the two middle
    values). Degenerate distributions (all values in one bin) fall back to
    fetching that bin — document the skew, don't hide it.
    Returns DataFrame (group_col, median, n).
    """
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    if value_range is not None:
        # caller already knows a bounding range (e.g. deviations from a
        # prior median lie in [0, max-min]) — uniform bins over it. Bounds
        # only affect BIN PLACEMENT, never exactness: pass 3 recounts the
        # bracketing bins' true values, and bin_of clamps outliers into
        # the edge bins, so a loose range degrades selectivity, not
        # correctness.
        lo, hi = float(value_range[0]), float(value_range[1])
        span = max(hi - lo, 1e-300)

        def bin_of(v: np.ndarray) -> np.ndarray:
            # clamp the FLOAT before the int cast (out-of-range would
            # overflow and wrap to bin 0); callers filter NaN first
            return np.clip((v - lo) / span * bins, 0, bins - 1).astype(np.int64)

    else:
        # no range known: barrier-free monotone bit-pattern binning
        bin_of = _bitpattern_bin_of

    def hist(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = np.isfinite(v)  # NULL/NaN values contribute to no quantile (SQL)
        if not ok.all():
            t = t.filter(pa.array(ok))
            v = v[ok]
        df = pd.DataFrame({group_col: t[group_col].to_pylist(), "bin": bin_of(v)})
        red = df.groupby([group_col, "bin"], sort=False).size().reset_index(name="count")
        return pa.table(
            {
                group_col: pa.array(red[group_col], type=pa.string()),
                "bin": pa.array(red["bin"].to_numpy(dtype=np.int64)),
                "count": pa.array(red["count"].to_numpy(dtype=np.int64)),
            }
        )

    from ocr_ray.functions.relational import bucketed_aggregate

    merged = bucketed_aggregate(
        ds.map_batches(hist, batch_format="pyarrow"),
        keys=[group_col, "bin"],
        aggs={"count": ("count", "sum")},
    ).to_pandas()

    needed: dict[str, set[int]] = {}
    plan: dict[str, dict] = {}
    for g, sub in merged.groupby(group_col):
        sub = sub.sort_values("bin")
        bvals = sub["bin"].to_numpy(dtype=np.int64)
        counts = sub["count"].to_numpy(dtype=np.int64)
        cum = np.cumsum(counts)
        n = int(cum[-1])
        targets = [(n - 1) // 2, n // 2]
        below: dict[int, int] = {}
        for pos in targets:
            j = int(np.searchsorted(cum, pos + 1))
            b = int(bvals[j])
            needed.setdefault(g, set()).add(b)
            below[b] = int(cum[j - 1]) if j > 0 else 0
        plan[g] = {"n": n, "targets": targets, "below": below}

    needed_ref = ray.put(needed)

    # task-pool stage with the per-worker _prepared cache: an ACTOR pool
    # here costs its spin-up (2-4 s) per median call — two calls per MAD
    # query — for state that is just a broadcast (group, bin) set
    from ocr_ray.functions.relational import _prepared

    def cell_filter(t: pa.Table) -> pa.Table:
        pairs = _prepared(
            ("median_cells", needed_ref.hex()),
            lambda: frozenset(
                (g, b) for g, bs in ray.get(needed_ref).items() for b in bs
            ),
        )
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        b = bin_of(v)
        groups = t[group_col].to_pylist()
        keep = pd.MultiIndex.from_arrays([groups, b]).isin(pairs)
        ft = t.filter(pa.array(keep))
        return pa.table(
            {
                group_col: ft[group_col],
                "bin": pa.array(b[keep]),
                "value": pc.cast(ft[value_col], pa.float64()),
            }
        )

    cells = ds.map_batches(cell_filter, batch_format="pyarrow").to_pandas()

    out_g, out_m, out_n = [], [], []
    for g, p in plan.items():
        picked = []
        gc = cells[cells[group_col] == g]
        for pos in p["targets"]:
            # the bin holding this order statistic (recompute as above)
            for b, below in p["below"].items():
                cnt = int((gc["bin"] == b).sum())
                if below <= pos < below + cnt:
                    vals = np.sort(gc.loc[gc["bin"] == b, "value"].to_numpy())
                    picked.append(float(vals[pos - below]))
                    break
        out_g.append(g)
        out_m.append((picked[0] + picked[1]) / 2.0)
        out_n.append(p["n"])
    return pd.DataFrame({group_col: out_g, "median": out_m, "n": out_n})


def hll_estimate(merged: pd.DataFrame) -> pd.DataFrame:
    """(event_type, register, rho) merged rows -> per-group estimates.

    The harmonic denominator sum(2^-rho_j) is computed in EXACT integer
    arithmetic (S = sum of 2^(57-rho) over all 256 registers, absent
    registers rho=0): every term is a dyadic rational, so S is
    order-independent — which makes the whole estimate reproducible in
    SQL (one HUGEINT sum) and bit-exact vs the DuckDB oracle regardless
    of register iteration order. floor(est + 0.5) avoids Python's
    round-half-to-even vs SQL's round-half-away divergence."""
    import math

    width1 = 64 - P_BITS + 1  # rho range is 1..width+1; 2^(width1-rho) exact
    out_groups: list[str] = []
    out_est: list[int] = []
    for g, sub in merged.groupby("event_type"):
        rho = sub["rho"].to_numpy(dtype=np.int64)
        present = len(rho)  # registers unique after the groupby-max merge
        if present > NUM_REGISTERS:
            raise ValueError(
                f"hll_estimate: group {g!r} has {present} register rows > "
                f"{NUM_REGISTERS}; merge partials (groupby-max per register) "
                "before estimating"
            )
        s = sum(1 << (width1 - int(r)) for r in rho)
        s += (NUM_REGISTERS - present) << width1
        est = _ALPHA * NUM_REGISTERS**2 * float(1 << width1) / float(s)
        zeros = NUM_REGISTERS - present
        if est <= 2.5 * NUM_REGISTERS and zeros > 0:
            est = NUM_REGISTERS * math.log(NUM_REGISTERS / zeros)  # linear counting
        out_groups.append(g)
        out_est.append(int(math.floor(est + 0.5)))
    return pd.DataFrame({"event_type": out_groups, "approx_users": out_est})


def grouped_exact_quantiles(
    ds, *, group_col: str, value_col: str, qs: tuple[float, ...]
) -> pd.DataFrame:
    """EXACT per-group discrete quantiles (``quantile_disc`` semantics:
    order statistic at index ``ceil(q*n) - 1``) with the same two-pass
    distributed-selection shape as ``grouped_exact_median`` — no task ever
    holds a whole group:

    1. per-(group, bin) histogram on the monotone bit-pattern key
       (data-independent — no min/max barrier), map-side combined,
       bucketed fold (driver sees <= groups x bins-present rows);
    2. broadcast-filter fetch of ONLY the bracketing bins, exact
       selection inside each fetched cell.

    Returns a DataFrame ``(group_col, q_<pct>..., n)``.
    """
    import pyarrow.compute as pc
    import ray

    bin_of = _bitpattern_bin_of

    def hist(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = np.isfinite(v)  # NULL/NaN values contribute to no quantile (SQL)
        if not ok.all():
            t = t.filter(pa.array(ok))
            v = v[ok]
        df = pd.DataFrame({group_col: t[group_col].to_pylist(), "bin": bin_of(v)})
        red = df.groupby([group_col, "bin"], sort=False).size().reset_index(name="count")
        return pa.table(
            {
                group_col: pa.array(red[group_col], type=pa.string()),
                "bin": pa.array(red["bin"].to_numpy(dtype=np.int64)),
                "count": pa.array(red["count"].to_numpy(dtype=np.int64)),
            }
        )

    from ocr_ray.functions.relational import bucketed_aggregate

    merged = bucketed_aggregate(
        ds.map_batches(hist, batch_format="pyarrow"),
        keys=[group_col, "bin"],
        aggs={"count": ("count", "sum")},
    ).to_pandas()

    # plan: per group, the order-statistic target index of every quantile
    # and the bin that contains it (+ count of values below that bin)
    needed: dict[str, set[int]] = {}
    plan: dict[str, dict] = {}
    for g, sub in merged.groupby(group_col):
        sub = sub.sort_values("bin")
        bvals = sub["bin"].to_numpy(dtype=np.int64)
        counts = sub["count"].to_numpy(dtype=np.int64)
        cum = np.cumsum(counts)
        n = int(cum[-1])
        targets = [max(int(np.ceil(q * n)) - 1, 0) for q in qs]
        below: dict[int, int] = {}
        for pos in targets:
            j = int(np.searchsorted(cum, pos + 1))
            b = int(bvals[j])
            needed.setdefault(g, set()).add(b)
            below[b] = int(cum[j - 1]) if j > 0 else 0
        plan[g] = {"n": n, "targets": targets, "below": below}

    needed_ref = ray.put(needed)

    def cell_filter(t: pa.Table) -> pa.Table:
        from ocr_ray.functions.relational import _prepared

        pairs = _prepared(
            ("qcells", needed_ref.hex()),
            lambda: [(g, b) for g, bs in ray.get(needed_ref).items() for b in bs],
        )
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        b = bin_of(v)
        groups = t[group_col].to_pylist()
        keep = pd.MultiIndex.from_arrays([groups, b]).isin(pairs)
        ft = t.filter(pa.array(keep))
        return pa.table(
            {
                group_col: ft[group_col],
                "bin": pa.array(b[keep]),
                "value": pc.cast(ft[value_col], pa.float64()),
            }
        )

    cells = ds.map_batches(cell_filter, batch_format="pyarrow").to_pandas()

    rows: list[dict] = []
    for g, p in plan.items():
        gc = cells[cells[group_col] == g]
        row: dict = {group_col: g}
        for q, pos in zip(qs, p["targets"]):
            for b, below in p["below"].items():
                cnt = int((gc["bin"] == b).sum())
                if below <= pos < below + cnt:
                    vals = np.sort(gc.loc[gc["bin"] == b, "value"].to_numpy())
                    row[f"q_{int(round(q * 100))}"] = float(vals[pos - below])
                    break
        row["n"] = p["n"]
        rows.append(row)
    cols = [group_col] + [f"q_{int(round(q * 100))}" for q in qs] + ["n"]
    return pd.DataFrame(rows, columns=cols)


def _grouped_select(ds, *, group_col: str, value_col: str, targets_fn):
    """Shared distributed-selection core: per group, fetch the exact
    values at the order-statistic indices ``targets_fn(n) -> [pos...]``
    (same two passes as ``grouped_exact_median`` — bit-pattern binning,
    no min/max barrier; no task ever holds a whole group). Returns
    ``{group: (n, {pos: value})}``."""
    import pyarrow.compute as pc
    import ray

    bin_of = _bitpattern_bin_of

    def hist(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = np.isfinite(v)  # NULL/NaN values contribute to no quantile (SQL)
        if not ok.all():
            t = t.filter(pa.array(ok))
            v = v[ok]
        df = pd.DataFrame({group_col: t[group_col].to_pylist(), "bin": bin_of(v)})
        red = df.groupby([group_col, "bin"], sort=False).size().reset_index(name="count")
        return pa.table(
            {
                group_col: pa.array(red[group_col], type=pa.string()),
                "bin": pa.array(red["bin"].to_numpy(dtype=np.int64)),
                "count": pa.array(red["count"].to_numpy(dtype=np.int64)),
            }
        )

    from ocr_ray.functions.relational import bucketed_aggregate

    merged = bucketed_aggregate(
        ds.map_batches(hist, batch_format="pyarrow"),
        keys=[group_col, "bin"],
        aggs={"count": ("count", "sum")},
    ).to_pandas()

    needed: dict[str, set[int]] = {}
    plan: dict[str, dict] = {}
    for g, sub in merged.groupby(group_col):
        sub = sub.sort_values("bin")
        bvals = sub["bin"].to_numpy(dtype=np.int64)
        counts = sub["count"].to_numpy(dtype=np.int64)
        cum = np.cumsum(counts)
        n = int(cum[-1])
        targets = sorted(set(targets_fn(n)))
        below: dict[int, int] = {}
        for pos in targets:
            j = int(np.searchsorted(cum, pos + 1))
            b = int(bvals[j])
            needed.setdefault(str(g), set()).add(b)
            below[b] = int(cum[j - 1]) if j > 0 else 0
        plan[str(g)] = {"n": n, "targets": targets, "below": below}

    needed_ref = ray.put(needed)

    def cell_filter(t: pa.Table) -> pa.Table:
        from ocr_ray.functions.relational import _prepared

        pairs = _prepared(
            ("selcells", needed_ref.hex()),
            lambda: [(g, b) for g, bs in ray.get(needed_ref).items() for b in bs],
        )
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        b = bin_of(v)
        groups = t[group_col].to_pylist()
        keep = pd.MultiIndex.from_arrays([groups, b]).isin(pairs)
        ft = t.filter(pa.array(keep))
        return pa.table(
            {
                group_col: ft[group_col],
                "bin": pa.array(b[keep]),
                "value": pc.cast(ft[value_col], pa.float64()),
            }
        )

    cells = ds.map_batches(cell_filter, batch_format="pyarrow").to_pandas()

    out: dict[str, tuple[int, dict[int, float]]] = {}
    for g, p in plan.items():
        gc = cells[cells[group_col] == g]
        picked: dict[int, float] = {}
        for pos in p["targets"]:
            for b, below in p["below"].items():
                cnt = int((gc["bin"] == b).sum())
                if below <= pos < below + cnt:
                    vals = np.sort(gc.loc[gc["bin"] == b, "value"].to_numpy())
                    picked[pos] = float(vals[pos - below])
                    break
        out[g] = (p["n"], picked)
    return out


def grouped_percentile_cont(
    ds, *, group_col: str, value_col: str, qs: tuple[float, ...]
) -> pd.DataFrame:
    """EXACT per-group INTERPOLATED percentiles (SQL ``quantile_cont`` /
    ``percentile_cont`` semantics: linear interpolation between the two
    order statistics bracketing ``h = q*(n-1)``) via the distributed
    selection core — the holistic-aggregate shape with interpolation on
    top; no task ever holds a whole group."""

    def targets(n: int) -> list[int]:
        out = []
        for q in qs:
            h = q * (n - 1)
            out += [int(np.floor(h)), int(np.ceil(h))]
        return out

    sel = _grouped_select(
        ds, group_col=group_col, value_col=value_col, targets_fn=targets
    )
    rows = []
    for g, (n, picked) in sel.items():
        row = {group_col: g}
        for q in qs:
            h = q * (n - 1)
            i0, i1 = int(np.floor(h)), int(np.ceil(h))
            v0, v1 = picked[i0], picked[i1]
            # mirror SQL engines' interpolator op order exactly:
            # (ceil-h)*lo + (h-floor)*hi (not lo + frac*(hi-lo))
            row[f"p_{int(round(q * 100))}"] = v0 if i0 == i1 else (i1 - h) * v0 + (h - i0) * v1
        row["n"] = n
        rows.append(row)
    cols = [group_col] + [f"p_{int(round(q * 100))}" for q in qs] + ["n"]
    return pd.DataFrame(rows, columns=cols).sort_values(group_col).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

CM_DEPTH = 4
CM_WIDTH = 1024
# xor-seeds for the CM hash rows (row 0 is the bare splitmix64)
CM_SEEDS = (
    0,
    0x9E3779B97F4A7C15,
    0xC2B2AE3D27D4EB4F,
    0x165667B19E3779F9,
)


def cm_slots_for(keys: np.ndarray) -> np.ndarray:
    """(len(keys), CM_DEPTH) flat slot ids ``d * CM_WIDTH + w`` where
    ``w = splitmix64(key ^ seed_d) % CM_WIDTH`` — the deterministic
    hash family shared with the SQL oracle."""
    u = keys.astype(np.uint64, copy=False)
    out = np.empty((len(u), CM_DEPTH), dtype=np.int64)
    for d, seed in enumerate(CM_SEEDS):
        h = _mix64(u ^ np.uint64(seed))
        out[:, d] = d * CM_WIDTH + (h % np.uint64(CM_WIDTH)).astype(np.int64)
    return out


def cm_partial(batch: pa.Table, *, key_col: str = "user_id") -> pa.Table:
    """Per-batch Count-Min partial: nonzero (slot, count) rows of the
    depth x width counter matrix — the map-side combine; counters merge
    downstream by slot sum (CM sketches are mergeable by addition)."""
    keys = batch[key_col].to_numpy(zero_copy_only=False)
    slots = cm_slots_for(keys).ravel()
    counts = np.bincount(slots, minlength=CM_DEPTH * CM_WIDTH).astype(np.int64)
    nz = np.flatnonzero(counts)
    return pa.table({"slot": pa.array(nz), "count": pa.array(counts[nz])})


def cm_estimate(counters: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Point estimates ``min_d counter[d][h_d(key)]`` from the merged
    flat counter vector (length CM_DEPTH * CM_WIDTH)."""
    slots = cm_slots_for(keys)
    return counters[slots].min(axis=1)


def grouped_winsorize_stats(
    ds,
    *,
    group_col: str,
    value_col: str,
    q_lo: float,
    q_hi: float,
) -> pd.DataFrame:
    """EXACT per-group winsorization statistics in TWO data passes total
    — two passes fewer than fitting quantiles and then clipping (the
    VERDICT-r3 chained-selection item):

    1. per-(group, bin) histogram carrying COUNT and integer SUM —
       map-side combined, distributed ``groupby.sum`` (bins come from a
       data-independent monotone bit-pattern key, so no min/max
       pre-pass barrier exists);
    2. broadcast-filter fetch of only the bracketing cells.

    The clipped sum needs no extra pass: with per-bin sums,
    ``sum_winsorized = total - sum(v < p_lo) - sum(v > p_hi)
    + n_lo * p_lo + n_hi * p_hi`` where the partial sums split into
    whole-bin prefixes (from the histogram) plus exact in-cell
    corrections (from the fetched bracketing cells). ``value_col`` must
    be int64 (integer units) so every sum is exact; quantiles use
    ``quantile_disc`` semantics (order statistic ``ceil(q*n) - 1``).

    Returns ``(group_col, n, n_clipped_lo, n_clipped_hi,
    sum_winsorized, p_lo, p_hi)`` — all int64.
    """
    import pyarrow.compute as pc
    import ray

    from ocr_ray.functions.relational import _prepared, bucketed_aggregate

    bin_of = _bitpattern_bin_of

    def hist(t: pa.Table) -> pa.Table:
        valid = pc.is_valid(t[value_col])
        if not pc.all(valid).as_py():
            t = t.filter(valid)  # NULL contributes to no quantile (SQL)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame(
            {group_col: t[group_col].to_pylist(), "bin": bin_of(v), "v": v}
        )
        red = (
            df.groupby([group_col, "bin"], sort=False)["v"]
            .agg(["size", "sum"])
            .reset_index()
        )
        return pa.table(
            {
                group_col: pa.array(red[group_col], type=pa.string()),
                "bin": pa.array(red["bin"].to_numpy(dtype=np.int64)),
                "count": pa.array(red["size"].to_numpy(dtype=np.int64)),
                "vsum": pa.array(red["sum"].to_numpy(dtype=np.int64)),
            }
        )

    merged = bucketed_aggregate(
        ds.map_batches(hist, batch_format="pyarrow"),
        keys=[group_col, "bin"],
        aggs={"count": ("count", "sum"), "vsum": ("vsum", "sum")},
    ).to_pandas()

    needed: dict[str, set[int]] = {}
    plan: dict[str, dict] = {}
    for g, sub in merged.groupby(group_col):
        sub = sub.sort_values("bin")
        bvals = sub["bin"].to_numpy(dtype=np.int64)
        counts = sub["count"].to_numpy(dtype=np.int64)
        sums = sub["vsum"].to_numpy(dtype=np.int64)
        cum = np.cumsum(counts)
        cumsum_v = np.cumsum(sums)
        n = int(cum[-1])
        total_sum = int(cumsum_v[-1])
        ginfo: dict = {"n": n, "total_sum": total_sum, "targets": {}}
        for q in (q_lo, q_hi):
            pos = max(int(np.ceil(q * n)) - 1, 0)
            j = int(np.searchsorted(cum, pos + 1))
            b = int(bvals[j])
            needed.setdefault(str(g), set()).add(b)
            ginfo["targets"][q] = {
                "pos": pos,
                "bin": b,
                "below": int(cum[j - 1]) if j > 0 else 0,
                "below_sum": int(cumsum_v[j - 1]) if j > 0 else 0,
                "through_sum": int(cumsum_v[j]),
                "through": int(cum[j]),
            }
        plan[str(g)] = ginfo

    needed_ref = ray.put(needed)

    def cell_filter(t: pa.Table) -> pa.Table:
        pairs = _prepared(
            ("winsorcells", needed_ref.hex()),
            lambda: frozenset(
                (g, b) for g, bs in ray.get(needed_ref).items() for b in bs
            ),
        )
        valid = pc.is_valid(t[value_col])
        if not pc.all(valid).as_py():
            t = t.filter(valid)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = bin_of(v)
        groups = t[group_col].to_pylist()
        keep = pd.MultiIndex.from_arrays([groups, b]).isin(pairs)
        ft = t.filter(pa.array(keep))
        return pa.table(
            {
                group_col: ft[group_col],
                "bin": pa.array(b[keep]),
                "value": pc.cast(ft[value_col], pa.int64()),
            }
        )

    cells = ds.map_batches(cell_filter, batch_format="pyarrow").to_pandas()

    rows: list[dict] = []
    for g, p in plan.items():
        gc = cells[cells[group_col] == g]
        n, total_sum = p["n"], p["total_sum"]
        picked: dict[float, dict] = {}
        for q, ti in p["targets"].items():
            vals = np.sort(gc.loc[gc["bin"] == ti["bin"], "value"].to_numpy(dtype=np.int64))
            pv = int(vals[ti["pos"] - ti["below"]])
            picked[q] = {"p": pv, "vals": vals, "ti": ti}
        lo_i, hi_i = picked[q_lo], picked[q_hi]
        p_lo_v, p_hi_v = lo_i["p"], hi_i["p"]
        # values strictly below p_lo: whole bins below the bracketing bin
        # plus the exact in-cell prefix (int sums — no float anywhere)
        in_lo = lo_i["vals"][lo_i["vals"] < p_lo_v]
        n_below = lo_i["ti"]["below"] + len(in_lo)
        sum_below = lo_i["ti"]["below_sum"] + int(in_lo.sum())
        in_hi = hi_i["vals"][hi_i["vals"] > p_hi_v]
        n_above = (n - hi_i["ti"]["through"]) + len(in_hi)
        sum_above = (total_sum - hi_i["ti"]["through_sum"]) + int(in_hi.sum())
        sum_w = total_sum - sum_below - sum_above + n_below * p_lo_v + n_above * p_hi_v
        rows.append(
            {
                group_col: g,
                "n": n,
                "n_clipped_lo": n_below,
                "n_clipped_hi": n_above,
                "sum_winsorized": sum_w,
                "p_lo": p_lo_v,
                "p_hi": p_hi_v,
            }
        )
    return pd.DataFrame(
        rows,
        columns=[group_col, "n", "n_clipped_lo", "n_clipped_hi", "sum_winsorized", "p_lo", "p_hi"],
    )

