"""Query registry section: ranking_reshape (split from the former monolithic queries.py)."""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ocr_ray.corpus import ensure_corpus
from ocr_ray.functions.relational import hash_join, to_units, units_to_double
from ocr_ray.sizing import buckets_for_input, default_buckets, pool_size
from ocr_ray.sources import read_documents, read_table

from ocr_ray.pipelines.queries._shared import arrow_out, arrow_topk, load_small_table, query, read_docs
from ocr_ray.pipelines.queries.setops_window import orders_pivot_status_by_year


# ---------------------------------------------------------------------------
# Window functions, reshape, exact top-k / distinct, fuzzy + bloom joins
# ---------------------------------------------------------------------------


@query(
    "customer_order_history",
    sql="""
WITH w AS (
  SELECT o_custkey, o_orderkey,
    row_number() OVER win AS rn,
    lag(CAST(o_totalprice AS DECIMAL(18,2))) OVER win AS prev_d,
    CAST(o_totalprice AS DECIMAL(18,2)) AS price_d,
    SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_d
  FROM orders
  WINDOW win AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
)
SELECT o_custkey, o_orderkey, CAST(rn AS BIGINT) AS rn,
  CAST(prev_d AS DOUBLE) AS prev_price,
  CAST(price_d - prev_d AS DOUBLE) AS delta,
  CAST(run_d AS DOUBLE) AS running_spend
FROM w
""",
)
def customer_order_history(sf_dir: str) -> ray.data.Dataset:
    """General window functions over partitions: row_number, lag, lag-delta
    and running sum per customer in order-date order.

    Distributed shape: ONE coarse-bucket shuffle on the partition key, then
    a single vectorized pass per bucket — sort, run boundaries, shifted
    arrays for lag, segmented cumsum (global cumsum minus the value at each
    run start) for the running total. Money stays in integer units through
    the cumsum so the running sum is exact (matches the oracle's DECIMAL
    window sum cast to DOUBLE)."""
    ds = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"]
    )

    nb = np.uint64(buckets_for_input(ds))

    def bucketize(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t["o_custkey"].to_numpy(zero_copy_only=False))
        return t.append_column("_bucket", pa.array((h % nb).astype(np.int32)))

    def body(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort")
        cust = g["o_custkey"].to_numpy()
        units = np.round(g["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
        new = np.empty(len(g), dtype=bool)
        new[0] = True
        new[1:] = cust[1:] != cust[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.concatenate([starts, [len(g)]]))
        rn = np.arange(len(g), dtype=np.int64) - np.repeat(starts, counts) + 1
        prev = np.empty_like(units)
        prev[1:] = units[:-1]
        prev[0] = 0
        cum = np.cumsum(units)
        base = cum - units  # exclusive prefix sum
        running = cum - np.repeat(base[starts], counts)
        prev_price = prev / 100.0
        delta = (units - prev) / 100.0
        prev_price[new] = np.nan
        delta[new] = np.nan
        return pd.DataFrame(
            {
                "o_custkey": cust,
                "o_orderkey": g["o_orderkey"].to_numpy(),
                "rn": rn,
                "prev_price": prev_price,
                "delta": delta,
                "running_spend": running / 100.0,
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(body, batch_format="pandas")
    )


@query(
    "customer_rolling_stats",
    sql="""
WITH w AS (
  SELECT o_custkey, o_orderkey,
    SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      win ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS roll_d,
    COUNT(*) OVER (win ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rn_w,
    lead(CAST(o_totalprice AS DECIMAL(18,2))) OVER win AS next_d,
    first_value(CAST(o_totalprice AS DECIMAL(18,2))) OVER win AS first_d,
    last_value(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      win ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_d
  FROM orders
  WINDOW win AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
)
SELECT o_custkey, o_orderkey,
  CAST(rn_w AS BIGINT) AS roll_n,
  CAST(roll_d AS DOUBLE) AS roll_sum,
  CAST(roll_d AS DOUBLE) / rn_w AS roll_avg,
  CAST(next_d AS DOUBLE) AS next_price,
  CAST(first_d AS DOUBLE) AS first_price,
  CAST(last_d AS DOUBLE) AS last_price
FROM w
""",
)
def customer_rolling_stats(sf_dir: str) -> ray.data.Dataset:
    """Bounded window FRAMES per partition: rolling 3-row sum/avg
    (``ROWS BETWEEN 2 PRECEDING AND CURRENT ROW``), LEAD, FIRST_VALUE
    and full-frame LAST_VALUE per customer in order-date order — the
    frame-clause complement to ``customer_order_history``'s unbounded
    running sum.

    Same distributed shape: ONE coarse-bucket shuffle on the partition
    key, then a single vectorized pass per bucket. The rolling sum is
    the prefix-sum difference ``cum[i] - excl[max(i-2, run_start)]``
    computed on integer money units, so sums are exact and the avg is
    two correctly-rounded float ops in the same order as the oracle's
    ``CAST(decimal AS DOUBLE) / count``."""
    ds = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"]
    )

    nb = np.uint64(buckets_for_input(ds))

    def bucketize(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t["o_custkey"].to_numpy(zero_copy_only=False))
        return t.append_column("_bucket", pa.array((h % nb).astype(np.int32)))

    def body(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort")
        cust = g["o_custkey"].to_numpy()
        units = np.round(g["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
        n = len(g)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = cust[1:] != cust[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.concatenate([starts, [n]]))
        run_start = np.repeat(starts, counts)
        run_last = np.repeat(starts + counts - 1, counts)
        idx = np.arange(n, dtype=np.int64)
        cum = np.cumsum(units)
        excl = cum - units  # exclusive prefix sum
        back = np.maximum(idx - 2, run_start)
        roll_units = cum - excl[back]
        roll_n = idx - back + 1
        roll_sum = roll_units / 100.0
        nxt = np.empty(n, dtype=np.float64)
        nxt[:-1] = units[1:] / 100.0
        nxt[-1] = np.nan
        nxt[idx == run_last] = np.nan
        return pd.DataFrame(
            {
                "o_custkey": cust,
                "o_orderkey": g["o_orderkey"].to_numpy(),
                "roll_n": roll_n,
                "roll_sum": roll_sum,
                "roll_avg": roll_sum / roll_n,
                "next_price": nxt,
                "first_price": units[run_start] / 100.0,
                "last_price": units[run_last] / 100.0,
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(body, batch_format="pandas")
    )


@query(
    "customer_window_30d",
    sql="""
WITH w AS (
  SELECT o_custkey, o_orderkey,
    COUNT(*) OVER win AS w30_n,
    SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER win AS w30_d
  FROM orders
  WINDOW win AS (
    PARTITION BY o_custkey ORDER BY o_orderdate
    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
)
SELECT o_custkey, o_orderkey, CAST(w30_n AS BIGINT) AS w30_n,
  CAST(w30_d AS DOUBLE) AS w30_sum,
  CAST(w30_d AS DOUBLE) / w30_n AS w30_avg
FROM w
""",
)
def customer_window_30d(sf_dir: str) -> ray.data.Dataset:
    """Value-based (RANGE) window frames: per customer, the count, sum
    and mean of order totals within the trailing 30-day window of each
    order's date — the time-decayed feature shape (trailing spend) that
    ROWS frames can't express.

    RANGE semantics (the frame spans VALUES, including date peers on
    both bound sides) are reproduced with two vectorized searchsorted
    calls over a composite (custkey << 32 | day) key per bucket — no
    per-row loop, no task holding more than one coarse bucket. Money
    stays integer cents through the prefix sums, so the window sum is
    exact and the mean is the oracle's two correctly-rounded float
    ops."""
    ds = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"]
    )

    nb = np.uint64(buckets_for_input(ds))

    def bucketize(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t["o_custkey"].to_numpy(zero_copy_only=False))
        return t.append_column("_bucket", pa.array((h % nb).astype(np.int32)))

    def body(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort")
        cust = g["o_custkey"].to_numpy()
        day = (g["o_orderdate"].to_numpy().astype("datetime64[D]")).astype(np.int64)
        units = np.round(g["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
        key = cust * (1 << 32) + day
        lo = np.searchsorted(key, cust * (1 << 32) + (day - 30), side="left")
        hi = np.searchsorted(key, key, side="right") - 1
        cum = np.cumsum(units)
        excl = cum - units
        w_units = cum[hi] - excl[lo]
        w_n = hi - lo + 1
        w_sum = w_units / 100.0
        return pd.DataFrame(
            {
                "o_custkey": cust,
                "o_orderkey": g["o_orderkey"].to_numpy(),
                "w30_n": w_n.astype(np.int64),
                "w30_sum": w_sum,
                "w30_avg": w_sum / w_n,
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(body, batch_format="pandas")
    )


@query(
    "orders_unpivot_year_status",
    sql="""
WITH y AS (SELECT DISTINCT CAST(year(o_orderdate) AS BIGINT) AS yr FROM orders),
s AS (SELECT unnest(['O', 'F', 'P']) AS o_orderstatus),
c AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, o_orderstatus, COUNT(*) AS n
  FROM orders GROUP BY 1, 2
)
SELECT y.yr, s.o_orderstatus, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_orders
FROM y CROSS JOIN s
LEFT JOIN c ON c.yr = y.yr AND c.o_orderstatus = s.o_orderstatus
""",
)
def orders_unpivot_year_status(sf_dir: str) -> ray.data.Dataset:
    """UNPIVOT / melt: the wide per-status pivot (one row per year, one
    column per status) back to long form (year, status, count) — the
    reshape inverse of ``orders_pivot_status_by_year``, reusing its plan.
    The melt is a pure per-batch map (each wide row expands to 3 long
    rows), so it adds zero shuffles."""
    wide = orders_pivot_status_by_year(sf_dir)

    def melt(t: pa.Table) -> pa.Table:
        parts = []
        for col, status in (("n_open", "O"), ("n_filled", "F"), ("n_partial", "P")):
            parts.append(
                pa.table(
                    {
                        "yr": t["yr"],
                        "o_orderstatus": pa.array([status] * t.num_rows, type=pa.string()),
                        "n_orders": pc.cast(t[col], pa.int64()),
                    }
                )
            )
        return pa.concat_tables(parts)

    return wide.map_batches(melt, batch_format="pyarrow")


@query(
    "top_tokens_exact",
    sql="""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
), c AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token)
SELECT token, CAST(n AS BIGINT) AS n FROM c ORDER BY n DESC, token LIMIT 50
""",
)
def top_tokens_exact(sf_dir: str) -> ray.data.Dataset:
    """EXACT global top-k by aggregated count (the exact counterpart of the
    Misra-Gries ``frequent_tokens`` sketch): map-side per-batch token
    counts (one Arrow ``group_by`` per batch), ONE ``groupby(token).sum``
    shuffle, then per-block partial top-50 so the final sort touches at
    most ``50 x blocks`` rows instead of the vocabulary."""
    from ray.data.aggregate import Sum

    ds = read_docs(sf_dir, columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        flat = pa.table({"token": pc.list_flatten(toks)})
        out = flat.group_by("token").aggregate([([], "count_all")])
        return out.rename_columns(["token", "n"])

    from ocr_ray.functions.relational import bucketed_aggregate

    counts = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["token"],
        aggs={"n": ("n", "sum")},
    )

    def local_top(t: pa.Table) -> pa.Table:
        out = arrow_topk(t, [("n", "descending"), ("token", "ascending")], 50)
        return out.set_column(
            out.schema.get_field_index("n"), "n", pc.cast(out["n"], pa.int64())
        )

    return (
        counts.map_batches(local_top, batch_format="pyarrow")
        .sort(["n", "token"], descending=[True, False])
        .limit(50)
    )


@query(
    "analyze_orders_stats",
    sql="""
SELECT 'o_custkey' AS col_name, COUNT(*) AS n_rows,
  COUNT(*) - COUNT(o_custkey) AS n_nulls, COUNT(DISTINCT o_custkey) AS n_distinct,
  CAST(MIN(o_custkey) AS DOUBLE) AS min_num, CAST(MAX(o_custkey) AS DOUBLE) AS max_num,
  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
FROM orders
UNION ALL
SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
  COUNT(DISTINCT o_totalprice), MIN(o_totalprice), MAX(o_totalprice), NULL, NULL
FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
  COUNT(DISTINCT o_orderstatus), NULL, NULL, MIN(o_orderstatus), MAX(o_orderstatus)
FROM orders
""",
)
def analyze_orders_stats(sf_dir: str) -> pa.Table:
    """ANALYZE-style table statistics (the optimizer-stats pass every
    warehouse runs): per column — row count, null count, EXACT distinct
    count, min/max. One streaming pass computes the cheap stats as
    per-batch partials; NDV uses the engine's exact-distinct discipline
    (per-batch local dedup → ONE coarse-bucket shuffle on the value so
    every occurrence meets in one bucket → per-bucket dedup + partial
    counts → tiny sum). The driver only ever folds O(columns) rows."""
    from ray.data.aggregate import Max, Min, Sum

    num_cols = ["o_custkey", "o_totalprice"]
    str_cols = ["o_orderstatus"]
    cols = num_cols + str_cols
    ds = read_table(sf_dir, "orders", columns=cols)
    nb = np.uint64(buckets_for_input(ds))

    # -- cheap stats: per-batch partial rows, tiny driver fold --
    def cheap_partial(t: pa.Table) -> pa.Table:
        rows = []
        for c in cols:
            arr = t[c]
            mm = pc.min_max(arr)
            is_num = c in num_cols
            rows.append(
                {
                    "col_name": c,
                    "n_rows": t.num_rows,
                    "n_nulls": arr.null_count,
                    "min_num": float(mm["min"].as_py()) if is_num and t.num_rows else None,
                    "max_num": float(mm["max"].as_py()) if is_num and t.num_rows else None,
                    "min_str": (None if is_num else mm["min"].as_py()),
                    "max_str": (None if is_num else mm["max"].as_py()),
                }
            )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                {
                    "col_name": pa.string(),
                    "n_rows": pa.int64(),
                    "n_nulls": pa.int64(),
                    "min_num": pa.float64(),
                    "max_num": pa.float64(),
                    "min_str": pa.string(),
                    "max_str": pa.string(),
                }
            ),
        )

    cheap = (
        ds.map_batches(cheap_partial, batch_format="pyarrow")
        .groupby("col_name")
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("n_nulls", alias_name="n_nulls"),
            Min("min_num", alias_name="min_num"),
            Max("max_num", alias_name="max_num"),
            Min("min_str", alias_name="min_str"),
            Max("max_str", alias_name="max_str"),
        )
        .to_pandas()
    )

    # -- exact NDV: local dedup -> one value-bucket shuffle -> dedup+count --
    def ndv_prep(t: pa.Table) -> pa.Table:
        # exact-by-construction dedup keys: raw int64 for ints, IEEE-754
        # bits for doubles (bijective — no string-formatting collisions),
        # native strings for strings.
        parts = []
        for c in cols:
            u = pc.unique(pc.drop_null(t[c]))
            n = len(u)
            if c in num_cols:
                vals = u.to_numpy(zero_copy_only=False)
                bits = (
                    vals.view(np.int64)
                    if vals.dtype == np.float64
                    else vals.astype(np.int64)
                )
                vnum = pa.array(bits, type=pa.int64())
                vstr = pa.nulls(n, type=pa.string())
                h = pd.util.hash_array(bits)
            else:
                vnum = pa.nulls(n, type=pa.int64())
                vstr = u
                h = pd.util.hash_array(u.to_numpy(zero_copy_only=False).astype(object))
            parts.append(
                pa.table(
                    {
                        "col_name": pa.array(np.full(n, c, dtype=object), type=pa.string()),
                        "val_num": vnum,
                        "val_str": vstr,
                        "_bucket": pa.array((h % nb).astype(np.int32)),
                    }
                )
            )
        return pa.concat_tables(parts)

    def ndv_count(g: pd.DataFrame) -> pa.Table:
        d = g.drop_duplicates(["col_name", "val_num", "val_str"])
        out = d.groupby("col_name", sort=True).size().reset_index(name="nd")
        out["nd"] = out["nd"].astype(np.int64)
        return arrow_out(
            out[["col_name", "nd"]],
            pa.schema({"col_name": pa.string(), "nd": pa.int64()}),
        )

    ndv = (
        ds.map_batches(ndv_prep, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(ndv_count, batch_format="pandas")
        .groupby("col_name")
        .aggregate(Sum("nd", alias_name="n_distinct"))
        .to_pandas()
    )

    merged = cheap.merge(ndv, on="col_name")
    return pa.table(
        {
            "col_name": pa.array(merged["col_name"], type=pa.string()),
            "n_rows": pa.array(merged["n_rows"].to_numpy(dtype=np.int64)),
            "n_nulls": pa.array(merged["n_nulls"].to_numpy(dtype=np.int64)),
            "n_distinct": pa.array(merged["n_distinct"].to_numpy(dtype=np.int64)),
            "min_num": pa.array(merged["min_num"], type=pa.float64()),
            "max_num": pa.array(merged["max_num"], type=pa.float64()),
            "min_str": pa.array(merged["min_str"], type=pa.string()),
            "max_str": pa.array(merged["max_str"], type=pa.string()),
        }
    )


@query(
    "unigram_lm_score",
    sql="""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
cnt AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
top AS (SELECT w, c FROM cnt ORDER BY c DESC, w ASC LIMIT 64),
hits AS (
  SELECT t.doc_id, CAST(SUM(p.c) AS BIGINT) AS hits
  FROM tok t JOIN top p ON p.w = t.w GROUP BY t.doc_id
),
nt AS (SELECT doc_id, COUNT(*) AS n_tokens FROM tok GROUP BY doc_id)
SELECT d.doc_id, COALESCE(h.hits, 0) AS hits, nt.n_tokens,
  CAST(COALESCE(h.hits, 0) AS DOUBLE) / nt.n_tokens AS lm_score
FROM documents d JOIN nt USING (doc_id) LEFT JOIN hits h USING (doc_id)
""",
)
def unigram_lm_score(sf_dir: str) -> ray.data.Dataset:
    """Unigram language-model quality score — the two-phase FIT +
    TRANSFORM pattern: fit = exact corpus-wide token counts (map-side
    per-batch combine, one groupby shuffle, per-block partial top-64 so
    the final sort touches 64×blocks rows, not the vocabulary), the tiny
    top-64 model broadcast once via ``ray.put``; transform = stateless
    map_batches scoring every doc by the summed corpus frequency of its
    in-vocabulary tokens over its token count. Integer arithmetic until
    ONE final division, so the score is bit-exact vs SQL. At 100 TB the
    broadcast side stays 64 rows regardless of vocabulary size (OOV
    tokens contribute 0, as a fixed-size LM head would)."""
    from ray.data.aggregate import Sum

    from ocr_ray.functions.relational import _prepared, broadcast
    from ocr_ray.functions.text import split_tokens

    docs = read_docs(sf_dir, columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        flat = pa.table({"token": pc.list_flatten(toks)})
        out = flat.group_by("token").aggregate([([], "count_all")])
        return out.rename_columns(["token", "n"])

    from ocr_ray.functions.relational import bucketed_aggregate

    counts = bucketed_aggregate(
        docs.map_batches(partial, batch_format="pyarrow"),
        keys=["token"],
        aggs={"n": ("n", "sum")},
    )

    def local_top(t: pa.Table) -> pa.Table:
        out = arrow_topk(t, [("n", "descending"), ("token", "ascending")], 64)
        return pa.table(
            {
                "token": pc.cast(out["token"], pa.string()),
                "n": pc.cast(out["n"], pa.int64()),
            }
        )

    top = (
        counts.map_batches(local_top, batch_format="pyarrow")
        .sort(["n", "token"], descending=[True, False])
        .limit(64)
        .to_pandas()
    )
    model_ref = broadcast(
        (top["token"].tolist(), top["n"].to_numpy(dtype=np.int64))
    )

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "hits": pa.array([], type=pa.int64()),
                    "n_tokens": pa.array([], type=pa.int64()),
                    "lm_score": pa.array([], type=pa.float64()),
                }
            )
        words, freqs = _prepared(
            ("unigram_lm", model_ref.hex()),
            lambda: (
                lambda m: (pa.array(m[0], type=pa.string()), np.concatenate([m[1], [0]]))
            )(ray.get(model_ref)),
        )
        _, counts_per_doc, flat = split_tokens(t["text"])
        pos = pc.index_in(flat, value_set=words).to_numpy(zero_copy_only=False)
        # null (OOV) -> the trailing 0 slot
        idx = np.where(np.isnan(pos.astype(np.float64)), len(freqs) - 1, pos).astype(
            np.int64
        )
        per_tok = freqs[idx]
        starts = np.zeros(t.num_rows, dtype=np.int64)
        np.cumsum(counts_per_doc[:-1], out=starts[1:])
        hits = np.add.reduceat(per_tok, starts)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "hits": pa.array(hits),
                "n_tokens": pa.array(counts_per_doc),
                "lm_score": pa.array(
                    hits.astype(np.float64) / counts_per_doc.astype(np.float64)
                ),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


@query(
    "mode_priority_by_status",
    sql="""
WITH c AS (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
  FROM orders GROUP BY 1, 2
)
SELECT o_orderstatus, o_orderpriority AS mode_priority, CAST(n AS BIGINT) AS n
FROM c
QUALIFY row_number() OVER (PARTITION BY o_orderstatus ORDER BY n DESC, o_orderpriority) = 1
""",
)
def mode_priority_by_status(sf_dir: str) -> ray.data.Dataset:
    """Per-group MODE (most frequent value, lexicographic tiebreak): map-
    side partial counts on the combined key collapse the shuffle to
    ``|status| x |priority|`` rows, then a tiny per-status argmax."""
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "orders", columns=["o_orderstatus", "o_orderpriority"])

    def partial(t: pa.Table) -> pa.Table:
        out = t.group_by(["o_orderstatus", "o_orderpriority"]).aggregate([([], "count_all")])
        return out.rename_columns(["o_orderstatus", "o_orderpriority", "n"]).set_column(
            2, "n", pc.cast(out["count_all"], pa.int64())
        )

    def argmax(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["n", "o_orderpriority"], ascending=[False, True], kind="mergesort")
        top = g.iloc[:1]
        return arrow_out(
            pd.DataFrame(
                {
                    "o_orderstatus": top["o_orderstatus"].to_numpy(),
                    "mode_priority": top["o_orderpriority"].to_numpy(),
                    "n": top["n"].to_numpy().astype(np.int64),
                }
            ),
            pa.schema(
                {"o_orderstatus": pa.string(), "mode_priority": pa.string(), "n": pa.int64()}
            ),
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(Sum("n", alias_name="n"))
    )
    return (
        counts.map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("n"), "n", pc.cast(t["n"], pa.int64())
            ),
            batch_format="pyarrow",
        )
        .groupby("o_orderstatus")
        .map_groups(argmax, batch_format="pandas")
    )


@query(
    "count_distinct_custs_by_priority",
    sql="""
SELECT o_orderpriority, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs
FROM orders GROUP BY o_orderpriority
""",
)
def count_distinct_custs_by_priority(sf_dir: str) -> ray.data.Dataset:
    """EXACT distributed COUNT(DISTINCT) per group: per-batch local pair
    dedup, coarse-bucket shuffle on the DISTINCT key (every occurrence of a
    custkey meets in one bucket), per-bucket global dedup + per-group
    partial counts, then a tiny ``groupby(group).sum`` — driver never sees
    a key, and the exact counterpart of the HLL sketch
    (``approx_distinct_users``)."""
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "orders", columns=["o_orderpriority", "o_custkey"])
    nb = np.uint64(buckets_for_input(ds))

    def prep(t: pa.Table) -> pa.Table:
        pairs = (
            t.group_by(["o_orderpriority", "o_custkey"])
            .aggregate([([], "count_all")])
            .select(["o_orderpriority", "o_custkey"])
        )
        h = pd.util.hash_array(pairs["o_custkey"].to_numpy(zero_copy_only=False))
        return pairs.append_column("_bucket", pa.array((h % nb).astype(np.int32)))

    def dedup_count(g: pd.DataFrame) -> pa.Table:
        d = g.drop_duplicates(["o_orderpriority", "o_custkey"])
        out = d.groupby("o_orderpriority", sort=True).size().reset_index(name="n")
        out["n"] = out["n"].astype(np.int64)
        return arrow_out(
            out[["o_orderpriority", "n"]],
            pa.schema({"o_orderpriority": pa.string(), "n": pa.int64()}),
        )

    partials = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(dedup_count, batch_format="pandas")
    )
    agg = partials.groupby("o_orderpriority").aggregate(Sum("n", alias_name="n_custs"))
    return agg.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("n_custs"), "n_custs", pc.cast(t["n_custs"], pa.int64())
        ),
        batch_format="pyarrow",
    )


@query(
    "fuzzy_match_parts",
    sql="""
SELECT a.p_partkey AS probe_key, b.p_partkey, b.p_name,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM part a, part b
WHERE a.p_partkey <= 5 AND levenshtein(a.p_name, b.p_name) <= 12
""",
)
def fuzzy_match_parts(sf_dir: str) -> ray.data.Dataset:
    """Fuzzy (edit-distance) semi join with broadcast probes: five probe
    names ship once; the part table streams through a task-pool map_batches
    whose Levenshtein DP is vectorized over the BATCH dimension
    (``functions/fuzzy.py`` — no per-row Python in the ASCII path). The
    distance semantics match DuckDB's ``levenshtein`` exactly."""
    from ocr_ray.functions.fuzzy import levenshtein_to_probe
    from ocr_ray.functions.relational import _prepared

    probes_t = load_small_table(sf_dir, "part", columns=["p_partkey", "p_name"])
    probes_t = probes_t.filter(pc.less_equal(probes_t["p_partkey"], 5))
    probes_ref = ray.put(
        list(zip(probes_t["p_partkey"].to_pylist(), probes_t["p_name"].to_pylist()))
    )

    empty = pa.table(
        {
            "probe_key": pa.array([], type=pa.int64()),
            "p_partkey": pa.array([], type=pa.int64()),
            "p_name": pa.array([], type=pa.string()),
            "dist": pa.array([], type=pa.int64()),
        }
    )

    def match(t: pa.Table) -> pa.Table:
        probes = _prepared(("fuzzy", probes_ref.hex()), lambda: ray.get(probes_ref))
        names = t["p_name"].combine_chunks() if isinstance(t["p_name"], pa.ChunkedArray) else t["p_name"]
        parts = [empty]
        for pkey, pname in probes:
            dist = levenshtein_to_probe(names, pname)
            hit = dist <= 12
            if not hit.any():
                continue
            sel = t.filter(pa.array(hit))
            parts.append(
                pa.table(
                    {
                        "probe_key": pa.array(
                            np.full(int(hit.sum()), pkey, dtype=np.int64)
                        ),
                        "p_partkey": pc.cast(sel["p_partkey"], pa.int64()),
                        "p_name": sel["p_name"],
                        "dist": pa.array(dist[hit]),
                    }
                )
            )
        return pa.concat_tables(parts)

    big = read_table(sf_dir, "part", columns=["p_partkey", "p_name"])
    return big.map_batches(match, batch_format="pyarrow")


@query(
    "semi_join_customers_bloom",
    sql="""
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
""",
)
def semi_join_customers_bloom(sf_dir: str) -> ray.data.Dataset:
    """The same semi join as ``semi_join_customers``, but via the bloom
    path (``functions/bloom.py``): the key side stays a DATASET end to end
    — distributed partial blooms OR-merged on the driver (fixed-size, key-
    cardinality-independent), vectorized may-contain prefilter, then one
    bucketed co-group for exact verification. This is the scale path when
    the key set is too large to broadcast exactly."""
    from ocr_ray.functions.bloom import bloom_semi_join

    keys = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]).map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], pa.scalar(450000.0))).select(
            ["o_custkey"]
        ),
        batch_format="pyarrow",
    )
    return bloom_semi_join(
        read_table(sf_dir, "customer", columns=["c_custkey", "c_name"]),
        keys,
        on="c_custkey",
        right_on="o_custkey",
        num_buckets=default_buckets(),
        left_schema=pa.schema({"c_custkey": pa.int64(), "c_name": pa.string()}),
    )


@query(
    "events_in_windows",
    sql="""
WITH w AS (
  SELECT i AS window_id,
         TIMESTAMP '2024-01-01' + INTERVAL (2 * i) DAY AS ws,
         TIMESTAMP '2024-01-01' + INTERVAL (2 * i) DAY + INTERVAL 60 HOUR AS we
  FROM range(14) t(i)
)
SELECT e.event_id, e.event_type, CAST(w.window_id AS BIGINT) AS window_id
FROM events e JOIN w ON e.ts >= w.ws AND e.ts < w.we
""",
)
def events_in_windows(sf_dir: str) -> ray.data.Dataset:
    """Broadcast INTERVAL join (no equality key): each event matches every
    [start, end) window containing its timestamp; windows overlap, so one
    event can emit multiple rows.

    Distributed shape: the interval set is the broadcast small side; each
    batch finds its matching-window RUN with two vectorized
    ``searchsorted`` calls (intervals sorted by start with equally-sorted
    ends — uniform width — make the match set contiguous; a general
    interval set would use the same stage with an interval tree per
    worker) and emits pairs with a repeat/arange expansion. No shuffle at
    all — the canonical small-side non-equi join."""
    starts = np.array(
        [np.datetime64("2024-01-01") + np.timedelta64(2 * i, "D") for i in range(14)],
        dtype="datetime64[us]",
    )
    ends = starts + np.timedelta64(60, "h")
    windows_ref = ray.put((starts.astype(np.int64), ends.astype(np.int64)))

    def match(t: pa.Table) -> pa.Table:
        from ocr_ray.functions.relational import _prepared

        s, e = _prepared(("windows", windows_ref.hex()), lambda: ray.get(windows_ref))
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        hi = np.searchsorted(s, ts, side="right")  # windows with start <= ts
        lo = np.searchsorted(e, ts, side="right")  # windows with end <= ts
        counts = hi - lo
        total = int(counts.sum())
        row = np.repeat(np.arange(len(ts)), counts)
        cum = np.concatenate([[0], np.cumsum(counts)[:-1]])
        win = np.arange(total) - np.repeat(cum, counts) + np.repeat(lo, counts)
        sel = t.select(["event_id", "event_type"]).take(pa.array(row, type=pa.int64()))
        return sel.append_column("window_id", pa.array(win.astype(np.int64)))

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "event_type"])
    return ds.map_batches(match, batch_format="pyarrow")


@query(
    "weighted_sample_orders",
    sql="""
WITH p AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
    CAST((o_orderkey * 2654435761) % 4294967296 AS DOUBLE) / o_totalprice AS priority
  FROM orders
)
SELECT o_orderkey, o_custkey, o_totalprice, priority FROM p
ORDER BY priority, o_orderkey LIMIT 64
""",
)
def weighted_sample_orders(sf_dir: str) -> ray.data.Dataset:
    """Deterministic weighted PRIORITY sample (selection probability grows
    with o_totalprice): each row gets priority u(key)/weight from an
    arithmetic uniform hash, and the sample is the global bottom-k by
    priority — the same distributed shape as A-ExpJ weighted reservoir
    sampling (compute key -> per-block partial top-k -> tiny merge), with
    an integer-arithmetic key so the oracle is bit-exact (u < 2^32 is an
    exactly representable double; one IEEE division on both sides)."""
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def prio(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        u = (k * np.int64(2654435761)) % np.int64(4294967296)
        w = t["o_totalprice"].to_numpy(zero_copy_only=False)
        out = t.append_column("priority", pa.array(u.astype(np.float64) / w))
        return arrow_topk(
            out, [("priority", "ascending"), ("o_orderkey", "ascending")], 64
        )

    return (
        ds.map_batches(prio, batch_format="pyarrow")
        .sort(["priority", "o_orderkey"])
        .limit(64)
    )


@query(
    "quartiles_by_status",
    sql="""
SELECT o_orderstatus,
  quantile_disc(o_totalprice, 0.25) AS q_25,
  quantile_disc(o_totalprice, 0.50) AS q_50,
  quantile_disc(o_totalprice, 0.75) AS q_75,
  CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY o_orderstatus
""",
)
def quartiles_by_status(sf_dir: str) -> pa.Table:
    """EXACT per-group quartiles (p25/p50/p75, ``quantile_disc``
    semantics) via distributed histogram selection
    (``grouped_exact_quantiles``): the holistic-aggregate scale shape —
    histogram pass + bracketing-bin fetch — never a whole group in one
    task, unlike a naive ``map_groups`` percentile."""
    from ocr_ray.functions.sketch import grouped_exact_quantiles

    ds = read_table(sf_dir, "orders", columns=["o_orderstatus", "o_totalprice"])
    df = grouped_exact_quantiles(
        ds, group_col="o_orderstatus", value_col="o_totalprice", qs=(0.25, 0.5, 0.75)
    )
    df["n"] = df["n"].astype(np.int64)
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


@query(
    "order_price_quartile",
    sql="""
SELECT o_orderkey, o_orderstatus,
  CAST(row_number() OVER w AS BIGINT) AS rn,
  CAST(ntile(4) OVER w AS BIGINT) AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
""",
)
def order_price_quartile(sf_dir: str) -> ray.data.Dataset:
    """Global row_number + NTILE(4) per status — DISTRIBUTED ranking via
    range-bucket + prefix offsets (``functions/ranking.py``): a
    histogram pass builds each partition's bin CDF, then ONE
    coarse-bucket shuffle ranks locally and adds the broadcast offset.
    No task ever holds a whole partition (the low-cardinality-PARTITION
    BY skew shape that a naive map_groups window gets wrong at scale)."""
    from ocr_ray.functions.ranking import partitioned_rank

    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus", "o_totalprice"])
    out = partitioned_rank(
        ds,
        part_col="o_orderstatus",
        value_col="o_totalprice",
        tiebreak_col="o_orderkey",
        out_cols=["o_orderkey", "o_orderstatus"],
        ntile=4,
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "o_orderstatus": t["o_orderstatus"],
                "rn": pc.cast(t["rn"], pa.int64()),
                "quartile": pc.cast(t["tile"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


@query(
    "cube_year_status",
    sql="""
SELECT COALESCE(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS yr,
  COALESCE(o_orderstatus, 'ALL') AS status, COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE (year(o_orderdate), o_orderstatus)
""",
)
def cube_year_status(sf_dir: str) -> pa.Table:
    """GROUP BY CUBE — all four grouping sets folded from ONE distributed
    fine-grained groupby (same partial+final idiom as the ROLLUP entry;
    the three coarser levels are arithmetic over the tiny finest level)."""
    ds = read_table(sf_dir, "orders", columns=["o_orderdate", "o_orderstatus", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "yr": pc.cast(pc.year(t["o_orderdate"]), pa.string()),
                "status": t["o_orderstatus"],
                "price_c": to_units(t["o_totalprice"]),
            }
        )

    from ocr_ray.pipelines.queries._shared import mapside_count_sum

    fine = (
        mapside_count_sum(
            ds.map_batches(prep, batch_format="pyarrow"),
            keys=["yr", "status"],
            sum_cols=["price_c"],
        )
        .to_pandas()
        .rename(columns={"n": "n_orders"})
    )
    by_yr = fine.groupby("yr", as_index=False)[["n_orders", "price_c"]].sum().assign(status="ALL")
    by_st = (
        fine.groupby("status", as_index=False)[["n_orders", "price_c"]].sum().assign(yr="ALL")
    )
    total = pd.DataFrame(
        {"yr": ["ALL"], "status": ["ALL"], "n_orders": [fine["n_orders"].sum()],
         "price_c": [fine["price_c"].sum()]}
    )
    allv = pd.concat([fine, by_yr, by_st, total], ignore_index=True)
    return pa.table(
        {
            "yr": pa.array(allv["yr"], type=pa.string()),
            "status": pa.array(allv["status"], type=pa.string()),
            "n_orders": pa.array(allv["n_orders"].to_numpy(dtype=np.int64)),
            "total_price": pa.array(units_to_double(allv["price_c"], 2)),
        }
    )


@query(
    "part_name_regex",
    sql="""
SELECT p_partkey, regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
  (CASE WHEN regexp_matches(p_name, 'r.d|bl.e') THEN 1 ELSE 0 END) AS has_color
FROM part
""",
)
def part_name_regex(sf_dir: str) -> ray.data.Dataset:
    """Regex scalar functions (extract + match) as zero-copy Arrow
    kernels — both Arrow and DuckDB run RE2, so semantics align; the
    no-match extract maps null -> '' for oracle parity."""
    ds = read_table(sf_dir, "part", columns=["p_partkey", "p_name"])

    def fn(t: pa.Table) -> pa.Table:
        ext = pc.extract_regex(t["p_name"], r"(?P<w>[a-z]+)$")
        last = pc.fill_null(pc.struct_field(ext, "w"), "")
        has = pc.cast(pc.match_substring_regex(t["p_name"], r"r.d|bl.e"), pa.int32())
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "last_word": last,
                "has_color": pc.cast(has, pa.int32()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


@query(
    "orders_customer_salted",
    sql="""
SELECT o_orderkey, c_name FROM orders JOIN customer ON o_custkey = c_custkey
""",
)
def orders_customer_salted(sf_dir: str) -> ray.data.Dataset:
    """SALTED shuffle join — the hot-key mitigation: the build side is
    replicated once per salt, the probe side spreads each key across
    ``SALT`` sub-keys by row hash, and the bucketed join runs on the
    composite (key * SALT + salt) — a single hot customer key now lands
    in SALT buckets instead of one. Oracle: the plain equality join
    (salting never changes the result set)."""
    from ocr_ray.functions.hashing import mix64

    SALT = np.int64(4)
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def salt_probe(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        salt = (mix64(k) % np.uint64(SALT)).astype(np.int64)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"o_orderkey": t["o_orderkey"], "_skey": pa.array(ck * SALT + salt)}
        )

    def replicate_build(t: pa.Table) -> pa.Table:
        n = t.num_rows
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), SALT))
        rep = t.take(idx)
        ck = rep["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        salt = np.tile(np.arange(SALT, dtype=np.int64), n)
        return pa.table({"_skey": pa.array(ck * SALT + salt), "c_name": rep["c_name"]})

    joined = hash_join(
        orders.map_batches(salt_probe, batch_format="pyarrow"),
        cust.map_batches(replicate_build, batch_format="pyarrow"),
        on="_skey",
        left_schema=pa.schema({"o_orderkey": pa.int64(), "_skey": pa.int64()}),
        right_schema=pa.schema({"_skey": pa.int64(), "c_name": pa.string()}),
    )
    return joined.map_batches(
        lambda t: t.select(["o_orderkey", "c_name"]), batch_format="pyarrow"
    )


@query(
    "doc_token_windows",
    sql="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
wins AS (
  SELECT doc_id, CAST(gs.n AS BIGINT) AS win_start,
    array_to_string(w[gs.n+1 : gs.n+32], ' ') AS chunk,
    CAST(least(32, len(w) - gs.n) AS BIGINT) AS n_tokens
  FROM toks, LATERAL (SELECT unnest(range(0, greatest(len(w)-16, 1), 16)) AS n) gs
)
SELECT * FROM wins
""",
)
def doc_token_windows(sf_dir: str) -> ray.data.Dataset:
    """Training-data chunking: 32-token windows with stride 16 per doc —
    fully vectorized byte-slice gather from the original text buffer
    (``functions/text.py::token_windows``); flat_map-shaped expansion
    with no Python per window."""
    from ocr_ray.functions.text import token_windows

    ds = read_docs(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: token_windows(t, window=32, stride=16), batch_format="pyarrow"
    )


@query(
    "percentile_cont_by_status",
    sql="""
SELECT o_orderstatus,
  quantile_cont(o_totalprice, 0.25) AS p_25,
  quantile_cont(o_totalprice, 0.90) AS p_90,
  CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY o_orderstatus
""",
)
def percentile_cont_by_status(sf_dir: str) -> pa.Table:
    """Interpolated percentiles (``percentile_cont`` semantics) via the
    distributed-selection core: histogram CDF -> fetch ONLY the two
    bracketing order statistics per quantile -> interpolate. Exact, and
    no task ever holds a whole group."""
    from ocr_ray.functions.sketch import grouped_percentile_cont

    ds = read_table(sf_dir, "orders", columns=["o_orderstatus", "o_totalprice"])
    df = grouped_percentile_cont(
        ds, group_col="o_orderstatus", value_col="o_totalprice", qs=(0.25, 0.90)
    )
    df["n"] = df["n"].astype(np.int64)
    return pa.Table.from_pandas(
        df.rename(columns={"o_orderstatus": "o_orderstatus"}), preserve_index=False
    ).replace_schema_metadata(None)


@query(
    "funnel_view_click_purchase",
    sql="""
WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e
      JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e
      JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY e.user_id)
SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
FROM v JOIN c ON v.user_id = c.user_id JOIN p ON c.user_id = p.user_id
""",
)
def funnel_view_click_purchase(sf_dir: str) -> ray.data.Dataset:
    """Ordered-funnel analysis (view -> click -> purchase): ONE bucketed
    shuffle on user_id brings each user's events together; the bucket
    body runs the three-step earliest-after chain vectorized (masked
    groupby mins + merges) — the sequential-pattern shape sessionization
    doesn't cover."""
    from ocr_ray.functions.hashing import mix64

    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    nb = buckets_for_input(ds)

    def bucketize(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "_bucket", pa.array((mix64(u) % np.uint64(nb)).astype(np.int32))
        )

    empty = pd.DataFrame(
        {
            "user_id": pd.Series(dtype=np.int64),
            "t_view": pd.Series(dtype="datetime64[us]"),
            "t_click": pd.Series(dtype="datetime64[us]"),
            "t_purchase": pd.Series(dtype="datetime64[us]"),
        }
    )

    def body(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return empty.copy()
        v = (
            g[g["event_type"].eq("view")]
            .groupby("user_id", as_index=False)["ts"]
            .min()
            .rename(columns={"ts": "t_view"})
        )
        c = g[g["event_type"].eq("click")].merge(v, on="user_id")
        c = (
            c[c["ts"] > c["t_view"]]
            .groupby("user_id", as_index=False)
            .agg(t_view=("t_view", "first"), t_click=("ts", "min"))
        )
        p = g[g["event_type"].eq("purchase")].merge(c, on="user_id")
        p = (
            p[p["ts"] > p["t_click"]]
            .groupby("user_id", as_index=False)
            .agg(t_view=("t_view", "first"), t_click=("t_click", "first"), t_purchase=("ts", "min"))
        )
        out = p[["user_id", "t_view", "t_click", "t_purchase"]]
        return out if len(out) else empty.copy()

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(body, batch_format="pandas")
    )


@query(
    "orders_daily_with_gaps",
    sql="""
WITH bounds AS (SELECT CAST(min(o_orderdate) AS DATE) AS lo,
                       CAST(max(o_orderdate) AS DATE) AS hi FROM orders),
spine AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
daily AS (SELECT CAST(o_orderdate AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n_orders
          FROM orders GROUP BY 1)
SELECT strftime(s.day, '%Y-%m-%d') AS day, COALESCE(d.n_orders, 0) AS n_orders
FROM spine s LEFT JOIN daily d ON s.day = d.day
""",
)
def orders_daily_with_gaps(sf_dir: str) -> pa.Table:
    """Date-spine gap filling: distributed per-day counts (map-side
    combine + tiny groupby), then the driver generates the min..max day
    spine (bounded by the date RANGE, not the data) and left-joins the
    aggregate — missing days appear with zero counts."""
    ds = read_table(sf_dir, "orders", columns=["o_orderdate"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"day": pc.cast(t["o_orderdate"], pa.date32())})

    from ocr_ray.pipelines.queries._shared import mapside_count_sum

    daily = (
        mapside_count_sum(
            ds.map_batches(prep, batch_format="pyarrow"), keys=["day"], sum_cols=[]
        )
        .to_pandas()
        .rename(columns={"n": "n_orders"})
    )
    days = pd.to_datetime(daily["day"])
    spine = pd.date_range(days.min(), days.max(), freq="D")
    out = (
        pd.DataFrame({"day": spine})
        .merge(pd.DataFrame({"day": pd.to_datetime(daily["day"]), "n_orders": daily["n_orders"]}),
               on="day", how="left")
        .fillna({"n_orders": 0})
    )
    return pa.table(
        {
            "day": pa.array(out["day"].dt.strftime("%Y-%m-%d"), type=pa.string()),
            "n_orders": pa.array(out["n_orders"].to_numpy(dtype=np.int64)),
        }
    )


@query(
    "error_purchase_same_day",
    sql="""
SELECT e.user_id, strftime(CAST(e.ts AS DATE), '%Y-%m-%d') AS day,
  CAST(COUNT(*) AS BIGINT) AS n_error_purchase_pairs
FROM events e JOIN events p
  ON e.user_id = p.user_id AND CAST(e.ts AS DATE) = CAST(p.ts AS DATE)
WHERE e.event_type = 'error' AND p.event_type = 'purchase'
GROUP BY e.user_id, CAST(e.ts AS DATE)
""",
)
def error_purchase_same_day(sf_dir: str) -> ray.data.Dataset:
    """COMPOSITE-KEY self join (user_id, day): errors x purchases on the
    same user-day, counted inside the join bucket (``bucket_post`` — a
    key tuple lives in exactly one bucket, so the per-key count is exact
    with ONE shuffle)."""
    ev = read_table(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def side(kind: str):
        def fn(t: pa.Table) -> pa.Table:
            keep = pc.equal(t["event_type"], kind)
            ft = t.filter(keep)
            return pa.table(
                {
                    "user_id": pc.cast(ft["user_id"], pa.int64()),
                    "day": pc.cast(pc.cast(ft["ts"], pa.date32()), pa.string()),
                }
            )

        return fn

    errors = ev.map_batches(side("error"), batch_format="pyarrow")
    purchases = ev.map_batches(side("purchase"), batch_format="pyarrow")
    key_schema = pa.schema({"user_id": pa.int64(), "day": pa.string()})

    def count_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby(["user_id", "day"], as_index=False)
            .size()
            .rename(columns={"size": "n_error_purchase_pairs"})
        )
        out["n_error_purchase_pairs"] = out["n_error_purchase_pairs"].astype(np.int64)
        return out

    return hash_join(
        errors,
        purchases,
        on=["user_id", "day"],
        num_buckets=default_buckets(),
        left_schema=key_schema,
        right_schema=key_schema,
        bucket_post=count_pairs,
        post_schema=pa.schema(
            {"user_id": pa.int64(), "day": pa.string(), "n_error_purchase_pairs": pa.int64()}
        ),
    )


@query(
    "anti_join_customers_bloom",
    sql="""
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
""",
)
def anti_join_customers_bloom(sf_dir: str) -> ray.data.Dataset:
    """ANTI join against a NON-broadcastable key side, bloom-accelerated:
    bloom-negative customers pass with zero shuffle (definitely no
    orders); only bloom-positives co-group with the order keys for the
    exact not-in check."""
    from ocr_ray.functions.bloom import bloom_anti_join

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    orders = read_table(sf_dir, "orders", columns=["o_custkey"])
    return bloom_anti_join(
        cust,
        orders,
        on="c_custkey",
        right_on="o_custkey",
        left_schema=pa.schema({"c_custkey": pa.int64(), "c_name": pa.string()}),
    )


@query(
    "pack_token_windows",
    sql="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
wins AS (
  SELECT doc_id, CAST(gs.n AS BIGINT) AS win_start,
    CAST(least(32, len(w) - gs.n) AS BIGINT) AS n_tokens
  FROM toks, LATERAL (SELECT unnest(range(0, greatest(len(w)-16, 1), 16)) AS n) gs
),
ord AS (
  SELECT doc_id, win_start, n_tokens,
    SUM(n_tokens) OVER (ORDER BY doc_id, win_start ROWS UNBOUNDED PRECEDING)
      - n_tokens AS tokens_before
  FROM wins
)
SELECT doc_id, win_start, n_tokens, CAST(tokens_before AS BIGINT) AS tokens_before,
  CAST(tokens_before // 128 AS BIGINT) AS seq_id
FROM ord
""",
)
def pack_token_windows(sf_dir: str) -> ray.data.Dataset:
    """Training-SEQUENCE PACKING: assign each chunk to a fixed-capacity
    sequence by its global running token offset (seq_id =
    tokens_before // 128 in (doc_id, win_start) order) — built on the
    distributed prefix-sum primitive (``partitioned_prefix_sum``:
    range-bucket weight histogram + broadcast exclusive scan + one
    shuffle; no task ever holds the corpus)."""
    from ocr_ray.functions.ranking import partitioned_prefix_sum
    from ocr_ray.functions.text import token_windows

    ds = read_docs(sf_dir, columns=["doc_id", "text"])
    wins = ds.map_batches(
        lambda t: (lambda w: w.append_column("_all", pa.array(["all"] * w.num_rows)))(
            token_windows(t, window=32, stride=16).select(["doc_id", "win_start", "n_tokens"])
        ),
        batch_format="pyarrow",
    )
    scanned = partitioned_prefix_sum(
        wins,
        part_col="_all",
        value_col="doc_id",
        tiebreak_col="win_start",
        weight_col="n_tokens",
        out_cols=["doc_id", "win_start", "n_tokens"],
    )

    def finish(t: pa.Table) -> pa.Table:
        before = t["running_before"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "win_start": pc.cast(t["win_start"], pa.int64()),
                "n_tokens": pc.cast(t["n_tokens"], pa.int64()),
                "tokens_before": pa.array(before),
                "seq_id": pa.array(before // 128),
            }
        )

    return scanned.map_batches(finish, batch_format="pyarrow")


@query(
    "region_nation_cross",
    sql="""
SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
""",
)
def region_nation_cross(sf_dir: str) -> ray.data.Dataset:
    """Cross join (small x small): the right side broadcasts via ray.put
    and each left batch emits the cartesian expansion vectorized — the
    only safe cross-join shape at scale is small-side broadcast."""
    nat = load_small_table(sf_dir, "nation", ["n_name"]).to_pandas()
    nat_ref = ray.put(nat["n_name"].to_numpy(dtype=object))
    reg = read_table(sf_dir, "region", columns=["r_name"])

    def expand(t: pa.Table) -> pa.Table:
        from ocr_ray.functions.relational import _prepared

        names = _prepared(("cross_nat", nat_ref.hex()), lambda: ray.get(nat_ref))
        r = t["r_name"].to_numpy(zero_copy_only=False)
        k = len(names)
        return pa.table(
            {
                "r_name": pa.array(np.repeat(r, k), type=pa.string()),
                "n_name": pa.array(np.tile(names, len(r)), type=pa.string()),
            }
        )

    return reg.map_batches(expand, batch_format="pyarrow")


@query(
    "order_price_percent_rank",
    sql="""
SELECT o_orderkey, o_orderstatus,
  percent_rank() OVER (PARTITION BY o_orderstatus
                       ORDER BY o_totalprice, o_orderkey) AS pct_rank
FROM orders
""",
)
def order_price_percent_rank(sf_dir: str) -> ray.data.Dataset:
    """PERCENT_RANK via the distributed ranking primitive:
    (rn - 1) / (n_part - 1) from the same range-bucket + prefix-offset
    pass as NTILE — exact SQL semantics including the n=1 -> 0 edge."""
    from ocr_ray.functions.ranking import partitioned_rank

    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus", "o_totalprice"])
    out = partitioned_rank(
        ds,
        part_col="o_orderstatus",
        value_col="o_totalprice",
        tiebreak_col="o_orderkey",
        out_cols=["o_orderkey", "o_orderstatus"],
        emit_count=True,
    )

    def finish(t: pa.Table) -> pa.Table:
        rn = t["rn"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n_part"].to_numpy(zero_copy_only=False).astype(np.int64)
        pct = np.where(n > 1, (rn - 1) / np.maximum(n - 1, 1), 0.0)
        return pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "o_orderstatus": t["o_orderstatus"],
                "pct_rank": pa.array(pct, type=pa.float64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


_FRAME_SQL = """
WITH RECURSIVE
src AS (SELECT doc_id AS d, string_split(text, ' ') AS ws FROM documents),
w AS (SELECT d, generate_subscripts(ws, 1) AS i FROM src),
spans AS (SELECT d, (i - 1) // 8 AS si FROM w GROUP BY d, (i - 1) // 8),
media AS (
  SELECT d, si, (d * 1000 + si) % 9973 AS m FROM spans
  WHERE (d + si) % 7 <> 0 AND (d + si) % 5 = 3
),
pw(k, p) AS (
  SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL
  SELECT k+1,
    ((p % 4294967296) * '11400714819323198485'::HUGEINT +
     ((p // 4294967296) * '11400714819323198485'::HUGEINT % 4294967296) * 4294967296
    ) % '18446744073709551616'::HUGEINT
  FROM pw WHERE k < 63
),
b AS (SELECT unnest(generate_series(0, 63)) AS j),
terms AS (
  SELECT d, si, m,
    CAST(CAST((m*37 + 11 + j*7) % 256 AS HUGEINT) * pw.p % 4294967296 AS BIGINT) AS lo,
    CAST(CAST((m*37 + 11 + j*7) % 256 AS HUGEINT) * pw.p
         % '18446744073709551616'::HUGEINT // 4294967296 AS BIGINT) AS hi
  FROM media CROSS JOIN b JOIN pw ON pw.k = 63 - j
)
SELECT printf('doc-%08d', d) AS doc_id, printf('m-%d', m) AS media_ref,
  CAST(0 AS BIGINT) AS frame_id,
  CAST((CAST(SUM(lo) AS HUGEINT) + CAST(SUM(hi) AS HUGEINT) * 4294967296)
       % '18446744073709551616'::HUGEINT AS UBIGINT) AS frame_checksum
FROM terms GROUP BY d, si, m
"""


@query("media_frame_samples", sql=_FRAME_SQL)
def media_frame_samples(sf_dir: str) -> ray.data.Dataset:
    """Video-path frame sampling: media spans -> payloads -> every 4th
    64-byte frame as its own row with a u64 checksum (flat_map-shaped
    buffer-level gather).

    The u64 frame checksum is a Horner polynomial mod 2^64
    (``csum = csum * 0x9E3779B97F4A7C15 + byte``), which the SQL oracle
    reproduces exactly in HUGEINT: a recursive CTE builds the 64
    multiplier powers with a split 32-bit multiply (keeping every
    intermediate < 2^128), per-byte terms are summed as 32-bit halves
    (BIGINT-exact), and the result reduces mod 2^64 into UBIGINT — so
    even the wraparound arithmetic is oracle-checked bit for bit. With
    256-byte payloads and 64-byte frames, every-4th sampling keeps
    exactly frame 0 of each media item."""
    from ocr_ray.stages.explode import explode_documents
    from ocr_ray.stages.media import attach_payloads, media_frame_sample

    corpus = ensure_corpus(sf_dir, glyphs=False)
    flat = read_documents(corpus).map_batches(
        explode_documents, batch_format="pyarrow", fn_kwargs={"sentinels": False}
    ).map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "media")), batch_format="pyarrow"
    )
    frames = flat.map_batches(attach_payloads, batch_format="pyarrow", batch_size=512).map_batches(
        media_frame_sample, batch_format="pyarrow", batch_size=512
    )
    return frames.map_batches(
        lambda t: t.select(["doc_id", "media_ref", "frame_id", "frame_checksum"]),
        batch_format="pyarrow",
    )


_RESIZED_SQL = """
WITH src AS (SELECT doc_id AS d, string_split(text, ' ') AS ws FROM documents),
w AS (SELECT d, generate_subscripts(ws, 1) AS i FROM src),
spans AS (SELECT d, (i - 1) // 8 AS si FROM w GROUP BY d, (i - 1) // 8),
media AS (
  SELECT d, si, (d * 1000 + si) % 9973 AS m FROM spans
  WHERE (d + si) % 7 <> 0 AND (d + si) % 5 = 3
),
b AS (SELECT unnest(generate_series(0, 255)) AS i),
bytes AS (
  SELECT d, si, m, i % 8 AS lane, (m * 37 + 11 + i * 7) % 256 AS val
  FROM media CROSS JOIN b WHERE (i // 8) % 2 = 0
),
feat AS (
  SELECT d, si, m, lane, CAST(SUM(val) AS DOUBLE) / (16 * 255.0) AS f
  FROM bytes GROUP BY d, si, m, lane
)
SELECT printf('doc-%08d', d) AS doc_id, printf('m-%d', m) AS media_ref,
  'image' AS media_kind, CAST(128 AS BIGINT) AS n_bytes,
  MAX(CASE WHEN lane = 0 THEN f END) AS f0,
  MAX(CASE WHEN lane = 1 THEN f END) AS f1,
  MAX(CASE WHEN lane = 2 THEN f END) AS f2,
  MAX(CASE WHEN lane = 3 THEN f END) AS f3,
  MAX(CASE WHEN lane = 4 THEN f END) AS f4,
  MAX(CASE WHEN lane = 5 THEN f END) AS f5,
  MAX(CASE WHEN lane = 6 THEN f END) AS f6,
  MAX(CASE WHEN lane = 7 THEN f END) AS f7
FROM feat GROUP BY d, si, m
"""


@query("media_resized_features", sql=_RESIZED_SQL)
def media_resized_features(sf_dir: str) -> ray.data.Dataset:
    """Resize (factor-2 lane-row downsample) chained BEFORE feature
    extraction — the decode -> resize -> featurize actor chain of a real
    image pipeline with the codec stubbed. The downsample keeps even
    lane-rows (byte index ``(i // 8) % 2 = 0``) of the 32x8 payload
    matrix, so the whole chain stays integer arithmetic and the SQL
    oracle reproduces the resized per-lane features bit for bit
    (exact-int sums / one double division by ``16 * 255.0``)."""
    from ocr_ray.stages.explode import explode_documents
    from ocr_ray.stages.media import (
        MEDIA_FEATURE_DIM,
        MediaDecoder,
        attach_payloads,
        media_resize,
    )

    corpus = ensure_corpus(sf_dir, glyphs=False)
    flat = read_documents(corpus).map_batches(
        explode_documents, batch_format="pyarrow", fn_kwargs={"sentinels": False}
    ).map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "media")), batch_format="pyarrow"
    )
    resized = flat.map_batches(attach_payloads, batch_format="pyarrow", batch_size=512).map_batches(
        media_resize, batch_format="pyarrow", batch_size=512
    )
    decoded = resized.map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        batch_size=512,
        concurrency=pool_size(),
        fn_constructor_kwargs={"fake_decode": True},
    )
    cols = ["doc_id", "media_ref", "media_kind", "n_bytes"] + [
        f"f{j}" for j in range(MEDIA_FEATURE_DIM)
    ]
    return decoded.map_batches(lambda t: t.select(cols), batch_format="pyarrow")


@query(
    "decontaminate_docs",
    sql="""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh AS (
  SELECT DISTINCT doc_id, toks[gs.i+1] || ' ' || toks[gs.i+2] || ' ' || toks[gs.i+3] AS s
  FROM w, LATERAL (SELECT unnest(range(0, greatest(len(toks)-2, 0))) AS i) gs
),
bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
cnt AS (
  SELECT sh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM sh JOIN bench USING (s) WHERE sh.doc_id % 97 <> 0 GROUP BY sh.doc_id
)
SELECT d.doc_id, COALESCE(c.n_shared, 0) AS n_shared,
  CAST(COALESCE(c.n_shared, 0) >= 3 AS INT) AS contaminated
FROM documents d LEFT JOIN cnt c ON d.doc_id = c.doc_id
WHERE d.doc_id % 97 <> 0
""",
)
def decontaminate_docs(sf_dir: str) -> ray.data.Dataset:
    """Benchmark DECONTAMINATION — the training-corpus hygiene operator:
    flag train docs sharing >= 3 distinct 3-gram shingles with the
    benchmark set (stand-in: doc_id % 97 == 0). The benchmark shingle-
    hash set is small by nature, so it broadcasts (ray.put + per-worker
    sorted array); the train side is ONE map-only pass counting distinct
    membership hits by searchsorted — no shuffle at all. For benchmark
    sets too big to broadcast, chain the bloom prefilter
    (``functions/bloom.py``) in front of the same counting pass. Shingle
    hashes are u64 word-window mixes; a hash collision could in principle
    perturb a count, which the bit-exact oracle comparison would catch."""
    from ocr_ray.functions.dedup import shingle_hashes

    docs = read_docs(sf_dir, columns=["doc_id", "text"])

    def bench_shingles(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ft = t.filter(pa.array(ids % 97 == 0))
        sh, _ = shingle_hashes(ft["text"])
        return pa.table({"h": pa.array(np.unique(sh), type=pa.uint64())})

    bench = np.unique(
        docs.map_batches(bench_shingles, batch_format="pyarrow")
        .to_pandas()["h"]
        .to_numpy(dtype=np.uint64)
    )
    bench_ref = ray.put(bench)

    def count_shared(t: pa.Table) -> pa.Table:
        from ocr_ray.functions.relational import _prepared

        bset = _prepared(("decon", bench_ref.hex()), lambda: ray.get(bench_ref))
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ft = t.filter(pa.array(ids % 97 != 0))
        ids = ids[ids % 97 != 0]
        sh, n_sh = shingle_hashes(ft["text"])
        doc_of = np.repeat(np.arange(len(n_sh), dtype=np.int64), n_sh)
        # distinct within doc, then membership count
        order = np.lexsort((sh, doc_of))
        d, s = doc_of[order], sh[order]
        keep = np.empty(len(s), dtype=bool)
        if len(s):
            keep[0] = True
            keep[1:] = (d[1:] != d[:-1]) | (s[1:] != s[:-1])
        d, s = d[keep], s[keep]
        pos = np.searchsorted(bench, s)
        pos_c = np.minimum(pos, max(len(bench) - 1, 0))
        hit = (bench[pos_c] == s) if len(bench) else np.zeros(len(s), dtype=bool)
        n_shared = np.bincount(d[hit], minlength=len(n_sh)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_shared": pa.array(n_shared),
                "contaminated": pa.array((n_shared >= 3).astype(np.int32)),
            }
        )

    return docs.map_batches(count_shared, batch_format="pyarrow")



@query(
    "scd2_customer_priority",
    sql="""
WITH s AS (
  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
    lag(o_orderpriority) OVER win AS prev_p
  FROM orders
  WINDOW win AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
runs AS (
  SELECT *,
    SUM(CASE WHEN prev_p IS NULL OR prev_p <> o_orderpriority THEN 1 ELSE 0 END)
      OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS UNBOUNDED PRECEDING) AS ver
  FROM s
),
grp AS (
  SELECT o_custkey, CAST(ver AS BIGINT) AS version,
    MIN(o_orderpriority) AS priority,
    MIN(o_orderdate) AS vf,
    COUNT(*) AS n_orders
  FROM runs GROUP BY o_custkey, ver
)
SELECT o_custkey, version, priority,
  strftime(vf, '%Y-%m-%d') AS valid_from,
  COALESCE(strftime(lead(vf) OVER (PARTITION BY o_custkey ORDER BY version),
                    '%Y-%m-%d'), '9999-12-31') AS valid_to,
  (lead(vf) OVER (PARTITION BY o_custkey ORDER BY version) IS NULL) AS is_current,
  CAST(n_orders AS BIGINT) AS n_orders
FROM grp
""",
)
def scd2_customer_priority(sf_dir: str) -> ray.data.Dataset:
    """Slowly-Changing-Dimension Type-2 history build: each customer's
    order stream is collapsed into versioned attribute runs — one row per
    maximal run of equal o_orderpriority in (o_orderdate, o_orderkey)
    order, carrying (version, valid_from, valid_to, is_current) with the
    classic 9999-12-31 open-ended high date (no NULLs in the validity
    interval, so downstream BETWEEN probes need no null branch).

    Distributed shape: ONE coarse-bucket shuffle on the dimension key,
    then a single vectorized pass per bucket — sort, run-boundary
    detection, per-run first-date gather, next-run valid_from via a
    shifted array. No driver-side state; version numbering restarts per
    key so buckets are independent."""
    ds = read_table(
        sf_dir,
        "orders",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"],
    )

    nb = np.uint64(buckets_for_input(ds))

    def bucketize(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t["o_custkey"].to_numpy(zero_copy_only=False))
        return t.append_column("_bucket", pa.array((h % nb).astype(np.int32)))

    def body(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "o_custkey": pd.Series([], dtype=np.int64),
                    "version": pd.Series([], dtype=np.int64),
                    "priority": pd.Series([], dtype=str),
                    "valid_from": pd.Series([], dtype=str),
                    "valid_to": pd.Series([], dtype=str),
                    "is_current": pd.Series([], dtype=bool),
                    "n_orders": pd.Series([], dtype=np.int64),
                }
            )
        g = g.sort_values(
            ["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort"
        )
        cust = g["o_custkey"].to_numpy()
        prio = g["o_orderpriority"].to_numpy()
        dates = g["o_orderdate"].dt.strftime("%Y-%m-%d").to_numpy()
        n = len(g)
        new_cust = np.empty(n, dtype=bool)
        new_cust[0] = True
        new_cust[1:] = cust[1:] != cust[:-1]
        change = new_cust.copy()
        change[1:] |= prio[1:] != prio[:-1]
        starts = np.flatnonzero(change)  # one SCD2 row per run
        run_len = np.diff(np.concatenate([starts, [n]]))
        # version: per-customer run counter
        run_cust = cust[starts]
        first_run = np.empty(len(starts), dtype=bool)
        first_run[0] = True
        first_run[1:] = run_cust[1:] != run_cust[:-1]
        cust_start = np.repeat(np.flatnonzero(first_run), np.diff(
            np.concatenate([np.flatnonzero(first_run), [len(starts)]])
        ))
        version = np.arange(len(starts), dtype=np.int64) - cust_start + 1
        valid_from = dates[starts]
        # next run's valid_from within the same customer, else the high date
        valid_to = np.empty(len(starts), dtype=object)
        valid_to[:-1] = valid_from[1:]
        valid_to[-1] = "9999-12-31"
        last_run = np.empty(len(starts), dtype=bool)
        last_run[-1] = True
        last_run[:-1] = run_cust[1:] != run_cust[:-1]
        valid_to[last_run] = "9999-12-31"
        return pd.DataFrame(
            {
                "o_custkey": run_cust,
                "version": version,
                "priority": prio[starts],
                "valid_from": valid_from,
                "valid_to": valid_to.astype(str),
                "is_current": last_run,
                "n_orders": run_len.astype(np.int64),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(body, batch_format="pandas")
    )
