"""Query registry section: relational_joins (split from the former monolithic queries.py)."""

from __future__ import annotations

import datetime

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ocr_ray.functions.relational import (
    hash_join,
    lookup,
    semi_filter,
    to_units,
    units_to_double,
)
from ocr_ray.sizing import default_buckets
from ocr_ray.sources import read_table

from ocr_ray.pipelines.queries._shared import (
    _big_spenders,
    arrow_topk,
    load_small_table,
    query,
)


# ---------------------------------------------------------------------------
# Relational: joins / filters / sorts / distinct
# ---------------------------------------------------------------------------


@query(
    "q3_top_revenue_orders",
    sql="""
SELECT l_orderkey,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
  strftime(ANY_VALUE(o_orderdate), '%Y-%m-%d') AS o_orderdate,
  ANY_VALUE(o_orderpriority) AS o_orderpriority
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey LIMIT 10
""",
)
def q3_top_revenue_orders(sf_dir: str) -> ray.data.Dataset:
    """Q3-style: broadcast semi-filter on customers, hash join to orders,
    exact revenue aggregate, deterministic top-10."""
    from ray.data.aggregate import Sum

    cust = load_small_table(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    keys = set(cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"])
    keys_ref = ray.put(keys)

    orders = semi_filter(
        read_table(
            sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
        ),
        keys_ref,
        "o_custkey",
    )

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        price_c = to_units(t["l_extendedprice"])
        disc_c = to_units(t["l_discount"])
        # map-side combine: one partial row per orderkey per batch (~4x
        # fewer rows enter the shuffle; the in-bucket fold re-sums)
        df = pd.DataFrame(
            {
                "l_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False),
                "rev_u4": pc.multiply(
                    price_c, pc.subtract(pa.scalar(100, type=pa.int64()), disc_c)
                ).to_numpy(zero_copy_only=False),
            }
        )
        red = df.groupby("l_orderkey", as_index=False)["rev_u4"].sum()
        return pa.Table.from_pandas(red, preserve_index=False).replace_schema_metadata(None)

    def per_order(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-bucket fold: one sort, run boundaries, reduceat
        # sums; date/priority are constant per order (first of run).
        if len(df) == 0:
            return pd.DataFrame(
                {"l_orderkey": [], "revenue": [], "o_orderdate": [], "o_orderpriority": []}
            )
        df = df.sort_values("l_orderkey", kind="mergesort")
        keys = df["l_orderkey"].to_numpy(dtype=np.int64)
        new = np.empty(len(df), dtype=bool)
        new[0] = True
        new[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(new)
        sums = np.add.reduceat(df["rev_u4"].to_numpy(dtype=np.int64), starts)
        top = pd.DataFrame(
            {
                "l_orderkey": keys[starts],
                "revenue": units_to_double(sums, 4),
                "o_orderdate": df["o_orderdate"].to_numpy()[starts],
                "o_orderpriority": df["o_orderpriority"].to_numpy()[starts],
            }
        ).sort_values(["revenue", "l_orderkey"], ascending=[False, True], kind="mergesort").head(10)
        top["o_orderdate"] = pd.to_datetime(top["o_orderdate"]).dt.strftime("%Y-%m-%d")
        return top  # per-bucket partial top-10; final merge is tiny

    # join RAW lineitem rows to the (semi-filtered, ~1/5) orders side, with
    # the per-order aggregation + local top-10 running INSIDE the join
    # bucket body (``bucket_post``): the bucket holds ALL rows of each of
    # its orderkeys, whereas downstream blocks can be dynamically split by
    # the executor — one shuffle total, no order ever straddles a task.
    joined = hash_join(
        li.map_batches(rev, batch_format="pyarrow"),
        orders,
        on="l_orderkey",
        right_on="o_orderkey",
        num_buckets=default_buckets(),
        left_schema=pa.schema({"l_orderkey": pa.int64(), "rev_u4": pa.int64()}),
        right_schema=pa.schema(
            {
                "o_orderkey": pa.int64(),
                "o_custkey": pa.int64(),
                "o_orderdate": pa.timestamp("us"),
                "o_orderpriority": pa.string(),
            }
        ),
        bucket_post=per_order,
        post_schema=pa.schema(
            {
                "l_orderkey": pa.int64(),
                "revenue": pa.float64(),
                "o_orderdate": pa.string(),
                "o_orderpriority": pa.string(),
            }
        ),
    )
    # Global top-10 merges ~160 partial rows.
    return joined.sort(["revenue", "l_orderkey"], descending=[True, False]).limit(10)


@query(
    "q5_nation_revenue",
    sql="""
SELECT n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)
def q5_nation_revenue(sf_dir: str) -> ray.data.Dataset:
    """Revenue per customer nation: large-large hash join (lineitem x orders)
    plus broadcast dimension lookups (customer -> nation name)."""
    from ray.data.aggregate import Sum

    cust = load_small_table(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nation = load_small_table(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    c2n = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    mapping_ref = ray.put({int(k): (v,) for k, v in zip(c2n["c_custkey"], c2n["n_name"])})

    # map orders to n_name FIRST (broadcast customer->nation lookup — no
    # shuffle), join raw lineitem rows once, aggregate straight to the 25
    # nation groups (map-side combine makes the final groupby tiny). One
    # shuffle total instead of lineitem-groupby + join + groupby.
    orders = lookup(
        read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]),
        mapping_ref,
        "o_custkey",
        [("n_name", pa.string())],
    )
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        price_c = to_units(t["l_extendedprice"])
        disc_c = to_units(t["l_discount"])
        # map-side combine to one partial row per orderkey per batch
        df = pd.DataFrame(
            {
                "l_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False),
                "rev_u4": pc.multiply(
                    price_c, pc.subtract(pa.scalar(100, type=pa.int64()), disc_c)
                ).to_numpy(zero_copy_only=False),
            }
        )
        red = df.groupby("l_orderkey", as_index=False)["rev_u4"].sum()
        return pa.Table.from_pandas(red, preserve_index=False).replace_schema_metadata(None)

    joined = hash_join(
        li.map_batches(rev, batch_format="pyarrow"),
        orders,
        on="l_orderkey",
        right_on="o_orderkey",
        num_buckets=default_buckets(),
        left_schema=pa.schema({"l_orderkey": pa.int64(), "rev_u4": pa.int64()}),
        right_schema=pa.schema(
            {"o_orderkey": pa.int64(), "o_custkey": pa.int64(), "n_name": pa.string()}
        ),
    )

    def combine(t: pa.Table) -> pa.Table:
        # map-side partial: one row per nation per batch
        df = pd.DataFrame(
            {"n_name": t["n_name"].to_pandas(), "rev_u4": t["rev_u4"].to_numpy(zero_copy_only=False)}
        )
        red = df.groupby("n_name", sort=False)["rev_u4"].sum().reset_index()
        return pa.table(
            {
                "n_name": pa.array(red["n_name"], type=pa.string()),
                "rev_u4": pa.array(red["rev_u4"].to_numpy(dtype=np.int64)),
            }
        )

    agg = (
        joined.map_batches(combine, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("rev_u4", alias_name="rev_u4"))
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n_name": df["n_name"], "revenue": units_to_double(df["rev_u4"], 4)})

    return agg.map_batches(finalize, batch_format="pandas")


@query(
    "filter_project_lineitem",
    sql="""
SELECT l_orderkey, l_linenumber, l_quantity,
  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_quantity > 25
""",
)
def filter_project_lineitem(sf_dir: str) -> ray.data.Dataset:
    """Predicate + projection entirely inside one vectorized map_batches."""
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    lo, hi = datetime.datetime(1996, 1, 1), datetime.datetime(1997, 1, 1)

    def fp(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(lo)), pc.less(t["l_shipdate"], pa.scalar(hi))),
            pc.greater(t["l_quantity"], pa.scalar(25.0)),
        )
        t = t.filter(mask)
        price_c = to_units(t["l_extendedprice"])
        disc_c = to_units(t["l_discount"])
        rev_u4 = pc.multiply(price_c, pc.subtract(pa.scalar(100, type=pa.int64()), disc_c))
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": pc.cast(t["l_linenumber"], pa.int32()),
                "l_quantity": t["l_quantity"],
                "revenue": pc.divide(pc.cast(rev_u4, pa.float64()), pa.scalar(10000.0)),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow")


@query(
    "top_orders",
    sql="""
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
""",
)
def top_orders(sf_dir: str) -> ray.data.Dataset:
    """Global top-20: per-block partial top-20 (vectorized argpartition)
    then a tiny final sort over <= 20 x blocks partial rows — no all-to-all
    sort of the full table for a 20-row answer."""
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def local_top(t: pa.Table) -> pa.Table:
        return arrow_topk(
            t, [("o_totalprice", "descending"), ("o_orderkey", "ascending")], 20
        )

    return (
        ds.map_batches(local_top, batch_format="pyarrow")
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(20)
    )


@query(
    "custkey_skew_profile",
    sql="""
SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders GROUP BY o_custkey
ORDER BY n_orders DESC, o_custkey LIMIT 10
""",
)
def custkey_skew_profile(sf_dir: str) -> ray.data.Dataset:
    """Key-skew profiling: the top-10 hottest join keys with their row
    counts — the diagnostic a pipeline runs BEFORE picking salt factors
    and hot-key caps for a 100 TB shuffle (see the salted-join and
    hot-group-cap operators this feeds). Map-side per-batch combine
    (Arrow group_by) -> one small distributed groupby-sum -> per-block
    partial top-10 -> tiny final sort; the full key histogram never
    lands on one task."""
    from ocr_ray.functions.relational import bucketed_aggregate

    ds = read_table(sf_dir, "orders", columns=["o_custkey"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["o_custkey"]).aggregate([("o_custkey", "count")])
        return pa.table(
            {
                "o_custkey": g["o_custkey"],
                "n": pc.cast(g["o_custkey_count"], pa.int64()),
            }
        )

    # per-custkey: key cardinality scales with the data -> bucketed fold
    counts = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["o_custkey"],
        aggs={"n_orders": ("n", "sum")},
    )

    def local_top(t: pa.Table) -> pa.Table:
        return arrow_topk(
            t, [("n_orders", "descending"), ("o_custkey", "ascending")], 10
        )

    return (
        counts.map_batches(local_top, batch_format="pyarrow")
        .sort(["n_orders", "o_custkey"], descending=[True, False])
        .limit(10)
        .map_batches(
            lambda t: pa.table(
                {
                    "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                    "n_orders": pc.cast(t["n_orders"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


@query(
    "join_size_estimate",
    sql="""
WITH a AS (SELECT l_orderkey AS k, COUNT(*) AS n FROM lineitem GROUP BY 1),
b AS (SELECT o_orderkey AS k, COUNT(*) AS n FROM orders GROUP BY 1),
j AS (SELECT a.k, a.n * b.n AS nn FROM a JOIN b USING (k))
SELECT CAST(SUM(nn) AS BIGINT) AS join_rows,
  CAST(COUNT(*) AS BIGINT) AS matched_keys,
  CAST(MAX(nn) AS BIGINT) AS max_key_rows
FROM j
""",
)
def join_size_estimate(sf_dir: str) -> pa.Table:
    """Join-size PRE-FLIGHT (exact, without running the join): the output
    cardinality of lineitem ⋈ orders is Σ_k a_k·b_k over per-key counts,
    so it is computable from the two count tables alone — the planner
    diagnostic to run before committing to a join strategy (broadcast vs
    bucketed, salt factor, bucket count) at 100 TB, alongside
    ``custkey_skew_profile``. Map-side per-batch key counts shrink each
    side to its distinct keys before the ONE count-table shuffle; inside
    the bucket, the partial-count cross product collapses per key
    (Σ_i Σ_j a_i b_j = (Σa)(Σb)) to one partial row per bucket; the
    driver folds ≤ num_buckets rows. ``max_key_rows`` is the hottest
    key's output size — the skew red flag."""

    def partial(col: str):
        def f(t: pa.Table) -> pa.Table:
            g = t.group_by([col]).aggregate([([], "count_all")])
            return pa.table(
                {"k": pc.cast(g[col], pa.int64()), "n": pc.cast(g["count_all"], pa.int64())}
            )

        return f

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey"]).map_batches(
        partial("l_orderkey"), batch_format="pyarrow"
    )
    orders = read_table(sf_dir, "orders", columns=["o_orderkey"]).map_batches(
        partial("o_orderkey"), batch_format="pyarrow"
    )

    def body(df: pd.DataFrame) -> pd.DataFrame:
        nn = df["n"].to_numpy(np.int64) * df["n_r"].to_numpy(np.int64)
        g = pd.DataFrame({"k": df["k"], "nn": nn}).groupby("k")["nn"].sum()
        return pd.DataFrame(
            {
                "join_rows": [int(g.sum())],
                "matched_keys": [len(g)],
                "max_key_rows": [int(g.max()) if len(g) else 0],
            }
        )

    partials = hash_join(
        li,
        orders,
        on="k",
        num_buckets=default_buckets(),
        left_schema=pa.schema({"k": pa.int64(), "n": pa.int64()}),
        right_schema=pa.schema({"k": pa.int64(), "n": pa.int64()}),
        bucket_post=body,
        post_schema=pa.schema(
            {"join_rows": pa.int64(), "matched_keys": pa.int64(), "max_key_rows": pa.int64()}
        ),
    ).to_pandas()  # ≤ num_buckets single-row partials
    return pa.table(
        {
            "join_rows": pa.array([int(partials["join_rows"].sum())], type=pa.int64()),
            "matched_keys": pa.array([int(partials["matched_keys"].sum())], type=pa.int64()),
            "max_key_rows": pa.array([int(partials["max_key_rows"].max())], type=pa.int64()),
        }
    )


@query("distinct_segments", sql="SELECT DISTINCT c_mktsegment FROM customer")
def distinct_segments(sf_dir: str) -> pa.Table:
    vals = read_table(sf_dir, "customer", columns=["c_mktsegment"]).unique("c_mktsegment")
    return pa.table({"c_mktsegment": pa.array(sorted(vals), type=pa.string())})


@query(
    "semi_join_customers",
    sql="""
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
""",
)
def semi_join_customers(sf_dir: str) -> ray.data.Dataset:
    """Semi join via broadcast key set (no shuffle)."""
    keys = set(_big_spenders(sf_dir))
    keys_ref = ray.put(keys)
    return semi_filter(
        read_table(sf_dir, "customer", columns=["c_custkey", "c_name"]), keys_ref, "c_custkey"
    )


@query(
    "anti_join_customers",
    sql="""
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
""",
)
def anti_join_customers(sf_dir: str) -> ray.data.Dataset:
    keys = set(_big_spenders(sf_dir))
    keys_ref = ray.put(keys)
    return semi_filter(
        read_table(sf_dir, "customer", columns=["c_custkey", "c_name"]),
        keys_ref,
        "c_custkey",
        anti=True,
    )


@query(
    "string_funcs_part",
    sql="""
SELECT p_partkey, upper(p_name) AS name_upper, CAST(length(p_name) AS BIGINT) AS name_len,
  substr(p_type, 1, 5) AS type_prefix, reverse(p_brand) AS brand_rev,
  p_brand || '#' || p_type AS brand_type
FROM part
""",
)
def string_funcs_part(sf_dir: str) -> ray.data.Dataset:
    ds = read_table(sf_dir, "part", columns=["p_partkey", "p_name", "p_type", "p_brand"])

    def fx(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "name_upper": pc.utf8_upper(t["p_name"]),
                "name_len": pc.cast(pc.utf8_length(t["p_name"]), pa.int64()),
                "type_prefix": pc.utf8_slice_codeunits(t["p_type"], 0, 5),
                "brand_rev": pc.utf8_reverse(t["p_brand"]),
                "brand_type": pc.binary_join_element_wise(
                    t["p_brand"], t["p_type"], "#"
                ),
            }
        )

    return ds.map_batches(fx, batch_format="pyarrow")


@query(
    "user_sessions",
    sql="""
WITH e AS (
  SELECT user_id, ts,
    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
  FROM events
), f AS (
  SELECT user_id,
    CASE WHEN pts IS NULL OR ts - pts > INTERVAL 1800 SECONDS THEN 1 ELSE 0 END AS brk
  FROM e
)
SELECT user_id, CAST(SUM(brk) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM f GROUP BY user_id
""",
)
def user_sessions(sf_dir: str) -> ray.data.Dataset:
    """Sessionization (30-min inactivity gap): the windowed/stateful
    streaming analogue — partition by key, order by time within the group
    (Ray Data has no watermarks; the finite-log groupby is the idiom)."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def bucketize(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t["user_id"].to_numpy(zero_copy_only=False))
        return t.append_column("_bucket", pa.array((h % np.uint64(64)).astype(np.int32)))

    def sessions_body(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass per bucket: sort by (user, time), detect user
        # boundaries and >30min gaps, fold with reduceat — no per-user calls.
        if len(g) == 0:
            return pd.DataFrame({"user_id": [], "n_sessions": [], "n_events": []})
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        new_user = np.empty(len(g), dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        brk = np.empty(len(g), dtype=bool)
        brk[0] = True
        brk[1:] = (ts[1:] - ts[:-1]) > np.timedelta64(1800, "s")
        brk |= new_user
        starts = np.flatnonzero(new_user)
        return pd.DataFrame(
            {
                "user_id": uid[starts],
                "n_sessions": np.add.reduceat(brk.astype(np.int64), starts),
                "n_events": np.diff(np.concatenate([starts, [len(g)]])),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(sessions_body, batch_format="pandas")
    )


