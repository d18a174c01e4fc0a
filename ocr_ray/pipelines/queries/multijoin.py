"""Query registry section: multijoin (split from the former monolithic queries.py)."""

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

from ocr_ray.pipelines.queries._shared import arrow_topk, gate_by_sampled_recheck, load_small_table, query, read_docs, read_embeddings


# ---------------------------------------------------------------------------
# Multi-join analytics (TPC-H q10 / q18 / q14 / q2 shapes)
# ---------------------------------------------------------------------------


@query(
    "q10_returned_revenue",
    sql="""
SELECT c_custkey, c_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
  CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
FROM customer JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
""",
)
def q10_returned_revenue(sf_dir: str) -> ray.data.Dataset:
    """Four-table chain (TPC-H q10 shape): ONE bucketed lineitem x orders
    join with in-bucket pre-aggregation to per-customer partials, one tiny
    customer-key groupby, broadcast customer+nation dims, per-block partial
    top-20 before the final merge — no global sort of the aggregate."""
    from ray.data.aggregate import Sum

    li = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"]
    )

    def rev(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "rev_u4": pc.multiply(
                    to_units(t["l_extendedprice"]),
                    pc.subtract(pa.scalar(100, type=pa.int64()), to_units(t["l_discount"])),
                ),
            }
        )

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    lo, hi = datetime.datetime(1996, 1, 1), datetime.datetime(1996, 7, 1)

    def window(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo)), pc.less(t["o_orderdate"], pa.scalar(hi))
        )
        return t.filter(m).select(["o_orderkey", "o_custkey"])

    def per_cust(df: pd.DataFrame) -> pd.DataFrame:
        # in-bucket partial: custkeys span buckets, so this is a partial
        # (re-aggregated by the groupby below), unlike q3's per-order final.
        return df.groupby("o_custkey", as_index=False)["rev_u4"].sum()

    joined = hash_join(
        li.map_batches(rev, batch_format="pyarrow"),
        orders.map_batches(window, batch_format="pyarrow"),
        on="l_orderkey",
        right_on="o_orderkey",
        num_buckets=default_buckets(),
        left_schema=pa.schema({"l_orderkey": pa.int64(), "rev_u4": pa.int64()}),
        right_schema=pa.schema({"o_orderkey": pa.int64(), "o_custkey": pa.int64()}),
        bucket_post=per_cust,
        post_schema=pa.schema({"o_custkey": pa.int64(), "rev_u4": pa.int64()}),
    )
    from ocr_ray.functions.relational import bucketed_aggregate

    agg = bucketed_aggregate(joined, keys=["o_custkey"], aggs={"rev_u4": ("rev_u4", "sum")})

    cust = load_small_table(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal", "c_nationkey"]).to_pandas()
    nation = load_small_table(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    dim = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    ref = ray.put(
        {
            int(k): (nm, float(ab), nn)
            for k, nm, ab, nn in zip(dim["c_custkey"], dim["c_name"], dim["c_acctbal"], dim["n_name"])
        }
    )
    enriched = lookup(
        agg, ref, "o_custkey",
        [("c_name", pa.string()), ("c_acctbal", pa.float64()), ("n_name", pa.string())],
    )

    def partial_top(t: pa.Table) -> pa.Table:
        return arrow_topk(t, [("rev_u4", "descending"), ("o_custkey", "ascending")], 20)

    top = (
        enriched.map_batches(partial_top, batch_format="pyarrow")
        .sort(["rev_u4", "o_custkey"], descending=[True, False])
        .limit(20)
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": df["o_custkey"].astype(np.int64),
                "c_name": df["c_name"],
                "revenue": units_to_double(df["rev_u4"], 4),
                "c_acctbal": df["c_acctbal"],
                "n_name": df["n_name"],
            }
        )

    return top.map_batches(finalize, batch_format="pandas")


@query(
    "q18_large_orders",
    sql="""
WITH big AS (
  SELECT l_orderkey, SUM(l_quantity) AS qty FROM lineitem
  GROUP BY l_orderkey HAVING SUM(l_quantity) > 180
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
  CAST(o_totalprice AS DOUBLE) AS o_totalprice, CAST(qty AS BIGINT) AS sum_qty
FROM big JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
""",
)
def q18_large_orders(sf_dir: str) -> ray.data.Dataset:
    """HAVING-on-aggregate join-back (TPC-H q18 shape): distributed
    partial+final quantity sums, the (selectivity-bounded) qualifying key
    set broadcast back over orders — the aggregate side never shuffles
    orders, and customer names come from a broadcast dim."""
    from ocr_ray.functions.relational import bucketed_aggregate

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False),
                # quantities are integer-valued doubles; int64 units keep sums exact
                "qty": t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        red = df.groupby("l_orderkey", as_index=False)["qty"].sum()
        return pa.Table.from_pandas(red, preserve_index=False).replace_schema_metadata(None)

    # per-orderkey sums are HIGH-cardinality (O(orders) groups):
    # Dataset.aggregate pays a per-group Python fold (measured 10.7 s for
    # 147 k groups at sf0.1 vs 0.15 s bucketed) — use the engine's
    # bucketed fold instead.
    sums = bucketed_aggregate(
        li.map_batches(partial, batch_format="pyarrow"),
        keys=["l_orderkey"],
        aggs={"sum_qty": ("qty", "sum")},
    )
    big = sums.map_batches(
        lambda t: t.filter(pc.greater(t["sum_qty"], pa.scalar(180, type=pa.int64()))),
        batch_format="pyarrow",
    ).to_pandas()  # selectivity-bounded (HAVING threshold), broadcast side
    qty_ref = ray.put({int(k): (int(q),) for k, q in zip(big["l_orderkey"], big["sum_qty"])})

    orders = lookup(
        read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]),
        qty_ref,
        "o_orderkey",
        [("sum_qty", pa.int64())],
    )
    cust = load_small_table(sf_dir, "customer", ["c_custkey", "c_name"]).to_pandas()
    name_ref = ray.put({int(k): (nm,) for k, nm in zip(cust["c_custkey"], cust["c_name"])})
    enriched = lookup(orders, name_ref, "o_custkey", [("c_name", pa.string())])

    def partial_top(t: pa.Table) -> pa.Table:
        return arrow_topk(
            t, [("o_totalprice", "descending"), ("o_orderkey", "ascending")], 100
        )

    top = (
        enriched.map_batches(partial_top, batch_format="pyarrow")
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(100)
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": df["o_custkey"].astype(np.int64),
                "c_name": df["c_name"],
                "o_orderkey": df["o_orderkey"].astype(np.int64),
                "o_orderdate": df["o_orderdate"],
                "o_totalprice": df["o_totalprice"],
                "sum_qty": df["sum_qty"].astype(np.int64),
            }
        )

    return top.map_batches(finalize, batch_format="pandas")


@query(
    "q14_promo_revenue",
    sql="""
SELECT
  CAST(SUM(CASE WHEN p_type = 'PROMO'
    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
    ELSE 0 END) AS DOUBLE) AS promo_revenue,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue,
  CAST(100 AS DOUBLE)
    * CAST(SUM(CASE WHEN p_type = 'PROMO'
        THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
        ELSE 0 END) AS DOUBLE)
    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
    AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
""",
)
def q14_promo_revenue(sf_dir: str) -> ray.data.Dataset:
    """Join + conditional aggregate (TPC-H q14 shape). part scales with the
    corpus, so it is NOT broadcast: one bucketed join with the two
    conditional sums computed inside each bucket — the shuffle carries
    2 x num_buckets partial rows out, and the final fold is a map over
    <= num_buckets rows. Integer units end-to-end; ONE float division at
    the very end (same two exact doubles as the oracle's)."""
    li = read_table(
        sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"]
    )
    lo, hi = datetime.datetime(1996, 3, 1), datetime.datetime(1996, 4, 1)

    def prep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["l_shipdate"], pa.scalar(lo)), pc.less(t["l_shipdate"], pa.scalar(hi))
        )
        t = t.filter(m)
        return pa.table(
            {
                "l_partkey": t["l_partkey"],
                "rev_u4": pc.multiply(
                    to_units(t["l_extendedprice"]),
                    pc.subtract(pa.scalar(100, type=pa.int64()), to_units(t["l_discount"])),
                ),
            }
        )

    part = read_table(sf_dir, "part", columns=["p_partkey", "p_type"])

    def bucket_sums(df: pd.DataFrame) -> pd.DataFrame:
        rev = df["rev_u4"].to_numpy(dtype=np.int64)
        promo = rev[(df["p_type"] == "PROMO").to_numpy()].sum()
        return pd.DataFrame({"promo_u4": [int(promo)], "total_u4": [int(rev.sum())]})

    partials = hash_join(
        li.map_batches(prep, batch_format="pyarrow"),
        part,
        on="l_partkey",
        right_on="p_partkey",
        num_buckets=default_buckets(),
        left_schema=pa.schema({"l_partkey": pa.int64(), "rev_u4": pa.int64()}),
        right_schema=pa.schema({"p_partkey": pa.int64(), "p_type": pa.string()}),
        bucket_post=bucket_sums,
        post_schema=pa.schema({"promo_u4": pa.int64(), "total_u4": pa.int64()}),
    ).to_pandas()  # <= num_buckets rows
    promo_d = units_to_double(np.array([partials["promo_u4"].sum()]), 4)[0]
    total_d = units_to_double(np.array([partials["total_u4"].sum()]), 4)[0]
    return pd.DataFrame(
        {
            "promo_revenue": [promo_d],
            "total_revenue": [total_d],
            "promo_pct": [100.0 * promo_d / total_d],
        }
    )


@query(
    "q2_min_acctbal_supplier",
    sql="""
WITH mins AS (
  SELECT s_nationkey AS nk, MIN(s_acctbal) AS min_bal FROM supplier GROUP BY s_nationkey
)
SELECT n_name, s_suppkey, s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
FROM supplier JOIN mins ON s_nationkey = nk AND s_acctbal = min_bal
  JOIN nation ON s_nationkey = n_nationkey
ORDER BY n_name, s_suppkey
""",
)
def q2_min_acctbal_supplier(sf_dir: str) -> ray.data.Dataset:
    """Argmin join-back (TPC-H q2 shape): distributed per-group MIN
    (map-side partial mins, tiny final groupby), the 25-row min table
    broadcast back as a filter over the fact side — the fact table never
    shuffles, and ties all survive (same as the SQL semi-join)."""
    from ray.data.aggregate import Min

    sup = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"])

    def partial_min(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "s_nationkey": t["s_nationkey"].to_numpy(zero_copy_only=False),
                "bal_u2": to_units(t["s_acctbal"]).to_numpy(zero_copy_only=False),
            }
        )
        red = df.groupby("s_nationkey", as_index=False)["bal_u2"].min()
        return pa.Table.from_pandas(red, preserve_index=False).replace_schema_metadata(None)

    mins = (
        sup.map_batches(partial_min, batch_format="pyarrow")
        .groupby("s_nationkey")
        .aggregate(Min("bal_u2", alias_name="min_u2"))
        .to_pandas()
    )  # one row per nation
    nation = load_small_table(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    dim = mins.merge(nation, left_on="s_nationkey", right_on="n_nationkey")
    ref = ray.put(
        {int(k): (int(m), nn) for k, m, nn in zip(dim["s_nationkey"], dim["min_u2"], dim["n_name"])}
    )

    enriched = lookup(sup, ref, "s_nationkey", [("min_u2", pa.int64()), ("n_name", pa.string())])

    def keep_min(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(pc.cast(to_units(t["s_acctbal"]), pa.int64()), t["min_u2"]))
        return pa.table(
            {
                "n_name": t["n_name"],
                "s_suppkey": t["s_suppkey"],
                "s_name": t["s_name"],
                "s_acctbal": t["s_acctbal"],
            }
        )

    return enriched.map_batches(keep_min, batch_format="pyarrow").sort(["n_name", "s_suppkey"])


@query(
    "q4_priority_count",
    sql="""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def q4_priority_count(sf_dir: str) -> ray.data.Dataset:
    """EXISTS as an EXACT distributed semi-join (TPC-H q4 shape): the
    qualifying-lineitem key side is too large to broadcast at scale and a
    bloom filter admits false positives — the bucketed ``hash_join``
    (how='semi') shuffles only the right side's KEYS, then map-side
    combine + tiny groupby for the priority counts."""
    from ray.data.aggregate import Sum

    lo, hi = datetime.datetime(1996, 1, 1), datetime.datetime(1996, 7, 1)
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def window(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo)), pc.less(t["o_orderdate"], pa.scalar(hi))
        )
        return t.filter(m).select(["o_orderkey", "o_orderpriority"])

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_discount"])

    def keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_discount"], pa.scalar(0.05)))
        # per-batch local dedup: only distinct keys enter the shuffle
        return pa.table({"l_orderkey": pc.unique(t["l_orderkey"])})

    hits = hash_join(
        orders.map_batches(window, batch_format="pyarrow"),
        li.map_batches(keys, batch_format="pyarrow"),
        on="o_orderkey",
        right_on="l_orderkey",
        how="semi",
        num_buckets=default_buckets(),
        left_schema=pa.schema({"o_orderkey": pa.int64(), "o_orderpriority": pa.string()}),
        right_schema=pa.schema({"l_orderkey": pa.int64()}),
    )

    def combine(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"o_orderpriority": t["o_orderpriority"].to_pandas()})
        red = df.groupby("o_orderpriority", as_index=False).size()
        return pa.table(
            {
                "o_orderpriority": pa.array(red["o_orderpriority"], type=pa.string()),
                "n": pa.array(red["size"].to_numpy(dtype=np.int64)),
            }
        )

    agg = hits.map_batches(combine, batch_format="pyarrow").groupby("o_orderpriority").aggregate(
        Sum("n", alias_name="n_orders")
    )
    return agg.sort("o_orderpriority")


@query(
    "orders_without_discounted_items",
    sql="""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
  AND NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def orders_without_discounted_items(sf_dir: str) -> ray.data.Dataset:
    """NOT EXISTS as the exact distributed ANTI join — same plan as
    ``q4_priority_count`` with how='anti' (bloom anti joins need a
    verification pass to be exact; the bucketed form is exact by
    construction)."""
    from ray.data.aggregate import Sum

    lo, hi = datetime.datetime(1996, 1, 1), datetime.datetime(1996, 7, 1)
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def window(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo)), pc.less(t["o_orderdate"], pa.scalar(hi))
        )
        return t.filter(m).select(["o_orderkey", "o_orderpriority"])

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_discount"])

    def keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_discount"], pa.scalar(0.05)))
        return pa.table({"l_orderkey": pc.unique(t["l_orderkey"])})

    misses = hash_join(
        orders.map_batches(window, batch_format="pyarrow"),
        li.map_batches(keys, batch_format="pyarrow"),
        on="o_orderkey",
        right_on="l_orderkey",
        how="anti",
        num_buckets=default_buckets(),
        left_schema=pa.schema({"o_orderkey": pa.int64(), "o_orderpriority": pa.string()}),
        right_schema=pa.schema({"l_orderkey": pa.int64()}),
    )

    def combine(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"o_orderpriority": t["o_orderpriority"].to_pandas()})
        red = df.groupby("o_orderpriority", as_index=False).size()
        return pa.table(
            {
                "o_orderpriority": pa.array(red["o_orderpriority"], type=pa.string()),
                "n": pa.array(red["size"].to_numpy(dtype=np.int64)),
            }
        )

    agg = misses.map_batches(combine, batch_format="pyarrow").groupby("o_orderpriority").aggregate(
        Sum("n", alias_name="n_orders")
    )
    return agg.sort("o_orderpriority")


@query(
    "q7_nation_volume",
    sql="""
SELECT supp_nation, cust_nation, l_year,
  CAST(SUM(vol) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
    CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
    CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS vol
  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
) GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def q7_nation_volume(sf_dir: str) -> ray.data.Dataset:
    """Bi-nation trade volume (TPC-H q7 shape): the CHAINED-SHUFFLE pattern
    — two bucketed joins on DIFFERENT keys (lineitem x orders on orderkey,
    then x supplier on suppkey), each with in-bucket projection so only
    surviving columns re-shuffle; nation names come from broadcast dims
    and the nation-pair filter is pushed to the earliest stage that can
    evaluate EACH side: the cust side prunes orders before join 1, and the
    supp side prunes LINEITEM before join 1 (suppliers are broadcastable,
    so the pair's ~2/25 supplier-key set filters the fact read and both
    shuffles shrink ~12x)."""
    from ray.data.aggregate import Sum

    n_a, n_b = "NATION_3", "NATION_7"

    cust = load_small_table(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nation = load_small_table(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    c2n = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    c2n = c2n[c2n["n_name"].isin([n_a, n_b])]  # pair filter pushdown
    cust_ref = ray.put({int(k): (nn,) for k, nn in zip(c2n["c_custkey"], c2n["n_name"])})

    sup_all = load_small_table(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    s2n = sup_all.merge(nation, left_on="s_nationkey", right_on="n_nationkey")
    pair_supp_ref = ray.put(
        set(s2n.loc[s2n["n_name"].isin([n_a, n_b]), "s_suppkey"].astype(int))
    )

    # lookup drops orders whose customer nation is outside the pair
    orders = lookup(
        read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]),
        cust_ref,
        "o_custkey",
        [("cust_nation", pa.string())],
    )

    li = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "l_year": pc.cast(pc.year(t["l_shipdate"]), pa.int32()),
                "rev_u4": pc.multiply(
                    to_units(t["l_extendedprice"]),
                    pc.subtract(pa.scalar(100, type=pa.int64()), to_units(t["l_discount"])),
                ),
            }
        )

    def combine1(df: pd.DataFrame) -> pd.DataFrame:
        # in-bucket projection+partial: one row per (suppkey, nation, year)
        return df.groupby(["l_suppkey", "cust_nation", "l_year"], as_index=False)["rev_u4"].sum()

    j1 = hash_join(
        semi_filter(li, pair_supp_ref, "l_suppkey").map_batches(prep, batch_format="pyarrow"),
        orders,
        on="l_orderkey",
        right_on="o_orderkey",
        num_buckets=default_buckets(),
        left_schema=pa.schema(
            {"l_orderkey": pa.int64(), "l_suppkey": pa.int64(), "l_year": pa.int32(), "rev_u4": pa.int64()}
        ),
        right_schema=pa.schema(
            {"o_orderkey": pa.int64(), "o_custkey": pa.int64(), "cust_nation": pa.string()}
        ),
        bucket_post=combine1,
        post_schema=pa.schema(
            {"l_suppkey": pa.int64(), "cust_nation": pa.string(), "l_year": pa.int32(), "rev_u4": pa.int64()}
        ),
    )

    sup = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    n_ref = ray.put({int(k): (nn,) for k, nn in zip(nation["n_nationkey"], nation["n_name"])})
    sup_n = lookup(sup, n_ref, "s_nationkey", [("supp_nation", pa.string())])

    def combine2(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["supp_nation"].isin([n_a, n_b]) & (df["supp_nation"] != df["cust_nation"])]
        return df.groupby(["supp_nation", "cust_nation", "l_year"], as_index=False)["rev_u4"].sum()

    j2 = hash_join(
        j1,
        sup_n,
        on="l_suppkey",
        right_on="s_suppkey",
        num_buckets=default_buckets(),
        left_schema=pa.schema(
            {"l_suppkey": pa.int64(), "cust_nation": pa.string(), "l_year": pa.int32(), "rev_u4": pa.int64()}
        ),
        right_schema=pa.schema(
            {"s_suppkey": pa.int64(), "s_nationkey": pa.int64(), "supp_nation": pa.string()}
        ),
        bucket_post=combine2,
        post_schema=pa.schema(
            {"supp_nation": pa.string(), "cust_nation": pa.string(), "l_year": pa.int32(), "rev_u4": pa.int64()}
        ),
    )

    agg = j2.groupby(["supp_nation", "cust_nation", "l_year"]).aggregate(
        Sum("rev_u4", alias_name="rev_u4")
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "supp_nation": df["supp_nation"],
                "cust_nation": df["cust_nation"],
                "l_year": df["l_year"].astype(np.int32),
                "revenue": units_to_double(df["rev_u4"], 4),
            }
        )

    return agg.map_batches(finalize, batch_format="pandas").sort(
        ["supp_nation", "cust_nation", "l_year"]
    )


@query("pca_embeddings")  # float-geometry family: op-specific tests, no SQL oracle
def pca_embeddings(sf_dir: str) -> ray.data.Dataset:
    """Distributed PCA over the embedding table: ONE streaming moment pass
    (d fixed-size partial rows per batch -> distributed groupby-sum), an
    O(d^3) driver eigendecomposition, then a broadcast map-side projection
    onto the top-2 components. Tested against exact numpy PCA
    (tests/test_dedup_ann.py) with a deterministic sign convention; the
    query additionally self-checks the algebraic invariants a correct fit
    must satisfy (orthonormal components, valid variance ratios), raises
    on violation, and the output is SELF-VERIFYING: a deterministic
    sample of rows (vec_id % 97 == 0) is re-projected on the driver with
    an independent numpy matmul and every row carries ``gate_ok`` =
    (invariants held) AND (sampled projections matched) — visible in
    the returned table where no SQL oracle can exist."""
    from ocr_ray.functions.ann import pca_fit, pca_transform

    emb = read_embeddings(sf_dir, columns=["vec_id", "embedding"])
    comps, ratio, mean = pca_fit(emb, k=2)
    gram = comps @ comps.T
    if not np.allclose(gram, np.eye(comps.shape[0]), atol=1e-8):
        raise RuntimeError(f"pca_embeddings: components not orthonormal: {gram}")
    if not (np.all(np.isfinite(ratio)) and np.all(ratio >= -1e-12) and ratio.sum() <= 1 + 1e-9):
        raise RuntimeError(f"pca_embeddings: invalid explained-variance ratios {ratio}")
    if ratio.size > 1 and not np.all(np.diff(ratio) <= 1e-12):
        raise RuntimeError(f"pca_embeddings: ratios not sorted descending {ratio}")
    out = pca_transform(
        read_embeddings(sf_dir, columns=["vec_id", "embedding"]), comps, mean
    ).materialize()

    # sample-bounded gate: re-project a deterministic row sample on the
    # driver (independent numpy path; no O(n) driver state)
    def check(eng, raw):
        for _, r in eng.iterrows():
            x = np.asarray(raw.loc[int(r["vec_id"]), "embedding"], dtype=np.float64)
            proj = (x - mean) @ comps.T
            if not np.allclose(proj, [r["pc0"], r["pc1"]], atol=1e-9):
                return False
        return True

    gated = gate_by_sampled_recheck(
        out,
        read_embeddings(sf_dir, columns=["vec_id", "embedding"]),
        id_col="vec_id",
        checker=check,
    )
    return gated.sort("vec_id")


@query(
    "token_pmi_pairs",
    sql="""
WITH s AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
w AS (SELECT doc_id, unnest(ws) AS token, generate_subscripts(ws, 1) AS i FROM s),
b AS (
  SELECT w1.token AS tok_a, w2.token AS tok_b
  FROM w w1 JOIN w w2 ON w1.doc_id = w2.doc_id AND w2.i = w1.i + 1
),
pcnt AS (SELECT tok_a, tok_b, COUNT(*) AS n_pair FROM b GROUP BY tok_a, tok_b),
uc AS (SELECT token, COUNT(*) AS n FROM w GROUP BY token),
tot AS (SELECT COUNT(*) AS total FROM w),
top AS (SELECT * FROM pcnt ORDER BY n_pair DESC, tok_a, tok_b LIMIT 50)
SELECT tok_a, tok_b, CAST(n_pair AS BIGINT) AS n_pair,
  CAST(ua.n AS BIGINT) AS n_a, CAST(ub.n AS BIGINT) AS n_b,
  CAST(n_pair * total AS DOUBLE) / CAST(ua.n * ub.n AS DOUBLE) AS pmi_ratio
FROM top JOIN uc ua ON ua.token = top.tok_a
  JOIN uc ub ON ub.token = top.tok_b CROSS JOIN tot
ORDER BY n_pair DESC, tok_a, tok_b
""",
)
def token_pmi_pairs(sf_dir: str) -> pa.Table:
    """Collocation mining: distributed bigram counts (adjacent tokens
    within a doc), exact global top-50 pairs (per-block partial top-k
    after ONE pair-key shuffle), then PMI against distributed unigram
    counts — the pair set is tiny by then, so the unigram side is
    semi-filtered by a broadcast token set and only ~100 count rows reach
    the driver. Exact integer counts; ONE float division at the end
    (identical exact operands to the oracle's)."""
    from ray.data.aggregate import Sum

    docs = read_docs(sf_dir, columns=["text"])

    def bigram_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        if len(flat) < 2:
            return pa.table(
                {"tok_a": pa.array([], pa.string()), "tok_b": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        same = pa.array(parents[1:] == parents[:-1])
        pairs = pa.table(
            {
                "tok_a": pc.filter(flat.slice(0, len(flat) - 1), same),
                "tok_b": pc.filter(flat.slice(1), same),
            }
        )
        out = pairs.group_by(["tok_a", "tok_b"]).aggregate([([], "count_all")])
        return out.rename_columns(["tok_a", "tok_b", "n"])

    pair_counts = (
        docs.map_batches(bigram_partial, batch_format="pyarrow")
        .groupby(["tok_a", "tok_b"])
        .aggregate(Sum("n", alias_name="n_pair"))
    )

    def local_top(t: pa.Table) -> pa.Table:
        return arrow_topk(
            t,
            [("n_pair", "descending"), ("tok_a", "ascending"), ("tok_b", "ascending")],
            50,
        )

    top = (
        pair_counts.map_batches(local_top, batch_format="pyarrow")
        .sort(["n_pair", "tok_a", "tok_b"], descending=[True, False, False])
        .limit(50)
        .to_pandas()
    )

    def unigram_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        flat = pa.table({"token": pc.list_flatten(toks)})
        out = flat.group_by("token").aggregate([([], "count_all")])
        return out.rename_columns(["token", "n"])

    # vocabulary-bounded counts, materialized once: reused for the total-N
    # fold AND the broadcast-filtered n_a/n_b lookup (no second doc pass)
    uni = (
        docs.map_batches(unigram_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )
    total = int(uni.sum("n"))
    need = pa.array(sorted(set(top["tok_a"]) | set(top["tok_b"])))
    small = uni.map_batches(
        lambda t: t.filter(pc.is_in(t["token"], value_set=need)), batch_format="pyarrow"
    ).to_pandas()
    cnt = dict(zip(small["token"], small["n"].astype(np.int64)))

    n_a = top["tok_a"].map(cnt).astype(np.int64)
    n_b = top["tok_b"].map(cnt).astype(np.int64)
    n_pair = top["n_pair"].astype(np.int64)
    return pa.table(
        {
            "tok_a": pa.array(top["tok_a"], type=pa.string()),
            "tok_b": pa.array(top["tok_b"], type=pa.string()),
            "n_pair": pa.array(n_pair),
            "n_a": pa.array(n_a),
            "n_b": pa.array(n_b),
            "pmi_ratio": pa.array(
                (n_pair * total).astype(np.float64) / (n_a * n_b).astype(np.float64)
            ),
        }
    )


@query(
    "sorted_export_orders",
    sql="""
WITH r AS (
  SELECT o_orderkey, o_totalprice,
         NTILE(16) OVER (ORDER BY o_totalprice, o_orderkey) AS tile
  FROM orders
)
SELECT CAST(tile AS BIGINT) AS tile, CAST(count(*) AS BIGINT) AS n_rows,
  CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
  CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
FROM r GROUP BY tile ORDER BY tile
""",
)
def sorted_export_orders(sf_dir: str) -> ray.data.Dataset:
    """Distributed ORDER BY fragmentation (the compute half of
    ``state.manifest.sorted_export``): every row gets its exact global
    rank/tile from the range-bucket + prefix-offset primitive — ONE coarse
    shuffle, no task ever holds the whole table — and per-tile stats fold
    map-side before a 16-row groupby. The tiles are the value-ordered,
    non-overlapping output fragments of the sorted-export sink."""
    from ray.data.aggregate import Max, Min, Sum

    from ocr_ray.functions.ranking import partitioned_rank

    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("_g", pa.array(["all"] * t.num_rows, type=pa.string()))

    ranked = partitioned_rank(
        ds.map_batches(tag, batch_format="pyarrow"),
        part_col="_g",
        value_col="o_totalprice",
        tiebreak_col="o_orderkey",
        out_cols=["o_orderkey", "o_totalprice"],
        ntile=16,
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        red = df.groupby("tile", as_index=False).agg(
            n=("o_totalprice", "size"),
            min_price=("o_totalprice", "min"),
            max_price=("o_totalprice", "max"),
        )
        return red

    agg = (
        ranked.map_batches(partial, batch_format="pandas")
        .groupby("tile")
        .aggregate(Sum("n", alias_name="n_rows"), Min("min_price"), Max("max_price"))
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "tile": df["tile"].astype(np.int64),
                "n_rows": df["n_rows"].astype(np.int64),
                "min_price": df["min(min_price)"],
                "max_price": df["max(max_price)"],
            }
        )

    return agg.map_batches(finalize, batch_format="pandas").sort("tile")




@query(
    "orders_zonemap_pruned_scan",
    sql="""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
  CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
  CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
FROM orders WHERE o_totalprice BETWEEN 400000 AND 450000
""",
)
def orders_zonemap_pruned_scan(sf_dir: str) -> ray.data.Dataset:
    """ZONE-MAP file skipping end to end: orders are sorted-exported into
    16 value-ordered fragments whose lineage records carry min/max
    (``state.manifest.sorted_export``), then a range query plans its scan
    from the MANIFEST ALONE (``read_range_pruned``) — fragments outside
    [400k, 450k] are never opened — and applies the residual row filter
    inside read tasks. A runtime gate asserts most fragments were
    actually skipped (>= 12 of 16 for this ~10% band), so a zone-map
    regression fails loudly; the oracle proves pruning loses no rows."""
    import shutil
    import tempfile

    from ray.data.aggregate import Count, Max, Min, Sum

    from ocr_ray.functions.relational import to_units, units_to_double
    from ocr_ray.state.manifest import read_range_pruned, sorted_export

    lo, hi = 400_000.0, 450_000.0
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    out = tempfile.mkdtemp(prefix="ocr_ray_zonemap_")
    shutil.rmtree(out)
    try:
        sorted_export(
            ds,
            out,
            value_col="o_totalprice",
            tiebreak_col="o_orderkey",
            out_cols=["o_orderkey", "o_totalprice"],
            num_fragments=16,
        )
        pruned, n_skipped = read_range_pruned(out, lo=lo, hi=hi)
        if n_skipped < 12:
            raise AssertionError(
                f"zone maps should skip >=12/16 fragments for a ~10% band, "
                f"skipped {n_skipped}"
            )

        def residual(t: pa.Table) -> pa.Table:
            m = pc.and_(
                pc.greater_equal(t["o_totalprice"], lo),
                pc.less_equal(t["o_totalprice"], hi),
            )
            t = t.filter(m)
            return pa.table({"price_c": to_units(t["o_totalprice"])})

        agg = (
            pruned.map_batches(residual, batch_format="pyarrow")
            .groupby(None)
            .aggregate(
                Count(alias_name="n_rows"),
                Sum("price_c", alias_name="sum_c"),
                Min("price_c", alias_name="min_c"),
                Max("price_c", alias_name="max_c"),
            )
        )

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "n_rows": df["n_rows"].astype(np.int64),
                    "sum_price": units_to_double(df["sum_c"], 2),
                    "min_price": units_to_double(df["min_c"], 2),
                    "max_price": units_to_double(df["max_c"], 2),
                }
            )

        return agg.map_batches(finalize, batch_format="pandas").materialize()
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query(
    "orders_bloom_point_lookup",
    sql="""
SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM orders
WHERE o_orderkey IN (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 5)
ORDER BY o_orderkey
""",
)
def orders_bloom_point_lookup(sf_dir: str) -> ray.data.Dataset:
    """BLOOM file skipping for point lookups on a SECONDARY key: orders
    are written into 16 fragments clustered by hash(custkey) — the
    layout a customer-centric pipeline wants — with each fragment's
    lineage carrying a 16 KiB Bloom of its ORDER keys
    (``state.manifest.column_bloom``). Fetching 5 specific orders then
    plans from the manifest alone (``read_key_pruned``): only fragments
    whose Bloom may hold a probed key are opened. Runtime gates assert
    real selectivity (>= 8/16 fragments skipped; candidate (key,
    fragment) pairs <= 2x keys, i.e. few false positives); the oracle
    proves no lookup is lost. Zone maps (range, cluster key) + Blooms
    (equality, secondary key) complete the manifest data-skipping
    story."""
    import shutil
    import tempfile

    from ocr_ray.functions.hashing import mix64
    from ocr_ray.pipelines.queries._shared import arrow_topk
    from ocr_ray.state.manifest import (
        ResumableSink,
        column_bloom,
        read_key_pruned,
    )

    NPARTS = 16
    ds = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    out = tempfile.mkdtemp(prefix="ocr_ray_bloom_")
    shutil.rmtree(out)
    try:
        def tag(t: pa.Table) -> pa.Table:
            h = mix64(
                t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
            )
            return t.append_column(
                "_part", pa.array((h % np.uint64(NPARTS)).astype(np.int32))
            )

        sink = ResumableSink(out, data_format="parquet")
        man_schema = pa.schema(
            {"partition": pa.int64(), "row_count": pa.int64(), "span_count": pa.int64()}
        )

        def write_part(g: pd.DataFrame) -> pa.Table:
            part = int(g["_part"].iloc[0])
            tbl = pa.Table.from_pandas(
                g.drop(columns=["_part"]), preserve_index=False
            ).replace_schema_metadata(None)
            return sink.write(
                tbl,
                part,
                extra={"bloom_orderkey": column_bloom(tbl["o_orderkey"].to_numpy())},
            )

        n = (
            ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_part")
            .map_groups(write_part, batch_format="pandas")
            .count()
        )
        assert n == NPARTS

        # the 5 smallest order keys: per-block partial min-5 + tiny merge
        def local_min5(t: pa.Table) -> pa.Table:
            return arrow_topk(t.select(["o_orderkey"]), [("o_orderkey", "ascending")], 5)

        keys = sorted(
            ds.map_batches(local_min5, batch_format="pyarrow")
            .sort("o_orderkey")
            .limit(5)
            .to_pandas()["o_orderkey"]
        )

        pruned, n_skipped, checks = read_key_pruned(out, "bloom_orderkey", keys)
        if n_skipped < NPARTS - 8:
            raise AssertionError(
                f"bloom should skip >= 8/{NPARTS} fragments for 5 keys, "
                f"skipped {n_skipped}"
            )
        if checks > 2 * len(keys):
            raise AssertionError(
                f"bloom false-positive blowup: {checks} candidate pairs "
                f"for {len(keys)} keys"
            )
        key_set = pa.array(np.asarray(keys, dtype=np.int64))

        def exact(t: pa.Table) -> pa.Table:
            m = pc.is_in(t["o_orderkey"], value_set=key_set)
            t = t.filter(m)
            return pa.table(
                {
                    "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                    "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                    "o_totalprice": pc.cast(t["o_totalprice"], pa.float64()),
                }
            )

        return (
            pruned.map_batches(exact, batch_format="pyarrow")
            .sort("o_orderkey")
            .materialize()
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query(
    "copartitioned_customer_orders_join",
    sql="""
SELECT c.c_custkey, CAST(c.c_acctbal AS DOUBLE) AS c_acctbal,
       o.o_orderkey, CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
WHERE o.o_totalprice > 450000
""",
)
def copartitioned_customer_orders_join(sf_dir: str) -> ray.data.Dataset:
    """WRITE-ONCE / JOIN-FOREVER: customer and orders are each written
    through the resumable sink under the SAME partition law on the join
    key (``partition_of(custkey, 8)``), then joined with ZERO shuffles —
    ``state.manifest.read_copartitioned_join`` runs one map task per
    partition PAIR because matching keys already share a fragment. The
    100 TB contract this demonstrates: pay the partitioned write once,
    and every later join of co-partitioned tables (the fact/dimension
    refresh cycle) is embarrassingly parallel with no all-to-all. Layout
    agreement is validated from the manifests before any byte is read."""
    import shutil
    import tempfile

    from ocr_ray.state.manifest import (
        ResumableSink,
        _check_layout,
        partition_of,
        read_copartitioned_join,
    )

    NPARTS = 8
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    dirs = {
        "c": tempfile.mkdtemp(prefix="ocr_ray_copart_c_"),
        "o": tempfile.mkdtemp(prefix="ocr_ray_copart_o_"),
    }
    for d in dirs.values():
        shutil.rmtree(d)
    try:
        def write_partitioned(ds, out, key):
            _check_layout(out, NPARTS, write=True)
            sink = ResumableSink(out, data_format="parquet")

            def tag(t: pa.Table) -> pa.Table:
                return t.append_column(
                    "_part", pa.array(partition_of(t[key], NPARTS))
                )

            def write_part(g: pd.DataFrame) -> pa.Table:
                part = int(g["_part"].iloc[0])
                tbl = pa.Table.from_pandas(
                    g.drop(columns=["_part"]), preserve_index=False
                ).replace_schema_metadata(None)
                return sink.write(tbl, part)

            n = (
                ds.map_batches(tag, batch_format="pyarrow")
                .groupby("_part")
                .map_groups(write_part, batch_format="pandas")
                .count()
            )
            assert n == NPARTS

        write_partitioned(
            cust.map_batches(
                lambda t: t.rename_columns(["custkey", "c_acctbal"]),
                batch_format="pyarrow",
            ),
            dirs["c"],
            "custkey",
        )
        write_partitioned(
            orders.map_batches(
                lambda t: pa.table(
                    {
                        "o_orderkey": t["o_orderkey"],
                        "custkey": t["o_custkey"],
                        "o_totalprice": t["o_totalprice"],
                    }
                ),
                batch_format="pyarrow",
            ),
            dirs["o"],
            "custkey",
        )

        joined_schema = pa.schema(
            {
                "custkey": pa.int64(),
                "c_acctbal": pa.float64(),
                "o_orderkey": pa.int64(),
                "o_totalprice": pa.float64(),
            }
        )
        joined = read_copartitioned_join(
            dirs["c"], dirs["o"], on="custkey", schema=joined_schema
        )

        def project(t: pa.Table) -> pa.Table:
            t = t.filter(pc.greater(t["o_totalprice"], 450000.0))
            return pa.table(
                {
                    "c_custkey": t["custkey"],
                    "c_acctbal": t["c_acctbal"],
                    "o_orderkey": t["o_orderkey"],
                    "o_totalprice": t["o_totalprice"],
                }
            )

        return joined.map_batches(project, batch_format="pyarrow").materialize()
    finally:
        for d in dirs.values():
            shutil.rmtree(d, ignore_errors=True)


@query(
    "orders_metadata_only_stats",
    sql="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
  CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
  CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
FROM orders
""",
)
def orders_metadata_only_stats(sf_dir: str) -> pa.Table:
    """METADATA-ONLY query: count/min/max answered from the manifest's
    automatic per-column zone maps with ZERO data files opened. The
    runtime gate is brutal and unambiguous: after the partitioned write,
    every data file is DELETED from a copy of the layout, and the
    answers must still come back (then verify bit-exact vs SQL over the
    real table) — reading a single data byte would crash. At 100 TB this
    is the difference between an instant manifest fold and a full scan
    for the commonest profiling queries."""
    import shutil
    import tempfile
    from pathlib import Path as _P

    from ocr_ray.functions.hashing import mix64
    from ocr_ray.state.manifest import ResumableSink, manifest_aggregate

    NPARTS = 8
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    out = tempfile.mkdtemp(prefix="ocr_ray_meta_")
    shutil.rmtree(out)
    try:
        sink = ResumableSink(out, data_format="parquet")

        def tag(t: pa.Table) -> pa.Table:
            h = mix64(
                t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
            )
            return t.append_column(
                "_part", pa.array((h % np.uint64(NPARTS)).astype(np.int32))
            )

        def write_part(g: pd.DataFrame) -> pa.Table:
            part = int(g["_part"].iloc[0])
            tbl = pa.Table.from_pandas(
                g.drop(columns=["_part"]), preserve_index=False
            ).replace_schema_metadata(None)
            return sink.write(tbl, part)

        n = (
            ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_part")
            .map_groups(write_part, batch_format="pandas")
            .count()
        )
        assert n == NPARTS
        for f in _P(out).glob("part=*/data.parquet"):
            f.unlink()  # the gate: metadata must suffice without data bytes
        total = manifest_aggregate(out)
        keys = manifest_aggregate(out, "o_orderkey")
        price = manifest_aggregate(out, "o_totalprice")
        return pa.table(
            {
                "n_rows": pa.array([total["row_count"]], pa.int64()),
                "min_key": pa.array([keys["min"]], pa.int64()),
                "max_key": pa.array([keys["max"]], pa.int64()),
                "min_price": pa.array([price["min"]], pa.float64()),
                "max_price": pa.array([price["max"]], pa.float64()),
            }
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query(
    "orders_zorder_pruned_scan",
    sql="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders WHERE o_totalprice BETWEEN 200000 AND 300000
""",
)
def orders_zorder_pruned_scan(sf_dir: str) -> ray.data.Dataset:
    """Z-ORDER multi-column clustering: orders are exported in Morton
    (o_custkey, o_totalprice) order into 32 tiles
    (``state.manifest.zorder_export``), so the automatic per-fragment
    stats prune range predicates on EITHER column — the property no
    single-column sort has (its second column spans every fragment).
    Runtime gates measure exactly that: a price-band prune AND a
    custkey-band prune must each skip >= 4/32 fragments from the
    manifest alone. The returned aggregate runs over the price-pruned
    read with the residual filter; the oracle proves pruning lost no
    rows."""
    import shutil
    import tempfile

    from ray.data.aggregate import Count, Sum

    from ocr_ray.functions.relational import to_units, units_to_double
    from ocr_ray.state.manifest import read_range_pruned, zorder_export

    P_LO, P_HI = 200_000.0, 300_000.0
    ds = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    out = tempfile.mkdtemp(prefix="ocr_ray_zorder_")
    shutil.rmtree(out)
    try:
        zorder_export(
            ds,
            out,
            cols=("o_custkey", "o_totalprice"),
            tiebreak_col="o_orderkey",
            out_cols=["o_orderkey", "o_custkey", "o_totalprice"],
            num_fragments=32,
        )
        pruned, skipped_price = read_range_pruned(
            out, lo=P_LO, hi=P_HI, column="o_totalprice"
        )
        # the second dimension prunes on the SAME layout (data-derived
        # band: middle quarter of the key range)
        from ocr_ray.state.manifest import load_manifest

        stats = [r["stats"]["o_custkey"] for r in load_manifest(out).values()]
        ck_lo = min(s[0] for s in stats)
        ck_hi = max(s[1] for s in stats)
        band = (
            ck_lo + 0.375 * (ck_hi - ck_lo),
            ck_lo + 0.625 * (ck_hi - ck_lo),
        )
        _, skipped_ck = read_range_pruned(
            out, lo=band[0], hi=band[1], column="o_custkey"
        )
        if skipped_price < 4 or skipped_ck < 4:
            raise AssertionError(
                f"z-order should prune BOTH dimensions (price skipped "
                f"{skipped_price}, custkey skipped {skipped_ck} of 32)"
            )

        def residual(t: pa.Table) -> pa.Table:
            m = pc.and_(
                pc.greater_equal(t["o_totalprice"], P_LO),
                pc.less_equal(t["o_totalprice"], P_HI),
            )
            t = t.filter(m)
            return pa.table({"price_c": to_units(t["o_totalprice"])})

        agg = (
            pruned.map_batches(residual, batch_format="pyarrow")
            .groupby(None)
            .aggregate(
                Count(alias_name="n_rows"), Sum("price_c", alias_name="sum_c")
            )
        )

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "n_rows": df["n_rows"].astype(np.int64),
                    "sum_price": units_to_double(df["sum_c"], 2),
                }
            )

        return agg.map_batches(finalize, batch_format="pandas").materialize()
    finally:
        shutil.rmtree(out, ignore_errors=True)
