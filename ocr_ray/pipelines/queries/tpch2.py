"""Query registry section: tpch2 (split from the former monolithic queries.py)."""

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
from ocr_ray.sizing import buckets_for_input, default_buckets
from ocr_ray.sources import read_table

from ocr_ray.pipelines.queries._shared import arrow_topk, load_small_table, query


# ---------------------------------------------------------------------------
# TPC-H shape completion (round 2h): the remaining 12 canonical query shapes,
# adapted to the available star schema (no partsupp / phone / commitdate
# columns — each docstring names the substitution). With these, all 22
# TPC-H query *shapes* (the access patterns, not the literal spec text)
# have a distributed implementation + bit-exact DuckDB oracle.
# ---------------------------------------------------------------------------


@query(
    "q12_priority_by_linestatus",
    sql="""
SELECT l_linestatus,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
    AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
    AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus ORDER BY l_linestatus
""",
)
def q12_priority_by_linestatus(sf_dir: str) -> ray.data.Dataset:
    """TPC-H q12 shape (shipmode -> l_linestatus, commitdate window ->
    shipdate window): large-large join + conditional counts. ONE bucketed
    shuffle; the CASE aggregation runs inside the join bucket so only
    2 x num_buckets x |linestatus| partial rows leave the shuffle."""
    from ray.data.aggregate import Sum

    lo, hi = datetime.datetime(1997, 1, 1), datetime.datetime(1998, 1, 1)
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_linestatus", "l_shipdate"])

    def prep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["l_shipdate"], pa.scalar(lo)), pc.less(t["l_shipdate"], pa.scalar(hi))
        )
        return t.filter(m).select(["l_orderkey", "l_linestatus"])

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    high = {"1-URGENT", "2-HIGH"}

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        is_high = df["o_orderpriority"].isin(high).to_numpy()
        red = pd.DataFrame({"l_linestatus": df["l_linestatus"], "hi": is_high.astype(np.int64)})
        out = red.groupby("l_linestatus", as_index=False).agg(
            high_n=("hi", "sum"), total=("hi", "size")
        )
        out["low_n"] = out["total"] - out["high_n"]
        return out[["l_linestatus", "high_n", "low_n"]]

    partials = hash_join(
        li.map_batches(prep, batch_format="pyarrow"),
        orders,
        on="l_orderkey",
        right_on="o_orderkey",
        num_buckets=default_buckets(),
        left_schema=pa.schema({"l_orderkey": pa.int64(), "l_linestatus": pa.string()}),
        right_schema=pa.schema({"o_orderkey": pa.int64(), "o_orderpriority": pa.string()}),
        bucket_post=combine,
        post_schema=pa.schema(
            {"l_linestatus": pa.string(), "high_n": pa.int64(), "low_n": pa.int64()}
        ),
    )

    agg = partials.groupby("l_linestatus").aggregate(
        Sum("high_n", alias_name="high_line_count"), Sum("low_n", alias_name="low_line_count")
    )
    return agg.sort("l_linestatus")


@query(
    "q13_customer_distribution",
    sql="""
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) GROUP BY c_count ORDER BY custdist DESC, c_count DESC
""",
)
def q13_customer_distribution(sf_dir: str) -> ray.data.Dataset:
    """TPC-H q13 shape (comment-pattern filter -> priority filter):
    LEFT OUTER join with a filtered fact side, then an aggregate OF an
    aggregate. Orders pre-aggregate to per-custkey counts (map-side
    partial + groupby), the outer join's null side becomes c_count=0
    inside the bucket body, and the count distribution is a second tiny
    groupby over (c_count) partials."""
    from ray.data.aggregate import Sum

    from ocr_ray.functions.relational import bucketed_aggregate

    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])

    def per_batch(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["o_orderpriority"], "1-URGENT"))
        df = pd.DataFrame({"o_custkey": t["o_custkey"].to_numpy(zero_copy_only=False)})
        red = df.groupby("o_custkey", as_index=False).size()
        return pa.table(
            {
                "o_custkey": pa.array(red["o_custkey"].to_numpy(dtype=np.int64)),
                "n": pa.array(red["size"].to_numpy(dtype=np.int64)),
            }
        )

    # per-custkey counts are HIGH-cardinality — Dataset.aggregate pays a
    # per-group Python fold; the bucketed numpy fold is ~70x cheaper (q18)
    counts = bucketed_aggregate(
        orders.map_batches(per_batch, batch_format="pyarrow"),
        keys=["o_custkey"],
        aggs={"c_count": ("n", "sum")},
    )

    cust = read_table(sf_dir, "customer", columns=["c_custkey"])

    def dist(df: pd.DataFrame) -> pd.DataFrame:
        cc = df["c_count"].fillna(0).astype(np.int64)
        red = pd.DataFrame({"c_count": cc}).groupby("c_count", as_index=False).size()
        return pd.DataFrame(
            {"c_count": red["c_count"], "n": red["size"].astype(np.int64)}
        )

    partials = hash_join(
        cust,
        counts,
        on="c_custkey",
        right_on="o_custkey",
        how="left",
        num_buckets=default_buckets(),
        left_schema=pa.schema({"c_custkey": pa.int64()}),
        right_schema=pa.schema({"o_custkey": pa.int64(), "c_count": pa.int64()}),
        bucket_post=dist,
        post_schema=pa.schema({"c_count": pa.int64(), "n": pa.int64()}),
    )

    agg = partials.groupby("c_count").aggregate(Sum("n", alias_name="custdist"))

    def finalize(t: pa.Table) -> pa.Table:
        return arrow_topk(
            t, [("custdist", "descending"), ("c_count", "descending")]
        )

    # distribution is tiny (max orders-per-customer rows); sort on driver
    return agg.map_batches(finalize, batch_format="pyarrow")


@query(
    "q15_top_revenue_supplier",
    sql="""
WITH revenue AS (
  SELECT l_suppkey,
    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = l_suppkey
WHERE rev = (SELECT MAX(rev) FROM revenue)
ORDER BY s_suppkey
""",
)
def q15_top_revenue_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H q15 shape (view + max-over-aggregate): distributed
    per-supplier revenue (map-side integer-unit partials + one groupby to
    supplier cardinality), then the argmax WITH TIES resolved on the
    <=|supplier| aggregate — the fact table never materializes and never
    shuffles twice."""
    from ray.data.aggregate import Sum

    lo, hi = datetime.datetime(1996, 1, 1), datetime.datetime(1996, 4, 1)
    li = read_table(
        sf_dir, "lineitem", columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"]
    )

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["l_shipdate"], pa.scalar(lo)), pc.less(t["l_shipdate"], pa.scalar(hi))
        )
        t = t.filter(m)
        df = pd.DataFrame(
            {
                "l_suppkey": t["l_suppkey"].to_numpy(zero_copy_only=False),
                "rev_u4": pc.multiply(
                    to_units(t["l_extendedprice"]),
                    pc.subtract(pa.scalar(100, type=pa.int64()), to_units(t["l_discount"])),
                ).to_numpy(zero_copy_only=False),
            }
        )
        red = df.groupby("l_suppkey", as_index=False)["rev_u4"].sum()
        return pa.Table.from_pandas(red, preserve_index=False).replace_schema_metadata(None)

    from ocr_ray.functions.relational import bucketed_aggregate

    rev = bucketed_aggregate(
        li.map_batches(partial, batch_format="pyarrow"),
        keys=["l_suppkey"],
        aggs={"rev_u4": ("rev_u4", "sum")},
    ).to_pandas()  # one row per supplier (dimension cardinality)
    best = rev[rev["rev_u4"] == rev["rev_u4"].max()]
    sup = load_small_table(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    out = best.merge(sup, left_on="l_suppkey", right_on="s_suppkey").sort_values("s_suppkey")
    return pd.DataFrame(
        {
            "s_suppkey": out["s_suppkey"].to_numpy(dtype=np.int64),
            "s_name": out["s_name"],
            "total_revenue": units_to_double(out["rev_u4"], 4),
        }
    ).reset_index(drop=True)


@query(
    "q17_small_quantity_revenue",
    sql="""
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS DOUBLE)
  AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3'
  AND 5 * CAST(l_quantity AS BIGINT)
        * (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
      < (SELECT CAST(SUM(l_quantity) AS BIGINT) FROM lineitem l2
         WHERE l2.l_partkey = lineitem.l_partkey)
""",
)
def q17_small_quantity_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H q17 shape: correlated per-partkey average as ONE bucketed
    shuffle — every row of a partkey colocates in its bucket, so the
    per-partkey count/sum, the below-0.2x-avg filter and the revenue
    partial all run inside the bucket body. The 0.2 x avg comparison is
    integer-exact on both sides (5*qty*count < sum(qty); quantities are
    integer-valued), so the oracle matches bit-for-bit with no float
    threshold ambiguity. Brand filter is a broadcast partkey-set
    pushdown BEFORE the shuffle (partkey determines brand, so the
    correlated subquery's row set is unchanged)."""
    part = load_small_table(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    keys_ref = ray.put(set(part.loc[part["p_brand"] == "Brand#3", "p_partkey"].astype(int)))

    li = semi_filter(
        read_table(sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"]),
        keys_ref,
        "l_partkey",
    )

    # size from a fresh metadata-only read: ``li`` is semi-filtered (a
    # computed dataset), whose size_bytes() would execute the plan
    num_buckets = buckets_for_input(read_table(sf_dir, "lineitem", columns=["l_partkey"]))

    def bucketize(t: pa.Table) -> pa.Table:
        from ocr_ray.functions.hashing import mix64

        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = (mix64(pk.view(np.uint64)) % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("_bucket", pa.array(b))

    def body(df: pd.DataFrame) -> pd.DataFrame:
        qty = df["l_quantity"].to_numpy(dtype=np.int64)
        g = df.groupby("l_partkey")["l_quantity"]
        cnt = g.transform("size").to_numpy(dtype=np.int64)
        sq = g.transform("sum").to_numpy(dtype=np.int64)
        keep = 5 * qty * cnt < sq
        price_u2 = np.rint(df["l_extendedprice"].to_numpy(dtype=np.float64)[keep] * 100).astype(
            np.int64
        )
        return pd.DataFrame({"sum_u2": [int(price_u2.sum())]})

    partials = (
        li.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(body, batch_format="pandas")
        .to_pandas()  # <= num_buckets rows
    )
    total = int(partials["sum_u2"].sum())
    return pd.DataFrame({"avg_yearly": [units_to_double(np.array([total]), 2)[0] / 7.0]})


@query(
    "q19_disjunctive_join_revenue",
    sql="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))))
  AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
        AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
        AND l_quantity >= 20 AND l_quantity <= 30)
""",
)
def q19_disjunctive_join_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H q19 shape: join with a DISJUNCTION of multi-column predicates
    spanning both sides. Per-branch single-side conjuncts are pushed to
    the reads (brand set prunes part rows, the quantity-range union
    prunes lineitem rows); the cross-side disjunction evaluates
    vectorized inside the join bucket, emitting one partial-sum row per
    bucket."""
    branches = [
        ("Brand#1", 1, 15, 1, 11),
        ("Brand#2", 1, 25, 10, 20),
        ("Brand#3", 1, 35, 20, 30),
    ]
    brands = {b for b, *_ in branches}
    qlo = min(b[3] for b in branches)
    qhi = max(b[4] for b in branches)

    li = read_table(
        sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]
    )

    def prep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["l_quantity"], pa.scalar(float(qlo))),
            pc.less_equal(t["l_quantity"], pa.scalar(float(qhi))),
        )
        t = t.filter(m)
        return pa.table(
            {
                "l_partkey": t["l_partkey"],
                "l_quantity": t["l_quantity"],
                "rev_u4": pc.multiply(
                    to_units(t["l_extendedprice"]),
                    pc.subtract(pa.scalar(100, type=pa.int64()), to_units(t["l_discount"])),
                ),
            }
        )

    part = read_table(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])

    def part_prune(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["p_brand"], value_set=pa.array(sorted(brands))))

    def disjunction(df: pd.DataFrame) -> pd.DataFrame:
        qty = df["l_quantity"].to_numpy(dtype=np.float64)
        size = df["p_size"].to_numpy(dtype=np.int64)
        brand = df["p_brand"].to_numpy()
        mask = np.zeros(len(df), dtype=bool)
        for b, slo, shi, blo, bhi in branches:
            mask |= (brand == b) & (size >= slo) & (size <= shi) & (qty >= blo) & (qty <= bhi)
        return pd.DataFrame({"rev_u4": [int(df["rev_u4"].to_numpy(dtype=np.int64)[mask].sum())]})

    partials = hash_join(
        li.map_batches(prep, batch_format="pyarrow"),
        part.map_batches(part_prune, batch_format="pyarrow"),
        on="l_partkey",
        right_on="p_partkey",
        num_buckets=default_buckets(),
        left_schema=pa.schema(
            {"l_partkey": pa.int64(), "l_quantity": pa.float64(), "rev_u4": pa.int64()}
        ),
        right_schema=pa.schema(
            {"p_partkey": pa.int64(), "p_brand": pa.string(), "p_size": pa.int64()}
        ),
        bucket_post=disjunction,
        post_schema=pa.schema({"rev_u4": pa.int64()}),
    ).to_pandas()  # <= num_buckets rows
    return pd.DataFrame(
        {"revenue": [units_to_double(np.array([partials["rev_u4"].sum()]), 4)[0]]}
    )


@query(
    "q16_supplier_count_by_part_attrs",
    sql="""
SELECT p_brand, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_size ORDER BY supplier_cnt DESC, p_brand, p_size
""",
)
def q16_supplier_count_by_part_attrs(sf_dir: str) -> ray.data.Dataset:
    """TPC-H q16 shape (partsupp -> the lineitem supplier-part relation;
    complaint-comment suppliers -> negative-balance suppliers): COUNT
    DISTINCT over a join. Bucket join on partkey emits DISTINCT
    (brand, size, suppkey) triples per bucket (bucket-local dedup — the
    global triple can recur across partkeys in other buckets), then a
    second groupby on (brand, size) counts distinct suppliers with a
    group body bounded by supplier cardinality."""
    sizes = [1, 9, 14, 19, 23, 36, 45, 49]
    sup = load_small_table(sf_dir, "supplier", ["s_suppkey", "s_acctbal"]).to_pandas()
    bad_ref = ray.put(set(sup.loc[sup["s_acctbal"] < 0.0, "s_suppkey"].astype(int)))

    li = semi_filter(
        read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"]),
        bad_ref,
        "l_suppkey",
        anti=True,
    )

    part = read_table(sf_dir, "part", columns=["p_partkey", "p_brand", "p_type", "p_size"])

    def part_prune(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.not_equal(t["p_brand"], "Brand#1"), pc.not_equal(t["p_type"], "PROMO")
            ),
            pc.is_in(t["p_size"], value_set=pa.array(sizes, type=t["p_size"].type)),
        )
        return t.filter(m).select(["p_partkey", "p_brand", "p_size"])

    def local_distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df[["p_brand", "p_size", "l_suppkey"]].drop_duplicates()

    triples = hash_join(
        li,
        part.map_batches(part_prune, batch_format="pyarrow"),
        on="l_partkey",
        right_on="p_partkey",
        num_buckets=default_buckets(),
        left_schema=pa.schema({"l_partkey": pa.int64(), "l_suppkey": pa.int64()}),
        right_schema=pa.schema(
            {"p_partkey": pa.int64(), "p_brand": pa.string(), "p_size": pa.int64()}
        ),
        bucket_post=local_distinct,
        post_schema=pa.schema(
            {"p_brand": pa.string(), "p_size": pa.int64(), "l_suppkey": pa.int64()}
        ),
    )

    def nunique(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "p_brand": [df["p_brand"].iloc[0]],
                "p_size": [np.int64(df["p_size"].iloc[0])],
                "supplier_cnt": [np.int64(df["l_suppkey"].nunique())],
            }
        )

    agg = triples.groupby(["p_brand", "p_size"]).map_groups(nunique, batch_format="pandas")

    def finalize(t: pa.Table) -> pa.Table:
        return arrow_topk(
            t,
            [
                ("supplier_cnt", "descending"),
                ("p_brand", "ascending"),
                ("p_size", "ascending"),
            ],
        )

    # result cardinality = |brand| x |size| (tiny); sort on driver
    return agg.map_batches(finalize, batch_format="pyarrow")


@query(
    "q20_qualified_suppliers",
    sql="""
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#2'
    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey
  HAVING CAST(SUM(l_quantity) AS BIGINT) > 120
) ORDER BY s_suppkey
""",
)
def q20_qualified_suppliers(sf_dir: str) -> pd.DataFrame:
    """TPC-H q20 shape (available-quantity threshold over partsupp -> a
    shipped-quantity threshold over the lineitem supplier-part relation):
    nested IN over a HAVING aggregate. Brand partkeys broadcast-prune the
    fact read, per-supplier quantity sums run map-side + one groupby to
    supplier cardinality, and the HAVING filter + name join resolve on
    the dimension-sized aggregate. Quantities are integer-valued, so the
    threshold is integer-exact."""
    from ray.data.aggregate import Sum

    part = load_small_table(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    keys_ref = ray.put(set(part.loc[part["p_brand"] == "Brand#2", "p_partkey"].astype(int)))
    lo, hi = datetime.datetime(1996, 1, 1), datetime.datetime(1997, 1, 1)

    li = semi_filter(
        read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"]),
        keys_ref,
        "l_partkey",
    )

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["l_shipdate"], pa.scalar(lo)), pc.less(t["l_shipdate"], pa.scalar(hi))
        )
        t = t.filter(m)
        df = pd.DataFrame(
            {
                "l_suppkey": t["l_suppkey"].to_numpy(zero_copy_only=False),
                "qty": t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        red = df.groupby("l_suppkey", as_index=False)["qty"].sum()
        return pa.Table.from_pandas(red, preserve_index=False).replace_schema_metadata(None)

    from ocr_ray.functions.relational import bucketed_aggregate

    sums = bucketed_aggregate(
        li.map_batches(partial, batch_format="pyarrow"),
        keys=["l_suppkey"],
        aggs={"qty": ("qty", "sum")},
    ).to_pandas()  # one row per supplier (dimension cardinality)
    hit = set(sums.loc[sums["qty"] > 120, "l_suppkey"].astype(int))
    sup = load_small_table(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    out = sup[sup["s_suppkey"].isin(hit)].sort_values("s_suppkey")
    return pd.DataFrame(
        {"s_suppkey": out["s_suppkey"].to_numpy(dtype=np.int64), "s_name": out["s_name"]}
    ).reset_index(drop=True)


@query(
    "q21_waiting_suppliers",
    sql="""
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10
""",
)
def q21_waiting_suppliers(sf_dir: str) -> pd.DataFrame:
    """TPC-H q21 shape (receipt-after-commit -> returnflag 'R'): per-l1-row
    EXISTS / NOT EXISTS over sibling lineitems of the same order. ONE
    bucketed join on orderkey colocates every line of an order with its
    order row; the bucket body computes, per order, the distinct-supplier
    count (EXISTS) and the distinct count of suppliers with an 'R' line
    (NOT EXISTS <=> that count == 1 and it is me), all with vectorized
    pandas group transforms — no per-order Python. Partial per-supplier
    counts leave the shuffle; the final top-10 folds a supplier-sized
    aggregate."""
    from ray.data.aggregate import Sum

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_returnflag"])
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"])

    def ostat(t: pa.Table) -> pa.Table:
        # keep only the F marker; other orders join as nulls (how='left')
        return t.filter(pc.equal(t["o_orderstatus"], "F"))

    def body(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_orderkey")
        nsupp = g["l_suppkey"].transform("nunique").to_numpy()
        is_r = (df["l_returnflag"] == "R").to_numpy()
        rsupp = df["l_suppkey"].where(pd.Series(is_r, index=df.index))
        n_rsupp = rsupp.groupby(df["l_orderkey"]).transform("nunique").to_numpy()
        # the only R supplier in the order is me <=> my line is R and the
        # order's distinct R-supplier count is exactly 1
        qual = (
            df["o_orderstatus"].notna().to_numpy()
            & is_r
            & (nsupp >= 2)
            & (n_rsupp == 1)
        )
        red = (
            pd.DataFrame({"l_suppkey": df["l_suppkey"].to_numpy()[qual]})
            .groupby("l_suppkey", as_index=False)
            .size()
        )
        return pd.DataFrame(
            {
                "l_suppkey": red["l_suppkey"].to_numpy(dtype=np.int64),
                "n": red["size"].to_numpy(dtype=np.int64),
            }
        )

    partials = hash_join(
        li,
        orders.map_batches(ostat, batch_format="pyarrow"),
        on="l_orderkey",
        right_on="o_orderkey",
        how="left",
        num_buckets=default_buckets(),
        left_schema=pa.schema(
            {"l_orderkey": pa.int64(), "l_suppkey": pa.int64(), "l_returnflag": pa.string()}
        ),
        right_schema=pa.schema({"o_orderkey": pa.int64(), "o_orderstatus": pa.string()}),
        bucket_post=body,
        post_schema=pa.schema({"l_suppkey": pa.int64(), "n": pa.int64()}),
    )

    from ocr_ray.functions.relational import bucketed_aggregate

    counts = bucketed_aggregate(
        partials, keys=["l_suppkey"], aggs={"numwait": ("n", "sum")}
    ).to_pandas()  # one row per supplier
    sup = load_small_table(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    out = counts.merge(sup, left_on="l_suppkey", right_on="s_suppkey").sort_values(
        ["numwait", "s_name"], ascending=[False, True], kind="mergesort"
    ).head(10)
    return pd.DataFrame(
        {"s_name": out["s_name"], "numwait": out["numwait"].to_numpy(dtype=np.int64)}
    ).reset_index(drop=True)


@query(
    "q22_idle_rich_customers",
    sql="""
WITH pos AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s, COUNT(*) AS n
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * (SELECT n FROM pos) > (SELECT s FROM pos)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey ORDER BY c_nationkey
""",
)
def q22_idle_rich_customers(sf_dir: str) -> ray.data.Dataset:
    """TPC-H q22 shape (phone country code -> c_nationkey; "has no orders"
    -> "has no urgent orders", which is non-degenerate on this corpus): a
    global scalar-subquery threshold + NOT EXISTS anti join + aggregate. The
    above-average test is integer-exact on both sides
    (bal_units * count > sum_units — no float average), the positive-
    balance moments come from one map-side partial pass, and the anti
    join is the exact bucketed form over per-batch-deduped order keys."""
    from ray.data.aggregate import Sum

    cust_cols = ["c_custkey", "c_nationkey", "c_acctbal"]
    cust = read_table(sf_dir, "customer", columns=cust_cols)

    def pos_moments(t: pa.Table) -> pa.Table:
        bal = to_units(t["c_acctbal"]).to_numpy(zero_copy_only=False)
        pos = bal[bal > 0]
        return pa.table(
            {"s_u2": pa.array([int(pos.sum())]), "n": pa.array([int(len(pos))])}
        )

    mom = (
        cust.map_batches(pos_moments, batch_format="pyarrow").to_pandas()
    )  # one row per input block
    s_u2, n_pos = int(mom["s_u2"].sum()), int(mom["n"].sum())

    def rich(t: pa.Table) -> pa.Table:
        bal = to_units(t["c_acctbal"]).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(bal * n_pos > s_u2))

    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])

    def keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderpriority"], "1-URGENT"))
        return pa.table({"o_custkey": pc.unique(t["o_custkey"])})

    idle = hash_join(
        cust.map_batches(rich, batch_format="pyarrow"),
        orders.map_batches(keys, batch_format="pyarrow"),
        on="c_custkey",
        right_on="o_custkey",
        how="anti",
        num_buckets=default_buckets(),
        left_schema=pa.schema(
            {"c_custkey": pa.int64(), "c_nationkey": pa.int64(), "c_acctbal": pa.float64()}
        ),
        right_schema=pa.schema({"o_custkey": pa.int64()}),
    )

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "c_nationkey": t["c_nationkey"].to_numpy(zero_copy_only=False),
                "bal_u2": to_units(t["c_acctbal"]).to_numpy(zero_copy_only=False),
            }
        )
        red = df.groupby("c_nationkey", as_index=False).agg(
            n=("bal_u2", "size"), s=("bal_u2", "sum")
        )
        return pa.Table.from_pandas(red, preserve_index=False).replace_schema_metadata(None)

    agg = (
        idle.map_batches(partial, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(Sum("n", alias_name="numcust"), Sum("s", alias_name="s_u2"))
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_nationkey": df["c_nationkey"].to_numpy(dtype=np.int64),
                "numcust": df["numcust"].to_numpy(dtype=np.int64),
                "totacctbal": units_to_double(df["s_u2"], 2),
            }
        )

    return agg.map_batches(finalize, batch_format="pandas").sort("c_nationkey")


@query(
    "q8_nation_market_share",
    sql="""
SELECT o_year,
  CAST(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN vol ELSE 0 END) AS DOUBLE)
     / CAST(SUM(vol) AS DOUBLE) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
    CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS vol,
    n2.n_name AS nation
  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
    AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
    AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
    AND s_nationkey = n2.n_nationkey
    AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    AND p_type = 'PROMO'
) GROUP BY o_year ORDER BY o_year
""",
)
def q8_nation_market_share(sf_dir: str) -> ray.data.Dataset:
    """TPC-H q8 shape: one supplier nation's share of region revenue per
    year. ONE shuffle total: the PROMO-partkey set, customer-region
    membership and supplier nation all ride broadcast semi-filters /
    lookups (dimension pattern; swap the part prune to
    ``hash_join(how='semi')`` — the q4/q8-at-scale form — when the part
    dimension outgrows broadcast), then the lineitem x orders equality
    join carries the per-year conditional partial sums out of its
    buckets. The share is ONE double division over exact integer-unit
    sums, matching the oracle bit-for-bit."""
    from ray.data.aggregate import Sum

    nation = load_small_table(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    region = load_small_table(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    asia_keys = set(
        nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
        .query("r_name == 'ASIA'")["n_nationkey"]
        .astype(int)
    )
    cust = load_small_table(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    cust_ref = ray.put(set(cust.loc[cust["c_nationkey"].isin(asia_keys), "c_custkey"].astype(int)))

    lo, hi = datetime.datetime(1996, 1, 1), datetime.datetime(1998, 1, 1)
    orders = semi_filter(
        read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]),
        cust_ref,
        "o_custkey",
    )

    def oyear(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo)), pc.less(t["o_orderdate"], pa.scalar(hi))
        )
        t = t.filter(m)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
            }
        )

    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"],
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": t["l_partkey"],
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "rev_u4": pc.multiply(
                    to_units(t["l_extendedprice"]),
                    pc.subtract(pa.scalar(100, type=pa.int64()), to_units(t["l_discount"])),
                ),
            }
        )

    part = load_small_table(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()
    promo_ref = ray.put(set(part.loc[part["p_type"] == "PROMO", "p_partkey"].astype(int)))
    li_promo = semi_filter(li.map_batches(prep, batch_format="pyarrow"), promo_ref, "l_partkey")

    n_ref = ray.put(
        {int(k): (nn,) for k, nn in zip(nation["n_nationkey"], nation["n_name"])}
    )
    sup = load_small_table(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    s_ref = ray.put({int(k): (int(nk),) for k, nk in zip(sup["s_suppkey"], sup["s_nationkey"])})

    li_n = lookup(li_promo, s_ref, "l_suppkey", [("s_nationkey", pa.int64())])
    li_n = lookup(li_n, n_ref, "s_nationkey", [("nation", pa.string())])

    def share_partial(df: pd.DataFrame) -> pd.DataFrame:
        rev = df["rev_u4"].to_numpy(dtype=np.int64)
        is3 = (df["nation"] == "NATION_3").to_numpy()
        red = pd.DataFrame({"o_year": df["o_year"], "n3": np.where(is3, rev, 0), "tot": rev})
        return red.groupby("o_year", as_index=False)[["n3", "tot"]].sum()

    partials = hash_join(
        li_n,
        orders.map_batches(oyear, batch_format="pyarrow"),
        on="l_orderkey",
        right_on="o_orderkey",
        num_buckets=default_buckets(),
        left_schema=pa.schema(
            {
                "l_partkey": pa.int64(),
                "l_orderkey": pa.int64(),
                "l_suppkey": pa.int64(),
                "rev_u4": pa.int64(),
                "s_nationkey": pa.int64(),
                "nation": pa.string(),
            }
        ),
        right_schema=pa.schema({"o_orderkey": pa.int64(), "o_year": pa.int64()}),
        bucket_post=share_partial,
        post_schema=pa.schema({"o_year": pa.int64(), "n3": pa.int64(), "tot": pa.int64()}),
    )

    agg = partials.groupby("o_year").aggregate(
        Sum("n3", alias_name="n3"), Sum("tot", alias_name="tot")
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_year": df["o_year"].to_numpy(dtype=np.int64),
                "mkt_share": units_to_double(df["n3"], 4) / units_to_double(df["tot"], 4),
            }
        )

    return agg.map_batches(finalize, batch_format="pandas").sort("o_year")


@query(
    "q9_profit_by_nation_year",
    sql="""
SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
    CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
      - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS amount
  FROM part, supplier, lineitem, orders, nation
  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey AND o_orderkey = l_orderkey
    AND s_nationkey = n_nationkey AND p_name LIKE '%red%'
) GROUP BY nation, o_year ORDER BY nation, o_year DESC
""",
)
def q9_profit_by_nation_year(sf_dir: str) -> ray.data.Dataset:
    """TPC-H q9 shape (ps_supplycost -> p_retailprice as the cost basis;
    '%green%' -> '%red%', present in this corpus's part names): profit per
    (supplier nation, order year) with a name-pattern part filter. ONE
    shuffle: the red-part retail prices and supplier nations ride
    broadcast lookups (the inner-lookup drop doubles as the name filter;
    swap to the bucketed join — q14/q19's form — when part outgrows
    broadcast), the per-line amount is computed map-side in integer units
    (so the oracle's DECIMAL arithmetic matches exactly), and the
    lineitem x orders join folds partial (nation, year) sums inside its
    buckets."""
    from ray.data.aggregate import Sum

    li = read_table(
        sf_dir,
        "lineitem",
        columns=[
            "l_partkey", "l_suppkey", "l_orderkey", "l_quantity", "l_extendedprice", "l_discount",
        ],
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": t["l_partkey"],
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "qty": pc.cast(t["l_quantity"], pa.int64()),
                "rev_u4": pc.multiply(
                    to_units(t["l_extendedprice"]),
                    pc.subtract(pa.scalar(100, type=pa.int64()), to_units(t["l_discount"])),
                ),
            }
        )

    part = load_small_table(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"]).to_pandas()
    red = part[part["p_name"].str.contains("red")]
    retail_ref = ray.put(
        {
            int(k): (int(r),)
            for k, r in zip(
                red["p_partkey"], np.rint(red["p_retailprice"].to_numpy() * 100).astype(np.int64)
            )
        }
    )
    # inner-lookup semantics: lines of non-red parts drop here
    j0 = lookup(
        li.map_batches(prep, batch_format="pyarrow"), retail_ref, "l_partkey",
        [("retail_u2", pa.int64())],
    )

    def amount(t: pa.Table) -> pa.Table:
        amt = (
            t["rev_u4"].to_numpy(zero_copy_only=False)
            - t["retail_u2"].to_numpy(zero_copy_only=False)
            * t["qty"].to_numpy(zero_copy_only=False)
            * 100
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "amount_u4": pa.array(amt, type=pa.int64()),
            }
        )

    j1 = j0.map_batches(amount, batch_format="pyarrow")

    nation = load_small_table(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    sup = load_small_table(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    s2n = sup.merge(nation, left_on="s_nationkey", right_on="n_nationkey")
    s_ref = ray.put({int(k): (nn,) for k, nn in zip(s2n["s_suppkey"], s2n["n_name"])})
    j1n = lookup(j1, s_ref, "l_suppkey", [("nation", pa.string())])

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def oyear(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
            }
        )

    def profit_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["nation", "o_year"], as_index=False)["amount_u4"].sum()

    partials = hash_join(
        j1n,
        orders.map_batches(oyear, batch_format="pyarrow"),
        on="l_orderkey",
        right_on="o_orderkey",
        num_buckets=default_buckets(),
        left_schema=pa.schema(
            {
                "l_orderkey": pa.int64(),
                "l_suppkey": pa.int64(),
                "amount_u4": pa.int64(),
                "nation": pa.string(),
            }
        ),
        right_schema=pa.schema({"o_orderkey": pa.int64(), "o_year": pa.int64()}),
        bucket_post=profit_partial,
        post_schema=pa.schema(
            {"nation": pa.string(), "o_year": pa.int64(), "amount_u4": pa.int64()}
        ),
    )

    agg = partials.groupby(["nation", "o_year"]).aggregate(Sum("amount_u4", alias_name="amount_u4"))

    def finalize(t: pa.Table) -> pa.Table:
        out = arrow_topk(t, [("nation", "ascending"), ("o_year", "descending")])
        return pa.table(
            {
                "nation": pc.cast(out["nation"], pa.string()),
                "o_year": pc.cast(out["o_year"], pa.int64()),
                "sum_profit": pa.array(
                    units_to_double(out["amount_u4"].to_numpy(zero_copy_only=False), 4)
                ),
            }
        )

    # |nation| x |year| rows: driver-side final sort
    return agg.map_batches(finalize, batch_format="pyarrow")


@query(
    "q11_part_value_share",
    sql="""
WITH pv AS (
  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS val
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT SUM(val) AS t, COUNT(*) AS np FROM pv)
SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
FROM pv, tot
WHERE CAST(val AS DOUBLE) > CAST(t AS DOUBLE) * (1.5 / np)
ORDER BY part_value DESC, l_partkey
""",
)
def q11_part_value_share(sf_dir: str) -> ray.data.Dataset:
    """TPC-H q11 shape (partsupp inventory value -> lineitem traded value;
    TPC-H's scale-dependent 0.0001/SF fraction -> 1.5x the MEAN part value,
    which is non-degenerate at every corpus size): a grouped aggregate
    filtered by a fraction of the GLOBAL total. The per-part aggregate
    materializes once (bounded by part cardinality — it IS the operator's
    output domain), the global moments (total, part count) fold from it in
    one tiny pass, and the threshold comparison uses the identical double
    expression as the oracle (nearest-doubles of exact integer-unit sums,
    one divide + one multiply)."""
    from ocr_ray.functions.relational import bucketed_aggregate

    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_partkey": t["l_partkey"].to_numpy(zero_copy_only=False),
                "val_u2": to_units(t["l_extendedprice"]).to_numpy(zero_copy_only=False),
            }
        )
        red = df.groupby("l_partkey", as_index=False)["val_u2"].sum()
        return pa.Table.from_pandas(red, preserve_index=False).replace_schema_metadata(None)

    # per-partkey sums are HIGH-cardinality -> bucketed numpy fold
    pv = bucketed_aggregate(
        li.map_batches(partial, batch_format="pyarrow"),
        keys=["l_partkey"],
        aggs={"val_u2": ("val_u2", "sum")},
    ).materialize()  # one row per part: the aggregate is the output domain

    mom = pv.map_batches(
        lambda t: pa.table(
            {
                "s": pa.array([int(np.sum(t["val_u2"].to_numpy()))]),
                "n": pa.array([t.num_rows]),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()  # one row per block
    threshold = (float(int(mom["s"].sum())) / 100.0) * (1.5 / int(mom["n"].sum()))

    def keep(t: pa.Table) -> pa.Table:
        val = units_to_double(t["val_u2"].to_numpy(zero_copy_only=False), 2)
        t = t.filter(pa.array(val > threshold))
        return pa.table(
            {
                "l_partkey": t["l_partkey"],
                "part_value": pa.array(
                    units_to_double(t["val_u2"].to_numpy(zero_copy_only=False), 2)
                ),
            }
        )

    return pv.map_batches(keep, batch_format="pyarrow").sort(
        ["part_value", "l_partkey"], descending=[True, False]
    )


