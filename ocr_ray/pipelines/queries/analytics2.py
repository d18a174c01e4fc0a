"""Query registry section: analytics2 (split from the former monolithic queries.py)."""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ocr_ray.corpus import ensure_corpus
from ocr_ray.functions.relational import hash_join, to_units
from ocr_ray.sizing import buckets_for_input, default_buckets, pool_size
from ocr_ray.sources import read_documents, read_table

from ocr_ray.pipelines.queries._shared import arrow_out, gate_by_sampled_recheck, query, read_docs


# ---------------------------------------------------------------------------
# Round-2i: skyline / regression / cohort retention / Markov transitions.
# ---------------------------------------------------------------------------


def local_skyline(t: pa.Table) -> pa.Table:
    """Block-local 2D skyline kernel (minimize p_retailprice, maximize
    p_size): sort by (price asc, size desc), keep each price group's
    max-size rows when that max strictly beats every cheaper group's best.
    Equal (price, size) ties don't dominate each other and are all kept.
    Module-level so the property test can drive it without a Ray session."""
    out_schema = pa.schema(
        [("p_partkey", pa.int64()), ("p_size", pa.int64()), ("p_retailprice", pa.float64())]
    )
    if t.num_rows == 0:
        return out_schema.empty_table()
    price = t["p_retailprice"].to_numpy()
    size = pc.cast(t["p_size"], pa.int64()).to_numpy()
    key = pc.cast(t["p_partkey"], pa.int64()).to_numpy()
    order = np.lexsort((key, -size, price))  # price asc, size desc, key asc
    p, s = price[order], size[order]
    new_price = np.empty(len(p), dtype=bool)
    new_price[0] = True
    new_price[1:] = p[1:] != p[:-1]
    grp = np.cumsum(new_price) - 1
    gmax = s[new_price]  # first row of each price group = that group's max size
    prev_best = np.concatenate([[np.iinfo(np.int64).min], np.maximum.accumulate(gmax)[:-1]])
    survive = gmax > prev_best
    keep = survive[grp] & (s == gmax[grp])
    idx = np.sort(order[keep])
    return pa.table(
        {
            "p_partkey": pa.array(key[idx], pa.int64()),
            "p_size": pa.array(size[idx], pa.int64()),
            "p_retailprice": pa.array(price[idx], pa.float64()),
        }
    )


@query(
    "skyline_parts",
    sql="""
SELECT a.p_partkey, CAST(a.p_size AS BIGINT) AS p_size, a.p_retailprice
FROM part a
WHERE NOT EXISTS (
  SELECT 1 FROM part b
  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
""",
)
def skyline_parts(sf_dir: str) -> ray.data.Dataset:
    """Distributed skyline (Pareto frontier: minimize price, maximize size).

    Local-prune pattern: each block computes its own skyline (the global
    skyline is a subset of the union of local skylines), so the data that
    reaches the final merge is tiny regardless of input size — the oracle's
    NOT EXISTS dominance scan is O(n^2); this is O(n log n) per block plus
    one small-merge. Ties kept: equal (price, size) points do not dominate
    each other.
    """
    ds = read_table(sf_dir, "part", columns=["p_partkey", "p_size", "p_retailprice"])

    local = ds.map_batches(local_skyline, batch_format="pyarrow")
    # local skylines are tiny; one block -> exact global skyline
    return local.repartition(1).map_batches(local_skyline, batch_format="pyarrow", batch_size=None)


@query(
    "regr_price_by_qty",
    sql="""
WITH u AS (
  SELECT l_returnflag AS returnflag,
    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS xc,
    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS yc
  FROM lineitem
), s AS (
  SELECT returnflag, COUNT(*) AS n, SUM(xc) AS sx, SUM(yc) AS sy,
         SUM(CAST(xc AS HUGEINT) * xc) AS sxx, SUM(CAST(xc AS HUGEINT) * yc) AS sxy
  FROM u GROUP BY returnflag
)
SELECT returnflag, CAST(n AS BIGINT) AS n_rows,
  CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
    / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS slope,
  (CAST(sy AS DOUBLE)
     - (CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
       * CAST(sx AS DOUBLE))
    / CAST(n AS DOUBLE) / 100.0 AS intercept
FROM s
""",
)
def regr_price_by_qty(sf_dir: str) -> ray.data.Dataset:
    """Per-group exact OLS regression (extendedprice ~ quantity per returnflag).

    Distributed as four integer partial sums (x, y, x^2, x*y in cent units)
    through ONE tiny groupby; the driver-side finalize does the closed-form
    slope/intercept on exact Python ints, then ONE float division each —
    mirrored operation-for-operation in the HUGEINT SQL so the doubles are
    bit-exact. Partial sums stay in int64: x<=5000c, y<=~1e7c per row, so
    sum(x*y) reaches int64 range only past ~10^8 rows per returnflag — at
    that scale split the sum into more groups (salt) or widen to float128.
    """
    from ray.data.aggregate import Count, Sum

    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def prep(t: pa.Table) -> pa.Table:
        # map-side COMBINE (the q1 partial+final idiom): fold each batch to
        # <= |returnflag| partial-sum rows BEFORE the shuffle — without it
        # the Ray aggregate sorts the whole table to produce 3 rows (the
        # r3-measured Dataset.aggregate pathology; this query was the one
        # bench regression in BENCH_r03).
        xc = to_units(t["l_quantity"])
        yc = to_units(t["l_extendedprice"])
        tbl = pa.table(
            {
                "returnflag": t["l_returnflag"],
                "xc": xc,
                "yc": yc,
                "xx": pc.multiply_checked(xc, xc),
                "xy": pc.multiply_checked(xc, yc),
            }
        )
        part = tbl.group_by("returnflag").aggregate(
            [([], "count_all"), ("xc", "sum"), ("yc", "sum"), ("xx", "sum"), ("xy", "sum")]
        )
        # select by NAME (pyarrow group_by output column order has varied
        # across versions; positional rename would silently shift stats)
        return pa.table(
            {
                "returnflag": part["returnflag"],
                "n": part["count_all"],
                "xc": part["xc_sum"],
                "yc": part["yc_sum"],
                "xx": part["xx_sum"],
                "xy": part["xy_sum"],
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("returnflag")
        .aggregate(
            Sum("n", alias_name="n_rows"),
            Sum("xc", alias_name="sx"),
            Sum("yc", alias_name="sy"),
            Sum("xx", alias_name="sxx"),
            Sum("xy", alias_name="sxy"),
        )
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for r in df.itertuples(index=False):
            n, sx, sy, sxx, sxy = (int(r.n_rows), int(r.sx), int(r.sy), int(r.sxx), int(r.sxy))
            den = n * sxx - sx * sx
            if den == 0:
                # degenerate group (single row / constant x): DuckDB's
                # 0/0 double division yields NULL — mirror with NaN
                rows.append((r.returnflag, n, np.nan, np.nan))
                continue
            slope = float(n * sxy - sx * sy) / float(den)
            intercept = (float(sy) - slope * float(sx)) / float(n) / 100.0
            rows.append((r.returnflag, n, slope, intercept))
        return pd.DataFrame(rows, columns=["returnflag", "n_rows", "slope", "intercept"])

    return agg.map_batches(finalize, batch_format="pandas")


@query(
    "cohort_retention",
    sql="""
WITH pairs AS (
  SELECT DISTINCT o_custkey, strftime(o_orderdate, '%Y-%m') AS order_month FROM orders
), coh AS (
  SELECT o_custkey, MIN(order_month) AS cohort_month FROM pairs GROUP BY o_custkey
)
SELECT cohort_month, order_month, COUNT(*) AS n_custs
FROM pairs JOIN coh USING (o_custkey)
GROUP BY cohort_month, order_month
""",
)
def cohort_retention(sf_dir: str) -> ray.data.Dataset:
    """Cohort retention matrix: customers active in month M by first-order
    cohort month. ONE custkey-bucketed shuffle — each bucket holds all of a
    customer's rows, so the in-bucket body does dedup + per-customer min +
    partial cell counts fully vectorized; the final groupby folds
    O(months^2) cells per bucket, independent of customer count.
    """
    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    nb = np.uint64(buckets_for_input(ds))

    def bucketize(t: pa.Table) -> pa.Table:
        ck = pc.cast(t["o_custkey"], pa.int64())
        m = pc.strftime(t["o_orderdate"], format="%Y-%m")
        h = pd.util.hash_array(ck.to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "custkey": ck,
                "order_month": m,
                "_bucket": pa.array((h % nb).astype(np.int32)),
            }
        )

    cell_schema = pa.schema(
        {"cohort_month": pa.string(), "order_month": pa.string(), "n_custs": pa.int64()}
    )

    def body(g: pd.DataFrame) -> pa.Table:
        g2 = g.drop_duplicates(["custkey", "order_month"])
        cm = g2.groupby("custkey")["order_month"].transform("min")
        part = (
            g2.assign(cohort_month=cm)
            .groupby(["cohort_month", "order_month"], sort=False)
            .size()
            .reset_index(name="n_custs")
        )
        return arrow_out(part, cell_schema)

    partials = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(body, batch_format="pandas")
    )
    # months^2-cardinality final fold: bucketed (the Dataset.aggregate
    # per-group fold costs ~0.14 ms/group — thousands of cells here)
    from ocr_ray.functions.relational import bucketed_aggregate

    return bucketed_aggregate(
        partials,
        keys=["cohort_month", "order_month"],
        aggs={"n_custs": ("n_custs", "sum")},
    )


@query(
    "event_transitions",
    sql="""
WITH s AS (
  SELECT user_id, event_type,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT prev AS from_type, event_type AS to_type, COUNT(*) AS n_pairs
FROM s WHERE prev IS NOT NULL GROUP BY prev, event_type
""",
)
def event_transitions(sf_dir: str) -> ray.data.Dataset:
    """Markov transition-edge counts over per-user event sequences.

    Same one-shuffle sequence idiom as ``user_sessions``: bucket by user so
    each user's timeline is complete inside a bucket, sort once per bucket,
    vectorized shift to pair consecutive events, partial (from, to) counts,
    then a final groupby over the tiny |event_type|^2 cell space.
    """
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])
    nb = np.uint64(buckets_for_input(ds))

    def bucketize(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t["user_id"].to_numpy(zero_copy_only=False))
        return t.append_column("_bucket", pa.array((h % nb).astype(np.int32)))

    edge_schema = pa.schema(
        {"from_type": pa.string(), "to_type": pa.string(), "n_pairs": pa.int64()}
    )
    empty_edges = edge_schema.empty_table()

    def body(g: pd.DataFrame) -> pa.Table:
        if len(g) < 2:
            return empty_edges
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        same = uid[1:] == uid[:-1]
        if not same.any():
            return empty_edges
        out = (
            pd.DataFrame({"from_type": et[:-1][same], "to_type": et[1:][same]})
            .groupby(["from_type", "to_type"], sort=False)
            .size()
            .reset_index(name="n_pairs")
        )
        return arrow_out(out, edge_schema)

    partials = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(body, batch_format="pandas")
    )
    return partials.groupby(["from_type", "to_type"]).aggregate(Sum("n_pairs", alias_name="n_pairs"))


@query(
    "event_pattern_users",
    sql="""
WITH s AS (
  SELECT user_id,
    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id
)
SELECT user_id, CAST(length(seq) AS BIGINT) AS seq_len,
       CAST(len(regexp_extract_all(seq, 'v[cv]*p')) AS BIGINT) AS n_matches
FROM s WHERE regexp_matches(seq, 'v[cv]*p')
""",
)
def event_pattern_users(sf_dir: str) -> ray.data.Dataset:
    """Sequence-pattern matching (MATCH_RECOGNIZE-style CEP) over per-user
    event streams: users whose ordered event-type sequence contains
    view (clicks/views)* purchase — i.e. a purchase reached from a view
    without leaving the browse funnel.

    One user-bucketed shuffle; each bucket encodes every user's timeline as
    a one-char-per-event string (event types have distinct initials) and
    runs ONE compiled regex per user. Non-overlapping leftmost match counts
    are identical between Python ``re`` and DuckDB's RE2 for this pattern
    class. Per-user sequences are the unit of work — the regex cost is the
    payload, not Python overhead.
    """
    import re as _re

    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])
    nb = np.uint64(buckets_for_input(ds))

    def bucketize(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t["user_id"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts": t["ts"],
                "event_id": t["event_id"],
                "c": pc.utf8_slice_codeunits(t["event_type"], 0, 1),
                "_bucket": pa.array((h % nb).astype(np.int32)),
            }
        )

    pat = _re.compile(r"v[cv]*p")

    hit_schema = pa.schema(
        {"user_id": pa.int64(), "seq_len": pa.int64(), "n_matches": pa.int64()}
    )

    def body(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        seqs = g.groupby("user_id", sort=False)["c"].agg("".join)
        n = seqs.map(lambda s: len(pat.findall(s)))
        hit = n > 0
        return arrow_out(
            pd.DataFrame(
                {
                    "user_id": seqs.index.to_numpy()[hit],
                    "seq_len": seqs.str.len().to_numpy(dtype=np.int64)[hit],
                    "n_matches": n.to_numpy(dtype=np.int64)[hit],
                }
            ),
            hit_schema,
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(body, batch_format="pandas")
    )


@query(
    "copurchase_part_pairs",
    sql="""
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
c AS (SELECT part_a, part_b, COUNT(*) AS n_orders FROM p GROUP BY part_a, part_b)
SELECT part_a, part_b, n_orders FROM c
ORDER BY n_orders DESC, part_a, part_b LIMIT 20
""",
)
def copurchase_part_pairs(sf_dir: str) -> ray.data.Dataset:
    """Market-basket mining: top co-purchased part pairs across orders.

    Pair expansion happens inside order-bucketed groups via a vectorized
    self-merge on orderkey, so blow-up is bounded by (items/order)^2 — a
    per-basket constant, never corpus-quadratic (baskets here cap at ~13
    items). Pair counts then fold inside PAIR-hash buckets with a pandas
    groupby-sum — NOT a Ray composite-key Aggregate, which at ~1M
    near-unique pair groups pays per-group fold overhead (measured 166 s
    vs 3 s for the bucketed fold at sf0.1). The global top-20 uses the
    local-top-k + tiny-merge pattern (no global sort). Tiebreak is
    (count desc, part_a, part_b) for determinism.
    """
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    nb = np.uint64(buckets_for_input(ds))

    def bucketize(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t["l_orderkey"].to_numpy(zero_copy_only=False))
        return t.append_column("_bucket", pa.array((h % nb).astype(np.int32)))

    pair_schema = pa.schema(
        {"part_a": pa.int64(), "part_b": pa.int64(), "n_orders": pa.int64()}
    )

    def pairs_body(g: pd.DataFrame) -> pa.Table:
        d = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        m = d.merge(d, on="l_orderkey", suffixes=("_a", "_b"))
        m = m[m["l_partkey_a"] < m["l_partkey_b"]]
        out = (
            m.groupby(["l_partkey_a", "l_partkey_b"], sort=False)
            .size()
            .reset_index(name="n_orders")
            .rename(columns={"l_partkey_a": "part_a", "l_partkey_b": "part_b"})
        )
        return arrow_out(out, pair_schema)

    partials = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(pairs_body, batch_format="pandas")
    )

    def pair_bucket(t: pa.Table) -> pa.Table:
        a = t["part_a"].to_numpy(zero_copy_only=False)
        b = t["part_b"].to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(a * np.int64(1_000_003) + b)
        return t.append_column("_pb", pa.array((h % nb).astype(np.int32)))

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["n_orders", "part_a", "part_b"], ascending=[False, True, True], kind="mergesort"
        ).head(20)

    def count_body(g: pd.DataFrame) -> pa.Table:
        # a pair's rows all share its hash bucket, so the in-bucket sum is
        # the exact global count and the bucket top-20 is a valid partial
        red = (
            g.groupby(["part_a", "part_b"], sort=False)["n_orders"].sum().reset_index()
        )
        return arrow_out(local_topk(red), pair_schema)

    counts = (
        partials.map_batches(pair_bucket, batch_format="pyarrow")
        .groupby("_pb")
        .map_groups(count_body, batch_format="pandas")
    )
    return counts.repartition(1).map_batches(local_topk, batch_format="pandas", batch_size=None)


def _bfs_sql(iterations: int = 3) -> str:
    """Unrolled BFS oracle: the all-integer min-distance recurrence means K
    chained CTEs reproduce K distributed rounds bit-for-bit (the same
    unrolling trick as ``_pagerank_sql``). Source = MIN(node)."""
    iters = []
    for k in range(1, iterations + 1):
        iters.append(
            f"""s{k} AS (
  SELECT e.dst AS node, MIN(d.dist + 1) AS nd
  FROM edges e JOIN d{k-1} d ON d.node = e.src GROUP BY e.dst
),
d{k} AS (
  SELECT d.node, LEAST(d.dist, COALESCE(s.nd, 999)) AS dist
  FROM d{k-1} d LEFT JOIN s{k} s ON s.node = d.node
)"""
        )
    return (
        """
WITH pairs AS (
  SELECT DISTINCT 2 * o.o_custkey AS c, 2 * l.l_suppkey + 1 AS s
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
d0 AS (
  SELECT node,
    CASE WHEN node = (SELECT MIN(node) FROM nodes) THEN 0 ELSE 999 END AS dist
  FROM nodes
),
"""
        + ",\n".join(iters)
        + f"\nSELECT node, CAST(dist AS BIGINT) AS dist FROM d{iterations}"
    )


@query("purchase_graph_bfs", sql=_bfs_sql(3))
def purchase_graph_bfs(sf_dir: str) -> ray.data.Dataset:
    """BFS hop distances from the smallest node of the purchase graph —
    the graph-traversal sibling of ``purchase_graph_pagerank`` (same
    customer↔supplier edge construction, same one-join-per-round
    iterative shape via ``functions/graph.bfs_levels``), oracle-checked
    bit-exact against 3 unrolled SQL CTEs. Nodes beyond 3 hops keep the
    999 sentinel."""
    from ocr_ray.functions import graph as graphfn

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])

    def local_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "u": 2 * df["o_custkey"].to_numpy(dtype=np.int64),
                "v": 2 * df["l_suppkey"].to_numpy(dtype=np.int64) + 1,
            }
        )
        return out.drop_duplicates(ignore_index=True)

    pairs = hash_join(
        orders,
        li,
        on="o_orderkey",
        right_on="l_orderkey",
        num_buckets=default_buckets(),
        left_schema=pa.schema({"o_orderkey": pa.int64(), "o_custkey": pa.int64()}),
        right_schema=pa.schema({"l_orderkey": pa.int64(), "l_suppkey": pa.int64()}),
        bucket_post=local_pairs,
        post_schema=pa.schema({"u": pa.int64(), "v": pa.int64()}),
    )
    distinct = graphfn._dedup_edges(pairs, 16)

    def sym(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([u, v]), type=pa.int64()),
                "dst": pa.array(np.concatenate([v, u]), type=pa.int64()),
            }
        )

    edges = distinct.map_batches(sym, batch_format="pyarrow")
    return graphfn.bfs_levels(edges, iterations=3)


@query(
    "span_kind_stats",
    sql="""
WITH src AS (
  SELECT doc_id AS d, string_split(text, ' ') AS ws FROM documents
), w AS (
  SELECT d, unnest(ws) AS word, generate_subscripts(ws, 1) AS i FROM src
), spans AS (
  SELECT d, (i - 1) // 8 AS si, string_agg(word, ' ' ORDER BY i) AS s
  FROM w GROUP BY d, (i - 1) // 8
), tagged AS (
  SELECT d, si,
    CASE WHEN (d + si) % 7 = 0 THEN 'boilerplate'
         WHEN (d + si) % 5 = 3 THEN 'media'
         ELSE 'text' END AS kind,
    CASE WHEN (d + si) % 7 <> 0 AND (d + si) % 5 = 3 THEN '' ELSE s END AS text
  FROM spans
)
SELECT printf('doc-%08d', d) AS doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_spans,
  CAST(SUM(CASE WHEN kind = 'text' THEN 1 ELSE 0 END) AS BIGINT) AS n_text,
  CAST(SUM(CASE WHEN kind = 'media' THEN 1 ELSE 0 END) AS BIGINT) AS n_media,
  CAST(SUM(CASE WHEN kind = 'boilerplate' THEN 1 ELSE 0 END) AS BIGINT) AS n_boilerplate,
  CAST(SUM(length(text)) AS BIGINT) AS text_chars
FROM tagged GROUP BY d
""",
)
def span_kind_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-document span statistics computed DIRECTLY on the nested
    ``spans: large_list<struct<...>>`` column — no explode, no shuffle.

    The zero-copy nested path for the north-rule input shape: Arrow list
    kernels (``flatten`` + ``list_parent_indices`` + ``utf8_length``) and
    one ``np.add.at`` scatter per stat give per-doc counts inside each
    batch; every row is independent, so the whole operator is a single
    embarrassingly-parallel ``map_batches`` regardless of corpus size.
    Oracle reproduces corpus synthesis (span order is irrelevant to the
    counts, so the shuffled storage order doesn't matter)."""
    corpus = ensure_corpus(sf_dir, glyphs=False)
    ds = read_documents(corpus)

    def stats(t: pa.Table) -> pa.Table:
        sp = t["spans"].combine_chunks()
        nr = len(sp)
        flat = sp.flatten()
        parent = pc.list_parent_indices(sp).to_numpy(zero_copy_only=False)
        kind = flat.field("kind").to_numpy(zero_copy_only=False)
        tlen = pc.utf8_length(flat.field("text")).to_numpy(zero_copy_only=False).astype(np.int64)

        def per_doc(mask: np.ndarray) -> np.ndarray:
            return np.bincount(parent[mask], minlength=nr).astype(np.int64)

        chars = np.zeros(nr, dtype=np.int64)
        np.add.at(chars, parent, tlen)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_spans": pa.array(pc.list_value_length(sp).to_numpy(zero_copy_only=False).astype(np.int64)),
                "n_text": pa.array(per_doc(kind == "text")),
                "n_media": pa.array(per_doc(kind == "media")),
                "n_boilerplate": pa.array(per_doc(kind == "boilerplate")),
                "text_chars": pa.array(chars),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


@query(
    "decile_bucket_orders",
    sql="""
WITH b AS (
  SELECT [
    quantile_disc(o_totalprice, 0.1), quantile_disc(o_totalprice, 0.2),
    quantile_disc(o_totalprice, 0.3), quantile_disc(o_totalprice, 0.4),
    quantile_disc(o_totalprice, 0.5), quantile_disc(o_totalprice, 0.6),
    quantile_disc(o_totalprice, 0.7), quantile_disc(o_totalprice, 0.8),
    quantile_disc(o_totalprice, 0.9)
  ] AS bs FROM orders
)
SELECT o.o_orderkey,
  CAST(1 + len(list_filter(b.bs, x -> o.o_totalprice > x)) AS BIGINT) AS decile
FROM orders o, b
""",
)
def decile_bucket_orders(sf_dir: str) -> ray.data.Dataset:
    """Feature discretization (fit-then-transform): bin every order's
    totalprice into global deciles.

    FIT: the nine decile boundaries come from the distributed-selection
    exact-quantile machinery (min/max pass + binned histogram pass; no
    task holds the sorted column; ``quantile_disc`` order-statistic
    semantics, so boundaries are actual data values and double
    comparisons are exact on both sides). TRANSFORM: the 9-value
    boundary vector broadcasts in the closure and bin assignment is one
    ``np.searchsorted`` per batch — the standard small-model
    fit/broadcast/apply shape (same as ``unigram_lm_score``)."""
    from ocr_ray.functions.sketch import grouped_exact_quantiles

    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    fit_in = ds.map_batches(
        lambda t: pa.table(
            {"_g": pa.array(["all"] * t.num_rows), "o_totalprice": t["o_totalprice"]}
        ),
        batch_format="pyarrow",
    )
    qs = tuple((i + 1) / 10 for i in range(9))
    fitted = grouped_exact_quantiles(fit_in, group_col="_g", value_col="o_totalprice", qs=qs)
    bounds = np.sort(
        np.array([fitted.iloc[0][f"q_{int(q * 100)}"] for q in qs], dtype=np.float64)
    )

    def assign(t: pa.Table) -> pa.Table:
        v = t["o_totalprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        decile = 1 + np.searchsorted(bounds, v, side="left")
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "decile": pa.array(decile.astype(np.int64)),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


@query(
    "zscore_outliers_events",
    sql="""
WITH u AS (
  SELECT event_type, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc FROM events
), s AS (
  SELECT event_type, COUNT(*) AS n, SUM(vc) AS sy, SUM(CAST(vc AS HUGEINT) * vc) AS syy
  FROM u GROUP BY event_type
), p AS (
  SELECT event_type,
    CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
    9.0 * CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)
      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS thr
  FROM s
)
SELECT u.event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(CASE WHEN (CAST(u.vc AS DOUBLE) - p.mean) * (CAST(u.vc AS DOUBLE) - p.mean) > p.thr
           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM u JOIN p USING (event_type) GROUP BY u.event_type
""",
)
def zscore_outliers_events(sf_dir: str) -> ray.data.Dataset:
    """Per-group 3-sigma anomaly counts, bit-exact without ever taking a
    square root: the test |v-mu| > 3*sigma is evaluated as
    (v-mu)^2 > 9*var with mu/var derived from EXACT integer sums
    (n, sum, sum-of-squares in cents) and the handful of float ops
    mirrored expression-for-expression in the SQL.

    Two streaming passes: a tiny fit groupby (3 int aggregates), then a
    broadcast of the per-group (mean, threshold) pairs into a map-side
    counting pass with per-batch combine — the same fit/broadcast/apply
    shape as ``decile_bucket_orders``. Sum-of-squares partial sums hold
    in int64 to ~1e9 rows per group at this value scale; beyond that,
    salt the fit groupby and merge on the driver."""
    from ray.data.aggregate import Count, Sum

    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        vc = to_units(t["value"])
        return pa.table(
            {
                "event_type": t["event_type"],
                "vc": vc,
                "vv": pc.multiply_checked(vc, vc),
            }
        )

    # materialized: the prep scan feeds BOTH the fit aggregate and the
    # counting pass — without this the events read + cents math runs twice
    prepped = ds.map_batches(prep, batch_format="pyarrow").materialize()
    fit = (
        prepped.groupby("event_type")
        .aggregate(Count(alias_name="n"), Sum("vc", alias_name="sy"), Sum("vv", alias_name="syy"))
        .to_pandas()
    )
    stats = {}
    for r in fit.itertuples(index=False):
        n, sy, syy = int(r.n), int(r.sy), int(r.syy)
        mean = float(sy) / float(n)
        thr = 9.0 * float(n * syy - sy * sy) / (float(n) * float(n))
        stats[r.event_type] = (mean, thr)

    def count_outliers(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        v = t["vc"].to_numpy(zero_copy_only=False).astype(np.float64)
        types, counts, outs = [], [], []
        for typ, (mean, thr) in stats.items():
            m = et == typ
            if not m.any():
                continue
            d = v[m] - mean
            types.append(typ)
            counts.append(int(m.sum()))
            outs.append(int((d * d > thr).sum()))
        return pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "n_rows": pa.array(np.array(counts, dtype=np.int64)),
                "n_outliers": pa.array(np.array(outs, dtype=np.int64)),
            }
        )

    return (
        prepped.map_batches(count_outliers, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n_rows", alias_name="n_rows"), Sum("n_outliers", alias_name="n_outliers"))
    )


@query("bpe_encode_docs", sql=None)
def bpe_encode_docs(sf_dir: str) -> ray.data.Dataset:
    """BPE tokenizer APPLICATION (the transform half of ``bpe_train_merges``):
    fit 12 merges on the corpus word-frequency table, then tokenize every
    document with a stateful actor-pool encode stage — the learned merge
    list ships once per actor (constructor arg), and a per-actor
    word→count cache bounds work by unique word types per batch. No SQL
    oracle (data-dependent iterative fit); exactness is enforced at RUN
    time: the fit verifies its merges against the pure-Python reference
    (``verify=True`` raises on divergence), the encoder checks the
    lossless roundtrip invariant (subwords concatenate back to the word)
    for every unique word it tokenizes, and the output is SELF-VERIFYING:
    a deterministic sample of documents (doc_id % 97 == 0) is re-encoded
    with the independent reference encoder and every row carries
    ``gate_ok`` = that sampled comparison held. Per-doc token counts are
    further asserted equal to the reference in tests/test_dedup_ann.py."""
    from ocr_ray.functions.bpe import BpeEncoder, bpe_encode_reference, bpe_train

    fit = bpe_train(
        read_docs(sf_dir, columns=["text"]), num_merges=12, verify=True
    )
    merges = list(zip(fit["left"], fit["right"]))
    ds = read_docs(sf_dir, columns=["doc_id", "text"])
    out = ds.map_batches(
        BpeEncoder,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=pool_size(),
        fn_constructor_kwargs={"merges": merges},
    ).materialize()

    # gate: deterministic doc sample re-encoded with the INDEPENDENT
    # reference encoder (written without merge_pair_rows)
    def check(eng, raw):
        for doc_id, n_eng in zip(eng["doc_id"], eng["n_bpe_tokens"]):
            n_ref = sum(
                len(bpe_encode_reference(w, merges))
                for w in (raw.loc[int(doc_id), "text"] or "").split(" ")
                if w
            )
            if n_ref != int(n_eng):
                return False
        return True

    return gate_by_sampled_recheck(out, ds, id_col="doc_id", checker=check)


@query(
    "rfm_segments",
    sql="""
WITH per AS (
  SELECT o_custkey,
    date_diff('day', MAX(o_orderdate), (SELECT MAX(o_orderdate) FROM orders)) AS r_days,
    COUNT(*) AS n_orders,
    SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS m_cents
  FROM orders GROUP BY o_custkey
), b AS (
  SELECT
    [quantile_disc(r_days, 0.2), quantile_disc(r_days, 0.4),
     quantile_disc(r_days, 0.6), quantile_disc(r_days, 0.8)] AS rb,
    [quantile_disc(n_orders, 0.2), quantile_disc(n_orders, 0.4),
     quantile_disc(n_orders, 0.6), quantile_disc(n_orders, 0.8)] AS fb,
    [quantile_disc(m_cents, 0.2), quantile_disc(m_cents, 0.4),
     quantile_disc(m_cents, 0.6), quantile_disc(m_cents, 0.8)] AS mb
  FROM per
)
SELECT p.o_custkey, CAST(p.r_days AS BIGINT) AS r_days, p.n_orders,
  CAST(p.m_cents AS BIGINT) AS m_cents,
  CAST(1 + len(list_filter(b.rb, x -> p.r_days > x)) AS BIGINT) AS r_q,
  CAST(1 + len(list_filter(b.fb, x -> p.n_orders > x)) AS BIGINT) AS f_q,
  CAST(1 + len(list_filter(b.mb, x -> p.m_cents > x)) AS BIGINT) AS m_q
FROM per p, b
""",
)
def rfm_segments(sf_dir: str) -> ray.data.Dataset:
    """RFM customer segmentation (recency / frequency / monetary quintiles)
    — the classic customer-analytics composite, fully integer-exact.

    One per-customer aggregate (days-since-last-order vs the global max
    date, order count, lifetime cents), materialized ONCE; then three
    quintile fits reuse the distributed-selection quantile machinery over
    that table (per-customer, so it scales with customers, and no task
    holds the sorted column); the three 4-value boundary vectors broadcast
    into a single searchsorted transform. Every metric and boundary is an
    integer — no float enters the comparison on either side."""
    from ocr_ray.functions.relational import bucketed_aggregate
    from ocr_ray.functions.sketch import grouped_exact_quantiles

    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "ts_us": pc.cast(t["o_orderdate"], pa.int64()),
                "price_c": to_units(t["o_totalprice"]),
            }
        )

    # per-customer: key cardinality scales with the data, so this is a
    # bucketed fold, not a Dataset.aggregate (see bucketed_aggregate doc)
    per_raw = bucketed_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        keys=["o_custkey"],
        aggs={
            "last_us": ("ts_us", "max"),
            "n_orders": ("ts_us", "size"),
            "m_cents": ("price_c", "sum"),
        },
    ).materialize()
    anchor_us = int(per_raw.max("last_us"))
    day_us = 86_400_000_000

    def metrics(t: pa.Table) -> pa.Table:
        last = t["last_us"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "r_days": pa.array((anchor_us - last) // day_us, pa.int64()),
                "n_orders": pc.cast(t["n_orders"], pa.int64()),
                "m_cents": pc.cast(t["m_cents"], pa.int64()),
            }
        )

    per = per_raw.map_batches(metrics, batch_format="pyarrow").materialize()

    qs = (0.2, 0.4, 0.6, 0.8)
    bounds = {}
    for col in ("r_days", "n_orders", "m_cents"):
        fit_in = per.map_batches(
            lambda t, c=col: pa.table({"_g": pa.array(["all"] * t.num_rows), c: t[c]}),
            batch_format="pyarrow",
        )
        fitted = grouped_exact_quantiles(fit_in, group_col="_g", value_col=col, qs=qs)
        bounds[col] = np.sort(
            np.array([fitted.iloc[0][f"q_{int(q * 100)}"] for q in qs], dtype=np.float64)
        )

    def assign(t: pa.Table) -> pa.Table:
        out = {n: t[n] for n in ("o_custkey", "r_days", "n_orders", "m_cents")}
        for col, short in (("r_days", "r_q"), ("n_orders", "f_q"), ("m_cents", "m_q")):
            v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
            out[short] = pa.array(
                (1 + np.searchsorted(bounds[col], v, side="left")).astype(np.int64)
            )
        return pa.table(out)

    return per.map_batches(assign, batch_format="pyarrow")


@query(
    "corr_matrix_lineitem",
    sql="""
WITH u AS (
  SELECT CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS quantity,
         CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS discount,
         CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT) AS tax,
         CAST(l_linenumber AS BIGINT) AS linenumber
  FROM lineitem
), s AS (
  SELECT COUNT(*) AS n,
    SUM(quantity) AS s0, SUM(discount) AS s1, SUM(tax) AS s2, SUM(linenumber) AS s3,
    SUM(CAST(quantity AS HUGEINT) * quantity) AS s00,
    SUM(CAST(quantity AS HUGEINT) * discount) AS s01,
    SUM(CAST(quantity AS HUGEINT) * tax) AS s02,
    SUM(CAST(quantity AS HUGEINT) * linenumber) AS s03,
    SUM(CAST(discount AS HUGEINT) * discount) AS s11,
    SUM(CAST(discount AS HUGEINT) * tax) AS s12,
    SUM(CAST(discount AS HUGEINT) * linenumber) AS s13,
    SUM(CAST(tax AS HUGEINT) * tax) AS s22,
    SUM(CAST(tax AS HUGEINT) * linenumber) AS s23,
    SUM(CAST(linenumber AS HUGEINT) * linenumber) AS s33
  FROM u
)
SELECT p.col_a, p.col_b, CAST(s.n AS BIGINT) AS n_rows,
  CAST(CAST(s.n AS HUGEINT) * p.sab - p.sa * p.sb AS DOUBLE)
    / (sqrt(CAST(CAST(s.n AS HUGEINT) * p.saa - p.sa * p.sa AS DOUBLE))
       * sqrt(CAST(CAST(s.n AS HUGEINT) * p.sbb - p.sb * p.sb AS DOUBLE))) AS corr
FROM s, LATERAL (VALUES
  ('quantity', 'discount', s.s0, s.s1, s.s01, s.s00, s.s11),
  ('quantity', 'tax', s.s0, s.s2, s.s02, s.s00, s.s22),
  ('quantity', 'linenumber', s.s0, s.s3, s.s03, s.s00, s.s33),
  ('discount', 'tax', s.s1, s.s2, s.s12, s.s11, s.s22),
  ('discount', 'linenumber', s.s1, s.s3, s.s13, s.s11, s.s33),
  ('tax', 'linenumber', s.s2, s.s3, s.s23, s.s22, s.s33)
) AS p(col_a, col_b, sa, sb, sab, saa, sbb)
""",
)
def corr_matrix_lineitem(sf_dir: str) -> ray.data.Dataset:
    """Pairwise Pearson correlation matrix over four lineitem columns in
    ONE streaming pass — the multi-moment completion of the ANALYZE-style
    profiling suite (`analyze_orders_stats`).

    Per batch: a fixed-size vector of integer moments (n, 4 sums, 10
    products — all in cent units, int64-safe for these small-valued
    columns to ~1e9 rows; wider values need split sums). One global
    keyless aggregate folds the partials; the driver computes the six
    correlations with the exact-int-to-double casts and two sqrt calls
    mirrored expression-for-expression in the HUGEINT SQL, so the floats
    are bit-exact."""
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "lineitem", columns=["l_quantity", "l_discount", "l_tax", "l_linenumber"])
    cols = ["quantity", "discount", "tax", "linenumber"]

    def moments(t: pa.Table) -> pa.Table:
        v = {
            "quantity": to_units(t["l_quantity"]).to_numpy(zero_copy_only=False),
            "discount": to_units(t["l_discount"]).to_numpy(zero_copy_only=False),
            "tax": to_units(t["l_tax"]).to_numpy(zero_copy_only=False),
            "linenumber": pc.cast(t["l_linenumber"], pa.int64()).to_numpy(zero_copy_only=False),
        }
        out = {"n": pa.array([t.num_rows], pa.int64())}
        for i, a in enumerate(cols):
            out[f"s{i}"] = pa.array([int(v[a].sum())], pa.int64())
            for j, b in enumerate(cols):
                if j >= i:
                    out[f"s{i}{j}"] = pa.array([int((v[a] * v[b]).sum())], pa.int64())
        return pa.table(out)

    names = ["n"] + [f"s{i}" for i in range(4)] + [f"s{i}{j}" for i in range(4) for j in range(4) if j >= i]
    total = ds.map_batches(moments, batch_format="pyarrow").aggregate(
        *[Sum(c, alias_name=c) for c in names]
    )

    n = int(total["n"])
    S = {c: int(total[c]) for c in names}
    rows = []
    for i, a in enumerate(cols):
        for j in range(i + 1, 4):
            b = cols[j]
            sa, sb = S[f"s{i}"], S[f"s{j}"]
            sab, saa, sbb = S[f"s{i}{j}"], S[f"s{i}{i}"], S[f"s{j}{j}"]
            corr = float(n * sab - sa * sb) / (
                np.sqrt(float(n * saa - sa * sa)) * np.sqrt(float(n * sbb - sb * sb))
            )
            rows.append((a, b, n, corr))
    return ray.data.from_arrow(
        pa.table(
            {
                "col_a": pa.array([r[0] for r in rows]),
                "col_b": pa.array([r[1] for r in rows]),
                "n_rows": pa.array([r[2] for r in rows], pa.int64()),
                "corr": pa.array([r[3] for r in rows], pa.float64()),
            }
        )
    )


@query(
    "copurchase_triangles",
    sql="""
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p0 AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
p AS (SELECT pa, pb FROM p0 GROUP BY pa, pb HAVING COUNT(*) >= 2),
t AS (
  SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
  FROM p e1 JOIN p e2 ON e1.pb = e2.pa
  JOIN p e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
),
n AS (
  SELECT node, COUNT(*) AS n_tri FROM (
    SELECT a AS node FROM t UNION ALL SELECT b FROM t UNION ALL SELECT c FROM t
  ) GROUP BY node
)
SELECT CAST(node AS BIGINT) AS part, CAST(n_tri AS BIGINT) AS n_tri
FROM n ORDER BY n_tri DESC, part LIMIT 20
""",
)
def copurchase_triangles(sf_dir: str) -> ray.data.Dataset:
    """Distributed TRIANGLE COUNTING over the co-purchase graph (edges =
    part pairs sharing >= 2 orders), the classic clustering/community
    primitive, via DEGREE-ORIENTED wedge generation:

    1. edges fold inside order- then pair-hash buckets (the
       ``copurchase_part_pairs`` shape, with the >= 2 support filter);
    2. degrees fold inside node buckets; two bucketed joins attach
       (deg_a, deg_b) and each edge is ORIENTED from its lower-(degree,
       id) endpoint — the orientation that bounds every out-degree by
       O(sqrt(m)), so wedge blow-up is O(m^1.5) worst case instead of
       Sum(deg^2) on hub nodes: the standard scalable triangle algorithm;
    3. wedges (u: v-w) are generated per-source inside src-hash buckets
       (vectorized self-merge) and the closing edge (v, w) is matched
       with ONE bucketed composite-key join against the edge set;
    4. per-node triangle counts fold from the matched (u, v, w) rows and
       the global top-20 uses local-top-k + tiny merge.

    No driver-side step touches edges or wedges; every stage is a
    bucketed fold or join, so hot nodes are bounded per-bucket."""
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    nb = np.uint64(buckets_for_input(ds))

    def bucketize(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t["l_orderkey"].to_numpy(zero_copy_only=False))
        return t.append_column("_bucket", pa.array((h % nb).astype(np.int32)))

    pair_schema = pa.schema(
        {"pa_": pa.int64(), "pb_": pa.int64(), "n_orders": pa.int64()}
    )

    def pairs_body(g: pd.DataFrame) -> pa.Table:
        d = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        m = d.merge(d, on="l_orderkey", suffixes=("_a", "_b"))
        m = m[m["l_partkey_a"] < m["l_partkey_b"]]
        out = (
            m.groupby(["l_partkey_a", "l_partkey_b"], sort=False)
            .size()
            .reset_index(name="n_orders")
            .rename(columns={"l_partkey_a": "pa_", "l_partkey_b": "pb_"})
        )
        return arrow_out(out, pair_schema)

    partials = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(pairs_body, batch_format="pandas")
    )

    def pair_bucket(t: pa.Table) -> pa.Table:
        a = t["pa_"].to_numpy(zero_copy_only=False)
        b = t["pb_"].to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(a * np.int64(1_000_003) + b)
        return t.append_column("_bucket", pa.array((h % nb).astype(np.int32)))

    edge_schema = pa.schema({"pa_": pa.int64(), "pb_": pa.int64()})

    def edge_fold(g: pd.DataFrame) -> pa.Table:
        tot = g.groupby(["pa_", "pb_"], sort=False)["n_orders"].sum().reset_index()
        tot = tot[tot["n_orders"] >= 2]
        return arrow_out(tot[["pa_", "pb_"]], edge_schema)

    edges = (
        partials.map_batches(pair_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(edge_fold, batch_format="pandas")
    ).materialize()  # consumed 3x (deg, orientation, closing join); small: >=2-support pairs

    # --- degrees (node-bucketed count fold) ---
    def both_ends(t: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [
                t["pa_"].to_numpy(zero_copy_only=False),
                t["pb_"].to_numpy(zero_copy_only=False),
            ]
        )
        h = pd.util.hash_array(nodes)
        return pa.table(
            {
                "node": pa.array(nodes),
                "_bucket": pa.array((h % nb).astype(np.int32)),
            }
        )

    deg_schema = pa.schema({"node": pa.int64(), "deg": pa.int64()})

    def deg_fold(g: pd.DataFrame) -> pa.Table:
        out = g.groupby("node", sort=False).size().reset_index(name="deg")
        return arrow_out(out, deg_schema)

    deg = (
        edges.map_batches(both_ends, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(deg_fold, batch_format="pandas")
    )

    # --- orientation: src = lower (deg, id) endpoint ---
    j1 = hash_join(
        edges,
        deg,
        on="pa_",
        right_on="node",
        num_buckets=int(nb),
        left_schema=edge_schema,
        right_schema=deg_schema,
        suffix="_da",
    )
    j2 = hash_join(
        j1,
        deg.map_batches(
            lambda t: t.rename_columns(["node", "deg_b"]), batch_format="pyarrow"
        ),
        on="pb_",
        right_on="node",
        num_buckets=int(nb),
        left_schema=pa.schema(
            {"pa_": pa.int64(), "pb_": pa.int64(), "deg": pa.int64()}
        ),
        right_schema=pa.schema({"node": pa.int64(), "deg_b": pa.int64()}),
    )

    def orient(t: pa.Table) -> pa.Table:
        a = t["pa_"].to_numpy(zero_copy_only=False)
        b = t["pb_"].to_numpy(zero_copy_only=False)
        da = t["deg"].to_numpy(zero_copy_only=False)
        db = t["deg_b"].to_numpy(zero_copy_only=False)
        a_first = (da < db) | ((da == db) & (a < b))
        src = np.where(a_first, a, b)
        dst = np.where(a_first, b, a)
        h = pd.util.hash_array(src)
        return pa.table(
            {
                "src": pa.array(src),
                "dst": pa.array(dst),
                "_bucket": pa.array((h % nb).astype(np.int32)),
            }
        )

    oriented = j2.map_batches(orient, batch_format="pyarrow")

    wedge_schema = pa.schema(
        {"u": pa.int64(), "pa_": pa.int64(), "pb_": pa.int64()}
    )

    def wedges_body(g: pd.DataFrame) -> pa.Table:
        e = g[["src", "dst"]]
        m = e.merge(e, on="src", suffixes=("_1", "_2"))
        m = m[m["dst_1"] < m["dst_2"]]  # unordered neighbor pair, once
        # dst_1 < dst_2 already matches the (min id, max id) convention
        # the `edges` table stores, so the pair is the closing-edge key
        out = pd.DataFrame(
            {"u": m["src"], "pa_": m["dst_1"], "pb_": m["dst_2"]}
        )
        return arrow_out(out, wedge_schema)

    wedges = oriented.groupby("_bucket").map_groups(
        wedges_body, batch_format="pandas"
    )

    # --- close wedges: composite-key semi join against the edge set ---
    tris = hash_join(
        wedges,
        edges,
        on=["pa_", "pb_"],
        how="semi",
        num_buckets=int(nb),
        left_schema=wedge_schema,
        right_schema=edge_schema,
    )

    # --- per-node counts + global top-20 ---
    def node_counts(t: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [
                t["u"].to_numpy(zero_copy_only=False),
                t["pa_"].to_numpy(zero_copy_only=False),
                t["pb_"].to_numpy(zero_copy_only=False),
            ]
        )
        h = pd.util.hash_array(nodes)
        return pa.table(
            {"node": pa.array(nodes), "_bucket": pa.array((h % nb).astype(np.int32))}
        )

    out_schema = pa.schema({"part": pa.int64(), "n_tri": pa.int64()})

    def count_fold(g: pd.DataFrame) -> pa.Table:
        out = g.groupby("node", sort=False).size().reset_index(name="n_tri")
        out = out.rename(columns={"node": "part"})
        out = out.sort_values(
            ["n_tri", "part"], ascending=[False, True], kind="mergesort"
        ).head(20)
        return arrow_out(out, out_schema)

    folded = (
        tris.map_batches(node_counts, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(count_fold, batch_format="pandas")
    )
    top = folded.to_pandas().sort_values(
        ["n_tri", "part"], ascending=[False, True], kind="mergesort"
    ).head(20)
    return ray.data.from_arrow(arrow_out(top.reset_index(drop=True), out_schema))


@query(
    "item_similarity_topk",
    sql="""
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS c
  FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
tot AS (SELECT l_partkey, COUNT(*) AS n FROM d GROUP BY 1),
sym AS (SELECT pa AS i, pb AS j, c FROM pairs UNION ALL SELECT pb, pa, c FROM pairs),
sc AS (
  SELECT s.i, s.j, s.c,
    CAST(s.c AS DOUBLE) / sqrt(CAST(ti.n * tj.n AS DOUBLE)) AS cosine
  FROM sym s JOIN tot ti ON ti.l_partkey = s.i JOIN tot tj ON tj.l_partkey = s.j
)
SELECT i AS part_i, j AS part_j, CAST(c AS BIGINT) AS n_co, cosine
FROM sc QUALIFY row_number() OVER (PARTITION BY i ORDER BY cosine DESC, j) <= 8
""",
)
def item_similarity_topk(sf_dir: str) -> ray.data.Dataset:
    """Item-item COSINE similarity top-8 per part over co-purchase
    baskets — the collaborative-filtering neighborhood build
    (sim(i,j) = co_orders / sqrt(n_i * n_j)): what a recommender
    pipeline materializes from transaction logs before serving.

    Distributed shape: the ``copurchase_part_pairs`` basket expansion
    (order-bucketed vectorized self-merge, blow-up bounded per basket)
    -> exact pair counts in PAIR-hash buckets -> cosine scoring as a
    stateless map with the per-part totals BROADCAST once (parts are a
    bounded dimension; the totals dict ships via ray.put, never joins)
    -> a final part_i-bucket fold takes each item's top-8. Three
    bucketed shuffles total, all over the pairs table (<< corpus).
    Bit-exactness: counts are integers; the only float math is one
    int->double cast, one correctly-rounded sqrt, one division — the
    identical three-op sequence the oracle runs, so cosines hash equal.
    """
    from ocr_ray.functions.relational import _prepared, broadcast, bucketed_aggregate

    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    nb = np.uint64(buckets_for_input(ds))

    def bucketize(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t["l_orderkey"].to_numpy(zero_copy_only=False))
        return t.append_column("_bucket", pa.array((h % nb).astype(np.int32)))

    bucketed = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
    )

    pair_schema = pa.schema(
        {"part_a": pa.int64(), "part_b": pa.int64(), "n_co": pa.int64()}
    )

    def pairs_body(g: pd.DataFrame) -> pa.Table:
        d = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        m = d.merge(d, on="l_orderkey", suffixes=("_a", "_b"))
        m = m[m["l_partkey_a"] < m["l_partkey_b"]]
        out = (
            m.groupby(["l_partkey_a", "l_partkey_b"], sort=False)
            .size()
            .reset_index(name="n_co")
            .rename(columns={"l_partkey_a": "part_a", "l_partkey_b": "part_b"})
        )
        return arrow_out(out, pair_schema)

    pair_partials = bucketed.map_groups(pairs_body, batch_format="pandas")
    pairs = bucketed_aggregate(
        pair_partials, keys=["part_a", "part_b"], aggs={"n_co": ("n_co", "sum")}
    )

    # per-part totals: distinct (order, part) is exact inside the order
    # bucket, partial part counts fold to a bounded dimension-sized table
    tot_schema = pa.schema({"part": pa.int64(), "n": pa.int64()})

    def totals_body(g: pd.DataFrame) -> pa.Table:
        d = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        out = d.groupby("l_partkey", sort=False).size().reset_index(name="n")
        return arrow_out(out.rename(columns={"l_partkey": "part"}), tot_schema)

    totals = bucketed_aggregate(
        bucketed.map_groups(totals_body, batch_format="pandas"),
        keys=["part"],
        aggs={"n": ("n", "sum")},
    ).to_pandas()
    tot_ref = broadcast(
        dict(
            zip(
                totals["part"].to_numpy(dtype=np.int64),
                totals["n"].to_numpy(dtype=np.int64),
            )
        )
    )

    def score(t: pa.Table) -> pa.Table:
        def _build():
            m = ray.get(tot_ref)
            k = np.array(list(m.keys()), dtype=np.int64)
            v = np.array(list(m.values()), dtype=np.int64)
            order = np.argsort(k, kind="stable")
            return k[order], v[order]  # sorted ONCE per worker, not per batch

        keys, vals = _prepared(
            ("item_sim_totals", tot_ref.hex()), _build, category_cap=4
        )
        a = t["part_a"].to_numpy(zero_copy_only=False)
        b = t["part_b"].to_numpy(zero_copy_only=False)
        c = t["n_co"].to_numpy(zero_copy_only=False).astype(np.int64)
        na = vals[np.searchsorted(keys, a)]
        nb_ = vals[np.searchsorted(keys, b)]
        cos = c.astype(np.float64) / np.sqrt((na * nb_).astype(np.float64))
        return pa.table(
            {
                "part_i": pa.array(np.concatenate([a, b]), type=pa.int64()),
                "part_j": pa.array(np.concatenate([b, a]), type=pa.int64()),
                "n_co": pa.array(np.concatenate([c, c])),
                "cosine": pa.array(np.concatenate([cos, cos])),
            }
        )

    scored = pairs.map_batches(score, batch_format="pyarrow")

    def bucket_i(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t["part_i"].to_numpy(zero_copy_only=False))
        return t.append_column("_ib", pa.array((h % nb).astype(np.int32)))

    out_schema = pa.schema(
        {
            "part_i": pa.int64(),
            "part_j": pa.int64(),
            "n_co": pa.int64(),
            "cosine": pa.float64(),
        }
    )

    def topk_body(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(
            ["part_i", "cosine", "part_j"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        return arrow_out(
            g.groupby("part_i", sort=False).head(8)[
                ["part_i", "part_j", "n_co", "cosine"]
            ],
            out_schema,
        )

    return (
        scored.map_batches(bucket_i, batch_format="pyarrow")
        .groupby("_ib")
        .map_groups(topk_body, batch_format="pandas")
    )


@query(
    "winsorize_order_prices",
    sql="""
WITH c AS (
  SELECT o_orderstatus,
    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c
  FROM orders
),
b AS (
  SELECT o_orderstatus,
    quantile_disc(price_c, 0.05) AS lo, quantile_disc(price_c, 0.95) AS hi
  FROM c GROUP BY o_orderstatus
)
SELECT c.o_orderstatus,
  COUNT(*) AS n_orders,
  CAST(SUM(CASE WHEN c.price_c < b.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_lo,
  CAST(SUM(CASE WHEN c.price_c > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_hi,
  CAST(SUM(LEAST(GREATEST(c.price_c, b.lo), b.hi)) AS BIGINT) AS sum_winsorized_c,
  CAST(b.lo AS BIGINT) AS p05_c, CAST(b.hi AS BIGINT) AS p95_c
FROM c JOIN b USING (o_orderstatus)
GROUP BY c.o_orderstatus, b.lo, b.hi
""",
)
def winsorize_order_prices(sf_dir: str) -> pa.Table:
    """WINSORIZATION — the robust-preprocessing transform (clip each
    group's values at its own p05/p95 before aggregating, so a fat tail
    can't dominate a feature): ``grouped_winsorize_stats`` computes the
    per-status exact discrete quantiles AND the clipped sums in the
    SAME histogram-selection passes (per-bin integer sums + exact
    in-cell corrections) — no separate clip pass, no second shuffle,
    and the monotone bit-pattern binning needs no min/max barrier, so
    the whole query is TWO passes over the pruned 2-column read (the
    VERDICT-r3 chained-selection pass cut: was min/max + histogram +
    cell fetch + clip/aggregate = 4). Everything is integer cents, so
    the oracle (quantile_disc + LEAST/GREATEST in SQL) matches
    bit-exactly with no float anywhere."""
    from ocr_ray.functions.sketch import grouped_winsorize_stats

    ds = read_table(sf_dir, "orders", columns=["o_orderstatus", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderstatus": t["o_orderstatus"],
                "price_c": to_units(t["o_totalprice"]),
            }
        )

    cents = ds.map_batches(prep, batch_format="pyarrow")
    stats = grouped_winsorize_stats(
        cents, group_col="o_orderstatus", value_col="price_c", q_lo=0.05, q_hi=0.95
    ).sort_values("o_orderstatus", ignore_index=True)
    return pa.table(
        {
            "o_orderstatus": pa.array(stats["o_orderstatus"], type=pa.string()),
            "n_orders": pa.array(stats["n"].to_numpy(dtype=np.int64)),
            "n_clipped_lo": pa.array(stats["n_clipped_lo"].to_numpy(dtype=np.int64)),
            "n_clipped_hi": pa.array(stats["n_clipped_hi"].to_numpy(dtype=np.int64)),
            "sum_winsorized_c": pa.array(stats["sum_winsorized"].to_numpy(dtype=np.int64)),
            "p05_c": pa.array(stats["p_lo"].to_numpy(dtype=np.int64)),
            "p95_c": pa.array(stats["p_hi"].to_numpy(dtype=np.int64)),
        }
    )
