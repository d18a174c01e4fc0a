"""Query registry: every operator surfaced to the driver.

Each entry pairs a Ray Data implementation (callable ``fn(sf_dir)``) with,
where SQL-expressible, an equivalent DuckDB oracle over the registered
views (``region nation customer supplier part orders lineitem events
documents embeddings``). Column names AND numeric semantics match exactly:

- money/2-decimal aggregates are computed in integer units on the Ray side
  and as DECIMAL sums cast to DOUBLE in SQL — identical nearest-doubles of
  identical exact rationals (see ``functions/relational.py``);
- every top-k/sort has a deterministic tiebreak on a key column;
- extraction queries run the *real* engine over the deterministically
  synthesized span corpus (``ocr_ray.corpus``), whose synthesis rule is
  arithmetic on (doc_id, span_index) so the SQL oracle reproduces
  synthesis + extraction end-to-end — including the glyph variant, whose
  recognized output must equal the withheld source text.
"""

from __future__ import annotations

import datetime
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ocr_ray.corpus import ensure_corpus
from ocr_ray.functions.relational import (
    hash_join,
    lookup,
    semi_filter,
    to_units,
    units_to_double,
)
from ocr_ray.functions import text as textfn
from ocr_ray.pipelines.extract import extract_spans_flat
from ocr_ray.sizing import buckets_for_input, pool_size
from ocr_ray.sources import read_documents, read_table

QUERY_FNS: dict[str, Callable[[str], Any]] = {}
ORACLE_SQL: dict[str, str] = {}


def load_small_table(sf_dir: str, name: str, columns: list[str] | None = None) -> pa.Table:
    """Driver-side read of a SMALL (dimension/broadcast) table.

    The broadcast-small-side pattern: dimension tables ship once via
    ``ray.put``; reading them through a distributed Dataset would cost a
    full streaming execution (~seconds of fixed overhead) to move a few MB.
    Only ever used for sides that are broadcast afterwards.
    """
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_dir}/{name}.parquet", columns=columns)


def _big_spenders(sf_dir: str) -> list:
    """Distinct custkeys of orders above a price threshold (small key set,
    computed with a vectorized pre-filter then ``unique`` — broadcast side
    of the semi/anti joins)."""
    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], pa.scalar(450000.0))).select(
            ["o_custkey"]
        ),
        batch_format="pyarrow",
    )
    return ds.unique("o_custkey")


def query(name: str, sql: str | None = None):
    def deco(fn):
        QUERY_FNS[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


# ---------------------------------------------------------------------------
# Extraction (flagship) — SQL oracle reproduces corpus synthesis + extraction.
# ---------------------------------------------------------------------------

_EXTRACT_SQL = """
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
    CASE WHEN (d + si) % 7 <> 0 AND (d + si) % 5 = 3 THEN '' ELSE s END AS text,
    CASE WHEN (d + si) % 7 <> 0 AND (d + si) % 5 = 3
         THEN printf('m-%d', (d * 1000 + si) % 9973) ELSE '' END AS media_ref
  FROM spans
)
SELECT printf('doc-%08d', d) AS doc_id, kind, text, media_ref,
       CAST(row_number() OVER (PARTITION BY d ORDER BY si) - 1 AS INTEGER) AS "offset"
FROM tagged WHERE kind <> 'boilerplate'
"""


@query("extract_spans", sql=_EXTRACT_SQL)
def extract_spans(sf_dir: str) -> ray.data.Dataset:
    """Full extraction over the plain (no-glyph) interleaved corpus; flat output."""
    corpus = ensure_corpus(sf_dir, glyphs=False)
    return extract_spans_flat(read_documents(corpus), num_buckets=16)


@query("extract_glyphs", sql=_EXTRACT_SQL)
def extract_glyphs(sf_dir: str) -> ray.data.Dataset:
    """Extraction over the glyph corpus: encoded spans must decode (segment +
    nearest-template recognize) back to the exact withheld text, so the
    oracle is the same SQL as ``extract_spans``."""
    corpus = ensure_corpus(sf_dir, glyphs=True)
    return extract_spans_flat(read_documents(corpus), num_buckets=16)


@query("extract_spans_local", sql=_EXTRACT_SQL)
def extract_spans_local_q(sf_dir: str) -> ray.data.Dataset:
    """Zero-shuffle extraction (shard-aligned path): input rows are whole
    documents, so reassembly is batch-local — no groupby anywhere. Same
    output (and oracle) as ``extract_glyphs``, different physical plan."""
    from ocr_ray.pipelines.extract import extract_documents_local
    from ocr_ray.stages.explode import explode_documents

    corpus = ensure_corpus(sf_dir, glyphs=True)
    nested = extract_documents_local(read_documents(corpus))
    return nested.map_batches(
        explode_documents, batch_format="pyarrow", fn_kwargs={"sentinels": False}
    )


@query(
    "extract_media_index",
    sql="""
WITH src AS (
  SELECT doc_id AS d, string_split(text, ' ') AS ws FROM documents
), w AS (
  SELECT d, generate_subscripts(ws, 1) AS i FROM src
), spans AS (
  SELECT d, (i - 1) // 8 AS si FROM w GROUP BY d, (i - 1) // 8
)
SELECT printf('doc-%08d', d) AS doc_id,
       CAST(count(*) FILTER (WHERE (d + si) % 7 <> 0 AND (d + si) % 5 = 3) AS BIGINT) AS n_media,
       CAST(count(*) FILTER (WHERE (d + si) % 7 <> 0 AND (d + si) % 5 <> 3) AS BIGINT) AS n_content
FROM spans GROUP BY d
""",
)
def extract_media_index(sf_dir: str) -> ray.data.Dataset:
    """Per-doc media/content span counts from the extracted corpus."""
    corpus = ensure_corpus(sf_dir, glyphs=False)
    flat = extract_spans_flat(read_documents(corpus), num_buckets=16)

    def counts(t: pa.Table) -> pa.Table:
        media = pc.equal(t["kind"], "media")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "is_media": pc.cast(media, pa.int64()),
            }
        )

    from ray.data.aggregate import Count, Sum

    agg = (
        flat.map_batches(counts, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("is_media", alias_name="n_media"), Count(alias_name="n_total"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_media": pc.cast(t["n_media"], pa.int64()),
                "n_content": pc.cast(pc.subtract(t["n_total"], t["n_media"]), pa.int64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Relational: aggregation
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    sql="""
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  COUNT(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q1-style pricing summary with exact integer-unit aggregation."""
    from ray.data.aggregate import Count, Sum

    ds = read_table(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        ],
    )
    cutoff = datetime.datetime(1998, 9, 2)

    def prep(t: pa.Table) -> pa.Table:
        # map-side COMBINE: reduce each batch to <= 6 (flag, status) rows
        # before the shuffle — the groupby then sorts a few rows per
        # batch, not the whole table (the q5 partial+final idiom).
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(cutoff)))
        qty_c = to_units(t["l_quantity"])
        price_c = to_units(t["l_extendedprice"])
        disc_c = to_units(t["l_discount"])
        tax_c = to_units(t["l_tax"])
        disc_price_u4 = pc.multiply(price_c, pc.subtract(pa.scalar(100, type=pa.int64()), disc_c))
        charge_u6 = pc.multiply(disc_price_u4, pc.add(pa.scalar(100, type=pa.int64()), tax_c))
        tbl = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_c": qty_c,
                "price_c": price_c,
                "disc_price_u4": disc_price_u4,
                "charge_u6": charge_u6,
            }
        )
        part = tbl.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("qty_c", "sum"),
                ("price_c", "sum"),
                ("disc_price_u4", "sum"),
                ("charge_u6", "sum"),
                ("qty_c", "count"),
            ]
        )
        return pa.table(
            {
                "l_returnflag": part["l_returnflag"],
                "l_linestatus": part["l_linestatus"],
                "qty_c": part["qty_c_sum"],
                "price_c": part["price_c_sum"],
                "disc_price_u4": part["disc_price_u4_sum"],
                "charge_u6": part["charge_u6_sum"],
                "n": part["qty_c_count"],
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_c", alias_name="qty_c"),
            Sum("price_c", alias_name="price_c"),
            Sum("disc_price_u4", alias_name="disc_price_u4"),
            Sum("charge_u6", alias_name="charge_u6"),
            Sum("n", alias_name="count_order"),
        )
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        n = df["count_order"].to_numpy(dtype=np.int64)
        out = pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"],
                "l_linestatus": df["l_linestatus"],
                "sum_qty": units_to_double(df["qty_c"], 2),
                "sum_base_price": units_to_double(df["price_c"], 2),
                "sum_disc_price": units_to_double(df["disc_price_u4"], 4),
                "sum_charge": units_to_double(df["charge_u6"], 6),
            }
        )
        out["avg_qty"] = units_to_double(df["qty_c"], 2) / n
        out["avg_price"] = units_to_double(df["price_c"], 2) / n
        out["count_order"] = n
        return out

    return agg.map_batches(finalize, batch_format="pandas")


@query(
    "events_by_type",
    sql="""
SELECT event_type, COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value,
  COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
""",
)
def events_by_type(sf_dir: str) -> ray.data.Dataset:
    """Event-stream rollup with exact sums and a distinct-count."""
    from ray.data.aggregate import Count, Sum

    ds = read_table(sf_dir, "events", columns=["event_type", "value", "user_id"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "value_c": to_units(t["value"]),
                "user_id": t["user_id"],
            }
        )

    # distinct users per type: dedupe (type, user) pairs first, then count.
    prepped = ds.map_batches(prep, batch_format="pyarrow")
    base = prepped.groupby("event_type").aggregate(
        Count(alias_name="n_events"), Sum("value_c", alias_name="value_c")
    )
    from ocr_ray.functions.relational import bucketed_aggregate

    uniq = (
        bucketed_aggregate(
            prepped, keys=["event_type", "user_id"], aggs={"_c": ("user_id", "size")}
        )
        .groupby("event_type")
        .aggregate(Count(alias_name="n_users"))
    )
    joined = hash_join(
        base,
        uniq,
        on="event_type",
        num_buckets=4,
        left_schema=pa.schema(
            {"event_type": pa.string(), "n_events": pa.int64(), "value_c": pa.int64()}
        ),
        right_schema=pa.schema({"event_type": pa.string(), "n_users": pa.int64()}),
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "n_events": df["n_events"].astype(np.int64),
                "sum_value": units_to_double(df["value_c"], 2),
                "avg_value": units_to_double(df["value_c"], 2)
                / df["n_events"].to_numpy(dtype=np.int64),
                "n_users": df["n_users"].astype(np.int64),
            }
        )

    return joined.map_batches(finalize, batch_format="pandas")


@query(
    "orders_per_month",
    sql="""
SELECT strftime(o_orderdate, '%Y-%m') AS month, COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders GROUP BY month
""",
)
def orders_per_month(sf_dir: str) -> ray.data.Dataset:
    from ray.data.aggregate import Count, Sum

    ds = read_table(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "month": pc.strftime(t["o_orderdate"], format="%Y-%m"),
                "price_c": to_units(t["o_totalprice"]),
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("month")
        .aggregate(Count(alias_name="n_orders"), Sum("price_c", alias_name="price_c"))
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "month": df["month"],
                "n_orders": df["n_orders"].astype(np.int64),
                "total_price": units_to_double(df["price_c"], 2),
            }
        )

    return agg.map_batches(finalize, batch_format="pandas")


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
        num_buckets=16,
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
        num_buckets=16,
        left_schema=pa.schema({"l_orderkey": pa.int64(), "rev_u4": pa.int64()}),
        right_schema=pa.schema(
            {"o_orderkey": pa.int64(), "o_custkey": pa.int64(), "n_name": pa.string()}
        ),
    )

    def combine(t: pa.Table) -> pa.Table:
        # map-side partial: one row per nation per batch
        df = pd.DataFrame(
            {"n_name": t["n_name"].to_pylist(), "rev_u4": t["rev_u4"].to_numpy(zero_copy_only=False)}
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
        df = t.to_pandas().sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="mergesort"
        ).head(20)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

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
        df = t.to_pandas().sort_values(
            ["n_orders", "o_custkey"], ascending=[False, True], kind="mergesort"
        ).head(10)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

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
        num_buckets=16,
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


# ---------------------------------------------------------------------------
# Relational: set ops / sampling / window / as-of join / scalar functions
# ---------------------------------------------------------------------------


def _nation_setop(sf_dir: str, op: str) -> ray.data.Dataset:
    """Distributed set op over the two nationkey columns — ONE tag-side
    shuffle (``set_op``); no driver-side set algebra anywhere."""
    from ocr_ray.functions.relational import set_op

    return set_op(
        read_table(sf_dir, "customer", columns=["c_nationkey"]),
        read_table(sf_dir, "supplier", columns=["s_nationkey"]),
        on="c_nationkey",
        right_on="s_nationkey",
        op=op,
        key_type=pa.int64(),
        out_name="nationkey",
        num_buckets=8,
    )


@query(
    "nations_union",
    sql="""
SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
UNION
SELECT CAST(s_nationkey AS BIGINT) FROM supplier
""",
)
def nations_union(sf_dir: str) -> ray.data.Dataset:
    return _nation_setop(sf_dir, "union")


@query(
    "nations_intersect",
    sql="""
SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
INTERSECT
SELECT CAST(s_nationkey AS BIGINT) FROM supplier
""",
)
def nations_intersect(sf_dir: str) -> ray.data.Dataset:
    return _nation_setop(sf_dir, "intersect")


@query(
    "nations_except",
    sql="""
SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
EXCEPT
SELECT CAST(s_nationkey AS BIGINT) FROM supplier
""",
)
def nations_except(sf_dir: str) -> ray.data.Dataset:
    return _nation_setop(sf_dir, "except")


@query(
    "custkeys_except_orders",
    sql="""
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey FROM orders
""",
)
def custkeys_except_orders(sf_dir: str) -> ray.data.Dataset:
    """Set op over two LARGE key columns (customers without orders) — the
    scale shape: both sides stream through one tag-side shuffle."""
    from ocr_ray.functions.relational import set_op

    return set_op(
        read_table(sf_dir, "customer", columns=["c_custkey"]),
        read_table(sf_dir, "orders", columns=["o_custkey"]),
        on="c_custkey",
        right_on="o_custkey",
        op="except",
        num_buckets=16,
    )


@query(
    "custkeys_intersect_orders",
    sql="""
SELECT c_custkey FROM customer
INTERSECT
SELECT o_custkey FROM orders
""",
)
def custkeys_intersect_orders(sf_dir: str) -> ray.data.Dataset:
    from ocr_ray.functions.relational import set_op

    return set_op(
        read_table(sf_dir, "customer", columns=["c_custkey"]),
        read_table(sf_dir, "orders", columns=["o_custkey"]),
        on="c_custkey",
        right_on="o_custkey",
        op="intersect",
        num_buckets=16,
    )


@query(
    "customer_orders_full_outer",
    sql="""
SELECT c.c_custkey, c.c_name, o.n_orders
FROM customer c FULL OUTER JOIN (
  SELECT o_custkey, COUNT(*) AS n_orders FROM orders WHERE o_totalprice > 450000
  GROUP BY o_custkey
) o ON c.c_custkey = o.o_custkey
""",
)
def customer_orders_full_outer(sf_dir: str) -> ray.data.Dataset:
    """FULL OUTER join through the bucketed hash join (outer fills are
    null-typed by the explicit bucket output schema). The right side is a
    filtered per-customer order count, so unmatched rows exist on BOTH
    sides (big spenders missing from customer would be left-only; customers
    without big orders are right-null)."""
    from ray.data.aggregate import Count

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    from ocr_ray.functions.relational import bucketed_aggregate

    counts = bucketed_aggregate(
        read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
        .map_batches(
            lambda t: t.filter(pc.greater(t["o_totalprice"], pa.scalar(450000.0))).select(
                ["o_custkey"]
            ),
            batch_format="pyarrow",
        ),
        keys=["o_custkey"],
        aggs={"n_orders": ("o_custkey", "size")},
    )
    return hash_join(
        cust,
        counts,
        on="c_custkey",
        right_on="o_custkey",
        how="full",
        num_buckets=8,
        left_schema=pa.schema({"c_custkey": pa.int64(), "c_name": pa.string()}),
        right_schema=pa.schema({"o_custkey": pa.int64(), "n_orders": pa.int64()}),
    ).map_batches(
        lambda t: t.select(["c_custkey", "c_name", "n_orders"]), batch_format="pyarrow"
    )


@query(
    "merge_changeset_orders",
    sql="""
WITH chg AS (
  SELECT o_orderkey, 'D' AS op, '' AS o_orderstatus, 0.0 AS o_totalprice
  FROM orders WHERE o_orderkey % 10 = 7
  UNION ALL
  SELECT o_orderkey, 'U', 'U', CAST(o_orderkey % 1000 AS DOUBLE)
  FROM orders WHERE o_orderkey % 10 = 3
  UNION ALL
  SELECT o_orderkey + 10000000, 'U', 'I', CAST(o_orderkey % 500 AS DOUBLE)
  FROM orders WHERE o_orderkey % 10 = 0
)
SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice
FROM orders b LEFT JOIN chg c ON c.o_orderkey = b.o_orderkey
WHERE c.op IS NULL
UNION ALL
SELECT o_orderkey, o_orderstatus, o_totalprice FROM chg WHERE op = 'U'
""",
)
def merge_changeset_orders(sf_dir: str) -> ray.data.Dataset:
    """Warehouse ``MERGE INTO``: apply a changeset (deletes for keys
    ending in 7, payload updates for keys ending in 3, inserts of new
    keys derived from keys ending in 0) to the orders snapshot —
    ``functions/relational.merge_upsert``. One bucketed full-outer join
    with per-key resolution inside the join bucket; the changeset here is
    derived deterministically from the snapshot itself so the oracle can
    rebuild it in SQL."""
    from ocr_ray.functions.relational import merge_upsert

    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    base = read_table(sf_dir, "orders", columns=cols)

    def mk_changes(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        status = t["o_orderstatus"].to_numpy(zero_copy_only=False)
        price = t["o_totalprice"].to_numpy(zero_copy_only=False)
        del_m = k % 10 == 7
        upd_m = k % 10 == 3
        ins_m = k % 10 == 0
        keys = np.concatenate([k[del_m], k[upd_m], k[ins_m] + 10_000_000])
        ops = np.concatenate(
            [
                np.full(del_m.sum(), "D", dtype=object),
                np.full(upd_m.sum(), "U", dtype=object),
                np.full(ins_m.sum(), "U", dtype=object),
            ]
        )
        st = np.concatenate(
            [
                np.full(del_m.sum(), "", dtype=object),
                np.full(upd_m.sum(), "U", dtype=object),
                np.full(ins_m.sum(), "I", dtype=object),
            ]
        )
        pr = np.concatenate(
            [
                np.zeros(del_m.sum()),
                (k[upd_m] % 1000).astype(np.float64),
                (k[ins_m] % 500).astype(np.float64),
            ]
        )
        return pa.table(
            {
                "o_orderkey": pa.array(keys, type=pa.int64()),
                "op": pa.array(ops, type=pa.string()),
                "o_orderstatus": pa.array(st, type=pa.string()),
                "o_totalprice": pa.array(pr, type=pa.float64()),
            }
        )

    changes = base.map_batches(mk_changes, batch_format="pyarrow")
    return merge_upsert(
        base,
        changes,
        on="o_orderkey",
        num_buckets=16,
        base_schema=pa.schema(
            {"o_orderkey": pa.int64(), "o_orderstatus": pa.string(), "o_totalprice": pa.float64()}
        ),
        changes_schema=pa.schema(
            {
                "o_orderkey": pa.int64(),
                "op": pa.string(),
                "o_orderstatus": pa.string(),
                "o_totalprice": pa.float64(),
            }
        ),
    )


@query(
    "incremental_agg_orders",
    sql="""
WITH chg AS (
  SELECT o_orderkey, 'D' AS op, '' AS o_orderstatus, 0.0 AS o_totalprice
  FROM orders WHERE o_orderkey % 10 = 7
  UNION ALL
  SELECT o_orderkey, 'U', 'U', CAST(o_orderkey % 1000 AS DOUBLE)
  FROM orders WHERE o_orderkey % 10 = 3
  UNION ALL
  SELECT o_orderkey + 10000000, 'U', 'I', CAST(o_orderkey % 500 AS DOUBLE)
  FROM orders WHERE o_orderkey % 10 = 0
),
merged AS (
  SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice
  FROM orders b LEFT JOIN chg c ON c.o_orderkey = b.o_orderkey
  WHERE c.op IS NULL
  UNION ALL
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM chg WHERE op = 'U'
)
SELECT o_orderstatus, COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM merged GROUP BY o_orderstatus
""",
)
def incremental_agg_orders(sf_dir: str) -> ray.data.Dataset:
    """Materialized-view maintenance: keep a per-status (count, sum)
    aggregate current under the same changeset as ``merge_changeset_orders``
    WITHOUT re-aggregating the snapshot rows it doesn't touch.

    View' = view + signed deltas: each delete/update retracts (-1, -old)
    under the old status (old payload fetched by ONE bucketed left join of
    the changeset to the snapshot) and each update/insert asserts
    (+1, +new) under the new status; a tiny groupby folds base partials
    and deltas. The oracle recomputes the view from the fully-merged
    table — maintenance must equal recomputation exactly, which the
    integer-unit money arithmetic makes bit-exact. At 100 TB the
    maintenance path shuffles only the changeset (+ the join's bucketed
    probe of the snapshot), never re-aggregates the snapshot."""
    from ray.data.aggregate import Sum

    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    base = read_table(sf_dir, "orders", columns=cols)

    # -- base view partials: map-side combine to <= |status| rows/batch --
    def base_partial(t: pa.Table) -> pa.Table:
        tbl = pa.table(
            {
                "o_orderstatus": t["o_orderstatus"],
                "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "sum_c": to_units(t["o_totalprice"]),
            }
        )
        part = tbl.group_by(["o_orderstatus"]).aggregate([("n", "sum"), ("sum_c", "sum")])
        return pa.table(
            {
                "o_orderstatus": part["o_orderstatus"],
                "n": part["n_sum"],
                "sum_c": part["sum_c_sum"],
            }
        )

    view_parts = base.map_batches(base_partial, batch_format="pyarrow")

    # -- changeset with old payload attached (one bucketed left join) --
    def mk_changes(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        del_m = k % 10 == 7
        upd_m = k % 10 == 3
        ins_m = k % 10 == 0
        keys = np.concatenate([k[del_m], k[upd_m], k[ins_m] + 10_000_000])
        ops = np.concatenate(
            [
                np.full(del_m.sum(), "D", dtype=object),
                np.full(upd_m.sum(), "U", dtype=object),
                np.full(ins_m.sum(), "U", dtype=object),
            ]
        )
        st = np.concatenate(
            [
                np.full(del_m.sum(), "", dtype=object),
                np.full(upd_m.sum(), "U", dtype=object),
                np.full(ins_m.sum(), "I", dtype=object),
            ]
        )
        # new payload in integer cents (prices are integer-valued here)
        pr = np.concatenate(
            [
                np.zeros(del_m.sum(), dtype=np.int64),
                (k[upd_m] % 1000).astype(np.int64) * 100,
                (k[ins_m] % 500).astype(np.int64) * 100,
            ]
        )
        return pa.table(
            {
                "o_orderkey": pa.array(keys, type=pa.int64()),
                "op": pa.array(ops, type=pa.string()),
                "new_status": pa.array(st, type=pa.string()),
                "new_c": pa.array(pr, type=pa.int64()),
            }
        )

    changes = base.map_batches(mk_changes, batch_format="pyarrow")

    def old_payload(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "old_status": t["o_orderstatus"],
                "old_c": to_units(t["o_totalprice"]),
            }
        )

    def deltas(df: pd.DataFrame) -> pd.DataFrame:
        out_status = []
        out_n = []
        out_sum = []
        matched = df["old_status"].notna().to_numpy()
        # retraction under the OLD status for every change that hit a row
        out_status.append(df["old_status"].to_numpy()[matched])
        out_n.append(np.full(int(matched.sum()), -1, dtype=np.int64))
        out_sum.append(-df["old_c"].to_numpy()[matched].astype(np.int64))
        # assertion under the NEW status for every upsert
        ups = (df["op"] == "U").to_numpy()
        out_status.append(df["new_status"].to_numpy()[ups])
        out_n.append(np.ones(int(ups.sum()), dtype=np.int64))
        out_sum.append(df["new_c"].to_numpy()[ups].astype(np.int64))
        g = pd.DataFrame(
            {
                "o_orderstatus": np.concatenate(out_status),
                "n": np.concatenate(out_n),
                "sum_c": np.concatenate(out_sum),
            }
        )
        # combine inside the bucket: <= |status| rows leave the task
        return g.groupby("o_orderstatus", as_index=False)[["n", "sum_c"]].sum()

    delta_parts = hash_join(
        changes,
        base.map_batches(old_payload, batch_format="pyarrow"),
        on="o_orderkey",
        how="left",
        num_buckets=16,
        left_schema=pa.schema(
            {
                "o_orderkey": pa.int64(),
                "op": pa.string(),
                "new_status": pa.string(),
                "new_c": pa.int64(),
            }
        ),
        right_schema=pa.schema(
            {"o_orderkey": pa.int64(), "old_status": pa.string(), "old_c": pa.int64()}
        ),
        bucket_post=deltas,
        post_schema=pa.schema(
            {"o_orderstatus": pa.string(), "n": pa.int64(), "sum_c": pa.int64()}
        ),
    )

    folded = (
        view_parts.union(delta_parts)
        .groupby("o_orderstatus")
        .aggregate(Sum("n", alias_name="n_orders"), Sum("sum_c", alias_name="sum_all"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["n_orders"], pa.scalar(0, type=pa.int64())))
        return pa.table(
            {
                "o_orderstatus": t["o_orderstatus"],
                "n_orders": pc.cast(t["n_orders"], pa.int64()),
                "sum_price": pa.array(
                    units_to_double(t["sum_all"].to_numpy(zero_copy_only=False), 2)
                ),
            }
        )

    return folded.map_batches(finalize, batch_format="pyarrow")


@query(
    "range_join_followup_events",
    sql="""
SELECT b.event_id AS event_id, b.user_id AS user_id, b.ts AS ts,
       a.event_id AS event_id_r, a.ts AS ts_r
FROM events b JOIN events a ON b.user_id = a.user_id
WHERE b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
""",
)
def range_join_followup_events(sf_dir: str) -> ray.data.Dataset:
    """Equality+range join (pairs of same-user events where the second
    fires within one hour after the first): co-partition on the equality
    key through the ONE-shuffle bucketed join, apply the time-range
    predicate inside each bucket body so non-qualifying pairs never leave
    the task (``range_join``). Self-join flavor: the right side's
    colliding columns arrive suffixed ``_r``, and the range value column
    is named post-rename (``ts_r``)."""
    from ocr_ray.functions.relational import range_join

    ts = pa.timestamp("us")
    schema = pa.schema({"event_id": pa.int64(), "user_id": pa.int64(), "ts": ts})
    followup = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    anchor = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    return range_join(
        followup,
        anchor,
        on="user_id",
        left_val="ts",
        right_val="ts_r",
        lo=pd.Timedelta(microseconds=1),
        hi=pd.Timedelta(hours=1),
        num_buckets=16,
        left_schema=schema,
        right_schema=schema,
    )


@query(
    "sample_orders_systematic",
    sql="""
SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 97 = 3
""",
)
def sample_orders_systematic(sf_dir: str) -> ray.data.Dataset:
    """Deterministic ~1% systematic sample (key-residue filter) — the
    reproducible cousin of ``Dataset.random_sample`` for pipelines that
    must be re-runnable/resumable (same sample every run, any cluster)."""
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def pick(t: pa.Table) -> pa.Table:
        keep = pc.equal(
            pc.subtract(
                t["o_orderkey"],
                pc.multiply(pc.divide(t["o_orderkey"], pa.scalar(97, type=pa.int64())), pa.scalar(97, type=pa.int64())),
            ),
            pa.scalar(3, type=pa.int64()),
        )
        return t.filter(keep)

    return ds.map_batches(pick, batch_format="pyarrow")


@query(
    "stratified_sample_orders",
    sql="""
SELECT o_orderstatus, o_orderkey, o_totalprice FROM (
  SELECT o_orderstatus, o_orderkey, o_totalprice,
    row_number() OVER (PARTITION BY o_orderstatus
      ORDER BY (o_orderkey * 2654435761) % 4294967296, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 50
""",
)
def stratified_sample_orders(sf_dir: str) -> ray.data.Dataset:
    """Deterministic stratified sample: exactly 50 rows per stratum
    (o_orderstatus), chosen by a Knuth multiplicative pseudo-hash of the
    key — reproducible on any cluster, unlike ``random_sample``.

    Distributed shape: per-batch partial top-50 per stratum (each batch
    contributes at most 50 x strata rows), then a tiny per-stratum final
    merge — the same partial-top-k discipline as q3, so no task ever holds
    a stratum's full population even when strata are few and huge."""
    K = 50
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        k = df["o_orderkey"].to_numpy()
        df["_h"] = (k * 2654435761) % 4294967296
        df = df.sort_values(["o_orderstatus", "_h", "o_orderkey"], kind="mergesort")
        return pa.Table.from_pandas(
            df.groupby("o_orderstatus", sort=False).head(K), preserve_index=False
        ).replace_schema_metadata(None)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_h", "o_orderkey"], kind="mergesort").head(K)
        return g[["o_orderstatus", "o_orderkey", "o_totalprice"]]

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderstatus")
        .map_groups(final, batch_format="pandas")
    )


@query(
    "collect_orders_per_customer",
    sql="""
SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
       string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderdate, o_orderkey) AS order_keys
FROM orders GROUP BY o_custkey
""",
)
def collect_orders_per_customer(sf_dir: str) -> ray.data.Dataset:
    """collect_list / string_agg: per-key ordered list of values, emitted
    as a deterministic comma-joined string. Coarse-bucket shuffle on the
    grouping key, one vectorized sort + group-concat pass per bucket —
    bucket count (not customer count) is the parallelism knob."""
    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate"])

    def bucketize(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t["o_custkey"].to_numpy(zero_copy_only=False))
        return t.append_column("_bucket", pa.array((h % np.uint64(32)).astype(np.int32)))

    def body(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort"
        )
        keys = g["o_orderkey"].astype(str).to_numpy()
        cust = g["o_custkey"].to_numpy()
        new = np.empty(len(g), dtype=bool)
        new[0] = True
        new[1:] = cust[1:] != cust[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.concatenate([starts, [len(g)]]))
        joined = [",".join(keys[s : s + c]) for s, c in zip(starts, counts)]
        return pd.DataFrame(
            {
                "o_custkey": cust[starts],
                "n_orders": counts.astype(np.int64),
                "order_keys": joined,
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(body, batch_format="pandas")
    )


@query(
    "tfidf_doc_tokens",
    sql="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, token
), idf AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token
), n AS (SELECT COUNT(*) AS n FROM documents)
SELECT tf.doc_id, tf.token, tf.tf, idf.df,
       CAST(tf.tf AS DOUBLE) * ln(CAST(n.n AS DOUBLE) / CAST(idf.df AS DOUBLE)) AS tfidf
FROM tf, idf, n WHERE tf.token = idf.token
""",
)
def tfidf_doc_tokens(sf_dir: str) -> ray.data.Dataset:
    """TF-IDF over the document corpus, the canonical two-shuffle shape:

    1. map_batches: tokenize + per-(doc, token) term counts with one Arrow
       ``group_by`` per batch (documents are whole rows, so per-batch tf is
       exact — no cross-batch combine needed);
    2. ``groupby(token).count()`` for document frequency (shuffle #1);
    3. bucketed ``hash_join`` tf x df on token (shuffle #2), tfidf computed
       vectorized inside the downstream map.

    N (corpus size) is a parquet metadata count — no execution. The idf
    join is a real shuffle join, not a broadcast, because at web scale the
    vocabulary does not fit a broadcast side."""
    from ray.data.aggregate import Count

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = float(ds.count())  # parquet metadata count — no execution

    def term_counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        parents = pc.list_parent_indices(toks)
        flat = pa.table(
            {
                "doc_id": pc.take(t["doc_id"].combine_chunks(), parents),
                "token": pc.list_flatten(toks),
            }
        )
        out = flat.group_by(["doc_id", "token"]).aggregate([([], "count_all")])
        return out.rename_columns(["doc_id", "token", "tf"]).set_column(
            2, "tf", pc.cast(out["count_all"], pa.int64())
        )

    from ocr_ray.functions.relational import bucketed_aggregate

    tf = ds.map_batches(term_counts, batch_format="pyarrow")
    # per-token: vocabulary scales with the corpus -> bucketed fold
    df = bucketed_aggregate(tf, keys=["token"], aggs={"df": ("doc_id", "size")})
    joined = hash_join(
        tf,
        df.map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("df"), "df", pc.cast(t["df"], pa.int64())
            ),
            batch_format="pyarrow",
        ),
        on="token",
        num_buckets=16,
        left_schema=pa.schema(
            {"doc_id": pa.int64(), "token": pa.string(), "tf": pa.int64()}
        ),
        right_schema=pa.schema({"token": pa.string(), "df": pa.int64()}),
    )

    def score(t: pa.Table) -> pa.Table:
        import math

        tf_d = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        df_d = t["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        # numpy's SIMD log differs from libm ln by 1 ulp on some inputs;
        # libm (math.log) matches DuckDB bit-exact. df has few distinct
        # values per batch, so libm-log only the uniques, then gather.
        uniq, inv = np.unique(df_d, return_inverse=True)
        idf = np.array([math.log(n_docs / d) for d in uniq])[inv]
        return t.append_column("tfidf", pa.array(tf_d * idf))

    return joined.map_batches(score, batch_format="pyarrow")


@query(
    "top_orders_per_customer",
    sql="""
SELECT o_custkey, o_orderkey, o_totalprice,
  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
FROM orders
QUALIFY rnk <= 2
""",
)
def top_orders_per_customer(sf_dir: str) -> ray.data.Dataset:
    """Windowed top-k per group (row_number PARTITION BY): coarse-bucket
    shuffle on the partition key, one vectorized rank pass per bucket."""
    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])

    def bucketize(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t["o_custkey"].to_numpy(zero_copy_only=False))
        return t.append_column("_bucket", pa.array((h % np.uint64(32)).astype(np.int32)))

    def rank_body(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        cust = g["o_custkey"].to_numpy()
        new = np.empty(len(g), dtype=bool)
        new[0] = True
        new[1:] = cust[1:] != cust[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.concatenate([starts, [len(g)]]))
        rnk = np.arange(len(g), dtype=np.int64) - np.repeat(starts, counts)
        out = g[["o_custkey", "o_orderkey", "o_totalprice"]].copy()
        out["rnk"] = rnk + 1
        return out[rnk < 2]

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(rank_body, batch_format="pandas")
    )


@query(
    "asof_join_events_orders",
    sql="""
WITH e AS (
  SELECT event_id, user_id,
    TIMESTAMP '1995-01-01' + INTERVAL ((event_id % 2400)) DAY AS ed
  FROM events
), o AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS matched_date
FROM e ASOF JOIN o ON e.user_id = o.o_custkey AND e.ed >= o.o_orderdate
""",
)
def asof_join_events_orders(sf_dir: str) -> ray.data.Dataset:
    """As-of (backward) join: each event (with a derived event date) to the
    latest order of the matching customer at or before that date. Both
    sides co-partition on the by-key through one coarse-bucket shuffle;
    each bucket runs one vectorized ``pandas.merge_asof``. Date ties are
    pre-collapsed to max(o_orderkey) so the match is deterministic."""
    events = read_table(sf_dir, "events", columns=["event_id", "user_id"])
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_orderkey"])
    num_buckets = 16

    def prep_events(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t["user_id"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "o_orderkey": pa.nulls(t.num_rows, type=pa.int64()),
                "o_orderdate": pa.nulls(t.num_rows, type=pa.timestamp("us")),
                "_side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                "_bucket": pa.array((h % np.uint64(num_buckets)).astype(np.int32)),
            }
        )

    def prep_orders(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t["o_custkey"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "event_id": pa.nulls(t.num_rows, type=pa.int64()),
                "user_id": pc.cast(t["o_custkey"], pa.int64()),
                "o_orderkey": t["o_orderkey"],
                "o_orderdate": t["o_orderdate"],
                "_side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                "_bucket": pa.array((h % np.uint64(num_buckets)).astype(np.int32)),
            }
        )

    both = events.map_batches(prep_events, batch_format="pyarrow").union(
        orders.map_batches(prep_orders, batch_format="pyarrow")
    )

    def asof_body(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["_side"] == 0][["event_id", "user_id"]].copy()
        o = g[g["_side"] == 1][["user_id", "o_orderdate", "o_orderkey"]].copy()
        e["ed"] = (
            pd.Timestamp("1995-01-01")
            + pd.to_timedelta(e["event_id"].to_numpy() % 2400, unit="D")
        ).astype(o["o_orderdate"].dtype)
        # collapse date ties deterministically: max orderkey per (cust, date)
        o = (
            o.sort_values(["user_id", "o_orderdate", "o_orderkey"], kind="mergesort")
            .drop_duplicates(["user_id", "o_orderdate"], keep="last")
        )
        e = e.sort_values("ed", kind="mergesort")
        o = o.sort_values("o_orderdate", kind="mergesort")
        m = pd.merge_asof(
            e,
            o,
            left_on="ed",
            right_on="o_orderdate",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        ).dropna(subset=["o_orderkey"])
        return pd.DataFrame(
            {
                "event_id": m["event_id"].astype(np.int64),
                "user_id": m["user_id"].astype(np.int64),
                "o_orderkey": m["o_orderkey"].astype(np.int64),
                "matched_date": m["o_orderdate"].dt.strftime("%Y-%m-%d"),
            }
        )

    return both.groupby("_bucket").map_groups(asof_body, batch_format="pandas")


@query(
    "date_functions_orders",
    sql="""
SELECT o_orderkey,
  CAST(year(o_orderdate) AS BIGINT) AS yr,
  CAST(month(o_orderdate) AS BIGINT) AS mon,
  CAST(day(o_orderdate) AS BIGINT) AS dom,
  CAST(isodow(o_orderdate) AS BIGINT) AS dow_iso,
  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
  strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date
FROM orders
""",
)
def date_functions_orders(sf_dir: str) -> ray.data.Dataset:
    """Date/time scalar kernels (year/month/day/isodow/quarter/date math)."""
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def fx(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"]
        due = pc.add(d, pa.scalar(datetime.timedelta(days=90)))
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "yr": pc.cast(pc.year(d), pa.int64()),
                "mon": pc.cast(pc.month(d), pa.int64()),
                "dom": pc.cast(pc.day(d), pa.int64()),
                "dow_iso": pc.cast(
                    pc.day_of_week(d, count_from_zero=False, week_start=1), pa.int64()
                ),
                "qtr": pc.cast(pc.quarter(d), pa.int64()),
                "due_date": pc.strftime(due, format="%Y-%m-%d"),
            }
        )

    return ds.map_batches(fx, batch_format="pyarrow")


@query(
    "math_functions_lineitem",
    sql="""
SELECT l_orderkey, l_linenumber,
  sqrt(l_quantity) AS qty_sqrt,
  l_quantity * l_quantity AS qty_sq,
  abs(l_discount - 0.05) AS disc_dev,
  ceil(l_extendedprice / 100) AS price_ceil,
  floor(l_extendedprice / 100) AS price_floor,
  round(l_extendedprice) AS price_round,
  CAST(l_orderkey % 7 AS BIGINT) AS key_mod7
FROM lineitem
""",
)
def math_functions_lineitem(sf_dir: str) -> ray.data.Dataset:
    """Math scalar kernels chosen for IEEE bit-exactness across engines
    (sqrt/abs/ceil/floor/integer-valued round/multiply/mod)."""
    ds = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"]
    )

    def fx(t: pa.Table) -> pa.Table:
        price100 = pc.divide(t["l_extendedprice"], pa.scalar(100.0))
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": pc.cast(t["l_linenumber"], pa.int32()),
                "qty_sqrt": pc.sqrt(t["l_quantity"]),
                "qty_sq": pc.multiply(t["l_quantity"], t["l_quantity"]),
                "disc_dev": pc.abs(pc.subtract(t["l_discount"], pa.scalar(0.05))),
                "price_ceil": pc.ceil(price100),
                "price_floor": pc.floor(price100),
                "price_round": pc.round(
                    t["l_extendedprice"], ndigits=0, round_mode="half_towards_infinity"
                ),
                "key_mod7": pc.subtract(
                    t["l_orderkey"],
                    pc.multiply(
                        pc.divide(t["l_orderkey"], pa.scalar(7, type=pa.int64())),
                        pa.scalar(7, type=pa.int64()),
                    ),
                ),
            }
        )

    return ds.map_batches(fx, batch_format="pyarrow")


@query(
    "json_extract_events",
    sql="""
SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k_value,
  CAST(length(props) AS BIGINT) AS props_len
FROM events
""",
)
def json_extract_events(sf_dir: str) -> ray.data.Dataset:
    """JSON scalar extraction over the events.props column — vectorized
    regex field extraction (no Python json.loads per row)."""
    ds = read_table(sf_dir, "events", columns=["event_id", "props"])

    def fx(t: pa.Table) -> pa.Table:
        ext = pc.extract_regex(t["props"], pattern=r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(ext, "k"), pa.int64())
        return pa.table(
            {
                "event_id": t["event_id"],
                "k_value": k,
                "props_len": pc.cast(pc.utf8_length(t["props"]), pa.int64()),
            }
        )

    return ds.map_batches(fx, batch_format="pyarrow")


@query(
    "supplier_stats_by_nation",
    sql="""
SELECT CAST(s_nationkey AS BIGINT) AS nationkey, COUNT(*) AS n_suppliers,
  CAST(MIN(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS min_bal,
  CAST(MAX(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS max_bal,
  CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
FROM supplier GROUP BY s_nationkey
""",
)
def supplier_stats_by_nation(sf_dir: str) -> ray.data.Dataset:
    """Min/Max/Count/Avg aggregate suite with exact integer-unit money."""
    from ray.data.aggregate import Count, Max, Min, Sum

    ds = read_table(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "nationkey": pc.cast(t["s_nationkey"], pa.int64()),
                "bal_c": to_units(t["s_acctbal"]),
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("nationkey")
        .aggregate(
            Count(alias_name="n_suppliers"),
            Min("bal_c", alias_name="min_c"),
            Max("bal_c", alias_name="max_c"),
            Sum("bal_c", alias_name="sum_c"),
        )
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_suppliers"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "nationkey": df["nationkey"].astype(np.int64),
                "n_suppliers": n,
                "min_bal": units_to_double(df["min_c"], 2),
                "max_bal": units_to_double(df["max_c"], 2),
                "avg_bal": units_to_double(df["sum_c"], 2) / n,
            }
        )

    return agg.map_batches(finalize, batch_format="pandas")


@query(
    "events_tumbling_5min",
    sql="""
SELECT strftime(time_bucket(INTERVAL 5 MINUTE, ts), '%Y-%m-%d %H:%M') AS window_start,
  event_type, COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY window_start, event_type
""",
)
def events_tumbling_5min(sf_dir: str) -> ray.data.Dataset:
    """Tumbling-window aggregate (5-min windows) — the finite-log idiom for
    the reference's absent streaming surface: window id is pure integer
    arithmetic on the epoch, then a standard partial+final groupby."""
    from ray.data.aggregate import Count, Sum

    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])
    w_us = 5 * 60 * 1_000_000

    def prep(t: pa.Table) -> pa.Table:
        epoch = pc.cast(t["ts"], pa.int64())
        start = pc.multiply(pc.divide(epoch, pa.scalar(w_us, type=pa.int64())), pa.scalar(w_us, type=pa.int64()))
        return pa.table(
            {
                "window_start": pc.strftime(
                    pc.cast(start, pa.timestamp("us")), format="%Y-%m-%d %H:%M"
                ),
                "event_type": t["event_type"],
                "value_c": to_units(t["value"]),
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["window_start", "event_type"])
        .aggregate(Count(alias_name="n_events"), Sum("value_c", alias_name="value_c"))
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "window_start": df["window_start"],
                "event_type": df["event_type"],
                "n_events": df["n_events"].astype(np.int64),
                "sum_value": units_to_double(df["value_c"], 2),
            }
        )

    return agg.map_batches(finalize, batch_format="pandas")


@query(
    "events_hopping_10min",
    sql="""
WITH assigned AS (
  SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS w, value FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL 5 MINUTE, ts) - INTERVAL 5 MINUTE AS w, value FROM events
)
SELECT strftime(w, '%Y-%m-%d %H:%M') AS window_start, COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM assigned GROUP BY w
""",
)
def events_hopping_10min(sf_dir: str) -> ray.data.Dataset:
    """Hopping windows (size 10 min, hop 5 min): each event replicates into
    its two overlapping windows inside map_batches (flat-map shape), then
    one groupby — replication happens before the shuffle, no driver loop."""
    from ray.data.aggregate import Count, Sum

    ds = read_table(sf_dir, "events", columns=["ts", "value"])
    hop_us = 5 * 60 * 1_000_000

    def assign(t: pa.Table) -> pa.Table:
        epoch = pc.cast(t["ts"], pa.int64())
        b = pc.multiply(pc.divide(epoch, pa.scalar(hop_us, type=pa.int64())), pa.scalar(hop_us, type=pa.int64()))
        value_c = to_units(t["value"])
        starts = pa.concat_arrays(
            [
                pc.cast(b, pa.int64()).combine_chunks(),
                pc.subtract(b, pa.scalar(hop_us, type=pa.int64())).combine_chunks(),
            ]
        )
        vals = pa.concat_arrays([value_c.combine_chunks()] * 2)
        return pa.table(
            {
                "window_start": pc.strftime(
                    pc.cast(starts, pa.timestamp("us")), format="%Y-%m-%d %H:%M"
                ),
                "value_c": vals,
            }
        )

    agg = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(Count(alias_name="n_events"), Sum("value_c", alias_name="value_c"))
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "window_start": df["window_start"],
                "n_events": df["n_events"].astype(np.int64),
                "sum_value": units_to_double(df["value_c"], 2),
            }
        )

    return agg.map_batches(finalize, batch_format="pandas")


@query(
    "doc_tokens_exploded",
    sql="""
WITH s AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
SELECT doc_id, unnest(ws) AS token,
  CAST(generate_subscripts(ws, 1) - 1 AS BIGINT) AS pos
FROM s
""",
)
def doc_tokens_exploded(sf_dir: str) -> ray.data.Dataset:
    """Unnest/explode: one output row per token with its position — the
    flat_map primitive, fully inside Arrow kernels."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        parents = pc.list_parent_indices(toks)
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        pos = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(starts, counts)
        return pa.table(
            {
                "doc_id": pc.take(t["doc_id"].combine_chunks(), parents),
                "token": pc.list_flatten(toks),
                "pos": pa.array(pos),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


@query(
    "q6_forecast_revenue",
    sql="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.05 AND l_quantity < 24
""",
)
def q6_forecast_revenue(sf_dir: str) -> pa.Table:
    """TPC-H Q6-style global aggregate: vectorized filter + exact
    integer-unit partial sums per batch, one tiny driver-side reduce."""
    ds = read_table(
        sf_dir, "lineitem", columns=["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"]
    )
    lo, hi = datetime.datetime(1996, 1, 1), datetime.datetime(1997, 1, 1)

    def partial(t: pa.Table) -> pa.Table:
        disc_c = to_units(t["l_discount"])
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                pc.less(t["l_shipdate"], pa.scalar(hi)),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(disc_c, pa.scalar(3, type=pa.int64())),
                    pc.less_equal(disc_c, pa.scalar(5, type=pa.int64())),
                ),
                pc.less(t["l_quantity"], pa.scalar(24.0)),
            ),
        )
        t2 = t.filter(mask)
        rev_u4 = pc.multiply(to_units(t2["l_extendedprice"]), to_units(t2["l_discount"]))
        return pa.table({"rev_u4": pa.array([pc.sum(rev_u4).as_py() or 0], type=pa.int64())})

    total = sum(
        r["rev_u4"] for r in ds.map_batches(partial, batch_format="pyarrow").take_all()
    )
    return pa.table({"revenue": pa.array([total / 1e4], type=pa.float64())})


@query(
    "orders_rollup_year_status",
    sql="""
SELECT COALESCE(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS yr,
  COALESCE(o_orderstatus, 'ALL') AS status, COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP (year(o_orderdate), o_orderstatus)
""",
)
def orders_rollup_year_status(sf_dir: str) -> ray.data.Dataset:
    """ROLLUP hierarchy (year, status) -> the partial+final idiom: ONE
    fine-grained distributed groupby, then the two coarser levels fold
    from the (tiny) finest level — no second pass over the data."""
    from ray.data.aggregate import Count, Sum

    ds = read_table(sf_dir, "orders", columns=["o_orderdate", "o_orderstatus", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "yr": pc.cast(pc.year(t["o_orderdate"]), pa.string()),
                "status": t["o_orderstatus"],
                "price_c": to_units(t["o_totalprice"]),
            }
        )

    fine = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["yr", "status"])
        .aggregate(Count(alias_name="n_orders"), Sum("price_c", alias_name="price_c"))
        .to_pandas()
    )
    lvl1 = (
        fine.groupby("yr", as_index=False)[["n_orders", "price_c"]].sum().assign(status="ALL")
    )
    lvl0 = pd.DataFrame(
        {"yr": ["ALL"], "status": ["ALL"], "n_orders": [fine["n_orders"].sum()],
         "price_c": [fine["price_c"].sum()]}
    )
    allv = pd.concat([fine, lvl1, lvl0], ignore_index=True)
    return pa.table(
        {
            "yr": pa.array(allv["yr"], type=pa.string()),
            "status": pa.array(allv["status"], type=pa.string()),
            "n_orders": pa.array(allv["n_orders"].to_numpy(dtype=np.int64)),
            "total_price": pa.array(units_to_double(allv["price_c"], 2)),
        }
    )


@query(
    "customers_above_nation_avg",
    sql="""
WITH nation_avg AS (
  SELECT c_nationkey, CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
  FROM customer GROUP BY c_nationkey
)
SELECT c.c_custkey, c.c_name, c.c_acctbal
FROM customer c JOIN nation_avg n ON c.c_nationkey = n.c_nationkey
WHERE CAST(c.c_acctbal AS DOUBLE) > n.avg_bal
""",
)
def customers_above_nation_avg(sf_dir: str) -> ray.data.Dataset:
    """Correlated-subquery shape (value vs its group's aggregate): the
    group aggregate is tiny (25 nations) so it broadcasts — one pass to
    aggregate, one map-side filtered pass; no join shuffle."""
    from ray.data.aggregate import Count, Sum

    ds = read_table(sf_dir, "customer", columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"c_nationkey": pc.cast(t["c_nationkey"], pa.int64()), "bal_c": to_units(t["c_acctbal"])}
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(Sum("bal_c", alias_name="sum_c"), Count(alias_name="n"))
        .to_pandas()
    )
    avg_by_nation = {
        int(k): units_to_double(np.array([s]), 2)[0] / n
        for k, s, n in zip(agg["c_nationkey"], agg["sum_c"], agg["n"])
    }
    avg_ref = ray.put({k: (v,) for k, v in avg_by_nation.items()})

    def above(t: pa.Table) -> pa.Table:
        keep = pc.greater(t["c_acctbal"], t["_avg"])
        return t.filter(keep).select(["c_custkey", "c_name", "c_acctbal"])

    withavg = lookup(ds, avg_ref, "c_nationkey", [("_avg", pa.float64())])
    return withavg.map_batches(above, batch_format="pyarrow")


@query(
    "median_price_by_status",
    sql="""
SELECT o_orderstatus, median(o_totalprice) AS median_price, COUNT(*) AS n_orders
FROM orders GROUP BY o_orderstatus
""",
)
def median_price_by_status(sf_dir: str) -> pa.Table:
    """Exact per-group median WITHOUT holding a whole group in one task:
    distributed histogram selection (min/max pass -> per-(group, bin)
    histogram groupby -> exact recount of only the bracketing bins). The
    round-1 ``groupby('o_orderstatus').map_groups`` put ~1/3 of all orders
    in one pandas frame — the canonical low-cardinality skew killer at
    100x scale."""
    from ocr_ray.functions.sketch import grouped_exact_median

    ds = read_table(sf_dir, "orders", columns=["o_orderstatus", "o_totalprice"])
    out = grouped_exact_median(ds, group_col="o_orderstatus", value_col="o_totalprice")
    return pa.table(
        {
            "o_orderstatus": pa.array(out["o_orderstatus"], type=pa.string()),
            "median_price": pa.array(out["median"].to_numpy(dtype=np.float64)),
            "n_orders": pa.array(out["n"].to_numpy(dtype=np.int64)),
        }
    )


@query(
    "orders_pivot_status_by_year",
    sql="""
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_partial
FROM orders GROUP BY yr
""",
)
def orders_pivot_status_by_year(sf_dir: str) -> ray.data.Dataset:
    """Pivot via conditional aggregation: status becomes columns with
    map-side 0/1 indicator columns summed in one groupby."""
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "orders", columns=["o_orderdate", "o_orderstatus"])

    def prep(t: pa.Table) -> pa.Table:
        s = t["o_orderstatus"]
        return pa.table(
            {
                "yr": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
                "is_o": pc.cast(pc.equal(s, "O"), pa.int64()),
                "is_f": pc.cast(pc.equal(s, "F"), pa.int64()),
                "is_p": pc.cast(pc.equal(s, "P"), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("yr")
        .aggregate(
            Sum("is_o", alias_name="n_open"),
            Sum("is_f", alias_name="n_filled"),
            Sum("is_p", alias_name="n_partial"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "yr": t["yr"],
                "n_open": pc.cast(t["n_open"], pa.int64()),
                "n_filled": pc.cast(t["n_filled"], pa.int64()),
                "n_partial": pc.cast(t["n_partial"], pa.int64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


@query(
    "approx_quantiles_totalprice",
    sql="""
WITH mm AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi,
            count(*) AS n FROM orders),
bb AS (
  SELECT least(greatest(CAST(trunc((o_totalprice - mm.lo) / (mm.hi - mm.lo) * 4096)
               AS BIGINT), 0), 4095) AS bin
  FROM orders, mm
),
hist AS (SELECT bin, count(*) AS c FROM bb GROUP BY bin),
cum AS (SELECT bin, c, SUM(c) OVER (ORDER BY bin) AS cm FROM hist),
qs(q) AS (VALUES (0.1), (0.5), (0.9), (0.99)),
tgt AS (SELECT q, q * (mm.n - 1) AS target, mm.lo, mm.hi FROM qs, mm),
pick AS (
  SELECT t.q, t.target, t.lo, t.hi, min(c.bin) AS bsel
  FROM tgt t JOIN cum c ON CAST(c.cm AS DOUBLE) >= t.target + 1
  GROUP BY t.q, t.target, t.lo, t.hi
)
SELECT p.q AS quantile,
  p.lo + (p.bsel + (p.target - COALESCE(
      (SELECT SUM(h.c) FROM hist h WHERE h.bin < p.bsel), 0)) / c.c)
    * ((p.hi - p.lo) / 4096) AS value
FROM pick p JOIN cum c ON c.bin = p.bsel
""",
)
def approx_quantiles_totalprice(sf_dir: str) -> pa.Table:
    """Approximate quantiles (p10/p50/p90/p99) of o_totalprice via the
    mergeable fixed-range histogram sketch: one cheap min/max pass, one
    histogram-partial pass (combiner inside map_batches), tiny driver
    merge. Error bounded by (max-min)/4096; asserted vs exact in tests.

    "Approximate" yet fully DETERMINISTIC — bin assignment, the cum-CDF
    search and the in-bin interpolation are fixed float expressions of
    (lo, hi, counts), so the SQL oracle reproduces the sketch's own
    output bit for bit (same op order: (v-lo)/(hi-lo)*bins truncated;
    lo + (b + (target-prev)/count) * (hi-lo)/bins)."""
    import functools

    from ray.data.aggregate import Max, Min

    from ocr_ray.functions.sketch import histogram_partial, histogram_quantiles

    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "orders", columns=["o_totalprice"])
    mm = ds.aggregate(Min("o_totalprice"), Max("o_totalprice"))
    lo, hi = float(mm["min(o_totalprice)"]), float(mm["max(o_totalprice)"])
    # distributed partial merge: driver input bounded by bin count (4096),
    # not by batch count.
    merged = (
        ds.map_batches(
            functools.partial(histogram_partial, col="o_totalprice", lo=lo, hi=hi),
            batch_format="pyarrow",
        )
        .groupby("bin")
        .aggregate(Sum("count", alias_name="count"))
        .to_pandas()
    )
    qs = [0.1, 0.5, 0.9, 0.99]
    vals = histogram_quantiles(merged, qs, lo=lo, hi=hi)
    return pa.table(
        {
            "quantile": pa.array(qs, type=pa.float64()),
            "value": pa.array(vals, type=pa.float64()),
        }
    )


@query(
    "frequent_tokens",
    sql="""
SELECT tok AS token, CAST(COUNT(*) AS BIGINT) AS count
FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
GROUP BY tok ORDER BY count DESC, token LIMIT 32
""",
)
def frequent_tokens(sf_dir: str) -> pa.Table:
    """Misra-Gries frequent-items sketch over the corpus token stream:
    per-batch bounded counter summaries (the combiner), merged driver-side,
    exact-recount verification of the surviving candidates via one
    broadcast semi-filtered aggregation. Guarantees: every token with
    frequency > N/k survives; reported counts are exact (recounted).

    The exact-recount of a candidate superset of the true top-32 makes
    the OUTPUT exact and deterministic (ties broken by token asc), so
    the oracle is the plain exact top-k SQL — the sketch only bounds the
    candidate set; it never changes the answer (the MG survival
    guarantee holds with 2x margin: 64 candidates for a top-32)."""
    from ocr_ray.functions.sketch import misra_gries_partial

    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=["text"])
    # distributed partial merge: driver input bounded by surviving-candidate
    # cardinality (tokens that appear in ANY batch summary), not batch count.
    from ocr_ray.functions.relational import bucketed_aggregate

    merged = bucketed_aggregate(
        ds.map_batches(misra_gries_partial, batch_format="pyarrow"),
        keys=["token"],
        aggs={"count": ("count", "sum")},
    ).to_pandas()
    cand = merged.set_index("token")["count"].nlargest(64)
    cand_ref = ray.put(sorted(cand.index))

    class Recount:
        def __init__(self, ref):
            self.keys = pa.array(ray.get(ref), type=pa.string())

        def __call__(self, t: pa.Table) -> pa.Table:
            toks = pc.split_pattern(t["text"], " ")
            flat = pc.list_flatten(
                toks if not isinstance(toks, pa.ChunkedArray) else toks.combine_chunks()
            )
            hit = flat.filter(pc.is_in(flat, value_set=self.keys))
            vc = hit.value_counts()  # Arrow kernel, no Python rows
            return pa.table(
                {
                    "token": pc.struct_field(vc, "values"),
                    "count": pc.cast(pc.struct_field(vc, "counts"), pa.int64()),
                }
            )

    recount = Recount(cand_ref)

    exact = (
        ds.map_batches(recount, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("count", alias_name="count"))
        .to_pandas()
        .sort_values(["count", "token"], ascending=[False, True])
        .head(32)
    )
    return pa.table(
        {
            "token": pa.array(exact["token"], type=pa.string()),
            "count": pa.array(exact["count"].to_numpy(dtype=np.int64)),
        }
    )


@query(
    "approx_distinct_users",
    sql="""
WITH base AS (SELECT DISTINCT event_type, user_id FROM events),
h0 AS (SELECT event_type, CAST(user_id AS UBIGINT) AS x FROM base),
h1 AS (SELECT * EXCLUDE (x), xor(x, x >> 30) AS x FROM h0),
h2 AS (SELECT * EXCLUDE (x), CAST((
    CAST(x % 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM h1),
h3 AS (SELECT * EXCLUDE (x), xor(x, x >> 27) AS x FROM h2),
h4 AS (SELECT * EXCLUDE (x), CAST((
    CAST(x % 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM h3),
h5 AS (SELECT * EXCLUDE (x), xor(x, x >> 31) AS h FROM h4),
rr AS (SELECT event_type,
         CAST(h >> 56 AS BIGINT) AS register,
         CASE WHEN CAST(h % 72057594037927936 AS BIGINT) = 0 THEN 57
              ELSE 1 + CAST(floor(log2(CAST(
                 CAST(h % 72057594037927936 AS BIGINT)
                 & (-CAST(h % 72057594037927936 AS BIGINT)) AS DOUBLE))) AS BIGINT)
         END AS rho
       FROM h5),
m AS (SELECT event_type, register, MAX(rho) AS rho FROM rr GROUP BY 1, 2),
agg AS (SELECT event_type,
          CAST(SUM(1::BIGINT << (57 - rho)) AS HUGEINT) AS s_present,
          COUNT(*) AS n_present
        FROM m GROUP BY 1),
e2 AS (SELECT event_type,
   256 - n_present AS zeros,
   0.7213 / (1 + 1.079 / 256) * 65536 * 144115188075855872
     / CAST(s_present + CAST(256 - n_present AS HUGEINT)
            * '144115188075855872'::HUGEINT AS DOUBLE) AS raw
 FROM agg)
SELECT event_type,
  CAST(floor(CASE WHEN raw <= 640.0 AND zeros > 0
                  THEN 256 * ln(256.0 / zeros) ELSE raw END + 0.5) AS BIGINT)
    AS approx_users
FROM e2
""",
)
def approx_distinct_users(sf_dir: str) -> pa.Table:
    """HyperLogLog approximate COUNT(DISTINCT user_id) per event_type:
    per-batch partial registers (the combiner), one tiny groupby on
    (event_type, register), integer-exact register merge + linear-counting
    correction. ORACLE-CHECKED BIT-EXACT: the estimator itself is
    deterministic arithmetic — splitmix64 (HUGEINT split-multiply SQL),
    register = top-8 bits, rho = first set bit of the low 56, and the
    harmonic denominator as ONE exact integer sum of 2^(57-rho), so the
    DuckDB oracle reproduces the estimate to the last bit, not just
    within error bounds (accuracy vs exact is asserted in tests too)."""
    from ocr_ray.functions.sketch import hll_estimate, hll_partial_registers

    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])
    partials = ds.map_batches(hll_partial_registers, batch_format="pyarrow")

    from ray.data.aggregate import Max

    merged = (
        partials.groupby(["event_type", "register"])
        .aggregate(Max("rho", alias_name="rho"))
        .to_pandas()
    )
    out = hll_estimate(merged)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], type=pa.string()),
            "approx_users": pa.array(out["approx_users"], type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Text analysis over documents
# ---------------------------------------------------------------------------


@query(
    "token_stats",
    sql="""
SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
  CAST(length(text) AS BIGINT) AS n_chars_measured,
  (CAST(length(text) AS BIGINT) - (len(string_split(text, ' ')) - 1))
    / CAST(len(string_split(text, ' ')) AS BIGINT) AS avg_token_len
FROM documents
""",
)
def token_stats(sf_dir: str) -> ray.data.Dataset:
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(textfn.token_stats, batch_format="pyarrow")


@query(
    "regex_token_stats",
    sql=r"""
SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_bpe_tokens
FROM documents
""",
)
def regex_token_stats(sf_dir: str) -> ray.data.Dataset:
    """Token counting two ways: whitespace split and a BPE-ish regex
    (letter runs / digit runs / single punctuation — the pre-tokenizer
    shape BPE vocabularies train over). Both engines run RE2, so counts
    match exactly."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

    def fx(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_ws_tokens": pc.cast(pc.list_value_length(toks), pa.int64()),
                "n_bpe_tokens": pc.cast(pc.count_substring_regex(t["text"], pat), pa.int64()),
            }
        )

    return ds.map_batches(fx, batch_format="pyarrow")


_LANG_SQL = """
WITH s AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
v AS (
  SELECT doc_id,
    count(*) FILTER (WHERE tok IN ('der','die','und','das','ein','zu')) AS votes_de,
    count(*) FILTER (WHERE tok IN ('the','and','of','a','to','in')) AS votes_en,
    count(*) FILTER (WHERE tok IN ('el','la','de','y','que','en')) AS votes_es,
    count(*) FILTER (WHERE tok IN ('le','la','et','les','des','un')) AS votes_fr,
    count(*) FILTER (WHERE tok IN ('de','shi','le','zai','he','you')) AS votes_zh
  FROM s GROUP BY doc_id)
SELECT doc_id,
  CASE
    WHEN votes_de >= votes_en AND votes_de >= votes_es AND votes_de >= votes_fr
         AND votes_de >= votes_zh THEN 'de'
    WHEN votes_en >= votes_es AND votes_en >= votes_fr AND votes_en >= votes_zh THEN 'en'
    WHEN votes_es >= votes_fr AND votes_es >= votes_zh THEN 'es'
    WHEN votes_fr >= votes_zh THEN 'fr'
    ELSE 'zh'
  END AS pred_lang,
  votes_de, votes_en, votes_es, votes_fr, votes_zh
FROM v
"""


@query("lang_id", sql=_LANG_SQL)
def lang_id(sf_dir: str) -> ray.data.Dataset:
    """Stopword-vote language ID — the heuristic is pure token-set counting
    with a deterministic argmax tie-break (first language in sorted order),
    so the SQL oracle reproduces it exactly (the CASE chain's >= order IS
    numpy argmax's first-max rule)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(textfn.lang_id, batch_format="pyarrow")


_QUALITY_SQL = """
WITH s AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
v AS (
  SELECT doc_id, count(*) AS n_tokens,
    count(*) FILTER (WHERE tok IN ('the','and','of','a','to','in')) AS n_stop,
    SUM(length(tok)) AS sum_len
  FROM s GROUP BY doc_id),
m AS (
  SELECT doc_id, n_tokens,
    CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio_en,
    CAST(sum_len AS DOUBLE) / n_tokens AS mean_token_len
  FROM v)
SELECT doc_id, n_tokens, stop_ratio_en, mean_token_len,
  0.4 * LEAST(GREATEST(n_tokens / 64.0, 0.0), 1.0)
  + 0.3 * LEAST(GREATEST(stop_ratio_en * 5, 0.0), 1.0)
  + 0.3 * LEAST(GREATEST(1.0 - abs(mean_token_len - 5.0) / 5.0, 0.0), 1.0) AS quality
FROM m
"""


@query("doc_quality", sql=_QUALITY_SQL)
def doc_quality(sf_dir: str) -> ray.data.Dataset:
    """Quality heuristics (length / stopword-ratio / token-length terms) —
    every term is IEEE +,-,*,/,abs,min,max in a fixed evaluation order, so
    the SQL oracle matches bit for bit."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(textfn.quality_score, batch_format="pyarrow")


# Hashed-feature linear classifier: word hash = mix64(seed + poly),
# per-class weight = mix64(h + (c+1)*golden) % 1001 - 500, score = sum
# over token occurrences, argmax with smallest-class tiebreak. Both mix64
# chains run in HUGEINT split-multiply; (c+1)*golden needs no split (the
# product is < 2^68, well inside HUGEINT).
_CLASSIFY_SQL = """
WITH RECURSIVE
toks0 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
dt AS (SELECT DISTINCT w FROM toks0),
mx AS (SELECT greatest(max(length(w)), 1) AS m FROM dt),
pw(k, p) AS (
  SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL
  SELECT k+1,
    ((p % 4294967296) * 1000003 +
     ((p // 4294967296) * 1000003 % 4294967296) * 4294967296
    ) % '18446744073709551616'::HUGEINT
  FROM pw, mx WHERE k < mx.m - 1
),
chars AS (
  SELECT w, gs.i, unicode(substr(w, CAST(gs.i + 1 AS INT), 1)) AS c
  FROM dt, LATERAL (SELECT unnest(range(0, CAST(length(w) AS BIGINT))) AS i) gs
),
terms AS (
  SELECT w,
    CAST(CAST(c AS HUGEINT) * pw.p % 4294967296 AS BIGINT) AS lo,
    CAST(CAST(c AS HUGEINT) * pw.p % '18446744073709551616'::HUGEINT // 4294967296 AS BIGINT) AS hi
  FROM chars JOIN pw ON pw.k = chars.i
),
ph AS (
  SELECT d.w,
    CAST(('11400714819323198485'::HUGEINT
      + COALESCE(CAST(SUM(t.lo) AS HUGEINT) + CAST(SUM(t.hi) AS HUGEINT) * 4294967296, 0))
      % '18446744073709551616'::HUGEINT AS UBIGINT) AS h0
  FROM dt d LEFT JOIN terms t ON d.w = t.w GROUP BY d.w
),
m1 AS (SELECT w, xor(h0, h0 >> 30) AS x FROM ph),
m2 AS (SELECT w, CAST((
    CAST(x % 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM m1),
m3 AS (SELECT w, xor(x, x >> 27) AS x FROM m2),
m4 AS (SELECT w, CAST((
    CAST(x % 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM m3),
wh AS (SELECT w, xor(x, x >> 31) AS h FROM m4),
cls AS (SELECT unnest(range(0, 8)) AS c),
wx AS (
  SELECT wh.w, cls.c,
    CAST((CAST(wh.h AS HUGEINT)
      + (CAST(cls.c + 1 AS HUGEINT) * '11400714819323198485'::HUGEINT)
        % '18446744073709551616'::HUGEINT)
      % '18446744073709551616'::HUGEINT AS UBIGINT) AS x
  FROM wh CROSS JOIN cls
),
c1 AS (SELECT w, c, xor(x, x >> 30) AS x FROM wx),
c2 AS (SELECT w, c, CAST((
    CAST(x % 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM c1),
c3 AS (SELECT w, c, xor(x, x >> 27) AS x FROM c2),
c4 AS (SELECT w, c, CAST((
    CAST(x % 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM c3),
wt AS (SELECT w, c, CAST(xor(x, x >> 31) % 1001 AS BIGINT) - 500 AS wgt FROM c4),
scores AS (
  SELECT t.doc_id, wt.c, CAST(SUM(wt.wgt) AS BIGINT) AS score
  FROM toks0 t JOIN wt ON wt.w = t.w
  GROUP BY t.doc_id, wt.c
),
ranked AS (
  SELECT doc_id, c, score,
    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, c ASC) AS rn
  FROM scores
)
SELECT doc_id, c AS label, score FROM ranked WHERE rn = 1
"""


@query("classify_docs", sql=_CLASSIFY_SQL)
def classify_docs(sf_dir: str) -> ray.data.Dataset:
    """Batched model scoring over documents: an 8-class hashed-feature
    linear classifier whose weights are derived arithmetically from the
    token hash (``functions/text.classify_hashed``), so the entire model —
    feature hashing, per-class dot products, argmax with deterministic
    tiebreak — is reproduced bit-exact by the SQL oracle. Stateless
    map_batches, zero shuffles; a learned weight matrix would broadcast
    via ``ray.put`` with the identical distributed shape."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(textfn.classify_hashed, batch_format="pyarrow")


_FINGERPRINT_SQL = """
WITH RECURSIVE
mx AS (SELECT greatest(max(length(text)), 1) AS m FROM documents),
pw(k, p) AS (
  SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL
  SELECT k+1,
    ((p % 4294967296) * 1000003 +
     ((p // 4294967296) * 1000003 % 4294967296) * 4294967296
    ) % '18446744073709551616'::HUGEINT
  FROM pw, mx WHERE k < mx.m - 1
),
chars AS (
  SELECT doc_id, gs.i, unicode(substr(text, CAST(gs.i + 1 AS INT), 1)) AS b
  FROM documents, LATERAL (SELECT unnest(range(0, CAST(length(text) AS BIGINT))) AS i) gs
),
terms AS (
  SELECT doc_id,
    CAST(CAST(b AS HUGEINT) * pw.p % 4294967296 AS BIGINT) AS lo,
    CAST(CAST(b AS HUGEINT) * pw.p % '18446744073709551616'::HUGEINT // 4294967296 AS BIGINT) AS hi
  FROM chars JOIN pw ON pw.k = chars.i
)
SELECT d.doc_id,
  CAST(COALESCE((CAST(SUM(t.lo) AS HUGEINT) + CAST(SUM(t.hi) AS HUGEINT) * 4294967296)
       % '18446744073709551616'::HUGEINT, 0) AS UBIGINT) AS fingerprint
FROM documents d LEFT JOIN terms t ON d.doc_id = t.doc_id
GROUP BY d.doc_id
"""


@query("doc_fingerprint", sql=_FINGERPRINT_SQL)
def doc_fingerprint(sf_dir: str) -> ray.data.Dataset:
    """Rabin-style polynomial rolling-hash fingerprint per document
    (``fp = sum(byte_i * 1000003^i) mod 2^64``), buffer-level vectorized
    with a segmented reduceat. The SQL oracle reproduces the wraparound
    arithmetic exactly in HUGEINT (split 32-bit multiply for the power
    chain, per-byte terms summed as BIGINT halves, reduce mod 2^64 into
    UBIGINT); byte == code point because the corpus is ASCII."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(textfn.fingerprint, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Deduplication suite (documents +- derived duplicate populations)
# ---------------------------------------------------------------------------


@query(
    "exact_dedup_docs",
    sql="""
WITH u AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000, text FROM documents
)
SELECT doc_id, md5(text) AS content_md5 FROM u
QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
""",
)
def exact_dedup_docs(sf_dir: str) -> ray.data.Dataset:
    """Exact dedup (hash-partition + first-per-key) over a corpus seeded
    with exact duplicate copies (doc_id + 2e6)."""
    from ocr_ray.functions.dedup import add_md5, dedup_by_key

    def dup_union(t: pa.Table) -> pa.Table:
        shifted = pc.add(t["doc_id"], pa.scalar(2_000_000, type=pa.int64()))
        both = pa.concat_tables([t, t.set_column(t.column_names.index("doc_id"), "doc_id", shifted)])
        return both

    def pre(t: pa.Table) -> pa.Table:
        # project text away and pre-dedup WITHIN the batch (min doc_id per
        # hash) before the shuffle: global first-per-key is the min of
        # batch mins, so the shuffle carries one row per distinct hash per
        # batch instead of every row + its text payload.
        part = (
            t.select(["doc_id", "content_md5"])
            .group_by(["content_md5"])
            .aggregate([("doc_id", "min")])
        )
        return pa.table(
            {"doc_id": part["doc_id_min"], "content_md5": part["content_md5"]}
        )

    ds = (
        read_table(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(dup_union, batch_format="pyarrow")
        .map_batches(add_md5, batch_format="pyarrow")
        .map_batches(pre, batch_format="pyarrow")
    )
    out = dedup_by_key(ds, key="content_md5", order="doc_id", num_buckets=8)
    return out.map_batches(
        lambda t: t.select(["doc_id", "content_md5"]), batch_format="pyarrow"
    )


@query(
    "prefix_dedup_docs",
    sql="""
SELECT doc_id FROM documents
QUALIFY row_number() OVER (
  PARTITION BY array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ')
  ORDER BY doc_id) = 1
""",
)
def prefix_dedup_docs(sf_dir: str) -> ray.data.Dataset:
    """Key-based near-dedup: first-5-words prefix key (real duplicate keys
    exist in the corpus), vectorized key extraction."""
    from ocr_ray.functions.dedup import dedup_by_key

    def keyed(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        prefix = pc.binary_join(pc.list_slice(toks, 0, 5), " ")
        return pa.table({"doc_id": t["doc_id"], "prefix_key": prefix})

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        keyed, batch_format="pyarrow"
    )
    out = dedup_by_key(ds, key="prefix_key", order="doc_id", num_buckets=8)
    return out.map_batches(lambda t: t.select(["doc_id"]), batch_format="pyarrow")


@query(
    "substring_dedup_docs",
    sql="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
wins AS (
  SELECT doc_id, array_to_string(w[gs.n+1 : gs.n+32], ' ') AS chunk
  FROM toks, LATERAL (SELECT unnest(range(0, greatest(len(w)-16, 1), 16)) AS n) gs
),
c AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY chunk) AS occ FROM wins)
SELECT doc_id,
  CAST(COUNT(*) AS BIGINT) AS total_windows,
  CAST(COUNT(*) FILTER (WHERE occ >= 2) AS BIGINT) AS dup_windows,
  CAST(COUNT(*) FILTER (WHERE occ >= 2) AS DOUBLE) / COUNT(*) AS dup_fraction
FROM c GROUP BY doc_id
""",
)
def substring_dedup_docs(sf_dir: str) -> ray.data.Dataset:
    """Substring-level exact-dedup signal (the training-data dedup of
    Lee et al., *Deduplicating Training Data Makes Language Models
    Better*): per document, the count and fraction of its 32-token
    stride-16 windows whose text occurs at least twice anywhere in the
    corpus — the gate a curation pipeline uses to drop or trim
    boilerplate-heavy documents that exact/MinHash doc-level dedup
    misses.

    Distributed shape: chunk strings never leave the expansion worker —
    each batch reduces to (doc_id, chunk-hash) rows, bucketed by hash so
    every occurrence of a chunk lands in one bucket, counted per hash
    within the bucket (vectorized ``np.unique``), pre-combined to
    per-(bucket, doc) partials, then finished with one small
    groupby-sum on doc_id. Two key-hash shuffles; shuffle payload is
    ~16 bytes per window regardless of chunk length. Window equality is
    by 64-bit content hash (collision-free at test scale; swap in a
    128-bit mix at 10^12-doc scale)."""
    from ray.data.aggregate import Sum

    from ocr_ray.functions.hashing import hash_utf8_column
    from ocr_ray.functions.text import token_windows

    B = 32  # scale note: derive from input bytes (sizing.buckets_for_input)

    def win_hashes(t: pa.Table) -> pa.Table:
        w = token_windows(t, window=32, stride=16)
        h = hash_utf8_column(w["chunk"])
        return pa.table(
            {
                "doc_id": w["doc_id"],
                "h": pa.array(h),
                "_bucket": pa.array((h % np.uint64(B)).astype(np.int32)),
            }
        )

    def bucket_body(g: pd.DataFrame) -> pd.DataFrame:
        h = g["h"].to_numpy()
        _, inv, cnt = np.unique(h, return_inverse=True, return_counts=True)
        dup = (cnt[inv] >= 2).astype(np.int64)
        du, dinv = np.unique(g["doc_id"].to_numpy(), return_inverse=True)
        return pd.DataFrame(
            {
                "doc_id": du,
                "dup": np.bincount(dinv, weights=dup).astype(np.int64),
                "tot": np.bincount(dinv).astype(np.int64),
            }
        )

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    partials = (
        ds.map_batches(win_hashes, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(bucket_body, batch_format="pandas")
    )
    # per-doc: key cardinality scales with the corpus -> bucketed fold
    from ocr_ray.functions.relational import bucketed_aggregate

    agg = bucketed_aggregate(
        partials, keys=["doc_id"], aggs={"dup": ("dup", "sum"), "tot": ("tot", "sum")}
    )

    def finish(t: pa.Table) -> pa.Table:
        dup = t["dup"].to_numpy(zero_copy_only=False).astype(np.int64)
        tot = t["tot"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "total_windows": pa.array(tot),
                "dup_windows": pa.array(dup),
                "dup_fraction": pa.array(dup.astype(np.float64) / tot),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _verified_pairs(ds_docs, cand_pairs, *, tau: float) -> ray.data.Dataset:
    """DISTRIBUTED exact-Jaccard verification of candidate pairs — no
    driver-side materialization of candidates anywhere (the round-1
    ``to_pandas`` + driver Jaccard was the ``*_pairs`` family's 100 TB
    scale-killer; web corpora with boilerplate-heavy near-dup clusters
    violate the "pairs << corpus" assumption it leaned on).

    Pipeline: candidate pairs (duplicates fine) + per-doc unique-sorted
    shingle signatures -> :func:`attach_verify_pairs` — TWO bucketed
    shuffles with all-Arrow bucket bodies (shuffle 1 dedups pairs and
    attaches each side's signature grouped by doc bucket; shuffle 2
    regroups by pair bucket and runs the vectorized set-Jaccard). Pairs
    stay distributed from candidate generation to the final tau filter.
    """
    from ocr_ray.functions.dedup import attach_verify_pairs, doc_shingle_lists

    sigs = ds_docs.map_batches(doc_shingle_lists, batch_format="pyarrow")
    return attach_verify_pairs(cand_pairs, sigs, tau=tau)


def _minhash_perm_values() -> str:
    """The 64 (a, b) permutation constants as SQL VALUES rows — generated
    from the same seeded RNG as ``functions/dedup._perm_params`` so the
    oracle's permutations are the implementation's by construction."""
    rng = np.random.default_rng(0x5EED)
    a = rng.integers(1, 1 << 61, size=64, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 61, size=64, dtype=np.uint64)
    return ",\n".join(f"  ({j}, {int(a[j])}, {int(b[j])})" for j in range(64))


# Shared shingle chain over the mutant-union corpus: tokens -> word
# hashes (splitmix64 of a polynomial) -> 3-word shingle Horner combine
# -> per-doc distinct shingle sets + set sizes. All mod-2^64 arithmetic
# uses the HUGEINT split-multiply pattern (see media_frame_samples);
# xor/shift run in UBIGINT. Used by the MinHash-LSH and n-gram-Jaccard
# pair oracles.
_SHINGLE_CHAIN = """
toks0 AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
torig AS (SELECT doc_id, unnest(ws) AS w, unnest(range(1, len(ws)+1)) AS i FROM toks0),
tmut0 AS (SELECT doc_id + 1000000 AS doc_id, w, i FROM torig WHERE i % 10 <> 0),
tmut AS (SELECT doc_id, w, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS i FROM tmut0),
tok AS (SELECT * FROM torig UNION ALL SELECT * FROM tmut),
dt AS (SELECT DISTINCT w FROM tok),
mx AS (SELECT greatest(max(length(w)), 1) AS m FROM dt),
pw AS (
  WITH RECURSIVE pwr(k, p) AS (
    SELECT 0, CAST(1 AS HUGEINT)
    UNION ALL
    SELECT k+1,
      ((p % 4294967296) * 1000003 +
       ((p // 4294967296) * 1000003 % 4294967296) * 4294967296
      ) % '18446744073709551616'::HUGEINT
    FROM pwr, mx WHERE k < mx.m - 1
  ) SELECT * FROM pwr
),
chars AS (
  SELECT w, gs.i, unicode(substr(w, CAST(gs.i + 1 AS INT), 1)) AS c
  FROM dt, LATERAL (SELECT unnest(range(0, CAST(length(w) AS BIGINT))) AS i) gs
),
terms AS (
  SELECT w,
    CAST(CAST(c AS HUGEINT) * pw.p % 4294967296 AS BIGINT) AS lo,
    CAST(CAST(c AS HUGEINT) * pw.p % '18446744073709551616'::HUGEINT // 4294967296 AS BIGINT) AS hi
  FROM chars JOIN pw ON pw.k = chars.i
),
ph AS (
  SELECT d.w,
    CAST(('11400714819323198485'::HUGEINT
      + COALESCE(CAST(SUM(t.lo) AS HUGEINT) + CAST(SUM(t.hi) AS HUGEINT) * 4294967296, 0))
      % '18446744073709551616'::HUGEINT AS UBIGINT) AS h0
  FROM dt d LEFT JOIN terms t ON d.w = t.w GROUP BY d.w
),
s1 AS (SELECT w, xor(h0, h0 >> 30) AS x FROM ph),
s2 AS (SELECT w, CAST((
    CAST(x % 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM s1),
s3 AS (SELECT w, xor(x, x >> 27) AS x FROM s2),
s4 AS (SELECT w, CAST((
    CAST(x % 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM s3),
mh AS (SELECT w, xor(x, x >> 31) AS h FROM s4),
seq AS (SELECT t.doc_id, t.i, m.h FROM tok t JOIN mh m USING (w)),
sh3 AS (
  SELECT doc_id, i, h AS h1,
    lead(h, 1) OVER (PARTITION BY doc_id ORDER BY i) AS h2,
    lead(h, 2) OVER (PARTITION BY doc_id ORDER BY i) AS h3
  FROM seq
),
shmul1 AS (
  SELECT doc_id,
    CAST((CAST(h1 % 4294967296 AS HUGEINT) * '11400714819323198485'::HUGEINT
      + (CAST(h1 // 4294967296 AS HUGEINT) * '11400714819323198485'::HUGEINT % 4294967296) * 4294967296
      + CAST(h2 AS HUGEINT)) % '18446744073709551616'::HUGEINT AS UBIGINT) AS acc, h3
  FROM sh3 WHERE h3 IS NOT NULL
),
shingle AS (
  SELECT doc_id,
    CAST((CAST(acc % 4294967296 AS HUGEINT) * '11400714819323198485'::HUGEINT
      + (CAST(acc // 4294967296 AS HUGEINT) * '11400714819323198485'::HUGEINT % 4294967296) * 4294967296
      + CAST(h3 AS HUGEINT)) % '18446744073709551616'::HUGEINT AS UBIGINT) AS sh
  FROM shmul1
),
dsh AS (SELECT DISTINCT doc_id, sh FROM shingle),
scount AS (SELECT doc_id, count(*) AS ns FROM dsh GROUP BY doc_id)
"""

# Shared exact set-Jaccard verification over `cand(doc_a, doc_b)` +
# `dsh`/`scount` from the shingle chain; ends in a `verified` CTE so
# callers can either select it or chain connected components onto it.
_JACCARD_VERIFY = """
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS ni
  FROM cand c
  JOIN dsh a ON a.doc_id = c.doc_a
  JOIN dsh b ON b.doc_id = c.doc_b AND b.sh = a.sh
  GROUP BY c.doc_a, c.doc_b
),
verified AS (
  SELECT c.doc_a, c.doc_b
  FROM cand c
  JOIN scount sa ON sa.doc_id = c.doc_a
  JOIN scount sb ON sb.doc_id = c.doc_b
  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
  WHERE CAST(COALESCE(i.ni, 0) AS DOUBLE) / (sa.ns + sb.ns - COALESCE(i.ni, 0)) >= 0.5
)
"""

# MinHash-LSH: 64 a*x+b (mod 2^64) permutation minima over the shingle
# sets, 32-band signatures, band-collision candidate pairs, exact
# set-Jaccard verify at tau=0.5 — reproduced EXACTLY in SQL.
_MINHASH_SQL_TEMPLATE = """
WITH
perms(j, pa, pb) AS (VALUES
{perms}
),
""" + _SHINGLE_CHAIN + """,
sigs AS (
  SELECT d.doc_id, p.j,
    min(CAST((CAST(d.sh % 4294967296 AS HUGEINT) * p.pa
      + (CAST(d.sh // 4294967296 AS HUGEINT) * p.pa % 4294967296) * 4294967296
      + p.pb) % '18446744073709551616'::HUGEINT AS UBIGINT)) AS s
  FROM dsh d CROSS JOIN perms p GROUP BY d.doc_id, p.j
),
bpair AS (
  SELECT doc_id, j // 2 AS band_id,
    max(CASE WHEN j % 2 = 0 THEN s END) AS s0,
    max(CASE WHEN j % 2 = 1 THEN s END) AS s1
  FROM sigs GROUP BY doc_id, j // 2
),
bh AS (
  SELECT doc_id, band_id,
    CAST((CAST(s0 % 4294967296 AS HUGEINT) * '14029467366897019727'::HUGEINT
      + (CAST(s0 // 4294967296 AS HUGEINT) * '14029467366897019727'::HUGEINT % 4294967296) * 4294967296
      + CAST(s1 AS HUGEINT)) % '18446744073709551616'::HUGEINT AS UBIGINT) AS bhash
  FROM bpair
),
pkey AS (
  SELECT doc_id,
    xor(bhash, CAST(CAST(band_id AS HUGEINT) * '11400714819323198485'::HUGEINT
        % '18446744073709551616'::HUGEINT AS UBIGINT)) AS pair_key
  FROM bh
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM pkey x JOIN pkey y ON x.pair_key = y.pair_key AND x.doc_id < y.doc_id
),
""" + _JACCARD_VERIFY

_MINHASH_SQL = (
    _MINHASH_SQL_TEMPLATE + "SELECT doc_a, doc_b FROM verified"
).format(perms=_minhash_perm_values())

# Connected components (transitive closure to the smallest doc_id) over
# the verified MinHash pair set — the dedup-clustering oracle.
_MINHASH_CLUSTERS_SQL = (
    _MINHASH_SQL_TEMPLATE
    + """,
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM verified
  UNION
  SELECT doc_b AS u, doc_a AS v FROM verified
),
reach(n, r) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.n
)
SELECT n AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id FROM reach GROUP BY n
"""
).replace("WITH\nperms", "WITH RECURSIVE\nperms").format(perms=_minhash_perm_values())

# n-gram Jaccard via the bottom-sketch inverted index: keep shingles
# whose splitmix64 falls below the per-doc length-adaptive threshold
# min(1, 32/n_shingles) * 2^64 (float compare, mirrored exactly),
# candidates = pairs sharing >= 2 sampled shingles, same exact verify.
_NGRAM_SQL = """
WITH
""" + _SHINGLE_CHAIN + """,
nsh AS (SELECT doc_id, count(*) AS n FROM shingle GROUP BY doc_id),
msrc AS (SELECT DISTINCT sh FROM shingle),
m1 AS (SELECT sh, xor(sh, sh >> 30) AS x FROM msrc),
m2 AS (SELECT sh, CAST((
    CAST(x % 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM m1),
m3 AS (SELECT sh, xor(x, x >> 27) AS x FROM m2),
m4 AS (SELECT sh, CAST((
    CAST(x % 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM m3),
mixed AS (SELECT sh, xor(x, x >> 31) AS mx FROM m4),
kept AS (
  SELECT DISTINCT s.doc_id, s.sh
  FROM shingle s JOIN nsh USING (doc_id) JOIN mixed USING (sh)
  WHERE CAST(mixed.mx AS DOUBLE)
        < least(1.0, 32.0 / CAST(nsh.n AS DOUBLE)) * 18446744073709551616.0
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 2
),
""" + _JACCARD_VERIFY + "SELECT doc_a, doc_b FROM verified"


@query("minhash_dedup_pairs", sql=_MINHASH_SQL)
def minhash_dedup_pairs(sf_dir: str) -> ray.data.Dataset:
    """MinHash-LSH near-dup detection: shingle -> 64-perm minhash -> 32
    bands -> coarse-bucket run-pair candidates -> exact-Jaccard verify
    (tau=0.5) over a corpus seeded with mutated copies.

    Oracle-checked BIT-EXACT end to end: every stage is deterministic
    mod-2^64 arithmetic (word hash = splitmix64(seed + polynomial),
    shingle = 3-step Horner, permutations = a*x+b with seeded odd a,
    band hash = 2-step Horner, pair_key = xor with band_id * phi64),
    so the SQL oracle reproduces candidate generation AND the exact
    set-Jaccard tau-filter — not just the verified end state. The
    implementation's 256-per-key hot-group cap is unreachable at test
    scale (mutant families are pairs), so candidate sets coincide."""
    from ocr_ray.functions.dedup import (
        bucketed_pairs,
        minhash_bands,
        run_index_pairs,
        with_mutants,
    )

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        with_mutants, batch_format="pyarrow"
    )
    bands = docs.map_batches(minhash_bands, batch_format="pyarrow").map_batches(
        lambda t: t.select(["pair_key", "doc_id"]), batch_format="pyarrow"
    )

    def pair_body(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["pair_key", "doc_id"], kind="mergesort")
        keys = g["pair_key"].to_numpy(dtype=np.uint64)
        ids = g["doc_id"].to_numpy(dtype=np.int64)
        ia, ib = run_index_pairs(keys, max_group=256, presorted=True)
        return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]}).drop_duplicates()

    cands = bucketed_pairs(bands, key_col="pair_key", id_col="doc_id", pair_body=pair_body)
    return _verified_pairs(docs, cands, tau=0.5)


@query("ngram_jaccard_pairs", sql=_NGRAM_SQL)
def ngram_jaccard_pairs(sf_dir: str) -> ray.data.Dataset:
    """n-gram Jaccard near-dup via a bottom-sketch shingle inverted
    index: each doc indexes only shingles whose hash falls below
    ``min(1, 32/n_shingles) * 2^64`` — a consistent (hash-threshold)
    bottom-k-style sketch, so two similar docs co-keep the same sampled
    shingles regardless of length and short docs keep everything; explode
    (shingle_hash, doc_id), coarse-bucket run pairs (hot shingles
    capped), require >= 2 shared sampled shingles per candidate
    (PPJoin-style overlap bound: a tau=0.5 pair shares >= 1/3 of its
    union, so >= ~10 sketched shingles in expectation), exact-verify
    tau=0.5. Sketching bounds index emission at O(docs x 32) rows — not
    O(total shingles) — which is what keeps this from emitting O(docs^2)
    candidates on boilerplate-heavy corpora where every shingle is hot."""
    from ocr_ray.functions.dedup import (
        attach_verify_pairs,
        bucketed_pairs,
        doc_shingle_lists,
        run_index_pairs,
        shingle_hashes,
        with_mutants,
    )
    from ocr_ray.functions.hashing import mix64

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        with_mutants, batch_format="pyarrow"
    )

    def explode_shingles(t: pa.Table) -> pa.Table:
        sh, n_sh = shingle_hashes(t["text"])
        ids = np.repeat(np.asarray(t["doc_id"].to_pylist(), dtype=np.int64), n_sh)
        rate = np.minimum(1.0, 32.0 / np.maximum(np.repeat(n_sh, n_sh), 1))
        keep = mix64(sh).astype(np.float64) < rate * float(2**64)
        return pa.table({"shingle": pa.array(sh[keep]), "doc_id": pa.array(ids[keep])})

    def pair_body(g: pd.DataFrame) -> pd.DataFrame:
        # one emission per (shingle, doc) occurrence-pair; multiplicity is
        # the shared-shingle count consumed by min_count downstream.
        g = g.drop_duplicates(["shingle", "doc_id"]).sort_values(
            ["shingle", "doc_id"], kind="mergesort"
        )
        sh = g["shingle"].to_numpy(dtype=np.uint64)
        ids = g["doc_id"].to_numpy(dtype=np.int64)
        ia, ib = run_index_pairs(sh, max_group=32, presorted=True)
        return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})

    cands = bucketed_pairs(
        docs.map_batches(explode_shingles, batch_format="pyarrow"),
        key_col="shingle",
        id_col="doc_id",
        pair_body=pair_body,
    )
    sigs = docs.map_batches(doc_shingle_lists, batch_format="pyarrow")
    return attach_verify_pairs(cands, sigs, tau=0.5, min_count=2)


# SimHash chain from a `tok(doc_id, w)` CTE to a `sig(doc_id, simhash)`
# CTE — shared by the per-doc signature oracle and the near-dup-pairs
# oracle (which runs it over the mutant-union corpus).
_SIMHASH_CHAIN = """
dt AS (SELECT DISTINCT w FROM tok),
mx AS (SELECT greatest(max(length(w)), 1) AS m FROM dt),
pw(k, p) AS (
  SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL
  SELECT k+1,
    ((p % 4294967296) * 1000003 +
     ((p // 4294967296) * 1000003 % 4294967296) * 4294967296
    ) % '18446744073709551616'::HUGEINT
  FROM pw, mx WHERE k < mx.m - 1
),
chars AS (
  SELECT w, gs.i, unicode(substr(w, CAST(gs.i + 1 AS INT), 1)) AS b
  FROM dt, LATERAL (SELECT unnest(range(0, CAST(length(w) AS BIGINT))) AS i) gs
),
terms AS (
  SELECT w,
    CAST(CAST(b AS HUGEINT) * pw.p % 4294967296 AS BIGINT) AS lo,
    CAST(CAST(b AS HUGEINT) * pw.p % '18446744073709551616'::HUGEINT // 4294967296 AS BIGINT) AS hi
  FROM chars JOIN pw ON pw.k = chars.i
),
ph AS (
  SELECT d.w,
    CAST(('11400714819323198485'::HUGEINT
      + COALESCE(CAST(SUM(t.lo) AS HUGEINT) + CAST(SUM(t.hi) AS HUGEINT) * 4294967296, 0))
      % '18446744073709551616'::HUGEINT AS UBIGINT) AS h0
  FROM dt d LEFT JOIN terms t ON d.w = t.w GROUP BY d.w
),
s1 AS (SELECT w, xor(h0, h0 >> 30) AS x FROM ph),
s2 AS (SELECT w, CAST((
    CAST(x % 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM s1),
s3 AS (SELECT w, xor(x, x >> 27) AS x FROM s2),
s4 AS (SELECT w, CAST((
    CAST(x % 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM s3),
mh AS (SELECT w, xor(x, x >> 31) AS h FROM s4),
v AS (SELECT t.doc_id, m.h FROM tok t JOIN mh m USING (w)),
cnt AS (SELECT doc_id, count(*) AS nw FROM v GROUP BY doc_id),
jbits AS (SELECT unnest(generate_series(0, 63)) AS j),
p2(j, p) AS (SELECT 0, CAST(1 AS HUGEINT) UNION ALL SELECT j+1, p*2 FROM p2 WHERE j < 63),
votes AS (
  SELECT v.doc_id, jb.j,
    SUM(CASE WHEN (v.h >> jb.j) & 1 = 1 THEN 1 ELSE 0 END) AS ones
  FROM v CROSS JOIN jbits jb GROUP BY v.doc_id, jb.j
),
bits AS (
  SELECT vo.doc_id, vo.j, CASE WHEN 2*vo.ones > c.nw THEN 1 ELSE 0 END AS bit
  FROM votes vo JOIN cnt c USING (doc_id)
),
sig_terms AS (
  SELECT b.doc_id,
    CAST(CAST(b.bit AS HUGEINT) * p2.p % 4294967296 AS BIGINT) AS lo,
    CAST(CAST(b.bit AS HUGEINT) * p2.p // 4294967296 AS BIGINT) AS hi
  FROM bits b JOIN p2 ON p2.j = b.j
),
sig AS (
  SELECT doc_id,
    CAST((CAST(SUM(lo) AS HUGEINT) + CAST(SUM(hi) AS HUGEINT) * 4294967296)
      % '18446744073709551616'::HUGEINT AS UBIGINT) AS simhash
  FROM sig_terms GROUP BY doc_id
)
"""

_SIMHASH_SQL = (
    """
WITH RECURSIVE
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
"""
    + _SIMHASH_CHAIN
    + "SELECT doc_id, simhash FROM sig"
)

_SIMHASH_PAIRS_SQL = (
    """
WITH RECURSIVE
toks0 AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
torig AS (SELECT doc_id, unnest(ws) AS w, unnest(range(1, len(ws)+1)) AS i FROM toks0),
tok AS (
  SELECT doc_id, w FROM torig
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, w FROM torig WHERE i % 10 <> 0
),
"""
    + _SIMHASH_CHAIN
    + """,
bands AS (
  SELECT s.doc_id, s.simhash,
    xor((s.simhash >> (16 * gb.b)) & 65535,
        CAST(CAST(gb.b AS HUGEINT) * '11400714819323198485'::HUGEINT
             % '18446744073709551616'::HUGEINT AS UBIGINT)) AS pair_key
  FROM sig s CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b) gb
)
SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
  CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
FROM bands x JOIN bands y ON x.pair_key = y.pair_key AND x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= 8
"""
)


@query("simhash_docs", sql=_SIMHASH_SQL)
def simhash_docs(sf_dir: str) -> ray.data.Dataset:
    """64-bit SimHash per document. Fully deterministic — per-token
    hash is ``splitmix64(SEED + sum(byte_i * 1000003^i) mod 2^64)`` and
    the signature is majority bit voting over the doc's tokens — so the
    SQL oracle reproduces it bit for bit: HUGEINT split-multiply for
    the polynomial powers and both splitmix64 multiplications, UBIGINT
    xor/shift for the finalizer steps, per-bit vote counts, and a
    powers-of-two reassembly summed as BIGINT halves."""
    from ocr_ray.functions.dedup import simhash

    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        simhash, batch_format="pyarrow"
    )


@query("simhash_neardup_pairs", sql=_SIMHASH_PAIRS_SQL)
def simhash_neardup_pairs(sf_dir: str) -> ray.data.Dataset:
    """SimHash near-dup: 64-bit signatures, 4x16-bit band blocking keyed
    through coarse buckets, vectorized Hamming<=8 verification over the
    mutated-copy corpus; cross-band pair dedup is a distributed bucketed
    shuffle (no driver-side step).

    Oracle-checked bit-exact: the signature chain is the shared SimHash
    SQL over the mutant-union corpus, band keys are
    ``xor(16-bit chunk, band * phi64)`` in UBIGINT, and the Hamming
    verify is ``bit_count(xor(sig_a, sig_b)) <= 8``. The 64-per-key
    hot-group cap is unreachable at test scale (random 16-bit chunks
    over ~1k docs)."""
    from ocr_ray.functions.dedup import (
        bucketed_pairs,
        hamming_u64,
        run_index_pairs,
        simhash,
        with_mutants,
    )

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        with_mutants, batch_format="pyarrow"
    )
    sigs = docs.map_batches(simhash, batch_format="pyarrow")

    def band_rows(t: pa.Table) -> pa.Table:
        sh = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
        bands = []
        for b in range(4):
            chunk = (sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            with np.errstate(over="ignore"):
                pair_key = chunk ^ (np.uint64(b) * np.uint64(0x9E3779B97F4A7C15))
            bands.append(
                pa.table(
                    {
                        "pair_key": pa.array(pair_key, type=pa.uint64()),
                        "doc_id": pa.array(ids),
                        "simhash": pa.array(sh, type=pa.uint64()),
                    }
                )
            )
        return pa.concat_tables(bands)

    def pair_body(g: pd.DataFrame, max_group: int = 64) -> pd.DataFrame:
        g = g.sort_values(["pair_key", "doc_id"], kind="mergesort")
        keys = g["pair_key"].to_numpy(dtype=np.uint64)
        ids = g["doc_id"].to_numpy(dtype=np.int64)
        sh = g["simhash"].to_numpy(dtype=np.uint64)
        ia, ib = run_index_pairs(keys, max_group=max_group, presorted=True)
        hd = hamming_u64(sh[ia], sh[ib])
        keep = hd <= 8
        return pd.DataFrame(
            {"doc_a": ids[ia[keep]], "doc_b": ids[ib[keep]], "hamming": hd[keep]}
        ).drop_duplicates(["doc_a", "doc_b"])

    from ocr_ray.functions.dedup import dedup_pairs

    cands = bucketed_pairs(
        sigs.map_batches(band_rows, batch_format="pyarrow"),
        key_col="pair_key",
        id_col="doc_id",
        pair_body=pair_body,
    )
    # cross-band duplicates of a pair land in one coarse bucket -> exact
    # distributed dedup; Hamming distance is identical for every copy.
    return dedup_pairs(cands, cols=("doc_a", "doc_b"))


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------


def _query_vectors(sf_dir: str, n: int = 8):
    from ocr_ray.functions.ann import _as_matrix

    t = load_small_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    tbl = t.filter(pc.less(t["vec_id"], pa.scalar(n, type=pa.int64()))).to_pandas()
    tbl = tbl.sort_values("vec_id")
    qmat = np.stack(tbl["embedding"].to_numpy()).astype(np.float64)
    return tbl["vec_id"].to_numpy(dtype=np.int64), qmat


@query(
    "embedding_topk",
    sql="""
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 8),
s AS (
  SELECT qid, vec_id, list_cosine_similarity(qe, embedding) AS sc
  FROM q, embeddings WHERE vec_id <> qid
)
SELECT qid AS query_id, vec_id,
  CAST(row_number() OVER (PARTITION BY qid ORDER BY sc DESC, vec_id) AS BIGINT) AS rank
FROM s QUALIFY rank <= 5
""",
)
def embedding_topk(sf_dir: str) -> ray.data.Dataset:
    """Brute-force cosine top-5 for 8 broadcast query vectors: per-batch
    numpy matmul partial top-k, tiny final merge. Scores are not emitted
    (float-kernel differences); ranks have a deterministic tiebreak."""
    from ocr_ray.functions.ann import brute_topk

    qids, qmat = _query_vectors(sf_dir)
    queries_ref = ray.put((qids, qmat))
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = brute_topk(ds, queries_ref, k=5)
    return out.map_batches(
        lambda t: t.select(["query_id", "vec_id", "rank"]), batch_format="pyarrow"
    )


@query("ann_ivf_topk", sql=None)
def ann_ivf_topk(sf_dir: str) -> ray.data.Dataset:
    """IVF approximate top-5 (nprobe=4 of 16 centroids) — the 100TB-scale
    path; recall vs brute force asserted in tests."""
    from ocr_ray.functions.ann import _as_matrix, ivf_topk, make_centroids

    from ocr_ray.sources.readers import sample_parquet_rows

    qids, qmat = _query_vectors(sf_dir)
    queries_ref = ray.put((qids, qmat))
    # centroid training sample: systematic sample via ROW-GROUP PRUNING —
    # evenly spaced row groups, stride inside; representative of the whole
    # table at any scale (unlike the round-1 first-256-rows driver slice)
    # with I/O proportional to the 256-row sample, not the table (the
    # round-2a version paid a full distributed scan to keep 256 rows).
    sample = sample_parquet_rows(
        f"{sf_dir}/embeddings.parquet", 256, columns=["vec_id", "embedding"]
    ).to_pandas()
    cent = make_centroids(np.stack(sample["embedding"].to_numpy()).astype(np.float64), n_centroids=16)
    centroids_ref = ray.put(cent)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = ivf_topk(ds, queries_ref, centroids_ref, k=5, nprobe=4)
    return out.map_batches(
        lambda t: t.select(["query_id", "vec_id", "rank"]), batch_format="pyarrow"
    )


@query("embedding_neardup_pairs", sql=None)
def embedding_neardup_pairs(sf_dir: str) -> ray.data.Dataset:
    """Embedding-cosine near-dup over a corpus seeded with perturbed
    copies: sign-LSH keys through coarse buckets, vectorized exact cosine
    verify (tau=0.8), distributed cross-table pair dedup."""
    from ocr_ray.functions.ann import _as_matrix, _normalize, hyperplanes, lsh_buckets, with_perturbed
    from ocr_ray.functions.dedup import bucketed_pairs, run_index_pairs

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]).map_batches(
        with_perturbed, batch_format="pyarrow"
    )
    planes = hyperplanes(64, n_bits=8, n_tables=4)
    bucketed = ds.map_batches(
        lsh_buckets, batch_format="pyarrow", fn_kwargs={"planes": planes}
    )

    def pair_body(g: pd.DataFrame, max_group: int = 512, tau: float = 0.8) -> pd.DataFrame:
        g = g.sort_values(["pair_key", "vec_id"], kind="mergesort")
        keys = g["pair_key"].to_numpy(dtype=np.uint64)
        ids = g["vec_id"].to_numpy(dtype=np.int64)
        ia, ib = run_index_pairs(keys, max_group=max_group, presorted=True)
        if len(ia) == 0:
            return pd.DataFrame(
                {
                    "vec_a": pd.Series([], dtype=np.int64),
                    "vec_b": pd.Series([], dtype=np.int64),
                }
            )
        m = _normalize(np.stack(g["embedding"].to_numpy()).astype(np.float64))
        cos = np.einsum("ij,ij->i", m[ia], m[ib])
        keep = cos >= tau
        return pd.DataFrame({"vec_a": ids[ia[keep]], "vec_b": ids[ib[keep]]}).drop_duplicates()

    from ocr_ray.functions.dedup import dedup_pairs

    cands = bucketed_pairs(
        bucketed, key_col="pair_key", id_col="vec_id", pair_body=pair_body
    )
    # cross-table duplicates of a pair land in one coarse bucket -> exact
    # distributed dedup (cosine was already verified inside pair_body).
    return dedup_pairs(cands, cols=("vec_a", "vec_b"))


# ---------------------------------------------------------------------------
# Multimodal plumbing (decode stubbed; schema/actor/batch layout real)
# ---------------------------------------------------------------------------


_MEDIA_SQL = """
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
  FROM media CROSS JOIN b
),
feat AS (
  SELECT d, si, m, lane, CAST(SUM(val) AS DOUBLE) / (32 * 255.0) AS f
  FROM bytes GROUP BY d, si, m, lane
),
piv AS (
  SELECT d, si, m,
    MAX(CASE WHEN lane = 0 THEN f END) AS f0,
    MAX(CASE WHEN lane = 1 THEN f END) AS f1,
    MAX(CASE WHEN lane = 2 THEN f END) AS f2,
    MAX(CASE WHEN lane = 3 THEN f END) AS f3,
    MAX(CASE WHEN lane = 4 THEN f END) AS f4,
    MAX(CASE WHEN lane = 5 THEN f END) AS f5,
    MAX(CASE WHEN lane = 6 THEN f END) AS f6,
    MAX(CASE WHEN lane = 7 THEN f END) AS f7
  FROM feat GROUP BY d, si, m
)
SELECT printf('doc-%08d', d) AS doc_id, printf('m-%d', m) AS media_ref,
  'image' AS media_kind, CAST(256 AS BIGINT) AS n_bytes,
  f0, f1, f2, f3, f4, f5, f6, f7,
  sqrt(f0*f0 + f1*f1 + f2*f2 + f3*f3 + f4*f4 + f5*f5 + f6*f6 + f7*f7) AS feature_norm
FROM piv
"""


@query("media_features", sql=_MEDIA_SQL)
def media_features(sf_dir: str) -> ray.data.Dataset:
    """Media spans -> synthetic binary payloads -> MediaDecoder actor pool
    (small batches for wide binary rows) -> per-item feature rows.

    The payload rule is integer arithmetic on the media_ref suffix, so the
    whole binary path (payload synthesis -> buffer-level vectorized decode
    -> per-lane byte moments) is reproduced by the SQL oracle bit for bit;
    the list-typed ``feature`` column is dropped here in favor of the f0..f7
    scalars (same values) because list columns don't hash stably across
    engines."""
    from ocr_ray.stages.explode import explode_documents
    from ocr_ray.stages.media import MEDIA_FEATURE_DIM, MediaDecoder, attach_payloads

    corpus = ensure_corpus(sf_dir, glyphs=False)
    ds = read_documents(corpus)
    flat = ds.map_batches(
        explode_documents, batch_format="pyarrow", fn_kwargs={"sentinels": False}
    ).map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "media")), batch_format="pyarrow"
    )
    with_payloads = flat.map_batches(attach_payloads, batch_format="pyarrow", batch_size=512)
    decoded = with_payloads.map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        batch_size=512,
        concurrency=pool_size(),
        fn_constructor_kwargs={"fake_decode": True},
    )
    cols = ["doc_id", "media_ref", "media_kind", "n_bytes"] + [
        f"f{j}" for j in range(MEDIA_FEATURE_DIM)
    ] + ["feature_norm"]
    return decoded.map_batches(lambda t: t.select(cols), batch_format="pyarrow")

# ---------------------------------------------------------------------------
# dedup clustering: near-dup pairs -> connected components
# ---------------------------------------------------------------------------


@query(
    "dedup_clusters",
    sql="""
WITH RECURSIVE k AS (
  SELECT doc_id,
         substr(text, 1, 16) AS pre,
         substr(text, greatest(1, length(text) - 15)) AS suf
  FROM documents
), stars AS (
  SELECT min(doc_id) OVER (PARTITION BY pre) AS u, doc_id AS v FROM k
  UNION ALL
  SELECT min(doc_id) OVER (PARTITION BY suf) AS u, doc_id AS v FROM k
), edges AS (
  SELECT u, v FROM stars WHERE u <> v
  UNION
  SELECT v AS u, u AS v FROM stars WHERE u <> v
), reach(n, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.n
)
SELECT n AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id FROM reach GROUP BY n
""",
)
def dedup_clusters(sf_dir: str) -> ray.data.Dataset:
    """Key-equality dedup CLUSTERS: documents sharing a 16-char text
    prefix OR a 16-char suffix are duplicates; transitive closure labels
    each doc with its component's smallest doc_id.

    Distributed shape: shared-key cliques reduced to star edges (one
    coarse-bucket groupby per key family, O(group) not O(group^2) edges —
    the boilerplate hot-key guard), alternating large-star/small-star
    connected components (O(log^2 n) bucketed-shuffle rounds,
    ``functions/graph.py``), then ONE left-outer ``hash_join`` back to the
    doc universe so singletons label themselves. The oracle computes the
    same closure with a recursive CTE."""
    from ocr_ray.functions.graph import connected_components, star_edges_from_key

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def keys(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "pre": pc.utf8_slice_codeunits(t["text"], 0, 16),
                "suf": pc.utf8_slice_codeunits(t["text"], -16),
            }
        )

    keyed = docs.map_batches(keys, batch_format="pyarrow")
    edges = star_edges_from_key(keyed, key_col="pre", node_col="doc_id").union(
        star_edges_from_key(keyed, key_col="suf", node_col="doc_id")
    )
    labels = connected_components(edges)

    ids = docs.map_batches(lambda t: t.select(["doc_id"]), batch_format="pyarrow")
    joined = hash_join(
        ids,
        labels,
        on="doc_id",
        right_on="node",
        how="left",
        num_buckets=16,
        left_schema=pa.schema({"doc_id": pa.int64()}),
        right_schema=pa.schema({"node": pa.int64(), "component": pa.int64()}),
    )

    def finalize(t: pa.Table) -> pa.Table:
        comp = pc.coalesce(t["component"], t["doc_id"])
        return pa.table(
            {"doc_id": t["doc_id"], "cluster_id": pc.cast(comp, pa.int64())}
        )

    return joined.map_batches(finalize, batch_format="pyarrow")


def _pagerank_sql(iterations: int = 3) -> str:
    """Unrolled integer-PageRank oracle: every iteration is exact int64
    arithmetic (floor division on non-negative values, SUM(BIGINT) →
    HUGEINT in DuckDB), so K chained CTEs reproduce the distributed
    iteration bit-for-bit — the impl and the oracle share the recurrence
    ``r' = 15%*scale + 85% * sum(r//deg)`` at scale = 1e9."""
    iters = []
    for k in range(1, iterations + 1):
        iters.append(
            f"""s{k} AS (
  SELECT e.dst AS node, SUM(r.pr // g.d) AS s
  FROM edges e JOIN r{k-1} r ON r.node = e.src JOIN deg g ON g.src = e.src
  GROUP BY e.dst
),
r{k} AS (
  SELECT n.node, CAST(150000000 + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS pr
  FROM nodes n LEFT JOIN s{k} s ON s.node = n.node
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
deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM edges),
r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS pr FROM nodes),
"""
        + ",\n".join(iters)
        + f"\nSELECT node, pr AS pr_rank FROM r{iterations}"
    )


@query("purchase_graph_pagerank", sql=_pagerank_sql(3))
def purchase_graph_pagerank(sf_dir: str) -> ray.data.Dataset:
    """PageRank over the customer↔supplier purchase graph — the engine's
    iterative-algorithm showcase, oracle-checked bit-exact.

    Graph: one undirected edge per distinct (customer, supplier) pair that
    appears on an order's lineitems (node ids disambiguated as 2*custkey /
    2*suppkey+1), symmetrized into directed edges both ways. Ranks are
    FIXED-POINT int64 (scale 1e9, damping 85/100 with floor division), so
    three distributed iterations and three unrolled SQL CTEs produce
    identical integers — the trick that makes an iterative algorithm pass
    the bit-exact gate (float PageRank can't: reduction order drifts ulps).

    Distributed shape: orders⋈lineitem bucketed join with per-bucket pair
    dedup, one global edge-distinct pass, then ``functions/graph.pagerank``
    — per iteration ONE edges⋈ranks join (per-dst partial sums combined
    inside the join bucket) + one small groupby over partials, with the
    O(nodes) rank state materialized between rounds."""
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
        num_buckets=16,
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
    ranks = graphfn.pagerank(edges, iterations=3)
    return ranks.map_batches(
        lambda t: pa.table({"node": t["node"], "pr_rank": t["rank"]}),
        batch_format="pyarrow",
    )


@query("minhash_dedup_clusters", sql=_MINHASH_CLUSTERS_SQL)
def minhash_dedup_clusters(sf_dir: str) -> ray.data.Dataset:
    """MinHash near-dup pairs promoted to dedup clusters: the verified
    pair set (``minhash_dedup_pairs``) is the edge list; alternating
    large-star/small-star connected components label every involved doc
    with its cluster's smallest doc_id. Seeded mutated copies must land in
    their original's cluster (asserted in tests/test_graph.py).
    Oracle-checked: the bit-exact MinHash pair SQL extended with a
    recursive-CTE transitive closure to the component minimum."""
    from ocr_ray.functions.graph import connected_components

    pairs = minhash_dedup_pairs(sf_dir)
    labels = connected_components(pairs, left_col="doc_a", right_col="doc_b")
    return labels.map_batches(
        lambda t: pa.table(
            {"doc_id": t["node"], "cluster_id": pc.cast(t["component"], pa.int64())}
        ),
        batch_format="pyarrow",
    )


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

    def bucketize(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t["o_custkey"].to_numpy(zero_copy_only=False))
        return t.append_column("_bucket", pa.array((h % np.uint64(32)).astype(np.int32)))

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

    def bucketize(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t["o_custkey"].to_numpy(zero_copy_only=False))
        return t.append_column("_bucket", pa.array((h % np.uint64(32)).astype(np.int32)))

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

    def bucketize(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t["o_custkey"].to_numpy(zero_copy_only=False))
        return t.append_column("_bucket", pa.array((h % np.uint64(32)).astype(np.int32)))

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

    ds = read_table(sf_dir, "documents", columns=["text"])

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
        df = (
            t.to_pandas()
            .sort_values(["n", "token"], ascending=[False, True], kind="mergesort")
            .head(50)
        )
        return (
            pa.Table.from_pandas(df, preserve_index=False)
            .set_column(1, "n", pc.cast(pa.array(df["n"]), pa.int64()))
            .replace_schema_metadata(None)
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
                        "_bucket": pa.array((h % np.uint64(32)).astype(np.int32)),
                    }
                )
            )
        return pa.concat_tables(parts)

    def ndv_count(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["col_name", "val_num", "val_str"])
        out = d.groupby("col_name", sort=True).size().reset_index(name="nd")
        out["nd"] = out["nd"].astype(np.int64)
        return out[["col_name", "nd"]]

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

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

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
        df = (
            t.to_pandas()
            .sort_values(["n", "token"], ascending=[False, True], kind="mergesort")
            .head(64)
        )
        return pa.table(
            {
                "token": pa.array(df["token"], type=pa.string()),
                "n": pa.array(df["n"].to_numpy(dtype=np.int64)),
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

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "o_orderpriority"], ascending=[False, True], kind="mergesort")
        top = g.iloc[:1]
        return pd.DataFrame(
            {
                "o_orderstatus": top["o_orderstatus"].to_numpy(),
                "mode_priority": top["o_orderpriority"].to_numpy(),
                "n": top["n"].to_numpy().astype(np.int64),
            }
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

    def prep(t: pa.Table) -> pa.Table:
        pairs = (
            t.group_by(["o_orderpriority", "o_custkey"])
            .aggregate([([], "count_all")])
            .select(["o_orderpriority", "o_custkey"])
        )
        h = pd.util.hash_array(pairs["o_custkey"].to_numpy(zero_copy_only=False))
        return pairs.append_column("_bucket", pa.array((h % np.uint64(32)).astype(np.int32)))

    def dedup_count(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["o_orderpriority", "o_custkey"])
        out = d.groupby("o_orderpriority", sort=True).size().reset_index(name="n")
        out["n"] = out["n"].astype(np.int64)
        return out[["o_orderpriority", "n"]]

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
        num_buckets=16,
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
        df = (
            out.to_pandas()
            .sort_values(["priority", "o_orderkey"], kind="mergesort")
            .head(64)
        )
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

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
    from ray.data.aggregate import Count, Sum

    ds = read_table(sf_dir, "orders", columns=["o_orderdate", "o_orderstatus", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "yr": pc.cast(pc.year(t["o_orderdate"]), pa.string()),
                "status": t["o_orderstatus"],
                "price_c": to_units(t["o_totalprice"]),
            }
        )

    fine = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["yr", "status"])
        .aggregate(Count(alias_name="n_orders"), Sum("price_c", alias_name="price_c"))
        .to_pandas()
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

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
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
    nb = 32

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
    from ray.data.aggregate import Count

    ds = read_table(sf_dir, "orders", columns=["o_orderdate"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"day": pc.cast(t["o_orderdate"], pa.date32())})

    daily = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Count(alias_name="n_orders"))
        .to_pandas()
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
        num_buckets=16,
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

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
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

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

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


# ---------------------------------------------------------------------------
# Training-data curation: PII scrub, repetition filters, splits, domain caps
# ---------------------------------------------------------------------------


_PII_AUG_SQL = """
  text
  || CASE WHEN doc_id % 3 = 0
       THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
       ELSE '' END
  || CASE WHEN doc_id % 5 = 0
       THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       ELSE '' END
  || CASE WHEN doc_id % 7 = 0
       THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
            || '.' || CAST(doc_id * 7 % 256 AS VARCHAR)
            || '.' || CAST(doc_id * 13 % 256 AS VARCHAR)
       ELSE '' END
"""


@query(
    "pii_redact_docs",
    sql=f"""
WITH aug AS (SELECT doc_id, {_PII_AUG_SQL} AS text FROM documents)
SELECT doc_id,
  regexp_replace(
    regexp_replace(
      regexp_replace(text, '[A-Za-z0-9_.]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
      '555-[0-9]{{4}}', '<PHONE>', 'g'),
    '[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+', '<IP>', 'g') AS redacted,
  CAST(len(regexp_extract_all(text, '[A-Za-z0-9_.]+@[A-Za-z0-9.]+')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(text, '555-[0-9]{{4}}')) AS BIGINT) AS n_phones,
  CAST(len(regexp_extract_all(text, '[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+')) AS BIGINT) AS n_ips
FROM aug
""",
)
def pii_redact_docs(sf_dir: str) -> ray.data.Dataset:
    """PII redaction (emails / phone numbers / IPv4) over a corpus
    deterministically seeded with PII — both engines run the same RE2
    patterns, replace all occurrences, and count removals. The seeding
    is arithmetic on doc_id so the oracle reproduces synthesis + scrub
    end-to-end."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(textfn.pii_augment, batch_format="pyarrow").map_batches(
        textfn.pii_redact, batch_format="pyarrow"
    )


@query(
    "repetition_quality_docs",
    sql="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
s AS (SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS i FROM t),
a AS (SELECT doc_id, count(*) AS n_tokens, count(DISTINCT tok) AS n_distinct
      FROM s GROUP BY doc_id),
b AS (SELECT doc_id, tok, lead(tok) OVER (PARTITION BY doc_id ORDER BY i) AS nxt FROM s),
g AS (SELECT doc_id, count(*) AS c FROM b WHERE nxt IS NOT NULL GROUP BY doc_id, tok, nxt),
m AS (SELECT doc_id, max(c) AS max_bi FROM g GROUP BY doc_id)
SELECT a.doc_id, a.n_tokens, a.n_distinct,
  1.0 - CAST(a.n_distinct AS DOUBLE) / a.n_tokens AS dup_word_frac,
  CASE WHEN a.n_tokens > 1 THEN CAST(coalesce(m.max_bi, 0) AS DOUBLE) / (a.n_tokens - 1)
       ELSE 0.0 END AS top_bigram_frac
FROM a LEFT JOIN m USING (doc_id)
""",
)
def repetition_quality_docs(sf_dir: str) -> ray.data.Dataset:
    """Gopher-style repetition filters (duplicate-word fraction, most-
    frequent-bigram fraction) — the standard web-crawl quality gate for
    boilerplate / keyword-stuffed / templated pages. One embarrassingly
    parallel Arrow pass; identical IEEE op order to the SQL oracle."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(textfn.repetition_stats, batch_format="pyarrow")


@query(
    "train_val_test_split",
    sql="""
SELECT doc_id,
  (doc_id * 2654435761) % 4294967296 % 100 AS bucket,
  CASE WHEN (doc_id * 2654435761) % 4294967296 % 100 < 90 THEN 'train'
       WHEN (doc_id * 2654435761) % 4294967296 % 100 < 95 THEN 'val'
       ELSE 'test' END AS split
FROM documents
""",
)
def train_val_test_split(sf_dir: str) -> ray.data.Dataset:
    """Deterministic 90/5/5 train/val/test assignment by Knuth
    multiplicative hash of doc_id — stable across runs, machines and
    repartitions (never sample-based), the property a training pipeline
    needs so that re-runs and late-arriving shards land in the same
    split. Embarrassingly parallel; no shuffle."""
    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def assign(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = (ids * 2654435761) % 4294967296 % 100
        split = np.where(bucket < 90, "train", np.where(bucket < 95, "val", "test"))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "bucket": pa.array(bucket),
                "split": pa.array(split, type=pa.string()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


@query(
    "source_cap_docs",
    sql="""
SELECT doc_id, source, CAST(rn AS BIGINT) AS rn FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents)
WHERE rn <= 50
""",
)
def source_cap_docs(sf_dir: str) -> ray.data.Dataset:
    """Per-source document cap (keep the first 50 docs per source by
    doc_id) — the C4-style per-domain cap that stops a single crawler
    host from dominating the corpus. Uses the distributed histogram
    ranking primitive, so no task ever holds a whole source's rows
    (sources are few and huge — the canonical skew shape)."""
    from ocr_ray.functions.ranking import partitioned_rank

    ds = read_table(sf_dir, "documents", columns=["doc_id", "source"])
    out = partitioned_rank(
        ds,
        part_col="source",
        value_col="doc_id",
        tiebreak_col="doc_id",
        out_cols=["doc_id", "source"],
    )
    return out.map_batches(
        lambda t: t.filter(pc.less_equal(t["rn"], pa.scalar(50))).select(
            ["doc_id", "source", "rn"]
        ),
        batch_format="pyarrow",
    ).map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "source": t["source"],
                "rn": pc.cast(t["rn"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


@query(
    "mixture_sample_docs",
    sql="""
WITH r AS (
  SELECT doc_id, source,
    1.0 / (1 + CAST(substr(source, 4) AS INT) % 4) AS rate
  FROM documents
),
h0 AS (SELECT doc_id, source, rate, CAST(doc_id AS UBIGINT) AS x FROM r),
h1 AS (SELECT doc_id, source, rate, xor(x, x >> 30) AS x FROM h0),
h2 AS (SELECT doc_id, source, rate, CAST((
    CAST(x % 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM h1),
h3 AS (SELECT doc_id, source, rate, xor(x, x >> 27) AS x FROM h2),
h4 AS (SELECT doc_id, source, rate, CAST((
    CAST(x % 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM h3),
h5 AS (SELECT doc_id, source, rate, xor(x, x >> 31) AS mx FROM h4)
SELECT doc_id, source
FROM h5 WHERE CAST(mx AS DOUBLE) < rate * 18446744073709551616.0
""",
)
def mixture_sample_docs(sf_dir: str) -> ray.data.Dataset:
    """Deterministic source-mixture sampling (the DoReMi-style static
    data-mixing stage): each source s is kept at rate
    ``1 / (1 + src_num % 4)`` by thresholding ``splitmix64(doc_id)``
    against ``rate * 2^64`` — reproducible across reruns and resumable
    shards (membership depends only on doc_id), no shuffle, one
    streaming filter pass. Oracle-checked bit-exact (the splitmix64
    chain in HUGEINT SQL; the float threshold compare is mirrored
    op-for-op)."""
    from ocr_ray.functions.hashing import mix64

    ds = read_table(sf_dir, "documents", columns=["doc_id", "source"])

    def body(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src_num = pc.cast(
            pc.utf8_slice_codeunits(
                t["source"].combine_chunks()
                if isinstance(t["source"], pa.ChunkedArray)
                else t["source"],
                3,
                1 << 30,
            ),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        rate = 1.0 / (1 + (src_num % 4))
        keep = mix64(ids.astype(np.uint64)).astype(np.float64) < rate * float(2**64)
        return t.select(["doc_id", "source"]).filter(pa.array(keep))

    return ds.map_batches(body, batch_format="pyarrow")


@query(
    "curate_corpus",
    sql=f"""
WITH u AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000, text FROM documents),
s AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM u),
v AS (SELECT doc_id, count(*) AS n_tokens,
        count(*) FILTER (WHERE tok IN ('the','and','of','a','to','in')) AS n_stop,
        SUM(length(tok)) AS sum_len,
        count(DISTINCT tok) AS n_distinct
      FROM s GROUP BY doc_id),
m AS (SELECT doc_id, n_tokens,
        CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio_en,
        CAST(sum_len AS DOUBLE) / n_tokens AS mean_token_len,
        1.0 - CAST(n_distinct AS DOUBLE) / n_tokens AS dup_word_frac
      FROM v),
q AS (SELECT doc_id,
        0.4 * LEAST(GREATEST(n_tokens / 64.0, 0.0), 1.0)
        + 0.3 * LEAST(GREATEST(stop_ratio_en * 5, 0.0), 1.0)
        + 0.3 * LEAST(GREATEST(1.0 - abs(mean_token_len - 5.0) / 5.0, 0.0), 1.0) AS quality,
        dup_word_frac
      FROM m),
f AS (SELECT u.doc_id, u.text, q.quality FROM u JOIN q USING (doc_id)
      WHERE q.quality >= 0.55 AND q.dup_word_frac <= 0.55),
d AS (SELECT doc_id, text, quality FROM f
      QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1),
r AS (SELECT doc_id, quality, {_PII_AUG_SQL} AS atext FROM d),
x AS (SELECT doc_id, quality,
  regexp_replace(
    regexp_replace(
      regexp_replace(atext, '[A-Za-z0-9_.]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
      '555-[0-9]{{4}}', '<PHONE>', 'g'),
    '[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+', '<IP>', 'g') AS redacted
  FROM r)
SELECT doc_id, redacted, quality, 'train' AS split FROM x
WHERE (doc_id * 2654435761) % 4294967296 % 100 < 90
""",
)
def curate_corpus(sf_dir: str) -> ray.data.Dataset:
    """Flagship composite curation pipeline — what a training-data user
    actually runs, as ONE streaming Dataset: seed exact duplicates
    (doc_id + 2e6 copies), score quality + repetition, gate
    (quality >= 0.55, dup_word_frac <= 0.55), exact-dedup on content md5
    (ONE bucketed shuffle keeps min doc_id; per-batch pre-dedup shrinks
    what the shuffle carries), scrub PII, assign the deterministic hash
    split, and keep the train partition. Every stage is embarrassingly
    parallel except the single dedup shuffle; the DuckDB oracle replays
    the whole chain end-to-end, bit-exact including the float gates."""
    from ocr_ray.functions.dedup import add_md5, dedup_by_key

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def dup_union(t: pa.Table) -> pa.Table:
        shifted = pc.add(t["doc_id"], pa.scalar(2_000_000, type=pa.int64()))
        return pa.concat_tables(
            [t, t.set_column(t.column_names.index("doc_id"), "doc_id", shifted)]
        )

    def quality_gate(t: pa.Table) -> pa.Table:
        q = textfn.quality_score(t)["quality"]
        dup = textfn.repetition_stats(t)["dup_word_frac"]
        keep = pc.and_(
            pc.greater_equal(q, pa.scalar(0.55)), pc.less_equal(dup, pa.scalar(0.55))
        )
        return t.append_column("quality", q).filter(keep)

    def pre_dedup(t: pa.Table) -> pa.Table:
        # batch-local first-per-md5 (text/quality are constant per md5, and
        # global first == min of batch minima), so the shuffle moves one
        # row per distinct hash per batch.
        part = t.group_by(["content_md5"]).aggregate(
            [("doc_id", "min"), ("text", "min"), ("quality", "min")]
        )
        return pa.table(
            {
                "doc_id": part["doc_id_min"],
                "text": part["text_min"],
                "quality": part["quality_min"],
                "content_md5": part["content_md5"],
            }
        )

    deduped = dedup_by_key(
        ds.map_batches(dup_union, batch_format="pyarrow")
        .map_batches(quality_gate, batch_format="pyarrow")
        .map_batches(add_md5, batch_format="pyarrow")
        .map_batches(pre_dedup, batch_format="pyarrow"),
        key="content_md5",
        order="doc_id",
        num_buckets=8,
    )

    def redact_split(t: pa.Table) -> pa.Table:
        t = pa.table(
            {"doc_id": t["doc_id"], "text": t["text"], "quality": t["quality"]}
        )
        red = textfn.pii_redact(textfn.pii_augment(t.select(["doc_id", "text"])))
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = (ids * 2654435761) % 4294967296 % 100
        out = pa.table(
            {
                "doc_id": t["doc_id"],
                "redacted": red["redacted"],
                "quality": t["quality"],
                "split": pa.array(np.full(len(ids), "train", dtype=object), type=pa.string()),
            }
        )
        return out.filter(pa.array(bucket < 90))

    return deduped.map_batches(redact_split, batch_format="pyarrow")


@query(
    "global_shuffle_docs",
    sql="""
SELECT doc_id,
  CAST(row_number() OVER (
    ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS BIGINT) AS shuffle_rank
FROM documents
""",
)
def global_shuffle_docs(sf_dir: str) -> ray.data.Dataset:
    """Deterministic global training shuffle: order docs by a Knuth
    multiplicative hash of doc_id and emit each doc's global shuffle
    position. Unlike ``random_shuffle`` this is reproducible across
    runs, block layouts and cluster sizes (the property a resumable
    training job needs), and the ORDER itself is oracle-checked because
    the rank is a column. Runs on the distributed histogram-ranking
    primitive — a range-bucket pass + broadcast prefix offsets, so no
    task ever holds the whole corpus (a naive global sort-and-enumerate
    would)."""
    from ocr_ray.functions.ranking import partitioned_rank

    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def keyed(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "_p": pa.array(np.full(len(ids), "all", dtype=object), type=pa.string()),
                "shuffle_key": pa.array((ids * 2654435761) % 4294967296),
            }
        )

    out = partitioned_rank(
        ds.map_batches(keyed, batch_format="pyarrow"),
        part_col="_p",
        value_col="shuffle_key",
        tiebreak_col="doc_id",
        out_cols=["doc_id"],
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "shuffle_rank": pc.cast(t["rn"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


@query(
    "extract_doc_quality",
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
         ELSE 'text' END AS kind, s
  FROM spans
), doc AS (
  SELECT d, string_agg(s, ' ' ORDER BY si) AS dtext
  FROM tagged WHERE kind = 'text' GROUP BY d
), s2 AS (
  SELECT d, unnest(string_split(dtext, ' ')) AS tok FROM doc
), v AS (
  SELECT d, count(*) AS n_tokens,
    count(*) FILTER (WHERE tok IN ('the','and','of','a','to','in')) AS n_stop,
    SUM(length(tok)) AS sum_len
  FROM s2 GROUP BY d
), m AS (
  SELECT d, n_tokens,
    CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio_en,
    CAST(sum_len AS DOUBLE) / n_tokens AS mean_token_len
  FROM v)
SELECT printf('doc-%08d', d) AS doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
  0.4 * LEAST(GREATEST(n_tokens / 64.0, 0.0), 1.0)
  + 0.3 * LEAST(GREATEST(stop_ratio_en * 5, 0.0), 1.0)
  + 0.3 * LEAST(GREATEST(1.0 - abs(mean_token_len - 5.0) / 5.0, 0.0), 1.0) AS quality
FROM m
""",
)
def extract_doc_quality(sf_dir: str) -> ray.data.Dataset:
    """Extraction x curation composite over the INTERLEAVED corpus: run
    the full glyph-decode extraction engine (segment + nearest-template
    recognize + boilerplate strip + reading-order reassembly), join each
    document's recognized text spans back into its main-content text,
    and score quality on the EXTRACTED text — the recognizer output must
    be byte-identical to the withheld source for the float quality terms
    to match the oracle, which replays corpus synthesis + extraction +
    scoring end-to-end in SQL."""
    from ocr_ray.pipelines.extract import extract_documents

    corpus = ensure_corpus(sf_dir, glyphs=True)
    nested = extract_documents(read_documents(corpus), num_buckets=16)

    scored = nested.map_batches(_extracted_doc_text, batch_format="pyarrow").map_batches(
        textfn.quality_score, batch_format="pyarrow"
    )
    return scored.map_batches(
        lambda t: t.select(["doc_id", "n_tokens", "quality"]), batch_format="pyarrow"
    )


def _extracted_doc_text(t: pa.Table) -> pa.Table:
    """Join each extracted document's ``kind=='text'`` spans (already in
    reading order inside the nested ``spans`` list) into one main-content
    string per doc — vectorized list-flatten + binary_join, no Python per
    row. Docs whose extraction kept no text span are dropped (matching
    the SQL GROUP BY over ``WHERE kind='text'``)."""
    spans = t["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    parents = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False).astype(np.int64)
    keep = pc.equal(pc.struct_field(flat, "kind"), "text").to_numpy(zero_copy_only=False)
    idx = np.flatnonzero(keep)
    n = t.num_rows
    counts = np.bincount(parents[idx], minlength=n)
    off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=off[1:])
    vals = pc.take(pc.struct_field(flat, "text"), pa.array(idx, type=pa.int64()))
    la = pa.LargeListArray.from_arrays(pa.array(off, type=pa.int64()), vals)
    joined = pc.binary_join(la, " ")
    return pa.table({"doc_id": t["doc_id"], "text": joined}).filter(pa.array(counts > 0))


@query(
    "extract_training_set",
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
         ELSE 'text' END AS kind, s
  FROM spans
), doc AS (
  SELECT d, string_agg(s, ' ' ORDER BY si) AS dtext
  FROM tagged WHERE kind = 'text' GROUP BY d
), u AS (
  SELECT d, dtext FROM doc
  UNION ALL
  SELECT d + 2000000, dtext FROM doc
), s2 AS (
  SELECT d, unnest(string_split(dtext, ' ')) AS tok FROM u
), v AS (
  SELECT d, count(*) AS n_tokens,
    count(*) FILTER (WHERE tok IN ('the','and','of','a','to','in')) AS n_stop,
    SUM(length(tok)) AS sum_len
  FROM s2 GROUP BY d
), q AS (
  SELECT d,
    0.4 * LEAST(GREATEST(n_tokens / 64.0, 0.0), 1.0)
    + 0.3 * LEAST(GREATEST(CAST(n_stop AS DOUBLE) / n_tokens * 5, 0.0), 1.0)
    + 0.3 * LEAST(GREATEST(
        1.0 - abs(CAST(sum_len AS DOUBLE) / n_tokens - 5.0) / 5.0, 0.0), 1.0)
      AS quality
  FROM v
), f AS (
  SELECT u.d, u.dtext FROM u JOIN q USING (d) WHERE q.quality >= 0.55
), dd AS (
  SELECT d, dtext FROM f
  QUALIFY row_number() OVER (PARTITION BY md5(dtext) ORDER BY d) = 1
), toks AS (
  SELECT d, string_split(dtext, ' ') AS tw FROM dd
), wins AS (
  SELECT d, CAST(gs.n AS BIGINT) AS win_start,
    CAST(least(32, len(tw) - gs.n) AS BIGINT) AS n_tokens
  FROM toks, LATERAL (SELECT unnest(range(0, greatest(len(tw)-16, 1), 16)) AS n) gs
)
SELECT printf('doc-%08d', d) AS doc_id, win_start, n_tokens,
  CASE WHEN (d * 2654435761) % 4294967296 % 100 < 90 THEN 'train'
       WHEN (d * 2654435761) % 4294967296 % 100 < 95 THEN 'val'
       ELSE 'test' END AS split
FROM wins
""",
)
def extract_training_set(sf_dir: str) -> ray.data.Dataset:
    """FLAGSHIP end-to-end training-data pipeline over the INTERLEAVED
    corpus, every stage the real distributed operator: glyph-decode
    extraction (segment + nearest-template recognize + boilerplate strip
    + reading-order reassembly) → per-doc quality gate on the EXTRACTED
    text → exact dedup (the corpus is seeded with byte-identical copies
    at doc_id+2e6; batch-local first-per-md5 pre-dedup, then ONE bucketed
    shuffle) → fixed-size token-window packing (32-token windows, stride
    16, byte-slice gather) → deterministic hash train/val/test split.
    One oracle covers the whole path: the SQL replays corpus synthesis,
    extraction, scoring, dedup, windowing and splitting, so a single
    recognition bit-flip or a dropped/duplicated window anywhere breaks
    the hash. This is the pipeline a user points at raw interleaved
    shards to get a training set out (``pipelines/training.py`` lands it
    as a resumable split-partitioned artifact); scale shape is one
    actor-pool map (extraction), one shuffle (dedup), and stateless maps
    elsewhere."""
    return training_windows(sf_dir)


def training_windows(sf_dir: str, *, keep_chunk: bool = False) -> ray.data.Dataset:
    """The ``extract_training_set`` pipeline body (see that docstring).
    ``keep_chunk=True`` also carries each window's token text — the
    payload the on-disk training artifact needs but the oracle row
    (value-hashed) does not."""
    from ocr_ray.functions.dedup import add_md5, dedup_by_key
    from ocr_ray.functions.text import token_windows
    from ocr_ray.pipelines.extract import extract_documents

    corpus = ensure_corpus(sf_dir, glyphs=True)
    nested = extract_documents(read_documents(corpus), num_buckets=16)
    texts = nested.map_batches(_extracted_doc_text, batch_format="pyarrow")

    def dup_union(t: pa.Table) -> pa.Table:
        # seed exact duplicates: same extracted text under doc_id + 2e6
        # (numeric order == zero-padded string order, so dedup's
        # first-per-key winner matches the SQL's ORDER BY d)
        ids = pc.cast(pc.utf8_slice_codeunits(t["doc_id"], 4, 12), pa.int64())
        shifted = pc.binary_join_element_wise(
            pa.array(np.full(t.num_rows, "doc", dtype=object), type=pa.string()),
            pc.utf8_lpad(
                pc.cast(pc.add(ids, pa.scalar(2_000_000, type=pa.int64())), pa.string()),
                8,
                "0",
            ),
            "-",
        )
        return pa.concat_tables(
            [t, t.set_column(t.column_names.index("doc_id"), "doc_id", shifted)]
        )

    def quality_gate(t: pa.Table) -> pa.Table:
        q = textfn.quality_score(t)["quality"]
        return t.filter(pc.greater_equal(q, pa.scalar(0.55)))

    def pre_dedup(t: pa.Table) -> pa.Table:
        # batch-local first-per-md5 (text constant per md5; global first
        # == min of batch minima) so the shuffle moves one row per
        # distinct hash per batch
        part = t.group_by(["content_md5"]).aggregate(
            [("doc_id", "min"), ("text", "min")]
        )
        return pa.table(
            {
                "doc_id": part["doc_id_min"],
                "text": part["text_min"],
                "content_md5": part["content_md5"],
            }
        )

    deduped = dedup_by_key(
        texts.map_batches(dup_union, batch_format="pyarrow")
        .map_batches(quality_gate, batch_format="pyarrow")
        .map_batches(add_md5, batch_format="pyarrow")
        .map_batches(pre_dedup, batch_format="pyarrow"),
        key="content_md5",
        order="doc_id",
        num_buckets=8,
    )

    def windows_split(t: pa.Table) -> pa.Table:
        w = token_windows(
            pa.table({"doc_id": t["doc_id"], "text": t["text"]}),
            window=32,
            stride=16,
        )
        ids = (
            pc.cast(pc.utf8_slice_codeunits(w["doc_id"], 4, 12), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        bucket = (ids * 2654435761) % 4294967296 % 100
        split = np.where(
            bucket < 90, "train", np.where(bucket < 95, "val", "test")
        ).astype(object)
        cols = {
            "doc_id": w["doc_id"],
            "win_start": pc.cast(w["win_start"], pa.int64()),
            "n_tokens": pc.cast(w["n_tokens"], pa.int64()),
            "split": pa.array(split, type=pa.string()),
        }
        if keep_chunk:
            cols["chunk"] = w["chunk"]
        return pa.table(cols)

    return deduped.map_batches(windows_split, batch_format="pyarrow")


@query("kmeans_embeddings", sql=None)
def kmeans_embeddings(sf_dir: str) -> ray.data.Dataset:
    """Distributed spherical k-means over the embeddings table (k=10,
    3 Lloyd iterations, seeded from a row-group-pruned systematic
    sample) followed by a final assignment pass — the IVF centroid
    TRAINING step at scale: every iteration streams the table once,
    reduces k partial rows per batch through a distributed groupby-sum,
    and driver state stays k x d. Iterative, so no SQL oracle; Lloyd
    monotonicity + planted-cluster recovery are asserted in tests."""
    from ocr_ray.functions.ann import assign_clusters, farthest_point_init, kmeans_fit
    from ocr_ray.sources.readers import sample_parquet_rows

    sample = sample_parquet_rows(
        f"{sf_dir}/embeddings.parquet", 256, columns=["embedding"]
    ).to_pandas()
    init = farthest_point_init(
        np.stack(sample["embedding"].to_numpy()).astype(np.float64), k=10
    )
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cent, _hist = kmeans_fit(ds, init, iters=3)
    return assign_clusters(
        read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]), ray.put(cent)
    )


@query("embedding_dedup_clusters", sql=None)
def embedding_dedup_clusters(sf_dir: str) -> ray.data.Dataset:
    """Semantic (embedding-cosine) dedup clusters: the verified near-dup
    pair set (``embedding_neardup_pairs``) is the edge list; alternating
    large-star/small-star distributed connected components label every
    involved vector with its cluster's smallest vec_id — the semantic
    near-dedup a training corpus runs after MinHash-style lexical dedup.
    Perturbed seeded copies must land in their original's cluster
    (asserted in tests)."""
    from ocr_ray.functions.graph import connected_components

    pairs = embedding_neardup_pairs(sf_dir)
    labels = connected_components(pairs, left_col="vec_a", right_col="vec_b")
    return labels.map_batches(
        lambda t: pa.table(
            {"vec_id": t["node"], "cluster_id": pc.cast(t["component"], pa.int64())}
        ),
        batch_format="pyarrow",
    )


# ONE definition of the BM25 scoring CTEs (Lucene idf, k1=1.2, b=0.75,
# fixed query terms) shared by the bm25_search and hybrid_rrf_search
# oracles — a formula change edits exactly one string.
_BM25_SC_SQL = """WITH s AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
t AS (SELECT doc_id, count(*) AS dl,
        count(*) FILTER (WHERE tok = 'spark') AS tf0,
        count(*) FILTER (WHERE tok = 'join') AS tf1,
        count(*) FILTER (WHERE tok = 'window') AS tf2
      FROM s GROUP BY doc_id),
g AS (SELECT count(*) AS n, SUM(dl) AS sum_dl,
        count(*) FILTER (WHERE tf0 > 0) AS df0,
        count(*) FILTER (WHERE tf1 > 0) AS df1,
        count(*) FILTER (WHERE tf2 > 0) AS df2 FROM t),
sc AS (SELECT t.doc_id,
    ln((g.n - g.df0 + 0.5) / (g.df0 + 0.5) + 1.0)
      * ((CAST(t.tf0 AS DOUBLE) * 2.2) / (t.tf0 + 1.2 * (0.25 + 0.75 * (t.dl / (CAST(g.sum_dl AS DOUBLE) / g.n)))))
  + ln((g.n - g.df1 + 0.5) / (g.df1 + 0.5) + 1.0)
      * ((CAST(t.tf1 AS DOUBLE) * 2.2) / (t.tf1 + 1.2 * (0.25 + 0.75 * (t.dl / (CAST(g.sum_dl AS DOUBLE) / g.n)))))
  + ln((g.n - g.df2 + 0.5) / (g.df2 + 0.5) + 1.0)
      * ((CAST(t.tf2 AS DOUBLE) * 2.2) / (t.tf2 + 1.2 * (0.25 + 0.75 * (t.dl / (CAST(g.sum_dl AS DOUBLE) / g.n)))))
  AS score
  FROM t, g)"""


@query(
    "bm25_search",
    sql=_BM25_SC_SQL
    + """
SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 20
""",
)
def bm25_search(sf_dir: str) -> ray.data.Dataset:
    """BM25 keyword search (Lucene idf variant, k1=1.2, b=0.75) for the
    fixed query terms (spark, join, window) — the lexical retrieval leg
    of a training-data search stack. Two streaming passes: (1) per-doc
    term frequencies + doc length reduce to FOUR corpus scalars
    (N, sum_dl, df per term) via one aggregate; (2) scores computed per
    batch against the broadcast scalars with per-batch partial top-20,
    so the final sort moves ~20 rows per block. Float op order mirrors
    the SQL oracle exactly (bit-exact scores)."""
    import math

    from ray.data.aggregate import Count, Sum

    TERMS = ("spark", "join", "window")
    K1, B = 1.2, 0.75

    def tf_stats(t: pa.Table) -> pa.Table:
        parents, counts, flat = textfn.split_tokens(t["text"])
        cols: dict = {"doc_id": t["doc_id"], "dl": pa.array(counts)}
        for i, term in enumerate(TERMS):
            hit = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            cols[f"tf{i}"] = pa.array(
                np.bincount(parents, weights=hit, minlength=t.num_rows).astype(np.int64)
            )
        return pa.table(cols)

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    stats = ds.map_batches(tf_stats, batch_format="pyarrow")

    def hits(t: pa.Table) -> pa.Table:
        out = {"dl": t["dl"]}
        for i in range(len(TERMS)):
            out[f"hit{i}"] = pc.cast(pc.greater(t[f"tf{i}"], 0), pa.int64())
        return pa.table(out)

    g = stats.map_batches(hits, batch_format="pyarrow").aggregate(
        Count(), Sum("dl"), *[Sum(f"hit{i}") for i in range(len(TERMS))]
    )
    n = g["count()"]
    avgdl = float(g["sum(dl)"]) / n
    idf = [
        math.log((n - g[f"sum(hit{i})"] + 0.5) / (g[f"sum(hit{i})"] + 0.5) + 1.0)
        for i in range(len(TERMS))
    ]

    def score(t: pa.Table) -> pa.Table:
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        denom_norm = K1 * (0.25 + B * (dl / avgdl))
        s = np.zeros(t.num_rows, dtype=np.float64)
        for i in range(len(TERMS)):
            tf = t[f"tf{i}"].to_numpy(zero_copy_only=False).astype(np.float64)
            s = s + idf[i] * ((tf * 2.2) / (tf + denom_norm))
        top = np.argsort(-s, kind="stable")[:20]
        return pa.table(
            {"doc_id": pc.take(t["doc_id"], pa.array(top)), "score": pa.array(s[top])}
        )

    scored = stats.map_batches(score, batch_format="pyarrow")
    return scored.sort(["score", "doc_id"], descending=[True, False]).limit(20)


@query(
    "order_price_dense_rank",
    sql="""
SELECT o_orderkey, o_orderstatus,
  CAST(DENSE_RANK() OVER w AS BIGINT) AS dense_rank,
  CUME_DIST() OVER w AS cume_dist
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice)
""",
)
def order_price_dense_rank(sf_dir: str) -> ray.data.Dataset:
    """Tie-aware window functions — DENSE_RANK and CUME_DIST per status —
    without any task holding a partition: (1) map-side combine +
    groupby reduces rows to DISTINCT (status, price) pairs with counts;
    (2) the distinct table runs the histogram ranking primitive (rank of
    a distinct value == dense rank) and the distributed prefix-sum
    primitive (running count strictly below == CUME_DIST numerator minus
    peers); (3) one composite-key hash join attaches the two window
    values back to the rows. Low-cardinality PARTITION BY with millions
    of rows per partition is exactly the shape a naive map_groups window
    gets wrong at scale."""
    from ray.data.aggregate import Sum

    from ocr_ray.functions.ranking import partitioned_prefix_sum, partitioned_rank

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus", "o_totalprice"])

    def combine(t: pa.Table) -> pa.Table:
        part = (
            t.select(["o_orderstatus", "o_totalprice"])
            .group_by(["o_orderstatus", "o_totalprice"])
            .aggregate([("o_totalprice", "count")])
        )
        return pa.table(
            {
                "o_orderstatus": part["o_orderstatus"],
                "o_totalprice": part["o_totalprice"],
                "cnt": pc.cast(part["o_totalprice_count"], pa.int64()),
            }
        )

    # materialize the DISTINCT pair set once (object store, spillable —
    # not a driver materialization): downstream, the two primitives plus
    # the totals aggregate would otherwise re-execute the read + combine
    # + groupby chain ~6x (each primitive runs a min/max pass, a
    # histogram pass and a shuffle over its input). Size is bounded by
    # distinct (partition, value) pairs, not rows.
    pairs = (
        orders.map_batches(combine, batch_format="pyarrow")
        .groupby(["o_orderstatus", "o_totalprice"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    ).materialize()

    ranked = partitioned_rank(
        pairs,
        part_col="o_orderstatus",
        value_col="o_totalprice",
        tiebreak_col="o_totalprice",
        out_cols=["o_orderstatus", "o_totalprice", "cnt"],
    )
    ranked = ranked.materialize()  # same re-execution argument as pairs
    scanned = partitioned_prefix_sum(
        ranked,
        part_col="o_orderstatus",
        value_col="o_totalprice",
        tiebreak_col="o_totalprice",
        weight_col="cnt",
        out_cols=["o_orderstatus", "o_totalprice", "cnt", "rn"],
    )

    # per-status TOTAL row counts (3 statuses) — broadcast denominator
    totals = {
        r["o_orderstatus"]: r["cnt"]
        for r in pairs.groupby("o_orderstatus").aggregate(Sum("cnt", alias_name="cnt")).take_all()
    }
    totals_ref = ray.put(totals)

    def window_vals(t: pa.Table, *, tref) -> pa.Table:
        tot = ray.get(tref)
        n = np.array([tot[s] for s in t["o_orderstatus"].to_pylist()], dtype=np.int64)
        rb = t["running_before"].to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "o_orderstatus": t["o_orderstatus"],
                "o_totalprice": t["o_totalprice"],
                "dense_rank": pc.cast(t["rn"], pa.int64()),
                "cume_dist": pa.array((rb + cnt).astype(np.float64) / n.astype(np.float64)),
            }
        )

    winvals = scanned.map_batches(
        window_vals, batch_format="pyarrow", fn_kwargs={"tref": totals_ref}
    )

    joined = hash_join(
        orders,
        winvals,
        on=["o_orderstatus", "o_totalprice"],
        num_buckets=16,
        left_schema=pa.schema(
            {
                "o_orderkey": pa.int64(),
                "o_orderstatus": pa.string(),
                "o_totalprice": pa.float64(),
            }
        ),
        right_schema=pa.schema(
            {
                "o_orderstatus": pa.string(),
                "o_totalprice": pa.float64(),
                "dense_rank": pa.int64(),
                "cume_dist": pa.float64(),
            }
        ),
    )
    return joined.map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "o_orderstatus": t["o_orderstatus"],
                "dense_rank": pc.cast(t["dense_rank"], pa.int64()),
                "cume_dist": t["cume_dist"],
            }
        ),
        batch_format="pyarrow",
    )


@query(
    "validate_lineitem",
    sql="""
SELECT 'qty_out_of_range' AS rule,
  CAST(count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 45) AS BIGINT) AS n_violations,
  CAST(count(*) AS BIGINT) AS n_checked FROM lineitem
UNION ALL
SELECT 'disc_out_of_range',
  CAST(count(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.08) AS BIGINT),
  CAST(count(*) AS BIGINT) FROM lineitem
UNION ALL
SELECT 'nonpositive_price',
  CAST(count(*) FILTER (WHERE l_extendedprice <= 0) AS BIGINT),
  CAST(count(*) AS BIGINT) FROM lineitem
UNION ALL
SELECT 'null_returnflag',
  CAST(count(*) FILTER (WHERE l_returnflag IS NULL) AS BIGINT),
  CAST(count(*) AS BIGINT) FROM lineitem
UNION ALL
SELECT 'orphan_orderkey',
  CAST(count(*) FILTER (WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS BIGINT),
  CAST(count(*) AS BIGINT) FROM lineitem
""",
)
def validate_lineitem(sf_dir: str) -> pa.Table:
    """Data-quality gate (expectations-style): per-rule violation counts
    over lineitem — range rules, null rule, cross-table FK orphans — the
    validation stage a pipeline runs before accepting a new partition.

    Distributed shape: ONE streaming pass; each batch reduces to 5
    partial-count rows (rule, violations, checked), the FK rule probes a
    broadcast sorted key array (``ray.put`` once; swap in the bloom
    filter from ``functions/bloom.py`` when the key side outgrows
    broadcast), and a 5-group groupby-sum finishes. No shuffle of data
    rows, only of 5-row partials."""
    from ray.data.aggregate import Sum

    okeys = np.sort(
        load_small_table(sf_dir, "orders", ["o_orderkey"])["o_orderkey"]
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    okeys_ref = ray.put(okeys)

    class RuleCounts:
        def __init__(self, keys_ref):
            self.keys = ray.get(keys_ref) if not isinstance(keys_ref, np.ndarray) else keys_ref

        def __call__(self, t: pa.Table) -> pa.Table:
            qty = t["l_quantity"].to_numpy(zero_copy_only=False)
            disc = t["l_discount"].to_numpy(zero_copy_only=False)
            price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
            rflag = t["l_returnflag"]
            ok_idx = np.searchsorted(self.keys, t["l_orderkey"].to_numpy(zero_copy_only=False))
            ok_idx = np.minimum(ok_idx, len(self.keys) - 1)
            orphan = self.keys[ok_idx] != t["l_orderkey"].to_numpy(zero_copy_only=False)
            n = t.num_rows
            viol = [
                int(((qty < 1) | (qty > 45)).sum()),
                int(((disc < 0) | (disc > 0.08)).sum()),
                int((price <= 0).sum()),
                int(rflag.null_count),
                int(orphan.sum()),
            ]
            return pa.table(
                {
                    "rule": pa.array(
                        [
                            "qty_out_of_range",
                            "disc_out_of_range",
                            "nonpositive_price",
                            "null_returnflag",
                            "orphan_orderkey",
                        ]
                    ),
                    "viol": pa.array(viol, type=pa.int64()),
                    "checked": pa.array([n] * 5, type=pa.int64()),
                }
            )

    ds = read_table(
        sf_dir,
        "lineitem",
        columns=[
            "l_orderkey",
            "l_quantity",
            "l_discount",
            "l_extendedprice",
            "l_returnflag",
        ],
    )
    partials = ds.map_batches(RuleCounts, fn_constructor_args=(okeys_ref,),
                              batch_format="pyarrow", concurrency=pool_size())
    agg = partials.groupby("rule").aggregate(Sum("viol"), Sum("checked")).to_pandas()
    return pa.table(
        {
            "rule": pa.array(agg["rule"].tolist()),
            "n_violations": pa.array(agg["sum(viol)"].astype(np.int64)),
            "n_checked": pa.array(agg["sum(checked)"].astype(np.int64)),
        }
    )


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
        num_buckets=16,
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
        df = t.to_pandas().sort_values(["rev_u4", "o_custkey"], ascending=[False, True], kind="mergesort").head(20)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

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
    from ray.data.aggregate import Sum

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

    sums = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("qty", alias_name="sum_qty"))
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
        df = t.to_pandas().sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="mergesort"
        ).head(100)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

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
        num_buckets=16,
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
        num_buckets=16,
        left_schema=pa.schema({"o_orderkey": pa.int64(), "o_orderpriority": pa.string()}),
        right_schema=pa.schema({"l_orderkey": pa.int64()}),
    )

    def combine(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"o_orderpriority": t["o_orderpriority"].to_pylist()})
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
        num_buckets=16,
        left_schema=pa.schema({"o_orderkey": pa.int64(), "o_orderpriority": pa.string()}),
        right_schema=pa.schema({"l_orderkey": pa.int64()}),
    )

    def combine(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"o_orderpriority": t["o_orderpriority"].to_pylist()})
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
        num_buckets=16,
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
        num_buckets=16,
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
    (tests/test_dedup_ann.py) with a deterministic sign convention."""
    from ocr_ray.functions.ann import pca_fit, pca_transform

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    comps, ratio, mean = pca_fit(emb, k=2)
    out = pca_transform(
        read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]), comps, mean
    )
    return out.sort("vec_id")


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

    docs = read_table(sf_dir, "documents", columns=["text"])

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
        df = t.to_pandas().sort_values(
            ["n_pair", "tok_a", "tok_b"], ascending=[False, True, True], kind="mergesort"
        ).head(50)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

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
        num_buckets=16,
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

    counts = (
        orders.map_batches(per_batch, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("n", alias_name="c_count"))
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
        num_buckets=16,
        left_schema=pa.schema({"c_custkey": pa.int64()}),
        right_schema=pa.schema({"o_custkey": pa.int64(), "c_count": pa.int64()}),
        bucket_post=dist,
        post_schema=pa.schema({"c_count": pa.int64(), "n": pa.int64()}),
    )

    agg = partials.groupby("c_count").aggregate(Sum("n", alias_name="custdist"))

    def finalize(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["custdist", "c_count"], ascending=[False, False], kind="mergesort"
        )
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

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

    num_buckets = 16

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
        num_buckets=16,
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
        num_buckets=16,
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
        df = t.to_pandas().sort_values(
            ["supplier_cnt", "p_brand", "p_size"], ascending=[False, True, True], kind="mergesort"
        )
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

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
        num_buckets=16,
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
        num_buckets=16,
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
        num_buckets=16,
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
        num_buckets=16,
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
        df = t.to_pandas().sort_values(
            ["nation", "o_year"], ascending=[True, False], kind="mergesort"
        )
        return pa.table(
            {
                "nation": pa.array(df["nation"], type=pa.string()),
                "o_year": pa.array(df["o_year"].to_numpy(dtype=np.int64)),
                "sum_profit": pa.array(units_to_double(df["amount_u4"], 4)),
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
    from ray.data.aggregate import Sum

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

    pv = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("val_u2", alias_name="val_u2"))
        .materialize()  # one row per part: the aggregate is the output domain
    )

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


# ---------------------------------------------------------------------------
# round-2h: retrieval fusion + deterministic reservoir sampling
# ---------------------------------------------------------------------------

_SPLITMIX_CHAIN = """
h0 AS (SELECT *, CAST(event_id AS UBIGINT) AS x FROM base),
h1 AS (SELECT * EXCLUDE (x), xor(x, x >> 30) AS x FROM h0),
h2 AS (SELECT * EXCLUDE (x), CAST((
    CAST(x % 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM h1),
h3 AS (SELECT * EXCLUDE (x), xor(x, x >> 27) AS x FROM h2),
h4 AS (SELECT * EXCLUDE (x), CAST((
    CAST(x % 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM h3),
h5 AS (SELECT * EXCLUDE (x), xor(x, x >> 31) AS pri FROM h4)
"""


@query(
    "reservoir_sample_events",
    sql="WITH base AS (SELECT event_id, event_type FROM events),"
    + _SPLITMIX_CHAIN
    + """
SELECT event_type, event_id, CAST(rn AS BIGINT) AS rn FROM (
  SELECT event_type, event_id,
         row_number() OVER (PARTITION BY event_type ORDER BY pri, event_id) AS rn
  FROM h5)
WHERE rn <= 8 ORDER BY event_type, rn
""",
)
def reservoir_sample_events(sf_dir: str) -> ray.data.Dataset:
    """Deterministic per-group RESERVOIR sample: keep the 8 rows with the
    smallest ``splitmix64(event_id)`` per event_type — a uniform random
    sample under a hash-random priority that is reproducible across
    reruns, resumable shards, and insertions (a new row only displaces
    the current max priority, never reshuffles the sample). Distributed
    shape: per-batch LOCAL bottom-8 per group (map-side combine), then
    one tiny groupby over <= 8 x blocks x |groups| partial rows — no task
    ever holds a group's full row set. Oracle: the splitmix64 chain in
    HUGEINT SQL + ROW_NUMBER, bit-exact."""
    from ocr_ray.functions.hashing import mix64

    K = 8
    ds = read_table(sf_dir, "events", columns=["event_id", "event_type"])

    def local_bottom(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pri = mix64(ids.astype(np.uint64))
        df = pd.DataFrame(
            {"event_type": t["event_type"].to_pylist(), "event_id": ids, "pri": pri}
        )
        df = df.sort_values(["event_type", "pri", "event_id"], kind="mergesort")
        df = df.groupby("event_type", as_index=False, dropna=False).head(K)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["pri", "event_id"], kind="mergesort").head(K)
        return pd.DataFrame(
            {
                "event_type": df["event_type"].to_numpy(),
                "event_id": df["event_id"].to_numpy(dtype=np.int64),
                "rn": np.arange(1, len(df) + 1, dtype=np.int64),
            }
        )

    out = (
        ds.map_batches(local_bottom, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(merge, batch_format="pandas")
    )
    return out.sort(["event_type", "rn"])


@query(
    "hybrid_rrf_search",
    sql=_BM25_SC_SQL
    + """,
bm AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
       FROM sc QUALIFY r <= 20),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
kn AS (SELECT vec_id AS doc_id,
         row_number() OVER (ORDER BY list_cosine_similarity(qe, embedding) DESC, vec_id) AS r
       FROM q, embeddings WHERE vec_id <> 0 QUALIFY r <= 20)
SELECT COALESCE(bm.doc_id, kn.doc_id) AS doc_id,
  CAST(COALESCE(bm.r, 0) AS BIGINT) AS bm25_rank,
  CAST(COALESCE(kn.r, 0) AS BIGINT) AS knn_rank,
  (CASE WHEN bm.r IS NULL THEN 0.0 ELSE 1.0 / (60 + bm.r) END)
    + (CASE WHEN kn.r IS NULL THEN 0.0 ELSE 1.0 / (60 + kn.r) END) AS rrf_score
FROM bm FULL OUTER JOIN kn ON bm.doc_id = kn.doc_id
ORDER BY rrf_score DESC, doc_id
""",
)
def hybrid_rrf_search(sf_dir: str) -> pd.DataFrame:
    """Hybrid retrieval with Reciprocal Rank Fusion: the lexical leg is
    the distributed BM25 top-20 (``bm25_search``'s plan), the semantic
    leg is the distributed brute-cosine top-20 for query vector 0
    (``embedding_topk``'s plan), and the two CONSTANT-SIZE rank lists
    fuse on the driver with ``1/(60+r)`` — the k-bounded final step of a
    retrieval stack (both legs stream; only 2k rows ever leave them).
    RRF scores are bit-exact vs the oracle because BOTH sides perform
    the identical IEEE-754 op sequence (same 1/(60+r) divisions, same
    addition order) — NOT because the terms are dyadic (1/61 is not);
    reordering either side's additions would break the exact gate."""
    from ocr_ray.functions.ann import brute_topk

    K = 20
    bm = bm25_search(sf_dir).to_pandas().reset_index(drop=True)
    bm["bm25_rank"] = np.arange(1, len(bm) + 1, dtype=np.int64)

    qids, qmat = _query_vectors(sf_dir, n=1)  # query vector 0, same helper as embedding_topk
    queries_ref = ray.put((np.asarray(qids, dtype=np.int64), qmat))
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    kn = brute_topk(ds, queries_ref, k=K).to_pandas()
    kn = kn.rename(columns={"vec_id": "doc_id", "rank": "knn_rank"})[["doc_id", "knn_rank"]]

    fused = bm[["doc_id", "bm25_rank"]].merge(kn, on="doc_id", how="outer")
    br = fused["bm25_rank"].to_numpy(dtype=np.float64, na_value=np.nan)
    kr = fused["knn_rank"].to_numpy(dtype=np.float64, na_value=np.nan)
    rrf = np.where(np.isnan(br), 0.0, 1.0 / (60.0 + br)) + np.where(
        np.isnan(kr), 0.0, 1.0 / (60.0 + kr)
    )
    out = pd.DataFrame(
        {
            "doc_id": fused["doc_id"].to_numpy(dtype=np.int64),
            "bm25_rank": np.nan_to_num(br, nan=0.0).astype(np.int64),
            "knn_rank": np.nan_to_num(kr, nan=0.0).astype(np.int64),
            "rrf_score": rrf,
        }
    ).sort_values(["rrf_score", "doc_id"], ascending=[False, True], kind="mergesort")
    return out.reset_index(drop=True)


@query("ann_quantized_topk", sql=None)
def ann_quantized_topk(sf_dir: str) -> ray.data.Dataset:
    """int8-quantized cosine top-5 with exact rescoring — the memory-scale
    ANN path (4x smaller than float32 vectors; fixed 1/127 grid since
    inputs are unit-normalized, so no calibration pass). Candidate recall
    vs brute force asserted in tests (float-geometry family: no SQL
    oracle)."""
    from ocr_ray.functions.ann import quantized_topk

    qids, qmat = _query_vectors(sf_dir)
    queries_ref = ray.put((qids, qmat))
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = quantized_topk(ds, queries_ref, k=5, oversample=4)
    return out.map_batches(
        lambda t: t.select(["query_id", "vec_id", "rank"]), batch_format="pyarrow"
    )


@query("bpe_train_merges", sql=None)
def bpe_train_merges(sf_dir: str) -> pd.DataFrame:
    """Distributed BPE tokenizer training (12 merges) over the documents
    corpus: ONE corpus-scale word-count pass, then merge learning on the
    word-frequency table (bounded by vocabulary, not corpus — the HF-
    tokenizers trick), each iteration one distributed pair-count + driver
    argmax + broadcast rewrite. Iterative, so no SQL oracle; the learned
    merge list is asserted EQUAL to an independent pure-Python reference
    BPE on the same word counts (tests/test_dedup_ann.py)."""
    from ocr_ray.functions.bpe import bpe_train

    ds = read_table(sf_dir, "documents", columns=["text"])
    return bpe_train(ds, num_merges=12)


_PPM_SQL = """
WITH src AS (SELECT doc_id AS d, string_split(text, ' ') AS ws FROM documents),
w AS (SELECT d, generate_subscripts(ws, 1) AS i FROM src),
spans AS (SELECT d, (i - 1) // 8 AS si FROM w GROUP BY d, (i - 1) // 8),
media AS (
  SELECT d, si, (d * 1000 + si) % 9973 AS m FROM spans
  WHERE (d + si) % 7 <> 0 AND (d + si) % 5 = 3
),
px AS (SELECT unnest(generate_series(0, 15)) AS x),
py AS (SELECT unnest(generate_series(0, 7)) AS y),
bytes AS (
  SELECT d, m, c.ch AS ch, (m * 37 + 11 + 13 * py.y + 7 * px.x + 29 * c.ch) % 256 AS val
  FROM media CROSS JOIN px CROSS JOIN py
  CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS ch) c
),
feat AS (
  SELECT d, m, ch, CAST(SUM(val) AS DOUBLE) / 128.0 AS mu
  FROM bytes GROUP BY d, m, ch
)
SELECT printf('doc-%08d', d) AS doc_id, printf('m-%d', m) AS media_ref,
  CAST(16 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
  MAX(CASE WHEN ch = 0 THEN mu END) AS mean_r,
  MAX(CASE WHEN ch = 1 THEN mu END) AS mean_g,
  MAX(CASE WHEN ch = 2 THEN mu END) AS mean_b
FROM feat GROUP BY d, m
"""


@query("media_ppm_features", sql=_PPM_SQL)
def media_ppm_features(sf_dir: str) -> ray.data.Dataset:
    """REAL image decode path: media spans get genuine binary PPM (P6)
    payloads (netpbm-encoded from a closed-form test image), and the
    ``PpmDecoder`` actor stage PARSES the format — header tokenizer,
    magic/maxval validation, zero-copy raster view — then computes
    per-channel means. Because the test image is closed-form arithmetic,
    the decoded statistics are oracle-checked bit-exact end to end: a
    header-parsing bug, offset error, or channel swap fails the oracle.
    Non-PPM codecs remain stubbed (no PIL/ffmpeg here); this proves the
    decode plumbing on a real format with zero dependencies."""
    from ocr_ray.stages.explode import explode_documents
    from ocr_ray.stages.media import PpmDecoder, attach_ppm_payloads

    corpus = ensure_corpus(sf_dir, glyphs=False)
    ds = read_documents(corpus)
    flat = ds.map_batches(
        explode_documents, batch_format="pyarrow", fn_kwargs={"sentinels": False}
    ).map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "media")), batch_format="pyarrow"
    )
    with_payloads = flat.map_batches(attach_ppm_payloads, batch_format="pyarrow", batch_size=512)
    return with_payloads.map_batches(
        PpmDecoder,
        batch_format="pyarrow",
        batch_size=512,
        concurrency=pool_size(),
    )


@query(
    "dataset_diff_orders",
    sql="""
WITH b AS (SELECT o_orderkey AS k, o_orderstatus AS st, CAST(o_totalprice AS DECIMAL(18,2)) AS pr
           FROM orders),
n AS (
  SELECT k, st, pr FROM b WHERE k % 10 NOT IN (7, 3, 0)
  UNION ALL SELECT k, st, pr + 100 FROM b WHERE k % 10 = 3
  UNION ALL SELECT k, st, pr FROM b WHERE k % 10 = 0
  UNION ALL SELECT k + 10000000, st, pr FROM b WHERE k % 10 = 0
)
SELECT status, CAST(COUNT(*) AS BIGINT) AS n_keys FROM (
  SELECT CASE WHEN b.k IS NULL THEN 'added'
              WHEN n.k IS NULL THEN 'removed'
              WHEN b.st <> n.st OR b.pr <> n.pr THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM b FULL OUTER JOIN n ON b.k = n.k
) GROUP BY status ORDER BY status
""",
)
def dataset_diff_orders(sf_dir: str) -> ray.data.Dataset:
    """Snapshot DIFF (the data-ops audit between two dataset versions):
    classify every key as added / removed / changed / unchanged across
    two corpus-scale snapshots with ONE bucketed full-outer join — class
    counting happens inside the join bucket (a key's two versions are
    co-located there), so the shuffle emits 4 x num_buckets partial rows.
    Snapshot B is derived deterministically from A (delete keys %10==7,
    +100 price on %10==3, duplicate %10==0 under new keys) so the oracle
    rebuilds both sides in SQL. Payload equality compares integer cents —
    exact."""
    from ray.data.aggregate import Sum

    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    base = read_table(sf_dir, "orders", columns=cols)

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": t["o_orderkey"],
                "st": t["o_orderstatus"],
                "pr_u2": to_units(t["o_totalprice"]),
            }
        )

    def mk_new(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        st = t["o_orderstatus"].to_numpy(zero_copy_only=False)
        pr = to_units(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        keep = k % 10 != 7
        upd = k % 10 == 3
        dup = k % 10 == 0
        return pa.table(
            {
                "k": pa.array(np.concatenate([k[keep], k[dup] + 10_000_000])),
                "st": pa.array(np.concatenate([st[keep], st[dup]]), type=pa.string()),
                "pr_u2": pa.array(
                    np.concatenate([pr[keep] + np.where(upd[keep], 10_000, 0), pr[dup]])
                ),
            }
        )

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        # presence by payload validity (payloads are never null in either
        # snapshot; the shared key column `k` is non-null for both sides)
        old_p = df["pr_u2"].notna().to_numpy()
        new_p = df["pr_u2_new"].notna().to_numpy()
        status = np.where(
            ~old_p & new_p,
            "added",
            np.where(
                old_p & ~new_p,
                "removed",
                np.where(
                    (df["st"] != df["st_new"]) | (df["pr_u2"] != df["pr_u2_new"]),
                    "changed",
                    "unchanged",
                ),
            ),
        )
        red = pd.DataFrame({"status": status}).groupby("status", as_index=False).size()
        return pd.DataFrame(
            {"status": red["status"], "n": red["size"].astype(np.int64)}
        )

    partials = hash_join(
        base.map_batches(prep, batch_format="pyarrow"),
        base.map_batches(mk_new, batch_format="pyarrow"),
        on="k",
        how="full",
        num_buckets=16,
        suffix="_new",
        left_schema=pa.schema({"k": pa.int64(), "st": pa.string(), "pr_u2": pa.int64()}),
        right_schema=pa.schema({"k": pa.int64(), "st": pa.string(), "pr_u2": pa.int64()}),
        bucket_post=classify,
        post_schema=pa.schema({"status": pa.string(), "n": pa.int64()}),
    )
    agg = partials.groupby("status").aggregate(Sum("n", alias_name="n_keys"))
    return agg.sort("status")


@query(
    "incremental_dedup_new_docs",
    sql="""
WITH new_docs AS (
  SELECT doc_id + 2000000 AS doc_id, text FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, text || ' extra' AS text
  FROM documents WHERE doc_id % 3 = 1
)
SELECT n.doc_id FROM new_docs n
WHERE NOT EXISTS (SELECT 1 FROM documents d WHERE d.text = n.text)
ORDER BY n.doc_id
""",
)
def incremental_dedup_new_docs(sf_dir: str) -> ray.data.Dataset:
    """INCREMENTAL ingestion dedup: drop arriving documents whose text
    already exists in the standing corpus WITHOUT re-deduping the corpus —
    one bucketed ANTI join keyed on the text itself (exact semantics, no
    hash-collision caveat; the corpus side ships only its key column).
    The arriving batch is derived from the corpus (exact copies of
    %3==0 docs must drop; '+extra' variants of %3==1 docs must survive)
    so the oracle reproduces it."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def mk_new(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        dup_m = ids % 3 == 0
        new_m = ids % 3 == 1
        dup = t.filter(pa.array(dup_m))
        new = t.filter(pa.array(new_m))
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate(
                        [
                            dup["doc_id"].to_numpy(zero_copy_only=False) + 2_000_000,
                            new["doc_id"].to_numpy(zero_copy_only=False) + 2_000_000,
                        ]
                    )
                ),
                "text": pa.array(
                    dup["text"].to_pylist()
                    + [s + " extra" for s in new["text"].to_pylist()],
                    type=pa.string(),
                ),
            }
        )

    fresh = hash_join(
        docs.map_batches(mk_new, batch_format="pyarrow"),
        docs.map_batches(lambda t: t.select(["text"]), batch_format="pyarrow"),
        on="text",
        how="anti",
        num_buckets=16,
        left_schema=pa.schema({"doc_id": pa.int64(), "text": pa.string()}),
        right_schema=pa.schema({"text": pa.string()}),
    )
    return fresh.map_batches(
        lambda t: t.select(["doc_id"]), batch_format="pyarrow"
    ).sort("doc_id")


_WAV_SQL = """
WITH src AS (SELECT doc_id AS d, string_split(text, ' ') AS ws FROM documents),
w AS (SELECT d, generate_subscripts(ws, 1) AS i FROM src),
spans AS (SELECT d, (i - 1) // 8 AS si FROM w GROUP BY d, (i - 1) // 8),
media AS (
  SELECT d, si, (d * 1000 + si) % 9973 AS m FROM spans
  WHERE (d + si) % 7 <> 0 AND (d + si) % 5 = 3
),
idx AS (SELECT unnest(generate_series(0, 63)) AS i),
amp AS (
  SELECT d, m, ((m * 53 + 17 * i) % 4001) - 2000 AS a
  FROM media CROSS JOIN idx
)
SELECT printf('doc-%08d', d) AS doc_id, printf('m-%d', m) AS media_ref,
  CAST(64 AS BIGINT) AS n_samples, CAST(8000 AS BIGINT) AS sample_rate,
  CAST(SUM(a) AS BIGINT) AS sum_amp, CAST(SUM(a * a) AS BIGINT) AS sum_sq
FROM amp GROUP BY d, m
"""


@query("media_wav_features", sql=_WAV_SQL)
def media_wav_features(sf_dir: str) -> ray.data.Dataset:
    """REAL audio decode path (the WAV sibling of ``media_ppm_features``):
    media spans carry genuine RIFF/PCM16 payloads, and ``WavDecoder``
    walks the RIFF chunks (magic + fmt validation, pad-byte handling)
    before computing integer-exact clip statistics — a chunk-offset or
    endianness bug fails the oracle."""
    from ocr_ray.stages.explode import explode_documents
    from ocr_ray.stages.media import WavDecoder, attach_wav_payloads

    corpus = ensure_corpus(sf_dir, glyphs=False)
    ds = read_documents(corpus)
    flat = ds.map_batches(
        explode_documents, batch_format="pyarrow", fn_kwargs={"sentinels": False}
    ).map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "media")), batch_format="pyarrow"
    )
    with_payloads = flat.map_batches(attach_wav_payloads, batch_format="pyarrow", batch_size=512)
    return with_payloads.map_batches(
        WavDecoder,
        batch_format="pyarrow",
        batch_size=512,
        concurrency=pool_size(),
    )


_WALSH_SQL = """
WITH src AS (SELECT doc_id AS d, string_split(text, ' ') AS ws FROM documents),
w AS (SELECT d, generate_subscripts(ws, 1) AS i FROM src),
spans AS (SELECT d, (i - 1) // 8 AS si FROM w GROUP BY d, (i - 1) // 8),
media AS (
  SELECT d, si, (d * 1000 + si) % 9973 AS m FROM spans
  WHERE (d + si) % 7 <> 0 AND (d + si) % 5 = 3
),
idx AS (SELECT unnest(generate_series(0, 63)) AS i),
amp AS (
  SELECT d, m, i, ((m * 53 + 17 * i) % 4001) - 2000 AS a
  FROM media CROSS JOIN idx
)
SELECT printf('doc-%08d', d) AS doc_id, printf('m-%d', m) AS media_ref,
  CAST(SUM(a * (1 - 2 * ((i >> 0) & 1))) AS BIGINT) AS walsh_b0,
  CAST(SUM(a * (1 - 2 * ((i >> 1) & 1))) AS BIGINT) AS walsh_b1,
  CAST(SUM(a * (1 - 2 * ((i >> 2) & 1))) AS BIGINT) AS walsh_b2
FROM amp GROUP BY d, m
"""


@query("media_walsh_features", sql=_WALSH_SQL)
def media_walsh_features(sf_dir: str) -> ray.data.Dataset:
    """Frequency-domain audio features over REAL decoded WAV clips:
    Walsh–Hadamard sequency correlates (square-wave basis, sign flip
    every 2^k samples) computed from the RIFF-parsed PCM — the
    integer-exact analogue of DFT-bin energies, which makes a SPECTRAL
    feature oracle-checkable bit-exact (a float FFT never is, from
    summation-order ulp drift alone). Decode is the same actor-pool
    chunk-walking parser as ``media_wav_features``; the correlates are
    one (n, 64) x (64, 3) integer matmul per batch."""
    from ocr_ray.stages.explode import explode_documents
    from ocr_ray.stages.media import WalshDecoder, attach_wav_payloads

    corpus = ensure_corpus(sf_dir, glyphs=False)
    ds = read_documents(corpus)
    flat = ds.map_batches(
        explode_documents, batch_format="pyarrow", fn_kwargs={"sentinels": False}
    ).map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "media")), batch_format="pyarrow"
    )
    with_payloads = flat.map_batches(attach_wav_payloads, batch_format="pyarrow", batch_size=512)
    return with_payloads.map_batches(
        WalshDecoder,
        batch_format="pyarrow",
        batch_size=512,
        concurrency=pool_size(),
    )


_Y4M_SQL = """
WITH src AS (SELECT doc_id AS d, string_split(text, ' ') AS ws FROM documents),
w AS (SELECT d, generate_subscripts(ws, 1) AS i FROM src),
spans AS (SELECT d, (i - 1) // 8 AS si FROM w GROUP BY d, (i - 1) // 8),
media AS (
  SELECT d, si, (d * 1000 + si) % 9973 AS m FROM spans
  WHERE (d + si) % 7 <> 0 AND (d + si) % 5 = 3
),
px AS (SELECT unnest(generate_series(0, 7)) AS x),
py AS (SELECT unnest(generate_series(0, 3)) AS y),
pf AS (SELECT unnest(generate_series(0, 4)) AS f),
luma AS (
  SELECT d, m, pf.f AS f, (m * 41 + 19 * pf.f + 13 * py.y + 7 * px.x) % 256 AS v
  FROM media CROSS JOIN px CROSS JOIN py CROSS JOIN pf
)
SELECT printf('doc-%08d', d) AS doc_id, printf('m-%d', m) AS media_ref,
  CAST(5 AS BIGINT) AS n_frames, CAST(8 AS BIGINT) AS width, CAST(4 AS BIGINT) AS height,
  CAST(25 AS BIGINT) AS fps_num,
  CAST(SUM(v) AS BIGINT) AS luma_sum,
  CAST(SUM(CASE WHEN f = 0 THEN v ELSE 0 END) AS BIGINT) AS luma_sum_first,
  CAST(SUM(CASE WHEN f = 4 THEN v ELSE 0 END) AS BIGINT) AS luma_sum_last
FROM luma GROUP BY d, m
"""


@query("media_y4m_features", sql=_Y4M_SQL)
def media_y4m_features(sf_dir: str) -> ray.data.Dataset:
    """REAL video decode path (the Y4M sibling of ``media_ppm_features`` /
    ``media_wav_features``, completing the image/audio/video trio): media
    spans carry genuine YUV4MPEG2 clips (5 frames, C420), and
    ``Y4mDecoder`` parses the stream header tags + per-FRAME markers and
    strides the 4:2:0 planes before computing integer-exact luma
    statistics — a plane-offset or frame-stride bug fails the oracle."""
    from ocr_ray.stages.explode import explode_documents
    from ocr_ray.stages.media import Y4mDecoder, attach_y4m_payloads

    corpus = ensure_corpus(sf_dir, glyphs=False)
    ds = read_documents(corpus)
    flat = ds.map_batches(
        explode_documents, batch_format="pyarrow", fn_kwargs={"sentinels": False}
    ).map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "media")), batch_format="pyarrow"
    )
    with_payloads = flat.map_batches(attach_y4m_payloads, batch_format="pyarrow", batch_size=512)
    return with_payloads.map_batches(
        Y4mDecoder,
        batch_format="pyarrow",
        batch_size=512,
        concurrency=pool_size(),
    )


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
        xc = to_units(t["l_quantity"])
        yc = to_units(t["l_extendedprice"])
        return pa.table(
            {
                "returnflag": t["l_returnflag"],
                "xc": xc,
                "yc": yc,
                "xx": pc.multiply_checked(xc, xc),
                "xy": pc.multiply_checked(xc, yc),
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("returnflag")
        .aggregate(
            Count(alias_name="n_rows"),
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
    from ray.data.aggregate import Sum

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

    def body(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"cohort_month": pd.Series([], dtype=object), "order_month": pd.Series([], dtype=object), "n_custs": pd.Series([], dtype=np.int64)})
        g2 = g.drop_duplicates(["custkey", "order_month"])
        cm = g2.groupby("custkey")["order_month"].transform("min")
        part = (
            g2.assign(cohort_month=cm)
            .groupby(["cohort_month", "order_month"], sort=False)
            .size()
            .reset_index(name="n_custs")
        )
        return part

    partials = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(body, batch_format="pandas")
    )
    return partials.groupby(["cohort_month", "order_month"]).aggregate(
        Sum("n_custs", alias_name="n_custs")
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

    def body(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"from_type": pd.Series([], dtype=object), "to_type": pd.Series([], dtype=object), "n_pairs": pd.Series([], dtype=np.int64)})
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        same = uid[1:] == uid[:-1]
        if not same.any():
            return pd.DataFrame({"from_type": pd.Series([], dtype=object), "to_type": pd.Series([], dtype=object), "n_pairs": pd.Series([], dtype=np.int64)})
        return (
            pd.DataFrame({"from_type": et[:-1][same], "to_type": et[1:][same]})
            .groupby(["from_type", "to_type"], sort=False)
            .size()
            .reset_index(name="n_pairs")
        )

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

    def body(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype=np.int64),
                    "seq_len": pd.Series([], dtype=np.int64),
                    "n_matches": pd.Series([], dtype=np.int64),
                }
            )
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        seqs = g.groupby("user_id", sort=False)["c"].agg("".join)
        n = seqs.map(lambda s: len(pat.findall(s)))
        hit = n > 0
        return pd.DataFrame(
            {
                "user_id": seqs.index.to_numpy()[hit],
                "seq_len": seqs.str.len().to_numpy(dtype=np.int64)[hit],
                "n_matches": n.to_numpy(dtype=np.int64)[hit],
            }
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

    def pairs_body(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "part_a": pd.Series([], dtype=np.int64),
                    "part_b": pd.Series([], dtype=np.int64),
                    "n_orders": pd.Series([], dtype=np.int64),
                }
            )
        d = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        m = d.merge(d, on="l_orderkey", suffixes=("_a", "_b"))
        m = m[m["l_partkey_a"] < m["l_partkey_b"]]
        return (
            m.groupby(["l_partkey_a", "l_partkey_b"], sort=False)
            .size()
            .reset_index(name="n_orders")
            .rename(columns={"l_partkey_a": "part_a", "l_partkey_b": "part_b"})
        )

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

    def count_body(g: pd.DataFrame) -> pd.DataFrame:
        # a pair's rows all share its hash bucket, so the in-bucket sum is
        # the exact global count and the bucket top-20 is a valid partial
        red = (
            g.groupby(["part_a", "part_b"], sort=False)["n_orders"].sum().reset_index()
        )
        return local_topk(red)

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
        num_buckets=16,
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
    oracle (data-dependent iterative fit); per-doc token counts are
    asserted equal to an independent pure-Python encoder in
    tests/test_dedup_ann.py."""
    from ocr_ray.functions.bpe import BpeEncoder, bpe_train

    fit = bpe_train(read_table(sf_dir, "documents", columns=["text"]), num_merges=12)
    merges = list(zip(fit["left"], fit["right"]))
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        BpeEncoder,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=pool_size(),
        fn_constructor_kwargs={"merges": merges},
    )


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
