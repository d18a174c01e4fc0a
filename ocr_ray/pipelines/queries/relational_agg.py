"""Query registry section: relational_agg (split from the former monolithic queries.py)."""

from __future__ import annotations

import datetime

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ocr_ray.functions.relational import hash_join, to_units, units_to_double
from ocr_ray.sources import read_table

from ocr_ray.pipelines.queries._shared import query


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
    from ray.data.aggregate import Count

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
    from ocr_ray.pipelines.queries._shared import mapside_count_sum

    base = mapside_count_sum(
        prepped, keys=["event_type"], sum_cols=["value_c"]
    ).map_batches(
        lambda t: pa.table(
            {
                "event_type": t["event_type"],
                "n_events": t["n"],
                "value_c": t["value_c"],
            }
        ),
        batch_format="pyarrow",
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
    ds = read_table(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "month": pc.strftime(t["o_orderdate"], format="%Y-%m"),
                "price_c": to_units(t["o_totalprice"]),
            }
        )

    from ocr_ray.pipelines.queries._shared import mapside_count_sum

    agg = mapside_count_sum(
        ds.map_batches(prep, batch_format="pyarrow"),
        keys=["month"],
        sum_cols=["price_c"],
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "month": df["month"],
                "n_orders": df["n"].astype(np.int64),
                "total_price": units_to_double(df["price_c"], 2),
            }
        )

    return agg.map_batches(finalize, batch_format="pandas")


