"""Op-specific tests for operators without a SQL oracle (HLL sketch) and
spot-checks on the windowed / as-of operators beyond the oracle gate."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def queries():
    import __ray_entry__ as e

    return e.queries()


def _to_df(res) -> pd.DataFrame:
    return res if isinstance(res, pd.DataFrame) else res.to_pandas()


def test_hll_within_error_vs_exact(queries, sf_smoke):
    import duckdb

    approx = _to_df(queries["approx_distinct_users"](sf_smoke)).set_index("event_type")
    exact = (
        duckdb.connect()
        .execute(
            "SELECT event_type, COUNT(DISTINCT user_id) AS n FROM "
            f"'{sf_smoke}/events.parquet' GROUP BY event_type"
        )
        .fetchdf()
        .set_index("event_type")
    )
    assert set(approx.index) == set(exact.index)
    for et in exact.index:
        a, x = approx.loc[et, "approx_users"], exact.loc[et, "n"]
        assert abs(a - x) / max(x, 1) < 0.15, (et, a, x)


def test_hll_partials_merge_identically_across_splits(sf_smoke):
    """Sketch mergeability (the semantics that make it shuffle-safe):
    register-wise max over any partition of the input equals the
    single-pass registers."""
    import pyarrow.parquet as pq

    from ocr_ray.functions.sketch import hll_estimate, hll_partial_registers

    t = pq.read_table(f"{sf_smoke}/events.parquet", columns=["event_type", "user_id"])
    whole = hll_partial_registers(t).to_pandas()
    parts = pd.concat(
        [
            hll_partial_registers(t.slice(0, t.num_rows // 3)).to_pandas(),
            hll_partial_registers(t.slice(t.num_rows // 3, t.num_rows // 3)).to_pandas(),
            hll_partial_registers(t.slice(2 * (t.num_rows // 3))).to_pandas(),
        ]
    )
    merged = parts.groupby(["event_type", "register"], as_index=False)["rho"].max()
    a = hll_estimate(whole).sort_values("event_type").reset_index(drop=True)
    b = hll_estimate(merged).sort_values("event_type").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_top_orders_per_customer_rank_bounds(queries, sf_smoke):
    df = _to_df(queries["top_orders_per_customer"](sf_smoke))
    assert df["rnk"].isin([1, 2]).all()
    per_cust = df.groupby("o_custkey").size()
    assert (per_cust <= 2).all()
    # rank 1 must dominate rank 2 within a customer
    both = df.pivot_table(index="o_custkey", columns="rnk", values="o_totalprice")
    both = both.dropna()
    assert (both[1] >= both[2]).all()


def test_asof_matches_are_at_or_before_event_date(queries, sf_smoke):
    df = _to_df(queries["asof_join_events_orders"](sf_smoke))
    ed = pd.Timestamp("1995-01-01") + pd.to_timedelta(
        df["event_id"].to_numpy() % 2400, unit="D"
    )
    matched = pd.to_datetime(df["matched_date"])
    assert (matched <= ed).all()
