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


def test_frequent_tokens_match_exact_top(queries, sf_smoke):
    """MG candidates + exact recount must equal the true global top-32."""
    import duckdb

    got = _to_df(queries["frequent_tokens"](sf_smoke))
    truth = (
        duckdb.connect()
        .execute(
            "SELECT tok AS token, COUNT(*) AS cnt FROM (SELECT unnest(string_split(text,' ')) AS tok "
            f"FROM '{sf_smoke}/documents.parquet') GROUP BY tok ORDER BY cnt DESC, tok LIMIT 32"
        )
        .fetchdf()
    )
    assert list(got["token"]) == list(truth["token"])
    assert list(got["count"]) == list(truth["cnt"])


def test_misra_gries_guarantee_on_synthetic_stream():
    import numpy as np
    import pyarrow as pa

    from ocr_ray.functions.sketch import misra_gries_partial

    rng = np.random.default_rng(3)
    # heavy hitter 'hh' is >1/4 of the stream; capacity 8 must keep it
    words = ["hh" if rng.random() < 0.3 else f"w{rng.integers(0, 500)}" for _ in range(5000)]
    rows = [" ".join(words[i : i + 50]) for i in range(0, len(words), 50)]
    out = misra_gries_partial(pa.table({"text": pa.array(rows)}), k=8).to_pandas()
    assert "hh" in set(out["token"])


def test_read_any_csv_jsonl_roundtrip(tmp_path, sf_smoke):
    import pyarrow.parquet as pq

    from ocr_ray.sources.readers import read_any

    t = pq.read_table(f"{sf_smoke}/nation.parquet")
    csv_p = tmp_path / "nation.csv"
    jsonl_p = tmp_path / "nation.jsonl"
    t.to_pandas().to_csv(csv_p, index=False)
    t.to_pandas().to_json(jsonl_p, orient="records", lines=True)
    a = read_any(str(csv_p), columns=["n_nationkey", "n_name"]).to_pandas()
    b = read_any(str(jsonl_p), columns=["n_nationkey", "n_name"]).to_pandas()
    c = t.select(["n_nationkey", "n_name"]).to_pandas()
    for df in (a, b):
        assert sorted(df["n_name"]) == sorted(c["n_name"])
        assert len(df) == len(c)


def test_approx_quantiles_vs_exact(queries, sf_smoke):
    import duckdb

    got = _to_df(queries["approx_quantiles_totalprice"](sf_smoke)).set_index("quantile")
    exact = (
        duckdb.connect()
        .execute(
            "SELECT quantile_cont(o_totalprice, [0.1, 0.5, 0.9, 0.99]) AS q FROM "
            f"'{sf_smoke}/orders.parquet'"
        )
        .fetchone()[0]
    )
    spread = max(exact) - min(exact)
    for q, x in zip([0.1, 0.5, 0.9, 0.99], exact):
        assert abs(got.loc[q, "value"] - x) < 0.01 * spread + 1e-9, (q, got.loc[q, "value"], x)


def test_partitioned_rank_matches_pandas(ray_session):
    import ray

    from ocr_ray.functions.ranking import partitioned_rank

    rng = np.random.default_rng(7)
    n = 500
    df = pd.DataFrame(
        {
            "part": rng.choice(["x", "y", "z"], size=n),
            "val": rng.normal(size=n).round(3),
            "id": np.arange(n, dtype=np.int64),
        }
    )
    ds = ray.data.from_pandas(df)
    out = (
        partitioned_rank(
            ds,
            part_col="part",
            value_col="val",
            tiebreak_col="id",
            out_cols=["part", "id"],
            num_buckets=4,
            ntile=4,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    exp = df.sort_values(["part", "val", "id"]).copy()
    exp["rn"] = exp.groupby("part").cumcount() + 1
    npart = exp.groupby("part")["id"].transform("count")
    base, extra = npart // 4, npart % 4
    big = extra * (base + 1)
    exp["tile"] = np.where(
        exp["rn"] <= big,
        (exp["rn"] - 1) // (base + 1) + 1,
        extra + (exp["rn"] - big - 1) // base + 1,
    )
    exp = exp.sort_values("id").reset_index(drop=True)
    got = out.set_index("id")
    for c in ("rn", "tile"):
        assert (got.loc[exp["id"], c].to_numpy() == exp[c].to_numpy()).all(), c


def test_partitioned_primitives_handle_int_parts_null_parts_float_weights(ray_session):
    """partitioned_rank accepts non-string partition columns and keeps a
    NULL partition (previously: ArrowTypeError / KeyError crash);
    partitioned_prefix_sum sums float weights exactly instead of
    truncating them to int."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from ocr_ray.functions.ranking import partitioned_prefix_sum, partitioned_rank

    t = pa.table(
        {
            "p": pa.array([1, 1, 2, None, None], pa.int64()),
            "v": pa.array([3.0, 1.0, 2.0, 5.0, 4.0], pa.float64()),
            "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        }
    )
    out = (
        partitioned_rank(
            ray.data.from_arrow(t), part_col="p", value_col="v", tiebreak_col="id",
            out_cols=["p", "v", "id"], num_buckets=4,
        )
        .to_pandas()
        .sort_values(["id"])
        .reset_index(drop=True)
    )
    # per-partition ranks: p=1 -> v=1.0 rn1, v=3.0 rn2; p=2 -> rn1; NULL -> v=4.0 rn1, v=5.0 rn2
    got = dict(zip(out["id"], out["rn"]))
    assert got == {1: 2, 2: 1, 3: 1, 4: 2, 5: 1}

    w = pa.table(
        {
            "p": pa.array(["a", "a", "a"], pa.string()),
            "v": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "id": pa.array([1, 2, 3], pa.int64()),
            "w": pa.array([0.9, 1.7, 0.4], pa.float64()),
        }
    )
    ps = (
        partitioned_prefix_sum(
            ray.data.from_arrow(w), part_col="p", value_col="v", tiebreak_col="id",
            weight_col="w", out_cols=["id", "w"], num_buckets=2,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert np.allclose(ps["running_before"].to_numpy(), [0.0, 0.9, 2.6])


def test_rank_big_nullable_int_parts_key_consistently(ray_session):
    """Nullable int64 partitions with ids >= 2^53 share shuffle buckets
    with null rows: Ray hands the group body a float64-converted slice,
    so a body that re-derived keys from its frame would round the id to
    a DIFFERENT key than the histogram (KeyError at scan time — the r5
    review repro). The key now rides the shuffle as _pk; this pins it."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from ocr_ray.functions.ranking import partitioned_prefix_sum, partitioned_rank

    big = 9007199254740993  # 2^53 + 1: not representable in float64
    t = pa.table(
        {
            "p": pa.array([big, big, None, None, big], pa.int64()),
            "v": pa.array([3.0, 1.0, 2.0, 5.0, 4.0]),
            "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "w": pa.array([1, 1, 1, 1, 1], pa.int64()),
        }
    )
    out = (
        partitioned_rank(
            ray.data.from_arrow(t), part_col="p", value_col="v", tiebreak_col="id",
            out_cols=["id"], num_buckets=1,
        )
        .to_pandas()
        .sort_values("id")
    )
    assert dict(zip(out["id"], out["rn"])) == {1: 2, 2: 1, 3: 1, 4: 2, 5: 3}

    ps = (
        partitioned_prefix_sum(
            ray.data.from_arrow(t), part_col="p", value_col="v", tiebreak_col="id",
            weight_col="w", out_cols=["id"], num_buckets=1,
        )
        .to_pandas()
        .sort_values("id")
    )
    assert dict(zip(ps["id"], ps["running_before"])) == {1: 1, 2: 0, 3: 0, 4: 1, 5: 2}

    # float16 partitions: is_nan has no halffloat kernel — cast path
    h = pa.table(
        {
            "p": pa.array(np.array([1.5, 1.5, 2.5], dtype=np.float16), pa.float16()),
            "v": pa.array([2.0, 1.0, 1.0]),
            "id": pa.array([1, 2, 3], pa.int64()),
        }
    )
    hr = (
        partitioned_rank(
            ray.data.from_arrow(h), part_col="p", value_col="v", tiebreak_col="id",
            out_cols=["id"], num_buckets=1,
        )
        .to_pandas()
        .sort_values("id")
    )
    assert dict(zip(hr["id"], hr["rn"])) == {1: 2, 2: 1, 3: 1}


def test_prefix_sum_extra_weights_equal_separate_passes(ray_session):
    """Multi-weight scan (r5): extra_weight_cols must produce exactly the
    running_before each weight would get from its own single-weight
    pass, on mixed int/float weights with duplicate values and several
    partitions."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from ocr_ray.functions.ranking import partitioned_prefix_sum

    rng = np.random.RandomState(7)
    n = 500
    t = pa.table(
        {
            "p": pa.array(rng.choice(["a", "b", "c"], n)),
            "v": pa.array(rng.randint(0, 40, n).astype(np.float64)),
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "wa": pa.array(rng.randint(1, 9, n).astype(np.int64)),
            "wb": pa.array(rng.rand(n)),
        }
    )

    def run(weight_col, extra=()):
        return (
            partitioned_prefix_sum(
                ray.data.from_arrow(t),
                part_col="p",
                value_col="v",
                tiebreak_col="id",
                weight_col=weight_col,
                extra_weight_cols=extra,
                out_cols=["id"],
                num_buckets=4,
            )
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )

    both = run("wa", extra=("wb",))
    only_a = run("wa")
    only_b = run("wb")
    assert (both["running_before"].to_numpy() == only_a["running_before"].to_numpy()).all()
    assert np.allclose(
        both["running_before_wb"].to_numpy(), only_b["running_before"].to_numpy()
    )
    # int weight stays int64-exact
    assert both["running_before"].dtype.kind == "i"


def test_weighted_sample_priority_invariants(queries, sf_smoke):
    """Priority sampling: deterministic across runs, k rows, priorities
    sorted descending, and each priority equals w/u recomputed from the
    doc_id hash (membership is a pure function of the input)."""
    from ocr_ray.functions.hashing import mix64

    a = _to_df(queries["weighted_sample_docs"](sf_smoke))
    b = _to_df(queries["weighted_sample_docs"](sf_smoke))
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))
    assert len(a) == 64
    pr = a["priority"].to_numpy()
    assert (pr[:-1] >= pr[1:]).all()
    ids = a["doc_id"].to_numpy().astype(np.int64)
    mx = mix64(ids.astype(np.uint64))
    denom = ((mx >> np.uint64(1)) + np.uint64(1)).astype(np.float64)
    expect = a["n_chars"].to_numpy().astype(np.float64) / denom
    assert (pr == expect).all()


def test_scd2_history_invariants(queries, sf_smoke):
    """SCD2 reconstruction: per customer, versions are 1..n with exactly
    one current row, validity chains link (valid_to == next valid_from),
    adjacent runs change the attribute, and n_orders sums to the
    customer's order count."""
    import duckdb

    df = _to_df(queries["scd2_customer_priority"](sf_smoke))
    assert (df.groupby("o_custkey")["is_current"].sum() == 1).all()
    for _, g in list(df.groupby("o_custkey"))[:50]:
        g = g.sort_values("version")
        assert g["version"].tolist() == list(range(1, len(g) + 1))
        assert g["valid_to"].iloc[-1] == "9999-12-31"
        assert bool(g["is_current"].iloc[-1])
        assert (g["valid_to"].iloc[:-1].to_numpy() == g["valid_from"].iloc[1:].to_numpy()).all()
        # consecutive versions carry a changed attribute unless the change
        # happened within one date via orderkey ordering (still a change)
        assert (g["priority"].iloc[:-1].to_numpy() != g["priority"].iloc[1:].to_numpy()).all()
    totals = duckdb.sql(
        f"SELECT o_custkey, COUNT(*) AS n FROM read_parquet('{sf_smoke}/orders.parquet') GROUP BY o_custkey"
    ).df()
    merged = df.groupby("o_custkey")["n_orders"].sum().reset_index().merge(
        totals, on="o_custkey"
    )
    assert (merged["n_orders"] == merged["n"]).all()


def test_grouped_winsorize_stats_exact_vs_pandas(ray_session):
    """The two-pass winsorize primitive vs a brute-force pandas oracle:
    negatives (bit-pattern binning sign branch), NULLs (skipped like
    SQL), heavy ties at a quantile boundary, and a single-value group."""
    import ray as _ray

    from ocr_ray.functions.sketch import grouped_winsorize_stats

    rng = np.random.default_rng(7)
    vals = np.concatenate(
        [
            rng.integers(-50_000, 5_000_000, size=4000),
            np.full(500, 123_456),  # tie block
            np.full(1, 77),  # singleton group below
        ]
    ).astype(np.int64)
    groups = np.array(
        ["a"] * 2000 + ["b"] * 2000 + ["a"] * 500 + ["solo"], dtype=object
    )
    df = pd.DataFrame({"g": groups, "v": vals})
    # sprinkle NULLs into group b
    df_null = pd.DataFrame({"g": ["b"] * 7, "v": [pd.NA] * 7})
    full = pd.concat([df, df_null], ignore_index=True)
    ds = _ray.data.from_pandas(full).map_batches(
        lambda t: t, batch_format="pyarrow", batch_size=512
    )

    got = (
        grouped_winsorize_stats(ds, group_col="g", value_col="v", q_lo=0.05, q_hi=0.95)
        .set_index("g")
        .sort_index()
    )

    for g, sub in df.groupby("g"):
        v = np.sort(sub["v"].to_numpy(dtype=np.int64))
        n = len(v)
        p_lo = int(v[max(int(np.ceil(0.05 * n)) - 1, 0)])
        p_hi = int(v[max(int(np.ceil(0.95 * n)) - 1, 0)])
        clipped = np.clip(v, p_lo, p_hi)
        row = got.loc[g]
        assert int(row["n"]) == n
        assert int(row["p_lo"]) == p_lo
        assert int(row["p_hi"]) == p_hi
        assert int(row["n_clipped_lo"]) == int((v < p_lo).sum())
        assert int(row["n_clipped_hi"]) == int((v > p_hi).sum())
        assert int(row["sum_winsorized"]) == int(clipped.sum())


def test_window_sum_of_all_null_group_is_null(ray_session, tmp_path):
    """SQL SUM over an all-NULL value group is NULL, not 0 — the bucketed
    pandas fold would silently produce 0 without the n_valid guard
    (review finding on the round-4 window-family conversion)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    sf = str(tmp_path)
    ts = pd.to_datetime(
        ["2024-01-01 00:01:00", "2024-01-01 00:02:00", "2024-01-01 00:07:00"]
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3], type=pa.int64()),
                "user_id": pa.array([1, 1, 2], type=pa.int64()),
                "event_type": pa.array(["a", "a", "a"], type=pa.string()),
                "ts": pa.array(ts, type=pa.timestamp("us")),
                # first 5-min window: both values NULL; second: 3.0
                "value": pa.array([None, None, 3.0], type=pa.float64()),
                "payload": pa.array(["{}", "{}", "{}"], type=pa.string()),
            }
        ),
        f"{sf}/events.parquet",
    )
    df = (
        e.queries()["events_tumbling_5min"](sf)
        .to_pandas()
        .sort_values("window_start", ignore_index=True)
    )
    assert df["n_events"].tolist() == [2, 1]
    assert np.isnan(df["sum_value"].iloc[0])  # all-NULL window -> NULL sum
    assert df["sum_value"].iloc[1] == 3.0
