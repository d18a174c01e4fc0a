"""Count-Min sketch: overestimate guarantee, eps-bound, mergeability."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ocr_ray.functions.sketch import (
    CM_DEPTH,
    CM_WIDTH,
    cm_estimate,
    cm_partial,
    cm_slots_for,
)


def _sketch(keys: np.ndarray) -> np.ndarray:
    t = cm_partial(pa.table({"user_id": pa.array(keys)}))
    out = np.zeros(CM_DEPTH * CM_WIDTH, dtype=np.int64)
    out[t["slot"].to_numpy()] = t["count"].to_numpy()
    return out


def test_overestimate_and_eps_bound():
    rng = np.random.default_rng(11)
    # zipf-ish stream: heavy keys + long tail
    keys = np.concatenate(
        [np.repeat(np.arange(10), 500), rng.integers(10, 50_000, size=20_000)]
    )
    counters = _sketch(keys)
    probe = np.arange(10, dtype=np.int64)
    est = cm_estimate(counters, probe)
    exact = np.full(10, 500)
    exact += np.bincount(keys[keys < 10], minlength=10)[:10] - 500  # tail hits
    assert (est >= exact).all()  # CM never underestimates
    # standard bound: overestimate <= e/width * N with prob 1-exp(-depth);
    # deterministic check at 3x slack for a fixed seed
    n = len(keys)
    assert (est - exact <= 3 * np.e * n / CM_WIDTH).all()


def test_merge_equals_single_pass():
    rng = np.random.default_rng(5)
    keys = rng.integers(0, 1000, size=8192)
    whole = _sketch(keys)
    merged = _sketch(keys[:3000]) + _sketch(keys[3000:])
    assert np.array_equal(whole, merged)


def test_slots_deterministic_and_in_range():
    keys = np.array([0, 1, 2**62, 123456789], dtype=np.int64)
    s1, s2 = cm_slots_for(keys), cm_slots_for(keys)
    assert np.array_equal(s1, s2)
    for d in range(CM_DEPTH):
        col = s1[:, d]
        assert ((col >= d * CM_WIDTH) & (col < (d + 1) * CM_WIDTH)).all()


def test_hll_intersection_accuracy_vs_exact(sf_smoke):
    """Inclusion-exclusion HLL overlap stays within the additive error of
    its three +-2%-ish estimates on the smoke corpus."""
    import duckdb

    from ocr_ray.pipelines.queries import QUERY_FNS

    out = QUERY_FNS["approx_common_users"](sf_smoke).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_smoke}/events.parquet'"
    )
    exact = con.execute(
        """
        SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS n
        FROM (SELECT DISTINCT event_type, user_id FROM events) a
        JOIN (SELECT DISTINCT event_type, user_id FROM events) b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
        """
    ).df()
    lut = {(r.ta, r.tb): r.n for r in exact.itertuples()}
    assert len(out) == 10  # C(5,2) event-type pairs
    for r in out.itertuples():
        true = lut.get((r.type_a, r.type_b), 0)
        # union/singles are 256-register HLLs (~6.5% rse); the difference
        # of three estimates carries ~3x that — allow 25% + small floor
        assert abs(r.approx_common - true) <= max(0.25 * true, 30), (
            r.type_a,
            r.type_b,
            r.approx_common,
            true,
        )


def test_csv_roundtrip_preserves_null_vs_empty_strings(tmp_path):
    """Nulls and empty strings are DIFFERENT values and both survive the
    CSV round trip (review finding: default ConvertOptions folds NULL
    into '')."""
    import pyarrow as pa
    import ray

    from ocr_ray.sources.formats import read_csv_dir, write_csv_dir

    src = ray.data.from_arrow(
        pa.table(
            {
                "s": pa.array(["a", None, "", "b"]),
                "x": pa.array([1, 2, 3, 4], pa.int64()),
            }
        )
    )
    out = str(tmp_path / "csv")
    assert write_csv_dir(src, out).sum("rows") == 4
    schema = pa.schema([("s", pa.string()), ("x", pa.int64())])
    back = read_csv_dir(out, schema=schema).to_pandas().sort_values("x")
    got = [None if v != v or v is None else v for v in back["s"]]
    assert got == ["a", None, "", "b"]
