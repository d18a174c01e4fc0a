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
