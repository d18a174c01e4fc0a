"""hash_join edge probes vs a pandas-merge reference: key-name collisions,
empty sides, full-outer null fill, composite keys."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ocr_ray.functions.relational import hash_join


def _ds(t: pa.Table):
    import ray.data

    return ray.data.from_arrow(t)


def _run(left, right, **kw) -> pd.DataFrame:
    out = hash_join(_ds(left), _ds(right), num_buckets=4, **kw).to_pandas()
    return out.sort_values(list(out.columns), kind="mergesort").reset_index(drop=True)


LEFT = pa.table(
    {
        "k": pa.array([1, 2, 3, 5], pa.int64()),
        "val": pa.array(["a", "b", "c", "e"]),
    }
)
RIGHT = pa.table(
    {
        "rk": pa.array([2, 3, 4], pa.int64()),
        "val": pa.array(["x", "y", "z"]),  # collides with left's non-key 'val'
    }
)


def test_right_column_collision_is_suffixed():
    out = _run(LEFT, RIGHT, on="k", right_on="rk", how="inner")
    assert set(out.columns) == {"k", "val", "rk", "val_r"}
    assert out["k"].tolist() == [2, 3]
    assert out["val"].tolist() == ["b", "c"]
    assert out["val_r"].tolist() == ["x", "y"]


def test_right_key_itself_colliding_with_left_nonkey():
    right = pa.table(
        {"val": pa.array([2, 3], pa.int64())}  # right KEY named like left's 'val'
    )
    out = _run(LEFT, right, on="k", right_on="val", how="inner")
    assert out["k"].tolist() == [2, 3]
    assert "val_r" in out.columns


def test_empty_right_side_inner_and_left():
    empty = pa.table({"rk": pa.array([], pa.int64()), "w": pa.array([], pa.float64())})
    inner = _run(LEFT, empty, on="k", right_on="rk", how="inner")
    assert len(inner) == 0
    left = _run(LEFT, empty, on="k", right_on="rk", how="left")
    assert len(left) == len(LEFT)
    assert left["w"].isna().all()


def test_full_outer_matches_pandas_reference():
    out = _run(LEFT, RIGHT, on="k", right_on="rk", how="full")
    ref = (
        LEFT.to_pandas()
        .merge(
            RIGHT.to_pandas().rename(columns={"val": "val_r"}),
            left_on="k",
            right_on="rk",
            how="outer",
        )
        .sort_values(["k", "rk"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert len(out) == len(ref) == 5
    # unmatched-left rows carry null right columns and vice versa
    assert out["rk"].isna().sum() == 2
    assert out["k"].isna().sum() == 1


def test_composite_key_join():
    left = pa.table(
        {
            "a": pa.array([1, 1, 2, 2], pa.int64()),
            "b": pa.array(["x", "y", "x", "y"]),
            "lv": pa.array([10, 11, 12, 13], pa.int64()),
        }
    )
    right = pa.table(
        {
            "a": pa.array([1, 2, 2], pa.int64()),
            "b": pa.array(["y", "x", "z"]),
            "rv": pa.array([100, 200, 300], pa.int64()),
        }
    )
    out = _run(left, right, on=["a", "b"], how="inner")
    ref = left.to_pandas().merge(right.to_pandas(), on=["a", "b"], how="inner")
    assert sorted(zip(out["a"], out["b"], out["lv"], out["rv"])) == sorted(
        zip(ref["a"], ref["b"], ref["lv"], ref["rv"])
    )


def test_merge_upsert_semantics():
    """Delete existing + missing keys, update existing, upsert-insert new,
    pass untouched rows through unchanged."""
    import ray

    from ocr_ray.functions.relational import merge_upsert

    base = pa.table(
        {
            "k": pa.array([1, 2, 3, 4], pa.int64()),
            "s": pa.array(["a", "b", "c", "d"]),
            "v": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
        }
    )
    changes = pa.table(
        {
            "k": pa.array([2, 3, 5, 9], pa.int64()),
            "op": pa.array(["D", "U", "U", "D"]),
            "s": pa.array(["", "C", "E", ""]),
            "v": pa.array([0.0, 33.0, 55.0, 0.0], pa.float64()),
        }
    )
    out = (
        merge_upsert(
            ray.data.from_arrow(base),
            ray.data.from_arrow(changes),
            on="k",
            num_buckets=4,
            base_schema=base.schema,
            changes_schema=changes.schema,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # 2 deleted (9 was never present - no-op), 3 replaced, 5 inserted
    assert list(out["k"]) == [1, 3, 4, 5]
    assert list(out["s"]) == ["a", "C", "d", "E"]
    assert list(out["v"]) == [1.0, 33.0, 4.0, 55.0]


def test_semi_anti_join_bucketed():
    """Exact distributed semi/anti: membership-only output (left columns,
    no row multiplication even with duplicate right keys), empty right
    side, and composite keys."""
    import ray

    from ocr_ray.functions.relational import hash_join

    left = pa.table(
        {
            "k": pa.array([1, 1, 2, 3, 4], pa.int64()),
            "v": pa.array(["a", "b", "c", "d", "e"]),
        }
    )
    # duplicate + irrelevant right keys
    right = pa.table({"rk": pa.array([1, 1, 1, 3, 9], pa.int64())})

    def run(how):
        return (
            hash_join(
                ray.data.from_arrow(left),
                ray.data.from_arrow(right),
                on="k",
                right_on="rk",
                how=how,
                num_buckets=4,
                left_schema=left.schema,
                right_schema=right.schema,
            )
            .to_pandas()
            .sort_values(["k", "v"])
            .reset_index(drop=True)
        )

    semi = run("semi")
    assert list(semi.columns) == ["k", "v"]
    assert list(semi["v"]) == ["a", "b", "d"]  # no multiplication by dup rhs
    anti = run("anti")
    assert list(anti["v"]) == ["c", "e"]

    # empty right side: semi empty, anti passes everything
    empty = pa.table({"rk": pa.array([], pa.int64())})
    for how, expect in (("semi", 0), ("anti", 5)):
        out = hash_join(
            ray.data.from_arrow(left),
            ray.data.from_arrow(empty),
            on="k",
            right_on="rk",
            how=how,
            num_buckets=4,
            left_schema=left.schema,
            right_schema=empty.schema,
        ).to_pandas()
        assert len(out) == expect, how

    # composite keys
    l2 = pa.table(
        {
            "a": pa.array([1, 1, 2], pa.int64()),
            "b": pa.array(["x", "y", "x"]),
            "v": pa.array([10, 20, 30], pa.int64()),
        }
    )
    r2 = pa.table({"a": pa.array([1, 2], pa.int64()), "b": pa.array(["y", "z"])})
    out = (
        hash_join(
            ray.data.from_arrow(l2),
            ray.data.from_arrow(r2),
            on=["a", "b"],
            how="semi",
            num_buckets=4,
            left_schema=l2.schema,
            right_schema=r2.schema,
        )
        .to_pandas()
    )
    assert list(out["v"]) == [20]


# ---------------------------------------------------------------------------
# auto_join: strategy pick must be invisible — broadcast and bucketed paths
# produce identical frames (names, dtypes, rows) on the same input.
# ---------------------------------------------------------------------------


def _run_auto(left, right, *, broadcast_max_bytes, **kw) -> pd.DataFrame:
    from ocr_ray.functions.relational import auto_join

    out = auto_join(
        _ds(left), _ds(right), num_buckets=4,
        broadcast_max_bytes=broadcast_max_bytes, **kw
    ).to_pandas()
    return out.sort_values(list(out.columns), kind="mergesort").reset_index(drop=True)


DUP_RIGHT = pa.table(
    {
        "rk": pa.array([2, 2, 3, 4], pa.int64()),  # duplicate build keys expand
        "val": pa.array(["x", "x2", "y", "z"]),
    }
)


@pytest.mark.parametrize("how", ["inner", "left"])
def test_auto_join_broadcast_equals_bucketed(how):
    shuffled = _run(LEFT, DUP_RIGHT, on="k", right_on="rk", how=how)
    broadcast = _run_auto(
        LEFT, DUP_RIGHT, on="k", right_on="rk", how=how, broadcast_max_bytes=1 << 30
    )
    pd.testing.assert_frame_equal(broadcast, shuffled)


def test_auto_join_falls_back_to_shuffle():
    # size cap 0 forces the bucketed path; right/full always shuffle
    out = _run_auto(
        LEFT, DUP_RIGHT, on="k", right_on="rk", how="inner", broadcast_max_bytes=0
    )
    pd.testing.assert_frame_equal(out, _run(LEFT, DUP_RIGHT, on="k", right_on="rk", how="inner"))
    full = _run_auto(
        LEFT, DUP_RIGHT, on="k", right_on="rk", how="full", broadcast_max_bytes=1 << 30
    )
    pd.testing.assert_frame_equal(full, _run(LEFT, DUP_RIGHT, on="k", right_on="rk", how="full"))


def test_bucketed_aggregate_matches_dataset_aggregate():
    """bucketed_aggregate (the high-cardinality groupby path) must produce
    exactly the rows of Dataset.groupby().aggregate() — int dtypes
    preserved, composite keys included."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count, Max, Min, Sum

    from ocr_ray.functions.relational import bucketed_aggregate

    rng = np.random.default_rng(3)
    n = 5000
    t = pa.table(
        {
            "k1": pa.array(rng.integers(0, 400, n), pa.int64()),
            "k2": pa.array([f"g{v}" for v in rng.integers(0, 3, n)]),
            "v": pa.array(rng.integers(-100, 100, n), pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(7)

    got = (
        bucketed_aggregate(
            ds,
            keys=["k1", "k2"],
            aggs={"s": ("v", "sum"), "c": ("v", "count"), "lo": ("v", "min"), "hi": ("v", "max")},
            num_buckets=8,
        )
        .to_pandas()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    want = (
        ds.groupby(["k1", "k2"])
        .aggregate(
            Sum("v", alias_name="s"),
            Count(alias_name="c"),
            Min("v", alias_name="lo"),
            Max("v", alias_name="hi"),
        )
        .to_pandas()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k1", "k2", "s", "c", "lo", "hi"]].astype({"c": "int64"}),
                                  want[["k1", "k2", "s", "c", "lo", "hi"]].astype({"c": "int64"}))


def test_bucketed_aggregate_keeps_null_key_group():
    """Null keys must form a group (dropna=False), matching
    Dataset.aggregate semantics — a silent row drop here would corrupt
    any aggregate over a column with missing keys."""
    import pyarrow as pa
    import ray.data

    from ocr_ray.functions.relational import bucketed_aggregate

    t = pa.table(
        {"k": pa.array(["a", None, "a", None, "b"]), "v": pa.array([1, 2, 3, 4, 5], pa.int64())}
    )
    out = bucketed_aggregate(
        ray.data.from_arrow(t), keys=["k"], aggs={"s": ("v", "sum")}, num_buckets=2
    ).to_pandas()
    got = {(None if pd.isnull(r.k) else r.k): int(r.s) for r in out.itertuples(index=False)}
    assert got == {"a": 4, "b": 5, None: 6}


def test_bucketed_aggregate_preserves_int64_with_nulls():
    """Nullable int64 keys must stay int64 through the in-bucket pandas
    round-trip (a float64 coercion would corrupt keys above 2^53 and
    change the output schema), and pandas 'count' (non-null) vs 'size'
    (rows) semantics must both be available."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from ocr_ray.functions.relational import bucketed_aggregate

    big = 2**60 + 7
    t = pa.table(
        {"k": pa.array([1, None, 1, None, big], pa.int64()), "v": pa.array([1, 2, 3, 4, 5], pa.int64())}
    )
    out = bucketed_aggregate(
        ray.data.from_arrow(t), keys=["k"], aggs={"s": ("v", "sum"), "n": ("v", "size")}, num_buckets=2
    )
    assert out.schema().base_schema.field("k").type == pa.int64()
    # read through Arrow: pandas would coerce the nullable int64 column to
    # float64 on ITS side and corrupt the 2^60 key in the comparison
    got = {r["k"]: (int(r["s"]), int(r["n"])) for r in out.take_all()}
    assert got == {1: (4, 2), None: (6, 2), big: (5, 1)}

    nul = pa.table({"k": pa.array(["a", "a"]), "v": pa.array([1, None], pa.int64())})
    out2 = bucketed_aggregate(
        ray.data.from_arrow(nul), keys=["k"], aggs={"c": ("v", "count"), "n": ("v", "size")}, num_buckets=1
    ).to_pandas()
    assert out2["c"].tolist() == [1] and out2["n"].tolist() == [2]


def _ds(t):
    import ray.data

    return ray.data.from_arrow(t)


def test_hash_join_matches_across_physical_key_types():
    """Value-equal keys of different physical widths (int32 vs int64) must
    land in the same bucket — hashes are computed on the unified key type,
    not the raw columns."""
    import pyarrow as pa

    from ocr_ray.functions.relational import hash_join

    left = pa.table({"k": pa.array([-5, 3, 7], pa.int64()), "lv": pa.array([1, 2, 3], pa.int64())})
    right = pa.table({"k": pa.array([-5, 7], pa.int32()), "rv": pa.array([10, 20], pa.int64())})
    out = hash_join(
        _ds(left), _ds(right), on="k", num_buckets=8,
        left_schema=left.schema, right_schema=right.schema,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == [-5, 7]
    assert out["rv"].tolist() == [10, 20]


def test_hash_join_null_keys_follow_sql_semantics():
    """NULL keys never equality-match: inner drops them, semi excludes
    them, anti (NOT EXISTS) keeps them, and outer sides emit them as
    unmatched rows instead of pairing NaN with NaN."""
    import pyarrow as pa

    from ocr_ray.functions.relational import hash_join

    left = pa.table(
        {"k": pa.array([1, None, 2], pa.int64()), "lv": pa.array([10, 11, 12], pa.int64())}
    )
    right = pa.table(
        {"k": pa.array([1, None], pa.int64()), "rv": pa.array([100, 101], pa.int64())}
    )
    kw = dict(on="k", num_buckets=4, left_schema=left.schema, right_schema=right.schema)

    inner = hash_join(_ds(left), _ds(right), how="inner", **kw).to_pandas()
    assert inner["k"].tolist() == [1] and inner["rv"].tolist() == [100]

    semi = hash_join(_ds(left), _ds(right), how="semi", **kw).to_pandas()
    assert semi["lv"].tolist() == [10]

    anti = hash_join(_ds(left), _ds(right), how="anti", **kw).to_pandas()
    assert sorted(anti["lv"].tolist()) == [11, 12]  # null-key left row kept

    full = hash_join(_ds(left), _ds(right), how="full", **kw).to_pandas()
    assert len(full) == 4  # match(1), left-null, left 2, right-null
    assert sorted(v for v in full["lv"].dropna().astype(int)) == [10, 11, 12]
    assert sorted(v for v in full["rv"].dropna().astype(int)) == [100, 101]


def test_hash_join_outer_preserves_large_int64():
    """Outer null-fills must not round int64 values above 2^53 through a
    float64 detour."""
    import pyarrow as pa

    from ocr_ray.functions.relational import hash_join

    big = 2**53 + 1
    left = pa.table({"k": pa.array([1, 2], pa.int64()), "lv": pa.array([big, 7], pa.int64())})
    right = pa.table({"k": pa.array([2, 3], pa.int64()), "rv": pa.array([big + 2, 9], pa.int64())})
    out = hash_join(
        _ds(left), _ds(right), on="k", how="full", num_buckets=4,
        left_schema=left.schema, right_schema=right.schema,
    )
    vals = {r["k"]: (r["lv"], r["rv"]) for r in out.take_all()}
    assert vals[1] == (big, None)
    assert vals[2] == (7, big + 2)
    assert vals[3] == (None, 9)


def test_join_suffix_collision_raises():
    """left has both 'x' and 'x_r'; right has 'x' — the suffixed name
    collides and must fail loudly up front, not as a KeyError in a task."""
    import pyarrow as pa
    import pytest as _pytest

    from ocr_ray.functions.relational import hash_join

    left = pa.table(
        {"k": pa.array([1], pa.int64()), "x": pa.array([1], pa.int64()), "x_r": pa.array([2], pa.int64())}
    )
    right = pa.table({"k": pa.array([1], pa.int64()), "x": pa.array([3], pa.int64())})
    with _pytest.raises(ValueError, match="suffix collision"):
        hash_join(
            _ds(left), _ds(right), on="k", num_buckets=2,
            left_schema=left.schema, right_schema=right.schema,
        )
