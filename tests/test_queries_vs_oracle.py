"""Mirror of the driver's correctness gate: run every ``queries()`` entry
at sf0.01 and compare against ``oracle_sql()`` via DuckDB — row count,
column names, and order-insensitive exact values."""

import math

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            # nullable Int64: non-nullable int64 raises on NA values
            df[c] = df[c].astype("Int64")
        elif df[c].dtype == object and len(df):
            # list-valued columns (Ray list arrays / DuckDB LIST) -> tuples
            # for sortability; null-safe; genuine sequences only (a
            # np.bool_ scalar also has __array__ — ndim filters it out)
            import numpy as np

            sample = df[c].dropna()
            if len(sample):
                v0 = sample.iloc[0]
                is_seq = isinstance(v0, (list, tuple)) or (
                    hasattr(v0, "__array__")
                    and not isinstance(v0, (str, bytes))
                    and np.ndim(v0) >= 1
                )
                if is_seq:
                    df[c] = df[c].map(lambda v: tuple(v) if v is not None else None)
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(name):
    ray_df = _to_pandas(QUERIES[name](SF_DIR))
    con = _duck()
    duck_df = con.execute(ORACLES[name]).df()
    assert len(ray_df) == len(duck_df), f"{name}: rows {len(ray_df)} vs {len(duck_df)}"
    assert sorted(ray_df.columns) == sorted(duck_df.columns), (
        f"{name}: cols {sorted(ray_df.columns)} vs {sorted(duck_df.columns)}"
    )
    a, b = _canon(ray_df), _canon(duck_df)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True, obj=name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name):
    res = QUERIES[name](SF_DIR)
    df = _to_pandas(res)
    assert len(df) >= 0
    # determinism: running twice yields identical results
    df2 = _to_pandas(QUERIES[name](SF_DIR))
    a, b = _canon(df), _canon(df2)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True, obj=name)


def test_entry_smoke():
    ds = entrymod.entry()
    df = _to_pandas(ds)
    assert len(df) >= 0
    assert "repo" in df.columns and "content_sha256" in df.columns
