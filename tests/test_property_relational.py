"""Hypothesis property suites for the round-3 relational additions:
FULL OUTER join and percent_rank/cume_dist must match DuckDB on RANDOM
corpora — null keys, duplicate keys, dangling FKs, null prices, ties —
not just the fixed testdata."""

import duckdb
import hypothesis.strategies as st
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings

from tests.test_queries_vs_oracle import _canon


def _write(tmpdir, name, df):
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None),
        f"{tmpdir}/{name}.parquet",
    )


@settings(max_examples=8, deadline=None)
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_property_full_outer_vs_duckdb(seed, tmp_path_factory):
    rng = np.random.RandomState(seed)
    d = str(tmp_path_factory.mktemp(f"fo{seed}"))
    n_c = int(rng.randint(1, 40))
    n_o = int(rng.randint(0, 120))
    ck = rng.randint(0, 30, size=n_c).astype("float64")
    ck[rng.rand(n_c) < 0.15] = np.nan  # null customer keys
    cust = pd.DataFrame(
        {
            "c_custkey": pd.array(
                [None if np.isnan(x) else int(x) for x in ck], dtype="Int64"
            ),
            "c_mktsegment": [
                None if rng.rand() < 0.1 else f"S{int(x) % 3}" for x in range(n_c)
            ],
        }
    )
    ok = rng.randint(0, 45, size=n_o).astype("float64")  # 30..44 dangle
    ok[rng.rand(n_o) < 0.15] = np.nan
    price = rng.rand(n_o) * 100
    price[rng.rand(n_o) < 0.15] = np.nan
    orders = pd.DataFrame(
        {
            "o_custkey": pd.array(
                [None if np.isnan(x) else int(x) for x in ok], dtype="Int64"
            ),
            "o_totalprice": price,
        }
    )
    _write(d, "customer", cust)
    _write(d, "orders", orders)
    from laketide.functions.relational import customer_orders_full_outer

    got = _canon(customer_orders_full_outer(d).to_pandas())
    want = _canon(
        duckdb.connect()
        .execute(
            "WITH oa AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents "
            f"FROM read_parquet('{d}/orders.parquet') GROUP BY 1) "
            "SELECT COALESCE(c_custkey, o_custkey) AS custkey, c_mktsegment, "
            "COALESCE(n, 0) AS n_orders, COALESCE(cents, 0) AS total_cents "
            f"FROM read_parquet('{d}/customer.parquet') "
            "FULL OUTER JOIN oa ON c_custkey = o_custkey"
        )
        .df()
    )
    assert len(got) == len(want), (seed, len(got), len(want))
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


@settings(max_examples=8, deadline=None)
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_property_percent_rank_vs_duckdb(seed, tmp_path_factory):
    rng = np.random.RandomState(seed)
    d = str(tmp_path_factory.mktemp(f"pr{seed}"))
    n = int(rng.randint(1, 300))
    # coarse grid -> many exact ties; nulls in both columns
    price = np.round(rng.randint(0, 12, size=n) / 2 + rng.rand(n) * 0.01, 2)
    price[rng.rand(n) < 0.1] = np.nan
    keys = np.arange(n).astype("float64")
    keys[rng.rand(n) < 0.05] = np.nan
    orders = pd.DataFrame(
        {
            "o_orderkey": pd.array(
                [None if np.isnan(x) else int(x) for x in keys], dtype="Int64"
            ),
            "o_totalprice": price,
        }
    )
    _write(d, "orders", orders)
    from laketide.functions.analytics import orders_price_percent_rank

    got = _canon(orders_price_percent_rank(d).to_pandas())
    want = _canon(
        duckdb.connect()
        .execute(
            "SELECT o_orderkey, CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_cents, "
            "percent_rank() OVER (ORDER BY CAST(ROUND(o_totalprice*100) AS BIGINT)) AS pct_rank, "
            "cume_dist() OVER (ORDER BY CAST(ROUND(o_totalprice*100) AS BIGINT)) AS cume_dist "
            f"FROM read_parquet('{d}/orders.parquet') "
            "WHERE o_totalprice IS NOT NULL AND o_orderkey IS NOT NULL"
        )
        .df()
    )
    assert len(got) == len(want), (seed, len(got), len(want))
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
