"""TPC-H extension family (tpch.py): the adaptive queries must produce
IDENTICAL results on their broadcast path (default budget) and their
hash-join fallback path (budget=0) — the 100 TB shape is the fallback,
so it needs the same bit-exact guarantee the oracle gate pins on the
broadcast path at sf0.01."""

import pandas as pd
import pytest

from laketide.functions import tpch
from tests.test_queries_vs_oracle import _canon, _to_pandas

SF = "/root/testdata/sf0.001"

ADAPTIVE = [
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q22_idle_customers",
]


@pytest.mark.parametrize("fn", ADAPTIVE)
def test_fallback_join_matches_broadcast(fn):
    f = getattr(tpch, fn)
    a = _canon(_to_pandas(f(SF)))
    b = _canon(_to_pandas(f(SF, broadcast_budget_rows=0)))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True, obj=fn)


def test_q21_fallback_join_matches_broadcast():
    from laketide.functions.tpch2 import q21_waiting_suppliers

    a = _canon(_to_pandas(q21_waiting_suppliers(SF)))
    b = _canon(_to_pandas(q21_waiting_suppliers(SF, broadcast_budget_rows=0)))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True, obj="q21")


def test_q15_ties_return_all_max_suppliers():
    t = tpch.q15_top_supplier(SF)
    df = _to_pandas(t)
    assert len(df) >= 1
    assert set(df.columns) == {"s_suppkey", "s_name", "total_cents"}
    assert df["total_cents"].nunique() == 1  # all rows share the max


def test_q17_empty_brand_returns_zero_row():
    df = _to_pandas(tpch.q17_small_quantity_revenue(SF, brand="Brand#NOPE"))
    assert len(df) == 1
    assert int(df["total_cents"].iloc[0]) == 0


def test_fk_integrity_audit_fallback_and_planted_orphans(tmp_path):
    """Orphan detection exact on a planted corpus (incl. null keys), and
    the over-budget tagged-union path matches the broadcast path."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from laketide.functions.relational import fk_integrity_audit

    pq.write_table(
        pa.table({"l_orderkey": pa.array([1, 1, 2, 9, None], pa.int64())}),
        tmp_path / "lineitem.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_custkey": pa.array([10, None, 99], pa.int64()),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table({"c_custkey": pa.array([10, 11], pa.int64())}),
        tmp_path / "customer.parquet",
    )
    want = {
        "n_lineitem": 5,
        "n_lineitem_orphans": 2,  # orderkey 9 + the null key
        "n_orders": 3,
        "n_order_orphans": 2,  # custkey 99 + the null key
    }
    for budget in (20_000_000, 0):
        t = fk_integrity_audit(str(tmp_path), broadcast_budget_rows=budget)
        got = {k: t[k][0].as_py() for k in want}
        assert got == want, (budget, got)


def test_attach_by_key_adversarial_shapes():
    """The shared tagged-union lookup join must survive the shapes that
    crash Dataset.join: all-null left keys, empty right side, and keep
    left rows with null values on miss; duplicate right keys resolve to
    ONE value (first by sort), never a row explosion."""
    import pyarrow as pa
    import ray.data as rd

    from laketide.functions.tpch import _attach_by_key

    left = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2, None, 9], pa.int64()),
                "payload": pa.array(["a", "b", "c", "d"], pa.string()),
            }
        )
    )
    right = rd.from_arrow(
        pa.table(
            {
                "rk": pa.array([1, 1, 2], pa.int64()),
                "v": pa.array([10, 11, 20], pa.int64()),
            }
        )
    )
    out = _attach_by_key(
        left,
        [("k", pa.int64()), ("payload", pa.string())],
        "k",
        right,
        "rk",
        [("v", pa.int64())],
    ).to_pandas()
    assert len(out) == 4  # every left row exactly once
    got = {row["payload"]: row["v"] for _, row in out.iterrows()}
    import pandas as pd

    assert got["a"] in (10, 11)  # duplicate right key: one value wins
    assert got["b"] == 20
    assert pd.isna(got["c"]) and pd.isna(got["d"])  # null key + miss -> null

    # empty right side: all left rows survive with null values
    empty_right = rd.from_arrow(
        pa.schema([("rk", pa.int64()), ("v", pa.int64())]).empty_table()
    )
    out2 = _attach_by_key(
        left,
        [("k", pa.int64()), ("payload", pa.string())],
        "k",
        empty_right,
        "rk",
        [("v", pa.int64())],
    ).to_pandas()
    assert len(out2) == 4 and out2["v"].isna().all()


def test_gather_empty_map_is_all_miss():
    """An empty broadcast map must mean 'every probe misses', not an
    ArrowIndexError from take() on clamped positions (reachable via an
    empty filtered-orders window on the q5/q7/q8/q9 broadcast path)."""
    import numpy as np
    import pyarrow as pa

    from laketide.functions.tpch import _gather

    hit, vals = _gather(
        np.array([], np.int64),
        pa.array([], pa.int64()),
        pa.chunked_array([pa.array([1, 2, 3], pa.int64())]),
    )
    assert hit.tolist() == [False, False, False]
    assert vals.null_count == 3


def test_q5_empty_region_returns_empty():
    t = tpch.q5_local_supplier_volume(SF, region="NOWHERE")
    assert t.num_rows == 0


def test_quantile_cont_matches_duckdb_at_sf0001():
    """The interpolation formula must be DuckDB's lo*(1-f) + hi*f —
    lo + (hi-lo)*f diverges in the last ulp exactly at this scale
    (caught by review fuzzing; the sf0.01 oracle gate passed by luck)."""
    import duckdb

    from laketide.functions.analytics import orders_price_quantiles_cont

    got = _to_pandas(orders_price_quantiles_cont(SF))
    want = duckdb.connect().execute(
        "SELECT quantile_cont(c, 0.5) AS p50_cont, quantile_cont(c, 0.9) AS p90_cont "
        "FROM (SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) AS c "
        f"FROM read_parquet('{SF}/orders.parquet') WHERE o_totalprice IS NOT NULL)"
    ).df()
    assert got["p50_cont"].iloc[0] == want["p50_cont"].iloc[0]
    assert got["p90_cont"].iloc[0] == want["p90_cont"].iloc[0]


def test_revenue_pareto_zero_total_emits_one_row(tmp_path):
    """Customers whose cents sum to zero: the oracle's GROUP BY t emits
    ONE (0, 0, 0) row; only an EMPTY per-customer aggregate yields zero
    rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from laketide.functions.analytics import revenue_pareto

    pq.write_table(
        pa.table(
            {
                "o_custkey": pa.array([1, 2], pa.int64()),
                "o_totalprice": pa.array([0.001, 0.002], pa.float64()),
            }
        ),
        tmp_path / "orders.parquet",
    )
    t = revenue_pareto(str(tmp_path))
    assert t.num_rows == 1
    assert t["total_cents"][0].as_py() == 0
    assert t["n_top_customers"][0].as_py() == 0

    pq.write_table(
        pa.table(
            {
                "o_custkey": pa.array([], pa.int64()),
                "o_totalprice": pa.array([], pa.float64()),
            }
        ),
        tmp_path / "orders.parquet",
    )
    assert revenue_pareto(str(tmp_path)).num_rows == 0


def test_attach_by_key_property_vs_pandas_merge():
    """Property check: _attach_by_key == pandas left merge on random
    key/value tables with nulls and misses (right keys unique, as the
    contract requires)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from laketide.functions.tpch import _attach_by_key

    rng = np.random.RandomState(31)
    for trial in range(4):
        n_left = int(rng.randint(1, 200))
        lk = rng.randint(0, 40, size=n_left).astype("float64")
        lk[rng.rand(n_left) < 0.15] = np.nan
        left_df = pd.DataFrame(
            {
                "k": pd.array(
                    [None if np.isnan(x) else int(x) for x in lk], dtype="Int64"
                ),
                "payload": np.arange(n_left, dtype="int64"),
            }
        )
        rkeys = rng.choice(np.arange(0, 50), size=int(rng.randint(1, 30)), replace=False)
        right_df = pd.DataFrame(
            {"rk": rkeys.astype("int64"), "v": (rkeys * 7).astype("int64")}
        )
        got = (
            _attach_by_key(
                rd.from_pandas(left_df),
                [("k", pa.int64()), ("payload", pa.int64())],
                "k",
                rd.from_pandas(right_df),
                "rk",
                [("v", pa.int64())],
            )
            .to_pandas()
            .sort_values("payload")
            .reset_index(drop=True)
        )
        want = (
            left_df.merge(right_df, left_on="k", right_on="rk", how="left")
            .drop(columns=["rk"])
            .sort_values("payload")
            .reset_index(drop=True)
        )
        assert len(got) == len(want), trial
        pd.testing.assert_series_equal(
            got["v"].astype("Float64"),
            want["v"].astype("Float64"),
            check_names=False,
            obj=f"trial{trial}",
        )


def test_q20_drops_suppliers_with_dangling_nationkey(tmp_path):
    """Inner-join semantics on BOTH dims: a supplier with a null or
    dangling s_nationkey must drop (r3 review: the nation-gather hit
    mask was discarded, fabricating a clamped n_name instead)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from laketide.functions.tpch2 import q20_excess_shippers

    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1], pa.int64()),
                "p_type": pa.array(["PROMO"], pa.string()),
            }
        ),
        tmp_path / "part.parquet",
    )
    n = 4
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array([1] * n, pa.int64()),
                "l_suppkey": pa.array([1, 2, 3, 4], pa.int64()),
                "l_quantity": pa.array([100.0, 100.0, 100.0, 1.0]),
                "l_shipdate": pa.array(
                    [pd.Timestamp("1997-06-01")] * n, pa.timestamp("us")
                ),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2, 3], pa.int64()),
                "s_name": pa.array(["S1", "S2", "S3"], pa.string()),
                "s_nationkey": pa.array([0, None, 9], pa.int64()),
            }
        ),
        tmp_path / "supplier.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0, 1], pa.int64()),
                "n_name": pa.array(["NATION_0", "NATION_1"], pa.string()),
            }
        ),
        tmp_path / "nation.parquet",
    )
    t = q20_excess_shippers(str(tmp_path))
    # suppliers 2 (null nationkey), 3 (dangling nationkey=9) and 4
    # (absent from supplier) all drop; only supplier 1 survives
    assert t["s_suppkey"].to_pylist() == [1]
    assert t["n_name"].to_pylist() == ["NATION_0"]


def test_full_outer_join_planted_dangling_and_null_keys(tmp_path):
    """FULL OUTER join corners vs DuckDB on a planted corpus: dangling
    order custkeys (right-only rows), the SQL null-key order GROUP
    (exactly ONE right-only row however many null-key orders exist,
    merged across batches), null-price sums, customers without orders,
    and a null-custkey customer row."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from laketide.functions.relational import customer_orders_full_outer

    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, None], pa.int64()),
                "c_mktsegment": pa.array(["A", "B", "C"], pa.string()),
            }
        ),
        tmp_path / "customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_custkey": pa.array([1, 1, 9, 9, None, None], pa.int64()),
                "o_totalprice": pa.array([10.0, None, 5.5, 1.0, 2.0, 3.0]),
            }
        ),
        tmp_path / "orders.parquet",
    )
    got = (
        customer_orders_full_outer(str(tmp_path))
        .to_pandas()
        .sort_values(["custkey", "n_orders"], na_position="last")
        .reset_index(drop=True)
    )
    want = (
        duckdb.connect()
        .execute(
            "WITH oa AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents "
            f"FROM read_parquet('{tmp_path}/orders.parquet') GROUP BY 1) "
            "SELECT COALESCE(c_custkey, o_custkey) AS custkey, c_mktsegment, "
            "COALESCE(n, 0) AS n_orders, COALESCE(cents, 0) AS total_cents "
            f"FROM read_parquet('{tmp_path}/customer.parquet') "
            "FULL OUTER JOIN oa ON c_custkey = o_custkey"
        )
        .df()
        .sort_values(["custkey", "n_orders"], na_position="last")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) == 5  # 3 customers + dangling 9 + null group
    pd.testing.assert_frame_equal(
        got.astype({"custkey": "Float64"}),
        want.astype({"custkey": "Float64"}),
        check_dtype=False,
        check_exact=True,
    )


def test_join_revenue_fallback_matches_broadcast():
    from laketide.functions.relational import join_orders_lineitem_revenue

    a = _canon(_to_pandas(join_orders_lineitem_revenue(SF)))
    b = _canon(_to_pandas(join_orders_lineitem_revenue(SF, broadcast_budget_rows=0)))
    pd.testing.assert_frame_equal(
        a, b, check_dtype=False, check_exact=True, obj="join_rev"
    )
