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
