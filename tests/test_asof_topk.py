"""Edge-case coverage for the as-of join and per-group top-k operators:
the sf testdata exercises only the happy path (every event has a
preceding order), so this corpus plants the corners — null event ts,
null user_id, null o_custkey / o_orderdate, users with NO orders, events
BEFORE a user's first order, and exact o_orderdate ties (the
deterministic max-orderkey tie-break)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entrymod


@pytest.fixture(scope="module")
def corner_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("asof_sf")
    rng = np.random.RandomState(7)
    n = 300
    base = pd.Timestamp("2024-03-01")
    ts = pd.Series(base + pd.to_timedelta(rng.randint(0, 10**6, size=n), unit="s"))
    ts[rng.rand(n) < 0.07] = pd.NaT
    uid = pd.array(
        [None if rng.rand() < 0.06 else int(rng.randint(0, 30)) for _ in range(n)],
        dtype="Int64",
    )
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": ts,
            "user_id": uid,
            "event_type": [f"t{i % 4}" for i in range(n)],
            "value": rng.rand(n),
            "props": ["p"] * n,
        }
    )
    # planted exact ts-peers for user 8: the SQL RANGE frame includes
    # LATER peers with equal ts — the kernel's peers-after adjustment
    ev.loc[ev.index[:4], "user_id"] = 8
    ev.loc[ev.index[:4], "ts"] = base + pd.Timedelta(seconds=12345)
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False), str(d / "events.parquet"))

    m = 120
    # custkeys 5..24: users 0..4 and 25..29 have NO orders at all
    ck = pd.array(
        [None if rng.rand() < 0.05 else int(5 + rng.randint(0, 20)) for _ in range(m)],
        dtype="Int64",
    )
    # coarse date grid -> plenty of exact o_orderdate ties per custkey
    od = pd.Series(
        base + pd.to_timedelta(rng.randint(0, 12, size=m), unit="D")
    )
    od[rng.rand(m) < 0.05] = pd.NaT
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(m, dtype="int64"),
            "o_custkey": ck,
            "o_orderstatus": ["O"] * m,
            "o_totalprice": np.round(rng.rand(m) * 1000, 2),
            "o_orderdate": od,
            "o_orderpriority": ["1-URGENT"] * m,
        }
    )
    # planted price ties ABOVE the random max (1000) for the top-k
    # tie-break (lowest orderkey wins)
    orders.loc[orders.index[:6], "o_totalprice"] = 5000.0
    orders.loc[orders.index[:6], "o_custkey"] = 7
    pq.write_table(
        pa.Table.from_pandas(orders, preserve_index=False), str(d / "orders.parquet")
    )
    # customers 0..39: 25..39 mostly have NO orders (order custkeys are
    # 5..24) -> the anti join is NON-empty here, unlike the sf tables
    cust = pd.DataFrame(
        {
            "c_custkey": np.arange(40, dtype="int64"),
            "c_name": [f"Customer#{i:09d}" for i in range(40)],
            "c_nationkey": np.zeros(40, dtype="int64"),
            "c_acctbal": np.zeros(40),
            "c_mktsegment": ["BUILDING"] * 40,
        }
    )
    pq.write_table(
        pa.Table.from_pandas(cust, preserve_index=False), str(d / "customer.parquet")
    )
    return str(d)


def _oracle(corner_sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("events", "orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{corner_sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


@pytest.mark.parametrize(
    "name",
    [
        "asof_join_events_orders",
        "top_orders_per_customer",
        "rolling_count_1h",
        "range_join_order_events",
        "customers_with_orders",
        "customers_without_orders",
        "running_value_total",
    ],
)
def test_corner_corpus_matches_oracle(ray_session, corner_sf_dir, name):
    got = _canon(entrymod.queries()[name](corner_sf_dir).to_pandas())
    want = _canon(_oracle(corner_sf_dir, entrymod.oracle_sql()[name]))
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_asof_unmatched_events_keep_null_order_cols(ray_session, corner_sf_dir):
    df = entrymod.queries()["asof_join_events_orders"](corner_sf_dir).to_pandas()
    ev = pd.read_parquet(f"{corner_sf_dir}/events.parquet")
    assert len(df) == len(ev)  # left-join: every event survives
    # users 0..4 / 25..29 have no orders; null ts / null uid never match
    no_order = df[df["user_id"].isin([0, 1, 2, 3, 4, 25, 26, 27, 28, 29])]
    assert len(no_order) > 0 and no_order["asof_orderkey"].isna().all()
    assert df[df["ts"].isna()]["asof_orderkey"].isna().all()
    assert df[df["user_id"].isna()]["asof_orderkey"].isna().all()
    assert df["asof_orderkey"].notna().any()  # and some DO match


def test_topk_price_tie_breaks_to_lowest_orderkey(ray_session, corner_sf_dir):
    df = entrymod.queries()["top_orders_per_customer"](corner_sf_dir).to_pandas()
    # six planted 5000.0-price orders for cust 7: keys 0..5 -> top-3 = 0,1,2
    cust7 = df[df["o_custkey"] == 7].sort_values("o_orderkey")
    planted = cust7[cust7["o_totalprice"] == 5000.0]
    assert list(planted["o_orderkey"]) == [0, 1, 2]
    assert (df.groupby("o_custkey").size() <= 3).all()
