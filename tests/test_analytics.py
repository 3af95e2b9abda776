"""Unit coverage for the analytics operator family beyond the
oracle-compare suite: HLL accuracy bound, broadcast-join vs shuffle-free
invariants, bottom-k collect associativity."""

import numpy as np
import pyarrow as pa

from laketide.functions import analytics

SF_DIR = "/root/testdata/sf0.01"


def test_hll_within_error_bound():
    """HLL estimate must land within 5% of the exact distinct count
    (standard error at m=4096 is ~1.6%; 5% is > 3 sigma)."""
    import duckdb

    est = analytics.hll_distinct_users(SF_DIR)["n_users_est"][0].as_py()
    exact = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchone()[0]
    assert exact > 0
    assert abs(est - exact) / exact < 0.05, (est, exact)


def test_hll_deterministic():
    a = analytics.hll_distinct_users(SF_DIR)["n_users_est"][0].as_py()
    b = analytics.hll_distinct_users(SF_DIR)["n_users_est"][0].as_py()
    assert a == b


def test_smallest_k_per_key_associative():
    """Pruning per batch then pruning the merged survivors must equal
    the global bottom-k (the combiner contract)."""
    rng = np.random.RandomState(7)
    key = rng.randint(0, 20, size=500)
    val = rng.randint(0, 10**6, size=500)
    t = pa.table({"k": pa.array(key, pa.int64()), "v": pa.array(val, pa.int64())})
    whole = analytics._smallest_k_per_key(t, "k", "v", 5)
    halves = [
        analytics._smallest_k_per_key(t.slice(0, 250), "k", "v", 5),
        analytics._smallest_k_per_key(t.slice(250), "k", "v", 5),
    ]
    merged = analytics._smallest_k_per_key(pa.concat_tables(halves), "k", "v", 5)
    assert whole.sort_by([("k", "ascending"), ("v", "ascending")]).equals(
        merged.sort_by([("k", "ascending"), ("v", "ascending")])
    )


def test_gaps_reduce_matches_pandas():
    """The reduceat gap kernel vs a plain pandas groupby-diff reference
    on a corpus with ties and singleton users."""
    import pandas as pd

    rng = np.random.RandomState(11)
    n = 300
    user = rng.randint(0, 12, size=n)
    ts = rng.randint(0, 10**7, size=n) * 1_000_000  # us
    ts[user == 3] = 42  # one user: all-tied timestamps -> zero gaps
    eid = np.arange(n)
    import laketide.functions.analytics as A

    df = pd.DataFrame({"user_id": user, "ts": pd.to_datetime(ts, unit="us"), "event_id": eid})
    ref = (
        df.sort_values(["user_id", "ts", "event_id"])
        .assign(gap=lambda d: d.groupby("user_id")["ts"].diff().dt.total_seconds() * 1e6)
        .dropna(subset=["gap"])
        .groupby("user_id")["gap"]
        .agg(n_gaps="count", total_gap_us="sum", max_gap_us="max")
        .reset_index()
    )

    import tempfile

    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        ev = pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(user, pa.int64()),
                "event_type": pa.array(["x"] * n),
                "value": pa.array(np.ones(n)),
                "props": pa.array([""] * n),
            }
        )
        pq.write_table(ev, f"{d}/events.parquet")
        got = A.user_event_gaps(d).to_pandas().sort_values("user_id").reset_index(drop=True)
    ref = ref.sort_values("user_id").reset_index(drop=True)
    assert len(got) == len(ref)
    np.testing.assert_array_equal(got["n_gaps"], ref["n_gaps"])
    np.testing.assert_array_equal(got["total_gap_us"], ref["total_gap_us"].astype(np.int64))
    np.testing.assert_array_equal(got["max_gap_us"], ref["max_gap_us"].astype(np.int64))
