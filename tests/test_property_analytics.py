"""Property suite for the sequence/distinct analytics family: random
small event corpora (ties, null keys, null timestamps, singleton and
empty users) must match the registered DuckDB oracles exactly. One
corpus exercises five pipelines per example to amortize the Ray
pipeline cost."""

import tempfile

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

import __ray_entry__ as entrymod

ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()

_CHECK = [
    "user_event_gaps",
    "mode_event_type_per_user",
    "event_type_transitions",
    "daily_active_users",
    "funnel_view_click_purchase",
    "user_retention_7d",
]


def _compare(name: str, sf_dir: str) -> None:
    res = QUERIES[name](sf_dir)
    ray_df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    duck_df = con.execute(ORACLES[name]).df()
    assert len(ray_df) == len(duck_df), f"{name}: {len(ray_df)} vs {len(duck_df)}"
    if len(duck_df) == 0:
        return
    cols = sorted(duck_df.columns)
    a = ray_df[cols].sort_values(cols).reset_index(drop=True)
    b = duck_df[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        if pd.api.types.is_datetime64_any_dtype(b[c]):
            a[c] = a[c].astype("datetime64[us]")
            b[c] = b[c].astype("datetime64[us]")
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True, obj=name)


@settings(max_examples=6, deadline=None)
@given(data=st.data())
def test_property_analytics_vs_oracle(data):
    rng_seed = data.draw(st.integers(0, 2**31 - 1))
    rng = np.random.RandomState(rng_seed)
    n = data.draw(st.integers(20, 160))
    n_users = data.draw(st.integers(1, 8))
    null_frac = data.draw(st.sampled_from([0.0, 0.1, 0.3]))

    uid = rng.randint(0, n_users, size=n).astype("float64")
    uid[rng.rand(n) < null_frac] = np.nan
    # second resolution with heavy tie probability, ~3 day span
    secs = rng.randint(0, 3 * 86400, size=n)
    secs[rng.rand(n) < 0.3] = 42  # planted ties
    ts = pd.Series(pd.to_datetime("2024-03-01") + pd.to_timedelta(secs, unit="s"))
    ts[rng.rand(n) < null_frac] = pd.NaT
    types = rng.choice(
        ["view", "click", "purchase", "error"], size=n
    ).astype(object)
    types[rng.rand(n) < null_frac] = None
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": ts.astype("datetime64[us]"),
            "user_id": pd.array(
                [None if np.isnan(u) else int(u) for u in uid], dtype="Int64"
            ),
            "event_type": types,
            "value": rng.rand(n) * 50,
            "props": [""] * n,
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.Table.from_pandas(ev, preserve_index=False), f"{d}/events.parquet"
        )
        for name in _CHECK:
            _compare(name, d)
