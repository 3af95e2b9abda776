"""Relational query operators (SURVEY.md §2.4, §2.6, §2.7 analogs).

Every callable takes ``sf_dir`` and returns a Dataset / Arrow table;
column names match the registered DuckDB oracle SQL exactly (driver
contract). Monetary aggregates are summed as integer cents
(``CAST(ROUND(x*100) AS BIGINT)``) so the float summation order cannot
produce hash mismatches between Ray and DuckDB; per-row double math is
IEEE-identical in both engines.

Reference analogs:
- grouped counts: sql/vulnerabilities.sql:104-120 (A1, A3)
- explode-then-group (unnest + GROUP BY): sql/vulnerabilities.sql:107-113 (A2)
- stats view multi-aggregate: migrations/001_initial_schema.up.sql:132-144 (A4)
- sort + limit listings: sql/vulnerabilities.sql:22-32,122-132 (O1, O2)
- lookup/hash joins: internal/merger/merger.go:74-105 (J1)
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from laketide.functions.reads import collect_tables
from ray.data.aggregate import Count, Max, Min, Sum

_CENTS = dict(ndigits=0, round_mode="half_towards_infinity")  # == DuckDB ROUND


def _adjacent_same(col: pa.ChunkedArray) -> "np.ndarray":
    """Null-safe adjacency equality for a SORTED column: True where
    row i == row i-1, treating null == null as equal. A plain numpy
    ``a[1:] == a[:-1]`` converts null numeric/timestamp keys to NaN and
    NaN != NaN splits every null-key row into its own group (observed:
    duplicate output rows for null keys vs the DuckDB oracle)."""
    import numpy as np

    n = len(col)
    if n <= 1:
        return np.zeros(0, dtype=bool)
    a, b = col.slice(1), col.slice(0, n - 1)
    eq = pc.fill_null(pc.equal(a, b), False)
    both_null = pc.and_(pc.is_null(a), pc.is_null(b))
    return pc.or_(eq, both_null).to_numpy(zero_copy_only=False)


def _segments(col: pa.ChunkedArray) -> tuple:
    """(starts, counts) of the equal-key runs of a SORTED column,
    null-safe (nulls form one run). The shared boundary arithmetic for
    every sorted-segment kernel."""
    import numpy as np

    same = _adjacent_same(col)
    starts = np.concatenate([[0], np.flatnonzero(~same) + 1]).astype(np.int64)
    counts = np.append(starts[1:], len(col)) - starts
    return starts, counts


def keep_extreme(
    t: pa.Table, keys: list[str], order: list[str], keep: str = "last"
) -> pa.Table:
    """Arrow-native per-key winner: sort by ``keys + order`` ascending and
    keep the last (or first) row of each key group — the same sort+mask
    idiom as the engine's ``reduce_events`` (stages/apply.py:103-140).
    No pandas round-trip; works as both the per-batch pre-combiner and
    the per-group final reduce.

    Null order keys always LOSE (DuckDB's NULLS LAST in both ORDER BY
    ASC and DESC): for keep='last' nulls sort to the START so a real
    value wins; Arrow's at_end default would crown the null row."""
    import numpy as np

    if t.num_rows <= 1:
        return t
    # parquet-borne pandas metadata makes Ray's shuffle schema-hash warn
    # (unhashable dict) — drop it, it carries no information here
    t = t.replace_schema_metadata(None)
    t = t.sort_by(
        [(c, "ascending") for c in [*keys, *order]],
        null_placement="at_start" if keep == "last" else "at_end",
    )
    n = t.num_rows
    same = np.ones(n - 1, dtype=bool)
    for k in keys:
        same &= _adjacent_same(t[k].combine_chunks())
    mask = np.ones(n, dtype=bool)
    if keep == "last":
        mask[:-1] = ~same
    else:
        mask[1:] = ~same
    return t.filter(pa.array(mask))


def _cents(expr) -> pa.ChunkedArray:
    """CAST(ROUND(x*100) AS BIGINT) — DuckDB ROUND is half-away-from-zero."""
    return pc.cast(pc.round(pc.multiply(expr, pa.scalar(100.0)), **_CENTS), pa.int64())


def _from_pandas(df: "pd.DataFrame") -> pa.Table:
    """pa.Table.from_pandas WITHOUT the pandas schema metadata: the
    metadata dict makes block schemas unhashable inside Ray's shuffle
    planners ("Failed to hash the schemas" log storms)."""
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def _read(sf_dir: str, name: str, columns: list[str] | None = None) -> rd.Dataset:
    from laketide.functions.reads import scrubbed_read

    return scrubbed_read(f"{sf_dir}/{name}.parquet", columns=columns)


def _key_hash_u64(col: "pa.ChunkedArray") -> "np.ndarray":
    """Null-safe uint64 hash of a key column for coarse partitioning
    (ints: sentinel-filled bit view; strings: pandas' deterministic
    siphash with categorize=False)."""
    import numpy as np

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type) or pa.types.is_temporal(col.type):
        return (
            pc.fill_null(pc.cast(col, pa.int64()), -1)
            .to_numpy(zero_copy_only=False)
            .view(np.uint64)
        )
    return pd.util.hash_array(
        col.to_numpy(zero_copy_only=False), categorize=False
    ).astype(np.uint64)


def _coarse_key_reduce(ds: rd.Dataset, key_cols: list[str], reduce_fn) -> rd.Dataset:
    """Per-key reduce via a COARSE shuffle: pre-reduce each batch, hash
    the key columns mod ~4xCPUs, and run the (multi-key-capable)
    ``reduce_fn`` once per co-located partition — not once per key
    group, which costs ~700us of map_groups UDF overhead PER KEY (the
    dedup multi-bucket lesson). Exact: all rows of a key share its
    coarse partition."""
    from laketide.functions.dedup import _coarse_n_parts, _coarse_parts

    n_parts = _coarse_n_parts()

    def pre(t: pa.Table) -> pa.Table:
        r = reduce_fn(t)
        part = _coarse_parts(
            *[_key_hash_u64(r[k]) for k in key_cols], n_parts=n_parts
        )
        return r.append_column("_cpart", pa.array(part, pa.int64()))

    return (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_cpart")
        .map_groups(
            lambda g: reduce_fn(g.drop_columns(["_cpart"])), batch_format="pyarrow"
        )
    )


# ---------------------------------------------------------------- events CDC
def cdc_lww_latest(sf_dir: str) -> rd.Dataset:
    """Last-writer-wins row per user_id (version = (ts, event_id)) — the
    LWW reduce of the CDC engine applied to the driver's events table.
    Partial reduce per batch, then per-group final reduce (one shuffle)."""
    ds = _read(sf_dir, "events")

    def last_per_user(t: pa.Table) -> pa.Table:
        return keep_extreme(t, ["user_id"], ["ts", "event_id"], keep="last")

    return _coarse_key_reduce(ds, ["user_id"], last_per_user)


def cdc_first_event_per_user_type(sf_dir: str) -> rd.Dataset:
    """Exact dedup: keep the first event per (user_id, event_type) by
    (ts, event_id) — hash-partition + per-group first (reference analog:
    deterministic-key dedup, SURVEY.md §2.5 R1)."""
    ds = _read(sf_dir, "events")

    def first_per(t: pa.Table) -> pa.Table:
        return keep_extreme(t, ["user_id", "event_type"], ["ts", "event_id"], keep="first")

    return _coarse_key_reduce(ds, ["user_id", "event_type"], first_per)


def hwm_per_user(sf_dir: str) -> rd.Dataset:
    """Per-key high-water mark (max ts) + delivered-event count (I3/I4)."""
    return (
        _read(sf_dir, "events", columns=["user_id", "ts"])
        .groupby("user_id")
        .aggregate(Max("ts", alias_name="hwm_ts"), Count(alias_name="n_events"))
    )


def count_events(sf_dir: str) -> pa.Table:
    n = _read(sf_dir, "events", columns=["event_id"]).count()
    return pa.table({"n": pa.array([n], pa.int64())})


def count_by_type(sf_dir: str) -> rd.Dataset:
    return (
        _read(sf_dir, "events", columns=["event_type"])
        .groupby("event_type")
        .aggregate(Count(alias_name="n"))
    )


def events_stats_view(sf_dir: str) -> pa.Table:
    """Multi-aggregate stats view (A4): totals, distinct users, ts range,
    value total in cents — ONE scan and one shuffle: per-user grouped
    aggregates, then per-block partial folds (tiny rows) merged on the
    driver. The old shape scanned the events table twice (once for
    totals, once for the distinct-user count)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def derive(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts": t["ts"],
                "cents": pc.cast(_cents(t["value"]), pa.float64()),
            }
        )

    per_user = (
        ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(
            Count(alias_name="c"),
            Min("ts", alias_name="min_ts"),
            Max("ts", alias_name="max_ts"),
            Sum("cents", alias_name="cents"),
        )
    )

    def fold(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                # count(DISTINCT user_id) semantics: the null-key group
                # is NOT a user
                "users": pa.array(
                    [int(pc.sum(pc.is_valid(t["user_id"])).as_py() or 0)], pa.int64()
                ),
                "n": pa.array([pc.sum(t["c"]).as_py() or 0], pa.int64()),
                "min_ts": pa.array([pc.min(t["min_ts"]).as_py()], pa.timestamp("us")),
                "max_ts": pa.array([pc.max(t["max_ts"]).as_py()], pa.timestamp("us")),
                "cents": pa.array([int(pc.sum(t["cents"]).as_py() or 0)], pa.int64()),
            }
        )

    partials = per_user.map_batches(fold, batch_format="pyarrow").take_all()
    mins = [p["min_ts"] for p in partials if p["min_ts"] is not None]
    maxs = [p["max_ts"] for p in partials if p["max_ts"] is not None]
    return pa.table(
        {
            "n_events": pa.array([sum(p["n"] for p in partials)], pa.int64()),
            "n_users": pa.array([sum(p["users"] for p in partials)], pa.int64()),
            "min_ts": pa.array([min(mins) if mins else None], pa.timestamp("us")),
            "max_ts": pa.array([max(maxs) if maxs else None], pa.timestamp("us")),
            "total_value_cents": pa.array([sum(p["cents"] for p in partials)], pa.int64()),
        }
    )


def recent_events(sf_dir: str) -> rd.Dataset:
    """ORDER BY ts DESC, event_id DESC LIMIT 100 (O1/O2 recency listing)."""
    return _read(sf_dir, "events").sort(["ts", "event_id"], descending=True).limit(100)


def window_counts(sf_dir: str) -> rd.Dataset:
    """Tumbling 1h event-time window counts per event_type (O5 / I1 analog:
    epoch batching as time windows). Pre-aggregated per batch before the
    small groupby shuffle."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def pre(t: pa.Table) -> pa.Table:
        # zero-copy Arrow pre-agg: floor_temporal + native group count
        # (was a pandas dt.floor round-trip, the last pandas conversion
        # in the relational hot paths)
        tmp = pa.table(
            {
                "event_type": t["event_type"],
                "window_start": pc.floor_temporal(t["ts"], unit="hour"),
            }
        )
        out = tmp.group_by(["event_type", "window_start"]).aggregate([([], "count_all")])
        return out.rename_columns(["event_type", "window_start", "n"])

    return (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("n", alias_name="n"))
    )


def value_cents_by_user_type(sf_dir: str) -> rd.Dataset:
    """Pre-aggregated grouped sum (A5 partial+final pattern): per-batch
    partial sums, then the small shuffle."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "value"])

    def pre(t: pa.Table) -> pa.Table:
        tmp = pa.table(
            {
                "user_id": t["user_id"],
                "event_type": t["event_type"],
                "partial": pc.cast(_cents(t["value"]), pa.float64()),
            }
        )
        out = tmp.group_by(["user_id", "event_type"]).aggregate(
            [("partial", "sum"), ([], "count_all")]
        )
        return out.rename_columns(["user_id", "event_type", "partial", "cnt"])

    agg = (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .aggregate(Sum("partial", alias_name="total_value_cents_f"), Sum("cnt", alias_name="n"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_type": t["event_type"],
                "total_value_cents": pc.cast(t["total_value_cents_f"], pa.int64()),
                "n": pc.cast(t["n"], pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------- TPC-H-ish
def q1_pricing(sf_dir: str) -> rd.Dataset:
    """TPC-H Q1-style pricing summary over lineitem (integer-cents exact)."""
    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def pre(t: pa.Table) -> pa.Table:
        rev = _cents(pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])))
        qty = pc.cast(t["l_quantity"], pa.int64())
        tmp = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": pc.cast(qty, pa.float64()),
                "rev": pc.cast(rev, pa.float64()),
            }
        )
        out = tmp.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("rev", "sum"), ([], "count_all")]
        )
        return out.rename_columns(
            ["l_returnflag", "l_linestatus", "qty", "rev", "cnt"]
        )

    agg = (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty_f"),
            Sum("rev", alias_name="rev_f"),
            Sum("cnt", alias_name="n_f"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": pc.cast(t["sum_qty_f"], pa.int64()),
                "revenue_cents": pc.cast(t["rev_f"], pa.int64()),
                "count_order": pc.cast(t["n_f"], pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def top_orders(sf_dir: str) -> rd.Dataset:
    """ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 (O1 top-k)."""
    return (
        _read(sf_dir, "orders")
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(10)
    )


def _head_k_per_key(
    t: pa.Table,
    key: str,
    order: str,
    k: int,
    descending: bool = True,
    tiebreak: str | None = "o_orderkey",
) -> pa.Table:
    """Vectorized per-key top-k (or bottom-k with ``descending=False``):
    one sort (key asc, order desc/asc nulls last, optional tie column
    asc), then rank-within-segment < k via numpy — no per-key Python.
    Associative: applying it per batch and again on the merged
    survivors yields the global per-key top-k."""
    import numpy as np

    if t.num_rows == 0:
        return t
    keys = [(key, "ascending"), (order, "descending" if descending else "ascending")]
    if tiebreak:
        keys.append((tiebreak, "ascending"))
    t = t.sort_by(keys, null_placement="at_end")
    same = _adjacent_same(t[key].combine_chunks())
    n = t.num_rows
    starts = np.concatenate([[0], np.flatnonzero(~same) + 1]).astype(np.int64)
    counts = np.append(starts[1:], n) - starts
    rank = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
    return t.filter(pa.array(rank < k))


def top_orders_per_customer(sf_dir: str, k: int = 3) -> rd.Dataset:
    """Per-group top-k (windowed O1 analog: row_number() <= k per
    partition). Combiner pattern: each batch keeps at most k rows per
    customer BEFORE the shuffle — the exchange carries O(k x customers),
    not the full table — then the co-located groups take the final
    top-k. Ties on price break to the lowest o_orderkey."""
    from laketide.functions.dedup import _coarse_n_parts, _coarse_parts

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    n_parts = _coarse_n_parts()

    def local_prune(t: pa.Table) -> pa.Table:
        # a null customer key is not a group (oracle: WHERE o_custkey IS
        # NOT NULL) — _adjacent_same treats nulls as per-row groups,
        # which would keep EVERY null-key row
        t = t.filter(pc.is_valid(t["o_custkey"]))
        t = _head_k_per_key(t, "o_custkey", "o_totalprice", k)
        part = _coarse_parts(_key_hash_u64(t["o_custkey"]), n_parts=n_parts)
        return t.append_column("part", pa.array(part, pa.int64()))

    def final_k(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [
                    ("o_orderkey", pa.int64()),
                    ("o_custkey", pa.int64()),
                    ("o_totalprice", pa.float64()),
                ]
            ).empty_table()
        return _head_k_per_key(t.drop_columns(["part"]), "o_custkey", "o_totalprice", k)

    return (
        ds.map_batches(local_prune, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(final_k, batch_format="pyarrow")
    )


_PIVOT_TYPES = ("click", "signup", "error", "view", "purchase")


def user_event_pivot(sf_dir: str) -> rd.Dataset:
    """Pivot / wide conditional aggregate: one row per user with a count
    column per event type plus purchase value cents. Per-batch Arrow
    group_by partials over 0/1 indicator columns (the shuffle carries
    ~distinct-users-per-batch rows, not events), then one small grouped
    sum. Null event_type matches no indicator (SQL FILTER semantics);
    empty purchase sums are 0 (oracle COALESCEs)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "value"])

    def pre(t: pa.Table) -> pa.Table:
        cols = {"user_id": t["user_id"]}
        for ty in _PIVOT_TYPES:
            cols[f"n_{ty}"] = pc.fill_null(
                pc.cast(pc.equal(t["event_type"], ty), pa.int64()), 0
            )
        is_purchase = pc.fill_null(pc.equal(t["event_type"], "purchase"), False)
        cents = pc.if_else(
            pc.and_(is_purchase, pc.is_valid(t["value"])),
            _cents(pc.fill_null(t["value"], 0.0)),
            pa.scalar(0, pa.int64()),
        )
        cols["purchase_cents"] = cents
        names = [f"n_{ty}" for ty in _PIVOT_TYPES] + ["purchase_cents"]
        g = (
            pa.table(cols)
            .group_by(["user_id"])
            .aggregate([(n, "sum") for n in names])
        )
        return g.rename_columns(["user_id", *names])

    aggs = [
        Sum(f"n_{ty}", alias_name=f"n_{ty}") for ty in _PIVOT_TYPES
    ] + [Sum("purchase_cents", alias_name="purchase_cents")]
    return (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(*aggs)
    )


def running_value_total(sf_dir: str) -> rd.Dataset:
    """Expanding window / running total: cumulative value cents per user
    in (ts, event_id) order — SQL ``SUM(...) OVER (PARTITION BY user_id
    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)``. Coarse
    co-partition by user hash, one lexsort per group, then a global
    cumsum minus each segment's starting offset — fully vectorized,
    no per-user loop. Null value adds 0 (SQL SUM skips nulls); null ts
    sorts first (DuckDB ASC NULLS FIRST inside window ORDER BY is NOT
    the default — we pin NULLS FIRST in the oracle to match Arrow's
    at_start placement)."""
    import numpy as np

    from laketide.functions.dedup import _coarse_n_parts, _coarse_parts

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    n_parts = _coarse_n_parts()

    def with_part(t: pa.Table) -> pa.Table:
        # null users excluded on both sides (oracle WHERE user_id IS NOT
        # NULL): _adjacent_same splits null keys per-row, SQL PARTITION
        # BY pools them — neither is obviously right for a running total
        t = t.filter(pc.is_valid(t["user_id"]))
        part = _coarse_parts(_key_hash_u64(t["user_id"]), n_parts=n_parts)
        return t.append_column("part", pa.array(part, pa.int64()))

    def running_group(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [
                    ("event_id", pa.int64()),
                    ("user_id", pa.int64()),
                    ("running_cents", pa.int64()),
                ]
            ).empty_table()
        t = t.drop_columns(["part"]).sort_by(
            [
                ("user_id", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ],
            null_placement="at_start",
        )
        n = t.num_rows
        cents = (
            pc.fill_null(_cents(pc.fill_null(t["value"], 0.0)), 0)
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        cum = np.cumsum(cents)
        same = _adjacent_same(t["user_id"].combine_chunks())
        starts = np.concatenate([[0], np.flatnonzero(~same) + 1]).astype(np.int64)
        counts = np.append(starts[1:], n) - starts
        # subtract the cumulative total just before each segment start
        base = np.where(starts > 0, cum[starts - 1], 0)
        running = cum - np.repeat(base, counts)
        return pa.table(
            {
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "running_cents": pa.array(running, pa.int64()),
            }
        )

    return (
        ds.map_batches(with_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(running_group, batch_format="pyarrow")
    )


def _count_grouping_sets(sf_dir: str, coarse_levels: tuple[str, ...]) -> rd.Dataset:
    """Shared ROLLUP/CUBE cascade over (user_id, event_type) counts: the
    finest level is the ONLY pass over the events (per-batch Arrow
    partials, one small shuffle); every coarser grouping set in
    ``coarse_levels`` plus the grand total re-aggregates the SMALL
    finest result, so the big input is read once. NULL markers fill the
    aggregated-away columns, like the SQL. Assumes non-null grouping
    keys (a genuine NULL key would be indistinguishable from a marker
    without GROUPING() — same caveat as plain SQL ROLLUP/CUBE output)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def pre(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"user_id": t["user_id"], "event_type": t["event_type"]})
            .group_by(["user_id", "event_type"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["user_id", "event_type", "c"])

    finest = (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "event_type"])
        .aggregate(Sum("c", alias_name="n"))
        # the SMALL finest level feeds every consumer — materialize once
        .materialize()
    )

    def _level(keep: str) -> rd.Dataset:
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "user_id": pc.cast(t[keep], pa.int64())
                    if keep == "user_id"
                    else pa.nulls(t.num_rows, pa.int64()),
                    "event_type": pc.cast(t[keep], pa.string())
                    if keep == "event_type"
                    else pa.nulls(t.num_rows, pa.string()),
                    "n": pc.cast(t["n"], pa.int64()),
                }
            )

        return (
            finest.groupby(keep)
            .aggregate(Sum("n", alias_name="n"))
            .map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
        )

    total = int(finest.sum("n") or 0)
    grand = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.nulls(1, pa.int64()),
                "event_type": pa.nulls(1, pa.string()),
                "n": pa.array([total], pa.int64()),
            }
        )
    )

    def conform(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "event_type": pc.cast(t["event_type"], pa.string()),
                "n": pc.cast(t["n"], pa.int64()),
            }
        )

    out = finest.map_batches(conform, batch_format="pyarrow", zero_copy_batch=True)
    for keep in coarse_levels:
        out = out.union(_level(keep))
    return out.union(grand)


def events_rollup(sf_dir: str) -> rd.Dataset:
    """GROUP BY ROLLUP(user_id, event_type): counts at (user, type),
    (user), and the grand total (see ``_count_grouping_sets``)."""
    return _count_grouping_sets(sf_dir, ("user_id",))


def events_cube(sf_dir: str) -> rd.Dataset:
    """GROUP BY CUBE(user_id, event_type): the rollup's grouping sets
    plus the (event_type) axis (see ``_count_grouping_sets``)."""
    return _count_grouping_sets(sf_dir, ("user_id", "event_type"))


def _customer_order_membership(sf_dir: str, keep_members: bool) -> rd.Dataset:
    """Shared semi/anti join core: customer keys vs the set of custkeys
    appearing in orders. Each batch of orders pre-dedups its keys
    (combiner), both sides co-partition by a coarse key hash, and one
    np.isin per co-located group decides membership — a single shuffle
    of pre-deduplicated keys, no row-payload exchange, no broadcast
    (both sides may be huge at scale)."""
    import numpy as np

    from laketide.functions.dedup import _coarse_n_parts, _coarse_parts

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders", columns=["o_custkey"])
    n_parts = _coarse_n_parts()

    def tag_cust(t: pa.Table) -> pa.Table:
        key = pc.cast(t["c_custkey"], pa.int64())
        part = _coarse_parts(_key_hash_u64(key), n_parts=n_parts)
        return pa.table(
            {
                "part": pa.array(part, pa.int64()),
                "key": key,
                "c_name": t["c_name"],
                "side": pa.array(np.zeros(t.num_rows, dtype=np.int8), pa.int8()),
            }
        )

    def tag_orders(t: pa.Table) -> pa.Table:
        # per-batch dedup: the shuffle carries distinct keys only
        key = pc.unique(
            pc.drop_null(pc.cast(t["o_custkey"], pa.int64()).combine_chunks())
        )
        part = _coarse_parts(_key_hash_u64(key), n_parts=n_parts)
        n = len(key)
        return pa.table(
            {
                "part": pa.array(part, pa.int64()),
                "key": key,
                "c_name": pa.nulls(n, pa.string()),
                "side": pa.array(np.ones(n, dtype=np.int8), pa.int8()),
            }
        )

    tagged = cust.map_batches(
        tag_cust, batch_format="pyarrow", zero_copy_batch=True
    ).union(orders.map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True))

    def member_group(t: pa.Table) -> pa.Table:
        empty = pa.schema(
            [("c_custkey", pa.int64()), ("c_name", pa.string())]
        ).empty_table()
        if t.num_rows == 0:
            return empty
        sides = t["side"].combine_chunks().to_numpy(zero_copy_only=False)
        cust_rows = t.filter(pa.array(sides == 0))
        if cust_rows.num_rows == 0:
            return empty
        okeys = (
            t.filter(pa.array(sides == 1))["key"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        ckeys = cust_rows["key"].combine_chunks().to_numpy(zero_copy_only=False)
        member = np.isin(ckeys, okeys)
        keep = cust_rows.filter(pa.array(member if keep_members else ~member))
        return pa.table({"c_custkey": keep["key"], "c_name": keep["c_name"]})

    return tagged.groupby("part").map_groups(member_group, batch_format="pyarrow")


def customers_with_orders(sf_dir: str) -> rd.Dataset:
    """Semi join (EXISTS): customers that placed at least one order."""
    return _customer_order_membership(sf_dir, keep_members=True)


def customers_without_orders(sf_dir: str) -> rd.Dataset:
    """Anti join (NOT EXISTS): customers with no orders at all."""
    return _customer_order_membership(sf_dir, keep_members=False)


def rolling_count_1h(sf_dir: str) -> rd.Dataset:
    """Range-based rolling window aggregate (O5 extension): for every
    event, how many events the SAME user produced in the trailing hour,
    inclusive of the event itself — SQL
    ``count(*) OVER (PARTITION BY user_id ORDER BY ts RANGE BETWEEN
    INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)``.

    Plan: coarse co-partition by user hash, then ONE cython-level
    ``groupby().rolling('1h', closed='both')`` per co-located group (no
    per-user Python), plus a vectorized peers-after adjustment: the SQL
    RANGE frame ends at the LAST ts-peer, while pandas rolling ends at
    the current row. Null-ts rows are excluded (their RANGE frame is
    the null-peer group, a different query); null user_id is ONE
    partition, like SQL PARTITION BY."""
    import numpy as np

    from laketide.functions.dedup import _coarse_n_parts, _coarse_parts

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    n_parts = _coarse_n_parts()

    def with_part(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["ts"]))
        part = _coarse_parts(_key_hash_u64(t["user_id"]), n_parts=n_parts)
        return t.append_column("part", pa.array(part, pa.int64()))

    def roll_group(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [
                    ("event_id", pa.int64()),
                    ("user_id", pa.int64()),
                    ("ts", pa.timestamp("us")),
                    ("n_last_hour", pa.int64()),
                ]
            ).empty_table()
        df = t.drop_columns(["part"]).to_pandas()
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable").reset_index(
            drop=True
        )
        base = (
            df.set_index("ts")
            .groupby("user_id", dropna=False)["event_id"]
            .rolling("1h", closed="both")
            .count()
        )
        # group order == frame order (pre-sorted by user_id, NaN last),
        # so positional alignment is exact
        df["n_last_hour"] = base.to_numpy().astype(np.int64)
        g = df.groupby(["user_id", "ts"], dropna=False)
        sizes = g["event_id"].transform("size").to_numpy()
        pos = g.cumcount().to_numpy()
        df["n_last_hour"] += sizes - 1 - pos
        return pa.table(
            {
                "event_id": pa.array(df["event_id"], pa.int64()),
                "user_id": pa.Array.from_pandas(df["user_id"], type=pa.int64()),
                "ts": pa.Array.from_pandas(df["ts"], type=pa.timestamp("us")),
                "n_last_hour": pa.array(df["n_last_hour"], pa.int64()),
            }
        )

    return (
        ds.map_batches(with_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(roll_group, batch_format="pyarrow")
    )


def orders_by_status(sf_dir: str) -> rd.Dataset:
    return (
        _read(sf_dir, "orders", columns=["o_orderstatus"])
        .groupby("o_orderstatus")
        .aggregate(Count(alias_name="n"))
    )


def join_customer_orders(sf_dir: str) -> rd.Dataset:
    """Broadcast lookup join (J1 pattern: small side shipped once, probed
    per batch) — orders ⟕ customer on custkey, grouped by market segment."""
    cust = (
        _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
        .to_pandas()
        .set_index("c_custkey")["c_mktsegment"]
    )
    import ray

    cust_ref = ray.put(cust)

    def probe(t: pa.Table) -> pa.Table:
        # plain task: the broadcast side is a cheap local object-store
        # read per batch; an actor pool pays ~1.5s startup per query
        cust_map = ray.get(cust_ref)
        seg = (
            pd.Series(t["o_custkey"].to_pandas()).map(cust_map).fillna("UNKNOWN").to_numpy()
        )
        cents = pc.cast(_cents(t["o_totalprice"]), pa.float64())
        df = pd.DataFrame({"c_mktsegment": seg, "cents": cents.to_numpy(), "one": 1})
        out = df.groupby("c_mktsegment", as_index=False, dropna=False).agg(
            cents=("cents", "sum"), n=("one", "sum")
        )
        return _from_pandas(out)

    agg = (
        _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
        .map_batches(probe, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Sum("cents", alias_name="cents_f"), Sum("n", alias_name="n_f"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": t["c_mktsegment"],
                "total_cents": pc.cast(t["cents_f"], pa.int64()),
                "n_orders": pc.cast(t["n_f"], pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def join_orders_lineitem_revenue(
    sf_dir: str, broadcast_budget_rows: int = 5_000_000
) -> rd.Dataset:
    """Revenue per order status: lineitem ⋈ orders on orderkey. ADAPTIVE
    (footer-derived budget, the q3/q10 idiom): under the budget the
    (orderkey -> status) map broadcasts once via ray.put and the
    lineitem scan never shuffles at all — the whole query becomes one
    streaming pass plus a tiny status aggregate (measured 3.4s -> ~1s
    at sf0.1: Dataset.join costs ~2.6s fixed). Over the budget, the
    large-large Ray Dataset hash join (partitioned on the key) with a
    per-batch revenue combiner before the exchange — the 100 TB path."""
    import pyarrow.parquet as _pq

    import ray

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def pre_li(t: pa.Table) -> pa.Table:
        # partial combiner BEFORE the join shuffle: collapse the ~4
        # lineitems per order inside each batch (integer cents as f64)
        rev = _cents(pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])))
        tmp = pa.table({"l_orderkey": t["l_orderkey"], "rev": pc.cast(rev, pa.float64())})
        out = tmp.group_by(["l_orderkey"]).aggregate([("rev", "sum")])
        return out.rename_columns(["l_orderkey", "rev"])

    n_orders = _pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows
    if n_orders <= broadcast_budget_rows:
        ot = _pq.read_table(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderstatus"]
        ).replace_schema_metadata(None)
        ot = ot.filter(pc.is_valid(ot["o_orderkey"])).sort_by(
            [("o_orderkey", "ascending")]
        )
        keys = pc.cast(ot["o_orderkey"], pa.int64()).to_numpy(zero_copy_only=False)
        status = ot["o_orderstatus"].combine_chunks()
        o_ref = ray.put((keys, status))

        def rev_by_status(t: pa.Table) -> pa.Table:
            t = pre_li(t)
            keys_, status_ = ray.get(o_ref)
            hit, pos = _sorted_member(keys_, t["l_orderkey"].combine_chunks())
            st = (
                status_.take(pa.array(pos, pa.int64()))
                if len(keys_)
                else pa.nulls(t.num_rows, pa.string())
            )
            out = (
                pa.table({"o_orderstatus": st, "rev": t["rev"]})
                .filter(pa.array(hit))  # inner-join semantics
                .group_by(["o_orderstatus"])
                .aggregate([("rev", "sum")])
            )
            return out.rename_columns(["o_orderstatus", "rev"])

        partials = li.map_batches(
            rev_by_status, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        li_partial = li.map_batches(pre_li, batch_format="pyarrow", zero_copy_batch=True)
        orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"])
        joined = li_partial.join(
            orders,
            join_type="inner",
            num_partitions=16,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )

        def pre(t: pa.Table) -> pa.Table:
            out = (
                t.select(["o_orderstatus", "rev"])
                .group_by(["o_orderstatus"])
                .aggregate([("rev", "sum")])
            )
            return out.rename_columns(["o_orderstatus", "rev"])

        partials = joined.map_batches(pre, batch_format="pyarrow")

    agg = partials.groupby("o_orderstatus").aggregate(Sum("rev", alias_name="rev_f"))
    return agg.map_batches(
        lambda t: pa.table(
            {"o_orderstatus": t["o_orderstatus"], "revenue_cents": pc.cast(t["rev_f"], pa.int64())}
        ),
        batch_format="pyarrow",
    )


def _sorted_member(keys, col: pa.ChunkedArray):
    """(hit_mask, clamped_positions) of ``col`` values in a SORTED
    int key array — the broadcast semi-filter core (null-safe: null
    values never match, even when the fill value collides with a real
    key). One shared implementation for every broadcast lookup."""
    import numpy as np

    valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
    vals = pc.fill_null(col, 0).to_numpy(zero_copy_only=False)
    if len(keys) == 0:
        z = np.zeros(len(vals), dtype=bool)
        return z, np.zeros(len(vals), dtype=np.int64)
    pos = np.minimum(np.searchsorted(keys, vals), len(keys) - 1)
    return valid & (keys[pos] == vals), pos


_Q3_CUTOFF = "1998-06-01"


def q3_shipping_priority(
    sf_dir: str, broadcast_budget_rows: int = 5_000_000
) -> pa.Table:
    """TPC-H Q3-style shipping-priority pipeline: segment-filtered
    customers (broadcast key set) prune the orders scan, date filters
    prune both scans, a per-batch revenue combiner collapses lineitems,
    and the top-10 is per-batch pruned then driver-merged — no global
    sort. ADAPTIVE join (the repo's broadcast-or-shuffle pattern): the
    filtered orders side is usually tiny after the segment + date
    predicates, so under the budget it is broadcast once via ray.put
    and the lineitem scan never shuffles at all (one tiny grouped-sum
    exchange of order partials); a hash join is the fallback when the
    filtered side is large."""
    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    cutoff = pa.scalar(pd.Timestamp(_Q3_CUTOFF), pa.timestamp("us"))

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    def ckeys(t: pa.Table) -> pa.Table:
        m = pc.fill_null(pc.equal(t["c_mktsegment"], "BUILDING"), False)
        return t.filter(m).select(["c_custkey"])

    ck_parts = collect_tables(cust.map_batches(ckeys, batch_format="pyarrow"))
    ckeys_np = (
        np.sort(pa.concat_tables(ck_parts)["c_custkey"].to_numpy(zero_copy_only=False))
        if ck_parts
        else np.array([], np.int64)
    )
    keys_ref = ray.put(ckeys_np)

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def o_filter(t: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        m = pc.fill_null(pc.less(t["o_orderdate"], cutoff), False)
        t = t.filter(m)
        hit, _ = _sorted_member(keys, t["o_custkey"].combine_chunks())
        return t.filter(pa.array(hit)).select(["o_orderkey", "o_orderdate"])

    o_f = orders.map_batches(
        o_filter, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    )

    def li_partial(t: pa.Table, okeys: "np.ndarray | None" = None) -> pa.Table:
        m = pc.fill_null(pc.greater(t["l_shipdate"], cutoff), False)
        t = t.filter(m)
        if okeys is not None:  # broadcast semi-filter: only surviving orders
            hit, _ = _sorted_member(okeys, t["l_orderkey"].combine_chunks())
            t = t.filter(pa.array(hit))
        rev = _cents(
            pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        )
        tmp = pa.table(
            {"l_orderkey": t["l_orderkey"], "rev": pc.cast(rev, pa.float64())}
        )
        g = tmp.group_by(["l_orderkey"]).aggregate([("rev", "sum")])
        return g.rename_columns(["l_orderkey", "rev"])

    if o_f.count() <= broadcast_budget_rows:
        # broadcast path: no lineitem shuffle, no join actors
        o_parts = collect_tables(o_f)
        ot = (
            pa.concat_tables(o_parts).sort_by([("o_orderkey", "ascending")])
            if o_parts
            else pa.schema(
                [("o_orderkey", pa.int64()), ("o_orderdate", pa.timestamp("us"))]
            ).empty_table()
        )
        okeys = ot["o_orderkey"].to_numpy(zero_copy_only=False) if ot.num_rows else np.array([], np.int64)
        okeys_ref = ray.put(okeys)

        def li_b(t: pa.Table) -> pa.Table:
            return li_partial(t, ray.get(okeys_ref))

        per_order = (
            li.map_batches(li_b, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("l_orderkey")
            .aggregate(Sum("rev", alias_name="rev_f"))
        )
        dates = ot["o_orderdate"] if ot.num_rows else pa.chunked_array([pa.array([], pa.timestamp("us"))])

        def attach_date(m: pa.Table) -> pa.Table:
            pos = np.searchsorted(
                okeys, m["l_orderkey"].to_numpy(zero_copy_only=False)
            )
            return m.append_column("o_orderdate", dates.take(pa.array(pos, pa.int64())))
    else:
        joined = li.map_batches(
            li_partial, batch_format="pyarrow", zero_copy_batch=True
        ).join(
            o_f,
            join_type="inner",
            num_partitions=16,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
        per_order = joined.groupby("l_orderkey").aggregate(
            Sum("rev", alias_name="rev_f"), Max("o_orderdate", alias_name="o_orderdate")
        )
        attach_date = None

    def local_top(t: pa.Table) -> pa.Table:
        t = t.sort_by([("rev_f", "descending"), ("l_orderkey", "ascending")])
        return t.slice(0, 10)

    tops = collect_tables(
            per_order.map_batches(local_top, batch_format="pyarrow")
        )
    if not tops:
        return pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("revenue_cents", pa.int64()),
                ("o_orderdate", pa.timestamp("us")),
            ]
        ).empty_table()
    merged = (
        pa.concat_tables(tops)
        .sort_by([("rev_f", "descending"), ("l_orderkey", "ascending")])
        .slice(0, 10)
    )
    if attach_date is not None:  # broadcast path: date joined on the final 10
        merged = attach_date(merged)
    return pa.table(
        {
            "l_orderkey": merged["l_orderkey"],
            "revenue_cents": pc.cast(merged["rev_f"], pa.int64()),
            "o_orderdate": pc.cast(merged["o_orderdate"], pa.timestamp("us")),
        }
    )


_Q6_LO, _Q6_HI = "1997-01-01", "1998-01-01"


def q6_forecast_revenue(sf_dir: str) -> pa.Table:
    """TPC-H Q6-style forecast-revenue scan: date range + discount band
    + quantity cap, per-batch scalar partials — a pure filter+aggregate
    with NO shuffle (each batch emits one int64 partial; the driver
    sums a handful of rows). Reference analog: the filtered stats-view
    counts (migrations/001_initial_schema.up.sql:132-144)."""
    lo = pa.scalar(pd.Timestamp(_Q6_LO), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp(_Q6_HI), pa.timestamp("us"))
    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )

    def pre(t: pa.Table) -> pa.Table:
        m = pc.and_kleene(
            pc.and_kleene(pc.greater_equal(t["l_shipdate"], lo), pc.less(t["l_shipdate"], hi)),
            pc.and_kleene(
                pc.and_kleene(
                    pc.greater_equal(t["l_discount"], pa.scalar(0.05)),
                    pc.less_equal(t["l_discount"], pa.scalar(0.07)),
                ),
                pc.less(t["l_quantity"], pa.scalar(24.0)),
            ),
        )
        t = t.filter(pc.fill_null(m, False))
        rev = _cents(pc.multiply(t["l_extendedprice"], t["l_discount"]))
        s = pc.sum(rev).as_py()
        return pa.table({"p": pa.array([int(s or 0)], pa.int64())})

    total = ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True).sum("p")
    return pa.table({"revenue_cents": pa.array([int(total or 0)], pa.int64())})


_Q10_LO, _Q10_HI = "1997-01-01", "1997-04-01"


def q10_returned_items(sf_dir: str, broadcast_budget_rows: int = 5_000_000) -> pa.Table:
    """TPC-H Q10-style returned-item report: top-20 customers by revenue
    lost to returns in one quarter. ADAPTIVE join (the repo's
    broadcast-or-shuffle pattern): the quarter-filtered orders side is
    broadcast under a row budget (sorted key array + positional custkey
    gather — the lineitem scan never shuffles), hash join as fallback.
    Per-customer revenue partials collapse per batch BEFORE the one
    tiny grouped sum; top-20 is per-batch pruned + driver merged (no
    global sort); names attach via a semi-filtered customer scan on
    only the final 20 keys."""
    import numpy as np
    import ray

    lo = pa.scalar(pd.Timestamp(_Q10_LO), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp(_Q10_HI), pa.timestamp("us"))

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def o_filter(t: pa.Table) -> pa.Table:
        m = pc.and_kleene(
            pc.greater_equal(t["o_orderdate"], lo), pc.less(t["o_orderdate"], hi)
        )
        return t.filter(pc.fill_null(m, False)).select(["o_orderkey", "o_custkey"])

    o_f = orders.map_batches(
        o_filter, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )

    def li_rev(t: pa.Table) -> pa.Table:
        m = pc.fill_null(pc.equal(t["l_returnflag"], "R"), False)
        t = t.filter(m)
        rev = _cents(
            pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        )
        return pa.table(
            {"l_orderkey": t["l_orderkey"], "rev": pc.cast(rev, pa.float64())}
        )

    if o_f.count() <= broadcast_budget_rows:
        o_parts = collect_tables(o_f)
        ot = (
            pa.concat_tables(o_parts).sort_by([("o_orderkey", "ascending")])
            if o_parts
            else pa.schema(
                [("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]
            ).empty_table()
        )
        okeys = (
            ot["o_orderkey"].to_numpy(zero_copy_only=False)
            if ot.num_rows
            else np.array([], np.int64)
        )
        ocust = (
            ot["o_custkey"].to_numpy(zero_copy_only=False)
            if ot.num_rows
            else np.array([], np.int64)
        )
        bc_ref = ray.put((okeys, ocust))

        def li_partial(t: pa.Table) -> pa.Table:
            keys, cust = ray.get(bc_ref)
            r = li_rev(t)
            hit, pos = _sorted_member(keys, r["l_orderkey"].combine_chunks())
            r = pa.table(
                {
                    "o_custkey": pa.array(cust[pos[hit]], pa.int64()),
                    "rev": r["rev"].filter(pa.array(hit)),
                }
            )
            g = r.group_by(["o_custkey"]).aggregate([("rev", "sum")])
            return g.rename_columns(["o_custkey", "rev"])

        per_cust = (
            li.map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("o_custkey")
            .aggregate(Sum("rev", alias_name="rev_f"))
        )
    else:

        def li_partial_j(t: pa.Table) -> pa.Table:
            r = li_rev(t)
            g = r.group_by(["l_orderkey"]).aggregate([("rev", "sum")])
            return g.rename_columns(["l_orderkey", "rev"])

        per_cust = (
            li.map_batches(li_partial_j, batch_format="pyarrow", zero_copy_batch=True)
            .join(
                o_f,
                join_type="inner",
                num_partitions=16,
                on=("l_orderkey",),
                right_on=("o_orderkey",),
            )
            .groupby("o_custkey")
            .aggregate(Sum("rev", alias_name="rev_f"))
        )

    def local_top(t: pa.Table) -> pa.Table:
        t = t.sort_by([("rev_f", "descending"), ("o_custkey", "ascending")])
        return t.slice(0, 20)

    tops = collect_tables(
            per_cust.map_batches(local_top, batch_format="pyarrow")
        )
    empty = pa.schema(
        [("c_custkey", pa.int64()), ("c_name", pa.string()), ("revenue_cents", pa.int64())]
    ).empty_table()
    if not tops:
        return empty
    merged = (
        pa.concat_tables(tops)
        .sort_by([("rev_f", "descending"), ("o_custkey", "ascending")])
        .slice(0, 20)
    )
    final_keys = np.sort(merged["o_custkey"].to_numpy(zero_copy_only=False))
    keys_ref = ray.put(final_keys)

    def name_filter(t: pa.Table) -> pa.Table:
        hit, _ = _sorted_member(ray.get(keys_ref), t["c_custkey"].combine_chunks())
        return t.filter(pa.array(hit))

    name_parts = collect_tables(
            _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
            .map_batches(name_filter, batch_format="pyarrow", zero_copy_batch=True)

        )
    names = (
        pa.concat_tables(name_parts).sort_by([("c_custkey", "ascending")])
        if name_parts
        else empty.select(["c_custkey", "c_name"])
    )
    nk = names["c_custkey"].to_numpy(zero_copy_only=False)
    pos = np.searchsorted(nk, merged["o_custkey"].to_numpy(zero_copy_only=False))
    return pa.table(
        {
            "c_custkey": pc.cast(merged["o_custkey"], pa.int64()),
            "c_name": names["c_name"].take(pa.array(pos, pa.int64())),
            "revenue_cents": pc.cast(merged["rev_f"], pa.int64()),
        }
    )


_Q4_LO, _Q4_HI = "1997-01-01", "1997-04-01"


def q4_order_priority(sf_dir: str, broadcast_budget_rows: int = 20_000_000) -> pa.Table:
    """TPC-H Q4-style priority check: orders in one quarter with an
    EXISTS lineitem probe (returned line as the late-line analog —
    this dataset has no commit/receipt dates), counted per priority.
    The semi-join side is reduced to DISTINCT keys per batch BEFORE the
    exchange; under the row budget the key set is broadcast (sorted
    array + searchsorted membership — the orders scan never shuffles),
    else a distinct-key shuffle + hash join. Per-batch priority count
    partials collapse before the tiny final groupby."""
    import numpy as np
    import ray

    lo = pa.scalar(pd.Timestamp(_Q4_LO), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp(_Q4_HI), pa.timestamp("us"))

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"])

    def li_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.fill_null(pc.equal(t["l_returnflag"], "R"), False))
        g = t.select(["l_orderkey"]).group_by(["l_orderkey"]).aggregate([])
        return g

    keys_ds = li.map_batches(
        li_keys, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def o_filter(t: pa.Table) -> pa.Table:
        m = pc.and_kleene(
            pc.greater_equal(t["o_orderdate"], lo), pc.less(t["o_orderdate"], hi)
        )
        return t.filter(pc.fill_null(m, False)).select(["o_orderkey", "o_orderpriority"])

    if keys_ds.count() <= broadcast_budget_rows:
        kparts = collect_tables(keys_ds)
        keys = (
            np.unique(
                pa.concat_tables(kparts)["l_orderkey"].to_numpy(zero_copy_only=False)
            )
            if kparts
            else np.array([], np.int64)
        )
        keys_ref = ray.put(keys)

        def count_pre(t: pa.Table) -> pa.Table:
            t = o_filter(t)
            hit, _ = _sorted_member(ray.get(keys_ref), t["o_orderkey"].combine_chunks())
            t = t.filter(pa.array(hit))
            g = t.group_by(["o_orderpriority"]).aggregate([([], "count_all")])
            return g.rename_columns(["o_orderpriority", "c"])

        counted = orders.map_batches(
            count_pre, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        # per-batch distinct is NOT globally distinct — a key seen in two
        # batches would join (and count) twice; one grouped pass dedups
        from ray.data.aggregate import Count

        uniq_keys = (
            keys_ds.groupby("l_orderkey")
            .aggregate(Count(alias_name="_c"))
            .select_columns(["l_orderkey"])
        )
        joined = orders.map_batches(
            o_filter, batch_format="pyarrow", zero_copy_batch=True
        ).join(
            uniq_keys,
            join_type="inner",
            num_partitions=16,
            on=("o_orderkey",),
            right_on=("l_orderkey",),
        )

        def count_j(t: pa.Table) -> pa.Table:
            g = t.group_by(["o_orderpriority"]).aggregate([([], "count_all")])
            return g.rename_columns(["o_orderpriority", "c"])

        counted = joined.map_batches(count_j, batch_format="pyarrow")

    agg = (
        counted.groupby("o_orderpriority")
        .aggregate(Sum("c", alias_name="n"))
        .sort("o_orderpriority")
    )
    parts = collect_tables(agg)
    if not parts:
        return pa.schema(
            [("o_orderpriority", pa.string()), ("n_orders", pa.int64())]
        ).empty_table()
    t = pa.concat_tables(parts)
    return pa.table(
        {"o_orderpriority": t["o_orderpriority"], "n_orders": pc.cast(t["n"], pa.int64())}
    )


_Q12_LO, _Q12_HI = "1997-01-01", "1998-01-01"
_HIGH_PRIORITIES = ("1-URGENT", "2-HIGH")


def q12_line_priority(
    sf_dir: str, broadcast_budget_rows: int = 20_000_000
) -> pa.Table:
    """TPC-H Q12-style conditional aggregation: shipped lines in one
    year, counted per l_linestatus split by the order's priority class
    (high = 1-URGENT/2-HIGH). Under the budget the orders side collapses
    to a broadcast (sorted keys, is_high bitmap) — the lineitem scan
    emits 3-column partials and never shuffles; else lineitem pre-aggs
    (orderkey, linestatus) counts before a hash join."""
    import numpy as np
    import ray

    lo = pa.scalar(pd.Timestamp(_Q12_LO), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp(_Q12_HI), pa.timestamp("us"))
    out_schema = pa.schema(
        [
            ("l_linestatus", pa.string()),
            ("high_line_count", pa.int64()),
            ("low_line_count", pa.int64()),
        ]
    )

    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_linestatus", "l_shipdate"]
    )

    def li_filter(t: pa.Table) -> pa.Table:
        m = pc.and_kleene(
            pc.greater_equal(t["l_shipdate"], lo), pc.less(t["l_shipdate"], hi)
        )
        return t.filter(pc.fill_null(m, False)).select(["l_orderkey", "l_linestatus"])

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])

    def hl_partial(keyed: pa.Table, is_high: "np.ndarray") -> pa.Table:
        hi_i = is_high.astype(np.int64)
        tmp = pa.table(
            {
                "l_linestatus": keyed["l_linestatus"],
                "h": pa.array(hi_i * keyed["c"].to_numpy(zero_copy_only=False)
                              if "c" in keyed.column_names else hi_i),
                "l": pa.array((1 - hi_i) * keyed["c"].to_numpy(zero_copy_only=False)
                              if "c" in keyed.column_names else 1 - hi_i),
            }
        )
        g = tmp.group_by(["l_linestatus"]).aggregate([("h", "sum"), ("l", "sum")])
        return g.rename_columns(["l_linestatus", "h", "l"])

    if orders.count() <= broadcast_budget_rows:
        oparts = collect_tables(orders)
        if oparts:
            ot = pa.concat_tables(oparts)
            ok = ot["o_orderkey"].to_numpy(zero_copy_only=False)
            order_idx = np.argsort(ok)
            ok = ok[order_idx]
            high = (
                pc.is_in(
                    ot["o_orderpriority"],
                    value_set=pa.array(_HIGH_PRIORITIES, pa.string()),
                )
                .to_numpy(zero_copy_only=False)[order_idx]
            )
        else:
            ok, high = np.array([], np.int64), np.array([], bool)
        bc = ray.put((ok, high))

        def pre(t: pa.Table) -> pa.Table:
            keys, is_high = ray.get(bc)
            t = li_filter(t)
            hit, pos = _sorted_member(keys, t["l_orderkey"].combine_chunks())
            t = t.filter(pa.array(hit))
            return hl_partial(t, is_high[pos[hit]])

        partials = li.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
    else:

        def li_pre(t: pa.Table) -> pa.Table:
            t = li_filter(t)
            g = t.group_by(["l_orderkey", "l_linestatus"]).aggregate([([], "count_all")])
            return g.rename_columns(["l_orderkey", "l_linestatus", "c"])

        joined = li.map_batches(
            li_pre, batch_format="pyarrow", zero_copy_batch=True
        ).join(
            orders,
            join_type="inner",
            num_partitions=16,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )

        def post(t: pa.Table) -> pa.Table:
            is_high = pc.is_in(
                t["o_orderpriority"], value_set=pa.array(_HIGH_PRIORITIES, pa.string())
            ).to_numpy(zero_copy_only=False)
            return hl_partial(t, is_high)

        partials = joined.map_batches(post, batch_format="pyarrow")

    agg = (
        partials.groupby("l_linestatus")
        .aggregate(Sum("h", alias_name="hs"), Sum("l", alias_name="ls"))
        .sort("l_linestatus")
    )
    parts = collect_tables(agg)
    if not parts:
        return out_schema.empty_table()
    t = pa.concat_tables(parts)
    return pa.table(
        {
            "l_linestatus": t["l_linestatus"],
            "high_line_count": pc.cast(t["hs"], pa.int64()),
            "low_line_count": pc.cast(t["ls"], pa.int64()),
        }
    )


def customer_order_counts(sf_dir: str) -> rd.Dataset:
    """LEFT OUTER join + grouped count: every customer with its order
    count, zero-filled for customers that never ordered. One shuffle of
    pre-aggregated partials (orders pre-count per batch; customers ship
    bare keys), tagged-union co-partition by coarse key hash, then one
    vectorized sorted-member lookup per co-located group — both sides
    may be huge, nothing is broadcast. Null customer keys can't match
    (SQL ON-null semantics) and are emitted zero-count before the
    exchange."""
    import numpy as np

    from laketide.functions.dedup import _coarse_n_parts, _coarse_parts

    n_parts = _coarse_n_parts()
    out_schema = pa.schema([("c_custkey", pa.int64()), ("n_orders", pa.int64())])

    def tag_cust(t: pa.Table) -> pa.Table:
        key = pc.drop_null(pc.cast(t["c_custkey"], pa.int64()).combine_chunks())
        part = _coarse_parts(_key_hash_u64(key), n_parts=n_parts)
        n_null = t.num_rows - len(key)
        out = pa.table(
            {
                "part": pa.array(part, pa.int64()),
                "key": key,
                "c": pa.array(np.zeros(len(key), dtype=np.int64)),
                "side": pa.array(np.zeros(len(key), dtype=np.int8), pa.int8()),
            }
        )
        if n_null:
            # null keys join nothing: short-circuit them to part -1,
            # emitted as zero-count rows by the -1 group
            out = pa.concat_tables(
                [
                    out,
                    pa.table(
                        {
                            "part": pa.array([-1] * n_null, pa.int64()),
                            "key": pa.array([None] * n_null, pa.int64()),
                            "c": pa.array([0] * n_null, pa.int64()),
                            "side": pa.array([0] * n_null, pa.int8()),
                        }
                    ),
                ]
            )
        return out

    def tag_orders(t: pa.Table) -> pa.Table:
        key = pc.drop_null(pc.cast(t["o_custkey"], pa.int64()).combine_chunks())
        g = pa.table({"key": key}).group_by(["key"]).aggregate([([], "count_all")])
        g = g.rename_columns(["key", "c"])
        part = _coarse_parts(
            _key_hash_u64(g["key"].combine_chunks()), n_parts=n_parts
        )
        return pa.table(
            {
                "part": pa.array(part, pa.int64()),
                "key": g["key"],
                "c": pc.cast(g["c"], pa.int64()),
                "side": pa.array(np.ones(g.num_rows, dtype=np.int8), pa.int8()),
            }
        )

    cust = _read(sf_dir, "customer", columns=["c_custkey"]).map_batches(
        tag_cust, batch_format="pyarrow", zero_copy_batch=True
    )
    orders = _read(sf_dir, "orders", columns=["o_custkey"]).map_batches(
        tag_orders, batch_format="pyarrow", zero_copy_batch=True
    )

    def final(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        side = g["side"].to_numpy(zero_copy_only=False)
        cust_t = g.filter(pa.array(side == 0))
        ord_t = g.filter(pa.array(side == 1))
        agg = (
            ord_t.select(["key", "c"]).group_by(["key"]).aggregate([("c", "sum")])
        ).sort_by([("key", "ascending")])
        keys = agg["key"].to_numpy(zero_copy_only=False)
        sums = pc.cast(agg["c_sum"], pa.int64()).to_numpy(zero_copy_only=False)
        hit, pos = _sorted_member(keys, cust_t["key"].combine_chunks())
        n = np.zeros(cust_t.num_rows, dtype=np.int64)
        n[hit] = sums[pos[hit]]
        return pa.table(
            {"c_custkey": cust_t["key"], "n_orders": pa.array(n)}
        )

    return cust.union(orders).groupby("part").map_groups(
        final, batch_format="pyarrow"
    )


def q18_large_orders(sf_dir: str, min_qty: float = 150.0, k: int = 20) -> pa.Table:
    """TPC-H Q18-style large-volume orders: per-order quantity sums
    (per-batch partials, one shuffle), HAVING > min_qty, top-k by
    quantity — then the TINY winner set is broadcast back to
    semi-filter the orders and customer scans (no second shuffle).
    l_quantity values are small integers in double form, so float
    partial sums are exact in any combine order."""
    import numpy as np
    import ray

    from laketide.functions.dedup import _coarse_n_parts, _coarse_parts

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    n_parts = _coarse_n_parts()

    def qty_pre(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["l_orderkey"]))
        g = t.group_by(["l_orderkey"]).aggregate([("l_quantity", "sum")])
        g = g.rename_columns(["l_orderkey", "qty"])
        part = _coarse_parts(
            _key_hash_u64(g["l_orderkey"].combine_chunks()), n_parts=n_parts
        )
        return g.append_column("_cpart", pa.array(part, pa.int64()))

    def part_top(g: pa.Table) -> pa.Table:
        # one Arrow group-sum + HAVING + local top-k per COARSE partition
        # (a per-orderkey Ray hash aggregate over ~N/4 distinct keys was
        # the whole query's bottleneck: 3.7s of 9s at sf0.1)
        out_s = pa.schema([("l_orderkey", pa.int64()), ("qty_s", pa.float64())])
        if g.num_rows == 0 or "l_orderkey" not in g.column_names:
            return out_s.empty_table()
        s = (
            g.drop_columns(["_cpart"])
            .group_by(["l_orderkey"])
            .aggregate([("qty", "sum")])
            .rename_columns(["l_orderkey", "qty_s"])
        )
        s = s.filter(pc.greater(s["qty_s"], pa.scalar(float(min_qty))))
        s = s.sort_by([("qty_s", "descending"), ("l_orderkey", "ascending")])
        return s.slice(0, k).cast(out_s)

    tops = collect_tables(
            li.map_batches(qty_pre, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("_cpart")
            .map_groups(part_top, batch_format="pyarrow")

        )
    empty = pa.schema(
        [
            ("c_custkey", pa.int64()),
            ("c_name", pa.string()),
            ("o_orderkey", pa.int64()),
            ("o_orderdate", pa.timestamp("us")),
            ("total_cents", pa.int64()),
            ("total_qty", pa.int64()),
        ]
    ).empty_table()
    if not tops:
        return empty
    win = (
        pa.concat_tables(tops)
        .sort_by([("qty_s", "descending"), ("l_orderkey", "ascending")])
        .slice(0, k)
    )
    okeys = np.sort(win["l_orderkey"].to_numpy(zero_copy_only=False))
    ok_ref = ray.put(okeys)

    def o_sel(t: pa.Table) -> pa.Table:
        hit, _ = _sorted_member(ray.get(ok_ref), t["o_orderkey"].combine_chunks())
        return t.filter(pa.array(hit))

    o_parts = collect_tables(
            _read(
                sf_dir,
                "orders",
                columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
            )
            .map_batches(o_sel, batch_format="pyarrow", zero_copy_batch=True)

        )
    if not o_parts:
        return empty
    od = pa.concat_tables(o_parts).sort_by([("o_orderkey", "ascending")])
    ckeys = np.unique(od["o_custkey"].to_numpy(zero_copy_only=False))
    ck_ref = ray.put(ckeys)

    def c_sel(t: pa.Table) -> pa.Table:
        hit, _ = _sorted_member(ray.get(ck_ref), t["c_custkey"].combine_chunks())
        return t.filter(pa.array(hit))

    c_parts = collect_tables(
            _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
            .map_batches(c_sel, batch_format="pyarrow", zero_copy_batch=True)

        )
    names = (
        pa.concat_tables(c_parts).sort_by([("c_custkey", "ascending")])
        if c_parts
        else empty.select(["c_custkey", "c_name"])
    )
    # assemble the k final rows driver-side (all three pieces are tiny)
    opos = np.searchsorted(
        od["o_orderkey"].to_numpy(zero_copy_only=False),
        win["l_orderkey"].to_numpy(zero_copy_only=False),
    )
    cust = od["o_custkey"].take(pa.array(opos, pa.int64()))
    npos = np.searchsorted(
        names["c_custkey"].to_numpy(zero_copy_only=False),
        cust.to_numpy(zero_copy_only=False),
    )
    return pa.table(
        {
            "c_custkey": pc.cast(cust, pa.int64()),
            "c_name": names["c_name"].take(pa.array(npos, pa.int64())),
            "o_orderkey": pc.cast(win["l_orderkey"], pa.int64()),
            "o_orderdate": pc.cast(
                od["o_orderdate"].take(pa.array(opos, pa.int64())), pa.timestamp("us")
            ),
            "total_cents": pc.cast(_cents(od["o_totalprice"].take(pa.array(opos, pa.int64()))), pa.int64()),
            "total_qty": pc.cast(win["qty_s"], pa.int64()),
        }
    )


def top_customers_by_spend(sf_dir: str) -> rd.Dataset:
    """Grouped sum -> broadcast name lookup -> top-20 (O1 + J1 + A5)."""
    spend = (
        _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
        .map_batches(
            lambda t: pa.table(
                {"o_custkey": t["o_custkey"], "cents": pc.cast(_cents(t["o_totalprice"]), pa.float64())}
            ),
            batch_format="pyarrow",
        )
        .groupby("o_custkey")
        .aggregate(Sum("cents", alias_name="cents_f"), Count(alias_name="n_f"))
    )
    import ray

    # broadcast the name map (ray.put once, local object-store read per
    # batch) — a closure capture would ship the whole Series with every
    # task spec at larger scale factors
    cust_ref = ray.put(
        _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
        .to_pandas()
        .set_index("c_custkey")["c_name"]
    )

    def finish(t: pa.Table) -> pa.Table:
        cust = ray.get(cust_ref)
        keys = t["o_custkey"].to_pandas()
        return pa.table(
            {
                "c_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "c_name": pa.array(keys.map(cust).tolist(), pa.string()),
                "total_cents": pc.cast(t["cents_f"], pa.int64()),
                "n_orders": pc.cast(t["n_f"], pa.int64()),
            }
        )

    return (
        spend.map_batches(finish, batch_format="pyarrow")
        .sort(["total_cents", "c_custkey"], descending=[True, False])
        .limit(20)
    )


def lineitem_multikey_sort(sf_dir: str) -> rd.Dataset:
    """Multi-key sort + limit (O4 queue-ordering analog)."""
    return (
        _read(
            sf_dir,
            "lineitem",
            columns=["l_orderkey", "l_linenumber", "l_shipdate", "l_returnflag", "l_quantity"],
        )
        .sort(["l_shipdate", "l_orderkey", "l_linenumber"], descending=[True, False, False])
        .limit(50)
    )


# ------------------------------------------------- projections / set ops
def distinct_event_types(sf_dir: str) -> rd.Dataset:
    """DISTINCT via groupby (A4 COUNT(DISTINCT ...) building block)."""
    return (
        _read(sf_dir, "events", columns=["event_type"])
        .groupby("event_type")
        .aggregate(Count(alias_name="_c"))
        .select_columns(["event_type"])
    )


def events_since(sf_dir: str) -> rd.Dataset:
    """Time-window + predicate filter + recency listing (O2 analog:
    'updated since T'). Predicate is pushed into the parquet scan."""
    import pyarrow.dataset as pds

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
        filter=(pds.field("event_type") == "purchase"),
    )

    def since(t: pa.Table) -> pa.Table:
        cutoff = pa.scalar(pd.Timestamp("2024-01-15 00:00:00"), pa.timestamp("us"))
        return t.filter(pc.greater_equal(t["ts"], cutoff))

    return (
        ds.map_batches(since, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["ts", "event_id"], descending=True)
        .limit(50)
    )


def orders_union(sf_dir: str) -> rd.Dataset:
    """Dataset.union of two filtered scans (multiset semantics, like SQL
    UNION ALL)."""
    big = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice", "o_orderstatus"])
    a = big.map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], 150000.0)).select(["o_orderkey"]),
        batch_format="pyarrow",
    )
    b = big.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderstatus"], "F")).select(["o_orderkey"]),
        batch_format="pyarrow",
    )
    return a.union(b)


def lww_longest_props(sf_dir: str) -> rd.Dataset:
    """Alternate pluggable merge strategy (reference R6: longer-details
    wins, then recency): winner per user_id = longest props, tie-broken
    by (ts, event_id) recency."""
    ds = _read(sf_dir, "events")

    def best(t: pa.Table) -> pa.Table:
        t = t.append_column(
            "_l", pc.cast(pc.utf8_length(t["props"]), pa.int64()).combine_chunks()
        )
        out = keep_extreme(t, ["user_id"], ["_l", "ts", "event_id"], keep="last")
        return out.drop_columns(["_l"])

    return _coarse_key_reduce(ds, ["user_id"], best)


# Deterministic keyword-rule table for the any-overlap join (reference
# J1 variant: `aliases && $1::text[]` array-overlap best-match,
# sql/vulnerabilities.sql:7-17). Lowest priority wins, ties by rule_id.
OVERLAP_RULES = (
    (1, "join", 10),
    (2, "sort", 20),
    (3, "window", 30),
    (4, "stream", 40),
    (5, "dup", 5),
)


def lookup_join_overlap(sf_dir: str) -> rd.Dataset:
    """Any-overlap lookup join, best-match wins: a document matches a
    rule when ANY of its tokens equals the rule's token (the reference's
    array-overlap `aliases && $1` match); the lowest-priority rule wins
    per document (best-rank reduce).

    Shape: explode tokens inside map_batches, C-level hash merge against
    the (broadcast-sized) rule table, per-batch best-rank reduce. Each
    parquet row is one whole document, so the reduce completes within
    the batch — zero shuffles. A large rule table would move to ray.put
    + the same merge."""
    rules = pd.DataFrame(
        list(OVERLAP_RULES), columns=["rule_id", "token", "priority"]
    )
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def match(t: pa.Table) -> pa.Table:
        import numpy as np

        toks = pc.split_pattern(t["text"], " ")
        # null text -> null length -> NaN counts crash np.repeat; a null
        # document simply contributes zero tokens (oracle emits no rows)
        counts = (
            pc.fill_null(pc.cast(pc.list_value_length(toks), pa.int64()), 0)
            .to_numpy(zero_copy_only=False)
        )
        flat = pc.list_flatten(toks).to_pandas()
        doc = np.repeat(
            t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64), counts
        )
        df = pd.DataFrame({"doc_id": doc, "token": flat}).merge(rules, on="token")
        if df.empty:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "rule_id": pa.array([], pa.int64())}
            )
        win = (
            df.sort_values(["doc_id", "priority", "rule_id"])
            .groupby("doc_id", as_index=False)
            .head(1)
        )
        return pa.table(
            {
                "doc_id": pa.array(win["doc_id"].to_numpy(), pa.int64()),
                "rule_id": pa.array(win["rule_id"].to_numpy(), pa.int64()),
            }
        )

    return ds.map_batches(match, batch_format="pyarrow", zero_copy_batch=True)


def _fieldwise_fold_inputs(t: pa.Table):
    """(last_value_cents, last_props) derived fold columns shared by the
    coalesce- and priority-fieldwise queries: value in integer cents for
    non-view events else NULL; props kept only when longer than 40 chars
    else NULL. The null branches are pa.nulls ARRAYS, not
    pa.scalar(None): pyarrow 16 ``if_else`` emits a corrupt binary array
    ("First or last binary offset out of bounds") when the string data
    arg is a non-zero-offset slice (Ray's zero-copy block slices at
    sf>=0.1) and the else arg is a null SCALAR — regression-tested on a
    sliced table in tests/test_analytics.py."""
    v = pc.if_else(
        pc.not_equal(t["event_type"], "view"),
        _cents(t["value"]),
        pa.scalar(None, pa.int64()),
    )
    p = pc.if_else(
        pc.greater(pc.utf8_length(t["props"]), 40),
        t["props"],
        pa.nulls(t.num_rows, pa.string()),
    )
    return v, p


def cdc_coalesce_fieldwise(sf_dir: str) -> rd.Dataset:
    """Field-wise coalesce merge (reference R4/R5, merger.go:231-316)
    surfaced as a query: per user_id in version order (ts, event_id),
    each derived nullable column keeps its NEWEST NON-NULL value while
    the version advances to the newest event — the same fold the
    engine's merge='coalesce' strategy applies per key.

    The per-batch pre-reduce keeps REAL event rows — the group's newest
    row plus, per fold column, the newest row where that column is
    non-null (<= 3 rows per key per batch). Discarded rows can never win
    any column, so the reduction is associative regardless of how Ray
    blocks the input; the final grouped fold then constructs the
    field-wise winner."""
    ds = _read(sf_dir, "events")

    def derive(t: pa.Table) -> pa.Table:
        v, p = _fieldwise_fold_inputs(t)
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts": t["ts"],
                "event_id": t["event_id"],
                "last_value_cents": v,
                "last_props": p,
            }
        )

    fold_cols = ["last_value_cents", "last_props"]

    def _group_layout(t: pa.Table):
        import numpy as np

        n = t.num_rows
        same = _adjacent_same(t["user_id"].combine_chunks())
        starts = np.concatenate([[0], np.flatnonzero(~same) + 1]).astype(np.int64)
        ends = np.append(starts[1:], n) - 1
        return starts, ends

    def _best_per_col(t: pa.Table, name: str, starts):
        import numpy as np

        col = t[name].combine_chunks()
        idx = np.arange(t.num_rows, dtype=np.int64)
        cand = np.where(
            pc.is_valid(col).to_numpy(zero_copy_only=False), idx, np.int64(-1)
        )
        return col, np.maximum.reduceat(cand, starts)

    def prereduce(t: pa.Table) -> pa.Table:
        """Keep real rows only: newest per key + newest-non-null per fold
        column — associative under any batch split."""
        import numpy as np

        if t.num_rows <= 1:
            return t
        t = t.sort_by(
            [("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")]
        )
        starts, ends = _group_layout(t)
        keep = np.zeros(t.num_rows, dtype=bool)
        keep[ends] = True
        for name in fold_cols:
            _, best = _best_per_col(t, name, starts)
            keep[best[best >= 0]] = True
        return t.filter(pa.array(keep))

    def fold(t: pa.Table) -> pa.Table:
        import numpy as np

        if t.num_rows <= 1:
            return t
        t = t.sort_by(
            [("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")]
        )
        starts, ends = _group_layout(t)
        cols = {}
        for name in ("user_id", "ts", "event_id"):
            cols[name] = t[name].combine_chunks().take(pa.array(ends))
        for name in fold_cols:
            col, best = _best_per_col(t, name, starts)
            cols[name] = col.take(
                pa.array([int(b) if b >= 0 else None for b in best], pa.int64())
            )
        return pa.table(cols)

    return (
        ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(prereduce, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(fold, batch_format="pyarrow")
    )


def cdc_priority_fieldwise(sf_dir: str) -> rd.Dataset:
    """Priority merge (the reference R2 literal, merger.go:124-228)
    surfaced as a query: per user_id, a fixed rank on event_type
    (purchase=1 > click=2 > view=3, else 999 — the OSV>GitLab>CVE
    analog) decides each field's winner REGARDLESS of arrival: per
    fold column the first non-null value by (rank asc, ts desc,
    event_id desc) wins, while the version columns (ts, event_id)
    still advance to the newest event — the same fold the engine's
    merge='priority' strategy applies per key.

    Same associative shape as ``cdc_coalesce_fieldwise``: the
    per-batch pre-reduce keeps REAL rows only — the newest row per key
    plus, per fold column, the best-(rank, version)-ranked non-null
    row (min over an encoded score, associative under any split)."""
    from laketide.stages.apply import _best_field_idx

    ds = _read(sf_dir, "events")

    def derive(t: pa.Table) -> pa.Table:
        rank = pc.case_when(
            pc.make_struct(
                pc.equal(t["event_type"], "purchase"),
                pc.equal(t["event_type"], "click"),
                pc.equal(t["event_type"], "view"),
            ),
            1, 2, 3, 999,
        )
        v, p = _fieldwise_fold_inputs(t)
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts": t["ts"],
                "event_id": t["event_id"],
                "rank": pc.cast(pc.fill_null(rank, 999), pa.int64()),
                "best_value_cents": v,
                "best_props": p,
            }
        )

    fold_cols = ["best_value_cents", "best_props"]

    def _layout(t: pa.Table):
        import numpy as np

        n = t.num_rows
        same = _adjacent_same(t["user_id"].combine_chunks())
        starts = np.concatenate([[0], np.flatnonzero(~same) + 1]).astype(np.int64)
        ends = np.append(starts[1:], n) - 1
        return starts, ends

    def _fold(t: pa.Table, keep_only: bool) -> pa.Table:
        import numpy as np

        if keep_only and t.num_rows <= 1:
            return t
        if t.num_rows == 0:
            return t.select(["user_id", "ts", "event_id"] + fold_cols)
        if t.num_rows == 1:
            return t.select(["user_id", "ts", "event_id"] + fold_cols)
        # version-ascending sort: position idx encodes (ts, event_id)
        # order, so the shared _best_field_idx score (rank asc, idx
        # desc) IS (rank asc, ts desc, event_id desc)
        t = t.sort_by(
            [("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")]
        )
        starts, ends = _layout(t)
        ranks = t["rank"].combine_chunks().to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        idx = np.arange(t.num_rows, dtype=np.int64)
        if keep_only:
            keep = np.zeros(t.num_rows, dtype=bool)
            keep[ends] = True
            for name in fold_cols:
                valid = pc.is_valid(t[name].combine_chunks()).to_numpy(
                    zero_copy_only=False
                )
                best = _best_field_idx(valid, idx, starts, ranks)
                keep[best[best >= 0]] = True
            return t.filter(pa.array(keep))
        cols = {}
        for name in ("user_id", "ts", "event_id"):
            cols[name] = t[name].combine_chunks().take(pa.array(ends))
        for name in fold_cols:
            col = t[name].combine_chunks()
            valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
            best = _best_field_idx(valid, idx, starts, ranks)
            cols[name] = col.take(
                pa.array([int(b) if b >= 0 else None for b in best], pa.int64())
            )
        return pa.table(cols)

    return (
        ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(lambda t: _fold(t, True), batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(lambda t: _fold(t, False), batch_format="pyarrow")
    )


def session_counts(sf_dir: str, gap_minutes: int = 30) -> rd.Dataset:
    """Session windows (streaming-shaped op): per user, consecutive
    events within ``gap_minutes`` belong to one session. Returns
    (user_id, n_sessions, n_events). Ordering is partition-local: events
    sort by (ts, event_id) inside each user's group only."""
    import numpy as np

    from laketide.functions.dedup import _coarse_n_parts, _coarse_parts

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])
    n_parts = _coarse_n_parts()
    gap_us = np.int64(gap_minutes) * 60 * 1_000_000

    def with_part(t: pa.Table) -> pa.Table:
        # all of a user's events co-locate under one coarse partition
        part = _coarse_parts(_key_hash_u64(t["user_id"]), n_parts=n_parts)
        return t.append_column("user_part", pa.array(part, pa.int64()))

    def sessions_multi(t: pa.Table) -> pa.Table:
        # one lexsort per co-located partition, every user segment
        # processed vectorized (the dedup multi-bucket pattern) — not
        # one pandas UDF invocation per user
        t = t.drop_columns(["user_part"])
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_sessions": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        t = t.sort_by(
            [("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")]
        )
        n = t.num_rows
        same = _adjacent_same(t["user_id"].combine_chunks())
        ts_col = pc.cast(t["ts"], pa.timestamp("us")).combine_chunks()
        ts_valid = pc.is_valid(ts_col).to_numpy(zero_copy_only=False)
        ts = (
            ts_col.to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        # the oracle's lag(ts) gap is NULL when either side is null ->
        # no new session (null ts becomes INT64_MIN and a raw diff wraps
        # to a huge positive, spuriously opening one)
        gap_ok = ts_valid[1:] & ts_valid[:-1]
        new_sess = np.empty(n, dtype=bool)
        new_sess[0] = True
        new_sess[1:] = (~same) | (gap_ok & ((ts[1:] - ts[:-1]) > gap_us))
        starts = np.concatenate([[0], np.flatnonzero(~same) + 1]).astype(np.int64)
        ends = np.append(starts[1:], n)
        uid = t["user_id"].combine_chunks().take(pa.array(starts))
        return pa.table(
            {
                "user_id": pc.cast(uid, pa.int64()),
                "n_sessions": pa.array(
                    np.add.reduceat(new_sess.astype(np.int64), starts), pa.int64()
                ),
                "n_events": pa.array(ends - starts, pa.int64()),
            }
        )

    return (
        ds.map_batches(with_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_part")
        .map_groups(sessions_multi, batch_format="pyarrow")
    )


def revenue_by_region(sf_dir: str) -> rd.Dataset:
    """TPC-H Q5-style multi-way join: lineitem ⋈ orders ⋈ customer ⋈
    nation ⋈ region, revenue per region. Strategy mirrors a real planner:
    the big-big join (lineitem ⋈ orders) uses the hash-partitioned
    Dataset.join; the dimension chain (customer -> nation -> region) is a
    broadcast map composed driver-side (J1 small-side pattern)."""
    import ray

    # dimension chain read driver-side: three distributed scans cost
    # ~0.5s fixed execution overhead EACH for dimension-sized tables
    import pyarrow.parquet as pq

    def _pq(name: str, cols: list[str]):
        return (
            pq.read_table(f"{sf_dir}/{name}.parquet", columns=cols)
            .replace_schema_metadata(None)
            .to_pandas()
        )

    cust = _pq("customer", ["c_custkey", "c_nationkey"])
    nation = _pq("nation", ["n_nationkey", "n_regionkey"])
    region = _pq("region", ["r_regionkey", "r_name"])
    dim = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey").merge(
        region, left_on="n_regionkey", right_on="r_regionkey"
    )[["c_custkey", "r_name"]]
    # broadcast as (sorted key array, value array): pc.index_in + take is
    # a vectorized Arrow lookup, no per-row pandas dict map
    cust_to_region = ray.put(
        (
            pa.array(dim["c_custkey"].to_numpy(), pa.int64()),
            pa.array(dim["r_name"], pa.string()),
        )
    )

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def pre_li(t: pa.Table) -> pa.Table:
        rev = _cents(pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])))
        tmp = pa.table({"l_orderkey": t["l_orderkey"], "rev": pc.cast(rev, pa.float64())})
        out = tmp.group_by(["l_orderkey"]).aggregate([("rev", "sum")])
        return out.rename_columns(["l_orderkey", "rev"])

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    joined = li.map_batches(pre_li, batch_format="pyarrow", zero_copy_batch=True).join(
        orders,
        join_type="inner",
        num_partitions=16,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def to_region(t: pa.Table) -> pa.Table:
        # plain task (not an actor pool): join aggregator actors already
        # hold CPUs, and ray.get on a broadcast ref is a cheap local
        # object-store read per batch
        keys, vals = ray.get(cust_to_region)
        idx = pc.index_in(pc.cast(t["o_custkey"], pa.int64()), value_set=keys)
        tmp = pa.table({"r_name": pc.take(vals, idx), "rev": t["rev"]})
        out = tmp.group_by(["r_name"]).aggregate([("rev", "sum")])
        return out.rename_columns(["r_name", "rev"])

    agg = (
        joined.map_batches(to_region, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Sum("rev", alias_name="rev_f"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {"r_name": t["r_name"], "revenue_cents": pc.cast(t["rev_f"], pa.int64())}
        ),
        batch_format="pyarrow",
    )


def fk_integrity_audit(
    sf_dir: str, broadcast_budget_rows: int = 20_000_000
) -> pa.Table:
    """Referential-integrity audit — the data-quality gate an ingest
    pipeline runs before publishing: counts of lineitem rows whose
    orderkey matches no order and order rows whose custkey matches no
    customer (null keys are orphans: a NOT EXISTS probe can never
    match them), plus the scanned totals. Key sets broadcast as sorted
    arrays under a row budget (counting needs ONE bit per probe row —
    the q4 semi-join shape); above it each probe runs through the
    schema-safe tagged-union lookup join and counts null markers."""
    import numpy as np
    import ray

    def _orphan_count(
        probe: rd.Dataset, probe_key: str, keys_ds: rd.Dataset, key_col: str, n_keys: int
    ) -> tuple:
        """(n_probe_rows, n_orphans) — adaptive semi-anti count."""
        if n_keys <= broadcast_budget_rows:
            kparts = collect_tables(keys_ds)
            keys = (
                np.unique(
                    pc.drop_null(
                        pa.concat_tables(
                            [p.replace_schema_metadata(None) for p in kparts]
                        )[key_col].combine_chunks()
                    ).to_numpy(zero_copy_only=False)
                )
                if kparts
                else np.array([], np.int64)
            )
            keys_ref = ray.put(keys)

            def count_pre(t: pa.Table) -> pa.Table:
                hit, _ = _sorted_member(
                    ray.get(keys_ref), t[probe_key].combine_chunks()
                )
                return pa.table(
                    {
                        "n": pa.array([t.num_rows], pa.int64()),
                        "orphans": pa.array([int((~hit).sum())], pa.int64()),
                    }
                )

            agg = probe.map_batches(
                count_pre, batch_format="pyarrow", zero_copy_batch=True
            ).sum(["n", "orphans"])
            return int(agg["sum(n)"] or 0), int(agg["sum(orphans)"] or 0)

        from laketide.functions.tpch import _attach_by_key

        marked = keys_ds.map_batches(
            lambda t: pa.table(
                {
                    key_col: t[key_col],
                    "hit": pa.array([1] * t.num_rows, pa.int8()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        attached = _attach_by_key(
            probe,
            [(probe_key, pa.int64())],
            probe_key,
            marked,
            key_col,
            [("hit", pa.int8())],
        )

        def count_post(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "hit" not in t.column_names:
                return pa.table(
                    {"n": pa.array([0], pa.int64()), "orphans": pa.array([0], pa.int64())}
                )
            miss = pc.is_null(t["hit"])
            return pa.table(
                {
                    "n": pa.array([t.num_rows], pa.int64()),
                    "orphans": pa.array([int(pc.sum(pc.cast(miss, pa.int64())).as_py() or 0)], pa.int64()),
                }
            )

        agg = attached.map_batches(count_post, batch_format="pyarrow").sum(
            ["n", "orphans"]
        )
        return int(agg["sum(n)"] or 0), int(agg["sum(orphans)"] or 0)

    import pyarrow.parquet as pq

    n_orders = pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows
    n_cust = pq.ParquetFile(f"{sf_dir}/customer.parquet").metadata.num_rows
    n_li, li_orphans = _orphan_count(
        _read(sf_dir, "lineitem", columns=["l_orderkey"]),
        "l_orderkey",
        _read(sf_dir, "orders", columns=["o_orderkey"]),
        "o_orderkey",
        n_orders,
    )
    n_ord, ord_orphans = _orphan_count(
        _read(sf_dir, "orders", columns=["o_custkey"]),
        "o_custkey",
        _read(sf_dir, "customer", columns=["c_custkey"]),
        "c_custkey",
        n_cust,
    )
    return pa.table(
        {
            "n_lineitem": pa.array([n_li], pa.int64()),
            "n_lineitem_orphans": pa.array([li_orphans], pa.int64()),
            "n_orders": pa.array([n_ord], pa.int64()),
            "n_order_orphans": pa.array([ord_orphans], pa.int64()),
        }
    )


def user_pivot_unpivot(sf_dir: str) -> rd.Dataset:
    """UNPIVOT (wide -> long melt): the per-user pivot counts re-shaped
    into (user_id, metric, n) rows — the inverse reshaping operator of
    user_event_pivot, streaming per batch (each wide row melts locally;
    no shuffle beyond the pivot's own)."""
    wide = user_event_pivot(sf_dir)
    metrics = [f"n_{t}" for t in _PIVOT_TYPES]

    def melt(t: pa.Table) -> pa.Table:
        import numpy as np

        n = t.num_rows
        uid = t["user_id"].combine_chunks()
        ids = uid.take(pa.array(np.tile(np.arange(n, dtype=np.int64), len(metrics))))
        metric = pa.array(np.repeat(np.array(metrics, dtype=object), n), pa.string())
        vals = pa.concat_arrays(
            [pc.cast(t[m], pa.int64()).combine_chunks() for m in metrics]
        )
        return pa.table({"user_id": ids, "metric": metric, "n": vals})

    return wide.map_batches(melt, batch_format="pyarrow")


def events_grouping_sets(sf_dir: str) -> pa.Table:
    """GROUPING SETS ((user_id), (event_type), ()) counts — the
    multi-axis summary one pass of partials serves: per-batch Arrow
    counts for BOTH axes plus the total ride one small exchange; the
    driver unions the three tiny aggregates with explicit null filler
    columns (SQL's grouping-set null semantics)."""
    import ray
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    # keys ride the shuffle as NON-null marker strings: a key column
    # that is all-null within one aggregate partition comes back
    # null-TYPED from Ray's aggregate and the block schemas diverge
    NULLK = "\x00"

    def _enc(col) -> pa.Array:
        s = pc.cast(col, pa.string())
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        return pc.fill_null(s, NULLK)

    def pre(t: pa.Table) -> pa.Table:
        gu = (
            t.select(["user_id"])
            .group_by(["user_id"])
            .aggregate([([], "count_all")])
            .rename_columns(["k", "c"])
        )
        gt = (
            t.select(["event_type"])
            .group_by(["event_type"])
            .aggregate([([], "count_all")])
            .rename_columns(["k", "c"])
        )
        return pa.table(
            {
                "axis": pa.array(
                    ["u"] * gu.num_rows + ["t"] * gt.num_rows, pa.string()
                ),
                "key": pa.concat_arrays([_enc(gu["k"]), _enc(gt["k"])]),
                "c": pa.concat_arrays(
                    [
                        pc.cast(gu["c"], pa.int64()).combine_chunks(),
                        pc.cast(gt["c"], pa.int64()).combine_chunks(),
                    ]
                ),
            }
        )

    agg = (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["axis", "key"])
        .aggregate(Sum("c", alias_name="n_f"))
    )
    parts = collect_tables(agg)
    schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("n", pa.int64()),
        ]
    )
    if not parts:
        return schema.empty_table()
    t = pa.concat_tables([p.replace_schema_metadata(None) for p in parts])
    axis = t["axis"].combine_chunks()
    key = t["key"].combine_chunks()
    n = pc.cast(t["n_f"], pa.int64()).combine_chunks()
    is_u = pc.equal(axis, "u")
    is_nullk = pc.equal(key, NULLK)
    uk = pc.if_else(
        pc.and_(is_u, pc.invert(is_nullk)),
        pc.cast(
            pc.if_else(pc.and_(is_u, pc.invert(is_nullk)), key, pa.scalar("0")),
            pa.int64(),
        ),
        pa.scalar(None, pa.int64()),
    )
    tk = pc.if_else(
        pc.and_(pc.invert(is_u), pc.invert(is_nullk)), key, pa.scalar(None, pa.string())
    )
    total = pc.sum(pc.if_else(is_u, n, pa.scalar(0, pa.int64()))).as_py()
    rows = pa.table({"user_id": uk, "event_type": tk, "n": n})
    total_row = pa.table(
        {
            "user_id": pa.nulls(1, pa.int64()),
            "event_type": pa.nulls(1, pa.string()),
            "n": pa.array([int(total or 0)], pa.int64()),
        }
    )
    return pa.concat_tables([rows.cast(schema), total_row.cast(schema)])


def customer_orders_full_outer(sf_dir: str) -> rd.Dataset:
    """FULL OUTER join (the one join shape the library's semi / anti /
    left-outer / asof / range / overlap family lacked): every customer
    row — matched or not — plus every per-custkey order aggregate with
    no matching customer (dangling FKs and the SQL NULL-key order
    group). Same tagged-union co-partition exchange as
    ``customer_order_counts``; the right-only rows fall out of the
    sorted-member probe for free (orders-aggregate keys no customer row
    hit). Orders pre-aggregate per batch INCLUDING the null-key group
    (one SQL ``GROUP BY o_custkey`` row), routed to the null partition
    so its partials merge exactly once."""
    import numpy as np

    from laketide.functions.dedup import _coarse_n_parts, _coarse_parts

    n_parts = _coarse_n_parts()
    out_schema = pa.schema(
        [
            ("custkey", pa.int64()),
            ("c_mktsegment", pa.string()),
            ("n_orders", pa.int64()),
            ("total_cents", pa.int64()),
        ]
    )

    def tag_cust(t: pa.Table) -> pa.Table:
        key = pc.cast(t["c_custkey"], pa.int64()).combine_chunks()
        valid = pc.is_valid(key).to_numpy(zero_copy_only=False)
        part = np.where(
            valid, _coarse_parts(_key_hash_u64(key), n_parts=n_parts), -1
        )
        return pa.table(
            {
                "part": pa.array(part, pa.int64()),
                "key": key,
                "seg": t["c_mktsegment"],
                "n": pa.nulls(t.num_rows, pa.int64()),
                "cents": pa.nulls(t.num_rows, pa.int64()),
                "side": pa.array(np.zeros(t.num_rows, np.int8), pa.int8()),
            }
        )

    def o_partial(t: pa.Table) -> pa.Table:
        """Per-batch per-custkey (count, cents) partials, null key KEPT
        as one group (associative — rerun per co-located partition)."""
        key = pc.cast(t["o_custkey"], pa.int64())
        cents = pc.fill_null(
            pc.cast(_cents(t["o_totalprice"]), pa.int64()), 0
        )  # sum() ignores null prices; count(*) does not
        g = (
            pa.table(
                {
                    "key": key,
                    "n": pa.array(np.ones(t.num_rows, np.int64)),
                    "cents": cents,
                }
            )
            .group_by(["key"])
            .aggregate([("n", "sum"), ("cents", "sum")])
        )
        return g.rename_columns(["key", "n", "cents"])

    def tag_orders(t: pa.Table) -> pa.Table:
        g = o_partial(t)
        key = g["key"].combine_chunks()
        valid = pc.is_valid(key).to_numpy(zero_copy_only=False)
        part = np.where(
            valid, _coarse_parts(_key_hash_u64(key), n_parts=n_parts), -1
        )
        return pa.table(
            {
                "part": pa.array(part, pa.int64()),
                "key": key,
                "seg": pa.nulls(g.num_rows, pa.string()),
                "n": g["n"],
                "cents": g["cents"],
                "side": pa.array(np.ones(g.num_rows, np.int8), pa.int8()),
            }
        )

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).map_batches(
        tag_cust, batch_format="pyarrow", zero_copy_batch=True
    )
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]).map_batches(
        tag_orders, batch_format="pyarrow", zero_copy_batch=True
    )

    def final(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        side = g["side"].to_numpy(zero_copy_only=False)
        lt = g.filter(pa.array(side == 0))
        rt = g.filter(pa.array(side == 1))
        # combine order partials (null key stays one group)
        ra = (
            rt.select(["key", "n", "cents"])
            .group_by(["key"])
            .aggregate([("n", "sum"), ("cents", "sum")])
            .rename_columns(["key", "n", "cents"])
        )
        ra_valid = ra.filter(pc.is_valid(ra["key"])).sort_by([("key", "ascending")])
        keys = ra_valid["key"].to_numpy(zero_copy_only=False)
        hit, pos = _sorted_member(keys, lt["key"].combine_chunks())
        take = pa.array(pos, pa.int64())
        n_g = (
            ra_valid["n"].combine_chunks().take(take)
            if ra_valid.num_rows
            else pa.nulls(lt.num_rows, pa.int64())
        )
        c_g = (
            ra_valid["cents"].combine_chunks().take(take)
            if ra_valid.num_rows
            else pa.nulls(lt.num_rows, pa.int64())
        )
        hit_pa = pa.array(hit)
        left = pa.table(
            {
                "custkey": lt["key"],
                "c_mktsegment": lt["seg"],
                "n_orders": pc.if_else(hit_pa, n_g, pa.scalar(0, pa.int64())),
                "total_cents": pc.if_else(hit_pa, c_g, pa.scalar(0, pa.int64())),
            }
        )
        # right-only: aggregate keys no customer row matched (incl. the
        # null-key group, which can never match)
        if ra.num_rows:
            lkeys = np.unique(
                pc.drop_null(lt["key"].combine_chunks()).to_numpy(
                    zero_copy_only=False
                )
            )
            rhit, _ = _sorted_member(lkeys, ra["key"].combine_chunks())
            ro = ra.filter(pa.array(~rhit | pc.is_null(ra["key"]).to_numpy(zero_copy_only=False)))
            right = pa.table(
                {
                    "custkey": ro["key"],
                    "c_mktsegment": pa.nulls(ro.num_rows, pa.string()),
                    "n_orders": pc.fill_null(ro["n"], 0),
                    "total_cents": pc.fill_null(ro["cents"], 0),
                }
            )
            left = pa.concat_tables([left.cast(out_schema), right.cast(out_schema)])
        return left.cast(out_schema)

    return (
        cust.union(orders)
        .groupby("part")
        .map_groups(final, batch_format="pyarrow")
    )
