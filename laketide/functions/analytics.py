"""Sequence / distinct-count analytics operators.

Large-scale training-data pipelines need per-key sequence statistics
(inter-arrival gaps), categorical argmax (dominant class per key) and
exact distinct counts — the reference computes the same shapes as SQL
aggregate views (migrations/001_initial_schema.up.sql:132-144, the
stats-view A4 family) and per-key reconciliation passes
(internal/merger/merger.go:74-105). Here each is a Ray Data pipeline:
per-batch Arrow partials, ONE coarse shuffle keyed on a hash of the
group key (all rows of a key co-locate), and a vectorized multi-group
reduce per partition — never a per-group Python UDF (map_groups costs
~700us of UDF overhead per key group).

Column names match the registered DuckDB oracles exactly (driver
contract).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from laketide.functions.relational import (
    _adjacent_same,
    _from_pandas,  # noqa: F401  (re-export convenience for tests)
    _key_hash_u64,
    _read,
)


def _cpart_col(t: pa.Table, *cols: str) -> pa.Table:
    """Append the coarse shuffle partition for hash(cols) — buckets
    sharing the key co-locate so one vectorized call reduces MANY
    groups."""
    from laketide.functions.dedup import _coarse_n_parts, _coarse_parts

    part = _coarse_parts(
        *[_key_hash_u64(t[c]) for c in cols], n_parts=_coarse_n_parts()
    )
    return t.append_column("_cpart", pa.array(part, pa.int64()))


_GAPS_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("n_gaps", pa.int64()),
        ("total_gap_us", pa.int64()),
        ("max_gap_us", pa.int64()),
    ]
)


def user_event_gaps(sf_dir: str) -> rd.Dataset:
    """Per-user inter-arrival statistics (LAG/lead-lag window analog):
    order each user's events by (ts, event_id), diff consecutive
    timestamps, and aggregate count/total/max of the gaps in
    microseconds. Users with fewer than two timestamped events emit no
    row (the SQL HAVING count(gap) > 0).

    Shuffle shape: the exchange carries only (user_id, ts, event_id) —
    gaps need neighbouring rows so there is no smaller sufficient
    statistic — and the reduce handles every co-located user in one
    lexsort + reduceat pass. Exact integer microseconds end-to-end, so
    the result is hash-identical to the oracle."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def pre(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t["user_id"]), pc.is_valid(t["ts"])))
        return _cpart_col(t, "user_id")

    def reduce_gaps(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["_cpart"])
        n = t.num_rows
        if n < 2:
            return _GAPS_SCHEMA.empty_table()
        t = t.sort_by(
            [("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")]
        )
        u = t["user_id"].combine_chunks()
        # normalize the unit first: a timestamp[ns] source (pandas-written
        # parquet) would otherwise yield nanosecond gaps vs epoch_us
        ts = pc.cast(
            pc.cast(t["ts"].combine_chunks(), pa.timestamp("us")), pa.int64()
        ).to_numpy()
        same = _adjacent_same(u)  # len n-1: row i+1 same user as row i
        gaps = ts[1:] - ts[:-1]
        # row-group index per row, then per *valid gap* (gap i belongs
        # to the group of row i+1 iff same[i])
        starts = np.concatenate([[0], np.flatnonzero(~same) + 1]).astype(np.int64)
        counts = np.append(starts[1:], n) - starts
        gid_rows = np.repeat(np.arange(len(starts), dtype=np.int64), counts)
        gid = gid_rows[1:][same]
        if len(gid) == 0:
            return _GAPS_SCHEMA.empty_table()
        gv = gaps[same]
        gstarts = np.flatnonzero(np.diff(gid, prepend=-1))
        totals = np.add.reduceat(gv, gstarts)
        maxs = np.maximum.reduceat(gv, gstarts)
        ns = np.diff(np.append(gstarts, len(gid)))
        users = u.take(pa.array(starts[gid[gstarts]], pa.int64()))
        return pa.table(
            {
                "user_id": users,
                "n_gaps": pa.array(ns, pa.int64()),
                "total_gap_us": pa.array(totals, pa.int64()),
                "max_gap_us": pa.array(maxs, pa.int64()),
            }
        )

    return (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_cpart")
        .map_groups(reduce_gaps, batch_format="pyarrow")
    )


def mode_event_type_per_user(sf_dir: str) -> rd.Dataset:
    """Grouped mode (dominant category per key): the most frequent
    event_type per user, ties broken to the lexicographically smallest
    type. Per-batch Arrow count partials shrink the exchange to
    ~distinct (user, type) pairs per batch; the co-located reduce sums
    partials and takes the per-user argmax in one sort + boundary
    mask."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def pre(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t["user_id"]), pc.is_valid(t["event_type"]))
        )
        g = t.group_by(["user_id", "event_type"]).aggregate([([], "count_all")])
        g = g.rename_columns(["user_id", "event_type", "n"])
        return _cpart_col(g, "user_id")

    def final(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["_cpart"])
        if t.num_rows == 0:
            return pa.schema(
                [("user_id", pa.int64()), ("event_type", pa.string()), ("n", pa.int64())]
            ).empty_table()
        s = t.group_by(["user_id", "event_type"]).aggregate([("n", "sum")])
        s = s.rename_columns(["user_id", "event_type", "n"])
        s = s.sort_by(
            [("user_id", "ascending"), ("n", "descending"), ("event_type", "ascending")]
        )
        same = _adjacent_same(s["user_id"].combine_chunks())
        mask = np.ones(s.num_rows, dtype=bool)
        mask[1:] = ~same
        out = s.filter(pa.array(mask))
        return out.set_column(2, "n", pc.cast(out["n"], pa.int64()))

    return (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_cpart")
        .map_groups(final, batch_format="pyarrow")
    )


def distinct_users_by_type(sf_dir: str) -> rd.Dataset:
    """Exact distributed COUNT(DISTINCT user_id) per event_type. The
    classic two-level scheme: per-batch pair dedup (the exchange
    carries unique (type, user) pairs, not events), one coarse shuffle
    keyed on hash(type, user) — a pair always lands in one partition,
    so per-partition dedup is globally exact — then a tiny per-type
    partial count merged by a second (trivially small) grouped sum."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def pre(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t["user_id"]), pc.is_valid(t["event_type"]))
        )
        g = t.group_by(["event_type", "user_id"]).aggregate([([], "count_all")])
        g = g.drop_columns([g.column_names[-1]])
        return _cpart_col(g, "event_type", "user_id")

    def count_partial(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["_cpart"])
        if t.num_rows == 0:
            return pa.schema(
                [("event_type", pa.string()), ("n_partial", pa.int64())]
            ).empty_table()
        uniq = t.group_by(["event_type", "user_id"]).aggregate([([], "count_all")])
        per_type = uniq.group_by(["event_type"]).aggregate([([], "count_all")])
        return per_type.rename_columns(["event_type", "n_partial"])

    agg = (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_cpart")
        .map_groups(count_partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n_partial", alias_name="n_users_f"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "n_users": pc.cast(t["n_users_f"], pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")
