"""Distributed as-of join: each event matched to the LATEST order of the
same user at-or-before the event timestamp.

Reference analog: the best-match lookup join family (J1,
/root/reference/internal/merger/merger.go) generalized to temporal
"latest at-or-before" semantics — the shape a training-data pipeline
needs to attach slowly-changing metadata (latest model version, latest
license scan, latest account state) to a high-rate event stream.

Ray-Data-first plan (no all-to-all sort of the big side):
1. Tag both inputs into one aligned schema and co-locate by a COARSE
   hash of the join key (``user_id`` / ``o_custkey``) — many users per
   shuffle partition, so the per-group UDF overhead (~700us/group)
   amortizes over thousands of rows.
2. Inside each co-located group, one C-level ``pandas.merge_asof``
   (``by=key, on=ts, direction=backward``) matches every event to its
   latest preceding order. No Python loop over rows or users.
Determinism: ties on ``o_orderdate`` break to the HIGHEST
``o_orderkey`` (right side pre-sorted by (ts, key, orderkey);
merge_asof keeps the last qualifying row). The oracle pins the same
tie-break (ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1).

At 100 TB: one shuffle of each side, keyed identically — the same
exchange a hash join would need; the small side is NOT broadcast
because as-of needs per-key ORDER, which the co-partitioned sort gives
for free at bounded memory (a partition holds ~1/P of each side).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from laketide.functions.dedup import _coarse_n_parts, _coarse_parts
from laketide.functions.relational import _key_hash_u64, _read

_OUT_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("user_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("asof_orderkey", pa.int64()),
        ("asof_totalprice", pa.float64()),
    ]
)


def _empty_out() -> pa.Table:
    return _OUT_SCHEMA.empty_table()


def _arr(x: "pa.Array | pa.ChunkedArray") -> pa.Array:
    """pc.cast returns Array or ChunkedArray depending on chunking."""
    return x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x


def asof_join_events_orders(sf_dir: str) -> rd.Dataset:
    """(event_id, user_id, ts, asof_orderkey, asof_totalprice) for every
    event; the order columns are null when the user has no order at or
    before the event's timestamp (left-join semantics). Null event ts or
    user_id never matches (SQL three-valued comparison)."""
    events = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )
    n_parts = _coarse_n_parts()

    def tag_events(t: pa.Table) -> pa.Table:
        key = pc.cast(t["user_id"], pa.int64())
        part = _coarse_parts(_key_hash_u64(key), n_parts=n_parts)
        n = t.num_rows
        return pa.table(
            {
                "part": pa.array(part, pa.int64()),
                "key": key,
                "ts": pc.cast(t["ts"], pa.timestamp("us")),
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "o_orderkey": pa.nulls(n, pa.int64()),
                "o_totalprice": pa.nulls(n, pa.float64()),
                "side": pa.array(np.zeros(n, dtype=np.int8), pa.int8()),
            }
        )

    def tag_orders(t: pa.Table) -> pa.Table:
        key = pc.cast(t["o_custkey"], pa.int64())
        part = _coarse_parts(_key_hash_u64(key), n_parts=n_parts)
        n = t.num_rows
        return pa.table(
            {
                "part": pa.array(part, pa.int64()),
                "key": key,
                "ts": pc.cast(t["o_orderdate"], pa.timestamp("us")),
                "event_id": pa.nulls(n, pa.int64()),
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "o_totalprice": pc.cast(t["o_totalprice"], pa.float64()),
                "side": pa.array(np.ones(n, dtype=np.int8), pa.int8()),
            }
        )

    tagged = events.map_batches(
        tag_events, batch_format="pyarrow", zero_copy_batch=True
    ).union(orders.map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True))

    def asof_group(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_out()
        df = t.to_pandas()
        left = df[df["side"] == 0]
        right = df[df["side"] == 1]
        # rows that can never match: null key/ts events keep null order
        # cols; null key/date orders can never be "at or before"
        left_bad = left[left["key"].isna() | left["ts"].isna()]
        left = left[left["key"].notna() & left["ts"].notna()]
        right = right[right["key"].notna() & right["ts"].notna()]
        if len(left) == 0 and len(left_bad) == 0:
            return _empty_out()
        if len(left) and len(right):
            # merge_asof: right sorted by on-key; last qualifying row
            # wins a ts tie -> ascending o_orderkey pins max-orderkey
            left = left.sort_values("ts", kind="stable")
            right = right.sort_values(["ts", "o_orderkey"], kind="stable")
            joined = pd.merge_asof(
                left[["event_id", "key", "ts"]],
                right[["key", "ts", "o_orderkey", "o_totalprice"]],
                on="ts",
                by="key",
                direction="backward",
                suffixes=("", "_o"),
            )
        else:
            joined = left[["event_id", "key", "ts"]].copy()
            joined["o_orderkey"] = pd.Series(dtype="float64")
            joined["o_totalprice"] = pd.Series(dtype="float64")
        if len(left_bad):
            bad = left_bad[["event_id", "key", "ts"]].copy()
            bad["o_orderkey"] = np.nan
            bad["o_totalprice"] = np.nan
            joined = pd.concat([joined, bad], ignore_index=True)
        out = pa.table(
            {
                "event_id": pa.array(joined["event_id"], pa.int64()),
                "user_id": pa.array(joined["key"], pa.int64()),
                "ts": pa.Array.from_pandas(joined["ts"], type=pa.timestamp("us")),
                "asof_orderkey": pa.Array.from_pandas(
                    joined["o_orderkey"], type=pa.int64()
                ),
                "asof_totalprice": pa.Array.from_pandas(
                    joined["o_totalprice"], type=pa.float64()
                ),
            }
        )
        return out

    return tagged.groupby("part").map_groups(asof_group, batch_format="pyarrow")


def range_join_order_events(sf_dir: str, days: int = 7) -> rd.Dataset:
    """Range join: per order, how many events its customer produced in
    the week starting at the order date (both endpoints inclusive —
    SQL ``e.ts BETWEEN o.o_orderdate AND o.o_orderdate + INTERVAL 7
    DAY``). Left-join semantics: every order appears; unmatched (incl.
    null custkey / null orderdate) count 0.

    Fully vectorized probe-insertion scheme, no per-key loop: events
    and per-order lo/hi probes co-partition by user hash; inside each
    group ONE lexsort by (key, ts, tag) with tag ordering lo-probe <
    event < hi-probe pins the inclusive endpoints, then a cumulative
    event count read at the two probe positions gives every order's
    count. O(n log n) per partition, O(1) extra state."""
    events = _read(sf_dir, "events", columns=["ts", "user_id"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    n_parts = _coarse_n_parts()
    span_us = np.int64(days) * 86_400 * 1_000_000

    def tag_events(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t["user_id"]), pc.is_valid(t["ts"])))
        key = pc.cast(t["user_id"], pa.int64())
        part = _coarse_parts(_key_hash_u64(key), n_parts=n_parts)
        n = t.num_rows
        return pa.table(
            {
                "part": pa.array(part, pa.int64()),
                "key": key,
                "ts": pc.cast(t["ts"], pa.timestamp("us")),
                "tag": pa.array(np.zeros(n, dtype=np.int8), pa.int8()),
                "o_orderkey": pa.nulls(n, pa.int64()),
            }
        )

    def tag_orders(t: pa.Table) -> pa.Table:
        key = pc.cast(t["o_custkey"], pa.int64())
        ok = pc.and_(pc.is_valid(key), pc.is_valid(t["o_orderdate"]))
        matched = t.filter(ok)
        key_m = _arr(pc.cast(matched["o_custkey"], pa.int64()))
        lo = _arr(pc.cast(matched["o_orderdate"], pa.timestamp("us")))
        hi_np = (
            lo.to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
            + span_us
        )
        hi = pa.array(hi_np.astype("datetime64[us]"), pa.timestamp("us"))
        okey_m = _arr(pc.cast(matched["o_orderkey"], pa.int64()))
        m = matched.num_rows
        part_m = _coarse_parts(_key_hash_u64(key_m), n_parts=n_parts)
        probes = pa.table(
            {
                "part": pa.array(np.concatenate([part_m, part_m]), pa.int64()),
                "key": pa.chunked_array([key_m, key_m]),
                "ts": pa.chunked_array([lo, hi]),
                "tag": pa.array(
                    np.concatenate(
                        [np.full(m, -1, dtype=np.int8), np.ones(m, dtype=np.int8)]
                    ),
                    pa.int8(),
                ),
                "o_orderkey": pa.chunked_array([okey_m, okey_m]),
            }
        )
        # unmatchable orders (null key/date) go to partition 0 as
        # tag=2 rows: emitted with count 0, never sorted into a window
        unmatched = t.filter(pc.invert(ok))
        u = unmatched.num_rows
        if u:
            zeros = pa.table(
                {
                    "part": pa.array(np.zeros(u, dtype=np.int64), pa.int64()),
                    "key": pa.nulls(u, pa.int64()),
                    "ts": pa.nulls(u, pa.timestamp("us")),
                    "tag": pa.array(np.full(u, 2, dtype=np.int8), pa.int8()),
                    "o_orderkey": pc.cast(unmatched["o_orderkey"], pa.int64()),
                }
            )
            probes = pa.concat_tables([probes, zeros])
        return probes

    tagged = events.map_batches(
        tag_events, batch_format="pyarrow", zero_copy_batch=True
    ).union(orders.map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True))

    def count_group(t: pa.Table) -> pa.Table:
        empty = pa.schema(
            [("o_orderkey", pa.int64()), ("n_events_week", pa.int64())]
        ).empty_table()
        if t.num_rows == 0:
            return empty
        tags = t["tag"].combine_chunks().to_numpy(zero_copy_only=False)
        dead = t.filter(pa.array(tags == 2))
        live = t.filter(pa.array(tags != 2))
        outs = []
        if dead.num_rows:
            outs.append(
                pa.table(
                    {
                        "o_orderkey": dead["o_orderkey"],
                        "n_events_week": pa.array(
                            np.zeros(dead.num_rows, dtype=np.int64), pa.int64()
                        ),
                    }
                )
            )
        if live.num_rows:
            live = live.sort_by(
                [("key", "ascending"), ("ts", "ascending"), ("tag", "ascending")]
            )
            tg = live["tag"].combine_chunks().to_numpy(zero_copy_only=False)
            cum = np.concatenate([[0], np.cumsum(tg == 0)])
            okey = live["o_orderkey"].combine_chunks()
            lo_pos = np.flatnonzero(tg == -1)
            hi_pos = np.flatnonzero(tg == 1)
            # probes pair up per orderkey: align by sorting each side's
            # orderkeys (each appears exactly once per side)
            lo_keys = okey.take(pa.array(lo_pos)).to_numpy(zero_copy_only=False)
            hi_keys = okey.take(pa.array(hi_pos)).to_numpy(zero_copy_only=False)
            lo_order = np.argsort(lo_keys, kind="stable")
            hi_order = np.argsort(hi_keys, kind="stable")
            counts = cum[hi_pos[hi_order] + 1] - cum[lo_pos[lo_order] + 1]
            outs.append(
                pa.table(
                    {
                        "o_orderkey": pa.array(lo_keys[lo_order], pa.int64()),
                        "n_events_week": pa.array(counts.astype(np.int64), pa.int64()),
                    }
                )
            )
        return pa.concat_tables(outs) if outs else empty

    return tagged.groupby("part").map_groups(count_group, batch_format="pyarrow")


def asof_oracle_sql() -> str:
    """LEFT JOIN LATERAL with the identical tie-break (date desc,
    orderkey desc, limit 1) — deterministic, unlike bare ASOF JOIN on
    equal dates."""
    return (
        "SELECT e.event_id, e.user_id, e.ts, "
        "o.o_orderkey AS asof_orderkey, o.o_totalprice AS asof_totalprice "
        "FROM events e LEFT JOIN LATERAL ("
        "  SELECT o_orderkey, o_totalprice FROM orders o "
        "  WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts "
        "  ORDER BY o.o_orderdate DESC, o_orderkey DESC LIMIT 1"
        ") o ON TRUE"
    )
