"""TPC-H-style reporting queries beyond the q1/q3/q4/q6/q10/q12/q18
family in relational.py: local-supplier volume (Q5), nation-pair
shipping volume (Q7), market share (Q8), product profit (Q9-like),
promo revenue share (Q14), top supplier (Q15), small-quantity revenue
(Q17), discounted-revenue predicate join (Q19) and idle high-balance
customers (Q22).

Reference parity: the reference engine's reporting layer is SQL
aggregates/joins over the merged store (reference:
sql/vulnerabilities.sql:1-90); these re-express the same
multi-join + filtered-aggregate shapes Ray-Data-first.

Scale notes (100 TB lens): the big facts (lineitem, orders, customer)
always STREAM — no driver materialization. True dimension tables
(supplier, nation, region, part: fixed small cardinality per the
schema) are read once driver-side and broadcast via ``ray.put`` as
sorted key arrays + positional gathers inside ``map_batches``.
Mid-size sides (filtered orders, customer key maps, distinct
order-customer keys) use the repo's ADAPTIVE pattern: broadcast under
a row budget (decided from parquet footers, never a counting scan of
an unfiltered table), else the ``_attach_by_key`` tagged-union
co-partition lookup join — NOT ``Dataset.join``, whose aggregator
loses the block schema on empty partitions (see ``_attach_by_key``).
Monetary sums are integer cents end-to-end so float summation order
can never flip the oracle's value hash.
"""

from __future__ import annotations

import functools

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from laketide.functions.reads import collect_tables
from laketide.functions.relational import _cents, _read, _sorted_member


def _collect(ds: rd.Dataset, schema: pa.Schema) -> pa.Table:
    """Driver-side collect of a SMALL Dataset (dimension tables, final
    aggregates), pinning the schema when every block is empty."""
    parts = collect_tables(ds)
    if not parts:
        return schema.empty_table()
    return pa.concat_tables(
        [p.replace_schema_metadata(None).cast(schema) for p in parts]
    )


def _file_key(path: str) -> tuple:
    """(path, mtime_ns, size) — the session-cache key: a rewritten file
    (tests regenerate fixtures in reused tmp paths) invalidates."""
    import os

    st = os.stat(path)
    return (path, st.st_mtime_ns, st.st_size)


# maxsize bounds driver residency: every cached entry is a broadcast-
# budget-sized table (callers gate on _table_rows first), but a
# long-lived driver touching many sf dirs / regenerated fixtures must
# not pin hundreds of dead tables
@functools.lru_cache(maxsize=32)
def _dim_cached(key: tuple, cols: tuple) -> pa.Table:
    import pyarrow.parquet as pq

    return (
        pq.read_table(key[0], columns=list(cols))
        .replace_schema_metadata(None)
        .combine_chunks()
    )


def _dim(sf_dir: str, name: str, cols: list[str]) -> pa.Table:
    """Read a dimension table (supplier/nation/region/part — fixed
    small cardinality) DIRECTLY on the driver for broadcast: a
    distributed Ray scan costs ~0.5s of fixed execution overhead per
    dimension (measured: 1.5s for three dims at sf0.1) for tables the
    broadcast pattern needs driver-side anyway. Session-cached keyed on
    (path, mtime, size) — a 58-query bench suite re-reads the same five
    dimension files dozens of times."""
    return _dim_cached(_file_key(f"{sf_dir}/{name}.parquet"), tuple(cols))


def _map_arrays(t: pa.Table, key: str, *vals: str):
    """(sorted_keys, val_arrays...) numpy views for broadcast gathers.
    Null keys are dropped: they can't match any probe."""
    import numpy as np

    t = t.filter(pc.is_valid(t[key])).sort_by([(key, "ascending")])
    out = [t[key].to_numpy(zero_copy_only=False)]
    for v in vals:
        out.append(t[v].combine_chunks())
    if t.num_rows == 0:
        out[0] = np.array([], np.int64)
    return tuple(out)


def _gather(keys, vals: pa.Array, col: pa.ChunkedArray):
    """(hit_mask, gathered_vals) of a broadcast int->val map. An EMPTY
    map means every probe misses (all-null values) — vals.take on the
    clamped positions would raise ArrowIndexError instead."""
    arr = col if isinstance(col, pa.Array) else col.combine_chunks()
    if len(keys) == 0:
        import numpy as np

        return np.zeros(len(arr), dtype=bool), pa.nulls(len(arr), vals.type)
    hit, pos = _sorted_member(keys, arr)
    return hit, vals.take(pa.array(pos, pa.int64()))


def _ts(s: str) -> pa.Scalar:
    return pa.scalar(pd.Timestamp(s), pa.timestamp("us"))


def _between(col, lo: str, hi: str):
    """lo <= col < hi, null-safe False."""
    return pc.fill_null(
        pc.and_kleene(pc.greater_equal(col, _ts(lo)), pc.less(col, _ts(hi))), False
    )


def _rev_cents(t: pa.Table) -> pa.ChunkedArray:
    return _cents(
        pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
    )


def _orders_map_or_none(
    o_ds: rd.Dataset, budget_rows: int, *vals: str, skip_count: bool = False
) -> tuple | None:
    """Adaptive side: collect (o_orderkey -> vals...) as broadcast-able
    sorted arrays when under the row budget, else None (caller falls
    back to a hash join). The q10 idiom shared by every query here.
    Callers that already know the row count from a parquet footer pass
    an effectively-infinite budget so no counting scan runs (q7/q9 were
    materializing the FULL unfiltered orders just to count it — exactly
    on the over-budget path that then re-read it for the join)."""
    import numpy as np

    if not skip_count and o_ds.count() > budget_rows:
        return None
    schema = pa.schema(
        [("o_orderkey", pa.int64())]
        + [(v, pa.int64() if v != "o_orderdate" else pa.timestamp("us")) for v in vals]
    )
    t = _collect(o_ds, schema)
    if t.num_rows == 0:
        return (np.array([], np.int64),) + tuple(
            t[v].combine_chunks() for v in vals
        )
    return _map_arrays(t, "o_orderkey", *vals)


def _cust_map(sf_dir: str):
    """Under-budget customer nation map, read DIRECTLY on the driver
    (two int columns; same rationale as _dim — the distributed scan's
    fixed overhead dwarfs the read). Session-cached via _dim_cached."""
    t = _dim_cached(
        _file_key(f"{sf_dir}/customer.parquet"), ("c_custkey", "c_nationkey")
    )
    return _map_arrays(
        pa.table(
            {
                "c_custkey": pc.cast(t["c_custkey"], pa.int64()),
                "c_nationkey": pc.cast(t["c_nationkey"], pa.int64()),
            }
        ),
        "c_custkey",
        "c_nationkey",
    )


@functools.lru_cache(maxsize=1024)
def _table_rows_cached(key: tuple) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(key[0]).metadata.num_rows


def _table_rows(sf_dir: str, name: str) -> int:
    """Row count from the parquet FOOTER — the broadcast-budget decision
    must not cost a full table scan (cust.count() executed the whole
    projection once just to pick a path). Footer cached per (path,
    mtime, size)."""
    return _table_rows_cached(_file_key(f"{sf_dir}/{name}.parquet"))


def _attach_by_key(
    left: rd.Dataset,
    left_fields: list,
    lkey: str,
    right: rd.Dataset,
    rkey: str,
    val_fields: list,
) -> rd.Dataset:
    """Distributed LEFT-OUTER lookup join: every left row gains
    ``val_fields`` from the right side by integer key (misses and null
    keys -> null values). The repo's tagged-union co-partition shape
    (relational.customer_order_counts): one shuffle keyed on a coarse
    key-hash partition, then one vectorized sorted-member gather per
    co-located group — both sides may be huge, nothing is broadcast.

    This deliberately avoids ``Dataset.join``: Ray's join aggregator
    builds partition tables from received blocks only, so a partition
    that receives zero blocks for one side (selective filters, all-null
    keys) finalizes a SCHEMA-LESS empty table and acero fails with 'No
    match for key field reference'. The union here is map-rooted and
    null-safe by construction.

    ``left_fields`` / ``val_fields`` are ``[(name, pa.type), ...]``;
    right keys are assumed unique per key (FK maps — first match wins
    otherwise)."""
    import numpy as np

    from laketide.functions.dedup import _coarse_n_parts, _coarse_parts
    from laketide.functions.relational import _key_hash_u64

    n_parts = _coarse_n_parts()
    l_names = [n for n, _ in left_fields]
    v_names = [n for n, _ in val_fields]
    out_schema = pa.schema(left_fields + val_fields)

    def tag_left(t: pa.Table) -> pa.Table:
        key = pc.cast(t[lkey], pa.int64()).combine_chunks()
        valid = pc.is_valid(key).to_numpy(zero_copy_only=False)
        # null keys match nothing: route to part -1 (kept, vals null)
        part = np.where(
            valid, _coarse_parts(_key_hash_u64(key), n_parts=n_parts), -1
        )
        cols = {
            "part": pa.array(part, pa.int64()),
            "_k": key,
            "side": pa.array(np.zeros(t.num_rows, np.int8), pa.int8()),
        }
        for name, _typ in left_fields:
            cols[f"l_{name}"] = t[name]
        for name, typ in val_fields:
            cols[f"v_{name}"] = pa.nulls(t.num_rows, typ)
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[rkey]))
        key = pc.cast(t[rkey], pa.int64()).combine_chunks()
        cols = {
            "part": pa.array(
                _coarse_parts(_key_hash_u64(key), n_parts=n_parts), pa.int64()
            ),
            "_k": key,
            "side": pa.array(np.ones(t.num_rows, np.int8), pa.int8()),
        }
        for name, typ in left_fields:
            cols[f"l_{name}"] = pa.nulls(t.num_rows, typ)
        for name, typ in val_fields:
            cols[f"v_{name}"] = pc.cast(t[name], typ)
        return pa.table(cols)

    tagged = left.map_batches(
        tag_left, batch_format="pyarrow", zero_copy_batch=True
    ).union(right.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True))

    def final(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        side = g["side"].to_numpy(zero_copy_only=False)
        lt = g.filter(pa.array(side == 0))
        rt = g.filter(pa.array(side == 1)).sort_by([("_k", "ascending")])
        keys = rt["_k"].to_numpy(zero_copy_only=False)
        hit, pos = _sorted_member(keys, lt["_k"].combine_chunks())
        hit_pa = pa.array(hit)
        cols = {name: lt[f"l_{name}"] for name in l_names}
        for name, typ in val_fields:
            gathered = (
                rt[f"v_{name}"].combine_chunks().take(pa.array(pos, pa.int64()))
                if rt.num_rows
                else pa.nulls(lt.num_rows, typ)
            )
            cols[name] = pc.if_else(hit_pa, gathered, pa.scalar(None, typ))
        return pa.table(cols).cast(out_schema)

    return tagged.groupby("part").map_groups(final, batch_format="pyarrow")


_Q5_LO, _Q5_HI = "1997-01-01", "1998-01-01"


def q5_local_supplier_volume(
    sf_dir: str, region: str = "ASIA", broadcast_budget_rows: int = 5_000_000
) -> pa.Table:
    """TPC-H Q5-style local-supplier volume: revenue per nation for
    orders in one year whose customer and line supplier share a nation
    inside one region. Lineitem streams once; supplier/nation/region
    broadcast; filtered orders and the customer nation map broadcast
    under the budget (hash-join fallback keeps both exchanges keyed on
    a single column each)."""
    import numpy as np

    nation = _dim(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    reg = _dim(sf_dir, "region", ["r_regionkey", "r_name"])
    rkeys = reg.filter(pc.equal(reg["r_name"], region))["r_regionkey"]
    in_region = pc.is_in(nation["n_regionkey"], value_set=rkeys.combine_chunks())
    region_nations = np.sort(
        pc.cast(nation.filter(in_region)["n_nationkey"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
    )
    supp = _dim(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    skeys, snat = _map_arrays(
        supp.set_column(
            1, "s_nationkey", pc.cast(supp["s_nationkey"], pa.int64())
        ),
        "s_suppkey",
        "s_nationkey",
    )
    s_ref = ray.put((skeys, snat, region_nations))

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def o_filter(t: pa.Table) -> pa.Table:
        t = t.filter(_between(t["o_orderdate"], _Q5_LO, _Q5_HI))
        return t.select(["o_orderkey", "o_custkey"])

    o_f = orders.map_batches(
        o_filter, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_nationkey": pc.cast(t["c_nationkey"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    omap = _orders_map_or_none(o_f, broadcast_budget_rows, "o_custkey")
    cmap = None
    if _table_rows(sf_dir, "customer") <= broadcast_budget_rows:
        cmap = _cust_map(sf_dir)

    if omap is not None and cmap is not None:
        o_ref, c_ref = ray.put(omap), ray.put(cmap)

        def li_partial(t: pa.Table) -> pa.Table:
            skeys, snat, rnat = ray.get(s_ref)
            okeys, ocust = ray.get(o_ref)
            ckeys, cnat = ray.get(c_ref)
            s_hit, s_n = _gather(skeys, snat, t["l_suppkey"])
            o_hit, o_c = _gather(okeys, ocust, t["l_orderkey"])
            c_hit, c_n = _gather(ckeys, cnat, o_c)
            same = pc.fill_null(pc.equal(s_n, c_n), False).to_numpy(
                zero_copy_only=False
            )
            sn = pc.fill_null(s_n, -1).to_numpy(zero_copy_only=False)
            pos = (
                np.minimum(np.searchsorted(rnat, sn), max(len(rnat) - 1, 0))
                if len(rnat)
                else np.zeros(len(sn), np.int64)
            )
            in_r = (rnat[pos] == sn) if len(rnat) else np.zeros(len(sn), bool)
            keep = s_hit & o_hit & c_hit & same & in_r
            t2 = pa.table(
                {
                    "nk": pa.array(sn, pa.int64()),
                    "rev": pc.cast(_rev_cents(t), pa.float64()),
                }
            ).filter(pa.array(keep))
            return t2.group_by(["nk"]).aggregate([("rev", "sum")]).rename_columns(
                ["nk", "rev"]
            )

        per_nat = li.map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)
    else:

        def li_partial_j(t: pa.Table) -> pa.Table:
            skeys, snat, rnat = ray.get(s_ref)
            s_hit, s_n = _gather(skeys, snat, t["l_suppkey"])
            sn = pc.fill_null(s_n, -1).to_numpy(zero_copy_only=False)
            pos = (
                np.minimum(np.searchsorted(rnat, sn), max(len(rnat) - 1, 0))
                if len(rnat)
                else np.zeros(len(sn), np.int64)
            )
            in_r = (rnat[pos] == sn) if len(rnat) else np.zeros(len(sn), bool)
            t2 = pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "nk": pa.array(sn, pa.int64()),
                    "rev": pc.cast(_rev_cents(t), pa.float64()),
                }
            ).filter(pa.array(s_hit & in_r))
            return (
                t2.group_by(["l_orderkey", "nk"])
                .aggregate([("rev", "sum")])
                .rename_columns(["l_orderkey", "nk", "rev"])
            )

        base = [("l_orderkey", pa.int64()), ("nk", pa.int64()), ("rev", pa.float64())]
        attached = _attach_by_key(
            li.map_batches(li_partial_j, batch_format="pyarrow", zero_copy_batch=True),
            base,
            "l_orderkey",
            o_f,
            "o_orderkey",
            [("o_custkey", pa.int64())],
        )
        attached = _attach_by_key(
            attached,
            base + [("o_custkey", pa.int64())],
            "o_custkey",
            cust,
            "c_custkey",
            [("c_nationkey", pa.int64())],
        )

        def local_filter(t: pa.Table) -> pa.Table:
            empty = pa.schema([("nk", pa.int64()), ("rev", pa.float64())]).empty_table()
            if "nk" not in t.column_names:
                return empty
            keep = pc.fill_null(pc.equal(t["nk"], t["c_nationkey"]), False)
            t = t.filter(keep)
            return t.group_by(["nk"]).aggregate([("rev", "sum")]).rename_columns(
                ["nk", "rev"]
            )

        per_nat = attached.map_batches(local_filter, batch_format="pyarrow")

    agg = per_nat.groupby("nk").aggregate(Sum("rev", alias_name="rev_f"))
    t = _collect(agg, pa.schema([("nk", pa.int64()), ("rev_f", pa.float64())]))
    nkeys, nname = _map_arrays(
        nation.set_column(
            0, "n_nationkey", pc.cast(nation["n_nationkey"], pa.int64())
        ).select(["n_nationkey", "n_name"]),
        "n_nationkey",
        "n_name",
    )
    _, names = _gather(nkeys, nname, t["nk"])
    out = pa.table(
        {"n_name": names, "revenue_cents": pc.cast(t["rev_f"], pa.int64())}
    )
    return out.sort_by([("revenue_cents", "descending"), ("n_name", "ascending")])


_Q7_LO, _Q7_HI = "1997-01-01", "1999-01-01"


def q7_volume_shipping(
    sf_dir: str,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    broadcast_budget_rows: int = 5_000_000,
) -> pa.Table:
    """TPC-H Q7-style nation-pair shipping volume: revenue between two
    nations (either direction) by supplier nation, customer nation and
    ship year. Same adaptive shape as q5 — lineitem streams, orders
    map + customer nation map broadcast under budget, else hash joins."""
    import numpy as np

    nation = _dim(sf_dir, "nation", ["n_nationkey", "n_name"])
    nk = pc.cast(nation["n_nationkey"], pa.int64())
    pair_keys = {}
    for name in (nation_a, nation_b):
        sel = nation.filter(pc.equal(nation["n_name"], name))
        if sel.num_rows:
            pair_keys[name] = pc.cast(sel["n_nationkey"], pa.int64())[0].as_py()
    ka = pair_keys.get(nation_a, -1)
    kb = pair_keys.get(nation_b, -2)
    supp = _dim(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    skeys, snat = _map_arrays(
        supp.set_column(1, "s_nationkey", pc.cast(supp["s_nationkey"], pa.int64())),
        "s_suppkey",
        "s_nationkey",
    )
    s_ref = ray.put((skeys, snat))

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_nationkey": pc.cast(t["c_nationkey"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def li_pre(t: pa.Table) -> pa.Table:
        """Shared pre-step: ship-window filter + supplier-nation gather
        restricted to the two pair nations."""
        t = t.filter(_between(t["l_shipdate"], _Q7_LO, _Q7_HI))
        skeys_, snat_ = ray.get(s_ref)
        s_hit, s_n = _gather(skeys_, snat_, t["l_suppkey"])
        is_pair = pc.fill_null(
            pc.or_(pc.equal(s_n, ka), pc.equal(s_n, kb)), False
        ).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "s_nat": s_n,
                "l_year": pc.cast(pc.year(t["l_shipdate"]), pa.int64()),
                "rev": pc.cast(_rev_cents(t), pa.float64()),
            }
        ).filter(pa.array(s_hit & is_pair))
        return t

    omap = (
        _orders_map_or_none(orders, 2**62, "o_custkey", skip_count=True)
        if _table_rows(sf_dir, "orders") <= broadcast_budget_rows
        else None
    )
    cmap = None
    if _table_rows(sf_dir, "customer") <= broadcast_budget_rows:
        cmap = _cust_map(sf_dir)

    if omap is not None and cmap is not None:
        o_ref, c_ref = ray.put(omap), ray.put(cmap)

        def li_partial(t: pa.Table) -> pa.Table:
            t = li_pre(t)
            okeys, ocust = ray.get(o_ref)
            ckeys, cnat = ray.get(c_ref)
            o_hit, o_c = _gather(okeys, ocust, t["l_orderkey"])
            c_hit, c_n = _gather(ckeys, cnat, o_c)
            cross = pc.fill_null(
                pc.or_(
                    pc.and_(pc.equal(t["s_nat"], ka), pc.equal(c_n, kb)),
                    pc.and_(pc.equal(t["s_nat"], kb), pc.equal(c_n, ka)),
                ),
                False,
            ).to_numpy(zero_copy_only=False)
            t2 = pa.table(
                {
                    "s_nat": t["s_nat"],
                    "c_nat": c_n,
                    "l_year": t["l_year"],
                    "rev": t["rev"],
                }
            ).filter(pa.array(o_hit & c_hit & cross))
            return (
                t2.group_by(["s_nat", "c_nat", "l_year"])
                .aggregate([("rev", "sum")])
                .rename_columns(["s_nat", "c_nat", "l_year", "rev"])
            )

        partials = li.map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)
    else:
        base = [
            ("l_orderkey", pa.int64()),
            ("s_nat", pa.int64()),
            ("l_year", pa.int64()),
            ("rev", pa.float64()),
        ]
        attached = _attach_by_key(
            li.map_batches(li_pre, batch_format="pyarrow", zero_copy_batch=True),
            base,
            "l_orderkey",
            orders,
            "o_orderkey",
            [("o_custkey", pa.int64())],
        )
        attached = _attach_by_key(
            attached,
            base + [("o_custkey", pa.int64())],
            "o_custkey",
            cust,
            "c_custkey",
            [("c_nationkey", pa.int64())],
        )

        def cross_filter(t: pa.Table) -> pa.Table:
            empty = pa.schema(
                [
                    ("s_nat", pa.int64()),
                    ("c_nat", pa.int64()),
                    ("l_year", pa.int64()),
                    ("rev", pa.float64()),
                ]
            ).empty_table()
            if "s_nat" not in t.column_names:
                return empty
            c_n = t["c_nationkey"]
            cross = pc.fill_null(
                pc.or_(
                    pc.and_(pc.equal(t["s_nat"], ka), pc.equal(c_n, kb)),
                    pc.and_(pc.equal(t["s_nat"], kb), pc.equal(c_n, ka)),
                ),
                False,
            )
            t2 = pa.table(
                {
                    "s_nat": t["s_nat"],
                    "c_nat": c_n,
                    "l_year": t["l_year"],
                    "rev": t["rev"],
                }
            ).filter(cross)
            return (
                t2.group_by(["s_nat", "c_nat", "l_year"])
                .aggregate([("rev", "sum")])
                .rename_columns(["s_nat", "c_nat", "l_year", "rev"])
            )

        partials = attached.map_batches(cross_filter, batch_format="pyarrow")

    agg = partials.groupby(["s_nat", "c_nat", "l_year"]).aggregate(
        Sum("rev", alias_name="rev_f")
    )
    t = _collect(
        agg,
        pa.schema(
            [
                ("s_nat", pa.int64()),
                ("c_nat", pa.int64()),
                ("l_year", pa.int64()),
                ("rev_f", pa.float64()),
            ]
        ),
    )
    nkeys, nname = _map_arrays(
        pa.table({"n_nationkey": nk, "n_name": nation["n_name"]}),
        "n_nationkey",
        "n_name",
    )
    _, s_names = _gather(nkeys, nname, t["s_nat"])
    _, c_names = _gather(nkeys, nname, t["c_nat"])
    return pa.table(
        {
            "supp_nation": s_names,
            "cust_nation": c_names,
            "l_year": t["l_year"],
            "revenue_cents": pc.cast(t["rev_f"], pa.int64()),
        }
    ).sort_by(
        [("supp_nation", "ascending"), ("cust_nation", "ascending"), ("l_year", "ascending")]
    )


_Q8_LO, _Q8_HI = "1997-01-01", "1999-01-01"


def q8_market_share(
    sf_dir: str,
    target_nation: str = "NATION_3",
    region: str = "ASIA",
    ptype: str = "PROMO",
    broadcast_budget_rows: int = 5_000_000,
) -> pa.Table:
    """TPC-H Q8-style market share: the target nation's suppliers' share
    of revenue per order year, over lines of one part type sold to
    customers in one region. Share = nation_cents / total_cents, both
    exact integer sums, divided identically on both sides (bit-equal
    doubles)."""
    import numpy as np

    nation = _dim(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    reg = _dim(sf_dir, "region", ["r_regionkey", "r_name"])
    rkeys = reg.filter(pc.equal(reg["r_name"], region))["r_regionkey"]
    region_nations = np.sort(
        pc.cast(
            nation.filter(
                pc.is_in(nation["n_regionkey"], value_set=rkeys.combine_chunks())
            )["n_nationkey"],
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
    )
    tsel = nation.filter(pc.equal(nation["n_name"], target_nation))
    target_key = (
        pc.cast(tsel["n_nationkey"], pa.int64())[0].as_py() if tsel.num_rows else -1
    )
    supp = _dim(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    skeys, snat = _map_arrays(
        supp.set_column(1, "s_nationkey", pc.cast(supp["s_nationkey"], pa.int64())),
        "s_suppkey",
        "s_nationkey",
    )
    part = _dim(sf_dir, "part", ["p_partkey", "p_type"])
    pkeys = np.sort(
        part.filter(pc.equal(part["p_type"], ptype))["p_partkey"].to_numpy(
            zero_copy_only=False
        )
    )
    dim_ref = ray.put((skeys, snat, pkeys, region_nations))

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def o_filter(t: pa.Table) -> pa.Table:
        t = t.filter(_between(t["o_orderdate"], _Q8_LO, _Q8_HI))
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
            }
        )

    o_f = orders.map_batches(
        o_filter, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_nationkey": pc.cast(t["c_nationkey"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_pre(t: pa.Table) -> pa.Table:
        skeys_, snat_, pkeys_, _rn = ray.get(dim_ref)
        p_hit, _ = _sorted_member(pkeys_, t["l_partkey"].combine_chunks())
        t = t.filter(pa.array(p_hit))
        s_hit, s_n = _gather(skeys_, snat_, t["l_suppkey"])
        t = pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "s_nat": s_n,
                "rev": pc.cast(_rev_cents(t), pa.float64()),
            }
        ).filter(pa.array(s_hit))
        return t

    o_small = o_f.count() <= broadcast_budget_rows
    cmap = None
    if _table_rows(sf_dir, "customer") <= broadcast_budget_rows:
        cmap = _cust_map(sf_dir)

    if o_small and cmap is not None:
        ot = _collect(
            o_f,
            pa.schema(
                [
                    ("o_orderkey", pa.int64()),
                    ("o_custkey", pa.int64()),
                    ("o_year", pa.int64()),
                ]
            ),
        )
        okeys, ocust, oyear = _map_arrays(ot, "o_orderkey", "o_custkey", "o_year")
        o_ref, c_ref = ray.put((okeys, ocust, oyear)), ray.put(cmap)

        def li_partial(t: pa.Table) -> pa.Table:
            t = li_pre(t)
            _s, _n, _p, rnat = ray.get(dim_ref)
            okeys_, ocust_, oyear_ = ray.get(o_ref)
            ckeys_, cnat_ = ray.get(c_ref)
            o_hit, pos = _sorted_member(okeys_, t["l_orderkey"].combine_chunks())
            o_c = ocust_.take(pa.array(pos, pa.int64()))
            o_y = oyear_.take(pa.array(pos, pa.int64()))
            c_hit, c_n = _gather(ckeys_, cnat_, o_c)
            cn = pc.fill_null(c_n, -1).to_numpy(zero_copy_only=False)
            rpos = (
                np.minimum(np.searchsorted(rnat, cn), max(len(rnat) - 1, 0))
                if len(rnat)
                else np.zeros(len(cn), np.int64)
            )
            in_r = (rnat[rpos] == cn) if len(rnat) else np.zeros(len(cn), bool)
            t2 = pa.table(
                {
                    "o_year": o_y,
                    "s_nat": t["s_nat"],
                    "rev": t["rev"],
                }
            ).filter(pa.array(o_hit & c_hit & in_r))
            is_t = pc.cast(pc.equal(t2["s_nat"], target_key), pa.float64())
            t3 = pa.table(
                {
                    "o_year": t2["o_year"],
                    "rev": t2["rev"],
                    "nat_rev": pc.multiply(
                        pc.fill_null(is_t, 0.0), t2["rev"]
                    ),
                }
            )
            return (
                t3.group_by(["o_year"])
                .aggregate([("rev", "sum"), ("nat_rev", "sum")])
                .rename_columns(["o_year", "rev", "nat_rev"])
            )

        partials = li.map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)
    else:
        base = [("l_orderkey", pa.int64()), ("s_nat", pa.int64()), ("rev", pa.float64())]
        attached = _attach_by_key(
            li.map_batches(li_pre, batch_format="pyarrow", zero_copy_batch=True),
            base,
            "l_orderkey",
            o_f,
            "o_orderkey",
            [("o_custkey", pa.int64()), ("o_year", pa.int64())],
        )
        attached = _attach_by_key(
            attached,
            base + [("o_custkey", pa.int64()), ("o_year", pa.int64())],
            "o_custkey",
            cust,
            "c_custkey",
            [("c_nationkey", pa.int64())],
        )

        def region_filter(t: pa.Table) -> pa.Table:
            empty = pa.schema(
                [("o_year", pa.int64()), ("rev", pa.float64()), ("nat_rev", pa.float64())]
            ).empty_table()
            if "s_nat" not in t.column_names:
                return empty
            _s, _n, _p, rnat = ray.get(dim_ref)
            cn = pc.fill_null(t["c_nationkey"], -1).to_numpy(zero_copy_only=False)
            rpos = (
                np.minimum(np.searchsorted(rnat, cn), max(len(rnat) - 1, 0))
                if len(rnat)
                else np.zeros(len(cn), np.int64)
            )
            in_r = (rnat[rpos] == cn) if len(rnat) else np.zeros(len(cn), bool)
            t2 = t.filter(pa.array(in_r))
            is_t = pc.cast(pc.equal(t2["s_nat"], target_key), pa.float64())
            t3 = pa.table(
                {
                    "o_year": t2["o_year"],
                    "rev": t2["rev"],
                    "nat_rev": pc.multiply(pc.fill_null(is_t, 0.0), t2["rev"]),
                }
            )
            return (
                t3.group_by(["o_year"])
                .aggregate([("rev", "sum"), ("nat_rev", "sum")])
                .rename_columns(["o_year", "rev", "nat_rev"])
            )

        partials = attached.map_batches(region_filter, batch_format="pyarrow")

    agg = partials.groupby("o_year").aggregate(
        Sum("rev", alias_name="rev_f"), Sum("nat_rev", alias_name="nat_f")
    )
    t = _collect(
        agg,
        pa.schema(
            [("o_year", pa.int64()), ("rev_f", pa.float64()), ("nat_f", pa.float64())]
        ),
    )
    total = pc.cast(t["rev_f"], pa.int64())
    nat = pc.cast(t["nat_f"], pa.int64())
    share = pc.divide(
        pc.cast(nat, pa.float64()), pc.cast(total, pa.float64())
    )
    return pa.table(
        {
            "o_year": t["o_year"],
            "nation_cents": nat,
            "total_cents": total,
            "mkt_share": share,
        }
    ).sort_by([("o_year", "ascending")])


def q9_product_profit(
    sf_dir: str, broadcast_budget_rows: int = 20_000_000
) -> pa.Table:
    """TPC-H Q9-style product profit by supplier nation and order year:
    profit = extendedprice*(1-discount) - retailprice*quantity (this
    schema has no partsupp supplycost; the part's retail price stands
    in). Part + supplier + nation broadcast; the order-year map is
    adaptive (broadcast under budget, else a hash join)."""
    nation = _dim(sf_dir, "nation", ["n_nationkey", "n_name"])
    supp = _dim(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    skeys, snat = _map_arrays(
        supp.set_column(1, "s_nationkey", pc.cast(supp["s_nationkey"], pa.int64())),
        "s_suppkey",
        "s_nationkey",
    )
    part = _dim(sf_dir, "part", ["p_partkey", "p_retailprice"])
    pkeys, pprice = _map_arrays(part, "p_partkey", "p_retailprice")
    dim_ref = ray.put((skeys, snat, pkeys, pprice))

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"]).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def li_pre(t: pa.Table) -> pa.Table:
        skeys_, snat_, pkeys_, pprice_ = ray.get(dim_ref)
        s_hit, s_n = _gather(skeys_, snat_, t["l_suppkey"])
        p_hit, p_pr = _gather(pkeys_, pprice_, t["l_partkey"])
        amount = pc.subtract(
            pc.multiply(
                t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
            ),
            pc.multiply(p_pr, t["l_quantity"]),
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "s_nat": s_n,
                "profit": pc.cast(_cents(amount), pa.float64()),
            }
        ).filter(pa.array(s_hit & p_hit))

    omap = (
        _orders_map_or_none(orders, 2**62, "o_year", skip_count=True)
        if _table_rows(sf_dir, "orders") <= broadcast_budget_rows
        else None
    )
    if omap is not None:
        o_ref = ray.put(omap)

        def li_partial(t: pa.Table) -> pa.Table:
            t = li_pre(t)
            okeys, oyear = ray.get(o_ref)
            o_hit, o_y = _gather(okeys, oyear, t["l_orderkey"])
            t2 = pa.table(
                {"s_nat": t["s_nat"], "o_year": o_y, "profit": t["profit"]}
            ).filter(pa.array(o_hit))
            return (
                t2.group_by(["s_nat", "o_year"])
                .aggregate([("profit", "sum")])
                .rename_columns(["s_nat", "o_year", "profit"])
            )

        partials = li.map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)
    else:

        def li_partial_j(t: pa.Table) -> pa.Table:
            t = li_pre(t)
            return (
                t.group_by(["l_orderkey", "s_nat"])
                .aggregate([("profit", "sum")])
                .rename_columns(["l_orderkey", "s_nat", "profit"])
            )

        def post_attach(t: pa.Table) -> pa.Table:
            empty = pa.schema(
                [("s_nat", pa.int64()), ("o_year", pa.int64()), ("profit", pa.float64())]
            ).empty_table()
            if "s_nat" not in t.column_names:
                return empty
            # unmatched rows drop (inner-join semantics); a MATCHED row
            # may still carry a null o_year (null orderdate group), so
            # the marker — not o_year validity — decides
            t = t.filter(pc.is_valid(t["hit"]))
            return (
                t.group_by(["s_nat", "o_year"])
                .aggregate([("profit", "sum")])
                .rename_columns(["s_nat", "o_year", "profit"])
            )

        orders_m = orders.map_batches(
            lambda t: t.append_column(
                "hit", pa.array([1] * t.num_rows, pa.int8())
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        partials = _attach_by_key(
            li.map_batches(li_partial_j, batch_format="pyarrow", zero_copy_batch=True),
            [("l_orderkey", pa.int64()), ("s_nat", pa.int64()), ("profit", pa.float64())],
            "l_orderkey",
            orders_m,
            "o_orderkey",
            [("o_year", pa.int64()), ("hit", pa.int8())],
        ).map_batches(post_attach, batch_format="pyarrow")

    agg = partials.groupby(["s_nat", "o_year"]).aggregate(
        Sum("profit", alias_name="profit_f")
    )
    t = _collect(
        agg,
        pa.schema(
            [("s_nat", pa.int64()), ("o_year", pa.int64()), ("profit_f", pa.float64())]
        ),
    )
    nkeys, nname = _map_arrays(
        pa.table(
            {
                "n_nationkey": pc.cast(nation["n_nationkey"], pa.int64()),
                "n_name": nation["n_name"],
            }
        ),
        "n_nationkey",
        "n_name",
    )
    _, names = _gather(nkeys, nname, t["s_nat"])
    return pa.table(
        {
            "n_name": names,
            "o_year": t["o_year"],
            "profit_cents": pc.cast(t["profit_f"], pa.int64()),
        }
    ).sort_by([("n_name", "ascending"), ("o_year", "ascending")])


_Q14_LO, _Q14_HI = "1997-09-01", "1997-10-01"


def q14_promo_revenue_pct(sf_dir: str, ptype: str = "PROMO") -> pa.Table:
    """TPC-H Q14-style promo revenue share for one ship month. Both
    sums are exact integer cents; the percentage is one double division
    written identically in the oracle (bit-equal)."""
    import numpy as np

    part = _dim(sf_dir, "part", ["p_partkey", "p_type"])
    is_promo = pc.cast(pc.equal(part["p_type"], ptype), pa.float64())
    pkeys, promo_flag = _map_arrays(
        part.set_column(1, "p_type", pc.fill_null(is_promo, 0.0)),
        "p_partkey",
        "p_type",
    )
    p_ref = ray.put((pkeys, promo_flag))
    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        # the part membership gates BOTH sums (inner-join semantics,
        # matching the oracle — identical unless a partkey FK is broken)
        t = t.filter(_between(t["l_shipdate"], _Q14_LO, _Q14_HI))
        pkeys_, pflag_ = ray.get(p_ref)
        hit, flag = _gather(pkeys_, pflag_, t["l_partkey"])
        rev = pc.multiply(
            pc.fill_null(pc.cast(_rev_cents(t), pa.float64()), 0.0),
            pc.cast(pa.array(hit), pa.float64()),
        )
        promo = pc.multiply(pc.fill_null(flag, 0.0), rev)
        return pa.table(
            {
                "total": pa.array([pc.sum(rev).as_py() or 0.0]),
                "promo": pa.array([pc.sum(promo).as_py() or 0.0]),
            }
        )

    agg = li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).sum(
        ["total", "promo"]
    )
    total = int(agg["sum(total)"])
    promo = int(agg["sum(promo)"])
    pct = 100.0 * float(promo) / float(total) if total else None
    return pa.table(
        {
            "promo_cents": pa.array([promo], pa.int64()),
            "total_cents": pa.array([total], pa.int64()),
            "promo_pct": pa.array([pct], pa.float64()),
        }
    )


_Q15_LO, _Q15_HI = "1997-01-01", "1997-04-01"


def q15_top_supplier(sf_dir: str) -> pa.Table:
    """TPC-H Q15-style top supplier: max-revenue supplier(s) for one
    ship quarter. Supplier cardinality is dimension-scale, so the
    per-supplier sums collapse per batch and the argmax runs on the
    driver over the tiny final aggregate."""
    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(_between(t["l_shipdate"], _Q15_LO, _Q15_HI))
        t2 = pa.table(
            {"l_suppkey": t["l_suppkey"], "rev": pc.cast(_rev_cents(t), pa.float64())}
        )
        return (
            t2.group_by(["l_suppkey"])
            .aggregate([("rev", "sum")])
            .rename_columns(["l_suppkey", "rev"])
        )

    agg = (
        li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_suppkey")
        .aggregate(Sum("rev", alias_name="rev_f"))
    )
    t = _collect(agg, pa.schema([("l_suppkey", pa.int64()), ("rev_f", pa.float64())]))
    t = t.filter(pc.is_valid(t["l_suppkey"]))
    if t.num_rows == 0:
        return pa.schema(
            [
                ("s_suppkey", pa.int64()),
                ("s_name", pa.string()),
                ("total_cents", pa.int64()),
            ]
        ).empty_table()
    cents = pc.cast(t["rev_f"], pa.int64())
    best = pc.max(cents)
    win = pa.table({"s_suppkey": t["l_suppkey"], "total_cents": cents}).filter(
        pc.equal(cents, best)
    )
    supp = _dim(sf_dir, "supplier", ["s_suppkey", "s_name"])
    skeys, sname = _map_arrays(supp, "s_suppkey", "s_name")
    _, names = _gather(skeys, sname, win["s_suppkey"])
    return pa.table(
        {
            "s_suppkey": win["s_suppkey"],
            "s_name": names,
            "total_cents": win["total_cents"],
        }
    ).sort_by([("s_suppkey", "ascending")])


def q17_small_quantity_revenue(sf_dir: str, brand: str = "Brand#1") -> pa.Table:
    """TPC-H Q17-style small-quantity revenue: lines of one brand whose
    quantity is below 20% of that part's average quantity. Two streaming
    passes over lineitem: per-part (sum_qty, n) partials collapse to a
    dimension-sized aggregate, whose 0.2*avg thresholds broadcast back
    for the second filtered-sum pass. avg is exact (integral quantities
    sum exactly in int64), so the threshold doubles are bit-equal to
    the oracle's."""
    import numpy as np

    part = _dim(sf_dir, "part", ["p_partkey", "p_brand"])
    pkeys = np.sort(
        part.filter(pc.equal(part["p_brand"], brand))["p_partkey"].to_numpy(
            zero_copy_only=False
        )
    )
    p_ref = ray.put(pkeys)
    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    li = _read(sf_dir, "lineitem", columns=li_cols)

    def qty_partial(t: pa.Table) -> pa.Table:
        hit, _ = _sorted_member(ray.get(p_ref), t["l_partkey"].combine_chunks())
        t = t.filter(pa.array(hit))
        t2 = pa.table(
            {
                "l_partkey": t["l_partkey"],
                "q": pc.cast(pc.cast(t["l_quantity"], pa.int64()), pa.float64()),
                "one": pa.array([1.0] * t.num_rows, pa.float64()),
            }
        )
        return (
            t2.group_by(["l_partkey"])
            .aggregate([("q", "sum"), ("one", "sum")])
            .rename_columns(["l_partkey", "q", "one"])
        )

    qagg = (
        li.map_batches(qty_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_partkey")
        .aggregate(Sum("q", alias_name="sq"), Sum("one", alias_name="n"))
    )
    qt = _collect(
        qagg,
        pa.schema([("l_partkey", pa.int64()), ("sq", pa.float64()), ("n", pa.float64())]),
    )
    qt = qt.filter(pc.is_valid(qt["l_partkey"]))
    if qt.num_rows == 0:
        return pa.table(
            {
                "total_cents": pa.array([0], pa.int64()),
                "avg_yearly": pa.array([0.0], pa.float64()),
            }
        )
    thr = 0.2 * (
        qt["sq"].to_numpy(zero_copy_only=False) / qt["n"].to_numpy(zero_copy_only=False)
    )
    tkeys = qt["l_partkey"].to_numpy(zero_copy_only=False)
    order = np.argsort(tkeys)
    t_ref = ray.put((tkeys[order], thr[order]))

    def rev_partial(t: pa.Table) -> pa.Table:
        keys, thr_ = ray.get(t_ref)
        hit, pos = _sorted_member(keys, t["l_partkey"].combine_chunks())
        qty = pc.fill_null(t["l_quantity"], np.inf).to_numpy(zero_copy_only=False)
        keep = hit & (qty < thr_[pos])
        t = t.filter(pa.array(keep))
        cents = pc.cast(_cents(t["l_extendedprice"]), pa.float64())
        return pa.table({"c": pa.array([pc.sum(cents).as_py() or 0.0], pa.float64())})

    total = int(
        li.map_batches(rev_partial, batch_format="pyarrow", zero_copy_batch=True).sum("c")
    )
    return pa.table(
        {
            "total_cents": pa.array([total], pa.int64()),
            "avg_yearly": pa.array([float(total) / 700.0], pa.float64()),
        }
    )


_Q19_BANDS = (
    ("Brand#1", 1, 15, 1, 11),
    ("Brand#2", 1, 25, 10, 20),
    ("Brand#3", 1, 35, 20, 30),
)


def q19_discounted_revenue(sf_dir: str) -> pa.Table:
    """TPC-H Q19-style discounted revenue: a disjunctive brand/size/
    quantity predicate over part x lineitem, summed to one row. Part
    attributes broadcast as aligned arrays; each OR branch evaluates
    vectorized over the gathered brand/size columns."""
    part = _dim(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    pkeys, pbrand, psize = _map_arrays(part, "p_partkey", "p_brand", "p_size")
    p_ref = ray.put((pkeys, pbrand, pc.cast(psize, pa.int64())))
    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        pkeys_, pbrand_, psize_ = ray.get(p_ref)
        hit, pos = _sorted_member(pkeys_, t["l_partkey"].combine_chunks())
        idx = pa.array(pos, pa.int64())
        brand = pbrand_.take(idx)
        size = psize_.take(idx)
        qty = t["l_quantity"]
        keep = pa.array([False] * t.num_rows, pa.bool_())
        for b, slo, shi, qlo, qhi in _Q19_BANDS:
            cond = pc.and_(
                pc.and_(
                    pc.fill_null(pc.equal(brand, b), False),
                    pc.fill_null(
                        pc.and_(
                            pc.greater_equal(size, slo), pc.less_equal(size, shi)
                        ),
                        False,
                    ),
                ),
                pc.fill_null(
                    pc.and_(pc.greater_equal(qty, qlo), pc.less_equal(qty, qhi)),
                    False,
                ),
            )
            keep = pc.or_(keep, cond)
        keep = pc.and_(keep, pa.array(hit))
        t2 = t.filter(keep)
        cents = pc.cast(_rev_cents(t2), pa.float64())
        return pa.table({"c": pa.array([pc.sum(cents).as_py() or 0.0], pa.float64())})

    total = int(li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).sum("c"))
    return pa.table({"revenue_cents": pa.array([total], pa.int64())})


def q22_idle_customers(
    sf_dir: str, broadcast_budget_rows: int = 20_000_000
) -> pa.Table:
    """TPC-H Q22-style global-sales-opportunity: customers with an
    above-average positive balance and NO orders, counted per market
    segment. The balance average comes from exact integer-cents moments
    (bit-equal threshold); the order-customer key set is the q4-style
    adaptive semi-join (distinct per batch, broadcast under budget,
    anti hash join above it)."""
    import numpy as np

    cust = _read(
        sf_dir, "customer", columns=["c_custkey", "c_mktsegment", "c_acctbal"]
    )

    def bal_partial(t: pa.Table) -> pa.Table:
        cents = _cents(t["c_acctbal"])
        posm = pc.fill_null(pc.greater(cents, 0), False)
        pos_c = pc.fill_null(cents.filter(posm), 0)
        return pa.table(
            {
                "s": pa.array([pc.sum(pos_c).as_py() or 0], pa.int64()),
                "n": pa.array([len(pos_c)], pa.int64()),
            }
        )

    bal = cust.map_batches(bal_partial, batch_format="pyarrow", zero_copy_batch=True).sum(
        ["s", "n"]
    )
    n_pos = int(bal["sum(n)"])
    avg_cents = float(bal["sum(s)"]) / n_pos if n_pos else float("inf")

    orders = _read(sf_dir, "orders", columns=["o_custkey"])

    def o_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["o_custkey"]))
        g = t.group_by(["o_custkey"]).aggregate([])
        # marker survives the left_outer join (Ray drops the right key
        # column); null marker == unmatched customer
        return g.append_column("hit", pa.array([1] * g.num_rows, pa.int8()))

    keys_ds = orders.map_batches(
        o_keys, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def seg_partial(t: pa.Table, member) -> pa.Table:
        cents = _cents(t["c_acctbal"])
        rich = pc.fill_null(
            pc.greater(pc.cast(cents, pa.float64()), avg_cents), False
        ).to_numpy(zero_copy_only=False)
        keep = rich & ~member(t["c_custkey"].combine_chunks())
        t2 = pa.table(
            {
                "c_mktsegment": t["c_mktsegment"],
                "bal": pc.cast(cents, pa.float64()),
                "one": pa.array([1.0] * t.num_rows, pa.float64()),
            }
        ).filter(pa.array(keep))
        return (
            t2.group_by(["c_mktsegment"])
            .aggregate([("one", "sum"), ("bal", "sum")])
            .rename_columns(["c_mktsegment", "n", "bal"])
        )

    if keys_ds.count() <= broadcast_budget_rows:
        kparts = collect_tables(keys_ds)
        keys = (
            np.unique(
                pc.drop_null(
                    pa.concat_tables(kparts)["o_custkey"].combine_chunks()
                ).to_numpy(zero_copy_only=False)
            )
            if kparts
            else np.array([], np.int64)
        )
        keys_ref = ray.put(keys)

        def partial(t: pa.Table) -> pa.Table:
            def member(col):
                hit, _ = _sorted_member(ray.get(keys_ref), col)
                return hit

            return seg_partial(t, member)

        per_seg = cust.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    else:
        attached = _attach_by_key(
            cust,
            [
                ("c_custkey", pa.int64()),
                ("c_mktsegment", pa.string()),
                ("c_acctbal", pa.float64()),
            ],
            "c_custkey",
            keys_ds,
            "o_custkey",
            [("hit", pa.int8())],
        )

        def partial_j(t: pa.Table) -> pa.Table:
            if "c_custkey" not in t.column_names:
                return pa.schema(
                    [
                        ("c_mktsegment", pa.string()),
                        ("n", pa.float64()),
                        ("bal", pa.float64()),
                    ]
                ).empty_table()
            has_order = pc.is_valid(t["hit"]).to_numpy(zero_copy_only=False)
            return seg_partial(t, lambda col: has_order)

        per_seg = attached.map_batches(partial_j, batch_format="pyarrow")

    agg = per_seg.groupby("c_mktsegment").aggregate(
        Sum("n", alias_name="n_f"), Sum("bal", alias_name="bal_f")
    )
    t = _collect(
        agg,
        pa.schema(
            [
                ("c_mktsegment", pa.string()),
                ("n_f", pa.float64()),
                ("bal_f", pa.float64()),
            ]
        ),
    )
    return pa.table(
        {
            "c_mktsegment": t["c_mktsegment"],
            "n_customers": pc.cast(t["n_f"], pa.int64()),
            "total_cents": pc.cast(t["bal_f"], pa.int64()),
        }
    ).sort_by([("c_mktsegment", "ascending")])
