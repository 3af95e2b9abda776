"""TPC-H completion family: the six queries the reporting layer still
lacked — customer order-count distribution (Q13), important parts by
revenue share (Q11, adapted: lineitem revenue replaces partsupp value),
part/supplier distinct counts (Q16), excess shippers (Q20, adapted:
shipped quantity replaces partsupp availqty), min-cost supplier per
part (Q2, adapted: lineitem unit price replaces partsupp supplycost)
and waiting suppliers (Q21, adapted: l_returnflag='R' replaces the
receipt>commit lateness predicate — the testdata schema carries no
commit/receipt dates and no partsupp table, so each adaptation keeps
the reference query's JOIN/EXISTS/distinct-count shape over the
columns that exist).

Reference parity: the reference engine's reporting layer is SQL
aggregates/joins over the merged store (reference:
sql/vulnerabilities.sql:1-90); like tpch.py these re-express the same
shapes Ray-Data-first.

Scale notes (100 TB lens): lineitem/orders/customer always STREAM.
True dimensions (part, supplier, nation, region) broadcast via
``ray.put`` sorted-array maps. Per-key aggregates that are bounded by
a dimension's cardinality (per-part revenue, per-supplier quantity)
collapse per batch BEFORE the shuffle and only the dimension-sized
aggregate is collected driver-side. Q21's orders side is ADAPTIVE:
filtered-key broadcast under a footer-derived row budget, else the
F-order keys ride the qualify exchange itself as a tagged side (fused
semi-join — one shuffle total, never two). Monetary sums are
integer cents; data-derived thresholds (Q11 revenue share, Q20 mean
quantity) are computed from exact integer sums with the division
written identically in the oracle, so the double compare is bit-equal.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from laketide.functions.relational import (
    _coarse_key_reduce,
    _key_hash_u64,
    _read,
    _sorted_member,
)
from laketide.functions.tpch import (
    _between,
    _collect,
    _dim,
    _gather,
    _map_arrays,
    _rev_cents,
    _table_rows,
)


# ------------------------------------------------------------------- Q13
def q13_order_count_distribution(sf_dir: str) -> pa.Table:
    """TPC-H Q13-style customer distribution: how many customers placed
    exactly N orders, INCLUDING the zero-order customers. Rides the
    distributed left-outer count (``customer_order_counts`` — both
    sides stream, nothing broadcast), then a second tiny groupby over
    the per-customer counts."""
    from laketide.functions.relational import customer_order_counts

    counts = customer_order_counts(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"c_count": pc.cast(t["n_orders"], pa.int64())})
            .group_by(["c_count"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {"c_count": g["c_count"], "custdist": pc.cast(g["count_all"], pa.int64())}
        )

    # per-batch histograms are at most |distinct order counts| rows each:
    # merge them driver-side instead of paying a second Ray aggregate's
    # ~2s fixed exchange cost (measured: 4.9s -> ~2.9s at sf0.1)
    t = _collect(
        counts.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        pa.schema([("c_count", pa.int64()), ("custdist", pa.int64())]),
    )
    g = t.group_by(["c_count"]).aggregate([("custdist", "sum")])
    t = pa.table(
        {"c_count": g["c_count"], "custdist": pc.cast(g["custdist_sum"], pa.int64())}
    )
    return t.sort_by([("custdist", "descending"), ("c_count", "descending")])


# ------------------------------------------------------------------- Q11
def q11_important_parts(sf_dir: str, fraction: float = 0.001) -> pa.Table:
    """TPC-H Q11-style important parts (adapted: no partsupp table, so
    'value' is lineitem revenue): parts whose revenue exceeds
    ``fraction`` of TOTAL revenue. Per-part partials collapse per
    batch; the per-part aggregate is part-cardinality (dimension
    scale), so the global total and share filter run driver-side over
    the collected aggregate — one streaming pass over lineitem."""
    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["l_partkey"]))
        g = (
            pa.table(
                {
                    "p_partkey": pc.cast(t["l_partkey"], pa.int64()),
                    "v": pc.cast(_rev_cents(t), pa.int64()),
                }
            )
            .group_by(["p_partkey"])
            .aggregate([("v", "sum")])
        )
        return g.rename_columns(["p_partkey", "v"])

    agg = (
        li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("p_partkey")
        .aggregate(Sum("v", alias_name="value_cents"))
    )
    t = _collect(agg, pa.schema([("p_partkey", pa.int64()), ("value_cents", pa.int64())]))
    total = pc.sum(t["value_cents"]).as_py() or 0
    # threshold compare written identically in the oracle: bit-equal
    thr = fraction * float(total)
    t = t.filter(
        pc.fill_null(pc.greater(pc.cast(t["value_cents"], pa.float64()), thr), False)
    )
    return t.sort_by([("value_cents", "descending"), ("p_partkey", "ascending")])


# ------------------------------------------------------------------- Q16
_Q16_SIZES = (1, 4, 9, 14, 19, 23, 36, 45)


def q16_part_supplier_counts(
    sf_dir: str, exclude_brand: str = "Brand#5"
) -> pa.Table:
    """TPC-H Q16-style supplier counts per (brand, type, size) for
    qualifying parts (brand excluded, size in a fixed set), counting
    DISTINCT suppliers. The part filter broadcasts (true dimension);
    lineitem streams with per-batch (brand,type,size,suppkey) quad
    dedup, one coarse quad-hash shuffle dedups globally, and only the
    tiny (brand,type,size) counts reach the driver."""
    part = _dim(sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"])
    size64 = pc.cast(part["p_size"], pa.int64())
    keep = pc.and_(
        pc.fill_null(pc.not_equal(part["p_brand"], exclude_brand), False),
        pc.fill_null(pc.is_in(size64, value_set=pa.array(_Q16_SIZES, pa.int64())), False),
    )
    psel = part.set_column(3, "p_size", size64).filter(keep)
    pkeys, brand, ptype, psize = _map_arrays(psel, "p_partkey", "p_brand", "p_type", "p_size")
    p_ref = ray.put((pkeys, brand, ptype, psize))
    quad = ["p_brand", "p_type", "p_size", "s_suppkey"]

    def dedup_quads(t: pa.Table) -> pa.Table:
        """Distinct (brand, type, size, suppkey) quads of one batch (or
        one co-located partition — associative, used both sides of the
        shuffle)."""
        if set(quad) <= set(t.column_names):
            g = t.select(quad).group_by(quad).aggregate([([], "count_all")])
            return g.select(quad)
        t = t.filter(pc.is_valid(t["l_suppkey"]))
        pkeys_, brand_, ptype_, psize_ = ray.get(p_ref)
        hit, b = _gather(pkeys_, brand_, t["l_partkey"])
        _, ty = _gather(pkeys_, ptype_, t["l_partkey"])
        _, sz = _gather(pkeys_, psize_, t["l_partkey"])
        g = (
            pa.table(
                {
                    "p_brand": b,
                    "p_type": ty,
                    "p_size": sz,
                    "s_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                }
            )
            .filter(pa.array(hit))
            .group_by(quad)
            .aggregate([([], "count_all")])
        )
        return g.select(quad)

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    uniq = _coarse_key_reduce(li, quad, dedup_quads)

    def partial_counts(t: pa.Table) -> pa.Table:
        g = (
            t.select(["p_brand", "p_type", "p_size"])
            .group_by(["p_brand", "p_type", "p_size"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "p_brand": g["p_brand"],
                "p_type": g["p_type"],
                "p_size": g["p_size"],
                "supplier_cnt": pc.cast(g["count_all"], pa.int64()),
            }
        )

    parts = uniq.map_batches(
        partial_counts, batch_format="pyarrow", zero_copy_batch=True
    )
    t = _collect(
        parts,
        pa.schema(
            [
                ("p_brand", pa.string()),
                ("p_type", pa.string()),
                ("p_size", pa.int64()),
                ("supplier_cnt", pa.int64()),
            ]
        ),
    )
    # quads are globally unique after the shuffle, but one (b,t,s) group
    # spans partitions: sum the partial counts driver-side (tiny)
    g = t.group_by(["p_brand", "p_type", "p_size"]).aggregate([("supplier_cnt", "sum")])
    return pa.table(
        {
            "p_brand": g["p_brand"],
            "p_type": g["p_type"],
            "p_size": g["p_size"],
            "supplier_cnt": pc.cast(g["supplier_cnt_sum"], pa.int64()),
        }
    ).sort_by(
        [
            ("supplier_cnt", "descending"),
            ("p_brand", "ascending"),
            ("p_type", "ascending"),
            ("p_size", "ascending"),
        ]
    )


# ------------------------------------------------------------------- Q20
_Q20_LO, _Q20_HI = "1997-01-01", "1998-01-01"


def q20_excess_shippers(sf_dir: str, ptype: str = "PROMO") -> pa.Table:
    """TPC-H Q20-style excess shippers (adapted: shipped quantity of
    one part type in one ship year replaces partsupp availqty):
    suppliers whose shipped quantity exceeds half the mean shipped
    quantity across qualifying suppliers. Quantities are integral, so
    the per-supplier sums are exact int64 and the mean threshold is
    one double division written identically in the oracle."""
    part = _dim(sf_dir, "part", ["p_partkey", "p_type"])
    psel = part.filter(pc.fill_null(pc.equal(part["p_type"], ptype), False))
    pk = psel["p_partkey"].combine_chunks()
    pk = pc.cast(pc.drop_null(pk), pa.int64()).to_numpy(zero_copy_only=False)
    p_ref = ray.put(np.sort(pk))

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(
                _between(t["l_shipdate"], _Q20_LO, _Q20_HI),
                pc.is_valid(t["l_suppkey"]),
            ),
            pc.is_valid(t["l_quantity"]),
        )
        t = t.filter(mask)
        hit, _pos = _sorted_member(ray.get(p_ref), pc.cast(t["l_partkey"], pa.int64()).combine_chunks())
        t = t.filter(pa.array(hit))
        g = (
            pa.table(
                {
                    "s_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                    "q": pc.cast(t["l_quantity"], pa.int64()),
                }
            )
            .group_by(["s_suppkey"])
            .aggregate([("q", "sum")])
        )
        return g.rename_columns(["s_suppkey", "q"])

    agg = (
        li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("s_suppkey")
        .aggregate(Sum("q", alias_name="total_qty"))
    )
    t = _collect(agg, pa.schema([("s_suppkey", pa.int64()), ("total_qty", pa.int64())]))
    if t.num_rows == 0:
        return pa.schema(
            [
                ("s_suppkey", pa.int64()),
                ("s_name", pa.string()),
                ("n_name", pa.string()),
                ("total_qty", pa.int64()),
            ]
        ).empty_table()
    total = pc.sum(t["total_qty"]).as_py() or 0
    thr = 0.5 * (float(total) / float(t.num_rows))
    t = t.filter(pc.greater(pc.cast(t["total_qty"], pa.float64()), thr))

    supp = _dim(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"])
    nation = _dim(sf_dir, "nation", ["n_nationkey", "n_name"])
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
    _, s_nat = _gather(
        *_map_arrays(
            pa.table(
                {
                    "s_suppkey": pc.cast(supp["s_suppkey"], pa.int64()),
                    "s_nationkey": pc.cast(supp["s_nationkey"], pa.int64()),
                }
            ),
            "s_suppkey",
            "s_nationkey",
        ),
        t["s_suppkey"],
    )
    s_hit, s_name = _gather(
        *_map_arrays(supp.select(["s_suppkey", "s_name"]), "s_suppkey", "s_name"),
        t["s_suppkey"],
    )
    n_hit, n_name = _gather(nkeys, nname, pa.chunked_array([s_nat]))
    out = pa.table(
        {
            "s_suppkey": t["s_suppkey"],
            "s_name": s_name,
            "n_name": n_name,
            "total_qty": t["total_qty"],
        }
    ).filter(
        # inner-join semantics on BOTH dims: a supplier missing from the
        # supplier table OR with a null/dangling nationkey drops, exactly
        # like the oracle's JOIN supplier JOIN nation chain
        pa.array(s_hit & n_hit)
    )
    return out.sort_by([("s_name", "ascending"), ("s_suppkey", "ascending")])


# -------------------------------------------------------------------- Q2
def q2_min_cost_supplier(
    sf_dir: str, region: str = "EUROPE", ptype: str = "LARGE", k: int = 100
) -> pa.Table:
    """TPC-H Q2-style min-cost supplier (adapted: lineitem unit price
    ``l_extendedprice/l_quantity`` replaces partsupp supplycost): for
    each part of one type, the cheapest region supplier that actually
    shipped it (ties: lowest unit cost, then lowest suppkey). Lineitem
    streams through a per-batch argmin that collapses each batch to
    ≤ one row per part before the coarse shuffle; the final per-part
    winners are part-cardinality and finish driver-side."""
    nation = _dim(sf_dir, "nation", ["n_nationkey", "n_regionkey", "n_name"])
    reg = _dim(sf_dir, "region", ["r_regionkey", "r_name"])
    rkeys = pc.cast(
        reg.filter(pc.fill_null(pc.equal(reg["r_name"], region), False))["r_regionkey"],
        pa.int64(),
    )
    nsel = nation.filter(
        pc.is_in(pc.cast(nation["n_regionkey"], pa.int64()), value_set=rkeys.combine_chunks())
    )
    nkeys, nname = _map_arrays(
        pa.table(
            {
                "n_nationkey": pc.cast(nsel["n_nationkey"], pa.int64()),
                "n_name": nsel["n_name"],
            }
        ),
        "n_nationkey",
        "n_name",
    )
    supp = _dim(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"])
    s_hit, s_nname = _gather(nkeys, nname, pc.cast(supp["s_nationkey"], pa.int64()))
    ssel = supp.append_column("n_name", s_nname).filter(pa.array(s_hit))
    skeys, sname, sbal, snat = _map_arrays(
        pa.table(
            {
                "s_suppkey": pc.cast(ssel["s_suppkey"], pa.int64()),
                "s_name": ssel["s_name"],
                "s_acctbal": pc.cast(ssel["s_acctbal"], pa.float64()),
                "n_name": ssel["n_name"],
            }
        ),
        "s_suppkey",
        "s_name",
        "s_acctbal",
        "n_name",
    )
    part = _dim(sf_dir, "part", ["p_partkey", "p_type"])
    pk = part.filter(pc.fill_null(pc.equal(part["p_type"], ptype), False))["p_partkey"]
    pk = pc.cast(pc.drop_null(pk.combine_chunks()), pa.int64()).to_numpy(zero_copy_only=False)
    p_ref = ray.put(np.sort(pk))
    sk_ref = ray.put(skeys)

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"])

    def argmin(t: pa.Table) -> pa.Table:
        """≤ one (part, supplier, cost) winner per part — associative,
        runs per batch and again per co-located partition."""
        if "unit_cost" not in t.column_names:
            mask = pc.and_(
                pc.and_(pc.is_valid(t["l_extendedprice"]), pc.is_valid(t["l_suppkey"])),
                pc.fill_null(pc.greater(t["l_quantity"], 0.0), False),
            )
            t = t.filter(mask)
            pkeys_ = ray.get(p_ref)
            skeys_ = ray.get(sk_ref)
            ph, _ = _sorted_member(pkeys_, pc.cast(t["l_partkey"], pa.int64()).combine_chunks())
            sh, _ = _sorted_member(skeys_, pc.cast(t["l_suppkey"], pa.int64()).combine_chunks())
            t = t.filter(pa.array(ph & sh))
            t = pa.table(
                {
                    "p_partkey": pc.cast(t["l_partkey"], pa.int64()),
                    "s_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                    "unit_cost": pc.divide(
                        pc.cast(t["l_extendedprice"], pa.float64()),
                        pc.cast(t["l_quantity"], pa.float64()),
                    ),
                }
            )
        if t.num_rows == 0:
            return t
        pkv = t["p_partkey"].to_numpy(zero_copy_only=False)
        cost = t["unit_cost"].to_numpy(zero_copy_only=False)
        skv = t["s_suppkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((skv, cost, pkv))
        first = np.ones(len(order), dtype=bool)
        first[1:] = pkv[order][1:] != pkv[order][:-1]
        return t.take(pa.array(order[first], pa.int64()))

    winners = _coarse_key_reduce(li, ["p_partkey"], argmin)
    t = _collect(
        winners,
        pa.schema(
            [("p_partkey", pa.int64()), ("s_suppkey", pa.int64()), ("unit_cost", pa.float64())]
        ),
    )
    _, w_name = _gather(skeys, sname, t["s_suppkey"])
    _, w_bal = _gather(skeys, sbal, t["s_suppkey"])
    _, w_nat = _gather(skeys, snat, t["s_suppkey"])
    out = pa.table(
        {
            "s_acctbal": w_bal,
            "s_name": w_name,
            "n_name": w_nat,
            "p_partkey": t["p_partkey"],
            "unit_cost": t["unit_cost"],
        }
    ).sort_by(
        [
            ("s_acctbal", "descending"),
            ("n_name", "ascending"),
            ("s_name", "ascending"),
            ("p_partkey", "ascending"),
        ]
    )
    return out.slice(0, k)


# ------------------------------------------------------------------- Q21
def q21_waiting_suppliers(
    sf_dir: str, k: int = 20, broadcast_budget_rows: int = 5_000_000
) -> pa.Table:
    """TPC-H Q21-style waiting suppliers (adapted: 'this supplier
    returned goods' ``l_returnflag='R'`` replaces receipt>commit — no
    commit/receipt dates in the schema): per supplier, the number of
    'F'-status multi-supplier orders where it was the ONLY supplier
    with a returned line. The EXISTS / NOT-EXISTS pair becomes
    per-order segment counts after one coarse shuffle keyed on the
    order. The filtered orders side is ADAPTIVE: key-set broadcast
    under a footer-derived budget, else the F-keys are tagged into the
    qualify exchange itself (fused semi-join, one shuffle total)."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_returnflag"])
    o_f = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"]).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": pc.cast(
                    t.filter(
                        pc.fill_null(pc.equal(t["o_orderstatus"], "F"), False)
                    )["o_orderkey"],
                    pa.int64(),
                )
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def to_pairs(t: pa.Table) -> pa.Table:
        """(orderkey, suppkey, any_r) partials — associative max."""
        t = t.filter(pc.and_(pc.is_valid(t["l_orderkey"]), pc.is_valid(t["l_suppkey"])))
        r = pc.cast(
            pc.fill_null(pc.equal(t["l_returnflag"], "R"), False), pa.int64()
        )
        g = (
            pa.table(
                {
                    "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                    "l_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                    "any_r": r,
                }
            )
            .group_by(["l_orderkey", "l_suppkey"])
            .aggregate([("any_r", "max")])
        )
        return g.rename_columns(["l_orderkey", "l_suppkey", "any_r"])

    def qualify(t: pa.Table) -> pa.Table:
        """Per co-located partition: combine pair partials, then per
        ORDER segment counts -> qualifying (supplier, 1) rows."""
        if t.num_rows == 0:
            return pa.schema([("s_suppkey", pa.int64()), ("numwait", pa.int64())]).empty_table()
        g = (
            t.group_by(["l_orderkey", "l_suppkey"])
            .aggregate([("any_r", "max")])
            .rename_columns(["l_orderkey", "l_suppkey", "any_r"])
            .sort_by([("l_orderkey", "ascending")])
        )
        ok = g["l_orderkey"].to_numpy(zero_copy_only=False)
        anyr = g["any_r"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        seg_len = np.diff(np.r_[starts, len(ok)])
        seg_r = np.add.reduceat(anyr, starts)
        n_supp = np.repeat(seg_len, seg_len)
        n_r = np.repeat(seg_r, seg_len)
        mask = (anyr == 1) & (n_supp >= 2) & (n_r == 1)
        win = (
            pa.table({"s_suppkey": g["l_suppkey"].combine_chunks().filter(pa.array(mask))})
            .group_by(["s_suppkey"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {"s_suppkey": win["s_suppkey"], "numwait": pc.cast(win["count_all"], pa.int64())}
        )

    from laketide.functions.dedup import _coarse_n_parts, _coarse_parts

    n_parts = _coarse_n_parts()

    def route(t: pa.Table) -> pa.Table:
        part = _coarse_parts(
            _key_hash_u64(t["l_orderkey"].combine_chunks()), n_parts=n_parts
        )
        return t.append_column("_cpart", pa.array(part, pa.int64()))

    if _table_rows(sf_dir, "orders") <= broadcast_budget_rows:
        # broadcast path: the F-order key set ships once via ray.put and
        # the lineitem scan filters before its one qualify shuffle
        keys_t = _collect(o_f, pa.schema([("o_orderkey", pa.int64())]))
        okeys = np.sort(
            pc.drop_null(keys_t["o_orderkey"].combine_chunks()).to_numpy(
                zero_copy_only=False
            )
        )
        ok_ref = ray.put(okeys)

        def filt(t: pa.Table) -> pa.Table:
            t = to_pairs(t)
            hit, _ = _sorted_member(ray.get(ok_ref), t["l_orderkey"].combine_chunks())
            return route(t.filter(pa.array(hit)))

        tagged = li.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)

        def finish(g: pa.Table) -> pa.Table:
            return qualify(g.drop_columns(["_cpart"]))

    else:
        # over-budget path: fuse the semi-join INTO the qualify shuffle —
        # pair partials (side 0) and F-order keys (side 1) co-partition on
        # the same orderkey hash, one exchange total (an _attach_by_key
        # pass here would shuffle the identical rows on the identical key
        # a second time just to carry an is_f flag)
        def tag_pairs(t: pa.Table) -> pa.Table:
            p = to_pairs(t)
            return route(p).append_column(
                "side", pa.array(np.zeros(p.num_rows, np.int8), pa.int8())
            )

        def tag_keys(t: pa.Table) -> pa.Table:
            key = pc.drop_null(t["o_orderkey"].combine_chunks())
            p = pa.table(
                {
                    "l_orderkey": key,
                    "l_suppkey": pa.nulls(len(key), pa.int64()),
                    "any_r": pa.nulls(len(key), pa.int64()),
                }
            )
            return route(p).append_column(
                "side", pa.array(np.ones(len(key), np.int8), pa.int8())
            )

        tagged = li.map_batches(
            tag_pairs, batch_format="pyarrow", zero_copy_batch=True
        ).union(o_f.map_batches(tag_keys, batch_format="pyarrow", zero_copy_batch=True))

        def finish(g: pa.Table) -> pa.Table:
            side = g["side"].to_numpy(zero_copy_only=False)
            fkeys = np.unique(
                g.filter(pa.array(side == 1))["l_orderkey"].to_numpy(
                    zero_copy_only=False
                )
            )
            pr = g.filter(pa.array(side == 0)).drop_columns(["_cpart", "side"])
            hit, _ = _sorted_member(fkeys, pr["l_orderkey"].combine_chunks())
            return qualify(pr.filter(pa.array(hit)))

    partials = tagged.groupby("_cpart").map_groups(finish, batch_format="pyarrow")
    t = _collect(partials, pa.schema([("s_suppkey", pa.int64()), ("numwait", pa.int64())]))
    # supplier-cardinality aggregate: finish driver-side
    g = t.group_by(["s_suppkey"]).aggregate([("numwait", "sum")])
    supp = _dim(sf_dir, "supplier", ["s_suppkey", "s_name"])
    skeys, sname = _map_arrays(
        pa.table(
            {
                "s_suppkey": pc.cast(supp["s_suppkey"], pa.int64()),
                "s_name": supp["s_name"],
            }
        ),
        "s_suppkey",
        "s_name",
    )
    hit, names = _gather(skeys, sname, g["s_suppkey"])
    out = pa.table(
        {
            "s_suppkey": g["s_suppkey"],
            "s_name": names,
            "numwait": pc.cast(g["numwait_sum"], pa.int64()),
        }
    ).filter(pa.array(hit))
    out = out.sort_by(
        [("numwait", "descending"), ("s_name", "ascending"), ("s_suppkey", "ascending")]
    )
    return out.slice(0, k)
