"""Incremental materialized views over a LakeTable, maintained from the
change data feed.

A 100 TB table's downstream aggregates (per-language corpus counts,
per-repo row counts, dashboards) should NOT be recomputed by a full
scan after every commit epoch: the CDF between two epochs is
proportional to what CHANGED. ``IncrementalCountView`` keeps a grouped
count/size view exact across epochs by folding the Delta-CDF row pairs
(insert / delete / update_preimage / update_postimage — preimages
retract the old group's contribution when an update moves a row
between groups).

Reference analog: the reference recomputes its per-source
``processing_stats`` rollup per sync (reference:
migrations/001_initial_schema.up.sql:75-88, internal/jobs/handlers.go);
this generalizes that rollup to any group column and makes the refresh
cost O(changes), not O(table).

Scale shape: the CDF diff runs one Ray task per partition
(``changes_dataset``), the per-group deltas collapse inside each block
(Arrow group_by), and only dimension-sized (group, delta) partials
reach the driver where the view's running map lives. The bootstrap is
one streaming pass over ``table.read()`` with the same per-block
partials. Across a RESCALE boundary preimages are unavailable (skinny
old snapshots) — ``refresh`` detects the partition-count change and
falls back to a bootstrap recompute, so the view stays exact.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


class _IncrementalViewBase:
    """Shared refresh skeleton: epoch/rescale tracking, bootstrap-vs-
    incremental choice, CDF plumbing. Subclasses implement
    ``_bootstrap()`` and ``_fold(ds)`` (fold one signed CDF Dataset into
    the driver-resident state)."""

    _SIGNS = {
        "insert": 1,
        "update_postimage": 1,
        "delete": -1,
        "update_preimage": -1,
    }

    def __init__(self, table, group_col: str):
        self.table = table
        self.group_col = group_col
        self._as_of = 0
        self._as_of_partitions: int | None = None

    def _bootstrap(self) -> None:  # pragma: no cover - abstract
        raise NotImplementedError

    def _fold(self, ds) -> None:  # pragma: no cover - abstract
        raise NotImplementedError

    def refresh(self) -> dict:
        """Advance the view to the table's current epoch. Incremental
        (O(changes)) when possible; full bootstrap on first use or
        across a rescale. Returns {'mode', 'from_epoch', 'to_epoch'}."""
        man = self.table.current_manifest()
        cur = man.epoch if man else 0
        cur_parts = man.num_partitions if man else None
        if cur == self._as_of and cur_parts == self._as_of_partitions:
            return {"mode": "noop", "from_epoch": self._as_of, "to_epoch": cur}
        mode = "incremental"
        if (
            self._as_of == 0
            or self._as_of_partitions != cur_parts
            or self.table.manifest_at(self._as_of) is None  # gc'd base epoch
        ):
            self._bootstrap()
            mode = "bootstrap"
        else:
            try:
                # the rescale guard above compares CURRENT partition
                # counts, but a rescale between refreshes leaves the
                # base EPOCH manifest at the old count (maintenance
                # manifests are suffixed) — changes_dataset detects the
                # cross-rescale diff and refuses; recompute instead
                ds = self.table.changes_dataset(
                    self._as_of, cur, update_preimages=True
                )
            except ValueError:
                self._bootstrap()
                mode = "bootstrap"
            else:
                self._fold(ds)
        out = {"mode": mode, "from_epoch": self._as_of, "to_epoch": cur}
        self._as_of, self._as_of_partitions = cur, cur_parts
        return out


class IncrementalCountView(_IncrementalViewBase):
    """Exact grouped row-count + byte-size view over a LakeTable's live
    rows, refreshed incrementally from the change feed.

    ``view()`` returns the counts as of the last ``refresh()`` —
    a small Arrow table (group, n_rows, content_chars), group
    cardinality is assumed dimension-scale (driver-resident map)."""

    def __init__(self, table, group_col: str = "lang"):
        super().__init__(table, group_col)
        self._counts: dict = {}

    # ------------------------------------------------------------- internals
    def _deltas(self, ds, sign_by_type: dict, signed: bool) -> list[tuple]:
        """Collect per-group (n, bytes) deltas from a Dataset of rows
        carrying ``change_type`` (bootstrap scans pass signed=False:
        every row is +1)."""
        from laketide.functions.reads import collect_tables

        col = self.group_col
        type_arr = pa.array(list(sign_by_type), pa.string())
        sign_arr = None
        if sign_by_type:
            import numpy as np

            sign_arr = np.array(list(sign_by_type.values()), np.int64)

        def partial(t: pa.Table) -> pa.Table:
            import numpy as np

            n = t.num_rows
            # additive schema evolution: before the group column first
            # appears in the stream, every row belongs to the null group
            grp = t[col] if col in t.column_names else pa.nulls(n, pa.string())
            if signed:
                # vectorized sign lookup: unknown change types weigh 0
                idx = pc.index_in(t["change_type"], value_set=type_arr)
                pos = pc.fill_null(idx, 0).to_numpy(zero_copy_only=False)
                known = pc.is_valid(idx).to_numpy(zero_copy_only=False)
                sgn = np.where(known, sign_arr[pos.astype(np.int64)], 0)
            else:
                sgn = np.ones(n, np.int64)
            # CHARACTER count (utf8_length) — the repo/oracle convention
            # (DuckDB length(); apply.py's longest-merge measure); byte
            # length would diverge on non-ASCII content
            size = pc.fill_null(
                pc.cast(pc.utf8_length(pc.cast(t["content"], pa.string())), pa.int64()),
                0,
            )
            g = (
                pa.table(
                    {
                        "g": grp,
                        "dn": pa.array(sgn, pa.int64()),
                        "db": pc.multiply(pa.array(sgn, pa.int64()), size),
                    }
                )
                .group_by(["g"])
                .aggregate([("dn", "sum"), ("db", "sum")])
            )
            return g.rename_columns(["g", "dn", "db"])

        parts = collect_tables(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        )
        out = []
        for p in parts:
            out.extend(
                zip(p["g"].to_pylist(), p["dn"].to_pylist(), p["db"].to_pylist())
            )
        return out

    def _apply(self, deltas: list[tuple]) -> None:
        for g, dn, db in deltas:
            n, b = self._counts.get(g, (0, 0))
            n, b = n + dn, b + db
            if n == 0 and b == 0:
                self._counts.pop(g, None)
            else:
                self._counts[g] = (n, b)

    def _bootstrap(self) -> None:
        self._counts = {}
        try:
            ds = self.table.read(columns=[self.group_col, "content"])
        except KeyError:
            # group column not in the table schema yet (additive
            # evolution): every live row counts under the null group
            ds = self.table.read(columns=["content"])
        self._apply(self._deltas(ds, {}, signed=False))

    def _fold(self, ds) -> None:
        self._apply(self._deltas(ds, dict(self._SIGNS), signed=True))

    # --------------------------------------------------------------- surface
    def view(self) -> pa.Table:
        groups = sorted(self._counts, key=lambda g: (g is None, g))
        # infer the group column's type from the values (the group col
        # is whatever the caller chose — int keys crash a hardcoded
        # string type); empty/all-null views pin string
        gvals = (
            pa.array(groups)
            if any(g is not None for g in groups)
            else pa.array(groups, pa.string())
        )
        return pa.table(
            {
                self.group_col: gvals,
                "n_rows": pa.array(
                    [self._counts[g][0] for g in groups], pa.int64()
                ),
                "content_chars": pa.array(
                    [self._counts[g][1] for g in groups], pa.int64()
                ),
            }
        )


class IncrementalAggView(_IncrementalViewBase):
    """Exact grouped sum/min/max/count view over a numeric measure of a
    LakeTable's live rows, maintained incrementally from the change feed
    (the sum/min/max generalization of ``IncrementalCountView``).

    ``measure``: "length" (utf8 character count of ``value_col`` — the
    repo convention for content size) or "identity" (``value_col`` cast
    to int64). Nulls measure 0, matching the count view.

    Maintenance cost: count and sum are purely incremental (retractions
    subtract). min/max are incremental on the INSERT side; a retraction
    that touches a group's current extreme cannot be folded from the
    delta alone (another row may or may not still hold that value), so
    such groups are marked dirty and recomputed in ONE filtered scan at
    the end of the refresh — O(changes) in the common case, O(dirty
    groups' rows) when extremes retract, never O(table) unless every
    group's extreme changed."""

    def __init__(self, table, group_col: str = "lang", value_col: str = "content",
                 measure: str = "length"):
        if measure not in ("length", "identity"):
            raise ValueError(f"unknown measure {measure!r}")
        super().__init__(table, group_col)
        self.value_col = value_col
        self.measure = measure
        # group -> [count, sum, min, max]
        self._state: dict = {}

    # ------------------------------------------------------------- internals
    def _measure_expr(self, t: pa.Table) -> pa.Array:
        col = (
            t[self.value_col]
            if self.value_col in t.column_names
            else pa.nulls(t.num_rows, pa.string())
        )
        if self.measure == "length":
            v = pc.utf8_length(pc.cast(col, pa.string()))
        else:
            v = col
        return pc.fill_null(pc.cast(v, pa.int64()), 0)

    def _partials(self, ds, signed: bool) -> list[pa.Table]:
        """Per-block grouped partials: (g, dn, dv, ins_min, ins_max,
        ret_min, ret_max). Inserted rows feed ins_*, retracted rows feed
        ret_* (null where a block carries none)."""
        from laketide.functions.reads import collect_tables

        col = self.group_col
        signs = dict(self._SIGNS)
        type_arr = pa.array(list(signs), pa.string())
        measure = self._measure_expr

        def partial(t: pa.Table) -> pa.Table:
            import numpy as np

            n = t.num_rows
            grp = t[col] if col in t.column_names else pa.nulls(n, pa.string())
            v = measure(t)
            if signed:
                idx = pc.index_in(t["change_type"], value_set=type_arr)
                pos = pc.fill_null(idx, 0).to_numpy(zero_copy_only=False)
                known = pc.is_valid(idx).to_numpy(zero_copy_only=False)
                sign_arr = np.array(list(signs.values()), np.int64)
                sgn = np.where(known, sign_arr[pos.astype(np.int64)], 0)
            else:
                sgn = np.ones(n, np.int64)
            sgn_a = pa.array(sgn, pa.int64())
            pos_mask = pc.greater(sgn_a, 0)
            neg_mask = pc.less(sgn_a, 0)
            g = (
                pa.table(
                    {
                        "g": grp,
                        "dn": sgn_a,
                        "dv": pc.multiply(sgn_a, v),
                        "ins_v": pc.if_else(pos_mask, v, pa.nulls(n, pa.int64())),
                        "ret_v": pc.if_else(neg_mask, v, pa.nulls(n, pa.int64())),
                    }
                )
                .group_by(["g"])
                .aggregate(
                    [
                        ("dn", "sum"),
                        ("dv", "sum"),
                        ("ins_v", "min"),
                        ("ins_v", "max"),
                        ("ret_v", "min"),
                        ("ret_v", "max"),
                    ]
                )
            )
            return g.rename_columns(
                ["g", "dn", "dv", "ins_min", "ins_max", "ret_min", "ret_max"]
            )

        return collect_tables(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        )

    def _bootstrap(self) -> None:
        self._state = {}
        cols = [self.group_col, self.value_col]
        try:
            ds = self.table.read(columns=cols)
        except KeyError:
            ds = self.table.read(columns=[self.value_col])
        for p in self._partials(ds, signed=False):
            for row in p.to_pylist():
                g = row["g"]
                st = self._state.get(g)
                if st is None:
                    self._state[g] = [row["dn"], row["dv"], row["ins_min"], row["ins_max"]]
                else:
                    st[0] += row["dn"]
                    st[1] += row["dv"]
                    st[2] = min(st[2], row["ins_min"])
                    st[3] = max(st[3], row["ins_max"])

    def _fold(self, ds) -> None:
        dirty: set = set()
        for p in self._partials(ds, signed=True):
            for row in p.to_pylist():
                g = row["g"]
                st = self._state.get(g)
                if st is None:
                    st = self._state[g] = [0, 0, None, None]
                # a retraction touching the group's current extreme can't
                # be folded (another row may still hold the value) —
                # conservative dirty mark BEFORE applying the inserts
                if row["ret_min"] is not None and (
                    st[2] is None
                    or row["ret_min"] <= st[2]
                    or row["ret_max"] >= st[3]
                ):
                    dirty.add(g)
                st[0] += row["dn"]
                st[1] += row["dv"]
                if row["ins_min"] is not None:
                    st[2] = row["ins_min"] if st[2] is None else min(st[2], row["ins_min"])
                    st[3] = row["ins_max"] if st[3] is None else max(st[3], row["ins_max"])
        for g in [g for g, st in self._state.items() if st[0] == 0]:
            self._state.pop(g, None)
            dirty.discard(g)
        dirty &= set(self._state)
        if dirty:
            self._recompute_extremes(dirty)

    def _recompute_extremes(self, groups: set) -> None:
        """One filtered scan for every dirty group's min/max (count/sum
        stay incremental — they are exact under retraction)."""
        from laketide.functions.reads import collect_tables

        col = self.group_col
        want_list = sorted(g for g in groups if g is not None)
        want_null = None in groups
        measure = self._measure_expr

        def partial(t: pa.Table) -> pa.Table:
            n = t.num_rows
            grp = t[col] if col in t.column_names else pa.nulls(n, pa.string())
            if want_list:
                # typed from the live column: an empty/driver-built set
                # would be null-typed and crash is_in on string groups
                keep = pc.is_in(grp, value_set=pa.array(want_list, grp.type))
                if want_null:
                    keep = pc.or_kleene(keep, pc.is_null(grp))
            else:
                keep = pc.is_null(grp)
            keep = pc.fill_null(keep, False)
            t2 = pa.table({"g": grp, "v": measure(t)}).filter(keep)
            g = t2.group_by(["g"]).aggregate([("v", "min"), ("v", "max")])
            return g.rename_columns(["g", "v_min", "v_max"])

        try:
            ds = self.table.read(columns=[self.group_col, self.value_col])
        except KeyError:
            ds = self.table.read(columns=[self.value_col])
        agg: dict = {}
        for p in collect_tables(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        ):
            for row in p.to_pylist():
                cur = agg.get(row["g"])
                if cur is None:
                    agg[row["g"]] = [row["v_min"], row["v_max"]]
                else:
                    cur[0] = min(cur[0], row["v_min"])
                    cur[1] = max(cur[1], row["v_max"])
        for g in groups:
            st = self._state.get(g)
            if st is None:
                continue
            mm = agg.get(g)
            st[2], st[3] = (mm[0], mm[1]) if mm else (None, None)

    # --------------------------------------------------------------- surface
    def view(self) -> pa.Table:
        groups = sorted(self._state, key=lambda g: (g is None, g))
        gvals = (
            pa.array(groups)
            if any(g is not None for g in groups)
            else pa.array(groups, pa.string())
        )
        return pa.table(
            {
                self.group_col: gvals,
                "n_rows": pa.array([self._state[g][0] for g in groups], pa.int64()),
                "value_sum": pa.array([self._state[g][1] for g in groups], pa.int64()),
                "value_min": pa.array([self._state[g][2] for g in groups], pa.int64()),
                "value_max": pa.array([self._state[g][3] for g in groups], pa.int64()),
            }
        )
