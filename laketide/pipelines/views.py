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


class DerivedJoinView:
    """Materialized JOIN view maintained as a DERIVED LakeTable: base
    CDF rows, enriched by a broadcast dimension lookup (left join on
    ``on``), are re-applied into a second LakeTable through the same
    exactly-once epoch commit — the view inherits the engine's
    idempotency, atomic manifest swap, tombstone and lineage machinery
    instead of reinventing them.

    Unlike the driver-resident count/agg views above, the join view is
    TABLE-sized, so its state lives in a LakeTable (partitioned parquet,
    streaming reads), and its refresh watermark lives in the target's
    committed lineage (``source="join-view@<base_epoch>p<parts>"``) —
    written atomically with the epoch, so a crash between apply and any
    sidecar write can never leave the watermark ahead of or behind the
    applied state.

    Refresh is O(changes): one ``changes_dataset`` pass per refresh,
    each change row re-keyed to a view version ``v<base_epoch>`` that is
    strictly monotone in base epochs (so replayed/overlapping refreshes
    are stale-dropped or HWM-dropped by the normal apply path — an
    equal-version re-delivery can never overwrite). Bootstrap (first
    refresh, cross-rescale, or gc'd base epoch) streams the base
    snapshot as upserts plus an anti-join pass emitting deletes for
    target-live keys that vanished from the base while the view was
    offline. Base (commit, seq) ride along as ``base_commit`` /
    ``base_seq`` payload provenance.

    Reference analog: the denormalized read-model the reference serves
    from its API joins (vulnerabilities x source metadata,
    /root/reference/internal/api/server.go) — maintained incrementally
    instead of re-joined per query.
    """

    _SRC = "join-view@"
    # view events carry these payload provenance columns
    _PROVENANCE = ("base_commit", "base_seq")

    def __init__(
        self,
        base,
        target_dir: str,
        dim: pa.Table,
        on: str = "repo",
        num_partitions: int | None = None,
    ):
        from laketide import schema as S
        from laketide.pipelines.cdc import LakeTable

        if on not in dim.column_names:
            raise ValueError(f"join key {on!r} not in dim columns {dim.column_names}")
        # duplicate join-key values make the view ambiguous TWICE over:
        # _enrich's pc.index_in lookup serves whichever duplicate occurs
        # first in arrival order, while _dim_fp canonicalizes with a
        # stable sort — so two dims could serve different attributes yet
        # fingerprint identically and skip a needed re-enrich. Reject at
        # construction (null keys can never match a base row either).
        key = dim.column(on)
        if key.null_count:
            raise ValueError(f"dim join key {on!r} contains {key.null_count} null(s)")
        n_distinct = pc.count_distinct(key).as_py()
        if n_distinct != dim.num_rows:
            raise ValueError(
                f"dim join key {on!r} has duplicate values "
                f"({dim.num_rows - n_distinct} extra row(s)) — a lookup dim "
                "must be unique per key"
            )
        self.attrs = [c for c in dim.column_names if c != on]
        reserved = set(S.CORE_COLUMNS) | {
            S.SHA_COLUMN,
            S.APPLIED_EPOCH_COLUMN,
            S.DELETED_COLUMN,
            *self._PROVENANCE,
        }
        clash = reserved & set(self.attrs)
        if clash:
            raise ValueError(f"dim attribute(s) {sorted(clash)} collide with core columns")
        self.base = base
        self.dim = dim.combine_chunks()
        self.on = on
        self.target = LakeTable(
            target_dir, num_partitions=num_partitions or base.num_partitions
        )
        self._dim_ref = None  # ray.put handle, created lazily

    # ------------------------------------------------------------- internals
    def _dim_fp(self) -> str:
        """Deterministic dimension fingerprint (Arrow IPC bytes), stamped
        into the watermark so a CHANGED dim forces a re-enrich instead of
        silently serving mixed old/new attributes forever."""
        import hashlib
        import io

        # canonicalize first: sort by the join key and strip schema
        # metadata so a logically identical dim (different row order,
        # pandas metadata, chunking) cannot trigger a spurious
        # full re-enrich
        dim = self.dim.sort_by(self.on).replace_schema_metadata(None)
        sink = io.BytesIO()
        with pa.ipc.new_stream(sink, dim.schema) as w:
            w.write_table(dim)
        return hashlib.sha256(sink.getvalue()).hexdigest()[:12]

    def _applied(self) -> tuple[int, int, str | None] | None:
        """(base_epoch, base_partitions, dim_fp) of the newest COMMITTED
        view refresh — read from target lineage, newest first (lineage
        for an epoch beyond the committed manifest is a crash remnant and
        never consulted; non-view epochs interleaved by other writers are
        skipped). ``dim_fp`` is None for pre-fingerprint stamps."""
        from laketide.state import manifest as M

        ep = self.target.current_epoch()
        while ep > 0:
            doc = M.load_lineage(self.target.table_dir, ep)
            ep -= 1
            if not doc:
                continue  # gc'd lineage: keep scanning older epochs
            src = doc.get("source") or ""
            if src.startswith(self._SRC):
                base_ep, _, rest = src[len(self._SRC):].partition("p")
                parts, _, fp = rest.partition("d")
                return int(base_ep), int(parts), (fp or None)
        return None

    def _event_schema(self, man) -> pa.Schema:
        """Fixed view-event schema for this refresh: core + the base's
        payload columns + provenance + dim attributes. Every enriched
        block conforms to it, so bootstrap delete rows, CDF rows and
        snapshot rows union cleanly."""
        from laketide import schema as S
        from laketide.pipelines.cdc import _schema_from_b64

        base_sch = None
        if man is not None and man.stats.get("schema_b64"):
            base_sch = _schema_from_b64(man.stats["schema_b64"])
        if base_sch is None:
            base_sch = S.snapshot_schema()
        skip = set(S.CORE_COLUMNS) | {S.APPLIED_EPOCH_COLUMN, S.DELETED_COLUMN}
        fields = [
            pa.field("repo", pa.string()),
            pa.field("path", pa.string()),
            pa.field("commit", pa.string()),
            pa.field("seq", pa.int64()),
            pa.field("op", pa.string()),
        ]
        payload = [f for f in base_sch if f.name not in skip]
        # the constructor can only check core names — the base's PAYLOAD
        # columns are known here; a dim attr (or provenance name) that
        # shadows one would produce a duplicate-named schema field and
        # silently drop the base value before crashing downstream
        clash = {f.name for f in payload} & (set(self.attrs) | set(self._PROVENANCE))
        if clash:
            raise ValueError(
                f"dim attribute(s) {sorted(clash)} collide with the base "
                "table's payload columns"
            )
        fields += payload
        fields.append(pa.field("base_commit", pa.string()))
        fields.append(pa.field("base_seq", pa.int64()))
        fields += [self.dim.schema.field(a) for a in self.attrs]
        return pa.schema(fields)

    def _enrich(self, ds, commit_view: str, ev_schema: pa.Schema):
        """CDF / snapshot / delete-key blocks -> conformed view events:
        op from change_type (absent = upsert), synthesized view version,
        base provenance, broadcast dim lookup (left join)."""
        import ray

        if self._dim_ref is None:
            self._dim_ref = ray.put(self.dim)
        bc = self._dim_ref
        on, attrs = self.on, self.attrs

        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            if n == 0:
                return ev_schema.empty_table()
            dim = ray.get(bc)
            cols: dict = {}
            if "change_type" in t.column_names:
                op = pc.if_else(
                    pc.equal(t["change_type"], "delete"), "delete", "update"
                )
            else:
                op = pa.array(["update"] * n, pa.string())
            # bootstrap delete-key rows carry only (repo, path): a dim
            # keyed on a payload column looks up all-null there (the
            # delete ignores payload anyway)
            if on in t.column_names:
                idx = pc.index_in(
                    pc.cast(t[on], dim.schema.field(on).type), value_set=dim[on]
                )
            else:
                idx = pa.nulls(n, pa.int64())
            for field in ev_schema:
                name = field.name
                if name == "commit":
                    cols[name] = pa.array([commit_view] * n, pa.string())
                elif name == "seq":
                    cols[name] = pa.array([0] * n, pa.int64())
                elif name == "op":
                    cols[name] = pc.cast(op, pa.string())
                elif name == "base_commit":
                    cols[name] = (
                        pc.cast(t["commit"], pa.string())
                        if "commit" in t.column_names
                        else pa.nulls(n, pa.string())
                    )
                elif name == "base_seq":
                    cols[name] = (
                        pc.cast(t["seq"], pa.int64())
                        if "seq" in t.column_names
                        else pa.nulls(n, pa.int64())
                    )
                elif name in attrs:
                    cols[name] = dim[name].take(idx)
                elif name in t.column_names:
                    cols[name] = pc.cast(t[name], field.type)
                else:
                    cols[name] = pa.nulls(n, field.type)
            return pa.table(cols, schema=ev_schema)

        return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)

    def _vanished_keys(self):
        """Bootstrap anti-join: (repo, path) keys live in the TARGET but
        absent from the BASE (deleted while the view was offline /
        across a rescale). Skinny key rows through one coarse shuffle —
        min(side) per key decides; exact because all rows of a key
        co-locate."""
        import numpy as np

        from laketide.functions.dedup import _coarse_n_parts, _coarse_parts
        from laketide.functions.relational import _key_hash_u64

        n_parts = _coarse_n_parts()
        out_schema = pa.schema(
            [("repo", pa.string()), ("path", pa.string()), ("side", pa.int64())]
        )

        def _tag(side: int):
            def g(t: pa.Table) -> pa.Table:
                r = pa.table(
                    {
                        "repo": pc.cast(t["repo"], pa.string()),
                        "path": pc.cast(t["path"], pa.string()),
                        "side": pa.array([side] * t.num_rows, pa.int64()),
                    }
                )
                part = _coarse_parts(
                    _key_hash_u64(r["repo"]), _key_hash_u64(r["path"]), n_parts=n_parts
                )
                return r.append_column("_cpart", pa.array(part, pa.int64()))

            return g

        def only_target(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.schema([("repo", pa.string()), ("path", pa.string())]).empty_table()
            g = t.group_by(["repo", "path"]).aggregate([("side", "min")])
            g = g.filter(pc.equal(g["side_min"], 1))
            return g.select(["repo", "path"])

        base_keys = self.base.read(columns=["repo", "path"]).map_batches(
            _tag(0), batch_format="pyarrow", zero_copy_batch=True
        )
        target_keys = self.target.read(columns=["repo", "path"]).map_batches(
            _tag(1), batch_format="pyarrow", zero_copy_batch=True
        )
        return (
            base_keys.union(target_keys)
            .groupby("_cpart")
            .map_groups(
                lambda g: only_target(g.drop_columns(["_cpart"])),
                batch_format="pyarrow",
            )
        )

    # --------------------------------------------------------------- surface
    def refresh(self) -> dict:
        """Advance the view to the base's current epoch. Incremental
        (one CDF pass) when possible; bootstrap (snapshot upserts + an
        anti-join delete pass) on first use, across a rescale, or when
        the watermark epoch was gc'd; re-enrich (same bootstrap body,
        strictly newer generation) when the DIM fingerprint changed, so
        updated attributes reach every row instead of only base-changed
        keys. Idempotent under crash-retry and concurrent refreshers:
        the watermark commits atomically with the epoch, and a
        double-applied span converges because apply keeps exactly the
        newer-versioned row per key."""
        # the whole read-watermark -> build-version -> apply sequence
        # runs under a per-target REFRESH lock (distinct from the
        # table's writer lock, which apply_epoch takes internally): two
        # unserialized refreshers would read the same generation, build
        # EQUAL view versions, and the loser's watermark (possibly
        # carrying a different dim fingerprint) would commit over rows
        # it never applied
        rlock = self.target._acquire_lock("_VIEWLOCK")
        try:
            return self._refresh_locked()
        finally:
            self.target._release_lock(rlock)

    def _refresh_locked(self) -> dict:
        man = self.base.current_manifest()
        cur = man.epoch if man else 0
        cur_parts = man.num_partitions if man else self.base.num_partitions
        fp = self._dim_fp()
        st = self._applied()
        # a pre-fingerprint watermark (st[2] is None) must NOT noop: the
        # dim may have changed while the view ran an older build, and
        # "unknown" matching "anything" would persist stale attributes
        # until the next base epoch. One forced re-enrich stamps the
        # current fingerprint and the upgraded view converges.
        if st is not None and st[0] == cur and st[1] == cur_parts and st[2] == fp:
            return {"mode": "noop", "from_epoch": cur, "to_epoch": cur}
        # view version = (base epoch, refresh generation): the generation
        # makes a dim-change re-enrich at an UNCHANGED base epoch still
        # strictly newer than the previous refresh's rows, and a
        # double-applied span (crash-retry / concurrent refreshers)
        # converges because apply takes the newer row and drops the rest
        gen = self.target.current_epoch() + 1
        commit_view = f"v{cur:018d}-{gen:06d}"
        ev_schema = self._event_schema(man)
        # fingerprint-unknown (pre-fingerprint stamp) is treated as
        # changed: an empty incremental would stamp the new fp WITHOUT
        # reapplying attributes, freezing whatever the old build served
        dim_changed = st is not None and st[2] != fp
        mode, ds = "incremental", None
        if (
            st is None
            or st[1] != cur_parts
            or self.base.manifest_at(st[0]) is None
            or dim_changed
        ):
            mode = "re-enrich" if dim_changed else "bootstrap"
        else:
            try:
                ds = self.base.changes_dataset(st[0], cur)
            except ValueError:
                mode = "bootstrap"  # e.g. mid-span rescale manifest shape
        if mode != "incremental":
            ds = self.base.read()
            if self.target.current_epoch() > 0:
                deletes = self._vanished_keys().map_batches(
                    lambda t: t.append_column(
                        "change_type", pa.array(["delete"] * t.num_rows, pa.string())
                    ),
                    batch_format="pyarrow",
                )
                ds = self._enrich(ds, commit_view, ev_schema).union(
                    self._enrich(deletes, commit_view, ev_schema)
                )
            else:
                ds = self._enrich(ds, commit_view, ev_schema)
        else:
            ds = self._enrich(ds, commit_view, ev_schema)
        r = self.target.apply_epoch(ds, source=f"{self._SRC}{cur}p{cur_parts}d{fp}")
        return {
            "mode": mode,
            "from_epoch": st[0] if st else 0,
            "to_epoch": cur,
            "view_epoch": r["epoch"],
            "totals": r.get("totals", {}),
        }

    def read(self, columns: list[str] | None = None):
        """Streaming Dataset over the view's live rows."""
        return self.target.read(columns=columns)

    def state(self) -> pa.Table:
        """Materialized view state (small-result convenience)."""
        return self.target.state_table()
