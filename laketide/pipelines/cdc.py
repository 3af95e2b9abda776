"""Epoch orchestration: one epoch = one Ray Data pipeline.

    read_parquet(events)                         # bounded epoch slice
      -> map_batches(NormalizeEvents)            # stateless, zero-copy Arrow
      -> groupby(_part).map_groups(apply)        # THE one shuffle per epoch
           (HWM replay filter -> in-partition dedup+LWW reduce
            -> pyarrow join vs snapshot partition -> staging write)
      -> metrics rows (P small rows)             # driver-side finalize
    finalize: promote staging -> data, write lineage, atomic manifest swap.

Reference lifecycle analog (SURVEY.md §3.3): fetch -> normalize ->
alias-match -> priority-merge -> ON CONFLICT upsert -> processing_stats.

Scale notes (100 TB design): the only all-to-all exchange is the
hash-partition groupby on ``_part``; partition count P is fixed per table
so events co-locate with their snapshot partition; per-partition state is
loaded once per epoch inside the group task (not per batch); hot repos
spread across partitions because the hash covers the full (repo, path)
key; blocks stay Arrow end-to-end.

NOTE (driver contract): no ray.init()/ray.shutdown() in this module.
"""

from __future__ import annotations

import base64
import json
import os
from contextlib import contextmanager

import numpy as np
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from laketide import schema as S
from laketide.stages.apply import ApplyMetrics, apply_partition, reduce_events
from laketide.stages.normalize import NormalizeEvents
from laketide.stages.partition import DEFAULT_NUM_PARTITIONS
from laketide.state import manifest as M

__all__ = ["LakeTable"]

_METRIC_FIELDS = [
    "events_in",
    "dupes_dropped",
    "replays_dropped",
    "malformed",
    "stale_dropped",
    "inserts",
    "updates",
    "deletes",
    "noop_deletes",
    "noops",
    "rows_out",
]

METRICS_SCHEMA = pa.schema(
    [("part", pa.int64()), ("changed", pa.bool_()), ("staged_file", pa.string()), ("kind", pa.string())]
    + [(f, pa.int64()) for f in _METRIC_FIELDS]
    + [("hwm_commit", pa.string()), ("hwm_seq", pa.int64()), ("schema_b64", pa.string())]
)


# Low-cardinality string columns worth dictionary-encoding in every
# parquet file this engine writes. `content` is deliberately excluded:
# KB-sized near-unique bodies make the writer build (then abandon) a
# useless dictionary page, costing CPU + memory on the hot path.
_DICT_COLS = ("repo", "path", "lang", S.OP_COLUMN)


def adaptive_write_kwargs(table: pa.Table) -> dict:
    """Parquet writer options for hot-path writes (spill + staged
    partitions). Wide rows (KB-sized contents) get zstd-1 — ~2x fewer
    bytes through the box's shared disk, which is the binding 2->8
    scaling ceiling for heavy-content replays (see BENCH/BASELINE.md
    hardware disclosure); narrow rows keep snappy, whose lower CPU wins
    there (measured ~20%). Dictionary encoding is pinned to the
    low-cardinality key columns only."""
    dict_cols = [c for c in _DICT_COLS if c in table.column_names]
    wide = table.num_rows > 0 and (table.nbytes / table.num_rows) > 600
    kw: dict = {"use_dictionary": dict_cols}
    if wide:
        kw.update(compression="zstd", compression_level=1)
    else:
        kw.update(compression="snappy")
    return kw


def _schema_to_b64(schema: pa.Schema) -> str:
    return base64.b64encode(schema.serialize().to_pybytes()).decode()


def _manifest_recency(path: str) -> "tuple[int, float, str]":
    """Sort key (epoch, mtime, path) for manifest files — lexicographic
    name order mis-sorts maintenance manifests ('-' < '.', so
    manifest-000005-c0 would list BEFORE manifest-000005). ONE shared
    implementation: gc and history must agree on recency or gc could
    keep/delete a different set than history displays."""
    import re as _re

    m = _re.match(r"manifest-(\d+)", os.path.basename(path))
    return (int(m.group(1)) if m else -1, os.path.getmtime(path), path)


def _schema_from_b64(s: str) -> pa.Schema:
    return pa.ipc.read_schema(pa.BufferReader(base64.b64decode(s)))


def _make_group_fn(
    table_dir: str,
    epoch_id: int,
    hwms: dict[int, tuple[str, int]],
    part_info: dict[int, dict],
    hwm_filter: bool,
    strategy: str = "lww",
    layout: str = "cow",
    compact_threshold: int = 8,
    dlq_dir: str | None = None,
    map_partials: dict[int, list[int]] | None = None,
):
    """Build the per-partition apply function run by map_groups.

    Writes its staging file as a deterministic, truncate-on-write side
    effect (safe under Ray task retries) and returns one metrics row.
    With ``dlq_dir``, malformed rows are quarantined there instead of
    only counted (I6 dead-letter queue).

    ``map_partials`` (filled in-place by the storage exchange AFTER the
    spill stage, BEFORE reduce tasks serialize) carries the map-side
    combiner's per-partition [dropped_events, dupes, replays] so the
    metrics/lineage rows stay identical with or without the combiner.
    ``apply_group(None, part)`` produces the metrics row for a
    partition whose events were ALL dropped map-side."""
    staging_dir = os.path.join(table_dir, "_staging", f"epoch-{epoch_id:06d}")
    map_partials = map_partials if map_partials is not None else {}

    def apply_group(group: pa.Table | None, part: int | None = None) -> pa.Table:
        from laketide.stages.apply import limit_arrow_threads, write_dlq

        limit_arrow_threads(1)
        if group is None:
            # partials-only partition: every event was collapsed or
            # HWM-filtered on the map side — run the normal apply with
            # zero events so the state/compaction/metrics behavior is
            # byte-identical to an all-replay group arriving.
            group = pa.table(
                {
                    "repo": pa.array([], pa.string()),
                    "path": pa.array([], pa.string()),
                    "commit": pa.array([], pa.string()),
                    "seq": pa.array([], pa.int64()),
                    S.OP_COLUMN: pa.array([], pa.string()),
                    S.SHA_COLUMN: pa.array([], pa.string()),
                    S.PART_COLUMN: pa.array([], pa.int64()),
                    S.MALFORMED_COLUMN: pa.array([], pa.bool_()),
                }
            )
        else:
            part = group[S.PART_COLUMN][0].as_py()
        m = ApplyMetrics(events_in=group.num_rows)
        pp = map_partials.get(part)
        if pp:
            m.events_in += pp[0]
            m.dupes_dropped += pp[1]
            m.replays_dropped += pp[2]
        mal = group[S.MALFORMED_COLUMN]
        m.malformed = int(pc.sum(mal).as_py() or 0)
        hwm_c, hwm_s = hwms.get(part, ("", -1))
        if dlq_dir is not None and m.malformed:
            # idempotent-replay holds for the DLQ too: a redelivered
            # malformed row at-or-below the HWM was quarantined by the
            # epoch that advanced the mark (rows with a null version
            # have nothing to dedup on and are kept)
            bad = group.filter(mal)
            if hwm_filter and hwm_c:
                fresh_b = pc.or_(
                    pc.greater(bad["commit"], hwm_c),
                    pc.and_(
                        pc.equal(bad["commit"], hwm_c),
                        pc.greater(bad["seq"], hwm_s),
                    ),
                )
                bad = bad.filter(pc.fill_null(fresh_b, True))
            if bad.num_rows:
                write_dlq(dlq_dir, part, bad)
        ev = group.filter(pc.invert(mal)).drop_columns(
            [S.PART_COLUMN, S.MALFORMED_COLUMN]
        )

        # Replay dedup via the partition high-water mark (I3/I4). Safe
        # under the WAL-tail assumption: cross-epoch delivery is
        # partition-ordered; in-epoch order is arbitrary.
        if hwm_filter and hwm_c and ev.num_rows:
            fresh = pc.or_(
                pc.greater(ev["commit"], hwm_c),
                pc.and_(pc.equal(ev["commit"], hwm_c), pc.greater(ev["seq"], hwm_s)),
            )
            fresh = pc.fill_null(fresh, False)
            m.replays_dropped += ev.num_rows - int(pc.sum(fresh).as_py() or 0)
            ev = ev.filter(fresh)

        # Advance the HWM over everything delivered this epoch.
        new_c, new_s = hwm_c, hwm_s
        if ev.num_rows:
            max_c = pc.max(ev["commit"]).as_py()
            at_max = pc.equal(ev["commit"], max_c)
            max_s = pc.max(pc.if_else(at_max, ev["seq"], pa.scalar(None, pa.int64()))).as_py()
            if (max_c, max_s) > (new_c, new_s):
                new_c, new_s = max_c, int(max_s)
        m.hwm_commit, m.hwm_seq = new_c, new_s

        from laketide.stages.apply import ensure_sha

        winners = ensure_sha(reduce_events(ev, m, strategy))

        info = part_info.get(part) or {}
        base_rel = info.get("file")
        delta_rels = info.get("deltas") or []
        prev_rows = int(info.get("rows", 0))

        kind = "base"
        if layout == "mor" and (len(delta_rels) + 1) <= compact_threshold:
            # ---- merge-on-read fast path: classify vs the key INDEX
            # (never reads `content` of the base), append a delta file.
            out, _ = _mor_delta(
                table_dir, base_rel, delta_rels, winners, epoch_id, m
            )
            kind = "delta"
            m.rows_out = prev_rows + m.inserts - m.deletes
        else:
            # ---- copy-on-write (or mor compaction): full merge, new base
            from laketide.stages.apply import merge_partition

            cur = None
            if layout == "mor" and (base_rel or delta_rels):
                base_t = (
                    pq.read_table(os.path.join(table_dir, base_rel)) if base_rel else None
                )
                deltas_t = [
                    pq.read_table(os.path.join(table_dir, r)) for r in delta_rels
                ]
                # keep tombstones through compaction: they must keep
                # shadowing late-arriving older events
                cur = merge_partition(base_t, deltas_t, strategy, keep_tombstones=True)
            elif base_rel:
                cur = pq.read_table(os.path.join(table_dir, base_rel))

            out = apply_partition(cur, winners, epoch_id, m, strategy)
            live = pc.fill_null(out[S.DELETED_COLUMN], False) if S.DELETED_COLUMN in out.column_names else None
            m.rows_out = out.num_rows - (int(pc.sum(live).as_py() or 0) if live is not None else 0)

        # noops (content-identical version advances) and noop_deletes
        # (retained tombstones for unseen keys) mutate persistent state:
        # skipping them would leave the stored (commit, seq) stale, so a
        # late intermediate event could wrongly win a future LWW compare
        # (apply.py:241-245). They count as changes.
        changed = (m.inserts + m.updates + m.deletes + m.noops + m.noop_deletes) > 0
        if layout == "mor" and kind == "base" and delta_rels:
            changed = True  # compaction must commit even with zero mutations

        staged = ""
        if changed:
            os.makedirs(staging_dir, exist_ok=True)
            suffix = "-delta" if kind == "delta" else ""
            staged = os.path.join(staging_dir, f"part-{part:05d}{suffix}.parquet")
            tmp = staged + f".tmp-{os.getpid()}"
            pq.write_table(out, tmp, **adaptive_write_kwargs(out))
            os.replace(tmp, staged)  # truncate-on-write; retry-safe

        row: dict[str, Any] = {"part": [part], "changed": [changed], "staged_file": [staged], "kind": [kind]}
        for f in _METRIC_FIELDS:
            row[f] = [getattr(m, f)]
        row["hwm_commit"] = [m.hwm_commit]
        row["hwm_seq"] = [m.hwm_seq]
        # Manifest schema describes the MATERIALIZED state: the delta
        # file's op column is write-side only (merge_partition drops it).
        state_schema = pa.schema([f for f in out.schema if f.name != S.OP_COLUMN])
        row["schema_b64"] = [_schema_to_b64(state_schema)]
        return pa.table(row).cast(METRICS_SCHEMA)

    return apply_group


_IDX_COLS = ["repo", "path", "commit", "seq", S.SHA_COLUMN, S.APPLIED_EPOCH_COLUMN]


def _mor_delta(table_dir, base_rel, delta_rels, winners, epoch_id, m):
    """Merge-on-read delta append: classify the epoch's winners against
    the partition's key index (base read WITHOUT content + prior deltas),
    return the delta table to stage. The read-side ``merge_partition``
    fold guarantees correctness; the classification exists for metrics,
    no-op skip (R1) and tombstone-for-absent-key suppression."""
    from laketide.stages.apply import _bool, _version_newer, reduce_events

    idx_tables = []
    if base_rel:
        pf = pq.ParquetFile(os.path.join(table_dir, base_rel))
        base_cols = list(_IDX_COLS)
        has_del = S.DELETED_COLUMN in pf.schema_arrow.names
        if has_del:
            base_cols.append(S.DELETED_COLUMN)
        t0 = pf.read(columns=base_cols)
        # base files RETAIN tombstones (compaction keeps them): a dead
        # key must re-enter the index as a delete version, or a newer
        # insert would be misclassified as an update (wrong metrics,
        # drifting rows accounting) — same rule as merge_partition.
        if has_del:
            was_del = pc.fill_null(t0[S.DELETED_COLUMN], False)
            ops = pc.if_else(was_del, pa.scalar("delete"), pa.scalar("insert"))
            t0 = t0.drop_columns([S.DELETED_COLUMN]).append_column(
                S.OP_COLUMN, ops.combine_chunks()
            )
        else:
            t0 = t0.append_column(
                S.OP_COLUMN, pa.array(["insert"] * t0.num_rows, pa.string())
            )
        idx_tables.append(t0)
    for rel in delta_rels:
        t1 = pq.read_table(os.path.join(table_dir, rel), columns=_IDX_COLS + [S.OP_COLUMN])
        idx_tables.append(t1.select(_IDX_COLS + [S.OP_COLUMN]))
    cur_idx = None
    if idx_tables:
        idx = pa.concat_tables([t.select(_IDX_COLS + [S.OP_COLUMN]) for t in idx_tables])
        # keep DEAD keys in the index: their tombstone version must
        # shadow late-arriving older events
        cur_idx = reduce_events(idx, ApplyMetrics())

    if cur_idx is None or cur_idx.num_rows == 0:
        is_del = _bool(pc.equal(winners[S.OP_COLUMN], "delete"))
        m.noop_deletes += int(pc.sum(is_del).as_py() or 0)
        m.inserts += winners.num_rows - int(pc.sum(is_del).as_py() or 0)
        applied = winners  # tombstones for unseen keys are retained
    else:
        # Arrow's hash join rejects list-typed non-key columns — detach
        # them from winners with a row-id surrogate and re-attach by
        # take after the join (cur_idx carries only scalar index
        # columns). Every row of a LEFT OUTER join has a valid left rid.
        list_cols = [
            f.name
            for f in winners.schema
            if pa.types.is_list(f.type) or pa.types.is_large_list(f.type)
        ]
        w_j = winners
        if list_cols:
            w_j = winners.drop_columns(list_cols).append_column(
                "_ev_rid", pa.array(np.arange(winners.num_rows, dtype=np.int64))
            )
        j = w_j.join(
            cur_idx,
            keys=list(S.KEY_COLUMNS),
            join_type="left outer",
            right_suffix="_cur",
        )
        if list_cols:
            rid = j["_ev_rid"].combine_chunks()
            for c in list_cols:
                j = j.append_column(c, winners[c].combine_chunks().take(rid))
            j = j.drop_columns(["_ev_rid"])
        has_cur = pc.is_valid(j["commit_cur"])
        ev_c = pc.coalesce(j["commit"], pa.scalar("", pa.string()))
        ev_s = pc.coalesce(j["seq"], pa.scalar(-1, pa.int64()))
        cur_c = pc.coalesce(j["commit_cur"], pa.scalar("", pa.string()))
        cur_s = pc.coalesce(j["seq_cur"], pa.scalar(-1, pa.int64()))
        newer = _bool(_version_newer(ev_c, ev_s, cur_c, cur_s))
        is_del = _bool(pc.equal(j[S.OP_COLUMN], "delete"))
        cur_live = pc.and_(
            has_cur,
            pc.invert(_bool(pc.equal(j[S.OP_COLUMN + "_cur"], "delete"))),
        )
        same_sha = _bool(pc.equal(j[S.SHA_COLUMN], j[S.SHA_COLUMN + "_cur"]))
        noop_upd = pc.and_(pc.and_(newer, pc.invert(is_del)), pc.and_(cur_live, same_sha))
        m.stale_dropped += int(pc.sum(pc.invert(newer)).as_py() or 0)
        noop_mask = noop_upd
        m.inserts += int(pc.sum(pc.and_(pc.and_(newer, pc.invert(is_del)), pc.invert(cur_live))).as_py() or 0)
        m.updates += int(pc.sum(pc.and_(pc.and_(newer, pc.invert(is_del)), pc.and_(cur_live, pc.invert(same_sha)))).as_py() or 0)
        m.noops += int(pc.sum(noop_upd).as_py() or 0)
        m.deletes += int(pc.sum(pc.and_(pc.and_(newer, is_del), cur_live)).as_py() or 0)
        m.noop_deletes += int(pc.sum(pc.and_(pc.and_(newer, is_del), pc.invert(cur_live))).as_py() or 0)
        # version-advance rule: noop rows are still appended (new
        # commit/seq) but carry the OLD applied_epoch from the index
        apply_mask = newer
        # winners carry no applied_epoch, so the index's column joins in
        # UNSUFFIXED (suffixes apply only to colliding names)
        ae_col = (
            S.APPLIED_EPOCH_COLUMN + "_cur"
            if S.APPLIED_EPOCH_COLUMN + "_cur" in j.column_names
            else S.APPLIED_EPOCH_COLUMN
        )
        kept_epoch = pc.if_else(noop_mask, j[ae_col], pa.scalar(None, pa.int64()))
        j2 = j.append_column("_keep_epoch", kept_epoch.combine_chunks() if isinstance(kept_epoch, pa.ChunkedArray) else kept_epoch)
        applied = j2.filter(apply_mask).drop_columns(
            [c for c in j2.column_names if c.endswith("_cur")]
        )
        keep_epochs = applied["_keep_epoch"]
        applied = applied.select(winners.column_names)
        out = applied.append_column(
            S.APPLIED_EPOCH_COLUMN,
            pc.coalesce(keep_epochs, pa.scalar(epoch_id, pa.int64())).combine_chunks(),
        )
        return out, m

    out = applied.append_column(
        S.APPLIED_EPOCH_COLUMN, pa.array([epoch_id] * applied.num_rows, pa.int64())
    )
    return out, m


class _SpillShards:
    """Map side of the storage-backed exchange: sort each block by
    ``_part`` and write it as one spill file whose RECORD BATCHES align
    exactly with partition boundaries, so the reduce side reads only its
    partition's batches (random batch access — no object-store
    all-to-all, no sort of the full epoch).

    Format: Arrow IPC file with buffer compression (lz4 for narrow rows,
    zstd-1 for KB-sized contents). IPC encodes at memcpy+codec speed
    where parquet re-encodes every column (~5x the CPU on this path —
    the spill is transient per-epoch data, so parquet's schema-stability
    and statistics buy nothing here). The reduce side's
    ``_read_partition_rows`` also accepts legacy ``.parquet`` spill
    files (rescale-era callers, tests).

    Retry-safe: files are written tmp-then-rename, and only files
    returned by *successful* tasks (the summary rows) are read back, so a
    retried task can never double-contribute.

    On a multi-node cluster ``ex_dir`` must be shared storage (S3/NFS) —
    same requirement the two-phase sink already has.
    """

    _SUMMARY_SCHEMA = pa.schema(
        [
            ("file", pa.string()),
            ("rows", pa.int64()),
            ("parts", pa.list_(pa.int64())),
            # map-side combiner partials (per partition of the ORIGINAL
            # batch that lost rows to the pre-collapse): dropped-event /
            # exact-dup / HWM-replay counts the reduce side folds into
            # its metrics so lineage rows are byte-identical with or
            # without the combiner.
            ("pparts", pa.list_(pa.int64())),
            ("pevents", pa.list_(pa.int64())),
            ("pdupes", pa.list_(pa.int64())),
            ("preplays", pa.list_(pa.int64())),
        ]
    )

    def __init__(
        self,
        ex_dir: str,
        combine: str | None = None,
        hwms: dict[int, tuple[str, int]] | None = None,
    ):
        os.makedirs(ex_dir, exist_ok=True)
        self.ex_dir = ex_dir
        # Map-side combiner (the classic pre-shuffle combine): collapse
        # each batch to its per-key winners BEFORE spilling, so the
        # exchange carries winners + malformed rows instead of every
        # event (~2.4x fewer bytes at the bench workload's 2.2
        # events/key/batch). Only for merge='lww', where keep-max is
        # associative AND the partition-max (commit, seq) provably
        # survives the collapse (each key's winner IS its max), so the
        # reduce-side HWM advance is unchanged. 'longest' ranks by
        # content length, so a stale event can carry the partition-max
        # version and be collapsed away — those strategies spill raw.
        self.combine = combine if combine == "lww" else None
        self.hwms = hwms or {}

    def _precombine(self, batch: pa.Table):
        """Collapse one batch to per-key winners + payload-nulled STUBS
        of in-batch losers + all malformed rows. Returns
        (collapsed_batch, partials) where partials maps partition ->
        [dropped_events, dropped_exact_dupes, dropped_hwm_replays].

        Mirrors the reduce side exactly: HWM filter first (counted),
        then sort by (part, key, commit, seq), drop exact duplicates
        (counted), keep the winning event per key WHOLE and every other
        distinct version as a stub (key + version columns only, payload
        nulled). Stubs are what make the combiner lossless for the
        lineage contract: the reduce side still sees the full DISTINCT
        multiset of (key, commit, seq) — so cross-batch exact-duplicate
        counting and the HWM advance are byte-identical to the
        combiner-less path — while the heavy payload bytes (content is
        ~80-95% of a spill row) travel only for winners. A stub can
        never win the final merge: its own batch's winner carries a
        strictly newer (commit, seq) (lww keep-max is associative)."""
        import numpy as np

        n = batch.num_rows
        parts0 = batch[S.PART_COLUMN].to_numpy()
        orig = np.bincount(parts0)
        mal_t = None
        valid = batch
        if S.MALFORMED_COLUMN in batch.column_names:
            mal = pc.fill_null(batch[S.MALFORMED_COLUMN], False)
            if int(pc.sum(mal).as_py() or 0):
                valid = batch.filter(pc.invert(mal))
                mal_t = batch.filter(mal).sort_by([(S.PART_COLUMN, "ascending")])

        replays = np.zeros(len(orig), dtype=np.int64)
        if self.hwms and valid.num_rows:
            vparts = valid[S.PART_COLUMN].combine_chunks()
            maxp = int(pc.max(vparts).as_py())
            hc = pa.array(
                [self.hwms.get(p, ("", -1))[0] for p in range(maxp + 1)], pa.string()
            )
            hs = pa.array(
                [self.hwms.get(p, ("", -1))[1] for p in range(maxp + 1)], pa.int64()
            )
            row_hc = pc.take(hc, vparts)
            row_hs = pc.take(hs, vparts)
            # rows in partitions with no stored HWM ('' commit) always
            # pass: any non-null commit > "" (reduce skips the filter
            # entirely there; same outcome)
            fresh = pc.fill_null(
                pc.or_(
                    pc.greater(valid["commit"], row_hc),
                    pc.and_(
                        pc.equal(valid["commit"], row_hc),
                        pc.greater(valid["seq"], row_hs),
                    ),
                ),
                False,
            )
            fresh_np = fresh.combine_chunks().to_numpy(zero_copy_only=False)
            if not fresh_np.all():
                vp = vparts.to_numpy()
                replays = np.bincount(vp[~fresh_np], minlength=len(orig)).astype(
                    np.int64
                )
                valid = valid.filter(fresh)

        dupes = np.zeros(len(orig), dtype=np.int64)
        if valid.num_rows:
            valid = valid.sort_by(
                [
                    (S.PART_COLUMN, "ascending"),
                    ("repo", "ascending"),
                    ("path", "ascending"),
                    ("commit", "ascending"),
                    ("seq", "ascending"),
                ]
            ).combine_chunks()
            vp = valid[S.PART_COLUMN].to_numpy()
            repo = valid["repo"].to_numpy(zero_copy_only=False)
            path_ = valid["path"].to_numpy(zero_copy_only=False)
            commit = valid["commit"].to_numpy(zero_copy_only=False)
            seq = valid["seq"].to_numpy(zero_copy_only=False)
            same_key = (
                (vp[1:] == vp[:-1]) & (repo[1:] == repo[:-1]) & (path_[1:] == path_[:-1])
            )
            exact = same_key & (commit[1:] == commit[:-1]) & (seq[1:] == seq[:-1])
            if exact.any():
                dupes = np.bincount(vp[1:][exact], minlength=len(orig)).astype(np.int64)
            last = np.ones(len(vp), dtype=bool)
            last[:-1] = ~same_key
            dup_row = np.zeros(len(vp), dtype=bool)
            dup_row[:-1] = exact
            stale = ~last & ~dup_row
            if not last.all():
                winners_t = valid.filter(pa.array(last))
                if stale.any():
                    stubs = valid.filter(pa.array(stale))
                    keep_cols = {
                        "repo",
                        "path",
                        "commit",
                        "seq",
                        S.OP_COLUMN,
                        S.PART_COLUMN,
                        S.MALFORMED_COLUMN,
                    }
                    for c in stubs.column_names:
                        if c not in keep_cols:
                            i = stubs.column_names.index(c)
                            stubs = stubs.set_column(
                                i, c, pa.nulls(stubs.num_rows, stubs.column(i).type)
                            )
                    valid = [winners_t, stubs]
                else:
                    valid = [winners_t]
            else:
                valid = [valid]
        else:
            valid = []

        # every stratum is already sorted by _part (winners/stubs derive
        # from the part-sorted `valid`; mal_t sorted above) — the writer
        # slices each stratum independently, so no second full-payload
        # sort of the batch is needed.
        strata = ([mal_t] if mal_t is not None else []) + valid
        spilled = np.zeros(len(orig), dtype=np.int64)
        for t in strata:
            spilled += np.bincount(
                t[S.PART_COLUMN].combine_chunks().to_numpy(), minlength=len(orig)
            )[: len(orig)]
        dropped = orig - spilled
        partials = {
            int(p): [int(dropped[p]), int(dupes[p]), int(replays[p])]
            for p in np.nonzero(dropped)[0]
        }
        return strata, partials

    def __call__(self, batch: pa.Table) -> pa.Table:
        import uuid

        from laketide.stages.apply import limit_arrow_threads

        limit_arrow_threads(1)
        if batch.num_rows == 0:
            return self._SUMMARY_SCHEMA.empty_table()
        import numpy as np

        partials: dict[int, list[int]] = {}
        if self.combine:
            # strata (malformed / winners / stubs) arrive each already
            # sorted by _part — written independently, so the combiner
            # costs ONE key sort instead of two full-payload sorts. A
            # partition may hold up to one batch per stratum per file;
            # the index carries repeated part ids and the reduce reads
            # them all.
            strata, partials = self._precombine(batch)
            strata = [t for t in strata if t.num_rows]
            if not strata:
                # every row dropped map-side (e.g. an idempotent
                # re-apply: all replays). No spill file — but the
                # partials must still reach the reduce so lineage rows
                # (events_in / replays_dropped) stay exact. file="" rows
                # are skipped by the file-index builder.
                return pa.table(
                    {
                        "file": [""],
                        "rows": [0],
                        "parts": [[]],
                        "pparts": [list(map(int, partials))],
                        "pevents": [[v[0] for v in partials.values()]],
                        "pdupes": [[v[1] for v in partials.values()]],
                        "preplays": [[v[2] for v in partials.values()]],
                    }
                ).cast(self._SUMMARY_SCHEMA)
        else:
            strata = [batch.sort_by([(S.PART_COLUMN, "ascending")])]

        nrows = sum(t.num_rows for t in strata)
        path = os.path.join(self.ex_dir, f"map-{uuid.uuid4().hex}.arrow")
        tmp = path + ".tmp"
        # Adaptive spill compression (measured on this engine): zstd-1
        # for KB-sized contents (halves exchange bytes through the box's
        # shared disk, the binding ceiling there), lz4 for narrow rows
        # where codec CPU dominates. Threshold ~600 B/row.
        wide = (sum(t.nbytes for t in strata) / nrows) > 600
        opts = pa.ipc.IpcWriteOptions(
            compression=pa.Codec("zstd", 1) if wide else pa.Codec("lz4")
        )
        # one record batch per partition slice per stratum: each stratum
        # is single-chunk (combine_chunks below), so each write is
        # exactly one IPC record batch and the batch->partition index is
        # exact by construction — no post-write metadata read needed
        # (IPC never splits a write the way ParquetWriter splits row
        # groups).
        rg_parts: list[int] = []
        with pa.OSFile(tmp, "wb") as sink:
            with pa.ipc.new_file(sink, strata[0].schema, options=opts) as w:
                for t in strata:
                    t = t.combine_chunks()
                    parts = t[S.PART_COLUMN].to_numpy()
                    bounds = (
                        [0]
                        + (np.nonzero(parts[1:] != parts[:-1])[0] + 1).tolist()
                        + [len(parts)]
                    )
                    for lo, hi in zip(bounds[:-1], bounds[1:]):
                        w.write_table(t.slice(lo, hi - lo))
                        rg_parts.append(int(parts[lo]))
        os.replace(tmp, path)
        return pa.table(
            {
                "file": [path],
                "rows": [nrows],
                "parts": pa.array([rg_parts], pa.list_(pa.int64())),
                "pparts": [list(map(int, partials))],
                "pevents": [[v[0] for v in partials.values()]],
                "pdupes": [[v[1] for v in partials.values()]],
                "preplays": [[v[2] for v in partials.values()]],
            }
        ).cast(self._SUMMARY_SCHEMA)


def _open_spill(path: str) -> "pa.ipc.RecordBatchFileReader":
    """Open an IPC spill file for random batch access (memory-mapped: a
    reduce task touching k of F batches pages in only those batches'
    bytes; compressed buffers decompress per get_batch). Module-level so
    tests can count opens."""
    return pa.ipc.open_file(pa.memory_map(path))


def _read_partition_rows(
    file_index: list[tuple[str, tuple[int, ...] | None]], part: int
) -> list[pa.Table]:
    """Read one partition's record batches from partition-aligned spill
    files. Each entry is ``(path, rg_parts)`` where ``rg_parts[i]`` is
    the partition held by batch/row-group ``i`` (returned by the map
    side with its summary row) — files without this partition are
    skipped without even being opened. ``rg_parts=None`` falls back to a
    scan (parquet footer min/max stats; IPC per-batch first-row check).
    ``.parquet`` spill files remain readable (legacy format)."""
    tbls = []
    for f, rg_parts in file_index:
        is_ipc = not f.endswith(".parquet")
        if rg_parts is not None:
            rgs = [i for i, p in enumerate(rg_parts) if p == part]
            if not rgs:
                continue
            if is_ipc:
                r = _open_spill(f)
                for rg in rgs:
                    tbls.append(pa.Table.from_batches([r.get_batch(rg)]))
            else:
                pf = pq.ParquetFile(f)
                for rg in rgs:
                    tbls.append(pf.read_row_group(rg))
            continue
        if is_ipc:
            r = _open_spill(f)
            for rg in range(r.num_record_batches):
                b = r.get_batch(rg)
                if b.num_rows and b[S.PART_COLUMN][0].as_py() == part:
                    tbls.append(pa.Table.from_batches([b]))
            continue
        pf = pq.ParquetFile(f)
        meta = pf.metadata
        col_idx = pf.schema_arrow.names.index(S.PART_COLUMN)
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(col_idx).statistics
            if st is not None and st.min == st.max == part:
                tbls.append(pf.read_row_group(rg))
    return tbls


def _read_partitions_multi(
    file_index: list[tuple[str, tuple[int, ...] | None]], parts: list[int]
) -> dict[int, list[pa.Table]]:
    """Read MANY partitions' row groups per spill file in one
    ``read_row_groups`` call. A reduce task that owns k partitions pays
    the per-file fixed cost (footer thrift parse, read setup) once
    instead of k times — at bench scale each spill row group is only a
    few thousand rows, so that fixed cost was ~40% of the reduce wall
    time. Row groups are partition-pure (the map side aligns them), so
    slicing the concatenated read back out by the per-group row counts
    is exact."""
    want = set(parts)
    out: dict[int, list[pa.Table]] = {p: [] for p in parts}
    for f, rg_parts in file_index:
        if rg_parts is not None:
            rgs = [i for i, p in enumerate(rg_parts) if p in want]
            if not rgs:
                continue
            if not f.endswith(".parquet"):
                r = _open_spill(f)
                for i in rgs:
                    out[rg_parts[i]].append(
                        pa.Table.from_batches([r.get_batch(i)])
                    )
                continue
            pf = pq.ParquetFile(f)
            t = pf.read_row_groups(rgs)
            meta = pf.metadata
            off = 0
            for i in rgs:
                n = meta.row_group(i).num_rows
                out[rg_parts[i]].append(t.slice(off, n))
                off += n
        else:
            # legacy summaries without an rg index: per-part stats scan
            for p in parts:
                out[p].extend(_read_partition_rows([(f, None)], p))
    return out


def _sampled_partition_skew(paths: list[str], num_partitions: int) -> float:
    """Cheap pre-read skew sniff for the auto exchange switch: one
    ~64k-row batch of KEY columns from the first parquet file, assigned
    to partitions, returns the hottest partition's share. A byte-sized
    threshold alone misses the skewed small epoch (one hot key-partition
    in a <192 MiB slice would take the sort-based groupby and serialize
    in a single group sort); the sniff costs one column-pruned batch
    read. 0.0 on any failure — the sniff must never break an apply."""
    from laketide.stages.partition import assign_partitions

    try:
        first = None
        for p0 in paths:
            if os.path.isdir(p0):
                for root, _, names in os.walk(p0):
                    cand = sorted(n for n in names if n.endswith(".parquet"))
                    if cand:
                        first = os.path.join(root, cand[0])
                        break
            elif p0.endswith(".parquet"):
                first = p0
            if first:
                break
        if not first:
            return 0.0
        pf = pq.ParquetFile(first)
        cols = [c for c in ("repo", "path") if c in pf.schema_arrow.names]
        if len(cols) < 2:
            return 0.0
        batch = next(pf.iter_batches(batch_size=65536, columns=cols), None)
        if batch is None or batch.num_rows == 0:
            return 0.0
        t = pa.Table.from_batches([batch])
        parts = assign_partitions(t, num_partitions).to_numpy(zero_copy_only=False)
        counts = np.bincount(parts, minlength=num_partitions)
        return float(counts.max()) / float(len(parts))
    except Exception:  # pragma: no cover - defensive: sniff is advisory
        return 0.0


def _make_reduce_fn(
    file_index: list[tuple[str, tuple[int, ...] | None]],
    apply_fn,
    partial_parts: "set[int] | None" = None,
):
    """Reduce side: one task per partition GROUP; reads only those
    partitions' row groups from every spill file (batched per file).
    ``partial_parts`` are partitions whose events were ALL dropped by
    the map-side combiner — no spill data, but their metrics/lineage
    row must still exist (apply_fn(None, part) synthesizes it from the
    seeded partials)."""
    partial_parts = partial_parts or set()

    def reduce(batch: pa.Table) -> pa.Table:
        from laketide.stages.apply import limit_arrow_threads

        limit_arrow_threads(1)
        wanted = batch["part"].to_pylist()
        groups = _read_partitions_multi(file_index, wanted)
        outs = []
        for p in wanted:
            tbls = groups.get(p) or []
            if tbls:
                outs.append(apply_fn(pa.concat_tables(tbls)))
            elif p in partial_parts:
                outs.append(apply_fn(None, p))
        if not outs:
            return METRICS_SCHEMA.empty_table()
        return pa.concat_tables(outs)

    return reduce


def _load_live_partition(
    table_dir: str,
    info: dict,
    merge: str,
    drop_deleted: bool = False,
    key_filter: "tuple[str, str] | None" = None,
) -> pa.Table | None:
    """THE read-surface partition loader: base + deltas folded
    (merge-on-read), tombstone-flagged rows filtered, optionally the
    ``deleted`` bookkeeping column dropped. Every read path
    (state_table / state_table_at / read() / get / export_snapshot)
    goes through here so the fold can never drift between surfaces.

    ``key_filter=(repo, path)`` pushes an exact-key predicate into the
    parquet reads: partition files are key-sorted, so row-group
    statistics prune the scan to O(row group) instead of O(partition)
    — the zone-map read path a point lookup needs at lake scale. The
    MOR fold stays correct because folding is per-key and both base
    and deltas are filtered to the SAME key."""
    from laketide.stages.apply import merge_partition

    filters = None
    if key_filter is not None:
        filters = [("repo", "=", key_filter[0]), ("path", "=", key_filter[1])]
    base = (
        pq.read_table(os.path.join(table_dir, info["file"]), filters=filters)
        if info.get("file")
        else None
    )
    deltas = [
        pq.read_table(os.path.join(table_dir, r), filters=filters)
        for r in info.get("deltas") or []
    ]
    if base is None and not deltas:
        return None
    t = merge_partition(base, deltas, merge) if deltas else base
    if S.DELETED_COLUMN in t.column_names:
        t = t.filter(pc.invert(pc.fill_null(t[S.DELETED_COLUMN], False)))
        if drop_deleted:
            t = t.drop_columns([S.DELETED_COLUMN])
    return t


def _gather_nonempty(ds: "ray.data.Dataset") -> list[pa.Table]:
    """Materialize a (small) Dataset's blocks, dropping the zero-row
    EMPTY-SCHEMA blocks Ray emits from shuffle groups with no output
    (they break ``pa.concat_tables``)."""
    from laketide.functions.reads import collect_tables

    return collect_tables(ds)


def _diff_live_tables(
    t0: pa.Table | None,
    t1: pa.Table | None,
    schema: pa.Schema,
    update_preimages: bool = False,
) -> pa.Table:
    """Classify one partition's changes between two live-row snapshots
    (both already tombstone-filtered): insert = key only in ``t1``
    (postimage), update = key in both with different stored winner
    ``(commit, seq)`` (postimage), delete = key only in ``t0``
    (preimage). Vectorized via null-byte-joined key arrays +
    ``pc.index_in`` — no join machinery, so list payload columns ride
    along untouched.

    ``update_preimages=True`` switches updates to the Delta-CDF row
    pair: ``update_preimage`` (the OLD row) + ``update_postimage`` (the
    new one) — what incremental view maintenance needs to retract the
    old contribution when an update moves a row between groups."""
    out_schema = schema.append(pa.field("change_type", pa.string()))

    def _key(t: pa.Table) -> pa.ChunkedArray:
        return pc.binary_join_element_wise(
            pc.cast(t["repo"], pa.string()),
            pc.cast(t["path"], pa.string()),
            "\x00",
        )

    def _tag(t: pa.Table, tag: str) -> pa.Table:
        return S.conform(t, schema).append_column(
            "change_type", pa.array([tag] * t.num_rows, pa.string())
        )

    if (t1 is None or t1.num_rows == 0) and (t0 is None or t0.num_rows == 0):
        return out_schema.empty_table()
    if t0 is None or t0.num_rows == 0:
        return _tag(t1, "insert")
    if t1 is None or t1.num_rows == 0:
        return _tag(t0, "delete")
    k0, k1 = _key(t0), _key(t1)
    idx = pc.index_in(k1, value_set=k0)
    ins_mask = pc.is_null(idx)
    old_commit = pc.take(t0["commit"], idx)
    old_seq = pc.take(t0["seq"], idx)
    ident_changed = pc.or_kleene(
        pc.not_equal(old_commit, pc.cast(t1["commit"], old_commit.type)),
        pc.not_equal(old_seq, pc.cast(t1["seq"], old_seq.type)),
    )
    upd_mask = pc.and_kleene(pc.invert(ins_mask), pc.fill_null(ident_changed, False))
    jdx = pc.index_in(k0, value_set=k1)
    del_mask = pc.is_null(jdx)
    parts = []
    if pc.any(ins_mask).as_py():
        parts.append(_tag(t1.filter(ins_mask), "insert"))
    if pc.any(upd_mask).as_py():
        if update_preimages:
            pre_pos = pc.filter(idx, upd_mask)
            parts.append(_tag(t0.take(pre_pos), "update_preimage"))
            parts.append(_tag(t1.filter(upd_mask), "update_postimage"))
        else:
            parts.append(_tag(t1.filter(upd_mask), "update"))
    if pc.any(del_mask).as_py():
        parts.append(_tag(t0.filter(del_mask), "delete"))
    if not parts:
        return out_schema.empty_table()
    return pa.concat_tables(parts, promote_options="default")


class LakeTable:
    """A hash-partitioned Parquet lake table maintained by CDC replay.

    The Ray-native counterpart of the reference's ``vulnerabilities``
    master table + sync job (SURVEY.md §1.4).
    """

    def __init__(
        self,
        table_dir: str,
        num_partitions: int = DEFAULT_NUM_PARTITIONS,
        merge: str = "lww",
        layout: str = "cow",
        compact_threshold: int = 8,
        lock_wait_seconds: float = 0.0,
        dlq: bool = False,
    ):
        """``merge``: pluggable merge strategy (reference E4) — "lww"
        (version order), "longest" (longer content wins, R6 analog),
        "coalesce" (field-wise newest-non-null + list union, R4/R5),
        or "priority" (the R2 literal: fixed source rank OSV>GitLab>CVE
        decides field-wise winners regardless of arrival,
        merger.go:124-228; ranks in stages/apply.py SOURCE_RANKS).
        Pinned in the manifest on first commit; a mismatch on an
        existing table raises.

        ``layout``: "cow" rewrites a partition file per epoch (simple,
        read-optimal); "mor" (merge-on-read) appends per-epoch DELTA
        files — stale/no-op checks run against a content-free key index,
        and a partition compacts inline once it accumulates
        ``compact_threshold`` deltas. At lake scale, cow's full-partition
        rewrite per epoch is the dominant write cost; mor turns it into
        O(delta) writes (Hudi/Iceberg MOR analog of the reference's
        row-level UPDATE vs full-table rewrite trade)."""
        self.table_dir = table_dir
        self.lock_wait_seconds = lock_wait_seconds
        os.makedirs(table_dir, exist_ok=True)
        try:
            man = M.load_current(table_dir)
        except RuntimeError:
            # Dangling CURRENT (names a missing manifest) is exactly the
            # corruption fsck exists to REPORT — defer: the constructor
            # adopts defaults, and every read/write path re-calls
            # load_current (current_manifest / _apply_epoch_locked),
            # which re-raises. fsck() catches it and returns the
            # structured {ok: false} report instead of dying here.
            man = None
        self._actor_pool = None
        self.num_partitions = man.num_partitions if man else num_partitions
        # I6 dead-letter queue: when enabled, malformed rows are
        # quarantined under _dlq/epoch-NNNNNN/ (replayable after repair)
        # instead of only counted-and-dropped. STICKY once committed:
        # any later handle (incl. the CLI) adopts it, so one handle
        # omitting the flag cannot silently drop the quarantine
        # guarantee; passing dlq=True on an existing table upgrades it
        # at the next commit.
        self.dlq = bool(dlq or (man.stats.get("dlq") if man else False))
        committed = (man.stats.get("merge") if man else None) or None
        if committed and merge != "lww" and merge != committed:
            raise ValueError(f"table committed with merge={committed!r}, got {merge!r}")
        self.merge = committed or merge
        from laketide.stages.apply import MERGE_STRATEGIES

        if self.merge not in MERGE_STRATEGIES:
            raise ValueError(f"unknown merge strategy {self.merge!r}")
        committed_layout = (man.stats.get("layout") if man else None) or None
        if committed_layout and layout != "cow" and layout != committed_layout:
            raise ValueError(
                f"table committed with layout={committed_layout!r}, got {layout!r}"
            )
        self.layout = committed_layout or layout
        if self.layout not in ("cow", "mor"):
            raise ValueError(f"unknown layout {self.layout!r}")
        if self.layout == "mor" and self.merge != "lww":
            raise ValueError("layout='mor' supports merge='lww' only")
        self.compact_threshold = compact_threshold

    # ------------------------------------------------------------------ state
    def current_manifest(self) -> M.Manifest | None:
        return M.load_current(self.table_dir)

    def history(self) -> list[dict]:
        """Committed epochs, oldest first (manifest log = time travel)."""
        import glob as _glob

        p = M.paths(self.table_dir)

        out = []
        for mf in sorted(
            _glob.glob(os.path.join(p["manifests"], "manifest-*.json")),
            key=_manifest_recency,
        ):
            with open(mf) as fh:
                man = M.Manifest.from_json(fh.read())
            out.append(
                {
                    "manifest": os.path.basename(mf),
                    "epoch": man.epoch,
                    "rows": man.stats.get("rows"),
                    "totals": man.stats.get("totals"),
                    # additive-evolution timeline: when a column (e.g.
                    # lang) first appeared in the unified schema
                    "columns": list(man.schema_names),
                }
            )
        return out

    def manifest_at(self, epoch: int) -> M.Manifest | None:
        """The manifest committed for ``epoch`` (time-travel handle).
        Superseded epochs may have been GC'd (``gc(keep_last=...)``).
        Falls back to the epoch's newest MAINTENANCE manifest
        (``manifest-NNNNNN-c0.json``) when the base file is gone — after
        compact + gc only the maintenance variant may remain, and it
        replays the same logical state."""
        import glob as _glob

        p = M.paths(self.table_dir)
        path = os.path.join(p["manifests"], f"manifest-{epoch:06d}.json")
        try:
            with open(path) as fh:
                return M.Manifest.from_json(fh.read())
        except FileNotFoundError:
            pass
        variants = _glob.glob(
            os.path.join(p["manifests"], f"manifest-{epoch:06d}-*.json")
        )
        # readers take no lock: a concurrent gc can delete a variant
        # between the glob and the stat/open — treat the whole fallback
        # as "not retained" on any vanishing file
        try:
            if not variants:
                return None
            newest = max(variants, key=os.path.getmtime)
            with open(newest) as fh:
                return M.Manifest.from_json(fh.read())
        except FileNotFoundError:
            return None

    def state_table_at(self, epoch: int | None = None, tag: str | None = None) -> pa.Table:
        """Snapshot AS OF a committed epoch (time travel): manifests are
        immutable and data files content-addressed by (partition, epoch),
        so any retained manifest replays exactly. Accepts either an
        epoch number or a ``tag`` name (named snapshot — see ``tag()``).
        Reference analog: the versioned ``exports`` rows (S10)
        generalized to every epoch."""
        if (epoch is None) == (tag is None):
            raise ValueError("pass exactly one of epoch= or tag=")
        if tag is not None:
            epoch = self.resolve_tag(tag)
        man = self.manifest_at(epoch)
        if not man:
            raise ValueError(f"epoch {epoch} not retained (gc'd or never committed)")
        schema = self._unified_schema(man) or S.snapshot_schema()
        parts = []
        for _, info in sorted(man.partitions.items(), key=lambda kv: int(kv[0])):
            t = _load_live_partition(self.table_dir, info, self.merge)
            if t is None:
                continue
            parts.append(S.conform(t, schema))
        if not parts:
            if S.DELETED_COLUMN in schema.names:
                schema = pa.schema([f for f in schema if f.name != S.DELETED_COLUMN])
            return schema.empty_table()
        out = pa.concat_tables(parts)
        if S.DELETED_COLUMN in out.column_names:
            out = out.drop_columns([S.DELETED_COLUMN])
        return out.sort_by([("repo", "ascending"), ("path", "ascending")])

    def current_epoch(self) -> int:
        man = self.current_manifest()
        return man.epoch if man else 0

    def last_applied_at(self) -> float | None:
        """Wall-clock time the newest committed epoch was applied (from
        its lineage stamp), or None for an empty table / pre-upgrade
        lineage. The scheduler's cadence check (@daily/@weekly sync
        schedules, /root/reference/internal/config/config.go:94-108)
        reads this to decide whether a job is due."""
        epoch = self.current_epoch()
        while epoch > 0:
            doc = M.load_lineage(self.table_dir, epoch)
            if doc and doc.get("applied_at") is not None:
                return float(doc["applied_at"])
            if doc is not None:
                return None  # pre-upgrade lineage: no stamp recorded
            epoch -= 1  # lineage GC'd for this epoch; try older
        return None

    def changes_between(self, from_epoch: int, to_epoch: int) -> pa.Table:
        """Change data feed between two retained epochs (Delta-CDF /
        Iceberg-changelog analog; reference analog: the per-sync
        processing_stats delta the ops surface reports,
        /root/reference/migrations/001_initial_schema.up.sql:75-88 —
        generalized to row-level changes). Returns one row per changed
        key with ``change_type``:

        - ``insert``: key live at ``to_epoch``, absent at ``from_epoch``
          (postimage columns)
        - ``update``: key live at both, stored winner identity
          ``(commit, seq)`` differs (postimage columns; a re-delivered
          noop leaves the stored winner untouched, so it does NOT
          surface here)
        - ``delete``: key live at ``from_epoch``, absent at ``to_epoch``
          (preimage columns; across a RESCALE boundary the preimage is
          skinny — key + winner identity, payload columns null)

        Convenience gather of ``changes_dataset`` — one sorted Arrow
        table on the driver; for a large span on a big table use
        ``changes_dataset`` (streaming, stays distributed)."""
        ds = self.changes_dataset(from_epoch, to_epoch)
        parts = _gather_nonempty(ds)
        if not parts:
            m0, m1 = self.manifest_at(from_epoch), self.manifest_at(to_epoch)
            return self._changes_schema(m0, m1)[1].empty_table()
        out = pa.concat_tables(parts, promote_options="default")
        return out.sort_by(
            [("repo", "ascending"), ("path", "ascending")]
        )

    def _changes_schema(
        self, m0: M.Manifest, m1: M.Manifest
    ) -> tuple[pa.Schema, pa.Schema]:
        schema = S.unify(
            self._unified_schema(m0) or S.snapshot_schema(),
            self._unified_schema(m1) or S.snapshot_schema(),
        )
        schema = pa.schema([f for f in schema if f.name != S.DELETED_COLUMN])
        return schema, schema.append(pa.field("change_type", pa.string()))

    def changes_dataset(
        self, from_epoch: int, to_epoch: int, update_preimages: bool = False
    ) -> "ray.data.Dataset":
        """Change data feed as a streaming Dataset (the scale surface —
        change rows never concentrate on the driver).

        ``update_preimages=True`` emits the Delta-CDF
        ``update_preimage`` / ``update_postimage`` row pair per update
        instead of one ``update`` postimage row (what incremental view
        maintenance needs). Not available across a rescale boundary,
        where old-snapshot preimages are skinny by construction —
        callers must recompute their view instead (documented
        contract).

        Distribution: when both manifests share a partition count, one
        Ray task per partition diffs base+delta folds pairwise (the
        co-partitioning invariant — same key, same partition). Across a
        rescale, old-snapshot KEYS re-key to the new partitioning and
        move through one Ray Data exchange of skinny (repo, path,
        commit, seq) rows — content never re-shuffles."""
        import ray as _ray
        import ray.data as _rd

        if from_epoch > to_epoch:
            raise ValueError(
                f"changes_between: from_epoch {from_epoch} > to_epoch {to_epoch}"
            )
        m0, m1 = self.manifest_at(from_epoch), self.manifest_at(to_epoch)
        for ep, man in ((from_epoch, m0), (to_epoch, m1)):
            if not man:
                raise ValueError(
                    f"epoch {ep} not retained (gc'd or never committed)"
                )
        schema, out_schema = self._changes_schema(m0, m1)
        if from_epoch == to_epoch:
            return _rd.from_arrow(out_schema.empty_table())
        table_dir, merge = self.table_dir, self.merge
        if m0.num_partitions != m1.num_partitions:
            if update_preimages:
                raise ValueError(
                    "update_preimages is not available across a rescale "
                    "boundary (old-snapshot preimages are skinny): "
                    "recompute the view from the snapshot instead"
                )
            return self._changes_across_rescale(m0, m1, schema)

        @_ray.remote(num_cpus=1)
        def _diff_one(info0: dict | None, info1: dict | None) -> pa.Table:
            from laketide.stages.apply import limit_arrow_threads

            limit_arrow_threads(1)
            t0 = (
                _load_live_partition(table_dir, info0, merge, drop_deleted=True)
                if info0
                else None
            )
            t1 = (
                _load_live_partition(table_dir, info1, merge, drop_deleted=True)
                if info1
                else None
            )
            return _diff_live_tables(t0, t1, schema, update_preimages)

        ids = sorted(set(m0.partitions) | set(m1.partitions), key=int)
        return _rd.from_arrow_refs(
            [
                _diff_one.remote(m0.partitions.get(k), m1.partitions.get(k))
                for k in ids
            ]
        )

    def _changes_across_rescale(
        self, m0: M.Manifest, m1: M.Manifest, schema: pa.Schema
    ) -> "ray.data.Dataset":
        """Diff across a partition-count change: skinny old-key rows
        re-keyed under the NEW partition count flow through one Ray Data
        groupby; each group's task loads its new partition and
        classifies. Driver-injected marker rows guarantee every new
        partition forms a group (an all-inserts partition has no old
        keys). Delete preimages are skinny by construction (documented
        in ``changes_between``)."""
        import ray as _ray
        import ray.data as _rd

        from laketide.stages.partition import assign_partitions

        table_dir, merge = self.table_dir, self.merge
        new_p = m1.num_partitions
        skinny_schema = pa.schema(
            [
                ("part", pa.int64()),
                ("repo", pa.string()),
                ("path", pa.string()),
                ("commit", pa.string()),
                ("seq", pa.int64()),
                ("marker", pa.bool_()),
            ]
        )

        @_ray.remote(num_cpus=1)
        def _skinny_old(info: dict) -> pa.Table:
            from laketide.stages.apply import limit_arrow_threads

            limit_arrow_threads(1)
            t = _load_live_partition(table_dir, info, merge, drop_deleted=True)
            if t is None or t.num_rows == 0:
                return skinny_schema.empty_table()
            return pa.table(
                {
                    "part": assign_partitions(t, new_p),
                    "repo": pc.cast(t["repo"], pa.string()),
                    "path": pc.cast(t["path"], pa.string()),
                    "commit": pc.cast(t["commit"], pa.string()),
                    "seq": pc.cast(t["seq"], pa.int64()),
                    "marker": pa.array([False] * t.num_rows, pa.bool_()),
                }
            )

        refs = [
            _skinny_old.remote(info)
            for info in m0.partitions.values()
            if info.get("file") or info.get("deltas")
        ]
        markers = pa.table(
            {
                "part": pa.array(list(range(new_p)), pa.int64()),
                "repo": pa.array([None] * new_p, pa.string()),
                "path": pa.array([None] * new_p, pa.string()),
                "commit": pa.array([None] * new_p, pa.string()),
                "seq": pa.array([None] * new_p, pa.int64()),
                "marker": pa.array([True] * new_p, pa.bool_()),
            }
        )
        skinny = _rd.from_arrow_refs(refs + [_ray.put(markers)])
        partitions1 = {k: dict(v) for k, v in m1.partitions.items()}

        def diff_group(g: pa.Table) -> pa.Table:
            from laketide.stages.apply import limit_arrow_threads

            limit_arrow_threads(1)
            out_schema = schema.append(pa.field("change_type", pa.string()))
            if g.num_rows == 0:
                return out_schema.empty_table()
            part = int(g["part"][0].as_py())
            g = g.filter(pc.invert(pc.fill_null(g["marker"], False)))
            info1 = partitions1.get(str(part))
            t1 = (
                _load_live_partition(table_dir, info1, merge, drop_deleted=True)
                if info1
                else None
            )
            # old side is already skinny: conform adds the missing
            # payload columns as nulls
            t0 = S.conform(g.drop_columns(["part", "marker"]), schema)
            return _diff_live_tables(t0, t1, schema)

        return skinny.groupby("part").map_groups(
            diff_group, batch_format="pyarrow"
        )

    def _unified_schema(self, man: M.Manifest) -> pa.Schema | None:
        s = man.stats.get("schema_b64")
        return _schema_from_b64(s) if s else None

    # ------------------------------------------------------------------ apply
    def apply_epoch(
        self,
        events: "ray.data.Dataset | str | list[str]",
        epoch_id: int | None = None,
        hwm_filter: bool = True,
        exchange: str = "auto",
        source: str | None = None,
    ) -> dict[str, Any]:
        """Apply one bounded changelog slice. Idempotent: re-applying an
        already-committed epoch id is a no-op returning its stored lineage.

        ``exchange``: "groupby" (Ray Data sort-based groupby — lowest
        latency for small epochs), "storage" (partition-pruned spill-file
        exchange — avoids sorting the full epoch's wide rows, the scale
        path), or "auto" (by epoch size). Override with env
        ``LAKETIDE_EXCHANGE``.
        """
        import time as _time

        t_start = _time.perf_counter()
        # merge='priority': events from DIFFERENT sources are not
        # version-ordered across epochs (a later OSV sync legitimately
        # carries older commits than an earlier GitLab sync), so the
        # row-level HWM watermark would drop exactly the rows priority
        # exists to arbitrate. Epoch-id replay detection still applies,
        # and the priority fold itself is idempotent (re-merging a
        # delivered event changes no stored field), so exactly-once
        # convergence is preserved without the watermark.
        if self.merge == "priority":
            hwm_filter = False
        # The manifest load, epoch-id assignment and HWM snapshot all
        # happen INSIDE the single-writer lock: loading before acquiring
        # would let a concurrent committer slip a manifest in between,
        # and this writer would commit over a stale parent (lost update).
        lock = self._acquire_lock()
        try:
            return self._apply_epoch_locked(
                events, epoch_id, hwm_filter, exchange, t_start, source
            )
        finally:
            self._release_lock(lock)

    def _apply_epoch_locked(
        self, events, epoch_id, hwm_filter, exchange, t_start, source=None
    ) -> dict[str, Any]:
        man = M.load_current(self.table_dir)
        # adopt the COMMITTED partition count under the writer lock: a
        # handle created before another process rescaled would otherwise
        # hash keys mod the stale P while the table files are laid out
        # mod the new one — a key's update landing in a different
        # partition than its current row (silent duplicate keys)
        if man and man.num_partitions != self.num_partitions:
            self.num_partitions = man.num_partitions
            self._actor_pool = None  # routing changed
        committed = man.epoch if man else 0
        if epoch_id is None:
            epoch_id = committed + 1
        if epoch_id <= committed:
            lineage = M.load_lineage(self.table_dir, epoch_id) or {}
            stored = (lineage.get("totals") if isinstance(lineage, dict) else None) or {}
            return {
                "epoch": epoch_id,
                "already_applied": True,
                # stored totals (empty dict for pre-upgrade lineage files)
                # plus the rows/throughput keys a fresh apply returns
                "totals": stored,
                "rows": (man.stats.get("rows") if man else 0) or 0,
                "throughput": (lineage.get("throughput") if isinstance(lineage, dict) else None) or {},
            }

        total = 0
        paths: list[str] = []
        if isinstance(events, (str, list)):
            # Size read blocks to the cluster: tiny blocks drown the
            # pipeline in scheduling overhead, huge ones starve it.
            # ~1 block per CPU, but never below ~32 MiB of input each.
            import ray as _ray

            paths = [events] if isinstance(events, str) else list(events)
            for p in paths:
                if os.path.isdir(p):
                    for root, _, names in os.walk(p):
                        total += sum(
                            os.path.getsize(os.path.join(root, n))
                            for n in names
                            if n.endswith(".parquet")
                        )
                elif os.path.exists(p):
                    total += os.path.getsize(p)
            cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
            # Aim for ~16 MiB (compressed) per block: enough tasks to use
            # the CPUs on big epochs, few enough that scheduling doesn't
            # dominate on small ones (floor cpus/2 tasks). Round big
            # epochs UP to a multiple of the CPU count: the spill stage
            # maps one task per block (batch_size=None below), so a
            # non-multiple leaves a ragged final wave — measured 24
            # tasks on 32 CPUs (25% idle) at the bench workload.
            by_size = total // (16 << 20) + 1
            if by_size >= cpus:
                blocks = min(-(-by_size // cpus) * cpus, 512)
            else:
                blocks = max(by_size, cpus // 2)
            ds = ray.data.read_parquet(events, override_num_blocks=int(blocks))
        else:
            ds = events

        base_schema = ds.schema().base_schema
        # the _prio_r_* namespace is reserved for the priority fold's
        # write-side helpers (payload_columns_of skips the prefix) — an
        # event stream using it must fail LOUDLY, not lose the column
        reserved = [
            n for n in base_schema.names if n.startswith(S.PRIO_RANK_PREFIX)
        ]
        if reserved:
            raise ValueError(
                f"event columns {reserved} use the reserved "
                f"'{S.PRIO_RANK_PREFIX}' helper prefix; rename them"
            )
        payload = S.payload_columns_of(base_schema)
        norm = ds.map_batches(
            NormalizeEvents(self.num_partitions, payload),
            batch_format="pyarrow",
            zero_copy_batch=True,
            # identical task options to the spill stage: differing
            # remote args block operator fusion (normalize->spill would
            # otherwise materialize between stages, ~17% slower replay);
            # normalize is pure so retrying it is safe
            retry_exceptions=True,
            max_retries=2,
        )

        hwms = {int(k): (v.get("hwm_commit", ""), v.get("hwm_seq", -1)) for k, v in (man.partitions if man else {}).items()}
        part_info = {int(k): dict(v) for k, v in (man.partitions if man else {}).items()}

        dlq_dir = None
        if self.dlq:
            dlq_dir = os.path.join(self.table_dir, "_dlq", f"epoch-{epoch_id:06d}")
            # a RETRIED epoch id starts from a clean slate: files from a
            # crashed pre-commit attempt must not be attributed to the
            # (possibly repaired) input that eventually commits. Created
            # lazily by write_dlq — clean epochs leave no dir at all.
            import shutil as _sh

            _sh.rmtree(dlq_dir, ignore_errors=True)
        map_partials: dict[int, list[int]] = {}
        fn = _make_group_fn(
            self.table_dir,
            epoch_id,
            hwms,
            part_info,
            hwm_filter,
            self.merge,
            self.layout,
            self.compact_threshold,
            dlq_dir,
            map_partials,
        )
        mode = os.environ.get("LAKETIDE_EXCHANGE", exchange)
        if mode == "auto":
            mode = "storage" if total >= (192 << 20) else "groupby"
            if mode == "groupby" and total >= (8 << 20) and paths:
                # skew-aware switch: a hot partition in a small epoch
                # serializes the sort-based groupby; the storage
                # exchange splits it into partition-pure row groups
                skew = _sampled_partition_skew(paths, self.num_partitions)
                if skew >= max(0.25, 4.0 / self.num_partitions):
                    mode = "storage"
        metric_rows = self._exchange(
            norm,
            fn,
            epoch_id,
            total,
            mode,
            hwm_filter,
            dlq_dir,
            map_partials=map_partials,
            hwms=hwms if hwm_filter else None,
        )
        import time as _time2

        duration = _time2.perf_counter() - t_start
        return self._finalize(
            epoch_id, man, metric_rows, duration, source=source, exchange_mode=mode
        )

    def _exchange(
        self,
        norm,
        fn,
        epoch_id: int,
        total_bytes: int,
        mode: str,
        hwm_filter: bool = True,
        dlq_dir: str | None = None,
        map_partials: dict[int, list[int]] | None = None,
        hwms: dict[int, tuple[str, int]] | None = None,
    ) -> list[dict]:
        if mode == "auto":  # direct callers; the apply path resolves first
            mode = "storage" if total_bytes >= (192 << 20) else "groupby"
        if mode == "groupby":
            return (
                norm.groupby(S.PART_COLUMN).map_groups(fn, batch_format="pyarrow").take_all()
            )
        import time as _t

        _timing = os.environ.get("LAKETIDE_TIMING")
        _t0 = _t.perf_counter()
        ex_dir = os.path.join(
            self.table_dir, "_staging", f"epoch-{epoch_id:06d}", "exchange"
        )
        # map-side combiner: only on the task-reduce path (the actor
        # path's appliers compute their own metrics and would not see
        # the partials), and only for lww (see _SpillShards.__init__)
        combine = self.merge if mode == "storage" else None
        summaries = norm.map_batches(
            _SpillShards(ex_dir, combine=combine, hwms=hwms),
            batch_format="pyarrow",
            zero_copy_batch=True,
            # one spill file per READ block (blocks are sized/rounded at
            # the read: ~16-32 MiB compressed each, count a multiple of
            # the CPUs) — an explicit batch_size re-bundles blocks into
            # fewer, uneven tasks (measured 24 tasks on 32 CPUs)
            batch_size=None,
            # transient storage errors surface as app exceptions; the
            # spill protocol is retry-safe BY DESIGN (tmp+rename files,
            # only successful attempts' summaries are read back), so
            # retrying here is exactly-once
            retry_exceptions=True,
            max_retries=2,
        )
        if _timing:
            _sds = summaries
            summaries = _sds.take_all()
            print(_sds.stats())
        else:
            summaries = summaries.take_all()
        file_index = sorted(
            (r["file"], tuple(r["parts"]) if r.get("parts") is not None else None)
            for r in summaries
            if r["file"]  # file="" = partials-only summary (all rows dropped)
        )
        # fold the combiner partials into the dict the apply fn closes
        # over — BEFORE the reduce tasks serialize that closure
        if map_partials is not None:
            for r in summaries:
                for p, ev_, du, re_ in zip(
                    r.get("pparts") or [],
                    r.get("pevents") or [],
                    r.get("pdupes") or [],
                    r.get("preplays") or [],
                ):
                    acc = map_partials.setdefault(int(p), [0, 0, 0])
                    acc[0] += int(ev_)
                    acc[1] += int(du)
                    acc[2] += int(re_)
        if mode == "actor":
            return self._actor_apply(epoch_id, file_index, hwm_filter, dlq_dir)
        # Reduce side as raw Ray tasks (one per partition): a fixed
        # fan-out with no data-plane streaming — raw tasks start in
        # milliseconds where a second Dataset pipeline costs ~1s of
        # fixed latency per epoch.
        import ray as _ray

        parts_with_data = {p for _, ps in file_index for p in (ps or ())}
        partial_only = set(map_partials or {}) - parts_with_data
        reduce_fn = _make_reduce_fn(file_index, fn, partial_only)

        @_ray.remote(num_cpus=1)
        def _reduce_task(parts: list[int]):
            # Arrow table out (bounded: one metric row per partition);
            # pylist conversion happens once, driver-side
            return reduce_fn(pa.table({"part": pa.array(parts, pa.int64())}))

        # one task per CPU, CONTIGUOUS partition ranges: partitions are
        # adjacent row groups inside every spill file, so a task's whole
        # range is one coalesced read per file; grouping also turns the
        # P > cpus case from multiple ragged scheduling waves into one.
        cpus = int(_ray.cluster_resources().get("CPU", 8))
        n_tasks = max(1, min(self.num_partitions, cpus))
        per = -(-self.num_partitions // n_tasks)  # ceil
        chunks = [
            list(range(lo, min(lo + per, self.num_partitions)))
            for lo in range(0, self.num_partitions, per)
        ]
        if _timing:
            _t1 = _t.perf_counter()
            print(f"[laketide-timing] epoch={epoch_id} map+spill={_t1 - _t0:.3f}s")
        futures = [_reduce_task.remote(c) for c in chunks]
        rows = [row for t in _ray.get(futures) for row in t.to_pylist()]
        if _timing:
            print(
                f"[laketide-timing] epoch={epoch_id} reduce={_t.perf_counter() - _t1:.3f}s"
            )
        return rows

    def _actor_apply(
        self,
        epoch_id: int,
        file_index: list,
        hwm_filter: bool = True,
        dlq_dir: str | None = None,
    ) -> list[dict]:
        """Stateful actor-pool appliers (reference ST1): partitions route
        to persistent actors (part % n_actors) that cache their shard's
        snapshot table across epochs."""
        import ray as _ray

        if self.layout == "mor":
            raise ValueError("exchange='actor' supports layout='cow' only")
        man = M.load_current(self.table_dir)
        hwms = {
            int(k): (v.get("hwm_commit", ""), v.get("hwm_seq", -1))
            for k, v in (man.partitions if man else {}).items()
        }
        cur_files = {int(k): v.get("file") for k, v in (man.partitions if man else {}).items()}
        gen = int(((man.stats if man else {}) or {}).get("maintenance_gen", 0))
        if self._actor_pool is None:
            from laketide.state.appliers import make_pool

            cpus = int(_ray.cluster_resources().get("CPU", 8))
            n = max(1, min(self.num_partitions, cpus))
            self._actor_pool = make_pool(self.table_dir, n, self.merge)
        pool = self._actor_pool
        staging_dir = os.path.join(self.table_dir, "_staging", f"epoch-{epoch_id:06d}")
        futures = []
        for i, actor in enumerate(pool):
            parts = [p for p in range(self.num_partitions) if p % len(pool) == i]
            futures.append(
                actor.apply_many.remote(
                    epoch_id, parts, file_index, hwms, cur_files, staging_dir,
                    hwm_filter, gen, dlq_dir,
                )
            )
        return [row for rows in _ray.get(futures) for row in rows]

    # A test hook: overridable to inject a crash between staging and commit.
    def _pre_commit_hook(self, epoch_id: int) -> None:  # pragma: no cover
        pass

    # ------------------------------------------------------------ writer lock
    def _acquire_lock(self, name: str = "_LOCK"):
        """Single-writer advisory lock (the reference's single sync-job
        analog): a lock file holding the writer pid; a lock whose pid is
        dead is stale and stolen. A LIVE contender raises by default;
        ``lock_wait_seconds > 0`` (constructor knob) instead retries
        with backoff until the deadline — the operational mode for a
        tail daemon coexisting with cron maintenance, where the writers
        are serialized, not failed.

        Every read-decide-mutate of the lock file runs inside a tiny
        flock-guarded critical section (``_lock_guard``): the round-5
        race suite caught the rename-based steal double-winning — a
        contender that read the OLD stale pid could rename away whatever
        sat at the path by then, i.e. a NEW live writer's lock (classic
        TOCTOU: decision from content, action by name). Under the guard
        the staleness check and the steal are one atomic step, so two
        holds can never overlap; a process that dies mid-section drops
        the guard automatically (kernel flock semantics), so the guard
        itself can never go stale."""
        import time as _time

        path = os.path.join(self.table_dir, name)
        wait = float(getattr(self, "lock_wait_seconds", 0.0) or 0.0)
        deadline = _time.monotonic() + max(0.0, wait)
        while True:
            with self._lock_guard(path):
                holder = self._lock_holder(path)
                if holder is None:
                    # absent or stale: (re)claim. The write happens under
                    # the guard, so no contender can observe a partially
                    # written pid.
                    with open(f"{path}.claim", "w") as fh:
                        fh.write(str(os.getpid()))
                    os.replace(f"{path}.claim", path)
                    return path
            # own pid included: a live lock bearing OUR pid can only mean
            # another thread of this process holds it — stealing it would
            # run two writers concurrently from the same parent manifest
            # (the exact lost-update the lock exists to prevent)
            same = " (another thread of this process)" if holder == os.getpid() else ""
            if _time.monotonic() >= deadline:
                raise RuntimeError(
                    f"table {self.table_dir} is locked by live writer pid {holder}{same}"
                )
            _time.sleep(0.05)

    @contextmanager
    def _lock_guard(self, path: str):
        """flock-serialized critical section for lock-STATE mutations
        (never held while a writer works — only for the microseconds of
        check/claim/release). The guard file is created once and never
        removed: unlinking a flocked file is the classic way two
        processes end up holding 'the' lock on different inodes."""
        import fcntl

        # O_RDONLY + 0o666: flock needs no write access, and a guard
        # created by one unix user must stay flock-able by another
        # (the cross-uid contention _lock_holder's PermissionError
        # branch supports) — O_RDWR on a 0o644 foreign-owned guard
        # would EACCES before the pid check ever ran
        fd = os.open(f"{path}.guard", os.O_CREAT | os.O_RDONLY, 0o666)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            os.close(fd)  # closing the fd releases the flock

    @staticmethod
    def _lock_holder(path: str) -> int | None:
        """pid of the LIVE holder of ``path``, else None (absent lock,
        unparseable pid, or dead pid — all claimable). Call only under
        ``_lock_guard``."""
        try:
            with open(path) as fh:
                pid = int(fh.read().strip() or "-1")
        except (FileNotFoundError, ValueError):
            return None
        if pid <= 0:
            return None
        try:
            os.kill(pid, 0)
            return pid
        except ProcessLookupError:
            return None
        except PermissionError:
            return pid  # exists, owned by another uid

    def _release_lock(self, path: str) -> None:
        with self._lock_guard(path):
            try:
                os.remove(path)
            except FileNotFoundError:
                pass

    def _finalize(
        self,
        epoch_id: int,
        parent: M.Manifest | None,
        metric_rows: list[dict],
        duration: float = 0.0,
        source: str | None = None,
        exchange_mode: str | None = None,
    ) -> dict[str, Any]:
        p = M.paths(self.table_dir)
        os.makedirs(p["data"], exist_ok=True)

        partitions = dict(parent.partitions) if parent else {}
        schemas = []
        if parent and parent.stats.get("schema_b64"):
            schemas.append(_schema_from_b64(parent.stats["schema_b64"]))
        totals = {f: 0 for f in _METRIC_FIELDS}
        lineage_rows = []
        for row in sorted(metric_rows, key=lambda r: r["part"]):
            part = int(row["part"])
            for f in _METRIC_FIELDS:
                totals[f] += int(row[f])
            entry = dict(partitions.get(str(part), {}))
            entry["hwm_commit"] = row["hwm_commit"]
            entry["hwm_seq"] = int(row["hwm_seq"])
            if row["changed"]:
                if row.get("kind") == "delta":
                    dst_rel = os.path.join(
                        "data", f"part-{part:05d}-e{epoch_id:06d}-d.parquet"
                    )
                    os.replace(row["staged_file"], os.path.join(self.table_dir, dst_rel))
                    # COPY the list: entry is a shallow dict() of the
                    # parent manifest's partition info, so an in-place
                    # append would alias the child epoch's delta into
                    # the in-memory parent (and into part_info closures)
                    entry["deltas"] = list(entry.get("deltas") or []) + [dst_rel]
                    entry["rows"] = int(row["rows_out"])
                else:
                    dst_rel = os.path.join("data", f"part-{part:05d}-e{epoch_id:06d}.parquet")
                    os.replace(row["staged_file"], os.path.join(self.table_dir, dst_rel))
                    entry["file"] = dst_rel
                    entry["deltas"] = []
                    entry["rows"] = int(row["rows_out"])
            partitions[str(part)] = entry
            schemas.append(_schema_from_b64(row["schema_b64"]))
            lrow = {f: int(row[f]) for f in _METRIC_FIELDS}
            lrow.update(part=part, changed=bool(row["changed"]), hwm_commit=row["hwm_commit"], hwm_seq=int(row["hwm_seq"]))
            lineage_rows.append(lrow)

        unified = schemas[0] if schemas else S.snapshot_schema()
        for sch in schemas[1:]:
            unified = S.unify(unified, sch)

        self._pre_commit_hook(epoch_id)

        # throughput metrics per commit epoch (north-star requirement;
        # reference analog: processing_stats rows A5/ST2)
        events_in = totals.get("events_in", 0)
        throughput = {
            "duration_sec": round(duration, 3),
            "events_in": events_in,
            "events_per_sec": round(events_in / duration, 1) if duration > 0 else None,
        }
        if exchange_mode:
            throughput["exchange"] = exchange_mode
        man_stats_extra = throughput

        man = M.Manifest(
            epoch=epoch_id,
            parent=parent.epoch if parent else None,
            num_partitions=self.num_partitions,
            partitions=partitions,
            schema_names=unified.names,
            stats={
                "totals": totals,
                "throughput": man_stats_extra,
                "schema_b64": _schema_to_b64(unified),
                "merge": self.merge,
                "layout": self.layout,
                "dlq": self.dlq,
                "rows": sum(int(v.get("rows", 0)) for v in partitions.values()),
            },
        )
        M.write_lineage(
            self.table_dir,
            epoch_id,
            lineage_rows,
            throughput=throughput,
            totals=totals,
            source=source,
        )
        M.commit_manifest(self.table_dir, man)
        # GC the staging dir for this epoch (post-commit, best-effort).
        import shutil

        shutil.rmtree(os.path.join(self.table_dir, "_staging", f"epoch-{epoch_id:06d}"), ignore_errors=True)
        return {
            "epoch": epoch_id,
            "already_applied": False,
            "totals": totals,
            "rows": man.stats["rows"],
            "throughput": throughput,
        }

    # ------------------------------------------------------------------- read
    def read(self, columns: list[str] | None = None) -> "ray.data.Dataset":
        """Current committed snapshot as a streaming Dataset. For the
        merge-on-read layout, partitions with outstanding deltas are
        folded on the fly (one task per partition).

        ``columns`` pushes the projection INTO the scan: on the
        delta-free path only the requested columns (+ the tombstone
        marker, dropped after the filter) leave the parquet files — a
        2-column projection of a wide-content table must not read
        ``content``. The MOR path merges on key/version columns and
        projects after the fold."""
        man = M.load_current(self.table_dir)
        if not man:
            base = S.snapshot_schema()
            if columns is not None:
                unknown = [c for c in columns if c not in base.names]
                if unknown:
                    raise KeyError(f"unknown columns {unknown}; schema: {base.names}")
                base = pa.schema([base.field(c) for c in columns])
            return ray.data.from_arrow(base.empty_table())
        has_deltas = any(v.get("deltas") for v in man.partitions.values())
        schema = self._unified_schema(man)
        if schema is not None and S.DELETED_COLUMN in schema.names:
            # the deleted marker is write-side bookkeeping, never part of
            # the read surface
            schema = pa.schema([f for f in schema if f.name != S.DELETED_COLUMN])
        if columns is not None:
            # legacy manifests without a stored unified schema still get
            # validation + pruning against the base snapshot schema
            base = schema or pa.schema(
                [f for f in S.snapshot_schema() if f.name != S.DELETED_COLUMN]
            )
            unknown = [c for c in columns if c not in base.names]
            if unknown:
                raise KeyError(f"unknown columns {unknown}; schema: {base.names}")
            schema = pa.schema([base.field(c) for c in columns])
        if not has_deltas:
            files = [f for f in man.data_files(self.table_dir) if f]
            if not files:
                # schema is already validated + pruned to `columns` above
                base = schema or S.snapshot_schema()
                return ray.data.from_arrow(base.empty_table())
            if columns is not None:
                # physical files may predate newer schema columns (only
                # partitions touched since the evolution carry them), and
                # the Arrow scanner errors on a missing column — group
                # files by their available-column footprint (one footer
                # read per partition file, driver-side) and union one
                # pruned read per group; conform adds the missing columns
                # as nulls. The tombstone flag rides along for the filter.
                want = list(dict.fromkeys([*columns, S.DELETED_COLUMN]))
                groups: dict[tuple, list[str]] = {}
                for f in files:
                    names = set(pq.read_schema(f).names)
                    avail = tuple(c for c in want if c in names)
                    groups.setdefault(avail, []).append(f)
                subsets = [
                    ray.data.read_parquet(fs, columns=list(avail) or None)
                    for avail, fs in groups.items()
                ]
                ds = subsets[0]
                if len(subsets) > 1:
                    ds = ds.union(*subsets[1:])
            else:
                ds = ray.data.read_parquet(files)

            def conv(t: pa.Table, s=schema) -> pa.Table:
                # filter tombstones BEFORE conform (conform may drop the
                # deleted column when the unified schema lacks it)
                if S.DELETED_COLUMN in t.column_names:
                    t = t.filter(
                        pc.invert(pc.fill_null(t[S.DELETED_COLUMN], False))
                    ).drop_columns([S.DELETED_COLUMN])
                if s is not None:
                    t = S.conform(t, s)
                return t

            return ds.map_batches(conv, batch_format="pyarrow", zero_copy_batch=True)
        table_dir = self.table_dir
        strategy = self.merge
        infos = [
            dict(v) for _, v in sorted(man.partitions.items(), key=lambda kv: int(kv[0]))
            if v.get("file") or v.get("deltas")
        ]

        def load(batch: pa.Table) -> pa.Table:
            from laketide.stages.apply import limit_arrow_threads

            limit_arrow_threads(1)
            outs = []
            for i in batch["i"].to_pylist():
                t = _load_live_partition(
                    table_dir, infos[i], strategy, drop_deleted=True
                )
                if t is None:
                    continue
                if schema is not None:
                    t = S.conform(t, schema)
                outs.append(t)
            if not outs:
                base = schema or S.snapshot_schema()
                return base.empty_table()
            return pa.concat_tables(outs)

        parts = ray.data.from_items(
            [{"i": i} for i in range(len(infos))], override_num_blocks=len(infos)
        )
        return parts.map_batches(load, batch_format="pyarrow", batch_size=None)

    def state_table(self) -> pa.Table:
        """Whole snapshot as one Arrow table — tests / small tables only."""
        man = M.load_current(self.table_dir)
        if not man:
            return S.snapshot_schema().empty_table()
        schema = self._unified_schema(man) or S.snapshot_schema()
        parts = []
        for _, info in sorted(man.partitions.items(), key=lambda kv: int(kv[0])):
            t = _load_live_partition(self.table_dir, info, self.merge)
            if t is None:
                continue
            parts.append(S.conform(t, schema))
        if not parts:
            if S.DELETED_COLUMN in schema.names:
                schema = pa.schema([f for f in schema if f.name != S.DELETED_COLUMN])
            return schema.empty_table()
        out = pa.concat_tables(parts)
        if S.DELETED_COLUMN in out.column_names:
            out = out.drop_columns([S.DELETED_COLUMN])
        return out.sort_by([("repo", "ascending"), ("path", "ascending")])

    # ------------------------------------------------------------ operations
    def replay(
        self,
        changelog_dir: str,
        max_epochs: int | None = None,
        on_epoch: "Any | None" = None,
        **kw,
    ) -> list[dict[str, Any]]:
        """Incremental catch-up (reference I4: pull only new commits):
        apply every epoch slice in ``changelog_dir`` newer than the
        committed epoch (at most ``max_epochs`` of them). Resuming
        after a crash picks up exactly where the last committed
        manifest left off. ``on_epoch(table, result)`` fires after
        EVERY commit — one directory listing per replay call, so a
        long catch-up stays linear in the epoch count."""
        from laketide.sources.changelog import epoch_paths

        results = []
        files = epoch_paths(changelog_dir)
        start = self.current_epoch()
        for i, f in enumerate(files):
            epoch_id = i + 1
            if epoch_id <= start:
                continue
            results.append(self.apply_epoch(f, epoch_id=epoch_id, **kw))
            if on_epoch is not None:
                on_epoch(self, results[-1])
            if max_epochs is not None and len(results) >= max_epochs:
                break
        return results

    def get(self, repo: str, path: str) -> pa.Table:
        """Point lookup (reference J3 GetVulnerabilityByID): hash the key
        to its partition, read ONLY that partition file, filter."""
        from laketide.stages.partition import key_hash
        import numpy as np

        man = M.load_current(self.table_dir)
        if not man:
            return S.snapshot_schema().empty_table()
        h = key_hash(pa.array([repo]), pa.array([path]))[0]
        # the MANIFEST's partition count, not this handle's: after a
        # cross-process rescale the stale handle would hash into the
        # old layout and silently miss (the _apply_epoch_locked
        # re-adoption hazard, read-side)
        part = int(h % np.uint64(man.num_partitions))
        info = man.partitions.get(str(part))
        if not info or (not info.get("file") and not info.get("deltas")):
            return S.snapshot_schema().empty_table()
        t = _load_live_partition(
            self.table_dir, info, self.merge, key_filter=(repo, path)
        )
        if t is None:
            return S.snapshot_schema().empty_table()
        # the pushdown already filtered exactly; the mask is a cheap
        # invariant guard on the tiny result
        mask = pc.and_(pc.equal(t["repo"], repo), pc.equal(t["path"], path))
        return t.filter(mask)

    def export_snapshot(
        self, export_dir: str, fmt: str = "parquet", tag: str | None = None
    ) -> dict[str, Any]:
        """Versioned snapshot export with checksum manifest (reference
        S10: the ``exports`` table —
        /root/reference/migrations/001_initial_schema.up.sql:95-108; the
        export job also emits JSON/CSV snapshots,
        /root/reference/internal/jobs/server.go:543-588 — ``fmt`` is
        that option: ``parquet`` (default) | ``csv`` | ``jsonl``).
        Two-phase: stage into a temp dir, atomically rename; re-export of
        the same epoch+format is a no-op returning the existing manifest.

        INCREMENTAL across versions: each file records the source
        fingerprint (partition base file + delta list) that produced it;
        a later export hardlinks unchanged partitions from the newest
        previous same-format snapshot instead of re-merging, re-encoding
        and re-hashing them — at lake scale most partitions are untouched
        between exports."""
        import hashlib
        import json as _json
        import shutil as _shutil

        if fmt not in ("parquet", "csv", "jsonl"):
            raise ValueError(f"unsupported export format: {fmt!r}")
        if tag is not None:
            # export a PINNED named snapshot (gc keeps its manifest and
            # files alive, so the export is reproducible indefinitely)
            man = self.manifest_at(self.resolve_tag(tag))
            if not man:
                raise ValueError(f"tag {tag!r} epoch not retained")
        else:
            man = M.load_current(self.table_dir)
        if not man:
            raise ValueError("nothing committed to export")
        # parquet keeps the unsuffixed name (back-compat with existing
        # export dirs); other formats get their own snapshot lineage
        name = f"snapshot-{man.epoch:06d}" + ("" if fmt == "parquet" else f"-{fmt}")
        final = os.path.join(export_dir, name)
        meta_path = os.path.join(final, "EXPORT.json")
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                return _json.load(fh)
        os.makedirs(export_dir, exist_ok=True)

        # newest previous snapshot, for incremental reuse
        import glob as _glob

        prev_meta, prev_dir = None, None
        for d in sorted(
            (
                d
                for d in _glob.glob(os.path.join(export_dir, "snapshot-*"))
                if os.path.isfile(os.path.join(d, "EXPORT.json")) and d != final
            ),
            reverse=True,
        ):
            with open(os.path.join(d, "EXPORT.json")) as fh:
                m = _json.load(fh)
            # reuse only within the same format lineage (a csv export
            # can't hardlink a parquet file)
            if m.get("format", "parquet") == fmt:
                prev_dir, prev_meta = d, m
                break
        prev_by_name = {
            f["name"]: f for f in (prev_meta or {}).get("files", []) if f.get("source")
        }

        tmp = final + ".tmp"
        _shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        import ray as _ray

        table_dir = self.table_dir
        merge = self.merge

        def _fingerprint(info: dict) -> str:
            return _json.dumps(
                {"file": info.get("file"), "deltas": info.get("deltas") or []},
                sort_keys=True,
            )

        # one Ray task per CHANGED partition (the old loop read+merged+
        # wrote+hashed every partition serially on the driver)
        ext = {"parquet": "parquet", "csv": "csv", "jsonl": "jsonl"}[fmt]

        @_ray.remote(num_cpus=1)
        def _export_one(part: int, info: dict, source: str) -> dict | None:
            from laketide.stages.apply import limit_arrow_threads

            limit_arrow_threads(1)
            merged = _load_live_partition(table_dir, info, merge, drop_deleted=True)
            if merged is None:
                return None
            base = f"part-{part:05d}.{ext}"
            dst = os.path.join(tmp, base)
            if fmt == "parquet":
                pq.write_table(merged, dst)
            elif fmt == "csv":
                from pyarrow import csv as _pacsv

                _pacsv.write_csv(merged, dst)
            else:  # jsonl — Arrow has no JSON writer; pandas' C encoder
                merged.to_pandas().to_json(
                    dst, orient="records", lines=True, date_format="iso"
                )
            with open(dst, "rb") as fh:
                sha = hashlib.sha256(fh.read()).hexdigest()
            return {
                "name": base,
                "bytes": os.path.getsize(dst),
                "sha256": sha,
                "rows": merged.num_rows,
                "source": source,
            }

        reused: list[dict] = []
        futures = []
        for k, v in sorted(man.partitions.items(), key=lambda kv: int(kv[0])):
            info = dict(v)
            src = _fingerprint(info)
            base = f"part-{int(k):05d}.{ext}"
            prev = prev_by_name.get(base)
            prev_path = os.path.join(prev_dir, base) if prev_dir else ""
            if prev and prev["source"] == src and os.path.exists(prev_path):
                os.link(prev_path, os.path.join(tmp, base))
                reused.append(dict(prev))
                continue
            if not info.get("file") and not info.get("deltas"):
                continue
            futures.append(_export_one.remote(int(k), info, src))

        results = [r for r in _ray.get(futures) if r is not None]
        files = sorted(reused + results, key=lambda f: f["name"])
        rows = sum(r["rows"] for r in files)
        meta = {
            "version": man.epoch,
            "rows": rows,
            "files": files,
            "reused": len(reused),
            "status": "completed",
            "merge": self.merge,
            "format": fmt,
        }
        with open(os.path.join(tmp, "EXPORT.json"), "w") as fh:
            fh.write(_json.dumps(meta, sort_keys=True, indent=1))
        os.replace(tmp, final)
        return meta

    def _dlq_files(self, epoch: int | None) -> list[str]:
        import glob as _glob

        pat = f"epoch-{epoch:06d}" if epoch is not None else "epoch-*"
        return sorted(
            _glob.glob(os.path.join(self.table_dir, "_dlq", pat, "*.parquet"))
        )

    def dlq_dataset(self, epoch: int | None = None) -> "ray.data.Dataset":
        """Quarantined malformed rows (``LakeTable(dlq=True)``): all
        epochs, or one. Rows are the ORIGINAL events — repair and feed
        back through ``apply_epoch`` to replay them, then acknowledge
        with ``purge_dlq``. The DLQ is an ERROR stream (small by
        construction), so files are unified driver-side — per-epoch
        payload schemas may differ under additive evolution and a raw
        multi-file scan would reject the mismatch. Empty Dataset (core
        event schema) when nothing is quarantined."""
        import ray.data as _rd

        files = self._dlq_files(epoch)
        core = pa.schema([(c, S.CORE_TYPES[c]) for c in S.CORE_COLUMNS])
        if not files:
            return _rd.from_arrow(core.empty_table())
        tables = [pq.read_table(f).replace_schema_metadata(None) for f in files]
        unified = core
        for t in tables:
            unified = S.unify(unified, t.schema)
        out = pa.concat_tables([S.conform(t, unified) for t in tables])
        # Redelivery can re-quarantine the same malformed event under a
        # NEW epoch dir (an epoch whose partition carried only malformed
        # rows never advances the HWM, and null commit/seq rows have no
        # HWM at all) — dedupe across epoch dirs so a repair loop sees
        # each event once. Dedup is on the FULL row (identity AND
        # payload): collapsing on identity alone would hide a
        # redelivered same-identity event whose payload changed, and the
        # repair loop would fix a stale payload. Files are read in epoch
        # order, so "first seen" wins for byte-identical redeliveries.
        # The DLQ is an error stream (small by construction): a
        # driver-side pass is the right cost here.
        seen: set = set()
        keep: list[int] = []
        rows = out.to_pylist()
        for i, r in enumerate(rows):
            key = repr(sorted((k, repr(v)) for k, v in r.items()))
            if key in seen:
                continue
            seen.add(key)
            keep.append(i)
        if len(keep) != out.num_rows:
            out = out.take(pa.array(keep, type=pa.int64()))
        return _rd.from_arrow(out)

    def purge_dlq(self, up_to_epoch: int | None = None) -> dict[str, Any]:
        """Acknowledge repaired DLQ rows: drop quarantine dirs for
        epochs <= ``up_to_epoch`` (committed epochs only when None).
        Without this, already-repaired rows would sit in ``dlq_dataset``
        forever and a re-run of the repair loop would double-apply them.

        Runs under the writer lock (honoring ``lock_wait_seconds``) so a
        purge can never race a live ``apply_epoch`` and rmtree the
        in-flight epoch's quarantine between its ``write_dlq`` and its
        commit; additionally ``up_to_epoch`` is clipped to the committed
        epoch, so even a stale handle cannot touch an uncommitted dir."""
        lock = self._acquire_lock()
        try:
            return self._purge_dlq_locked(up_to_epoch)
        finally:
            self._release_lock(lock)

    def _purge_dlq_locked(self, up_to_epoch: int | None) -> dict[str, Any]:
        import glob as _glob
        import re as _re
        import shutil as _sh

        man = self.current_manifest()
        committed = man.epoch if man else 0
        ceiling = committed if up_to_epoch is None else min(up_to_epoch, committed)
        removed = 0
        for d in _glob.glob(os.path.join(self.table_dir, "_dlq", "epoch-*")):
            mt = _re.match(r"epoch-(\d+)$", os.path.basename(d))
            if not mt:
                continue
            if int(mt.group(1)) <= ceiling:
                _sh.rmtree(d, ignore_errors=True)
                removed += 1
        return {"removed_epoch_dirs": removed, "up_to_epoch": ceiling}

    def sync_sources(self, jobs: "list[tuple[str, str]]") -> dict[str, Any]:
        """Composed multi-source sync — the reference's entry point B
        (iterate registered sources into the one master table with a
        per-source processing-stats row each,
        /root/reference/internal/jobs/server.go:115-170). Each
        ``(source_name, path)`` job syncs as its OWN committed epoch, in
        order (later sources see — and merge over — earlier ones), and
        its lineage row carries the source tag, so ``source_stats()``
        reconstructs the per-source stats table. Sources disabled via
        ``LAKETIDE_ENABLED_SOURCES`` (E2) are skipped with a marked row;
        unknown source names raise before anything syncs (a config typo
        must be loud)."""
        from laketide.sources import registry as _reg

        specs = [(name, path, _reg.get(name)) for name, path in jobs]
        enabled = set(_reg.enabled_sources())
        out: list[dict] = []
        for name, path, src in specs:
            if name not in enabled:
                out.append({"source": name, "skipped": True})
                continue
            r = self.apply_epoch(src.read(path), source=name)
            out.append(
                {
                    "source": name,
                    "epoch": r["epoch"],
                    "totals": r["totals"],
                    "skipped": False,
                }
            )
        return {
            "jobs": out,
            "epochs_applied": sum(1 for j in out if not j.get("skipped")),
        }

    def source_stats(self) -> list[dict]:
        """Per-source processing stats over committed epochs (reference
        ``processing_stats`` analog): one row per epoch that was synced
        through ``sync_sources`` / ``apply_epoch(source=...)``, oldest
        first."""
        import glob as _glob
        import json as _json

        p = M.paths(self.table_dir)
        rows = []
        for f in sorted(_glob.glob(os.path.join(p["lineage"], "epoch-*.json"))):
            try:
                with open(f) as fh:
                    doc = _json.load(fh)
            except (OSError, ValueError):
                continue
            if doc.get("source"):
                rows.append(
                    {
                        "source": doc["source"],
                        "epoch": doc["epoch"],
                        "totals": doc.get("totals") or {},
                        "throughput": doc.get("throughput") or {},
                    }
                )
        return rows

    # ------------------------------------------------------------------- tags
    @staticmethod
    def _check_tag_name(name: str) -> None:
        import re as _re

        if not _re.match(r"^[A-Za-z0-9][A-Za-z0-9._-]{0,63}$", name) or name.endswith(
            ".tmp"
        ):
            raise ValueError(
                f"invalid tag name {name!r} (alnum start; [A-Za-z0-9._-], "
                "max 64, must not end in .tmp)"
            )

    def tag(self, name: str, epoch: int | None = None) -> dict[str, Any]:
        """Pin a committed epoch under a stable name (Iceberg tag
        analog: release markers, reproducible training-set snapshots).
        Tagged epochs join gc's keep set, so the snapshot stays
        time-travel-readable until the tag is deleted. Taken under the
        writer lock — tagging must not race a gc computing its keep set
        (the tag could land after gc chose what to delete)."""
        self._check_tag_name(name)
        lock = self._acquire_lock()
        try:
            if epoch is None:
                epoch = self.current_epoch()
            if not self.manifest_at(epoch):
                raise ValueError(f"epoch {epoch} not retained (gc'd or never committed)")
            p = M.paths(self.table_dir)
            os.makedirs(p["tags"], exist_ok=True)
            import time as _time

            M._atomic_write(
                os.path.join(p["tags"], name),
                json.dumps({"epoch": epoch, "created_at": _time.time()}),
            )
        finally:
            self._release_lock(lock)
        return {"name": name, "epoch": epoch}

    def tags(self, strict: bool = False) -> dict[str, int]:
        """name -> epoch for every tag on this table. ``strict=True``
        raises on an unreadable/corrupt tag file instead of skipping it —
        gc MUST use strict (a silently-skipped tag would silently unpin
        its epoch), and fsck uses strict to surface the corruption."""
        import glob as _glob

        p = M.paths(self.table_dir)
        out: dict[str, int] = {}
        for f in sorted(_glob.glob(os.path.join(p["tags"], "*"))):
            base = os.path.basename(f)
            if base.endswith(".tmp"):
                continue  # _atomic_write crash leftover, never a tag
            try:
                with open(f) as fh:
                    out[base] = int(json.load(fh)["epoch"])
            except (OSError, ValueError, KeyError) as ex:
                if strict:
                    raise RuntimeError(f"unreadable tag file {base!r}: {ex}") from ex
                continue
        return out

    def resolve_tag(self, name: str) -> int:
        t = self.tags()
        if name not in t:
            raise KeyError(f"unknown tag {name!r}; known: {sorted(t)}")
        return t[name]

    def delete_tag(self, name: str) -> bool:
        """Remove a tag (the epoch becomes gc-able again). Under the
        writer lock for the same reason tag() is. Validates the name —
        an unvalidated os.remove(join(dir, name)) would be a
        path-traversal file deleter ('../CURRENT')."""
        self._check_tag_name(name)
        lock = self._acquire_lock()
        try:
            p = M.paths(self.table_dir)
            try:
                os.remove(os.path.join(p["tags"], name))
                return True
            except FileNotFoundError:
                return False
        finally:
            self._release_lock(lock)

    def fsck(self, deep: bool = False) -> dict[str, Any]:
        """Table integrity check (the ops-surface fsck): every data
        file the live manifest references must exist with a readable
        parquet footer; every retained manifest must parse; unreferenced
        data files (gc candidates) and staging leftovers surface as
        WARNINGS, not errors. ``deep=True`` additionally folds the live
        state and compares the row count against the manifest's
        bookkeeping. Read-only — never mutates the table.

        Reference analog: the reference relies on PostgreSQL for
        physical integrity; a file-lake engine must ship its own checker
        (Delta's FSCK / Iceberg's verify analog)."""
        import glob as _glob

        p = M.paths(self.table_dir)
        errors: list[str] = []
        warnings: list[str] = []
        try:
            man = self.current_manifest()
        except RuntimeError as ex:
            # dangling CURRENT is the corruption fsck exists to REPORT,
            # not die on
            return {
                "ok": False,
                "epoch": None,
                "files_checked": 0,
                "errors": [str(ex)],
                "warnings": [],
                "orphans": 0,
            }
        if man is None:
            return {
                "ok": True,
                "epoch": 0,
                "files_checked": 0,
                "errors": [],
                "warnings": [],
                "orphans": 0,
            }
        referenced: set[str] = set()
        files_checked = 0
        for pid, info in sorted(man.partitions.items(), key=lambda kv: int(kv[0])):
            rels = ([info["file"]] if info.get("file") else []) + list(
                info.get("deltas") or []
            )
            for rel in rels:
                fp = os.path.join(self.table_dir, rel)
                if not os.path.exists(fp):
                    errors.append(f"partition {pid}: missing data file {rel}")
                    continue
                try:
                    pq.ParquetFile(fp).metadata  # footer readable
                    files_checked += 1
                except Exception as ex:  # corrupt footer
                    errors.append(
                        f"partition {pid}: unreadable parquet {rel}: {ex}"
                    )
        # orphan detection spans ALL retained manifests (time travel
        # keeps their files live until gc) — the loop below covers the
        # live manifest too, bases AND deltas
        for mf in _glob.glob(os.path.join(p["manifests"], "manifest-*.json")):
            try:
                with open(mf) as fh:
                    m2 = M.Manifest.from_json(fh.read())
            except Exception as ex:
                errors.append(f"unparseable manifest {os.path.basename(mf)}: {ex}")
                continue
            for _pid, info in m2.partitions.items():
                if info.get("file"):
                    referenced.add(info["file"])
                for rel in info.get("deltas") or []:
                    referenced.add(rel)
        on_disk = [
            os.path.relpath(f, self.table_dir)
            for f in _glob.glob(os.path.join(p["data"], "**", "*"), recursive=True)
            if os.path.isfile(f)
        ]
        orphans = [f for f in on_disk if f not in referenced]
        if orphans:
            warnings.append(
                f"{len(orphans)} unreferenced data file(s) (gc candidates)"
            )
        # staging leftovers are FILES nested under epoch dirs
        # (_staging/epoch-000004/part-*.parquet after a crash), and
        # _atomic_write crashes leave *.tmp* next to manifests/CURRENT
        staging_files = [
            f
            for f in _glob.glob(os.path.join(p["staging"], "**", "*"), recursive=True)
            if os.path.isfile(f)
        ]
        manifest_tmp = [
            f
            for f in _glob.glob(os.path.join(p["manifests"], "*"))
            if ".tmp" in os.path.basename(f)
        ]
        dlq_tmp = [
            f
            for f in _glob.glob(
                os.path.join(self.table_dir, "_dlq", "**", "*"), recursive=True
            )
            if os.path.isfile(f) and ".tmp" in os.path.basename(f)
        ]
        stale_tmp = (
            staging_files
            + manifest_tmp
            + dlq_tmp
            + [f for f in on_disk if ".tmp" in os.path.basename(f)]
        )
        if stale_tmp:
            warnings.append(f"{len(stale_tmp)} stale staging/tmp file(s)")
        # tags must parse and resolve to retained manifests (gc pins
        # tagged epochs, so a dangler means manual deletion or external
        # corruption; an unreadable tag file is corruption too — the
        # non-strict read would hide it AND gc refuses to run over it)
        try:
            tag_map = self.tags(strict=True)
        except RuntimeError as ex:
            errors.append(str(ex))
            tag_map = self.tags()
        for tname, tepoch in tag_map.items():
            if self.manifest_at(tepoch) is None:
                errors.append(
                    f"tag {tname!r} points at epoch {tepoch} with no retained manifest"
                )
        rows_live = None
        if deep and not errors:
            rows_live = self.state_table().num_rows
            booked = man.stats.get("rows")
            if booked is not None and booked != rows_live:
                errors.append(
                    f"manifest books {booked} live rows, fold finds {rows_live}"
                )
        return {
            "ok": not errors,
            "epoch": man.epoch,
            "files_checked": files_checked,
            "errors": errors,
            "warnings": warnings,
            "orphans": len(orphans),
            **({"rows_live": rows_live} if rows_live is not None else {}),
        }

    def gc(self, keep_last: int = 2) -> dict[str, Any]:
        """Retention cleanup (reference I7: delete rows older than a
        cutoff / job retention —
        /root/reference/internal/jobs/server.go:690-727): drop manifests
        older than the newest ``keep_last`` and any data file no kept
        manifest references. Never touches the live manifest: the
        manifest named in CURRENT is always in the keep set, and
        recency is (epoch, mtime) — NOT the filename — because
        maintenance manifests (``manifest-000005-c0.json``) sort
        lexicographically BEFORE their base epoch ('-' < '.').

        Takes the single-writer lock: gc deletes data files and the
        staging tree, which must never race an in-flight commit."""
        lock = self._acquire_lock()
        try:
            return self._gc_locked(keep_last)
        finally:
            self._release_lock(lock)

    def _gc_locked(self, keep_last: int) -> dict[str, Any]:
        import glob as _glob
        p = M.paths(self.table_dir)

        manifests = sorted(
            _glob.glob(os.path.join(p["manifests"], "manifest-*.json")),
            key=_manifest_recency,
        )
        keep = manifests[-keep_last:] if keep_last > 0 else manifests[-1:]
        # The live manifest is sacred regardless of keep_last.
        try:
            with open(p["current"]) as fh:
                live = os.path.join(p["manifests"], fh.read().strip())
            if live in manifests and live not in keep:
                keep.append(live)
        except FileNotFoundError:
            pass
        # tagged epochs are pinned: every manifest file of a tagged
        # epoch stays (base + maintenance variants), so state_table_at
        # keeps replaying it until the tag is deleted. STRICT read: an
        # unreadable tag must abort gc, not silently unpin its epoch.
        tagged = set(self.tags(strict=True).values())
        if tagged:
            for mf in manifests:
                if _manifest_recency(mf)[0] in tagged and mf not in keep:
                    keep.append(mf)
        referenced: set[str] = set()
        for mf in keep:
            with open(mf) as fh:
                man = M.Manifest.from_json(fh.read())
            for info in man.partitions.values():
                if info.get("file"):
                    referenced.add(os.path.join(self.table_dir, info["file"]))
                for r in info.get("deltas") or []:
                    referenced.add(os.path.join(self.table_dir, r))
        removed_files = 0
        for f in _glob.glob(os.path.join(p["data"], "*.parquet")):
            if f not in referenced:
                os.remove(f)
                removed_files += 1
        # crash leftovers: under the writer lock no apply/maintenance is
        # in flight, so any *.tmp-<pid> in data/ is a dead write — they
        # match no manifest and would otherwise accumulate forever
        for f in _glob.glob(os.path.join(p["data"], "*.tmp-*")):
            os.remove(f)
            removed_files += 1
        removed_manifests = 0
        keep_set = set(keep)
        for mf in manifests:
            if mf not in keep_set:
                os.remove(mf)
                removed_manifests += 1
        # prune lineage older than the oldest kept manifest's epoch: the
        # audit log follows the same retention as the manifest log (a
        # long-running tail otherwise grows one JSON per epoch unbounded)
        removed_lineage = 0
        if keep:
            import re as _re

            oldest_kept = min(_manifest_recency(mf)[0] for mf in keep)
            for lf in _glob.glob(os.path.join(p["lineage"], "epoch-*.json")):
                mt = _re.match(r"epoch-(\d+)", os.path.basename(lf))
                if mt and int(mt.group(1)) < oldest_kept:
                    os.remove(lf)
                    removed_lineage += 1
        import shutil as _shutil

        _shutil.rmtree(p["staging"], ignore_errors=True)
        return {
            "removed_files": removed_files,
            "removed_manifests": removed_manifests,
            "removed_lineage": removed_lineage,
        }

    def compact(self) -> dict[str, Any]:
        """Fold every partition's outstanding deltas into a fresh base
        file and commit a maintenance manifest (same epoch, new name).
        The read path needs no compaction for correctness — this trades
        one write for faster subsequent reads (Hudi/Iceberg compaction
        analog; reference analog: snapshot export consolidations S10)."""
        lock = self._acquire_lock()
        try:
            return self._compact_locked()
        finally:
            self._release_lock(lock)

    def _compact_locked(self) -> dict[str, Any]:
        import ray as _ray

        man = M.load_current(self.table_dir)
        if not man:
            return {"compacted": 0}
        partitions = {k: dict(v) for k, v in man.partitions.items()}
        table_dir = self.table_dir
        merge = self.merge
        epoch = man.epoch

        # one Ray task per delta-bearing partition: the old driver-side
        # loop serialized every read+merge+write through one process — a
        # P-partition compaction is embarrassingly parallel
        @_ray.remote(num_cpus=1)
        def _compact_one(part: int, info: dict) -> dict:
            from laketide.stages.apply import limit_arrow_threads, merge_partition

            limit_arrow_threads(1)
            base = (
                pq.read_table(os.path.join(table_dir, info["file"]))
                if info.get("file")
                else None
            )
            delta_ts = [
                pq.read_table(os.path.join(table_dir, r)) for r in info["deltas"]
            ]
            merged = merge_partition(base, delta_ts, merge, keep_tombstones=True)
            n = 0
            while True:
                rel = os.path.join("data", f"part-{part:05d}-e{epoch:06d}-c{n}.parquet")
                if not os.path.exists(os.path.join(table_dir, rel)):
                    break
                n += 1
            tmp = os.path.join(table_dir, rel) + f".tmp-{os.getpid()}"
            pq.write_table(merged, tmp, **adaptive_write_kwargs(merged))
            os.replace(tmp, os.path.join(table_dir, rel))
            dead = (
                int(pc.sum(pc.fill_null(merged[S.DELETED_COLUMN], False)).as_py() or 0)
                if S.DELETED_COLUMN in merged.column_names
                else 0
            )
            return {"part": part, "file": rel, "rows": merged.num_rows - dead}

        todo = {
            key: info for key, info in partitions.items() if info.get("deltas")
        }
        results = _ray.get(
            [_compact_one.remote(int(k), dict(v)) for k, v in todo.items()]
        )
        for r in results:
            info = partitions[str(r["part"])]
            info["file"] = r["file"]
            info["deltas"] = []
            info["rows"] = r["rows"]
        compacted = len(results)
        if not compacted:
            return {"compacted": 0}
        new_man = M.Manifest(
            epoch=man.epoch,
            parent=man.parent,
            num_partitions=man.num_partitions,
            partitions=partitions,
            schema_names=man.schema_names,
            stats=dict(
                man.stats,
                rows=sum(int(v.get("rows", 0)) for v in partitions.values()),
                # bump the maintenance generation: actor-pool applier
                # caches keyed to (epoch, gen) must reload after any
                # same-epoch file rewrite
                maintenance_gen=int(man.stats.get("maintenance_gen", 0)) + 1,
            ),
        )
        p = M.paths(self.table_dir)
        os.makedirs(p["manifests"], exist_ok=True)
        n = 0
        while True:
            name = f"manifest-{man.epoch:06d}-c{n}.json"
            if not os.path.exists(os.path.join(p["manifests"], name)):
                break
            n += 1
        M._atomic_write(os.path.join(p["manifests"], name), new_man.to_json())
        M._atomic_write(p["current"], name)
        self._actor_pool = None  # partition files rewritten
        return {"compacted": compacted, "manifest": name}

    def purge_tombstones(self, older_than_epochs: int = 16) -> dict[str, Any]:
        """Maintenance: rewrite partitions dropping tombstone rows whose
        version is older than ``older_than_epochs`` committed epochs
        (retention horizon). Safe only once no event older than the
        horizon can still arrive — the operator's call, like Hudi/Delta
        tombstone retention windows. Commits a maintenance manifest."""
        lock = self._acquire_lock()
        try:
            return self._purge_locked(older_than_epochs)
        finally:
            self._release_lock(lock)

    def _purge_locked(self, older_than_epochs: int) -> dict[str, Any]:
        man = M.load_current(self.table_dir)
        if not man:
            return {"purged": 0}
        cutoff = man.epoch - older_than_epochs
        partitions = {k: dict(v) for k, v in man.partitions.items()}
        table_dir = self.table_dir
        epoch = man.epoch
        import ray as _ray

        # one Ray task per eligible partition (was a serial driver loop)
        @_ray.remote(num_cpus=1)
        def _purge_one(part: int, rel_in: str) -> dict:
            from laketide.stages.apply import limit_arrow_threads

            limit_arrow_threads(1)
            t = pq.read_table(os.path.join(table_dir, rel_in))
            if S.DELETED_COLUMN not in t.column_names:
                return {"part": part, "n_drop": 0}
            dead = pc.fill_null(t[S.DELETED_COLUMN], False)
            old = pc.less_equal(
                pc.fill_null(t[S.APPLIED_EPOCH_COLUMN], 0), pa.scalar(cutoff, pa.int64())
            )
            drop = pc.and_(dead, old)
            n_drop = int(pc.sum(drop).as_py() or 0)
            if not n_drop:
                return {"part": part, "n_drop": 0}
            out = t.filter(pc.invert(drop))
            n = 0
            while True:
                rel = os.path.join("data", f"part-{part:05d}-e{epoch:06d}-p{n}.parquet")
                if not os.path.exists(os.path.join(table_dir, rel)):
                    break
                n += 1
            tmp = os.path.join(table_dir, rel) + f".tmp-{os.getpid()}"
            pq.write_table(out, tmp)
            os.replace(tmp, os.path.join(table_dir, rel))
            return {"part": part, "n_drop": n_drop, "file": rel}

        todo = [
            (int(k), info["file"])
            for k, info in partitions.items()
            if info.get("file") and not info.get("deltas")
            # delta partitions: compact first
        ]
        results = _ray.get([_purge_one.remote(p, rel) for p, rel in todo])
        purged = 0
        for r in results:
            if r["n_drop"]:
                partitions[str(r["part"])]["file"] = r["file"]
                purged += r["n_drop"]
        if not purged:
            return {"purged": 0}
        new_man = M.Manifest(
            epoch=man.epoch,
            parent=man.parent,
            num_partitions=man.num_partitions,
            partitions=partitions,
            schema_names=man.schema_names,
            stats=dict(
                man.stats,
                maintenance_gen=int(man.stats.get("maintenance_gen", 0)) + 1,
            ),
        )
        p = M.paths(self.table_dir)
        n = 0
        while True:
            name = f"manifest-{man.epoch:06d}-p{n}.json"
            if not os.path.exists(os.path.join(p["manifests"], name)):
                break
            n += 1
        M._atomic_write(os.path.join(p["manifests"], name), new_man.to_json())
        M._atomic_write(p["current"], name)
        # partition files were rewritten: a cross-epoch actor cache would
        # resurrect the purged tombstones on the next actor-mode epoch
        self._actor_pool = None
        return {"purged": purged, "manifest": name}

    def lineage_dataset(self) -> "ray.data.Dataset":
        """Per-epoch, per-partition lineage/metrics as a queryable
        Dataset (the reference's ``processing_stats`` table, A5/ST2)."""
        import glob as _glob
        import json as _json

        p = M.paths(self.table_dir)
        rows = []
        for f in sorted(_glob.glob(os.path.join(p["lineage"], "epoch-*.json"))):
            with open(f) as fh:
                doc = _json.load(fh)
            tp = doc.get("throughput") or {}
            for part_row in doc.get("partitions", []):
                r = dict(part_row)
                r["epoch"] = doc["epoch"]
                r["epoch_duration_sec"] = tp.get("duration_sec")
                r["epoch_events_per_sec"] = tp.get("events_per_sec")
                rows.append(r)
        if not rows:
            return ray.data.from_items([])
        return ray.data.from_items(rows)

    def rescale(self, new_partitions: int) -> dict[str, Any]:
        """Change the partition count via a full rewrite commit
        (SURVEY.md §7.4 risk 5: P is pinned per table because event
        partition i must co-locate with snapshot partition i; changing P
        is a table-wide rewrite, exactly as in Hudi/Iceberg bucket
        rescaling).

        HWM safety: a new partition's high-water mark is the MIN over the
        old partitions' marks — conservative (never drops an undelivered
        event); anything re-delivered between the min and a key's true
        mark is neutralized by the idempotent LWW apply.

        Distributed: one Ray task per OLD partition spills rows sorted
        by their NEW partition id (partition-aligned row groups), then
        one task per NEW partition assembles its base — the same
        storage-backed exchange the apply path uses, so it scales to
        multi-TB tables.
        """
        if new_partitions < 1:
            raise ValueError("new_partitions must be >= 1")
        lock = self._acquire_lock()
        try:
            return self._rescale_locked(new_partitions)
        finally:
            self._release_lock(lock)

    def _rescale_locked(self, new_partitions: int) -> dict[str, Any]:
        import ray as _ray

        man = M.load_current(self.table_dir)
        if not man:
            self.num_partitions = new_partitions
            return {"rescaled": True, "rows": 0}

        # MIN over ALL old partitions INCLUDING ones that never received
        # an event (their true mark is ("", -1)); excluding them would
        # set the new HWM too high and silently drop the first events of
        # keys that hashed to an empty old partition (data loss).
        hwms = [
            (
                (man.partitions.get(str(p)) or {}).get("hwm_commit", ""),
                int((man.partitions.get(str(p)) or {}).get("hwm_seq", -1)),
            )
            for p in range(man.num_partitions)
        ]
        hwm_c, hwm_s = min(hwms) if hwms else ("", -1)

        table_dir = self.table_dir
        merge = self.merge
        ex_dir = os.path.join(table_dir, "_staging", f"rescale-{man.epoch:06d}")
        os.makedirs(ex_dir, exist_ok=True)

        @_ray.remote(num_cpus=1)
        def spill_old(info: dict) -> list[dict]:
            from laketide.stages.apply import limit_arrow_threads, merge_partition
            from laketide.stages.partition import assign_partitions

            limit_arrow_threads(1)
            base = (
                pq.read_table(os.path.join(table_dir, info["file"]))
                if info.get("file")
                else None
            )
            deltas = [
                pq.read_table(os.path.join(table_dir, r))
                for r in info.get("deltas") or []
            ]
            if base is None and not deltas:
                return []
            t = (
                merge_partition(base, deltas, merge, keep_tombstones=True)
                if deltas
                else base
            )
            t = t.append_column(S.PART_COLUMN, assign_partitions(t, new_partitions))
            summary = _SpillShards(ex_dir)(t)
            return summary.to_pylist()

        summaries = _ray.get(
            [spill_old.remote(dict(info)) for info in man.partitions.values()]
        )
        file_index = sorted(
            (r["file"], tuple(r["parts"]) if r.get("parts") is not None else None)
            for rows in summaries
            for r in rows
        )

        @_ray.remote(num_cpus=1)
        def build_new(p: int) -> dict:
            from laketide.stages.apply import limit_arrow_threads

            limit_arrow_threads(1)
            tbls = _read_partition_rows(file_index, p)
            if not tbls:
                return {"part": p}
            # old partitions can carry unevenly-evolved payload schemas
            # (a column like `lang` that appeared mid-stream exists only
            # in partitions touched since) — unify+conform before concat
            # or ArrowInvalid aborts the rescale mid-operation
            schema = tbls[0].schema
            for t_ in tbls[1:]:
                schema = S.unify(schema, t_.schema)
            sub = pa.concat_tables(
                [S.conform(t_, schema) for t_ in tbls]
            ).drop_columns([S.PART_COLUMN])
            sub = sub.sort_by([("repo", "ascending"), ("path", "ascending")])
            rel = os.path.join(
                "data", f"part-{p:05d}-e{man.epoch:06d}-r{new_partitions}.parquet"
            )
            tmp = os.path.join(table_dir, rel) + f".tmp-{os.getpid()}"
            pq.write_table(sub, tmp, **adaptive_write_kwargs(sub))
            os.replace(tmp, os.path.join(table_dir, rel))
            dead = (
                int(pc.sum(pc.fill_null(sub[S.DELETED_COLUMN], False)).as_py() or 0)
                if S.DELETED_COLUMN in sub.column_names
                else 0
            )
            return {"part": p, "file": rel, "rows": sub.num_rows - dead}

        results = _ray.get([build_new.remote(p) for p in range(new_partitions)])

        partitions: dict[str, dict] = {}
        total_live = 0
        for r in results:
            entry = {"hwm_commit": hwm_c, "hwm_seq": hwm_s}
            if r.get("file"):
                entry["file"] = r["file"]
                entry["rows"] = int(r["rows"])
                total_live += int(r["rows"])
            partitions[str(r["part"])] = entry
        import shutil as _shutil

        _shutil.rmtree(ex_dir, ignore_errors=True)

        new_man = M.Manifest(
            epoch=man.epoch,
            parent=man.parent,
            num_partitions=new_partitions,
            partitions=partitions,
            schema_names=man.schema_names,
            stats=dict(
                man.stats,
                rows=total_live,
                maintenance_gen=int(man.stats.get("maintenance_gen", 0)) + 1,
            ),
        )
        p_ = M.paths(self.table_dir)
        os.makedirs(p_["manifests"], exist_ok=True)
        n = 0
        while True:
            name = f"manifest-{man.epoch:06d}-r{n}.json"
            if not os.path.exists(os.path.join(p_["manifests"], name)):
                break
            n += 1
        M._atomic_write(os.path.join(p_["manifests"], name), new_man.to_json())
        M._atomic_write(p_["current"], name)
        self.num_partitions = new_partitions
        self._actor_pool = None  # routing changed
        return {"rescaled": True, "num_partitions": new_partitions, "rows": total_live}

    def tail(
        self,
        changelog_dir: str,
        poll_seconds: float = 2.0,
        max_idle_polls: int = 3,
        on_epoch: "Any | None" = None,
        **kw,
    ) -> list[dict[str, Any]]:
        """WAL-tail follower: poll ``changelog_dir`` for new epoch slices
        and apply them as they appear; stop after ``max_idle_polls``
        consecutive polls with nothing new (a daemon would loop forever).
        The binlog-tail entry point of the north star, built on
        ``replay`` (only-new-epochs) so restarts resume exactly.

        Producer contract: epoch slices must APPEAR atomically — single
        files via write-to-temp-then-rename, sharded epoch DIRECTORIES
        by staging the whole directory as ``epoch-NNN.tmp/`` and
        renaming it into place once all shards are written
        (``generate_changelog`` does both; ``epoch_paths`` ignores
        ``*.tmp``). The follower reads a slice as soon as it matches
        ``epoch-*``; a non-atomic publish could expose a truncated
        parquet or a partial shard set that would be committed and the
        late shards dropped forever.

        ``on_epoch(table, result_dict)`` fires after every committed
        epoch — the streaming hook for incremental consumers
        (``IncrementalCountView.refresh``, CDF shippers, metrics
        emitters). Hook exceptions propagate: a consumer that must not
        stop the follower wraps its own try/except."""
        import time as _time

        results: list[dict[str, Any]] = []
        idle = 0
        while idle < max_idle_polls:
            # replay fires the hook after every commit itself (one
            # directory listing per poll — linear in epoch count)
            got = self.replay(changelog_dir, on_epoch=on_epoch, **kw)
            if got:
                results.extend(got)
                idle = 0
            else:
                idle += 1
                if idle < max_idle_polls:
                    _time.sleep(poll_seconds)
        return results
