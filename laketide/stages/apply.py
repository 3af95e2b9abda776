"""Per-partition last-writer-wins apply — the core "upsert" operator.

This is the Ray-native re-expression of the reference's
``INSERT ... ON CONFLICT (id) DO UPDATE`` apply loop plus its merge rules
(semantics only; cited for parity):

- keyed idempotent upsert: /root/reference/sql/vulnerabilities.sql:66-90,
  caller /root/reference/internal/jobs/server.go:760-832 (S8)
- lookup join against current state (alias cache / DB probe):
  /root/reference/internal/merger/merger.go:74-105 (J1) — here a
  co-partitioned pyarrow hash join events ⟕⟖ snapshot partition
- hash short-circuit (equal data hash => no-op update):
  /root/reference/internal/merger/merger.go:126-137 (R1)
- priority/LWW winner selection:
  /root/reference/internal/merger/merger.go:124-204 (R2/R3) — priority
  replaced by ``(commit, seq)`` version order, so out-of-order delivery
  reconciles to the same final state (commutative reduce, I2)
- delete: /root/reference/sql/vulnerabilities.sql:101-102 (S11) —
  tombstone events drop the row

Everything here is vectorized pyarrow.compute over one partition's Arrow
tables; ordering is partition-local (no global sort — SURVEY.md §7.3).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from laketide import schema as S

__all__ = [
    "reduce_events",
    "apply_partition",
    "ApplyMetrics",
    "limit_arrow_threads",
    "write_dlq",
]


def write_dlq(dlq_dir: str, part: int, rows: "pa.Table") -> None:
    """Quarantine one partition's malformed rows (I6 dead-letter queue):
    deterministic name per (epoch dir, partition) written via
    tmp + os.replace (same discipline as staging files), so Ray task
    retries can never duplicate DLQ rows and a crash mid-write can
    never leave a torn parquet for ``dlq_dataset`` to choke on. The dir
    is created lazily — epochs with no malformed rows leave no trace.
    Routing bookkeeping columns are dropped — what lands in the DLQ is
    the original event row, replayable after repair via
    ``LakeTable.apply_epoch``."""
    import os

    import pyarrow.parquet as pq

    drop = [c for c in (S.PART_COLUMN, S.MALFORMED_COLUMN) if c in rows.column_names]
    if drop:
        rows = rows.drop_columns(drop)
    os.makedirs(dlq_dir, exist_ok=True)
    final = os.path.join(dlq_dir, f"part-{part:05d}.parquet")
    tmp = final + f".tmp-{os.getpid()}"
    pq.write_table(rows, tmp)
    os.replace(tmp, final)

_ARROW_LIMITED = False


def limit_arrow_threads(n: int = 1) -> None:
    """Pin pyarrow's per-process thread pool inside Ray workers.

    Every worker process gets an Arrow pool sized to ALL machine cores by
    default, so K concurrent tasks spawn K x cores threads and the sort /
    join kernels thrash. One Arrow thread per task is right when Ray
    already runs one task per CPU."""
    global _ARROW_LIMITED
    if not _ARROW_LIMITED:
        pa.set_cpu_count(n)
        pa.set_io_thread_count(max(2, n))
        _ARROW_LIMITED = True


def ensure_sha(winners: pa.Table) -> pa.Table:
    """Fill missing ``content_sha256`` on per-key WINNERS (reduce side).

    Normalize no longer hashes every event: only winners' hashes are
    observable (stored state, noop detection R1, delta files), so
    hashing here is ~(events/keys)x cheaper per epoch while producing
    byte-identical state. Shas already present (source-provided, or
    state rows flowing through compaction) are kept; null content
    (tombstones) stays null."""
    if (
        S.SHA_COLUMN not in winners.column_names
        or "content" not in winners.column_names
        or winners.num_rows == 0
    ):
        return winners
    sha = winners[S.SHA_COLUMN]
    if sha.null_count == 0:
        return winners
    from laketide.stages.normalize import sha256_hex_column

    computed = sha256_hex_column(winners["content"])
    return winners.set_column(
        winners.column_names.index(S.SHA_COLUMN),
        S.SHA_COLUMN,
        pc.coalesce(sha, computed),
    )


@dataclass
class ApplyMetrics:
    events_in: int = 0
    dupes_dropped: int = 0
    replays_dropped: int = 0  # dropped by the high-water-mark filter
    malformed: int = 0
    stale_dropped: int = 0  # lost to a newer snapshot version (out-of-order)
    inserts: int = 0
    updates: int = 0
    deletes: int = 0
    noop_deletes: int = 0  # delete for a key that does not exist
    noops: int = 0  # content_sha256 unchanged -> row untouched (R1)
    rows_out: int = 0
    hwm_commit: str = ""
    hwm_seq: int = -1

    def as_dict(self) -> dict:
        return dict(self.__dict__)


def _version_newer(
    commit_a, seq_a, commit_b, seq_b
) -> pa.ChunkedArray:
    """(commit_a, seq_a) > (commit_b, seq_b); zero-padded commits compare
    lexicographically (reference analog: source-priority rank R3)."""
    return pc.or_(
        pc.greater(commit_a, commit_b),
        pc.and_(pc.equal(commit_a, commit_b), pc.greater(seq_a, seq_b)),
    )


# Pluggable merge strategies (reference E4: the engine ships three merge
# rules — priority-coalesce R2, longer-content-wins R6, and field-wise
# union/coalesce R4/R5,
# /root/reference/internal/merger/merger.go:173-204,231-316 and
# /root/reference/internal/merger/normalizer.go:375-428).
#
# "lww": winner = max (commit, seq) — version order, whole row.
# "longest": winner = max (len(content), commit, seq) — R6 analog;
#   tombstones (null content) rank as length -1, so a delete only wins
#   against an empty row history.
# "coalesce": FIELD-WISE merge (R4/R5 analog): per scalar column the
#   newest NON-NULL value wins (primary-wins coalesce,
#   merger.go:231-316); per list column the values union-dedup
#   (array-union merge, merger.go:268-284). A delete tombstone clears
#   accumulated state. Version still advances to the newest (commit,
#   seq). Deterministic under partition-ordered delivery (the HWM
#   guarantee replay/tail provide); under arbitrary cross-epoch
#   reordering a stale row is dropped whole, same caveat class as the
#   reference's priority merge.
# "priority": the reference R2 LITERAL (merger.go:124-228): a fixed
#   per-source rank (SOURCE_RANKS; min over the row's `sources` list,
#   unknown/missing -> 999, getSourcePriority merger.go:206-217)
#   decides field-wise winners REGARDLESS of version/arrival — per
#   scalar column the first non-null value by (rank asc, version desc)
#   wins: rank arbitrates BETWEEN sources (the R2 literal); within a
#   rank the newest value is that source's current truth (the
#   reference replaces same-source rows upstream of its merger);
#   list columns union-dedup (mergeSourceArrays);
#   the version still advances to the newest (commit, seq) so HWM /
#   replay semantics are unchanged. Cross-epoch, the stored row acts
#   as one accumulated event ranked by min(sources) — the reference's
#   pairwise accumulate, which (like the reference) is arrival-
#   dependent only in the corner where a low-rank field value was
#   absorbed into a higher-min-rank merged row before a mid-rank
#   source arrived.
MERGE_STRATEGIES = ("lww", "longest", "coalesce", "priority")

# Reference source ranks (lower = higher priority): OSV=1 > GitLab=2 >
# CVE=3, unknown=999 (merger.go:206-217 + constants). Module-level so
# every reduce/apply site shares one table; override in-process for
# custom source sets.
SOURCE_RANKS: dict[str, int] = {"osv": 1, "gitlab": 2, "cve": 3}
UNKNOWN_SOURCE_RANK = 999
_POS_SHIFT = np.int64(1) << np.int64(40)

# Per-field supplier-rank helper columns (merge='priority' only): the
# within-epoch fold picks each field's winner by (rank asc, version
# desc), but the folded winner row keeps only the UNIONED sources list —
# whose min rank would let a low-rank field value "launder" through a
# bundled high-rank event when merged onto stored state. The fold
# therefore emits `_prio_r_<field>` (the winning supplier's rank, int64,
# UNKNOWN when the field is null) alongside each scalar fold column;
# apply_partition consumes them for the per-field stored-state compare
# and drops them at snapshot conform (never persisted).
PRIO_RANK_PREFIX = S.PRIO_RANK_PREFIX


def _source_ranks(col, n: int) -> np.ndarray:
    """min source rank per row over a `sources` list<string> column
    (getSourcePriority: contains the best-ranked source). Missing
    column / null / empty list -> UNKNOWN_SOURCE_RANK. Vectorized:
    flatten + index_in against the rank table + scatter-min."""
    out = np.full(n, UNKNOWN_SOURCE_RANK, dtype=np.int64)
    if col is None or n == 0:
        return out
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if not (pa.types.is_list(col.type) or pa.types.is_large_list(col.type)):
        return out
    lens = pc.fill_null(pc.list_value_length(col), 0).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    if not lens.sum():
        return out
    parents = np.repeat(np.arange(n, dtype=np.int64), lens)
    keys = pa.array(list(SOURCE_RANKS.keys()), pa.string())
    vals = np.asarray(list(SOURCE_RANKS.values()), dtype=np.int64)
    pos = (
        pc.fill_null(pc.index_in(pc.list_flatten(col), keys), -1)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    r = np.where(pos >= 0, vals[np.clip(pos, 0, len(vals) - 1)], UNKNOWN_SOURCE_RANK)
    np.minimum.at(out, parents, r)
    return out


def _best_field_idx(
    valid: np.ndarray, idx: np.ndarray, starts: np.ndarray, ranks: np.ndarray | None
) -> np.ndarray:
    """Per-group winning row index for one field: the NEWEST valid row
    (ranks=None — coalesce order) or the first valid row by (source
    rank asc, version desc) (merge='priority': rank arbitrates BETWEEN
    sources; within a rank the newest value is that source's current
    truth). Rows arrive version-sorted, so position encodes version
    order. -1 = no valid row."""
    if ranks is None:
        return np.maximum.reduceat(np.where(valid, idx, np.int64(-1)), starts)
    big = np.iinfo(np.int64).max
    n = np.int64(len(idx))
    score = np.where(valid, ranks * _POS_SHIFT + (n - 1 - idx), big)
    best = np.minimum.reduceat(score, starts)
    return np.where(best == big, np.int64(-1), n - 1 - (best % _POS_SHIFT))


def _content_rank(t: pa.Table) -> pa.ChunkedArray:
    if "content" in t.column_names:
        return pc.fill_null(pc.cast(pc.utf8_length(t["content"]), pa.int64()), -1)
    return pa.chunked_array([pa.nulls(t.num_rows, pa.int64())]).combine_chunks()


def reduce_events(
    ev: pa.Table, metrics: ApplyMetrics, strategy: str = "lww"
) -> pa.Table:
    """Within-partition reduce: sort by (repo, path, <strategy rank>,
    commit, seq), collapse exact duplicate replays, keep the last
    (winning) event per key. The "coalesce" strategy instead FOLDS the
    key's events field-wise (newest non-null scalar, list union).

    Partition-local sort only; counts exact-duplicate drops."""
    if ev.num_rows == 0:
        return ev
    if strategy == "coalesce":
        return _reduce_events_coalesce(ev, metrics)
    if strategy == "priority":
        return _reduce_events_coalesce(ev, metrics, priority=True)
    if strategy == "longest":
        ev = ev.append_column("_rank", _content_rank(ev))
        ev = ev.sort_by(
            [
                ("repo", "ascending"),
                ("path", "ascending"),
                ("_rank", "ascending"),
                ("commit", "ascending"),
                ("seq", "ascending"),
            ]
        ).drop_columns(["_rank"])
    else:
        ev = ev.sort_by(
            [("repo", "ascending"), ("path", "ascending"), ("commit", "ascending"), ("seq", "ascending")]
        )
    n = ev.num_rows
    repo = ev["repo"].combine_chunks().to_numpy(zero_copy_only=False)
    path = ev["path"].combine_chunks().to_numpy(zero_copy_only=False)
    commit = ev["commit"].combine_chunks().to_numpy(zero_copy_only=False)
    seq = ev["seq"].combine_chunks().to_numpy(zero_copy_only=False)

    same_key = (repo[1:] == repo[:-1]) & (path[1:] == path[:-1])
    exact_dup = same_key & (commit[1:] == commit[:-1]) & (seq[1:] == seq[:-1])
    metrics.dupes_dropped += int(exact_dup.sum())

    last = np.ones(n, dtype=bool)
    last[:-1] = ~same_key
    return ev.filter(pa.array(last))


def _bool(mask) -> pa.ChunkedArray:
    return pc.fill_null(mask, False)


def _reduce_events_coalesce(
    ev: pa.Table, metrics: ApplyMetrics, priority: bool = False
) -> pa.Table:
    """Field-wise fold per key (merge='coalesce', R4/R5 analog; with
    ``priority=True``, merge='priority', the R2 literal).

    Events sort by (key, commit, seq); exact duplicate replays drop; then
    per key the winner row is CONSTRUCTED: core version columns from the
    newest event, each scalar payload column = newest non-null value
    after the last tombstone (coalesce) or the first non-null by
    (source rank asc, version desc) (priority), each list payload column
    = union-dedup of values after the last tombstone. A key whose
    newest event is a delete keeps that delete row whole (tombstone
    clears state)."""
    ev = ev.sort_by(
        [("repo", "ascending"), ("path", "ascending"), ("commit", "ascending"), ("seq", "ascending")]
    )
    n = ev.num_rows
    repo = ev["repo"].combine_chunks().to_numpy(zero_copy_only=False)
    path = ev["path"].combine_chunks().to_numpy(zero_copy_only=False)
    commit = ev["commit"].combine_chunks().to_numpy(zero_copy_only=False)
    seq = ev["seq"].combine_chunks().to_numpy(zero_copy_only=False)
    same_key = (repo[1:] == repo[:-1]) & (path[1:] == path[:-1])
    exact_dup = same_key & (commit[1:] == commit[:-1]) & (seq[1:] == seq[:-1])
    metrics.dupes_dropped += int(exact_dup.sum())
    if exact_dup.any():
        keep = np.ones(n, dtype=bool)
        keep[1:] = ~exact_dup
        ev = ev.filter(pa.array(keep))
        n = ev.num_rows
        repo = ev["repo"].combine_chunks().to_numpy(zero_copy_only=False)
        path = ev["path"].combine_chunks().to_numpy(zero_copy_only=False)
        same_key = (repo[1:] == repo[:-1]) & (path[1:] == path[:-1])

    starts = np.concatenate([[0], np.flatnonzero(~same_key) + 1]).astype(np.int64)
    ends = np.append(starts[1:], n) - 1  # last row index per group
    n_groups = len(starts)
    group_of = np.repeat(np.arange(n_groups, dtype=np.int64), np.diff(np.append(starts, n)))

    # merge='priority': per-row min source rank orders the field fold;
    # computed AFTER the duplicate filter so positions line up
    ranks = (
        _source_ranks(
            ev["sources"] if "sources" in ev.column_names else None, n
        )
        if priority
        else None
    )
    is_del = _bool(pc.equal(ev[S.OP_COLUMN], "delete")).to_numpy(zero_copy_only=False)
    idx = np.arange(n, dtype=np.int64)
    del_idx = np.where(is_del, idx, np.int64(-1))
    last_del = np.maximum.reduceat(del_idx, starts)  # -1 when no delete
    del_wins = last_del == ends
    # rows eligible for the field fold: strictly after their group's last
    # tombstone (a delete clears accumulated state)
    eligible = idx > last_del[group_of]

    core = {"repo", "path", "commit", "seq", S.OP_COLUMN}
    # content_sha256 is DERIVED from content, not an independent field:
    # folding it separately could pair the newest content with an older
    # event's sha (stale-sha invariant break). Take the sha at content's
    # winning index instead; ensure_sha recomputes any null left behind.
    content_best: pa.Array | None = None
    cbest = None
    if "content" in ev.column_names and S.SHA_COLUMN in ev.column_names:
        ccol = ev["content"].combine_chunks()
        cvalid = pc.is_valid(ccol).to_numpy(zero_copy_only=False) & eligible
        cbest = _best_field_idx(cvalid, idx, starts, ranks)
        content_best = pa.array(
            [int(b) if b >= 0 else None for b in cbest], pa.int64()
        )
    cols = []
    # merge='priority': record each scalar fold field's winning supplier
    # rank so the apply-side stored-state compare stays per-field (a
    # bundled low-rank value must not inherit the union's min rank); sha
    # is paired with content, list unions have no single supplier
    prio_helpers: list[tuple[str, np.ndarray]] = []
    for fld in ev.schema:
        name = fld.name
        col = ev[name].combine_chunks()
        if name in core:
            cols.append(col.take(pa.array(ends)))
            continue
        if pa.types.is_list(fld.type) or pa.types.is_large_list(fld.type):
            cols.append(_union_lists_per_group(col, group_of, eligible, n_groups, fld.type))
            continue
        if name == S.SHA_COLUMN and content_best is not None:
            cols.append(col.take(content_best))
            continue
        if name == "content" and content_best is not None:
            # reuse the winning index computed above (the sha pairing
            # already did this work — content is the widest column, no
            # second reduceat over it)
            cols.append(col.take(content_best))
            if ranks is not None:
                prio_helpers.append(
                    (
                        PRIO_RANK_PREFIX + name,
                        np.where(
                            cbest >= 0,
                            ranks[np.clip(cbest, 0, n - 1)],
                            UNKNOWN_SOURCE_RANK,
                        ),
                    )
                )
            continue
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False) & eligible
        best = _best_field_idx(valid, idx, starts, ranks)
        take_idx = pa.array(
            [int(b) if b >= 0 else None for b in best], pa.int64()
        )
        cols.append(col.take(take_idx))
        if ranks is not None:
            prio_helpers.append(
                (
                    PRIO_RANK_PREFIX + name,
                    np.where(best >= 0, ranks[np.clip(best, 0, n - 1)],
                             np.int64(UNKNOWN_SOURCE_RANK)),
                )
            )
    out = pa.Table.from_arrays(
        [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in cols],
        schema=ev.schema,
    )
    # A mid-epoch tombstone means the winner must REPLACE (not merge
    # with) the pre-epoch row — carry that as the _reset helper column.
    out = out.append_column(S.RESET_COLUMN, pa.array(last_del >= 0))
    for hname, hvals in prio_helpers:
        out = out.append_column(hname, pa.array(hvals, pa.int64()))
    # groups whose newest event is the tombstone keep the raw delete row
    if del_wins.any():
        del_rows = ev.take(pa.array(ends[del_wins])).append_column(
            S.RESET_COLUMN, pa.array(np.ones(int(del_wins.sum()), dtype=bool))
        )
        n_del = int(del_wins.sum())
        for hname, _ in prio_helpers:
            # a tombstone winner replaces state whole; field ranks moot
            del_rows = del_rows.append_column(
                hname, pa.array(np.full(n_del, UNKNOWN_SOURCE_RANK, np.int64))
            )
        keep_mask = pa.array(~del_wins)
        out = pa.concat_tables([out.filter(keep_mask), del_rows]).sort_by(
            [("repo", "ascending"), ("path", "ascending")]
        )
    return out


def _build_list_union(
    out_ids: np.ndarray, values: np.ndarray, n_out: int, value_type
) -> pa.ListArray:
    """Shared union-dedup core: (output-row id, value) pairs -> a
    ListArray of sorted distinct values per output row. The single
    implementation behind both the per-group fold and the row-wise
    merge (fixes apply once)."""
    import pandas as pd

    df = (
        pd.DataFrame({"g": out_ids, "v": values})
        .dropna()
        .drop_duplicates()
        .sort_values(["g", "v"])
    )
    counts = np.zeros(n_out, dtype=np.int64)
    if len(df):
        g_ids, g_counts = np.unique(df["g"].to_numpy(), return_counts=True)
        counts[g_ids] = g_counts
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    flat_out = pa.array(df["v"].tolist(), value_type)
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat_out)


def _union_lists_per_group(
    col: pa.Array, group_of: np.ndarray, eligible: np.ndarray, n_groups: int, typ
) -> pa.Array:
    """Union-dedup a list column per key group (R4 array-union analog):
    flatten once, tag every flat value with its parent's group, unique on
    (group, value) — no per-row Python in the fold. A group whose
    eligible history is ALL NULL stays NULL (DuckDB's ``list(x) FILTER
    (WHERE x IS NOT NULL)`` over an all-null history is NULL, and the
    apply-side replay no-op check relies on null-in null-out); an
    eligible non-null EMPTY list still yields []."""
    lens = pc.fill_null(pc.list_value_length(col), 0).to_numpy(zero_copy_only=False)
    parents = np.repeat(np.arange(len(col), dtype=np.int64), lens)
    flat = pc.list_flatten(col)
    # drop null ELEMENTS in Arrow, before numpy: to_numpy on an int64
    # array with nulls silently converts to float64 (values above 2^53
    # corrupt); the union's dropna used to rely on that NaN
    sel = np.flatnonzero(
        eligible[parents] & pc.is_valid(flat).to_numpy(zero_copy_only=False)
    )
    values = flat.take(pa.array(sel, pa.int64())).to_numpy(zero_copy_only=False)
    u = _build_list_union(
        group_of[parents[sel]], values, n_groups, typ.value_type
    )
    valid_rows = pc.is_valid(col).to_numpy(zero_copy_only=False) & eligible
    group_has = np.zeros(n_groups, dtype=bool)
    group_has[group_of[valid_rows]] = True
    if bool(group_has.all()):
        return u
    idx = pa.array(np.arange(n_groups, dtype=np.int64), mask=~group_has)
    return u.take(idx)


def _row_union(a, b):
    """Row-wise list union-dedup of two equal-length list columns (R4):
    flatten both with parent row ids, then the shared union core. Rows
    where BOTH sides are null stay NULL (no information is not an empty
    set — the DuckDB fold oracle's list() over an all-null history is
    NULL, and a both-null merge must not flip a stored NULL to [] on a
    pure replay)."""
    a = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
    b = b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b
    m = len(a)
    typ = a.type if pa.types.is_list(a.type) or pa.types.is_large_list(a.type) else b.type
    rows = []
    vals = []
    any_valid = np.zeros(m, dtype=bool)
    for col in (a, b):
        if not (pa.types.is_list(col.type) or pa.types.is_large_list(col.type)):
            continue
        any_valid |= pc.is_valid(col).to_numpy(zero_copy_only=False)
        counts = pc.fill_null(pc.list_value_length(col), 0).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        par = np.repeat(np.arange(m, dtype=np.int64), counts)
        flat = pc.list_flatten(col)
        # Arrow-side null-element drop (same rationale as
        # _union_lists_per_group: int64-with-nulls -> float64 in numpy)
        sel = np.flatnonzero(pc.is_valid(flat).to_numpy(zero_copy_only=False))
        rows.append(par[sel])
        vals.append(
            flat.take(pa.array(sel, pa.int64())).to_numpy(zero_copy_only=False)
        )
    u = _build_list_union(
        np.concatenate(rows), np.concatenate(vals), m, typ.value_type
    )
    if bool(any_valid.all()):
        return u
    # null out the no-information rows (take with null indices)
    idx = pa.array(np.arange(m, dtype=np.int64), mask=~any_valid)
    return u.take(idx)


def _select_rows(u, ev_col, cur_col, use_union, use_ev):
    """Row selector for list columns (pc.if_else does not support lists):
    result[i] = u[i] if use_union[i] else ev[i] if use_ev[i] else cur[i],
    via one concat + take."""
    m = len(u)

    def _plain(col):
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            return col
        return pa.ListArray.from_arrays(
            pa.array(np.zeros(m + 1, dtype=np.int32), pa.int32()),
            pa.array([], u.type.value_type),
        )

    ev_l, cur_l = _plain(ev_col), _plain(cur_col)
    sel = np.where(
        pc.fill_null(use_union, False).to_numpy(zero_copy_only=False),
        0,
        np.where(pc.fill_null(use_ev, False).to_numpy(zero_copy_only=False), 1, 2),
    ).astype(np.int64)
    combined = pa.concat_arrays(
        [u.cast(u.type), ev_l.cast(u.type), cur_l.cast(u.type)]
    )
    idx = sel * m + np.arange(m, dtype=np.int64)
    return combined.take(pa.array(idx))


def apply_partition(
    cur: pa.Table | None,
    winners: pa.Table,
    epoch_id: int,
    metrics: ApplyMetrics,
    strategy: str = "lww",
) -> pa.Table:
    """Merge per-key winning events onto the current snapshot partition.

    Returns the new partition table (sorted by key, deterministic).
    ``winners`` must have unique (repo, path) keys (from ``reduce_events``).
    """
    ev_payload = S.payload_columns_of(winners.schema)
    cur_payload = S.payload_columns_of(cur.schema) if cur is not None else {}
    payload = dict(cur_payload)
    payload.update({k: t for k, t in ev_payload.items() if k not in payload})
    snap_schema = S.snapshot_schema(payload)

    if cur is None or cur.num_rows == 0:
        is_del = _bool(pc.equal(winners[S.OP_COLUMN], "delete"))
        metrics.noop_deletes += int(pc.sum(is_del).as_py() or 0)
        metrics.inserts += winners.num_rows - int(pc.sum(is_del).as_py() or 0)
        # Tombstones for never-seen keys are RETAINED as deleted rows:
        # a late-arriving OLDER insert must lose to them (global LWW
        # under arbitrary cross-epoch reordering).
        kept = winners.append_column(
            S.APPLIED_EPOCH_COLUMN, pa.array([epoch_id] * winners.num_rows, pa.int64())
        )
        kept = kept.append_column(S.DELETED_COLUMN, is_del)
        out = S.conform(kept, snap_schema)
        return out.sort_by([("repo", "ascending"), ("path", "ascending")])

    cur = S.conform(cur, snap_schema)
    # Event side: conform to snapshot payload + op (schema evolution:
    # missing payload columns become nulls; new ones were added above).
    ev_schema = pa.schema(
        [pa.field(c, S.CORE_TYPES[c]) for c in S.CORE_COLUMNS]
        + [pa.field(c, t) for c, t in payload.items()]
        + [pa.field(S.SHA_COLUMN, pa.string())]
    )
    if S.RESET_COLUMN in winners.column_names:
        ev_schema = ev_schema.append(pa.field(S.RESET_COLUMN, pa.bool_()))
    # per-field supplier ranks from the priority fold ride into the join
    # (dropped at snapshot conform below — never persisted)
    prio_rank_cols = [
        c for c in winners.column_names if c.startswith(PRIO_RANK_PREFIX)
    ]
    for c in prio_rank_cols:
        ev_schema = ev_schema.append(pa.field(c, pa.int64()))
    ev = S.conform(winners, ev_schema)

    # Arrow's hash join cannot carry list-typed payload columns — detach
    # them, join the scalar parts with row-id surrogates, re-attach by
    # take (null surrogate -> null row).
    list_cols = [
        f.name
        for f in snap_schema
        if (pa.types.is_list(f.type) or pa.types.is_large_list(f.type))
        and f.name in ev.column_names
    ]
    if list_cols:
        ev_j = ev.drop_columns(list_cols).append_column(
            "_ev_rid", pa.array(np.arange(ev.num_rows, dtype=np.int64))
        )
        cur_j = cur.drop_columns([c for c in list_cols if c in cur.column_names]).append_column(
            "_cur_rid", pa.array(np.arange(cur.num_rows, dtype=np.int64))
        )
        j = ev_j.join(
            cur_j,
            keys=list(S.KEY_COLUMNS),
            join_type="full outer",
            right_suffix="_cur",
        )
        for c in list_cols:
            j = j.append_column(c, ev[c].combine_chunks().take(j["_ev_rid"].combine_chunks()))
            if c in cur.column_names:
                j = j.append_column(
                    c + "_cur", cur[c].combine_chunks().take(j["_cur_rid"].combine_chunks())
                )
        j = j.drop_columns(["_ev_rid", "_cur_rid"])
    else:
        j = ev.join(
            cur,
            keys=list(S.KEY_COLUMNS),
            join_type="full outer",
            right_suffix="_cur",
        )

    has_ev = pc.is_valid(j[S.OP_COLUMN])
    has_cur = pc.is_valid(j[S.APPLIED_EPOCH_COLUMN])
    # Null-safe version compare: a missing side sorts below every real
    # version ("" < "c..." lexicographically, -1 < any seq). pc.and_/or_
    # propagate nulls (they are not Kleene), so never feed them nulls.
    ev_c = pc.coalesce(j["commit"], pa.scalar("", pa.string()))
    ev_s = pc.coalesce(j["seq"], pa.scalar(-1, pa.int64()))
    cur_c = pc.coalesce(j["commit_cur"], pa.scalar("", pa.string()))
    cur_s = pc.coalesce(j["seq_cur"], pa.scalar(-1, pa.int64()))
    version_newer = _version_newer(ev_c, ev_s, cur_c, cur_s)
    if strategy == "longest" and "content" in winners.column_names:
        # R6 analog: longer content wins; ties broken by version order.
        # Missing cur ranks -2 so any event (rank >= -1) beats it.
        r_ev = pc.coalesce(
            pc.cast(pc.utf8_length(j["content"]), pa.int64()), pa.scalar(-1, pa.int64())
        )
        r_ev = pc.if_else(has_ev, r_ev, pa.scalar(-1, pa.int64()))
        r_cur = pc.if_else(
            has_cur,
            pc.coalesce(
                pc.cast(pc.utf8_length(j["content_cur"]), pa.int64()),
                pa.scalar(-1, pa.int64()),
            ),
            pa.scalar(-2, pa.int64()),
        )
        newer = _bool(
            pc.and_(
                has_ev,
                pc.or_(
                    pc.greater(r_ev, r_cur),
                    pc.and_(pc.equal(r_ev, r_cur), version_newer),
                ),
            )
        )
    else:
        newer = _bool(pc.and_(has_ev, version_newer))
    is_del = _bool(pc.equal(j[S.OP_COLUMN], "delete"))
    same_sha = _bool(pc.equal(j[S.SHA_COLUMN], j[S.SHA_COLUMN + "_cur"]))

    cur_deleted = _bool(j.column(S.DELETED_COLUMN + "_cur") if S.DELETED_COLUMN + "_cur" in j.column_names else j[S.DELETED_COLUMN])
    cur_live = pc.and_(has_cur, pc.invert(cur_deleted))

    applied_del = pc.and_(pc.and_(newer, is_del), cur_live)
    noop_del = pc.and_(pc.and_(newer, is_del), pc.invert(cur_live))
    noop_upd = pc.and_(pc.and_(pc.and_(newer, pc.invert(is_del)), cur_live), same_sha)
    # A content-identical update still ADVANCES the version (commit/seq):
    # without that, a late event between the old and new versions would
    # wrongly win a future LWW compare. Only applied_epoch is preserved
    # ("when did content last actually change" — the R1 observable).
    take_ev = newer
    stale = pc.and_(has_ev, pc.invert(newer))

    # Field-merge only live-onto-live: a winner whose epoch history had a
    # tombstone (_reset), or a stored row that is itself a tombstone,
    # REPLACES instead of coalescing.
    reset = (
        _bool(j[S.RESET_COLUMN])
        if S.RESET_COLUMN in j.column_names
        else pa.chunked_array([pa.nulls(j.num_rows, pa.bool_())]).combine_chunks()
    )
    reset = _bool(reset)
    ev_primary = None
    prio_field_primary: dict[str, pa.Array] = {}
    if strategy == "priority":
        # Which side is the field-wise base (merger.go:144-162): the
        # lower source rank; on equal ranks the version-newer side
        # (within a rank the newest value is that source's current
        # truth — and this makes re-merging a replayed older event a
        # strict no-op, the idempotency the skipped HWM row filter
        # relies on). The EVENT side's rank is PER FIELD (the fold's
        # _prio_r_<field> helper = the rank of the source that supplied
        # that field's value): without it, a low-rank value bundled in
        # the same epoch as a high-rank event would inherit the union's
        # min rank and overwrite a mid-rank stored value. The stored
        # side keeps row granularity (min over its sources union) — the
        # documented accumulate approximation.
        n_j = j.num_rows
        ev_r = _source_ranks(
            j["sources"] if "sources" in j.column_names else None, n_j
        )
        cur_r = _source_ranks(
            j["sources_cur"] if "sources_cur" in j.column_names else None, n_j
        )
        vn = _bool(version_newer).to_numpy(zero_copy_only=False)

        def _primary(er: np.ndarray) -> pa.Array:
            return pa.array((er < cur_r) | ((er == cur_r) & vn))

        ev_primary = _primary(ev_r)
        for c in prio_rank_cols:
            er = (
                pc.fill_null(j[c], UNKNOWN_SOURCE_RANK)
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            prio_field_primary[c[len(PRIO_RANK_PREFIX):]] = _primary(er)
        # the derived sha must follow content's winner, not its own rank
        if "content" in prio_field_primary:
            prio_field_primary[S.SHA_COLUMN] = prio_field_primary["content"]
        # priority merges REGARDLESS of version order — an older event
        # from a higher-ranked source must still win its fields
        # ("priority, not arrival, wins"); deletes and the version
        # advance stay version-ordered.
        merge_upd = pc.and_(
            pc.and_(has_ev, pc.invert(is_del)), pc.and_(cur_live, pc.invert(reset))
        )
        stale = pc.and_(stale, pc.invert(merge_upd))
    else:
        merge_upd = pc.and_(
            pc.and_(take_ev, pc.invert(is_del)), pc.and_(cur_live, pc.invert(reset))
        )

    metrics.inserts += int(
        pc.sum(pc.and_(pc.and_(take_ev, pc.invert(is_del)), pc.invert(cur_live))).as_py() or 0
    )
    # same-sha version advances count as noops ONLY (not also updates) —
    # keeps cow lineage identical to the mor path's classification
    metrics.updates += int(
        pc.sum(
            pc.and_(pc.and_(take_ev, pc.invert(is_del)), pc.and_(cur_live, pc.invert(same_sha)))
        ).as_py()
        or 0
    )
    metrics.deletes += int(pc.sum(applied_del).as_py() or 0)
    metrics.noop_deletes += int(pc.sum(noop_del).as_py() or 0)
    metrics.noops += int(pc.sum(noop_upd).as_py() or 0)
    metrics.stale_dropped += int(pc.sum(stale).as_py() or 0)

    new_deleted = pc.if_else(take_ev, is_del, cur_deleted)
    fieldwise = strategy in ("coalesce", "priority")
    # priority change tracking: a version-older event that merges must
    # count as an update (and advance applied_epoch) ONLY when it
    # actually altered a stored field — that keeps replayed epochs
    # byte-stable (no file rewrite) without the HWM row filter.
    prio_changed = (
        np.zeros(j.num_rows, dtype=bool) if ev_primary is not None else None
    )
    cols = []
    for fld in snap_schema:
        name = fld.name
        is_payload = name in payload or name == S.SHA_COLUMN
        if name in S.KEY_COLUMNS:
            col = j[name]  # coalesced join keys
        elif name == S.APPLIED_EPOCH_COLUMN:
            col = pc.if_else(
                pc.and_(take_ev, pc.invert(noop_upd)),
                pa.scalar(epoch_id, pa.int64()),
                j[S.APPLIED_EPOCH_COLUMN],
            )
        elif name == S.DELETED_COLUMN:
            col = new_deleted
        elif fieldwise and is_payload and (
            pa.types.is_list(fld.type) or pa.types.is_large_list(fld.type)
        ):
            # R4 array-union: winner row unions its list with the
            # current row's; a tombstone takes the event's (null) value
            u = _row_union(j[name], j[name + "_cur"])
            col = _select_rows(u, j[name], j[name + "_cur"], merge_upd, take_ev)
            if prio_changed is not None:
                # the union only grows over the stored SET, so a length
                # mismatch is exactly "this merge changed the list"
                # (stored null counts as length -1; stored dup-carrying
                # lists shrink once, then stabilize)
                cur_l = j[name + "_cur"].combine_chunks()
                if pa.types.is_list(cur_l.type) or pa.types.is_large_list(cur_l.type):
                    clen = pc.fill_null(
                        pc.cast(pc.list_value_length(cur_l), pa.int64()), -1
                    ).to_numpy(zero_copy_only=False)
                else:
                    clen = np.full(j.num_rows, -1, dtype=np.int64)
                # u is NULL where both sides were null -> -1 == stored
                # null's -1, so a both-null replay row is NOT a change
                ulen = pc.fill_null(
                    pc.cast(pc.list_value_length(u), pa.int64()), -1
                ).to_numpy(zero_copy_only=False)
                prio_changed |= ulen != clen
        elif fieldwise and is_payload:
            if ev_primary is not None:
                # R2 priority: the higher-ranked side's non-null value
                # wins, regardless of which side is version-newer —
                # priority, not arrival, decides the field. Per-field
                # supplier rank when the fold recorded one; the row-level
                # min rank only as fallback (raw winners from callers
                # that bypassed the fold).
                merged = pc.if_else(
                    prio_field_primary.get(name, ev_primary),
                    pc.coalesce(j[name], j[name + "_cur"]),
                    pc.coalesce(j[name + "_cur"], j[name]),
                )
                cur_col = j[name + "_cur"]
                diff = pc.and_(
                    pc.is_valid(merged),
                    pc.fill_null(
                        pc.or_kleene(
                            pc.is_null(cur_col), pc.not_equal(merged, cur_col)
                        ),
                        True,
                    ),
                )
                prio_changed |= pc.fill_null(diff, False).to_numpy(
                    zero_copy_only=False
                )
            else:
                # R5 primary-wins coalesce: newest non-null field value
                merged = pc.coalesce(j[name], j[name + "_cur"])
            col = pc.if_else(
                merge_upd,
                merged,
                pc.if_else(take_ev, j[name], j[name + "_cur"]),
            )
        else:
            col = pc.if_else(take_ev, j[name], j[name + "_cur"])
        if col.type != fld.type:
            col = col.cast(fld.type)
        cols.append(col)
    out = pa.Table.from_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in cols], schema=snap_schema)
    if prio_changed is not None:
        # version-older events that actually changed a field: count as
        # updates and stamp applied_epoch (the CDF observable) — a pure
        # replay flips nothing, so the epoch stays unchanged on disk
        extra = (
            pc.fill_null(pc.and_(merge_upd, pc.invert(take_ev)), False)
            .to_numpy(zero_copy_only=False)
            & prio_changed
        )
        n_extra = int(extra.sum())
        if n_extra:
            metrics.updates += n_extra
            ae = out.column_names.index(S.APPLIED_EPOCH_COLUMN)
            out = out.set_column(
                ae,
                S.APPLIED_EPOCH_COLUMN,
                pc.if_else(
                    pa.array(extra),
                    pa.scalar(epoch_id, pa.int64()),
                    out[S.APPLIED_EPOCH_COLUMN],
                ),
            )
    return out.sort_by([("repo", "ascending"), ("path", "ascending")])


def merge_partition(
    base: pa.Table | None,
    deltas: list[pa.Table],
    strategy: str = "lww",
    keep_tombstones: bool = False,
) -> pa.Table:
    """Read-side merge for merge-on-read partitions: fold base + delta
    files into the materialized rows (winner per key, tombstones dropped).

    Base rows have no ``op`` column (they are materialized state); delta
    rows carry ``op`` (tombstones included). The fold is the same
    commutative reduce as the write path, so merge-on-read and
    copy-on-write layouts are observationally identical."""
    tables = []
    if base is not None and base.num_rows:
        b = base
        if S.OP_COLUMN not in b.column_names:
            # base tombstone rows (deleted=True) re-enter the fold as
            # delete versions so they keep shadowing older events
            if S.DELETED_COLUMN in b.column_names:
                was_del = pc.fill_null(b[S.DELETED_COLUMN], False)
                ops = pc.if_else(was_del, pa.scalar("delete"), pa.scalar("insert"))
                b = b.append_column(S.OP_COLUMN, ops.combine_chunks())
            else:
                b = b.append_column(
                    S.OP_COLUMN, pa.array(["insert"] * b.num_rows, pa.string())
                )
        tables.append(b)
    for d in deltas:
        if d.num_rows:
            tables.append(d)
    if not tables:
        return S.snapshot_schema().empty_table()
    schema = tables[0].schema
    for t in tables[1:]:
        schema = S.unify(schema, t.schema)
    tables = [S.conform(t, schema) for t in tables]
    merged = pa.concat_tables(tables)
    m = ApplyMetrics()
    winners = reduce_events(merged, m, strategy)
    is_del = pc.fill_null(pc.equal(winners[S.OP_COLUMN], "delete"), False)
    if keep_tombstones:
        out = winners.drop_columns([S.OP_COLUMN])
        if S.DELETED_COLUMN in out.column_names:
            out = out.set_column(
                out.column_names.index(S.DELETED_COLUMN), S.DELETED_COLUMN,
                is_del if isinstance(is_del, pa.ChunkedArray) else pa.chunked_array([is_del]),
            )
        else:
            out = out.append_column(S.DELETED_COLUMN, is_del)
    else:
        out = winners.filter(pc.invert(is_del)).drop_columns([S.OP_COLUMN])
        if S.DELETED_COLUMN in out.column_names:
            out = out.drop_columns([S.DELETED_COLUMN])
    return out.sort_by([("repo", "ascending"), ("path", "ascending")])
