"""End-to-end CDC engine tests, mirroring the reference's test strategy
(SURVEY.md §5 / FIXTURES.md §5):

1. final-state equality vs a DuckDB window-function oracle (sha256 per row)
2. idempotent replay (same epoch id -> no-op; replay as new epoch -> HWM
   drops everything, state byte-identical)
3. out-of-order delivery reconciles to the same final state
4. tombstone deletes
5. additive schema evolution (lang appears mid-stream)
6. crash-resume (die after staging, before manifest swap)
7. determinism invariants (same content -> same sha; distinct -> distinct)
8. malformed-record tolerance (bad rows counted + dropped, epoch commits)
"""

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from laketide.pipelines.cdc import LakeTable
from laketide.sources.changelog import expected_state, generate_changelog
from laketide.stages.normalize import sha256_hex_column


def _keymap(tbl: pa.Table) -> dict:
    m = {}
    for i in range(tbl.num_rows):
        ct = tbl["content"][i].as_py()
        sha = hashlib.sha256(ct.encode()).hexdigest() if ct is not None else None
        m[(tbl["repo"][i].as_py(), tbl["path"][i].as_py())] = (
            tbl["commit"][i].as_py(),
            sha,
        )
    return m


def _replay_all(table_dir, files, **kw) -> LakeTable:
    t = LakeTable(table_dir, num_partitions=8)
    for f in files:
        t.apply_epoch(f, **kw)
    return t


def test_final_state_matches_oracle(changelog, tmp_table):
    t = _replay_all(tmp_table, changelog)
    state = t.state_table()
    exp = expected_state(changelog)
    assert state.num_rows == exp.num_rows
    assert _keymap(state) == _keymap(exp)
    # per-row invariant: stored content_sha256 == sha256(content)
    for i in range(state.num_rows):
        assert (
            state["content_sha256"][i].as_py()
            == hashlib.sha256(state["content"][i].as_py().encode()).hexdigest()
        )


def test_idempotent_reapply_same_epoch(changelog, tmp_table):
    t = _replay_all(tmp_table, changelog)
    before = _keymap(t.state_table())
    epoch = t.current_epoch()
    r = t.apply_epoch(changelog[-1], epoch_id=epoch)
    assert r["already_applied"] is True
    assert t.current_epoch() == epoch
    assert _keymap(t.state_table()) == before


def test_replay_as_new_epoch_is_noop_via_hwm(changelog, tmp_table):
    t = _replay_all(tmp_table, changelog)
    before = _keymap(t.state_table())
    man_before = t.current_manifest()
    r = t.apply_epoch(changelog[-1])  # re-deliver the whole last epoch
    assert r["totals"]["replays_dropped"] > 0
    assert r["totals"]["inserts"] + r["totals"]["updates"] + r["totals"]["deletes"] == 0
    assert _keymap(t.state_table()) == before
    # no partition files were rewritten
    man_after = t.current_manifest()
    assert {k: v["file"] for k, v in man_before.partitions.items() if "file" in v} == {
        k: v["file"] for k, v in man_after.partitions.items() if "file" in v
    }


def test_out_of_order_reconciles_to_same_state(tmp_path):
    # Same events, two different in-epoch orders -> identical final state.
    d1 = str(tmp_path / "log1")
    d2 = str(tmp_path / "log2")
    f1 = generate_changelog(d1, n_events=1500, n_epochs=2, seed=11, shuffle_frac=0.0)
    f2_dir = str(tmp_path / "log2s")
    # rewrite each epoch reversed
    os.makedirs(f2_dir, exist_ok=True)
    f2 = []
    for f in f1:
        tbl = pq.read_table(f)
        rev = tbl.take(pa.array(range(tbl.num_rows - 1, -1, -1)))
        out = os.path.join(f2_dir, os.path.basename(f))
        pq.write_table(rev, out)
        f2.append(out)
    t1 = _replay_all(str(tmp_path / "t1"), f1)
    t2 = _replay_all(str(tmp_path / "t2"), f2)
    assert _keymap(t1.state_table()) == _keymap(t2.state_table())


def test_tombstones_drop_rows(tmp_path):
    ev = pa.table(
        {
            "repo": ["r", "r", "r"],
            "path": ["a", "b", "a"],
            "commit": ["c0000000001", "c0000000002", "c0000000003"],
            "seq": pa.array([1, 2, 3], pa.int64()),
            "op": ["insert", "insert", "delete"],
            "content": ["x", "y", None],
        }
    )
    f = str(tmp_path / "e0.parquet")
    pq.write_table(ev, f)
    t = LakeTable(str(tmp_path / "t"), num_partitions=4)
    r = t.apply_epoch(f)
    state = t.state_table()
    assert state.num_rows == 1
    assert state["path"][0].as_py() == "b"
    assert r["totals"]["deletes"] + r["totals"]["noop_deletes"] == 1


def test_schema_evolution_lang_added_mid_stream(changelog, tmp_table):
    # epoch-000 has no lang column; epoch-001+ do (generator default).
    first = pq.read_schema(changelog[0])
    assert "lang" not in first.names
    later = pq.read_schema(changelog[1])
    assert "lang" in later.names
    t = _replay_all(tmp_table, changelog)
    state = t.state_table()
    assert "lang" in state.schema.names
    # rows only ever touched by epoch 0 keep null lang
    langs = state["lang"].to_pylist()
    epochs = state["applied_epoch"].to_pylist()
    for lang, ep in zip(langs, epochs):
        if ep == 1:
            assert lang is None
        else:
            assert lang is not None


def test_noop_update_leaves_row_untouched(tmp_path):
    e1 = pa.table(
        {
            "repo": ["r"],
            "path": ["a"],
            "commit": ["c0000000001"],
            "seq": pa.array([1], pa.int64()),
            "op": ["insert"],
            "content": ["same-content"],
        }
    )
    e2 = pa.table(
        {
            "repo": ["r"],
            "path": ["a"],
            "commit": ["c0000000002"],
            "seq": pa.array([2], pa.int64()),
            "op": ["update"],
            "content": ["same-content"],  # identical content => no-op (R1)
        }
    )
    f1, f2 = str(tmp_path / "e1.parquet"), str(tmp_path / "e2.parquet")
    pq.write_table(e1, f1)
    pq.write_table(e2, f2)
    t = LakeTable(str(tmp_path / "t"), num_partitions=2)
    t.apply_epoch(f1)
    r = t.apply_epoch(f2)
    assert r["totals"]["noops"] == 1
    state = t.state_table()
    # content unchanged => applied_epoch (content-change marker) stays,
    # but the VERSION still advances so later out-of-order events can
    # never mis-win an LWW compare against a stale version.
    assert state["applied_epoch"][0].as_py() == 1
    assert state["commit"][0].as_py() == "c0000000002"
    assert state["content"][0].as_py() == "same-content"


def test_crash_between_staging_and_commit_resumes(changelog, tmp_table):
    t = LakeTable(tmp_table, num_partitions=8)
    t.apply_epoch(changelog[0])

    class Boom(RuntimeError):
        pass

    t._pre_commit_hook = lambda epoch: (_ for _ in ()).throw(Boom())
    with pytest.raises(Boom):
        t.apply_epoch(changelog[1])
    # crashed: still at epoch 1
    assert t.current_epoch() == 1

    # fresh process analog: new LakeTable object, retry the epoch
    t2 = LakeTable(tmp_table)
    r = t2.apply_epoch(changelog[1])
    assert r["epoch"] == 2
    t3_dir = tmp_table + "_clean"
    t3 = _replay_all(t3_dir, changelog[:2])
    assert _keymap(t2.state_table()) == _keymap(t3.state_table())


def test_malformed_rows_counted_and_dropped(tmp_path):
    ev = pa.table(
        {
            "repo": ["r", None, "r"],
            "path": ["a", "b", "c"],
            "commit": ["c0000000001", "c0000000002", None],
            "seq": pa.array([1, 2, 3], pa.int64()),
            "op": ["insert", "insert", "badop"],
            "content": ["x", "y", "z"],
        }
    )
    f = str(tmp_path / "e.parquet")
    pq.write_table(ev, f)
    t = LakeTable(str(tmp_path / "t"), num_partitions=2)
    r = t.apply_epoch(f)
    assert r["totals"]["malformed"] == 2
    assert t.state_table().num_rows == 1  # epoch still commits (I6)


def test_sha256_determinism_and_uniqueness():
    col = pa.array(["alpha", "alpha", "beta", None])
    h = sha256_hex_column(col).to_pylist()
    assert h[0] == h[1] == hashlib.sha256(b"alpha").hexdigest()
    assert h[2] != h[0]
    assert h[3] is None


def test_lineage_metrics_written(changelog, tmp_table):
    t = _replay_all(tmp_table, changelog)
    from laketide.state.manifest import load_lineage

    for epoch in (1, 2, 3):
        lin = load_lineage(tmp_table, epoch)
        assert lin is not None and lin["epoch"] == epoch
        parts = lin["partitions"]
        assert len(parts) >= 1
        assert all("events_in" in p and "hwm_commit" in p for p in parts)


def test_storage_exchange_matches_groupby_and_oracle(changelog, tmp_path):
    """The storage-backed exchange (spill files + partition-pruned reads)
    must produce the exact same committed state as the groupby path."""
    t1 = LakeTable(str(tmp_path / "a"), num_partitions=8)
    t2 = LakeTable(str(tmp_path / "b"), num_partitions=8)
    for f in changelog:
        t1.apply_epoch(f, exchange="storage")
        t2.apply_epoch(f, exchange="groupby")
    exp = expected_state(changelog)
    assert _keymap(t1.state_table()) == _keymap(exp)
    assert _keymap(t1.state_table()) == _keymap(t2.state_table())


def test_map_combiner_lineage_parity_with_groupby(changelog, tmp_path):
    """The map-side combiner (pre-spill per-key collapse on the storage
    exchange) must leave every lineage counter byte-identical to the
    combiner-less groupby path — events_in, dupes_dropped,
    replays_dropped, malformed, inserts/updates/deletes/noops and the
    HWMs all reconcile through the spilled partials. Includes the
    partial-only-partition path: a full re-apply of an already-committed
    epoch file (every event a replay) must still produce per-partition
    lineage rows with the same totals on both paths."""
    from laketide.state.manifest import load_lineage

    t1 = LakeTable(str(tmp_path / "a"), num_partitions=8)
    t2 = LakeTable(str(tmp_path / "b"), num_partitions=8)
    for f in changelog:
        t1.apply_epoch(f, exchange="storage")
        t2.apply_epoch(f, exchange="groupby")
    # re-apply epoch 1's file as a NEW epoch: all events are replays,
    # so on the storage path every partition is partials-only
    r1 = t1.apply_epoch(changelog[0], exchange="storage")
    r2 = t2.apply_epoch(changelog[0], exchange="groupby")
    assert r1["totals"] == r2["totals"]
    assert r1["totals"]["replays_dropped"] > 0
    assert _keymap(t1.state_table()) == _keymap(t2.state_table())
    for epoch in range(1, 5):
        l1, l2 = load_lineage(str(tmp_path / "a"), epoch), load_lineage(
            str(tmp_path / "b"), epoch
        )
        assert l1["totals"] == l2["totals"], f"epoch {epoch}"
        p1 = {p["part"]: p for p in l1["partitions"]}
        p2 = {p["part"]: p for p in l2["partitions"]}
        assert p1 == p2, f"epoch {epoch} per-partition lineage diverged"


def test_spill_partition_index_skips_unrelated_files(tmp_path, monkeypatch):
    """The map side returns a batch->partition index with each spill
    summary; the reduce side must (a) read identical rows to the
    index-less full scan and (b) never even OPEN a file that lacks its
    partition (P x F -> F opens per epoch)."""
    import pyarrow as pa

    from laketide import schema as S2
    from laketide.pipelines import cdc as C

    def batch(parts, tag):
        order = sorted(range(len(parts)), key=lambda i: parts[i])
        return pa.table(
            {
                "k": pa.array([f"{tag}{i}" for i in order], pa.string()),
                S2.PART_COLUMN: pa.array([parts[i] for i in order], pa.int64()),
            }
        )

    ex = str(tmp_path / "ex")
    spill = C._SpillShards(ex)
    s1 = spill(batch([0, 0, 1, 2], "a"))  # parts {0,1,2}
    s2 = spill(batch([3, 3, 4], "b"))  # parts {3,4} — no part 1
    index = [
        (r["file"], tuple(r["parts"])) for r in s1.to_pylist() + s2.to_pylist()
    ]
    legacy = [(f, None) for f, _ in index]

    opens = []
    real_open = C._open_spill
    monkeypatch.setattr(
        C, "_open_spill", lambda f: opens.append(f) or real_open(f)
    )
    got = C._read_partition_rows(index, 1)
    assert opens == [index[0][0]]  # only the file that has part 1
    opens.clear()
    ref = C._read_partition_rows(legacy, 1)
    assert len(opens) == 2  # the index-less scan opened every file
    assert pa.concat_tables(got).equals(pa.concat_tables(ref))
    # a partition nobody has: zero opens, zero rows
    opens.clear()
    assert C._read_partition_rows(index, 9) == []
    assert opens == []


def test_spill_index_matches_written_batches(tmp_path):
    """The batch->partition index must stay exact even for >1M-row
    partition slices (the rescale path spills whole merged partitions
    with no batch cap). With the parquet spill this was a real
    regression — ParquetWriter.write_table silently splits past
    max_row_group_size and a boundary-derived index misattributed every
    later group; the IPC writer never splits a write, and this pins
    that invariant (index length == record batches in the file)."""
    import numpy as np
    import pyarrow as pa

    from laketide import schema as S2
    from laketide.pipelines import cdc as C

    big, small = 1_200_000, 10
    t = pa.table(
        {
            "k": pa.array(np.arange(big + small, dtype=np.int64)),
            S2.PART_COLUMN: pa.array(
                np.concatenate(
                    [np.zeros(big, np.int64), np.ones(small, np.int64)]
                )
            ),
        }
    )
    summary = C._SpillShards(str(tmp_path / "ex"))(t).to_pylist()[0]
    reader = C._open_spill(summary["file"])
    assert len(summary["parts"]) == reader.num_record_batches == 2
    got0 = C._read_partition_rows([(summary["file"], tuple(summary["parts"]))], 0)
    got1 = C._read_partition_rows([(summary["file"], tuple(summary["parts"]))], 1)
    assert sum(x.num_rows for x in got0) == big
    assert sum(x.num_rows for x in got1) == small
    assert pa.concat_tables(got1)["k"].to_pylist() == list(range(big, big + small))


def test_read_projection_pushdown(tmp_path):
    """read(columns=...) prunes the scan: only the requested columns (+
    the tombstone flag) leave the parquet files, exact values across
    schema-evolved partitions (files predating `lang` yield nulls), and
    unknown columns raise."""
    # lang appears mid-stream -> some partition files lack the column
    src = generate_changelog(
        str(tmp_path / "log"), n_events=1600, n_epochs=2, seed=41, lang_from_epoch=1
    )
    t = LakeTable(str(tmp_path / "t"), num_partitions=4)
    t.apply_epoch(src[0])
    full0 = t.state_table()
    assert "lang" not in full0.column_names
    t.apply_epoch(src[1])

    proj = t.read(columns=["repo", "path", "lang"]).to_pandas()
    assert sorted(proj.columns) == ["lang", "path", "repo"]
    full = t.state_table().to_pandas()
    want = full[["repo", "path", "lang"]]
    a = proj.sort_values(["repo", "path"]).reset_index(drop=True)
    b = want.sort_values(["repo", "path"]).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    with pytest.raises(KeyError, match="unknown columns"):
        t.read(columns=["nope"])
    # MOR path projects too
    tm = LakeTable(str(tmp_path / "tm"), num_partitions=4, layout="mor")
    tm.apply_epoch(src[0])
    tm.apply_epoch(src[1])
    pm = tm.read(columns=["repo", "path"]).to_pandas()
    assert sorted(pm.columns) == ["path", "repo"]
    assert len(pm) == len(full)


def test_same_process_second_writer_raises(tmp_path, changelog):
    """A live lock bearing OUR OWN pid means another thread of this
    process is writing — it must raise, never be stolen (stealing would
    run two writers from the same parent manifest: lost update)."""
    t = LakeTable(str(tmp_path / "t"), num_partitions=4)
    lock = t._acquire_lock()
    try:
        t2 = LakeTable(str(tmp_path / "t"), num_partitions=4)
        with pytest.raises(RuntimeError, match="live writer"):
            t2.apply_epoch(changelog[0])
    finally:
        t._release_lock(lock)
    t.apply_epoch(changelog[0])  # releases cleanly, next writer proceeds


def test_lock_wait_serializes_concurrent_writers(tmp_path):
    """With lock_wait_seconds > 0 concurrent writers SERIALIZE instead of
    raising — the tail-daemon + cron-maintenance coexistence mode — and
    the final state still equals the oracle."""
    import threading

    src = generate_changelog(str(tmp_path / "log"), n_events=1200, n_epochs=4, seed=7)
    t1 = LakeTable(str(tmp_path / "t"), num_partitions=4, lock_wait_seconds=30)
    t2 = LakeTable(str(tmp_path / "t"), num_partitions=4, lock_wait_seconds=30)
    t1.apply_epoch(src[0])
    errs = []

    log_dir = os.path.dirname(src[0])

    def worker(handle):
        try:
            for _ in range(3):
                handle.replay(log_dir)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    # both handles replay the same changelog dir concurrently: the lock
    # serializes; replay()'s only-new-epochs rule dedups
    th1 = threading.Thread(target=worker, args=(t1,))
    th2 = threading.Thread(target=worker, args=(t2,))
    th1.start(); th2.start(); th1.join(); th2.join()
    assert not errs, errs
    assert t1.current_epoch() == 4
    assert _keymap(t1.state_table()) == _keymap(expected_state(src))


def test_dangling_current_raises_not_empty_table(tmp_path, changelog):
    """CURRENT naming a missing manifest is corruption — refusing beats
    silently restarting an existing table at epoch 1 (data loss)."""
    from laketide.state import manifest as M

    t = LakeTable(str(tmp_path / "t"), num_partitions=4)
    t.apply_epoch(changelog[0])
    p = M.paths(str(tmp_path / "t"))
    with open(p["current"]) as fh:
        name = fh.read().strip()
    os.remove(os.path.join(p["manifests"], name))
    with pytest.raises(RuntimeError, match="missing manifest"):
        M.load_current(str(tmp_path / "t"))


def test_stale_handle_adopts_rescaled_partition_count(tmp_path):
    """A handle created before another writer rescaled must adopt the
    committed partition count under the lock — hashing keys mod the old
    P against files laid out mod the new one silently duplicates keys."""
    src = generate_changelog(str(tmp_path / "log"), n_events=1500, n_epochs=3, seed=11)
    stale = LakeTable(str(tmp_path / "t"), num_partitions=8)
    stale.apply_epoch(src[0])
    other = LakeTable(str(tmp_path / "t"), num_partitions=8)
    other.apply_epoch(src[1])
    other.rescale(4)
    # the stale handle still believes P=8; applying must adopt P=4
    stale.apply_epoch(src[2])
    assert stale.num_partitions == 4
    assert _keymap(stale.state_table()) == _keymap(expected_state(src))


def test_already_applied_returns_stored_totals(tmp_path, changelog):
    t = LakeTable(str(tmp_path / "t"), num_partitions=4)
    first = t.apply_epoch(changelog[0])
    again = t.apply_epoch(changelog[0], epoch_id=1)
    assert again["already_applied"] is True
    assert again["totals"] == first["totals"]
    assert again["rows"] == first["rows"]


def test_history_orders_maintenance_after_base_epoch(tmp_path):
    """Maintenance manifests (manifest-000002-c0) must list AFTER their
    base epoch, not before ('-' < '.' lexicographically)."""
    src = generate_changelog(str(tmp_path / "log"), n_events=1200, n_epochs=3, seed=9)
    t = LakeTable(str(tmp_path / "t"), num_partitions=4, layout="mor")
    t.apply_epoch(src[0])
    t.apply_epoch(src[1])
    t.compact()
    t.apply_epoch(src[2])
    h = t.history()
    names = [e["manifest"] for e in h]
    assert names.index("manifest-000002.json") < names.index("manifest-000002-c0.json")
    assert names[-1] == "manifest-000003.json"
    assert [e["epoch"] for e in h] == sorted(e["epoch"] for e in h)


def test_gc_removes_tmp_leftovers_and_prunes_lineage(tmp_path):
    src = generate_changelog(str(tmp_path / "log"), n_events=1500, n_epochs=4, seed=13)
    t = LakeTable(str(tmp_path / "t"), num_partitions=4)
    for f in src:
        t.apply_epoch(f)
    from laketide.state import manifest as M

    p = M.paths(str(tmp_path / "t"))
    # a crashed writer's leftover
    dead = os.path.join(p["data"], "part-00001-e000001.parquet.tmp-9999")
    with open(dead, "wb") as fh:
        fh.write(b"partial")
    r = t.gc(keep_last=2)
    assert not os.path.exists(dead)
    assert r["removed_lineage"] >= 1  # epochs 1..2 pruned with their manifests
    lineage_left = sorted(os.listdir(p["lineage"]))
    assert lineage_left == ["epoch-000003.json", "epoch-000004.json"]
    assert _keymap(t.state_table()) == _keymap(expected_state(src))


def test_actor_cache_invalidated_by_cross_handle_purge(tmp_path):
    """A purge_tombstones by ANOTHER handle (same epoch, files rewritten)
    bumps the maintenance generation; a cached actor pool must reload
    instead of writing the purged tombstones back."""
    src = generate_changelog(
        str(tmp_path / "log"), n_events=2400, n_epochs=3, seed=17, delete_frac=0.2
    )
    t = LakeTable(str(tmp_path / "t"), num_partitions=4)
    t.apply_epoch(src[0], exchange="actor")
    t.apply_epoch(src[1], exchange="actor")
    other = LakeTable(str(tmp_path / "t"), num_partitions=4)
    purged = other.purge_tombstones(older_than_epochs=0)
    assert purged["purged"] > 0
    # the FIRST handle's actor pool still caches pre-purge tables
    t.apply_epoch(src[2], exchange="actor")
    st = t.state_table()
    assert _keymap(st) == _keymap(expected_state(src))
    # purged tombstones stay purged: only epoch-3 deletes may be flagged
    import pyarrow.compute as pc2

    from laketide.state import manifest as M

    man = M.load_current(str(tmp_path / "t"))
    flagged = 0
    for info in man.partitions.values():
        if info.get("file"):
            tb = pq.read_table(os.path.join(str(tmp_path / "t"), info["file"]))
            if "deleted" in tb.column_names:
                flagged += int(pc2.sum(pc2.fill_null(tb["deleted"], False)).as_py() or 0)
    ep3_deletes = sum(
        1 for op in pq.read_table(src[2], columns=["op"])["op"].to_pylist()
        if op == "delete"
    )
    assert flagged <= ep3_deletes


def test_sharded_changelog_regenerates_idempotently(tmp_path):
    """Regression: os.replace(dir, dir) raises ENOTEMPTY — regenerating a
    sharded changelog into the same directory (a crashed earlier run that
    never wrote the cache _DONE marker) must converge, not fail forever."""
    d = str(tmp_path / "log")
    a = generate_changelog(d, n_events=400, n_epochs=2, seed=5, shards_per_epoch=4)
    b = generate_changelog(d, n_events=400, n_epochs=2, seed=5, shards_per_epoch=4)
    assert a == b
    ea, eb = expected_state(a), expected_state(b)
    assert ea.equals(eb)


def test_pluggable_merge_strategy_longest(tmp_path):
    """Reference E4/R6: 'longer content wins' merge strategy, checked
    against a DuckDB window oracle ordering by content length."""
    import duckdb

    d = str(tmp_path / "log")
    files = generate_changelog(d, n_events=2000, n_epochs=2, seed=13, delete_frac=0.0)
    t = LakeTable(str(tmp_path / "t"), num_partitions=4, merge="longest")
    for f in files:
        t.apply_epoch(f)
    state = t.state_table()
    con = duckdb.connect()
    fs = ", ".join(f"'{f}'" for f in files)
    exp = con.execute(
        f"""
        SELECT repo, path, commit, content FROM (
          SELECT *, row_number() OVER (
            PARTITION BY repo, path
            ORDER BY coalesce(length(content), -1) DESC, commit DESC, seq DESC) rn
          FROM read_parquet([{fs}], union_by_name=true)
        ) WHERE rn = 1 AND op != 'delete'
        """
    ).arrow()
    assert _keymap(state) == _keymap(exp)
    # strategy is pinned in the manifest
    t2 = LakeTable(str(tmp_path / "t"))
    assert t2.merge == "longest"
    with pytest.raises(ValueError):
        LakeTable(str(tmp_path / "t"), merge="nope")


def test_spill_task_retry_is_exactly_once(changelog, tmp_path, monkeypatch):
    """I5/exactly-once: a spill task that crashes once (then succeeds on
    Ray's automatic retry) must not double-contribute — only files from
    SUCCESSFUL task attempts enter the exchange, and staging writes are
    truncate-on-write."""
    import laketide.pipelines.cdc as cdc

    marker_dir = str(tmp_path / "markers")
    os.makedirs(marker_dir, exist_ok=True)

    # Defined INSIDE the test so cloudpickle serializes the class BY
    # VALUE: monkeypatching a method of the importable class only
    # patches the driver — Ray workers re-import the unpatched module
    # and the injection never fires (verified empirically).
    class FlakySpill(cdc._SpillShards):
        def __call__(self, batch):
            # fail exactly once per worker process (retried task lands
            # on a fresh or same worker; either way bounded crashes)
            marker = os.path.join(marker_dir, f"pid-{os.getpid()}")
            if not os.path.exists(marker):
                with open(marker, "w") as fh:
                    fh.write("x")
                raise RuntimeError("injected spill crash (retry me)")
            return super().__call__(batch)

    monkeypatch.setattr(cdc, "_SpillShards", FlakySpill)
    t = LakeTable(str(tmp_path / "t"), num_partitions=8)
    for f in changelog:
        t.apply_epoch(f, exchange="storage")
    # the injection must actually have fired in the workers
    assert os.listdir(marker_dir), "no crash was injected — test is vacuous"
    monkeypatch.undo()
    clean = LakeTable(str(tmp_path / "clean"), num_partitions=8)
    for f in changelog:
        clean.apply_epoch(f, exchange="storage")
    assert _keymap(t.state_table()) == _keymap(clean.state_table())


def test_single_writer_lock(changelog, tmp_path):
    t = LakeTable(str(tmp_path / "t"), num_partitions=4)
    t.apply_epoch(changelog[0])
    lock = os.path.join(str(tmp_path / "t"), "_LOCK")
    # live foreign writer (this test's own pid stands in) -> refused
    with open(lock, "w") as fh:
        fh.write("1")  # pid 1 is always alive (init) and not ours
    with pytest.raises(RuntimeError):
        t.apply_epoch(changelog[1])
    os.remove(lock)
    # stale lock (dead pid) -> stolen, apply proceeds
    with open(lock, "w") as fh:
        fh.write("999999999")
    r = t.apply_epoch(changelog[1])
    assert r["epoch"] == 2
    assert not os.path.exists(lock)


def test_pluggable_merge_strategy_coalesce(tmp_path):
    """Reference E4/R4/R5: field-wise merge — newest non-null scalar wins
    (primary-wins coalesce, merger.go:231-316), list columns union-dedup
    (array-union, merger.go:268-284), tombstones clear accumulated state.
    Checked against a DuckDB IGNORE NULLS window oracle."""
    import duckdb
    import pyarrow.parquet as _pq

    def ev(commit, seq, path, op, lang, content, tags):
        return {
            "repo": "r",
            "path": path,
            "commit": f"c{commit:010d}",
            "seq": seq,
            "op": op,
            "lang": lang,
            "content": content,
            "tags": tags,
        }

    e1 = [
        ev(1, 1, "a", "insert", "py", "v1", ["t1", "t2"]),
        ev(2, 2, "a", "update", None, "v2", ["t2", "t3"]),
        ev(1, 3, "b", "insert", "go", "w1", ["x"]),
    ]
    e2 = [
        ev(3, 4, "a", "update", None, None, None),      # all-null update: only version moves
        ev(2, 5, "b", "delete", None, None, None),       # clears b
        ev(3, 6, "b", "insert", None, "w2", ["y"]),      # restart after delete
    ]
    schema = pa.schema(
        [
            ("repo", pa.string()),
            ("path", pa.string()),
            ("commit", pa.string()),
            ("seq", pa.int64()),
            ("op", pa.string()),
            ("lang", pa.string()),
            ("content", pa.string()),
            ("tags", pa.list_(pa.string())),
        ]
    )
    for i, rows in enumerate([e1, e2], start=1):
        _pq.write_table(
            pa.Table.from_pylist(rows, schema=schema), str(tmp_path / f"e{i}.parquet")
        )
    t = LakeTable(str(tmp_path / "t"), num_partitions=2, merge="coalesce")
    t.apply_epoch(str(tmp_path / "e1.parquet"))
    t.apply_epoch(str(tmp_path / "e2.parquet"))
    st = t.state_table()
    rows = {r["path"]: r for r in st.to_pylist()}
    a, b = rows["a"], rows["b"]
    # a: version advanced to c3; lang survives from c1 (newest non-null),
    # content from c2; tags = union of all live versions
    assert a["commit"] == "c0000000003" and a["seq"] == 4
    assert a["lang"] == "py" and a["content"] == "v2"
    assert sorted(a["tags"]) == ["t1", "t2", "t3"]
    # b: delete at c2 cleared t1-era state; c3 restart carries only w2/y
    assert b["commit"] == "c0000000003" and b["lang"] is None
    assert b["content"] == "w2" and sorted(b["tags"]) == ["y"]

    # DuckDB oracle for the scalar columns (IGNORE NULLS last_value after
    # the last tombstone)
    con = duckdb.connect()
    fs = ", ".join(f"'{tmp_path}/e{i}.parquet'" for i in (1, 2))
    exp = con.execute(
        f"""
        WITH ev AS (SELECT * FROM read_parquet([{fs}], union_by_name=true)),
        last_del AS (
          SELECT repo, path, max(commit || lpad(CAST(seq AS VARCHAR), 20, '0')) AS dv
          FROM ev WHERE op = 'delete' GROUP BY repo, path
        ),
        live AS (
          SELECT e.* FROM ev e LEFT JOIN last_del d USING (repo, path)
          WHERE d.dv IS NULL OR (e.commit || lpad(CAST(e.seq AS VARCHAR), 20, '0')) > d.dv
        )
        SELECT repo, path,
          last_value(commit) OVER w AS commit,
          last_value(lang IGNORE NULLS) OVER w AS lang,
          last_value(content IGNORE NULLS) OVER w AS content
        FROM live
        WINDOW w AS (PARTITION BY repo, path ORDER BY commit, seq
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        QUALIFY row_number() OVER (PARTITION BY repo, path ORDER BY commit DESC, seq DESC) = 1
        """
    ).arrow()
    got = {(r["repo"], r["path"]): (r["commit"], r["lang"], r["content"]) for r in exp.to_pylist()}
    for r in st.to_pylist():
        assert got[(r["repo"], r["path"])] == (r["commit"], r["lang"], r["content"])
    # strategy pinned in the manifest
    assert LakeTable(str(tmp_path / "t")).merge == "coalesce"


def test_coalesce_in_epoch_fold_and_dup_replays(tmp_path):
    """In-epoch fold: several versions of one key inside ONE epoch merge
    field-wise; exact duplicate replays drop."""
    import pyarrow.parquet as _pq

    rows = [
        {"repo": "r", "path": "a", "commit": "c0000000001", "seq": 1, "op": "insert",
         "lang": "py", "content": None},
        {"repo": "r", "path": "a", "commit": "c0000000002", "seq": 2, "op": "update",
         "lang": None, "content": "body"},
        {"repo": "r", "path": "a", "commit": "c0000000002", "seq": 2, "op": "update",
         "lang": None, "content": "body"},  # exact dup replay
    ]
    _pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "e1.parquet"))
    t = LakeTable(str(tmp_path / "t"), num_partitions=2, merge="coalesce")
    r = t.apply_epoch(str(tmp_path / "e1.parquet"))
    assert r["totals"]["dupes_dropped"] == 1
    st = t.state_table()
    assert st.num_rows == 1
    row = st.to_pylist()[0]
    assert row["lang"] == "py" and row["content"] == "body"
    assert row["commit"] == "c0000000002"


def test_coalesce_sha_pairs_with_winning_content(tmp_path):
    """Regression: merge='coalesce' must never pair the newest content
    with an OLDER event's source-provided content_sha256. The fold takes
    the sha at content's winning event (ensure_sha recomputes nulls), so
    stored state always satisfies content_sha256 == sha256(content) —
    both for the in-epoch fold and the cross-epoch row-wise merge."""
    import hashlib

    import pyarrow.parquet as _pq

    def sha(s):
        return hashlib.sha256(s.encode()).hexdigest()

    # epoch 1: old content WITH a source-provided sha, then a newer event
    # whose content is new but whose sha is null (normalize no longer
    # hashes per event) — in-epoch fold case
    e1 = [
        {"repo": "r", "path": "a", "commit": "c0000000001", "seq": 1, "op": "insert",
         "lang": "py", "content": "old", "content_sha256": sha("old")},
        {"repo": "r", "path": "a", "commit": "c0000000002", "seq": 2, "op": "update",
         "lang": None, "content": "new", "content_sha256": None},
    ]
    # epoch 2: cross-epoch row-wise merge — stored row has content 'new'
    # + its sha; the update carries newer content with a null sha
    e2 = [
        {"repo": "r", "path": "a", "commit": "c0000000003", "seq": 3, "op": "update",
         "lang": None, "content": "newest", "content_sha256": None},
    ]
    for i, rows in enumerate([e1, e2], start=1):
        _pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / f"e{i}.parquet"))
    t = LakeTable(str(tmp_path / "t"), num_partitions=2, merge="coalesce")
    t.apply_epoch(str(tmp_path / "e1.parquet"))
    row = t.state_table().to_pylist()[0]
    assert row["content"] == "new"
    assert row["content_sha256"] == sha("new")  # NOT sha('old')
    assert row["lang"] == "py"  # other fields still coalesce field-wise
    t.apply_epoch(str(tmp_path / "e2.parquet"))
    row = t.state_table().to_pylist()[0]
    assert row["content"] == "newest"
    assert row["content_sha256"] == sha("newest")


def test_coalesce_storage_exchange_and_schema_evolution(tmp_path):
    """merge='coalesce' through the storage-backed exchange path, with a
    list payload column appearing only in epoch 2 (additive evolution)
    and an idempotent HWM replay."""
    import pyarrow.parquet as _pq

    e1 = pa.Table.from_pylist(
        [
            {"repo": "r", "path": "a", "commit": "c0000000001", "seq": 1,
             "op": "insert", "lang": "py", "content": "v1"},
            {"repo": "r", "path": "b", "commit": "c0000000002", "seq": 2,
             "op": "insert", "lang": "go", "content": "w1"},
        ]
    )
    e2 = pa.Table.from_pylist(
        [
            {"repo": "r", "path": "a", "commit": "c0000000003", "seq": 3,
             "op": "update", "lang": None, "content": None, "tags": ["t1"]},
            {"repo": "r", "path": "b", "commit": "c0000000004", "seq": 4,
             "op": "update", "lang": None, "content": "w2", "tags": ["t2", "t3"]},
        ],
        schema=pa.schema(
            [
                ("repo", pa.string()), ("path", pa.string()),
                ("commit", pa.string()), ("seq", pa.int64()),
                ("op", pa.string()), ("lang", pa.string()),
                ("content", pa.string()), ("tags", pa.list_(pa.string())),
            ]
        ),
    )
    _pq.write_table(e1, str(tmp_path / "e1.parquet"))
    _pq.write_table(e2, str(tmp_path / "e2.parquet"))
    t = LakeTable(str(tmp_path / "t"), num_partitions=2, merge="coalesce")
    t.apply_epoch(str(tmp_path / "e1.parquet"), exchange="storage")
    t.apply_epoch(str(tmp_path / "e2.parquet"), exchange="storage")
    rows = {r["path"]: r for r in t.state_table().to_pylist()}
    assert rows["a"]["lang"] == "py" and rows["a"]["content"] == "v1"
    assert rows["a"]["tags"] == ["t1"] and rows["a"]["commit"] == "c0000000003"
    assert rows["b"]["content"] == "w2" and sorted(rows["b"]["tags"]) == ["t2", "t3"]
    # replay epoch 2 as a new epoch: HWM drops everything, state unchanged
    r = t.apply_epoch(str(tmp_path / "e2.parquet"), epoch_id=3)
    assert r["totals"]["replays_dropped"] == 2
    rows2 = {r["path"]: r for r in t.state_table().to_pylist()}
    assert rows2 == rows


def test_schema_evolution_null_column_promotes(tmp_path):
    """A payload column whose FIRST appearance is all-null (Arrow infers
    type null) must not pin the type: the next epoch's real values
    promote the stored schema instead of crashing conform's cast."""
    import pyarrow.parquet as _pq

    e1 = pa.table(
        {
            "repo": ["r"],
            "path": ["a"],
            "commit": ["c0000000001"],
            "seq": pa.array([1], pa.int64()),
            "op": ["insert"],
            "content": ["x"],
            "score": pa.nulls(1, pa.null()),  # brand-new column, all null
        }
    )
    e2 = pa.table(
        {
            "repo": ["r"],
            "path": ["b"],
            "commit": ["c0000000002"],
            "seq": pa.array([2], pa.int64()),
            "op": ["insert"],
            "content": ["y"],
            "score": pa.array([0.75], pa.float64()),  # real values arrive
        }
    )
    _pq.write_table(e1, str(tmp_path / "e1.parquet"))
    _pq.write_table(e2, str(tmp_path / "e2.parquet"))
    t = LakeTable(str(tmp_path / "t"), num_partitions=2)
    t.apply_epoch(str(tmp_path / "e1.parquet"))
    t.apply_epoch(str(tmp_path / "e2.parquet"))
    st = t.state_table()
    assert st.num_rows == 2
    assert pa.types.is_floating(st.schema.field("score").type)
    rows = {r["path"]: r for r in st.to_pylist()}
    assert rows["a"]["score"] is None and rows["b"]["score"] == 0.75


def test_lock_race_single_winner(tmp_path):
    """8 processes race to steal a STALE lock and then hold it briefly:
    hold intervals must never overlap (the remove-based steal let two
    contenders both 'win'; rename-based stealing and hardlink pid
    publish make exactly one winner at a time)."""
    import subprocess
    import sys
    import textwrap

    table_dir = str(tmp_path / "t")
    os.makedirs(table_dir, exist_ok=True)
    # stale lock from a dead pid (999999999 > any kernel pid_max, so it
    # can never be a live process on hosts with pid_max=4194304)
    with open(os.path.join(table_dir, "_LOCK"), "w") as fh:
        fh.write("999999999")
    log = str(tmp_path / "holds.log")
    script = textwrap.dedent(
        f"""
        import os, sys, time
        sys.path.insert(0, {os.getcwd()!r})
        from laketide.pipelines.cdc import LakeTable
        t = LakeTable.__new__(LakeTable)
        t.table_dir = {table_dir!r}
        deadline = time.monotonic() + 20
        while time.monotonic() < deadline:
            try:
                lock = t._acquire_lock()
            except RuntimeError:
                time.sleep(0.005)
                continue
            t0 = time.monotonic_ns()
            time.sleep(0.05)
            t1 = time.monotonic_ns()
            with open({log!r}, "a") as fh:
                fh.write(f"{{os.getpid()}} {{t0}} {{t1}}\\n")
            t._release_lock(lock)
            break
        else:
            sys.exit(3)
        """
    )
    procs = [
        subprocess.Popen([sys.executable, "-c", script]) for _ in range(8)
    ]
    for p in procs:
        assert p.wait(timeout=60) == 0
    with open(log) as fh:
        spans = sorted(
            (int(a), int(b)) for _, a, b in (line.split() for line in fh)
        )
    assert len(spans) == 8
    for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
        assert a1 <= b0, f"overlapping lock holds: {(a0, a1)} vs {(b0, b1)}"


def test_mor_apply_with_list_payload_column(tmp_path):
    """MOR layout + a list payload column across multiple epochs:
    Arrow's hash join rejects list-typed non-key fields, so the delta
    classifier must detach/re-attach them (review-found crash: epoch 2
    died in winners.join(cur_idx))."""
    import pyarrow.parquet as _pq

    schema = pa.schema(
        [
            ("repo", pa.string()),
            ("path", pa.string()),
            ("commit", pa.string()),
            ("seq", pa.int64()),
            ("op", pa.string()),
            ("content", pa.string()),
            ("tags", pa.list_(pa.string())),
        ]
    )
    e1 = [
        {"repo": "r", "path": "a", "commit": "c0000000001", "seq": 1,
         "op": "insert", "content": "v1", "tags": ["t1"]},
        {"repo": "r", "path": "b", "commit": "c0000000001", "seq": 2,
         "op": "insert", "content": "w1", "tags": ["x", "y"]},
    ]
    e2 = [
        {"repo": "r", "path": "a", "commit": "c0000000002", "seq": 3,
         "op": "update", "content": "v2", "tags": ["t2"]},
        {"repo": "r", "path": "b", "commit": "c0000000002", "seq": 4,
         "op": "delete", "content": None, "tags": None},
    ]
    for i, rows in enumerate([e1, e2], start=1):
        _pq.write_table(
            pa.Table.from_pylist(rows, schema=schema), str(tmp_path / f"e{i}.parquet")
        )
    t = LakeTable(str(tmp_path / "t"), num_partitions=2, layout="mor")
    t.apply_epoch(str(tmp_path / "e1.parquet"))
    t.apply_epoch(str(tmp_path / "e2.parquet"))  # crashed before the fix
    st = t.state_table()
    rows = {r["path"]: r for r in st.to_pylist()}
    assert set(rows) == {"a"}
    assert rows["a"]["content"] == "v2" and rows["a"]["tags"] == ["t2"]
    # noop re-apply still classifies against the (list-carrying) index
    r = t.apply_epoch(str(tmp_path / "e2.parquet"), epoch_id=2)
    assert r["already_applied"] is True


def test_point_lookup_after_cross_process_rescale(tmp_path):
    """get() must hash with the MANIFEST's partition count: a stale
    handle after another process rescaled would otherwise read the
    wrong partition and return empty for a live key (review-found)."""
    src = generate_changelog(str(tmp_path / "log"), n_events=1500, n_epochs=2, seed=13)
    stale = LakeTable(str(tmp_path / "t"), num_partitions=8)
    stale.apply_epoch(src[0])
    stale.apply_epoch(src[1])
    exp = {(r["repo"], r["path"]): r["content"] for r in expected_state(src).to_pylist()}
    other = LakeTable(str(tmp_path / "t"), num_partitions=8)
    other.rescale(3)
    hits = 0
    for (repo, path), content in list(exp.items())[:20]:
        got = stale.get(repo, path)
        assert got.num_rows == 1, f"missing {(repo, path)} after rescale"
        assert got["content"][0].as_py() == content
        hits += 1
    assert hits == 20


def test_list_union_null_elements_keep_int64_exact(tmp_path):
    """A null ELEMENT inside a list<int64> payload must not corrupt the
    union: numpy converts int64-with-nulls to float64, and values above
    2^53 silently lose precision (review-found). Null elements drop;
    big integers survive bit-exact."""
    import pyarrow.parquet as _pq

    big = 9007199254740993  # 2^53 + 1: unrepresentable in float64
    schema = pa.schema(
        [
            ("repo", pa.string()),
            ("path", pa.string()),
            ("commit", pa.string()),
            ("seq", pa.int64()),
            ("op", pa.string()),
            ("content", pa.string()),
            ("ids", pa.list_(pa.int64())),
        ]
    )
    e1 = [
        {"repo": "r", "path": "a", "commit": "c0000000001", "seq": 1,
         "op": "insert", "content": "v1", "ids": [big, None, 7]},
        {"repo": "r", "path": "a", "commit": "c0000000002", "seq": 2,
         "op": "update", "content": "v2", "ids": [big + 2]},
    ]
    _pq.write_table(
        pa.Table.from_pylist(e1, schema=schema), str(tmp_path / "e1.parquet")
    )
    t = LakeTable(str(tmp_path / "t"), num_partitions=2, merge="coalesce")
    t.apply_epoch(str(tmp_path / "e1.parquet"))
    st = t.state_table()
    row = st.to_pylist()[0]
    assert sorted(row["ids"]) == [7, big, big + 2]
