"""Table operations: incremental replay/resume (I4), point lookup (J3),
snapshot export (S10), retention GC (I7), source registry (E1/E2), and
hot-repo skew spreading (the salting invariant)."""

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from laketide.pipelines.cdc import LakeTable
from laketide.sources import registry
from laketide.sources.changelog import expected_state, generate_changelog


def _cli_json(buf) -> dict:
    """Parse the CLI's one-line JSON report from captured stdout.

    Ray's log_to_driver thread prints worker log lines (``(_task
    pid=NNN) ...``) onto the DRIVER's stdout, so an in-process
    ``redirect_stdout`` capture can interleave them before or after the
    CLI's JSON line — scan backwards for the last line that parses."""
    for line in reversed(buf.getvalue().strip().splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    raise AssertionError(f"no JSON line in CLI output: {buf.getvalue()!r}")


def test_replay_resumes_from_committed_epoch(changelog, tmp_path):
    d = os.path.dirname(changelog[0])
    t = LakeTable(str(tmp_path / "t"), num_partitions=8)
    t.apply_epoch(changelog[0])  # partially applied already
    results = t.replay(d)
    assert [r["epoch"] for r in results] == [2, 3]
    assert t.current_epoch() == 3
    # replay again: nothing to do
    assert t.replay(d) == []
    exp = expected_state(changelog)
    assert t.state_table().num_rows == exp.num_rows


def test_point_lookup_reads_single_partition(changelog, tmp_path):
    t = LakeTable(str(tmp_path / "t"), num_partitions=8)
    t.replay(os.path.dirname(changelog[0]))
    state = t.state_table()
    repo = state["repo"][0].as_py()
    path = state["path"][0].as_py()
    row = t.get(repo, path)
    assert row.num_rows == 1
    assert row["commit"][0].as_py() == state["commit"][0].as_py()
    assert t.get("no-such-repo", "nope").num_rows == 0


def test_export_snapshot_versioned_with_checksums(changelog, tmp_path):
    t = LakeTable(str(tmp_path / "t"), num_partitions=8)
    t.replay(os.path.dirname(changelog[0]))
    meta = t.export_snapshot(str(tmp_path / "exports"))
    assert meta["version"] == 3 and meta["status"] == "completed"
    exp_dir = str(tmp_path / "exports" / "snapshot-000003")
    assert os.path.exists(os.path.join(exp_dir, "EXPORT.json"))
    total = 0
    import hashlib

    for f in meta["files"]:
        p = os.path.join(exp_dir, f["name"])
        assert os.path.getsize(p) == f["bytes"]
        with open(p, "rb") as fh:
            assert hashlib.sha256(fh.read()).hexdigest() == f["sha256"]
        total += f["rows"]
    assert total == meta["rows"] == t.state_table().num_rows
    # idempotent re-export
    again = t.export_snapshot(str(tmp_path / "exports"))
    assert again == meta


def test_export_snapshot_incremental_reuses_unchanged_partitions(tmp_path):
    """A later export hardlinks partitions whose (base file, deltas)
    fingerprint is unchanged since the previous snapshot instead of
    re-merging them — and the result is still byte-verified and equal to
    the live state."""
    import hashlib

    src = generate_changelog(str(tmp_path / "log"), n_events=2000, n_epochs=2, seed=23)
    t = LakeTable(str(tmp_path / "t"), num_partitions=8)
    t.apply_epoch(src[0])
    first = t.export_snapshot(str(tmp_path / "exports"))
    assert first["reused"] == 0
    # a small second epoch touches only SOME partitions
    ev = pa.table(
        {
            "repo": ["repo-000", "repo-001"],
            "path": ["only/a", "only/b"],
            "commit": ["c9999999990", "c9999999991"],
            "seq": pa.array([1, 2], pa.int64()),
            "op": ["insert", "insert"],
            "content": ["xx", "yy"],
        }
    )
    f2 = str(tmp_path / "e2.parquet")
    pq.write_table(ev, f2)
    t.apply_epoch(f2)
    second = t.export_snapshot(str(tmp_path / "exports"))
    assert second["version"] == first["version"] + 1
    assert 0 < second["reused"] < len(second["files"])
    exp_dir = str(tmp_path / "exports" / f"snapshot-{second['version']:06d}")
    total = 0
    for f in second["files"]:
        p = os.path.join(exp_dir, f["name"])
        with open(p, "rb") as fh:
            assert hashlib.sha256(fh.read()).hexdigest() == f["sha256"]
        total += f["rows"]
    assert total == second["rows"] == t.state_table().num_rows


def test_export_snapshot_csv_and_jsonl_formats(changelog, tmp_path):
    """fmt='csv'/'jsonl' analog of the reference export job's JSON/CSV
    snapshots (server.go:543-588): same rows as the live state, own
    snapshot lineage per format, checksum-verified, format-scoped
    incremental reuse."""
    import hashlib

    t = LakeTable(str(tmp_path / "t"), num_partitions=8)
    t.replay(os.path.dirname(changelog[0]))
    state_rows = t.state_table().num_rows

    for fmt, reader in (
        ("csv", lambda p: __import__("pyarrow.csv", fromlist=["csv"]).read_csv(p)),
        (
            "jsonl",
            lambda p: __import__("pyarrow.json", fromlist=["json"]).read_json(p),
        ),
    ):
        meta = t.export_snapshot(str(tmp_path / "exports"), fmt=fmt)
        assert meta["format"] == fmt and meta["status"] == "completed"
        exp_dir = str(tmp_path / "exports" / f"snapshot-{meta['version']:06d}-{fmt}")
        assert os.path.exists(os.path.join(exp_dir, "EXPORT.json"))
        total = 0
        for f in meta["files"]:
            assert f["name"].endswith("." + fmt)
            p = os.path.join(exp_dir, f["name"])
            with open(p, "rb") as fh:
                assert hashlib.sha256(fh.read()).hexdigest() == f["sha256"]
            got = reader(p)
            assert got.num_rows == f["rows"]
            assert {"repo", "path", "content"} <= set(got.column_names)
            total += got.num_rows
        assert total == meta["rows"] == state_rows
        # idempotent re-export of the same epoch+format
        assert t.export_snapshot(str(tmp_path / "exports"), fmt=fmt) == meta

    # parquet lineage is untouched by the other formats: a parquet export
    # of the same epoch neither collides nor reuses csv/jsonl files
    pmeta = t.export_snapshot(str(tmp_path / "exports"), fmt="parquet")
    assert pmeta["format"] == "parquet" and pmeta["reused"] == 0
    with pytest.raises(ValueError):
        t.export_snapshot(str(tmp_path / "exports"), fmt="xml")


def test_gc_drops_superseded_files_keeps_state(changelog, tmp_path):
    t = LakeTable(str(tmp_path / "t"), num_partitions=8)
    t.replay(os.path.dirname(changelog[0]))
    before = t.state_table()
    n_files_before = len(glob.glob(str(tmp_path / "t" / "data" / "*.parquet")))
    r = t.gc(keep_last=1)
    assert r["removed_files"] > 0
    n_files_after = len(glob.glob(str(tmp_path / "t" / "data" / "*.parquet")))
    assert n_files_after < n_files_before
    after = LakeTable(str(tmp_path / "t")).state_table()
    assert before.equals(after)


def test_gc_after_maintenance_keeps_live_manifest(tmp_path):
    """Regression: maintenance manifests (manifest-NNN-c0.json) sort
    lexicographically BEFORE their base epoch ('-' < '.'), so a naive
    name-sorted gc(keep_last=1) would delete the LIVE compacted manifest
    and the data files only it references, destroying the table."""
    t = LakeTable(str(tmp_path / "t"), num_partitions=2, layout="mor")
    for e in range(1, 3):
        ev = pa.table(
            {
                "repo": ["r", "r"],
                "path": ["a", "b"],
                "commit": [f"c{e:010d}"] * 2,
                "seq": pa.array([2 * e, 2 * e + 1], pa.int64()),
                "op": ["insert" if e == 1 else "update"] * 2,
                "content": [f"va{e}", f"vb{e}"],
            }
        )
        f = str(tmp_path / f"e{e}.parquet")
        pq.write_table(ev, f)
        t.apply_epoch(f)
    before = t.state_table()
    r = t.compact()
    assert r["compacted"] > 0  # live manifest is now manifest-000002-c0.json
    t.gc(keep_last=1)
    t2 = LakeTable(str(tmp_path / "t"))
    assert t2.current_manifest() is not None
    assert t2.state_table().equals(before)


def test_noop_only_epoch_commits_version_advance(tmp_path):
    """Regression: an epoch of ONLY content-identical version advances
    must still commit — the stored (commit, seq) must move forward, or a
    late intermediate event could wrongly win a future LWW compare."""
    t = LakeTable(str(tmp_path / "t"), num_partitions=2)
    e1 = pa.table(
        {
            "repo": ["r"],
            "path": ["a"],
            "commit": ["c0000000001"],
            "seq": pa.array([1], pa.int64()),
            "op": ["insert"],
            "content": ["same"],
        }
    )
    e2 = pa.table(
        {
            "repo": ["r"],
            "path": ["a"],
            "commit": ["c0000000005"],
            "seq": pa.array([5], pa.int64()),
            "op": ["update"],
            "content": ["same"],  # identical sha -> pure noop
        }
    )
    pq.write_table(e1, str(tmp_path / "e1.parquet"))
    pq.write_table(e2, str(tmp_path / "e2.parquet"))
    t.apply_epoch(str(tmp_path / "e1.parquet"))
    r = t.apply_epoch(str(tmp_path / "e2.parquet"), hwm_filter=False)
    assert r["totals"]["noops"] == 1
    st = t.state_table()
    assert st["commit"][0].as_py() == "c0000000005"  # version advanced
    assert st["seq"][0].as_py() == 5
    # a late event BETWEEN the two versions must now lose
    e3 = pa.table(
        {
            "repo": ["r"],
            "path": ["a"],
            "commit": ["c0000000003"],
            "seq": pa.array([3], pa.int64()),
            "op": ["update"],
            "content": ["intermediate"],
        }
    )
    pq.write_table(e3, str(tmp_path / "e3.parquet"))
    t.apply_epoch(str(tmp_path / "e3.parquet"), hwm_filter=False)
    st = t.state_table()
    assert st["content"][0].as_py() == "same"
    assert st["commit"][0].as_py() == "c0000000005"


def test_source_registry_jsonl_and_csv(tmp_path):
    # same logical events through three formats -> identical final state
    rows = [
        {"repo": "r", "path": "a", "commit": "c0000000001", "seq": 1, "op": "insert", "content": "v1"},
        {"repo": "r", "path": "a", "commit": "c0000000002", "seq": 2, "op": None, "content": "v2"},
        {"repo": "r", "path": "b", "commit": "c0000000003", "seq": 3, "op": "insert", "content": "w"},
    ]
    import pandas as pd

    df = pd.DataFrame(rows)
    pq_path = str(tmp_path / "e.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), pq_path)
    jsonl_path = str(tmp_path / "e.jsonl")
    df.to_json(jsonl_path, orient="records", lines=True)
    csv_path = str(tmp_path / "e.csv")
    df.to_csv(csv_path, index=False)

    states = {}
    for fmt, path in [("parquet", pq_path), ("jsonl", jsonl_path), ("csv", csv_path)]:
        ds = registry.read_source(fmt, path)
        t = LakeTable(str(tmp_path / f"t_{fmt}"), num_partitions=4)
        t.apply_epoch(ds)
        st = t.state_table()
        states[fmt] = {
            (st["repo"][i].as_py(), st["path"][i].as_py()): st["content_sha256"][i].as_py()
            for i in range(st.num_rows)
        }
    assert states["parquet"] == states["jsonl"] == states["csv"]
    assert len(states["parquet"]) == 2
    assert states["parquet"][("r", "a")] is not None


def test_enabled_sources_env(monkeypatch):
    monkeypatch.delenv("LAKETIDE_ENABLED_SOURCES", raising=False)
    assert set(registry.enabled_sources()) >= {"parquet", "jsonl", "csv"}
    monkeypatch.setenv("LAKETIDE_ENABLED_SOURCES", "parquet,csv")
    assert registry.enabled_sources() == ["parquet", "csv"]
    # a typo'd source name must be a loud error, not silent data loss
    monkeypatch.setenv("LAKETIDE_ENABLED_SOURCES", "parquet,jsnol")
    with pytest.raises(ValueError, match="jsnol"):
        registry.enabled_sources()


def test_hot_repo_spreads_across_partitions(tmp_path):
    """The salting invariant (north-star skew rule): the partitioner
    hashes the FULL (repo, path) key, so a repo with 90% of traffic still
    spreads across partitions, while no single key is ever split."""
    d = str(tmp_path / "log")
    # one dominant repo: crank Zipf by using few repos
    files = generate_changelog(d, n_events=4000, n_epochs=1, seed=3, n_repos=2, paths_per_repo=64)
    t = LakeTable(str(tmp_path / "t"), num_partitions=8)
    t.apply_epoch(files[0])
    from laketide.state.manifest import load_lineage

    lin = load_lineage(str(tmp_path / "t"), 1)
    counts = [p["events_in"] for p in lin["partitions"]]
    assert len(counts) == 8  # every partition participated
    assert max(counts) / (sum(counts) / len(counts)) < 2.0  # balanced
    # and keys are never split: each (repo,path) in exactly one partition
    seen = {}
    man = t.current_manifest()
    for key, info in man.partitions.items():
        if not info.get("file"):
            continue
        tbl = pq.read_table(os.path.join(str(tmp_path / "t"), info["file"]), columns=["repo", "path"])
        for r, p in zip(tbl["repo"].to_pylist(), tbl["path"].to_pylist()):
            assert (r, p) not in seen
            seen[(r, p)] = key


def test_zip_jsonl_source(tmp_path):
    import zipfile

    zp = str(tmp_path / "events.zip")
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr(
            "batch1.jsonl",
            '{"repo":"r","path":"a","commit":"c0000000001","seq":1,"op":"insert","content":"x"}\n'
            "not-json-at-all\n"
            '{"repo":"r","path":"b","commit":"c0000000002","seq":2,"op":"insert","content":"y"}\n',
        )
        zf.writestr("skipme.txt", "ignored")
        # zip-slip guard: a FULLY VALID event behind a traversal path —
        # if the guard were removed this row would land in the table
        zf.writestr(
            "../evil.json",
            '{"repo":"evil","path":"slip","commit":"c0000000009","seq":9,'
            '"op":"insert","content":"pwned"}',
        )
    ds = registry.read_source("zip-jsonl", zp)
    t = LakeTable(str(tmp_path / "t"), num_partitions=4)
    r = t.apply_epoch(ds)
    st = t.state_table()
    assert st.num_rows == 2
    assert sorted(st["path"].to_pylist()) == ["a", "b"]
    assert "evil" not in st["repo"].to_pylist()  # the slip member was excluded


def test_scalar_list_promotion_unify_conform():
    """M4 FlexibleStringArray analog (reference types.go:247-271):
    scalar vs list<T> field collisions promote to the list side and
    conform() wraps scalars as single-element lists (nulls stay null)."""
    import laketide.schema as S2

    a = pa.schema([("tags", pa.string())])
    b = pa.schema([("tags", pa.list_(pa.string()))])
    assert S2.unify(a, b).field("tags").type == pa.list_(pa.string())
    assert S2.unify(b, a).field("tags").type == pa.list_(pa.string())
    # value types promote too: int scalar vs list<double> -> list<double>
    u3 = S2.unify(
        pa.schema([("x", pa.int64())]), pa.schema([("x", pa.list_(pa.float64()))])
    )
    assert u3.field("x").type == pa.list_(pa.float64())
    t = pa.table({"tags": pa.array(["a", None, "b"])})
    out = S2.conform(t, pa.schema([("tags", pa.list_(pa.string()))]))
    assert out["tags"].to_pylist() == [["a"], None, ["b"]]
    # multi-chunk input exercises the per-chunk offset build
    t2 = pa.table(
        {"tags": pa.chunked_array([pa.array([None, "x"]), pa.array(["y"])])}
    )
    out2 = S2.conform(t2, pa.schema([("tags", pa.list_(pa.string()))]))
    assert out2["tags"].to_pylist() == [None, ["x"], ["y"]]


def test_property_scalar_list_wrap_matches_reference():
    """Property: conform()'s scalar->list wrap equals the obvious scalar
    Python reference ([v] per non-null, None per null) for any value/null
    pattern and any chunking of the input column."""
    import hypothesis.strategies as st
    from hypothesis import given, settings

    import laketide.schema as S2

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(st.one_of(st.none(), st.text(max_size=5)), max_size=25),
        st.integers(min_value=1, max_value=7),
    )
    def run(vals, chunk):
        chunks = [
            pa.array(vals[i : i + chunk], pa.string())
            for i in range(0, max(len(vals), 1), chunk)
        ]
        t = pa.table({"x": pa.chunked_array(chunks, pa.string())})
        out = S2.conform(t, pa.schema([("x", pa.list_(pa.string()))]))
        assert out["x"].to_pylist() == [None if v is None else [v] for v in vals]

    run()


def test_zip_jsonl_scalar_vs_list_column(tmp_path):
    """A source column mixing scalar and list values across members must
    promote to list<string> with scalars wrapped — not drop data on
    conform()'s cast (the r2 verdict's M4 gap)."""
    import zipfile

    zp = str(tmp_path / "events.zip")
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr(
            "m1.jsonl",
            '{"repo":"r","path":"a","commit":"c0000000001","seq":1,'
            '"op":"insert","content":"x","tags":"python"}\n',
        )
        zf.writestr(
            "m2.jsonl",
            '{"repo":"r","path":"b","commit":"c0000000002","seq":2,'
            '"op":"insert","content":"y","tags":["go","rust"]}\n',
        )
    ds = registry.read_source("zip-jsonl", zp)
    t = LakeTable(str(tmp_path / "t"), num_partitions=4)
    t.apply_epoch(ds)
    st = t.state_table()
    assert st.num_rows == 2
    tags = {
        st["path"][i].as_py(): st["tags"][i].as_py() for i in range(st.num_rows)
    }
    assert tags == {"a": ["python"], "b": ["go", "rust"]}


def test_embedding_near_dup_runs_deterministic():
    from laketide.functions.similarity import embedding_near_dup

    a = embedding_near_dup("/root/testdata/sf0.001")
    b = embedding_near_dup("/root/testdata/sf0.001")
    assert a.equals(b)
    # self-pairs and reversed pairs never appear
    for i in range(a.num_rows):
        assert a["vec_a"][i].as_py() < a["vec_b"][i].as_py()


def test_cli_end_to_end(tmp_path, changelog):
    from laketide.__main__ import main

    d = os.path.dirname(changelog[0])
    table = str(tmp_path / "t")
    assert main(["replay", "--table", table, "--changelog", d, "--partitions", "8"]) == 0
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        main(["status", "--table", table])
    status = _cli_json(buf)
    assert status["epoch"] == 3 and status["rows"] > 0
    assert main(["export", "--table", table, "--out", str(tmp_path / "ex")]) == 0
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main(["view", "--table", table, "--group", "lang"]) == 0
    view = _cli_json(buf)
    assert view["epoch"] == 3 and view["mode"] == "bootstrap"
    assert sum(g["n_rows"] for g in view["groups"]) == status["rows"]
    # materialized join view: dim parquet -> derived LakeTable refresh
    import pyarrow as pa
    import pyarrow.parquet as pq

    repos = sorted(
        {
            r
            for f in changelog
            for r in pq.read_table(f, columns=["repo"])["repo"].to_pylist()
        }
    )
    dim_path = str(tmp_path / "dim.parquet")
    pq.write_table(
        pa.table(
            {
                "repo": pa.array(repos, pa.string()),
                "owner": pa.array([r.split("/")[0] for r in repos], pa.string()),
            }
        ),
        dim_path,
    )
    jv_args = [
        "join-view", "--table", table, "--target", str(tmp_path / "jv"),
        "--dim", dim_path, "--on", "repo",
    ]
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main(jv_args) == 0
    jv = _cli_json(buf)
    assert jv["mode"] == "bootstrap" and jv["rows"] > 0
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main(jv_args) == 0
    assert _cli_json(buf)["mode"] == "noop"
    assert main(["gc", "--table", table, "--keep", "1"]) == 0


def test_actor_pool_appliers_match_and_cache(changelog, tmp_path):
    """exchange='actor' (stateful shard appliers, reference ST1): same
    final state as the task paths; snapshot cache reused across epochs."""
    import ray

    t = LakeTable(str(tmp_path / "t"), num_partitions=8)
    for f in changelog:
        t.apply_epoch(f, exchange="actor")
    ref = LakeTable(str(tmp_path / "ref"), num_partitions=8)
    for f in changelog:
        ref.apply_epoch(f, exchange="groupby")
    assert t.state_table().equals(ref.state_table())
    # actors hold cached shards
    cached = [p for a in t._actor_pool for p in ray.get(a.cached_parts.remote())]
    assert sorted(cached) == list(range(8))
    # crash-recovery rule: a fresh handle (no pool) still reads committed
    t2 = LakeTable(str(tmp_path / "t"))
    assert t2.state_table().equals(ref.state_table())


def test_mor_layout_matches_cow_and_compacts(changelog, tmp_path):
    """Merge-on-read layout: delta appends + read-side fold produce the
    exact same state as copy-on-write; compaction folds deltas and
    preserves state; inline compaction triggers at the threshold."""
    cow = LakeTable(str(tmp_path / "cow"), num_partitions=8)
    mor = LakeTable(str(tmp_path / "mor"), num_partitions=8, layout="mor")
    for f in changelog:
        cow.apply_epoch(f)
        mor.apply_epoch(f)
    assert mor.state_table().equals(cow.state_table())
    man = mor.current_manifest()
    assert man.stats["layout"] == "mor"
    assert any(v.get("deltas") for v in man.partitions.values())
    # manifest rows bookkeeping matches reality
    assert man.stats["rows"] == mor.state_table().num_rows
    # point lookup + export + read() all fold deltas
    st = mor.state_table()
    r0 = mor.get(st["repo"][0].as_py(), st["path"][0].as_py())
    assert r0.num_rows == 1 and r0["commit"][0].as_py() == st["commit"][0].as_py()
    meta = mor.export_snapshot(str(tmp_path / "ex"))
    assert meta["rows"] == st.num_rows
    assert mor.read().count() == st.num_rows
    # explicit compaction
    r = mor.compact()
    assert r["compacted"] > 0
    mor2 = LakeTable(str(tmp_path / "mor"))
    assert mor2.state_table().equals(cow.state_table())
    assert not any(v.get("deltas") for v in mor2.current_manifest().partitions.values())


def test_mor_inline_compaction_threshold(tmp_path):
    import pyarrow.parquet as _pq

    t = LakeTable(str(tmp_path / "t"), num_partitions=2, layout="mor", compact_threshold=3)
    # 5 epochs of updates to the same key -> deltas must fold inline
    for e in range(1, 6):
        ev = pa.table(
            {
                "repo": ["r"],
                "path": ["a"],
                "commit": [f"c{e:010d}"],
                "seq": pa.array([e], pa.int64()),
                "op": ["insert" if e == 1 else "update"],
                "content": [f"v{e}"],
            }
        )
        f = str(tmp_path / f"e{e}.parquet")
        _pq.write_table(ev, f)
        t.apply_epoch(f)
    st = t.state_table()
    assert st.num_rows == 1 and st["content"][0].as_py() == "v5"
    man = t.current_manifest()
    n_deltas = max(len(v.get("deltas") or []) for v in man.partitions.values())
    assert n_deltas <= 3  # inline compaction kept the pile bounded


def test_purge_tombstones(tmp_path):
    import pyarrow.parquet as _pq

    t = LakeTable(str(tmp_path / "t"), num_partitions=2)
    e1 = pa.table(
        {
            "repo": ["r", "r"],
            "path": ["a", "b"],
            "commit": ["c0000000001", "c0000000002"],
            "seq": pa.array([1, 2], pa.int64()),
            "op": ["insert", "insert"],
            "content": ["x", "y"],
        }
    )
    e2 = pa.table(
        {
            "repo": ["r"],
            "path": ["a"],
            "commit": ["c0000000003"],
            "seq": pa.array([3], pa.int64()),
            "op": ["delete"],
            "content": pa.array([None], pa.string()),
        }
    )
    _pq.write_table(e1, str(tmp_path / "e1.parquet"))
    _pq.write_table(e2, str(tmp_path / "e2.parquet"))
    t.apply_epoch(str(tmp_path / "e1.parquet"))
    t.apply_epoch(str(tmp_path / "e2.parquet"))
    assert t.state_table().num_rows == 1
    # tombstone still physically present (retention)
    man = t.current_manifest()
    raw = pa.concat_tables(
        [_pq.read_table(f) for f in man.data_files(str(tmp_path / "t"))]
    )
    assert raw.num_rows == 2
    # purge with horizon 0: tombstones older than current epoch - 0 drop
    r = t.purge_tombstones(older_than_epochs=0)
    assert r["purged"] == 1
    man2 = t.current_manifest()
    raw2 = pa.concat_tables(
        [_pq.read_table(f) for f in man2.data_files(str(tmp_path / "t"))]
    )
    assert raw2.num_rows == 1
    assert t.state_table().num_rows == 1  # live state unchanged


def test_time_travel_reads(changelog, tmp_path):
    t = LakeTable(str(tmp_path / "t"), num_partitions=8)
    states = {}
    for i, f in enumerate(changelog, start=1):
        t.apply_epoch(f)
        states[i] = t.state_table()
    hist = t.history()
    assert [h["epoch"] for h in hist] == [1, 2, 3]
    for e in (1, 2, 3):
        assert t.state_table_at(e).equals(states[e])
    with pytest.raises(ValueError):
        t.state_table_at(99)


def test_lineage_throughput_and_dataset(changelog, tmp_path):
    t = LakeTable(str(tmp_path / "t"), num_partitions=8)
    r = t.apply_epoch(changelog[0])
    assert r["throughput"]["events_in"] > 0
    assert r["throughput"]["duration_sec"] > 0
    assert r["throughput"]["events_per_sec"] > 0
    t.apply_epoch(changelog[1])
    ds = t.lineage_dataset()
    df = ds.to_pandas()
    assert set(df["epoch"].unique()) == {1, 2}
    assert (df["epoch_duration_sec"] > 0).all()
    assert "events_in" in df.columns and "hwm_commit" in df.columns


def test_rescale_partitions(changelog, tmp_path):
    """Partition-count change via rewrite commit: state identical, new
    epochs keep applying correctly at the new P, replays still drop."""
    t = LakeTable(str(tmp_path / "t"), num_partitions=8)
    t.apply_epoch(changelog[0])
    t.apply_epoch(changelog[1])
    before = t.state_table()
    r = t.rescale(32)
    assert r["num_partitions"] == 32 and r["rows"] == before.num_rows
    assert t.state_table().equals(before)
    # fresh handle picks up new P from the manifest
    t2 = LakeTable(str(tmp_path / "t"))
    assert t2.num_partitions == 32
    # next epoch applies at the new partitioning and matches a clean run
    t2.apply_epoch(changelog[2])
    ref = LakeTable(str(tmp_path / "ref"), num_partitions=8)
    for f in changelog:
        ref.apply_epoch(f)
    a, b = t2.state_table(), ref.state_table()
    assert a.num_rows == b.num_rows and a.equals(b)
    # replay after rescale still de-duplicates
    rr = t2.apply_epoch(changelog[2])
    assert rr["totals"]["inserts"] + rr["totals"]["updates"] + rr["totals"]["deletes"] == 0


def _atomic_copy(src: str, dst: str) -> None:
    """Copy into a tailed directory ATOMICALLY (tmp + rename): the tail
    follower reads files as soon as they appear, and a plain copy could
    expose a truncated parquet mid-write (the changelog producer
    contract — generate_changelog itself writes tmp-then-replace)."""
    import shutil

    tmp = dst + ".tmp"
    shutil.copy(src, tmp)
    os.replace(tmp, dst)


def test_tail_follows_new_epochs(tmp_path):
    import shutil

    src = generate_changelog(str(tmp_path / "full"), n_events=1200, n_epochs=3, seed=21)
    live = str(tmp_path / "live")
    os.makedirs(live)
    # epoch 0 already present; epochs 1-2 "arrive" during the tail
    _atomic_copy(src[0], os.path.join(live, os.path.basename(src[0])))
    t = LakeTable(str(tmp_path / "t"), num_partitions=4)

    import threading, time

    def feeder():
        for f in src[1:]:
            time.sleep(0.8)
            _atomic_copy(f, os.path.join(live, os.path.basename(f)))

    th = threading.Thread(target=feeder)
    th.start()
    results = t.tail(live, poll_seconds=0.5, max_idle_polls=5)
    th.join()
    assert t.current_epoch() == 3
    ref = LakeTable(str(tmp_path / "ref"), num_partitions=4)
    for f in src:
        ref.apply_epoch(f)
    assert t.state_table().equals(ref.state_table())


def test_tail_sharded_epoch_appears_atomically(tmp_path):
    """Regression (VERDICT r2 engine finding): with ``shards_per_epoch>1``
    the generator used to create ``epoch-NNN/`` FIRST and rename shards
    into it one at a time — a tail poll in that window read a partial
    epoch, committed it, and the late shards were silently lost. The
    producer now stages the whole directory as ``epoch-NNN.tmp/`` and
    publishes it with one rename; ``epoch_paths`` ignores ``*.tmp``.
    Replays a slow sharded producer against a live tail and asserts no
    partial commit."""
    import shutil
    import threading
    import time

    from laketide.sources.changelog import epoch_paths

    src = generate_changelog(
        str(tmp_path / "full"), n_events=1600, n_epochs=2, seed=33, shards_per_epoch=4
    )
    assert all(os.path.isdir(f) for f in src)
    live = str(tmp_path / "live")
    os.makedirs(live)

    def publish_slow(epoch_dir: str, delay: float) -> None:
        """The producer protocol under test: stage dir, trickle shards
        in slowly, one rename to publish."""
        dst = os.path.join(live, os.path.basename(epoch_dir))
        stage = dst + ".tmp"
        os.makedirs(stage)
        for s in sorted(os.listdir(epoch_dir)):
            shutil.copy(os.path.join(epoch_dir, s), os.path.join(stage, s))
            time.sleep(delay)
        os.replace(stage, dst)

    publish_slow(src[0], 0.0)
    t = LakeTable(str(tmp_path / "t"), num_partitions=4)

    partials = []

    def feeder():
        publish_slow(src[1], 0.6)  # ~2.4s of staged-but-unpublished window

    def watcher():
        # while the producer trickles shards, the follower must never
        # see the in-flight epoch
        end = time.time() + 2.0
        while time.time() < end:
            seen = epoch_paths(live)
            if any(p.endswith(os.path.basename(src[1])) for p in seen):
                full = {os.path.basename(x) for x in os.listdir(src[1])}
                got = {
                    os.path.basename(x)
                    for x in os.listdir(os.path.join(live, os.path.basename(src[1])))
                }
                if got != full:
                    partials.append(got)
            time.sleep(0.05)

    th = threading.Thread(target=feeder)
    wa = threading.Thread(target=watcher)
    th.start()
    wa.start()
    t.tail(live, poll_seconds=0.25, max_idle_polls=16)
    th.join()
    wa.join()
    assert not partials, f"partial epoch visible to epoch_paths: {partials}"
    assert t.current_epoch() == 2
    ref = LakeTable(str(tmp_path / "ref"), num_partitions=4)
    for f in src:
        ref.apply_epoch(f)
    assert t.state_table().equals(ref.state_table())


def test_multi_format_timestamp_parsing():
    """M13: one column mixing RFC3339-Z, ISO, space-separated and
    date-only layouts parses to timestamp[us]; garbage stays null."""
    import pyarrow.compute as pc

    from laketide.sources.registry import parse_timestamp_multi

    col = pa.array(
        [
            "2024-01-15T10:30:00Z",
            "2024-01-15T10:30:00",
            "2024-01-15 10:30:00",
            "2024-01-15",
            "not-a-date",
            None,
            "2024-01-15T10:30:00.568308Z",  # fractional seconds (OSV-style)
        ]
    )
    out = parse_timestamp_multi(col)
    assert out.type == pa.timestamp("us")
    vals = out.to_pylist()
    assert vals[0] == vals[1] == vals[2]
    assert vals[0].hour == 10 and vals[3].hour == 0
    assert vals[4] is None and vals[5] is None
    assert vals[6].microsecond == 568308 and vals[6].hour == 10


def test_timestamp_normalizer_in_source(tmp_path):
    """A jsonl source column with mixed layouts ingests as a parsed
    payload column via timestamp_normalizer (M13 end-to-end)."""
    import pandas as pd

    from laketide.sources.registry import timestamp_normalizer

    rows = [
        {"repo": "r", "path": "a", "commit": "c0000000001", "seq": 1,
         "op": "insert", "content": "x", "modified": "2024-01-15T10:30:00Z"},
        {"repo": "r", "path": "b", "commit": "c0000000002", "seq": 2,
         "op": "insert", "content": "y", "modified": "2024-01-16"},
    ]
    t = pa.Table.from_pylist(rows)
    norm = timestamp_normalizer(["modified"], base=None)
    out = norm(t)
    assert out["modified"].type == pa.timestamp("us")
    assert out["modified"][0].as_py().day == 15
    assert out["modified"][1].as_py().day == 16


def test_osv_like_nested_source(tmp_path):
    """M7: deeply nested OSV-shaped records (affected[]->package{...})
    project to canonical events and replay through the engine."""
    import json

    from laketide.pipelines.cdc import LakeTable
    from laketide.sources import registry

    recs = [
        {
            "id": "OSV-1",
            "modified": "2024-02-01T00:00:00Z",
            "details": "overflow in frobnicate",
            "affected": [
                {"package": {"ecosystem": "pypi", "name": "frob"},
                 "ranges": [{"events": [{"introduced": "0"}, {"fixed": "1.2"}]}]},
                {"package": {"ecosystem": "npm", "name": "frobjs"},
                 "ranges": [{"events": [{"introduced": "0"}]}]},
            ],
        },
        {
            "id": "OSV-2",
            "modified": "2024-03-05",  # date-only layout (M13 in M7)
            "details": "path traversal",
            "affected": [
                {"package": {"ecosystem": "pypi", "name": "walker"},
                 "ranges": [{"events": [{"introduced": "0"}]}]}
            ],
        },
    ]
    p = str(tmp_path / "osv.jsonl")
    with open(p, "w") as fh:
        for r in recs:
            fh.write(json.dumps(r) + "\n")
    ds = registry.read_source("osv-jsonl", p)
    t = LakeTable(str(tmp_path / "t"), num_partitions=2)
    t.apply_epoch(ds)
    st = t.state_table()
    keys = {(r["repo"], r["path"]): r for r in st.to_pylist()}
    assert set(keys) == {("pypi", "frob"), ("npm", "frobjs"), ("pypi", "walker")}
    assert keys[("pypi", "frob")]["content"] == "overflow in frobnicate"
    # commit derives from the parsed modified timestamp (zero-padded)
    assert keys[("pypi", "walker")]["commit"].startswith("c0")
    # frob modified 2024-02-01 < walker 2024-03-05: commits order by parsed ts
    assert keys[("pypi", "frob")]["commit"] < keys[("pypi", "walker")]["commit"]
    # idempotent replay of the same source
    r2 = t.apply_epoch(ds, epoch_id=t.current_epoch() + 1, hwm_filter=False)
    assert r2["totals"]["stale_dropped"] + r2["totals"]["noops"] > 0
    assert t.state_table().num_rows == 3


def test_gitlab_like_path_derived_source(tmp_path):
    """M8: slug->ecosystem path-derived mapping plus preferred-description
    summary projection, replayed through the engine."""
    import json

    from laketide.pipelines.cdc import LakeTable
    from laketide.sources import registry

    long_desc = (
        "A heap overflow was found in the frob parser. "
        + "Attackers sending crafted input may execute arbitrary code "
        + "under some configurations of the service daemon process tree."
    )
    no_sentence = "x" * 150  # no '. ' boundary -> 97-char truncation
    recs = [
        {"identifier": "GL-1", "package_slug": "gem/rails-html-sanitizer",
         "description": "short desc", "date": "2024-02-01T00:00:00Z"},
        {"identifier": "GL-2", "package_slug": "pip/requests",
         "description": long_desc, "date": "2024-03-05"},
        {"identifier": "GL-3", "package_slug": "go/github.com/acme/frob",
         "description": no_sentence, "date": "2024-03-06 10:00:00"},
        {"identifier": "GL-4", "package_slug": "conan/openssl",
         "description": "unmapped manager passes through", "date": "2024-03-07"},
    ]
    p = str(tmp_path / "gitlab.jsonl")
    with open(p, "w") as fh:
        for r in recs:
            fh.write(json.dumps(r) + "\n")
    ds = registry.read_source("gitlab-jsonl", p)
    t = LakeTable(str(tmp_path / "t"), num_partitions=2)
    t.apply_epoch(ds)
    st = t.state_table()
    keys = {(r["repo"], r["path"]): r for r in st.to_pylist()}
    # slug prefix maps through the ecosystem table; unmapped passes through
    assert set(keys) == {
        ("rubygems", "rails-html-sanitizer"),
        ("pypi", "requests"),
        ("go", "github.com/acme/frob"),
        ("conan", "openssl"),
    }
    # preferred-description rules
    assert keys[("rubygems", "rails-html-sanitizer")]["content"] == "short desc"
    assert (
        keys[("pypi", "requests")]["content"]
        == "A heap overflow was found in the frob parser."
    )
    assert keys[("go", "github.com/acme/frob")]["content"] == "x" * 97 + "..."
    # commit derives from the parsed multi-format date
    assert keys[("pypi", "requests")]["commit"] < keys[("go", "github.com/acme/frob")]["commit"]
    # idempotent replay
    r2 = t.apply_epoch(ds, epoch_id=t.current_epoch() + 1, hwm_filter=False)
    assert r2["totals"]["stale_dropped"] + r2["totals"]["noops"] > 0
    assert t.state_table().num_rows == 4


def test_slug_and_summary_kernels():
    """Vectorized kernel edge cases vs the reference's scalar rules."""
    from laketide.sources.registry import slug_to_ecosystem, summarize_description

    eco = slug_to_ecosystem(
        pa.array(["NPM/x", "maven/a/b", "weird", None, "nuget/p"])
    ).to_pylist()
    assert eco == ["npm", "maven", "weird", "unknown", "nuget"]
    exactly_100 = "y" * 100
    s = summarize_description(
        pa.array([exactly_100, "First bit. More text " + "z" * 100, None])
    ).to_pylist()
    assert s[0] == exactly_100  # <=100 passes through
    assert s[1] == "First bit."
    assert s[2] is None


def test_multi_source_merge_unions_source_tags(tmp_path):
    """The reference's headline merge flow (ingest OSV -> ingest GitLab
    -> the merged record shows source: [osv, gitlab]): two sources emit
    the same key with `sources` tag lists; under merge='coalesce' the
    lists union and scalar fields keep the newest non-null value."""
    import json

    from laketide.pipelines.cdc import LakeTable
    from laketide.sources import registry

    rec = {
        "id": "OSV-9",
        "modified": "2024-02-01T00:00:00Z",
        "details": "overflow",
        "affected": [
            {"package": {"ecosystem": "pypi", "name": "frob"},
             "ranges": [{"events": [{"introduced": "0"}]}]}
        ],
    }
    osv_path = str(tmp_path / "osv.jsonl")
    with open(osv_path, "w") as fh:
        fh.write(json.dumps(rec) + "\n")
    t = LakeTable(str(tmp_path / "t"), num_partitions=2, merge="coalesce")
    t.apply_epoch(registry.read_source("osv-jsonl", osv_path))

    # second source: gitlab-shaped event for the SAME key, newer version,
    # no details (content null -> coalesce keeps the OSV details)
    gl = pa.table(
        {
            "repo": ["pypi"],
            "path": ["frob"],
            "commit": ["c99999999999999999999"],
            "seq": pa.array([1], pa.int64()),
            "op": ["update"],
            "lang": pa.array([None], pa.string()),
            "content": pa.array([None], pa.string()),
            "sources": pa.array([["gitlab"]], pa.list_(pa.string())),
        }
    )
    pq.write_table(gl, str(tmp_path / "gl.parquet"))
    t.apply_epoch(str(tmp_path / "gl.parquet"))
    st = t.state_table()
    assert st.num_rows == 1
    row = st.to_pylist()[0]
    assert sorted(row["sources"]) == ["gitlab", "osv"]
    assert row["content"] == "overflow"      # newest non-null
    assert row["commit"] == "c99999999999999999999"  # version advanced


def test_rescale_hwm_covers_empty_partitions(tmp_path):
    """Regression: the new-partition HWM after rescale must be the MIN
    over ALL old partitions including ones that never saw an event —
    otherwise the first events for keys that hashed to an empty old
    partition are dropped as replays (data loss)."""
    t = LakeTable(str(tmp_path / "t"), num_partitions=8)
    e1 = pa.table(
        {
            "repo": ["r"],
            "path": ["a"],
            "commit": ["c0000000050"],
            "seq": pa.array([50], pa.int64()),
            "op": ["insert"],
            "content": ["x"],
        }
    )
    pq.write_table(e1, str(tmp_path / "e1.parquet"))
    t.apply_epoch(str(tmp_path / "e1.parquet"))  # 7 of 8 partitions stay empty
    t.rescale(2)
    # an event with an OLDER commit for a different key must still apply
    e2 = pa.table(
        {
            "repo": ["other"],
            "path": ["z"],
            "commit": ["c0000000010"],
            "seq": pa.array([10], pa.int64()),
            "op": ["insert"],
            "content": ["y"],
        }
    )
    pq.write_table(e2, str(tmp_path / "e2.parquet"))
    r = t.apply_epoch(str(tmp_path / "e2.parquet"))
    assert r["totals"]["replays_dropped"] == 0
    assert r["totals"]["inserts"] == 1
    assert t.state_table().num_rows == 2


def test_mor_tombstoned_key_reinsert_classified_as_insert(tmp_path):
    """Regression: a MOR base file retains tombstones; a newer insert for
    a dead key must classify as an INSERT (not update) so the rows
    accounting stays correct."""
    t = LakeTable(str(tmp_path / "t"), num_partitions=2, layout="mor", compact_threshold=1)

    def ev(commit, seq, op, content):
        return pa.table(
            {
                "repo": ["r"], "path": ["a"], "commit": [f"c{commit:010d}"],
                "seq": pa.array([seq], pa.int64()), "op": [op],
                "content": pa.array([content], pa.string()),
            }
        )

    for i, (op, content) in enumerate(
        [("insert", "x"), ("delete", None)], start=1
    ):
        f = str(tmp_path / f"e{i}.parquet")
        pq.write_table(ev(i, i, op, content), f)
        t.apply_epoch(f)  # threshold 1 -> compacts each epoch, tombstone in base
    assert t.state_table().num_rows == 0
    f = str(tmp_path / "e3.parquet")
    pq.write_table(ev(3, 3, "insert", "z"), f)
    r = t.apply_epoch(f)
    assert r["totals"]["inserts"] == 1 and r["totals"]["updates"] == 0
    assert r["rows"] == 1
    assert t.state_table().num_rows == 1


def test_actor_exchange_honors_hwm_filter_off(tmp_path):
    """Regression: hwm_filter=False must reach the actor appliers."""
    t = LakeTable(str(tmp_path / "t"), num_partitions=2)
    e1 = pa.table(
        {
            "repo": ["r"], "path": ["a"], "commit": ["c0000000005"],
            "seq": pa.array([5], pa.int64()), "op": ["insert"], "content": ["new"],
        }
    )
    pq.write_table(e1, str(tmp_path / "e1.parquet"))
    t.apply_epoch(str(tmp_path / "e1.parquet"), exchange="actor")
    # older event, filter off: must be processed (then lose to LWW as
    # stale), NOT silently dropped as a replay
    e2 = pa.table(
        {
            "repo": ["r"], "path": ["a"], "commit": ["c0000000002"],
            "seq": pa.array([2], pa.int64()), "op": ["update"], "content": ["old"],
        }
    )
    pq.write_table(e2, str(tmp_path / "e2.parquet"))
    r = t.apply_epoch(str(tmp_path / "e2.parquet"), exchange="actor", hwm_filter=False)
    assert r["totals"]["replays_dropped"] == 0
    assert r["totals"]["stale_dropped"] == 1
    assert t.state_table()["content"][0].as_py() == "new"


def _expected_changes(files, n0, n1):
    def smap(n):
        e = expected_state(files[:n])
        if not hasattr(e, "itertuples"):
            e = e.to_pandas()
        return {(r.repo, r.path): (r.commit, r.seq) for r in e.itertuples()}

    s0, s1 = smap(n0), smap(n1)
    want = {}
    for k in s1:
        if k not in s0:
            want[k] = "insert"
        elif s1[k] != s0[k]:
            want[k] = "update"
    for k in s0:
        if k not in s1:
            want[k] = "delete"
    return want


def test_changes_between_matches_oracle(changelog, tmp_path):
    """Change data feed (aligned partitions) == the diff of the DuckDB
    window-oracle states at the two epochs; self-diff empty; unknown
    epoch raises; postimages carry content, delete preimages too."""
    t = LakeTable(str(tmp_path / "t"), num_partitions=8)
    t.replay(os.path.dirname(changelog[0]))
    ch = t.changes_between(1, 3)
    got = {
        (r.repo, r.path): r.change_type for r in ch.to_pandas().itertuples()
    }
    want = _expected_changes(changelog, 1, 3)
    assert got == want
    assert set(want.values()) == {"insert", "update", "delete"}  # fixture has all
    df = ch.to_pandas()
    assert df[df.change_type != "delete"].content.notna().all()
    # aligned-path deletes carry the full preimage
    assert df[df.change_type == "delete"].content.notna().all()
    # streaming surface: same rows, never concentrated on the driver
    assert t.changes_dataset(1, 3).count() == len(want)
    assert t.changes_between(2, 2).num_rows == 0
    with pytest.raises(ValueError):
        t.changes_between(0, 2)
    with pytest.raises(ValueError):
        t.changes_between(3, 1)


def test_changes_between_across_rescale(tmp_path):
    """Crossing a rescale boundary: skinny old keys re-key through the
    Ray Data exchange; classification still matches the oracle diff
    (delete preimages documented skinny)."""
    files = generate_changelog(str(tmp_path / "log"), n_events=4000, n_epochs=4, seed=5)
    t = LakeTable(str(tmp_path / "t"), num_partitions=8)
    for f in files[:2]:
        t.apply_epoch(f)
    t.rescale(12)
    t2 = LakeTable(str(tmp_path / "t"), num_partitions=12)
    for f in files[2:]:
        t2.apply_epoch(f)
    ch = t2.changes_between(1, 4)
    got = {
        (r.repo, r.path): r.change_type for r in ch.to_pandas().itertuples()
    }
    assert got == _expected_changes(files, 1, 4)


def test_cli_diff(tmp_path):
    from laketide.__main__ import main

    files = generate_changelog(str(tmp_path / "log"), n_events=1500, n_epochs=2, seed=9)
    t = LakeTable(str(tmp_path / "t"), num_partitions=4)
    t.replay(str(tmp_path / "log"))
    out = str(tmp_path / "diff.parquet")
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(
            [
                "diff",
                "--table", str(tmp_path / "t"),
                "--from-epoch", "1",
                "--to-epoch", "2",
                "--out", out,
            ]
        )
    assert rc == 0
    rep = _cli_json(buf)
    want = _expected_changes(files, 1, 2)
    assert rep["changes"] == len(want)
    assert pq.read_table(out).num_rows == len(want)


def test_point_lookup_pushdown_matches_full_scan_both_layouts(changelog, tmp_path):
    """get()'s key-filter pushdown (row-group stat pruning into the
    parquet reads) must equal the full state for EVERY live key on both
    layouts — including MOR keys whose winner lives in a delta file and
    keys that were tombstoned (absent from both)."""
    import os

    for layout in ("cow", "mor"):
        t = LakeTable(str(tmp_path / f"t_{layout}"), num_partitions=8, layout=layout)
        t.replay(os.path.dirname(changelog[0]))
        state = t.state_table().sort_by(
            [("repo", "ascending"), ("path", "ascending")]
        )
        # sample every 25th live key + a known miss
        for i in range(0, state.num_rows, 25):
            repo = state["repo"][i].as_py()
            path = state["path"][i].as_py()
            row = t.get(repo, path)
            assert row.num_rows == 1, (layout, repo, path)
            assert row["commit"][0].as_py() == state["commit"][i].as_py()
            assert row["content"][0].as_py() == state["content"][i].as_py()
        assert t.get("no-such-repo", "nope").num_rows == 0


def test_fsck_detects_orphans_corruption_and_missing_files(tmp_path, changelog):
    """fsck: healthy table passes deep check; stray data files surface
    as orphan WARNINGS (still ok); a truncated footer and a deleted
    referenced file are ERRORS; the CLI exit code distinguishes them."""
    t = LakeTable(str(tmp_path / "t"), num_partitions=8)
    for f in changelog:
        t.apply_epoch(f)
    r = t.fsck(deep=True)
    assert r["ok"] and not r["errors"] and r["files_checked"] >= 1
    assert r["rows_live"] == t.state_table().num_rows

    data_dir = os.path.join(str(tmp_path / "t"), "data")
    with open(os.path.join(data_dir, "stray.parquet"), "wb") as fh:
        fh.write(b"junk")
    r2 = t.fsck()
    assert r2["ok"] and r2["orphans"] >= 1 and r2["warnings"]

    fp = t.current_manifest().data_files(str(tmp_path / "t"))[0]
    keep = open(fp, "rb").read()
    with open(fp, "r+b") as fh:
        fh.truncate(10)
    r3 = t.fsck()
    assert not r3["ok"] and any("unreadable" in e for e in r3["errors"])
    with open(fp, "wb") as fh:
        fh.write(keep)
    os.remove(fp)
    r4 = t.fsck()
    assert not r4["ok"] and any("missing" in e for e in r4["errors"])

    from laketide.__main__ import main

    assert main(["fsck", "--table", str(tmp_path / "t")]) == 2


def test_history_exposes_schema_evolution_timeline(tmp_path):
    """history() carries each epoch's unified column list, so the
    additive-evolution timeline (lang appearing mid-stream) is
    observable from the manifest log alone."""
    files = generate_changelog(
        str(tmp_path / "log"), n_events=1200, n_epochs=3, seed=7, lang_from_epoch=2
    )
    t = LakeTable(str(tmp_path / "t"), num_partitions=4)
    for f in files:
        t.apply_epoch(f)
    hist = t.history()
    by_epoch = {h["epoch"]: h["columns"] for h in hist if h["columns"]}
    # epoch FILES are zero-indexed: lang_from_epoch=2 -> the third file
    # (committed epoch 3) is the first slice carrying lang
    assert "lang" not in by_epoch[1] and "lang" not in by_epoch[2]
    assert "lang" in by_epoch[3]


def test_tail_on_epoch_hook_streams_view_refreshes(tmp_path):
    """tail(on_epoch=...) fires at EVERY commit boundary (never batches
    commits past the hook), and an IncrementalCountView refreshed from
    the hook tracks the live state exactly — the streaming-dashboard
    wiring."""
    import threading
    import time

    from laketide.pipelines.views import IncrementalCountView
    from tests.test_views import _expected, _got

    src = generate_changelog(str(tmp_path / "full"), n_events=1200, n_epochs=3, seed=3)
    live = str(tmp_path / "live")
    os.makedirs(live)
    _atomic_copy(src[0], os.path.join(live, os.path.basename(src[0])))
    t = LakeTable(str(tmp_path / "t"), num_partitions=4)
    view = IncrementalCountView(t, group_col="lang")
    seen: list[tuple] = []

    def on_epoch(table, result):
        view.refresh()
        seen.append((table.current_epoch(), _got(view) == _expected(table)))

    def feeder():
        for f in src[1:]:
            time.sleep(0.8)
            _atomic_copy(f, os.path.join(live, os.path.basename(f)))

    th = threading.Thread(target=feeder)
    th.start()
    t.tail(live, poll_seconds=0.5, max_idle_polls=5, on_epoch=on_epoch)
    th.join()
    assert [e for e, _ in seen] == [1, 2, 3]  # every commit observed
    assert all(ok for _, ok in seen)  # view exact at every boundary


def test_dlq_quarantines_malformed_rows_replayable_after_repair(tmp_path):
    """I6 dead-letter queue: with dlq=True, malformed rows (bad op,
    missing key) land in _dlq/epoch-N/ with their original payload;
    repaired rows replay through apply_epoch; without dlq they are only
    counted. Same behavior on the actor exchange path."""
    bad = pa.table(
        {
            "repo": ["r", None, "r", "r"],
            "path": ["good", "nokey", "badop", "good2"],
            "commit": ["c0000000001"] * 4,
            "seq": pa.array([1, 2, 3, 4], pa.int64()),
            "op": ["insert", "insert", "explode", "insert"],
            "content": ["v1", "v2", "v3", "v4"],
        }
    )
    f = str(tmp_path / "e1.parquet")
    pq.write_table(bad, f)

    t = LakeTable(str(tmp_path / "t"), num_partitions=4, dlq=True)
    r = t.apply_epoch(f)
    assert r["totals"]["malformed"] == 2
    dlq = t.dlq_dataset().to_pandas().sort_values("seq").reset_index(drop=True)
    assert list(dlq["seq"]) == [2, 3]
    assert list(dlq["content"]) == ["v2", "v3"]  # original payload kept
    assert t.state_table().num_rows == 2

    # repair: fix the key and the op, replay as a new epoch
    fixed = pa.table(
        {
            "repo": ["r", "r"],
            "path": ["nokey-fixed", "badop"],
            "commit": ["c0000000002"] * 2,
            "seq": pa.array([5, 6], pa.int64()),
            "op": ["insert", "insert"],
            "content": ["v2", "v3"],
        }
    )
    f2 = str(tmp_path / "e2.parquet")
    pq.write_table(fixed, f2)
    t.apply_epoch(f2)
    assert t.state_table().num_rows == 4

    # actor path writes the DLQ too
    ta = LakeTable(str(tmp_path / "ta"), num_partitions=4, dlq=True)
    ra = ta.apply_epoch(f, exchange="actor")
    assert ra["totals"]["malformed"] == 2
    dlq_a = ta.dlq_dataset(epoch=1).to_pandas()
    assert sorted(dlq_a["seq"]) == [2, 3]

    # dlq disabled: counted, nothing quarantined
    tn = LakeTable(str(tmp_path / "tn"), num_partitions=4)
    tn.apply_epoch(f)
    assert tn.dlq_dataset().count() == 0


def test_dlq_idempotent_replay_sticky_flag_and_purge(tmp_path):
    """DLQ semantics under at-least-once delivery: redelivering an
    applied epoch must NOT duplicate versioned malformed rows (HWM
    dedup applies to the quarantine too); the dlq flag is STICKY via
    the manifest (a later handle without the flag keeps quarantining);
    purge_dlq acknowledges repaired epochs."""
    bad = pa.table(
        {
            "repo": ["r", "r", "r"],
            "path": ["good", "badop", "good2"],
            "commit": ["c0000000001"] * 3,
            "seq": pa.array([1, 2, 3], pa.int64()),
            "op": ["insert", "explode", "insert"],
            "content": ["v1", "v2", "v3"],
        }
    )
    f = str(tmp_path / "e1.parquet")
    pq.write_table(bad, f)
    t = LakeTable(str(tmp_path / "t"), num_partitions=4, dlq=True)
    t.apply_epoch(f)
    assert t.dlq_dataset().count() == 1

    # redeliver the SAME slice as a new epoch: good rows are replay-
    # dropped AND the versioned malformed row is not re-quarantined
    f2 = str(tmp_path / "e2.parquet")
    pq.write_table(bad, f2)
    t2 = LakeTable(str(tmp_path / "t"), num_partitions=4)  # flag omitted
    assert t2.dlq is True  # sticky via manifest
    t2.apply_epoch(f2)
    assert t2.dlq_dataset().count() == 1  # no duplicate

    # acknowledge: purge clears the quarantine
    r = t2.purge_dlq()
    assert r["removed_epoch_dirs"] >= 1
    assert t2.dlq_dataset().count() == 0


def test_fsck_reports_dangling_current_instead_of_dying(tmp_path):
    """A CURRENT that names a missing manifest is the corruption fsck
    exists to REPORT: the constructor must not die on it (fsck returns
    the structured {ok: false} report and the CLI exits 2), while every
    read/write path still refuses to treat the table as empty."""
    bad = pa.table(
        {
            "repo": ["r"],
            "path": ["p"],
            "commit": ["c0000000001"],
            "seq": pa.array([1], pa.int64()),
            "op": ["insert"],
            "content": ["v1"],
        }
    )
    f = str(tmp_path / "e1.parquet")
    pq.write_table(bad, f)
    tdir = str(tmp_path / "t")
    t = LakeTable(tdir, num_partitions=4)
    t.apply_epoch(f)
    # damage: CURRENT names a manifest that does not exist
    with open(os.path.join(tdir, "_manifests", "CURRENT"), "w") as fh:
        fh.write("manifest-999999.json")

    t2 = LakeTable(tdir, num_partitions=4)  # must not raise
    r = t2.fsck()
    assert r["ok"] is False
    assert any("CURRENT" in e for e in r["errors"])
    from laketide.__main__ import main

    assert main(["fsck", "--table", tdir]) == 2
    # write/read paths still refuse (no silent epoch-1 restart)
    with pytest.raises(RuntimeError):
        t2.apply_epoch(f)
    with pytest.raises(RuntimeError):
        t2.state_table()


def test_purge_dlq_never_touches_uncommitted_epoch_dirs(tmp_path):
    """purge_dlq runs under the writer lock and clips its ceiling to the
    committed epoch, so a quarantine dir written by an in-flight epoch
    (present on disk, not yet committed) survives the purge — the DLQ
    never-silently-drop guarantee holds even for a racing Ray-free CLI
    purge."""
    bad = pa.table(
        {
            "repo": ["r", "r"],
            "path": ["good", "badop"],
            "commit": ["c0000000001"] * 2,
            "seq": pa.array([1, 2], pa.int64()),
            "op": ["insert", "explode"],
            "content": ["v1", "v2"],
        }
    )
    f = str(tmp_path / "e1.parquet")
    pq.write_table(bad, f)
    tdir = str(tmp_path / "t")
    t = LakeTable(tdir, num_partitions=4, dlq=True)
    t.apply_epoch(f)  # commits epoch 1, quarantines seq=2

    # simulate an in-flight epoch 2: quarantine written, commit pending
    inflight = os.path.join(tdir, "_dlq", "epoch-000002")
    os.makedirs(inflight)
    pq.write_table(bad.slice(1, 1), os.path.join(inflight, "part-0.parquet"))

    r = t.purge_dlq()  # default: committed epochs only
    assert r["up_to_epoch"] == 1 and r["removed_epoch_dirs"] == 1
    assert os.path.isdir(inflight)  # in-flight quarantine untouched
    # an explicit ceiling above the committed epoch is clipped too
    r2 = t.purge_dlq(up_to_epoch=99)
    assert r2["up_to_epoch"] == 1
    assert os.path.isdir(inflight)


def test_dlq_dataset_dedupes_cross_epoch_redelivery(tmp_path):
    """An epoch whose partition carries ONLY malformed rows never
    advances the HWM, so redelivery re-quarantines the same event under
    a new epoch dir; rows with null identity fields have no HWM at all.
    dlq_dataset must still return each distinct event once."""
    bad = pa.table(
        {
            "repo": ["r", None],
            "path": ["badop", "nokey"],
            "commit": ["c0000000001", None],
            "seq": pa.array([2, None], pa.int64()),
            "op": ["explode", "insert"],
            "content": ["v2", "vnull"],
        }
    )
    f1 = str(tmp_path / "e1.parquet")
    f2 = str(tmp_path / "e2.parquet")
    pq.write_table(bad, f1)
    pq.write_table(bad, f2)
    t = LakeTable(str(tmp_path / "t"), num_partitions=4, dlq=True)
    t.apply_epoch(f1)
    t.apply_epoch(f2)  # redelivery: both rows re-quarantined on disk
    assert len(t._dlq_files(None)) >= 2  # duplicates exist across dirs
    dlq = t.dlq_dataset().to_pandas()
    assert len(dlq) == 2  # ...but the read surface dedupes them
    assert sorted(dlq["content"]) == ["v2", "vnull"]


def test_sync_sources_composed_multi_source(tmp_path, monkeypatch):
    """Composed multi-source sync (reference entry point B): ONE call
    syncs osv-like then gitlab-like sources into one coalesce table,
    each as its own epoch with a per-source processing-stats lineage
    row; the final merged state must match the DuckDB coalesce oracle
    over the union of the normalized event streams. E2 source
    disabling skips with a marked row; unknown names raise before
    anything syncs."""
    import duckdb

    osv_recs = [
        {
            "id": "OSV-1",
            "modified": "2024-02-01T00:00:00Z",
            "details": "overflow in frob",
            "affected": [
                {"package": {"ecosystem": "pypi", "name": "frob"},
                 "ranges": [{"events": [{"introduced": "0"}]}]}
            ],
        },
        {
            "id": "OSV-2",
            "modified": "2024-02-02T00:00:00Z",
            "details": "npm bug",
            "affected": [
                {"package": {"ecosystem": "npm", "name": "leftpadx"},
                 "ranges": [{"events": [{"introduced": "0"}]}]}
            ],
        },
    ]
    # gitlab advisories are NEWER (partition-ordered delivery, the
    # engine's HWM contract); one overlaps OSV-1's key, one is new
    gl_recs = [
        {"identifier": "GL-1", "package_slug": "pypi/frob",
         "description": "Frob advisory. Long tail ignored.",
         "date": "2024-03-01"},
        {"identifier": "GL-2", "package_slug": "go/gadget",
         "description": "Gadget advisory.", "date": "2024-03-02"},
    ]
    osv_path = str(tmp_path / "osv.jsonl")
    gl_path = str(tmp_path / "gl.jsonl")
    with open(osv_path, "w") as fh:
        fh.writelines(json.dumps(r) + "\n" for r in osv_recs)
    with open(gl_path, "w") as fh:
        fh.writelines(json.dumps(r) + "\n" for r in gl_recs)

    t = LakeTable(str(tmp_path / "t"), num_partitions=4, merge="coalesce")
    r = t.sync_sources([("osv-jsonl", osv_path), ("gitlab-jsonl", gl_path)])
    assert r["epochs_applied"] == 2
    stats = t.source_stats()
    assert [(s["source"], s["epoch"]) for s in stats] == [
        ("osv-jsonl", 1),
        ("gitlab-jsonl", 2),
    ]
    assert stats[0]["totals"]["events_in"] == 2
    assert stats[1]["totals"]["events_in"] == 2

    # oracle: DuckDB coalesce fold over the UNION of the normalized
    # streams (same merge contract as the property suite)
    from laketide.functions.reads import collect_tables
    from laketide.sources import registry

    ev = pa.concat_tables(
        [
            pa.concat_tables(collect_tables(registry.read_source(n, p)))
            for n, p in [("osv-jsonl", osv_path), ("gitlab-jsonl", gl_path)]
        ],
        promote_options="default",
    )
    con = duckdb.connect()
    con.register("raw", ev)
    exp = con.execute(
        """
        WITH e AS (
          SELECT *, commit || '-' || lpad(CAST(seq AS VARCHAR), 20, '0') AS vkey
          FROM raw
        ),
        scalars AS (
          SELECT repo, path,
            last_value(commit) OVER w AS commit,
            last_value(lang IGNORE NULLS) OVER w AS lang,
            last_value(content IGNORE NULLS) OVER w AS content
          FROM e
          WINDOW w AS (PARTITION BY repo, path ORDER BY vkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
          QUALIFY row_number() OVER (PARTITION BY repo, path ORDER BY vkey DESC) = 1
        ),
        unions AS (
          SELECT repo, path,
            list_sort(list_distinct(flatten(
              list(sources) FILTER (WHERE sources IS NOT NULL)))) AS sources
          FROM e GROUP BY repo, path
        )
        SELECT s.repo, s.path, s.commit, s.lang, s.content, u.sources
        FROM scalars s JOIN unions u USING (repo, path)
        """
    ).arrow()
    want = {
        (r["repo"], r["path"]): (r["commit"], r["lang"], r["content"], sorted(r["sources"]))
        for r in exp.to_pylist()
    }
    st = t.state_table()
    got = {
        (r["repo"], r["path"]): (r["commit"], r["lang"], r["content"], sorted(r["sources"]))
        for r in st.to_pylist()
    }
    assert got == want
    # the overlapping key merged: both source tags present
    assert sorted(got[("pypi", "frob")][3]) == ["gitlab", "osv"]

    # E2: disabled source skips with a marked row, nothing applied
    monkeypatch.setenv("LAKETIDE_ENABLED_SOURCES", "osv-jsonl,parquet")
    r2 = t.sync_sources([("gitlab-jsonl", gl_path)])
    assert r2["jobs"][0]["skipped"] is True and r2["epochs_applied"] == 0
    monkeypatch.delenv("LAKETIDE_ENABLED_SOURCES")

    # unknown source name raises BEFORE anything syncs
    before = t.current_epoch()
    with pytest.raises(KeyError):
        t.sync_sources([("osv-jsonl", osv_path), ("no-such-source", "x")])
    assert t.current_epoch() == before


def test_skew_aware_exchange_switch(tmp_path):
    """A small (<192MiB) epoch whose rows concentrate in ONE hash
    partition must route to the storage exchange (the sort-based
    groupby would serialize the hot partition in one group sort); a
    uniform epoch of the same size keeps the low-latency groupby. The
    chosen mode is recorded in the commit's throughput lineage."""
    rng = np.random.RandomState(3)

    def make_epoch(path, repos, paths_, n):
        content = [
            rng.bytes(48).hex() for _ in range(n)
        ]  # high-entropy: keeps the file above the sniff floor
        t = pa.table(
            {
                "repo": pa.array(repos, pa.string()),
                "path": pa.array(paths_, pa.string()),
                "commit": pa.array([f"c{i:010d}" for i in range(n)], pa.string()),
                "seq": pa.array(np.arange(n, dtype=np.int64)),
                "op": pa.array(["insert"] * n, pa.string()),
                "content": pa.array(content, pa.string()),
            }
        )
        pq.write_table(t, path)

    n = 120_000
    hot = str(tmp_path / "hot.parquet")
    make_epoch(hot, ["hotrepo"] * n, ["one/path"] * n, n)  # one key -> one partition
    assert os.path.getsize(hot) > (8 << 20)  # above the sniff floor

    t1 = LakeTable(str(tmp_path / "t1"), num_partitions=8)
    r1 = t1.apply_epoch(hot)
    assert r1["throughput"]["exchange"] == "storage"
    assert t1.state_table().num_rows == 1  # newest version of the one key

    uniform = str(tmp_path / "uni.parquet")
    make_epoch(
        uniform,
        [f"r{i % 500}" for i in range(n)],
        [f"p{i % 97}" for i in range(n)],
        n,
    )
    t2 = LakeTable(str(tmp_path / "t2"), num_partitions=8)
    r2 = t2.apply_epoch(uniform)
    assert r2["throughput"]["exchange"] == "groupby"


def test_priority_replay_scheduler_weighted_order_and_stamps(tmp_path):
    """Two tables with pending backlogs drain by weighted round-robin
    (critical=6 : low=1 — the reference's asynq queue weights): the
    critical backlog finishes first but the low job still progresses
    every cycle (no starvation); each applied epoch carries a job
    lineage stamp; final states match the per-changelog oracle."""
    from laketide.pipelines.scheduler import ReplayJob, run_schedule
    from laketide.sources.changelog import expected_state

    crit_files = generate_changelog(
        str(tmp_path / "log_c"), n_events=1600, n_epochs=8, seed=11
    )
    low_files = generate_changelog(
        str(tmp_path / "log_l"), n_events=600, n_epochs=3, seed=12
    )
    tc = LakeTable(str(tmp_path / "tc"), num_partitions=4)
    tl = LakeTable(str(tmp_path / "tl"), num_partitions=4)
    jobs = [
        ReplayJob("bulk", tl, str(tmp_path / "log_l"), priority="low"),
        ReplayJob("hot", tc, str(tmp_path / "log_c"), priority="critical"),
    ]
    r = run_schedule(jobs)
    seq = [(o["job"], o["epoch"]) for o in r["order"]]
    # cycle 1: hot spends its 6 credits, then bulk gets 1; cycle 2:
    # hot drains its last 2, bulk 1; cycle 3: bulk's final epoch
    assert seq == (
        [("hot", i) for i in range(1, 7)]
        + [("bulk", 1)]
        + [("hot", 7), ("hot", 8), ("bulk", 2), ("bulk", 3)]
    )
    assert r["jobs"]["hot"]["epochs_applied"] == 8
    assert r["jobs"]["bulk"]["epochs_applied"] == 3

    # per-job lineage stamps reconstruct the processing-stats table
    stats_c = tc.source_stats()
    assert len(stats_c) == 8 and {s["source"] for s in stats_c} == {"job:hot"}
    assert {s["source"] for s in tl.source_stats()} == {"job:bulk"}

    # final states exact vs the window oracle
    for table, files in ((tc, crit_files), (tl, low_files)):
        exp = expected_state(files).to_pandas()
        st = table.state_table().to_pandas()
        got = dict(zip(zip(st["repo"], st["path"]), st["content"]))
        want = dict(zip(zip(exp["repo"], exp["path"]), exp["content"]))
        assert got == want

    # idempotent: a second run finds nothing pending — and reports ZERO
    # epochs applied (the counter is per-run, not cumulative across runs
    # of the same ReplayJob objects)
    r2 = run_schedule(jobs)
    assert r2["order"] == []
    assert all(j["epochs_applied"] == 0 for j in r2["jobs"].values())

    with pytest.raises(ValueError):
        ReplayJob("x", tc, str(tmp_path / "log_c"), priority="urgent")


def test_scheduler_cadence_skips_not_due_jobs(tmp_path):
    """@daily/@weekly sync-schedule analog (reference config.go:94-108):
    a job whose table synced within its cadence interval is skipped with
    a next_due_in report; once the interval elapses (injected clock) the
    backlog drains. @always jobs are unaffected."""
    from laketide.pipelines.scheduler import ReplayJob, parse_cadence, run_schedule

    assert parse_cadence("@daily") == 86400.0
    assert parse_cadence("@weekly") == 604800.0
    assert parse_cadence("45m") == 2700.0
    with pytest.raises(ValueError):
        parse_cadence("@fortnightly")
    with pytest.raises(ValueError):
        ReplayJob(
            "bad", LakeTable(str(tmp_path / "tb")), str(tmp_path), cadence="often"
        )

    generate_changelog(str(tmp_path / "log_d"), n_events=400, n_epochs=2, seed=31)
    generate_changelog(str(tmp_path / "log_a"), n_events=400, n_epochs=2, seed=32)
    td = LakeTable(str(tmp_path / "td"), num_partitions=4)
    ta = LakeTable(str(tmp_path / "ta"), num_partitions=4)
    daily = ReplayJob("daily", td, str(tmp_path / "log_d"), cadence="@daily")
    always = ReplayJob("always", ta, str(tmp_path / "log_a"))

    # never-synced table is due regardless of cadence
    r = run_schedule([daily, always])
    assert r["jobs"]["daily"]["epochs_applied"] == 2
    assert r["jobs"]["always"]["epochs_applied"] == 2
    last = td.last_applied_at()
    assert last is not None

    # new backlog lands; within the interval the daily job is skipped
    generate_changelog(str(tmp_path / "log_d"), n_events=600, n_epochs=3, seed=31)
    generate_changelog(str(tmp_path / "log_a"), n_events=600, n_epochs=3, seed=32)
    daily2 = ReplayJob("daily", td, str(tmp_path / "log_d"), cadence="@daily")
    always2 = ReplayJob("always", ta, str(tmp_path / "log_a"))
    r2 = run_schedule([daily2, always2], now=last + 3600.0)
    assert r2["jobs"]["daily"]["skipped"] == "not_due"
    assert 0 < r2["jobs"]["daily"]["next_due_in"] <= 86400.0
    assert r2["jobs"]["always"]["epochs_applied"] == 1
    assert all(o["job"] == "always" for o in r2["order"])
    assert td.current_epoch() == 2  # untouched

    # a day later the daily job drains its backlog
    daily3 = ReplayJob("daily", td, str(tmp_path / "log_d"), cadence="@daily")
    r3 = run_schedule([daily3], now=last + 86401.0)
    assert r3["jobs"]["daily"]["epochs_applied"] == 1
    assert td.current_epoch() == 3


def test_tags_pin_epochs_across_gc(changelog, tmp_path):
    """Named snapshot tags: a tagged epoch survives gc (manifest + data
    files pinned) and replays via state_table_at(tag=...); deleting the
    tag releases it to the next gc; fsck flags a manually-dangled tag."""
    t = LakeTable(str(tmp_path / "t"), num_partitions=4)
    t.apply_epoch(changelog[0])
    snap1 = t.state_table()
    assert t.tag("release-1") == {"name": "release-1", "epoch": 1}
    for f in changelog[1:]:
        t.apply_epoch(f)
    r = t.gc(keep_last=1)
    assert r["removed_manifests"] >= 1
    # tagged epoch 1 still replays exactly
    assert t.state_table_at(tag="release-1").equals(snap1)
    assert t.tags() == {"release-1": 1}
    assert t.fsck()["ok"]
    # epoch selector validation
    with pytest.raises(ValueError, match="exactly one"):
        t.state_table_at()
    with pytest.raises(ValueError, match="exactly one"):
        t.state_table_at(1, tag="release-1")
    with pytest.raises(KeyError):
        t.state_table_at(tag="nope")
    with pytest.raises(ValueError, match="invalid tag name"):
        t.tag("../evil")
    with pytest.raises(ValueError, match="not retained"):
        t.tag("gone", epoch=2)  # epoch 2's manifest was gc'd
    # delete -> next gc drops the pinned manifest; time travel now fails
    assert t.delete_tag("release-1") is True
    assert t.delete_tag("release-1") is False
    t.gc(keep_last=1)
    with pytest.raises(ValueError, match="not retained"):
        t.state_table_at(1)
    # manually dangled tag (simulated corruption) -> fsck error
    import laketide.state.manifest as M

    os.makedirs(M.paths(t.table_dir)["tags"], exist_ok=True)
    with open(os.path.join(M.paths(t.table_dir)["tags"], "bad"), "w") as fh:
        fh.write(json.dumps({"epoch": 1, "created_at": 0}))
    rep = t.fsck()
    assert not rep["ok"] and any("tag 'bad'" in e for e in rep["errors"])


def test_tag_cli(changelog, tmp_path):
    import io
    from contextlib import redirect_stdout

    from laketide.__main__ import main

    t = LakeTable(str(tmp_path / "t"), num_partitions=4)
    t.apply_epoch(changelog[0])
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main(["tag", "--table", t.table_dir, "--name", "v1"]) == 0
    assert _cli_json(buf) == {"name": "v1", "epoch": 1}
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main(["tag", "--table", t.table_dir]) == 0
    assert _cli_json(buf) == {"tags": {"v1": 1}}
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main(["tag", "--table", t.table_dir, "--name", "v1", "--delete"]) == 0
    assert _cli_json(buf) == {"deleted": True}


def test_tag_hardening(changelog, tmp_path):
    """Review regressions: delete_tag must not path-traverse; corrupt
    tag files abort gc (not silently unpin) and surface in fsck; .tmp
    names are rejected; tagging works when only a maintenance manifest
    remains for the live epoch (compact + gc)."""
    import laketide.state.manifest as M

    t = LakeTable(str(tmp_path / "t"), num_partitions=4)
    for f in changelog:
        t.apply_epoch(f)
    # path traversal refused (CURRENT must survive)
    with pytest.raises(ValueError, match="invalid tag name"):
        t.delete_tag("../CURRENT")
    with pytest.raises(ValueError, match="invalid tag name"):
        t.delete_tag("/etc/passwd")
    with pytest.raises(ValueError, match="invalid tag name"):
        t.tag("snap.tmp")
    # compact + gc leaves only the maintenance manifest for the live
    # epoch: tagging and time travel must still resolve it
    t.compact()
    t.gc(keep_last=1)
    snap = t.state_table()
    t.tag("release")
    assert t.state_table_at(tag="release").equals(snap)
    # corrupt tag file: gc refuses, fsck reports
    tag_dir = M.paths(t.table_dir)["tags"]
    with open(os.path.join(tag_dir, "broken"), "w") as fh:
        fh.write("{not json")
    with pytest.raises(RuntimeError, match="unreadable tag"):
        t.gc(keep_last=1)
    rep = t.fsck()
    assert not rep["ok"] and any("unreadable tag" in e for e in rep["errors"])
    os.remove(os.path.join(tag_dir, "broken"))
    assert t.fsck()["ok"]


def test_tag_cli_refuses_delete_without_name(changelog, tmp_path):
    import io
    from contextlib import redirect_stdout

    from laketide.__main__ import main

    t = LakeTable(str(tmp_path / "t"), num_partitions=4)
    t.apply_epoch(changelog[0])
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main(["tag", "--table", t.table_dir, "--delete"]) == 2
    assert "error" in _cli_json(buf)


def test_export_tagged_snapshot(changelog, tmp_path):
    """export_snapshot(tag=...) exports the PINNED epoch's state, not
    HEAD — reproducible release exports long after the table moved on
    (and after gc, since the tag pins the manifest)."""
    import pyarrow.parquet as _pq

    t = LakeTable(str(tmp_path / "t"), num_partitions=4)
    t.apply_epoch(changelog[0])
    t.tag("rel1")
    snap1 = t.state_table()
    for f in changelog[1:]:
        t.apply_epoch(f)
    t.gc(keep_last=1)
    r = t.export_snapshot(str(tmp_path / "ex"), tag="rel1")
    assert r["version"] == 1
    snap_dir = str(tmp_path / "ex" / "snapshot-000001")
    got = pa.concat_tables(
        _pq.read_table(os.path.join(snap_dir, f))
        for f in sorted(os.listdir(snap_dir))
        if f.endswith(".parquet")
    )
    key = lambda tbl: sorted(zip(tbl["repo"].to_pylist(), tbl["path"].to_pylist(), tbl["content"].to_pylist()))
    assert key(got) == key(snap1)
    # head export still works alongside
    r2 = t.export_snapshot(str(tmp_path / "ex"))
    assert r2["version"] == t.current_epoch() and r2["version"] != 1


def test_reduce_events_priority_rank_beats_version():
    """merge='priority' (reference R2 literal): the field winner is the
    first non-null by (source rank asc, version desc) — a NEWER CVE
    value loses the content field to an older OSV value; within one
    rank the newest wins; the version columns still advance to the
    newest (commit, seq); sources union-dedup."""
    from laketide.stages.apply import ApplyMetrics, reduce_events

    ev = pa.table(
        {
            "repo": pa.array(["r"] * 4),
            "path": pa.array(["p"] * 4),
            "commit": pa.array(["c1", "c2", "c3", "c4"]),
            "seq": pa.array([1, 2, 3, 4], pa.int64()),
            "op": pa.array(["update"] * 4),
            "content": pa.array(["osv-old", "osv-new", None, "cve-newest"]),
            "lang": pa.array([None, None, "go", None]),
            "sources": pa.array(
                [["osv"], ["osv"], ["cve"], ["cve"]], pa.list_(pa.string())
            ),
        }
    )
    m = ApplyMetrics()
    out = reduce_events(ev, m, "priority")
    assert out.num_rows == 1
    r = out.to_pylist()[0]
    # rank 1 (osv) beats rank 3 (cve) despite cve being newest; within
    # osv the NEWER of the two wins
    assert r["content"] == "osv-new"
    # osv rows have null lang -> the cve value fills it
    assert r["lang"] == "go"
    # version advances to the newest event regardless of field winners
    assert (r["commit"], r["seq"]) == ("c4", 4)
    assert sorted(r["sources"]) == ["cve", "osv"]


def test_priority_field_rank_no_laundering_through_bundled_epoch():
    """A low-rank field value folded into the same epoch as a high-rank
    event must NOT inherit the fold's union min rank when merged onto
    stored state: epoch 1 stores gitlab content (rank 2); epoch 2
    bundles an osv event (rank 1, null content, lang='go') with a cve
    event (rank 3, content). The folded winner's sources-union min rank
    is 1, but the cve content (per-field rank 3) must still LOSE to the
    stored rank-2 content, while lang (supplied by osv, rank 1) fills.
    The _prio_r_ helper columns never persist."""
    from laketide.stages.apply import ApplyMetrics, apply_partition, reduce_events

    def ev_tbl(rows):
        return pa.table(
            {
                "repo": pa.array([r[0] for r in rows]),
                "path": pa.array([r[1] for r in rows]),
                "commit": pa.array([r[2] for r in rows]),
                "seq": pa.array([r[3] for r in rows], pa.int64()),
                "op": pa.array(["update"] * len(rows)),
                "content": pa.array([r[4] for r in rows], pa.string()),
                "lang": pa.array([r[5] for r in rows], pa.string()),
                "sources": pa.array([r[6] for r in rows], pa.list_(pa.string())),
            }
        )

    m = ApplyMetrics()
    e1 = ev_tbl([("r", "p", "c1", 1, "gl-content", None, ["gitlab"])])
    cur = apply_partition(None, reduce_events(e1, m, "priority"), 1, m, "priority")
    e2 = ev_tbl(
        [
            ("r", "p", "c2", 2, None, "go", ["osv"]),
            ("r", "p", "c3", 3, "cve-content", None, ["cve"]),
        ]
    )
    cur = apply_partition(cur, reduce_events(e2, m, "priority"), 2, m, "priority")
    assert cur.num_rows == 1
    row = cur.to_pylist()[0]
    # stored rank-2 content survives the bundled rank-3 value
    assert row["content"] == "gl-content"
    # the rank-1 osv lang fills the stored null
    assert row["lang"] == "go"
    assert sorted(row["sources"]) == ["cve", "gitlab", "osv"]
    # version still advances to the epoch's newest event
    assert (row["commit"], row["seq"]) == ("c3", 3)
    # helper columns are write-side only
    assert not [c for c in cur.column_names if c.startswith("_prio_r_")]


def test_sync_sources_priority_not_arrival_wins(tmp_path):
    """Two-source sync under merge='priority': the gitlab advisory for
    the overlapping key arrives LATER with a newer version, but the
    OSV content still wins (rank 1 < 2) — priority, not arrival,
    decides; the reversed arrival order converges to the same fields.
    Non-overlapping keys pass through, sources union on the merged
    key, and the version advances to the newest event (HWM intact)."""
    osv_recs = [
        {
            "id": "OSV-1",
            "modified": "2024-02-01T00:00:00Z",
            "details": "overflow in frob",
            "affected": [
                {"package": {"ecosystem": "pypi", "name": "frob"},
                 "ranges": [{"events": [{"introduced": "0"}]}]}
            ],
        },
    ]
    gl_recs = [
        {"identifier": "GL-1", "package_slug": "pypi/frob",
         "description": "Frob advisory.", "date": "2024-03-01"},
        {"identifier": "GL-2", "package_slug": "go/gadget",
         "description": "Gadget advisory.", "date": "2024-03-02"},
    ]
    osv_path = str(tmp_path / "osv.jsonl")
    gl_path = str(tmp_path / "gl.jsonl")
    with open(osv_path, "w") as fh:
        fh.writelines(json.dumps(r) + "\n" for r in osv_recs)
    with open(gl_path, "w") as fh:
        fh.writelines(json.dumps(r) + "\n" for r in gl_recs)

    def final_state(jobs):
        t = LakeTable(
            str(tmp_path / ("t-" + "-".join(n for n, _ in jobs))),
            num_partitions=4,
            merge="priority",
        )
        t.sync_sources(jobs)
        return {
            (r["repo"], r["path"]): (r["content"], sorted(r["sources"]), r["commit"])
            for r in t.state_table().to_pylist()
        }

    fwd = final_state([("osv-jsonl", osv_path), ("gitlab-jsonl", gl_path)])
    rev = final_state([("gitlab-jsonl", gl_path), ("osv-jsonl", osv_path)])
    # overlapping key: OSV content wins in BOTH arrival orders
    assert fwd[("pypi", "frob")][0] == "overflow in frob"
    assert rev[("pypi", "frob")][0] == "overflow in frob"
    assert fwd[("pypi", "frob")][1] == ["gitlab", "osv"]
    # the stored version is the newest of the two events either way
    # (gitlab's 2024-03 commit string sorts above osv's 2024-02)
    assert fwd[("pypi", "frob")][2] == rev[("pypi", "frob")][2]
    # non-overlapping gitlab-only key passes through untouched
    assert fwd[("go", "gadget")][0] == "Gadget advisory."
    assert fwd == rev


def test_concurrent_multi_table_schedule_overlaps_and_converges(tmp_path):
    """max_concurrent=2 applies epochs of two DIFFERENT tables
    simultaneously: the started/finished timestamps prove at least one
    overlap, each table's epochs apply strictly in order (per-table
    serialization is structural, so no writer-lock contention), lineage
    stamps carry the job names, and both final states are exact vs the
    per-changelog window oracle."""
    from laketide.pipelines.scheduler import ReplayJob, run_schedule
    from laketide.sources.changelog import expected_state

    a_files = generate_changelog(
        str(tmp_path / "log_a"), n_events=2400, n_epochs=4, seed=21
    )
    b_files = generate_changelog(
        str(tmp_path / "log_b"), n_events=2400, n_epochs=4, seed=22
    )
    ta = LakeTable(str(tmp_path / "ta"), num_partitions=4)
    tb = LakeTable(str(tmp_path / "tb"), num_partitions=4)
    jobs = [
        ReplayJob("alpha", ta, str(tmp_path / "log_a"), priority="critical"),
        ReplayJob("beta", tb, str(tmp_path / "log_b")),
    ]
    r = run_schedule(jobs, max_concurrent=2)
    recs = r["order"]
    assert len(recs) == 8
    # per-table epoch order strictly increasing (serial chain per job)
    for name in ("alpha", "beta"):
        eps = [o["epoch"] for o in recs if o["job"] == name]
        assert eps == sorted(eps) == [1, 2, 3, 4]
    # at least one alpha apply overlapped a beta apply in wall time
    spans = {
        n: [(o["started"], o["finished"]) for o in recs if o["job"] == n]
        for n in ("alpha", "beta")
    }
    overlap = any(
        s1 < f2 and s2 < f1
        for (s1, f1) in spans["alpha"]
        for (s2, f2) in spans["beta"]
    )
    assert overlap, f"no overlapping applies: {spans}"
    assert r["jobs"]["alpha"]["epochs_applied"] == 4
    assert r["jobs"]["beta"]["epochs_applied"] == 4
    # lineage stamps intact per table
    assert {s["source"] for s in ta.source_stats()} == {"job:alpha"}
    assert {s["source"] for s in tb.source_stats()} == {"job:beta"}
    # final states exact vs the oracle, same as a serial drain would be
    for table, files in ((ta, a_files), (tb, b_files)):
        exp = expected_state(files).to_pandas()
        st = table.state_table().to_pandas()
        got = dict(zip(zip(st["repo"], st["path"]), st["content"]))
        want = dict(zip(zip(exp["repo"], exp["path"]), exp["content"]))
        assert got == want
    # idempotent re-run: everything already applied -> no new epochs
    r2 = run_schedule(jobs, max_concurrent=2)
    assert r2["order"] == []


def test_concurrent_schedule_honors_cycles_and_weights(tmp_path):
    """The concurrent drain consumes the SAME weighted credit schedule
    as the serial path: max_cycles=1 grants each job exactly `weight`
    applies (critical 6, low 1) even with slots to spare, and the
    dispatch schedule interleaves by weight so a bulk low-priority
    backfill cannot monopolize a slot."""
    from laketide.pipelines.scheduler import (
        PRIORITY_WEIGHTS,
        ReplayJob,
        _weighted_dispatch,
        run_schedule,
    )

    files_c = generate_changelog(
        str(tmp_path / "log_c"), n_events=1600, n_epochs=8, seed=31
    )
    files_l = generate_changelog(
        str(tmp_path / "log_l"), n_events=600, n_epochs=3, seed=32
    )
    tc = LakeTable(str(tmp_path / "tc"), num_partitions=4)
    tl = LakeTable(str(tmp_path / "tl"), num_partitions=4)
    jobs = [
        ReplayJob("hot", tc, str(tmp_path / "log_c"), priority="critical"),
        ReplayJob("bulk", tl, str(tmp_path / "log_l"), priority="low"),
    ]
    r = run_schedule(jobs, max_cycles=1, max_concurrent=2)
    per_job = {
        n: len([o for o in r["order"] if o["job"] == n]) for n in ("hot", "bulk")
    }
    # one cycle: critical spends its 6 credits (8 pending), low spends 1
    assert per_job == {"hot": 6, "bulk": 1}
    # the dispatch schedule itself is the serial credit walk: 6 hot,
    # 1 bulk, then the remainder in later cycles
    qs = {"hot": [(i, "") for i in range(8)], "bulk": [(i, "") for i in range(3)]}
    sched = [j.name for j in _weighted_dispatch(jobs, qs, max_cycles=1000)]
    assert sched[:7] == ["hot"] * 6 + ["bulk"]
    assert len([s for s in sched if s == "hot"]) == 8
    assert len([s for s in sched if s == "bulk"]) == 3
    assert PRIORITY_WEIGHTS["critical"] == 6 and PRIORITY_WEIGHTS["low"] == 1
    # a second run (no max_cycles bound) drains the remainder in order
    r2 = run_schedule(jobs, max_concurrent=2)
    eps = [o["epoch"] for o in r2["order"] if o["job"] == "hot"]
    assert eps == [7, 8]
    assert tc.current_epoch() == 8 and tl.current_epoch() == 3
    del files_c, files_l


def test_concurrent_schedule_serializes_same_table(tmp_path):
    """Two due jobs pointing at the SAME table dir (a config that drains
    fine serially) must never hold two in-flight applies on that table:
    serialization keys on the table identity, not the job name — before
    the fix the second apply hit the single-writer lock, failed, and
    run_schedule raised. The duplicate job's epochs resolve as
    already-applied no-ops and the final state is oracle-exact."""
    from laketide.pipelines.scheduler import ReplayJob, run_schedule
    from laketide.sources.changelog import expected_state

    files = generate_changelog(
        str(tmp_path / "log"), n_events=1800, n_epochs=3, seed=41
    )
    t = LakeTable(str(tmp_path / "t"), num_partitions=4)
    t2 = LakeTable(str(tmp_path / "t"), num_partitions=4)  # second handle
    jobs = [
        ReplayJob("a", t, str(tmp_path / "log"), priority="critical"),
        ReplayJob("b", t2, str(tmp_path / "log"), priority="default"),
    ]
    r = run_schedule(jobs, max_concurrent=2)
    assert not any("error" in o for o in r["order"])
    exp = {(x["repo"], x["path"]): x["content"] for x in expected_state(files).to_pylist()}
    got = {(x["repo"], x["path"]): x["content"] for x in t.state_table().to_pylist()}
    assert got == exp
    assert t.current_epoch() == 3


def test_priority_replay_null_list_stays_null_and_noop():
    """A re-delivered duplicate event whose list column is null (e.g. a
    schema-evolution column) must be a PURE no-op against a stored null:
    before the fix _row_union turned both-null into [] which flagged a
    change, restamped applied_epoch, and flipped stored NULL -> [] on
    every replay (the invariant that justifies disabling the HWM row
    filter for merge='priority')."""
    from laketide.stages.apply import ApplyMetrics, apply_partition, reduce_events

    def ev_tbl(with_tags: bool):
        cols = {
            "repo": pa.array(["r"]),
            "path": pa.array(["p"]),
            "commit": pa.array(["c1"]),
            "seq": pa.array([1], pa.int64()),
            "op": pa.array(["update"]),
            "content": pa.array(["x"], pa.string()),
            "sources": pa.array([["osv"]], pa.list_(pa.string())),
        }
        if with_tags:
            cols["tags"] = pa.array([None], pa.list_(pa.string()))
        return pa.table(cols)

    m = ApplyMetrics()
    # epoch 1 predates the tags column — the stored row gets NULL tags
    # by schema-evolution conform when epoch 2 introduces the column
    cur = apply_partition(
        None, reduce_events(ev_tbl(False), m, "priority"), 1, m, "priority"
    )
    m2 = ApplyMetrics()
    cur2 = apply_partition(
        cur, reduce_events(ev_tbl(True), m2, "priority"), 2, m2, "priority"
    )
    row = cur2.to_pylist()[0]
    assert row["tags"] is None, "both-null union must stay NULL"
    assert row["applied_epoch"] == 1, "pure replay must not restamp"
    assert m2.updates == 0 and m2.inserts == 0 and m2.deletes == 0


def test_concurrent_schedule_equals_serial_final_state(tmp_path):
    """Property: for ANY job mix, the concurrent drain must converge to
    the same final table states and per-job apply counts as the serial
    weighted drain on an identical copy (concurrency changes wall-clock
    interleaving, never outcomes). Exercises mixed priorities, unequal
    backlogs and a shared bounded max_cycles."""
    from laketide.pipelines.scheduler import ReplayJob, run_schedule

    specs = [
        ("j0", "critical", 5, 51),
        ("j1", "default", 3, 52),
        ("j2", "low", 7, 53),
    ]
    logs = {}
    for name, _, n_epochs, seed in specs:
        logs[name] = str(tmp_path / f"log_{name}")
        generate_changelog(logs[name], n_events=n_epochs * 300, n_epochs=n_epochs, seed=seed)

    def run(mode_dir: str, max_concurrent: int, max_cycles: int):
        tables = {
            name: LakeTable(str(tmp_path / f"{mode_dir}_{name}"), num_partitions=4)
            for name, *_ in specs
        }
        jobs = [
            ReplayJob(name, tables[name], logs[name], priority=prio)
            for name, prio, *_ in specs
        ]
        r = run_schedule(jobs, max_cycles=max_cycles, max_concurrent=max_concurrent)
        counts = {n: len([o for o in r["order"] if o["job"] == n]) for n, *_ in specs}
        states = {
            n: sorted(
                (x["repo"], x["path"], x["content"])
                for x in tables[n].state_table().to_pylist()
            )
            for n, *_ in specs
        }
        return counts, states

    for cycles in (1, 1000):
        c_ser, s_ser = run(f"ser{cycles}", 1, cycles)
        c_con, s_con = run(f"con{cycles}", 3, cycles)
        assert c_con == c_ser, (cycles, c_con, c_ser)
        assert s_con == s_ser, f"state divergence at max_cycles={cycles}"


def test_orc_source_matches_parquet(tmp_path):
    """Same logical events through the ORC source -> identical final
    state as the parquet source (multi-file dir + single-file glob),
    incl. the canonical normalizer's op defaulting."""
    from pyarrow import orc as pa_orc

    rows = [
        {"repo": "r", "path": "a", "commit": "c0000000001", "seq": 1, "op": "insert", "content": "v1"},
        {"repo": "r", "path": "a", "commit": "c0000000002", "seq": 2, "op": None, "content": "v2"},
        {"repo": "r", "path": "b", "commit": "c0000000003", "seq": 3, "op": "insert", "content": "w"},
    ]
    t = pa.Table.from_pylist(rows)
    pq_path = str(tmp_path / "e.parquet")
    pq.write_table(t, pq_path)
    orc_dir = tmp_path / "orc"
    orc_dir.mkdir()
    # two files: parallelism = file count, like the zip member fan-out
    pa_orc.write_table(t.slice(0, 2), str(orc_dir / "part0.orc"))
    pa_orc.write_table(t.slice(2), str(orc_dir / "part1.orc"))

    states = {}
    for fmt, path in [("parquet", pq_path), ("orc", str(orc_dir))]:
        ds = registry.read_source(fmt, path)
        lt = LakeTable(str(tmp_path / f"t_{fmt}"), num_partitions=4)
        lt.apply_epoch(ds)
        st = lt.state_table()
        states[fmt] = {
            (st["repo"][i].as_py(), st["path"][i].as_py()): st["content_sha256"][i].as_py()
            for i in range(st.num_rows)
        }
    assert states["parquet"] == states["orc"]
    assert len(states["orc"]) == 2
    # missing files are a loud error, not an empty dataset
    with pytest.raises(FileNotFoundError):
        registry.read_source("orc", str(tmp_path / "nope"))
