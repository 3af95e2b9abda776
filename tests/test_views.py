"""Incremental materialized view maintenance: after every commit epoch
the CDF-refreshed view must equal a full recompute from the live
snapshot — including deletes, updates that MOVE rows between groups
(lang changes), the mid-stream lang schema evolution, and the rescale
fallback (preimages are skinny across a rescale, so refresh must
detect it and bootstrap)."""

import pyarrow as pa
import pyarrow.compute as pc

import laketide
from laketide.pipelines.views import IncrementalCountView


def _expected(table: "laketide.LakeTable") -> dict:
    t = table.state_table()
    if t.num_rows == 0:
        return {}
    size = pc.fill_null(
        pc.cast(pc.utf8_length(pc.cast(t["content"], pa.string())), pa.int64()), 0
    )
    lang = (
        t["lang"] if "lang" in t.column_names else pa.nulls(t.num_rows, pa.string())
    )
    g = (
        pa.table({"g": lang, "n": pa.array([1] * t.num_rows, pa.int64()), "b": size})
        .group_by(["g"])
        .aggregate([("n", "sum"), ("b", "sum")])
    )
    return {
        r["g"]: (r["n_sum"], r["b_sum"]) for r in g.to_pylist() if r["n_sum"] != 0
    }


def _got(view: IncrementalCountView) -> dict:
    t = view.view()
    return {
        r[view.group_col]: (r["n_rows"], r["content_chars"]) for r in t.to_pylist()
    }


def test_incremental_view_matches_recompute_every_epoch(tmp_path):
    files = laketide.generate_changelog(
        str(tmp_path / "log"),
        n_events=4000,
        n_epochs=5,
        seed=17,
        delete_frac=0.1,
        lang_from_epoch=2,  # lang column appears mid-stream
    )
    t = laketide.LakeTable(str(tmp_path / "table"), num_partitions=8)
    view = IncrementalCountView(t, group_col="lang")
    modes = []
    for f in files:
        t.apply_epoch(f)
        r = view.refresh()
        modes.append(r["mode"])
        assert _got(view) == _expected(t), f"epoch {t.current_epoch()}"
    # first refresh bootstraps, the rest are O(changes) incremental
    assert modes[0] == "bootstrap"
    assert set(modes[1:]) == {"incremental"}
    # idempotent refresh at the same epoch
    assert view.refresh()["mode"] == "noop"


def test_incremental_view_bootstraps_across_rescale(tmp_path):
    files = laketide.generate_changelog(
        str(tmp_path / "log"), n_events=2000, n_epochs=3, seed=5
    )
    t = laketide.LakeTable(str(tmp_path / "table"), num_partitions=4)
    view = IncrementalCountView(t, group_col="lang")
    t.apply_epoch(files[0])
    view.refresh()
    t.apply_epoch(files[1])
    t.rescale(8)
    t2 = laketide.LakeTable(str(tmp_path / "table"), num_partitions=8)
    t2.apply_epoch(files[2])
    view.table = t2
    r = view.refresh()
    assert r["mode"] == "bootstrap"  # skinny preimages across rescale
    assert _got(view) == _expected(t2)


def test_cdf_update_preimages_pair(tmp_path):
    """update_preimages=True emits one preimage + one postimage row per
    updated key, with the OLD payload on the preimage."""
    files = laketide.generate_changelog(
        str(tmp_path / "log"), n_events=3000, n_epochs=3, seed=9
    )
    t = laketide.LakeTable(str(tmp_path / "table"), num_partitions=4)
    for f in files:
        t.apply_epoch(f)
    from laketide.functions.reads import collect_tables

    parts = collect_tables(t.changes_dataset(1, 3, update_preimages=True))
    ch = pa.concat_tables(parts, promote_options="default")
    types = set(ch["change_type"].to_pylist())
    assert "update" not in types
    pre = ch.filter(pc.equal(ch["change_type"], "update_preimage"))
    post = ch.filter(pc.equal(ch["change_type"], "update_postimage"))
    assert pre.num_rows == post.num_rows > 0
    # pre/post pair on the same keys, different winner identity
    key = lambda tt: sorted(
        zip(tt["repo"].to_pylist(), tt["path"].to_pylist())
    )
    assert key(pre) == key(post)
    old = t.state_table_at(1)
    old_map = {
        (r["repo"], r["path"]): (r["commit"], r["seq"]) for r in old.to_pylist()
    }
    for r in pre.to_pylist():
        assert old_map[(r["repo"], r["path"])] == (r["commit"], r["seq"])


from laketide.pipelines.views import IncrementalAggView


def _expected_agg(table: "laketide.LakeTable") -> dict:
    t = table.state_table()
    if t.num_rows == 0:
        return {}
    size = pc.fill_null(
        pc.cast(pc.utf8_length(pc.cast(t["content"], pa.string())), pa.int64()), 0
    )
    lang = (
        t["lang"] if "lang" in t.column_names else pa.nulls(t.num_rows, pa.string())
    )
    g = (
        pa.table({"g": lang, "n": pa.array([1] * t.num_rows, pa.int64()), "v": size})
        .group_by(["g"])
        .aggregate([("n", "sum"), ("v", "sum"), ("v", "min"), ("v", "max")])
    )
    return {
        r["g"]: (r["n_sum"], r["v_sum"], r["v_min"], r["v_max"])
        for r in g.to_pylist()
        if r["n_sum"] != 0
    }


def _got_agg(view: IncrementalAggView) -> dict:
    return {
        r[view.group_col]: (r["n_rows"], r["value_sum"], r["value_min"], r["value_max"])
        for r in view.view().to_pylist()
    }


def test_incremental_agg_view_sum_min_max_every_epoch(tmp_path):
    """The sum/min/max generalization must equal a full recompute after
    every epoch — deletes and updates RETRACT extremes (the dirty-group
    recompute path), group-moving updates retract from the old group,
    and the mid-stream lang evolution lands rows in the null group."""
    files = laketide.generate_changelog(
        str(tmp_path / "log"),
        n_events=4000,
        n_epochs=5,
        seed=23,
        delete_frac=0.15,
        lang_from_epoch=2,
    )
    t = laketide.LakeTable(str(tmp_path / "table"), num_partitions=8)
    view = IncrementalAggView(t, group_col="lang", value_col="content", measure="length")
    modes = []
    for f in files:
        t.apply_epoch(f)
        modes.append(view.refresh()["mode"])
        assert _got_agg(view) == _expected_agg(t), f"epoch {t.current_epoch()}"
    assert modes[0] == "bootstrap"
    assert set(modes[1:]) == {"incremental"}
    assert view.refresh()["mode"] == "noop"


def test_incremental_agg_view_bootstraps_across_rescale(tmp_path):
    files = laketide.generate_changelog(
        str(tmp_path / "log"), n_events=2000, n_epochs=3, seed=5
    )
    t = laketide.LakeTable(str(tmp_path / "table"), num_partitions=4)
    view = IncrementalAggView(t, group_col="lang")
    t.apply_epoch(files[0])
    view.refresh()
    t.apply_epoch(files[1])
    t.rescale(8)
    t2 = laketide.LakeTable(str(tmp_path / "table"), num_partitions=8)
    t2.apply_epoch(files[2])
    view.table = t2
    assert view.refresh()["mode"] == "bootstrap"
    assert _got_agg(view) == _expected_agg(t2)


def test_incremental_agg_view_extreme_retraction_recomputes(tmp_path):
    """A delete of the unique group max must shrink value_max (the
    incremental fold alone cannot know the runner-up — asserts the
    filtered-scan recompute engages and is exact); a delete of a
    DUPLICATED extreme must keep it."""
    import pyarrow.parquet as pq

    def ev(path, commit, seq, op, content):
        return dict(repo="r", path=path, commit=commit, seq=seq, op=op, content=content)

    rows1 = [
        ev("a", "c0000000001", 1, "insert", "x" * 10),
        ev("b", "c0000000001", 2, "insert", "x" * 99),   # unique max
        ev("c", "c0000000001", 3, "insert", "x" * 5),    # dup min
        ev("d", "c0000000001", 4, "insert", "x" * 5),    # dup min
    ]
    f1 = str(tmp_path / "e1.parquet")
    pq.write_table(pa.Table.from_pylist(rows1), f1)
    t = laketide.LakeTable(str(tmp_path / "table"), num_partitions=4)
    t.apply_epoch(f1)
    view = IncrementalAggView(t, group_col="lang")
    view.refresh()
    assert _got_agg(view)[None] == (4, 119, 5, 99)

    rows2 = [
        ev("b", "c0000000002", 5, "delete", None),  # retract unique max
        ev("c", "c0000000002", 6, "delete", None),  # retract ONE dup min
    ]
    f2 = str(tmp_path / "e2.parquet")
    pq.write_table(pa.Table.from_pylist(rows2), f2)
    t.apply_epoch(f2)
    r = view.refresh()
    assert r["mode"] == "incremental"
    assert _got_agg(view)[None] == (2, 15, 5, 10)


# ------------------------------------------------------------ DerivedJoinView
def _join_expected(table: "laketide.LakeTable", dim: pa.Table) -> dict:
    """Base live state left-joined to dim: key -> (content, attrs...)."""
    t = table.state_table()
    dmap = {
        r["repo"]: tuple(r[a] for a in dim.column_names if a != "repo")
        for r in dim.to_pylist()
    }
    out = {}
    none_attrs = tuple([None] * (len(dim.column_names) - 1))
    for r in t.to_pylist():
        out[(r["repo"], r["path"])] = (
            r["content"],
            r["commit"],
            r["seq"],
        ) + dmap.get(r["repo"], none_attrs)
    return out


def _join_got(view) -> dict:
    t = view.state()
    attrs = view.attrs
    return {
        (r["repo"], r["path"]): (r["content"], r["base_commit"], r["base_seq"])
        + tuple(r[a] for a in attrs)
        for r in t.to_pylist()
    }


def _mk_dim(files) -> pa.Table:
    import pyarrow.parquet as pq

    repos = sorted(
        {r for f in files for r in pq.read_table(f, columns=["repo"])["repo"].to_pylist()}
    )
    return pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "owner": pa.array([r.split("/")[0] for r in repos], pa.string()),
            "tier": pa.array([int(r[-3:]) % 3 for r in repos], pa.int64()),
        }
    )


def test_derived_join_view_matches_join_every_epoch(tmp_path):
    from laketide.pipelines.views import DerivedJoinView

    files = laketide.generate_changelog(
        str(tmp_path / "log"), n_events=4000, n_epochs=5, seed=23, delete_frac=0.1
    )
    t = laketide.LakeTable(str(tmp_path / "table"), num_partitions=8)
    dim = _mk_dim(files)
    view = DerivedJoinView(t, str(tmp_path / "view"), dim, on="repo")
    modes = []
    for f in files:
        t.apply_epoch(f)
        r = view.refresh()
        modes.append(r["mode"])
        assert _join_got(view) == _join_expected(t, dim), f"epoch {t.current_epoch()}"
    assert modes[0] == "bootstrap" and set(modes[1:]) == {"incremental"}
    # refresh with no new base epoch is a noop (watermark from lineage)
    assert view.refresh()["mode"] == "noop"
    # a FRESH handle on the same dirs adopts the committed watermark
    view2 = DerivedJoinView(t, str(tmp_path / "view"), dim, on="repo")
    assert view2.refresh()["mode"] == "noop"
    assert _join_got(view2) == _join_expected(t, dim)


def test_derived_join_view_bootstrap_across_rescale_with_offline_delete(tmp_path):
    """Rescale while the view is offline + a delete in the same window:
    refresh must bootstrap AND the anti-join pass must tombstone the
    vanished key in the view."""
    from laketide.pipelines.views import DerivedJoinView

    files = laketide.generate_changelog(
        str(tmp_path / "log"), n_events=2000, n_epochs=4, seed=31, delete_frac=0.05
    )
    t = laketide.LakeTable(str(tmp_path / "table"), num_partitions=4)
    dim = _mk_dim(files)
    view = DerivedJoinView(t, str(tmp_path / "view"), dim, on="repo")
    for f in files[:2]:
        t.apply_epoch(f)
    view.refresh()
    assert _join_got(view) == _join_expected(t, dim)
    # offline: delete one live key explicitly, then rescale
    live = t.state_table()
    repo0 = live["repo"][0].as_py()
    path0 = live["path"][0].as_py()
    del_ev = pa.table(
        {
            "repo": pa.array([repo0], pa.string()),
            "path": pa.array([path0], pa.string()),
            "commit": pa.array(["zzzzzzzzzzzzzzzz"], pa.string()),
            "seq": pa.array([0], pa.int64()),
            "op": pa.array(["delete"], pa.string()),
        }
    )
    import ray.data as rd

    t.apply_epoch(rd.from_arrow(del_ev))
    t.apply_epoch(files[2])
    t.rescale(8)
    r = view.refresh()
    assert r["mode"] == "bootstrap"
    got = _join_got(view)
    assert (repo0, path0) not in got
    assert got == _join_expected(t, dim)
    # and incremental refresh keeps working after the rescale
    t.apply_epoch(files[3])
    r = view.refresh()
    assert r["mode"] == "incremental"
    assert _join_got(view) == _join_expected(t, dim)


def test_derived_join_view_double_applied_span_converges(tmp_path):
    """Crash-retry shape: a handle whose watermark read is STALE (the
    refresh committed but this handle never saw it) re-applies the same
    span — the re-applied rows carry a newer generation, apply keeps
    exactly one winner per key, and the state is unchanged. A normal
    refresh afterwards noops."""
    from laketide.pipelines.views import DerivedJoinView

    files = laketide.generate_changelog(
        str(tmp_path / "log"), n_events=1500, n_epochs=3, seed=7, delete_frac=0.1
    )
    t = laketide.LakeTable(str(tmp_path / "table"), num_partitions=4)
    dim = _mk_dim(files)
    view = DerivedJoinView(t, str(tmp_path / "view"), dim, on="repo")
    t.apply_epoch(files[0])
    pre_refresh_watermark = view._applied()  # None: nothing applied yet
    view.refresh()
    t.apply_epoch(files[1])
    stale_watermark = view._applied()  # points at base epoch 1
    view.refresh()
    snap = _join_got(view)
    view_epochs = view.target.current_epoch()
    # simulate the crash-retry: a handle that believes the LAST refresh
    # never happened re-applies the base-1 -> base-2 span onto a target
    # that already has it
    view_b = DerivedJoinView(t, str(tmp_path / "view"), dim, on="repo")
    view_b._applied = lambda: stale_watermark
    r = view_b.refresh()
    assert r["mode"] == "incremental"
    assert _join_got(view_b) == snap == _join_expected(t, dim)
    # and from even further back (pre-bootstrap): full re-apply converges
    view_c = DerivedJoinView(t, str(tmp_path / "view"), dim, on="repo")
    view_c._applied = lambda: pre_refresh_watermark
    r = view_c.refresh()
    assert r["mode"] == "bootstrap"
    assert _join_got(view_c) == snap
    # a normal handle now noops (watermark healed by the retries)
    view_d = DerivedJoinView(t, str(tmp_path / "view"), dim, on="repo")
    assert view_d.refresh()["mode"] == "noop"
    assert view_d.target.current_epoch() == view_epochs + 2


def test_derived_join_view_dim_change_reenriches_all_rows(tmp_path):
    """A CHANGED dim must reach every view row — including keys the base
    never touched again — via the fingerprint-triggered re-enrich (the
    watermark alone would serve stale attributes forever)."""
    from laketide.pipelines.views import DerivedJoinView

    files = laketide.generate_changelog(
        str(tmp_path / "log"), n_events=1500, n_epochs=2, seed=11
    )
    t = laketide.LakeTable(str(tmp_path / "table"), num_partitions=4)
    dim = _mk_dim(files)
    view = DerivedJoinView(t, str(tmp_path / "view"), dim, on="repo")
    for f in files:
        t.apply_epoch(f)
    view.refresh()
    assert _join_got(view) == _join_expected(t, dim)
    # every repo moves to a new owner; base is NOT advanced
    import pyarrow.compute as _pc

    dim2 = dim.set_column(
        dim.column_names.index("owner"),
        "owner",
        _pc.binary_join_element_wise(dim["owner"].combine_chunks(), "-v2", ""),
    )
    view2 = DerivedJoinView(t, str(tmp_path / "view"), dim2, on="repo")
    r = view2.refresh()
    assert r["mode"] == "re-enrich"
    got = _join_got(view2)
    assert got == _join_expected(t, dim2)
    assert all(v[3].endswith("-v2") for v in got.values())
    # same dim again: noop
    assert view2.refresh()["mode"] == "noop"


def test_derived_join_view_rejects_payload_colliding_attrs(tmp_path):
    """A dim attribute shadowing a base PAYLOAD column (only knowable at
    refresh time) must raise, not silently drop the base value."""
    import pytest
    import ray.data as rd

    from laketide.pipelines.views import DerivedJoinView

    t = laketide.LakeTable(str(tmp_path / "table"), num_partitions=2)
    t.apply_epoch(
        rd.from_items(
            [{"repo": "r/a", "path": "p", "commit": "c1", "seq": 1,
              "op": "insert", "lang": "py", "content": "x"}]
        )
    )
    dim = pa.table({"repo": pa.array(["r/a"]), "lang": pa.array(["shadow"])})
    view = DerivedJoinView(t, str(tmp_path / "view"), dim, on="repo")
    with pytest.raises(ValueError, match="payload"):
        view.refresh()


def test_derived_join_view_unknown_repo_gets_null_attrs(tmp_path):
    """Left-join semantics: a base key whose repo is missing from the
    dim keeps the row with null attributes."""
    import ray.data as rd

    from laketide.pipelines.views import DerivedJoinView

    t = laketide.LakeTable(str(tmp_path / "table"), num_partitions=2)
    ev = pa.table(
        {
            "repo": pa.array(["known/r1", "mystery/r9"], pa.string()),
            "path": pa.array(["a", "b"], pa.string()),
            "commit": pa.array(["c1", "c1"], pa.string()),
            "seq": pa.array([1, 2], pa.int64()),
            "op": pa.array(["insert", "insert"], pa.string()),
            "content": pa.array(["x", "y"], pa.string()),
        }
    )
    t.apply_epoch(rd.from_arrow(ev))
    dim = pa.table(
        {
            "repo": pa.array(["known/r1"], pa.string()),
            "owner": pa.array(["known"], pa.string()),
        }
    )
    view = DerivedJoinView(t, str(tmp_path / "view"), dim, on="repo")
    view.refresh()
    got = {r["repo"]: r["owner"] for r in view.state().to_pylist()}
    assert got == {"known/r1": "known", "mystery/r9": None}


def test_derived_join_view_rejects_colliding_attrs(tmp_path):
    from laketide.pipelines.views import DerivedJoinView

    t = laketide.LakeTable(str(tmp_path / "table"), num_partitions=2)
    dim = pa.table({"repo": pa.array(["a"]), "commit": pa.array(["boom"])})
    import pytest

    with pytest.raises(ValueError, match="collide"):
        DerivedJoinView(t, str(tmp_path / "view"), dim, on="repo")


def test_derived_join_view_rejects_duplicate_or_null_dim_keys(tmp_path):
    """Duplicate join-key values are ambiguous (index_in serves the first
    occurrence while the fingerprint canonicalizes by sort — two dims
    could serve different attributes yet hash identically); null keys can
    never match. Both must raise at construction."""
    import pytest

    from laketide.pipelines.views import DerivedJoinView

    t = laketide.LakeTable(str(tmp_path / "table"), num_partitions=2)
    dup = pa.table(
        {
            "repo": pa.array(["r/a", "r/a"], pa.string()),
            "owner": pa.array(["first", "second"], pa.string()),
        }
    )
    with pytest.raises(ValueError, match="duplicate"):
        DerivedJoinView(t, str(tmp_path / "view"), dup, on="repo")
    nullkey = pa.table(
        {
            "repo": pa.array(["r/a", None], pa.string()),
            "owner": pa.array(["x", "y"], pa.string()),
        }
    )
    with pytest.raises(ValueError, match="null"):
        DerivedJoinView(t, str(tmp_path / "view"), nullkey, on="repo")


def test_derived_join_view_pre_fingerprint_watermark_reenriches(tmp_path):
    """A watermark that predates dim fingerprinting (dim_fp=None) must
    not be treated as matching any dim: the refresh forces one re-enrich
    (stamping the current fingerprint) so a dim change that happened
    while the view ran an older build converges instead of silently
    persisting stale attributes."""
    import pyarrow.compute as _pc

    from laketide.pipelines.views import DerivedJoinView

    files = laketide.generate_changelog(
        str(tmp_path / "log"), n_events=800, n_epochs=2, seed=17
    )
    t = laketide.LakeTable(str(tmp_path / "table"), num_partitions=4)
    dim = _mk_dim(files)
    view = DerivedJoinView(t, str(tmp_path / "view"), dim, on="repo")
    for f in files:
        t.apply_epoch(f)
    view.refresh()
    st = view._applied()
    # the dim changed while the view was on a pre-fingerprint build
    dim2 = dim.set_column(
        dim.column_names.index("owner"),
        "owner",
        _pc.binary_join_element_wise(dim["owner"].combine_chunks(), "-v2", ""),
    )
    view_b = DerivedJoinView(t, str(tmp_path / "view"), dim2, on="repo")
    view_b._applied = lambda: (st[0], st[1], None)  # legacy stamp
    r = view_b.refresh()
    assert r["mode"] == "re-enrich"
    got = _join_got(view_b)
    assert got == _join_expected(t, dim2)
    assert all(v[3].endswith("-v2") for v in got.values())
    # the re-enrich stamped the real fingerprint: a fresh handle noops
    view_c = DerivedJoinView(t, str(tmp_path / "view"), dim2, on="repo")
    assert view_c.refresh()["mode"] == "noop"
    # and an UNCHANGED dim on a legacy stamp also converges in one pass
    view_d = DerivedJoinView(t, str(tmp_path / "view"), dim2, on="repo")
    view_d._applied = lambda: (st[0], st[1], None)
    assert view_d.refresh()["mode"] == "re-enrich"
    view_e = DerivedJoinView(t, str(tmp_path / "view"), dim2, on="repo")
    assert view_e.refresh()["mode"] == "noop"
    assert _join_got(view_e) == _join_expected(t, dim2)


def test_derived_join_view_payload_keyed_dim_bootstrap_deletes(tmp_path):
    """Dim keyed on a PAYLOAD column (lang): bootstrap delete-key rows
    carry only (repo, path), so the enrich path must null the lookup
    instead of crashing; final state still matches the join."""
    import ray.data as rd

    from laketide.pipelines.views import DerivedJoinView

    t = laketide.LakeTable(str(tmp_path / "table"), num_partitions=2)

    def ev(repo, path, commit, seq, op, lang=None, content=None):
        return {
            "repo": repo, "path": path, "commit": commit, "seq": seq,
            "op": op, "lang": lang, "content": content,
        }

    t.apply_epoch(rd.from_items([
        ev("r/a", "p1", "c01", 1, "insert", "py", "x"),
        ev("r/a", "p2", "c01", 2, "insert", "go", "y"),
        ev("r/b", "p3", "c01", 3, "insert", "py", "z"),
    ]))
    dim = pa.table(
        {
            "lang": pa.array(["py", "go"], pa.string()),
            "family": pa.array(["scripting", "compiled"], pa.string()),
        }
    )
    view = DerivedJoinView(t, str(tmp_path / "view"), dim, on="lang")
    view.refresh()
    got = {(r["repo"], r["path"]): r["family"] for r in view.state().to_pylist()}
    assert got == {("r/a", "p1"): "scripting", ("r/a", "p2"): "compiled",
                   ("r/b", "p3"): "scripting"}
    # offline delete + rescale -> bootstrap path with skinny delete keys
    t.apply_epoch(rd.from_items([ev("r/a", "p2", "c02", 4, "delete")]))
    t.rescale(4)
    r = view.refresh()
    assert r["mode"] == "bootstrap"
    got = {(r["repo"], r["path"]): r["family"] for r in view.state().to_pylist()}
    assert got == {("r/a", "p1"): "scripting", ("r/b", "p3"): "scripting"}


def test_derived_join_view_refresh_serialized_by_viewlock(tmp_path):
    """The per-target refresh lock: while one refresher holds
    _VIEWLOCK, a second live refresher raises instead of proceeding to
    read a stale generation (the equal-version watermark race)."""
    import ray.data as rd

    from laketide.pipelines.views import DerivedJoinView

    t = laketide.LakeTable(str(tmp_path / "table"), num_partitions=2)
    t.apply_epoch(
        rd.from_items(
            [{"repo": "r/a", "path": "p", "commit": "c1", "seq": 1,
              "op": "insert", "content": "x"}]
        )
    )
    dim = pa.table({"repo": pa.array(["r/a"]), "owner": pa.array(["r"])})
    view = DerivedJoinView(t, str(tmp_path / "view"), dim, on="repo")
    view.refresh()
    held = view.target._acquire_lock("_VIEWLOCK")
    try:
        view_b = DerivedJoinView(t, str(tmp_path / "view"), dim, on="repo")
        import pytest

        with pytest.raises(RuntimeError, match="locked by live writer"):
            view_b.refresh()
    finally:
        view.target._release_lock(held)
    # released: refresh proceeds normally (noop — nothing new)
    assert view.refresh()["mode"] == "noop"
