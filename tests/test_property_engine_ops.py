"""Stateful engine property: ANY interleaving of maintenance operations
(compact / purge / gc / rescale) between replay epochs leaves the table
equal to the DuckDB oracle of the epochs applied so far — on both
layouts. Maintenance must be invisible to the logical state, and the
incrementally-maintained count view must equal a recompute at every
step (compaction/purge must not surface as phantom CDF deltas; rescale
and gc'd base epochs must trigger the bootstrap fallback, never a
wrong incremental answer)."""

import hashlib
import shutil
import tempfile

import hypothesis.strategies as st
import pyarrow as pa
from hypothesis import given, settings

from laketide.pipelines.cdc import LakeTable
from laketide.sources.changelog import expected_state, generate_changelog

_OPS = ["compact", "purge", "gc", "rescale4", "rescale8", "noop"]


def _keymap(tbl: pa.Table) -> dict:
    out = {}
    for i in range(tbl.num_rows):
        ct = tbl["content"][i].as_py()
        out[(tbl["repo"][i].as_py(), tbl["path"][i].as_py())] = (
            tbl["commit"][i].as_py(),
            hashlib.sha256(ct.encode()).hexdigest() if ct is not None else None,
        )
    return out


def _run_op(t: LakeTable, op: str) -> None:
    if op == "compact":
        t.compact()
    elif op == "purge":
        t.purge_tombstones(older_than_epochs=0)
    elif op == "gc":
        t.gc(keep_last=1)
    elif op == "rescale4":
        t.rescale(4)
    elif op == "rescale8":
        t.rescale(8)


@settings(max_examples=6, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=9999),
    ops=st.lists(st.sampled_from(_OPS), min_size=3, max_size=3),
    layout=st.sampled_from(["cow", "mor"]),
)
def test_maintenance_interleaving_preserves_state(seed, ops, layout):
    d = tempfile.mkdtemp(prefix="lt_prop_ops_")
    try:
        files = generate_changelog(
            f"{d}/log", n_events=900, n_epochs=3, seed=seed, delete_frac=0.12
        )
        t = LakeTable(f"{d}/t", num_partitions=8, layout=layout)
        from laketide.pipelines.views import IncrementalCountView

        view = IncrementalCountView(t, group_col="lang")
        for k, f in enumerate(files):
            t.apply_epoch(f)
            _run_op(t, ops[k])
            got = _keymap(t.state_table())
            want = _keymap(expected_state(files[: k + 1]))
            assert got == want, (
                f"state diverged after epoch {k + 1} + {ops[k]} "
                f"(layout={layout}, seed={seed}): "
                f"{len(got)} vs {len(want)} rows"
            )
            view.refresh()
            from tests.test_views import _expected, _got

            assert _got(view) == _expected(t), (
                f"view diverged after epoch {k + 1} + {ops[k]} "
                f"(layout={layout}, seed={seed})"
            )
            # every maintenance op must leave a physically consistent
            # table: all referenced files present with readable footers,
            # bookkeeping row count = folded live rows
            chk = t.fsck(deep=True)
            assert chk["ok"], (
                f"fsck failed after epoch {k + 1} + {ops[k]} "
                f"(layout={layout}, seed={seed}): {chk['errors']}"
            )
        # a fresh handle sees the same committed state
        t2 = LakeTable(f"{d}/t")
        assert _keymap(t2.state_table()) == _keymap(expected_state(files))
    finally:
        shutil.rmtree(d, ignore_errors=True)


@settings(max_examples=6, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=9999),
    ops=st.lists(st.sampled_from(_OPS), min_size=3, max_size=3),
    dim_change_at=st.integers(min_value=0, max_value=3),
    skip_refresh_at=st.integers(min_value=0, max_value=3),
)
def test_join_view_interleaving_matches_join(seed, ops, dim_change_at, skip_refresh_at):
    """Stateful DerivedJoinView property: under ANY interleaving of base
    maintenance ops, skipped refreshes (multi-epoch catch-up spans), a
    mid-run dim change, and a fresh handle at the end, the view equals
    the left join of the expected base state with the current dim."""
    import pyarrow.parquet as pq

    from laketide.pipelines.views import DerivedJoinView

    d = tempfile.mkdtemp(prefix="lt_prop_jv_")
    try:
        files = generate_changelog(
            f"{d}/log", n_events=900, n_epochs=3, seed=seed, delete_frac=0.12
        )
        t = LakeTable(f"{d}/t", num_partitions=8)
        repos = sorted(
            {
                r
                for f in files
                for r in pq.read_table(f, columns=["repo"])["repo"].to_pylist()
            }
        )

        def mk_dim(suffix: str) -> pa.Table:
            return pa.table(
                {
                    "repo": pa.array(repos, pa.string()),
                    "owner": pa.array(
                        [r.split("/")[0] + suffix for r in repos], pa.string()
                    ),
                }
            )

        dim = mk_dim("")
        view = DerivedJoinView(t, f"{d}/v", dim, on="repo")

        def expect(k: int) -> dict:
            dmap = {r["repo"]: r["owner"] for r in dim.to_pylist()}
            exp = expected_state(files[: k + 1])
            return {
                (exp["repo"][i].as_py(), exp["path"][i].as_py()): (
                    exp["content"][i].as_py(),
                    dmap.get(exp["repo"][i].as_py()),
                )
                for i in range(exp.num_rows)
            }

        for k, f in enumerate(files):
            t.apply_epoch(f)
            _run_op(t, ops[k])
            if k == dim_change_at:
                dim = mk_dim("-v2")
                view = DerivedJoinView(t, f"{d}/v", dim, on="repo")
            if k == skip_refresh_at and k < len(files) - 1:
                continue  # skipped refresh: next one covers a 2-epoch span
            view.refresh()
            got = {
                (r["repo"], r["path"]): (r["content"], r["owner"])
                for r in view.state().to_pylist()
            }
            assert got == expect(k), (
                f"join view diverged after epoch {k + 1} + {ops[k]} "
                f"(seed={seed}, dim@{dim_change_at}, skip@{skip_refresh_at})"
            )
            assert view.target.fsck(deep=True)["ok"]
        # fresh handle: noop refresh, same state
        view2 = DerivedJoinView(t, f"{d}/v", dim, on="repo")
        assert view2.refresh()["mode"] == "noop"
        got = {
            (r["repo"], r["path"]): (r["content"], r["owner"])
            for r in view2.state().to_pylist()
        }
        assert got == expect(len(files) - 1)
    finally:
        shutil.rmtree(d, ignore_errors=True)
