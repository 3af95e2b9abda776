"""Property-based tests (hypothesis): the pure apply core —
``reduce_events`` + ``apply_partition`` — must agree with a DuckDB
window-function oracle for ARBITRARY interleavings of inserts / updates
/ deletes / exact duplicates / out-of-order deliveries split across any
number of epochs. Runs ray-free (pure pyarrow), so hundreds of examples
are cheap."""

import duckdb
import hypothesis.strategies as st
import pyarrow as pa
from hypothesis import given, settings

from laketide.stages.apply import ApplyMetrics, apply_partition, reduce_events
from laketide.stages.normalize import sha256_hex_column

KEYS = [("r0", "a"), ("r0", "b"), ("r1", "a"), ("r1", "c"), ("r2", "z")]
CONTENTS = ["x", "y", "zz", "www", "x"]  # includes a duplicate content


@st.composite
def changelog(draw):
    n = draw(st.integers(min_value=1, max_value=24))
    events = []
    for i in range(n):
        key = draw(st.sampled_from(KEYS))
        op = draw(st.sampled_from(["insert", "update", "delete"]))
        content = None if op == "delete" else draw(st.sampled_from(CONTENTS))
        events.append((key[0], key[1], f"c{i:010d}", i, op, content))
    # exact duplicate replays
    n_dup = draw(st.integers(min_value=0, max_value=3))
    for _ in range(n_dup):
        events.append(draw(st.sampled_from(events)))
    # arbitrary delivery order
    events = draw(st.permutations(events))
    # arbitrary epoch split points
    n_epochs = draw(st.integers(min_value=1, max_value=3))
    cuts = sorted(
        draw(
            st.lists(
                st.integers(min_value=0, max_value=len(events)),
                min_size=n_epochs - 1,
                max_size=n_epochs - 1,
            )
        )
    )
    bounds = [0] + cuts + [len(events)]
    return [events[lo:hi] for lo, hi in zip(bounds[:-1], bounds[1:])]


def _to_table(rows) -> pa.Table:
    t = pa.table(
        {
            "repo": pa.array([r[0] for r in rows], pa.string()),
            "path": pa.array([r[1] for r in rows], pa.string()),
            "commit": pa.array([r[2] for r in rows], pa.string()),
            "seq": pa.array([r[3] for r in rows], pa.int64()),
            "op": pa.array([r[4] for r in rows], pa.string()),
            "content": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    return t.append_column("content_sha256", sha256_hex_column(t["content"]))


@settings(max_examples=150, deadline=None)
@given(changelog())
def test_apply_core_matches_duckdb_oracle(epochs):
    # engine: fold epoch by epoch through the pure core
    cur = None
    for e, rows in enumerate(epochs, start=1):
        if not rows:
            continue
        ev = _to_table(rows)
        m = ApplyMetrics()
        winners = reduce_events(ev, m)
        cur = apply_partition(cur, winners, e, m)

    got = set()
    if cur is not None:
        # read surface: tombstone rows are retained internally, filtered out
        import pyarrow.compute as pc

        from laketide.schema import DELETED_COLUMN

        cur = cur.filter(pc.invert(pc.fill_null(cur[DELETED_COLUMN], False)))
        for i in range(cur.num_rows):
            got.add(
                (
                    cur["repo"][i].as_py(),
                    cur["path"][i].as_py(),
                    cur["commit"][i].as_py(),
                    cur["content"][i].as_py(),
                )
            )

    # oracle: global LWW over ALL events regardless of epoch split
    all_rows = [r for rows in epochs for r in rows]
    con = duckdb.connect()
    con.register("ev", _to_table(all_rows))
    exp = con.execute(
        """
        SELECT repo, path, commit, content FROM (
          SELECT *, row_number() OVER (
            PARTITION BY repo, path ORDER BY commit DESC, seq DESC) rn
          FROM ev) WHERE rn = 1 AND op != 'delete'
        """
    ).fetchall()
    assert got == set(exp)


@settings(max_examples=100, deadline=None)
@given(changelog())
def test_longest_strategy_matches_duckdb_oracle(epochs):
    """merge='longest' (R6): winner per key = longest content, ties by
    version — same epoch-fold path, DuckDB length-ordered window oracle.
    Deletes rank as length -1 (they only beat an empty history), so the
    oracle ranks all events by (len(content), commit, seq) and keeps the
    key only when the winner is not a delete."""
    cur = None
    for e, rows in enumerate(epochs, start=1):
        if not rows:
            continue
        ev = _to_table(rows)
        m = ApplyMetrics()
        winners = reduce_events(ev, m, "longest")
        cur = apply_partition(cur, winners, e, m, "longest")

    got = set()
    if cur is not None:
        import pyarrow.compute as pc

        from laketide.schema import DELETED_COLUMN

        live = cur.filter(pc.invert(pc.fill_null(cur[DELETED_COLUMN], False)))
        for i in range(live.num_rows):
            got.add(
                (
                    live["repo"][i].as_py(),
                    live["path"][i].as_py(),
                    live["content"][i].as_py(),
                )
            )

    all_rows = [r for rows in epochs for r in rows]
    con = duckdb.connect()
    con.register("ev", _to_table(all_rows))
    exp = con.execute(
        """
        SELECT repo, path, content FROM (
          SELECT *, row_number() OVER (
            PARTITION BY repo, path
            ORDER BY coalesce(length(content), -1) DESC, commit DESC, seq DESC) rn
          FROM ev) WHERE rn = 1 AND op != 'delete'
        """
    ).fetchall()
    assert got == set(exp)
