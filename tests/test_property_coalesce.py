"""Property-based tests (hypothesis) for merge='coalesce' (R4/R5):
the field-wise fold — newest non-null scalar wins, list columns
union-dedup, tombstones clear — must agree with a DuckDB oracle for
arbitrary event histories delivered in partition order (the HWM
guarantee the engine's replay/tail provide): any number of epochs,
arbitrary shuffling WITHIN each epoch. Ray-free (pure pyarrow)."""

import duckdb
import hypothesis.strategies as st
import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings

from laketide.schema import DELETED_COLUMN
from laketide.stages.apply import ApplyMetrics, apply_partition, reduce_events
from laketide.stages.normalize import sha256_hex_column

KEYS = [("r0", "a"), ("r0", "b"), ("r1", "a"), ("r2", "z")]
LANGS = [None, "py", "go", "rs"]
CONTENTS = [None, "x", "y", "zz"]
TAGSETS = [None, [], ["t1"], ["t1", "t2"], ["t3"]]


@st.composite
def ordered_changelog(draw):
    n = draw(st.integers(min_value=1, max_value=24))
    events = []
    for i in range(n):
        key = draw(st.sampled_from(KEYS))
        op = draw(st.sampled_from(["insert", "update", "update", "delete"]))
        if op == "delete":
            lang = content = tags = None
        else:
            lang = draw(st.sampled_from(LANGS))
            content = draw(st.sampled_from(CONTENTS))
            tags = draw(st.sampled_from(TAGSETS))
        events.append((key[0], key[1], f"c{i:010d}", i, op, lang, content, tags))
    # duplicate replays of events (exact dups collapse in the fold)
    for _ in range(draw(st.integers(min_value=0, max_value=2))):
        events.append(draw(st.sampled_from(events)))
    events.sort(key=lambda r: (r[2], r[3]))
    # ordered epoch split (partition-ordered delivery), shuffle WITHIN
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
    epochs = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        epochs.append(draw(st.permutations(events[lo:hi])))
    return epochs


def _to_table(rows) -> pa.Table:
    t = pa.table(
        {
            "repo": pa.array([r[0] for r in rows], pa.string()),
            "path": pa.array([r[1] for r in rows], pa.string()),
            "commit": pa.array([r[2] for r in rows], pa.string()),
            "seq": pa.array([r[3] for r in rows], pa.int64()),
            "op": pa.array([r[4] for r in rows], pa.string()),
            "lang": pa.array([r[5] for r in rows], pa.string()),
            "content": pa.array([r[6] for r in rows], pa.string()),
            "tags": pa.array([r[7] for r in rows], pa.list_(pa.string())),
        }
    )
    return t.append_column("content_sha256", sha256_hex_column(t["content"]))


ORACLE = """
WITH ev AS (
  SELECT *, commit || '-' || lpad(CAST(seq AS VARCHAR), 20, '0') AS vkey FROM raw
),
dels AS (
  SELECT repo, path, max(vkey) AS dv FROM ev WHERE op = 'delete' GROUP BY repo, path
),
live AS (
  SELECT e.* FROM ev e LEFT JOIN dels d USING (repo, path)
  WHERE d.dv IS NULL OR e.vkey > d.dv
),
scalars AS (
  SELECT repo, path,
    last_value(commit) OVER w AS commit,
    last_value(lang IGNORE NULLS) OVER w AS lang,
    last_value(content IGNORE NULLS) OVER w AS content
  FROM live
  WINDOW w AS (PARTITION BY repo, path ORDER BY vkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
  QUALIFY row_number() OVER (PARTITION BY repo, path ORDER BY vkey DESC) = 1
),
unions AS (
  SELECT repo, path,
    list_sort(list_distinct(flatten(list(tags) FILTER (WHERE tags IS NOT NULL)))) AS tags
  FROM live GROUP BY repo, path
)
SELECT s.repo, s.path, s.commit, s.lang, s.content, u.tags
FROM scalars s JOIN unions u USING (repo, path)
"""


@settings(max_examples=120, deadline=None)
@given(ordered_changelog())
def test_coalesce_fold_matches_duckdb_oracle(epochs):
    cur = None
    for e, rows in enumerate(epochs, start=1):
        if not rows:
            continue
        ev = _to_table(rows)
        m = ApplyMetrics()
        winners = reduce_events(ev, m, "coalesce")
        cur = apply_partition(cur, winners, e, m, "coalesce")

    got = set()
    if cur is not None:
        live = cur.filter(pc.invert(pc.fill_null(cur[DELETED_COLUMN], False)))
        for r in live.to_pylist():
            got.add(
                (
                    r["repo"], r["path"], r["commit"], r["lang"], r["content"],
                    tuple(sorted(r["tags"])) if r["tags"] is not None else (),
                )
            )

    con = duckdb.connect()
    con.register("raw", _to_table([r for rows in epochs for r in rows]))
    exp = set()
    for r in con.execute(ORACLE).fetchall():
        exp.add((r[0], r[1], r[2], r[3], r[4], tuple(r[5]) if r[5] else ()))
    assert got == exp
