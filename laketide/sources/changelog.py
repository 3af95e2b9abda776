"""Deterministic synthetic CDC changelog generator + expected-state oracle.

Shapes follow FIXTURES.md §2 / BASELINE.json ``input_hint``: events over a
source-code lake table ``(repo, path, commit, lang, content)`` keyed by
``(repo, path)`` with zero-padded monotonically increasing ``commit``.

Controlled impairments (reference analogs in SURVEY.md §2.8):
- duplicate replays of the same ``(repo, path, commit, seq)`` within an
  epoch (reference: idempotent re-sync, test/test_merge_prevention.go:58-66)
- out-of-order delivery *within* an epoch (reference: no cross-source
  arrival ordering, internal/jobs/server.go:886-904)
- tombstone deletes (reference: DeleteVulnerability,
  sql/vulnerabilities.sql:101-102)
- hot-key skew: Zipf-ish distribution over repos
- additive schema evolution: the ``lang`` column only exists in epoch
  files >= ``lang_from_epoch`` (reference: nullable-summary migration,
  migrations/002_fix_nullable_summary.up.sql:1-6)

Everything is seeded — same arguments, same bytes — so tests, the DuckDB
oracle and the benchmark all agree without any external data.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["generate_changelog", "expected_state", "changelog_dir_for"]


def _content_for(repo: str, path: str, commit: str, salt: int) -> str:
    """Deterministic pseudo-source-code body for a (key, version)."""
    h = (salt * 1103515245 + 12345) & 0x7FFFFFFF
    lines = [f"// {repo}/{path} @ {commit}"]
    for i in range(3 + (h % 5)):
        h = (h * 1103515245 + 12345) & 0x7FFFFFFF
        lines.append(f"fn f_{h % 100000}(x) {{ return x * {h % 997} + {i}; }}")
    return "\n".join(lines)


def _body_pool(pool_size: int, body_lines: int, seed: int) -> list[str]:
    """Precomputed deterministic code bodies: lets the generator emit
    realistically-sized (KB) contents at millions of events/sec. Each
    event's content stays version-unique via its header line."""
    out = []
    h = (seed * 2654435761 + 1) & 0x7FFFFFFF
    for _ in range(pool_size):
        lines = []
        for i in range(body_lines):
            h = (h * 1103515245 + 12345) & 0x7FFFFFFF
            lines.append(
                f"fn f_{h % 100000}(x, y) {{ let v = x * {h % 997} + y - {i}; return v ^ {h % 8191}; }}"
            )
        out.append("\n".join(lines))
    return out


def generate_changelog(
    out_dir: str,
    n_events: int = 10_000,
    seed: int = 42,
    n_repos: int = 20,
    paths_per_repo: int = 60,
    n_epochs: int = 4,
    dup_frac: float = 0.05,
    shuffle_frac: float = 1.0,
    delete_frac: float = 0.08,
    lang_from_epoch: int | None = None,
    langs: tuple[str, ...] = ("py", "go", "rs", "js", "c"),
    shards_per_epoch: int = 1,
    body_lines: int = 0,
    body_pool: int = 1024,
) -> list[str]:
    """Write one changelog slice per epoch under ``out_dir``; return paths.

    ``shards_per_epoch == 1``: a single ``epoch-%03d.parquet`` file.
    ``> 1``: a directory ``epoch-%03d/`` of shard files — the realistic
    WAL-segment layout, and required for parallel reads at scale (a
    single Parquet file is one read task).

    Epoch slices < ``lang_from_epoch`` have NO ``lang`` column at all
    (additive schema evolution mid-stream).
    """
    if lang_from_epoch is None:
        lang_from_epoch = n_epochs // 2
    rng = np.random.RandomState(seed)
    os.makedirs(out_dir, exist_ok=True)

    repos = [f"org{i % 7}/repo{i:03d}" for i in range(n_repos)]
    paths = [f"src/dir{j % 9}/file{j:04d}.x" for j in range(paths_per_repo)]

    # Zipf-ish skew over repos: p(rank r) ~ 1 / (r+1)^1.1  (hot repo 0).
    ranks = np.arange(n_repos, dtype=np.float64)
    probs = 1.0 / np.power(ranks + 1.0, 1.1)
    probs /= probs.sum()

    repo_idx = rng.choice(n_repos, size=n_events, p=probs)
    path_idx = rng.randint(0, paths_per_repo, size=n_events)
    del_draw = rng.rand(n_events)
    salts = rng.randint(0, 1 << 30, size=n_events)
    lang_idx = rng.randint(0, len(langs), size=n_events)

    pool = _body_pool(body_pool, body_lines, seed) if body_lines > 0 else None
    alive: set[tuple[int, int]] = set()
    rows_repo: list[str] = []
    rows_path: list[str] = []
    rows_commit: list[str] = []
    rows_seq: list[int] = []
    rows_op: list[str] = []
    rows_lang: list[str | None] = []
    rows_content: list[str | None] = []

    for i in range(n_events):
        key = (int(repo_idx[i]), int(path_idx[i]))
        repo, path = repos[key[0]], paths[key[1]]
        commit = f"c{i:010d}"
        if key not in alive:
            op = "insert"
            alive.add(key)
        elif del_draw[i] < delete_frac:
            op = "delete"
            alive.discard(key)
        else:
            op = "update"
        rows_repo.append(repo)
        rows_path.append(path)
        rows_commit.append(commit)
        rows_seq.append(i)
        rows_op.append(op)
        if op == "delete":
            rows_lang.append(None)
            rows_content.append(None)
        elif pool is not None:
            rows_lang.append(langs[lang_idx[i]])
            rows_content.append(
                f"// {repo}/{path} @ {commit} #{salts[i]}\n" + pool[salts[i] % len(pool)]
            )
        else:
            rows_lang.append(langs[lang_idx[i]])
            rows_content.append(_content_for(repo, path, commit, int(salts[i])))

    # Slice into epochs, inject in-epoch duplicates, shuffle within epoch.
    files: list[str] = []
    per_epoch = max(1, n_events // n_epochs)
    for e in range(n_epochs):
        # clamp: with n_events < n_epochs the naive ranges run past the
        # row lists; surplus epochs are empty slices
        lo = min(e * per_epoch, n_events)
        hi = n_events if e == n_epochs - 1 else min((e + 1) * per_epoch, n_events)
        idx = np.arange(lo, hi)
        n_dup = int(len(idx) * dup_frac)
        if n_dup:
            dups = rng.choice(idx, size=n_dup, replace=True)
            idx = np.concatenate([idx, dups])
        if shuffle_frac >= 1.0:
            rng.shuffle(idx)
        elif shuffle_frac > 0 and len(idx) > 1:
            # partial disorder: permute only a fraction of positions
            k = max(2, int(len(idx) * shuffle_frac))
            pos = rng.choice(len(idx), size=min(k, len(idx)), replace=False)
            idx[np.sort(pos)] = idx[pos]

        cols: dict[str, pa.Array] = {
            "repo": pa.array([rows_repo[i] for i in idx], pa.string()),
            "path": pa.array([rows_path[i] for i in idx], pa.string()),
            "commit": pa.array([rows_commit[i] for i in idx], pa.string()),
            "seq": pa.array([rows_seq[i] for i in idx], pa.int64()),
            "op": pa.array([rows_op[i] for i in idx], pa.string()),
        }
        if e >= lang_from_epoch:
            cols["lang"] = pa.array([rows_lang[i] for i in idx], pa.string())
        cols["content"] = pa.array([rows_content[i] for i in idx], pa.string())
        table = pa.table(cols)
        if shards_per_epoch <= 1:
            out = os.path.join(out_dir, f"epoch-{e:03d}.parquet")
            tmp = out + ".tmp"
            pq.write_table(table, tmp)
            os.replace(tmp, out)
        else:
            # Sharded epochs must APPEAR atomically: a `tail` poll
            # between the directory creation and the last shard rename
            # would read a partial epoch, commit it, and the late shards
            # would be dropped forever by the epoch<=committed
            # short-circuit. Build the whole directory under a .tmp
            # name, then one os.replace publishes it (epoch_paths
            # ignores *.tmp).
            out = os.path.join(out_dir, f"epoch-{e:03d}")
            stage = out + ".tmp"
            shutil.rmtree(stage, ignore_errors=True)
            # idempotent regeneration: os.replace(dir, dir) raises
            # ENOTEMPTY if the target already exists (a crashed earlier
            # run that published some epochs but never wrote _DONE);
            # clear it so re-running converges instead of failing forever
            shutil.rmtree(out, ignore_errors=True)
            os.makedirs(stage)
            n = table.num_rows
            for s in range(shards_per_epoch):
                lo = n * s // shards_per_epoch
                hi = n * (s + 1) // shards_per_epoch
                shard = table.slice(lo, hi - lo)
                pq.write_table(shard, os.path.join(stage, f"shard-{s:04d}.parquet"))
            os.replace(stage, out)
        files.append(out)
    return files


def expected_state(epoch_files: list[str]) -> pa.Table:
    """Single-threaded oracle: last-writer-wins per key over all epochs,
    tombstones dropped; exact in-epoch duplicates collapse naturally.

    Equivalent DuckDB:
      SELECT * EXCLUDE rn FROM (
        SELECT *, row_number() OVER (
          PARTITION BY repo, path ORDER BY commit DESC, seq DESC) rn
        FROM events) WHERE rn = 1 AND op != 'delete'
    """
    import duckdb
    import glob as _glob

    paths: list[str] = []
    for f in epoch_files:
        if os.path.isdir(f):
            paths.extend(sorted(_glob.glob(os.path.join(f, "*.parquet"))))
        else:
            paths.append(f)
    con = duckdb.connect()
    files_sql = ", ".join(f"'{f}'" for f in paths)
    # `lang` appears mid-stream: a prefix of epochs may not have the
    # column at all (BinderError) — select NULL in its place then
    has_lang = any("lang" in pq.read_schema(f).names for f in paths)
    lang_sel = "lang" if has_lang else "CAST(NULL AS VARCHAR) AS lang"
    q = f"""
        SELECT repo, path, commit, seq, {lang_sel}, content
        FROM (
          SELECT *, row_number() OVER (
            PARTITION BY repo, path ORDER BY commit DESC, seq DESC) rn
          FROM read_parquet([{files_sql}], union_by_name=true)
        ) WHERE rn = 1 AND op != 'delete'
        ORDER BY repo, path
    """
    return con.execute(q).arrow().cast(
        pa.schema(
            [
                ("repo", pa.string()),
                ("path", pa.string()),
                ("commit", pa.string()),
                ("seq", pa.int64()),
                ("lang", pa.string()),
                ("content", pa.string()),
            ]
        )
    )


def changelog_dir_for(tag: str, n_events: int, seed: int = 42, **kw) -> str:
    """Generate (once, cached) a changelog under /tmp keyed by parameters.
    The key uses FULL kwarg names: 2-char truncation made n_repos and
    n_epochs (or body_lines and body_pool) collide and served a stale
    changelog generated with different parameters."""
    extra = "".join(f"-{k}={v}" for k, v in sorted(kw.items()) if not callable(v))
    d = f"/tmp/laketide_changelog/{tag}-n{n_events}-s{seed}{extra}"
    done = os.path.join(d, "_DONE")
    if not os.path.exists(done):
        generate_changelog(d, n_events=n_events, seed=seed, **kw)
        with open(done, "w") as f:
            f.write("ok")
    return d


def epoch_paths(changelog_dir: str) -> list[str]:
    """Epoch slices (files or shard directories) in order."""
    import glob as _glob

    out = sorted(_glob.glob(os.path.join(changelog_dir, "epoch-*")))
    return [
        p
        for p in out
        if not p.endswith(".tmp") and (os.path.isdir(p) or p.endswith(".parquet"))
    ]
