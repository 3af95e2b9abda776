"""Shared cache-root policy for persisted index artifacts (MinHash
banded signatures, IVF buckets, ...).

Security contract (round-4 advisory): the old fixed, world-writable
``/tmp/laketide_*_index`` roots let another local user pre-create the
parent directory or plant a poisoned ``mh-<fp>/INDEX.json`` that
``from_index=True`` readers would silently trust — the classic /tmp
squatting surface. The default root is therefore a PER-USER directory
created 0700, and an existing root is only trusted if it is a real
directory (not a symlink) owned by the current uid with no group/other
write bits; anything else raises instead of serving attacker-controlled
artifacts. ``LAKETIDE_INDEX_DIR`` overrides the root for shared
multi-user setups where the operator manages permissions.
"""

from __future__ import annotations

import os
import stat as _stat
import tempfile

import pyarrow as pa


def artifact_root(kind: str) -> str:
    """Return (creating if needed) the trusted cache root for ``kind``
    (e.g. "minhash", "ivf"): ``$LAKETIDE_INDEX_DIR/<kind>`` when the
    operator points at a managed location, else a per-user 0700
    directory under the system tempdir."""
    override = os.environ.get("LAKETIDE_INDEX_DIR")
    if override:
        root = os.path.join(override, kind)
        os.makedirs(root, exist_ok=True)
        return root
    base = os.path.join(
        tempfile.gettempdir(), f"laketide-index-{os.getuid()}"
    )
    _ensure_private_dir(base)
    root = os.path.join(base, kind)
    _ensure_private_dir(root)
    return root


def fingerprint_dir(kind: str, prefix: str, src_path: str, salt: str) -> str:
    """Cache location + source fingerprint for a persisted artifact —
    THE one keying policy (source file identity = abspath|size|mtime_ns,
    plus ``salt`` carrying every constant that shapes the rows, so a
    changed corpus or a code-changed shaping constant can never serve
    stale rows). Shared by the MinHash / SimHash / embedding-LSH / IVF
    caches so a future key-policy change happens once."""
    import hashlib

    src = os.path.abspath(src_path)
    st = os.stat(src)
    fp = hashlib.sha256(
        f"{src}|{st.st_size}|{st.st_mtime_ns}|{salt}".encode()
    ).hexdigest()[:16]
    return os.path.join(artifact_root(kind), f"{prefix}-{fp}")


def publish_rows_artifact(final: str, ds_factory, meta: dict) -> str:
    """Persist a Ray Dataset of signature rows as a parquet directory
    plus an ``INDEX.json`` manifest, published with the lake's
    atomic-publish discipline (write into a staging dir, ONE
    ``os.replace``). ``ds_factory`` is called only on a cache miss, so
    the (expensive) signature pass never runs when a published artifact
    already exists. Shared by the MinHash, SimHash and embedding-LSH
    signature caches so the staging/crash semantics cannot drift."""
    return publish_dirs_artifact(final, {"rows": ds_factory}, meta)


def publish_dirs_artifact(final: str, factories: dict, meta: dict) -> str:
    """Multi-directory variant of :func:`publish_rows_artifact` for
    artifacts that persist more than one row set (e.g. the BM25 inverted
    index: ``rows`` = postings, ``doclen`` = per-document lengths).
    ``factories`` maps subdirectory name -> zero-arg Dataset factory,
    each called only on a cache miss; all directories and the manifest
    publish together in ONE ``os.replace`` so a reader can never observe
    a partial index."""
    import json as _json
    import shutil as _sh
    import uuid

    if os.path.exists(os.path.join(final, "INDEX.json")):
        return final
    tmp = f"{final}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    for name, ds_factory in factories.items():
        os.makedirs(os.path.join(tmp, name), exist_ok=True)
        ds_factory().write_parquet(os.path.join(tmp, name))
    with open(os.path.join(tmp, "INDEX.json"), "w") as fh:
        fh.write(_json.dumps(meta, sort_keys=True))
    os.makedirs(os.path.dirname(final), exist_ok=True)
    try:
        os.replace(tmp, final)
    except OSError:
        _sh.rmtree(tmp, ignore_errors=True)
        # only a concurrent build that actually PUBLISHED is benign: any
        # other os.replace failure (permissions, final exists as a plain
        # file) would otherwise return a path the read side silently
        # treats as an empty corpus
        if not os.path.exists(os.path.join(final, "INDEX.json")):
            raise
    return final


def read_artifact_meta(index_dir: str) -> dict:
    """The INDEX.json manifest of a published artifact — the shaping
    constants (n_parts, bands, ...) a reader must match when it combines
    fresh rows with persisted ones (e.g. incremental ingest banding new
    docs into the artifact's bucket_part scheme)."""
    import json as _json

    with open(os.path.join(index_dir, "INDEX.json")) as fh:
        return _json.loads(fh.read())


def read_rows_artifact(
    index_dir: str,
    empty_schema: pa.Schema,
    subdir: str = "rows",
    filter=None,
    columns=None,
):
    """Streaming Dataset over a published artifact's signature rows.
    An empty corpus publishes no parquet files (Ray's write_parquet
    emits nothing at 0 rows) — fall back to the typed empty table.
    Ray-written parquet carries no pandas schema metadata, so the plain
    read is already scrub-clean. ``filter`` (a pyarrow.dataset
    expression) pushes row-group pruning into the read — with rows
    sorted on the filtered column at build time, a probe reads only the
    row groups whose min/max stats overlap the predicate."""
    import glob as _glob

    import ray.data as rd

    files = _glob.glob(os.path.join(index_dir, subdir, "*.parquet"))
    if not files:
        t = empty_schema.empty_table()
        if columns is not None:
            t = t.select(columns)
        return rd.from_arrow(t)
    # SIZE-based block count (reads._READ_BLOCK_BYTES rationale): Ray's
    # default parallelism heuristic shatters a sub-MB artifact into
    # hundreds of blocks, and the downstream bucket groupby inherits
    # that width (sort num_outputs = input blocks)
    from laketide.functions.reads import _READ_BLOCK_BYTES
    import math

    total = sum(os.path.getsize(f) for f in files)
    nb = max(1, math.ceil(total / _READ_BLOCK_BYTES))
    kw = {}
    if filter is not None:
        kw["filter"] = filter
    if columns is not None:
        kw["columns"] = columns
    return rd.read_parquet(files, override_num_blocks=nb, **kw)


def _ensure_private_dir(path: str) -> None:
    """mkdir 0700 with exclusive-ownership verification: never trust a
    pre-existing path unless it is a non-symlink directory owned by us
    with no group/other write access."""
    try:
        os.mkdir(path, 0o700)
        return
    except FileExistsError:
        pass
    st = os.lstat(path)
    if not _stat.S_ISDIR(st.st_mode):
        raise RuntimeError(
            f"artifact cache path {path!r} exists but is not a directory "
            "(possible /tmp squatting) — remove it or set LAKETIDE_INDEX_DIR"
        )
    if st.st_uid != os.getuid():
        raise RuntimeError(
            f"artifact cache dir {path!r} is owned by uid {st.st_uid}, "
            f"not {os.getuid()} — refusing to trust its contents; set "
            "LAKETIDE_INDEX_DIR to a directory you control"
        )
    if st.st_mode & (_stat.S_IWGRP | _stat.S_IWOTH):
        raise RuntimeError(
            f"artifact cache dir {path!r} is group/other-writable — "
            "chmod 700 it or set LAKETIDE_INDEX_DIR"
        )
