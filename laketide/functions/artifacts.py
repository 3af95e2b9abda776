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
