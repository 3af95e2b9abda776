"""Two-phase, exactly-once Parquet sink state: staging + atomic manifest swap.

Reference analogs (semantics only):
- ``exports`` versioned snapshot manifest table (version, file_path,
  checksum, row count, status):
  /root/reference/migrations/001_initial_schema.up.sql:95-108 (S10)
- idempotent replay via deterministic identity + upsert (I3):
  /root/reference/internal/utils/id_generator.go:67-78 — here
  deterministic staging file names + truncate-on-write + commit only via
  an atomic manifest rename, so a retried Ray task or a crashed epoch
  can never double-apply.
- incremental source offset (only-new-commits pull, I4):
  /root/reference/internal/fetchers/gitlab/fetcher.go:93-115 — here the
  per-partition high-water mark ``(hwm_commit, hwm_seq)`` recorded at
  each commit and used to drop re-delivered (replayed) events.

Layout under ``table_dir``::

    _manifests/manifest-000001.json   # immutable, one per epoch
    _manifests/CURRENT                # name of the live manifest (atomic swap)
    data/part-00007-e000003.parquet   # immutable partition files
    _staging/epoch-000004/part-00007.parquet
    _lineage/epoch-000004.json        # per-partition metrics for the epoch

Crash windows: staging leftovers are recomputed (deterministic,
truncate-on-write); promoted data files without a manifest are simply
overwritten on retry; the swap of CURRENT is the single commit point.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any

__all__ = ["Manifest", "load_current", "commit_manifest", "paths"]


def paths(table_dir: str) -> dict[str, str]:
    return {
        "manifests": os.path.join(table_dir, "_manifests"),
        "current": os.path.join(table_dir, "_manifests", "CURRENT"),
        "data": os.path.join(table_dir, "data"),
        "staging": os.path.join(table_dir, "_staging"),
        "lineage": os.path.join(table_dir, "_lineage"),
        "tags": os.path.join(table_dir, "_tags"),
    }


@dataclass
class Manifest:
    epoch: int
    num_partitions: int
    # str(partition_id) -> {"file": relpath, "rows": int,
    #                       "hwm_commit": str, "hwm_seq": int}
    partitions: dict[str, dict[str, Any]] = field(default_factory=dict)
    schema_names: list[str] = field(default_factory=list)
    stats: dict[str, Any] = field(default_factory=dict)
    parent: int | None = None

    def to_json(self) -> str:
        return json.dumps(
            {
                "format_version": 1,
                "epoch": self.epoch,
                "parent": self.parent,
                "num_partitions": self.num_partitions,
                "partitions": self.partitions,
                "schema_names": self.schema_names,
                "stats": self.stats,
            },
            sort_keys=True,
            indent=1,
        )

    @staticmethod
    def from_json(s: str) -> "Manifest":
        d = json.loads(s)
        return Manifest(
            epoch=d["epoch"],
            parent=d.get("parent"),
            num_partitions=d["num_partitions"],
            partitions=d["partitions"],
            schema_names=d.get("schema_names", []),
            stats=d.get("stats", {}),
        )

    def data_files(self, table_dir: str) -> list[str]:
        return [
            os.path.join(table_dir, p["file"])
            for _, p in sorted(self.partitions.items(), key=lambda kv: int(kv[0]))
            if p.get("file")
        ]

    def hwm(self, part: int) -> tuple[str, int]:
        p = self.partitions.get(str(part))
        if not p:
            return ("", -1)
        return (p.get("hwm_commit", ""), p.get("hwm_seq", -1))


def load_current(table_dir: str) -> Manifest | None:
    """Only a missing CURRENT means 'no table'. A CURRENT that names a
    missing manifest file is CORRUPTION (lost rename, manual damage) and
    must raise — silently returning None would let the next writer
    restart at epoch 1 over existing data."""
    p = paths(table_dir)
    try:
        with open(p["current"]) as f:
            name = f.read().strip()
    except FileNotFoundError:
        return None
    mpath = os.path.join(p["manifests"], name)
    try:
        with open(mpath) as f:
            return Manifest.from_json(f.read())
    except FileNotFoundError:
        raise RuntimeError(
            f"table {table_dir}: CURRENT names missing manifest {name!r} — "
            "refusing to treat an existing table as empty"
        ) from None


def _atomic_write(path: str, data: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    # fsync the DIRECTORY too: without it a power loss can persist a
    # later rename (CURRENT) while losing an earlier one (the manifest
    # file CURRENT names) — the dangling-CURRENT corruption load_current
    # refuses to mask
    dfd = os.open(os.path.dirname(path) or ".", os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def commit_manifest(table_dir: str, manifest: Manifest) -> str:
    """The single atomic commit point: write the immutable manifest file,
    then swap CURRENT to it."""
    p = paths(table_dir)
    os.makedirs(p["manifests"], exist_ok=True)
    name = f"manifest-{manifest.epoch:06d}.json"
    _atomic_write(os.path.join(p["manifests"], name), manifest.to_json())
    _atomic_write(p["current"], name)
    return name


def write_lineage(
    table_dir: str,
    epoch: int,
    rows: list[dict],
    throughput: dict | None = None,
    totals: dict | None = None,
    source: str | None = None,
) -> str:
    """Per-partition lineage + per-epoch throughput metrics (reference
    analog: ``processing_stats``,
    /root/reference/migrations/001_initial_schema.up.sql:75-88).
    ``totals`` is persisted so a replayed already-committed epoch can
    return the same totals a fresh apply did."""
    import time as _time

    p = paths(table_dir)
    os.makedirs(p["lineage"], exist_ok=True)
    out = os.path.join(p["lineage"], f"epoch-{epoch:06d}.json")
    # wall-clock stamp: the scheduler's cadence check (@daily/@weekly)
    # reads "when did this table last sync" from here
    doc = {"epoch": epoch, "partitions": rows, "applied_at": _time.time()}
    if source:
        doc["source"] = source  # per-source processing-stats tag (E1/B)
    if throughput:
        doc["throughput"] = throughput
    if totals is not None:
        doc["totals"] = totals
    _atomic_write(out, json.dumps(doc, sort_keys=True))
    return out


def load_lineage(table_dir: str, epoch: int) -> dict | None:
    p = paths(table_dir)
    try:
        with open(os.path.join(p["lineage"], f"epoch-{epoch:06d}.json")) as f:
            return json.load(f)
    except FileNotFoundError:
        return None
