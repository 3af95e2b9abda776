"""Weighted-priority replay scheduler over multiple LakeTables.

Reference analog: the asynq job server's weighted priority queues
(critical/default/low = 6/3/1, /root/reference/internal/jobs/server.go:64-79)
— when several tables' changelogs have pending epochs, the scheduler
drains them by weighted round-robin instead of strict FIFO, so a
critical table's backlog is never starved behind a bulk low-priority
backfill, and a low-priority job still makes progress every cycle
(weights, not preemption).

Execution shape: ONE epoch applies at a time (each ``apply_epoch`` is
already cluster-parallel inside — two concurrent epoch applies would
fight for the same CPUs and the writer locks serialize per table
anyway); priority decides the ORDER epochs drain in. Each applied epoch
carries a ``job:<name>`` lineage stamp via the apply path's source tag,
so ``LakeTable.source_stats()`` reconstructs per-job processing stats
after the fact.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from laketide.pipelines.cdc import LakeTable

__all__ = [
    "ReplayJob",
    "run_schedule",
    "PRIORITY_WEIGHTS",
    "parse_cadence",
]

# reference weights: critical 6, default 3, low 1 (asynq Queues config)
PRIORITY_WEIGHTS = {"critical": 6, "default": 3, "low": 1}

# reference sync schedules: @daily / @weekly per source
# (/root/reference/internal/config/config.go:94-108)
_CADENCE_ALIASES = {
    "@always": 0.0,
    "@hourly": 3600.0,
    "@daily": 86400.0,
    "@weekly": 604800.0,
}


def parse_cadence(spec: str) -> float:
    """Cadence spec -> minimum seconds between syncs. Accepts the
    reference's schedule aliases (``@daily``/``@weekly``, plus
    ``@hourly``/``@always``) or ``<N>s|m|h|d`` intervals."""
    if spec in _CADENCE_ALIASES:
        return _CADENCE_ALIASES[spec]
    unit = {"s": 1.0, "m": 60.0, "h": 3600.0, "d": 86400.0}.get(spec[-1:])
    if unit is not None:
        try:
            n = float(spec[:-1])
        except ValueError:
            n = -1.0
        if n >= 0:
            return n * unit
    raise ValueError(
        f"unknown cadence {spec!r}; one of {sorted(_CADENCE_ALIASES)} "
        "or '<N>s|m|h|d'"
    )


@dataclass
class ReplayJob:
    name: str
    table: LakeTable
    changelog_dir: str
    priority: str = "default"
    cadence: str = "@always"
    applied: list[dict] = field(default_factory=list)

    def __post_init__(self):
        if self.priority not in PRIORITY_WEIGHTS:
            raise ValueError(
                f"job {self.name!r}: unknown priority {self.priority!r}; "
                f"one of {sorted(PRIORITY_WEIGHTS)}"
            )
        parse_cadence(self.cadence)  # fail fast on a bad spec

    def due(self, now: float) -> tuple[bool, float]:
        """(is_due, seconds_until_due) at wall-clock ``now``. A job is
        due when its table has never synced, or the last committed
        epoch's lineage stamp is at least one cadence interval old."""
        interval = parse_cadence(self.cadence)
        if interval <= 0:
            return True, 0.0
        last = self.table.last_applied_at()
        if last is None:
            return True, 0.0
        remaining = (last + interval) - now
        return remaining <= 0, max(0.0, remaining)

    def pending(self) -> list[tuple[int, str]]:
        """(epoch_id, path) for every changelog epoch newer than the
        table's committed epoch — one directory listing per call."""
        from laketide.sources.changelog import epoch_paths

        files = epoch_paths(self.changelog_dir)
        start = self.table.current_epoch()
        return [(i + 1, f) for i, f in enumerate(files) if i + 1 > start]


def run_schedule(
    jobs: list[ReplayJob], max_cycles: int = 1000, now: float | None = None
) -> dict[str, Any]:
    """Drain every DUE job's pending epochs by weighted round-robin:
    each cycle grants each job ``weight`` epoch-application credits,
    spent in descending weight order (ties: job list order). Jobs whose
    cadence (@daily/@weekly/...) has not elapsed since their table's
    last sync are skipped and reported with ``next_due_in`` seconds —
    the reference's per-source sync schedule
    (/root/reference/internal/config/config.go:94-108). ``now`` is
    injectable for deterministic tests; defaults to wall clock. Returns
    the global apply ORDER (the testable contract) plus per-job
    totals."""
    import time as _time

    if now is None:
        now = _time.time()
    order: list[dict] = []
    skipped: dict[str, float] = {}
    due_jobs = []
    for j in jobs:
        is_due, wait = j.due(now)
        if is_due:
            due_jobs.append(j)
        else:
            skipped[j.name] = round(wait, 3)
    jobs = due_jobs
    # job.applied accumulates across runs of the same ReplayJob objects
    # (the natural polling pattern); the report must count THIS run only
    applied_at_entry = {j.name: len(j.applied) for j in jobs}
    queues: dict[str, list[tuple[int, str]]] = {j.name: j.pending() for j in jobs}
    by_weight = sorted(
        jobs, key=lambda j: -PRIORITY_WEIGHTS[j.priority]
    )  # stable: ties keep list order
    for _ in range(max_cycles):
        progressed = False
        for job in by_weight:
            credits = PRIORITY_WEIGHTS[job.priority]
            q = queues[job.name]
            while credits > 0 and q:
                epoch_id, path = q.pop(0)
                r = job.table.apply_epoch(
                    path, epoch_id=epoch_id, source=f"job:{job.name}"
                )
                job.applied.append(r)
                order.append(
                    {"job": job.name, "epoch": epoch_id, "priority": job.priority}
                )
                credits -= 1
                progressed = True
        if not progressed:
            break
    report = {
        j.name: {
            "priority": j.priority,
            "cadence": j.cadence,
            "epochs_applied": len(j.applied) - applied_at_entry[j.name],
            "rows": (
                j.table.current_manifest().stats.get("rows")
                if j.table.current_manifest()
                else 0
            ),
        }
        for j in jobs
    }
    for name, wait in skipped.items():
        report[name] = {"skipped": "not_due", "next_due_in": wait}
    return {"order": order, "jobs": report}
