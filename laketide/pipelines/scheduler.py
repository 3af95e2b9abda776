"""Weighted-priority replay scheduler over multiple LakeTables.

Reference analog: the asynq job server's weighted priority queues
(critical/default/low = 6/3/1, /root/reference/internal/jobs/server.go:64-79)
— when several tables' changelogs have pending epochs, the scheduler
drains them by weighted round-robin instead of strict FIFO, so a
critical table's backlog is never starved behind a bulk low-priority
backfill, and a low-priority job still makes progress every cycle
(weights, not preemption).

Execution shape: by default ONE epoch applies at a time (each
``apply_epoch`` is already cluster-parallel inside); priority decides
the ORDER epochs drain in. ``max_concurrent=k`` allows k epochs from
DIFFERENT tables in flight simultaneously — the reference runs 10
concurrent asynq workers (/root/reference/internal/jobs/server.go:64-79)
and on a large cluster two small tables' applies each leave CPUs idle.
Per-table serialization is structural (one serial drain chain per
table, epochs in order), so the per-table writer lock is never
contended by this scheduler; the CPU share is arbitrated by Ray's
streaming executor, which backpressures the k concurrent Dataset
executions against the shared CPU pool (no static split — an apply
that stalls on I/O donates its CPUs to the others). Each applied epoch
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
    jobs: list[ReplayJob],
    max_cycles: int = 1000,
    now: float | None = None,
    max_concurrent: int = 1,
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
    totals.

    ``max_concurrent > 1`` applies up to that many epochs from
    DIFFERENT tables simultaneously: a worker pool consumes the SAME
    weighted round-robin credit schedule the serial path walks (so
    weights shape the interleaving under slot contention — a bulk
    low-priority backfill cannot monopolize a slot — and ``max_cycles``
    bounds per-job applies identically), with at most one in-flight
    epoch per table. The global ``order`` then records COMPLETION order
    with started/finished timestamps instead of a serial total order —
    per-job epoch order is still strictly increasing, which is the
    correctness contract (per-table serialization is structural, so the
    writer lock never sees two writers for one table from this
    scheduler)."""
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
    if max_concurrent > 1:
        _drain_concurrent(by_weight, queues, order, max_concurrent, max_cycles)
    else:
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
    _raise_first_drain_error(order)
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


def _weighted_dispatch(
    by_weight: list[ReplayJob],
    queues: dict[str, list[tuple[int, str]]],
    max_cycles: int,
) -> list[ReplayJob]:
    """The weighted round-robin DISPATCH schedule — the same credit walk
    the serial path executes (cycle = ``weight`` credits per job, at
    most ``max_cycles`` cycles), flattened into a list of job slots.
    Consuming this list in order is what makes the concurrent mode keep
    the module's fairness contract: under slot contention a critical
    job gets ~6 of every 10 dispatches, a bulk low-priority backfill
    cannot monopolize a slot for its whole queue, and ``max_cycles``
    bounds per-job applies exactly like the serial path."""
    budget = {
        j.name: min(len(queues[j.name]), PRIORITY_WEIGHTS[j.priority] * max_cycles)
        for j in by_weight
    }
    counted = {j.name: 0 for j in by_weight}
    dispatch: list[ReplayJob] = []
    progressed = True
    while progressed:
        progressed = False
        for j in by_weight:
            take = min(
                PRIORITY_WEIGHTS[j.priority], budget[j.name] - counted[j.name]
            )
            if take > 0:
                dispatch.extend([j] * take)
                counted[j.name] += take
                progressed = True
    return dispatch


def _drain_concurrent(
    by_weight: list[ReplayJob],
    queues: dict[str, list[tuple[int, str]]],
    order: list[dict],
    max_concurrent: int,
    max_cycles: int,
) -> None:
    """A pool of ``max_concurrent`` workers consuming the weighted
    dispatch schedule: a worker claims the EARLIEST unclaimed slot whose
    job is not currently mid-apply (per-table serialization is
    structural — one in-flight epoch per table, epochs strictly in
    order, so the writer lock is never contended), applies that job's
    next epoch, and loops. Weights therefore shape the INTERLEAVING
    under contention, not just thread start order, and ``max_cycles``
    bounds per-job applies exactly like the serial path. A failed apply
    stops ITS job's chain (later epochs of that table must not skip a
    hole) and is re-raised by the caller; other tables keep draining."""
    import threading
    import time as _time

    import os as _os

    _settle_fsspec_http_import()
    dispatch = _weighted_dispatch(by_weight, queues, max_cycles)
    # serialization key = the TABLE, not the job name: two due jobs can
    # target one table dir (different changelogs), and concurrent
    # applies there would contend the single-writer lock and fail
    table_of = {
        j.name: _os.path.abspath(j.table.table_dir) for j in by_weight
    }
    # per-job ordered slot indices + a per-job cursor: _claim compares
    # one candidate per job (O(jobs)) instead of rescanning the global
    # dispatch list past busy-skipped holes (O(total_epochs) per claim)
    slots_of: dict[str, list[int]] = {j.name: [] for j in by_weight}
    for i, j in enumerate(dispatch):
        slots_of[j.name].append(i)
    next_of = {j.name: 0 for j in by_weight}
    remaining = [len(dispatch)]
    busy: set[str] = set()
    failed: set[str] = set()
    cv = threading.Condition()

    def _claim() -> ReplayJob | None:
        # under cv: the job holding the EARLIEST runnable dispatch slot
        # (weighted interleaving preserved); a failed or drained job's
        # remaining slots are dropped in passing so the pool terminates
        best_i, best_j = None, None
        for j in by_weight:
            k = next_of[j.name]
            n_slots = len(slots_of[j.name])
            if k >= n_slots:
                continue
            if j.name in failed or not queues[j.name]:
                remaining[0] -= n_slots - k
                next_of[j.name] = n_slots
                continue
            if table_of[j.name] in busy:
                continue
            i = slots_of[j.name][k]
            if best_i is None or i < best_i:
                best_i, best_j = i, j
        if best_j is None:
            return None
        next_of[best_j.name] += 1
        remaining[0] -= 1
        busy.add(table_of[best_j.name])
        return best_j

    def worker() -> None:
        while True:
            with cv:
                job = _claim()
                while job is None:
                    if remaining[0] <= 0:
                        cv.notify_all()
                        return
                    cv.wait()
                    job = _claim()
                epoch_id, path = queues[job.name].pop(0)
            started = _time.monotonic()
            err: BaseException | None = None
            r = None
            try:
                r = job.table.apply_epoch(
                    path, epoch_id=epoch_id, source=f"job:{job.name}"
                )
            except BaseException as e:  # noqa: BLE001 — re-raised by caller
                err = e
            finished = _time.monotonic()
            with cv:
                busy.discard(table_of[job.name])
                if err is not None:
                    failed.add(job.name)
                    order.append(
                        {"job": job.name, "epoch": epoch_id,
                         "priority": job.priority, "error": err}
                    )
                else:
                    job.applied.append(r)
                    order.append(
                        {
                            "job": job.name,
                            "epoch": epoch_id,
                            "priority": job.priority,
                            "started": started,
                            "finished": finished,
                        }
                    )
                cv.notify_all()

    threads = [
        threading.Thread(target=worker, name=f"laketide-apply-{i}")
        for i in range(max_concurrent)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()


def _settle_fsspec_http_import() -> None:
    """Make the ``fsspec.implementations.http`` import idempotent before
    forking drain threads. Ray's per-path ``_is_http_filesystem`` does
    ``from fsspec.implementations.http import HTTPFileSystem`` guarded
    only by ``except ModuleNotFoundError`` — and when aiohttp is absent
    that import FAILS and is evicted from sys.modules, so every path
    resolution retries it. Two driver threads racing the retry can
    observe each other's partially-initialized module and get a plain
    ``ImportError`` ("cannot import name 'HTTPFileSystem'") that escapes
    Ray's guard and kills an apply. A sentinel module whose
    HTTPFileSystem can never be instantiated settles the import ONCE:
    the isinstance guard keeps returning False for real filesystems, and
    local-path reads (the only kind here — no network in scope) never
    construct it."""
    try:
        import fsspec.implementations.http  # noqa: F401

        return
    except ModuleNotFoundError:
        pass
    except ImportError:  # partially-initialized module from another thread
        return
    import sys
    import types

    try:
        import fsspec.implementations as _fi
    except Exception:
        return

    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # sentinel: isinstance-safe, never constructible
        def __init__(self, *a, **k):
            raise ModuleNotFoundError(
                "HTTPFileSystem requires aiohttp, which is not installed"
            )

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod
    _fi.http = mod


def _raise_first_drain_error(order: list[dict]) -> None:
    """Surface a concurrent drain failure AFTER every other table's
    chain finished (partial progress is durable — each applied epoch
    already committed its manifest)."""
    for rec in order:
        if "error" in rec:
            raise RuntimeError(
                f"job {rec['job']!r} epoch {rec['epoch']} failed"
            ) from rec["error"]
