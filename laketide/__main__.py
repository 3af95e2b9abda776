"""laketide CLI — the operational surface (reference E5 analog: the
HTTP API's sync / export / stats endpoints,
/root/reference/internal/api/server.go:44-70 — rebuilt as subcommands
suitable for ``ray job submit -- python -m laketide ...``).

This module OWNS the Ray session (guarded init + shutdown); the library
never initialises Ray (driver contract).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session():
    import ray

    started = False
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
        started = True
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return started


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="laketide")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("replay", help="apply all new changelog epochs onto a table")
    sp.add_argument("--table", required=True)
    sp.add_argument("--changelog", required=True)
    sp.add_argument("--partitions", type=int, default=32)
    sp.add_argument("--merge", default="lww", choices=["lww", "longest", "coalesce"])
    sp.add_argument("--exchange", default="auto", choices=["auto", "groupby", "storage"])

    sp = sub.add_parser("status", help="print the current manifest summary")
    sp.add_argument("--table", required=True)

    sp = sub.add_parser("export", help="versioned snapshot export")
    sp.add_argument("--table", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument(
        "--fmt", choices=("parquet", "csv", "jsonl"), default="parquet"
    )
    sp.add_argument("--tag", help="export a pinned named snapshot instead of HEAD")

    sp = sub.add_parser("gc", help="drop superseded manifests/data files")
    sp.add_argument("--table", required=True)
    sp.add_argument("--keep", type=int, default=2)

    sp = sub.add_parser("compact", help="fold merge-on-read deltas into bases")
    sp.add_argument("--table", required=True)

    sp = sub.add_parser("purge-tombstones", help="drop old tombstone rows")
    sp.add_argument("--table", required=True)
    sp.add_argument("--older-than-epochs", type=int, default=16)

    sp = sub.add_parser("rescale", help="change the partition count (full rewrite)")
    sp.add_argument("--table", required=True)
    sp.add_argument("--partitions", type=int, required=True)

    sp = sub.add_parser("history", help="committed-epoch log")
    sp.add_argument("--table", required=True)

    sp = sub.add_parser(
        "diff", help="change data feed between two retained epochs"
    )
    sp.add_argument("--table", required=True)
    sp.add_argument("--from-epoch", type=int, required=True)
    sp.add_argument("--to-epoch", type=int, required=True)
    sp.add_argument(
        "--out", help="write full change rows to this parquet path (else summary only)"
    )

    sp = sub.add_parser(
        "view", help="grouped live-row count/bytes view (one streaming pass)"
    )
    sp.add_argument("--table", required=True)
    sp.add_argument("--group", default="lang")

    sp = sub.add_parser("fsck", help="table integrity check (read-only)")
    sp.add_argument("--table", required=True)
    sp.add_argument("--deep", action="store_true")

    sp = sub.add_parser(
        "purge-dlq", help="acknowledge repaired dead-letter rows"
    )
    sp.add_argument("--table", required=True)
    sp.add_argument("--up-to-epoch", type=int, default=None)

    sp = sub.add_parser(
        "sync", help="composed multi-source sync: each SOURCE=PATH job "
        "applies as its own epoch with a per-source stats row"
    )
    sp.add_argument("--table", required=True)
    sp.add_argument("--partitions", type=int, default=32)
    sp.add_argument("--merge", default="coalesce", choices=["lww", "longest", "coalesce"])
    sp.add_argument(
        "--job", action="append", required=True, metavar="SOURCE=PATH",
        help="repeatable; sources sync in the given order",
    )

    sp = sub.add_parser(
        "schedule",
        help="drain multiple tables' changelog backlogs by weighted "
        "priority (critical/default/low = 6/3/1)",
    )
    sp.add_argument(
        "--jobs-json",
        required=True,
        help='JSON list: [{"name", "table", "changelog", "priority", '
        '"cadence"? (@always/@hourly/@daily/@weekly/<N>s|m|h|d), '
        '"partitions"?, "merge"?}, ...]',
    )
    sp.add_argument(
        "--max-concurrent",
        type=int,
        default=1,
        help="epochs of DIFFERENT tables applied simultaneously "
        "(per-table order always serial); the reference runs 10 "
        "concurrent workers",
    )

    sp = sub.add_parser("tail", help="follow a changelog dir, applying new epochs")
    sp.add_argument("--table", required=True)
    sp.add_argument("--changelog", required=True)
    sp.add_argument("--poll-seconds", type=float, default=2.0)
    sp.add_argument("--max-idle-polls", type=int, default=3)
    sp.add_argument("--partitions", type=int, default=32)
    sp.add_argument(
        "--lock-wait-seconds", type=float, default=60.0,
        help="serialize with concurrent maintenance instead of raising",
    )

    sp = sub.add_parser(
        "tag", help="create/list/delete named snapshot tags (gc-pinned epochs)"
    )
    sp.add_argument("--table", required=True)
    sp.add_argument("--name", help="tag to create (or delete with --delete)")
    sp.add_argument("--epoch", type=int, help="epoch to pin (default: current)")
    sp.add_argument("--delete", action="store_true")

    sp = sub.add_parser(
        "join-view",
        help="refresh a materialized join view (derived LakeTable) from a "
        "base table and a dimension parquet",
    )
    sp.add_argument("--table", required=True, help="base LakeTable dir")
    sp.add_argument("--target", required=True, help="derived view LakeTable dir")
    sp.add_argument("--dim", required=True, help="dimension parquet file")
    sp.add_argument("--on", default="repo", help="join key column in the dim")

    sp = sub.add_parser("gen", help="generate a deterministic synthetic changelog")
    sp.add_argument("--out", required=True)
    sp.add_argument("--events", type=int, default=10_000)
    sp.add_argument("--epochs", type=int, default=4)
    sp.add_argument("--seed", type=int, default=42)
    sp.add_argument("--shards", type=int, default=1)

    args = p.parse_args(argv)

    if args.cmd == "gen":
        from laketide.sources.changelog import generate_changelog

        files = generate_changelog(
            args.out,
            n_events=args.events,
            n_epochs=args.epochs,
            seed=args.seed,
            shards_per_epoch=args.shards,
        )
        print(json.dumps({"epochs": files}))
        return 0

    if args.cmd == "fsck":
        # purely local file/footer I/O (state_table folds driver-side):
        # an integrity check of a suspect table must not depend on Ray
        # starting
        from laketide.pipelines.cdc import LakeTable

        r = LakeTable(args.table).fsck(deep=args.deep)
        print(json.dumps(r))
        return 0 if r["ok"] else 2

    if args.cmd == "tag":
        # pure file ops (lock + atomic write) — no Ray needed
        from laketide.pipelines.cdc import LakeTable

        t = LakeTable(args.table)
        if (args.delete or args.epoch is not None) and not args.name:
            # refuse a silent fall-through to the list branch: a script
            # that dropped --name must not believe its delete succeeded
            print(json.dumps({"error": "--delete/--epoch require --name"}))
            return 2
        if args.name and args.delete:
            print(json.dumps({"deleted": t.delete_tag(args.name)}))
        elif args.name:
            print(json.dumps(t.tag(args.name, epoch=args.epoch)))
        else:
            print(json.dumps({"tags": t.tags()}))
        return 0

    if args.cmd == "purge-dlq":
        from laketide.pipelines.cdc import LakeTable

        print(json.dumps(LakeTable(args.table).purge_dlq(args.up_to_epoch)))
        return 0

    started = _ray_session()
    try:
        from laketide.pipelines.cdc import LakeTable

        if args.cmd == "replay":
            t = LakeTable(args.table, num_partitions=args.partitions, merge=args.merge)
            results = t.replay(args.changelog, exchange=args.exchange)
            print(json.dumps({"applied": results, "epoch": t.current_epoch()}))
        elif args.cmd == "schedule":
            from laketide.pipelines.scheduler import ReplayJob, run_schedule

            jobs = []
            for spec in json.loads(args.jobs_json):
                jobs.append(
                    ReplayJob(
                        spec["name"],
                        LakeTable(
                            spec["table"],
                            num_partitions=int(spec.get("partitions", 32)),
                            merge=spec.get("merge", "lww"),
                        ),
                        spec["changelog"],
                        priority=spec.get("priority", "default"),
                        cadence=spec.get("cadence", "@always"),
                    )
                )
            print(json.dumps(run_schedule(jobs, max_concurrent=args.max_concurrent)))
        elif args.cmd == "sync":
            jobs = []
            for spec in args.job:
                name, sep, path = spec.partition("=")
                if not sep or not name or not path:
                    p.error(f"--job expects SOURCE=PATH, got {spec!r}")
                jobs.append((name, path))
            t = LakeTable(args.table, num_partitions=args.partitions, merge=args.merge)
            r = t.sync_sources(jobs)
            r["source_stats"] = t.source_stats()
            print(json.dumps(r))
        elif args.cmd == "status":
            t = LakeTable(args.table)
            man = t.current_manifest()
            if not man:
                print(json.dumps({"epoch": 0, "rows": 0}))
            else:
                print(
                    json.dumps(
                        {
                            "epoch": man.epoch,
                            "rows": man.stats.get("rows"),
                            "num_partitions": man.num_partitions,
                            "merge": man.stats.get("merge"),
                            "totals": man.stats.get("totals"),
                            "schema": man.schema_names,
                        }
                    )
                )
        elif args.cmd == "export":
            t = LakeTable(args.table)
            print(json.dumps(t.export_snapshot(args.out, fmt=args.fmt, tag=args.tag)))
        elif args.cmd == "gc":
            t = LakeTable(args.table)
            print(json.dumps(t.gc(keep_last=args.keep)))
        elif args.cmd == "compact":
            t = LakeTable(args.table)
            print(json.dumps(t.compact()))
        elif args.cmd == "purge-tombstones":
            t = LakeTable(args.table)
            print(json.dumps(t.purge_tombstones(older_than_epochs=args.older_than_epochs)))
        elif args.cmd == "rescale":
            t = LakeTable(args.table)
            print(json.dumps(t.rescale(args.partitions)))
        elif args.cmd == "history":
            t = LakeTable(args.table)
            print(json.dumps(t.history()))
        elif args.cmd == "diff":
            t = LakeTable(args.table)
            ch = t.changes_between(args.from_epoch, args.to_epoch)
            import pyarrow.compute as pc

            vc = pc.value_counts(ch["change_type"].combine_chunks())
            counts = {
                str(f["values"]): int(f["counts"]) for f in vc.to_pylist()
            }
            if args.out:
                import pyarrow.parquet as pq

                pq.write_table(ch, args.out)
            print(
                json.dumps(
                    {
                        "from_epoch": args.from_epoch,
                        "to_epoch": args.to_epoch,
                        "changes": ch.num_rows,
                        "by_type": counts,
                        "out": args.out,
                    }
                )
            )
        elif args.cmd == "view":
            from laketide.pipelines.views import IncrementalCountView

            v = IncrementalCountView(LakeTable(args.table), group_col=args.group)
            r = v.refresh()
            print(
                json.dumps(
                    {
                        "mode": r["mode"],
                        "epoch": r["to_epoch"],
                        "groups": v.view().to_pylist(),
                    }
                )
            )
        elif args.cmd == "join-view":
            import pyarrow.parquet as pq

            from laketide.pipelines.views import DerivedJoinView

            dim = pq.read_table(args.dim)
            v = DerivedJoinView(LakeTable(args.table), args.target, dim, on=args.on)
            r = v.refresh()
            print(
                json.dumps(
                    {
                        "mode": r["mode"],
                        "from_epoch": r["from_epoch"],
                        "to_epoch": r["to_epoch"],
                        "rows": v.target.current_manifest().stats.get("rows", 0)
                        if v.target.current_manifest()
                        else 0,
                    }
                )
            )
        elif args.cmd == "tail":
            t = LakeTable(
                args.table,
                num_partitions=args.partitions,
                lock_wait_seconds=args.lock_wait_seconds,
            )
            out = t.tail(
                args.changelog,
                poll_seconds=args.poll_seconds,
                max_idle_polls=args.max_idle_polls,
            )
            print(json.dumps({"applied": out, "epoch": t.current_epoch()}))
    finally:
        if started:
            import ray

            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
