"""CLI entry points.

The only scripts that own a Ray session (per the driver contract) are this
CLI, bench.py and the test fixture.

    python -m oplogtoredis_ray ingest  --log DIR --lake DIR [--window-us N]
                                       [--partitions P] [--deny conv ...]
    python -m oplogtoredis_ray status  --lake DIR
    python -m oplogtoredis_ray denylist add|remove|list --lake DIR [id ...]
    python -m oplogtoredis_ray gc      --lake DIR [--dry-run]
    python -m oplogtoredis_ray export  --lake DIR --dest DIR [--dest DIR ...]
    python -m oplogtoredis_ray generate --out DIR --events N [--seed S]
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False, "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    # Ray's sort-shuffle emits schema-less EMPTY blocks for reduce
    # partitions with no rows, tripping a cosmetic executor warning; our own
    # blocks are schema-typed everywhere, so filter just that message
    import logging

    class _DropEmptySchema(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            return "RefBundle with a different schema" not in record.getMessage()

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_DropEmptySchema())


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="oplogtoredis_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("ingest", help="resume + replay the event log into the lake")
    pi.add_argument("--log", required=True)
    pi.add_argument("--lake", required=True)
    pi.add_argument("--window-us", type=int, default=None)
    pi.add_argument("--partitions", type=int, default=None)
    pi.add_argument("--deny", action="append", default=[])
    pi.add_argument("--num-cpus", type=int, default=None)
    pi.add_argument("--max-windows", type=int, default=None)
    pi.add_argument(
        "--state-mode", choices=["rewrite", "delta"], default=None,
        help="lake layout (default: dataclass default, rewrite)",
    )
    pi.add_argument("--compact-threshold", type=int, default=None)
    pi.add_argument(
        "--apply-mode", choices=["auto", "tasks", "actors"], default=None,
    )
    pi.add_argument(
        "--lookahead", action="store_true",
        help="pipelined window lookahead (grouped actor feeds)",
    )

    pf = sub.add_parser("follow", help="continuously tail a growing log dir")
    pf.add_argument("--log", required=True)
    pf.add_argument("--lake", required=True)
    pf.add_argument("--window-us", type=int, required=True)
    pf.add_argument("--partitions", type=int, default=None)
    pf.add_argument("--idle-rounds", type=int, default=3)
    pf.add_argument("--poll-seconds", type=float, default=1.0)
    pf.add_argument("--num-cpus", type=int, default=None)
    pf.add_argument(
        "--http-port",
        type=int,
        default=None,
        help="serve /healthz /metrics /denylist next to the tail loop",
    )

    ps = sub.add_parser("status", help="lake status from manifests")
    ps.add_argument("--lake", required=True)

    pd_ = sub.add_parser(
        "denylist",
        help="runtime-mutable denylist CRUD (reloaded at every window boundary)",
    )
    pd_.add_argument("action", choices=["add", "remove", "list"])
    pd_.add_argument("entries", nargs="*")
    pd_.add_argument("--lake", required=True)

    psv = sub.add_parser(
        "serve", help="HTTP control plane: /healthz /metrics /denylist CRUD"
    )
    psv.add_argument("--lake", required=True)
    psv.add_argument("--log", default=None)
    psv.add_argument("--port", type=int, default=8080)

    pg = sub.add_parser("gc", help="remove superseded state files")
    pg.add_argument("--lake", required=True)
    pg.add_argument("--dry-run", action="store_true")
    pg.add_argument("--grace-seconds", type=float, default=900.0)

    pe = sub.add_parser("export", help="fan out committed lake snapshot")
    pe.add_argument("--lake", required=True)
    pe.add_argument("--dest", action="append", required=True)

    pgen = sub.add_parser("generate", help="deterministic synthetic event log")
    pgen.add_argument("--out", required=True)
    pgen.add_argument("--events", type=int, default=100_000)
    pgen.add_argument("--seed", type=int, default=42)
    pgen.add_argument("--shards", type=int, default=1)
    pgen.add_argument("--num-cpus", type=int, default=None)

    args = p.parse_args(argv)

    if args.cmd == "ingest":
        import ray

        from oplogtoredis_ray.config import PipelineConfig
        from oplogtoredis_ray.pipelines.ingest import run_ingest
        from oplogtoredis_ray.sources.event_log import log_ts_bounds

        _init_ray(args.num_cpus)
        window = args.window_us
        if window is None:
            lo, hi = log_ts_bounds(args.log)
            window = (hi - lo) // 4 + 1
        kwargs = {"window_us": window, "denylist": frozenset(args.deny)}
        if args.partitions is not None:  # unset → dataclass default (one
            kwargs["num_partitions"] = args.partitions  # source of truth)
        if args.state_mode is not None:
            kwargs["state_mode"] = args.state_mode
        if args.compact_threshold is not None:
            kwargs["compact_threshold"] = args.compact_threshold
        if args.apply_mode is not None:
            kwargs["apply_mode"] = args.apply_mode
        if args.lookahead:
            kwargs["window_lookahead"] = True
        cfg = PipelineConfig(**kwargs)
        res = run_ingest(args.log, args.lake, cfg, max_windows=args.max_windows)
        print(
            json.dumps(
                {
                    "windows_run": res.windows_run,
                    "events_in": res.events_in,
                    "dupes_dropped": res.dupes_dropped,
                    "below_watermark": res.below_watermark,
                    "upserts": res.upserts,
                    "deletes": res.deletes,
                    "patches": res.patches,
                    "patch_misses": res.patch_misses,
                }
            )
        )
        ray.shutdown()
        return 0

    if args.cmd == "follow":
        import ray

        from oplogtoredis_ray.config import PipelineConfig
        from oplogtoredis_ray.pipelines.ingest import run_follow

        _init_ray(args.num_cpus)
        kwargs = {"window_us": args.window_us}
        if args.partitions is not None:
            kwargs["num_partitions"] = args.partitions
        cfg = PipelineConfig(**kwargs)
        server = None
        if args.http_port is not None:
            # control plane next to the tail loop (≙ main.go:301-359);
            # denylist mutations land at the next window boundary
            import threading

            from oplogtoredis_ray.http_api import make_server

            server = make_server(args.lake, log_dir=args.log, port=args.http_port)
            threading.Thread(target=server.serve_forever, daemon=True).start()
        res = run_follow(
            args.log,
            args.lake,
            cfg,
            idle_rounds_to_stop=args.idle_rounds,
            poll_sleep_s=args.poll_seconds,
        )
        print(
            json.dumps(
                {"windows_run": res.windows_run, "events_in": res.events_in}
            )
        )
        if server is not None:
            server.shutdown()
        ray.shutdown()
        return 0

    if args.cmd == "serve":
        from oplogtoredis_ray.http_api import make_server

        server = make_server(args.lake, log_dir=args.log, port=args.port)
        print(json.dumps({"listening": list(server.server_address)}), flush=True)
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            pass
        return 0

    if args.cmd == "status":
        from oplogtoredis_ray.state.denylist import load_denylist
        from oplogtoredis_ray.state.manifest import (
            read_all_manifests,
            read_completed_windows,
        )
        from oplogtoredis_ray.state.metrics import read_metrics

        manifests = read_all_manifests(args.lake)
        windows = read_completed_windows(args.lake)
        last = read_metrics(args.lake)
        print(
            json.dumps(
                {
                    "partitions": len(manifests),
                    "rows": sum(max(m.rows, 0) for m in manifests),
                    "rows_unknown_partitions": sum(1 for m in manifests if m.rows < 0),
                    "completed_windows": len(windows),
                    "resume_end_us": max((w["end_us"] for w in windows), default=None),
                    "min_watermark": min(
                        (list(m.watermark) for m in manifests), default=None
                    ),
                    "denylist_size": len(load_denylist(args.lake)),
                    "last_run": (
                        {
                            k: last[k]
                            for k in (
                                "at_unix",
                                "wall_s",
                                "windows_run",
                                "events",
                                "deadletter_rows",
                                "watermark_lag_us",
                                "resume_gap_us",
                            )
                        }
                        if last
                        else None
                    ),
                }
            )
        )
        return 0

    if args.cmd == "denylist":
        from oplogtoredis_ray.state.denylist import DenylistStore

        store = DenylistStore(args.lake)
        if args.action == "list":
            print(json.dumps({"denylist": store.entries()}))
        elif args.action == "add":
            added = [e for e in args.entries if store.add(e)]
            print(json.dumps({"added": added, "denylist": store.entries()}))
        else:
            removed = [e for e in args.entries if store.remove(e)]
            missing = [e for e in args.entries if e not in removed]
            print(
                json.dumps(
                    {"removed": removed, "missing": missing, "denylist": store.entries()}
                )
            )
        return 0

    if args.cmd == "gc":
        from oplogtoredis_ray.state.gc import collect_garbage

        removed = collect_garbage(args.lake, dry_run=args.dry_run, grace_seconds=args.grace_seconds)
        print(json.dumps({"removed": len(removed), "dry_run": args.dry_run}))
        return 0

    if args.cmd == "export":
        from oplogtoredis_ray.state.gc import export_snapshot

        print(json.dumps(export_snapshot(args.lake, args.dest)))
        return 0

    if args.cmd == "generate":
        from oplogtoredis_ray.sources.synthetic import (
            GeneratorSpec,
            generate_event_log,
            generate_event_log_sharded,
            write_event_log,
        )

        spec = GeneratorSpec(
            seed=args.seed,
            n_conversations=max(args.events // 55, 20),
            mean_turns=3.0,
            max_turns=60,
            n_files=max(8, args.shards * 4),
        )
        if args.shards > 1:
            _init_ray(args.num_cpus)
            n = generate_event_log_sharded(spec, args.out, shards=args.shards)
        else:
            log = generate_event_log(spec)
            write_event_log(log, args.out)
            n = len(log)
        print(json.dumps({"events": n, "out": args.out}))
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
