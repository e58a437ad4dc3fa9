"""CLI entry point: ``python -m mq_to_db_ray.cli run --input DIR --out DIR``.

The process analog of the reference service main
(/root/reference/cmd/mq-to-db/main.go): load config (C1), wire the
pipeline, run one epoch of the cascade, flush metrics/manifest, exit with
a summary.  Graceful shutdown (C2, main.go:379-394): SIGINT/SIGTERM cancel
the run; partitions already committed to the manifest stay valid and a
re-run resumes past them (ack-once semantics).

Unlike library code, the CLI OWNS the Ray session (guarded init +
shutdown) — `__ray_entry__` and the stages never call ray.init.
"""

from __future__ import annotations

import argparse
import json
import signal
import sys

from .config import load_config


def _init_ray(num_cpus: int | None = None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False)
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)


def cmd_run(args: argparse.Namespace) -> int:
    overrides: dict = {}
    if args.input:
        overrides["inputs"] = args.input
    if args.out:
        overrides["sink"] = {"out_dir": args.out}
    cfg = load_config(args.config, overrides)
    if not cfg.inputs:
        print("error: no inputs (use --input or config `inputs:`)", file=sys.stderr)
        return 2

    _init_ray(args.num_cpus)

    # C2: a signal mid-run aborts cleanly; committed partitions stay valid.
    def on_signal(signum, frame):
        print(
            json.dumps({"event": "shutdown", "signal": signum,
                        "note": "committed partitions remain valid; re-run resumes"}),
            file=sys.stderr,
        )
        raise SystemExit(130)

    signal.signal(signal.SIGINT, on_signal)
    signal.signal(signal.SIGTERM, on_signal)

    from .pipelines.cascade import run_cascade

    inputs = cfg.inputs if len(cfg.inputs) > 1 else cfg.inputs[0]
    summary = run_cascade(
        inputs,
        cfg.sink.out_dir,
        batch_size=cfg.dispatcher.batch_size,
        validate_concurrency=cfg.dispatcher.storage_workers,
        raw_partition_cols=cfg.sink.raw_partition_cols,
        read_blocks=cfg.dispatcher.consumer_concurrency,
        window_buckets=args.window_buckets or cfg.sink.window_buckets,
    )
    out = {k: v for k, v in summary.items() if k != "tiers"}
    print(json.dumps(out))
    return 0


def cmd_watch(args: argparse.Namespace) -> int:
    """Daemon mode: poll --input-dir, run each new file batch as an epoch."""
    from .pipelines.watch import watch

    _init_ray(args.num_cpus)
    stopping = {"flag": False}

    def on_signal(signum, frame):
        stopping["flag"] = True
        print(json.dumps({"event": "watch-stop", "signal": signum}),
              file=sys.stderr)

    signal.signal(signal.SIGINT, on_signal)
    signal.signal(signal.SIGTERM, on_signal)
    for summary in watch(
        args.input_dir, args.out, interval_s=args.interval,
        max_epochs=args.max_epochs, stop_flag=lambda: stopping["flag"],
        health_file=args.health_file, http_port=args.http_port,
    ):
        out = {k: v for k, v in summary.items() if k != "tiers"}
        print(json.dumps(out), flush=True)
    return 0


def cmd_compact(args: argparse.Namespace) -> int:
    """Fold per-epoch partitions into one per source (driver-side, no Ray)."""
    from .pipelines.compact import compact_tier

    print(json.dumps(compact_tier(args.out, args.tier)))
    return 0


def cmd_retention(args: argparse.Namespace) -> int:
    """Expire old partitions per tier (manifest-planned, no Ray needed)."""
    from .pipelines.retention import DEFAULT_POLICY, apply_retention

    policy = dict(DEFAULT_POLICY)
    for spec in args.keep or []:
        tier, _, n = spec.partition("=")
        policy[tier] = None if n in ("", "forever") else int(n)
    print(json.dumps(apply_retention(args.out, policy)))
    return 0


def cmd_view(args: argparse.Namespace) -> int:
    """Print the merged cross-epoch view of one tier (head rows)."""
    from .pipelines.view import tier_view

    _init_ray(args.num_cpus)
    ds = tier_view(args.out, args.tier, gap=args.gap)
    df = ds.to_pandas().sort_values(["source", "bucket_ts"])
    print(df.head(args.limit).to_string(index=False))
    print(f"... {len(df)} points total")
    return 0


def cmd_repair(args: argparse.Namespace) -> int:
    """Recompute + recommit one (tier, source) slice from the raw tier."""
    from .pipelines.repair import repair_tier

    _init_ray(args.num_cpus)
    summary = repair_tier(args.out, args.tier, args.source)
    print(json.dumps(summary))
    return 0


def cmd_show_config(args: argparse.Namespace) -> int:
    import dataclasses

    cfg = load_config(args.config)
    print(json.dumps(dataclasses.asdict(cfg), indent=2))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="mq_to_db_ray", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    runp = sub.add_parser("run", help="run one cascade epoch")
    runp.add_argument("--config", default=None, help="YAML config file")
    runp.add_argument("--input", action="append", default=None,
                      help="input parquet file/dir (repeatable)")
    runp.add_argument("--out", default=None, help="output directory")
    runp.add_argument("--num-cpus", type=int, default=None)
    runp.add_argument("--window-buckets", type=int, default=None,
                      help="buckets per fill/encode/commit window (layout "
                           "parameter — pinned per out_dir on first run)")
    runp.set_defaults(fn=cmd_run)

    showp = sub.add_parser("show-config", help="print merged config")
    showp.add_argument("--config", default=None)
    showp.set_defaults(fn=cmd_show_config)

    watchp = sub.add_parser("watch", help="daemon: consume new files as epochs")
    watchp.add_argument("--input-dir", required=True)
    watchp.add_argument("--out", required=True)
    watchp.add_argument("--interval", type=float, default=5.0)
    watchp.add_argument("--max-epochs", type=int, default=None)
    watchp.add_argument("--num-cpus", type=int, default=None)
    watchp.add_argument("--health-file", default=None,
                        help="liveness heartbeat JSON, refreshed every poll "
                             "(the /health analog for unattended daemons)")
    watchp.add_argument("--http-port", type=int, default=None,
                        help="serve Prometheus /metrics + request-time "
                             "/health on this port for the daemon's "
                             "lifetime (0 = ephemeral; the bound port is "
                             "printed in each epoch summary)")
    watchp.set_defaults(fn=cmd_watch)

    compactp = sub.add_parser("compact", help="fold per-epoch partitions")
    compactp.add_argument("--out", required=True)
    compactp.add_argument("--tier", default="1m", choices=["1m", "1h", "1d"])
    compactp.set_defaults(fn=cmd_compact)

    retp = sub.add_parser("retention", help="expire old partitions")
    retp.add_argument("--out", required=True)
    retp.add_argument("--keep", action="append", default=None,
                      help="tier=N buckets (repeatable), e.g. --keep 1m=1440")
    retp.set_defaults(fn=cmd_retention)

    viewp = sub.add_parser("view", help="merged cross-epoch tier view")
    viewp.add_argument("--out", required=True)
    viewp.add_argument("--tier", default="1m", choices=["1m", "1h", "1d"])
    viewp.add_argument("--gap", action="store_true", help="gap-fill the view")
    viewp.add_argument("--limit", type=int, default=20)
    viewp.add_argument("--num-cpus", type=int, default=None)
    viewp.set_defaults(fn=cmd_view)

    repairp = sub.add_parser(
        "repair", help="recompute one (tier, source) slice from the raw tier"
    )
    repairp.add_argument("--out", required=True)
    repairp.add_argument("--tier", required=True, choices=["1m", "1h", "1d"])
    repairp.add_argument("--source", required=True)
    repairp.add_argument("--num-cpus", type=int, default=None)
    repairp.set_defaults(fn=cmd_repair)

    args = p.parse_args(argv)
    rc = args.fn(args)
    import ray

    if ray.is_initialized():
        from .util import quiesce_ray_data_stats

        quiesce_ray_data_stats()
        ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
