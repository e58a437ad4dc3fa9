"""Engine configuration: defaults ← YAML ← environment ← CLI flags.

Mirrors the reference's viper chain (defaults, config file, env with
``.``→``_`` replacer, then pflag overrides —
/root/reference/cmd/mq-to-db/main.go:141-163, defaults
/root/reference/internal/config/config.go:36-65).  Env vars use the
``MQ2DB_`` prefix over the snake_case field path:
``dispatcher.storage_workers`` → ``MQ2DB_DISPATCHER_STORAGE_WORKERS``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, fields


@dataclass
class DispatcherConfig:
    # analog of dispatcher.consumerConcurrency (config-sample.yaml:3):
    # minimum read-block fan-out for the ingest pass; None = 2x cluster CPUs
    # (passed to run_cascade as read_blocks)
    consumer_concurrency: int | None = None
    # analog of dispatcher.storageWorkers (config-sample.yaml:4): actor-pool
    # size for the validate stage; None/0 = fused task pool (elastic)
    storage_workers: int | None = None
    batch_size: int = 65536


@dataclass
class SinkConfig:
    out_dir: str = "./out"
    raw_partition_cols: list[str] | None = None
    tiers: list[str] = field(default_factory=lambda: ["1m", "1h", "1d"])
    # buckets per fill/encode/commit window (layout parameter — pinned per
    # out_dir on first run); None = stages.gapfill.DEFAULT_WINDOW_BUCKETS
    window_buckets: int | None = None


@dataclass
class EngineConfig:
    inputs: list[str] = field(default_factory=list)
    dispatcher: DispatcherConfig = field(default_factory=DispatcherConfig)
    sink: SinkConfig = field(default_factory=SinkConfig)
    log_level: str = "info"


def _apply_mapping(cfg, data: dict) -> None:
    for f in fields(cfg):
        if f.name not in data:
            continue
        v = data[f.name]
        cur = getattr(cfg, f.name)
        if isinstance(v, dict) and hasattr(cur, "__dataclass_fields__"):
            _apply_mapping(cur, v)
        else:
            setattr(cfg, f.name, v)


def _apply_env(cfg, prefix: str = "MQ2DB") -> None:
    def walk(obj, path: str):
        for f in fields(obj):
            cur = getattr(obj, f.name)
            key = f"{path}_{f.name}".upper().replace(".", "_")
            if hasattr(cur, "__dataclass_fields__"):
                walk(cur, f"{path}_{f.name}")
                continue
            raw = os.environ.get(key)
            if raw is None:
                continue
            if f.type in ("int | None", "int"):
                setattr(obj, f.name, int(raw))
            elif f.type.startswith("list"):
                setattr(obj, f.name, [x for x in raw.split(",") if x])
            else:
                setattr(obj, f.name, raw)

    walk(cfg, prefix)


def load_config(path: str | None = None, overrides: dict | None = None) -> EngineConfig:
    """defaults ← YAML(path) ← env(MQ2DB_*) ← overrides (CLI flags)."""
    cfg = EngineConfig()
    if path:
        import yaml

        with open(path) as f:
            data = yaml.safe_load(f) or {}
        _apply_mapping(cfg, data)
    _apply_env(cfg)
    if overrides:
        _apply_mapping(cfg, overrides)
    return cfg
