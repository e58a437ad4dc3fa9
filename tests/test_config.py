"""Config merge chain: defaults <- YAML <- env <- flags (C1 analog,
/root/reference/cmd/mq-to-db/main.go:141-163)."""

import os

from mq_to_db_ray.config import EngineConfig, load_config


def test_defaults():
    cfg = load_config()
    assert cfg.dispatcher.batch_size == 65536
    assert cfg.sink.tiers == ["1m", "1h", "1d"]
    assert cfg.dispatcher.storage_workers is None


def test_yaml_env_flag_precedence(tmp_path, monkeypatch):
    y = tmp_path / "cfg.yaml"
    y.write_text(
        "dispatcher:\n  batch_size: 100\n  storage_workers: 7\n"
        "sink:\n  out_dir: /tmp/yamlout\n"
    )
    cfg = load_config(str(y))
    assert cfg.dispatcher.batch_size == 100
    assert cfg.dispatcher.storage_workers == 7
    assert cfg.sink.out_dir == "/tmp/yamlout"

    # env overrides YAML (viper-style `.` -> `_` replacer)
    monkeypatch.setenv("MQ2DB_DISPATCHER_BATCH_SIZE", "200")
    cfg = load_config(str(y))
    assert cfg.dispatcher.batch_size == 200

    # flags override env
    cfg = load_config(str(y), overrides={"dispatcher": {"batch_size": 300}})
    assert cfg.dispatcher.batch_size == 300


def test_env_list(monkeypatch):
    monkeypatch.setenv("MQ2DB_SINK_TIERS", "1m,1h")
    cfg = load_config()
    assert cfg.sink.tiers == ["1m", "1h"]


def test_unknown_yaml_keys_ignored(tmp_path):
    y = tmp_path / "cfg.yaml"
    y.write_text("nope: 1\ndispatcher:\n  bogus: 2\n")
    cfg = load_config(str(y))
    assert isinstance(cfg, EngineConfig)
