"""E10/A2/A3 + the exec/ack reject ladder + the watch liveness probe:
the observability surface the reference exposes via Prometheus + /health
(/root/reference/internal/metrics/metrics.go, cmd/mq-to-db/main.go:302-350),
pushed per-run here."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _cascade(tmp_path, n=3_000):
    from mq_to_db_ray.gen import write_f1_parquet
    from mq_to_db_ray.pipelines.cascade import run_cascade

    in_dir = str(tmp_path / "in")
    write_f1_parquet(in_dir, n, shards=2, max_tok=8)
    out = str(tmp_path / "out")
    return run_cascade(in_dir, out), out


def test_metrics_histogram_and_gauges(ray_session, tmp_path):
    """A2: the duration histogram must account for every committed
    partition; A3: gauges carry up/pool/committed snapshots."""
    s, out = _cascade(tmp_path)
    with open(s["metrics_path"]) as f:
        rows = [json.loads(line) for line in f]
    summary = [r for r in rows if r["kind"] == "summary"][0]
    n_parts = sum(1 for r in rows if r["kind"] == "partition")
    hist = summary["duration_hist_le"]
    assert sum(hist.values()) == n_parts == sum(s["partitions"].values())
    g = summary["gauges"]
    assert g["mq_to_db_up"] == 1
    assert g["partitions_committed"] == n_parts
    assert g["pool_cpus_total"] >= 1
    assert summary["counters"]["mq_to_db_storer_messages_errors_total"] == 0


def test_exec_reject_reason(ray_session, tmp_path, monkeypatch):
    """Storage-execute failure (staged parquet write dies) must dead-letter
    a reason='exec' partition reject and still raise (data never silently
    dropped) — branch messages.go:90-108 of the reference ladder."""
    from mq_to_db_ray.pipelines.cascade import TierPartitionWriter
    from mq_to_db_ray.stages.gapfill import windowed_groups
    from mq_to_db_ray.state import manifest as mf
    from mq_to_db_ray.state.manifest import CommitPhaseError

    rolled = pa.table(
        {
            "source": pa.array(["s0"] * 3),
            "bucket_ts": pa.array(
                [1767225600000000 + i * 60_000_000 for i in range(3)]
            ).cast(pa.timestamp("us")),
            "count": pa.array([1, 1, 1], pa.int64()),
            "sum_n_tok": pa.array([5, 6, 7], pa.int64()),
            "min_n_tok": pa.array([5, 6, 7], pa.int32()),
            "max_n_tok": pa.array([5, 6, 7], pa.int32()),
            "filled": pa.array([False] * 3),
        }
    )
    import ray.data as rd

    keyed, ext_ref = windowed_groups(rd.from_arrow(rolled), 60, 1 << 16)
    group = keyed.take_batch(10, batch_format="pyarrow")
    out = str(tmp_path / "out")
    rej = str(tmp_path / "rejects")
    w = TierPartitionWriter(
        out, "r1", "1m", ext_ref=ext_ref, window_buckets=1 << 16,
        reject_dir=rej,
    )

    real_write = pq.write_table

    def boom(table, path, **kw):
        if "_staging" in str(path):
            raise OSError("disk on fire")
        return real_write(table, path, **kw)

    monkeypatch.setattr(mf.pq, "write_table", boom)
    with pytest.raises(CommitPhaseError) as ei:
        w(group)
    assert ei.value.phase == "exec"
    monkeypatch.undo()
    rejects = pq.ParquetDataset(rej).read()
    assert rejects.num_rows == 1
    assert rejects["reason"][0].as_py() == "exec"
    assert "disk on fire" in rejects["detail"][0].as_py()

    # ack failure: staged write succeeds, the manifest commit (rename) dies
    def boom_ack(self, tier, partition, staged, relpath, meta):
        raise OSError("manifest gone")

    monkeypatch.setattr(mf.Manifest, "commit_file", boom_ack)
    with pytest.raises(CommitPhaseError) as ei:
        w(group)
    assert ei.value.phase == "ack"
    monkeypatch.undo()
    rejects = pq.ParquetDataset(rej).read()
    assert sorted(rejects["reason"].to_pylist()) == ["ack", "exec"]


def test_errors_counter_counts_commit_rejects(ray_session, tmp_path):
    """Pre-seeded exec/ack reject rows from a failed prior attempt must show
    up in storer_messages_errors_total on the next (successful) run."""
    from mq_to_db_ray import schema as sch
    from mq_to_db_ray.gen import write_f1_parquet
    from mq_to_db_ray.pipelines.cascade import run_cascade

    in_dir = str(tmp_path / "in")
    write_f1_parquet(in_dir, 2_000, shards=2, max_tok=8)
    out = str(tmp_path / "out")
    s1 = run_cascade(in_dir, out)
    # same epoch id -> same reject dir: seed a commit reject and re-run
    rej_dir = os.path.join(out, f"rejects/epoch={s1['epoch']}")
    os.makedirs(rej_dir, exist_ok=True)
    t = pa.Table.from_pylist(
        [dict(doc_id="tier=1m/source=s0__part-0-1", source="s0",
              reason="exec", detail="injected")],
        schema=sch.REJECT,
    )
    pq.write_table(t, os.path.join(rej_dir, "commit-seeded.parquet"))
    s2 = run_cascade(in_dir, out)
    with open(s2["metrics_path"]) as f:
        summary = [json.loads(l) for l in f if '"summary"' in l][0]
    assert summary["counters"]["mq_to_db_storer_messages_errors_total"] == 1
    assert s2["rejects"] == 1


def test_watch_health_file(ray_session, tmp_path):
    from mq_to_db_ray.gen import write_f1_parquet
    from mq_to_db_ray.pipelines.watch import watch

    in_dir = str(tmp_path / "in")
    write_f1_parquet(in_dir, 2_000, shards=2, max_tok=8)
    out = str(tmp_path / "out")
    health = str(tmp_path / "health.json")
    list(watch(in_dir, out, max_epochs=1, health_file=health))
    with open(health) as f:
        h = json.load(f)
    assert h["status"] == "ok" and h["epochs_processed"] == 1
    assert h["last_epoch"] and h["ts"] > 0


def test_commit_heartbeat_and_midrun_gauges(ray_session, tmp_path):
    """Round-3: every partition commit refreshes metrics/heartbeat.json
    from inside the worker, and the flushed gauges report its presence/age
    — a long epoch is no longer a telemetry blind spot until final flush."""
    import time

    t0 = time.time()
    s, out = _cascade(tmp_path)
    with open(os.path.join(out, "metrics", "heartbeat.json")) as f:
        hb = json.load(f)
    assert hb["ts"] >= t0  # freshness: written during THIS run
    assert hb["run_id"] == s["run_id"]
    assert hb["rows"] >= 1 and hb["tier"] in ("1m", "1h", "1d")
    with open(s["metrics_path"]) as f:
        summary = [json.loads(l) for l in f if '"summary"' in l][0]
    g = summary["gauges"]
    assert g["heartbeat_present"] == 1
    assert g["heartbeat_age_ms"] >= 0


def test_http_metrics_and_health_plane(ray_session, tmp_path):
    """C3 closure: the watch daemon serves Prometheus /metrics and a
    request-time /health over HTTP (reference main.go:302-350) — counters
    match the pushed JSONL, the histogram is cumulative, and /health
    answers with the worker-side commit heartbeat."""
    import urllib.request

    from mq_to_db_ray.gen import write_f1_parquet
    from mq_to_db_ray.pipelines.watch import watch

    in_dir = str(tmp_path / "in")
    write_f1_parquet(in_dir, 2_000, shards=2, max_tok=8)
    out = str(tmp_path / "out")
    summaries = list(watch(in_dir, out, max_epochs=1, http_port=0))
    assert summaries and "http_port" in summaries[0]
    # the watch generator closed its server on exit; stand one up over the
    # same out_dir (exactly what an operator sidecar would do)
    from mq_to_db_ray.state.httpplane import MetricsHTTPServer

    srv = MetricsHTTPServer(out, port=0)
    try:
        body = urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/metrics", timeout=10
        ).read().decode()
        assert "# TYPE mq_to_db_consumer_messages_total counter" in body
        exposed = {
            line.split(" ")[0]: line.split(" ")[1]
            for line in body.splitlines()
            if line and not line.startswith("#") and "{" not in line
        }
        # per-file epochs -> one run jsonl each; /metrics exposes the
        # service-lifetime totals (sum across runs)
        totals: dict[str, int] = {}
        mdir = os.path.join(out, "metrics")
        for fn in os.listdir(mdir):
            if not fn.startswith("run-"):
                continue
            with open(os.path.join(mdir, fn)) as f:
                for l in f:
                    if '"summary"' in l:
                        for k, v in json.loads(l)["counters"].items():
                            totals[k] = totals.get(k, 0) + int(v)
        for k, v in totals.items():
            assert exposed[k] == str(v), k
        assert "mq_to_db_last_commit_timestamp_seconds" in exposed
        # cumulative histogram: last bucket == count
        buckets = [
            l for l in body.splitlines()
            if l.startswith("mq_to_db_storage_worker_process_duration_seconds_bucket")
        ]
        assert buckets and buckets[-1].endswith(
            exposed["mq_to_db_storage_worker_process_duration_seconds_count"]
        )
        h = json.loads(
            urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/health", timeout=10
            ).read()
        )
        assert h["status"] == "ok" and h["last_commit"]["rows"] >= 1
    finally:
        srv.close()
