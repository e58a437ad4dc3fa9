"""E10: per-partition counters/histograms with the reference's metric names.

Reference instrumentation (`/root/reference/internal/metrics/metrics.go`):
  consumer_messages_total          (metrics.go:95-103)   -> rows read
  storage_worker_messages_total    (metrics.go:115-123)  -> rows processed
  storer_messages_total{ack/rejected} (metrics.go:136-183) -> rows acked / dead-lettered
  storage_worker_process_duration_seconds histogram (metrics.go:124-133)
                                   -> per-partition wall-time histogram

A streaming batch job cannot rely on pull scrapes mid-task, so metrics are
*pushed*: one JSONL row per partition commit plus a run summary, written
under ``out/metrics/``.  Throughput (sequences/sec, tokens/sec) is derived
from these rows — the analog of Grafana's
``sum(rate(mq_to_db_storer_messages_total[1m]))`` headline panel.
"""

from __future__ import annotations

import json
import os
import time

# Histogram bucket bounds in seconds — same shape as the reference's
# worker-duration histogram (metrics.go:128), scaled for batch partitions.
DURATION_BUCKETS = [0.1, 0.5, 1, 2, 5, 10, 15, 30, 60]


class MetricsSink:
    def __init__(self, out_dir: str, run_id: str):
        self.dir = os.path.join(out_dir, "metrics")
        os.makedirs(self.dir, exist_ok=True)
        self.run_id = run_id
        self.counters: dict[str, int] = {
            "mq_to_db_consumer_messages_total": 0,
            "mq_to_db_storage_worker_messages_total": 0,
            "mq_to_db_storer_messages_ack_total": 0,
            "mq_to_db_storer_messages_rejected_total": 0,
            "mq_to_db_storer_messages_errors_total": 0,
        }
        self.hist = [0] * (len(DURATION_BUCKETS) + 1)
        self.partition_rows: list[dict] = []
        self.t0 = time.perf_counter()

    def inc(self, name: str, n: int = 1) -> None:
        self.counters[name] = self.counters.get(name, 0) + n

    def observe_partition(self, row: dict) -> None:
        self.partition_rows.append(row)
        wall_s = row.get("wall_ms", 0) / 1000.0
        i = 0
        while i < len(DURATION_BUCKETS) and wall_s > DURATION_BUCKETS[i]:
            i += 1
        self.hist[i] += 1

    def gauges(self) -> dict:
        """Point-in-time gauges — the analog of the reference's custom
        collector (up / build info / pool stats,
        /root/reference/internal/metrics/dbCollector.go:100-143): engine up,
        cluster + available CPUs (the 'pool'), partitions committed so far,
        rows acked so far.  Sampled at flush (push model)."""
        g = {
            "mq_to_db_up": 1,
            "partitions_committed": sum(
                1 for r in self.partition_rows if not r.get("skipped")
            ),
            "rows_in_partitions": sum(
                int(r.get("rows", 0)) for r in self.partition_rows
            ),
        }
        try:
            import ray

            if ray.is_initialized():
                g["pool_cpus_total"] = int(
                    ray.cluster_resources().get("CPU", 0)
                )
                g["pool_cpus_available"] = int(
                    ray.available_resources().get("CPU", 0)
                )
        except Exception:
            pass
        # worker-side commit heartbeat (mid-run freshness — see
        # TierPartitionWriter._heartbeat): present + age since last commit
        hb = os.path.join(self.dir, "heartbeat.json")
        try:
            with open(hb) as f:
                ts = json.load(f).get("ts", 0)
            g["heartbeat_present"] = 1
            g["heartbeat_age_ms"] = max(0, int((time.time() - ts) * 1000))
        except (OSError, ValueError):
            g["heartbeat_present"] = 0
        return g

    def flush(self, extra: dict | None = None) -> str:
        path = os.path.join(self.dir, f"run-{self.run_id}.jsonl")
        wall = time.perf_counter() - self.t0
        with open(path, "w") as f:
            for row in self.partition_rows:
                f.write(json.dumps({"kind": "partition", **row}) + "\n")
            summary = {
                "kind": "summary",
                "run_id": self.run_id,
                "wall_sec": wall,
                "counters": self.counters,
                "gauges": self.gauges(),
                "duration_hist_le": dict(
                    zip([str(b) for b in DURATION_BUCKETS] + ["+Inf"], self.hist)
                ),
                **(extra or {}),
            }
            f.write(json.dumps(summary) + "\n")
        return path
