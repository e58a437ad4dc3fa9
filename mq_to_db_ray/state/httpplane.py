"""C3: HTTP pull-model observability plane for long-running (watch) mode.

The reference serves ``/metrics`` (Prometheus text exposition via promhttp,
/root/reference/cmd/mq-to-db/main.go:302-350, handler registration
internal/metrics/metrics.go:51-56) and ``/health`` (main.go:564-630) from a
mux that answers independently of work in progress.  The engine's push-model
JSONL metrics (state/metrics.py) cover batch runs; this module closes the
gap for an operator with an existing Prometheus stack: a stdlib HTTP thread
that renders the SAME state — the ``metrics/run-*.jsonl`` files plus the
worker-side commit heartbeat — in the Prometheus text format, on demand.

No third-party dependencies: ``http.server.ThreadingHTTPServer`` on a
daemon thread; ``port=0`` binds an ephemeral port (tests).  Handlers read
the metrics directory per request (cheap: one small JSONL per run), so the
server needs no coupling to the running pipeline and keeps answering while
an epoch is mid-flight — the exact property the reference's mux has.
"""

from __future__ import annotations

import json
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .metrics import DURATION_BUCKETS

_HIST = "mq_to_db_storage_worker_process_duration_seconds"


def render_prometheus(out_dir: str) -> str:
    """Aggregate every run's pushed metrics into one Prometheus text page.

    Counters sum across runs (monotonic service-lifetime totals, matching
    scrape semantics for a restarting service); the histogram is re-exposed
    cumulatively; gauges come from the latest summary plus the live
    heartbeat file.
    """
    mdir = os.path.join(out_dir, "metrics")
    counters: dict[str, int] = {}
    hist = [0] * (len(DURATION_BUCKETS) + 1)
    hist_sum_ms = 0
    latest_gauges: dict[str, int] = {}
    latest_mtime = -1.0
    files = (
        sorted(f for f in os.listdir(mdir) if f.startswith("run-"))
        if os.path.isdir(mdir)
        else []
    )
    for fn in files:
        path = os.path.join(mdir, fn)
        try:
            with open(path) as f:
                rows = [json.loads(line) for line in f if line.strip()]
        except (OSError, ValueError):
            continue
        for r in rows:
            if r.get("kind") == "partition":
                hist_sum_ms += int(r.get("wall_ms", 0))
            elif r.get("kind") == "summary":
                for k, v in r.get("counters", {}).items():
                    counters[k] = counters.get(k, 0) + int(v)
                for i, v in enumerate(r.get("duration_hist_le", {}).values()):
                    if i < len(hist):
                        hist[i] += int(v)
                mt = os.path.getmtime(path)
                if mt >= latest_mtime:
                    latest_mtime = mt
                    latest_gauges = r.get("gauges", {})
    lines: list[str] = []
    for k in sorted(counters):
        lines.append(f"# TYPE {k} counter")
        lines.append(f"{k} {counters[k]}")
    lines.append(f"# TYPE {_HIST} histogram")
    acc = 0
    for b, v in zip([str(b) for b in DURATION_BUCKETS] + ["+Inf"], hist):
        acc += v
        lines.append(f'{_HIST}_bucket{{le="{b}"}} {acc}')
    lines.append(f"{_HIST}_sum {hist_sum_ms / 1000.0}")
    lines.append(f"{_HIST}_count {acc}")
    for k in sorted(latest_gauges):
        name = f"mq_to_db_{k}" if not k.startswith("mq_to_db") else k
        lines.append(f"# TYPE {name} gauge")
        lines.append(f"{name} {latest_gauges[k]}")
    hb = _read_heartbeat(out_dir)
    if hb:
        lines.append("# TYPE mq_to_db_last_commit_timestamp_seconds gauge")
        lines.append(
            f"mq_to_db_last_commit_timestamp_seconds {hb.get('ts', 0)}"
        )
    return "\n".join(lines) + "\n"


def _read_heartbeat(out_dir: str) -> dict | None:
    try:
        with open(os.path.join(out_dir, "metrics", "heartbeat.json")) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def health_payload(out_dir: str, extra: dict | None = None) -> dict:
    """Liveness answer computed AT REQUEST TIME — unlike a heartbeat file,
    it cannot go stale while a long epoch is mid-flight (the round-2
    ADVICE finding on watch heartbeats)."""
    hb = _read_heartbeat(out_dir)
    p = dict(status="ok", ts=time.time(), **(extra or {}))
    if hb:
        p["last_commit"] = hb
    return p


class MetricsHTTPServer:
    """``/metrics`` + ``/health`` + ``/`` on a daemon thread.

    ``state`` is an optional mutable dict the owner (watch loop) may update
    in place; its items are merged into the /health payload."""

    def __init__(self, out_dir: str, port: int = 0, state: dict | None = None):
        self.out_dir = out_dir
        self.state = state if state is not None else {}
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 (stdlib API name)
                if self.path.startswith("/metrics"):
                    body = render_prometheus(outer.out_dir).encode()
                    ctype = "text/plain; version=0.0.4; charset=utf-8"
                elif self.path.startswith("/health"):
                    body = json.dumps(
                        health_payload(outer.out_dir, dict(outer.state))
                    ).encode()
                    ctype = "application/json"
                elif self.path == "/":
                    body = b"mq_to_db_ray: /metrics /health\n"
                    ctype = "text/plain"
                else:
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # silence per-request stderr noise
                pass

        self._srv = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self.port = self._srv.server_address[1]
        self._thread = threading.Thread(
            target=self._srv.serve_forever, name="mq2db-http", daemon=True
        )
        self._thread.start()

    def close(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()
        self._thread.join(timeout=5)
