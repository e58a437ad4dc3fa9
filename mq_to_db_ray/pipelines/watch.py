"""Continuous operation: watch an input directory and run each batch of
newly-arrived parquet files as one cascade epoch.

The daemon analog of the reference service loop (blocking consume until
signal, /root/reference/cmd/mq-to-db/main.go:353): the queue is a
directory, a delivery batch is the set of files not yet processed, and the
epoch ledger (files already consumed) lives beside the manifest so a
restarted watcher resumes exactly where it stopped — same ack-once
semantics, file granularity.
"""

from __future__ import annotations

import json
import os
import time

LEDGER = "_EPOCHS.jsonl"


def processed_files(out_dir: str) -> set[str]:
    path = os.path.join(out_dir, LEDGER)
    seen: set[str] = set()
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                seen.update(json.loads(line)["files"])
    return seen


def _record_epoch(out_dir: str, files: list[str], summary: dict) -> None:
    path = os.path.join(out_dir, LEDGER)
    entry = dict(
        files=sorted(files),
        epoch=summary["epoch"],
        rows=summary["rows"],
        rejects=summary["rejects"],
        ts=time.time(),
    )
    with open(path, "a") as f:
        f.write(json.dumps(entry) + "\n")
        f.flush()
        os.fsync(f.fileno())


def run_pending_epoch(in_dir: str, out_dir: str, **cascade_kwargs) -> dict | None:
    """Process each not-yet-consumed parquet file as its OWN epoch (arrival
    order); returns a combined summary, or None if nothing new arrived.

    Per-FILE epochs make the epoch identity stable across restarts: if the
    watcher crashes after committing file A but before recording it, the
    replay of A re-derives the SAME epoch fingerprint, so every partition
    is skipped by the manifest instead of double-committed (which a
    batch-of-files fingerprint would do once a new file changes the set).
    Partition accretion is bounded by compaction (pipelines/compact.py).
    """
    from .cascade import run_cascade

    seen = processed_files(out_dir)
    pending = sorted(
        os.path.join(in_dir, f)
        for f in os.listdir(in_dir)
        if f.endswith(".parquet") and os.path.join(in_dir, f) not in seen
    )
    if not pending:
        return None
    summaries = []
    for path in pending:
        s = run_cascade([path], out_dir, **cascade_kwargs)
        _record_epoch(out_dir, [path], s)
        summaries.append(s)
    last = summaries[-1]
    return dict(
        run_id=last["run_id"],
        epoch=last["epoch"],
        epochs=[s["epoch"] for s in summaries],
        rows=sum(s["rows"] for s in summaries),
        rejects=sum(s["rejects"] for s in summaries),
        partitions=last["partitions"],
        skipped=last["skipped"],
        metrics_path=last["metrics_path"],
        files=len(pending),
    )


def write_health(path: str, **fields) -> None:
    """Atomically refresh the liveness probe file — the daemon analog of the
    reference's ``/health`` endpoint (/root/reference/cmd/mq-to-db/main.go:
    302-350, handler main.go:564-630).

    When driven by ``watch(..., health_file=)``, a background timer thread
    refreshes the file every poll interval INCLUDING while an epoch is
    mid-flight, so staleness of ``ts`` really means the daemon is dead
    (the reference's /health property).  For a pull-model probe serve the
    HTTP plane instead: ``watch(..., http_port=0)`` / ``state.httpplane``
    — its /health is computed at request time and includes the
    worker-side commit heartbeat.  Concurrent writers are safe: each
    write stages to a unique temp name and atomically replaces."""
    import uuid

    tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(dict(status="ok", ts=time.time(), **fields), f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def watch(
    in_dir: str,
    out_dir: str,
    *,
    interval_s: float = 5.0,
    max_epochs: int | None = None,
    stop_flag=None,
    health_file: str | None = None,
    http_port: int | None = None,
    **cascade_kwargs,
):
    """Poll until stopped; yields each epoch summary (generator, so the CLI
    can log/flush between epochs and tests can drive it deterministically).
    ``health_file`` (optional) is heartbeat-refreshed every poll iteration —
    the unattended-daemon liveness probe.  ``http_port`` (optional; 0 =
    ephemeral) serves the pull-model plane — Prometheus ``/metrics`` +
    request-time ``/health`` — for the daemon's lifetime; the bound port is
    exposed to consumers via the first yielded summary's ``http_port``."""
    import threading

    server = None
    state: dict = dict(in_dir=in_dir, out_dir=out_dir, epochs_processed=0)
    if http_port is not None:
        from ..state.httpplane import MetricsHTTPServer

        server = MetricsHTTPServer(out_dir, port=http_port, state=state)
    hb_stop = threading.Event()
    hb_thread = None
    if health_file:
        # liveness heartbeat from a timer thread so ``ts`` stays fresh
        # WHILE an epoch runs (round-2 ADVICE: an epoch longer than the
        # monitor's staleness threshold made a live watcher look dead)
        def _hb_loop() -> None:
            while not hb_stop.is_set():
                write_health(health_file, **dict(state))
                hb_stop.wait(min(interval_s, 2.0))

        hb_thread = threading.Thread(
            target=_hb_loop, name="mq2db-health", daemon=True
        )
        hb_thread.start()
    n = 0
    try:
        while max_epochs is None or n < max_epochs:
            if stop_flag is not None and stop_flag():
                return
            s = run_pending_epoch(in_dir, out_dir, **cascade_kwargs)
            state["epochs_processed"] = n + (1 if s is not None else 0)
            state["last_epoch"] = (s or {}).get("epoch")
            if health_file:
                write_health(health_file, **dict(state))
            if s is not None:
                n += 1
                if server is not None:
                    s = dict(s, http_port=server.port)
                yield s
            elif max_epochs is not None:
                return  # drained in bounded mode
            else:
                time.sleep(interval_s)
    finally:
        if hb_thread is not None:
            hb_stop.set()
            hb_thread.join(timeout=5)
            write_health(health_file, **dict(state))  # final snapshot
        if server is not None:
            server.close()
