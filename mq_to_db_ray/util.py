"""Small shared runtime helpers."""

from __future__ import annotations


def quiesce_ray_data_stats() -> None:
    """Clear Ray Data's StatsManager snapshots so its background update
    thread makes no remote call during ``ray.shutdown()``.

    Ray 2.49's stats thread wakes every 5 s and, if any execution/iteration
    snapshot is non-empty, calls the _StatsActor — racing an in-progress
    shutdown turns that into a C++ fatal ("core worker has already been
    shutdown ... The process will exit", core_worker_process.cc) that kills
    the driver with exit 1 AFTER all work succeeded.  With the snapshots
    cleared the thread just sleeps (daemon) and shutdown is clean.  Call
    immediately before ``ray.shutdown()`` in anything that owns a Ray
    session (tests, bench, CLI); harmless if Ray Data was never used.
    """
    try:
        import time

        from ray.data._internal.stats import StatsManager

        with StatsManager._stats_lock:
            StatsManager._last_execution_stats.clear()
            StatsManager._last_iteration_stats.clear()
        # let an already-in-flight update RPC finish before shutdown starts
        time.sleep(0.25)
    except Exception:
        pass
