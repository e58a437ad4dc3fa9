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

        import ray

        # The touch below is a private-API workaround verified against
        # Ray 2.49 only.  On any other Ray, skip it entirely (and say so
        # once) rather than poking internals whose locking semantics may
        # have changed — the worst case there is the pre-existing benign
        # race, not corruption.  VERDICT r4 #5.
        if not ray.__version__.startswith("2.49"):
            import logging

            logging.getLogger(__name__).info(
                "quiesce_ray_data_stats: no-op on Ray %s (workaround is "
                "version-gated to 2.49)", ray.__version__,
            )
            return

        from ray.data._internal.stats import StatsManager

        with StatsManager._stats_lock:
            StatsManager._last_execution_stats.clear()
            StatsManager._last_iteration_stats.clear()
        # let an already-in-flight update RPC finish before shutdown starts
        time.sleep(0.25)
    except Exception:
        pass
