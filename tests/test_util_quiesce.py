"""quiesce_ray_data_stats: version gate + no-op fallback (VERDICT r4 #5)."""

from __future__ import annotations

from unittest import mock


def test_quiesce_clears_snapshots_on_ray_249(ray_session):
    import ray

    assert ray.__version__.startswith("2.49"), "sandbox pins ray 2.49"
    from ray.data._internal.stats import StatsManager

    from mq_to_db_ray.util import quiesce_ray_data_stats

    with StatsManager._stats_lock:
        StatsManager._last_execution_stats["x"] = object()
    quiesce_ray_data_stats()
    assert not StatsManager._last_execution_stats
    assert not StatsManager._last_iteration_stats


def test_quiesce_is_noop_on_other_ray_versions():
    """On a future Ray, the private-API touch must be skipped entirely."""
    import ray

    from mq_to_db_ray.util import quiesce_ray_data_stats

    with mock.patch.object(ray, "__version__", "2.99.0"):
        with mock.patch(
            "ray.data._internal.stats.StatsManager"
        ) as sm:  # would raise if touched with a Mock lock
            sm._stats_lock = None
            quiesce_ray_data_stats()
            sm._last_execution_stats.clear.assert_not_called()


def test_quiesce_survives_missing_private_module():
    """If the internal module vanishes, the helper must stay silent."""
    import builtins

    real_import = builtins.__import__

    def deny(name, *a, **k):
        if name.startswith("ray.data._internal"):
            raise ImportError(name)
        return real_import(name, *a, **k)

    from mq_to_db_ray.util import quiesce_ray_data_stats

    with mock.patch.object(builtins, "__import__", side_effect=deny):
        quiesce_ray_data_stats()  # must not raise
