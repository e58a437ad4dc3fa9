"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    from mq_to_db_ray.util import quiesce_ray_data_stats

    quiesce_ray_data_stats()
    ray.shutdown()


@pytest.fixture(scope="session")
def f1_micro():
    from mq_to_db_ray.gen import f1_table

    return f1_table(1000)


@pytest.fixture(scope="session")
def f1_small():
    from mq_to_db_ray.gen import f1_table

    return f1_table(100_000, max_tok=64)
