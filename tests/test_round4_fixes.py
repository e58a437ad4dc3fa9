"""Round-4 robustness fixes (VERDICT r3 #6 / ADVICE r3).

- quiesce_ray_data_stats must survive a Ray upgrade that removes the
  private ``ray.data._internal.stats`` module (the import is the only
  private-API touch in the repo).
- the events quantile/LOCF operators must use EXACT source identity
  (dictionary codes / broadcast rank), never a 64-bit hash, inside their
  per-partition merges.
"""

from __future__ import annotations

import sys


def test_quiesce_survives_missing_private_api(monkeypatch):
    from mq_to_db_ray.util import quiesce_ray_data_stats

    # Simulate a Ray upgrade that dropped the private module: a None entry
    # in sys.modules makes `from ray.data._internal.stats import ...`
    # raise ImportError at the call site.
    monkeypatch.setitem(sys.modules, "ray.data._internal.stats", None)
    quiesce_ray_data_stats()  # must not raise


def test_quiesce_survives_renamed_statsmanager(monkeypatch):
    import types

    from mq_to_db_ray.util import quiesce_ray_data_stats

    # Module present but StatsManager gone (attribute renamed upstream).
    monkeypatch.setitem(
        sys.modules, "ray.data._internal.stats", types.ModuleType("stats")
    )
    quiesce_ray_data_stats()  # must not raise


def test_source_identity_is_exact_not_hashed():
    """Guard ADVICE r3 #1: the quantile merge and the LOCF join key must
    not use word_hash64 of the source as GROUP/JOIN identity (a collision
    would silently merge two series).  Source-level check: the only
    hash_strings64 references left in events.py must be none."""
    import inspect

    from mq_to_db_ray.pipelines import events

    src = inspect.getsource(events)
    assert "hash_strings64" not in src
