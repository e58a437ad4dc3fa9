"""Registry bookkeeping invariants, derived from queries_meta() (VERDICT r4 #8).

These assertions replace the three hand-maintained tallies (BASELINE.md
counts, window-allocation prose, judge recounts) with mechanical checks:
whatever queries_meta() derives from the live registries must satisfy the
driver-window contract.
"""

from __future__ import annotations


def test_window_is_first_50_and_oracle_backed():
    import __ray_entry__ as e

    meta = e.queries_meta()
    keys = list(e.queries())
    assert len(e._WINDOW) == 50
    assert len(set(e._WINDOW)) == 50
    assert keys[:50] == e._WINDOW, "driver window must be the first 50 keys"
    assert all(meta[k]["oracle"] for k in e._WINDOW), (
        "every windowed entry needs an oracle_sql() entry"
    )


def test_meta_matches_registries():
    import __ray_entry__ as e

    meta = e.queries_meta()
    q, o = e.queries(), e.oracle_sql()
    assert set(meta) == set(q)
    assert {k for k, m in meta.items() if m["oracle"]} == set(o) & set(q)
    # every oracle key corresponds to a registered query
    assert set(o) <= set(q), sorted(set(o) - set(q))
    suites = {m["suite"] for m in meta.values()}
    assert suites <= {"relational", "events", "f1", "embedding", "text"}


def test_round5_window_rotation_no_repeats():
    """Round-5 contract: zero repeats vs every prior round's driver rows."""
    import json
    import os

    import __ray_entry__ as e

    prior = set()
    for r in (1, 2, 3, 4):
        p = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), f"CORRECTNESS_r0{r}.json")
        if os.path.exists(p):
            prior.update(json.load(open(p)))
    overlap = prior & set(e._WINDOW)
    assert not overlap, sorted(overlap)
