"""Round-4 wave-18 operators: E72 time-to-Nth-event (grouped ascending
k-th order statistic), E73 entry/exit type board, E74 inter-session gap
quantiles — each vs a scalar brute-force reference on synthetic events
with DELIBERATE timestamp ties (hour-quantized) so the (ts, event_id)
tie-break is load-bearing everywhere."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY_US = 86_400_000_000
HOUR_US = 3_600_000_000


def _write_events(tmp_path, seed: int, n: int = 800, days: int = 20):
    from mq_to_db_ray.pipelines.events import EVENTS_T0_US

    g = np.random.default_rng(seed)
    types = np.array(["a", "b", "c"])[g.integers(0, 3, n)]
    # hour-quantized -> heavy ts ties; event_id breaks them
    ts = EVENTS_T0_US + g.integers(0, days * 24, n).astype(np.int64) * HOUR_US
    users = (g.zipf(1.6, n) % 40).astype(np.int64)
    tbl = pa.table(
        {
            "event_type": pa.array(types.tolist()),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(g.uniform(0, 50, n)),
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(users),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    return types, ts, users


def test_nth_event_time_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_nth_event_time

    N = 5
    types, ts, _ = _write_events(tmp_path, seed=95)
    cells = collections.defaultdict(list)
    for i, (s, t) in enumerate(zip(types, ts)):
        cells[(s, int(t) // DAY_US)].append((int(t), i))
    want = {}
    for key, evs in cells.items():
        evs.sort()
        if len(evs) >= N:
            want[key] = (evs[N - 1][0], len(evs))

    got = events_nth_event_time(str(tmp_path), n=N).to_pandas()
    assert len(got) == len(want)
    for r in got.itertuples():
        key = (r.source, int(r.day_ts.value // 1000) // DAY_US)
        nth, cnt = want[key]
        assert int(r.nth_ts.value // 1000) == nth
        assert r.n_events == cnt


def test_entry_exit_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_entry_exit

    types, ts, users = _write_events(tmp_path, seed=96)
    per_user = collections.defaultdict(list)
    for i, (s, t, u) in enumerate(zip(types, ts, users)):
        per_user[int(u)].append((int(t), i, s))
    want = collections.Counter()
    for evs in per_user.values():
        evs.sort()
        want[(evs[0][2], evs[-1][2])] += 1

    got = events_entry_exit(str(tmp_path)).to_pandas()
    assert (
        collections.Counter(
            {(r.first_type, r.last_type): r.n_users for r in got.itertuples()}
        )
        == want
    )


def test_intersession_gaps_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_intersession_gaps

    GAP_US = 6 * HOUR_US
    _, ts, users = _write_events(tmp_path, seed=97)
    per_user = collections.defaultdict(list)
    for i, (t, u) in enumerate(zip(ts, users)):
        per_user[int(u)].append((int(t), i))
    gaps = []
    for evs in per_user.values():
        evs.sort()
        sessions = [[evs[0][0], evs[0][0]]]
        for t, _ in evs[1:]:
            if t - sessions[-1][1] > GAP_US:
                sessions.append([t, t])
            else:
                sessions[-1][1] = t
        for (st, _), (_, pe) in zip(sessions[1:], sessions[:-1]):
            gaps.append((st - pe) // 1_000_000)
    assert gaps  # the fixture must contain returning users

    got = events_intersession_gaps(str(tmp_path)).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    sg = sorted(gaps)
    n = len(sg)
    assert r.n_gaps == n
    for q, col in ((500, "p50_s"), (900, "p90_s"), (990, "p99_s")):
        thr = (n * q + 999) // 1000
        assert r[col] == sg[thr - 1], col
    assert r.max_s == sg[-1]


def test_intersession_gaps_no_returning_users(ray_session, tmp_path):
    """A corpus where nobody comes back: one session per user -> the
    n_gaps=0 row with NULL quantiles (matching the SQL aggregate)."""
    from mq_to_db_ray.pipelines.events import EVENTS_T0_US, events_intersession_gaps

    n = 50
    tbl = pa.table(
        {
            "event_type": pa.array(["a"] * n),
            "ts": pa.array(
                EVENTS_T0_US + np.arange(n, dtype=np.int64) * 1_000_000, pa.int64()
            ).cast(pa.timestamp("us")),
            "value": pa.array(np.ones(n)),
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")

    got = events_intersession_gaps(str(tmp_path)).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert r.n_gaps == 0
    assert all(r[c] is None or np.isnan(r[c]) for c in ("p50_s", "p90_s", "p99_s", "max_s"))
