"""Round-4 wave-54 operator: E103 session-basket type co-occurrence
matrix — vs a scalar brute force that sessionizes per user with the
same 6h gap rule."""

from __future__ import annotations

import collections
import itertools

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_type_cooccurrence_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_type_cooccurrence

    g = np.random.default_rng(390)
    n, n_users = 2500, 60
    types = np.array(["click", "view", "buy"])[g.integers(0, 3, n)]
    users = g.integers(0, n_users, n).astype(np.int64)
    hour_us = 3_600_000_000
    # bursts separated by > 6h gaps so several sessions per user exist
    ts = (
        np.datetime64("2026-01-01", "us").astype(np.int64)
        + g.integers(0, 40, n).astype(np.int64) * 7 * hour_us
        + g.integers(0, 2 * hour_us, n)
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "user_id": pa.array(users),
                "event_type": pa.array(types.tolist()),
                "value": pa.array(np.ones(n)),
                "props": pa.array(["{}"] * n),
            }
        ),
        tmp_path / "events.parquet",
    )

    per_user = collections.defaultdict(list)
    for i in range(n):
        per_user[int(users[i])].append((int(ts[i]), i, types[i]))
    session_types = []
    gap = 6 * hour_us
    for u, evs in per_user.items():
        evs.sort()
        cur = {evs[0][2]}
        for (t0, _, _), (t1, _, ty) in zip(evs, evs[1:]):
            if t1 - t0 > gap:
                session_types.append(cur)
                cur = set()
            cur.add(ty)
        session_types.append(cur)

    tot = collections.Counter()
    both = collections.Counter()
    for st in session_types:
        for t in st:
            tot[t] += 1
        for a, b in itertools.combinations(sorted(st), 2):
            both[(a, b)] += 1

    got = events_type_cooccurrence(str(tmp_path)).to_pandas()
    assert len(got) == len(both)
    for _, r in got.iterrows():
        key = (r.type_a, r.type_b)
        assert int(r.n_both) == both[key], key
        assert int(r.n_a) == tot[r.type_a], key
        assert int(r.n_b) == tot[r.type_b], key
    assert len(both) == 3  # all three pairs co-occur in this dense draw
