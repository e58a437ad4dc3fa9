"""Round-4 wave-22 operators: E78 user type-diversity histogram, E79
dispersion sufficient stats (zero-vanishing dense-grid moments), T69
first-publisher attribution — each vs a scalar brute-force reference.
The T69 fixture plants multi-copy texts spanning sources (leader in one
source, echoes in others) plus dup-free sources (exact-zero rows)."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MIN_US = 60_000_000


def _write_events(tmp_path, seed: int, n: int = 700, n_types: int = 6):
    from mq_to_db_ray.pipelines.events import EVENTS_T0_US

    g = np.random.default_rng(seed)
    types = np.array([f"t{i}" for i in range(n_types)])[
        g.integers(0, n_types, n)
    ]
    ts = EVENTS_T0_US + g.integers(0, 300, n).astype(np.int64) * MIN_US
    # zipf users -> some see one type, some many
    users = (g.zipf(1.8, n) % 60).astype(np.int64)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(types.tolist()),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "value": pa.array(np.ones(n)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(users),
            }
        ),
        tmp_path / "events.parquet",
    )
    return types, ts, users


def test_user_type_diversity_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_user_type_diversity

    types, _, users = _write_events(tmp_path, seed=115)
    per_user = collections.defaultdict(set)
    for t, u in zip(types, users):
        per_user[int(u)].add(t)
    want = collections.Counter(len(s) for s in per_user.values())
    assert len(want) > 1  # fixture must produce a real histogram

    got = events_user_type_diversity(str(tmp_path)).to_pandas()
    assert dict(zip(got.n_types, got.n_users)) == dict(want)


def test_dispersion_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_dispersion

    types, ts, _ = _write_events(tmp_path, seed=116)
    want = {}
    for s in set(types):
        mins = [int(t) // MIN_US for t, ty in zip(ts, types) if ty == s]
        c = collections.Counter(mins)
        want[s] = (
            max(mins) - min(mins) + 1,
            sum(c.values()),
            sum(v * v for v in c.values()),
        )

    got = events_dispersion(str(tmp_path)).to_pandas().set_index("source")
    assert len(got) == len(want)
    for s, (nm, ne, sq) in want.items():
        r = got.loc[s]
        assert (r.n_minutes, r.n_events, r.sum_sq) == (nm, ne, sq)


def test_first_publisher_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import first_publisher

    g = np.random.default_rng(117)
    # unique docs across 3 sources + planted dup families
    texts, srcs = [], []
    for i in range(60):
        texts.append(f"unique doc number {i} body")
        srcs.append(f"s{i % 3}")
    # family A: leader in s0 (lowest doc_id), echoes in s1, s2
    texts += ["shared body alpha"] * 3
    srcs += ["s0", "s1", "s2"]
    # family B: all inside s1
    texts += ["shared body beta"] * 2
    srcs += ["s1", "s1"]
    # s3: dup-free source -> exact zero row
    texts.append("lonely s3 doc")
    srcs.append("s3")
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(srcs),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")

    groups = collections.defaultdict(list)
    for i, (t, s) in enumerate(zip(texts, srcs)):
        groups[t].append((i, s))
    want = {s: [0, 0, 0] for s in set(srcs)}
    for s in srcs:
        want[s][0] += 1
    for members in groups.values():
        if len(members) > 1:
            members.sort()
            want[members[0][1]][1] += 1
            for _, s in members[1:]:
                want[s][2] += 1

    got = first_publisher(str(tmp_path)).to_pandas().set_index("source")
    assert len(got) == len(want)
    for s, (nd, led, echo) in want.items():
        r = got.loc[s]
        assert (r.n_docs, r.n_led_groups, r.n_echo_docs) == (nd, led, echo), s
    assert got.loc["s3"].n_led_groups == 0 and got.loc["s3"].n_echo_docs == 0
