"""Round-4 wave-14 operators: minute-grid coverage report, daily lifecycle
accounting, top-k longest sessions, PII/pattern scan, tokens-per-doc
quantiles — each vs a scalar brute-force reference on synthetic inputs
hitting the edge cases (single-minute sources, resurrection gaps,
duration ties, overlapping regex candidates, tied token counts)."""

from __future__ import annotations

import collections
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY_US = 86_400_000_000
MIN_US = 60_000_000


def _write_events(tmp_path, seed: int, n: int = 800, days: int = 11):
    from mq_to_db_ray.pipelines.events import EVENTS_T0_US

    g = np.random.default_rng(seed)
    types = np.array(["a", "b", "c"])[g.integers(0, 3, n)]
    ts = EVENTS_T0_US + g.integers(0, days * DAY_US, n).astype(np.int64)
    users = g.integers(0, 30, n).astype(np.int64)
    # source "z" exists for exactly one minute (span 1, coverage 1000)
    types[:3] = "z"
    ts[:3] = EVENTS_T0_US + 5 * MIN_US + np.array([0, 10, 59]) * 1_000_000
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


def test_grid_coverage_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_grid_coverage

    types, ts, _ = _write_events(tmp_path, seed=60)
    per_src: dict[str, set] = collections.defaultdict(set)
    for s, t in zip(types, ts):
        per_src[s].add(int(t // MIN_US))

    got = events_grid_coverage(str(tmp_path)).to_pandas().set_index("source")
    assert len(got) == len(per_src)
    for s, mins in per_src.items():
        span = max(mins) - min(mins) + 1
        assert got.loc[s].n_minutes == len(mins)
        assert got.loc[s].span_minutes == span
        assert got.loc[s].coverage_permille == (1000 * len(mins)) // span
        assert int(got.loc[s].first_ts.value // 1000) == min(mins) * MIN_US
    assert got.loc["z"].coverage_permille == 1000  # single-minute source


def test_lifecycle_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_lifecycle

    _, ts, users = _write_events(tmp_path, seed=61)
    per_user: dict[int, list] = collections.defaultdict(set)
    per_user = collections.defaultdict(set)
    for u, t in zip(users, ts):
        per_user[int(u)].add(int(t // DAY_US))
    want = collections.defaultdict(lambda: [0, 0, 0, 0])
    for dset in per_user.values():
        d = sorted(dset)
        for i, day in enumerate(d):
            if i == 0:
                want[day][0] += 1
            elif day - d[i - 1] == 1:
                want[day][1] += 1
            else:
                want[day][2] += 1
        want[d[-1]][3] += 1

    got = events_lifecycle(str(tmp_path)).to_pandas()
    assert len(got) == len(want)
    for r in got.itertuples():
        day = int(r.day_ts.value // 1000 // DAY_US)
        w = want[day]
        assert (r.n_new, r.n_returning, r.n_resurrected, r.n_last_active) == tuple(
            w
        ), day
    # ledger identity: sum of new across days == number of users
    assert got.n_new.sum() == len(per_user)
    assert got.n_last_active.sum() == len(per_user)


def test_top_sessions_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_top_sessions

    _, ts, users = _write_events(tmp_path, seed=62)
    gap_us = 6 * 3600 * 1_000_000
    per_user = collections.defaultdict(list)
    for u, t in zip(users, ts):
        per_user[int(u)].append(int(t))
    sess = []
    for u, tt in per_user.items():
        tt.sort()
        start = tt[0]
        prev = tt[0]
        n = 1
        for t in tt[1:]:
            if t - prev > gap_us:
                sess.append((u, start, prev, (prev - start) // 1_000_000, n))
                start, n = t, 0
            prev = t
            n += 1
        sess.append((u, start, prev, (prev - start) // 1_000_000, n))
    sess.sort(key=lambda s: (-s[3], s[0], s[1]))
    want = sess[:20]

    got = events_top_sessions(str(tmp_path)).to_pandas()
    assert len(got) == 20
    for r, w in zip(got.itertuples(), want):
        assert (
            r.user_id,
            int(r.start_ts.value // 1000),
            int(r.end_ts.value // 1000),
            r.dur_s,
            r.n_events,
        ) == w


def _write_docs(tmp_path, texts, srcs):
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


def test_pattern_scan_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import pattern_scan, PATTERN_SCAN

    texts = [
        "mail me at a.b@example.com or c@d.io thanks",
        "see https://example.com/x_y-z/1 and http://a.b/c now",
        "ids 1234567 and 99999 and 123456789012",
        "nothing here",
    ]
    srcs = ["s0", "s0", "s1", "s1"]
    _write_docs(tmp_path, texts, srcs)

    got = pattern_scan(str(tmp_path)).to_pandas().set_index("source")
    for s in ("s0", "s1"):
        joined = [t for t, ss in zip(texts, srcs) if ss == s]
        for name, pat in PATTERN_SCAN:
            want = sum(len(re.findall(pat, t)) for t in joined)
            assert got.loc[s][name] == want, (s, name)
    assert got.loc["s1"].n_long_numbers == 2  # 99999 is too short


def test_token_quantiles_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import token_quantiles

    g = np.random.default_rng(63)
    texts, srcs = [], []
    for s, lo, hi in (("s0", 1, 12), ("s1", 5, 40)):
        for _ in range(80):
            texts.append(" ".join("w" for _ in range(g.integers(lo, hi))))
            srcs.append(s)
    _write_docs(tmp_path, texts, srcs)

    per_src = collections.defaultdict(list)
    for t, s in zip(texts, srcs):
        per_src[s].append(len(t.split(" ")))

    got = token_quantiles(str(tmp_path)).to_pandas().set_index("source")
    for s, counts in per_src.items():
        counts.sort()
        n = len(counts)
        assert got.loc[s].n_docs == n
        for q, col in ((500, "p50_tokens"), (900, "p90_tokens"), (990, "p99_tokens")):
            thr = (n * q + 999) // 1000
            assert got.loc[s][col] == counts[thr - 1], (s, col)
        assert got.loc[s].max_tokens == counts[-1]
