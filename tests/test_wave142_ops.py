"""Round-5 wave-142 operators: E189/E190 Zipf-skew sessionize / range-join
stress twins (the hot key's sessions and interval lookups MUST cross 6h
sub-window boundaries), T196 per-doc half-Jaccard quantiles (long-range
internal redundancy), R123 price↔volume coupling moments per part type —
each vs a scalar brute-force reference on planted fixtures."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HOUR_US = 3_600_000_000


def _brute_sessions(eid, uid, ts, vals, gap_us):
    """{(uid, sid): (n, start, end, sum_v)} via a scalar scan."""
    per_user = collections.defaultdict(list)
    for e, u, t, v in zip(eid, uid, ts, vals):
        per_user[int(u)].append((int(t), int(e), int(v)))
    out = {}
    for u, rows in per_user.items():
        rows.sort()
        sid = -1
        prev_t = None
        for t, e, v in rows:
            if prev_t is None or t - prev_t > gap_us:
                sid += 1
                out[(u, sid)] = [0, t, t, 0]
            rec = out[(u, sid)]
            rec[0] += 1
            rec[2] = t
            rec[3] += v
            prev_t = t
    return out


def test_skew_sessions_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_skew_sessions

    g = np.random.default_rng(7)
    n = 4000
    ts = np.sort(g.integers(0, 40 * 24 * HOUR_US, n).astype(np.int64))
    uid = g.integers(1, 40, n).astype(np.int64)
    eid = np.arange(n, dtype=np.int64)
    value = g.uniform(0, 100, n)
    pq.write_table(
        pa.table({
            "event_id": pa.array(eid),
            "user_id": pa.array(uid),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(value),
            "event_type": pa.array(["click"] * n),
        }),
        tmp_path / "events.parquet",
    )
    gap_us = 6 * HOUR_US
    got = (
        events_skew_sessions(str(tmp_path), gap_s=6 * 3600,
                             window_us=6 * HOUR_US)
        .to_pandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    skew_uid = np.where(eid % 2 == 0, 0, uid)
    want = _brute_sessions(eid, skew_uid, ts, np.floor(value), gap_us)
    assert len(got) == len(want)
    for row in got.itertuples():
        key = (int(row.user_id), int(row.session_id))
        n_ev, start, end, sv = want[key]
        assert row.n_events == n_ev, key
        assert row.start_ts.value // 1000 == start, key
        assert row.end_ts.value // 1000 == end, key
        assert row.sum_value == sv, key
    # the hot key exists and its sessions merged across >1 window
    hot = got[got["user_id"] == 0]
    assert len(hot) >= 1
    span_us = (
        hot["end_ts"].max() - hot["start_ts"].min()
    ) / np.timedelta64(1, "us")
    assert span_us > 6 * HOUR_US  # crossed sub-window boundaries


def test_skew_session_join_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_skew_session_join

    g = np.random.default_rng(13)
    n = 3000
    ts = np.sort(g.integers(0, 30 * 24 * HOUR_US, n).astype(np.int64))
    uid = g.integers(1, 25, n).astype(np.int64)
    eid = np.arange(n, dtype=np.int64)
    pq.write_table(
        pa.table({
            "event_id": pa.array(eid),
            "user_id": pa.array(uid),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(g.uniform(0, 100, n)),
            "event_type": pa.array(["click"] * n),
        }),
        tmp_path / "events.parquet",
    )
    gap_us = 6 * HOUR_US
    got = (
        events_skew_session_join(str(tmp_path), gap_s=6 * 3600,
                                 window_us=6 * HOUR_US)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    skew_uid = np.where(eid % 2 == 0, 0, uid)
    sess = _brute_sessions(eid, skew_uid, ts, np.zeros(n), gap_us)
    # invert: every event falls in exactly one of its user's sessions
    want_sid = {}
    for (u, sid), (_, start, end, _) in sess.items():
        for e, su, t in zip(eid, skew_uid, ts):
            if su == u and start <= t <= end:
                want_sid[int(e)] = sid
    assert len(got) == n
    for row in got.itertuples():
        assert int(row.session_id) == want_sid[int(row.event_id)], row.event_id


def test_half_jaccard_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import half_jaccard

    docs = [
        # templated: halves share most vocabulary
        ("s1", "alpha beta gamma delta alpha beta gamma delta"),
        ("s1", "x y z x y z"),
        ("s1", "one two three four five six seven eight"),  # disjoint halves
        ("s2", "a"),            # 1 word: half A empty -> jaccard 0
        ("s2", "p q p q p"),
        ("s2", "m n m n"),
    ]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
            "text": pa.array([t for _, t in docs]),
            "lang": pa.array(["en"] * len(docs)),
            "source": pa.array([s for s, _ in docs]),
            "n_chars": pa.array(
                [len(t) for _, t in docs], pa.int64()
            ),
        }),
        tmp_path / "documents.parquet",
    )
    got = half_jaccard(str(tmp_path)).to_pandas().set_index("source")

    perms = collections.defaultdict(list)
    for s, t in docs:
        words = t.split(" ")
        a = set(words[: len(words) // 2])
        b = set(words[len(words) // 2:])
        u = a | b
        perms[s].append(1000 * len(a & b) // len(u) if u else 0)

    def disc_q(vals, q):
        v = sorted(vals)
        thr = (len(v) * q + 999) // 1000
        return v[max(thr - 1, 0)]

    for s, vals in perms.items():
        assert got.loc[s, "n_docs"] == len(vals)
        assert got.loc[s, "p50_permille"] == disc_q(vals, 500), (s, vals)
        assert got.loc[s, "p90_permille"] == disc_q(vals, 900), (s, vals)


def test_type_price_volume_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import type_price_volume

    g = np.random.default_rng(31)
    n_parts, n_lines = 40, 3000
    types = np.array(["brass", "copper", "steel"])
    p_type = types[g.integers(0, 3, n_parts)]
    pq.write_table(
        pa.table({
            "p_partkey": pa.array(np.arange(1, n_parts + 1, dtype=np.int64)),
            "p_type": pa.array(p_type.tolist()),
        }),
        tmp_path / "part.parquet",
    )
    lpk = g.integers(1, n_parts + 1, n_lines).astype(np.int64)
    qty = g.uniform(1, 50, n_lines)
    ext = g.uniform(100, 10_000, n_lines)
    dis = g.uniform(0, 0.1, n_lines).round(2)
    pq.write_table(
        pa.table({
            "l_partkey": pa.array(lpk),
            "l_quantity": pa.array(qty),
            "l_extendedprice": pa.array(ext),
            "l_discount": pa.array(dis),
        }),
        tmp_path / "lineitem.parquet",
    )
    got = type_price_volume(str(tmp_path)).to_pandas().set_index("p_type")

    q = np.floor(qty).astype(np.int64)
    v = np.floor(ext * (1.0 - dis)).astype(np.int64)
    ty = p_type[lpk - 1]
    for t in types:
        m = ty == t
        assert got.loc[t, "n_lines"] == int(m.sum())
        assert got.loc[t, "sum_q"] == int(q[m].sum())
        assert got.loc[t, "sum_v"] == int(v[m].sum())
        assert got.loc[t, "sum_qv"] == int((q[m] * v[m]).sum())
        assert got.loc[t, "sum_q2"] == int((q[m] ** 2).sum())
        assert got.loc[t, "sum_v2"] == int((v[m] ** 2).sum())
