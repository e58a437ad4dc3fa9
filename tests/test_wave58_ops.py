"""Round-4 wave-58 operators: T111 argmax-dimension routing board
(planted tie rows exercise the first-max rule), E106 session-ordinal
maturity board (planted 12-session user exercises the cap bucket), R39
list-vs-realized pricing board (planted zero-line brand exercises the
dense densify) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_embedding_argmax_router_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import embedding_argmax_router

    g = np.random.default_rng(430)
    n, d = 600, 6
    vecs = g.uniform(-2.0, 2.0, size=(n, d)).astype(np.float32)
    # planted ties: rows 0-19 repeat their max at a LATER dim — the
    # first-max (SQL min(dim)) rule decides
    for i in range(20):
        j = int(np.argmax(vecs[i]))
        vecs[i, (j + 2) % d] = vecs[i, j]
    labels = g.integers(0, 5, n).astype(np.int32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
                "label": pa.array(labels),
            }
        ),
        tmp_path / "embeddings.parquet",
    )

    want_n = collections.Counter()
    want_s = collections.defaultdict(int)
    for i in range(n):
        row = vecs[i]
        j = min(k for k in range(d) if row[k] == row.max())
        key = (int(labels[i]), j + 1)
        want_n[key] += 1
        want_s[key] += int(math.floor(1000.0 * float(np.float64(row[j]))))

    got = embedding_argmax_router(str(tmp_path)).to_pandas()
    assert len(got) == len(want_n)
    for _, r in got.iterrows():
        key = (int(r.label), int(r.dim))
        assert int(r.n_vecs) == want_n[key], key
        assert int(r.peak_milli) == want_s[key], key


def test_events_session_maturity_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_session_maturity

    g = np.random.default_rng(431)
    gap_us = 6 * 3600 * 1_000_000
    min_us = 60_000_000
    n_users, n_ev = 30, 2000
    base = np.datetime64("2026-03-01", "us").astype(np.int64)
    uid = g.integers(1, n_users, n_ev).astype(np.int64)
    ts = base + g.integers(0, 20 * 86_400_000_000, n_ev).astype(np.int64)
    # planted: user 0 has 12 sessions of 3 events each, 7h apart — the
    # 8+ cap bucket must absorb sessions 8..12
    for s in range(12):
        t0 = base + s * 7 * 3600 * 1_000_000
        for j in range(3):
            uid = np.append(uid, 0)
            ts = np.append(ts, t0 + j * 90_000_000)
    val = g.uniform(0, 10, len(uid))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(len(uid), dtype=np.int64)),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "user_id": pa.array(uid),
                "value": pa.array(val),
            }
        ),
        tmp_path / "events.parquet",
    )

    per_user = collections.defaultdict(list)
    for i in range(len(uid)):
        per_user[int(uid[i])].append((int(ts[i]), i))
    want = collections.defaultdict(lambda: [0, 0, 0])  # n, ev, mins
    for u, evs in per_user.items():
        evs.sort()
        sessions = []
        for t, i in evs:
            if not sessions or t - sessions[-1][-1][0] > gap_us:
                sessions.append([])
            sessions[-1].append((t, i))
        for idx, s in enumerate(sessions):
            o = min(idx + 1, 8)
            want[o][0] += 1
            want[o][1] += len(s)
            want[o][2] += s[-1][0] // min_us - s[0][0] // min_us

    got = events_session_maturity(str(tmp_path)).to_pandas()
    assert sorted(got["session_ordinal"]) == sorted(want)
    for _, r in got.iterrows():
        n, ev, mn = want[int(r.session_ordinal)]
        assert (
            int(r.n_sessions),
            int(r.sum_events),
            int(r.sum_minutes),
        ) == (n, ev, mn), r.session_ordinal
    # the cap bucket exists and absorbed the planted user's 8th..12th
    # sessions (random users may add more — brute force already agreed)
    tail = got[got.session_ordinal == 8].iloc[0]
    assert int(tail.n_sessions) >= 5 and int(tail.sum_events) >= 15


def test_pricing_margin_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import pricing_margin

    g = np.random.default_rng(432)
    n_part, n_line = 120, 900
    brands = np.array([f"BR{i}" for i in range(5)])
    pbrand = brands[g.integers(0, 4, n_part)]  # BR4 starts with no parts
    pbrand[-3:] = "BR4"  # BR4 exists in the dim but gets no lines
    price = np.round(g.uniform(100.0, 2000.0, n_part), 2)
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
                "p_brand": pa.array(pbrand),
                "p_retailprice": pa.array(price),
            }
        ),
        tmp_path / "part.parquet",
    )
    lpart = g.integers(0, n_part - 3, n_line).astype(np.int64)
    qty = g.integers(1, 51, n_line).astype(np.float64)
    ext = np.round(g.uniform(50.0, 90000.0, n_line), 2)
    disc = np.where(g.random(n_line) < 0.5, 0.0, np.round(
        g.uniform(0.01, 0.1, n_line), 2))
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array(lpart),
                "l_quantity": pa.array(qty),
                "l_extendedprice": pa.array(ext),
                "l_discount": pa.array(disc),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    list_c = np.floor(100.0 * price).astype(np.int64)
    ext_c = np.floor(100.0 * ext).astype(np.int64)
    dflag = (np.floor(1000.0 * disc).astype(np.int64) > 0).astype(int)
    want = {b: [0, 0, 0, 0] for b in brands}
    for i in range(n_line):
        b = str(pbrand[lpart[i]])
        want[b][0] += 1
        want[b][1] += int(dflag[i])
        want[b][2] += int(list_c[lpart[i]]) * int(qty[i])
        want[b][3] += int(ext_c[i])

    got = pricing_margin(str(tmp_path)).to_pandas()
    assert sorted(got["p_brand"]) == sorted(brands)  # dense incl. BR4
    for _, r in got.iterrows():
        n, nd, lc, rc = want[str(r.p_brand)]
        assert (
            int(r.n_lines),
            int(r.n_disc_lines),
            int(r.list_cents),
            int(r.realized_cents),
        ) == (n, nd, lc, rc), r.p_brand
    br4 = got[got.p_brand == "BR4"].iloc[0]
    assert int(br4.n_lines) == 0 and int(br4.list_cents) == 0
