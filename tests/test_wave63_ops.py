"""Round-4 wave-63 operators: E110 circadian home-hour board (planted
two-hour tie exercises the min-hour rule), T117 ingestion-order drift
board (planted shrinking tail decile), R44 balance↔activity sufficient
statistics (planted order-less customer exercises the LEFT JOIN zero) —
each vs a scalar brute-force reference."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_home_hour_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_home_hour

    g = np.random.default_rng(480)
    base = np.datetime64("2026-03-01", "us").astype(np.int64)
    n = 3000
    uid = g.integers(1, 50, n).astype(np.int64)
    ts = base + g.integers(0, 10 * 86_400_000_000, n).astype(np.int64)
    # planted tie: user 0 has 4 events at hour 7 and 4 at hour 3 over
    # different days -> min hour (3) must be the home hour
    for d in range(4):
        day = base + d * 86_400_000_000
        ts = np.append(ts, [day + 7 * 3_600_000_000, day + 3 * 3_600_000_000])
        uid = np.append(uid, [0, 0])
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array(uid),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            }
        ),
        tmp_path / "events.parquet",
    )

    per = collections.defaultdict(collections.Counter)
    for u, t in zip(uid, ts):
        per[int(u)][int((int(t) % 86_400_000_000) // 3_600_000_000)] += 1
    want_nu = collections.Counter()
    want_ne = collections.Counter()
    for u, c in per.items():
        mx = max(c.values())
        hh = min(h for h, v in c.items() if v == mx)
        want_nu[hh] += 1
        want_ne[hh] += sum(c.values())

    got = events_home_hour(str(tmp_path)).to_pandas()
    assert list(got.home_hour) == list(range(24))
    for _, r in got.iterrows():
        assert int(r.n_users) == want_nu[int(r.home_hour)], r.home_hour
        assert int(r.n_events) == want_ne[int(r.home_hour)], r.home_hour
    # user 0's tie resolved to hour 3
    assert per[0][3] == per[0][7] == 4


def test_doc_ingestion_drift_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import ingestion_drift

    g = np.random.default_rng(481)
    n = 400
    texts = []
    for i in range(n):
        if i >= 360:  # planted: last decile is short, stopword-free
            texts.append("xxx yyy")
        else:
            k = int(g.integers(5, 30))
            ws = ["the", "a", "word", "data", "of", "zebra"]
            texts.append(" ".join(ws[int(g.integers(0, 6))] for _ in range(k)))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(texts),
                "n_chars": pa.array(
                    np.array([len(t) for t in texts], np.int64)
                ),
            }
        ),
        tmp_path / "documents.parquet",
    )

    stop = {"the", "a", "of", "and", "to", "in", "is"}
    want = {d: [0, 0, 0, 0] for d in range(10)}
    for i, t in enumerate(texts):
        d = i * 10 // n
        ws = t.lower().split(" ")
        w = want[d]
        w[0] += 1
        w[1] += len(t)
        w[2] += len(ws)
        w[3] += sum(x in stop for x in ws)

    got = ingestion_drift(str(tmp_path)).to_pandas()
    assert list(got.decile) == list(range(10))
    for _, r in got.iterrows():
        nd, ch, w, st = want[int(r.decile)]
        assert int(r.n_docs) == nd
        assert int(r.sum_chars) == ch
        assert int(r.sum_words) == w
        assert int(r.sum_stop) == st
    last = got[got.decile == 9].iloc[0]
    assert int(last.sum_stop) == 0 and int(last.sum_words) == 80


def test_rel_balance_activity_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import balance_activity_stats

    g = np.random.default_rng(482)
    n_cust, n_ord = 80, 2500
    segs = np.array(["AUTO", "HOUSE", "MACH"])
    ckeys = np.arange(1, n_cust + 1, dtype=np.int64)
    cseg = segs[g.integers(0, 3, n_cust)]
    bal = g.uniform(-999, 9999, n_cust)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(ckeys),
                "c_mktsegment": pa.array(cseg),
                "c_acctbal": pa.array(bal),
            }
        ),
        tmp_path / "customer.parquet",
    )
    # planted: customers 1-10 never order (LEFT JOIN zeros)
    ock = ckeys[10:][g.integers(0, n_cust - 10, n_ord)]
    pq.write_table(
        pa.table({"o_custkey": pa.array(ock)}),
        tmp_path / "orders.parquet",
    )

    cnt = collections.Counter(int(k) for k in ock)
    want = collections.defaultdict(lambda: [0] * 6)
    for k, s, b in zip(ckeys, cseg, bal):
        bi = math.floor(b)
        n = cnt.get(int(k), 0)
        w = want[s]
        w[0] += 1
        w[1] += bi
        w[2] += bi * bi
        w[3] += n
        w[4] += n * n
        w[5] += bi * n

    got = balance_activity_stats(str(tmp_path)).to_pandas()
    assert len(got) == 3
    for _, r in got.iterrows():
        nc, sb, sb2, so, so2, sbo = want[r.c_mktsegment]
        assert int(r.n_customers) == nc
        assert int(r.sum_bal) == sb
        assert int(r.sum_bal2) == sb2
        assert int(r.sum_orders) == so
        assert int(r.sum_orders2) == so2
        assert int(r.sum_bal_orders) == sbo
