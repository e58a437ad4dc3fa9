"""Round-5 wave-151 operators: E198 source-scoped session board, T204
weakest-link rarity bands, R131 fragmentation-latency coupling — each
vs a scalar brute-force reference on planted fixtures."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000


def test_scoped_sessions_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_scoped_sessions

    g = np.random.default_rng(101)
    n = 4000
    ts = np.sort(g.integers(0, 25 * 24 * HOUR_US, n).astype(np.int64))
    uid = g.integers(1, 40, n).astype(np.int64)
    eid = np.arange(n, dtype=np.int64)
    types = np.array(["click", "view", "purchase"])
    ty = g.integers(0, 3, n)
    pq.write_table(
        pa.table({
            "event_id": pa.array(eid),
            "user_id": pa.array(uid),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(g.uniform(0, 100, n)),
            "event_type": pa.array(types[ty]),
        }),
        tmp_path / "events.parquet",
    )
    gap_us = 6 * HOUR_US

    def qdisc(vals, q):
        vals = sorted(vals)
        thr = (len(vals) * q + 999) // 1000
        return vals[thr - 1]

    streams = collections.defaultdict(list)
    for e, u, t, k in zip(eid, uid, ts, ty):
        streams[(int(u), int(k))].append((int(t), int(e)))
    sizes = collections.defaultdict(list)
    for (u, k), rows in streams.items():
        rows.sort()
        cnt = 0
        prev = None
        for t, e in rows:
            if prev is not None and t - prev > gap_us:
                sizes[k].append(cnt)
                cnt = 0
            cnt += 1
            prev = t
        sizes[k].append(cnt)

    got = events_scoped_sessions(str(tmp_path)).to_pandas().set_index(
        "source"
    )
    for k, name in enumerate(types):
        row = got.loc[name]
        assert int(row["n_sessions"]) == len(sizes[k])
        assert int(row["n_events"]) == sum(sizes[k])
        assert int(row["p50_events"]) == qdisc(sizes[k], 500)


def test_weakest_link_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import weakest_link

    g = np.random.default_rng(103)
    common = [f"c{i}" for i in range(8)]
    rows = []
    for i in range(300):
        src = f"s{i % 2}"
        n_words = int(g.integers(1, 15))
        words = [common[int(g.integers(0, len(common)))]
                 for _ in range(n_words)]
        if i % 5 == 0:
            words.append(f"rare{i}")  # corpus frequency 1
        rows.append({"doc_id": i, "text": " ".join(words), "lang": "en",
                     "source": src, "n_chars": 0})
    pq.write_table(pa.Table.from_pylist(rows), tmp_path / "documents.parquet")

    freq = collections.Counter()
    for r in rows:
        for w in r["text"].split(" "):
            freq[w] += 1
    agg = collections.Counter()
    for r in rows:
        mf = min(freq[w] for w in set(r["text"].split(" ")))
        agg[(r["source"], mf.bit_length())] += 1

    got = weakest_link(str(tmp_path)).to_pandas()
    assert len(got) == len(agg)
    for _, row in got.iterrows():
        assert int(row["n_docs"]) == agg[(row["source"], int(row["band"]))]


def test_fragmentation_latency_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import fragmentation_latency

    g = np.random.default_rng(107)
    n_ord, n_li = 120, 700
    lo = g.integers(1, n_ord + 1, n_li).astype(np.int64)
    sup = g.integers(1, 15, n_li).astype(np.int64)
    sday = g.integers(0, 200, n_li).astype(np.int64)
    pq.write_table(
        pa.table({
            "l_orderkey": pa.array(lo),
            "l_suppkey": pa.array(sup),
            "l_shipdate": pa.array(sday * DAY_US, pa.int64()).cast(
                pa.timestamp("us")
            ),
        }),
        tmp_path / "lineitem.parquet",
    )

    per_order = collections.defaultdict(lambda: [set(), 0, None, None])
    for o, s, d in zip(lo, sup, sday):
        a = per_order[int(o)]
        a[0].add(int(s))
        a[1] += 1
        a[2] = int(d) if a[2] is None else min(a[2], int(d))
        a[3] = int(d) if a[3] is None else max(a[3], int(d))
    agg = collections.defaultdict(lambda: [0, 0, 0])
    for sups, nl, mn, mx in per_order.values():
        a = agg[len(sups)]
        a[0] += 1
        a[1] += nl
        a[2] += mx - mn

    got = fragmentation_latency(str(tmp_path)).to_pandas().set_index(
        "n_suppliers"
    )
    assert len(got) == len(agg)
    for k, (no, nl, sp) in agg.items():
        row = got.loc[k]
        assert int(row["n_orders"]) == no
        assert int(row["n_lines"]) == nl
        assert int(row["sum_spread_days"]) == sp
