"""Round-5 wave-166 operators: E213 session value by entry door, T219
duplicate-distance summary, R146 basket-size trend — each vs a scalar
brute-force reference on planted fixtures."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000


def test_session_value_doors_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_session_value_doors

    g = np.random.default_rng(353)
    n = 4000
    ts = np.sort(g.integers(0, 25 * 24 * HOUR_US, n).astype(np.int64))
    uid = g.integers(1, 45, n).astype(np.int64)
    eid = np.arange(n, dtype=np.int64)
    types = np.array(["click", "view", "push"])
    ty = g.integers(0, 3, n)
    value = g.uniform(0, 200, n)
    pq.write_table(
        pa.table({
            "event_id": pa.array(eid),
            "user_id": pa.array(uid),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(value),
            "event_type": pa.array(types[ty]),
        }),
        tmp_path / "events.parquet",
    )
    gap_us = 6 * HOUR_US

    per_user = collections.defaultdict(list)
    for e, u, t, k, v in zip(eid, uid, ts, ty, value):
        per_user[int(u)].append((int(t), int(e), int(k), int(np.floor(v))))
    agg = collections.defaultdict(lambda: [0, 0])
    for rows in per_user.values():
        rows.sort()
        cur = [rows[0]]
        sessions = []
        for prev, nxt in zip(rows, rows[1:]):
            if nxt[0] - prev[0] > gap_us:
                sessions.append(cur)
                cur = []
            cur.append(nxt)
        sessions.append(cur)
        for sess in sessions:
            a = agg[sess[0][2]]
            a[0] += 1
            a[1] += sum(v for _, _, _, v in sess)
    total = sum(a[1] for a in agg.values())

    got = events_session_value_doors(str(tmp_path)).to_pandas().set_index(
        "entry_type"
    )
    assert len(got) == len(agg)
    for k, (ns, sv) in agg.items():
        row = got.loc[types[k]]
        assert int(row["n_sessions"]) == ns
        assert int(row["value_floor"]) == sv
        assert int(row["value_share_permille"]) == 1000 * sv // max(total, 1)


def test_dup_distance_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import dup_distance

    rows = []
    for i in range(200):
        rows.append({"doc_id": i, "text": f"unique body {i}", "lang": "en",
                     "source": "s0", "n_chars": 0})
    # dup group A: winner 10, echoes 12 and 150; group B: winner 20, echo 21
    rows.append({"doc_id": 300, "text": "unique body 10", "lang": "en",
                 "source": "s0", "n_chars": 0})
    rows.append({"doc_id": 450, "text": "unique body 10", "lang": "en",
                 "source": "s0", "n_chars": 0})
    rows.append({"doc_id": 201, "text": "unique body 20", "lang": "en",
                 "source": "s0", "n_chars": 0})
    pq.write_table(pa.Table.from_pylist(rows), tmp_path / "documents.parquet")

    # echoes: 300-10=290, 450-10=440, 201-20=181
    got = dup_distance(str(tmp_path)).to_pandas().iloc[0]
    assert int(got["n_echoes"]) == 3
    assert int(got["min_dist"]) == 181
    assert int(got["max_dist"]) == 440
    assert int(got["sum_dist"]) == 290 + 440 + 181

    # dup-free corpus -> dense zero row
    import os

    os.makedirs(tmp_path / "d2", exist_ok=True)
    pq.write_table(
        pa.Table.from_pylist(rows[:50]),
        tmp_path / "d2" / "documents.parquet",
    )
    got2 = dup_distance(str(tmp_path / "d2")).to_pandas().iloc[0]
    assert int(got2["n_echoes"]) == 0
    assert int(got2["min_dist"]) == 0
    assert int(got2["max_dist"]) == 0


def test_basket_trend_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import basket_trend

    g = np.random.default_rng(359)
    n_ord, n_li = 150, 700
    oday = g.integers(9000, 11500, n_ord).astype(np.int64)
    pq.write_table(
        pa.table({
            "o_orderkey": pa.array(np.arange(1, n_ord + 1, dtype=np.int64)),
            "o_orderdate": pa.array(oday * DAY_US, pa.int64()).cast(
                pa.timestamp("us")
            ),
        }),
        tmp_path / "orders.parquet",
    )
    lo = g.integers(1, n_ord + 1, n_li).astype(np.int64)
    pq.write_table(
        pa.table({"l_orderkey": pa.array(lo)}),
        tmp_path / "lineitem.parquet",
    )

    per = collections.Counter(int(o) for o in lo)
    agg = collections.defaultdict(lambda: [0, 0, 0])
    for o, nl in per.items():
        yr = int(np.datetime64(int(oday[o - 1]), "D")
                 .astype("datetime64[Y]").astype(int)) + 1970
        a = agg[yr]
        a[0] += 1
        a[1] += nl
        a[2] += nl * nl

    got = basket_trend(str(tmp_path)).to_pandas().set_index("order_year")
    assert len(got) == len(agg)
    for yr, (no, nl, nl2) in agg.items():
        row = got.loc[yr]
        assert int(row["n_orders"]) == no
        assert int(row["n_lines"]) == nl
        assert int(row["sum_lines2"]) == nl2
