"""Round-5 wave-159 operators: E206 comeback-door attribution, T212
exact-duplicate vector audit, R139 trade-distance latency (3-hop) —
each vs a scalar brute-force reference on planted fixtures."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000


def test_return_door_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_return_door

    g = np.random.default_rng(229)
    n = 5000
    ts = np.sort(g.integers(0, 60 * 24 * HOUR_US, n).astype(np.int64))
    uid = g.integers(1, 35, n).astype(np.int64)
    eid = np.arange(n, dtype=np.int64)
    types = np.array(["click", "push", "view"])
    ty = g.integers(0, 3, n)
    pq.write_table(
        pa.table({
            "event_id": pa.array(eid),
            "user_id": pa.array(uid),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(g.uniform(0, 10, n)),
            "event_type": pa.array(types[ty]),
        }),
        tmp_path / "events.parquet",
    )
    gap_us = 6 * HOUR_US

    per_user = collections.defaultdict(list)
    for e, u, t, k in zip(eid, uid, ts, ty):
        per_user[int(u)].append((int(t), int(e), int(k)))
    agg = collections.defaultdict(lambda: [0, 0])
    for rows in per_user.values():
        rows.sort()
        sessions = []
        cur = [rows[0]]
        for prev, nxt in zip(rows, rows[1:]):
            if nxt[0] - prev[0] > gap_us:
                sessions.append(cur)
                cur = []
            cur.append(nxt)
        sessions.append(cur)
        for a, b in zip(sessions, sessions[1:]):
            entry = b[0][2]
            agg[entry][0] += 1
            if b[0][0] - a[-1][0] >= 7 * 24 * HOUR_US:
                agg[entry][1] += 1

    got = events_return_door(str(tmp_path)).to_pandas().set_index(
        "entry_type"
    )
    assert len(got) == len(agg)
    for k, (nr, nc) in agg.items():
        row = got.loc[types[k]]
        assert int(row["n_returns"]) == nr
        assert int(row["n_comebacks"]) == nc
        assert int(row["comeback_permille"]) == 1000 * nc // nr


def test_embedding_exact_dups_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import embedding_exact_dups

    g = np.random.default_rng(233)
    n, d = 300, 8
    m = g.normal(0, 1, (n, d)).astype(np.float32)
    # plant duplicates: rows 10..14 copy row 0; rows 20,21 copy row 1
    for i in range(10, 15):
        m[i] = m[0]
    m[20] = m[1]
    m[21] = m[1]
    pq.write_table(
        pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(m), pa.list_(pa.float32())),
            "label": pa.array(np.zeros(n, np.int32), pa.int32()),
        }),
        tmp_path / "embeddings.parquet",
    )

    got = embedding_exact_dups(str(tmp_path)).to_pandas().iloc[0]
    assert int(got["n_vectors"]) == n
    assert int(got["n_dup_groups"]) == 2
    assert int(got["n_dup_vectors"]) == 6 + 3
    assert int(got["max_group"]) == 6
    assert int(got["dup_permille"]) == 1000 * 9 // n


def test_trade_distance_latency_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import trade_distance_latency

    g = np.random.default_rng(239)
    n_nat, n_cust, n_supp, n_ord, n_li = 10, 40, 15, 120, 500
    nregion = g.integers(0, 3, n_nat).astype(np.int64)
    pq.write_table(
        pa.table({
            "n_nationkey": pa.array(np.arange(n_nat, dtype=np.int64)),
            "n_regionkey": pa.array(nregion),
        }),
        tmp_path / "nation.parquet",
    )
    cn = g.integers(0, n_nat, n_cust).astype(np.int64)
    pq.write_table(
        pa.table({
            "c_custkey": pa.array(np.arange(1, n_cust + 1, dtype=np.int64)),
            "c_nationkey": pa.array(cn),
        }),
        tmp_path / "customer.parquet",
    )
    sn = g.integers(0, n_nat, n_supp).astype(np.int64)
    pq.write_table(
        pa.table({
            "s_suppkey": pa.array(np.arange(1, n_supp + 1, dtype=np.int64)),
            "s_nationkey": pa.array(sn),
        }),
        tmp_path / "supplier.parquet",
    )
    ck = g.integers(1, n_cust + 1, n_ord).astype(np.int64)
    oday = g.integers(0, 300, n_ord).astype(np.int64)
    pq.write_table(
        pa.table({
            "o_orderkey": pa.array(np.arange(1, n_ord + 1, dtype=np.int64)),
            "o_custkey": pa.array(ck),
            "o_orderdate": pa.array(oday * DAY_US, pa.int64()).cast(
                pa.timestamp("us")
            ),
        }),
        tmp_path / "orders.parquet",
    )
    lo = g.integers(1, n_ord + 1, n_li).astype(np.int64)
    ls = g.integers(1, n_supp + 1, n_li).astype(np.int64)
    lag = g.integers(0, 60, n_li).astype(np.int64)
    sday = oday[lo - 1] + lag
    pq.write_table(
        pa.table({
            "l_orderkey": pa.array(lo),
            "l_suppkey": pa.array(ls),
            "l_shipdate": pa.array(sday * DAY_US, pa.int64()).cast(
                pa.timestamp("us")
            ),
        }),
        tmp_path / "lineitem.parquet",
    )

    agg = collections.defaultdict(lambda: [0, 0, 0])
    for o, s, d in zip(lo, ls, sday):
        c_nat = int(cn[ck[o - 1] - 1])
        s_nat = int(sn[s - 1])
        if c_nat == s_nat:
            cls = 0
        elif nregion[c_nat] == nregion[s_nat]:
            cls = 1
        else:
            cls = 2
        days = int(d) - int(oday[o - 1])
        a = agg[cls]
        a[0] += 1
        a[1] += days
        a[2] += days * days

    got = trade_distance_latency(str(tmp_path)).to_pandas().set_index(
        "trade_distance"
    )
    assert len(got) == len(agg)
    for cls, (n, sd, sd2) in agg.items():
        row = got.loc[cls]
        assert int(row["n_lines"]) == n
        assert int(row["sum_days"]) == sd
        assert int(row["sum_days2"]) == sd2
