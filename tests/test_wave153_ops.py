"""Round-5 wave-153 operators: E200 habit-strength bands (modal-weekday
concentration), T206 embedding dimension-dominance census, R133
intra-order redundancy audit — each vs a scalar brute-force reference
on planted fixtures."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY_US = 86_400_000_000


def test_habit_strength_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_habit_strength

    g = np.random.default_rng(131)
    n = 4000
    uid = g.integers(1, 60, n).astype(np.int64)
    day = g.integers(0, 120, n).astype(np.int64)
    # habit users: always the same weekday
    habit = uid % 5 == 0
    day[habit] = (day[habit] // 7) * 7 + (uid[habit] % 7)
    ts = day * DAY_US + g.integers(0, DAY_US, n)
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(uid),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(g.uniform(0, 10, n)),
            "event_type": pa.array(["click"] * n),
        }),
        tmp_path / "events.parquet",
    )

    dows = collections.defaultdict(collections.Counter)
    for u, d in zip(uid, day):
        dows[int(u)][(int(d) + 4) % 7] += 1
    nu = collections.Counter()
    ne = collections.Counter()
    for u, c in dows.items():
        total = sum(c.values())
        if total < 7:
            continue
        band = min(1000 * max(c.values()) // total // 100, 10)
        nu[band] += 1
        ne[band] += total

    got = events_habit_strength(str(tmp_path)).to_pandas().set_index("band")
    assert sorted(got.index.tolist()) == sorted(nu)
    for band in nu:
        assert int(got.loc[band, "n_users"]) == nu[band]
        assert int(got.loc[band, "n_events"]) == ne[band]


def test_dim_dominance_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import dim_dominance

    g = np.random.default_rng(137)
    n, d = 500, 16
    m = g.normal(0, 1, (n, d)).astype(np.float32)
    m[:, 3] *= 4.0  # hog dimension
    pq.write_table(
        pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(m), pa.list_(pa.float32())),
            "label": pa.array(["a"] * n),
        }),
        tmp_path / "embeddings.parquet",
    )

    nv = collections.Counter()
    npos = collections.Counter()
    for row in m:
        arg = int(np.abs(row).argmax())
        nv[arg + 1] += 1
        if row[arg] > 0:
            npos[arg + 1] += 1

    got = dim_dominance(str(tmp_path)).to_pandas().set_index("dim")
    assert sorted(got.index.tolist()) == sorted(nv)
    for dim in nv:
        assert int(got.loc[dim, "n_vectors"]) == nv[dim]
        assert int(got.loc[dim, "n_positive"]) == npos[dim]


def test_intra_order_redundancy_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import intra_order_redundancy

    g = np.random.default_rng(139)
    n_li = 700
    lo = g.integers(1, 150, n_li).astype(np.int64)
    lp = g.integers(1, 30, n_li).astype(np.int64)
    ls = g.integers(1, 6, n_li).astype(np.int64)
    pq.write_table(
        pa.table({
            "l_orderkey": pa.array(lo),
            "l_partkey": pa.array(lp),
            "l_suppkey": pa.array(ls),
        }),
        tmp_path / "lineitem.parquet",
    )

    pairs = collections.defaultdict(lambda: [0, set()])
    for o, p, s in zip(lo, lp, ls):
        a = pairs[(int(o), int(p))]
        a[0] += 1
        a[1].add(int(s))
    orders = collections.defaultdict(lambda: [0, 0, 0])
    for (o, _), (nl, sups) in pairs.items():
        a = orders[o]
        if nl >= 2:
            a[0] = 1
            a[2] += nl
        if len(sups) >= 2:
            a[1] = 1
    no = len(orders)
    nrep = sum(a[0] for a in orders.values())
    ndual = sum(a[1] for a in orders.values())
    nlr = sum(a[2] for a in orders.values())

    got = intra_order_redundancy(str(tmp_path)).to_pandas().iloc[0]
    assert int(got["n_orders"]) == no
    assert int(got["n_repeat_part_orders"]) == nrep
    assert int(got["n_dual_source_orders"]) == ndual
    assert int(got["n_repeat_lines"]) == nlr
    assert int(got["dual_permille"]) == 1000 * ndual // max(nrep, 1)
