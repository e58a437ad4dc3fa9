"""Round-5 wave-154 operators: E201 exit-type absence quantiles, T207
label-conditioned norm audit, R134 price-point architecture per brand —
each vs a scalar brute-force reference on planted fixtures."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HOUR_US = 3_600_000_000


def _qdisc(vals, q):
    vals = sorted(vals)
    thr = (len(vals) * q + 999) // 1000
    return vals[thr - 1]


def test_exit_gap_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_exit_gap

    g = np.random.default_rng(149)
    n = 5000
    ts = np.sort(g.integers(0, 40 * 24 * HOUR_US, n).astype(np.int64))
    uid = g.integers(1, 40, n).astype(np.int64)
    eid = np.arange(n, dtype=np.int64)
    types = np.array(["click", "error", "view"])
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
    gaps = collections.defaultdict(list)
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
            exit_ty = a[-1][2]
            m = min((b[0][0] - a[-1][0]) // 60_000_000, 43_200)
            gaps[exit_ty].append(m)

    got = events_exit_gap(str(tmp_path)).to_pandas().set_index("exit_type")
    assert len(got) == len(gaps)
    for k, ms in gaps.items():
        row = got.loc[types[k]]
        assert int(row["n_gaps"]) == len(ms)
        assert int(row["p50_minutes"]) == _qdisc(ms, 500)
        assert int(row["p90_minutes"]) == _qdisc(ms, 900)


def test_label_norms_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import label_norms

    g = np.random.default_rng(151)
    n, d = 400, 8
    m = g.normal(0, 1, (n, d)).astype(np.float32)
    lb = g.integers(0, 4, n).astype(np.int32)
    pq.write_table(
        pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(m), pa.list_(pa.float32())),
            "label": pa.array(lb, pa.int32()),
        }),
        tmp_path / "embeddings.parquet",
    )

    agg = collections.defaultdict(lambda: [0, 0, None, None])
    for row, l in zip(m, lb):
        s = int(np.floor(1000.0 * row.astype(np.float64) ** 2)
                .astype(np.int64).sum())
        a = agg[int(l)]
        a[0] += 1
        a[1] += s
        a[2] = s if a[2] is None else min(a[2], s)
        a[3] = s if a[3] is None else max(a[3], s)

    got = label_norms(str(tmp_path)).to_pandas().set_index("label")
    for l, (nv, ss, mn, mx) in agg.items():
        row = got.loc[l]
        assert int(row["n_vectors"]) == nv
        assert int(row["sum_qnorm"]) == ss
        assert int(row["min_qnorm"]) == mn
        assert int(row["max_qnorm"]) == mx


def test_price_points_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import price_points

    g = np.random.default_rng(157)
    n_part = 200
    brands = [f"Brand#{11 + i}" for i in range(4)]
    bi = g.integers(0, 4, n_part)
    # coarse price grid so collisions exist
    price = g.integers(10, 40, n_part) * 9.99
    pq.write_table(
        pa.table({
            "p_partkey": pa.array(np.arange(1, n_part + 1, dtype=np.int64)),
            "p_brand": pa.array([brands[i] for i in bi]),
            "p_retailprice": pa.array(price),
        }),
        tmp_path / "part.parquet",
    )

    cells = collections.Counter()
    for b, p in zip(bi, price):
        cells[(int(b), int(np.floor(100 * p)))] += 1
    agg = collections.defaultdict(lambda: [0, 0, 0])
    for (b, _), n in cells.items():
        a = agg[b]
        a[0] += n
        a[1] += 1
        a[2] += n if n >= 2 else 0

    got = price_points(str(tmp_path)).to_pandas().set_index("p_brand")
    for b, (np_, pts, coll) in agg.items():
        row = got.loc[brands[b]]
        assert int(row["n_parts"]) == np_
        assert int(row["n_price_points"]) == pts
        assert int(row["n_collision_parts"]) == coll
        assert int(row["collision_permille"]) == 1000 * coll // np_
