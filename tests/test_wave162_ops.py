"""Round-5 wave-162 operators: E209 circadian migration matrix, T215
quantization dead-zone census, R142 cohort first-year value — each vs a
scalar brute-force reference on planted fixtures."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000


def test_clock_migration_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_clock_migration

    g = np.random.default_rng(277)
    n = 4000
    ts = np.sort(g.integers(0, 40 * DAY_US, n).astype(np.int64))
    uid = g.integers(1, 60, n).astype(np.int64)
    eid = np.arange(n, dtype=np.int64)
    pq.write_table(
        pa.table({
            "event_id": pa.array(eid),
            "user_id": pa.array(uid),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(g.uniform(0, 10, n)),
            "event_type": pa.array(["click"] * n),
        }),
        tmp_path / "events.parquet",
    )

    per_user = collections.defaultdict(list)
    for e, u, t in zip(eid, uid, ts):
        per_user[int(u)].append((int(t), int(e)))
    agg = collections.Counter()
    for rows in per_user.values():
        if len(rows) < 2:
            continue
        rows.sort()
        half = len(rows) // 2
        cnts = [np.zeros(4, np.int64), np.zeros(4, np.int64)]
        for i, (t, _) in enumerate(rows):
            band = t // HOUR_US % 24 // 6
            cnts[0 if i < half else 1][band] += 1
        agg[(int(cnts[0].argmax()), int(cnts[1].argmax()))] += 1

    got = events_clock_migration(str(tmp_path)).to_pandas()
    assert len(got) == len(agg)
    for _, row in got.iterrows():
        assert int(row["n_users"]) == agg[
            (int(row["early_band"]), int(row["late_band"]))
        ]


def test_embedding_deadzone_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import embedding_deadzone

    g = np.random.default_rng(281)
    n, d = 400, 6
    m = g.normal(0, 0.002, (n, d)).astype(np.float32)  # heavy deadzone
    m[g.uniform(0, 1, (n, d)) < 0.1] = 0.0
    pq.write_table(
        pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(m), pa.list_(pa.float32())),
            "label": pa.array(np.zeros(n, np.int32), pa.int32()),
        }),
        tmp_path / "embeddings.parquet",
    )

    got = embedding_deadzone(str(tmp_path)).to_pandas().set_index("dim")
    for j in range(d):
        col = m[:, j].astype(np.float64)
        nz = int((col == 0).sum())
        dead = int(((col != 0)
                    & (np.floor(1000 * np.abs(col)) == 0)).sum())
        row = got.loc[j + 1]
        assert int(row["n_components"]) == n
        assert int(row["n_zero"]) == nz
        assert int(row["n_deadzone"]) == dead
        assert int(row["deadzone_permille"]) == 1000 * dead // n


def test_cohort_value_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import cohort_value

    g = np.random.default_rng(283)
    n_cust, n_ord = 60, 400
    segs = ["BUILDING", "MACHINERY"]
    pq.write_table(
        pa.table({
            "c_custkey": pa.array(np.arange(1, n_cust + 1, dtype=np.int64)),
            "c_mktsegment": pa.array([segs[i % 2] for i in range(n_cust)]),
        }),
        tmp_path / "customer.parquet",
    )
    ck = g.integers(1, n_cust + 1, n_ord).astype(np.int64)
    day = g.integers(9000, 11500, n_ord).astype(np.int64)
    price = g.uniform(50.0, 4000.0, n_ord)
    pq.write_table(
        pa.table({
            "o_custkey": pa.array(ck),
            "o_orderdate": pa.array(day * DAY_US, pa.int64()).cast(
                pa.timestamp("us")
            ),
            "o_totalprice": pa.array(price),
        }),
        tmp_path / "orders.parquet",
    )

    per = collections.defaultdict(list)
    for c, d, p in zip(ck, day, price):
        per[int(c)].append((int(d), int(np.floor(p))))
    agg = collections.defaultdict(lambda: [0, 0, 0])
    for c, rows in per.items():
        fd = min(d for d, _ in rows)
        yr = int(np.datetime64(fd, "D").astype("datetime64[Y]")
                 .astype(int)) + 1970
        fyv = sum(v for d, v in rows if d <= fd + 365)
        a = agg[(yr, segs[(c - 1) % 2])]
        a[0] += 1
        a[1] += len(rows)
        a[2] += fyv

    got = cohort_value(str(tmp_path)).to_pandas()
    assert len(got) == len(agg)
    for _, row in got.iterrows():
        nc, no, fyv = agg[(int(row["cohort_year"]), row["c_mktsegment"])]
        assert int(row["n_customers"]) == nc
        assert int(row["n_orders"]) == no
        assert int(row["first_year_value"]) == fyv
