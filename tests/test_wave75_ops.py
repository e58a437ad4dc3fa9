"""Round-4 wave-75 operators: E122 audience clock board (planted
one-bot overnight hour vs broad daytime hour pin the distinct-user
cells), T129/F tape vocab occupancy (planted dense and sparse id
ranges pin the permille), R56 brand lifecycle (planted entry/exit
years pin first/last/active-years) — each vs a scalar brute-force
reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_audience_clock_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_audience_clock

    g = np.random.default_rng(600)
    base = np.datetime64("2026-03-02", "us").astype(np.int64)  # midnight
    HOUR = 3_600_000_000
    et, ts, uid = [], [], []
    # hour 3: one bot, 50 events
    for j in range(50):
        et.append("api")
        ts.append(base + 3 * HOUR + j * 1_000)
        uid.append(99)
    # hour 12: 20 users, 2 events each
    for u in range(20):
        for _ in range(2):
            et.append("api")
            ts.append(base + 12 * HOUR + u * 7_000)
            uid.append(u)
    # bulk
    for _ in range(700):
        et.append(str(g.choice(["api", "web"])))
        ts.append(
            base
            + int(g.integers(0, 72)) * HOUR
            + int(g.integers(0, HOUR))
        )
        uid.append(int(g.integers(0, 30)))
    n = len(et)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(et),
                "ts": pa.array(np.array(ts, np.int64)).cast(
                    pa.timestamp("us")
                ),
                "value": pa.array(np.ones(n)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.array(uid, np.int64)),
            }
        ),
        tmp_path / "events.parquet",
    )

    ne = collections.Counter()
    users = collections.defaultdict(set)
    for s, t, u in zip(et, ts, uid):
        h = (t // HOUR) % 24
        ne[(s, h)] += 1
        users[(s, h)].add(u)
    got = events_audience_clock(str(tmp_path)).to_pandas()
    assert len(got) == 2 * 24
    got = got.set_index(["source", "hour"]).sort_index()
    for s in ("api", "web"):
        for h in range(24):
            row = got.loc[(s, h)]
            assert row["n_events"] == ne[(s, h)]
            assert row["n_users"] == len(users[(s, h)])


def test_f1_vocab_occupancy_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import vocab_occupancy

    g = np.random.default_rng(601)
    # "dense": ids exactly 100..149 all used -> occupancy 1000
    # "sparse": ids {1000, 2000, ..., 10000} -> 10 ids over span 9001
    rows = []
    for i in range(60):
        rows.append(("dense", list(range(100, 150))[: 10 + i % 40]))
    rows.append(("dense", list(range(100, 150))))
    for i in range(40):
        rows.append(
            ("sparse", [1000 * (1 + j) for j in range(1 + i % 10)])
        )
    rows.append(("sparse", [1000 * (1 + j) for j in range(10)]))
    for i in range(100):
        rows.append(
            ("bulk", [int(x) for x in g.integers(0, 5000, 20)])
        )
    src = pa.array([r[0] for r in rows])
    toks = pa.array(
        [r[1] for r in rows], pa.list_(pa.int32())
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(
                    [f"s00-{i:08d}" for i in range(len(rows))]
                ),
                "tokens": toks,
                "n_tok": pa.array(
                    [len(r[1]) for r in rows], pa.int64()
                ),
                "source": src,
            }
        ),
        tmp_path / "part-000.parquet",
    )

    per = collections.defaultdict(list)
    for s, t in rows:
        per[s] += t
    got = vocab_occupancy(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(per)
    for s, ids in per.items():
        d = sorted(set(ids))
        row = got.loc[s]
        assert row["n_tokens"] == len(ids)
        assert row["n_distinct"] == len(d)
        assert row["min_id"] == d[0]
        assert row["max_id"] == d[-1]
        assert row["occupancy_permille"] == 1000 * len(d) // (
            d[-1] - d[0] + 1
        )
    assert got.loc["dense", "occupancy_permille"] == 1000


def test_rel_brand_lifecycle_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import brand_lifecycle

    g = np.random.default_rng(602)
    n_parts = 90
    brands = [f"Brand#{20 + i % 3}" for i in range(n_parts)]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(
                    np.arange(1, n_parts + 1, dtype=np.int64)
                ),
                "p_name": pa.array([f"p{i}" for i in range(n_parts)]),
                "p_brand": pa.array(brands),
                "p_type": pa.array(["STD"] * n_parts),
                "p_size": pa.array(np.ones(n_parts, np.int64)),
                "p_retailprice": pa.array(np.ones(n_parts)),
            }
        ),
        tmp_path / "part.parquet",
    )
    # Brand#20 ships only 2023; #21 2021..2024 (bursty); #22 2022-2023
    year_pool = {20: [2023], 21: [2021, 2022, 2024], 22: [2022, 2023]}
    lk, sd = [], []
    for i in range(1, n_parts + 1):
        b = 20 + (i - 1) % 3
        for _ in range(1 + int(g.integers(0, 4))):
            y = int(g.choice(year_pool[b]))
            lk.append(i)
            sd.append(
                np.datetime64(f"{y}-06-15", "us").astype(np.int64)
                + int(g.integers(0, 10**6))
            )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(len(lk), dtype=np.int64)),
                "l_partkey": pa.array(np.array(lk, np.int64)),
                "l_suppkey": pa.array(np.ones(len(lk), np.int64)),
                "l_shipdate": pa.array(np.array(sd, np.int64)).cast(
                    pa.timestamp("us")
                ),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    want = collections.defaultdict(list)
    for k, d in zip(lk, sd):
        b = brands[k - 1]
        y = np.datetime64(int(d), "us").astype("datetime64[Y]").astype(
            int
        ) + 1970
        want[b].append(int(y))
    got = brand_lifecycle(str(tmp_path)).to_pandas()
    got = got.set_index("brand").sort_index()
    assert list(got.index) == sorted(want)
    for b, ys in want.items():
        row = got.loc[b]
        assert row["first_year"] == min(ys)
        assert row["last_year"] == max(ys)
        assert row["n_years"] == len(set(ys))
        assert row["n_lines"] == len(ys)
    assert got.loc["Brand#20", "n_years"] == 1
