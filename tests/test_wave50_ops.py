"""Round-4 wave-50 operators: E101 daily-leader persistence board, T101
grid-cell label purity, R36 segment x brand matrix (3 chained
co-partitioned hops) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_daily_leader_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_daily_leader

    g = np.random.default_rng(360)
    n = 3000
    types = np.array(["click", "view", "buy"])[g.integers(0, 3, n)]
    day_us = 86_400_000_000
    ts = (
        np.datetime64("2026-01-01", "us").astype(np.int64)
        + g.integers(0, 20, n).astype(np.int64) * day_us
        + g.integers(0, day_us, n)
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "user_id": pa.array(np.zeros(n, np.int64)),
                "event_type": pa.array(types.tolist()),
                "value": pa.array(np.ones(n)),
                "props": pa.array(["{}"] * n),
            }
        ),
        tmp_path / "events.parquet",
    )

    per_day = collections.defaultdict(collections.Counter)
    for t, d in zip(types, ts // day_us):
        per_day[int(d)][t] += 1
    act = collections.Counter()
    led = collections.Counter()
    for d, cnt in per_day.items():
        for t in cnt:
            act[t] += 1
        # ties -> type string ascending
        winner = min(cnt, key=lambda t: (-cnt[t], t))
        led[winner] += 1

    got = events_daily_leader(str(tmp_path)).to_pandas().set_index("source")
    assert len(got) == 3
    for t in ("click", "view", "buy"):
        r = got.loc[t]
        assert (int(r.n_days_active), int(r.n_days_led)) == (
            act[t],
            led[t],
        ), t
    assert int(got.n_days_led.sum()) == len(per_day)


def test_embedding_cell_purity_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import embedding_cell_purity

    g = np.random.default_rng(361)
    n, d = 500, 6
    vecs = g.uniform(-1.0, 1.0, size=(n, d)).astype(np.float32)
    labels = g.integers(0, 7, n).astype(np.int32)
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

    cells = collections.defaultdict(collections.Counter)
    for i in range(n):
        cx = int(math.floor(2.0 * float(vecs[i, 0])))
        cy = int(math.floor(2.0 * float(vecs[i, 1])))
        cells[(cx, cy)][int(labels[i])] += 1

    got = embedding_cell_purity(str(tmp_path)).to_pandas()
    assert len(got) == len(cells)
    for _, r in got.iterrows():
        cnt = cells[(int(r.cell_x), int(r.cell_y))]
        assert int(r.n_vecs) == sum(cnt.values())
        assert int(r.n_labels) == len(cnt)
        assert int(r.n_majority) == max(cnt.values())
    assert int(got.n_vecs.sum()) == n


def test_brand_segment_matrix_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import brand_segment_matrix

    g = np.random.default_rng(362)
    n_cust, n_ord, n_part, n_line = 60, 200, 40, 1200
    seg = np.array(["AUTOMOBILE", "BUILDING", "MACHINERY"])[
        g.integers(0, 3, n_cust)
    ]
    ocust = g.integers(0, n_cust, n_ord).astype(np.int64)
    brand = np.array([f"Brand#{i}" for i in range(1, 6)])[
        g.integers(0, 5, n_part)
    ]
    lord = g.integers(0, n_ord, n_line).astype(np.int64)
    lpart = g.integers(0, n_part, n_line).astype(np.int64)
    ext = g.uniform(100, 6000, n_line)
    dis = g.integers(0, 11, n_line) / 100.0

    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
                "c_name": pa.array([f"c{i}" for i in range(n_cust)]),
                "c_nationkey": pa.array(np.zeros(n_cust, np.int32)),
                "c_acctbal": pa.array(np.zeros(n_cust)),
                "c_mktsegment": pa.array(seg.tolist()),
            }
        ),
        tmp_path / "customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
                "o_custkey": pa.array(ocust),
                "o_orderstatus": pa.array(["O"] * n_ord),
                "o_totalprice": pa.array(np.zeros(n_ord)),
                "o_orderdate": pa.array(
                    np.full(n_ord, 800000000000000), pa.int64()
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n_ord),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
                "p_name": pa.array([f"p{i}" for i in range(n_part)]),
                "p_brand": pa.array(brand.tolist()),
                "p_type": pa.array(["STANDARD"] * n_part),
                "p_size": pa.array(np.ones(n_part, np.int32)),
                "p_retailprice": pa.array(np.ones(n_part)),
            }
        ),
        tmp_path / "part.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(lord),
                "l_partkey": pa.array(lpart),
                "l_suppkey": pa.array(np.zeros(n_line, np.int64)),
                "l_linenumber": pa.array(np.ones(n_line, np.int32)),
                "l_quantity": pa.array(np.ones(n_line)),
                "l_extendedprice": pa.array(ext),
                "l_discount": pa.array(dis),
                "l_tax": pa.array(np.zeros(n_line)),
                "l_returnflag": pa.array(["N"] * n_line),
                "l_linestatus": pa.array(["O"] * n_line),
                "l_shipdate": pa.array(
                    np.full(n_line, 800000000000000), pa.int64()
                ).cast(pa.timestamp("us")),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    want = collections.defaultdict(lambda: [0, 0])
    for ok, pk, e, d in zip(lord, lpart, ext, dis):
        w = want[(seg[ocust[ok]], brand[pk])]
        w[0] += 1
        w[1] += int(math.floor(e * (1.0 - d)))

    got = brand_segment_matrix(str(tmp_path)).to_pandas()
    assert len(got) == len(want)
    for _, r in got.iterrows():
        nl, rev = want[(r.c_mktsegment, r.p_brand)]
        assert (int(r.n_lines), int(r.revenue_floor)) == (nl, rev), (
            r.c_mktsegment,
            r.p_brand,
        )
