"""Round-5 wave-156 operators: E203 value phase-shift board, T209
quantized label centroids, R136 latency ↔ return coupling — each vs a
scalar brute-force reference on planted fixtures."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000


def test_value_phase_shift_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_value_phase_shift

    g = np.random.default_rng(179)
    n = 4000
    ts = np.sort(g.integers(0, 20 * 24 * HOUR_US, n).astype(np.int64))
    types = np.array(["click", "view"])
    ty = g.integers(0, 2, n)
    value = g.uniform(0, 100, n)
    # plant a value spike at a different hour than the count mode
    spike = (ts // HOUR_US % 24) == 3
    value[spike & (ty == 0)] += 5000
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(g.integers(1, 50, n).astype(np.int64)),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(value),
            "event_type": pa.array(types[ty]),
        }),
        tmp_path / "events.parquet",
    )

    grids = {k: (np.zeros(24, np.int64), np.zeros(24, np.int64))
             for k in range(2)}
    for t, k, v in zip(ts, ty, value):
        h = int(t // HOUR_US % 24)
        grids[int(k)][0][h] += 1
        grids[int(k)][1][h] += int(np.floor(v))

    got = events_value_phase_shift(str(tmp_path)).to_pandas().set_index(
        "source"
    )
    for k, name in enumerate(types):
        cn, vv = grids[k]
        ch = int(cn.argmax())
        vh = int(np.where(cn > 0, vv, -1).argmax())
        row = got.loc[name]
        assert int(row["count_modal_hour"]) == ch
        assert int(row["value_modal_hour"]) == vh
        assert int(row["count_modal_permille"]) == 1000 * cn[ch] // cn.sum()
        assert int(row["value_modal_permille"]) == (
            1000 * vv[vh] // max(vv.sum(), 1)
        )
        d = abs(ch - vh)
        assert int(row["phase_distance"]) == min(d, 24 - d)


def test_label_centroids_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import label_centroids

    g = np.random.default_rng(181)
    n, d = 300, 6
    m = g.normal(0, 1, (n, d)).astype(np.float32)
    lb = g.integers(0, 3, n).astype(np.int32)
    pq.write_table(
        pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(m), pa.list_(pa.float32())),
            "label": pa.array(lb, pa.int32()),
        }),
        tmp_path / "embeddings.parquet",
    )

    agg = collections.defaultdict(lambda: [0, 0])
    for row, l in zip(m, lb):
        q = np.floor(1000.0 * row.astype(np.float64)).astype(np.int64)
        for i in range(d):
            a = agg[(int(l), i + 1)]
            a[0] += 1
            a[1] += int(q[i])

    got = label_centroids(str(tmp_path)).to_pandas()
    assert len(got) == 3 * d
    for _, row in got.iterrows():
        nv, sq = agg[(int(row["label"]), int(row["dim"]))]
        assert int(row["n_vectors"]) == nv
        assert int(row["sum_q"]) == sq


def test_latency_return_coupling_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import latency_return_coupling

    g = np.random.default_rng(191)
    n_ord, n_li = 120, 600
    oday = g.integers(9000, 11000, n_ord).astype(np.int64)  # ~1994-2000
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
    lag = g.integers(0, 120, n_li).astype(np.int64)
    sday = oday[lo - 1] + lag
    flag = np.where(g.uniform(0, 1, n_li) < 0.3, "R", "N")
    pq.write_table(
        pa.table({
            "l_orderkey": pa.array(lo),
            "l_shipdate": pa.array(sday * DAY_US, pa.int64()).cast(
                pa.timestamp("us")
            ),
            "l_returnflag": pa.array(flag.tolist()),
        }),
        tmp_path / "lineitem.parquet",
    )

    agg = collections.defaultdict(lambda: [0, 0, 0])
    for o, s, f in zip(lo, sday, flag):
        yr = int(np.datetime64(int(s), "D").astype("datetime64[Y]")
                 .astype(int)) + 1970
        days = int(s) - int(oday[o - 1])
        a = agg[(yr, 1 if f == "R" else 0)]
        a[0] += 1
        a[1] += days
        a[2] += days * days

    got = latency_return_coupling(str(tmp_path)).to_pandas()
    assert len(got) == len(agg)
    for _, row in got.iterrows():
        n, sd, sd2 = agg[(int(row["ship_year"]), int(row["returned"]))]
        assert int(row["n_lines"]) == n
        assert int(row["sum_days"]) == sd
        assert int(row["sum_days2"]) == sd2
