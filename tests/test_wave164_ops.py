"""Round-5 wave-164 operators: E211 daily-phase concentration, T217
quantization overflow audit, R144 acquisition geography — each vs a
scalar brute-force reference on planted fixtures."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MIN_US = 60_000_000
DAY_US = 86_400_000_000


def test_phase_concentration_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_phase_concentration

    g = np.random.default_rng(313)
    n = 4000
    ts = np.sort(g.integers(0, 20 * DAY_US, n).astype(np.int64))
    types = np.array(["click", "cron"])
    ty = g.integers(0, 2, n)
    # cron source fires only at minute 180 of the day
    cron = ty == 1
    ts[cron] = (ts[cron] // DAY_US) * DAY_US + 180 * MIN_US
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(g.integers(1, 40, n).astype(np.int64)),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(g.uniform(0, 10, n)),
            "event_type": pa.array(types[ty]),
        }),
        tmp_path / "events.parquet",
    )

    cells = collections.Counter()
    for t, k in zip(ts, ty):
        cells[(int(k), int(t // MIN_US % 1440))] += 1
    got = events_phase_concentration(str(tmp_path)).to_pandas().set_index(
        "source"
    )
    for k, name in enumerate(types):
        ns_ = [c for (kk, _), c in cells.items() if kk == k]
        row = got.loc[name]
        assert int(row["n_events"]) == sum(ns_)
        assert int(row["simpson_num"]) == sum(c * (c - 1) for c in ns_)
        assert int(row["peak_share_permille"]) == (
            1000 * max(ns_) // sum(ns_)
        )


def test_embedding_overflow_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import embedding_overflow

    g = np.random.default_rng(317)
    n, d = 300, 5
    m = g.normal(0, 0.6, (n, d)).astype(np.float32)
    m[:, 2] *= 4.0  # outlier dimension
    pq.write_table(
        pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(m), pa.list_(pa.float32())),
            "label": pa.array(np.zeros(n, np.int32), pa.int32()),
        }),
        tmp_path / "embeddings.parquet",
    )

    got = embedding_overflow(str(tmp_path)).to_pandas().set_index("dim")
    for j in range(d):
        col = np.abs(m[:, j].astype(np.float64))
        row = got.loc[j + 1]
        assert int(row["n_components"]) == n
        assert int(row["n_over_unit"]) == int((col > 1.0).sum())
        assert int(row["max_q"]) == int(np.floor(1000 * col).max())


def test_acquisition_geography_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import acquisition_geography

    g = np.random.default_rng(331)
    n_nat, n_cust, n_ord = 6, 50, 300
    pq.write_table(
        pa.table({
            "n_nationkey": pa.array(np.arange(n_nat, dtype=np.int64)),
            "n_name": pa.array([f"NATION{i}" for i in range(n_nat)]),
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
    ck = g.integers(1, n_cust + 1, n_ord).astype(np.int64)
    day = g.integers(9000, 11000, n_ord).astype(np.int64)
    price = g.uniform(50.0, 2000.0, n_ord)
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

    per = {}
    for c, d, p in zip(ck, day, price):
        key = (int(d), int(np.floor(p)))
        if int(c) not in per or key < per[int(c)]:
            per[int(c)] = key
    agg = collections.defaultdict(lambda: [0, 0])
    for c, (d, v) in per.items():
        yr = int(np.datetime64(d, "D").astype("datetime64[Y]")
                 .astype(int)) + 1970
        a = agg[(f"NATION{cn[c - 1]}", yr)]
        a[0] += 1
        a[1] += v

    got = acquisition_geography(str(tmp_path)).to_pandas()
    assert len(got) == len(agg)
    for _, row in got.iterrows():
        nc, fv = agg[(row["n_name"], int(row["cohort_year"]))]
        assert int(row["n_customers"]) == nc
        assert int(row["first_order_value"]) == fv
