"""Round-5 wave-168 operators: E215 value-band audience, T221
mean-vector anisotropy audit, R148 order-frequency mix trend — each vs
a scalar brute-force reference on planted fixtures."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY_US = 86_400_000_000


def test_band_audience_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_band_audience

    g = np.random.default_rng(383)
    n = 3000
    types = np.array(["click", "view"])
    ty = g.integers(0, 2, n)
    uid = g.integers(1, 60, n).astype(np.int64)
    value = np.exp(g.uniform(0, 8, n))
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(uid),
            "ts": pa.array(
                np.sort(g.integers(0, DAY_US, n).astype(np.int64)),
                pa.int64(),
            ).cast(pa.timestamp("us")),
            "value": pa.array(value),
            "event_type": pa.array(types[ty]),
        }),
        tmp_path / "events.parquet",
    )

    ev = collections.Counter()
    users = collections.defaultdict(set)
    for k, u, v in zip(ty, uid, value):
        rv = int(np.floor(v))
        band = rv.bit_length() if rv > 0 else 0
        ev[(int(k), band)] += 1
        users[(int(k), band)].add(int(u))

    got = events_band_audience(str(tmp_path)).to_pandas()
    assert len(got) == len(ev)
    for _, row in got.iterrows():
        k = int(np.where(types == row["source"])[0][0])
        key = (k, int(row["value_band"]))
        assert int(row["n_events"]) == ev[key]
        assert int(row["n_users"]) == len(users[key])


def test_mean_vector_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import embedding_mean_vector

    g = np.random.default_rng(389)
    n, d = 300, 6
    m = (g.normal(0.3, 1, (n, d))).astype(np.float32)  # offset mean
    pq.write_table(
        pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(m), pa.list_(pa.float32())),
            "label": pa.array(np.zeros(n, np.int32), pa.int32()),
        }),
        tmp_path / "embeddings.parquet",
    )

    got = embedding_mean_vector(str(tmp_path)).to_pandas().set_index("dim")
    for j in range(d):
        col = m[:, j].astype(np.float64)
        row = got.loc[j + 1]
        assert int(row["n_vectors"]) == n
        assert int(row["sum_q"]) == int(
            np.floor(1000 * col).astype(np.int64).sum()
        )
        assert int(row["sum_abs_q"]) == int(
            np.floor(1000 * np.abs(col)).astype(np.int64).sum()
        )


def test_frequency_trend_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import frequency_trend

    g = np.random.default_rng(397)
    n_ord = 600
    ck = g.integers(1, 50, n_ord).astype(np.int64)
    day = g.integers(9000, 12000, n_ord).astype(np.int64)
    pq.write_table(
        pa.table({
            "o_custkey": pa.array(ck),
            "o_orderdate": pa.array(day * DAY_US, pa.int64()).cast(
                pa.timestamp("us")
            ),
        }),
        tmp_path / "orders.parquet",
    )

    per = collections.Counter()
    for c, d in zip(ck, day):
        yr = int(np.datetime64(int(d), "D").astype("datetime64[Y]")
                 .astype(int)) + 1970
        per[(int(c), yr)] += 1
    agg = collections.defaultdict(lambda: [0, 0])
    for (c, yr), n in per.items():
        a = agg[(yr, n.bit_length())]
        a[0] += 1
        a[1] += n

    got = frequency_trend(str(tmp_path)).to_pandas()
    assert len(got) == len(agg)
    for _, row in got.iterrows():
        nc, no = agg[(int(row["order_year"]), int(row["freq_band"]))]
        assert int(row["n_customers"]) == nc
        assert int(row["n_orders"]) == no
