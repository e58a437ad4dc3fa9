"""Round-4 wave-97 operators: E144 timestamp-collision audit (a planted
batch-flusher source with 5-deep collisions pins the multiplicity),
T151 per-dimension embedding extreme-vector board (a planted outlier
vector owning every dimension's max and an exact tie pin the argmax
rule), R78 quantity-band × discount-cent matrix (planted fat-band
discounts pin specific cells) — each vs a scalar brute-force
reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HOUR = 3_600_000_000


def test_events_ts_collisions_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_ts_collisions

    g = np.random.default_rng(811)
    base = np.datetime64("2026-07-01", "us").astype(np.int64)
    et, ts = [], []
    # "flusher": every 5 events share one timestamp
    for k in range(8):
        for _ in range(5):
            et.append("flusher")
            ts.append(base + k * HOUR)
    # "clean": strictly distinct timestamps
    for i in range(30):
        et.append("clean")
        ts.append(base + i * 1_000_000 + 17)
    # "mixed": random timestamps on a coarse grid -> some collisions
    for _ in range(200):
        et.append("mixed")
        ts.append(base + int(g.integers(0, 50)) * 1_000_000)
    n = len(et)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(et),
                "ts": pa.array(np.array(ts, np.int64)).cast(
                    pa.timestamp("us")
                ),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.zeros(n, np.int64)),
                "value": pa.array(np.zeros(n)),
            }
        ),
        tmp_path / "events.parquet",
    )

    cnt = collections.Counter(zip(et, ts))
    got = (
        events_ts_collisions(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    for s in sorted(set(et)):
        ks = {t: c for (s2, t), c in cnt.items() if s2 == s}
        row = got.loc[s]
        assert row["n_events"] == sum(ks.values())
        assert row["n_distinct_ts"] == len(ks)
        assert row["n_collided"] == sum(c for c in ks.values() if c > 1)
        assert row["max_multiplicity"] == max(ks.values())
    assert got.loc["flusher", "max_multiplicity"] == 5
    assert got.loc["flusher", "n_collided"] == 40
    assert got.loc["clean", "n_collided"] == 0


def test_embedding_dim_extremes_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import embedding_dim_extremes

    g = np.random.default_rng(812)
    d = 6
    m = g.normal(0, 1, (40, d)).astype(np.float32)
    # vec 39: global max in every dim
    m[39] = np.abs(m).max(axis=0) + 1.0
    # exact tie on dim 0's max between vec 5 and vec 7 -> argmax = 5
    m[5, 0] = m[39, 0]
    m[7, 0] = m[39, 0]
    vec_ids = np.arange(40, dtype=np.int64)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(vec_ids),
                "embedding": pa.array(
                    [row.tolist() for row in m],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(np.zeros(40, np.int32)),
            }
        ),
        tmp_path / "embeddings.parquet",
    )

    got = (
        embedding_dim_extremes(str(tmp_path))
        .to_pandas()
        .set_index("dim")
        .sort_index()
    )
    assert list(got.index) == list(range(1, d + 1))
    m64 = m.astype(np.float64)
    for j in range(d):
        col = m64[:, j]
        mx, mn = col.max(), col.min()
        amax = int(vec_ids[col == mx].min())
        amin = int(vec_ids[col == mn].min())
        row = got.loc[j + 1]
        assert row["max_milli"] == int(np.floor(mx * 1000.0))
        assert row["argmax_vec"] == amax
        assert row["min_milli"] == int(np.floor(mn * 1000.0))
        assert row["argmin_vec"] == amin
    assert got.loc[1, "argmax_vec"] == 5  # tie -> smallest vec_id
    for j in range(2, d + 1):
        assert got.loc[j, "argmax_vec"] == 39


def test_rel_discount_qty_matrix_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import discount_qty_matrix

    g = np.random.default_rng(813)
    n = 300
    qty = np.round(g.uniform(1, 50, n), 1)
    dis = np.round(g.uniform(0, 0.1, n), 2)
    ext = np.round(g.uniform(100, 9000, n), 2)
    # planted: band 4 (qty 40-49) always discounted 9 cents
    qty[:20] = 45.0
    dis[:20] = 0.09
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "l_partkey": pa.array(np.ones(n, np.int64)),
                "l_suppkey": pa.array(np.ones(n, np.int64)),
                "l_linenumber": pa.array(np.ones(n, np.int32)),
                "l_quantity": pa.array(qty),
                "l_extendedprice": pa.array(ext),
                "l_discount": pa.array(dis),
                "l_tax": pa.array(np.zeros(n)),
                "l_returnflag": pa.array(["N"] * n),
                "l_linestatus": pa.array(["O"] * n),
                "l_shipdate": pa.array(
                    np.full(n, np.datetime64("2026-01-01", "us"))
                ),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    want = collections.defaultdict(lambda: [0, 0, 0])
    for q, dd, e in zip(qty, dis, ext):
        cell = (int(np.floor(q)) // 10, int(np.floor(100 * dd)))
        w = want[cell]
        w[0] += 1
        w[1] += int(np.floor(q))
        w[2] += int(np.floor(e * (1.0 - dd)))

    got = (
        discount_qty_matrix(str(tmp_path))
        .to_pandas()
        .set_index(["qty_band", "discount_cents"])
        .sort_index()
    )
    assert len(got) == len(want)
    for cell, (nl, qf, rf) in want.items():
        row = got.loc[cell]
        assert row["n_lines"] == nl
        assert row["qty_floor"] == qf
        assert row["revenue_floor"] == rf
    assert got.loc[(4, 9), "n_lines"] >= 20
