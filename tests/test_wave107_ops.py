"""Round-4 wave-107 operators: E154 operating-window board (planted
per-day open/close minutes pin both medians), T161 embedding-hygiene
audit (planted NaN/Inf/zero/ragged vectors pin every counter), R88
segment value-trend sufficient stats (planted inflating ticket sizes pin
all six sums) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _qdisc(sorted_vals, permille):
    n = len(sorted_vals)
    return sorted_vals[(n * permille + 999) // 1000 - 1]


def test_events_operating_window_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_operating_window

    base = np.datetime64("2026-07-01", "us").astype(np.int64)
    day = 86_400_000_000
    minute = 60_000_000
    rows = []  # (source, ts_us)
    # "office": 5 days, opens 540+d, closes 1020-d (d = 0..4)
    for d in range(5):
        rows.append(("office", base + d * day + (540 + d) * minute))
        rows.append(("office", base + d * day + 700 * minute))  # midday
        rows.append(("office", base + d * day + (1020 - d) * minute))
    # "machine": 3 days, first event at minute 0, last at 1439
    for d in range(3):
        rows.append(("machine", base + d * day))
        rows.append(("machine", base + d * day + 1439 * minute))
    # "oneshot": single event -> open == close that day
    rows.append(("oneshot", base + 2 * day + 77 * minute))

    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows]),
                "ts": pa.array(
                    np.array([r[1] for r in rows], np.int64)
                ).cast(pa.timestamp("us")),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.zeros(n, np.int64)),
                "value": pa.array(np.ones(n)),
            }
        ),
        tmp_path / "events.parquet",
    )

    got = (
        events_operating_window(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    per = collections.defaultdict(dict)
    for s, ts in rows:
        d = ts // day
        m = (ts // minute) % 1440
        lo, hi = per[s].get(d, (1441, -1))
        per[s][d] = (min(lo, m), max(hi, m))
    assert list(got.index) == sorted(per)
    for s, days in per.items():
        ops = sorted(v[0] for v in days.values())
        cls = sorted(v[1] for v in days.values())
        row = got.loc[s]
        assert row["n_days"] == len(days)
        assert row["p50_open_minute"] == _qdisc(ops, 500)
        assert row["p50_close_minute"] == _qdisc(cls, 500)
    assert got.loc["machine", "p50_open_minute"] == 0
    assert got.loc["machine", "p50_close_minute"] == 1439
    assert got.loc["oneshot", "p50_open_minute"] == 77
    assert got.loc["oneshot", "p50_close_minute"] == 77


def test_embedding_hygiene_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import embedding_hygiene

    g = np.random.default_rng(846)
    vecs = []
    for _ in range(40):
        vecs.append(list(map(float, g.normal(size=8))))   # clean dim 8
    vecs.append([float("nan")] + [1.0] * 7)                # NaN
    vecs.append([float("inf"), -1.0] + [0.5] * 6)          # Inf
    vecs.append([0.0] * 8)                                 # zero vector
    vecs.append([0.0] * 8)                                 # zero vector
    vecs.append([1.0, 2.0, 3.0])                           # ragged (dim 3)
    vecs.append(list(map(float, g.normal(size=5))))        # ragged (dim 5)
    n = len(vecs)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array(np.zeros(n, np.int32)),
            }
        ),
        tmp_path / "embeddings.parquet",
    )

    got = embedding_hygiene(str(tmp_path)).to_pandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert row["n_vectors"] == n
    assert row["modal_dim"] == 8
    assert row["n_ragged"] == 2
    assert row["n_with_nan"] == 1
    assert row["n_with_inf"] == 1
    assert row["n_zero_vectors"] == 2


def test_rel_segment_value_trend_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import segment_value_trend

    g = np.random.default_rng(847)
    segs = ["AUTOMOBILE", "BUILDING", "MACHINERY"]
    n_cust = 15
    cust_seg = {k: segs[k % 3] for k in range(1, n_cust + 1)}
    orders = []  # (okey, custkey, odate_us, totalprice)
    okey = 0
    for yi, base_price in ((2024, 100.0), (2025, 150.0)):
        d0 = np.datetime64(f"{yi}-01-15", "us").astype(np.int64)
        for _ in range(40):
            okey += 1
            ck = int(g.integers(1, n_cust + 1))
            mo = int(g.integers(0, 12))
            od = d0 + mo * 30 * 86_400_000_000
            price = base_price + float(np.round(g.uniform(0, 500), 2))
            orders.append((okey, ck, od, price))
    no = len(orders)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(
                    np.array([o[0] for o in orders], np.int64)
                ),
                "o_custkey": pa.array(
                    np.array([o[1] for o in orders], np.int64)
                ),
                "o_orderstatus": pa.array(["O"] * no),
                "o_totalprice": pa.array(
                    np.array([o[3] for o in orders])
                ),
                "o_orderdate": pa.array(
                    np.array([o[2] for o in orders], np.int64)
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * no),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(
                    np.arange(1, n_cust + 1, dtype=np.int64)
                ),
                "c_name": pa.array(
                    [f"Customer#{i:09d}" for i in range(1, n_cust + 1)]
                ),
                "c_nationkey": pa.array(np.zeros(n_cust, np.int64)),
                "c_acctbal": pa.array(np.zeros(n_cust)),
                "c_mktsegment": pa.array(
                    [cust_seg[k] for k in range(1, n_cust + 1)]
                ),
            }
        ),
        tmp_path / "customer.parquet",
    )

    want = collections.defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for okey, ck, od, price in orders:
        dt = np.int64(od).astype("datetime64[us]")
        yr = int(dt.astype("datetime64[Y]").astype(np.int64)) + 1970
        mo = int(dt.astype("datetime64[M]").astype(np.int64)) % 12
        m = yr * 12 + mo
        v = int(np.floor(price))
        c = want[cust_seg[ck]]
        c[0] += 1
        c[1] += m
        c[2] += m * m
        c[3] += v
        c[4] += v * v
        c[5] += m * v

    got = (
        segment_value_trend(str(tmp_path))
        .to_pandas()
        .set_index("c_mktsegment")
        .sort_index()
    )
    assert list(got.index) == sorted(want)
    for s, (n_, sm, smm, sv, svv, smv) in want.items():
        row = got.loc[s]
        assert row["n_orders"] == n_
        assert row["sum_m"] == sm
        assert row["sum_m_sq"] == smm
        assert row["sum_v"] == sv
        assert row["sum_v_sq"] == svv
        assert row["sum_m_v"] == smv
