"""Round-4 wave-82 operators: E129 user-dormancy quantiles (planted
fresh vs lapsed audiences pin the recency bands), T136/F tape novelty-
saturation quantiles (planted header-then-repeat sequences pin the
saturation permille), R63 segment order-value quantiles (planted
value ladders pin p50/p90/p99) — each vs a scalar brute-force
reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_dormancy_quantiles_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_dormancy_quantiles

    g = np.random.default_rng(670)
    base = np.datetime64("2026-03-02", "us").astype(np.int64)
    DAY = 86_400_000_000
    et, ts, uid = [], [], []
    # anchor the global max day
    et.append("fresh"); ts.append(base + 99 * DAY + 5); uid.append(1)
    # "fresh": users 1-10 all last seen on day 99 -> dormancy 0
    for u in range(1, 11):
        for _ in range(3):
            et.append("fresh")
            ts.append(base + 99 * DAY + int(g.integers(0, DAY)))
            uid.append(u)
    # "lapsed": users 20-29 last seen on day 10 -> dormancy 89
    for u in range(20, 30):
        et.append("lapsed")
        ts.append(base + 10 * DAY + int(g.integers(0, DAY)))
        uid.append(u)
    # bulk
    for _ in range(600):
        et.append("rand")
        ts.append(base + int(g.integers(0, 100)) * DAY + int(g.integers(0, DAY)))
        uid.append(int(g.integers(0, 60)))
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
                "user_id": pa.array(uid, pa.int64()),
            }
        ),
        tmp_path / "events.parquet",
    )

    last = {}
    for s, t, u in zip(et, ts, uid):
        d = t // DAY
        last[(s, u)] = max(last.get((s, u), 0), d)
    gmax = max(last.values())
    dorm = collections.defaultdict(list)
    for (s, _), d in last.items():
        dorm[s].append(gmax - d)

    got = events_dormancy_quantiles(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(dorm)
    for s, xs in dorm.items():
        xs = sorted(xs)
        row = got.loc[s]
        assert row["n_users"] == len(xs)
        for col, q in (("p50_dormancy", 500), ("p90_dormancy", 900)):
            thr = (len(xs) * q + 999) // 1000
            assert row[col] == xs[thr - 1]
        assert row["max_dormancy"] == xs[-1]
    assert got.loc["fresh", "max_dormancy"] == 0
    assert got.loc["lapsed", "p50_dormancy"] == 89


def test_f1_novelty_saturation_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import tape_novelty_saturation

    g = np.random.default_rng(671)
    rows = []
    # "header": 4 new tokens then pure repeats of them (len 20)
    for _ in range(12):
        rows.append(
            ("header", [1, 2, 3, 4] + [int(g.integers(1, 5)) for _ in range(16)])
        )
    # "climb": every token new -> saturation at the last position
    for i in range(8):
        rows.append(("climb", list(range(100 * i, 100 * i + 10))))
    rows.append(("climb", [7]))  # single token: saturation 1/1
    # bulk
    for _ in range(80):
        rows.append(
            ("rand", [int(x) for x in g.integers(0, 40, g.integers(1, 25))])
        )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(
                    [f"s00-{i:08d}" for i in range(len(rows))]
                ),
                "tokens": pa.array(
                    [r[1] for r in rows], pa.list_(pa.int32())
                ),
                "n_tok": pa.array(
                    [len(r[1]) for r in rows], pa.int64()
                ),
                "source": pa.array([r[0] for r in rows]),
            }
        ),
        tmp_path / "part-000.parquet",
    )

    sat = collections.defaultdict(list)
    for s, t in rows:
        firsts = {}
        for i, tok in enumerate(t, 1):
            if tok not in firsts:
                firsts[tok] = i
        pos = max(firsts.values())
        sat[s].append(1000 * pos // len(t))

    got = tape_novelty_saturation(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(sat)
    for s, xs in sat.items():
        xs = sorted(xs)
        row = got.loc[s]
        assert row["n_seqs"] == len(xs)
        for col, q in (
            ("p50_saturation", 500),
            ("p90_saturation", 900),
        ):
            thr = (len(xs) * q + 999) // 1000
            assert row[col] == xs[thr - 1]
    # header sequences saturate at position 4 of 20 -> 200 permille
    assert got.loc["header", "p50_saturation"] == 200
    assert got.loc["climb", "p90_saturation"] == 1000


def test_rel_segment_value_quantiles_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import segment_value_quantiles

    g = np.random.default_rng(672)
    n_cust = 80
    segs = ["AUTOMOBILE", "BUILDING", "MACHINERY"]
    cseg = [segs[int(g.integers(0, 3))] for _ in range(n_cust)]
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
                "c_name": pa.array([f"c{i}" for i in range(n_cust)]),
                "c_nationkey": pa.array(np.zeros(n_cust, np.int64)),
                "c_acctbal": pa.array(np.zeros(n_cust)),
                "c_mktsegment": pa.array(cseg),
            }
        ),
        tmp_path / "customer.parquet",
    )
    n_ord = 900
    ck = g.integers(0, n_cust, n_ord)
    tp = np.round(g.uniform(900, 400_000, n_ord), 2)
    base = np.datetime64("2025-01-01", "us").astype(np.int64)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
                "o_custkey": pa.array(ck, pa.int64()),
                "o_orderstatus": pa.array(["O"] * n_ord),
                "o_totalprice": pa.array(tp),
                "o_orderdate": pa.array(
                    base + g.integers(0, 300, n_ord) * 86_400_000_000
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n_ord),
            }
        ),
        tmp_path / "orders.parquet",
    )

    vals = collections.defaultdict(list)
    for c, v in zip(ck, tp):
        vals[cseg[c]].append(int(np.floor(v)))

    got = segment_value_quantiles(str(tmp_path)).to_pandas()
    got = got.set_index("segment").sort_index()
    assert list(got.index) == sorted(vals)
    for s, xs in vals.items():
        xs = sorted(xs)
        row = got.loc[s]
        assert row["n_orders"] == len(xs)
        for col, q in (
            ("p50_value", 500),
            ("p90_value", 900),
            ("p99_value", 990),
        ):
            thr = (len(xs) * q + 999) // 1000
            assert row[col] == xs[thr - 1]
        assert row["max_value"] == xs[-1]
