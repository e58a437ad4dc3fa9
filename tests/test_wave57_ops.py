"""Round-4 wave-57 operators: T110 per-label centroid sufficient stats,
E105 feature-adoption latency (planted slow-adopter cohort), R38
sales-opportunity board (planted never-ordered rich customers) — each vs
a scalar brute-force reference."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_embedding_label_centroid_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import embedding_label_centroid

    g = np.random.default_rng(420)
    n, d = 500, 5
    vecs = g.uniform(-2.0, 2.0, size=(n, d)).astype(np.float32)
    labels = g.integers(0, 4, n).astype(np.int32)
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

    want_n = collections.Counter(int(x) for x in labels)
    want_s = collections.defaultdict(int)
    for i in range(n):
        for j in range(d):
            want_s[(int(labels[i]), j + 1)] += int(
                math.floor(1000.0 * float(np.float64(vecs[i, j])))
            )

    got = embedding_label_centroid(str(tmp_path)).to_pandas()
    assert len(got) == len(want_n) * d
    for _, r in got.iterrows():
        assert int(r.n_vecs) == want_n[int(r.label)]
        assert int(r.sum_milli) == want_s[(int(r.label), int(r.dim))], (
            r.label,
            r.dim,
        )
    # dense (label, dim) grid, dims 1-based
    assert set(got["dim"]) == set(range(1, d + 1))


def test_events_adoption_latency_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_adoption_latency

    g = np.random.default_rng(421)
    n_users, n_ev = 40, 2500
    min_us = 60_000_000
    base = np.datetime64("2026-02-01", "us").astype(np.int64)
    uid = g.integers(0, n_users, n_ev).astype(np.int64)
    types = np.array(["login", "browse", "checkout"])[g.integers(0, 3, n_ev)]
    # timestamps spread over ~3 days at sub-minute jitter so truncation
    # boundaries matter (delta counts minute-boundary crossings, not
    # elapsed 60s units)
    ts = base + g.integers(0, 3 * 86_400_000_000, n_ev).astype(np.int64)
    # planted cohort: users 0-4 reach checkout exactly 90 minutes + 30s
    # after their global first event -> truncated delta is in {90, 91}
    for u in range(5):
        rows = np.flatnonzero(uid == u)
        t0 = int(ts[rows].min())
        types[rows] = np.where(types[rows] == "checkout", "browse", types[rows])
        uid = np.append(uid, u)
        types = np.append(types, "checkout")
        ts = np.append(ts, t0 + 90 * min_us + 30_000_000)

    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(len(uid), dtype=np.int64)),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "user_id": pa.array(uid),
                "event_type": pa.array(types),
            }
        ),
        tmp_path / "events.parquet",
    )

    first = collections.defaultdict(dict)
    for u, c, t in zip(uid, types, ts):
        k = str(c)
        cur = first[int(u)].get(k)
        if cur is None or int(t) < cur:
            first[int(u)][k] = int(t)
    deltas = collections.defaultdict(list)
    for u, per in first.items():
        t0 = min(per.values())
        for k, t in per.items():
            deltas[k].append(t // min_us - t0 // min_us)

    got = events_adoption_latency(str(tmp_path)).to_pandas()
    assert sorted(got["source"]) == sorted(deltas)
    for _, r in got.iterrows():
        dl = sorted(deltas[str(r.source)])
        nt = len(dl)
        assert int(r.n_users) == nt
        assert int(r.n_entry_users) == sum(1 for x in dl if x == 0)
        for q, col in ((500, "p50_minutes"), (900, "p90_minutes")):
            thr = (nt * q + 999) // 1000
            assert int(r[col]) == dl[thr - 1], (r.source, q)
    # the planted cohort's checkout latency shows up above zero
    chk = got[got.source == "checkout"].iloc[0]
    assert int(chk.n_users) > int(chk.n_entry_users)


def test_sales_opportunity_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import sales_opportunity

    g = np.random.default_rng(422)
    n_cust, n_ord, n_nat = 300, 600, 4
    cnat = g.integers(0, n_nat, n_cust).astype(np.int64)
    bal = np.round(g.uniform(-999.99, 9999.99, n_cust), 2)
    # planted opportunity set: customers 0-9 are rich and never order
    bal[:10] = 9500.0
    ocust = g.integers(10, n_cust, n_ord).astype(np.int64)

    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
                "c_nationkey": pa.array(cnat),
                "c_acctbal": pa.array(bal),
            }
        ),
        tmp_path / "customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
                "o_custkey": pa.array(ocust),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(np.arange(n_nat, dtype=np.int64)),
                "n_name": pa.array([f"NAT{i}" for i in range(n_nat)]),
            }
        ),
        tmp_path / "nation.parquet",
    )

    cents = np.floor(100.0 * bal).astype(np.int64)
    pos = cents[cents > 0]
    tot, npos = int(pos.sum()), len(pos)
    ordered = set(int(x) for x in ocust)
    want = {i: [0, 0, 0] for i in range(n_nat)}
    for k in range(n_cust):
        if cents[k] > 0 and cents[k] * npos > tot:
            want[int(cnat[k])][0] += 1
            if k not in ordered:
                want[int(cnat[k])][1] += 1
                want[int(cnat[k])][2] += int(cents[k])

    got = sales_opportunity(str(tmp_path)).to_pandas()
    assert len(got) == n_nat
    for _, r in got.iterrows():
        ab, opp, occ = want[int(r.n_name[3:])]
        assert (
            int(r.n_above_avg),
            int(r.n_opportunity),
            int(r.opp_cents),
        ) == (ab, opp, occ), r.n_name
    # the planted never-ordered rich cohort is counted somewhere
    assert int(got["n_opportunity"].sum()) >= 10
