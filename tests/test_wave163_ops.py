"""Round-5 wave-163 operators: E210 per-source top-value users (grouped
top-k), T216 corpus sampling-error audit, R143 acquisition seasonality —
each vs a scalar brute-force reference on planted fixtures."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY_US = 86_400_000_000


def test_top_users_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_top_users

    g = np.random.default_rng(293)
    n = 3000
    uid = g.integers(1, 50, n).astype(np.int64)
    types = np.array(["click", "view"])
    ty = g.integers(0, 2, n)
    value = g.uniform(0, 100, n)
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(uid),
            "ts": pa.array(
                np.sort(g.integers(0, 10 * DAY_US, n).astype(np.int64)),
                pa.int64(),
            ).cast(pa.timestamp("us")),
            "value": pa.array(value),
            "event_type": pa.array(types[ty]),
        }),
        tmp_path / "events.parquet",
    )

    totals = collections.Counter()
    for u, k, v in zip(uid, ty, value):
        totals[(int(k), int(u))] += int(np.floor(v))
    want = {}
    for k in range(2):
        rows = sorted(
            ((v, u) for (kk, u), v in totals.items() if kk == k),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        for r, (v, u) in enumerate(rows, start=1):
            want[(types[k], r)] = (u, v)

    got = events_top_users(str(tmp_path)).to_pandas()
    assert len(got) == len(want)
    for _, row in got.iterrows():
        u, v = want[(row["source"], int(row["rank"]))]
        assert int(row["user_id"]) == u
        assert int(row["value_floor"]) == v


def test_sample_audit_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import sample_audit

    g = np.random.default_rng(307)
    rows = []
    for i in range(500):
        n_words = int(g.integers(1, 30))
        rows.append({"doc_id": i,
                     "text": " ".join(f"w{j}" for j in range(n_words)),
                     "lang": "en", "source": f"s{i % 2}", "n_chars": 0})
    pq.write_table(pa.Table.from_pylist(rows), tmp_path / "documents.parquet")

    agg = collections.defaultdict(lambda: [0, 0, 0, 0])
    for r in rows:
        nt = len(r["text"].split(" "))
        a = agg[r["source"]]
        a[0] += 1
        a[2] += nt
        if r["doc_id"] % 64 == 0:
            a[1] += 1
            a[3] += nt

    got = sample_audit(str(tmp_path)).to_pandas().set_index("source")
    for s, (nd, nds, tok, toks) in agg.items():
        row = got.loc[s]
        assert int(row["n_docs"]) == nd
        assert int(row["n_sampled"]) == nds
        assert int(row["n_tokens"]) == tok
        assert int(row["est_tokens"]) == 64 * toks
        assert int(row["err_permille"]) == (
            1000 * abs(64 * toks - tok) // max(tok, 1)
        )


def test_acquisition_seasonality_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import acquisition_seasonality

    g = np.random.default_rng(311)
    n_cust, n_ord = 70, 400
    segs = ["FURNITURE", "HOUSEHOLD"]
    pq.write_table(
        pa.table({
            "c_custkey": pa.array(np.arange(1, n_cust + 1, dtype=np.int64)),
            "c_mktsegment": pa.array([segs[i % 2] for i in range(n_cust)]),
        }),
        tmp_path / "customer.parquet",
    )
    ck = g.integers(1, n_cust + 1, n_ord).astype(np.int64)
    day = g.integers(9000, 10500, n_ord).astype(np.int64)
    price = g.uniform(50.0, 3000.0, n_ord)
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
        m = int(np.datetime64(d, "D").astype("datetime64[M]")
                .astype(int)) % 12 + 1
        a = agg[(m, segs[(c - 1) % 2])]
        a[0] += 1
        a[1] += v

    got = acquisition_seasonality(str(tmp_path)).to_pandas()
    assert len(got) == len(agg)
    for _, row in got.iterrows():
        nc, fv = agg[(int(row["acq_month"]), row["c_mktsegment"])]
        assert int(row["n_customers"]) == nc
        assert int(row["first_order_value"]) == fv
