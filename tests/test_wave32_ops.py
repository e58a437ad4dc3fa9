"""Round-4 wave-32 operators: E89 max-value event drill-down (the
fixture plants an exact value TIE so the event_id tie-break is
load-bearing), T78 embedding norm histogram (element-wise floor BEFORE
the sum — mixed-norm fixture spans bands), R19 LTV digit-band histogram
(integer power-of-ten boundaries) — each vs a scalar brute-force
reference."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MIN_US = 60_000_000


def test_max_value_event_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import (
        EVENTS_T0_US,
        events_max_value_event,
    )

    g = np.random.default_rng(200)
    n = 900
    types = np.array(["a", "b", "c"])[g.integers(0, 3, n)]
    vals = np.round(g.uniform(0, 100, n), 2)
    # plant an exact tie at the top of source 'a'
    a_idx = np.flatnonzero(types == "a")[:2]
    vals[a_idx] = 999.5
    ts = EVENTS_T0_US + np.arange(n, dtype=np.int64) * MIN_US
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(types.tolist()),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "value": pa.array(vals),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.zeros(n, np.int64)),
            }
        ),
        tmp_path / "events.parquet",
    )

    want = {}
    for i, (t, v) in enumerate(zip(types, vals)):
        cur = want.get(t)
        if cur is None or v > cur[1] or (v == cur[1] and i < cur[0]):
            want[t] = (i, v)

    got = events_max_value_event(str(tmp_path)).to_pandas().set_index(
        "source"
    )
    assert len(got) == len(want)
    for t, (eid, v) in want.items():
        r = got.loc[t]
        assert r.event_id == eid, t  # the tie resolved to the lowest id
        assert r.value == v
        assert np.datetime64(r.ts, "us").astype(np.int64) == ts[eid]
    assert want["a"][0] == a_idx[0]  # the planted tie is the winner


def test_embedding_norm_hist_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import embedding_norm_hist

    g = np.random.default_rng(201)
    n, d = 400, 16
    vecs = g.normal(size=(n, d)).astype(np.float32)
    vecs[: n // 2] /= np.linalg.norm(vecs[: n // 2], axis=1, keepdims=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
                "label": pa.array(np.zeros(n, np.int32)),
            }
        ),
        tmp_path / "embeddings.parquet",
    )

    want = collections.Counter()
    for v in vecs:
        q = int(
            sum(
                int(math.floor(1000.0 * float(np.float64(x)) ** 2))
                for x in v
            )
        )
        want[q // 2] += 1
    assert len(want) > 5  # mixed norms span bands

    got = embedding_norm_hist(str(tmp_path)).to_pandas()
    assert {int(r.band): int(r.n_vecs) for r in got.itertuples()} == dict(
        want
    )


def test_ltv_digits_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import ltv_digit_bands

    g = np.random.default_rng(202)
    n_cust, n_orders = 40, 150
    okeys = np.arange(1, n_orders + 1, dtype=np.int64)
    ocust = g.integers(1, n_cust + 1, n_orders).astype(np.int64)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(okeys),
                "o_custkey": pa.array(ocust),
                "o_orderstatus": pa.array(["O"] * n_orders),
                "o_totalprice": pa.array(np.zeros(n_orders)),
                "o_orderdate": pa.array(
                    np.full(n_orders, 800000000000000), pa.int64()
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n_orders),
            }
        ),
        tmp_path / "orders.parquet",
    )
    lok, lprice, ldisc = [], [], []
    for k in okeys:
        for _ in range(int(g.integers(1, 4))):
            lok.append(int(k))
            # magnitudes spanning 1 to 6 digits
            lprice.append(float(10 ** g.uniform(0, 6)))
            ldisc.append(round(float(g.uniform(0, 0.1)), 2))
    m = len(lok)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.array(lok, np.int64)),
                "l_partkey": pa.array(np.zeros(m, np.int64)),
                "l_suppkey": pa.array(np.zeros(m, np.int64)),
                "l_linenumber": pa.array(np.zeros(m, np.int32)),
                "l_quantity": pa.array(np.ones(m)),
                "l_extendedprice": pa.array(np.array(lprice)),
                "l_discount": pa.array(np.array(ldisc)),
                "l_tax": pa.array(np.zeros(m)),
                "l_returnflag": pa.array(["N"] * m),
                "l_linestatus": pa.array(["O"] * m),
                "l_shipdate": pa.array(
                    np.full(m, 800000000000000), pa.int64()
                ).cast(pa.timestamp("us")),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    per_order = collections.Counter()
    for k, p, dc in zip(lok, lprice, ldisc):
        per_order[k] += int(math.floor(p * (1.0 - dc)))
    per_cust = collections.Counter()
    for k, rev in per_order.items():
        per_cust[int(ocust[k - 1])] += rev
    want = collections.defaultdict(lambda: [0, 0])
    for rev in per_cust.values():
        dg = len(str(rev))
        want[dg][0] += 1
        want[dg][1] += rev
    assert len(want) > 2  # several digit bands populate

    got = ltv_digit_bands(str(tmp_path)).to_pandas().set_index("n_digits")
    assert len(got) == len(want)
    for dg, (nc, rv) in want.items():
        r = got.loc[dg]
        assert (r.n_customers, r.revenue_floor) == (nc, rv), dg
