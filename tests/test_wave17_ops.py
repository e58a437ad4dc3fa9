"""Round-4 wave-17 relational operators: R6 order-count distribution
(LEFT-OUTER histogram incl. the zero bucket), R7 top-k revenue orders
(two chained co-partitioned hops + local top-k), R8 EXISTS semi-join
priority board — each vs a scalar brute-force reference on synthetic
TPC-H-shaped tables hitting the join edge cases: customers with NO
orders (the zero bucket), orders with no qualifying lines, lines whose
orderkey is absent from orders, revenue ties at the top-k boundary."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY_US = 86_400_000_000
T0 = np.datetime64("1995-01-01", "us").astype(np.int64)


def _write_rel(tmp_path, seed: int, n_orders: int = 250, n_cust: int = 60):
    g = np.random.default_rng(seed)
    custkeys = np.sort(g.choice(np.arange(1, n_cust * 3), n_cust, replace=False))
    segments = np.array(["AUTO", "BUILD", "MACH"])[g.integers(0, 3, n_cust)]
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(custkeys.astype(np.int64)),
                "c_name": pa.array([f"c{k}" for k in custkeys]),
                "c_nationkey": pa.array(g.integers(0, 5, n_cust).astype(np.int64)),
                "c_acctbal": pa.array(g.uniform(0, 1000, n_cust)),
                "c_mktsegment": pa.array(segments.tolist()),
            }
        ),
        tmp_path / "customer.parquet",
    )
    # orders drawn from only the FIRST 2/3 of customers -> the rest have
    # zero orders (the Q13 zero bucket); one o_custkey never in customer
    okeys = np.arange(1, n_orders + 1, dtype=np.int64)
    ocust = custkeys[g.integers(0, (2 * n_cust) // 3, n_orders)].astype(np.int64)
    ocust[0] = 0
    odate = T0 + g.integers(0, 900, n_orders).astype(np.int64) * DAY_US
    oprio = np.array(["1-URGENT", "2-HIGH", "3-LOW"])[g.integers(0, 3, n_orders)]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(okeys),
                "o_custkey": pa.array(ocust),
                "o_orderstatus": pa.array(["O"] * n_orders),
                "o_totalprice": pa.array(np.round(g.uniform(10, 5000, n_orders), 2)),
                "o_orderdate": pa.array(odate, pa.int64()).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(oprio.tolist()),
            }
        ),
        tmp_path / "orders.parquet",
    )
    # lines: last 20 orders get NONE; random discounts; a few lines point
    # at an orderkey beyond the orders table (dropped by every join)
    lok, lprice, ldisc, lship = [], [], [], []
    for k in okeys[:-20]:
        for _ in range(int(g.integers(1, 6))):
            lok.append(k)
            lprice.append(round(float(g.uniform(10, 2000)), 2))
            ldisc.append(round(float(g.uniform(0, 0.1)), 2))
            lship.append(int(T0 + g.integers(0, 1000) * DAY_US))
    for _ in range(5):
        lok.append(n_orders + 100)
        lprice.append(500.0)
        ldisc.append(0.1)
        lship.append(int(T0))
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
                "l_shipdate": pa.array(np.array(lship, np.int64), pa.int64()).cast(
                    pa.timestamp("us")
                ),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    return custkeys, segments, okeys, ocust, odate, oprio, np.array(lok), np.array(
        lprice
    ), np.array(ldisc), np.array(lship, np.int64)


def test_order_count_distribution_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import order_count_distribution

    custkeys, _, _, ocust, *_ = _write_rel(tmp_path, seed=90)
    per_cust = collections.Counter(ocust.tolist())
    hist = collections.Counter(per_cust.get(int(c), 0) for c in custkeys)
    assert hist[0] > 0  # the fixture must exercise the zero bucket

    got = order_count_distribution(str(tmp_path)).to_pandas()
    assert dict(zip(got.n_orders, got.n_customers)) == dict(hist)


def test_top_revenue_orders_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import top_revenue_orders

    custkeys, segments, okeys, ocust, odate, _, lok, lprice, ldisc, lship = (
        _write_rel(tmp_path, seed=91)
    )
    seg = min(segments)
    cutoff = int(np.datetime64("1996-06-01", "us").astype(np.int64))
    seg_custs = {int(c) for c, s in zip(custkeys, segments) if s == seg}
    surv = {
        int(k): int(d)
        for k, c, d in zip(okeys, ocust, odate)
        if int(c) in seg_custs and d < cutoff
    }
    rev = collections.defaultdict(int)
    for k, p, dc, sd in zip(lok, lprice, ldisc, lship):
        if sd > cutoff:
            rev[int(k)] += int(np.floor(p * (1.0 - dc)))
    rows = sorted(
        ((r, k, surv[k]) for k, r in rev.items() if k in surv),
        key=lambda t: (-t[0], t[1]),
    )[:10]

    got = top_revenue_orders(str(tmp_path), cutoff="1996-06-01").to_pandas()
    assert len(got) == len(rows)
    for want, r in zip(rows, got.itertuples()):
        assert (r.revenue_floor, r.o_orderkey) == (want[0], want[1])
        assert int(r.o_orderdate.value // 1000) == want[2]


def test_priority_discount_orders_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import priority_discount_orders

    _, _, okeys, _, _, oprio, lok, _, ldisc, _ = _write_rel(tmp_path, seed=92)
    qualifying = {int(k) for k, d in zip(lok, ldisc) if d > 0.05}
    want = collections.Counter(
        p for k, p in zip(okeys, oprio) if int(k) in qualifying
    )

    got = priority_discount_orders(str(tmp_path), min_discount=0.05).to_pandas()
    assert dict(zip(got.o_orderpriority, got.n_orders)) == dict(want)
