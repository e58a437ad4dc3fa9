"""Relational join suite (R1-R3) vs scalar brute force on synthetic
TPC-H-shaped tables hitting the join edge cases: orders with no lines
(dropped by the inner join), customers with no orders, a custkey absent
from the dimension side (dropped by the broadcast join), month/year
boundaries, and the shipdate cutoff landing mid-data."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY_US = 86_400_000_000
T0 = np.datetime64("1995-01-01", "us").astype(np.int64)  # epoch us


def _write_tables(tmp_path, seed: int, n_orders: int = 300, n_cust: int = 40):
    g = np.random.default_rng(seed)
    # customers: keys NOT contiguous (holes force searchsorted misses)
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
    # orders: one custkey (value 0) never in customer -> dropped in R3
    okeys = np.arange(1, n_orders + 1, dtype=np.int64)
    ocust = custkeys[g.integers(0, n_cust, n_orders)].astype(np.int64)
    ocust[0] = 0
    odate = T0 + g.integers(0, 900, n_orders).astype(np.int64) * DAY_US
    oprio = np.array(["1-URGENT", "2-HIGH", "3-LOW"])[g.integers(0, 3, n_orders)]
    ototal = np.round(g.uniform(10, 5000, n_orders), 2)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(okeys),
                "o_custkey": pa.array(ocust),
                "o_orderstatus": pa.array(["O"] * n_orders),
                "o_totalprice": pa.array(ototal),
                "o_orderdate": pa.array(odate, pa.int64()).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(oprio.tolist()),
            }
        ),
        tmp_path / "orders.parquet",
    )
    # lineitems: orders 1..n-20 get 1-5 lines; the last 20 orders get NONE
    lok, lqty, lprice, lship = [], [], [], []
    for k in okeys[:-20]:
        for _ in range(int(g.integers(1, 6))):
            lok.append(k)
            lqty.append(float(g.integers(1, 50)))
            lprice.append(round(float(g.uniform(10, 2000)), 2))
            lship.append(int(T0 + g.integers(0, 1000) * DAY_US))
    m = len(lok)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.array(lok, np.int64)),
                "l_partkey": pa.array(np.zeros(m, np.int64)),
                "l_suppkey": pa.array(np.zeros(m, np.int64)),
                "l_linenumber": pa.array(np.zeros(m, np.int32)),
                "l_quantity": pa.array(np.array(lqty)),
                "l_extendedprice": pa.array(np.array(lprice)),
                "l_discount": pa.array(np.zeros(m)),
                "l_tax": pa.array(np.zeros(m)),
                "l_returnflag": pa.array(
                    np.array(["A", "N", "R"])[g.integers(0, 3, m)].tolist()
                ),
                "l_linestatus": pa.array(
                    np.array(["F", "O"])[g.integers(0, 2, m)].tolist()
                ),
                "l_shipdate": pa.array(np.array(lship, np.int64)).cast(
                    pa.timestamp("us")
                ),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    return custkeys, segments, okeys, ocust, odate, oprio, ototal, (
        np.array(lok, np.int64),
        np.array(lqty),
        np.array(lprice),
        np.array(lship, np.int64),
    )


def test_pricing_summary_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import pricing_summary

    *_, lines = _write_tables(tmp_path, seed=64)
    lok, lqty, lprice, lship = lines
    cutoff = np.datetime64("1996-06-15", "us").astype(np.int64)
    flags = pq.read_table(tmp_path / "lineitem.parquet").to_pandas()
    keep = lship <= cutoff
    want = collections.defaultdict(lambda: [0, 0, 0])
    for i in np.flatnonzero(keep):
        cell = (flags.l_returnflag[i], flags.l_linestatus[i])
        want[cell][0] += 1
        want[cell][1] += int(lqty[i])
        want[cell][2] += math.floor(lprice[i])

    got = pricing_summary(str(tmp_path), cutoff="1996-06-15").to_pandas()
    assert len(got) == len(want)
    for r in got.itertuples():
        w = want[(r.l_returnflag, r.l_linestatus)]
        assert (r.n_lines, r.sum_qty, r.sum_price_floor) == tuple(w)


def test_order_fulfillment_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import order_fulfillment

    _, _, okeys, _, odate, oprio, _, lines = _write_tables(tmp_path, seed=65)
    lok, lqty, lprice, _ = lines
    month = odate.astype("datetime64[us]").astype("datetime64[M]")
    meta = {int(k): (p, m) for k, p, m in zip(okeys, oprio, month)}
    cells = collections.defaultdict(lambda: [set(), 0, 0, 0])
    for k, q, p in zip(lok, lqty, lprice):
        pr, mo = meta[int(k)]
        c = cells[(pr, mo)]
        c[0].add(int(k))
        c[1] += 1
        c[2] += int(q)
        c[3] += math.floor(p)
    # orders without lines appear in NO cell
    assert all(int(k) in meta for k in lok)

    got = order_fulfillment(str(tmp_path)).to_pandas()
    assert len(got) == len(cells)
    assert got.n_orders.sum() == len(set(lok.tolist()))
    for r in got.itertuples():
        mo = np.datetime64(r.order_month.to_datetime64(), "M")
        c = cells[(r.o_orderpriority, mo)]
        assert (r.n_orders, r.n_lines, r.sum_qty, r.revenue_floor) == (
            len(c[0]),
            c[1],
            c[2],
            c[3],
        )


def test_segment_sales_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import segment_sales

    custkeys, segments, okeys, ocust, odate, _, ototal, _ = _write_tables(
        tmp_path, seed=66
    )
    seg_of = {int(k): s for k, s in zip(custkeys, segments)}
    year = odate.astype("datetime64[us]").astype("datetime64[Y]")
    want = collections.defaultdict(lambda: [0, 0])
    dropped = 0
    for ck, yr, tp in zip(ocust, year, ototal):
        if int(ck) not in seg_of:
            dropped += 1
            continue
        c = want[(seg_of[int(ck)], yr)]
        c[0] += 1
        c[1] += math.floor(tp)
    assert dropped >= 1  # the orphan order is really exercised

    got = segment_sales(str(tmp_path)).to_pandas()
    assert len(got) == len(want)
    for r in got.itertuples():
        yr = np.datetime64(r.order_year.to_datetime64(), "Y")
        c = want[(r.c_mktsegment, yr)]
        assert (r.n_orders, r.sum_total_floor) == tuple(c)


def test_region_revenue_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import region_revenue

    g = np.random.default_rng(67)
    # snowflake dims: 5 regions, 8 nations, 12 suppliers (plus one orphan
    # suppkey in lineitem that must drop out of the inner join)
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array(np.arange(5, dtype=np.int64)),
                "r_name": pa.array([f"R{i}" for i in range(5)]),
            }
        ),
        tmp_path / "region.parquet",
    )
    n_rk = g.integers(0, 5, 8).astype(np.int64)
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(np.arange(8, dtype=np.int64)),
                "n_name": pa.array([f"N{i}" for i in range(8)]),
                "n_regionkey": pa.array(n_rk),
            }
        ),
        tmp_path / "nation.parquet",
    )
    s_nk = g.integers(0, 8, 12).astype(np.int64)
    skeys = (np.arange(12, dtype=np.int64) * 3) + 1  # holes in the key space
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(skeys),
                "s_name": pa.array([f"S{i}" for i in range(12)]),
                "s_nationkey": pa.array(s_nk),
                "s_acctbal": pa.array(g.uniform(0, 100, 12)),
            }
        ),
        tmp_path / "supplier.parquet",
    )
    m = 400
    lsup = skeys[g.integers(0, 12, m)].astype(np.int64)
    lsup[0] = 999  # orphan supplier
    lship = T0 + g.integers(0, 1200, m).astype(np.int64) * DAY_US
    lprice = np.round(g.uniform(10, 900, m), 2)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(m, dtype=np.int64)),
                "l_partkey": pa.array(np.zeros(m, np.int64)),
                "l_suppkey": pa.array(lsup),
                "l_linenumber": pa.array(np.zeros(m, np.int32)),
                "l_quantity": pa.array(np.ones(m)),
                "l_extendedprice": pa.array(lprice),
                "l_discount": pa.array(np.zeros(m)),
                "l_tax": pa.array(np.zeros(m)),
                "l_returnflag": pa.array(["A"] * m),
                "l_linestatus": pa.array(["F"] * m),
                "l_shipdate": pa.array(lship, pa.int64()).cast(pa.timestamp("us")),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    region_of = {int(k): f"R{n_rk[nk]}" for k, nk in zip(skeys, s_nk)}
    year = lship.astype("datetime64[us]").astype("datetime64[Y]")
    want = collections.defaultdict(lambda: [0, 0])
    for sk, yr, p in zip(lsup, year, lprice):
        if int(sk) not in region_of:
            continue
        c = want[(region_of[int(sk)], yr)]
        c[0] += 1
        c[1] += math.floor(p)

    got = region_revenue(str(tmp_path)).to_pandas()
    assert len(got) == len(want)
    assert got.n_lines.sum() == m - 1  # exactly the orphan line dropped
    for r in got.itertuples():
        yr = np.datetime64(r.ship_year.to_datetime64(), "Y")
        assert (r.n_lines, r.revenue_floor) == tuple(want[(r.r_name, yr)])


def test_brand_volume_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import brand_volume

    g = np.random.default_rng(68)
    n_parts = 30
    pkeys = np.arange(1, n_parts + 1, dtype=np.int64)
    pbrand = np.array([f"B{i % 4}" for i in range(n_parts)])
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(pkeys),
                "p_name": pa.array([f"p{k}" for k in pkeys]),
                "p_brand": pa.array(pbrand.tolist()),
                "p_type": pa.array(["t"] * n_parts),
                "p_size": pa.array(np.ones(n_parts, np.int64)),
                "p_retailprice": pa.array(np.ones(n_parts)),
            }
        ),
        tmp_path / "part.parquet",
    )
    m = 500
    lpart = pkeys[g.integers(0, n_parts, m)].astype(np.int64)
    lqty = g.integers(1, 50, m).astype(float)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(m, dtype=np.int64)),
                "l_partkey": pa.array(lpart),
                "l_suppkey": pa.array(np.zeros(m, np.int64)),
                "l_linenumber": pa.array(np.zeros(m, np.int32)),
                "l_quantity": pa.array(lqty),
                "l_extendedprice": pa.array(np.ones(m)),
                "l_discount": pa.array(np.zeros(m)),
                "l_tax": pa.array(np.zeros(m)),
                "l_returnflag": pa.array(["A"] * m),
                "l_linestatus": pa.array(["F"] * m),
                "l_shipdate": pa.array(
                    np.full(m, T0, np.int64), pa.int64()
                ).cast(pa.timestamp("us")),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    brand_of = {int(k): b for k, b in zip(pkeys, pbrand)}
    agg = collections.defaultdict(lambda: [set(), 0, 0])
    for pk, q in zip(lpart, lqty):
        c = agg[brand_of[int(pk)]]
        c[0].add(int(pk))
        c[1] += 1
        c[2] += int(q)
    want = sorted(agg.items(), key=lambda kv: (-kv[1][2], kv[0]))[:3]

    got = brand_volume(str(tmp_path), top_k=3).to_pandas()
    assert len(got) == 3
    for r, (b, c) in zip(got.itertuples(), want):
        assert (r.p_brand, r.n_parts, r.n_lines, r.sum_qty) == (
            b,
            len(c[0]),
            c[1],
            c[2],
        )
