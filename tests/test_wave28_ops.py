"""Round-4 wave-28 operators: E85 per-minute dominant-type board (the
fixture forces count ties so the type-ascending tie-break is
load-bearing), T74 shingle-vocabulary growth curve (Heaps board; the
fixture plants a vocabulary shift mid-corpus so late deciles introduce
shingles), R15 bilateral nation trade (Q7's inequality cross-side
predicate) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MIN_US = 60_000_000


def test_minute_mode_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import EVENTS_T0_US, events_minute_mode

    g = np.random.default_rng(160)
    n = 1200
    types = np.array(["a", "b", "c"])[g.integers(0, 3, n)]
    minute = g.integers(0, 90, n).astype(np.int64)
    ts = EVENTS_T0_US + minute * MIN_US + g.integers(0, 60, n) * 1_000_000
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(types.tolist()),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "value": pa.array(np.ones(n)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.zeros(n, np.int64)),
            }
        ),
        tmp_path / "events.parquet",
    )

    per_min = collections.defaultdict(collections.Counter)
    for t, m in zip(types, minute):
        per_min[int(m)][t] += 1
    # at this density ties at the top are inevitable — assert so
    assert any(
        len([1 for c in cnt.values() if c == max(cnt.values())]) > 1
        for cnt in per_min.values()
    )

    got = events_minute_mode(str(tmp_path)).to_pandas()
    assert len(got) == len(per_min)
    for r in got.itertuples():
        m = (np.datetime64(r.minute_ts, "us").astype(np.int64)
             - EVENTS_T0_US) // MIN_US
        cnt = per_min[int(m)]
        top = max(cnt.values())
        assert r.mode_type == min(t for t, c in cnt.items() if c == top)
        assert r.n_mode == top
        assert r.n_total == sum(cnt.values())


def test_vocab_growth_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import vocab_growth

    g = np.random.default_rng(161)
    early = [f"e{i}" for i in range(12)]
    late = [f"l{i}" for i in range(12)]
    texts = []
    for i in range(200):
        vocab = early if i < 120 else late  # shift at 60% of the corpus
        texts.append(" ".join(g.choice(vocab, size=g.integers(3, 15))))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["s0"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    first = {}
    for i, t in enumerate(texts):
        ws = t.split(" ")
        if len(ws) < 3:
            shingles = {" ".join(ws)}
        else:
            shingles = {
                " ".join(ws[j : j + 3]) for j in range(len(ws) - 2)
            }
        for s in shingles:
            first.setdefault(s, i)
    want = collections.Counter(
        min(10 * d // len(texts), 9) for d in first.values()
    )
    assert any(k >= 6 for k in want)  # the shift populates late deciles

    got = vocab_growth(str(tmp_path)).to_pandas()
    assert {int(r.decile): int(r.n_new_shingles) for r in got.itertuples()} \
        == dict(want)


def test_nation_trade_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import nation_trade_volume

    g = np.random.default_rng(162)
    n_nat, n_cust, n_supp, n_orders = 4, 25, 12, 160
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(np.arange(n_nat, dtype=np.int64)),
                "n_name": pa.array([f"N{i}" for i in range(n_nat)]),
                "n_regionkey": pa.array(np.zeros(n_nat, np.int64)),
            }
        ),
        tmp_path / "nation.parquet",
    )
    custkeys = np.arange(1, n_cust + 1, dtype=np.int64)
    cnat = g.integers(0, n_nat, n_cust).astype(np.int64)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(custkeys),
                "c_name": pa.array([f"c{k}" for k in custkeys]),
                "c_nationkey": pa.array(cnat),
                "c_acctbal": pa.array(np.zeros(n_cust)),
                "c_mktsegment": pa.array(["M"] * n_cust),
            }
        ),
        tmp_path / "customer.parquet",
    )
    suppkeys = np.arange(1, n_supp + 1, dtype=np.int64)
    snat = g.integers(0, n_nat, n_supp).astype(np.int64)
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(suppkeys),
                "s_name": pa.array([f"s{k}" for k in suppkeys]),
                "s_nationkey": pa.array(snat),
                "s_acctbal": pa.array(np.zeros(n_supp)),
            }
        ),
        tmp_path / "supplier.parquet",
    )
    okeys = np.arange(1, n_orders + 1, dtype=np.int64)
    ocust = custkeys[g.integers(0, n_cust, n_orders)]
    t0 = np.datetime64("1995-06-01", "us").astype(np.int64)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(okeys),
                "o_custkey": pa.array(ocust, pa.int64()),
                "o_orderstatus": pa.array(["O"] * n_orders),
                "o_totalprice": pa.array(np.zeros(n_orders)),
                "o_orderdate": pa.array(
                    np.full(n_orders, t0), pa.int64()
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n_orders),
            }
        ),
        tmp_path / "orders.parquet",
    )
    lok, lsup, lprice, ldisc, lship = [], [], [], [], []
    for k in okeys:
        for _ in range(int(g.integers(1, 5))):
            lok.append(int(k))
            lsup.append(int(suppkeys[g.integers(0, n_supp)]))
            lprice.append(round(float(g.uniform(10, 2000)), 2))
            ldisc.append(round(float(g.uniform(0, 0.1)), 2))
            lship.append(
                np.datetime64("1995-01-01")
                + g.integers(0, 1000).astype("timedelta64[D]")
            )
    m = len(lok)
    ship = np.array(lship, dtype="datetime64[us]")
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.array(lok, np.int64)),
                "l_partkey": pa.array(np.zeros(m, np.int64)),
                "l_suppkey": pa.array(np.array(lsup, np.int64)),
                "l_linenumber": pa.array(np.zeros(m, np.int32)),
                "l_quantity": pa.array(np.ones(m)),
                "l_extendedprice": pa.array(np.array(lprice)),
                "l_discount": pa.array(np.array(ldisc)),
                "l_tax": pa.array(np.zeros(m)),
                "l_returnflag": pa.array(["N"] * m),
                "l_linestatus": pa.array(["O"] * m),
                "l_shipdate": pa.array(
                    ship.astype(np.int64), pa.int64()
                ).cast(pa.timestamp("us")),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    o2n = {int(k): int(cnat[int(c) - 1]) for k, c in zip(okeys, ocust)}
    s2n = {int(k): int(v) for k, v in zip(suppkeys, snat)}
    want = collections.defaultdict(lambda: [0, 0])
    for k, s, p, dc, sd in zip(lok, lsup, lprice, ldisc, ship):
        sn, cn = s2n[s], o2n[k]
        if sn != cn:
            yr = int(str(sd.astype("datetime64[Y]")))
            w = want[(f"N{sn}", f"N{cn}", yr)]
            w[0] += 1
            w[1] += int(math.floor(p * (1.0 - dc)))
    assert len(want) > 10

    got = nation_trade_volume(str(tmp_path)).to_pandas()
    assert len(got) == len(want)
    for r in got.itertuples():
        nl, rv = want[(r.supp_nation, r.cust_nation, int(r.l_year))]
        assert (r.n_lines, r.revenue_floor) == (nl, rv)
