"""Round-4 wave-30 operators: E87 primary-type migration matrix (era
argmax pairing — the fixture plants users with a deliberate first-half /
second-half flip plus single-half users that must NOT appear), T76
frequency-coverage board (tie-free floor thresholds), R17 market share
(Q8's share-of-a-join; region semi-join + nation CASE-sum) — each vs a
scalar brute-force reference."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MIN_US = 60_000_000


def test_primary_migration_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import (
        EVENTS_T0_US,
        events_primary_migration,
    )

    g = np.random.default_rng(180)
    n = 1600
    types = np.array(["a", "b", "c"])[g.integers(0, 3, n)]
    users = (g.zipf(1.5, n) % 25).astype(np.int64)
    ts = EVENTS_T0_US + g.integers(0, 1000, n).astype(np.int64) * MIN_US
    # dedicated single-half users: 100 only early, 101 only late
    types = np.concatenate([types, ["a"] * 4, ["b"] * 4])
    users = np.concatenate([users, [100] * 4, [101] * 4])
    ts = np.concatenate(
        [
            ts,
            EVENTS_T0_US + np.arange(4, dtype=np.int64) * MIN_US,
            EVENTS_T0_US + (996 + np.arange(4, dtype=np.int64)) * MIN_US,
        ]
    )
    n = len(ts)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(types.tolist()),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "value": pa.array(np.ones(n)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(users),
            }
        ),
        tmp_path / "events.parquet",
    )

    mid = (int(ts.min()) + int(ts.max())) // 2
    per = collections.defaultdict(lambda: [collections.Counter(),
                                           collections.Counter()])
    for t, u, s in zip(types, users, ts):
        per[int(u)][0 if s < mid else 1][t] += 1
    want = collections.Counter()
    one_half = 0
    for u, (h0, h1) in per.items():
        if not h0 or not h1:
            one_half += 1
            continue
        f = min(t for t, c in h0.items() if c == max(h0.values()))
        z = min(t for t, c in h1.items() if c == max(h1.values()))
        want[(f, z)] += 1
    assert one_half > 0  # single-half users exist and must be excluded

    got = events_primary_migration(str(tmp_path)).to_pandas()
    assert {
        (r.from_type, r.to_type): int(r.n_users) for r in got.itertuples()
    } == dict(want)


def test_freq_coverage_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import freq_coverage

    g = np.random.default_rng(181)
    # zipf-ish: a few huge words, a long tail crossing every floor
    vocab = [f"w{i}" for i in range(400)]
    probs = np.array([1.0 / (i + 1) for i in range(400)])
    probs /= probs.sum()
    texts = [
        " ".join(g.choice(vocab, size=g.integers(5, 40), p=probs))
        for _ in range(400)
    ]
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

    cnt = collections.Counter()
    for t in texts:
        cnt.update(t.split(" "))
    tot = sum(cnt.values())
    floors = (10, 100, 1000)
    want = {}
    for fl in floors:
        occ = sum(c for c in cnt.values() if c >= fl)
        nw = sum(1 for c in cnt.values() if c >= fl)
        want[fl] = (nw, occ, 1000 * occ // max(tot, 1))
    # all three floors must separate (different coverage)
    assert len({v[2] for v in want.values()}) == 3

    got = freq_coverage(str(tmp_path)).to_pandas().set_index("min_freq")
    assert len(got) == 3
    for fl, (nw, occ, cov) in want.items():
        r = got.loc[fl]
        assert (r.n_words, r.n_occurrences, r.coverage_permille) == (
            nw, occ, cov,
        ), fl


def test_market_share_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import market_share

    g = np.random.default_rng(182)
    n_nat, n_cust, n_supp, n_orders = 5, 30, 12, 200
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(np.arange(n_nat, dtype=np.int64)),
                "n_name": pa.array([f"NATION_{i}" for i in range(n_nat)]),
                "n_regionkey": pa.array(
                    (np.arange(n_nat) % 2).astype(np.int64)
                ),
            }
        ),
        tmp_path / "nation.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array(np.arange(2, dtype=np.int64)),
                "r_name": pa.array(["AFRICA", "AMERICA"]),
            }
        ),
        tmp_path / "region.parquet",
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
    odate = (
        np.datetime64("1995-01-01")
        + g.integers(0, 1100, n_orders).astype("timedelta64[D]")
    ).astype("datetime64[us]")
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(okeys),
                "o_custkey": pa.array(ocust, pa.int64()),
                "o_orderstatus": pa.array(["O"] * n_orders),
                "o_totalprice": pa.array(np.zeros(n_orders)),
                "o_orderdate": pa.array(
                    odate.astype(np.int64), pa.int64()
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n_orders),
            }
        ),
        tmp_path / "orders.parquet",
    )
    lok, lsup, lprice, ldisc = [], [], [], []
    for k in okeys:
        for _ in range(int(g.integers(1, 4))):
            lok.append(int(k))
            lsup.append(int(suppkeys[g.integers(0, n_supp)]))
            lprice.append(round(float(g.uniform(10, 2000)), 2))
            ldisc.append(round(float(g.uniform(0, 0.1)), 2))
    m = len(lok)
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
                    np.full(m, odate[0].astype(np.int64)), pa.int64()
                ).cast(pa.timestamp("us")),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    # region AMERICA = regionkey 1 = nations {1, 3}; nation X = NATION_1
    region_nats = {1, 3}
    o2n = {int(k): int(cnat[int(c) - 1]) for k, c in zip(okeys, ocust)}
    o2y = {int(k): int(str(d.astype("datetime64[Y]")))
           for k, d in zip(okeys, odate)}
    s2n = {int(k): int(v) for k, v in zip(suppkeys, snat)}
    want = collections.defaultdict(lambda: [0, 0])
    for k, s, p, dc in zip(lok, lsup, lprice, ldisc):
        if o2n[k] in region_nats:
            rev = int(math.floor(p * (1.0 - dc)))
            w = want[o2y[k]]
            w[0] += rev
            if s2n[s] == 1:
                w[1] += rev
    assert any(w[1] for w in want.values())

    got = market_share(str(tmp_path)).to_pandas().set_index("o_year")
    assert len(got) == len(want)
    for yr, (tot, xr) in want.items():
        r = got.loc[yr]
        assert (r.total_rev, r.nation_rev) == (tot, xr), yr
        assert r.share_permille == (1000 * xr) // max(tot, 1)
