"""Round-4 wave-31 operators: E88 transition-latency quantiles (adjacency
per user stream, gaps floored to seconds), T77 split + leakage board (the
fixture plants identical texts across splits so the leak lane is
load-bearing), R18 lapsed-customer anti/semi join (never-ordered
customers must lapse through the NOT-EXISTS lane) — each vs a scalar
brute-force reference."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MIN_US = 60_000_000
P, MULT = 1_000_000_007, 2_654_435_761


def test_transition_latency_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import (
        EVENTS_T0_US,
        events_transition_latency,
    )

    g = np.random.default_rng(190)
    n = 1200
    types = np.array(["a", "b", "c"])[g.integers(0, 3, n)]
    users = (g.zipf(1.6, n) % 20).astype(np.int64)
    ts = EVENTS_T0_US + g.integers(0, 5000, n).astype(np.int64) * 7_000_000
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

    per_user = collections.defaultdict(list)
    for i, (t, u, s) in enumerate(zip(types, users, ts)):
        per_user[int(u)].append((int(s), i, t))
    gaps = collections.defaultdict(list)
    for evs in per_user.values():
        evs.sort()
        for (s1, _i1, t1), (s2, _i2, t2) in zip(evs[:-1], evs[1:]):
            gaps[(t1, t2)].append((s2 - s1) // 1_000_000)

    got = events_transition_latency(str(tmp_path)).to_pandas()
    assert len(got) == len(gaps)
    for r in got.itertuples():
        vals = sorted(gaps[(r.from_type, r.to_type)])
        nt = len(vals)
        assert r.n_pairs == nt
        for q, col in ((500, "p50_s"), (900, "p90_s")):
            thr = (nt * q + 999) // 1000
            assert getattr(r, col) == vals[thr - 1], (r.from_type, r.to_type)


def test_split_board_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import split_board

    g = np.random.default_rng(191)
    vocab = [f"w{i}" for i in range(50)]
    n = 3000  # large enough that val/test strata populate
    texts = [
        " ".join(g.choice(vocab, size=g.integers(2, 12))) for _ in range(n)
    ]

    def split_of(d):
        b = ((d % P) * MULT) % P % 1000
        return "train" if b < 980 else ("val" if b < 990 else "test")

    # plant cross-split duplicates: copy a train doc's text onto docs that
    # hash into val and test
    train_doc = next(i for i in range(n) if split_of(i) == "train")
    val_doc = next(i for i in range(n) if split_of(i) == "val")
    test_doc = next(i for i in range(n) if split_of(i) == "test")
    texts[val_doc] = texts[train_doc]
    texts[test_doc] = texts[train_doc]

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * n),
                "source": pa.array(["s0"] * n),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    want = {s: [0, 0, 0] for s in ("train", "val", "test")}
    by_text = collections.defaultdict(set)
    docs = []
    for i, t in enumerate(texts):
        s = split_of(i)
        docs.append((i, t, s))
        by_text[t].add(s)
        want[s][0] += 1
        want[s][1] += len(t.split(" "))
    for i, t, s in docs:
        if len(by_text[t]) > 1:
            want[s][2] += 1
    assert all(want[s][0] > 0 for s in want)
    assert want["val"][2] >= 1 and want["test"][2] >= 1

    got = split_board(str(tmp_path)).to_pandas().set_index("split")
    assert len(got) == 3
    for s, (nd, ntok, leak) in want.items():
        r = got.loc[s]
        assert (r.n_docs, r.n_tokens, r.n_leaked) == (nd, ntok, leak), s


def test_lapsed_customers_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import lapsed_customers

    g = np.random.default_rng(192)
    n_nat, n_cust, n_orders = 4, 40, 120
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
    bal = g.uniform(-900, 9000, n_cust)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(custkeys),
                "c_name": pa.array([f"c{k}" for k in custkeys]),
                "c_nationkey": pa.array(cnat),
                "c_acctbal": pa.array(bal),
                "c_mktsegment": pa.array(["M"] * n_cust),
            }
        ),
        tmp_path / "customer.parquet",
    )
    # orders only for the first 30 customers: 10 never order (anti lane)
    ocust = custkeys[g.integers(0, 30, n_orders)]
    odate = (
        np.datetime64("1996-01-01")
        + g.integers(0, 2200, n_orders).astype("timedelta64[D]")
    ).astype("datetime64[us]")
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(
                    np.arange(1, n_orders + 1, dtype=np.int64)
                ),
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

    cutoff = np.datetime64("2000-01-01", "us")
    last = {}
    for k, d in zip(ocust, odate):
        last[int(k)] = max(last.get(int(k), d), d)
    want = {f"N{i}": [0, 0, 0] for i in range(n_nat)}
    never = 0
    for k, nk, b in zip(custkeys, cnat, bal):
        w = want[f"N{nk}"]
        w[0] += 1
        m = last.get(int(k))
        if m is None or m < cutoff:
            never += m is None
            w[1] += 1
            w[2] += int(math.floor(b))
    assert never > 0  # the NOT-EXISTS lane is exercised

    got = lapsed_customers(str(tmp_path)).to_pandas().set_index("n_name")
    assert len(got) == n_nat
    for nm, (nc, nl, lb) in want.items():
        r = got.loc[nm]
        assert (r.n_customers, r.n_lapsed, r.lapsed_bal_floor) == (
            nc, nl, lb,
        ), nm
