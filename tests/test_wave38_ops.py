"""Round-4 wave-38 operators: E94 session-gap sensitivity curve (all
thresholds in one pass; fixture gaps straddle every threshold), T84
positional token statistics (fixture pins a BOS-style constant at
position 0 that the min=max collapse must reveal), R24 monthly-active-
customer curve — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MIN_US = 60_000_000


def test_session_sensitivity_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import (
        EVENTS_T0_US,
        events_session_sensitivity,
    )

    g = np.random.default_rng(250)
    n = 1200
    users = (g.zipf(1.6, n) % 20).astype(np.int64)
    # inter-event steps from seconds to hours so every threshold bites
    ts = EVENTS_T0_US + np.cumsum(
        g.choice([30, 600, 1200, 2400, 5400], size=n)
    ).astype(np.int64) * 1_000_000
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(["a"] * n),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "value": pa.array(np.ones(n)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(users),
            }
        ),
        tmp_path / "events.parquet",
    )

    per = collections.defaultdict(list)
    for i, (u, t) in enumerate(zip(users, ts)):
        per[int(u)].append((int(t), i))
    want = {}
    for thr in (900, 1800, 3600):
        total = 0
        for evs in per.values():
            evs.sort()
            total += 1 + sum(
                1
                for a, b in zip(evs[:-1], evs[1:])
                if b[0] - a[0] > thr * 1_000_000
            )
        want[thr] = total
    assert len(set(want.values())) == 3  # thresholds separate

    got = events_session_sensitivity(str(tmp_path)).to_pandas().set_index(
        "gap_s"
    )
    assert len(got) == 3
    for thr, ns in want.items():
        assert got.loc[thr].n_sessions == ns, thr


def test_token_position_stats_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import token_position_stats

    g = np.random.default_rng(251)
    rows = []
    for i in range(250):
        toks = g.integers(10, 5000, g.integers(1, 20)).tolist()
        toks[0] = 7  # BOS-style constant at position 0
        rows.append(toks)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([f"s00-{i:08d}" for i in range(len(rows))]),
                "tokens": pa.array(rows, pa.list_(pa.int32())),
                "n_tok": pa.array(
                    np.array([len(t) for t in rows], np.int32)
                ),
                "source": pa.array(["s00"] * len(rows)),
            }
        ),
        tmp_path / "part-00000.parquet",
    )

    want = {}
    for toks in rows:
        for p, t in enumerate(toks):
            n, lo, hi = want.get(p, (0, 1 << 62, -(1 << 62)))
            want[p] = (n + 1, min(lo, t), max(hi, t))

    got = token_position_stats(str(tmp_path)).to_pandas().set_index("pos")
    assert len(got) == len(want)
    for p, (n, lo, hi) in want.items():
        r = got.loc[p]
        assert (r.n_seqs, r.min_tok, r.max_tok) == (n, lo, hi), p
    assert got.loc[0].min_tok == got.loc[0].max_tok == 7  # pinned BOS


def test_monthly_customers_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import monthly_customers

    g = np.random.default_rng(252)
    n_orders = 400
    ocust = g.integers(1, 40, n_orders).astype(np.int64)
    odate = (
        np.datetime64("1996-01-01")
        + g.integers(0, 700, n_orders).astype("timedelta64[D]")
    ).astype("datetime64[us]")
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(
                    np.arange(1, n_orders + 1, dtype=np.int64)
                ),
                "o_custkey": pa.array(ocust),
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

    per = collections.defaultdict(lambda: [0, set()])
    for c, d in zip(ocust, odate):
        m = str(d.astype("datetime64[M]"))
        per[m][0] += 1
        per[m][1].add(int(c))
    # repeat customers within a month exist (distinct < orders somewhere)
    assert any(len(s) < n for n, s in per.values())

    got = monthly_customers(str(tmp_path)).to_pandas()
    assert len(got) == len(per)
    for r in got.itertuples():
        m = str(np.datetime64(r.month, "M"))
        no, cs = per[m]
        assert (r.n_orders, r.n_customers) == (no, len(cs)), m
