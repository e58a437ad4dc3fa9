"""Round-4 wave-39 operators: T85/F sequence-gap audit (the fixture
plants gaps that CROSS the windowed exchange's boundaries plus duplicate
seqs), T86/F hourly n_tok quantiles, R25 yearly growth — each vs a
scalar brute-force reference."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_f1(tmp_path, rows):
    """rows: list of (source, seq, n_tok)."""
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(
                    [f"{s}-{q:08d}" for s, q, _n in rows]
                ),
                "tokens": pa.array(
                    [[1] * n for _s, _q, n in rows], pa.list_(pa.int32())
                ),
                "n_tok": pa.array(
                    np.array([n for _s, _q, n in rows], np.int32)
                ),
                "source": pa.array([s for s, _q, _n in rows]),
            }
        ),
        tmp_path / "part-00000.parquet",
    )


def test_f1_gap_report_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import f1_gap_report

    g = np.random.default_rng(260)
    rows = []
    # source A: seqs 0..999 with 100 random drops + a huge planted gap
    # that crosses the 2^16 window boundary; source B: dups
    keep = sorted(set(range(1000)) - set(g.choice(1000, 100, replace=False)))
    for q in keep:
        rows.append(("s0A", q, int(g.integers(1, 30))))
    rows.append(("s0A", 70_000, 5))  # crosses the 65536-window boundary
    for q in range(50):
        rows.append(("s0B", q, 3))
    rows += [("s0B", 10, 3), ("s0B", 10, 3)]  # redelivered seqs
    _write_f1(tmp_path, rows)

    per = collections.defaultdict(list)
    for s, q, _n in rows:
        per[s].append(q)
    want = {}
    for s, qs in per.items():
        ds = sorted(set(qs))
        gaps = [b - a - 1 for a, b in zip(ds[:-1], ds[1:])]
        want[s] = (
            len(qs),
            len(ds),
            ds[-1] - ds[0] + 1 - len(ds),
            max(gaps) if gaps else 0,
            len(qs) - len(ds),
        )
    assert want["s0A"][3] > 60_000  # the cross-window gap is load-bearing

    got = f1_gap_report(str(tmp_path)).to_pandas().set_index("source")
    assert len(got) == 2
    for s, (nr, nd, miss, mg, dup) in want.items():
        r = got.loc[s]
        assert (
            r.n_rows, r.n_distinct, r.n_missing, r.max_gap, r.n_dup_rows,
        ) == (nr, nd, miss, mg, dup), s


def test_f1_ntok_quantiles_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import f1_ntok_quantiles_1h

    g = np.random.default_rng(261)
    rows = []
    for i in range(800):
        rows.append(
            (f"s0{i % 2}", int(g.integers(0, 3 * 3600)), int(g.integers(1, 64)))
        )
    _write_f1(tmp_path, rows)

    per = collections.defaultdict(list)
    for s, q, n in rows:
        per[(s, q // 3600)].append(n)

    got = f1_ntok_quantiles_1h(str(tmp_path)).to_pandas()
    assert len(got) == len(per)
    T0 = np.datetime64("2026-01-01T00:00:00", "us")
    for r in got.itertuples():
        b = int((np.datetime64(r.bucket_ts, "us") - T0) // np.timedelta64(3600, "s"))
        vals = sorted(per[(r.source, b)])
        nt = len(vals)
        assert r.n_seqs == nt
        for q, col in ((500, "p50_ntok"), (900, "p90_ntok")):
            thr = (nt * q + 999) // 1000
            assert getattr(r, col) == vals[thr - 1], (r.source, b, col)


def test_yearly_growth_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import yearly_growth

    g = np.random.default_rng(262)
    n = 500
    totals = g.uniform(100, 80000, n)
    odate = (
        np.datetime64("1995-01-01")
        + g.integers(0, 6 * 365, n).astype("timedelta64[D]")
    ).astype("datetime64[us]")
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "o_custkey": pa.array(np.zeros(n, np.int64)),
                "o_orderstatus": pa.array(["O"] * n),
                "o_totalprice": pa.array(totals),
                "o_orderdate": pa.array(
                    odate.astype(np.int64), pa.int64()
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n),
            }
        ),
        tmp_path / "orders.parquet",
    )

    per = collections.defaultdict(lambda: [0, 0])
    for t, d in zip(totals, odate):
        y = int(str(d.astype("datetime64[Y]")))
        per[y][0] += 1
        per[y][1] += int(math.floor(t))
    years = sorted(per)

    got = yearly_growth(str(tmp_path)).to_pandas()
    assert list(got.o_year) == years
    prev = None
    for r in got.itertuples():
        n_o, rev = per[int(r.o_year)]
        assert (r.n_orders, r.revenue_floor) == (n_o, rev)
        assert r.yoy_delta == (0 if prev is None else rev - prev)
        prev = rev
