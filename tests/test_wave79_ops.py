"""Round-4 wave-79 operators: E126 daily-median stability (planted
stationary vs regime-shifted value streams pin the median-of-medians),
T133/F tape length-integrity audit (planted corrupted n_tok rows pin
the mismatch count), R60 discount ladder (planted per-band lines pin
revenue/forgone sums) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_daily_median_stability_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_daily_median_stability

    g = np.random.default_rng(640)
    base = np.datetime64("2026-03-02", "us").astype(np.int64)
    DAY = 86_400_000_000
    et, ts, val = [], [], []
    # "stable": every day's median is exactly 50
    for d in range(5):
        for v in (40.2, 50.7, 60.1):
            et.append("stable")
            ts.append(base + d * DAY + v.__hash__() % 1000)
            val.append(v)
    # "shift": daily medians 10, 20, 30
    for d, m in enumerate((10.5, 20.5, 30.5)):
        for _ in range(3):
            et.append("shift")
            ts.append(base + d * DAY + int(g.integers(0, DAY)))
            val.append(m)
    # bulk
    for _ in range(500):
        et.append("rand")
        ts.append(base + int(g.integers(0, 7)) * DAY + int(g.integers(0, DAY)))
        val.append(float(g.uniform(0, 400)))
    n = len(et)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(et),
                "ts": pa.array(np.array(ts, np.int64)).cast(
                    pa.timestamp("us")
                ),
                "value": pa.array(np.array(val)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.ones(n, np.int64)),
            }
        ),
        tmp_path / "events.parquet",
    )

    per_day = collections.defaultdict(list)
    for s, t, v in zip(et, ts, val):
        per_day[(s, t // DAY)].append(int(np.floor(v)))
    meds = collections.defaultdict(list)
    for (s, _), vs in per_day.items():
        vs = sorted(vs)
        thr = (len(vs) * 500 + 999) // 1000
        meds[s].append(vs[thr - 1])
    got = events_daily_median_stability(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(meds)
    for s, mv in meds.items():
        mv = sorted(mv)
        row = got.loc[s]
        assert row["n_days"] == len(mv)
        thr = (len(mv) * 500 + 999) // 1000
        assert row["p50_daily_median"] == mv[thr - 1]
        assert row["min_daily_median"] == mv[0]
        assert row["max_daily_median"] == mv[-1]
    assert got.loc["stable", "min_daily_median"] == 50
    assert got.loc["stable", "max_daily_median"] == 50
    assert got.loc["shift", "min_daily_median"] == 10
    assert got.loc["shift", "max_daily_median"] == 30


def test_f1_tape_integrity_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import tape_integrity

    g = np.random.default_rng(641)
    rows, ntok_col = [], []
    # clean source
    for _ in range(50):
        t = [int(x) for x in g.integers(0, 99, int(g.integers(1, 9)))]
        rows.append(("clean", t))
        ntok_col.append(len(t))
    # corrupted source: 5 rows overstate n_tok by 3
    for i in range(40):
        t = [int(x) for x in g.integers(0, 99, 4)]
        rows.append(("corrupt", t))
        ntok_col.append(len(t) + (3 if i < 5 else 0))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(
                    [f"s00-{i:08d}" for i in range(len(rows))]
                ),
                "tokens": pa.array(
                    [r[1] for r in rows], pa.list_(pa.int32())
                ),
                "n_tok": pa.array(ntok_col, pa.int64()),
                "source": pa.array([r[0] for r in rows]),
            }
        ),
        tmp_path / "part-000.parquet",
    )

    want = collections.defaultdict(lambda: [0, 0, 0, 0, 0])
    for (s, t), nt in zip(rows, ntok_col):
        w = want[s]
        w[0] += 1
        w[1] += nt
        w[2] += len(t)
        if nt != len(t):
            w[3] += 1
            w[4] = max(w[4], abs(nt - len(t)))
    got = tape_integrity(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(want)
    for s, w in want.items():
        row = got.loc[s]
        assert row["n_seqs"] == w[0]
        assert row["sum_n_tok"] == w[1]
        assert row["sum_len"] == w[2]
        assert row["n_mismatch"] == w[3]
        assert row["max_abs_delta"] == w[4]
    assert got.loc["corrupt", "n_mismatch"] == 5
    assert got.loc["clean", "n_mismatch"] == 0


def test_rel_discount_ladder_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import discount_ladder

    g = np.random.default_rng(642)
    n = 900
    disc = np.round(g.integers(0, 11, n) / 100.0, 2)
    ep = np.round(g.uniform(100, 9000, n), 2)
    qty = g.integers(1, 50, n).astype(np.float64)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "l_partkey": pa.array(np.ones(n, np.int64)),
                "l_suppkey": pa.array(np.ones(n, np.int64)),
                "l_quantity": pa.array(qty),
                "l_extendedprice": pa.array(ep),
                "l_discount": pa.array(disc),
                "l_tax": pa.array(np.zeros(n)),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    want = collections.defaultdict(lambda: [0, 0, 0, 0])
    for d, e, q in zip(disc, ep, qty):
        b = int(np.floor(d * 100))
        w = want[b]
        w[0] += 1
        w[1] += int(np.floor(q))
        w[2] += int(np.floor(e * (1 - d)))
        w[3] += int(np.floor(e * d))
    got = discount_ladder(str(tmp_path)).to_pandas()
    got = got.set_index("disc_cents").sort_index()
    assert list(got.index) == sorted(want)
    for b, w in want.items():
        row = got.loc[b]
        assert row["n_lines"] == w[0]
        assert row["sum_qty"] == w[1]
        assert row["revenue"] == w[2]
        assert row["forgone"] == w[3]
    assert got.loc[0, "forgone"] == 0
