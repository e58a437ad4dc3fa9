"""Round-4 wave-86 operators: E133 peak-day concentration (planted
one-day-burst vs uniform sources pin the share), T140/F tape thirds
vocabulary profile (planted position-banded ids pin the distinct
counts), R67 nation balance quantiles (planted balance ladders pin
the bands) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY = 86_400_000_000


def test_events_peak_day_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_peak_day

    g = np.random.default_rng(710)
    base = np.datetime64("2026-03-02", "us").astype(np.int64)  # Monday
    et, ts = [], []
    # "burst": 90 of 100 events on day 2 (Wednesday)
    for _ in range(90):
        et.append("burst")
        ts.append(base + 2 * DAY + int(g.integers(0, DAY)))
    for d in (0, 1, 3, 4, 5):
        for _ in range(2):
            et.append("burst")
            ts.append(base + d * DAY + int(g.integers(0, DAY)))
    # "uniform": 10 days x 5 events; tie -> earliest day wins
    for d in range(10):
        for _ in range(5):
            et.append("uniform")
            ts.append(base + d * DAY + int(g.integers(0, DAY)))
    # bulk
    for _ in range(600):
        et.append("rand")
        ts.append(base + int(g.integers(0, 14)) * DAY + int(g.integers(0, DAY)))
    n = len(et)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(et),
                "ts": pa.array(np.array(ts, np.int64)).cast(
                    pa.timestamp("us")
                ),
                "value": pa.array(np.ones(n)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.ones(n, np.int64)),
            }
        ),
        tmp_path / "events.parquet",
    )

    cnt = collections.Counter((s, t // DAY) for s, t in zip(et, ts))
    per_src = collections.defaultdict(dict)
    for (s, d), c in cnt.items():
        per_src[s][d] = c

    got = events_peak_day(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(per_src)
    for s, days in per_src.items():
        tot = sum(days.values())
        best = min(
            days, key=lambda d: (-days[d], d)
        )  # max count, earliest day
        row = got.loc[s]
        assert row["n_days"] == len(days)
        assert row["n_events"] == tot
        assert row["top_share"] == 1000 * days[best] // tot
        assert row["top_dow"] == (best + 3) % 7 + 1
    assert got.loc["burst", "top_dow"] == 3
    assert got.loc["burst", "top_share"] == 900
    assert got.loc["uniform", "top_share"] == 100


def test_f1_thirds_vocab_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import tape_thirds_vocab

    g = np.random.default_rng(711)
    rows = []
    # "banded": opener ids 0-9, middle 100-199, closer 1000-1999
    for _ in range(30):
        ln = int(g.integers(9, 30))
        t = []
        for i in range(ln):
            third = i * 3 // ln
            lo, hi = [(0, 10), (100, 200), (1000, 2000)][third]
            t.append(int(g.integers(lo, hi)))
        rows.append(("banded", t))
    # short sequences (len 1, 2) exercise the third boundaries
    rows.append(("banded", [5]))
    rows.append(("banded", [5, 1500]))
    for _ in range(80):
        rows.append(
            ("rand", [int(x) for x in g.integers(0, 500, g.integers(1, 40))])
        )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(
                    [f"s00-{i:08d}" for i in range(len(rows))]
                ),
                "tokens": pa.array(
                    [r[1] for r in rows], pa.list_(pa.int32())
                ),
                "n_tok": pa.array(
                    [len(r[1]) for r in rows], pa.int64()
                ),
                "source": pa.array([r[0] for r in rows]),
            }
        ),
        tmp_path / "part-000.parquet",
    )

    cells = collections.Counter()
    for s, t in rows:
        for i, tok in enumerate(t):
            cells[(s, i * 3 // len(t), tok)] += 1
    want = collections.defaultdict(lambda: [0, 0])
    for (s, th, _), c in cells.items():
        w = want[(s, th)]
        w[0] += c
        w[1] += 1

    got = tape_thirds_vocab(str(tmp_path)).to_pandas()
    got = got.set_index(["source", "third"]).sort_index()
    assert list(got.index) == sorted(want)
    for k, w in want.items():
        row = got.loc[k]
        assert row["n_tokens"] == w[0]
        assert row["n_distinct"] == w[1]
        assert row["distinct_permille"] == 1000 * w[1] // w[0]
    # banded thirds draw from disjoint pools of size 10/100/1000
    assert got.loc[("banded", 0), "n_distinct"] <= 10


def test_rel_nation_balance_quantiles_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import nation_balance_quantiles

    g = np.random.default_rng(712)
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0, 1, 2], pa.int64()),
                "n_name": pa.array(["ALPHA", "BETA", "GAMMA"]),
                "n_regionkey": pa.array([0, 0, 1], pa.int64()),
            }
        ),
        tmp_path / "nation.parquet",
    )
    n_cust = 600
    nk = g.integers(0, 3, n_cust)
    bal = np.round(g.uniform(-999, 9999, n_cust), 2)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
                "c_name": pa.array([f"c{i}" for i in range(n_cust)]),
                "c_nationkey": pa.array(nk, pa.int64()),
                "c_acctbal": pa.array(bal),
                "c_mktsegment": pa.array(["S"] * n_cust),
            }
        ),
        tmp_path / "customer.parquet",
    )

    per = collections.defaultdict(list)
    for k, b in zip(nk, bal):
        per[["ALPHA", "BETA", "GAMMA"][k]].append(int(np.floor(b)))

    got = nation_balance_quantiles(str(tmp_path)).to_pandas()
    got = got.set_index("nation").sort_index()
    assert list(got.index) == ["ALPHA", "BETA", "GAMMA"]
    for nm, xs in per.items():
        xs = sorted(xs)
        row = got.loc[nm]
        assert row["n_customers"] == len(xs)
        for col, q in (("p50_balance", 500), ("p90_balance", 900)):
            thr = (len(xs) * q + 999) // 1000
            assert row[col] == xs[thr - 1]
        assert row["n_negative"] == sum(1 for x in xs if x < 0)
