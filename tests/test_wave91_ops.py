"""Round-4 wave-91 operators: E138 audience-trend sufficient stats
(planted linear DAU growth pins the exact sums), T145/F tape motif
document-frequency spectrum (planted repeated motifs pin the bands),
R72 nation x priority mix (planted skewed priorities pin the
permilles) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY = 86_400_000_000


def test_events_audience_trend_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_audience_trend

    g = np.random.default_rng(760)
    base = np.datetime64("2026-03-02", "us").astype(np.int64)
    et, ts, uid = [], [], []
    # "growing": day d has users 0..(2d+1) -> dau = 2d+2, perfectly linear
    for d in range(8):
        for u in range(2 * d + 2):
            et.append("growing")
            ts.append(base + d * DAY + int(g.integers(0, DAY)))
            uid.append(u)
    # bulk
    for _ in range(500):
        et.append("rand")
        ts.append(base + int(g.integers(0, 30)) * DAY + int(g.integers(0, DAY)))
        uid.append(int(g.integers(0, 50)))
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
                "user_id": pa.array(uid, pa.int64()),
            }
        ),
        tmp_path / "events.parquet",
    )

    cells = {(s, u, t // DAY) for s, t, u in zip(et, ts, uid)}
    dau = collections.Counter()
    for s, _, d in cells:
        dau[(s, d)] += 1
    per = collections.defaultdict(dict)
    for (s, d), c in dau.items():
        per[s][d] = c

    got = events_audience_trend(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(per)
    for s, days in per.items():
        d0 = min(days)
        xs = {d - d0: c for d, c in days.items()}
        row = got.loc[s]
        assert row["n_days"] == len(xs)
        assert row["sum_x"] == sum(xs)
        assert row["sum_y"] == sum(xs.values())
        assert row["sum_xy"] == sum(x * y for x, y in xs.items())
        assert row["sum_x2"] == sum(x * x for x in xs)
    # growing: x=d, y=2d+2 -> sum_xy = sum(d*(2d+2))
    assert got.loc["growing", "sum_xy"] == sum(
        d * (2 * d + 2) for d in range(8)
    )


def test_f1_motif_df_spectrum_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import tape_motif_spectrum

    g = np.random.default_rng(761)
    motif = [11, 12, 13, 14]
    rows = []
    # the motif appears in 30 sequences (once each) -> df band "11-100"
    for _ in range(30):
        rows.append(
            ("a", motif + [int(x) for x in g.integers(5000, 9999, 6)])
        )
    # unique windows -> df band "1"
    for i in range(40):
        rows.append(("b", list(range(100 * i, 100 * i + 10))))
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

    occ = collections.Counter()
    for _, t in rows:
        for i in range(max(len(t) - 3, 0)):
            occ[tuple(t[i : i + 4])] += 1

    def band(c):
        if c == 1:
            return 0
        if c <= 3:
            return 1
        if c <= 10:
            return 2
        if c <= 100:
            return 3
        return 4

    want = collections.defaultdict(lambda: [0, 0])
    for _, c in occ.items():
        w = want[band(c)]
        w[0] += 1
        w[1] += c

    got = tape_motif_spectrum(str(tmp_path)).to_pandas()
    got = got.set_index("df_band").sort_index()
    assert list(got.index) == sorted(want)
    for b, w in want.items():
        row = got.loc[b]
        assert row["n_motifs"] == w[0]
        assert row["n_occurrences"] == w[1]
    assert got.loc[3, "n_occurrences"] >= 30  # the planted motif


def test_rel_nation_priority_mix_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import nation_priority_mix

    g = np.random.default_rng(762)
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0, 1], pa.int64()),
                "n_name": pa.array(["ALPHA", "BETA"]),
                "n_regionkey": pa.array([0, 0], pa.int64()),
            }
        ),
        tmp_path / "nation.parquet",
    )
    n_cust = 60
    nk = g.integers(0, 2, n_cust)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
                "c_name": pa.array([f"c{i}" for i in range(n_cust)]),
                "c_nationkey": pa.array(nk, pa.int64()),
                "c_acctbal": pa.array(np.zeros(n_cust)),
                "c_mktsegment": pa.array(["S"] * n_cust),
            }
        ),
        tmp_path / "customer.parquet",
    )
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM"]
    n_ord = 500
    ck = g.integers(0, n_cust, n_ord)
    # ALPHA customers skew urgent
    opri = [
        prios[0] if nk[c] == 0 and g.random() < 0.7
        else prios[int(g.integers(0, 3))]
        for c in ck
    ]
    base = np.datetime64("2025-01-01", "us").astype(np.int64)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
                "o_custkey": pa.array(ck, pa.int64()),
                "o_orderstatus": pa.array(["O"] * n_ord),
                "o_totalprice": pa.array(np.ones(n_ord)),
                "o_orderdate": pa.array(
                    base + g.integers(0, 300, n_ord) * DAY
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(opri),
            }
        ),
        tmp_path / "orders.parquet",
    )

    cnt = collections.Counter()
    tot = collections.Counter()
    for c, p in zip(ck, opri):
        nm = ["ALPHA", "BETA"][nk[c]]
        cnt[(nm, p)] += 1
        tot[nm] += 1

    got = nation_priority_mix(str(tmp_path)).to_pandas()
    got = got.set_index(["nation", "priority"]).sort_index()
    assert list(got.index) == sorted(cnt)
    for (nm, p), c in cnt.items():
        row = got.loc[(nm, p)]
        assert row["n_orders"] == c
        assert row["permille"] == 1000 * c // tot[nm]
