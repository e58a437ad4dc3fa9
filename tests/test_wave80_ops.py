"""Round-4 wave-80 operators: E127 within-hour peak-share quantiles
(planted flat vs single-spike hours pin the permille band), T134/F
tape window-dup loop board (planted repetition loops pin the dup
counts), R61 waiting-suppliers blame board (planted single-late-
supplier orders pin the per-nation attribution) — each vs a scalar
brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_peak_share_quantiles_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_peak_share_quantiles

    g = np.random.default_rng(650)
    base = np.datetime64("2026-03-02", "us").astype(np.int64)
    HOUR = 3_600_000_000
    MIN = 60_000_000
    et, ts = [], []
    # "flat": 4 hours, 60 events spread one per minute -> share 1000//60=16
    for h in range(4):
        for m in range(60):
            et.append("flat")
            ts.append(base + h * HOUR + m * MIN + 7)
    # "spike": 3 hours, all 10 events in one minute -> share 1000
    for h in range(3):
        for _ in range(10):
            et.append("spike")
            ts.append(base + h * HOUR + 5 * MIN + int(g.integers(0, MIN)))
    # bulk
    for _ in range(800):
        et.append("rand")
        ts.append(base + int(g.integers(0, 48 * HOUR)))
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

    per_min = collections.Counter(
        (s, t // MIN) for s, t in zip(et, ts)
    )
    per_hour = collections.defaultdict(lambda: [0, 0])
    for (s, mi), c in per_min.items():
        w = per_hour[(s, mi // 60)]
        w[0] = max(w[0], c)
        w[1] += c
    shares = collections.defaultdict(list)
    for (s, _), (mx, tot) in per_hour.items():
        shares[s].append(1000 * mx // tot)

    got = events_peak_share_quantiles(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(shares)
    for s, pm in shares.items():
        pm = sorted(pm)
        row = got.loc[s]
        assert row["n_hours"] == len(pm)
        for col, q in (("p50_peak_share", 500), ("p90_peak_share", 900)):
            thr = (len(pm) * q + 999) // 1000
            assert row[col] == pm[thr - 1]
        assert row["max_peak_share"] == pm[-1]
    assert got.loc["flat", "max_peak_share"] == 16
    assert got.loc["spike", "p50_peak_share"] == 1000


def test_f1_window_dups_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import tape_window_dups

    g = np.random.default_rng(651)
    rows = []
    # "loopy": sequence of a 4-token motif repeated 5x -> dup windows
    motif = [11, 22, 33, 44]
    for _ in range(10):
        rows.append(("loopy", motif * 5))
    # "clean": strictly increasing ids -> zero dup windows
    for i in range(30):
        rows.append(("clean", list(range(i, i + 12))))
    # short sequences (< 4 tokens) -> zero windows
    rows.append(("clean", [7]))
    rows.append(("clean", []))
    # bulk random
    for _ in range(100):
        rows.append(
            ("rand", [int(x) for x in g.integers(0, 50, g.integers(0, 30))])
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

    want = collections.defaultdict(lambda: [0, 0, 0, 0])
    for s, t in rows:
        wins = [tuple(t[i : i + 4]) for i in range(max(len(t) - 3, 0))]
        nd = len(wins) - len(set(wins))
        w = want[s]
        w[0] += 1
        w[1] += len(wins)
        w[2] += nd
        w[3] += 1 if nd > 0 else 0
    got = tape_window_dups(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(want)
    for s, w in want.items():
        row = got.loc[s]
        assert row["n_seqs"] == w[0]
        assert row["n_windows"] == w[1]
        assert row["n_dup_windows"] == w[2]
        assert row["dup_permille"] == 1000 * w[2] // max(w[1], 1)
        assert row["n_seqs_with_dup"] == w[3]
    # motif*5 has 17 windows, 4 distinct -> 13 dups per sequence
    assert got.loc["loopy", "n_dup_windows"] == 10 * 13
    assert got.loc["clean", "n_dup_windows"] == 0


def test_rel_waiting_suppliers_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import waiting_suppliers

    g = np.random.default_rng(652)
    DAY = 86_400_000_000
    base = np.datetime64("2025-01-01", "us").astype(np.int64)

    # nations
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
    # suppliers: 0-3 in ALPHA, 4-7 in BETA, 8-9 in GAMMA
    nk = [0, 0, 0, 0, 1, 1, 1, 1, 2, 2]
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(10, dtype=np.int64)),
                "s_name": pa.array([f"S{i}" for i in range(10)]),
                "s_nationkey": pa.array(nk, pa.int64()),
                "s_acctbal": pa.array(np.zeros(10)),
            }
        ),
        tmp_path / "supplier.parquet",
    )

    # orders + lineitem: per order pick 1-4 suppliers, each with 1-2
    # lines, ship delay breaching (>90d) for a random subset
    n_ord = 400
    odate = base + g.integers(0, 300, n_ord) * DAY
    ok_col, pk, sk, qty, ep, disc, tax, flag, stat, ship = (
        [], [], [], [], [], [], [], [], [], []
    )
    for o in range(n_ord):
        sups = g.choice(10, size=int(g.integers(1, 5)), replace=False)
        for s in sups:
            for _ in range(int(g.integers(1, 3))):
                ok_col.append(o)
                pk.append(1)
                sk.append(int(s))
                qty.append(1.0)
                ep.append(100.0)
                disc.append(0.0)
                tax.append(0.0)
                flag.append("N")
                stat.append("O")
                delay = int(g.integers(0, 140))
                ship.append(odate[o] + delay * DAY)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
                "o_custkey": pa.array(np.ones(n_ord, np.int64)),
                "o_orderstatus": pa.array(["O"] * n_ord),
                "o_totalprice": pa.array(np.ones(n_ord)),
                "o_orderdate": pa.array(odate).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n_ord),
            }
        ),
        tmp_path / "orders.parquet",
    )
    nl = len(ok_col)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(ok_col, pa.int64()),
                "l_partkey": pa.array(pk, pa.int64()),
                "l_suppkey": pa.array(sk, pa.int64()),
                "l_linenumber": pa.array(np.arange(nl, dtype=np.int64)),
                "l_quantity": pa.array(qty),
                "l_extendedprice": pa.array(ep),
                "l_discount": pa.array(disc),
                "l_tax": pa.array(tax),
                "l_returnflag": pa.array(flag),
                "l_linestatus": pa.array(stat),
                "l_shipdate": pa.array(
                    np.array(ship, np.int64)
                ).cast(pa.timestamp("us")),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    # brute force: per order, suppliers and which breached (>90 days)
    per_order = collections.defaultdict(dict)
    for o, s, sd in zip(ok_col, sk, ship):
        d = (sd - odate[o]) // DAY
        per_order[o][s] = per_order[o].get(s, False) or (d > 90)
    blames = collections.Counter()
    for o, sups in per_order.items():
        late = [s for s, b in sups.items() if b]
        if len(sups) >= 2 and len(late) == 1:
            blames[late[0]] += 1
    agg = {nm: [0, 0, 0, 0] for nm in ("ALPHA", "BETA", "GAMMA")}
    for s, c in blames.items():
        w = agg[["ALPHA", "BETA", "GAMMA"][nk[s]]]
        w[0] += c
        w[1] += 1
    for nm, w in agg.items():
        cand = sorted(
            (s for s in blames if ["ALPHA", "BETA", "GAMMA"][nk[s]] == nm),
            key=lambda s: (-blames[s], s),
        )
        if cand:
            w[2] = cand[0]
            w[3] = blames[cand[0]]

    got = waiting_suppliers(str(tmp_path)).to_pandas()
    got = got.set_index("nation").sort_index()
    assert list(got.index) == ["ALPHA", "BETA", "GAMMA"]
    for nm, w in agg.items():
        row = got.loc[nm]
        assert row["n_blame_orders"] == w[0]
        assert row["n_suppliers"] == w[1]
        assert row["top_suppkey"] == w[2]
        assert row["top_blames"] == w[3]
        assert row["top_permille"] == 1000 * w[3] // max(w[0], 1)
