"""Round-4 wave-110 operators: E157 arrival-interleaving audit (planted
batchy vs alternating arrival tapes — with a run crossing the ts-window
boundary — pin run counts), T164/F tape boundary-jump spectrum (planted
split-document continuations vs independent records pin every band), R91
ship day-of-month profile (planted month-end loading pins the hockey
stick) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_arrival_interleaving_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_arrival_interleaving

    base = np.datetime64("2026-07-01", "us").astype(np.int64)
    rows = []  # (source, ts_us)
    # "bulk" arrives in two blocks of 6; "live" and "wire" alternate
    # between them; the second bulk block straddles the 60s window edge
    t = base
    for _ in range(6):
        rows.append(("bulk", t))
        t += 1_000_000
    for i in range(8):
        rows.append(("live" if i % 2 == 0 else "wire", t))
        t += 1_000_000
    t = base + 55_000_000  # 55s: next 6 bulk events cross the 60s edge
    for _ in range(6):
        rows.append(("bulk", t))
        t += 2_000_000
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows]),
                "ts": pa.array(
                    np.array([r[1] for r in rows], np.int64)
                ).cast(pa.timestamp("us")),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.zeros(n, np.int64)),
                "value": pa.array(np.ones(n)),
            }
        ),
        tmp_path / "events.parquet",
    )

    got = (
        events_arrival_interleaving(str(tmp_path), window_us=60_000_000)
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    seq = sorted(rows, key=lambda r: r[1])
    runs = collections.Counter()
    events = collections.Counter()
    prev = None
    for s, _ in seq:
        events[s] += 1
        if s != prev:
            runs[s] += 1
        prev = s
    assert list(got.index) == sorted(events)
    for s in events:
        row = got.loc[s]
        assert row["n_events"] == events[s]
        assert row["n_runs"] == runs[s]
        assert row["runs_permille"] == 1000 * runs[s] // events[s]
    assert got.loc["bulk", "n_runs"] == 2   # window edge must not split it
    assert got.loc["live", "n_runs"] == 4
    assert got.loc["wire", "n_runs"] == 4


def test_tape_boundary_jump_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import tape_boundary_jump

    rows = [  # (source, seq, tokens)
        # "split": sequences continue each other (first of next = last+1)
        ("split", 0, [10, 11, 12]),
        ("split", 1, [13, 14]),          # jump +1 (band 1)
        ("split", 2, [15]),              # jump +1
        ("split", 3, [15]),              # jump 0 (band 0)
        # "indep": big jumps, including negative and an EMPTY seq that
        # must be transparent (pair forms across it)
        ("indep", 0, [500]),
        ("indep", 1, []),                # skipped
        ("indep", 2, [1500]),            # jump +1000 (band 4)
        ("indep", 3, [2]),               # jump -1498 (band -4)
        # "lone": one sequence -> no pairs
        ("lone", 7, [42, 43]),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(
                    [f"{s}-{q:08d}" for s, q, _ in rows]
                ),
                "tokens": pa.array(
                    [r[2] for r in rows], pa.list_(pa.int32())
                ),
                "n_tok": pa.array(
                    [len(r[2]) for r in rows], pa.int32()
                ),
                "source": pa.array([r[0] for r in rows]),
            }
        ),
        tmp_path / "part-00000.parquet",
    )

    got = (
        tape_boundary_jump(str(tmp_path))
        .to_pandas()
        .set_index(["source", "jump_band"])
        .sort_index()
    )
    per = collections.defaultdict(list)
    for s, q, toks in rows:
        if toks:
            per[s].append((q, toks[0], toks[-1]))
    want = collections.Counter()
    for s, cells in per.items():
        cells.sort()
        for (q0, f0, l0), (q1, f1, l1) in zip(cells, cells[1:]):
            d = f1 - l0
            band = 0 if d == 0 else (1 if d > 0 else -1) * len(str(abs(d)))
            want[(s, band)] += 1
    assert set(got.index) == set(want)
    for key, cnt in want.items():
        assert got.loc[key, "n_pairs"] == cnt
    assert got.loc[("split", 1), "n_pairs"] == 2
    assert got.loc[("split", 0), "n_pairs"] == 1
    assert got.loc[("indep", 4), "n_pairs"] == 1    # across the empty seq
    assert got.loc[("indep", -4), "n_pairs"] == 1
    assert not any(k[0] == "lone" for k in want)


def test_rel_ship_dom_profile_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import ship_dom_profile

    g = np.random.default_rng(849)
    dates, qty, ep, dc = [], [], [], []
    # planted month-end loading: 40 lines on the 30th, 60 on the 31st
    for d, cnt in ((30, 40), (31, 60)):
        for _ in range(cnt):
            dates.append(np.datetime64(f"2026-01-{d:02d}", "us"))
            qty.append(float(g.integers(1, 10)))
            ep.append(float(g.uniform(100, 500)))
            dc.append(0.05)
    # scattered flow across Feb (incl. the 28th but no 29-31)
    for _ in range(50):
        d = int(g.integers(1, 29))
        dates.append(np.datetime64(f"2026-02-{d:02d}", "us"))
        qty.append(float(g.integers(1, 10)))
        ep.append(float(g.uniform(100, 500)))
        dc.append(0.0)
    n = len(dates)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "l_partkey": pa.array(np.ones(n, np.int64)),
                "l_suppkey": pa.array(np.ones(n, np.int64)),
                "l_linenumber": pa.array(np.ones(n, np.int32)),
                "l_quantity": pa.array(np.array(qty)),
                "l_extendedprice": pa.array(np.array(ep)),
                "l_discount": pa.array(np.array(dc)),
                "l_tax": pa.array(np.zeros(n)),
                "l_returnflag": pa.array(["N"] * n),
                "l_linestatus": pa.array(["O"] * n),
                "l_shipdate": pa.array(
                    np.array(dates, dtype="datetime64[us]")
                ),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    want = collections.defaultdict(lambda: [0, 0, 0])
    for d, q, e, disc in zip(dates, qty, ep, dc):
        dom = int(str(d)[8:10])
        c = want[dom]
        c[0] += 1
        c[1] += int(np.floor(q))
        c[2] += int(np.floor(e * (1.0 - disc)))
    got = (
        ship_dom_profile(str(tmp_path))
        .to_pandas()
        .set_index("day_of_month")
        .sort_index()
    )
    assert sorted(got.index) == sorted(want)
    for dom, (nl, q, r) in want.items():
        row = got.loc[dom]
        assert row["n_lines"] == nl
        assert row["qty_floor"] == q
        assert row["revenue_floor"] == r
    assert got.loc[31, "n_lines"] == 60
    assert got.loc[30, "n_lines"] == 40
