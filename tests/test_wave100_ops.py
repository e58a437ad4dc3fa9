"""Round-4 wave-100 operators: E147 producer clock-skew audit (planted
backsteps — including one across an id-window boundary — pin inversion
counts and the worst backstep per source), T154 sentence-terminator lint
board (planted zero-terminator and multi-terminator docs pin the counts),
R81 same-day order-burst histogram (planted multi-order customer-days pin
every band) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_clock_inversions_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_clock_inversions

    base = np.datetime64("2026-07-01", "us").astype(np.int64)
    rows = []  # (source, event_id, ts_us)

    # "mono": strictly increasing clock -> zero inversions
    for i in range(40):
        rows.append(("mono", i, base + i * 1_000_000))

    # "skew": mostly increasing, three planted backsteps:
    #   id 10: -5_000 us      (small, mid-window)
    #   id 16: -7_777 us      (ACROSS the window_ids=8 boundary -> the
    #                          pair only exists via the carry row)
    #   id 30: -123_456 us    (the max backstep)
    t = base
    for i in range(50):
        t += 10_000
        if i == 10:
            t -= 5_000 + 10_000
        elif i == 16:
            t -= 7_777 + 10_000
        elif i == 30:
            t -= 123_456 + 10_000
        rows.append(("skew", i, t))

    # "dupid": duplicate event ids; ties break by ts on both sides.
    #   id 1 appears 3x with ascending ts; id 2's ts retreats below
    #   id 1's last -> exactly one inversion.
    rows.append(("dupid", 0, base + 100))
    rows.append(("dupid", 1, base + 200))
    rows.append(("dupid", 1, base + 300))
    rows.append(("dupid", 1, base + 400))
    rows.append(("dupid", 2, base + 350))

    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows]),
                "ts": pa.array(
                    np.array([r[2] for r in rows], np.int64)
                ).cast(pa.timestamp("us")),
                "event_id": pa.array(
                    np.array([r[1] for r in rows], np.int64)
                ),
                "user_id": pa.array(np.zeros(n, np.int64)),
                "value": pa.array(np.ones(n)),
            }
        ),
        tmp_path / "events.parquet",
    )

    got = (
        events_clock_inversions(str(tmp_path), window_ids=8)
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    per = collections.defaultdict(list)
    for s, i, ts in rows:
        per[s].append((i, ts))
    assert list(got.index) == sorted(per)
    for s, evs in per.items():
        evs.sort()
        ne = len(evs)
        npr = ne - 1
        backs = [
            evs[j - 1][1] - evs[j][1]
            for j in range(1, ne)
            if evs[j][1] < evs[j - 1][1]
        ]
        row = got.loc[s]
        assert row["n_events"] == ne
        assert row["n_pairs"] == npr
        assert row["n_inversions"] == len(backs)
        assert row["max_backstep_us"] == (max(backs) if backs else 0)
        assert row["inversion_permille"] == 1000 * len(backs) // max(npr, 1)
    assert got.loc["mono", "n_inversions"] == 0
    assert got.loc["skew", "n_inversions"] == 3
    assert got.loc["skew", "max_backstep_us"] == 123_456
    assert got.loc["dupid", "n_inversions"] == 1
    assert got.loc["dupid", "max_backstep_us"] == 50


def test_doc_sentence_stats_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import sentence_stats

    rows = [  # (source, text)
        ("prose", "One. Two! Three? Done."),        # 4 terminators
        ("prose", "No stops at all"),               # 0 -> zero doc
        ("prose", "Ellipsis... and more..."),       # 6
        ("dump", "col1 col2 col3"),                 # 0
        ("dump", "a,b,c,d"),                        # 0
        ("dump", "one line. only"),                 # 1
        ("empty", ""),                              # 0
        ("empty", "?!."),                           # 3
    ]
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array([r[1] for r in rows]),
                "lang": pa.array(["en"] * n),
                "source": pa.array([r[0] for r in rows]),
                "n_chars": pa.array(
                    [len(r[1]) for r in rows], pa.int64()
                ),
            }
        ),
        tmp_path / "documents.parquet",
    )

    got = (
        sentence_stats(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    per = collections.defaultdict(list)
    for s, txt in rows:
        per[s].append(sum(txt.count(c) for c in ".!?"))
    assert list(got.index) == sorted(per)
    for s, terms in per.items():
        nd, nt = len(terms), sum(terms)
        nz = sum(1 for t in terms if t == 0)
        row = got.loc[s]
        assert row["n_docs"] == nd
        assert row["n_terminals"] == nt
        assert row["n_zero_docs"] == nz
        assert row["zero_permille"] == 1000 * nz // nd
        assert row["terminals_per_kdoc"] == 1000 * nt // nd
    assert got.loc["prose", "n_terminals"] == 10
    assert got.loc["dump", "n_zero_docs"] == 2
    assert got.loc["empty", "n_zero_docs"] == 1


def test_rel_order_bursts_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import order_bursts

    g = np.random.default_rng(834)
    d0 = np.datetime64("2026-03-01", "us").astype(np.int64)
    day = 86_400_000_000
    rows = []  # (custkey, day_index, totalprice)

    # cust 1: a 3-burst on day 0 plus a singleton on day 2
    rows += [(1, 0, 100.75), (1, 0, 200.25), (1, 0, 300.99), (1, 2, 50.0)]
    # cust 2: two separate 2-bursts (days 0 and 3)
    rows += [(2, 0, 10.5), (2, 0, 20.5), (2, 3, 30.5), (2, 3, 40.5)]
    # cust 3: one 5-burst
    rows += [(3, 5, float(v)) for v in (1, 2, 3, 4, 5)]
    # singleton tail: custs 100..149, one order each on scattered days
    for i in range(50):
        rows.append(
            (100 + i, int(g.integers(0, 30)), float(g.uniform(10, 900)))
        )

    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "o_custkey": pa.array(
                    np.array([r[0] for r in rows], np.int64)
                ),
                "o_orderstatus": pa.array(["O"] * n),
                "o_totalprice": pa.array(
                    np.array([r[2] for r in rows])
                ),
                "o_orderdate": pa.array(
                    np.array(
                        [d0 + r[1] * day for r in rows], np.int64
                    )
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n),
            }
        ),
        tmp_path / "orders.parquet",
    )

    cells = collections.defaultdict(lambda: [0, 0])
    for ck, dt, v in rows:
        c = cells[(ck, dt)]
        c[0] += 1
        c[1] += int(np.floor(v))
    want = collections.defaultdict(lambda: [0, set(), 0, 0])
    for (ck, _), (sz, v) in cells.items():
        w = want[sz]
        w[0] += 1
        w[1].add(ck)
        w[2] += sz
        w[3] += v

    got = (
        order_bursts(str(tmp_path))
        .to_pandas()
        .set_index("burst_size")
        .sort_index()
    )
    assert list(got.index) == sorted(want)
    for sz, (nb, custs, no, vf) in want.items():
        row = got.loc[sz]
        assert row["n_bursts"] == nb
        assert row["n_customers"] == len(custs)
        assert row["n_orders"] == no
        assert row["value_floor"] == vf
    assert got.loc[3, "n_bursts"] == 1
    assert got.loc[2, "n_bursts"] == 2
    assert got.loc[2, "n_customers"] == 1
    assert got.loc[5, "n_orders"] == 5
