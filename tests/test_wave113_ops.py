"""Round-4 wave-113 operators: E160 session clock-duration board
(planted morning-short/evening-long sessions pin every hour cell), T167
brevity-law matrix (planted short-frequent and long-rare words pin every
cell), R94 weekday-loyalty histogram (planted loyal/uniform customers
pin the bands) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_session_clock_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_session_clock

    base = np.datetime64("2026-07-01", "us").astype(np.int64)
    hour = 3_600_000_000
    rows = []  # (user, ts_us)
    # user 1: a 09:00 session lasting 600 s (3 events)
    rows += [(1, base + 9 * hour), (1, base + 9 * hour + 300_000_000),
             (1, base + 9 * hour + 600_000_000)]
    # user 1: a second session same day at 21:00 lasting 7200 s
    rows += [(1, base + 21 * hour), (1, base + 21 * hour + 7200_000_000)]
    # user 2: single-event session at 09:30 -> duration 0
    rows.append((2, base + 9 * hour + 1800_000_000))
    # user 3: session starting 23:50 crossing midnight (starts hour 23)
    rows += [(3, base + 23 * hour + 50 * 60_000_000),
             (3, base + 24 * hour + 10 * 60_000_000)]
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(["t"] * n),
                "ts": pa.array(
                    np.array([r[1] for r in rows], np.int64)
                ).cast(pa.timestamp("us")),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(
                    np.array([r[0] for r in rows], np.int64)
                ),
                "value": pa.array(np.ones(n)),
            }
        ),
        tmp_path / "events.parquet",
    )

    got = (
        events_session_clock(str(tmp_path))
        .to_pandas()
        .set_index("start_hour")
        .sort_index()
    )
    # brute force with the 6h session gap
    per = collections.defaultdict(list)
    for u, t in rows:
        per[u].append(t)
    want = collections.defaultdict(lambda: [0, 0, 0])
    for u, ts in per.items():
        ts.sort()
        start = ts[0]
        prev = ts[0]
        for t in ts[1:] + [None]:
            if t is None or t - prev > 6 * hour:
                h = (start // hour) % 24
                d = (prev - start) // 1_000_000
                c = want[h]
                c[0] += 1
                c[1] += d
                c[2] += d * d
                if t is not None:
                    start = t
            prev = t if t is not None else prev
    assert sorted(got.index) == sorted(want)
    for h, (ns_, sd, sdd) in want.items():
        row = got.loc[h]
        assert row["n_sessions"] == ns_
        assert row["sum_dur_s"] == sd
        assert row["sum_dur_sq"] == sdd
    assert got.loc[9, "n_sessions"] == 2     # the 600s one + singleton
    assert got.loc[9, "sum_dur_s"] == 600
    assert got.loc[21, "sum_dur_s"] == 7200
    assert got.loc[23, "sum_dur_s"] == 20 * 60


def test_doc_brevity_law_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import brevity_law_matrix

    # "a" (len 1) appears 9x -> freq_band = bit length of 9 = 4
    # "the" (len 3) appears 3x -> band 2
    # "extraordinarily" (len 15) once -> band 1
    # a 50-char token clips to len 40, appears once
    long_tok = "x" * 50
    texts = [
        "a a a the extraordinarily",
        "a a the " + long_tok,
        "a a a the",
        "a",
    ]
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * n),
                "source": pa.array(["s"] * n),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    cf = collections.Counter()
    for t in texts:
        cf.update(t.split(" "))
    want = collections.defaultdict(lambda: [0, 0])
    for w, f in cf.items():
        cell = (min(len(w), 40), len(bin(f)) - 2)
        want[cell][0] += 1
        want[cell][1] += f

    got = (
        brevity_law_matrix(str(tmp_path))
        .to_pandas()
        .set_index(["word_len", "freq_band"])
        .sort_index()
    )
    assert set(got.index) == set(want)
    for cell, (nw, occ) in want.items():
        row = got.loc[cell]
        assert row["n_words"] == nw
        assert row["n_occurrences"] == occ
    assert got.loc[(1, 4), "n_occurrences"] == 9    # "a"
    assert got.loc[(3, 2), "n_occurrences"] == 3    # "the"
    assert got.loc[(15, 1), "n_words"] == 1
    assert got.loc[(40, 1), "n_words"] == 1         # the clipped token


def test_rel_weekday_loyalty_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import weekday_loyalty

    day = 86_400_000_000
    mon = np.datetime64("2026-07-06", "us").astype(np.int64)  # a Monday
    rows = []  # (custkey, odate)
    # cust 1: 10 orders all on Mondays -> band 10
    for w in range(10):
        rows.append((1, mon + w * 7 * day))
    # cust 2: 7 orders, one per weekday -> modal share 1/7 -> band 1
    for d in range(7):
        rows.append((2, mon + d * day))
    # cust 3: 4 Mondays + 1 Tuesday -> 800 permille -> band 8
    for w in range(4):
        rows.append((3, mon + w * 7 * day))
    rows.append((3, mon + day))
    # cust 4: single order -> band 10
    rows.append((4, mon + 2 * day))
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "o_custkey": pa.array(
                    np.array([r[0] for r in rows], np.int64)
                ),
                "o_orderstatus": pa.array(["O"] * n),
                "o_totalprice": pa.array(np.full(n, 100.0)),
                "o_orderdate": pa.array(
                    np.array([r[1] for r in rows], np.int64)
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n),
            }
        ),
        tmp_path / "orders.parquet",
    )

    per = collections.defaultdict(collections.Counter)
    for ck, od in rows:
        per[ck][(od // day + 3) % 7] += 1
    want = collections.defaultdict(lambda: [0, 0])
    for ck, dows in per.items():
        tot = sum(dows.values())
        band = 1000 * max(dows.values()) // tot // 100
        want[band][0] += 1
        want[band][1] += tot

    got = (
        weekday_loyalty(str(tmp_path))
        .to_pandas()
        .set_index("loyalty_band")
        .sort_index()
    )
    assert sorted(got.index) == sorted(want)
    for band, (nc, no) in want.items():
        row = got.loc[band]
        assert row["n_customers"] == nc
        assert row["n_orders"] == no
    assert got.loc[10, "n_customers"] == 2   # cust 1 and the singleton
    assert got.loc[8, "n_customers"] == 1
    assert got.loc[1, "n_customers"] == 1
