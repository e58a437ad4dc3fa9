"""Round-4 wave-118 operators: E165 daily-opener census (planted
scheduler-first mornings with a tie pin the opener counts), T172
length-tail occupancy board (planted tail-owning sources pin the
counts), R99 spend-persistence sufficient stats (planted habitual vs
erratic spenders pin all six sums) — each vs a scalar brute-force
reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_daily_opener_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_daily_opener

    day = 86_400_000_000
    base = np.datetime64("2026-07-01", "us").astype(np.int64)
    rows = []  # (source, ts_us, event_id)
    eid = 0

    def ev(s, t):
        nonlocal eid
        rows.append((s, t, eid))
        eid += 1

    # days 0..4: "cron" fires first at 00:01, others later
    for d in range(5):
        ev("cron", base + d * day + 60_000_000)
        ev("web", base + d * day + 3_600_000_000)
        ev("app", base + d * day + 7_200_000_000)
    # day 5: web opens; cron silent that day
    ev("web", base + 5 * day + 1_000)
    ev("app", base + 5 * day + 2_000)
    # day 6: exact ts tie between app and web -> event_id breaks it
    ev("app", base + 6 * day + 500)
    ev("web", base + 6 * day + 500)   # higher eid loses

    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows]),
                "ts": pa.array(
                    np.array([r[1] for r in rows], np.int64)
                ).cast(pa.timestamp("us")),
                "event_id": pa.array(
                    np.array([r[2] for r in rows], np.int64)
                ),
                "user_id": pa.array(np.zeros(n, np.int64)),
                "value": pa.array(np.ones(n)),
            }
        ),
        tmp_path / "events.parquet",
    )

    got = (
        events_daily_opener(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    by_day = collections.defaultdict(list)
    active = collections.defaultdict(set)
    for s, t, e in rows:
        d = t // day
        by_day[d].append((t, e, s))
        active[s].add(d)
    openers = collections.Counter(min(v)[2] for v in by_day.values())
    assert list(got.index) == sorted(active)
    for s in active:
        row = got.loc[s]
        assert row["days_opened"] == openers.get(s, 0)
        assert row["days_active"] == len(active[s])
    assert got.loc["cron", "days_opened"] == 5
    assert got.loc["web", "days_opened"] == 1
    assert got.loc["app", "days_opened"] == 1   # won the day-6 tie on eid


def test_doc_length_tails_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import length_tail_occupancy

    rows = []  # (source, n_chars)
    # "mid": 30 docs at lengths 100..129 (the body of the corpus)
    for i in range(30):
        rows.append(("mid", 100 + i))
    # "tiny": 5 docs at length 3..7 (owns the low tail)
    for i in range(5):
        rows.append(("tiny", 3 + i))
    # "dump": 5 docs at length 5000+ (owns the high tail)
    for i in range(5):
        rows.append(("dump", 5000 + i))
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(["x" * r[1] for r in rows]),
                "lang": pa.array(["en"] * n),
                "source": pa.array([r[0] for r in rows]),
                "n_chars": pa.array(
                    np.array([r[1] for r in rows], np.int64)
                ),
            }
        ),
        tmp_path / "documents.parquet",
    )

    lens = sorted(r[1] for r in rows)
    t10 = lens[(n * 100 + 999) // 1000 - 1]
    t90 = lens[(n * 900 + 999) // 1000 - 1]
    want = collections.defaultdict(lambda: [0, 0, 0])
    for s, ln in rows:
        c = want[s]
        c[0] += 1
        c[1] += 1 if ln < t10 else 0
        c[2] += 1 if ln > t90 else 0

    got = (
        length_tail_occupancy(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    assert list(got.index) == sorted(want)
    for s, (nd, lo, hi) in want.items():
        row = got.loc[s]
        assert row["n_docs"] == nd
        assert row["n_below_p10"] == lo
        assert row["n_above_p90"] == hi
    assert got.loc["tiny", "n_below_p10"] > 0
    assert got.loc["dump", "n_above_p90"] > 0
    assert got.loc["mid", "n_below_p10"] == 0


def test_rel_spend_persistence_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import spend_persistence

    g = np.random.default_rng(858)
    day = 86_400_000_000
    d0 = np.datetime64("2026-01-05", "us").astype(np.int64)
    segs = ["AUTOMOBILE", "BUILDING"]
    n_cust = 10
    cust_seg = {k: segs[k % 2] for k in range(1, n_cust + 1)}
    orders = []  # (okey, ck, odate, price)
    okey = 0
    # AUTOMOBILE (odd keys... k%2==1 -> BUILDING? map: 1->BUILDING? segs[1%2]=segs[1]=BUILDING)
    for ck in range(1, n_cust + 1):
        base_price = 300.0 if cust_seg[ck] == "AUTOMOBILE" else None
        prev = None
        for i in range(4):
            okey += 1
            od = d0 + (ck * 50 + i * 10) * day
            if base_price is not None:
                price = base_price + float(g.uniform(0, 10))  # habitual
            else:
                price = float(g.uniform(50, 950))             # erratic
            orders.append((okey, ck, od, price))
    no = len(orders)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(
                    np.array([o[0] for o in orders], np.int64)
                ),
                "o_custkey": pa.array(
                    np.array([o[1] for o in orders], np.int64)
                ),
                "o_orderstatus": pa.array(["O"] * no),
                "o_totalprice": pa.array(
                    np.array([o[3] for o in orders])
                ),
                "o_orderdate": pa.array(
                    np.array([o[2] for o in orders], np.int64)
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * no),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(
                    np.arange(1, n_cust + 1, dtype=np.int64)
                ),
                "c_name": pa.array(
                    [f"Customer#{i:09d}" for i in range(1, n_cust + 1)]
                ),
                "c_nationkey": pa.array(np.zeros(n_cust, np.int64)),
                "c_acctbal": pa.array(np.zeros(n_cust)),
                "c_mktsegment": pa.array(
                    [cust_seg[k] for k in range(1, n_cust + 1)]
                ),
            }
        ),
        tmp_path / "customer.parquet",
    )

    per = collections.defaultdict(list)
    for okey, ck, od, price in orders:
        per[ck].append((od // day, okey, int(np.floor(price))))
    want = collections.defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for ck, cells in per.items():
        cells.sort()
        for (_, _, x), (_, _, y) in zip(cells, cells[1:]):
            c = want[cust_seg[ck]]
            c[0] += 1
            c[1] += x
            c[2] += x * x
            c[3] += y
            c[4] += y * y
            c[5] += x * y

    got = (
        spend_persistence(str(tmp_path))
        .to_pandas()
        .set_index("c_mktsegment")
        .sort_index()
    )
    assert list(got.index) == sorted(want)
    for s, (n_, sx, sxx, sy, syy, sxy) in want.items():
        row = got.loc[s]
        assert row["n_pairs"] == n_
        assert row["sum_x"] == sx
        assert row["sum_x_sq"] == sxx
        assert row["sum_y"] == sy
        assert row["sum_y_sq"] == syy
        assert row["sum_xy"] == sxy
