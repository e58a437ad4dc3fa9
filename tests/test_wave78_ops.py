"""Round-4 wave-78 operators: E125 peak-hour stability (planted fixed
vs wandering daily peaks pin distinct-peak counts and the argmax tie
rule), T132/F tape opener board (planted BOS-dominant and diverse
openers pin the modal id and tie rule), R59 cohort repurchase retention
(planted within/over-365-day second orders pin the cutoff; one-shot
customers count unretained) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_peak_hour_stability_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_peak_hour_stability

    g = np.random.default_rng(630)
    base = np.datetime64("2026-03-02", "us").astype(np.int64)  # midnight
    HOUR = 3_600_000_000
    DAY = 24 * HOUR
    et, ts = [], []
    # "fixed": peak always hour 9 (5 events) over 6 days, noise 1/hour
    for d in range(6):
        for j in range(5):
            et.append("fixed")
            ts.append(base + d * DAY + 9 * HOUR + j)
        for h in (2, 15):
            et.append("fixed")
            ts.append(base + d * DAY + h * HOUR + 7)
    # "tie": two hours tied -> smaller hour wins
    for h in (4, 20):
        et.append("tie")
        ts.append(base + h * HOUR)
    # bulk random
    for _ in range(600):
        et.append("rand")
        ts.append(
            base
            + int(g.integers(0, 8)) * DAY
            + int(g.integers(0, 24)) * HOUR
            + int(g.integers(0, HOUR))
        )
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

    cnt = collections.defaultdict(collections.Counter)
    for s, t in zip(et, ts):
        cnt[(s, t // DAY)][(t // HOUR) % 24] += 1
    peaks = collections.defaultdict(list)
    for (s, _), c in cnt.items():
        peaks[s].append(min(c.items(), key=lambda kv: (-kv[1], kv[0]))[0])
    got = events_peak_hour_stability(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(peaks)
    for s, pv in peaks.items():
        pv = sorted(pv)
        row = got.loc[s]
        assert row["n_days"] == len(pv)
        assert row["n_distinct_peaks"] == len(set(pv))
        thr = (len(pv) * 500 + 999) // 1000
        assert row["p50_peak_hour"] == pv[thr - 1]
    assert got.loc["fixed", "n_distinct_peaks"] == 1
    assert got.loc["fixed", "p50_peak_hour"] == 9
    assert got.loc["tie", "p50_peak_hour"] == 4


def test_f1_tape_opener_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import tape_opener

    g = np.random.default_rng(631)
    rows = []
    # "bos": every sequence opens with id 1
    for _ in range(50):
        rows.append(("bos", [1] + [int(x) for x in g.integers(2, 99, 5)]))
    # "tie": openers 7 and 8 appear equally -> 7 wins
    rows.append(("tie", [7, 50]))
    rows.append(("tie", [8, 50]))
    # diverse
    for _ in range(80):
        rows.append(
            ("div", [int(g.integers(0, 200))]
             + [int(x) for x in g.integers(0, 200, 4)])
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
                "n_tok": pa.array([len(r[1]) for r in rows], pa.int64()),
                "source": pa.array([r[0] for r in rows]),
            }
        ),
        tmp_path / "part-000.parquet",
    )

    cnt = collections.defaultdict(collections.Counter)
    for s, t in rows:
        cnt[s][t[0]] += 1
    got = tape_opener(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(cnt)
    for s, c in cnt.items():
        tot = sum(c.values())
        best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        row = got.loc[s]
        assert row["n_seqs"] == tot
        assert row["n_openers"] == len(c)
        assert row["top_id"] == best[0]
        assert row["top_count"] == best[1]
        assert row["top_permille"] == 1000 * best[1] // tot
    assert got.loc["bos", "top_permille"] == 1000
    assert got.loc["tie", "top_id"] == 7


def test_rel_cohort_repurchase_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import cohort_repurchase

    g = np.random.default_rng(632)
    DAY = 86_400_000_000
    y2021 = np.datetime64("2021-02-01", "us").astype(np.int64)
    y2022 = np.datetime64("2022-03-01", "us").astype(np.int64)
    ck, od, ok = [], [], []
    key = 0

    def add(c, d):
        nonlocal key
        key += 1
        ck.append(c)
        od.append(d)
        ok.append(key)

    # cohort 2021: cust 1 retained (200d), cust 2 not (400d), cust 3
    # one-shot, cust 4 exactly 365d -> retained
    add(1, y2021); add(1, y2021 + 200 * DAY)
    add(2, y2021); add(2, y2021 + 400 * DAY)
    add(3, y2021)
    add(4, y2021); add(4, y2021 + 365 * DAY)
    # cohort 2022: random customers
    for c in range(10, 40):
        d0 = y2022 + int(g.integers(0, 100)) * DAY
        add(c, d0)
        if c % 2:
            add(c, d0 + int(g.integers(1, 700)) * DAY)
    n = len(ck)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.array(ok, np.int64)),
                "o_custkey": pa.array(np.array(ck, np.int64)),
                "o_orderstatus": pa.array(["O"] * n),
                "o_totalprice": pa.array(np.ones(n)),
                "o_orderdate": pa.array(np.array(od, np.int64)).cast(
                    pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * n),
            }
        ),
        tmp_path / "orders.parquet",
    )

    per = collections.defaultdict(list)
    for c, d, k in zip(ck, od, ok):
        per[c].append((d, k))
    want = collections.defaultdict(lambda: [0, 0])
    for c, orders in per.items():
        orders.sort()
        d1 = orders[0][0]
        year = (
            np.array([d1], dtype=np.int64)
            .astype("datetime64[us]")
            .astype("datetime64[Y]")
            .astype(int)[0]
            + 1970
        )
        want[year][0] += 1
        if len(orders) >= 2:
            d2 = orders[1][0]
            if d2 // DAY - d1 // DAY <= 365:
                want[year][1] += 1
    got = cohort_repurchase(str(tmp_path)).to_pandas()
    got = got.set_index("cohort").sort_index()
    assert list(got.index) == sorted(want)
    for y, (nc, nr) in want.items():
        row = got.loc[y]
        assert row["n_customers"] == nc
        assert row["n_retained"] == nr
        assert row["retained_permille"] == 1000 * nr // nc
    assert got.loc[2021, "n_customers"] == 4
    assert got.loc[2021, "n_retained"] == 2
