"""Round-5 wave-170 operators: E217 schedule-shift board, T223
hapax-position cross, R150 weekend-order trend — each vs a scalar
brute-force reference on planted fixtures."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000


def test_schedule_shift_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_schedule_shift

    g = np.random.default_rng(421)
    n = 4000
    ts = np.sort(g.integers(0, 60 * DAY_US, n).astype(np.int64))
    types = np.array(["steady", "shifted"])
    ty = g.integers(0, 2, n)
    # 'shifted' fires at hour 2 early, hour 14 late
    sh = ty == 1
    day = ts // DAY_US
    hour = np.where(day < 30, 2, 14)
    ts[sh] = day[sh] * DAY_US + hour[sh] * HOUR_US
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(g.integers(1, 40, n).astype(np.int64)),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(g.uniform(0, 10, n)),
            "event_type": pa.array(types[ty]),
        }),
        tmp_path / "events.parquet",
    )

    per = collections.defaultdict(list)
    for t, k in zip(ts, ty):
        per[int(k)].append(int(t))
    got = events_schedule_shift(str(tmp_path)).to_pandas().set_index(
        "source"
    )
    for k, name in enumerate(types):
        days = [t // DAY_US for t in per[k]]
        mid = (min(days) + max(days)) // 2
        grids = [np.zeros(24, np.int64), np.zeros(24, np.int64)]
        for t in per[k]:
            grids[1 if t // DAY_US > mid else 0][t // HOUR_US % 24] += 1
        if grids[0].sum() == 0 or grids[1].sum() == 0:
            assert name not in got.index
            continue
        eh, lh = int(grids[0].argmax()), int(grids[1].argmax())
        row = got.loc[name]
        assert int(row["early_modal_hour"]) == eh
        assert int(row["late_modal_hour"]) == lh
        d = abs(eh - lh)
        assert int(row["shift_distance"]) == min(d, 24 - d)


def test_hapax_position_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import hapax_position

    g = np.random.default_rng(431)
    rows = []
    for i in range(250):
        src = f"s{i % 2}"
        words = [f"c{int(g.integers(0, 12))}"
                 for _ in range(int(g.integers(1, 12)))]
        if i % 4 == 0:
            words.append(f"tailnoise{i}")  # hapax at the tail
        rows.append({"doc_id": i, "text": " ".join(words), "lang": "en",
                     "source": src, "n_chars": 0})
    pq.write_table(pa.Table.from_pylist(rows), tmp_path / "documents.parquet")

    freq = collections.Counter()
    for r in rows:
        for w in r["text"].split(" "):
            freq[w] += 1
    agg = collections.defaultdict(lambda: [0, 0])
    for r in rows:
        words = r["text"].split(" ")
        nw = len(words)
        for p, w in enumerate(words):
            a = agg[(r["source"], 3 * p // nw)]
            a[0] += 1
            a[1] += 1 if freq[w] == 1 else 0

    got = hapax_position(str(tmp_path)).to_pandas()
    assert len(got) == len(agg)
    for _, row in got.iterrows():
        occ, hx = agg[(row["source"], int(row["third"]))]
        assert int(row["n_occurrences"]) == occ
        assert int(row["n_hapax"]) == hx
        assert int(row["hapax_permille"]) == 1000 * hx // occ


def test_weekend_trend_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import weekend_trend

    g = np.random.default_rng(433)
    n_ord = 500
    day = g.integers(9000, 12000, n_ord).astype(np.int64)
    price = g.uniform(50.0, 3000.0, n_ord)
    pq.write_table(
        pa.table({
            "o_orderdate": pa.array(day * DAY_US, pa.int64()).cast(
                pa.timestamp("us")
            ),
            "o_totalprice": pa.array(price),
        }),
        tmp_path / "orders.parquet",
    )

    agg = collections.defaultdict(lambda: [0, 0, 0, 0])
    for d, p in zip(day, price):
        yr = int(np.datetime64(int(d), "D").astype("datetime64[Y]")
                 .astype(int)) + 1970
        we = (int(d) + 4) % 7 in (0, 6)
        rv = int(np.floor(p))
        a = agg[yr]
        a[0] += 1
        a[2] += rv
        if we:
            a[1] += 1
            a[3] += rv

    got = weekend_trend(str(tmp_path)).to_pandas().set_index("order_year")
    assert len(got) == len(agg)
    for yr, (n, nw, v, vw) in agg.items():
        row = got.loc[yr]
        assert int(row["n_orders"]) == n
        assert int(row["n_weekend"]) == nw
        assert int(row["revenue_floor"]) == v
        assert int(row["weekend_revenue"]) == vw
        assert int(row["weekend_permille"]) == 1000 * nw // n
