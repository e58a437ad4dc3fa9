"""Round-4 wave-122 operators: E169 value co-movement matrix (planted
co-moving and anti-moving revenue streams pin all pair sums incl.
either-active zero-fill), T176 doc-id gap spectrum (planted lost batches
pin the bands — incl. a gap crossing the id-window boundary), R103
value-priority alignment matrix (planted slow-lane money pins the
corner) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections
import itertools

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_value_comovement_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_value_comovement

    day_us = 86_400_000_000
    base_day = 20_600
    daily = {
        # "a" and "b" co-move; "c" anti-moves; "d" partial calendar
        "a": {0: 10, 1: 20, 2: 30, 3: 40},
        "b": {0: 11, 1: 19, 2: 31, 3: 42},
        "c": {0: 40, 1: 30, 2: 20, 3: 10},
        "d": {1: 7, 5: 9},
    }
    rows = []
    for s, dm in daily.items():
        for d, v in dm.items():
            # split each day's mass into two events (floors must sum)
            rows.append((s, (base_day + d) * day_us + 1000, float(v - 3)))
            rows.append((s, (base_day + d) * day_us + 2000, 3.0))
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
                "value": pa.array(np.array([r[2] for r in rows])),
            }
        ),
        tmp_path / "events.parquet",
    )

    got = (
        events_value_comovement(str(tmp_path))
        .to_pandas()
        .set_index(["source_i", "source_j"])
        .sort_index()
    )
    names = sorted(daily)
    for si, sj in itertools.combinations(names, 2):
        days = sorted(set(daily[si]) | set(daily[sj]))
        xs = [daily[si].get(d, 0) for d in days]
        ys = [daily[sj].get(d, 0) for d in days]
        row = got.loc[(si, sj)]
        assert row["n_days"] == len(days)
        assert row["sum_x"] == sum(xs)
        assert row["sum_y"] == sum(ys)
        assert row["sum_x_sq"] == sum(x * x for x in xs)
        assert row["sum_y_sq"] == sum(y * y for y in ys)
        assert row["sum_xy"] == sum(x * y for x, y in zip(xs, ys))
    assert got.loc[("a", "d"), "n_days"] == 5   # union calendar
    assert got.loc[("a", "b"), "sum_xy"] == (
        10 * 11 + 20 * 19 + 30 * 31 + 40 * 42
    )


def test_doc_id_gap_spectrum_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import doc_id_gap_spectrum

    # ids: dense 0..9, then a hole of 90 (10 -> 100), dense 100..104,
    # then a window-crossing gap with window_ids=64: 104 -> 300
    ids = list(range(10)) + list(range(100, 105)) + [300, 301]
    # a duplicated id must not create a phantom zero-gap
    ids.append(301)
    n = len(ids)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.array(ids, np.int64)),
                "text": pa.array(["x y"] * n),
                "lang": pa.array(["en"] * n),
                "source": pa.array(["s"] * n),
                "n_chars": pa.array([3] * n, pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    got = (
        doc_id_gap_spectrum(str(tmp_path), window_ids=64)
        .to_pandas()
        .set_index("gap_band")
        .sort_index()
    )
    uids = sorted(set(ids))
    want = collections.defaultdict(lambda: [0, 0])
    for a, b in zip(uids, uids[1:]):
        gap = b - a
        band = len(bin(gap)) - 2
        want[band][0] += 1
        want[band][1] += gap - 1
    assert sorted(got.index) == sorted(want)
    for band, (ng, miss) in want.items():
        row = got.loc[band]
        assert row["n_gaps"] == ng
        assert row["missing_ids"] == miss
    assert got.loc[7, "missing_ids"] == 90    # the 9->100 hole (gap 91)
    assert got.loc[8, "missing_ids"] == 195   # the window-crossing 104->300
    assert got.loc[1, "n_gaps"] == 9 + 4 + 1  # dense steps


def test_rel_value_priority_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import value_priority_matrix

    g = np.random.default_rng(861)
    rows = []  # (priority, totalprice)
    # planted slow-lane money: 15 orders ~100k value at 5-LOW
    for _ in range(15):
        rows.append(("5-LOW", float(g.uniform(90_000, 130_000))))
    # urgent cheap orders
    for _ in range(20):
        rows.append(("1-URGENT", float(g.uniform(100, 900))))
    # mixed mid-band
    for _ in range(30):
        rows.append((
            str(g.choice(["1-URGENT", "3-MEDIUM", "5-LOW"])),
            float(g.uniform(1000, 60_000)),
        ))
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "o_custkey": pa.array(np.ones(n, np.int64)),
                "o_orderstatus": pa.array(["O"] * n),
                "o_totalprice": pa.array(
                    np.array([r[1] for r in rows])
                ),
                "o_orderdate": pa.array(
                    np.full(n, np.datetime64("2026-01-01", "us"))
                ),
                "o_orderpriority": pa.array([r[0] for r in rows]),
            }
        ),
        tmp_path / "orders.parquet",
    )

    want = collections.Counter()
    for pr, v in rows:
        band = len(bin(int(np.floor(v)))) - 2
        want[(band, pr)] += 1
    got = (
        value_priority_matrix(str(tmp_path))
        .to_pandas()
        .set_index(["value_band", "o_orderpriority"])
        .sort_index()
    )
    assert set(got.index) == set(want)
    for key, cnt in want.items():
        assert got.loc[key, "n_orders"] == cnt
    # the slow-lane corner exists with all 15 planted orders
    high_low = [
        cnt for (band, pr), cnt in want.items()
        if pr == "5-LOW" and band >= 17
    ]
    assert sum(high_low) == 15
