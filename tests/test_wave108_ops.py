"""Round-4 wave-108 operators: E155 weekly-rhythm sufficient stats
(planted perfectly-periodic vs anti-periodic daily loads — with a pair
crossing the 256-day window boundary — pin all six sums), T162
embedding↔document linkage audit (planted orphans/unembedded/fan-out
pin every counter), R89 weekday-rhythm matrix (planted Friday→Monday
cells pin the grid) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_weekly_rhythm_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_weekly_rhythm

    base_day = 18000  # epoch days; window = 256 days
    day_us = 86_400_000_000
    loads = {}  # source -> {day: count}
    # "periodic": day d has load 1 + (d % 7) over 21 consecutive days
    loads["periodic"] = {
        base_day + d: 1 + (d % 7) for d in range(21)
    }
    # "sparse": active days with HOLES so some d+7 partners are absent;
    # also place a pair exactly across the 256-day window boundary:
    # window boundary at day 18176 (18176 % 256 == 0): pair (18172, 18179)?
    # 18172//256 = 70, 18179//256 = 71 -> crosses
    loads["sparse"] = {
        base_day + 100: 5,
        base_day + 107: 3,          # pair with above
        base_day + 114: 2,          # chain: (107,114) pair too
        base_day + 130: 9,          # no partner
        18172: 4,
        18179: 6,                   # cross-window pair
    }
    # "flat": constant load, 10 days -> 3 pairs all (7,7)
    loads["flat"] = {base_day + 200 + d: 7 for d in range(10)}

    rows = []
    for s, dmap in loads.items():
        for d, cnt in dmap.items():
            for j in range(cnt):
                rows.append((s, d * day_us + j * 1000))
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
        events_weekly_rhythm(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    assert list(got.index) == sorted(loads)
    for s, dmap in loads.items():
        pairs = [
            (x, dmap[d + 7])
            for d, x in dmap.items()
            if d + 7 in dmap
        ]
        row = got.loc[s]
        assert row["n_pairs"] == len(pairs)
        assert row["sum_x"] == sum(a for a, _ in pairs)
        assert row["sum_x_sq"] == sum(a * a for a, _ in pairs)
        assert row["sum_y"] == sum(b for _, b in pairs)
        assert row["sum_y_sq"] == sum(b * b for _, b in pairs)
        assert row["sum_xy"] == sum(a * b for a, b in pairs)
    # periodic: 14 pairs, each x == y (perfect weekly rhythm)
    p = got.loc["periodic"]
    assert p["n_pairs"] == 14
    assert p["sum_x"] == p["sum_y"]
    assert p["sum_xy"] == p["sum_x_sq"]
    assert got.loc["sparse", "n_pairs"] == 3   # incl. the cross-window pair
    assert got.loc["flat", "n_pairs"] == 3


def test_embedding_doc_linkage_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import embedding_doc_linkage

    # docs: ids 1..6 plus a duplicated doc id 6
    doc_ids = [1, 2, 3, 4, 5, 6, 6]
    nd = len(doc_ids)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.array(doc_ids, np.int64)),
                "text": pa.array(["t"] * nd),
                "lang": pa.array(["en"] * nd),
                "source": pa.array(["s"] * nd),
                "n_chars": pa.array([1] * nd, pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    # vectors: ids 1,2,3 matched; 9,10 orphans; id 2 has TWO vectors
    vec_ids = [1, 2, 2, 3, 9, 10]
    nv = len(vec_ids)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.array(vec_ids, np.int64)),
                "embedding": pa.array(
                    [[1.0, 2.0]] * nv, pa.list_(pa.float32())
                ),
                "label": pa.array(np.zeros(nv, np.int32)),
            }
        ),
        tmp_path / "embeddings.parquet",
    )

    got = embedding_doc_linkage(str(tmp_path)).to_pandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert row["n_vectors"] == 6
    assert row["n_docs"] == 7
    assert row["n_matched_vectors"] == 4   # ids 1, 2(x2), 3
    assert row["n_orphan_vectors"] == 2    # ids 9, 10
    assert row["n_unembedded_docs"] == 4   # ids 4, 5, 6(x2)
    assert row["n_multi_vector_ids"] == 1  # id 2


def test_rel_weekday_rhythm_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import weekday_rhythm

    day_us = 86_400_000_000
    # 2026-07-03 is a Friday; epoch-day dow = (day + 3) % 7, Monday = 0
    fri = np.datetime64("2026-07-03", "us").astype(np.int64)
    mon = np.datetime64("2026-07-06", "us").astype(np.int64)
    orders = []  # (okey, odate)
    lines = []   # (okey, shipdate)
    # planted: 5 Friday orders shipping Monday (gap 3)
    for i in range(5):
        orders.append((100 + i, fri))
        lines.append((100 + i, mon))
    # planted: a Monday order shipping same Monday (gap 0), 2 lines
    orders.append((200, mon))
    lines.append((200, mon))
    lines.append((200, mon))
    # planted: a Wednesday order shipping Friday +9 days (gap 9)
    wed = np.datetime64("2026-07-01", "us").astype(np.int64)
    orders.append((300, wed))
    lines.append((300, wed + 9 * day_us))
    no, nl = len(orders), len(lines)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(
                    np.array([o[0] for o in orders], np.int64)
                ),
                "o_custkey": pa.array(np.ones(no, np.int64)),
                "o_orderstatus": pa.array(["O"] * no),
                "o_totalprice": pa.array(np.full(no, 100.0)),
                "o_orderdate": pa.array(
                    np.array([o[1] for o in orders], np.int64)
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * no),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(
                    np.array([l[0] for l in lines], np.int64)
                ),
                "l_partkey": pa.array(np.ones(nl, np.int64)),
                "l_suppkey": pa.array(np.ones(nl, np.int64)),
                "l_linenumber": pa.array(np.ones(nl, np.int32)),
                "l_quantity": pa.array(np.ones(nl)),
                "l_extendedprice": pa.array(np.full(nl, 100.0)),
                "l_discount": pa.array(np.zeros(nl)),
                "l_tax": pa.array(np.zeros(nl)),
                "l_returnflag": pa.array(["N"] * nl),
                "l_linestatus": pa.array(["O"] * nl),
                "l_shipdate": pa.array(
                    np.array([l[1] for l in lines], np.int64)
                ).cast(pa.timestamp("us")),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    odate = dict(orders)
    want = collections.defaultdict(lambda: [0, 0])
    for okey, sd in lines:
        od = odate[okey]
        odow = (od // day_us + 3) % 7
        sdow = (sd // day_us + 3) % 7
        c = want[(odow, sdow)]
        c[0] += 1
        c[1] += sd // day_us - od // day_us
    got = (
        weekday_rhythm(str(tmp_path))
        .to_pandas()
        .set_index(["order_dow", "ship_dow"])
        .sort_index()
    )
    assert set(got.index) == set(want)
    for key, (nl_, sg) in want.items():
        row = got.loc[key]
        assert row["n_lines"] == nl_
        assert row["sum_gap_days"] == sg
    assert got.loc[(4, 0), "n_lines"] == 5          # Fri -> Mon
    assert got.loc[(4, 0), "sum_gap_days"] == 15
    assert got.loc[(0, 0), "sum_gap_days"] == 0     # same-day Monday
    assert got.loc[(2, 4), "sum_gap_days"] == 9     # Wed -> Fri+9
