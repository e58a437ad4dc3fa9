"""Round-4 wave-120 operators: E167 event-id cross-source collision
audit (planted shared/duplicated ids pin every counter), T174 word
burstiness matrix (planted function words vs bursty terms pin the
cells), R101 gap-spend coupling board (planted pent-up demand pins the
band sums) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_id_collision_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_id_collision

    base = np.datetime64("2026-07-01", "us").astype(np.int64)
    rows = []  # (source, event_id)
    # clean ids 0..9 in "a"
    for i in range(10):
        rows.append(("a", i))
    # id 100 shared by a, b, c (fanout 3)
    for s in ("a", "b", "c"):
        rows.append((s, 100))
    # id 200 duplicated within "b" (same source, twice)
    rows.append(("b", 200))
    rows.append(("b", 200))
    # id 300 shared by b and c
    rows.append(("b", 300))
    rows.append(("c", 300))
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows]),
                "ts": pa.array(
                    base + np.arange(n, dtype=np.int64) * 1000
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

    got = events_id_collision(str(tmp_path)).to_pandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert row["n_events"] == n
    assert row["n_distinct_ids"] == 13   # 0..9, 100, 200, 300
    assert row["n_cross_source_ids"] == 2
    assert row["max_source_fanout"] == 3
    assert row["n_dup_ids"] == 3         # 100(x3), 200(x2), 300(x2)


def test_doc_word_burstiness_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import word_burstiness_matrix

    # "the": once in each of 9 docs -> tf 9 df 9 (function word)
    # "burst": 9 times inside ONE doc -> tf 9 df 1 (bursty term)
    # "rare": once total
    texts = ["the filler%d" % i for i in range(8)]
    texts.append("the " + " ".join(["burst"] * 9) + " rare")
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

    tf = collections.Counter()
    df = collections.Counter()
    for t in texts:
        ws = t.split(" ")
        tf.update(ws)
        df.update(set(ws))
    want = collections.defaultdict(lambda: [0, 0])
    for w in tf:
        cell = (len(bin(df[w])) - 2, len(bin(tf[w])) - 2)
        want[cell][0] += 1
        want[cell][1] += tf[w]

    got = (
        word_burstiness_matrix(str(tmp_path))
        .to_pandas()
        .set_index(["df_band", "tf_band"])
        .sort_index()
    )
    assert set(got.index) == set(want)
    for cell, (nw, occ) in want.items():
        row = got.loc[cell]
        assert row["n_words"] == nw
        assert row["n_occurrences"] == occ
    # the function word: df 9 (band 4), tf 9 (band 4)
    assert got.loc[(4, 4), "n_occurrences"] >= 9
    # the bursty term: df 1 (band 1), tf 9 (band 4)
    assert got.loc[(1, 4), "n_words"] == 1


def test_rel_gap_spend_coupling_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import gap_spend_coupling

    day = 86_400_000_000
    d0 = np.datetime64("2026-01-05", "us").astype(np.int64)
    rows = []  # (custkey, odate, price)
    # cust 1: short gaps (1-3 days) with small return spends
    t = d0
    rows.append((1, t, 100.0))
    for gap, v in ((1, 110.0), (2, 105.0), (3, 120.0)):
        t += gap * day
        rows.append((1, t, v))
    # cust 2: a long 200-day gap followed by a BIG return spend
    rows.append((2, d0, 150.0))
    rows.append((2, d0 + 200 * day, 900.5))
    # cust 3: same-day pair (gap 0 -> band 0)
    rows.append((3, d0, 50.0))
    rows.append((3, d0, 60.0))
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
                    np.array([r[1] for r in rows], np.int64)
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n),
            }
        ),
        tmp_path / "orders.parquet",
    )

    per = collections.defaultdict(list)
    for i, (ck, od, price) in enumerate(rows):
        per[ck].append((od // day, i, int(np.floor(price))))
    want = collections.defaultdict(lambda: [0, 0, 0])
    for ck, cells in per.items():
        cells.sort()
        for (pd_, _, _), (d, _, v) in zip(cells, cells[1:]):
            gap = d - pd_
            band = 0 if gap <= 0 else len(bin(gap)) - 2
            c = want[band]
            c[0] += 1
            c[1] += v
            c[2] += v * v

    got = (
        gap_spend_coupling(str(tmp_path))
        .to_pandas()
        .set_index("gap_band")
        .sort_index()
    )
    assert sorted(got.index) == sorted(want)
    for band, (n_, sv, svv) in want.items():
        row = got.loc[band]
        assert row["n_pairs"] == n_
        assert row["sum_v"] == sv
        assert row["sum_v_sq"] == svv
    assert got.loc[8, "sum_v"] == 900     # the pent-up return (bin(200)=8)
    assert got.loc[0, "n_pairs"] == 1     # the same-day pair
