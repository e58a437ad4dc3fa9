"""Round-4 wave-98 operators: E145 payload-integrality audit (planted
integer-counter / negative-gauge / zero-leak sources pin each column),
T152/F adjacent-replay audit (planted back-to-back replays crossing the
carry-window boundary pin the pair counts), R79 list-price adherence
histogram (planted at-list / half-list / over-list lines pin their
bands) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HOUR = 3_600_000_000


def test_events_value_integrality_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_value_integrality

    g = np.random.default_rng(821)
    base = np.datetime64("2026-07-01", "us").astype(np.int64)
    et, val = [], []
    # "counter": all exact integers
    for i in range(40):
        et.append("counter")
        val.append(float(i % 7))
    # "gauge": never integral, some negative
    for i in range(30):
        et.append("gauge")
        val.append((-1.5 if i % 3 == 0 else 2.25) + i * 0.001)
    # "leaky": exactly 10 zeros among noise
    for i in range(20):
        et.append("leaky")
        val.append(0.0 if i < 10 else 1.125)
    # "mixed": random
    for _ in range(200):
        et.append("mixed")
        val.append(float(np.round(g.uniform(-5, 5), 1)))
    n = len(et)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(et),
                "ts": pa.array(
                    base + np.arange(n, dtype=np.int64) * 1000
                ).cast(pa.timestamp("us")),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.zeros(n, np.int64)),
                "value": pa.array(np.array(val)),
            }
        ),
        tmp_path / "events.parquet",
    )

    got = (
        events_value_integrality(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    per = collections.defaultdict(list)
    for s, v in zip(et, val):
        per[s].append(v)
    for s, vs in per.items():
        row = got.loc[s]
        ni = sum(1 for v in vs if v == np.floor(v))
        assert row["n_events"] == len(vs)
        assert row["n_integer"] == ni
        assert row["n_negative"] == sum(1 for v in vs if v < 0)
        assert row["n_zero"] == sum(1 for v in vs if v == 0)
        assert row["integer_permille"] == 1000 * ni // len(vs)
    assert got.loc["counter", "integer_permille"] == 1000
    assert got.loc["gauge", "n_integer"] == 0
    assert got.loc["gauge", "n_negative"] == 10
    assert got.loc["leaky", "n_zero"] == 10


def test_f1_replay_adjacent_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import f1_replay_adjacent

    # window_s default 3600; plant a replay CROSSING the window
    # boundary (seq 3599 -> 3600) to exercise the carry path
    rows = [
        ("s01-00000100", [1, 2, 3]),
        ("s01-00000200", [1, 2, 3]),      # replay of prev
        ("s01-00003599", [9, 9]),
        ("s01-00003600", [9, 9]),         # replay across windows
        ("s01-00003700", [5]),
        ("s02-00000010", [7, 8]),
        ("s02-00000020", [8, 7]),          # NOT a replay (order differs)
        ("s03-00000001", [4]),             # singleton: no pairs
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows]),
                "tokens": pa.array(
                    [r[1] for r in rows], pa.list_(pa.int32())
                ),
                "n_tok": pa.array([len(r[1]) for r in rows], pa.int32()),
                "source": pa.array([r[0][:3] for r in rows]),
            }
        ),
        tmp_path / "part-00000.parquet",
    )

    per = collections.defaultdict(list)
    for did, tk in rows:
        per[did[:3]].append((int(did.split("-")[1]), tuple(tk)))
    got = (
        f1_replay_adjacent(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    assert list(got.index) == sorted(per)
    for s, lst in per.items():
        lst.sort()
        pairs = len(lst) - 1
        reps = sum(
            1 for a, b in zip(lst, lst[1:]) if a[1] == b[1]
        )
        row = got.loc[s]
        assert row["n_rows"] == len(lst)
        assert row["n_pairs"] == pairs
        assert row["n_replays"] == reps
        assert row["replay_permille"] == 1000 * reps // max(pairs, 1)
    assert got.loc["s01", "n_replays"] == 2
    assert got.loc["s02", "n_replays"] == 0
    assert got.loc["s03", "n_pairs"] == 0


def test_rel_price_adherence_hist_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import price_adherence_hist

    g = np.random.default_rng(822)
    n_part = 25
    retail = np.round(g.uniform(100, 2000, n_part), 2)
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(np.arange(1, n_part + 1)),
                "p_name": pa.array([f"p{i}" for i in range(n_part)]),
                "p_brand": pa.array(["B1"] * n_part),
                "p_type": pa.array(["T"] * n_part),
                "p_size": pa.array(np.ones(n_part, np.int32)),
                "p_retailprice": pa.array(retail),
            }
        ),
        tmp_path / "part.parquet",
    )
    lk, qty, ext, dis = [], [], [], []
    # planted: at-list (band 10), half-list (band 5), over-list (band 12)
    for mult, cnt in ((1.0, 15), (0.55, 10), (1.25, 5)):
        for _ in range(cnt):
            p = int(g.integers(1, n_part + 1))
            q = float(g.integers(1, 20))
            lk.append(p)
            qty.append(q)
            ext.append(q * retail[p - 1] * mult)
            dis.append(0.02)
    # random tail
    for _ in range(150):
        p = int(g.integers(1, n_part + 1))
        q = float(g.integers(1, 20))
        lk.append(p)
        qty.append(q)
        ext.append(q * retail[p - 1] * float(g.uniform(0.4, 1.3)))
        dis.append(float(np.round(g.uniform(0, 0.1), 2)))
    n = len(lk)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "l_partkey": pa.array(np.array(lk, np.int64)),
                "l_suppkey": pa.array(np.ones(n, np.int64)),
                "l_linenumber": pa.array(np.ones(n, np.int32)),
                "l_quantity": pa.array(np.array(qty)),
                "l_extendedprice": pa.array(np.array(ext)),
                "l_discount": pa.array(np.array(dis)),
                "l_tax": pa.array(np.zeros(n)),
                "l_returnflag": pa.array(["N"] * n),
                "l_linestatus": pa.array(["O"] * n),
                "l_shipdate": pa.array(
                    np.full(n, np.datetime64("2026-01-01", "us"))
                ),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    want = collections.defaultdict(lambda: [0, 0, 0])
    for p, q, e, dd in zip(lk, qty, ext, dis):
        band = int(np.floor(10.0 * (e / (q * retail[p - 1]))))
        w = want[band]
        w[0] += 1
        w[1] += int(np.floor(q))
        w[2] += int(np.floor(e * (1.0 - dd)))

    got = (
        price_adherence_hist(str(tmp_path))
        .to_pandas()
        .set_index("adherence_band")
        .sort_index()
    )
    assert list(got.index) == sorted(want)
    for band, (nl, qf, rf) in want.items():
        row = got.loc[band]
        assert row["n_lines"] == nl
        assert row["qty_floor"] == qf
        assert row["revenue_floor"] == rf
    assert got.loc[10, "n_lines"] >= 15
    assert got.loc[5, "n_lines"] >= 10
    assert got.loc[12, "n_lines"] >= 5
