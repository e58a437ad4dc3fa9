"""Round-4 wave-135 operators: E182 user price-habit histogram (planted
subscription payers vs browsers pin the bands; singletons excluded),
T189 label-imbalance spectrum (planted head/tail classes pin the
pyramid), R116 supply-geography trend (planted nearshoring shift pins
the ledger) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_price_habit_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_price_habit

    rows = []  # (user, value)
    # subscribers: users 1..4 pay 9.99 five times -> band 10
    for u in range(1, 5):
        rows += [(u, 9.99)] * 5
    # browser: user 10 pays 5 different amounts -> band 2
    for i in range(5):
        rows.append((10, 1.0 + i))
    # half-habit: user 20: 3x 2.50 + 3x others -> 500 -> band 5
    rows += [(20, 2.50)] * 3 + [(20, 7.0), (20, 8.0), (20, 9.0)]
    # singleton user excluded
    rows.append((99, 42.0))
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(["t"] * n),
                "ts": pa.array(
                    np.datetime64("2026-07-01", "us").astype(np.int64)
                    + np.arange(n, dtype=np.int64) * 1000
                ).cast(pa.timestamp("us")),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(
                    np.array([r[0] for r in rows], np.int64)
                ),
                "value": pa.array(np.array([r[1] for r in rows])),
            }
        ),
        tmp_path / "events.parquet",
    )

    got = (
        events_price_habit(str(tmp_path))
        .to_pandas()
        .set_index("habit_band")
        .sort_index()
    )
    per = collections.defaultdict(collections.Counter)
    for u, v in rows:
        per[u][int(np.rint(v * 100))] += 1
    want = collections.defaultdict(lambda: [0, 0])
    for u, amts in per.items():
        tot = sum(amts.values())
        if tot <= 1:
            continue
        band = 1000 * max(amts.values()) // tot // 100
        want[band][0] += 1
        want[band][1] += tot
    assert sorted(got.index) == sorted(want)
    for band, (nu, ne) in want.items():
        row = got.loc[band]
        assert row["n_users"] == nu
        assert row["n_events"] == ne
    assert got.loc[10, "n_users"] == 4
    assert got.loc[2, "n_users"] == 1
    assert got.loc[5, "n_users"] == 1


def test_embedding_label_imbalance_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import label_imbalance_spectrum

    labels = []
    # head class: 40 vectors (band 6); mid: 9 (band 4); tail: 3
    # singletons (band 1)
    labels += [0] * 40 + [1] * 9 + [2, 3, 4]
    n = len(labels)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(
                    [[1.0, 2.0]] * n, pa.list_(pa.float32())
                ),
                "label": pa.array(np.array(labels, np.int32)),
            }
        ),
        tmp_path / "embeddings.parquet",
    )

    got = (
        label_imbalance_spectrum(str(tmp_path))
        .to_pandas()
        .set_index("size_band")
        .sort_index()
    )
    cnt = collections.Counter(labels)
    want = collections.defaultdict(lambda: [0, 0])
    for lab, c in cnt.items():
        band = len(bin(c)) - 2
        want[band][0] += 1
        want[band][1] += c
    assert sorted(got.index) == sorted(want)
    for band, (nl, nv) in want.items():
        row = got.loc[band]
        assert row["n_labels"] == nl
        assert row["n_vectors"] == nv
    assert got.loc[6, "n_vectors"] == 40
    assert got.loc[1, "n_labels"] == 3


def test_rel_supply_geography_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import supply_geography_trend

    g = np.random.default_rng(871)
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(np.arange(2, dtype=np.int64)),
                "n_name": pa.array(["FARAWAY", "NEARBY"]),
                "n_regionkey": pa.array(np.zeros(2, np.int64)),
            }
        ),
        tmp_path / "nation.parquet",
    )
    sup_nat = {1: 0, 2: 0, 3: 1}
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(np.array(list(sup_nat), np.int64)),
                "s_name": pa.array(
                    [f"Supplier#{k:09d}" for k in sup_nat]
                ),
                "s_nationkey": pa.array(
                    np.array(list(sup_nat.values()), np.int64)
                ),
                "s_acctbal": pa.array(np.zeros(3)),
            }
        ),
        tmp_path / "supplier.parquet",
    )
    lines = []  # (suppkey, year, qty, ep, disc)
    # 2024: FARAWAY ships 30 lines, NEARBY 5; 2025: reversed trend
    for yr, far, near in ((2024, 30, 5), (2025, 10, 25)):
        for _ in range(far):
            lines.append((int(g.choice([1, 2])), yr,
                          float(g.integers(1, 20)),
                          float(g.uniform(50, 500)),
                          float(g.integers(0, 10)) / 100.0))
        for _ in range(near):
            lines.append((3, yr, float(g.integers(1, 20)),
                          float(g.uniform(50, 500)),
                          float(g.integers(0, 10)) / 100.0))
    nl = len(lines)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(nl, dtype=np.int64)),
                "l_partkey": pa.array(np.ones(nl, np.int64)),
                "l_suppkey": pa.array(
                    np.array([l[0] for l in lines], np.int64)
                ),
                "l_linenumber": pa.array(np.ones(nl, np.int32)),
                "l_quantity": pa.array(np.array([l[2] for l in lines])),
                "l_extendedprice": pa.array(
                    np.array([l[3] for l in lines])
                ),
                "l_discount": pa.array(np.array([l[4] for l in lines])),
                "l_tax": pa.array(np.zeros(nl)),
                "l_returnflag": pa.array(["N"] * nl),
                "l_linestatus": pa.array(["O"] * nl),
                "l_shipdate": pa.array(
                    np.array(
                        [
                            np.datetime64(f"{l[1]}-06-15", "us").astype(
                                np.int64
                            )
                            for l in lines
                        ],
                        np.int64,
                    )
                ).cast(pa.timestamp("us")),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    names = ["FARAWAY", "NEARBY"]
    want = collections.defaultdict(lambda: [0, 0, 0])
    for sk, yr, q, e, d in lines:
        c = want[(names[sup_nat[sk]], yr)]
        c[0] += 1
        c[1] += int(np.floor(q))
        c[2] += int(np.floor(e * (1.0 - d)))
    got = (
        supply_geography_trend(str(tmp_path))
        .to_pandas()
        .set_index(["nation", "ship_year"])
        .sort_index()
    )
    assert set(got.index) == set(want)
    for key, (nl_, q, r) in want.items():
        row = got.loc[key]
        assert row["n_lines"] == nl_
        assert row["qty_floor"] == q
        assert row["revenue_floor"] == r
    assert got.loc[("NEARBY", 2025), "n_lines"] == 25
    assert got.loc[("FARAWAY", 2024), "n_lines"] == 30
