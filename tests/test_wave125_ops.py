"""Round-4 wave-125 operators: E172 weekly median-drift sufficient
stats (planted drifting vs outlier-poisoned-but-stable medians pin all
six sums), T179/F token-residue balance board (planted hot residues pin
occupancy), R106 quantity spectrum (planted pack-size lattice pins the
spikes) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _qdisc(sorted_vals, permille):
    n = len(sorted_vals)
    return sorted_vals[(n * permille + 999) // 1000 - 1]


def test_events_median_drift_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_median_drift

    week_us = 7 * 86_400_000_000
    w0 = 2950  # epoch week index
    rows = []  # (source, ts_us, value)
    # "drift": weekly medians 100, 110, 120 cents
    for wi, med in enumerate((1.00, 1.10, 1.20)):
        t = (w0 + wi) * week_us + 1_000_000
        for v in (med - 0.02, med, med + 0.5):
            rows.append(("drift", t, float(v)))
            t += 60_000_000
    # "stable": median 5.00 every week, but with HUGE outliers that
    # must not move the median
    for wi in range(3):
        t = (w0 + wi) * week_us + 10_000_000
        for v in (5.00, 5.00, 4.99, 99999.0):
            rows.append(("stable", t, float(v)))
            t += 60_000_000
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
        events_median_drift(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    per = collections.defaultdict(lambda: collections.defaultdict(list))
    for s, t, v in rows:
        per[s][t // week_us].append(int(np.rint(v * 100)))
    for s, weeks in per.items():
        cells = [(w, _qdisc(sorted(cs), 500)) for w, cs in weeks.items()]
        row = got.loc[s]
        assert row["n_weeks"] == len(cells)
        assert row["sum_w"] == sum(w for w, _ in cells)
        assert row["sum_w_sq"] == sum(w * w for w, _ in cells)
        assert row["sum_p50"] == sum(p for _, p in cells)
        assert row["sum_p50_sq"] == sum(p * p for _, p in cells)
        assert row["sum_w_p50"] == sum(w * p for w, p in cells)
    assert got.loc["drift", "sum_p50"] == 100 + 110 + 120
    assert got.loc["stable", "sum_p50"] == 3 * 500  # outliers ignored


def test_token_residue_balance_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import token_residue_balance

    rows = [  # (tokens)
        [0, 64, 128, 1, 65],        # residue 0 x3 (ids 0,64,128), 1 x2
        [2, 2, 2, 66],              # residue 2 x3 (id 2), 2 x1 (id 66)
        [63, 127],                  # residue 63 x2 (two distinct ids)
        [],
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(
                    [f"s-{i:06d}" for i in range(len(rows))]
                ),
                "tokens": pa.array(rows, pa.list_(pa.int32())),
                "n_tok": pa.array([len(r) for r in rows], pa.int32()),
                "source": pa.array(["s"] * len(rows)),
            }
        ),
        tmp_path / "part-00000.parquet",
    )

    got = (
        token_residue_balance(str(tmp_path))
        .to_pandas()
        .set_index("residue")
        .sort_index()
    )
    flat = [t for r in rows for t in r]
    occ = collections.Counter(t % 64 for t in flat)
    nid = collections.defaultdict(set)
    for t in flat:
        nid[t % 64].add(t)
    assert sorted(got.index) == sorted(occ)
    for r in occ:
        row = got.loc[r]
        assert row["n_occurrences"] == occ[r]
        assert row["n_distinct_ids"] == len(nid[r])
    assert got.loc[0, "n_distinct_ids"] == 3
    assert got.loc[2, "n_distinct_ids"] == 2   # ids 2 and 66
    assert got.loc[2, "n_occurrences"] == 4


def test_rel_quantity_spectrum_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import quantity_spectrum

    g = np.random.default_rng(865)
    qty, ep, dc = [], [], []
    # pack-size lattice: spikes at 6, 12, 24
    for q, cnt in ((6, 30), (12, 25), (24, 20), (1, 10), (7, 2)):
        for _ in range(cnt):
            qty.append(float(q))
            ep.append(float(g.uniform(50, 500)))
            dc.append(float(g.integers(0, 10)) / 100.0)
    n = len(qty)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "l_partkey": pa.array(np.ones(n, np.int64)),
                "l_suppkey": pa.array(np.ones(n, np.int64)),
                "l_linenumber": pa.array(np.ones(n, np.int32)),
                "l_quantity": pa.array(np.array(qty)),
                "l_extendedprice": pa.array(np.array(ep)),
                "l_discount": pa.array(np.array(dc)),
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

    want = collections.defaultdict(lambda: [0, 0])
    for q, e, d in zip(qty, ep, dc):
        w = want[int(q)]
        w[0] += 1
        w[1] += int(np.floor(e * (1.0 - d)))
    got = (
        quantity_spectrum(str(tmp_path))
        .to_pandas()
        .set_index("quantity")
        .sort_index()
    )
    assert sorted(got.index) == sorted(want)
    for q, (nl, rv) in want.items():
        row = got.loc[q]
        assert row["n_lines"] == nl
        assert row["revenue_floor"] == rv
    assert got.loc[6, "n_lines"] == 30
    assert got.loc[24, "n_lines"] == 20
