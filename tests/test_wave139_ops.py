"""Round-4 wave-139 operators: E186 value-tail occupancy board (planted
tail-owning sources pin the counts), T193 embedding sparsity spectrum
(planted ReLU-style zeros pin the bands), R120 segment balance profile
(planted indebted segment pins every column) — each vs a scalar
brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_value_tails_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_value_tails

    rows = []  # (source, value)
    # "mid": 30 events around 100.xx (the body)
    for i in range(30):
        rows.append(("mid", 100.0 + i * 0.01))
    # "cheap": 5 events near 1.xx (owns the low tail)
    for i in range(5):
        rows.append(("cheap", 1.0 + i * 0.01))
    # "whale": 5 events near 10000 (owns the high tail)
    for i in range(5):
        rows.append(("whale", 10_000.0 + i))
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows]),
                "ts": pa.array(
                    np.datetime64("2026-07-01", "us").astype(np.int64)
                    + np.arange(n, dtype=np.int64) * 1000
                ).cast(pa.timestamp("us")),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.zeros(n, np.int64)),
                "value": pa.array(np.array([r[1] for r in rows])),
            }
        ),
        tmp_path / "events.parquet",
    )

    cents = sorted(int(np.rint(r[1] * 100)) for r in rows)
    t10 = cents[(n * 100 + 999) // 1000 - 1]
    t90 = cents[(n * 900 + 999) // 1000 - 1]
    want = collections.defaultdict(lambda: [0, 0, 0])
    for s, v in rows:
        c = int(np.rint(v * 100))
        w = want[s]
        w[0] += 1
        w[1] += 1 if c < t10 else 0
        w[2] += 1 if c > t90 else 0

    got = (
        events_value_tails(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    assert list(got.index) == sorted(want)
    for s, (ne, lo, hi) in want.items():
        row = got.loc[s]
        assert row["n_events"] == ne
        assert row["n_below_p10"] == lo
        assert row["n_above_p90"] == hi
    assert got.loc["cheap", "n_below_p10"] > 0
    assert got.loc["whale", "n_above_p90"] > 0
    assert got.loc["mid", "n_below_p10"] == 0


def test_embedding_sparsity_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import sparsity_spectrum

    vecs = [
        [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0],     # dense (band 0)
        [0.0, 2.0, 0.0, 4.0, 0.0, 6.0, 0.0, 8.0],     # 4 zeros (band 3)
        [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0],     # 7 zeros (band 3)
        [1.0, 0.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0],     # 1 zero (band 1)
    ]
    n = len(vecs)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array(np.zeros(n, np.int32)),
            }
        ),
        tmp_path / "embeddings.parquet",
    )

    got = (
        sparsity_spectrum(str(tmp_path))
        .to_pandas()
        .set_index("zero_band")
        .sort_index()
    )
    want = collections.defaultdict(lambda: [0, 0])
    for v in vecs:
        zc = sum(1 for x in v if x == 0.0)
        band = 0 if zc == 0 else len(bin(zc)) - 2
        want[band][0] += 1
        want[band][1] += zc
    assert sorted(got.index) == sorted(want)
    for band, (nv, nz) in want.items():
        row = got.loc[band]
        assert row["n_vectors"] == nv
        assert row["n_zero_components"] == nz
    assert got.loc[0, "n_vectors"] == 1
    assert got.loc[3, "n_zero_components"] == 11   # 4 + 7


def test_rel_segment_balance_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import segment_balance_profile

    rows = []  # (segment, acctbal)
    # SOLVENT: all positive
    for b in (100.5, 200.0, 5.25):
        rows.append(("SOLVENT", b))
    # LEVERAGED: 3 of 5 negative
    for b in (-10.5, -999.99, -0.25, 50.0, 7.0):
        rows.append(("LEVERAGED", b))
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(np.arange(1, n + 1, dtype=np.int64)),
                "c_name": pa.array(
                    [f"Customer#{i:09d}" for i in range(1, n + 1)]
                ),
                "c_nationkey": pa.array(np.zeros(n, np.int64)),
                "c_acctbal": pa.array(np.array([r[1] for r in rows])),
                "c_mktsegment": pa.array([r[0] for r in rows]),
            }
        ),
        tmp_path / "customer.parquet",
    )

    got = (
        segment_balance_profile(str(tmp_path))
        .to_pandas()
        .set_index("c_mktsegment")
        .sort_index()
    )
    per = collections.defaultdict(list)
    for s, b in rows:
        per[s].append(int(np.floor(b)))
    for s, bs in per.items():
        row = got.loc[s]
        neg = sum(1 for b in bs if b < 0)
        assert row["n_customers"] == len(bs)
        assert row["n_negative"] == neg
        assert row["debt_permille"] == 1000 * neg // len(bs)
        assert row["worst_balance"] == min(bs)
        assert row["net_balance"] == sum(bs)
    assert got.loc["LEVERAGED", "debt_permille"] == 600
    assert got.loc["SOLVENT", "n_negative"] == 0
