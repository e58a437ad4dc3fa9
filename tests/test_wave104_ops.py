"""Round-4 wave-104 operators: E151 value clock board (planted per-hour
payload masses incl. negative floors pin every cell), T158 embedding
dimension co-sign matrix (planted sign patterns pin all four joint
counts), R85 assortment-depth matrix (planted brand × size cells with
single-source and unshipped corners pin every column) — each vs a scalar
brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_value_clock_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_value_clock

    g = np.random.default_rng(841)
    base = np.datetime64("2026-07-06", "us").astype(np.int64)  # a Monday
    hour = 3_600_000_000
    rows = []  # (source, ts_us, value)
    # "billing": huge settlements at hour 23, chatter at hour 9
    for _ in range(3):
        rows.append(("billing", base + 23 * hour + 60_000_000, 10_000.75))
    for _ in range(50):
        rows.append(("billing", base + 9 * hour + 1_000, 1.25))
    # "steady": one event per hour, value = hour (incl. negative at 0)
    for h in range(24):
        rows.append(("steady", base + h * hour, float(h) - 0.5))
    # random tail over 2 days
    for _ in range(200):
        h = int(g.integers(0, 48))
        rows.append(("noise", base + h * hour + int(g.integers(0, hour)),
                     float(np.round(g.uniform(-50, 50), 2))))
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
        events_value_clock(str(tmp_path))
        .to_pandas()
        .set_index(["source", "hour_of_day"])
        .sort_index()
    )
    want = collections.defaultdict(lambda: [0, 0])
    for s, ts, v in rows:
        h = (ts // hour) % 24
        c = want[(s, h)]
        c[0] += 1
        c[1] += int(np.floor(v))
    assert set(got.index) == set(want)
    for key, (ne, vf) in want.items():
        row = got.loc[key]
        assert row["n_events"] == ne
        assert row["value_floor"] == vf
    assert got.loc[("billing", 23), "value_floor"] == 30_000
    assert got.loc[("steady", 0), "value_floor"] == -1  # floor(-0.5)


def test_embedding_cosign_matrix_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import embedding_cosign_matrix

    g = np.random.default_rng(842)
    dim = 16
    # planted: dim0 == dim1 sign always (perfect ++/-- diagonal);
    # dim2 = -dim3 (anti-diagonal); rest random; zeros exercise <= 0
    n = 300
    m = g.normal(size=(n, dim)).astype(np.float32)
    m[:, 1] = np.abs(m[:, 1]) * np.sign(m[:, 0])
    m[:, 3] = -m[:, 2]
    m[:5, 4] = 0.0  # exact zeros -> non-positive class
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(
                    [list(map(float, r)) for r in m],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(np.zeros(n, np.int32)),
            }
        ),
        tmp_path / "embeddings.parquet",
    )

    got = (
        embedding_cosign_matrix(str(tmp_path))
        .to_pandas()
        .set_index(["dim_i", "dim_j"])
        .sort_index()
    )
    mm = pq.read_table(tmp_path / "embeddings.parquet")["embedding"]
    arr = np.array(mm.combine_chunks().flatten()).reshape(n, dim)
    b = arr[:, :8] > 0.0
    assert len(got) == 28
    for i in range(8):
        for j in range(i + 1, 8):
            row = got.loc[(i, j)]
            assert row["n_pp"] == int((b[:, i] & b[:, j]).sum())
            assert row["n_pm"] == int((b[:, i] & ~b[:, j]).sum())
            assert row["n_mp"] == int((~b[:, i] & b[:, j]).sum())
            assert row["n_mm"] == int((~b[:, i] & ~b[:, j]).sum())
    assert got.loc[(0, 1), "n_pm"] == 0  # perfect sign agreement
    assert got.loc[(0, 1), "n_mp"] == 0
    assert got.loc[(2, 3), "n_pp"] == 0  # perfect anti-agreement
    assert got.loc[(2, 3), "n_mm"] == 0


def test_rel_assortment_depth_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import assortment_depth

    # catalog: brand A sizes 1..5 (band 0) on 5 parts; brand A size 15
    # (band 1) 1 part NEVER shipped; brand B size 25 (band 2) 2 parts
    parts = [
        (1, "Brand#A", 1),
        (2, "Brand#A", 3),
        (3, "Brand#A", 5),
        (4, "Brand#A", 8),
        (5, "Brand#A", 10),
        (6, "Brand#A", 15),   # unshipped corner
        (7, "Brand#B", 25),
        (8, "Brand#B", 30),
    ]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(
                    np.array([p[0] for p in parts], np.int64)
                ),
                "p_name": pa.array(["red thing"] * len(parts)),
                "p_brand": pa.array([p[1] for p in parts]),
                "p_type": pa.array(["ECONOMY"] * len(parts)),
                "p_size": pa.array(
                    np.array([p[2] for p in parts], np.int64)
                ),
                "p_retailprice": pa.array(np.full(len(parts), 100.0)),
            }
        ),
        tmp_path / "part.parquet",
    )
    # lines: brand A band 0 served by suppliers 100,101,102;
    # brand B band 2 single-sourced by supplier 200 (the risk cell)
    lk, sk = [], []
    for pkey, suppliers in (
        (1, [100, 101]),
        (2, [100]),
        (3, [102, 102, 100]),  # duplicate (part, supp) lines
        (4, [101]),
        (5, [100]),
        (7, [200, 200]),
        (8, [200]),
    ):
        for s in suppliers:
            lk.append(pkey)
            sk.append(s)
    n = len(lk)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "l_partkey": pa.array(np.array(lk, np.int64)),
                "l_suppkey": pa.array(np.array(sk, np.int64)),
                "l_linenumber": pa.array(np.ones(n, np.int32)),
                "l_quantity": pa.array(np.ones(n)),
                "l_extendedprice": pa.array(np.full(n, 100.0)),
                "l_discount": pa.array(np.zeros(n)),
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

    got = (
        assortment_depth(str(tmp_path))
        .to_pandas()
        .set_index(["brand", "size_band"])
        .sort_index()
    )
    a0 = got.loc[("Brand#A", 0)]
    assert a0["n_parts"] == 5
    assert a0["n_shipped_parts"] == 5
    assert a0["n_suppliers"] == 3
    assert a0["n_lines"] == 8
    a1 = got.loc[("Brand#A", 1)]
    assert a1["n_parts"] == 1
    assert a1["n_shipped_parts"] == 0
    assert a1["n_suppliers"] == 0
    assert a1["n_lines"] == 0
    b2 = got.loc[("Brand#B", 2)]
    assert b2["n_parts"] == 2
    assert b2["n_shipped_parts"] == 2
    assert b2["n_suppliers"] == 1   # the single-source risk
    assert b2["n_lines"] == 3
    assert len(got) == 3
