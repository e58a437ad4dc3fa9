"""Round-4 wave-138 operators: E185 id-stride spectrum (planted dense,
strided and backward allocations pin every band incl. a window-crossing
stride), T192 label-spread spectrum (planted point vs multimodal classes
pin the bands), R119 supplier credit-risk map (planted distressed
nations pin every column) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_id_stride_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_id_stride

    base = np.datetime64("2026-07-01", "us").astype(np.int64)
    rows = []  # (source, event_id)
    # "dense": ids 0..9 (strides +1) with one stride crossing the
    # window_ids=8 boundary (id 7 -> 8)
    for i in range(10):
        rows.append(("dense", i))
    # "strided": ids 100, 200, 300 (stride +100, band 3)
    for i in (100, 200, 300):
        rows.append(("strided", i))
    # "dup": duplicate id -> stride 0 band 0
    rows.append(("dup", 500))
    rows.append(("dup", 500))
    rows.append(("dup", 501))
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

    got = (
        events_id_stride(str(tmp_path), window_ids=8)
        .to_pandas()
        .set_index(["source", "stride_band"])
        .sort_index()
    )
    per = collections.defaultdict(list)
    for i, (s, eid) in enumerate(rows):
        per[s].append((eid, base + i * 1000))
    want = collections.Counter()
    for s, evs in per.items():
        evs.sort()
        for a, b in zip(evs, evs[1:]):
            d = b[0] - a[0]
            band = 0 if d == 0 else (1 if d > 0 else -1) * len(str(abs(d)))
            want[(s, band)] += 1
    assert set(got.index) == set(want)
    for key, cnt in want.items():
        assert got.loc[key, "n_pairs"] == cnt
    assert got.loc[("dense", 1), "n_pairs"] == 9
    assert got.loc[("strided", 3), "n_pairs"] == 2
    assert got.loc[("dup", 0), "n_pairs"] == 1


def test_embedding_label_spread_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import label_spread_spectrum

    g = np.random.default_rng(875)
    dim = 8
    vecs, labels = [], []
    # point class 0: 20 vectors in one grid cell
    for _ in range(20):
        v = g.normal(size=dim)
        v[:4] = [0.05, 0.05, 0.05, 0.05]
        vecs.append(list(map(float, v)))
        labels.append(0)
    # multimodal class 1: 10 far-apart cells
    for i in range(10):
        v = g.normal(size=dim)
        v[:4] = [5.0 * i, -3.0 * i, 7.0 + i, -2.0 - i]
        vecs.append(list(map(float, v)))
        labels.append(1)
    n = len(vecs)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array(np.array(labels, np.int32)),
            }
        ),
        tmp_path / "embeddings.parquet",
    )

    arr = np.array(
        pq.read_table(tmp_path / "embeddings.parquet")["embedding"]
        .combine_chunks()
        .flatten()
    ).reshape(n, dim)
    cells = collections.defaultdict(set)
    for i in range(n):
        cells[labels[i]].add(
            tuple(np.floor(4.0 * arr[i, :4].astype(np.float64)).astype(int))
        )
    want = collections.defaultdict(lambda: [0, 0])
    for lab, cs in cells.items():
        band = len(bin(len(cs))) - 2
        want[band][0] += 1
        want[band][1] += len(cs)

    got = (
        label_spread_spectrum(str(tmp_path))
        .to_pandas()
        .set_index("spread_band")
        .sort_index()
    )
    assert sorted(got.index) == sorted(want)
    for band, (nl, nc) in want.items():
        row = got.loc[band]
        assert row["n_labels"] == nl
        assert row["n_cells"] == nc
    assert got.loc[1, "n_labels"] == 1   # the point class
    assert got.loc[4, "n_cells"] == 10   # the multimodal one


def test_rel_supplier_credit_map_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import supplier_credit_map

    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(np.arange(2, dtype=np.int64)),
                "n_name": pa.array(["SOLVENT", "DISTRESSED"]),
                "n_regionkey": pa.array(np.zeros(2, np.int64)),
            }
        ),
        tmp_path / "nation.parquet",
    )
    # SOLVENT: 4 suppliers all positive; DISTRESSED: 5 suppliers, 3 negative
    bals = [(0, 100.5), (0, 900.0), (0, 50.25), (0, 10.0),
            (1, -500.75), (1, -20.0), (1, -999.99), (1, 300.0), (1, 5.5)]
    n = len(bals)
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(1, n + 1, dtype=np.int64)),
                "s_name": pa.array(
                    [f"Supplier#{k:09d}" for k in range(1, n + 1)]
                ),
                "s_nationkey": pa.array(
                    np.array([b[0] for b in bals], np.int64)
                ),
                "s_acctbal": pa.array(np.array([b[1] for b in bals])),
            }
        ),
        tmp_path / "supplier.parquet",
    )

    got = (
        supplier_credit_map(str(tmp_path))
        .to_pandas()
        .set_index("nation")
        .sort_index()
    )
    names = ["SOLVENT", "DISTRESSED"]
    per = collections.defaultdict(list)
    for nk, bal in bals:
        per[names[nk]].append(int(np.floor(bal)))
    for nat, bs in per.items():
        row = got.loc[nat]
        neg = sum(1 for b in bs if b < 0)
        assert row["n_suppliers"] == len(bs)
        assert row["n_negative"] == neg
        assert row["risk_permille"] == 1000 * neg // len(bs)
        assert row["worst_balance"] == min(bs)
        assert row["net_balance"] == sum(bs)
    assert got.loc["DISTRESSED", "risk_permille"] == 600
    assert got.loc["SOLVENT", "n_negative"] == 0
