"""Round-4 wave-116 operators: E163 second-level microburst histogram
(planted smooth vs flush-batched streams pin every band), T170 grid-cell
population spectrum (planted hot and singleton cells pin the bands), R97
brand price-positioning matrix (planted premium-priced discount-selling
brand pins the mismatch cells) — each vs a scalar brute-force
reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_microburst_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_microburst

    base = np.datetime64("2026-07-01", "us").astype(np.int64)
    sec = 1_000_000
    rows = []  # (source, ts_us)
    # "smooth": one event per second for 10 seconds
    for i in range(10):
        rows.append(("smooth", base + i * sec))
    # "flushy": 12 events on ONE timestamp (clips to band 8), then 3 on
    # another second
    for j in range(12):
        rows.append(("flushy", base + 100 * sec))
    for j in range(3):
        rows.append(("flushy", base + 101 * sec + j * 1000))
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
        events_microburst(str(tmp_path))
        .to_pandas()
        .set_index(["source", "load_band"])
        .sort_index()
    )
    per = collections.Counter()
    for s, ts in rows:
        per[(s, ts // sec)] += 1
    want = collections.defaultdict(lambda: [0, 0])
    for (s, _), nn in per.items():
        band = min(nn, 8)
        want[(s, band)][0] += 1
        want[(s, band)][1] += nn
    assert set(got.index) == set(want)
    for key, (nsec, ne) in want.items():
        row = got.loc[key]
        assert row["n_seconds"] == nsec
        assert row["n_events"] == ne
    assert got.loc[("smooth", 1), "n_seconds"] == 10
    assert got.loc[("flushy", 8), "n_events"] == 12
    assert got.loc[("flushy", 3), "n_seconds"] == 1


def test_embedding_grid_population_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import grid_population_spectrum

    g = np.random.default_rng(855)
    dim = 8
    vecs = []
    # hot cell: 20 vectors whose first 4 dims quantize to the same cell
    for _ in range(20):
        v = g.normal(size=dim)
        v[:4] = [0.1, 0.1, 0.1, 0.1] + g.uniform(0, 0.12, 4)
        vecs.append(list(map(float, v)))
    # mid cell: 3 vectors
    for _ in range(3):
        v = g.normal(size=dim)
        v[:4] = [2.3, 2.3, 2.3, 2.3]
        vecs.append(list(map(float, v)))
    # singletons: far apart
    for i in range(5):
        v = g.normal(size=dim)
        v[:4] = [10.0 + 3 * i, -9.0 - i, 5.0 + 2 * i, -7.0 - 2 * i]
        vecs.append(list(map(float, v)))
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

    arr = np.array(
        pq.read_table(tmp_path / "embeddings.parquet")["embedding"]
        .combine_chunks()
        .flatten()
    ).reshape(n, dim)
    cells = collections.Counter(
        tuple(np.floor(4.0 * arr[i, :4].astype(np.float64)).astype(int))
        for i in range(n)
    )
    want = collections.defaultdict(lambda: [0, 0])
    for _, cnt in cells.items():
        band = len(bin(cnt)) - 2
        want[band][0] += 1
        want[band][1] += cnt

    got = (
        grid_population_spectrum(str(tmp_path))
        .to_pandas()
        .set_index("pop_band")
        .sort_index()
    )
    assert sorted(got.index) == sorted(want)
    for band, (nc, nv) in want.items():
        row = got.loc[band]
        assert row["n_cells"] == nc
        assert row["n_vectors"] == nv
    assert got.loc[5, "n_vectors"] == 20   # the hot cell (bin(20)=5 bits)
    assert got.loc[2, "n_vectors"] == 3
    assert got.loc[1, "n_cells"] == 5


def test_rel_brand_price_positioning_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import brand_price_positioning

    # brand P (premium): parts priced ~1500 (band 11) and ~120 (band 7);
    # demand concentrates on the CHEAP band. brand V: all ~500 (band 9).
    parts = [
        (1, "Brand#P", 1500.0),
        (2, "Brand#P", 1600.0),
        (3, "Brand#P", 120.0),
        (4, "Brand#V", 500.0),
        (5, "Brand#V", 510.0),   # never ships
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
                "p_size": pa.array(np.ones(len(parts), np.int64)),
                "p_retailprice": pa.array(
                    np.array([p[2] for p in parts])
                ),
            }
        ),
        tmp_path / "part.parquet",
    )
    lk, qty = [], []
    for pkey, lines_n, q in ((1, 1, 2), (3, 10, 5), (4, 4, 3)):
        for _ in range(lines_n):
            lk.append(pkey)
            qty.append(float(q))
    n = len(lk)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "l_partkey": pa.array(np.array(lk, np.int64)),
                "l_suppkey": pa.array(np.ones(n, np.int64)),
                "l_linenumber": pa.array(np.ones(n, np.int32)),
                "l_quantity": pa.array(np.array(qty)),
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

    per_part = collections.defaultdict(lambda: [0, 0])
    for k, q in zip(lk, qty):
        per_part[k][0] += 1
        per_part[k][1] += int(np.floor(q))
    want = collections.defaultdict(lambda: [0, 0, 0])
    for pkey, brand, rp in parts:
        band = len(bin(int(np.floor(rp)))) - 2
        nl, q = per_part.get(pkey, (0, 0))
        c = want[(brand, band)]
        c[0] += 1
        c[1] += nl
        c[2] += q

    got = (
        brand_price_positioning(str(tmp_path))
        .to_pandas()
        .set_index(["brand", "price_band"])
        .sort_index()
    )
    assert set(got.index) == set(want)
    for key, (np_, nl, q) in want.items():
        row = got.loc[key]
        assert row["n_parts"] == np_
        assert row["n_lines"] == nl
        assert row["qty_floor"] == q
    assert got.loc[("Brand#P", 7), "n_lines"] == 10   # discount demand
    assert got.loc[("Brand#P", 11), "n_lines"] == 1
    assert got.loc[("Brand#V", 9), "n_parts"] == 2
