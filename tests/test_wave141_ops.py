"""Round-4 wave-141 operators: E188 user resurrection trend (planted
30d win-backs pin per-week counts; same-day repeats dedupe), T195
embedding energy-drift sufficient stats (planted checkpoint swap pins
the slope inputs), R122 position-quantity profile (planted basket-head
gradient pins each position) — each vs a scalar brute-force
reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_resurrection_trend_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_resurrection_trend

    day_us = 86_400_000_000
    d0 = 20_600  # epoch day
    rows = []  # (user, day)
    # user 1: active d0, d0+1, then resurrected at d0+45
    rows += [(1, d0), (1, d0), (1, d0 + 1), (1, d0 + 45)]
    # user 2: steady weekly (never 30d apart)
    for w in range(5):
        rows.append((2, d0 + w * 7))
    # user 3: two resurrections (gaps 40 and 35)
    rows += [(3, d0), (3, d0 + 40), (3, d0 + 75)]
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(["t"] * n),
                "ts": pa.array(
                    np.array(
                        [r[1] * day_us + i for i, r in enumerate(rows)],
                        np.int64,
                    )
                ).cast(pa.timestamp("us")),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(
                    np.array([r[0] for r in rows], np.int64)
                ),
                "value": pa.array(np.ones(n)),
            }
        ),
        tmp_path / "events.parquet",
    )

    got = (
        events_resurrection_trend(str(tmp_path))
        .to_pandas()
        .set_index("week")
        .sort_index()
    )
    per = collections.defaultdict(set)
    for u, d in rows:
        per[u].add(d)
    want = collections.defaultdict(lambda: [0, 0])
    for u, days in per.items():
        ds_ = sorted(days)
        for a, b in zip(ds_, ds_[1:]):
            wk = b // 7
            want[wk][0] += 1
            if b - a >= 30:
                want[wk][1] += 1
    assert sorted(got.index) == sorted(want)
    for wk, (nrep, nres) in want.items():
        row = got.loc[wk]
        assert row["n_repeat_days"] == nrep
        assert row["n_resurrections"] == nres
        assert row["resurrection_permille"] == 1000 * nres // nrep
    assert sum(v[1] for v in want.values()) == 3  # the planted win-backs


def test_embedding_energy_drift_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import energy_drift

    g = np.random.default_rng(877)
    vecs, vids = [], []
    # first half (ids 0..19): small components -> energy ~0
    for i in range(20):
        vecs.append(list(map(float, g.uniform(-0.5, 0.5, 8))))
        vids.append(i)
    # second half (ids 100..119): big components -> energy ~8
    for i in range(20):
        vecs.append(list(map(float, g.uniform(2.0, 5.0, 8))))
        vids.append(100 + i)
    n = len(vecs)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.array(vids, np.int64)),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array(np.zeros(n, np.int32)),
            }
        ),
        tmp_path / "embeddings.parquet",
    )

    got = energy_drift(str(tmp_path)).to_pandas()
    assert len(got) == 1
    row = got.iloc[0]
    arr = np.array(
        pq.read_table(tmp_path / "embeddings.parquet")["embedding"]
        .combine_chunks()
        .flatten()
    ).reshape(n, 8)
    ec = (np.abs(arr) > 1.0).sum(axis=1).astype(int)
    i = np.array(vids)
    assert row["n_vectors"] == n
    assert row["sum_i"] == int(i.sum())
    assert row["sum_i_sq"] == int((i * i).sum())
    assert row["sum_e"] == int(ec.sum())
    assert row["sum_e_sq"] == int((ec * ec).sum())
    assert row["sum_i_e"] == int((i * ec).sum())
    # the drift: covariance strictly positive by construction
    cov = n * row["sum_i_e"] - row["sum_i"] * row["sum_e"]
    assert cov > 0


def test_rel_position_quantity_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import position_quantity_profile

    g = np.random.default_rng(879)
    ln, qty, ep, dc = [], [], [], []
    # basket-head gradient: position 1 lines carry qty ~30, pos 2 ~15,
    # pos 3 ~5
    for pos, base_q, cnt in ((1, 30, 40), (2, 15, 30), (3, 5, 20)):
        for _ in range(cnt):
            ln.append(pos)
            qty.append(float(base_q + g.integers(0, 3)))
            ep.append(float(g.uniform(50, 500)))
            dc.append(float(g.integers(0, 10)) / 100.0)
    n = len(ln)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "l_partkey": pa.array(np.ones(n, np.int64)),
                "l_suppkey": pa.array(np.ones(n, np.int64)),
                "l_linenumber": pa.array(np.array(ln, np.int32)),
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

    want = collections.defaultdict(lambda: [0, 0, 0])
    for p, q, e, d in zip(ln, qty, ep, dc):
        c = want[p]
        c[0] += 1
        c[1] += int(np.floor(q))
        c[2] += int(np.floor(e * (1.0 - d)))
    got = (
        position_quantity_profile(str(tmp_path))
        .to_pandas()
        .set_index("l_linenumber")
        .sort_index()
    )
    assert sorted(got.index) == sorted(want)
    for pos, (nl_, q, r) in want.items():
        row = got.loc[pos]
        assert row["n_lines"] == nl_
        assert row["qty_floor"] == q
        assert row["revenue_floor"] == r
    # the gradient: mean qty falls with position
    assert (
        got.loc[1, "qty_floor"] * got.loc[2, "n_lines"]
        > got.loc[2, "qty_floor"] * got.loc[1, "n_lines"]
    )
