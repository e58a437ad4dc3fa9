"""Round-4 wave-93 operators: E140 stuck-value detector (a planted
frozen-gauge source pins the equal-pair count across window
boundaries), T147 per-dimension embedding sign profile (planted
all-positive / all-negative / sparse dimensions pin the counts), R74
part-type commerce board (planted returned lines pin the permille) —
each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY = 86_400_000_000
HOUR = 3_600_000_000


def test_events_stuck_values_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_stuck_values

    g = np.random.default_rng(780)
    base = np.datetime64("2026-05-01", "us").astype(np.int64)
    et, ts, val = [], [], []
    # "frozen": same value always, spread over 10 days so pairs cross
    # the default 1-day carry windows -> n_equal == n_pairs
    for i in range(40):
        et.append("frozen")
        ts.append(base + i * (6 * HOUR))
        val.append(42.5)
    # "alive": strictly increasing values -> zero equal pairs
    for i in range(30):
        et.append("alive")
        ts.append(base + i * HOUR)
        val.append(float(i) + 0.25)
    # "mixed": random small-int values -> brute force decides
    for i in range(300):
        et.append("mixed")
        ts.append(base + int(g.integers(0, 10 * DAY)))
        val.append(float(g.integers(0, 4)))
    n = len(et)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(et),
                "ts": pa.array(np.array(ts, np.int64)).cast(
                    pa.timestamp("us")
                ),
                "value": pa.array(val),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.zeros(n, np.int64)),
            }
        ),
        tmp_path / "events.parquet",
    )

    rows = sorted(zip(et, ts, range(n), val), key=lambda r: (r[1], r[2]))
    per = collections.defaultdict(list)
    for s, _, _, v in rows:
        per[s].append(v)
    want = {}
    for s, vs in per.items():
        pairs = len(vs) - 1
        eq = sum(1 for a, b in zip(vs, vs[1:]) if a == b)
        want[s] = (pairs, eq)

    # small window to force many carry hops
    got = events_stuck_values(str(tmp_path), window_us=12 * HOUR).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(want)
    for s, (pairs, eq) in want.items():
        row = got.loc[s]
        assert row["n_pairs"] == pairs, (s, row["n_pairs"], pairs)
        assert row["n_equal"] == eq, (s, row["n_equal"], eq)
        assert row["stuck_permille"] == 1000 * eq // max(pairs, 1)
    assert got.loc["frozen", "n_equal"] == 39
    assert got.loc["alive", "n_equal"] == 0


def test_embedding_sign_profile_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import embedding_sign_profile

    g = np.random.default_rng(781)
    n, d = 200, 8
    m = g.normal(size=(n, d)).astype(np.float32)
    m[:, 0] = np.abs(m[:, 0]) + 0.1     # dim 1: all positive
    m[:, 1] = -np.abs(m[:, 1]) - 0.1    # dim 2: all negative
    m[:100, 2] = 0.0                    # dim 3: half exact zeros
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(
                    [r for r in m.tolist()], pa.list_(pa.float32())
                ),
                "label": pa.array(np.zeros(n, np.int32)),
            }
        ),
        tmp_path / "embeddings.parquet",
    )

    got = embedding_sign_profile(str(tmp_path)).to_pandas()
    got = got.set_index("dim").sort_index()
    assert list(got.index) == list(range(1, d + 1))
    md = m.astype(np.float64)
    for j in range(d):
        row = got.loc[j + 1]
        assert row["n_pos"] == int((md[:, j] > 0).sum())
        assert row["n_neg"] == int((md[:, j] < 0).sum())
        assert row["n_zero"] == int((md[:, j] == 0).sum())
        assert row["pos_permille"] == 1000 * int((md[:, j] > 0).sum()) // n
    assert got.loc[1, "n_pos"] == n
    assert got.loc[2, "n_neg"] == n
    assert got.loc[3, "n_zero"] == 100


def test_rel_type_revenue_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import type_revenue

    g = np.random.default_rng(782)
    n_part = 40
    ptypes = ["PROMO", "STANDARD", "ECONOMY"]
    pt = [ptypes[int(g.integers(0, 3))] for _ in range(n_part)]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
                "p_name": pa.array([f"p{i}" for i in range(n_part)]),
                "p_brand": pa.array(["Brand#1"] * n_part),
                "p_type": pa.array(pt),
                "p_size": pa.array(np.ones(n_part, np.int32)),
                "p_retailprice": pa.array(np.ones(n_part)),
            }
        ),
        tmp_path / "part.parquet",
    )
    n_line = 600
    lk = g.integers(0, n_part, n_line)
    qty = g.integers(1, 50, n_line).astype(np.float64)
    ext = g.uniform(100, 9000, n_line)
    dis = g.integers(0, 10, n_line) / 100.0
    # PROMO lines return often
    rflag = [
        "R" if (pt[k] == "PROMO" and g.random() < 0.5)
        or g.random() < 0.1 else ("N" if g.random() < 0.5 else "A")
        for k in lk
    ]
    base = np.datetime64("2025-06-01", "us").astype(np.int64)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(n_line, dtype=np.int64)),
                "l_partkey": pa.array(lk, pa.int64()),
                "l_suppkey": pa.array(np.zeros(n_line, np.int64)),
                "l_linenumber": pa.array(np.ones(n_line, np.int32)),
                "l_quantity": pa.array(qty),
                "l_extendedprice": pa.array(ext),
                "l_discount": pa.array(dis),
                "l_tax": pa.array(np.zeros(n_line)),
                "l_returnflag": pa.array(rflag),
                "l_linestatus": pa.array(["O"] * n_line),
                "l_shipdate": pa.array(
                    base + g.integers(0, 200, n_line) * DAY
                ).cast(pa.timestamp("us")),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    want = collections.defaultdict(lambda: [0, 0, 0, 0])
    for i in range(n_line):
        w = want[pt[lk[i]]]
        w[0] += 1
        w[1] += int(np.floor(qty[i]))
        w[2] += int(np.floor(ext[i] * (1.0 - dis[i])))
        w[3] += 1 if rflag[i] == "R" else 0

    got = type_revenue(str(tmp_path)).to_pandas()
    got = got.set_index("p_type").sort_index()
    assert list(got.index) == sorted(set(pt))
    for ty, w in want.items():
        row = got.loc[ty]
        assert row["n_lines"] == w[0]
        assert row["qty_floor"] == w[1]
        assert row["revenue_floor"] == w[2]
        assert row["returned_permille"] == 1000 * w[3] // max(w[0], 1)
    assert (
        got.loc["PROMO", "returned_permille"]
        > got.loc["STANDARD", "returned_permille"]
    )
