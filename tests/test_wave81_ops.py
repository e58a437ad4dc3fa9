"""Round-4 wave-81 operators: E128 minute-load Gini (planted uniform
vs single-spike sources pin the inequality permille), T135/F tape
window-vocabulary board (planted shared/unique motifs pin the
distinct/shared counts), R62 brand cross-sell basket matrix (planted
brand pairs pin the co-occurrence counts) — each vs a scalar
brute-force reference."""

from __future__ import annotations

import collections
import itertools

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _gini_permille(xs: list[int]) -> int:
    xs = sorted(xs)
    n = len(xs)
    sx = sum(xs)
    srx = sum(i * x for i, x in enumerate(xs, 1))
    return (1000 * (2 * srx - (n + 1) * sx)) // (n * sx)


def test_events_load_gini_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_load_gini

    g = np.random.default_rng(660)
    base = np.datetime64("2026-03-02", "us").astype(np.int64)
    MIN = 60_000_000
    et, ts = [], []
    # "uniform": 50 minutes x 4 events -> gini 0
    for m in range(50):
        for _ in range(4):
            et.append("uniform")
            ts.append(base + m * MIN + int(g.integers(0, MIN)))
    # "spiky": one minute with 96 events + 4 minutes with 1
    for _ in range(96):
        et.append("spiky")
        ts.append(base + 3 * MIN + int(g.integers(0, MIN)))
    for m in (10, 20, 30, 40):
        et.append("spiky")
        ts.append(base + m * MIN + 5)
    # bulk
    for _ in range(700):
        et.append("rand")
        ts.append(base + int(g.integers(0, 2000)) * MIN + int(g.integers(0, MIN)))
    n = len(et)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(et),
                "ts": pa.array(np.array(ts, np.int64)).cast(
                    pa.timestamp("us")
                ),
                "value": pa.array(np.ones(n)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.ones(n, np.int64)),
            }
        ),
        tmp_path / "events.parquet",
    )

    per_min = collections.Counter((s, t // MIN) for s, t in zip(et, ts))
    loads = collections.defaultdict(list)
    for (s, _), c in per_min.items():
        loads[s].append(c)

    got = events_load_gini(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(loads)
    for s, xs in loads.items():
        row = got.loc[s]
        assert row["active_minutes"] == len(xs)
        assert row["n_events"] == sum(xs)
        assert row["gini_permille"] == _gini_permille(xs)
    assert got.loc["uniform", "gini_permille"] == 0
    assert got.loc["spiky", "gini_permille"] > 700


def test_f1_window_vocab_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import tape_window_vocab

    g = np.random.default_rng(661)
    shared = [1, 2, 3, 4]       # motif in both sources
    only_a = [5, 6, 7, 8]
    only_b = [9, 10, 11, 12]
    rows = []
    for _ in range(6):
        rows.append(("srcA", shared + only_a))   # 5 windows each
    for _ in range(4):
        rows.append(("srcB", shared + only_b))
    for _ in range(60):
        rows.append(
            ("rand", [int(x) for x in g.integers(0, 30, g.integers(0, 20))])
        )
    rows.append(("srcA", [7]))  # short: zero windows
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(
                    [f"s00-{i:08d}" for i in range(len(rows))]
                ),
                "tokens": pa.array(
                    [r[1] for r in rows], pa.list_(pa.int32())
                ),
                "n_tok": pa.array(
                    [len(r[1]) for r in rows], pa.int64()
                ),
                "source": pa.array([r[0] for r in rows]),
            }
        ),
        tmp_path / "part-000.parquet",
    )

    occ = collections.Counter()
    for s, t in rows:
        for i in range(max(len(t) - 3, 0)):
            occ[(s, tuple(t[i : i + 4]))] += 1
    by_w = collections.defaultdict(set)
    for (s, w), _ in occ.items():
        by_w[w].add(s)
    want = collections.defaultdict(lambda: [0, 0, 0])
    for (s, w), c in occ.items():
        v = want[s]
        v[0] += c
        v[1] += 1
        v[2] += 1 if len(by_w[w]) >= 2 else 0

    got = tape_window_vocab(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(want)
    for s, v in want.items():
        row = got.loc[s]
        assert row["n_windows"] == v[0]
        assert row["n_distinct"] == v[1]
        assert row["n_shared"] == v[2]
        assert row["shared_permille"] == 1000 * v[2] // max(v[1], 1)
    # the shared motif's window (1,2,3,4) is the only cross-source one
    # between srcA and srcB
    assert got.loc["srcB", "n_shared"] >= 1


def test_rel_brand_cross_sell_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import brand_cross_sell

    g = np.random.default_rng(662)
    n_part = 60
    brands = [f"B#{i}" for i in range(5)]
    pbrand = [brands[int(g.integers(0, 5))] for _ in range(n_part)]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
                "p_name": pa.array([f"p{i}" for i in range(n_part)]),
                "p_brand": pa.array(pbrand),
                "p_type": pa.array(["T"] * n_part),
                "p_size": pa.array(np.ones(n_part, np.int64)),
                "p_retailprice": pa.array(np.ones(n_part)),
            }
        ),
        tmp_path / "part.parquet",
    )
    ok_col, pk_col = [], []
    for o in range(300):
        for pk in g.choice(n_part, size=int(g.integers(1, 6)), replace=True):
            ok_col.append(o)
            pk_col.append(int(pk))
    nl = len(ok_col)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(ok_col, pa.int64()),
                "l_partkey": pa.array(pk_col, pa.int64()),
                "l_suppkey": pa.array(np.ones(nl, np.int64)),
                "l_quantity": pa.array(np.ones(nl)),
                "l_extendedprice": pa.array(np.ones(nl)),
                "l_discount": pa.array(np.zeros(nl)),
                "l_tax": pa.array(np.zeros(nl)),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    per_order = collections.defaultdict(set)
    for o, pk in zip(ok_col, pk_col):
        per_order[o].add(pbrand[pk])
    want = collections.Counter()
    for bs in per_order.values():
        for a, b in itertools.combinations(sorted(bs), 2):
            want[(a, b)] += 1

    got = brand_cross_sell(str(tmp_path)).to_pandas()
    got = got.set_index(["brand_a", "brand_b"]).sort_index()
    assert list(got.index) == sorted(want)
    for (a, b), c in want.items():
        assert got.loc[(a, b), "n_orders"] == c
