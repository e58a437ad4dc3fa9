"""Round-4 wave-41 operators: E96 tape-dominance board (win + presence
identities must reconcile with the per-minute mode), T88 consecutive-id
embedding gap histogram (the fixture plants identical neighbors — band
0 — and far ones), R27 line-position profile — each vs a scalar
brute-force reference."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MIN_US = 60_000_000


def test_dominance_share_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import (
        EVENTS_T0_US,
        events_dominance_share,
    )

    g = np.random.default_rng(280)
    n = 1400
    types = np.array(["a", "b", "c"])[g.integers(0, 3, n)]
    minute = g.integers(0, 120, n).astype(np.int64)
    ts = EVENTS_T0_US + minute * MIN_US
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(types.tolist()),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "value": pa.array(np.ones(n)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.zeros(n, np.int64)),
            }
        ),
        tmp_path / "events.parquet",
    )

    per_min = collections.defaultdict(collections.Counter)
    for t, m in zip(types, minute):
        per_min[int(m)][t] += 1
    won = collections.Counter()
    pres = collections.Counter()
    for cnt in per_min.values():
        top = max(cnt.values())
        won[min(t for t, c in cnt.items() if c == top)] += 1
        for t in cnt:
            pres[t] += 1

    got = events_dominance_share(str(tmp_path)).to_pandas().set_index(
        "source"
    )
    assert len(got) == 3
    for t in ("a", "b", "c"):
        r = got.loc[t]
        assert (r.n_won, r.n_present) == (won.get(t, 0), pres[t]), t
        assert r.win_permille == 1000 * won.get(t, 0) // max(pres[t], 1)
    assert int(got.n_won.sum()) == len(per_min)  # every minute has a winner


def test_embedding_neighbor_gaps_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import embedding_neighbor_gap_hist

    g = np.random.default_rng(281)
    n, d = 200, 8
    vecs = g.normal(size=(n, d)).astype(np.float32)
    vecs[50] = vecs[49]  # identical neighbors -> band 0
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
                "label": pa.array(np.zeros(n, np.int32)),
            }
        ),
        tmp_path / "embeddings.parquet",
    )

    want = collections.Counter()
    for i in range(n - 1):
        a = vecs[i].astype(np.float64)
        b = vecs[i + 1].astype(np.float64)
        q = int(sum(int(math.floor(1000.0 * (x - y) ** 2)) for x, y in zip(a, b)))
        want[q // 200] += 1
    assert 0 in want  # the planted identical pair

    got = embedding_neighbor_gap_hist(str(tmp_path)).to_pandas()
    assert {int(r.band): int(r.n_pairs) for r in got.itertuples()} == dict(
        want
    )


def test_linenumber_profile_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import linenumber_profile

    g = np.random.default_rng(282)
    n = 900
    ln = g.integers(1, 8, n).astype(np.int32)
    qty = g.integers(1, 50, n).astype(np.float64)
    ext = g.uniform(10, 3000, n)
    dis = g.integers(0, 11, n) / 100.0
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "l_partkey": pa.array(np.zeros(n, np.int64)),
                "l_suppkey": pa.array(np.zeros(n, np.int64)),
                "l_linenumber": pa.array(ln),
                "l_quantity": pa.array(qty),
                "l_extendedprice": pa.array(ext),
                "l_discount": pa.array(dis),
                "l_tax": pa.array(np.zeros(n)),
                "l_returnflag": pa.array(["N"] * n),
                "l_linestatus": pa.array(["O"] * n),
                "l_shipdate": pa.array(
                    np.full(n, 800000000000000), pa.int64()
                ).cast(pa.timestamp("us")),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    want = collections.defaultdict(lambda: [0, 0, 0])
    for i in range(n):
        w = want[int(ln[i])]
        w[0] += 1
        w[1] += int(qty[i])
        w[2] += int(math.floor(ext[i] * (1.0 - dis[i])))

    got = linenumber_profile(str(tmp_path)).to_pandas().set_index(
        "l_linenumber"
    )
    assert len(got) == len(want)
    for k, (c, q, r) in want.items():
        row = got.loc[k]
        assert (row.n_lines, row.sum_qty, row.revenue_floor) == (c, q, r), k
