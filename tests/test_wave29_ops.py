"""Round-4 wave-29 operators: E86 record-high board (distributed prefix
MAX — the fixture uses a window small enough that records must cross
window boundaries through the broadcast base), T75 per-dimension
embedding profile (exact float min/max), R16 banded disjunctive-predicate
revenue (Q19's OR-of-ANDs spanning both join sides; one fixture line
falls in TWO arms' bands, so the mask must carry both) — each vs a
scalar brute-force reference."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MIN_US = 60_000_000


def test_record_minutes_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import (
        EVENTS_T0_US,
        events_record_minutes,
    )

    g = np.random.default_rng(170)
    n = 2000
    types = np.array(["a", "b"])[g.integers(0, 2, n)]
    minute = np.sort(g.integers(0, 600, n).astype(np.int64))
    ts = EVENTS_T0_US + minute * MIN_US + g.integers(0, 60, n) * 1_000_000
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

    counts = collections.defaultdict(collections.Counter)
    for t, m in zip(types, minute):
        counts[t][int(m)] += 1
    want = {}
    for t, cnt in counts.items():
        best, n_rec, peak, peak_at = -1, 0, 0, None
        for m in sorted(cnt):
            if cnt[m] > best:
                n_rec += 1
                best = cnt[m]
            if cnt[m] > peak:
                peak, peak_at = cnt[m], m
        want[t] = (n_rec, peak, peak_at)

    # default window AND a tiny window (records must cross windows)
    for w in (4096, 16):
        got = (
            events_record_minutes(str(tmp_path), window_buckets=w)
            .to_pandas()
            .set_index("source")
        )
        assert len(got) == len(want), w
        for t, (nr, pk, pat) in want.items():
            r = got.loc[t]
            assert (r.n_records, r.peak) == (nr, pk), (t, w)
            assert (
                np.datetime64(r.peak_ts, "us").astype(np.int64)
                - EVENTS_T0_US
            ) // MIN_US == pat, (t, w)


def test_embedding_dim_profile_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import embedding_dim_profile

    g = np.random.default_rng(171)
    n, d = 300, 8
    vecs = g.normal(size=(n, d)).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(
                    list(vecs), pa.list_(pa.float32())
                ),
                "label": pa.array(np.zeros(n, np.int32)),
            }
        ),
        tmp_path / "embeddings.parquet",
    )

    got = embedding_dim_profile(str(tmp_path)).to_pandas().set_index("dim")
    assert len(got) == d
    for j in range(d):
        r = got.loc[j + 1]
        assert r.n_vecs == n
        assert r.min_x == float(np.float64(vecs[:, j].min()))
        assert r.max_x == float(np.float64(vecs[:, j].max()))


def test_banded_revenue_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import banded_revenue

    g = np.random.default_rng(172)
    n_parts, n_lines = 50, 1000
    brands = np.array(["Brand#1", "Brand#2", "Brand#3", "Brand#9"])[
        g.integers(0, 4, n_parts)
    ]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n_parts, dtype=np.int64)),
                "p_name": pa.array([f"p{i}" for i in range(n_parts)]),
                "p_brand": pa.array(brands.tolist()),
                "p_type": pa.array(["STANDARD"] * n_parts),
                "p_size": pa.array(np.ones(n_parts, np.int32)),
                "p_retailprice": pa.array(np.ones(n_parts)),
            }
        ),
        tmp_path / "part.parquet",
    )
    pk = g.integers(0, n_parts, n_lines)
    # qty 10-11 falls in BOTH Brand#1's [1,11] and Brand#2's [10,20]
    qty = g.integers(1, 35, n_lines).astype(np.float64)
    ext = g.uniform(1.0, 2000.0, n_lines)
    dis = g.integers(0, 11, n_lines) / 100.0
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(n_lines, dtype=np.int64)),
                "l_partkey": pa.array(pk, pa.int64()),
                "l_suppkey": pa.array(np.zeros(n_lines, np.int64)),
                "l_linenumber": pa.array(np.ones(n_lines, np.int32)),
                "l_quantity": pa.array(qty),
                "l_extendedprice": pa.array(ext),
                "l_discount": pa.array(dis),
                "l_tax": pa.array(np.zeros(n_lines)),
                "l_returnflag": pa.array(["N"] * n_lines),
                "l_linestatus": pa.array(["O"] * n_lines),
                "l_shipdate": pa.array(
                    np.full(n_lines, 800000000000000), pa.int64()
                ).cast(pa.timestamp("us")),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    arms = [("Brand#1", 1, 11), ("Brand#2", 10, 20), ("Brand#3", 20, 30)]
    want = {a[0]: [0, 0] for a in arms}
    overlap = 0
    for i in range(n_lines):
        q = qty[i]
        in_arms = [
            a for a in arms
            if brands[pk[i]] == a[0] and a[1] <= q <= a[2]
        ]
        n_bands = sum(1 for a in arms if a[1] <= q <= a[2])
        overlap += n_bands > 1
        for a in in_arms:
            w = want[a[0]]
            w[0] += 1
            w[1] += int(math.floor(ext[i] * (1.0 - dis[i])))
    assert overlap > 0  # band overlap is exercised
    assert all(w[0] > 0 for w in want.values())

    got = banded_revenue(str(tmp_path)).to_pandas().set_index("p_brand")
    assert len(got) == 3
    for br, (nl, rv) in want.items():
        r = got.loc[br]
        assert (r.n_lines, r.revenue_floor) == (nl, rv), br
