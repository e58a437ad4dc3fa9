"""Round-3 grouped/ordered aggregates: OHLC rollup (first/last by order),
grouped top-k, and grid_lag (finite difference over the dense grid) — each
checked against a scalar brute-force reference on synthetic inputs hitting
the edge cases (equal-ts ties, value ties, window/halo crossings, each
source's first grid bucket)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


def test_ohlc_rollup_matches_bruteforce(ray_session):
    import ray.data as rd

    from mq_to_db_ray.stages.rollup import ohlc_rollup

    g = _rng(11)
    n = 600
    t0 = 1_000_000_000_000
    tier_us = 60 * 1_000_000
    src = np.array(["s%d" % i for i in g.integers(0, 4, n)])
    ts = t0 + g.integers(0, 40 * tier_us, n).astype(np.int64)
    # force equal-ts ties (order_id must break them)
    ts[:20] = ts[0]
    src[:20] = "s0"
    oid = np.arange(n, dtype=np.int64)
    g.shuffle(oid)  # order_id uncorrelated with row order
    v = g.integers(-100, 100, n).astype(np.int64)

    ds = rd.from_arrow(
        pa.table({"source": src, "ts_us": ts, "order_id": oid, "v": v})
    )
    got = (
        ohlc_rollup(ds, "1m", t0_us=t0, k=8)
        .to_pandas()
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )

    # brute force
    import collections

    groups = collections.defaultdict(list)
    for i in range(n):
        b = (ts[i] - t0) // tier_us
        groups[(src[i], b)].append((ts[i], oid[i], v[i]))
    assert len(got) == len(groups)
    for _, row in got.iterrows():
        b = (row["bucket_ts"].value // 1000 - t0) // tier_us  # ns -> us
        rows = groups[(row["source"], b)]
        rows_sorted = sorted(rows)  # by (ts, oid)
        assert row["open"] == rows_sorted[0][2]
        assert row["close"] == rows_sorted[-1][2]
        assert row["high"] == max(r[2] for r in rows)
        assert row["low"] == min(r[2] for r in rows)


def test_grouped_topk_matches_bruteforce(ray_session):
    import ray.data as rd

    from mq_to_db_ray.stages.shuffle import grouped_topk

    g = _rng(13)
    n = 500
    key = g.integers(0, 30, n).astype(np.int64)
    val = g.integers(0, 10, n).astype(np.int64)  # many value ties
    oid = np.arange(n, dtype=np.int64)

    ds = rd.from_arrow(pa.table({"u": key, "v": val, "o": oid}))
    got = (
        grouped_topk(ds, key="u", value="v", order_id="o", kk=3, k=8)
        .to_pandas()
        .sort_values(["u", "rank"])
        .reset_index(drop=True)
    )

    import collections

    per = collections.defaultdict(list)
    for i in range(n):
        per[key[i]].append((-val[i], oid[i]))
    expect = []
    for u in sorted(per):
        for r, (nv, o) in enumerate(sorted(per[u])[:3], start=1):
            expect.append((u, -nv, o, r))
    assert len(got) == len(expect)
    for row, (u, v, o, r) in zip(got.itertuples(index=False), expect):
        assert (row.u, row.v, row.o, row.rank) == (u, v, o, r)


@pytest.mark.parametrize("window_buckets", [8, 4096])
def test_grid_lag_matches_lag_semantics(ray_session, window_buckets):
    import ray.data as rd

    from mq_to_db_ray.stages.temporal import grid_lag

    g = _rng(17)
    t0 = 500_000_000_000
    tier_us = 60 * 1_000_000
    # dense grids with different extents per source (crosses window
    # boundaries at window_buckets=8)
    rows = []
    for s, (lo, hi) in {"a": (0, 37), "b": (5, 9), "c": (20, 20)}.items():
        for idx in range(lo, hi + 1):
            rows.append((s, t0 + idx * tier_us, int(g.integers(0, 50))))
    src = pa.array([r[0] for r in rows])
    bts = pa.array([r[1] for r in rows], pa.int64()).cast(pa.timestamp("us"))
    cnt = pa.array([r[2] for r in rows], pa.int64())
    ds = rd.from_arrow(pa.table({"source": src, "bucket_ts": bts, "count": cnt}))

    got = (
        grid_lag(ds, "1m", ["count"], t0_us=t0, window_buckets=window_buckets)
        .to_pandas()
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(rows)
    by_src = {}
    for s, t, c in rows:
        by_src.setdefault(s, {})[t] = c
    for row in got.itertuples(index=False):
        t_us = row.bucket_ts.value // 1000
        prev = by_src[row.source].get(t_us - tier_us)
        assert row.count == by_src[row.source][t_us]
        if prev is None:
            assert row.lag_count is None or np.isnan(row.lag_count)
        else:
            assert int(row.lag_count) == prev


@pytest.mark.parametrize("window_buckets", [8, 4096])
def test_grid_cumsum_matches_window_semantics(ray_session, window_buckets):
    import ray.data as rd

    from mq_to_db_ray.stages.temporal import grid_cumsum

    g = _rng(23)
    t0 = 700_000_000_000
    tier_us = 60 * 1_000_000
    rows = []
    for s, (lo, hi) in {"a": (0, 41), "b": (3, 11)}.items():
        for idx in range(lo, hi + 1):
            rows.append((s, t0 + idx * tier_us, int(g.integers(0, 9))))
    ds = rd.from_arrow(
        pa.table(
            {
                "source": pa.array([r[0] for r in rows]),
                "bucket_ts": pa.array([r[1] for r in rows], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "count": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    )
    got = (
        grid_cumsum(ds, "1m", ["count"], t0_us=t0,
                    window_buckets=window_buckets)
        .to_pandas()
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(rows)
    running = {}
    for (s, t, c), row in zip(sorted(rows), got.itertuples(index=False)):
        running[s] = running.get(s, 0) + c
        assert (row.source, row.bucket_ts.value // 1000, row.count) == (s, t, c)
        assert row.cum_count == running[s]


def test_events_quantiles_rank_semantics(ray_session, tmp_path):
    """Per-bucket p50/p95 with quantile_disc rank semantics (smallest
    value whose cumulative count >= ceil(q*n)) vs brute force."""
    import pyarrow.parquet as pq

    from mq_to_db_ray.pipelines.events import EVENTS_T0_US, events_quantiles_1m

    g = _rng(29)
    n = 800
    tier_us = 60 * 1_000_000
    types = np.array(["a", "b", "c"])[g.integers(0, 3, n)]
    ts = EVENTS_T0_US + g.integers(0, 12 * tier_us, n).astype(np.int64)
    val = g.integers(0, 40, n).astype(np.float64) + 0.5  # floor matters
    tbl = pa.table(
        {
            "event_type": pa.array(types.tolist()),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(val),
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")

    got = (
        events_quantiles_1m(str(tmp_path))
        .to_pandas()
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )
    import collections
    import math

    groups = collections.defaultdict(list)
    for i in range(n):
        groups[(types[i], (ts[i] - EVENTS_T0_US) // tier_us)].append(
            int(val[i])
        )
    assert len(got) == len(groups)
    for row in got.itertuples(index=False):
        b = (row.bucket_ts.value // 1000 - EVENTS_T0_US) // tier_us
        vs = sorted(groups[(row.source, b)])
        assert row.count == len(vs)
        for q, gotv in ((0.5, row.p50), (0.95, row.p95)):
            rank = math.ceil(q * len(vs))
            assert gotv == vs[rank - 1], (row.source, b, q)
