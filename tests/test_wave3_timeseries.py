"""Round-4 third-wave timeseries operators: time-weighted (LOCF) average,
rolling z-score anomaly flags, cumulative histogram rollup, hourly top
movers — each vs a scalar brute-force reference on synthetic events that
hit the edge cases (duplicate timestamps, zero-length segments, carried
prefixes across tiny windows, abs-delta ties)."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pytest


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


def _write_events(tmp_path, seed: int, n: int = 900, minutes: int = 40):
    """Synthetic events.parquet: 3 sources, duplicate timestamps forced."""
    import pyarrow.parquet as pq

    from mq_to_db_ray.pipelines.events import EVENTS_T0_US

    g = _rng(seed)
    tier_us = 60 * 1_000_000
    types = np.array(["a", "b", "c"])[g.integers(0, 3, n)]
    ts = EVENTS_T0_US + g.integers(0, minutes * tier_us, n).astype(np.int64)
    # duplicate-(source, ts) pairs: zero-length segments must drop cleanly
    ts[1] = ts[0]
    types[1] = types[0]
    ts[5:8] = ts[4]
    types[5:8] = types[4]
    val = g.integers(0, 600, n).astype(np.float64) + 0.25
    tbl = pa.table(
        {
            "event_type": pa.array(types.tolist()),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(val),
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(g.integers(0, 50, n).astype(np.int64)),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    return types, ts, np.floor(val).astype(np.int64)


@pytest.mark.parametrize("window_us", [5 * 60 * 1_000_000, 86_400_000_000])
def test_twa_matches_bruteforce(ray_session, tmp_path, window_us):
    """window_us=5min forces segments to span many carried-prefix windows;
    1 day is the single-window fast case.  Results must be identical."""
    from mq_to_db_ray.pipelines.events import events_twa_1m

    types, ts, vals = _write_events(tmp_path, seed=41)
    tier_us = 60 * 1_000_000

    want: dict[tuple[str, int], int] = collections.defaultdict(int)
    for s in np.unique(types):
        idx = np.flatnonzero(types == s)
        order = idx[np.lexsort((idx, ts[idx]))]  # (ts, event_id)
        for a, b in zip(order[:-1], order[1:]):
            t0, t1, v = int(ts[a]), int(ts[b]), int(vals[a])
            if t1 <= t0:
                continue
            for bk in range(t0 // tier_us, (t1 - 1) // tier_us + 1):
                lo = max(t0, bk * tier_us)
                hi = min(t1, (bk + 1) * tier_us)
                want[(s, bk)] += v * (hi - lo)

    got = (
        events_twa_1m(str(tmp_path), window_us=window_us)
        .to_pandas()
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for row in got.itertuples(index=False):
        bk = row.bucket_ts.value // 1000 // tier_us
        assert row.wsum_us == want[(row.source, bk)], (row.source, bk)


def test_zscore_matches_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_zscore_1m

    types, ts, _ = _write_events(tmp_path, seed=43)
    tier_us = 60 * 1_000_000
    w, z = 4, 3

    counts: dict[tuple[str, int], int] = collections.defaultdict(int)
    for s, t in zip(types, ts):
        counts[(s, t // tier_us)] += 1

    got = (
        events_zscore_1m(str(tmp_path), w=w, z=z)
        .to_pandas()
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )
    # brute force over each source's dense grid
    want = {}
    for s in np.unique(types):
        bks = [b for (s2, b) in counts if s2 == s]
        lo, hi = min(bks), max(bks)
        series = [counts.get((s, b), 0) for b in range(lo, hi + 1)]
        for i, x in enumerate(series):
            win = series[max(0, i - w + 1): i + 1]
            n, sm, ss = len(win), sum(win), sum(v * v for v in win)
            lhs = n * x - sm
            want[(s, lo + i)] = (x, sm, lhs * lhs > z * z * (n * ss - sm * sm))
    assert len(got) == len(want)
    for row in got.itertuples(index=False):
        bk = row.bucket_ts.value // 1000 // tier_us
        x, sm, flag = want[(row.source, bk)]
        assert (row.count, row.trail_sum, bool(row.anomaly)) == (x, sm, flag)


def test_hist_cumulative_and_zero_bins(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import (
        HIST_BOUNDS,
        HIST_INF,
        events_hist_1m,
    )

    types, ts, vals = _write_events(tmp_path, seed=47)
    tier_us = 60 * 1_000_000
    les = list(HIST_BOUNDS) + [HIST_INF]

    got = events_hist_1m(str(tmp_path)).to_pandas()
    groups: dict[tuple[str, int], list[int]] = collections.defaultdict(list)
    for s, t, v in zip(types, ts, vals):
        groups[(s, t // tier_us)].append(int(v))
    # every bucket emits exactly len(les) rows, including zero bins
    assert len(got) == len(groups) * len(les)
    by_bucket = got.groupby(["source", "bucket_ts"])
    for (s, bts), sub in by_bucket:
        bk = bts.value // 1000 // tier_us
        vs = groups[(s, bk)]
        sub = sub.sort_values("le").reset_index(drop=True)
        assert list(sub["le"]) == les
        for le, cum in zip(sub["le"], sub["cum_count"]):
            assert cum == sum(1 for v in vs if v <= le), (s, bk, le)
        assert sub["cum_count"].iloc[-1] == len(vs)


def test_top_movers_tiebreak_and_rank(ray_session, tmp_path):
    """Deterministic ties: equal |delta| breaks by source ascending."""
    import pyarrow.parquet as pq

    from mq_to_db_ray.pipelines.events import EVENTS_T0_US, events_top_movers_1h

    hour_us = 3600 * 1_000_000
    # 4 sources, 3 hours; hour1 deltas: a:+2, b:-2, c:+2, d:0 -> ranks
    # a(1), c(2) tie 2 broken by source; b also |2| -> order a,b,c by source
    plan = {
        "a": [1, 3, 3],
        "b": [3, 1, 1],
        "c": [2, 4, 4],
        "d": [5, 5, 5],
    }
    rows_t, rows_ts = [], []
    eid = 0
    ids = []
    for s, per_hour in plan.items():
        for h, cnt in enumerate(per_hour):
            for j in range(cnt):
                rows_t.append(s)
                rows_ts.append(EVENTS_T0_US + h * hour_us + j * 1000)
                ids.append(eid)
                eid += 1
    tbl = pa.table(
        {
            "event_type": pa.array(rows_t),
            "ts": pa.array(np.array(rows_ts, np.int64), pa.int64()).cast(
                pa.timestamp("us")
            ),
            "value": pa.array(np.ones(len(rows_t))),
            "event_id": pa.array(np.array(ids, np.int64)),
            "user_id": pa.array(np.zeros(len(rows_t), np.int64)),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")

    got = (
        events_top_movers_1h(str(tmp_path))
        .to_pandas()
        .sort_values(["bucket_ts", "rank"])
        .reset_index(drop=True)
    )
    # hour 1: |deltas| a=2 b=2 c=2 d=0 -> top3 = a,b,c (source asc), d out
    h1 = got[got.bucket_ts.map(lambda v: v.value // 1000) == EVENTS_T0_US + hour_us]
    assert list(h1["source"]) == ["a", "b", "c"]
    assert list(h1["rank"]) == [1, 2, 3]
    assert list(h1["abs_delta"]) == [2, 2, 2]
    # hour 2: all deltas zero -> top3 by source asc with abs_delta 0
    h2 = got[got.bucket_ts.map(lambda v: v.value // 1000) == EVENTS_T0_US + 2 * hour_us]
    assert list(h2["source"]) == ["a", "b", "c"]
    assert list(h2["abs_delta"]) == [0, 0, 0]
    # hour 0 has no predecessor anywhere -> absent
    assert not (
        got.bucket_ts.map(lambda v: v.value // 1000) == EVENTS_T0_US
    ).any()
