"""Zipf-skew fixture for the sub-windowed temporal operators (VERDICT r4 #6).

A planted fixture where ONE key owns the overwhelming majority of rows
(Zipf head), with window_us chosen so the hot key's history spans many
(key, window) sub-partitions — exercising the round-4 halo/carried-prefix
machinery in asof_join, sessionize and range_join against brute-force
pandas/numpy references.  The driver-shaped twin of this stress is the
windowed ``events_skew_asof`` queries() entry (oracle-checked at sf0.01).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

WINDOW_US = 1_000_000  # 1s windows; hot key spans ~200 windows


@pytest.fixture(scope="module")
def zipf_events():
    """(left_df, right_df): one hot key owns ~70% of rows on both sides."""
    rng = np.random.default_rng(41)
    n = 30_000
    # Zipf-ish: key 7 is the head; tail spread over 200 keys
    keys = np.where(
        rng.random(n) < 0.7, 7, rng.integers(100, 300, n)
    ).astype(np.int64)
    ts = rng.integers(0, 200 * WINDOW_US, n).astype(np.int64)
    left = pd.DataFrame({
        "eid": np.arange(n, dtype=np.int64),
        "k": keys,
        "t": ts,
    })
    rkeys = np.where(
        rng.random(n // 2) < 0.7, 7, rng.integers(100, 300, n // 2)
    ).astype(np.int64)
    right = pd.DataFrame({
        "k": rkeys,
        "t": rng.integers(0, 200 * WINDOW_US, n // 2).astype(np.int64),
        "v": rng.integers(0, 1000, n // 2).astype(np.int64),
    })
    return left, right


def test_skew_asof_matches_bruteforce(ray_session, zipf_events):
    import ray.data as rd

    from mq_to_db_ray.stages.temporal import asof_join

    left, right = zipf_events
    got = (
        asof_join(
            rd.from_pandas(left), rd.from_pandas(right),
            key="k", ts="t", value="v", k=8, window_us=WINDOW_US,
        )
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    # brute force: per left row, max v among right rows with same k,
    # largest t' <= t (ties on t' resolve to max v, like the operator)
    r_sorted = right.sort_values(["k", "t", "v"])
    want_vals = []
    grouped = {k: g for k, g in r_sorted.groupby("k")}
    for k, t in zip(left["k"], left["t"]):
        g = grouped.get(k)
        if g is None:
            want_vals.append(None)
            continue
        elig = g[g["t"] <= t]
        if len(elig) == 0:
            want_vals.append(None)
        else:
            tmax = elig["t"].iloc[-1]
            want_vals.append(int(elig[elig["t"] == tmax]["v"].max()))
    want = left.sort_values("eid").reset_index(drop=True).assign(
        asof_value=pd.array(want_vals, dtype="Int64")
    )
    assert len(got) == len(want)
    assert got["k"].tolist() == want["k"].tolist()
    got_v = got["asof_value"].astype("Int64")
    assert got_v.equals(want["asof_value"]), (
        (got_v != want["asof_value"]).idxmax()
    )


def test_skew_sessionize_matches_bruteforce(ray_session, zipf_events):
    import ray.data as rd

    from mq_to_db_ray.stages.temporal import sessionize

    left, right = zipf_events
    df = left.assign(v=left["eid"] % 97)
    gap_us = 3 * WINDOW_US // 2  # sessions regularly span window borders
    got = (
        sessionize(
            rd.from_pandas(df), key="k", ts="t", order_col="eid",
            value="v", gap_us=gap_us, k=8, window_us=WINDOW_US,
        )
        .to_pandas()
        .sort_values(["k", "session_id"])
        .reset_index(drop=True)
    )
    rows = []
    for k, g in df.sort_values(["t", "eid"]).groupby("k"):
        g = g.sort_values(["t", "eid"])
        t = g["t"].to_numpy()
        new = np.ones(len(g), dtype=bool)
        new[1:] = (t[1:] - t[:-1]) > gap_us
        sid = np.cumsum(new) - 1
        for s in np.unique(sid):
            m = sid == s
            rows.append(dict(
                k=k, session_id=int(s), n_events=int(m.sum()),
                start_ts=int(t[m].min()), end_ts=int(t[m].max()),
                sum_value=int(g["v"].to_numpy()[m].sum()),
            ))
    want = pd.DataFrame(rows).sort_values(["k", "session_id"]).reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"), check_like=True
    )


def test_skew_range_join_matches_bruteforce(ray_session, zipf_events):
    import ray.data as rd

    from mq_to_db_ray.stages.temporal import range_join

    left, _ = zipf_events
    # non-overlapping intervals per key (range_join's documented contract):
    # slice each key's time range into alternating covered/uncovered spans
    ivs = []
    iid = 0
    for k in [7, *range(100, 140)]:
        for w in range(0, 200, 4):
            ivs.append(dict(
                k=k, lo=w * WINDOW_US, hi=(w + 2) * WINDOW_US, iid=iid
            ))
            iid += 1
    intervals = pd.DataFrame(ivs)
    got = (
        range_join(
            rd.from_pandas(left), rd.from_pandas(intervals),
            key="k", ts="t", lo="lo", hi="hi", attrs=["iid"],
            k=8, window_us=WINDOW_US,
        )
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    m = left.merge(intervals, on="k", how="left")
    m = m[(m["t"] >= m["lo"]) & (m["t"] <= m["hi"])][["eid", "iid"]]
    want = left.merge(m, on="eid", how="left").sort_values("eid").reset_index(
        drop=True
    )
    assert len(got) == len(left)
    got_iid = got.set_index("eid")["iid"].astype("Int64")
    want_iid = want.set_index("eid")["iid"].astype("Int64")
    assert got_iid.sort_index().equals(want_iid.sort_index())
