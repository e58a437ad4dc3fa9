"""Sub-windowed hot-key paths of asof_join / sessionize (VERDICT r3 #4).

The plain paths hash-partition by entity key alone, so one key with a
corpus-sized history lands in one task.  window_us partitions by
(key, ts // window_us): asof carries the cross-window prefix via a
per-(key, window) summary round (grid_cumsum's two-pass shape, fully
distributed); sessionize folds associative local sessions per key.
Windowed output must be IDENTICAL to the plain kernels and to brute
force, including on a skewed fixture where one key owns half the rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


def _asof_inputs(seed: int, n_l: int = 600, n_r: int = 500):
    g = _rng(seed)
    lk = g.integers(0, 20, n_l).astype(np.int64)
    lt = g.integers(0, 4000, n_l).astype(np.int64)
    rk = g.integers(0, 25, n_r).astype(np.int64)
    rt = g.integers(0, 4000, n_r).astype(np.int64)
    rv = g.integers(-50, 50, n_r).astype(np.int64)
    # hot key: key 3 owns half of BOTH sides (skew axis)
    lk[: n_l // 2] = 3
    rk[: n_r // 2] = 3
    # equal-ts ties and duplicate right (key, ts)
    lt[:5] = rt[:5] = 500
    lk[:5] = rk[:5] = 3
    return lk, lt, rk, rt, rv


def test_windowed_asof_equals_plain_and_brute(ray_session):
    import ray.data as rd

    from mq_to_db_ray.stages.temporal import asof_join

    lk, lt, rk, rt, rv = _asof_inputs(23)
    left = rd.from_arrow(
        pa.table({"eid": np.arange(len(lk), dtype=np.int64), "k": lk, "t": lt})
    )
    right = rd.from_arrow(pa.table({"k": rk, "t": rt, "v": rv}))

    def run(window_us):
        return (
            asof_join(
                left, right, key="k", ts="t", value="v", k=8,
                window_us=window_us,
            )
            .to_pandas()
            .sort_values("eid")
            .reset_index(drop=True)
        )

    plain = run(None)
    # 64-tick windows: the hot key's history spans ~60 windows, so carries
    # cross many window boundaries; 100000 = everything in one window
    for window_us in (64, 997, 100_000):
        win = run(window_us)
        assert len(win) == len(plain)
        assert win["k"].tolist() == plain["k"].tolist()
        assert win["t"].tolist() == plain["t"].tolist()
        a = win["asof_value"].fillna(1 << 40).tolist()
        b = plain["asof_value"].fillna(1 << 40).tolist()
        assert a == b, f"window_us={window_us}"


def test_windowed_asof_bounded_groups(ray_session):
    """The partitioning property itself: with sub-windowing, the max rows
    co-located for any (key, window) is bounded by that window's rows —
    the hot key's total (half the corpus) never meets in one task."""
    lk, lt, rk, rt, rv = _asof_inputs(29)
    window_us = 64
    both_k = np.concatenate([lk, rk])
    both_t = np.concatenate([lt, rt])
    w = both_t // window_us
    hot_total = int((both_k == 3).sum())
    # group sizes per (key, window)
    order = np.lexsort((w, both_k))
    kk, ww = both_k[order], w[order]
    new = np.empty(len(kk), dtype=bool)
    new[0] = True
    new[1:] = (kk[1:] != kk[:-1]) | (ww[1:] != ww[:-1])
    sizes = np.diff(np.append(np.flatnonzero(new), len(kk)))
    assert hot_total >= len(both_k) // 2  # the fixture is genuinely skewed
    assert sizes.max() < hot_total / 4  # no task sees the hot key whole


def test_windowed_sessionize_equals_plain(ray_session):
    import ray.data as rd

    from mq_to_db_ray.stages.temporal import sessionize

    g = _rng(31)
    n, gap = 800, 100
    k = g.integers(0, 12, n).astype(np.int64)
    t = g.integers(0, 8000, n).astype(np.int64)
    v = g.integers(0, 9, n).astype(np.int64)
    oid = np.arange(n, dtype=np.int64)
    k[: n // 2] = 7  # hot key owns half the rows

    ds = rd.from_arrow(pa.table({"k": k, "t": t, "o": oid, "v": v}))

    def run(window_us):
        return (
            sessionize(
                ds, key="k", ts="t", order_col="o", value="v", gap_us=gap,
                k=8, window_us=window_us,
            )
            .to_pandas()
            .sort_values(["k", "session_id"])
            .reset_index(drop=True)
        )

    plain = run(None)
    # windows SMALLER than the gap (50 < 100): sessions span many empty
    # windows and must still merge; 300 ~ a few sessions per window; huge
    for window_us in (50, 300, 1_000_000):
        win = run(window_us)
        assert win.values.tolist() == plain.values.tolist(), (
            f"window_us={window_us}"
        )


def test_windowed_range_join_equals_plain(ray_session):
    """Intervals spanning many windows: the carried summary must bring an
    interval's lo/hi/attrs into every later window its points fall in."""
    import ray.data as rd

    from mq_to_db_ray.stages.temporal import range_join

    g = _rng(37)
    n_p, n_i = 500, 60
    pk = g.integers(0, 8, n_p).astype(np.int64)
    pt = g.integers(0, 4000, n_p).astype(np.int64)
    pk[: n_p // 2] = 3  # hot key
    # non-overlapping intervals per key: carve each key's timeline
    rows = []
    iid = 0
    for key in range(8):
        cuts = np.sort(g.choice(4000, size=n_i // 8 * 2, replace=False))
        for j in range(0, len(cuts) - 1, 2):
            rows.append((key, int(cuts[j]), int(cuts[j + 1]), iid))
            iid += 1
    points = rd.from_arrow(
        pa.table(
            {"pid": np.arange(n_p, dtype=np.int64), "k": pk, "t": pt}
        )
    )
    intervals = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([r[0] for r in rows], pa.int64()),
                "lo": pa.array([r[1] for r in rows], pa.int64()),
                "hi": pa.array([r[2] for r in rows], pa.int64()),
                "iv": pa.array([r[3] for r in rows], pa.int64()),
            }
        )
    )

    def run(window_us):
        return (
            range_join(
                points, intervals, key="k", ts="t", lo="lo", hi="hi",
                attrs=["iv"], k=8, window_us=window_us,
            )
            .to_pandas()
            .sort_values("pid")
            .reset_index(drop=True)
        )

    plain = run(None)
    for window_us in (64, 997, 100_000):
        win = run(window_us)
        assert win["k"].tolist() == plain["k"].tolist()
        a = win["iv"].fillna(-1).tolist()
        b = plain["iv"].fillna(-1).tolist()
        assert a == b, f"window_us={window_us}"


def test_windowed_equivalence_property(ray_session):
    """Property-style sweep: windowed == plain for asof and sessionize
    across several seeds, skew levels and window sizes (cheap fixed draws
    rather than hypothesis — a live Ray session per example would blow
    the deadline budget)."""
    import ray.data as rd

    from mq_to_db_ray.stages.temporal import asof_join, sessionize

    for seed in (101, 202, 303):
        g = _rng(seed)
        n = 300
        skew = [1.0, 0.5, 0.1][seed % 3]
        n_keys = max(1, int(10 * skew))
        lk = g.integers(0, n_keys, n).astype(np.int64)
        lt = g.integers(-500, 2000, n).astype(np.int64)  # negative ts too
        rk = g.integers(0, n_keys + 2, n).astype(np.int64)
        rt = g.integers(-500, 2000, n).astype(np.int64)
        rv = g.integers(-9, 9, n).astype(np.int64)
        left = rd.from_arrow(
            pa.table(
                {"eid": np.arange(n, dtype=np.int64), "k": lk, "t": lt}
            )
        )
        right = rd.from_arrow(pa.table({"k": rk, "t": rt, "v": rv}))
        plain = (
            asof_join(left, right, key="k", ts="t", value="v", k=8)
            .to_pandas().sort_values("eid").reset_index(drop=True)
        )
        for wu in (37, 512):
            win = (
                asof_join(
                    left, right, key="k", ts="t", value="v", k=8,
                    window_us=wu,
                )
                .to_pandas().sort_values("eid").reset_index(drop=True)
            )
            assert (
                win["asof_value"].fillna(1 << 40).tolist()
                == plain["asof_value"].fillna(1 << 40).tolist()
            ), f"asof seed={seed} wu={wu}"

        oid = np.arange(n, dtype=np.int64)
        ds = rd.from_arrow(pa.table({"k": lk, "t": lt, "o": oid, "v": rv}))
        sp = (
            sessionize(
                ds, key="k", ts="t", order_col="o", value="v", gap_us=50, k=8
            )
            .to_pandas().sort_values(["k", "session_id"])
            .reset_index(drop=True)
        )
        for wu in (37, 512):
            sw = (
                sessionize(
                    ds, key="k", ts="t", order_col="o", value="v", gap_us=50,
                    k=8, window_us=wu,
                )
                .to_pandas().sort_values(["k", "session_id"])
                .reset_index(drop=True)
            )
            assert sw.values.tolist() == sp.values.tolist(), (
                f"sessions seed={seed} wu={wu}"
            )


def test_windowed_sessionize_cross_window_merge(ray_session):
    """Explicit boundary case: two events 150 apart with gap 200 sit in
    windows 0 and 3 of width 50 (two empty windows between) — one session."""
    import ray.data as rd

    from mq_to_db_ray.stages.temporal import sessionize

    ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1], pa.int64()),
                "t": pa.array([0, 150], pa.int64()),
                "o": pa.array([0, 1], pa.int64()),
                "v": pa.array([10, 20], pa.int64()),
            }
        )
    )
    got = sessionize(
        ds, key="k", ts="t", order_col="o", value="v", gap_us=200, k=8,
        window_us=50,
    ).to_pandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert (
        int(row["n_events"]),
        int(row["start_ts"]),
        int(row["end_ts"]),
        int(row["sum_value"]),
    ) == (2, 0, 150, 30)
