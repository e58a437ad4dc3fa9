"""Temporal operators (stages/temporal.py): as-of join, rolling window,
sessionization — each checked against a scalar brute-force reference on
synthetic inputs that hit the edge cases (no-match nulls, equal-ts ties,
duplicate right keys, halo crossings, exact-gap boundaries)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------

def _brute_asof(lk, lt, rk, rt, rv):
    """max-value right row with rt <= lt per key; None when absent."""
    out = []
    for k, t in zip(lk, lt):
        best_t, best_v = None, None
        for k2, t2, v2 in zip(rk, rt, rv):
            if k2 != k or t2 > t:
                continue
            if best_t is None or t2 > best_t or (t2 == best_t and v2 > best_v):
                best_t, best_v = t2, v2
        out.append(best_v)
    return out


def test_asof_join_matches_bruteforce(ray_session):
    import ray.data as rd

    from mq_to_db_ray.stages.temporal import asof_join

    g = _rng(7)
    n_l, n_r = 400, 300
    lk = g.integers(0, 20, n_l).astype(np.int64)
    lt = g.integers(0, 1000, n_l).astype(np.int64)
    rk = g.integers(0, 25, n_r).astype(np.int64)  # some keys never match
    rt = g.integers(0, 1000, n_r).astype(np.int64)
    rv = g.integers(-50, 50, n_r).astype(np.int64)
    # force equal-ts ties on both sides and duplicate right (key, ts) rows
    lt[:10] = rt[:10] = 500
    lk[:10] = rk[:10] = 3
    rk[10] = 3
    rt[10] = 500
    rv[10] = 99  # duplicate (3, 500): max wins

    left = rd.from_arrow(
        pa.table({"eid": np.arange(n_l, dtype=np.int64), "k": lk, "t": lt})
    )
    right = rd.from_arrow(pa.table({"k": rk, "t": rt, "v": rv}))
    got = (
        asof_join(left, right, key="k", ts="t", value="v", k=8)
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    want = _brute_asof(lk, lt, rk, rt, rv)
    assert len(got) == n_l
    for i in range(n_l):
        row = got.iloc[i]
        assert row["k"] == lk[int(row["eid"])]
        w = want[int(row["eid"])]
        if w is None:
            assert row["asof_value"] is None or np.isnan(row["asof_value"])
        else:
            assert int(row["asof_value"]) == w


# ---------------------------------------------------------------------------
# rolling window
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("window_buckets", [8, 4096])
def test_rolling_sum_matches_bruteforce(ray_session, window_buckets):
    """window_buckets=8 forces every group boundary through the halo path;
    4096 is the single-window fast case. Results must be identical."""
    import ray.data as rd

    from mq_to_db_ray.stages.temporal import rolling_sum

    g = _rng(11)
    w, t0 = 5, 1_000_000
    rows = []
    for src in ["a", "b"]:
        n = 100 if src == "a" else 37
        vals = g.integers(0, 10, n)
        for i in range(n):
            rows.append((src, t0 + i * 60_000_000, int(vals[i])))
    t = pa.table(
        {
            "source": [r[0] for r in rows],
            "bucket_ts": pa.array([r[1] for r in rows], pa.int64()).cast(
                pa.timestamp("us")
            ),
            "count": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    got = (
        rolling_sum(
            rd.from_arrow(t), "1m", w, ["count"], t0_us=t0,
            window_buckets=window_buckets,
        )
        .to_pandas()
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )
    # brute force per source
    exp = []
    for src in ["a", "b"]:
        vs = [r[2] for r in rows if r[0] == src]
        for i in range(len(vs)):
            exp.append(sum(vs[max(0, i - w + 1): i + 1]))
    assert got["roll_count"].tolist() == exp
    assert len(got) == len(rows)


# ---------------------------------------------------------------------------
# sessionization
# ---------------------------------------------------------------------------

def test_sessionize_matches_bruteforce(ray_session):
    import ray.data as rd

    from mq_to_db_ray.stages.temporal import sessionize

    g = _rng(13)
    n, gap = 500, 100
    k = g.integers(0, 12, n).astype(np.int64)
    t = g.integers(0, 5000, n).astype(np.int64)
    v = g.integers(0, 9, n).astype(np.int64)
    oid = np.arange(n, dtype=np.int64)
    # exact-gap boundary: delta == gap must NOT split (strictly greater does)
    k[:3] = 99
    t[0], t[1], t[2] = 0, gap, gap + gap + 1  # [0,100] one session, 201 new

    ds = rd.from_arrow(pa.table({"k": k, "t": t, "o": oid, "v": v}))
    got = (
        sessionize(
            ds, key="k", ts="t", order_col="o", value="v", gap_us=gap, k=8
        )
        .to_pandas()
        .sort_values(["k", "session_id"])
        .reset_index(drop=True)
    )

    # brute force
    exp = []
    for key in sorted(set(k.tolist())):
        evs = sorted(
            [(t[i], oid[i], v[i]) for i in range(n) if k[i] == key]
        )
        sid, cur = 0, []
        sessions = []
        for e in evs:
            if cur and e[0] - cur[-1][0] > gap:
                sessions.append(cur)
                cur = []
            cur.append(e)
        sessions.append(cur)
        for sid, s in enumerate(sessions):
            exp.append(
                (key, sid, len(s), s[0][0], s[-1][0], sum(x[2] for x in s))
            )
    assert len(got) == len(exp)
    for i, (key, sid, ne, st, en, sv) in enumerate(exp):
        row = got.iloc[i]
        assert (
            row["k"], row["session_id"], row["n_events"],
            row["start_ts"], row["end_ts"], row["sum_value"],
        ) == (key, sid, ne, st, en, sv)

    boundary = got[got["k"] == 99]
    assert boundary["n_events"].tolist()[0] == 2  # 0 and 100 joined


# ---------------------------------------------------------------------------
# range (interval containment) join
# ---------------------------------------------------------------------------

def test_range_join_matches_bruteforce(ray_session):
    import ray.data as rd

    from mq_to_db_ray.stages.temporal import range_join

    g = _rng(11)
    nkeys = 6
    # non-overlapping intervals per key, with deliberate gaps between them
    ik, ilo, ihi, sid = [], [], [], []
    for k in range(nkeys - 1):  # key nkeys-1 has NO intervals
        t = 0
        for s in range(int(g.integers(1, 5))):
            t += int(g.integers(5, 30))  # gap before the interval
            w = int(g.integers(0, 20))  # zero-width allowed (lo == hi)
            ik.append(k); ilo.append(t); ihi.append(t + w); sid.append(s)
            t += w
    # points: hits, misses-in-gaps, exact lo/hi boundaries, keys w/o intervals
    pk = g.integers(0, nkeys, 300).astype(int).tolist()
    pt = g.integers(0, 160, 300).astype(int).tolist()
    pk += [0, 0]; pt += [ilo[0], ihi[0]]  # inclusive boundary probes
    pid = list(range(len(pk)))

    def brute(k, t):
        for k2, lo, hi, s in zip(ik, ilo, ihi, sid):
            if k2 == k and lo <= t <= hi:
                return s
        return None

    points = rd.from_arrow(pa.table(
        {"key": pa.array(pk, pa.int64()), "ts": pa.array(pt, pa.int64()),
         "pid": pa.array(pid, pa.int64())}))
    intervals = rd.from_arrow(pa.table(
        {"key": pa.array(ik, pa.int64()), "lo": pa.array(ilo, pa.int64()),
         "hi": pa.array(ihi, pa.int64()), "sid": pa.array(sid, pa.int64())}))
    got = range_join(
        points, intervals, key="key", ts="ts", lo="lo", hi="hi",
        attrs=["sid"], k=8,
    ).to_pandas().set_index("pid")
    assert len(got) == len(pk)  # LEFT semantics: every point survives
    for i, (k, t) in enumerate(zip(pk, pt)):
        exp = brute(k, t)
        val = got.loc[i, "sid"]
        if exp is None:
            assert val is None or val != val  # null/NaN
        else:
            assert int(val) == exp, (i, k, t, val, exp)


def test_range_join_rejects_attr_collision(ray_session):
    import pytest as _pytest
    import ray.data as rd

    from mq_to_db_ray.stages.temporal import range_join

    t = pa.table({"key": pa.array([1], pa.int64()),
                  "ts": pa.array([1], pa.int64()),
                  "sid": pa.array([0], pa.int64())})
    iv = pa.table({"key": pa.array([1], pa.int64()),
                   "lo": pa.array([0], pa.int64()),
                   "hi": pa.array([2], pa.int64()),
                   "sid": pa.array([7], pa.int64())})
    with _pytest.raises(ValueError):
        range_join(rd.from_arrow(t), rd.from_arrow(iv), key="key", ts="ts",
                   lo="lo", hi="hi", attrs=["sid"])
