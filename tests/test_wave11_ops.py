"""Round-4 wave-11 operators: cohort retention triangle, session-duration
quantiles, ordered funnel conversion, per-source length Gini, duplicate
cluster-size histogram — each vs a scalar brute-force reference on
synthetic inputs hitting the edge cases (multi-day users, single-event
sessions, first-occurrence ties, tied lengths, chain-shaped dup graphs)."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

DAY_US = 86_400_000_000


def _write_events(tmp_path, seed: int, n: int = 800, days: int = 9):
    from mq_to_db_ray.pipelines.events import EVENTS_T0_US

    g = np.random.default_rng(seed)
    types = np.array(["a", "b", "c", "d"])[g.integers(0, 4, n)]
    ts = EVENTS_T0_US + g.integers(0, days * DAY_US, n).astype(np.int64)
    # first-occurrence ties: user 0 does its first "a" and first "b" at the
    # exact same microsecond (ties count as in-order via >=)
    users = g.integers(0, 40, n).astype(np.int64)
    users[0], types[0] = 0, "a"
    users[1], types[1] = 0, "b"
    ts[1] = ts[0]
    ts[2:] = np.maximum(ts[2:], ts[0] + 1)  # keep row 0/1 the user-0 minimum
    users[2] = 0
    tbl = pa.table(
        {
            "event_type": pa.array(types.tolist()),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(g.uniform(0, 50, n)),
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(users),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    return types, ts, users


def test_retention_cohort_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_retention_cohort

    _, ts, users = _write_events(tmp_path, seed=47)
    days = ts // DAY_US
    per_user: dict[int, set[int]] = collections.defaultdict(set)
    for u, d in zip(users, days):
        per_user[int(u)].add(int(d))
    want: dict[tuple[int, int], int] = collections.defaultdict(int)
    for dset in per_user.values():
        cohort = min(dset)
        for d in dset:
            want[(cohort, d - cohort)] += 1

    got = events_retention_cohort(str(tmp_path)).to_pandas()
    # pandas Timestamp.value is ns; convert to µs-days
    got_map = {
        (int(c.value // 1_000 // DAY_US), int(o)): int(n)
        for c, o, n in zip(got["cohort_ts"], got["day_offset"], got["n_users"])
    }
    assert got_map == dict(want)
    # offset 0 row exists for every cohort and counts the whole cohort
    cohort_sizes = collections.Counter(min(d) for d in per_user.values())
    for cday, size in cohort_sizes.items():
        assert got_map[(cday, 0)] == size


def test_session_quantiles_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_session_quantiles

    _, ts, users = _write_events(tmp_path, seed=48)
    gap_us = 6 * 3600 * 1_000_000
    durs = []
    for u in np.unique(users):
        t = np.sort(ts[users == u])
        start = t[0]
        prev = t[0]
        for x in t[1:]:
            if x - prev > gap_us:
                durs.append((prev - start) // 1_000_000)
                start = x
            prev = x
        durs.append((prev - start) // 1_000_000)
    durs = np.sort(np.array(durs, dtype=np.int64))
    n = len(durs)

    def disc(q):
        return int(durs[int(np.ceil(n * q / 1000)) - 1])

    got = events_session_quantiles(str(tmp_path)).to_pandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert int(row["n_sessions"]) == n
    assert int(row["p50_s"]) == disc(500)
    assert int(row["p90_s"]) == disc(900)
    assert int(row["p99_s"]) == disc(990)
    assert int(row["max_s"]) == int(durs[-1])


def test_funnel_bruteforce_and_tie_rule(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_funnel

    types, ts, users = _write_events(tmp_path, seed=49)
    steps = sorted(set(types.tolist()))[:3]
    first: dict[int, dict[str, int]] = collections.defaultdict(dict)
    for ty, t, u in zip(types, ts, users):
        if ty in steps:
            cur = first[int(u)].get(ty)
            if cur is None or t < cur:
                first[int(u)][ty] = int(t)
    counts = [0, 0, 0]
    for fv in first.values():
        depth, prev = 0, None
        for s, step_ty in enumerate(steps):
            t = fv.get(step_ty)
            if t is None or (prev is not None and t < prev):
                break
            depth, prev = s + 1, t
        for s in range(depth):
            counts[s] += 1

    got = (
        events_funnel(str(tmp_path))
        .to_pandas()
        .sort_values("step")
        .reset_index(drop=True)
    )
    assert got["n_users"].tolist() == counts
    # cumulative by construction
    assert counts[0] >= counts[1] >= counts[2]
    # user 0's tie (first a == first b) counts as in-order: that user
    # reaches depth >= 2 unless its first c precedes them
    fv = first[0]
    assert fv[steps[0]] == fv[steps[1]]


def _write_docs(tmp_path, rows):
    ids = list(range(len(rows)))
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": [r[0] for r in rows],
            "n_chars": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_length_gini_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import length_gini

    g = np.random.default_rng(50)
    rows = []
    # source "u": all-equal lengths -> gini exactly 0
    rows += [("u", "x", 37)] * 9
    # source "m": heavy tail with tied values
    lens = np.concatenate([g.integers(1, 30, 40), [900, 900, 5000]])
    rows += [("m", "x", int(v)) for v in lens]
    sf = _write_docs(tmp_path, rows)

    def brute(vals):
        x = np.sort(np.array(vals, dtype=object))
        n = len(x)
        sx = sum(int(v) for v in x)
        srx = sum((i + 1) * int(v) for i, v in enumerate(x))
        return (1000 * (2 * srx - (n + 1) * sx)) // (n * sx)

    got = length_gini(sf).to_pandas().set_index("source")
    assert int(got.loc["u", "gini_permille"]) == 0
    assert int(got.loc["u", "n_docs"]) == 9
    assert int(got.loc["m", "gini_permille"]) == brute(lens)
    assert int(got.loc["m", "sum_len"]) == int(lens.sum())


def test_dup_size_hist_chain_and_twins(ray_session, tmp_path):
    """Chain 0-1-2-3 (one 4-family), twins 10/11 (one 2-family), and a
    singleton that must NOT appear (sizes start at 2)."""
    from mq_to_db_ray.pipelines.training_data import dup_clusters, dup_size_hist

    words = [f"w{i:02d}" for i in range(30)]
    rows = []
    for i in range(4):
        rows.append(("s", " ".join(words[6 * i: 6 * i + 12]), 10))
    twin = "zz aa bb cc dd ee ff gg hh ii jj kk"
    rows.append(("s", twin, 10))
    rows.append(("s", twin, 10))
    rows.append(("s", "qq rr ss tt uu vv ww xx yy qz ab cd", 10))
    sf = _write_docs(tmp_path, rows)

    got = (
        dup_size_hist(sf)
        .to_pandas()
        .sort_values("size")
        .reset_index(drop=True)
    )
    assert got["size"].tolist() == [2, 4]
    assert got["n_clusters"].tolist() == [1, 1]

    # precomputed-clusters path returns the identical histogram
    cl = dup_clusters(sf)
    got2 = (
        dup_size_hist(sf, clusters=cl)
        .to_pandas()
        .sort_values("size")
        .reset_index(drop=True)
    )
    assert got2.equals(got)
