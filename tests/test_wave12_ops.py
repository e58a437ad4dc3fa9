"""Round-4 wave-12 operators: day-of-week × hour traffic profile,
return-gap quantiles, sessions-per-user histogram, per-source duplication
balance sheet, vocabulary coverage at top-k — each vs a scalar brute-force
reference on synthetic inputs hitting the edge cases (week wraparound,
single-day users, one-session users, cross- vs intra-source dup groups,
tied counts at the top-k boundary)."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY_US = 86_400_000_000
HOUR_US = 3_600_000_000


def _write_events(tmp_path, seed: int, n: int = 900, days: int = 12):
    from mq_to_db_ray.pipelines.events import EVENTS_T0_US

    g = np.random.default_rng(seed)
    types = np.array(["a", "b", "c"])[g.integers(0, 3, n)]
    ts = EVENTS_T0_US + g.integers(0, days * DAY_US, n).astype(np.int64)
    users = g.integers(0, 35, n).astype(np.int64)
    # single-day user: all of user 34's events inside one hour (no gaps,
    # exactly one session)
    one = users == 34
    ts[one] = EVENTS_T0_US + (ts[one] % HOUR_US)
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


def test_dow_profile_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_dow_profile

    types, ts, users = _write_events(tmp_path, seed=52)
    want_ev: dict[tuple, int] = collections.defaultdict(int)
    want_us: dict[tuple, set] = collections.defaultdict(set)
    for s, t, u in zip(types, ts, users):
        dow = ((t // DAY_US + 3) % 7) + 1
        cell = (s, int(dow), int((t % DAY_US) // HOUR_US))
        want_ev[cell] += 1
        want_us[cell].add(int(u))

    got = events_dow_profile(str(tmp_path)).to_pandas()
    assert len(got) == len(want_ev)
    for r in got.itertuples():
        cell = (r.source, r.dow, r.hour)
        assert want_ev[cell] == r.n_events, cell
        assert len(want_us[cell]) == r.n_users, cell
    # epoch day 0 was a Thursday: spot-check the isodow formula
    assert ((0 + 3) % 7) + 1 == 4


def _rank_q(sorted_vals: list[int], n: int, q: int) -> int:
    thr = (n * q + 999) // 1000
    return sorted_vals[thr - 1]


def test_return_gaps_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_return_gaps

    _, ts, users = _write_events(tmp_path, seed=53)
    per_user: dict[int, set] = collections.defaultdict(set)
    for u, t in zip(users, ts):
        per_user[int(u)].add(int(t // DAY_US))
    gaps: list[int] = []
    for dset in per_user.values():
        d = sorted(dset)
        gaps.extend(b - a for a, b in zip(d, d[1:]))
    gaps.sort()
    # user 34 is single-day: contributes no gaps
    assert len(per_user[34]) == 1

    got = events_return_gaps(str(tmp_path)).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert r.n_gaps == len(gaps)
    assert r.p50_days == _rank_q(gaps, len(gaps), 500)
    assert r.p90_days == _rank_q(gaps, len(gaps), 900)
    assert r.p99_days == _rank_q(gaps, len(gaps), 990)
    assert r.max_days == gaps[-1]


def test_session_count_hist_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_session_count_hist

    _, ts, users = _write_events(tmp_path, seed=54)
    gap_us = 6 * 3600 * 1_000_000
    per_user: dict[int, list[int]] = collections.defaultdict(list)
    for u, t in zip(users, ts):
        per_user[int(u)].append(int(t))
    counts: dict[int, int] = {}
    for u, tt in per_user.items():
        tt.sort()
        counts[u] = 1 + sum(
            1 for a, b in zip(tt, tt[1:]) if b - a > gap_us
        )
    want = collections.Counter(counts.values())
    assert counts[34] == 1  # the single-hour user has exactly one session

    got = events_session_count_hist(str(tmp_path)).to_pandas()
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[r.n_sessions] == r.n_users, r.n_sessions


def test_dup_by_source_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import dup_by_source

    # srcA: 3 copies of "x x" (intra-source dup) + 1 unique
    # srcA+srcB: "y y" in both (cross-source dup)
    # srcB: 2 unique docs
    texts = ["x x", "x x", "x x", "only a", "y y", "y y", "u1", "u2"]
    srcs = ["srcA", "srcA", "srcA", "srcA", "srcA", "srcB", "srcB", "srcB"]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(srcs),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")

    got = (
        dup_by_source(str(tmp_path)).to_pandas().set_index("source").sort_index()
    )
    # srcA: 5 docs; "x x"×3 and "y y"×1 are dup docs (4); "y y" is cross (1)
    assert got.loc["srcA"].n_docs == 5
    assert got.loc["srcA"].n_dup_docs == 4
    assert got.loc["srcA"].n_cross_dup_docs == 1
    # srcB: 3 docs; "y y"×1 dup and cross
    assert got.loc["srcB"].n_docs == 3
    assert got.loc["srcB"].n_dup_docs == 1
    assert got.loc["srcB"].n_cross_dup_docs == 1


def test_vocab_coverage_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import vocab_coverage

    g = np.random.default_rng(55)
    # Zipf-ish corpus over a 40-word vocab with deliberate count ties at
    # every boundary; ks larger than the vocab must clamp to total mass
    vocab = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(g.choice(vocab, size=g.integers(1, 30), p=None))
        for _ in range(120)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s0"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")

    cnt = collections.Counter(w for t in texts for w in t.split(" "))
    desc = sorted(cnt.values(), reverse=True)
    total = sum(desc)

    got = (
        vocab_coverage(str(tmp_path), ks=(3, 10, 1000))
        .to_pandas()
        .set_index("top_k")
        .sort_index()
    )
    for k in (3, 10, 1000):
        cov = sum(desc[: min(k, len(desc))])
        assert got.loc[k].covered_tokens == cov, k
        assert got.loc[k].total_tokens == total
        assert got.loc[k].permille == (1000 * cov) // total
