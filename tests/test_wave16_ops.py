"""Round-4 wave-16 operators: user-concentration Pareto, DAU/WAU/MAU
stickiness board, token-mass Pareto — each vs a scalar brute-force
reference on synthetic inputs hitting the edge cases (count ties at every
Pareto boundary, window edges at the stream start, single-day users)."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY_US = 86_400_000_000


def _pareto_brute(masses: list[int], p: int) -> int:
    total = sum(masses)
    need = -(-total * p // 1000)
    acc = units = 0
    for m in sorted(masses, reverse=True):
        if acc >= need:
            break
        acc += m
        units += 1
    return units


def _write_events(tmp_path, seed: int, n: int = 900, days: int = 40):
    from mq_to_db_ray.pipelines.events import EVENTS_T0_US

    g = np.random.default_rng(seed)
    types = np.array(["a", "b"])[g.integers(0, 2, n)]
    ts = EVENTS_T0_US + g.integers(0, days * DAY_US, n).astype(np.int64)
    # Zipf-ish user skew so Pareto boundaries include tie runs
    users = (g.zipf(1.6, n) % 50).astype(np.int64)
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


def test_events_pareto_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_pareto

    _, _, users = _write_events(tmp_path, seed=70)
    counts = list(collections.Counter(users.tolist()).values())
    # the fixture must actually contain ties
    assert len(counts) != len(set(counts))

    got = events_pareto(str(tmp_path)).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert r.total_users == len(counts)
    assert r.total_events == sum(counts)
    for p, col in ((500, "users_p50"), (800, "users_p80"), (900, "users_p90"), (990, "users_p99")):
        assert r[col] == _pareto_brute(counts, p), col


def test_dau_wau_mau_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_dau_wau_mau

    _, ts, users = _write_events(tmp_path, seed=71)
    pairs = {(int(u), int(t // DAY_US)) for u, t in zip(users, ts)}
    days = sorted({d for _, d in pairs})
    want = {}
    for t in days:
        dau = {u for u, d in pairs if d == t}
        wau = {u for u, d in pairs if t - 6 <= d <= t}
        mau = {u for u, d in pairs if t - 27 <= d <= t}
        want[t] = (len(dau), len(wau), len(mau))

    got = events_dau_wau_mau(str(tmp_path)).to_pandas()
    assert len(got) == len(days)
    for r in got.itertuples():
        day = int(r.day_ts.value // 1000 // DAY_US)
        assert (r.dau, r.wau, r.mau) == want[day], day
    # monotonicity sanity: dau <= wau <= mau everywhere
    assert (got.dau <= got.wau).all() and (got.wau <= got.mau).all()


def test_token_pareto_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import token_pareto

    g = np.random.default_rng(72)
    # heavy-tailed doc lengths + deliberate duplicates (tie runs)
    lens = np.concatenate(
        [g.zipf(1.5, 150) % 200 + 1, np.full(30, 17, np.int64)]
    )
    texts = [" ".join("w" for _ in range(int(L))) for L in lens]
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

    masses = [len(t.split(" ")) for t in texts]
    got = token_pareto(str(tmp_path)).to_pandas()
    r = got.iloc[0]
    assert r.total_docs == len(masses)
    assert r.total_tokens == sum(masses)
    for p, col in ((500, "docs_p50"), (800, "docs_p80"), (900, "docs_p90"), (990, "docs_p99")):
        assert r[col] == _pareto_brute(masses, p), col


def test_quality_funnel_consistency(ray_session, tmp_path):
    """The funnel must be monotone non-increasing and its n_pass_all must
    equal the fused filter's per-source survivor count (same kernel)."""
    from mq_to_db_ray.pipelines.training_data import quality_filter, quality_funnel

    g = np.random.default_rng(73)
    stop = ["the", "a", "of", "and", "to", "in", "is"]
    other = [f"w{i}" for i in range(30)]
    texts, srcs, langs = [], [], []
    for i in range(120):
        n = int(g.integers(5, 120))
        words = list(g.choice(other, n))
        # salt some docs with stopwords so the stop floor differentiates
        if i % 3 == 0:
            words[: max(1, n // 8)] = list(
                g.choice(stop, max(1, n // 8))
            )
        texts.append(" ".join(words))
        srcs.append(f"s{i % 4}")
        langs.append("en" if i % 5 else "de")
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array(srcs),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")

    funnel = quality_funnel(str(tmp_path)).to_pandas().set_index("source")
    kept = quality_filter(str(tmp_path)).to_pandas()
    kept_per_src = kept.groupby("source").size()
    for s in funnel.index:
        r = funnel.loc[s]
        seq = [r.n_docs, r.n_pass_lang, r.n_pass_band, r.n_pass_rep,
               r.n_pass_stop, r.n_pass_all]
        assert all(a >= b for a, b in zip(seq, seq[1:])), s
        assert r.n_pass_all == kept_per_src.get(s, 0), s
    # the fixture must actually exercise every stage
    assert funnel.n_pass_lang.sum() < funnel.n_docs.sum()
    assert funnel.n_pass_band.sum() < funnel.n_pass_lang.sum()


def test_minute_percentile_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_minute_percentile

    MIN_US = 60_000_000
    types, ts, _ = _write_events(tmp_path, seed=74)
    per_cell = collections.Counter(
        (s, int(t // MIN_US)) for s, t in zip(types, ts)
    )
    per_src = collections.defaultdict(list)
    for (s, _), n in per_cell.items():
        per_src[s].append(n)

    got = events_minute_percentile(str(tmp_path)).to_pandas()
    assert len(got) == len(per_cell)
    for r in got.itertuples():
        minute = int(r.bucket_ts.value // 1000 // MIN_US)
        n = per_cell[(r.source, minute)]
        assert r.n_events == n
        counts = per_src[r.source]
        below = sum(1 for c in counts if c < n)
        assert r.permille == (1000 * below) // len(counts)


def test_curriculum_rank_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import curriculum_rank

    g = np.random.default_rng(75)
    # many tied lengths so within-length doc_id ordering is exercised
    lens = g.integers(1, 15, 200).astype(np.int64)
    texts = ["x" * int(L) for L in lens]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s0"] * len(texts)),
            "n_chars": pa.array(lens),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")

    want = sorted(range(len(lens)), key=lambda i: (-lens[i], i))
    rank_of = {doc: r for r, doc in enumerate(want)}

    got = curriculum_rank(str(tmp_path)).to_pandas()
    assert len(got) == len(lens)
    assert sorted(got["rank"].tolist()) == list(range(len(lens)))  # a permutation
    for r in got.itertuples():
        assert r.rank == rank_of[r.doc_id], r.doc_id


def test_near_dup_rate_bruteforce(ray_session, tmp_path):
    """Known family structure: groups of identical docs (Jaccard 1000)
    with disjoint vocabularies, plus singletons — membership per source
    must match exactly."""
    from mq_to_db_ray.pipelines.training_data import near_dup_rate_by_source

    texts, srcs = [], []
    # family A: 3 copies split across s0/s1; family B: 2 copies in s1
    fam_a = "alpha beta gamma delta epsilon zeta eta theta"
    fam_b = "one two three four five six seven eight nine"
    texts += [fam_a, fam_a, fam_a]
    srcs += ["s0", "s0", "s1"]
    texts += [fam_b, fam_b]
    srcs += ["s1", "s1"]
    # singletons with disjoint vocab (cannot share any 3-gram shingle)
    for i in range(6):
        texts.append(" ".join(f"u{i}w{j}" for j in range(10)))
        srcs.append("s0" if i % 2 else "s1")
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
        near_dup_rate_by_source(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    assert got.loc["s0"].n_docs == 2 + 3  # 2 family-A copies + 3 singletons
    assert got.loc["s0"].n_in_family == 2
    assert got.loc["s1"].n_docs == 1 + 2 + 3
    assert got.loc["s1"].n_in_family == 3


def test_share_drift_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_share_drift

    types, ts, _ = _write_events(tmp_path, seed=76)
    cell = collections.Counter((s, int(t // DAY_US)) for s, t in zip(types, ts))
    day_tot = collections.Counter()
    for (s, d), n in cell.items():
        day_tot[d] += n

    got = events_share_drift(str(tmp_path)).to_pandas()
    assert len(got) == len(cell)
    for r in got.itertuples():
        d = int(r.day_ts.value // 1000 // DAY_US)
        n = cell[(r.source, d)]
        assert r.n_events == n
        assert r.share_permille == (1000 * n) // day_tot[d]
    # per-day shares sum to <= 1000 and > 1000 - n_sources (floor slack)
    agg = got.groupby(got.day_ts).share_permille.sum()
    assert (agg <= 1000).all()


def test_scrub_impact_bruteforce(ray_session, tmp_path):
    import re

    from mq_to_db_ray.pipelines.training_data import scrub_impact, SCRUB_PATTERN

    texts = [
        "spark and customer spark",
        "no hits here",
        "customerx is not a hit but customer is",
        "sparkly sparks do not count",
    ]
    srcs = ["s0", "s0", "s1", "s1"]
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

    got = scrub_impact(str(tmp_path)).to_pandas().set_index("source")
    for s in ("s0", "s1"):
        joined = [t for t, ss in zip(texts, srcs) if ss == s]
        hits = [len(re.findall(SCRUB_PATTERN, t)) for t in joined]
        assert got.loc[s].n_docs == len(joined)
        assert got.loc[s].n_docs_hit == sum(1 for h in hits if h)
        assert got.loc[s].n_redactions == sum(hits)
    assert got.loc["s1"].n_redactions == 1  # word-boundary semantics


def test_dup_matrix_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import dup_matrix

    # group X: copies in s0(x2) + s1(x1); group Y: s1 + s2; group Z: s2 x3;
    # plus unique docs everywhere
    texts = ["X", "X", "X", "Y", "Y", "Z", "Z", "Z", "u0", "u1", "u2"]
    srcs = ["s0", "s0", "s1", "s1", "s2", "s2", "s2", "s2", "s0", "s1", "s2"]
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

    got = dup_matrix(str(tmp_path)).to_pandas()
    want = {
        ("s0", "s0"): 1,  # X has 2 copies inside s0
        ("s0", "s1"): 1,  # X spans s0/s1
        ("s1", "s2"): 1,  # Y spans s1/s2
        ("s2", "s2"): 1,  # Z has 3 copies inside s2
    }
    # the matrix is dense: every a <= b pair present, zeros included
    assert len(got) == 6
    for r in got.itertuples():
        assert want.get((r.source_a, r.source_b), 0) == r.n_groups


def test_tenure_hist_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_tenure_hist

    _, ts, users = _write_events(tmp_path, seed=77)
    per_user = collections.defaultdict(list)
    for u, t in zip(users, ts):
        per_user[int(u)].append(int(t // DAY_US))
    tenures = [max(d) - min(d) + 1 for d in per_user.values()]
    want = collections.Counter(tenures)

    got = events_tenure_hist(str(tmp_path)).to_pandas()
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[r.tenure_days] == r.n_users
    assert got.n_users.sum() == len(per_user)


def test_concurrent_sessions_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_concurrent_sessions

    MIN_US = 60_000_000
    _, ts, users = _write_events(tmp_path, seed=78)
    gap_us = 6 * 3600 * 1_000_000
    per_user = collections.defaultdict(list)
    for u, t in zip(users, ts):
        per_user[int(u)].append(int(t))
    load = collections.Counter()
    for tt in per_user.values():
        tt.sort()
        start = prev = tt[0]
        for t in tt[1:]:
            if t - prev > gap_us:
                for m in range(start // MIN_US, prev // MIN_US + 1):
                    load[m] += 1
                start = t
            prev = t
        for m in range(start // MIN_US, prev // MIN_US + 1):
            load[m] += 1

    got = events_concurrent_sessions(str(tmp_path)).to_pandas()
    assert len(got) == len(load)
    for r in got.itertuples():
        m = int(r.minute_ts.value // 1000 // MIN_US)
        assert load[m] == r.n_sessions, m


def test_shingle_novelty_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import shingle_novelty

    g = np.random.default_rng(79)
    vocab = [f"w{i}" for i in range(12)]
    texts = [
        " ".join(g.choice(vocab, size=g.integers(3, 20))) for _ in range(80)
    ]
    _write_docs(tmp_path, texts, ["s0"] * len(texts))

    def shingles(t):
        w = t.split(" ")
        k = max(len(w) - 2, 1)
        return {" ".join(w[i : i + 3]) for i in range(k)}

    first = {}
    per_doc = []
    for i, t in enumerate(texts):
        sh = shingles(t)
        per_doc.append(sh)
        for s in sh:
            first.setdefault(s, i)

    got = shingle_novelty(str(tmp_path)).to_pandas().set_index("doc_id")
    assert len(got) == len(texts)
    for i, sh in enumerate(per_doc):
        nv = sum(1 for s in sh if first[s] == i)
        assert got.loc[i].n_shingles == len(sh)
        assert got.loc[i].n_novel == nv, i
        assert got.loc[i].novelty_permille == (1000 * nv) // len(sh)
    # the fixture reuses vocabulary, so novelty must actually decay
    assert got.loc[0].n_novel == got.loc[0].n_shingles
    assert got.n_novel.sum() < got.n_shingles.sum()


def _write_docs(tmp_path, texts, srcs):
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


def test_rolling_7d_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_rolling_7d

    types, ts, _ = _write_events(tmp_path, seed=80)
    cell = collections.Counter((s, int(t // DAY_US)) for s, t in zip(types, ts))

    got = events_rolling_7d(str(tmp_path)).to_pandas()
    assert len(got) == len(cell)
    for r in got.itertuples():
        d = int(r.day_ts.value // 1000 // DAY_US)
        assert r.n_events == cell[(r.source, d)]
        want = sum(cell.get((r.source, d - off), 0) for off in range(7))
        assert r.n_7d == want, (r.source, d)


def test_weekly_users_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_weekly_users

    WEEK_US = 7 * DAY_US
    MONDAY0 = 4 * DAY_US
    types, ts, users = _write_events(tmp_path, seed=81)
    want = collections.defaultdict(set)
    for s, t, u in zip(types, ts, users):
        want[(s, int((t - MONDAY0) // WEEK_US))].add(int(u))

    got = events_weekly_users(str(tmp_path)).to_pandas()
    assert len(got) == len(want)
    for r in got.itertuples():
        w = int((r.week_ts.value // 1000 - MONDAY0) // WEEK_US)
        assert len(want[(r.source, w)]) == r.n_users
        # week starts on a Monday: isodow(monday) == 1
        assert ((r.week_ts.value // 1000 // DAY_US + 3) % 7) == 0


def test_lang_token_mix_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import lang_token_mix

    texts = ["a b c", "d e", "f", "g h i j", "k l"]
    srcs = ["s0", "s0", "s1", "s1", "s1"]
    langs = ["en", "de", "en", "en", "de"]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array(srcs),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")

    want = collections.defaultdict(lambda: [0, 0])
    for t, s, L in zip(texts, srcs, langs):
        c = want[(s, L)]
        c[0] += 1
        c[1] += len(t.split(" "))

    got = lang_token_mix(str(tmp_path)).to_pandas()
    assert len(got) == len(want)
    for r in got.itertuples():
        assert tuple(want[(r.source, r.lang)]) == (r.n_docs, r.n_tokens)


def test_session_conversion_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_session_conversion

    types, ts, users = _write_events(tmp_path, seed=82)
    target = min(set(types.tolist()))
    gap_us = 6 * 3600 * 1_000_000
    per_user = collections.defaultdict(list)
    for s, t, u in zip(types, ts, users):
        per_user[int(u)].append((int(t), s))
    ns = nc = 0
    for evs in per_user.values():
        evs.sort()
        prev = None
        conv = False
        for t, s in evs:
            if prev is not None and t - prev > gap_us:
                ns += 1
                nc += conv
                conv = False
            conv = conv or (s == target)
            prev = t
        ns += 1
        nc += conv

    got = events_session_conversion(str(tmp_path)).to_pandas()
    r = got.iloc[0]
    assert (r.n_sessions, r.n_converted) == (ns, nc)
    assert r.conv_permille == (1000 * nc) // ns


def test_mix_concentration_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_mix_concentration

    types, ts, _ = _write_events(tmp_path, seed=83)
    cell = collections.Counter((int(t // DAY_US), s) for t, s in zip(ts, types))
    days = collections.defaultdict(lambda: [0, 0])
    for (d, _), n in cell.items():
        days[d][0] += n
        days[d][1] += n * (n - 1)

    got = events_mix_concentration(str(tmp_path)).to_pandas()
    assert len(got) == len(days)
    for r in got.itertuples():
        d = int(r.day_ts.value // 1000 // DAY_US)
        assert (r.n_events, r.simpson_num) == tuple(days[d])


def test_longest_per_source_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import longest_per_source

    g = np.random.default_rng(84)
    lens = g.integers(1, 40, 120).astype(np.int64)
    # tie run at the top of s1 so the doc_id tie-break is exercised
    lens[60:64] = 40
    texts = ["x" * int(L) for L in lens]
    srcs = [f"s{i % 2}" for i in range(120)]
    _write_docs(tmp_path, texts, srcs)

    want = collections.defaultdict(list)
    for i, (L, s) in enumerate(zip(lens, srcs)):
        want[s].append((int(-L), i))
    got = longest_per_source(str(tmp_path), k=3).to_pandas()
    assert len(got) == 6
    for s, items in want.items():
        items.sort()
        rows = got[got.source == s].sort_values("rank")
        for rank, ((negL, i), r) in enumerate(
            zip(items[:3], rows.itertuples()), 1
        ):
            assert (r.doc_id, r.n_chars, r.rank) == (i, -negL, rank)


def test_week_retention_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_week_retention

    WEEK_US = 7 * DAY_US
    MONDAY0 = 4 * DAY_US
    _, ts, users = _write_events(tmp_path, seed=85)
    pairs = {(int(u), int((t - MONDAY0) // WEEK_US)) for u, t in zip(users, ts)}
    weeks = collections.defaultdict(lambda: [0, 0])
    for u, w in pairs:
        weeks[w][0] += 1
        if (u, w - 1) in pairs:
            weeks[w][1] += 1

    got = events_week_retention(str(tmp_path)).to_pandas()
    assert len(got) == len(weeks)
    for r in got.itertuples():
        w = int((r.week_ts.value // 1000 - MONDAY0) // WEEK_US)
        n, nr = weeks[w]
        assert (r.n_users, r.n_retained) == (n, nr), w
        assert r.retained_permille == (1000 * nr) // n


def test_novelty_by_source_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import novelty_by_source

    g = np.random.default_rng(86)
    vocab = [f"w{i}" for i in range(10)]
    texts = [
        " ".join(g.choice(vocab, size=g.integers(3, 15))) for _ in range(60)
    ]
    srcs = [f"s{i % 3}" for i in range(60)]
    _write_docs(tmp_path, texts, srcs)

    def shingles(t):
        w = t.split(" ")
        return {" ".join(w[i : i + 3]) for i in range(max(len(w) - 2, 1))}

    first = {}
    per_doc = [shingles(t) for t in texts]
    for i, sh in enumerate(per_doc):
        for s in sh:
            first.setdefault(s, i)
    want = collections.defaultdict(lambda: [0, 0])
    for i, (sh, src) in enumerate(zip(per_doc, srcs)):
        c = want[src]
        c[0] += len(sh)
        c[1] += sum(1 for s in sh if first[s] == i)

    got = novelty_by_source(str(tmp_path)).to_pandas().set_index("source")
    assert len(got) == len(want)
    for src, (n, nv) in want.items():
        assert got.loc[src].n_shingles == n
        assert got.loc[src].n_novel == nv
        assert got.loc[src].novelty_permille == (1000 * nv) // n
