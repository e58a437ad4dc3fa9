"""Round-4 sixth-wave operators: seasonal minute-of-hour profile,
events-per-user activity histogram, per-source lexical diversity, and the
distributed EWMA grid scan — each vs a scalar brute-force reference on
synthetic inputs hitting the edge cases (sparse grids so gap-filled zero
minutes count, a user present in many blocks, hapax words shared across
sources, window-boundary carries)."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pytest


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


def _write_events(tmp_path, seed: int, n: int = 900, minutes: int = 200):
    import pyarrow.parquet as pq

    from mq_to_db_ray.pipelines.events import EVENTS_T0_US

    g = _rng(seed)
    tier_us = 60 * 1_000_000
    types = np.array(["a", "b", "c"])[g.integers(0, 3, n)]
    # sparse: 200-minute span for ~300 events/source -> gap-filled zero
    # minutes exist, and the span crosses hour boundaries (minute-of-hour
    # wraps) and is not hour-aligned
    ts = EVENTS_T0_US + 37 * tier_us + g.integers(
        0, minutes * tier_us, n
    ).astype(np.int64)
    val = g.integers(0, 600, n).astype(np.float64) + 0.25
    tbl = pa.table(
        {
            "event_type": pa.array(types.tolist()),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(val),
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            # heavy-tailed users: user 0 hot, many singletons
            "user_id": pa.array(
                np.where(
                    g.random(n) < 0.2, 0, g.integers(1, 400, n)
                ).astype(np.int64)
            ),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    return types, ts


def test_seasonal_profile_matches_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import (
        EVENTS_T0_US,
        events_seasonal_profile,
    )

    types, ts = _write_events(tmp_path, seed=71)
    tier_us = 60 * 1_000_000

    want: dict[tuple[str, int], list[int]] = {}
    for s in np.unique(types):
        mins = (ts[types == s] - EVENTS_T0_US) // tier_us
        counts = collections.Counter(mins.tolist())
        for m in range(int(mins.min()), int(mins.max()) + 1):
            key = (str(s), m % 60)
            slot = want.setdefault(key, [0, 0])
            slot[0] += 1
            slot[1] += counts.get(m, 0)

    got = events_seasonal_profile(str(tmp_path)).to_pandas()
    assert len(got) == len(want)
    for row in got.itertuples(index=False):
        n_slots, total = want[(row.source, row.minute_of_hour)]
        assert (row.n_slots, row.total_count) == (n_slots, total)


def test_user_hist_matches_bruteforce(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from mq_to_db_ray.pipelines.events import events_user_hist

    _write_events(tmp_path, seed=73)
    users = pq.read_table(tmp_path / "events.parquet", columns=["user_id"])[
        "user_id"
    ].to_numpy()
    per_user = collections.Counter(users.tolist())
    want = collections.Counter(per_user.values())

    got = events_user_hist(str(tmp_path)).to_pandas()
    assert len(got) == len(want)
    for row in got.itertuples(index=False):
        assert want[row.events_per_user] == row.n_users
    # the hot user's level is present exactly once
    assert (got["n_users"] > 0).all()


def _write_docs(tmp_path, seed: int, n: int = 150, n_src: int = 3):
    import pyarrow.parquet as pq

    g = _rng(seed)
    # small vocab -> plenty of repeats; per-doc unique suffix -> hapaxes
    vocab = np.array([f"w{i}" for i in range(40)])
    texts, srcs = [], []
    for i in range(n):
        k = int(g.integers(1, 20))
        words = vocab[g.integers(0, len(vocab), k)].tolist()
        if i % 7 == 0:
            words.append(f"hapax{i}")  # guaranteed count-1 word
        texts.append(" ".join(words))
        srcs.append(f"s{int(g.integers(0, n_src))}")
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n),
            "source": pa.array(srcs),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    return texts, srcs


def test_lexical_diversity_matches_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import lexical_diversity

    texts, srcs = _write_docs(tmp_path, seed=79)
    per_src: dict[str, collections.Counter] = collections.defaultdict(
        collections.Counter
    )
    for t, s in zip(texts, srcs):
        per_src[s].update(t.split(" "))

    got = lexical_diversity(str(tmp_path)).to_pandas()
    assert len(got) == len(per_src)
    for row in got.itertuples(index=False):
        c = per_src[row.source]
        assert row.n_tokens == sum(c.values())
        assert row.n_types == len(c)
        assert row.n_hapax == sum(1 for v in c.values() if v == 1)


@pytest.mark.parametrize("window_buckets", [16, 4096])
def test_ewma_matches_serial(ray_session, tmp_path, window_buckets):
    """window_buckets=16 forces many cross-window carries on a 200-minute
    grid; 4096 is the single-window fast case.  Both must match the
    serial zero-initialized recurrence to float tolerance."""
    from mq_to_db_ray.pipelines.events import (
        EVENTS_T0_US,
        events_ewma_1m,
    )

    types, ts = _write_events(tmp_path, seed=83)
    tier_us = 60 * 1_000_000
    alpha = 0.125

    got = (
        events_ewma_1m(str(tmp_path), window_buckets=window_buckets)
        .to_pandas()
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )

    for s in np.unique(types):
        mins = (ts[types == s] - EVENTS_T0_US) // tier_us
        counts = collections.Counter(mins.tolist())
        lo, hi = int(mins.min()), int(mins.max())
        xs = np.array([counts.get(m, 0) for m in range(lo, hi + 1)], float)
        want = np.empty(len(xs))
        prev = 0.0
        for i, x in enumerate(xs):
            prev = alpha * x + (1.0 - alpha) * prev
            want[i] = prev
        sub = got[got["source"] == str(s)]
        assert len(sub) == len(xs)
        assert (sub["count"].to_numpy() == xs).all()
        np.testing.assert_allclose(
            sub["ewma"].to_numpy(), want, rtol=1e-9, atol=1e-12
        )


def test_freq_spectrum_matches_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import freq_spectrum

    texts, _ = _write_docs(tmp_path, seed=89)
    corpus = collections.Counter()
    for t in texts:
        corpus.update(t.split(" "))
    want = collections.Counter(corpus.values())

    got = freq_spectrum(str(tmp_path)).to_pandas()
    assert len(got) == len(want)
    for row in got.itertuples(index=False):
        assert want[row.word_count] == row.n_words
    # hapax suffixes guarantee the c=1 bin exists
    assert (got["word_count"] == 1).any()


@pytest.mark.parametrize("n_blocks", [1, 7])
def test_cusum_matches_bruteforce(ray_session, tmp_path, n_blocks):
    """grid_cusum on a shuffled, multi-block dense grid: random row order
    scatters each source's run structure into per-block fragments (down
    to singleton runs), which the driver fold must re-tile exactly."""
    import ray.data as rd

    from mq_to_db_ray.pipelines.events import EVENTS_T0_US
    from mq_to_db_ray.stages.temporal import grid_cusum

    g = _rng(97)
    tier_us = 60 * 1_000_000
    rows = []
    for s, n in (("a", 300), ("b", 37), ("c", 1)):
        counts = g.integers(0, 9, n)
        counts[n // 2 :] += 6  # level shift mid-series: CUSUM must climb
        for i, c in enumerate(counts):
            rows.append((s, EVENTS_T0_US + i * tier_us, int(c)))
    g.shuffle(rows)
    tbl = pa.table(
        {
            "source": pa.array([r[0] for r in rows]),
            "bucket_ts": pa.array(
                np.array([r[1] for r in rows], np.int64), pa.int64()
            ).cast(pa.timestamp("us")),
            "count": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    ds = rd.from_arrow(tbl).repartition(n_blocks)
    got = (
        grid_cusum(ds, "1m", "count", t0_us=EVENTS_T0_US)
        .to_pandas()
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )

    by_src = collections.defaultdict(list)
    for s, t, c in rows:
        by_src[s].append((t, c))
    n_checked = 0
    for s, pairs in by_src.items():
        pairs.sort()
        xs = np.array([c for _, c in pairs], np.int64)
        k = -(-int(xs.sum()) // len(xs))  # ceil(mean)
        cu, want = 0, []
        for x in xs:
            cu = max(0, cu + int(x) - k)
            want.append(cu)
        sub = got[got["source"] == s]
        assert sub["cusum"].tolist() == want
        n_checked += len(want)
    assert n_checked == len(got)
