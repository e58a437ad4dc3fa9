"""Round-4 seventh-wave operators: per-(source, minute) user concentration,
per-source log2-binned inter-arrival histogram, and per-doc word
concentration — each vs a scalar brute-force reference on synthetic inputs
hitting the edge cases (a hot user split across many blocks, zero-length
gaps / ties in (ts, event_id) order, window-boundary carries, repeated and
hapax words, empty text)."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pytest


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


def _write_events(tmp_path, seed: int, n: int = 900, minutes: int = 60):
    import pyarrow.parquet as pq

    from mq_to_db_ray.pipelines.events import EVENTS_T0_US

    g = _rng(seed)
    tier_us = 60 * 1_000_000
    types = np.array(["a", "b", "c"])[g.integers(0, 3, n)]
    # coarse timestamps so zero-length gaps (ties) exist; event_id breaks
    # the ties deterministically
    ts = EVENTS_T0_US + 37 * tier_us + (
        g.integers(0, minutes * 6, n).astype(np.int64) * (tier_us // 6)
    )
    users = np.where(g.random(n) < 0.3, 0, g.integers(1, 120, n)).astype(
        np.int64
    )
    tbl = pa.table(
        {
            "event_type": pa.array(types.tolist()),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(g.random(n)),
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(users),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    return types, ts, users


def test_user_conc_matches_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_user_conc_1m

    types, ts, users = _write_events(tmp_path, seed=83)
    tier_us = 60 * 1_000_000

    per_bucket_user = collections.Counter(
        zip(types.tolist(), (ts // tier_us).tolist(), users.tolist())
    )
    want: dict[tuple[str, int], list[int]] = {}
    for (src, bk, _u), c in per_bucket_user.items():
        n, nu, scc = want.setdefault((src, bk), [0, 0, 0])
        want[(src, bk)] = [n + c, nu + 1, scc + c * (c - 1)]

    out = events_user_conc_1m(str(tmp_path)).to_pandas()
    got = {
        (r.source, int(r.bucket_ts.value // 1000) // tier_us): [
            int(r.n),
            int(r.n_users),
            int(r.sum_cc),
        ]
        for r in out.itertuples()
    }
    assert got == want


def test_interarrival_hist_matches_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_interarrival_hist

    types, ts, _ = _write_events(tmp_path, seed=97)

    want: collections.Counter = collections.Counter()
    for src in np.unique(types):
        sub = np.sort(ts[types == src])  # event_id order == ts order here
        # ties: stable sort keeps event_id order within equal ts, and the
        # gap of a tie is 0 regardless of which tied row is "previous"
        for gap in np.diff(sub):
            gap = int(gap)
            want[(str(src), 0 if gap == 0 else gap.bit_length())] += 1

    out = events_interarrival_hist(str(tmp_path)).to_pandas()
    got = {
        (r.source, int(r.gap_bin)): int(r.n_gaps) for r in out.itertuples()
    }
    assert got == dict(want)
    # ties in the fixture guarantee bin 0 is exercised
    assert any(b == 0 for (_s, b) in got)


@pytest.mark.parametrize("window_us", [7 * 60 * 1_000_000, 60 * 1_000_000])
def test_interarrival_hist_window_invariant(ray_session, tmp_path, window_us):
    """The (source, ts-window) sub-partitioning must not change the result:
    carries supply cross-window predecessors bit-exactly."""
    from mq_to_db_ray.pipelines.events import events_interarrival_hist

    _write_events(tmp_path, seed=101)
    base = (
        events_interarrival_hist(str(tmp_path))
        .to_pandas()
        .sort_values(["source", "gap_bin"])
        .reset_index(drop=True)
    )
    win = (
        events_interarrival_hist(str(tmp_path), window_us=window_us)
        .to_pandas()
        .sort_values(["source", "gap_bin"])
        .reset_index(drop=True)
    )
    assert base.equals(win)


def test_word_concentration_matches_bruteforce(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from mq_to_db_ray.pipelines.training_data import word_concentration

    texts = [
        "the cat sat on the mat the end",
        "one two three four",
        "",  # '' -> [''] single empty word (split convention)
        "spam spam spam spam",
        "a a b b c",
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")

    out = (
        word_concentration(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    for i, text in enumerate(texts):
        words = text.split(" ")
        counts = collections.Counter(words)
        assert int(out.loc[i, "n_tokens"]) == len(words)
        assert int(out.loc[i, "n_types"]) == len(counts)
        assert int(out.loc[i, "sum_cc"]) == sum(
            c * (c - 1) for c in counts.values()
        )


@pytest.mark.parametrize("window_buckets", [16, 4096])
def test_holt_matches_serial_recurrence(ray_session, tmp_path, window_buckets):
    """grid_holt (eigen-decoupled distributed scan) vs the literal serial
    level/trend recurrence — to rounding (the eigenbasis reassociates
    float ops), across window-boundary carries (wb=16 forces many)."""
    from mq_to_db_ray.pipelines.events import EVENTS_T0_US, events_holt_1m

    types, ts, _ = _write_events(tmp_path, seed=113, n=700, minutes=300)
    tier_us = 60 * 1_000_000
    alpha, beta = 0.2, 0.1

    out = (
        events_holt_1m(
            str(tmp_path), alpha=alpha, beta=beta,
            window_buckets=window_buckets,
        )
        .to_pandas()
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )

    for src in np.unique(types):
        sub = out[out.source == src]
        # dense-grid counts between the source's first and last minute
        bks = ts[types == src] // tier_us
        lo, hi = bks.min(), bks.max()
        counts = np.bincount((bks - lo).astype(np.int64), minlength=hi - lo + 1)
        assert len(sub) == hi - lo + 1
        assert sub["count"].to_numpy().tolist() == counts.tolist()
        l = b = 0.0
        want_l, want_b = [], []
        for x in counts:
            l_new = alpha * x + (1 - alpha) * (l + b)
            b = beta * (l_new - l) + (1 - beta) * b
            l = l_new
            want_l.append(l)
            want_b.append(b)
        np.testing.assert_allclose(
            sub["level"].to_numpy(), want_l, rtol=1e-8, atol=1e-8
        )
        np.testing.assert_allclose(
            sub["trend"].to_numpy(), want_b, rtol=1e-8, atol=1e-8
        )
