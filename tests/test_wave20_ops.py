"""Round-4 wave-20 operators: E75 ramp detector (strictly-rising minute
runs over the dense grid), E76 session-size histogram, T67 length/token
second-moment stats — each vs a scalar brute-force reference.  The ramp
fixture clusters events into few minutes so rises, plateaus, falls and
gap-zeros all occur; the window_buckets=4 run exercises the summary
fold across many window boundaries."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MIN_US = 60_000_000
HOUR_US = 3_600_000_000


def _write_events(tmp_path, seed: int, n: int = 700, minutes: int = 90):
    from mq_to_db_ray.pipelines.events import EVENTS_T0_US

    g = np.random.default_rng(seed)
    types = np.array(["a", "b"])[g.integers(0, 2, n)]
    # cluster into a narrow minute range so counts rise/fall/plateau
    ts = EVENTS_T0_US + g.integers(0, minutes, n).astype(np.int64) * MIN_US
    users = (g.zipf(1.6, n) % 30).astype(np.int64)
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


def _ramp_brute(types, ts):
    out = {}
    for s in set(types):
        mins = [int(t) // MIN_US for t, ty in zip(ts, types) if ty == s]
        lo, hi = min(mins), max(mins)
        counts = collections.Counter(mins)
        grid = [counts.get(m, 0) for m in range(lo, hi + 1)]
        runs, cur = [], 0
        for prev, nxt in zip(grid[:-1], grid[1:]):
            if nxt > prev:
                cur += 1
            elif cur:
                runs.append(cur)
                cur = 0
        if cur:
            runs.append(cur)
        if runs:
            out[s] = (max(runs), len(runs), sum(runs))
    return out


def test_ramps_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_ramps

    types, ts, _ = _write_events(tmp_path, seed=105)
    want = _ramp_brute(types, ts)
    assert want  # fixture must contain rises

    for wb in (4096, 4):  # default + many-window fold
        got = events_ramps(str(tmp_path), window_buckets=wb).to_pandas()
        assert len(got) == len(want), wb
        for r in got.itertuples():
            assert (r.max_ramp, r.n_ramps, r.n_rising) == want[r.source], (
                r.source,
                wb,
            )


def test_session_size_hist_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_session_size_hist

    GAP_US = 6 * HOUR_US
    # spread events over days so multiple sessions form
    from mq_to_db_ray.pipelines.events import EVENTS_T0_US

    g = np.random.default_rng(106)
    n = 600
    ts = EVENTS_T0_US + g.integers(0, 20 * 24, n).astype(np.int64) * HOUR_US
    users = (g.zipf(1.6, n) % 30).astype(np.int64)
    tbl = pa.table(
        {
            "event_type": pa.array(["a"] * n),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(np.ones(n)),
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(users),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")

    per_user = collections.defaultdict(list)
    for i, (t, u) in enumerate(zip(ts, users)):
        per_user[int(u)].append((int(t), i))
    hist = collections.Counter()
    for evs in per_user.values():
        evs.sort()
        sizes = [1]
        last = evs[0][0]
        for t, _ in evs[1:]:
            if t - last > GAP_US:
                sizes.append(1)
            else:
                sizes[-1] += 1
            last = t
        hist.update(sizes)

    got = events_session_size_hist(str(tmp_path)).to_pandas()
    assert dict(zip(got.n_events, got.n_sessions)) == dict(hist)


def test_len_token_stats_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import len_token_stats

    g = np.random.default_rng(107)
    vocab = [f"w{i}" for i in range(20)]
    texts = [
        " ".join(g.choice(vocab, size=g.integers(1, 15))) for _ in range(90)
    ]
    srcs = [f"s{i % 3}" for i in range(90)]
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

    want = {}
    for s in set(srcs):
        docs = [(len(t), len(t.split(" "))) for t, ss in zip(texts, srcs) if ss == s]
        want[s] = (
            len(docs),
            sum(c for c, _ in docs),
            sum(w for _, w in docs),
            sum(c * c for c, _ in docs),
            sum(w * w for _, w in docs),
            sum(c * w for c, w in docs),
        )

    got = len_token_stats(str(tmp_path)).to_pandas().set_index("source")
    assert len(got) == len(want)
    for s, (nd, sc, st, scq, stq, sx) in want.items():
        r = got.loc[s]
        assert (
            r.n_docs,
            r.sum_chars,
            r.sum_tokens,
            r.sum_chars_sq,
            r.sum_tokens_sq,
            r.sum_cross,
        ) == (nd, sc, st, scq, stq, sx)
