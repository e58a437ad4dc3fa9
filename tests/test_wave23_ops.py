"""Round-4 wave-23 operators: E80 primary-type board (grouped argmax
with a deterministic tie rule), E81 inter-arrival exact quantiles on the
carried-prefix machinery, T70 type-token-ratio quantiles — each vs a
scalar brute-force reference.  The E80 fixture forces count ties so the
type-ascending tie-break is load-bearing; E81 runs at window_us small
enough that most gaps CROSS window boundaries."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MIN_US = 60_000_000
HOUR_US = 3_600_000_000


def _write_events(tmp_path, seed: int, n: int = 800):
    from mq_to_db_ray.pipelines.events import EVENTS_T0_US

    g = np.random.default_rng(seed)
    types = np.array(["a", "b", "c"])[g.integers(0, 3, n)]
    ts = EVENTS_T0_US + g.integers(0, 48 * 60, n).astype(np.int64) * MIN_US
    users = (g.zipf(1.6, n) % 40).astype(np.int64)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(types.tolist()),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "value": pa.array(np.ones(n)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(users),
            }
        ),
        tmp_path / "events.parquet",
    )
    return types, ts, users


def test_primary_type_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_primary_type

    types, _, users = _write_events(tmp_path, seed=120)
    per_user = collections.defaultdict(collections.Counter)
    for t, u in zip(types, users):
        per_user[int(u)][t] += 1
    # the fixture must contain at least one tie at the top
    assert any(
        len({c for _, c in cnt.most_common(2)}) == 1 and len(cnt) > 1
        for cnt in per_user.values()
    )
    want = collections.Counter(
        min(
            (t for t, c in cnt.items() if c == max(cnt.values()))
        )  # tie -> alphabetical
        for cnt in per_user.values()
    )

    got = events_primary_type(str(tmp_path)).to_pandas()
    assert dict(zip(got.primary_type, got.n_users)) == dict(want)


def test_interarrival_quantiles_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_interarrival_quantiles

    types, ts, _ = _write_events(tmp_path, seed=121)
    per_src = collections.defaultdict(list)
    for i, (t, s) in enumerate(zip(ts, types)):
        per_src[s].append((int(t), i))
    want = {}
    for s, evs in per_src.items():
        evs.sort()
        gaps = sorted(
            (b[0] - a[0]) // 1_000_000 for a, b in zip(evs[:-1], evs[1:])
        )
        want[s] = gaps

    # default window + a window smaller than typical gaps (cross-window
    # carries dominate)
    for wus in (None, 30 * MIN_US):
        kw = {} if wus is None else {"window_us": wus}
        got = events_interarrival_quantiles(str(tmp_path), **kw).to_pandas()
        assert len(got) == len(want), wus
        for r in got.itertuples():
            gaps = want[r.source]
            n = len(gaps)
            assert r.n_gaps == n, (r.source, wus)
            for q, col in ((500, "p50_s"), (900, "p90_s"), (990, "p99_s")):
                thr = (n * q + 999) // 1000
                assert getattr(r, col) == gaps[thr - 1], (r.source, col, wus)


def test_ttr_quantiles_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import ttr_quantiles

    g = np.random.default_rng(122)
    vocab = [f"w{i}" for i in range(8)]
    texts = [
        " ".join(g.choice(vocab, size=g.integers(1, 25))) for _ in range(120)
    ]
    srcs = [f"s{i % 3}" for i in range(120)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(srcs),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    per_src = collections.defaultdict(list)
    for t, s in zip(texts, srcs):
        ws = t.split(" ")
        per_src[s].append(1000 * len(set(ws)) // len(ws))

    got = ttr_quantiles(str(tmp_path)).to_pandas().set_index("source")
    assert len(got) == len(per_src)
    for s, vals in per_src.items():
        sv = sorted(vals)
        n = len(sv)
        r = got.loc[s]
        assert r.n_docs == n
        for q, col in ((500, "p50"), (900, "p90"), (990, "p99")):
            thr = (n * q + 999) // 1000
            assert r[col] == sv[thr - 1], (s, col)
