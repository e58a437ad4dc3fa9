"""Round-4 wave-13 operators: day-over-day/week-over-week daily deltas,
event-type transition matrix, source user-overlap matrix, per-source
character-class stats, token-length histogram — each vs a scalar
brute-force reference on synthetic inputs hitting the edge cases (absent
comparison days, single-event users, one-source users, unicode text,
repeated words across docs)."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY_US = 86_400_000_000


def _write_events(tmp_path, seed: int, n: int = 700, days: int = 10):
    from mq_to_db_ray.pipelines.events import EVENTS_T0_US

    g = np.random.default_rng(seed)
    types = np.array(["a", "b", "c", "d"])[g.integers(0, 4, n)]
    # sparse day coverage so dod/wow comparison days are often absent
    day_pool = np.array([0, 1, 2, 5, 7, 8, 9])
    ts = (
        EVENTS_T0_US
        + day_pool[g.integers(0, len(day_pool), n)] * DAY_US
        + g.integers(0, DAY_US, n)
    ).astype(np.int64)
    users = g.integers(0, 30, n).astype(np.int64)
    # single-event user: contributes no transitions
    users[0] = 29
    users[1:][users[1:] == 29] = 28
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


def test_dod_wow_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_dod_wow

    types, ts, _ = _write_events(tmp_path, seed=56)
    per_cell = collections.Counter(
        (s, int(t // DAY_US)) for s, t in zip(types, ts)
    )
    got = events_dod_wow(str(tmp_path)).to_pandas()
    assert len(got) == len(per_cell)
    for r in got.itertuples():
        day = int(r.day_ts.value // 1000 // DAY_US)
        n = per_cell[(r.source, day)]
        assert r.n_events == n
        assert r.dod_delta == n - per_cell.get((r.source, day - 1), 0)
        assert r.wow_delta == n - per_cell.get((r.source, day - 7), 0)


def test_transition_matrix_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_transition_matrix

    types, ts, users = _write_events(tmp_path, seed=57)
    per_user: dict[int, list] = collections.defaultdict(list)
    for i, (s, t, u) in enumerate(zip(types, ts, users)):
        per_user[int(u)].append((int(t), i, s))
    want: dict[tuple, int] = collections.defaultdict(int)
    for evs in per_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            want[(a, b)] += 1
    assert len(per_user[29]) == 1  # no transitions from the 1-event user

    got = events_transition_matrix(str(tmp_path)).to_pandas()
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[(r.from_type, r.to_type)] == r.n


def test_source_user_overlap_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_source_user_overlap

    types, _, users = _write_events(tmp_path, seed=58)
    per_user: dict[int, set] = collections.defaultdict(set)
    for s, u in zip(types, users):
        per_user[int(u)].add(s)
    want: dict[tuple, int] = collections.defaultdict(int)
    for ss in per_user.values():
        for a in ss:
            for b in ss:
                if a <= b:
                    want[(a, b)] += 1

    got = events_source_user_overlap(str(tmp_path)).to_pandas()
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[(r.source_a, r.source_b)] == r.n_users
    # diagonal is each source's reach
    reach = collections.Counter()
    for ss in per_user.values():
        for s in ss:
            reach[s] += 1
    diag = got[got.source_a == got.source_b].set_index("source_a")
    for s, n in reach.items():
        assert diag.loc[s].n_users == n


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


def test_charclass_stats_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import charclass_stats

    texts = [
        "abc 123 xyz",
        "über café 42",  # non-ascii codepoints
        "NOCAPS nor digits",
        "    ",  # spaces only
    ]
    srcs = ["s0", "s0", "s1", "s1"]
    _write_docs(tmp_path, texts, srcs)

    got = charclass_stats(str(tmp_path)).to_pandas().set_index("source")
    for s in ("s0", "s1"):
        joined = [t for t, ss in zip(texts, srcs) if ss == s]
        assert got.loc[s].n_chars == sum(len(t) for t in joined)
        assert got.loc[s].n_digits == sum(c.isdigit() for t in joined for c in t)
        assert got.loc[s].n_spaces == sum(c == " " for t in joined for c in t)
        assert got.loc[s].n_letters == sum(
            ("a" <= c <= "z") or ("A" <= c <= "Z") for t in joined for c in t
        )
        assert got.loc[s].n_non_ascii == sum(
            ord(c) > 127 for t in joined for c in t
        )


def test_token_length_hist_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import token_length_hist

    g = np.random.default_rng(59)
    vocab = ["a", "bb", "bb", "ccc", "dddd", "ee", "fff", "x" * 9]
    texts = [
        " ".join(g.choice(vocab, size=g.integers(1, 12))) for _ in range(60)
    ]
    _write_docs(tmp_path, texts, ["s0"] * len(texts))

    cnt = collections.Counter(w for t in texts for w in t.split(" "))
    occ: dict[int, int] = collections.defaultdict(int)
    dis: dict[int, int] = collections.defaultdict(int)
    for w, n in cnt.items():
        occ[len(w)] += n
        dis[len(w)] += 1

    got = token_length_hist(str(tmp_path)).to_pandas().set_index("word_len")
    assert len(got) == len(occ)
    for L in occ:
        assert got.loc[L].n_occurrences == occ[L]
        assert got.loc[L].n_words == dis[L]
