"""Round-4 wave-51 operators: E102 entry-vs-habit agreement board, T102
candidate-pair budget (second moment of the shingle df spectrum), T103
exact-duplicate vector board (planted bit-identical vectors) — each vs a
scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_first_vs_primary_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_first_vs_primary

    g = np.random.default_rng(370)
    n, n_users = 4000, 120
    types = np.array(["click", "view", "buy", "scroll"])[g.integers(0, 4, n)]
    users = g.integers(0, n_users, n).astype(np.int64)
    ts = (
        np.datetime64("2026-01-01", "us").astype(np.int64)
        + g.integers(0, 10**9, n).astype(np.int64)
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "user_id": pa.array(users),
                "event_type": pa.array(types.tolist()),
                "value": pa.array(np.ones(n)),
                "props": pa.array(["{}"] * n),
            }
        ),
        tmp_path / "events.parquet",
    )

    per_user = collections.defaultdict(list)
    for i in range(n):
        per_user[int(users[i])].append((int(ts[i]), i, types[i]))
    nf = collections.Counter()
    np_ = collections.Counter()
    nb = collections.Counter()
    for u, evs in per_user.items():
        first = min(evs)[2]
        cnt = collections.Counter(t for _, _, t in evs)
        primary = min(cnt, key=lambda t: (-cnt[t], t))
        nf[first] += 1
        np_[primary] += 1
        if first == primary:
            nb[first] += 1

    got = events_first_vs_primary(str(tmp_path)).to_pandas().set_index(
        "source"
    )
    assert len(got) == 4
    for t in ("click", "view", "buy", "scroll"):
        r = got.loc[t]
        assert (int(r.n_first), int(r.n_primary), int(r.n_both)) == (
            nf[t],
            np_[t],
            nb[t],
        ), t
    assert int(got.n_first.sum()) == len(per_user)
    assert int(got.n_primary.sum()) == len(per_user)


def test_pair_budget_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import pair_budget

    texts = [
        "alpha beta gamma delta",
        "alpha beta gamma epsilon",
        "zeta alpha beta gamma eta",
        "one two three four five",
        "one two three four five",
        "short doc",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["s"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    df = collections.Counter()
    for t in texts:
        w = t.split(" ")
        sh = {" ".join(w[i : i + 3]) for i in range(max(len(w) - 2, 1))}
        for s in sh:
            df[s] += 1

    got = pair_budget(str(tmp_path)).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert int(r.n_shingles) == len(df)
    assert int(r.n_postings) == sum(df.values())
    assert int(r.n_candidate_pairs) == sum(
        v * (v - 1) // 2 for v in df.values()
    )
    assert int(r.n_candidate_pairs) >= 4  # planted df=3 and df=2 groups


def test_embedding_dup_vectors_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import embedding_dup_vectors

    g = np.random.default_rng(371)
    n, d = 300, 10
    vecs = g.normal(size=(n, d)).astype(np.float32)
    labels = g.integers(0, 4, n).astype(np.int32)
    # plant exact dups: rows 10..19 copy row 0 (same label), rows 20..24
    # copy row 1's bytes but carry a DIFFERENT label (must stay distinct
    # within their own label)
    vecs[10:20] = vecs[0]
    labels[10:20] = labels[0]
    vecs[20:25] = vecs[1]
    labels[20:25] = (labels[1] + 1) % 4
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
                "label": pa.array(labels),
            }
        ),
        tmp_path / "embeddings.parquet",
    )

    want = collections.defaultdict(lambda: [0, set()])
    for i in range(n):
        w = want[int(labels[i])]
        w[0] += 1
        w[1].add(vecs[i].tobytes())

    got = embedding_dup_vectors(str(tmp_path)).to_pandas().set_index("label")
    assert len(got) == len(want)
    for lab, (raw, uniq) in want.items():
        r = got.loc[lab]
        assert (int(r.n_vecs), int(r.n_distinct), int(r.n_echo)) == (
            raw,
            len(uniq),
            raw - len(uniq),
        ), lab
    assert int(got.n_echo.sum()) >= 10 + 4  # both planted groups collapse
