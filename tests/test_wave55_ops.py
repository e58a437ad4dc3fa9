"""Round-4 wave-55 operators: T107/F token first-introduction
attribution (planted late-novel tokens from one source), T108
norm-extreme vector top-k (planted un-normalized outliers) — each vs a
scalar brute-force reference."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_f1_token_attribution_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import f1_token_attribution

    g = np.random.default_rng(400)
    n = 600
    srcs = [f"s{i % 3:02d}" for i in range(n)]
    toks = [
        g.integers(0, 80, size=g.integers(3, 15)).astype(np.int32)
        for _ in range(n)
    ]
    # tokens 90..94 appear ONLY in s01 sequences: s01 must own them
    for j in range(5):
        idx = 4 + 3 * j  # idx % 3 == 1 -> source s01
        toks[idx] = np.append(toks[idx], np.int32(90 + j))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([f"{s}-{i * 11:08d}" for i, s in enumerate(srcs)]),
                "tokens": pa.array(
                    [t.tolist() for t in toks], pa.list_(pa.int32())
                ),
                "n_tok": pa.array([len(t) for t in toks], pa.int32()),
                "source": pa.array(srcs),
            }
        ),
        tmp_path / "part-00000.parquet",
    )

    trip = set()
    for i, (s, t) in enumerate(zip(srcs, toks)):
        b = (i * 11) // 3600
        for tok in t:
            trip.add((int(tok), b, s))
    first = {}
    for tok, b, s in sorted(trip):
        first.setdefault(tok, (b, s))
    intro = collections.Counter(s for _, s in first.values())
    seen = collections.Counter()
    for s in {"s00", "s01", "s02"}:
        seen[s] = len({tok for tok, _, src in trip if src == s})

    got = f1_token_attribution(str(tmp_path)).to_pandas().set_index("source")
    assert len(got) == 3
    for s in ("s00", "s01", "s02"):
        r = got.loc[s]
        assert (int(r.n_tokens_seen), int(r.n_tokens_introduced)) == (
            seen[s],
            intro[s],
        ), s
    assert int(got.n_tokens_introduced.sum()) == len(first)
    assert intro["s01"] >= 5  # the planted late-novel tokens attribute


def test_embedding_norm_topk_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import embedding_norm_topk

    g = np.random.default_rng(401)
    n, d = 400, 8
    vecs = (g.normal(size=(n, d)) * 0.2).astype(np.float32)
    labels = g.integers(0, 5, n).astype(np.int32)
    # plant un-normalized outliers
    vecs[37] *= 50.0
    vecs[251] *= 30.0
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

    norm_q = [
        sum(int(math.floor(1000.0 * float(x) * float(x))) for x in row)
        for row in vecs
    ]
    want = sorted(range(n), key=lambda i: (-norm_q[i], i))[:10]

    got = embedding_norm_topk(str(tmp_path)).to_pandas()
    assert list(got.vec_id) == want
    for _, r in got.iterrows():
        assert int(r.norm_q) == norm_q[int(r.vec_id)]
        assert int(r.label) == int(labels[int(r.vec_id)])
    assert int(got.iloc[0].vec_id) == 37  # the biggest planted outlier
