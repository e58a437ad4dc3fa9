"""Round-4 wave-66 operators: E113 source-concurrency histogram
(planted all-sources minute pins the top bucket), T120 quality
pass-rate by ingestion decile (planted failing decile; cross-checked
against the standalone fused filter), R47 top-k parts by discounted
revenue (planted runaway part pins rank 1) — each vs a scalar
brute-force reference."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_source_concurrency_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_source_concurrency

    g = np.random.default_rng(510)
    base = np.datetime64("2026-03-01", "us").astype(np.int64)
    n = 2500
    types = np.array(["a", "b", "c", "d"])
    et = types[g.integers(0, 4, n)]
    ts = base + g.integers(0, 2 * 86_400_000_000, n).astype(np.int64)
    # planted: one far-future minute where ALL FOUR sources fire
    t0 = base + 30 * 86_400_000_000
    et = np.append(et, types)
    ts = np.append(ts, [t0 + i * 1000 for i in range(4)])
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(et),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            }
        ),
        tmp_path / "events.parquet",
    )

    per_min = collections.defaultdict(set)
    for s, t in zip(et, ts):
        per_min[int(t) // 60_000_000].add(s)
    want = collections.Counter(len(v) for v in per_min.values())

    got = events_source_concurrency(str(tmp_path)).to_pandas()
    assert len(got) == len(want)
    for _, r in got.iterrows():
        assert int(r.n_minutes) == want[int(r.n_sources)], r.n_sources
    assert want[4] >= 1  # the planted minute reached the top bucket


def test_doc_quality_by_decile_matches_filter(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import (
        quality_by_decile,
        quality_filter,
    )

    g = np.random.default_rng(511)
    n = 200
    vocab = [
        "the", "a", "of", "and", "to", "in", "is",
        "model", "data", "train", "batch", "vector", "query", "merge",
        "sort", "join", "scan", "row", "key", "hash",
    ]
    texts, langs = [], []
    for i in range(n):
        if 140 <= i < 160:  # planted: decile 7 is all too-short docs
            texts.append("tiny doc")
            langs.append("en")
        else:
            k = int(g.integers(25, 80))
            texts.append(
                " ".join(vocab[int(g.integers(0, len(vocab)))]
                         for _ in range(k))
            )
            langs.append("en" if g.random() < 0.8 else "de")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(texts),
                "lang": pa.array(langs),
                "source": pa.array(["s0"] * n),
            }
        ),
        tmp_path / "documents.parquet",
    )

    kept = set(
        int(x)
        for x in quality_filter(str(tmp_path)).to_pandas().doc_id
    )
    want_pass = collections.Counter(d * 10 // n for d in kept)

    got = quality_by_decile(str(tmp_path)).to_pandas()
    assert list(got.decile) == list(range(10))
    assert int(got.n_docs.sum()) == n
    for _, r in got.iterrows():
        d = int(r.decile)
        assert int(r.n_docs) == sum(
            1 for i in range(n) if i * 10 // n == d
        )
        assert int(r.n_pass) == want_pass.get(d, 0), d
    assert int(got[got.decile == 7].iloc[0].n_pass) == 0  # plant held


def test_rel_top_parts_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import top_parts

    g = np.random.default_rng(512)
    n_part, n_lines = 200, 5000
    pkeys = np.arange(1, n_part + 1, dtype=np.int64)
    brands = np.array([f"B{k % 7}" for k in range(n_part)])
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(pkeys),
                "p_brand": pa.array(brands),
            }
        ),
        tmp_path / "part.parquet",
    )
    lpk = pkeys[g.integers(0, n_part, n_lines)]
    ext = g.uniform(900, 9000, n_lines)
    disc = g.integers(0, 10, n_lines) / 100.0
    # planted: part 42 gets 30 huge lines -> must be rank 1
    lpk = np.append(lpk, [42] * 30)
    ext = np.append(ext, [90000.0] * 30)
    disc = np.append(disc, [0.0] * 30)
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array(lpk),
                "l_extendedprice": pa.array(ext),
                "l_discount": pa.array(disc),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    agg = collections.defaultdict(lambda: [0, 0])
    for k, e, d in zip(lpk, ext, disc):
        w = agg[int(k)]
        w[0] += 1
        w[1] += math.floor(e * (1.0 - d))
    ranked = sorted(agg.items(), key=lambda kv: (-kv[1][1], kv[0]))[:10]

    got = top_parts(str(tmp_path)).to_pandas().sort_values("rank")
    assert len(got) == 10
    for (pk, (nl, rv)), (_, r) in zip(ranked, got.iterrows()):
        assert int(r.p_partkey) == pk
        assert int(r.n_lines) == nl
        assert int(r.revenue_floor) == rv
        assert r.p_brand == f"B{(pk - 1) % 7}"
    assert int(got.iloc[0].p_partkey) == 42
