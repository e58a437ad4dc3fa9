"""Round-4 fourth-wave operators: cross-source shingle overlap matrix,
corpus-frequency commonness score, lag-1 autocorrelation statistics —
each vs a scalar brute-force reference (string shingles/words, exactly
the oracle's identity, not the engine's 64-bit hashes)."""

from __future__ import annotations

import collections
import itertools

import numpy as np
import pyarrow as pa
import pytest


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


def _write_docs(tmp_path, seed: int, n: int = 120, n_src: int = 4):
    import pyarrow.parquet as pq

    g = _rng(seed)
    vocab = np.array([f"w{i}" for i in range(30)])
    texts, srcs = [], []
    for i in range(n):
        k = int(g.integers(1, 25))  # includes <3-word docs
        texts.append(" ".join(vocab[g.integers(0, len(vocab), k)]))
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


def _shingle_set(text: str) -> set[str]:
    w = text.split(" ")
    if len(w) < 3:
        return {" ".join(w)}
    return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}


def test_source_overlap_matches_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import source_overlap

    texts, srcs = _write_docs(tmp_path, seed=61)
    per_src: dict[str, set[str]] = collections.defaultdict(set)
    for t, s in zip(texts, srcs):
        per_src[s] |= _shingle_set(t)

    got = (
        source_overlap(str(tmp_path))
        .to_pandas()
        .sort_values(["source_a", "source_b"])
        .reset_index(drop=True)
    )
    want = {}
    for a, b in itertools.combinations(sorted(per_src), 2):
        c = len(per_src[a] & per_src[b])
        if c:
            want[(a, b)] = (len(per_src[a]), len(per_src[b]), c)
    assert len(got) == len(want)
    for row in got.itertuples(index=False):
        na, nb, c = want[(row.source_a, row.source_b)]
        assert (row.n_a, row.n_b, row.n_common) == (na, nb, c)
        assert row.jaccard_permille == 1000 * c // (na + nb - c)


def test_commonness_matches_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import commonness

    texts, _ = _write_docs(tmp_path, seed=67)
    ct: dict[str, int] = collections.Counter()
    for t in texts:
        ct.update(t.split(" "))

    got = (
        commonness(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(texts)
    for row in got.itertuples(index=False):
        words = texts[int(row.doc_id)].split(" ")
        assert row.n_words == len(words)
        assert row.commonness_sum == sum(ct[w] for w in words)


def test_autocorr_stats_match_bruteforce(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from mq_to_db_ray.pipelines.events import EVENTS_T0_US, events_autocorr_1m

    g = _rng(71)
    n = 700
    tier_us = 60 * 1_000_000
    types = np.array(["a", "b", "c"])[g.integers(0, 3, n)]
    ts = EVENTS_T0_US + g.integers(0, 50 * tier_us, n).astype(np.int64)
    tbl = pa.table(
        {
            "event_type": pa.array(types.tolist()),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(np.ones(n)),
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(np.zeros(n, np.int64)),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")

    counts: dict[tuple[str, int], int] = collections.defaultdict(int)
    for s, t in zip(types, ts):
        counts[(s, t // tier_us)] += 1

    got = events_autocorr_1m(str(tmp_path)).to_pandas().set_index("source")
    for s in np.unique(types):
        bks = [b for (s2, b) in counts if s2 == s]
        lo, hi = min(bks), max(bks)
        series = [counts.get((s, b), 0) for b in range(lo, hi + 1)]
        pairs = list(zip(series[:-1], series[1:]))
        row = got.loc[s]
        assert row["n_pairs"] == len(pairs)
        assert row["s_cur"] == sum(x for _, x in pairs)
        assert row["s_prev"] == sum(p for p, _ in pairs)
        assert row["s_cc"] == sum(p * x for p, x in pairs)
        assert row["s_cur2"] == sum(x * x for _, x in pairs)
        assert row["s_prev2"] == sum(p * p for p, _ in pairs)


@pytest.mark.parametrize("window_us", [5 * 60 * 1_000_000, 86_400_000_000])
def test_max_gap_matches_bruteforce(ray_session, tmp_path, window_us):
    """window_us=5min forces gaps to span carried-prefix windows."""
    import pyarrow.parquet as pq

    from mq_to_db_ray.pipelines.events import EVENTS_T0_US, events_max_gap

    g = _rng(73)
    n = 500
    types = np.array(["a", "b", "c"])[g.integers(0, 3, n)]
    ts = EVENTS_T0_US + g.integers(0, 3_600_000_000 * 4, n).astype(np.int64)
    ts[1] = ts[0]  # duplicate timestamp -> zero gap, still counted
    types[1] = types[0]
    tbl = pa.table(
        {
            "event_type": pa.array(types.tolist()),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(np.ones(n)),
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(np.zeros(n, np.int64)),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")

    got = (
        events_max_gap(str(tmp_path), window_us=window_us)
        .to_pandas()
        .set_index("source")
    )
    for s in np.unique(types):
        idx = np.flatnonzero(types == s)
        order = idx[np.lexsort((idx, ts[idx]))]
        gaps = np.diff(ts[order])
        assert got.loc[s, "n_gaps"] == len(gaps)
        assert got.loc[s, "max_gap_us"] == gaps.max()


def test_source_overlap_minhash_estimates_and_associativity(
    ray_session, tmp_path
):
    """Estimate within sketch tolerance of the exact T37 Jaccard; identical
    output regardless of input sharding (signature min is associative)."""
    import pyarrow.parquet as pq

    from mq_to_db_ray.pipelines.training_data import (
        source_overlap,
        source_overlap_minhash,
    )

    texts, srcs = _write_docs(tmp_path, seed=79, n=200, n_src=3)
    exact = source_overlap(str(tmp_path)).to_pandas()
    exact_j = {
        (r.source_a, r.source_b): r.jaccard_permille
        for r in exact.itertuples(index=False)
    }
    est = (
        source_overlap_minhash(str(tmp_path), num_perm=256)
        .to_pandas()
        .sort_values(["source_a", "source_b"])
        .reset_index(drop=True)
    )
    # every pair within ~4 sigma of the exact Jaccard (sigma ~ sqrt(j(1-j)/k))
    for r in est.itertuples(index=False):
        j = exact_j.get((r.source_a, r.source_b), 0)
        assert abs(r.est_jaccard_permille - j) <= 150, (r, j)

    # associativity: same rows re-sharded into 4 part files (and a shuffled
    # row order) -> bit-identical output, because per-batch signature
    # partials merge by elementwise min
    sharded = tmp_path / "sharded"
    shard_dir = sharded / "documents.parquet"
    shard_dir.mkdir(parents=True)
    tbl = pq.read_table(tmp_path / "documents.parquet")
    perm = _rng(80).permutation(tbl.num_rows)
    tbl = tbl.take(pa.array(perm, pa.int64()))
    qtr = tbl.num_rows // 4
    for i in range(4):
        lo = i * qtr
        hi = tbl.num_rows if i == 3 else (i + 1) * qtr
        pq.write_table(tbl.slice(lo, hi - lo), shard_dir / f"part-{i}.parquet")
    est2 = (
        source_overlap_minhash(str(sharded), num_perm=256)
        .to_pandas()
        .sort_values(["source_a", "source_b"])
        .reset_index(drop=True)
    )
    assert est.equals(est2)


def test_quantile_sketch_error_bound(ray_session, tmp_path):
    """DDSketch guarantee: each estimated quantile within alpha relative
    error of the exact quantile_disc value, every (source, bucket)."""
    import math

    import pyarrow.parquet as pq

    from mq_to_db_ray.pipelines.events import (
        EVENTS_T0_US,
        events_quantiles_sketch_1m,
    )

    g = _rng(83)
    n = 2000
    tier_us = 60 * 1_000_000
    types = np.array(["a", "b"])[g.integers(0, 2, n)]
    ts = EVENTS_T0_US + g.integers(0, 20 * tier_us, n).astype(np.int64)
    # heavy-tailed values incl. zeros so the zero bin is exercised
    val = np.where(
        g.random(n) < 0.1, 0.0, np.exp(g.normal(3.0, 2.0, n))
    )
    tbl = pa.table(
        {
            "event_type": pa.array(types.tolist()),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(val),
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(np.zeros(n, np.int64)),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")

    alpha = 0.02
    got = events_quantiles_sketch_1m(
        str(tmp_path), alpha_permille=20
    ).to_pandas()

    groups: dict[tuple[str, int], list[int]] = collections.defaultdict(list)
    for s, t, v in zip(types, ts, np.floor(val).astype(np.int64)):
        groups[(s, t // tier_us)].append(int(v))
    assert len(got) == len(groups)
    for row in got.itertuples(index=False):
        bk = row.bucket_ts.value // 1000 // tier_us
        vs = sorted(groups[(row.source, bk)])
        assert row.count == len(vs)
        for q, est in ((0.5, row.p50_est), (0.95, row.p95_est)):
            exact = vs[math.ceil(q * len(vs)) - 1]
            if exact == 0:
                assert est == 0.0
            else:
                # the sketch bins floor(value) ints; the bin's relative
                # guarantee is alpha plus the <1 integer flooring slack
                assert abs(est - exact) <= alpha * exact + 1e-9, (
                    row.source, bk, q, est, exact,
                )
