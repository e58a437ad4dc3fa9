"""E23/E24: distinct-cardinality rollups — exact dedupe-combiner COUNT
DISTINCT (driver-oracle-checked) and its HyperLogLog scale path.

The HLL checks: estimator accuracy across cardinality regimes (linear
counting through the raw estimator), split-merge associativity (sparse
register state folded in any order gives the same estimate), and the
full Ray pipeline landing within the error bound of the exact operator
on the driver testdata.
"""

from __future__ import annotations

import numpy as np
import pytest


def _sparse_state(ids: np.ndarray, p: int = 12):
    """Reference single-group sparse fold: (inv_sum, present)."""
    from mq_to_db_ray.functions.hll import hll_ranks

    reg, rank = hll_ranks(ids, p=p)
    order = np.lexsort((rank, reg))
    rs, ks = reg[order], rank[order]
    last = np.empty(len(rs), dtype=bool)
    last[-1] = True
    last[:-1] = rs[1:] != rs[:-1]
    ks = ks[last]
    return float(np.exp2(-ks.astype(np.float64)).sum()), int(last.sum())


@pytest.mark.parametrize("true_n", [50, 500, 5_000, 200_000])
def test_hll_accuracy(true_n):
    from mq_to_db_ray.functions.hll import hll_estimate_sparse

    g = np.random.default_rng(true_n)
    ids = g.choice(1 << 60, size=true_n, replace=False).astype(np.int64)
    ids = np.repeat(ids, 3)  # duplicates must not change the estimate
    inv, pres = _sparse_state(ids)
    est = int(
        hll_estimate_sparse(np.array([inv]), np.array([pres]))[0]
    )
    assert abs(est - true_n) / true_n < 0.05  # p=12 -> ~1.6% typical


def test_hll_merge_associativity():
    """Folding register state over any split of the input gives exactly
    the state of the whole input (max per register is associative)."""
    from mq_to_db_ray.functions.hll import hll_ranks

    g = np.random.default_rng(99)
    ids = g.integers(0, 1 << 60, 30_000).astype(np.int64)

    def fold(chunks):
        best: dict[int, int] = {}
        for c in chunks:
            reg, rank = hll_ranks(c)
            for r, k in zip(reg.tolist(), rank.tolist()):
                if k > best.get(r, 0):
                    best[r] = k
        return sorted(best.items())

    whole = fold([ids])
    assert fold(np.array_split(ids, 7)) == whole
    assert fold(np.array_split(ids[::-1].copy(), 3)) == whole


def test_hll_pipeline_matches_exact(ray_session):
    """Full Ray pipeline: the HLL rollup must land within 5% of the exact
    distinct rollup on every (source, bucket) of the driver testdata."""
    from mq_to_db_ray.pipelines.events import (
        events_distinct_users_1m,
        events_distinct_users_hll_1m,
    )

    sf = "/root/testdata/sf0.001"
    exact = (
        events_distinct_users_1m(sf)
        .to_pandas()
        .set_index(["source", "bucket_ts"])["n_users"]
        .sort_index()
    )
    est = (
        events_distinct_users_hll_1m(sf)
        .to_pandas()
        .set_index(["source", "bucket_ts"])["n_users_est"]
        .sort_index()
    )
    assert list(exact.index) == list(est.index)
    rel = (est - exact).abs() / exact.clip(lower=1)
    # small buckets run linear counting (near-exact); allow 5% + 1 abs
    assert ((est - exact).abs() <= np.maximum(1, 0.05 * exact)).all(), (
        rel.sort_values().tail()
    )


def test_increase_window_invariance(ray_session):
    """E25: counter-increase must be invariant to the sub-window size —
    1-hour windows force carries across many more boundaries than the
    1-day default, and the result must be identical."""
    from mq_to_db_ray.pipelines.events import events_increase_1m

    sf = "/root/testdata/sf0.001"

    def run(wu):
        return (
            events_increase_1m(sf, window_us=wu)
            .to_pandas()
            .sort_values(["source", "bucket_ts"])
            .reset_index(drop=True)
        )

    base = run(86_400_000_000)
    for wu in (3_600_000_000, 600_000_000):
        got = run(wu)
        assert got.values.tolist() == base.values.tolist(), wu
