"""Similarity search over an embedding column (list<float>).

Brute-force cosine top-k as the exact baseline: the query matrix is
broadcast ONCE via ``ray.put`` and every ``map_batches`` task does one numpy
matmul per batch against it (never re-shipped per batch).  The scale path is
LSH bucketing (random hyperplane signs) so candidate sets shrink from N to
N/2^p per bucket before exact re-scoring.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd
from ray.data import Dataset


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(arr), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class BruteForceTopK:
    """Per-batch exact cosine scorer; query matrix fetched from the object
    store once per actor (``__init__``), not per batch."""

    def __init__(self, query_ref, id_col: str, vec_col: str, k: int):
        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        self.q = _normalize(np.atleast_2d(np.asarray(q, dtype=np.float64)))
        self.id_col, self.vec_col, self.k = id_col, vec_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, self.vec_col))
        sims = m @ self.q.T  # (batch, n_queries)
        best = sims.max(axis=1)
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        # local top-k per batch; global top-k is a tiny sort downstream
        k = min(self.k, len(best))
        idx = np.argpartition(-best, k - 1)[:k] if k else np.array([], dtype=int)
        # emit the candidate ids under the CALLER'S id column name — the
        # downstream global sort tie-breaks on self.id_col
        return pa.table(
            {
                self.id_col: ids.take(pa.array(idx, type=pa.int64())),
                "sim": pa.array(best[idx], type=pa.float64()),
            }
        )


def cosine_topk(
    ds: Dataset, query_vecs: np.ndarray, k: int = 10, *, id_col: str = "vec_id",
    vec_col: str = "embedding", concurrency: int | None = None,
) -> Dataset:
    """Exact top-k: per-batch local top-k (map_batches) then one tiny global
    sort+limit on <= k × num_batches candidate rows."""
    ref = ray.put(np.asarray(query_vecs, dtype=np.float64))
    candidates = ds.map_batches(
        BruteForceTopK(ref, id_col, vec_col, k),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
    )
    # deterministic tie-break on id: equal-cosine candidates at the k
    # boundary must resolve the same way as the SQL oracle's ORDER BY.
    # The 0-row typed stub keeps the sort schema-stable even when EVERY
    # candidate block is empty (a fully-filtered shard/corpus): Ray drops
    # the schema of all-empty map outputs, and a schema-less sort raises.
    stub = rd.from_arrow(
        pa.table(
            {id_col: pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
        )
    )
    return (
        candidates.sort(["sim", id_col], descending=[True, False])
        .limit(k)
        .union(stub)
    )


class NearDupScorer:
    """Embedding-cosine near-dup: each batch is scored against the FULL
    normalized matrix broadcast once via ``ray.put`` (O(N·B) per batch,
    O(N²) overall — exact).  Emits (vec_a, vec_b, sim_permille) pairs with
    vec_a < vec_b and cosine >= threshold.

    Scale path: at large N use ``near_dup_pairs_lsh`` (multi-table LSH
    bucketing + per-bucket exact scoring, exposed as the
    ``embedding_near_dup_lsh`` query) — same output contract, O(sum
    bucket²) instead of O(N²)."""

    def __init__(self, mat_ref, ids_ref, threshold_permille: int,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
        m = ray.get(mat_ref) if isinstance(mat_ref, ray.ObjectRef) else mat_ref
        ids = ray.get(ids_ref) if isinstance(ids_ref, ray.ObjectRef) else ids_ref
        self.mat = _normalize(np.asarray(m, dtype=np.float64))
        self.all_ids = np.asarray(ids, dtype=np.int64)
        self.thr = threshold_permille / 1000.0
        self.vec_col, self.id_col = vec_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, self.vec_col))
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        bid = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        sims = m @ self.mat.T  # (batch, N)
        # keep ordered pairs only: batch row id < other id (dedup + no self)
        mask = (sims >= self.thr) & (bid[:, None] < self.all_ids[None, :])
        bi, oj = np.nonzero(mask)
        return pa.table(
            {
                "vec_a": pa.array(bid[bi], type=pa.int64()),
                "vec_b": pa.array(self.all_ids[oj], type=pa.int64()),
                "sim_permille": pa.array(
                    np.floor(sims[bi, oj] * 1000).astype(np.int64)
                ),
            }
        )


def lsh_bucket_ids(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Random-hyperplane LSH bucket id per row (sign bits packed to int64)."""
    signs = (m @ planes.T) > 0
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    return (signs.astype(np.int64) * weights[None, :]).sum(axis=1)


def make_planes(dim: int, n_planes: int = 12, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))


def kmeans_centroids(
    sample: np.ndarray, n_centroids: int, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Deterministic Lloyd's k-means on a (small, driver-side) sample — the
    IVF coarse quantizer.  The sample IS the small side: centroids are then
    broadcast via ``ray.put`` and assignment is a per-batch matmul."""
    rng = np.random.RandomState(seed)
    m = _normalize(np.asarray(sample, dtype=np.float64))
    idx = rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)
    cents = m[np.sort(idx)].copy()
    for _ in range(iters):
        assign = (m @ cents.T).argmax(axis=1)
        for c in range(len(cents)):
            members = m[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


class IvfAssigner:
    """Adds an ``ivf_cell`` column: nearest coarse centroid per vector (one
    matmul per batch against the broadcast centroid matrix)."""

    def __init__(self, centroids_ref, vec_col: str = "embedding"):
        c = ray.get(centroids_ref) if isinstance(centroids_ref, ray.ObjectRef) else centroids_ref
        self.cents = np.asarray(c, dtype=np.float64)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, self.vec_col))
        cell = (m @ self.cents.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("ivf_cell", pa.array(cell))


class MultiTableLshBucketer:
    """Explodes each vector into L (table_id, bucket) rows — one per
    independent hyperplane table.  Multi-table LSH (Indyk–Motwani / Charikar,
    public) trades an L× vector shuffle for recall: a pair collides somewhere
    with prob 1-(1-s^p)^L instead of s^p.  The planes tensor (L, p, dim) is
    broadcast once via ``ray.put``."""

    def __init__(self, planes_ref, vec_col: str = "embedding",
                 id_col: str = "vec_id"):
        p = ray.get(planes_ref) if isinstance(planes_ref, ray.ObjectRef) else planes_ref
        self.planes = np.asarray(p, dtype=np.float64)  # (L, p, dim)
        self.vec_col, self.id_col = vec_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, self.vec_col))
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        vecs = batch[self.vec_col]
        if isinstance(vecs, pa.ChunkedArray):
            vecs = vecs.combine_chunks()
        parts = []
        for t in range(self.planes.shape[0]):
            parts.append(
                pa.table(
                    {
                        "table_id": pa.array(
                            np.full(len(m), t, dtype=np.int32)
                        ),
                        "bucket": pa.array(lsh_bucket_ids(m, self.planes[t])),
                        self.id_col: ids,
                        self.vec_col: vecs,
                    }
                )
            )
        return pa.concat_tables(parts)


def near_dup_pairs_lsh(
    ds: Dataset,
    threshold_permille: int,
    *,
    n_planes: int = 4,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> Dataset:
    """Bucketed near-dup (the 100 TB path for ``NearDupScorer``): co-bucket
    probable neighbors per table, exact-score WITHIN each bucket, dedup pairs
    across tables.  O(sum bucket²) instead of O(N²); every emitted pair's
    similarity is exact (precision 1.0), recall ≈ 1-(1-s^p)^L.

    Partitioning assumption (SURVEY §2 custom-operator rule): one (table,
    bucket) group fits in a task — holds when 2^p is sized so N/2^p vectors
    fit; raise ``n_planes`` as N grows."""
    rng = np.random.RandomState(seed)
    first = ds.take_batch(1, batch_format="pyarrow")
    dim = len(first[vec_col][0].as_py())
    planes = rng.standard_normal((n_tables, n_planes, dim))
    planes_ref = ray.put(planes)
    thr = threshold_permille / 1000.0

    bucketed = ds.map_batches(
        MultiTableLshBucketer(planes_ref, vec_col, id_col),
        batch_format="pyarrow",
        batch_size=4096,
    )

    def score_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "vec_a": pa.array([], type=pa.int64()),
                "vec_b": pa.array([], type=pa.int64()),
                "sim_permille": pa.array([], type=pa.int64()),
            }
        )
        if g.num_rows < 2:
            return empty
        m = _normalize(_batch_matrix(g, vec_col))
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = m @ m.T
        mask = (sims >= thr) & (ids[:, None] < ids[None, :])
        ai, bj = np.nonzero(mask)
        if not len(ai):
            return empty
        return pa.table(
            {
                "vec_a": pa.array(ids[ai], type=pa.int64()),
                "vec_b": pa.array(ids[bj], type=pa.int64()),
                "sim_permille": pa.array(
                    np.floor(sims[ai, bj] * 1000).astype(np.int64)
                ),
            }
        )

    pairs = bucketed.groupby(["table_id", "bucket"]).map_groups(
        score_bucket, batch_format="pyarrow"
    )

    # the same pair collides in several tables with IDENTICAL exact sims —
    # distinct via the shared hash-partition primitive (not a sort groupby)
    import pyarrow.compute as pc

    from ..stages.shuffle import hash_partition_merge

    def add_key(b: pa.Table) -> pa.Table:
        h = pc.bit_wise_xor(
            pc.multiply(b["vec_a"], pa.scalar(2654435761, pa.int64())), b["vec_b"]
        )
        return b.append_column("pair_key", pc.cast(h, pa.int64()))

    def distinct(g: pa.Table) -> pa.Table:
        return (
            g.drop_columns(["pair_key"])
            .group_by(["vec_a", "vec_b", "sim_permille"], use_threads=False)
            .aggregate([])
        )

    return hash_partition_merge(
        pairs.map_batches(add_key, batch_format="pyarrow"), "pair_key", distinct
    )


class LshBucketer:
    """Adds an LSH bucket column — the scale path for ANN: co-bucket probable
    neighbors, then exact-score per bucket (groupby) instead of all-pairs."""

    def __init__(self, planes_ref, vec_col: str = "embedding"):
        p = ray.get(planes_ref) if isinstance(planes_ref, ray.ObjectRef) else planes_ref
        self.planes = np.asarray(p, dtype=np.float64)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, self.vec_col))
        return batch.append_column("lsh_bucket", pa.array(lsh_bucket_ids(m, self.planes)))


def semdedup_suppress(
    mat: np.ndarray, ids: np.ndarray, threshold_permille: int,
    block: int = 4096,
) -> np.ndarray:
    """SemDeDup's within-cluster suppression rule (Abbas et al. 2023,
    public): a vector is DROPPED iff some LOWER-id vector in the same
    cluster has cosine similarity >= threshold (min-id representative —
    the deterministic analog of the paper's keep-one-per-dup-set; like
    the paper, suppression is pairwise, not a transitive closure).

    Returns the boolean KEEP mask aligned to ``ids``.  Exact over the
    whole cluster, memory-bounded: rows sort by id and compare against
    earlier rows in (block x block) matmul tiles, so peak memory is
    O(block^2) regardless of cluster size (the flop count stays the
    inherent O(n^2) — SemDeDup bounds n via the number of clusters)."""
    order = np.argsort(ids, kind="stable")
    m = _normalize(np.asarray(mat, dtype=np.float64))[order]
    n = len(order)
    thr = threshold_permille / 1000.0
    dropped = np.zeros(n, dtype=bool)
    for i in range(0, n, block):
        bi = m[i: i + block]
        # vs earlier blocks
        for j in range(0, i, block):
            sims = bi @ m[j: j + block].T
            dropped[i: i + block] |= (sims >= thr).any(axis=1)
        # within-block: strictly-lower ids only
        sims = bi @ bi.T
        tri = np.tril(sims >= thr, k=-1)
        dropped[i: i + block] |= tri.any(axis=1)
    keep = np.ones(n, dtype=bool)
    keep[dropped] = False
    out = np.empty(n, dtype=bool)
    out[order] = keep
    return out
