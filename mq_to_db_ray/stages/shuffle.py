"""Shared hash-shuffle primitive: co-locate rows by key hash, then merge
each partition with one vectorized Arrow kernel.

This replaces ``Dataset.groupby(keys).aggregate(...)`` everywhere the key
cardinality is high (rollup buckets, dedup content hashes, pair counts,
token histograms): ray.data's sort-based aggregate degrades badly at 100k+
distinct keys, while a groupby over K ~ 2x-CPU coarse partitions plus an
Arrow ``group_by`` per partition is ~40x faster and handles skew (a hot
fine-grained key spreads only if the hash axis differs from the skew axis —
callers choose the key accordingly, e.g. bucket_id rather than source).

Negative-safe: hashing multiplies on int64 (wraps silently) and masks the
low bits of the two's-complement value, which is always >= 0 — a checked
uint64 cast would raise on negative keys (e.g. pre-t0 bucket ids).
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

# Knuth multiplicative constant — spreads sequential int keys.
HASH_MULT = 2654435761


def shuffle_parts(k: int | None = None) -> int:
    """Partition count ~ 2x cluster CPUs, power of two (mask hashing)."""
    if k is not None:
        return k
    import ray

    try:
        n = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        n = 8
    p = 1
    while p < 2 * n:
        p *= 2
    return min(p, 1024)


def width_for_rows(rows: int, rows_per_part: int) -> int:
    """The adaptive-width rule on a known row count: power-of-two
    ``rows // rows_per_part``, floored at 8 and capped by the CPU-derived
    default.  Small inputs skip the fixed per-partition groupby overhead;
    at web scale this saturates to full width.  Used directly when the
    row count comes from a materialized Dataset (e.g. dup_clusters' edge
    list) rather than a parquet footer."""
    k = 8
    while k < rows // rows_per_part:
        k *= 2
    return min(k, shuffle_parts())


def adaptive_width(parquet_path: str, rows_per_part: int) -> int:
    """Shuffle width scaled to a parquet table's FOOTER row count (no data
    read) via :func:`width_for_rows`.  Shared rule for the temporal
    operators' and the documents table's adaptive widths.  The path may be
    a single file or a sharded directory of part files (the normal layout
    at scale) — footers only, never data, are read either way."""
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(parquet_path):
        rows = sum(
            pq.ParquetFile(os.path.join(parquet_path, f)).metadata.num_rows
            for f in os.listdir(parquet_path)
            if f.endswith(".parquet")
        )
    else:
        rows = pq.ParquetFile(parquet_path).metadata.num_rows
    return width_for_rows(rows, rows_per_part)


def add_hash_part(batch: pa.Table, key: str, k: int) -> pa.Table:
    """Append an int32 ``part`` column = (key * HASH_MULT) & (k-1)."""
    h = pc.bit_wise_and(
        pc.multiply(pc.cast(batch[key], pa.int64()), pa.scalar(HASH_MULT, pa.int64())),
        pa.scalar(k - 1, pa.int64()),
    )
    return batch.append_column("part", pc.cast(h, pa.int32()))


def grouped_topk(
    ds: Dataset,
    *,
    key: str,
    value: str,
    order_id: str,
    kk: int,
    k: int | None = None,
) -> Dataset:
    """Top-``kk`` rows per ``key`` by (``value`` DESC, ``order_id`` ASC) —
    SQL ``row_number() OVER (PARTITION BY key ORDER BY value DESC, order_id)
    <= kk``, with a 1-based ``rank`` column appended.

    Two-phase: the per-batch combiner keeps at most ``kk`` rows per key
    locally (one lexsort + rank-within-run, no Python loop), so ONLY
    candidate rows shuffle; the per-partition final pass applies the same
    kernel and emits ranks.  ``order_id`` must be unique per key, making
    the result deterministic.  Input columns must be int64-castable.
    """

    def topk_batch(b: pa.Table, final: bool) -> pa.Table:
        if b.num_rows == 0:
            out = b.select([key, value, order_id])
            return out.append_column("rank", pa.array([], pa.int64())) if final else out
        for c in (key, value, order_id):
            if b[c].null_count:
                raise ValueError(f"grouped_topk: null in column {c!r}")
        kv = pc.cast(b[key], pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        vv = pc.cast(b[value], pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        ov = pc.cast(b[order_id], pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        import numpy as np

        # order-preserving descending key: int64 -> uint64 monotonic flip
        # then complement — exact for the full range (a plain -vv wraps at
        # INT64_MIN and would rank it first)
        v_desc = ~(vv.view(np.uint64) + np.uint64(1 << 63))
        order = np.lexsort((ov, v_desc, kv))
        ks = kv[order]
        newg = np.empty(len(order), dtype=bool)
        newg[0] = True
        newg[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(newg)
        gid = np.cumsum(newg) - 1
        rank = np.arange(len(order)) - starts[gid]
        keep = rank < kk
        take = pa.array(order[keep], pa.int64())
        out = pa.table(
            {
                key: b[key].combine_chunks().take(take),
                value: b[value].combine_chunks().take(take),
                order_id: b[order_id].combine_chunks().take(take),
            }
        )
        if final:
            out = out.append_column("rank", pa.array(rank[keep] + 1, pa.int64()))
        return out

    local = ds.map_batches(
        lambda b: topk_batch(b, False), batch_format="pyarrow"
    )
    return hash_partition_merge(
        local, key, lambda g: topk_batch(g, True), k=k
    )


def hash_partition_merge(
    ds: Dataset,
    key: str,
    merge_fn: Callable[[pa.Table], pa.Table],
    *,
    k: int | None = None,
) -> Dataset:
    """Co-locate rows by ``hash(key) % k`` and apply ``merge_fn`` once per
    partition (every row of a given key value meets in one call)."""
    kk = shuffle_parts(k)
    return (
        ds.map_batches(lambda b: add_hash_part(b, key, kk), batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: merge_fn(g.drop_columns(["part"])), batch_format="pyarrow"
        )
    )
