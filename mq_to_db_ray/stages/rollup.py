"""E3 two-phase (salted) rollup + E4 downsampling cascade.

Reference parity: the grouped running counters
(`prometheus.CounterVec` labelled per worker,
/root/reference/internal/metrics/metrics.go:136-183) are partial counts
merged at scrape time; our rollup is the same shape — **partial aggregates
are computed inside every map task (combiner), and only the tiny partials
are shuffled** to the final ``groupby``.  The effective salt is the block id:
a hot source's rows are spread over many blocks, each contributing one
partial row per (source, bucket), so no reducer ever sees more than
``num_blocks`` rows per key.  This is the salted two-phase aggregation the
SURVEY mandates (E3/E11) without materializing an explicit salt column.

The shuffled payload is narrow: (source, bucket_id, count, sum, min, max) —
the ``tokens`` column never reaches a shuffle (SURVEY §7 hard-part #5).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from .. import schema as sch
from ..timegrid import TIERS, bucket_id_to_us, us_to_bucket_id

# Internal partial-aggregate column names.
_PARTIAL_NAMES = ["source", "bucket_id", "count", "sum_n_tok", "min_n_tok", "max_n_tok"]


def partial_rollup_batch(batch: pa.Table, tier_s: int) -> pa.Table:
    """Per-batch combiner: ASSIGNED rows -> one partial row per (source, bucket)."""
    if batch.num_rows == 0:
        return pa.table(
            {
                "source": pa.array([], type=pa.string()),
                "bucket_id": pa.array([], type=pa.int64()),
                "count": pa.array([], type=pa.int64()),
                "sum_n_tok": pa.array([], type=pa.int64()),
                "min_n_tok": pa.array([], type=pa.int32()),
                "max_n_tok": pa.array([], type=pa.int32()),
            }
        )
    seq = batch["seq"]
    if tier_s > 1:
        # FLOOR semantics: a pre-t0 event (negative seq, e.g. from the
        # events adapter) must land in the bucket below zero, matching
        # date_trunc / timegrid.  pc.divide truncates toward zero, which
        # agrees with floor for seq >= 0 (the hot path, zero-copy); fall
        # back to numpy floor_divide only when negatives are present.
        if pc.min(seq).as_py() >= 0:
            bucket = pc.divide(seq, tier_s)
        else:
            seq_np = (
                seq.combine_chunks() if isinstance(seq, pa.ChunkedArray) else seq
            ).to_numpy(zero_copy_only=False)
            bucket = pa.array(np.floor_divide(seq_np, tier_s))
    else:
        bucket = seq
    t = pa.Table.from_arrays(
        [batch["source"], pc.cast(bucket, pa.int64()), batch["n_tok"]],
        names=["source", "bucket_id", "n_tok"],
    )
    g = t.group_by(["source", "bucket_id"], use_threads=False).aggregate(
        [("n_tok", "count"), ("n_tok", "sum"), ("n_tok", "min"), ("n_tok", "max")]
    )
    return pa.Table.from_arrays(
        [
            g["source"],
            g["bucket_id"],
            pc.cast(g["n_tok_count"], pa.int64()),
            pc.cast(g["n_tok_sum"], pa.int64()),
            pc.cast(g["n_tok_min"], pa.int32()),
            pc.cast(g["n_tok_max"], pa.int32()),
        ],
        names=_PARTIAL_NAMES,
    )


def repartial_rollup_batch(
    batch: pa.Table, from_tier_s: int, to_tier_s: int, t0_us: int = None
) -> pa.Table:
    """Cascade combiner: finished rollup rows (ROLLUP schema) -> coarser partials.

    count = sum(count), sum = sum(sum), min = min(min), max = max(max) —
    gap-filled rows (count==0, null min/max) are excluded so they can't
    poison min/max.
    """
    real = batch.filter(pc.greater(batch["count"], 0))
    from ..timegrid import T0_US

    bucket = us_to_bucket_id(
        real["bucket_ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False),
        to_tier_s,
        T0_US if t0_us is None else t0_us,
    )
    t = pa.Table.from_arrays(
        [
            real["source"],
            pa.array(bucket, type=pa.int64()),
            real["count"],
            real["sum_n_tok"],
            real["min_n_tok"],
            real["max_n_tok"],
        ],
        names=_PARTIAL_NAMES,
    )
    g = t.group_by(["source", "bucket_id"], use_threads=False).aggregate(
        [("count", "sum"), ("sum_n_tok", "sum"), ("min_n_tok", "min"), ("max_n_tok", "max")]
    )
    return pa.Table.from_arrays(
        [
            g["source"],
            g["bucket_id"],
            pc.cast(g["count_sum"], pa.int64()),
            pc.cast(g["sum_n_tok_sum"], pa.int64()),
            pc.cast(g["min_n_tok_min"], pa.int32()),
            pc.cast(g["max_n_tok_max"], pa.int32()),
        ],
        names=_PARTIAL_NAMES,
    )


def finalize_batch(batch: pa.Table, tier_s: int, t0_us: int = None) -> pa.Table:
    """Merged partials -> ROLLUP schema (bucket_id -> bucket_ts, filled=False)."""
    from ..timegrid import T0_US

    bucket_us = bucket_id_to_us(
        batch["bucket_id"].combine_chunks().to_numpy(zero_copy_only=False),
        tier_s,
        T0_US if t0_us is None else t0_us,
    )
    return pa.Table.from_arrays(
        [
            batch["source"],
            pa.array(bucket_us).cast(pa.timestamp("us")),
            pc.cast(batch["count"], pa.int64()),
            pc.cast(batch["sum_n_tok"], pa.int64()),
            pc.cast(batch["min_n_tok"], pa.int32()),
            pc.cast(batch["max_n_tok"], pa.int32()),
            pa.array(np.zeros(batch.num_rows, dtype=bool)),
        ],
        schema=sch.ROLLUP,
    )


def merge_partials_batch(batch: pa.Table) -> pa.Table:
    """Vectorized per-partition merge: partial rows -> one row per key."""
    g = batch.group_by(["source", "bucket_id"], use_threads=False).aggregate(
        [
            ("count", "sum"),
            ("sum_n_tok", "sum"),
            ("min_n_tok", "min"),
            ("max_n_tok", "max"),
        ]
    )
    return pa.Table.from_arrays(
        [
            g["source"],
            g["bucket_id"],
            pc.cast(g["count_sum"], pa.int64()),
            pc.cast(g["sum_n_tok_sum"], pa.int64()),
            pc.cast(g["min_n_tok_min"], pa.int32()),
            pc.cast(g["max_n_tok_max"], pa.int32()),
        ],
        names=_PARTIAL_NAMES,
    )


def _merge_partials(partials: Dataset, tier_s: int, t0_us: int = None) -> Dataset:
    """Final phase: hash-shuffle ONLY the partial rows and merge per key.

    Partitioning hashes bucket_id (see stages/shuffle.py), so a hot SOURCE
    spreads across every merge task — the salt axis is time.  Each merge
    task sees every partial for its keys; the per-partition merge is one
    vectorized Arrow group_by.
    """
    from .shuffle import hash_partition_merge

    merged = hash_partition_merge(partials, "bucket_id", merge_partials_batch)
    return merged.map_batches(
        lambda b: finalize_batch(b, tier_s, t0_us), batch_format="pyarrow"
    )


def rollup(
    assigned: Dataset, tier: str, *, batch_size: int = 1 << 20, t0_us: int = None
) -> Dataset:
    """E3: ASSIGNED dataset -> unfilled ROLLUP dataset for one tier."""
    tier_s = TIERS[tier]
    partials = assigned.map_batches(
        lambda b: partial_rollup_batch(b, tier_s),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    return _merge_partials(partials, tier_s, t0_us)


def cascade(
    rolled: Dataset, from_tier: str, to_tier: str, *, t0_us: int = None
) -> Dataset:
    """E4: finished finer-tier rollup -> coarser-tier rollup (tiny data)."""
    f, t = TIERS[from_tier], TIERS[to_tier]
    partials = rolled.map_batches(
        lambda b: repartial_rollup_batch(b, f, t, t0_us), batch_format="pyarrow"
    )
    return _merge_partials(partials, t, t0_us)


# ---------------------------------------------------------------------------
# OHLC rollup (first/last aggregates — the open/close half needs an ORDER,
# which plain groupby.aggregate can't express; classic financial downsample)
# ---------------------------------------------------------------------------

_OHLC_PARTIAL = ["source", "bucket_id", "o_t", "o_o", "o_v", "hi", "lo",
                 "c_t", "c_o", "c_v"]


def _i64np(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.cast(pa.int64()).to_numpy(zero_copy_only=False)


def _ohlc_merge(t: pa.Table) -> pa.Table:
    """Merge OHLC partial rows: one row per (source, bucket_id).

    open = o_v of the row minimizing (o_t, o_o); close = c_v of the row
    maximizing (c_t, c_o); hi/lo = max/min.  Mergeable and associative, so
    the same kernel serves as the per-batch combiner AND the per-partition
    final merge — exactly the two-phase shape of :func:`partial_rollup_batch`.
    All numpy: one lexsort to group, two lexsorts for the ordered picks,
    two reduceats for the extrema.
    """
    if t.num_rows == 0:
        return t.select(_OHLC_PARTIAL)
    src = t["source"]
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    codes = src.dictionary_encode().indices.to_numpy(zero_copy_only=False).astype(np.int64)
    b = _i64np(t["bucket_id"])
    order = np.lexsort((b, codes))
    cb, bb = codes[order], b[order]
    newg = np.empty(len(order), dtype=bool)
    newg[0] = True
    newg[1:] = (cb[1:] != cb[:-1]) | (bb[1:] != bb[:-1])
    starts = np.flatnonzero(newg)
    gid = np.cumsum(newg) - 1
    ends = np.append(starts[1:], len(order)) - 1

    o_t, o_o, o_v = (_i64np(t[c])[order] for c in ("o_t", "o_o", "o_v"))
    c_t, c_o, c_v = (_i64np(t[c])[order] for c in ("c_t", "c_o", "c_v"))
    hi = np.maximum.reduceat(_i64np(t["hi"])[order], starts)
    lo = np.minimum.reduceat(_i64np(t["lo"])[order], starts)
    # within each group, earliest (o_t, o_o) first / latest (c_t, c_o) last
    oo = np.lexsort((o_o, o_t, gid))
    co = np.lexsort((c_o, c_t, gid))
    op, cl = oo[starts], co[ends]
    first = order[starts]
    return pa.table(
        {
            "source": src.take(pa.array(first, pa.int64())),
            "bucket_id": pa.array(bb[starts], pa.int64()),
            "o_t": pa.array(o_t[op], pa.int64()),
            "o_o": pa.array(o_o[op], pa.int64()),
            "o_v": pa.array(o_v[op], pa.int64()),
            "hi": pa.array(hi, pa.int64()),
            "lo": pa.array(lo, pa.int64()),
            "c_t": pa.array(c_t[cl], pa.int64()),
            "c_o": pa.array(c_o[cl], pa.int64()),
            "c_v": pa.array(c_v[cl], pa.int64()),
        }
    )


def ohlc_rollup(
    points: Dataset, tier: str, *, t0_us: int, k: int | None = None
) -> Dataset:
    """Per-(source, tier-bucket) open/high/low/close of an integer value.

    ``points`` must have (source: string, ts_us: int64, order_id: int64,
    v: int64); open/close order is (ts_us, order_id) — the unique order_id
    makes ties deterministic.  Two-phase like :func:`rollup`: per-batch
    combiner emits one partial row per key (degenerate partial: every field
    from the single best row), then ONLY partials shuffle, hash-partitioned
    on bucket_id so a hot source spreads across reducers (salt axis = time).
    Output: (source, bucket_ts, open, high, low, close).
    """
    from .shuffle import hash_partition_merge

    tier_us = TIERS[tier] * 1_000_000

    def prepare(b: pa.Table) -> pa.Table:
        ts_us = _i64np(b["ts_us"])
        bucket = np.floor_divide(ts_us - t0_us, tier_us)
        v = _i64np(b["v"])
        o = _i64np(b["order_id"])
        return _ohlc_merge(
            pa.table(
                {
                    "source": b["source"],
                    "bucket_id": pa.array(bucket, pa.int64()),
                    "o_t": pa.array(ts_us, pa.int64()),
                    "o_o": pa.array(o, pa.int64()),
                    "o_v": pa.array(v, pa.int64()),
                    "hi": pa.array(v, pa.int64()),
                    "lo": pa.array(v, pa.int64()),
                    "c_t": pa.array(ts_us, pa.int64()),
                    "c_o": pa.array(o, pa.int64()),
                    "c_v": pa.array(v, pa.int64()),
                }
            )
        )

    def finalize(b: pa.Table) -> pa.Table:
        bucket_us = _i64np(b["bucket_id"]) * tier_us + t0_us
        return pa.table(
            {
                "source": b["source"],
                "bucket_ts": pa.array(bucket_us, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "open": b["o_v"],
                "high": b["hi"],
                "low": b["lo"],
                "close": b["c_v"],
            }
        )

    partials = points.map_batches(prepare, batch_format="pyarrow")
    merged = hash_partition_merge(partials, "bucket_id", _ohlc_merge, k=k)
    return merged.map_batches(finalize, batch_format="pyarrow")


def ohlc_cascade(
    fine: Dataset, to_tier: str, *, t0_us: int, k: int | None = None
) -> Dataset:
    """Cascade a finalized OHLC tier into a coarser one — the E4
    raw→1m→1h→1d downsampling discipline applied to the candlestick
    aggregate (reference parity: the cascade rule `SURVEY.md §2.2 E4`;
    OHLC semantics `E17`).  A coarse bucket's open is the open of its
    EARLIEST fine bucket, close the close of its LATEST, high/low the
    extremes — associative by construction, so the cascade reads ONLY
    the fine tier (one row per (source, fine bucket)), never the raw
    stream: at 100 TB the 1d tier re-reads 1/1440th of what a raw
    re-roll would.

    ``fine`` must be :func:`ohlc_rollup` output ((source, bucket_ts,
    open, high, low, close), one row per key by construction — the
    exactly-once commit invariant).  Re-preparing the partial shape with
    (o_t, o_o) = (fine bucket_us, 0) lets :func:`_ohlc_merge` serve
    unchanged as combiner AND final merge; the exchange hash-partitions
    on the COARSE bucket id so a hot source spreads on the time axis,
    exactly like :func:`ohlc_rollup`."""
    from .shuffle import hash_partition_merge

    tier_us = TIERS[to_tier] * 1_000_000

    def prepare(b: pa.Table) -> pa.Table:
        bucket_us = _i64np(b["bucket_ts"].cast(pa.int64()))
        coarse = np.floor_divide(bucket_us - t0_us, tier_us)
        zero = np.zeros(len(bucket_us), np.int64)
        return _ohlc_merge(
            pa.table(
                {
                    "source": b["source"],
                    "bucket_id": pa.array(coarse, pa.int64()),
                    "o_t": pa.array(bucket_us, pa.int64()),
                    "o_o": pa.array(zero),
                    "o_v": pc.cast(b["open"], pa.int64()),
                    "hi": pc.cast(b["high"], pa.int64()),
                    "lo": pc.cast(b["low"], pa.int64()),
                    "c_t": pa.array(bucket_us, pa.int64()),
                    "c_o": pa.array(zero),
                    "c_v": pc.cast(b["close"], pa.int64()),
                }
            )
        )

    def finalize(b: pa.Table) -> pa.Table:
        bucket_us = _i64np(b["bucket_id"]) * tier_us + t0_us
        return pa.table(
            {
                "source": b["source"],
                "bucket_ts": pa.array(bucket_us, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "open": b["o_v"],
                "high": b["hi"],
                "low": b["lo"],
                "close": b["c_v"],
            }
        )

    partials = fine.map_batches(prepare, batch_format="pyarrow")
    merged = hash_partition_merge(partials, "bucket_id", _ohlc_merge, k=k)
    return merged.map_batches(finalize, batch_format="pyarrow")
