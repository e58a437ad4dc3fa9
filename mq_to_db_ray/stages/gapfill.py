"""E5 gap-fill: emit empty buckets between each source's min and max bucket.

Needs the whole per-source bucket range in one place, so it runs as
``groupby("source").map_groups`` — but on *rolled-up* points only (one row
per bucket), never on raw rows, so group sizes are bounded by the time span,
not the data volume.  Partitioning assumption (documented per SURVEY §2
custom-operator rule): one (source, tier) series fits in one task's memory —
at 1m resolution that is ~0.5M points per year per source (~30 MB).  For
longer retention, process per (source, coarse-window) instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from .. import schema as sch
from ..timegrid import TIERS


def fill_group(group: pa.Table, tier_s: int) -> pa.Table:
    """One source's unfilled rollup rows -> dense rows lo..hi (vectorized)."""
    if group.num_rows == 0:
        return sch.empty(sch.ROLLUP)
    order = pa.compute.sort_indices(group["bucket_ts"])
    g = group.take(order)
    ts = g["bucket_ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
    step = tier_s * 1_000_000
    lo, hi = int(ts[0]), int(ts[-1])
    n = (hi - lo) // step + 1
    if n == len(ts):  # dense already
        return g.set_column(6, "filled", pa.array(np.zeros(len(ts), dtype=bool)))
    idx = (ts - lo) // step
    full_ts = lo + np.arange(n, dtype=np.int64) * step
    count = np.zeros(n, dtype=np.int64)
    count[idx] = g["count"].combine_chunks().to_numpy(zero_copy_only=False)
    sum_n = np.zeros(n, dtype=np.int64)
    sum_n[idx] = g["sum_n_tok"].combine_chunks().to_numpy(zero_copy_only=False)
    filled = np.ones(n, dtype=bool)
    filled[idx] = False
    mins = np.zeros(n, dtype=np.int32)
    mins[idx] = g["min_n_tok"].combine_chunks().to_numpy(zero_copy_only=False)
    maxs = np.zeros(n, dtype=np.int32)
    maxs[idx] = g["max_n_tok"].combine_chunks().to_numpy(zero_copy_only=False)
    return pa.Table.from_arrays(
        [
            pa.array([g["source"][0].as_py()] * n, type=pa.string()),
            pa.array(full_ts).cast(pa.timestamp("us")),
            pa.array(count),
            pa.array(sum_n),
            _masked(mins, filled, pa.int32()),
            _masked(maxs, filled, pa.int32()),
            pa.array(filled),
        ],
        schema=sch.ROLLUP,
    )


def _masked(values: np.ndarray, null_mask: np.ndarray, typ: pa.DataType) -> pa.Array:
    """Array with nulls where null_mask is True (filled buckets -> null min/max)."""
    return pa.array(values, type=typ, mask=null_mask)


def gap_fill(rolled: Dataset, tier: str) -> Dataset:
    """E5 over a whole tier: per-source dense series (ROLLUP schema)."""
    tier_s = TIERS[tier]
    return rolled.groupby("source").map_groups(
        lambda g: fill_group(g, tier_s), batch_format="pyarrow"
    )
