"""E6/E7: per-(source, tier) compressed series blobs.

DoD encodes the gap-filled ``sum_n_tok`` sequence ordered by bucket_ts;
Gorilla encodes the same values as float64 (FIXTURES.md §2).  Runs as
``groupby("source").map_groups`` over rolled-up points (same partitioning
assumption as gap-fill: one (source, tier) series per task).
"""

from __future__ import annotations

import pyarrow as pa
from ray.data import Dataset

from .. import schema as sch
from ..functions.dod import dod_encode
from ..functions.gorilla import gorilla_encode


def encode_group(group: pa.Table, tier: str) -> pa.Table:
    if group.num_rows == 0:
        return sch.empty(sch.SERIES)
    g = group.take(pa.compute.sort_indices(group["bucket_ts"]))
    vals = g["sum_n_tok"].combine_chunks().to_numpy(zero_copy_only=False)
    ts = g["bucket_ts"].cast(pa.int64()).combine_chunks().to_numpy(
        zero_copy_only=False
    )
    return pa.Table.from_pylist(
        [
            dict(
                source=g["source"][0].as_py(),
                tier=tier,
                n_points=len(vals),
                bucket_lo=int(ts[0]),
                bucket_hi=int(ts[-1]),
                dod_blob=dod_encode(vals),
                gorilla_blob=gorilla_encode(vals.astype("float64")),
            )
        ],
        schema=sch.SERIES,
    )


def encode_series(filled: Dataset, tier: str, *, concurrency: int | None = None) -> Dataset:
    """One SERIES row per source.  ``concurrency`` sizes the actor pool when
    the caller wants the stateful-stage form (storageWorkers analog)."""
    return filled.groupby("source").map_groups(
        lambda g: encode_group(g, tier), batch_format="pyarrow"
    )
