"""Adapter: the driver's ``events`` table as an ingest stream.

Each event row is treated as a message (envelope analog): source =
``event_type``, event time = ``ts`` (already a timestamp, so ``seq`` =
whole seconds since the events epoch 2024-01-01), and the rolled-up metric
is ``floor(value)`` (integer, so every aggregate is bit-exactly reproducible
by the DuckDB oracle — float SUM order-dependence can't bite).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd
from ray.data import Dataset

from ..stages.gapfill import gap_fill
from ..stages.rollup import cascade, rollup

# 2024-01-01T00:00:00Z — minute/hour/day aligned, so buckets == date_trunc.
EVENTS_T0_US = 1704067200 * 1_000_000


def events_assigned(sf_dir: str) -> Dataset:
    """events -> ASSIGNED-narrow shape (source, seq, n_tok)."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def adapt(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        seq = (ts_us - EVENTS_T0_US) // 1_000_000
        vals = batch["value"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [
                batch["event_type"].combine_chunks(),
                pa.array(seq, type=pa.int64()),
                pa.array(np.floor(vals).astype(np.int32)),
            ],
            names=["source", "seq", "n_tok"],
        )

    return ds.map_batches(adapt, batch_format="pyarrow")


def events_rollup(sf_dir: str, tier: str) -> Dataset:
    """Direct rollup of events at one tier (columns match the oracle SQL)."""
    return rollup(events_assigned(sf_dir), tier, t0_us=EVENTS_T0_US).drop_columns(
        ["filled"]
    )


def events_rollup_cascaded(sf_dir: str, tier: str) -> Dataset:
    """Rollup produced THROUGH the cascade (1m->1h[->1d]) — proving E4
    against a direct-SQL oracle."""
    m1 = rollup(events_assigned(sf_dir), "1m", t0_us=EVENTS_T0_US)
    if tier == "1m":
        out = m1
    else:
        h1 = cascade(m1, "1m", "1h", t0_us=EVENTS_T0_US)
        out = h1 if tier == "1h" else cascade(h1, "1h", "1d", t0_us=EVENTS_T0_US)
    return out.drop_columns(["filled"])


def events_gapfill(sf_dir: str, tier: str = "1m") -> Dataset:
    m1 = rollup(events_assigned(sf_dir), tier, t0_us=EVENTS_T0_US)
    return gap_fill(m1, tier)
