"""Event-time derivation and retention-tier bucket math (SURVEY.md E2).

The reference derives a message's time from the AMQP envelope
(`/root/reference/internal/consumer/rmq/rmq.go:199-206` stamps
``Timestamp``); ordering is only guaranteed per consumer channel
(`/root/reference/cmd/mq-to-db/main.go:502-516` merges channels with a fair
select, losing global order).  We therefore derive event time from DATA, never
from block order: ``seq`` is the per-source ordinal encoded in ``doc_id``
(``"{source}-{seq:08d}"``), and

    event_ts    = T0 + seq * TICK          (T0 = 2026-01-01T00:00:00Z, TICK=1s)
    bucket(t)   = event_ts floored to the tier width (60s / 3600s / 86400s)

All functions are pure and vectorized (numpy in / numpy out) so E2 is a
stateless ``map_batches`` stage.
"""

from __future__ import annotations

import numpy as np

# 2026-01-01T00:00:00Z in epoch seconds / microseconds (UTC-naive, like Arrow).
T0_S = 1767225600
T0_US = T0_S * 1_000_000
TICK_S = 1

# Tier name -> bucket width in seconds. "raw" keeps per-second resolution.
# "1w" extends the retention ladder one more cascade hop (7-day buckets from
# t0; the events adapter's t0 2024-01-01 is a Monday, so weekly buckets
# coincide with SQL date_trunc('week')).
TIERS: dict[str, int] = {
    "raw": 1, "1m": 60, "1h": 3600, "1d": 86400, "1w": 604800,
}
# The downsampling cascade: each tier aggregates the previous one.
CASCADE: list[tuple[str, str]] = [("raw", "1m"), ("1m", "1h"), ("1h", "1d")]


def bucket_id_to_us(
    bucket_id: np.ndarray | int, tier_s: int, t0_us: int = T0_US
) -> np.ndarray | int:
    """bucket_ts (timestamp[us] int64) from an integer bucket index.

    ``t0_us`` is the epoch origin: T0 for the native F1 corpus; adapters for
    other tables (e.g. the driver's ``events``) pass their own aligned origin.
    """
    if isinstance(bucket_id, np.ndarray):
        return t0_us + bucket_id.astype(np.int64) * tier_s * 1_000_000
    return t0_us + int(bucket_id) * tier_s * 1_000_000


def us_to_bucket_id(ts_us: np.ndarray, tier_s: int, t0_us: int = T0_US) -> np.ndarray:
    """Re-bucket an existing bucket_ts (or event_ts) to a coarser tier.

    floor division, so it is correct for timestamps before t0 too.
    """
    rel = ts_us.astype(np.int64) - t0_us
    return np.floor_divide(rel, tier_s * 1_000_000)
