"""Surgical partition repair: recompute ONE (tier, source) slice from the
committed raw tier and atomically replace its partitions.

The operational story the reference delegates to the database ("re-run the
consumer, Postgres upserts") and this engine must own: when a rollup
partition is lost or corrupted (bitrot, operator error, a partial disk),
`repair_tier` revokes exactly that slice's manifest entries
(`Manifest.invalidate` — the hard-delete dual of retention's `retire`,
which must keep the ack), recomputes the slice from the raw tier with the
SAME rollup/cascade kernels the original run used, and commits fresh bytes
under the same epoch-scoped partition names.  Everything else on disk is
untouched — at 100 TB a repair is one source's narrow re-read, never a
re-run of the epoch.

Scale shape: the raw re-read is column-pruned to (source, seq, n_tok) AND
predicate-pushed to the one source (parquet row-group stats skip other
sources' groups under partitioned raw layouts; under round-robin layouts
the filter still drops rows at the scanner).  Rollup/cascade then operate
on a single source's points — the commit path reuses `commit_tier`, so
windowing, gap-fill, series encoding, atomic rename and manifest entries
are byte-identical to a full run's (asserted in tests via tier_view
equality and content fingerprints).
"""

from __future__ import annotations

import os
import uuid

import pyarrow.compute as pc
import ray.data as rd

from ..state.manifest import Manifest
from ..stages.rollup import cascade, rollup
from .cascade import commit_tier

__all__ = ["repair_tier"]

_CHAIN = {"1m": ["1m"], "1h": ["1m", "1h"], "1d": ["1m", "1h", "1d"]}


def repair_tier(
    out_dir: str,
    tier: str,
    source: str,
    *,
    window_buckets: int | None = None,
) -> dict:
    """Recompute + recommit every partition of ``(tier, source)`` from the
    committed raw tier.  Returns a summary dict: entries invalidated,
    files removed, partitions recommitted per epoch."""
    if tier not in _CHAIN:
        raise ValueError(f"repairable tiers are {sorted(_CHAIN)}, got {tier!r}")
    manifest = Manifest(out_dir)
    layout = manifest.layout()
    wb = window_buckets or layout.get("window_buckets") or None

    # ---- 1. revoke the slice: manifest first, data files after ----
    tag = f"source={source}"
    keys = [
        k
        for k, e in manifest.committed(tier).items()
        if tag in e.get("partition", "")
    ]
    removed_files = 0
    for k in keys:
        entry = manifest.invalidate(k)
        if entry and entry.get("path"):
            try:
                os.unlink(os.path.join(out_dir, entry["path"]))
                removed_files += 1
            except OSError:
                pass  # already-missing data is exactly what repair fixes

    # ---- 2. recompute from the committed raw tier, epoch by epoch ----
    raw_root = os.path.join(out_dir, "tier=raw")
    if not os.path.isdir(raw_root):
        raise FileNotFoundError(f"no committed raw tier under {out_dir}")
    epochs = sorted(
        d.split("=", 1)[1]
        for d in os.listdir(raw_root)
        if d.startswith("epoch=")
    )
    run_id = uuid.uuid4().hex[:12]
    recommitted: dict[str, int] = {}
    for epoch in epochs:
        raw_dir = os.path.join(raw_root, f"epoch={epoch}")
        narrow = rd.read_parquet(
            raw_dir,
            columns=["source", "seq", "n_tok"],
            filter=(pc.field("source") == source),
        )
        if narrow.count() == 0:
            continue  # this epoch never carried the source
        rolled = rollup(narrow, "1m").materialize()
        prev = "1m"
        for step in _CHAIN[tier][1:]:
            rolled = cascade(rolled, prev, step).materialize()
            prev = step
        rows = commit_tier(
            rolled, tier, out_dir, run_id, epoch, wb,
            os.path.join(out_dir, f"rejects/epoch={epoch}"),
        )
        recommitted[epoch] = len(rows)
    return dict(
        tier=tier,
        source=source,
        invalidated=len(keys),
        removed_files=removed_files,
        recommitted=recommitted,
    )
