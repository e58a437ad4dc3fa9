"""Cross-epoch tier views: continuous operation = repeated epochs.

Each ``run_cascade`` epoch commits its own tier partitions (epoch-scoped
names, exactly-once).  Because every rollup aggregate is associative
(count/sum = sum, min = min, max = max), the *current* state of a tier is
the merge of all committed epoch partials — the same partial→merge
machinery as the in-run rollup, applied at read time.  This mirrors
TSDB chunk semantics: immutable per-epoch chunks + a merging read path,
and the reference's append-only store (each delivery batch lands once,
/root/reference/internal/repository/messages.go:60-151)."""

from __future__ import annotations

import os

import ray.data as rd
from ray.data import Dataset

from ..stages.gapfill import gap_fill
from ..stages.rollup import _merge_partials, repartial_rollup_batch
from ..state.manifest import Manifest
from ..timegrid import TIERS


def tier_view(
    out_dir: str, tier: str, *, gap: bool = False, t0_us: int = None
) -> Dataset:
    """Merged view over every LIVE committed epoch partition of one tier.

    Plans from the manifest (not a file glob): retired partitions and
    crash-orphaned data files are never read.  A live entry named in a live
    compacted entry's ``replaces`` list is excluded — compaction's phase-1
    commit supersedes its inputs even before phase-2 retires them, so a
    crash between phases never double-counts."""
    manifest = Manifest(out_dir)
    live = {
        k: e
        for k, e in manifest.committed(tier).items()
        if not e["partition"].startswith("series__")
    }
    replaced = {r for e in live.values() for r in e.get("replaces", [])}
    files = sorted(
        os.path.join(out_dir, e["path"])
        for k, e in live.items()
        if k not in replaced
    )
    if not files:
        raise FileNotFoundError(f"no committed partitions under tier={tier}")
    tier_s = TIERS[tier]
    ds = rd.read_parquet(files)
    partials = ds.map_batches(
        lambda b: repartial_rollup_batch(b, tier_s, tier_s, t0_us),
        batch_format="pyarrow",
    )
    merged = _merge_partials(partials, tier_s, t0_us)
    return gap_fill(merged, tier) if gap else merged
