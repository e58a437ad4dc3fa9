"""Compaction: fold a tier's accumulated per-epoch partitions into one
partition per source.

Continuous operation accretes one partition per (source, epoch); reads
stay correct (tier_view merges) but open more files over time.  Compaction
is the TSDB chunk-merge step, built from the existing exactly-once
primitives in a crash-safe two-phase order:

  1. commit the compacted partition, whose manifest entry carries a
     ``replaces`` list naming the input partition keys;
  2. retire the inputs.

``tier_view`` drops any live entry named in a live entry's ``replaces``,
so a crash between 1 and 2 never double-counts; re-running compaction
finishes the retire step (idempotent)."""

from __future__ import annotations

import hashlib
import os
import uuid

import pyarrow.parquet as pq

from ..state.manifest import Manifest, write_partition_atomic
from ..stages.rollup import merge_partials_batch, repartial_rollup_batch
from ..stages.gapfill import fill_group
from ..timegrid import T0_US, TIERS


def compact_tier(out_dir: str, tier: str, *, t0_us: int | None = None) -> dict:
    """Compact every source with >1 live partition; returns a report.

    Runs driver-side over ROLLED-UP points (sources x buckets — MBs even at
    10^12-sequence scale), so no Ray session is required."""
    manifest = Manifest(out_dir)
    run_id = uuid.uuid4().hex[:12]
    tier_s = TIERS[tier]
    live = {
        k: e
        for k, e in manifest.committed(tier).items()
        if not e["partition"].startswith("series__") and "bucket_lo" in e
    }
    by_source: dict[str, dict[str, dict]] = {}
    for k, e in live.items():
        by_source.setdefault(e["source"], {})[k] = e

    report = dict(tier=tier, compacted_sources=0, inputs_retired=0, skipped_sources=0)
    for source, entries in sorted(by_source.items()):
        # finish a previously-interrupted compaction: retire any live input
        # already named in a live entry's `replaces`
        replaced = {r for e in entries.values() for r in e.get("replaces", [])}
        for k in list(entries):
            if k in replaced:
                manifest.retire(k)
                report["inputs_retired"] += 1
                del entries[k]
        if len(entries) < 2:
            report["skipped_sources"] += 1
            continue

        tables = [
            pq.read_table(os.path.join(out_dir, e["path"]))
            for e in entries.values()
        ]
        import pyarrow as pa

        partials = pa.concat_tables(
            [
                repartial_rollup_batch(t, tier_s, tier_s, t0_us)
                for t in tables
            ]
        )
        merged = merge_partials_batch(partials)
        from ..stages.rollup import finalize_batch

        rolled = finalize_batch(merged, tier_s, t0_us)
        filled = fill_group(rolled, tier_s)
        ts = filled["bucket_ts"].cast("int64")
        t0 = T0_US if t0_us is None else t0_us
        lo = (ts[0].as_py() - t0) // (tier_s * 1_000_000)
        hi = (ts[-1].as_py() - t0) // (tier_s * 1_000_000)
        ctag = hashlib.blake2b(
            "\x00".join(sorted(entries)).encode(), digest_size=6
        ).hexdigest()
        part = f"source={source}__c{ctag}__part-{lo:08d}-{hi:08d}"
        relpath = (
            f"tier={tier}/source={source}/c{ctag}__part-{lo:08d}-{hi:08d}.parquet"
        )
        # phase 1: commit with lineage (replaces = input partition keys)
        write_partition_atomic(
            manifest, run_id, tier, part, relpath, filled,
            meta=dict(
                source=source, bucket_lo=int(lo), bucket_hi=int(hi),
                replaces=sorted(entries),
            ),
        )
        # phase 2: retire inputs + delete their files
        for k, e in entries.items():
            manifest.retire(k)
            try:
                os.unlink(os.path.join(out_dir, e["path"]))
            except FileNotFoundError:
                pass
            report["inputs_retired"] += 1
        report["compacted_sources"] += 1
    return report
