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
import re
import uuid

import pyarrow.parquet as pq

from ..state.manifest import Manifest, write_partition_atomic
from ..stages.rollup import merge_partials_batch, repartial_rollup_batch
from ..stages.gapfill import fill_group
from ..timegrid import T0_US, TIERS

_PART_RE = re.compile(
    r"^source=(?P<source>.+?)__(?P<tag>(?:[ec][0-9a-f]+__)?part-\d+-\d+)$"
)


def _series_key_for(tier: str, partition: str, source: str) -> str | None:
    """Manifest key of the series blob covering one data partition
    (``source=s__e<ep>__part-L-H`` -> ``tier=1m__series__e<ep>__part-L-H__source=s``
    — series blobs carry the same range tag, 1:1)."""
    m = _PART_RE.match(partition)
    if not m:
        return None
    return f"tier={tier}__series__{m.group('tag')}__source={source}"


def compact_tier(
    out_dir: str, tier: str, *, t0_us: int | None = None,
    window_buckets: int | None = None,
) -> dict:
    """Compact every (source, window) with >1 live partition; returns a
    report.  Folding is per WINDOW (a partition's window = bucket_lo //
    window_buckets), so compaction never re-merges a long source's windowed
    partitions into one unbounded file.

    Runs driver-side over ROLLED-UP points (sources x buckets — MBs even at
    10^12-sequence scale), so no Ray session is required."""
    from ..stages.gapfill import DEFAULT_WINDOW_BUCKETS

    manifest = Manifest(out_dir)
    # respect the out_dir's PINNED window grid — folding across a custom
    # pinned window boundary would produce partitions the writer could
    # never have produced (and re-merge what windowing bounded)
    wb = (
        window_buckets
        or manifest.layout().get("window_buckets")
        or DEFAULT_WINDOW_BUCKETS
    )
    run_id = uuid.uuid4().hex[:12]
    tier_s = TIERS[tier]
    live = {
        k: e
        for k, e in manifest.committed(tier).items()
        if not e["partition"].startswith("series__") and "bucket_lo" in e
    }
    by_source: dict[tuple[str, int], dict[str, dict]] = {}
    for k, e in live.items():
        key = (e["source"], e["bucket_lo"] // wb)
        by_source.setdefault(key, {})[k] = e

    report = dict(tier=tier, compacted_sources=0, inputs_retired=0, skipped_sources=0)
    for (source, _win), entries in sorted(by_source.items()):
        # finish a previously-interrupted compaction: retire any live input
        # (data partition OR its epoch's series blob) already named in a live
        # entry's `replaces` — series files would otherwise accrete
        # unboundedly in watch mode, the very problem compaction solves
        replaced = {r for e in entries.values() for r in e.get("replaces", [])}
        for k in list(entries):
            if k in replaced:
                manifest.retire(k)
                report["inputs_retired"] += 1
                del entries[k]
        _retire_series(manifest, out_dir, replaced, report)
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
        # the replaced epochs' series blobs are superseded too: the new
        # single-partition series is re-encoded from the compacted points
        live_keys = set(manifest.committed(tier))
        series_keys = sorted(
            sk
            for sk in (
                _series_key_for(tier, e["partition"], source)
                for e in entries.values()
            )
            if sk is not None and sk in live_keys
        )
        # phase 1a: commit the re-encoded series blob FIRST (deterministic
        # ctag name -> a crashed rerun skips it via the manifest)
        from ..stages.encode import encode_group

        series = encode_group(filled, tier)
        srng = f"part-{lo:08d}-{hi:08d}"
        write_partition_atomic(
            manifest, run_id, tier,
            f"series__c{ctag}__{srng}__source={source}",
            f"series/tier={tier}/c{ctag}__{srng}__source={source}.parquet",
            series,
        )
        # phase 1b: commit the data partition with lineage (replaces = input
        # data partitions AND their series blobs)
        write_partition_atomic(
            manifest, run_id, tier, part, relpath, filled,
            meta=dict(
                source=source, bucket_lo=int(lo), bucket_hi=int(hi),
                replaces=sorted(entries) + series_keys,
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
        _retire_series(manifest, out_dir, set(series_keys), report)
        report["compacted_sources"] += 1
    return report


def _retire_series(
    manifest: Manifest, out_dir: str, keys: set[str], report: dict
) -> None:
    """Tombstone + delete any still-live series entries among ``keys``."""
    if not keys:
        return
    for k, e in list(manifest.committed().items()):
        if k in keys and k.split("__", 1)[1].startswith("series__"):
            manifest.retire(k)
            try:
                os.unlink(os.path.join(out_dir, e["path"]))
            except FileNotFoundError:
                pass
            report["inputs_retired"] += 1
