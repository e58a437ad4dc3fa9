"""Retention enforcement: age out fine-tier partitions while coarse tiers
keep longer windows (the "retention" in ingest → rollup → retention).

Planned ENTIRELY from the manifest — partition names carry their bucket
ranges, so expiry never reads data.  Expiry order per partition:

    1. tombstone the manifest entry (``.json`` → ``.json.retired``, atomic)
    2. delete the data file

A replayed epoch cannot resurrect a retired partition (``is_committed``
counts tombstones — the ack outlives the payload, like a broker expiring
an acked delivery), and a crash between 1 and 2 leaves an orphan file no
reader lists (``tier_view`` plans from live manifest entries only).
"""

from __future__ import annotations

import os
import re

from ..state.manifest import Manifest

_PART_RE = re.compile(
    r"^source=(?P<source>.+?)__(?:(?P<etag>[ec][0-9a-f]+)__)?"
    r"part-(?P<lo>\d+)-(?P<hi>\d+)$"
)
_SERIES_RE = re.compile(
    r"^series__(?:(?P<etag>[ec][0-9a-f]+)__)?"
    r"part-(?P<lo>\d+)-(?P<hi>\d+)__source=(?P<source>.+)$"
)
# pre-range-tag series naming (round-2 era: one blob per (epoch, source),
# no bucket range).  Out_dirs upgraded in place still hold these; without a
# fallback match they would accrete unboundedly and stay readable after
# their data partitions expire (round-2 ADVICE).
_LEGACY_SERIES_RE = re.compile(
    r"^series__(?P<etag>[ec][0-9a-f]+)__source=(?P<source>.+)$"
)

# keep this many most-recent buckets per tier; None = keep forever.
# Fine tiers expire fastest — classic TSDB downsampling retention.
DEFAULT_POLICY: dict[str, int | None] = {"1m": 1440, "1h": 720, "1d": None}


def apply_retention(
    out_dir: str,
    policy: dict[str, int | None] | None = None,
    now_bucket: dict[str, int] | None = None,
) -> dict[str, dict]:
    """Expire rollup partitions whose bucket range ends before the horizon.

    horizon(tier) = newest committed bucket_hi (or ``now_bucket[tier]``)
    minus keep + 1; a partition is expired iff its ``bucket_hi`` < horizon.
    Returns per-tier {kept, retired, horizon}.
    """
    policy = DEFAULT_POLICY if policy is None else policy
    manifest = Manifest(out_dir)
    report: dict[str, dict] = {}
    for tier, keep in policy.items():
        entries = {
            k: e
            for k, e in manifest.committed(tier).items()
            if "bucket_hi" in e
        }
        if keep is None or not entries:
            report[tier] = dict(kept=len(entries), retired=0, horizon=None)
            continue
        newest = (
            now_bucket[tier]
            if now_bucket and tier in now_bucket
            else max(e["bucket_hi"] for e in entries.values())
        )
        horizon = newest - keep + 1
        retired = 0
        # (source, etag or "", lo, hi) — series blobs carry the same range
        # tag as their data partition, so the mapping is exactly 1:1
        gone: set[tuple[str, str, str, str]] = set()
        for key, e in entries.items():
            if e["bucket_hi"] < horizon:
                manifest.retire(key)
                try:
                    os.unlink(os.path.join(out_dir, e["path"]))
                except FileNotFoundError:
                    pass
                retired += 1
                m = _PART_RE.match(e["partition"])
                if m:
                    gone.add(
                        (m.group("source"), m.group("etag") or "",
                         m.group("lo"), m.group("hi"))
                    )
        # a series blob covers exactly its data partition's range — retire
        # it alongside, or the expired series stays readable (and series
        # files accumulate unboundedly in watch mode)
        remaining = manifest.committed(tier)
        # live (source, etag) pairs of surviving DATA partitions — a legacy
        # (rangeless) series blob is expired once its pair has none left
        live_pairs: set[tuple[str, str]] = set()
        for e in remaining.values():
            m = _PART_RE.match(e["partition"])
            if m:
                live_pairs.add((m.group("source"), m.group("etag") or ""))
        for key, e in remaining.items():
            m = _SERIES_RE.match(e["partition"])
            if m and (
                m.group("source"), m.group("etag") or "",
                m.group("lo"), m.group("hi"),
            ) in gone:
                manifest.retire(key)
                try:
                    os.unlink(os.path.join(out_dir, e["path"]))
                except FileNotFoundError:
                    pass
                continue
            ml = _LEGACY_SERIES_RE.match(e["partition"])
            if ml and (
                ml.group("source"), ml.group("etag") or "",
            ) not in live_pairs:
                manifest.retire(key)
                try:
                    os.unlink(os.path.join(out_dir, e["path"]))
                except FileNotFoundError:
                    pass
        report[tier] = dict(
            kept=len(entries) - retired, retired=retired, horizon=horizon
        )
    return report
