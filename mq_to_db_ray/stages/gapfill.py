"""E5 gap-fill: emit empty buckets between each source's min and max bucket.

Windowed (round 2): instead of one task per source holding the WHOLE
per-source history, the series is partitioned by (source, window) where a
window is ``window_buckets`` consecutive buckets (default 2^16 — ~45 days at
1m).  Each task fills only the intersection of its window with the source's
global [min, max] bucket extent, so no task ever needs more than
``window_buckets`` points regardless of retention length — the per-source
fallback SURVEY §7 names for multi-year sources.  The global extents are a
tiny per-source aggregate broadcast via ``ray.put``; windows with no data
rows (a gap spanning the whole window) are materialized by marker rows so
the groupby still creates their groups.

Driver footprint is O(#sources + #source-windows) for the extent/marker
tables — the same order as the per-partition metric rows the commit path
already collects, not O(points).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data import Dataset

from .. import schema as sch
from ..timegrid import T0_US, TIERS

# ~45 days of 1m buckets per fill/encode task; bounds task memory while
# keeping single-window outputs (and partition names) at test scale.
DEFAULT_WINDOW_BUCKETS = 1 << 16


def fill_range(
    real: pa.Table, tier_s: int, lo_us: int, hi_us: int, source: str
) -> pa.Table:
    """Dense ROLLUP rows for buckets lo_us..hi_us (inclusive, step-aligned);
    ``real`` holds this range's existing rows (possibly none, sorted or not).
    """
    step = tier_s * 1_000_000
    n = (hi_us - lo_us) // step + 1
    full_ts = lo_us + np.arange(n, dtype=np.int64) * step
    count = np.zeros(n, dtype=np.int64)
    sum_n = np.zeros(n, dtype=np.int64)
    mins = np.zeros(n, dtype=np.int32)
    maxs = np.zeros(n, dtype=np.int32)
    filled = np.ones(n, dtype=bool)
    if real.num_rows:
        ts = (
            real["bucket_ts"].cast(pa.int64()).combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        idx = (ts - lo_us) // step
        count[idx] = real["count"].combine_chunks().to_numpy(zero_copy_only=False)
        sum_n[idx] = real["sum_n_tok"].combine_chunks().to_numpy(zero_copy_only=False)
        mins[idx] = real["min_n_tok"].combine_chunks().to_numpy(zero_copy_only=False)
        maxs[idx] = real["max_n_tok"].combine_chunks().to_numpy(zero_copy_only=False)
        filled[idx] = False
    return pa.Table.from_arrays(
        [
            pa.array([source] * n, type=pa.string()),
            pa.array(full_ts).cast(pa.timestamp("us")),
            pa.array(count),
            pa.array(sum_n),
            pa.array(mins, type=pa.int32(), mask=filled),
            pa.array(maxs, type=pa.int32(), mask=filled),
            pa.array(filled),
        ],
        schema=sch.ROLLUP,
    )


def fill_group(group: pa.Table, tier_s: int) -> pa.Table:
    """One source's unfilled rollup rows -> dense rows over the GROUP's own
    min..max (the unwindowed form, used by compaction and as the windowed
    task's kernel via fill_range)."""
    if group.num_rows == 0:
        return sch.empty(sch.ROLLUP)
    ts = group["bucket_ts"].cast(pa.int64()).combine_chunks().to_numpy(
        zero_copy_only=False
    )
    return fill_range(
        group,
        tier_s,
        int(ts.min()),
        int(ts.max()),
        group["source"][0].as_py(),
    )


def source_extents(rolled: Dataset) -> pa.Table:
    """(source, lo_us, hi_us) per source — per-batch Arrow partials merged
    driver-side (rows transferred: <= #sources per block, never points)."""

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "lo_us": pa.array([], pa.int64()),
                    "hi_us": pa.array([], pa.int64()),
                }
            )
        t = pa.table(
            {"source": b["source"], "ts": b["bucket_ts"].cast(pa.int64())}
        )
        g = t.group_by("source", use_threads=False).aggregate(
            [("ts", "min"), ("ts", "max")]
        )
        return pa.table(
            {"source": g["source"], "lo_us": g["ts_min"], "hi_us": g["ts_max"]}
        )

    def merge(parts: list[pa.Table]) -> pa.Table:
        t = pa.concat_tables(parts)
        g = t.group_by("source", use_threads=False).aggregate(
            [("lo_us", "min"), ("hi_us", "max")]
        )
        return pa.table(
            {
                "source": g["source"],
                "lo_us": g["lo_us_min"],
                "hi_us": g["hi_us_max"],
            }
        )

    # incremental driver-side merge: fold every 64 streamed partials so
    # resident rows stay O(#sources + 64 x per-block partial), not
    # O(#blocks x #sources)
    parts: list[pa.Table] = []
    for b in rolled.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        parts.append(b)
        if len(parts) >= 64:
            parts = [merge(parts)]
    if not parts:
        parts = [partial(sch.empty(sch.ROLLUP))]
    return merge(parts)


def coarsen_extents(ext: pa.Table, tier_s: int) -> pa.Table:
    """Extents of a cascaded tier derived EXACTLY from the finer tier's
    (bucket_ts floors commute with min/max) — saves one pass per tier."""
    step = tier_s * 1_000_000
    lo = ext["lo_us"].to_numpy(zero_copy_only=False)
    hi = ext["hi_us"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "source": ext["source"],
            "lo_us": T0_US + np.floor_divide(lo - T0_US, step) * step,
            "hi_us": T0_US + np.floor_divide(hi - T0_US, step) * step,
        }
    )


def spans_single_window(
    ext: pa.Table, tier_s: int, window_buckets: int
) -> bool:
    """True iff every source's extent fits inside one window — the common
    small case, where the per-source path (no markers/union/extra key) is
    used and produces identical rows and partition names."""
    if ext.num_rows == 0:
        return True
    step = tier_s * 1_000_000
    lo = ext["lo_us"].to_numpy(zero_copy_only=False)
    hi = ext["hi_us"].to_numpy(zero_copy_only=False)
    wlo = np.floor_divide(np.floor_divide(lo - T0_US, step), window_buckets)
    whi = np.floor_divide(np.floor_divide(hi - T0_US, step), window_buckets)
    return bool((wlo == whi).all())


def window_markers(
    extents: pa.Table, tier_s: int, window_buckets: int
) -> pa.Table:
    """One marker row per (source, window) in each source's extent, so a
    window consisting entirely of gap still forms a groupby group.  Markers
    carry ROLLUP columns (count=0, filled=true) + (window_id, is_marker)."""
    step = tier_s * 1_000_000
    src = extents["source"].to_pylist()
    lo = extents["lo_us"].to_numpy(zero_copy_only=False)
    hi = extents["hi_us"].to_numpy(zero_copy_only=False)
    wlo = np.floor_divide(np.floor_divide(lo - T0_US, step), window_buckets)
    whi = np.floor_divide(np.floor_divide(hi - T0_US, step), window_buckets)
    counts = (whi - wlo + 1).astype(np.int64)
    total = int(counts.sum())
    src_rep = np.repeat(np.arange(len(src)), counts)
    offs = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
    win = np.repeat(wlo, counts) + offs
    # marker bucket_ts = window start clipped to the source extent (any
    # in-window, step-aligned value works; it is dropped before filling)
    wstart = T0_US + win * window_buckets * step
    mark_ts = np.maximum(wstart, np.repeat(lo, counts))
    return pa.Table.from_arrays(
        [
            pa.array(np.asarray(src, dtype=object)[src_rep], type=pa.string()),
            pa.array(mark_ts).cast(pa.timestamp("us")),
            pa.array(np.zeros(total, dtype=np.int64)),
            pa.array(np.zeros(total, dtype=np.int64)),
            pa.nulls(total, pa.int32()),
            pa.nulls(total, pa.int32()),
            pa.array(np.ones(total, dtype=bool)),
            pa.array(win, type=pa.int64()),
            pa.array(np.ones(total, dtype=bool)),
        ],
        names=list(sch.ROLLUP.names) + ["window_id", "is_marker"],
    )


def windowed_groups(
    rolled: Dataset, tier_s: int, window_buckets: int,
    ext: pa.Table | None = None,
) -> tuple[Dataset, "ray.ObjectRef"]:
    """(keyed dataset for groupby(['source','window_id']), extents ref).

    The keyed dataset = rolled points tagged with their window + marker rows
    for every (source, window) in range; the extents broadcast lets each
    fill task clip its window to the source's global [min, max]."""
    if ext is None:
        ext = source_extents(rolled)
    order = pc.sort_indices(ext["source"])
    ext = ext.take(order)
    ext_ref = ray.put(
        (
            np.asarray(ext["source"].to_pylist(), dtype=object),
            ext["lo_us"].to_numpy(zero_copy_only=False),
            ext["hi_us"].to_numpy(zero_copy_only=False),
        )
    )
    step = tier_s * 1_000_000

    def add_win(b: pa.Table) -> pa.Table:
        ts = b["bucket_ts"].cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        win = np.floor_divide(
            np.floor_divide(ts - T0_US, step), window_buckets
        )
        return b.append_column(
            "window_id", pa.array(win, type=pa.int64())
        ).append_column("is_marker", pa.array(np.zeros(len(ts), dtype=bool)))

    data = rolled.map_batches(add_win, batch_format="pyarrow")
    markers = window_markers(ext, tier_s, window_buckets)
    return data.union(rd.from_arrow(markers)), ext_ref


def clip_window(
    group: pa.Table, tier_s: int, window_buckets: int, ext
) -> tuple[pa.Table, int, int, str]:
    """Split a (source, window) group into (real_rows, lo_us, hi_us, source)
    where [lo_us, hi_us] is the window clipped to the source's extent."""
    sources, lo_arr, hi_arr = ext
    source = group["source"][0].as_py()
    win = group["window_id"][0].as_py()
    pos = int(np.searchsorted(sources, source))
    step = tier_s * 1_000_000
    wlo_us = T0_US + win * window_buckets * step
    whi_us = wlo_us + (window_buckets - 1) * step
    lo_us = max(wlo_us, int(lo_arr[pos]))
    hi_us = min(whi_us, int(hi_arr[pos]))
    real = group.filter(pc.invert(group["is_marker"])).drop_columns(
        ["window_id", "is_marker"]
    )
    return real, lo_us, hi_us, source


def gap_fill(
    rolled: Dataset,
    tier: str,
    *,
    window_buckets: int = DEFAULT_WINDOW_BUCKETS,
    ext: pa.Table | None = None,
) -> Dataset:
    """E5 over a whole tier: dense per-source series (ROLLUP schema), one
    task per (source, window) — identical rows to the per-source form.
    When every source fits one window (the common small case) the
    per-source fast path skips the marker/union machinery entirely."""
    tier_s = TIERS[tier]
    if ext is None:
        ext = source_extents(rolled)
    if spans_single_window(ext, tier_s, window_buckets):
        return rolled.groupby("source").map_groups(
            lambda g: fill_group(g, tier_s), batch_format="pyarrow"
        )
    keyed, ext_ref = windowed_groups(rolled, tier_s, window_buckets, ext)

    def fill_window(g: pa.Table) -> pa.Table:
        real, lo_us, hi_us, source = clip_window(
            g, tier_s, window_buckets, ray.get(ext_ref)
        )
        return fill_range(real, tier_s, lo_us, hi_us, source)

    return keyed.groupby(["source", "window_id"]).map_groups(
        fill_window, batch_format="pyarrow"
    )
