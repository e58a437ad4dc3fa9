"""Temporal relational operators: as-of join, rolling-window aggregate,
sessionization.

The reference's data product is a time-series (its only numeric output is
Prometheus counters/histograms, `/root/reference/internal/metrics/metrics.go`)
but it has no query layer; these are the engine-side temporal operators the
tier mandates, built Ray-Data-first:

- **as-of join**: both sides hash-partitioned by the entity key (every row
  of a key meets in exactly one partition — no halo needed), then ONE
  vectorized forward-fill kernel per partition (lexsort + maximum.accumulate)
  attaches the latest right-side value at-or-before each left timestamp.
  No per-key Python loop, nothing corpus-sized anywhere.
- **rolling aggregate**: trailing-W sum over the dense gap-filled grid,
  partitioned by (source, window_id) with a (W-1)-row halo replicated into
  the next window so every group computes its rolling sums locally; a
  source's multi-year history never has to fit one task (same windowing
  contract as stages/gapfill.py).
- **sessionize**: hash-partition by entity key, one lexsort +
  ``np.add.reduceat`` kernel per partition emits per-session aggregates.

All kernels are integer-exact (counts / floored values), so every operator
is bit-reproducible by a DuckDB oracle (window functions / ASOF JOIN).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..timegrid import TIERS
from .shuffle import HASH_MULT, hash_partition_merge, shuffle_parts

__all__ = ["asof_join", "range_join", "rolling_sum", "sessionize"]


def _i64(col: pa.ChunkedArray) -> np.ndarray:
    return col.cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)


def _kw_partition(ds: Dataset, merge_fn, parts: int) -> Dataset:
    """Co-locate rows by hash(k, w) % parts and merge per partition — the
    (key, coarse-time-window) sub-partitioning the hot-key temporal
    operators use so a single entity's corpus-sized history never lands in
    one task.  Columns ``k``/``w`` must be int64; ``w`` is dropped before
    ``merge_fn`` (kernels are window-agnostic)."""

    def add_part(b: pa.Table) -> pa.Table:
        kk = _i64(b["k"])
        ww = _i64(b["w"])
        h = ((kk ^ (ww * HASH_MULT)) * HASH_MULT) & (parts - 1)
        return b.append_column("part", pa.array(h.astype(np.int32)))

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: merge_fn(g.drop_columns(["part", "w"])),
            batch_format="pyarrow",
        )
    )


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------

def asof_join(
    left: Dataset,
    right: Dataset,
    *,
    key: str,
    ts: str,
    value: str,
    out_value: str = "asof_value",
    k: int | None = None,
    window_us: int | None = None,
) -> Dataset:
    """For each left row, attach the right row's ``value`` with the largest
    ``right.ts <= left.ts`` for the same ``key`` (null when none exists) —
    `l ASOF LEFT JOIN r ON l.key = r.key AND l.ts >= r.ts`.

    ``left`` keeps all its columns; ``right`` must have exactly
    (key, ts, value) with an integer value column. Duplicate right rows on
    one (key, ts) resolve to the MAX value (deterministic; equivalent to
    pre-aggregating the right side with max()).

    Scale shape: one hash shuffle on ``key`` co-locates both sides, then a
    single O(n log n) numpy kernel per partition; per-task memory is
    O(partition), driver memory O(1).

    ``window_us`` enables the HOT-KEY defense: rows partition by
    (key, ts // window_us) so one entity's corpus-sized history spreads
    over many tasks.  An as-of needs an unbounded-lookback prefix a halo
    can't carry, so this is the two-pass carried-prefix shape
    (grid_cumsum's), kept fully distributed because keys are
    high-cardinality (no driver fold): pass 1 reduces each (key, window)
    to one summary row (latest right (ts, value); plus a marker for
    windows holding only left rows), shuffles summaries by key, and one
    per-key kernel forward-fills across windows to emit each window's
    carry-in right row; pass 2 shuffles data + carry rows by
    (key, window) and runs the SAME merge kernel.  Exchanged extra state
    is O(distinct (key, window)), never row-proportional.
    """
    lsch = left.schema()
    l_types = dict(zip(lsch.names, lsch.types))
    l_payload = [c for c in lsch.names if c not in (key, ts)]

    def tag_left(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {
            "k": pc.cast(b[key], pa.int64()),
            "t": pc.cast(b[ts], pa.int64()),
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "v": pa.nulls(n, pa.int64()),
        }
        for c in l_payload:
            cols[c] = b[c]
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {
            "k": pc.cast(b[key], pa.int64()),
            "t": pc.cast(b[ts], pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "v": pc.cast(b[value], pa.int64()),
        }
        for c in l_payload:
            cols[c] = pa.nulls(n, l_types[c])
        return pa.table(cols)

    ts_type = l_types[ts]

    def merge(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table(
                {key: pa.array([], pa.int64()), ts: pa.array([], ts_type),
                 out_value: pa.array([], pa.int64())}
                | {c: pa.array([], l_types[c]) for c in l_payload}
            )
        kk = _i64(t["k"])
        tt = _i64(t["t"])
        side = _i64(t["side"])
        vv = t["v"].combine_chunks().to_numpy(zero_copy_only=False)
        vfill = np.where(side == 0, np.nan_to_num(vv.astype(np.float64)), 0.0)
        # (key, ts, side, value): right-before-left at equal ts realises
        # l.ts >= r.ts; value innermost makes duplicate right (key, ts)
        # rows resolve to max().
        order = np.lexsort((vfill, side, tt, kk))
        ks, tss, ss = kk[order], tt[order], side[order]
        # forward-fill: index of the latest right row at-or-before each
        # position. Indexes are monotone, so a plain running max suffices;
        # a carry across a key boundary is invalidated by the key check.
        ridx = np.where(ss == 0, np.arange(n), -1)
        np.maximum.accumulate(ridx, out=ridx)
        has = (ridx >= 0) & (ks[np.maximum(ridx, 0)] == ks)
        is_l = ss == 1
        lidx = order[is_l]
        att = np.where(has[is_l], ridx[is_l], 0)
        raw = vv[order][att]
        if raw.dtype.kind == "f":  # null lanes surface as NaN; masked below
            raw = np.nan_to_num(raw)
        av = raw.astype(np.int64, copy=False)
        out = {
            key: pa.array(ks[is_l]),
            ts: pa.array(tss[is_l]).cast(ts_type),
            out_value: pa.array(
                np.ma.masked_array(av, mask=~has[is_l]), type=pa.int64()
            ),
        }
        for c in l_payload:
            out[c] = t[c].combine_chunks().take(pa.array(lidx, pa.int64()))
        return pa.table(out)

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )
    if window_us is None:
        return hash_partition_merge(both, "k", merge, k=k)

    # ---- sub-windowed path ----
    def add_w(b: pa.Table) -> pa.Table:
        w = np.floor_divide(_i64(b["t"]), window_us)
        return b.append_column("w", pa.array(w, pa.int64()))

    # `tagged` is consumed twice (summary pass + main shuffle) WITHOUT a
    # materialize: upstream is map-only over a pruned read, so recomputing
    # it streams, while materializing would pin the full row-level input
    # in the object store — the wrong trade at 100 TB.
    tagged = both.map_batches(add_w, batch_format="pyarrow")

    def summarize(b: pa.Table) -> pa.Table:
        """Per-batch combiner: one row per (key, window) — the latest
        right (t, v) for windows with right rows (isr=1), a bare marker
        for windows holding left rows (isr=0)."""
        kk_ = _i64(b["k"])
        ww = _i64(b["w"])
        tt = _i64(b["t"])
        vv = _i64(pc.fill_null(b["v"], 0))
        right_m = _i64(b["side"]) == 0
        out_k, out_w, out_t, out_v, out_ir = [], [], [], [], []
        if right_m.any():
            rk, rw = kk_[right_m], ww[right_m]
            rt, rv = tt[right_m], vv[right_m]
            o = np.lexsort((rv, rt, rw, rk))
            rk, rw, rt, rv = rk[o], rw[o], rt[o], rv[o]
            last = np.empty(len(rk), dtype=bool)
            last[-1] = True
            last[:-1] = (rk[1:] != rk[:-1]) | (rw[1:] != rw[:-1])
            out_k.append(rk[last])
            out_w.append(rw[last])
            out_t.append(rt[last])
            out_v.append(rv[last])
            out_ir.append(np.ones(int(last.sum()), np.int8))
        left_m = ~right_m
        if left_m.any():
            lk, lw = kk_[left_m], ww[left_m]
            o = np.lexsort((lw, lk))
            lk, lw = lk[o], lw[o]
            first = np.empty(len(lk), dtype=bool)
            first[0] = True
            first[1:] = (lk[1:] != lk[:-1]) | (lw[1:] != lw[:-1])
            nf = int(first.sum())
            out_k.append(lk[first])
            out_w.append(lw[first])
            out_t.append(np.zeros(nf, np.int64))
            out_v.append(np.zeros(nf, np.int64))
            out_ir.append(np.zeros(nf, np.int8))
        return pa.table(
            {
                "k": pa.array(np.concatenate(out_k) if out_k else
                              np.empty(0, np.int64)),
                "w": pa.array(np.concatenate(out_w) if out_w else
                              np.empty(0, np.int64)),
                "t": pa.array(np.concatenate(out_t) if out_t else
                              np.empty(0, np.int64)),
                "v": pa.array(np.concatenate(out_v) if out_v else
                              np.empty(0, np.int64)),
                "isr": pa.array(np.concatenate(out_ir) if out_ir else
                                np.empty(0, np.int8)),
            }
        )

    def carry_kernel(t_: pa.Table) -> pa.Table:
        """Per-key pass over (key, window) summaries: each window's
        carry-in = the latest right row of any STRICTLY earlier window."""
        empty = {
            "k": pa.array([], pa.int64()),
            "w": pa.array([], pa.int64()),
            "t": pa.array([], pa.int64()),
            "v": pa.array([], pa.int64()),
        }
        if t_.num_rows == 0:
            return pa.table(empty)
        kk_ = _i64(t_["k"])
        ww = _i64(t_["w"])
        tt = _i64(t_["t"])
        vv = _i64(t_["v"])
        ir = _i64(t_["isr"])
        order = np.lexsort((vv, tt, ir, ww, kk_))
        ks, ws, ts_, vs, irs = (
            kk_[order], ww[order], tt[order], vv[order], ir[order]
        )
        n = len(order)
        ridx = np.where(irs == 1, np.arange(n), -1)
        np.maximum.accumulate(ridx, out=ridx)
        new_g = np.empty(n, dtype=bool)
        new_g[0] = True
        new_g[1:] = (ks[1:] != ks[:-1]) | (ws[1:] != ws[:-1])
        starts = np.flatnonzero(new_g)
        prev = starts - 1
        valid = starts > 0
        cand = np.where(valid, ridx[np.maximum(prev, 0)], -1)
        valid &= (cand >= 0) & (ks[np.maximum(cand, 0)] == ks[starts])
        sel = starts[valid]
        c = cand[valid]
        return pa.table(
            {
                "k": pa.array(ks[sel]),
                "w": pa.array(ws[sel]),
                "t": pa.array(ts_[c]),
                "v": pa.array(vs[c]),
            }
        )

    carries = hash_partition_merge(
        tagged.map_batches(
            # big batches: the combiner compresses to one row per
            # (key, window) per CALL, so batch size bounds its output
            summarize, batch_format="pyarrow", batch_size=256 * 1024,
        ),
        "k",
        carry_kernel,
        k=k,
    )

    def tag_carry(b: pa.Table) -> pa.Table:
        """Carry rows re-enter pass 2 as ordinary right rows of their
        TARGET window (their ts is earlier, so they sort first and act as
        the window's as-of floor); schema must match `tagged` exactly."""
        n = b.num_rows
        cols = {
            "k": b["k"],
            "t": b["t"],
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "v": b["v"],
        }
        for c in l_payload:
            cols[c] = pa.nulls(n, l_types[c])
        cols["w"] = b["w"]
        return pa.table(cols)

    full = tagged.union(carries.map_batches(tag_carry, batch_format="pyarrow"))
    return _kw_partition(full, merge, shuffle_parts(k))


# ---------------------------------------------------------------------------
# rolling (trailing-window) aggregate over a dense grid
# ---------------------------------------------------------------------------

def _add_windows(
    b: pa.Table,
    cols: list[str],
    t0_us: int,
    step: int,
    window_buckets: int,
    halo_rows: int,
) -> pa.Table:
    """The (source, window_id) windowing contract shared by rolling_sum /
    grid_lag / grid_cumsum: tag each grid row with its window and bucket
    index, and replicate each window's LAST ``halo_rows`` rows into the
    next window (halo=True) so bounded-lookback kernels resolve their
    predecessors locally.  ``halo_rows=0`` emits no halo."""
    idx = (_i64(b["bucket_ts"]) - t0_us) // step
    win = idx // window_buckets
    base = b.select(["source", "bucket_ts", *cols])
    main = base.append_column(
        "window_id", pa.array(win, pa.int64())
    ).append_column("idx", pa.array(idx, pa.int64())).append_column(
        "halo", pa.array(np.zeros(len(idx), dtype=bool))
    )
    if halo_rows <= 0:
        return main
    hmask = idx % window_buckets >= window_buckets - halo_rows
    if not hmask.any():
        return main
    halo = base.filter(pa.array(hmask)).append_column(
        "window_id", pa.array(win[hmask] + 1, pa.int64())
    ).append_column(
        "idx", pa.array(idx[hmask], pa.int64())
    ).append_column("halo", pa.array(np.ones(int(hmask.sum()), dtype=bool)))
    return pa.concat_tables([main, halo])


def rolling_sum(
    grid: Dataset,
    tier: str,
    w: int,
    cols: list[str],
    *,
    t0_us: int,
    window_buckets: int = 4096,
    keep_cols: tuple[str, ...] = (),
) -> Dataset:
    """Trailing-``w``-bucket sums of ``cols`` over a DENSE per-source grid
    (the output of stages/gapfill.gap_fill) — SQL
    ``SUM(c) OVER (PARTITION BY source ORDER BY bucket_ts
    ROWS BETWEEN w-1 PRECEDING AND CURRENT ROW)``.

    Scale shape: rows are grouped by (source, window_id) where a window is
    ``window_buckets`` consecutive grid buckets, and each window's last
    ``w-1`` rows are ALSO replicated into the next window as halo, so every
    group computes its rolling sums with one cumsum and no neighbour
    communication. The halo invariant requires ``w <= window_buckets``.
    ``keep_cols`` (a subset of ``cols``) are ALSO passed through unrolled,
    so kernels that compare a row against its own trailing window (e.g. the
    z-score anomaly flag) get both without a second shuffle.
    Output: (source, bucket_ts, <keep_cols...>, roll_<c>...) per grid row.
    """
    assert w <= window_buckets, "halo width must fit one window"
    assert set(keep_cols) <= set(cols), "keep_cols must be rolled too"
    step = TIERS[tier] * 1_000_000

    def add_win(b: pa.Table) -> pa.Table:
        return _add_windows(b, cols, t0_us, step, window_buckets, w - 1)

    def roll_group(g: pa.Table) -> pa.Table:
        idx = _i64(g["idx"])
        order = np.argsort(idx, kind="stable")
        halo = g["halo"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        keep = ~halo
        out = {
            "source": g["source"].combine_chunks().take(
                pa.array(order[keep], pa.int64())
            ),
            "bucket_ts": g["bucket_ts"].combine_chunks().take(
                pa.array(order[keep], pa.int64())
            ),
        }
        # grid is dense, so position i's trailing window is rows i-w+1..i;
        # halo rows supply the cross-window predecessors.
        for c in cols:
            v = _i64(g[c])[order]
            if c in keep_cols:
                out[c] = pa.array(v[keep], pa.int64())
            cs = np.concatenate(([0], np.cumsum(v)))
            lo = np.maximum(np.arange(len(v)) - w + 1, 0)
            roll = cs[1:] - cs[lo]
            out[f"roll_{c}"] = pa.array(roll[keep], pa.int64())
        return pa.table(out)

    keyed = grid.map_batches(add_win, batch_format="pyarrow")
    return keyed.groupby(["source", "window_id"]).map_groups(
        roll_group, batch_format="pyarrow"
    )


def grid_lag(
    grid: Dataset,
    tier: str,
    cols: list[str],
    *,
    t0_us: int,
    window_buckets: int = 4096,
) -> Dataset:
    """Previous-bucket value of ``cols`` over a DENSE per-source grid — SQL
    ``lag(c) OVER (PARTITION BY source ORDER BY bucket_ts)`` (NULL on each
    source's first grid bucket).  The finite-difference / PromQL-delta
    building block over gap_fill output.

    Same windowing contract as :func:`rolling_sum` with halo width 1: rows
    group by (source, window_id) and each window's LAST row is replicated
    into the next window, so every group resolves its predecessors locally.
    The grid is dense per source (gap_fill output), so a kept row's
    predecessor is missing only at the source's overall first bucket.
    Output: (source, bucket_ts, <cols...>, lag_<c>...).
    """
    step = TIERS[tier] * 1_000_000

    def add_win(b: pa.Table) -> pa.Table:
        return _add_windows(b, cols, t0_us, step, window_buckets, 1)

    def lag_group(g: pa.Table) -> pa.Table:
        idx = _i64(g["idx"])
        order = np.argsort(idx, kind="stable")
        halo = g["halo"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        keep = ~halo
        take = pa.array(order[keep], pa.int64())
        out = {
            "source": g["source"].combine_chunks().take(take),
            "bucket_ts": g["bucket_ts"].combine_chunks().take(take),
        }
        n = len(idx)
        # dense grid: row at sorted position i has a predecessor iff the
        # previous sorted row holds bucket idx-1 (halo rows included).
        has_prev = np.zeros(n, dtype=bool)
        if n > 1:
            has_prev[1:] = idx[order][1:] == idx[order][:-1] + 1
        for c in cols:
            v = _i64(g[c])[order]
            lag = np.empty(n, dtype=np.int64)
            lag[1:] = v[:-1]
            lag[0] = 0
            out[c] = pa.array(v[keep], pa.int64())
            out[f"lag_{c}"] = pa.array(
                lag[keep], pa.int64(), mask=~has_prev[keep]
            )
        return pa.table(out)

    keyed = grid.map_batches(add_win, batch_format="pyarrow")
    return keyed.groupby(["source", "window_id"]).map_groups(
        lag_group, batch_format="pyarrow"
    )


def grid_cumsum(
    grid: Dataset,
    tier: str,
    cols: list[str],
    *,
    t0_us: int,
    window_buckets: int = 4096,
) -> Dataset:
    """Running total of ``cols`` over a DENSE per-source grid — SQL
    ``SUM(c) OVER (PARTITION BY source ORDER BY bucket_ts ROWS UNBOUNDED
    PRECEDING)`` — the "continuous aggregate so far" a rollup dashboard
    plots.  Output: (source, bucket_ts, <cols...>, cum_<c>...).

    A halo can't carry an unbounded prefix, so this is the distributed
    ordered prefix-scan shape (pipelines/corpus.pack_sequences):
      1. one narrow pass emits per-(source, window_id) sums; the partials
         Dataset is folded incrementally on the driver at
         O(sources x windows) — never row-level data;
      2. the driver exclusive-scans each source's window sums into base
         offsets, broadcast via ``ray.put`` (tiny);
      3. each (source, window_id) group cumsums locally and adds its base.
    At 100 TB, ``window_buckets`` rises so sources x windows stays ~1e6.
    """
    import ray

    step = TIERS[tier] * 1_000_000

    def add_win(b: pa.Table) -> pa.Table:
        return _add_windows(b, cols, t0_us, step, window_buckets, 0)

    # materialize the tagged grid ONCE: both the window-sum fold below and
    # the final cum_group groupby consume it, and without this the whole
    # upstream pipeline (read -> rollup shuffle -> gap_fill) would execute
    # twice.  The grid is rolled points — the sanctioned materialize
    # (sources x buckets rows, same as pipelines/cascade.py's rolled tiers).
    keyed = grid.map_batches(add_win, batch_format="pyarrow").materialize()

    def window_sums(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "window_id"], use_threads=False).aggregate(
            [(c, "sum") for c in cols]
        )
        return g.rename_columns(["source", "window_id", *[f"s_{c}" for c in cols]])

    # Driver fold: one numpy group-reduce over the streamed partials — no
    # per-row python (same shape as pipelines/corpus.pack_stream).  The
    # broadcast is (sorted source list, packed (code, window) keys, base
    # matrix); each group resolves its base with one searchsorted.
    partials = keyed.map_batches(window_sums, batch_format="pyarrow")
    agg = pa.concat_tables(
        list(partials.iter_batches(batch_format="pyarrow"))
    ).group_by(["source", "window_id"]).aggregate(
        [(f"s_{c}", "sum") for c in cols]
    )
    src_d = pc.dictionary_encode(agg["source"].combine_chunks())
    g_codes = src_d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    g_uniq = src_d.dictionary
    g_win = agg["window_id"].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.lexsort((g_win, g_codes))
    g_codes, g_win = g_codes[order], g_win[order]
    n_g = len(g_codes)
    base_mat = np.zeros((n_g, len(cols)), np.int64)
    if n_g:
        new_src = np.empty(n_g, dtype=bool)
        new_src[0] = True
        new_src[1:] = g_codes[1:] != g_codes[:-1]
        starts = np.flatnonzero(new_src)
        counts = np.diff(np.append(starts, n_g))
        for j, c in enumerate(cols):
            s_np = (
                agg[f"s_{c}_sum"]
                .combine_chunks()
                .to_numpy(zero_copy_only=False)[order]
            )
            excl = np.cumsum(s_np) - s_np
            base_mat[:, j] = excl - np.repeat(excl[starts], counts)
    # shift windows non-negative before packing (pre-t0 buckets give
    # negative window ids, which would break key uniqueness)
    w_off = int(g_win.min()) if n_g else 0
    key_mult = int(g_win.max()) - w_off + 1 if n_g else 1
    packed = g_codes * key_mult + (g_win - w_off)  # ascending by construction
    bases_ref = ray.put((g_uniq, packed, base_mat, key_mult, w_off))

    def cum_group(g: pa.Table) -> pa.Table:
        uniq, pk, bm, mult, woff = ray.get(bases_ref)
        s = g["source"][0].as_py()
        w = g["window_id"][0].as_py()
        gcode = uniq.index(pa.scalar(s)).as_py()
        b0 = bm[np.searchsorted(pk, gcode * mult + (int(w) - woff))]
        idx = _i64(g["idx"])
        order = np.argsort(idx, kind="stable")
        take = pa.array(order, pa.int64())
        out = {
            "source": g["source"].combine_chunks().take(take),
            "bucket_ts": g["bucket_ts"].combine_chunks().take(take),
        }
        for j, c in enumerate(cols):
            v = _i64(g[c])[order]
            out[c] = pa.array(v, pa.int64())
            out[f"cum_{c}"] = pa.array(np.cumsum(v) + b0[j], pa.int64())
        return pa.table(out)

    return keyed.groupby(["source", "window_id"]).map_groups(
        cum_group, batch_format="pyarrow"
    )


def _ewma_scan(
    x: np.ndarray, a: float, d: float, carry: float
) -> np.ndarray:
    """Serial recurrence s_i = a*x_i + d*s_{i-1} (s_{-1} = carry),
    vectorized via the renormalized prefix form
    ``s_t = d^t * cumsum(a * x_j * d^-j) + d^(t+1) * carry`` in chunks
    small enough that ``x_j * d^-j`` cannot overflow float64 (exponent
    budget 600 nats leaves ~1e47 of headroom for the data magnitude).
    One numpy pass per chunk; the Python loop runs ``len(x) / chunk``
    times (<= 7 for the default window sizes)."""
    out = np.empty(len(x), dtype=np.float64)
    if not len(x):
        return out
    if d <= 0.0:
        out[:] = a * x
        return out
    chunk = max(1, min(1024, int(600.0 / max(1e-12, -np.log(d)))))
    c = carry
    for start in range(0, len(x), chunk):
        seg = x[start : start + chunk]
        t = np.arange(len(seg), dtype=np.float64)
        dpow = d**t
        s = dpow * np.cumsum(a * seg / dpow) + dpow * d * c
        out[start : start + len(seg)] = s
        c = s[-1]
    return out


def grid_ewma(
    grid: Dataset,
    tier: str,
    col: str,
    *,
    alpha: float,
    t0_us: int,
    window_buckets: int = 4096,
) -> Dataset:
    """Exponentially weighted moving average of ``col`` over a DENSE
    per-source grid — the zero-initialized recurrence
    ``s_i = alpha*x_i + (1-alpha)*s_{i-1}`` (s_{-1} = 0), the smoothed
    series every alerting rule compares its raw counts against.
    Output: (source, bucket_ts, <col>, ewma).

    A linear recurrence can't halo (unbounded lookback), but it IS a
    prefix scan under the associative map (A, L) — grid_cumsum's shape
    with a multiplicative twist:
      1. one narrow pass emits per-(source, window_id) partials
         ``A_w = alpha * sum d^(nominal_end_w - idx_j) * x_j`` — the
         window's end-state under zero init.  The exponent depends only
         on each row's own idx, so fragments of a window sum across
         batches (unlike the end-state under an arbitrary init);
      2. the driver scans each source's window partials
         ``S_w = A_w + d^window_buckets * S_{w-1}`` (O(sources x windows)
         floats, same bound as grid_cumsum's fold) and broadcasts the
         exclusive carries;
      3. each (source, window_id) group runs the in-window recurrence
         seeded with its carry (one vectorized _ewma_scan).
    Missing leading rows of a source's first window contribute exactly
    zero under zero init, so the dense-interior grid invariant (gap_fill
    output) is the only ordering assumption."""
    import ray

    step = TIERS[tier] * 1_000_000
    d = 1.0 - alpha

    def add_win(b: pa.Table) -> pa.Table:
        return _add_windows(b, [col], t0_us, step, window_buckets, 0)

    # same sanctioned materialize as grid_cumsum: both the fold and the
    # final groupby consume the tagged grid
    keyed = grid.map_batches(add_win, batch_format="pyarrow").materialize()

    def window_partials(b: pa.Table) -> pa.Table:
        idx = _i64(b["idx"])
        win = _i64(b["window_id"])
        x = _i64(b[col]).astype(np.float64)
        e = (win + 1) * window_buckets - 1 - idx
        t = pa.table(
            {
                "source": b["source"],
                "window_id": b["window_id"],
                "a_part": pa.array(alpha * np.power(d, e.astype(np.float64)) * x),
            }
        )
        g = t.group_by(["source", "window_id"], use_threads=False).aggregate(
            [("a_part", "sum")]
        )
        return g.rename_columns(["source", "window_id", "a_part"])

    partials = keyed.map_batches(window_partials, batch_format="pyarrow")
    agg = pa.concat_tables(
        list(partials.iter_batches(batch_format="pyarrow"))
    ).group_by(["source", "window_id"]).aggregate([("a_part", "sum")])
    src_d = pc.dictionary_encode(agg["source"].combine_chunks())
    g_codes = src_d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    g_uniq = src_d.dictionary
    g_win = agg["window_id"].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.lexsort((g_win, g_codes))
    g_codes, g_win = g_codes[order], g_win[order]
    a_vals = (
        agg["a_part_sum"].combine_chunks().to_numpy(zero_copy_only=False)[order]
    )
    n_g = len(g_codes)
    carries = np.zeros(n_g, dtype=np.float64)
    if n_g:
        dd = d**window_buckets
        new_src = np.empty(n_g, dtype=bool)
        new_src[0] = True
        new_src[1:] = g_codes[1:] != g_codes[:-1]
        starts = np.flatnonzero(new_src)
        bounds = np.append(starts, n_g)
        for si, (lo, hi) in enumerate(zip(bounds[:-1], bounds[1:])):
            s_scan = _ewma_scan(a_vals[lo:hi], 1.0, dd, 0.0)
            carries[lo + 1 : hi] = s_scan[:-1]  # exclusive: C_w = S_{w-1}
    w_off = int(g_win.min()) if n_g else 0
    key_mult = int(g_win.max()) - w_off + 1 if n_g else 1
    packed = g_codes * key_mult + (g_win - w_off)
    bases_ref = ray.put((g_uniq, packed, carries, key_mult, w_off))

    def ewma_group(g: pa.Table) -> pa.Table:
        uniq, pk, cv, mult, woff = ray.get(bases_ref)
        s = g["source"][0].as_py()
        w = g["window_id"][0].as_py()
        gcode = uniq.index(pa.scalar(s)).as_py()
        c0 = cv[np.searchsorted(pk, gcode * mult + (int(w) - woff))]
        idx = _i64(g["idx"])
        order = np.argsort(idx, kind="stable")
        take = pa.array(order, pa.int64())
        x = _i64(g[col])[order].astype(np.float64)
        return pa.table(
            {
                "source": g["source"].combine_chunks().take(take),
                "bucket_ts": g["bucket_ts"].combine_chunks().take(take),
                col: pa.array(x.astype(np.int64), pa.int64()),
                "ewma": pa.array(_ewma_scan(x, alpha, d, float(c0))),
            }
        )

    return keyed.groupby(["source", "window_id"]).map_groups(
        ewma_group, batch_format="pyarrow"
    )


def grid_cusum(
    grid: Dataset,
    tier: str,
    col: str,
    *,
    t0_us: int,
) -> Dataset:
    """One-sided CUSUM change detector over a DENSE per-source grid — the
    classic burst/level-shift statistic ``S_i = max(0, S_{i-1} + x_i - k)``
    with per-source integer drift ``k = ceil(mean(x))``, in its scan-free
    closed form ``S_i = P_i - min(0, min_{j<=i} P_j)`` where ``P`` is the
    running sum of ``y = x - k``.  Everything stays exact int64.
    Output: (source, bucket_ts, <col>, cusum).

    Scale shape — NO shuffle at all; three streaming passes over the one
    sanctioned materialized grid (rolled points, the grid_cumsum bound):
      A. batch-summable (source, n, sum) partials -> driver computes each
         source's exact integer drift k (O(sources) rows);
      B. with ``batch_size=None`` a batch IS a materialized block, so
         blocks are identical across passes; each block lexsorts by
         (source, idx) and emits one summary per CONTIGUOUS RUN
         (source, start_idx, run_len, sum_y, min_prefix_y) — the grid is
         dense per source (gap_fill invariant), so the runs of a source
         tile its extent and the driver can fold them in idx order with
         the associative pair rule (s1,m1)+(s2,m2) = (s1+s2, min(m1,
         s1+m2)), O(blocks x sources-per-block) summaries total;
      C. the same blocks re-derive their runs bit-identically, look up
         each run's carried (base_P, min_before) via one searchsorted
         into the broadcast fold, and finish with vectorized
         cumsum/minimum.accumulate.
    At 100 TB the driver fold stays tiny (summaries, never rows) and no
    row-level exchange exists to skew."""
    import ray

    step = TIERS[tier] * 1_000_000

    def tag(b: pa.Table) -> pa.Table:
        idx = (_i64(b["bucket_ts"]) - t0_us) // step
        return b.select(["source", "bucket_ts", col]).append_column(
            "idx", pa.array(idx, pa.int64())
        )

    keyed = grid.map_batches(tag, batch_format="pyarrow").materialize()

    # --- pass A: per-source totals -> integer drift k ---
    def totals(b: pa.Table) -> pa.Table:
        g = b.group_by("source", use_threads=False).aggregate(
            [(col, "sum"), (col, "count")]
        )
        return g.rename_columns(["source", "s", "n"])

    tot = pa.concat_tables(
        list(
            keyed.map_batches(totals, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
        )
    ).group_by("source").aggregate([("s", "sum"), ("n", "sum")])
    src_sorted = pc.array_sort_indices(tot["source"].combine_chunks())
    srcs = tot["source"].combine_chunks().take(src_sorted)
    s_tot = _i64(tot["s_sum"])[src_sorted.to_numpy(zero_copy_only=False)]
    n_tot = _i64(tot["n_sum"])[src_sorted.to_numpy(zero_copy_only=False)]
    k_arr = np.zeros(len(srcs), dtype=np.int64)
    nz = n_tot > 0
    k_arr[nz] = (s_tot[nz] + n_tot[nz] - 1) // n_tot[nz]  # ceil(mean)
    k_ref = ray.put((srcs, k_arr))

    def _runs(b: pa.Table):
        """Deterministic per-block segmentation: lexsort by (source, idx),
        split on source change or idx jump.  Returns (order, code, idx,
        starts) — identical in passes B and C because the block is."""
        uniq, _ = ray.get(k_ref)
        code = pc.cast(
            pc.index_in(b["source"], value_set=uniq), pa.int64()
        ).combine_chunks().to_numpy(zero_copy_only=False)
        idx = _i64(b["idx"])
        order = np.lexsort((idx, code))
        c2, i2 = code[order], idx[order]
        newr = np.empty(len(order), dtype=bool)
        if len(order):
            newr[0] = True
            newr[1:] = (c2[1:] != c2[:-1]) | (i2[1:] != i2[:-1] + 1)
        return order, c2, i2, np.flatnonzero(newr)

    def run_summaries(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "src": pa.array([], pa.int64()),
                "start_idx": pa.array([], pa.int64()),
                "run_len": pa.array([], pa.int64()),
                "sum_y": pa.array([], pa.int64()),
                "min_prefix_y": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        _, kv = ray.get(k_ref)
        order, c2, i2, starts = _runs(b)
        x = _i64(b[col])[order]
        y = x - kv[c2]
        p = np.cumsum(y)
        bounds = np.append(starts, len(order))
        # per-run exclusive base so prefix/min are run-local
        base = np.repeat(p[starts] - y[starts], np.diff(bounds))
        local = p - base
        mins = np.minimum.reduceat(local, starts)
        return pa.table(
            {
                "src": pa.array(c2[starts], pa.int64()),
                "start_idx": pa.array(i2[starts], pa.int64()),
                "run_len": pa.array(np.diff(bounds), pa.int64()),
                "sum_y": pa.array(local[bounds[1:] - 1], pa.int64()),
                "min_prefix_y": pa.array(mins, pa.int64()),
            }
        )

    summ = pa.concat_tables(
        list(
            keyed.map_batches(
                run_summaries, batch_format="pyarrow", batch_size=None
            ).iter_batches(batch_format="pyarrow")
        )
    )
    sc = summ["src"].combine_chunks().to_numpy(zero_copy_only=False)
    si = summ["start_idx"].combine_chunks().to_numpy(zero_copy_only=False)
    sl = summ["run_len"].combine_chunks().to_numpy(zero_copy_only=False)
    sy = summ["sum_y"].combine_chunks().to_numpy(zero_copy_only=False)
    sm = summ["min_prefix_y"].combine_chunks().to_numpy(zero_copy_only=False)
    o = np.lexsort((si, sc))
    sc, si, sl, sy, sm = sc[o], si[o], sl[o], sy[o], sm[o]
    n_runs = len(sc)
    base_p = np.zeros(n_runs, dtype=np.int64)
    min_before = np.full(n_runs, np.iinfo(np.int64).max, dtype=np.int64)
    if n_runs:
        new_src = np.empty(n_runs, dtype=bool)
        new_src[0] = True
        new_src[1:] = sc[1:] != sc[:-1]
        bnds = np.append(np.flatnonzero(new_src), n_runs)
        for lo, hi in zip(bnds[:-1], bnds[1:]):
            # dense-grid invariant: a source's runs tile its extent
            assert (si[lo + 1 : hi] == si[lo:hi - 1] + sl[lo:hi - 1]).all()
            cs = np.cumsum(sy[lo:hi])
            base_p[lo + 1 : hi] = cs[:-1]
            mp = np.minimum.accumulate(base_p[lo:hi] + sm[lo:hi])
            min_before[lo + 1 : hi] = mp[:-1]
    # packed (src, start_idx) lookup key; idx can be negative -> offset
    i_off = int(si.min()) if n_runs else 0
    i_mult = int(si.max()) - i_off + 1 if n_runs else 1
    packed = sc * i_mult + (si - i_off)
    fold_ref = ray.put((packed, base_p, min_before, i_mult, i_off))

    def apply(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "bucket_ts": pa.array([], pa.timestamp("us")),
                    col: pa.array([], pa.int64()),
                    "cusum": pa.array([], pa.int64()),
                }
            )
        _, kv = ray.get(k_ref)
        pk, bp, mb, mult, ioff = ray.get(fold_ref)
        order, c2, i2, starts = _runs(b)
        x = _i64(b[col])[order]
        y = x - kv[c2]
        p = np.cumsum(y)
        bounds = np.append(starts, len(order))
        lens = np.diff(bounds)
        base = np.repeat(p[starts] - y[starts], lens)
        local = p - base  # run-local prefix sums
        pos = np.searchsorted(pk, c2[starts] * mult + (i2[starts] - ioff))
        gbase = np.repeat(bp[pos], lens)
        gmin_b = np.repeat(mb[pos], lens)
        gp = gbase + local  # global P per row
        # running min of P within each run (reset at run starts); the loop
        # is over RUNS (<= sources per block), not rows
        m = np.empty_like(gp)
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            m[lo:hi] = np.minimum.accumulate(gp[lo:hi])
        m = np.minimum(m, gmin_b)
        take = pa.array(order, pa.int64())
        return pa.table(
            {
                "source": b["source"].combine_chunks().take(take),
                "bucket_ts": b["bucket_ts"].combine_chunks().take(take),
                col: pa.array(x, pa.int64()),
                "cusum": pa.array(gp - np.minimum(m, 0), pa.int64()),
            }
        )

    return keyed.map_batches(apply, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# sessionization
# ---------------------------------------------------------------------------

def sessionize(
    ds: Dataset,
    *,
    key: str,
    ts: str,
    order_col: str,
    value: str,
    gap_us: int,
    k: int | None = None,
    window_us: int | None = None,
) -> Dataset:
    """Split each key's event stream into sessions at gaps > ``gap_us`` and
    aggregate per session. Events are ordered by (ts, order_col) — the
    tie-break makes the split deterministic under equal timestamps.

    Output: (key, session_id [0-based per key], n_events, start_ts, end_ts,
    sum_value). One hash shuffle on ``key``; one lexsort + reduceat kernel
    per partition; per-task memory O(partition).

    ``window_us`` enables the HOT-KEY defense: events partition by
    (key, ts // window_us), each partition emits its LOCAL maximal
    sessions (count/extent/sum — all associative), and a second shuffle
    by key merges boundary-adjacent local sessions (gap <= gap_us) and
    assigns the per-key ordinals.  A key's windows are time-disjoint, so
    local sessions are disjoint intervals and the merge is the classic
    associative interval fold; the second exchange is O(local sessions),
    never row-proportional.  Works for any window_us (a session spanning
    empty windows still merges — the fold only compares time gaps).
    """
    sch = ds.schema()
    ts_type = dict(zip(sch.names, sch.types))[ts]

    def narrow(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.cast(b[key], pa.int64()),
                "t": pc.cast(b[ts], pa.int64()),
                "o": pc.cast(b[order_col], pa.int64()),
                "v": pc.cast(b[value], pa.int64()),
            }
        )

    empty_out = {
        key: pa.array([], pa.int64()),
        "session_id": pa.array([], pa.int64()),
        "n_events": pa.array([], pa.int64()),
        "start_ts": pa.array([], ts_type),
        "end_ts": pa.array([], ts_type),
        "sum_value": pa.array([], pa.int64()),
    }

    def _ids_and_rows(
        ks: np.ndarray, starts: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Per-key 0-based session ordinal: each session's global position
        minus the position of its key's first session."""
        new_key_s = np.empty(len(starts), dtype=bool)
        new_key_s[0] = True
        new_key_s[1:] = ks[starts][1:] != ks[starts][:-1]
        sess_pos = np.arange(len(starts))
        first_pos = sess_pos[new_key_s]
        return sess_pos - first_pos[np.cumsum(new_key_s) - 1], new_key_s

    def merge(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table(empty_out)
        kk, tt = _i64(t["k"]), _i64(t["t"])
        oo, vv = _i64(t["o"]), _i64(t["v"])
        order = np.lexsort((oo, tt, kk))
        ks, tss, vs = kk[order], tt[order], vv[order]
        new_sess = np.empty(n, dtype=bool)
        new_sess[0] = True
        new_sess[1:] = (ks[1:] != ks[:-1]) | ((tss[1:] - tss[:-1]) > gap_us)
        starts = np.flatnonzero(new_sess)
        ends = np.append(starts[1:], n) - 1
        session_id, _ = _ids_and_rows(ks, starts)
        return pa.table(
            {
                key: pa.array(ks[starts]),
                "session_id": pa.array(session_id, pa.int64()),
                "n_events": pa.array(ends - starts + 1, pa.int64()),
                "start_ts": pa.array(tss[starts]).cast(ts_type),
                "end_ts": pa.array(tss[ends]).cast(ts_type),
                "sum_value": pa.array(
                    np.add.reduceat(vs, starts), pa.int64()
                ),
            }
        )

    narrowed = ds.map_batches(narrow, batch_format="pyarrow")
    if window_us is None:
        return hash_partition_merge(narrowed, "k", merge, k=k)

    # ---- sub-windowed path ----
    def add_w(b: pa.Table) -> pa.Table:
        w = np.floor_divide(_i64(b["t"]), window_us)
        return b.append_column("w", pa.array(w, pa.int64()))

    def local_sessions(t: pa.Table) -> pa.Table:
        """LOCAL maximal sessions of a (key, window) partition — all
        columns associative, so the per-key fold can merge across window
        boundaries.  Same (ts, order) split rule as the global kernel."""
        n = t.num_rows
        if n == 0:
            return pa.table(
                {
                    "k": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "st": pa.array([], pa.int64()),
                    "en": pa.array([], pa.int64()),
                    "sv": pa.array([], pa.int64()),
                }
            )
        kk, tt = _i64(t["k"]), _i64(t["t"])
        oo, vv = _i64(t["o"]), _i64(t["v"])
        order = np.lexsort((oo, tt, kk))
        ks, tss, vs = kk[order], tt[order], vv[order]
        new_sess = np.empty(n, dtype=bool)
        new_sess[0] = True
        new_sess[1:] = (ks[1:] != ks[:-1]) | ((tss[1:] - tss[:-1]) > gap_us)
        starts = np.flatnonzero(new_sess)
        ends = np.append(starts[1:], n) - 1
        return pa.table(
            {
                "k": pa.array(ks[starts]),
                "n_events": pa.array(ends - starts + 1, pa.int64()),
                "st": pa.array(tss[starts]),
                "en": pa.array(tss[ends]),
                "sv": pa.array(np.add.reduceat(vs, starts), pa.int64()),
            }
        )

    def final_merge(t: pa.Table) -> pa.Table:
        """Per-key fold over local sessions (disjoint intervals — a key's
        windows are time-disjoint): merge consecutive locals whose gap is
        <= gap_us, then assign per-key ordinals."""
        n = t.num_rows
        if n == 0:
            return pa.table(empty_out)
        kk = _i64(t["k"])
        st, en = _i64(t["st"]), _i64(t["en"])
        nn, sv = _i64(t["n_events"]), _i64(t["sv"])
        order = np.lexsort((st, kk))
        ks, sts, ens = kk[order], st[order], en[order]
        nns, svs = nn[order], sv[order]
        new_sess = np.empty(n, dtype=bool)
        new_sess[0] = True
        new_sess[1:] = (ks[1:] != ks[:-1]) | ((sts[1:] - ens[:-1]) > gap_us)
        starts = np.flatnonzero(new_sess)
        ends_i = np.append(starts[1:], n) - 1
        session_id, _ = _ids_and_rows(ks, starts)
        return pa.table(
            {
                key: pa.array(ks[starts]),
                "session_id": pa.array(session_id, pa.int64()),
                "n_events": pa.array(np.add.reduceat(nns, starts), pa.int64()),
                "start_ts": pa.array(sts[starts]).cast(ts_type),
                "end_ts": pa.array(ens[ends_i]).cast(ts_type),
                "sum_value": pa.array(np.add.reduceat(svs, starts), pa.int64()),
            }
        )

    locals_ = _kw_partition(
        narrowed.map_batches(add_w, batch_format="pyarrow"),
        local_sessions,
        shuffle_parts(k),
    )
    return hash_partition_merge(locals_, "k", final_merge, k=k)


# ---------------------------------------------------------------------------
# range (interval containment) join
# ---------------------------------------------------------------------------

def range_join(
    points: Dataset,
    intervals: Dataset,
    *,
    key: str,
    ts: str,
    lo: str,
    hi: str,
    attrs: list[str],
    k: int | None = None,
    window_us: int | None = None,
) -> Dataset:
    """For each point row, attach ``attrs`` from the interval row of the
    same ``key`` whose ``[lo, hi]`` (inclusive both ends) contains the
    point's ``ts`` — `p JOIN i ON p.key = i.key AND p.ts BETWEEN i.lo AND
    i.hi`, LEFT semantics (attrs null when uncontained).

    **Partitioning assumption**: intervals are non-overlapping per key
    (e.g. sessions, retention windows, tariff periods), so the candidate
    is unique and the join reduces to the as-of forward fill: the latest
    interval with ``lo <= ts`` is the only one that can contain ``ts``;
    containment is then one vectorized ``hi >= ts`` check. Overlapping
    intervals would need a halo replication scheme instead.

    Scale shape (same as :func:`asof_join`): both sides ride ONE hash
    shuffle on ``key`` as union rows, then a single O(n log n) numpy
    kernel per partition; per-task memory O(partition), driver O(1).

    ``window_us`` enables the same HOT-KEY defense as :func:`asof_join`
    (rows partition by (key, lo-or-ts // window_us)); the carried prefix
    here is each window's latest STARTED interval — its lo, hi and attr
    values ride the per-(key, window) summary rows, so an interval
    spanning many windows (or a point whose interval started long before
    its window) still resolves locally.
    """
    psch = points.schema()
    p_types = dict(zip(psch.names, psch.types))
    p_payload = [c for c in psch.names if c not in (key, ts)]
    isch = intervals.schema()
    i_types = dict(zip(isch.names, isch.types))
    overlap = set(attrs) & set(p_payload)
    if overlap:
        raise ValueError(f"attr/point column collision: {sorted(overlap)}")

    def tag_points(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {
            "k": pc.cast(b[key], pa.int64()),
            "t": pc.cast(b[ts], pa.int64()),
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "hi_": pa.nulls(n, pa.int64()),
        }
        for a in attrs:
            cols[a] = pa.nulls(n, i_types[a])
        for c in p_payload:
            cols[c] = b[c]
        return pa.table(cols)

    def tag_intervals(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {
            "k": pc.cast(b[key], pa.int64()),
            "t": pc.cast(b[lo], pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "hi_": pc.cast(b[hi], pa.int64()),
        }
        for a in attrs:
            cols[a] = b[a]
        for c in p_payload:
            cols[c] = pa.nulls(n, p_types[c])
        return pa.table(cols)

    ts_type = p_types[ts]

    def merge(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table(
                {key: pa.array([], pa.int64()), ts: pa.array([], ts_type)}
                | {a: pa.array([], i_types[a]) for a in attrs}
                | {c: pa.array([], p_types[c]) for c in p_payload}
            )
        kk = _i64(t["k"])
        tt = _i64(t["t"])
        side = _i64(t["side"])
        hi_np = _i64(pc.fill_null(t["hi_"], -1))
        # (key, t, side): interval-before-point at equal t realises the
        # inclusive lower bound (p.ts == i.lo is a containment).
        order = np.lexsort((side, tt, kk))
        ks, tss, ss = kk[order], tt[order], side[order]
        ridx = np.where(ss == 0, np.arange(n), -1)
        np.maximum.accumulate(ridx, out=ridx)
        safe = np.maximum(ridx, 0)
        has = (
            (ridx >= 0)
            & (ks[safe] == ks)
            & (hi_np[order][safe] >= tss)  # inclusive upper bound
        )
        is_p = ss == 1
        pidx = order[is_p]  # original positions of point rows
        iorig = order[safe[is_p]]  # original positions of matched intervals
        has_p = pa.array(has[is_p])
        out = {
            key: pa.array(ks[is_p]),
            ts: pa.array(tss[is_p]).cast(ts_type),
        }
        take_i = pa.array(iorig, pa.int64())
        for a in attrs:
            vals = t[a].combine_chunks().take(take_i)
            out[a] = pc.if_else(has_p, vals, pa.nulls(len(iorig), i_types[a]))
        take_p = pa.array(pidx, pa.int64())
        for c in p_payload:
            out[c] = t[c].combine_chunks().take(take_p)
        return pa.table(out)

    both = points.map_batches(tag_points, batch_format="pyarrow").union(
        intervals.map_batches(tag_intervals, batch_format="pyarrow")
    )
    if window_us is None:
        return hash_partition_merge(both, "k", merge, k=k)

    # ---- sub-windowed path (asof_join's carried prefix, attrs riding) ----
    def add_w(b: pa.Table) -> pa.Table:
        w = np.floor_divide(_i64(b["t"]), window_us)
        return b.append_column("w", pa.array(w, pa.int64()))

    tagged = both.map_batches(add_w, batch_format="pyarrow")

    def summarize(b: pa.Table) -> pa.Table:
        """One row per (key, window): the latest-started interval (by
        (lo, hi)) with its hi and attrs, or a bare marker for point-only
        windows."""
        kk_ = _i64(b["k"])
        ww = _i64(b["w"])
        tt = _i64(b["t"])
        hh = _i64(pc.fill_null(b["hi_"], -1))
        right_m = _i64(b["side"]) == 0
        idx_keep: list[np.ndarray] = []
        marker_k = marker_w = np.empty(0, np.int64)
        if right_m.any():
            ridx = np.flatnonzero(right_m)
            rk, rw = kk_[ridx], ww[ridx]
            rt, rh = tt[ridx], hh[ridx]
            o = np.lexsort((rh, rt, rw, rk))
            last = np.empty(len(o), dtype=bool)
            last[-1] = True
            last[:-1] = (rk[o][1:] != rk[o][:-1]) | (rw[o][1:] != rw[o][:-1])
            idx_keep.append(ridx[o[last]])
        left_m = ~right_m
        if left_m.any():
            lk, lw = kk_[left_m], ww[left_m]
            o = np.lexsort((lw, lk))
            first = np.empty(len(o), dtype=bool)
            first[0] = True
            first[1:] = (lk[o][1:] != lk[o][:-1]) | (lw[o][1:] != lw[o][:-1])
            marker_k, marker_w = lk[o][first], lw[o][first]
        keep = (
            np.concatenate(idx_keep)
            if idx_keep
            else np.empty(0, np.int64)
        )
        take = pa.array(keep, pa.int64())
        nm = len(marker_k)
        cols = {
            "k": pa.array(np.concatenate([kk_[keep], marker_k])),
            "w": pa.array(np.concatenate([ww[keep], marker_w])),
            "t": pa.array(
                np.concatenate([tt[keep], np.zeros(nm, np.int64)])
            ),
            "hi_": pa.array(
                np.concatenate([hh[keep], np.zeros(nm, np.int64)])
            ),
            "isr": pa.array(
                np.concatenate(
                    [np.ones(len(keep), np.int8), np.zeros(nm, np.int8)]
                )
            ),
        }
        for a in attrs:
            av = b[a].combine_chunks().take(take)
            cols[a] = pa.concat_arrays(
                [av.combine_chunks() if isinstance(av, pa.ChunkedArray)
                 else av, pa.nulls(nm, i_types[a])]
            )
        return pa.table(cols)

    def carry_kernel(t_: pa.Table) -> pa.Table:
        empty = {
            "k": pa.array([], pa.int64()),
            "w": pa.array([], pa.int64()),
            "t": pa.array([], pa.int64()),
            "hi_": pa.array([], pa.int64()),
        } | {a: pa.array([], i_types[a]) for a in attrs}
        if t_.num_rows == 0:
            return pa.table(empty)
        kk_ = _i64(t_["k"])
        ww = _i64(t_["w"])
        tt = _i64(t_["t"])
        hh = _i64(t_["hi_"])
        ir = _i64(t_["isr"])
        order = np.lexsort((hh, tt, ir, ww, kk_))
        ks, ws, irs = kk_[order], ww[order], ir[order]
        n = len(order)
        ridx = np.where(irs == 1, np.arange(n), -1)
        np.maximum.accumulate(ridx, out=ridx)
        new_g = np.empty(n, dtype=bool)
        new_g[0] = True
        new_g[1:] = (ks[1:] != ks[:-1]) | (ws[1:] != ws[:-1])
        starts = np.flatnonzero(new_g)
        valid = starts > 0
        cand = np.where(valid, ridx[np.maximum(starts - 1, 0)], -1)
        valid &= (cand >= 0) & (ks[np.maximum(cand, 0)] == ks[starts])
        sel = starts[valid]
        c_orig = order[cand[valid]]  # original row of the carried interval
        take_c = pa.array(c_orig, pa.int64())
        out = {
            "k": pa.array(ks[sel]),
            "w": pa.array(ws[sel]),
            "t": pa.array(tt[order][cand[valid]]),
            "hi_": pa.array(hh[order][cand[valid]]),
        }
        for a in attrs:
            out[a] = t_[a].combine_chunks().take(take_c)
        return pa.table(out)

    carries = hash_partition_merge(
        tagged.map_batches(
            # big batches: the combiner compresses to one row per
            # (key, window) per CALL, so batch size bounds its output
            summarize, batch_format="pyarrow", batch_size=256 * 1024,
        ),
        "k",
        carry_kernel,
        k=k,
    )

    def tag_carry(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {
            "k": b["k"],
            "t": b["t"],
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "hi_": b["hi_"],
        }
        for a in attrs:
            cols[a] = b[a]
        for c in p_payload:
            cols[c] = pa.nulls(n, p_types[c])
        cols["w"] = b["w"]
        return pa.table(cols)

    full = tagged.union(carries.map_batches(tag_carry, batch_format="pyarrow"))
    return _kw_partition(full, merge, shuffle_parts(k))


def _linrec_scan_c(x, a, lam, carry) -> np.ndarray:
    """Complex serial recurrence ``s_i = a*x_i + lam*s_{i-1}`` (s_{-1} =
    carry) — _ewma_scan's renormalized chunked kernel over complex128
    (the eigen-component form of a 2x2 affine scan).  Chunks are sized so
    ``|lam|^-j`` cannot overflow float64; one numpy pass per chunk."""

    out = np.empty(len(x), dtype=np.complex128)
    if not len(x):
        return out
    mod = abs(lam)
    if mod <= 0.0:
        out[:] = a * x
        return out
    chunk = max(
        1, min(1024, int(600.0 / max(1e-12, -np.log(min(mod, 1.0 - 1e-15)))))
    )
    c = complex(carry)
    for start in range(0, len(x), chunk):
        seg = x[start : start + chunk]
        t = np.arange(len(seg), dtype=np.float64)
        lpow = lam**t
        s = lpow * np.cumsum(a * seg / lpow) + lpow * lam * c
        out[start : start + len(seg)] = s
        c = s[-1]
    return out


def _holt_basis(alpha: float, beta: float):
    """Eigendecompose Holt's transition matrix.  The joint (level, trend)
    update
        l_i = alpha*x_i + d*(l_{i-1} + b_{i-1})          (d = 1-alpha)
        b_i = beta*(l_i - l_{i-1}) + (1-beta)*b_{i-1}
    is the affine scan s_i = M s_{i-1} + x_i*(alpha, alpha*beta) with
    M = [[d, d], [-alpha*beta, beta*d + 1 - beta]]; det(M) = 1-alpha.  In
    M's eigenbasis the scan decouples into two INDEPENDENT scalar linear
    recurrences u_k,i = gain_k*x_i + lam_k*u_k,{i-1} (lam may be a complex
    conjugate pair — |lam| = sqrt(1-alpha) there), each of which the
    grid_ewma machinery already distributes.  Returns (lam[2], gain[2] =
    P^-1 @ (alpha, alpha*beta), P) as complex128."""
    d = 1.0 - alpha
    M = np.array(
        [[d, d], [-alpha * beta, beta * d + 1.0 - beta]], dtype=np.complex128
    )
    lam, P = np.linalg.eig(M)
    if np.linalg.cond(P) > 1e8:
        raise ValueError(
            "holt transition matrix is (near-)defective for "
            f"alpha={alpha}, beta={beta}; perturb beta slightly"
        )
    gain = np.linalg.solve(P, np.array([alpha, alpha * beta], np.complex128))
    return lam, gain, P


def grid_holt(
    grid: Dataset,
    tier: str,
    col: str,
    *,
    alpha: float,
    beta: float,
    t0_us: int,
    window_buckets: int = 4096,
) -> Dataset:
    """Holt linear-trend (double exponential) smoothing of ``col`` over a
    DENSE per-source grid — zero-initialized level+trend recurrence, the
    trend-aware upgrade of grid_ewma every forecasting/alerting baseline
    uses (holt_winters without seasonality).  Output: (source, bucket_ts,
    <col>, level, trend) — floats; exactness vs the serial recurrence is
    to rounding (the eigenbasis reassociates float ops), pinned by pytest
    at rtol 1e-8.

    Scale shape — grid_ewma's distributed prefix scan run over a PAIR of
    eigen-decoupled scalar recurrences (see _holt_basis): one narrow pass
    emits batch-summable per-(source, window) complex partials
    ``A_k,w = gain_k * sum lam_k^(nominal_end - idx_j) * x_j`` (four float
    columns), the driver scans ``S_k,w = A_k,w + lam_k^wb * S_k,{w-1}``
    over O(sources x windows x 2) floats and broadcasts exclusive
    carries, and each (source, window) group runs the two seeded in-window
    scans and recombines level/trend through P.  Same exchange plan and
    driver bound as grid_ewma; the matrix never appears at scale — only
    its two eigenvalues do."""
    import ray

    step = TIERS[tier] * 1_000_000
    lam, gain, P = _holt_basis(alpha, beta)

    def add_win(b: pa.Table) -> pa.Table:
        return _add_windows(b, [col], t0_us, step, window_buckets, 0)

    keyed = grid.map_batches(add_win, batch_format="pyarrow").materialize()

    def window_partials(b: pa.Table) -> pa.Table:
        idx = _i64(b["idx"])
        win = _i64(b["window_id"])
        x = _i64(b[col]).astype(np.float64)
        e = ((win + 1) * window_buckets - 1 - idx).astype(np.float64)
        cols = {"source": b["source"], "window_id": b["window_id"]}
        for k in range(2):
            part = gain[k] * (lam[k] ** e) * x
            cols[f"ar{k}"] = pa.array(part.real)
            cols[f"ai{k}"] = pa.array(part.imag)
        t = pa.table(cols)
        g = t.group_by(["source", "window_id"], use_threads=False).aggregate(
            [(c, "sum") for c in ("ar0", "ai0", "ar1", "ai1")]
        )
        return g.rename_columns(
            ["source", "window_id", "ar0", "ai0", "ar1", "ai1"]
        )

    partials = keyed.map_batches(window_partials, batch_format="pyarrow")
    agg = (
        pa.concat_tables(list(partials.iter_batches(batch_format="pyarrow")))
        .group_by(["source", "window_id"])
        .aggregate([(c, "sum") for c in ("ar0", "ai0", "ar1", "ai1")])
    )
    src_d = pc.dictionary_encode(agg["source"].combine_chunks())
    g_codes = src_d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    g_uniq = src_d.dictionary
    g_win = agg["window_id"].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.lexsort((g_win, g_codes))
    g_codes, g_win = g_codes[order], g_win[order]
    a_vals = [
        (
            agg["ar%d_sum" % k].combine_chunks().to_numpy(zero_copy_only=False)
            + 1j
            * agg["ai%d_sum" % k]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )[order]
        for k in range(2)
    ]
    n_g = len(g_codes)
    carries = np.zeros((2, n_g), dtype=np.complex128)
    if n_g:
        new_src = np.empty(n_g, dtype=bool)
        new_src[0] = True
        new_src[1:] = g_codes[1:] != g_codes[:-1]
        starts = np.flatnonzero(new_src)
        bounds = np.append(starts, n_g)
        for k in range(2):
            dd = lam[k] ** window_buckets
            for lo, hi in zip(bounds[:-1], bounds[1:]):
                s_scan = _linrec_scan_c(a_vals[k][lo:hi], 1.0, dd, 0.0)
                carries[k, lo + 1 : hi] = s_scan[:-1]
    w_off = int(g_win.min()) if n_g else 0
    key_mult = int(g_win.max()) - w_off + 1 if n_g else 1
    packed = g_codes * key_mult + (g_win - w_off)
    bases_ref = ray.put((g_uniq, packed, carries, key_mult, w_off))

    def holt_group(g: pa.Table) -> pa.Table:
        uniq, pk, cv, mult, woff = ray.get(bases_ref)
        s = g["source"][0].as_py()
        w = g["window_id"][0].as_py()
        gcode = uniq.index(pa.scalar(s)).as_py()
        at = np.searchsorted(pk, gcode * mult + (int(w) - woff))
        idx = _i64(g["idx"])
        order = np.argsort(idx, kind="stable")
        take = pa.array(order, pa.int64())
        x = _i64(g[col])[order].astype(np.float64)
        u0 = _linrec_scan_c(x, gain[0], lam[0], cv[0, at])
        u1 = _linrec_scan_c(x, gain[1], lam[1], cv[1, at])
        level = (P[0, 0] * u0 + P[0, 1] * u1).real
        trend = (P[1, 0] * u0 + P[1, 1] * u1).real
        return pa.table(
            {
                "source": g["source"].combine_chunks().take(take),
                "bucket_ts": g["bucket_ts"].combine_chunks().take(take),
                col: pa.array(x.astype(np.int64), pa.int64()),
                "level": pa.array(level),
                "trend": pa.array(trend),
            }
        )

    return keyed.groupby(["source", "window_id"]).map_groups(
        holt_group, batch_format="pyarrow"
    )
