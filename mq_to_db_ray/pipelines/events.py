"""Adapter: the driver's ``events`` table as an ingest stream.

Each event row is treated as a message (envelope analog): source =
``event_type``, event time = ``ts`` (already a timestamp, so ``seq`` =
whole seconds since the events epoch 2024-01-01), and the rolled-up metric
is ``floor(value)`` (integer, so every aggregate is bit-exactly reproducible
by the DuckDB oracle — float SUM order-dependence can't bite).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data import Dataset

from ..stages.gapfill import gap_fill
from ..stages.rollup import cascade, rollup

# 2024-01-01T00:00:00Z — minute/hour/day aligned, so buckets == date_trunc.
EVENTS_T0_US = 1704067200 * 1_000_000

# Hot-key sub-window for the temporal operators (stages/temporal.py
# window_us): one day.  A user/source with a corpus-sized history spreads
# over (key, day) tasks instead of landing whole in one; at this sf each
# key spans many windows, so the carried-prefix / session-fold paths are
# exercised by the driver oracles, not just unit tests.
TEMPORAL_WINDOW_US = 86_400_000_000


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
        if tier == "1h":
            out = h1
        else:
            d1 = cascade(h1, "1h", "1d", t0_us=EVENTS_T0_US)
            out = d1 if tier == "1d" else cascade(
                d1, "1d", "1w", t0_us=EVENTS_T0_US
            )
    return out.drop_columns(["filled"])


def events_gapfill(sf_dir: str, tier: str = "1m") -> Dataset:
    m1 = rollup(events_assigned(sf_dir), tier, t0_us=EVENTS_T0_US)
    return gap_fill(m1, tier)


def _events_typed(sf_dir: str, event_type: str, cols: list[str]) -> Dataset:
    # read fan-out matched to the data (ds.stats showed the default 64-way
    # SplitBlocks costing more in task launches than the whole compute on
    # small epochs; at web scale _adaptive_k saturates to full width)
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=list(dict.fromkeys(cols + ["event_type"])),
        override_num_blocks=_adaptive_k(sf_dir),
    )
    return ds.filter(
        expr=f'event_type == "{event_type}"'
    ).select_columns(cols)


@lru_cache(maxsize=64)
def _adaptive_k(sf_dir: str) -> int:
    """Shuffle width for the temporal operators, scaled to the events
    table's footer row count (stages/shuffle.adaptive_width).  Memoized:
    several queries consult it twice per build (read fan-out + shuffle
    width), and each call re-opened the parquet footer."""
    from ..stages.shuffle import adaptive_width

    return adaptive_width(f"{sf_dir}/events.parquet", 50_000)


def _floor_value(b: pa.Table, name: str) -> pa.Table:
    vals = b["value"].combine_chunks().to_numpy(zero_copy_only=False)
    return b.drop_columns(["value"]).append_column(
        name, pa.array(np.floor(vals).astype(np.int64))
    )


def events_asof_join(sf_dir: str) -> Dataset:
    """Per click, the latest purchase value at-or-before it for the same
    user (timeseries as-of join; oracle = DuckDB ASOF LEFT JOIN)."""
    from ..stages.temporal import asof_join

    left = _events_typed(sf_dir, "click", ["event_id", "user_id", "ts"])
    right = _events_typed(sf_dir, "purchase", ["user_id", "ts", "value"]).map_batches(
        lambda b: _floor_value(b, "v"), batch_format="pyarrow"
    )
    return asof_join(
        left, right, key="user_id", ts="ts", value="v", k=_adaptive_k(sf_dir),
        window_us=TEMPORAL_WINDOW_US,
    )


def events_skew_asof(
    sf_dir: str, window_us: int = 6 * 3600 * 1_000_000
) -> Dataset:
    """Zipf-skew stress twin of :func:`events_asof_join` (VERDICT r4 #6):
    user ids are remapped deterministically so ONE synthetic user (uid 0)
    owns every even-``event_id`` row — ~half of both join sides — and the
    as-of runs with 6h sub-windows, so the hot key's 30-day history spreads
    over ~120 (key, window) tasks through the halo/carried-prefix path
    instead of funnelling into one.  The remap is a pure SQL expression
    (``CASE WHEN event_id % 2 = 0 THEN 0 ELSE user_id END``), so the DuckDB
    oracle applies it inline and the driver's rows+schema+hash gate covers
    the sub-windowed machinery end to end.  Output schema matches
    ``events_asof_join``."""
    from ..stages.temporal import asof_join

    left = _events_typed(
        sf_dir, "click", ["event_id", "user_id", "ts"]
    ).map_batches(_skew_uid, batch_format="pyarrow").select_columns(
        ["event_id", "user_id", "ts"]
    )
    right = _events_typed(
        sf_dir, "purchase", ["event_id", "user_id", "ts", "value"]
    ).map_batches(
        lambda b: _floor_value(_skew_uid(b), "v").drop_columns(["event_id"]),
        batch_format="pyarrow",
    )
    return asof_join(
        left, right, key="user_id", ts="ts", value="v", k=_adaptive_k(sf_dir),
        window_us=window_us,
    )


def events_rolling_1m(sf_dir: str, w: int = 5) -> Dataset:
    """Trailing-5-minute rolling sums of count / sum_n_tok over the dense
    gap-filled per-source 1m grid (SQL window-function oracle)."""
    from ..stages.temporal import rolling_sum

    grid = events_gapfill(sf_dir, "1m")
    return rolling_sum(
        grid, "1m", w, ["count", "sum_n_tok"], t0_us=EVENTS_T0_US
    )


def events_sessions(sf_dir: str, gap_s: int = 6 * 3600) -> Dataset:
    """Gap-based sessions per user over ALL events (6h inactivity closes a
    session); per-session (n_events, start_ts, end_ts, sum_value)."""
    from ..stages.temporal import sessionize

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    ).map_batches(lambda b: _floor_value(b, "v"), batch_format="pyarrow")
    return sessionize(
        ds,
        key="user_id",
        ts="ts",
        order_col="event_id",
        value="v",
        gap_us=gap_s * 1_000_000,
        k=_adaptive_k(sf_dir),
        window_us=TEMPORAL_WINDOW_US,
    )


def events_session_join(sf_dir: str, gap_s: int = 6 * 3600) -> Dataset:
    """Range join: tag every event with the session (from
    :func:`events_sessions`) whose [start_ts, end_ts] interval contains
    it — sessions are non-overlapping per user, the contract
    stages/temporal.range_join relies on. Output (event_id, user_id,
    session_id); oracle = sessions CTE + BETWEEN join."""
    from ..stages.temporal import range_join

    points = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts"],
        override_num_blocks=_adaptive_k(sf_dir),
    )
    # materialized: the windowed range join consumes its input twice, and
    # this side's upstream is the whole sessionize chain; sessions are
    # per-key summaries — the sanctioned materialize
    intervals = events_sessions(sf_dir, gap_s).map_batches(
        lambda b: b.select(["user_id", "session_id", "start_ts", "end_ts"]),
        batch_format="pyarrow",
    ).materialize()
    joined = range_join(
        points,
        intervals,
        key="user_id",
        ts="ts",
        lo="start_ts",
        hi="end_ts",
        attrs=["session_id"],
        k=_adaptive_k(sf_dir),
        window_us=TEMPORAL_WINDOW_US,
    )
    return joined.map_batches(
        lambda b: b.select(["event_id", "user_id", "session_id"]),
        batch_format="pyarrow",
    )


def _skew_uid(b: pa.Table) -> pa.Table:
    """E13b's deterministic Zipf remap (shared by the skew twins): uid 0
    absorbs every even-event_id row; pure SQL expression (`CASE WHEN
    event_id % 2 = 0 THEN 0 ELSE user_id END`) so oracles apply it inline."""
    uid = pc.if_else(
        pc.equal(pc.bit_wise_and(b["event_id"], 1), 0),
        pa.scalar(0, pa.int64()),
        b["user_id"],
    )
    return b.drop_columns(["user_id"]).append_column("user_id", uid)


def events_skew_sessions(
    sf_dir: str, gap_s: int = 6 * 3600,
    window_us: int = 6 * 3600 * 1_000_000,
) -> Dataset:
    """E189: Zipf-skew sessionize stress twin (VERDICT r4 #6, E13b's remap)
    — gap sessions over the skewed stream where uid 0 owns ~half of all
    events, run with 6h sub-windows SMALLER than the hot user's session
    extents, so the per-window local sessions MUST merge across window
    boundaries through the associative interval fold (the machinery a
    uniform corpus never stresses: the hot key emits local sessions in
    ~120 windows that fold into a handful of giant sessions).  Oracle =
    the events_sessions islands CTE with the remap applied inline; output
    schema matches ``events_sessions``."""
    from ..stages.temporal import sessionize

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    ).map_batches(
        lambda b: _floor_value(_skew_uid(b), "v"), batch_format="pyarrow"
    )
    return sessionize(
        ds, key="user_id", ts="ts", order_col="event_id", value="v",
        gap_us=gap_s * 1_000_000, k=_adaptive_k(sf_dir), window_us=window_us,
    )


def events_skew_session_join(
    sf_dir: str, gap_s: int = 6 * 3600,
    window_us: int = 6 * 3600 * 1_000_000,
) -> Dataset:
    """E190: Zipf-skew range-join stress twin (VERDICT r4 #6) — tag every
    skew-remapped event with its containing session from
    :func:`events_skew_sessions`.  The hot key's giant sessions span MANY
    6h windows while its points land in all of them, so the windowed
    range join's carried latest-started-interval prefix is exercised for
    real (every window of uid 0 inherits an interval that started in an
    earlier window).  Oracle = sessions CTE + BETWEEN join with the remap
    inline; output (event_id, user_id, session_id)."""
    from ..stages.temporal import range_join

    points = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts"],
        override_num_blocks=_adaptive_k(sf_dir),
    ).map_batches(_skew_uid, batch_format="pyarrow")
    intervals = events_skew_sessions(sf_dir, gap_s, window_us).map_batches(
        lambda b: b.select(["user_id", "session_id", "start_ts", "end_ts"]),
        batch_format="pyarrow",
    ).materialize()
    joined = range_join(
        points, intervals, key="user_id", ts="ts", lo="start_ts",
        hi="end_ts", attrs=["session_id"], k=_adaptive_k(sf_dir),
        window_us=window_us,
    )
    return joined.map_batches(
        lambda b: b.select(["event_id", "user_id", "session_id"]),
        batch_format="pyarrow",
    )


def events_ohlc_1m(sf_dir: str) -> Dataset:
    """Per (event_type, minute) candlestick over floor(value): open/close
    by (ts, event_id) order, high/low extremes — the classic financial
    downsample whose open/close half plain groupby.aggregate can't express
    (needs an ORDER).  Combiner-first: stages/rollup.ohlc_rollup shuffles
    one partial row per (source, bucket) per batch.  Oracle = row_number
    window over (ts, event_id)."""
    from ..stages.rollup import ohlc_rollup

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "ts", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def narrow(b: pa.Table) -> pa.Table:
        vals = b["value"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": b["event_type"],
                "ts_us": b["ts"].cast(pa.int64()),
                "order_id": b["event_id"],
                "v": pa.array(np.floor(vals).astype(np.int64)),
            }
        )

    return ohlc_rollup(
        ds.map_batches(narrow, batch_format="pyarrow"),
        "1m",
        t0_us=EVENTS_T0_US,
        k=_adaptive_k(sf_dir),
    )


def events_top2_per_user(sf_dir: str) -> Dataset:
    """Top-2 purchases per user by (floor(value) DESC, event_id ASC) —
    grouped top-k with a per-batch combiner so only <= 2 candidate rows per
    (user, batch) ever shuffle.  Output (user_id, value_i, event_id, rank);
    oracle = row_number window."""
    from ..stages.shuffle import grouped_topk

    ds = _events_typed(
        sf_dir, "purchase", ["user_id", "event_id", "value"]
    ).map_batches(lambda b: _floor_value(b, "value_i"), batch_format="pyarrow")
    return grouped_topk(
        ds,
        key="user_id",
        value="value_i",
        order_id="event_id",
        kk=2,
        k=_adaptive_k(sf_dir),
    )


def events_delta_1m(sf_dir: str) -> Dataset:
    """Finite difference (PromQL-style delta) of the per-minute event count
    over the dense gap-filled grid: delta_count = count - lag(count), NULL
    on each source's first bucket.  Windowed like rolling_sum with a 1-row
    halo (stages/temporal.grid_lag), so a source's full history never has
    to fit one task."""
    from ..stages.temporal import grid_lag

    grid = events_gapfill(sf_dir, "1m")
    lagged = grid_lag(grid, "1m", ["count"], t0_us=EVENTS_T0_US)

    def delta(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["source"],
                "bucket_ts": b["bucket_ts"],
                "count": b["count"],
                "delta_count": pc.subtract(b["count"], b["lag_count"]),
            }
        )

    return lagged.map_batches(delta, batch_format="pyarrow")


def events_locf_1m(sf_dir: str) -> Dataset:
    """LOCF (last-observation-carried-forward) interpolation over the dense
    gap-filled 1m grid: every bucket carries the most recent REAL bucket's
    sum_n_tok for its source — pure composition: the E13 as-of kernel with
    the grid as the left side and the unfilled rollup as the right side.
    The int64 join key is the source's rank in a broadcast sorted source
    list (EXACT — sources are a tiny-cardinality column, so a 64-bit-hash
    identity would risk silently merging two series on a collision for no
    gain).  Output (source, bucket_ts, count, locf_sum); oracle =
    gap-fill CTE ASOF LEFT JOIN the rollup CTE."""
    from ..stages.temporal import asof_join

    # one rollup pass feeds both sides; rolled points are sources x buckets
    # rows (MBs even at 10^12-sequence scale), the sanctioned materialize
    m1 = rollup(events_assigned(sf_dir), "1m", t0_us=EVENTS_T0_US).materialize()
    srcs = pa.array(sorted(m1.unique("source")), pa.string())

    def code(b: pa.Table, keep: list[str]) -> pa.Table:
        c = pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
        return b.append_column("src_c", c).select(keep)

    # materialized: the windowed as-of consumes its input twice (summary
    # pass + main shuffle), and this side's upstream contains the gap_fill
    # shuffle; the grid is rolled points — the sanctioned materialize
    grid = gap_fill(m1, "1m").map_batches(
        lambda b: code(b, ["source", "bucket_ts", "count", "src_c"]),
        batch_format="pyarrow",
    ).materialize()
    real = m1.map_batches(
        lambda b: code(b, ["src_c", "bucket_ts", "sum_n_tok"]),
        batch_format="pyarrow",
    )
    joined = asof_join(
        grid,
        real,
        key="src_c",
        ts="bucket_ts",
        value="sum_n_tok",
        out_value="locf_sum",
        k=_adaptive_k(sf_dir),
        window_us=TEMPORAL_WINDOW_US,
    )
    return joined.map_batches(
        lambda b: b.select(["source", "bucket_ts", "count", "locf_sum"]),
        batch_format="pyarrow",
    )


def events_cumsum_1m(sf_dir: str) -> Dataset:
    """Running totals over the dense per-source 1m grid (count and
    sum_n_tok so far) — the distributed ordered prefix scan
    (stages/temporal.grid_cumsum): per-window sums fold on the driver at
    O(sources x windows), bases broadcast, groups cumsum locally."""
    from ..stages.temporal import grid_cumsum

    grid = events_gapfill(sf_dir, "1m")
    return grid_cumsum(
        grid, "1m", ["count", "sum_n_tok"], t0_us=EVENTS_T0_US
    )


def _disc_quantile_runs(
    shs: np.ndarray, bs: np.ndarray, cs: np.ndarray, qs: tuple[int, ...]
) -> tuple[np.ndarray, np.ndarray, dict[int, np.ndarray]]:
    """Per-(source, bucket)-run discrete quantiles over rows already
    lexsorted by (source-code, bucket, value-axis) with counts ``cs``:
    returns (run starts, run totals, {q_permille: index of the first row
    whose within-run cumulative count >= ceil(q*n)}) — quantile_disc rank
    semantics, shared by the exact (E22) and DDSketch (E33) rollups."""
    newg = np.empty(len(shs), dtype=bool)
    newg[0] = True
    newg[1:] = (shs[1:] != shs[:-1]) | (bs[1:] != bs[:-1])
    starts = np.flatnonzero(newg)
    gid = np.cumsum(newg) - 1
    cum = np.cumsum(cs)
    base = np.concatenate(([0], cum[starts[1:] - 1]))
    cumw = cum - base[gid]                       # within-group cumulative
    totals = np.add.reduceat(cs, starts)
    n = len(shs)
    idx = np.arange(n)
    firsts = {}
    for q in qs:
        thr = (totals * q + 999) // 1000
        flag = cumw >= thr[gid]
        cand = np.where(flag, idx, n)
        firsts[q] = np.minimum.reduceat(cand, starts)
    return starts, totals, firsts


def events_quantiles_1m(sf_dir: str) -> Dataset:
    """EXACT p50/p95 of floor(value) per (event_type, minute) — the
    latency-percentile rollup of an observability stack, via the
    length_quantiles mergeable-histogram pattern applied per bucket:
    integer values mean each batch pre-aggregates to a
    (source, bucket, value) histogram, ONLY histograms shuffle (hashed on
    bucket_id, salt axis = time), and the per-partition merge computes
    every group's quantiles with one lexsort + reduceat — no per-group
    Python loop.  ``quantile_disc`` rank semantics (smallest value whose
    cumulative count >= ceil(q*n)) so the oracle matches bit-exactly.
    Output (source, bucket_ts, count, p50, p95)."""
    from ..stages.shuffle import hash_partition_merge

    tier_us = 60 * 1_000_000

    def partial(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        bucket = np.floor_divide(ts_us - EVENTS_T0_US, tier_us)
        vals = b["value"].combine_chunks().to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "source": b["event_type"],
                "bucket_id": pa.array(bucket, pa.int64()),
                "v": pa.array(np.floor(vals).astype(np.int64)),
            }
        )
        return t.group_by(["source", "bucket_id", "v"], use_threads=False).aggregate(
            [("v", "count")]
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "bucket_ts": pa.array([], pa.timestamp("us")),
                    "count": pa.array([], pa.int64()),
                    "p50": pa.array([], pa.int64()),
                    "p95": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["source", "bucket_id", "v"], use_threads=False).aggregate(
            [("v_count", "sum")]
        )
        src = g["source"].combine_chunks()
        # group identity = dictionary CODES of the source string (exact —
        # a 64-bit hash collision between two sources would silently merge
        # their series); hashes are only ever shuffle keys, never identity
        sh = (
            pc.dictionary_encode(src)
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        b = g["bucket_id"].combine_chunks().to_numpy(zero_copy_only=False)
        v = g["v"].combine_chunks().to_numpy(zero_copy_only=False)
        cnt = g["v_count_sum"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((v, b, sh))
        shs, bs, vs, cs = sh[order], b[order], v[order], cnt[order]
        starts, totals, firsts = _disc_quantile_runs(
            shs, bs, cs, (500, 950)
        )
        out = {name: vs[firsts[q]] for name, q in (("p50", 500), ("p95", 950))}
        take = pa.array(order[starts], pa.int64())
        return pa.table(
            {
                "source": src.take(take),
                "bucket_ts": pa.array(
                    bs[starts] * tier_us + EVENTS_T0_US, pa.int64()
                ).cast(pa.timestamp("us")),
                "count": pa.array(totals),
                "p50": pa.array(out["p50"], pa.int64()),
                "p95": pa.array(out["p95"], pa.int64()),
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )
    partials = ds.map_batches(partial, batch_format="pyarrow")
    return hash_partition_merge(
        partials, "bucket_id", merge, k=_adaptive_k(sf_dir)
    )


def events_distinct_users_1m(sf_dir: str) -> Dataset:
    """EXACT ``count(DISTINCT user_id)`` per (event_type, minute) — the
    cardinality rollup of an observability stack (unique visitors per
    bucket).  COUNT DISTINCT doesn't decompose like sum/min/max, so the
    combiner DEDUPES instead of aggregating: each batch reduces to its
    distinct (source, bucket, user) triples (one Arrow group_by), ONLY
    distinct triples shuffle (hashed on bucket_id — the salt axis is
    time, so a hot source spreads), and the per-partition merge dedupes
    across batches and counts per (source, bucket) with one lexsort — no
    per-group python.  Exchange bound: the number of TRUE distinct
    triples, the information-theoretic floor for an exact answer; the
    HLL variant below is the fixed-size-exchange path for when even that
    is too much.  Output (source, bucket_ts, n_users)."""
    from ..stages.shuffle import hash_partition_merge

    tier_us = 60 * 1_000_000

    def partial(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        bucket = np.floor_divide(ts_us - EVENTS_T0_US, tier_us)
        t = pa.table(
            {
                "source": b["event_type"],
                "bucket_id": pa.array(bucket, pa.int64()),
                "user_id": pc.cast(b["user_id"], pa.int64()),
            }
        )
        return t.group_by(
            ["source", "bucket_id", "user_id"], use_threads=False
        ).aggregate([])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "bucket_ts": pa.array([], pa.timestamp("us")),
                    "n_users": pa.array([], pa.int64()),
                }
            )
        src = t["source"].combine_chunks()
        codes = (
            pc.dictionary_encode(src)
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        b = t["bucket_id"].combine_chunks().to_numpy(zero_copy_only=False)
        u = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((u, b, codes))
        cs, bs, us = codes[order], b[order], u[order]
        n = len(order)
        # distinct (source, bucket, user) across batches
        dis = np.empty(n, dtype=bool)
        dis[0] = True
        dis[1:] = (cs[1:] != cs[:-1]) | (bs[1:] != bs[:-1]) | (us[1:] != us[:-1])
        # group boundaries at (source, bucket) level
        newg = np.empty(n, dtype=bool)
        newg[0] = True
        newg[1:] = (cs[1:] != cs[:-1]) | (bs[1:] != bs[:-1])
        starts = np.flatnonzero(newg)
        n_users = np.add.reduceat(dis.astype(np.int64), starts)
        take = pa.array(order[starts], pa.int64())
        return pa.table(
            {
                "source": src.take(take),
                "bucket_ts": pa.array(
                    bs[starts] * tier_us + EVENTS_T0_US, pa.int64()
                ).cast(pa.timestamp("us")),
                "n_users": pa.array(n_users, pa.int64()),
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )
    partials = ds.map_batches(partial, batch_format="pyarrow")
    return hash_partition_merge(
        partials, "bucket_id", merge, k=_adaptive_k(sf_dir)
    )


def events_distinct_users_hll_1m(sf_dir: str, p: int = 12) -> Dataset:
    """APPROXIMATE distinct users per (event_type, minute) via
    HyperLogLog — the 100 TB path of the E23 pair: the exact combiner's
    exchange is bounded by true distinct triples (still corpus-sized for
    high-cardinality ids), while HLL state is capped at 2**p registers
    per (source, bucket) regardless of cardinality, and registers merge
    by max (associative, any combine tree).  The representation is
    SPARSE end to end — (source, bucket, register, max-rank) rows for
    hit registers only, so no task ever allocates a dense (groups x m)
    matrix — and the per-batch combiner collapses rows to distinct
    registers, so the exchange shrinks as rows-per-bucket grows (the
    regime HLL exists for).  p=12 -> ~1.6% typical error (error-bound
    pytest).  Output (source, bucket_ts, n_users_est)."""
    from ..functions.hll import hll_estimate_sparse, hll_ranks
    from ..stages.shuffle import hash_partition_merge

    tier_us = 60 * 1_000_000

    def partial(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        bucket = np.floor_divide(ts_us - EVENTS_T0_US, tier_us)
        src = b["event_type"].combine_chunks()
        codes = (
            pc.dictionary_encode(src)
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        users = pc.cast(b["user_id"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        reg, rank = hll_ranks(users, p=p)
        # max rank per (source, bucket, register): lexsort + last-of-run
        order = np.lexsort((rank, reg, bucket, codes))
        cs, bs, rs = codes[order], bucket[order], reg[order]
        last = np.empty(len(order), dtype=bool)
        last[-1] = True
        last[:-1] = (cs[1:] != cs[:-1]) | (bs[1:] != bs[:-1]) | (rs[1:] != rs[:-1])
        take = pa.array(order[last], pa.int64())
        return pa.table(
            {
                "source": src.take(take),
                "bucket_id": pa.array(bs[last], pa.int64()),
                "reg": pa.array(rs[last], pa.int64()),
                "rank": pa.array(rank[order][last], pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "bucket_ts": pa.array([], pa.timestamp("us")),
                    "n_users_est": pa.array([], pa.int64()),
                }
            )
        src = t["source"].combine_chunks()
        codes = (
            pc.dictionary_encode(src)
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        b = t["bucket_id"].combine_chunks().to_numpy(zero_copy_only=False)
        reg = t["reg"].combine_chunks().to_numpy(zero_copy_only=False)
        rank = t["rank"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((rank, reg, b, codes))
        cs, bs, rs, ks = codes[order], b[order], reg[order], rank[order]
        n = len(order)
        # keep the max rank per (source, bucket, register) across batches
        last = np.empty(n, dtype=bool)
        last[-1] = True
        last[:-1] = (cs[1:] != cs[:-1]) | (bs[1:] != bs[:-1]) | (rs[1:] != rs[:-1])
        cs, bs, ks = cs[last], bs[last], ks[last]
        src_idx = order[last]
        newg = np.empty(len(cs), dtype=bool)
        newg[0] = True
        newg[1:] = (cs[1:] != cs[:-1]) | (bs[1:] != bs[:-1])
        starts = np.flatnonzero(newg)
        inv_sum = np.add.reduceat(np.exp2(-ks.astype(np.float64)), starts)
        counts = np.diff(np.append(starts, len(cs)))
        est = hll_estimate_sparse(inv_sum, counts, p=p)
        take = pa.array(src_idx[starts], pa.int64())
        return pa.table(
            {
                "source": src.take(take),
                "bucket_ts": pa.array(
                    bs[starts] * tier_us + EVENTS_T0_US, pa.int64()
                ).cast(pa.timestamp("us")),
                "n_users_est": pa.array(est, pa.int64()),
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )
    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=64 * 1024
    )
    return hash_partition_merge(
        partials, "bucket_id", merge, k=_adaptive_k(sf_dir)
    )


def _last_event_carries(tagged: Dataset, k: int | None = None) -> Dataset:
    """The carried-prefix round shared by the order-dependent event scans
    (events_increase_1m / events_twa_1m / events_max_gap): from rows
    tagged (k, t, o, v, w), produce one carry row per (k, w) holding the
    LAST event (by (t, o)) of the nearest EARLIER window of the same key.
    Two narrow exchanges: a per-batch last-per-(k, w) combiner (so only
    one summary row per (key, window, batch) shuffles) and a per-key
    merge that shifts each key's window summaries forward one step."""
    from ..stages.shuffle import hash_partition_merge

    def summarize(b: pa.Table) -> pa.Table:
        kk = b["k"].combine_chunks().to_numpy(zero_copy_only=False)
        ww = b["w"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = b["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = b["o"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = b["v"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((oo, tt, ww, kk))
        ks, ws = kk[order], ww[order]
        last = np.empty(len(order), dtype=bool)
        last[-1] = True
        last[:-1] = (ks[1:] != ks[:-1]) | (ws[1:] != ws[:-1])
        sel = order[last]
        return pa.table(
            {
                "k": pa.array(kk[sel]),
                "w": pa.array(ww[sel]),
                "t": pa.array(tt[sel]),
                "o": pa.array(oo[sel]),
                "v": pa.array(vv[sel]),
            }
        )

    def carry_kernel(t_: pa.Table) -> pa.Table:
        """Per key: each window's carry-in = the last event of the nearest
        EARLIER window (strictly before; summaries are already one row per
        (key, window))."""
        empty = {c: pa.array([], pa.int64()) for c in ("k", "w", "t", "o", "v")}
        if t_.num_rows == 0:
            return pa.table(empty)
        kk = t_["k"].combine_chunks().to_numpy(zero_copy_only=False)
        ww = t_["w"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ww, kk))
        ks, ws = kk[order], ww[order]
        prev_same_key = np.empty(len(order), dtype=bool)
        prev_same_key[0] = False
        prev_same_key[1:] = ks[1:] == ks[:-1]
        sel = np.flatnonzero(prev_same_key)
        take_prev = pa.array(order[sel - 1], pa.int64())
        return pa.table(
            {
                "k": pa.array(ks[sel]),
                "w": pa.array(ws[sel]),
                "t": t_["t"].combine_chunks().take(take_prev),
                "o": t_["o"].combine_chunks().take(take_prev),
                "v": t_["v"].combine_chunks().take(take_prev),
            }
        )

    return hash_partition_merge(
        tagged.map_batches(summarize, batch_format="pyarrow", batch_size=256 * 1024),
        "k",
        carry_kernel,
        k=k,
    )


def _tag_carry(b: pa.Table) -> pa.Table:
    """Re-shape carry rows to the tagged-event schema with carry=True."""
    return pa.table(
        {
            "k": b["k"],
            "t": b["t"],
            "o": b["o"],
            "v": b["v"],
            "carry": pa.array(np.ones(b.num_rows, dtype=bool)),
            "w": b["w"],
        }
    )


def events_increase_1m(sf_dir: str, window_us: int = TEMPORAL_WINDOW_US) -> Dataset:
    """Counter-reset-aware INCREASE per (event_type, minute) — PromQL's
    ``increase()`` over an irregular event stream, the rate primitive of
    the reference's own domain (its data product is Prometheus counters,
    /root/reference/internal/metrics/metrics.go:95-183).  Per source,
    events ordered by (ts, event_id) form a counter series; each event
    contributes ``v - prev`` when the counter advanced, ``v`` after a
    reset (v < prev), and 0 for a source's first event; the rollup sums
    contributions per minute bucket.

    An order-dependent scan can't ride a plain groupby, and per-source
    history is unbounded — so this reuses the round-4 hot-key machinery:
    rows partition by (source, ts-window); a per-(source, window) summary
    round carries each window's LAST event (ts, order, value) forward as
    the next window's predecessor (asof_join's carried-prefix shape); the
    per-partition kernel is one lexsort + shifted compare.  Source
    identity is an exact broadcast rank (tiny-cardinality column), never
    a hash.  Output (source, bucket_ts, increase); oracle = lag window +
    CASE + group by minute."""
    from ..stages.shuffle import hash_partition_merge, shuffle_parts
    from ..stages.temporal import _kw_partition

    tier_us = 60 * 1_000_000
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )
    srcs = pa.array(
        sorted(
            rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])
            .unique("event_type")
        ),
        pa.string(),
    )

    def narrow(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        vals = b["value"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": pc.cast(
                    pc.index_in(b["event_type"], value_set=srcs), pa.int64()
                ),
                "t": pa.array(ts_us, pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
                "v": pa.array(np.floor(vals).astype(np.int64)),
                "carry": pa.array(np.zeros(b.num_rows, dtype=bool)),
                "w": pa.array(ts_us // window_us, pa.int64()),
            }
        )

    tagged = ds.map_batches(narrow, batch_format="pyarrow")

    carries = _last_event_carries(tagged)
    full = tagged.union(
        carries.map_batches(_tag_carry, batch_format="pyarrow")
    )

    def kernel(t_: pa.Table) -> pa.Table:
        if t_.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "bucket_ts": pa.array([], pa.timestamp("us")),
                    "increase": pa.array([], pa.int64()),
                }
            )
        kk = t_["k"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t_["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t_["o"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = t_["v"].combine_chunks().to_numpy(zero_copy_only=False)
        cr = t_["carry"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cr, oo, tt, kk))  # carry first on full ties
        ks, ts_, vs = kk[order], tt[order], vv[order]
        crs = cr[order]
        n = len(order)
        has_prev = np.empty(n, dtype=bool)
        has_prev[0] = False
        has_prev[1:] = ks[1:] == ks[:-1]
        pv = np.empty(n, dtype=np.int64)
        pv[0] = 0
        pv[1:] = vs[:-1]
        contrib = np.where(
            ~has_prev, 0, np.where(vs >= pv, vs - pv, vs)
        )
        contrib = np.where(crs, 0, contrib)  # carries are predecessors only
        keep = ~crs
        bucket = ts_[keep] // tier_us
        gk, gc = ks[keep], contrib[keep]
        o2 = np.lexsort((bucket, gk))
        gk, gb, gc = gk[o2], bucket[o2], gc[o2]
        newg = np.empty(len(gk), dtype=bool)
        newg[0] = True
        newg[1:] = (gk[1:] != gk[:-1]) | (gb[1:] != gb[:-1])
        starts = np.flatnonzero(newg)
        inc = np.add.reduceat(gc, starts)
        return pa.table(
            {
                "source": pc.take(
                    srcs, pa.array(gk[starts], pa.int64())
                ),
                "bucket_ts": pa.array(
                    gb[starts] * tier_us, pa.int64()
                ).cast(pa.timestamp("us")),
                "increase": pa.array(inc, pa.int64()),
            }
        )

    return _kw_partition(full, kernel, shuffle_parts(_adaptive_k(sf_dir)))


def events_distinct_users_5m(sf_dir: str, w: int = 5) -> Dataset:
    """SLIDING-window distinct cardinality: unique users per (event_type,
    minute) over the trailing ``w`` minutes — "active users in the last N
    minutes", the windowed companion of :func:`events_distinct_users_1m`.
    Distinct counts are not subtractable, so a sliding exact count can't
    reuse a per-bucket result; instead each distinct (source, bucket,
    user) triple is REPLICATED into the ``w`` target buckets it is
    visible from (bounded blow-up: x w narrow int64 rows), and one
    bucket-hash shuffle dedupes and counts per target.  Only buckets
    containing real events are emitted (the k=0 replica marks them), so
    the output grid matches the per-bucket operator's.  Output (source,
    bucket_ts, n_users_5m); oracle = distinct-triples CTE self-joined on
    a BETWEEN window.
    """
    from ..stages.shuffle import hash_partition_merge

    tier_us = 60 * 1_000_000

    def partial(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        bucket = np.floor_divide(ts_us - EVENTS_T0_US, tier_us)
        t = pa.table(
            {
                "source": b["event_type"],
                "b0": pa.array(bucket, pa.int64()),
                "user_id": pc.cast(b["user_id"], pa.int64()),
            }
        )
        tri = t.group_by(["source", "b0", "user_id"], use_threads=False).aggregate([])
        n = tri.num_rows
        reps = []
        for k in range(w):
            reps.append(
                pa.table(
                    {
                        "source": tri["source"],
                        "bucket_id": pc.add(tri["b0"], pa.scalar(k, pa.int64())),
                        "user_id": tri["user_id"],
                        "real": pa.array(np.full(n, k == 0, dtype=bool)),
                    }
                )
            )
        return pa.concat_tables(reps)

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "bucket_ts": pa.array([], pa.timestamp("us")),
                    "n_users_5m": pa.array([], pa.int64()),
                }
            )
        src = t["source"].combine_chunks()
        codes = (
            pc.dictionary_encode(src)
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        b = t["bucket_id"].combine_chunks().to_numpy(zero_copy_only=False)
        u = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        rl = t["real"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((u, b, codes))
        cs, bs, us, rs = codes[order], b[order], u[order], rl[order]
        n = len(order)
        dis = np.empty(n, dtype=bool)
        dis[0] = True
        dis[1:] = (cs[1:] != cs[:-1]) | (bs[1:] != bs[:-1]) | (us[1:] != us[:-1])
        newg = np.empty(n, dtype=bool)
        newg[0] = True
        newg[1:] = (cs[1:] != cs[:-1]) | (bs[1:] != bs[:-1])
        starts = np.flatnonzero(newg)
        n_users = np.add.reduceat(dis.astype(np.int64), starts)
        has_real = np.logical_or.reduceat(rs, starts)
        keep = np.flatnonzero(has_real)
        take = pa.array(order[starts][keep], pa.int64())
        return pa.table(
            {
                "source": src.take(take),
                "bucket_ts": pa.array(
                    bs[starts][keep] * tier_us + EVENTS_T0_US, pa.int64()
                ).cast(pa.timestamp("us")),
                "n_users_5m": pa.array(n_users[keep], pa.int64()),
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )
    partials = ds.map_batches(partial, batch_format="pyarrow")
    return hash_partition_merge(
        partials, "bucket_id", merge, k=_adaptive_k(sf_dir)
    )


def events_zscore_1m(sf_dir: str, w: int = 30, z: int = 3) -> Dataset:
    """Rolling z-score anomaly flags over the dense gap-filled 1m grid —
    the threshold-alerting primitive of an observability stack (the
    reference's product is Prometheus series, whose alert rules are
    exactly this shape).  Per (source, minute): the trailing-``w``-bucket
    (including current) sum S, sum-of-squares SS and window size n of the
    per-minute event count; a bucket is anomalous iff its count deviates
    from the window mean by more than ``z`` sample-std-devs.  The test is
    evaluated in EXACT integer arithmetic — ``(n*x - S)^2 > z^2 *
    (n*SS - S^2)`` is the z-test cleared of divisions — so the oracle
    (SQL window sums + the same CASE) matches bit-for-bit; no float ever
    exists.  Scale shape: one pass of stages/temporal.rolling_sum
    ((source, window)+halo partitioning, halo w-1, cumsum kernel), count²
    and the window-size counter ride the same shuffle as extra int64
    columns, and the flag is a stateless vectorized map.  Output
    (source, bucket_ts, count, trail_sum, anomaly)."""
    from ..stages.temporal import rolling_sum

    grid = events_gapfill(sf_dir, "1m")

    def aug(b: pa.Table) -> pa.Table:
        c = b["count"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": b["source"],
                "bucket_ts": b["bucket_ts"],
                "count": b["count"],
                "sq": pa.array(c * c, pa.int64()),
                "one": pa.array(np.ones(len(c), dtype=np.int64)),
            }
        )

    rolled = rolling_sum(
        grid.map_batches(aug, batch_format="pyarrow"),
        "1m",
        w,
        ["count", "sq", "one"],
        t0_us=EVENTS_T0_US,
        keep_cols=("count",),
    )
    z2 = z * z

    def flag(b: pa.Table) -> pa.Table:
        x = b["count"].combine_chunks().to_numpy(zero_copy_only=False)
        s = b["roll_count"].combine_chunks().to_numpy(zero_copy_only=False)
        ss = b["roll_sq"].combine_chunks().to_numpy(zero_copy_only=False)
        n = b["roll_one"].combine_chunks().to_numpy(zero_copy_only=False)
        lhs = n * x - s
        anomaly = lhs * lhs > z2 * (n * ss - s * s)
        return pa.table(
            {
                "source": b["source"],
                "bucket_ts": b["bucket_ts"],
                "count": b["count"],
                "trail_sum": b["roll_count"],
                "anomaly": pa.array(anomaly),
            }
        )

    return rolled.map_batches(flag, batch_format="pyarrow")


# Prometheus-style histogram `le` bounds (the reference's own
# process-duration histogram, internal/metrics/metrics.go:124-133, is this
# aggregate with seconds buckets); +Inf is INT64_MAX so the column stays
# exact-integer end to end.
HIST_BOUNDS = (10, 20, 50, 100, 200, 500)
HIST_INF = (1 << 63) - 1


def events_hist_1m(sf_dir: str) -> Dataset:
    """Cumulative histogram rollup: per (event_type, minute), the
    Prometheus-text ``le`` series over floor(value) — cum_count(le) =
    #events with value <= le, for le in HIST_BOUNDS + {+Inf}.  The
    distributed form of the reference's HistogramVec (A2,
    internal/metrics/metrics.go:124-133): per batch one np.searchsorted
    bins every value and an Arrow group_by reduces to (source, bucket,
    bin) partial counts, ONLY those shuffle (hashed on bucket_id), and
    the per-partition merge scatter-adds into a dense (group x bins)
    matrix and cumsums along the bin axis — each output bucket emits
    exactly len(bounds)+1 rows including zero bins, as a scrape would.
    Output (source, bucket_ts, le, cum_count)."""
    from ..stages.shuffle import hash_partition_merge

    tier_us = 60 * 1_000_000
    bounds = np.asarray(HIST_BOUNDS, dtype=np.int64)
    nb = len(bounds) + 1
    le_vals = np.append(bounds, HIST_INF)

    def partial(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        bucket = np.floor_divide(ts_us - EVENTS_T0_US, tier_us)
        x = np.floor(
            b["value"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        li = np.searchsorted(bounds, x, side="left")
        t = pa.table(
            {
                "source": b["event_type"],
                "bucket_id": pa.array(bucket, pa.int64()),
                "li": pa.array(li, pa.int64()),
            }
        )
        return t.group_by(["source", "bucket_id", "li"], use_threads=False).aggregate(
            [("li", "count")]
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "bucket_ts": pa.array([], pa.timestamp("us")),
                    "le": pa.array([], pa.int64()),
                    "cum_count": pa.array([], pa.int64()),
                }
            )
        src = t["source"].combine_chunks()
        codes = (
            pc.dictionary_encode(src)
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        b = t["bucket_id"].combine_chunks().to_numpy(zero_copy_only=False)
        li = t["li"].combine_chunks().to_numpy(zero_copy_only=False)
        c = t["li_count"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((li, b, codes))
        cs, bs, ls, cc = codes[order], b[order], li[order], c[order]
        newg = np.empty(len(order), dtype=bool)
        newg[0] = True
        newg[1:] = (cs[1:] != cs[:-1]) | (bs[1:] != bs[:-1])
        gid = np.cumsum(newg) - 1
        ng = int(gid[-1]) + 1
        dense = np.zeros((ng, nb), dtype=np.int64)
        # partials from different batches may repeat a (group, bin): add
        np.add.at(dense, (gid, ls), cc)
        cum = np.cumsum(dense, axis=1)
        starts = np.flatnonzero(newg)
        take = pa.array(np.repeat(order[starts], nb), pa.int64())
        return pa.table(
            {
                "source": src.take(take),
                "bucket_ts": pa.array(
                    np.repeat(bs[starts], nb) * tier_us + EVENTS_T0_US, pa.int64()
                ).cast(pa.timestamp("us")),
                "le": pa.array(np.tile(le_vals, ng), pa.int64()),
                "cum_count": pa.array(cum.ravel(), pa.int64()),
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )
    partials = ds.map_batches(partial, batch_format="pyarrow")
    return hash_partition_merge(
        partials, "bucket_id", merge, k=_adaptive_k(sf_dir)
    )


def events_top_movers_1h(sf_dir: str, kk: int = 3) -> Dataset:
    """Top-``kk`` event types per hour by absolute hour-over-hour change
    in event count — the "biggest movers" board every monitoring stack
    derives from its delta series.  Pure composition of round-3/4 pieces:
    E5 gap_fill densifies the 1h grid, E19 grid_lag supplies the previous
    hour ((source, window)+halo-1, no full-history task), and E18
    grouped_topk ranks |delta| per hour with its per-batch combiner (at
    most kk candidate rows per (hour, batch) shuffle).  Ties break by
    source string ascending — exact, via the broadcast sorted-source
    rank, never a hash.  First-hour rows (no predecessor) are excluded
    like the SQL lag NULL.  Output (bucket_ts, source, abs_delta, rank)."""
    from ..stages.shuffle import grouped_topk
    from ..stages.temporal import grid_lag

    tier_us = 3600 * 1_000_000
    grid = events_gapfill(sf_dir, "1h")
    lagged = grid_lag(grid, "1h", ["count"], t0_us=EVENTS_T0_US)
    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())

    def narrow(b: pa.Table) -> pa.Table:
        lag = b["lag_count"].combine_chunks()
        valid = pc.is_valid(lag)
        t = b.filter(valid)
        c = t["count"].combine_chunks().to_numpy(zero_copy_only=False)
        p = t["lag_count"].combine_chunks().to_numpy(zero_copy_only=False)
        bid = (
            t["bucket_ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
            - EVENTS_T0_US
        ) // tier_us
        return pa.table(
            {
                "bucket_id": pa.array(bid, pa.int64()),
                "abs_delta": pa.array(np.abs(c - p), pa.int64()),
                "src_rank": pc.cast(
                    pc.index_in(t["source"], value_set=srcs), pa.int64()
                ),
            }
        )

    top = grouped_topk(
        lagged.map_batches(narrow, batch_format="pyarrow"),
        key="bucket_id",
        value="abs_delta",
        order_id="src_rank",
        kk=kk,
        k=_adaptive_k(sf_dir),
    )

    def widen(b: pa.Table) -> pa.Table:
        bid = b["bucket_id"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket_ts": pa.array(
                    bid * tier_us + EVENTS_T0_US, pa.int64()
                ).cast(pa.timestamp("us")),
                "source": pc.take(srcs, b["src_rank"]),
                "abs_delta": b["abs_delta"],
                "rank": b["rank"],
            }
        )

    return top.map_batches(widen, batch_format="pyarrow")


@lru_cache(maxsize=64)
def events_src_list(sf_dir: str) -> tuple[str, ...]:
    """Sorted distinct event_type values (tiny-cardinality, memoized —
    several queries need the exact broadcast source rank)."""
    return tuple(
        sorted(
            rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])
            .unique("event_type")
        )
    )


def events_twa_1m(sf_dir: str, window_us: int = TEMPORAL_WINDOW_US) -> Dataset:
    """Time-weighted (LOCF) value integral per (event_type, minute) — the
    ``time_weight('LOCF')`` downsample of a timeseries store: between two
    consecutive events of a source, floor(value) of the EARLIER event
    holds as a step function, and each minute bucket accumulates
    wsum_us = Σ value·(microseconds of the bucket covered by the step).
    Divide by the covered duration off-line for the average; the engine
    emits the exact int64 integral so the DuckDB oracle (lag segments ×
    generate_series minutes) matches bit-for-bit — no float division.

    Order-dependent over unbounded per-source history, so it rides the
    round-4 carried-prefix machinery (events_increase_1m's shape): rows
    partition by (source, ts-window); one summary round carries each
    window's LAST event (ts, order, value) forward as the next window's
    predecessor; the kernel builds the segment ENDING at each event —
    [prev_ts, ts) valued at prev_value — and explodes it over the minutes
    it covers (np.repeat, no Python loop).  Replication is bounded by the
    sources × active-minutes grid (gap_fill's own bound).  Zero-length
    segments (duplicate timestamps) are dropped on both sides.  Kernel
    output pre-combines to (source, bucket, wsum) partials; ONE narrow
    bucket-hash exchange merges boundary buckets split across windows.
    Output (source, bucket_ts, wsum_us)."""
    from ..stages.shuffle import hash_partition_merge, shuffle_parts
    from ..stages.temporal import _kw_partition

    tier_us = 60 * 1_000_000
    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def narrow(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        vals = b["value"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": pc.cast(
                    pc.index_in(b["event_type"], value_set=srcs), pa.int64()
                ),
                "t": pa.array(ts_us, pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
                "v": pa.array(np.floor(vals).astype(np.int64)),
                "carry": pa.array(np.zeros(b.num_rows, dtype=bool)),
                "w": pa.array(ts_us // window_us, pa.int64()),
            }
        )

    tagged = ds.map_batches(narrow, batch_format="pyarrow")

    carries = _last_event_carries(tagged)
    full = tagged.union(
        carries.map_batches(_tag_carry, batch_format="pyarrow")
    )

    def kernel(t_: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "k": pa.array([], pa.int64()),
                "bucket_id": pa.array([], pa.int64()),
                "wsum": pa.array([], pa.int64()),
            }
        )
        if t_.num_rows == 0:
            return empty
        kk = t_["k"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t_["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t_["o"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = t_["v"].combine_chunks().to_numpy(zero_copy_only=False)
        cr = t_["carry"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cr, oo, tt, kk))
        ks, ts_, vs, crs = kk[order], tt[order], vv[order], cr[order]
        n = len(order)
        has_prev = np.empty(n, dtype=bool)
        has_prev[0] = False
        has_prev[1:] = ks[1:] == ks[:-1]
        pt = np.empty(n, dtype=np.int64)
        pt[0] = 0
        pt[1:] = ts_[:-1]
        pv = np.empty(n, dtype=np.int64)
        pv[0] = 0
        pv[1:] = vs[:-1]
        # segment ending at each kept event: [pt, ts) valued pv
        seg = has_prev & ~crs & (ts_ > pt)
        s_t0, s_t1, s_v, s_k = pt[seg], ts_[seg], pv[seg], ks[seg]
        if len(s_t0) == 0:
            return empty
        b0 = s_t0 // tier_us
        b1 = (s_t1 - 1) // tier_us
        counts = b1 - b0 + 1
        total = int(counts.sum())
        # vectorized explode: bucket = b0[seg] + within-segment offset
        sid = np.repeat(np.arange(len(counts)), counts)
        offs = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(counts)[:-1])), counts
        )
        bk = b0[sid] + offs
        lo = np.maximum(s_t0[sid], bk * tier_us)
        hi = np.minimum(s_t1[sid], (bk + 1) * tier_us)
        wpart = s_v[sid] * (hi - lo)
        gk = s_k[sid]
        # pre-combine partials per (source, bucket) before the exchange
        o2 = np.lexsort((bk, gk))
        gks, bks, wps = gk[o2], bk[o2], wpart[o2]
        newg = np.empty(total, dtype=bool)
        newg[0] = True
        newg[1:] = (gks[1:] != gks[:-1]) | (bks[1:] != bks[:-1])
        starts = np.flatnonzero(newg)
        return pa.table(
            {
                "k": pa.array(gks[starts], pa.int64()),
                "bucket_id": pa.array(bks[starts], pa.int64()),
                "wsum": pa.array(np.add.reduceat(wps, starts), pa.int64()),
            }
        )

    partials = _kw_partition(full, kernel, shuffle_parts(_adaptive_k(sf_dir)))

    def final_merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "bucket_ts": pa.array([], pa.timestamp("us")),
                    "wsum_us": pa.array([], pa.int64()),
                }
            )
        kk = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        bb = t["bucket_id"].combine_chunks().to_numpy(zero_copy_only=False)
        ww = t["wsum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((bb, kk))
        ks, bs, ws = kk[order], bb[order], ww[order]
        newg = np.empty(len(order), dtype=bool)
        newg[0] = True
        newg[1:] = (ks[1:] != ks[:-1]) | (bs[1:] != bs[:-1])
        starts = np.flatnonzero(newg)
        return pa.table(
            {
                "source": pc.take(srcs, pa.array(ks[starts], pa.int64())),
                "bucket_ts": pa.array(
                    bs[starts] * tier_us, pa.int64()
                ).cast(pa.timestamp("us")),
                "wsum_us": pa.array(np.add.reduceat(ws, starts), pa.int64()),
            }
        )

    return hash_partition_merge(
        partials, "bucket_id", final_merge, k=_adaptive_k(sf_dir)
    )


def events_autocorr_1m(sf_dir: str) -> Dataset:
    """E31: lag-1 autocorrelation sufficient statistics of the per-minute
    event count, per source, over the dense gap-filled grid — the
    seasonality/burstiness detector of a timeseries store, reduced to its
    exact-integer core.  For every adjacent grid pair (x_prev, x_cur)
    within a source: n_pairs, Σx_cur, Σx_prev, Σx_cur², Σx_prev², and the
    cross term Σx_cur·x_prev — the six sufficient statistics from which
    r₁ = (nΣxy − ΣxΣy) / √((nΣx²−(Σx)²)(nΣy²−(Σy)²)) follows off-line;
    emitting the statistics instead of the float keeps the DuckDB oracle
    (lag window + SUMs) bit-exact.  Scale shape: E19 grid_lag supplies
    predecessors ((source, window)+1-row-halo, no full-history task), a
    stateless map squares/multiplies, and per-batch partials reduce per
    source before ONE tiny source-hash merge (one row per (source, batch)
    moves).  Output (source, n_pairs, s_cur, s_prev, s_cc, s_cur2,
    s_prev2)."""
    from ..stages.shuffle import hash_partition_merge

    from ..stages.temporal import grid_lag

    grid = events_gapfill(sf_dir, "1m")
    lagged = grid_lag(grid, "1m", ["count"], t0_us=EVENTS_T0_US)
    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())

    def partial(b: pa.Table) -> pa.Table:
        lag = b["lag_count"].combine_chunks()
        t = b.filter(pc.is_valid(lag))
        x = t["count"].combine_chunks().to_numpy(zero_copy_only=False)
        p = t["lag_count"].combine_chunks().to_numpy(zero_copy_only=False)
        code = pc.cast(
            pc.index_in(t["source"], value_set=srcs), pa.int64()
        ).combine_chunks().to_numpy(zero_copy_only=False)
        u, inv = np.unique(code, return_inverse=True)
        cols = {
            "src": np.ones(len(x), dtype=np.int64),  # n_pairs contributor
            "s_cur": x,
            "s_prev": p,
            "s_cc": x * p,
            "s_cur2": x * x,
            "s_prev2": p * p,
        }
        out = {"src": pa.array(u, pa.int64())}
        for name, v in cols.items():
            acc = np.zeros(len(u), dtype=np.int64)
            np.add.at(acc, inv, v)
            out["n_pairs" if name == "src" else name] = pa.array(acc)
        return pa.table(out)

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{
                        c: pa.array([], pa.int64())
                        for c in (
                            "n_pairs", "s_cur", "s_prev", "s_cc",
                            "s_cur2", "s_prev2",
                        )
                    },
                }
            )
        g = t.group_by("src", use_threads=False).aggregate(
            [
                ("n_pairs", "sum"), ("s_cur", "sum"), ("s_prev", "sum"),
                ("s_cc", "sum"), ("s_cur2", "sum"), ("s_prev2", "sum"),
            ]
        )
        return pa.table(
            {
                "source": pc.take(srcs, g["src"]),
                "n_pairs": g["n_pairs_sum"],
                "s_cur": g["s_cur_sum"],
                "s_prev": g["s_prev_sum"],
                "s_cc": g["s_cc_sum"],
                "s_cur2": g["s_cur2_sum"],
                "s_prev2": g["s_prev2_sum"],
            }
        )

    partials = lagged.map_batches(partial, batch_format="pyarrow")
    return hash_partition_merge(partials, "src", merge, k=1)


def events_max_gap(sf_dir: str, window_us: int = TEMPORAL_WINDOW_US) -> Dataset:
    """E32: per-source maximum inter-event gap (and gap count) — the
    silence/outage detector of a monitoring stack ("longest interval with
    no events from this source"), in exact integer microseconds.  Gaps are
    differences between consecutive events in (ts, event_id) order, an
    order-dependent scan over unbounded per-source history: rows partition
    by (source, ts-window) and :func:`_last_event_carries` supplies each
    window's predecessor, so the kernel (one lexsort + shifted diff) never
    needs a source's full history in one task; per-partition (count, max)
    partials fold in one tiny source merge.  Output (source, n_gaps,
    max_gap_us); oracle = lag window + max/count."""
    from ..stages.shuffle import hash_partition_merge, shuffle_parts
    from ..stages.temporal import _kw_partition

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def narrow(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": pc.cast(
                    pc.index_in(b["event_type"], value_set=srcs), pa.int64()
                ),
                "t": pa.array(ts_us, pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
                "v": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
                "carry": pa.array(np.zeros(b.num_rows, dtype=bool)),
                "w": pa.array(ts_us // window_us, pa.int64()),
            }
        )

    tagged = ds.map_batches(narrow, batch_format="pyarrow")
    carries = _last_event_carries(tagged)
    full = tagged.union(
        carries.map_batches(_tag_carry, batch_format="pyarrow")
    )

    def kernel(t_: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "src": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "mx": pa.array([], pa.int64()),
            }
        )
        if t_.num_rows == 0:
            return empty
        kk = t_["k"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t_["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t_["o"].combine_chunks().to_numpy(zero_copy_only=False)
        cr = t_["carry"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cr, oo, tt, kk))
        ks, ts_, crs = kk[order], tt[order], cr[order]
        n = len(order)
        has_prev = np.empty(n, dtype=bool)
        has_prev[0] = False
        has_prev[1:] = ks[1:] == ks[:-1]
        pt = np.empty(n, dtype=np.int64)
        pt[0] = 0
        pt[1:] = ts_[:-1]
        sel = has_prev & ~crs
        if not sel.any():
            return empty
        gaps = ts_[sel] - pt[sel]
        gk = ks[sel]
        u, inv = np.unique(gk, return_inverse=True)
        cnt = np.bincount(inv, minlength=len(u)).astype(np.int64)
        mx = np.zeros(len(u), dtype=np.int64)
        np.maximum.at(mx, inv, gaps)
        return pa.table(
            {
                "src": pa.array(u, pa.int64()),
                "n": pa.array(cnt),
                "mx": pa.array(mx),
            }
        )

    partials = _kw_partition(full, kernel, shuffle_parts(_adaptive_k(sf_dir)))

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_gaps": pa.array([], pa.int64()),
                    "max_gap_us": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("src", use_threads=False).aggregate(
            [("n", "sum"), ("mx", "max")]
        )
        return pa.table(
            {
                "source": pc.take(srcs, g["src"]),
                "n_gaps": g["n_sum"],
                "max_gap_us": g["mx_max"],
            }
        )

    return hash_partition_merge(partials, "src", merge, k=1)


def events_quantiles_sketch_1m(
    sf_dir: str, alpha_permille: int = 20
) -> Dataset:
    """E33: DDSketch-style approximate p50/p95 per (event_type, minute) —
    the 100 TB path of E22's exact quantiles (the E23→E24 exact→sketch
    pattern).  E22's exchange is bounded by the number of DISTINCT values
    per bucket — exact, but unbounded for continuous metrics; this sketch
    bins values into relative-accuracy log buckets (Masson, Lee & Rim,
    "DDSketch", VLDB 2019: bin = ceil(ln v / ln γ), γ = (1+α)/(1-α)),
    capping per-bucket state at O(log(range)/α) rows — ~350 bins for
    int64 at α=2% — whatever the value distribution.  Bin counts merge by
    SUM (associative, partitioning-independent), and the estimator
    (2γⁱ/(γ+1), relative error ≤ α) shares E22's discrete-rank kernel
    via _disc_quantile_runs, so the sketch and exact paths use one rank
    semantics.  Zero and negative values get exact-zero and mirrored bins.
    Output (source, bucket_ts, count, p50_est, p95_est) — rows-only
    (estimates are floats by construction); pytest asserts the ≤ α
    relative-error bound per group against the exact quantiles."""
    from ..stages.shuffle import hash_partition_merge

    tier_us = 60 * 1_000_000
    a = alpha_permille / 1000.0
    gamma = (1.0 + a) / (1.0 - a)
    ln_g = np.log(gamma)
    ZERO_BIN = -(1 << 40)
    NEG_OFF = -(1 << 41)

    def to_bins(x: np.ndarray) -> np.ndarray:
        out = np.empty(len(x), dtype=np.int64)
        pos, neg = x > 0, x < 0
        out[pos] = np.ceil(np.log(x[pos]) / ln_g).astype(np.int64)
        out[x == 0] = ZERO_BIN
        # mirrored: more negative -> larger magnitude -> smaller bin
        out[neg] = NEG_OFF - np.ceil(np.log(-x[neg]) / ln_g).astype(np.int64)
        return out

    def from_bins(bins: np.ndarray) -> np.ndarray:
        est = np.empty(len(bins), dtype=np.float64)
        zero = bins == ZERO_BIN
        neg = bins < NEG_OFF // 2
        neg &= ~zero
        pos = ~zero & ~neg
        est[pos] = 2.0 * np.power(gamma, bins[pos].astype(np.float64)) / (gamma + 1.0)
        est[zero] = 0.0
        est[neg] = -2.0 * np.power(
            gamma, (NEG_OFF - bins[neg]).astype(np.float64)
        ) / (gamma + 1.0)
        return est

    def partial(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        bucket = np.floor_divide(ts_us - EVENTS_T0_US, tier_us)
        vals = np.floor(
            b["value"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        t = pa.table(
            {
                "source": b["event_type"],
                "bucket_id": pa.array(bucket, pa.int64()),
                "bin": pa.array(to_bins(vals), pa.int64()),
            }
        )
        return t.group_by(["source", "bucket_id", "bin"], use_threads=False).aggregate(
            [("bin", "count")]
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "bucket_ts": pa.array([], pa.timestamp("us")),
                    "count": pa.array([], pa.int64()),
                    "p50_est": pa.array([], pa.float64()),
                    "p95_est": pa.array([], pa.float64()),
                }
            )
        g = t.group_by(["source", "bucket_id", "bin"], use_threads=False).aggregate(
            [("bin_count", "sum")]
        )
        src = g["source"].combine_chunks()
        sh = (
            pc.dictionary_encode(src)
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        b = g["bucket_id"].combine_chunks().to_numpy(zero_copy_only=False)
        v = g["bin"].combine_chunks().to_numpy(zero_copy_only=False)
        cnt = (
            g["bin_count_sum"].combine_chunks().to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        order = np.lexsort((v, b, sh))
        shs, bs, vs, cs = sh[order], b[order], v[order], cnt[order]
        starts, totals, firsts = _disc_quantile_runs(shs, bs, cs, (500, 950))
        take = pa.array(order[starts], pa.int64())
        return pa.table(
            {
                "source": src.take(take),
                "bucket_ts": pa.array(
                    bs[starts] * tier_us + EVENTS_T0_US, pa.int64()
                ).cast(pa.timestamp("us")),
                "count": pa.array(totals),
                "p50_est": pa.array(from_bins(vs[firsts[500]])),
                "p95_est": pa.array(from_bins(vs[firsts[950]])),
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )
    partials = ds.map_batches(partial, batch_format="pyarrow")
    return hash_partition_merge(
        partials, "bucket_id", merge, k=_adaptive_k(sf_dir)
    )


def events_seasonal_profile(sf_dir: str) -> Dataset:
    """E35: seasonal minute-of-hour profile — per (source, minute-of-hour
    0..59), how many grid minutes exist (n_slots) and the total event
    count over them, computed over the DENSE gap-filled 1m grid so quiet
    minutes weigh in as zeros.  The "what does a typical hour look like"
    rollup of a timeseries dashboard, reduced to its exact-integer
    sufficient statistics (avg/min-of-hour = total_count / n_slots
    off-line; emitting the integers keeps the DuckDB oracle bit-exact).

    Scale shape (E31 autocorr's): the grid arrives dense from gap_fill
    (windowed, no full-history task), a stateless per-batch partial
    reduces grid rows to at most sources x 60 rows via one np.add.at
    group-reduce, and ONLY those partials shuffle — one tiny source-hash
    merge (k=1; output cardinality is sources x 60 regardless of corpus
    size).  Source identity is the exact broadcast rank (events_src_list),
    not a hash (round-3 advice convention).  Output (source,
    minute_of_hour, n_slots, total_count)."""
    from ..stages.shuffle import hash_partition_merge

    grid = events_gapfill(sf_dir, "1m")
    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    n_src = len(srcs)
    tier_us = 60 * 1_000_000

    def partial(b: pa.Table) -> pa.Table:
        ts_us = (
            b["bucket_ts"].cast(pa.int64()).combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        # t0 is hour-aligned, so (minutes since t0) mod 60 == extract(minute)
        # (numpy floor-mod keeps this true for pre-t0 grids too)
        moh = ((ts_us - EVENTS_T0_US) // tier_us) % 60
        code = pc.cast(
            pc.index_in(b["source"], value_set=srcs), pa.int64()
        ).combine_chunks().to_numpy(zero_copy_only=False)
        cnt = b["count"].combine_chunks().to_numpy(zero_copy_only=False)
        flat = code * 60 + moh
        slots = np.zeros(n_src * 60, dtype=np.int64)
        total = np.zeros(n_src * 60, dtype=np.int64)
        np.add.at(slots, flat, 1)
        np.add.at(total, flat, cnt)
        nz = np.flatnonzero(slots)
        return pa.table(
            {
                "key": pa.array(nz, pa.int64()),
                "n_slots": pa.array(slots[nz]),
                "total_count": pa.array(total[nz]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "minute_of_hour": pa.array([], pa.int64()),
                    "n_slots": pa.array([], pa.int64()),
                    "total_count": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("key", use_threads=False).aggregate(
            [("n_slots", "sum"), ("total_count", "sum")]
        )
        key = g["key"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": pc.take(srcs, pa.array(key // 60, pa.int64())),
                "minute_of_hour": pa.array(key % 60, pa.int64()),
                "n_slots": g["n_slots_sum"],
                "total_count": g["total_count_sum"],
            }
        )

    partials = grid.map_batches(partial, batch_format="pyarrow")
    return hash_partition_merge(partials, "key", merge, k=1)


def events_user_hist(sf_dir: str) -> Dataset:
    """E36: user-activity histogram — the distribution of events-per-user
    (for each activity level n, how many users emitted exactly n events).
    The aggregate-of-aggregates every engagement/abuse dashboard draws
    ("how heavy is the heavy tail of senders"), exact by construction.

    Scale shape — two exchanges, both NARROWER than their inputs:
      1. per batch: one Arrow group_by reduces event rows to (user_id,
         partial count) — at most distinct-users-per-batch rows move;
      2. hash-partition by user_id: every partial of a user meets in one
         task, exact per-user totals are decided locally, and the task
         immediately re-reduces them to (events_per_user, n_users)
         histogram partials — per-user rows never leave their partition;
      3. one k=1 merge sums histogram partials (output cardinality =
         number of DISTINCT activity levels, ~log-scale of corpus size).
    Output (events_per_user, n_users)."""
    from ..stages.shuffle import hash_partition_merge

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by("user_id", use_threads=False).aggregate(
            [("user_id", "count")]
        )
        return pa.table(
            {
                "user_id": pc.cast(g["user_id"], pa.int64()),
                "c": pc.cast(g["user_id_count"], pa.int64()),
            }
        )

    def user_fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "events_per_user": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("user_id", use_threads=False).aggregate([("c", "sum")])
        n = g["c_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        lv, cnt = np.unique(n, return_counts=True)
        return pa.table(
            {
                "events_per_user": pa.array(lv, pa.int64()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def hist_fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "events_per_user": pa.array([], pa.int64()),
                    "n_users": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("events_per_user", use_threads=False).aggregate(
            [("n", "sum")]
        )
        return g.rename_columns(["events_per_user", "n_users"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    per_user = hash_partition_merge(
        partials, "user_id", user_fold, k=_adaptive_k(sf_dir)
    )
    return hash_partition_merge(per_user, "events_per_user", hist_fold, k=1)


def events_ewma_1m(
    sf_dir: str, alpha: float = 0.125, window_buckets: int = 4096
) -> Dataset:
    """E34: exponentially weighted moving average of the per-minute event
    count over the dense gap-filled grid — the smoothed baseline an
    alerting rule compares raw counts against (Prometheus' avg_over_time /
    holt_winters family).  Zero-initialized recurrence
    s_i = alpha*count_i + (1-alpha)*s_{i-1}; see stages/temporal.grid_ewma
    for the distributed prefix-scan shape (per-window partials are
    batch-summable, the driver folds O(sources x windows) floats, one
    groupby applies the seeded in-window scan).  Float output, so this is
    a rows-only driver entry; exactness vs the serial recurrence is pinned
    by tests/test_wave6_ops.py.  Output (source, bucket_ts, count, ewma)."""
    from ..stages.temporal import grid_ewma

    grid = events_gapfill(sf_dir, "1m").select_columns(
        ["source", "bucket_ts", "count"]
    )
    return grid_ewma(
        grid, "1m", "count", alpha=alpha, t0_us=EVENTS_T0_US,
        window_buckets=window_buckets,
    )


def events_cusum_1m(sf_dir: str) -> Dataset:
    """E37: one-sided CUSUM burst statistic of the per-minute event count
    over the dense gap-filled grid — S_i = max(0, S_{i-1} + count_i - k)
    with per-source integer drift k = ceil(mean count), the textbook
    change-point/level-shift detector (Page 1954) a monitoring stack runs
    beside its z-score rule (E28 flags single outliers; CUSUM accumulates
    small sustained shifts).  Exact int64 throughout via the closed form
    S_i = P_i - min(0, min_{j<=i} P_j) (P = running sum of count - k), so
    the DuckDB oracle (window SUM + window MIN + the same ceil-mean) is
    bit-exact; see stages/temporal.grid_cusum for the shuffle-free
    three-pass scan.  Output (source, bucket_ts, count, cusum)."""
    from ..stages.temporal import grid_cusum

    grid = events_gapfill(sf_dir, "1m").select_columns(
        ["source", "bucket_ts", "count"]
    )
    return grid_cusum(grid, "1m", "count", t0_us=EVENTS_T0_US)


def events_user_conc_1m(sf_dir: str) -> Dataset:
    """E38: per-(source, minute) user-concentration sufficient statistics
    — total events ``n``, distinct users ``n_users``, and
    ``sum_cc = sum_u c_u*(c_u-1)`` over each user's in-bucket event count.
    Simpson concentration lambda = sum_cc / (n*(n-1)) — the "one user is
    most of this minute's traffic" bot/abuse flag — follows off-line;
    emitting exact int64 sufficient statistics keeps the DuckDB two-level
    GROUP BY oracle bit-exact (the E31/E35 convention).

    Scale shape — E36's aggregate-of-aggregates, keyed per bucket; both
    exchanges NARROWER than their inputs:
      1. per batch: one lexsort reduces event rows to distinct
         (user_id, src, bucket, c) partials;
      2. hash-partition by USER: every partial of a user meets in one
         task, exact per-(user, src, bucket) counts are decided locally
         and immediately re-reduced to per-(src, bucket) partials — rows
         carrying a user_id never leave their partition;
      3. bucket-hash merge sums the <= k partials per (src, bucket).
    Output (source, bucket_ts, n, n_users, sum_cc)."""
    from ..stages.shuffle import hash_partition_merge

    tier_us = 60_000_000
    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        ts_us = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        )
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        uu = (
            pc.cast(b["user_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        bk = ts_us // tier_us
        order = np.lexsort((uu, bk, code))
        cs, bs, us = code[order], bk[order], uu[order]
        newg = np.empty(len(order), dtype=bool)
        newg[0] = True
        newg[1:] = (cs[1:] != cs[:-1]) | (bs[1:] != bs[:-1]) | (us[1:] != us[:-1])
        starts = np.flatnonzero(newg)
        c = np.diff(np.append(starts, len(order)))
        return pa.table(
            {
                "user_id": pa.array(us[starts], pa.int64()),
                "src": pa.array(cs[starts], pa.int64()),
                "bucket_id": pa.array(bs[starts], pa.int64()),
                "c": pa.array(c.astype(np.int64)),
            }
        )

    def user_fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "src": pa.array([], pa.int64()),
                "bucket_id": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "nu": pa.array([], pa.int64()),
                "scc": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        cs = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        bs = t["bucket_id"].combine_chunks().to_numpy(zero_copy_only=False)
        cc = t["c"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((uu, bs, cs))
        c2, b2, u2 = cs[order], bs[order], uu[order]
        n = len(order)
        # exact per-(src, bucket, user) totals (all of a user's partials
        # are in this partition)
        newu = np.empty(n, dtype=bool)
        newu[0] = True
        newu[1:] = (c2[1:] != c2[:-1]) | (b2[1:] != b2[:-1]) | (u2[1:] != u2[:-1])
        su = np.flatnonzero(newu)
        cu = np.add.reduceat(cc[order], su)
        # immediately re-reduce to per-(src, bucket) partials
        cg, bg = c2[su], b2[su]
        newg = np.empty(len(su), dtype=bool)
        newg[0] = True
        newg[1:] = (cg[1:] != cg[:-1]) | (bg[1:] != bg[:-1])
        sg = np.flatnonzero(newg)
        counts = np.diff(np.append(sg, len(su)))
        return pa.table(
            {
                "src": pa.array(cg[sg], pa.int64()),
                "bucket_id": pa.array(bg[sg], pa.int64()),
                "n": pa.array(np.add.reduceat(cu, sg).astype(np.int64)),
                "nu": pa.array(counts.astype(np.int64)),
                "scc": pa.array(
                    np.add.reduceat(cu * (cu - 1), sg).astype(np.int64)
                ),
            }
        )

    def final_merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "bucket_ts": pa.array([], pa.timestamp("us")),
                    "n": pa.array([], pa.int64()),
                    "n_users": pa.array([], pa.int64()),
                    "sum_cc": pa.array([], pa.int64()),
                }
            )
        cs = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        bs = t["bucket_id"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((bs, cs))
        c2, b2 = cs[order], bs[order]
        newg = np.empty(len(order), dtype=bool)
        newg[0] = True
        newg[1:] = (c2[1:] != c2[:-1]) | (b2[1:] != b2[:-1])
        starts = np.flatnonzero(newg)
        out = {"source": pc.take(srcs, pa.array(c2[starts], pa.int64()))}
        out["bucket_ts"] = pa.array(b2[starts] * tier_us, pa.int64()).cast(
            pa.timestamp("us")
        )
        for name, col in (("n", "n"), ("n_users", "nu"), ("sum_cc", "scc")):
            v = t[col].combine_chunks().to_numpy(zero_copy_only=False)[order]
            out[name] = pa.array(np.add.reduceat(v, starts).astype(np.int64))
        return pa.table(out)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    per_bucket = hash_partition_merge(
        partials, "user_id", user_fold, k=_adaptive_k(sf_dir)
    )
    return hash_partition_merge(
        per_bucket, "bucket_id", final_merge, k=_adaptive_k(sf_dir)
    )


def events_interarrival_hist(
    sf_dir: str, window_us: int = TEMPORAL_WINDOW_US
) -> Dataset:
    """E39: per-source log2-binned inter-arrival histogram — for each
    source, how many consecutive-event gaps fall in [2^(b-1), 2^b) exact
    integer microseconds (bin 0 = zero-length gaps).  The latency/liveness
    distribution behind burstiness and Poisson-ness diagnostics; E32's
    max-gap is this histogram's top occupied bin.  Gaps are differences in
    (ts, event_id) order, an order-dependent scan over unbounded per-source
    history: rows partition by (source, ts-window), the shared
    :func:`_last_event_carries` supplies each window's predecessor, and the
    per-partition kernel bins its gaps locally — only (src, bin, n)
    partials (<= 64 bins/source) reach the k=1 merge.  The bin index is a
    pure bit-length (np.frexp exponent; exact for gaps < 2^53 us ~ 285
    years), so the floor(log2)+1 DuckDB oracle is bit-exact.
    Output (source, gap_bin, n_gaps)."""
    from ..stages.shuffle import hash_partition_merge, shuffle_parts
    from ..stages.temporal import _kw_partition

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def narrow(b: pa.Table) -> pa.Table:
        ts_us = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "k": pc.cast(
                    pc.index_in(b["event_type"], value_set=srcs), pa.int64()
                ),
                "t": pa.array(ts_us, pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
                "v": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
                "carry": pa.array(np.zeros(b.num_rows, dtype=bool)),
                "w": pa.array(ts_us // window_us, pa.int64()),
            }
        )

    tagged = ds.map_batches(narrow, batch_format="pyarrow")
    carries = _last_event_carries(tagged)
    full = tagged.union(carries.map_batches(_tag_carry, batch_format="pyarrow"))

    def kernel(t_: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "src": pa.array([], pa.int64()),
                "gap_bin": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if t_.num_rows == 0:
            return empty
        kk = t_["k"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t_["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t_["o"].combine_chunks().to_numpy(zero_copy_only=False)
        cr = t_["carry"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cr, oo, tt, kk))
        ks, ts_, crs = kk[order], tt[order], cr[order]
        n = len(order)
        has_prev = np.empty(n, dtype=bool)
        has_prev[0] = False
        has_prev[1:] = ks[1:] == ks[:-1]
        pt = np.empty(n, dtype=np.int64)
        pt[0] = 0
        pt[1:] = ts_[:-1]
        sel = has_prev & ~crs
        if not sel.any():
            return empty
        gaps = ts_[sel] - pt[sel]
        # bit-length bin: frexp's exponent e satisfies g = m * 2^e with
        # 0.5 <= m < 1, so e == floor(log2(g)) + 1 for g > 0 and frexp(0)
        # yields 0 — exact while gaps < 2^53 us
        bins = np.frexp(gaps.astype(np.float64))[1].astype(np.int64)
        pack = ks[sel] * 64 + bins
        u, cnt = np.unique(pack, return_counts=True)
        return pa.table(
            {
                "src": pa.array(u // 64, pa.int64()),
                "gap_bin": pa.array(u % 64, pa.int64()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    partials = _kw_partition(full, kernel, shuffle_parts(_adaptive_k(sf_dir)))

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "gap_bin": pa.array([], pa.int64()),
                    "n_gaps": pa.array([], pa.int64()),
                }
            )
        ss = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        bb = t["gap_bin"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((bb, ss))
        s2, b2 = ss[order], bb[order]
        newg = np.empty(len(order), dtype=bool)
        newg[0] = True
        newg[1:] = (s2[1:] != s2[:-1]) | (b2[1:] != b2[:-1])
        starts = np.flatnonzero(newg)
        return pa.table(
            {
                "source": pc.take(srcs, pa.array(s2[starts], pa.int64())),
                "gap_bin": pa.array(b2[starts], pa.int64()),
                "n_gaps": pa.array(
                    np.add.reduceat(nn[order], starts).astype(np.int64)
                ),
            }
        )

    return hash_partition_merge(partials, "src", merge, k=1)


def events_holt_1m(
    sf_dir: str, alpha: float = 0.2, beta: float = 0.1,
    window_buckets: int = 4096,
) -> Dataset:
    """E40: Holt linear-trend (double exponential) smoothing of the
    per-minute event count over the dense gap-filled grid — the
    trend-aware forecasting baseline (PromQL holt_winters) one step up
    from E34's plain EWMA: ``level`` tracks the smoothed count, ``trend``
    its smoothed slope, so level + h*trend is the h-minute-ahead
    forecast.  A 2x2 affine recurrence, distributed by eigen-decoupling
    into two scalar prefix scans on grid_ewma's machinery (see
    stages/temporal.grid_holt); float output, rows-only driver entry —
    exactness vs the serial recurrence is pinned to rounding by
    tests/test_wave7_ops.py.  Output (source, bucket_ts, count, level,
    trend)."""
    from ..stages.temporal import grid_holt

    grid = events_gapfill(sf_dir, "1m").select_columns(
        ["source", "bucket_ts", "count"]
    )
    return grid_holt(
        grid, "1m", "count", alpha=alpha, beta=beta, t0_us=EVENTS_T0_US,
        window_buckets=window_buckets,
    )


def events_source_corr(sf_dir: str) -> Dataset:
    """E41: pairwise cross-source correlation sufficient statistics of the
    per-minute event counts — "which feeds move together" (the fleet-level
    incident-correlation primitive of a monitoring stack).  For every
    ordered source pair a < b, over the GLOBAL dense minute grid
    [min bucket, max bucket] with absent minutes = 0: n_buckets, Σa, Σb,
    Σa·b, Σa², Σb² — the six exact-int64 sufficient statistics from which
    Pearson r follows off-line.  Emitting statistics (not the float) keeps
    the DuckDB oracle (self-join on bucket + SUMs) bit-exact.

    Scale shape — zeros contribute nothing to any Σ, so the dense grid is
    never materialized: the job runs on ROLLED points only (the
    grid_cumsum bound).  One bucket-hash exchange co-locates each minute's
    ≤k_src rows, every partition scatters its minutes into a (minutes ×
    k_src) int64 matrix and emits ONE k_src×k_src partial Gram + column
    sums + bucket bounds (O(k_src²) rows per partition, never minutes),
    and a k=1 merge sums the tiny Grams.  Sources are the low-cardinality
    axis by construction (reference routing keys), so k_src² stays
    driver-safe at any row scale."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    k_src = len(srcs)
    step = 60 * 1_000_000

    rolled = events_rollup(sf_dir, "1m").select_columns(
        ["source", "bucket_ts", "count"]
    )

    def to_int(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bkt": b["bucket_ts"].cast(pa.int64()),
                "code": pc.cast(
                    pc.index_in(b["source"], value_set=srcs), pa.int64()
                ),
                "c": b["count"],
            }
        )

    PART_COLS = ("ia", "ib", "v")

    def _empty_partial() -> pa.Table:
        return pa.table({c: pa.array([], pa.int64()) for c in PART_COLS})

    def gram_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_partial()
        bkt = t["bkt"].combine_chunks().to_numpy(zero_copy_only=False)
        code = t["code"].combine_chunks().to_numpy(zero_copy_only=False)
        c = t["c"].combine_chunks().to_numpy(zero_copy_only=False)
        u, inv = np.unique(bkt, return_inverse=True)
        C = np.zeros((len(u), k_src), dtype=np.int64)
        C[inv, code] = c  # (bucket, source) unique post-rollup
        G = C.T @ C
        ia, ib = np.triu_indices(k_src)
        out_ia = np.concatenate([ia, np.arange(k_src), [-2, -3]])
        out_ib = np.concatenate(
            [ib, np.full(k_src, -1, np.int64), [-2, -3]]
        )
        out_v = np.concatenate(
            [G[ia, ib], C.sum(axis=0), [u.min(), u.max()]]
        )
        return pa.table(
            {
                "ia": pa.array(out_ia, pa.int64()),
                "ib": pa.array(out_ib, pa.int64()),
                "v": pa.array(out_v, pa.int64()),
            }
        )

    keyed = rolled.map_batches(to_int, batch_format="pyarrow")
    partials = hash_partition_merge(
        keyed, "bkt", gram_partial, k=_adaptive_k(sf_dir)
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "src_a": pa.array([], pa.string()),
                    "src_b": pa.array([], pa.string()),
                    **{
                        c: pa.array([], pa.int64())
                        for c in (
                            "n_buckets", "s_a", "s_b", "s_ab", "s_aa", "s_bb"
                        )
                    },
                }
            )
        ia = t["ia"].combine_chunks().to_numpy(zero_copy_only=False)
        ib = t["ib"].combine_chunks().to_numpy(zero_copy_only=False)
        v = t["v"].combine_chunks().to_numpy(zero_copy_only=False)
        lo = v[ia == -2].min()
        hi = v[ia == -3].max()
        n_buckets = (hi - lo) // step + 1
        gram = np.zeros((k_src, k_src), dtype=np.int64)
        colsum = np.zeros(k_src, dtype=np.int64)
        pair = ia >= 0
        np.add.at(gram, (ia[pair & (ib >= 0)], ib[pair & (ib >= 0)]),
                  v[pair & (ib >= 0)])
        np.add.at(colsum, ia[pair & (ib == -1)], v[pair & (ib == -1)])
        a, b = np.triu_indices(k_src, k=1)
        return pa.table(
            {
                "src_a": pc.take(srcs, pa.array(a, pa.int64())),
                "src_b": pc.take(srcs, pa.array(b, pa.int64())),
                "n_buckets": pa.array(
                    np.full(len(a), n_buckets, np.int64)
                ),
                "s_a": pa.array(colsum[a]),
                "s_b": pa.array(colsum[b]),
                "s_ab": pa.array(gram[a, b]),
                "s_aa": pa.array(gram[a, a]),
                "s_bb": pa.array(gram[b, b]),
            }
        )

    return hash_partition_merge(partials, "ia", finish, k=1)


def _grid_value_partial(b: pa.Table, srcs: pa.Array) -> pa.Table:
    """Per-batch (source-code, count-value) FREQUENCY partial with
    per-source bucket bounds — the shared E42/E48 histogram combiner.
    The minute axis collapses here; zeros re-enter downstream as
    grid_len − Σfreq."""
    if b.num_rows == 0:
        return pa.table(
            {
                c: pa.array([], pa.int64())
                for c in ("code", "value", "freq", "lo", "hi")
            }
        )
    code = pc.cast(
        pc.index_in(b["source"], value_set=srcs), pa.int64()
    ).combine_chunks().to_numpy(zero_copy_only=False)
    bkt = b["bucket_ts"].cast(pa.int64()).combine_chunks().to_numpy(
        zero_copy_only=False
    )
    c = b["count"].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.lexsort((c, code))
    co, cv = code[order], c[order]
    new = np.empty(len(co), dtype=bool)
    new[0] = True
    new[1:] = (co[1:] != co[:-1]) | (cv[1:] != cv[:-1])
    starts = np.flatnonzero(new)
    freq = np.diff(np.append(starts, len(co)))
    # per-code bucket bounds mapped onto the histogram rows
    bo = bkt[order]
    newc = np.empty(len(co), dtype=bool)
    newc[0] = True
    newc[1:] = co[1:] != co[:-1]
    cstarts = np.flatnonzero(newc)
    cid = np.cumsum(newc) - 1
    lo_c = np.minimum.reduceat(bo, cstarts)
    hi_c = np.maximum.reduceat(bo, cstarts)
    return pa.table(
        {
            "code": pa.array(co[starts], pa.int64()),
            "value": pa.array(cv[starts], pa.int64()),
            "freq": pa.array(freq, pa.int64()),
            "lo": pa.array(lo_c[cid[starts]], pa.int64()),
            "hi": pa.array(hi_c[cid[starts]], pa.int64()),
        }
    )


def _merged_histograms(t: pa.Table, step: int):
    """Iterate (code, values, freqs, grid_len) per source from merged
    _grid_value_partial rows, zero bucket re-entered — shared E42/E48."""
    code = t["code"].combine_chunks().to_numpy(zero_copy_only=False)
    value = t["value"].combine_chunks().to_numpy(zero_copy_only=False)
    freq = t["freq"].combine_chunks().to_numpy(zero_copy_only=False)
    lo = t["lo"].combine_chunks().to_numpy(zero_copy_only=False)
    hi = t["hi"].combine_chunks().to_numpy(zero_copy_only=False)
    for cd in np.unique(code):
        m = code == cd
        vals, inv = np.unique(value[m], return_inverse=True)
        fr = np.zeros(len(vals), dtype=np.int64)
        np.add.at(fr, inv, freq[m])
        grid_len = (hi[m].max() - lo[m].min()) // step + 1
        zeros = grid_len - fr.sum()
        if zeros > 0:
            vals = np.concatenate(([0], vals))
            fr = np.concatenate(([zeros], fr))
        yield int(cd), vals, fr, int(grid_len)


def events_mad_anomaly_1m(
    sf_dir: str, k_sigma: int = 4, *, rolled: Dataset | None = None
) -> Dataset:
    """E42: per-source robust anomaly summary over the dense minute grid —
    the median/MAD outlier rule every alerting stack runs (robust to the
    very bursts it is hunting, unlike mean/stddev).  Per source: med =
    discrete median of the per-minute counts, mad = discrete median of
    |count − med|, n_anom = # minutes with |count − med| > k_sigma·mad.
    All exact int64 under the repo's quantile_disc rank rule (smallest
    value whose cumulative count ≥ ceil(q·n)), so the DuckDB
    quantile_disc oracle matches bit-for-bit.

    Scale shape — the dense grid is never materialized: the minute axis is
    collapsed per batch into (source, value) FREQUENCY partials (plus
    per-source bucket bounds), zeros re-enter arithmetically as
    grid_len − Σfreq, and both medians + the anomaly count are read off
    the merged histogram in one k=1 exchange.  Rows moved =
    O(batches × distinct count values), never minutes; count values are
    the long-tailed-but-small axis of a rollup, so the histogram stays
    tiny at any row scale.

    ``rolled`` lets a caller share an already-built (source, bucket_ts,
    count) rollup (the cascade's shared-tier convention) — E44 threads its
    materialized 1m tier through to avoid rolling the raw table twice."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    step = 60 * 1_000_000

    if rolled is None:
        rolled = events_rollup(sf_dir, "1m").select_columns(
            ["source", "bucket_ts", "count"]
        )

    def partial(b: pa.Table) -> pa.Table:
        return _grid_value_partial(b, srcs)

    def _disc(values: np.ndarray, freqs: np.ndarray, n: int) -> int:
        """Smallest value whose cumulative freq >= ceil(n/2) — the repo's
        quantile_disc rank rule at q=0.5 (events.py _disc_quantile_runs)."""
        thr = (n * 500 + 999) // 1000
        cum = np.cumsum(freqs)
        return int(values[np.searchsorted(cum, thr)])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{
                        c: pa.array([], pa.int64())
                        for c in ("med", "mad", "n_anom")
                    },
                }
            )
        out_code, out_med, out_mad, out_anom = [], [], [], []
        for cd, vals, fr, grid_len in _merged_histograms(t, step):
            med = _disc(vals, fr, grid_len)
            dev = np.abs(vals - med)
            dorder = np.argsort(dev, kind="stable")
            dv, di = np.unique(dev[dorder], return_inverse=True)
            df = np.zeros(len(dv), dtype=np.int64)
            np.add.at(df, di, fr[dorder])
            mad = _disc(dv, df, grid_len)
            n_anom = int(df[dv > k_sigma * mad].sum())
            out_code.append(cd)
            out_med.append(med)
            out_mad.append(mad)
            out_anom.append(n_anom)
        return pa.table(
            {
                "source": pc.take(srcs, pa.array(out_code, pa.int64())),
                "med": pa.array(out_med, pa.int64()),
                "mad": pa.array(out_mad, pa.int64()),
                "n_anom": pa.array(out_anom, pa.int64()),
            }
        )

    partials = rolled.map_batches(partial, batch_format="pyarrow")
    return hash_partition_merge(partials, "code", merge, k=1)


def _streak_stats(
    rolled: Dataset,
    srcs: pa.Array,
    k: int,
    window_buckets: int,
    names: tuple[str, str, str],
) -> Dataset:
    """Shared gaps-and-islands kernel behind E43/E46: per-source (longest
    run, run count, total rows) over the integer minute indices of the
    (source, bucket_ts) ``rolled`` rows.  One (source, minute-window) hash
    exchange co-locates each window's present buckets, every window
    collapses to ONE constant-size run summary (n_runs, first/last bucket
    idx, first/last run length, max interior run, total), and a k=1 merge
    folds each source's summaries in idx order with the associative
    adjacency rule (runs join iff left.last_idx + 1 == right.first_idx).
    Rows moved after the first exchange = O(sources × windows), never
    minutes — the grid_cusum driver-fold bound, here inside one task."""
    from ..stages.shuffle import hash_partition_merge

    step = 60 * 1_000_000

    def key(b: pa.Table) -> pa.Table:
        idx = (
            b["bucket_ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            - EVENTS_T0_US
        ) // step
        code = pc.cast(
            pc.index_in(b["source"], value_set=srcs), pa.int64()
        ).combine_chunks().to_numpy(zero_copy_only=False)
        win = idx // window_buckets
        return pa.table(
            {
                "code": pa.array(code, pa.int64()),
                "idx": pa.array(idx, pa.int64()),
                "kw": pa.array(code * (1 << 40) + win, pa.int64()),
            }
        )

    SUMM = ("code", "first_idx", "last_idx", "first_len", "last_len",
            "mid_max", "n_runs", "busy")

    def summarize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in SUMM})
        code = t["code"].combine_chunks().to_numpy(zero_copy_only=False)
        idx = t["idx"].combine_chunks().to_numpy(zero_copy_only=False)
        kw = t["kw"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((idx, kw))
        k2, i2 = kw[order], idx[order]
        c2 = code[order]
        # run break: window change or idx jump
        newr = np.empty(len(order), dtype=bool)
        newr[0] = True
        newr[1:] = (k2[1:] != k2[:-1]) | (i2[1:] != i2[:-1] + 1)
        rstarts = np.flatnonzero(newr)
        rlen = np.diff(np.append(rstarts, len(order)))
        # group runs per (code, window)
        rk = k2[rstarts]
        neww = np.empty(len(rk), dtype=bool)
        neww[0] = True
        neww[1:] = rk[1:] != rk[:-1]
        wstarts = np.flatnonzero(neww)
        wends = np.append(wstarts[1:], len(rk))
        n_runs = wends - wstarts
        first_len = rlen[wstarts]
        last_len = rlen[wends - 1]
        first_idx = i2[rstarts[wstarts]]
        last_idx = i2[rstarts[wends - 1]] + rlen[wends - 1] - 1
        busy = np.add.reduceat(rlen, wstarts)
        # max over interior runs (exclude first and last of each window)
        mid_max = np.zeros(len(wstarts), dtype=np.int64)
        for j in range(len(wstarts)):
            if n_runs[j] > 2:
                mid_max[j] = rlen[wstarts[j] + 1 : wends[j] - 1].max()
        return pa.table(
            {
                "code": pa.array(c2[rstarts[wstarts]], pa.int64()),
                "first_idx": pa.array(first_idx, pa.int64()),
                "last_idx": pa.array(last_idx, pa.int64()),
                "first_len": pa.array(first_len, pa.int64()),
                "last_len": pa.array(last_len, pa.int64()),
                "mid_max": pa.array(mid_max, pa.int64()),
                "n_runs": pa.array(n_runs, pa.int64()),
                "busy": pa.array(busy, pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in names},
                }
            )
        cols = {
            c: t[c].combine_chunks().to_numpy(zero_copy_only=False)
            for c in SUMM
        }
        order = np.lexsort((cols["first_idx"], cols["code"]))
        out_code, out_mx, out_n, out_busy = [], [], [], []
        i = 0
        n = len(order)
        while i < n:
            j = order[i]
            cd = cols["code"][j]
            # state: closed-run max mx, open last-run length L, last idx
            mx = max(cols["mid_max"][j],
                     cols["first_len"][j] if cols["n_runs"][j] > 1 else 0)
            L = cols["last_len"][j]
            if cols["n_runs"][j] == 1:
                L = cols["first_len"][j]
            last = cols["last_idx"][j]
            nr = cols["n_runs"][j]
            busy = cols["busy"][j]
            i += 1
            while i < n and cols["code"][order[i]] == cd:
                j = order[i]
                adj = last + 1 == cols["first_idx"][j]
                if cols["n_runs"][j] == 1:
                    if adj:
                        L += cols["first_len"][j]
                    else:
                        mx = max(mx, L)
                        L = cols["first_len"][j]
                        nr += 1
                else:
                    if adj:
                        mx = max(mx, L + cols["first_len"][j],
                                 cols["mid_max"][j])
                        nr += cols["n_runs"][j] - 1
                    else:
                        mx = max(mx, L, cols["first_len"][j],
                                 cols["mid_max"][j])
                        nr += cols["n_runs"][j]
                    L = cols["last_len"][j]
                last = cols["last_idx"][j]
                busy += cols["busy"][j]
                i += 1
            out_code.append(int(cd))
            out_mx.append(int(max(mx, L)))
            out_n.append(int(nr))
            out_busy.append(int(busy))
        return pa.table(
            {
                "source": pc.take(srcs, pa.array(out_code, pa.int64())),
                names[0]: pa.array(out_mx, pa.int64()),
                names[1]: pa.array(out_n, pa.int64()),
                names[2]: pa.array(out_busy, pa.int64()),
            }
        )

    keyed = rolled.map_batches(key, batch_format="pyarrow")
    summaries = hash_partition_merge(keyed, "kw", summarize, k=k)
    return hash_partition_merge(summaries, "code", fold, k=1)


def events_busy_streaks(
    sf_dir: str, window_buckets: int = 4096
) -> Dataset:
    """E43: per-source busy-streak statistics — the longest run of
    CONSECUTIVE minutes with ≥1 event, the number of such runs, and the
    total busy minutes ("how long did the burst last / how fragmented is
    this feed's activity").  Exact int64; the DuckDB oracle is the classic
    gaps-and-islands window query (bucket − row_number islands).  Scale
    shape: :func:`_streak_stats` over ROLLED points (present minutes)."""
    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    rolled = events_rollup(sf_dir, "1m").select_columns(
        ["source", "bucket_ts"]
    )
    return _streak_stats(
        rolled, srcs, _adaptive_k(sf_dir), window_buckets,
        ("max_streak", "n_streaks", "n_busy"),
    )


def events_alert_episodes(
    sf_dir: str, window_buckets: int = 4096
) -> Dataset:
    """E46: per-source alert-episode statistics — the longest run of
    CONSECUTIVE minutes with count strictly above the source's robust
    median (the E42 med), the number of such episodes, and the total hot
    minutes — "how long did the alert stay firing, and how often did it
    flap".  Exact int64; the DuckDB oracle filters the rollup on the
    quantile_disc median and runs the gaps-and-islands window.

    Scale shape — med comes from E42's histogram merge over a SHARED
    materialized 1m rollup (O(sources) rows, ray.put broadcast); hot
    minutes have count > med ≥ 0 so they are a FILTER of rolled points
    (zero minutes can never be hot — the dense grid never materializes),
    and the filtered set rides :func:`_streak_stats`' summary/fold
    machinery unchanged."""
    import ray

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())

    m1 = rollup(
        events_assigned(sf_dir), "1m", t0_us=EVENTS_T0_US
    ).materialize()
    med_t = pa.concat_tables(
        list(
            events_mad_anomaly_1m(
                sf_dir,
                rolled=m1.select_columns(["source", "bucket_ts", "count"]),
            )
            .select_columns(["source", "med"])
            .iter_batches(batch_format="pyarrow")
        )
    )
    med = np.zeros(len(srcs), dtype=np.int64)
    codes = pc.cast(
        pc.index_in(med_t["source"], value_set=srcs), pa.int64()
    ).combine_chunks().to_numpy(zero_copy_only=False)
    med[codes] = med_t["med"].combine_chunks().to_numpy(zero_copy_only=False)
    med_ref = ray.put(med)

    def hot_only(b: pa.Table) -> pa.Table:
        mv = ray.get(med_ref)
        code = pc.cast(
            pc.index_in(b["source"], value_set=srcs), pa.int64()
        ).combine_chunks().to_numpy(zero_copy_only=False)
        c = b["count"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = pa.array(c > mv[code])
        return b.select(["source", "bucket_ts"]).filter(keep)

    hot = m1.select_columns(["source", "bucket_ts", "count"]).map_batches(
        hot_only, batch_format="pyarrow"
    )
    return _streak_stats(
        hot, srcs, _adaptive_k(sf_dir), window_buckets,
        ("max_episode", "n_episodes", "n_hot"),
    )


def events_top_anomalies(sf_dir: str, kk: int = 3) -> Dataset:
    """E44: per-source top-k most anomalous minutes — the ranked
    "worst minutes" view an on-call dashboard shows, scored by the E42
    robust deviation dev = |count − med| over the dense grid (med = the
    source's discrete median minute count) and ranked (dev DESC, bucket
    ASC).  Exact int64; the DuckDB oracle is quantile_disc + a
    row_number window.  Output (source, bucket_ts, dev, rank).

    Scale shape — a composition of two existing scale-safe stages: the
    1m rollup is materialized ONCE (rolled points, the sanctioned bound)
    and shared by both passes, the E42 histogram merge yields one med per
    source (O(sources) rows, broadcast via ray.put), a stateless map
    scores the gap-filled grid, and stages/shuffle.grouped_topk keeps ≤kk
    candidates per source in its per-batch combiner, so only
    O(batches × sources × kk) candidate rows ever shuffle."""
    import ray

    from ..stages.shuffle import grouped_topk

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    step = 60 * 1_000_000

    m1 = rollup(
        events_assigned(sf_dir), "1m", t0_us=EVENTS_T0_US
    ).materialize()
    med_t = pa.concat_tables(
        list(
            events_mad_anomaly_1m(
                sf_dir,
                rolled=m1.select_columns(["source", "bucket_ts", "count"]),
            )
            .select_columns(["source", "med"])
            .iter_batches(batch_format="pyarrow")
        )
    )
    med = np.zeros(len(srcs), dtype=np.int64)
    codes = pc.cast(
        pc.index_in(med_t["source"], value_set=srcs), pa.int64()
    ).combine_chunks().to_numpy(zero_copy_only=False)
    med[codes] = med_t["med"].combine_chunks().to_numpy(zero_copy_only=False)
    med_ref = ray.put(med)

    def score(b: pa.Table) -> pa.Table:
        mv = ray.get(med_ref)
        code = pc.cast(
            pc.index_in(b["source"], value_set=srcs), pa.int64()
        ).combine_chunks().to_numpy(zero_copy_only=False)
        idx = (
            b["bucket_ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            - EVENTS_T0_US
        ) // step
        c = b["count"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "code": pa.array(code, pa.int64()),
                "dev": pa.array(np.abs(c - mv[code]), pa.int64()),
                "idx": pa.array(idx, pa.int64()),
            }
        )

    grid = gap_fill(m1, "1m").select_columns(
        ["source", "bucket_ts", "count"]
    )
    top = grouped_topk(
        grid.map_batches(score, batch_format="pyarrow"),
        key="code", value="dev", order_id="idx", kk=kk,
    )

    def finish(b: pa.Table) -> pa.Table:
        idx = b["idx"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": pc.take(srcs, b["code"]),
                "bucket_ts": pa.array(
                    idx * step + EVENTS_T0_US, pa.int64()
                ).cast(pa.timestamp("us")),
                "dev": b["dev"],
                "rank": b["rank"],
            }
        )

    return top.map_batches(finish, batch_format="pyarrow")


def events_leadlag_corr(sf_dir: str) -> Dataset:
    """E45: lag-1 lead/lag cross-product matrix — for every ORDERED source
    pair (a, b), Σ_t c_a(t)·c_b(t+1) over the global dense minute grid
    (absent minutes = 0), the directional "does a lead b by one minute"
    statistic (asymmetric, unlike E41's contemporaneous Gram; the diagonal
    is each source's lag-1 autocovariance cross term, tying out to E31).
    Exact int64; DuckDB oracle = self-join on b + 1 minute.

    Scale shape — E41's zero-vanishing trick with a ROLE axis: each rolled
    row ships twice, once as the "current" vector at its own minute and
    once as the "next" vector keyed to the PREVIOUS minute, so one
    bucket-hash exchange co-locates u(t) = counts at t and v(t) = counts
    at t+1; each partition accumulates Σ outer(u, v) — ONE k_src×k_src
    int64 partial per partition, never minutes — and a k=1 merge sums the
    tiny matrices."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    k_src = len(srcs)

    rolled = events_rollup(sf_dir, "1m").select_columns(
        ["source", "bucket_ts", "count"]
    )

    def two_roles(b: pa.Table) -> pa.Table:
        bkt = b["bucket_ts"].cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        ) // (60 * 1_000_000)
        code = pc.cast(
            pc.index_in(b["source"], value_set=srcs), pa.int64()
        ).combine_chunks().to_numpy(zero_copy_only=False)
        c = b["count"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": pa.array(np.concatenate([bkt, bkt - 1]), pa.int64()),
                "role": pa.array(
                    np.repeat([0, 1], len(bkt)), pa.int64()
                ),
                "code": pa.array(np.concatenate([code, code]), pa.int64()),
                "c": pa.array(np.concatenate([c, c]), pa.int64()),
            }
        )

    def outer_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {c: pa.array([], pa.int64()) for c in ("ia", "ib", "v")}
            )
        key = t["key"].combine_chunks().to_numpy(zero_copy_only=False)
        role = t["role"].combine_chunks().to_numpy(zero_copy_only=False)
        code = t["code"].combine_chunks().to_numpy(zero_copy_only=False)
        c = t["c"].combine_chunks().to_numpy(zero_copy_only=False)
        u, inv = np.unique(key, return_inverse=True)
        U = np.zeros((len(u), k_src), dtype=np.int64)  # current at t
        V = np.zeros((len(u), k_src), dtype=np.int64)  # next at t+1
        cur = role == 0
        U[inv[cur], code[cur]] = c[cur]
        V[inv[~cur], code[~cur]] = c[~cur]
        M = U.T @ V
        ia, ib = np.divmod(np.arange(k_src * k_src), k_src)
        return pa.table(
            {
                "ia": pa.array(ia, pa.int64()),
                "ib": pa.array(ib, pa.int64()),
                "v": pa.array(M.ravel(), pa.int64()),
            }
        )

    keyed = rolled.map_batches(two_roles, batch_format="pyarrow")
    partials = hash_partition_merge(
        keyed, "key", outer_partial, k=_adaptive_k(sf_dir)
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "src_a": pa.array([], pa.string()),
                    "src_b": pa.array([], pa.string()),
                    "s_ab_lag1": pa.array([], pa.int64()),
                }
            )
        ia = t["ia"].combine_chunks().to_numpy(zero_copy_only=False)
        ib = t["ib"].combine_chunks().to_numpy(zero_copy_only=False)
        v = t["v"].combine_chunks().to_numpy(zero_copy_only=False)
        M = np.zeros((k_src, k_src), dtype=np.int64)
        np.add.at(M, (ia, ib), v)
        a, b = np.divmod(np.arange(k_src * k_src), k_src)
        return pa.table(
            {
                "src_a": pc.take(srcs, pa.array(a, pa.int64())),
                "src_b": pc.take(srcs, pa.array(b, pa.int64())),
                "s_ab_lag1": pa.array(M.ravel(), pa.int64()),
            }
        )

    return hash_partition_merge(partials, "ia", finish, k=1)


def events_grid_quantiles(
    sf_dir: str, qs: tuple[int, ...] = (500, 900, 990)
) -> Dataset:
    """E48: per-source discrete quantiles (p50/p90/p99 permille) of the
    per-minute event count over the dense grid — the capacity-planning
    view ("what does a busy minute look like for this feed").  Exact
    int64 under the repo's quantile_disc rank rule (smallest value whose
    cumulative count ≥ ceil(q·n)); DuckDB quantile_disc oracle.

    Scale shape — E42's shared histogram machinery verbatim
    (:func:`_grid_value_partial` per batch, zeros re-entering as
    grid_len − Σfreq in :func:`_merged_histograms`); all three quantiles
    read off the one merged histogram in the same k=1 exchange.  Rows
    moved = O(batches × distinct count values), never minutes."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    step = 60 * 1_000_000

    rolled = events_rollup(sf_dir, "1m").select_columns(
        ["source", "bucket_ts", "count"]
    )
    names = tuple(f"p{q // 10}" for q in qs)

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in names},
                }
            )
        out_code = []
        out_q: dict[str, list[int]] = {c: [] for c in names}
        for cd, vals, fr, grid_len in _merged_histograms(t, step):
            cum = np.cumsum(fr)
            for q, c in zip(qs, names):
                thr = (grid_len * q + 999) // 1000
                out_q[c].append(int(vals[np.searchsorted(cum, thr)]))
            out_code.append(cd)
        return pa.table(
            {
                "source": pc.take(srcs, pa.array(out_code, pa.int64())),
                **{c: pa.array(out_q[c], pa.int64()) for c in names},
            }
        )

    partials = rolled.map_batches(
        lambda b: _grid_value_partial(b, srcs), batch_format="pyarrow"
    )
    return hash_partition_merge(partials, "code", merge, k=1)


def events_peak_minute_1h(sf_dir: str) -> Dataset:
    """E47: the peak minute of every (source, hour) — which minute carried
    the hour's highest event count (count DESC, earliest minute on ties);
    the drill-down from an hourly rollup to its hottest minute.  Exact
    int64; DuckDB oracle = row_number window at rn = 1.  Absent minutes
    (count 0) can never beat a present one (count ≥ 1) and hours with no
    events have no row, so the job runs on ROLLED points only.

    Scale shape — stages/shuffle.grouped_topk at kk = 1 keyed by the
    packed (source, hour) id: the per-batch combiner keeps one candidate
    per (source, hour) locally, so only O(batches × sources-per-hour)
    rows shuffle.  Output (source, hour_ts, bucket_ts, count)."""
    from ..stages.shuffle import grouped_topk

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    step = 60 * 1_000_000
    hour_us = 3600 * 1_000_000

    rolled = events_rollup(sf_dir, "1m").select_columns(
        ["source", "bucket_ts", "count"]
    )

    def key(b: pa.Table) -> pa.Table:
        bkt = b["bucket_ts"].cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        code = pc.cast(
            pc.index_in(b["source"], value_set=srcs), pa.int64()
        ).combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "kh": pa.array(
                    code * (1 << 40) + bkt // hour_us, pa.int64()
                ),
                "count": b["count"],
                "idx": pa.array(bkt // step, pa.int64()),
            }
        )

    top = grouped_topk(
        rolled.map_batches(key, batch_format="pyarrow"),
        key="kh", value="count", order_id="idx", kk=1,
    )

    def finish(b: pa.Table) -> pa.Table:
        kh = b["kh"].combine_chunks().to_numpy(zero_copy_only=False)
        idx = b["idx"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": pc.take(srcs, pa.array(kh >> 40, pa.int64())),
                "hour_ts": pa.array(
                    (kh & ((1 << 40) - 1)) * hour_us, pa.int64()
                ).cast(pa.timestamp("us")),
                "bucket_ts": pa.array(idx * step, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "count": b["count"],
            }
        )

    return top.map_batches(finish, batch_format="pyarrow")


DAY_US = 86_400_000_000


def events_retention_cohort(sf_dir: str) -> Dataset:
    """E49: cohort retention triangle — for every (cohort day = a user's
    first active day, day offset), the number of distinct users active on
    ``cohort + offset`` — the product-analytics retention curve over the
    reference's own event stream (the "do users come back" counterpart of
    E36's engagement histogram).  Exact int64; DuckDB oracle = distinct
    (user, day) pairs joined to each user's min day.

    Scale shape — E38's aggregate-of-aggregates keyed per user-day; both
    exchanges NARROWER than their inputs:
      1. per batch one lexsort reduces event rows to distinct
         (user_id, day) pairs — timestamps/payloads never shuffle;
      2. hash-partition by USER: each user's full day set is local, so the
         cohort (min day) and every (cohort, offset) membership are decided
         exactly in one task and immediately re-reduced to
         (cohort, offset, n) partials — per-user rows never leave their
         partition;
      3. one k=1 merge sums partials (output is the retention triangle
         itself, O(active-days²) rows regardless of corpus size)."""
    from ..stages.shuffle import hash_partition_merge

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        ts_us = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        )
        uu = (
            pc.cast(b["user_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        day = ts_us // DAY_US
        order = np.lexsort((day, uu))
        u2, d2 = uu[order], day[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = (u2[1:] != u2[:-1]) | (d2[1:] != d2[:-1])
        starts = np.flatnonzero(new)
        return pa.table(
            {
                "user_id": pa.array(u2[starts], pa.int64()),
                "day": pa.array(d2[starts], pa.int64()),
            }
        )

    def _empty() -> pa.Table:
        return pa.table(
            {
                "cohort": pa.array([], pa.int64()),
                "offset": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )

    def user_fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty()
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        dd = t["day"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((dd, uu))
        u2, d2 = uu[order], dd[order]
        # dedupe (user, day) across source batches
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = (u2[1:] != u2[:-1]) | (d2[1:] != d2[:-1])
        su = np.flatnonzero(new)
        u3, d3 = u2[su], d2[su]
        # cohort = each user's first (smallest) day — runs are user-sorted
        newu = np.empty(len(su), dtype=bool)
        newu[0] = True
        newu[1:] = u3[1:] != u3[:-1]
        ustart = np.flatnonzero(newu)
        runlen = np.diff(np.append(ustart, len(u3)))
        cohort = np.repeat(d3[ustart], runlen)
        off = d3 - cohort
        # reduce in place to (cohort, offset, n) partials
        o2 = np.lexsort((off, cohort))
        c2, f2 = cohort[o2], off[o2]
        ng = np.empty(len(o2), dtype=bool)
        ng[0] = True
        ng[1:] = (c2[1:] != c2[:-1]) | (f2[1:] != f2[:-1])
        gs = np.flatnonzero(ng)
        return pa.table(
            {
                "cohort": pa.array(c2[gs], pa.int64()),
                "offset": pa.array(f2[gs], pa.int64()),
                "n": pa.array(
                    np.diff(np.append(gs, len(o2))).astype(np.int64)
                ),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "cohort_ts": pa.array([], pa.timestamp("us")),
                    "day_offset": pa.array([], pa.int64()),
                    "n_users": pa.array([], pa.int64()),
                }
            )
        cc = t["cohort"].combine_chunks().to_numpy(zero_copy_only=False)
        ff = t["offset"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ff, cc))
        c2, f2 = cc[order], ff[order]
        ng = np.empty(len(order), dtype=bool)
        ng[0] = True
        ng[1:] = (c2[1:] != c2[:-1]) | (f2[1:] != f2[:-1])
        gs = np.flatnonzero(ng)
        return pa.table(
            {
                "cohort_ts": pa.array(c2[gs] * DAY_US, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "day_offset": pa.array(f2[gs], pa.int64()),
                "n_users": pa.array(
                    np.add.reduceat(nn[order], gs).astype(np.int64)
                ),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    per_user = hash_partition_merge(
        partials, "user_id", user_fold, k=_adaptive_k(sf_dir)
    )
    return hash_partition_merge(per_user, "cohort", merge, k=1)


def events_session_quantiles(
    sf_dir: str, gap_s: int = 6 * 3600, qs: tuple[int, ...] = (500, 900, 990)
) -> Dataset:
    """E50: corpus-wide session-duration distribution — n_sessions plus
    discrete p50/p90/p99 and max of session duration floored to whole
    seconds — "how long do users stay", the composition of E15's
    sessionizer with E22/E48's quantile machinery.  Exact int64 under the
    repo's quantile_disc rank rule; DuckDB oracle = the events_sessions
    gaps-and-islands CTE + quantile_disc over floor-second durations.

    Scale shape: sessions come off E15's (key, window)+fold machinery
    (already bounded); flooring durations to SECONDS bounds the value
    domain at the longest session, so per-batch (dur_s, freq) histogram
    partials — not session rows — are all that shuffles into the one k=1
    merge (the E42 zero-trick histogram convention, minus the zeros)."""
    from ..stages.shuffle import hash_partition_merge

    sess = events_sessions(sf_dir, gap_s=gap_s)

    def partial(b: pa.Table) -> pa.Table:
        st = (
            b["start_ts"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        en = (
            b["end_ts"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        dur = (en - st) // 1_000_000
        vals, freq = np.unique(dur, return_counts=True)
        return pa.table(
            {
                "g": pa.array(np.zeros(len(vals), np.int64)),
                "dur_s": pa.array(vals, pa.int64()),
                "f": pa.array(freq.astype(np.int64)),
            }
        )

    names = tuple(f"p{q // 10}_s" for q in qs)

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "n_sessions": pa.array([], pa.int64()),
                    **{c: pa.array([], pa.int64()) for c in names},
                    "max_s": pa.array([], pa.int64()),
                }
            )
        vv = t["dur_s"].combine_chunks().to_numpy(zero_copy_only=False)
        ff = t["f"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(vv, kind="stable")
        v2 = vv[order]
        ng = np.empty(len(order), dtype=bool)
        ng[0] = True
        ng[1:] = v2[1:] != v2[:-1]
        gs = np.flatnonzero(ng)
        vals = v2[gs]
        freq = np.add.reduceat(ff[order], gs)
        n = int(freq.sum())
        cum = np.cumsum(freq)
        out = {"n_sessions": pa.array([n], pa.int64())}
        for q, c in zip(qs, names):
            thr = (n * q + 999) // 1000
            out[c] = pa.array([int(vals[np.searchsorted(cum, thr)])], pa.int64())
        out["max_s"] = pa.array([int(vals[-1])], pa.int64())
        return pa.table(out)

    partials = sess.map_batches(partial, batch_format="pyarrow")
    return hash_partition_merge(partials, "g", merge, k=1)


def events_funnel(sf_dir: str, n_steps: int = 3) -> Dataset:
    """E51: ordered funnel conversion — with funnel steps defined as the
    ``n_steps`` alphabetically-first event types, the number of users whose
    FIRST occurrences happen in step order (first step-2 event at-or-after
    the first step-1 event, and so on) — the activation-funnel board of a
    product-analytics stack.  Cumulative: a user counts toward step s iff
    they completed steps 1..s in order.  Exact int64 on first-occurrence
    timestamps; DuckDB oracle = min(ts) per (user, step) + a CASE ladder.

    Scale shape — E38's aggregate-of-aggregates keyed per user:
      1. per batch, rows filter to the ≤ n_steps funnel types and one
         lexsort reduces them to (user, step, min_ts) partials;
      2. hash-partition by USER: each user's first-occurrence vector is
         decided exactly in one task and collapses to a funnel DEPTH,
         which re-reduces to ≤ n_steps (step, n) partials per partition;
      3. one k=1 merge sums partials → n_steps output rows.
    Step identity = exact broadcast rank over the tiny source domain."""
    from ..stages.shuffle import hash_partition_merge

    steps = pa.array(sorted(events_src_list(sf_dir))[:n_steps], pa.string())
    ns = len(steps)
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=steps), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        keep = ~np.isnan(code) if code.dtype.kind == "f" else code >= 0
        # index_in yields null (NaN after to_numpy float) for non-steps
        ts_us = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        )
        uu = (
            pc.cast(b["user_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        code, ts_us, uu = code[keep].astype(np.int64), ts_us[keep], uu[keep]
        if len(code) == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "step": pa.array([], pa.int64()),
                    "first_ts": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((ts_us, code, uu))
        u2, c2, t2 = uu[order], code[order], ts_us[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = (u2[1:] != u2[:-1]) | (c2[1:] != c2[:-1])
        starts = np.flatnonzero(new)
        return pa.table(
            {
                "user_id": pa.array(u2[starts], pa.int64()),
                "step": pa.array(c2[starts], pa.int64()),
                "first_ts": pa.array(t2[starts], pa.int64()),
            }
        )

    def user_fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "step": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        cc = t["step"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t["first_ts"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((tt, cc, uu))
        u2, c2, t2 = uu[order], cc[order], tt[order]
        # exact first ts per (user, step) — min is the run head
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = (u2[1:] != u2[:-1]) | (c2[1:] != c2[:-1])
        su = np.flatnonzero(new)
        u3, c3, t3 = u2[su], c2[su], t2[su]
        # scatter each user's first-occurrence vector into a dense
        # (n_local_users × n_steps) matrix; absent steps = sentinel
        newu = np.empty(len(su), dtype=bool)
        newu[0] = True
        newu[1:] = u3[1:] != u3[:-1]
        uid = np.cumsum(newu) - 1
        nloc = int(uid[-1]) + 1
        sentinel = np.iinfo(np.int64).max
        first = np.full((nloc, ns), sentinel, dtype=np.int64)
        first[uid, c3] = t3
        # funnel depth: steps completed in first-occurrence order
        ok = first[:, 0] != sentinel
        depth = ok.astype(np.int64)
        prev = first[:, 0]
        for s in range(1, ns):
            ok = ok & (first[:, s] != sentinel) & (first[:, s] >= prev)
            depth += ok
            prev = np.where(ok, first[:, s], prev)
        # cumulative: n users with depth >= s, for s = 1..ns
        counts = np.array(
            [(depth >= s).sum() for s in range(1, ns + 1)], dtype=np.int64
        )
        return pa.table(
            {
                "step": pa.array(np.arange(1, ns + 1, dtype=np.int64)),
                "n": pa.array(counts),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "step": pa.array([], pa.int64()),
                    "n_users": pa.array([], pa.int64()),
                }
            )
        ss = t["step"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(ss, kind="stable")
        s2 = ss[order]
        ng = np.empty(len(order), dtype=bool)
        ng[0] = True
        ng[1:] = s2[1:] != s2[:-1]
        gs = np.flatnonzero(ng)
        return pa.table(
            {
                "step": pa.array(s2[gs], pa.int64()),
                "n_users": pa.array(
                    np.add.reduceat(nn[order], gs).astype(np.int64)
                ),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    per_user = hash_partition_merge(
        partials, "user_id", user_fold, k=_adaptive_k(sf_dir)
    )
    # per-partition (step, n) partials carry no user key; constant-key
    # merge is fine — the table is O(partitions × n_steps) rows
    return hash_partition_merge(per_user, "step", merge, k=1)


HOUR_US = 3_600_000_000


def events_dow_profile(sf_dir: str) -> Dataset:
    """E52: day-of-week × hour-of-day traffic profile — for every
    (source, isodow, hour): total event count and EXACT distinct users —
    the weekly capacity heatmap behind "when are we busy and who shows
    up" staffing/provisioning decisions (E35's seasonal minute profile on
    the weekly axis, with E23's exact-cardinality column riding along).
    isodow is 1=Monday..7=Sunday, computed calendar-free from the epoch
    (1970-01-01 is a Thursday: ``isodow = ((days + 3) % 7) + 1``), so the
    engine and DuckDB's ``isodow(ts)`` agree by construction.

    Scale shape — the aggregate-of-aggregates on the USER axis (cells are
    tiny-cardinality, sources × 7 × 24, so users are the spread key):
      1. per batch one Arrow group_by reduces events to
         (source, dow, hour, user, n) partials;
      2. hash-partition by USER: every copy of a (cell, user) pair meets
         in one task, so the pair dedupes exactly and re-reduces to
         (cell, n_events, n_users) partials — user rows never re-shuffle;
      3. one k=1 merge sums partials (output O(sources × 168))."""
    from ..stages.shuffle import hash_partition_merge

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        days = ts_us // DAY_US
        dow = ((days + 3) % 7) + 1
        hour = (ts_us % DAY_US) // HOUR_US
        t = pa.table(
            {
                "source": b["event_type"],
                "dow": pa.array(dow, pa.int64()),
                "hour": pa.array(hour, pa.int64()),
                "user_id": pc.cast(b["user_id"], pa.int64()),
            }
        )
        g = t.group_by(
            ["source", "dow", "hour", "user_id"], use_threads=False
        ).aggregate([("user_id", "count")])
        return g.rename_columns(["source", "dow", "hour", "user_id", "n"])

    def _empty() -> pa.Table:
        return pa.table(
            {
                "source": pa.array([], pa.string()),
                "dow": pa.array([], pa.int64()),
                "hour": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "n_users": pa.array([], pa.int64()),
            }
        )

    def user_fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty()
        # all copies of a (cell, user) pair are in this partition: collapse
        # them (n_events sums; the collapsed row IS one distinct user)
        g = t.group_by(
            ["source", "dow", "hour", "user_id"], use_threads=False
        ).aggregate([("n", "sum")])
        g2 = g.group_by(["source", "dow", "hour"], use_threads=False).aggregate(
            [("n_sum", "sum"), ("n_sum", "count")]
        )
        return g2.rename_columns(["source", "dow", "hour", "n_events", "n_users"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty()
        g = t.group_by(["source", "dow", "hour"], use_threads=False).aggregate(
            [("n_events", "sum"), ("n_users", "sum")]
        )
        return g.rename_columns(["source", "dow", "hour", "n_events", "n_users"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    cells = hash_partition_merge(partials, "user_id", user_fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "dow", merge, k=1)


def events_return_gaps(
    sf_dir: str, qs: tuple[int, ...] = (500, 900, 990)
) -> Dataset:
    """E53: return-gap distribution — n_gaps plus discrete p50/p90/p99 and
    max of the gap IN WHOLE DAYS between a user's consecutive ACTIVE days
    — "how long until users come back", the dual of E49's retention
    triangle (E49 counts who returns at each offset; E53 summarizes the
    wait itself).  Exact int64 under the repo's quantile_disc rank rule;
    DuckDB oracle = DISTINCT user-days + lag + quantile_disc.

    Scale shape — E49's machinery with a histogram tail:
      1. per batch one lexsort reduces events to distinct (user, day)
         pairs (timestamps/payloads never shuffle);
      2. hash-partition by USER: each user's day set is local, so gaps =
         diff(sorted days) are decided exactly and immediately re-reduced
         to (gap_days, f) histogram partials — bounded by the corpus
         time-span in days, never by user count;
      3. one k=1 histogram merge reads off all quantiles (E50's shape)."""
    from ..stages.shuffle import hash_partition_merge

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        uu = pc.cast(b["user_id"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        day = ts_us // DAY_US
        order = np.lexsort((day, uu))
        u2, d2 = uu[order], day[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = (u2[1:] != u2[:-1]) | (d2[1:] != d2[:-1])
        starts = np.flatnonzero(new)
        return pa.table(
            {
                "user_id": pa.array(u2[starts], pa.int64()),
                "day": pa.array(d2[starts], pa.int64()),
            }
        )

    def user_fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "g": pa.array([], pa.int64()),
                    "gap": pa.array([], pa.int64()),
                    "f": pa.array([], pa.int64()),
                }
            )
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        dd = t["day"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((dd, uu))
        u2, d2 = uu[order], dd[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = (u2[1:] != u2[:-1]) | (d2[1:] != d2[:-1])
        su = np.flatnonzero(new)
        u3, d3 = u2[su], d2[su]
        # consecutive-day gaps within each user's sorted run
        same = np.empty(len(su), dtype=bool)
        same[0] = False
        same[1:] = u3[1:] == u3[:-1]
        gaps = (d3 - np.concatenate(([0], d3[:-1])))[same]
        if len(gaps) == 0:
            return pa.table(
                {
                    "g": pa.array([], pa.int64()),
                    "gap": pa.array([], pa.int64()),
                    "f": pa.array([], pa.int64()),
                }
            )
        vals, freq = np.unique(gaps, return_counts=True)
        return pa.table(
            {
                "g": pa.array(np.zeros(len(vals), np.int64)),
                "gap": pa.array(vals, pa.int64()),
                "f": pa.array(freq.astype(np.int64)),
            }
        )

    names = tuple(f"p{q // 10}_days" for q in qs)

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "n_gaps": pa.array([], pa.int64()),
                    **{c: pa.array([], pa.int64()) for c in names},
                    "max_days": pa.array([], pa.int64()),
                }
            )
        vv = t["gap"].combine_chunks().to_numpy(zero_copy_only=False)
        ff = t["f"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(vv, kind="stable")
        v2 = vv[order]
        ng = np.empty(len(order), dtype=bool)
        ng[0] = True
        ng[1:] = v2[1:] != v2[:-1]
        gs = np.flatnonzero(ng)
        vals = v2[gs]
        freq = np.add.reduceat(ff[order], gs)
        n = int(freq.sum())
        cum = np.cumsum(freq)
        out = {"n_gaps": pa.array([n], pa.int64())}
        for q, c in zip(qs, names):
            thr = (n * q + 999) // 1000
            out[c] = pa.array([int(vals[np.searchsorted(cum, thr)])], pa.int64())
        out["max_days"] = pa.array([int(vals[-1])], pa.int64())
        return pa.table(out)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    hist = hash_partition_merge(partials, "user_id", user_fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(hist, "g", merge, k=1)


def events_session_count_hist(sf_dir: str, gap_s: int = 6 * 3600) -> Dataset:
    """E54: sessions-per-user histogram — for every session count s, how
    many users had exactly s sessions — the visit-frequency distribution
    ("one-and-done vs habitual") that complements E36's events-per-user
    histogram and E50's session-duration quantiles.  Exact int64; DuckDB
    oracle = the gaps-and-islands session starts summed per user.

    Scale shape — E36's aggregate-of-aggregates over E15's sessionizer
    output (already bounded by (key, window)+fold):
      1. per batch one Arrow group_by reduces session rows to (user, n)
         partials;
      2. hash-partition by USER decides each user's exact session count
         locally and immediately re-reduces to (n_sessions, n_users)
         partials;
      3. one k=1 merge sums (output O(max sessions per user))."""
    from ..stages.shuffle import hash_partition_merge

    sess = events_sessions(sf_dir, gap_s=gap_s)

    def partial(b: pa.Table) -> pa.Table:
        g = b.select(["user_id"]).group_by("user_id", use_threads=False).aggregate(
            [("user_id", "count")]
        )
        return g.rename_columns(["user_id", "n"])

    def user_fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "n_sessions": pa.array([], pa.int64()),
                    "n_users": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("user_id", use_threads=False).aggregate([("n", "sum")])
        h = g.group_by("n_sum", use_threads=False).aggregate([("n_sum", "count")])
        return h.rename_columns(["n_sessions", "n_users"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "n_sessions": pa.array([], pa.int64()),
                    "n_users": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("n_sessions", use_threads=False).aggregate(
            [("n_users", "sum")]
        )
        return g.rename_columns(["n_sessions", "n_users"])

    partials = sess.map_batches(partial, batch_format="pyarrow")
    per_user = hash_partition_merge(
        partials, "user_id", user_fold, k=_adaptive_k(sf_dir)
    )
    return hash_partition_merge(per_user, "n_sessions", merge, k=1)


def events_dod_wow(sf_dir: str) -> Dataset:
    """E55: day-over-day / week-over-week deltas — for every (source, day)
    PRESENT in the stream: the day's event count, its delta vs the
    previous calendar day, and its delta vs the same weekday one week
    earlier (absent comparison days count 0) — the seasonal-naive "are we
    growing or was that just the weekend" board on top of E4's daily
    rollup.  Exact int64; DuckDB oracle = day rollup LEFT JOINed to
    itself at day-1 and day-7.

    Scale shape — the E45 role-tagged double-emit on the DAY grid: each
    batch reduces to (source, day, n) cells and emits each cell THREE
    times (main at d, dod-comparison at d+1, wow-comparison at d+7);
    one day-hash exchange of O(sources × days × 3) partial rows — event
    rows never shuffle — and the merge settles n/dod/wow per cell,
    keeping only days with main mass (days present in the stream)."""
    from ..stages.shuffle import hash_partition_merge

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        day = ts_us // DAY_US
        t = pa.table({"source": b["event_type"], "day": pa.array(day, pa.int64())})
        g = t.group_by(["source", "day"], use_threads=False).aggregate(
            [("day", "count")]
        )
        src, dd = g["source"], g["day"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = g["day_count"].combine_chunks().to_numpy(zero_copy_only=False)
        m = len(dd)
        src3 = pa.concat_arrays([src.combine_chunks()] * 3)
        return pa.table(
            {
                "source": src3,
                "day": pa.array(
                    np.concatenate([dd, dd + 1, dd + 7]), pa.int64()
                ),
                "role": pa.array(
                    np.repeat(np.array([0, 1, 2], np.int64), m)
                ),
                "n": pa.array(np.concatenate([nn, nn, nn]).astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "day_ts": pa.array([], pa.timestamp("us")),
                    "n_events": pa.array([], pa.int64()),
                    "dod_delta": pa.array([], pa.int64()),
                    "wow_delta": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["source", "day", "role"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        src = g["source"].combine_chunks()
        codes = (
            pc.dictionary_encode(src)
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        dd = g["day"].combine_chunks().to_numpy(zero_copy_only=False)
        rr = g["role"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((rr, dd, codes))
        c2, d2, r2, n2 = codes[order], dd[order], rr[order], nn[order]
        newg = np.empty(len(order), dtype=bool)
        newg[0] = True
        newg[1:] = (c2[1:] != c2[:-1]) | (d2[1:] != d2[:-1])
        gs = np.flatnonzero(newg)
        gid = np.cumsum(newg) - 1
        ncell = len(gs)
        main = np.zeros(ncell, np.int64)
        d1 = np.zeros(ncell, np.int64)
        d7 = np.zeros(ncell, np.int64)
        main[gid[r2 == 0]] = n2[r2 == 0]
        d1[gid[r2 == 1]] = n2[r2 == 1]
        d7[gid[r2 == 2]] = n2[r2 == 2]
        keep = main > 0
        idx = gs[keep]
        return pa.table(
            {
                "source": src.take(pa.array(order[idx], pa.int64())),
                "day_ts": pa.array(d2[gs][keep] * DAY_US, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "n_events": pa.array(main[keep]),
                "dod_delta": pa.array(main[keep] - d1[keep]),
                "wow_delta": pa.array(main[keep] - d7[keep]),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return hash_partition_merge(partials, "day", merge, k=_adaptive_k(sf_dir))


def events_transition_matrix(sf_dir: str) -> Dataset:
    """E56: event-type transition matrix — for every (from_type, to_type):
    how many times a user's NEXT event (ordered by ts, event_id) was of
    to_type given the current one was from_type — the first-order Markov
    counts behind journey/flow analysis ("what do users do after a
    search"); exact int64 (lead() window oracle).

    Scale shape: transitions need each user's adjacent pairs, so the
    exchange ships one narrow row per event (user, ts, order, type-code —
    the E15 sessionize exchange; payloads never shuffle) hash-partitioned
    by USER; each partition lexsorts its complete user streams once and
    reduces adjacent same-user pairs straight to (from, to, n) partials;
    the k=1 merge sums O(types²) rows.  Type identity is an exact
    broadcast rank (the E51 funnel convention), never a hash.

    Partitioning assumption: one user's full event stream fits a task
    (the E15 sessionize default).  A corpus-hot key would need the
    (key, ts-window) sub-partitioning + boundary-pair carry that
    stages/temporal already implements for sessionize — transitions are
    associative over window boundaries (one carried edge per boundary)."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "user_id", "event_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def narrow(b: pa.Table) -> pa.Table:
        code = pc.cast(
            pc.index_in(b["event_type"], value_set=srcs), pa.int64()
        )
        return pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "t": b["ts"].cast(pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
                "c": code,
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "fc": pa.array([], pa.int64()),
                    "tc": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t["o"].combine_chunks().to_numpy(zero_copy_only=False)
        cc = t["c"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((oo, tt, uu))
        u2, c2 = uu[order], cc[order]
        same = u2[1:] == u2[:-1]
        fr, to = c2[:-1][same], c2[1:][same]
        if len(fr) == 0:
            return pa.table(
                {
                    "fc": pa.array([], pa.int64()),
                    "tc": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        packed = fr * len(srcs) + to
        vals, cnt = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "fc": pa.array(vals // len(srcs), pa.int64()),
                "tc": pa.array(vals % len(srcs), pa.int64()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "from_type": pa.array([], pa.string()),
                    "to_type": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["fc", "tc"], use_threads=False).aggregate([("n", "sum")])
        fi = pa.array(
            g["fc"].combine_chunks().to_numpy(zero_copy_only=False), pa.int64()
        )
        ti = pa.array(
            g["tc"].combine_chunks().to_numpy(zero_copy_only=False), pa.int64()
        )
        return pa.table(
            {
                "from_type": srcs.take(fi),
                "to_type": srcs.take(ti),
                "n": pc.cast(g["n_sum"], pa.int64()),
            }
        )

    narrow_ds = ds.map_batches(narrow, batch_format="pyarrow")
    partials = hash_partition_merge(narrow_ds, "user_id", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(partials, "fc", merge, k=1)


def events_source_user_overlap(sf_dir: str) -> Dataset:
    """E57: source user-overlap matrix — for every source pair a <= b:
    the EXACT number of distinct users active in BOTH — the audience
    co-usage matrix behind cross-sell / cannibalization reads (the
    diagonal is each source's exact reach; T37/T39 answer the same
    question for document shingles).  Exact int64 (distinct-pair
    self-join oracle).

    Scale shape — E23's dedupe-combiner feeding a per-user outer product:
      1. per batch one Arrow group_by reduces events to distinct
         (source, user) pairs;
      2. hash-partition by USER: each user's source set is local, so the
         user's s·(s+1)/2 ordered pairs (s = sources-per-user, bounded by
         the tiny source cardinality) re-reduce in place to
         (a, b, n) partials;
      3. one k=1 merge sums O(sources²) rows."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
        t = pa.table(
            {"c": code, "user_id": pc.cast(b["user_id"], pa.int64())}
        )
        return t.group_by(["c", "user_id"], use_threads=False).aggregate([])

    def user_fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        cc = t["c"].combine_chunks().to_numpy(zero_copy_only=False)
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cc, uu))
        u2, c2 = uu[order], cc[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = (u2[1:] != u2[:-1]) | (c2[1:] != c2[:-1])
        su = np.flatnonzero(new)
        u3, c3 = u2[su], c2[su]
        # per user, emit every ordered source pair a <= b via a bounded
        # python-free expansion: pair all (i, j >= i) offsets within runs
        newu = np.empty(len(su), dtype=bool)
        newu[0] = True
        newu[1:] = u3[1:] != u3[:-1]
        ustart = np.flatnonzero(newu)
        runlen = np.diff(np.append(ustart, len(u3)))
        # offsets within each user's run
        pos = np.arange(len(u3)) - np.repeat(ustart, runlen)
        # emit pairs (k, k..runlen-1) — expand with repeat/arange algebra
        rep = np.repeat(runlen, runlen) - pos  # pairs per element
        ai = np.repeat(np.arange(len(u3)), rep)
        # second index: for element at pos p with r remaining, offsets p..end
        csum = np.cumsum(rep)
        first = np.concatenate(([0], csum[:-1]))
        bi = ai + (np.arange(csum[-1]) - np.repeat(first, rep))
        packed = c3[ai] * ns + c3[bi]
        vals, cnt = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "a": pa.array(vals // ns, pa.int64()),
                "b": pa.array(vals % ns, pa.int64()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source_a": pa.array([], pa.string()),
                    "source_b": pa.array([], pa.string()),
                    "n_users": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["a", "b"], use_threads=False).aggregate([("n", "sum")])
        ai = pa.array(g["a"].combine_chunks().to_numpy(zero_copy_only=False), pa.int64())
        bi = pa.array(g["b"].combine_chunks().to_numpy(zero_copy_only=False), pa.int64())
        return pa.table(
            {
                "source_a": srcs.take(ai),
                "source_b": srcs.take(bi),
                "n_users": pc.cast(g["n_sum"], pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    per_user = hash_partition_merge(partials, "user_id", user_fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(per_user, "a", merge, k=1)


MIN_US = 60_000_000


def events_grid_coverage(sf_dir: str) -> Dataset:
    """E58: minute-grid coverage report — per source: distinct minutes
    with at least one event, first/last active minute, the inclusive span
    between them, and coverage permille (present/span) — the uptime /
    telemetry-liveness board that says how dense each series is before
    anyone trusts its gaps (E5 fills them; E32 finds the worst one; E58
    scores the whole series).  Exact int64 (DISTINCT minute + date_diff
    oracle).

    Scale shape — E23's dedupe combiner with the user column dropped:
      1. per batch one Arrow group_by reduces events to distinct
         (source, minute) cells;
      2. hash-partition by MINUTE (the spread axis): cells dedupe exactly
         and re-reduce in place to per-source (n, min, max) partials;
      3. one k=1 merge sums counts and folds min/max (output = one row
         per source)."""
    from ..stages.shuffle import hash_partition_merge

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "source": b["event_type"],
                "minute": pa.array(ts_us // MIN_US, pa.int64()),
            }
        )
        return t.group_by(["source", "minute"], use_threads=False).aggregate([])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "mn": pa.array([], pa.int64()),
                    "mx": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["source", "minute"], use_threads=False).aggregate([])
        h = g.group_by("source", use_threads=False).aggregate(
            [("minute", "count"), ("minute", "min"), ("minute", "max")]
        )
        return h.rename_columns(["source", "n", "mn", "mx"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_minutes": pa.array([], pa.int64()),
                    "first_ts": pa.array([], pa.timestamp("us")),
                    "last_ts": pa.array([], pa.timestamp("us")),
                    "span_minutes": pa.array([], pa.int64()),
                    "coverage_permille": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("source", use_threads=False).aggregate(
            [("n", "sum"), ("mn", "min"), ("mx", "max")]
        )
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        mn = g["mn_min"].combine_chunks().to_numpy(zero_copy_only=False)
        mx = g["mx_max"].combine_chunks().to_numpy(zero_copy_only=False)
        span = mx - mn + 1
        return pa.table(
            {
                "source": g["source"],
                "n_minutes": pa.array(n.astype(np.int64)),
                "first_ts": pa.array(mn * MIN_US, pa.int64()).cast(pa.timestamp("us")),
                "last_ts": pa.array(mx * MIN_US, pa.int64()).cast(pa.timestamp("us")),
                "span_minutes": pa.array(span.astype(np.int64)),
                "coverage_permille": pa.array((1000 * n) // span, pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    per_min = hash_partition_merge(partials, "minute", fold, k=_adaptive_k(sf_dir))
    return per_min.groupby("source").map_groups(merge, batch_format="pyarrow")


def events_lifecycle(sf_dir: str) -> Dataset:
    """E59: daily growth accounting — per active day: users seen for the
    FIRST time (new), users also active the previous calendar day
    (returning), users back after a gap of 2+ days (resurrected), and
    users whose LAST-ever active day this is (last_active — the churn
    column read right-to-left) — the new/retained/resurrected ledger
    every growth dashboard opens with; exact int64 (DISTINCT user-days +
    lag/max window oracle).

    Scale shape — E49's user-day machinery with a 4-way classifier:
      1. per batch one lexsort reduces events to distinct (user, day);
      2. hash-partition by USER: each user's sorted day run classifies
         every day locally (first → new; prev == day-1 → returning; else
         resurrected; run max → last_active) and re-reduces to
         (day, class, n) partials;
      3. one k=1 merge pivots classes to columns (output O(days))."""
    from ..stages.shuffle import hash_partition_merge

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        uu = pc.cast(b["user_id"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        day = ts_us // DAY_US
        order = np.lexsort((day, uu))
        u2, d2 = uu[order], day[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = (u2[1:] != u2[:-1]) | (d2[1:] != d2[:-1])
        st = np.flatnonzero(new)
        return pa.table(
            {
                "user_id": pa.array(u2[st], pa.int64()),
                "day": pa.array(d2[st], pa.int64()),
            }
        )

    def _empty() -> pa.Table:
        return pa.table(
            {
                "day": pa.array([], pa.int64()),
                "cls": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )

    def user_fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty()
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        dd = t["day"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((dd, uu))
        u2, d2 = uu[order], dd[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = (u2[1:] != u2[:-1]) | (d2[1:] != d2[:-1])
        su = np.flatnonzero(new)
        u3, d3 = u2[su], d2[su]
        first = np.empty(len(su), dtype=bool)
        first[0] = True
        first[1:] = u3[1:] != u3[:-1]
        last = np.empty(len(su), dtype=bool)
        last[-1] = True
        last[:-1] = u3[1:] != u3[:-1]
        consec = np.zeros(len(su), dtype=bool)
        consec[1:] = (~first[1:]) & (d3[1:] - d3[:-1] == 1)
        # classes: 0 new, 1 returning, 2 resurrected, 3 last_active
        cls = np.where(first, 0, np.where(consec, 1, 2)).astype(np.int64)
        days = np.concatenate([d3, d3[last]])
        classes = np.concatenate([cls, np.full(int(last.sum()), 3, np.int64)])
        packed = days * 4 + classes
        vals, cnt = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "day": pa.array(vals // 4, pa.int64()),
                "cls": pa.array(vals % 4, pa.int64()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "day_ts": pa.array([], pa.timestamp("us")),
                    "n_new": pa.array([], pa.int64()),
                    "n_returning": pa.array([], pa.int64()),
                    "n_resurrected": pa.array([], pa.int64()),
                    "n_last_active": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["day", "cls"], use_threads=False).aggregate([("n", "sum")])
        dd = g["day"].combine_chunks().to_numpy(zero_copy_only=False)
        cc = g["cls"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        udays, inv = np.unique(dd, return_inverse=True)
        cols = np.zeros((len(udays), 4), np.int64)
        cols[inv, cc] = nn
        return pa.table(
            {
                "day_ts": pa.array(udays * DAY_US, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "n_new": pa.array(cols[:, 0]),
                "n_returning": pa.array(cols[:, 1]),
                "n_resurrected": pa.array(cols[:, 2]),
                "n_last_active": pa.array(cols[:, 3]),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    per_user = hash_partition_merge(partials, "user_id", user_fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(per_user, "day", merge, k=1)


def events_top_sessions(sf_dir: str, k: int = 20, gap_s: int = 6 * 3600) -> Dataset:
    """E60: top-k longest sessions — the k longest sessions corpus-wide
    (duration in floor seconds; ties broken user ASC, start ASC so the
    answer is unique) with their user, bounds, and event count — the
    "who are the marathon users" drill-down on E50's duration
    distribution; exact int64 (gaps-and-islands + ORDER BY ... LIMIT k
    oracle).

    Scale shape: sessions come off E15's bounded machinery; each batch
    keeps only its local top-k by one lexsort (O(batch log batch), k
    rows survive), so the k=1 merge sees O(batches × k) rows — session
    rows never land anywhere whole."""
    from ..stages.shuffle import hash_partition_merge

    sess = events_sessions(sf_dir, gap_s=gap_s)

    def local_topk(b: pa.Table) -> pa.Table:
        st = b["start_ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        en = b["end_ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        uu = b["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        ne = b["n_events"].combine_chunks().to_numpy(zero_copy_only=False)
        dur = (en - st) // 1_000_000
        order = np.lexsort((st, uu, -dur))[: min(k, len(dur))]
        return pa.table(
            {
                "g": pa.array(np.zeros(len(order), np.int64)),
                "user_id": pa.array(uu[order], pa.int64()),
                "start": pa.array(st[order], pa.int64()),
                "end": pa.array(en[order], pa.int64()),
                "dur_s": pa.array(dur[order], pa.int64()),
                "n_events": pa.array(ne[order], pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "start_ts": pa.array([], pa.timestamp("us")),
                    "end_ts": pa.array([], pa.timestamp("us")),
                    "dur_s": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        st = t["start"].combine_chunks().to_numpy(zero_copy_only=False)
        en = t["end"].combine_chunks().to_numpy(zero_copy_only=False)
        du = t["dur_s"].combine_chunks().to_numpy(zero_copy_only=False)
        ne = t["n_events"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((st, uu, -du))[: min(k, len(du))]
        return pa.table(
            {
                "user_id": pa.array(uu[order], pa.int64()),
                "start_ts": pa.array(st[order], pa.int64()).cast(pa.timestamp("us")),
                "end_ts": pa.array(en[order], pa.int64()).cast(pa.timestamp("us")),
                "dur_s": pa.array(du[order], pa.int64()),
                "n_events": pa.array(ne[order], pa.int64()),
            }
        )

    partials = sess.map_batches(local_topk, batch_format="pyarrow")
    return hash_partition_merge(partials, "g", merge, k=1)


def _pareto_from_hist(
    vals: np.ndarray, freq: np.ndarray, targets: tuple[int, ...]
) -> tuple[np.ndarray, int, int]:
    """Minimal number of units covering >= p permille of total mass, for
    each p in ``targets``, from a (value, frequency) histogram.  Unique
    even with tied values: within a tie run every unit adds the same
    mass, so the minimal count is order-independent.  Returns
    (counts per target, n_units, total_mass)."""
    order = np.argsort(vals, kind="stable")[::-1]
    v, f = vals[order], freq[order]
    mass = v * f
    cum_mass = np.cumsum(mass)
    cum_units = np.cumsum(f)
    total = int(cum_mass[-1]) if len(cum_mass) else 0
    n_units = int(cum_units[-1]) if len(cum_units) else 0
    out = np.zeros(len(targets), np.int64)
    for i, p in enumerate(targets):
        need = -(-total * p // 1000)  # ceil
        j = int(np.searchsorted(cum_mass, need))
        before_mass = int(cum_mass[j - 1]) if j else 0
        before_units = int(cum_units[j - 1]) if j else 0
        within = -(-(need - before_mass) // int(v[j])) if need > before_mass else 0
        out[i] = before_units + within
    return out, n_units, total


def events_pareto(
    sf_dir: str, targets: tuple[int, ...] = (500, 800, 900, 990)
) -> Dataset:
    """E61: user-concentration Pareto curve — for each target p (permille
    of ALL events): the MINIMAL number of users whose event counts cover
    at least that share — the "how few whales carry the traffic"
    concentration read (E36 shows the whole distribution; E61 answers the
    80/20 question as one number per target).  Unique under count ties
    (every tied user adds equal mass, so the minimum is order-free) and
    exact int64 (row_number-over-count-DESC + running-sum oracle).

    Scale shape — E36's machinery with a Pareto tail:
      1. per batch one Arrow group_by reduces events to (user, n) partials;
      2. hash-partition by USER decides exact per-user totals locally and
         re-reduces to (count, n_users) histogram partials;
      3. one k=1 merge sorts the tiny histogram and reads every target off
         two cumulative sums."""
    from ..stages.shuffle import hash_partition_merge

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        g = b.select(["user_id"]).group_by("user_id", use_threads=False).aggregate(
            [("user_id", "count")]
        )
        return g.rename_columns(["user_id", "n"])

    def user_fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"cnt": pa.array([], pa.int64()), "f": pa.array([], pa.int64())}
            )
        g = t.group_by("user_id", use_threads=False).aggregate([("n", "sum")])
        h = g.group_by("n_sum", use_threads=False).aggregate([("n_sum", "count")])
        return h.rename_columns(["cnt", "f"])

    names = tuple(f"users_p{p // 10}" for p in targets)

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "total_users": pa.array([], pa.int64()),
                    "total_events": pa.array([], pa.int64()),
                    **{c: pa.array([], pa.int64()) for c in names},
                }
            )
        g = t.group_by("cnt", use_threads=False).aggregate([("f", "sum")])
        vals = g["cnt"].combine_chunks().to_numpy(zero_copy_only=False)
        freq = g["f_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        counts, n_users, total = _pareto_from_hist(vals, freq, targets)
        out = {
            "total_users": pa.array([n_users], pa.int64()),
            "total_events": pa.array([total], pa.int64()),
        }
        for c, v in zip(names, counts):
            out[c] = pa.array([int(v)], pa.int64())
        return pa.table(out)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    hist = hash_partition_merge(partials, "user_id", user_fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(hist, "cnt", merge, k=1)


def events_dau_wau_mau(sf_dir: str) -> Dataset:
    """E62: DAU/WAU/MAU stickiness board — for every day PRESENT in the
    stream: exact distinct users active that day (dau), in the trailing 7
    days (wau), and in the trailing 28 days (mau) — the engagement ratios
    (dau/mau "stickiness") every product review opens with; exact int64
    (window BETWEEN self-join oracle).

    Scale shape — E26's replicate-then-dedupe on the DAY axis:
      1. per batch one lexsort reduces events to distinct (user, day)
         pairs (the E49 combiner);
      2. each pair fans out to the target days it can serve (1 dau + 7
         wau + 28 mau role-tagged rows — bounded 36x replication of
         DISTINCT user-days, never of events);
      3. hash-partition by USER: all of a user's rows co-locate, so
         (user, target, role) dedupes exactly and re-reduces to
         (target, role, n) partials;
      4. one k=1 merge pivots roles to columns, keeping only targets with
         dau >= 1 (days present in the stream, matching the oracle's
         days-CTE domain)."""
    from ..stages.shuffle import hash_partition_merge

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        uu = pc.cast(b["user_id"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        day = ts_us // DAY_US
        order = np.lexsort((day, uu))
        u2, d2 = uu[order], day[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = (u2[1:] != u2[:-1]) | (d2[1:] != d2[:-1])
        st = np.flatnonzero(new)
        u3, d3 = u2[st], d2[st]
        # fan out to (target, role): role 0 = dau (offset 0), 1 = wau
        # (offsets 0..6), 2 = mau (offsets 0..27)
        offs = np.concatenate(
            [np.zeros(1, np.int64), np.arange(7), np.arange(28)]
        )
        roles = np.concatenate(
            [np.zeros(1, np.int64), np.ones(7, np.int64), np.full(28, 2, np.int64)]
        )
        m = len(u3)
        return pa.table(
            {
                "user_id": pa.array(np.repeat(u3, len(offs))),
                "target": pa.array(
                    (np.repeat(d3, len(offs)) + np.tile(offs, m)).astype(np.int64)
                ),
                "role": pa.array(np.tile(roles, m)),
            }
        )

    def user_fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "target": pa.array([], pa.int64()),
                    "role": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        # all rows of a user are local: dedupe (user, target, role) then
        # count per (target, role)
        g = t.group_by(["user_id", "target", "role"], use_threads=False).aggregate([])
        h = g.group_by(["target", "role"], use_threads=False).aggregate(
            [("role", "count")]
        )
        return h.rename_columns(["target", "role", "n"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "day_ts": pa.array([], pa.timestamp("us")),
                    "dau": pa.array([], pa.int64()),
                    "wau": pa.array([], pa.int64()),
                    "mau": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["target", "role"], use_threads=False).aggregate([("n", "sum")])
        dd = g["target"].combine_chunks().to_numpy(zero_copy_only=False)
        rr = g["role"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        udays, inv = np.unique(dd, return_inverse=True)
        cols = np.zeros((len(udays), 3), np.int64)
        cols[inv, rr] = nn
        keep = cols[:, 0] > 0  # only days present in the stream
        return pa.table(
            {
                "day_ts": pa.array(udays[keep] * DAY_US, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "dau": pa.array(cols[keep, 0]),
                "wau": pa.array(cols[keep, 1]),
                "mau": pa.array(cols[keep, 2]),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    per_user = hash_partition_merge(partials, "user_id", user_fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(per_user, "target", merge, k=1)


def events_minute_percentile(sf_dir: str) -> Dataset:
    """E63: per-minute percentile rank — every rolled (source, minute)
    tagged with its exact permille rank within the source's own
    minute-count distribution (permille = 1000 · #minutes-with-strictly-
    smaller-count // n_minutes) — the "is this minute a p99 minute"
    contextualizer dashboards draw as a percentile band; exact int64
    (histogram window-cumsum oracle).

    Scale shape — broadcast-of-aggregate over the sanctioned rolled-point
    bound: the 1m rollup is materialized ONCE; its per-source count
    HISTOGRAM (O(sources × distinct counts) rows) collapses at the driver
    into per-source (sorted counts, strictly-below cumsum, total) arrays
    shipped via ``ray.put``; a stateless second pass attaches the permille
    with one searchsorted per (batch, source) — no second shuffle."""
    import ray

    from ..stages.rollup import rollup
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    m1 = rollup(events_assigned(sf_dir), "1m", t0_us=EVENTS_T0_US).materialize()

    def hist_partial(b: pa.Table) -> pa.Table:
        code = pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
        t = pa.table({"c": code, "n": pc.cast(b["count"], pa.int64())})
        g = t.group_by(["c", "n"], use_threads=False).aggregate([("n", "count")])
        return g.rename_columns(["c", "n", "f"])

    def hist_merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "c": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "f": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["c", "n"], use_threads=False).aggregate([("f", "sum")])
        return g.rename_columns(["c", "n", "f"])

    hist = pa.concat_tables(
        list(
            hash_partition_merge(
                m1.map_batches(hist_partial, batch_format="pyarrow"),
                "n",
                hist_merge,
                k=1,
            ).iter_batches(batch_format="pyarrow")
        )
    )
    cc = hist["c"].combine_chunks().to_numpy(zero_copy_only=False)
    nn = hist["n"].combine_chunks().to_numpy(zero_copy_only=False)
    ff = hist["f"].combine_chunks().to_numpy(zero_copy_only=False)
    lut = []
    for ci in range(len(srcs)):
        m = cc == ci
        order = np.argsort(nn[m], kind="stable")
        vals, freq = nn[m][order], ff[m][order]
        below = np.concatenate(([0], np.cumsum(freq)[:-1]))
        lut.append((vals, below, int(freq.sum())))
    lut_ref = ray.put(lut)

    class Attach:
        def __init__(self, ref):
            self.lut = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, b: pa.Table) -> pa.Table:
            code = (
                pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
            )
            n = (
                pc.cast(b["count"], pa.int64())
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
            )
            perm = np.zeros(len(n), np.int64)
            for ci in np.unique(code):
                vals, below, total = self.lut[ci]
                m = code == ci
                pos = np.searchsorted(vals, n[m])
                perm[m] = (1000 * below[pos]) // max(total, 1)
            return pa.table(
                {
                    "source": b["source"],
                    "bucket_ts": b["bucket_ts"],
                    "n_events": pa.array(n),
                    "permille": pa.array(perm),
                }
            )

    return m1.map_batches(
        Attach, fn_constructor_args=(lut_ref,), batch_format="pyarrow",
        concurrency=2,
    )


def events_share_drift(sf_dir: str) -> Dataset:
    """E64: daily traffic-mix share — per (day, source): event count and
    the source's exact permille share of that DAY's total — the mix-drift
    board that catches one source silently displacing another while total
    volume looks flat (E55 tracks each source against itself; E64 tracks
    sources against each other).  Exact int64 (day-total join oracle).

    Scale shape: ONE exchange — per batch one Arrow group_by reduces
    events to (day, source, n) cells; hash-partition by DAY co-locates a
    day's full source vector, so the day total and every share are
    decided in place (output O(days × sources))."""
    from ..stages.shuffle import hash_partition_merge

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "day": pa.array(ts_us // DAY_US, pa.int64()),
                "source": b["event_type"],
            }
        )
        g = t.group_by(["day", "source"], use_threads=False).aggregate(
            [("day", "count")]
        )
        return g.rename_columns(["day", "source", "n"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "day_ts": pa.array([], pa.timestamp("us")),
                    "source": pa.array([], pa.string()),
                    "n_events": pa.array([], pa.int64()),
                    "share_permille": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["day", "source"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        dd = g["day"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        udays, inv = np.unique(dd, return_inverse=True)
        tot = np.zeros(len(udays), np.int64)
        np.add.at(tot, inv, nn)
        return pa.table(
            {
                "day_ts": pa.array(dd * DAY_US, pa.int64()).cast(pa.timestamp("us")),
                "source": g["source"],
                "n_events": pa.array(nn.astype(np.int64)),
                "share_permille": pa.array((1000 * nn) // tot[inv], pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return hash_partition_merge(partials, "day", merge, k=_adaptive_k(sf_dir))


def events_tenure_hist(sf_dir: str) -> Dataset:
    """E65: user-tenure histogram — for every tenure t (whole days
    between a user's first and last activity, inclusive): how many users
    have exactly that tenure — the lifetime-length distribution that
    complements E49's retention triangle (E49: do they come back; E65:
    how long do they stay around overall); exact int64 (min/max per user
    + GROUP BY oracle).

    Scale shape — E49's distinct user-day machinery with a min/max fold:
      1. per batch one lexsort reduces events to distinct (user, day);
      2. hash-partition by USER: each user's (first, last) day pair is
         decided locally and re-reduces to (tenure_days, n_users)
         histogram partials;
      3. one k=1 merge sums (output O(corpus span in days))."""
    from ..stages.shuffle import hash_partition_merge

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        uu = pc.cast(b["user_id"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        t = pa.table(
            {
                "user_id": pa.array(uu),
                "day": pa.array(ts_us // DAY_US, pa.int64()),
            }
        )
        g = t.group_by("user_id", use_threads=False).aggregate(
            [("day", "min"), ("day", "max")]
        )
        return g.rename_columns(["user_id", "mn", "mx"])

    def user_fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "tenure_days": pa.array([], pa.int64()),
                    "n_users": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("user_id", use_threads=False).aggregate(
            [("mn", "min"), ("mx", "max")]
        )
        ten = (
            g["mx_max"].combine_chunks().to_numpy(zero_copy_only=False)
            - g["mn_min"].combine_chunks().to_numpy(zero_copy_only=False)
            + 1
        )
        vals, cnt = np.unique(ten, return_counts=True)
        return pa.table(
            {
                "tenure_days": pa.array(vals, pa.int64()),
                "n_users": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "tenure_days": pa.array([], pa.int64()),
                    "n_users": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("tenure_days", use_threads=False).aggregate(
            [("n_users", "sum")]
        )
        return g.rename_columns(["tenure_days", "n_users"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    per_user = hash_partition_merge(partials, "user_id", user_fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(per_user, "tenure_days", merge, k=1)


def events_concurrent_sessions(sf_dir: str, gap_s: int = 6 * 3600) -> Dataset:
    """E66: concurrent-session load curve — for every minute covered by
    at least one session: how many sessions are OPEN during that minute
    (interval-overlap counting, the capacity metric connection pools and
    seat licenses are sized by).  A session [start, end] covers every
    minute from floor(start) to floor(end) inclusive; exact int64
    (generate_series explode oracle).

    Scale shape — the interval-overlap family done by bounded explode:
    sessions come off E15's machinery; each batch EXPLODES its sessions
    to (minute, 1) rows with pure repeat/arange algebra (bounded by
    session duration in minutes, the same bound the oracle pays) and
    immediately reduces to (minute, n) partials; one minute-hash exchange
    of partials — session rows never shuffle."""
    from ..stages.shuffle import hash_partition_merge

    sess = events_sessions(sf_dir, gap_s=gap_s)

    def explode(b: pa.Table) -> pa.Table:
        st = b["start_ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        en = b["end_ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        m0 = st // MIN_US
        m1 = en // MIN_US
        span = (m1 - m0 + 1).astype(np.int64)
        tot = int(span.sum())
        if tot == 0:
            return pa.table(
                {"minute": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        base = np.repeat(m0, span)
        csum = np.cumsum(span)
        first = np.concatenate(([0], csum[:-1]))
        off = np.arange(tot) - np.repeat(first, span)
        t = pa.table({"minute": pa.array(base + off, pa.int64())})
        g = t.group_by("minute", use_threads=False).aggregate([("minute", "count")])
        return g.rename_columns(["minute", "n"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "minute_ts": pa.array([], pa.timestamp("us")),
                    "n_sessions": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("minute", use_threads=False).aggregate([("n", "sum")])
        mm = g["minute"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "minute_ts": pa.array(mm * MIN_US, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "n_sessions": pc.cast(g["n_sum"], pa.int64()),
            }
        )

    partials = sess.map_batches(explode, batch_format="pyarrow")
    return hash_partition_merge(partials, "minute", merge, k=_adaptive_k(sf_dir))


def events_rolling_7d(sf_dir: str) -> Dataset:
    """E67: trailing-7-day volume — per (source, day) present in the
    stream: the day's count and the total over the trailing 7 calendar
    days (absent days count 0) — the smoothed-volume line every ops
    review plots over the raw daily bars (E55 differences days; E67
    integrates them).  Exact int64 (RANGE-interval window oracle).

    Scale shape — E55's role-tagged multi-emit on the DAY grid: each
    (source, day, n) cell emits once as itself and once into each of the
    7 target days it can serve; ONE day-hash exchange of
    O(cells × 8) partial rows, merge keeps only days with main mass."""
    from ..stages.shuffle import hash_partition_merge

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "day": pa.array(ts_us // DAY_US, pa.int64()),
                "source": b["event_type"],
            }
        )
        g = t.group_by(["day", "source"], use_threads=False).aggregate(
            [("day", "count")]
        )
        src = g["source"].combine_chunks()
        dd = g["day"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = g["day_count"].combine_chunks().to_numpy(zero_copy_only=False)
        m = len(dd)
        offs = np.arange(7, dtype=np.int64)  # 0 = main, 1..6 = window feed
        roles = (offs > 0).astype(np.int64)
        return pa.table(
            {
                "source": pa.concat_arrays([src] * 7),
                "day": pa.array(
                    (np.tile(dd, 7) + np.repeat(offs, m)).astype(np.int64)
                ),
                "role": pa.array(np.repeat(roles, m)),
                "n": pa.array(np.tile(nn, 7).astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "day_ts": pa.array([], pa.timestamp("us")),
                    "n_events": pa.array([], pa.int64()),
                    "n_7d": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["source", "day", "role"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        src = g["source"].combine_chunks()
        codes = (
            pc.dictionary_encode(src)
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        dd = g["day"].combine_chunks().to_numpy(zero_copy_only=False)
        rr = g["role"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((rr, dd, codes))
        c2, d2, r2, n2 = codes[order], dd[order], rr[order], nn[order]
        newg = np.empty(len(order), dtype=bool)
        newg[0] = True
        newg[1:] = (c2[1:] != c2[:-1]) | (d2[1:] != d2[:-1])
        gs = np.flatnonzero(newg)
        gid = np.cumsum(newg) - 1
        ncell = len(gs)
        main = np.zeros(ncell, np.int64)
        feed = np.zeros(ncell, np.int64)
        main[gid[r2 == 0]] = n2[r2 == 0]
        feed[gid[r2 == 1]] = n2[r2 == 1]
        keep = main > 0
        idx = gs[keep]
        return pa.table(
            {
                "source": src.take(pa.array(order[idx], pa.int64())),
                "day_ts": pa.array(d2[gs][keep] * DAY_US, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "n_events": pa.array(main[keep]),
                "n_7d": pa.array(main[keep] + feed[keep]),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return hash_partition_merge(partials, "day", merge, k=_adaptive_k(sf_dir))


def events_weekly_users(sf_dir: str) -> Dataset:
    """E68: weekly reach — per (source, t0-aligned Monday week): EXACT
    distinct users — the calendar-week audience line next to E62's
    trailing-window WAU (calendar weeks are what contracts and OKRs are
    written against); exact int64 (date_trunc('week') count-distinct
    oracle; t0 is a Monday so the engine's integer week grid coincides
    with DuckDB's week truncation, the 1w-cascade convention).

    Scale shape — E23's dedupe combiner on the WEEK axis: per batch one
    Arrow group_by reduces events to distinct (source, week, user)
    triples; week-hash partition dedupes exactly and counts per cell."""
    from ..stages.shuffle import hash_partition_merge

    week_us = 7 * DAY_US
    # epoch day 0 is a Thursday; Mondays are at (days + 3) % 7 == 0
    monday0_us = 4 * DAY_US  # 1970-01-05, the first Monday after epoch

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        week = (ts_us - monday0_us) // week_us
        t = pa.table(
            {
                "source": b["event_type"],
                "week": pa.array(week, pa.int64()),
                "user_id": pc.cast(b["user_id"], pa.int64()),
            }
        )
        return t.group_by(
            ["source", "week", "user_id"], use_threads=False
        ).aggregate([])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "week_ts": pa.array([], pa.timestamp("us")),
                    "n_users": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["source", "week", "user_id"], use_threads=False).aggregate([])
        h = g.group_by(["source", "week"], use_threads=False).aggregate(
            [("week", "count")]
        )
        ww = h["week"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": h["source"],
                "week_ts": pa.array(
                    ww * week_us + monday0_us, pa.int64()
                ).cast(pa.timestamp("us")),
                "n_users": pc.cast(h["week_count"], pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return hash_partition_merge(partials, "week", fold, k=_adaptive_k(sf_dir))


def events_session_conversion(
    sf_dir: str, gap_s: int = 6 * 3600
) -> Dataset:
    """E69: session conversion rate — corpus-wide session count, sessions
    containing at least one event of the TARGET type (the alphabetically
    first, the E51 funnel convention), and the conversion permille — the
    top-line "did the visit do the thing" number between E51's
    first-occurrence funnel and E50's duration board; exact int64
    (gaps-and-islands + max(CASE) oracle).

    Scale shape — E56's narrow per-event exchange (user, ts, order,
    is_target — payloads never shuffle) hash-partitioned by USER; each
    partition lexsorts its complete user streams once, splits sessions at
    the gap rule, and reduces straight to three integers via reduceat —
    session rows never materialize anywhere.

    Partitioning assumption: one user's full event stream fits a task
    (the E15 sessionize default); the windowed boundary-fold sessionize
    uses for hot keys applies verbatim if a corpus-hot user exists."""
    from ..stages.shuffle import hash_partition_merge

    target = sorted(events_src_list(sf_dir))[0]

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "user_id", "event_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def narrow(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "t": b["ts"].cast(pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
                "hit": pc.cast(
                    pc.equal(b["event_type"], target), pa.int64()
                ),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "g": pa.array([], pa.int64()),
                    "ns": pa.array([], pa.int64()),
                    "nc": pa.array([], pa.int64()),
                }
            )
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t["o"].combine_chunks().to_numpy(zero_copy_only=False)
        hh = t["hit"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((oo, tt, uu))
        u2, t2, h2 = uu[order], tt[order], hh[order]
        new_s = np.empty(len(order), dtype=bool)
        new_s[0] = True
        new_s[1:] = (u2[1:] != u2[:-1]) | (
            t2[1:] - t2[:-1] > gap_s * 1_000_000
        )
        starts = np.flatnonzero(new_s)
        conv = np.maximum.reduceat(h2, starts)
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "ns": pa.array([len(starts)], pa.int64()),
                "nc": pa.array([int(conv.sum())], pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "n_sessions": pa.array([], pa.int64()),
                    "n_converted": pa.array([], pa.int64()),
                    "conv_permille": pa.array([], pa.int64()),
                }
            )
        ns = int(t["ns"].combine_chunks().to_numpy(zero_copy_only=False).sum())
        nc = int(t["nc"].combine_chunks().to_numpy(zero_copy_only=False).sum())
        return pa.table(
            {
                "n_sessions": pa.array([ns], pa.int64()),
                "n_converted": pa.array([nc], pa.int64()),
                "conv_permille": pa.array(
                    [(1000 * nc) // max(ns, 1)], pa.int64()
                ),
            }
        )

    narrow_ds = ds.map_batches(narrow, batch_format="pyarrow")
    partials = hash_partition_merge(narrow_ds, "user_id", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(partials, "g", merge, k=1)


def events_mix_concentration(sf_dir: str) -> Dataset:
    """E70: daily source-mix concentration — per day: total events and
    the Simpson sufficient statistic Σₛ nₛ(nₛ−1) over source counts —
    "is today's traffic one source or a healthy mix" as exact integers
    (the concentration probability follows off-line as Σ/(n(n−1)); E38
    computes the same statistic per minute over USERS, E70 per day over
    SOURCES, reading E64's share board as one number); exact int64
    (two-level GROUP BY oracle).

    Scale shape — ONE exchange, E64's: per-batch (day, source, n) cells
    hash-partition by DAY so each day's source vector folds in place."""
    from ..stages.shuffle import hash_partition_merge

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "day": pa.array(ts_us // DAY_US, pa.int64()),
                "source": b["event_type"],
            }
        )
        g = t.group_by(["day", "source"], use_threads=False).aggregate(
            [("day", "count")]
        )
        return g.rename_columns(["day", "source", "n"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "day_ts": pa.array([], pa.timestamp("us")),
                    "n_events": pa.array([], pa.int64()),
                    "simpson_num": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["day", "source"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        dd = g["day"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        udays, inv = np.unique(dd, return_inverse=True)
        tot = np.zeros(len(udays), np.int64)
        np.add.at(tot, inv, nn)
        num = np.zeros(len(udays), np.int64)
        np.add.at(num, inv, nn * (nn - 1))
        return pa.table(
            {
                "day_ts": pa.array(udays * DAY_US, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "n_events": pa.array(tot),
                "simpson_num": pa.array(num),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return hash_partition_merge(partials, "day", merge, k=_adaptive_k(sf_dir))


def events_week_retention(sf_dir: str) -> Dataset:
    """E71: week-over-week retention — per Monday calendar week: active
    users, users ALSO active the previous week (retained), and the
    retained permille — the weekly habit line between E49's daily cohort
    triangle and E68's raw weekly reach; exact int64 (distinct user-weeks
    + lag oracle).

    Scale shape — E49's machinery on the WEEK axis: per batch one lexsort
    reduces events to distinct (user, week) pairs; user-hash partition
    decides each user's week set locally and re-reduces to (week, n, n_ret)
    partials (retained iff week-1 present in the same local set); one k=1
    merge sums O(weeks) rows."""
    from ..stages.shuffle import hash_partition_merge

    week_us = 7 * DAY_US
    monday0_us = 4 * DAY_US

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        uu = pc.cast(b["user_id"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        wk = (ts_us - monday0_us) // week_us
        order = np.lexsort((wk, uu))
        u2, w2 = uu[order], wk[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = (u2[1:] != u2[:-1]) | (w2[1:] != w2[:-1])
        st = np.flatnonzero(new)
        return pa.table(
            {
                "user_id": pa.array(u2[st], pa.int64()),
                "week": pa.array(w2[st], pa.int64()),
            }
        )

    def user_fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "week": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "nr": pa.array([], pa.int64()),
                }
            )
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        ww = t["week"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ww, uu))
        u2, w2 = uu[order], ww[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = (u2[1:] != u2[:-1]) | (w2[1:] != w2[:-1])
        su = np.flatnonzero(new)
        u3, w3 = u2[su], w2[su]
        ret = np.zeros(len(su), dtype=bool)
        ret[1:] = (u3[1:] == u3[:-1]) & (w3[1:] - w3[:-1] == 1)
        packed = w3 * 2 + ret
        vals, cnt = np.unique(packed, return_counts=True)
        wk = vals // 2
        isr = (vals % 2).astype(bool)
        out_w, inv = np.unique(wk, return_inverse=True)
        n = np.zeros(len(out_w), np.int64)
        nr = np.zeros(len(out_w), np.int64)
        np.add.at(n, inv, cnt)
        np.add.at(nr, inv[isr], cnt[isr])
        return pa.table(
            {
                "week": pa.array(out_w, pa.int64()),
                "n": pa.array(n),
                "nr": pa.array(nr),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "week_ts": pa.array([], pa.timestamp("us")),
                    "n_users": pa.array([], pa.int64()),
                    "n_retained": pa.array([], pa.int64()),
                    "retained_permille": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("week", use_threads=False).aggregate(
            [("n", "sum"), ("nr", "sum")]
        )
        ww = g["week"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        nr = g["nr_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "week_ts": pa.array(
                    ww * week_us + monday0_us, pa.int64()
                ).cast(pa.timestamp("us")),
                "n_users": pa.array(n.astype(np.int64)),
                "n_retained": pa.array(nr.astype(np.int64)),
                "retained_permille": pa.array(
                    (1000 * nr) // np.maximum(n, 1), pa.int64()
                ),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    per_user = hash_partition_merge(partials, "user_id", user_fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(per_user, "week", merge, k=1)


def events_nth_event_time(sf_dir: str, n: int = 5) -> Dataset:
    """E72: time-to-Nth-event — per (source, day) with at least ``n``
    events: the timestamp of the Nth event under (ts, event_id) order,
    plus the cell's total count — the "when did the feed warm up" /
    SLA-arrival board, and the grouped ASCENDING k-th order statistic
    that completes E18's top-k (selection, not ranking) and E47's
    argmax-per-hour family.  Exact int64 (row_number rn = n oracle).

    Scale shape — a per-batch SELECTION combiner: each batch keeps only
    its n smallest (ts, event_id) rows per cell (one lexsort; the global
    n smallest of a cell is always a subset of the union of per-batch
    n-smallest — the E18 superset argument in reverse order) plus one
    count partial per (cell, batch); ONE cell-hash exchange settles each
    cell entirely in its partition: candidates re-sort, the (n-1)th is
    THE global Nth, cells short of n drop.  Rows moved = O(batches ×
    cells × n) narrow int64, never the event stream."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "event_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def combine(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        ts_us = b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        oid = pc.cast(b["event_id"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        cell = (ts_us // DAY_US) * ns + code
        order = np.lexsort((oid, ts_us, cell))
        c2, t2, o2 = cell[order], ts_us[order], oid[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = c2[1:] != c2[:-1]
        starts = np.flatnonzero(new)
        gid = np.cumsum(new) - 1
        within = np.arange(len(order)) - starts[gid]
        keep = within < n
        lens = np.diff(np.append(starts, len(order)))
        cand = pa.table(
            {
                "cell": pa.array(c2[keep], pa.int64()),
                "t": pa.array(t2[keep], pa.int64()),
                "o": pa.array(o2[keep], pa.int64()),
                "cnt": pa.array(np.zeros(int(keep.sum()), np.int64)),
            }
        )
        cnts = pa.table(
            {
                "cell": pa.array(c2[starts], pa.int64()),
                "t": pa.array(np.full(len(starts), -1, np.int64)),
                "o": pa.array(np.full(len(starts), -1, np.int64)),
                "cnt": pa.array(lens.astype(np.int64)),
            }
        )
        return pa.concat_tables([cand, cnts])

    def settle(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "source": pa.array([], pa.string()),
                "day_ts": pa.array([], pa.timestamp("us")),
                "nth_ts": pa.array([], pa.timestamp("us")),
                "n_events": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        oo = t["o"].combine_chunks().to_numpy(zero_copy_only=False)
        is_cnt = oo < 0
        c = t.filter(pa.array(is_cnt))
        cg = c.group_by("cell", use_threads=False).aggregate([("cnt", "sum")])
        ck = cg["cell"].combine_chunks().to_numpy(zero_copy_only=False)
        ctot = cg["cnt_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        f = t.filter(pa.array(~is_cnt))
        if f.num_rows == 0:
            return empty
        cell = f["cell"].combine_chunks().to_numpy(zero_copy_only=False)
        ts_us = f["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oid = f["o"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((oid, ts_us, cell))
        c2, t2 = cell[order], ts_us[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = c2[1:] != c2[:-1]
        starts = np.flatnonzero(new)
        gid = np.cumsum(new) - 1
        within = np.arange(len(order)) - starts[gid]
        hit = within == n - 1
        if not hit.any():
            return empty
        hcell, hts = c2[hit], t2[hit]
        corder = np.argsort(ck, kind="stable")
        pos = np.searchsorted(ck[corder], hcell)
        tot = ctot[corder][pos]
        ok = tot >= n  # always true (a candidate at rank n-1 implies >= n)
        return pa.table(
            {
                "source": srcs.take(pa.array(hcell[ok] % ns, pa.int64())),
                "day_ts": pa.array((hcell[ok] // ns) * DAY_US, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "nth_ts": pa.array(hts[ok], pa.int64()).cast(pa.timestamp("us")),
                "n_events": pa.array(tot[ok], pa.int64()),
            }
        )

    partials = ds.map_batches(combine, batch_format="pyarrow")
    return hash_partition_merge(partials, "cell", settle, k=_adaptive_k(sf_dir))


def events_entry_exit(sf_dir: str) -> Dataset:
    """E73: entry/exit type board — per (first_type, last_type): users
    whose FIRST event (by ts, event_id) is first_type and LAST event is
    last_type — the "how journeys begin and end" matrix next to E56's
    step-by-step transitions (E56 counts every adjacent pair, E73 only
    each user's endpoints; the diagonal is single-mode users).  Exact
    int64 (row_number rn=1 / rn=n oracle).

    Scale shape — E56's narrow per-event exchange verbatim (user, ts,
    order, type-code; payloads never shuffle), user-hash partitioned;
    each partition lexsorts its complete user streams once and reads
    each run's endpoints directly, reducing straight to (first, last, n)
    partials; the k=1 merge sums O(types²) rows.  Type identity is an
    exact broadcast rank (E51 convention).  Partitioning assumption:
    one user's stream fits a task (the E15/E56 default)."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "user_id", "event_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def narrow(b: pa.Table) -> pa.Table:
        code = pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
        return pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "t": b["ts"].cast(pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
                "c": code,
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "fc": pa.array([], pa.int64()),
                    "lc": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t["o"].combine_chunks().to_numpy(zero_copy_only=False)
        cc = t["c"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((oo, tt, uu))
        u2, c2 = uu[order], cc[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = u2[1:] != u2[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(order)) - 1
        packed = c2[starts] * ns + c2[ends]
        vals, cnt = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "fc": pa.array(vals // ns, pa.int64()),
                "lc": pa.array(vals % ns, pa.int64()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "first_type": pa.array([], pa.string()),
                    "last_type": pa.array([], pa.string()),
                    "n_users": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["fc", "lc"], use_threads=False).aggregate([("n", "sum")])
        fi = pa.array(
            g["fc"].combine_chunks().to_numpy(zero_copy_only=False), pa.int64()
        )
        li = pa.array(
            g["lc"].combine_chunks().to_numpy(zero_copy_only=False), pa.int64()
        )
        return pa.table(
            {
                "first_type": srcs.take(fi),
                "last_type": srcs.take(li),
                "n_users": pc.cast(g["n_sum"], pa.int64()),
            }
        )

    narrow_ds = ds.map_batches(narrow, batch_format="pyarrow")
    partials = hash_partition_merge(narrow_ds, "user_id", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(partials, "fc", merge, k=1)


def events_intersession_gaps(
    sf_dir: str, gap_s: int = 6 * 3600, qs: tuple[int, ...] = (500, 900, 990)
) -> Dataset:
    """E74: inter-session gap distribution — corpus-wide count plus
    discrete p50/p90/p99 and max of the floor-second gap between a
    user's consecutive sessions (previous end → next start) — "how long
    do users stay AWAY", the complement of E50's within-session
    durations and the continuous dual of E53's whole-day return gaps.
    Exact int64 under the quantile_disc rank rule (gaps-and-islands CTE
    + lag-over-sessions + quantile_disc oracle); a corpus with no
    returning user yields the n_gaps=0 row with NULL quantiles, exactly
    like the SQL aggregate.

    Scale shape: sessions come off E15's bounded (key, window)+fold
    machinery; ONE user-hash exchange of narrow session rows (sessions
    per user are bounded by the gap rule) lets each partition lexsort
    its users' sessions once and diff consecutive (end, next-start)
    pairs; flooring gaps to SECONDS bounds the histogram domain, so
    only (gap_s, freq) partials reach the k=1 quantile merge (E50's
    histogram convention)."""
    from ..stages.shuffle import hash_partition_merge

    sess = events_sessions(sf_dir, gap_s=gap_s)

    def narrow(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "sid": pc.cast(b["session_id"], pa.int64()),
                "st": b["start_ts"].cast(pa.int64()),
                "en": b["end_ts"].cast(pa.int64()),
            }
        )

    def gap_partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "g": pa.array([], pa.int64()),
                "gap_s": pa.array([], pa.int64()),
                "f": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        si = t["sid"].combine_chunks().to_numpy(zero_copy_only=False)
        st = t["st"].combine_chunks().to_numpy(zero_copy_only=False)
        en = t["en"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((si, uu))
        u2, st2, en2 = uu[order], st[order], en[order]
        same = u2[1:] == u2[:-1]
        gaps = (st2[1:][same] - en2[:-1][same]) // 1_000_000
        vals, freq = np.unique(gaps, return_counts=True)
        return pa.table(
            {
                "g": pa.array(np.zeros(len(vals), np.int64)),
                "gap_s": pa.array(vals, pa.int64()),
                "f": pa.array(freq.astype(np.int64)),
            }
        )

    names = tuple(f"p{q // 10}_s" for q in qs)

    def merge(t: pa.Table) -> pa.Table:
        vv = t["gap_s"].combine_chunks().to_numpy(zero_copy_only=False)
        ff = t["f"].combine_chunks().to_numpy(zero_copy_only=False)
        nz = ff > 0
        vv, ff = vv[nz], ff[nz]
        if len(vv) == 0:
            null = pa.array([None], pa.int64())
            return pa.table(
                {
                    "n_gaps": pa.array([0], pa.int64()),
                    **{c: null for c in names},
                    "max_s": null,
                }
            )
        order = np.argsort(vv, kind="stable")
        v2 = vv[order]
        ng = np.empty(len(order), dtype=bool)
        ng[0] = True
        ng[1:] = v2[1:] != v2[:-1]
        gs = np.flatnonzero(ng)
        vals = v2[gs]
        freq = np.add.reduceat(ff[order], gs)
        n = int(freq.sum())
        cum = np.cumsum(freq)
        out = {"n_gaps": pa.array([n], pa.int64())}
        for q, c in zip(qs, names):
            thr = (n * q + 999) // 1000
            out[c] = pa.array([int(vals[np.searchsorted(cum, thr)])], pa.int64())
        out["max_s"] = pa.array([int(vals[-1])], pa.int64())
        return pa.table(out)

    seed = rd.from_arrow(
        pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "gap_s": pa.array([0], pa.int64()),
                "f": pa.array([0], pa.int64()),
            }
        )
    )
    partials = (
        hash_partition_merge(
            sess.map_batches(narrow, batch_format="pyarrow"),
            "user_id",
            gap_partial,
            k=_adaptive_k(sf_dir),
        )
        .union(seed)
    )
    return hash_partition_merge(partials, "g", merge, k=1)


def events_ramps(sf_dir: str, window_buckets: int = 4096) -> Dataset:
    """E75: ramp detector — per source over the DENSE gap-filled 1m grid:
    the longest run of CONSECUTIVE strictly-rising minutes, the number of
    such maximal runs, and the total rising minutes — the sustained-growth
    /spin-up detector next to E37's CUSUM level shifts (CUSUM finds how
    far a burst got, E75 how long the climb lasted); zero minutes break a
    ramp because the grid is gap-filled.  Exact int64 (gapfill + lag +
    gaps-and-islands oracle; a run is counted in RISING PAIRS, so a ramp
    of m ever-increasing minutes scores m−1).

    Scale shape — pure composition of two existing scale-safe stages:
    E19's grid_lag supplies each minute's predecessor count under the
    (source, window)+1-row-halo partitioning (a source's history never
    lands in one task), a stateless filter keeps the rising minutes, and
    the shared `_streak_stats` summary/fold kernel (E43/E46's machinery,
    unchanged) turns them into per-source run statistics — after its one
    exchange only O(sources × windows) summary rows move."""
    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    d = events_delta_1m(sf_dir)

    def rising(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater(b["delta_count"], 0)).select(
            ["source", "bucket_ts"]
        )

    flags = d.map_batches(rising, batch_format="pyarrow")
    return _streak_stats(
        flags, srcs, _adaptive_k(sf_dir), window_buckets,
        ("max_ramp", "n_ramps", "n_rising"),
    )


def events_session_size_hist(sf_dir: str, gap_s: int = 6 * 3600) -> Dataset:
    """E76: session-size histogram — for each event count s: how many
    sessions contain exactly s events — the visit-depth distribution
    completing the session triptych (E50 how LONG visits run, E54 how
    OFTEN users visit, E76 how MUCH happens inside one); exact int64
    (gaps-and-islands CTE + per-session count + GROUP BY oracle).

    Scale shape: sessions come off E15's bounded machinery already
    carrying n_events; each batch collapses to (n_events, freq) partials
    (one np.unique — bounded by the largest session, not session count),
    and only those ride the k=1 merge."""
    from ..stages.shuffle import hash_partition_merge

    sess = events_sessions(sf_dir, gap_s=gap_s)

    def partial(b: pa.Table) -> pa.Table:
        ne = pc.cast(b["n_events"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        vals, freq = np.unique(ne, return_counts=True)
        return pa.table(
            {
                "g": pa.array(np.zeros(len(vals), np.int64)),
                "n_events": pa.array(vals, pa.int64()),
                "f": pa.array(freq.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "n_events": pa.array([], pa.int64()),
                    "n_sessions": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("n_events", use_threads=False).aggregate([("f", "sum")])
        return g.rename_columns(["n_events", "n_sessions"])

    partials = sess.map_batches(partial, batch_format="pyarrow")
    return hash_partition_merge(partials, "g", merge, k=1)


def events_top_user_minutes(sf_dir: str, kk: int = 3) -> Dataset:
    """E77: top-k minutes by distinct users — per source, the kk minutes
    with the most DISTINCT active users (n_users DESC, minute ASC, 1-based
    rank — unique answer) — the crowd-peak drill-down: E47 ranks minutes
    by event volume, E77 by AUDIENCE, and the two disagree exactly when
    bots inflate volume (E38's concentration flag as a leaderboard).
    Exact int64 (distinct user-minute + row_number oracle).

    Scale shape — a distinct-cardinality feeding a grouped top-k, the
    E23→E18 composition: per batch one Arrow group_by reduces events to
    distinct (source, minute, user) triples; ONE minute-hash exchange
    dedupes each cell exactly (a cell lives wholly in its partition) and
    keeps the partition's LOCAL top-k per source (a cell's count is
    final, so local top-k is a valid combiner); the k=1 merge re-ranks
    O(partitions × sources × kk) candidate rows."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        ts_us = b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        t = pa.table(
            {
                "cell": pa.array((ts_us // MIN_US) * ns + code, pa.int64()),
                "user_id": pc.cast(b["user_id"], pa.int64()),
            }
        )
        return t.group_by(["cell", "user_id"], use_threads=False).aggregate([])

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "src": pa.array([], pa.int64()),
                "minute": pa.array([], pa.int64()),
                "n_users": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        cc = t["cell"].combine_chunks().to_numpy(zero_copy_only=False)
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((uu, cc))
        c2, u2 = cc[order], uu[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = (c2[1:] != c2[:-1]) | (u2[1:] != u2[:-1])
        su = np.flatnonzero(new)
        c3 = c2[su]
        newc = np.empty(len(su), dtype=bool)
        newc[0] = True
        newc[1:] = c3[1:] != c3[:-1]
        cs = np.flatnonzero(newc)
        cells = c3[cs]
        nu = np.diff(np.append(cs, len(c3)))
        src = cells % ns
        minute = cells // ns
        # local top-k per source: (src, -n_users, minute) lexsort
        order2 = np.lexsort((minute, -nu, src))
        s2 = src[order2]
        news = np.empty(len(order2), dtype=bool)
        if len(order2) == 0:
            return empty
        news[0] = True
        news[1:] = s2[1:] != s2[:-1]
        sstart = np.flatnonzero(news)
        gid = np.cumsum(news) - 1
        within = np.arange(len(order2)) - sstart[gid]
        keep = within < kk
        sel = order2[keep]
        return pa.table(
            {
                "src": pa.array(src[sel], pa.int64()),
                "minute": pa.array(minute[sel], pa.int64()),
                "n_users": pa.array(nu[sel].astype(np.int64), pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "minute_ts": pa.array([], pa.timestamp("us")),
                    "n_users": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        minute = t["minute"].combine_chunks().to_numpy(zero_copy_only=False)
        nu = t["n_users"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((minute, -nu, src))
        s2 = src[order]
        news = np.empty(len(order), dtype=bool)
        news[0] = True
        news[1:] = s2[1:] != s2[:-1]
        sstart = np.flatnonzero(news)
        gid = np.cumsum(news) - 1
        within = np.arange(len(order)) - sstart[gid]
        keep = within < kk
        sel = order[keep]
        return pa.table(
            {
                "source": srcs.take(pa.array(src[sel], pa.int64())),
                "minute_ts": pa.array(minute[sel] * MIN_US, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "n_users": pa.array(nu[sel], pa.int64()),
                "rank": pa.array(within[keep] + 1, pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    cand = hash_partition_merge(partials, "cell", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cand, "src", merge, k=1)


def events_user_type_diversity(sf_dir: str) -> Dataset:
    """E78: user type-diversity histogram — for each s: users active in
    exactly s distinct event types — the breadth-of-usage distribution
    next to E36's events-per-user depth histogram (depth says how MUCH,
    diversity how WIDELY; single-type users are the integration-risk
    mass E57's overlap matrix aggregates away).  Exact int64 (distinct
    user-type + two-level GROUP BY oracle).

    Scale shape — E36's aggregate-of-aggregates on the type axis: per
    batch one Arrow group_by reduces events to distinct (user, type)
    pairs; user-hash partition decides each user's exact distinct-type
    count locally (pairs dedupe in place) and immediately re-reduces to
    (n_types, n_users) partials; k=1 merge sums O(n_types) rows."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
        t = pa.table({"c": code, "user_id": pc.cast(b["user_id"], pa.int64())})
        return t.group_by(["user_id", "c"], use_threads=False).aggregate([])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "n_types": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        cc = t["c"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cc, uu))
        u2, c2 = uu[order], cc[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = (u2[1:] != u2[:-1]) | (c2[1:] != c2[:-1])
        su = np.flatnonzero(new)
        u3 = u2[su]
        newu = np.empty(len(su), dtype=bool)
        newu[0] = True
        newu[1:] = u3[1:] != u3[:-1]
        us = np.flatnonzero(newu)
        s = np.diff(np.append(us, len(u3)))
        vals, cnt = np.unique(s, return_counts=True)
        return pa.table(
            {
                "n_types": pa.array(vals.astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "n_types": pa.array([], pa.int64()),
                    "n_users": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("n_types", use_threads=False).aggregate([("n", "sum")])
        return g.rename_columns(["n_types", "n_users"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    per_user = hash_partition_merge(partials, "user_id", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(per_user, "n_types", merge, k=1)


def events_dispersion(sf_dir: str) -> Dataset:
    """E79: burstiness dispersion stats — per source over the dense 1m
    grid: n_minutes (inclusive span), n_events (=Σ per-minute counts),
    and Σcount² — the exact-int64 sufficient statistics of the Fano
    factor / index of dispersion (var/mean; ≫1 = bursty, ≈1 = Poisson),
    the one-number burstiness next to E42's robust median/MAD and E39's
    inter-arrival histogram.  Zero minutes contribute nothing to either
    Σ, so the dense grid NEVER materializes (E41's zero-vanishing
    trick): rolled points plus the span bound recover it arithmetically.
    Exact (minute-rollup + SUM + date_diff span oracle).

    Scale shape: the 1m rollup's (source, bucket, count) rows — one row
    per cell by construction, so Σcount² is a plain per-batch partial —
    reduce to (n_present, Σc, Σc², min_idx, max_idx) per source per
    batch; one tiny k=1 source merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)
    rolled = events_rollup(sf_dir, "1m").select_columns(
        ["source", "bucket_ts", "count"]
    )

    def partial(b: pa.Table) -> pa.Table:
        code = pc.cast(
            pc.index_in(b["source"], value_set=srcs), pa.int64()
        ).combine_chunks().to_numpy(zero_copy_only=False)
        idx = (
            b["bucket_ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            - EVENTS_T0_US
        ) // MIN_US
        c = pc.cast(b["count"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        sums = np.zeros(ns, np.int64)
        sq = np.zeros(ns, np.int64)
        npn = np.zeros(ns, np.int64)
        lo = np.full(ns, np.iinfo(np.int64).max, np.int64)
        hi = np.full(ns, np.iinfo(np.int64).min, np.int64)
        np.add.at(sums, code, c)
        np.add.at(sq, code, c * c)
        np.add.at(npn, code, 1)
        np.minimum.at(lo, code, idx)
        np.maximum.at(hi, code, idx)
        keep = npn > 0
        return pa.table(
            {
                "src": pa.array(np.flatnonzero(keep).astype(np.int64)),
                "s": pa.array(sums[keep]),
                "sq": pa.array(sq[keep]),
                "lo": pa.array(lo[keep]),
                "hi": pa.array(hi[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_minutes": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "sum_sq": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("src", use_threads=False).aggregate(
            [("s", "sum"), ("sq", "sum"), ("lo", "min"), ("hi", "max")]
        )
        si = pa.array(
            g["src"].combine_chunks().to_numpy(zero_copy_only=False), pa.int64()
        )
        lo = g["lo_min"].combine_chunks().to_numpy(zero_copy_only=False)
        hi = g["hi_max"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": srcs.take(si),
                "n_minutes": pa.array(hi - lo + 1, pa.int64()),
                "n_events": pc.cast(g["s_sum"], pa.int64()),
                "sum_sq": pc.cast(g["sq_sum"], pa.int64()),
            }
        )

    partials = rolled.map_batches(partial, batch_format="pyarrow")
    return hash_partition_merge(partials, "src", merge, k=1)


def events_primary_type(sf_dir: str) -> Dataset:
    """E80: primary-mode board — per event type: users for whom it is the
    MOST FREQUENT type (ties break by type string ascending via the exact
    broadcast rank, so every user has exactly one primary) — the
    "what is each user mainly here for" partition of the user base,
    the grouped-ARGMAX dual of E78's breadth histogram; exact int64
    (per-(user, type) counts + row_number rn=1 oracle).

    Scale shape — E36's aggregate-of-aggregates with an argmax fold: per
    batch one Arrow group_by to (user, type, n) partials; user-hash
    partition collapses partials per (user, type) exactly, one lexsort
    (user, −n, type) reads each user's argmax as its run head, and a
    bincount re-reduces straight to (type, n_users) partials; k=1 merge
    of O(types) rows."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
        t = pa.table({"c": code, "user_id": pc.cast(b["user_id"], pa.int64())})
        g = t.group_by(["user_id", "c"], use_threads=False).aggregate(
            [("c", "count")]
        )
        return g.rename_columns(["user_id", "c", "n"])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"c": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        g = t.group_by(["user_id", "c"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        uu = g["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        cc = g["c"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cc, -nn, uu))
        u2, c2 = uu[order], cc[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = u2[1:] != u2[:-1]
        top = c2[new]
        cnt = np.bincount(top, minlength=ns).astype(np.int64)
        keep = cnt > 0
        return pa.table(
            {
                "c": pa.array(np.flatnonzero(keep).astype(np.int64)),
                "n": pa.array(cnt[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "primary_type": pa.array([], pa.string()),
                    "n_users": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("c", use_threads=False).aggregate([("n", "sum")])
        ci = pa.array(
            g["c"].combine_chunks().to_numpy(zero_copy_only=False), pa.int64()
        )
        return pa.table(
            {
                "primary_type": srcs.take(ci),
                "n_users": pc.cast(g["n_sum"], pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    per_user = hash_partition_merge(partials, "user_id", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(per_user, "c", merge, k=1)


def events_interarrival_quantiles(
    sf_dir: str,
    window_us: int = TEMPORAL_WINDOW_US,
    qs: tuple[int, ...] = (500, 900, 990),
) -> Dataset:
    """E81: inter-arrival quantiles — per source: n_gaps + discrete
    p50/p90/p99 of the floor-second gap between consecutive events in
    (ts, event_id) order — the EXACT centre of the distribution E39 bins
    logarithmically and E32 takes the max of (the liveness SLO number:
    "half of all gaps are under N seconds"); exact int64 under the
    quantile_disc rank rule (lag + quantile_disc oracle).

    Scale shape — E39's order-dependent machinery verbatim ((source,
    ts-window) sub-partitioning + the shared `_last_event_carries`
    predecessor round) with a histogram tail instead of log2 bins:
    flooring gaps to SECONDS bounds the value domain, so each partition
    reduces to (src, gap_s, n) partials and all quantiles read off one
    cumulative sum per source in the k=1 merge."""
    from ..stages.shuffle import hash_partition_merge, shuffle_parts
    from ..stages.temporal import _kw_partition

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def narrow(b: pa.Table) -> pa.Table:
        ts_us = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "k": pc.cast(
                    pc.index_in(b["event_type"], value_set=srcs), pa.int64()
                ),
                "t": pa.array(ts_us, pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
                "v": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
                "carry": pa.array(np.zeros(b.num_rows, dtype=bool)),
                "w": pa.array(ts_us // window_us, pa.int64()),
            }
        )

    tagged = ds.map_batches(narrow, batch_format="pyarrow")
    carries = _last_event_carries(tagged)
    full = tagged.union(carries.map_batches(_tag_carry, batch_format="pyarrow"))

    def kernel(t_: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "src": pa.array([], pa.int64()),
                "gap_s": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if t_.num_rows == 0:
            return empty
        kk = t_["k"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t_["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t_["o"].combine_chunks().to_numpy(zero_copy_only=False)
        cr = t_["carry"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cr, oo, tt, kk))
        ks, ts_, crs = kk[order], tt[order], cr[order]
        n = len(order)
        has_prev = np.empty(n, dtype=bool)
        has_prev[0] = False
        has_prev[1:] = ks[1:] == ks[:-1]
        pt = np.empty(n, dtype=np.int64)
        pt[0] = 0
        pt[1:] = ts_[:-1]
        sel = has_prev & ~crs
        if not sel.any():
            return empty
        gaps = (ts_[sel] - pt[sel]) // 1_000_000
        order2 = np.lexsort((gaps, ks[sel]))
        k2, g2 = ks[sel][order2], gaps[order2]
        new = np.empty(len(order2), dtype=bool)
        new[0] = True
        new[1:] = (k2[1:] != k2[:-1]) | (g2[1:] != g2[:-1])
        st = np.flatnonzero(new)
        return pa.table(
            {
                "src": pa.array(k2[st], pa.int64()),
                "gap_s": pa.array(g2[st], pa.int64()),
                "n": pa.array(
                    np.diff(np.append(st, len(order2))).astype(np.int64)
                ),
            }
        )

    partials = _kw_partition(full, kernel, shuffle_parts(_adaptive_k(sf_dir)))
    names = tuple(f"p{q // 10}_s" for q in qs)

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_gaps": pa.array([], pa.int64()),
                    **{c: pa.array([], pa.int64()) for c in names},
                }
            )
        g = t.group_by(["src", "gap_s"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        ss = g["src"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = g["gap_s"].combine_chunks().to_numpy(zero_copy_only=False)
        ff = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((vv, ss))
        s2, v2, f2 = ss[order], vv[order], ff[order]
        news = np.empty(len(order), dtype=bool)
        news[0] = True
        news[1:] = s2[1:] != s2[:-1]
        sstart = np.flatnonzero(news)
        send = np.append(sstart[1:], len(order))
        out = {"source": [], "n_gaps": [], **{c: [] for c in names}}
        for a, b in zip(sstart, send):
            vals, freq = v2[a:b], f2[a:b]
            nt = int(freq.sum())
            cum = np.cumsum(freq)
            out["source"].append(int(s2[a]))
            out["n_gaps"].append(nt)
            for q, c in zip(qs, names):
                thr = (nt * q + 999) // 1000
                out[c].append(int(vals[np.searchsorted(cum, thr)]))
        return pa.table(
            {
                "source": srcs.take(pa.array(out["source"], pa.int64())),
                "n_gaps": pa.array(out["n_gaps"], pa.int64()),
                **{c: pa.array(out[c], pa.int64()) for c in names},
            }
        )

    return hash_partition_merge(partials, "src", merge, k=1)


def events_props_stats(sf_dir: str) -> Dataset:
    """E82: props JSON lane — per source: total events, unparsable-props
    count, and sum / min / max / discrete p50 of the integer ``k`` field
    inside the ``props`` JSON payload — the first operator to consume the
    message BODY's structured payload rather than the envelope columns,
    the Ray analog of the reference's per-message JSON parse + validate
    lane (consumer payload unmarshalling, reference internal/consumer
    semantics) fused with an aggregate: parse failures are COUNTED into a
    reject column instead of killing the batch, exactly the reference's
    Reject-without-requeue disposition.  Exact int64 (TRY_CAST +
    regexp_extract + quantile_disc oracle).

    Scale shape — one RE2 ``extract_regex`` kernel per batch (compiled
    once per worker by Arrow, no Python-level row loop), then the
    bounded-domain histogram trick (E81): valid rows reduce to
    (source, k-value, freq) partials — the value domain of a payload
    field is its OWN cardinality, not the row count — so sum/min/max and
    any discrete quantile all read off one cumulative sum per source in
    the k=1 merge; bad rows ride as one counter row per (batch, source)."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "props"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        ex = pc.extract_regex(
            b["props"].combine_chunks(), r'"k"\s*:\s*(?P<v>-?\d+)'
        )
        k = pc.cast(pc.struct_field(ex, "v"), pa.int64())
        bad = pc.is_null(k).to_numpy(zero_copy_only=False)
        kv = pc.fill_null(k, 0).to_numpy(zero_copy_only=False)
        rows = {"c": [], "k": [], "bad": [], "n": []}
        ok = ~bad
        if ok.any():
            # bias keeps negative payload values inside the 32-bit lane
            packed = (
                code[ok] * (1 << 32) + kv[ok].astype(np.int64) + (1 << 31)
            )
            vals, freq = np.unique(packed, return_counts=True)
            rows["c"].append(vals >> 32)
            rows["k"].append((vals & 0xFFFFFFFF) - (1 << 31))
            rows["bad"].append(np.zeros(len(vals), np.int64))
            rows["n"].append(freq.astype(np.int64))
        if bad.any():
            bc = np.bincount(code[bad], minlength=len(srcs))
            nz = np.flatnonzero(bc)
            rows["c"].append(nz.astype(np.int64))
            rows["k"].append(np.zeros(len(nz), np.int64))
            rows["bad"].append(bc[nz].astype(np.int64))
            rows["n"].append(np.zeros(len(nz), np.int64))
        return pa.table(
            {
                col: pa.array(
                    np.concatenate(rows[col])
                    if rows[col]
                    else np.array([], np.int64)
                )
                for col in ("c", "k", "bad", "n")
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "source": pa.array([], pa.string()),
                "n_events": pa.array([], pa.int64()),
                "n_bad": pa.array([], pa.int64()),
                "sum_k": pa.array([], pa.int64()),
                "min_k": pa.array([], pa.int64()),
                "max_k": pa.array([], pa.int64()),
                "p50_k": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        g = t.group_by(["c", "k"], use_threads=False).aggregate(
            [("n", "sum"), ("bad", "sum")]
        )
        cc = g["c"].combine_chunks().to_numpy(zero_copy_only=False)
        kk = g["k"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        bb = g["bad_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((kk, cc))
        c2, k2, n2, b2 = cc[order], kk[order], nn[order], bb[order]
        news = np.empty(len(order), dtype=bool)
        news[0] = True
        news[1:] = c2[1:] != c2[:-1]
        starts = np.flatnonzero(news)
        ends = np.append(starts[1:], len(order))
        out = {c: [] for c in ("src", "n", "bad", "s", "lo", "hi", "p50")}
        for a, b in zip(starts, ends):
            vals, freq = k2[a:b], n2[a:b]
            nbad = int(b2[a:b].sum())
            nv = int(freq.sum())
            out["src"].append(int(c2[a]))
            out["n"].append(nv + nbad)
            out["bad"].append(nbad)
            out["s"].append(int((vals * freq).sum()))
            live = freq > 0
            if live.any():
                lv = vals[live]
                out["lo"].append(int(lv[0]))
                out["hi"].append(int(lv[-1]))
                cum = np.cumsum(freq)
                thr = (nv * 500 + 999) // 1000
                out["p50"].append(int(vals[np.searchsorted(cum, thr)]))
            else:  # all rows for this source were unparsable
                out["lo"].append(0)
                out["hi"].append(0)
                out["p50"].append(0)
        return pa.table(
            {
                "source": srcs.take(pa.array(out["src"], pa.int64())),
                "n_events": pa.array(out["n"], pa.int64()),
                "n_bad": pa.array(out["bad"], pa.int64()),
                "sum_k": pa.array(out["s"], pa.int64()),
                "min_k": pa.array(out["lo"], pa.int64()),
                "max_k": pa.array(out["hi"], pa.int64()),
                "p50_k": pa.array(out["p50"], pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return hash_partition_merge(partials, "c", merge, k=1)


def events_coverage_quantiles(
    sf_dir: str, qs: tuple[int, ...] = (500, 900)
) -> Dataset:
    """E83: engagement-coverage quantiles — per source: n_users + discrete
    p50/p90 of each (source, user)'s 1000·active_days // span_days (span =
    last day − first day + 1) — the CONTINUITY of engagement E65's tenure
    histogram ignores (a 100-day-tenure user with 3 active days scores 30;
    a daily user scores 1000): the churn-risk shape next to E62's
    stickiness ratio.  Exact int64 under the quantile_disc rank rule
    (distinct user-day + span + quantile_disc oracle).

    Scale shape — E36's aggregate-of-aggregates feeding T21's mergeable
    histogram: per batch one lexsort reduces events to distinct (source,
    user, day) triples; ONE user-hash exchange co-locates each (source,
    user)'s days, where a group_by settles exact distinct-day count +
    span and the 1001-value coverage permille reduces to (source, cov,
    freq) partials; every quantile reads off one cumsum per source in
    the k=1 merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        ts_us = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        )
        uu = pc.cast(b["user_id"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        day = ts_us // DAY_US
        order = np.lexsort((day, uu, code))
        c2, u2, d2 = code[order], uu[order], day[order]
        new = np.empty(len(order), dtype=bool)
        if len(order):
            new[0] = True
            new[1:] = (
                (c2[1:] != c2[:-1]) | (u2[1:] != u2[:-1]) | (d2[1:] != d2[:-1])
            )
        return pa.table(
            {
                "s": pa.array(c2[new]),
                "u": pa.array(u2[new]),
                "d": pa.array(d2[new]),
            }
        )

    names = tuple(f"p{q // 10}" for q in qs)

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "s": pa.array([], pa.int64()),
                    "cov": pa.array([], pa.int64()),
                    "f": pa.array([], pa.int64()),
                }
            )
        # batches overlap: re-dedupe triples, then settle each (s, u)
        dd = t.group_by(["s", "u", "d"], use_threads=False).aggregate(
            [("d", "count")]
        )
        g = dd.group_by(["s", "u"], use_threads=False).aggregate(
            [("d", "count"), ("d", "min"), ("d", "max")]
        )
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        nd = g["d_count"].combine_chunks().to_numpy(zero_copy_only=False)
        lo = g["d_min"].combine_chunks().to_numpy(zero_copy_only=False)
        hi = g["d_max"].combine_chunks().to_numpy(zero_copy_only=False)
        cov = (1000 * nd) // (hi - lo + 1)
        packed = ss * 1001 + cov
        vals, freq = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "s": pa.array(vals // 1001, pa.int64()),
                "cov": pa.array(vals % 1001, pa.int64()),
                "f": pa.array(freq.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_users": pa.array([], pa.int64()),
                    **{c: pa.array([], pa.int64()) for c in names},
                }
            )
        g = t.group_by(["s", "cov"], use_threads=False).aggregate(
            [("f", "sum")]
        )
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = g["cov"].combine_chunks().to_numpy(zero_copy_only=False)
        ff = g["f_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((vv, ss))
        s2, v2, f2 = ss[order], vv[order], ff[order]
        news = np.empty(len(order), dtype=bool)
        news[0] = True
        news[1:] = s2[1:] != s2[:-1]
        starts = np.flatnonzero(news)
        ends = np.append(starts[1:], len(order))
        out = {"source": [], "n_users": [], **{c: [] for c in names}}
        for a, b in zip(starts, ends):
            vals, freq = v2[a:b], f2[a:b]
            nt = int(freq.sum())
            cum = np.cumsum(freq)
            out["source"].append(int(s2[a]))
            out["n_users"].append(nt)
            for q, c in zip(qs, names):
                thr = (nt * q + 999) // 1000
                out[c].append(int(vals[np.searchsorted(cum, thr)]))
        return pa.table(
            {
                "source": srcs.take(pa.array(out["source"], pa.int64())),
                "n_users": pa.array(out["n_users"], pa.int64()),
                **{c: pa.array(out[c], pa.int64()) for c in names},
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    per_user = hash_partition_merge(partials, "u", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(per_user, "s", merge, k=1)


def events_redelivery_board(sf_dir: str) -> Dataset:
    """E84: redelivery / idempotency board — per source: raw deliveries,
    DISTINCT event_ids, redelivered copies (raw − distinct), redelivery
    permille — the at-least-once-delivery accounting behind the
    reference's Ack/Requeue contract (a requeued message arrives again
    with the same id; an idempotent sink must count it once — the board
    says how much of the feed is re-sent): one dense row per source
    ALWAYS, zero-valued when delivery is exactly-once.  Exact int64
    (count(DISTINCT event_id) oracle).

    Scale shape — the E23 distinct-count discipline with a raw-counter
    stream riding the same exchange: per batch one lexsort dedupes to
    (source, event_id) pairs plus one bincount row per (batch, source)
    carrying raw counts (tagged id −1); ONE id-hash exchange dedupes
    pairs exactly — each partition re-reduces to per-source (raw, uniq)
    partials — and the k=1 merge sums O(k × sources) rows."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "event_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        eid = pc.cast(b["event_id"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        raw = np.bincount(code, minlength=ns).astype(np.int64)
        live = np.flatnonzero(raw)
        order = np.lexsort((eid, code))
        c2, e2 = code[order], eid[order]
        new = np.empty(len(order), dtype=bool)
        if len(order):
            new[0] = True
            new[1:] = (c2[1:] != c2[:-1]) | (e2[1:] != e2[:-1])
        return pa.table(
            {
                # counter rows spread over sources (eid = -1-src), so no
                # single partition collects every batch's counters
                "eid": pa.array(
                    np.concatenate(
                        [-1 - live.astype(np.int64), e2[new]]
                    )
                ),
                "s": pa.array(
                    np.concatenate([live.astype(np.int64), c2[new]])
                ),
                "raw": pa.array(
                    np.concatenate(
                        [raw[live], np.zeros(int(new.sum()), np.int64)]
                    )
                ),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "s": pa.array([], pa.int64()),
                    "raw": pa.array([], pa.int64()),
                    "uniq": pa.array([], pa.int64()),
                }
            )
        eid = t["eid"].combine_chunks().to_numpy(zero_copy_only=False)
        ss = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
        rawv = t["raw"].combine_chunks().to_numpy(zero_copy_only=False)
        is_ctr = eid < 0
        raw_sum = np.bincount(ss[is_ctr], weights=rawv[is_ctr], minlength=ns)
        # exact distinct (source, id) pairs across overlapping batches
        c2, e2 = ss[~is_ctr], eid[~is_ctr]
        order = np.lexsort((e2, c2))
        c2, e2 = c2[order], e2[order]
        new = np.empty(len(order), dtype=bool)
        if len(order):
            new[0] = True
            new[1:] = (c2[1:] != c2[:-1]) | (e2[1:] != e2[:-1])
        uniq = np.bincount(c2[new], minlength=ns).astype(np.int64)
        live = (raw_sum > 0) | (uniq > 0)
        idx = np.flatnonzero(live)
        return pa.table(
            {
                "s": pa.array(idx.astype(np.int64)),
                "raw": pa.array(raw_sum[idx].astype(np.int64)),
                "uniq": pa.array(uniq[idx]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_raw": pa.array([], pa.int64()),
                    "n_unique": pa.array([], pa.int64()),
                    "n_redelivered": pa.array([], pa.int64()),
                    "redelivery_permille": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("s", use_threads=False).aggregate(
            [("raw", "sum"), ("uniq", "sum")]
        )
        raw = g["raw_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        un = g["uniq_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        red = raw - un
        return pa.table(
            {
                "source": srcs.take(g["s"].combine_chunks()),
                "n_raw": pa.array(raw.astype(np.int64)),
                "n_unique": pa.array(un.astype(np.int64)),
                "n_redelivered": pa.array(red.astype(np.int64)),
                "redelivery_permille": pa.array(
                    (1000 * red) // np.maximum(raw, 1)
                ),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    per_id = hash_partition_merge(partials, "eid", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(per_id, "s", merge, k=1)


def events_minute_mode(sf_dir: str) -> Dataset:
    """E85: per-minute dominant-type board — one row per minute PRESENT
    in the stream: the most frequent event type that minute (ties → type
    string ascending via the exact broadcast rank), its count, and the
    minute's total — E80's grouped argmax flipped to the HIGH-CARDINALITY
    axis (E80 partitions the USER base, one row per type; E85 emits one
    row per minute — the output scales with the grid, so the argmax must
    settle DISTRIBUTED, never in a k=1 funnel).  Exact int64 (per-minute
    counts + row_number rn=1 oracle).

    Scale shape — the rollup discipline with an argmax fold: per batch
    one Arrow group_by to (minute, type, n) partials; ONE minute-hash
    exchange collapses partials exactly per (minute, type), a lexsort
    (minute, −n, type) reads each minute's argmax as its run head and a
    reduceat supplies the total — final rows LEAVE each partition
    directly (no global merge; minutes already partition the output)."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        m = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
            // MIN_US
        )
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        packed = m * len(srcs) + code
        vals, freq = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "m": pa.array(vals // len(srcs), pa.int64()),
                "c": pa.array(vals % len(srcs), pa.int64()),
                "n": pa.array(freq.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "minute_ts": pa.array([], pa.timestamp("us")),
                    "mode_type": pa.array([], pa.string()),
                    "n_mode": pa.array([], pa.int64()),
                    "n_total": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["m", "c"], use_threads=False).aggregate([("n", "sum")])
        mm = g["m"].combine_chunks().to_numpy(zero_copy_only=False)
        cc = g["c"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cc, -nn, mm))
        m2, c2, n2 = mm[order], cc[order], nn[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = m2[1:] != m2[:-1]
        starts = np.flatnonzero(new)
        totals = np.add.reduceat(n2, starts)
        return pa.table(
            {
                "minute_ts": pa.array(m2[starts] * MIN_US, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "mode_type": srcs.take(pa.array(c2[starts], pa.int64())),
                "n_mode": pa.array(n2[starts].astype(np.int64)),
                "n_total": pa.array(totals.astype(np.int64)),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return hash_partition_merge(partials, "m", fold, k=_adaptive_k(sf_dir))


def events_record_minutes(sf_dir: str, window_buckets: int = 4096) -> Dataset:
    """E86: record-high board — per source over PRESENT minutes in (ts)
    order: minutes that set a NEW ALL-TIME HIGH count (strictly above
    every earlier minute; the first minute is a record by definition),
    the peak count, and the first minute that reached the peak — the
    "are we still breaking records" growth summary (E75 measures how
    long climbs last, E37 how far bursts go; E86 how often history is
    rewritten).  Exact int64 (running-max window + FILTER oracle).

    Scale shape — the distributed ordered prefix scan (grid_cumsum's
    two-pass shape) with MAX as the monoid:
      1. per batch (source, minute, n) partials; ONE (source,
         window)-hash exchange collapses counts exactly (counts are
         final in partition);
      2. per-window maxes fold on the driver at O(sources × windows);
         an exclusive prefix-MAX per source broadcasts as each window's
         base (−1 base = empty prefix, so the first minute records);
      3. each (source, window) group scans locally: records = n above
         the base-seeded running max; peak candidates compare against
         the broadcast global peak; a k=1 merge sums records and takes
         the earliest peak minute."""
    import ray

    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    W = window_buckets
    M = 1 << 40  # packed (source, window) key lane

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        m = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
            // MIN_US
        )
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        packed = code * (1 << 44) + m
        vals, freq = np.unique(packed, return_counts=True)
        s2, b2 = vals >> 44, vals & ((1 << 44) - 1)
        return pa.table(
            {
                "sw": pa.array(s2 * M + b2 // W, pa.int64()),
                "s": pa.array(s2, pa.int64()),
                "b": pa.array(b2, pa.int64()),
                "n": pa.array(freq.astype(np.int64)),
            }
        )

    def collapse(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "s": pa.array([], pa.int64()),
                    "w": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["s", "b"], use_threads=False).aggregate([("n", "sum")])
        bb = g["b"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "s": pc.cast(g["s"], pa.int64()),
                "w": pa.array(bb // W, pa.int64()),
                "b": pa.array(bb, pa.int64()),
                "n": pc.cast(g["n_sum"], pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    # rolled present-minute points — the sanctioned materialize (the
    # window-max fold and the per-window scan both consume it)
    keyed = hash_partition_merge(
        partials, "sw", collapse, k=_adaptive_k(sf_dir)
    ).materialize()

    def win_max(b: pa.Table) -> pa.Table:
        g = b.group_by(["s", "w"], use_threads=False).aggregate([("n", "max")])
        return g.rename_columns(["s", "w", "mx"])

    agg = pa.concat_tables(
        list(
            keyed.map_batches(win_max, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
        )
    )
    agg = agg.group_by(["s", "w"], use_threads=False).aggregate([("mx", "max")])
    ss = agg["s"].combine_chunks().to_numpy(zero_copy_only=False)
    ww = agg["w"].combine_chunks().to_numpy(zero_copy_only=False)
    mx = agg["mx_max"].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.lexsort((ww, ss))
    ss, ww, mx = ss[order], ww[order], mx[order]
    # exclusive prefix max per source — one numpy pass per SOURCE (tiny
    # cardinality), vectorized over its windows
    base = np.full(len(ss), -1, np.int64)
    peak = {}
    for s_val in np.unique(ss):
        seg = np.flatnonzero(ss == s_val)
        incl = np.maximum.accumulate(mx[seg])
        base[seg[1:]] = incl[:-1]
        peak[int(s_val)] = int(incl[-1])
    bases_ref = ray.put((ss * M + ww, base, peak))

    def scan_group(g: pa.Table) -> pa.Table:
        pk, bm, pks = ray.get(bases_ref)
        s = int(g["s"][0].as_py())
        w = int(g["w"][0].as_py())
        b0 = int(bm[np.searchsorted(pk, s * M + w)])
        bb = g["b"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = g["n"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(bb, kind="stable")
        bb, nn = bb[order], nn[order]
        run = np.maximum.accumulate(np.concatenate(([b0], nn)))[:-1]
        n_rec = int((nn > run).sum())
        pk_s = pks[s]
        at = np.flatnonzero(nn == pk_s)
        first_pk = int(bb[at[0]]) if len(at) else (1 << 60)
        return pa.table(
            {
                "s": pa.array([s], pa.int64()),
                "nr": pa.array([n_rec], pa.int64()),
                "pk": pa.array([pk_s], pa.int64()),
                "fp": pa.array([first_pk], pa.int64()),
            }
        )

    cells = keyed.groupby(["s", "w"]).map_groups(
        scan_group, batch_format="pyarrow"
    )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_records": pa.array([], pa.int64()),
                    "peak": pa.array([], pa.int64()),
                    "peak_ts": pa.array([], pa.timestamp("us")),
                }
            )
        g = t.group_by("s", use_threads=False).aggregate(
            [("nr", "sum"), ("pk", "max"), ("fp", "min")]
        )
        fp = g["fp_min"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": srcs.take(g["s"].combine_chunks()),
                "n_records": pc.cast(g["nr_sum"], pa.int64()),
                "peak": pc.cast(g["pk_max"], pa.int64()),
                "peak_ts": pa.array(fp * MIN_US, pa.int64()).cast(
                    pa.timestamp("us")
                ),
            }
        )

    return hash_partition_merge(cells, "s", merge, k=1)


def events_primary_migration(sf_dir: str) -> Dataset:
    """E87: primary-type migration matrix — split the stream at its
    temporal midpoint ((min_ts + max_ts) // 2): for users active in BOTH
    halves, the (first-half primary type → second-half primary type)
    transition counts under E80's argmax + tie rule — behavioral DRIFT
    of the user base (E56 tracks event-to-event transitions, E87
    era-to-era identity changes; the diagonal is the stable core).
    Exact int64 (two rn=1 CTEs joined on user oracle).

    Scale shape — E80's argmax fold run once per (user, half) on the
    SAME single user-hash exchange: per batch (user, half, type, n)
    partials; each partition lexsorts (user, half, −n, type) once, reads
    both halves' argmaxes as run heads, pairs them where a user has
    both, and bincounts straight to (from, to, n) partials; k=1 merge of
    O(types²) rows.  The midpoint is one footer-cheap min/max pass."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    bounds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    lo_us = int(np.datetime64(bounds.min("ts"), "us").astype(np.int64))
    hi_us = int(np.datetime64(bounds.max("ts"), "us").astype(np.int64))
    mid = (lo_us + hi_us) // 2

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        ts_us = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        )
        half = (ts_us >= mid).astype(np.int64)
        code = pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
        t = pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "h": pa.array(half),
                "c": code,
            }
        )
        g = t.group_by(["user_id", "h", "c"], use_threads=False).aggregate(
            [("c", "count")]
        )
        return g.rename_columns(["user_id", "h", "c", "n"])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "p": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["user_id", "h", "c"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        uu = g["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        hh = g["h"].combine_chunks().to_numpy(zero_copy_only=False)
        cc = g["c"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cc, -nn, hh, uu))
        u2, h2, c2 = uu[order], hh[order], cc[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = (u2[1:] != u2[:-1]) | (h2[1:] != h2[:-1])
        heads = np.flatnonzero(new)  # argmax row per (user, half)
        hu, hh2, hc = u2[heads], h2[heads], c2[heads]
        # pair halves: (user, half) heads are sorted by (user, half), so a
        # user with both halves occupies two consecutive rows (0 then 1)
        both = np.flatnonzero(
            (hu[:-1] == hu[1:]) & (hh2[:-1] == 0) & (hh2[1:] == 1)
        )
        pair = hc[both] * ns + hc[both + 1]
        vals, freq = np.unique(pair, return_counts=True)
        return pa.table(
            {
                "p": pa.array(vals, pa.int64()),
                "n": pa.array(freq.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "from_type": pa.array([], pa.string()),
                    "to_type": pa.array([], pa.string()),
                    "n_users": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("p", use_threads=False).aggregate([("n", "sum")])
        pp = g["p"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "from_type": srcs.take(pa.array(pp // ns, pa.int64())),
                "to_type": srcs.take(pa.array(pp % ns, pa.int64())),
                "n_users": pc.cast(g["n_sum"], pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    per_user = hash_partition_merge(
        partials, "user_id", fold, k=_adaptive_k(sf_dir)
    )
    return hash_partition_merge(per_user, "p", merge, k=1)


def events_transition_latency(
    sf_dir: str, qs: tuple[int, ...] = (500, 900)
) -> Dataset:
    """E88: transition-latency quantiles — per (from_type, to_type)
    adjacent pair in a user's (ts, event_id)-ordered stream: pair count
    + discrete p50/p90 of the floor-second gap — "how long after a click
    does the purchase come", the LATENCY dimension E56's Markov counts
    flatten away (funnel speed, not just funnel flow); exact int64 under
    the quantile_disc rank rule (lead() + quantile_disc oracle).

    Scale shape — E56's narrow per-event user-hash exchange fused with
    E81's bounded-domain histogram tail: each partition lexsorts its
    complete user streams once, adjacent same-user pairs reduce to
    (from, to, gap_s, freq) partials — flooring to SECONDS bounds the
    value axis at the data's gap cardinality, never its row count — and
    every pair's quantiles read off one cumsum in the k=1 merge.
    Partitioning assumption: E56's (one user's stream fits a task; the
    (key, ts-window) + carried-edge sub-partitioning applies the same
    way when it doesn't)."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "user_id", "event_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def narrow(b: pa.Table) -> pa.Table:
        code = pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
        return pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "t": b["ts"].cast(pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
                "c": code,
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "p": pa.array([], pa.int64()),
                "gap": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t["o"].combine_chunks().to_numpy(zero_copy_only=False)
        cc = t["c"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((oo, tt, uu))
        u2, t2, c2 = uu[order], tt[order], cc[order]
        same = u2[1:] == u2[:-1]
        if not same.any():
            return empty
        pair = (c2[:-1] * ns + c2[1:])[same]
        gap = ((t2[1:] - t2[:-1]) // 1_000_000)[same]
        packed = pair * (1 << 40) + gap  # gaps < 2^40 s by construction
        vals, freq = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "p": pa.array(vals >> 40, pa.int64()),
                "gap": pa.array(vals & ((1 << 40) - 1), pa.int64()),
                "n": pa.array(freq.astype(np.int64)),
            }
        )

    names = tuple(f"p{q // 10}_s" for q in qs)

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "from_type": pa.array([], pa.string()),
                    "to_type": pa.array([], pa.string()),
                    "n_pairs": pa.array([], pa.int64()),
                    **{c: pa.array([], pa.int64()) for c in names},
                }
            )
        g = t.group_by(["p", "gap"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        pp = g["p"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = g["gap"].combine_chunks().to_numpy(zero_copy_only=False)
        ff = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((vv, pp))
        p2, v2, f2 = pp[order], vv[order], ff[order]
        news = np.empty(len(order), dtype=bool)
        news[0] = True
        news[1:] = p2[1:] != p2[:-1]
        starts = np.flatnonzero(news)
        ends = np.append(starts[1:], len(order))
        out = {"p": [], "n": [], **{c: [] for c in names}}
        for a, b in zip(starts, ends):
            vals, freq = v2[a:b], f2[a:b]
            nt = int(freq.sum())
            cum = np.cumsum(freq)
            out["p"].append(int(p2[a]))
            out["n"].append(nt)
            for q, c in zip(qs, names):
                thr = (nt * q + 999) // 1000
                out[c].append(int(vals[np.searchsorted(cum, thr)]))
        pv = np.array(out["p"], np.int64)
        return pa.table(
            {
                "from_type": srcs.take(pa.array(pv // ns, pa.int64())),
                "to_type": srcs.take(pa.array(pv % ns, pa.int64())),
                "n_pairs": pa.array(out["n"], pa.int64()),
                **{c: pa.array(out[c], pa.int64()) for c in names},
            }
        )

    narrowed = ds.map_batches(narrow, batch_format="pyarrow")
    per_user = hash_partition_merge(
        narrowed, "user_id", fold, k=_adaptive_k(sf_dir)
    )
    return hash_partition_merge(per_user, "p", merge, k=1)


def events_max_value_event(sf_dir: str) -> Dataset:
    """E89: max-value drill-down — per source: the RAW EVENT ROW
    (event_id, ts, value) achieving the maximum ``value`` (ties → lowest
    event_id, so the answer is unique) — record RETRIEVAL, not
    aggregation: the "show me the actual spike" click-through behind
    E17's OHLC high and E44's anomaly list; the payload column travels
    ONLY for each batch's single winner.  Exact (row_number rn=1 oracle;
    doubles pass through untouched — no arithmetic, so no float risk).

    Scale shape — the argmax combiner at its narrowest: each batch
    keeps ONE candidate row per source (a batch's loser can never beat
    its winner globally), so O(batches × sources) rows reach the k=1
    merge, which re-applies the same (value DESC, event_id ASC) rule."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def top1(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "c": pa.array([], pa.int64()),
                    "event_id": pa.array([], pa.int64()),
                    "t": pa.array([], pa.int64()),
                    "value": pa.array([], pa.float64()),
                }
            )
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        eid = pc.cast(b["event_id"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        val = b["value"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((eid, -val, code))
        c2 = code[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = c2[1:] != c2[:-1]
        keep = order[new]
        return pa.table(
            {
                "c": pa.array(code[keep], pa.int64()),
                "event_id": pa.array(eid[keep], pa.int64()),
                "t": pa.array(tt[keep], pa.int64()),
                "value": pa.array(val[keep], pa.float64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "event_id": pa.array([], pa.int64()),
                    "ts": pa.array([], pa.timestamp("us")),
                    "value": pa.array([], pa.float64()),
                }
            )
        code = t["c"].combine_chunks().to_numpy(zero_copy_only=False)
        eid = t["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        val = t["value"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, -val, code))
        c2 = code[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = c2[1:] != c2[:-1]
        keep = order[new]
        take = pa.array(keep, pa.int64())
        return pa.table(
            {
                "source": srcs.take(pa.array(code[keep], pa.int64())),
                "event_id": pa.array(eid[keep], pa.int64()),
                "ts": t["t"].combine_chunks().take(take).cast(
                    pa.timestamp("us")
                ),
                "value": pa.array(val[keep], pa.float64()),
            }
        )

    partials = ds.map_batches(top1, batch_format="pyarrow")
    return hash_partition_merge(partials, "c", merge, k=1)


def events_daily_churn(sf_dir: str) -> Dataset:
    """E90: daily churn decomposition — for every day PRESENT in the
    stream: dau, NEW users (not active the previous day), RETAINED
    (active both days), and CHURNED (active the previous day, gone
    today) — the flow decomposition of E62's stock numbers (dau says how
    many; E90 says who they are relative to yesterday: dau = new +
    retained, and yesterday's dau = retained + churned).  Exact int64
    (per-user lag/lead window oracle).

    Scale shape — E62's distinct user-day discipline with a
    consecutive-day scan: per batch one lexsort → distinct (user, day)
    pairs; ONE user-hash exchange holds each user's complete day set, so
    retained/new/churned bits decide locally from adjacent days and
    reduce to per-day partials; the k=1 merge sums O(days) rows and
    keeps days with dau ≥ 1 (churn attributed to an absent day drops,
    matching the oracle's present-day domain)."""
    from ..stages.shuffle import hash_partition_merge

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        ts_us = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        )
        uu = pc.cast(b["user_id"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        day = ts_us // DAY_US
        order = np.lexsort((day, uu))
        u2, d2 = uu[order], day[order]
        new = np.empty(len(order), dtype=bool)
        if len(order):
            new[0] = True
            new[1:] = (u2[1:] != u2[:-1]) | (d2[1:] != d2[:-1])
        return pa.table(
            {"u": pa.array(u2[new]), "d": pa.array(d2[new])}
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "d": pa.array([], pa.int64()),
                    "dau": pa.array([], pa.int64()),
                    "ret": pa.array([], pa.int64()),
                    "chn": pa.array([], pa.int64()),
                }
            )
        # re-dedupe overlapping batches, then scan each user's days
        g = t.group_by(["u", "d"], use_threads=False).aggregate(
            [("d", "count")]
        )
        uu = g["u"].combine_chunks().to_numpy(zero_copy_only=False)
        dd = g["d"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((dd, uu))
        u2, d2 = uu[order], dd[order]
        samep = np.zeros(len(order), dtype=bool)
        samen = np.zeros(len(order), dtype=bool)
        if len(order) > 1:
            prev_same = u2[1:] == u2[:-1]
            samep[1:] = prev_same & (d2[1:] == d2[:-1] + 1)  # retained
            samen[:-1] = prev_same & (d2[1:] == d2[:-1] + 1)  # kept tmrw
        rows = {"d": [], "dau": [], "ret": [], "chn": []}
        # per-day dau/retained
        vals, inv = np.unique(d2, return_inverse=True)
        dau = np.bincount(inv, minlength=len(vals)).astype(np.int64)
        ret = np.bincount(
            inv, weights=samep.astype(np.int64), minlength=len(vals)
        ).astype(np.int64)
        rows["d"].append(vals)
        rows["dau"].append(dau)
        rows["ret"].append(ret)
        rows["chn"].append(np.zeros(len(vals), np.int64))
        # churn: users NOT kept tomorrow contribute to day+1
        lost_days = d2[~samen] + 1
        cv, cf = np.unique(lost_days, return_counts=True)
        rows["d"].append(cv)
        rows["dau"].append(np.zeros(len(cv), np.int64))
        rows["ret"].append(np.zeros(len(cv), np.int64))
        rows["chn"].append(cf.astype(np.int64))
        return pa.table(
            {k: pa.array(np.concatenate(v)) for k, v in rows.items()}
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "day_id": pa.array([], pa.int64()),
                    "dau": pa.array([], pa.int64()),
                    "n_new": pa.array([], pa.int64()),
                    "n_retained": pa.array([], pa.int64()),
                    "n_churned": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("d", use_threads=False).aggregate(
            [("dau", "sum"), ("ret", "sum"), ("chn", "sum")]
        )
        dd = g["d"].combine_chunks().to_numpy(zero_copy_only=False)
        dau = g["dau_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        ret = g["ret_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        chn = g["chn_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = dau > 0  # present-day domain (oracle parity)
        return pa.table(
            {
                "day_id": pa.array(dd[keep].astype(np.int64)),
                "dau": pa.array(dau[keep].astype(np.int64)),
                "n_new": pa.array((dau - ret)[keep].astype(np.int64)),
                "n_retained": pa.array(ret[keep].astype(np.int64)),
                "n_churned": pa.array(chn[keep].astype(np.int64)),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    per_user = hash_partition_merge(partials, "u", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(per_user, "d", merge, k=1)


def events_type_runs(sf_dir: str) -> Dataset:
    """E91: same-type run board — per event type: maximal CONSECUTIVE
    same-type runs inside user (ts, event_id)-ordered streams, the
    longest such run, and runs of length ≥ 3 — the "is the feed
    stuttering / is one action spamming" order-dependent diagnostic E56
    aggregates away (a high self-transition count can be many pairs or
    one pathological run; E91 tells them apart).  Exact int64
    (gaps-and-islands rn-difference oracle).

    Scale shape — E56's narrow per-event user-hash exchange with a run
    detector instead of a pair counter: each partition lexsorts its
    complete user streams once, run boundaries fall out of one shifted
    compare, run lengths from one diff over boundary indices, and
    everything reduces to (type, n_runs, longest, runs_ge3) partials;
    the k=1 merge sums/maxes O(types) rows."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "user_id", "event_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def narrow(b: pa.Table) -> pa.Table:
        code = pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
        return pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "t": b["ts"].cast(pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
                "c": code,
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "c": pa.array([], pa.int64()),
                    "nr": pa.array([], pa.int64()),
                    "lg": pa.array([], pa.int64()),
                    "g3": pa.array([], pa.int64()),
                }
            )
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t["o"].combine_chunks().to_numpy(zero_copy_only=False)
        cc = t["c"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((oo, tt, uu))
        u2, c2 = uu[order], cc[order]
        n = len(order)
        newrun = np.empty(n, dtype=bool)
        newrun[0] = True
        newrun[1:] = (u2[1:] != u2[:-1]) | (c2[1:] != c2[:-1])
        starts = np.flatnonzero(newrun)
        lens = np.diff(np.append(starts, n))
        rtype = c2[starts]
        cells = pa.table(
            {
                "c": pa.array(rtype, pa.int64()),
                "nr": pa.array(np.ones(len(starts), np.int64)),
                "lg": pa.array(lens.astype(np.int64)),
                "g3": pa.array((lens >= 3).astype(np.int64)),
            }
        )
        g = cells.group_by("c", use_threads=False).aggregate(
            [("nr", "sum"), ("lg", "max"), ("g3", "sum")]
        )
        return g.rename_columns(["c", "nr", "lg", "g3"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_runs": pa.array([], pa.int64()),
                    "longest_run": pa.array([], pa.int64()),
                    "runs_ge3": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("c", use_threads=False).aggregate(
            [("nr", "sum"), ("lg", "max"), ("g3", "sum")]
        )
        return pa.table(
            {
                "source": srcs.take(g["c"].combine_chunks()),
                "n_runs": pc.cast(g["nr_sum"], pa.int64()),
                "longest_run": pc.cast(g["lg_max"], pa.int64()),
                "runs_ge3": pc.cast(g["g3_sum"], pa.int64()),
            }
        )

    narrowed = ds.map_batches(narrow, batch_format="pyarrow")
    per_user = hash_partition_merge(
        narrowed, "user_id", fold, k=_adaptive_k(sf_dir)
    )
    return hash_partition_merge(per_user, "c", merge, k=1)


def events_tod_quantiles(
    sf_dir: str, qs: tuple[int, ...] = (500, 900)
) -> Dataset:
    """E93: time-of-day quantiles — per source: n_events + discrete
    p50/p90 of the MINUTE-OF-DAY (0..1439) — "when does this feed
    actually happen", the single-number phase summary of E30's seasonal
    profile (the profile shows the shape; E93 gives the median phase a
    scheduler keys maintenance windows off).  Exact int64 under the
    quantile_disc rank rule (epoch modulo + quantile_disc oracle).

    Scale shape — the bounded-domain histogram at its purest: the value
    axis is FIXED at 1440 minutes, so each batch reduces to (source,
    mod, freq) partials ≤ sources × 1440 regardless of corpus size, and
    every quantile reads off one cumsum per source in the k=1 merge —
    no second exchange at any scale."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        ts_us = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        )
        mod = (ts_us % DAY_US) // MIN_US
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        packed = code * 1440 + mod
        vals, freq = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "s": pa.array(vals // 1440, pa.int64()),
                "m": pa.array(vals % 1440, pa.int64()),
                "f": pa.array(freq.astype(np.int64)),
            }
        )

    names = tuple(f"p{q // 10}_minute" for q in qs)

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_events": pa.array([], pa.int64()),
                    **{c: pa.array([], pa.int64()) for c in names},
                }
            )
        g = t.group_by(["s", "m"], use_threads=False).aggregate([("f", "sum")])
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = g["m"].combine_chunks().to_numpy(zero_copy_only=False)
        ff = g["f_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((vv, ss))
        s2, v2, f2 = ss[order], vv[order], ff[order]
        news = np.empty(len(order), dtype=bool)
        news[0] = True
        news[1:] = s2[1:] != s2[:-1]
        starts = np.flatnonzero(news)
        ends = np.append(starts[1:], len(order))
        out = {"source": [], "n_events": [], **{c: [] for c in names}}
        for a, b in zip(starts, ends):
            vals, freq = v2[a:b], f2[a:b]
            nt = int(freq.sum())
            cum = np.cumsum(freq)
            out["source"].append(int(s2[a]))
            out["n_events"].append(nt)
            for q, c in zip(qs, names):
                thr = (nt * q + 999) // 1000
                out[c].append(int(vals[np.searchsorted(cum, thr)]))
        return pa.table(
            {
                "source": srcs.take(pa.array(out["source"], pa.int64())),
                "n_events": pa.array(out["n_events"], pa.int64()),
                **{c: pa.array(out[c], pa.int64()) for c in names},
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return hash_partition_merge(partials, "s", merge, k=1)


def events_session_sensitivity(
    sf_dir: str, gaps_s: tuple[int, ...] = (900, 1800, 3600)
) -> Dataset:
    """E94: session-gap sensitivity curve — for each candidate idle
    threshold: total sessions the corpus would split into (a session
    opens at a user's first event or any gap STRICTLY over the
    threshold) — the parameter-selection curve read BEFORE running E15's
    sessionize (a stable plateau between thresholds = a natural session
    scale; no plateau = the notion is arbitrary for this feed).  One
    dense row per threshold ALWAYS.  Exact int64 (lag + CASE-sum per
    threshold oracle).

    Scale shape — ALL thresholds in ONE pass over ONE exchange (three
    sessionize runs would shuffle the stream three times): per-event
    narrow rows hash by user, each partition lexsorts its complete
    streams once, computes gaps once, and bincounts gap > thr per
    threshold — (thr, n) partials, k=1 densifying merge."""
    from ..stages.shuffle import hash_partition_merge

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "user_id", "event_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def narrow(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "t": b["ts"].cast(pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"thr": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t["o"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((oo, tt, uu))
        u2, t2 = uu[order], tt[order]
        firsts = np.empty(len(order), dtype=bool)
        firsts[0] = True
        firsts[1:] = u2[1:] != u2[:-1]
        n_first = int(firsts.sum())
        gaps = (t2[1:] - t2[:-1])[~firsts[1:]]
        rows = {"thr": [], "n": []}
        for thr in gaps_s:
            rows["thr"].append(thr)
            rows["n"].append(n_first + int((gaps > thr * 1_000_000).sum()))
        return pa.table(
            {k: pa.array(v, pa.int64()) for k, v in rows.items()}
        )

    def merge(t: pa.Table) -> pa.Table:
        cnt = {g: 0 for g in gaps_s}
        if t.num_rows:
            g = t.group_by("thr", use_threads=False).aggregate([("n", "sum")])
            tt = g["thr"].combine_chunks().to_numpy(zero_copy_only=False)
            nn = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
            for a, b in zip(tt, nn):
                cnt[int(a)] = int(b)
        return pa.table(
            {
                "gap_s": pa.array(list(gaps_s), pa.int64()),
                "n_sessions": pa.array([cnt[g] for g in gaps_s], pa.int64()),
            }
        )

    narrowed = ds.map_batches(narrow, batch_format="pyarrow")
    cells = hash_partition_merge(
        narrowed, "user_id", fold, k=_adaptive_k(sf_dir)
    )
    return hash_partition_merge(cells, "thr", merge, k=1)


def events_dominance_share(sf_dir: str) -> Dataset:
    """E95: tape-dominance board — per source: minutes it WINS (it is
    the minute's mode under E85's tie rule), minutes it is PRESENT, and
    the win share in permille — "who owns the tape" (E85 lists each
    minute's winner; E96 rolls the contest into one row per contender —
    a source present everywhere but winning nowhere is pure background).
    One dense row per source ALWAYS.  Exact int64 (E85's rn=1 CTE
    re-grouped + presence join oracle).

    Scale shape — E85's minute-hash exchange with a per-source roll
    folded IN PLACE: each partition decides its minutes' winners and
    presence locally (one lexsort) and reduces straight to per-source
    (won, present) partials; k=1 densifying merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        m = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
            // MIN_US
        )
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        packed = m * ns + code
        vals, freq = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "m": pa.array(vals // ns, pa.int64()),
                "c": pa.array(vals % ns, pa.int64()),
                "n": pa.array(freq.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "c": pa.array([], pa.int64()),
                    "won": pa.array([], pa.int64()),
                    "pres": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["m", "c"], use_threads=False).aggregate([("n", "sum")])
        mm = g["m"].combine_chunks().to_numpy(zero_copy_only=False)
        cc = g["c"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cc, -nn, mm))
        m2, c2 = mm[order], cc[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = m2[1:] != m2[:-1]
        won = np.bincount(c2[new], minlength=ns).astype(np.int64)
        pres = np.bincount(cc, minlength=ns).astype(np.int64)
        live = np.flatnonzero((won > 0) | (pres > 0))
        return pa.table(
            {
                "c": pa.array(live.astype(np.int64)),
                "won": pa.array(won[live]),
                "pres": pa.array(pres[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        won = np.zeros(ns, np.int64)
        pres = np.zeros(ns, np.int64)
        if t.num_rows:
            g = t.group_by("c", use_threads=False).aggregate(
                [("won", "sum"), ("pres", "sum")]
            )
            cc = g["c"].combine_chunks().to_numpy(zero_copy_only=False)
            won[cc] = g["won_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            pres[cc] = g["pres_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
        return pa.table(
            {
                "source": srcs,
                "n_won": pa.array(won),
                "n_present": pa.array(pres),
                "win_permille": pa.array(
                    (1000 * won) // np.maximum(pres, 1)
                ),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    cells = hash_partition_merge(partials, "m", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "c", merge, k=1)


def events_value_bands(sf_dir: str, band_width: int = 50) -> Dataset:
    """E96: value-band heatmap — per (source, floor(value) // band_width):
    event count — the 2-D payload-magnitude profile E22 summarizes per
    minute and E89 reduces to one argmax row (which sources carry small
    telemetry readings vs large transactions, at a glance).  Exact int64
    (floor + integer-divide GROUP BY oracle).

    Scale shape — ZERO wide exchange beyond the k=1 merge: one floor
    kernel + one bit-packed np.unique per batch reduce events to
    (source, band, freq) partials over a value-domain-bounded grid."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        val = b["value"].combine_chunks().to_numpy(zero_copy_only=False)
        band = np.floor(val).astype(np.int64) // band_width
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        packed = code * (1 << 32) + band
        vals, freq = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "s": pa.array(vals >> 32, pa.int64()),
                "band": pa.array(vals & 0xFFFFFFFF, pa.int64()),
                "f": pa.array(freq.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "band": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["s", "band"], use_threads=False).aggregate(
            [("f", "sum")]
        )
        return pa.table(
            {
                "source": srcs.take(g["s"].combine_chunks()),
                "band": pc.cast(g["band"], pa.int64()),
                "n_events": pc.cast(g["f_sum"], pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return hash_partition_merge(partials, "s", merge, k=1)



def events_trend_stats(sf_dir: str) -> Dataset:
    """E97: payload-trend sufficient statistics — per source over raw
    events: n, Σt, Σt², Σv, Σt·v with t = minutes since the tape epoch
    and v = floor(value) — the exact-int64 OLS normal equations of the
    value-vs-time drift line (slope off-line: a rising fit = sensor
    drift / price inflation E53 would only see in counts), read next to
    E95's dispersion stats (same sufficient-statistic discipline, value
    axis instead of count axis).  Int64 bound documented: t ≤ minutes of
    retention (~5·10⁵ at 1 year), so Σt·v holds ~2·10⁷ events/source at
    v ≤ 10⁶ — per-source partials at 100 TB ride sharded epochs, the
    same bound the reference's counter registry accepts (metrics.go).
    Exact int64 (epoch_us floor-divide + SUM oracle).

    Scale shape — ZERO wide exchange: one floor + one np.add.at pass per
    batch reduces events to ONE partial row per source; k=1 merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        t = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            - EVENTS_T0_US
        ) // 60_000_000
        v = np.floor(
            b["value"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        n = np.bincount(code, minlength=ns)
        st = np.zeros(ns, np.int64)
        stt = np.zeros(ns, np.int64)
        sv = np.zeros(ns, np.int64)
        stv = np.zeros(ns, np.int64)
        np.add.at(st, code, t)
        np.add.at(stt, code, t * t)
        np.add.at(sv, code, v)
        np.add.at(stv, code, t * v)
        live = np.flatnonzero(n)
        return pa.table(
            {
                "s": pa.array(live.astype(np.int64)),
                "n": pa.array(n[live].astype(np.int64)),
                "st": pa.array(st[live]),
                "stt": pa.array(stt[live]),
                "sv": pa.array(sv[live]),
                "stv": pa.array(stv[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        n = np.zeros(ns, np.int64)
        st = np.zeros(ns, np.int64)
        stt = np.zeros(ns, np.int64)
        sv = np.zeros(ns, np.int64)
        stv = np.zeros(ns, np.int64)
        if t.num_rows:
            g = t.group_by("s", use_threads=False).aggregate(
                [
                    ("n", "sum"),
                    ("st", "sum"),
                    ("stt", "sum"),
                    ("sv", "sum"),
                    ("stv", "sum"),
                ]
            )
            ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
            for dst, col in (
                (n, "n_sum"),
                (st, "st_sum"),
                (stt, "stt_sum"),
                (sv, "sv_sum"),
                (stv, "stv_sum"),
            ):
                dst[ss] = g[col].combine_chunks().to_numpy(
                    zero_copy_only=False
                )
        return pa.table(
            {
                "source": srcs,
                "n_events": pa.array(n),
                "sum_t": pa.array(st),
                "sum_tt": pa.array(stt),
                "sum_v": pa.array(sv),
                "sum_tv": pa.array(stv),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return hash_partition_merge(partials, "s", merge, k=1)


def events_user_streak_hist(sf_dir: str) -> Dataset:
    """E98: active-day streak histogram — for each streak length s (in
    consecutive UTC days): the number of maximal per-user runs of
    exactly s consecutive active days across all users — the engagement
    REGULARITY distribution behind E50's DAU/WAU/MAU levels and E62's
    week-over-week retention (a heavy 1-day bar = drive-by usage; long
    runs = habit), the gaps-and-islands discipline of E43/E75 moved to
    the user-day axis.  Exact int64 (distinct user-day + row_number
    islands oracle).

    Scale shape — E78's aggregate-of-aggregates with a run-length
    kernel: per batch one Arrow group_by reduces events to distinct
    (user, day) pairs (day = epoch_us // 86400e6, bounded by retention);
    the user-hash partition holds each user's full day set (≤ retention
    days — bounded, unlike raw history), dedupes exactly, extracts
    maximal runs with one lexsort + diff, and re-reduces to (len, n)
    partials; k=1 merge sums O(distinct lengths) rows."""
    from ..stages.shuffle import hash_partition_merge

    DAY_US = 86_400_000_000

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        day = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        t = pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "day": pa.array(day, pa.int64()),
            }
        )
        return t.group_by(["user_id", "day"], use_threads=False).aggregate([])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "streak_days": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        dd = t["day"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((dd, uu))
        u2, d2 = uu[order], dd[order]
        keep = np.empty(len(order), dtype=bool)
        keep[0] = True
        keep[1:] = (u2[1:] != u2[:-1]) | (d2[1:] != d2[:-1])
        u3, d3 = u2[keep], d2[keep]
        # a new run starts at a user change or a non-consecutive day
        brk = np.empty(len(u3), dtype=bool)
        brk[0] = True
        brk[1:] = (u3[1:] != u3[:-1]) | (d3[1:] != d3[:-1] + 1)
        starts = np.flatnonzero(brk)
        lens = np.diff(np.append(starts, len(u3)))
        vals, cnt = np.unique(lens, return_counts=True)
        return pa.table(
            {
                "streak_days": pa.array(vals.astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "streak_days": pa.array([], pa.int64()),
                    "n_runs": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("streak_days", use_threads=False).aggregate(
            [("n", "sum")]
        )
        return pa.table(
            {
                "streak_days": pc.cast(g["streak_days"], pa.int64()),
                "n_runs": pc.cast(g["n_sum"], pa.int64()),
            }
        )

    pairs = ds.map_batches(partial, batch_format="pyarrow")
    partials = hash_partition_merge(
        pairs, "user_id", fold, k=_adaptive_k(sf_dir)
    )
    return hash_partition_merge(partials, "streak_days", merge, k=1)


def events_value_volatility(
    sf_dir: str, window_us: int = TEMPORAL_WINDOW_US
) -> Dataset:
    """E99: payload roughness — per source: first-difference steps,
    Σ|Δfloor(value)| and max|Δfloor(value)| over consecutive events in
    (ts, event_id) order — the realized-volatility companion to E97's
    drift line (E97 says where the value is HEADING, E99 how violently
    it moves getting there; a calm drift and a spiky tape fit the same
    slope).  Sources with fewer than two events emit no row (the lag
    oracle's WHERE p IS NOT NULL, E32's convention).  Exact int64
    (floor + lag |difference| oracle).

    Scale shape — E32's carried-prefix scan with the value riding the
    carry: rows partition by (source, ts-window) and
    :func:`_last_event_carries` supplies each window's predecessor
    VALUE, so the kernel (one lexsort + shifted diff) never holds a
    source's full history; per-partition (n, Σ, max) partials fold in
    one tiny k=1 source merge."""
    from ..stages.shuffle import hash_partition_merge, shuffle_parts
    from ..stages.temporal import _kw_partition

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def narrow(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        v = np.floor(
            b["value"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table(
            {
                "k": pc.cast(
                    pc.index_in(b["event_type"], value_set=srcs), pa.int64()
                ),
                "t": pa.array(ts_us, pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
                "v": pa.array(v),
                "carry": pa.array(np.zeros(b.num_rows, dtype=bool)),
                "w": pa.array(ts_us // window_us, pa.int64()),
            }
        )

    tagged = ds.map_batches(narrow, batch_format="pyarrow")
    carries = _last_event_carries(tagged)
    full = tagged.union(
        carries.map_batches(_tag_carry, batch_format="pyarrow")
    )

    def kernel(t_: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "src": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "sm": pa.array([], pa.int64()),
                "mx": pa.array([], pa.int64()),
            }
        )
        if t_.num_rows == 0:
            return empty
        kk = t_["k"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t_["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t_["o"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = t_["v"].combine_chunks().to_numpy(zero_copy_only=False)
        cr = t_["carry"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cr, oo, tt, kk))
        ks, vs, crs = kk[order], vv[order], cr[order]
        n = len(order)
        has_prev = np.empty(n, dtype=bool)
        has_prev[0] = False
        has_prev[1:] = ks[1:] == ks[:-1]
        pv = np.empty(n, dtype=np.int64)
        pv[0] = 0
        pv[1:] = vs[:-1]
        sel = has_prev & ~crs
        if not sel.any():
            return empty
        dv = np.abs(vs[sel] - pv[sel])
        gk = ks[sel]
        u, inv = np.unique(gk, return_inverse=True)
        cnt = np.bincount(inv, minlength=len(u)).astype(np.int64)
        sm = np.zeros(len(u), dtype=np.int64)
        np.add.at(sm, inv, dv)
        mx = np.zeros(len(u), dtype=np.int64)
        np.maximum.at(mx, inv, dv)
        return pa.table(
            {
                "src": pa.array(u, pa.int64()),
                "n": pa.array(cnt),
                "sm": pa.array(sm),
                "mx": pa.array(mx),
            }
        )

    partials = _kw_partition(full, kernel, shuffle_parts(_adaptive_k(sf_dir)))

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_steps": pa.array([], pa.int64()),
                    "sum_abs_dv": pa.array([], pa.int64()),
                    "max_abs_dv": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("src", use_threads=False).aggregate(
            [("n", "sum"), ("sm", "sum"), ("mx", "max")]
        )
        return pa.table(
            {
                "source": pc.take(srcs, g["src"]),
                "n_steps": g["n_sum"],
                "sum_abs_dv": g["sm_sum"],
                "max_abs_dv": g["mx_max"],
            }
        )

    return hash_partition_merge(partials, "src", merge, k=1)


def events_daily_leader(sf_dir: str) -> Dataset:
    """E101: daily-leader persistence board — per event type: days it was
    ACTIVE (≥1 event) and days it was the daily volume LEADER (most
    events that calendar day; ties → type string ascending via the exact
    broadcast rank) — E85's per-minute mode flipped to ask how STABLE
    dominance is over the long axis (a type leading 90% of days is a
    stationary mix; leadership churn says the E87 migration matrix is
    worth reading).  One dense row per type ALWAYS.  Exact int64
    (per-day counts + row_number rn=1 oracle).

    Scale shape — E85's argmax fold with a SECOND reduction stage: per
    batch one packed np.unique to (day, type, n) partials; the day-hash
    exchange settles each day's exact counts and winner locally and
    re-reduces IN PLACE to per-type (active, led) partials — O(types)
    rows per partition however long the tape; k=1 densifying merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        day = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        packed = day * ns + code
        vals, freq = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "d": pa.array(vals // ns, pa.int64()),
                "c": pa.array(vals % ns, pa.int64()),
                "n": pa.array(freq.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "c": pa.array([], pa.int64()),
                    "act": pa.array([], pa.int64()),
                    "led": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["d", "c"], use_threads=False).aggregate([("n", "sum")])
        dd = g["d"].combine_chunks().to_numpy(zero_copy_only=False)
        cc = g["c"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cc, -nn, dd))
        d2, c2 = dd[order], cc[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = d2[1:] != d2[:-1]
        act = np.bincount(cc, minlength=ns)
        led = np.bincount(c2[new], minlength=ns)
        return pa.table(
            {
                "c": pa.array(np.arange(ns, dtype=np.int64)),
                "act": pa.array(act.astype(np.int64)),
                "led": pa.array(led.astype(np.int64)),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    per_day = hash_partition_merge(partials, "d", fold, k=_adaptive_k(sf_dir))

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": srcs,
                    "n_days_active": pa.array(np.zeros(ns, np.int64)),
                    "n_days_led": pa.array(np.zeros(ns, np.int64)),
                }
            )
        g = t.group_by("c", use_threads=False).aggregate(
            [("act", "sum"), ("led", "sum")]
        )
        cc = g["c"].combine_chunks().to_numpy(zero_copy_only=False)
        act = np.zeros(ns, np.int64)
        led = np.zeros(ns, np.int64)
        act[cc] = g["act_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        led[cc] = g["led_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": srcs,
                "n_days_active": pa.array(act),
                "n_days_led": pa.array(led),
            }
        )

    return hash_partition_merge(per_day, "c", merge, k=1)


def events_first_vs_primary(sf_dir: str) -> Dataset:
    """E102: entry-vs-habit agreement board — per event type: users who
    ENTER through it (their first event by (ts, event_id) order is this
    type), users for whom it is PRIMARY (most events, ties → type rank —
    E80's rule), and users where BOTH hold — the attribution question
    E73's entry/exit matrix and E80's primary board each answer half of
    (does the acquisition channel predict the habit?  n_both/n_first is
    the conversion-to-habit rate per entry type).  One dense row per
    type ALWAYS.  Exact int64 (row_number argmin × count-rank argmax
    join oracle).

    Scale shape — ONE user-hash exchange, both questions pre-reduced
    per batch before it: count partials collapse to (user, type, n) and
    first-candidates to one argmin row per (user, batch) — the exchange
    carries O(users × types) rows however long the tape; each user's
    partition settles its exact first event AND its primary type
    locally, re-reducing in place to per-type (first, primary, both)
    partials; k=1 densifying merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "ts", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    BIG = np.iinfo(np.int64).max

    def partial(b: pa.Table) -> pa.Table:
        uid = (
            pc.cast(b["user_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        ts_us = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
        )
        eid = (
            pc.cast(b["event_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        # count partials: (user, code) -> n (two-column group_by — a
        # uid*ns+code pack would overflow for arbitrary 64-bit user ids)
        gc_ = (
            pa.table(
                {
                    "u": pa.array(uid),
                    "c": pa.array(code),
                    "n": pa.array(np.ones(len(uid), np.int64)),
                }
            )
            .group_by(["u", "c"], use_threads=False)
            .aggregate([("n", "sum")])
        )
        nv = gc_.num_rows
        counts = pa.table(
            {
                "u": gc_["u"],
                "c": gc_["c"],
                "n": gc_["n_sum"],
                "ts": pa.array(np.full(nv, BIG, np.int64)),
                "eid": pa.array(np.full(nv, BIG, np.int64)),
            }
        )
        # first-candidate per user in this batch: argmin by (ts, eid)
        order = np.lexsort((eid, ts_us, uid))
        u2 = uid[order]
        head = np.empty(len(order), dtype=bool)
        if len(order):
            head[0] = True
            head[1:] = u2[1:] != u2[:-1]
        firsts = order[head] if len(order) else order
        cand = pa.table(
            {
                "u": pa.array(uid[firsts], pa.int64()),
                "c": pa.array(code[firsts], pa.int64()),
                "n": pa.array(np.zeros(len(firsts), np.int64)),
                "ts": pa.array(ts_us[firsts], pa.int64()),
                "eid": pa.array(eid[firsts], pa.int64()),
            }
        )
        return pa.concat_tables([counts, cand])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "c": pa.array([], pa.int64()),
                    "nf": pa.array([], pa.int64()),
                    "np_": pa.array([], pa.int64()),
                    "nb": pa.array([], pa.int64()),
                }
            )
        uu = t["u"].combine_chunks().to_numpy(zero_copy_only=False)
        cc = t["c"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        tts = t["ts"].combine_chunks().to_numpy(zero_copy_only=False)
        eid = t["eid"].combine_chunks().to_numpy(zero_copy_only=False)
        is_cnt = nn > 0
        # primary: exact (user, code) totals -> argmax (ties: code asc);
        # two-column group_by — a uid*ns+code pack would overflow int64
        # for arbitrary 64-bit user ids at corpus scale
        g = (
            pa.table(
                {
                    "gu": pa.array(uu[is_cnt]),
                    "gc": pa.array(cc[is_cnt]),
                    "n": pa.array(nn[is_cnt]),
                }
            )
            .group_by(["gu", "gc"], use_threads=False)
            .aggregate([("n", "sum")])
        )
        gu = g["gu"].combine_chunks().to_numpy(zero_copy_only=False)
        gc = g["gc"].combine_chunks().to_numpy(zero_copy_only=False)
        gn = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((gc, -gn, gu))
        u2 = gu[order]
        head = np.empty(len(order), dtype=bool)
        head[0] = True
        head[1:] = u2[1:] != u2[:-1]
        prim_u, prim_c = u2[head], gc[order][head]
        # first: argmin over candidates by (ts, eid)
        fu, fc, fts, feid = uu[~is_cnt], cc[~is_cnt], tts[~is_cnt], eid[~is_cnt]
        forder = np.lexsort((feid, fts, fu))
        f2 = fu[forder]
        fhead = np.empty(len(forder), dtype=bool)
        if len(forder):
            fhead[0] = True
            fhead[1:] = f2[1:] != f2[:-1]
        first_u, first_c = f2[fhead], fc[forder][fhead]
        # per-user join: prim_u and first_u are identical sorted user sets
        # (every user with a count partial has a first candidate and vice
        # versa — both derive from the same co-located event rows)
        nf = np.bincount(first_c, minlength=ns)
        np2 = np.bincount(prim_c, minlength=ns)
        both = first_c == prim_c
        nb = np.bincount(first_c[both], minlength=ns)
        return pa.table(
            {
                "c": pa.array(np.arange(ns, dtype=np.int64)),
                "nf": pa.array(nf.astype(np.int64)),
                "np_": pa.array(np2.astype(np.int64)),
                "nb": pa.array(nb.astype(np.int64)),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    per_user = hash_partition_merge(partials, "u", fold, k=_adaptive_k(sf_dir))

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": srcs,
                    "n_first": pa.array(np.zeros(ns, np.int64)),
                    "n_primary": pa.array(np.zeros(ns, np.int64)),
                    "n_both": pa.array(np.zeros(ns, np.int64)),
                }
            )
        g = t.group_by("c", use_threads=False).aggregate(
            [("nf", "sum"), ("np_", "sum"), ("nb", "sum")]
        )
        cc = g["c"].combine_chunks().to_numpy(zero_copy_only=False)
        nf = np.zeros(ns, np.int64)
        np2 = np.zeros(ns, np.int64)
        nb = np.zeros(ns, np.int64)
        nf[cc] = g["nf_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        np2[cc] = g["np__sum"].combine_chunks().to_numpy(zero_copy_only=False)
        nb[cc] = g["nb_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": srcs,
                "n_first": pa.array(nf),
                "n_primary": pa.array(np2),
                "n_both": pa.array(nb),
            }
        )

    return hash_partition_merge(per_user, "c", merge, k=1)


def events_type_cooccurrence(sf_dir: str, gap_s: int = 6 * 3600) -> Dataset:
    """E103: session-basket type affinity matrix — for every event-type
    pair (a < b, string order): sessions containing type a, sessions
    containing type b, sessions containing BOTH — the co-visit read
    E56's transition matrix cannot answer (transitions count ordered
    ADJACENCY; E103 counts unordered co-presence anywhere in the visit —
    the basket-analysis number behind "users who do a also do b").
    Zero-overlap pairs absent (the SQL self-join's shape).  Exact int64
    (sessions CTE + DISTINCT (session, type) self-join oracle).

    Scale shape — pure composition feeding T60's pair machinery: E15's
    bounded sessionize + E16's windowed range join tag every event with
    its session; each batch dedupes to (user, session, type-code) rows
    and ships them on ONE session-mix-hash exchange (the hash only
    routes — identity is the exact (user, session) columns riding
    alongside); each partition holds every type of a session, so pair
    fan-out is bounded by sessions × C(types, 2) with types
    tiny-cardinality; per-type session totals ride the same partials;
    k=1 fold."""
    from ..stages.shuffle import hash_partition_merge
    from ..stages.temporal import range_join

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    points = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
        override_num_blocks=_adaptive_k(sf_dir),
    )
    intervals = events_sessions(sf_dir, gap_s).map_batches(
        lambda b: b.select(["user_id", "session_id", "start_ts", "end_ts"]),
        batch_format="pyarrow",
    ).materialize()
    joined = range_join(
        points,
        intervals,
        key="user_id",
        ts="ts",
        lo="start_ts",
        hi="end_ts",
        attrs=["session_id"],
        k=_adaptive_k(sf_dir),
        window_us=TEMPORAL_WINDOW_US,
    )

    MUL = np.uint64(0xBF58476D1CE4E5B9)

    def partial(b: pa.Table) -> pa.Table:
        uid = (
            pc.cast(b["user_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        sid = (
            pc.cast(b["session_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        order = np.lexsort((code, sid, uid))
        u2, s2, c2 = uid[order], sid[order], code[order]
        keep = np.empty(len(order), dtype=bool)
        if len(order):
            keep[0] = True
            keep[1:] = (
                (u2[1:] != u2[:-1]) | (s2[1:] != s2[:-1]) | (c2[1:] != c2[:-1])
            )
        u2, s2, c2 = u2[keep], s2[keep], c2[keep]
        h = ((u2.astype(np.uint64) * MUL) ^ (s2.astype(np.uint64) + MUL)) * MUL
        h ^= h >> np.uint64(31)
        return pa.table(
            {
                "h": pa.array(h.view(np.int64), pa.int64()),
                "u": pa.array(u2, pa.int64()),
                "s": pa.array(s2, pa.int64()),
                "c": pa.array(c2, pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        u = t["u"].combine_chunks().to_numpy(zero_copy_only=False)
        s = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
        c = t["c"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((c, s, u))
        u2, s2, c2 = u[order], s[order], c[order]
        keep = np.empty(len(order), dtype=bool)
        keep[0] = True
        keep[1:] = (
            (u2[1:] != u2[:-1]) | (s2[1:] != s2[:-1]) | (c2[1:] != c2[:-1])
        )
        u2, s2, c2 = u2[keep], s2[keep], c2[keep]
        tot = np.bincount(c2, minlength=ns).astype(np.int64)
        out_a = [np.arange(ns, dtype=np.int64)]
        out_b = [np.full(ns, -1, dtype=np.int64)]
        out_n = [tot]
        news = np.empty(len(u2), dtype=bool)
        if len(u2):
            news[0] = True
            news[1:] = (u2[1:] != u2[:-1]) | (s2[1:] != s2[:-1])
            starts = np.flatnonzero(news)
            sizes = np.diff(np.append(starts, len(u2)))
            pair_counts = np.zeros((ns, ns), dtype=np.int64)
            for m in np.unique(sizes):
                if m < 2:
                    continue
                mat = c2[
                    (starts[sizes == m][:, None] + np.arange(m)[None, :])
                ]
                for i in range(int(m) - 1):
                    for j in range(i + 1, int(m)):
                        np.add.at(pair_counts, (mat[:, i], mat[:, j]), 1)
            pa_, pb_ = np.nonzero(pair_counts)
            out_a.append(pa_.astype(np.int64))
            out_b.append(pb_.astype(np.int64))
            out_n.append(pair_counts[pa_, pb_])
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a)),
                "b": pa.array(np.concatenate(out_b)),
                "n": pa.array(np.concatenate(out_n)),
            }
        )

    partials = joined.map_batches(partial, batch_format="pyarrow")
    per_session = hash_partition_merge(
        partials, "h", fold, k=_adaptive_k(sf_dir)
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "type_a": pa.array([], pa.string()),
                    "type_b": pa.array([], pa.string()),
                    "n_a": pa.array([], pa.int64()),
                    "n_b": pa.array([], pa.int64()),
                    "n_both": pa.array([], pa.int64()),
                }
            )
        a = t["a"].combine_chunks().to_numpy(zero_copy_only=False)
        b = t["b"].combine_chunks().to_numpy(zero_copy_only=False)
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        tot = np.zeros(ns, dtype=np.int64)
        is_tot = b < 0
        np.add.at(tot, a[is_tot], n[is_tot])
        pair_counts = np.zeros((ns, ns), dtype=np.int64)
        np.add.at(pair_counts, (a[~is_tot], b[~is_tot]), n[~is_tot])
        pa_, pb_ = np.nonzero(pair_counts)
        c = pair_counts[pa_, pb_]
        return pa.table(
            {
                "type_a": pc.take(srcs, pa.array(pa_, pa.int64())),
                "type_b": pc.take(srcs, pa.array(pb_, pa.int64())),
                "n_a": pa.array(tot[pa_], pa.int64()),
                "n_b": pa.array(tot[pb_], pa.int64()),
                "n_both": pa.array(c, pa.int64()),
            }
        )

    return hash_partition_merge(per_session, "a", final, k=1)


def events_profile_concentration(sf_dir: str) -> Dataset:
    """E104: weekly-profile concentration stats — per source: events,
    ACTIVE (day-of-week × hour) cells of the 168-cell weekly grid, and
    Σ count² over those cells — the exact sufficient statistics of the
    profile's Herfindahl concentration (sum_sq/n² against 1/n_cells):
    E52 lists the whole profile; E104 is the one-row-per-source answer
    to "is this source's traffic clock-shaped or flat" that capacity
    planning actually thresholds on.  dow matches DuckDB's dayofweek
    (Sunday = 0; epoch day 0 was a Thursday → (days + 4) mod 7).  One
    dense row per source ALWAYS.  Exact int64 (two-level GROUP BY +
    SUM(n²) oracle).

    Scale shape — the per-cell totals MUST settle before squaring (a
    partial² is not a total²): per batch one packed np.unique to
    (source, cell, n) partials; ONE (source, cell)-hash exchange decides
    each cell's exact total and re-reduces IN PLACE to per-source
    (events, cells, sum_sq) partials over a ≤ sources × 168 domain;
    k=1 densifying merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        ts_us = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
        )
        days = ts_us // DAY_US
        dow = (days + 4) % 7
        hour = (ts_us % DAY_US) // HOUR_US
        cell = dow * 24 + hour
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        packed = code * 168 + cell
        vals, freq = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "sc": pa.array(vals, pa.int64()),
                "n": pa.array(freq.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "ev": pa.array([], pa.int64()),
                    "cells": pa.array([], pa.int64()),
                    "ssq": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("sc", use_threads=False).aggregate([("n", "sum")])
        sc = g["sc"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        src = sc // 168
        ev = np.zeros(ns, np.int64)
        cells = np.zeros(ns, np.int64)
        ssq = np.zeros(ns, np.int64)
        np.add.at(ev, src, nn)
        np.add.at(cells, src, 1)
        np.add.at(ssq, src, nn * nn)
        live = np.flatnonzero(cells)
        return pa.table(
            {
                "src": pa.array(live.astype(np.int64)),
                "ev": pa.array(ev[live]),
                "cells": pa.array(cells[live]),
                "ssq": pa.array(ssq[live]),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    per_cell = hash_partition_merge(partials, "sc", fold, k=_adaptive_k(sf_dir))

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": srcs,
                    "n_events": pa.array(np.zeros(ns, np.int64)),
                    "n_cells": pa.array(np.zeros(ns, np.int64)),
                    "sum_sq": pa.array(np.zeros(ns, np.int64)),
                }
            )
        g = t.group_by("src", use_threads=False).aggregate(
            [("ev", "sum"), ("cells", "sum"), ("ssq", "sum")]
        )
        cc = g["src"].combine_chunks().to_numpy(zero_copy_only=False)
        ev = np.zeros(ns, np.int64)
        cells = np.zeros(ns, np.int64)
        ssq = np.zeros(ns, np.int64)
        ev[cc] = g["ev_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        cells[cc] = g["cells_sum"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        ssq[cc] = g["ssq_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": srcs,
                "n_events": pa.array(ev),
                "n_cells": pa.array(cells),
                "sum_sq": pa.array(ssq),
            }
        )

    return hash_partition_merge(per_cell, "src", merge, k=1)


def events_adoption_latency(
    sf_dir: str, qs: tuple[int, ...] = (500, 900)
) -> Dataset:
    """E105: feature-adoption latency board — per event type: users who
    ever reached it, users who reach it within their first MINUTE of
    activity (latency zero — the entry lane at the grid's resolution),
    and discrete p50/p90 of the latency in MINUTES from a
    user's first event overall to their first event of that type — the
    onboarding-funnel read E73 (entry/exit) and E88 (transition latency)
    each answer a slice of: E73 says which door users enter through, E88
    times adjacent hops, E105 times the full first-touch→feature path a
    PM actually tracks ("how long until a new user reaches checkout").
    Minutes count timestamp-truncation boundaries, matching DuckDB
    date_diff('minute', ...).  One dense row per type ALWAYS (every
    listed type has ≥1 event, hence ≥1 adopter — never vacuous).  Exact
    int64 under the quantile_disc rank rule (two-level min + date_diff +
    quantile_disc oracle).

    Scale shape — ONE user-hash exchange, then the bounded-domain
    histogram: min is the combiner, so each batch pre-reduces to one
    (user, type, min_ts) row per pair seen; the user partition holds all
    of a user's pairs, settles first-overall = min over its pairs, and
    bincounts (type, delta_minutes) with freq = users — partial rows
    bounded by types × tape-span-in-minutes however many users exist;
    every quantile reads off one cumsum per type in the k=1 densifying
    merge (no second wide exchange at any scale).

    Reference parity: per-consumer first-delivery latency accounting in
    the metrics plane (internal/metrics/metrics.go:95-183), lifted to an
    exact corpus-wide distribution."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "ts"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "u": pc.cast(b["user_id"], pa.int64()),
                "c": pc.cast(
                    pc.index_in(b["event_type"], value_set=srcs), pa.int64()
                ),
                "m": b["ts"].cast(pa.int64()),
            }
        )
        g = t.group_by(["u", "c"], use_threads=False).aggregate([("m", "min")])
        return g.rename_columns(["u", "c", "m"])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "c": pa.array([], pa.int64()),
                    "d": pa.array([], pa.int64()),
                    "f": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["u", "c"], use_threads=False).aggregate([("m", "min")])
        u = g["u"].combine_chunks().to_numpy(zero_copy_only=False)
        c = g["c"].combine_chunks().to_numpy(zero_copy_only=False)
        m = g["m_min"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(u, kind="stable")
        u, c, m = u[order], c[order], m[order]
        news = np.empty(len(u), dtype=bool)
        news[0] = True
        news[1:] = u[1:] != u[:-1]
        seg = np.cumsum(news) - 1
        first = np.zeros(seg[-1] + 1, np.int64) + (1 << 62)
        np.minimum.at(first, seg, m)
        delta = (m // MIN_US) - (first[seg] // MIN_US)
        packed = c * (1 << 40) + delta  # span < 2^40 minutes ≈ 2M years
        vals, freq = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "c": pa.array(vals >> 40, pa.int64()),
                "d": pa.array(vals & ((1 << 40) - 1), pa.int64()),
                "f": pa.array(freq.astype(np.int64)),
            }
        )

    names = tuple(f"p{q // 10}_minutes" for q in qs)

    def merge(t: pa.Table) -> pa.Table:
        n_users = np.zeros(ns, np.int64)
        n_entry = np.zeros(ns, np.int64)
        quant = {c: np.zeros(ns, np.int64) for c in names}
        if t.num_rows:
            g = t.group_by(["c", "d"], use_threads=False).aggregate(
                [("f", "sum")]
            )
            cc = g["c"].combine_chunks().to_numpy(zero_copy_only=False)
            dd = g["d"].combine_chunks().to_numpy(zero_copy_only=False)
            ff = g["f_sum"].combine_chunks().to_numpy(zero_copy_only=False)
            order = np.lexsort((dd, cc))
            cc, dd, ff = cc[order], dd[order], ff[order]
            news = np.empty(len(cc), dtype=bool)
            news[0] = True
            news[1:] = cc[1:] != cc[:-1]
            starts = np.flatnonzero(news)
            ends = np.append(starts[1:], len(cc))
            for a, b in zip(starts, ends):
                s = int(cc[a])
                vals, freq = dd[a:b], ff[a:b]
                nt = int(freq.sum())
                n_users[s] = nt
                if vals[0] == 0:
                    n_entry[s] = int(freq[0])
                cum = np.cumsum(freq)
                for q, cn in zip(qs, names):
                    thr = (nt * q + 999) // 1000
                    quant[cn][s] = int(vals[np.searchsorted(cum, thr)])
        return pa.table(
            {
                "source": srcs,
                "n_users": pa.array(n_users),
                "n_entry_users": pa.array(n_entry),
                **{cn: pa.array(quant[cn]) for cn in names},
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    per_user = hash_partition_merge(partials, "u", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(per_user, "c", merge, k=1)


def events_session_maturity(sf_dir: str, cap: int = 8) -> Dataset:
    """E106: session-ordinal maturity board — per session ORDINAL (a
    user's 1st, 2nd, ... session in start order, capped at ``cap`` so
    the last bucket aggregates the 8th-and-later tail): how many
    sessions sit at that ordinal, their total events, and their total
    duration in MINUTES (truncation-boundary count, matching DuckDB
    date_diff) — the maturity read none of the session boards answer
    (E50 profiles duration globally, E76 counts sessions per user, E90
    tracks churn by calendar day; E106 asks whether visits DEEPEN or
    SHRINK as a user returns — n-th-visit engagement, the curve
    retention teams plot before investing in re-engagement).  Ordinal o
    rows exist iff some user reached o sessions (SQL GROUP BY shape;
    ordinal 1 always exists — never vacuous).  Exact int64 (the E15
    sessions CTE + LEAST(sid, cap) + SUM oracle).

    Scale shape — pure composition over E15's hot-key-safe sessionizer:
    sessionize already assigns each session its per-user start-order
    ordinal (session_id) during its boundary-merge exchange, so E106
    adds ZERO wide work — each batch of session summaries reduces with
    one np.unique over capped ordinals to ≤ cap partial rows, and the
    k=1 merge folds O(batches × cap) rows.  The 6h gap rule and
    (ts, event_id) tie-break are E15's."""
    from ..stages.shuffle import hash_partition_merge

    sessions = events_sessions(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "o": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "ev": pa.array([], pa.int64()),
                    "mn": pa.array([], pa.int64()),
                }
            )
        sid = (
            pc.cast(b["session_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        ordi = np.minimum(sid + 1, cap)
        nev = (
            pc.cast(b["n_events"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        st = b["start_ts"].cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        en = b["end_ts"].cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        mins = en // MIN_US - st // MIN_US
        keys, inv, cnt = np.unique(
            ordi, return_inverse=True, return_counts=True
        )
        ev = np.zeros(len(keys), np.int64)
        mn = np.zeros(len(keys), np.int64)
        np.add.at(ev, inv, nev)
        np.add.at(mn, inv, mins)
        return pa.table(
            {
                "o": pa.array(keys),
                "n": pa.array(cnt.astype(np.int64)),
                "ev": pa.array(ev),
                "mn": pa.array(mn),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "session_ordinal": pa.array([], pa.int64()),
                    "n_sessions": pa.array([], pa.int64()),
                    "sum_events": pa.array([], pa.int64()),
                    "sum_minutes": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("o", use_threads=False).aggregate(
            [("n", "sum"), ("ev", "sum"), ("mn", "sum")]
        )
        oo = g["o"].combine_chunks().to_numpy(zero_copy_only=False)
        order = pa.array(np.argsort(oo, kind="stable"))
        return pa.table(
            {
                "session_ordinal": pa.array(oo[np.argsort(oo)], pa.int64()),
                "n_sessions": pc.take(pc.cast(g["n_sum"], pa.int64()), order),
                "sum_events": pc.take(pc.cast(g["ev_sum"], pa.int64()), order),
                "sum_minutes": pc.take(pc.cast(g["mn_sum"], pa.int64()), order),
            }
        )

    partials = sessions.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "o", merge, k=1)


def events_peak_cell(sf_dir: str) -> Dataset:
    """E107: hour-of-week peak-cell board — per source: total events and
    the single (day-of-week, hour) cell of the 168-cell weekly grid
    holding the MOST events (ties -> smallest packed dow*24+hour cell),
    with its count — the argmax drill-down E104's concentration stats
    deliberately aggregate away (E104 says HOW clock-shaped a source is;
    E107 names WHICH hour the clock strikes — the cell a capacity
    planner schedules around and an anomaly monitor baselines).  dow
    matches DuckDB dayofweek (Sunday = 0).  One dense row per source
    ALWAYS (every source has >= 1 event).  Exact int64 (two-level GROUP
    BY + max-count/min-cell join oracle).

    Scale shape — E104's exchange with an associative argmax riding:
    per-cell totals MUST settle before comparing (a partial max is
    meaningless), so batches pre-reduce with one packed np.unique to
    (source, cell, n) partials and ONE (source, cell)-hash exchange
    decides each cell's exact total; each partition then emits its LOCAL
    best candidate per source plus an event-sum partial — (best, sum) is
    associative, so the k=1 merge folds O(partitions × sources) rows and
    never sees the grid."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        ts_us = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
        )
        days = ts_us // DAY_US
        cell = ((days + 4) % 7) * 24 + (ts_us % DAY_US) // HOUR_US
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        packed = code * 168 + cell
        vals, freq = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "sc": pa.array(vals, pa.int64()),
                "n": pa.array(freq.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "cell": pa.array([], pa.int64()),
                    "pk": pa.array([], pa.int64()),
                    "ev": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("sc", use_threads=False).aggregate([("n", "sum")])
        sc = g["sc"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        src = sc // 168
        cell = sc % 168
        # local best per source: max count, then smallest cell
        order = np.lexsort((cell, -nn, src))
        head = np.empty(len(src), dtype=bool)
        s_o = src[order]
        head[0] = True
        head[1:] = s_o[1:] != s_o[:-1]
        best = order[head]
        ev = np.zeros(ns, np.int64)
        np.add.at(ev, src, nn)
        return pa.table(
            {
                "src": pa.array(src[best].astype(np.int64)),
                "cell": pa.array(cell[best].astype(np.int64)),
                "pk": pa.array(nn[best].astype(np.int64)),
                "ev": pa.array(ev[src[best]].astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        n_events = np.zeros(ns, np.int64)
        pk = np.zeros(ns, np.int64)
        pcell = np.zeros(ns, np.int64)
        if t.num_rows:
            src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            cell = t["cell"].combine_chunks().to_numpy(zero_copy_only=False)
            cnt = t["pk"].combine_chunks().to_numpy(zero_copy_only=False)
            ev = t["ev"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(n_events, src, ev)
            order = np.lexsort((cell, -cnt, src))
            head = np.empty(len(src), dtype=bool)
            s_o = src[order]
            head[0] = True
            head[1:] = s_o[1:] != s_o[:-1]
            best = order[head]
            pk[src[best]] = cnt[best]
            pcell[src[best]] = cell[best]
        return pa.table(
            {
                "source": srcs,
                "n_events": pa.array(n_events),
                "peak_dow": pa.array(pcell // 24),
                "peak_hour": pa.array(pcell % 24),
                "peak_count": pa.array(pk),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "sc", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "src", merge, k=1)


def events_user_value_bands(sf_dir: str, band_units: int = 500) -> Dataset:
    """E108: user lifetime-value band histogram — for each band
    b = (Σ floor(value) over a user's whole stream) // band_units: users
    in the band, their total events, their total floored value units —
    the monetization mass distribution on the USER axis (E36 banded
    users by event COUNT, E96 banded EVENTS by single-event value; E108
    asks where the cumulative per-user value mass sits — the whale curve
    a pricing/abuse review reads).  Bands exist iff occupied (GROUP BY
    shape, never vacuous — every corpus has ≥ 1 user).  Exact int64
    (two-level GROUP BY + integer-divide oracle; floor(value) ≥ 0 here
    so // is sign-safe on both sides).

    Scale shape — E36's aggregate-of-aggregates with a value column
    riding: per batch one Arrow group_by reduces events to (user, n,
    Σfloor(value)) partials; ONE user-hash exchange settles each user's
    exact totals locally and re-reduces IN PLACE to (band, n_users,
    n_events, units) partials — per-user rows never leave their
    partition; k=1 merge sums O(partitions × bands) rows."""
    from ..stages.shuffle import hash_partition_merge

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        v = np.floor(
            b["value"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        t = pa.table(
            {
                "u": pc.cast(b["user_id"], pa.int64()),
                "n": pa.array(np.ones(len(v), np.int64)),
                "v": pa.array(v),
            }
        )
        g = t.group_by("u", use_threads=False).aggregate(
            [("n", "sum"), ("v", "sum")]
        )
        return g.rename_columns(["u", "n", "v"])

    def user_fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "band": pa.array([], pa.int64()),
                    "nu": pa.array([], pa.int64()),
                    "ne": pa.array([], pa.int64()),
                    "vu": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("u", use_threads=False).aggregate(
            [("n", "sum"), ("v", "sum")]
        )
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        v = g["v_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        band = v // band_units
        t2 = pa.table(
            {
                "band": pa.array(band.astype(np.int64)),
                "nu": pa.array(np.ones(len(band), np.int64)),
                "ne": pa.array(n.astype(np.int64)),
                "vu": pa.array(v.astype(np.int64)),
            }
        )
        g2 = t2.group_by("band", use_threads=False).aggregate(
            [("nu", "sum"), ("ne", "sum"), ("vu", "sum")]
        )
        return g2.rename_columns(["band", "nu", "ne", "vu"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "band": pa.array([], pa.int64()),
                    "n_users": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "value_units": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("band", use_threads=False).aggregate(
            [("nu", "sum"), ("ne", "sum"), ("vu", "sum")]
        )
        return g.rename_columns(
            ["band", "n_users", "n_events", "value_units"]
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    per_user = hash_partition_merge(
        partials, "u", user_fold, k=_adaptive_k(sf_dir)
    )
    return hash_partition_merge(per_user, "band", merge, k=1)


def events_ohlc_1d_cascaded(sf_dir: str) -> Dataset:
    """E109: daily candlesticks CASCADED from the 1m tier — per
    (event_type, UTC day): open/high/low/close of floor(value), where
    the day's open is the open of its earliest 1m bucket and the close
    the close of its latest — E4's raw→1m→1h→1d downsampling discipline
    applied to E17's OHLC aggregate (the count/sum cascade proved the
    tiers compose; E109 proves the ORDERED aggregate composes too:
    associativity is by construction, so the 1d tier reads ONLY the 1m
    tier's one-row-per-bucket output — at 100 TB a raw re-roll reads
    1440× more).  Exact int64, bit-equal to rolling the RAW stream to
    1d directly (the oracle does exactly that — row_number over
    (ts, event_id) within the day), which is the cascade-correctness
    statement itself.

    Scale shape — stages/rollup.ohlc_cascade: per batch the associative
    _ohlc_merge combiner collapses fine rows to one partial per
    (source, day); ONE day-hash exchange (salt axis = time, a hot
    source spreads) re-merges; no raw re-read, no driver fold."""
    from ..stages.rollup import ohlc_cascade

    fine = events_ohlc_1m(sf_dir)
    return ohlc_cascade(
        fine, "1d", t0_us=EVENTS_T0_US, k=_adaptive_k(sf_dir)
    )


def events_home_hour(sf_dir: str) -> Dataset:
    """E110: circadian home-hour board — for each hour-of-day 0-23: the
    users whose MODAL activity hour it is (ties -> smallest hour) and
    those users' total events — the user-axis circadian read E93's
    per-source phase quantiles and E52's seasonal profile aggregate away
    (E93 says when a SOURCE fires; E110 says when its USERS live — the
    table a notification scheduler or region-inference heuristic keys
    off).  One dense row per hour ALWAYS (24 rows, zeros where no user
    homes).  Exact int64 (two-level GROUP BY + max-count/min-hour join +
    generate_series densify oracle).

    Scale shape — E36's aggregate-of-aggregates with an argmax fold:
    per batch one packed np.unique reduces events to (user, hour, n)
    partials (≤ users × 24 rows); ONE user-hash exchange settles each
    user's exact 24-cell histogram locally — argmax + event total decided
    in place, re-reducing to ≤ 24 partial rows per partition; k=1
    densifying merge."""
    from ..stages.shuffle import hash_partition_merge

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        ts_us = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
        )
        hour = (ts_us % DAY_US) // HOUR_US
        uid = (
            pc.cast(b["user_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        packed = uid * 24 + hour
        vals, freq = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "u": pa.array(vals // 24, pa.int64()),
                "h": pa.array(vals % 24, pa.int64()),
                "n": pa.array(freq.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "hh": pa.array([], pa.int64()),
                    "nu": pa.array([], pa.int64()),
                    "ne": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["u", "h"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        u = g["u"].combine_chunks().to_numpy(zero_copy_only=False)
        h = g["h"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((h, -n, u))
        uo = u[order]
        head = np.empty(len(uo), dtype=bool)
        head[0] = True
        head[1:] = uo[1:] != uo[:-1]
        best = order[head]
        # per-user event totals land on the user's home hour
        tot = np.zeros(len(best), np.int64)
        gid = np.cumsum(head) - 1  # group id per sorted row
        np.add.at(tot, gid, n[order])
        nu = np.zeros(24, np.int64)
        ne = np.zeros(24, np.int64)
        np.add.at(nu, h[best], 1)
        np.add.at(ne, h[best], tot)
        return pa.table(
            {
                "hh": pa.array(np.arange(24, dtype=np.int64)),
                "nu": pa.array(nu),
                "ne": pa.array(ne),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nu = np.zeros(24, np.int64)
        ne = np.zeros(24, np.int64)
        if t.num_rows:
            hh = t["hh"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                nu,
                hh,
                t["nu"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                ne,
                hh,
                t["ne"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        return pa.table(
            {
                "home_hour": pa.array(np.arange(24, dtype=np.int64)),
                "n_users": pa.array(nu),
                "n_events": pa.array(ne),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    per_user = hash_partition_merge(
        partials, "u", fold, k=_adaptive_k(sf_dir)
    )
    return hash_partition_merge(per_user, "hh", merge, k=1)


def events_gap_by_hour(
    sf_dir: str,
    window_us: int = TEMPORAL_WINDOW_US,
    qs: tuple[int, ...] = (500, 900),
) -> Dataset:
    """E111: inter-arrival quantiles BY HOUR OF DAY — per (source,
    hour-of-day of the LATER event): n_gaps + discrete p50/p90 of the
    floor-second gap between consecutive events in (ts, event_id) order
    — E81's liveness SLO number conditioned on the clock (a source
    whose p50 gap collapses at peak hours and balloons overnight needs
    hour-aware alert thresholds; E81's single number can't say which).
    Rows exist iff the (source, hour) cell saw an arrival with a
    predecessor (GROUP BY shape, matching the SQL lag + WHERE).  Exact
    int64 under the quantile_disc rank rule (lag + hour() +
    quantile_disc oracle).

    Scale shape — E81's order-dependent machinery verbatim ((source,
    ts-window) sub-partitioning + the shared `_last_event_carries`
    predecessor round), the bounded histogram just keyed one axis finer:
    flooring gaps to seconds bounds the value domain, so partitions
    reduce to (source, hour, gap_s, n) partials (≤ 24× E81's, still
    value-domain-bounded whatever the corpus size) and every cell's
    quantiles read off one cumulative sum in the k=1 merge."""
    from ..stages.shuffle import hash_partition_merge, shuffle_parts
    from ..stages.temporal import _kw_partition

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def narrow(b: pa.Table) -> pa.Table:
        ts_us = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
        )
        return pa.table(
            {
                "k": pc.cast(
                    pc.index_in(b["event_type"], value_set=srcs), pa.int64()
                ),
                "t": pa.array(ts_us, pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
                "v": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
                "carry": pa.array(np.zeros(b.num_rows, dtype=bool)),
                "w": pa.array(ts_us // window_us, pa.int64()),
            }
        )

    tagged = ds.map_batches(narrow, batch_format="pyarrow")
    carries = _last_event_carries(tagged)
    full = tagged.union(
        carries.map_batches(_tag_carry, batch_format="pyarrow")
    )

    def kernel(t_: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cell": pa.array([], pa.int64()),
                "gap_s": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if t_.num_rows == 0:
            return empty
        kk = t_["k"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t_["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t_["o"].combine_chunks().to_numpy(zero_copy_only=False)
        cr = t_["carry"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cr, oo, tt, kk))
        ks, ts_, crs = kk[order], tt[order], cr[order]
        n = len(order)
        has_prev = np.empty(n, dtype=bool)
        has_prev[0] = False
        has_prev[1:] = ks[1:] == ks[:-1]
        pt = np.empty(n, dtype=np.int64)
        pt[0] = 0
        pt[1:] = ts_[:-1]
        sel = has_prev & ~crs
        if not sel.any():
            return empty
        gaps = (ts_[sel] - pt[sel]) // 1_000_000
        hour = (ts_[sel] % DAY_US) // HOUR_US
        cell = ks[sel] * 24 + hour
        order2 = np.lexsort((gaps, cell))
        c2, g2 = cell[order2], gaps[order2]
        new = np.empty(len(order2), dtype=bool)
        new[0] = True
        new[1:] = (c2[1:] != c2[:-1]) | (g2[1:] != g2[:-1])
        st = np.flatnonzero(new)
        return pa.table(
            {
                "cell": pa.array(c2[st], pa.int64()),
                "gap_s": pa.array(g2[st], pa.int64()),
                "n": pa.array(
                    np.diff(np.append(st, len(order2))).astype(np.int64)
                ),
            }
        )

    partials = _kw_partition(full, kernel, shuffle_parts(_adaptive_k(sf_dir)))
    names = tuple(f"p{q // 10}_s" for q in qs)

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "hour": pa.array([], pa.int64()),
                    "n_gaps": pa.array([], pa.int64()),
                    **{c: pa.array([], pa.int64()) for c in names},
                }
            )
        g = t.group_by(["cell", "gap_s"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        cc = g["cell"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = g["gap_s"].combine_chunks().to_numpy(zero_copy_only=False)
        ff = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((vv, cc))
        c2, v2, f2 = cc[order], vv[order], ff[order]
        news = np.empty(len(order), dtype=bool)
        news[0] = True
        news[1:] = c2[1:] != c2[:-1]
        sstart = np.flatnonzero(news)
        send = np.append(sstart[1:], len(order))
        out = {"s": [], "h": [], "n_gaps": [], **{c: [] for c in names}}
        for a, b in zip(sstart, send):
            vals, freq = v2[a:b], f2[a:b]
            nt = int(freq.sum())
            cum = np.cumsum(freq)
            out["s"].append(int(c2[a]) // 24)
            out["h"].append(int(c2[a]) % 24)
            out["n_gaps"].append(nt)
            for q, c in zip(qs, names):
                thr = (nt * q + 999) // 1000
                out[c].append(int(vals[np.searchsorted(cum, thr)]))
        return pa.table(
            {
                "source": srcs.take(pa.array(out["s"], pa.int64())),
                "hour": pa.array(out["h"], pa.int64()),
                "n_gaps": pa.array(out["n_gaps"], pa.int64()),
                **{c: pa.array(out[c], pa.int64()) for c in names},
            }
        )

    return hash_partition_merge(partials, "cell", merge, k=1)


def events_weekpart_board(sf_dir: str) -> Dataset:
    """E112: weekday/weekend split board — per (source, is_weekend):
    events, DISTINCT active UTC days, Σfloor(value) — the two-regime
    capacity read E104/E107 resolve into 168 cells but planners consume
    as one ratio ("do we staff weekends"); distinct active days make
    the two regimes rate-comparable (events/day, not raw counts —
    weekends are 2/7 of the calendar).  is_weekend uses DuckDB's
    Sunday-0 dayofweek (dow 0 or 6).  One dense row per (source,
    weekpart) ALWAYS (both regimes shown, zeros where silent).  Exact
    int64 (dayofweek CASE + two-level GROUP BY + densify oracle).

    Scale shape — bounded-domain distinct-day settle: per batch one
    packed np.unique reduces events to (source, weekpart, day, n, Σv)
    partials (day domain bounded by retention); ONE (source, day)-hash
    exchange dedupes days exactly and re-reduces IN PLACE to per-(source,
    weekpart) triples; k=1 densifying merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        ts_us = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
        )
        day = ts_us // DAY_US
        v = np.floor(
            b["value"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        packed = code * (1 << 32) + day
        vals, inv = np.unique(packed, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        sv = np.zeros(len(vals), np.int64)
        np.add.at(sv, inv, v)
        return pa.table(
            {
                "sd": pa.array(vals, pa.int64()),
                "n": pa.array(n),
                "v": pa.array(sv),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    "ne": pa.array([], pa.int64()),
                    "nd": pa.array([], pa.int64()),
                    "sv": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("sd", use_threads=False).aggregate(
            [("n", "sum"), ("v", "sum")]
        )
        sd = g["sd"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        v = g["v_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        src = sd >> 32
        day = sd & 0xFFFFFFFF
        dow = (day + 4) % 7
        wk = ((dow == 0) | (dow == 6)).astype(np.int64)
        cell = src * 2 + wk
        ne = np.zeros(2 * ns, np.int64)
        nd = np.zeros(2 * ns, np.int64)
        sv = np.zeros(2 * ns, np.int64)
        np.add.at(ne, cell, n)
        np.add.at(nd, cell, 1)  # each (source, day) settles exactly once
        np.add.at(sv, cell, v)
        live = np.flatnonzero(ne)
        return pa.table(
            {
                "cell": pa.array(live.astype(np.int64)),
                "ne": pa.array(ne[live]),
                "nd": pa.array(nd[live]),
                "sv": pa.array(sv[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        acc = np.zeros((3, 2 * ns), np.int64)
        if t.num_rows:
            cell = t["cell"].combine_chunks().to_numpy(zero_copy_only=False)
            for i, c in enumerate(["ne", "nd", "sv"]):
                np.add.at(
                    acc[i],
                    cell,
                    t[c].combine_chunks().to_numpy(zero_copy_only=False),
                )
        idx = np.arange(2 * ns, dtype=np.int64)
        return pa.table(
            {
                "source": srcs.take(pa.array(idx // 2)),
                "is_weekend": pa.array(idx % 2),
                "n_events": pa.array(acc[0]),
                "n_days": pa.array(acc[1]),
                "value_units": pa.array(acc[2]),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "sd", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "cell", merge, k=1)


def events_source_concurrency(sf_dir: str) -> Dataset:
    """E113: source-concurrency histogram — for each k: minutes in which
    EXACTLY k distinct sources were active — the co-activity profile of
    the whole tape in one curve (all mass at k = sources: lockstep
    telemetry; mass at k = 1: disjoint duty cycles — what a bin-packing
    scheduler or a shared-sink capacity model reads first); E38 counts
    users within a source-minute, E113 counts SOURCES across the
    minute axis.  GROUP BY shape (a k row exists iff some minute hit
    it).  Exact int64 (DISTINCT two-level GROUP BY oracle).

    Scale shape — E36's aggregate-of-aggregates on the minute axis: per
    batch one packed np.unique reduces events to distinct (minute,
    source) cells; ONE minute-hash exchange dedupes each minute's cells
    exactly and re-reduces IN PLACE to (k, n_minutes) partials — at
    most `sources` distinct k values per partition; k=1 merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        ts_us = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
        )
        minute = ts_us // 60_000_000
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        packed = np.unique(minute * len(srcs) + code)
        return pa.table({"mc": pa.array(packed, pa.int64())})

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "k": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        mc = np.unique(
            t["mc"].combine_chunks().to_numpy(zero_copy_only=False)
        )
        minutes = mc // len(srcs)
        _, per_minute = np.unique(minutes, return_counts=True)
        kv, freq = np.unique(per_minute, return_counts=True)
        return pa.table(
            {
                "k": pa.array(kv.astype(np.int64)),
                "n": pa.array(freq.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "n_sources": pa.array([], pa.int64()),
                    "n_minutes": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("k", use_threads=False).aggregate([("n", "sum")])
        return g.rename_columns(["n_sources", "n_minutes"])

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    # route whole minutes to one partition: key = minute (mc // len)
    def rekey(b: pa.Table) -> pa.Table:
        mc = b["mc"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "mc": b["mc"],
                "m": pa.array(mc // len(srcs), pa.int64()),
            }
        )

    keyed = partials.map_batches(rekey, batch_format="pyarrow")
    cells = hash_partition_merge(keyed, "m", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "k", merge, k=1)


def events_id_audit(sf_dir: str) -> Dataset:
    """E114: event-id integrity audit — ONE row: events, min/max
    event_id, DISTINCT ids, missing ids (span − distinct), duplicate
    rows (count − distinct) — the reference's missing-delivery-tag
    check (`consumer.go` tracks per-queue tags; `SURVEY.md §2.1 M6`)
    applied to the events stream itself, and the events-table sibling
    of the tape's f1_gap_report: a non-zero missing count means the
    producer dropped writes, duplicates mean at-least-once delivery
    leaked through — the first board an ingest incident review opens.
    Exact int64 (count/min/max/count(DISTINCT) oracle).

    Scale shape — exact distinct over a corpus-sized id space WITHOUT
    collecting ids: per batch one np.unique dedupes locally; ONE
    id-hash exchange makes cross-batch copies co-locate, so each
    partition's post-dedupe count is additive; only (distinct, min,
    max, rows) 4-tuples — one per partition — reach the k=1 merge."""
    from ..stages.shuffle import hash_partition_merge

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        ids = (
            pc.cast(b["event_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        vals, freq = np.unique(ids, return_counts=True)
        return pa.table(
            {
                "id": pa.array(vals, pa.int64()),
                "n": pa.array(freq.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "z": pa.array([], pa.int64()),
                    "rows": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.int64()),
                    "mn": pa.array([], pa.int64()),
                    "mx": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("id", use_threads=False).aggregate([("n", "sum")])
        ids = g["id"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "z": pa.array([0], pa.int64()),
                "rows": pa.array([int(n.sum())], pa.int64()),
                "dist": pa.array([len(ids)], pa.int64()),
                "mn": pa.array([int(ids.min())], pa.int64()),
                "mx": pa.array([int(ids.max())], pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "n_events": pa.array([0], pa.int64()),
                    "min_id": pa.array([0], pa.int64()),
                    "max_id": pa.array([0], pa.int64()),
                    "n_distinct": pa.array([0], pa.int64()),
                    "n_missing": pa.array([0], pa.int64()),
                    "n_dup_rows": pa.array([0], pa.int64()),
                }
            )
        rows = int(
            t["rows"].combine_chunks().to_numpy(zero_copy_only=False).sum()
        )
        dist = int(
            t["dist"].combine_chunks().to_numpy(zero_copy_only=False).sum()
        )
        mn = int(
            t["mn"].combine_chunks().to_numpy(zero_copy_only=False).min()
        )
        mx = int(
            t["mx"].combine_chunks().to_numpy(zero_copy_only=False).max()
        )
        return pa.table(
            {
                "n_events": pa.array([rows], pa.int64()),
                "min_id": pa.array([mn], pa.int64()),
                "max_id": pa.array([mx], pa.int64()),
                "n_distinct": pa.array([dist], pa.int64()),
                "n_missing": pa.array([mx - mn + 1 - dist], pa.int64()),
                "n_dup_rows": pa.array([rows - dist], pa.int64()),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "id", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "z", merge, k=1)


def events_halfload(sf_dir: str) -> Dataset:
    """E115: half-load minute board — per source: active days and the
    discrete p50 over days of the HALF-LOAD minute-of-day (the earliest
    minute m where twice the day's cumulative event count reaches the
    day's total — the load centroid a batch-window planner schedules
    after: half the day's traffic is already in).  E93 gives the median
    EVENT's clock time; E115 gives the median DAY's crossing point —
    robust to one heavy day in a way E93 is not.  One dense row per
    source ALWAYS.  Exact int64 (window-cumsum crossing + quantile_disc
    oracle).

    Scale shape — the per-day crossing needs the day's full minute
    histogram: per batch one packed np.unique reduces events to
    (source, day, minute, n) partials (≤ 1440/day cells); ONE
    (source, day)-hash exchange settles each day's histogram locally —
    one lexsort + cumsum finds the crossing, re-reducing IN PLACE to
    (source, crossing-minute, n_days) partials over a ≤ sources × 1440
    domain; the k=1 merge reads the p50 off one cumsum per source."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        ts_us = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
        )
        day = ts_us // DAY_US
        minute = (ts_us % DAY_US) // 60_000_000
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        packed = (code * (1 << 32) + day) * 1440 + minute
        vals, freq = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "sd": pa.array(vals // 1440, pa.int64()),
                "m": pa.array(vals % 1440, pa.int64()),
                "n": pa.array(freq.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "cm": pa.array([], pa.int64()),
                    "nd": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["sd", "m"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        sd = g["sd"].combine_chunks().to_numpy(zero_copy_only=False)
        m = g["m"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((m, sd))
        sdo, mo, no = sd[order], m[order], n[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = sdo[1:] != sdo[:-1]
        gid = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        tot = np.zeros(gid[-1] + 1, np.int64)
        np.add.at(tot, gid, no)
        cum = np.cumsum(no)
        base = np.zeros(len(no), np.int64)
        base[starts[1:]] = cum[starts[1:] - 1]
        run_base = np.maximum.accumulate(base)
        within = cum - run_base
        crossed = 2 * within >= tot[gid]
        # earliest crossing minute per (source, day) group
        first_idx = np.zeros(gid[-1] + 1, np.int64)
        seen = np.zeros(gid[-1] + 1, bool)
        idxs = np.flatnonzero(crossed)
        # reverse scatter keeps the FIRST crossing per group
        for_gid = gid[idxs]
        first_idx[for_gid[::-1]] = idxs[::-1]
        seen[for_gid] = True
        cm = mo[first_idx[seen]]
        src = sdo[starts][seen] >> 32
        t2 = pa.table(
            {
                "sc": pa.array(src * 1440 + cm, pa.int64()),
                "one": pa.array(np.ones(len(cm), np.int64)),
            }
        )
        g2 = t2.group_by("sc", use_threads=False).aggregate([("one", "sum")])
        sc = g2["sc"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(sc // 1440, pa.int64()),
                "cm": pa.array(sc % 1440, pa.int64()),
                "nd": pc.cast(g2["one_sum"], pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        n_days = np.zeros(ns, np.int64)
        p50 = np.zeros(ns, np.int64)
        if t.num_rows:
            g = t.group_by(["src", "cm"], use_threads=False).aggregate(
                [("nd", "sum")]
            )
            src = g["src"].combine_chunks().to_numpy(zero_copy_only=False)
            cm = g["cm"].combine_chunks().to_numpy(zero_copy_only=False)
            nd = g["nd_sum"].combine_chunks().to_numpy(zero_copy_only=False)
            order = np.lexsort((cm, src))
            so, co, no = src[order], cm[order], nd[order]
            new = np.empty(len(order), dtype=bool)
            new[0] = True
            new[1:] = so[1:] != so[:-1]
            starts = np.flatnonzero(new)
            ends = np.append(starts[1:], len(order))
            for a, b in zip(starts, ends):
                tot = int(no[a:b].sum())
                n_days[so[a]] = tot
                thr = (tot * 500 + 999) // 1000
                cumv = np.cumsum(no[a:b])
                p50[so[a]] = co[a:b][np.searchsorted(cumv, thr)]
        return pa.table(
            {
                "source": srcs,
                "n_days": pa.array(n_days),
                "p50_halfload_minute": pa.array(p50),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "sd", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "src", merge, k=1)


def events_grid_rle(sf_dir: str) -> Dataset:
    """E116: grid run-length compressibility board — per source over the
    dense gap-filled 1m grid: minutes (span), maximal CONSTANT-count
    runs, and the longest such run — the direct feasibility read for
    the engine's own delta-of-delta/Gorilla encoders (E6/E7 compress
    constant runs to one bit per point; a series whose run count ≈ its
    minute count gains nothing — this board says which series earn
    dictionary/RLE treatment at the retention tier).  Gap minutes count
    as zero-count points (they ARE points in the stored tier), so long
    silences form long runs — exactly what the encoder sees.  One dense
    row per source ALWAYS.  Exact int64 (gapfill CTE + lag +
    gaps-and-islands oracle).

    Scale shape — pure composition over scale-safe stages: E5's
    windowed gap_fill supplies the dense grid ((source, window)+halo
    partitioning); a per-partition shifted-compare kernel counts run
    BREAKS locally with one boundary-carry row per (source, window)
    edge — the shared `_streak_stats` discipline: only (source, runs,
    longest, minutes) partials reach the k=1 merge, stitched across
    window edges by carrying each window's first/last value and
    run-tail length."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    grid = events_gapfill(sf_dir, "1m").select_columns(
        ["source", "bucket_ts", "count"]
    )

    def partial(b: pa.Table) -> pa.Table:
        # grid rows already dense per source; reduce each batch to
        # per-(source) run summaries over CONTIGUOUS minutes, emitting
        # boundary info so the merge can stitch across batches.
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        ts = (
            b["bucket_ts"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        ) // 60_000_000
        cnt = (
            pc.cast(b["count"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        order = np.lexsort((ts, code))
        c, t, v = code[order], ts[order], cnt[order]
        # run break: new source, non-adjacent minute, or value change
        brk = np.empty(len(c), dtype=bool)
        brk[0] = True
        brk[1:] = (
            (c[1:] != c[:-1]) | (t[1:] != t[:-1] + 1) | (v[1:] != v[:-1])
        )
        rid = np.cumsum(brk) - 1
        run_len = np.bincount(rid).astype(np.int64)
        run_src = c[brk]
        run_t0 = t[brk]
        run_t1 = run_t0 + run_len - 1
        run_v = v[brk]
        return pa.table(
            {
                "src": pa.array(run_src),
                "t0": pa.array(run_t0),
                "t1": pa.array(run_t1),
                "v": pa.array(run_v),
                "len": pa.array(run_len),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        n_minutes = np.zeros(ns, np.int64)
        n_runs = np.zeros(ns, np.int64)
        longest = np.zeros(ns, np.int64)
        if t.num_rows:
            src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            t0 = t["t0"].combine_chunks().to_numpy(zero_copy_only=False)
            t1 = t["t1"].combine_chunks().to_numpy(zero_copy_only=False)
            v = t["v"].combine_chunks().to_numpy(zero_copy_only=False)
            ln = t["len"].combine_chunks().to_numpy(zero_copy_only=False)
            order = np.lexsort((t0, src))
            s, a, bnd, vv, ll = (
                src[order],
                t0[order],
                t1[order],
                v[order],
                ln[order],
            )
            # stitch adjacent same-value runs split across batches
            join = np.zeros(len(s), dtype=bool)
            join[1:] = (
                (s[1:] == s[:-1]) & (a[1:] == bnd[:-1] + 1) & (vv[1:] == vv[:-1])
            )
            rid = np.cumsum(~join) - 1
            tot_len = np.zeros(rid[-1] + 1, np.int64)
            np.add.at(tot_len, rid, ll)
            first = np.flatnonzero(~join)
            rs = s[first]
            np.add.at(n_minutes, rs, tot_len)
            np.add.at(n_runs, rs, 1)
            np.maximum.at(longest, rs, tot_len)
        return pa.table(
            {
                "source": srcs,
                "n_minutes": pa.array(n_minutes),
                "n_runs": pa.array(n_runs),
                "longest_run": pa.array(longest),
            }
        )

    partials = grid.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "src", merge, k=1)


def events_burstiness(sf_dir: str) -> Dataset:
    """E117: per-source burstiness sufficient stats over the dense 1m
    grid — n_minutes (span first..last active minute), active_minutes,
    n_events, sum_sq (Σ per-minute count² with silent minutes counting
    as zero) and max_minute — the index-of-dispersion board (Fano =
    (Σc²/m − (Σc/m)²)/(Σc/m) reads off these five integers offline):
    E116 says HOW the series compresses, E117 whether its load is
    Poisson-flat or bursty — the number an autoscaler's headroom factor
    and the E5 gap-fill tier's block-size choice both key off.  Zero
    minutes contribute zero to every sum, so only the span is needed to
    account for them.  One dense row per source ALWAYS; exact int64
    (minute GROUP BY + date_diff span oracle).

    Scale shape — E112's bounded-domain settle on the minute axis: per
    batch one packed np.unique reduces events to (source, minute, n)
    partials; ONE (source, minute)-hash exchange makes per-minute
    counts exact (each cell settles in exactly one partition), which
    re-reduces IN PLACE to one 6-tuple per (source, partition); the
    k=1 merge adds sums, maxes maxes and min/maxes the span ends.
    Reference parity: the dispersion read over the reference's stored
    counter tier (`internal/storage/memory/memory.go` counters)."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        ts_us = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
        )
        minute = ts_us // MIN_US
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        packed = code * (1 << 32) + minute
        vals, cnt = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "sm": pa.array(vals, pa.int64()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "act": pa.array([], pa.int64()),
                    "ne": pa.array([], pa.int64()),
                    "ss": pa.array([], pa.int64()),
                    "mx": pa.array([], pa.int64()),
                    "lo": pa.array([], pa.int64()),
                    "hi": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("sm", use_threads=False).aggregate([("n", "sum")])
        sm = g["sm"].combine_chunks().to_numpy(zero_copy_only=False)
        c = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        src = sm >> 32
        minute = sm & 0xFFFFFFFF
        act = np.zeros(ns, np.int64)
        ne = np.zeros(ns, np.int64)
        ss = np.zeros(ns, np.int64)
        mx = np.zeros(ns, np.int64)
        lo = np.full(ns, np.iinfo(np.int64).max)
        hi = np.full(ns, -1, np.int64)
        np.add.at(act, src, 1)
        np.add.at(ne, src, c)
        np.add.at(ss, src, c * c)
        np.maximum.at(mx, src, c)
        np.minimum.at(lo, src, minute)
        np.maximum.at(hi, src, minute)
        live = np.flatnonzero(act)
        return pa.table(
            {
                "src": pa.array(live.astype(np.int64)),
                "act": pa.array(act[live]),
                "ne": pa.array(ne[live]),
                "ss": pa.array(ss[live]),
                "mx": pa.array(mx[live]),
                "lo": pa.array(lo[live]),
                "hi": pa.array(hi[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        act = np.zeros(ns, np.int64)
        ne = np.zeros(ns, np.int64)
        ss = np.zeros(ns, np.int64)
        mx = np.zeros(ns, np.int64)
        lo = np.full(ns, np.iinfo(np.int64).max)
        hi = np.full(ns, -1, np.int64)
        acc = {"act": act, "ne": ne, "ss": ss, "mx": mx, "lo": lo, "hi": hi}
        if t.num_rows:
            src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            for col, red in (
                ("act", np.add),
                ("ne", np.add),
                ("ss", np.add),
                ("mx", np.maximum),
                ("lo", np.minimum),
                ("hi", np.maximum),
            ):
                arr = t[col].combine_chunks().to_numpy(zero_copy_only=False)
                red.at(acc[col], src, arr)
        span = np.where(hi >= 0, hi - lo + 1, 0)
        return pa.table(
            {
                "source": srcs,
                "n_minutes": pa.array(span.astype(np.int64)),
                "active_minutes": pa.array(act),
                "n_events": pa.array(ne),
                "sum_sq": pa.array(ss),
                "max_minute": pa.array(mx),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "sm", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "src", merge, k=1)


def events_audience_conc(sf_dir: str) -> Dataset:
    """E118: lifetime audience-concentration board — per source:
    n_events, distinct users, ``sum_cc`` = Σᵤ cᵤ(cᵤ−1) over each
    user's lifetime event count (Simpson concentration λ =
    sum_cc/(n(n−1)) reads off offline — E38's convention), the top
    user's count and its permille share of the source's traffic — the
    "is this source one bot or broad organic reach" read at the
    SOURCE'S WHOLE LIFETIME: E36 histograms users globally, E38
    watches concentration minute by minute, E61 asks the 80/20
    question of the whole tape — none answers which SOURCE's volume
    is audience-thin, which is the first split an abuse triage makes
    (a concentrated source is one account's loop; a broad one is a
    product surface).  One dense row per source ALWAYS; exact int64
    (two-level GROUP BY + permille divide oracle).

    Scale shape — E117's bounded-settle machinery on the USER axis
    (corpus-scaled, so cells exchange by user hash instead of packing
    into the key): per batch one Arrow group_by reduces events to
    (user, source, n) partials; ONE user-hash exchange co-locates
    every cell of a user so per-(source, user) lifetime counts are
    exact, re-reducing IN PLACE to one 5-tuple per (source,
    partition); the k=1 merge adds sums and maxes maxes — no user id
    list ever lands on one node.  Reference parity: the per-consumer
    delivery counters (`internal/metrics/metrics.go:95-183`) cut per
    source over the whole retention window."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = pc.cast(
            pc.index_in(b["event_type"], value_set=srcs), pa.int64()
        )
        t = pa.table(
            {"u": pc.cast(b["user_id"], pa.int64()), "s": code}
        )
        g = t.group_by(["u", "s"], use_threads=False).aggregate(
            [("s", "count")]
        )
        return g.rename_columns(["u", "s", "n"])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "s": pa.array([], pa.int64()),
                    "nu": pa.array([], pa.int64()),
                    "ne": pa.array([], pa.int64()),
                    "scc": pa.array([], pa.int64()),
                    "mx": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["u", "s"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        s = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        c = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        nu = np.zeros(ns, np.int64)
        ne = np.zeros(ns, np.int64)
        scc = np.zeros(ns, np.int64)
        mx = np.zeros(ns, np.int64)
        np.add.at(nu, s, 1)
        np.add.at(ne, s, c)
        np.add.at(scc, s, c * (c - 1))
        np.maximum.at(mx, s, c)
        live = np.flatnonzero(nu)
        return pa.table(
            {
                "s": pa.array(live.astype(np.int64)),
                "nu": pa.array(nu[live]),
                "ne": pa.array(ne[live]),
                "scc": pa.array(scc[live]),
                "mx": pa.array(mx[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nu = np.zeros(ns, np.int64)
        ne = np.zeros(ns, np.int64)
        scc = np.zeros(ns, np.int64)
        mx = np.zeros(ns, np.int64)
        acc = {"nu": (nu, np.add), "ne": (ne, np.add),
               "scc": (scc, np.add), "mx": (mx, np.maximum)}
        if t.num_rows:
            s = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
            for col, (a, red) in acc.items():
                arr = t[col].combine_chunks().to_numpy(
                    zero_copy_only=False
                )
                red.at(a, s, arr)
        return pa.table(
            {
                "source": srcs,
                "n_events": pa.array(ne),
                "n_users": pa.array(nu),
                "sum_cc": pa.array(scc),
                "max_user": pa.array(mx),
                "top_permille": pa.array(
                    1000 * mx // np.maximum(ne, 1)
                ),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "u", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "s", merge, k=1)


def events_user_burst(sf_dir: str) -> Dataset:
    """E119: per-user minute-burst quantiles — per source: distinct
    (user, minute) cells, discrete p50/p99 and max of the cell's event
    count — the single-account RATE profile (E38 asks whether a
    MINUTE's traffic is one user; E118 whether the SOURCE's lifetime
    is; E119 how hard one user hammers one minute — the number a
    rate-limiter's threshold and a replay-attack detector are tuned
    against: p99 is organic burst, max is the abuser).  One dense row
    per source ALWAYS; exact int64 under the quantile_disc rank rule
    (three-level GROUP BY + quantile_disc oracle).

    Scale shape — E118's user-hash settle with the minute riding: per
    batch one Arrow group_by reduces events to (user, minute, source,
    n) partials; ONE user-hash exchange makes every cell's count exact
    (all of a user's cells co-locate), re-reducing IN PLACE to
    (source, count) histogram partials — the count domain is tiny
    (T21's bounded-histogram rule: a cell holds at most one minute of
    one user), so quantiles read off one cumsum per source in the k=1
    merge; no (user, minute) list ever lands on one node.  Reference
    parity: the per-consumer prefetch/QoS knob
    (`internal/consumer/rmq.go` prefetch) sized from data."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        minute = pa.array(
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // MIN_US
        )
        code = pc.cast(
            pc.index_in(b["event_type"], value_set=srcs), pa.int64()
        )
        t = pa.table(
            {
                "u": pc.cast(b["user_id"], pa.int64()),
                "m": minute,
                "s": code,
            }
        )
        g = t.group_by(["u", "m", "s"], use_threads=False).aggregate(
            [("s", "count")]
        )
        return g.rename_columns(["u", "m", "s", "n"])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"sc": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        g = t.group_by(["u", "m", "s"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        s = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        c = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        packed = s * (1 << 32) + c
        vals, cnt = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "sc": pa.array(vals.astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        n_cells = np.zeros(ns, np.int64)
        p50 = np.zeros(ns, np.int64)
        p99 = np.zeros(ns, np.int64)
        mx = np.zeros(ns, np.int64)
        if t.num_rows:
            g = t.group_by("sc", use_threads=False).aggregate(
                [("n", "sum")]
            )
            sc = g["sc"].combine_chunks().to_numpy(zero_copy_only=False)
            cnt = g["n_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            order = np.argsort(sc, kind="stable")
            sc, cnt = sc[order], cnt[order]
            s = sc >> 32
            c = sc & 0xFFFFFFFF
            for si in np.unique(s):
                m = s == si
                cv, nv = c[m], cnt[m]
                cum = np.cumsum(nv)
                total = int(cum[-1])
                n_cells[si] = total
                for arr, q in ((p50, 500), (p99, 990)):
                    thr = (total * q + 999) // 1000
                    arr[si] = int(
                        cv[np.searchsorted(cum, thr, side="left")]
                    )
                mx[si] = int(cv[-1])
        return pa.table(
            {
                "source": srcs,
                "n_cells": pa.array(n_cells),
                "p50": pa.array(p50),
                "p99": pa.array(p99),
                "max_burst": pa.array(mx),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "u", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "sc", merge, k=1)


def events_benford(sf_dir: str) -> Dataset:
    """E120: leading-digit (Benford) audit board — per (source, digit
    1..9): events whose ``value`` has that leading significant decimal
    digit, plus its permille of the source's events — the classic
    synthetic-/injected-data forensic (organically multiplicative
    quantities follow log-uniform first digits; a flat or spiked
    profile marks generated or clamped values — the cheapest "is this
    feed real traffic" screen, read next to E94's value bands which
    profile MAGNITUDE, not digit law).  Digit extraction is exact:
    floor(value·1000) (scaling by a power of ten preserves the leading
    digit; values < 0.001 would land in digit 0 and are excluded from
    the dense 1..9 spine but still count in the permille denominator).
    One dense row per (source, digit) ALWAYS (9 × sources); exact
    int64 (substr-of-CAST oracle — identical IEEE double ops on both
    sides).

    Scale shape — ZERO wide exchange (E64's profile shape): the digit
    is a stateless per-row function (a ~7-step vectorized divide-by-10
    loop, no strings, no log10 rounding risk); per batch one packed
    np.unique reduces to ≤ sources × 10 partial rows; k=1 densifying
    merge.  Reference parity: the validation lane's numeric-range
    check (`internal/messages/messages.go`) as a distributional law."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        v = b["value"].combine_chunks().to_numpy(zero_copy_only=False)
        n = np.floor(v * 1000).astype(np.int64)
        n = np.maximum(n, 0)
        while (n >= 10).any():
            n = np.where(n >= 10, n // 10, n)
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        packed = code * 16 + n
        vals, cnt = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "sd": pa.array(vals.astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        counts = np.zeros((ns, 16), np.int64)
        if t.num_rows:
            g = t.group_by("sd", use_threads=False).aggregate(
                [("n", "sum")]
            )
            sd = g["sd"].combine_chunks().to_numpy(zero_copy_only=False)
            n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
            counts[sd // 16, sd % 16] = n
        tot = counts.sum(axis=1)
        digits = np.arange(1, 10, dtype=np.int64)
        out_src = srcs.take(
            pa.array(np.repeat(np.arange(ns), 9).astype(np.int64))
        )
        dig = np.tile(digits, ns)
        cnt = counts[:, 1:10].reshape(-1)
        den = np.repeat(np.maximum(tot, 1), 9)
        return pa.table(
            {
                "source": out_src,
                "digit": pa.array(dig),
                "n_events": pa.array(cnt),
                "permille": pa.array(1000 * cnt // den),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "sd", merge, k=1)


def events_duty_cycle(sf_dir: str) -> Dataset:
    """E121: duty-cycle quantiles — per source: days with ≥1 event and
    the discrete p50/p90/max of ACTIVE MINUTES PER DAY (distinct 1m
    buckets touched) — the operational duty cycle (E58 gives lifetime
    coverage of the whole span, E115 the day's load centroid; E121 how
    much of a typical DAY the feed is actually on — the number that
    separates a business-hours batch producer from an always-on stream
    and sizes the idle-scale-down window).  One dense row per source
    ALWAYS; exact int64 under the quantile_disc rank rule
    (count(DISTINCT minute) per day + quantile_disc oracle).

    Scale shape — E117's bounded-domain settle then a day-bounded
    merge: per batch one packed np.unique to distinct (source, minute)
    cells; ONE (source, minute)-hash exchange dedupes each cell
    exactly (a minute lands in one partition), re-reducing IN PLACE to
    per-(source, day) minute-count partials — additive across
    partitions because cells are globally distinct; the k=1 merge
    settles the ≤ sources × days domain (calendar-bounded, never
    corpus-bounded) and reads the quantiles off one cumsum per source.
    Reference parity: the consumer's idle/backoff loop
    (`internal/consumer/rmq.go` reconnect cadence) sized from data."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        minute = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // MIN_US
        )
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        packed = np.unique(code * (1 << 40) + minute)
        return pa.table({"sm": pa.array(packed.astype(np.int64))})

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"sd": pa.array([], pa.int64()), "am": pa.array([], pa.int64())}
            )
        sm = np.unique(
            t["sm"].combine_chunks().to_numpy(zero_copy_only=False)
        )
        src = sm >> 40
        day = (sm & ((1 << 40) - 1)) // 1440
        sd = src * (1 << 32) + day
        vals, cnt = np.unique(sd, return_counts=True)
        return pa.table(
            {
                "sd": pa.array(vals.astype(np.int64)),
                "am": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        n_days = np.zeros(ns, np.int64)
        p50 = np.zeros(ns, np.int64)
        p90 = np.zeros(ns, np.int64)
        mx = np.zeros(ns, np.int64)
        if t.num_rows:
            g = t.group_by("sd", use_threads=False).aggregate(
                [("am", "sum")]
            )
            sd = g["sd"].combine_chunks().to_numpy(zero_copy_only=False)
            am = g["am_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            src = sd >> 32
            order = np.lexsort((am, src))
            src, am = src[order], am[order]
            for si in np.unique(src):
                m = src == si
                av = am[m]
                n_days[si] = len(av)
                for arr, q in ((p50, 500), (p90, 900)):
                    thr = (len(av) * q + 999) // 1000
                    arr[si] = int(av[thr - 1])
                mx[si] = int(av[-1])
        return pa.table(
            {
                "source": srcs,
                "n_days": pa.array(n_days),
                "p50": pa.array(p50),
                "p90": pa.array(p90),
                "max_minutes": pa.array(mx),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "sm", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "sd", merge, k=1)


def events_audience_clock(sf_dir: str) -> Dataset:
    """E122: audience clock board — per (source, hour-of-day 0..23):
    events and DISTINCT users — when the audience is broad vs when the
    same few accounts keep the lights on (E35 profiles event VOLUME by
    clock position, E110 each user's single modal hour; E122 is the
    audience-breadth clock — a source whose overnight hours keep full
    volume but collapse to a handful of users is automation, and the
    events/users ratio per cell is the load-vs-reach read a capacity
    planner keys regional rollouts off).  One dense row per (source,
    hour) ALWAYS (24 × sources); exact int64 (distinct (source, hour,
    user) + two-level GROUP BY + densify oracle).

    Scale shape — E38's aggregate-of-aggregates on the clock axis: per
    batch one packed np.unique reduces events to distinct (user,
    source, hour) presence cells WITH an event count riding; ONE
    user-hash exchange dedupes presence exactly (all of a user's cells
    co-locate), re-reducing IN PLACE to ≤ sources × 24 partials per
    partition; k=1 densifying merge.  No user id list lands on one
    node.  Reference parity: per-consumer delivery counters
    (`internal/metrics/metrics.go`) cut by clock hour."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)
    HOUR_US = 3_600_000_000

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        hod = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // HOUR_US
            % 24
        )
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        u = (
            pc.cast(b["user_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        # (user, source, hour) cell with its in-batch event count
        packed = u * (ns * 24) + code * 24 + hod
        vals, cnt = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "u": pa.array((vals // (ns * 24)).astype(np.int64)),
                "sh": pa.array((vals % (ns * 24)).astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "sh": pa.array([], pa.int64()),
                    "ne": pa.array([], pa.int64()),
                    "nu": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["u", "sh"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        sh = g["sh"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        ne = np.zeros(ns * 24, np.int64)
        nu = np.zeros(ns * 24, np.int64)
        np.add.at(ne, sh, n)
        np.add.at(nu, sh, 1)
        live = np.flatnonzero(nu)
        return pa.table(
            {
                "sh": pa.array(live.astype(np.int64)),
                "ne": pa.array(ne[live]),
                "nu": pa.array(nu[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        ne = np.zeros(ns * 24, np.int64)
        nu = np.zeros(ns * 24, np.int64)
        if t.num_rows:
            sh = t["sh"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                ne, sh,
                t["ne"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                nu, sh,
                t["nu"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        return pa.table(
            {
                "source": srcs.take(
                    pa.array(np.repeat(np.arange(ns), 24).astype(np.int64))
                ),
                "hour": pa.array(np.tile(np.arange(24, dtype=np.int64), ns)),
                "n_events": pa.array(ne),
                "n_users": pa.array(nu),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "u", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "sh", merge, k=1)


def events_band_interarrival(sf_dir: str) -> Dataset:
    """E123: inter-arrival quantiles BY USER-ACTIVITY BAND — for each
    band b = floor(log2(user's lifetime event count)): users in the
    band, consecutive-event gaps inside those users' own streams (ts,
    event_id order, all types mixed), and discrete p50/p90 of the
    floor-second gap — the "are the heavy users human" read (E81 gives
    the per-source pulse, E36 the activity histogram; E123 crosses
    them: organic heavy users keep human-scale gaps, a band whose p50
    collapses to near-zero regular intervals is automation — the
    same split a rate-limit whitelist review makes).  Band extraction
    is exact (numpy frexp exponent == length(bin(n))−1 — no
    floating log2 on either side).  One row per observed band; exact
    int64 under the quantile_disc rank rule (window lag + bin-length
    band + quantile_disc oracle).

    Scale shape — the sessionize partitioning reused for a gap
    histogram: ONE user-hash exchange co-locates each user's whole
    stream (narrow (user, ts, id) int64 rows — the E114 convention:
    ship ids, never payloads), so the user's count, band and every gap
    are decided locally with one lexsort; rows re-reduce IN PLACE to
    (band, floor-sec gap) histogram partials plus per-band user
    counts; the k=1 merge reads quantiles off one cumsum per band.
    Reference parity: per-consumer delivery pacing
    (`internal/consumer/rmq.go` prefetch/QoS) audited per client
    weight class."""
    from ..stages.shuffle import hash_partition_merge

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": pc.cast(b["user_id"], pa.int64()),
                "t": b["ts"].cast(pa.int64()),
                "i": pc.cast(b["event_id"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "bg": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "kind": pa.array([], pa.int64()),
                }
            )
        u = t["u"].combine_chunks().to_numpy(zero_copy_only=False)
        ts_ = t["t"].combine_chunks().to_numpy(zero_copy_only=False)
        ei = t["i"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ei, ts_, u))
        u, ts_ = u[order], ts_[order]
        first = np.ones(len(u), bool)
        first[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(first)
        cnt = np.diff(np.r_[starts, len(u)]).astype(np.int64)
        band = (np.frexp(cnt.astype(np.float64))[1] - 1).astype(np.int64)
        ub, un = np.unique(band, return_counts=True)
        same = ~first[1:]
        gaps = (ts_[1:] - ts_[:-1])[same] // 1_000_000
        gid = (np.cumsum(first) - 1)[1:][same]
        bg = band[gid] * (1 << 40) + gaps
        gv, gn = np.unique(bg, return_counts=True)
        return pa.table(
            {
                "bg": pa.array(
                    np.r_[gv, ub].astype(np.int64)
                ),
                "n": pa.array(
                    np.r_[gn, un].astype(np.int64)
                ),
                "kind": pa.array(
                    np.r_[
                        np.zeros(len(gv), np.int64),
                        np.ones(len(ub), np.int64),
                    ]
                ),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "band": pa.array([0], pa.int64()),
                    "n_users": pa.array([0], pa.int64()),
                    "n_gaps": pa.array([0], pa.int64()),
                    "p50_s": pa.array([0], pa.int64()),
                    "p90_s": pa.array([0], pa.int64()),
                }
            )
        g = t.group_by(["bg", "kind"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        bg = g["bg"].combine_chunks().to_numpy(zero_copy_only=False)
        kind = g["kind"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        users = {}
        for b, c in zip(bg[kind == 1], n[kind == 1]):
            users[int(b)] = users.get(int(b), 0) + int(c)
        gb = bg[kind == 0]
        gn = n[kind == 0]
        order = np.argsort(gb, kind="stable")
        gb, gn = gb[order], gn[order]
        band = gb >> 40
        gap = gb & ((1 << 40) - 1)
        bands = sorted(users)
        out = {
            "band": [], "n_users": [], "n_gaps": [],
            "p50_s": [], "p90_s": [],
        }
        for bnd in bands:
            m = band == bnd
            gv, nv = gap[m], gn[m]
            out["band"].append(bnd)
            out["n_users"].append(users[bnd])
            if len(gv):
                cum = np.cumsum(nv)
                total = int(cum[-1])
                out["n_gaps"].append(total)
                for key, q in (("p50_s", 500), ("p90_s", 900)):
                    thr = (total * q + 999) // 1000
                    out[key].append(
                        int(gv[np.searchsorted(cum, thr, side="left")])
                    )
            else:
                out["n_gaps"].append(0)
                out["p50_s"].append(0)
                out["p90_s"].append(0)
        return pa.table(
            {k: pa.array(np.array(v, np.int64)) for k, v in out.items()}
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "u", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "bg", merge, k=1)


def events_exclusive_audience(sf_dir: str) -> Dataset:
    """E124: exclusive-audience board — per source: active users,
    users active in ONLY this source, and the exclusive permille — the
    audience-ownership read (E64's overlap board counts every PAIR's
    shared users; E124 answers the portfolio question that pairwise
    overlap can't: how much of a source's audience exists nowhere
    else — the churn exposure if this one surface is retired, T118's
    presence-based exclusivity rule on the user axis).  One dense row
    per source ALWAYS; exact int64 (per-user distinct-type count +
    conditional re-aggregation oracle).

    Scale shape — E38's aggregate-of-aggregates with a breadth test:
    per batch one packed np.unique reduces events to distinct (user,
    source) presence cells; ONE user-hash exchange makes each user's
    source set exact (all cells co-locate), so breadth==1 decides
    exclusivity locally and rows re-reduce IN PLACE to per-source
    (users, exclusive) partials; k=1 densifying merge.  No user list
    lands on one node."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        u = (
            pc.cast(b["user_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        packed = np.unique(u * ns + code)
        return pa.table(
            {
                "u": pa.array((packed // ns).astype(np.int64)),
                "s0": pa.array((packed % ns).astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "s": pa.array([], pa.int64()),
                    "nu": pa.array([], pa.int64()),
                    "nx": pa.array([], pa.int64()),
                }
            )
        uu_ = t["u"].combine_chunks().to_numpy(zero_copy_only=False)
        ss_ = t["s0"].combine_chunks().to_numpy(zero_copy_only=False)
        us = np.unique(uu_ * ns + ss_)
        u = us // ns
        s = us % ns
        # each user's full source set is local (user-hash routing)
        uu, inv, breadth = np.unique(
            u, return_inverse=True, return_counts=True
        )
        nu = np.zeros(ns, np.int64)
        nx = np.zeros(ns, np.int64)
        np.add.at(nu, s, 1)
        np.add.at(nx, s, (breadth[inv] == 1).astype(np.int64))
        live = np.flatnonzero(nu)
        return pa.table(
            {
                "s": pa.array(live.astype(np.int64)),
                "nu": pa.array(nu[live]),
                "nx": pa.array(nx[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nu = np.zeros(ns, np.int64)
        nx = np.zeros(ns, np.int64)
        if t.num_rows:
            s = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                nu, s,
                t["nu"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                nx, s,
                t["nx"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        return pa.table(
            {
                "source": srcs,
                "n_users": pa.array(nu),
                "n_exclusive": pa.array(nx),
                "exclusive_permille": pa.array(
                    1000 * nx // np.maximum(nu, 1)
                ),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "u", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "s", merge, k=1)


def events_peak_hour_stability(sf_dir: str) -> Dataset:
    """E125: peak-hour stability board — per source: active days,
    DISTINCT daily peak hours (each day's modal hour-of-day, ties →
    smallest hour), and the discrete p50 of the daily peak hour — is
    the rush hour a fixed appointment or a moving target (E47 names
    each hour's hottest minute, E101 who leads each day; E125 whether
    a SOURCE's daily load peak is schedulable — 1-2 distinct peaks =
    put the batch window after it, many = autoscale instead).  One
    dense row per source ALWAYS; exact int64 under the quantile_disc
    rank rule (per-(source, day, hour) GROUP BY + row_number argmax +
    count(DISTINCT)/quantile_disc oracle).

    Scale shape — argmax-per-day is a reduction over a bounded cell
    domain: per batch one packed np.unique to (source, day, hour, n)
    partials; ONE (source, day)-hash exchange settles each day's
    24-hour histogram whole, where one lexsort picks the day's peak
    hour and rows re-reduce IN PLACE to (source, peak-hour) histogram
    partials (≤ sources × 24); the k=1 merge ORs distinct peaks and
    reads the p50 off one cumsum per source."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)
    HOUR_US = 3_600_000_000

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        h = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // HOUR_US
        )
        day = h // 24
        hod = h % 24
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        packed = (code * (1 << 32) + day) * 32 + hod
        vals, cnt = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "sd": pa.array((vals // 32).astype(np.int64)),
                "h": pa.array((vals % 32).astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"sp": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        g = t.group_by(["sd", "h"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        sd = g["sd"].combine_chunks().to_numpy(zero_copy_only=False)
        h = g["h"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((h, -n, sd))
        sd_o = sd[order]
        first = np.ones(len(sd_o), bool)
        first[1:] = sd_o[1:] != sd_o[:-1]
        sel = order[first]
        src = sd[sel] >> 32
        peak = h[sel]
        sp = src * 32 + peak
        vals, cnt = np.unique(sp, return_counts=True)
        return pa.table(
            {
                "sp": pa.array(vals.astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        n_days = np.zeros(ns, np.int64)
        n_peaks = np.zeros(ns, np.int64)
        p50 = np.zeros(ns, np.int64)
        if t.num_rows:
            g = t.group_by("sp", use_threads=False).aggregate(
                [("n", "sum")]
            )
            sp = g["sp"].combine_chunks().to_numpy(zero_copy_only=False)
            n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
            order = np.argsort(sp, kind="stable")
            sp, n = sp[order], n[order]
            src = sp // 32
            hr = sp % 32
            for si in np.unique(src):
                m = src == si
                hv, nv = hr[m], n[m]
                cum = np.cumsum(nv)
                total = int(cum[-1])
                n_days[si] = total
                n_peaks[si] = len(hv)
                thr = (total * 500 + 999) // 1000
                p50[si] = int(hv[np.searchsorted(cum, thr, side="left")])
        return pa.table(
            {
                "source": srcs,
                "n_days": pa.array(n_days),
                "n_distinct_peaks": pa.array(n_peaks),
                "p50_peak_hour": pa.array(p50),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "sd", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "sp", merge, k=1)


def events_daily_median_stability(sf_dir: str) -> Dataset:
    """E126: daily-median stability board — per source: active days and
    the discrete p50/min/max of the DAILY MEDIAN of floor(value) — is
    the stream's central tendency stationary day over day (E107 finds
    the hottest hour-of-week cell, E119 quantile bands of burst sizes;
    E126 whether the VALUE distribution's center drifts — min == max
    means a flat process safe to threshold statically, a wide
    min..max band marks regime shifts that need adaptive baselines).
    One dense row per source ALWAYS; exact int64 under the
    quantile_disc rank rule applied twice (per-(source, day)
    quantile_disc(floor(value), 0.5), then quantile_disc/min/max over
    the daily medians).

    Scale shape — a two-level quantile is NOT a holistic aggregate
    here because floor(value) makes each day's distribution a bounded
    integer histogram: per batch one Arrow group_by pre-reduces to
    (source·day, floor-value, n) cells; ONE (source, day)-hash
    exchange settles each day whole, where one lexsort + cumsum +
    vectorized searchsorted reads every day's median and re-reduces
    IN PLACE to (source, median-value, n-days) partials; the k=1
    merge repeats the same cumsum read over the ≤ sources × distinct
    medians domain (calendar-bounded, never corpus-bounded)."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)
    DAY_US = 86_400_000_000

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        day = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        fv = np.floor(
            b["value"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        t = pa.table(
            {
                "sd": pa.array(code * (1 << 32) + day),
                "v": pa.array(fv),
                "n": pa.array(np.ones(len(fv), np.int64)),
            }
        )
        g = t.group_by(["sd", "v"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return g.rename_columns(["sd", "v", "n"])

    def _group_quantile_reduce(
        key: np.ndarray, v: np.ndarray, n: np.ndarray
    ):
        """Sorted-run reduction: per distinct key over (value, count)
        histogram rows, return (keys, p50, min, max, total) — one
        lexsort, one cumsum, one vectorized searchsorted."""
        order = np.lexsort((v, key))
        key, v, n = key[order], v[order], n[order]
        first = np.ones(len(key), bool)
        first[1:] = key[1:] != key[:-1]
        starts = np.flatnonzero(first)
        ends = np.r_[starts[1:], len(key)]
        cum = np.cumsum(n)
        base = np.where(starts > 0, cum[starts - 1], 0)
        tot = cum[ends - 1] - base
        thr = (tot * 500 + 999) // 1000
        sel = np.searchsorted(cum, base + thr, side="left")
        return key[starts], v[sel], v[starts], v[ends - 1], tot

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "s": pa.array([], pa.int64()),
                    "med": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["sd", "v"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        sd = g["sd"].combine_chunks().to_numpy(zero_copy_only=False)
        v = g["v"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        keys, med, _, _, _ = _group_quantile_reduce(sd, v, n)
        t2 = pa.table(
            {
                "s": pa.array((keys >> 32).astype(np.int64)),
                "med": pa.array(med.astype(np.int64)),
                "n": pa.array(np.ones(len(keys), np.int64)),
            }
        )
        g2 = t2.group_by(["s", "med"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return g2.rename_columns(["s", "med", "n"])

    def merge(t: pa.Table) -> pa.Table:
        n_days = np.zeros(ns, np.int64)
        p50 = np.zeros(ns, np.int64)
        mn = np.zeros(ns, np.int64)
        mx = np.zeros(ns, np.int64)
        if t.num_rows:
            g = t.group_by(["s", "med"], use_threads=False).aggregate(
                [("n", "sum")]
            )
            s = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
            med = g["med"].combine_chunks().to_numpy(zero_copy_only=False)
            n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
            keys, p, lo, hi, tot = _group_quantile_reduce(s, med, n)
            n_days[keys] = tot
            p50[keys] = p
            mn[keys] = lo
            mx[keys] = hi
        return pa.table(
            {
                "source": srcs,
                "n_days": pa.array(n_days),
                "p50_daily_median": pa.array(p50),
                "min_daily_median": pa.array(mn),
                "max_daily_median": pa.array(mx),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "sd", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "s", merge, k=1)


def events_peak_share_quantiles(sf_dir: str) -> Dataset:
    """E127: within-hour peak-share quantiles — per source: hours with
    ≥1 event and the discrete p50/p90/max of each hour's PEAK-MINUTE
    SHARE (1000·busiest-minute count // hour total) — how spiky the
    load is INSIDE the provisioning window (E125 asks WHEN the daily
    peak lands, E119 bands burst sizes per user; E127 whether an
    hour's traffic is a drizzle or one cliff — p50 near 1000/60 ≈ 16
    is uniform drip, near 1000 means the whole hour arrives in one
    minute and per-minute admission control is mandatory).  One dense
    row per source ALWAYS; exact int64 under the quantile_disc rank
    rule (two-level GROUP BY + max/sum + integer permille +
    quantile_disc oracle).

    Scale shape — E121's bounded-domain settle with a ratio finish:
    per batch one packed np.unique to (source, minute, n) cells; ONE
    (source, hour)-hash exchange lands each hour's ≤60 minute cells
    whole, where one sort + reduceat reads every hour's max/total and
    re-reduces IN PLACE to (source, permille) histogram partials —
    the permille domain is [0, 1000] so the merge input is ≤ sources
    × 1001 rows regardless of corpus size; the k=1 merge reads
    p50/p90/max off one cumsum per source."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)
    MIN_US = 60_000_000

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        mi = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // MIN_US
        )
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        packed = code * (1 << 32) + mi
        vals, cnt = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "sm": pa.array(vals.astype(np.int64)),
                "sh": pa.array(
                    ((vals >> 32) * (1 << 32) + (vals & 0xFFFFFFFF) // 60)
                    .astype(np.int64)
                ),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "sp": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("sm", use_threads=False).aggregate([("n", "sum")])
        sm = g["sm"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        sh = (sm >> 32) * (1 << 32) + (sm & 0xFFFFFFFF) // 60
        order = np.argsort(sh, kind="stable")
        sh, n = sh[order], n[order]
        first = np.ones(len(sh), bool)
        first[1:] = sh[1:] != sh[:-1]
        starts = np.flatnonzero(first)
        tot = np.add.reduceat(n, starts)
        mx = np.maximum.reduceat(n, starts)
        pm = 1000 * mx // tot
        sp = (sh[starts] >> 32) * 1024 + pm
        vals, cnt = np.unique(sp, return_counts=True)
        return pa.table(
            {
                "sp": pa.array(vals.astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        n_hours = np.zeros(ns, np.int64)
        p50 = np.zeros(ns, np.int64)
        p90 = np.zeros(ns, np.int64)
        mx = np.zeros(ns, np.int64)
        if t.num_rows:
            g = t.group_by("sp", use_threads=False).aggregate(
                [("n", "sum")]
            )
            sp = g["sp"].combine_chunks().to_numpy(zero_copy_only=False)
            n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
            order = np.argsort(sp, kind="stable")
            sp, n = sp[order], n[order]
            src = sp // 1024
            pm = sp % 1024
            first = np.ones(len(sp), bool)
            first[1:] = src[1:] != src[:-1]
            starts = np.flatnonzero(first)
            ends = np.r_[starts[1:], len(sp)]
            cum = np.cumsum(n)
            base = np.where(starts > 0, cum[starts - 1], 0)
            tot = cum[ends - 1] - base
            keys = src[starts]
            n_hours[keys] = tot
            for dst, q in ((p50, 500), (p90, 900)):
                thr = (tot * q + 999) // 1000
                dst[keys] = pm[np.searchsorted(cum, base + thr, side="left")]
            mx[keys] = pm[ends - 1]
        return pa.table(
            {
                "source": srcs,
                "n_hours": pa.array(n_hours),
                "p50_peak_share": pa.array(p50),
                "p90_peak_share": pa.array(p90),
                "max_peak_share": pa.array(mx),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "sh", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "sp", merge, k=1)


def events_load_gini(sf_dir: str) -> Dataset:
    """E128: minute-load Gini board — per source: active minutes, total
    events, and the exact integer-permille Gini coefficient of the
    per-minute event counts — load inequality on the TIME axis (T45
    measures document-length inequality per source; E127 the
    peak-minute share within each hour; E128 condenses the whole
    stream's temporal concentration into one number: 0 = perfectly
    even drip, →1000 = everything in a few hot minutes, the signal
    that decides flat vs burst-tier provisioning).  One row per
    source ALWAYS; exact int64: with counts sorted ascending and
    1-based ranks, G = (2·Σᵢ i·xᵢ − (n+1)·Σx)/(n·Σx) — numerator and
    denominator are exact integers and rank permutations within tied
    counts leave Σ i·xᵢ unchanged, so 1000·num // den matches a
    DuckDB row_number oracle bit-for-bit.

    Scale shape — T45's mergeable-histogram rank fold applied to the
    minute grid: per batch one packed np.unique to (source, minute,
    n) cells; ONE (source, minute)-hash exchange settles each cell
    exactly and re-reduces IN PLACE to (source, count-value)
    histograms — bounded by distinct load levels, never by corpus;
    the k=1 merge folds histogram RUNS (a run of f minutes at load v
    after c earlier minutes contributes v·(f·c + f(f+1)/2)) in object
    dtype (Σ i·xᵢ grows as n²·x — int64 would overflow near 10⁹
    active minutes/source)."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)
    MIN_US = 60_000_000

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        mi = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // MIN_US
        )
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        packed = code * (1 << 32) + mi
        vals, cnt = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "sm": pa.array(vals.astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "s": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                    "f": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("sm", use_threads=False).aggregate([("n", "sum")])
        sm = g["sm"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        sc = (sm >> 32) * (1 << 32) + n  # (source, load) histogram key
        vals, cnt = np.unique(sc, return_counts=True)
        return pa.table(
            {
                "s": pa.array((vals >> 32).astype(np.int64)),
                "c": pa.array((vals & 0xFFFFFFFF).astype(np.int64)),
                "f": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        act = np.zeros(ns, np.int64)
        tot = np.zeros(ns, np.int64)
        gini = np.zeros(ns, np.int64)
        if t.num_rows:
            g = t.group_by(["s", "c"], use_threads=False).aggregate(
                [("f", "sum")]
            )
            s = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
            c = g["c"].combine_chunks().to_numpy(zero_copy_only=False)
            f = g["f_sum"].combine_chunks().to_numpy(zero_copy_only=False)
            order = np.lexsort((c, s))
            s, c, f = s[order], c[order], f[order]
            first = np.ones(len(s), bool)
            first[1:] = s[1:] != s[:-1]
            starts = np.flatnonzero(first)
            ends = np.r_[starts[1:], len(s)]
            for st, en in zip(starts, ends):
                si = int(s[st])
                nloc = 0
                sx = 0
                srx = 0
                for v, fr in zip(c[st:en].tolist(), f[st:en].tolist()):
                    srx += v * (fr * nloc + fr * (fr + 1) // 2)
                    nloc += fr
                    sx += v * fr
                act[si] = nloc
                tot[si] = sx
                gini[si] = (1000 * (2 * srx - (nloc + 1) * sx)) // (
                    nloc * sx
                )
        return pa.table(
            {
                "source": srcs,
                "active_minutes": pa.array(act),
                "n_events": pa.array(tot),
                "gini_permille": pa.array(gini),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "sm", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "s", merge, k=1)


def events_dormancy_quantiles(sf_dir: str) -> Dataset:
    """E129: user-dormancy quantiles — per source: users who ever
    touched it and the discrete p50/p90/max of each user's CURRENT
    dormancy (days since that user's LAST event on the source,
    measured against the corpus's global last day) — the churn-risk
    recency board (E34's tenure histogram measures lifetime SPAN,
    E102's return gaps the rhythm between visits; E129 how stale the
    audience is RIGHT NOW — a p50 dormancy near the retention window
    means the source's audience has already left, the number a
    re-engagement campaign is sized from).  One dense row per source
    ALWAYS; exact int64 under the quantile_disc rank rule (per-user
    max-day + global-max cross join + quantile_disc oracle).

    Scale shape — a MAX reduction then a calendar-bounded histogram:
    per batch one Arrow group_by to (source, user, max-day) partials;
    ONE user-hash exchange settles each (source, user) last-touch
    exactly, re-reducing IN PLACE to (source, last-day) histograms —
    bounded by sources × calendar days; the k=1 merge reads the
    global max day off the histogram itself (max of last-touches IS
    the corpus max) and the quantiles off one cumsum per source."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)
    DAY_US = 86_400_000_000

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        day = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        code = pc.cast(
            pc.index_in(b["event_type"], value_set=srcs), pa.int64()
        )
        t = pa.table(
            {
                "s": code,
                "u": pc.cast(b["user_id"], pa.int64()),
                "d": pa.array(day),
            }
        )
        g = t.group_by(["s", "u"], use_threads=False).aggregate(
            [("d", "max")]
        )
        return g.rename_columns(["s", "u", "d"])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"sd": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        g = t.group_by(["s", "u"], use_threads=False).aggregate(
            [("d", "max")]
        )
        s = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        d = g["d_max"].combine_chunks().to_numpy(zero_copy_only=False)
        vals, cnt = np.unique(s * (1 << 32) + d, return_counts=True)
        return pa.table(
            {
                "sd": pa.array(vals.astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        n_users = np.zeros(ns, np.int64)
        p50 = np.zeros(ns, np.int64)
        p90 = np.zeros(ns, np.int64)
        mx = np.zeros(ns, np.int64)
        if t.num_rows:
            g = t.group_by("sd", use_threads=False).aggregate(
                [("n", "sum")]
            )
            sd = g["sd"].combine_chunks().to_numpy(zero_copy_only=False)
            n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
            s = sd >> 32
            d = sd & 0xFFFFFFFF
            gmax = int(d.max())
            dorm = gmax - d
            order = np.lexsort((dorm, s))
            s, dorm, n = s[order], dorm[order], n[order]
            first = np.ones(len(s), bool)
            first[1:] = s[1:] != s[:-1]
            starts = np.flatnonzero(first)
            ends = np.r_[starts[1:], len(s)]
            cum = np.cumsum(n)
            base = np.where(starts > 0, cum[starts - 1], 0)
            tot = cum[ends - 1] - base
            keys = s[starts]
            n_users[keys] = tot
            for dst, q in ((p50, 500), (p90, 900)):
                thr = (tot * q + 999) // 1000
                dst[keys] = dorm[
                    np.searchsorted(cum, base + thr, side="left")
                ]
            mx[keys] = dorm[ends - 1]
        return pa.table(
            {
                "source": srcs,
                "n_users": pa.array(n_users),
                "p50_dormancy": pa.array(p50),
                "p90_dormancy": pa.array(p90),
                "max_dormancy": pa.array(mx),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "u", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "sd", merge, k=1)


def events_dau_quantiles(sf_dir: str) -> Dataset:
    """E130: daily-active-user quantiles — per source: days with ≥1
    event and the discrete p50/p90/max of DAILY DISTINCT USERS — the
    audience-size distribution (E55's dau_wau_mau draws the global
    curve day by day; E121 counts active MINUTES per day; E130
    condenses each source's audience into its typical-vs-peak band —
    a max_dau at 40× p50 is launch-day traffic the capacity plan must
    carry, a flat band is a subscription service).  One dense row per
    source ALWAYS; exact int64 under the quantile_disc rank rule
    (DISTINCT (source, user, day) + per-day count + quantile_disc
    oracle).

    Scale shape — E121's dedupe-then-bounded-histogram with users as
    the dedup axis: per batch one Arrow group_by to distinct (source,
    user, day) cells; ONE user-hash exchange dedupes each cell
    exactly (a user's rows co-locate), re-reducing IN PLACE to
    (source, day) count partials — additive across partitions because
    cells are globally distinct; the k=1 merge settles the ≤ sources
    × days domain and reads the quantiles off one cumsum per
    source."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)
    DAY_US = 86_400_000_000

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        day = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        code = pc.cast(
            pc.index_in(b["event_type"], value_set=srcs), pa.int64()
        )
        t = pa.table(
            {
                "s": code,
                "u": pc.cast(b["user_id"], pa.int64()),
                "d": pa.array(day),
            }
        )
        return t.group_by(["s", "u", "d"], use_threads=False).aggregate([])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"sd": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        g = t.group_by(["s", "u", "d"], use_threads=False).aggregate([])
        s = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        d = g["d"].combine_chunks().to_numpy(zero_copy_only=False)
        vals, cnt = np.unique(s * (1 << 32) + d, return_counts=True)
        return pa.table(
            {
                "sd": pa.array(vals.astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        n_days = np.zeros(ns, np.int64)
        p50 = np.zeros(ns, np.int64)
        p90 = np.zeros(ns, np.int64)
        mx = np.zeros(ns, np.int64)
        if t.num_rows:
            g = t.group_by("sd", use_threads=False).aggregate(
                [("n", "sum")]
            )
            sd = g["sd"].combine_chunks().to_numpy(zero_copy_only=False)
            dau = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
            s = sd >> 32
            vals, cnt = np.unique(s * (1 << 32) + dau, return_counts=True)
            s = vals >> 32
            dau = vals & 0xFFFFFFFF
            first = np.ones(len(s), bool)
            first[1:] = s[1:] != s[:-1]
            starts = np.flatnonzero(first)
            ends = np.r_[starts[1:], len(s)]
            cum = np.cumsum(cnt)
            base = np.where(starts > 0, cum[starts - 1], 0)
            tot = cum[ends - 1] - base
            keys = s[starts]
            n_days[keys] = tot
            for dst, q in ((p50, 500), (p90, 900)):
                thr = (tot * q + 999) // 1000
                dst[keys] = dau[
                    np.searchsorted(cum, base + thr, side="left")
                ]
            mx[keys] = dau[ends - 1]
        return pa.table(
            {
                "source": srcs,
                "n_days": pa.array(n_days),
                "p50_dau": pa.array(p50),
                "p90_dau": pa.array(p90),
                "max_dau": pa.array(mx),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "u", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "sd", merge, k=1)


def events_midnight_sessions(sf_dir: str, gap_s: int = 6 * 3600) -> Dataset:
    """E131: midnight-crossing sessions by weekday — per ISO weekday of
    the session START: sessions, sessions whose span crosses a day
    boundary, and the crossing permille — the "runs past midnight"
    board (E15 builds the sessions, E88 their size histogram, E112
    splits load by weekpart; E131 asks WHICH weekday's usage bleeds
    into the next day — the signal that moves the daily maintenance
    window and decides what 'daily active' even means for this
    audience).  Dense over weekdays present; exact int64 (the E15
    session CTE + isodow + day-boundary compare oracle).

    Scale shape — a COMPOSITION over the sessionize stage (sessions
    are already (key, window)-partitioned, halo-corrected and
    corpus-narrow: one row per session): one stateless map_batches
    reduces each batch to ≤7 (weekday, n, crossing) cells, the k=1
    merge folds O(batches × 7) rows.  Nothing re-shuffles."""
    from ..stages.shuffle import hash_partition_merge

    sessions = events_sessions(sf_dir, gap_s=gap_s)
    DAY_US = 86_400_000_000

    def partial(b: pa.Table) -> pa.Table:
        s = (
            b["start_ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        e = (
            b["end_ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        dow = (s + 3) % 7 + 1
        cross = (e != s).astype(np.int64)
        n = np.zeros(8, np.int64)
        nc = np.zeros(8, np.int64)
        np.add.at(n, dow, 1)
        np.add.at(nc, dow, cross)
        live = np.flatnonzero(n)
        return pa.table(
            {
                "dow": pa.array(live.astype(np.int64)),
                "n": pa.array(n[live]),
                "nc": pa.array(nc[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        n = np.zeros(8, np.int64)
        nc = np.zeros(8, np.int64)
        if t.num_rows:
            d = t["dow"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                n, d, t["n"].combine_chunks().to_numpy(zero_copy_only=False)
            )
            np.add.at(
                nc, d,
                t["nc"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        live = np.flatnonzero(n)
        return pa.table(
            {
                "dow": pa.array(live.astype(np.int64)),
                "n_sessions": pa.array(n[live]),
                "n_crossing": pa.array(nc[live]),
                "crossing_permille": pa.array(
                    1000 * nc[live] // np.maximum(n[live], 1)
                ),
            }
        )

    partials = sessions.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "dow", merge, k=1)


def events_last_digit(sf_dir: str) -> Dataset:
    """E132: value last-digit audit — per (source, final digit of
    floor(value)): events and the integer permille of the source's
    volume — E120's Benford board reads the LEADING digit (magnitude
    fabrication); E132 reads the TRAILING digit, where ROUNDING and
    synthetic generators leave their print (a human-priced stream
    piles on 0/5/9, a sensor is uniform, a generator that rounds to
    dimes shows a 1000‰ spike at one digit — the audit that separates
    measured values from quantized ones).  One dense row per (source,
    digit 0-9) ALWAYS; exact int64 (modulo + window-total integer
    divide oracle).

    Scale shape — E120's bounded-cell settle verbatim: per batch one
    packed np.unique to (source, digit, n) cells over a ≤ sources ×
    10 domain; the k=1 merge settles source totals exactly and
    densifies.  ZERO wide exchange."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        d = (
            np.floor(
                b["value"].combine_chunks().to_numpy(zero_copy_only=False)
            ).astype(np.int64)
            % 10
        )
        vals, cnt = np.unique(code * 10 + d, return_counts=True)
        return pa.table(
            {
                "sd": pa.array(vals.astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        grid = np.zeros(ns * 10, np.int64)
        if t.num_rows:
            sd = t["sd"].combine_chunks().to_numpy(zero_copy_only=False)
            n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(grid, sd, n)
        tot = grid.reshape(ns, 10).sum(axis=1)
        src_idx = np.repeat(np.arange(ns), 10)
        return pa.table(
            {
                "source": srcs.take(pa.array(src_idx.astype(np.int64))),
                "digit": pa.array(
                    np.tile(np.arange(10, dtype=np.int64), ns)
                ),
                "n_events": pa.array(grid),
                "permille": pa.array(
                    1000 * grid // np.maximum(tot[src_idx], 1)
                ),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "sd", merge, k=1)


def events_peak_day(sf_dir: str) -> Dataset:
    """E133: peak-day concentration — per source: active days, total
    events, the permille of lifetime volume on its single BUSIEST day
    (ties → earliest day) and that day's ISO weekday — the
    launch-vs-steady-state classifier (E125 asks which HOUR of a day
    peaks, E128 scores minute-level inequality; E133 whether the
    source's whole HISTORY is one spike — top_share near 1000 is a
    backfill or launch dump whose day should be window-weighted or
    excluded from rate baselines).  One dense row per source ALWAYS;
    exact int64 (GROUP BY day + row_number over (count DESC, day ASC)
    + permille oracle).

    Scale shape — T131's argmax-reduction on the day axis: per batch
    one packed np.unique to (source, day, n) cells; ONE (source,
    day)-hash exchange settles each day exactly, each partition keeps
    its LOCAL best day per source plus (days, events) partials; the
    k=1 merge picks the best of O(partitions × sources) candidates."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)
    DAY_US = 86_400_000_000

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        day = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        vals, cnt = np.unique(code * (1 << 32) + day, return_counts=True)
        return pa.table(
            {
                "sd": pa.array(vals.astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ["s", "nd", "ne", "top_n", "top_d"]
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by("sd", use_threads=False).aggregate([("n", "sum")])
        sd = g["sd"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        s = sd >> 32
        d = sd & 0xFFFFFFFF
        nd = np.zeros(ns, np.int64)
        ne = np.zeros(ns, np.int64)
        np.add.at(nd, s, 1)
        np.add.at(ne, s, n)
        order = np.lexsort((d, -n, s))
        s_o = s[order]
        first = np.ones(len(s_o), bool)
        first[1:] = s_o[1:] != s_o[:-1]
        sel = order[first]
        live = s[sel]
        return pa.table(
            {
                "s": pa.array(live.astype(np.int64)),
                "nd": pa.array(nd[live]),
                "ne": pa.array(ne[live]),
                "top_n": pa.array(n[sel]),
                "top_d": pa.array(d[sel].astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nd = np.zeros(ns, np.int64)
        ne = np.zeros(ns, np.int64)
        top_n = np.zeros(ns, np.int64)
        top_d = np.full(ns, np.iinfo(np.int64).max)
        if t.num_rows:
            s = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                nd, s,
                t["nd"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                ne, s,
                t["ne"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            tn = t["top_n"].combine_chunks().to_numpy(zero_copy_only=False)
            td = t["top_d"].combine_chunks().to_numpy(zero_copy_only=False)
            for si, ni, di in zip(s, tn, td):
                if ni > top_n[si] or (
                    ni == top_n[si] and di < top_d[si]
                ):
                    top_n[si] = ni
                    top_d[si] = di
        top_dow = np.where(ne > 0, (top_d + 3) % 7 + 1, 0)
        return pa.table(
            {
                "source": srcs,
                "n_days": pa.array(nd),
                "n_events": pa.array(ne),
                "top_share": pa.array(
                    1000 * top_n // np.maximum(ne, 1)
                ),
                "top_dow": pa.array(top_dow.astype(np.int64)),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "sd", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "s", merge, k=1)


def events_tenure_quantiles(sf_dir: str) -> Dataset:
    """E134: per-source tenure quantiles — per source: users who ever
    touched it and the discrete p50/p90/max of each user's ACTIVE SPAN
    on the source (last day − first day + 1) — the stickiness band
    (E34's tenure histogram is corpus-global; E129 measures recency,
    E134 longevity PER SOURCE — a p50 span of 1 day is a drive-by
    audience whatever the DAU says, and the gap between p50 and max
    separates a core-plus-tourists mix from uniform churn).  One dense
    row per source ALWAYS; exact int64 under the quantile_disc rank
    rule (per-(source, user) min/max day + quantile_disc oracle).

    Scale shape — E129's settle with TWO riding reductions: per batch
    one Arrow group_by to (source, user, min-day, max-day) partials;
    ONE user-hash exchange settles both ends of each (source, user)
    span exactly, re-reducing IN PLACE to (source, span-days)
    histograms — bounded by the calendar, never the corpus; k=1 merge
    reads the quantiles off one cumsum per source."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)
    DAY_US = 86_400_000_000

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        day = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        code = pc.cast(
            pc.index_in(b["event_type"], value_set=srcs), pa.int64()
        )
        t = pa.table(
            {
                "s": code,
                "u": pc.cast(b["user_id"], pa.int64()),
                "lo": pa.array(day),
                "hi": pa.array(day),
            }
        )
        g = t.group_by(["s", "u"], use_threads=False).aggregate(
            [("lo", "min"), ("hi", "max")]
        )
        return g.rename_columns(["s", "u", "lo", "hi"])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"sp": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        g = t.group_by(["s", "u"], use_threads=False).aggregate(
            [("lo", "min"), ("hi", "max")]
        )
        s = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        lo = g["lo_min"].combine_chunks().to_numpy(zero_copy_only=False)
        hi = g["hi_max"].combine_chunks().to_numpy(zero_copy_only=False)
        span = hi - lo + 1
        vals, cnt = np.unique(s * (1 << 32) + span, return_counts=True)
        return pa.table(
            {
                "sp": pa.array(vals.astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        n_users = np.zeros(ns, np.int64)
        p50 = np.zeros(ns, np.int64)
        p90 = np.zeros(ns, np.int64)
        mx = np.zeros(ns, np.int64)
        if t.num_rows:
            g = t.group_by("sp", use_threads=False).aggregate(
                [("n", "sum")]
            )
            sp = g["sp"].combine_chunks().to_numpy(zero_copy_only=False)
            n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
            order = np.argsort(sp, kind="stable")
            sp, n = sp[order], n[order]
            s = sp >> 32
            span = sp & 0xFFFFFFFF
            first = np.ones(len(sp), bool)
            first[1:] = s[1:] != s[:-1]
            starts = np.flatnonzero(first)
            ends = np.r_[starts[1:], len(sp)]
            cum = np.cumsum(n)
            base = np.where(starts > 0, cum[starts - 1], 0)
            tot = cum[ends - 1] - base
            keys = s[starts]
            n_users[keys] = tot
            for dst, q in ((p50, 500), (p90, 900)):
                thr = (tot * q + 999) // 1000
                dst[keys] = span[
                    np.searchsorted(cum, base + thr, side="left")
                ]
            mx[keys] = span[ends - 1]
        return pa.table(
            {
                "source": srcs,
                "n_users": pa.array(n_users),
                "p50_span": pa.array(p50),
                "p90_span": pa.array(p90),
                "max_span": pa.array(mx),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "u", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "sp", merge, k=1)


def events_ts_quantization(sf_dir: str) -> Dataset:
    """E135: timestamp-quantization audit — per source: events,
    timestamps landing exactly on a whole SECOND, on a whole MINUTE,
    and both as permilles — the producer-fingerprint audit (E132
    reads rounding in VALUES; E135 reads it in TIME: a stream whose
    timestamps are all whole minutes is a batch job wearing a
    streaming costume — its 'interarrival' statistics, gap alerts and
    rate baselines (E119, E111, E124) mean something entirely
    different and E135 is the flag that says so).  One dense row per
    source ALWAYS; exact int64 (epoch_us modulo oracle).

    Scale shape — a pure per-row audit: two vectorized modulos per
    batch, np.add.at to dense per-source partials; k=1 merge of
    O(batches × sources) rows.  ZERO data shuffles; two columns
    leave the read."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)
    SEC_US = 1_000_000
    MIN_US = 60_000_000

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        t = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
        )
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        n = np.zeros(ns, np.int64)
        nsec = np.zeros(ns, np.int64)
        nmin = np.zeros(ns, np.int64)
        np.add.at(n, code, 1)
        np.add.at(nsec, code, (t % SEC_US == 0).astype(np.int64))
        np.add.at(nmin, code, (t % MIN_US == 0).astype(np.int64))
        return pa.table(
            {
                "s": pa.array(np.arange(ns, dtype=np.int64)),
                "n": pa.array(n),
                "nsec": pa.array(nsec),
                "nmin": pa.array(nmin),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        n = np.zeros(ns, np.int64)
        nsec = np.zeros(ns, np.int64)
        nmin = np.zeros(ns, np.int64)
        if t.num_rows:
            s = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
            for dst, col in ((n, "n"), (nsec, "nsec"), (nmin, "nmin")):
                np.add.at(
                    dst, s,
                    t[col].combine_chunks().to_numpy(zero_copy_only=False),
                )
        return pa.table(
            {
                "source": srcs,
                "n_events": pa.array(n),
                "n_whole_second": pa.array(nsec),
                "n_whole_minute": pa.array(nmin),
                "second_permille": pa.array(
                    1000 * nsec // np.maximum(n, 1)
                ),
                "minute_permille": pa.array(
                    1000 * nmin // np.maximum(n, 1)
                ),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "s", merge, k=1)


def events_load_pareto(sf_dir: str) -> Dataset:
    """E136: load-Pareto coverage — per source: active minutes, total
    events, and the NUMBER OF MINUTES (taking the busiest first) that
    carry 50% and 90% of lifetime volume — the time-axis Pareto (E59's
    pareto ranks USERS by volume, E128's Gini scores minute inequality
    abstractly; E136 gives the actionable count: 'm50 = 3' means half
    the traffic fits in three minutes of capacity planning, the number
    a pre-scaling schedule is built from).  One dense row per source
    ALWAYS; exact int64 (desc-ordered window cumsum + ceil-threshold
    oracle — tie-invariant because tied loads are equal).

    Scale shape — E128's (source, load-level) histogram with a
    descending fold: per batch one packed np.unique to (source,
    minute, n) cells; ONE (source, minute)-hash exchange settles each
    cell and re-reduces IN PLACE to (source, load) histograms —
    bounded by distinct load levels; the k=1 merge walks each
    source's histogram ONCE in descending load order (cumsum +
    searchsorted per threshold) — no per-minute work anywhere."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)
    MIN_US = 60_000_000

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        mi = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // MIN_US
        )
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        vals, cnt = np.unique(code * (1 << 32) + mi, return_counts=True)
        return pa.table(
            {
                "sm": pa.array(vals.astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "s": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                    "f": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("sm", use_threads=False).aggregate([("n", "sum")])
        sm = g["sm"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        sc = (sm >> 32) * (1 << 32) + n
        vals, cnt = np.unique(sc, return_counts=True)
        return pa.table(
            {
                "s": pa.array((vals >> 32).astype(np.int64)),
                "c": pa.array((vals & 0xFFFFFFFF).astype(np.int64)),
                "f": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        act = np.zeros(ns, np.int64)
        tot = np.zeros(ns, np.int64)
        m50 = np.zeros(ns, np.int64)
        m90 = np.zeros(ns, np.int64)
        if t.num_rows:
            g = t.group_by(["s", "c"], use_threads=False).aggregate(
                [("f", "sum")]
            )
            s = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
            c = g["c"].combine_chunks().to_numpy(zero_copy_only=False)
            f = g["f_sum"].combine_chunks().to_numpy(zero_copy_only=False)
            order = np.lexsort((-c, s))  # per source, descending load
            s, c, f = s[order], c[order], f[order]
            first = np.ones(len(s), bool)
            first[1:] = s[1:] != s[:-1]
            starts = np.flatnonzero(first)
            ends = np.r_[starts[1:], len(s)]
            wcum = np.cumsum(c * f)  # events covered
            mcum = np.cumsum(f)  # minutes used
            for st, en in zip(starts, ends):
                si = int(s[st])
                basew = wcum[st - 1] if st > 0 else 0
                basem = mcum[st - 1] if st > 0 else 0
                total = int(wcum[en - 1] - basew)
                act[si] = int(mcum[en - 1] - basem)
                tot[si] = total
                for dst, q in ((m50, 500), (m90, 900)):
                    thr = (total * q + 999) // 1000
                    # first run index where covered events >= thr
                    j = st + np.searchsorted(
                        wcum[st:en] - basew, thr, side="left"
                    )
                    # minutes from full runs before j, plus the partial
                    # run j: ceil((thr - covered_before) / load_j)
                    before_w = int(wcum[j - 1] - basew) if j > st else 0
                    before_m = int(mcum[j - 1] - basem) if j > st else 0
                    need = thr - before_w
                    dst[si] = before_m + (need + int(c[j]) - 1) // int(
                        c[j]
                    )
        return pa.table(
            {
                "source": srcs,
                "active_minutes": pa.array(act),
                "n_events": pa.array(tot),
                "m50": pa.array(m50),
                "m90": pa.array(m90),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "sm", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "s", merge, k=1)


def events_cron_signature(sf_dir: str) -> Dataset:
    """E137: cron-signature audit — per source: events, the MODAL
    minute-of-hour (0-59, ties → smallest) and its permille share —
    the scheduled-job detector (E135 reads sub-minute quantization,
    E47 names each hour's hottest minute in absolute time; E137 folds
    the clock: a share far above 1000/60 ≈ 16 means the producer
    fires on a cron line, so its 'organic traffic' baselines, anomaly
    scores and interarrival stats describe a scheduler, not users).
    One dense row per source ALWAYS; exact int64 (minute-of-hour
    GROUP BY + row_number argmax oracle).

    Scale shape — E120's bounded-cell settle with an argmax finish:
    per batch one packed np.unique to (source, minute-of-hour, n)
    cells over a ≤ sources × 60 domain; the k=1 merge settles the
    grid and picks each source's modal minute.  ZERO wide
    exchange."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)
    MIN_US = 60_000_000

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        moh = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // MIN_US
            % 60
        )
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        vals, cnt = np.unique(code * 60 + moh, return_counts=True)
        return pa.table(
            {
                "sm": pa.array(vals.astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        grid = np.zeros(ns * 60, np.int64)
        if t.num_rows:
            sm = t["sm"].combine_chunks().to_numpy(zero_copy_only=False)
            n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(grid, sm, n)
        grid = grid.reshape(ns, 60)
        tot = grid.sum(axis=1)
        top = grid.argmax(axis=1)  # argmax takes the FIRST max: ties →
        # smallest minute, matching the oracle's (n DESC, minute ASC)
        top_n = grid[np.arange(ns), top]
        return pa.table(
            {
                "source": srcs,
                "n_events": pa.array(tot),
                "top_minute": pa.array(top.astype(np.int64)),
                "top_permille": pa.array(
                    1000 * top_n // np.maximum(tot, 1)
                ),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "sm", merge, k=1)


def events_audience_trend(sf_dir: str) -> Dataset:
    """E138: audience-trend sufficient statistics — per source: active
    days and the exact integer sufficient stats (Σx, Σy, Σxy, Σx²) of
    y = daily distinct users against x = day index from the source's
    FIRST active day — "is the audience growing?" answered the R44
    way: exact sums, slope/R² derived downstream to any precision
    (E99's trend board regresses VOLUME per minute; E130 bands the
    DAU distribution; E138 regresses the AUDIENCE itself — the
    retention-adjusted growth number a weekly review plots).  One
    dense row per source ALWAYS; exact int64 (DISTINCT (source, user,
    day) + per-day count + min-day window oracle).

    Scale shape — E130's dedupe exchange with a moment finish: per
    batch one Arrow group_by to distinct (source, user, day) cells;
    ONE user-hash exchange dedupes cells exactly, re-reducing IN
    PLACE to (source, day) DAU partials; the k=1 merge settles the
    ≤ sources × days domain, anchors x at each source's min day and
    folds four moments per source."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)
    DAY_US = 86_400_000_000

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        day = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        code = pc.cast(
            pc.index_in(b["event_type"], value_set=srcs), pa.int64()
        )
        t = pa.table(
            {
                "s": code,
                "u": pc.cast(b["user_id"], pa.int64()),
                "d": pa.array(day),
            }
        )
        return t.group_by(["s", "u", "d"], use_threads=False).aggregate([])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"sd": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        g = t.group_by(["s", "u", "d"], use_threads=False).aggregate([])
        s = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        d = g["d"].combine_chunks().to_numpy(zero_copy_only=False)
        vals, cnt = np.unique(s * (1 << 32) + d, return_counts=True)
        return pa.table(
            {
                "sd": pa.array(vals.astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = np.zeros((ns, 5), np.int64)
        if t.num_rows:
            g = t.group_by("sd", use_threads=False).aggregate(
                [("n", "sum")]
            )
            sd = g["sd"].combine_chunks().to_numpy(zero_copy_only=False)
            y = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
            s = sd >> 32
            d = sd & 0xFFFFFFFF
            d0 = np.full(ns, np.iinfo(np.int64).max)
            np.minimum.at(d0, s, d)
            x = d - d0[s]
            np.add.at(out[:, 0], s, 1)
            np.add.at(out[:, 1], s, x)
            np.add.at(out[:, 2], s, y)
            np.add.at(out[:, 3], s, x * y)
            np.add.at(out[:, 4], s, x * x)
        return pa.table(
            {
                "source": srcs,
                "n_days": pa.array(out[:, 0]),
                "sum_x": pa.array(out[:, 1]),
                "sum_y": pa.array(out[:, 2]),
                "sum_xy": pa.array(out[:, 3]),
                "sum_x2": pa.array(out[:, 4]),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "u", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "sd", merge, k=1)


def events_sample_audit(sf_dir: str) -> Dataset:
    """E139: sampling-error audit — per source: full event count, the
    count inside the deterministic 1/64 user slice (user_id % 64 == 0),
    the 64×-scaled estimate, and its absolute permille error vs truth —
    the calibration board that says whether dashboards and ad-hoc
    analytics can run on a fixed user-hash sample instead of the full
    stream (the T23 mixture-sampling idea turned into a QA measurement:
    a source whose users are few or skewed shows a fat error here, and
    THAT is the number that green-lights sampling, not the 1/64 prior).
    One dense row per source ALWAYS; exact int64 (FILTER + scaled-diff
    oracle).

    Scale shape — ZERO wide exchange: the slice test is one vectorized
    modulo per batch, both counters reduce via np.add.at over the
    broadcast source-rank grid (≤ sources cells); the k=1 merge scales
    and differences.  At 100 TB this is the cheapest possible full
    pass: two int64 counters per source per batch."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        u = (
            pc.cast(b["user_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        nf = np.zeros(ns, np.int64)
        nsmp = np.zeros(ns, np.int64)
        np.add.at(nf, code, 1)
        np.add.at(nsmp, code[u % 64 == 0], 1)
        return pa.table(
            {
                "s": pa.array(np.arange(ns, dtype=np.int64)),
                "nf": pa.array(nf),
                "nsmp": pa.array(nsmp),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nf = np.zeros(ns, np.int64)
        nsmp = np.zeros(ns, np.int64)
        if t.num_rows:
            s = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                nf, s,
                t["nf"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                nsmp, s,
                t["nsmp"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        est = 64 * nsmp
        err = np.abs(est - nf) * 1000 // np.maximum(nf, 1)
        return pa.table(
            {
                "source": srcs,
                "n_full": pa.array(nf),
                "n_sample": pa.array(nsmp),
                "est_64x": pa.array(est),
                "err_permille": pa.array(err),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "s", merge, k=1)


def events_stuck_values(
    sf_dir: str, window_us: int = TEMPORAL_WINDOW_US
) -> Dataset:
    """E140: stuck-value detector — per source: consecutive-event pairs
    (in (ts, event_id) order), pairs whose metric value is EXACTLY equal
    to its predecessor, and the stuck permille — the frozen-sensor /
    cached-producer audit of a monitoring stack (E32 detects SILENCE,
    E116 constant COUNTS on the grid; E140 reads the payload itself — a
    gauge repeating one float verbatim is a stuck sensor or a caching
    bug upstream, and its anomaly scores are describing the cache).
    One dense row per source ALWAYS; exact int64 (float equality is
    exact — both engines compare the same float64s; lag-window oracle).

    Scale shape — E32's carried-prefix scan with the VALUE riding the
    carry channel as its float64 BIT PATTERN (view, not cast — the
    int64 carry column round-trips the float exactly): rows partition
    by (source, ts-window), :func:`_last_event_carries` hands each
    window its predecessor, so no source's full history lands in one
    task; per-partition one lexsort + one shifted compare; (pairs,
    equal) partials fold in one tiny source merge."""
    from ..stages.shuffle import hash_partition_merge, shuffle_parts
    from ..stages.temporal import _kw_partition

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def narrow(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        vbits = (
            b["value"].cast(pa.float64()).combine_chunks()
            .to_numpy(zero_copy_only=False)
            .view(np.int64)
        )
        return pa.table(
            {
                "k": pc.cast(
                    pc.index_in(b["event_type"], value_set=srcs), pa.int64()
                ),
                "t": pa.array(ts_us, pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
                "v": pa.array(vbits),
                "carry": pa.array(np.zeros(b.num_rows, dtype=bool)),
                "w": pa.array(ts_us // window_us, pa.int64()),
            }
        )

    tagged = ds.map_batches(narrow, batch_format="pyarrow")
    carries = _last_event_carries(tagged)
    full = tagged.union(
        carries.map_batches(_tag_carry, batch_format="pyarrow")
    )

    def kernel(t_: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "src": pa.array([], pa.int64()),
                "np_": pa.array([], pa.int64()),
                "ne": pa.array([], pa.int64()),
            }
        )
        if t_.num_rows == 0:
            return empty
        kk = t_["k"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t_["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t_["o"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = (
            t_["v"].combine_chunks().to_numpy(zero_copy_only=False)
            .view(np.float64)
        )
        cr = t_["carry"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cr, oo, tt, kk))
        ks, vs, crs = kk[order], vv[order], cr[order]
        n = len(order)
        has_prev = np.empty(n, dtype=bool)
        has_prev[0] = False
        has_prev[1:] = ks[1:] == ks[:-1]
        sel = has_prev & ~crs
        if not sel.any():
            return empty
        pv = np.empty(n, dtype=np.float64)
        pv[0] = 0.0
        pv[1:] = vs[:-1]
        eq = (vs == pv) & sel
        gk = ks[sel]
        u = np.unique(gk)
        npair = np.zeros(len(u), np.int64)
        neq = np.zeros(len(u), np.int64)
        np.add.at(npair, np.searchsorted(u, gk), 1)
        np.add.at(neq, np.searchsorted(u, ks[eq]), 1)
        return pa.table(
            {
                "src": pa.array(u, pa.int64()),
                "np_": pa.array(npair),
                "ne": pa.array(neq),
            }
        )

    partials = _kw_partition(full, kernel, shuffle_parts(_adaptive_k(sf_dir)))

    def merge(t: pa.Table) -> pa.Table:
        npair = np.zeros(ns, np.int64)
        neq = np.zeros(ns, np.int64)
        if t.num_rows:
            s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                npair, s,
                t["np_"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                neq, s,
                t["ne"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        return pa.table(
            {
                "source": srcs,
                "n_pairs": pa.array(npair),
                "n_equal": pa.array(neq),
                "stuck_permille": pa.array(
                    1000 * neq // np.maximum(npair, 1)
                ),
            }
        )

    return hash_partition_merge(partials, "src", merge, k=1)


def events_rank_flips(sf_dir: str) -> Dataset:
    """E141: leaderboard-stability board — rank EVERY source on EVERY
    calendar day present in the stream (by that day's event count,
    absent sources counting 0; ties → source string ascending) and
    report per source: days ranked, best and worst rank, the rank
    SUM over all days, and the number of day-to-day rank CHANGES —
    E101 tracks only who is #1; E141 reads the whole leaderboard's
    churn (a stable mix has near-zero flips at every position; heavy
    mid-table flipping with a frozen #1 is the long-tail rotation
    E64's share board shows as noise).  One dense row per source
    ALWAYS.  Exact int64 (dense day×source grid + row_number + lag
    oracle).

    Scale shape — E101's two-stage reduction: per batch one packed
    np.unique to (day, source, n) partials; the day-hash exchange
    settles each day's exact counts and emits the day's FULL rank
    column (ns rows — the grid is O(days × sources), corpus-length
    independent); the k=1 merge lexsorts the tiny grid once for the
    per-source flip scan."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)
    day_us = 86_400_000_000

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        day = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // day_us
        )
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        packed = day * ns + code
        vals, freq = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "d": pa.array(vals // ns, pa.int64()),
                "c": pa.array(vals % ns, pa.int64()),
                "n": pa.array(freq.astype(np.int64)),
            }
        )

    def rank_fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "d": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                    "rk": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["d", "c"], use_threads=False).aggregate([("n", "sum")])
        dd = g["d"].combine_chunks().to_numpy(zero_copy_only=False)
        cc = g["c"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        days = np.unique(dd)
        nd = len(days)
        # dense day x source count grid for this partition's days
        grid = np.zeros((nd, ns), np.int64)
        grid[np.searchsorted(days, dd), cc] = nn
        # per-day rank: order by (-n, code); position+1 is the rank
        order = np.argsort(-grid, axis=1, kind="stable")
        rk = np.empty((nd, ns), np.int64)
        rows = np.repeat(np.arange(nd), ns)
        rk[rows, order.ravel()] = np.tile(np.arange(1, ns + 1), nd)
        return pa.table(
            {
                "d": pa.array(np.repeat(days, ns)),
                "c": pa.array(np.tile(np.arange(ns, dtype=np.int64), nd)),
                "rk": pa.array(rk.ravel()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        n_days = np.zeros(ns, np.int64)
        best = np.full(ns, np.iinfo(np.int64).max, np.int64)
        worst = np.zeros(ns, np.int64)
        rsum = np.zeros(ns, np.int64)
        flips = np.zeros(ns, np.int64)
        if t.num_rows:
            dd = t["d"].combine_chunks().to_numpy(zero_copy_only=False)
            cc = t["c"].combine_chunks().to_numpy(zero_copy_only=False)
            rk = t["rk"].combine_chunks().to_numpy(zero_copy_only=False)
            order = np.lexsort((dd, cc))
            c2, r2 = cc[order], rk[order]
            np.add.at(n_days, c2, 1)
            np.minimum.at(best, c2, r2)
            np.maximum.at(worst, c2, r2)
            np.add.at(rsum, c2, r2)
            same_src = np.zeros(len(order), dtype=bool)
            same_src[1:] = c2[1:] == c2[:-1]
            changed = np.zeros(len(order), dtype=bool)
            changed[1:] = r2[1:] != r2[:-1]
            np.add.at(flips, c2[same_src & changed], 1)
        best[n_days == 0] = 0
        return pa.table(
            {
                "source": srcs,
                "n_days": pa.array(n_days),
                "best_rank": pa.array(best),
                "worst_rank": pa.array(worst),
                "rank_sum": pa.array(rsum),
                "rank_changes": pa.array(flips),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    ranks = hash_partition_merge(partials, "d", rank_fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(ranks, "c", merge, k=1)


def events_source_retention(sf_dir: str) -> Dataset:
    """E142: per-source weekly audience stickiness — per source: distinct
    (user, Monday-week) pairs, pairs where the SAME user was active in
    the SAME source the previous week, and the retained permille — E71
    asks whether the PLATFORM keeps its users week over week; E142 asks
    which source does the keeping (a source with big reach and a thin
    retained permille is drive-by traffic; the habit-forming source is
    where E124's exclusive audience actually lives).  One dense row per
    source ALWAYS.  Exact int64 (distinct source-user-weeks + lag
    oracle, E71's week convention verbatim).

    Scale shape — E71's distinct-pair reduction with the source riding
    along: each batch lexsort-compacts to distinct (source, user, week)
    triples; the USER-hash partition holds every week of every source a
    user touched, so consecutive-week adjacency settles locally and
    re-reduces IN PLACE to (source, user_weeks, retained) partials —
    O(sources) rows per partition however long the tape; k=1 densifying
    merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)
    day_us = 86_400_000_000
    week_us = 7 * day_us
    monday0_us = 4 * day_us

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        uu = pc.cast(b["user_id"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        cc = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        wk = (ts_us - monday0_us) // week_us
        order = np.lexsort((wk, cc, uu))
        u2, c2, w2 = uu[order], cc[order], wk[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = (
            (u2[1:] != u2[:-1]) | (c2[1:] != c2[:-1]) | (w2[1:] != w2[:-1])
        )
        st = np.flatnonzero(new)
        return pa.table(
            {
                "user_id": pa.array(u2[st], pa.int64()),
                "c": pa.array(c2[st], pa.int64()),
                "week": pa.array(w2[st], pa.int64()),
            }
        )

    def user_fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "c": pa.array([], pa.int64()),
                    "uw": pa.array([], pa.int64()),
                    "ret": pa.array([], pa.int64()),
                }
            )
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        cc = t["c"].combine_chunks().to_numpy(zero_copy_only=False)
        ww = t["week"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ww, cc, uu))
        u2, c2, w2 = uu[order], cc[order], ww[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = (u2[1:] != u2[:-1]) | (c2[1:] != c2[:-1]) | (
            w2[1:] != w2[:-1]
        )
        st = new  # distinct triples (exchange may duplicate across batches)
        u3, c3, w3 = u2[st], c2[st], w2[st]
        same = np.zeros(len(u3), dtype=bool)
        same[1:] = (u3[1:] == u3[:-1]) & (c3[1:] == c3[:-1])
        ret = same & (np.diff(w3, prepend=w3[0] if len(w3) else 0) == 1)
        uw = np.bincount(c3, minlength=ns)
        rr = np.bincount(c3[ret], minlength=ns)
        live = np.flatnonzero(uw)
        return pa.table(
            {
                "c": pa.array(live.astype(np.int64)),
                "uw": pa.array(uw[live].astype(np.int64)),
                "ret": pa.array(rr[live].astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        uw = np.zeros(ns, np.int64)
        ret = np.zeros(ns, np.int64)
        if t.num_rows:
            cc = t["c"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                uw, cc,
                t["uw"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                ret, cc,
                t["ret"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        return pa.table(
            {
                "source": srcs,
                "n_user_weeks": pa.array(uw),
                "n_retained": pa.array(ret),
                "retained_permille": pa.array(
                    1000 * ret // np.maximum(uw, 1)
                ),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(
        partials, "user_id", user_fold, k=_adaptive_k(sf_dir)
    )
    return hash_partition_merge(cells, "c", merge, k=1)


def events_weekpart_audience(sf_dir: str) -> Dataset:
    """E143: weekday/weekend audience split — per source: users active
    ONLY on weekdays, ONLY on weekends (UTC; Sat/Sun), users active in
    BOTH regimes, and the both-permille of the source's audience —
    E112's capacity board counts EVENTS per regime; E143 asks whether
    they come from the same PEOPLE (a source whose weekend volume is
    its weekday users staying on is one audience with two schedules;
    disjoint weekday/weekend crowds are two products sharing a name,
    and E71-style retention should be read per regime).  One dense row
    per source ALWAYS.  Exact int64 (distinct-triple + per-user
    max-bit oracle; isodow ≥ 6 ≡ (epoch_day+3) mod 7 ≥ 5).

    Scale shape — ONE user-hash exchange of distinct (source, user,
    regime-bit) triples (each batch lexsort-compacts first — at most
    2 rows per (source, user) survive per batch); each user's
    partition holds both bits of every pair, so the only/both split
    settles locally and collapses IN PLACE to O(sources) partial rows;
    k=1 densifying merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)
    day_us = 86_400_000_000

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        uu = pc.cast(b["user_id"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        cc = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        we = ((ts_us // day_us + 3) % 7 >= 5).astype(np.int64)
        packed = (uu * ns + cc) * 2 + we
        vals = np.unique(packed)
        return pa.table(
            {
                "user_id": pa.array(vals // (2 * ns), pa.int64()),
                "c": pa.array((vals // 2) % ns, pa.int64()),
                "we": pa.array(vals & 1, pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "c": pa.array([], pa.int64()),
                    "nwd": pa.array([], pa.int64()),
                    "nwe": pa.array([], pa.int64()),
                    "nb": pa.array([], pa.int64()),
                }
            )
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        cc = t["c"].combine_chunks().to_numpy(zero_copy_only=False)
        we = t["we"].combine_chunks().to_numpy(zero_copy_only=False)
        pairs = np.unique((uu * ns + cc) * 2 + we)
        pc_ = pairs // 2
        bit = pairs & 1
        upair, idx = np.unique(pc_, return_inverse=True)
        has_wd = np.zeros(len(upair), bool)
        has_we = np.zeros(len(upair), bool)
        has_wd[idx[bit == 0]] = True
        has_we[idx[bit == 1]] = True
        code = (upair % ns).astype(np.int64)
        nwd = np.bincount(code[has_wd & ~has_we], minlength=ns)
        nwe = np.bincount(code[~has_wd & has_we], minlength=ns)
        nb = np.bincount(code[has_wd & has_we], minlength=ns)
        live = np.flatnonzero(nwd + nwe + nb)
        return pa.table(
            {
                "c": pa.array(live.astype(np.int64)),
                "nwd": pa.array(nwd[live].astype(np.int64)),
                "nwe": pa.array(nwe[live].astype(np.int64)),
                "nb": pa.array(nb[live].astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nwd = np.zeros(ns, np.int64)
        nwe = np.zeros(ns, np.int64)
        nb = np.zeros(ns, np.int64)
        if t.num_rows:
            cc = t["c"].combine_chunks().to_numpy(zero_copy_only=False)
            for grid, col in ((nwd, "nwd"), (nwe, "nwe"), (nb, "nb")):
                np.add.at(
                    grid, cc,
                    t[col].combine_chunks().to_numpy(zero_copy_only=False),
                )
        tot = nwd + nwe + nb
        return pa.table(
            {
                "source": srcs,
                "n_weekday_only": pa.array(nwd),
                "n_weekend_only": pa.array(nwe),
                "n_both": pa.array(nb),
                "both_permille": pa.array(1000 * nb // np.maximum(tot, 1)),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(
        partials, "user_id", fold, k=_adaptive_k(sf_dir)
    )
    return hash_partition_merge(cells, "c", merge, k=1)


def events_ts_collisions(sf_dir: str) -> Dataset:
    """E144: timestamp-collision audit — per source: events, DISTINCT
    timestamps, events sharing their exact ts with another event of the
    SAME source, and the worst single-timestamp multiplicity — the
    ordering-ambiguity read under every (ts, event_id) tie-break in the
    temporal suite (E13/E15/E21 are deterministic BECAUSE of the
    event_id tie rule; E144 measures how often that rule is actually
    load-bearing — a source with fat collisions is batch-flushing
    upstream, and its E46 interarrival quantiles are measuring the
    flusher).  One dense row per source ALWAYS.  Exact int64
    (group-by-(source, ts) count oracle).

    Scale shape — ONE ts-hash exchange of pre-reduced (ts, source,
    n) partials (each batch np.unique-compacts first); every event of
    a timestamp lands in one partition, so exact multiplicities settle
    locally and collapse IN PLACE to per-source (events, distinct,
    collided, max) partials — sums and maxes both fold associatively;
    k=1 densifying merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        cc = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        packed = ts_us * ns + cc
        vals, cnt = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "t": pa.array(vals // ns, pa.int64()),
                "c": pa.array(vals % ns, pa.int64()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "c": pa.array([], pa.int64()),
                    "ne": pa.array([], pa.int64()),
                    "nd": pa.array([], pa.int64()),
                    "ncol": pa.array([], pa.int64()),
                    "mx": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["t", "c"], use_threads=False).aggregate([("n", "sum")])
        cc = g["c"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        ne = np.zeros(ns, np.int64)
        nd = np.zeros(ns, np.int64)
        ncol = np.zeros(ns, np.int64)
        mx = np.zeros(ns, np.int64)
        np.add.at(ne, cc, nn)
        np.add.at(nd, cc, 1)
        col = nn > 1
        np.add.at(ncol, cc[col], nn[col])
        np.maximum.at(mx, cc, nn)
        live = np.flatnonzero(nd)
        return pa.table(
            {
                "c": pa.array(live.astype(np.int64)),
                "ne": pa.array(ne[live]),
                "nd": pa.array(nd[live]),
                "ncol": pa.array(ncol[live]),
                "mx": pa.array(mx[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        ne = np.zeros(ns, np.int64)
        nd = np.zeros(ns, np.int64)
        ncol = np.zeros(ns, np.int64)
        mx = np.zeros(ns, np.int64)
        if t.num_rows:
            cc = t["c"].combine_chunks().to_numpy(zero_copy_only=False)
            for grid, col in ((ne, "ne"), (nd, "nd"), (ncol, "ncol")):
                np.add.at(
                    grid, cc,
                    t[col].combine_chunks().to_numpy(zero_copy_only=False),
                )
            np.maximum.at(
                mx, cc,
                t["mx"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        return pa.table(
            {
                "source": srcs,
                "n_events": pa.array(ne),
                "n_distinct_ts": pa.array(nd),
                "n_collided": pa.array(ncol),
                "max_multiplicity": pa.array(mx),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "t", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "c", merge, k=1)


def events_value_integrality(sf_dir: str) -> Dataset:
    """E145: payload-type audit — per source: events, values that are
    EXACT integers (value == floor(value)), strictly negative values,
    exact zeros, and the integer permille — the "is this gauge secretly
    a counter" read (E120/E132 profile the DIGITS of floor(value);
    E145 asks whether flooring loses anything at all — a source at
    1000‰ integrality should be rolled up with count semantics, one
    with negative mass can't be a counter, and a fat zero share is a
    default-value leak).  One dense row per source ALWAYS.  Exact
    int64 (float predicates are order-free, both engines test the
    same float64s; FILTER-count oracle).

    Scale shape — ZERO wide exchange: each batch reduces to O(sources)
    partial rows with three vectorized predicates + one bincount; the
    k=1 merge folds O(batches × sources) rows."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        vv = b["value"].cast(pa.float64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        cc = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        ne = np.bincount(cc, minlength=ns)
        ni = np.bincount(cc[vv == np.floor(vv)], minlength=ns)
        nn = np.bincount(cc[vv < 0], minlength=ns)
        nz = np.bincount(cc[vv == 0], minlength=ns)
        live = np.flatnonzero(ne)
        return pa.table(
            {
                "c": pa.array(live.astype(np.int64)),
                "ne": pa.array(ne[live].astype(np.int64)),
                "ni": pa.array(ni[live].astype(np.int64)),
                "nn": pa.array(nn[live].astype(np.int64)),
                "nz": pa.array(nz[live].astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        ne = np.zeros(ns, np.int64)
        ni = np.zeros(ns, np.int64)
        nn = np.zeros(ns, np.int64)
        nz = np.zeros(ns, np.int64)
        if t.num_rows:
            cc = t["c"].combine_chunks().to_numpy(zero_copy_only=False)
            for grid, col in ((ne, "ne"), (ni, "ni"), (nn, "nn"), (nz, "nz")):
                np.add.at(
                    grid, cc,
                    t[col].combine_chunks().to_numpy(zero_copy_only=False),
                )
        return pa.table(
            {
                "source": srcs,
                "n_events": pa.array(ne),
                "n_integer": pa.array(ni),
                "n_negative": pa.array(nn),
                "n_zero": pa.array(nz),
                "integer_permille": pa.array(
                    1000 * ni // np.maximum(ne, 1)
                ),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "c", merge, k=1)


def events_value_iqr_outliers(sf_dir: str) -> Dataset:
    """E146: payload IQR-fence outlier audit — per source: events, the
    exact discrete q1/q3 of the metric value IN CENTS, and how many
    events fall below q1-1.5*IQR / above q3+1.5*IQR — the Tukey-fence
    triage a dashboard draws as box-plot whisker escapees (E42 flags
    anomalous MINUTES against a median/MAD grid; E146 audits raw
    PAYLOADS against the source's own spread — a fat n_high on a gauge
    is a unit mix-up or a sensor spike upstream of every rollup).  One
    dense row per source ALWAYS; exact int64 throughout: values are
    cents-quantized doubles, so round(value*100) is lossless, and the
    fence tests use the integer forms 2v < 5*q1 - 3*q3 and
    2v > 5*q3 - 3*q1 (= the +-1.5*IQR fences scaled by 2) — no float
    arithmetic anywhere (quantile_disc + integer-FILTER oracle).

    Scale shape — the bounded-domain histogram trick (E93's): the cents
    axis is fixed (~50k values at any corpus size), so each batch
    reduces to (source, cents, freq) cells via one packed np.unique;
    ONE hash exchange lands each source's complete spectrum in one
    partition, where quantiles AND both fence counts read off a single
    sort + cumsum — the raw stream never shuffles, and no second pass
    is needed because the fences are functions of the same histogram."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    off = 1 << 39  # cents offset: keeps packed keys positive for negatives

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        v = (
            b["value"].combine_chunks().to_numpy(zero_copy_only=False)
        )
        cents = np.rint(v * 100.0).astype(np.int64)
        if len(cents) and (
            int(cents.min()) <= -off or int(cents.max()) >= off
        ):
            raise ValueError(
                "events_value_iqr_outliers: |value| >= 2^39 cents — "
                "packed (source, cents) key needs a wider layout"
            )
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        key, f = np.unique(code * (1 << 40) + (cents + off), return_counts=True)
        return pa.table(
            {
                "s": pa.array(key >> 40, pa.int64()),
                "c": pa.array((key & ((1 << 40) - 1)) - off, pa.int64()),
                "f": pa.array(f.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        cols = ("source", "n_events", "q1_cents", "q3_cents", "n_low", "n_high")
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in cols[1:]},
                }
            )
        g = t.group_by(["s", "c"], use_threads=False).aggregate([("f", "sum")])
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        cc = g["c"].combine_chunks().to_numpy(zero_copy_only=False)
        ff = g["f_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cc, ss))
        s2, c2, f2 = ss[order], cc[order], ff[order]
        news = np.empty(len(order), dtype=bool)
        news[0] = True
        news[1:] = s2[1:] != s2[:-1]
        starts = np.flatnonzero(news)
        ends = np.append(starts[1:], len(order))
        out = {c: [] for c in cols}
        for a, b in zip(starts, ends):
            vals, freq = c2[a:b], f2[a:b]
            nt = int(freq.sum())
            cum = np.cumsum(freq)
            q1 = int(vals[np.searchsorted(cum, (nt * 250 + 999) // 1000)])
            q3 = int(vals[np.searchsorted(cum, (nt * 750 + 999) // 1000)])
            n_low = int(freq[2 * vals < 5 * q1 - 3 * q3].sum())
            n_high = int(freq[2 * vals > 5 * q3 - 3 * q1].sum())
            out["source"].append(int(s2[a]))
            out["n_events"].append(nt)
            out["q1_cents"].append(q1)
            out["q3_cents"].append(q3)
            out["n_low"].append(n_low)
            out["n_high"].append(n_high)
        return pa.table(
            {
                "source": srcs.take(pa.array(out["source"], pa.int64())),
                **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "s", merge, k=1)


def events_clock_inversions(
    sf_dir: str, window_ids: int = 1 << 17
) -> Dataset:
    """E147: producer clock-skew audit — per source: events, adjacent
    pairs in EVENT-ID order, pairs whose timestamp moves BACKWARD
    (clock inversions), the worst single backstep in microseconds, and
    the inversion permille — the delivery-order-vs-wall-clock read
    (E114 audits id GAPS, E144 ts COLLISIONS; E147 crosses the two
    axes: ids are assign-time order, so a ts that retreats between
    consecutive ids means a skewed producer clock, an NTP step, or a
    backfill replay — exactly the rows that silently land in the wrong
    rollup bucket of every E2 assign_time consumer).  One dense row
    per source ALWAYS; exact int64; ties on event_id break by ts on
    BOTH sides, so the pair set is deterministic (lag-window oracle).

    Scale shape — the carried-prefix scan on the ID axis (E140's shape
    rotated 90°): rows tag (source, event_id-window); per-(source,
    window, batch) summaries carry each window's last (id, ts) forward
    in :func:`_last_event_carries`' two narrow exchanges, so no
    source's full history ever lands in one task; the per-partition
    kernel is one lexsort + one shifted compare; (events, pairs,
    inversions, max_backstep) partials fold in one tiny k=1 merge."""
    from ..stages.shuffle import hash_partition_merge, shuffle_parts
    from ..stages.temporal import _kw_partition

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    kfan = _adaptive_k(sf_dir)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id"],
        override_num_blocks=kfan,
    )

    def narrow(b: pa.Table) -> pa.Table:
        ids = (
            pc.cast(b["event_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        ts_us = (
            b["ts"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "k": pc.cast(
                    pc.index_in(b["event_type"], value_set=srcs), pa.int64()
                ),
                "t": pa.array(ids, pa.int64()),
                "o": pa.array(ts_us, pa.int64()),
                "v": pa.array(ts_us, pa.int64()),
                "carry": pa.array(np.zeros(b.num_rows, dtype=bool)),
                "w": pa.array(ids // window_ids, pa.int64()),
            }
        )

    tagged = ds.map_batches(narrow, batch_format="pyarrow")
    carries = _last_event_carries(tagged)
    full = tagged.union(
        carries.map_batches(_tag_carry, batch_format="pyarrow")
    )

    def kernel(t_: pa.Table) -> pa.Table:
        cols = ("s", "ne", "np_", "ni", "mb")
        if t_.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        kk = t_["k"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t_["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t_["o"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = t_["v"].combine_chunks().to_numpy(zero_copy_only=False)
        cr = t_["carry"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cr, oo, tt, kk))  # carry first on full ties
        ks, vs, crs = kk[order], vv[order], cr[order]
        n = len(order)
        has_prev = np.empty(n, dtype=bool)
        has_prev[0] = False
        has_prev[1:] = ks[1:] == ks[:-1]
        pv = np.empty(n, dtype=np.int64)
        pv[0] = 0
        pv[1:] = vs[:-1]
        pair = has_prev & ~crs
        inv = pair & (vs < pv)
        back = np.where(inv, pv - vs, 0)
        ng = len(srcs)
        ne = np.bincount(ks[~crs], minlength=ng).astype(np.int64)
        npr = np.bincount(ks[pair], minlength=ng).astype(np.int64)
        ni = np.bincount(ks[inv], minlength=ng).astype(np.int64)
        mb = np.zeros(ng, np.int64)
        np.maximum.at(mb, ks, back)
        return pa.table(
            {
                "s": pa.array(np.arange(ng, dtype=np.int64)),
                "ne": pa.array(ne),
                "np_": pa.array(npr),
                "ni": pa.array(ni),
                "mb": pa.array(mb),
            }
        )

    cells = _kw_partition(full, kernel, shuffle_parts(kfan))

    def merge(t: pa.Table) -> pa.Table:
        out_cols = (
            "source",
            "n_events",
            "n_pairs",
            "n_inversions",
            "max_backstep_us",
            "inversion_permille",
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out_cols[1:]},
                }
            )
        g = t.group_by("s", use_threads=False).aggregate(
            [("ne", "sum"), ("np_", "sum"), ("ni", "sum"), ("mb", "max")]
        )
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        ne = g["ne_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        npr = g["np__sum"].combine_chunks().to_numpy(zero_copy_only=False)
        ni = g["ni_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        mb = g["mb_max"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = ne > 0
        ss, ne, npr, ni, mb = ss[keep], ne[keep], npr[keep], ni[keep], mb[keep]
        order = np.argsort(ss)
        ss, ne, npr, ni, mb = (
            ss[order],
            ne[order],
            npr[order],
            ni[order],
            mb[order],
        )
        return pa.table(
            {
                "source": srcs.take(pa.array(ss, pa.int64())),
                "n_events": pa.array(ne, pa.int64()),
                "n_pairs": pa.array(npr, pa.int64()),
                "n_inversions": pa.array(ni, pa.int64()),
                "max_backstep_us": pa.array(mb, pa.int64()),
                "inversion_permille": pa.array(
                    1000 * ni // np.maximum(npr, 1), pa.int64()
                ),
            }
        )

    return hash_partition_merge(cells, "s", merge, k=1)


def events_load_markov(sf_dir: str, band_cap: int = 8) -> Dataset:
    """E148: minute-load transition matrix — over the dense gap-filled
    1m grid, band each minute's event count into 0..band_cap (counts at
    or above the cap collapse into the top band) and count every
    adjacent-minute band transition per source — the load MOMENTUM read
    none of the static boards give (E128's Gini and E117's Fano say how
    unequal/bursty the load distribution IS; E116 how it compresses;
    E148 says how it MOVES: a heavy 0→high diagonal means cold-start
    spikes, a sticky high→high cell means sustained plateaus — the
    Markov row a capacity planner or anomaly scorer conditions on).
    Gap minutes are band 0 (they are real stored points of the tier).
    Sparse exact output: (source, from_band, to_band, n_transitions),
    int64 (gapfill CTE + LEAST + lag oracle).

    Scale shape — E116's composition discipline: E5's windowed gap_fill
    supplies the dense grid scale-safely; each batch reduces to its
    in-batch transition cells (one lexsort + one shifted compare; at
    most sources × (cap+1)² cells) plus TWO boundary rows per contiguous
    (source, minute-run) segment, so only O(batches × sources) tiny
    rows reach the k=1 merge, which stitches segment junctions by
    matching each segment end to the start at minute+1."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    nb = band_cap + 1

    grid = events_gapfill(sf_dir, "1m").select_columns(
        ["source", "bucket_ts", "count"]
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        ts = (
            b["bucket_ts"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        ) // 60_000_000
        band = np.minimum(
            pc.cast(b["count"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False),
            band_cap,
        )
        order = np.lexsort((ts, code))
        c, t, v = code[order], ts[order], band[order]
        n = len(c)
        adj = np.zeros(max(n - 1, 0), dtype=bool)
        if n > 1:
            adj = (c[1:] == c[:-1]) & (t[1:] == t[:-1] + 1)
        key = (c[:-1][adj] * nb + v[:-1][adj]) * nb + v[1:][adj]
        u, cnts = np.unique(key, return_counts=True)
        brk = np.empty(n, dtype=bool)
        if n:
            brk[0] = True
            brk[1:] = ~adj
        seg_a = np.flatnonzero(brk)
        seg_b = np.append(seg_a[1:] - 1, n - 1) if n else seg_a
        return pa.table(
            {
                "s": pa.array(
                    np.concatenate([u // (nb * nb), c[seg_a], c[seg_b]])
                ),
                "kind": pa.array(
                    np.concatenate(
                        [
                            np.zeros(len(u), np.int64),
                            np.ones(len(seg_a), np.int64),
                            np.full(len(seg_b), 2, np.int64),
                        ]
                    )
                ),
                "a": pa.array(
                    np.concatenate([(u // nb) % nb, t[seg_a], t[seg_b]])
                ),
                "b": pa.array(
                    np.concatenate([u % nb, v[seg_a], v[seg_b]])
                ),
                "n": pa.array(
                    np.concatenate(
                        [
                            cnts.astype(np.int64),
                            np.ones(len(seg_a) + len(seg_b), np.int64),
                        ]
                    )
                ),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("source", "from_band", "to_band", "n_transitions")
        mat = np.zeros((len(srcs), nb, nb), np.int64)
        if t.num_rows:
            ss = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
            kd = t["kind"].combine_chunks().to_numpy(zero_copy_only=False)
            aa = t["a"].combine_chunks().to_numpy(zero_copy_only=False)
            bb = t["b"].combine_chunks().to_numpy(zero_copy_only=False)
            nn = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
            cell = kd == 0
            np.add.at(mat, (ss[cell], aa[cell], bb[cell]), nn[cell])
            # stitch segment junctions: end at minute m meets the start
            # at m+1 of the same source (minutes are unique per source)
            st, en = kd == 1, kd == 2
            spk = ss[st] * (1 << 36) + aa[st]
            sorder = np.argsort(spk)
            spk_s, sband = spk[sorder], bb[st][sorder]
            target = ss[en] * (1 << 36) + aa[en] + 1
            pos = np.searchsorted(spk_s, target)
            ok = (pos < len(spk_s)) & (spk_s[np.minimum(pos, len(spk_s) - 1)] == target)
            np.add.at(
                mat,
                (ss[en][ok], bb[en][ok], sband[pos[ok]]),
                1,
            )
        si, fi, ti = np.nonzero(mat)
        return pa.table(
            {
                "source": srcs.take(pa.array(si, pa.int64())),
                "from_band": pa.array(fi.astype(np.int64)),
                "to_band": pa.array(ti.astype(np.int64)),
                "n_transitions": pa.array(mat[si, fi, ti]),
            }
        )

    partials = grid.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "s", merge, k=1)


def events_gap_value_coupling(
    sf_dir: str, window_us: int = TEMPORAL_WINDOW_US
) -> Dataset:
    """E149: gap-value coupling board — per source, over adjacent event
    pairs in (ts, event_id, floor(value)) order: pair count, Σgap,
    Σgap² (gap = floor-seconds since the previous event) and Σv, Σv²,
    Σgap·v (v = the LATER event's floored payload) — the exact-int64
    normal equations of the silence-vs-payload regression, the ONE
    cross-axis moment no other board carries (E111/E123 distribute the
    gaps, E97 couples value with WALL TIME, E149 asks whether long
    silences precede big payloads — meter reads, batched sensors, and
    queue flushes all say yes, and any sampler that thins quiet periods
    needs this number to know what it would bias).  One dense row per
    source ALWAYS.  Int64 bound documented (the E97 discipline): gap_s
    ≤ ~3·10⁷ (a year), v ≤ 10⁶ → Σgap·v holds ~3·10⁵ pairs/source per
    epoch shard; 100 TB rides sharded epochs.  Exact int64 (lag-window
    + floor-divide oracle; ties break by (event_id, value) on BOTH
    sides so the pair set is deterministic).

    Scale shape — E147's carried-prefix machinery rotated onto the TS
    axis: rows tag (source, ts-window); :func:`_last_event_carries`
    hands each window its predecessor's (ts, id, v) in two narrow
    exchanges; the per-(source, window) kernel is one lexsort + one
    shifted subtract; six-sum partials fold in one tiny k=1 merge."""
    from ..stages.shuffle import hash_partition_merge, shuffle_parts
    from ..stages.temporal import _kw_partition

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    kfan = _adaptive_k(sf_dir)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
        override_num_blocks=kfan,
    )

    def narrow(b: pa.Table) -> pa.Table:
        ts_us = (
            b["ts"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "k": pc.cast(
                    pc.index_in(b["event_type"], value_set=srcs), pa.int64()
                ),
                "t": pa.array(ts_us, pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
                "v": pc.cast(pc.floor(b["value"]), pa.int64()),
                "carry": pa.array(np.zeros(b.num_rows, dtype=bool)),
                "w": pa.array(ts_us // window_us, pa.int64()),
            }
        )

    tagged = ds.map_batches(narrow, batch_format="pyarrow")
    carries = _last_event_carries(tagged)
    full = tagged.union(
        carries.map_batches(_tag_carry, batch_format="pyarrow")
    )

    def kernel(t_: pa.Table) -> pa.Table:
        cols = ("s", "np_", "sg", "sgg", "sv", "svv", "sgv")
        if t_.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        kk = t_["k"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t_["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t_["o"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = t_["v"].combine_chunks().to_numpy(zero_copy_only=False)
        cr = t_["carry"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cr, vv, oo, tt, kk))
        ks, ts, vs, crs = kk[order], tt[order], vv[order], cr[order]
        n = len(order)
        has_prev = np.empty(n, dtype=bool)
        has_prev[0] = False
        has_prev[1:] = ks[1:] == ks[:-1]
        pt = np.empty(n, dtype=np.int64)
        pt[0] = 0
        pt[1:] = ts[:-1]
        pair = has_prev & ~crs
        g = np.where(pair, (ts - pt) // 1_000_000, 0)
        v = np.where(pair, vs, 0)
        ng = len(srcs)
        out = {
            "s": np.arange(ng, dtype=np.int64),
            "np_": np.bincount(ks[pair], minlength=ng).astype(np.int64),
        }
        for name, arr in (
            ("sg", g),
            ("sgg", g * g),
            ("sv", v),
            ("svv", v * v),
            ("sgv", g * v),
        ):
            acc = np.zeros(ng, np.int64)
            np.add.at(acc, ks, arr)
            out[name] = acc
        return pa.table({c: pa.array(a) for c, a in out.items()})

    cells = _kw_partition(full, kernel, shuffle_parts(kfan))

    def merge(t: pa.Table) -> pa.Table:
        names = (
            "source",
            "n_pairs",
            "sum_gap_s",
            "sum_gap_sq",
            "sum_v",
            "sum_v_sq",
            "sum_gap_v",
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in names[1:]},
                }
            )
        g = t.group_by("s", use_threads=False).aggregate(
            [(c, "sum") for c in ("np_", "sg", "sgg", "sv", "svv", "sgv")]
        )
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(ss)
        cols = {
            name: g[f"{src}_sum"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)[order]
            for name, src in zip(
                names[1:], ("np_", "sg", "sgg", "sv", "svv", "sgv")
            )
        }
        return pa.table(
            {
                "source": srcs.take(pa.array(ss[order], pa.int64())),
                **{c: pa.array(a, pa.int64()) for c, a in cols.items()},
            }
        )

    return hash_partition_merge(cells, "s", merge, k=1)


def events_id_interleaving(
    sf_dir: str, window_ids: int = 1 << 17
) -> Dataset:
    """E150: id-space interleaving audit — walk the GLOBAL event-id
    order (all sources merged, ties broken by (ts, source)) and, per
    source: events and maximal same-source RUNS, plus the run permille
    (1000·runs/events; 1000 = fully interleaved singleton assignment,
    small = the id allocator hands out BLOCKS per producer) — the id
    ALLOCATION topology read none of the audits give (E114 checks each
    source's ids for gaps in isolation, E113 counts per-minute source
    concurrency on the TIME axis; E150 asks how producers share the id
    SPACE itself: block allocation means a range scan on ids hits one
    producer — exactly what epoch sharding, replay and id-range
    partition pruning assume or break on).  One dense row per source
    ALWAYS; exact int64 (global lag-window oracle).

    Scale shape — E147's carried-prefix machinery with ONE key (the
    stream itself): rows tag (0, id-window); windows spread across the
    (k, w)-hash partitions, each kernel is one lexsort + one shifted
    source-compare, and :func:`_last_event_carries` hands each window
    its predecessor's source so runs crossing window edges never
    double-count a start; the single-key carry merge handles only
    O(windows) summary rows (documented: ids/2^17)."""
    from ..stages.shuffle import hash_partition_merge, shuffle_parts
    from ..stages.temporal import _kw_partition

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    kfan = _adaptive_k(sf_dir)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id"],
        override_num_blocks=kfan,
    )

    def narrow(b: pa.Table) -> pa.Table:
        ids = (
            pc.cast(b["event_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "k": pa.array(np.zeros(b.num_rows, np.int64)),
                "t": pa.array(ids, pa.int64()),
                "o": b["ts"].cast(pa.int64()),
                "v": pc.cast(
                    pc.index_in(b["event_type"], value_set=srcs), pa.int64()
                ),
                "carry": pa.array(np.zeros(b.num_rows, dtype=bool)),
                "w": pa.array(ids // window_ids, pa.int64()),
            }
        )

    tagged = ds.map_batches(narrow, batch_format="pyarrow")
    carries = _last_event_carries(tagged)
    full = tagged.union(
        carries.map_batches(_tag_carry, batch_format="pyarrow")
    )

    def kernel(t_: pa.Table) -> pa.Table:
        cols = ("s", "ne", "nr")
        if t_.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        tt = t_["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t_["o"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = t_["v"].combine_chunks().to_numpy(zero_copy_only=False)
        cr = t_["carry"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cr, vv, oo, tt))
        vs, crs = vv[order], cr[order]
        n = len(order)
        pv = np.empty(n, dtype=np.int64)
        pv[0] = -1
        pv[1:] = vs[:-1]
        has_prev = np.empty(n, dtype=bool)
        has_prev[0] = False
        has_prev[1:] = True
        run_start = ~crs & (~has_prev | (vs != pv))
        ng = len(srcs)
        return pa.table(
            {
                "s": pa.array(np.arange(ng, dtype=np.int64)),
                "ne": pa.array(
                    np.bincount(vs[~crs], minlength=ng).astype(np.int64)
                ),
                "nr": pa.array(
                    np.bincount(vs[run_start], minlength=ng).astype(np.int64)
                ),
            }
        )

    cells = _kw_partition(full, kernel, shuffle_parts(kfan))

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_events": pa.array([], pa.int64()),
                    "n_runs": pa.array([], pa.int64()),
                    "runs_permille": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("s", use_threads=False).aggregate(
            [("ne", "sum"), ("nr", "sum")]
        )
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        ne = g["ne_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        nr = g["nr_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = ne > 0
        ss, ne, nr = ss[keep], ne[keep], nr[keep]
        order = np.argsort(ss)
        ss, ne, nr = ss[order], ne[order], nr[order]
        return pa.table(
            {
                "source": srcs.take(pa.array(ss, pa.int64())),
                "n_events": pa.array(ne, pa.int64()),
                "n_runs": pa.array(nr, pa.int64()),
                "runs_permille": pa.array(1000 * nr // ne, pa.int64()),
            }
        )

    return hash_partition_merge(cells, "s", merge, k=1)


def events_value_clock(sf_dir: str) -> Dataset:
    """E151: value clock board — per (source, hour-of-day): events and
    exact floored payload mass — WHEN the value flows, not just when
    the traffic does (E52 counts events on the dow×hour grid, E122
    counts distinct USERS by hour, E93 gives the median phase; none
    weighs the hours by the payload itself — a source whose value mass
    peaks outside its traffic peak is doing few large settlements amid
    chatter, exactly the window a billing-cutoff or fraud monitor
    should watch).  Dense small output (sources × ≤24 hours); exact
    int64 (extract(hour) + SUM(floor) oracle).

    Scale shape — ZERO wide exchange: hour-of-day is a bounded axis,
    so each batch reduces with one modulo + one bincount to (source,
    hour, n, v) cells; only O(batches × sources × 24) partials ride
    the k=1 merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        hour = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // 3_600_000_000
        ) % 24
        v = np.floor(
            b["value"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        key = code * 24 + hour
        ne = np.bincount(key, minlength=ns * 24).astype(np.int64)
        vm_i = np.zeros(ns * 24, np.int64)
        np.add.at(vm_i, key, v)
        keep = np.flatnonzero(ne)
        return pa.table(
            {
                "s": pa.array(keep // 24),
                "h": pa.array(keep % 24),
                "ne": pa.array(ne[keep]),
                "v": pa.array(vm_i[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "hour_of_day": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "value_floor": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["s", "h"], use_threads=False).aggregate(
            [("ne", "sum"), ("v", "sum")]
        )
        return pa.table(
            {
                "source": srcs.take(g["s"]),
                "hour_of_day": pc.cast(g["h"], pa.int64()),
                "n_events": pc.cast(g["ne_sum"], pa.int64()),
                "value_floor": pc.cast(g["v_sum"], pa.int64()),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "s", merge, k=1)


def events_user_id_order(
    sf_dir: str, window_us: int = TEMPORAL_WINDOW_US
) -> Dataset:
    """E152: user-id assignment-order audit — per source, walk the
    FIRST-SEEN order of its users (each user ranked by its first event,
    ties by event id then user id) and count adjacent first-seen pairs
    whose user ids ASCEND — the registration-order coherence read
    (sequential id allocators make new arrivals carry ever-larger ids:
    asc_permille ≈ 1000; random/uuid-style assignment sits near 500;
    a MIX flags backfilled imports or id recycling — exactly what
    breaks the "user_id < watermark ⇒ seen before" shortcut every
    incremental enrichment join is tempted by; E114 audits EVENT ids,
    E150 the id SPACE across producers, E152 the USER axis against
    arrival time).  One dense row per source ALWAYS; exact int64
    (min-per-user + lag-window oracle).

    Scale shape — two bounded rounds, raw events collapse first:
      1. first-seen reduce: per batch one lexsort keeps each (source,
         user)'s earliest (ts, event_id) row; ONE user-hash exchange
         settles the global first-seen cell per user — O(users) rows
         from here on;
      2. the settled cells re-tag (source, first-ts window) and run
         E147's carried-prefix pair kernel with v = user_id (one
         lexsort + one shifted compare per partition; carries hand
         each window its predecessor), then fold in the k=1 merge."""
    from ..stages.shuffle import hash_partition_merge, shuffle_parts
    from ..stages.temporal import _kw_partition

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    kfan = _adaptive_k(sf_dir)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "user_id"],
        override_num_blocks=kfan,
    )

    def batch_first(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        ts = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
        )
        eid = (
            pc.cast(b["event_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        uid = (
            pc.cast(b["user_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        order = np.lexsort((eid, ts, uid, code))
        cs, us = code[order], uid[order]
        first = np.empty(len(order), dtype=bool)
        if len(order):
            first[0] = True
            first[1:] = (cs[1:] != cs[:-1]) | (us[1:] != us[:-1])
        sel = order[first]
        return pa.table(
            {
                "s": pa.array(code[sel]),
                "u": pa.array(uid[sel]),
                "ts": pa.array(ts[sel]),
                "eid": pa.array(eid[sel]),
            }
        )

    def settle_first(t: pa.Table) -> pa.Table:
        cols = ("s", "u", "ts", "eid")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        ss = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
        uu = t["u"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = t["ts"].combine_chunks().to_numpy(zero_copy_only=False)
        eid = t["eid"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uu, ss))
        cs, us = ss[order], uu[order]
        first = np.empty(len(order), dtype=bool)
        first[0] = True
        first[1:] = (cs[1:] != cs[:-1]) | (us[1:] != us[:-1])
        sel = order[first]
        return pa.table(
            {
                "s": pa.array(ss[sel]),
                "u": pa.array(uu[sel]),
                "ts": pa.array(ts[sel]),
                "eid": pa.array(eid[sel]),
            }
        )

    cells = hash_partition_merge(
        ds.map_batches(batch_first, batch_format="pyarrow"),
        "u",
        settle_first,
        k=shuffle_parts(kfan),
    )

    def retag(b: pa.Table) -> pa.Table:
        ts = b["ts"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": b["s"],
                "t": b["ts"],
                "o": b["eid"],
                "v": b["u"],
                "carry": pa.array(np.zeros(b.num_rows, dtype=bool)),
                "w": pa.array(ts // window_us, pa.int64()),
            }
        )

    tagged = cells.map_batches(retag, batch_format="pyarrow")
    carries = _last_event_carries(tagged)
    full = tagged.union(
        carries.map_batches(_tag_carry, batch_format="pyarrow")
    )

    def kernel(t_: pa.Table) -> pa.Table:
        cols = ("s", "nu", "np_", "na")
        if t_.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        kk = t_["k"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t_["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t_["o"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = t_["v"].combine_chunks().to_numpy(zero_copy_only=False)
        cr = t_["carry"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cr, vv, oo, tt, kk))
        ks, vs, crs = kk[order], vv[order], cr[order]
        n = len(order)
        has_prev = np.empty(n, dtype=bool)
        has_prev[0] = False
        has_prev[1:] = ks[1:] == ks[:-1]
        pv = np.empty(n, dtype=np.int64)
        pv[0] = 0
        pv[1:] = vs[:-1]
        pair = has_prev & ~crs
        asc = pair & (vs > pv)
        ng = len(srcs)
        return pa.table(
            {
                "s": pa.array(np.arange(ng, dtype=np.int64)),
                "nu": pa.array(
                    np.bincount(ks[~crs], minlength=ng).astype(np.int64)
                ),
                "np_": pa.array(
                    np.bincount(ks[pair], minlength=ng).astype(np.int64)
                ),
                "na": pa.array(
                    np.bincount(ks[asc], minlength=ng).astype(np.int64)
                ),
            }
        )

    pcells = _kw_partition(full, kernel, shuffle_parts(kfan))

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_users": pa.array([], pa.int64()),
                    "n_pairs": pa.array([], pa.int64()),
                    "n_ascending": pa.array([], pa.int64()),
                    "asc_permille": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("s", use_threads=False).aggregate(
            [("nu", "sum"), ("np_", "sum"), ("na", "sum")]
        )
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        nu = g["nu_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        npr = g["np__sum"].combine_chunks().to_numpy(zero_copy_only=False)
        na = g["na_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = nu > 0
        ss, nu, npr, na = ss[keep], nu[keep], npr[keep], na[keep]
        order = np.argsort(ss)
        ss, nu, npr, na = ss[order], nu[order], npr[order], na[order]
        return pa.table(
            {
                "source": srcs.take(pa.array(ss, pa.int64())),
                "n_users": pa.array(nu, pa.int64()),
                "n_pairs": pa.array(npr, pa.int64()),
                "n_ascending": pa.array(na, pa.int64()),
                "asc_permille": pa.array(
                    1000 * na // np.maximum(npr, 1), pa.int64()
                ),
            }
        )

    return hash_partition_merge(pcells, "s", merge, k=1)


def events_arrival_drift(
    sf_dir: str, window_us: int = TEMPORAL_WINDOW_US
) -> Dataset:
    """E153: arrival-drift sufficient statistics — per source, over
    adjacent event pairs in (ts, event_id) order: n, Σm, Σm², Σg, Σg²,
    Σm·g with m = the later event's minute since the tape epoch and
    g = the pair's gap in floor-seconds — the exact-int64 normal
    equations of the inter-arrival-vs-time regression ("is this feed
    speeding up or decaying"), the TREND none of the gap boards carry
    (E81/E111/E123 distribute the gaps statically, E75 finds rising
    COUNT ramps on the minute grid, E97 trends the PAYLOAD; E153
    trends the arrival process itself — the number a capacity
    forecaster or a dying-producer alarm fits a line through).  One
    dense row per source ALWAYS.  Int64 bound documented (the E97
    discipline): m ≤ ~5·10⁵ (a year of minutes), g ≤ ~3·10⁷ s →
    Σm·g holds ~6·10⁵ pairs/source per epoch shard; 100 TB rides
    sharded epochs.  Exact int64 (lag-window + floor-divide oracle;
    ties break by event_id on both sides).

    Scale shape — E149's carried-prefix machinery verbatim (the same
    two narrow carry exchanges and one lexsort + shifted-subtract
    kernel), with the pair's regressor taken from the settled ts
    instead of the payload column; six-sum partials fold k=1."""
    from ..stages.shuffle import hash_partition_merge, shuffle_parts
    from ..stages.temporal import _kw_partition

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    kfan = _adaptive_k(sf_dir)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id"],
        override_num_blocks=kfan,
    )

    def narrow(b: pa.Table) -> pa.Table:
        ts_us = (
            b["ts"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "k": pc.cast(
                    pc.index_in(b["event_type"], value_set=srcs), pa.int64()
                ),
                "t": pa.array(ts_us, pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
                "v": pa.array(ts_us, pa.int64()),
                "carry": pa.array(np.zeros(b.num_rows, dtype=bool)),
                "w": pa.array(ts_us // window_us, pa.int64()),
            }
        )

    tagged = ds.map_batches(narrow, batch_format="pyarrow")
    carries = _last_event_carries(tagged)
    full = tagged.union(
        carries.map_batches(_tag_carry, batch_format="pyarrow")
    )

    def kernel(t_: pa.Table) -> pa.Table:
        cols = ("s", "np_", "sm", "smm", "sg", "sgg", "smg")
        if t_.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        kk = t_["k"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t_["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t_["o"].combine_chunks().to_numpy(zero_copy_only=False)
        cr = t_["carry"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cr, oo, tt, kk))
        ks, ts, crs = kk[order], tt[order], cr[order]
        n = len(order)
        has_prev = np.empty(n, dtype=bool)
        has_prev[0] = False
        has_prev[1:] = ks[1:] == ks[:-1]
        pt = np.empty(n, dtype=np.int64)
        pt[0] = 0
        pt[1:] = ts[:-1]
        pair = has_prev & ~crs
        g = np.where(pair, (ts - pt) // 1_000_000, 0)
        m = np.where(pair, (ts - EVENTS_T0_US) // 60_000_000, 0)
        ng = len(srcs)
        out = {
            "s": np.arange(ng, dtype=np.int64),
            "np_": np.bincount(ks[pair], minlength=ng).astype(np.int64),
        }
        for name, arr in (
            ("sm", m),
            ("smm", m * m),
            ("sg", g),
            ("sgg", g * g),
            ("smg", m * g),
        ):
            acc = np.zeros(ng, np.int64)
            np.add.at(acc, ks, arr)
            out[name] = acc
        return pa.table({c: pa.array(a) for c, a in out.items()})

    cells = _kw_partition(full, kernel, shuffle_parts(kfan))

    def merge(t: pa.Table) -> pa.Table:
        names = (
            "source",
            "n_pairs",
            "sum_m",
            "sum_m_sq",
            "sum_gap_s",
            "sum_gap_sq",
            "sum_m_gap",
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in names[1:]},
                }
            )
        g = t.group_by("s", use_threads=False).aggregate(
            [(c, "sum") for c in ("np_", "sm", "smm", "sg", "sgg", "smg")]
        )
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(ss)
        cols = {
            name: g[f"{src}_sum"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)[order]
            for name, src in zip(
                names[1:], ("np_", "sm", "smm", "sg", "sgg", "smg")
            )
        }
        return pa.table(
            {
                "source": srcs.take(pa.array(ss[order], pa.int64())),
                **{c: pa.array(a, pa.int64()) for c, a in cols.items()},
            }
        )

    return hash_partition_merge(cells, "s", merge, k=1)


def events_operating_window(sf_dir: str) -> Dataset:
    """E154: operating-window board — per source: active days, and the
    discrete p50 of each day's OPEN (first event's minute-of-day) and
    CLOSE (last event's) — the business-hours envelope (E110 finds
    each USER's modal hour, E121 measures the duty-cycle FRACTION,
    E93 the median event phase; E154 gives the daily span endpoints
    themselves — the numbers a maintenance scheduler, an SLA clock or
    a synthetic-load generator copies: a 9-to-17 envelope is office
    traffic, 0-to-1439 is a machine).  One dense row per source
    ALWAYS; exact int64 under the quantile_disc rank rule
    (per-day min/max + quantile_disc oracle).

    Scale shape — two bounded rounds on the E115 (source, day) cell
    discipline: batches pre-reduce to per-(source, day, batch) min/max
    partials; ONE (source, day)-hash exchange settles each day's true
    open/close, which immediately bincount into two 1440-bin
    histograms per source — only O(parts × sources × 1440) histogram
    rows reach the k=1 merge, where both quantiles read off one
    cumsum."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        ts = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
        )
        day = ts // 86_400_000_000
        mod = (ts // 60_000_000) % 1440
        sd = code * (1 << 40) + day
        u, idx = np.unique(sd, return_inverse=True)
        op = np.full(len(u), 1 << 60, np.int64)
        np.minimum.at(op, idx, mod)
        cl = np.zeros(len(u), np.int64)
        np.maximum.at(cl, idx, mod)
        return pa.table(
            {
                "sd": pa.array(u),
                "op": pa.array(op),
                "cl": pa.array(cl),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("s", "kind", "minute", "n")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by("sd", use_threads=False).aggregate(
            [("op", "min"), ("cl", "max")]
        )
        sd = g["sd"].combine_chunks().to_numpy(zero_copy_only=False)
        op = g["op_min"].combine_chunks().to_numpy(zero_copy_only=False)
        cl = g["cl_max"].combine_chunks().to_numpy(zero_copy_only=False)
        s = sd >> 40
        kop = (s * 2 + 0) * 1440 + op
        kcl = (s * 2 + 1) * 1440 + cl
        key = np.concatenate([kop, kcl])
        cnt = np.bincount(key, minlength=ns * 2 * 1440).astype(np.int64)
        keep = np.flatnonzero(cnt)
        return pa.table(
            {
                "s": pa.array(keep // (2 * 1440)),
                "kind": pa.array((keep // 1440) % 2),
                "minute": pa.array(keep % 1440),
                "n": pa.array(cnt[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("source", "n_days", "p50_open_minute", "p50_close_minute")
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[1:]},
                }
            )
        g = t.group_by(["s", "kind", "minute"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        kd = g["kind"].combine_chunks().to_numpy(zero_copy_only=False)
        mn = g["minute"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        rows = {"source": [], "n_days": [], "p50_open_minute": [],
                "p50_close_minute": []}
        for si in np.unique(ss):
            vals = {}
            nd = 0
            for kind in (0, 1):
                sel = (ss == si) & (kd == kind)
                m, c = mn[sel], nn[sel]
                order = np.argsort(m)
                m, c = m[order], c[order]
                tot = int(c.sum())
                thr = (tot * 500 + 999) // 1000
                vals[kind] = int(m[np.searchsorted(np.cumsum(c), thr)])
                nd = tot
            rows["source"].append(si)
            rows["n_days"].append(nd)
            rows["p50_open_minute"].append(vals[0])
            rows["p50_close_minute"].append(vals[1])
        return pa.table(
            {
                "source": srcs.take(pa.array(rows["source"], pa.int64())),
                "n_days": pa.array(rows["n_days"], pa.int64()),
                "p50_open_minute": pa.array(
                    rows["p50_open_minute"], pa.int64()
                ),
                "p50_close_minute": pa.array(
                    rows["p50_close_minute"], pa.int64()
                ),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "sd", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "s", merge, k=1)


def events_weekly_rhythm(sf_dir: str, lag_days: int = 7) -> Dataset:
    """E155: weekly-rhythm sufficient statistics — per source, over
    every pair of ACTIVE days exactly ``lag_days`` apart: n, Σx, Σx²,
    Σy, Σy², Σx·y with x = the earlier day's event count and y = the
    later's — the exact-int64 lag-7 autocovariance inputs, the
    SEASONALITY-STRENGTH detector none of the weekly boards give
    (E52/E104 average the week-shape, E112/E143 split weekpart,
    E125 tracks the peak hour; E155 measures how strongly this week
    predicts next week — the Pearson r at lag 7 reads off the sums,
    and a source with high weekly r but low daily r is calendar-driven
    traffic, exactly what a forecaster should model multiplicatively).
    Active-days-only semantics (a pair exists iff BOTH days have
    events — the self-join oracle's semantics).  One dense row per
    source ALWAYS.  Exact int64 (daily-count CTE + day+7 self-join
    oracle).

    Scale shape — two bounded rounds: batches pre-reduce to (source,
    day, n) partials; ONE (source, day)-hash exchange settles daily
    counts; the settled cells then ride a (source, day-range) window
    exchange, each cell emitted to its own window AND (when within
    lag_days of a boundary) to the window that needs it as a partner,
    so every pair is decided locally by one searchsorted and counted
    exactly once (only core rows probe); six-sum partials fold k=1."""
    from ..stages.shuffle import hash_partition_merge
    from ..stages.temporal import _kw_partition

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)
    WIN = 256  # days per window

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        day = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // 86_400_000_000
        )
        sd = code * (1 << 40) + day
        u, cnt = np.unique(sd, return_counts=True)
        return pa.table(
            {"sd": pa.array(u), "n": pa.array(cnt.astype(np.int64))}
        )

    def settle(t: pa.Table) -> pa.Table:
        cols = ("k", "w", "d", "x", "core")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by("sd", use_threads=False).aggregate([("n", "sum")])
        sd = g["sd"].combine_chunks().to_numpy(zero_copy_only=False)
        x = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        s = sd >> 40
        d = sd & ((1 << 40) - 1)
        w_core = d // WIN
        w_prev = (d - lag_days) // WIN  # the window that probes d
        halo = w_prev != w_core
        return pa.table(
            {
                "k": pa.array(np.concatenate([s, s[halo]])),
                "w": pa.array(np.concatenate([w_core, w_prev[halo]])),
                "d": pa.array(np.concatenate([d, d[halo]])),
                "x": pa.array(np.concatenate([x, x[halo]])),
                "core": pa.array(
                    np.concatenate(
                        [
                            np.ones(len(s), np.int64),
                            np.zeros(int(halo.sum()), np.int64),
                        ]
                    )
                ),
            }
        )

    cells = hash_partition_merge(
        partial_cells := ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        "sd",
        settle,
        k=_adaptive_k(sf_dir),
    )

    def kernel(t_: pa.Table) -> pa.Table:
        cols = ("s", "np_", "sx", "sxx", "sy", "syy", "sxy")
        if t_.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        kk = t_["k"].combine_chunks().to_numpy(zero_copy_only=False)
        dd = t_["d"].combine_chunks().to_numpy(zero_copy_only=False)
        xx = t_["x"].combine_chunks().to_numpy(zero_copy_only=False)
        co = t_["core"].combine_chunks().to_numpy(zero_copy_only=False)
        key = kk * (1 << 40) + dd
        order = np.argsort(key, kind="stable")
        key_s, x_s = key[order], xx[order]
        # core rows probe their day+lag partner (halo rows only serve)
        probe_sel = co == 1
        target = kk[probe_sel] * (1 << 40) + dd[probe_sel] + lag_days
        pos = np.searchsorted(key_s, target)
        ok = (pos < len(key_s)) & (
            key_s[np.minimum(pos, max(len(key_s) - 1, 0))] == target
        )
        x0 = xx[probe_sel][ok]
        y0 = x_s[pos[ok]]
        sc = kk[probe_sel][ok]
        ng = len(srcs)
        out = {
            "s": np.arange(ng, dtype=np.int64),
            "np_": np.bincount(sc, minlength=ng).astype(np.int64),
        }
        for name, arr in (
            ("sx", x0),
            ("sxx", x0 * x0),
            ("sy", y0),
            ("syy", y0 * y0),
            ("sxy", x0 * y0),
        ):
            acc = np.zeros(ng, np.int64)
            np.add.at(acc, sc, arr)
            out[name] = acc
        return pa.table({c: pa.array(a) for c, a in out.items()})

    from ..stages.shuffle import shuffle_parts

    pcells = _kw_partition(cells, kernel, shuffle_parts(_adaptive_k(sf_dir)))

    def merge(t: pa.Table) -> pa.Table:
        names = (
            "source",
            "n_pairs",
            "sum_x",
            "sum_x_sq",
            "sum_y",
            "sum_y_sq",
            "sum_xy",
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in names[1:]},
                }
            )
        g = t.group_by("s", use_threads=False).aggregate(
            [(c, "sum") for c in ("np_", "sx", "sxx", "sy", "syy", "sxy")]
        )
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(ss)
        cols = {
            name: g[f"{src}_sum"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)[order]
            for name, src in zip(
                names[1:], ("np_", "sx", "sxx", "sy", "syy", "sxy")
            )
        }
        return pa.table(
            {
                "source": srcs.take(pa.array(ss[order], pa.int64())),
                **{c: pa.array(a, pa.int64()) for c, a in cols.items()},
            }
        )

    return hash_partition_merge(pcells, "s", merge, k=1)


def events_coactivity(sf_dir: str) -> Dataset:
    """E156: source co-activity matrix — for every source pair (i < j):
    days BOTH were active, plus each side's own active-day count — the
    calendar-coupling read (E57 overlaps sources by shared USERS, E45
    correlates minute loads at lag 1; E156 asks the coarser operational
    question: do these feeds even run on the same days?  both/either
    ratios read off the row — a pair with high user overlap but low
    day co-activity is a migration, not a partnership, and a
    batch-job source shows near-zero co-activity with the 24/7 ones).
    Dense small output (pairs of sources); exact int64 (per-day
    distinct-source self-join oracle).

    Scale shape — ONE (day)-hash exchange over pre-reduced (source,
    day) cells: batches collapse to distinct cells per batch; all
    sources of a day land in one partition, so the day's pair
    incidences bincount locally into O(sources²) cells; per-source
    day totals ride the same exchange; the k=1 merge sums O(parts ×
    pairs) rows."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        day = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // 86_400_000_000
        )
        sd = code * (1 << 40) + day
        u = np.unique(sd)
        return pa.table(
            {
                "day": pa.array(u & ((1 << 40) - 1)),
                "s": pa.array(u >> 40),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("i", "j", "n")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        day = t["day"].combine_chunks().to_numpy(zero_copy_only=False)
        s = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
        sd = s * (1 << 40) + day
        u = np.unique(sd)
        ud, us = u & ((1 << 40) - 1), u >> 40
        order = np.argsort(ud, kind="stable")
        ud, us = ud[order], us[order]
        # per-day incidence matrix via bincount over day-local pairs
        brk = np.empty(len(ud), dtype=bool)
        if len(ud):
            brk[0] = True
            brk[1:] = ud[1:] != ud[:-1]
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(ud))
        pair_keys = []
        for a, b_ in zip(starts, ends):
            act = us[a:b_]
            if len(act) > 1:
                ii, jj = np.meshgrid(act, act, indexing="ij")
                sel = ii < jj
                pair_keys.append(ii[sel] * ns + jj[sel])
        # per-source day totals ride as (i, -1) rows
        own = np.bincount(us, minlength=ns).astype(np.int64)
        keep = np.flatnonzero(own)
        if pair_keys:
            pk = np.concatenate(pair_keys)
            cnt = np.bincount(pk, minlength=ns * ns).astype(np.int64)
            pk_keep = np.flatnonzero(cnt)
        else:
            cnt = np.zeros(0, np.int64)
            pk_keep = np.zeros(0, np.int64)
        return pa.table(
            {
                "i": pa.array(
                    np.concatenate([pk_keep // ns, keep]).astype(np.int64)
                ),
                "j": pa.array(
                    np.concatenate(
                        [pk_keep % ns, np.full(len(keep), -1, np.int64)]
                    )
                ),
                "n": pa.array(
                    np.concatenate([cnt[pk_keep], own[keep]]).astype(
                        np.int64
                    )
                ),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("source_i", "source_j", "days_both", "days_i", "days_j")
        if t.num_rows == 0:
            return pa.table(
                {
                    "source_i": pa.array([], pa.string()),
                    "source_j": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[2:]},
                }
            )
        g = t.group_by(["i", "j"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        ii = g["i"].combine_chunks().to_numpy(zero_copy_only=False)
        jj = g["j"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        own = np.zeros(ns, np.int64)
        ownsel = jj < 0
        own[ii[ownsel]] = nn[ownsel]
        psel = ~ownsel
        pi, pj, pn = ii[psel], jj[psel], nn[psel]
        # densify to ALL pairs (zero co-activity included)
        iu, ju = np.triu_indices(ns, k=1)
        both = np.zeros(len(iu), np.int64)
        if len(pi):
            flat = pi * ns + pj
            pos = np.searchsorted(iu * ns + ju, flat)
            both[pos] = pn
        return pa.table(
            {
                "source_i": srcs.take(pa.array(iu, pa.int64())),
                "source_j": srcs.take(pa.array(ju, pa.int64())),
                "days_both": pa.array(both),
                "days_i": pa.array(own[iu]),
                "days_j": pa.array(own[ju]),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "day", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "i", merge, k=1)


def events_arrival_interleaving(
    sf_dir: str, window_us: int = TEMPORAL_WINDOW_US
) -> Dataset:
    """E157: arrival-interleaving audit — walk the GLOBAL wall-clock
    order (all sources merged; ties by (event_id, source)) and, per
    source: events and maximal same-source RUNS plus the run permille
    — the stream-MIXING read on the time axis (E150 asks how producers
    share the id SPACE; E157 asks how they share the TAPE: near-1000
    permille is well-mixed live traffic, long runs are batch loaders
    or replay floods — exactly the skew that makes a time-ordered
    consumer's per-source buffers breathe in gulps, and the arrival
    twin of T122's tape source-mix drift).  One dense row per source
    ALWAYS; exact int64 (global lag-window oracle).

    Scale shape — E150's single-key carried-prefix machinery rotated
    onto the ts axis: rows tag (0, ts-window); windows spread across
    the (k, w)-hash partitions; one lexsort + one shifted
    source-compare per partition; carries hand each window its
    predecessor's source so boundary runs never double-count."""
    from ..stages.shuffle import hash_partition_merge, shuffle_parts
    from ..stages.temporal import _kw_partition

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    kfan = _adaptive_k(sf_dir)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id"],
        override_num_blocks=kfan,
    )

    def narrow(b: pa.Table) -> pa.Table:
        ts_us = (
            b["ts"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "k": pa.array(np.zeros(b.num_rows, np.int64)),
                "t": pa.array(ts_us, pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
                "v": pc.cast(
                    pc.index_in(b["event_type"], value_set=srcs), pa.int64()
                ),
                "carry": pa.array(np.zeros(b.num_rows, dtype=bool)),
                "w": pa.array(ts_us // window_us, pa.int64()),
            }
        )

    tagged = ds.map_batches(narrow, batch_format="pyarrow")
    carries = _last_event_carries(tagged)
    full = tagged.union(
        carries.map_batches(_tag_carry, batch_format="pyarrow")
    )

    def kernel(t_: pa.Table) -> pa.Table:
        cols = ("s", "ne", "nr")
        if t_.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        tt = t_["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t_["o"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = t_["v"].combine_chunks().to_numpy(zero_copy_only=False)
        cr = t_["carry"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cr, vv, oo, tt))
        vs, crs = vv[order], cr[order]
        n = len(order)
        pv = np.empty(n, dtype=np.int64)
        pv[0] = -1
        pv[1:] = vs[:-1]
        has_prev = np.empty(n, dtype=bool)
        has_prev[0] = False
        has_prev[1:] = True
        run_start = ~crs & (~has_prev | (vs != pv))
        ng = len(srcs)
        return pa.table(
            {
                "s": pa.array(np.arange(ng, dtype=np.int64)),
                "ne": pa.array(
                    np.bincount(vs[~crs], minlength=ng).astype(np.int64)
                ),
                "nr": pa.array(
                    np.bincount(vs[run_start], minlength=ng).astype(np.int64)
                ),
            }
        )

    cells = _kw_partition(full, kernel, shuffle_parts(kfan))

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_events": pa.array([], pa.int64()),
                    "n_runs": pa.array([], pa.int64()),
                    "runs_permille": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("s", use_threads=False).aggregate(
            [("ne", "sum"), ("nr", "sum")]
        )
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        ne = g["ne_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        nr = g["nr_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = ne > 0
        ss, ne, nr = ss[keep], ne[keep], nr[keep]
        order = np.argsort(ss)
        ss, ne, nr = ss[order], ne[order], nr[order]
        return pa.table(
            {
                "source": srcs.take(pa.array(ss, pa.int64())),
                "n_events": pa.array(ne, pa.int64()),
                "n_runs": pa.array(nr, pa.int64()),
                "runs_permille": pa.array(1000 * nr // ne, pa.int64()),
            }
        )

    return hash_partition_merge(cells, "s", merge, k=1)


def events_load_value_interaction(
    sf_dir: str, band_cap: int = 8
) -> Dataset:
    """E158: load-value interaction board — per (source, minute-load
    band): minutes at that load, events inside them, and those events'
    exact floored payload mass — does the money arrive in storms or in
    drizzle?  (E148 gives the load's own dynamics, E151 the value's
    clock, E149 couples value with the PRECEDING gap; E158 conditions
    payload on the CONCURRENT minute load — a value mass concentrated
    in band 1-2 minutes means big tickets ride quiet periods
    (settlement batches), mass in the top band means value scales with
    traffic (retail flow); the per-band mean divides out exactly).
    Band = min(minute's event count, band_cap).  Dense small output;
    exact int64 (per-minute CTE + LEAST + GROUP BY oracle).

    Scale shape — ONE (source, minute)-hash exchange over pre-reduced
    cells: each batch collapses to (source, minute, n, Σv) partials;
    a minute's partials co-locate, so its true load — and therefore
    its band — settles locally and the cell folds IN PLACE to
    (source, band) sums; the k=1 merge sums O(parts × sources ×
    bands) rows."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)
    nb = band_cap + 1

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        minute = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // 60_000_000
        )
        v = np.floor(
            b["value"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        sm = code * (1 << 40) + minute
        u, idx = np.unique(sm, return_inverse=True)
        n = np.bincount(idx).astype(np.int64)
        sv = np.zeros(len(u), np.int64)
        np.add.at(sv, idx, v)
        return pa.table(
            {"sm": pa.array(u), "n": pa.array(n), "sv": pa.array(sv)}
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("s", "band", "nm", "ne", "sv")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by("sm", use_threads=False).aggregate(
            [("n", "sum"), ("sv", "sum")]
        )
        sm = g["sm"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        sv = g["sv_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        s = sm >> 40
        band = np.minimum(n, band_cap)
        key = (s * nb + band).astype(np.int64)
        nm = np.bincount(key, minlength=ns * nb).astype(np.int64)
        ne = np.zeros(ns * nb, np.int64)
        np.add.at(ne, key, n)
        vs = np.zeros(ns * nb, np.int64)
        np.add.at(vs, key, sv)
        keep = np.flatnonzero(nm)
        return pa.table(
            {
                "s": pa.array(keep // nb),
                "band": pa.array(keep % nb),
                "nm": pa.array(nm[keep]),
                "ne": pa.array(ne[keep]),
                "sv": pa.array(vs[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = (
            "source",
            "load_band",
            "n_minutes",
            "n_events",
            "value_floor",
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[1:]},
                }
            )
        g = t.group_by(["s", "band"], use_threads=False).aggregate(
            [("nm", "sum"), ("ne", "sum"), ("sv", "sum")]
        )
        return pa.table(
            {
                "source": srcs.take(g["s"]),
                "load_band": pc.cast(g["band"], pa.int64()),
                "n_minutes": pc.cast(g["nm_sum"], pa.int64()),
                "n_events": pc.cast(g["ne_sum"], pa.int64()),
                "value_floor": pc.cast(g["sv_sum"], pa.int64()),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "sm", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "s", merge, k=1)


def events_adoption_order(sf_dir: str) -> Dataset:
    """E159: adoption-order matrix — for every source pair (i < j),
    over users active in BOTH: how many touched i first, j first, or
    both in the same instant (first-seen compared by (ts, event_id);
    exact ties are 'simultaneous') — the funnel TOPOLOGY read (E57
    counts the shared audience, E105 measures adoption LATENCY within
    a funnel; E159 recovers the direction of the funnel itself from
    data: if 90% of shared users touched i first, i is the front door
    and j the upsell — the ordering a growth model should condition
    on, discovered rather than assumed).  Dense small output (source
    pairs); exact int64 (min-per-(user, source) + pair self-join
    oracle).

    Scale shape — two bounded rounds: batches pre-reduce each (source,
    user)'s earliest (ts, id) locally; ONE user-hash exchange settles
    global first-seens — and because ALL of a user's cells co-locate,
    each user's pair comparisons resolve in partition and bincount
    into O(sources²) counter cells; the k=1 merge sums O(parts ×
    pairs) rows.  Nothing corpus-sized crosses partitions twice."""
    from ..stages.shuffle import hash_partition_merge, shuffle_parts

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def batch_first(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        ts = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
        )
        eid = (
            pc.cast(b["event_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        uid = (
            pc.cast(b["user_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        order = np.lexsort((eid, ts, code, uid))
        us, cs = uid[order], code[order]
        first = np.empty(len(order), dtype=bool)
        if len(order):
            first[0] = True
            first[1:] = (us[1:] != us[:-1]) | (cs[1:] != cs[:-1])
        sel = order[first]
        return pa.table(
            {
                "u": pa.array(uid[sel]),
                "s": pa.array(code[sel]),
                "ts": pa.array(ts[sel]),
                "eid": pa.array(eid[sel]),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("i", "j", "nb", "ni", "nj", "nsim")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        uu = t["u"].combine_chunks().to_numpy(zero_copy_only=False)
        ss = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = t["ts"].combine_chunks().to_numpy(zero_copy_only=False)
        eid = t["eid"].combine_chunks().to_numpy(zero_copy_only=False)
        # settle first-seen per (user, source) across batch partials
        order = np.lexsort((eid, ts, ss, uu))
        us, cs = uu[order], ss[order]
        first = np.empty(len(order), dtype=bool)
        first[0] = True
        first[1:] = (us[1:] != us[:-1]) | (cs[1:] != cs[:-1])
        sel = order[first]
        uu, ss, ts, eid = uu[sel], ss[sel], ts[sel], eid[sel]
        # per user: compare every source pair — vectorized over users
        # via a dense (users × sources) first-seen pivot (ns is tiny)
        uniq_u, uidx = np.unique(uu, return_inverse=True)
        nu = len(uniq_u)
        BIG = np.iinfo(np.int64).max
        mat_t = np.full((nu, ns), BIG, np.int64)
        mat_e = np.full((nu, ns), BIG, np.int64)
        mat_t[uidx, ss] = ts
        mat_e[uidx, ss] = eid
        npair = ns * ns
        nb = np.zeros(npair, np.int64)
        ni = np.zeros(npair, np.int64)
        nj = np.zeros(npair, np.int64)
        nsim = np.zeros(npair, np.int64)
        for x in range(ns):
            for y in range(x + 1, ns):
                both = (mat_t[:, x] != BIG) & (mat_t[:, y] != BIG)
                tx, ty = mat_t[both, x], mat_t[both, y]
                ex, ey = mat_e[both, x], mat_e[both, y]
                xi = (tx < ty) | ((tx == ty) & (ex < ey))
                yi = (tx > ty) | ((tx == ty) & (ex > ey))
                key = x * ns + y
                nb[key] = int(both.sum())
                ni[key] = int(xi.sum())
                nj[key] = int(yi.sum())
                nsim[key] = nb[key] - ni[key] - nj[key]
        keep = np.flatnonzero(nb)
        return pa.table(
            {
                "i": pa.array(keep // ns),
                "j": pa.array(keep % ns),
                "nb": pa.array(nb[keep]),
                "ni": pa.array(ni[keep]),
                "nj": pa.array(nj[keep]),
                "nsim": pa.array(nsim[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = (
            "source_i",
            "source_j",
            "users_both",
            "i_first",
            "j_first",
            "simultaneous",
        )
        iu, ju = np.triu_indices(ns, k=1)
        nb = np.zeros(len(iu), np.int64)
        ni = np.zeros(len(iu), np.int64)
        nj = np.zeros(len(iu), np.int64)
        nsim = np.zeros(len(iu), np.int64)
        if t.num_rows:
            g = t.group_by(["i", "j"], use_threads=False).aggregate(
                [("nb", "sum"), ("ni", "sum"), ("nj", "sum"), ("nsim", "sum")]
            )
            gi = g["i"].combine_chunks().to_numpy(zero_copy_only=False)
            gj = g["j"].combine_chunks().to_numpy(zero_copy_only=False)
            pos = np.searchsorted(iu * ns + ju, gi * ns + gj)
            nb[pos] = g["nb_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            ni[pos] = g["ni_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            nj[pos] = g["nj_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            nsim[pos] = g["nsim_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
        return pa.table(
            {
                "source_i": srcs.take(pa.array(iu, pa.int64())),
                "source_j": srcs.take(pa.array(ju, pa.int64())),
                "users_both": pa.array(nb),
                "i_first": pa.array(ni),
                "j_first": pa.array(nj),
                "simultaneous": pa.array(nsim),
            }
        )

    cells = hash_partition_merge(
        ds.map_batches(batch_first, batch_format="pyarrow"),
        "u",
        fold,
        k=shuffle_parts(_adaptive_k(sf_dir)),
    )
    return hash_partition_merge(cells, "i", merge, k=1)


def events_session_clock(sf_dir: str, gap_s: int = 6 * 3600) -> Dataset:
    """E160: session clock-duration board — per hour-of-day of session
    START: sessions, their exact total duration in floor-seconds, and
    Σduration² — do evening sessions run longer than morning ones?
    (E50 distributes durations globally, E122 clocks the AUDIENCE,
    E131 counts midnight CROSSINGS; E160 couples the two axes: mean
    and variance per start-hour divide out of the sums, and the
    engagement-quality-by-daypart read prices push-notification
    timing).  Single-event sessions count with duration 0.  Dense
    small output (≤24 rows); exact int64 (the E15 sessions CTE +
    extract(hour) + SUM oracle).

    Scale shape — pure composition over the scale-safe E15 sessionize
    stage ((key, window)+halo partitioning, associative interval
    fold); the session rows it emits are already corpus-small, and one
    bincount per batch reduces them to 24-cell partials for the k=1
    merge."""
    from ..stages.shuffle import hash_partition_merge

    sessions = events_sessions(sf_dir, gap_s=gap_s).select_columns(
        ["start_ts", "end_ts"]
    )

    def partial(b: pa.Table) -> pa.Table:
        st = (
            b["start_ts"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        en = (
            b["end_ts"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        hour = (st // 3_600_000_000) % 24
        d = (en - st) // 1_000_000
        n = np.bincount(hour, minlength=24).astype(np.int64)
        sd = np.zeros(24, np.int64)
        np.add.at(sd, hour, d)
        sdd = np.zeros(24, np.int64)
        np.add.at(sdd, hour, d * d)
        keep = np.flatnonzero(n)
        return pa.table(
            {
                "h": pa.array(keep),
                "n": pa.array(n[keep]),
                "sd": pa.array(sd[keep]),
                "sdd": pa.array(sdd[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("start_hour", "n_sessions", "sum_dur_s", "sum_dur_sq")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by("h", use_threads=False).aggregate(
            [("n", "sum"), ("sd", "sum"), ("sdd", "sum")]
        )
        return pa.table(
            {
                "start_hour": pc.cast(g["h"], pa.int64()),
                "n_sessions": pc.cast(g["n_sum"], pa.int64()),
                "sum_dur_s": pc.cast(g["sd_sum"], pa.int64()),
                "sum_dur_sq": pc.cast(g["sdd_sum"], pa.int64()),
            }
        )

    partials = sessions.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "h", merge, k=1)


def events_payload_persistence(
    sf_dir: str, window_us: int = TEMPORAL_WINDOW_US
) -> Dataset:
    """E161: payload-persistence sufficient statistics — per source,
    over adjacent event pairs in (ts, event_id) order: n, Σx, Σx²,
    Σy, Σy², Σx·y with x = the EARLIER event's floored value and y =
    the LATER's — the exact-int64 lag-1 autocovariance of the payload
    stream ("is the next reading predictable from the last"), the
    persistence read none of the payload boards carry (E97 trends
    value against WALL TIME, E149 couples it with the preceding GAP,
    E140 counts exactly-equal runs; E161 measures smooth drift vs
    white noise — the number that decides whether E6's
    delta-of-delta encoding or a last-value-carried-forward imputation
    will actually work on this source).  One dense row per source
    ALWAYS.  Int64 bound documented (the E97 discipline): v ≤ 10⁶ →
    Σx·y holds ~9·10⁶ pairs/source per epoch shard.  Exact int64
    (lag-window oracle; ties break by (event_id, value) both sides).

    Scale shape — E149's carried-prefix machinery verbatim: two narrow
    carry exchanges, one lexsort + one shifted-multiply kernel per
    (source, ts-window) partition, six-sum partials folded k=1."""
    from ..stages.shuffle import hash_partition_merge, shuffle_parts
    from ..stages.temporal import _kw_partition

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    kfan = _adaptive_k(sf_dir)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
        override_num_blocks=kfan,
    )

    def narrow(b: pa.Table) -> pa.Table:
        ts_us = (
            b["ts"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "k": pc.cast(
                    pc.index_in(b["event_type"], value_set=srcs), pa.int64()
                ),
                "t": pa.array(ts_us, pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
                "v": pc.cast(pc.floor(b["value"]), pa.int64()),
                "carry": pa.array(np.zeros(b.num_rows, dtype=bool)),
                "w": pa.array(ts_us // window_us, pa.int64()),
            }
        )

    tagged = ds.map_batches(narrow, batch_format="pyarrow")
    carries = _last_event_carries(tagged)
    full = tagged.union(
        carries.map_batches(_tag_carry, batch_format="pyarrow")
    )

    def kernel(t_: pa.Table) -> pa.Table:
        cols = ("s", "np_", "sx", "sxx", "sy", "syy", "sxy")
        if t_.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        kk = t_["k"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t_["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t_["o"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = t_["v"].combine_chunks().to_numpy(zero_copy_only=False)
        cr = t_["carry"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cr, vv, oo, tt, kk))
        ks, vs, crs = kk[order], vv[order], cr[order]
        n = len(order)
        has_prev = np.empty(n, dtype=bool)
        has_prev[0] = False
        has_prev[1:] = ks[1:] == ks[:-1]
        pv = np.empty(n, dtype=np.int64)
        pv[0] = 0
        pv[1:] = vs[:-1]
        pair = has_prev & ~crs
        x = np.where(pair, pv, 0)
        y = np.where(pair, vs, 0)
        ng = len(srcs)
        out = {
            "s": np.arange(ng, dtype=np.int64),
            "np_": np.bincount(ks[pair], minlength=ng).astype(np.int64),
        }
        for name, arr in (
            ("sx", x),
            ("sxx", x * x),
            ("sy", y),
            ("syy", y * y),
            ("sxy", x * y),
        ):
            acc = np.zeros(ng, np.int64)
            np.add.at(acc, ks, arr)
            out[name] = acc
        return pa.table({c: pa.array(a) for c, a in out.items()})

    cells = _kw_partition(full, kernel, shuffle_parts(kfan))

    def merge(t: pa.Table) -> pa.Table:
        names = (
            "source",
            "n_pairs",
            "sum_x",
            "sum_x_sq",
            "sum_y",
            "sum_y_sq",
            "sum_xy",
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in names[1:]},
                }
            )
        g = t.group_by("s", use_threads=False).aggregate(
            [(c, "sum") for c in ("np_", "sx", "sxx", "sy", "syy", "sxy")]
        )
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(ss)
        cols = {
            name: g[f"{src}_sum"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)[order]
            for name, src in zip(
                names[1:], ("np_", "sx", "sxx", "sy", "syy", "sxy")
            )
        }
        return pa.table(
            {
                "source": srcs.take(pa.array(ss[order], pa.int64())),
                **{c: pa.array(a, pa.int64()) for c, a in cols.items()},
            }
        )

    return hash_partition_merge(cells, "s", merge, k=1)


def events_crowd_density(sf_dir: str) -> Dataset:
    """E162: minute crowd-density coupling — per source, over its
    active minutes: n_minutes, Σe, Σe², Σu, Σu², Σe·u with e = the
    minute's event count and u = its DISTINCT user count — the
    exact-int64 inputs of the events-vs-audience regression ("is load
    crowd or obsession"): e/u ≈ 1 means broad organic traffic, e ≫ u
    a few users hammering — the bot/flash-mob discriminator (E113
    counts concurrent SOURCES, E77 ranks minutes by users, E119
    distributes per-user bursts; none couples the two counts on the
    same minute).  One dense row per source ALWAYS.  Int64 bound
    documented: e, u ≤ 10⁶/minute → Σe·u holds ~9·10⁶ minutes/source
    per epoch shard.  Exact int64 (per-minute COUNT + COUNT DISTINCT
    + SUM oracle).

    Scale shape — ONE (source, minute)-hash exchange over distinct
    (source, minute, user, n) cells (batches pre-reduce with one
    np.unique): a minute's cells co-locate, so its event count AND
    distinct-user count settle locally and the six products fold IN
    PLACE to per-source sums; the k=1 merge sums O(parts × sources)
    rows."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        minute = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // 60_000_000
        )
        uid = (
            pc.cast(b["user_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        key = np.stack([code * (1 << 40) + minute, uid], axis=1)
        u, cnt = np.unique(key, axis=0, return_counts=True)
        return pa.table(
            {
                "sm": pa.array(u[:, 0]),
                "u": pa.array(u[:, 1]),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("s", "nm", "se", "see", "su", "suu", "seu")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by(["sm", "u"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        sm = g["sm"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        um, idx = np.unique(sm, return_inverse=True)
        e = np.zeros(len(um), np.int64)
        np.add.at(e, idx, n)
        uc = np.bincount(idx).astype(np.int64)
        s = um >> 40
        out = {"s": np.arange(ns, dtype=np.int64)}
        out["nm"] = np.bincount(s, minlength=ns).astype(np.int64)
        for name, arr in (
            ("se", e),
            ("see", e * e),
            ("su", uc),
            ("suu", uc * uc),
            ("seu", e * uc),
        ):
            acc = np.zeros(ns, np.int64)
            np.add.at(acc, s, arr)
            out[name] = acc
        return pa.table({c: pa.array(a) for c, a in out.items()})

    cells = hash_partition_merge(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "sm",
        fold,
        k=_adaptive_k(sf_dir),
    )

    def merge(t: pa.Table) -> pa.Table:
        names = (
            "source",
            "n_minutes",
            "sum_e",
            "sum_e_sq",
            "sum_u",
            "sum_u_sq",
            "sum_e_u",
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in names[1:]},
                }
            )
        g = t.group_by("s", use_threads=False).aggregate(
            [(c, "sum") for c in ("nm", "se", "see", "su", "suu", "seu")]
        )
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(ss)
        cols = {
            name: g[f"{src}_sum"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)[order]
            for name, src in zip(
                names[1:], ("nm", "se", "see", "su", "suu", "seu")
            )
        }
        keep = cols["n_minutes"] > 0
        return pa.table(
            {
                "source": srcs.take(pa.array(ss[order][keep], pa.int64())),
                **{
                    c: pa.array(a[keep], pa.int64()) for c, a in cols.items()
                },
            }
        )

    return hash_partition_merge(cells, "s", merge, k=1)


def events_microburst(sf_dir: str, band_cap: int = 8) -> Dataset:
    """E163: second-level microburst histogram — per (source,
    per-second load band): seconds at that load and events inside them
    (band = min(events-in-second, band_cap)) — the flush-cadence read
    below the minute grid (E135 detects timestamp QUANTIZATION, E119
    bursts per USER-minute, E158 couples minute load with value; E163
    asks how the traffic packs into SECONDS: an all-band-1 profile is
    a smooth stream, mass in the top band is batch flushes landing on
    one timestamp — exactly the shape that decides whether a
    per-second rate limiter or consumer batch size will hiccup).
    Dense small output (sources × ≤band_cap+1); exact int64
    (per-second CTE + LEAST + GROUP BY oracle).

    Scale shape — E158's ONE (source, second)-hash exchange: batches
    pre-reduce to (source, second, n) cells; a second's partials
    co-locate, settle, band, and collapse IN PLACE; the k=1 merge
    sums O(parts × sources × bands) rows."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)
    nb = band_cap + 1

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        sec = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // 1_000_000
        )
        ss = code * (1 << 40) + sec
        u, cnt = np.unique(ss, return_counts=True)
        return pa.table(
            {"ss": pa.array(u), "n": pa.array(cnt.astype(np.int64))}
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("s", "band", "nsec", "ne")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by("ss", use_threads=False).aggregate([("n", "sum")])
        ss = g["ss"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        s = ss >> 40
        band = np.minimum(n, band_cap)
        key = (s * nb + band).astype(np.int64)
        nsec = np.bincount(key, minlength=ns * nb).astype(np.int64)
        ne = np.zeros(ns * nb, np.int64)
        np.add.at(ne, key, n)
        keep = np.flatnonzero(nsec)
        return pa.table(
            {
                "s": pa.array(keep // nb),
                "band": pa.array(keep % nb),
                "nsec": pa.array(nsec[keep]),
                "ne": pa.array(ne[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("source", "load_band", "n_seconds", "n_events")
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[1:]},
                }
            )
        g = t.group_by(["s", "band"], use_threads=False).aggregate(
            [("nsec", "sum"), ("ne", "sum")]
        )
        return pa.table(
            {
                "source": srcs.take(g["s"]),
                "load_band": pc.cast(g["band"], pa.int64()),
                "n_seconds": pc.cast(g["nsec_sum"], pa.int64()),
                "n_events": pc.cast(g["ne_sum"], pa.int64()),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "ss", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "s", merge, k=1)


def events_coverage_drift(sf_dir: str) -> Dataset:
    """E164: coverage-drift sufficient statistics — per source, over
    its active ISO-ish weeks (epoch-day // 7): n_weeks, Σw, Σw², Σm,
    Σm², Σw·m with w = the week index and m = the week's ACTIVE MINUTE
    count — the exact-int64 duty-cycle trend ("is this feed thinning
    out"), the slow-decay detector none of the coverage boards carry
    (E58 reports coverage once, E121 distributes the duty cycle, E75
    finds minute-scale ramps; a dying sensor loses active minutes week
    over week long before it goes silent, and the OLS slope of m on w
    reads it off these sums).  One dense row per source ALWAYS.  Int64
    bound documented: w ≤ ~3·10³ (half a century), m ≤ 10⁴/week →
    Σw·m holds ~3·10¹¹ weeks/source.  Exact int64 (distinct-minute
    CTE + week GROUP BY + SUM oracle).

    Scale shape — two bounded rounds: batches pre-reduce to distinct
    (source, minute) cells; ONE (source, week)-hash exchange settles
    each week's active-minute count (a week's minutes co-locate);
    six-sum partials fold k=1."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        minute = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // 60_000_000
        )
        sm = code * (1 << 40) + minute
        u = np.unique(sm)
        week = (u & ((1 << 40) - 1)) // (1440 * 7)
        return pa.table(
            {
                "sw": pa.array((u >> 40) * (1 << 40) + week),
                "m": pa.array(u & ((1 << 40) - 1)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("s", "nw", "sw_", "sww", "sm", "smm", "swm")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        sw = t["sw"].combine_chunks().to_numpy(zero_copy_only=False)
        m = t["m"].combine_chunks().to_numpy(zero_copy_only=False)
        # dedupe on (source-week, minute-within-week): the week index is
        # already inside sw, so the 14-bit relative minute is collision-free
        rel = m % (1440 * 7)
        u = np.unique(sw * (1 << 14) + rel)
        usw = u >> 14
        uw, idx = np.unique(usw, return_inverse=True)
        mcnt = np.bincount(idx).astype(np.int64)
        s = uw >> 40
        w = uw & ((1 << 40) - 1)
        out = {"s": np.arange(ns, dtype=np.int64)}
        out["nw"] = np.bincount(s, minlength=ns).astype(np.int64)
        for name, arr in (
            ("sw_", w),
            ("sww", w * w),
            ("sm", mcnt),
            ("smm", mcnt * mcnt),
            ("swm", w * mcnt),
        ):
            acc = np.zeros(ns, np.int64)
            np.add.at(acc, s, arr)
            out[name] = acc
        return pa.table({c: pa.array(a) for c, a in out.items()})

    cells = hash_partition_merge(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "sw",
        fold,
        k=_adaptive_k(sf_dir),
    )

    def merge(t: pa.Table) -> pa.Table:
        names = (
            "source",
            "n_weeks",
            "sum_w",
            "sum_w_sq",
            "sum_m",
            "sum_m_sq",
            "sum_w_m",
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in names[1:]},
                }
            )
        g = t.group_by("s", use_threads=False).aggregate(
            [(c, "sum") for c in ("nw", "sw_", "sww", "sm", "smm", "swm")]
        )
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(ss)
        cols = {
            name: g[f"{src}_sum"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)[order]
            for name, src in zip(
                names[1:], ("nw", "sw_", "sww", "sm", "smm", "swm")
            )
        }
        keep = cols["n_weeks"] > 0
        return pa.table(
            {
                "source": srcs.take(pa.array(ss[order][keep], pa.int64())),
                **{
                    c: pa.array(a[keep], pa.int64()) for c, a in cols.items()
                },
            }
        )

    return hash_partition_merge(cells, "s", merge, k=1)


def events_daily_opener(sf_dir: str) -> Dataset:
    """E165: daily-opener census — for every calendar day, find the
    tape's FIRST event (min (ts, event_id, source) — deterministic
    under ties) and count per source: days it opened the tape, next to
    its active-day count — the "who wakes first" read (E73 names each
    SESSION's entry type, E154 gives each source's own open time; E165
    ranks the sources against each other at the day boundary: a
    source that opens most days is the upstream scheduler's first job
    — its failure delays everyone — and a shift in the opener mix is
    a cron-reorder fingerprint E137 can't see).  One dense row per
    source ALWAYS; exact int64 (row_number-per-day oracle).

    Scale shape — ONE day-hash exchange over per-batch argmin cells:
    each batch keeps one candidate (first event) per (day) AND its
    per-source active-day marks; a day's candidates co-locate, so the
    true opener settles locally; the k=1 merge sums O(parts ×
    sources) rows."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        ts = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
        )
        eid = (
            pc.cast(b["event_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        day = ts // 86_400_000_000
        # batch-local opener per day
        order = np.lexsort((code, eid, ts, day))
        ds_ = day[order]
        first = np.empty(len(order), dtype=bool)
        if len(order):
            first[0] = True
            first[1:] = ds_[1:] != ds_[:-1]
        sel = order[first]
        # per-(source, day) active marks (distinct)
        sd = np.unique(code * (1 << 40) + day)
        return pa.table(
            {
                "day": pa.array(
                    np.concatenate([day[sel], sd & ((1 << 40) - 1)])
                ),
                "s": pa.array(
                    np.concatenate([code[sel], sd >> 40])
                ),
                "ts": pa.array(
                    np.concatenate(
                        [ts[sel], np.full(len(sd), -1, np.int64)]
                    )
                ),
                "eid": pa.array(
                    np.concatenate(
                        [eid[sel], np.zeros(len(sd), np.int64)]
                    )
                ),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("s", "nopen", "nactive")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        day = t["day"].combine_chunks().to_numpy(zero_copy_only=False)
        s = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = t["ts"].combine_chunks().to_numpy(zero_copy_only=False)
        eid = t["eid"].combine_chunks().to_numpy(zero_copy_only=False)
        cand = ts >= 0
        # settle the opener per day among candidates
        cd, cs, ct, ce = day[cand], s[cand], ts[cand], eid[cand]
        order = np.lexsort((cs, ce, ct, cd))
        ds_, ss_ = cd[order], cs[order]
        first = np.empty(len(order), dtype=bool)
        if len(order):
            first[0] = True
            first[1:] = ds_[1:] != ds_[:-1]
        nopen = np.bincount(ss_[first], minlength=ns).astype(np.int64)
        # active days: distinct (s, day) marks (marks are pre-distinct
        # per batch; dedupe across batches)
        md, ms = day[~cand], s[~cand]
        sd = np.unique(ms * (1 << 40) + md)
        nactive = np.bincount(sd >> 40, minlength=ns).astype(np.int64)
        return pa.table(
            {
                "s": pa.array(np.arange(ns, dtype=np.int64)),
                "nopen": pa.array(nopen),
                "nactive": pa.array(nactive),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "days_opened": pa.array([], pa.int64()),
                    "days_active": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("s", use_threads=False).aggregate(
            [("nopen", "sum"), ("nactive", "sum")]
        )
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        no = g["nopen_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        na = g["nactive_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = na > 0
        ss, no, na = ss[keep], no[keep], na[keep]
        order = np.argsort(ss)
        ss, no, na = ss[order], no[order], na[order]
        return pa.table(
            {
                "source": srcs.take(pa.array(ss, pa.int64())),
                "days_opened": pa.array(no, pa.int64()),
                "days_active": pa.array(na, pa.int64()),
            }
        )

    cells = hash_partition_merge(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "day",
        fold,
        k=_adaptive_k(sf_dir),
    )
    return hash_partition_merge(cells, "s", merge, k=1)


def events_user_namespace(sf_dir: str) -> Dataset:
    """E166: user-id namespace audit — per source: distinct users, the
    smallest and largest user id, and the id-range density permille
    (1000·distinct/(max−min+1)) — the user-SPACE topology read (E57
    counts SHARED users, E152 checks id assignment against arrival
    order; E166 asks whether sources draw from one shared user pool or
    own disjoint id segments: near-disjoint dense ranges are
    per-source namespaces — joining "the same user" across them is a
    bug — while interleaved sparse ranges are one global registry).
    One dense row per source ALWAYS; exact int64 (COUNT DISTINCT +
    MIN/MAX oracle).

    Scale shape — ONE user-hash exchange over distinct (source, user)
    cells (batches pre-reduce with one np.unique): distinct counts per
    source sum exactly across partitions (a user's cells co-locate,
    deduped there), min/max fold associatively; the k=1 merge sums
    O(parts × sources) rows."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        uid = (
            pc.cast(b["user_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        key = np.stack([uid, code], axis=1)
        u = np.unique(key, axis=0)
        return pa.table(
            {
                "u": pa.array(u[:, 0].astype(np.int64)),
                "s": pa.array(u[:, 1].astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("s", "nu", "mn", "mx")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        uu = t["u"].combine_chunks().to_numpy(zero_copy_only=False)
        ss = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
        key = np.unique(uu * 64 + ss)  # ns is tiny; pack is safe
        us, sc = key // 64, key % 64
        nu = np.bincount(sc, minlength=ns).astype(np.int64)
        mn = np.full(ns, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, sc, us)
        mx = np.full(ns, np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, sc, us)
        keep = np.flatnonzero(nu)
        return pa.table(
            {
                "s": pa.array(keep),
                "nu": pa.array(nu[keep]),
                "mn": pa.array(mn[keep]),
                "mx": pa.array(mx[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = (
            "source",
            "n_users",
            "min_user_id",
            "max_user_id",
            "density_permille",
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[1:]},
                }
            )
        g = t.group_by("s", use_threads=False).aggregate(
            [("nu", "sum"), ("mn", "min"), ("mx", "max")]
        )
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        nu = g["nu_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        mn = g["mn_min"].combine_chunks().to_numpy(zero_copy_only=False)
        mx = g["mx_max"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(ss)
        ss, nu, mn, mx = ss[order], nu[order], mn[order], mx[order]
        span = mx - mn + 1
        return pa.table(
            {
                "source": srcs.take(pa.array(ss, pa.int64())),
                "n_users": pa.array(nu, pa.int64()),
                "min_user_id": pa.array(mn, pa.int64()),
                "max_user_id": pa.array(mx, pa.int64()),
                "density_permille": pa.array(
                    1000 * nu // np.maximum(span, 1), pa.int64()
                ),
            }
        )

    cells = hash_partition_merge(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "u",
        fold,
        k=_adaptive_k(sf_dir),
    )
    return hash_partition_merge(cells, "s", merge, k=1)


def events_id_collision(sf_dir: str) -> Dataset:
    """E167: event-id cross-source collision audit — corpus-wide:
    events, distinct event ids, ids used by MORE THAN ONE source, the
    worst source fan-out, and ids used more than once ANYWHERE — the
    global uniqueness contract check (E114 audits each source's id
    sequence in isolation, E150 how sources share the id SPACE, T159
    the documents table's ids; E167 asks whether event_id is actually
    a global key: a cross-source collision breaks every id-keyed
    dedup, ack and idempotency path the reference's consumer relies
    on).  ONE dense row ALWAYS, zero-defect on honest assignment.
    Exact int64 (GROUP BY id + COUNT DISTINCT oracle).

    Scale shape — ONE id-hash exchange over pre-reduced (id, source,
    n) cells: an id's cells co-locate, so multiplicity and fan-out
    settle locally and collapse to one counter row per partition; the
    k=1 merge sums O(parts) rows."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "event_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        eid = (
            pc.cast(b["event_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        key = np.stack([eid, code], axis=1)
        u, cnt = np.unique(key, axis=0, return_counts=True)
        return pa.table(
            {
                "id": pa.array(u[:, 0].astype(np.int64)),
                "src": pa.array(u[:, 1].astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("g", "ne", "nid", "nxs", "mf", "ndup")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by(["id", "src"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        ids = g["id"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        u, idx = np.unique(ids, return_inverse=True)
        mult = np.zeros(len(u), np.int64)
        np.add.at(mult, idx, n)
        nsrc = np.bincount(idx).astype(np.int64)
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "ne": pa.array([int(n.sum())], pa.int64()),
                "nid": pa.array([len(u)], pa.int64()),
                "nxs": pa.array([int((nsrc > 1).sum())], pa.int64()),
                "mf": pa.array(
                    [int(nsrc.max()) if len(nsrc) else 0], pa.int64()
                ),
                "ndup": pa.array([int((mult > 1).sum())], pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = (
            "n_events",
            "n_distinct_ids",
            "n_cross_source_ids",
            "max_source_fanout",
            "n_dup_ids",
        )
        if t.num_rows == 0:
            return pa.table({c: pa.array([0], pa.int64()) for c in out})
        vals = {
            "n_events": pa.array([int(pc.sum(t["ne"]).as_py())], pa.int64()),
            "n_distinct_ids": pa.array(
                [int(pc.sum(t["nid"]).as_py())], pa.int64()
            ),
            "n_cross_source_ids": pa.array(
                [int(pc.sum(t["nxs"]).as_py())], pa.int64()
            ),
            "max_source_fanout": pa.array(
                [int(pc.max(t["mf"]).as_py())], pa.int64()
            ),
            "n_dup_ids": pa.array(
                [int(pc.sum(t["ndup"]).as_py())], pa.int64()
            ),
        }
        return pa.table(vals)

    cells = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    folded = hash_partition_merge(cells, "id", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(folded, "g", merge, k=1)


def events_user_clock_coherence(sf_dir: str) -> Dataset:
    """E168: user clock-coherence histogram — per user, walk their own
    event stream in EVENT-ID order and compute the inversion permille
    (pairs whose timestamp retreats, E147's read at user grain), then
    histogram the user POPULATION by permille decile (band =
    permille // 100; users with <2 events are excluded) — which slice
    of the audience has a broken clock (E147 blames the SOURCE
    pipeline; E168 separates a few bad devices — a small fat-band
    population — from systemic skew smeared across everyone, which is
    the triage fork between "recall the firmware" and "fix the
    ingestion").  Dense small output (≤11 bands); exact int64
    (per-user lag + permille + GROUP BY oracle).

    Scale shape — ONE user-hash exchange of narrow (user, id, ts)
    rows: each partition lexsorts its complete users once, adjacent
    same-user inversions count in place, per-user permilles bincount
    IN PLACE to band partials; the k=1 merge sums O(parts × 11)
    rows."""
    from ..stages.shuffle import hash_partition_merge

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def narrow(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": pc.cast(b["user_id"], pa.int64()),
                "t": pc.cast(b["event_id"], pa.int64()),
                "ts": b["ts"].cast(pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("band", "nu", "np_")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        u = t["u"].combine_chunks().to_numpy(zero_copy_only=False)
        eid = t["t"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = t["ts"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, eid, u))
        us, tss = u[order], ts[order]
        n = len(order)
        has_prev = np.empty(n, dtype=bool)
        has_prev[0] = False
        has_prev[1:] = us[1:] == us[:-1]
        pt = np.empty(n, dtype=np.int64)
        pt[0] = 0
        pt[1:] = tss[:-1]
        inv = has_prev & (tss < pt)
        uu, idx = np.unique(us, return_inverse=True)
        npr = np.zeros(len(uu), np.int64)
        np.add.at(npr, idx, has_prev.astype(np.int64))
        ninv = np.zeros(len(uu), np.int64)
        np.add.at(ninv, idx, inv.astype(np.int64))
        keep = npr > 0
        npr, ninv = npr[keep], ninv[keep]
        band = 1000 * ninv // npr // 100
        ub, bidx = np.unique(band, return_inverse=True)
        nu = np.bincount(bidx).astype(np.int64)
        np_ = np.zeros(len(ub), np.int64)
        np.add.at(np_, bidx, npr)
        return pa.table(
            {
                "band": pa.array(ub),
                "nu": pa.array(nu),
                "np_": pa.array(np_),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("inversion_band", "n_users", "n_pairs")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by("band", use_threads=False).aggregate(
            [("nu", "sum"), ("np_", "sum")]
        )
        return pa.table(
            {
                "inversion_band": pc.cast(g["band"], pa.int64()),
                "n_users": pc.cast(g["nu_sum"], pa.int64()),
                "n_pairs": pc.cast(g["np__sum"], pa.int64()),
            }
        )

    cells = hash_partition_merge(
        ds.map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True),
        "u",
        fold,
        k=_adaptive_k(sf_dir),
    )
    return hash_partition_merge(cells, "band", merge, k=1)


def events_value_comovement(sf_dir: str) -> Dataset:
    """E169: value co-movement matrix — for every source pair (i < j),
    over calendar days where EITHER is active (absent side counts 0):
    n_days, Σx, Σy, Σx², Σy², Σx·y with x/y = each side's daily
    floored value mass — the exact-int64 portfolio-correlation inputs
    of the revenue streams (E45 cross-correlates minute COUNTS at lag
    1, E156 overlaps active CALENDARS; E169 asks whether the money
    moves together day to day — co-moving sources share a demand
    driver and hedge nothing, anti-moving ones smooth the total).
    Dense small output (pairs); exact int64 (daily-mass CTE + FULL
    pair join oracle).

    Scale shape — ONE day-hash exchange over settled (source, day,
    value) cells: a day's cells co-locate, so all pair products for
    that day compute locally (sources² per day, tiny) and fold IN
    PLACE to per-pair sums; per-side marginals ride the same exchange;
    the k=1 merge sums O(parts × pairs) rows."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        day = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // 86_400_000_000
        )
        v = np.floor(
            b["value"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        sd = code * (1 << 40) + day
        u, idx = np.unique(sd, return_inverse=True)
        sv = np.zeros(len(u), np.int64)
        np.add.at(sv, idx, v)
        return pa.table(
            {
                "day": pa.array(u & ((1 << 40) - 1)),
                "s": pa.array(u >> 40),
                "v": pa.array(sv),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("i", "j", "nd", "sx", "sy", "sxx", "syy", "sxy")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by(["day", "s"], use_threads=False).aggregate(
            [("v", "sum")]
        )
        day = g["day"].combine_chunks().to_numpy(zero_copy_only=False)
        s = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        v = g["v_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        ud, didx = np.unique(day, return_inverse=True)
        mat = np.zeros((len(ud), ns), np.int64)
        mat[didx, s] = v
        active = np.zeros((len(ud), ns), bool)
        active[didx, s] = True
        iu, ju = np.triu_indices(ns, k=1)
        rows = {c: [] for c in cols}
        for x, y in zip(iu, ju):
            either = active[:, x] | active[:, y]
            vx = mat[either, x]
            vy = mat[either, y]
            rows["i"].append(int(x))
            rows["j"].append(int(y))
            rows["nd"].append(int(either.sum()))
            rows["sx"].append(int(vx.sum()))
            rows["sy"].append(int(vy.sum()))
            rows["sxx"].append(int((vx * vx).sum()))
            rows["syy"].append(int((vy * vy).sum()))
            rows["sxy"].append(int((vx * vy).sum()))
        return pa.table({c: pa.array(a, pa.int64()) for c, a in rows.items()})

    def merge(t: pa.Table) -> pa.Table:
        out = (
            "source_i",
            "source_j",
            "n_days",
            "sum_x",
            "sum_y",
            "sum_x_sq",
            "sum_y_sq",
            "sum_xy",
        )
        iu, ju = np.triu_indices(ns, k=1)
        acc = {c: np.zeros(len(iu), np.int64) for c in out[2:]}
        if t.num_rows:
            g = t.group_by(["i", "j"], use_threads=False).aggregate(
                [(c, "sum") for c in ("nd", "sx", "sy", "sxx", "syy", "sxy")]
            )
            gi = g["i"].combine_chunks().to_numpy(zero_copy_only=False)
            gj = g["j"].combine_chunks().to_numpy(zero_copy_only=False)
            pos = np.searchsorted(iu * ns + ju, gi * ns + gj)
            for name, src in zip(
                out[2:], ("nd", "sx", "sy", "sxx", "syy", "sxy")
            ):
                acc[name][pos] = (
                    g[f"{src}_sum"]
                    .combine_chunks()
                    .to_numpy(zero_copy_only=False)
                )
        return pa.table(
            {
                "source_i": srcs.take(pa.array(iu, pa.int64())),
                "source_j": srcs.take(pa.array(ju, pa.int64())),
                **{c: pa.array(a, pa.int64()) for c, a in acc.items()},
            }
        )

    cells = hash_partition_merge(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "day",
        fold,
        k=_adaptive_k(sf_dir),
    )
    return hash_partition_merge(cells, "i", merge, k=1)


def events_sign_runs(
    sf_dir: str, window_us: int = TEMPORAL_WINDOW_US
) -> Dataset:
    """E170: payload sign-run board — per source, classify each event's
    floored value by sign (negative / zero / positive) and count, in
    (ts, event_id) order: events per class and maximal SAME-SIGN runs
    — the refund-storm detector (E140 finds runs of EXACTLY equal
    values, E146 fences magnitude outliers; E170 reads the sign
    grammar: healthy ledgers interleave signs at transaction rate, a
    negative run is a chargeback batch or a meter running backwards —
    and run counts vs event counts give the mean storm length without
    shipping any run itself).  One dense row per source ALWAYS; exact
    int64 (sign + lag-window oracle; ties break by event_id).

    Scale shape — E147's carried-prefix machinery with v = sign:
    two narrow carry exchanges, one lexsort + one shifted compare per
    (source, ts-window) partition — a run crossing a window edge is
    not double-counted because the carry hands the predecessor's
    sign; per-class partials fold k=1."""
    from ..stages.shuffle import hash_partition_merge, shuffle_parts
    from ..stages.temporal import _kw_partition

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    kfan = _adaptive_k(sf_dir)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
        override_num_blocks=kfan,
    )

    def narrow(b: pa.Table) -> pa.Table:
        ts_us = (
            b["ts"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        v = np.floor(
            b["value"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table(
            {
                "k": pc.cast(
                    pc.index_in(b["event_type"], value_set=srcs), pa.int64()
                ),
                "t": pa.array(ts_us, pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
                "v": pa.array(np.sign(v), pa.int64()),
                "carry": pa.array(np.zeros(b.num_rows, dtype=bool)),
                "w": pa.array(ts_us // window_us, pa.int64()),
            }
        )

    tagged = ds.map_batches(narrow, batch_format="pyarrow")
    carries = _last_event_carries(tagged)
    full = tagged.union(
        carries.map_batches(_tag_carry, batch_format="pyarrow")
    )

    def kernel(t_: pa.Table) -> pa.Table:
        cols = ("s", "ne", "nneg", "nzero", "nruns", "nnegruns")
        if t_.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        kk = t_["k"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t_["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t_["o"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = t_["v"].combine_chunks().to_numpy(zero_copy_only=False)
        cr = t_["carry"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cr, vv, oo, tt, kk))
        ks, vs, crs = kk[order], vv[order], cr[order]
        n = len(order)
        has_prev = np.empty(n, dtype=bool)
        has_prev[0] = False
        has_prev[1:] = ks[1:] == ks[:-1]
        pv = np.empty(n, dtype=np.int64)
        pv[0] = 99
        pv[1:] = vs[:-1]
        run_start = ~crs & (~has_prev | (vs != pv))
        ng = len(srcs)
        real = ~crs
        return pa.table(
            {
                "s": pa.array(np.arange(ng, dtype=np.int64)),
                "ne": pa.array(
                    np.bincount(ks[real], minlength=ng).astype(np.int64)
                ),
                "nneg": pa.array(
                    np.bincount(
                        ks[real & (vv[order] < 0)], minlength=ng
                    ).astype(np.int64)
                ),
                "nzero": pa.array(
                    np.bincount(
                        ks[real & (vv[order] == 0)], minlength=ng
                    ).astype(np.int64)
                ),
                "nruns": pa.array(
                    np.bincount(ks[run_start], minlength=ng).astype(
                        np.int64
                    )
                ),
                "nnegruns": pa.array(
                    np.bincount(
                        ks[run_start & (vs < 0)], minlength=ng
                    ).astype(np.int64)
                ),
            }
        )

    cells = _kw_partition(full, kernel, shuffle_parts(kfan))

    def merge(t: pa.Table) -> pa.Table:
        names = (
            "source",
            "n_events",
            "n_negative",
            "n_zero",
            "n_runs",
            "n_negative_runs",
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in names[1:]},
                }
            )
        g = t.group_by("s", use_threads=False).aggregate(
            [(c, "sum") for c in ("ne", "nneg", "nzero", "nruns", "nnegruns")]
        )
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        cols = {
            name: g[f"{src}_sum"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            for name, src in zip(
                names[1:], ("ne", "nneg", "nzero", "nruns", "nnegruns")
            )
        }
        keep = cols["n_events"] > 0
        order = np.argsort(ss[keep])
        sel = np.flatnonzero(keep)[order]
        return pa.table(
            {
                "source": srcs.take(pa.array(ss[sel], pa.int64())),
                **{
                    c: pa.array(a[sel], pa.int64())
                    for c, a in cols.items()
                },
            }
        )

    return hash_partition_merge(cells, "s", merge, k=1)


def events_watermark_lag(
    sf_dir: str, window_ids: int = 1 << 17
) -> Dataset:
    """E171: watermark-lag spectrum — walk each source in EVENT-ID
    (ingestion) order, maintain the running max timestamp (the
    watermark), and histogram events by how far BEHIND it they arrive:
    band -1 = on time (ts advances the watermark or equals it), else
    the bit length of the lag in floor-seconds (lag < 1 s counts as
    1 s) — THE allowed-lateness design read (E147 counts inversions
    and the single worst backstep; E171 gives the whole lateness
    distribution a streaming window's grace period is actually sized
    against: pick the band covering 999‰ and that is your watermark
    delay).  Dense small output (sources × ≤~30 bands); exact int64
    (running-max window frame + bin-length oracle).

    Scale shape — the grid_cumsum two-pass discipline on the id axis:
      1. per-(source, id-window, batch) summaries reduce to each
         window's max ts; ONE source-hash exchange turns them into
         per-window PREFIX maxes (windows per source are tiny —
         ids/2¹⁷ — and only summaries ride);
      2. the prefix maxes re-enter as carry rows; each (source,
         window) kernel runs one lexsort + one cummax against its
         carried prefix, bands its own events, and bincounts in
         place; the k=1 merge sums O(parts × bands) rows."""
    from ..stages.shuffle import hash_partition_merge, shuffle_parts
    from ..stages.temporal import _kw_partition

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)
    kfan = _adaptive_k(sf_dir)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id"],
        override_num_blocks=kfan,
    )

    def narrow(b: pa.Table) -> pa.Table:
        ids = (
            pc.cast(b["event_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "k": pc.cast(
                    pc.index_in(b["event_type"], value_set=srcs), pa.int64()
                ),
                "t": pa.array(ids, pa.int64()),
                "o": b["ts"].cast(pa.int64()),
                "v": b["ts"].cast(pa.int64()),
                "carry": pa.array(np.zeros(b.num_rows, dtype=bool)),
                "w": pa.array(ids // window_ids, pa.int64()),
            }
        )

    tagged = ds.map_batches(narrow, batch_format="pyarrow")

    def summarize(b: pa.Table) -> pa.Table:
        kk = b["k"].combine_chunks().to_numpy(zero_copy_only=False)
        ww = b["w"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = b["v"].combine_chunks().to_numpy(zero_copy_only=False)
        key = kk * (1 << 40) + ww
        u, idx = np.unique(key, return_inverse=True)
        mx = np.full(len(u), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, idx, vv)
        return pa.table({"kw": pa.array(u), "mx": pa.array(mx)})

    def prefix_kernel(t: pa.Table) -> pa.Table:
        """Per source: each window's carry-in = max ts over ALL earlier
        windows (strict prefix)."""
        cols = ("k", "t", "o", "v", "carry", "w")
        if t.num_rows == 0:
            return pa.table(
                {
                    "k": pa.array([], pa.int64()),
                    "t": pa.array([], pa.int64()),
                    "o": pa.array([], pa.int64()),
                    "v": pa.array([], pa.int64()),
                    "carry": pa.array([], pa.bool_()),
                    "w": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("kw", use_threads=False).aggregate([("mx", "max")])
        kw = g["kw"].combine_chunks().to_numpy(zero_copy_only=False)
        mx = g["mx_max"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(kw)
        kw, mx = kw[order], mx[order]
        k = kw >> 40
        w = kw & ((1 << 40) - 1)
        # exact per-key strict-prefix max; the summary table is tiny
        # (windows per key = ids / window_ids), so a loop is fine here
        pmax = np.full(len(kw), np.iinfo(np.int64).min, np.int64)
        brk = np.concatenate([[0], np.flatnonzero(k[1:] != k[:-1]) + 1,
                              [len(kw)]])
        for a, b_ in zip(brk[:-1], brk[1:]):
            acc = np.iinfo(np.int64).min
            for i in range(a, b_):
                pmax[i] = acc
                acc = max(acc, int(mx[i]))
        has = pmax > np.iinfo(np.int64).min
        return pa.table(
            {
                "k": pa.array(k[has]),
                # pseudo-id just before the window's first real id, so
                # the carry sorts at ITS window, not at the key front;
                # o = +inf places it after any real event tied on that id
                "t": pa.array(w[has] * window_ids - 1, pa.int64()),
                "o": pa.array(
                    np.full(int(has.sum()), np.iinfo(np.int64).max,
                            np.int64)
                ),
                "v": pa.array(pmax[has]),
                "carry": pa.array(np.ones(int(has.sum()), dtype=bool)),
                "w": pa.array(w[has]),
            }
        )

    prefix_carries = hash_partition_merge(
        tagged.map_batches(
            summarize, batch_format="pyarrow", batch_size=256 * 1024
        ),
        "kw",
        prefix_kernel,
        k=1,
    )
    full = tagged.union(prefix_carries)

    def kernel(t_: pa.Table) -> pa.Table:
        cols = ("s", "band", "n")
        if t_.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        kk = t_["k"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t_["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t_["o"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = t_["v"].combine_chunks().to_numpy(zero_copy_only=False)
        cr = t_["carry"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cr, oo, tt, kk))  # carries precede their window
        ks, vs, crs = kk[order], vv[order], cr[order]
        n = len(order)
        key_brk = np.empty(n, dtype=bool)
        key_brk[0] = True
        key_brk[1:] = ks[1:] != ks[:-1]
        idx = np.arange(n)
        start_of_seg = np.maximum.accumulate(np.where(key_brk, idx, 0))
        # segmented running max (doubling passes; log n of them)
        m = vs.copy()
        shift = 1
        while shift < n:
            prev = np.empty(n, np.int64)
            prev[:shift] = np.iinfo(np.int64).min
            prev[shift:] = m[:-shift]
            same = idx - shift >= start_of_seg
            m = np.where(same, np.maximum(m, prev), m)
            shift *= 2
        runmax = m
        # prev-watermark for each row = runmax of the PREVIOUS row in
        # the same segment
        prevwm = np.empty(n, np.int64)
        prevwm[0] = np.iinfo(np.int64).min
        prevwm[1:] = np.where(
            ~key_brk[1:], runmax[:-1], np.iinfo(np.int64).min
        )
        real = ~crs
        lag_us = prevwm - vs
        late = real & (prevwm > np.iinfo(np.int64).min) & (lag_us > 0)
        ontime = real & ~late
        lag_s = np.maximum(lag_us // 1_000_000, 1)
        powers2 = np.int64(1) << np.arange(1, 41)
        band = np.searchsorted(powers2, lag_s, side="right") + 1
        nbd = 45
        key = np.where(late, ks * nbd + band + 1, ks * nbd)
        cnt = np.bincount(key[real], minlength=ns * nbd).astype(np.int64)
        keep = np.flatnonzero(cnt)
        return pa.table(
            {
                "s": pa.array(keep // nbd),
                "band": pa.array(keep % nbd - 1),
                "n": pa.array(cnt[keep]),
            }
        )

    cells = _kw_partition(full, kernel, shuffle_parts(kfan))

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "lag_band": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["s", "band"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return pa.table(
            {
                "source": srcs.take(g["s"]),
                "lag_band": pc.cast(g["band"], pa.int64()),
                "n_events": pc.cast(g["n_sum"], pa.int64()),
            }
        )

    return hash_partition_merge(cells, "s", merge, k=1)


def events_median_drift(sf_dir: str) -> Dataset:
    """E172: weekly median-drift sufficient statistics — per source,
    compute each active week's DISCRETE p50 of floor-cents payload
    (the repo rank rule), then over the weekly medians: n_weeks, Σw,
    Σw², Σp50, Σp50², Σw·p50 — the robust drift line (E97 fits value
    against time with MEANS — one fat-finger outlier bends it; E126
    tracks DAILY median stability pairwise; E172 fits the trend
    through weekly medians, the estimator a billing-drift monitor
    actually wants: slope in cents/week reads off the sums and
    outliers cannot touch it).  One dense row per source ALWAYS.
    Int64 bound documented: p50 ≤ 10⁸ cents, w ≤ ~3·10³ → Σw·p50
    holds ~3·10⁷ weeks/source.  Exact int64 (per-week quantile_disc
    CTE + SUM oracle).

    Scale shape — the per-bucket exact-quantile discipline at week
    grain: batches pre-reduce to (source, week, cents, n) histogram
    cells; ONE (source, week)-hash exchange settles each week's
    histogram — a week's cells co-locate — and reads its p50 off one
    cumsum; the six sums fold k=1.  Only histogram cells ever
    shuffle."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        week = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // 86_400_000_000
            // 7
        )
        cents = np.rint(
            b["value"].combine_chunks().to_numpy(zero_copy_only=False)
            * 100.0
        ).astype(np.int64)
        key = np.stack([code * (1 << 40) + week, cents], axis=1)
        u, cnt = np.unique(key, axis=0, return_counts=True)
        return pa.table(
            {
                "sw": pa.array(u[:, 0]),
                "c": pa.array(u[:, 1]),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("s", "nw", "sw_", "sww", "sp", "spp", "swp")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by(["sw", "c"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        sw = g["sw"].combine_chunks().to_numpy(zero_copy_only=False)
        c = g["c"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((c, sw))
        sw, c, n = sw[order], c[order], n[order]
        brk = np.empty(len(sw), dtype=bool)
        brk[0] = True
        brk[1:] = sw[1:] != sw[:-1]
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(sw))
        out = {"s": np.arange(ns, dtype=np.int64)}
        acc = {k: np.zeros(ns, np.int64) for k in
               ("nw", "sw_", "sww", "sp", "spp", "swp")}
        for a, b_ in zip(starts, ends):
            tot = int(n[a:b_].sum())
            thr = (tot * 500 + 999) // 1000
            cum = np.cumsum(n[a:b_])
            p50 = int(c[a:b_][np.searchsorted(cum, thr)])
            s = int(sw[a] >> 40)
            w = int(sw[a] & ((1 << 40) - 1))
            acc["nw"][s] += 1
            acc["sw_"][s] += w
            acc["sww"][s] += w * w
            acc["sp"][s] += p50
            acc["spp"][s] += p50 * p50
            acc["swp"][s] += w * p50
        out.update(acc)
        return pa.table({k: pa.array(v) for k, v in out.items()})

    cells = hash_partition_merge(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "sw",
        fold,
        k=_adaptive_k(sf_dir),
    )

    def merge(t: pa.Table) -> pa.Table:
        names = (
            "source",
            "n_weeks",
            "sum_w",
            "sum_w_sq",
            "sum_p50",
            "sum_p50_sq",
            "sum_w_p50",
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in names[1:]},
                }
            )
        g = t.group_by("s", use_threads=False).aggregate(
            [(c, "sum") for c in ("nw", "sw_", "sww", "sp", "spp", "swp")]
        )
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(ss)
        cols = {
            name: g[f"{src}_sum"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)[order]
            for name, src in zip(
                names[1:], ("nw", "sw_", "sww", "sp", "spp", "swp")
            )
        }
        keep = cols["n_weeks"] > 0
        return pa.table(
            {
                "source": srcs.take(pa.array(ss[order][keep], pa.int64())),
                **{
                    c: pa.array(a[keep], pa.int64()) for c, a in cols.items()
                },
            }
        )

    return hash_partition_merge(cells, "s", merge, k=1)


def events_dom_profile(sf_dir: str) -> Dataset:
    """E173: event day-of-month profile — per (source, calendar
    day-of-month 1..31): events and exact floored value mass — the
    billing-cycle signature in the telemetry itself (E52 profiles the
    WEEK, E151 the day's hours, R91 reads the same wheel on
    shipments; E173 asks whether the event stream breathes with the
    month: spikes at 1 and 28-31 are invoice/settlement jobs, a flat
    wheel is organic traffic — and a source whose value mass loads
    month-end while its event count doesn't is few big settlements,
    exactly E151's hour-level read at calendar grain).  Dense small
    output (sources × ≤31); exact int64 (extract(day) + GROUP BY
    oracle).

    Scale shape — ZERO wide exchange: the day-of-month axis is
    bounded; one calendar decompose + two bincounts per batch;
    O(batches × sources × 31) partials ride the k=1 merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        ts = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
        )
        dt = ts.astype("datetime64[us]")
        dom = (
            dt.astype("datetime64[D]").astype(np.int64)
            - dt.astype("datetime64[M]").astype("datetime64[D]").astype(
                np.int64
            )
            + 1
        )
        v = np.floor(
            b["value"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        key = code * 32 + dom
        ne = np.bincount(key, minlength=ns * 32).astype(np.int64)
        sv = np.zeros(ns * 32, np.int64)
        np.add.at(sv, key, v)
        keep = np.flatnonzero(ne)
        return pa.table(
            {
                "s": pa.array(keep // 32),
                "dom": pa.array(keep % 32),
                "ne": pa.array(ne[keep]),
                "sv": pa.array(sv[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("source", "day_of_month", "n_events", "value_floor")
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[1:]},
                }
            )
        g = t.group_by(["s", "dom"], use_threads=False).aggregate(
            [("ne", "sum"), ("sv", "sum")]
        )
        return pa.table(
            {
                "source": srcs.take(g["s"]),
                "day_of_month": pc.cast(g["dom"], pa.int64()),
                "n_events": pc.cast(g["ne_sum"], pa.int64()),
                "value_floor": pc.cast(g["sv_sum"], pa.int64()),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "s", merge, k=1)


def events_session_density(sf_dir: str, gap_s: int = 6 * 3600) -> Dataset:
    """E174: session density-coupling statistics — over all sessions:
    n, Σe, Σe², Σd, Σd², Σe·d with e = the session's event count and
    d = its duration in floor-seconds — are long sessions BUSY or just
    idle-open?  (E50 distributes durations, E76 sizes, E160 couples
    duration with the CLOCK; E174 couples the two engagement axes
    directly: events/second per session divides out, and a corpus
    whose Σe·d is dominated by few long-dense sessions is power-user
    traffic, not breadth — the read an engagement KPI should split
    on.)  ONE dense row ALWAYS.  Int64 bound documented: e ≤ 10⁶,
    d ≤ 10⁷ s → Σe·d holds ~9·10⁵ sessions per shard.  Exact int64
    (the E15 sessions CTE + SUM oracle).

    Scale shape — pure composition over the scale-safe E15 sessionize
    stage; session rows are corpus-small, one six-sum reduce per
    batch, k=1 merge."""
    from ..stages.shuffle import hash_partition_merge

    sessions = events_sessions(sf_dir, gap_s=gap_s).select_columns(
        ["n_events", "start_ts", "end_ts"]
    )

    def partial(b: pa.Table) -> pa.Table:
        e = (
            pc.cast(b["n_events"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        st = (
            b["start_ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
        )
        en = (
            b["end_ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
        )
        d = (en - st) // 1_000_000
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "n": pa.array([len(e)], pa.int64()),
                "se": pa.array([int(e.sum())], pa.int64()),
                "see": pa.array([int((e * e).sum())], pa.int64()),
                "sd": pa.array([int(d.sum())], pa.int64()),
                "sdd": pa.array([int((d * d).sum())], pa.int64()),
                "sed": pa.array([int((e * d).sum())], pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = (
            "n_sessions",
            "sum_e",
            "sum_e_sq",
            "sum_d",
            "sum_d_sq",
            "sum_e_d",
        )
        if t.num_rows == 0:
            return pa.table({c: pa.array([0], pa.int64()) for c in out})
        src = ("n", "se", "see", "sd", "sdd", "sed")
        return pa.table(
            {
                name: pa.array([int(pc.sum(t[c]).as_py())], pa.int64())
                for name, c in zip(out, src)
            }
        )

    partials = sessions.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "g", merge, k=1)


def events_acquisition_clock(sf_dir: str) -> Dataset:
    """E175: acquisition clock board — per (source, hour-of-day): how
    many users' FIRST-EVER event on that source landed in that hour —
    when the funnel actually acquires (E122 clocks the ACTIVE
    audience — dominated by habits of existing users; E152 audits the
    id order of first-seens; E175 clocks the first-seens themselves:
    an acquisition clock that peaks at 3am is bot signups or another
    timezone's organic growth, and the gap between it and E122's
    activity clock is the onboarding-to-habit phase shift).  Dense
    small output (sources × ≤24); exact int64 (min-per-(source, user)
    + extract(hour) oracle; first-seen ties break by event_id).

    Scale shape — E152's first-seen reduction: batches keep each
    (source, user)'s earliest (ts, id); ONE user-hash exchange settles
    the global first-seens and bincounts their hours IN PLACE; the
    k=1 merge sums O(parts × sources × 24) rows."""
    from ..stages.shuffle import hash_partition_merge, shuffle_parts

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def batch_first(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        ts = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
        )
        eid = (
            pc.cast(b["event_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        uid = (
            pc.cast(b["user_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        order = np.lexsort((eid, ts, code, uid))
        us, cs = uid[order], code[order]
        first = np.empty(len(order), dtype=bool)
        if len(order):
            first[0] = True
            first[1:] = (us[1:] != us[:-1]) | (cs[1:] != cs[:-1])
        sel = order[first]
        return pa.table(
            {
                "u": pa.array(uid[sel]),
                "s": pa.array(code[sel]),
                "ts": pa.array(ts[sel]),
                "eid": pa.array(eid[sel]),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("s", "h", "n")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        uu = t["u"].combine_chunks().to_numpy(zero_copy_only=False)
        ss = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = t["ts"].combine_chunks().to_numpy(zero_copy_only=False)
        eid = t["eid"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, ss, uu))
        us, cs = uu[order], ss[order]
        first = np.empty(len(order), dtype=bool)
        first[0] = True
        first[1:] = (us[1:] != us[:-1]) | (cs[1:] != cs[:-1])
        sel = order[first]
        hour = (ts[sel] // 3_600_000_000) % 24
        key = ss[sel] * 24 + hour
        cnt = np.bincount(key, minlength=ns * 24).astype(np.int64)
        keep = np.flatnonzero(cnt)
        return pa.table(
            {
                "s": pa.array(keep // 24),
                "h": pa.array(keep % 24),
                "n": pa.array(cnt[keep]),
            }
        )

    cells = hash_partition_merge(
        ds.map_batches(batch_first, batch_format="pyarrow"),
        "u",
        fold,
        k=shuffle_parts(_adaptive_k(sf_dir)),
    )

    def merge(t: pa.Table) -> pa.Table:
        out = ("source", "hour_of_day", "n_new_users")
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "hour_of_day": pa.array([], pa.int64()),
                    "n_new_users": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["s", "h"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return pa.table(
            {
                "source": srcs.take(g["s"]),
                "hour_of_day": pc.cast(g["h"], pa.int64()),
                "n_new_users": pc.cast(g["n_sum"], pa.int64()),
            }
        )

    return hash_partition_merge(cells, "s", merge, k=1)


def events_outage_drilldown(
    sf_dir: str, window_us: int = TEMPORAL_WINDOW_US
) -> Dataset:
    """E176: outage drill-down — per source, the single LONGEST silence
    between consecutive events (ts order, ties by event_id) with its
    exact start and end timestamps; ties on gap length resolve to the
    EARLIEST occurrence — record retrieval for the incident review
    (E32 reports the max-gap LENGTH and gap counts, E39 distributes
    them; E176 answers the question the on-call actually asks: WHEN
    was the feed down?  — the E89 drill-down discipline on the
    silence axis).  One dense row per source ALWAYS (single-event
    sources report a zero gap at their own timestamp).  Exact int64
    (lag + row_number argmax oracle).

    Scale shape — E147's carried-prefix pair machinery with an argmax
    combiner: each (source, ts-window) kernel keeps ONE candidate
    (its longest local pair — a losing pair can never win globally);
    O(parts × sources) candidate rows reach the k=1 argmax merge."""
    from ..stages.shuffle import hash_partition_merge, shuffle_parts
    from ..stages.temporal import _kw_partition

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    kfan = _adaptive_k(sf_dir)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id"],
        override_num_blocks=kfan,
    )

    def narrow(b: pa.Table) -> pa.Table:
        ts_us = (
            b["ts"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "k": pc.cast(
                    pc.index_in(b["event_type"], value_set=srcs), pa.int64()
                ),
                "t": pa.array(ts_us, pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
                "v": pa.array(ts_us, pa.int64()),
                "carry": pa.array(np.zeros(b.num_rows, dtype=bool)),
                "w": pa.array(ts_us // window_us, pa.int64()),
            }
        )

    tagged = ds.map_batches(narrow, batch_format="pyarrow")
    carries = _last_event_carries(tagged)
    full = tagged.union(
        carries.map_batches(_tag_carry, batch_format="pyarrow")
    )

    def kernel(t_: pa.Table) -> pa.Table:
        cols = ("s", "gap", "st", "en")
        if t_.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        kk = t_["k"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t_["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t_["o"].combine_chunks().to_numpy(zero_copy_only=False)
        cr = t_["carry"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cr, oo, tt, kk))
        ks, ts, crs = kk[order], tt[order], cr[order]
        n = len(order)
        has_prev = np.empty(n, dtype=bool)
        has_prev[0] = False
        has_prev[1:] = ks[1:] == ks[:-1]
        pt = np.empty(n, dtype=np.int64)
        pt[0] = 0
        pt[1:] = ts[:-1]
        pair = has_prev & ~crs
        gap = np.where(pair, ts - pt, -1)
        ng = len(srcs)
        best_gap = np.full(ng, -1, np.int64)
        best_st = np.zeros(ng, np.int64)
        best_en = np.zeros(ng, np.int64)
        # per-source argmax with earliest-start tie-break: scan sorted
        # by (k, gap desc, start asc) — rows are already k-grouped, so
        # one lexsort over the pair rows suffices
        psel = np.flatnonzero(pair)
        if len(psel):
            pk = ks[psel]
            pg = gap[psel]
            pst = pt[psel]
            pen = ts[psel]
            order2 = np.lexsort((pst, -pg, pk))
            first = np.empty(len(order2), dtype=bool)
            pk_s = pk[order2]
            first[0] = True
            first[1:] = pk_s[1:] != pk_s[:-1]
            sel = order2[first]
            best_gap[pk[sel]] = pg[sel]
            best_st[pk[sel]] = pst[sel]
            best_en[pk[sel]] = pen[sel]
        # single-event fallback rides as gap 0 at the event itself
        lone = ~crs & ~has_prev
        for i in np.flatnonzero(lone):
            s = ks[i]
            if best_gap[s] < 0:
                best_gap[s] = 0
                best_st[s] = ts[i]
                best_en[s] = ts[i]
        keep = np.flatnonzero(best_gap >= 0)
        return pa.table(
            {
                "s": pa.array(keep),
                "gap": pa.array(best_gap[keep]),
                "st": pa.array(best_st[keep]),
                "en": pa.array(best_en[keep]),
            }
        )

    cells = _kw_partition(full, kernel, shuffle_parts(kfan))

    def merge(t: pa.Table) -> pa.Table:
        out = ("source", "gap_s", "silence_start_ts", "silence_end_ts")
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "gap_s": pa.array([], pa.int64()),
                    "silence_start_ts": pa.array([], pa.timestamp("us")),
                    "silence_end_ts": pa.array([], pa.timestamp("us")),
                }
            )
        ss = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
        gap = t["gap"].combine_chunks().to_numpy(zero_copy_only=False)
        st = t["st"].combine_chunks().to_numpy(zero_copy_only=False)
        en = t["en"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((st, -gap, ss))
        first = np.empty(len(order), dtype=bool)
        ss_s = ss[order]
        first[0] = True
        first[1:] = ss_s[1:] != ss_s[:-1]
        sel = order[first]
        o2 = np.argsort(ss[sel])
        sel = sel[o2]
        return pa.table(
            {
                "source": srcs.take(pa.array(ss[sel], pa.int64())),
                "gap_s": pa.array(gap[sel] // 1_000_000, pa.int64()),
                "silence_start_ts": pa.array(st[sel], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "silence_end_ts": pa.array(en[sel], pa.int64()).cast(
                    pa.timestamp("us")
                ),
            }
        )

    return hash_partition_merge(cells, "s", merge, k=1)


def events_refund_matching(sf_dir: str) -> Dataset:
    """E177: refund-matching board — per source, pair positive and
    negative payloads by EXACT absolute cent amount: positive events,
    negative events, matched pairs (Σ over amounts of min(pos, neg)),
    and the matched permille of negative mass — the reversal
    reconciliation read (E170 detects negative RUNS, E146 fences
    magnitudes; E177 asks whether the negatives actually reverse
    specific positives: a high match rate is clean refund traffic,
    unmatched negative mass is write-offs or corruption — the ledger
    sanity a finance export is checked against; amount-level matching,
    order-free by design).  One dense row per source ALWAYS; exact
    int64 (per-amount sign counts + LEAST oracle).

    Scale shape — ONE (source, |cents|)-hash exchange over pre-reduced
    sign-count cells: an amount's cells co-locate, so min(pos, neg)
    settles locally and collapses to per-source partials; the k=1
    merge sums O(parts × sources) rows."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        cents = np.rint(
            b["value"].combine_chunks().to_numpy(zero_copy_only=False)
            * 100.0
        ).astype(np.int64)
        sign = np.sign(cents)
        nz = sign != 0
        key = np.stack(
            [code[nz] * 2 + (sign[nz] < 0), np.abs(cents[nz])], axis=1
        )
        u, cnt = np.unique(key, axis=0, return_counts=True)
        return pa.table(
            {
                "sa": pa.array(u[:, 0] // 2 * (1 << 40) + u[:, 1]),
                "neg": pa.array(u[:, 0] % 2),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("s", "npos", "nneg", "nmatch")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by(["sa", "neg"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        sa = g["sa"].combine_chunks().to_numpy(zero_copy_only=False)
        neg = g["neg"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        u, idx = np.unique(sa, return_inverse=True)
        pos_n = np.zeros(len(u), np.int64)
        np.add.at(pos_n, idx[neg == 0], n[neg == 0])
        neg_n = np.zeros(len(u), np.int64)
        np.add.at(neg_n, idx[neg == 1], n[neg == 1])
        s = u >> 40
        out = {"s": np.arange(ns, dtype=np.int64)}
        for name, arr in (
            ("npos", pos_n),
            ("nneg", neg_n),
            ("nmatch", np.minimum(pos_n, neg_n)),
        ):
            acc = np.zeros(ns, np.int64)
            np.add.at(acc, s, arr)
            out[name] = acc
        return pa.table({c: pa.array(a) for c, a in out.items()})

    cells = hash_partition_merge(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "sa",
        fold,
        k=_adaptive_k(sf_dir),
    )

    def merge(t: pa.Table) -> pa.Table:
        out = (
            "source",
            "n_positive",
            "n_negative",
            "matched_pairs",
            "match_permille",
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[1:]},
                }
            )
        g = t.group_by("s", use_threads=False).aggregate(
            [("npos", "sum"), ("nneg", "sum"), ("nmatch", "sum")]
        )
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        npos = g["npos_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        nneg = g["nneg_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        nm = g["nmatch_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = (npos + nneg) > 0
        ss, npos, nneg, nm = ss[keep], npos[keep], nneg[keep], nm[keep]
        order = np.argsort(ss)
        ss, npos, nneg, nm = ss[order], npos[order], nneg[order], nm[order]
        return pa.table(
            {
                "source": srcs.take(pa.array(ss, pa.int64())),
                "n_positive": pa.array(npos, pa.int64()),
                "n_negative": pa.array(nneg, pa.int64()),
                "matched_pairs": pa.array(nm, pa.int64()),
                "match_permille": pa.array(
                    1000 * nm // np.maximum(nneg, 1), pa.int64()
                ),
            }
        )

    return hash_partition_merge(cells, "s", merge, k=1)


def events_simultaneity(sf_dir: str) -> Dataset:
    """E178: simultaneity matrix — for every source pair (i < j), the
    number of DISTINCT (user, minute) cells where the same user was
    active on BOTH sources within the same minute, next to each side's
    own (user, minute) cell count — the cross-device / automation
    tell (E57 overlaps lifetime audiences, E159 orders first
    adoptions, E103 baskets types within a session; E178 demands
    minute-level co-action: humans alternate apps, scripts fan out —
    a pair whose simultaneity approaches its audience overlap is one
    credential driving both feeds at once).  Dense small output
    (pairs); exact int64 (distinct-cell self-join oracle).

    Scale shape — ONE (user, minute)-hash exchange over distinct
    (user, minute, source) cells: a cell's sources co-locate, so pair
    incidences bincount locally (sources² per cell); per-source cell
    totals ride the same exchange; the k=1 merge sums O(parts ×
    pairs) rows."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        minute = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // 60_000_000
        )
        uid = (
            pc.cast(b["user_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        key = np.stack([uid, minute, code], axis=1)
        u = np.unique(key, axis=0)
        return pa.table(
            {
                "um": pa.array(u[:, 0] * (1 << 26) + (u[:, 1] % (1 << 26))),
                "m": pa.array(u[:, 1]),
                "u": pa.array(u[:, 0]),
                "s": pa.array(u[:, 2]),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("i", "j", "n")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        uu = t["u"].combine_chunks().to_numpy(zero_copy_only=False)
        mm = t["m"].combine_chunks().to_numpy(zero_copy_only=False)
        ss = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
        key = np.stack([uu, mm, ss], axis=1)
        uk = np.unique(key, axis=0)
        cu, cm, cs = uk[:, 0], uk[:, 1], uk[:, 2]
        cell = np.stack([cu, cm], axis=1)
        _, cidx = np.unique(cell, axis=0, return_inverse=True)
        order = np.argsort(cidx, kind="stable")
        cidx_s, cs_s = cidx[order], cs[order]
        brk = np.empty(len(cidx_s), dtype=bool)
        brk[0] = True
        brk[1:] = cidx_s[1:] != cidx_s[:-1]
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(cidx_s))
        pair_keys = []
        for a, b_ in zip(starts, ends):
            act = cs_s[a:b_]
            if len(act) > 1:
                ii, jj = np.meshgrid(act, act, indexing="ij")
                sel = ii < jj
                pair_keys.append(ii[sel] * ns + jj[sel])
        own = np.bincount(cs, minlength=ns).astype(np.int64)
        keep_own = np.flatnonzero(own)
        if pair_keys:
            pk = np.concatenate(pair_keys)
            cnt = np.bincount(pk, minlength=ns * ns).astype(np.int64)
            pk_keep = np.flatnonzero(cnt)
        else:
            cnt = np.zeros(0, np.int64)
            pk_keep = np.zeros(0, np.int64)
        return pa.table(
            {
                "i": pa.array(
                    np.concatenate([pk_keep // ns, keep_own]).astype(
                        np.int64
                    )
                ),
                "j": pa.array(
                    np.concatenate(
                        [pk_keep % ns,
                         np.full(len(keep_own), -1, np.int64)]
                    )
                ),
                "n": pa.array(
                    np.concatenate([cnt[pk_keep], own[keep_own]]).astype(
                        np.int64
                    )
                ),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        iu, ju = np.triu_indices(ns, k=1)
        both = np.zeros(len(iu), np.int64)
        own = np.zeros(ns, np.int64)
        if t.num_rows:
            g = t.group_by(["i", "j"], use_threads=False).aggregate(
                [("n", "sum")]
            )
            gi = g["i"].combine_chunks().to_numpy(zero_copy_only=False)
            gj = g["j"].combine_chunks().to_numpy(zero_copy_only=False)
            gn = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
            ownsel = gj < 0
            own[gi[ownsel]] = gn[ownsel]
            psel = ~ownsel
            if psel.any():
                pos = np.searchsorted(
                    iu * ns + ju, gi[psel] * ns + gj[psel]
                )
                both[pos] = gn[psel]
        return pa.table(
            {
                "source_i": srcs.take(pa.array(iu, pa.int64())),
                "source_j": srcs.take(pa.array(ju, pa.int64())),
                "cells_both": pa.array(both),
                "cells_i": pa.array(own[iu]),
                "cells_j": pa.array(own[ju]),
            }
        )

    cells = hash_partition_merge(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "um",
        fold,
        k=_adaptive_k(sf_dir),
    )
    return hash_partition_merge(cells, "i", merge, k=1)


def events_amount_mode(sf_dir: str) -> Dataset:
    """E179: amount-mode board — per source: events, the single most
    common EXACT cent amount (ties → smallest), its count, and its
    permille — the price-point detector (E132 audits the last DIGIT,
    E146 fences outliers, E172 trends the median; E179 asks whether
    one amount dominates: a fat modal permille is a fixed fee, a
    default quantity, or a stuck sensor emitting one reading — none
    of which a distribution summary shows).  One dense row per source
    ALWAYS; exact int64 (two-level GROUP BY + argmax oracle, ties to
    the smallest amount).

    Scale shape — the value domain is the distinct amount inventory:
    batches reduce to (source, cents, n) cells; ONE (source,
    amount)-hash exchange settles each amount's count and keeps only
    its partition's per-source best (a partition loser cannot win);
    the k=1 merge argmaxes O(parts × sources) candidates."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        cents = np.rint(
            b["value"].combine_chunks().to_numpy(zero_copy_only=False)
            * 100.0
        ).astype(np.int64)
        key = np.stack([code, cents], axis=1)
        u, cnt = np.unique(key, axis=0, return_counts=True)
        return pa.table(
            {
                "sc": pa.array(u[:, 0] * (1 << 42) + (u[:, 1] + (1 << 41))),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("s", "cents", "cnt", "tot")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by("sc", use_threads=False).aggregate([("n", "sum")])
        sc = g["sc"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        s = sc >> 42
        cents = (sc & ((1 << 42) - 1)) - (1 << 41)
        order = np.lexsort((cents, -n, s))
        first = np.empty(len(order), dtype=bool)
        s_s = s[order]
        first[0] = True
        first[1:] = s_s[1:] != s_s[:-1]
        sel = order[first]
        tot = np.zeros(ns, np.int64)
        np.add.at(tot, s, n)
        keep = np.flatnonzero(tot)
        best = np.full(ns, -1, np.int64)
        bestc = np.zeros(ns, np.int64)
        best[s[sel]] = cents[sel]
        bestc[s[sel]] = n[sel]
        return pa.table(
            {
                "s": pa.array(keep),
                "cents": pa.array(best[keep]),
                "cnt": pa.array(bestc[keep]),
                "tot": pa.array(tot[keep]),
            }
        )

    cells = hash_partition_merge(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "sc",
        fold,
        k=_adaptive_k(sf_dir),
    )

    def merge(t: pa.Table) -> pa.Table:
        out = (
            "source",
            "n_events",
            "modal_cents",
            "modal_count",
            "modal_permille",
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[1:]},
                }
            )
        ss = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
        cents = t["cents"].combine_chunks().to_numpy(zero_copy_only=False)
        cnt = t["cnt"].combine_chunks().to_numpy(zero_copy_only=False)
        tot = t["tot"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cents, -cnt, ss))
        first = np.empty(len(order), dtype=bool)
        ss_s = ss[order]
        first[0] = True
        first[1:] = ss_s[1:] != ss_s[:-1]
        sel = order[first]
        ntot = np.zeros(ns, np.int64)
        np.add.at(ntot, ss, tot)
        o2 = np.argsort(ss[sel])
        sel = sel[o2]
        ssel = ss[sel]
        return pa.table(
            {
                "source": srcs.take(pa.array(ssel, pa.int64())),
                "n_events": pa.array(ntot[ssel], pa.int64()),
                "modal_cents": pa.array(cents[sel], pa.int64()),
                "modal_count": pa.array(cnt[sel], pa.int64()),
                "modal_permille": pa.array(
                    1000 * cnt[sel] // ntot[ssel], pa.int64()
                ),
            }
        )

    return hash_partition_merge(cells, "s", merge, k=1)


def events_value_band_markov(
    sf_dir: str, window_us: int = TEMPORAL_WINDOW_US
) -> Dataset:
    """E180: value-band transition matrix — per source, band each
    event's payload (−1 = negative cents, else the bit length of the
    cent amount, 0 = zero) and count adjacent-event band transitions
    in (ts, event_id) order — the payload REGIME-SWITCHING read (E148
    gives the minute-LOAD Markov, E161 the exact lag-1 covariance,
    E170 sign runs; E180 shows the magnitude grammar: a diagonal-heavy
    matrix is a stable tariff, off-diagonal bands are mixed traffic
    classes sharing one stream, and a −1 column that only follows the
    big bands is refunds chasing big charges).  Sparse exact output
    (source, from_band, to_band, n); int64 (sign/bin-length + lag
    oracle; ties break by (event_id, band)).

    Scale shape — E147's carried-prefix pair machinery with v = the
    band: two narrow carry exchanges, one lexsort + one shifted
    compare per (source, ts-window) partition, (s, from, to) cells
    bincount in place and fold k=1."""
    from ..stages.shuffle import hash_partition_merge, shuffle_parts
    from ..stages.temporal import _kw_partition

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)
    NB = 44  # bands -1..42 shifted by +1 -> 0..43

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def narrow(b: pa.Table) -> pa.Table:
        ts_us = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
        )
        cents = np.rint(
            b["value"].combine_chunks().to_numpy(zero_copy_only=False)
            * 100.0
        ).astype(np.int64)
        powers2 = np.int64(1) << np.arange(1, 42)
        band = np.where(
            cents < 0,
            -1,
            np.where(
                cents == 0,
                0,
                np.searchsorted(powers2, cents, side="right") + 1,
            ),
        )
        return pa.table(
            {
                "k": pc.cast(
                    pc.index_in(b["event_type"], value_set=srcs), pa.int64()
                ),
                "t": pa.array(ts_us, pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
                "v": pa.array(band, pa.int64()),
                "carry": pa.array(np.zeros(b.num_rows, dtype=bool)),
                "w": pa.array(ts_us // window_us, pa.int64()),
            }
        )

    tagged = ds.map_batches(narrow, batch_format="pyarrow")
    carries = _last_event_carries(tagged)
    full = tagged.union(
        carries.map_batches(_tag_carry, batch_format="pyarrow")
    )

    def kernel(t_: pa.Table) -> pa.Table:
        cols = ("s", "fb", "tb", "n")
        if t_.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        kk = t_["k"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t_["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t_["o"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = t_["v"].combine_chunks().to_numpy(zero_copy_only=False)
        cr = t_["carry"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cr, vv, oo, tt, kk))
        ks, vs, crs = kk[order], vv[order], cr[order]
        n = len(order)
        has_prev = np.empty(n, dtype=bool)
        has_prev[0] = False
        has_prev[1:] = ks[1:] == ks[:-1]
        pv = np.empty(n, dtype=np.int64)
        pv[0] = 0
        pv[1:] = vs[:-1]
        pair = has_prev & ~crs
        key = (ks[pair] * NB + pv[pair] + 1) * NB + vs[pair] + 1
        cnt = np.bincount(key, minlength=ns * NB * NB).astype(np.int64)
        keep = np.flatnonzero(cnt)
        return pa.table(
            {
                "s": pa.array(keep // (NB * NB)),
                "fb": pa.array((keep // NB) % NB - 1),
                "tb": pa.array(keep % NB - 1),
                "n": pa.array(cnt[keep]),
            }
        )

    cells = _kw_partition(full, kernel, shuffle_parts(_adaptive_k(sf_dir)))

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "from_band": pa.array([], pa.int64()),
                    "to_band": pa.array([], pa.int64()),
                    "n_transitions": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["s", "fb", "tb"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return pa.table(
            {
                "source": srcs.take(g["s"]),
                "from_band": pc.cast(g["fb"], pa.int64()),
                "to_band": pc.cast(g["tb"], pa.int64()),
                "n_transitions": pc.cast(g["n_sum"], pa.int64()),
            }
        )

    return hash_partition_merge(cells, "s", merge, k=1)


def events_weekpart_value(sf_dir: str) -> Dataset:
    """E181: weekpart value split — per (source, weekpart): events,
    Σv, Σv² with v = floored payload and weekpart 0 = Mon–Fri,
    1 = Sat/Sun — does the money keep office hours?  (E143 splits the
    AUDIENCE by weekpart, E112 the event counts, E151 clocks value by
    hour; E181 is the weekend-premium ledger: mean and variance per
    part divide out, and a weekend mean above the weekday one on a
    retail feed is leisure demand — on a B2B feed it is batch jobs
    wearing a sales mask).  Two dense rows per source ALWAYS (zeroed
    when empty).  Exact int64 ((epoch-day+3)%7 weekday convention +
    FILTER sums oracle).

    Scale shape — ZERO wide exchange: one modulo + compare + three
    bincounts per batch to (source, part) cells; O(batches × sources
    × 2) partials ride the k=1 merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        dow = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // 86_400_000_000
            + 3
        ) % 7
        wk = (dow >= 5).astype(np.int64)
        v = np.floor(
            b["value"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        key = code * 2 + wk
        ne = np.bincount(key, minlength=ns * 2).astype(np.int64)
        sv = np.zeros(ns * 2, np.int64)
        np.add.at(sv, key, v)
        svv = np.zeros(ns * 2, np.int64)
        np.add.at(svv, key, v * v)
        return pa.table(
            {
                "s": pa.array(np.arange(ns * 2, dtype=np.int64) // 2),
                "wk": pa.array(np.arange(ns * 2, dtype=np.int64) % 2),
                "ne": pa.array(ne),
                "sv": pa.array(sv),
                "svv": pa.array(svv),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("source", "weekend", "n_events", "sum_v", "sum_v_sq")
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[1:]},
                }
            )
        g = t.group_by(["s", "wk"], use_threads=False).aggregate(
            [("ne", "sum"), ("sv", "sum"), ("svv", "sum")]
        )
        return pa.table(
            {
                "source": srcs.take(g["s"]),
                "weekend": pc.cast(g["wk"], pa.int64()),
                "n_events": pc.cast(g["ne_sum"], pa.int64()),
                "sum_v": pc.cast(g["sv_sum"], pa.int64()),
                "sum_v_sq": pc.cast(g["svv_sum"], pa.int64()),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "s", merge, k=1)


def events_price_habit(sf_dir: str) -> Dataset:
    """E182: user price-habit histogram — per user (≥2 events), the
    share of their events carrying their personal MODAL cent amount,
    banded by decile (band = 1000·modal/total // 100), counting users
    and events per band — the per-identity fixed-fee detector (E179
    finds the SOURCE's dominant amount; E182 asks how many USERS are
    single-amount creatures: subscription payers and bots band at 10,
    browsers spread low — and the band-10 population is exactly the
    recurring-revenue base).  Dense small output (≤10 bands); exact
    int64 (per-(user, amount) counts + max/total + GROUP BY oracle).

    Scale shape — ONE user-hash exchange over pre-reduced (user,
    cents, n) cells: a user's cells co-locate, so the modal share
    settles locally and bincounts IN PLACE; the k=1 merge sums
    O(parts × 10) rows."""
    from ..stages.shuffle import hash_partition_merge

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        uid = (
            pc.cast(b["user_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        cents = np.rint(
            b["value"].combine_chunks().to_numpy(zero_copy_only=False)
            * 100.0
        ).astype(np.int64)
        key = np.stack([uid, cents], axis=1)
        u, cnt = np.unique(key, axis=0, return_counts=True)
        return pa.table(
            {
                "u": pa.array(u[:, 0].astype(np.int64)),
                "c": pa.array(u[:, 1].astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("band", "nu", "ne")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by(["u", "c"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        uu = g["u"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        u, idx = np.unique(uu, return_inverse=True)
        tot = np.zeros(len(u), np.int64)
        np.add.at(tot, idx, n)
        mx = np.zeros(len(u), np.int64)
        np.maximum.at(mx, idx, n)
        keep = tot > 1
        tot, mx = tot[keep], mx[keep]
        band = 1000 * mx // tot // 100
        ub, bidx = np.unique(band, return_inverse=True)
        nu = np.bincount(bidx).astype(np.int64)
        ne = np.zeros(len(ub), np.int64)
        np.add.at(ne, bidx, tot)
        return pa.table(
            {
                "band": pa.array(ub),
                "nu": pa.array(nu),
                "ne": pa.array(ne),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("habit_band", "n_users", "n_events")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by("band", use_threads=False).aggregate(
            [("nu", "sum"), ("ne", "sum")]
        )
        return pa.table(
            {
                "habit_band": pc.cast(g["band"], pa.int64()),
                "n_users": pc.cast(g["nu_sum"], pa.int64()),
                "n_events": pc.cast(g["ne_sum"], pa.int64()),
            }
        )

    cells = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    folded = hash_partition_merge(cells, "u", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(folded, "band", merge, k=1)


def events_amount_diversity(sf_dir: str) -> Dataset:
    """E183: amount-diversity board — per source: events, DISTINCT
    cent amounts, and the diversity permille — the tariff-menu size
    (E179 names the dominant amount, E96 heats value bands; E183
    counts the menu: a source with 3 distinct amounts over a million
    events is a price list, near-1000 permille is continuous
    measurement — the single number that says which ingestion codec
    and which anomaly model fit the payload).  One dense row per
    source ALWAYS; exact int64 (COUNT DISTINCT oracle).

    Scale shape — ONE (source, amount)-hash exchange over distinct
    cells (batches pre-reduce with one np.unique carrying counts): an
    amount's cells co-locate, so distinct counts per source sum
    exactly; the k=1 merge sums O(parts × sources) rows."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        cents = np.rint(
            b["value"].combine_chunks().to_numpy(zero_copy_only=False)
            * 100.0
        ).astype(np.int64)
        key = np.stack([code, cents], axis=1)
        u, cnt = np.unique(key, axis=0, return_counts=True)
        return pa.table(
            {
                "sc": pa.array(u[:, 0] * (1 << 42) + (u[:, 1] + (1 << 41))),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("s", "ne", "nd")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by("sc", use_threads=False).aggregate([("n", "sum")])
        sc = g["sc"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        s = sc >> 42
        ne = np.zeros(ns, np.int64)
        np.add.at(ne, s, n)
        nd = np.bincount(s, minlength=ns).astype(np.int64)
        keep = np.flatnonzero(nd)
        return pa.table(
            {
                "s": pa.array(keep),
                "ne": pa.array(ne[keep]),
                "nd": pa.array(nd[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("source", "n_events", "n_distinct_amounts",
               "diversity_permille")
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[1:]},
                }
            )
        g = t.group_by("s", use_threads=False).aggregate(
            [("ne", "sum"), ("nd", "sum")]
        )
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        ne = g["ne_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        nd = g["nd_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(ss)
        ss, ne, nd = ss[order], ne[order], nd[order]
        return pa.table(
            {
                "source": srcs.take(pa.array(ss, pa.int64())),
                "n_events": pa.array(ne, pa.int64()),
                "n_distinct_amounts": pa.array(nd, pa.int64()),
                "diversity_permille": pa.array(
                    1000 * nd // np.maximum(ne, 1), pa.int64()
                ),
            }
        )

    cells = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    folded = hash_partition_merge(cells, "sc", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(folded, "s", merge, k=1)


def events_tenure_value(sf_dir: str) -> Dataset:
    """E184: tenure-value coupling board — band every event by the bit
    length of its user's TENURE in days at that moment (days since the
    user's corpus-wide first event; band 0 = first day) and report per
    band: events, Σv, Σv² — do veterans pay more?  (E65 histograms
    tenure alone, E108 lifetime value per user, E184 couples value
    with the user's AGE at spend time — the maturation curve a
    lifetime-value forecast integrates, and a flat curve kills the
    "users deepen over time" assumption a retention budget rests
    on).  Dense small output (≤~15 bands); exact int64 (min-over-user
    window + bin-length + GROUP BY oracle).

    Scale shape — the E152 first-seen settle reused as an attach:
    events pre-reduce to (user, day, Σv, Σv², n) cells; ONE user-hash
    exchange co-locates a user's cells with their first-seen day
    (computed from the same cells), so tenure bands settle locally
    and collapse IN PLACE; the k=1 merge sums O(parts × bands)
    rows."""
    from ..stages.shuffle import hash_partition_merge

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        uid = (
            pc.cast(b["user_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        day = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // 86_400_000_000
        )
        v = np.floor(
            b["value"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        key = np.stack([uid, day], axis=1)
        u, idx = np.unique(key, axis=0, return_inverse=True)
        n = np.bincount(idx).astype(np.int64)
        sv = np.zeros(len(u), np.int64)
        np.add.at(sv, idx, v)
        svv = np.zeros(len(u), np.int64)
        np.add.at(svv, idx, v * v)
        return pa.table(
            {
                "u": pa.array(u[:, 0].astype(np.int64)),
                "d": pa.array(u[:, 1].astype(np.int64)),
                "n": pa.array(n),
                "sv": pa.array(sv),
                "svv": pa.array(svv),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("band", "ne", "sv", "svv")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by(["u", "d"], use_threads=False).aggregate(
            [("n", "sum"), ("sv", "sum"), ("svv", "sum")]
        )
        uu = g["u"].combine_chunks().to_numpy(zero_copy_only=False)
        dd = g["d"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        sv = g["sv_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        svv = g["svv_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        u, idx = np.unique(uu, return_inverse=True)
        fday = np.full(len(u), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(fday, idx, dd)
        tenure = dd - fday[idx]
        powers2 = np.int64(1) << np.arange(1, 41)
        band = np.where(
            tenure <= 0,
            0,
            np.searchsorted(powers2, tenure, side="right") + 1,
        )
        ub, bidx = np.unique(band, return_inverse=True)
        ne = np.zeros(len(ub), np.int64)
        np.add.at(ne, bidx, n)
        svb = np.zeros(len(ub), np.int64)
        np.add.at(svb, bidx, sv)
        svvb = np.zeros(len(ub), np.int64)
        np.add.at(svvb, bidx, svv)
        return pa.table(
            {
                "band": pa.array(ub),
                "ne": pa.array(ne),
                "sv": pa.array(svb),
                "svv": pa.array(svvb),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("tenure_band", "n_events", "sum_v", "sum_v_sq")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by("band", use_threads=False).aggregate(
            [("ne", "sum"), ("sv", "sum"), ("svv", "sum")]
        )
        return pa.table(
            {
                "tenure_band": pc.cast(g["band"], pa.int64()),
                "n_events": pc.cast(g["ne_sum"], pa.int64()),
                "sum_v": pc.cast(g["sv_sum"], pa.int64()),
                "sum_v_sq": pc.cast(g["svv_sum"], pa.int64()),
            }
        )

    cells = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    folded = hash_partition_merge(cells, "u", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(folded, "band", merge, k=1)


def events_id_stride(
    sf_dir: str, window_ids: int = 1 << 17
) -> Dataset:
    """E185: id-stride spectrum — per source, band the delta between
    CONSECUTIVE event ids (its own stream, ascending id order) by
    signed decimal magnitude (band 1 = the dense +1 stride) — the
    allocator-topology spectrum (E114 counts gaps and dups once, E150
    reads cross-source interleaving; E185 shows each source's stride
    distribution: pure band-1 is a private sequence, a flat band-k
    is round-robin interleaving at depth ~10^k, and mixed bands are
    epoch-sharded allocation — which predicts exactly how id-range
    scans will stripe across producers).  Sparse exact output; int64
    (lag + digit-length oracle).

    Scale shape — E147's carried-prefix pair machinery on the id axis
    with a banded-delta bincount kernel; (source, band) partials fold
    k=1."""
    from ..stages.shuffle import hash_partition_merge, shuffle_parts
    from ..stages.temporal import _kw_partition

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)
    off, nbd = 12, 25
    powers = np.array([10 ** i for i in range(1, 12)], np.int64)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def narrow(b: pa.Table) -> pa.Table:
        ids = (
            pc.cast(b["event_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "k": pc.cast(
                    pc.index_in(b["event_type"], value_set=srcs), pa.int64()
                ),
                "t": pa.array(ids, pa.int64()),
                "o": b["ts"].cast(pa.int64()),
                "v": pa.array(ids, pa.int64()),
                "carry": pa.array(np.zeros(b.num_rows, dtype=bool)),
                "w": pa.array(ids // window_ids, pa.int64()),
            }
        )

    tagged = ds.map_batches(narrow, batch_format="pyarrow")
    carries = _last_event_carries(tagged)
    full = tagged.union(
        carries.map_batches(_tag_carry, batch_format="pyarrow")
    )

    def kernel(t_: pa.Table) -> pa.Table:
        cols = ("s", "band", "n")
        if t_.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        kk = t_["k"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t_["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t_["o"].combine_chunks().to_numpy(zero_copy_only=False)
        cr = t_["carry"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cr, oo, tt, kk))
        ks, ts, crs = kk[order], tt[order], cr[order]
        n = len(order)
        has_prev = np.empty(n, dtype=bool)
        has_prev[0] = False
        has_prev[1:] = ks[1:] == ks[:-1]
        pt = np.empty(n, dtype=np.int64)
        pt[0] = 0
        pt[1:] = ts[:-1]
        pair = has_prev & ~crs
        d = np.where(pair, ts - pt, 0)
        digits = np.searchsorted(powers, np.abs(d), side="right") + 1
        band = np.where(d == 0, 0, np.sign(d) * digits)
        key = (ks[pair] * nbd + band[pair] + off).astype(np.int64)
        cnt = np.bincount(key, minlength=ns * nbd).astype(np.int64)
        keep = np.flatnonzero(cnt)
        return pa.table(
            {
                "s": pa.array(keep // nbd),
                "band": pa.array(keep % nbd - off),
                "n": pa.array(cnt[keep]),
            }
        )

    cells = _kw_partition(full, kernel, shuffle_parts(_adaptive_k(sf_dir)))

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "stride_band": pa.array([], pa.int64()),
                    "n_pairs": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["s", "band"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return pa.table(
            {
                "source": srcs.take(g["s"]),
                "stride_band": pc.cast(g["band"], pa.int64()),
                "n_pairs": pc.cast(g["n_sum"], pa.int64()),
            }
        )

    return hash_partition_merge(cells, "s", merge, k=1)


def events_value_tails(sf_dir: str) -> Dataset:
    """E186: value-tail occupancy board — compute the CORPUS-GLOBAL
    discrete p10/p90 of the cent payload, then per source: events,
    events strictly below the global p10, strictly above the global
    p90 — which sources own the payload tails (E146 fences outliers
    per source against its OWN quartiles; E186 places each source on
    the shared scale: one source owning the high tail is where the
    money actually is, one owning the low tail is the chatter — the
    cross-source calibration a global alert threshold silently
    assumes away).  One dense row per source ALWAYS; exact int64
    under the quantile_disc rank rule (global quantile CTE + FILTER
    counts oracle).

    Scale shape — T172's two bounded passes on the cents axis: a
    (cents, n) histogram reduces to two driver scalars via one k=1
    merge; pass 2 is ZERO-exchange compare + bincount per batch."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    def hist_partial(b: pa.Table) -> pa.Table:
        cents = np.rint(
            b["value"].combine_chunks().to_numpy(zero_copy_only=False)
            * 100.0
        ).astype(np.int64)
        u, cnt = np.unique(cents, return_counts=True)
        return pa.table(
            {"c": pa.array(u), "n": pa.array(cnt.astype(np.int64))}
        )

    def hist_fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"c": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        g = t.group_by("c", use_threads=False).aggregate([("n", "sum")])
        return g.rename_columns(["c", "n"])

    hist = (
        hash_partition_merge(
            rd.read_parquet(
                f"{sf_dir}/events.parquet", columns=["value"]
            ).map_batches(
                hist_partial, batch_format="pyarrow", zero_copy_batch=True
            ),
            "c",
            hist_fold,
            k=_adaptive_k(sf_dir),
        )
        .to_pandas()
        .sort_values("c")
    )
    cs = hist["c"].to_numpy()
    cnts = hist["n"].to_numpy()
    tot = int(cnts.sum())
    cum = np.cumsum(cnts)
    t10 = int(cs[np.searchsorted(cum, (tot * 100 + 999) // 1000)])
    t90 = int(cs[np.searchsorted(cum, (tot * 900 + 999) // 1000)])

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        cents = np.rint(
            b["value"].combine_chunks().to_numpy(zero_copy_only=False)
            * 100.0
        ).astype(np.int64)
        ne = np.bincount(code, minlength=ns).astype(np.int64)
        lo = np.bincount(code[cents < t10], minlength=ns).astype(np.int64)
        hi = np.bincount(code[cents > t90], minlength=ns).astype(np.int64)
        return pa.table(
            {
                "s": pa.array(np.arange(ns, dtype=np.int64)),
                "ne": pa.array(ne),
                "lo": pa.array(lo),
                "hi": pa.array(hi),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("source", "n_events", "n_below_p10", "n_above_p90")
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[1:]},
                }
            )
        g = t.group_by("s", use_threads=False).aggregate(
            [("ne", "sum"), ("lo", "sum"), ("hi", "sum")]
        )
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        ne = g["ne_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        lo = g["lo_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        hi = g["hi_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = ne > 0
        ss, ne, lo, hi = ss[keep], ne[keep], lo[keep], hi[keep]
        order = np.argsort(ss)
        ss, ne, lo, hi = ss[order], ne[order], lo[order], hi[order]
        return pa.table(
            {
                "source": srcs.take(pa.array(ss, pa.int64())),
                "n_events": pa.array(ne, pa.int64()),
                "n_below_p10": pa.array(lo, pa.int64()),
                "n_above_p90": pa.array(hi, pa.int64()),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "s", merge, k=1)


def events_heartbeat(
    sf_dir: str, window_us: int = TEMPORAL_WINDOW_US
) -> Dataset:
    """E187: heartbeat board — per source: adjacent-pair count, the
    single most common inter-arrival gap in floor-seconds (ties →
    smallest), its count, and its permille — the polling-loop
    detector (E137 detects CLOCK-ALIGNED emission, E81/E39 distribute
    the gaps; E187 asks whether ONE interval dominates: a fat modal
    permille at 60 s is a cron heartbeat wearing an event stream's
    clothes — dedupe it from engagement metrics — while organic
    arrivals spread their gaps).  One dense row per source ALWAYS
    (sources with no pairs report zeros).  Exact int64 (lag + gap
    GROUP BY + argmax oracle).

    Scale shape — E147's carried-prefix pairs reduce to (source, gap)
    cells in the window kernel; ONE (source, gap)-hash exchange
    settles each gap's count and keeps per-partition bests; the k=1
    merge argmaxes O(parts × sources) candidates."""
    from ..stages.shuffle import hash_partition_merge, shuffle_parts
    from ..stages.temporal import _kw_partition

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def narrow(b: pa.Table) -> pa.Table:
        ts_us = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
        )
        return pa.table(
            {
                "k": pc.cast(
                    pc.index_in(b["event_type"], value_set=srcs), pa.int64()
                ),
                "t": pa.array(ts_us, pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
                "v": pa.array(ts_us, pa.int64()),
                "carry": pa.array(np.zeros(b.num_rows, dtype=bool)),
                "w": pa.array(ts_us // window_us, pa.int64()),
            }
        )

    tagged = ds.map_batches(narrow, batch_format="pyarrow")
    carries = _last_event_carries(tagged)
    full = tagged.union(
        carries.map_batches(_tag_carry, batch_format="pyarrow")
    )

    def kernel(t_: pa.Table) -> pa.Table:
        cols = ("sg", "n")
        if t_.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        kk = t_["k"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t_["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t_["o"].combine_chunks().to_numpy(zero_copy_only=False)
        cr = t_["carry"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cr, oo, tt, kk))
        ks, ts, crs = kk[order], tt[order], cr[order]
        n = len(order)
        has_prev = np.empty(n, dtype=bool)
        has_prev[0] = False
        has_prev[1:] = ks[1:] == ks[:-1]
        pt = np.empty(n, dtype=np.int64)
        pt[0] = 0
        pt[1:] = ts[:-1]
        pair = has_prev & ~crs
        gap = (ts - pt) // 1_000_000
        key = ks[pair] * (1 << 40) + gap[pair]
        u, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {"sg": pa.array(u), "n": pa.array(cnt.astype(np.int64))}
        )

    cells = _kw_partition(full, kernel, shuffle_parts(_adaptive_k(sf_dir)))

    def fold(t: pa.Table) -> pa.Table:
        cols = ("s", "gap", "cnt", "tot")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by("sg", use_threads=False).aggregate([("n", "sum")])
        sg = g["sg"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        s = sg >> 40
        gap = sg & ((1 << 40) - 1)
        order = np.lexsort((gap, -n, s))
        first = np.empty(len(order), dtype=bool)
        s_s = s[order]
        first[0] = True
        first[1:] = s_s[1:] != s_s[:-1]
        sel = order[first]
        tot = np.zeros(ns, np.int64)
        np.add.at(tot, s, n)
        keep = np.flatnonzero(tot)
        best_g = np.zeros(ns, np.int64)
        best_c = np.zeros(ns, np.int64)
        best_g[s[sel]] = gap[sel]
        best_c[s[sel]] = n[sel]
        return pa.table(
            {
                "s": pa.array(keep),
                "gap": pa.array(best_g[keep]),
                "cnt": pa.array(best_c[keep]),
                "tot": pa.array(tot[keep]),
            }
        )

    settled = hash_partition_merge(
        cells, "sg", fold, k=_adaptive_k(sf_dir)
    )

    def merge(t: pa.Table) -> pa.Table:
        out = (
            "source",
            "n_pairs",
            "modal_gap_s",
            "modal_count",
            "modal_permille",
        )
        full_src = np.arange(ns, dtype=np.int64)
        tot = np.zeros(ns, np.int64)
        best_g = np.zeros(ns, np.int64)
        best_c = np.zeros(ns, np.int64)
        if t.num_rows:
            ss = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
            gap = t["gap"].combine_chunks().to_numpy(zero_copy_only=False)
            cnt = t["cnt"].combine_chunks().to_numpy(zero_copy_only=False)
            tt_ = t["tot"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(tot, ss, tt_)
            order = np.lexsort((gap, -cnt, ss))
            first = np.empty(len(order), dtype=bool)
            ss_s = ss[order]
            first[0] = True
            first[1:] = ss_s[1:] != ss_s[:-1]
            sel = order[first]
            best_g[ss[sel]] = gap[sel]
            best_c[ss[sel]] = cnt[sel]
        return pa.table(
            {
                "source": srcs.take(pa.array(full_src, pa.int64())),
                "n_pairs": pa.array(tot, pa.int64()),
                "modal_gap_s": pa.array(best_g, pa.int64()),
                "modal_count": pa.array(best_c, pa.int64()),
                "modal_permille": pa.array(
                    1000 * best_c // np.maximum(tot, 1), pa.int64()
                ),
            }
        )

    return hash_partition_merge(settled, "s", merge, k=1)


def events_resurrection_trend(
    sf_dir: str, lapse_days: int = 30
) -> Dataset:
    """E188: user resurrection trend — per ISO-ish week (epoch-day//7)
    of the RETURN event: returning events (a user's consecutive active
    days ``lapse_days``+ apart, counted at the return day) and total
    repeat user-days — the win-back curve on the telemetry side (R95
    reads it off the ORDER book; E53 distributes return gaps without a
    time axis; E188 shows WHEN the lapsed came back — a resurrection
    spike that follows a campaign week is attribution, one that
    follows an outage is recovery, and the permille divides out).
    Dense small output (weeks); exact int64 (per-user day lag + gap
    filter + week GROUP BY oracle).

    Scale shape — ONE user-hash exchange over distinct (user, day)
    cells: each partition lexsorts its complete users once, adjacent
    day-pairs classify in place, and (week, repeats, resurrections)
    partials fold k=1."""
    from ..stages.shuffle import hash_partition_merge

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        uid = (
            pc.cast(b["user_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        day = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // 86_400_000_000
        )
        u = np.unique(uid * (1 << 40) + day)
        return pa.table({"ud": pa.array(u)})

    def fold(t: pa.Table) -> pa.Table:
        cols = ("wk", "nrep", "nres")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        ud = np.unique(
            t["ud"].combine_chunks().to_numpy(zero_copy_only=False)
        )
        u = ud >> 40
        d = ud & ((1 << 40) - 1)
        n = len(ud)
        has_prev = np.empty(n, dtype=bool)
        has_prev[0] = False
        has_prev[1:] = u[1:] == u[:-1]
        pd_ = np.empty(n, dtype=np.int64)
        pd_[0] = 0
        pd_[1:] = d[:-1]
        gap = d - pd_
        res = has_prev & (gap >= lapse_days)
        wk = d // 7
        sel = has_prev
        uw, idx = np.unique(wk[sel], return_inverse=True)
        nrep = np.bincount(idx).astype(np.int64)
        nres = np.zeros(len(uw), np.int64)
        np.add.at(nres, idx, res[sel].astype(np.int64))
        return pa.table(
            {
                "wk": pa.array(uw),
                "nrep": pa.array(nrep),
                "nres": pa.array(nres),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("week", "n_repeat_days", "n_resurrections",
               "resurrection_permille")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by("wk", use_threads=False).aggregate(
            [("nrep", "sum"), ("nres", "sum")]
        )
        wk = g["wk"].combine_chunks().to_numpy(zero_copy_only=False)
        nrep = g["nrep_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        nres = g["nres_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "week": pa.array(wk, pa.int64()),
                "n_repeat_days": pa.array(nrep, pa.int64()),
                "n_resurrections": pa.array(nres, pa.int64()),
                "resurrection_permille": pa.array(
                    1000 * nres // np.maximum(nrep, 1), pa.int64()
                ),
            }
        )

    cells = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    def add_u(b: pa.Table) -> pa.Table:
        ud = b["ud"].combine_chunks().to_numpy(zero_copy_only=False)
        return b.append_column("u", pa.array(ud >> 40, pa.int64()))

    folded = hash_partition_merge(
        cells.map_batches(add_u, batch_format="pyarrow"),
        "u",
        fold,
        k=_adaptive_k(sf_dir),
    )
    return hash_partition_merge(folded, "wk", merge, k=1)


def events_session_richness(sf_dir: str, gap_s: int = 6 * 3600) -> Dataset:
    """E191: session type-richness histogram — for each k: sessions whose
    events span exactly k DISTINCT event types, and the total events those
    sessions hold — the breadth-of-visit distribution next to E78's
    breadth-of-USER board (a user can be multi-type across a lifetime yet
    every visit be single-purpose; E191 reads the visit itself, the
    difference between a portal and a deep-link farm) and E69's
    single-target conversion read (k generalizes "contains the target" to
    the full mix).  Rows exist for each k attained by ≥1 session (k=1
    always exists — never vacuous).  Exact int64 (the E15 islands CTE +
    per-session count-DISTINCT + histogram oracle).

    Scale shape — E69's narrow per-event exchange (user, ts, order,
    type-RANK — strings never shuffle, the ≤ |types| list broadcasts):
    each user-hash partition lexsorts its complete user streams once,
    splits sessions at the 6h gap rule with the (ts, event_id)
    tie-break, ORs per-session type BITMASKS with one
    np.bitwise_or.reduceat (|types| ≤ 63 guarded loudly), popcounts, and
    reduces straight to ≤ |types| (k, n_sessions, n_events) partials;
    the k=1 merge sums two bincounts.  Session rows never materialize.

    Partitioning assumption: one user's full event stream fits a task
    (the E15 sessionize default); the windowed boundary-fold sessionize
    (E189) applies verbatim if a corpus-hot user exists."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    nt = len(srcs)
    if nt > 63:
        raise ValueError(
            "events_session_richness: >63 event types — widen the bitmask "
            "fold (two uint64 lanes) before using it on this corpus"
        )

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "user_id", "event_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def narrow(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "t": b["ts"].cast(pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
                "ty": pc.cast(
                    pc.index_in(b["event_type"], value_set=srcs), pa.int64()
                ),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "k": pa.array([], pa.int64()),
                    "ns": pa.array([], pa.int64()),
                    "ne": pa.array([], pa.int64()),
                }
            )
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t["o"].combine_chunks().to_numpy(zero_copy_only=False)
        ty = t["ty"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((oo, tt, uu))
        u2, t2, ty2 = uu[order], tt[order], ty[order]
        new_s = np.empty(len(order), dtype=bool)
        new_s[0] = True
        new_s[1:] = (u2[1:] != u2[:-1]) | (
            t2[1:] - t2[:-1] > gap_s * 1_000_000
        )
        starts = np.flatnonzero(new_s)
        masks = np.bitwise_or.reduceat(
            np.left_shift(np.int64(1), ty2), starts
        )
        # popcount over ≤ nt live bits, vectorized across sessions
        k = np.zeros(len(starts), np.int64)
        for bit in range(nt):
            k += (masks >> bit) & 1
        n_ev = np.diff(starts, append=len(order)).astype(np.int64)
        ns = np.bincount(k, minlength=nt + 1)
        ne = np.bincount(k, weights=n_ev, minlength=nt + 1).astype(np.int64)
        live = np.flatnonzero(ns)
        return pa.table(
            {
                "k": pa.array(live.astype(np.int64)),
                "ns": pa.array(ns[live].astype(np.int64)),
                "ne": pa.array(ne[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        ns = np.zeros(nt + 1, np.int64)
        ne = np.zeros(nt + 1, np.int64)
        if t.num_rows:
            kk = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                ns, kk,
                t["ns"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                ne, kk,
                t["ne"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        live = np.flatnonzero(ns)
        return pa.table(
            {
                "n_types": pa.array(live.astype(np.int64)),
                "n_sessions": pa.array(ns[live]),
                "n_events": pa.array(ne[live]),
            }
        )

    narrow_ds = ds.map_batches(narrow, batch_format="pyarrow")
    partials = hash_partition_merge(
        narrow_ds, "user_id", fold, k=_adaptive_k(sf_dir)
    )
    return hash_partition_merge(partials, "k", merge, k=1)


def events_session_bounce(sf_dir: str, gap_s: int = 6 * 3600) -> Dataset:
    """E192: session bounce board by entry type — per ENTRY event type
    (the session's first event under the (ts, event_id) tie-break):
    sessions opened by it, single-event BOUNCE sessions among them, and
    the bounce permille — the landing-quality read none of the session
    or endpoint boards carry (E73 reads each USER's lifetime endpoints,
    E51 funnels first OCCURRENCES, E191 counts a session's type breadth;
    E192 asks which door people leave from without taking a second step
    — per-entry-point bounce is the first number a funnel owner asks
    for).  One row per type that ever opens a session; exact int64 (the
    E15 islands CTE + row_number/count window + permille oracle).

    Scale shape — E191's narrow per-event exchange verbatim (user, ts,
    order, type-RANK; the ≤ |types| list broadcasts, strings never
    shuffle): each user-hash partition lexsorts once, splits sessions at
    the 6h gap rule, reads entry types with ONE take at the session
    starts and session sizes with one np.diff, and reduces to ≤ |types|
    (entry, n_sessions, n_bounce) partials; the k=1 merge sums two
    bincounts and emits the permille.

    Partitioning assumption: one user's full event stream fits a task
    (the E15 sessionize default); the windowed boundary-fold sessionize
    (E189) applies verbatim if a corpus-hot user exists."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    nt = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "user_id", "event_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def narrow(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "t": b["ts"].cast(pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
                "ty": pc.cast(
                    pc.index_in(b["event_type"], value_set=srcs), pa.int64()
                ),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "e": pa.array([], pa.int64()),
                    "ns": pa.array([], pa.int64()),
                    "nb": pa.array([], pa.int64()),
                }
            )
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t["o"].combine_chunks().to_numpy(zero_copy_only=False)
        ty = t["ty"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((oo, tt, uu))
        u2, t2, ty2 = uu[order], tt[order], ty[order]
        new_s = np.empty(len(order), dtype=bool)
        new_s[0] = True
        new_s[1:] = (u2[1:] != u2[:-1]) | (
            t2[1:] - t2[:-1] > gap_s * 1_000_000
        )
        starts = np.flatnonzero(new_s)
        entry = ty2[starts]
        n_ev = np.diff(starts, append=len(order))
        ns = np.bincount(entry, minlength=nt)
        nb = np.bincount(entry[n_ev == 1], minlength=nt)
        live = np.flatnonzero(ns)
        return pa.table(
            {
                "e": pa.array(live.astype(np.int64)),
                "ns": pa.array(ns[live].astype(np.int64)),
                "nb": pa.array(nb[live].astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        ns = np.zeros(nt, np.int64)
        nb = np.zeros(nt, np.int64)
        if t.num_rows:
            ee = t["e"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                ns, ee,
                t["ns"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                nb, ee,
                t["nb"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        live = np.flatnonzero(ns)
        return pa.table(
            {
                "entry_type": pc.take(srcs, pa.array(live)),
                "n_sessions": pa.array(ns[live]),
                "n_bounce": pa.array(nb[live]),
                "bounce_permille": pa.array(
                    1000 * nb[live] // np.maximum(ns[live], 1)
                ),
            }
        )

    narrow_ds = ds.map_batches(narrow, batch_format="pyarrow")
    partials = hash_partition_merge(
        narrow_ds, "user_id", fold, k=_adaptive_k(sf_dir)
    )
    return hash_partition_merge(partials, "e", merge, k=1)


def events_session_heat(sf_dir: str, gap_s: int = 6 * 3600) -> Dataset:
    """E193: session heat bands — split every multi-event session at its
    event-count midpoint (first ⌊n/2⌋ events vs the rest, (ts, event_id)
    order) and band 1000·Σfloor(value)_second // Σfloor(value)_total into
    deciles: per band, sessions and their total events — DO SESSIONS
    HEAT UP OR COOL DOWN, the within-visit value trajectory none of the
    session boards carry (E50/E106 read size/duration, E191/E192 type
    mix and bounce, E99's tenure-value couples value with USER AGE;
    E193 reads the visit's own arc: bands ≫ 5 mean value concentrates
    late — checkout-at-the-end journeys; bands ≪ 5 mean the visit opens
    with its biggest action and decays — notification-driven pokes).
    Sessions with ≥ 2 events and positive floored value total only
    (a one-event session has no arc; a zero-value session no scale).
    One row per OCCUPIED band; exact int64 (islands CTE + row_number/
    count windows + CASE-split sums + banded GROUP BY oracle).

    Scale shape — E191's narrow per-event exchange plus the int64
    floor(value) lane: per user-hash partition one lexsort, 6h session
    split, within-session positions by one cumsum-offset subtraction,
    half-split sums via two np.bincount(weights) — no per-session loop;
    reduces to ≤ 11 (band, n_sessions, n_events) partials; the k=1
    merge sums two bincounts.

    Partitioning assumption: one user's full event stream fits a task
    (the E15 sessionize default); the windowed boundary-fold sessionize
    (E189) applies verbatim if a corpus-hot user exists."""
    from ..stages.shuffle import hash_partition_merge

    nb = 11

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "user_id", "event_id", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def narrow(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "t": b["ts"].cast(pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
                "v": pc.cast(pc.floor(b["value"]), pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "band": pa.array([], pa.int64()),
                    "ns": pa.array([], pa.int64()),
                    "ne": pa.array([], pa.int64()),
                }
            )
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t["o"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = t["v"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((oo, tt, uu))
        u2, t2, v2 = uu[order], tt[order], vv[order]
        new_s = np.empty(len(order), dtype=bool)
        new_s[0] = True
        new_s[1:] = (u2[1:] != u2[:-1]) | (
            t2[1:] - t2[:-1] > gap_s * 1_000_000
        )
        sid = np.cumsum(new_s) - 1
        starts = np.flatnonzero(new_s)
        n_ev = np.diff(starts, append=len(order))
        pos = np.arange(len(order), dtype=np.int64) - starts[sid]
        first = pos < (n_ev // 2)[sid]
        sf = np.bincount(sid[first], weights=v2[first],
                         minlength=len(starts)).astype(np.int64)
        st = np.bincount(sid, weights=v2, minlength=len(starts)).astype(
            np.int64
        )
        elig = (n_ev >= 2) & (st > 0)
        band = 1000 * (st[elig] - sf[elig]) // st[elig] // 100
        band = np.clip(band, 0, nb - 1)
        ns = np.bincount(band, minlength=nb)
        ne = np.bincount(band, weights=n_ev[elig], minlength=nb).astype(
            np.int64
        )
        live = np.flatnonzero(ns)
        return pa.table(
            {
                "band": pa.array(live.astype(np.int64)),
                "ns": pa.array(ns[live].astype(np.int64)),
                "ne": pa.array(ne[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        ns = np.zeros(nb, np.int64)
        ne = np.zeros(nb, np.int64)
        if t.num_rows:
            bb = t["band"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                ns, bb,
                t["ns"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                ne, bb,
                t["ne"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        live = np.flatnonzero(ns)
        return pa.table(
            {
                "band": pa.array(live.astype(np.int64)),
                "n_sessions": pa.array(ns[live]),
                "n_events": pa.array(ne[live]),
            }
        )

    narrow_ds = ds.map_batches(narrow, batch_format="pyarrow")
    partials = hash_partition_merge(
        narrow_ds, "user_id", fold, k=_adaptive_k(sf_dir)
    )
    return hash_partition_merge(partials, "band", merge, k=1)


def events_peak_position(sf_dir: str) -> Dataset:
    """E194: peak-position bands — for each user with ≥ 2 events, locate
    their MAXIMUM-floor(value) event (ties → earliest (ts, event_id))
    inside their lifetime event sequence and band its 0-based position
    permille 1000·idx // (n−1) into deciles: users and their total
    events per band — does a user's biggest moment come EARLY or LATE,
    the trajectory read none of the user boards carry (E89 retrieves
    the corpus's peak ROW, E119 rates per-minute bursts, E99 couples
    value with tenure LENGTH, E193 reads the arc WITHIN one session;
    E194 reads the arc of the whole account: band 10 = users still
    peaking at their last event — growing accounts; band 0 = the first
    event was the best — decaying novelty).  One row per OCCUPIED band;
    exact int64 (row_number position + max-tie-break row_number +
    banded GROUP BY oracle).

    Scale shape — E191's narrow per-event exchange plus the int64
    floor(value) lane: per user-hash partition one lexsort orders every
    user stream; per-user max via maximum.reduceat, its FIRST position
    via minimum.reduceat over a masked position array (no second sort,
    no per-user loop); reduces to ≤ 11 (band, n_users, n_events)
    partials; the k=1 merge sums two bincounts.

    Partitioning assumption: one user's full event stream fits a task
    (the E15 sessionize default)."""
    from ..stages.shuffle import hash_partition_merge

    nb = 11

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "user_id", "event_id", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def narrow(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "t": b["ts"].cast(pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
                "v": pc.cast(pc.floor(b["value"]), pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "band": pa.array([], pa.int64()),
                    "nu": pa.array([], pa.int64()),
                    "ne": pa.array([], pa.int64()),
                }
            )
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t["o"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = t["v"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((oo, tt, uu))
        u2, v2 = uu[order], vv[order]
        nrow = len(order)
        head = np.empty(nrow, dtype=bool)
        head[0] = True
        head[1:] = u2[1:] != u2[:-1]
        starts = np.flatnonzero(head)
        n_ev = np.diff(starts, append=nrow)
        sid = np.cumsum(head) - 1
        mx = np.maximum.reduceat(v2, starts)
        pos_g = np.arange(nrow, dtype=np.int64)
        cand = np.where(v2 == mx[sid], pos_g, np.int64(2**62))
        first = np.minimum.reduceat(cand, starts)
        idx = first - starts
        elig = n_ev >= 2
        band = np.minimum(
            1000 * idx[elig] // (n_ev[elig] - 1) // 100, nb - 1
        )
        nu = np.bincount(band, minlength=nb)
        ne = np.bincount(band, weights=n_ev[elig], minlength=nb).astype(
            np.int64
        )
        live = np.flatnonzero(nu)
        return pa.table(
            {
                "band": pa.array(live.astype(np.int64)),
                "nu": pa.array(nu[live].astype(np.int64)),
                "ne": pa.array(ne[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nu = np.zeros(nb, np.int64)
        ne = np.zeros(nb, np.int64)
        if t.num_rows:
            bb = t["band"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                nu, bb,
                t["nu"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                ne, bb,
                t["ne"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        live = np.flatnonzero(nu)
        return pa.table(
            {
                "band": pa.array(live.astype(np.int64)),
                "n_users": pa.array(nu[live]),
                "n_events": pa.array(ne[live]),
            }
        )

    narrow_ds = ds.map_batches(narrow, batch_format="pyarrow")
    partials = hash_partition_merge(
        narrow_ds, "user_id", fold, k=_adaptive_k(sf_dir)
    )
    return hash_partition_merge(partials, "band", merge, k=1)


def events_fade_profile(sf_dir: str) -> Dataset:
    """E195: fade-profile bands — for each user with ≥ 3 events (≥ 2
    inter-event gaps, (ts, event_id) order): compare their LAST gap with
    their median gap (quantile_disc rank rule) as r = min(1000·median //
    max(last, 1), 1000) and band r into deciles: users per band — HOW
    accounts go quiet, the deceleration read none of the recency boards
    carry (E129 measures dormancy against the corpus clock, E90 names
    churn days, E151's return gaps quantile the corpus's gap sizes;
    E195 normalizes each user's last silence by their OWN rhythm: band
    10 = the last gap is no longer than a typical gap — activity that
    stops mid-stride, the abrupt-loss signature; band 0-2 = the last
    gap dwarfs the rhythm — a long fade already visible before the
    end).  One row per OCCUPIED band; exact int64 (lag-gap +
    per-user quantile_disc + reverse row_number last-gap + banded
    GROUP BY oracle; gaps in exact microseconds).

    Scale shape — E191's narrow per-event exchange (user, ts, order —
    no payload at all): per user-hash partition one lexsort orders
    every stream; gaps fall out of one shifted subtraction, the last
    gap reads off each contiguous gap-group's tail, the median via ONE
    more lexsort + offset-indexed gather (T198's selection trick, no
    per-user loop); reduces to ≤ 11 (band, n_users) partials; the k=1
    merge sums one bincount.

    Partitioning assumption: one user's full event stream fits a task
    (the E15 sessionize default)."""
    from ..stages.shuffle import hash_partition_merge

    nb = 11

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "user_id", "event_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def narrow(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "t": b["ts"].cast(pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "band": pa.array([], pa.int64()),
                    "nu": pa.array([], pa.int64()),
                }
            )
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t["o"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((oo, tt, uu))
        u2, t2 = uu[order], tt[order]
        same = u2[1:] == u2[:-1]
        gaps = (t2[1:] - t2[:-1])[same]
        gowner_raw = u2[1:][same]
        if len(gaps) == 0:
            return pa.table(
                {
                    "band": pa.array([], pa.int64()),
                    "nu": pa.array([], pa.int64()),
                }
            )
        # owners arrive contiguous and time-ordered (stream sort above)
        head = np.empty(len(gaps), dtype=bool)
        head[0] = True
        head[1:] = gowner_raw[1:] != gowner_raw[:-1]
        starts = np.flatnonzero(head)
        ng = np.diff(starts, append=len(gaps))
        lasts = np.append(starts[1:], len(gaps)) - 1
        lg = gaps[lasts]
        gsid = np.cumsum(head) - 1
        o3 = np.lexsort((gaps, gsid))
        gaps_s = gaps[o3]
        sel = starts + (ng + 1) // 2 - 1
        mg = gaps_s[sel]
        elig = ng >= 2
        r = np.minimum(1000 * mg[elig] // np.maximum(lg[elig], 1), 1000)
        band = r // 100
        nu = np.bincount(band, minlength=nb)
        live = np.flatnonzero(nu)
        return pa.table(
            {
                "band": pa.array(live.astype(np.int64)),
                "nu": pa.array(nu[live].astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nu = np.zeros(nb, np.int64)
        if t.num_rows:
            bb = t["band"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                nu, bb,
                t["nu"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        live = np.flatnonzero(nu)
        return pa.table(
            {
                "band": pa.array(live.astype(np.int64)),
                "n_users": pa.array(nu[live]),
            }
        )

    narrow_ds = ds.map_batches(narrow, batch_format="pyarrow")
    partials = hash_partition_merge(
        narrow_ds, "user_id", fold, k=_adaptive_k(sf_dir)
    )
    return hash_partition_merge(partials, "band", merge, k=1)


def events_user_heat(sf_dir: str) -> Dataset:
    """E196: account heat bands — split every user's LIFETIME event
    sequence at its count midpoint (first ⌊n/2⌋ events vs the rest,
    (ts, event_id) order) and band 1000·Σfloor(value)_second //
    Σfloor(value)_total into deciles: users and their total events per
    band — DO ACCOUNTS GROW OR DECAY IN VALUE, the mass-balance read
    that completes the account-arc pair (E194 locates the single PEAK
    event; E196 weighs the whole second half — an account can peak
    early yet still carry most value late; E193 asks the same question
    of one SESSION, E97 fits the SOURCE-level drift line: E196 is the
    per-account histogram those aggregates average away).  Users with
    ≥ 2 events and positive floored value total only.  One row per
    OCCUPIED band; exact int64 (row_number/count windows + CASE-split
    sums + banded GROUP BY oracle).

    Scale shape — E193's machinery minus the session split: per
    user-hash partition one lexsort, per-user positions by one
    cumsum-offset subtraction, half-split sums via two
    np.bincount(weights); ≤ 11 (band, n_users, n_events) partials;
    the k=1 merge sums two bincounts.

    Partitioning assumption: one user's full event stream fits a task
    (the E15 sessionize default)."""
    from ..stages.shuffle import hash_partition_merge

    nb = 11

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "user_id", "event_id", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def narrow(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "t": b["ts"].cast(pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
                "v": pc.cast(pc.floor(b["value"]), pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "band": pa.array([], pa.int64()),
                    "nu": pa.array([], pa.int64()),
                    "ne": pa.array([], pa.int64()),
                }
            )
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t["o"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = t["v"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((oo, tt, uu))
        u2, v2 = uu[order], vv[order]
        nrow = len(order)
        head = np.empty(nrow, dtype=bool)
        head[0] = True
        head[1:] = u2[1:] != u2[:-1]
        sid = np.cumsum(head) - 1
        starts = np.flatnonzero(head)
        n_ev = np.diff(starts, append=nrow)
        pos = np.arange(nrow, dtype=np.int64) - starts[sid]
        first = pos < (n_ev // 2)[sid]
        sf = np.bincount(sid[first], weights=v2[first],
                         minlength=len(starts)).astype(np.int64)
        st = np.bincount(sid, weights=v2, minlength=len(starts)).astype(
            np.int64
        )
        elig = (n_ev >= 2) & (st > 0)
        band = np.clip(
            1000 * (st[elig] - sf[elig]) // st[elig] // 100, 0, nb - 1
        )
        nu = np.bincount(band, minlength=nb)
        ne = np.bincount(band, weights=n_ev[elig], minlength=nb).astype(
            np.int64
        )
        live = np.flatnonzero(nu)
        return pa.table(
            {
                "band": pa.array(live.astype(np.int64)),
                "nu": pa.array(nu[live].astype(np.int64)),
                "ne": pa.array(ne[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nu = np.zeros(nb, np.int64)
        ne = np.zeros(nb, np.int64)
        if t.num_rows:
            bb = t["band"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                nu, bb,
                t["nu"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                ne, bb,
                t["ne"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        live = np.flatnonzero(nu)
        return pa.table(
            {
                "band": pa.array(live.astype(np.int64)),
                "n_users": pa.array(nu[live]),
                "n_events": pa.array(ne[live]),
            }
        )

    narrow_ds = ds.map_batches(narrow, batch_format="pyarrow")
    partials = hash_partition_merge(
        narrow_ds, "user_id", fold, k=_adaptive_k(sf_dir)
    )
    return hash_partition_merge(partials, "band", merge, k=1)


def events_props_value_coupling(sf_dir: str) -> Dataset:
    """E197: payload↔envelope coupling moments — per source: events whose
    ``props`` JSON parses to an integer ``k`` (the E82 lane), events
    that do NOT, and the exact integer sufficient statistics (Σk, Σk²,
    Σv, Σv², Σk·v over the parsable rows, v = floor(value)) — does the
    message BODY agree with the envelope's value column, the
    cross-field coherence audit neither lane alone can run (E82 reads
    the body's k in isolation, E97 fits value against TIME; E197
    couples the two fields event-by-event: Pearson/slope derive
    off-line, the R44 discipline — a near-zero coupling on a feed whose
    schema doc claims "k mirrors value" is an integration bug caught in
    one scan).  One dense row per source ALWAYS; exact int64
    (regexp_extract + TRY_CAST + FILTERed SUM-of-products oracle;
    parse-failure rows count in n_bad and contribute to no moment —
    the M1/M2 reject discipline applied to analytics).

    Scale shape — ZERO-shuffle scan-reduce: one vectorized
    ``pc.extract_regex`` per batch (the E82 kernel), moments formed per
    EVENT then summed per source with np.bincount(weights) — ≤ |sources|
    partial rows per batch; the k=1 merge sums seven grids."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "props", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    COLS = ("n", "bad", "sk", "sk2", "sv", "sv2", "skv")

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        ex = pc.extract_regex(
            b["props"].combine_chunks(), r'"k"\s*:\s*(?P<v>-?\d+)'
        )
        k = pc.cast(pc.struct_field(ex, "v"), pa.int64())
        bad = pc.is_null(k).to_numpy(zero_copy_only=False)
        kv = pc.fill_null(k, 0).to_numpy(zero_copy_only=False)
        v = np.floor(
            b["value"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        ok = ~bad
        g = np.zeros((7, ns), np.int64)
        g[0] = np.bincount(code[ok], minlength=ns)
        g[1] = np.bincount(code[bad], minlength=ns)
        co = code[ok]
        ko = kv[ok]
        vo = v[ok]
        for i, w in enumerate((ko, ko * ko, vo, vo * vo, ko * vo)):
            g[2 + i] = np.bincount(co, weights=w, minlength=ns).astype(
                np.int64
            )
        live = np.flatnonzero(g[0] + g[1])
        cols = {"src": pa.array(live.astype(np.int64))}
        for j, c in enumerate(COLS):
            cols[c] = pa.array(g[j][live])
        return pa.table(cols)

    def merge(t: pa.Table) -> pa.Table:
        g = np.zeros((7, ns), np.int64)
        if t.num_rows:
            s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            for j, c in enumerate(COLS):
                np.add.at(
                    g[j], s,
                    t[c].combine_chunks().to_numpy(zero_copy_only=False),
                )
        return pa.table(
            {
                "source": srcs,
                "n_parsed": pa.array(g[0]),
                "n_bad": pa.array(g[1]),
                "sum_k": pa.array(g[2]),
                "sum_k2": pa.array(g[3]),
                "sum_v": pa.array(g[4]),
                "sum_v2": pa.array(g[5]),
                "sum_kv": pa.array(g[6]),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "src", merge, k=1)


def events_scoped_sessions(sf_dir: str, gap_s: int = 6 * 3600) -> Dataset:
    """E198: source-scoped session board — re-run the E15 gap rule with
    sessions scoped to (user, SOURCE) instead of user alone (a 6h
    silence IN THIS FEED closes the feed's session even if the user
    stayed active elsewhere): per source: sessions, events, and the
    discrete p50 of events-per-session — the comparative read against
    the global session boards (E50/E76 count visits to the PLATFORM;
    E198 counts visits to each PRODUCT — a source whose scoped session
    count far exceeds its share of global sessions is a side-channel
    users poke between main tasks, and the per-source visit depth is
    the engagement number a product owner actually owns).  One dense
    row per source ALWAYS; exact int64 (islands CTE with the window
    PARTITIONED BY (user, type) + per-session count + quantile_disc
    oracle).

    Scale shape — E191's narrow exchange with a COMPOSITE fold key: the
    lexsort orders (user, type-rank, ts, order) so each (user, source)
    stream is contiguous; the 6h split, per-session sizes and the
    per-source size histogram (capped at 4096 events/session, larger
    sessions clamp into the top bin — logged domain, never wrong
    counts) all fall out of the one sorted pass; ≤ sources × bins
    partials; the k=1 merge reads the p50 off one cumsum per source.

    Partitioning assumption: one user's full event stream fits a task
    (the E15 sessionize default)."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    nt = len(srcs)
    CAP = 4096

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "user_id", "event_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def narrow(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "t": b["ts"].cast(pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
                "ty": pc.cast(
                    pc.index_in(b["event_type"], value_set=srcs), pa.int64()
                ),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "size": pa.array([], pa.int64()),
                    "f": pa.array([], pa.int64()),
                }
            )
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t["o"].combine_chunks().to_numpy(zero_copy_only=False)
        ty = t["ty"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((oo, tt, ty, uu))
        u2, t2, y2 = uu[order], tt[order], ty[order]
        new_s = np.empty(len(order), dtype=bool)
        new_s[0] = True
        new_s[1:] = (
            (u2[1:] != u2[:-1])
            | (y2[1:] != y2[:-1])
            | (t2[1:] - t2[:-1] > gap_s * 1_000_000)
        )
        starts = np.flatnonzero(new_s)
        n_ev = np.diff(starts, append=len(order))
        src_s = y2[starts]
        size = np.minimum(n_ev, CAP)
        grid = np.zeros(nt * (CAP + 1), np.int64)
        np.add.at(grid, src_s * (CAP + 1) + size, 1)
        live = np.flatnonzero(grid)
        return pa.table(
            {
                "src": pa.array(live // (CAP + 1)),
                "size": pa.array(live % (CAP + 1)),
                "f": pa.array(grid[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        grid = np.zeros(nt * (CAP + 1), np.int64)
        if t.num_rows:
            s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            z = t["size"].combine_chunks().to_numpy(zero_copy_only=False)
            f = t["f"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(grid, s * (CAP + 1) + z, f)
        g2 = grid.reshape(nt, CAP + 1)
        ns_ = g2.sum(axis=1)
        ne = (g2 * np.arange(CAP + 1, dtype=np.int64)[None, :]).sum(axis=1)
        cum = np.cumsum(g2, axis=1)
        thr = (ns_ * 500 + 999) // 1000
        p50 = np.minimum((cum >= thr[:, None]).argmax(axis=1), CAP)
        return pa.table(
            {
                "source": srcs,
                "n_sessions": pa.array(ns_.astype(np.int64)),
                "n_events": pa.array(ne.astype(np.int64)),
                "p50_events": pa.array(
                    np.where(ns_ > 0, p50, 0).astype(np.int64)
                ),
            }
        )

    narrow_ds = ds.map_batches(narrow, batch_format="pyarrow")
    partials = hash_partition_merge(
        narrow_ds, "user_id", fold, k=_adaptive_k(sf_dir)
    )
    return hash_partition_merge(partials, "src", merge, k=1)


def events_onboarding_share(sf_dir: str, window_s: int = 3600) -> Dataset:
    """E199: onboarding-share bands — for each user, the permille of
    their LIFETIME events that fall within the first hour after their
    first event ((ts, event_id) order), banded into deciles: users and
    total events per band — the burst-then-gone signature none of the
    tenure boards isolate (E98/E99 measure tenure LENGTH and value,
    E59 accounts daily news/churn, E196 weighs the value mass; E199
    reads activation shape: band 10 = the whole account lived inside
    one hour — drive-by traffic and bot bursts; low bands = the first
    hour was a taste and the account matured — the activation funnel's
    denominator).  Users with ≥ 2 events only (a single event is
    trivially band 10).  One row per OCCUPIED band; exact int64
    (per-user min-ts window + CASE-count + banded GROUP BY oracle).

    Scale shape — E191's narrow per-event exchange: per user-hash
    partition one lexsort, first timestamps via minimum at group heads,
    the window membership is one vectorized compare, per-user counts
    via two bincounts; ≤ 11 partials; k=1 merge.

    Partitioning assumption: one user's full event stream fits a task
    (the E15 sessionize default)."""
    from ..stages.shuffle import hash_partition_merge

    nb = 11

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "user_id", "event_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def narrow(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "t": b["ts"].cast(pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "band": pa.array([], pa.int64()),
                    "nu": pa.array([], pa.int64()),
                    "ne": pa.array([], pa.int64()),
                }
            )
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t["o"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((oo, tt, uu))
        u2, t2 = uu[order], tt[order]
        nrow = len(order)
        head = np.empty(nrow, dtype=bool)
        head[0] = True
        head[1:] = u2[1:] != u2[:-1]
        sid = np.cumsum(head) - 1
        starts = np.flatnonzero(head)
        n_ev = np.diff(starts, append=nrow)
        first_t = t2[starts]
        inwin = t2 <= (first_t[sid] + window_s * 1_000_000)
        nf = np.bincount(sid[inwin], minlength=len(starts))
        elig = n_ev >= 2
        band = np.minimum(
            1000 * nf[elig] // n_ev[elig] // 100, nb - 1
        )
        nu = np.bincount(band, minlength=nb)
        ne = np.bincount(band, weights=n_ev[elig], minlength=nb).astype(
            np.int64
        )
        live = np.flatnonzero(nu)
        return pa.table(
            {
                "band": pa.array(live.astype(np.int64)),
                "nu": pa.array(nu[live].astype(np.int64)),
                "ne": pa.array(ne[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nu = np.zeros(nb, np.int64)
        ne = np.zeros(nb, np.int64)
        if t.num_rows:
            bb = t["band"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                nu, bb,
                t["nu"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                ne, bb,
                t["ne"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        live = np.flatnonzero(nu)
        return pa.table(
            {
                "band": pa.array(live.astype(np.int64)),
                "n_users": pa.array(nu[live]),
                "n_events": pa.array(ne[live]),
            }
        )

    narrow_ds = ds.map_batches(narrow, batch_format="pyarrow")
    partials = hash_partition_merge(
        narrow_ds, "user_id", fold, k=_adaptive_k(sf_dir)
    )
    return hash_partition_merge(partials, "band", merge, k=1)


def events_habit_strength(sf_dir: str, min_events: int = 7) -> Dataset:
    """E200: habit-strength bands — for each user with ≥ ``min_events``
    events, the permille share of their events falling on their MODAL
    weekday (the maximum over the user's 7 weekday counts; the share
    needs no tie-break), banded into deciles: users and total events
    per band — how RITUALIZED is each account, the user-axis
    concentration the calendar boards average away (E52/E155 profile
    the SOURCE's weekly shape, E110 names each user's modal HOUR but
    not its dominance, E78 spreads users across types; E200 measures
    whether a user's week has a spine: band 10 = strictly-weekly
    ritual accounts — newsletter-driven or cron-like, bands 1-2 =
    uniform 143‰-ish — no weekly structure at all).  One row per
    OCCUPIED band; exact int64 (dayofweek + per-(user, dow) count +
    per-user max + banded GROUP BY oracle; ≥ 7 events so one week of
    evidence exists).

    Scale shape — ONE narrow exchange of PRE-REDUCED (user, dow, n)
    cells (batches collapse with one packed np.unique — at most 7 rows
    per user per batch ship, not events): the user-hash fold re-combines
    cells, takes each user's max and total with two reduceats, and
    collapses to ≤ 11 (band, n_users, n_events) partials; k=1 merge."""
    from ..stages.shuffle import hash_partition_merge

    nb = 11
    DAY_US = 86_400_000_000

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "user_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        uu = pc.cast(b["user_id"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        day = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        dow = (day + 4) % 7
        packed, cnt = np.unique(uu * 7 + dow, return_counts=True)
        return pa.table(
            {
                "u": pa.array(packed // 7),
                "dow": pa.array(packed % 7),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "band": pa.array([], pa.int64()),
                    "nu": pa.array([], pa.int64()),
                    "ne": pa.array([], pa.int64()),
                }
            )
        uu = t["u"].combine_chunks().to_numpy(zero_copy_only=False)
        dw = t["dow"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        packed, inv = np.unique(uu * 7 + dw, return_inverse=True)
        cn = np.zeros(len(packed), np.int64)
        np.add.at(cn, inv, nn)
        us = packed // 7
        head = np.empty(len(packed), dtype=bool)
        head[0] = True
        head[1:] = us[1:] != us[:-1]
        starts = np.flatnonzero(head)
        total = np.add.reduceat(cn, starts)
        mx = np.maximum.reduceat(cn, starts)
        elig = total >= min_events
        band = np.minimum(
            1000 * mx[elig] // total[elig] // 100, nb - 1
        )
        nu = np.bincount(band, minlength=nb)
        ne = np.bincount(band, weights=total[elig], minlength=nb).astype(
            np.int64
        )
        live = np.flatnonzero(nu)
        return pa.table(
            {
                "band": pa.array(live.astype(np.int64)),
                "nu": pa.array(nu[live].astype(np.int64)),
                "ne": pa.array(ne[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nu = np.zeros(nb, np.int64)
        ne = np.zeros(nb, np.int64)
        if t.num_rows:
            bb = t["band"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                nu, bb,
                t["nu"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                ne, bb,
                t["ne"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        live = np.flatnonzero(nu)
        return pa.table(
            {
                "band": pa.array(live.astype(np.int64)),
                "n_users": pa.array(nu[live]),
                "n_events": pa.array(ne[live]),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "u", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "band", merge, k=1)


def events_exit_gap(
    sf_dir: str, gap_s: int = 6 * 3600, cap_min: int = 43_200
) -> Dataset:
    """E201: exit-type absence quantiles — for every ADJACENT session
    pair of a user (E15's 6h islands), key the gap between the earlier
    session's END and the next session's START by the earlier session's
    EXIT type (its last event under the (ts, event_id) tie-break), gap
    in floor-minutes capped at ``cap_min`` (30 days — the cap keeps the
    quantile domain dense and is mirrored in the oracle): per exit
    type: gaps, discrete p50/p90 — WHICH GOODBYE PREDICTS THE LONGEST
    ABSENCE, the causal-flavored read the session boards keep separate
    (E73 crosses entry/exit types with no TIME, E151/E130 quantile the
    gaps with no TYPE, E192 scores the bounce at the door; E201 joins
    them: an 'error' exit followed by a week of silence is rage-quit
    evidence no aggregate of either axis can show).  One row per exit
    type that closes a non-final session; exact int64 (islands +
    per-session last-type row_number + lead(start) + LEAST-capped
    floor-minute + quantile_disc oracle).

    Scale shape — E191's narrow exchange: one lexsort per user-hash
    partition; session ends/starts and exit types read off the split
    boundaries, adjacent-session gaps are one shifted subtraction
    masked to same-user, and the partition collapses to a
    ≤ |types| × (cap+1) minute grid; the k=1 merge reads both
    quantiles off one cumsum per type.

    Partitioning assumption: one user's full event stream fits a task
    (the E15 sessionize default)."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    nt = len(srcs)
    W = cap_min + 1

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "user_id", "event_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def narrow(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "t": b["ts"].cast(pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
                "ty": pc.cast(
                    pc.index_in(b["event_type"], value_set=srcs), pa.int64()
                ),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "ty": pa.array([], pa.int64()),
                    "m": pa.array([], pa.int64()),
                    "f": pa.array([], pa.int64()),
                }
            )
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t["o"].combine_chunks().to_numpy(zero_copy_only=False)
        ty = t["ty"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((oo, tt, uu))
        u2, t2, y2 = uu[order], tt[order], ty[order]
        new_s = np.empty(len(order), dtype=bool)
        new_s[0] = True
        new_s[1:] = (u2[1:] != u2[:-1]) | (
            t2[1:] - t2[:-1] > gap_s * 1_000_000
        )
        starts = np.flatnonzero(new_s)
        ends = np.append(starts[1:], len(order)) - 1
        s_user = u2[starts]
        exit_ty = y2[ends]
        end_ts = t2[ends]
        start_ts = t2[starts]
        # adjacent sessions of the SAME user
        same = s_user[1:] == s_user[:-1]
        gap_min = np.minimum(
            (start_ts[1:] - end_ts[:-1])[same] // 60_000_000, cap_min
        )
        ety = exit_ty[:-1][same]
        grid = np.zeros(nt * W, np.int64)
        np.add.at(grid, ety * W + gap_min, 1)
        live = np.flatnonzero(grid)
        return pa.table(
            {
                "ty": pa.array(live // W),
                "m": pa.array(live % W),
                "f": pa.array(grid[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        grid = np.zeros(nt * W, np.int64)
        if t.num_rows:
            y = t["ty"].combine_chunks().to_numpy(zero_copy_only=False)
            m = t["m"].combine_chunks().to_numpy(zero_copy_only=False)
            f = t["f"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(grid, y * W + m, f)
        g2 = grid.reshape(nt, W)
        n = g2.sum(axis=1)
        cum = np.cumsum(g2, axis=1)
        out = {}
        for q, name in ((500, "p50_minutes"), (900, "p90_minutes")):
            thr = (n * q + 999) // 1000
            idx = np.minimum((cum >= thr[:, None]).argmax(axis=1), W - 1)
            out[name] = np.where(n > 0, idx, 0)
        live = np.flatnonzero(n)
        return pa.table(
            {
                "exit_type": pc.take(srcs, pa.array(live)),
                "n_gaps": pa.array(n[live].astype(np.int64)),
                "p50_minutes": pa.array(
                    out["p50_minutes"][live].astype(np.int64)
                ),
                "p90_minutes": pa.array(
                    out["p90_minutes"][live].astype(np.int64)
                ),
            }
        )

    narrow_ds = ds.map_batches(narrow, batch_format="pyarrow")
    partials = hash_partition_merge(
        narrow_ds, "user_id", fold, k=_adaptive_k(sf_dir)
    )
    return hash_partition_merge(partials, "ty", merge, k=1)


def events_double_fire(sf_dir: str) -> Dataset:
    """E202: double-fire detector — group events by the full PAYLOAD
    identity (source, user, floor(value), truncated SECOND) and count,
    per source: events, events inside a multiplicity-≥2 group, the
    doubled permille, and the worst single-group multiplicity — the
    producer-side retry signature E84 cannot see (E84's redelivery
    board needs the SAME event_id twice — broker redelivery; a producer
    that times out and re-emits gets a FRESH id, identical payload,
    same second, and only payload-identity grouping catches it; E140's
    stuck detector needs the copies CONSECUTIVE, E144's collisions only
    share a timestamp).  One dense row per source ALWAYS; exact int64
    (4-key GROUP BY + CASE-sum + max oracle).

    Scale shape — ONE narrow hash exchange of PRE-REDUCED cells: each
    batch collapses to (source-rank, user, value-floor, second, n)
    cells with one Arrow group_by; the USER-hash partition holds every
    cell of a payload group (user is in the key), re-combines
    cross-batch copies with a second group_by, and collapses IN PLACE
    to ≤ |sources| (events, doubled, max) partials; k=1 merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "user_id", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "src": pc.cast(
                    pc.index_in(b["event_type"], value_set=srcs), pa.int64()
                ),
                "u": pc.cast(b["user_id"], pa.int64()),
                "v": pc.cast(pc.floor(b["value"]), pa.int64()),
                # int64 truncating divide == floor for non-negative ts
                "s": pc.divide(b["ts"].cast(pa.int64()), 1_000_000),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        g = t.group_by(["src", "u", "v", "s"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return g.rename_columns(["src", "u", "v", "s", "n"])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "ne": pa.array([], pa.int64()),
                    "nd": pa.array([], pa.int64()),
                    "mx": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["src", "u", "v", "s"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        g = g.rename_columns(["src", "u", "v", "s", "n"])
        src = g["src"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n"].combine_chunks().to_numpy(zero_copy_only=False)
        ne = np.bincount(src, weights=n, minlength=ns).astype(np.int64)
        dd = n >= 2
        nd = np.bincount(src[dd], weights=n[dd], minlength=ns).astype(
            np.int64
        )
        mx = np.zeros(ns, np.int64)
        np.maximum.at(mx, src, n)
        live = np.flatnonzero(ne)
        return pa.table(
            {
                "src": pa.array(live.astype(np.int64)),
                "ne": pa.array(ne[live]),
                "nd": pa.array(nd[live]),
                "mx": pa.array(mx[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        ne = np.zeros(ns, np.int64)
        nd = np.zeros(ns, np.int64)
        mx = np.zeros(ns, np.int64)
        if t.num_rows:
            src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                ne, src,
                t["ne"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                nd, src,
                t["nd"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.maximum.at(
                mx, src,
                t["mx"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        return pa.table(
            {
                "source": srcs,
                "n_events": pa.array(ne),
                "n_doubled": pa.array(nd),
                "doubled_permille": pa.array(
                    1000 * nd // np.maximum(ne, 1)
                ),
                "max_multiplicity": pa.array(mx),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "u", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "src", merge, k=1)


def events_value_phase_shift(sf_dir: str) -> Dataset:
    """E203: value phase-shift board — per source: the modal HOUR-OF-DAY
    by event COUNT, the modal hour by floored-VALUE mass (ties → the
    smaller hour, both), each mode's share permille of its own total,
    and the circular hour distance between the two modes — do the BIG
    events keep the same clock as the many, the phase comparison the
    clock boards leave implicit (E30/E93 profile the COUNT clock, E%
    value-clock boards profile the VALUE clock; E203 reduces the two
    24-vectors to one actionable number: distance 0 = load-shedding at
    the count peak also protects the value peak; a 10-hour shift =
    revenue arrives while capacity planning sleeps).  One dense row
    per source ALWAYS; exact int64 (two hour-grid argmaxes via
    row_number + circular LEAST distance oracle).

    Scale shape — ZERO-shuffle scan-reduce: each batch collapses to a
    ≤ sources × 24 (count, value) grid with two bincounts; the k=1
    merge sums grids and takes two argmaxes per source."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)
    HOUR_US = 3_600_000_000

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        hour = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // HOUR_US
            % 24
        )
        v = np.floor(
            b["value"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        idx = code * 24 + hour
        gn = np.bincount(idx, minlength=ns * 24).astype(np.int64)
        gv = np.bincount(idx, weights=v, minlength=ns * 24).astype(np.int64)
        live = np.flatnonzero(gn)
        return pa.table(
            {
                "cell": pa.array(live.astype(np.int64)),
                "n": pa.array(gn[live]),
                "v": pa.array(gv[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        gn = np.zeros(ns * 24, np.int64)
        gv = np.zeros(ns * 24, np.int64)
        if t.num_rows:
            cell = t["cell"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                gn, cell,
                t["n"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                gv, cell,
                t["v"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        n2 = gn.reshape(ns, 24)
        v2 = gv.reshape(ns, 24)
        ch = n2.argmax(axis=1)
        # value mode over OCCUPIED hours only (an all-zero value source
        # must still tie-break among hours that have events, like the
        # oracle's GROUP BY shape)
        vh = np.where(n2 > 0, v2, np.int64(-1)).argmax(axis=1)
        tot_n = n2.sum(axis=1)
        tot_v = v2.sum(axis=1)
        d = np.abs(ch - vh)
        dist = np.minimum(d, 24 - d)
        live = np.flatnonzero(tot_n)
        return pa.table(
            {
                "source": pc.take(srcs, pa.array(live)),
                "count_modal_hour": pa.array(ch[live].astype(np.int64)),
                "count_modal_permille": pa.array(
                    1000 * n2[live, ch[live]] // np.maximum(tot_n[live], 1)
                ),
                "value_modal_hour": pa.array(vh[live].astype(np.int64)),
                "value_modal_permille": pa.array(
                    1000 * v2[live, vh[live]] // np.maximum(tot_v[live], 1)
                ),
                "phase_distance": pa.array(dist[live].astype(np.int64)),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "cell", merge, k=1)


def events_session_endpoints(sf_dir: str, gap_s: int = 6 * 3600) -> Dataset:
    """E204: session endpoint matrix — per (entry_type, exit_type) of
    every session (first/last event under the (ts, event_id)
    tie-break): sessions and their total events — how JOURNEYS begin
    and end at visit grain, the matrix E73 draws for user LIFETIMES and
    E192 collapses to the entry marginal (the diagonal is single-mode
    visits — E192's bounces all live there with entry = exit; the
    off-diagonal mass is the actual task flow: view→purchase sessions
    are conversions in one number, purchase→error sessions are the
    checkout-crash signature).  One row per occupied (entry, exit)
    pair; exact int64 (islands + two row_number endpoint picks +
    two-key GROUP BY oracle).

    Scale shape — E191's narrow exchange: entry/exit types read off the
    session split boundaries (one take each), session sizes via
    np.diff; the partition collapses to a ≤ |types|² grid; k=1 merge.

    Partitioning assumption: one user's full event stream fits a task
    (the E15 sessionize default)."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    nt = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "user_id", "event_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def narrow(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "t": b["ts"].cast(pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
                "ty": pc.cast(
                    pc.index_in(b["event_type"], value_set=srcs), pa.int64()
                ),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    "ns": pa.array([], pa.int64()),
                    "ne": pa.array([], pa.int64()),
                }
            )
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t["o"].combine_chunks().to_numpy(zero_copy_only=False)
        ty = t["ty"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((oo, tt, uu))
        u2, t2, y2 = uu[order], tt[order], ty[order]
        new_s = np.empty(len(order), dtype=bool)
        new_s[0] = True
        new_s[1:] = (u2[1:] != u2[:-1]) | (
            t2[1:] - t2[:-1] > gap_s * 1_000_000
        )
        starts = np.flatnonzero(new_s)
        ends = np.append(starts[1:], len(order)) - 1
        n_ev = np.diff(starts, append=len(order))
        cell = y2[starts] * nt + y2[ends]
        grid_s = np.zeros(nt * nt, np.int64)
        grid_e = np.zeros(nt * nt, np.int64)
        np.add.at(grid_s, cell, 1)
        np.add.at(grid_e, cell, n_ev)
        live = np.flatnonzero(grid_s)
        return pa.table(
            {
                "cell": pa.array(live.astype(np.int64)),
                "ns": pa.array(grid_s[live]),
                "ne": pa.array(grid_e[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        grid_s = np.zeros(nt * nt, np.int64)
        grid_e = np.zeros(nt * nt, np.int64)
        if t.num_rows:
            cell = t["cell"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                grid_s, cell,
                t["ns"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                grid_e, cell,
                t["ne"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        live = np.flatnonzero(grid_s)
        return pa.table(
            {
                "entry_type": pc.take(srcs, pa.array(live // nt)),
                "exit_type": pc.take(srcs, pa.array(live % nt)),
                "n_sessions": pa.array(grid_s[live]),
                "n_events": pa.array(grid_e[live]),
            }
        )

    narrow_ds = ds.map_batches(narrow, batch_format="pyarrow")
    partials = hash_partition_merge(
        narrow_ds, "user_id", fold, k=_adaptive_k(sf_dir)
    )
    return hash_partition_merge(partials, "cell", merge, k=1)


def events_dow_anova(sf_dir: str) -> Dataset:
    """E205: weekday variance-decomposition stats — per (source,
    dayofweek Sunday=0): active days, Σ(daily total), Σ(daily total)²
    — the exact-int64 sufficient statistics of a one-way ANOVA of
    daily volume on weekday (between-group vs within-group variance,
    η², F — all derive off-line, the R44 discipline): HOW MUCH of a
    source's day-to-day volume variance the weekly cycle actually
    explains, the strength number E49's per-dow means and E52's
    heatmap only suggest (a strong profile with a huge residual means
    the weekly shape is real but useless for forecasting; E155's lag-7
    autocovariance reads persistence, E205 reads explained variance).
    One row per (source, dow) with ≥ 1 active day; exact int64
    (two-level GROUP BY — day totals then weekday moments — oracle).

    Scale shape — ONE narrow exchange of PRE-REDUCED (source, day, n)
    cells (batches collapse with one packed np.unique); the DAY-hash
    fold settles each day's exact total locally and re-reduces IN
    PLACE to a ≤ sources × 7 moment grid; k=1 densifying merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)
    DAY_US = 86_400_000_000

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        day = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        packed, cnt = np.unique(day * ns + code, return_counts=True)
        return pa.table(
            {
                "d": pa.array(packed // ns),
                "src": pa.array(packed % ns),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    "nd": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                    "s2": pa.array([], pa.int64()),
                }
            )
        dd = t["d"].combine_chunks().to_numpy(zero_copy_only=False)
        src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        packed, inv = np.unique(dd * ns + src, return_inverse=True)
        tot = np.zeros(len(packed), np.int64)
        np.add.at(tot, inv, nn)
        day_u = packed // ns
        src_u = packed % ns
        dow = (day_u + 4) % 7
        cell = src_u * 7 + dow
        g_nd = np.zeros(ns * 7, np.int64)
        g_s = np.zeros(ns * 7, np.int64)
        g_s2 = np.zeros(ns * 7, np.int64)
        np.add.at(g_nd, cell, 1)
        np.add.at(g_s, cell, tot)
        np.add.at(g_s2, cell, tot * tot)
        live = np.flatnonzero(g_nd)
        return pa.table(
            {
                "cell": pa.array(live.astype(np.int64)),
                "nd": pa.array(g_nd[live]),
                "s": pa.array(g_s[live]),
                "s2": pa.array(g_s2[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        g_nd = np.zeros(ns * 7, np.int64)
        g_s = np.zeros(ns * 7, np.int64)
        g_s2 = np.zeros(ns * 7, np.int64)
        if t.num_rows:
            cell = t["cell"].combine_chunks().to_numpy(zero_copy_only=False)
            for acc, col in ((g_nd, "nd"), (g_s, "s"), (g_s2, "s2")):
                np.add.at(
                    acc, cell,
                    t[col].combine_chunks().to_numpy(zero_copy_only=False),
                )
        live = np.flatnonzero(g_nd)
        return pa.table(
            {
                "source": pc.take(srcs, pa.array(live // 7)),
                "dow": pa.array((live % 7).astype(np.int64)),
                "n_days": pa.array(g_nd[live]),
                "sum_events": pa.array(g_s[live]),
                "sum_events2": pa.array(g_s2[live]),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "d", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "cell", merge, k=1)


def events_return_door(
    sf_dir: str, gap_s: int = 6 * 3600, absence_days: int = 7
) -> Dataset:
    """E206: comeback-door attribution — among all NON-FIRST sessions,
    key each by its ENTRY type and count (a) all such returns and
    (b) COMEBACKS: returns after an absence of ≥ ``absence_days``
    between the previous session's end and this session's start; plus
    the comeback share permille per door — WHICH FEATURE WINS USERS
    BACK, the re-engagement attribution that inverts E201 (E201 asks
    which EXIT predicts a long absence; E206 asks which ENTRY ends
    one: a type over-represented among comebacks relative to routine
    returns is the winback channel — usually the notification — and
    the number is the denominator a winback campaign is graded
    against).  One row per entry type with ≥ 1 return; exact int64
    (islands + lag(end) + threshold CASE + permille oracle).

    Scale shape — E191's narrow exchange: session starts/ends and
    entry types off the split boundaries, previous-session gaps one
    masked shifted subtraction; ≤ |types| (returns, comebacks)
    partials; k=1 merge.

    Partitioning assumption: one user's full event stream fits a task
    (the E15 sessionize default)."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    nt = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "user_id", "event_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def narrow(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "t": b["ts"].cast(pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
                "ty": pc.cast(
                    pc.index_in(b["event_type"], value_set=srcs), pa.int64()
                ),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "ty": pa.array([], pa.int64()),
                    "nr": pa.array([], pa.int64()),
                    "nc": pa.array([], pa.int64()),
                }
            )
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t["o"].combine_chunks().to_numpy(zero_copy_only=False)
        ty = t["ty"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((oo, tt, uu))
        u2, t2, y2 = uu[order], tt[order], ty[order]
        new_s = np.empty(len(order), dtype=bool)
        new_s[0] = True
        new_s[1:] = (u2[1:] != u2[:-1]) | (
            t2[1:] - t2[:-1] > gap_s * 1_000_000
        )
        starts = np.flatnonzero(new_s)
        ends = np.append(starts[1:], len(order)) - 1
        s_user = u2[starts]
        entry_ty = y2[starts]
        start_ts = t2[starts]
        end_ts = t2[ends]
        same = s_user[1:] == s_user[:-1]
        ety = entry_ty[1:][same]
        gap = (start_ts[1:] - end_ts[:-1])[same]
        comeback = gap >= absence_days * 86_400_000_000
        nr = np.bincount(ety, minlength=nt)
        ncb = np.bincount(ety[comeback], minlength=nt)
        live = np.flatnonzero(nr)
        return pa.table(
            {
                "ty": pa.array(live.astype(np.int64)),
                "nr": pa.array(nr[live].astype(np.int64)),
                "nc": pa.array(ncb[live].astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nr = np.zeros(nt, np.int64)
        nc = np.zeros(nt, np.int64)
        if t.num_rows:
            y = t["ty"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                nr, y,
                t["nr"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                nc, y,
                t["nc"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        live = np.flatnonzero(nr)
        return pa.table(
            {
                "entry_type": pc.take(srcs, pa.array(live)),
                "n_returns": pa.array(nr[live]),
                "n_comebacks": pa.array(nc[live]),
                "comeback_permille": pa.array(
                    1000 * nc[live] // np.maximum(nr[live], 1)
                ),
            }
        )

    narrow_ds = ds.map_batches(narrow, batch_format="pyarrow")
    partials = hash_partition_merge(
        narrow_ds, "user_id", fold, k=_adaptive_k(sf_dir)
    )
    return hash_partition_merge(partials, "ty", merge, k=1)


def events_door_retention(sf_dir: str, horizon_days: int = 28) -> Dataset:
    """E207: acquisition-door retention — per the TYPE of each user's
    FIRST-EVER event ((ts, event_id) order): users acquired through that
    door, users RETAINED (any event ≥ ``horizon_days`` after their
    first), and the retention permille — WHICH DOOR BRINGS USERS WHO
    STAY, the acquisition-quality read the first-touch boards stop
    short of (E74 names the first source per user, E102 times
    adoption, E113 compares first vs primary TYPE; E207 attaches the
    OUTCOME: a door with heavy volume and bottom-decile retention is
    buying tourists, and the per-door permille is the number growth
    spend is actually graded on).  One row per door with ≥ 1 acquired
    user; exact int64 (per-user first-row row_number + lifespan
    threshold + permille oracle).

    Scale shape — E191's narrow exchange: per user-hash partition one
    lexsort; the first event's type reads off each group head, the
    lifespan off head/tail timestamps; ≤ |types| partials; k=1 merge.

    Partitioning assumption: one user's full event stream fits a task
    (the E15 sessionize default)."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    nt = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "user_id", "event_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def narrow(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "t": b["ts"].cast(pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
                "ty": pc.cast(
                    pc.index_in(b["event_type"], value_set=srcs), pa.int64()
                ),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "ty": pa.array([], pa.int64()),
                    "nu": pa.array([], pa.int64()),
                    "nr": pa.array([], pa.int64()),
                }
            )
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t["o"].combine_chunks().to_numpy(zero_copy_only=False)
        ty = t["ty"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((oo, tt, uu))
        u2, t2, y2 = uu[order], tt[order], ty[order]
        head = np.empty(len(order), dtype=bool)
        head[0] = True
        head[1:] = u2[1:] != u2[:-1]
        starts = np.flatnonzero(head)
        lasts = np.append(starts[1:], len(order)) - 1
        door = y2[starts]
        retained = (
            t2[lasts] - t2[starts] >= horizon_days * 86_400_000_000
        )
        nu = np.bincount(door, minlength=nt)
        nr = np.bincount(door[retained], minlength=nt)
        live = np.flatnonzero(nu)
        return pa.table(
            {
                "ty": pa.array(live.astype(np.int64)),
                "nu": pa.array(nu[live].astype(np.int64)),
                "nr": pa.array(nr[live].astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nu = np.zeros(nt, np.int64)
        nr = np.zeros(nt, np.int64)
        if t.num_rows:
            y = t["ty"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                nu, y,
                t["nu"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                nr, y,
                t["nr"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        live = np.flatnonzero(nu)
        return pa.table(
            {
                "door_type": pc.take(srcs, pa.array(live)),
                "n_users": pa.array(nu[live]),
                "n_retained": pa.array(nr[live]),
                "retention_permille": pa.array(
                    1000 * nr[live] // np.maximum(nu[live], 1)
                ),
            }
        )

    narrow_ds = ds.map_batches(narrow, batch_format="pyarrow")
    partials = hash_partition_merge(
        narrow_ds, "user_id", fold, k=_adaptive_k(sf_dir)
    )
    return hash_partition_merge(partials, "ty", merge, k=1)


def events_drawdown(sf_dir: str) -> Dataset:
    """E208: volume drawdown board — per source, over the DAILY total
    series in calendar order: active days, the peak day's total, and
    the MAXIMUM DRAWDOWN (the largest value of running-peak − today
    over the series) — the finance read applied to traffic (E97/E172
    fit drift LINES, E37's CUSUM pings level shifts as they happen;
    E208 scores the worst sustained collapse in one number: a source
    whose drawdown ≈ its peak died at some point — the
    silent-deprecation signature — while a drawdown ≪ peak never lost
    its audience even across E44's anomalies).  One dense row per
    source ALWAYS; exact int64 (daily GROUP BY + running max window +
    max difference oracle).

    Scale shape — ONE narrow exchange of PRE-REDUCED (source, day, n)
    cells (batches collapse with one packed np.unique; the exchange
    carries DAYS, not events): the SOURCE-hash fold holds a source's
    whole daily series — bounded by the calendar, thousands of rows at
    any corpus size — combines cells, sorts once by day, and takes one
    cummax pass; k=1 densifying merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)
    DAY_US = 86_400_000_000

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        day = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        packed, cnt = np.unique(day * ns + code, return_counts=True)
        return pa.table(
            {
                "src": pa.array(packed % ns),
                "day": pa.array(packed // ns),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "nd": pa.array([], pa.int64()),
                    "peak": pa.array([], pa.int64()),
                    "dd": pa.array([], pa.int64()),
                }
            )
        src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        day = t["day"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        # combine cells, then walk each source's day-ordered series
        key = src * (1 << 40) + day  # days << 2**40 for any horizon
        packed, inv = np.unique(key, return_inverse=True)
        tot = np.zeros(len(packed), np.int64)
        np.add.at(tot, inv, nn)
        src_u = packed >> 40
        head = np.empty(len(packed), dtype=bool)
        head[0] = True
        head[1:] = src_u[1:] != src_u[:-1]
        # running max per source segment (the segment loop is bounded by
        # |sources| in this partition, not by data)
        run = tot.copy()
        starts = np.flatnonzero(head)
        for s, e in zip(starts, np.append(starts[1:], len(tot))):
            run[s:e] = np.maximum.accumulate(tot[s:e])
        dd_all = run - tot
        nd = np.diff(np.append(starts, len(tot)))
        peak = np.maximum.reduceat(tot, starts)
        dd = np.maximum.reduceat(dd_all, starts)
        return pa.table(
            {
                "src": pa.array(src_u[starts].astype(np.int64)),
                "nd": pa.array(nd.astype(np.int64)),
                "peak": pa.array(peak),
                "dd": pa.array(dd),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nd = np.zeros(ns, np.int64)
        peak = np.zeros(ns, np.int64)
        dd = np.zeros(ns, np.int64)
        if t.num_rows:
            src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                nd, src,
                t["nd"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.maximum.at(
                peak, src,
                t["peak"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.maximum.at(
                dd, src,
                t["dd"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        live = np.flatnonzero(nd)
        return pa.table(
            {
                "source": pc.take(srcs, pa.array(live)),
                "n_days": pa.array(nd[live]),
                "peak_day_events": pa.array(peak[live]),
                "max_drawdown": pa.array(dd[live]),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "src", fold, k=max(ns, 1))
    return hash_partition_merge(cells, "src", merge, k=1)


def events_clock_migration(sf_dir: str) -> Dataset:
    """E209: circadian migration matrix — split every user's (≥ 2
    events) lifetime at its count midpoint; in each half find the
    user's MODAL 6-hour day-part (0 = 00-06, 1 = 06-12, 2 = 12-18,
    3 = 18-24; ties → the smaller band) and count users per
    (early_band, late_band) cell — DO USERS DRIFT AROUND THE CLOCK,
    the within-account circadian read the static clocks cannot show
    (E110 names each user's lifetime modal hour, E52 the source
    heatmap; E209's off-diagonal is the population whose daily slot
    CHANGED — the job-change / timezone-move / shift-work signal, and
    a systematic drift toward band 3 is the engagement-decay-into-
    evenings pattern growth teams watch for).  One row per occupied
    cell (≤ 16); exact int64 (row_number half split + per-(user, half,
    band) count + modal row_number + matrix GROUP BY oracle).

    Scale shape — E191's narrow exchange: per user-hash partition one
    lexsort, per-user positions by cumsum-offset subtraction, the
    (user, half, band) counts via ONE bincount on a packed key, both
    modal picks via grid argmax over 4 lanes; ≤ 16 partials; k=1
    merge.

    Partitioning assumption: one user's full event stream fits a task
    (the E15 sessionize default)."""
    from ..stages.shuffle import hash_partition_merge

    HOUR_US = 3_600_000_000

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "user_id", "event_id"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def narrow(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "t": b["ts"].cast(pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    "nu": pa.array([], pa.int64()),
                }
            )
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t["o"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((oo, tt, uu))
        u2, t2 = uu[order], tt[order]
        nrow = len(order)
        head = np.empty(nrow, dtype=bool)
        head[0] = True
        head[1:] = u2[1:] != u2[:-1]
        sid = np.cumsum(head) - 1
        starts = np.flatnonzero(head)
        n_ev = np.diff(starts, append=nrow)
        pos = np.arange(nrow, dtype=np.int64) - starts[sid]
        half = (pos >= (n_ev // 2)[sid]).astype(np.int64)
        band = t2 // HOUR_US % 24 // 6
        nu_users = len(starts)
        counts = np.zeros(nu_users * 8, np.int64)
        np.add.at(counts, sid * 8 + half * 4 + band, 1)
        c2 = counts.reshape(nu_users, 2, 4)
        eb = c2[:, 0, :].argmax(axis=1)
        lb = c2[:, 1, :].argmax(axis=1)
        elig = n_ev >= 2
        cell = eb[elig] * 4 + lb[elig]
        grid = np.zeros(16, np.int64)
        np.add.at(grid, cell, 1)
        live = np.flatnonzero(grid)
        return pa.table(
            {
                "cell": pa.array(live.astype(np.int64)),
                "nu": pa.array(grid[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        grid = np.zeros(16, np.int64)
        if t.num_rows:
            cell = t["cell"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                grid, cell,
                t["nu"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        live = np.flatnonzero(grid)
        return pa.table(
            {
                "early_band": pa.array((live // 4).astype(np.int64)),
                "late_band": pa.array((live % 4).astype(np.int64)),
                "n_users": pa.array(grid[live]),
            }
        )

    narrow_ds = ds.map_batches(narrow, batch_format="pyarrow")
    partials = hash_partition_merge(
        narrow_ds, "user_id", fold, k=_adaptive_k(sf_dir)
    )
    return hash_partition_merge(partials, "cell", merge, k=1)


def events_top_users(sf_dir: str, kk: int = 3) -> Dataset:
    """E210: per-source top-value users — for each source the top
    ``kk`` users by LIFETIME floored-value total (ties → the lower
    user_id), with 1-based ranks — grouped record RETRIEVAL at the
    account grain (E89 retrieves the single hottest EVENT, E121 the
    busiest user-minutes, E126-family boards aggregate the whale mass
    away; E210 names the whales per feed — the rows an account team
    actually opens — through the same two-phase grouped top-k the
    engine uses everywhere a full sort would be wasted).  ≤ kk rows
    per source; exact int64 (per-user SUM + row_number ≤ kk oracle).

    Scale shape — ONE user-hash exchange of PRE-REDUCED (source, user,
    Σv) cells (batches collapse with one Arrow group_by; each user's
    exact total settles in their partition), then
    ``stages.shuffle.grouped_topk`` — the per-batch combiner keeps at
    most kk candidate rows per source, so the second exchange carries
    O(partitions × sources × kk) rows, never the user table."""
    from ..stages.shuffle import grouped_topk, hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "user_id", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "src": pc.cast(
                    pc.index_in(b["event_type"], value_set=srcs), pa.int64()
                ),
                "u": pc.cast(b["user_id"], pa.int64()),
                "v": pc.cast(pc.floor(b["value"]), pa.int64()),
            }
        )
        g = t.group_by(["src", "u"], use_threads=False).aggregate(
            [("v", "sum")]
        )
        return g.rename_columns(["src", "u", "v"])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "u": pa.array([], pa.int64()),
                    "v": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["src", "u"], use_threads=False).aggregate(
            [("v", "sum")]
        )
        return g.rename_columns(["src", "u", "v"])

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    totals = hash_partition_merge(
        partials, "u", fold, k=_adaptive_k(sf_dir)
    )
    top = grouped_topk(totals, key="src", value="v", order_id="u", kk=kk)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": pc.take(
                    srcs, pc.cast(b["src"], pa.int64())
                ),
                "rank": b["rank"],
                "user_id": b["u"],
                "value_floor": b["v"],
            }
        )

    return top.map_batches(finish, batch_format="pyarrow")


def events_phase_concentration(sf_dir: str) -> Dataset:
    """E211: daily-phase concentration — per source, over the 1440
    minute-of-day cells: total events, the exact Simpson sufficient
    statistic Σ_m n_m·(n_m − 1) over cell totals, and the peak cell's
    share permille — HOW PEAKED is the daily profile as one number
    (E30/E35 draw the profile, E93 quantiles its phase, E107 names the
    hottest cell; E211 collapses the shape: the Simpson ratio
    Σn(n−1)/(N(N−1)) is the probability two random events share a
    minute-of-day — near 1/1440 for a flat feed, orders of magnitude
    higher for a cron spike — and it is the E38/E70 statistic moved to
    the PHASE axis).  One dense row per source ALWAYS; exact int64
    (minute-of-day GROUP BY + Σn(n−1) + peak share oracle).

    Scale shape — ZERO-shuffle scan-reduce... almost: per-batch cells
    are partial counts whose squares do NOT add, so the (source,
    minute) cells take ONE narrow exchange keyed by MINUTE (1440-way,
    skew-free) where exact totals settle; each partition re-reduces to
    per-source (n, Σn(n−1), max) partials — max composes because a
    minute's total lives in one partition; k=1 merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)
    MIN_US = 60_000_000

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        mod = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // MIN_US
            % 1440
        )
        packed, cnt = np.unique(mod * ns + code, return_counts=True)
        return pa.table(
            {
                "m": pa.array(packed // ns),
                "src": pa.array(packed % ns),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "s2": pa.array([], pa.int64()),
                    "mx": pa.array([], pa.int64()),
                }
            )
        mm = t["m"].combine_chunks().to_numpy(zero_copy_only=False)
        src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        packed, inv = np.unique(mm * ns + src, return_inverse=True)
        tot = np.zeros(len(packed), np.int64)
        np.add.at(tot, inv, nn)
        src_u = packed % ns
        n = np.bincount(src_u, weights=tot, minlength=ns).astype(np.int64)
        s2 = np.bincount(
            src_u, weights=tot * (tot - 1), minlength=ns
        ).astype(np.int64)
        mx = np.zeros(ns, np.int64)
        np.maximum.at(mx, src_u, tot)
        live = np.flatnonzero(n)
        return pa.table(
            {
                "src": pa.array(live.astype(np.int64)),
                "n": pa.array(n[live]),
                "s2": pa.array(s2[live]),
                "mx": pa.array(mx[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        n = np.zeros(ns, np.int64)
        s2 = np.zeros(ns, np.int64)
        mx = np.zeros(ns, np.int64)
        if t.num_rows:
            src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                n, src,
                t["n"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                s2, src,
                t["s2"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.maximum.at(
                mx, src,
                t["mx"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        live = np.flatnonzero(n)
        return pa.table(
            {
                "source": pc.take(srcs, pa.array(live)),
                "n_events": pa.array(n[live]),
                "simpson_num": pa.array(s2[live]),
                "peak_share_permille": pa.array(
                    1000 * mx[live] // np.maximum(n[live], 1)
                ),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "m", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "src", merge, k=1)


def events_zero_value(sf_dir: str) -> Dataset:
    """E212: value-field health trend — per (source, calendar year):
    events, events whose floored value is ZERO, and the zero permille —
    the field-degradation trend none of the value boards isolate (E141
    audits value INTEGER-ness, E140 frozen repeats, E44 anomalies;
    E212 watches the simplest failure of all: an instrumentation
    regression that starts emitting empty/zeroed payloads shows up as
    a zero-share step in exactly one source-year before it poisons
    every downstream mean — and the year axis makes the regression
    datable without a changepoint model).  One row per occupied
    (source, year) cell; exact int64 (floor + CASE + two-key GROUP BY
    oracle).

    Scale shape — ZERO-shuffle scan-reduce: each batch collapses to a
    ≤ sources × years grid with two bincounts; the k=1 merge folds
    O(batches × cells) rows."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)
    DAY_US = 86_400_000_000

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        day = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        yr = day.astype("datetime64[D]").astype("datetime64[Y]").astype(
            np.int64
        )
        v0 = (
            np.floor(
                b["value"].combine_chunks().to_numpy(zero_copy_only=False)
            ).astype(np.int64)
            == 0
        )
        key = yr * ns + code
        packed, inv = np.unique(key, return_inverse=True)
        n = np.bincount(inv)
        nz = np.bincount(inv[v0], minlength=len(packed))
        return pa.table(
            {
                "cell": pa.array(packed),
                "n": pa.array(n.astype(np.int64)),
                "nz": pa.array(nz.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "year": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "n_zero": pa.array([], pa.int64()),
                    "zero_permille": pa.array([], pa.int64()),
                }
            )
        cell = t["cell"].combine_chunks().to_numpy(zero_copy_only=False)
        ucell, inv = np.unique(cell, return_inverse=True)
        n = np.zeros(len(ucell), np.int64)
        nz = np.zeros(len(ucell), np.int64)
        np.add.at(
            n, inv, t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        )
        np.add.at(
            nz, inv, t["nz"].combine_chunks().to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "source": pc.take(srcs, pa.array(ucell % ns)),
                "year": pa.array((ucell // ns + 1970).astype(np.int64)),
                "n_events": pa.array(n),
                "n_zero": pa.array(nz),
                "zero_permille": pa.array(1000 * nz // np.maximum(n, 1)),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "cell", merge, k=1)


def events_session_value_doors(
    sf_dir: str, gap_s: int = 6 * 3600
) -> Dataset:
    """E213: session value by entry door — per ENTRY type: sessions
    opened by it, their total floored-value mass, and each door's
    share permille of ALL session value — WHICH DOOR MAKES THE MONEY,
    completing the door family's missing axis (E192 scores the
    bounce, E207 retention, E206 comebacks, E201 the absence after;
    E213 weighs the visit itself: a door with modest session counts
    and outsized value share is the high-intent entry worth paying
    for placement, and the comparison with E192's bounce column is
    the entire landing-page debate in two rows).  One row per type
    that opens a session; exact int64 (islands + entry row_number +
    per-session value SUM + share oracle).

    Scale shape — E191's narrow exchange plus the int64 floor(value)
    lane: entry types off the split boundaries, per-session value via
    one np.bincount(weights); ≤ |types| partials; the k=1 merge sums
    and forms shares against the global total.

    Partitioning assumption: one user's full event stream fits a task
    (the E15 sessionize default)."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    nt = len(srcs)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "user_id", "event_id", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def narrow(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "t": b["ts"].cast(pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
                "ty": pc.cast(
                    pc.index_in(b["event_type"], value_set=srcs), pa.int64()
                ),
                "v": pc.cast(pc.floor(b["value"]), pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "ty": pa.array([], pa.int64()),
                    "ns": pa.array([], pa.int64()),
                    "sv": pa.array([], pa.int64()),
                }
            )
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t["o"].combine_chunks().to_numpy(zero_copy_only=False)
        ty = t["ty"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = t["v"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((oo, tt, uu))
        u2, t2, y2, v2 = uu[order], tt[order], ty[order], vv[order]
        new_s = np.empty(len(order), dtype=bool)
        new_s[0] = True
        new_s[1:] = (u2[1:] != u2[:-1]) | (
            t2[1:] - t2[:-1] > gap_s * 1_000_000
        )
        sid = np.cumsum(new_s) - 1
        starts = np.flatnonzero(new_s)
        entry = y2[starts]
        sval = np.bincount(sid, weights=v2, minlength=len(starts)).astype(
            np.int64
        )
        ns = np.bincount(entry, minlength=nt)
        sv = np.bincount(entry, weights=sval, minlength=nt).astype(np.int64)
        live = np.flatnonzero(ns)
        return pa.table(
            {
                "ty": pa.array(live.astype(np.int64)),
                "ns": pa.array(ns[live].astype(np.int64)),
                "sv": pa.array(sv[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        ns = np.zeros(nt, np.int64)
        sv = np.zeros(nt, np.int64)
        if t.num_rows:
            y = t["ty"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                ns, y,
                t["ns"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                sv, y,
                t["sv"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        tot = max(int(sv.sum()), 1)
        live = np.flatnonzero(ns)
        return pa.table(
            {
                "entry_type": pc.take(srcs, pa.array(live)),
                "n_sessions": pa.array(ns[live]),
                "value_floor": pa.array(sv[live]),
                "value_share_permille": pa.array(1000 * sv[live] // tot),
            }
        )

    narrow_ds = ds.map_batches(narrow, batch_format="pyarrow")
    partials = hash_partition_merge(
        narrow_ds, "user_id", fold, k=_adaptive_k(sf_dir)
    )
    return hash_partition_merge(partials, "ty", merge, k=1)


def events_props_spectrum(sf_dir: str) -> Dataset:
    """E214: payload-k spectrum — per (source, signed magnitude band of
    the props JSON integer ``k``: band 0 = k = 0, ±bit-length for
    positive/negative k, the E185 signed-decade convention on the bit
    axis): parsable events per band, plus the per-source unparsable
    count carried on a dedicated band column value of 99 — the BODY
    distribution the payload lane still lacked (E82 reduces k to
    sum/min/max/p50, E197 couples it with the envelope; E214 shows the
    SHAPE: a spectrum with a negative lobe where the schema doc says
    "counter" is a sign bug, a second mode at high bands is a mixed
    message type sharing one field name).  One row per occupied
    (source, band); exact int64 (regexp_extract + TRY_CAST + signed
    length(bin(abs)) + GROUP BY oracle).

    Scale shape — ZERO-shuffle scan-reduce: one pc.extract_regex per
    batch (the E82 kernel), bands via vectorized frexp on |k|, one
    packed bincount to a ≤ sources × 131 grid; k=1 merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)
    OFF = 65  # band index offset: band b stored at b + OFF (b in ±64, 99)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "props"],
        override_num_blocks=_adaptive_k(sf_dir),
    )
    W = 2 * OFF + 36  # room for +bands and the 99 marker

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        ex = pc.extract_regex(
            b["props"].combine_chunks(), r'"k"\s*:\s*(?P<v>-?\d+)'
        )
        k = pc.cast(pc.struct_field(ex, "v"), pa.int64())
        bad = pc.is_null(k).to_numpy(zero_copy_only=False)
        kv = pc.fill_null(k, 0).to_numpy(zero_copy_only=False)
        mag = np.abs(kv)
        bl = np.where(
            mag == 0, 0,
            np.frexp(mag.astype(np.float64))[1].astype(np.int64),
        )
        band = np.where(kv < 0, -bl, bl)
        band = np.where(bad, np.int64(99), band)
        grid = np.zeros(ns * W, np.int64)
        np.add.at(grid, code * W + band + OFF, 1)
        live = np.flatnonzero(grid)
        return pa.table(
            {
                "src": pa.array(live // W),
                "band": pa.array(live % W - OFF),
                "n": pa.array(grid[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        grid = np.zeros(ns * W, np.int64)
        if t.num_rows:
            s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            bb = t["band"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                grid, s * W + bb + OFF,
                t["n"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        live = np.flatnonzero(grid)
        return pa.table(
            {
                "source": pc.take(srcs, pa.array(live // W)),
                "k_band": pa.array((live % W - OFF).astype(np.int64)),
                "n_events": pa.array(grid[live]),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "band", merge, k=1)


def events_band_audience(sf_dir: str) -> Dataset:
    """E215: value-band audience — per (source, bit-length band of
    floor(value); band 0 = zero): events and EXACT distinct users —
    WHO generates the big events, the audience axis E96's band heatmap
    counts away (E96 says how many events sit in each magnitude band,
    E108 bands users by lifetime TOTAL; E215 crosses magnitude with
    reach: a top band carried by a handful of users is whale revenue —
    fragile; the same band spread across thousands is a price point —
    durable, and the distinction decides whether an anomaly there is
    one account or the market).  One row per occupied (source, band);
    exact int64 (signed-safe length(bin) band + count-DISTINCT
    oracle).

    Scale shape — ONE narrow exchange of PRE-REDUCED distinct
    (source, band, user) cells (batches dedupe with one packed
    np.unique); the USER-hash partition dedupes cross-batch copies and
    collapses to ≤ sources × 34 (events, users) partials — a user's
    cells for one (source, band) all co-locate; k=1 merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)
    NB = 34

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "user_id", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        uu = pc.cast(b["user_id"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        rv = np.floor(
            b["value"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        band = np.where(
            rv <= 0, 0,
            np.frexp(np.maximum(rv, 0).astype(np.float64))[1].astype(
                np.int64
            ),
        )
        band = np.minimum(band, NB - 1)
        cell = code * NB + band
        key = uu * (ns * NB) + cell
        packed, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "u": pa.array(packed // (ns * NB)),
                "cell": pa.array(packed % (ns * NB)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    "ne": pa.array([], pa.int64()),
                    "nu": pa.array([], pa.int64()),
                }
            )
        uu = t["u"].combine_chunks().to_numpy(zero_copy_only=False)
        cell = t["cell"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        key = uu * (ns * NB) + cell
        packed, inv = np.unique(key, return_inverse=True)
        ncell = np.zeros(len(packed), np.int64)
        np.add.at(ncell, inv, nn)
        c2 = packed % (ns * NB)
        ne = np.bincount(c2, weights=ncell, minlength=ns * NB).astype(
            np.int64
        )
        nu = np.bincount(c2, minlength=ns * NB)
        live = np.flatnonzero(nu)
        return pa.table(
            {
                "cell": pa.array(live.astype(np.int64)),
                "ne": pa.array(ne[live]),
                "nu": pa.array(nu[live].astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        ne = np.zeros(ns * NB, np.int64)
        nu = np.zeros(ns * NB, np.int64)
        if t.num_rows:
            cell = t["cell"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                ne, cell,
                t["ne"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                nu, cell,
                t["nu"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        live = np.flatnonzero(nu)
        return pa.table(
            {
                "source": pc.take(srcs, pa.array(live // NB)),
                "value_band": pa.array((live % NB).astype(np.int64)),
                "n_events": pa.array(ne[live]),
                "n_users": pa.array(nu[live]),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "u", fold, k=_adaptive_k(sf_dir))
    return hash_partition_merge(cells, "cell", merge, k=1)


def events_momentum_runs(sf_dir: str, cap: int = 20) -> Dataset:
    """E216: momentum-run bands — for each user, the LONGEST strictly-
    increasing run of floored values in their (ts, event_id)-ordered
    stream (run length counted in EVENTS: k consecutive increases =
    k + 1; a lone event scores 1), capped at ``cap``: users and their
    total events per band — behavioral streakiness at the account
    grain (E31's sign-runs read the SOURCE tape, E97 fits one slope,
    E196 weighs halves; E216 asks whether individual accounts ESCALATE
    — long monotone climbs are bidding wars, dosage ramps, or
    retry-with-backoff storms depending on the domain, and the
    population histogram separates a few runaway accounts from a
    corpus-wide ramp).  One row per occupied band; exact int64
    (lag-compare + gaps-and-islands longest-run + banded GROUP BY
    oracle).

    Scale shape — E191's narrow exchange plus the floor(value) lane:
    one lexsort per partition, increase flags via one shifted compare
    masked to same-user, run lengths via boundary arithmetic, per-user
    max via maximum.reduceat; ≤ cap partials; k=1 merge.

    Partitioning assumption: one user's full event stream fits a task
    (the E15 sessionize default)."""
    from ..stages.shuffle import hash_partition_merge

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "user_id", "event_id", "value"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def narrow(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "t": b["ts"].cast(pa.int64()),
                "o": pc.cast(b["event_id"], pa.int64()),
                "v": pc.cast(pc.floor(b["value"]), pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "band": pa.array([], pa.int64()),
                    "nu": pa.array([], pa.int64()),
                    "ne": pa.array([], pa.int64()),
                }
            )
        uu = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t["o"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = t["v"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((oo, tt, uu))
        u2, v2 = uu[order], vv[order]
        nrow = len(order)
        same = u2[1:] == u2[:-1]
        inc = (v2[1:] > v2[:-1]) & same
        # run id changes where inc flips off OR user changes; longest
        # run of consecutive True in `inc` per user, +1 in events
        head = np.empty(nrow, dtype=bool)
        head[0] = True
        head[1:] = u2[1:] != u2[:-1]
        starts = np.flatnonzero(head)
        n_ev = np.diff(starts, append=nrow)
        # vectorized consecutive-True run lengths via the reset-index
        # trick: runlen[i] = i - (last position whose inc flag is off)
        pos = np.arange(nrow, dtype=np.int64)
        flat = np.zeros(nrow, np.int64)
        flat[1:] = inc.astype(np.int64)
        last_reset = np.maximum.accumulate(np.where(flat == 0, pos, 0))
        runlen = pos - last_reset
        maxrun = np.maximum.reduceat(runlen, starts) + 1
        # a user's first row has flat=0 (reset) so runs never cross users
        band = np.minimum(maxrun, cap)
        nu = np.bincount(band, minlength=cap + 1)
        ne = np.bincount(band, weights=n_ev, minlength=cap + 1).astype(
            np.int64
        )
        live = np.flatnonzero(nu)
        return pa.table(
            {
                "band": pa.array(live.astype(np.int64)),
                "nu": pa.array(nu[live].astype(np.int64)),
                "ne": pa.array(ne[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nu = np.zeros(cap + 1, np.int64)
        ne = np.zeros(cap + 1, np.int64)
        if t.num_rows:
            bb = t["band"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                nu, bb,
                t["nu"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                ne, bb,
                t["ne"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        live = np.flatnonzero(nu)
        return pa.table(
            {
                "run_band": pa.array(live.astype(np.int64)),
                "n_users": pa.array(nu[live]),
                "n_events": pa.array(ne[live]),
            }
        )

    narrow_ds = ds.map_batches(narrow, batch_format="pyarrow")
    partials = hash_partition_merge(
        narrow_ds, "user_id", fold, k=_adaptive_k(sf_dir)
    )
    return hash_partition_merge(partials, "band", merge, k=1)


def events_schedule_shift(sf_dir: str) -> Dataset:
    """E217: schedule-shift board — split each source's calendar at its
    own midpoint day ((first_day + last_day) // 2, inclusive left) and
    compare the modal HOUR-OF-DAY of the two halves (ties → smaller
    hour): per source both modal hours and their circular distance —
    DID THE FEED'S CLOCK MOVE, the schedule-change detector the static
    clocks average away (E30/E93 profile the whole history as one
    shape; E209 tracks USER clock drift; E217 watches the SOURCE: a
    6-hour shift between halves is a cron migration, a timezone
    misconfiguration, or a producer redeploy — datable to the midpoint
    without a changepoint model).  One dense row per source ALWAYS;
    exact int64 (per-source min/max day + half split + two modal
    row_numbers + circular LEAST oracle).

    Scale shape — ONE narrow exchange of PRE-REDUCED (source, day,
    hour, n) cells; the SOURCE-hash fold holds the source's whole
    calendar-bounded cell set, finds its own midpoint, and reduces to
    two 24-bin grids; k=1 merge takes the argmaxes."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(sorted(events_src_list(sf_dir)), pa.string())
    ns = len(srcs)
    HOUR_US = 3_600_000_000

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type"],
        override_num_blocks=_adaptive_k(sf_dir),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["event_type"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        hrs = (
            b["ts"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // HOUR_US
        )
        day = hrs // 24
        hour = hrs % 24
        key = (day * 24 + hour) * ns + code
        packed, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "src": pa.array(packed % ns),
                "dh": pa.array(packed // ns),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "half": pa.array([], pa.int64()),
                    "hour": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        dh = t["dh"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        day = dh // 24
        hour = dh % 24
        # per-source midpoint from its own min/max day
        mn = np.full(ns, np.int64(2**62))
        mx = np.full(ns, np.int64(-(2**62)))
        np.minimum.at(mn, src, day)
        np.maximum.at(mx, src, day)
        mid = (mn + mx) // 2
        half = (day > mid[src]).astype(np.int64)
        cell = src * 48 + half * 24 + hour
        grid = np.zeros(ns * 48, np.int64)
        np.add.at(grid, cell, nn)
        live = np.flatnonzero(grid)
        return pa.table(
            {
                "src": pa.array(live // 48),
                "half": pa.array(live % 48 // 24),
                "hour": pa.array(live % 24),
                "n": pa.array(grid[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        grid = np.zeros(ns * 48, np.int64)
        if t.num_rows:
            s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            h = t["half"].combine_chunks().to_numpy(zero_copy_only=False)
            hr = t["hour"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                grid, s * 48 + h * 24 + hr,
                t["n"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        g2 = grid.reshape(ns, 2, 24)
        eh = g2[:, 0, :].argmax(axis=1)
        lh = g2[:, 1, :].argmax(axis=1)
        d = np.abs(eh - lh)
        dist = np.minimum(d, 24 - d)
        # a single-active-day source has an empty late half — drop it,
        # matching the oracle's inner join of the two modal picks
        live = np.flatnonzero(
            (g2[:, 0, :].sum(axis=1) > 0) & (g2[:, 1, :].sum(axis=1) > 0)
        )
        return pa.table(
            {
                "source": pc.take(srcs, pa.array(live)),
                "early_modal_hour": pa.array(eh[live].astype(np.int64)),
                "late_modal_hour": pa.array(lh[live].astype(np.int64)),
                "shift_distance": pa.array(dist[live].astype(np.int64)),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "src", fold, k=max(ns, 1))
    return hash_partition_merge(cells, "src", merge, k=1)
