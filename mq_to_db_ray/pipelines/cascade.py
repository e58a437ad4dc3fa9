"""The flagship pipeline: ingest → validate → raw tier → 1m → 1h → 1d,
with gap-fill, DoD/Gorilla series blobs, exactly-once partition commits,
reject lane and pushed metrics.

Dataflow shape mirrors the reference end to end
(`/root/reference/cmd/mq-to-db/main.go:250-294`: consumers → merge → stateful
workers → results), recast on Ray Data:

    read_parquet(epoch files)             # fan-out consumers (D1) + merge (D2)
      .map_batches(ValidateAssign, ...)   # parse+validate (M1/M2), reject lane
      .write_parquet(raw staging)         # store (M5) — tokens leave the flow
    read raw tier, columns=[source,seq,n_tok]   # narrow re-read: column-pruned
      -> rollup 1m (partial-agg combiner + tiny groupby merge)
      -> commit_tier: groupby(source).map_groups(fill + encode + staged write)
      -> cascade 1m->1h->1d on the small rolled data

Scale notes: the only full-data pass is read→validate→raw-write (streaming,
no shuffle); everything after operates on rolled-up points (≥60× smaller).
``materialize()`` is applied ONLY to per-tier rollup outputs (sources ×
buckets rows — MBs even at 10^12-sequence scale with year-long retention).
"""

from __future__ import annotations

import os
import time
import uuid

import pyarrow as pa

import ray.data as rd
from ray.data import Dataset

from .. import schema as sch
from ..state.manifest import Manifest, write_partition_atomic
from ..state.metrics import MetricsSink
from ..stages.encode import encode_group
from ..stages.rollup import cascade, rollup
from ..stages.validate import ValidateAssign
from ..timegrid import T0_US, TIERS


def _epoch_fingerprint(paths: list[str]) -> str:
    import hashlib

    h = hashlib.blake2b(digest_size=8)
    for p in sorted(paths):
        h.update(p.encode())
        try:
            h.update(str(os.path.getsize(p)).encode())
        except OSError:
            pass
    return h.hexdigest()


class TierPartitionWriter:
    """E5+E6+E7+E8 fused per-(source, window) worker (the `storageWorkers`
    analog, /root/reference/cmd/mq-to-db/main.go:442-491): gap-fill the
    window's slice of the source series, encode blobs, stage+commit the
    partition, return a metrics row.

    Runs inside ``groupby(["source", "window_id"]).map_groups`` over the
    ``stages.gapfill.windowed_groups`` stream, so no task ever holds more
    than ``window_buckets`` points however long retention grows; skips
    partitions already in the manifest (resume, E12)."""

    def __init__(self, out_dir: str, run_id: str, tier: str, gap: bool = True,
                 epoch: str | None = None, ext_ref=None,
                 window_buckets: int | None = None,
                 reject_dir: str | None = None):
        self.out_dir = out_dir
        self.run_id = run_id
        self.tier = tier
        self.gap = gap
        self.ext_ref = ext_ref
        self.window_buckets = window_buckets
        self.reject_dir = reject_dir
        # multi-epoch: partitions are epoch-scoped so repeated epochs into
        # one out dir coexist; tier_view() merges them (aggregates are
        # associative: sum/count/min/max)
        self.etag = f"e{epoch}__" if epoch else ""

    def __call__(self, group: pa.Table) -> pa.Table:
        from ..stages.gapfill import clip_window, fill_group, fill_range

        if group.num_rows == 0:
            return _metrics_schema().empty_table()
        manifest = Manifest(self.out_dir)
        tier_s = TIERS[self.tier]
        if "window_id" in group.schema.names:  # multi-window source path
            import ray

            ext = ray.get(self.ext_ref) if isinstance(
                self.ext_ref, ray.ObjectRef
            ) else self.ext_ref
            real, lo_us, hi_us, source = clip_window(
                group, tier_s, self.window_buckets, ext
            )
            if self.gap:
                filled = fill_range(real, tier_s, lo_us, hi_us, source)
            else:
                filled = real.take(pa.compute.sort_indices(real["bucket_ts"]))
        elif self.gap:  # per-source fast path (every source fits one window)
            filled = fill_group(group, tier_s)
            source = filled["source"][0].as_py()
        else:
            filled = group.take(pa.compute.sort_indices(group["bucket_ts"]))
            source = filled["source"][0].as_py()
        if filled.num_rows == 0:  # e.g. marker-only window with gap=False
            return _metrics_schema().empty_table()
        ts = filled["bucket_ts"].cast(pa.int64())
        lo = (ts[0].as_py() - T0_US) // (tier_s * 1_000_000)
        hi = (ts[-1].as_py() - T0_US) // (tier_s * 1_000_000)
        rng = f"part-{lo:08d}-{hi:08d}"
        part = f"source={source}__{self.etag}{rng}"
        relpath = (
            f"tier={self.tier}/source={source}/{self.etag}{rng}.parquet"
        )
        from ..state.manifest import CommitPhaseError

        try:
            row = write_partition_atomic(
                manifest, self.run_id, self.tier, part, relpath, filled,
                meta=dict(source=source, bucket_lo=int(lo), bucket_hi=int(hi)),
            )
            series = encode_group(filled, self.tier)
            # series blob carries the SAME range tag as its data partition,
            # so retention/compaction retire them 1:1 (and multi-window
            # sources get one blob per window — readers concat by bucket_lo)
            spart = f"series__{self.etag}{rng}__source={source}"
            srel = (
                f"series/tier={self.tier}/{self.etag}{rng}"
                f"__source={source}.parquet"
            )
            write_partition_atomic(
                manifest, self.run_id, self.tier, spart, srel, series
            )
        except CommitPhaseError as e:
            # dead-letter the exec/ack failure (reference error ladder,
            # messages.go:90-146) then re-raise for Ray's task retry —
            # the reject row records the incident, retry preserves the data
            self._reject(part, source, e)
            raise
        self._heartbeat(part, int(filled.num_rows))
        return pa.Table.from_pylist(
            [
                dict(
                    tier=self.tier,
                    partition=part,
                    source=source,
                    rows=int(filled.num_rows),
                    skipped=bool(row.get("skipped", False)),
                    wall_ms=int(row.get("wall_ms", 0)),
                )
            ],
            schema=_metrics_schema(),
        )

    def _heartbeat(self, partition: str, rows: int) -> None:
        """Mid-run gauge freshness (round-2 verdict: gauges sampled only at
        flush left long epochs as telemetry blind spots): each partition
        commit atomically refreshes ``metrics/heartbeat.json`` from INSIDE
        the worker (last-writer-wins), the push-model analog of the
        reference's per-scrape pool-stats pull
        (/root/reference/internal/metrics/dbCollector.go:114-143)."""
        import json
        import time as _t

        mdir = os.path.join(self.out_dir, "metrics")
        try:
            os.makedirs(mdir, exist_ok=True)
            tmp = os.path.join(mdir, f".hb-{self.run_id}-{os.getpid()}.tmp")
            with open(tmp, "w") as f:
                json.dump(
                    dict(
                        ts=_t.time(),
                        run_id=self.run_id,
                        tier=self.tier,
                        partition=partition,
                        rows=rows,
                    ),
                    f,
                )
            os.replace(tmp, os.path.join(mdir, "heartbeat.json"))
        except OSError:
            pass  # telemetry must never fail a commit

    def _reject(self, partition: str, source: str, e) -> None:
        """Partition-level dead-letter row (idempotent file name, like
        ValidateAssign's reject writer)."""
        if not self.reject_dir:
            return
        import hashlib

        import pyarrow.parquet as pq

        from .. import schema as sch

        os.makedirs(self.reject_dir, exist_ok=True)
        t = pa.Table.from_pylist(
            [
                dict(
                    doc_id=f"tier={self.tier}/{partition}",
                    source=source,
                    reason=e.phase,
                    detail=str(e.cause)[:200],
                )
            ],
            schema=sch.REJECT,
        )
        key = hashlib.sha1(
            f"{self.tier}/{partition}/{e.phase}".encode()
        ).hexdigest()[:16]
        pq.write_table(t, f"{self.reject_dir}/commit-{key}.parquet")


class RawPartialsDatasink(rd.Datasink):
    """Fused stage-A sink: write the raw tier AND return the finest-tier
    rollup partials as each write task's result.

    This folds the stage-B combiner into the stage-A pass — the write task
    already streams every validated block — so the rollup overlaps the
    bandwidth-bound raw write and nothing re-reads the raw tier afterwards.
    The mechanics matter on this engine: a ``Datasink`` write task fuses
    with the read→validate chain (the wide ``tokens`` column never enters
    the object store) and sees ALL of its task's blocks, so it writes ONE
    file per task with an incremental ``ParquetWriter`` — per-BATCH writes
    (the naive fused-map formulation) produce a file per parquet row group
    and measured ~2x slower end to end.  Per-task partials are ONE Arrow
    group_by over the accumulated narrow (source, seq, n_tok) projection
    and ride back as ``ray.put`` refs, so the driver holds only refs.

    Retry-safe: the file name is the task index (stable across retries) and
    the write is tmp+rename, so a re-executed task replaces its own file;
    the staging dir is renamed into the tier only after every task
    succeeds (``_commit_raw_dir``)."""

    def __init__(self, staging: str, tier_s: int, compression: str = "zstd"):
        self.staging = staging
        self.tier_s = tier_s
        self.compression = compression
        self.partial_refs: list = []

    def on_write_start(self) -> None:
        os.makedirs(self.staging, exist_ok=True)

    def write(self, blocks, ctx):
        import pyarrow.parquet as pq
        import ray

        from ..stages.rollup import partial_rollup_batch

        path = os.path.join(self.staging, f"part-{ctx.task_idx:06d}.parquet")
        tmp = path + ".tmp"
        writer = None
        narrow: list[pa.Table] = []
        try:
            for block in blocks:
                if not isinstance(block, pa.Table):
                    block = pa.Table.from_pandas(block)
                if block.num_rows == 0:
                    continue
                if writer is None:
                    writer = pq.ParquetWriter(
                        tmp, block.schema, compression=self.compression
                    )
                writer.write_table(block)
                narrow.append(block.select(["source", "seq", "n_tok"]))
        finally:
            if writer is not None:
                writer.close()
        if writer is not None:
            os.replace(tmp, path)
        partial = partial_rollup_batch(
            pa.concat_tables(narrow) if narrow else _empty_assigned_narrow(),
            self.tier_s,
        )
        return ray.put(partial)

    def on_write_complete(self, write_result) -> None:
        self.partial_refs = list(write_result.write_returns)

    def on_write_failed(self, error: Exception) -> None:
        pass


def _empty_assigned_narrow() -> pa.Table:
    return pa.table(
        {
            "source": pa.array([], pa.string()),
            "seq": pa.array([], pa.int64()),
            "n_tok": pa.array([], pa.int32()),
        }
    )


def _metrics_schema() -> pa.Schema:
    return pa.schema(
        [
            ("tier", pa.string()),
            ("partition", pa.string()),
            ("source", pa.string()),
            ("rows", pa.int64()),
            ("skipped", pa.bool_()),
            ("wall_ms", pa.int64()),
        ]
    )


def commit_tier(
    rolled: Dataset, tier: str, out_dir: str, run_id: str,
    epoch: str | None = None, window_buckets: int | None = None,
    reject_dir: str | None = None, ext: pa.Table | None = None,
) -> list[dict]:
    """Write one tier's per-(source, window) partitions (+series blobs);
    returns the per-partition metric rows (tiny — driver-side take is safe).
    When every source fits one window, the per-source fast path skips the
    marker/union machinery (identical rows AND partition names)."""
    from ..stages.gapfill import (
        DEFAULT_WINDOW_BUCKETS,
        source_extents,
        spans_single_window,
        windowed_groups,
    )

    wb = window_buckets or DEFAULT_WINDOW_BUCKETS
    tier_s = TIERS[tier]
    if ext is None:
        ext = source_extents(rolled)
    if spans_single_window(ext, tier_s, wb):
        w = TierPartitionWriter(
            out_dir, run_id, tier, epoch=epoch, reject_dir=reject_dir
        )
        return (
            rolled.groupby("source")
            .map_groups(lambda g: w(g), batch_format="pyarrow")
            .take_all()
        )
    keyed, ext_ref = windowed_groups(rolled, tier_s, wb, ext)
    w = TierPartitionWriter(
        out_dir, run_id, tier, epoch=epoch, ext_ref=ext_ref,
        window_buckets=wb, reject_dir=reject_dir,
    )
    return (
        keyed.groupby(["source", "window_id"])
        .map_groups(lambda g: w(g), batch_format="pyarrow")
        .take_all()
    )


# At or below this many rolled-up points, the post-rollup tiers are
# cascaded and committed with in-process Arrow kernels (identical output
# files, manifests and metric rows — the SAME TierPartitionWriter and
# rollup kernels run, just not inside Ray Data executions).  Rationale:
# after the first rollup the data is orders of magnitude smaller than raw,
# and on short epochs the ~7 extra Ray Data execution launches (extents,
# 2 cascades, 3 commits, count) cost more driver latency than the whole
# stage-B computation — a fixed term that caps measured e2e scaling
# efficiency (BASELINE.md round-5).  Above the threshold the distributed
# path runs unchanged, so 100-TB epochs (1m tier >> 4M points) never pull
# data driver-side.  Sizing: 4M ROLLUP rows are ~200 MB of narrow columns
# driver-side and sub-second Arrow/numpy kernel work; the distributed
# stage-B at this size costs 8-15 s in execution launches + marker-union
# shuffles (measured at 64M raw rows / 1.07M 1m points, BASELINE.md
# round-5), so the crossover sits well above this bound.
SMALL_TIER_DRIVER_ROWS = 1 << 22


def _cascade_table(tbl: pa.Table, from_tier: str, to_tier: str) -> pa.Table:
    """Driver-side cascade: the exact distributed kernels, composed."""
    from ..stages.rollup import (
        finalize_batch,
        merge_partials_batch,
        repartial_rollup_batch,
    )

    f, t = TIERS[from_tier], TIERS[to_tier]
    return finalize_batch(
        merge_partials_batch(repartial_rollup_batch(tbl, f, t)), t
    )


def _source_extents_table(tbl: pa.Table) -> pa.Table:
    """(source, lo_us, hi_us) from an in-memory ROLLUP table (one group_by)."""
    if tbl.num_rows == 0:
        return pa.table({
            "source": pa.array([], pa.string()),
            "lo_us": pa.array([], pa.int64()),
            "hi_us": pa.array([], pa.int64()),
        })
    t = pa.table(
        {"source": tbl["source"], "ts": tbl["bucket_ts"].cast(pa.int64())}
    )
    g = t.group_by("source", use_threads=False).aggregate(
        [("ts", "min"), ("ts", "max")]
    )
    return pa.table(
        {"source": g["source"], "lo_us": g["ts_min"], "hi_us": g["ts_max"]}
    )


def _group_slices(tbl: pa.Table, keys: list[str]):
    """Yield per-group sub-tables (sorted group boundaries), driver-side."""
    import numpy as np
    import pyarrow.compute as pc

    if tbl.num_rows == 0:
        return
    order = pc.sort_indices(
        tbl, sort_keys=[(k, "ascending") for k in keys]
    )
    s = tbl.take(order)
    cols = []
    for k in keys:
        c = s[k]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        if pa.types.is_string(c.type):
            cols.append(
                c.dictionary_encode().indices.to_numpy(zero_copy_only=False)
            )
        else:
            cols.append(c.to_numpy(zero_copy_only=False))
    n = s.num_rows
    new = np.zeros(n, dtype=bool)
    new[0] = True
    for c in cols:
        new[1:] |= c[1:] != c[:-1]
    starts = np.flatnonzero(new)
    ends = np.append(starts[1:], n)
    for lo, hi in zip(starts, ends):
        yield s.slice(int(lo), int(hi - lo))


def _commit_group_task(w: "TierPartitionWriter", g: pa.Table) -> pa.Table:
    """Plain-task twin of one map_groups call (see _commit_tier_table)."""
    return w(g)


def _run_groups(w: "TierPartitionWriter", groups) -> list[pa.Table]:
    """Run the writer over group slices: in-process for one group, as plain
    ``ray.remote`` tasks otherwise — the fills/encodes parallelize across
    the cluster without paying a streaming-executor launch per tier (the
    whole point of the small-tier path)."""
    import ray

    groups = list(groups)
    if len(groups) <= 1:
        return [w(g) for g in groups]
    fn = ray.remote(num_cpus=1)(_commit_group_task)
    wref = ray.put(w)
    return ray.get([fn.remote(wref, g) for g in groups])


def _commit_tier_table(
    tbl: pa.Table, tier: str, out_dir: str, run_id: str,
    epoch: str | None, window_buckets: int | None,
    reject_dir: str | None, ext: pa.Table,
) -> list[dict]:
    """Driver-side twin of :func:`commit_tier` for small tiers: identical
    partition files, manifest entries and metric rows via the same
    ``TierPartitionWriter``, grouped in-process instead of via groupby."""
    import numpy as np
    import pyarrow.compute as pc

    from ..stages.gapfill import (
        DEFAULT_WINDOW_BUCKETS,
        spans_single_window,
        window_markers,
    )
    from ..timegrid import T0_US

    wb = window_buckets or DEFAULT_WINDOW_BUCKETS
    tier_s = TIERS[tier]
    if spans_single_window(ext, tier_s, wb):
        w = TierPartitionWriter(
            out_dir, run_id, tier, epoch=epoch, reject_dir=reject_dir
        )
        out_rows = _run_groups(w, _group_slices(tbl, ["source"]))
    else:
        order = pc.sort_indices(ext["source"])
        ext_sorted = ext.take(order)
        ext_tuple = (
            np.asarray(ext_sorted["source"].to_pylist(), dtype=object),
            ext_sorted["lo_us"].to_numpy(zero_copy_only=False),
            ext_sorted["hi_us"].to_numpy(zero_copy_only=False),
        )
        step = tier_s * 1_000_000
        ts = tbl["bucket_ts"].cast(pa.int64())
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        ts = ts.to_numpy(zero_copy_only=False)
        win = np.floor_divide(np.floor_divide(ts - T0_US, step), wb)
        data = tbl.append_column(
            "window_id", pa.array(win, type=pa.int64())
        ).append_column(
            "is_marker", pa.array(np.zeros(len(ts), dtype=bool))
        )
        markers = window_markers(ext_sorted, tier_s, wb)
        keyed = pa.concat_tables(
            [data.select(markers.schema.names), markers]
        )
        w = TierPartitionWriter(
            out_dir, run_id, tier, epoch=epoch, ext_ref=ext_tuple,
            window_buckets=wb, reject_dir=reject_dir,
        )
        out_rows = _run_groups(w, _group_slices(keyed, ["source", "window_id"]))
    return [r for t in out_rows for r in t.to_pylist()]


def run_cascade(
    input_paths: list[str] | str,
    out_dir: str,
    *,
    batch_size: int = 65536,
    validate_concurrency: int | None = None,
    skip_raw: bool = False,
    raw_partition_cols: list[str] | None = None,
    read_blocks: int | None = None,
    window_buckets: int | None = None,
    fused_partials: bool = True,
    raw_compression: str = "zstd",
) -> dict:
    """Run the full epoch: returns a summary dict (counts, tiers, metrics path).

    Resume (E12): committed partitions are skipped — the raw tier at epoch
    granularity, rollup tiers at (tier, source) granularity.
    """
    run_id = uuid.uuid4().hex[:12]
    if isinstance(input_paths, str):
        if os.path.isdir(input_paths):
            input_paths = sorted(
                os.path.join(input_paths, f)
                for f in os.listdir(input_paths)
                if f.endswith(".parquet")
            )
        else:
            input_paths = [input_paths]
    manifest = Manifest(out_dir)
    from ..stages.gapfill import DEFAULT_WINDOW_BUCKETS

    manifest.pin_layout(
        window_buckets=window_buckets or DEFAULT_WINDOW_BUCKETS
    )
    manifest.gc_staging()
    manifest.fold()  # compact entry files once past FOLD_THRESHOLD (E12 scale)
    manifest.claim_run(run_id)
    sink = MetricsSink(out_dir, run_id)
    epoch = _epoch_fingerprint(list(input_paths))
    raw_dir = os.path.join(out_dir, f"tier=raw/epoch={epoch}")
    reject_dir = os.path.join(out_dir, f"rejects/epoch={epoch}")

    # ---- stage A: ingest → validate → raw tier (the only full-data pass;
    # optionally fused with the 1m partial combiner, see fused_partials) ----
    t0 = time.perf_counter()
    raw_part = f"epoch={epoch}"
    from ..stages.gapfill import coarsen_extents, source_extents
    from ..stages.rollup import _merge_partials

    m1 = None
    m1_tbl_fused = None
    if not skip_raw and not manifest.is_committed("raw", raw_part):
        # One block per input file so read→validate→write FUSE into a single
        # task-pool chain: the wide tokens column never round-trips the
        # object store.  ValidateAssign is invoked through a lambda (task
        # pool) unless an explicit actor-pool size is requested.
        if read_blocks is None:
            import ray

            n_cpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
            read_blocks = 2 * n_cpu
        ds = rd.read_parquet(
            list(input_paths),
            override_num_blocks=max(len(input_paths), read_blocks),
        )
        staging = os.path.join(out_dir, "_staging", run_id, "raw")
        va = ValidateAssign(reject_dir)
        if validate_concurrency:
            validated = ds.map_batches(
                va,
                batch_format="pyarrow",
                batch_size=batch_size,
                concurrency=validate_concurrency,
                zero_copy_batch=True,
            )
        else:
            validated = ds.map_batches(
                lambda b: va(b),
                batch_format="pyarrow",
                batch_size=None,
                zero_copy_batch=True,
            )
        if fused_partials and raw_partition_cols is None:
            # Fused path (the DEFAULT since round 5): the RawPartialsDatasink
            # write task streams the validated blocks to ONE raw shard per
            # task and returns the 1m partial aggregates, so the rollup
            # overlaps the write and stage B starts from partials instead of
            # re-reading the raw tier.  With zstd raw staging this is now
            # faster than write+narrow-re-read at EVERY parallelism level
            # measured (16 CPUs: 6.1 s vs 8.1 s; 4 CPUs: 16.1 s vs 22.4 s —
            # BASELINE.md round-5); the earlier 20-25%-slower measurement
            # predates the zstd sink and the small-tier fast path.
            raw_sink = RawPartialsDatasink(
                staging, TIERS["1m"], compression=raw_compression
            )
            validated.write_datasink(raw_sink)
            try:
                import ray

                # Bounded driver-side merge: each partial holds at most one
                # row per (source, 1m-bucket) seen by its write task.  Fetch
                # refs until the row budget trips; under it, the merge is one
                # in-process Arrow group_by (no extra Ray Data execution —
                # the dominant fixed cost on short epochs); over it, the
                # distributed hash-merge runs exactly as before.
                fetched, n_fetched = [], 0
                refs = list(raw_sink.partial_refs)
                for i in range(0, len(refs), 64):  # chunked: one RPC per 64
                    for t in ray.get(refs[i:i + 64]):
                        fetched.append(t)
                        n_fetched += t.num_rows
                    if n_fetched > SMALL_TIER_DRIVER_ROWS:
                        break
                if n_fetched <= SMALL_TIER_DRIVER_ROWS:
                    from ..stages.rollup import (
                        finalize_batch,
                        merge_partials_batch,
                    )

                    m1_tbl_fused = (
                        finalize_batch(
                            merge_partials_batch(pa.concat_tables(fetched)),
                            TIERS["1m"],
                        )
                        if fetched
                        else sch.empty(sch.ROLLUP)
                    )
                else:
                    m1 = _merge_partials(
                        rd.from_arrow_refs(raw_sink.partial_refs), TIERS["1m"]
                    ).materialize()
            except Exception:
                m1 = None  # fall back to the narrow re-read below
        else:
            # Default: Ray's parquet sink (threaded column encoding), then
            # stage B re-reads ONLY the narrow (source, seq, n_tok)
            # projection — column pruning makes the re-read ~6% of the
            # stage-A output bytes (ds.stats() evidence in BASELINE.md).
            # raw_partition_cols (opt-in per-source layout) costs a full
            # extra copy of the wide tokens column.
            # zstd (not the parquet-default snappy): the generated token
            # streams sit near their entropy bound, where zstd is BOTH
            # ~10% smaller AND faster to encode/decode than snappy on this
            # host (measured: 1M-row shard 39.4 MB/1.03 s snappy vs
            # 35.5 MB/0.72 s zstd — BASELINE.md round-5) — fewer staged
            # bytes through the shared page allocator is exactly the e2e
            # scaling term this sandbox is bound by.
            validated.write_parquet(
                staging, partition_cols=raw_partition_cols,
                compression=raw_compression,
            )
        os.makedirs(os.path.dirname(raw_dir), exist_ok=True)
        _commit_raw_dir(manifest, staging, raw_dir, raw_part, epoch)
    raw_wall = time.perf_counter() - t0

    # ---- stage B: 1m → 1h → 1d (rolled-up data only) ----
    m1_tbl = None
    if m1_tbl_fused is not None:
        m1_tbl = m1_tbl_fused
        m1 = rd.from_arrow(m1_tbl)
        n_m1 = m1_tbl.num_rows
    elif m1 is None:
        # resume / skip_raw / partitioned-raw paths: narrow column-pruned
        # re-read of the committed raw tier.  Big batches: the per-batch
        # combiner contracts to <=|keys| rows, so larger batches shuffle less
        narrow = rd.read_parquet(raw_dir, columns=["source", "seq", "n_tok"])
        m1 = rollup(narrow, "1m", batch_size=max(batch_size, 1 << 20)).materialize()
        n_m1 = m1.count()  # metadata on a materialized dataset
    else:
        n_m1 = m1.count()  # metadata on a materialized dataset
    # per-source extents computed ONCE from the 1m tier; the cascaded
    # tiers' extents are exact floor-coarsenings (no extra passes)
    if m1_tbl is not None or n_m1 <= SMALL_TIER_DRIVER_ROWS:
        # hybrid small-tier fast path: same kernels, same writer, same
        # output — composed in-process instead of as 7 more Ray Data
        # executions (see SMALL_TIER_DRIVER_ROWS).
        if m1_tbl is None:
            import ray

            blocks = []
            for b in ray.get(m1.to_arrow_refs()):
                if isinstance(b, pa.RecordBatch):
                    b = pa.Table.from_batches([b])
                if b.num_rows:  # block field order can differ; normalize
                    blocks.append(b.select(sch.ROLLUP.names).cast(sch.ROLLUP))
            m1_tbl = (
                pa.concat_tables(blocks) if blocks else sch.empty(sch.ROLLUP)
            )
        ext1 = _source_extents_table(m1_tbl)
        parts = {
            "1m": _commit_tier_table(
                m1_tbl, "1m", out_dir, run_id, epoch, window_buckets,
                reject_dir, ext1,
            )
        }
        h1_tbl = _cascade_table(m1_tbl, "1m", "1h")
        parts["1h"] = _commit_tier_table(
            h1_tbl, "1h", out_dir, run_id, epoch, window_buckets,
            reject_dir, coarsen_extents(ext1, TIERS["1h"]),
        )
        d1_tbl = _cascade_table(h1_tbl, "1h", "1d")
        parts["1d"] = _commit_tier_table(
            d1_tbl, "1d", out_dir, run_id, epoch, window_buckets,
            reject_dir, coarsen_extents(ext1, TIERS["1d"]),
        )
        h1 = rd.from_arrow(h1_tbl)
        d1 = rd.from_arrow(d1_tbl)
    else:
        ext1 = source_extents(m1)
        parts = {
            "1m": commit_tier(
                m1, "1m", out_dir, run_id, epoch, window_buckets, reject_dir,
                ext=ext1,
            )
        }
        h1 = cascade(m1, "1m", "1h").materialize()
        parts["1h"] = commit_tier(
            h1, "1h", out_dir, run_id, epoch, window_buckets, reject_dir,
            ext=coarsen_extents(ext1, TIERS["1h"]),
        )
        d1 = cascade(h1, "1h", "1d").materialize()
        parts["1d"] = commit_tier(
            d1, "1d", out_dir, run_id, epoch, window_buckets, reject_dir,
            ext=coarsen_extents(ext1, TIERS["1d"]),
        )

    # this run's staging tree now holds only empty dirs (every staged file
    # was renamed away at commit); remove it so _staging/ is clean on exit
    import shutil

    shutil.rmtree(os.path.join(out_dir, "_staging", run_id), ignore_errors=True)

    # ---- metrics (E10) ----
    # every validated row lands in exactly one 1m bucket, so the raw-tier
    # row count is the sum of the (tiny, already-materialized) 1m counts —
    # no narrow re-scan of the raw tier per epoch
    if m1_tbl is not None:
        import pyarrow.compute as _pc

        n_raw = int(_pc.sum(m1_tbl["count"]).as_py() or 0)
    else:
        n_raw = int(m1.sum("count") or 0)
    n_rejects, n_errors = 0, 0
    reject_files = (
        sorted(
            os.path.join(reject_dir, f)
            for f in os.listdir(reject_dir)
            if f.endswith(".parquet")
        )
        if os.path.isdir(reject_dir)
        else []
    )
    if reject_files:
        import pyarrow.compute as pc

        reasons = rd.read_parquet(reject_files, columns=["reason"])
        n_rejects = reasons.count()
        n_errors = sum(
            int(pc.sum(
                pc.is_in(b["reason"], value_set=pa.array(["exec", "ack"]))
                .cast(pa.int64())
            ).as_py() or 0)
            for b in reasons.iter_batches(batch_format="pyarrow")
        )
    sink.inc("mq_to_db_consumer_messages_total", n_raw + n_rejects)
    sink.inc("mq_to_db_storage_worker_messages_total", n_raw + n_rejects)
    sink.inc("mq_to_db_storer_messages_ack_total", n_raw)
    sink.inc("mq_to_db_storer_messages_rejected_total", n_rejects)
    sink.inc("mq_to_db_storer_messages_errors_total", n_errors)
    for tier_rows in parts.values():
        for row in tier_rows:
            sink.observe_partition(row)
    mpath = sink.flush(extra=dict(epoch=epoch, raw_wall_sec=raw_wall))
    return dict(
        run_id=run_id,
        epoch=epoch,
        rows=n_raw,
        rejects=n_rejects,
        partitions={t: len(v) for t, v in parts.items()},
        skipped={t: sum(1 for r in v if r["skipped"]) for t, v in parts.items()},
        tiers={"1m": m1, "1h": h1, "1d": d1},
        metrics_path=mpath,
    )


def _commit_raw_dir(
    manifest: Manifest, staging: str, raw_dir: str, raw_part: str, epoch: str
) -> None:
    """Exactly-once DIRECTORY commit under crashes AND competing replicas.

    Unlike file-level ``os.replace`` (idempotent overwrite), a directory
    rename fails on a non-empty target, and naively clearing the target can
    rmtree a raw_dir another replica committed moments ago and is already
    re-reading (the reference runs two competing consumers on one queue,
    docker-compose.yaml:88-146 — same pattern here).  Mutual exclusion is a
    kernel advisory lock (``flock``) on a persistent lock file: the kernel
    releases it the instant a holder dies, so there is no stale-lock state to
    inspect and no create/read/unlink window where two waiters can both enter
    (the TOCTOU races a pid-stamped O_EXCL file admits).  The lock FILE is
    never unlinked — unlink+recreate would let two processes lock different
    inodes of the same path.  Losers re-check the manifest inside the lock
    and discard their staging (the epoch fingerprint is deterministic, so the
    winner's content is row-equivalent)."""
    import fcntl
    import shutil

    if manifest.is_committed("raw", raw_part):
        shutil.rmtree(staging, ignore_errors=True)
        return
    lockp = os.path.join(manifest.mdir, f".rawlock-{raw_part}")
    fd = os.open(lockp, os.O_CREAT | os.O_WRONLY, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)  # blocks; auto-released on death
        if manifest.is_committed("raw", raw_part):
            shutil.rmtree(staging, ignore_errors=True)
            return
        if os.path.isdir(raw_dir):
            shutil.rmtree(raw_dir)  # uncommitted crash debris
        os.replace(staging, raw_dir)
        _commit_dir_entry(manifest, "raw", raw_part, raw_dir, epoch)
    finally:
        os.close(fd)  # releases the flock; the lock file itself persists


def _commit_dir_entry(manifest: Manifest, tier: str, partition: str, path: str, epoch: str) -> None:
    """Manifest entry for an already-renamed directory partition (raw tier)."""
    import json

    entry = dict(tier=tier, partition=partition, path=path, epoch=epoch)
    epath = os.path.join(manifest.mdir, manifest.entry_name(tier, partition))
    tmp = epath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(entry, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, epath)
