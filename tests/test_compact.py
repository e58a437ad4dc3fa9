"""Compaction: per-epoch partitions fold into one per source; views are
unchanged; the two-phase commit never double-counts after a mid-compaction
crash; an interrupted compaction is finished by the next run."""

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc


def _sorted(t: pa.Table) -> pa.Table:
    t = t.combine_chunks()
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("source", "ascending"), ("bucket_ts", "ascending")]
        )
    ).select(["source", "bucket_ts", "count", "sum_n_tok", "min_n_tok", "max_n_tok"])


def _two_epochs(tmp_path):
    from mq_to_db_ray.gen import write_f1_parquet
    from mq_to_db_ray.pipelines.cascade import run_cascade

    in_dir = str(tmp_path / "in")
    files = write_f1_parquet(in_dir, 24_000, shards=4, max_tok=8,
                             layout="contiguous")
    out = str(tmp_path / "out")
    run_cascade(files[:2], out)
    run_cascade(files[2:], out)
    return out


def test_compact_preserves_view(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.compact import compact_tier
    from mq_to_db_ray.pipelines.view import tier_view
    from mq_to_db_ray.state.manifest import Manifest

    out = _two_epochs(tmp_path)
    before = _sorted(pa.Table.from_pandas(tier_view(out, "1m").to_pandas()))
    n_files_before = len(glob.glob(out + "/tier=1m/*/*.parquet"))

    # contiguous time split: small sources end inside epoch 1, so only
    # sources spanning both epochs have 2 partitions to fold
    report = compact_tier(out, "1m")
    assert report["compacted_sources"] + report["skipped_sources"] == 8
    assert report["compacted_sources"] >= 5
    # per source: 2 data partitions + their 2 per-epoch series blobs
    assert report["inputs_retired"] == 4 * report["compacted_sources"]

    after = _sorted(pa.Table.from_pandas(tier_view(out, "1m").to_pandas()))
    assert after.equals(before)

    m = Manifest(out)
    live = [
        e for e in m.committed("1m").values()
        if not e["partition"].startswith("series__") and "bucket_lo" in e
    ]
    assert len(live) == 8  # one per source
    assert len(glob.glob(out + "/tier=1m/*/*.parquet")) < n_files_before

    # idempotent: nothing left to compact
    r2 = compact_tier(out, "1m")
    assert r2["compacted_sources"] == 0 and r2["inputs_retired"] == 0


def test_compact_crash_between_phases(ray_session, tmp_path):
    """Simulate crash after phase-1 commit (compacted entry exists, inputs
    still live): the view must NOT double-count, and the next compact run
    finishes the retire."""
    from mq_to_db_ray.pipelines.compact import compact_tier
    from mq_to_db_ray.pipelines.view import tier_view
    from mq_to_db_ray.state.manifest import Manifest

    out = _two_epochs(tmp_path)
    before = _sorted(pa.Table.from_pandas(tier_view(out, "1m").to_pandas()))

    # phase 1 only, by hand, for one source
    import pyarrow.parquet as pq

    from mq_to_db_ray.stages.gapfill import fill_group
    from mq_to_db_ray.stages.rollup import (
        finalize_batch, merge_partials_batch, repartial_rollup_batch,
    )
    from mq_to_db_ray.state.manifest import write_partition_atomic
    from mq_to_db_ray.timegrid import T0_US, TIERS

    m = Manifest(out)
    entries = {
        k: e for k, e in m.committed("1m").items()
        if e.get("source") == "s02" and "bucket_lo" in e
    }
    assert len(entries) == 2
    tables = [pq.read_table(os.path.join(out, e["path"])) for e in entries.values()]
    partials = pa.concat_tables(
        [repartial_rollup_batch(t, 60, 60, None) for t in tables]
    )
    filled = fill_group(finalize_batch(merge_partials_batch(partials), 60), 60)
    ts = filled["bucket_ts"].cast("int64")
    lo = (ts[0].as_py() - T0_US) // 60_000_000
    hi = (ts[-1].as_py() - T0_US) // 60_000_000
    write_partition_atomic(
        m, "crashrun", "1m", f"source=s02__cDEAD__part-{lo:08d}-{hi:08d}",
        f"tier=1m/source=s02/cDEAD__part-{lo:08d}-{hi:08d}.parquet", filled,
        meta=dict(source="s02", bucket_lo=int(lo), bucket_hi=int(hi),
                  replaces=sorted(entries)),
    )
    # crash here: inputs NOT retired — view must still equal `before`
    mid = _sorted(pa.Table.from_pandas(tier_view(out, "1m").to_pandas()))
    assert mid.equals(before)

    # next compaction finishes the interrupted retire
    report = compact_tier(out, "1m")
    assert report["inputs_retired"] >= 2
    after = _sorted(pa.Table.from_pandas(tier_view(out, "1m").to_pandas()))
    assert after.equals(before)
