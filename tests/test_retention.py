"""Retention: manifest-planned expiry, tombstones survive replay, views
exclude retired partitions."""

import glob
import os


def _cascade(tmp_path, rows=30_000):
    from mq_to_db_ray.gen import write_f1_parquet
    from mq_to_db_ray.pipelines.cascade import run_cascade

    in_dir = str(tmp_path / "in")
    files = write_f1_parquet(in_dir, rows, shards=2, max_tok=8,
                             layout="contiguous")
    out = str(tmp_path / "out")
    return files, out, run_cascade(files, out)


def test_retention_expires_and_blocks_replay(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.cascade import run_cascade
    from mq_to_db_ray.pipelines.retention import apply_retention
    from mq_to_db_ray.pipelines.view import tier_view
    from mq_to_db_ray.state.manifest import Manifest

    files, out, summary = _cascade(tmp_path)
    n_before = len(glob.glob(out + "/tier=1m/*/*.parquet"))

    # keep only the newest 10 one-minute buckets; 1h/1d forever
    report = apply_retention(out, {"1m": 10, "1h": None, "1d": None})
    assert report["1m"]["retired"] > 0
    assert report["1h"]["retired"] == 0

    n_after = len(glob.glob(out + "/tier=1m/*/*.parquet"))
    assert n_after == n_before - report["1m"]["retired"]

    # view plans from live entries only and still works
    view = tier_view(out, "1m").to_pandas()
    assert len(view) > 0
    m = Manifest(out)
    max_live_hi = max(
        e["bucket_hi"] for e in m.committed("1m").values() if "bucket_hi" in e
    )
    assert report["1m"]["horizon"] <= max_live_hi

    # replaying the same epoch must NOT resurrect retired partitions
    s2 = run_cascade(files, out)
    assert s2["skipped"]["1m"] == summary["partitions"]["1m"]
    assert len(glob.glob(out + "/tier=1m/*/*.parquet")) == n_after

    # tombstones are listed as retired, not live (series blobs are retired
    # alongside their data partitions — count the data ones here)
    retired = [
        k for k, e in m.committed("1m", include_retired=True).items()
        if e["retired"] and not e["partition"].startswith("series__")
    ]
    assert len(retired) == report["1m"]["retired"]


def test_retention_orphan_file_not_read(ray_session, tmp_path):
    """Crash between tombstone and delete: orphan file must be invisible."""
    from mq_to_db_ray.pipelines.retention import apply_retention
    from mq_to_db_ray.pipelines.view import tier_view
    from mq_to_db_ray.state.manifest import Manifest

    _, out, _ = _cascade(tmp_path, rows=12_000)
    m = Manifest(out)
    entries = {k: e for k, e in m.committed("1m").items() if "bucket_hi" in e}
    victim_key, victim = sorted(entries.items())[0]
    m.retire(victim_key)  # tombstone WITHOUT deleting the file (simulated crash)
    assert os.path.exists(os.path.join(out, victim["path"]))

    view_sources_buckets = set(
        map(tuple, tier_view(out, "1m").to_pandas()[["source", "bucket_ts"]].values)
    )
    import pyarrow.parquet as pq

    orphan = pq.read_table(os.path.join(out, victim["path"]))
    orphan_keys = set(
        zip(orphan["source"].to_pylist(), orphan["bucket_ts"].to_pylist())
    )
    # no orphan-only key appears in the view (overlap with other sources'
    # buckets is impossible: partitions are per source)
    assert not (orphan_keys & view_sources_buckets)


def test_retention_retires_legacy_series_blobs(tmp_path):
    """Round-2 ADVICE: series blobs committed by pre-range-tag runs
    (series__e<ep>__source=s) must be retired once their (source, etag)
    has no live data partition left — otherwise they accrete unboundedly
    in upgraded out_dirs.  Pure manifest surgery, no Ray needed."""
    import os

    import pyarrow as pa

    from mq_to_db_ray.pipelines.retention import apply_retention
    from mq_to_db_ray.state.manifest import Manifest, write_partition_atomic

    out = str(tmp_path / "out")
    m = Manifest(out)
    t = pa.table({"x": pa.array([1, 2], pa.int64())})
    # two data partitions of one legacy epoch + its rangeless series blob
    write_partition_atomic(
        m, "r1", "1m", "source=s0__eabc__part-00000000-00000009",
        "tier=1m/source=s0/eabc__part-00000000-00000009.parquet", t,
        meta=dict(source="s0", bucket_lo=0, bucket_hi=9),
    )
    write_partition_atomic(
        m, "r1", "1m", "source=s0__eabc__part-00000100-00000109",
        "tier=1m/source=s0/eabc__part-00000100-00000109.parquet", t,
        meta=dict(source="s0", bucket_lo=100, bucket_hi=109),
    )
    write_partition_atomic(
        m, "r1", "1m", "series__eabc__source=s0",
        "series/tier=1m/eabc__source=s0.parquet", t,
    )
    # keep=10 from newest hi=109 -> horizon 100: first partition expires,
    # second survives -> legacy blob's (s0, eabc) still live -> kept
    r1 = apply_retention(out, {"1m": 10})
    assert r1["1m"]["retired"] == 1
    assert "tier=1m__series__eabc__source=s0" in m.committed("1m")
    # expire the second partition too -> legacy blob goes with it
    r2 = apply_retention(out, {"1m": 5}, now_bucket={"1m": 200})
    assert r2["1m"]["retired"] == 1
    live = m.committed("1m")
    assert live == {}
    assert not os.path.exists(
        os.path.join(out, "series/tier=1m/eabc__source=s0.parquet")
    )
    # the ack survives as a tombstone: nothing can resurrect the blob
    assert m.is_committed("1m", "series__eabc__source=s0")
