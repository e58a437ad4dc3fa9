"""Regression tests for the code-review findings: pre-t0 bucketing,
seq-overflow rejection, raw-dir crash idempotency, watch replay safety,
retention of series blobs."""

import glob
import json
import os

import numpy as np
import pyarrow as pa


def test_negative_seq_floor_bucketing(ray_session):
    """Pre-t0 events (negative seq) must floor into the bucket BELOW zero
    and survive the hash shuffle (no uint64-cast crash)."""
    import ray.data as rd

    from mq_to_db_ray.stages.rollup import rollup

    t = pa.table(
        {
            "source": pa.array(["a"] * 4),
            "seq": pa.array([-61, -30, 0, 61], type=pa.int64()),
            "n_tok": pa.array([1, 2, 3, 4], type=pa.int32()),
        }
    )
    got = rollup(rd.from_arrow(t), "1m").to_pandas().sort_values("bucket_ts")
    # floor: -61 -> bucket -2; -30 -> bucket -1; 0 -> 0; 61 -> 1
    assert list(got["count"]) == [1, 1, 1, 1]
    ts = [v.timestamp() for v in got["bucket_ts"]]
    assert ts[1] - ts[0] == 60 and ts[0] < ts[2]


def test_overlong_seq_rejected():
    """13+-digit seqs must land in the reject lane (parse), never wrap
    int64 microseconds."""
    from mq_to_db_ray.stages.validate import split_batch

    t = pa.table(
        {
            "doc_id": pa.array(["s00-1000000000000000", "s00-00000001"]),
            "tokens": pa.array([[1], [1]], type=pa.list_(pa.int32())),
            "n_tok": pa.array([1, 1], type=pa.int32()),
            "source": pa.array(["s00", "s00"]),
        }
    )
    valid, rejects = split_batch(t)
    assert valid.num_rows == 1 and valid["seq"][0].as_py() == 1
    assert rejects.num_rows == 1 and rejects["reason"][0].as_py() == "parse"


def test_raw_dir_commit_idempotent_after_crash(ray_session, tmp_path):
    """Crash window: raw_dir renamed but manifest entry missing — the re-run
    must clear the debris and recommit, not die with ENOTEMPTY."""
    from mq_to_db_ray.gen import write_f1_parquet
    from mq_to_db_ray.pipelines.cascade import run_cascade

    in_dir = str(tmp_path / "in")
    write_f1_parquet(in_dir, 3_000, shards=2, max_tok=8)
    out = str(tmp_path / "out")
    s1 = run_cascade(in_dir, out)
    # simulate the crash: drop the raw manifest entry, keep the directory
    raw_entries = glob.glob(out + "/_MANIFEST/tier=raw__*.json")
    assert raw_entries
    for e in raw_entries:
        os.unlink(e)
    s2 = run_cascade(in_dir, out)
    assert s2["rows"] == s1["rows"]
    assert glob.glob(out + "/_MANIFEST/tier=raw__*.json")


def test_watch_replay_after_ledger_crash(ray_session, tmp_path):
    """Crash between run_cascade and the ledger append: the replayed file
    derives the SAME epoch, so everything is skipped, not double-counted."""
    from mq_to_db_ray.gen import write_f1_parquet
    from mq_to_db_ray.pipelines.view import tier_view
    from mq_to_db_ray.pipelines.cascade import run_cascade
    from mq_to_db_ray.pipelines.watch import run_pending_epoch

    in_dir = str(tmp_path / "in")
    files = write_f1_parquet(in_dir, 6_000, shards=2, max_tok=8,
                             layout="contiguous")
    out = str(tmp_path / "out")
    # file A committed but crash before ledger record
    run_cascade([files[0]], out)
    total_before = tier_view(out, "1m").to_pandas()["count"].sum()
    # watcher restart: sees both files pending, replays A (skipped) + runs B
    s = run_pending_epoch(in_dir, out)
    assert s["files"] == 2
    total_after = tier_view(out, "1m").to_pandas()["count"].sum()
    import pyarrow.parquet as pq

    n_input = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    assert total_after == n_input  # every row exactly once
    assert total_before <= total_after


def test_retention_retires_series_blobs(ray_session, tmp_path):
    from mq_to_db_ray.gen import write_f1_parquet
    from mq_to_db_ray.pipelines.cascade import run_cascade
    from mq_to_db_ray.pipelines.retention import apply_retention
    from mq_to_db_ray.state.manifest import Manifest

    in_dir = str(tmp_path / "in")
    write_f1_parquet(in_dir, 12_000, shards=2, max_tok=8)
    out = str(tmp_path / "out")
    run_cascade(in_dir, out)
    m = Manifest(out)
    series_before = [
        k for k, e in m.committed("1m").items()
        if e["partition"].startswith("series__")
    ]
    report = apply_retention(out, {"1m": 5, "1h": None, "1d": None})
    assert report["1m"]["retired"] > 0
    series_after = [
        k for k, e in m.committed("1m").items()
        if e["partition"].startswith("series__")
    ]
    # every retired data partition's series blob was retired with it
    assert len(series_after) == len(series_before) - report["1m"]["retired"]
    for k in set(series_before) - set(series_after):
        path = [
            e["path"] for key, e in m.committed("1m", include_retired=True).items()
            if key == k
        ][0]
        assert not os.path.exists(os.path.join(out, path))
