"""E8/E12 exactly-once commit + kill-resume (FIXTURES.md §4) and the
byte-identical-tokens invariant through the raw tier."""

from __future__ import annotations

import glob
import os
import signal
import subprocess
import sys
import time

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from mq_to_db_ray.state.manifest import Manifest, write_partition_atomic


def test_manifest_commit_and_skip(tmp_path):
    out = str(tmp_path / "out")
    m = Manifest(out)
    t = pa.table({"a": [1, 2, 3]})
    row = write_partition_atomic(m, "run1", "1m", "source=x__p0", "tier=1m/x/p0.parquet", t)
    assert not row["skipped"] and row["rows"] == 3
    assert m.is_committed("1m", "source=x__p0")
    final = os.path.join(out, "tier=1m/x/p0.parquet")
    mtime = os.path.getmtime(final)
    time.sleep(0.05)
    row2 = write_partition_atomic(m, "run2", "1m", "source=x__p0", "tier=1m/x/p0.parquet", t)
    assert row2["skipped"]
    assert os.path.getmtime(final) == mtime  # ack-once: untouched on rerun
    assert pq.read_table(final).equals(t)


def test_manifest_fingerprint_distinguishes_content(tmp_path):
    from mq_to_db_ray.state.manifest import _content_fingerprint

    t1 = pa.table({"s": ["a", "a"], "v": [1, 2]})
    t2 = pa.table({"s": ["a", "a"], "v": [1, 3]})
    f1, f2 = _content_fingerprint(t1), _content_fingerprint(t2)
    assert f1 != f2
    # order-insensitive
    t1r = t1.take(pa.array([1, 0]))
    assert _content_fingerprint(t1r) == f1


def test_gc_staging(tmp_path):
    out = str(tmp_path / "out")
    m = Manifest(out)
    p = m.staging_path("deadrun", "tier=1m/x.parquet")
    with open(p, "w") as f:
        f.write("debris")
    assert m.gc_staging() == 1
    assert not os.path.exists(p)


_RUNNER = r"""
import sys, os
sys.argv = [sys.argv[0]]
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from mq_to_db_ray.pipelines.cascade import run_cascade
s = run_cascade(os.environ["IN_DIR"], os.environ["OUT_DIR"])
print("SUMMARY", s["rows"], s["rejects"], s["skipped"])
ray.shutdown()
"""


@pytest.mark.slow
def test_kill_resume_byte_identical(tmp_path):
    """SIGKILL the driver mid-run; rerun must skip committed partitions and
    produce byte-identical rollup outputs vs an uninterrupted run."""
    from mq_to_db_ray.gen import write_f1_parquet

    in_dir = str(tmp_path / "in")
    write_f1_parquet(in_dir, 30_000, shards=4, max_tok=32)
    out_a = str(tmp_path / "out_a")  # uninterrupted
    out_b = str(tmp_path / "out_b")  # killed + resumed
    env = dict(os.environ, IN_DIR=in_dir, OUT_DIR=out_a, RAY_ADDRESS="local")
    subprocess.run([sys.executable, "-c", _RUNNER], env=env, check=True, cwd="/root/repo",
                   capture_output=True, timeout=300)

    env["OUT_DIR"] = out_b
    proc = subprocess.Popen([sys.executable, "-c", _RUNNER], env=env, cwd="/root/repo",
                            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    # wait until at least one 1m partition commits, then SIGKILL
    deadline = time.time() + 240
    killed = False
    while time.time() < deadline:
        if glob.glob(out_b + "/_MANIFEST/tier=1m__source=*.json"):
            os.kill(proc.pid, signal.SIGKILL)
            killed = True
            break
        if proc.poll() is not None:
            break  # finished before we could kill — still a valid (weaker) run
        time.sleep(0.05)
    proc.wait(timeout=60)
    assert killed or proc.returncode == 0

    committed_before = set(os.listdir(out_b + "/_MANIFEST"))
    mtimes = {
        p: os.path.getmtime(p) for p in glob.glob(out_b + "/tier=1m/*/*.parquet")
    }
    # resume
    subprocess.run([sys.executable, "-c", _RUNNER], env=env, check=True, cwd="/root/repo",
                   capture_output=True, timeout=300)
    # (a) committed partitions untouched
    for p, mt in mtimes.items():
        name = "tier=1m__source=" + p.split("source=")[1].split("/")[0]
        if any(c.startswith(name) for c in committed_before):
            assert os.path.getmtime(p) == mt, f"recommitted partition rewritten: {p}"
    # (b) outputs byte-identical to the uninterrupted run
    for tier in ("1m", "1h", "1d"):
        fa = sorted(glob.glob(f"{out_a}/tier={tier}/*/*.parquet"))
        fb = sorted(glob.glob(f"{out_b}/tier={tier}/*/*.parquet"))
        assert [os.path.relpath(p, out_a) for p in fa] == [
            os.path.relpath(p, out_b) for p in fb
        ]
        for a, b in zip(fa, fb):
            with open(a, "rb") as f1, open(b, "rb") as f2:
                assert f1.read() == f2.read(), f"byte mismatch {a} vs {b}"
    # (c) staging cleaned by the resume's plan-time GC
    staging = glob.glob(out_b + "/_staging/*")
    assert staging == [] or all(not os.listdir(p) for p in staging)


def test_tokens_byte_identical_through_raw_tier(ray_session, tmp_path):
    """North-star invariant: token arrays survive the pipeline untouched."""
    import ray.data as rd

    from mq_to_db_ray.gen import f1_table, write_f1_parquet
    from mq_to_db_ray.pipelines.cascade import run_cascade

    in_dir = str(tmp_path / "in")
    write_f1_parquet(in_dir, 5_000, shards=2)
    out = str(tmp_path / "out")
    run_cascade(in_dir, out)
    epoch_dir = glob.glob(out + "/tier=raw/epoch=*")[0]
    back = pads.dataset(epoch_dir, partitioning="hive").to_table(
        columns=["doc_id", "tokens"]
    )
    back = back.take(pa.compute.sort_indices(back["doc_id"]))
    orig = f1_table(5_000).select(["doc_id", "tokens"])
    orig = orig.take(pa.compute.sort_indices(orig["doc_id"]))
    assert back["doc_id"].combine_chunks().equals(orig["doc_id"].combine_chunks())
    assert back["tokens"].combine_chunks().equals(orig["tokens"].combine_chunks())


def test_manifest_fold_roundtrip(ray_session, tmp_path):
    """E12 scale path: folding the per-partition entry files into
    folded.jsonl must preserve is_committed/committed (incl. tombstones),
    resume must skip every folded partition, and retire of a folded entry
    must create a file tombstone that out-votes the folded live row."""
    import os

    from mq_to_db_ray.gen import write_f1_parquet
    from mq_to_db_ray.pipelines.cascade import run_cascade
    from mq_to_db_ray.state.manifest import FOLDED_LOG, Manifest

    in_dir = str(tmp_path / "in")
    write_f1_parquet(in_dir, 3_000, shards=2, max_tok=8)
    out = str(tmp_path / "out")
    s1 = run_cascade(in_dir, out)
    m = Manifest(out)
    before = m.committed()
    assert before
    n = m.fold(threshold=0)  # force
    assert n == len(before)  # every entry file (raw tier included) folded
    # no entry files remain (only folded.jsonl + layout + locks)
    leftover = [f for f in os.listdir(m.mdir)
                if f.endswith(".json") and f != "layout.json"]
    assert leftover == []
    assert os.path.exists(os.path.join(m.mdir, FOLDED_LOG))
    m2 = Manifest(out)  # fresh instance: reads the folded log
    after = m2.committed()
    assert set(after) == set(before)
    for k in before:
        tier = before[k]["tier"]
        assert m2.is_committed(tier, before[k]["partition"])
    # resume against the folded manifest: everything skips
    s2 = run_cascade(in_dir, out)
    assert s2["rows"] == s1["rows"]
    assert all(
        s2["skipped"][t] == s2["partitions"][t] for t in s2["partitions"]
    )
    # retire a folded entry -> file tombstone wins over folded live row
    key = sorted(k for k in after if k.startswith("tier=1m__source="))[0]
    e = m2.retire(key)
    assert e["tier"] == "1m"
    assert key not in m2.committed("1m")
    assert m2.is_committed("1m", e["partition"])  # tombstone still acks
    # a second fold absorbs the tombstone
    m2.fold(threshold=0)
    m3 = Manifest(out)
    assert key not in m3.committed("1m")
    assert m3.is_committed("1m", e["partition"])
