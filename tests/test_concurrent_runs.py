"""Competing-consumer robustness: the reference runs two service replicas
against one queue (/root/reference/docker-compose.yaml:88-146).  Our analog:
two processes running the SAME epoch into the SAME out dir concurrently.
Deterministic partition names + atomic renames + manifest ack-once mean the
result must be identical to a single run — no duplicates, no corruption."""

import glob
import os
import subprocess
import sys

import pytest

_RUNNER = r"""
import sys, os
sys.argv = [sys.argv[0]]
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from mq_to_db_ray.pipelines.cascade import run_cascade
s = run_cascade(os.environ["IN_DIR"], os.environ["OUT_DIR"])
print("ROWS", s["rows"])
ray.shutdown()
"""


@pytest.mark.slow
def test_two_concurrent_replicas_one_epoch(tmp_path):
    from mq_to_db_ray.gen import write_f1_parquet

    in_dir = str(tmp_path / "in")
    files = write_f1_parquet(in_dir, 20_000, shards=4, max_tok=16)
    out = str(tmp_path / "out")
    env = dict(os.environ, IN_DIR=in_dir, OUT_DIR=out, RAY_ADDRESS="local")
    procs = [
        subprocess.Popen([sys.executable, "-c", _RUNNER], env=env,
                         cwd="/root/repo", stdout=subprocess.PIPE,
                         stderr=subprocess.DEVNULL)
        for _ in range(2)
    ]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    assert all(p.returncode == 0 for p in procs), outs

    # single source of truth afterwards: view == single-run oracle counts
    import duckdb

    import pyarrow.parquet as pq

    n_input = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    total = 0
    from mq_to_db_ray.state.manifest import Manifest

    m = Manifest(out)
    paths = [
        os.path.join(out, e["path"])
        for e in m.committed("1m").values()
        if not e["partition"].startswith("series__")
    ]
    con = duckdb.connect()
    total = con.sql(
        f"SELECT sum(count) FROM read_parquet({paths!r})"
    ).fetchone()[0]
    assert total == n_input
    # exactly one manifest entry per (tier=1m, source) partition
    entries = glob.glob(out + "/_MANIFEST/tier=1m__source=*.json")
    assert len(entries) == len(set(entries)) == len(paths)
