"""Surgical partition repair (pipelines/repair.py): corrupt / delete one
source's tier partitions, repair, and require the merged view to equal
the pre-damage view BIT-EXACTLY — while every other partition's file is
untouched (mtime identity).  Also: invalidate() must beat the folded log,
and repairing a cascaded tier must leave the lower tiers alone."""

from __future__ import annotations

import glob
import os

import pandas as pd
import pytest


def _run(tmp_path, n=4_000):
    import ray.data as rd  # noqa: F401  (ensures Ray Data registered)

    from mq_to_db_ray.gen import write_f1_parquet
    from mq_to_db_ray.pipelines.cascade import run_cascade

    src = tmp_path / "epoch"
    write_f1_parquet(str(src), n, shards=3)
    out = tmp_path / "out"
    run_cascade(str(src), str(out))
    return str(out)


def _view(out, tier):
    from mq_to_db_ray.pipelines.view import tier_view

    return (
        tier_view(out, tier)
        .to_pandas()
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )


def test_repair_1m_after_corruption(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.repair import repair_tier
    from mq_to_db_ray.state.manifest import Manifest

    out = _run(tmp_path)
    before = _view(out, "1m")
    victim = "s03"
    files = glob.glob(os.path.join(out, "tier=1m", f"source={victim}", "*"))
    assert files
    # bitrot: truncate one partition, delete another source file outright
    with open(files[0], "wb") as f:
        f.write(b"garbage")
    others = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(out, "tier=1m", "source=*", "*"))
        if f"source={victim}" not in p
    }

    summary = repair_tier(out, "1m", victim)
    assert summary["invalidated"] >= 2  # data + series entries
    assert summary["recommitted"]

    after = _view(out, "1m")
    pd.testing.assert_frame_equal(before, after)
    # untouched sources keep their exact files (no epoch-wide rewrite)
    for p, mt in others.items():
        assert os.path.getmtime(p) == mt, p
    # exactly one live data entry per repaired partition
    m = Manifest(out)
    live = [
        k
        for k, e in m.committed("1m").items()
        if f"source={victim}" in e["partition"]
        and not e["partition"].startswith("series__")
    ]
    assert len(live) == len(
        glob.glob(os.path.join(out, "tier=1m", f"source={victim}", "*"))
    )


def test_repair_1d_leaves_lower_tiers(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.repair import repair_tier

    out = _run(tmp_path)
    before_1d = _view(out, "1d")
    before_1m_files = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(out, "tier=1m", "source=*", "*"))
    }
    victim = "s01"
    for p in glob.glob(os.path.join(out, "tier=1d", f"source={victim}", "*")):
        os.unlink(p)

    repair_tier(out, "1d", victim)

    after_1d = _view(out, "1d")
    pd.testing.assert_frame_equal(before_1d, after_1d)
    for p, mt in before_1m_files.items():
        assert os.path.getmtime(p) == mt, p


def test_repair_resume_interplay(ray_session, tmp_path):
    """After a repair, re-running the SAME epoch must skip everything —
    the recommitted entries are acked under the original partition names."""
    from mq_to_db_ray.gen import write_f1_parquet
    from mq_to_db_ray.pipelines.cascade import run_cascade
    from mq_to_db_ray.pipelines.repair import repair_tier

    src = tmp_path / "epoch"
    write_f1_parquet(str(src), 3_000, shards=2)
    out = tmp_path / "out"
    run_cascade(str(src), str(out))
    repair_tier(str(out), "1m", "s02")
    summary = run_cascade(str(src), str(out))
    assert summary["skipped"]["1m"] == summary["partitions"]["1m"]
    assert summary["skipped"]["1d"] == summary["partitions"]["1d"]


def test_invalidate_beats_folded_log(ray_session, tmp_path):
    from mq_to_db_ray.state.manifest import Manifest

    out = _run(tmp_path, n=2_000)
    m = Manifest(out)
    m.fold(threshold=1)  # force every entry into folded.jsonl
    keys = [
        k
        for k, e in m.committed("1m").items()
        if "source=s00" in e["partition"]
    ]
    assert keys
    for k in keys:
        entry = m.invalidate(k)
        assert entry is not None
    m2 = Manifest(out)
    for k in keys:
        tier, part = k.split("__", 1)
        assert not m2.is_committed(tier.split("=", 1)[1], part)


def test_repair_unknown_tier_rejected(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.repair import repair_tier

    with pytest.raises(ValueError):
        repair_tier(str(tmp_path), "5s", "s00")
