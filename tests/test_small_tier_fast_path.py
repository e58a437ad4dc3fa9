"""Hybrid small-tier fast path == distributed path, file for file.

run_cascade commits post-rollup tiers driver-side when the 1m tier is
small (SMALL_TIER_DRIVER_ROWS); this must be a pure latency optimization:
identical partition file names, identical rows at every tier, identical
metric-row multiset, identical manifest behavior — both in the
single-window and the multi-window (window_buckets) layout.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from mq_to_db_ray.gen import write_f1_parquet


def _tier_frames(out_dir: str) -> dict[str, pd.DataFrame]:
    import glob

    import pyarrow.parquet as pq

    frames = {}
    for tier in ("1m", "1h", "1d"):
        files = sorted(
            glob.glob(os.path.join(out_dir, f"tier={tier}", "**", "*.parquet"),
                      recursive=True)
        )
        assert files, f"no partitions for tier {tier} in {out_dir}"
        rel = [os.path.relpath(f, out_dir) for f in files]
        df = pd.concat([pq.read_table(f).to_pandas() for f in files])
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
        frames[tier] = df
        frames[f"{tier}__files"] = rel
    return frames


@pytest.mark.parametrize("window_buckets", [None, 16])
def test_fast_path_matches_distributed(ray_session, tmp_path, window_buckets):
    import mq_to_db_ray.pipelines.cascade as C

    in_dir = str(tmp_path / "in")
    write_f1_parquet(in_dir, 20_000, shards=4, max_tok=16)

    out_fast = str(tmp_path / "fast")
    s_fast = C.run_cascade(in_dir, out_fast, window_buckets=window_buckets)

    orig = C.SMALL_TIER_DRIVER_ROWS
    C.SMALL_TIER_DRIVER_ROWS = 0  # force the distributed path
    try:
        out_dist = str(tmp_path / "dist")
        s_dist = C.run_cascade(in_dir, out_dist, window_buckets=window_buckets)
    finally:
        C.SMALL_TIER_DRIVER_ROWS = orig

    assert s_fast["rows"] == s_dist["rows"]
    assert s_fast["partitions"] == s_dist["partitions"]
    f, d = _tier_frames(out_fast), _tier_frames(out_dist)
    for tier in ("1m", "1h", "1d"):
        assert f[f"{tier}__files"] == d[f"{tier}__files"], tier
        pd.testing.assert_frame_equal(f[tier], d[tier], check_like=True)


def test_fast_path_resume_skips_committed(ray_session, tmp_path):
    """Second run over the same epoch must skip every committed partition."""
    from mq_to_db_ray.pipelines.cascade import run_cascade

    in_dir = str(tmp_path / "in")
    write_f1_parquet(in_dir, 5_000, shards=2, max_tok=8)
    out = str(tmp_path / "out")
    s1 = run_cascade(in_dir, out)
    s2 = run_cascade(in_dir, out)
    assert s2["rows"] == s1["rows"]
    assert s2["skipped"] == {
        t: s1["partitions"][t] for t in s1["partitions"]
    }
