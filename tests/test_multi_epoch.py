"""Continuous operation: repeated epochs into one out dir, merged at read
time by tier_view (aggregates are associative), equal to a single run over
the union — including tier buckets that straddle the epoch boundary."""

import glob

import pyarrow as pa
import pyarrow.compute as pc


def _sorted(t: pa.Table) -> pa.Table:
    t = t.combine_chunks()
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("source", "ascending"), ("bucket_ts", "ascending")]
        )
    ).select(["source", "bucket_ts", "count", "sum_n_tok", "min_n_tok", "max_n_tok"])


def test_multi_epoch_view_equals_single_run(ray_session, tmp_path):
    from mq_to_db_ray.gen import write_f1_parquet
    from mq_to_db_ray.pipelines.cascade import run_cascade
    from mq_to_db_ray.pipelines.view import tier_view

    in_dir = str(tmp_path / "in")
    # contiguous shards: epoch A = first half of the stream, epoch B = rest;
    # the boundary lands mid-bucket so 1m and 1h points straddle epochs
    files = write_f1_parquet(in_dir, 30_000, shards=4, max_tok=16,
                             layout="contiguous")
    out_multi = str(tmp_path / "multi")
    sa = run_cascade(files[:2], out_multi)
    sb = run_cascade(files[2:], out_multi)
    assert sa["epoch"] != sb["epoch"]

    out_single = str(tmp_path / "single")
    s = run_cascade(files, out_single)

    for tier in ("1m", "1h", "1d"):
        got = _sorted(
            tier_view(out_multi, tier).to_pandas().pipe(pa.Table.from_pandas)
        )
        want = _sorted(
            s["tiers"][tier].to_pandas().pipe(pa.Table.from_pandas)
        )
        assert got.equals(want), f"tier {tier} mismatch"


def test_multi_epoch_partitions_coexist(ray_session, tmp_path):
    from mq_to_db_ray.gen import write_f1_parquet
    from mq_to_db_ray.pipelines.cascade import run_cascade

    in_dir = str(tmp_path / "in")
    files = write_f1_parquet(in_dir, 6_000, shards=2, max_tok=8,
                             layout="contiguous")
    out = str(tmp_path / "out")
    run_cascade(files[:1], out)
    run_cascade(files[1:], out)
    # per-epoch partitions coexist (no overwrite/skip collisions)
    parts = glob.glob(out + "/tier=1m/source=s00/*.parquet")
    assert len(parts) == 2
    manifest = glob.glob(out + "/_MANIFEST/tier=1m__source=s00*.json")
    assert len(manifest) == 2
