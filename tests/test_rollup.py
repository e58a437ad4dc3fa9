"""Rollup / cascade / gap-fill / encode correctness vs the pure-Python oracle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from mq_to_db_ray.functions.dod import dod_decode
from mq_to_db_ray.functions.gorilla import gorilla_decode
from mq_to_db_ray.gen import f1_table, f3_table
from mq_to_db_ray.stages.validate import split_batch
from oracle import rollup_oracle


def _ds_rows(ds) -> list[dict]:
    """ROLLUP Dataset -> sorted list of plain dicts (bucket_ts as us int)."""
    t = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    t = t.set_column(
        t.schema.get_field_index("bucket_ts"),
        "bucket_ts",
        t["bucket_ts"].cast(pa.timestamp("us")).cast(pa.int64()),
    )
    rows = t.to_pylist()
    rows.sort(key=lambda r: (r["source"], r["bucket_ts"]))
    return rows


def _strip(rows: list[dict], keys=("source", "bucket_ts", "count", "sum_n_tok", "min_n_tok", "max_n_tok", "filled")) -> list[dict]:
    return [{k: r[k] for k in keys} for r in rows]


# ---------- validate / reject lane ----------


def test_split_batch_clean(f1_micro):
    valid, rejects = split_batch(f1_micro)
    assert rejects.num_rows == 0
    assert valid.num_rows == f1_micro.num_rows
    # seq parsed correctly from doc_id
    row = valid.slice(0, 1).to_pylist()[0]
    assert row["seq"] == int(row["doc_id"].rsplit("-", 1)[1])
    # byte-identical token passthrough
    assert valid["tokens"].combine_chunks().equals(f1_micro["tokens"].combine_chunks())


def test_split_batch_rejects():
    t = f3_table(1000)
    valid, rejects = split_batch(t)
    assert valid.num_rows == 1000 - f1_table(1000).num_rows + f1_table(1000).num_rows
    assert valid.num_rows == f1_table(1000).num_rows
    assert rejects.num_rows == 40
    reasons = rejects["reason"].to_pylist()
    assert reasons.count("validate") == 20  # bad n_tok + empty source
    assert reasons.count("parse") == 20  # null tokens + unparseable doc_id
    details = rejects["detail"].to_pylist()
    assert details.count("tokens is null") == 10
    assert details.count("doc_id has no parseable -<seq> suffix") == 10
    assert details.count("source is empty") == 10


def test_split_batch_empty():
    valid, rejects = split_batch(f1_table(1000).slice(0, 0))
    assert valid.num_rows == 0 and rejects.num_rows == 0


# ---------- rollup vs oracle ----------


@pytest.fixture(scope="module")
def assigned_micro(ray_session, f1_micro):
    import ray.data as rd

    from mq_to_db_ray.stages.validate import ValidateAssign

    ds = rd.from_arrow(f1_micro).map_batches(
        ValidateAssign, batch_format="pyarrow", batch_size=100, concurrency=2
    )
    return ds.drop_columns(["tokens"]).materialize()


@pytest.mark.parametrize("tier", ["1m", "1h"])
def test_rollup_matches_oracle(assigned_micro, f1_micro, tier):
    from mq_to_db_ray.stages.rollup import rollup

    got = _strip(_ds_rows(rollup(assigned_micro, tier)))
    want = rollup_oracle(f1_micro, tier, gap_fill=False)
    assert got == want


def test_cascade_matches_direct(assigned_micro, f1_micro):
    from mq_to_db_ray.stages.rollup import cascade, rollup

    m1 = rollup(assigned_micro, "1m").materialize()
    h1 = cascade(m1, "1m", "1h").materialize()
    assert _strip(_ds_rows(h1)) == rollup_oracle(f1_micro, "1h", gap_fill=False)
    d1 = cascade(h1, "1h", "1d")
    assert _strip(_ds_rows(d1)) == rollup_oracle(f1_micro, "1d", gap_fill=False)


def test_gapfill_matches_oracle(ray_session, f1_small):
    import ray.data as rd

    from mq_to_db_ray.stages.gapfill import gap_fill
    from mq_to_db_ray.stages.rollup import rollup
    from mq_to_db_ray.stages.validate import ValidateAssign

    ds = rd.from_arrow(f1_small).map_batches(
        ValidateAssign, batch_format="pyarrow", batch_size=8192, concurrency=2
    ).drop_columns(["tokens"])
    m1 = rollup(ds, "1m")
    filled = gap_fill(m1, "1m")
    got = _strip(_ds_rows(filled))
    want = rollup_oracle(f1_small, "1m", gap_fill=True)
    assert got == want
    # s05 actually has filled holes
    s05 = [r for r in got if r["source"] == "s05" and r["filled"]]
    assert s05 and all(r["count"] == 0 and r["min_n_tok"] is None for r in s05)


def test_block_order_independence(ray_session, f1_micro):
    """Engine must not depend on block/row order (per-consumer FIFO only)."""
    import ray.data as rd

    from mq_to_db_ray.stages.rollup import rollup
    from mq_to_db_ray.stages.validate import ValidateAssign

    perm = np.random.RandomState(7).permutation(f1_micro.num_rows)
    shuffled = f1_micro.take(pa.array(perm))
    ds = rd.from_arrow(shuffled).map_batches(
        ValidateAssign, batch_format="pyarrow", batch_size=77, concurrency=2
    ).drop_columns(["tokens"])
    got = _strip(_ds_rows(rollup(ds, "1m")))
    assert got == rollup_oracle(f1_micro, "1m", gap_fill=False)


def test_single_source_skew(ray_session):
    """Worst-case skew: ONE source owns every row.  The shuffle partitions
    by bucket_id (the salt axis is time, not source), so a hot source still
    spreads across reducers and values stay exact."""
    import ray.data as rd

    from mq_to_db_ray.stages.rollup import rollup
    from tests.oracle import rollup_oracle

    n = 50_000
    seqs = np.arange(n, dtype=np.int64)
    t = pa.table(
        {
            "doc_id": pa.array([f"s00-{s:08d}" for s in seqs]),
            "tokens": pa.array([[1]] * n, type=pa.list_(pa.int32())),
            "n_tok": pa.array(np.ones(n, dtype=np.int32)),
            "source": pa.array(["s00"] * n),
        }
    )
    from mq_to_db_ray.stages.validate import ValidateAssign

    ds = rd.from_arrow(t).map_batches(
        ValidateAssign, batch_format="pyarrow", batch_size=4096, concurrency=2
    ).drop_columns(["tokens"])
    got = _strip(_ds_rows(rollup(ds, "1m")))
    assert got == rollup_oracle(t, "1m", gap_fill=False)
    # n/60 one-minute buckets, all from the single hot source
    assert len(got) == (n + 59) // 60


def test_encode_series_roundtrip(assigned_micro, f1_micro):
    from mq_to_db_ray.stages.encode import encode_series
    from mq_to_db_ray.stages.gapfill import gap_fill
    from mq_to_db_ray.stages.rollup import rollup

    filled = gap_fill(rollup(assigned_micro, "1m"), "1m").materialize()
    series = encode_series(filled, "1m").to_pandas()
    assert set(series["source"]) == {f"s0{k}" for k in range(8)}
    want = rollup_oracle(f1_micro, "1m", gap_fill=True)
    for _, row in series.iterrows():
        vals = [r["sum_n_tok"] for r in want if r["source"] == row["source"]]
        assert dod_decode(row["dod_blob"]) == vals
        assert gorilla_decode(row["gorilla_blob"]) == [float(v) for v in vals]
        assert row["n_points"] == len(vals)


def test_fused_partials_matches_default(ray_session, tmp_path):
    """The opt-in fused stage A (RawPartialsDatasink: raw shards written
    in-task, 1m rollup from the returned partials) must commit tier rows
    identical to the default two-pass path."""
    import pandas as pd

    from mq_to_db_ray.gen import write_f1_parquet
    from mq_to_db_ray.pipelines.cascade import run_cascade

    in_dir = str(tmp_path / "in")
    write_f1_parquet(in_dir, 4_000, shards=3, max_tok=8)
    sa = run_cascade(in_dir, str(tmp_path / "out_default"))
    sb = run_cascade(in_dir, str(tmp_path / "out_fused"), fused_partials=True)
    assert sa["rows"] == sb["rows"]
    assert sa["partitions"] == sb["partitions"]
    for tier in ("1m", "1h", "1d"):
        ta = sa["tiers"][tier].to_pandas().sort_values(
            ["source", "bucket_ts"]).reset_index(drop=True)
        tb = sb["tiers"][tier].to_pandas().sort_values(
            ["source", "bucket_ts"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(ta, tb)
