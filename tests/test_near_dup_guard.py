"""embedding_near_dup quadratic-baseline guard (VERDICT r4 #4)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def tiny_emb_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("embguard")
    rng = np.random.default_rng(7)
    n, dim = 24, 8
    t = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(
            [rng.standard_normal(dim).astype(np.float32) for _ in range(n)],
            pa.list_(pa.float32()),
        ),
    })
    pq.write_table(t, str(d / "embeddings.parquet"))
    return str(d)


def test_guard_refuses_above_cap(ray_session, tiny_emb_dir):
    from mq_to_db_ray.pipelines.training_data import embedding_near_dup

    with pytest.raises(ValueError, match="embedding_near_dup_lsh"):
        embedding_near_dup(tiny_emb_dir, max_rows=10)


def test_exact_opt_in_bypasses_cap(ray_session, tiny_emb_dir):
    from mq_to_db_ray.pipelines.training_data import embedding_near_dup

    ds = embedding_near_dup(tiny_emb_dir, threshold_permille=0,
                            exact=True, max_rows=10)
    out = ds.to_pandas()
    # all unordered pairs with sim >= 0 exist; just check shape + ordering
    assert set(out.columns) == {"vec_a", "vec_b", "sim_permille"}
    assert (out["vec_a"] < out["vec_b"]).all()


def test_default_cap_allows_small_inputs(ray_session, tiny_emb_dir):
    """sf0.01-scale inputs sit far under the default cap — oracle unchanged."""
    from mq_to_db_ray.pipelines.training_data import embedding_near_dup

    ds = embedding_near_dup(tiny_emb_dir, threshold_permille=999)
    assert ds.count() >= 0
