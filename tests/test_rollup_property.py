"""Property-based rollup checks: random (source, seq, n_tok) tables —
arbitrary skew, duplicate seqs, sparse gaps, singleton sources — must match
the pure-Python oracle exactly at every tier, gap-filled or not."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),        # source idx (skewed ok)
        st.integers(min_value=0, max_value=20_000),   # seq (sparse -> gaps)
        st.integers(min_value=0, max_value=512),      # n_tok
    ),
    min_size=1,
    max_size=300,
)


def _table(data) -> pa.Table:
    ks = np.array([d[0] for d in data], dtype=np.int64)
    seqs = np.array([d[1] for d in data], dtype=np.int64)
    ntok = np.array([d[2] for d in data], dtype=np.int32)
    doc_id = [f"s0{k}-{s:08d}" for k, s in zip(ks, seqs)]
    tokens = pa.ListArray.from_arrays(
        pa.array(np.r_[0, np.cumsum(ntok)], type=pa.int32()),
        pa.array(np.zeros(int(ntok.sum()), dtype=np.int32)),
    )
    return pa.table(
        {
            "doc_id": pa.array(doc_id),
            "tokens": tokens,
            "n_tok": pa.array(ntok),
            "source": pa.array([f"s0{k}" for k in ks]),
        }
    )


def _opt_int(v):
    """pandas renders nullable ints as NaN floats; normalize back."""
    return None if v is None or (isinstance(v, float) and np.isnan(v)) else int(v)


@pytest.mark.slow
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=rows, tier=st.sampled_from(["1m", "1h"]), gap=st.booleans())
def test_rollup_random_matches_oracle(ray_session, data, tier, gap):
    import ray.data as rd

    from mq_to_db_ray.stages.gapfill import gap_fill
    from mq_to_db_ray.stages.rollup import rollup
    from mq_to_db_ray.stages.validate import ValidateAssign
    from tests.oracle import rollup_oracle

    t = _table(data)
    ds = rd.from_arrow(t).map_batches(
        ValidateAssign, batch_format="pyarrow", batch_size=37, concurrency=2
    ).drop_columns(["tokens"])
    rolled = rollup(ds, tier)
    if gap:
        rolled = gap_fill(rolled, tier)
    got = sorted(
        (
            dict(
                source=r["source"],
                bucket_ts=int(r["bucket_ts"].timestamp() * 1_000_000),
                count=int(r["count"]),
                sum_n_tok=int(r["sum_n_tok"]),
                min_n_tok=_opt_int(r["min_n_tok"]),
                max_n_tok=_opt_int(r["max_n_tok"]),
                filled=bool(r["filled"]),
            )
            for r in rolled.to_pandas().to_dict("records")
        ),
        key=lambda r: (r["source"], r["bucket_ts"]),
    )
    want = rollup_oracle(t, tier, gap_fill=gap)
    assert got == want
