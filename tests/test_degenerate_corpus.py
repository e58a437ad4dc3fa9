"""Degenerate-corpus robustness: every pipeline must survive a 1-row
corpus — the case where filters drop everything, candidate sets are
empty, and Ray delivers schema-less empty blocks (fully-filtered shards
hit the same paths at scale).  A full sweep of queries() ran clean on
this fixture when the suite was built; this test pins the paths that
actually broke then (empty ANN candidate sets, empty packing input)
plus one representative of each kernel family."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ray.data import Dataset

QUERIES = [
    # the four that crashed before the fix
    "ann_cosine_top10",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "doc_corpus_prep",
    # one representative per kernel family
    "events_retention_cohort",   # lexsort dedupe combiners
    "events_funnel",             # per-user fold
    "events_dau_wau_mau",        # replicate-then-dedupe
    "events_pareto",             # histogram + pareto tail
    "events_top_sessions",       # local top-k
    "events_minute_percentile",  # broadcast-of-aggregate
    "doc_dup_clusters",          # propagation loop (no pairs at all)
    "doc_near_dedup_keep",       # anti-join with empty losers
    "doc_quality_funnel",        # fused feature kernel
    "doc_vocab_coverage",        # per-partition top-k + residual
    "doc_curriculum_rank",       # count-based ranking
    "rel_order_fulfillment",     # big-by-big co-partitioned join
    "rel_segment_sales",         # co-partitioned dim join
    "events_session_conversion", # per-user gap split
    "events_concurrent_sessions",# interval explode
    "events_week_retention",     # week-axis retention fold
    "doc_shingle_novelty",       # shingle first-introduction
    "doc_dup_matrix",            # dense zero board on a dup-free corpus
]


@pytest.fixture(scope="module")
def micro_dir(tmp_path_factory):
    from mq_to_db_ray.pipelines.events import EVENTS_T0_US

    d = tmp_path_factory.mktemp("micro")
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(["a"]),
                "ts": pa.array([EVENTS_T0_US + 123], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "value": pa.array([1.5]),
                "event_id": pa.array([0], pa.int64()),
                "user_id": pa.array([7], pa.int64()),
            }
        ),
        d / "events.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "text": pa.array(["hello world of tiny docs"]),
                "lang": pa.array(["en"]),
                "source": pa.array(["s0"]),
                "n_chars": pa.array([24], pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0], pa.int64()),
                "embedding": pa.array(
                    [np.ones(16, np.float32)], pa.list_(pa.float32())
                ),
                "label": pa.array([1], pa.int64()),
            }
        ),
        d / "embeddings.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1], pa.int64()),
                "c_name": pa.array(["c1"]),
                "c_nationkey": pa.array([0], pa.int64()),
                "c_acctbal": pa.array([1.0]),
                "c_mktsegment": pa.array(["M"]),
            }
        ),
        d / "customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1], pa.int64()),
                "o_custkey": pa.array([1], pa.int64()),
                "o_orderstatus": pa.array(["O"]),
                "o_totalprice": pa.array([10.5]),
                "o_orderdate": pa.array([EVENTS_T0_US], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["1-U"]),
            }
        ),
        d / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1], pa.int64()),
                "l_partkey": pa.array([1], pa.int64()),
                "l_suppkey": pa.array([1], pa.int64()),
                "l_linenumber": pa.array([1], pa.int32()),
                "l_quantity": pa.array([2.0]),
                "l_extendedprice": pa.array([20.5]),
                "l_discount": pa.array([0.0]),
                "l_tax": pa.array([0.0]),
                "l_returnflag": pa.array(["A"]),
                "l_linestatus": pa.array(["F"]),
                "l_shipdate": pa.array([EVENTS_T0_US], pa.int64()).cast(
                    pa.timestamp("us")
                ),
            }
        ),
        d / "lineitem.parquet",
    )
    return str(d)


@pytest.mark.parametrize("name", QUERIES)
def test_degenerate_corpus(ray_session, micro_dir, name):
    import __ray_entry__ as entry

    out = entry.queries()[name](micro_dir)
    n = out.count() if isinstance(out, Dataset) else len(out)
    assert n >= 0  # must not raise; zero-row results are legitimate
