"""Round-4 wave-49 operators: T99 per-dimension quantized quantiles,
T100/F tape stutter board (planted adjacent-equal token runs), R35
order fan-out profile — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_embedding_dim_quantiles_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import embedding_dim_quantiles

    g = np.random.default_rng(350)
    n, d = 400, 6
    vecs = g.normal(scale=0.4, size=(n, d)).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
                "label": pa.array(np.zeros(n, np.int32)),
            }
        ),
        tmp_path / "embeddings.parquet",
    )

    got = embedding_dim_quantiles(str(tmp_path)).to_pandas().set_index("dim")
    assert len(got) == d
    for dim in range(1, d + 1):
        q = np.sort(
            np.floor(1000.0 * vecs[:, dim - 1].astype(np.float64)).astype(
                np.int64
            )
        )
        r = got.loc[dim]
        assert int(r.n_vecs) == n
        # rank rule: thr = ceil(n*q/1000), 1-based -> index thr-1
        assert int(r.p50_q) == int(q[(n * 500 + 999) // 1000 - 1]), dim
        assert int(r.p90_q) == int(q[(n * 900 + 999) // 1000 - 1]), dim


def test_f1_stutter_stats_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import f1_stutter_stats

    g = np.random.default_rng(351)
    n = 300
    toks = []
    for i in range(n):
        t = g.integers(0, 50, size=g.integers(2, 15)).astype(np.int32)
        if i % 7 == 0:  # plant a stutter run
            t = np.concatenate([t, np.array([9, 9, 9], np.int32)])
        toks.append(t)
    srcs = [f"s{i % 4:02d}" for i in range(n)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([f"{s}-{i:08d}" for i, s in enumerate(srcs)]),
                "tokens": pa.array(
                    [t.tolist() for t in toks], pa.list_(pa.int32())
                ),
                "n_tok": pa.array([len(t) for t in toks], pa.int32()),
                "source": pa.array(srcs),
            }
        ),
        tmp_path / "part-00000.parquet",
    )

    want = collections.defaultdict(lambda: [0, 0, 0, 0])
    for s, t in zip(srcs, toks):
        st = int(np.sum(t[1:] == t[:-1]))
        w = want[s]
        w[0] += 1
        w[1] += len(t) - 1
        w[2] += st
        w[3] += int(st > 0)

    got = f1_stutter_stats(str(tmp_path)).to_pandas().set_index("source")
    assert len(got) == 4
    for s, (ns, np_, st, hs) in want.items():
        r = got.loc[s]
        assert (
            int(r.n_seqs),
            int(r.n_adj_pairs),
            int(r.n_stutter_pairs),
            int(r.n_stutter_seqs),
        ) == (ns, np_, st, hs), s
    assert int(got.n_stutter_pairs.sum()) >= 2 * (n // 7)  # planted runs


def test_order_size_profile_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import order_size_profile

    g = np.random.default_rng(352)
    n_ord, n_line = 150, 1000
    lord = g.integers(0, n_ord, n_line).astype(np.int64)
    ext = g.uniform(100, 8000, n_line)
    dis = g.integers(0, 11, n_line) / 100.0

    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(lord),
                "l_partkey": pa.array(np.zeros(n_line, np.int64)),
                "l_suppkey": pa.array(np.zeros(n_line, np.int64)),
                "l_linenumber": pa.array(np.ones(n_line, np.int32)),
                "l_quantity": pa.array(np.ones(n_line)),
                "l_extendedprice": pa.array(ext),
                "l_discount": pa.array(dis),
                "l_tax": pa.array(np.zeros(n_line)),
                "l_returnflag": pa.array(["N"] * n_line),
                "l_linestatus": pa.array(["O"] * n_line),
                "l_shipdate": pa.array(
                    np.full(n_line, 800000000000000), pa.int64()
                ).cast(pa.timestamp("us")),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    per_o = collections.defaultdict(lambda: [0, 0])
    for ok, e, d in zip(lord, ext, dis):
        w = per_o[int(ok)]
        w[0] += 1
        w[1] += int(math.floor(e * (1.0 - d)))
    want = collections.defaultdict(lambda: [0, 0])
    for sz, rev in per_o.values():
        w = want[sz]
        w[0] += 1
        w[1] += rev

    got = order_size_profile(str(tmp_path)).to_pandas().set_index("order_size")
    assert len(got) == len(want)
    for sz, (no, rev) in want.items():
        r = got.loc[sz]
        assert (int(r.n_orders), int(r.revenue_floor)) == (no, rev), sz
    assert int(got.n_orders.sum()) == len(per_o)
