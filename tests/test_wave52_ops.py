"""Round-4 wave-52 operators: T104/F cross-source duplicate-sequence
matrix (planted shared token arrays), R37 repeat-purchase board — each
vs a scalar brute-force reference."""

from __future__ import annotations

import collections
import itertools

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_f1_cross_source_dups_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import f1_cross_source_dups

    g = np.random.default_rng(380)
    n = 400
    srcs = [f"s{i % 4:02d}" for i in range(n)]
    toks = []
    shared = [[7, 8, 9], [1, 2, 3, 4], [5, 5, 5]]
    for i in range(n):
        if i % 5 == 0:  # plant cross-source shared sequences (i%5 walks
            # all four i%4 sources; i%10 would only ever hit s00/s02)
            toks.append(list(shared[(i // 5) % 3]))
        else:
            toks.append(
                g.integers(0, 500, size=g.integers(3, 12)).tolist()
            )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([f"{s}-{i:08d}" for i, s in enumerate(srcs)]),
                "tokens": pa.array(toks, pa.list_(pa.int32())),
                "n_tok": pa.array([len(t) for t in toks], pa.int32()),
                "source": pa.array(srcs),
            }
        ),
        tmp_path / "part-00000.parquet",
    )

    per_src = collections.defaultdict(set)
    for s, t in zip(srcs, toks):
        per_src[s].add(tuple(t))
    want = {}
    for a, b in itertools.combinations(sorted(per_src), 2):
        c = len(per_src[a] & per_src[b])
        if c:
            na, nb = len(per_src[a]), len(per_src[b])
            want[(a, b)] = (na, nb, c, 1000 * c // (na + nb - c))

    got = f1_cross_source_dups(str(tmp_path)).to_pandas()
    assert len(got) == len(want)
    for _, r in got.iterrows():
        na, nb, c, j = want[(r.source_a, r.source_b)]
        assert (
            int(r.n_a), int(r.n_b), int(r.n_common), int(r.jaccard_permille)
        ) == (na, nb, c, j), (r.source_a, r.source_b)
    assert len(want) >= 3  # the planted shared arrays connect the sources


def test_repeat_purchase_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import repeat_purchase

    g = np.random.default_rng(381)
    n_cust, n_ord, n_part, n_line = 40, 150, 30, 1000
    ocust = g.integers(0, n_cust, n_ord).astype(np.int64)
    brand = np.array([f"Brand#{i}" for i in range(1, 5)])[
        g.integers(0, 4, n_part)
    ]
    lord = g.integers(0, n_ord, n_line).astype(np.int64)
    lpart = g.integers(0, n_part, n_line).astype(np.int64)

    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
                "o_custkey": pa.array(ocust),
                "o_orderstatus": pa.array(["O"] * n_ord),
                "o_totalprice": pa.array(np.zeros(n_ord)),
                "o_orderdate": pa.array(
                    np.full(n_ord, 800000000000000), pa.int64()
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n_ord),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
                "p_name": pa.array([f"p{i}" for i in range(n_part)]),
                "p_brand": pa.array(brand.tolist()),
                "p_type": pa.array(["STANDARD"] * n_part),
                "p_size": pa.array(np.ones(n_part, np.int32)),
                "p_retailprice": pa.array(np.ones(n_part)),
            }
        ),
        tmp_path / "part.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(lord),
                "l_partkey": pa.array(lpart),
                "l_suppkey": pa.array(np.zeros(n_line, np.int64)),
                "l_linenumber": pa.array(np.ones(n_line, np.int32)),
                "l_quantity": pa.array(np.ones(n_line)),
                "l_extendedprice": pa.array(np.ones(n_line)),
                "l_discount": pa.array(np.zeros(n_line)),
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

    pair_n = collections.Counter()
    for ok, pk in zip(lord, lpart):
        pair_n[(int(ocust[ok]), int(pk))] += 1
    want = collections.defaultdict(lambda: [0, 0, 0])
    for (ck, pk), n in pair_n.items():
        w = want[brand[pk]]
        w[0] += 1
        w[1] += int(n >= 2)
        w[2] += n

    got = repeat_purchase(str(tmp_path)).to_pandas().set_index("p_brand")
    assert len(got) == len(want)
    for b, (pairs, rep, lines) in want.items():
        r = got.loc[b]
        assert (
            int(r.n_pairs), int(r.n_repeat_pairs), int(r.n_lines)
        ) == (pairs, rep, lines), b
    assert int(got.n_repeat_pairs.sum()) > 0  # dense draw guarantees repeats
