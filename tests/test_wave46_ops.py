"""Round-4 wave-46 operators: T93 token-casing composition (planted
capitalized / ALL-CAPS / mixed / non-ASCII tokens), T94 per-label
embedding energy stats, R32 supplier-fulfillment concentration — each vs
a scalar brute-force reference."""

from __future__ import annotations

import collections
import math
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_case_stats_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import case_stats

    texts = [
        "The QUICK brown Fox JUMPS over 123 the lazy DOG",
        "all lower tokens here nothing Upper",
        "MIXED CaSe ToKeNs ALL123 X9 9x _ ,",
        "Ünicode Ärger straße ÉCLAIR résumé",
        "a  b",  # double space -> empty token
    ]
    srcs = ["s1", "s1", "s2", "s2", "s2"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(srcs),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    want = collections.defaultdict(lambda: [0, 0, 0])
    for t, s in zip(texts, srcs):
        for tok in t.split(" "):
            w = want[s]
            w[0] += 1
            if tok[:1] and "A" <= tok[:1] <= "Z":
                w[1] += 1
            if re.search("[A-Z]", tok) and not re.search("[a-z]", tok):
                w[2] += 1

    got = case_stats(str(tmp_path)).to_pandas().set_index("source")
    assert len(got) == 2
    for s, (nt, nc, nu) in want.items():
        r = got.loc[s]
        assert (
            int(r.n_tokens), int(r.n_cap_tokens), int(r.n_upper_tokens)
        ) == (nt, nc, nu), s
    assert int(got.n_cap_tokens.sum()) > 0
    assert int(got.n_upper_tokens.sum()) > 0


def test_embedding_label_energy_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import embedding_label_energy

    g = np.random.default_rng(330)
    n, d = 300, 12
    vecs = g.normal(size=(n, d)).astype(np.float32)
    labels = g.integers(0, 5, n).astype(np.int32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
                "label": pa.array(labels),
            }
        ),
        tmp_path / "embeddings.parquet",
    )

    want = collections.defaultdict(lambda: [0, 0, 0])
    for i in range(n):
        q = [int(math.floor(1000.0 * float(x))) for x in vecs[i]]
        w = want[int(labels[i])]
        w[0] += 1
        w[1] += sum(q)
        w[2] += sum(x * x for x in q)

    got = embedding_label_energy(str(tmp_path)).to_pandas().set_index("label")
    assert len(got) == len(want)
    for lab, (nv, sq, sqq) in want.items():
        r = got.loc[lab]
        assert (int(r.n_vecs), int(r.sum_q), int(r.sum_qq)) == (nv, sq, sqq)


def test_supplier_concentration_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import supplier_concentration

    g = np.random.default_rng(331)
    n_supp, n_line, n_nat = 30, 1200, 4
    snat = g.integers(0, n_nat, n_supp).astype(np.int64)
    # supplier 29 gets no lines at all (LEFT JOIN zero row)
    lsupp = g.integers(0, n_supp - 1, n_line).astype(np.int64)
    ext = g.uniform(100, 4000, n_line)
    dis = g.integers(0, 11, n_line) / 100.0

    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
                "s_name": pa.array([f"s{i}" for i in range(n_supp)]),
                "s_nationkey": pa.array(snat),
                "s_acctbal": pa.array(np.zeros(n_supp)),
            }
        ),
        tmp_path / "supplier.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(np.arange(n_nat, dtype=np.int64)),
                "n_name": pa.array([f"NAT{i}" for i in range(n_nat)]),
                "n_regionkey": pa.array(np.zeros(n_nat, np.int64)),
            }
        ),
        tmp_path / "nation.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(n_line, dtype=np.int64)),
                "l_partkey": pa.array(np.zeros(n_line, np.int64)),
                "l_suppkey": pa.array(lsupp),
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

    per_supp = collections.defaultdict(lambda: [0, 0])
    for s, e, d in zip(lsupp, ext, dis):
        per_supp[int(s)][0] += 1
        per_supp[int(s)][1] += int(math.floor(e * (1.0 - d)))
    want = {f"NAT{k}": [0, 0, 0, 0] for k in range(n_nat)}
    for s in range(n_supp):
        w = want[f"NAT{snat[s]}"]
        nl, rev = per_supp.get(s, [0, 0])
        w[0] += 1
        w[1] += nl
        w[2] += rev
        w[3] = max(w[3], nl)

    got = supplier_concentration(str(tmp_path)).to_pandas().set_index(
        "n_name"
    )
    assert len(got) == n_nat
    for nm, (nsupp, nl, rev, mx) in want.items():
        r = got.loc[nm]
        assert (
            int(r.n_suppliers), int(r.n_lines),
            int(r.revenue_floor), int(r.top_supplier_lines),
        ) == (nsupp, nl, rev, mx), nm
