"""Round-4 wave-40 operators: T87 budget-constrained curriculum trim
(the fixture forces the budget boundary to land INSIDE a tied-length
group, so the doc_id-ordered residual prefix is load-bearing; a
straddling doc must drop), R26 per-nation top customers (grouped top-k
with ties) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_token_budget_trim_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.corpus import token_budget_trim

    g = np.random.default_rng(270)
    texts, srcs = [], []
    # many docs share exact lengths so the boundary group has ties
    for i in range(300):
        nw = int(g.choice([5, 10, 10, 15, 15, 15, 20]))
        texts.append(" ".join(["w"] * nw))
        srcs.append(f"s{i % 3}")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(srcs),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    for budget in (700, 1500, 10**9):
        docs = sorted(
            range(len(texts)),
            key=lambda i: (-len(texts[i]), i),
        )
        want = collections.defaultdict(lambda: [0, 0])
        cum = 0
        for i in docs:
            nt = len(texts[i].split(" "))
            cum += nt
            if cum > budget:
                break  # inclusive-prefix rule: straddler drops, scan ends
            w = want[srcs[i]]
            w[0] += 1
            w[1] += nt

        got = (
            token_budget_trim(str(tmp_path), budget_tokens=budget)
            .to_pandas()
            .set_index("source")
        )
        assert len(got) == 3, budget
        for s in ("s0", "s1", "s2"):
            nd, ntok = want.get(s, (0, 0))
            r = got.loc[s]
            assert (r.n_docs_kept, r.n_tokens_kept) == (nd, ntok), (
                s, budget,
            )
        if budget == 10**9:  # whole corpus affordable
            assert int(got.n_docs_kept.sum()) == len(texts)


def test_nation_top_customers_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import nation_top_customers

    g = np.random.default_rng(271)
    n_nat, n_cust, n_orders = 4, 30, 200
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(np.arange(n_nat, dtype=np.int64)),
                "n_name": pa.array([f"N{i}" for i in range(n_nat)]),
                "n_regionkey": pa.array(np.zeros(n_nat, np.int64)),
            }
        ),
        tmp_path / "nation.parquet",
    )
    custkeys = np.arange(1, n_cust + 1, dtype=np.int64)
    cnat = g.integers(0, n_nat, n_cust).astype(np.int64)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(custkeys),
                "c_name": pa.array([f"cust{k}" for k in custkeys]),
                "c_nationkey": pa.array(cnat),
                "c_acctbal": pa.array(np.zeros(n_cust)),
                "c_mktsegment": pa.array(["M"] * n_cust),
            }
        ),
        tmp_path / "customer.parquet",
    )
    okeys = np.arange(1, n_orders + 1, dtype=np.int64)
    ocust = custkeys[g.integers(0, n_cust, n_orders)]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(okeys),
                "o_custkey": pa.array(ocust, pa.int64()),
                "o_orderstatus": pa.array(["O"] * n_orders),
                "o_totalprice": pa.array(np.zeros(n_orders)),
                "o_orderdate": pa.array(
                    np.full(n_orders, 800000000000000), pa.int64()
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n_orders),
            }
        ),
        tmp_path / "orders.parquet",
    )
    lok, lprice, ldisc = [], [], []
    for k in okeys:
        for _ in range(int(g.integers(1, 4))):
            lok.append(int(k))
            lprice.append(round(float(g.uniform(10, 2000)), 2))
            ldisc.append(round(float(g.uniform(0, 0.1)), 2))
    m = len(lok)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.array(lok, np.int64)),
                "l_partkey": pa.array(np.zeros(m, np.int64)),
                "l_suppkey": pa.array(np.zeros(m, np.int64)),
                "l_linenumber": pa.array(np.zeros(m, np.int32)),
                "l_quantity": pa.array(np.ones(m)),
                "l_extendedprice": pa.array(np.array(lprice)),
                "l_discount": pa.array(np.array(ldisc)),
                "l_tax": pa.array(np.zeros(m)),
                "l_returnflag": pa.array(["N"] * m),
                "l_linestatus": pa.array(["O"] * m),
                "l_shipdate": pa.array(
                    np.full(m, 800000000000000), pa.int64()
                ).cast(pa.timestamp("us")),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    crev = collections.Counter()
    for k, p, dc in zip(lok, lprice, ldisc):
        crev[int(ocust[k - 1])] += int(math.floor(p * (1.0 - dc)))
    per_nat = collections.defaultdict(list)
    for ck, rev in crev.items():
        per_nat[int(cnat[ck - 1])].append((rev, ck))
    want = {}
    for nk, lst in per_nat.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        want[f"N{nk}"] = lst[:3]

    got = nation_top_customers(str(tmp_path)).to_pandas()
    assert len(got) == sum(len(v) for v in want.values())
    for r in got.itertuples():
        rev, ck = want[r.n_name][int(r.rank) - 1]
        assert (r.c_custkey, r.revenue_floor) == (ck, rev), (
            r.n_name, r.rank,
        )
        assert r.c_name == f"cust{ck}"
