"""Round-4 wave-19 operators: T65 cross-source vocabulary overlap, T66
boilerplate-prefix exposure, R9 top-k returned-revenue customers — each
vs a scalar brute-force reference on synthetic inputs hitting the edge
cases (1- and 2-word docs in the prefix hash, shared openings across
sources, customers with no returned lines, revenue ties)."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY_US = 86_400_000_000
T0 = np.datetime64("1995-01-01", "us").astype(np.int64)


def _write_docs(tmp_path, texts, srcs):
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(srcs),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")


def test_vocab_overlap_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import vocab_overlap

    g = np.random.default_rng(100)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(g.choice(vocab, size=g.integers(1, 12))) for _ in range(80)
    ]
    srcs = [f"s{i % 4}" for i in range(80)]
    _write_docs(tmp_path, texts, srcs)

    per_src = collections.defaultdict(set)
    for t, s in zip(texts, srcs):
        per_src[s] |= set(t.split(" "))
    want = {}
    keys = sorted(per_src)
    for i, a in enumerate(keys):
        for b in keys[i:]:
            n = len(per_src[a] & per_src[b])
            if n:
                want[(a, b)] = n

    got = vocab_overlap(str(tmp_path)).to_pandas()
    assert {
        (r.source_a, r.source_b): r.n_common_words for r in got.itertuples()
    } == want


def test_prefix_exposure_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import prefix_exposure

    g = np.random.default_rng(101)
    vocab = [f"w{i}" for i in range(6)]
    # lengths 1..8 so the 1-word / 2-word truncation paths are exercised
    texts = [
        " ".join(g.choice(vocab, size=g.integers(1, 9))) for _ in range(120)
    ]
    srcs = [f"s{i % 3}" for i in range(120)]
    _write_docs(tmp_path, texts, srcs)

    def prefix(t):
        return " ".join(t.split(" ")[:3])

    corpus = collections.Counter(prefix(t) for t in texts)
    assert any(v > 1 for v in corpus.values())
    want = {}
    for s in set(srcs):
        docs = [t for t, ss in zip(texts, srcs) if ss == s]
        pres = [prefix(t) for t in docs]
        shared = sum(1 for p in pres if corpus[p] > 1)
        want[s] = (len(docs), len(set(pres)), shared, 1000 * shared // len(docs))

    got = prefix_exposure(str(tmp_path)).to_pandas().set_index("source")
    assert len(got) == len(want)
    for s, (nd, npref, nsh, perm) in want.items():
        r = got.loc[s]
        assert (r.n_docs, r.n_prefixes, r.n_shared, r.shared_permille) == (
            nd,
            npref,
            nsh,
            perm,
        )


def test_returned_revenue_customers_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import returned_revenue_customers

    g = np.random.default_rng(102)
    n_cust, n_orders = 50, 220
    custkeys = np.sort(g.choice(np.arange(1, 150), n_cust, replace=False))
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(custkeys.astype(np.int64)),
                "c_name": pa.array([f"cust-{k}" for k in custkeys]),
                "c_nationkey": pa.array(np.zeros(n_cust, np.int64)),
                "c_acctbal": pa.array(np.zeros(n_cust)),
                "c_mktsegment": pa.array(["M"] * n_cust),
            }
        ),
        tmp_path / "customer.parquet",
    )
    okeys = np.arange(1, n_orders + 1, dtype=np.int64)
    ocust = custkeys[g.integers(0, n_cust, n_orders)].astype(np.int64)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(okeys),
                "o_custkey": pa.array(ocust),
                "o_orderstatus": pa.array(["O"] * n_orders),
                "o_totalprice": pa.array(np.zeros(n_orders)),
                "o_orderdate": pa.array(
                    np.full(n_orders, T0, np.int64), pa.int64()
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n_orders),
            }
        ),
        tmp_path / "orders.parquet",
    )
    lok, lprice, ldisc, lflag = [], [], [], []
    for k in okeys[:-30]:
        for _ in range(int(g.integers(1, 5))):
            lok.append(k)
            lprice.append(round(float(g.uniform(10, 2000)), 2))
            ldisc.append(round(float(g.uniform(0, 0.1)), 2))
            lflag.append(["A", "N", "R"][int(g.integers(0, 3))])
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
                "l_returnflag": pa.array(lflag),
                "l_linestatus": pa.array(["O"] * m),
                "l_shipdate": pa.array(
                    np.full(m, T0, np.int64), pa.int64()
                ).cast(pa.timestamp("us")),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    o2c = dict(zip(okeys.tolist(), ocust.tolist()))
    rev = collections.defaultdict(int)
    for k, p, dc, fl in zip(lok, lprice, ldisc, lflag):
        if fl == "R":
            rev[o2c[int(k)]] += int(np.floor(p * (1.0 - dc)))
    rows = sorted(((r, c) for c, r in rev.items()), key=lambda t: (-t[0], t[1]))[
        :20
    ]

    got = returned_revenue_customers(str(tmp_path)).to_pandas()
    assert len(got) == len(rows)
    for (r, c), row in zip(rows, got.itertuples()):
        assert (row.revenue_floor, row.c_custkey, row.c_name) == (
            r,
            c,
            f"cust-{c}",
        )
