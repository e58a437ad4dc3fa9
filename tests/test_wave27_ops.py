"""Round-4 wave-27 operators: E84 redelivery/idempotency board (the
fixture PLANTS duplicate event_ids — at-least-once redeliveries — so the
distinct-count lane is load-bearing), T73 lang × quality-band matrix,
R14 large-order drill-down (Q18's HAVING-over-a-join with a local top-k
combiner) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MIN_US = 60_000_000


def test_redelivery_board_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import (
        EVENTS_T0_US,
        events_redelivery_board,
    )

    g = np.random.default_rng(150)
    n = 700
    types = np.array(["a", "b", "c"])[g.integers(0, 3, n)]
    eids = np.arange(n, dtype=np.int64)
    # redeliver ~15% of messages (same id AND same source, like a requeue)
    dup_at = g.choice(n, size=100, replace=False)
    types = np.concatenate([types, types[dup_at]])
    eids = np.concatenate([eids, eids[dup_at]])
    m = len(eids)
    perm = g.permutation(m)
    types, eids = types[perm], eids[perm]
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(types.tolist()),
                "ts": pa.array(
                    EVENTS_T0_US + np.arange(m, dtype=np.int64) * MIN_US,
                    pa.int64(),
                ).cast(pa.timestamp("us")),
                "value": pa.array(np.ones(m)),
                "event_id": pa.array(eids),
                "user_id": pa.array(np.zeros(m, np.int64)),
            }
        ),
        tmp_path / "events.parquet",
    )

    raw = collections.Counter(types.tolist())
    uniq = collections.defaultdict(set)
    for t, e in zip(types, eids):
        uniq[t].add(int(e))

    got = events_redelivery_board(str(tmp_path)).to_pandas().set_index(
        "source"
    )
    assert len(got) == len(raw)
    for t in raw:
        r = got.loc[t]
        nr, nu = raw[t], len(uniq[t])
        assert (r.n_raw, r.n_unique, r.n_redelivered) == (nr, nu, nr - nu)
        assert r.redelivery_permille == (1000 * (nr - nu)) // nr
    assert got.n_redelivered.sum() == 100  # the planted redeliveries


def test_lang_quality_matrix_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.functions.textstats import STOPWORDS
    from mq_to_db_ray.pipelines.training_data import lang_quality_matrix

    g = np.random.default_rng(151)
    vocab = list(STOPWORDS) + ["data", "rows", "batch", "merge", "scan"]
    langs = ["en", "de", "fr"]
    texts, ll = [], []
    for i in range(200):
        texts.append(" ".join(g.choice(vocab, size=g.integers(1, 25))))
        ll.append(langs[i % 3])
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts),
                "lang": pa.array(ll),
                "source": pa.array(["s0"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    want = collections.Counter()
    for t, lg in zip(texts, ll):
        ws = t.split(" ")
        ns = sum(1 for w in ws if w.lower() in STOPWORDS)
        band = int(math.floor(1000.0 * ns / max(len(ws), 1))) // 100
        want[(lg, band)] += 1
    assert len({b for _, b in want}) > 3  # fixture spans several bands

    got = lang_quality_matrix(str(tmp_path)).to_pandas()
    assert {
        (r.lang, int(r.band)): int(r.n_docs) for r in got.itertuples()
    } == dict(want)


def test_large_orders_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import large_orders

    g = np.random.default_rng(152)
    n_cust, n_orders = 30, 150
    custkeys = np.arange(1, n_cust + 1, dtype=np.int64)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(custkeys),
                "c_name": pa.array([f"cust{k}" for k in custkeys]),
                "c_nationkey": pa.array(np.zeros(n_cust, np.int32)),
                "c_acctbal": pa.array(np.zeros(n_cust)),
                "c_mktsegment": pa.array(["M"] * n_cust),
            }
        ),
        tmp_path / "customer.parquet",
    )
    okeys = np.arange(1, n_orders + 1, dtype=np.int64)
    ocust = custkeys[g.integers(0, n_cust, n_orders)]
    totals = g.uniform(100.0, 90000.0, n_orders)
    odate = (
        np.datetime64("1996-01-01")
        + g.integers(0, 700, n_orders).astype("timedelta64[D]")
    ).astype("datetime64[us]")
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(okeys),
                "o_custkey": pa.array(ocust, pa.int64()),
                "o_orderstatus": pa.array(["O"] * n_orders),
                "o_totalprice": pa.array(totals),
                "o_orderdate": pa.array(
                    odate.astype(np.int64), pa.int64()
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n_orders),
            }
        ),
        tmp_path / "orders.parquet",
    )
    lok, lqty = [], []
    for k in okeys:
        for _ in range(int(g.integers(1, 8))):
            lok.append(int(k))
            lqty.append(int(g.integers(1, 50)))
    m = len(lok)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.array(lok, np.int64)),
                "l_partkey": pa.array(np.zeros(m, np.int64)),
                "l_suppkey": pa.array(np.zeros(m, np.int64)),
                "l_linenumber": pa.array(np.ones(m, np.int32)),
                "l_quantity": pa.array(np.array(lqty, np.float64)),
                "l_extendedprice": pa.array(np.ones(m)),
                "l_discount": pa.array(np.zeros(m)),
                "l_tax": pa.array(np.zeros(m)),
                "l_returnflag": pa.array(["N"] * m),
                "l_linestatus": pa.array(["O"] * m),
                "l_shipdate": pa.array(
                    np.full(m, odate[0].astype(np.int64)), pa.int64()
                ).cast(pa.timestamp("us")),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    per_order = collections.Counter()
    for k, q in zip(lok, lqty):
        per_order[k] += q
    big = {k: q for k, q in per_order.items() if q >= 120}
    assert len(big) > 20  # HAVING keeps a real candidate set
    ranked = sorted(big.items(), key=lambda kv: (-kv[1], kv[0]))[:20]

    got = large_orders(str(tmp_path)).to_pandas()
    assert len(got) == 20
    for i, (r, (k, q)) in enumerate(zip(got.itertuples(), ranked)):
        assert r.rank == i + 1
        assert r.o_orderkey == k
        assert r.sum_qty == q
        ck = int(ocust[k - 1])
        assert r.c_custkey == ck
        assert r.c_name == f"cust{ck}"
        assert r.total_floor == int(math.floor(totals[k - 1]))
        assert np.datetime64(r.o_orderdate, "us") == odate[k - 1]
