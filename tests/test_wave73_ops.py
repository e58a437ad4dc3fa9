"""Round-4 wave-73 operators: E120 leading-digit (Benford) audit
(planted single-digit sources pin the profile; the dense 1..9 spine
holds zeros), T127 vocabulary-retirement deciles (planted words that
die early/late pin decile attribution and lifespan), R54 first-order
predictiveness (planted one-shot vs repeat customers with same-day tie
breaks) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_benford_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_benford

    g = np.random.default_rng(580)
    base = np.datetime64("2026-03-01", "us").astype(np.int64)
    et, val = [], []
    # planted: "flat" emits only values with leading digit 7
    for _ in range(40):
        et.append("flat")
        val.append(float(g.uniform(7.0, 7.999)))
    # organic-ish spread
    for _ in range(900):
        et.append("organic")
        val.append(float(np.exp(g.uniform(-3, 6))))
    n = len(et)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(et),
                "ts": pa.array(
                    base + np.arange(n, dtype=np.int64) * 1_000
                ).cast(pa.timestamp("us")),
                "value": pa.array(np.array(val)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.ones(n, np.int64)),
            }
        ),
        tmp_path / "events.parquet",
    )

    want = collections.defaultdict(collections.Counter)
    tot = collections.Counter()
    for s, v in zip(et, val):
        m = int(np.floor(v * 1000))
        while m >= 10:
            m //= 10
        want[s][m] += 1
        tot[s] += 1
    got = events_benford(str(tmp_path)).to_pandas()
    assert len(got) == 2 * 9
    got = got.set_index(["source", "digit"]).sort_index()
    for s in ("flat", "organic"):
        for d in range(1, 10):
            row = got.loc[(s, d)]
            assert row["n_events"] == want[s][d]
            assert row["permille"] == 1000 * want[s][d] // tot[s]
    assert got.loc[("flat", 7), "permille"] == 1000


def test_doc_vocab_retire_deciles_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import vocab_retire_deciles

    g = np.random.default_rng(581)
    vocab = [f"w{i}" for i in range(25)]
    n_docs = 200
    texts = []
    for i in range(n_docs):
        words = list(g.choice(vocab[:15], int(g.integers(3, 10))))
        # "early": born doc 0, dies doc 19 (decile 0)
        if i == 0 or i == 19:
            words.append("early")
        # "late": born doc 5, dies in the last decile
        if i == 5 or i == n_docs - 1:
            words.append("late")
        texts.append(" ".join(words))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * n_docs),
                "source": pa.array(["s"] * n_docs),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    mind, maxd, occ = {}, {}, collections.Counter()
    for i, t in enumerate(texts):
        for w in t.split(" "):
            mind.setdefault(w, i)
            maxd[w] = i
            occ[w] += 1
    want = collections.defaultdict(lambda: [0, 0, 0])
    for w in occ:
        dec = maxd[w] * 10 // n_docs
        want[dec][0] += 1
        want[dec][1] += occ[w]
        want[dec][2] += maxd[w] - mind[w]
    got = vocab_retire_deciles(str(tmp_path)).to_pandas()
    got = got.set_index("decile").sort_index()
    assert list(got.index) == list(range(10))
    for d in range(10):
        assert got.loc[d, "retired_types"] == want[d][0]
        assert got.loc[d, "occurrences"] == want[d][1]
        assert got.loc[d, "sum_lifespan"] == want[d][2]
    # planted: "early" retires in decile 0 with lifespan 19
    assert want[0][0] >= 1


def test_rel_first_order_value_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import first_order_value

    g = np.random.default_rng(582)
    # customers 1..50, two segments; customer 1 has a same-day tie
    # (orderkeys 11 and 12 on the same date -> 11 wins)
    n_cust = 50
    segs = ["AUTOMOBILE" if i % 2 else "MACHINERY" for i in range(n_cust)]
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(
                    np.arange(1, n_cust + 1, dtype=np.int64)
                ),
                "c_name": pa.array([f"c{i}" for i in range(n_cust)]),
                "c_nationkey": pa.array(np.zeros(n_cust, np.int32)),
                "c_acctbal": pa.array(np.zeros(n_cust)),
                "c_mktsegment": pa.array(segs),
            }
        ),
        tmp_path / "customer.parquet",
    )
    base = np.datetime64("2025-01-01", "us").astype(np.int64)
    ok, ck, tp, od = [], [], [], []
    key = 10
    for c in range(1, n_cust + 1):
        n_orders = 1 if c % 5 == 0 else 1 + int(g.integers(1, 4))
        for j in range(n_orders):
            key += 1
            ok.append(key)
            ck.append(c)
            tp.append(round(float(g.uniform(100, 9000)), 2))
            # customer 1: both orders on the same day (tie)
            day = 0 if c == 1 else int(g.integers(0, 400))
            od.append(base + day * 86_400_000_000)
    n = len(ok)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.array(ok, np.int64)),
                "o_custkey": pa.array(np.array(ck, np.int64)),
                "o_orderstatus": pa.array(["O"] * n),
                "o_totalprice": pa.array(np.array(tp)),
                "o_orderdate": pa.array(np.array(od, np.int64)).cast(
                    pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * n),
            }
        ),
        tmp_path / "orders.parquet",
    )

    per = collections.defaultdict(list)
    for k, c, v, d in zip(ok, ck, tp, od):
        per[c].append((d, k, int(np.floor(v))))
    want = collections.defaultdict(lambda: [0, 0, 0, 0])
    for c, orders in per.items():
        orders.sort()
        seg = segs[c - 1]
        want[seg][0] += 1
        want[seg][1] += 1 if len(orders) >= 2 else 0
        want[seg][2] += orders[0][2]
        want[seg][3] += sum(v for _, _, v in orders)
    got = first_order_value(str(tmp_path)).to_pandas()
    got = got.set_index("segment").sort_index()
    assert list(got.index) == sorted(want)
    for s, (nc, nr, sf, sl) in want.items():
        row = got.loc[s]
        assert row["n_customers"] == nc
        assert row["n_repeat"] == nr
        assert row["sum_first"] == sf
        assert row["sum_lifetime"] == sl
        assert row["first_permille"] == 1000 * sf // max(sl, 1)
