"""Round-4 wave-45 operators: E99 payload-roughness stats (planted
cross-window value jumps), T92 benchmark-exposure board (planted eval
shingle leaks), R31 rich-cohort activity — each vs a scalar brute-force
reference."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MIN_US = 60_000_000


def test_value_volatility_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import (
        EVENTS_T0_US,
        events_value_volatility,
    )

    g = np.random.default_rng(320)
    n = 1600
    types = np.array(["a", "b", "c"])[g.integers(0, 3, n)]
    # spread over many hours so windows split source histories
    ts = EVENTS_T0_US + g.integers(0, 3_000, n).astype(np.int64) * MIN_US
    val = g.uniform(-100, 100, n)
    val[:4] = [50.0, -50.0, 0.0, 49.9]  # planted jumps
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(types.tolist()),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "value": pa.array(val),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.zeros(n, np.int64)),
            }
        ),
        tmp_path / "events.parquet",
    )

    per_src = collections.defaultdict(list)
    for i in range(n):
        per_src[types[i]].append((int(ts[i]), i, int(math.floor(val[i]))))
    want = {}
    for s, rows in per_src.items():
        rows.sort()
        dv = [abs(b[2] - a[2]) for a, b in zip(rows, rows[1:])]
        want[s] = (len(dv), sum(dv), max(dv))

    got = events_value_volatility(str(tmp_path)).to_pandas().set_index(
        "source"
    )
    assert len(got) == 3
    for s, (cnt, sm, mx) in want.items():
        r = got.loc[s]
        assert (int(r.n_steps), int(r.sum_abs_dv), int(r.max_abs_dv)) == (
            cnt,
            sm,
            mx,
        ), s


def _sh3(words):
    n = max(len(words) - 2, 1)
    return {" ".join(words[i : i + 3]) for i in range(n)}


def test_eval_exposure_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import eval_exposure

    vocab = [f"w{i:03d}" for i in range(300)]
    ids, texts = [], []
    # eval docs 0..9 with disjoint vocab slices
    for i in range(10):
        ids.append(i)
        texts.append(" ".join(vocab[20 * i : 20 * i + 15]))
    # corpus docs: doc 100 copies eval doc 0's middle; doc 101 copies a
    # slice of eval doc 2; docs 102/103 BOTH copy the same slice of eval
    # doc 4 (distinct-doc counting); 20 clean docs share nothing
    ids += [100, 101, 102, 103]
    texts += [
        " ".join(vocab[3:10]) + " xcl1 xcl2",
        " ".join(vocab[45:52]) + " xcl3",
        " ".join(vocab[82:89]),
        "pre1 pre2 " + " ".join(vocab[82:89]),
    ]
    g = np.random.default_rng(321)
    for i in range(200, 220):
        ids.append(i)
        texts.append(
            " ".join(f"c{i}x{j}" for j in range(int(g.integers(5, 20))))
        )
    srcs = ["s"] * len(ids)

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(ids)),
                "source": pa.array(srcs),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    evs = {i: _sh3(t.split(" ")) for i, t in zip(ids, texts) if i < 10}
    want = {}
    for e, es in evs.items():
        covered = set()
        hit_docs = set()
        for i, t in zip(ids, texts):
            if i < 10:
                continue
            cs = _sh3(t.split(" "))
            shared = es & cs
            if shared:
                covered |= shared
                hit_docs.add(i)
        want[e] = (len(es), len(covered), len(hit_docs))
    assert want[4][2] == 2  # two distinct docs hit eval doc 4
    assert want[0][1] > 0 and want[1][1] == 0  # doc 1 untouched

    got = eval_exposure(str(tmp_path)).to_pandas().set_index("eval_doc_id")
    assert len(got) == 10
    for e, (ns, cov, hits) in want.items():
        r = got.loc[e]
        assert (
            int(r.n_shingles), int(r.n_shingles_covered), int(r.n_docs_hit)
        ) == (ns, cov, hits), e


def test_rich_customer_activity_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import rich_customer_activity

    g = np.random.default_rng(322)
    n_cust, n_ord, n_nat = 80, 500, 4
    bal = g.uniform(-500, 5000, n_cust)
    natk = g.integers(0, n_nat, n_cust).astype(np.int64)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
                "c_name": pa.array([f"c{i}" for i in range(n_cust)]),
                "c_nationkey": pa.array(natk),
                "c_acctbal": pa.array(bal),
                "c_mktsegment": pa.array(["BUILDING"] * n_cust),
            }
        ),
        tmp_path / "customer.parquet",
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
    ocust = g.integers(0, n_cust, n_ord).astype(np.int64)
    price = g.uniform(10, 9000, n_ord)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
                "o_custkey": pa.array(ocust),
                "o_orderstatus": pa.array(["O"] * n_ord),
                "o_totalprice": pa.array(price),
                "o_orderdate": pa.array(
                    np.full(n_ord, 800000000000000), pa.int64()
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n_ord),
            }
        ),
        tmp_path / "orders.parquet",
    )

    fb = np.floor(bal).astype(np.int64)
    N, S = n_cust, int(fb.sum())
    rich = {i for i in range(n_cust) if fb[i] * N > S}
    assert 0 < len(rich) < n_cust
    want = {f"NAT{k}": [0, 0, 0, 0] for k in range(n_nat)}
    for i in rich:
        w = want[f"NAT{natk[i]}"]
        w[0] += 1
        w[1] += int(fb[i])
    for o in range(n_ord):
        c = int(ocust[o])
        if c in rich:
            w = want[f"NAT{natk[c]}"]
            w[2] += 1
            w[3] += int(math.floor(price[o]))

    got = rich_customer_activity(str(tmp_path)).to_pandas().set_index(
        "n_name"
    )
    assert len(got) == n_nat
    for nm, (nc, sb, no_, rev) in want.items():
        r = got.loc[nm]
        assert (
            int(r.n_customers), int(r.acctbal_floor),
            int(r.n_orders), int(r.revenue_floor),
        ) == (nc, sb, no_, rev), nm
