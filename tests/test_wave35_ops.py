"""Round-4 wave-35 operators: E91 same-type run board (the fixture
plants a long deliberate run; runs must break at USER boundaries), T82
doc↔embedding referential-integrity board (mismatches planted on both
sides), R22 order-value↔line-count Gram stats — each vs a scalar
brute-force reference."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MIN_US = 60_000_000


def test_type_runs_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import EVENTS_T0_US, events_type_runs

    g = np.random.default_rng(230)
    n = 1000
    types = np.array(["a", "b", "c"])[g.integers(0, 3, n)]
    users = (g.zipf(1.6, n) % 15).astype(np.int64)
    # plant: user 50 emits 7 consecutive 'b's; user 51 then starts with
    # 'b' too — the run must NOT bridge the user boundary
    types = np.concatenate([types, ["b"] * 7, ["b", "a"]])
    users = np.concatenate([users, [50] * 7, [51, 51]])
    m = len(users)
    ts = EVENTS_T0_US + np.arange(m, dtype=np.int64) * MIN_US
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(types.tolist()),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "value": pa.array(np.ones(m)),
                "event_id": pa.array(np.arange(m, dtype=np.int64)),
                "user_id": pa.array(users),
            }
        ),
        tmp_path / "events.parquet",
    )

    per_user = collections.defaultdict(list)
    for i, (t, u) in enumerate(zip(types, users)):
        per_user[int(u)].append((int(ts[i]), i, t))
    stats = collections.defaultdict(lambda: [0, 0, 0])  # n, longest, ge3
    for evs in per_user.values():
        evs.sort()
        run_t, run_len = None, 0
        for _s, _i, t in evs + [(None, None, None)]:
            if t == run_t:
                run_len += 1
                continue
            if run_t is not None:
                st = stats[run_t]
                st[0] += 1
                st[1] = max(st[1], run_len)
                st[2] += run_len >= 3
            run_t, run_len = t, 1
    assert stats["b"][1] >= 7

    got = events_type_runs(str(tmp_path)).to_pandas().set_index("source")
    assert len(got) == len(stats)
    for t, (nr, lg, g3) in stats.items():
        r = got.loc[t]
        assert (r.n_runs, r.longest_run, r.runs_ge3) == (nr, lg, g3), t


def test_embedding_join_audit_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import embedding_join_audit

    g = np.random.default_rng(231)
    # docs 0..99; embeddings 50..129 -> 50 matched, 50 doc-only, 30 emb-only
    doc_ids = np.arange(100, dtype=np.int64)
    vec_ids = np.arange(50, 130, dtype=np.int64)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(doc_ids),
                "text": pa.array(["w"] * len(doc_ids)),
                "lang": pa.array(["en"] * len(doc_ids)),
                "source": pa.array(["s0"] * len(doc_ids)),
                "n_chars": pa.array(np.ones(len(doc_ids), np.int64)),
            }
        ),
        tmp_path / "documents.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(vec_ids),
                "embedding": pa.array(
                    list(g.normal(size=(len(vec_ids), 4)).astype(np.float32)),
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(np.zeros(len(vec_ids), np.int32)),
            }
        ),
        tmp_path / "embeddings.parquet",
    )

    got = embedding_join_audit(str(tmp_path)).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r.n_matched, r.n_doc_only, r.n_emb_only) == (50, 50, 30)


def test_value_lines_gram_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import order_value_lines_gram

    g = np.random.default_rng(232)
    n_orders = 120
    okeys = np.arange(1, n_orders + 1, dtype=np.int64)
    totals = g.uniform(100, 90000, n_orders)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(okeys),
                "o_custkey": pa.array(np.zeros(n_orders, np.int64)),
                "o_orderstatus": pa.array(["O"] * n_orders),
                "o_totalprice": pa.array(totals),
                "o_orderdate": pa.array(
                    np.full(n_orders, 800000000000000), pa.int64()
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n_orders),
            }
        ),
        tmp_path / "orders.parquet",
    )
    # orders 1..100 get lines; 20 orders have none (excluded)
    lok = []
    for k in okeys[:100]:
        lok += [int(k)] * int(g.integers(1, 7))
    m = len(lok)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.array(lok, np.int64)),
                "l_partkey": pa.array(np.zeros(m, np.int64)),
                "l_suppkey": pa.array(np.zeros(m, np.int64)),
                "l_linenumber": pa.array(np.zeros(m, np.int32)),
                "l_quantity": pa.array(np.ones(m)),
                "l_extendedprice": pa.array(np.ones(m)),
                "l_discount": pa.array(np.zeros(m)),
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

    nl = collections.Counter(lok)
    n = sx = sy = sxy = sx2 = sy2 = 0
    for k, y in nl.items():
        x = int(math.floor(totals[k - 1]))
        n += 1
        sx += x
        sy += y
        sxy += x * y
        sx2 += x * x
        sy2 += y * y

    got = order_value_lines_gram(str(tmp_path)).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (
        r.n_orders, r.sum_x, r.sum_y, r.sum_xy, r.sum_x2, r.sum_y2,
    ) == (n, sx, sy, sxy, sx2, sy2)
    assert r.n_orders == 100  # line-less orders excluded
