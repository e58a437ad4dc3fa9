"""Round-5 wave-158 operators: E205 weekday ANOVA stats, T211 document ↔
embedding coverage audit, R138 tenure-span ↔ spend coupling — each vs a
scalar brute-force reference on planted fixtures."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY_US = 86_400_000_000


def test_dow_anova_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_dow_anova

    g = np.random.default_rng(211)
    n = 4000
    ts = g.integers(0, 100 * DAY_US, n).astype(np.int64)
    types = np.array(["click", "view"])
    ty = g.integers(0, 2, n)
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(g.integers(1, 50, n).astype(np.int64)),
            "ts": pa.array(np.sort(ts), pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(g.uniform(0, 10, n)),
            "event_type": pa.array(types[ty]),
        }),
        tmp_path / "events.parquet",
    )

    daily = collections.Counter()
    for t, k in zip(np.sort(ts), ty):
        daily[(int(k), int(t) // DAY_US)] += 1
    agg = collections.defaultdict(lambda: [0, 0, 0])
    for (k, d), c in daily.items():
        a = agg[(k, (d + 4) % 7)]
        a[0] += 1
        a[1] += c
        a[2] += c * c

    got = events_dow_anova(str(tmp_path)).to_pandas()
    assert len(got) == len(agg)
    for _, row in got.iterrows():
        k = int(np.where(types == row["source"])[0][0])
        nd, s, s2 = agg[(k, int(row["dow"]))]
        assert int(row["n_days"]) == nd
        assert int(row["sum_events"]) == s
        assert int(row["sum_events2"]) == s2


def test_embedding_coverage_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import embedding_coverage

    g = np.random.default_rng(223)
    rows = [{"doc_id": i, "text": "a b", "lang": "en",
             "source": f"s{i % 3}", "n_chars": 3} for i in range(200)]
    pq.write_table(pa.Table.from_pylist(rows), tmp_path / "documents.parquet")
    # vectors cover even doc_ids plus 30 orphans above the doc range
    vec_ids = np.concatenate([
        np.arange(0, 200, 2, dtype=np.int64),
        np.arange(500, 530, dtype=np.int64),
    ])
    d = 4
    pq.write_table(
        pa.table({
            "vec_id": pa.array(vec_ids),
            "embedding": pa.array(
                list(g.normal(0, 1, (len(vec_ids), d)).astype(np.float32)),
                pa.list_(pa.float32()),
            ),
            "label": pa.array(np.zeros(len(vec_ids), np.int32), pa.int32()),
        }),
        tmp_path / "embeddings.parquet",
    )

    got = embedding_coverage(str(tmp_path)).to_pandas().set_index("source")
    for s in range(3):
        nd = len([r for r in rows if r["source"] == f"s{s}"])
        nc = len([r for r in rows
                  if r["source"] == f"s{s}" and r["doc_id"] % 2 == 0])
        row = got.loc[f"s{s}"]
        assert int(row["n_docs"]) == nd
        assert int(row["n_covered"]) == nc
        assert int(row["coverage_permille"]) == 1000 * nc // nd
    orow = got.loc["__orphans__"]
    assert int(orow["n_docs"]) == 0
    assert int(orow["n_covered"]) == 30


def test_span_spend_coupling_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import span_spend_coupling

    g = np.random.default_rng(227)
    n_cust, n_ord = 80, 500
    segs = ["AUTOMOBILE", "HOUSEHOLD"]
    pq.write_table(
        pa.table({
            "c_custkey": pa.array(np.arange(1, n_cust + 1, dtype=np.int64)),
            "c_mktsegment": pa.array([segs[i % 2] for i in range(n_cust)]),
        }),
        tmp_path / "customer.parquet",
    )
    ck = g.integers(1, n_cust + 1, n_ord).astype(np.int64)
    day = g.integers(0, 600, n_ord).astype(np.int64)
    price = g.uniform(50.0, 5000.0, n_ord)
    pq.write_table(
        pa.table({
            "o_custkey": pa.array(ck),
            "o_orderdate": pa.array(day * DAY_US, pa.int64()).cast(
                pa.timestamp("us")
            ),
            "o_totalprice": pa.array(price),
        }),
        tmp_path / "orders.parquet",
    )

    per = collections.defaultdict(lambda: [None, None, 0, 0])
    for c, d, p in zip(ck, day, price):
        a = per[int(c)]
        a[0] = int(d) if a[0] is None else min(a[0], int(d))
        a[1] = int(d) if a[1] is None else max(a[1], int(d))
        a[2] += int(np.floor(p))
        a[3] += 1
    agg = collections.defaultdict(lambda: [0] * 6)
    for c, (mn, mx, y, n) in per.items():
        if n < 2:
            continue
        x = mx - mn
        a = agg[segs[(c - 1) % 2]]
        a[0] += 1
        a[1] += x
        a[2] += x * x
        a[3] += y
        a[4] += y * y
        a[5] += x * y

    got = span_spend_coupling(str(tmp_path)).to_pandas().set_index(
        "c_mktsegment"
    )
    for s, a in agg.items():
        row = got.loc[s]
        for col, want in zip(
            ("n_customers", "sum_span", "sum_span2", "sum_value",
             "sum_value2", "sum_span_value"), a
        ):
            assert int(row[col]) == want, (s, col)
