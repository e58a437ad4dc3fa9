"""Round-5 wave-150 operators: E197 payload↔envelope coupling moments
(props JSON k vs floor(value)), T203 vocabulary self-introduction
quantiles, R130 order-weekday × ship-weekday matrix — each vs a scalar
brute-force reference on planted fixtures."""

from __future__ import annotations

import collections
import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000


def test_props_value_coupling_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_props_value_coupling

    g = np.random.default_rng(83)
    n = 3000
    types = np.array(["click", "view"])
    ty = g.integers(0, 2, n)
    kk = g.integers(-50, 200, n)
    value = g.uniform(0, 300, n)
    props = [
        json.dumps({"k": int(k)}) if i % 13 != 0 else "not json"
        for i, k in enumerate(kk)
    ]
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(g.integers(1, 50, n).astype(np.int64)),
            "ts": pa.array(
                np.sort(g.integers(0, 10 * 24 * HOUR_US, n).astype(np.int64)),
                pa.int64(),
            ).cast(pa.timestamp("us")),
            "value": pa.array(value),
            "event_type": pa.array(types[ty]),
            "props": pa.array(props),
        }),
        tmp_path / "events.parquet",
    )

    agg = collections.defaultdict(lambda: [0] * 7)
    for i in range(n):
        a = agg[types[ty[i]]]
        if i % 13 == 0:
            a[1] += 1
            continue
        k = int(kk[i])
        v = int(np.floor(value[i]))
        a[0] += 1
        a[2] += k
        a[3] += k * k
        a[4] += v
        a[5] += v * v
        a[6] += k * v

    got = events_props_value_coupling(str(tmp_path)).to_pandas().set_index(
        "source"
    )
    for src, a in agg.items():
        row = got.loc[src]
        for col, want in zip(
            ("n_parsed", "n_bad", "sum_k", "sum_k2", "sum_v", "sum_v2",
             "sum_kv"), a
        ):
            assert int(row[col]) == want, (src, col)


def test_self_intro_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import self_intro

    g = np.random.default_rng(89)
    vocab = [f"tok{i}" for i in range(40)]
    rows = []
    for i in range(300):
        src = f"s{i % 2}"
        n_words = int(g.integers(1, 18))
        words = [vocab[int(g.integers(0, len(vocab)))] for _ in range(n_words)]
        if i % 6 == 0:
            words.append(f"coin{i}")  # guaranteed self-introduction
        rows.append({"doc_id": i, "text": " ".join(words), "lang": "en",
                     "source": src, "n_chars": 0})
    pq.write_table(pa.Table.from_pylist(rows), tmp_path / "documents.parquet")

    first = {}
    for r in rows:
        for w in set(r["text"].split(" ")):
            if w not in first or r["doc_id"] < first[w]:
                first[w] = r["doc_id"]

    def qdisc(vals, q):
        vals = sorted(vals)
        thr = (len(vals) * q + 999) // 1000
        return vals[thr - 1]

    per_src = collections.defaultdict(list)
    for r in rows:
        types = set(r["text"].split(" "))
        nself = sum(1 for w in types if first[w] == r["doc_id"])
        per_src[r["source"]].append(1000 * nself // len(types))

    got = self_intro(str(tmp_path)).to_pandas().set_index("source")
    for src, pms in per_src.items():
        row = got.loc[src]
        assert int(row["n_docs"]) == len(pms)
        assert int(row["p50_permille"]) == qdisc(pms, 500)
        assert int(row["p90_permille"]) == qdisc(pms, 900)


def test_weekday_shift_matrix_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import weekday_shift_matrix

    g = np.random.default_rng(97)
    n_ord, n_li = 150, 600
    oday = g.integers(0, 400, n_ord).astype(np.int64)
    pq.write_table(
        pa.table({
            "o_orderkey": pa.array(np.arange(1, n_ord + 1, dtype=np.int64)),
            "o_orderdate": pa.array(oday * DAY_US, pa.int64()).cast(
                pa.timestamp("us")
            ),
        }),
        tmp_path / "orders.parquet",
    )
    lo = g.integers(1, n_ord + 1, n_li).astype(np.int64)
    lag = g.integers(0, 90, n_li).astype(np.int64)
    sday = oday[lo - 1] + lag
    pq.write_table(
        pa.table({
            "l_orderkey": pa.array(lo),
            "l_shipdate": pa.array(sday * DAY_US, pa.int64()).cast(
                pa.timestamp("us")
            ),
        }),
        tmp_path / "lineitem.parquet",
    )

    agg = collections.defaultdict(lambda: [0, 0])
    for o, s in zip(lo, sday):
        od = (int(oday[o - 1]) + 4) % 7
        sd = (int(s) + 4) % 7
        a = agg[(od, sd)]
        a[0] += 1
        a[1] += int(s) - int(oday[o - 1])

    got = weekday_shift_matrix(str(tmp_path)).to_pandas()
    assert len(got) == len(agg)
    for _, row in got.iterrows():
        n, sd_ = agg[(int(row["order_dow"]), int(row["ship_dow"]))]
        assert int(row["n_lines"]) == n
        assert int(row["sum_days"]) == sd_
