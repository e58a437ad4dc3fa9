"""Round-5 wave-146 operators: E193 session heat bands (intra-session
value trajectory), T199 modal-word spread quantiles, R126 entry-brand
loyalty (3-hop modal-brand persistence) — each vs a scalar brute-force
reference on planted fixtures."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000


def test_session_heat_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_session_heat

    g = np.random.default_rng(31)
    n = 4000
    ts = np.sort(g.integers(0, 20 * 24 * HOUR_US, n).astype(np.int64))
    uid = g.integers(1, 45, n).astype(np.int64)
    eid = np.arange(n, dtype=np.int64)
    value = g.uniform(0, 300, n)
    pq.write_table(
        pa.table({
            "event_id": pa.array(eid),
            "user_id": pa.array(uid),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(value),
            "event_type": pa.array(["click"] * n),
        }),
        tmp_path / "events.parquet",
    )
    gap_us = 6 * HOUR_US

    per_user = collections.defaultdict(list)
    for e, u, t, v in zip(eid, uid, ts, value):
        per_user[int(u)].append((int(t), int(e), int(np.floor(v))))
    ns = collections.Counter()
    ne = collections.Counter()

    def close(vals):
        n_ = len(vals)
        st = sum(vals)
        if n_ >= 2 and st > 0:
            sf = sum(vals[: n_ // 2])
            band = min(max(1000 * (st - sf) // st // 100, 0), 10)
            ns[band] += 1
            ne[band] += n_

    for rows in per_user.values():
        rows.sort()
        vals: list[int] = []
        prev_t = None
        for t, e, v in rows:
            if prev_t is not None and t - prev_t > gap_us:
                close(vals)
                vals = []
            vals.append(v)
            prev_t = t
        close(vals)

    got = events_session_heat(str(tmp_path)).to_pandas().set_index("band")
    assert sorted(got.index.tolist()) == sorted(ns)
    for band in ns:
        assert int(got.loc[band, "n_sessions"]) == ns[band]
        assert int(got.loc[band, "n_events"]) == ne[band]


def test_topword_spread_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import topword_spread

    g = np.random.default_rng(37)
    vocab = ["kappa", "iota", "mu", "nu", "xi", "omicron"]
    rows = []
    for i in range(300):
        src = f"s{i % 2}"
        n_words = int(g.integers(2, 25))
        words = [vocab[int(g.integers(0, len(vocab)))] for _ in range(n_words)]
        rows.append({"doc_id": f"d-{i}", "text": " ".join(words),
                     "lang": "en", "source": src,
                     "n_chars": sum(map(len, words))})
    pq.write_table(pa.Table.from_pylist(rows), tmp_path / "documents.parquet")

    def qdisc(vals, q):
        vals = sorted(vals)
        thr = (len(vals) * q + 999) // 1000
        return vals[thr - 1]

    per_src = collections.defaultdict(list)
    for r in rows:
        words = r["text"].split(" ")
        stats = {}
        for i, w in enumerate(words, start=1):
            if w not in stats:
                stats[w] = [0, i, i]
            stats[w][0] += 1
            stats[w][2] = i
        modal = min(stats, key=lambda w: (-stats[w][0], w))
        _, mn, mx = stats[modal]
        per_src[r["source"]].append(1000 * (mx - mn) // (len(words) - 1))

    got = topword_spread(str(tmp_path)).to_pandas().set_index("source")
    for src, pms in per_src.items():
        row = got.loc[src]
        assert int(row["n_docs"]) == len(pms)
        assert int(row["p50_permille"]) == qdisc(pms, 500)
        assert int(row["p90_permille"]) == qdisc(pms, 900)


def test_entry_brand_loyalty_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import entry_brand_loyalty

    g = np.random.default_rng(41)
    n_part, n_cust, n_ord = 40, 50, 160
    brands = [f"Brand#{11 + i}" for i in range(5)]
    segs = ["AUTOMOBILE", "BUILDING"]
    pb = g.integers(0, 5, n_part)
    pq.write_table(
        pa.table({
            "p_partkey": pa.array(np.arange(1, n_part + 1, dtype=np.int64)),
            "p_brand": pa.array([brands[i] for i in pb]),
        }),
        tmp_path / "part.parquet",
    )
    pq.write_table(
        pa.table({
            "c_custkey": pa.array(np.arange(1, n_cust + 1, dtype=np.int64)),
            "c_mktsegment": pa.array([segs[i % 2] for i in range(n_cust)]),
        }),
        tmp_path / "customer.parquet",
    )
    ck = g.integers(1, n_cust + 1, n_ord).astype(np.int64)
    day = g.integers(0, 300, n_ord).astype(np.int64)
    pq.write_table(
        pa.table({
            "o_orderkey": pa.array(np.arange(1, n_ord + 1, dtype=np.int64)),
            "o_custkey": pa.array(ck),
            "o_orderdate": pa.array(day * DAY_US, pa.int64()).cast(
                pa.timestamp("us")
            ),
        }),
        tmp_path / "orders.parquet",
    )
    n_li = 600
    lo = g.integers(1, n_ord + 1, n_li).astype(np.int64)
    lp = g.integers(1, n_part + 1, n_li).astype(np.int64)
    pq.write_table(
        pa.table({
            "l_orderkey": pa.array(lo),
            "l_partkey": pa.array(lp),
            "l_linenumber": pa.array(np.arange(n_li, dtype=np.int64)),
        }),
        tmp_path / "lineitem.parquet",
    )

    # brute force
    order_brands = collections.defaultdict(collections.Counter)
    for o, p in zip(lo, lp):
        order_brands[int(o)][brands[pb[p - 1]]] += 1
    modal = {
        o: min(c, key=lambda b: (-c[b], b)) for o, c in order_brands.items()
    }
    per_cust = collections.defaultdict(list)
    for i, (c, d) in enumerate(zip(ck, day), start=1):
        if i in modal:
            per_cust[int(c)].append((int(d), i, modal[i]))
    agg = collections.defaultdict(lambda: [0, 0])
    for c, orders_ in per_cust.items():
        if len(orders_) < 2:
            continue
        orders_.sort()
        seg = segs[(c - 1) % 2]
        agg[seg][0] += 1
        agg[seg][1] += 1 if orders_[0][2] == orders_[-1][2] else 0

    got = entry_brand_loyalty(str(tmp_path)).to_pandas().set_index(
        "c_mktsegment"
    )
    assert len(got) == len(agg)
    for seg, (nc, nl) in agg.items():
        row = got.loc[seg]
        assert int(row["n_customers"]) == nc
        assert int(row["n_loyal"]) == nl
        assert int(row["loyal_permille"]) == 1000 * nl // nc
