"""Round-5 wave-145 operators: E192 session bounce board by entry type,
T198 within-doc vocabulary half-life quantiles, R125 customer
cadence-lumpiness bands — each vs a scalar brute-force reference on
planted fixtures."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000


def test_session_bounce_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_session_bounce

    g = np.random.default_rng(19)
    n = 4000
    ts = np.sort(g.integers(0, 25 * 24 * HOUR_US, n).astype(np.int64))
    uid = g.integers(1, 50, n).astype(np.int64)
    eid = np.arange(n, dtype=np.int64)
    types = np.array(["click", "view", "purchase"])
    ty = g.integers(0, 3, n)
    pq.write_table(
        pa.table({
            "event_id": pa.array(eid),
            "user_id": pa.array(uid),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(g.uniform(0, 100, n)),
            "event_type": pa.array(types[ty]),
        }),
        tmp_path / "events.parquet",
    )
    gap_us = 6 * HOUR_US

    per_user = collections.defaultdict(list)
    for e, u, t, k in zip(eid, uid, ts, ty):
        per_user[int(u)].append((int(t), int(e), int(k)))
    ns = collections.Counter()
    nb = collections.Counter()
    for rows in per_user.values():
        rows.sort()
        entry = None
        cnt = 0
        prev_t = None
        for t, e, k in rows:
            if prev_t is not None and t - prev_t > gap_us:
                ns[entry] += 1
                nb[entry] += 1 if cnt == 1 else 0
                entry, cnt = None, 0
            if entry is None:
                entry = k
            cnt += 1
            prev_t = t
        ns[entry] += 1
        nb[entry] += 1 if cnt == 1 else 0

    got = events_session_bounce(str(tmp_path)).to_pandas()
    got = got.set_index("entry_type")
    for k, name in enumerate(types):
        if ns[k] == 0:
            assert name not in got.index
            continue
        row = got.loc[name]
        assert int(row["n_sessions"]) == ns[k]
        assert int(row["n_bounce"]) == nb[k]
        assert int(row["bounce_permille"]) == 1000 * nb[k] // ns[k]


def test_vocab_halflife_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import vocab_halflife

    g = np.random.default_rng(23)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    rows = []
    for i in range(300):
        src = f"s{i % 2}"
        n_words = int(g.integers(1, 30))
        words = [vocab[int(g.integers(0, len(vocab)))] for _ in range(n_words)]
        rows.append({"doc_id": f"d-{i}", "text": " ".join(words),
                     "lang": "en", "source": src,
                     "n_chars": sum(map(len, words))})
    pq.write_table(pa.Table.from_pylist(rows), tmp_path / "documents.parquet")

    def qdisc(vals, q):
        vals = sorted(vals)
        n = len(vals)
        thr = (n * q + 999) // 1000  # ceil rank, == quantile_disc
        return vals[thr - 1]

    per_src = collections.defaultdict(list)
    for r in rows:
        words = r["text"].split(" ")
        first = {}
        for i, w in enumerate(words, start=1):
            first.setdefault(w, i)
        mp = qdisc(list(first.values()), 500)
        per_src[r["source"]].append(1000 * mp // len(words))

    got = vocab_halflife(str(tmp_path)).to_pandas().set_index("source")
    for src, pms in per_src.items():
        row = got.loc[src]
        assert int(row["n_docs"]) == len(pms)
        assert int(row["p50_permille"]) == qdisc(pms, 500)
        assert int(row["p90_permille"]) == qdisc(pms, 900)


def test_cadence_lumpiness_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import cadence_lumpiness

    g = np.random.default_rng(29)
    n_cust = 90
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE"]
    pq.write_table(
        pa.table({
            "c_custkey": pa.array(np.arange(1, n_cust + 1, dtype=np.int64)),
            "c_mktsegment": pa.array([segs[i % 3] for i in range(n_cust)]),
        }),
        tmp_path / "customer.parquet",
    )
    n_ord = 600
    ck = g.integers(1, n_cust + 1, n_ord).astype(np.int64)
    day = g.integers(0, 400, n_ord).astype(np.int64)
    pq.write_table(
        pa.table({
            "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
            "o_custkey": pa.array(ck),
            "o_orderdate": pa.array(day * DAY_US, pa.int64()).cast(
                pa.timestamp("us")
            ),
        }),
        tmp_path / "orders.parquet",
    )

    days = collections.defaultdict(set)
    n_orders = collections.Counter()
    for c, d in zip(ck, day):
        days[int(c)].add(int(d))
        n_orders[int(c)] += 1
    cells = collections.defaultdict(lambda: [0, 0])
    for c, ds_ in days.items():
        if len(ds_) < 2:
            continue
        sd = sorted(ds_)
        mx = max(b - a for a, b in zip(sd, sd[1:]))
        span = sd[-1] - sd[0]
        band = min(1000 * mx // span // 100, 10)
        seg = segs[(c - 1) % 3]
        cells[(seg, band)][0] += 1
        cells[(seg, band)][1] += n_orders[c]

    got = cadence_lumpiness(str(tmp_path)).to_pandas()
    assert len(got) == len(cells)
    for _, row in got.iterrows():
        nc, no = cells[(row["c_mktsegment"], int(row["band"]))]
        assert int(row["n_customers"]) == nc
        assert int(row["n_orders"]) == no
