"""Round-5 wave-144 operators: E191 session type-richness histogram,
T197 word-length maturity profile (within-source hapax by orthographic
band), R124 customer peak-order-share bands — each vs a scalar
brute-force reference on planted fixtures."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HOUR_US = 3_600_000_000


def test_session_richness_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_session_richness

    g = np.random.default_rng(11)
    n = 5000
    ts = np.sort(g.integers(0, 30 * 24 * HOUR_US, n).astype(np.int64))
    uid = g.integers(1, 60, n).astype(np.int64)
    eid = np.arange(n, dtype=np.int64)
    types = np.array(["click", "view", "purchase", "error"])
    ty = g.integers(0, 4, n)
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
    hist = collections.Counter()
    ev = collections.Counter()
    for rows in per_user.values():
        rows.sort()
        cur: set[int] = set()
        cnt = 0
        prev_t = None
        for t, e, k in rows:
            if prev_t is not None and t - prev_t > gap_us:
                hist[len(cur)] += 1
                ev[len(cur)] += cnt
                cur, cnt = set(), 0
            cur.add(k)
            cnt += 1
            prev_t = t
        hist[len(cur)] += 1
        ev[len(cur)] += cnt

    got = events_session_richness(str(tmp_path)).to_pandas()
    got = got.sort_values("n_types").reset_index(drop=True)
    assert got["n_types"].tolist() == sorted(hist)
    for _, row in got.iterrows():
        k = int(row["n_types"])
        assert int(row["n_sessions"]) == hist[k]
        assert int(row["n_events"]) == ev[k]


def test_wordlen_maturity_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import wordlen_maturity

    g = np.random.default_rng(13)
    vocab = ["a", "bb", "ccc", "bb", "dddd", "ee", "x", "yyyy", "zzz"]
    rows = []
    for i in range(400):
        src = f"s{i % 3}"
        n_words = int(g.integers(1, 12))
        words = [vocab[int(g.integers(0, len(vocab)))] for _ in range(n_words)]
        # salt in per-doc unique words so hapax mass exists
        if i % 7 == 0:
            words.append(f"uniq{i}token")
        rows.append({"doc_id": f"d-{i}", "text": " ".join(words),
                     "lang": "en", "source": src,
                     "n_chars": sum(map(len, words))})
    pq.write_table(pa.Table.from_pylist(rows), tmp_path / "documents.parquet")

    freq = collections.Counter()
    for r in rows:
        for w in r["text"].split(" "):
            freq[(r["source"], w)] += 1
    cells = collections.defaultdict(lambda: [0, 0, 0])
    for (src, w), n in freq.items():
        c = cells[(src, len(w))]
        c[0] += n
        c[1] += 1
        c[2] += 1 if n == 1 else 0

    got = wordlen_maturity(str(tmp_path)).to_pandas()
    assert len(got) == len(cells)
    for _, row in got.iterrows():
        occ, types, hapax = cells[(row["source"], int(row["wlen"]))]
        assert int(row["n_occurrences"]) == occ
        assert int(row["n_types"]) == types
        assert int(row["n_hapax"]) == hapax


def test_customer_peak_share_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import customer_peak_share

    g = np.random.default_rng(17)
    n_cust = 120
    segs = ["AUTOMOBILE", "BUILDING", "MACHINERY"]
    cust = pa.table({
        "c_custkey": pa.array(np.arange(1, n_cust + 1, dtype=np.int64)),
        "c_mktsegment": pa.array([segs[i % 3] for i in range(n_cust)]),
    })
    pq.write_table(cust, tmp_path / "customer.parquet")
    n_ord = 700
    ck = g.integers(1, n_cust + 1, n_ord).astype(np.int64)
    price = g.uniform(10.0, 9000.0, n_ord)
    pq.write_table(
        pa.table({
            "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
            "o_custkey": pa.array(ck),
            "o_totalprice": pa.array(price),
        }),
        tmp_path / "orders.parquet",
    )

    wallet = collections.defaultdict(lambda: [0, 0, 0])  # mx, s, n
    for c, p in zip(ck, price):
        rv = int(np.floor(p))
        w = wallet[int(c)]
        w[0] = max(w[0], rv)
        w[1] += rv
        w[2] += 1
    cells = collections.defaultdict(lambda: [0, 0])
    for c, (mx, s, n) in wallet.items():
        band = min(1000 * mx // max(s, 1) // 100, 10)
        seg = segs[(c - 1) % 3]
        cells[(seg, band)][0] += 1
        cells[(seg, band)][1] += n

    got = customer_peak_share(str(tmp_path)).to_pandas()
    assert len(got) == len(cells)
    for _, row in got.iterrows():
        nc, no = cells[(row["c_mktsegment"], int(row["band"]))]
        assert int(row["n_customers"]) == nc
        assert int(row["n_orders"]) == no
