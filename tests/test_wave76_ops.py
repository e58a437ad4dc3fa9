"""Round-4 wave-76 operators: E123 inter-arrival by user-activity band
(planted single-event, regular-bot and sparse-human users pin the band
assignment and gap quantiles), T130 stopword position-thirds (planted
header/footer stopword placement pins the thirds), R57 intra-order
shipment spread (planted tight vs straggling orders pin the day
quantiles; single-line orders excluded) — each vs a scalar brute-force
reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_band_interarrival_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_band_interarrival

    g = np.random.default_rng(610)
    base = np.datetime64("2026-03-01", "us").astype(np.int64)
    uid, ts = [], []
    # band 0: three single-event users (no gaps)
    for u in (1, 2, 3):
        uid.append(u)
        ts.append(base + u * 999)
    # band 5: a bot with 32 events exactly 2s apart
    for j in range(32):
        uid.append(50)
        ts.append(base + j * 2_000_000)
    # band 2: humans with 4-7 events, random gaps
    for u in range(100, 110):
        n = int(g.integers(4, 8))
        t = base + int(g.integers(0, 10**9))
        for _ in range(n):
            uid.append(u)
            ts.append(t)
            t += int(g.integers(1_000_000, 400_000_000))
    n = len(uid)
    order = g.permutation(n)
    uid = np.array(uid, np.int64)[order]
    ts = np.array(ts, np.int64)[order]
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(["e"] * n),
                "ts": pa.array(ts).cast(pa.timestamp("us")),
                "value": pa.array(np.ones(n)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(uid),
            }
        ),
        tmp_path / "events.parquet",
    )

    per = collections.defaultdict(list)
    for u, t in zip(uid, ts):
        per[u].append(t)
    users_by_band = collections.Counter()
    gaps_by_band = collections.defaultdict(list)
    for u, tv in per.items():
        band = int(len(tv)).bit_length() - 1
        users_by_band[band] += 1
        tv = sorted(tv)
        for a, b in zip(tv[:-1], tv[1:]):
            gaps_by_band[band].append((b - a) // 1_000_000)
    got = events_band_interarrival(str(tmp_path)).to_pandas()
    got = got.set_index("band").sort_index()
    assert list(got.index) == sorted(users_by_band)
    for b in users_by_band:
        row = got.loc[b]
        gv = sorted(gaps_by_band[b])
        assert row["n_users"] == users_by_band[b]
        assert row["n_gaps"] == len(gv)
        if gv:
            for col, q in (("p50_s", 500), ("p90_s", 900)):
                thr = (len(gv) * q + 999) // 1000
                assert row[col] == gv[thr - 1]
        else:
            assert row["p50_s"] == 0 and row["p90_s"] == 0
    assert got.loc[5, "p50_s"] == 2
    assert got.loc[0, "n_gaps"] == 0


def test_doc_stopword_thirds_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import stopword_thirds

    STOP = {"the", "a", "of", "and", "to", "in", "is"}
    g = np.random.default_rng(611)
    vocab = ["alpha", "beta", "gamma", "the", "of", "a", "delta"]
    texts, srcs = [], []
    # planted: footer-stopword doc (all stopwords in last third)
    texts.append("alpha beta gamma delta beta gamma the of a")
    srcs.append("footer")
    # planted: header-stopword doc
    texts.append("the of a alpha beta gamma delta beta gamma")
    srcs.append("header")
    for i in range(150):
        texts.append(" ".join(g.choice(vocab, int(g.integers(3, 25)))))
        srcs.append("footer" if i % 2 else "header")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(srcs),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    want = collections.defaultdict(lambda: [0, 0, 0, 0])
    for t, s in zip(texts, srcs):
        ws = t.split(" ")
        nw = len(ws)
        want[s][0] += nw
        for i, w in enumerate(ws):
            if w.lower() in STOP:
                want[s][1 + 3 * i // nw] += 1
    got = stopword_thirds(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(set(srcs))
    for s, (nt, f, m, l) in want.items():
        row = got.loc[s]
        assert row["n_tokens"] == nt
        assert row["stop_first"] == f
        assert row["stop_mid"] == m
        assert row["stop_last"] == l


def test_rel_shipment_spread_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import shipment_spread

    g = np.random.default_rng(612)
    DAY = 86_400_000_000
    base = np.datetime64("2025-01-01", "us").astype(np.int64)
    n_orders = 150
    prio = ["1-URGENT" if i % 2 else "5-LOW" for i in range(n_orders)]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(
                    np.arange(1, n_orders + 1, dtype=np.int64)
                ),
                "o_custkey": pa.array(np.ones(n_orders, np.int64)),
                "o_orderstatus": pa.array(["O"] * n_orders),
                "o_totalprice": pa.array(np.ones(n_orders)),
                "o_orderdate": pa.array(
                    np.full(n_orders, base, np.int64)
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(prio),
            }
        ),
        tmp_path / "orders.parquet",
    )
    lk, sd = [], []
    spreads = collections.defaultdict(list)
    for k in range(1, n_orders + 1):
        nl = 1 if k % 7 == 0 else 1 + int(g.integers(1, 4))
        days = sorted(int(g.integers(0, 60)) for _ in range(nl))
        for d in days:
            lk.append(k)
            sd.append(base + d * DAY + int(g.integers(0, DAY)))
        if nl >= 2:
            lo = min(s // DAY for s in sd[-nl:])
            hi = max(s // DAY for s in sd[-nl:])
            spreads[prio[k - 1]].append(hi - lo)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.array(lk, np.int64)),
                "l_partkey": pa.array(np.ones(len(lk), np.int64)),
                "l_suppkey": pa.array(np.ones(len(lk), np.int64)),
                "l_shipdate": pa.array(np.array(sd, np.int64)).cast(
                    pa.timestamp("us")
                ),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    got = shipment_spread(str(tmp_path)).to_pandas()
    got = got.set_index("priority").sort_index()
    assert list(got.index) == sorted(spreads)
    for p, sv in spreads.items():
        sv = sorted(sv)
        row = got.loc[p]
        assert row["n_orders"] == len(sv)
        assert row["max_days"] == sv[-1]
        for col, q in (("p50_days", 500), ("p90_days", 900)):
            thr = (len(sv) * q + 999) // 1000
            assert row[col] == sv[thr - 1]
