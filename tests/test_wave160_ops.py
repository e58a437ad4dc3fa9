"""Round-5 wave-160 operators: E207 acquisition-door retention, T213
chunk shingle-loss curve, R140 supplier latency-spread bands — each vs
a scalar brute-force reference on planted fixtures."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY_US = 86_400_000_000


def test_door_retention_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_door_retention

    g = np.random.default_rng(241)
    n = 4000
    ts = np.sort(g.integers(0, 90 * DAY_US, n).astype(np.int64))
    uid = g.integers(1, 80, n).astype(np.int64)
    eid = np.arange(n, dtype=np.int64)
    types = np.array(["ad", "organic", "push"])
    ty = g.integers(0, 3, n)
    pq.write_table(
        pa.table({
            "event_id": pa.array(eid),
            "user_id": pa.array(uid),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(g.uniform(0, 10, n)),
            "event_type": pa.array(types[ty]),
        }),
        tmp_path / "events.parquet",
    )

    per_user = collections.defaultdict(list)
    for e, u, t, k in zip(eid, uid, ts, ty):
        per_user[int(u)].append((int(t), int(e), int(k)))
    agg = collections.defaultdict(lambda: [0, 0])
    for rows in per_user.values():
        rows.sort()
        door = rows[0][2]
        agg[door][0] += 1
        if rows[-1][0] - rows[0][0] >= 28 * DAY_US:
            agg[door][1] += 1

    got = events_door_retention(str(tmp_path)).to_pandas().set_index(
        "door_type"
    )
    assert len(got) == len(agg)
    for k, (nu, nr) in agg.items():
        row = got.loc[types[k]]
        assert int(row["n_users"]) == nu
        assert int(row["n_retained"]) == nr
        assert int(row["retention_permille"]) == 1000 * nr // nu


def test_chunk_shingle_loss_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import chunk_shingle_loss

    g = np.random.default_rng(251)
    rows = []
    for i in range(200):
        n_words = int(g.integers(1, 400))
        rows.append({"doc_id": i,
                     "text": " ".join(f"w{j}" for j in range(n_words)),
                     "lang": "en", "source": "s0", "n_chars": 0})
    pq.write_table(pa.Table.from_pylist(rows), tmp_path / "documents.parquet")

    agg = {}
    for L in (32, 64, 128, 256):
        tot = sev = 0
        for r in rows:
            nw = len(r["text"].split(" "))
            for p in range(max(nw - 2, 0)):
                tot += 1
                if p // L != (p + 2) // L:
                    sev += 1
        agg[L] = (tot, sev)

    got = chunk_shingle_loss(str(tmp_path)).to_pandas().set_index(
        "chunk_len"
    )
    for L, (tot, sev) in agg.items():
        row = got.loc[L]
        assert int(row["n_shingles"]) == tot
        assert int(row["n_severed"]) == sev
        assert int(row["severed_permille"]) == 1000 * sev // max(tot, 1)


def test_supplier_spread_bands_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import supplier_spread_bands

    g = np.random.default_rng(257)
    n_ord, n_li = 150, 700
    oday = g.integers(0, 300, n_ord).astype(np.int64)
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
    sup = g.integers(1, 25, n_li).astype(np.int64)
    lag = g.integers(0, 100, n_li).astype(np.int64)
    sday = oday[lo - 1] + lag
    pq.write_table(
        pa.table({
            "l_orderkey": pa.array(lo),
            "l_suppkey": pa.array(sup),
            "l_shipdate": pa.array(sday * DAY_US, pa.int64()).cast(
                pa.timestamp("us")
            ),
        }),
        tmp_path / "lineitem.parquet",
    )

    per = collections.defaultdict(list)
    for o, s, d in zip(lo, sup, sday):
        per[int(s)].append(int(d) - int(oday[o - 1]))
    agg = collections.defaultdict(lambda: [0, 0])
    for lats in per.values():
        if len(lats) < 2:
            continue
        rng = max(lats) - min(lats)
        band = rng.bit_length() if rng > 0 else 0
        agg[band][0] += 1
        agg[band][1] += len(lats)

    got = supplier_spread_bands(str(tmp_path)).to_pandas().set_index(
        "spread_band"
    )
    assert len(got) == len(agg)
    for band, (ns, nl) in agg.items():
        row = got.loc[band]
        assert int(row["n_suppliers"]) == ns
        assert int(row["n_lines"]) == nl
