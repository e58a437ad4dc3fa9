"""Round-5 wave-149 operators: E196 account heat bands (lifetime value
mass balance), T202 shard-balance board (doc_id % n_shards skew
preflight), R129 part-size × lot-size coupling moments — each vs a
scalar brute-force reference on planted fixtures."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HOUR_US = 3_600_000_000


def test_user_heat_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_user_heat

    g = np.random.default_rng(71)
    n = 4000
    ts = np.sort(g.integers(0, 20 * 24 * HOUR_US, n).astype(np.int64))
    uid = g.integers(1, 60, n).astype(np.int64)
    eid = np.arange(n, dtype=np.int64)
    value = g.uniform(0, 200, n)
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

    per_user = collections.defaultdict(list)
    for e, u, t, v in zip(eid, uid, ts, value):
        per_user[int(u)].append((int(t), int(e), int(np.floor(v))))
    nu = collections.Counter()
    ne = collections.Counter()
    for rows in per_user.values():
        if len(rows) < 2:
            continue
        rows.sort()
        vals = [v for _, _, v in rows]
        st = sum(vals)
        if st <= 0:
            continue
        sf = sum(vals[: len(vals) // 2])
        band = min(max(1000 * (st - sf) // st // 100, 0), 10)
        nu[band] += 1
        ne[band] += len(vals)

    got = events_user_heat(str(tmp_path)).to_pandas().set_index("band")
    assert sorted(got.index.tolist()) == sorted(nu)
    for band in nu:
        assert int(got.loc[band, "n_users"]) == nu[band]
        assert int(got.loc[band, "n_events"]) == ne[band]


def test_shard_balance_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import shard_balance

    g = np.random.default_rng(73)
    rows = []
    for i in range(500):
        n_words = int(g.integers(1, 20))
        words = [f"w{int(g.integers(0, 30))}" for _ in range(n_words)]
        text = " ".join(words)
        rows.append({"doc_id": i, "text": text, "lang": "en",
                     "source": f"s{i % 3}", "n_chars": len(text)})
    pq.write_table(pa.Table.from_pylist(rows), tmp_path / "documents.parquet")

    agg = collections.defaultdict(lambda: [0, 0, 0])
    for r in rows:
        a = agg[r["doc_id"] % 16]
        a[0] += 1
        a[1] += len(r["text"].split(" "))
        a[2] += r["n_chars"]

    got = shard_balance(str(tmp_path)).to_pandas().set_index("shard")
    assert len(got) == len(agg)
    for shard, (nd, nt, nc) in agg.items():
        row = got.loc[shard]
        assert int(row["n_docs"]) == nd
        assert int(row["n_tokens"]) == nt
        assert int(row["n_chars"]) == nc


def test_size_quantity_coupling_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import size_quantity_coupling

    g = np.random.default_rng(79)
    n_part, n_li = 50, 700
    size = g.integers(1, 11, n_part)
    pq.write_table(
        pa.table({
            "p_partkey": pa.array(np.arange(1, n_part + 1, dtype=np.int64)),
            "p_size": pa.array(size.astype(np.int64)),
        }),
        tmp_path / "part.parquet",
    )
    lp = g.integers(1, n_part + 1, n_li).astype(np.int64)
    qty = g.uniform(1.0, 50.0, n_li)
    pq.write_table(
        pa.table({
            "l_partkey": pa.array(lp),
            "l_quantity": pa.array(qty),
        }),
        tmp_path / "lineitem.parquet",
    )

    agg = collections.defaultdict(lambda: [set(), 0, 0, 0])
    for p, q in zip(lp, qty):
        qf = int(np.floor(q))
        a = agg[int(size[p - 1])]
        a[0].add(int(p))
        a[1] += 1
        a[2] += qf
        a[3] += qf * qf

    got = size_quantity_coupling(str(tmp_path)).to_pandas().set_index(
        "p_size"
    )
    assert len(got) == len(agg)
    for sz, (parts, n, sq, sq2) in agg.items():
        row = got.loc[sz]
        assert int(row["n_parts"]) == len(parts)
        assert int(row["n_lines"]) == n
        assert int(row["sum_qty"]) == sq
        assert int(row["sum_qty2"]) == sq2
