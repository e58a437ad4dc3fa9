"""Round-5 wave-157 operators: E204 session endpoint matrix, T210
packing-seam audit, R137 month-end loading trend — each vs a scalar
brute-force reference on planted fixtures."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000


def test_session_endpoints_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_session_endpoints

    g = np.random.default_rng(193)
    n = 4000
    ts = np.sort(g.integers(0, 25 * 24 * HOUR_US, n).astype(np.int64))
    uid = g.integers(1, 45, n).astype(np.int64)
    eid = np.arange(n, dtype=np.int64)
    types = np.array(["click", "view", "purchase"])
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
    gap_us = 6 * HOUR_US

    per_user = collections.defaultdict(list)
    for e, u, t, k in zip(eid, uid, ts, ty):
        per_user[int(u)].append((int(t), int(e), int(k)))
    agg = collections.defaultdict(lambda: [0, 0])
    for rows in per_user.values():
        rows.sort()
        cur = [rows[0]]
        sessions = []
        for prev, nxt in zip(rows, rows[1:]):
            if nxt[0] - prev[0] > gap_us:
                sessions.append(cur)
                cur = []
            cur.append(nxt)
        sessions.append(cur)
        for sess in sessions:
            a = agg[(sess[0][2], sess[-1][2])]
            a[0] += 1
            a[1] += len(sess)

    got = events_session_endpoints(str(tmp_path)).to_pandas()
    assert len(got) == len(agg)
    for _, row in got.iterrows():
        key = (
            int(np.where(types == row["entry_type"])[0][0]),
            int(np.where(types == row["exit_type"])[0][0]),
        )
        assert int(row["n_sessions"]) == agg[key][0]
        assert int(row["n_events"]) == agg[key][1]


def test_seam_audit_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import seam_audit

    g = np.random.default_rng(197)
    vocab = ["end", "start", "mid", "x", "y"]
    rows = []
    for i in range(300):
        n_words = int(g.integers(1, 10))
        words = [vocab[int(g.integers(0, 5))] for _ in range(n_words)]
        rows.append({"doc_id": i, "text": " ".join(words), "lang": "en",
                     "source": f"s{i % 2}", "n_chars": 0})
    pq.write_table(pa.Table.from_pylist(rows), tmp_path / "documents.parquet")

    by_id = {r["doc_id"]: r["text"].split(" ") for r in rows}
    seams = []
    for i in sorted(by_id):
        if i + 1 in by_id:
            seams.append((by_id[i][-1], by_id[i + 1][0]))
    n_st = sum(1 for l, r in seams if l == r)

    got = seam_audit(str(tmp_path)).to_pandas().iloc[0]
    assert int(got["n_seams"]) == len(seams)
    assert int(got["n_stutter"]) == n_st
    assert int(got["stutter_permille"]) == 1000 * n_st // max(len(seams), 1)
    assert int(got["n_distinct_bigrams"]) == len(set(seams))


def test_month_end_loading_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import month_end_loading

    g = np.random.default_rng(199)
    n_ord = 500
    day = g.integers(9000, 12000, n_ord).astype(np.int64)
    price = g.uniform(100.0, 9000.0, n_ord)
    pq.write_table(
        pa.table({
            "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
            "o_orderdate": pa.array(day * DAY_US, pa.int64()).cast(
                pa.timestamp("us")
            ),
            "o_totalprice": pa.array(price),
        }),
        tmp_path / "orders.parquet",
    )

    agg = collections.defaultdict(lambda: [0, 0, 0, 0])
    for d, p in zip(day, price):
        dd = np.datetime64(int(d), "D")
        m = dd.astype("datetime64[M]")
        last = (m + 1).astype("datetime64[D]") - 1
        is_end = dd >= last - 2
        yr = int(dd.astype("datetime64[Y]").astype(int)) + 1970
        rv = int(np.floor(p))
        a = agg[yr]
        a[0] += 1
        a[2] += rv
        if is_end:
            a[1] += 1
            a[3] += rv

    got = month_end_loading(str(tmp_path)).to_pandas().set_index(
        "order_year"
    )
    assert len(got) == len(agg)
    for yr, (n, ne, v, ve) in agg.items():
        row = got.loc[yr]
        assert int(row["n_orders"]) == n
        assert int(row["n_month_end"]) == ne
        assert int(row["revenue_floor"]) == v
        assert int(row["month_end_revenue"]) == ve
        assert int(row["month_end_permille"]) == 1000 * ne // n
