"""Round-5 wave-152 operators: E199 onboarding-share bands, T205
dedup × sharding audit, R132 returns by line position — each vs a
scalar brute-force reference on planted fixtures."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HOUR_US = 3_600_000_000


def test_onboarding_share_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_onboarding_share

    g = np.random.default_rng(109)
    n = 4000
    # mix: some users burst within an hour, others spread over weeks
    ts = g.integers(0, 20 * 24 * HOUR_US, n).astype(np.int64)
    burst_users = g.integers(1, 30, n // 4)
    ts[: n // 4] = g.integers(0, HOUR_US // 2, n // 4)
    uid = np.concatenate([burst_users,
                          g.integers(30, 80, n - n // 4)]).astype(np.int64)
    order = np.argsort(ts, kind="stable")
    ts, uid = ts[order], uid[order]
    eid = np.arange(n, dtype=np.int64)
    pq.write_table(
        pa.table({
            "event_id": pa.array(eid),
            "user_id": pa.array(uid),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(g.uniform(0, 100, n)),
            "event_type": pa.array(["click"] * n),
        }),
        tmp_path / "events.parquet",
    )

    per_user = collections.defaultdict(list)
    for e, u, t in zip(eid, uid, ts):
        per_user[int(u)].append((int(t), int(e)))
    nu = collections.Counter()
    ne = collections.Counter()
    for rows in per_user.values():
        if len(rows) < 2:
            continue
        rows.sort()
        ft = rows[0][0]
        nf = sum(1 for t, _ in rows if t <= ft + HOUR_US)
        band = min(1000 * nf // len(rows) // 100, 10)
        nu[band] += 1
        ne[band] += len(rows)

    got = events_onboarding_share(str(tmp_path)).to_pandas().set_index(
        "band"
    )
    assert sorted(got.index.tolist()) == sorted(nu)
    for band in nu:
        assert int(got.loc[band, "n_users"]) == nu[band]
        assert int(got.loc[band, "n_events"]) == ne[band]


def test_dedup_shard_audit_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import dedup_shard_audit

    g = np.random.default_rng(113)
    rows = []
    texts = [f"unique doc body {i}" for i in range(200)]
    # planted duplicate groups: some within one shard, some across
    for i in range(200):
        rows.append({"doc_id": i, "text": texts[i], "lang": "en",
                     "source": "s0", "n_chars": 0})
    # group A: doc_ids 200, 216 (both % 16 == 8) -> single shard
    rows.append({"doc_id": 200 + 8, "text": "dup group A", "lang": "en",
                 "source": "s0", "n_chars": 0})
    rows.append({"doc_id": 216 + 8, "text": "dup group A", "lang": "en",
                 "source": "s0", "n_chars": 0})
    # group B: doc_ids 300, 301 -> shards 12, 13 -> cross
    rows.append({"doc_id": 300, "text": "dup group B", "lang": "en",
                 "source": "s0", "n_chars": 0})
    rows.append({"doc_id": 301, "text": "dup group B", "lang": "en",
                 "source": "s0", "n_chars": 0})
    rows.append({"doc_id": 302, "text": "dup group B", "lang": "en",
                 "source": "s0", "n_chars": 0})
    pq.write_table(pa.Table.from_pylist(rows), tmp_path / "documents.parquet")

    got = dedup_shard_audit(str(tmp_path)).to_pandas().iloc[0]
    assert int(got["n_groups"]) == 2
    assert int(got["n_dup_docs"]) == 5
    assert int(got["n_single_shard"]) == 1
    assert int(got["n_cross_shard"]) == 1
    assert int(got["cross_permille"]) == 500


def test_return_by_position_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import return_by_position

    g = np.random.default_rng(127)
    n_li = 800
    ln = g.integers(1, 8, n_li).astype(np.int64)
    flag = np.where(g.uniform(0, 1, n_li) < 0.25, "R", "N")
    ep = g.uniform(100.0, 4000.0, n_li)
    dc = g.integers(0, 11, n_li) / 100.0
    pq.write_table(
        pa.table({
            "l_linenumber": pa.array(ln),
            "l_returnflag": pa.array(flag.tolist()),
            "l_extendedprice": pa.array(ep),
            "l_discount": pa.array(dc),
        }),
        tmp_path / "lineitem.parquet",
    )

    agg = collections.defaultdict(lambda: [0, 0, 0])
    for p, f, e, d in zip(ln, flag, ep, dc):
        a = agg[int(p)]
        a[0] += 1
        if f == "R":
            a[1] += 1
            a[2] += int(np.floor(e * (1.0 - d)))

    got = return_by_position(str(tmp_path)).to_pandas().set_index(
        "l_linenumber"
    )
    assert len(got) == len(agg)
    for p, (n, nr, rrev) in agg.items():
        row = got.loc[p]
        assert int(row["n_lines"]) == n
        assert int(row["n_returned"]) == nr
        assert int(row["returned_revenue"]) == rrev
        assert int(row["returned_permille"]) == 1000 * nr // n
