"""Round-4 wave-96 operators: E143 weekday/weekend audience split (a
planted weekday-only commuter crowd, weekend-only crowd, and a
both-regimes crowd pin the three columns), T150/F vocabulary-lifetime
spectrum (planted one-shot, full-span, and mid-span tokens pin the
histogram), R77 nation × segment customer matrix (planted orderless
customers pin the zero-volume cells) — each vs a scalar brute-force
reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY = 86_400_000_000
HOUR = 3_600_000_000


def _is_weekend(ts_us: int) -> bool:
    return (ts_us // DAY + 3) % 7 >= 5


def test_events_weekpart_audience_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_weekpart_audience

    g = np.random.default_rng(801)
    # 2026-06-01 is a Monday
    monday = np.datetime64("2026-06-01", "us").astype(np.int64)
    saturday = monday + 5 * DAY
    et, ts, uid = [], [], []
    # "office": users 1-10 weekdays only
    for u in range(1, 11):
        et.append("office")
        ts.append(monday + u * HOUR)
        uid.append(u)
    # "party": users 20-24 weekends only
    for u in range(20, 25):
        et.append("party")
        ts.append(saturday + u * HOUR // 4)
        uid.append(u)
    # "always": users 30-32 both regimes
    for u in range(30, 33):
        et.append("always")
        ts.append(monday + 2 * HOUR)
        uid.append(u)
        et.append("always")
        ts.append(saturday + 3 * HOUR)
        uid.append(u)
    # "mixed": random users, random days over 3 weeks
    for _ in range(300):
        et.append("mixed")
        ts.append(monday + int(g.integers(0, 21 * DAY)))
        uid.append(int(g.integers(0, 15)))
    n = len(et)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(et),
                "ts": pa.array(np.array(ts, np.int64)).cast(
                    pa.timestamp("us")
                ),
                "user_id": pa.array(np.array(uid, np.int64)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "value": pa.array(np.zeros(n)),
            }
        ),
        tmp_path / "events.parquet",
    )

    per = collections.defaultdict(lambda: collections.defaultdict(set))
    for s, t, u in zip(et, ts, uid):
        per[s][u].add(_is_weekend(t))
    got = (
        events_weekpart_audience(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    assert list(got.index) == sorted(per)
    for s, users in per.items():
        wd = sum(1 for v in users.values() if v == {False})
        we = sum(1 for v in users.values() if v == {True})
        both = sum(1 for v in users.values() if len(v) == 2)
        row = got.loc[s]
        assert row["n_weekday_only"] == wd
        assert row["n_weekend_only"] == we
        assert row["n_both"] == both
        assert row["both_permille"] == 1000 * both // (wd + we + both)
    assert got.loc["office", "n_weekday_only"] == 10
    assert got.loc["office", "n_both"] == 0
    assert got.loc["party", "n_weekend_only"] == 5
    assert got.loc["always", "n_both"] == 3


def test_f1_vocab_lifetime_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import f1_vocab_lifetime

    # buckets: seq//3600. Plant tokens with known spans:
    # tok 100: only bucket 0 (span 0, 3 occurrences)
    # tok 200: buckets 0 and 4 (span 4, 2+1 occurrences)
    # tok 300: buckets 1..2 (span 1)
    rows = [
        ("s01-00000010", [100, 100, 200]),
        ("s01-00000020", [100, 200]),
        ("s02-00003700", [300]),          # bucket 1
        ("s02-00007300", [300, 300]),     # bucket 2
        ("s01-00014500", [200]),          # bucket 4
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows]),
                "tokens": pa.array(
                    [r[1] for r in rows], pa.list_(pa.int32())
                ),
                "n_tok": pa.array([len(r[1]) for r in rows], pa.int32()),
                "source": pa.array([r[0][:3] for r in rows]),
            }
        ),
        tmp_path / "part-00000.parquet",
    )

    first, last, cnt = {}, {}, collections.Counter()
    for did, tk in rows:
        b = int(did.split("-")[1]) // 3600
        for t in tk:
            first[t] = min(first.get(t, b), b)
            last[t] = max(last.get(t, b), b)
            cnt[t] += 1
    want = collections.defaultdict(lambda: [0, 0])
    for t in first:
        w = want[last[t] - first[t]]
        w[0] += 1
        w[1] += cnt[t]

    got = (
        f1_vocab_lifetime(str(tmp_path))
        .to_pandas()
        .set_index("span_hours")
        .sort_index()
    )
    assert list(got.index) == sorted(want)
    for s, (ntok, occ) in want.items():
        assert got.loc[s, "n_tokens"] == ntok
        assert got.loc[s, "n_occurrences"] == occ
    assert got.loc[0, "n_tokens"] == 1       # tok 100
    assert got.loc[4, "n_occurrences"] == 3  # tok 200: one per row


def test_rel_nation_segment_matrix_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import nation_segment_matrix

    g = np.random.default_rng(802)
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0, 1, 2], pa.int32()),
                "n_name": pa.array(["ALGERIA", "BRAZIL", "CANADA"]),
                "n_regionkey": pa.array([0, 1, 1], pa.int32()),
            }
        ),
        tmp_path / "nation.parquet",
    )
    segs = ["AUTOMOBILE", "BUILDING"]
    nk = [int(g.integers(0, 3)) for _ in range(30)]
    sg = [segs[int(g.integers(0, 2))] for _ in range(30)]
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(np.arange(1, 31, dtype=np.int64)),
                "c_name": pa.array([f"c{i}" for i in range(30)]),
                "c_nationkey": pa.array(np.array(nk, np.int32)),
                "c_acctbal": pa.array(np.zeros(30)),
                "c_mktsegment": pa.array(sg),
            }
        ),
        tmp_path / "customer.parquet",
    )
    # customers 1-5 get no orders at all
    ck = [int(g.integers(6, 31)) for _ in range(120)]
    tp = np.round(g.uniform(100, 9000, 120), 2)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(120, dtype=np.int64)),
                "o_custkey": pa.array(np.array(ck, np.int64)),
                "o_orderstatus": pa.array(["O"] * 120),
                "o_totalprice": pa.array(tp),
                "o_orderdate": pa.array(
                    np.full(120, np.datetime64("2026-01-01", "us"))
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * 120),
            }
        ),
        tmp_path / "orders.parquet",
    )

    names = {0: "ALGERIA", 1: "BRAZIL", 2: "CANADA"}
    want = collections.defaultdict(lambda: [0, 0, 0])
    for i in range(30):
        want[(names[nk[i]], sg[i])][0] += 1
    for c, p in zip(ck, tp):
        w = want[(names[nk[c - 1]], sg[c - 1])]
        w[1] += 1
        w[2] += int(np.floor(p))

    got = (
        nation_segment_matrix(str(tmp_path))
        .to_pandas()
        .set_index(["n_name", "c_mktsegment"])
        .sort_index()
    )
    assert len(got) == len(want)
    for key, (ncust, nord, rev) in want.items():
        row = got.loc[key]
        assert row["n_customers"] == ncust
        assert row["n_orders"] == nord
        assert row["revenue_floor"] == rev
