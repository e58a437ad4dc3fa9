"""Round-4 wave-94 operators: E141 leaderboard rank-flip board (a
planted always-#1 source and a planted two-source seesaw pin the flip
counts), T148/F hourly bigram-novelty curve (planted sequences repeat
one bigram and introduce fresh ones in a later bucket), R75 supplier
type-diversity histogram (planted specialist / generalist suppliers and
a lineless supplier pin the d=0..nt rows) — each vs a scalar
brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY = 86_400_000_000
HOUR = 3_600_000_000


def test_events_rank_flips_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_rank_flips

    g = np.random.default_rng(781)
    base = np.datetime64("2026-06-01", "us").astype(np.int64)
    et, ts = [], []
    # "king": 50 events every day -> rank 1 always, zero flips
    for d in range(12):
        for i in range(50):
            et.append("king")
            ts.append(base + d * DAY + i * 1000)
    # seesaw: "ebb" and "flow" alternate 30/10 vs 10/30 by day parity
    for d in range(12):
        a, b = ("ebb", "flow") if d % 2 == 0 else ("flow", "ebb")
        for i in range(30):
            et.append(a)
            ts.append(base + d * DAY + HOUR + i * 1000)
        for i in range(10):
            et.append(b)
            ts.append(base + d * DAY + 2 * HOUR + i * 1000)
    # "noise": random presence, random volume
    for d in range(12):
        for i in range(int(g.integers(0, 25))):
            et.append("noise")
            ts.append(base + d * DAY + 3 * HOUR + i * 1000)
    n = len(et)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(et),
                "ts": pa.array(np.array(ts, np.int64)).cast(
                    pa.timestamp("us")
                ),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.zeros(n, np.int64)),
                "value": pa.array(np.zeros(n)),
            }
        ),
        tmp_path / "events.parquet",
    )

    srcs = sorted(set(et))
    days = sorted({t // DAY for t in ts})
    cnt = collections.Counter((t // DAY, s) for t, s in zip(ts, et))
    ranks = {}
    for d in days:
        order = sorted(srcs, key=lambda s: (-cnt.get((d, s), 0), s))
        for pos, s in enumerate(order, start=1):
            ranks[(d, s)] = pos
    got = (
        events_rank_flips(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    assert list(got.index) == srcs
    for s in srcs:
        seq = [ranks[(d, s)] for d in days]
        row = got.loc[s]
        assert row["n_days"] == len(days)
        assert row["best_rank"] == min(seq)
        assert row["worst_rank"] == max(seq)
        assert row["rank_sum"] == sum(seq)
        assert row["rank_changes"] == sum(
            1 for a, b in zip(seq, seq[1:]) if a != b
        )
    assert got.loc["king", "rank_changes"] == 0
    assert got.loc["king", "best_rank"] == 1 == got.loc["king", "worst_rank"]
    # the seesaw flips every day transition
    assert got.loc["ebb", "rank_changes"] == len(days) - 1
    assert got.loc["flow", "rank_changes"] == len(days) - 1


def test_f1_bigram_novelty_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import f1_bigram_novelty_1h

    # bucket 0: sequences over a tiny bigram set; bucket 2 repeats one
    # old sequence and adds genuinely new constructions
    rows = [
        ("s01-00000010", [1, 2, 3, 1, 2]),        # bigrams 1-2,2-3,3-1,1-2
        ("s01-00000020", [2, 3, 4]),              # 2-3 old-in-bucket, 3-4
        ("s02-00000030", [7]),                    # single token: no bigram
        ("s02-00007300", [1, 2, 9, 9]),           # bucket 2: 1-2 old, 2-9/9-9 new
        ("s01-00007400", [4, 5, 5, 4]),           # bucket 2: all new
    ]
    doc_id = pa.array([r[0] for r in rows])
    toks = pa.array([r[1] for r in rows], pa.list_(pa.int32()))
    pq.write_table(
        pa.table(
            {
                "doc_id": doc_id,
                "tokens": toks,
                "n_tok": pa.array(
                    [len(r[1]) for r in rows], pa.int32()
                ),
                "source": pa.array([r[0][:3] for r in rows]),
            }
        ),
        tmp_path / "part-00000.parquet",
    )

    first, per = {}, collections.defaultdict(set)
    for did, tk in rows:
        b = int(did.split("-")[1]) // 3600
        for a, c in zip(tk, tk[1:]):
            per[b].add((a, c))
            first.setdefault((a, c), b)
    got = (
        f1_bigram_novelty_1h(str(tmp_path))
        .to_pandas()
        .set_index("bucket_ts")
        .sort_index()
    )
    assert len(got) == len(per)
    t0 = np.datetime64("2026-01-01", "us")
    for b, pairs in per.items():
        row = got.loc[t0 + np.timedelta64(b * 3600, "s")]
        assert row["n_distinct_bigrams"] == len(pairs)
        assert row["n_new_bigrams"] == sum(
            1 for p in pairs if first[p] == b
        )
    # bucket 0 is all-new by definition (1-2, 2-3, 3-1, 3-4); bucket 2
    # has 6 distinct of which 5 are new (only 1-2 is a repeat)
    b0 = got.loc[t0]
    assert b0["n_distinct_bigrams"] == b0["n_new_bigrams"] == 4
    b2 = got.loc[t0 + np.timedelta64(2 * 3600, "s")]
    assert b2["n_distinct_bigrams"] == 6 and b2["n_new_bigrams"] == 5


def test_supplier_type_diversity_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import supplier_type_diversity

    g = np.random.default_rng(782)
    types = ["ANODIZED", "BRUSHED", "ECONOMY", "PROMO"]
    n_part = 40
    pt = [types[int(g.integers(0, 4))] for _ in range(n_part)]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(np.arange(1, n_part + 1)),
                "p_type": pa.array(pt),
            }
        ),
        tmp_path / "part.parquet",
    )
    # supplier 1: specialist (only parts of one type); supplier 2:
    # generalist (every type); supplier 9: zero lines; 3..6 random
    pq.write_table(
        pa.table({"s_suppkey": pa.array([1, 2, 3, 4, 5, 6, 9])}),
        tmp_path / "supplier.parquet",
    )
    anod = [i + 1 for i, t in enumerate(pt) if t == "ANODIZED"]
    lk, sk = [], []
    for p in anod[:3]:
        lk.append(p)
        sk.append(1)
    for t in types:
        p = next(i + 1 for i, x in enumerate(pt) if x == t)
        lk.append(p)
        sk.append(2)
    for _ in range(120):
        lk.append(int(g.integers(1, n_part + 1)))
        sk.append(int(g.integers(3, 7)))
    n = len(lk)
    ext = np.round(g.uniform(10, 5000, n), 2)
    dis = np.round(g.uniform(0, 0.1, n), 2)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "l_partkey": pa.array(np.array(lk, np.int64)),
                "l_suppkey": pa.array(np.array(sk, np.int64)),
                "l_linenumber": pa.array(np.ones(n, np.int32)),
                "l_quantity": pa.array(np.ones(n)),
                "l_extendedprice": pa.array(ext),
                "l_discount": pa.array(dis),
                "l_tax": pa.array(np.zeros(n)),
                "l_returnflag": pa.array(["N"] * n),
                "l_linestatus": pa.array(["O"] * n),
                "l_shipdate": pa.array(
                    np.full(n, np.datetime64("2026-01-01", "us"))
                ),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    per = collections.defaultdict(lambda: [set(), 0, 0])
    for p, s, e, d in zip(lk, sk, ext, dis):
        rec = per[s]
        rec[0].add(pt[p - 1])
        rec[1] += 1
        rec[2] += int(np.floor(e * (1.0 - d)))
    want = collections.defaultdict(lambda: [0, 0, 0])
    for s in [1, 2, 3, 4, 5, 6, 9]:
        dv = len(per[s][0]) if s in per else 0
        w = want[dv]
        w[0] += 1
        w[1] += per[s][1] if s in per else 0
        w[2] += per[s][2] if s in per else 0

    got = (
        supplier_type_diversity(str(tmp_path))
        .to_pandas()
        .set_index("n_types")
        .sort_index()
    )
    assert list(got.index) == list(range(5))  # dense 0..nt
    for d in range(5):
        w = want.get(d, [0, 0, 0])
        row = got.loc[d]
        assert row["n_suppliers"] == w[0]
        assert row["n_lines"] == w[1]
        assert row["revenue_floor"] == w[2]
    assert got.loc[0, "n_suppliers"] >= 1  # the lineless supplier
    assert got.loc[4, "n_suppliers"] >= 1  # the generalist
