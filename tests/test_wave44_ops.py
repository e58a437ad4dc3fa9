"""Round-4 wave-44 operators: E98 active-day streak histogram (the
fixture plants known runs and a cross-partition user), T91 token-weighted
exact-dup mass (planted dup groups with unequal token counts), R30
Q17-shape small-quantity revenue — each vs a scalar brute-force
reference."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY_US = 86_400_000_000


def test_user_streak_hist_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import EVENTS_T0_US, events_user_streak_hist

    g = np.random.default_rng(310)
    rows = []
    # 40 users with random active-day sets over a 30-day span; several
    # events per active day so the distinct-pair dedupe is exercised
    for u in range(40):
        days = np.flatnonzero(g.random(30) < 0.4)
        for d in days:
            for _ in range(int(g.integers(1, 4))):
                rows.append((u, int(d)))
    # plant a known shape: user 100 has runs of 5, 1, 2
    for d in [0, 1, 2, 3, 4, 10, 20, 21]:
        rows.append((100, d))
    n = len(rows)
    uid = np.array([r[0] for r in rows], np.int64)
    day = np.array([r[1] for r in rows], np.int64)
    ts = EVENTS_T0_US + day * DAY_US + g.integers(0, DAY_US, n)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(["a"] * n),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "value": pa.array(np.ones(n)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(uid),
            }
        ),
        tmp_path / "events.parquet",
    )

    base_day = EVENTS_T0_US // DAY_US
    per_user = collections.defaultdict(set)
    for u, t_us in zip(uid, ts):
        per_user[int(u)].add(int(t_us // DAY_US) - base_day)
    want = collections.Counter()
    for days in per_user.values():
        ds = sorted(days)
        run = 1
        for a, b in zip(ds, ds[1:]):
            if b == a + 1:
                run += 1
            else:
                want[run] += 1
                run = 1
        want[run] += 1

    got = events_user_streak_hist(str(tmp_path)).to_pandas()
    assert {
        int(r.streak_days): int(r.n_runs) for r in got.itertuples()
    } == dict(want)
    # the planted user contributes one 5-run, one 1-run, one 2-run
    assert want[5] >= 1 and want[2] >= 1


def test_dup_token_mass_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import dup_token_mass

    ids, texts, srcs = [], [], []
    # dup group A: 3 copies (11 tokens), winner id 0 in s1, echoes in s1+s2
    dup_a = " ".join(f"a{i}" for i in range(11))
    for i, s in ((0, "s1"), (1, "s1"), (2, "s2")):
        ids.append(i)
        texts.append(dup_a)
        srcs.append(s)
    # dup group B: 2 copies (30 tokens), winner in s2
    dup_b = " ".join(f"b{i}" for i in range(30))
    for i, s in ((10, "s2"), (11, "s1")):
        ids.append(i)
        texts.append(dup_b)
        srcs.append(s)
    # unique docs with assorted token counts
    g = np.random.default_rng(311)
    for i in range(20, 40):
        ids.append(i)
        texts.append(" ".join(f"u{i}w{j}" for j in range(int(g.integers(3, 25)))))
        srcs.append("s1" if i % 2 else "s2")

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(ids)),
                "source": pa.array(srcs),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    groups = collections.defaultdict(list)
    for i, t in zip(ids, texts):
        groups[t].append(i)
    want = collections.defaultdict(lambda: [0, 0])
    for i, t, s in zip(ids, texts, srcs):
        tok = len(t.split(" "))
        w = want[s]
        w[0] += tok
        mem = groups[t]
        if len(mem) > 1 and i != min(mem):
            w[1] += tok
    # planted: s1 echoes = 11 (doc 1) + 30 (doc 11); s2 echoes = 11 (doc 2)
    assert want["s1"][1] == 41 and want["s2"][1] == 11

    got = dup_token_mass(str(tmp_path)).to_pandas().set_index("source")
    assert len(got) == 2
    for s, (nt, ne) in want.items():
        assert (int(got.loc[s].n_tokens), int(got.loc[s].n_echo_tokens)) == (
            nt,
            ne,
        ), s


def test_small_qty_revenue_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import small_qty_revenue

    g = np.random.default_rng(312)
    n_part, n_line = 50, 2000
    brands = np.array(["Brand#1", "Brand#2", "Brand#3", "Brand#4"])[
        g.integers(0, 4, n_part)
    ]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
                "p_name": pa.array([f"p{i}" for i in range(n_part)]),
                "p_brand": pa.array(brands.tolist()),
                "p_type": pa.array(["t"] * n_part),
                "p_size": pa.array(np.ones(n_part, np.int32)),
                "p_retailprice": pa.array(np.ones(n_part)),
            }
        ),
        tmp_path / "part.parquet",
    )

    lpk = g.integers(0, n_part, n_line).astype(np.int64)
    qty = g.integers(1, 50, n_line).astype(np.int64)
    ext = g.uniform(100, 5000, n_line)
    dis = g.integers(0, 11, n_line) / 100.0
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(n_line, dtype=np.int64)),
                "l_partkey": pa.array(lpk),
                "l_suppkey": pa.array(np.zeros(n_line, np.int64)),
                "l_linenumber": pa.array(np.ones(n_line, np.int32)),
                "l_quantity": pa.array(qty.astype(np.float64)),
                "l_extendedprice": pa.array(ext),
                "l_discount": pa.array(dis),
                "l_tax": pa.array(np.zeros(n_line)),
                "l_returnflag": pa.array(["N"] * n_line),
                "l_linestatus": pa.array(["O"] * n_line),
                "l_shipdate": pa.array(
                    np.full(n_line, 800000000000000), pa.int64()
                ).cast(pa.timestamp("us")),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    sq = collections.Counter()
    cnt = collections.Counter()
    for p, q in zip(lpk, qty):
        sq[int(p)] += int(q)
        cnt[int(p)] += 1
    want = collections.defaultdict(lambda: [0, 0])
    n_kept = 0
    for p, q, e, d in zip(lpk, qty, ext, dis):
        if 5 * int(q) * cnt[int(p)] < sq[int(p)]:
            b = brands[int(p)]
            want[b][0] += 1
            want[b][1] += int(math.floor(e * (1.0 - d)))
            n_kept += 1
    assert n_kept > 0

    got = small_qty_revenue(str(tmp_path)).to_pandas().set_index("p_brand")
    assert len(got) == 4  # dense over every brand
    for b in ("Brand#1", "Brand#2", "Brand#3", "Brand#4"):
        nl, rev = want.get(b, [0, 0])
        assert (int(got.loc[b].n_lines), int(got.loc[b].revenue_floor)) == (
            nl,
            rev,
        ), b
