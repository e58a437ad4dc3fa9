"""Round-4 wave-26 operators: E83 engagement-coverage quantiles (distinct
days over span), T72 word-stutter board (adjacent-equal pairs — fixture
plants known stutters and doc boundaries that must NOT count), R13
windowed top-supplier revenue (Q15 shape, ship-window pushed to the
read) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY_US = 86_400_000_000


def test_coverage_quantiles_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import (
        EVENTS_T0_US,
        events_coverage_quantiles,
    )

    g = np.random.default_rng(140)
    n = 1500
    types = np.array(["a", "b", "c"])[g.integers(0, 3, n)]
    users = (g.zipf(1.5, n) % 30).astype(np.int64)
    ts = EVENTS_T0_US + g.integers(0, 60, n).astype(np.int64) * DAY_US + (
        g.integers(0, 86_400, n).astype(np.int64) * 1_000_000
    )
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(types.tolist()),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "value": pa.array(np.ones(n)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(users),
            }
        ),
        tmp_path / "events.parquet",
    )

    days = collections.defaultdict(set)
    for t, u, s in zip(types, users, ts):
        days[(t, int(u))].add(int(s) // DAY_US)
    per_src = collections.defaultdict(list)
    for (t, _u), dd in days.items():
        span = max(dd) - min(dd) + 1
        per_src[t].append(1000 * len(dd) // span)

    got = events_coverage_quantiles(str(tmp_path)).to_pandas().set_index(
        "source"
    )
    assert len(got) == len(per_src)
    for s, covs in per_src.items():
        sv = sorted(covs)
        nt = len(sv)
        r = got.loc[s]
        assert r.n_users == nt
        for q, col in ((500, "p50"), (900, "p90")):
            thr = (nt * q + 999) // 1000
            assert r[col] == sv[thr - 1], (s, col)
    # fixture sanity: some users must be non-daily (cov < 1000)
    assert any(c < 1000 for covs in per_src.values() for c in covs)


def test_stutter_stats_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import stutter_stats

    g = np.random.default_rng(141)
    vocab = ["aa", "bb", "cc", "dd"]
    texts, srcs = [], []
    for i in range(160):
        ws = list(g.choice(vocab, size=g.integers(1, 20)))
        texts.append(" ".join(ws))
        srcs.append(f"s{i % 3}")
    # plant a doc ENDING with word X followed by a doc STARTING with X:
    # the boundary must not count as a stutter
    texts[0], texts[1] = "aa bb cc", "cc dd"
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

    want = collections.defaultdict(lambda: [0, 0, 0])  # docs, pairs, stut
    for t, s in zip(texts, srcs):
        ws = t.split(" ")
        w = want[s]
        w[0] += 1
        w[1] += len(ws) - 1
        w[2] += sum(1 for a, b in zip(ws[:-1], ws[1:]) if a == b)
    assert sum(w[2] for w in want.values()) > 0  # fixture has stutters

    got = stutter_stats(str(tmp_path)).to_pandas().set_index("source")
    assert len(got) == len(want)
    for s, (nd, npair, nst) in want.items():
        r = got.loc[s]
        assert (r.n_docs, r.n_pairs, r.n_stutters) == (nd, npair, nst), s
        assert r.stutter_permille == (1000 * nst) // max(npair, 1)


def test_top_supplier_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import top_supplier_revenue

    g = np.random.default_rng(142)
    n_supp, n_lines = 25, 900
    suppkeys = np.arange(1, n_supp + 1, dtype=np.int64)
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(suppkeys),
                "s_name": pa.array([f"sup{k}" for k in suppkeys]),
                "s_nationkey": pa.array(np.zeros(n_supp, np.int32)),
                "s_acctbal": pa.array(np.zeros(n_supp)),
            }
        ),
        tmp_path / "supplier.parquet",
    )
    sk = suppkeys[g.integers(0, n_supp, n_lines)]
    ext = g.uniform(1.0, 3000.0, n_lines)
    dis = g.integers(0, 11, n_lines) / 100.0
    days = g.integers(0, 300, n_lines).astype("timedelta64[D]")
    ship = (np.datetime64("1995-10-01") + days).astype("datetime64[us]")
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(n_lines, dtype=np.int64)),
                "l_partkey": pa.array(np.zeros(n_lines, np.int64)),
                "l_suppkey": pa.array(sk, pa.int64()),
                "l_linenumber": pa.array(np.ones(n_lines, np.int32)),
                "l_quantity": pa.array(np.ones(n_lines)),
                "l_extendedprice": pa.array(ext),
                "l_discount": pa.array(dis),
                "l_tax": pa.array(np.zeros(n_lines)),
                "l_returnflag": pa.array(["N"] * n_lines),
                "l_linestatus": pa.array(["O"] * n_lines),
                "l_shipdate": pa.array(
                    ship.astype(np.int64), pa.int64()
                ).cast(pa.timestamp("us")),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    lo = np.datetime64("1996-01-01", "us")
    hi = np.datetime64("1996-04-01", "us")
    agg = collections.defaultdict(lambda: [0, 0])
    for k, e, d, s in zip(sk, ext, dis, ship):
        if lo <= s < hi:
            a = agg[int(k)]
            a[0] += 1
            a[1] += int(math.floor(e * (1.0 - d)))
    assert agg and len(agg) > 10  # window is populated
    ranked = sorted(agg.items(), key=lambda kv: (-kv[1][1], kv[0]))[:10]

    got = top_supplier_revenue(str(tmp_path)).to_pandas()
    assert len(got) == len(ranked)
    for i, (r, (k, (nl, rv))) in enumerate(zip(got.itertuples(), ranked)):
        assert r.rank == i + 1
        assert r.s_suppkey == k
        assert r.s_name == f"sup{k}"
        assert (r.n_lines, r.revenue_floor) == (nl, rv)
