"""Round-4 wave-25 operators: E82 props JSON-lane stats (parse failures
counted, never fatal), T71 word-length histogram (codepoint semantics —
the fixture plants multi-byte words), R12 promo revenue share (Q14 shape
— the first R-series measure conditioned on a dim attribute) — each vs a
scalar brute-force reference.  The E82 fixture plants malformed and
k-less payloads so the reject lane is load-bearing."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MIN_US = 60_000_000


def test_props_stats_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import EVENTS_T0_US, events_props_stats

    g = np.random.default_rng(130)
    n = 900
    types = np.array(["a", "b", "c"])[g.integers(0, 3, n)]
    ks = g.integers(-5, 120, n)
    props = [f'{{"k": {k}}}' for k in ks]
    # malformed / k-less payloads go to the reject lane
    bad_at = g.choice(n, size=40, replace=False)
    for i in bad_at[:20]:
        props[i] = '{"other": 1}'
    for i in bad_at[20:]:
        props[i] = "not json at all"
    bad_set = set(int(i) for i in bad_at)

    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(types.tolist()),
                "ts": pa.array(
                    EVENTS_T0_US + np.arange(n, dtype=np.int64) * MIN_US,
                    pa.int64(),
                ).cast(pa.timestamp("us")),
                "value": pa.array(np.ones(n)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.zeros(n, np.int64)),
                "props": pa.array(props),
            }
        ),
        tmp_path / "events.parquet",
    )

    per = collections.defaultdict(lambda: {"n": 0, "bad": 0, "ks": []})
    for i, (t, k) in enumerate(zip(types, ks)):
        per[t]["n"] += 1
        if i in bad_set:
            per[t]["bad"] += 1
        else:
            per[t]["ks"].append(int(k))

    got = events_props_stats(str(tmp_path)).to_pandas().set_index("source")
    assert len(got) == len(per)
    for t, w in per.items():
        r = got.loc[t]
        vals = sorted(w["ks"])
        assert r.n_events == w["n"]
        assert r.n_bad == w["bad"]
        assert r.sum_k == sum(vals)
        assert r.min_k == vals[0]
        assert r.max_k == vals[-1]
        thr = (len(vals) * 500 + 999) // 1000
        assert r.p50_k == vals[thr - 1]


def test_word_len_hist_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import word_len_hist

    g = np.random.default_rng(131)
    vocab = ["a", "bb", "ccc", "dddd", "好好", "长词词词", "ee"]
    texts = [
        " ".join(g.choice(vocab, size=g.integers(1, 30)))
        for _ in range(150)
    ]
    srcs = [f"s{i % 3}" for i in range(150)]
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

    want = collections.Counter()
    for t, s in zip(texts, srcs):
        for w in t.split(" "):
            want[(s, len(w))] += 1  # Python len = codepoints, like len()

    got = word_len_hist(str(tmp_path)).to_pandas()
    assert {
        (r.source, int(r.wlen)): int(r.n_words) for r in got.itertuples()
    } == dict(want)


def test_promo_share_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import promo_revenue_share

    g = np.random.default_rng(132)
    n_parts, n_lines = 60, 1200
    p_type = np.array(["PROMO", "STANDARD", "ECONOMY"])[
        g.integers(0, 3, n_parts)
    ]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n_parts, dtype=np.int64)),
                "p_name": pa.array([f"p{i}" for i in range(n_parts)]),
                "p_brand": pa.array(["B1"] * n_parts),
                "p_type": pa.array(p_type.tolist()),
                "p_size": pa.array(np.ones(n_parts, np.int32)),
                "p_retailprice": pa.array(np.ones(n_parts)),
            }
        ),
        tmp_path / "part.parquet",
    )
    pk = g.integers(0, n_parts, n_lines)
    ext = g.uniform(1.0, 5000.0, n_lines)
    dis = g.integers(0, 11, n_lines) / 100.0
    days = g.integers(0, 400, n_lines).astype("timedelta64[D]")
    ship = (np.datetime64("1995-01-01") + days).astype("datetime64[us]")
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(n_lines, dtype=np.int64)),
                "l_partkey": pa.array(pk, pa.int64()),
                "l_suppkey": pa.array(np.zeros(n_lines, np.int64)),
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

    agg = collections.defaultdict(lambda: [0, 0, 0])  # n, promo, total
    for i in range(n_lines):
        m = str(ship[i].astype("datetime64[M]"))
        rev = int(math.floor(ext[i] * (1.0 - dis[i])))
        a = agg[m]
        a[0] += 1
        a[2] += rev
        if p_type[pk[i]] == "PROMO":
            a[1] += rev

    got = promo_revenue_share(str(tmp_path)).to_pandas()
    assert len(got) == len(agg)
    for r in got.itertuples():
        m = str(np.datetime64(r.month, "M"))
        n, promo, total = agg[m]
        assert r.n_lines == n, m
        assert r.promo_rev == promo, m
        assert r.total_rev == total, m
        assert r.promo_permille == (1000 * promo) // max(total, 1), m
