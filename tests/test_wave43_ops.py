"""Round-4 wave-43 operators: E97 payload-trend sufficient statistics,
T90 dedup x quality attrition matrix (the fixture plants docs in every
cell of the 2x2), R29 Q3-shape shipping-priority top-k — each vs a
scalar brute-force reference."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MIN_US = 60_000_000


def test_trend_stats_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import EVENTS_T0_US, events_trend_stats

    g = np.random.default_rng(300)
    n = 1300
    types = np.array(["a", "b", "c"])[g.integers(0, 3, n)]
    minute = g.integers(0, 5000, n).astype(np.int64)
    ts = EVENTS_T0_US + minute * MIN_US + g.integers(0, MIN_US, n)
    val = g.uniform(-50, 900, n)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(types.tolist()),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "value": pa.array(val),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.zeros(n, np.int64)),
            }
        ),
        tmp_path / "events.parquet",
    )

    want = collections.defaultdict(lambda: [0, 0, 0, 0, 0])
    for s, t_us, v in zip(types, ts, val):
        t = int((t_us - EVENTS_T0_US) // MIN_US)
        vi = int(math.floor(v))
        w = want[s]
        w[0] += 1
        w[1] += t
        w[2] += t * t
        w[3] += vi
        w[4] += t * vi

    got = events_trend_stats(str(tmp_path)).to_pandas().set_index("source")
    assert len(got) == 3
    for s, (cnt, st, stt, sv, stv) in want.items():
        r = got.loc[s]
        assert (
            int(r.n_events), int(r.sum_t), int(r.sum_tt),
            int(r.sum_v), int(r.sum_tv),
        ) == (cnt, st, stt, sv, stv), s


STOPS = {"the", "a", "of", "and", "to", "in", "is"}


def _shingles(words):
    n = max(len(words) - 2, 1)
    return {" ".join(words[i : i + 3]) for i in range(n)}


def _quality_pass(lang, text, eval_shingles):
    if lang != "en":
        return False
    w = text.split(" ")
    n = len(w)
    if not (20 <= n <= 90):
        return False
    cnt = collections.Counter(w)
    d, m = len(cnt), max(cnt.values())
    if math.floor(1000.0 * (n - d) / n) > 600:
        return False
    if math.floor(1000.0 * m / n) > 130:
        return False
    stop = sum(1 for x in text.lower().split(" ") if x in STOPS)
    if math.floor(1000.0 * stop / n) < 20:
        return False
    return not (_shingles(w) & eval_shingles)


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_prep_attrition_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import prep_attrition

    # vocabulary pools that never overlap the eval docs (ids < 10)
    ev = [f"ev{i:02d}" for i in range(40)]
    vocab = [f"wd{i:03d}" for i in range(200)]

    ids, texts, langs, srcs = [], [], [], []

    # eval docs 0..9: self-contaminated by construction -> qual fail
    for i in range(10):
        ids.append(i)
        texts.append(" ".join(ev[:25]) + f" tail{i}")
        langs.append("en")
        srcs.append("s1")

    def passing(words30):
        # 28 distinct words + 'the' twice: stop floor 66>=20, top 66<=130
        return " ".join(words30[:28] + ["the", "the"])

    # near-dup pair 20/21 (both quality-passing): 21 = dup-only drop
    base = vocab[0:28]
    var = vocab[0:27] + [vocab[50]]
    ids += [20, 21]
    texts += [passing(base), passing(var)]
    langs += ["en", "en"]
    srcs += ["s1", "s1"]

    # near-dup LOW-quality pair 30/31 (too short): 31 = both, 30 = qf only
    short = " ".join(vocab[60:70])
    short_v = " ".join(vocab[60:69] + [vocab[80]])
    ids += [30, 31]
    texts += [short, short_v]
    langs += ["en", "en"]
    srcs += ["s2", "s2"]

    # unique keeper 40; unique wrong-lang 41 (qf only)
    ids += [40, 41]
    texts += [passing(vocab[100:128]), passing(vocab[130:158])]
    langs += ["en", "de"]
    srcs += ["s2", "s2"]

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(langs),
                "source": pa.array(srcs),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    # brute-force reference
    sh = {i: _shingles(t.split(" ")) for i, t in zip(ids, texts)}
    pairs = []
    for a in ids:
        for b in ids:
            if a < b:
                inter = len(sh[a] & sh[b])
                union = len(sh[a] | sh[b])
                if union and math.floor(1000.0 * inter / union) >= 200:
                    pairs.append((a, b))
    labels = _union_find(pairs)
    losers = {x for x, r in labels.items() if x != r}
    eval_sh = set().union(*(sh[i] for i in ids if i < 10))

    want = collections.defaultdict(lambda: [0, 0, 0, 0, 0])
    for i, t, lg, s in zip(ids, texts, langs, srcs):
        dup = i in losers
        qf = not _quality_pass(lg, t, eval_sh)
        w = want[s]
        w[0] += 1
        w[1] += dup
        w[2] += qf
        w[3] += dup and qf
        w[4] += (not dup) and (not qf)

    # sanity: the fixture populates every cell of the 2x2
    assert 21 in losers and 31 in losers and 30 not in losers
    assert sum(w[3] for w in want.values()) >= 1  # both
    assert sum(w[4] for w in want.values()) >= 1  # kept

    got = prep_attrition(str(tmp_path)).to_pandas().set_index("source")
    assert len(got) == len(want)
    for s, (nd, dup, qf, both, kept) in want.items():
        r = got.loc[s]
        assert (
            int(r.n_docs), int(r.n_dup_dropped), int(r.n_qual_failed),
            int(r.n_both), int(r.n_kept),
        ) == (nd, dup, qf, both, kept), s


def test_shipping_priority_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import shipping_priority

    g = np.random.default_rng(301)
    n_cust, n_ord, n_line = 60, 400, 1400
    segs = np.array(["BUILDING", "AUTOMOBILE", "MACHINERY"])[
        g.integers(0, 3, n_cust)
    ]
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
                "c_name": pa.array([f"c{i}" for i in range(n_cust)]),
                "c_nationkey": pa.array(np.zeros(n_cust, np.int64)),
                "c_acctbal": pa.array(np.zeros(n_cust)),
                "c_mktsegment": pa.array(segs.tolist()),
            }
        ),
        tmp_path / "customer.parquet",
    )

    day_us = 86_400_000_000
    base = np.datetime64("1997-01-01", "us").astype(np.int64)
    ocust = g.integers(0, n_cust, n_ord).astype(np.int64)
    odate = base + g.integers(0, 900, n_ord).astype(np.int64) * day_us
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
                "o_custkey": pa.array(ocust),
                "o_orderstatus": pa.array(["O"] * n_ord),
                "o_totalprice": pa.array(np.zeros(n_ord)),
                "o_orderdate": pa.array(odate, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * n_ord),
            }
        ),
        tmp_path / "orders.parquet",
    )

    lord = g.integers(0, n_ord, n_line).astype(np.int64)
    sdate = base + g.integers(0, 1000, n_line).astype(np.int64) * day_us
    ext = g.uniform(100, 5000, n_line)
    dis = g.integers(0, 11, n_line) / 100.0
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(lord),
                "l_partkey": pa.array(np.zeros(n_line, np.int64)),
                "l_suppkey": pa.array(np.zeros(n_line, np.int64)),
                "l_linenumber": pa.array(np.ones(n_line, np.int32)),
                "l_quantity": pa.array(np.ones(n_line)),
                "l_extendedprice": pa.array(ext),
                "l_discount": pa.array(dis),
                "l_tax": pa.array(np.zeros(n_line)),
                "l_returnflag": pa.array(["N"] * n_line),
                "l_linestatus": pa.array(["O"] * n_line),
                "l_shipdate": pa.array(sdate, pa.int64()).cast(
                    pa.timestamp("us")
                ),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    cut = np.datetime64("1998-06-01", "us").astype(np.int64)
    building = {i for i in range(n_cust) if segs[i] == "BUILDING"}
    rev = collections.Counter()
    kept_orders = {
        o for o in range(n_ord)
        if int(ocust[o]) in building and odate[o] < cut
    }
    for o, sd, e, d in zip(lord, sdate, ext, dis):
        if int(o) in kept_orders and sd > cut:
            rev[int(o)] += int(math.floor(e * (1.0 - d)))
    board = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert len(board) == 10

    got = shipping_priority(str(tmp_path)).to_pandas()
    assert [
        (int(r.o_orderkey), int(r.revenue_floor)) for r in got.itertuples()
    ] == board
    od = dict(zip(range(n_ord), odate))
    want_dates = [od[k] for k, _ in board]
    got_dates = [
        int(np.datetime64(d, "us").astype(np.int64))
        for d in got.o_orderdate.to_numpy()
    ]
    assert got_dates == want_dates
