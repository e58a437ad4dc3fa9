"""Round-4 wave-89 operators: E136 load-Pareto coverage counts
(planted spike vs uniform sources pin the minute counts), T143/F tape
vocabulary-Jaccard matrix (planted disjoint/identical vocabularies pin
the permilles), R70 value-vs-latency sufficient stats (planted linear
dependence pins the exact sums) — each vs a scalar brute-force
reference."""

from __future__ import annotations

import collections
import itertools

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MIN = 60_000_000
DAY = 86_400_000_000


def test_events_load_pareto_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_load_pareto

    g = np.random.default_rng(740)
    base = np.datetime64("2026-03-02", "us").astype(np.int64)
    et, ts = [], []
    # "spike": 1 minute with 90 events + 10 minutes with 1
    for _ in range(90):
        et.append("spike")
        ts.append(base + 3 * MIN + int(g.integers(0, MIN)))
    for m in range(10, 20):
        et.append("spike")
        ts.append(base + m * MIN + 5)
    # "uniform": 40 minutes x 5
    for m in range(40):
        for _ in range(5):
            et.append("uniform")
            ts.append(base + m * MIN + int(g.integers(0, MIN)))
    for _ in range(600):
        et.append("rand")
        ts.append(base + int(g.integers(0, 3000)) * MIN + int(g.integers(0, MIN)))
    n = len(et)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(et),
                "ts": pa.array(np.array(ts, np.int64)).cast(
                    pa.timestamp("us")
                ),
                "value": pa.array(np.ones(n)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.ones(n, np.int64)),
            }
        ),
        tmp_path / "events.parquet",
    )

    cnt = collections.Counter((s, t // MIN) for s, t in zip(et, ts))
    per = collections.defaultdict(list)
    for (s, _), c in cnt.items():
        per[s].append(c)

    def cover(xs, q):
        tot = sum(xs)
        thr = (tot * q + 999) // 1000
        cum = 0
        for i, x in enumerate(sorted(xs, reverse=True), 1):
            cum += x
            if cum >= thr:
                return i
        return len(xs)

    got = events_load_pareto(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(per)
    for s, xs in per.items():
        row = got.loc[s]
        assert row["active_minutes"] == len(xs)
        assert row["n_events"] == sum(xs)
        assert row["m50"] == cover(xs, 500)
        assert row["m90"] == cover(xs, 900)
    assert got.loc["spike", "m50"] == 1
    assert got.loc["uniform", "m50"] == 20


def test_f1_vocab_jaccard_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import tape_vocab_jaccard

    g = np.random.default_rng(741)
    rows = []
    # sA and sB share ids 0-49 exactly; sC is disjoint (1000-1049)
    for _ in range(20):
        rows.append(("sA", [int(x) for x in g.integers(0, 50, 12)]))
        rows.append(("sB", [int(x) for x in g.integers(0, 50, 15)]))
        rows.append(("sC", [int(x) for x in g.integers(1000, 1050, 10)]))
    # make vocab coverage complete so |A| and |B| are deterministic
    rows.append(("sA", list(range(50))))
    rows.append(("sB", list(range(50))))
    rows.append(("sC", list(range(1000, 1050))))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(
                    [f"s00-{i:08d}" for i in range(len(rows))]
                ),
                "tokens": pa.array(
                    [r[1] for r in rows], pa.list_(pa.int32())
                ),
                "n_tok": pa.array(
                    [len(r[1]) for r in rows], pa.int64()
                ),
                "source": pa.array([r[0] for r in rows]),
            }
        ),
        tmp_path / "part-000.parquet",
    )

    vocab = collections.defaultdict(set)
    for s, t in rows:
        vocab[s].update(t)
    srcs = sorted(vocab)
    want = {}
    for a, b in itertools.combinations(srcs, 2):
        inter = len(vocab[a] & vocab[b])
        union = len(vocab[a]) + len(vocab[b]) - inter
        want[(a, b)] = (inter, 1000 * inter // union)

    got = tape_vocab_jaccard(str(tmp_path)).to_pandas()
    got = got.set_index(["source_a", "source_b"]).sort_index()
    assert list(got.index) == sorted(want)
    for k, (inter, jac) in want.items():
        row = got.loc[k]
        assert row["n_shared"] == inter
        assert row["jaccard_permille"] == jac
    assert got.loc[("sA", "sB"), "jaccard_permille"] == 1000
    assert got.loc[("sA", "sC"), "jaccard_permille"] == 0


def test_rel_value_latency_stats_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import value_latency_stats

    g = np.random.default_rng(742)
    base = np.datetime64("2025-01-01", "us").astype(np.int64)
    prios = ["1-URGENT", "2-HIGH"]
    n_ord = 300
    odate = base + g.integers(0, 200, n_ord) * DAY
    opri = [prios[int(g.integers(0, 2))] for _ in range(n_ord)]
    tp = np.round(g.uniform(1000, 300_000, n_ord), 2)
    ok_col, ship = [], []
    worst = {}
    for o in range(n_ord):
        w = 0
        for _ in range(int(g.integers(1, 4))):
            d = int(g.integers(0, 90))
            w = max(w, d)
            ok_col.append(o)
            ship.append(odate[o] + d * DAY)
        worst[o] = w
    nl = len(ok_col)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
                "o_custkey": pa.array(np.ones(n_ord, np.int64)),
                "o_orderstatus": pa.array(["O"] * n_ord),
                "o_totalprice": pa.array(tp),
                "o_orderdate": pa.array(odate).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(opri),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(ok_col, pa.int64()),
                "l_partkey": pa.array(np.ones(nl, np.int64)),
                "l_suppkey": pa.array(np.ones(nl, np.int64)),
                "l_quantity": pa.array(np.ones(nl)),
                "l_extendedprice": pa.array(np.ones(nl)),
                "l_discount": pa.array(np.zeros(nl)),
                "l_tax": pa.array(np.zeros(nl)),
                "l_shipdate": pa.array(
                    np.array(ship, np.int64)
                ).cast(pa.timestamp("us")),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    agg = collections.defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for o in range(n_ord):
        v = int(np.floor(tp[o]))
        d = worst[o]
        w = agg[opri[o]]
        w[0] += 1
        w[1] += v
        w[2] += d
        w[3] += v * d
        w[4] += v * v
        w[5] += d * d

    got = value_latency_stats(str(tmp_path)).to_pandas()
    got = got.set_index("priority").sort_index()
    assert list(got.index) == sorted(agg)
    for p, w in agg.items():
        row = got.loc[p]
        assert row["n_orders"] == w[0]
        assert row["sum_v"] == w[1]
        assert row["sum_d"] == w[2]
        assert row["sum_vd"] == w[3]
        assert row["sum_v2"] == w[4]
        assert row["sum_d2"] == w[5]
