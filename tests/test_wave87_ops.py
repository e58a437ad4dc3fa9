"""Round-4 wave-87 operators: E134 per-source tenure quantiles
(planted day-trippers vs veterans pin the span bands), T141/F tape
boundary audit (planted BOS-packing errors pin the interior counts),
R68 new-vs-repeat monthly mix (planted first orders pin the permille)
— each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY = 86_400_000_000


def test_events_tenure_quantiles_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_tenure_quantiles

    g = np.random.default_rng(720)
    base = np.datetime64("2026-03-02", "us").astype(np.int64)
    et, ts, uid = [], [], []
    # "trippers": 10 users, all events on one day -> span 1
    for u in range(1, 11):
        for _ in range(3):
            et.append("trippers")
            ts.append(base + 4 * DAY + int(g.integers(0, DAY)))
            uid.append(u)
    # "veterans": 5 users spanning exactly 30 days -> span 31
    for u in range(20, 25):
        et.append("veterans"); ts.append(base + 0 * DAY + 5); uid.append(u)
        et.append("veterans"); ts.append(base + 30 * DAY + 5); uid.append(u)
    # bulk
    for _ in range(600):
        et.append("rand")
        ts.append(base + int(g.integers(0, 60)) * DAY + int(g.integers(0, DAY)))
        uid.append(int(g.integers(0, 40)))
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
                "user_id": pa.array(uid, pa.int64()),
            }
        ),
        tmp_path / "events.parquet",
    )

    lo, hi = {}, {}
    for s, t, u in zip(et, ts, uid):
        d = t // DAY
        lo[(s, u)] = min(lo.get((s, u), 10**9), d)
        hi[(s, u)] = max(hi.get((s, u), -1), d)
    spans = collections.defaultdict(list)
    for k in lo:
        spans[k[0]].append(hi[k] - lo[k] + 1)

    got = events_tenure_quantiles(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(spans)
    for s, xs in spans.items():
        xs = sorted(xs)
        row = got.loc[s]
        assert row["n_users"] == len(xs)
        for col, q in (("p50_span", 500), ("p90_span", 900)):
            thr = (len(xs) * q + 999) // 1000
            assert row[col] == xs[thr - 1]
        assert row["max_span"] == xs[-1]
    assert got.loc["trippers", "max_span"] == 1
    assert got.loc["veterans", "p50_span"] == 31


def test_f1_boundary_audit_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import tape_boundary_audit

    g = np.random.default_rng(721)
    BOS = 50000
    rows = []
    # "clean": BOS opener, never interior
    for _ in range(40):
        rows.append(
            ("clean", [BOS] + [int(x) for x in g.integers(0, 999, 10)])
        )
    # "packed": BOS opener but ALSO appears mid-sequence (bad packing)
    for _ in range(15):
        t = [BOS] + [int(x) for x in g.integers(0, 999, 5)]
        t += [BOS] + [int(x) for x in g.integers(0, 999, 5)]
        rows.append(("packed", t))
    # a few without the BOS opener at all
    for _ in range(5):
        rows.append(("packed", [int(x) for x in g.integers(0, 999, 8)]))
    for _ in range(60):
        rows.append(
            ("rand", [int(x) for x in g.integers(0, 9999, g.integers(1, 20))])
        )
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

    openers = collections.defaultdict(collections.Counter)
    for s, t in rows:
        if t:
            openers[s][t[0]] += 1
    want = {}
    for s in openers:
        oid = min(openers[s], key=lambda x: (-openers[s][x], x))
        n_seqs = sum(1 for r in rows if r[0] == s)
        n_open = sum(
            1 for r in rows if r[0] == s and r[1] and r[1][0] == oid
        )
        n_inter = sum(
            1 for r in rows if r[0] == s and oid in r[1][1:]
        )
        want[s] = (n_seqs, oid, n_open, n_inter)

    got = tape_boundary_audit(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(want)
    for s, (nsq, oid, nop, nint) in want.items():
        row = got.loc[s]
        assert row["n_seqs"] == nsq
        assert row["open_id"] == oid
        assert row["n_open"] == nop
        assert row["open_permille"] == 1000 * nop // nsq
        assert row["n_interior"] == nint
    assert got.loc["clean", "n_interior"] == 0
    assert got.loc["packed", "n_interior"] == 15


def test_rel_new_vs_repeat_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import new_vs_repeat

    g = np.random.default_rng(722)
    base = np.datetime64("2025-01-01", "us").astype(np.int64)
    n_ord = 700
    ck = g.integers(0, 120, n_ord)
    odate = base + g.integers(0, 360, n_ord) * DAY
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
                "o_custkey": pa.array(ck, pa.int64()),
                "o_orderstatus": pa.array(["O"] * n_ord),
                "o_totalprice": pa.array(np.ones(n_ord)),
                "o_orderdate": pa.array(odate).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n_ord),
            }
        ),
        tmp_path / "orders.parquet",
    )

    first = {}
    for o in range(n_ord):
        k = (int(odate[o]), o)
        c = int(ck[o])
        if c not in first or k < first[c]:
            first[c] = k
    firsts = set(first.values())
    want = collections.defaultdict(lambda: [0, 0])
    for o in range(n_ord):
        mo = (
            np.datetime64(int(odate[o]), "us")
            .astype("datetime64[M]")
            .astype(np.int64)
        )
        w = want[int(mo)]
        w[0] += 1
        if (int(odate[o]), o) in firsts:
            w[1] += 1

    got = new_vs_repeat(str(tmp_path)).to_pandas()
    got["mo"] = got["o_month"].values.astype("datetime64[M]").astype(np.int64)
    got = got.set_index("mo").sort_index()
    assert list(got.index) == sorted(want)
    for mo, w in want.items():
        row = got.loc[mo]
        assert row["n_orders"] == w[0]
        assert row["n_new"] == w[1]
        assert row["new_permille"] == 1000 * w[1] // w[0]
