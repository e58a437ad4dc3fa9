"""Round-4 wave-84 operators: E131 midnight-crossing sessions by
weekday (planted late-night vs daytime sessions pin the crossing
counts), T138 template-slot lock board (planted fixed-prefix docs pin
the locked positions), R65 order fill-rate board (planted fast vs slow
orders pin the permille) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY = 86_400_000_000
HOUR = 3_600_000_000


def _isodow(day: int) -> int:
    return (day + 3) % 7 + 1


def test_events_midnight_sessions_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_midnight_sessions

    g = np.random.default_rng(690)
    base = np.datetime64("2026-03-02", "us").astype(np.int64)  # a Monday
    ts, uid = [], []
    # daytime sessions (never cross): users 1-10, Tue 10:00-11:00
    for u in range(1, 11):
        for i in range(4):
            ts.append(base + 1 * DAY + 10 * HOUR + i * 600_000_000)
            uid.append(u)
    # crossing sessions: users 20-25, start Wed 23:30, end Thu 00:30
    for u in range(20, 26):
        for i in range(3):
            ts.append(base + 2 * DAY + 23 * HOUR + 30 * 60_000_000
                      + i * 30 * 60_000_000)
            uid.append(u)
    # bulk: random single-event sessions (12h apart per user)
    for u in range(30, 80):
        t0 = base + int(g.integers(0, 10)) * DAY + int(g.integers(0, DAY))
        ts.append(t0)
        uid.append(u)
    n = len(ts)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(["e"] * n),
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

    # brute force: 6h-gap sessions per user
    per_user = collections.defaultdict(list)
    for t, u in zip(ts, uid):
        per_user[u].append(t)
    want = collections.defaultdict(lambda: [0, 0])
    for u, tl in per_user.items():
        tl = sorted(tl)
        start = end = tl[0]
        sessions = []
        for t in tl[1:]:
            if t - end > 6 * HOUR:
                sessions.append((start, end))
                start = t
            end = t
        sessions.append((start, end))
        for s, e in sessions:
            w = want[_isodow(s // DAY)]
            w[0] += 1
            w[1] += 1 if (s // DAY) != (e // DAY) else 0

    got = events_midnight_sessions(str(tmp_path)).to_pandas()
    got = got.set_index("dow").sort_index()
    assert list(got.index) == sorted(want)
    for d, w in want.items():
        row = got.loc[d]
        assert row["n_sessions"] == w[0]
        assert row["n_crossing"] == w[1]
        assert row["crossing_permille"] == 1000 * w[1] // w[0]
    assert got.loc[3, "n_crossing"] == 6  # Wednesday starters crossed
    assert got.loc[2, "n_crossing"] == 0


def test_doc_template_slots_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import template_slots

    g = np.random.default_rng(691)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    # "tmpl": fixed 3-word header then random tail
    for _ in range(40):
        tail = " ".join(
            vocab[int(g.integers(0, 30))]
            for _ in range(int(g.integers(5, 20)))
        )
        docs.append(("tmpl", "dear valued customer " + tail))
    # "free": fully random
    for _ in range(60):
        docs.append(
            (
                "free",
                " ".join(
                    vocab[int(g.integers(0, 30))]
                    for _ in range(int(g.integers(2, 25)))
                ),
            )
        )
    n = len(docs)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "source": pa.array([d[0] for d in docs]),
                "text": pa.array([d[1] for d in docs]),
                "lang": pa.array(["en"] * n),
                "quality": pa.array(np.ones(n)),
                "n_chars": pa.array(
                    [len(d[1]) for d in docs], pa.int64()
                ),
                "ingest_ts": pa.array(
                    np.full(n, 1_700_000_000_000_000, np.int64)
                ).cast(pa.timestamp("us")),
            }
        ),
        tmp_path / "documents.parquet",
    )

    K = 16
    want = {}
    for src in ("tmpl", "free"):
        texts = [t for s, t in docs if s == src]
        n_docs = len(texts)
        n_locked = 0
        sum_share = 0
        for p in range(K):
            col = [t.split(" ")[p] for t in texts if len(t.split(" ")) > p]
            if not col:
                continue
            cnt = collections.Counter(col)
            share = 1000 * max(cnt.values()) // len(col)
            sum_share += share
            if share >= 900:
                n_locked += 1
        want[src] = (n_docs, n_locked, sum_share)

    got = template_slots(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(want)
    for s, (nd, nl, ss) in want.items():
        row = got.loc[s]
        assert row["n_docs"] == nd
        assert row["n_locked"] == nl
        assert row["sum_share"] == ss
    assert got.loc["tmpl", "n_locked"] >= 3
    assert got.loc["free", "n_locked"] == 0


def test_rel_fill_rate_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import fill_rate

    g = np.random.default_rng(692)
    base = np.datetime64("2025-01-01", "us").astype(np.int64)
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM"]
    n_ord = 400
    odate = base + g.integers(0, 120, n_ord) * DAY
    opri = [prios[int(g.integers(0, 3))] for _ in range(n_ord)]
    ok_col, ship = [], []
    max_delay = {}
    for o in range(n_ord):
        worst = 0
        for _ in range(int(g.integers(1, 5))):
            d = int(g.integers(0, 60))
            worst = max(worst, d)
            ok_col.append(o)
            ship.append(odate[o] + d * DAY)
        max_delay[o] = worst
    nl = len(ok_col)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
                "o_custkey": pa.array(np.ones(n_ord, np.int64)),
                "o_orderstatus": pa.array(["O"] * n_ord),
                "o_totalprice": pa.array(np.ones(n_ord)),
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

    want = collections.defaultdict(lambda: [0, 0])
    for o in range(n_ord):
        mo = (
            np.datetime64(int(odate[o]), "us")
            .astype("datetime64[M]")
            .astype(np.int64)
        )
        w = want[(int(mo), opri[o])]
        w[0] += 1
        w[1] += 1 if max_delay[o] <= 30 else 0

    got = fill_rate(str(tmp_path)).to_pandas()
    got["mo"] = got["o_month"].values.astype("datetime64[M]").astype(np.int64)
    got = got.set_index(["mo", "priority"]).sort_index()
    assert list(got.index) == sorted(want)
    for k, w in want.items():
        row = got.loc[k]
        assert row["n_orders"] == w[0]
        assert row["n_filled"] == w[1]
        assert row["filled_permille"] == 1000 * w[1] // w[0]
