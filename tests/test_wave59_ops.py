"""Round-4 wave-59 operators: E107 hour-of-week peak-cell board
(planted two-way cell tie exercises the min-cell rule), T112
boilerplate-opener board (planted opener tie exercises the min-word
rule), R40 supplier-risk exposure board (planted supplier-less nation
exercises the dense densify) — each vs a scalar brute-force reference.
"""

from __future__ import annotations

import collections
import datetime
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_peak_cell_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_peak_cell

    g = np.random.default_rng(440)
    base = np.datetime64("2026-03-01", "us").astype(np.int64)
    n = 3000
    types = np.array(["click", "view", "buy"])
    et = types[g.integers(0, 3, n)]
    ts = base + g.integers(0, 21 * 86_400_000_000, n).astype(np.int64)
    # planted tie: source "tied" has exactly 5 events in each of TWO
    # distinct hour-of-week cells — the smaller packed cell must win
    tie_ts = []
    for day, hour in [(2, 9), (5, 14)]:  # two cells, 5 events each
        t0 = base + day * 86_400_000_000 + hour * 3_600_000_000
        tie_ts += [t0 + j * 60_000_000 for j in range(5)]
    et = np.append(et, ["tied"] * len(tie_ts))
    ts = np.append(ts, np.array(tie_ts, np.int64))
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(et),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            }
        ),
        tmp_path / "events.parquet",
    )

    cells = collections.Counter()
    totals = collections.Counter()
    epoch = datetime.datetime(1970, 1, 1)
    for s, t in zip(et, ts):
        dt = epoch + datetime.timedelta(microseconds=int(t))
        dow = (dt.weekday() + 1) % 7  # DuckDB dayofweek: Sunday=0
        cells[(s, dow * 24 + dt.hour)] += 1
        totals[s] += 1

    want = {}
    for s in totals:
        mx = max(v for (ss, _), v in cells.items() if ss == s)
        cell = min(c for (ss, c), v in cells.items() if ss == s and v == mx)
        want[s] = (totals[s], cell // 24, cell % 24, mx)

    got = events_peak_cell(str(tmp_path)).to_pandas()
    assert len(got) == len(want)
    for _, r in got.iterrows():
        ne, dow, hr, pk = want[r.source]
        assert int(r.n_events) == ne, r.source
        assert (int(r.peak_dow), int(r.peak_hour)) == (dow, hr), r.source
        assert int(r.peak_count) == pk, r.source
    # the planted tie resolved to the SMALLER cell (Tue=2 < Fri=5 in
    # Sunday-0 dow; both are the same packed ordering here)
    tied = got[got.source == "tied"].iloc[0]
    assert (int(tied.peak_dow), int(tied.peak_hour)) == (2, 9)
    assert int(tied.peak_count) == 5


def test_doc_opener_board_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import opener_board

    g = np.random.default_rng(441)
    openers = np.array(["the", "a", "report", "zzz", "intro"])
    bodies = np.array(["quick brown fox", "lazy dog", "x y z"])
    n = 800
    texts = [
        f"{openers[g.integers(0, 5)]} {bodies[g.integers(0, 3)]}"
        for _ in range(n)
    ]
    srcs = [f"s{int(g.integers(0, 4))}" for _ in range(n)]
    # planted tie: source "tie" has exactly 3 docs opening "beta" and 3
    # opening "alpha" — lexicographically smallest ("alpha") must win
    texts += ["beta one", "beta two", "beta three",
              "alpha one", "alpha two", "alpha three"]
    srcs += ["tie"] * 6
    # planted single-token doc (no space): whole text is the opener
    texts += ["solo"]
    srcs += ["tie"]
    pq.write_table(
        pa.table({"text": pa.array(texts), "source": pa.array(srcs)}),
        tmp_path / "documents.parquet",
    )

    per = collections.defaultdict(collections.Counter)
    for t, s in zip(texts, srcs):
        per[s][t.split(" ", 1)[0]] += 1

    got = opener_board(str(tmp_path)).to_pandas()
    assert len(got) == len(per)
    for _, r in got.iterrows():
        c = per[r.source]
        assert int(r.n_docs) == sum(c.values()), r.source
        assert int(r.n_openers) == len(c), r.source
        mx = max(c.values())
        assert int(r.top_count) == mx, r.source
        assert r.top_opener == min(w for w, v in c.items() if v == mx), (
            r.source
        )
    tie = got[got.source == "tie"].iloc[0]
    assert tie.top_opener == "alpha" and int(tie.top_count) == 3
    assert int(tie.n_openers) == 3  # alpha, beta, solo


def test_rel_supplier_risk_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import supplier_risk

    g = np.random.default_rng(442)
    n_nat, n_sup, n_lines = 6, 40, 3000
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(np.arange(n_nat, dtype=np.int64)),
                "n_name": pa.array([f"NAT{k}" for k in range(n_nat)]),
            }
        ),
        tmp_path / "nation.parquet",
    )
    skeys = np.arange(1, n_sup + 1, dtype=np.int64)
    # planted: nation 5 gets NO suppliers (dense zero row)
    snat = g.integers(0, n_nat - 1, n_sup).astype(np.int64)
    sbal = g.uniform(-900, 9000, n_sup)
    sbal[0] = -0.004  # floors to -1 cent -> negative
    sbal[1] = 0.004  # floors to 0 cents -> NOT negative
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(skeys),
                "s_nationkey": pa.array(snat),
                "s_acctbal": pa.array(sbal),
            }
        ),
        tmp_path / "supplier.parquet",
    )
    lsup = g.integers(1, n_sup + 1, n_lines).astype(np.int64)
    lext = g.uniform(900, 90000, n_lines)
    pq.write_table(
        pa.table(
            {
                "l_suppkey": pa.array(lsup),
                "l_extendedprice": pa.array(lext),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    neg = {int(k): math.floor(100.0 * b) < 0 for k, b in zip(skeys, sbal)}
    nat_of = {int(k): int(v) for k, v in zip(skeys, snat)}
    want = {k: [0, 0, 0, 0] for k in range(n_nat)}
    for k in skeys:
        want[nat_of[int(k)]][0] += 1
        want[nat_of[int(k)]][1] += int(neg[int(k)])
    for k, e in zip(lsup, lext):
        if neg[int(k)]:
            want[nat_of[int(k)]][2] += 1
            want[nat_of[int(k)]][3] += math.floor(100.0 * e)

    got = supplier_risk(str(tmp_path)).to_pandas()
    assert len(got) == n_nat
    for _, r in got.iterrows():
        k = int(r.n_name[3:])
        ns, nb, nl, rv = want[k]
        assert int(r.n_suppliers) == ns, k
        assert int(r.n_negbal) == nb, k
        assert int(r.neg_lines) == nl, k
        assert int(r.neg_rev_cents) == rv, k
    assert int(got[got.n_name == "NAT5"].iloc[0].n_suppliers) == 0
