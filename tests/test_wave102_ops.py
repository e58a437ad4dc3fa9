"""Round-4 wave-102 operators: E149 gap-value coupling sufficient stats
(planted gap/value pairs — including a window-boundary pair and ts ties —
pin all six sums), T156 word source-breadth
spectrum (planted shared/exclusive words pin every band), R83
returned-revenue customer drill-down (planted refund totals with a tie at
the cut pin the top set) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_gap_value_coupling_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_gap_value_coupling

    base = np.datetime64("2026-07-01", "us").astype(np.int64)
    rows = []  # (source, ts_us, event_id, value)

    # "meter": long silences then big payloads (positive coupling);
    # gaps 100s/3600s/5s with values 10/500/2 after each gap
    t = base
    rows.append(("meter", t, 0, 1.0))
    for gap_s, v in ((100, 10.5), (3600, 500.25), (5, 2.0)):
        t += gap_s * 1_000_000
        rows.append(("meter", t, len(rows), float(v)))

    # "tied": two events at the SAME ts (ids 7, 8 break the tie), then
    # one more; negative value exercises floor semantics
    rows.append(("tied", base + 50, 7, 3.9))
    rows.append(("tied", base + 50, 8, -2.3))   # floor -> -3
    rows.append(("tied", base + 2_000_000, 9, 1.0))

    # "lone": single event -> zero pairs, all sums zero
    rows.append(("lone", base, 99, 42.0))

    # window-boundary crossing: small window (60s) forces the pair
    # between the last two "span" events through the carry machinery
    rows.append(("span", base + 10_000_000, 20, 7.0))
    rows.append(("span", base + 130_000_000, 21, 9.0))  # 120s later

    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows]),
                "ts": pa.array(
                    np.array([r[1] for r in rows], np.int64)
                ).cast(pa.timestamp("us")),
                "event_id": pa.array(
                    np.array([r[2] for r in rows], np.int64)
                ),
                "user_id": pa.array(np.zeros(n, np.int64)),
                "value": pa.array(np.array([r[3] for r in rows])),
            }
        ),
        tmp_path / "events.parquet",
    )

    got = (
        events_gap_value_coupling(str(tmp_path), window_us=60_000_000)
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    per = collections.defaultdict(list)
    for s, ts, eid, v in rows:
        per[s].append((ts, eid, int(np.floor(v))))
    assert list(got.index) == sorted(per)
    for s, evs in per.items():
        evs.sort()
        pairs = list(zip(evs, evs[1:]))
        g = [(b[0] - a[0]) // 1_000_000 for a, b in pairs]
        v = [b[2] for a, b in pairs]
        row = got.loc[s]
        assert row["n_pairs"] == len(pairs)
        assert row["sum_gap_s"] == sum(g)
        assert row["sum_gap_sq"] == sum(x * x for x in g)
        assert row["sum_v"] == sum(v)
        assert row["sum_v_sq"] == sum(x * x for x in v)
        assert row["sum_gap_v"] == sum(a * b for a, b in zip(g, v))
    assert got.loc["lone", "n_pairs"] == 0
    assert got.loc["span", "sum_gap_v"] == 120 * 9
    assert got.loc["tied", "sum_v"] == -3 + 1  # tie pair then 2s pair


def test_doc_word_breadth_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import word_breadth_spectrum

    rows = [  # (source, text)
        # "the" in all 3 sources; "fox" in s1+s2; "onlyone" in s1 only
        ("s1", "the quick fox onlyone the"),
        ("s1", "the fox again"),
        ("s2", "the lazy fox"),
        ("s2", "the dog"),
        ("s3", "the cat naps"),
    ]
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array([r[1] for r in rows]),
                "lang": pa.array(["en"] * n),
                "source": pa.array([r[0] for r in rows]),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    got = (
        word_breadth_spectrum(str(tmp_path))
        .to_pandas()
        .set_index("n_sources")
        .sort_index()
    )
    per = collections.defaultdict(lambda: [set(), 0])  # w -> [srcs, occ]
    for s, txt in rows:
        for w in txt.split(" "):
            per[w][0].add(s)
            per[w][1] += 1
    want = collections.defaultdict(lambda: [0, 0])
    for w, (ss, occ) in per.items():
        want[len(ss)][0] += 1
        want[len(ss)][1] += occ
    assert list(got.index) == sorted(want)
    for k, (nw, occ) in want.items():
        assert got.loc[k, "n_words"] == nw
        assert got.loc[k, "n_occurrences"] == occ
    assert got.loc[3, "n_words"] == 1          # "the"
    assert got.loc[3, "n_occurrences"] == 6
    assert got.loc[2, "n_words"] == 1          # "fox"


def test_rel_refund_drilldown_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import refund_drilldown

    g = np.random.default_rng(836)
    # orders: okey -> custkey; customers 1..20 over 3 nations
    n_cust = 20
    okeys = list(range(1000, 1200))
    o_cust = {k: (k % n_cust) + 1 for k in okeys}
    ok, rf, ep, dc = [], [], [], []
    # planted: cust 1 gets huge returned revenue via okey 1000
    for _ in range(4):
        ok.append(1000)
        rf.append("R")
        ep.append(50_000.0)
        dc.append(0.0)
    # planted tie at the cut: custs 2..12 each get exactly one returned
    # line of 1000.0 -> 11 customers tie for the 9 slots behind cust 1;
    # lowest custkeys 2..10 make the top-10, 11 and 12 fall out
    for k in range(1001, 1012):
        ok.append(k)  # o_cust maps 1001->2, ..., 1011->12
        rf.append("R")
        ep.append(1000.0)
        dc.append(0.0)
    # noise: non-returned lines everywhere (must not count)
    for k in okeys:
        for _ in range(int(g.integers(1, 4))):
            ok.append(k)
            rf.append(g.choice(["N", "A"]))
            ep.append(float(g.uniform(100, 5000)))
            dc.append(float(g.integers(0, 10)) / 100.0)
    n = len(ok)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.array(ok, np.int64)),
                "l_partkey": pa.array(np.ones(n, np.int64)),
                "l_suppkey": pa.array(np.ones(n, np.int64)),
                "l_linenumber": pa.array(np.ones(n, np.int32)),
                "l_quantity": pa.array(np.ones(n)),
                "l_extendedprice": pa.array(np.array(ep)),
                "l_discount": pa.array(np.array(dc)),
                "l_tax": pa.array(np.zeros(n)),
                "l_returnflag": pa.array(rf),
                "l_linestatus": pa.array(["O"] * n),
                "l_shipdate": pa.array(
                    np.full(n, np.datetime64("2026-01-01", "us"))
                ),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    no = len(okeys)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.array(okeys, np.int64)),
                "o_custkey": pa.array(
                    np.array([o_cust[k] for k in okeys], np.int64)
                ),
                "o_orderstatus": pa.array(["O"] * no),
                "o_totalprice": pa.array(np.full(no, 100.0)),
                "o_orderdate": pa.array(
                    np.full(no, np.datetime64("2026-01-01", "us"))
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * no),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(np.arange(1, n_cust + 1, dtype=np.int64)),
                "c_name": pa.array(
                    [f"Customer#{i}" for i in range(1, n_cust + 1)]
                ),
                "c_nationkey": pa.array(
                    np.array([i % 3 for i in range(1, n_cust + 1)], np.int64)
                ),
                "c_acctbal": pa.array(np.zeros(n_cust)),
                "c_mktsegment": pa.array(["BUILDING"] * n_cust),
            }
        ),
        tmp_path / "customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(np.arange(3, dtype=np.int64)),
                "n_name": pa.array(["ALPHA", "BETA", "GAMMA"]),
                "n_regionkey": pa.array(np.zeros(3, np.int64)),
            }
        ),
        tmp_path / "nation.parquet",
    )

    per = collections.defaultdict(lambda: [0, 0])  # ck -> [nl, rev]
    for k, f, e, d in zip(ok, rf, ep, dc):
        if f == "R":
            c = per[o_cust[k]]
            c[0] += 1
            c[1] += int(np.floor(e * (1.0 - d)))
    ranked = sorted(per.items(), key=lambda kv: (-kv[1][1], kv[0]))[:10]

    got = (
        refund_drilldown(str(tmp_path))
        .to_pandas()
        .set_index("c_custkey")
        .sort_index()
    )
    assert sorted(got.index) == sorted(ck for ck, _ in ranked)
    for ck, (nl, rev) in ranked:
        row = got.loc[ck]
        assert row["returned_rev_floor"] == rev
        assert row["n_return_lines"] == nl
        assert row["c_name"] == f"Customer#{ck}"
        assert row["nation"] == ["ALPHA", "BETA", "GAMMA"][ck % 3]
    assert 1 in got.index and 10 in got.index
    assert 11 not in got.index and 12 not in got.index
