"""Round-4 wave-109 operators: E156 source co-activity matrix (planted
overlapping/disjoint calendars pin every pair cell incl. a zero), T163
tail-fingerprint board (planted shared footers pin distinct/modal
counts), R90 basket width-value coupling stats (planted wide-expensive
orders pin all six sums) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections
import itertools

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_coactivity_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_coactivity

    day_us = 86_400_000_000
    base = 20_000  # epoch day
    active = {
        "daily": set(range(base, base + 10)),          # days 0..9
        "weekend": {base + 5, base + 6, base + 12},    # partial overlap
        "batch": {base + 100, base + 101},             # disjoint
    }
    rows = []
    for s, days in active.items():
        for d in days:
            rows.append((s, d * day_us + 1000))
            rows.append((s, d * day_us + 2000))  # dup events same day
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows]),
                "ts": pa.array(
                    np.array([r[1] for r in rows], np.int64)
                ).cast(pa.timestamp("us")),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.zeros(n, np.int64)),
                "value": pa.array(np.ones(n)),
            }
        ),
        tmp_path / "events.parquet",
    )

    got = (
        events_coactivity(str(tmp_path))
        .to_pandas()
        .set_index(["source_i", "source_j"])
        .sort_index()
    )
    names = sorted(active)
    expected_pairs = list(itertools.combinations(names, 2))
    assert sorted(got.index) == sorted(expected_pairs)
    for si, sj in expected_pairs:
        row = got.loc[(si, sj)]
        assert row["days_both"] == len(active[si] & active[sj])
        assert row["days_i"] == len(active[si])
        assert row["days_j"] == len(active[sj])
    assert got.loc[("daily", "weekend"), "days_both"] == 2
    assert got.loc[("batch", "daily"), "days_both"] == 0


def test_doc_tail_fingerprint_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import tail_fingerprint

    footer = "contact us at footer dot com"  # > 24 chars; tail = last 24
    rows = [  # (source, text)
        ("tmpl", "alpha content one " + footer),
        ("tmpl", "beta content two " + footer),
        ("tmpl", "gamma other " + footer),
        ("tmpl", "something entirely different here"),
        ("free", "one unique ending alpha"),
        ("free", "two unique ending bravo"),
        ("free", "short"),                      # whole text is the tail
        ("free", "short"),                      # same tail twice
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
        tail_fingerprint(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    per = collections.defaultdict(collections.Counter)
    for s, txt in rows:
        per[s][txt[-24:]] += 1
    assert list(got.index) == sorted(per)
    for s, tails in per.items():
        row = got.loc[s]
        nd = sum(tails.values())
        assert row["n_docs"] == nd
        assert row["n_distinct_tails"] == len(tails)
        assert row["modal_tail_docs"] == max(tails.values())
        assert row["modal_permille"] == 1000 * max(tails.values()) // nd
    assert got.loc["tmpl", "modal_tail_docs"] == 3   # the shared footer
    assert got.loc["tmpl", "n_distinct_tails"] == 2
    assert got.loc["free", "modal_tail_docs"] == 2   # "short" twice
    assert got.loc["free", "n_distinct_tails"] == 3


def test_rel_basket_coupling_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import basket_coupling

    g = np.random.default_rng(848)
    prios = ["1-URGENT", "2-HIGH"]
    orders = []  # (okey, prio, totalprice)
    lines = []   # okey repeated nl times
    okey = 0
    # URGENT: wide baskets cost more (v = 100*w + noise)
    for _ in range(25):
        okey += 1
        w = int(g.integers(1, 8))
        orders.append((okey, "1-URGENT", 100.0 * w + float(g.uniform(0, 50))))
        lines += [okey] * w
    # HIGH: value independent of width
    for _ in range(25):
        okey += 1
        w = int(g.integers(1, 8))
        orders.append((okey, "2-HIGH", float(g.uniform(100, 1000))))
        lines += [okey] * w
    # an order with NO lines must be excluded entirely
    okey += 1
    orders.append((okey, "1-URGENT", 9999.0))
    no, nl = len(orders), len(lines)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(
                    np.array([o[0] for o in orders], np.int64)
                ),
                "o_custkey": pa.array(np.ones(no, np.int64)),
                "o_orderstatus": pa.array(["O"] * no),
                "o_totalprice": pa.array(
                    np.array([o[2] for o in orders])
                ),
                "o_orderdate": pa.array(
                    np.full(no, np.datetime64("2026-01-01", "us"))
                ),
                "o_orderpriority": pa.array([o[1] for o in orders]),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.array(lines, np.int64)),
                "l_partkey": pa.array(np.ones(nl, np.int64)),
                "l_suppkey": pa.array(np.ones(nl, np.int64)),
                "l_linenumber": pa.array(np.ones(nl, np.int32)),
                "l_quantity": pa.array(np.ones(nl)),
                "l_extendedprice": pa.array(np.full(nl, 100.0)),
                "l_discount": pa.array(np.zeros(nl)),
                "l_tax": pa.array(np.zeros(nl)),
                "l_returnflag": pa.array(["N"] * nl),
                "l_linestatus": pa.array(["O"] * nl),
                "l_shipdate": pa.array(
                    np.full(nl, np.datetime64("2026-01-01", "us"))
                ),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    widths = collections.Counter(lines)
    want = collections.defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for okey, prio, price in orders:
        if okey not in widths:
            continue
        w = widths[okey]
        v = int(np.floor(price))
        c = want[prio]
        c[0] += 1
        c[1] += w
        c[2] += w * w
        c[3] += v
        c[4] += v * v
        c[5] += w * v

    got = (
        basket_coupling(str(tmp_path))
        .to_pandas()
        .set_index("o_orderpriority")
        .sort_index()
    )
    assert list(got.index) == sorted(want)
    for prio, (n_, sw, sww, sv, svv, swv) in want.items():
        row = got.loc[prio]
        assert row["n_orders"] == n_
        assert row["sum_w"] == sw
        assert row["sum_w_sq"] == sww
        assert row["sum_v"] == sv
        assert row["sum_v_sq"] == svv
        assert row["sum_w_v"] == swv
    # the lineless order contributed nothing
    assert got.loc["1-URGENT", "n_orders"] == 25
