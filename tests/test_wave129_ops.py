"""Round-4 wave-129 operators: E176 outage drill-down (planted silences
— the longest crossing the ts-window boundary, plus a gap tie resolved
to the earliest — pin the retrieved rows), T183 length-mode board
(planted fixed-width forms pin the modal spikes), R110 slowest-shipment
drill-down (planted laggards with a tie at the cut pin the top-5) —
each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_outage_drilldown_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_outage_drilldown

    base = np.datetime64("2026-07-01", "us").astype(np.int64)
    rows = []  # (source, ts_us)

    # "feed": gaps 10s, 300s (the outage, crossing the 60s window), 5s
    t = base
    for gap_s in (0, 10, 300, 5):
        t += gap_s * 1_000_000
        rows.append(("feed", t))
    # "tied": two 30s gaps -> earliest wins
    t = base
    rows.append(("tied", t))
    t += 30_000_000
    rows.append(("tied", t))
    t += 1_000_000
    rows.append(("tied", t))
    t += 30_000_000
    rows.append(("tied", t))
    # "lone": single event -> zero gap at itself
    rows.append(("lone", base + 123_000_000))
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
        events_outage_drilldown(str(tmp_path), window_us=60_000_000)
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    per = collections.defaultdict(list)
    for s, t_ in rows:
        per[s].append(t_)
    for s, ts in per.items():
        ts.sort()
        if len(ts) == 1:
            want = (0, ts[0], ts[0])
        else:
            best = max(
                ((b - a, a, b) for a, b in zip(ts, ts[1:])),
                key=lambda x: (x[0], -x[1]),
            )
            want = (best[0] // 1_000_000, best[1], best[2])
        row = got.loc[s]
        assert row["gap_s"] == want[0]
        assert row["silence_start_ts"].value // 1000 == want[1]
        assert row["silence_end_ts"].value // 1000 == want[2]
    assert got.loc["feed", "gap_s"] == 300
    assert got.loc["tied", "gap_s"] == 30
    # earliest of the two 30s gaps
    assert got.loc["tied", "silence_start_ts"].value // 1000 == base
    assert got.loc["lone", "gap_s"] == 0


def test_doc_length_mode_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import length_mode

    rows = []  # (source, n_chars)
    # "forms": 12 docs at exactly 240 chars + scattered others
    rows += [("forms", 240)] * 12
    rows += [("forms", 100), ("forms", 150), ("forms", 300)]
    # "tiejam": lengths 50 and 70 both appear 4x -> smallest wins
    rows += [("tiejam", 70)] * 4 + [("tiejam", 50)] * 4
    rows += [("tiejam", 90)]
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(["x" * r[1] for r in rows]),
                "lang": pa.array(["en"] * n),
                "source": pa.array([r[0] for r in rows]),
                "n_chars": pa.array(
                    np.array([r[1] for r in rows], np.int64)
                ),
            }
        ),
        tmp_path / "documents.parquet",
    )

    got = (
        length_mode(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    f = got.loc["forms"]
    assert f["n_docs"] == 15
    assert f["modal_length"] == 240
    assert f["modal_count"] == 12
    assert f["modal_permille"] == 1000 * 12 // 15
    t = got.loc["tiejam"]
    assert t["modal_length"] == 50   # tie resolves to the smaller
    assert t["modal_count"] == 4


def test_rel_latency_drilldown_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import latency_drilldown

    day = 86_400_000_000
    d0 = np.datetime64("2026-01-05", "us").astype(np.int64)
    orders = []  # (okey, odate)
    lines = []   # (okey, lineno, shipdate)
    # laggards: gaps 90, 80, 70 days
    for okey, gap in ((1, 90), (2, 80), (3, 70)):
        orders.append((okey, d0))
        lines.append((okey, 1, d0 + gap * day))
    # tie at the cut: three lines at gap 50 -> lowest (okey, lineno) win
    # the remaining 2 slots
    orders.append((10, d0))
    lines.append((10, 1, d0 + 50 * day))
    lines.append((10, 2, d0 + 50 * day))
    orders.append((11, d0))
    lines.append((11, 1, d0 + 50 * day))
    # fast noise
    for okey in range(20, 40):
        orders.append((okey, d0))
        lines.append((okey, 1, d0 + 3 * day))
    no, nl = len(orders), len(lines)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(
                    np.array([o[0] for o in orders], np.int64)
                ),
                "o_custkey": pa.array(np.ones(no, np.int64)),
                "o_orderstatus": pa.array(["O"] * no),
                "o_totalprice": pa.array(np.full(no, 100.0)),
                "o_orderdate": pa.array(
                    np.array([o[1] for o in orders], np.int64)
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * no),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(
                    np.array([l[0] for l in lines], np.int64)
                ),
                "l_partkey": pa.array(np.ones(nl, np.int64)),
                "l_suppkey": pa.array(np.ones(nl, np.int64)),
                "l_linenumber": pa.array(
                    np.array([l[1] for l in lines], np.int32)
                ),
                "l_quantity": pa.array(np.ones(nl)),
                "l_extendedprice": pa.array(np.full(nl, 100.0)),
                "l_discount": pa.array(np.zeros(nl)),
                "l_tax": pa.array(np.zeros(nl)),
                "l_returnflag": pa.array(["N"] * nl),
                "l_linestatus": pa.array(["O"] * nl),
                "l_shipdate": pa.array(
                    np.array([l[2] for l in lines], np.int64)
                ).cast(pa.timestamp("us")),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    odate = dict(orders)
    ranked = sorted(
        (
            (sd // day - odate[ok] // day, ok, ln)
            for ok, ln, sd in lines
        ),
        key=lambda x: (-x[0], x[1], x[2]),
    )[:5]

    got = latency_drilldown(str(tmp_path)).to_pandas()
    assert len(got) == 5
    got_keys = list(
        zip(got["gap_days"], got["o_orderkey"], got["l_linenumber"])
    )
    assert sorted(got_keys, key=lambda x: (-x[0], x[1], x[2])) == ranked
    assert (10, 1) in {(k, l) for _, k, l in ranked}
    assert (10, 2) in {(k, l) for _, k, l in ranked}
    assert (11, 1) not in {(k, l) for _, k, l in ranked}
