"""Round-4 wave-106 operators: E153 arrival-drift sufficient stats
(planted accelerating/steady feeds — with a pair crossing the ts-window
boundary — pin all six sums), T160 quality-filter co-failure matrix
(planted single- and double-failure docs pin margins and intersections),
R87 fulfillment-latency drift board (planted per-year latencies pin the
sums) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

T0_US = 1704067200 * 1_000_000


def test_events_arrival_drift_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_arrival_drift

    rows = []  # (source, ts_us, event_id)
    eid = 0

    def ev(s, t):
        nonlocal eid
        rows.append((s, t, eid))
        eid += 1

    # "accel": gaps shrink 100s, 50s, 10s
    t = T0_US + 3_600_000_000
    ev("accel", t)
    for gsec in (100, 50, 10):
        t += gsec * 1_000_000
        ev("accel", t)
    # "steady": constant 30s gaps, one pair crossing window_us=60s
    t = T0_US + 10_000_000
    ev("steady", t)
    for _ in range(4):
        t += 30_000_000
        ev("steady", t)
    # "lone": no pairs
    ev("lone", T0_US + 5_000_000)

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
                "value": pa.array(np.ones(n)),
            }
        ),
        tmp_path / "events.parquet",
    )

    got = (
        events_arrival_drift(str(tmp_path), window_us=60_000_000)
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    per = collections.defaultdict(list)
    for s, t, e in rows:
        per[s].append((t, e))
    assert list(got.index) == sorted(per)
    for s, evs in per.items():
        evs.sort()
        ms, gs = [], []
        for a, b in zip(evs, evs[1:]):
            gs.append((b[0] - a[0]) // 1_000_000)
            ms.append((b[0] - T0_US) // 60_000_000)
        row = got.loc[s]
        assert row["n_pairs"] == len(gs)
        assert row["sum_m"] == sum(ms)
        assert row["sum_m_sq"] == sum(x * x for x in ms)
        assert row["sum_gap_s"] == sum(gs)
        assert row["sum_gap_sq"] == sum(x * x for x in gs)
        assert row["sum_m_gap"] == sum(a * b for a, b in zip(ms, gs))
    assert got.loc["lone", "n_pairs"] == 0
    assert got.loc["accel", "sum_gap_s"] == 160
    assert got.loc["steady", "n_pairs"] == 4


def test_doc_quality_cofailure_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import (
        quality_cofailure_matrix,
        quality_margin,
    )

    # reuse the T149 fixture discipline: base passes everything
    base = (
        "alpha the bravo of charlie and delta to echo in foxtrot is "
        "golf the hotel a india of juliet and kilo to lima in mike "
        "is november the oscar a papa"
    ).split(" ")
    assert len(base) == 31
    rows = []
    # eval docs (doc_id < 10) define the contamination shingle set
    for i in range(3):
        rows.append((i, " ".join(f"eval{i}w{j}" for j in range(20)), "en", "ev"))
    # clean passes all
    rows.append((20, " ".join(base), "en", "m"))
    # fails lang only
    rows.append((21, " ".join(base), "fr", "m"))
    # fails band only (10 words, still stopword-rich)
    rows.append((22, "the a of and to in is fox dog bird", "en", "m"))
    # fails lang AND band (short + fr) -> co-failure cell (lang, band)
    rows.append((23, "the a of and petit texte", "fr", "m"))
    # fails contamination only
    cont = base[:22] + ["eval1w0", "eval1w1", "eval1w2"]
    rows.append((24, " ".join(cont), "en", "m"))
    # fails lang AND contamination
    rows.append((25, " ".join(cont), "de", "m"))

    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(
                    np.array([r[0] for r in rows], np.int64)
                ),
                "text": pa.array([r[1] for r in rows]),
                "lang": pa.array([r[2] for r in rows]),
                "source": pa.array([r[3] for r in rows]),
                "n_chars": pa.array(
                    [len(r[1]) for r in rows], pa.int64()
                ),
            }
        ),
        tmp_path / "documents.parquet",
    )

    got = (
        quality_cofailure_matrix(str(tmp_path))
        .to_pandas()
        .set_index(["filter_i", "filter_j"])
        .sort_index()
    )
    assert len(got) == 10
    # margins: lang fails docs 21,23,25 = 3; band fails 22,23 and the
    # 3 eval docs (20 words is inside [20,90] -> eval docs pass band);
    # wait: eval docs have 20 words -> pass. So band fails 22,23 = 2.
    lb = got.loc[("lang", "band")]
    assert lb["n_fail_i"] == 3
    assert lb["n_fail_j"] == 2
    assert lb["n_both"] == 1          # doc 23
    lc = got.loc[("lang", "contam")]
    assert lc["n_both"] == 1          # doc 25
    # contam fails docs 24, 25 AND the 3 eval docs (they trivially
    # share their own shingles with the eval set)
    assert lc["n_fail_j"] == 5
    bc = got.loc[("band", "contam")]
    assert bc["n_both"] == 0
    # reconcile with T149: sole-failure counts must be consistent
    qm = quality_margin(str(tmp_path)).to_pandas().set_index("source")
    assert qm.loc["m", "only_lang"] == 1      # doc 21
    assert qm.loc["m", "only_contam"] == 1    # doc 24


def test_rel_latency_drift_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import latency_drift

    g = np.random.default_rng(845)
    day = 86_400_000_000
    d2024 = np.datetime64("2024-03-01", "us").astype(np.int64)
    d2025 = np.datetime64("2025-03-01", "us").astype(np.int64)
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM"]
    orders = []  # (okey, odate, prio)
    lines = []   # (okey, shipdate)
    okey = 0
    # 2024: URGENT ships fast (2-4 days), MEDIUM slow (20-30)
    # 2025: URGENT degrades (5-9 days) -> drift visible
    for year_base, urgent_rng, med_rng in (
        (d2024, (2, 5), (20, 31)),
        (d2025, (5, 10), (20, 31)),
    ):
        for _ in range(30):
            pr = prios[int(g.integers(0, 3))]
            od = year_base + int(g.integers(0, 200)) * day
            okey += 1
            orders.append((okey, od, pr))
            lo, hi = urgent_rng if pr == "1-URGENT" else med_rng
            for _ in range(int(g.integers(1, 4))):
                lines.append((okey, od + int(g.integers(lo, hi)) * day))
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
                "o_orderpriority": pa.array([o[2] for o in orders]),
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
                "l_linenumber": pa.array(np.ones(nl, np.int32)),
                "l_quantity": pa.array(np.ones(nl)),
                "l_extendedprice": pa.array(np.full(nl, 100.0)),
                "l_discount": pa.array(np.zeros(nl)),
                "l_tax": pa.array(np.zeros(nl)),
                "l_returnflag": pa.array(["N"] * nl),
                "l_linestatus": pa.array(["O"] * nl),
                "l_shipdate": pa.array(
                    np.array([l[1] for l in lines], np.int64)
                ).cast(pa.timestamp("us")),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    odate = {o[0]: o[1] for o in orders}
    oprio = {o[0]: o[2] for o in orders}
    want = collections.defaultdict(lambda: [0, 0, 0])
    for okey, sd in lines:
        yr = int(
            np.int64(sd).astype("datetime64[us]").astype("datetime64[Y]")
            .astype(np.int64)
        ) + 1970
        gap = sd // day - odate[okey] // day
        c = want[(yr, oprio[okey])]
        c[0] += 1
        c[1] += gap
        c[2] += gap * gap

    got = (
        latency_drift(str(tmp_path))
        .to_pandas()
        .set_index(["ship_year", "o_orderpriority"])
        .sort_index()
    )
    assert set(got.index) == set(want)
    for key, (n_, sd_, sdd) in want.items():
        row = got.loc[key]
        assert row["n_lines"] == n_
        assert row["sum_days"] == sd_
        assert row["sum_days_sq"] == sdd
    # the drift read: URGENT mean latency strictly worse in 2025
    u24 = got.loc[(2024, "1-URGENT")]
    u25 = got.loc[(2025, "1-URGENT")]
    assert u25["sum_days"] * u24["n_lines"] > u24["sum_days"] * u25["n_lines"]
