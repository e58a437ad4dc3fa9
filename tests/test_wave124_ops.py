"""Round-4 wave-124 operators: E171 watermark-lag spectrum (planted
late arrivals — including one whose watermark was set several id-windows
earlier — pin every band), T178 word-suffix spectrum (planted
morphology pins the suffix cells), R105 return-seasonality profile
(planted January spike pins the wheel) — each vs a scalar brute-force
reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_watermark_lag_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_watermark_lag

    base = np.datetime64("2026-07-01", "us").astype(np.int64)
    rows = []  # (source, event_id, ts_us)

    # "feed": ids 0..4 in window 0 (window_ids=4 -> ids 0..3 / 4..7 ...)
    # id 0: ts base        (on time, sets watermark)
    # id 1: ts base+100s   (on time, watermark -> base+100s)
    # id 2: ts base+40s    (late by 60s  -> band len(bin(60))=6)
    # id 3: ts base+99s    (late by 1s   -> band 1)
    # id 9 (window 2): ts base+10s (late by 90s vs watermark base+100s
    #     set in window 0 — exercises the cross-window prefix carry;
    #     band len(bin(90)) = 7)
    # id 10: ts base+200s  (on time)
    # id 11: ts base+200s  (equal to watermark -> on time)
    rows += [
        ("feed", 0, base),
        ("feed", 1, base + 100_000_000),
        ("feed", 2, base + 40_000_000),
        ("feed", 3, base + 99_000_000),
        ("feed", 9, base + 10_000_000),
        ("feed", 10, base + 200_000_000),
        ("feed", 11, base + 200_000_000),
    ]
    # "clean": strictly increasing -> all on time
    for i in range(6):
        rows.append(("clean", i, base + i * 1_000_000))

    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows]),
                "ts": pa.array(
                    np.array([r[2] for r in rows], np.int64)
                ).cast(pa.timestamp("us")),
                "event_id": pa.array(
                    np.array([r[1] for r in rows], np.int64)
                ),
                "user_id": pa.array(np.zeros(n, np.int64)),
                "value": pa.array(np.ones(n)),
            }
        ),
        tmp_path / "events.parquet",
    )

    got = (
        events_watermark_lag(str(tmp_path), window_ids=4)
        .to_pandas()
        .set_index(["source", "lag_band"])
        .sort_index()
    )
    per = collections.defaultdict(list)
    for s, i, t in rows:
        per[s].append((i, t))
    want = collections.Counter()
    for s, evs in per.items():
        evs.sort()
        wm = None
        for _, t in evs:
            if wm is None or t >= wm:
                want[(s, -1)] += 1
            else:
                lag_s = max((wm - t) // 1_000_000, 1)
                want[(s, len(bin(lag_s)) - 2)] += 1
            wm = t if wm is None else max(wm, t)
    assert set(got.index) == set(want)
    for key, cnt in want.items():
        assert got.loc[key, "n_events"] == cnt
    assert got.loc[("feed", 6), "n_events"] == 1   # the 60s late event
    assert got.loc[("feed", 7), "n_events"] == 1   # cross-window 90s late
    assert got.loc[("feed", 1), "n_events"] == 1   # the 1s late event
    assert got.loc[("clean", -1), "n_events"] == 6


def test_doc_word_suffixes_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import word_suffix_spectrum

    texts = [
        "running jumping eating the cat cats runs",
        "walked jumped running a ox",
        "running o",
    ]
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * n),
                "source": pa.array(["s"] * n),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    tf = collections.Counter()
    for t in texts:
        tf.update(t.split(" "))
    want = collections.defaultdict(lambda: [0, 0])
    for w, f in tf.items():
        suf = w[-2:]
        want[suf][0] += 1
        want[suf][1] += f

    got = (
        word_suffix_spectrum(str(tmp_path))
        .to_pandas()
        .set_index("suffix")
        .sort_index()
    )
    assert sorted(got.index) == sorted(want)
    for suf, (nw, occ) in want.items():
        row = got.loc[suf]
        assert row["n_words"] == nw
        assert row["n_occurrences"] == occ
    # -ng carries running(3) + jumping + eating
    assert got.loc["ng", "n_occurrences"] == 3 + 1 + 1
    assert got.loc["ng", "n_words"] == 3
    assert got.loc["o", "n_words"] == 1    # the 1-char word groups whole
    assert got.loc["ed", "n_words"] == 2


def test_rel_return_seasonality_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import return_seasonality

    g = np.random.default_rng(863)
    dates, rf, ep, dc = [], [], [], []
    # January (post-holiday): 40 lines, 20 returned — across two years
    for yr in (2025, 2026):
        for i in range(20):
            dates.append(np.datetime64(f"{yr}-01-{(i % 27) + 1:02d}", "us"))
            rf.append("R" if i < 10 else "N")
            ep.append(float(g.uniform(100, 500)))
            dc.append(0.02)
    # June: 30 lines, 1 returned
    for i in range(30):
        dates.append(np.datetime64(f"2025-06-{(i % 27) + 1:02d}", "us"))
        rf.append("R" if i == 0 else "N")
        ep.append(float(g.uniform(100, 500)))
        dc.append(0.0)
    n = len(dates)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(n, dtype=np.int64)),
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
                    np.array(dates, dtype="datetime64[us]")
                ),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    want = collections.defaultdict(lambda: [0, 0, 0])
    for d, f, e, disc in zip(dates, rf, ep, dc):
        mo = int(str(d)[5:7])
        c = want[mo]
        c[0] += 1
        if f == "R":
            c[1] += 1
            c[2] += int(np.floor(e * (1.0 - disc)))

    got = (
        return_seasonality(str(tmp_path))
        .to_pandas()
        .set_index("ship_month")
        .sort_index()
    )
    assert sorted(got.index) == sorted(want)
    for mo, (nl, nr, rr) in want.items():
        row = got.loc[mo]
        assert row["n_lines"] == nl
        assert row["n_returned"] == nr
        assert row["return_permille"] == 1000 * nr // nl
        assert row["returned_rev_floor"] == rr
    assert got.loc[1, "return_permille"] == 500   # the January spike
    assert got.loc[6, "return_permille"] == 33
