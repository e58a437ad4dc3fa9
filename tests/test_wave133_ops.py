"""Round-4 wave-133 operators: E180 value-band transition matrix
(planted tariff switches and refunds-chasing-charges pin the cells),
T187/F tape frame-band matrix (planted framed vs free sequences pin the
corners), R114 segment weekday matrix (planted weekday/weekend split
businesses pin the wheel) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _band(cents):
    if cents < 0:
        return -1
    if cents == 0:
        return 0
    return len(bin(cents)) - 2


def test_events_value_band_markov_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_value_band_markov

    base = np.datetime64("2026-07-01", "us").astype(np.int64)
    rows = []  # (source, ts_us, value)
    eid = 0

    def ev(s, t, v):
        nonlocal eid
        rows.append((s, t, eid, v))
        eid += 1

    # "tariff": stable small band, one big charge, refund follows it —
    # the last pair crossing the 60s window boundary
    t = base
    for v in (1.0, 1.27, 0.8):
        ev("tariff", t, v)
        t += 20_000_000
    ev("tariff", t, 500.0)           # big charge at t=60s (new window)
    t += 20_000_000
    ev("tariff", t, -500.0)          # refund chases it
    # "zero": zeros interleaved with positives
    ev("zero", base, 0.0)
    ev("zero", base + 1_000_000, 3.0)
    ev("zero", base + 2_000_000, 0.0)
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
        events_value_band_markov(str(tmp_path), window_us=60_000_000)
        .to_pandas()
        .set_index(["source", "from_band", "to_band"])
        .sort_index()
    )
    per = collections.defaultdict(list)
    for s, t_, e, v in rows:
        per[s].append((t_, e, _band(int(np.rint(v * 100)))))
    want = collections.Counter()
    for s, evs in per.items():
        evs.sort()
        for a, b in zip(evs, evs[1:]):
            want[(s, a[2], b[2])] += 1
    assert set(got.index) == set(want)
    for key, cnt in want.items():
        assert got.loc[key, "n_transitions"] == cnt
    big = _band(50000)
    assert got.loc[("tariff", big, -1), "n_transitions"] == 1
    assert got.loc[("zero", 0, _band(300)), "n_transitions"] == 1


def test_tape_frame_bands_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import tape_frame_bands

    rows = [  # (source, tokens)
        ("framed", [1, 500, 600, 2]),     # first band 1, last band 2
        ("framed", [1, 700, 2]),          # same corner
        ("framed", [0, 900, 3]),          # first id 0 -> band 0
        ("free", [123, 456]),             # bands 7, 9
        ("free", [900]),                  # single token: first == last
        ("free", []),                     # excluded
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(
                    [f"{s}-{i:06d}" for i, (s, _) in enumerate(rows)]
                ),
                "tokens": pa.array(
                    [r[1] for r in rows], pa.list_(pa.int32())
                ),
                "n_tok": pa.array(
                    [len(r[1]) for r in rows], pa.int32()
                ),
                "source": pa.array([r[0] for r in rows]),
            }
        ),
        tmp_path / "part-00000.parquet",
    )

    got = (
        tape_frame_bands(str(tmp_path))
        .to_pandas()
        .set_index(["source", "first_band", "last_band"])
        .sort_index()
    )

    def idband(x):
        return 0 if x <= 0 else len(bin(x)) - 2

    want = collections.Counter()
    for s, toks in rows:
        if toks:
            want[(s, idband(toks[0]), idband(toks[-1]))] += 1
    assert set(got.index) == set(want)
    for key, cnt in want.items():
        assert got.loc[key, "n_seqs"] == cnt
    assert got.loc[("framed", 1, 2), "n_seqs"] == 2
    assert got.loc[("framed", 0, 2), "n_seqs"] == 1
    assert got.loc[("free", 10, 10), "n_seqs"] == 1  # 900 both ends


def test_rel_segment_weekday_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import segment_weekday_matrix

    day = 86_400_000_000
    mon = np.datetime64("2026-07-06", "us").astype(np.int64)
    segs = ["BUILDING", "HOUSEHOLD"]
    n_cust = 6
    cust_seg = {k: segs[k % 2] for k in range(1, n_cust + 1)}
    rows = []  # (custkey, odate, price)
    # BUILDING (odd custkeys? k%2==1 -> HOUSEHOLD... map: k=1 -> segs[1]
    # = HOUSEHOLD, k=2 -> BUILDING) — just use the map.
    # weekday business: custs with BUILDING order Mon-Fri
    for k, s in cust_seg.items():
        if s == "BUILDING":
            for d in range(5):
                rows.append((k, mon + d * day, 200.5))
        else:
            for d in (5, 6):
                rows.append((k, mon + d * day, 99.25))
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "o_custkey": pa.array(
                    np.array([r[0] for r in rows], np.int64)
                ),
                "o_orderstatus": pa.array(["O"] * n),
                "o_totalprice": pa.array(
                    np.array([r[2] for r in rows])
                ),
                "o_orderdate": pa.array(
                    np.array([r[1] for r in rows], np.int64)
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(
                    np.arange(1, n_cust + 1, dtype=np.int64)
                ),
                "c_name": pa.array(
                    [f"Customer#{i:09d}" for i in range(1, n_cust + 1)]
                ),
                "c_nationkey": pa.array(np.zeros(n_cust, np.int64)),
                "c_acctbal": pa.array(np.zeros(n_cust)),
                "c_mktsegment": pa.array(
                    [cust_seg[k] for k in range(1, n_cust + 1)]
                ),
            }
        ),
        tmp_path / "customer.parquet",
    )

    want = collections.defaultdict(lambda: [0, 0])
    for ck, od, price in rows:
        dow = (od // day + 3) % 7
        c = want[(cust_seg[ck], dow)]
        c[0] += 1
        c[1] += int(np.floor(price))
    got = (
        segment_weekday_matrix(str(tmp_path))
        .to_pandas()
        .set_index(["c_mktsegment", "order_dow"])
        .sort_index()
    )
    assert set(got.index) == set(want)
    for key, (no, sv) in want.items():
        row = got.loc[key]
        assert row["n_orders"] == no
        assert row["value_floor"] == sv
    assert ("BUILDING", 5) not in got.index   # no weekend BUILDING
    assert ("HOUSEHOLD", 0) not in got.index
