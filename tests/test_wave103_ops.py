"""Round-4 wave-103 operators: E150 id-space interleaving audit
(planted block vs interleaved id allocations — with a run crossing the
id-window boundary — pin run counts), T157/F tape delta-compressibility
spectrum (planted jump sizes pin every signed band), R84 line-sequence
integrity audit (planted dense/dup/gap/offset orders pin each class) —
each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_id_interleaving_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_id_interleaving

    base = np.datetime64("2026-07-01", "us").astype(np.int64)
    rows = []  # (source, event_id)

    # block allocation: "blocky" owns ids 0..9 and 20..29 (2 runs),
    # with the 20..29 block CROSSING the window_ids=16 boundary
    for i in list(range(10)) + list(range(20, 30)):
        rows.append(("blocky", i))
    # interleaved: "inter" and "leaved" alternate ids 40..59 (10 runs each)
    for i in range(40, 60):
        rows.append(("inter" if i % 2 == 0 else "leaved", i))
    # singleton id 10..11 wedge between blocky's blocks
    rows.append(("inter", 10))
    rows.append(("leaved", 11))

    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows]),
                "ts": pa.array(
                    base + np.arange(n, dtype=np.int64) * 1000
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
        events_id_interleaving(str(tmp_path), window_ids=16)
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    seq = sorted(rows, key=lambda r: r[1])
    runs = collections.Counter()
    events = collections.Counter()
    prev = None
    for s, _ in seq:
        events[s] += 1
        if s != prev:
            runs[s] += 1
        prev = s
    assert list(got.index) == sorted(events)
    for s in events:
        row = got.loc[s]
        assert row["n_events"] == events[s]
        assert row["n_runs"] == runs[s]
        assert row["runs_permille"] == 1000 * runs[s] // events[s]
    # blocky: ids 0..9 (run), then inter/leaved wedge, then 20..29 (run
    # crossing the window edge exactly once -> still ONE run)
    assert got.loc["blocky", "n_runs"] == 2
    assert got.loc["inter", "n_runs"] == 11   # wedge + 10 alternations
    assert got.loc["leaved", "n_runs"] == 11


def test_tape_delta_spectrum_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import tape_delta_spectrum

    rows = [  # (source, tokens)
        ("s1", [100, 101, 99, 99]),          # +1 (band 1), -2 (band -1), 0
        ("s1", [5, 5, 5]),                    # 0, 0
        ("s2", [1, 1001, 1]),                 # +1000(4), -1000(4)
        ("s2", [7]),                          # no pairs
        ("s2", []),                           # no pairs
        ("s3", [2, 12, 112, 1112, 11112]),    # +10(2), +100(3), +1000(4), +10000(5)
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
        tape_delta_spectrum(str(tmp_path))
        .to_pandas()
        .set_index(["source", "delta_band"])
        .sort_index()
    )
    want = collections.Counter()
    for s, toks in rows:
        for a, b in zip(toks, toks[1:]):
            d = b - a
            band = 0 if d == 0 else (1 if d > 0 else -1) * len(str(abs(d)))
            want[(s, band)] += 1
    assert set(got.index) == set(want)
    for key, cnt in want.items():
        assert got.loc[key, "n_pairs"] == cnt
    assert got.loc[("s1", 0), "n_pairs"] == 3   # 99->99 and 5->5->5
    assert got.loc[("s2", 4), "n_pairs"] == 1   # +1000
    assert got.loc[("s2", -4), "n_pairs"] == 1  # -1000
    assert got.loc[("s3", 5), "n_pairs"] == 1   # +10000


def test_rel_line_sequence_audit_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import line_sequence_audit

    ok, ln = [], []
    # 5 dense orders 1..n (OK)
    for okey, n_ in ((1, 1), (2, 3), (3, 4), (4, 2), (5, 7)):
        for i in range(1, n_ + 1):
            ok.append(okey)
            ln.append(i)
    # dup order: linenumber 2 repeats
    for i in (1, 2, 2, 3):
        ok.append(10)
        ln.append(i)
    # gap order: 1,2,4 (distinct, max != count)
    for i in (1, 2, 4):
        ok.append(11)
        ln.append(i)
    # offset order: 2,3,4 (distinct, dense but min != 1 -> gap class)
    for i in (2, 3, 4):
        ok.append(12)
        ln.append(i)
    n = len(ok)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.array(ok, np.int64)),
                "l_partkey": pa.array(np.ones(n, np.int64)),
                "l_suppkey": pa.array(np.ones(n, np.int64)),
                "l_linenumber": pa.array(np.array(ln, np.int32)),
                "l_quantity": pa.array(np.ones(n)),
                "l_extendedprice": pa.array(np.full(n, 100.0)),
                "l_discount": pa.array(np.zeros(n)),
                "l_tax": pa.array(np.zeros(n)),
                "l_returnflag": pa.array(["N"] * n),
                "l_linestatus": pa.array(["O"] * n),
                "l_shipdate": pa.array(
                    np.full(n, np.datetime64("2026-01-01", "us"))
                ),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    got = line_sequence_audit(str(tmp_path)).to_pandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert row["n_orders"] == 8
    assert row["n_lines"] == n
    assert row["ok_orders"] == 5
    assert row["dup_orders"] == 1
    assert row["gap_orders"] == 2   # the 1,2,4 order and the 2,3,4 order
    assert row["max_linenumber"] == 7
