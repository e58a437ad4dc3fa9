"""Round-4 wave-88 operators: E135 timestamp-quantization audit
(planted whole-second/whole-minute producers pin the permilles),
T142/F tape monotonicity audit (planted sorted sequences pin the
ascending counts), R69 order supplier-fragmentation histogram
(planted k-supplier orders pin the bands) — each vs a scalar
brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEC = 1_000_000
MIN = 60 * SEC


def test_events_ts_quantization_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_ts_quantization

    g = np.random.default_rng(730)
    base = np.datetime64("2026-03-02", "us").astype(np.int64)
    et, ts = [], []
    # "batched": all timestamps on whole minutes
    for _ in range(150):
        et.append("batched")
        ts.append(base + int(g.integers(0, 5000)) * MIN)
    # "secondly": whole seconds, never whole minutes
    for _ in range(120):
        s = int(g.integers(0, 300_000))
        if s % 60 == 0:
            s += 1
        et.append("secondly")
        ts.append(base + s * SEC)
    # "stream": microsecond jitter
    for _ in range(400):
        et.append("stream")
        t = base + int(g.integers(0, 10**10))
        if t % SEC == 0:
            t += 7
        et[-1] = "stream"
        ts.append(t)
    n = len(et)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(et),
                "ts": pa.array(np.array(ts, np.int64)).cast(
                    pa.timestamp("us")
                ),
                "value": pa.array(np.ones(n)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.ones(n, np.int64)),
            }
        ),
        tmp_path / "events.parquet",
    )

    want = collections.defaultdict(lambda: [0, 0, 0])
    for s, t in zip(et, ts):
        w = want[s]
        w[0] += 1
        if t % SEC == 0:
            w[1] += 1
        if t % MIN == 0:
            w[2] += 1

    got = events_ts_quantization(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(want)
    for s, w in want.items():
        row = got.loc[s]
        assert row["n_events"] == w[0]
        assert row["n_whole_second"] == w[1]
        assert row["n_whole_minute"] == w[2]
        assert row["second_permille"] == 1000 * w[1] // w[0]
        assert row["minute_permille"] == 1000 * w[2] // w[0]
    assert got.loc["batched", "minute_permille"] == 1000
    assert got.loc["secondly", "minute_permille"] == 0
    assert got.loc["secondly", "second_permille"] == 1000
    assert got.loc["stream", "second_permille"] == 0


def test_f1_monotonicity_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import tape_monotonicity

    g = np.random.default_rng(731)
    rows = []
    # "sorted": fully non-decreasing id lists (table-dump smell)
    for _ in range(25):
        rows.append(
            ("sorted", sorted(int(x) for x in g.integers(0, 999, 15)))
        )
    # "prose": random ids
    for _ in range(60):
        rows.append(
            ("prose", [int(x) for x in g.integers(0, 999, g.integers(2, 30))])
        )
    # trivial: empty and single-token sequences are vacuously sorted
    rows.append(("sorted", []))
    rows.append(("sorted", [7]))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(
                    [f"s00-{i:08d}" for i in range(len(rows))]
                ),
                "tokens": pa.array(
                    [r[1] for r in rows], pa.list_(pa.int32())
                ),
                "n_tok": pa.array(
                    [len(r[1]) for r in rows], pa.int64()
                ),
                "source": pa.array([r[0] for r in rows]),
            }
        ),
        tmp_path / "part-000.parquet",
    )

    want = collections.defaultdict(lambda: [0, 0, 0, 0])
    for s, t in rows:
        w = want[s]
        w[0] += 1
        pairs = max(len(t) - 1, 0)
        asc = sum(1 for a, b in zip(t, t[1:]) if b >= a)
        w[1] += pairs
        w[2] += asc
        if asc == pairs:
            w[3] += 1

    got = tape_monotonicity(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(want)
    for s, w in want.items():
        row = got.loc[s]
        assert row["n_seqs"] == w[0]
        assert row["n_pairs"] == w[1]
        assert row["n_ascending"] == w[2]
        assert row["asc_permille"] == 1000 * w[2] // max(w[1], 1)
        assert row["n_sorted"] == w[3]
    assert got.loc["sorted", "n_sorted"] == 27
    assert got.loc["prose", "n_sorted"] < 5


def test_rel_order_fragmentation_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import order_fragmentation

    g = np.random.default_rng(732)
    ok_col, sk_col, ep, disc = [], [], [], []
    want = collections.defaultdict(lambda: [0, 0, 0])
    for o in range(350):
        ks = int(g.integers(1, 6))
        sups = g.choice(40, size=ks, replace=False)
        nl, rev = 0, 0
        for s in sups:
            for _ in range(int(g.integers(1, 3))):
                e = round(float(g.uniform(100, 4000)), 2)
                d = round(int(g.integers(0, 11)) / 100.0, 2)
                ok_col.append(o)
                sk_col.append(int(s))
                ep.append(e)
                disc.append(d)
                nl += 1
                rev += int(np.floor(e * (1 - d)))
        w = want[ks]
        w[0] += 1
        w[1] += nl
        w[2] += rev
    n = len(ok_col)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(ok_col, pa.int64()),
                "l_partkey": pa.array(np.ones(n, np.int64)),
                "l_suppkey": pa.array(sk_col, pa.int64()),
                "l_quantity": pa.array(np.ones(n)),
                "l_extendedprice": pa.array(ep),
                "l_discount": pa.array(disc),
                "l_tax": pa.array(np.zeros(n)),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    got = order_fragmentation(str(tmp_path)).to_pandas()
    got = got.set_index("n_suppliers").sort_index()
    assert list(got.index) == sorted(want)
    for k, w in want.items():
        row = got.loc[k]
        assert row["n_orders"] == w[0]
        assert row["n_lines"] == w[1]
        assert row["revenue"] == w[2]
