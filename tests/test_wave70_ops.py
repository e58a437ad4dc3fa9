"""Round-4 wave-70 operators: E117 burstiness sufficient stats (planted
constant-rate source pins Fano numerator to zero; silent minutes enter
the span but not the sums), T124 hapax-legomena board (planted singleton
and doubleton vocabulary pins the counts), R51 dead-stock board (planted
never-ordered parts pin the value) — each vs a scalar brute-force
reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_burstiness_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_burstiness

    g = np.random.default_rng(550)
    base = np.datetime64("2026-03-01", "us").astype(np.int64)
    et, ts = [], []
    # "steady": exactly 3/minute for 60 minutes -> sum_sq = 60*9,
    # max 3, active 60 == span 60
    for m in range(60):
        for j in range(3):
            et.append("steady")
            ts.append(base + m * 60_000_000 + j * 7)
    # "spiky": 1 event at minute 0, 10 at minute 99 -> span 100,
    # active 2, sum_sq 101, max 10
    et.append("spiky")
    ts.append(base)
    for j in range(10):
        et.append("spiky")
        ts.append(base + 99 * 60_000_000 + j)
    # random bulk source
    for _ in range(700):
        et.append("rand")
        ts.append(
            base
            + int(g.integers(0, 240)) * 60_000_000
            + int(g.integers(0, 60_000_000))
        )
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(et),
                "ts": pa.array(np.array(ts, np.int64)).cast(
                    pa.timestamp("us")
                ),
                "value": pa.array(np.ones(len(et))),
                "event_id": pa.array(np.arange(len(et), dtype=np.int64)),
                "user_id": pa.array(np.ones(len(et), np.int64)),
            }
        ),
        tmp_path / "events.parquet",
    )

    per = collections.defaultdict(collections.Counter)
    for s, t in zip(et, ts):
        per[s][int(t) // 60_000_000] += 1
    got = events_burstiness(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(per)
    for s, cnt in per.items():
        lo, hi = min(cnt), max(cnt)
        row = got.loc[s]
        assert row["n_minutes"] == hi - lo + 1
        assert row["active_minutes"] == len(cnt)
        assert row["n_events"] == sum(cnt.values())
        assert row["sum_sq"] == sum(v * v for v in cnt.values())
        assert row["max_minute"] == max(cnt.values())
    # planted invariants
    assert got.loc["steady", "sum_sq"] == 60 * 9
    assert got.loc["spiky", "n_minutes"] == 100
    assert got.loc["spiky", "active_minutes"] == 2
    assert got.loc["spiky", "sum_sq"] == 101


def test_doc_hapax_board_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import hapax_board

    g = np.random.default_rng(551)
    vocab = [f"w{i}" for i in range(40)]
    texts, srcs = [], []
    # planted: "unicorn" appears exactly once (src a);
    # "gryphon" exactly twice, both in src b
    texts.append("unicorn " + " ".join(g.choice(vocab, 5)))
    srcs.append("a")
    texts.append("gryphon gryphon " + " ".join(g.choice(vocab, 3)))
    srcs.append("b")
    for i in range(200):
        texts.append(" ".join(g.choice(vocab, int(g.integers(3, 12)))))
        srcs.append("a" if i % 3 else "b")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(srcs),
                "n_chars": pa.array(
                    [len(t) for t in texts], pa.int64()
                ),
            }
        ),
        tmp_path / "documents.parquet",
    )

    tot = collections.Counter()
    per_src_types = collections.defaultdict(set)
    for t, s in zip(texts, srcs):
        for w in t.split(" "):
            tot[w] += 1
            per_src_types[s].add(w)
    got = hapax_board(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(per_src_types)
    for s, types in per_src_types.items():
        nh = sum(1 for w in types if tot[w] == 1)
        nd = sum(1 for w in types if tot[w] == 2)
        row = got.loc[s]
        assert row["n_types"] == len(types)
        assert row["n_hapax"] == nh
        assert row["n_dis"] == nd
        assert row["hapax_permille"] == 1000 * nh // len(types)
    # planted: unicorn is a hapax of a; gryphon a dis of b
    assert got.loc["a", "n_hapax"] >= 1
    assert got.loc["b", "n_dis"] >= 1


def test_rel_dead_stock_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import dead_stock

    g = np.random.default_rng(552)
    n_parts = 120
    brands = [f"Brand#{10 + i % 4}" for i in range(n_parts)]
    retail = np.round(g.uniform(900, 2000, n_parts), 2)
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(
                    np.arange(1, n_parts + 1, dtype=np.int64)
                ),
                "p_name": pa.array([f"part {i}" for i in range(n_parts)]),
                "p_brand": pa.array(brands),
                "p_type": pa.array(["STANDARD"] * n_parts),
                "p_size": pa.array(np.ones(n_parts, np.int64)),
                "p_retailprice": pa.array(retail),
            }
        ),
        tmp_path / "part.parquet",
    )
    # order only partkeys 1..80 (each at least once); 81..120 are dead
    ordered = np.concatenate(
        [np.arange(1, 81), g.integers(1, 81, 420)]
    ).astype(np.int64)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(
                    np.arange(len(ordered), dtype=np.int64)
                ),
                "l_partkey": pa.array(ordered),
                "l_suppkey": pa.array(np.ones(len(ordered), np.int64)),
                "l_quantity": pa.array(np.ones(len(ordered))),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    live = set(ordered.tolist())
    want = collections.defaultdict(lambda: [0, 0, 0])
    for i in range(n_parts):
        b = brands[i]
        want[b][0] += 1
        if (i + 1) not in live:
            want[b][1] += 1
            want[b][2] += int(np.floor(retail[i]))
    got = dead_stock(str(tmp_path)).to_pandas()
    got = got.set_index("brand").sort_index()
    assert list(got.index) == sorted(want)
    for b, (np_, nd, dv) in want.items():
        row = got.loc[b]
        assert row["n_parts"] == np_
        assert row["n_dead"] == nd
        assert row["dead_value"] == dv
        assert row["dead_permille"] == 1000 * nd // np_
    assert int(got["n_dead"].sum()) == 40
