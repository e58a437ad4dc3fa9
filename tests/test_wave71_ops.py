"""Round-4 wave-71 operators: E118 audience-concentration board (a
planted one-bot source pins max_user/top_permille; a uniform source
pins sum_cc), T125 repeat-distance quantiles (planted fixed-wavelength
echoes pin the gap quantiles), R52 part supplier-competition histogram
(planted per-part supplier counts incl. a zero-supplier tail) — each vs
a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_audience_conc_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_audience_conc

    g = np.random.default_rng(560)
    base = np.datetime64("2026-03-01", "us").astype(np.int64)
    et, uid = [], []
    # "bot": user 7 emits 50 events, users 8/9 one each
    et += ["bot"] * 52
    uid += [7] * 50 + [8, 9]
    # "broad": 20 users x 3 events each
    for u in range(20):
        et += ["broad"] * 3
        uid += [100 + u] * 3
    # random bulk source
    for _ in range(500):
        et.append("rand")
        uid.append(int(g.integers(0, 40)))
    n = len(et)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(et),
                "ts": pa.array(
                    base + np.arange(n, dtype=np.int64) * 1_000
                ).cast(pa.timestamp("us")),
                "value": pa.array(np.ones(n)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.array(uid, np.int64)),
            }
        ),
        tmp_path / "events.parquet",
    )

    per = collections.defaultdict(collections.Counter)
    for s, u in zip(et, uid):
        per[s][u] += 1
    got = events_audience_conc(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(per)
    for s, cnt in per.items():
        row = got.loc[s]
        ne = sum(cnt.values())
        mx = max(cnt.values())
        assert row["n_events"] == ne
        assert row["n_users"] == len(cnt)
        assert row["sum_cc"] == sum(c * (c - 1) for c in cnt.values())
        assert row["max_user"] == mx
        assert row["top_permille"] == 1000 * mx // ne
    # planted invariants
    assert got.loc["bot", "top_permille"] == 1000 * 50 // 52
    assert got.loc["broad", "sum_cc"] == 20 * 3 * 2


def test_doc_repeat_gaps_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import repeat_gaps

    g = np.random.default_rng(561)
    vocab = [f"w{i}" for i in range(12)]
    texts, srcs = [], []
    # planted: "echo" repeats at fixed wavelength 4 (3 gaps of 4)
    texts.append("echo p q r echo p q r echo p q r echo")
    srcs.append("a")
    # planted: pure stutter doc -> gaps of exactly 1
    texts.append("dup dup dup dup")
    srcs.append("b")
    for i in range(150):
        texts.append(" ".join(g.choice(vocab, int(g.integers(4, 30)))))
        srcs.append("a" if i % 3 else "b")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(srcs),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    gaps = collections.defaultdict(list)
    for t, s in zip(texts, srcs):
        last = {}
        for i, w in enumerate(t.split(" ")):
            if w in last:
                gaps[s].append(i - last[w])
            last[w] = i
    got = repeat_gaps(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(set(srcs))
    for s in set(srcs):
        gv = sorted(gaps[s])
        row = got.loc[s]
        assert row["n_gaps"] == len(gv)
        assert row["max_gap"] == gv[-1]
        for col, q in (("p50", 500), ("p90", 900)):
            thr = (len(gv) * q + 999) // 1000
            assert row[col] == gv[thr - 1]


def test_doc_repeat_gaps_empty_source(ray_session, tmp_path):
    """A repeat-free source still gets its dense zero row."""
    from mq_to_db_ray.pipelines.training_data import repeat_gaps

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["a b c", "x x y"]),
                "lang": pa.array(["en", "en"]),
                "source": pa.array(["clean", "dirty"]),
                "n_chars": pa.array([5, 5], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = repeat_gaps(str(tmp_path)).to_pandas().set_index("source")
    assert got.loc["clean"].tolist() == [0, 0, 0, 0]
    assert got.loc["dirty"].tolist() == [1, 1, 1, 1]


def test_rel_part_competition_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import part_competition

    g = np.random.default_rng(562)
    n_parts = 100
    retail = np.round(g.uniform(900, 2000, n_parts), 2)
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(
                    np.arange(1, n_parts + 1, dtype=np.int64)
                ),
                "p_name": pa.array([f"part {i}" for i in range(n_parts)]),
                "p_brand": pa.array(["Brand#10"] * n_parts),
                "p_type": pa.array(["STANDARD"] * n_parts),
                "p_size": pa.array(np.ones(n_parts, np.int64)),
                "p_retailprice": pa.array(retail),
            }
        ),
        tmp_path / "part.parquet",
    )
    # part i (1-based) is served by exactly i % 5 suppliers (so 20
    # parts have zero); duplicate lines must not inflate the count
    lk, ls = [], []
    for i in range(1, n_parts + 1):
        for s in range(i % 5):
            for _ in range(1 + int(g.integers(0, 3))):
                lk.append(i)
                ls.append(1000 + s)
    order = g.permutation(len(lk))
    lk = np.array(lk, np.int64)[order]
    ls = np.array(ls, np.int64)[order]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(len(lk), dtype=np.int64)),
                "l_partkey": pa.array(lk),
                "l_suppkey": pa.array(ls),
                "l_quantity": pa.array(np.ones(len(lk))),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    want = collections.defaultdict(lambda: [0, 0])
    for i in range(1, n_parts + 1):
        ns = i % 5
        want[ns][0] += 1
        want[ns][1] += int(np.floor(retail[i - 1]))
    got = part_competition(str(tmp_path)).to_pandas()
    got = got.set_index("n_suppliers").sort_index()
    assert list(got.index) == sorted(want)
    for ns, (np_, val) in want.items():
        assert got.loc[ns, "n_parts"] == np_
        assert got.loc[ns, "catalog_value"] == val
    assert got.loc[0, "n_parts"] == 20
