"""Round-4 wave-77 operators: E124 exclusive-audience board (planted
single-source and multi-source users pin exclusivity), T131 modal-word
board (planted dominant word + a count tie pins the lexicographic tie
rule), R58 brand supplier-dependency (planted single-supplier-dominant
brand pins the argmax and its tie rule) — each vs a scalar brute-force
reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_exclusive_audience_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_exclusive_audience

    g = np.random.default_rng(620)
    base = np.datetime64("2026-03-01", "us").astype(np.int64)
    et, uid = [], []
    # users 1..10 ONLY in "niche"; users 100..120 in both
    for u in range(1, 11):
        for _ in range(3):
            et.append("niche")
            uid.append(u)
    for u in range(100, 121):
        et.append("niche")
        uid.append(u)
        et.append("portal")
        uid.append(u)
    for _ in range(400):
        et.append(str(g.choice(["portal", "misc"])))
        uid.append(int(g.integers(200, 240)))
    n = len(et)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(et),
                "ts": pa.array(
                    base + np.arange(n, dtype=np.int64) * 1000
                ).cast(pa.timestamp("us")),
                "value": pa.array(np.ones(n)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.array(uid, np.int64)),
            }
        ),
        tmp_path / "events.parquet",
    )

    srcs_of = collections.defaultdict(set)
    for s, u in zip(et, uid):
        srcs_of[u].add(s)
    want = collections.defaultdict(lambda: [0, 0])
    for u, ss in srcs_of.items():
        for s in ss:
            want[s][0] += 1
            if len(ss) == 1:
                want[s][1] += 1
    got = events_exclusive_audience(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(want)
    for s, (nu, nx) in want.items():
        row = got.loc[s]
        assert row["n_users"] == nu
        assert row["n_exclusive"] == nx
        assert row["exclusive_permille"] == 1000 * nx // nu
    assert got.loc["niche", "n_exclusive"] == 10


def test_doc_modal_word_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import modal_word

    g = np.random.default_rng(621)
    texts, srcs = [], []
    # "boiler": word "chrome" dominates
    for _ in range(30):
        texts.append("chrome chrome chrome " + " ".join(
            g.choice(["x", "y", "z"], 3)
        ))
        srcs.append("boiler")
    # "tie": words "aa" and "bb" appear exactly equally -> "aa" wins
    texts.append("aa bb aa bb")
    srcs.append("tie")
    texts.append("bb aa")
    srcs.append("tie")
    for i in range(100):
        texts.append(" ".join(g.choice(["p", "q", "r", "s"], 8)))
        srcs.append("bulk")
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

    cnt = collections.defaultdict(collections.Counter)
    for t, s in zip(texts, srcs):
        cnt[s].update(t.split(" "))
    got = modal_word(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(cnt)
    for s, c in cnt.items():
        tot = sum(c.values())
        best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        row = got.loc[s]
        assert row["n_tokens"] == tot
        assert row["top_word"] == best[0]
        assert row["top_count"] == best[1]
        assert row["top_permille"] == 1000 * best[1] // tot
    assert got.loc["tie", "top_word"] == "aa"
    assert got.loc["boiler", "top_word"] == "chrome"


def test_rel_brand_dependency_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import brand_dependency

    g = np.random.default_rng(622)
    n_parts = 60
    brands = [f"Brand#{30 + i % 2}" for i in range(n_parts)]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(
                    np.arange(1, n_parts + 1, dtype=np.int64)
                ),
                "p_name": pa.array([f"p{i}" for i in range(n_parts)]),
                "p_brand": pa.array(brands),
                "p_type": pa.array(["STD"] * n_parts),
                "p_size": pa.array(np.ones(n_parts, np.int64)),
                "p_retailprice": pa.array(np.ones(n_parts)),
            }
        ),
        tmp_path / "part.parquet",
    )
    # Brand#30 parts (odd index): supplier 7 dominates; Brand#31: spread
    lk, ls = [], []
    for i in range(1, n_parts + 1):
        b = 30 + (i - 1) % 2
        for _ in range(4):
            lk.append(i)
            if b == 30:
                ls.append(7 if g.random() < 0.8 else int(g.integers(1, 6)))
            else:
                ls.append(int(g.integers(1, 12)))
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(len(lk), dtype=np.int64)),
                "l_partkey": pa.array(np.array(lk, np.int64)),
                "l_suppkey": pa.array(np.array(ls, np.int64)),
                "l_quantity": pa.array(np.ones(len(lk))),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    per = collections.defaultdict(collections.Counter)
    for k, s in zip(lk, ls):
        per[brands[k - 1]][s] += 1
    got = brand_dependency(str(tmp_path)).to_pandas()
    got = got.set_index("brand").sort_index()
    assert list(got.index) == sorted(per)
    for b, c in per.items():
        nl = sum(c.values())
        best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        row = got.loc[b]
        assert row["n_lines"] == nl
        assert row["n_suppliers"] == len(c)
        assert row["top_lines"] == best[1]
        assert row["top_permille"] == 1000 * best[1] // nl
