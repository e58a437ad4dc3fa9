"""Round-4 wave-95 operators: E142 per-source weekly audience retention
(a planted every-week regular and a planted one-week tourist pin the
permilles), T149 quality-margin board (planted docs failing exactly one
fused predicate pin each sole-failure column), R76 priority-loyalty
board (planted exclusive and promiscuous customers pin the exclusive
counts) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY = 86_400_000_000
WEEK = 7 * DAY
HOUR = 3_600_000_000
# 1970-01-05 was a Monday -> Monday-week index of a us timestamp
MONDAY0 = 4 * DAY


def test_events_source_retention_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_source_retention

    g = np.random.default_rng(791)
    base = (np.datetime64("2026-06-01", "us").astype(np.int64) // WEEK) * WEEK
    et, ts, uid = [], [], []
    # "habit": user 1 active every week for 8 weeks -> 7 retained of 8
    for w in range(8):
        et.append("habit")
        ts.append(base + w * WEEK + HOUR)
        uid.append(1)
    # "tourist": 6 distinct users, one week each -> 0 retained
    for w in range(6):
        et.append("tourist")
        ts.append(base + w * WEEK + 2 * HOUR)
        uid.append(100 + w)
    # "mixed": random (user, week) visits
    for _ in range(400):
        et.append("mixed")
        ts.append(base + int(g.integers(0, 10)) * WEEK + int(g.integers(0, WEEK)))
        uid.append(int(g.integers(0, 12)))
    n = len(et)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(et),
                "ts": pa.array(np.array(ts, np.int64)).cast(
                    pa.timestamp("us")
                ),
                "user_id": pa.array(np.array(uid, np.int64)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "value": pa.array(np.zeros(n)),
            }
        ),
        tmp_path / "events.parquet",
    )

    per = collections.defaultdict(set)
    for s, t, u in zip(et, ts, uid):
        per[s].add((u, (t - MONDAY0) // WEEK))
    got = (
        events_source_retention(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    assert list(got.index) == sorted(per)
    for s, pairs in per.items():
        ret = sum(1 for (u, w) in pairs if (u, w - 1) in pairs)
        row = got.loc[s]
        assert row["n_user_weeks"] == len(pairs)
        assert row["n_retained"] == ret
        assert row["retained_permille"] == 1000 * ret // len(pairs)
    assert got.loc["habit", "n_retained"] == 7
    assert got.loc["tourist", "n_retained"] == 0


def test_doc_quality_margin_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import (
        quality_filter,
        quality_margin,
    )

    stop = ["the", "a", "of", "and", "to", "in", "is"]
    # 25 clean words with a healthy stopword mix (passes every predicate)
    base = (
        "the quick brown fox jumps over a lazy dog and runs to the "
        "river in spring while birds of every kind sing is nice today"
    ).split()
    assert len(base) == 25

    rows = []
    # doc 0-9 are the eval set (contamination reference): keep them
    # distinctive so only the planted doc collides
    for i in range(10):
        rows.append((i, " ".join(f"eval{i}w{j}" for j in range(24)), "en", "seed"))
    # passes all five
    rows.append((20, " ".join(base), "en", "clean"))
    # fails ONLY language
    rows.append((21, " ".join(base), "de", "m_lang"))
    # fails ONLY band (too short: 10 words, stopword-rich, no repeats)
    rows.append((22, "the a of and to in is fox dog bird", "en", "m_band"))
    # fails ONLY repetition (one word over 13% of 25 words: 5x "fox",
    # still >=2% stopwords, dup ratio (n-d)/n fine)
    rep = base[:20] + ["fox"] * 5
    rows.append((23, " ".join(rep), "en", "m_rep"))
    # fails ONLY stopword floor (25 distinct non-stop words)
    rows.append((24, " ".join(f"word{j}" for j in range(25)), "en", "m_stop"))
    # fails ONLY contamination: shares a 3-shingle with eval doc 3
    cont = base[:22] + ["eval3w0", "eval3w1", "eval3w2"]
    rows.append((25, " ".join(cont), "en", "m_cont"))
    # fails two (lang + band) -> not a sole failure anywhere
    rows.append((26, "short text only here", "fr", "m_two"))

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
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
        quality_margin(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    assert got.loc["clean", "n_pass_all"] == 1
    assert got.loc["clean", "n_fail_one"] == 0
    for src, col in [
        ("m_lang", "only_lang"),
        ("m_band", "only_band"),
        ("m_rep", "only_rep"),
        ("m_stop", "only_stop"),
        ("m_cont", "only_contam"),
    ]:
        row = got.loc[src]
        assert row["n_fail_one"] == 1, (src, dict(row))
        assert row[col] == 1, (src, col, dict(row))
        others = [
            c
            for c in (
                "only_lang only_band only_rep only_stop only_contam".split()
            )
            if c != col
        ]
        assert sum(row[c] for c in others) == 0
    assert got.loc["m_two", "n_fail_one"] == 0
    # cross-check n_pass_all against the fused keep decision itself
    kept = quality_filter(str(tmp_path)).to_pandas()
    per_src = collections.Counter(kept["source"])
    for src in got.index:
        assert got.loc[src, "n_pass_all"] == per_src.get(src, 0)


def test_rel_priority_loyalty_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import priority_loyalty

    g = np.random.default_rng(792)
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM"]
    ck, pr = [], []
    # customers 1..5: exclusive 1-URGENT (3 orders each)
    for c in range(1, 6):
        for _ in range(3):
            ck.append(c)
            pr.append("1-URGENT")
    # customer 10: promiscuous (all three priorities)
    for p in prios:
        ck.append(10)
        pr.append(p)
    # random tail
    for _ in range(150):
        ck.append(int(g.integers(20, 50)))
        pr.append(prios[int(g.integers(0, 3))])
    n = len(ck)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "o_custkey": pa.array(np.array(ck, np.int64)),
                "o_orderstatus": pa.array(["O"] * n),
                "o_totalprice": pa.array(np.ones(n)),
                "o_orderdate": pa.array(
                    np.full(n, np.datetime64("2026-01-01", "us"))
                ),
                "o_orderpriority": pa.array(pr),
            }
        ),
        tmp_path / "orders.parquet",
    )

    per_cust = collections.defaultdict(set)
    for c, p in zip(ck, pr):
        per_cust[c].add(p)
    want = collections.defaultdict(lambda: [0, 0])
    for c, ps in per_cust.items():
        for p in ps:
            want[p][0] += 1
            if len(ps) == 1:
                want[p][1] += 1

    got = (
        priority_loyalty(str(tmp_path))
        .to_pandas()
        .set_index("o_orderpriority")
        .sort_index()
    )
    assert list(got.index) == sorted(want)
    for p, (na, ne) in want.items():
        row = got.loc[p]
        assert row["n_customers"] == na
        assert row["n_exclusive"] == ne
        assert row["exclusive_permille"] == 1000 * ne // na
    assert got.loc["1-URGENT", "n_exclusive"] >= 5
