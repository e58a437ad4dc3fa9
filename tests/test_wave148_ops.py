"""Round-5 wave-148 operators: E195 fade-profile bands (last gap vs own
rhythm), T201 cross-language vocabulary leakage, R128 returns by
quantity band — each vs a scalar brute-force reference on planted
fixtures."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HOUR_US = 3_600_000_000


def test_fade_profile_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_fade_profile

    g = np.random.default_rng(59)
    n = 5000
    ts = np.sort(g.integers(0, 30 * 24 * HOUR_US, n).astype(np.int64))
    uid = g.integers(1, 80, n).astype(np.int64)
    eid = np.arange(n, dtype=np.int64)
    pq.write_table(
        pa.table({
            "event_id": pa.array(eid),
            "user_id": pa.array(uid),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(g.uniform(0, 100, n)),
            "event_type": pa.array(["click"] * n),
        }),
        tmp_path / "events.parquet",
    )

    def qdisc(vals, q):
        vals = sorted(vals)
        thr = (len(vals) * q + 999) // 1000
        return vals[thr - 1]

    per_user = collections.defaultdict(list)
    for e, u, t in zip(eid, uid, ts):
        per_user[int(u)].append((int(t), int(e)))
    nu = collections.Counter()
    for rows in per_user.values():
        rows.sort()
        gaps = [b[0] - a[0] for a, b in zip(rows, rows[1:])]
        if len(gaps) < 2:
            continue
        mg = qdisc(gaps, 500)
        lg = gaps[-1]
        band = min(1000 * mg // max(lg, 1), 1000) // 100
        nu[band] += 1

    got = events_fade_profile(str(tmp_path)).to_pandas().set_index("band")
    assert sorted(got.index.tolist()) == sorted(nu)
    for band in nu:
        assert int(got.loc[band, "n_users"]) == nu[band]


def test_lang_leakage_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import lang_leakage

    g = np.random.default_rng(61)
    vocab = ["uno", "dos", "tres", "vier", "funf", "liu", "qi"]
    langs = ["en", "es", "zh"]
    rows = []
    for i in range(400):
        src = f"s{i % 2}"
        n_words = int(g.integers(1, 15))
        words = [vocab[int(g.integers(0, len(vocab)))] for _ in range(n_words)]
        if i % 11 == 0:
            words.append(f"mono{i}")  # single-lang singleton salt
        rows.append({"doc_id": f"d-{i}", "text": " ".join(words),
                     "lang": langs[int(g.integers(0, 3))], "source": src,
                     "n_chars": sum(map(len, words))})
    pq.write_table(pa.Table.from_pylist(rows), tmp_path / "documents.parquet")

    seen = collections.defaultdict(set)
    for r in rows:
        for w in r["text"].split(" "):
            seen[(r["source"], w)].add(r["lang"])
    agg = collections.defaultdict(lambda: [0, 0])
    for (src, _), ls in seen.items():
        agg[src][0] += 1
        agg[src][1] += 1 if len(ls) >= 2 else 0

    got = lang_leakage(str(tmp_path)).to_pandas().set_index("source")
    for src, (nt, npoly) in agg.items():
        row = got.loc[src]
        assert int(row["n_types"]) == nt
        assert int(row["n_polyglot"]) == npoly
        assert int(row["polyglot_permille"]) == 1000 * npoly // nt


def test_return_by_size_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import return_by_size

    g = np.random.default_rng(67)
    n_li = 900
    qty = g.uniform(1.0, 50.0, n_li)
    flag = np.where(g.uniform(0, 1, n_li) < 0.3, "R", "N")
    ep = g.uniform(100.0, 5000.0, n_li)
    dc = g.integers(0, 11, n_li) / 100.0
    pq.write_table(
        pa.table({
            "l_quantity": pa.array(qty),
            "l_returnflag": pa.array(flag.tolist()),
            "l_extendedprice": pa.array(ep),
            "l_discount": pa.array(dc),
        }),
        tmp_path / "lineitem.parquet",
    )

    agg = collections.defaultdict(lambda: [0, 0, 0])
    for q, f, e, d in zip(qty, flag, ep, dc):
        band = int(np.floor(q)) // 10
        a = agg[band]
        a[0] += 1
        if f == "R":
            a[1] += 1
            a[2] += int(np.floor(e * (1.0 - d)))

    got = return_by_size(str(tmp_path)).to_pandas().set_index("band")
    assert len(got) == len(agg)
    for band, (n, nr, rrev) in agg.items():
        row = got.loc[band]
        assert int(row["n_lines"]) == n
        assert int(row["n_returned"]) == nr
        assert int(row["returned_revenue"]) == rrev
        assert int(row["returned_permille"]) == 1000 * nr // n
