"""Round-4 wave-74 operators: E121 duty-cycle quantiles (planted
always-on vs one-burst-per-day sources pin the per-day active-minute
quantiles), T128 language-drift deciles (a planted mid-corpus language
swap pins the decile cells), R55 supplier credit-volume correlation
(planted balances proportional to volume pin the cross moments;
zero-line suppliers count) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_duty_cycle_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_duty_cycle

    g = np.random.default_rng(590)
    base = np.datetime64("2026-03-01", "us").astype(np.int64)
    DAY = 86_400_000_000
    et, ts = [], []
    # "alwayson": 30 distinct minutes on each of 4 days
    for d in range(4):
        for m in range(30):
            et.append("alwayson")
            ts.append(base + d * DAY + m * 60_000_000 + 5)
    # "burst": all events in ONE minute per day, 3 days
    for d in range(3):
        for j in range(5):
            et.append("burst")
            ts.append(base + d * DAY + 600 * 60_000_000 + j)
    # random bulk
    for _ in range(600):
        et.append("rand")
        ts.append(
            base
            + int(g.integers(0, 6)) * DAY
            + int(g.integers(0, 1440)) * 60_000_000
            + int(g.integers(0, 60_000_000))
        )
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

    per = collections.defaultdict(lambda: collections.defaultdict(set))
    for s, t in zip(et, ts):
        m = t // 60_000_000
        per[s][m // 1440].add(m)
    got = events_duty_cycle(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(per)
    for s, days in per.items():
        ams = sorted(len(v) for v in days.values())
        row = got.loc[s]
        assert row["n_days"] == len(ams)
        assert row["max_minutes"] == ams[-1]
        for col, q in (("p50", 500), ("p90", 900)):
            thr = (len(ams) * q + 999) // 1000
            assert row[col] == ams[thr - 1]
    assert got.loc["burst", "max_minutes"] == 1
    assert got.loc["alwayson", "p50"] == 30


def test_doc_lang_drift_deciles_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import lang_drift_deciles

    g = np.random.default_rng(591)
    n_docs = 300
    texts, langs = [], []
    for i in range(n_docs):
        texts.append(" ".join(g.choice(list("abcde"), 5)))
        # planted swap: first half mostly "en", second half mostly "de"
        langs.append(
            "en" if (i < n_docs // 2) != (i % 10 == 0) else "de"
        )
    nchars = [len(t) for t in texts]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
                "text": pa.array(texts),
                "lang": pa.array(langs),
                "source": pa.array(["s"] * n_docs),
                "n_chars": pa.array(nchars, pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    want = collections.defaultdict(lambda: [0, 0])
    for i, (lg, nc) in enumerate(zip(langs, nchars)):
        dec = i * 10 // n_docs
        want[(lg, dec)][0] += 1
        want[(lg, dec)][1] += nc
    got = lang_drift_deciles(str(tmp_path)).to_pandas()
    assert len(got) == 2 * 10
    got = got.set_index(["lang", "decile"]).sort_index()
    for lg in ("de", "en"):
        for d in range(10):
            nd, ch = want[(lg, d)]
            assert got.loc[(lg, d), "n_docs"] == nd
            assert got.loc[(lg, d), "sum_chars"] == ch
    # the swap: en dominates decile 0, de dominates decile 9
    assert got.loc[("en", 0), "n_docs"] > got.loc[("de", 0), "n_docs"]
    assert got.loc[("de", 9), "n_docs"] > got.loc[("en", 9), "n_docs"]


def test_rel_supplier_balance_corr_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import supplier_balance_corr

    g = np.random.default_rng(592)
    n_supp = 60
    nk = np.array([i % 3 for i in range(n_supp)], np.int32)
    bal = np.round(g.uniform(-900, 9000, n_supp), 2)
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(
                    np.arange(1, n_supp + 1, dtype=np.int64)
                ),
                "s_name": pa.array([f"s{i}" for i in range(n_supp)]),
                "s_nationkey": pa.array(nk),
                "s_acctbal": pa.array(bal),
            }
        ),
        tmp_path / "supplier.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(np.arange(3, dtype=np.int32)),
                "n_name": pa.array(["ALGERIA", "BRAZIL", "CANADA"]),
                "n_regionkey": pa.array(np.zeros(3, np.int32)),
            }
        ),
        tmp_path / "nation.parquet",
    )
    # supplier i ships i % 7 lines (so some zero-line suppliers exist)
    lk = []
    for i in range(1, n_supp + 1):
        lk += [i] * (i % 7)
    lk = np.array(lk, np.int64)
    g.shuffle(lk)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(len(lk), dtype=np.int64)),
                "l_partkey": pa.array(np.ones(len(lk), np.int64)),
                "l_suppkey": pa.array(lk),
                "l_quantity": pa.array(np.ones(len(lk))),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    names = ["ALGERIA", "BRAZIL", "CANADA"]
    want = collections.defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for i in range(n_supp):
        b = int(np.floor(100 * bal[i]))
        nl = (i + 1) % 7
        w = want[names[nk[i]]]
        w[0] += 1
        w[1] += nl
        w[2] += b
        w[3] += b * nl
        w[4] += nl * nl
        w[5] += b * b
    got = supplier_balance_corr(str(tmp_path)).to_pandas()
    got = got.set_index("nation").sort_index()
    assert list(got.index) == sorted(want)
    for nm, w in want.items():
        row = got.loc[nm]
        assert row["n_suppliers"] == w[0]
        assert row["sum_lines"] == w[1]
        assert row["sum_bal"] == w[2]
        assert row["sum_xy"] == w[3]
        assert row["sum_xx"] == w[4]
        assert row["sum_yy"] == w[5]
