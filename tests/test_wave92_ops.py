"""Round-4 wave-92 operators: E139 sampling-error audit (a planted
all-sampled source pins zero error), T146/F tape vocabulary-Pareto
knees (a planted geometric frequency curve pins v500/v900 against a
scalar sorted-cumsum reference), R73 weekday demand profile (planted
weekday-only orders pin the dense grid) — each vs brute force."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY = 86_400_000_000


def test_events_sample_audit_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_sample_audit

    g = np.random.default_rng(770)
    et, uid = [], []
    # "clean": every user divisible by 64 -> est = 64*n, err huge; and
    # "none": no user divisible by 64 -> n_sample 0, err 1000
    for i in range(50):
        et.append("allsamp")
        uid.append(64 * int(g.integers(0, 9)))
    for i in range(70):
        et.append("nosamp")
        uid.append(64 * int(g.integers(0, 9)) + 1 + int(g.integers(0, 62)))
    for _ in range(800):
        et.append("bulk")
        uid.append(int(g.integers(0, 1000)))
    n = len(et)
    base = np.datetime64("2026-04-01", "us").astype(np.int64)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(et),
                "ts": pa.array(
                    base + g.integers(0, 30 * DAY, n)
                ).cast(pa.timestamp("us")),
                "value": pa.array(np.ones(n)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(uid, pa.int64()),
            }
        ),
        tmp_path / "events.parquet",
    )

    full = collections.Counter(et)
    samp = collections.Counter(
        s for s, u in zip(et, uid) if u % 64 == 0
    )

    got = events_sample_audit(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(full)
    for s in full:
        row = got.loc[s]
        assert row["n_full"] == full[s]
        assert row["n_sample"] == samp[s]
        assert row["est_64x"] == 64 * samp[s]
        assert row["err_permille"] == abs(64 * samp[s] - full[s]) * 1000 // full[s]
    assert got.loc["allsamp", "n_sample"] == 50
    assert got.loc["nosamp", "n_sample"] == 0
    assert got.loc["nosamp", "err_permille"] == 1000


def test_f1_vocab_pareto_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import tape_vocab_pareto

    g = np.random.default_rng(771)
    rows = []
    # "head": id 1 dominates (60 occurrences), ids 2..21 get 2 each,
    # ids 100..139 get 1 each -> total 140; v500 is tiny, v900 larger
    stream = [1] * 60 + [i for i in range(2, 22) for _ in range(2)] + list(
        range(100, 140)
    )
    g.shuffle(stream)
    for i in range(0, len(stream), 10):
        rows.append(("head", stream[i : i + 10]))
    # "flat": 30 distinct ids, one occurrence each
    for i in range(6):
        rows.append(("flat", list(range(500 + 5 * i, 505 + 5 * i))))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(
                    [f"s00-{i:08d}" for i in range(len(rows))]
                ),
                "tokens": pa.array(
                    [r[1] for r in rows], pa.list_(pa.int32())
                ),
                "n_tok": pa.array([len(r[1]) for r in rows], pa.int64()),
                "source": pa.array([r[0] for r in rows]),
            }
        ),
        tmp_path / "part-000.parquet",
    )

    def brute(src):
        cnt = collections.Counter()
        for s, t in rows:
            if s == src:
                cnt.update(t)
        ns = sorted(cnt.values(), reverse=True)
        tot = sum(ns)
        out = {"n_occ": tot, "n_ids": len(ns)}
        for q in (500, 900):
            thr = (tot * q + 999) // 1000
            cum = 0
            for k, c in enumerate(ns, 1):
                cum += c
                if cum >= thr:
                    out[f"v{q}"] = k
                    break
        return out

    got = tape_vocab_pareto(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == ["flat", "head"]
    for src in ("head", "flat"):
        want = brute(src)
        row = got.loc[src]
        for k, v in want.items():
            assert row[k] == v, (src, k, row[k], v)
    # planted shape: id 1 alone covers 60/140 < 50%+... check the knees
    assert got.loc["head", "v500"] < got.loc["head", "v900"]
    assert got.loc["flat", "v500"] == 15  # uniform: ceil(30*0.5)
    assert got.loc["flat", "v900"] == 27  # uniform: ceil(30*0.9)


def test_rel_weekday_profile_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import weekday_profile

    g = np.random.default_rng(772)
    # 2026-04-06 is a Monday; plant orders only on Mon/Wed/Sat
    monday = np.datetime64("2026-04-06", "us").astype(np.int64)
    dows = [0, 2, 5, 0, 0]  # Mon-heavy
    n_ord = 400
    off = [int(dows[int(g.integers(0, 5))]) + 7 * int(g.integers(0, 10))
           for _ in range(n_ord)]
    price = g.uniform(10, 5000, n_ord)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
                "o_custkey": pa.array(np.ones(n_ord, np.int64)),
                "o_orderstatus": pa.array(["O"] * n_ord),
                "o_totalprice": pa.array(price),
                "o_orderdate": pa.array(
                    monday + np.array(off, np.int64) * DAY
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n_ord),
            }
        ),
        tmp_path / "orders.parquet",
    )

    n = np.zeros(7, np.int64)
    rev = np.zeros(7, np.int64)
    for o, p in zip(off, price):
        n[o % 7] += 1
        rev[o % 7] += int(np.floor(p))

    got = weekday_profile(str(tmp_path)).to_pandas()
    got = got.set_index("isodow").sort_index()
    assert list(got.index) == list(range(1, 8))
    for d in range(7):
        row = got.loc[d + 1]
        assert row["n_orders"] == n[d]
        assert row["revenue_floor"] == rev[d]
        assert row["permille"] == 1000 * n[d] // n.sum()
    assert got.loc[2, "n_orders"] == 0  # Tuesday never planted
    assert got.loc[1, "n_orders"] > got.loc[3, "n_orders"]  # Mon-heavy
