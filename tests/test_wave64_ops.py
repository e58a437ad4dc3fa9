"""Round-4 wave-64 operators: E111 inter-arrival quantiles by hour of
day (planted cross-hour gap pins the later-event attribution), T118
vocabulary-exclusivity board (planted all-exclusive and all-shared
sources), R45 order-seasonality profile (planted order-free month
exercises the densify) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_gap_by_hour_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_gap_by_hour

    g = np.random.default_rng(490)
    base = np.datetime64("2026-03-01", "us").astype(np.int64)
    n = 2500
    types = np.array(["x", "y"])
    et = types[g.integers(0, 2, n)]
    ts = base + g.integers(0, 4 * 86_400_000_000, n).astype(np.int64)
    # planted: a gap spanning hour 6 -> hour 9; it must land on hour 9
    et = np.append(et, ["z", "z"])
    ts = np.append(
        ts,
        [base + 6 * 3_600_000_000, base + 9 * 3_600_000_000 + 15],
    )
    eid = np.arange(len(et), dtype=np.int64)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(eid),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "event_type": pa.array(et),
            }
        ),
        tmp_path / "events.parquet",
    )

    per_src = collections.defaultdict(list)
    for s, t, o in zip(et, ts, eid):
        per_src[s].append((int(t), int(o)))
    gaps = collections.defaultdict(list)
    for s, rows in per_src.items():
        rows.sort()
        for (pt, _), (t, _) in zip(rows, rows[1:]):
            hour = (t % 86_400_000_000) // 3_600_000_000
            gaps[(s, hour)].append((t - pt) // 1_000_000)

    def q(vals, p):
        vals = sorted(vals)
        thr = (len(vals) * p + 999) // 1000
        return vals[thr - 1]

    got = events_gap_by_hour(str(tmp_path)).to_pandas()
    assert len(got) == len(gaps)
    for _, r in got.iterrows():
        vs = gaps[(r.source, int(r.hour))]
        assert int(r.n_gaps) == len(vs), (r.source, r.hour)
        assert int(r.p50_s) == q(vs, 500), (r.source, r.hour)
        assert int(r.p90_s) == q(vs, 900), (r.source, r.hour)
    z = got[got.source == "z"]
    assert len(z) == 1 and int(z.iloc[0].hour) == 9  # later-event hour


def test_doc_exclusive_vocab_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import exclusive_vocab

    g = np.random.default_rng(491)
    shared = ["data", "model", "train", "eval"]
    texts, srcs = [], []
    for i in range(300):
        k = int(g.integers(3, 10))
        texts.append(" ".join(shared[int(g.integers(0, 4))] for _ in range(k)))
        srcs.append(f"s{int(g.integers(0, 3))}")
    # planted: source "jargon" speaks ONLY its own words (all exclusive);
    # source "plain" uses ONLY shared words (zero exclusive)
    texts += ["flurble gronk flurble", "gronk zibble"]
    srcs += ["jargon"] * 2
    texts += ["data model", "train eval data"]
    srcs += ["plain"] * 2
    pq.write_table(
        pa.table({"text": pa.array(texts), "source": pa.array(srcs)}),
        tmp_path / "documents.parquet",
    )

    per = collections.defaultdict(collections.Counter)
    for t, s in zip(texts, srcs):
        for w in t.split(" "):
            per[s][w] += 1
    src_of = collections.defaultdict(set)
    for s, c in per.items():
        for w in c:
            src_of[w].add(s)

    got = exclusive_vocab(str(tmp_path)).to_pandas()
    assert len(got) == len(per)
    for _, r in got.iterrows():
        c = per[r.source]
        excl = {w for w in c if len(src_of[w]) == 1}
        assert int(r.n_types) == len(c), r.source
        assert int(r.n_exclusive) == len(excl), r.source
        assert int(r.excl_occurrences) == sum(c[w] for w in excl), r.source
    j = got[got.source == "jargon"].iloc[0]
    assert int(j.n_exclusive) == int(j.n_types) == 3
    p = got[got.source == "plain"].iloc[0]
    assert int(p.n_exclusive) == 0


def test_rel_seasonality_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import seasonality

    g = np.random.default_rng(492)
    n = 3000
    years = g.integers(1995, 2001, n)
    months = g.integers(1, 12, n)  # month 12 never drawn -> dense zero
    days = g.integers(1, 28, n)
    dates = np.array(
        [
            np.datetime64(f"{y}-{m:02d}-{d:02d}", "us")
            for y, m, d in zip(years, months, days)
        ]
    ).astype(np.int64)
    tot = g.uniform(100, 90000, n)
    pq.write_table(
        pa.table(
            {
                "o_orderdate": pa.array(dates, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "o_totalprice": pa.array(tot),
            }
        ),
        tmp_path / "orders.parquet",
    )

    want = {m: [0, 0, set()] for m in range(1, 13)}
    for y, m, v in zip(years, months, tot):
        w = want[int(m)]
        w[0] += 1
        w[1] += math.floor(v)
        w[2].add(int(y))

    got = seasonality(str(tmp_path)).to_pandas()
    assert list(got.month) == list(range(1, 13))
    for _, r in got.iterrows():
        n_o, rev, ys = want[int(r.month)]
        assert int(r.n_orders) == n_o
        assert int(r.revenue_floor) == rev
        assert int(r.n_years) == len(ys)
    dec = got[got.month == 12].iloc[0]
    assert int(dec.n_orders) == 0 and int(dec.n_years) == 0
