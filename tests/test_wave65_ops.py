"""Round-4 wave-65 operators: E112 weekday/weekend split board (planted
weekend-silent source exercises the dense zero regime), T119
vocabulary-introduction deciles (planted late-minted heavy word), R46
returns trend board (planted return-free year) — each vs a scalar
brute-force reference."""

from __future__ import annotations

import collections
import datetime
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_weekpart_board_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_weekpart_board

    g = np.random.default_rng(500)
    base = np.datetime64("2026-03-01", "us").astype(np.int64)  # a Sunday
    n = 3000
    types = np.array(["a", "b"])
    et = types[g.integers(0, 2, n)]
    ts = base + g.integers(0, 14 * 86_400_000_000, n).astype(np.int64)
    val = g.uniform(0, 50, n)
    # planted: source "wd" fires ONLY on weekdays (Mon 2026-03-02 .. Fri)
    mon = base + 1 * 86_400_000_000
    for d in range(5):
        et = np.append(et, ["wd"])
        ts = np.append(ts, [mon + d * 86_400_000_000 + 7])
        val = np.append(val, [9.5])
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(et),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "value": pa.array(val),
            }
        ),
        tmp_path / "events.parquet",
    )

    epoch = datetime.datetime(1970, 1, 1)
    want = collections.defaultdict(lambda: [0, set(), 0])
    for s, t, v in zip(et, ts, val):
        dt = epoch + datetime.timedelta(microseconds=int(t))
        wk = 1 if (dt.weekday() + 1) % 7 in (0, 6) else 0
        w = want[(s, wk)]
        w[0] += 1
        w[1].add(int(t) // 86_400_000_000)
        w[2] += math.floor(v)

    got = events_weekpart_board(str(tmp_path)).to_pandas()
    assert len(got) == 3 * 2  # dense (source, weekpart) grid
    for _, r in got.iterrows():
        n_e, days, vu = want[(r.source, int(r.is_weekend))]
        assert int(r.n_events) == n_e, (r.source, r.is_weekend)
        assert int(r.n_days) == len(days), (r.source, r.is_weekend)
        assert int(r.value_units) == vu, (r.source, r.is_weekend)
    wd_we = got[(got.source == "wd") & (got.is_weekend == 1)].iloc[0]
    assert int(wd_we.n_events) == 0 and int(wd_we.n_days) == 0
    wd_wd = got[(got.source == "wd") & (got.is_weekend == 0)].iloc[0]
    assert int(wd_wd.n_days) == 5


def test_doc_vocab_intro_deciles_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import vocab_intro_deciles

    g = np.random.default_rng(501)
    n = 400
    base_vocab = ["alpha", "beta", "gamma", "delta"]
    texts = []
    for i in range(n):
        k = int(g.integers(3, 9))
        ws = [base_vocab[int(g.integers(0, 4))] for _ in range(k)]
        if i == 390:  # planted: heavy word minted in the last decile
            ws += ["latecomer"] * 7
        if i in (395, 399):
            ws.append("latecomer")
        texts.append(" ".join(ws))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(texts),
            }
        ),
        tmp_path / "documents.parquet",
    )

    first = {}
    count = collections.Counter()
    for i, t in enumerate(texts):
        for w in t.split(" "):
            first.setdefault(w, i)
            count[w] += 1
    want = {d: [0, 0] for d in range(10)}
    for w, fd in first.items():
        d = fd * 10 // n
        want[d][0] += 1
        want[d][1] += count[w]

    got = vocab_intro_deciles(str(tmp_path)).to_pandas()
    assert list(got.decile) == list(range(10))
    for _, r in got.iterrows():
        nt, occ = want[int(r.decile)]
        assert int(r.new_types) == nt, r.decile
        assert int(r.occurrences) == occ, r.decile
    last = got[got.decile == 9].iloc[0]
    assert int(last.new_types) == 1 and int(last.occurrences) == 9


def test_rel_returns_trend_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import returns_trend

    g = np.random.default_rng(502)
    n = 4000
    years = g.integers(1995, 1999, n)
    flags = np.array(["R", "A", "N"])[g.integers(0, 3, n)]
    flags[years == 1997] = "N"  # planted: 1997 has zero returns
    dates = np.array(
        [np.datetime64(f"{y}-06-15", "us") for y in years]
    ).astype(np.int64)
    ext = g.uniform(900, 90000, n)
    pq.write_table(
        pa.table(
            {
                "l_shipdate": pa.array(dates, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "l_returnflag": pa.array(flags),
                "l_extendedprice": pa.array(ext),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    want = collections.defaultdict(lambda: [0, 0, 0, 0])
    for y, f, e in zip(years, flags, ext):
        cents = math.floor(100.0 * e)
        w = want[int(y)]
        w[0] += 1
        w[1] += f == "R"
        w[2] += cents
        w[3] += cents if f == "R" else 0

    got = returns_trend(str(tmp_path)).to_pandas()
    assert len(got) == 4
    for _, r in got.iterrows():
        nl, rl, rv, rr = want[int(r.ship_year)]
        assert int(r.n_lines) == nl
        assert int(r.returned_lines) == rl
        assert int(r.rev_cents) == rv
        assert int(r.returned_rev_cents) == rr
    y97 = got[got.ship_year == 1997].iloc[0]
    assert int(y97.returned_lines) == 0 and int(y97.returned_rev_cents) == 0
