"""Round-4 wave-68 operators: E115 half-load minute board (planted
front-loaded and back-loaded days), T122/F tape source-mix drift
(planted stalled source pins a zero-share cell), R49 brand revenue
momentum (planted skipped year exercises the previous-OBSERVED-year
lag) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_halfload_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_halfload

    g = np.random.default_rng(530)
    base = np.datetime64("2026-03-01", "us").astype(np.int64)
    n = 3000
    types = np.array(["a", "b"])
    et = list(types[g.integers(0, 2, n)])
    ts = list(base + g.integers(0, 6 * 86_400_000_000, n).astype(np.int64))
    # planted: source "front" puts 3 events at 00:05 and 1 at 23:00 on
    # one day -> half-load minute is 5; "back" reverses it -> 1380
    d = base + 40 * 86_400_000_000
    for s, minutes in [("front", [5, 5, 5, 1380]), ("back", [5, 1380, 1380, 1380])]:
        for m in minutes:
            et.append(s)
            ts.append(d + m * 60_000_000)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(et),
                "ts": pa.array(np.array(ts, np.int64)).cast(
                    pa.timestamp("us")
                ),
            }
        ),
        tmp_path / "events.parquet",
    )

    per_day = collections.defaultdict(collections.Counter)
    for s, t in zip(et, ts):
        day = int(t) // 86_400_000_000
        minute = (int(t) % 86_400_000_000) // 60_000_000
        per_day[(s, day)][minute] += 1
    crossing = collections.defaultdict(list)
    for (s, _), cnt in per_day.items():
        tot = sum(cnt.values())
        cum = 0
        for m in sorted(cnt):
            cum += cnt[m]
            if 2 * cum >= tot:
                crossing[s].append(m)
                break

    got = events_halfload(str(tmp_path)).to_pandas()
    assert len(got) == len(crossing)
    for _, r in got.iterrows():
        vals = sorted(crossing[r.source])
        assert int(r.n_days) == len(vals), r.source
        thr = (len(vals) * 500 + 999) // 1000
        assert int(r.p50_halfload_minute) == vals[thr - 1], r.source
    assert int(got[got.source == "front"].iloc[0].p50_halfload_minute) == 5
    assert int(got[got.source == "back"].iloc[0].p50_halfload_minute) == 1380


def test_f1_mix_by_hour_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import f1_mix_by_hour
    from mq_to_db_ray.timegrid import T0_US

    g = np.random.default_rng(531)
    n = 7200  # two hours of seconds
    srcs = np.array(["s00", "s01", "s02"])
    sc = srcs[g.integers(0, 3, n)]
    seq = np.arange(n, dtype=np.int64)
    # planted: source s02 is STALLED in hour 1 (share 0 there)
    sc[(seq >= 3600) & (sc == "s02")] = "s00"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(
                    [f"{s}-{q:08d}" for s, q in zip(sc, seq)]
                ),
                "n_tok": pa.array(
                    g.integers(1, 64, n).astype(np.int32), pa.int32()
                ),
                "source": pa.array(sc),
            }
        ),
        tmp_path / "part-0.parquet",
    )

    cells = collections.Counter()
    tot = collections.Counter()
    for s, q in zip(sc, seq):
        h = int(q) // 3600
        cells[(h, s)] += 1
        tot[h] += 1

    got = f1_mix_by_hour(str(tmp_path)).to_pandas()
    assert len(got) == 2 * 3  # dense hours x sources
    for _, r in got.iterrows():
        h = (int(r.bucket_ts.value) // 1000 - T0_US) // 3_600_000_000
        n_c = cells.get((h, r.source), 0)
        assert int(r.n_seqs) == n_c, (h, r.source)
        assert int(r.share_permille) == 1000 * n_c // tot[h], (h, r.source)
    us = got.bucket_ts.apply(lambda x: x.value // 1000)  # ns -> us
    stalled = got[(got.source == "s02") & (us - T0_US >= 3_600_000_000)]
    assert len(stalled) == 1 and int(stalled.iloc[0].share_permille) == 0


def test_rel_brand_momentum_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import brand_momentum

    g = np.random.default_rng(532)
    n_part, n_lines = 60, 3000
    pkeys = np.arange(1, n_part + 1, dtype=np.int64)
    brands = np.array([f"B{k % 4}" for k in range(n_part)])
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(pkeys),
                "p_brand": pa.array(brands),
            }
        ),
        tmp_path / "part.parquet",
    )
    lpk = pkeys[g.integers(0, n_part, n_lines)]
    years = g.integers(1995, 1999, n_lines)
    # planted: brand B3's parts never ship in 1996 -> its 1997 delta is
    # vs 1995, the previous OBSERVED year
    brand_of = {int(k): b for k, b in zip(pkeys, brands)}
    for i in range(n_lines):
        if brand_of[int(lpk[i])] == "B3" and years[i] == 1996:
            years[i] = 1995
    dates = np.array(
        [np.datetime64(f"{y}-07-01", "us") for y in years]
    ).astype(np.int64)
    ext = g.uniform(900, 9000, n_lines)
    disc = g.integers(0, 10, n_lines) / 100.0
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array(lpk),
                "l_shipdate": pa.array(dates, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "l_extendedprice": pa.array(ext),
                "l_discount": pa.array(disc),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    agg = collections.defaultdict(lambda: [0, 0])
    for k, y, e, dd in zip(lpk, years, ext, disc):
        w = agg[(brand_of[int(k)], int(y))]
        w[0] += 1
        w[1] += math.floor(e * (1.0 - dd))
    want_delta = {}
    by_brand = collections.defaultdict(list)
    for (b, y), (_, rv) in agg.items():
        by_brand[b].append((y, rv))
    for b, rows in by_brand.items():
        rows.sort()
        prev = None
        for y, rv in rows:
            want_delta[(b, y)] = 0 if prev is None else rv - prev
            prev = rv

    got = brand_momentum(str(tmp_path)).to_pandas()
    assert len(got) == len(agg)
    for _, r in got.iterrows():
        key = (r.p_brand, int(r.ship_year))
        nl, rv = agg[key]
        assert int(r.n_lines) == nl, key
        assert int(r.revenue_floor) == rv, key
        assert int(r.yoy_delta) == want_delta[key], key
    b3 = got[got.p_brand == "B3"]
    assert 1996 not in set(int(y) for y in b3.ship_year)
