"""Round-4 wave-61 operators: E109 daily OHLC cascaded from the 1m tier
(planted same-timestamp ties exercise the event_id order; the test also
asserts cascade == direct-from-raw), T114 collocation board (planted
pair tie and an all-single-word source), R42 part size-band logistics
board (planted never-shipped band) — each vs a scalar brute-force
reference."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_ohlc_1d_cascaded_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_ohlc_1d_cascaded

    g = np.random.default_rng(460)
    base = np.datetime64("2026-03-01", "us").astype(np.int64)
    n = 4000
    types = np.array(["a", "b", "c"])
    et = types[g.integers(0, 3, n)]
    ts = base + g.integers(0, 5 * 86_400_000_000, n).astype(np.int64)
    val = g.uniform(0, 900, n)
    # planted: two events at the IDENTICAL first timestamp of a day —
    # event_id order must pick the day's open deterministically
    t0 = base + 2 * 86_400_000_000
    et = np.append(et, ["tie", "tie", "tie"])
    ts = np.append(ts, [t0, t0, t0 + 3_600_000_000])
    val = np.append(val, [111.0, 222.0, 333.0])
    eid = np.arange(len(et), dtype=np.int64)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(eid),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "event_type": pa.array(et),
                "value": pa.array(val),
            }
        ),
        tmp_path / "events.parquet",
    )

    day_us = 86_400_000_000
    groups = collections.defaultdict(list)
    for i in range(len(et)):
        groups[(et[i], int(ts[i]) // day_us)].append(
            (int(ts[i]), int(eid[i]), math.floor(val[i]))
        )
    want = {}
    for k, rows in groups.items():
        rows.sort()
        vs = [v for _, _, v in rows]
        want[k] = (rows[0][2], max(vs), min(vs), rows[-1][2])

    got = events_ohlc_1d_cascaded(str(tmp_path)).to_pandas()
    assert len(got) == len(want)
    for _, r in got.iterrows():
        day = int(r.bucket_ts.value) // 1000 // day_us  # ns -> us -> day
        o, h, lo, c = want[(r.source, day)]
        assert (int(r.open), int(r.high), int(r.low), int(r.close)) == (
            o,
            h,
            lo,
            c,
        ), (r.source, day)
    tie_day = int(t0) // day_us
    o, h, lo, c = want[("tie", tie_day)]
    assert o == 111 and c == 333  # event_id broke the ts tie


def test_doc_collocation_board_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import collocation_board

    g = np.random.default_rng(461)
    vocab = np.array(["the", "cat", "sat", "on", "mat", "dog"])
    texts, srcs = [], []
    for _ in range(500):
        k = int(g.integers(2, 9))
        texts.append(" ".join(vocab[g.integers(0, 6, k)]))
        srcs.append(f"s{int(g.integers(0, 3))}")
    # planted tie: source "tie" has "b a" twice and "a z" twice and
    # nothing else repeated -> "a z" (lexicographically smaller) wins
    texts += ["b a", "b a", "a z", "a z"]
    srcs += ["tie"] * 4
    # planted degenerate: all docs single-word -> zeros + empty top_pair
    texts += ["solo", "word"]
    srcs += ["mono"] * 2
    pq.write_table(
        pa.table({"text": pa.array(texts), "source": pa.array(srcs)}),
        tmp_path / "documents.parquet",
    )

    per = collections.defaultdict(collections.Counter)
    for t, s in zip(texts, srcs):
        ws = t.split(" ")
        for i in range(len(ws) - 1):
            per[s][f"{ws[i]} {ws[i+1]}"] += 1

    got = collocation_board(str(tmp_path)).to_pandas()
    assert len(got) == 5  # s0 s1 s2 tie mono — dense
    for _, r in got.iterrows():
        c = per.get(r.source, collections.Counter())
        assert int(r.n_pairs) == sum(c.values()), r.source
        assert int(r.n_distinct) == len(c), r.source
        if c:
            mx = max(c.values())
            assert int(r.top_count) == mx, r.source
            assert r.top_pair == min(
                w for w, v in c.items() if v == mx
            ), r.source
        else:
            assert int(r.top_count) == 0 and r.top_pair == "", r.source
    tie = got[got.source == "tie"].iloc[0]
    assert tie.top_pair == "a z" and int(tie.top_count) == 2
    mono = got[got.source == "mono"].iloc[0]
    assert int(mono.n_pairs) == 0 and mono.top_pair == ""


def test_rel_size_bands_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import size_bands

    g = np.random.default_rng(462)
    n_part, n_lines = 120, 4000
    pkeys = np.arange(1, n_part + 1, dtype=np.int64)
    sizes = g.integers(1, 51, n_part).astype(np.int64)
    sizes[:5] = 45  # ensure band 4 has parts
    retail = g.uniform(100, 2000, n_part)
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(pkeys),
                "p_size": pa.array(sizes, pa.int32()),
                "p_retailprice": pa.array(retail),
            }
        ),
        tmp_path / "part.parquet",
    )
    # planted: lines never reference band-4 parts (sizes 41-50) -> that
    # band shows parts but ZERO lines
    shippable = pkeys[sizes <= 40]
    lpk = shippable[g.integers(0, len(shippable), n_lines)]
    qty = g.integers(1, 50, n_lines).astype(np.float64)
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array(lpk),
                "l_quantity": pa.array(qty),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    want = {b: [0, 0, 0, 0] for b in range(5)}
    band_of = {}
    for k, s, rp in zip(pkeys, sizes, retail):
        b = (int(s) - 1) // 10
        band_of[int(k)] = b
        want[b][0] += 1
        want[b][1] += math.floor(100.0 * rp)
    for k, q in zip(lpk, qty):
        b = band_of[int(k)]
        want[b][2] += 1
        want[b][3] += int(q)

    got = size_bands(str(tmp_path)).to_pandas().sort_values("band")
    assert list(got.band) == [0, 1, 2, 3, 4]
    for _, r in got.iterrows():
        npt, rc, nl, sq = want[int(r.band)]
        assert int(r.n_parts) == npt, r.band
        assert int(r.retail_cents) == rc, r.band
        assert int(r.n_lines) == nl, r.band
        assert int(r.sum_qty) == sq, r.band
    b4 = got[got.band == 4].iloc[0]
    assert int(b4.n_parts) > 0 and int(b4.n_lines) == 0
