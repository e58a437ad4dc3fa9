"""Round-4 wave-62 operators: T115/F hourly n_tok candlesticks over the
F1 tape, T116/F daily candlesticks cascaded from the hourly tier
(asserted bit-equal to a direct-from-raw brute force — the cascade
correctness statement), R43 segment × priority demand matrix (planted
empty cell exercises the dense cross grid) — each vs a scalar
brute-force reference."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_tape(tmp_path, n=9000, seed=470):
    g = np.random.default_rng(seed)
    srcs = np.array([f"s{k:02d}" for k in range(4)])
    sc = srcs[g.integers(0, 4, n)]
    seq = np.arange(n, dtype=np.int64)  # seconds since tape epoch
    ntok = g.integers(1, 64, n).astype(np.int32)
    doc_id = [f"{s}-{q:08d}" for s, q in zip(sc, seq)]
    toks = [list(range(int(t))) for t in ntok]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(doc_id),
                "tokens": pa.array(toks, pa.list_(pa.int32())),
                "n_tok": pa.array(ntok, pa.int32()),
                "source": pa.array(sc),
            }
        ),
        tmp_path / "part-0.parquet",
    )
    return sc, seq, ntok


def _brute_ohlc(sc, seq, ntok, width_s):
    groups = collections.defaultdict(list)
    for s, q, t in zip(sc, seq, ntok):
        groups[(s, int(q) // width_s)].append((int(q), int(t)))
    want = {}
    for k, rows in groups.items():
        rows.sort()
        vs = [v for _, v in rows]
        want[k] = (rows[0][1], max(vs), min(vs), rows[-1][1])
    return want


def test_f1_ohlc_1h_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import f1_ohlc_1h
    from mq_to_db_ray.timegrid import T0_US

    sc, seq, ntok = _write_tape(tmp_path)
    want = _brute_ohlc(sc, seq, ntok, 3600)

    got = f1_ohlc_1h(str(tmp_path)).to_pandas()
    assert len(got) == len(want)
    for _, r in got.iterrows():
        b = (int(r.bucket_ts.value) // 1000 - T0_US) // 3_600_000_000
        o, h, lo, c = want[(r.source, b)]
        assert (int(r.open), int(r.high), int(r.low), int(r.close)) == (
            o,
            h,
            lo,
            c,
        ), (r.source, b)


def test_f1_ohlc_1d_cascade_equals_raw(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import f1_ohlc_1d_cascaded
    from mq_to_db_ray.timegrid import T0_US

    # span > 1 day so the cascade folds multiple hours into each day
    g = np.random.default_rng(471)
    n = 6000
    srcs = np.array(["a", "b"])
    sc = srcs[g.integers(0, 2, n)]
    seq = np.sort(g.choice(3 * 86_400, size=n, replace=False)).astype(
        np.int64
    )
    ntok = g.integers(1, 64, n).astype(np.int32)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(
                    [f"{s}-{q:08d}" for s, q in zip(sc, seq)]
                ),
                "tokens": pa.array(
                    [[0]] * n, pa.list_(pa.int32())
                ),
                "n_tok": pa.array(ntok, pa.int32()),
                "source": pa.array(sc),
            }
        ),
        tmp_path / "part-0.parquet",
    )
    want = _brute_ohlc(sc, seq, ntok, 86_400)

    got = f1_ohlc_1d_cascaded(str(tmp_path)).to_pandas()
    assert len(got) == len(want)
    for _, r in got.iterrows():
        b = (int(r.bucket_ts.value) // 1000 - T0_US) // 86_400_000_000
        assert (
            int(r.open),
            int(r.high),
            int(r.low),
            int(r.close),
        ) == want[(r.source, b)], (r.source, b)


def test_rel_segment_priority_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import segment_priority_matrix

    g = np.random.default_rng(472)
    n_cust, n_ord = 60, 3000
    segs = np.array(["AUTO", "HOUSE", "MACH"])
    prios = np.array(["1-URGENT", "2-HIGH", "3-LOW"])
    ckeys = np.arange(1, n_cust + 1, dtype=np.int64)
    cseg = segs[g.integers(0, 3, n_cust)]
    cseg[:10] = "NICHE"  # planted: segment whose customers get only
    # URGENT orders -> its other priority cells must densify to zero
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(ckeys),
                "c_mktsegment": pa.array(cseg),
            }
        ),
        tmp_path / "customer.parquet",
    )
    ock = ckeys[g.integers(0, n_cust, n_ord)]
    opr = prios[g.integers(0, 3, n_ord)]
    seg_of = {int(k): s for k, s in zip(ckeys, cseg)}
    for i in range(n_ord):  # force NICHE customers to URGENT only
        if seg_of[int(ock[i])] == "NICHE":
            opr[i] = "1-URGENT"
    tot = g.uniform(100, 90000, n_ord)
    pq.write_table(
        pa.table(
            {
                "o_custkey": pa.array(ock),
                "o_orderpriority": pa.array(opr),
                "o_totalprice": pa.array(tot),
            }
        ),
        tmp_path / "orders.parquet",
    )

    want = collections.defaultdict(lambda: [0, 0])
    for k, p, v in zip(ock, opr, tot):
        w = want[(seg_of[int(k)], p)]
        w[0] += 1
        w[1] += math.floor(v)

    got = segment_priority_matrix(str(tmp_path)).to_pandas()
    assert len(got) == 4 * 3  # dense cross grid
    for _, r in got.iterrows():
        n, rev = want[(r.c_mktsegment, r.o_orderpriority)]
        assert int(r.n_orders) == n, (r.c_mktsegment, r.o_orderpriority)
        assert int(r.revenue_floor) == rev
    niche_low = got[
        (got.c_mktsegment == "NICHE") & (got.o_orderpriority == "3-LOW")
    ].iloc[0]
    assert int(niche_low.n_orders) == 0  # plant held
