"""Round-4 wave-117 operators: E164 coverage-drift sufficient stats
(planted thinning vs steady weekly duty cycles pin all six sums), T171
embedding quantization audit (planted integer/half-step lattices pin
every counter), R98 discount-latency board (planted slow clearance
discounts pin each cent cell) — each vs a scalar brute-force
reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_coverage_drift_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_coverage_drift

    minute = 60_000_000
    week_min = 1440 * 7
    base_week = 2900  # epoch week index
    rows = []  # (source, ts_us)
    # "dying": active minutes shrink 100, 60, 20 across 3 weeks;
    # duplicate events in the same minute must not double-count
    for wi, am in enumerate((100, 60, 20)):
        w = base_week + wi
        for m in range(am):
            ts = (w * week_min + m) * minute
            rows.append(("dying", ts))
            rows.append(("dying", ts + 1000))  # same minute dup
    # "steady": 50 active minutes per week for 2 weeks
    for wi in range(2):
        w = base_week + wi
        for m in range(50):
            rows.append(("steady", (w * week_min + m * 3) * minute))
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows]),
                "ts": pa.array(
                    np.array([r[1] for r in rows], np.int64)
                ).cast(pa.timestamp("us")),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.zeros(n, np.int64)),
                "value": pa.array(np.ones(n)),
            }
        ),
        tmp_path / "events.parquet",
    )

    got = (
        events_coverage_drift(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    per = collections.defaultdict(set)
    for s, ts in rows:
        per[s].add(ts // minute)
    want = {}
    for s, mins in per.items():
        wk = collections.Counter(m // week_min for m in mins)
        ws = sorted(wk)
        want[s] = (
            len(ws),
            sum(ws),
            sum(w * w for w in ws),
            sum(wk.values()),
            sum(c * c for c in wk.values()),
            sum(w * wk[w] for w in ws),
        )
    assert list(got.index) == sorted(want)
    for s, (nw, sw, sww, sm, smm, swm) in want.items():
        row = got.loc[s]
        assert row["n_weeks"] == nw
        assert row["sum_w"] == sw
        assert row["sum_w_sq"] == sww
        assert row["sum_m"] == sm
        assert row["sum_m_sq"] == smm
        assert row["sum_w_m"] == swm
    assert got.loc["dying", "sum_m"] == 180
    assert got.loc["steady", "sum_m"] == 100


def test_embedding_quantization_audit_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import (
        embedding_quantization_audit,
    )

    vecs = [
        [1.0, 2.0, -3.0, 0.0],        # fully integer vector
        [1.5, 2.0, 3.25, 4.0],        # 1 half-step, 2 int, 1 neither
        [0.1, 0.2, 0.3, 0.4],         # none on the lattice (f32 values)
        [5.0, -0.5, 7.5, 8.0],        # 2 int, 2 half
    ]
    n = len(vecs)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array(np.zeros(n, np.int32)),
            }
        ),
        tmp_path / "embeddings.parquet",
    )

    got = embedding_quantization_audit(str(tmp_path)).to_pandas()
    assert len(got) == 1
    row = got.iloc[0]
    arr = np.array(
        pq.read_table(tmp_path / "embeddings.parquet")["embedding"]
        .combine_chunks()
        .flatten()
    ).astype(np.float64)
    nint = int((arr == np.floor(arr)).sum())
    nhalf = int(
        ((arr != np.floor(arr)) & (2 * arr == np.floor(2 * arr))).sum()
    )
    assert row["n_components"] == 16
    assert row["n_integer"] == nint
    assert row["n_half_step"] == nhalf
    assert row["n_integer_vectors"] == 1
    assert row["n_vectors"] == 4
    assert nint == 4 + 2 + 0 + 2 - 1 + 1  # 8: sanity of the plant
    assert nhalf == 3                      # 1.5, -0.5, 7.5


def test_rel_discount_latency_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import discount_latency

    g = np.random.default_rng(857)
    day = 86_400_000_000
    d0 = np.datetime64("2026-01-05", "us").astype(np.int64)
    orders = []  # (okey, odate)
    lines = []   # (okey, shipdate, discount)
    okey = 0
    # planted: 0% discount ships in 2-5 days; 10% discount (clearance)
    # ships in 30-40 days
    for cent, lat_rng in ((0, (2, 6)), (10, (30, 41)), (5, (10, 15))):
        for _ in range(20):
            okey += 1
            od = d0 + int(g.integers(0, 100)) * day
            orders.append((okey, od))
            lines.append(
                (okey, od + int(g.integers(*lat_rng)) * day, cent / 100.0)
            )
    no, nl = len(orders), len(lines)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(
                    np.array([o[0] for o in orders], np.int64)
                ),
                "o_custkey": pa.array(np.ones(no, np.int64)),
                "o_orderstatus": pa.array(["O"] * no),
                "o_totalprice": pa.array(np.full(no, 100.0)),
                "o_orderdate": pa.array(
                    np.array([o[1] for o in orders], np.int64)
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * no),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(
                    np.array([l[0] for l in lines], np.int64)
                ),
                "l_partkey": pa.array(np.ones(nl, np.int64)),
                "l_suppkey": pa.array(np.ones(nl, np.int64)),
                "l_linenumber": pa.array(np.ones(nl, np.int32)),
                "l_quantity": pa.array(np.ones(nl)),
                "l_extendedprice": pa.array(np.full(nl, 100.0)),
                "l_discount": pa.array(
                    np.array([l[2] for l in lines])
                ),
                "l_tax": pa.array(np.zeros(nl)),
                "l_returnflag": pa.array(["N"] * nl),
                "l_linestatus": pa.array(["O"] * nl),
                "l_shipdate": pa.array(
                    np.array([l[1] for l in lines], np.int64)
                ).cast(pa.timestamp("us")),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    odate = dict(orders)
    want = collections.defaultdict(lambda: [0, 0, 0])
    for okey, sd, disc in lines:
        cent = int(round(disc * 100))
        gap = sd // day - odate[okey] // day
        c = want[cent]
        c[0] += 1
        c[1] += gap
        c[2] += gap * gap

    got = (
        discount_latency(str(tmp_path))
        .to_pandas()
        .set_index("discount_cent")
        .sort_index()
    )
    assert sorted(got.index) == sorted(want)
    for cent, (nl_, sd_, sdd) in want.items():
        row = got.loc[cent]
        assert row["n_lines"] == nl_
        assert row["sum_days"] == sd_
        assert row["sum_days_sq"] == sdd
    # clearance mean latency strictly above full-price
    assert (
        got.loc[10, "sum_days"] * got.loc[0, "n_lines"]
        > got.loc[0, "sum_days"] * got.loc[10, "n_lines"]
    )
