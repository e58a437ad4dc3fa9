"""Round-4 wave-42 operators: E97 value-band heatmap (per-source
floor(value)//50 histogram), T89 n_chars metadata-integrity audit (the
fixture plants deliberate lies), R28 order-status x year matrix — each
vs a scalar brute-force reference."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MIN_US = 60_000_000


def test_value_bands_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import (
        EVENTS_T0_US,
        events_value_bands,
    )

    g = np.random.default_rng(290)
    n = 1500
    types = np.array(["a", "b", "c"])[g.integers(0, 3, n)]
    val = g.uniform(0, 500, n)
    val[:5] = [0.0, 49.999, 50.0, 99.5, 100.0]  # band edges
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(types.tolist()),
                "ts": pa.array(
                    np.full(n, EVENTS_T0_US), pa.int64()
                ).cast(pa.timestamp("us")),
                "value": pa.array(val),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.zeros(n, np.int64)),
            }
        ),
        tmp_path / "events.parquet",
    )

    want = collections.Counter()
    for t, v in zip(types, val):
        want[(t, int(math.floor(v)) // 50)] += 1

    got = events_value_bands(str(tmp_path)).to_pandas()
    assert {
        (r.source, int(r.band)): int(r.n_events) for r in got.itertuples()
    } == dict(want)
    assert int(got.n_events.sum()) == n


def test_length_integrity_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import length_integrity

    g = np.random.default_rng(291)
    n = 400
    srcs = np.array(["web", "book", "code"])[g.integers(0, 3, n)]
    texts = ["x" * int(k) + "é" * int(u) for k, u in zip(
        g.integers(1, 40, n), g.integers(0, 4, n)
    )]
    n_chars = np.array([len(t) for t in texts], np.int64)
    lie = g.random(n) < 0.15  # plant metadata lies
    n_chars = np.where(lie, n_chars + 7, n_chars)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * n),
                "source": pa.array(srcs.tolist()),
                "n_chars": pa.array(n_chars),
            }
        ),
        tmp_path / "documents.parquet",
    )

    want = collections.defaultdict(lambda: [0, 0])
    for s, bad in zip(srcs, lie):
        want[s][0] += 1
        want[s][1] += int(bad)

    got = length_integrity(str(tmp_path)).to_pandas().set_index("source")
    assert len(got) == len(want)
    assert int(got.n_mismatched.sum()) == int(lie.sum()) > 0
    for s, (nd, bad) in want.items():
        assert (got.loc[s].n_docs, got.loc[s].n_mismatched) == (nd, bad), s


def test_status_year_matrix_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import status_year_matrix

    g = np.random.default_rng(292)
    n = 1100
    stat = np.array(["O", "F", "P"])[g.integers(0, 3, n)]
    # dates spread over 1995-1998
    base = np.datetime64("1995-01-01", "us").astype(np.int64)
    day_us = 86_400_000_000
    off = g.integers(0, 4 * 365, n).astype(np.int64)
    ts = base + off * day_us
    price = g.uniform(100, 90000, n)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "o_custkey": pa.array(np.zeros(n, np.int64)),
                "o_orderstatus": pa.array(stat.tolist()),
                "o_totalprice": pa.array(price),
                "o_orderdate": pa.array(ts, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * n),
            }
        ),
        tmp_path / "orders.parquet",
    )

    yr = ts.astype("datetime64[us]").astype("datetime64[Y]").astype(
        np.int64
    ) + 1970
    want = collections.defaultdict(lambda: [0, 0])
    for s, y, p in zip(stat, yr, price):
        w = want[(s, int(y))]
        w[0] += 1
        w[1] += int(math.floor(p))

    got = status_year_matrix(str(tmp_path)).to_pandas()
    assert {
        (r.o_orderstatus, int(r.o_year)): (int(r.n_orders), int(r.revenue_floor))
        for r in got.itertuples()
    } == {k: tuple(v) for k, v in want.items()}
