"""Round-4 wave-137 operators: E184 tenure-value coupling board
(planted maturing spenders pin each tenure band), T191
contamination-depth spectrum (planted verbatim copies vs shallow
overlaps pin the bands), R118 daily-demand spectrum (planted spike days
pin the volatility bands) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_tenure_value_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_tenure_value

    day = 86_400_000_000
    d0 = np.datetime64("2026-01-05", "us").astype(np.int64)
    rows = []  # (user, day_offset, value)
    # user 1: spends 10 on day 0, 20 on day 1, 40 on day 10, 80 on day 100
    for off, v in ((0, 10.0), (1, 20.0), (10, 40.0), (100, 80.0)):
        rows.append((1, off, v))
    # user 2: first event at a LATER date; tenure still starts at 0
    for off, v in ((50, 5.0), (51, 6.5)):
        rows.append((2, off, v))
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(["t"] * n),
                "ts": pa.array(
                    np.array(
                        [d0 + r[1] * day for r in rows], np.int64
                    )
                ).cast(pa.timestamp("us")),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(
                    np.array([r[0] for r in rows], np.int64)
                ),
                "value": pa.array(np.array([r[2] for r in rows])),
            }
        ),
        tmp_path / "events.parquet",
    )

    got = (
        events_tenure_value(str(tmp_path))
        .to_pandas()
        .set_index("tenure_band")
        .sort_index()
    )
    first = {}
    for u, off, _ in rows:
        first[u] = min(first.get(u, off), off)
    want = collections.defaultdict(lambda: [0, 0, 0])
    for u, off, v in rows:
        ten = off - first[u]
        band = 0 if ten <= 0 else len(bin(ten)) - 2
        fv = int(np.floor(v))
        c = want[band]
        c[0] += 1
        c[1] += fv
        c[2] += fv * fv
    assert sorted(got.index) == sorted(want)
    for band, (ne, sv, svv) in want.items():
        row = got.loc[band]
        assert row["n_events"] == ne
        assert row["sum_v"] == sv
        assert row["sum_v_sq"] == svv
    assert got.loc[0, "n_events"] == 2   # both users' first days
    assert got.loc[7, "sum_v"] == 80     # day-100 tenure (bin(100)=7)


def test_doc_contamination_depth_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import contamination_depth

    # eval docs (id < 10) define the shingle set
    eval_texts = [
        " ".join(f"e{d}w{j}" for j in range(12)) for d in range(3)
    ]
    rows = [(d, eval_texts[d], "ev") for d in range(3)]
    # verbatim copy of eval doc 0 -> many hits
    rows.append((100, eval_texts[0], "web"))
    # shallow overlap: shares exactly one 3-shingle with eval doc 1
    rows.append(
        (101, "x1 x2 x3 e1w0 e1w1 e1w2 y1 y2 y3 y4", "web")
    )
    # clean doc
    rows.append((102, "clean words only here today friends", "web"))
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.array([r[0] for r in rows], np.int64)),
                "text": pa.array([r[1] for r in rows]),
                "lang": pa.array(["en"] * n),
                "source": pa.array([r[2] for r in rows]),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    got = (
        contamination_depth(str(tmp_path))
        .to_pandas()
        .set_index(["source", "depth_band"])
        .sort_index()
    )
    # the verbatim copy hits all 10 distinct shingles of eval doc 0
    # (12 words -> 10 shingles) -> band len(bin(10)) = 4
    assert got.loc[("web", 4), "n_docs"] == 1
    assert got.loc[("web", 1), "n_docs"] == 1    # the shallow overlap
    # eval docs hit themselves fully (10 shingles each)
    assert got.loc[("ev", 4), "n_docs"] == 3
    assert ("web", 2) not in got.index


def test_rel_daily_demand_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import daily_demand_spectrum

    day = 86_400_000_000
    d0 = np.datetime64("2026-01-05", "us").astype(np.int64)
    rows = []
    # steady days: 10 days × 3 orders (band 2)
    for d in range(10):
        rows += [d0 + d * day] * 3
    # spike day: 40 orders (band 6)
    rows += [d0 + 20 * day] * 40
    # quiet day: 1 order (band 1)
    rows.append(d0 + 30 * day)
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "o_custkey": pa.array(np.ones(n, np.int64)),
                "o_orderstatus": pa.array(["O"] * n),
                "o_totalprice": pa.array(np.full(n, 100.0)),
                "o_orderdate": pa.array(
                    np.array(rows, np.int64)
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n),
            }
        ),
        tmp_path / "orders.parquet",
    )

    got = (
        daily_demand_spectrum(str(tmp_path))
        .to_pandas()
        .set_index("volume_band")
        .sort_index()
    )
    per = collections.Counter(r // day for r in rows)
    want = collections.defaultdict(lambda: [0, 0])
    for _, c in per.items():
        band = len(bin(c)) - 2
        want[band][0] += 1
        want[band][1] += c
    assert sorted(got.index) == sorted(want)
    for band, (nd, no) in want.items():
        row = got.loc[band]
        assert row["n_days"] == nd
        assert row["n_orders"] == no
    assert got.loc[6, "n_orders"] == 40
    assert got.loc[2, "n_days"] == 10
