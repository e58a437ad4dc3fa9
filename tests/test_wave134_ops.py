"""Round-4 wave-134 operators: E181 weekpart value split (planted
weekend-premium payloads pin both rows incl. a zeroed part), T188
word-prefix spectrum (planted derivational prefixes pin the cells),
R115 activity-intensity trend (planted retention-vs-acquisition years
pin the ratios) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_weekpart_value_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_weekpart_value

    day = 86_400_000_000
    mon = np.datetime64("2026-07-06", "us").astype(np.int64)
    sat = mon + 5 * day
    rows = []  # (source, ts_us, value)
    # "retail": weekday tickets 10, weekend tickets 25
    for d in range(5):
        rows.append(("retail", mon + d * day, 10.5))
    for d in range(2):
        rows.append(("retail", sat + d * day, 25.25))
    # "office": weekday only -> weekend row must exist zeroed
    for d in range(3):
        rows.append(("office", mon + d * day, 100.0))
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
                "value": pa.array(np.array([r[2] for r in rows])),
            }
        ),
        tmp_path / "events.parquet",
    )

    got = (
        events_weekpart_value(str(tmp_path))
        .to_pandas()
        .set_index(["source", "weekend"])
        .sort_index()
    )
    want = collections.defaultdict(lambda: [0, 0, 0])
    srcs = set()
    for s, ts, v in rows:
        srcs.add(s)
        wk = 1 if (ts // day + 3) % 7 >= 5 else 0
        fv = int(np.floor(v))
        c = want[(s, wk)]
        c[0] += 1
        c[1] += fv
        c[2] += fv * fv
    for s in srcs:
        for wk in (0, 1):
            ne, sv, svv = want.get((s, wk), (0, 0, 0))
            row = got.loc[(s, wk)]
            assert row["n_events"] == ne
            assert row["sum_v"] == sv
            assert row["sum_v_sq"] == svv
    assert got.loc[("office", 1), "n_events"] == 0   # dense zero row
    assert got.loc[("retail", 1), "sum_v"] == 2 * 25


def test_doc_word_prefixes_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import word_prefix_spectrum

    texts = [
        "undo unfit unfit redo rerun rerun rerun cat",
        "under redo ox a",
    ]
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * n),
                "source": pa.array(["s"] * n),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    tf = collections.Counter()
    for t in texts:
        tf.update(t.split(" "))
    want = collections.defaultdict(lambda: [0, 0])
    for w, f in tf.items():
        want[w[:2]][0] += 1
        want[w[:2]][1] += f
    got = (
        word_prefix_spectrum(str(tmp_path))
        .to_pandas()
        .set_index("prefix")
        .sort_index()
    )
    assert sorted(got.index) == sorted(want)
    for pref, (nw, occ) in want.items():
        row = got.loc[pref]
        assert row["n_words"] == nw
        assert row["n_occurrences"] == occ
    assert got.loc["un", "n_words"] == 3   # undo, unfit, under
    assert got.loc["re", "n_occurrences"] == 2 + 3  # redo x2, rerun x3
    assert got.loc["a", "n_words"] == 1    # whole short word


def test_rel_activity_intensity_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import activity_intensity_trend

    rows = []  # (custkey, year)
    # 2024: 10 customers, 1 order each (acquisition year)
    for ck in range(1, 11):
        rows.append((ck, 2024))
    # 2025: same 5 customers, 4 orders each (retention year)
    for ck in range(1, 6):
        rows += [(ck, 2025)] * 4
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "o_custkey": pa.array(
                    np.array([r[0] for r in rows], np.int64)
                ),
                "o_orderstatus": pa.array(["O"] * n),
                "o_totalprice": pa.array(np.full(n, 100.0)),
                "o_orderdate": pa.array(
                    np.array(
                        [
                            np.datetime64(f"{r[1]}-05-01", "us").astype(
                                np.int64
                            )
                            for r in rows
                        ],
                        np.int64,
                    )
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n),
            }
        ),
        tmp_path / "orders.parquet",
    )

    got = (
        activity_intensity_trend(str(tmp_path))
        .to_pandas()
        .set_index("order_year")
        .sort_index()
    )
    y24 = got.loc[2024]
    assert y24["n_orders"] == 10
    assert y24["n_active_customers"] == 10
    assert y24["orders_per_k"] == 1000
    y25 = got.loc[2025]
    assert y25["n_orders"] == 20
    assert y25["n_active_customers"] == 5
    assert y25["orders_per_k"] == 4000
