"""Round-4 wave-136 operators: E183 amount-diversity board (planted
price-list vs continuous sources pin the permilles), T190 per-source
length-drift sufficient stats (planted collapsing parser pins the
slope inputs), R117 price-ending spectrum (planted charm pricing pins
the 99s) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_amount_diversity_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_amount_diversity

    rows = []  # (source, value)
    # "menu": 100 events over exactly 3 amounts
    for i in range(100):
        rows.append(("menu", [4.99, 9.99, 19.99][i % 3]))
    # "sensor": 20 events all distinct
    for i in range(20):
        rows.append(("sensor", 1.0 + i * 0.07))
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows]),
                "ts": pa.array(
                    np.datetime64("2026-07-01", "us").astype(np.int64)
                    + np.arange(n, dtype=np.int64) * 1000
                ).cast(pa.timestamp("us")),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.zeros(n, np.int64)),
                "value": pa.array(np.array([r[1] for r in rows])),
            }
        ),
        tmp_path / "events.parquet",
    )

    got = (
        events_amount_diversity(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    per = collections.defaultdict(set)
    cnt = collections.Counter()
    for s, v in rows:
        per[s].add(int(np.rint(v * 100)))
        cnt[s] += 1
    for s in per:
        row = got.loc[s]
        assert row["n_events"] == cnt[s]
        assert row["n_distinct_amounts"] == len(per[s])
        assert row["diversity_permille"] == 1000 * len(per[s]) // cnt[s]
    assert got.loc["menu", "n_distinct_amounts"] == 3
    assert got.loc["sensor", "diversity_permille"] == 1000


def test_doc_source_length_drift_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import source_length_drift

    rows = []  # (doc_id, source, n_chars)
    # "broken": lengths collapse with id
    for i, ln in enumerate((500, 400, 300, 200, 100)):
        rows.append((1000 + i, "broken", ln))
    # "steady": flat
    for i in range(4):
        rows.append((2000 + i, "steady", 250))
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.array([r[0] for r in rows], np.int64)),
                "text": pa.array(["x" * r[2] for r in rows]),
                "lang": pa.array(["en"] * n),
                "source": pa.array([r[1] for r in rows]),
                "n_chars": pa.array(
                    np.array([r[2] for r in rows], np.int64)
                ),
            }
        ),
        tmp_path / "documents.parquet",
    )

    got = (
        source_length_drift(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    per = collections.defaultdict(list)
    for i, s, ln in rows:
        per[s].append((i, ln))
    for s, cells in per.items():
        row = got.loc[s]
        assert row["n_docs"] == len(cells)
        assert row["sum_i"] == sum(i for i, _ in cells)
        assert row["sum_i_sq"] == sum(i * i for i, _ in cells)
        assert row["sum_len"] == sum(l for _, l in cells)
        assert row["sum_len_sq"] == sum(l * l for _, l in cells)
        assert row["sum_i_len"] == sum(i * l for i, l in cells)
    # the covariance sign check: broken source drifts negative
    b = got.loc["broken"]
    n_ = b["n_docs"]
    cov = n_ * b["sum_i_len"] - b["sum_i"] * b["sum_len"]
    assert cov < 0


def test_rel_price_endings_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import price_ending_spectrum

    g = np.random.default_rng(873)
    prices = []
    # charm pricing: 40 orders ending .99
    for _ in range(40):
        prices.append(float(int(g.integers(10, 500))) + 0.99)
    # round invoicing: 25 ending .00
    for _ in range(25):
        prices.append(float(int(g.integers(10, 500))))
    # computed: random cents
    for _ in range(35):
        prices.append(float(np.round(g.uniform(10, 500), 2)))
    n = len(prices)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "o_custkey": pa.array(np.ones(n, np.int64)),
                "o_orderstatus": pa.array(["O"] * n),
                "o_totalprice": pa.array(np.array(prices)),
                "o_orderdate": pa.array(
                    np.full(n, np.datetime64("2026-01-01", "us"))
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * n),
            }
        ),
        tmp_path / "orders.parquet",
    )

    want = collections.defaultdict(lambda: [0, 0])
    for p in prices:
        cents = int(np.rint(p * 100))
        c = want[cents % 100]
        c[0] += 1
        c[1] += cents
    got = (
        price_ending_spectrum(str(tmp_path))
        .to_pandas()
        .set_index("cent_ending")
        .sort_index()
    )
    assert sorted(got.index) == sorted(want)
    for e, (no, sv) in want.items():
        row = got.loc[e]
        assert row["n_orders"] == no
        assert row["cents_total"] == sv
    assert got.loc[99, "n_orders"] >= 40
    assert got.loc[0, "n_orders"] >= 25
