"""Round-4 wave-132 operators: E179 amount-mode board (planted fixed
fees with an argmax tie pin the modal rows), T186 bigram-diversity board
(planted template vs prose transition breadth pin the permilles), R113
line-order coherence audit (planted entry-order vs fulfillment-order
sequences pin every counter) — each vs a scalar brute-force
reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_amount_mode_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_amount_mode

    base = np.datetime64("2026-07-01", "us").astype(np.int64)
    rows = []  # (source, value)
    # "fee": 9.99 dominates (15 of 20)
    rows += [("fee", 9.99)] * 15
    rows += [("fee", 12.50)] * 3 + [("fee", -1.25)] * 2
    # "tied": 5.00 and 7.00 both appear 4x -> smaller cents wins
    rows += [("tied", 7.00)] * 4 + [("tied", 5.00)] * 4 + [("tied", 9.0)]
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows]),
                "ts": pa.array(
                    base + np.arange(n, dtype=np.int64) * 1000
                ).cast(pa.timestamp("us")),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.zeros(n, np.int64)),
                "value": pa.array(np.array([r[1] for r in rows])),
            }
        ),
        tmp_path / "events.parquet",
    )

    got = (
        events_amount_mode(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    f = got.loc["fee"]
    assert f["n_events"] == 20
    assert f["modal_cents"] == 999
    assert f["modal_count"] == 15
    assert f["modal_permille"] == 750
    t = got.loc["tied"]
    assert t["modal_cents"] == 500   # tie resolves to the smaller amount
    assert t["modal_count"] == 4


def test_doc_bigram_diversity_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import bigram_diversity

    rows = [  # (source, text)
        ("template", "click here now click here now click here now"),
        ("template", "click here now"),
        ("prose", "the cat sat on a warm mat"),
        ("prose", "birds sing when dawn breaks gently"),
        ("prose", "x"),   # no bigrams
    ]
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array([r[1] for r in rows]),
                "lang": pa.array(["en"] * n),
                "source": pa.array([r[0] for r in rows]),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    got = (
        bigram_diversity(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    per = collections.defaultdict(collections.Counter)
    for s, txt in rows:
        ws = txt.split(" ")
        for a, b in zip(ws, ws[1:]):
            per[s][(a, b)] += 1
    for s, bg in per.items():
        row = got.loc[s]
        occ = sum(bg.values())
        assert row["n_bigrams"] == occ
        assert row["n_distinct_bigrams"] == len(bg)
        assert row["diversity_permille"] == 1000 * len(bg) // max(occ, 1)
    # template reuses few transitions
    assert (
        got.loc["template", "diversity_permille"]
        < got.loc["prose", "diversity_permille"]
    )
    assert "prose" in got.index and len(got) == 2  # the 1-word doc adds none


def test_rel_line_order_coherence_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import line_order_coherence

    day = 86_400_000_000
    d0 = np.datetime64("2026-01-05", "us").astype(np.int64)
    lines = []  # (okey, lineno, shipdate)
    # coherent order: ship dates rise with lineno
    for i in range(1, 5):
        lines.append((1, i, d0 + i * day))
    # incoherent: lineno 2 ships before lineno 1
    lines.append((2, 1, d0 + 10 * day))
    lines.append((2, 2, d0 + 3 * day))
    lines.append((2, 3, d0 + 12 * day))
    # equal-date order: no retreat -> coherent
    lines.append((3, 1, d0))
    lines.append((3, 2, d0))
    # single-line order: excluded from multi counts
    lines.append((4, 1, d0))
    n = len(lines)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(
                    np.array([l[0] for l in lines], np.int64)
                ),
                "l_partkey": pa.array(np.ones(n, np.int64)),
                "l_suppkey": pa.array(np.ones(n, np.int64)),
                "l_linenumber": pa.array(
                    np.array([l[1] for l in lines], np.int32)
                ),
                "l_quantity": pa.array(np.ones(n)),
                "l_extendedprice": pa.array(np.full(n, 100.0)),
                "l_discount": pa.array(np.zeros(n)),
                "l_tax": pa.array(np.zeros(n)),
                "l_returnflag": pa.array(["N"] * n),
                "l_linestatus": pa.array(["O"] * n),
                "l_shipdate": pa.array(
                    np.array([l[2] for l in lines], np.int64)
                ).cast(pa.timestamp("us")),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    got = line_order_coherence(str(tmp_path)).to_pandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert row["n_multi_orders"] == 3
    assert row["n_coherent_orders"] == 2   # orders 1 and 3
    assert row["n_pairs"] == 3 + 2 + 1     # per-order (nl - 1)
    assert row["n_inversions"] == 1        # order 2's retreat
