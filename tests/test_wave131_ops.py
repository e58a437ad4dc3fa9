"""Round-4 wave-131 operators: E178 simultaneity matrix (planted
one-credential-two-feeds minutes pin every pair cell), T185 embedding
selection-bias board (planted quality-skewed embedded subset pins both
rows), R112 reconciliation drift board (planted per-year loader
regression pins the trend) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections
import itertools

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_simultaneity_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_simultaneity

    base = np.datetime64("2026-07-01", "us").astype(np.int64)
    minute = 60_000_000
    rows = []  # (source, ts_us, user)
    # the bot: user 7 active on "a" AND "b" in minutes 0..4
    for m in range(5):
        rows.append(("a", base + m * minute + 1000, 7))
        rows.append(("b", base + m * minute + 2000, 7))
    # a human: user 1 alternates (no same-minute overlap)
    rows.append(("a", base + 10 * minute, 1))
    rows.append(("b", base + 11 * minute, 1))
    # dup events in the same (user, minute, source) must dedupe
    rows.append(("a", base + 1000, 7))
    # "c": never simultaneous with anyone
    rows.append(("c", base + 20 * minute, 2))
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows]),
                "ts": pa.array(
                    np.array([r[1] for r in rows], np.int64)
                ).cast(pa.timestamp("us")),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(
                    np.array([r[2] for r in rows], np.int64)
                ),
                "value": pa.array(np.ones(n)),
            }
        ),
        tmp_path / "events.parquet",
    )

    got = (
        events_simultaneity(str(tmp_path))
        .to_pandas()
        .set_index(["source_i", "source_j"])
        .sort_index()
    )
    cells = collections.defaultdict(set)
    for s, ts, u in rows:
        cells[s].add((u, ts // minute))
    names = sorted(cells)
    for si, sj in itertools.combinations(names, 2):
        row = got.loc[(si, sj)]
        assert row["cells_both"] == len(cells[si] & cells[sj])
        assert row["cells_i"] == len(cells[si])
        assert row["cells_j"] == len(cells[sj])
    assert got.loc[("a", "b"), "cells_both"] == 5
    assert got.loc[("a", "c"), "cells_both"] == 0


def test_embedding_selection_bias_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import embedding_selection_bias

    stop7 = ["the", "a", "of", "and", "to", "in", "is"]

    def good(i):
        return " ".join((stop7 * 2)[:8] + [f"w{i}x{j}" for j in range(22)])

    def bad(i):
        return f"short bad doc {i}"

    rows = []  # (doc_id, text)
    # linked docs 100..109: 8 good, 2 bad
    for i in range(8):
        rows.append((100 + i, good(i)))
    rows.append((108, bad(108)))
    rows.append((109, bad(109)))
    # unlinked docs 200..209: 2 good, 8 bad
    rows.append((200, good(200)))
    rows.append((201, good(201)))
    for i in range(202, 210):
        rows.append((i, bad(i)))
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.array([r[0] for r in rows], np.int64)),
                "text": pa.array([r[1] for r in rows]),
                "lang": pa.array(["en"] * n),
                "source": pa.array(["s"] * n),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    vec_ids = list(range(100, 110)) + [999]   # 999 is an orphan vector
    nv = len(vec_ids)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.array(vec_ids, np.int64)),
                "embedding": pa.array(
                    [[1.0, 2.0]] * nv, pa.list_(pa.float32())
                ),
                "label": pa.array(np.zeros(nv, np.int32)),
            }
        ),
        tmp_path / "embeddings.parquet",
    )

    got = (
        embedding_selection_bias(str(tmp_path))
        .to_pandas()
        .set_index("linked")
        .sort_index()
    )
    linked = got.loc[1]
    unlinked = got.loc[0]
    assert linked["n_docs"] == 10
    assert unlinked["n_docs"] == 10
    assert linked["n_pass_all"] == 8
    assert unlinked["n_pass_all"] == 2
    assert linked["pass_permille"] == 800
    assert unlinked["pass_permille"] == 200


def test_rel_reconciliation_drift_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import reconciliation_drift

    orders = []  # (okey, year, totalprice)
    lines = []   # (okey, ep, disc, tax)

    def charge(ep, d, t):
        return int(np.floor(ep * (1.0 - d) * (1.0 + t)))

    okey = 0
    # 2024: clean books — header equals the floored line sums
    for _ in range(10):
        okey += 1
        eps = [(500.0, 0.05, 0.02), (300.0, 0.0, 0.01)]
        tot = sum(charge(*e) for e in eps)
        orders.append((okey, 2024, float(tot)))
        for e in eps:
            lines.append((okey, *e))
    # 2025: regression — headers off by +7 each
    for _ in range(10):
        okey += 1
        eps = [(400.0, 0.1, 0.03)]
        tot = sum(charge(*e) for e in eps) + 7
        orders.append((okey, 2025, float(tot)))
        for e in eps:
            lines.append((okey, *e))
    # a childless order in 2024
    okey += 1
    orders.append((okey, 2024, 123.0))
    no, nl = len(orders), len(lines)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(
                    np.array([o[0] for o in orders], np.int64)
                ),
                "o_custkey": pa.array(np.ones(no, np.int64)),
                "o_orderstatus": pa.array(["O"] * no),
                "o_totalprice": pa.array(
                    np.array([o[2] for o in orders])
                ),
                "o_orderdate": pa.array(
                    np.array(
                        [
                            np.datetime64(f"{o[1]}-03-01", "us").astype(
                                np.int64
                            )
                            for o in orders
                        ],
                        np.int64,
                    )
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
                "l_extendedprice": pa.array(
                    np.array([l[1] for l in lines])
                ),
                "l_discount": pa.array(np.array([l[2] for l in lines])),
                "l_tax": pa.array(np.array([l[3] for l in lines])),
                "l_returnflag": pa.array(["N"] * nl),
                "l_linestatus": pa.array(["O"] * nl),
                "l_shipdate": pa.array(
                    np.full(nl, np.datetime64("2026-01-01", "us"))
                ),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    got = (
        reconciliation_drift(str(tmp_path))
        .to_pandas()
        .set_index("order_year")
        .sort_index()
    )
    y24 = got.loc[2024]
    assert y24["n_orders"] == 11
    assert y24["n_childless"] == 1
    assert y24["n_mismatched"] == 0
    assert y24["abs_delta_total"] == 0
    y25 = got.loc[2025]
    assert y25["n_orders"] == 10
    assert y25["n_mismatched"] == 10
    assert y25["abs_delta_total"] == 70
