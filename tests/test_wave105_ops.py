"""Round-4 wave-105 operators: E152 user-id assignment-order audit
(planted sequential vs shuffled registration orders — with a first-seen
pair crossing the ts-window boundary — pin ascent counts), T159
document-id integrity audit (planted dup/cross-source ids pin every
counter), R86 sourcing-geography matrix (planted nation × brand cells
pin lines/qty/revenue) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_user_id_order_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_user_id_order

    base = np.datetime64("2026-07-01", "us").astype(np.int64)
    rows = []  # (source, ts_us, event_id, user_id)
    eid = 0

    def ev(s, t, u):
        nonlocal eid
        rows.append((s, t, eid, u))
        eid += 1

    # "seq": users first appear in ascending id order 10,20,30,40 —
    # the 40 arrives 120s later (crosses the window_us=60s boundary);
    # repeat events must NOT create new first-seens
    ev("seq", base + 1_000_000, 10)
    ev("seq", base + 2_000_000, 20)
    ev("seq", base + 2_500_000, 10)     # repeat
    ev("seq", base + 3_000_000, 30)
    ev("seq", base + 123_000_000, 40)   # next window
    # "shuf": first-seen order 50, 5, 99, 1 -> ascents: 5->99 only
    for t, u in ((1, 50), (2, 5), (3, 99), (4, 1)):
        ev("shuf", base + t * 1_000_000, u)
    # "lone": one user
    ev("lone", base, 7)

    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows]),
                "ts": pa.array(
                    np.array([r[1] for r in rows], np.int64)
                ).cast(pa.timestamp("us")),
                "event_id": pa.array(
                    np.array([r[2] for r in rows], np.int64)
                ),
                "user_id": pa.array(
                    np.array([r[3] for r in rows], np.int64)
                ),
                "value": pa.array(np.ones(n)),
            }
        ),
        tmp_path / "events.parquet",
    )

    got = (
        events_user_id_order(str(tmp_path), window_us=60_000_000)
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    first = {}
    for s, t, e, u in rows:
        k = (s, u)
        if k not in first or (t, e) < first[k]:
            first[k] = (t, e)
    per = collections.defaultdict(list)
    for (s, u), (t, e) in first.items():
        per[s].append((t, e, u))
    assert list(got.index) == sorted(per)
    for s, cells in per.items():
        cells.sort()
        us = [u for _, _, u in cells]
        asc = sum(1 for a, b in zip(us, us[1:]) if b > a)
        row = got.loc[s]
        assert row["n_users"] == len(us)
        assert row["n_pairs"] == len(us) - 1
        assert row["n_ascending"] == asc
        assert row["asc_permille"] == 1000 * asc // max(len(us) - 1, 1)
    assert got.loc["seq", "n_users"] == 4
    assert got.loc["seq", "n_ascending"] == 3      # incl. cross-window
    assert got.loc["shuf", "n_ascending"] == 1
    assert got.loc["lone", "n_pairs"] == 0


def test_doc_id_integrity_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import doc_id_integrity

    rows = [  # (doc_id, source)
        (1, "a"), (2, "a"), (3, "a"),
        (2, "a"),            # same-source dup (mult 2)
        (7, "b"), (8, "b"),
        (3, "b"),            # cross-source dup
        (9, "c"), (9, "c"), (9, "c"),  # mult 3
    ]
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.array([r[0] for r in rows], np.int64)),
                "text": pa.array(["x y z"] * n),
                "lang": pa.array(["en"] * n),
                "source": pa.array([r[1] for r in rows]),
                "n_chars": pa.array([5] * n, pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    got = doc_id_integrity(str(tmp_path)).to_pandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert row["n_docs"] == 10
    assert row["n_distinct_ids"] == 6     # 1,2,3,7,8,9
    assert row["n_dup_ids"] == 3          # 2 (x2), 3 (x2), 9 (x3)
    assert row["max_multiplicity"] == 3
    assert row["n_cross_source_ids"] == 1  # id 3 in a and b


def test_rel_sourcing_geography_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import sourcing_geography

    g = np.random.default_rng(843)
    # nations 0..2; suppliers: 1,2 -> nation 0; 3 -> nation 1; 4 -> 2
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(np.arange(3, dtype=np.int64)),
                "n_name": pa.array(["ALPHA", "BETA", "GAMMA"]),
                "n_regionkey": pa.array(np.zeros(3, np.int64)),
            }
        ),
        tmp_path / "nation.parquet",
    )
    sup_nat = {1: 0, 2: 0, 3: 1, 4: 2}
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(np.array(list(sup_nat), np.int64)),
                "s_name": pa.array(
                    [f"Supplier#{k:09d}" for k in sup_nat]
                ),
                "s_nationkey": pa.array(
                    np.array(list(sup_nat.values()), np.int64)
                ),
                "s_acctbal": pa.array(np.zeros(4)),
            }
        ),
        tmp_path / "supplier.parquet",
    )
    part_brand = {10: "Brand#X", 11: "Brand#X", 12: "Brand#Y"}
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(np.array(list(part_brand), np.int64)),
                "p_name": pa.array(["red thing"] * 3),
                "p_brand": pa.array(list(part_brand.values())),
                "p_type": pa.array(["ECONOMY"] * 3),
                "p_size": pa.array(np.ones(3, np.int64)),
                "p_retailprice": pa.array(np.full(3, 100.0)),
            }
        ),
        tmp_path / "part.parquet",
    )
    sk, pk, qty, ep, dc = [], [], [], [], []
    for _ in range(200):
        sk.append(int(g.integers(1, 5)))
        pk.append(int(g.choice([10, 11, 12])))
        qty.append(float(g.integers(1, 30)))
        ep.append(float(g.uniform(50, 800)))
        dc.append(float(g.integers(0, 10)) / 100.0)
    n = len(sk)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "l_partkey": pa.array(np.array(pk, np.int64)),
                "l_suppkey": pa.array(np.array(sk, np.int64)),
                "l_linenumber": pa.array(np.ones(n, np.int32)),
                "l_quantity": pa.array(np.array(qty)),
                "l_extendedprice": pa.array(np.array(ep)),
                "l_discount": pa.array(np.array(dc)),
                "l_tax": pa.array(np.zeros(n)),
                "l_returnflag": pa.array(["N"] * n),
                "l_linestatus": pa.array(["O"] * n),
                "l_shipdate": pa.array(
                    np.full(n, np.datetime64("2026-01-01", "us"))
                ),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    nat_name = ["ALPHA", "BETA", "GAMMA"]
    want = collections.defaultdict(lambda: [0, 0, 0])
    for s, p, q, e, d in zip(sk, pk, qty, ep, dc):
        key = (nat_name[sup_nat[s]], part_brand[p])
        c = want[key]
        c[0] += 1
        c[1] += int(np.floor(q))
        c[2] += int(np.floor(e * (1.0 - d)))

    got = (
        sourcing_geography(str(tmp_path))
        .to_pandas()
        .set_index(["nation", "brand"])
        .sort_index()
    )
    assert set(got.index) == set(want)
    for key, (nl, q, r) in want.items():
        row = got.loc[key]
        assert row["n_lines"] == nl
        assert row["qty_floor"] == q
        assert row["revenue_floor"] == r
