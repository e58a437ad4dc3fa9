"""Round-4 wave-123 operators: E170 payload sign-run board (planted
chargeback storms — with a run crossing the ts-window boundary — pin
run counts), T177 stopword-rhythm board (planted prose vs keyword-spam
rhythms pin the run counts), R104 brand-repertoire histogram (planted
loyal vs variety shoppers pin every band) — each vs a scalar
brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_sign_runs_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_sign_runs

    base = np.datetime64("2026-07-01", "us").astype(np.int64)
    rows = []  # (source, ts_us, value)
    eid = 0

    def ev(s, t, v):
        nonlocal eid
        rows.append((s, t, eid, v))
        eid += 1

    # "ledger": + + - - - + 0 0 + (the chargeback storm of 3)
    seq = [5.0, 3.0, -2.0, -7.0, -1.0, 4.0, 0.2, 0.9, 6.0]
    t = base
    for v in seq:
        ev("ledger", t, v)
        t += 10_000_000
    # "storm": a negative run CROSSING the 60s window boundary
    t = base + 50_000_000
    for v in (-1.0, -2.0, -3.0):  # spans 50s..70s with 10s steps
        ev("storm", t, v)
        t += 10_000_000
    ev("storm", t, 9.0)
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
                "user_id": pa.array(np.zeros(n, np.int64)),
                "value": pa.array(np.array([r[3] for r in rows])),
            }
        ),
        tmp_path / "events.parquet",
    )

    got = (
        events_sign_runs(str(tmp_path), window_us=60_000_000)
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    per = collections.defaultdict(list)
    for s, t_, e, v in rows:
        per[s].append((t_, e, int(np.sign(np.floor(v)))))
    for s, evs in per.items():
        evs.sort()
        signs = [sg for _, _, sg in evs]
        runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
        neg_runs = sum(
            1
            for i, sg in enumerate(signs)
            if sg < 0 and (i == 0 or signs[i - 1] != sg)
        )
        row = got.loc[s]
        assert row["n_events"] == len(signs)
        assert row["n_negative"] == sum(1 for x in signs if x < 0)
        assert row["n_zero"] == sum(1 for x in signs if x == 0)
        assert row["n_runs"] == runs
        assert row["n_negative_runs"] == neg_runs
    # note: floor(0.2) == 0 -> zero class; floor(-1.0) == -1
    assert got.loc["ledger", "n_negative_runs"] == 1
    assert got.loc["ledger", "n_zero"] == 2
    assert got.loc["storm", "n_runs"] == 2   # window edge must not split


def test_doc_stopword_rhythm_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import stopword_rhythm

    stop = {"the", "a", "of", "and", "to", "in", "is"}
    rows = [  # (source, text)
        ("prose", "the quick fox is in the barn and sleeping now"),
        ("prose", "a dog"),
        ("spam", "buy cheap widgets great deals best prices"),
        ("legal", "the of and to in a is"),  # one giant stop run
        ("legal", "The UPPER case Of words"),  # case-insensitive match
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
        stopword_rhythm(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    want = collections.defaultdict(lambda: [0, 0, 0, 0])
    for s, txt in rows:
        flags = [w.lower() in stop for w in txt.split(" ")]
        c = want[s]
        c[0] += len(flags)
        c[1] += sum(flags)
        for i, f in enumerate(flags):
            if f and (i == 0 or not flags[i - 1]):
                c[2] += 1
            if not f and (i == 0 or flags[i - 1]):
                c[3] += 1
    assert list(got.index) == sorted(want)
    for s, (nw, nst, nsr, ncr) in want.items():
        row = got.loc[s]
        assert row["n_words"] == nw
        assert row["n_stopwords"] == nst
        assert row["n_stop_runs"] == nsr
        assert row["n_content_runs"] == ncr
    assert got.loc["spam", "n_stop_runs"] == 0
    assert got.loc["legal", "n_stop_runs"] == 3   # whole doc + "The" + "Of"


def test_rel_brand_repertoire_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import brand_repertoire

    part_brand = {1: "Brand#A", 2: "Brand#A", 3: "Brand#B", 4: "Brand#C"}
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(
                    np.array(list(part_brand), np.int64)
                ),
                "p_name": pa.array(["red thing"] * 4),
                "p_brand": pa.array(list(part_brand.values())),
                "p_type": pa.array(["ECONOMY"] * 4),
                "p_size": pa.array(np.ones(4, np.int64)),
                "p_retailprice": pa.array(np.full(4, 100.0)),
            }
        ),
        tmp_path / "part.parquet",
    )
    # orders: okey -> custkey
    order_cust = {10: 1, 11: 1, 20: 2, 30: 3}
    no = len(order_cust)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(
                    np.array(list(order_cust), np.int64)
                ),
                "o_custkey": pa.array(
                    np.array(list(order_cust.values()), np.int64)
                ),
                "o_orderstatus": pa.array(["O"] * no),
                "o_totalprice": pa.array(np.full(no, 100.0)),
                "o_orderdate": pa.array(
                    np.full(no, np.datetime64("2026-01-01", "us"))
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * no),
            }
        ),
        tmp_path / "orders.parquet",
    )
    # cust 1: parts 1, 2 (both Brand#A -> repertoire 1) across 2 orders
    # cust 2: parts 1, 3, 4 -> repertoire 3
    # cust 3: part 3 -> repertoire 1
    lines = [(10, 1), (10, 1), (11, 2), (20, 1), (20, 3), (20, 4), (30, 3)]
    n = len(lines)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(
                    np.array([l[0] for l in lines], np.int64)
                ),
                "l_partkey": pa.array(
                    np.array([l[1] for l in lines], np.int64)
                ),
                "l_suppkey": pa.array(np.ones(n, np.int64)),
                "l_linenumber": pa.array(np.ones(n, np.int32)),
                "l_quantity": pa.array(np.ones(n)),
                "l_extendedprice": pa.array(np.full(n, 100.0)),
                "l_discount": pa.array(np.zeros(n)),
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

    got = (
        brand_repertoire(str(tmp_path))
        .to_pandas()
        .set_index("n_brands")
        .sort_index()
    )
    per = collections.defaultdict(set)
    cnt = collections.Counter()
    for ok, pk in lines:
        ck = order_cust[ok]
        per[ck].add(part_brand[pk])
        cnt[ck] += 1
    want = collections.defaultdict(lambda: [0, 0])
    for ck, brands in per.items():
        want[len(brands)][0] += 1
        want[len(brands)][1] += cnt[ck]
    assert sorted(got.index) == sorted(want)
    for band, (nc, nl) in want.items():
        row = got.loc[band]
        assert row["n_customers"] == nc
        assert row["n_lines"] == nl
    assert got.loc[1, "n_customers"] == 2   # custs 1 and 3
    assert got.loc[3, "n_customers"] == 1
