"""Round-4 wave-128 operators: E175 acquisition clock board (planted
3am bot-signup spike pins the clock; repeats must not re-acquire), T182
bigram-symmetry board (planted asymmetric prose vs symmetric soup pin
every counter), R109 balance-ticket coupling stats (planted indebted
big-spenders pin all six sums) — each vs a scalar brute-force
reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_acquisition_clock_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_acquisition_clock

    base = np.datetime64("2026-07-01", "us").astype(np.int64)
    hour = 3_600_000_000
    rows = []  # (source, ts_us, user)
    eid = 0

    def ev(s, t, u):
        nonlocal eid
        rows.append((s, t, eid, u))
        eid += 1

    # "app": bots first appear at 03:xx (users 100..109); their later
    # daytime activity must NOT count again
    for u in range(100, 110):
        ev("app", base + 3 * hour + u * 1000, u)
        ev("app", base + 14 * hour + u * 1000, u)
    # organic users first appear at 12:xx
    for u in range(200, 205):
        ev("app", base + 12 * hour + u * 1000, u)
    # the same users appear on "web" first at 18:xx (per-source firsts)
    for u in range(100, 103):
        ev("web", base + 18 * hour + u * 1000, u)
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
        events_acquisition_clock(str(tmp_path))
        .to_pandas()
        .set_index(["source", "hour_of_day"])
        .sort_index()
    )
    first = {}
    for s, t, e, u in rows:
        k = (s, u)
        if k not in first or (t, e) < first[k]:
            first[k] = (t, e)
    want = collections.Counter()
    for (s, u), (t, _) in first.items():
        want[(s, (t // hour) % 24)] += 1
    assert set(got.index) == set(want)
    for key, cnt in want.items():
        assert got.loc[key, "n_new_users"] == cnt
    assert got.loc[("app", 3), "n_new_users"] == 10   # the bot spike
    assert got.loc[("app", 12), "n_new_users"] == 5
    assert got.loc[("web", 18), "n_new_users"] == 3
    assert ("app", 14) not in got.index   # repeats never acquire


def test_doc_bigram_symmetry_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import bigram_symmetry

    texts = [
        # asymmetric prose: "of the" twice, "the cat" once, etc.
        "of the cat of the dog",
        # symmetric pair planted: "alpha beta" and "beta alpha"
        "alpha beta gamma beta alpha",
        # self-pair: "spam spam"
        "spam spam spam",
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

    bg = collections.Counter()
    for t in texts:
        ws = t.split(" ")
        for a, b in zip(ws, ws[1:]):
            bg[(a, b)] += 1
    pg = collections.defaultdict(lambda: [0, 0, False])
    for (a, b), cnt in bg.items():
        key = (min(a, b), max(a, b))
        pg[key][0] += 1
        pg[key][1] += cnt
        pg[key][2] |= a == b
    n_sym_pairs = sum(
        1 for dirs, _, selfp in pg.values() if dirs == 2 and not selfp
    )
    n_sym_types = sum(
        d for d, _, selfp in pg.values() if d == 2 and not selfp
    )
    sym_mass = sum(
        m for d, m, selfp in pg.values() if d == 2 or selfp
    )
    n_self = sum(1 for _, _, selfp in pg.values() if selfp)

    got = bigram_symmetry(str(tmp_path)).to_pandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert row["n_bigram_types"] == len(bg)
    assert row["n_symmetric_pairs"] == n_sym_pairs
    assert row["n_symmetric_types"] == n_sym_types
    assert row["symmetric_mass"] == sym_mass
    assert row["n_self_pairs"] == n_self
    assert row["total_mass"] == sum(bg.values())
    assert row["n_symmetric_pairs"] == 2   # alpha<->beta, beta<->gamma
    assert row["n_self_pairs"] == 1        # spam spam


def test_rel_balance_ticket_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import balance_ticket_coupling

    g = np.random.default_rng(869)
    segs = ["AUTOMOBILE", "BUILDING"]
    n_cust = 8
    cust_seg = {k: segs[k % 2] for k in range(1, n_cust + 1)}
    cust_bal = {
        k: (-500.25 if k <= 2 else float(g.uniform(100, 9000)))
        for k in range(1, n_cust + 1)
    }
    orders = []
    okey = 0
    for ck in range(1, n_cust + 1):
        for _ in range(3):
            okey += 1
            # indebted customers place the big orders
            price = (
                float(g.uniform(5000, 9000))
                if ck <= 2
                else float(g.uniform(100, 900))
            )
            orders.append((okey, ck, price))
    no = len(orders)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(
                    np.array([o[0] for o in orders], np.int64)
                ),
                "o_custkey": pa.array(
                    np.array([o[1] for o in orders], np.int64)
                ),
                "o_orderstatus": pa.array(["O"] * no),
                "o_totalprice": pa.array(
                    np.array([o[2] for o in orders])
                ),
                "o_orderdate": pa.array(
                    np.full(no, np.datetime64("2026-01-01", "us"))
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * no),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(
                    np.arange(1, n_cust + 1, dtype=np.int64)
                ),
                "c_name": pa.array(
                    [f"Customer#{i:09d}" for i in range(1, n_cust + 1)]
                ),
                "c_nationkey": pa.array(np.zeros(n_cust, np.int64)),
                "c_acctbal": pa.array(
                    np.array([cust_bal[k] for k in range(1, n_cust + 1)])
                ),
                "c_mktsegment": pa.array(
                    [cust_seg[k] for k in range(1, n_cust + 1)]
                ),
            }
        ),
        tmp_path / "customer.parquet",
    )

    want = collections.defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for okey, ck, price in orders:
        b = int(np.floor(cust_bal[ck]))
        v = int(np.floor(price))
        c = want[cust_seg[ck]]
        c[0] += 1
        c[1] += b
        c[2] += b * b
        c[3] += v
        c[4] += v * v
        c[5] += b * v

    got = (
        balance_ticket_coupling(str(tmp_path))
        .to_pandas()
        .set_index("c_mktsegment")
        .sort_index()
    )
    assert list(got.index) == sorted(want)
    for s, (n_, sb, sbb, sv, svv, sbv) in want.items():
        row = got.loc[s]
        assert row["n_orders"] == n_
        assert row["sum_b"] == sb
        assert row["sum_b_sq"] == sbb
        assert row["sum_v"] == sv
        assert row["sum_v_sq"] == svv
        assert row["sum_b_v"] == sbv
