"""Round-4 wave-115 operators: E162 minute crowd-density coupling
(planted bot-hammering vs organic minutes pin all six sums), T169
opener-spread spectrum (planted local vs far-flung shared openers pin
every band), R96 nation demand-trend matrix (planted per-year growth
pins each cell) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_crowd_density_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_crowd_density

    base = np.datetime64("2026-07-01", "us").astype(np.int64)
    minute = 60_000_000
    rows = []  # (source, ts_us, user)
    # "bot": one user fires 10 events in one minute (e=10, u=1)
    for j in range(10):
        rows.append(("bot", base + j * 1000, 77))
    # "organic": 3 minutes with (e=u): 4 users, 2 users, 1 user
    for m, users in ((0, [1, 2, 3, 4]), (1, [5, 6]), (2, [9])):
        for u in users:
            rows.append(("organic", base + 100 * minute + m * minute + u, u))
    # "mixed": minute with 3 events from 2 users
    rows.append(("mixed", base, 1))
    rows.append(("mixed", base + 1000, 1))
    rows.append(("mixed", base + 2000, 2))
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
        events_crowd_density(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    cells = collections.defaultdict(set)
    counts = collections.Counter()
    for s, ts, u in rows:
        m = ts // minute
        cells[(s, m)].add(u)
        counts[(s, m)] += 1
    per = collections.defaultdict(list)
    for (s, m), users in cells.items():
        per[s].append((counts[(s, m)], len(users)))
    assert list(got.index) == sorted(per)
    for s, mins in per.items():
        row = got.loc[s]
        assert row["n_minutes"] == len(mins)
        assert row["sum_e"] == sum(e for e, _ in mins)
        assert row["sum_e_sq"] == sum(e * e for e, _ in mins)
        assert row["sum_u"] == sum(u for _, u in mins)
        assert row["sum_u_sq"] == sum(u * u for _, u in mins)
        assert row["sum_e_u"] == sum(e * u for e, u in mins)
    assert got.loc["bot", "sum_e_u"] == 10 * 1
    assert got.loc["organic", "sum_e_u"] == 16 + 4 + 1
    assert got.loc["mixed", "sum_e_u"] == 6


def test_doc_opener_spread_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import opener_spread

    rows = [  # (doc_id, text)
        # "breaking news today" shared by ids 5 and 6 (span 1 -> band 1)
        (5, "breaking news today about things"),
        (6, "breaking news today regarding stuff"),
        # "terms of service" spread ids 10 .. 1000 (span 990 -> band 10)
        (10, "terms of service apply here"),
        (500, "terms of service differ slightly"),
        (1000, "terms of service again"),
        # a two-word doc groups by its whole text with another
        (20, "hello world"),
        (21, "hello world"),
        # unique openers (no group)
        (30, "completely unique opener one"),
        (31, "another unique opener two"),
    ]
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

    got = (
        opener_spread(str(tmp_path))
        .to_pandas()
        .set_index("span_band")
        .sort_index()
    )
    groups = collections.defaultdict(list)
    for did, txt in rows:
        groups[" ".join(txt.split(" ")[:3])].append(did)
    want = collections.defaultdict(lambda: [0, 0])
    for op, ids in groups.items():
        if len(ids) < 2:
            continue
        span = max(ids) - min(ids)
        band = 0 if span <= 0 else len(bin(span)) - 2
        want[band][0] += 1
        want[band][1] += len(ids)
    assert sorted(got.index) == sorted(want)
    for band, (ng, nd) in want.items():
        row = got.loc[band]
        assert row["n_groups"] == ng
        assert row["n_docs"] == nd
    assert got.loc[1, "n_groups"] == 2   # breaking-news pair + hello world
    assert got.loc[10, "n_docs"] == 3    # the far-flung terms group


def test_rel_nation_demand_trend_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import nation_demand_trend

    g = np.random.default_rng(853)
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
    n_cust = 12
    cust_nat = {k: k % 3 for k in range(1, n_cust + 1)}
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(
                    np.arange(1, n_cust + 1, dtype=np.int64)
                ),
                "c_name": pa.array(
                    [f"Customer#{i:09d}" for i in range(1, n_cust + 1)]
                ),
                "c_nationkey": pa.array(
                    np.array(
                        [cust_nat[k] for k in range(1, n_cust + 1)],
                        np.int64,
                    )
                ),
                "c_acctbal": pa.array(np.zeros(n_cust)),
                "c_mktsegment": pa.array(["BUILDING"] * n_cust),
            }
        ),
        tmp_path / "customer.parquet",
    )
    orders = []
    okey = 0
    for yr in (2024, 2025):
        d0 = np.datetime64(f"{yr}-02-01", "us").astype(np.int64)
        for _ in range(40):
            okey += 1
            ck = int(g.integers(1, n_cust + 1))
            od = d0 + int(g.integers(0, 300)) * 86_400_000_000
            orders.append((okey, ck, od, float(g.uniform(50, 900))))
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
                    np.array([o[3] for o in orders])
                ),
                "o_orderdate": pa.array(
                    np.array([o[2] for o in orders], np.int64)
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * no),
            }
        ),
        tmp_path / "orders.parquet",
    )

    names = ["ALPHA", "BETA", "GAMMA"]
    want = collections.defaultdict(lambda: [0, 0])
    for okey, ck, od, price in orders:
        yr = int(
            np.int64(od).astype("datetime64[us]").astype("datetime64[Y]")
            .astype(np.int64)
        ) + 1970
        c = want[(names[cust_nat[ck]], yr)]
        c[0] += 1
        c[1] += int(np.floor(price))

    got = (
        nation_demand_trend(str(tmp_path))
        .to_pandas()
        .set_index(["nation", "order_year"])
        .sort_index()
    )
    assert set(got.index) == set(want)
    for key, (no_, sv) in want.items():
        row = got.loc[key]
        assert row["n_orders"] == no_
        assert row["value_floor"] == sv
