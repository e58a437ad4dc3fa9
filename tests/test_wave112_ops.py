"""Round-4 wave-112 operators: E159 adoption-order matrix (planted
front-door funnels with a tie pin direction counts), T166 per-doc
hapax-share quantiles (planted unique-vocab docs pin both quantiles),
R93 supplier recency histogram (planted dark/never-shipped suppliers pin
every band) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_adoption_order_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_adoption_order

    base = np.datetime64("2026-07-01", "us").astype(np.int64)
    rows = []  # (source, ts_us, event_id, user_id)
    eid = 0

    def ev(s, t, u):
        nonlocal eid
        rows.append((s, t, eid, u))
        eid += 1

    # funnel: users 1..8 all touch "door" first, then "shop"
    for u in range(1, 9):
        ev("door", base + u * 1_000_000, u)
        ev("shop", base + (u + 100) * 1_000_000, u)
    # reverse user: touches shop first
    ev("shop", base, 99)
    ev("door", base + 500_000_000, 99)
    # simultaneous tie: same ts — event_id breaks it? No: the pair is
    # 'simultaneous' ONLY on (ts, eid) equality, so give user 50 the
    # same ts but different eids -> door (lower eid) wins
    ev("door", base + 777, 50)
    ev("shop", base + 777, 50)
    # a user only in door (not counted in pairs)
    ev("door", base + 1, 1000)
    # repeats must not matter
    ev("door", base + 900_000_000, 3)

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
        events_adoption_order(str(tmp_path))
        .to_pandas()
        .set_index(["source_i", "source_j"])
        .sort_index()
    )
    first = {}
    for s, t, e, u in rows:
        k = (u, s)
        if k not in first or (t, e) < first[k]:
            first[k] = (t, e)
    users = sorted({u for _, _, _, u in rows})
    sources = sorted({s for s, _, _, _ in rows})
    for i, si in enumerate(sources):
        for sj in sources[i + 1:]:
            nb = ni = nj = nsim = 0
            for u in users:
                a = first.get((u, si))
                b = first.get((u, sj))
                if a is None or b is None:
                    continue
                nb += 1
                if a < b:
                    ni += 1
                elif a > b:
                    nj += 1
                else:
                    nsim += 1
            row = got.loc[(si, sj)]
            assert row["users_both"] == nb
            assert row["i_first"] == ni
            assert row["j_first"] == nj
            assert row["simultaneous"] == nsim
    d = got.loc[("door", "shop")]
    assert d["users_both"] == 10
    assert d["i_first"] == 9   # funnel users + the eid-tiebreak user
    assert d["j_first"] == 1   # user 99


def test_doc_hapax_share_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import hapax_share_quantiles

    rows = [  # (doc_id, source, text)
        # "common": words shared everywhere -> 0 hapax share
        (1, "common", "alpha beta gamma alpha"),
        (2, "common", "alpha beta gamma beta"),
        (3, "common", "gamma alpha beta"),
        # "noisy": each doc half unique ids
        (10, "noisy", "alpha uniq10a uniq10b beta"),      # 2/4 = 500
        (11, "noisy", "uniq11a uniq11b uniq11c gamma"),   # 3/4 = 750
        (12, "noisy", "alpha beta"),                       # 0
    ]
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.array([r[0] for r in rows], np.int64)),
                "text": pa.array([r[2] for r in rows]),
                "lang": pa.array(["en"] * n),
                "source": pa.array([r[1] for r in rows]),
                "n_chars": pa.array([len(r[2]) for r in rows], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    cf = collections.Counter()
    for _, _, txt in rows:
        cf.update(txt.split(" "))
    per = collections.defaultdict(list)
    for _, src, txt in rows:
        words = txt.split(" ")
        nh = sum(1 for w in words if cf[w] == 1)
        per[src].append(1000 * nh // len(words))

    got = (
        hapax_share_quantiles(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )

    def qd(vals, p):
        vals = sorted(vals)
        return vals[(len(vals) * p + 999) // 1000 - 1]

    assert list(got.index) == sorted(per)
    for src, pms in per.items():
        row = got.loc[src]
        assert row["n_docs"] == len(pms)
        assert row["p50_hapax_permille"] == qd(pms, 500)
        assert row["p90_hapax_permille"] == qd(pms, 900)
    assert got.loc["common", "p90_hapax_permille"] == 0
    assert got.loc["noisy", "p90_hapax_permille"] == 750


def test_rel_supplier_recency_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import supplier_recency

    day = 86_400_000_000
    horizon = np.datetime64("2026-06-30", "us").astype(np.int64)
    # suppliers: 1 ships on horizon (band 0); 2 ships 1 day ago (band 1);
    # 3 ships 5 days ago (band 3: bin(5)='101'); 4 ships 300 days ago
    # (band 9: bin(300) has 9 bits); 5 NEVER ships (band -1)
    ship = {1: 0, 2: 1, 3: 5, 4: 300}
    lines = []
    for sk, age in ship.items():
        for _ in range(sk):  # sk lines each, older ones too
            lines.append((sk, horizon - age * day))
        # add an OLDER line that must not win the max
        lines.append((sk, horizon - (age + 100) * day))
    nl = len(lines)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(nl, dtype=np.int64)),
                "l_partkey": pa.array(np.ones(nl, np.int64)),
                "l_suppkey": pa.array(
                    np.array([l[0] for l in lines], np.int64)
                ),
                "l_linenumber": pa.array(np.ones(nl, np.int32)),
                "l_quantity": pa.array(np.ones(nl)),
                "l_extendedprice": pa.array(np.full(nl, 100.0)),
                "l_discount": pa.array(np.zeros(nl)),
                "l_tax": pa.array(np.zeros(nl)),
                "l_returnflag": pa.array(["N"] * nl),
                "l_linestatus": pa.array(["O"] * nl),
                "l_shipdate": pa.array(
                    np.array([l[1] for l in lines], np.int64)
                ).cast(pa.timestamp("us")),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(1, 6, dtype=np.int64)),
                "s_name": pa.array(
                    [f"Supplier#{k:09d}" for k in range(1, 6)]
                ),
                "s_nationkey": pa.array(np.zeros(5, np.int64)),
                "s_acctbal": pa.array(np.zeros(5)),
            }
        ),
        tmp_path / "supplier.parquet",
    )

    per_lines = collections.Counter(l[0] for l in lines)
    want = collections.defaultdict(lambda: [0, 0])
    for sk in range(1, 6):
        if sk in ship:
            age = ship[sk]
            band = 0 if age == 0 else len(bin(age)) - 2
            c = want[band]
            c[0] += 1
            c[1] += per_lines[sk]
        else:
            want[-1][0] += 1

    got = (
        supplier_recency(str(tmp_path))
        .to_pandas()
        .set_index("recency_band")
        .sort_index()
    )
    assert sorted(got.index) == sorted(want)
    for band, (nsup, nl_) in want.items():
        row = got.loc[band]
        assert row["n_suppliers"] == nsup
        assert row["n_lines"] == nl_
    assert got.loc[-1, "n_suppliers"] == 1   # the never-shipper
    assert got.loc[9, "n_suppliers"] == 1    # the 300-day dark supplier
