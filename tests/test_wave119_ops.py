"""Round-4 wave-119 operators: E166 user-id namespace audit (planted
disjoint dense vs shared sparse id ranges pin every column), T173
docs-to-half concentration board (planted few-giants vs uniform sources
pin the crossing count incl. a mid-bin partial), R100 supplier
co-shipment spectrum (planted recurring consortia pin the bands) — each
vs a scalar brute-force reference."""

from __future__ import annotations

import collections
import itertools

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_user_namespace_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_user_namespace

    base = np.datetime64("2026-07-01", "us").astype(np.int64)
    rows = []  # (source, user)
    # "nsA": dense namespace 1000..1019 (density 1000)
    for u in range(1000, 1020):
        rows.append(("nsA", u))
        rows.append(("nsA", u))  # repeats must not inflate distinct
    # "nsB": dense namespace 2000..2009
    for u in range(2000, 2010):
        rows.append(("nsB", u))
    # "global": sparse ids spread 0..999 (10 users -> density 10)
    for u in range(0, 1000, 100):
        rows.append(("global", u))
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows]),
                "ts": pa.array(
                    base + np.arange(n, dtype=np.int64) * 1000
                ).cast(pa.timestamp("us")),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(
                    np.array([r[1] for r in rows], np.int64)
                ),
                "value": pa.array(np.ones(n)),
            }
        ),
        tmp_path / "events.parquet",
    )

    got = (
        events_user_namespace(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    per = collections.defaultdict(set)
    for s, u in rows:
        per[s].add(u)
    assert list(got.index) == sorted(per)
    for s, users in per.items():
        row = got.loc[s]
        span = max(users) - min(users) + 1
        assert row["n_users"] == len(users)
        assert row["min_user_id"] == min(users)
        assert row["max_user_id"] == max(users)
        assert row["density_permille"] == 1000 * len(users) // span
    assert got.loc["nsA", "density_permille"] == 1000
    assert got.loc["global", "density_permille"] == 11  # 10 ids / span 901


def test_doc_docs_to_half_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import docs_to_half

    rows = []  # (source, n_chars)
    # "giant": one 1000-char dump + 10 docs of 10 chars -> docs_to_half 1
    rows.append(("giant", 1000))
    rows += [("giant", 10)] * 10
    # "uniform": 10 docs of 100 -> half needs 5
    rows += [("uniform", 100)] * 10
    # "midbin": lengths 60, 30, 30, 30 (tot 150; 60+30=90 >= 75 ->
    # crossing INSIDE the 30-bin after 1 of 3)
    rows += [("midbin", 60), ("midbin", 30), ("midbin", 30), ("midbin", 30)]
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(["x" * r[1] for r in rows]),
                "lang": pa.array(["en"] * n),
                "source": pa.array([r[0] for r in rows]),
                "n_chars": pa.array(
                    np.array([r[1] for r in rows], np.int64)
                ),
            }
        ),
        tmp_path / "documents.parquet",
    )

    got = (
        docs_to_half(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    per = collections.defaultdict(list)
    for s, ln in rows:
        per[s].append(ln)
    for s, lens in per.items():
        lens.sort(reverse=True)
        tot = sum(lens)
        cum = 0
        dh = 0
        for ln in lens:
            cum += ln
            dh += 1
            if 2 * cum >= tot:
                break
        row = got.loc[s]
        assert row["n_docs"] == len(lens)
        assert row["total_chars"] == tot
        assert row["docs_to_half"] == dh
    assert got.loc["giant", "docs_to_half"] == 1
    assert got.loc["uniform", "docs_to_half"] == 5
    assert got.loc["midbin", "docs_to_half"] == 2


def test_rel_supplier_coshipment_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import supplier_coshipment

    lines = []  # (okey, suppkey)
    # consortium (1, 2): co-ship in 9 orders -> band len(bin(9)) = 4
    for o in range(100, 109):
        lines += [(o, 1), (o, 2)]
    # trio order: suppliers 5, 6, 7 together once -> 3 pairs at count 1
    lines += [(200, 5), (200, 6), (200, 7)]
    # duplicate supplier lines in one order must count the pair ONCE
    lines += [(300, 8), (300, 8), (300, 9)]
    # single-supplier orders contribute nothing
    lines += [(400, 11), (401, 12)]
    n = len(lines)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(
                    np.array([l[0] for l in lines], np.int64)
                ),
                "l_partkey": pa.array(np.ones(n, np.int64)),
                "l_suppkey": pa.array(
                    np.array([l[1] for l in lines], np.int64)
                ),
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

    per_order = collections.defaultdict(set)
    for o, s in lines:
        per_order[o].add(s)
    pair_count = collections.Counter()
    for o, supps in per_order.items():
        for a, b in itertools.combinations(sorted(supps), 2):
            pair_count[(a, b)] += 1
    want = collections.defaultdict(lambda: [0, 0])
    for _, cnt in pair_count.items():
        band = len(bin(cnt)) - 2
        want[band][0] += 1
        want[band][1] += cnt

    got = (
        supplier_coshipment(str(tmp_path))
        .to_pandas()
        .set_index("cooccur_band")
        .sort_index()
    )
    assert sorted(got.index) == sorted(want)
    for band, (np_, nco) in want.items():
        row = got.loc[band]
        assert row["n_pairs"] == np_
        assert row["n_coorders"] == nco
    assert got.loc[4, "n_pairs"] == 1    # the consortium
    assert got.loc[1, "n_pairs"] == 4    # trio's 3 pairs + the (8,9) pair
