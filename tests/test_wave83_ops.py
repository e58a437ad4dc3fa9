"""Round-4 wave-83 operators: E130 daily-active-user quantiles
(planted steady vs spiky audiences pin the DAU bands), T137 bag-of-
words dedup board (planted shuffled/verbatim copies pin the reorder
counts), R64 unit-price dispersion board (planted consistent vs
spread-priced parts pin the permille bands) — each vs a scalar
brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_dau_quantiles_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_dau_quantiles

    g = np.random.default_rng(680)
    base = np.datetime64("2026-03-02", "us").astype(np.int64)
    DAY = 86_400_000_000
    et, ts, uid = [], [], []
    # "steady": 6 days x users 1-7 (several events each) -> DAU 7
    for d in range(6):
        for u in range(1, 8):
            for _ in range(2):
                et.append("steady")
                ts.append(base + d * DAY + int(g.integers(0, DAY)))
                uid.append(u)
    # "spiky": 4 days DAU 1, one day DAU 40
    for d in range(4):
        et.append("spiky")
        ts.append(base + d * DAY + 5)
        uid.append(99)
    for u in range(100, 140):
        et.append("spiky")
        ts.append(base + 5 * DAY + int(g.integers(0, DAY)))
        uid.append(u)
    # bulk
    for _ in range(700):
        et.append("rand")
        ts.append(base + int(g.integers(0, 9)) * DAY + int(g.integers(0, DAY)))
        uid.append(int(g.integers(0, 50)))
    n = len(et)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(et),
                "ts": pa.array(np.array(ts, np.int64)).cast(
                    pa.timestamp("us")
                ),
                "value": pa.array(np.ones(n)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(uid, pa.int64()),
            }
        ),
        tmp_path / "events.parquet",
    )

    cells = {(s, u, t // DAY) for s, t, u in zip(et, ts, uid)}
    dau = collections.Counter()
    for s, _, d in cells:
        dau[(s, d)] += 1
    per_src = collections.defaultdict(list)
    for (s, _), c in dau.items():
        per_src[s].append(c)

    got = events_dau_quantiles(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(per_src)
    for s, xs in per_src.items():
        xs = sorted(xs)
        row = got.loc[s]
        assert row["n_days"] == len(xs)
        for col, q in (("p50_dau", 500), ("p90_dau", 900)):
            thr = (len(xs) * q + 999) // 1000
            assert row[col] == xs[thr - 1]
        assert row["max_dau"] == xs[-1]
    assert got.loc["steady", "p50_dau"] == 7
    assert got.loc["spiky", "max_dau"] == 40


def test_doc_bag_dedup_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import bag_dedup_board

    g = np.random.default_rng(681)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    # "shuffle": 3 docs, same multiset, different order (reordered dups)
    words = [vocab[i] for i in (3, 7, 7, 11, 20)]
    docs.append(("shuffle", " ".join(words)))
    docs.append(("shuffle", " ".join(words[::-1])))
    docs.append(("shuffle", " ".join([words[2], words[0], words[4], words[1], words[3]])))
    # "verbatim": 2 identical docs (text dups, also bag dups)
    t = "alpha beta gamma alpha"
    docs.append(("verbatim", t))
    docs.append(("verbatim", t))
    # multiset differs by multiplicity only -> NOT a bag dup
    docs.append(("verbatim", "alpha beta gamma gamma"))
    # bulk uniques
    for _ in range(150):
        docs.append(
            (
                "rand",
                " ".join(
                    vocab[int(g.integers(0, 40))]
                    for _ in range(int(g.integers(3, 30)))
                ),
            )
        )
    n = len(docs)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "source": pa.array([d[0] for d in docs]),
                "text": pa.array([d[1] for d in docs]),
                "lang": pa.array(["en"] * n),
                "quality": pa.array(np.ones(n)),
                "n_chars": pa.array(
                    [len(d[1]) for d in docs], pa.int64()
                ),
                "ingest_ts": pa.array(
                    np.full(n, 1_700_000_000_000_000, np.int64)
                ).cast(pa.timestamp("us")),
            }
        ),
        tmp_path / "documents.parquet",
    )

    bags = collections.Counter()
    texts = collections.Counter()
    for s, t in docs:
        bags[tuple(sorted(t.split(" ")))] += 1
        texts[t] += 1
    want = collections.defaultdict(lambda: [0, 0, 0, 0])
    own_bags = collections.defaultdict(set)
    for s, t in docs:
        w = want[s]
        bag = tuple(sorted(t.split(" ")))
        w[0] += 1
        own_bags[s].add(bag)
        if bags[bag] >= 2:
            w[2] += 1
        if texts[t] >= 2:
            w[3] += 1
    for s in want:
        want[s][1] = len(own_bags[s])

    got = bag_dedup_board(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(want)
    for s, w in want.items():
        row = got.loc[s]
        assert row["n_docs"] == w[0]
        assert row["n_bags"] == w[1]
        assert row["n_bagdup_docs"] == w[2]
        assert row["n_textdup_docs"] == w[3]
        assert row["n_reordered"] == w[2] - w[3]
    assert got.loc["shuffle", "n_reordered"] == 3
    assert got.loc["verbatim", "n_reordered"] == 0
    assert got.loc["verbatim", "n_textdup_docs"] == 2


def test_rel_unit_price_spread_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import unit_price_spread

    g = np.random.default_rng(682)
    n_part = 50
    brands = [f"B#{i}" for i in range(4)]
    pbrand = [brands[int(g.integers(0, 4))] for _ in range(n_part)]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
                "p_name": pa.array([f"p{i}" for i in range(n_part)]),
                "p_brand": pa.array(pbrand),
                "p_type": pa.array(["T"] * n_part),
                "p_size": pa.array(np.ones(n_part, np.int64)),
                "p_retailprice": pa.array(np.ones(n_part)),
            }
        ),
        tmp_path / "part.parquet",
    )
    pk_col, qty, ep = [], [], []
    for pk in range(n_part):
        unit = float(g.uniform(10, 500))
        for _ in range(int(g.integers(1, 6))):
            q = float(g.integers(1, 20))
            # half the parts priced consistently, half with spread
            u = unit if pk % 2 == 0 else unit * float(g.uniform(0.8, 1.2))
            pk_col.append(pk)
            qty.append(q)
            ep.append(round(u * q, 2))
    nl = len(pk_col)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(nl, dtype=np.int64)),
                "l_partkey": pa.array(pk_col, pa.int64()),
                "l_suppkey": pa.array(np.ones(nl, np.int64)),
                "l_quantity": pa.array(qty),
                "l_extendedprice": pa.array(ep),
                "l_discount": pa.array(np.zeros(nl)),
                "l_tax": pa.array(np.zeros(nl)),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    per_part = collections.defaultdict(list)
    for pk, q, e in zip(pk_col, qty, ep):
        per_part[pk].append(int(np.floor(100 * e / q)))
    spm = collections.defaultdict(list)
    for pk, ups in per_part.items():
        spm[pbrand[pk]].append(1000 * (max(ups) - min(ups)) // max(ups))

    got = unit_price_spread(str(tmp_path)).to_pandas()
    got = got.set_index("brand").sort_index()
    assert list(got.index) == sorted(spm)
    for b, xs in spm.items():
        xs = sorted(xs)
        row = got.loc[b]
        assert row["n_parts"] == len(xs)
        assert row["n_varying"] == sum(1 for x in xs if x > 0)
        for col, q in (("p50_spread", 500), ("p90_spread", 900)):
            thr = (len(xs) * q + 999) // 1000
            assert row[col] == xs[thr - 1]
