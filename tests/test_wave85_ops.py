"""Round-4 wave-85 operators: E132 value last-digit audit (planted
uniform vs rounded value streams pin the digit grid), T139/F tape
prefix-dedup board (planted shared system-prompt prefixes pin the
group counts), R66 brand return-rate board (planted returned lines pin
the permille) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_last_digit_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_last_digit

    g = np.random.default_rng(700)
    base = np.datetime64("2026-03-02", "us").astype(np.int64)
    et, ts, val = [], [], []
    # "rounded": every value ends in 0 (floor(v) % 10 == 0)
    for _ in range(200):
        et.append("rounded")
        ts.append(base + int(g.integers(0, 10**9)))
        val.append(float(g.integers(1, 50)) * 10.0 + float(g.uniform(0, 1)))
    # "organic": uniform-ish digits
    for _ in range(500):
        et.append("organic")
        ts.append(base + int(g.integers(0, 10**9)))
        val.append(float(g.uniform(1, 10_000)))
    n = len(et)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(et),
                "ts": pa.array(np.array(ts, np.int64)).cast(
                    pa.timestamp("us")
                ),
                "value": pa.array(val),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.ones(n, np.int64)),
            }
        ),
        tmp_path / "events.parquet",
    )

    cnt = collections.Counter()
    tot = collections.Counter()
    for s, v in zip(et, val):
        cnt[(s, int(np.floor(v)) % 10)] += 1
        tot[s] += 1

    got = events_last_digit(str(tmp_path)).to_pandas()
    got = got.set_index(["source", "digit"]).sort_index()
    assert len(got) == 2 * 10
    for (s, d), row in got.iterrows():
        assert row["n_events"] == cnt.get((s, d), 0)
        assert row["permille"] == 1000 * cnt.get((s, d), 0) // tot[s]
    assert got.loc[("rounded", 0), "permille"] == 1000
    assert got.loc[("rounded", 5), "n_events"] == 0


def test_f1_prefix_dedup_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import tape_prefix_dedup

    g = np.random.default_rng(701)
    sysprompt = [int(x) for x in g.integers(0, 99, 40)]
    rows = []
    # shared 40-token prefix (> K=32) across two sources
    for _ in range(8):
        rows.append(
            ("sA", sysprompt + [int(x) for x in g.integers(0, 99, 10)])
        )
    for _ in range(5):
        rows.append(
            ("sB", sysprompt + [int(x) for x in g.integers(0, 99, 7)])
        )
    # short identical sequences (len < 32): whole sequence is the prefix
    for _ in range(3):
        rows.append(("sB", [1, 2, 3]))
    # uniques
    for _ in range(90):
        rows.append(
            ("rand", [int(x) for x in g.integers(0, 9999, g.integers(1, 50))])
        )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(
                    [f"s00-{i:08d}" for i in range(len(rows))]
                ),
                "tokens": pa.array(
                    [r[1] for r in rows], pa.list_(pa.int32())
                ),
                "n_tok": pa.array(
                    [len(r[1]) for r in rows], pa.int64()
                ),
                "source": pa.array([r[0] for r in rows]),
            }
        ),
        tmp_path / "part-000.parquet",
    )

    K = 32
    groups = collections.Counter()
    gsrc = collections.defaultdict(set)
    for s, t in rows:
        pre = tuple(t[:K])
        groups[pre] += 1
        gsrc[pre].add(s)
    want = collections.defaultdict(lambda: [0, 0, 0, 0])
    own = collections.defaultdict(set)
    for s, t in rows:
        pre = tuple(t[:K])
        w = want[s]
        w[0] += 1
        own[s].add(pre)
        if groups[pre] >= 2:
            w[2] += 1
        if len(gsrc[pre]) >= 2:
            w[3] += 1
    for s in want:
        want[s][1] = len(own[s])

    got = tape_prefix_dedup(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(want)
    for s, w in want.items():
        row = got.loc[s]
        assert row["n_seqs"] == w[0]
        assert row["n_prefixes"] == w[1]
        assert row["n_dup_prefix"] == w[2]
        assert row["n_cross_source"] == w[3]
    assert got.loc["sA", "n_cross_source"] == 8
    assert got.loc["sB", "n_dup_prefix"] == 8  # 5 shared + 3 short twins


def test_rel_brand_return_rate_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import brand_return_rate

    g = np.random.default_rng(702)
    n_part = 40
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
    nl = 800
    pk = g.integers(0, n_part, nl)
    ep = np.round(g.uniform(100, 5000, nl), 2)
    disc = np.round(g.integers(0, 11, nl) / 100.0, 2)
    flag = np.where(g.random(nl) < 0.3, "R", "N")
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(nl, dtype=np.int64)),
                "l_partkey": pa.array(pk, pa.int64()),
                "l_suppkey": pa.array(np.ones(nl, np.int64)),
                "l_quantity": pa.array(np.ones(nl)),
                "l_extendedprice": pa.array(ep),
                "l_discount": pa.array(disc),
                "l_tax": pa.array(np.zeros(nl)),
                "l_returnflag": pa.array(flag.tolist()),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    want = collections.defaultdict(lambda: [0, 0, 0])
    for p, e, d, f in zip(pk, ep, disc, flag):
        w = want[pbrand[p]]
        w[0] += 1
        if f == "R":
            w[1] += 1
            w[2] += int(np.floor(e * (1 - d)))

    got = brand_return_rate(str(tmp_path)).to_pandas()
    got = got.set_index("brand").sort_index()
    assert list(got.index) == sorted(want)
    for b, w in want.items():
        row = got.loc[b]
        assert row["n_lines"] == w[0]
        assert row["n_returned"] == w[1]
        assert row["returned_permille"] == 1000 * w[1] // w[0]
        assert row["returned_revenue"] == w[2]
