"""Round-5 wave-155 operators: E202 double-fire detector (payload-identity
duplicates under fresh ids), T208 word periodicity comb, R135 part
demand-reach bands — each vs a scalar brute-force reference on planted
fixtures."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEC_US = 1_000_000


def test_double_fire_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_double_fire

    g = np.random.default_rng(163)
    n = 3000
    ts = np.sort(g.integers(0, 3600 * SEC_US, n).astype(np.int64))
    uid = g.integers(1, 30, n).astype(np.int64)
    types = np.array(["click", "view"])
    ty = g.integers(0, 2, n)
    value = g.integers(0, 5, n).astype(np.float64)  # coarse -> collisions
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(uid),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(value),
            "event_type": pa.array(types[ty]),
        }),
        tmp_path / "events.parquet",
    )

    groups = collections.Counter()
    for t, u, k, v in zip(ts, uid, ty, value):
        groups[(int(k), int(u), int(np.floor(v)), int(t) // SEC_US)] += 1
    agg = collections.defaultdict(lambda: [0, 0, 0])
    for (k, *_), cnt in groups.items():
        a = agg[k]
        a[0] += cnt
        a[1] += cnt if cnt >= 2 else 0
        a[2] = max(a[2], cnt)

    got = events_double_fire(str(tmp_path)).to_pandas().set_index("source")
    for k, name in enumerate(types):
        row = got.loc[name]
        ne, nd, mx = agg[k]
        assert int(row["n_events"]) == ne
        assert int(row["n_doubled"]) == nd
        assert int(row["max_multiplicity"]) == mx
        assert int(row["doubled_permille"]) == 1000 * nd // ne


def test_periodicity_comb_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import periodicity_comb

    g = np.random.default_rng(167)
    vocab = ["k", "eq", "val", "sep"]
    rows = []
    for i in range(250):
        src = f"s{i % 2}"
        if i % 3 == 0:
            # period-3 template: k eq <rand> k eq <rand> ...
            words = []
            for _ in range(int(g.integers(2, 6))):
                words += ["k", "eq", f"v{int(g.integers(0, 50))}"]
        else:
            words = [vocab[int(g.integers(0, 4))]
                     for _ in range(int(g.integers(1, 15)))]
        rows.append({"doc_id": i, "text": " ".join(words), "lang": "en",
                     "source": src, "n_chars": 0})
    pq.write_table(pa.Table.from_pylist(rows), tmp_path / "documents.parquet")

    agg = collections.defaultdict(lambda: [0, 0])
    for r in rows:
        words = r["text"].split(" ")
        for lag in range(1, 9):
            for i in range(len(words) - lag):
                a = agg[(r["source"], lag)]
                a[0] += 1
                a[1] += 1 if words[i] == words[i + lag] else 0

    got = periodicity_comb(str(tmp_path)).to_pandas()
    assert len(got) == len(agg)
    for _, row in got.iterrows():
        n, e = agg[(row["source"], int(row["lag"]))]
        assert int(row["n_pairs"]) == n
        assert int(row["n_equal"]) == e
        assert int(row["equal_permille"]) == 1000 * e // n


def test_part_reach_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import part_reach

    g = np.random.default_rng(173)
    n_ord, n_li = 150, 800
    ck = g.integers(1, 40, n_ord).astype(np.int64)
    pq.write_table(
        pa.table({
            "o_orderkey": pa.array(np.arange(1, n_ord + 1, dtype=np.int64)),
            "o_custkey": pa.array(ck),
        }),
        tmp_path / "orders.parquet",
    )
    lo = g.integers(1, n_ord + 1, n_li).astype(np.int64)
    lp = g.integers(1, 50, n_li).astype(np.int64)
    pq.write_table(
        pa.table({
            "l_orderkey": pa.array(lo),
            "l_partkey": pa.array(lp),
        }),
        tmp_path / "lineitem.parquet",
    )

    per_part = collections.defaultdict(lambda: [set(), 0])
    for o, p in zip(lo, lp):
        a = per_part[int(p)]
        a[0].add(int(ck[o - 1]))
        a[1] += 1
    agg = collections.defaultdict(lambda: [0, 0])
    for custs, nl in per_part.values():
        band = len(custs).bit_length()
        agg[band][0] += 1
        agg[band][1] += nl

    got = part_reach(str(tmp_path)).to_pandas().set_index("reach_band")
    assert len(got) == len(agg)
    for band, (np_, nl) in agg.items():
        row = got.loc[band]
        assert int(row["n_parts"]) == np_
        assert int(row["n_lines"]) == nl
