"""Round-5 wave-147 operators: E194 peak-position bands (where a user's
biggest event sits in their lifetime), T200 positional vocabulary
exclusivity by document thirds, R127 discount discipline per part type
— each vs a scalar brute-force reference on planted fixtures."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HOUR_US = 3_600_000_000


def test_peak_position_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_peak_position

    g = np.random.default_rng(43)
    n = 4000
    ts = np.sort(g.integers(0, 15 * 24 * HOUR_US, n).astype(np.int64))
    uid = g.integers(1, 70, n).astype(np.int64)
    eid = np.arange(n, dtype=np.int64)
    value = g.uniform(0, 50, n)  # small range -> plenty of max ties
    pq.write_table(
        pa.table({
            "event_id": pa.array(eid),
            "user_id": pa.array(uid),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(value),
            "event_type": pa.array(["click"] * n),
        }),
        tmp_path / "events.parquet",
    )

    per_user = collections.defaultdict(list)
    for e, u, t, v in zip(eid, uid, ts, value):
        per_user[int(u)].append((int(t), int(e), int(np.floor(v))))
    nu = collections.Counter()
    ne = collections.Counter()
    for rows in per_user.values():
        if len(rows) < 2:
            continue
        rows.sort()
        vals = [v for _, _, v in rows]
        mx = max(vals)
        idx = vals.index(mx)
        band = min(1000 * idx // (len(rows) - 1) // 100, 10)
        nu[band] += 1
        ne[band] += len(rows)

    got = events_peak_position(str(tmp_path)).to_pandas().set_index("band")
    assert sorted(got.index.tolist()) == sorted(nu)
    for band in nu:
        assert int(got.loc[band, "n_users"]) == nu[band]
        assert int(got.loc[band, "n_events"]) == ne[band]


def test_thirds_exclusivity_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import thirds_exclusivity

    g = np.random.default_rng(47)
    vocab = ["head", "body", "tail", "core", "rare", "mix", "pad"]
    rows = []
    for i in range(350):
        src = f"s{i % 2}"
        n_words = int(g.integers(1, 20))
        words = [vocab[int(g.integers(0, len(vocab)))] for _ in range(n_words)]
        if i % 9 == 0:
            words.insert(0, f"opener{i % 4}")  # first-third-leaning salt
        rows.append({"doc_id": f"d-{i}", "text": " ".join(words),
                     "lang": "en", "source": src,
                     "n_chars": sum(map(len, words))})
    pq.write_table(pa.Table.from_pylist(rows), tmp_path / "documents.parquet")

    masks = collections.defaultdict(int)
    for r in rows:
        words = r["text"].split(" ")
        nw = len(words)
        for p, w in enumerate(words):
            masks[(r["source"], w)] |= 1 << (3 * p // nw)
    agg = collections.defaultdict(lambda: [0, 0, 0, 0, 0])
    for (src, _), m in masks.items():
        a = agg[src]
        a[0] += 1
        if m == 1:
            a[1] += 1
        elif m == 2:
            a[2] += 1
        elif m == 4:
            a[3] += 1
        elif m == 7:
            a[4] += 1

    got = thirds_exclusivity(str(tmp_path)).to_pandas().set_index("source")
    for src, (nt, fo, mo, lo, at) in agg.items():
        row = got.loc[src]
        assert int(row["n_types"]) == nt
        assert int(row["first_only"]) == fo
        assert int(row["mid_only"]) == mo
        assert int(row["last_only"]) == lo
        assert int(row["all_thirds"]) == at


def test_discount_discipline_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import discount_discipline

    g = np.random.default_rng(53)
    n_part, n_li = 60, 800
    types = ["STANDARD BRASS", "ECONOMY TIN", "PROMO STEEL"]
    pt = g.integers(0, 3, n_part)
    pq.write_table(
        pa.table({
            "p_partkey": pa.array(np.arange(1, n_part + 1, dtype=np.int64)),
            "p_type": pa.array([types[i] for i in pt]),
        }),
        tmp_path / "part.parquet",
    )
    lp = g.integers(1, n_part + 1, n_li).astype(np.int64)
    disc = g.integers(0, 11, n_li) / 100.0
    pq.write_table(
        pa.table({
            "l_partkey": pa.array(lp),
            "l_discount": pa.array(disc),
            "l_linenumber": pa.array(np.arange(n_li, dtype=np.int64)),
        }),
        tmp_path / "lineitem.parquet",
    )

    per_part = collections.defaultdict(list)
    for p, d in zip(lp, disc):
        per_part[int(p)].append(int(np.floor(100 * d)))
    agg = collections.defaultdict(lambda: [0, 0, 0])
    for p, cents in per_part.items():
        if len(cents) < 2:
            continue
        a = agg[types[pt[p - 1]]]
        a[0] += 1
        a[1] += 1 if len(set(cents)) >= 2 else 0
        a[2] += len(cents)

    got = discount_discipline(str(tmp_path)).to_pandas().set_index("p_type")
    assert len(got) == len(agg)
    for ty, (np_, nv, nl) in agg.items():
        row = got.loc[ty]
        assert int(row["n_parts"]) == np_
        assert int(row["n_variable"]) == nv
        assert int(row["n_lines"]) == nl
        assert int(row["variable_permille"]) == 1000 * nv // np_
