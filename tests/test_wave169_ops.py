"""Round-5 wave-169 operators: E216 momentum-run bands, T222
core-vocabulary coverage, R149 customer-concentration trend — each vs a
scalar brute-force reference on planted fixtures."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY_US = 86_400_000_000


def test_momentum_runs_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_momentum_runs

    g = np.random.default_rng(401)
    n = 4000
    ts = np.sort(g.integers(0, 20 * DAY_US, n).astype(np.int64))
    uid = g.integers(1, 60, n).astype(np.int64)
    eid = np.arange(n, dtype=np.int64)
    value = g.integers(0, 30, n).astype(np.float64)  # coarse -> ties
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
        rows.sort()
        vals = [v for _, _, v in rows]
        best = cur = 1
        for a, b in zip(vals, vals[1:]):
            cur = cur + 1 if b > a else 1
            best = max(best, cur)
        band = min(best, 20)
        nu[band] += 1
        ne[band] += len(vals)

    got = events_momentum_runs(str(tmp_path)).to_pandas().set_index(
        "run_band"
    )
    assert sorted(got.index.tolist()) == sorted(nu)
    for band in nu:
        assert int(got.loc[band, "n_users"]) == nu[band]
        assert int(got.loc[band, "n_events"]) == ne[band]


def test_core_vocab_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import core_vocab

    g = np.random.default_rng(409)
    shared = [f"core{i}" for i in range(6)]
    rows = []
    for i in range(300):
        src = f"s{i % 4}"
        words = [shared[int(g.integers(0, 6))]
                 for _ in range(int(g.integers(1, 8)))]
        words += [f"only_{src}_{int(g.integers(0, 20))}"
                  for _ in range(int(g.integers(0, 4)))]
        rows.append({"doc_id": i, "text": " ".join(words), "lang": "en",
                     "source": src, "n_chars": 0})
    pq.write_table(pa.Table.from_pylist(rows), tmp_path / "documents.parquet")

    breadth = collections.defaultdict(set)
    occ = collections.defaultdict(collections.Counter)
    for r in rows:
        for w in r["text"].split(" "):
            breadth[w].add(r["source"])
            occ[r["source"]][w] += 1
    ns = 4
    agg = {}
    for src, c in occ.items():
        tot = sum(c.values())
        core = sum(n for w, n in c.items() if 2 * len(breadth[w]) >= ns)
        agg[src] = (tot, core)

    got = core_vocab(str(tmp_path)).to_pandas().set_index("source")
    for src, (tot, core) in agg.items():
        row = got.loc[src]
        assert int(row["n_occurrences"]) == tot
        assert int(row["n_core"]) == core
        assert int(row["core_permille"]) == 1000 * core // tot


def test_concentration_trend_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import concentration_trend

    g = np.random.default_rng(419)
    n_ord = 500
    ck = g.integers(1, 40, n_ord).astype(np.int64)
    day = g.integers(9000, 12000, n_ord).astype(np.int64)
    pq.write_table(
        pa.table({
            "o_custkey": pa.array(ck),
            "o_orderdate": pa.array(day * DAY_US, pa.int64()).cast(
                pa.timestamp("us")
            ),
        }),
        tmp_path / "orders.parquet",
    )

    per = collections.Counter()
    for c, d in zip(ck, day):
        yr = int(np.datetime64(int(d), "D").astype("datetime64[Y]")
                 .astype(int)) + 1970
        per[(int(c), yr)] += 1
    agg = collections.defaultdict(lambda: [0, 0, 0])
    for (c, yr), n in per.items():
        a = agg[yr]
        a[0] += n
        a[1] += 1
        a[2] += n * (n - 1)

    got = concentration_trend(str(tmp_path)).to_pandas().set_index(
        "order_year"
    )
    assert len(got) == len(agg)
    for yr, (no, nc, s2) in agg.items():
        row = got.loc[yr]
        assert int(row["n_orders"]) == no
        assert int(row["n_customers"]) == nc
        assert int(row["simpson_num"]) == s2
