"""Round-5 wave-161 operators: E208 volume drawdown board, T214
vocabulary-age profile, R141 double-booking audit — each vs a scalar
brute-force reference on planted fixtures."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY_US = 86_400_000_000


def test_drawdown_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_drawdown

    g = np.random.default_rng(263)
    n = 5000
    ts = np.sort(g.integers(0, 120 * DAY_US, n).astype(np.int64))
    types = np.array(["click", "view"])
    ty = g.integers(0, 2, n)
    # kill 'view' traffic in the last 40 days -> big drawdown
    kill = (ts > 80 * DAY_US) & (ty == 1)
    ts = ts[~kill]
    ty = ty[~kill]
    n = len(ts)
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(g.integers(1, 50, n).astype(np.int64)),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(g.uniform(0, 10, n)),
            "event_type": pa.array(types[ty]),
        }),
        tmp_path / "events.parquet",
    )

    daily = collections.defaultdict(collections.Counter)
    for t, k in zip(ts, ty):
        daily[int(k)][int(t) // DAY_US] += 1
    got = events_drawdown(str(tmp_path)).to_pandas().set_index("source")
    for k, name in enumerate(types):
        series = [daily[k][d] for d in sorted(daily[k])]
        run = np.maximum.accumulate(series)
        row = got.loc[name]
        assert int(row["n_days"]) == len(series)
        assert int(row["peak_day_events"]) == max(series)
        assert int(row["max_drawdown"]) == int((run - series).max())


def test_vocab_age_profile_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import vocab_age_profile

    g = np.random.default_rng(269)
    rows = []
    n_docs = 300
    for i in range(n_docs):
        src = f"s{i % 2}"
        # vocabulary grows over the corpus: words drawn near doc index
        words = [f"w{int(g.integers(max(0, i - 40), i + 1))}"
                 for _ in range(int(g.integers(1, 12)))]
        rows.append({"doc_id": i, "text": " ".join(words), "lang": "en",
                     "source": src, "n_chars": 0})
    pq.write_table(pa.Table.from_pylist(rows), tmp_path / "documents.parquet")

    first = {}
    for r in rows:
        for w in set(r["text"].split(" ")):
            if w not in first or r["doc_id"] < first[w]:
                first[w] = r["doc_id"]
    agg = collections.Counter()
    seen = set()
    for r in rows:
        for w in set(r["text"].split(" ")):
            key = (r["source"], w)
            if key in seen:
                continue
            seen.add(key)
            dec = min(10 * first[w] // n_docs, 9)
            agg[(r["source"], dec)] += 1

    got = vocab_age_profile(str(tmp_path)).to_pandas()
    assert len(got) == len(agg)
    for _, row in got.iterrows():
        assert int(row["n_types"]) == agg[
            (row["source"], int(row["age_decile"]))
        ]


def test_double_booking_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import double_booking

    g = np.random.default_rng(271)
    n_ord = 600
    ck = g.integers(1, 40, n_ord).astype(np.int64)
    day = g.integers(0, 30, n_ord).astype(np.int64)
    price = g.integers(10, 40, n_ord) * 10.0  # coarse -> collisions
    pq.write_table(
        pa.table({
            "o_custkey": pa.array(ck),
            "o_orderdate": pa.array(day * DAY_US, pa.int64()).cast(
                pa.timestamp("us")
            ),
            "o_totalprice": pa.array(price),
        }),
        tmp_path / "orders.parquet",
    )

    groups = collections.Counter()
    for c, d, p in zip(ck, day, price):
        groups[(int(c), int(d), int(np.floor(100 * p)))] += 1
    nd = sum(n for n in groups.values() if n >= 2)
    ng = sum(1 for n in groups.values() if n >= 2)
    mx = max(groups.values())

    got = double_booking(str(tmp_path)).to_pandas().iloc[0]
    assert int(got["n_orders"]) == n_ord
    assert int(got["n_dup_groups"]) == ng
    assert int(got["n_doubled"]) == nd
    assert int(got["max_multiplicity"]) == mx
    assert int(got["doubled_permille"]) == 1000 * nd // n_ord
