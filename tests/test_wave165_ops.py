"""Round-5 wave-165 operators: E212 value-field health trend, T218
doc-id stripe detection, R145 demand-continuity audit — each vs a
scalar brute-force reference on planted fixtures."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY_US = 86_400_000_000


def test_zero_value_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_zero_value

    g = np.random.default_rng(337)
    n = 3000
    ts = np.sort(g.integers(9000 * DAY_US, 11000 * DAY_US, n)
                 .astype(np.int64))
    types = np.array(["click", "view"])
    ty = g.integers(0, 2, n)
    value = g.uniform(0, 5, n)  # plenty of sub-1 -> zero floors
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(g.integers(1, 50, n).astype(np.int64)),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(value),
            "event_type": pa.array(types[ty]),
        }),
        tmp_path / "events.parquet",
    )

    agg = collections.defaultdict(lambda: [0, 0])
    for t, k, v in zip(ts, ty, value):
        yr = int(np.datetime64(int(t) // DAY_US, "D")
                 .astype("datetime64[Y]").astype(int)) + 1970
        a = agg[(int(k), yr)]
        a[0] += 1
        a[1] += 1 if int(np.floor(v)) == 0 else 0

    got = events_zero_value(str(tmp_path)).to_pandas()
    assert len(got) == len(agg)
    for _, row in got.iterrows():
        k = int(np.where(types == row["source"])[0][0])
        ne, nz = agg[(k, int(row["year"]))]
        assert int(row["n_events"]) == ne
        assert int(row["n_zero"]) == nz
        assert int(row["zero_permille"]) == 1000 * nz // ne


def test_id_stripe_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import id_stripe

    rows = []
    # s0: striped (round-robin over 3 sources), s_rand: scattered ids
    for i in range(300):
        rows.append({"doc_id": i, "text": "a", "lang": "en",
                     "source": f"s{i % 3}", "n_chars": 1})
    g = np.random.default_rng(347)
    for i, did in enumerate(
        g.choice(np.arange(1000, 5000), size=120, replace=False)
    ):
        rows.append({"doc_id": int(did), "text": "a", "lang": "en",
                     "source": "s_rand", "n_chars": 1})
    pq.write_table(pa.Table.from_pylist(rows), tmp_path / "documents.parquet")

    agg = collections.defaultdict(collections.Counter)
    for r in rows:
        agg[r["source"]][r["doc_id"] % 64] += 1

    got = id_stripe(str(tmp_path)).to_pandas().set_index("source")
    for s, c in agg.items():
        row = got.loc[s]
        nd = sum(c.values())
        assert int(row["n_docs"]) == nd
        assert int(row["n_residues"]) == len(c)
        modal = min(c, key=lambda r: (-c[r], r))
        assert int(row["modal_share_permille"]) == 1000 * c[modal] // nd


def test_demand_continuity_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import demand_continuity

    g = np.random.default_rng(349)
    day = np.concatenate([
        g.integers(1000, 1100, 200),
        g.integers(1150, 1200, 100),  # 50-day blackout planted
    ]).astype(np.int64)
    pq.write_table(
        pa.table({
            "o_orderkey": pa.array(np.arange(len(day), dtype=np.int64)),
            "o_orderdate": pa.array(day * DAY_US, pa.int64()).cast(
                pa.timestamp("us")
            ),
        }),
        tmp_path / "orders.parquet",
    )

    d = np.unique(day)
    span = int(d[-1] - d[0]) + 1
    gap = int((np.diff(d) - 1).max())

    got = demand_continuity(str(tmp_path)).to_pandas().iloc[0]
    assert int(got["span_days"]) == span
    assert int(got["active_days"]) == len(d)
    assert int(got["coverage_permille"]) == 1000 * len(d) // span
    assert int(got["longest_blackout"]) == gap
