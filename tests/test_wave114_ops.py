"""Round-4 wave-114 operators: E161 payload-persistence sufficient stats
(planted random-walk vs white-noise payloads — with a pair crossing the
ts-window boundary — pin all six sums), T168 label-contradiction audit
(planted agreeing and contradicted duplicate vectors pin every counter),
R95 reactivation trend board (planted win-backs pin per-year counts) —
each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_payload_persistence_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_payload_persistence

    base = np.datetime64("2026-07-01", "us").astype(np.int64)
    rows = []  # (source, ts_us, event_id, value)
    eid = 0

    def ev(s, t, v):
        nonlocal eid
        rows.append((s, t, eid, v))
        eid += 1

    # "walk": smooth drift 10, 11, 12, 13 — with the last pair crossing
    # the 60s window boundary
    ev("walk", base + 1_000_000, 10.2)
    ev("walk", base + 30_000_000, 11.9)   # floor 11
    ev("walk", base + 55_000_000, 12.0)
    ev("walk", base + 70_000_000, 13.5)   # next window
    # "noise": alternating extremes incl. a negative floor
    ev("noise", base + 1_000_000, 100.0)
    ev("noise", base + 2_000_000, -3.2)   # floor -4
    ev("noise", base + 3_000_000, 100.0)
    # "lone": no pairs
    ev("lone", base, 7.0)

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
                "user_id": pa.array(np.zeros(n, np.int64)),
                "value": pa.array(np.array([r[3] for r in rows])),
            }
        ),
        tmp_path / "events.parquet",
    )

    got = (
        events_payload_persistence(str(tmp_path), window_us=60_000_000)
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    per = collections.defaultdict(list)
    for s, t, e, v in rows:
        per[s].append((t, e, int(np.floor(v))))
    assert list(got.index) == sorted(per)
    for s, evs in per.items():
        evs.sort()
        xs = [a[2] for a in evs[:-1]]
        ys = [a[2] for a in evs[1:]]
        row = got.loc[s]
        assert row["n_pairs"] == len(xs)
        assert row["sum_x"] == sum(xs)
        assert row["sum_x_sq"] == sum(x * x for x in xs)
        assert row["sum_y"] == sum(ys)
        assert row["sum_y_sq"] == sum(y * y for y in ys)
        assert row["sum_xy"] == sum(x * y for x, y in zip(xs, ys))
    assert got.loc["lone", "n_pairs"] == 0
    assert got.loc["walk", "sum_xy"] == 10 * 11 + 11 * 12 + 12 * 13
    assert got.loc["noise", "sum_xy"] == 100 * -4 + -4 * 100


def test_embedding_label_contradiction_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import label_contradiction

    vecs, labels = [], []
    # clean dup group: same vector, same label (x3) -> dup, NOT contradicted
    for _ in range(3):
        vecs.append([1.0, 2.0, 3.0])
        labels.append(7)
    # contradicted group: same vector, labels 1/2/3 (fan 3, 4 vectors)
    for lab in (1, 2, 3, 1):
        vecs.append([9.0, 9.0, 9.0])
        labels.append(lab)
    # second contradicted group: fan 2, 2 vectors
    vecs.append([5.0, 5.0, 5.0])
    labels.append(1)
    vecs.append([5.0, 5.0, 5.0])
    labels.append(2)
    # singletons
    for i in range(6):
        vecs.append([float(i), 0.5, -1.0])
        labels.append(0)
    n = len(vecs)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array(np.array(labels, np.int32)),
            }
        ),
        tmp_path / "embeddings.parquet",
    )

    got = label_contradiction(str(tmp_path)).to_pandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert row["n_distinct_vectors"] == 9   # 3 groups + 6 singletons
    assert row["n_dup_groups"] == 3
    assert row["n_contradicted_groups"] == 2
    assert row["n_contradicted_vectors"] == 6   # 4 + 2
    assert row["max_label_fanout"] == 3


def test_rel_reactivation_trend_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import reactivation_trend

    day = 86_400_000_000
    d0 = np.datetime64("2024-01-10", "us").astype(np.int64)
    rows = []  # (custkey, odate)
    # cust 1: orders 2024-01, 2024-03 (gap 60d, repeat not react),
    # then 2025-06 (gap ~450d -> REACTIVATION in 2025)
    rows.append((1, d0))
    rows.append((1, d0 + 60 * day))
    rows.append((1, d0 + 510 * day))
    # cust 2: steady monthly orders in 2024 (repeats, no reacts)
    for m in range(6):
        rows.append((2, d0 + m * 30 * day))
    # cust 3: single order (no repeat)
    rows.append((3, d0 + 100 * day))
    # cust 4: two orders 200 days apart within 2024 -> react in 2024
    rows.append((4, d0))
    rows.append((4, d0 + 200 * day))
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "o_custkey": pa.array(
                    np.array([r[0] for r in rows], np.int64)
                ),
                "o_orderstatus": pa.array(["O"] * n),
                "o_totalprice": pa.array(np.full(n, 100.0)),
                "o_orderdate": pa.array(
                    np.array([r[1] for r in rows], np.int64)
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n),
            }
        ),
        tmp_path / "orders.parquet",
    )

    per = collections.defaultdict(list)
    for ck, od in rows:
        per[ck].append(od)
    want = collections.defaultdict(lambda: [0, 0])
    for ck, ods in per.items():
        ods.sort()
        for prev, cur in zip(ods, ods[1:]):
            yr = int(
                np.int64(cur).astype("datetime64[us]")
                .astype("datetime64[Y]").astype(np.int64)
            ) + 1970
            c = want[yr]
            c[0] += 1
            if cur // day - prev // day > 180:
                c[1] += 1

    got = (
        reactivation_trend(str(tmp_path))
        .to_pandas()
        .set_index("order_year")
        .sort_index()
    )
    assert sorted(got.index) == sorted(want)
    for yr, (nrep, nreact) in want.items():
        row = got.loc[yr]
        assert row["n_repeat_orders"] == nrep
        assert row["n_reactivations"] == nreact
        assert row["reactivation_permille"] == 1000 * nreact // max(nrep, 1)
    assert got.loc[2025, "n_reactivations"] == 1
    assert got.loc[2024, "n_reactivations"] == 1   # cust 4
