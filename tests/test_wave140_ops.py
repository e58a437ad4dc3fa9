"""Round-4 wave-140 operators: E187 heartbeat board (planted 60s cron
pulse pins the modal gap; window-crossing pair included), T194/F
dominant-token board (planted pad-id flood pins the modal rows), R121
priority-migration matrix (planted escalating customers pin the flow
cells) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_heartbeat_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_heartbeat

    base = np.datetime64("2026-07-01", "us").astype(np.int64)
    rows = []  # (source, ts_us)
    # "cron": 6 events at exactly 60s spacing (one pair crosses the
    # 120s window); plus one 5s anomaly
    t = base
    for _ in range(6):
        rows.append(("cron", t))
        t += 60_000_000
    rows.append(("cron", t + 5_000_000))
    # "organic": distinct gaps, tie between 10s and 20s (each twice)
    t = base
    rows.append(("organic", t))
    for gsec in (10, 20, 10, 20, 33):
        t += gsec * 1_000_000
        rows.append(("organic", t))
    # "lone": no pairs -> zero row
    rows.append(("lone", base))
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows]),
                "ts": pa.array(
                    np.array([r[1] for r in rows], np.int64)
                ).cast(pa.timestamp("us")),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.zeros(n, np.int64)),
                "value": pa.array(np.ones(n)),
            }
        ),
        tmp_path / "events.parquet",
    )

    got = (
        events_heartbeat(str(tmp_path), window_us=120_000_000)
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    per = collections.defaultdict(list)
    for s, t_ in rows:
        per[s].append(t_)
    for s, ts in per.items():
        ts.sort()
        gaps = collections.Counter(
            (b - a) // 1_000_000 for a, b in zip(ts, ts[1:])
        )
        row = got.loc[s]
        npairs = sum(gaps.values())
        assert row["n_pairs"] == npairs
        if npairs:
            best = min(
                gaps.items(), key=lambda kv: (-kv[1], kv[0])
            )
            assert row["modal_gap_s"] == best[0]
            assert row["modal_count"] == best[1]
    assert got.loc["cron", "modal_gap_s"] == 60
    assert got.loc["cron", "modal_count"] == 5
    assert got.loc["organic", "modal_gap_s"] == 10   # tie -> smaller
    assert got.loc["lone", "n_pairs"] == 0


def test_dominant_token_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import dominant_token

    rows = [  # (source, tokens)
        ("padded", [0, 0, 0, 0, 7, 8]),
        ("padded", [0, 0, 9]),
        ("clean", [5, 6, 7, 8]),
        ("clean", [9, 10, 5]),   # 5 appears twice overall
        ("tied", [3, 3, 4, 4]),  # tie -> smaller id wins
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(
                    [f"{s}-{i:06d}" for i, (s, _) in enumerate(rows)]
                ),
                "tokens": pa.array(
                    [r[1] for r in rows], pa.list_(pa.int32())
                ),
                "n_tok": pa.array([len(r[1]) for r in rows], pa.int32()),
                "source": pa.array([r[0] for r in rows]),
            }
        ),
        tmp_path / "part-00000.parquet",
    )

    got = (
        dominant_token(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    per = collections.defaultdict(collections.Counter)
    for s, toks in rows:
        per[s].update(toks)
    for s, cnt in per.items():
        row = got.loc[s]
        tot = sum(cnt.values())
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        assert row["n_occurrences"] == tot
        assert row["modal_token"] == best[0]
        assert row["modal_count"] == best[1]
        assert row["modal_permille"] == 1000 * best[1] // tot
    assert got.loc["padded", "modal_token"] == 0
    assert got.loc["padded", "modal_count"] == 6
    assert got.loc["tied", "modal_token"] == 3


def test_rel_priority_migration_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import priority_migration

    day = 86_400_000_000
    d0 = np.datetime64("2026-01-05", "us").astype(np.int64)
    rows = []  # (custkey, day_offset, priority)
    # escalator: 5-LOW -> 3-MEDIUM -> 1-URGENT
    for i, pr in enumerate(["5-LOW", "3-MEDIUM", "1-URGENT"]):
        rows.append((1, i * 10, pr))
    # loyalist: three 2-HIGH orders (diagonal mass)
    for i in range(3):
        rows.append((2, i * 7, "2-HIGH"))
    # single-order customer contributes nothing
    rows.append((3, 0, "4-NOT SPECIFIED"))
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
                    np.array(
                        [d0 + r[1] * day for r in rows], np.int64
                    )
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array([r[2] for r in rows]),
            }
        ),
        tmp_path / "orders.parquet",
    )

    got = (
        priority_migration(str(tmp_path))
        .to_pandas()
        .set_index(["from_priority", "to_priority"])
        .sort_index()
    )
    per = collections.defaultdict(list)
    for ck, off, pr in rows:
        per[ck].append((off, pr))
    want = collections.Counter()
    for ck, cells in per.items():
        cells.sort()
        for (_, a), (_, b) in zip(cells, cells[1:]):
            want[(a, b)] += 1
    assert set(got.index) == set(want)
    for key, cnt in want.items():
        assert got.loc[key, "n_transitions"] == cnt
    assert got.loc[("5-LOW", "3-MEDIUM"), "n_transitions"] == 1
    assert got.loc[("2-HIGH", "2-HIGH"), "n_transitions"] == 2
