"""Round-4 wave-111 operators: E158 load-value interaction board
(planted quiet-big vs busy-small value placement pins every band cell),
T165 language-run clustering audit (planted batched vs shuffled lang
orders — with a run crossing the id-window boundary — pin run counts),
R92 order-book aging board (planted stale open orders pin both
quantiles) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _qdisc(sorted_vals, permille):
    n = len(sorted_vals)
    return sorted_vals[(n * permille + 999) // 1000 - 1]


def test_events_load_value_interaction_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_load_value_interaction

    base = np.datetime64("2026-07-01", "us").astype(np.int64)
    minute = 60_000_000
    rows = []  # (source, ts_us, value)
    # "settle": quiet minutes carry huge payloads (band 1),
    # busy minutes carry pennies (band >= 3)
    for m in range(4):
        rows.append(("settle", base + m * minute, 50_000.5))
    for m in range(10, 13):
        for j in range(12):  # 12 events/minute -> clips to band 8
            rows.append(("settle", base + m * minute + j * 1000, 0.75))
    # "retail": value scales with load; minutes of load 2 and 5
    for m in range(3):
        for j in range(2):
            rows.append(("retail", base + m * minute + j * 1000, 10.0))
    for m in range(20, 22):
        for j in range(5):
            rows.append(("retail", base + m * minute + j * 1000, 10.0))
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
                "value": pa.array(np.array([r[2] for r in rows])),
            }
        ),
        tmp_path / "events.parquet",
    )

    got = (
        events_load_value_interaction(str(tmp_path))
        .to_pandas()
        .set_index(["source", "load_band"])
        .sort_index()
    )
    cells = collections.defaultdict(lambda: [0, 0])  # (s, minute) -> n, sv
    for s, ts, v in rows:
        c = cells[(s, ts // minute)]
        c[0] += 1
        c[1] += int(np.floor(v))
    want = collections.defaultdict(lambda: [0, 0, 0])
    for (s, _), (nn, sv) in cells.items():
        band = min(nn, 8)
        c = want[(s, band)]
        c[0] += 1
        c[1] += nn
        c[2] += sv
    assert set(got.index) == set(want)
    for key, (nm, ne, sv) in want.items():
        row = got.loc[key]
        assert row["n_minutes"] == nm
        assert row["n_events"] == ne
        assert row["value_floor"] == sv
    assert got.loc[("settle", 1), "value_floor"] == 4 * 50_000
    assert got.loc[("settle", 8), "n_minutes"] == 3   # 12 clips to 8
    assert got.loc[("retail", 2), "n_minutes"] == 3
    assert got.loc[("retail", 5), "n_minutes"] == 2


def test_doc_lang_runs_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import lang_run_clustering

    rows = []  # (doc_id, lang)
    # batched: ids 0..9 en, 10..19 fr (2 runs), with window_ids=8 the
    # en block crosses the id-window edge and must stay ONE run
    for i in range(10):
        rows.append((i, "en"))
    for i in range(10, 20):
        rows.append((i, "fr"))
    # shuffled zone: ids 30..39 alternate de/es
    for i in range(30, 40):
        rows.append((i, "de" if i % 2 == 0 else "es"))
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.array([r[0] for r in rows], np.int64)),
                "text": pa.array(["x y"] * n),
                "lang": pa.array([r[1] for r in rows]),
                "source": pa.array(["s"] * n),
                "n_chars": pa.array([3] * n, pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    got = (
        lang_run_clustering(str(tmp_path), window_ids=8)
        .to_pandas()
        .set_index("lang")
        .sort_index()
    )
    seq = sorted(rows)
    runs = collections.Counter()
    docs = collections.Counter()
    prev = None
    for _, l in seq:
        docs[l] += 1
        if l != prev:
            runs[l] += 1
        prev = l
    assert list(got.index) == sorted(docs)
    for l in docs:
        row = got.loc[l]
        assert row["n_docs"] == docs[l]
        assert row["n_runs"] == runs[l]
        assert row["runs_permille"] == 1000 * runs[l] // docs[l]
    assert got.loc["en", "n_runs"] == 1   # survives the window edge
    assert got.loc["fr", "n_runs"] == 1
    assert got.loc["de", "n_runs"] == 5
    assert got.loc["es", "n_runs"] == 5


def test_rel_orderbook_aging_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import orderbook_aging

    g = np.random.default_rng(851)
    day = 86_400_000_000
    horizon = np.datetime64("2026-06-30", "us").astype(np.int64)
    rows = []  # (status, age_days)
    # F orders: recent closes, ages 0..20
    for _ in range(40):
        rows.append(("F", int(g.integers(0, 21))))
    # O orders: STALE, ages 100..400
    for _ in range(30):
        rows.append(("O", int(g.integers(100, 401))))
    # P: a handful, mid ages; include the horizon order itself (age 0)
    for a in (0, 50, 60, 70):
        rows.append(("P", a))
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "o_custkey": pa.array(np.ones(n, np.int64)),
                "o_orderstatus": pa.array([r[0] for r in rows]),
                "o_totalprice": pa.array(np.full(n, 100.0)),
                "o_orderdate": pa.array(
                    np.array(
                        [horizon - r[1] * day for r in rows], np.int64
                    )
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n),
            }
        ),
        tmp_path / "orders.parquet",
    )

    got = (
        orderbook_aging(str(tmp_path))
        .to_pandas()
        .set_index("o_orderstatus")
        .sort_index()
    )
    per = collections.defaultdict(list)
    for s, a in rows:
        per[s].append(a)
    assert list(got.index) == sorted(per)
    for s, ages in per.items():
        ages.sort()
        row = got.loc[s]
        assert row["n_orders"] == len(ages)
        assert row["p50_age_days"] == _qdisc(ages, 500)
        assert row["p90_age_days"] == _qdisc(ages, 900)
    assert got.loc["O", "p50_age_days"] >= 100
    assert got.loc["F", "p90_age_days"] <= 20
