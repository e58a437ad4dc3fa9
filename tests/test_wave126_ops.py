"""Round-4 wave-126 operators: E173 event day-of-month profile (planted
month-end settlement jobs pin the wheel), T180 Herdan vocabulary-growth
matrix (planted prose / word-soup / loop-spam docs pin the cells), R107
part-dependence histogram (planted practically-single-sourced parts pin
the bands) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_dom_profile_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_dom_profile

    g = np.random.default_rng(866)
    rows = []  # (source, ts, value)
    # "billing": big values on the 1st and 28th across two months
    for mo in ("2026-01", "2026-02"):
        for d, v in ((1, 9_000.5), (28, 7_500.25)):
            rows.append(
                (
                    "billing",
                    np.datetime64(f"{mo}-{d:02d}", "us").astype(np.int64),
                    v,
                )
            )
    # "organic": scattered small events over January
    for _ in range(60):
        d = int(g.integers(1, 29))
        rows.append(
            (
                "organic",
                np.datetime64(f"2026-01-{d:02d}", "us").astype(np.int64)
                + int(g.integers(0, 86_400_000_000)),
                float(np.round(g.uniform(1, 20), 2)),
            )
        )
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
        events_dom_profile(str(tmp_path))
        .to_pandas()
        .set_index(["source", "day_of_month"])
        .sort_index()
    )
    want = collections.defaultdict(lambda: [0, 0])
    for s, ts, v in rows:
        dom = int(str(np.int64(ts).astype("datetime64[us]"))[8:10])
        c = want[(s, dom)]
        c[0] += 1
        c[1] += int(np.floor(v))
    assert set(got.index) == set(want)
    for key, (ne, sv) in want.items():
        row = got.loc[key]
        assert row["n_events"] == ne
        assert row["value_floor"] == sv
    assert got.loc[("billing", 1), "value_floor"] == 2 * 9_000
    assert got.loc[("billing", 28), "n_events"] == 2


def test_doc_herdan_matrix_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import herdan_matrix

    texts = [
        # prose-ish: 20 words, 12 distinct -> bands (5, 4)
        "the cat sat on the mat and the dog sat on the rug "
        "while birds sang songs today",
        # word soup: 16 words all distinct -> (5, 5) ON the diagonal
        " ".join(f"id{i}" for i in range(16)),
        # loop spam: 32 words, 1 distinct -> (6, 1)
        " ".join(["spam"] * 32),
        # tiny: 1 word -> (1, 1)
        "x",
    ]
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * n),
                "source": pa.array(["s"] * n),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    want = collections.Counter()
    for t in texts:
        ws = t.split(" ")
        wb = len(bin(max(len(ws), 1))) - 2
        db = len(bin(max(len(set(ws)), 1))) - 2
        want[(wb, db)] += 1

    got = (
        herdan_matrix(str(tmp_path))
        .to_pandas()
        .set_index(["words_band", "distinct_band"])
        .sort_index()
    )
    assert set(got.index) == set(want)
    for cell, cnt in want.items():
        assert got.loc[cell, "n_docs"] == cnt
    assert got.loc[(6, 1), "n_docs"] == 1   # the loop spam
    assert got.loc[(1, 1), "n_docs"] == 1


def test_rel_part_dependence_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import part_dependence

    lines = []  # (partkey, suppkey)
    # part 1: suppliers 1/2/3 with 18/1/1 lines -> 900 permille -> band 9
    lines += [(1, 1)] * 18 + [(1, 2), (1, 3)]
    # part 2: single supplier -> band 10
    lines += [(2, 9)] * 5
    # part 3: perfectly split 5/5 -> band 5
    lines += [(3, 1)] * 5 + [(3, 2)] * 5
    n = len(lines)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "l_partkey": pa.array(
                    np.array([l[0] for l in lines], np.int64)
                ),
                "l_suppkey": pa.array(
                    np.array([l[1] for l in lines], np.int64)
                ),
                "l_linenumber": pa.array(np.ones(n, np.int32)),
                "l_quantity": pa.array(np.ones(n)),
                "l_extendedprice": pa.array(np.full(n, 100.0)),
                "l_discount": pa.array(np.zeros(n)),
                "l_tax": pa.array(np.zeros(n)),
                "l_returnflag": pa.array(["N"] * n),
                "l_linestatus": pa.array(["O"] * n),
                "l_shipdate": pa.array(
                    np.full(n, np.datetime64("2026-01-01", "us"))
                ),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    per = collections.defaultdict(collections.Counter)
    for pk, sk in lines:
        per[pk][sk] += 1
    want = collections.defaultdict(lambda: [0, 0])
    for pk, supps in per.items():
        tot = sum(supps.values())
        band = 1000 * max(supps.values()) // tot // 100
        want[band][0] += 1
        want[band][1] += tot

    got = (
        part_dependence(str(tmp_path))
        .to_pandas()
        .set_index("dependence_band")
        .sort_index()
    )
    assert sorted(got.index) == sorted(want)
    for band, (np_, nl) in want.items():
        row = got.loc[band]
        assert row["n_parts"] == np_
        assert row["n_lines"] == nl
    assert got.loc[10, "n_parts"] == 1
    assert got.loc[9, "n_parts"] == 1
    assert got.loc[5, "n_parts"] == 1
