"""Round-4 wave-130 operators: E177 refund-matching board (planted
exact reversals and write-offs pin every counter), T184 label-source
composition matrix (planted concentrated labels and orphan vectors pin
the cells), R111 brand naming matrix (planted trademark vs generic
words pin ownership) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_refund_matching_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_refund_matching

    base = np.datetime64("2026-07-01", "us").astype(np.int64)
    rows = []  # (source, value)
    # "clean": 3x +10.50 and 2x -10.50 -> 2 matches; 1x -5.25 unmatched
    rows += [("clean", 10.50)] * 3 + [("clean", -10.50)] * 2
    rows.append(("clean", -5.25))
    # "writeoff": negatives with no positives at those amounts
    rows += [("writeoff", -100.0), ("writeoff", -200.0),
             ("writeoff", 50.0)]
    # zero values are excluded entirely
    rows.append(("clean", 0.0))
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows]),
                "ts": pa.array(
                    base + np.arange(n, dtype=np.int64) * 1000
                ).cast(pa.timestamp("us")),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.zeros(n, np.int64)),
                "value": pa.array(np.array([r[1] for r in rows])),
            }
        ),
        tmp_path / "events.parquet",
    )

    got = (
        events_refund_matching(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    per = collections.defaultdict(lambda: collections.defaultdict(
        lambda: [0, 0]))
    for s, v in rows:
        c = int(np.rint(v * 100))
        if c == 0:
            continue
        cell = per[s][abs(c)]
        if c > 0:
            cell[0] += 1
        else:
            cell[1] += 1
    for s, amts in per.items():
        npos = sum(p for p, _ in amts.values())
        nneg = sum(q for _, q in amts.values())
        nm = sum(min(p, q) for p, q in amts.values())
        row = got.loc[s]
        assert row["n_positive"] == npos
        assert row["n_negative"] == nneg
        assert row["matched_pairs"] == nm
        assert row["match_permille"] == 1000 * nm // max(nneg, 1)
    assert got.loc["clean", "matched_pairs"] == 2
    assert got.loc["clean", "match_permille"] == 1000 * 2 // 3
    assert got.loc["writeoff", "matched_pairs"] == 0


def test_embedding_label_source_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import label_source_matrix

    # docs: ids 1..4 in "web", 5..6 in "book"
    doc_src = {1: "web", 2: "web", 3: "web", 4: "web", 5: "book", 6: "book"}
    nd = len(doc_src)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.array(list(doc_src), np.int64)),
                "text": pa.array(["t"] * nd),
                "lang": pa.array(["en"] * nd),
                "source": pa.array(list(doc_src.values())),
                "n_chars": pa.array([1] * nd, pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    # vectors: label 7 lives in web docs only; label 8 in book;
    # vec 99 is an orphan with label 7
    vecs = [(1, 7), (2, 7), (3, 7), (5, 8), (6, 8), (99, 7), (4, 8)]
    nv = len(vecs)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.array([v[0] for v in vecs], np.int64)),
                "embedding": pa.array(
                    [[1.0, 2.0]] * nv, pa.list_(pa.float32())
                ),
                "label": pa.array(
                    np.array([v[1] for v in vecs], np.int32)
                ),
            }
        ),
        tmp_path / "embeddings.parquet",
    )

    got = (
        label_source_matrix(str(tmp_path))
        .to_pandas()
        .set_index(["source", "label"])
        .sort_index()
    )
    want = collections.Counter()
    for vid, lab in vecs:
        want[(doc_src.get(vid, "<unlinked>"), lab)] += 1
    assert set(got.index) == set(want)
    for key, cnt in want.items():
        assert got.loc[key, "n_vectors"] == cnt
    assert got.loc[("web", 7), "n_vectors"] == 3
    assert got.loc[("<unlinked>", 7), "n_vectors"] == 1
    assert got.loc[("web", 8), "n_vectors"] == 1


def test_rel_brand_naming_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import brand_naming_matrix

    parts = [  # (name, brand)
        ("turbo widget", "Brand#A"),
        ("turbo gizmo", "Brand#A"),     # "turbo" is Brand#A trademark
        ("small widget", "Brand#B"),
        ("small bolt", "Brand#B"),
        ("small widget", "Brand#A"),    # "widget"/"small" shared
    ]
    n = len(parts)
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(np.arange(1, n + 1, dtype=np.int64)),
                "p_name": pa.array([p[0] for p in parts]),
                "p_brand": pa.array([p[1] for p in parts]),
                "p_type": pa.array(["ECONOMY"] * n),
                "p_size": pa.array(np.ones(n, np.int64)),
                "p_retailprice": pa.array(np.full(n, 100.0)),
            }
        ),
        tmp_path / "part.parquet",
    )

    want = collections.Counter()
    for name, brand in parts:
        for w in name.split(" "):
            want[(w, brand)] += 1
    got = (
        brand_naming_matrix(str(tmp_path))
        .to_pandas()
        .set_index(["word", "brand"])
        .sort_index()
    )
    assert set(got.index) == set(want)
    for key, cnt in want.items():
        assert got.loc[key, "n_parts"] == cnt
    assert got.loc[("turbo", "Brand#A"), "n_parts"] == 2
    assert ("turbo", "Brand#B") not in got.index
    assert got.loc[("small", "Brand#B"), "n_parts"] == 2
