"""Round-4 wave-56 operators: T109 label-pair grid overlap (planted
inseparable label pair), E104 weekly-profile concentration stats
(planted clock-shaped source) — each vs a scalar brute force."""

from __future__ import annotations

import collections
import itertools
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_embedding_label_overlap_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import embedding_label_overlap

    g = np.random.default_rng(410)
    n, d = 600, 6
    vecs = g.uniform(-1.0, 1.0, size=(n, d)).astype(np.float32)
    labels = g.integers(0, 4, n).astype(np.int32)
    # labels 0 and 1 confined to one shared cell: fully inseparable pair
    sel = labels <= 1
    vecs[sel, 0] = np.float32(0.3)
    vecs[sel, 1] = np.float32(0.3)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
                "label": pa.array(labels),
            }
        ),
        tmp_path / "embeddings.parquet",
    )

    cells = collections.defaultdict(set)
    for i in range(n):
        cx = int(math.floor(2.0 * float(vecs[i, 0])))
        cy = int(math.floor(2.0 * float(vecs[i, 1])))
        cells[int(labels[i])].add((cx, cy))
    want = {}
    for a, b in itertools.combinations(sorted(cells), 2):
        c = len(cells[a] & cells[b])
        if c:
            want[(a, b)] = (len(cells[a]), len(cells[b]), c)

    got = embedding_label_overlap(str(tmp_path)).to_pandas()
    assert len(got) == len(want)
    for _, r in got.iterrows():
        ca, cb, c = want[(int(r.label_a), int(r.label_b))]
        assert (int(r.cells_a), int(r.cells_b), int(r.cells_both)) == (
            ca,
            cb,
            c,
        ), (r.label_a, r.label_b)
    # the planted pair shares its single cell
    r01 = got[(got.label_a == 0) & (got.label_b == 1)].iloc[0]
    assert int(r01.cells_a) == 1 and int(r01.cells_b) == 1
    assert int(r01.cells_both) == 1


def test_events_profile_concentration_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_profile_concentration

    g = np.random.default_rng(411)
    n = 3000
    types = np.array(["flat", "clock"])[g.integers(0, 2, n)]
    day_us = 86_400_000_000
    hour_us = 3_600_000_000
    base = np.datetime64("2026-01-01", "us").astype(np.int64)
    ts = np.empty(n, np.int64)
    for i in range(n):
        day = int(g.integers(0, 28))
        if types[i] == "clock":  # everything at 09:00 on weekdays-ish
            hour = 9
        else:
            hour = int(g.integers(0, 24))
        ts[i] = base + day * day_us + hour * hour_us + int(g.integers(0, hour_us))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "user_id": pa.array(np.zeros(n, np.int64)),
                "event_type": pa.array(types.tolist()),
                "value": pa.array(np.ones(n)),
                "props": pa.array(["{}"] * n),
            }
        ),
        tmp_path / "events.parquet",
    )

    cnt = collections.defaultdict(collections.Counter)
    for t, u in zip(types, ts):
        days = u // day_us
        dow = (days + 4) % 7
        hour = (u % day_us) // hour_us
        cnt[t][(int(dow), int(hour))] += 1

    got = events_profile_concentration(str(tmp_path)).to_pandas().set_index(
        "source"
    )
    assert len(got) == 2
    for t in ("flat", "clock"):
        c = cnt[t]
        r = got.loc[t]
        assert int(r.n_events) == sum(c.values())
        assert int(r.n_cells) == len(c)
        assert int(r.sum_sq) == sum(v * v for v in c.values())
    # the clock source concentrates: far fewer active cells
    assert int(got.loc["clock"].n_cells) < int(got.loc["flat"].n_cells)
