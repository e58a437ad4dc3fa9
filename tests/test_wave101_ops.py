"""Round-4 wave-101 operators: E148 minute-load transition matrix
(planted per-minute load sequences — including gaps and an above-cap
spike — pin every Markov cell), T155 sentence-length spectrum (planted
fragment shapes pin the word-count bands), R82 part name-token demand
board (planted two-word names incl. a duplicate-word name pin every row) — each vs
a scalar brute-force reference."""

from __future__ import annotations

import collections
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_load_markov_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_load_markov

    base = np.datetime64("2026-07-01", "us").astype(np.int64)
    minute = 60_000_000
    # per-source planted minute loads (index = minute offset from the
    # source's own first minute; zeros inside the span are gap minutes)
    loads = {
        "steady": [1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
        "spiky": [3, 0, 12, 0, 0, 2, 9, 8, 0, 1],  # 12 and 9 clip to 8
        "lone": [5],                                 # no transitions
    }
    et, ts = [], []
    for s, seq in loads.items():
        for m, n in enumerate(seq):
            for j in range(n):
                et.append(s)
                ts.append(base + m * minute + j * 1000)
    n = len(et)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(et),
                "ts": pa.array(np.array(ts, np.int64)).cast(
                    pa.timestamp("us")
                ),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.zeros(n, np.int64)),
                "value": pa.array(np.ones(n)),
            }
        ),
        tmp_path / "events.parquet",
    )

    got = events_load_markov(str(tmp_path)).to_pandas()
    got = got.set_index(["source", "from_band", "to_band"]).sort_index()

    want = collections.Counter()
    for s, seq in loads.items():
        # dense span = first..last OCCUPIED minute of the source
        occ = [i for i, v in enumerate(seq) if v > 0]
        dense = seq[occ[0] : occ[-1] + 1]
        bands = [min(v, 8) for v in dense]
        for a, b in zip(bands, bands[1:]):
            want[(s, a, b)] += 1
    assert set(got.index) == set(want)
    for key, cnt in want.items():
        assert got.loc[key, "n_transitions"] == cnt
    assert got.loc[("steady", 1, 1), "n_transitions"] == 9
    assert got.loc[("spiky", 0, 8), "n_transitions"] == 1  # 12 clipped
    assert got.loc[("spiky", 8, 0), "n_transitions"] == 2
    assert ("lone",) not in {k[:1] for k in want if False}  # no lone rows
    assert not any(k[0] == "lone" for k in want)


def test_doc_sentence_spectrum_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import sentence_length_spectrum

    rows = [  # (source, text)
        ("prose", "One two three. Four five! Six?"),
        ("prose", "No terminators here at all"),
        ("prose", "Wait... what?"),
        ("dump", "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
        ("dump", "x." + " y" * 70 + "."),  # 71-word fragment clips to 64
        ("empty", ""),
        ("empty", "!!"),
    ]
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array([r[1] for r in rows]),
                "lang": pa.array(["en"] * n),
                "source": pa.array([r[0] for r in rows]),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    got = (
        sentence_length_spectrum(str(tmp_path))
        .to_pandas()
        .set_index(["source", "words_band"])
        .sort_index()
    )
    want = collections.Counter()
    for s, txt in rows:
        for frag in re.split(r"[.!?]", txt):
            want[(s, min(frag.count(" ") + 1, 64))] += 1
    assert set(got.index) == set(want)
    for key, cnt in want.items():
        assert got.loc[key, "n_sentences"] == cnt
    # planted reads: "Wait... what?" -> frags: Wait, '', '', ' what', ''
    assert got.loc[("prose", 1), "n_sentences"] >= 3
    assert got.loc[("dump", 64), "n_sentences"] == 1  # the clipped run-on
    assert got.loc[("empty", 1), "n_sentences"] == 4  # '' + 3 from '!!'


def test_rel_name_tokens_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import name_token_demand

    import collections as _c

    g = np.random.default_rng(835)
    # parts: two-word names over a tiny vocabulary; part 5 never ships
    parts = [
        (1, "red widget"),
        (2, "red bolt"),
        (3, "blue widget"),
        (4, "blue bolt"),
        (5, "green gizmo"),       # zero lines -> zero demand, 1 part
        (6, "red red"),           # duplicate word counts twice
    ]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(
                    np.array([p[0] for p in parts], np.int64)
                ),
                "p_name": pa.array([p[1] for p in parts]),
                "p_brand": pa.array(["Brand#1"] * len(parts)),
                "p_type": pa.array(["ECONOMY"] * len(parts)),
                "p_size": pa.array(np.ones(len(parts), np.int64)),
                "p_retailprice": pa.array(np.full(len(parts), 100.0)),
            }
        ),
        tmp_path / "part.parquet",
    )
    pk, qty, ep, dc = [], [], [], []
    for _ in range(120):
        pk.append(int(g.integers(1, 5)))  # parts 1..4 ship
        qty.append(float(g.integers(1, 20)))
        ep.append(float(g.uniform(100, 900)))
        dc.append(float(g.integers(0, 10)) / 100.0)
    pk.append(6)  # the "red red" part ships once
    qty.append(3.0)
    ep.append(500.0)
    dc.append(0.0)
    n = len(pk)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "l_partkey": pa.array(np.array(pk, np.int64)),
                "l_suppkey": pa.array(np.ones(n, np.int64)),
                "l_linenumber": pa.array(np.ones(n, np.int32)),
                "l_quantity": pa.array(np.array(qty)),
                "l_extendedprice": pa.array(np.array(ep)),
                "l_discount": pa.array(np.array(dc)),
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

    per_part = _c.defaultdict(lambda: [0, 0, 0])  # pk -> nl, qty, rev
    for k, q, e, d in zip(pk, qty, ep, dc):
        c = per_part[k]
        c[0] += 1
        c[1] += int(np.floor(q))
        c[2] += int(np.floor(e * (1.0 - d)))
    want = _c.defaultdict(lambda: [0, 0, 0, 0])
    for k, name in parts:
        for w in name.split(" "):
            c = want[w]
            c[0] += 1
            nl, q, r = per_part.get(k, (0, 0, 0))
            c[1] += nl
            c[2] += q
            c[3] += r

    got = (
        name_token_demand(str(tmp_path))
        .to_pandas()
        .set_index("word")
        .sort_index()
    )
    assert sorted(got.index) == sorted(want)
    for w, (np_, nl, q, r) in want.items():
        row = got.loc[w]
        assert row["n_parts"] == np_
        assert row["n_lines"] == nl
        assert row["qty_floor"] == q
        assert row["revenue_floor"] == r
    assert got.loc["green", "n_lines"] == 0   # never shipped
    assert got.loc["green", "n_parts"] == 1
    assert got.loc["red", "n_parts"] == 4     # incl. "red red" twice
