"""Round-4 wave-101 operators: E148 minute-load transition matrix
(planted per-minute load sequences — including gaps and an above-cap
spike — pin every Markov cell), T155 sentence-length spectrum (planted
fragment shapes pin the word-count bands), R82 large-order drill-down
(planted megaorders with a tie at the cut pin the top-10 set) — each vs
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


def test_rel_megaorders_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import megaorder_drilldown

    g = np.random.default_rng(835)
    ok, qty = [], []
    # 3 planted megaorders: totals 500, 400, 400 (tie -> lower okey wins
    # nothing here, both are in; the tie at the CUT is below)
    for okey, total, nl in ((11, 500, 5), (22, 400, 4), (33, 400, 8)):
        per = total // nl
        for _ in range(nl):
            ok.append(okey)
            qty.append(float(per))
    # 9 orders at total 100 -> only 7 fit in top-10; lowest okeys win
    for okey in range(200, 209):
        ok.append(okey)
        qty.append(100.0)
    # noise tail, totals < 100
    for okey in range(300, 340):
        nl = int(g.integers(1, 5))
        for _ in range(nl):
            ok.append(okey)
            qty.append(float(g.integers(1, 20)))
    n = len(ok)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.array(ok, np.int64)),
                "l_partkey": pa.array(np.ones(n, np.int64)),
                "l_suppkey": pa.array(np.ones(n, np.int64)),
                "l_linenumber": pa.array(np.ones(n, np.int32)),
                "l_quantity": pa.array(np.array(qty)),
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
    all_ok = sorted(set(ok))
    no = len(all_ok)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.array(all_ok, np.int64)),
                "o_custkey": pa.array(
                    np.array([k % 7 + 1 for k in all_ok], np.int64)
                ),
                "o_orderstatus": pa.array(["O"] * no),
                "o_totalprice": pa.array(
                    np.array([k * 10 + 0.99 for k in all_ok])
                ),
                "o_orderdate": pa.array(
                    np.full(no, np.datetime64("2026-01-01", "us"))
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * no),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(np.arange(1, 8, dtype=np.int64)),
                "c_name": pa.array([f"Customer#{i}" for i in range(1, 8)]),
                "c_nationkey": pa.array(np.zeros(7, np.int64)),
                "c_acctbal": pa.array(np.zeros(7)),
                "c_mktsegment": pa.array(["BUILDING"] * 7),
            }
        ),
        tmp_path / "customer.parquet",
    )

    per = collections.defaultdict(lambda: [0, 0])
    for k, q in zip(ok, qty):
        per[k][0] += 1
        per[k][1] += int(np.floor(q))
    ranked = sorted(per.items(), key=lambda kv: (-kv[1][1], kv[0]))[:10]

    got = (
        megaorder_drilldown(str(tmp_path))
        .to_pandas()
        .set_index("o_orderkey")
        .sort_index()
    )
    assert sorted(got.index) == sorted(k for k, _ in ranked)
    for k, (nl, tq) in ranked:
        row = got.loc[k]
        assert row["total_qty"] == tq
        assert row["n_lines"] == nl
        assert row["c_name"] == f"Customer#{k % 7 + 1}"
        assert row["price_floor"] == k * 10
    # the tie at the cut: okeys 200..206 in, 207/208 out
    assert 206 in got.index and 207 not in got.index
