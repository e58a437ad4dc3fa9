"""Round-4 wave-48 operators: T97/F hourly vocabulary-novelty curve over
a synthetic token tape, T98 quality x length-band matrix (checked as a
composition of the standalone oracle-checked feature operators), R34
line-status priority split (Q12 shape) vs a scalar brute force."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_f1_vocab_novelty_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import f1_vocab_novelty_1h

    g = np.random.default_rng(340)
    n = 500
    toks = [
        g.integers(0, 90, size=g.integers(3, 20)).astype(np.int32)
        for _ in range(n)
    ]
    # token 95 appears ONLY in the last hour bucket: a planted novelty
    toks[-1] = np.append(toks[-1], np.int32(95))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(
                    [f"s{i % 3:02d}-{i * 17:08d}" for i in range(n)]
                ),
                "tokens": pa.array(
                    [t.tolist() for t in toks], pa.list_(pa.int32())
                ),
                "n_tok": pa.array([len(t) for t in toks], pa.int32()),
                "source": pa.array([f"s{i % 3:02d}" for i in range(n)]),
            }
        ),
        tmp_path / "part-00000.parquet",
    )

    pairs = set()
    for i, t in enumerate(toks):
        b = (i * 17) // 3600
        for tok in t:
            pairs.add((int(tok), b))
    first = {}
    for tok, b in sorted(pairs):
        first.setdefault(tok, b)
        first[tok] = min(first[tok], b)
    nd = collections.Counter(b for _, b in pairs)
    nn = collections.Counter(b for tok, b in pairs if first[tok] == b)

    got = f1_vocab_novelty_1h(str(tmp_path)).to_pandas()
    base = np.datetime64("2026-01-01", "us")
    assert len(got) == len(nd)
    for _, r in got.iterrows():
        b = int((np.datetime64(r.bucket_ts, "us") - base).astype(np.int64)
                // 3_600_000_000)
        assert int(r.n_distinct_tokens) == nd[b], b
        assert int(r.n_new_tokens) == nn[b], b
    assert sum(nn.values()) < sum(nd.values())  # novelty strictly declines
    assert nn[max(nd)] >= 1  # the planted late-novel token is counted


def test_quality_length_matrix_composition(ray_session):
    """The matrix must equal the band-grouped composition of the
    standalone oracle-checked feature operators at sf0.001 (the
    test_quality_filter.py intersection convention)."""
    sf = "/root/testdata/sf0.001"

    from mq_to_db_ray.pipelines.training_data import (
        contamination,
        quality_length_matrix,
        quality_score,
        repetition,
    )

    rep = repetition(sf).to_pandas().set_index("doc_id")
    qua = quality_score(sf).to_pandas().set_index("doc_id")
    con = contamination(sf).to_pandas().set_index("doc_id")
    import pyarrow.parquet as _pq

    docs = _pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "lang"]
    ).to_pandas().set_index("doc_id")

    want = collections.defaultdict(lambda: [0, 0])
    for d in docs.index:
        band = int(rep.loc[d, "n_words"]) // 10
        ok = (
            docs.loc[d, "lang"] == "en"
            and rep.loc[d, "dup_word_permille"] <= 600
            and rep.loc[d, "top_word_permille"] <= 130
            and qua.loc[d, "stop_permille"] >= 20
            and not con.loc[d, "contaminated"]
        )
        w = want[band]
        w[0] += 1
        w[1] += int(ok)

    got = quality_length_matrix(sf).to_pandas().set_index("word_band")
    assert len(got) == len(want)
    for band, (n, ok) in want.items():
        r = got.loc[band]
        assert (int(r.n_docs), int(r.n_quality_ok)) == (n, ok), band
    assert int(got.n_quality_ok.sum()) > 0


def test_shipmode_priority_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import shipmode_priority

    g = np.random.default_rng(341)
    n_ord, n_line = 200, 1500
    prio = np.array(
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    )[g.integers(0, 5, n_ord)]
    lord = g.integers(0, n_ord, n_line).astype(np.int64)
    rf = np.array(["A", "N", "R"])[g.integers(0, 3, n_line)]
    ls = np.array(["F", "O"])[g.integers(0, 2, n_line)]
    base = np.datetime64("1995-01-01", "us").astype(np.int64)
    day_us = 86_400_000_000
    ship = base + g.integers(0, 4 * 365, n_line).astype(np.int64) * day_us

    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
                "o_custkey": pa.array(np.zeros(n_ord, np.int64)),
                "o_orderstatus": pa.array(["O"] * n_ord),
                "o_totalprice": pa.array(np.zeros(n_ord)),
                "o_orderdate": pa.array(
                    np.full(n_ord, base), pa.int64()
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(prio.tolist()),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(lord),
                "l_partkey": pa.array(np.zeros(n_line, np.int64)),
                "l_suppkey": pa.array(np.zeros(n_line, np.int64)),
                "l_linenumber": pa.array(np.ones(n_line, np.int32)),
                "l_quantity": pa.array(np.ones(n_line)),
                "l_extendedprice": pa.array(np.ones(n_line)),
                "l_discount": pa.array(np.zeros(n_line)),
                "l_tax": pa.array(np.zeros(n_line)),
                "l_returnflag": pa.array(rf.tolist()),
                "l_linestatus": pa.array(ls.tolist()),
                "l_shipdate": pa.array(ship, pa.int64()).cast(
                    pa.timestamp("us")
                ),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    lo = np.datetime64("1996-01-01", "us").astype(np.int64)
    hi = np.datetime64("1998-01-01", "us").astype(np.int64)
    want = collections.defaultdict(lambda: [0, 0])
    for ok, r, s, d in zip(lord, rf, ls, ship):
        if not (lo <= d < hi):
            continue
        w = want[(r, s)]
        if prio[ok] in ("1-URGENT", "2-HIGH"):
            w[0] += 1
        else:
            w[1] += 1

    got = shipmode_priority(str(tmp_path)).to_pandas()
    assert len(got) == len(want)
    for _, r in got.iterrows():
        nh, nl = want[(r.l_returnflag, r.l_linestatus)]
        assert (int(r.n_high_lines), int(r.n_low_lines)) == (nh, nl), (
            r.l_returnflag,
            r.l_linestatus,
        )
