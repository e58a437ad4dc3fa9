"""Round-4 wave-33 operators: F-axis token-band histogram and
sequence-level exact dedup over tokenized parquet (the dedup fixture
PLANTS byte-identical token arrays — including the same array under two
sources, which must dedupe per source), R20 fulfillment-latency
quantiles — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_tokens(tmp_path, rows):
    """rows: list of (source, tokens list)."""
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(
                    [f"{s}-{i:08d}" for i, (s, _t) in enumerate(rows)]
                ),
                "tokens": pa.array(
                    [t for _s, t in rows], pa.list_(pa.int32())
                ),
                "n_tok": pa.array(
                    np.array([len(t) for _s, t in rows], np.int32)
                ),
                "source": pa.array([s for s, _t in rows]),
            }
        ),
        tmp_path / "part-00000.parquet",
    )


def test_token_band_hist_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import token_band_hist

    g = np.random.default_rng(210)
    rows = []
    for i in range(300):
        s = f"s{i % 3}"
        rows.append((s, g.integers(0, 50257, g.integers(1, 30)).tolist()))
    _write_tokens(tmp_path, rows)

    want = collections.Counter()
    for s, toks in rows:
        for t in toks:
            want[(s, t // 4096)] += 1

    got = token_band_hist(str(tmp_path)).to_pandas()
    assert {
        (r.source, int(r.band)): int(r.n_tokens) for r in got.itertuples()
    } == dict(want)


def test_seq_dedup_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import seq_dedup_board

    g = np.random.default_rng(211)
    rows = []
    for i in range(200):
        s = f"s{i % 2}"
        rows.append((s, g.integers(0, 99, g.integers(1, 12)).tolist()))
    # plant exact duplicate sequences within s0, plus the SAME array in
    # both sources (each source's distinct-count is independent)
    dup = [7, 7, 7, 7]
    rows += [("s0", dup), ("s0", dup), ("s0", dup), ("s1", dup)]
    _write_tokens(tmp_path, rows)

    raw = collections.Counter(s for s, _t in rows)
    uniq = collections.defaultdict(set)
    for s, t in rows:
        uniq[s].add(tuple(t))

    got = seq_dedup_board(str(tmp_path)).to_pandas().set_index("source")
    assert len(got) == 2
    total_dups = 0
    for s in raw:
        r = got.loc[s]
        nr, nu = raw[s], len(uniq[s])
        assert (r.n_seqs, r.n_unique, r.n_dup_copies) == (nr, nu, nr - nu)
        assert r.dup_permille == (1000 * (nr - nu)) // nr
        total_dups += nr - nu
    assert total_dups >= 2  # the planted dups registered


def test_fulfillment_latency_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import fulfillment_latency

    g = np.random.default_rng(212)
    n_orders = 120
    okeys = np.arange(1, n_orders + 1, dtype=np.int64)
    pris = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM"])[
        g.integers(0, 3, n_orders)
    ]
    odate = (
        np.datetime64("1996-01-01")
        + g.integers(0, 600, n_orders).astype("timedelta64[D]")
    ).astype("datetime64[us]")
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(okeys),
                "o_custkey": pa.array(np.zeros(n_orders, np.int64)),
                "o_orderstatus": pa.array(["O"] * n_orders),
                "o_totalprice": pa.array(np.zeros(n_orders)),
                "o_orderdate": pa.array(
                    odate.astype(np.int64), pa.int64()
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(pris.tolist()),
            }
        ),
        tmp_path / "orders.parquet",
    )
    lok, lship = [], []
    for k in okeys:
        for _ in range(int(g.integers(1, 5))):
            lok.append(int(k))
            lship.append(
                odate[k - 1]
                + g.integers(0, 120).astype("timedelta64[D]").astype(
                    "timedelta64[us]"
                )
            )
    m = len(lok)
    ship = np.array(lship, dtype="datetime64[us]")
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.array(lok, np.int64)),
                "l_partkey": pa.array(np.zeros(m, np.int64)),
                "l_suppkey": pa.array(np.zeros(m, np.int64)),
                "l_linenumber": pa.array(np.zeros(m, np.int32)),
                "l_quantity": pa.array(np.ones(m)),
                "l_extendedprice": pa.array(np.ones(m)),
                "l_discount": pa.array(np.zeros(m)),
                "l_tax": pa.array(np.zeros(m)),
                "l_returnflag": pa.array(["N"] * m),
                "l_linestatus": pa.array(["O"] * m),
                "l_shipdate": pa.array(
                    ship.astype(np.int64), pa.int64()
                ).cast(pa.timestamp("us")),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    gaps = collections.defaultdict(list)
    for k, sd in zip(lok, ship):
        gaps[pris[k - 1]].append(
            int((sd - odate[k - 1]).astype("timedelta64[D]").astype(int))
        )

    got = fulfillment_latency(str(tmp_path)).to_pandas().set_index(
        "o_orderpriority"
    )
    assert len(got) == len(gaps)
    for p, vals in gaps.items():
        sv = sorted(vals)
        nt = len(sv)
        r = got.loc[p]
        assert r.n_lines == nt
        for q, col in ((500, "p50_days"), (900, "p90_days")):
            thr = (nt * q + 999) // 1000
            assert r[col] == sv[thr - 1], (p, col)
