"""Round-4 wave-47 operators: T95 shingle document-frequency spectrum
(planted shared shingles so several df levels exist), T96 quantized-grid
occupancy over embeddings, R33 supplier-nation x order-year profit
matrix — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_shingle_df_spectrum_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import shingle_df_spectrum

    # 3-word shingles; plant overlap so df in {1, 2, 3} all occur.
    texts = [
        "alpha beta gamma delta",          # shingles: abg, bgd
        "alpha beta gamma epsilon",        # shares "alpha beta gamma"
        "zeta alpha beta gamma eta",       # shares it again -> df=3
        "one two three four five",         # all unique
        "one two three four five",         # exact dup doc -> df=2 each
        "short doc",                       # < k words -> whole-doc shingle
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["s"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    df = collections.Counter()
    for t in texts:
        w = t.split(" ")
        sh = {
            " ".join(w[i : i + 3])
            for i in range(max(len(w) - 2, 1))
        }
        for s in sh:
            df[s] += 1
    want = collections.Counter(df.values())

    got = shingle_df_spectrum(str(tmp_path)).to_pandas().set_index(
        "doc_freq"
    )
    assert len(got) == len(want)
    for dfv, n in want.items():
        assert int(got.loc[dfv].n_shingles) == n, dfv
    assert 3 in want and want[3] >= 1  # the planted df=3 level is real


def test_embedding_grid_occupancy_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import embedding_grid_occupancy

    g = np.random.default_rng(333)
    n, d = 400, 8
    vecs = g.uniform(-1.2, 1.2, size=(n, d)).astype(np.float32)
    # plant a hot cell: 37 vectors share the first-4-dim quantization
    vecs[:37, :4] = np.float32(0.3)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
                "label": pa.array(np.zeros(n, np.int32)),
            }
        ),
        tmp_path / "embeddings.parquet",
    )

    cells = collections.Counter(
        tuple(int(math.floor(4.0 * float(x))) for x in row[:4])
        for row in vecs
    )
    got = embedding_grid_occupancy(str(tmp_path)).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert int(r.n_vecs) == n
    assert int(r.n_cells) == len(cells)
    assert int(r.max_cell_load) == max(cells.values())
    assert int(r.max_cell_load) >= 37


def test_nation_year_profit_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import nation_year_profit

    g = np.random.default_rng(334)
    n_supp, n_ord, n_line, n_nat = 20, 150, 900, 4
    snat = g.integers(0, n_nat, n_supp).astype(np.int64)
    lsupp = g.integers(0, n_supp, n_line).astype(np.int64)
    lord = g.integers(0, n_ord, n_line).astype(np.int64)
    ext = g.uniform(100, 5000, n_line)
    dis = g.integers(0, 11, n_line) / 100.0

    base = np.datetime64("1994-01-01", "us").astype(np.int64)
    day_us = 86_400_000_000
    odate = base + g.integers(0, 5 * 365, n_ord).astype(np.int64) * day_us

    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
                "s_name": pa.array([f"s{i}" for i in range(n_supp)]),
                "s_nationkey": pa.array(snat),
                "s_acctbal": pa.array(np.zeros(n_supp)),
            }
        ),
        tmp_path / "supplier.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(np.arange(n_nat, dtype=np.int64)),
                "n_name": pa.array([f"NAT{i}" for i in range(n_nat)]),
                "n_regionkey": pa.array(np.zeros(n_nat, np.int64)),
            }
        ),
        tmp_path / "nation.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
                "o_custkey": pa.array(np.zeros(n_ord, np.int64)),
                "o_orderstatus": pa.array(["O"] * n_ord),
                "o_totalprice": pa.array(np.zeros(n_ord)),
                "o_orderdate": pa.array(odate, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * n_ord),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(lord),
                "l_partkey": pa.array(np.zeros(n_line, np.int64)),
                "l_suppkey": pa.array(lsupp),
                "l_linenumber": pa.array(np.ones(n_line, np.int32)),
                "l_quantity": pa.array(np.ones(n_line)),
                "l_extendedprice": pa.array(ext),
                "l_discount": pa.array(dis),
                "l_tax": pa.array(np.zeros(n_line)),
                "l_returnflag": pa.array(["N"] * n_line),
                "l_linestatus": pa.array(["O"] * n_line),
                "l_shipdate": pa.array(
                    np.full(n_line, 800000000000000), pa.int64()
                ).cast(pa.timestamp("us")),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    oyear = odate.astype("datetime64[us]").astype("datetime64[Y]").astype(
        np.int64
    ) + 1970
    want = collections.defaultdict(lambda: [0, 0])
    for ok, sk, e, d in zip(lord, lsupp, ext, dis):
        w = want[(f"NAT{snat[sk]}", int(oyear[ok]))]
        w[0] += 1
        w[1] += int(math.floor(e * (1.0 - d)))

    got = nation_year_profit(str(tmp_path)).to_pandas()
    assert len(got) == len(want)
    for _, r in got.iterrows():
        nl, rev = want[(r.n_name, int(r.o_year))]
        assert (int(r.n_lines), int(r.revenue_floor)) == (nl, rev), (
            r.n_name,
            r.o_year,
        )
