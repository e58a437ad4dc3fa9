"""Round-4 wave-24: the JSONL epoch source (the reference's native JSON
payload contract as a first-class source — byte-identical ingest vs the
parquet path on the same logical rows) and R11 local-supplier volume
(TPC-H Q5's cross-side nation-equality predicate over three chained
co-partitioned hops) vs a scalar brute force."""

from __future__ import annotations

import collections
import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

T0 = np.datetime64("1995-01-01", "us").astype(np.int64)


def test_jsonl_source_matches_parquet(ray_session, tmp_path):
    from mq_to_db_ray.gen import write_f1_parquet
    from mq_to_db_ray.sources.jsonl import read_jsonl

    pq_dir = tmp_path / "pq"
    write_f1_parquet(str(pq_dir), 2_000, shards=2)
    import ray.data as rd

    rows = rd.read_parquet(str(pq_dir)).take_all()
    jl = tmp_path / "epoch.jsonl"
    with open(jl, "w") as f:
        for r in rows:
            f.write(
                json.dumps(
                    {
                        "doc_id": r["doc_id"],
                        "tokens": [int(t) for t in r["tokens"]],
                        "n_tok": int(r["n_tok"]),
                        "source": r["source"],
                    }
                )
                + "\n"
            )

    ds = read_jsonl(str(jl))
    tbl = pa.Table.from_pylist(ds.take_all())
    assert set(tbl.column_names) == {"doc_id", "tokens", "n_tok", "source"}
    got = sorted(
        (r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"])
        for r in ds.take_all()
    )
    want = sorted(
        (r["doc_id"], tuple(int(t) for t in r["tokens"]), int(r["n_tok"]), r["source"])
        for r in rows
    )
    assert got == want  # byte-identical token arrays survive the format


def test_jsonl_source_feeds_rollup(ray_session, tmp_path):
    """The downstream chain is format-agnostic: validate -> rollup over
    the JSONL epoch equals the same chain over the parquet epoch."""
    from mq_to_db_ray.gen import write_f1_parquet
    from mq_to_db_ray.sources.jsonl import read_jsonl
    from mq_to_db_ray.stages.rollup import rollup
    from mq_to_db_ray.stages.validate import ValidateAssign

    import ray.data as rd

    pq_dir = tmp_path / "pq"
    write_f1_parquet(str(pq_dir), 2_000, shards=2)
    rows = rd.read_parquet(str(pq_dir)).take_all()
    jl = tmp_path / "epoch.jsonl"
    with open(jl, "w") as f:
        for r in rows:
            f.write(
                json.dumps(
                    {
                        "doc_id": r["doc_id"],
                        "tokens": [int(t) for t in r["tokens"]],
                        "n_tok": int(r["n_tok"]),
                        "source": r["source"],
                    }
                )
                + "\n"
            )

    def rolled(ds):
        v = ds.map_batches(ValidateAssign, batch_format="pyarrow", concurrency=2)
        return (
            rollup(v, "1m")
            .to_pandas()
            .sort_values(["source", "bucket_ts"])
            .reset_index(drop=True)
        )

    a = rolled(read_jsonl(str(jl)))
    b = rolled(rd.read_parquet(str(pq_dir)))
    assert a.equals(b)


def test_local_supplier_volume_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import local_supplier_volume

    g = np.random.default_rng(125)
    n_cust, n_supp, n_orders, n_nat = 40, 15, 200, 5
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(np.arange(n_nat, dtype=np.int64)),
                "n_name": pa.array([f"NATION{i}" for i in range(n_nat)]),
                "n_regionkey": pa.array(np.zeros(n_nat, np.int64)),
            }
        ),
        tmp_path / "nation.parquet",
    )
    custkeys = np.arange(1, n_cust + 1, dtype=np.int64)
    cnat = g.integers(0, n_nat, n_cust).astype(np.int64)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(custkeys),
                "c_name": pa.array([f"c{k}" for k in custkeys]),
                "c_nationkey": pa.array(cnat),
                "c_acctbal": pa.array(np.zeros(n_cust)),
                "c_mktsegment": pa.array(["M"] * n_cust),
            }
        ),
        tmp_path / "customer.parquet",
    )
    suppkeys = np.arange(1, n_supp + 1, dtype=np.int64)
    snat = g.integers(0, n_nat, n_supp).astype(np.int64)
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(suppkeys),
                "s_name": pa.array([f"s{k}" for k in suppkeys]),
                "s_nationkey": pa.array(snat),
                "s_acctbal": pa.array(np.zeros(n_supp)),
            }
        ),
        tmp_path / "supplier.parquet",
    )
    okeys = np.arange(1, n_orders + 1, dtype=np.int64)
    ocust = custkeys[g.integers(0, n_cust, n_orders)].astype(np.int64)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(okeys),
                "o_custkey": pa.array(ocust),
                "o_orderstatus": pa.array(["O"] * n_orders),
                "o_totalprice": pa.array(np.zeros(n_orders)),
                "o_orderdate": pa.array(
                    np.full(n_orders, T0, np.int64), pa.int64()
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n_orders),
            }
        ),
        tmp_path / "orders.parquet",
    )
    lok, lsup, lprice, ldisc = [], [], [], []
    for k in okeys[:-15]:
        for _ in range(int(g.integers(1, 5))):
            lok.append(int(k))
            lsup.append(int(suppkeys[g.integers(0, n_supp)]))
            lprice.append(round(float(g.uniform(10, 2000)), 2))
            ldisc.append(round(float(g.uniform(0, 0.1)), 2))
    m = len(lok)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.array(lok, np.int64)),
                "l_partkey": pa.array(np.zeros(m, np.int64)),
                "l_suppkey": pa.array(np.array(lsup, np.int64)),
                "l_linenumber": pa.array(np.zeros(m, np.int32)),
                "l_quantity": pa.array(np.ones(m)),
                "l_extendedprice": pa.array(np.array(lprice)),
                "l_discount": pa.array(np.array(ldisc)),
                "l_tax": pa.array(np.zeros(m)),
                "l_returnflag": pa.array(["N"] * m),
                "l_linestatus": pa.array(["O"] * m),
                "l_shipdate": pa.array(
                    np.full(m, T0, np.int64), pa.int64()
                ).cast(pa.timestamp("us")),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    o2n = {int(k): int(cnat[int(c) - 1]) for k, c in zip(okeys, ocust)}
    s2n = {int(k): int(n) for k, n in zip(suppkeys, snat)}
    want = collections.defaultdict(lambda: [0, 0])
    for k, s, p, dc in zip(lok, lsup, lprice, ldisc):
        if o2n[k] == s2n[s]:
            w = want[f"NATION{o2n[k]}"]
            w[0] += 1
            w[1] += int(np.floor(p * (1.0 - dc)))
    assert want  # fixture must produce local matches

    got = local_supplier_volume(str(tmp_path)).to_pandas().set_index("n_name")
    assert len(got) == len(want)
    for nm, (nl, rv) in want.items():
        assert (got.loc[nm].n_lines, got.loc[nm].revenue_floor) == (nl, rv)
