"""Round-4 wave-21 operators: R10 brand supplier diversity (join →
distinct-cardinality in two narrowing exchanges), E77 top-k minutes by
distinct users (distinct-count → grouped top-k composition), T68
stopword-permille quantiles — each vs a scalar brute-force reference.
Fixtures include supplier reuse across parts/brands, user-count ties at
the top-k boundary, and stopword-free docs (permille 0)."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MIN_US = 60_000_000
T0 = np.datetime64("1995-01-01", "us").astype(np.int64)


def test_brand_supplier_diversity_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import brand_supplier_diversity

    g = np.random.default_rng(110)
    n_parts, n_supp, m = 60, 12, 500
    partkeys = np.sort(g.choice(np.arange(1, 200), n_parts, replace=False))
    brands = np.array([f"B{i % 5}" for i in range(n_parts)])
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(partkeys.astype(np.int64)),
                "p_name": pa.array([f"p{k}" for k in partkeys]),
                "p_brand": pa.array(brands.tolist()),
                "p_type": pa.array(["T"] * n_parts),
                "p_size": pa.array(np.ones(n_parts, np.int64)),
                "p_retailprice": pa.array(np.ones(n_parts)),
            }
        ),
        tmp_path / "part.parquet",
    )
    lpart = partkeys[g.integers(0, n_parts, m)].astype(np.int64)
    lpart[:5] = 999  # partkeys absent from part -> dropped
    lsupp = g.integers(1, n_supp + 1, m).astype(np.int64)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(m, dtype=np.int64)),
                "l_partkey": pa.array(lpart),
                "l_suppkey": pa.array(lsupp),
                "l_linenumber": pa.array(np.zeros(m, np.int32)),
                "l_quantity": pa.array(np.ones(m)),
                "l_extendedprice": pa.array(np.ones(m)),
                "l_discount": pa.array(np.zeros(m)),
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

    p2b = dict(zip(partkeys.tolist(), brands.tolist()))
    supp_sets = collections.defaultdict(set)
    n_lines = collections.Counter()
    for pk, sk in zip(lpart, lsupp):
        b = p2b.get(int(pk))
        if b is not None:
            supp_sets[b].add(int(sk))
            n_lines[b] += 1

    got = brand_supplier_diversity(str(tmp_path)).to_pandas().set_index("p_brand")
    assert len(got) == len(supp_sets)
    for b, s in supp_sets.items():
        assert (got.loc[b].n_suppliers, got.loc[b].n_lines) == (
            len(s),
            n_lines[b],
        )


def test_top_user_minutes_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import EVENTS_T0_US, events_top_user_minutes

    g = np.random.default_rng(111)
    n = 900
    types = np.array(["a", "b"])[g.integers(0, 2, n)]
    # few minutes -> dense cells and count ties at the boundary
    ts = EVENTS_T0_US + g.integers(0, 25, n).astype(np.int64) * MIN_US
    users = (g.zipf(1.5, n) % 25).astype(np.int64)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(types.tolist()),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "value": pa.array(np.ones(n)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(users),
            }
        ),
        tmp_path / "events.parquet",
    )

    cells = collections.defaultdict(set)
    for s, t, u in zip(types, ts, users):
        cells[(s, int(t) // MIN_US)].add(int(u))
    want = {}
    for s in set(types):
        rows = sorted(
            ((len(us), m) for (ss, m), us in cells.items() if ss == s),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        want[s] = rows

    got = events_top_user_minutes(str(tmp_path)).to_pandas()
    for s, rows in want.items():
        sub = got[got.source == s].sort_values("rank")
        assert len(sub) == len(rows)
        for (nu, m), r in zip(rows, sub.itertuples()):
            assert (r.n_users, int(r.minute_ts.value // 1000) // MIN_US) == (
                nu,
                m,
            )


def test_quality_quantiles_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.functions.textstats import STOPWORDS
    from mq_to_db_ray.pipelines.training_data import quality_quantiles

    g = np.random.default_rng(112)
    vocab = list(STOPWORDS) + [f"w{i}" for i in range(10)]
    texts = [
        " ".join(g.choice(vocab, size=g.integers(1, 20))) for _ in range(150)
    ]
    texts += ["w0 w1 w2", "zzz"]  # stopword-free -> permille 0
    srcs = [f"s{i % 3}" for i in range(len(texts))]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(srcs),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    sw = set(STOPWORDS)
    per_src = collections.defaultdict(list)
    for t, s in zip(texts, srcs):
        ws = t.lower().split(" ")
        ns = sum(1 for w in ws if w in sw)
        per_src[s].append(int(np.floor(1000.0 * ns / max(len(ws), 1))))

    got = quality_quantiles(str(tmp_path)).to_pandas().set_index("source")
    assert len(got) == len(per_src)
    for s, vals in per_src.items():
        sv = sorted(vals)
        n = len(sv)
        r = got.loc[s]
        assert r.n_docs == n
        for q, col in ((500, "p50"), (900, "p90"), (990, "p99")):
            thr = (n * q + 999) // 1000
            assert r[col] == sv[thr - 1], (s, col)
