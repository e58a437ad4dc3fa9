"""Round-4 wave-67 operators: E114 event-id integrity audit (planted
gaps and duplicate rows), T121 adjacent-decile vocabulary churn
(planted full-churn boundary), R48 orderkey referential-integrity audit
(planted orphans and childless orders) — each vs a scalar brute-force
reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_id_audit_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_id_audit

    # ids 100..1099 with 7 dropped and 3 duplicated across the file
    ids = list(range(100, 1100))
    for d in (150, 151, 400, 666, 777, 901, 1050):
        ids.remove(d)
    ids += [200, 300, 300]  # 3 duplicate rows (one id twice-extra)
    g = np.random.default_rng(520)
    arr = np.array(ids, np.int64)
    g.shuffle(arr)
    pq.write_table(
        pa.table({"event_id": pa.array(arr)}),
        tmp_path / "events.parquet",
    )

    got = events_id_audit(str(tmp_path)).to_pandas().iloc[0]
    assert int(got.n_events) == len(ids)
    assert int(got.min_id) == 100 and int(got.max_id) == 1099
    assert int(got.n_distinct) == 993
    assert int(got.n_missing) == 1000 - 993
    assert int(got.n_dup_rows) == 3


def test_doc_vocab_churn_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import vocab_churn

    g = np.random.default_rng(521)
    n = 300
    texts = []
    for i in range(n):
        if i < 150:  # deciles 0-4 speak vocabulary A
            ws = ["alpha", "beta", "gamma"]
        else:  # deciles 5-9 speak vocabulary B (full churn at 4->5)
            ws = ["delta", "epsilon", "zeta"]
        k = int(g.integers(3, 8))
        texts.append(" ".join(ws[int(g.integers(0, 3))] for _ in range(k)))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(texts),
            }
        ),
        tmp_path / "documents.parquet",
    )

    per = collections.defaultdict(set)
    for i, t in enumerate(texts):
        per[i * 10 // n].update(t.split(" "))

    got = vocab_churn(str(tmp_path)).to_pandas()
    assert list(got.decile) == list(range(9))
    for _, r in got.iterrows():
        d = int(r.decile)
        assert int(r.n_prev) == len(per[d]), d
        assert int(r.n_next) == len(per[d + 1]), d
        assert int(r.n_shared) == len(per[d] & per[d + 1]), d
    assert int(got[got.decile == 4].iloc[0].n_shared) == 0  # full churn


def test_rel_integrity_audit_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import integrity_audit

    g = np.random.default_rng(522)
    okeys = np.arange(1, 301, dtype=np.int64)
    pq.write_table(
        pa.table({"o_orderkey": pa.array(okeys)}),
        tmp_path / "orders.parquet",
    )
    # lines reference orders 1..280 (20 childless), plus 13 orphan lines
    lok = okeys[:280][g.integers(0, 280, 2000)]
    lok = np.append(lok, [9999] * 8 + [8888] * 5)
    pq.write_table(
        pa.table({"l_orderkey": pa.array(lok)}),
        tmp_path / "lineitem.parquet",
    )

    referenced = set(int(k) for k in lok if k <= 300)
    childless = sum(1 for k in okeys if int(k) not in referenced)

    got = integrity_audit(str(tmp_path)).to_pandas().iloc[0]
    assert int(got.n_orders) == 300
    assert int(got.n_lineitems) == 2013
    assert int(got.n_orphan_lines) == 13
    assert int(got.n_childless_orders) == childless
