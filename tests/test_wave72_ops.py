"""Round-4 wave-72 operators: E119 per-user minute-burst quantiles (a
planted 30-events-in-one-minute abuser pins max_burst), T126
ingestion-order length-autocorrelation (a planted constant-length run
pins Pearson to exactly degenerate sums; chunk-boundary pairs must
stitch), R53 order-value reconciliation (planted exact-match, drifted
and childless orders pin every column) — each vs a scalar brute-force
reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_user_burst_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_user_burst

    g = np.random.default_rng(570)
    base = np.datetime64("2026-03-01", "us").astype(np.int64)
    et, ts, uid = [], [], []
    # planted abuser: user 5 fires 30 events inside one minute of "api"
    for j in range(30):
        et.append("api")
        ts.append(base + 7 * 60_000_000 + j * 1_000)
        uid.append(5)
    # bulk
    for _ in range(800):
        et.append(str(g.choice(["api", "web"])))
        ts.append(
            base
            + int(g.integers(0, 120)) * 60_000_000
            + int(g.integers(0, 60_000_000))
        )
        uid.append(int(g.integers(0, 25)))
    n = len(et)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(et),
                "ts": pa.array(np.array(ts, np.int64)).cast(
                    pa.timestamp("us")
                ),
                "value": pa.array(np.ones(n)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.array(uid, np.int64)),
            }
        ),
        tmp_path / "events.parquet",
    )

    cells = collections.Counter()
    for s, t, u in zip(et, ts, uid):
        cells[(s, u, t // 60_000_000)] += 1
    per = collections.defaultdict(list)
    for (s, _, _), c in cells.items():
        per[s].append(c)
    got = events_user_burst(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(per)
    for s, cs in per.items():
        cs = sorted(cs)
        row = got.loc[s]
        assert row["n_cells"] == len(cs)
        assert row["max_burst"] == cs[-1]
        for col, q in (("p50", 500), ("p99", 990)):
            thr = (len(cs) * q + 999) // 1000
            assert row[col] == cs[thr - 1]
    assert got.loc["api", "max_burst"] >= 30


def test_doc_length_autocorr_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import length_autocorr

    g = np.random.default_rng(571)
    texts, srcs = [], []
    # source "tmpl": constant length 6 -> sxy == sxx == syy == 36*n_pairs
    # interleaved with random "wild" docs so chunk stitching crosses
    # sources
    for i in range(400):
        if i % 2:
            texts.append(" ".join(["t"] * 6))
            srcs.append("tmpl")
        else:
            texts.append(
                " ".join(g.choice(list("abcdef"), int(g.integers(2, 40))))
            )
            srcs.append("wild")
    # single-doc source -> dense zero row
    texts.append("lonely doc here")
    srcs.append("solo")
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

    lens = collections.defaultdict(list)
    for t, s in zip(texts, srcs):
        lens[s].append(len(t.split(" ")))
    got = length_autocorr(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(set(srcs))
    for s, lv in lens.items():
        pairs = list(zip(lv[:-1], lv[1:]))
        row = got.loc[s]
        assert row["n_pairs"] == len(pairs)
        assert row["sum_x"] == sum(x for x, _ in pairs)
        assert row["sum_y"] == sum(y for _, y in pairs)
        assert row["sum_xy"] == sum(x * y for x, y in pairs)
        assert row["sum_xx"] == sum(x * x for x, _ in pairs)
        assert row["sum_yy"] == sum(y * y for _, y in pairs)
    assert got.loc["solo"].tolist() == [0, 0, 0, 0, 0, 0]
    assert got.loc["tmpl", "sum_xy"] == 36 * got.loc["tmpl", "n_pairs"]


def test_rel_value_recon_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import value_recon

    g = np.random.default_rng(572)
    n_orders = 200
    ok = np.arange(1, n_orders + 1, dtype=np.int64)
    status = np.array(["F" if i % 3 else "O" for i in range(n_orders)])
    # lines: orders 1..180 get 1-4 lines; 181..200 are childless
    lk, ep, di, tx = [], [], [], []
    for k in ok[:180]:
        for _ in range(1 + int(g.integers(0, 4))):
            lk.append(k)
            ep.append(round(float(g.uniform(100, 5000)), 2))
            di.append(round(float(g.uniform(0, 0.1)), 2))
            tx.append(round(float(g.uniform(0, 0.08)), 2))
    lk = np.array(lk, np.int64)
    charge = np.floor(
        np.array(ep) * (1 - np.array(di)) * (1 + np.array(tx))
    ).astype(np.int64)
    per_order = collections.Counter()
    for k, c in zip(lk, charge):
        per_order[int(k)] += int(c)
    # headers: orders 1..60 reconcile exactly; the rest drift
    tp = np.zeros(n_orders, np.float64)
    for i, k in enumerate(ok):
        base = per_order.get(int(k), 0)
        tp[i] = (
            base + 0.25
            if i < 60
            else base + float(g.integers(1, 2000)) + 0.5
        )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(ok),
                "o_custkey": pa.array(np.ones(n_orders, np.int64)),
                "o_orderstatus": pa.array(status),
                "o_totalprice": pa.array(tp),
                "o_orderdate": pa.array(
                    np.full(n_orders, 1_700_000_000_000_000, np.int64)
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n_orders),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(lk),
                "l_extendedprice": pa.array(np.array(ep)),
                "l_discount": pa.array(np.array(di)),
                "l_tax": pa.array(np.array(tx)),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    want = collections.defaultdict(list)
    childless = collections.Counter()
    for i, k in enumerate(ok):
        s = per_order.get(int(k), 0)
        tpi = int(np.floor(tp[i]))
        ad = abs(tpi - s)
        pm = 1000 * ad // max(tpi, 1)
        want[status[i]].append((ad, pm))
        if int(k) not in per_order:
            childless[status[i]] += 1
    got = value_recon(str(tmp_path)).to_pandas()
    got = got.set_index("status").sort_index()
    assert list(got.index) == sorted(want)
    for st, rows in want.items():
        pms = sorted(pm for _, pm in rows)
        row = got.loc[st]
        assert row["n_orders"] == len(rows)
        assert row["n_childless"] == childless[st]
        assert row["sum_abs_delta"] == sum(ad for ad, _ in rows)
        for col, q in (("p50_permille", 500), ("p90_permille", 900)):
            thr = (len(pms) * q + 999) // 1000
            assert row[col] == pms[thr - 1]
    # the 60 reconciling orders have ad == 0 (floor eats the 0.25)
    assert int(got["sum_abs_delta"].sum()) > 0
