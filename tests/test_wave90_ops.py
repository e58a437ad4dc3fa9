"""Round-4 wave-90 operators: E137 cron-signature audit (planted
:07-pinned producers pin the modal minute), T144/F tape chunk-waste
curve (planted fixed-length sequences pin the padding), R71 customer
active-months histogram (planted k-month customers pin the bands) —
each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MIN = 60_000_000
HOUR = 60 * MIN
DAY = 86_400_000_000


def test_events_cron_signature_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_cron_signature

    g = np.random.default_rng(750)
    base = np.datetime64("2026-03-02", "us").astype(np.int64)
    et, ts = [], []
    # "cron": always fires at minute :07 of the hour
    for h in range(120):
        et.append("cron")
        ts.append(base + h * HOUR + 7 * MIN + int(g.integers(0, MIN)))
    # "organic": uniform minutes
    for _ in range(800):
        et.append("organic")
        ts.append(base + int(g.integers(0, 200 * HOUR)))
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
                "user_id": pa.array(np.ones(n, np.int64)),
            }
        ),
        tmp_path / "events.parquet",
    )

    cnt = collections.Counter(
        (s, (t // MIN) % 60) for s, t in zip(et, ts)
    )
    want = {}
    for s in set(et):
        per = {m: cnt.get((s, m), 0) for m in range(60)}
        tot = sum(per.values())
        best = min(per, key=lambda m: (-per[m], m))
        want[s] = (tot, best, 1000 * per[best] // tot)

    got = events_cron_signature(str(tmp_path)).to_pandas()
    got = got.set_index("source").sort_index()
    assert list(got.index) == sorted(want)
    for s, (tot, best, share) in want.items():
        row = got.loc[s]
        assert row["n_events"] == tot
        assert row["top_minute"] == best
        assert row["top_permille"] == share
    assert got.loc["cron", "top_minute"] == 7
    assert got.loc["cron", "top_permille"] == 1000
    assert got.loc["organic", "top_permille"] < 100


def test_f1_chunk_waste_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import tape_chunk_waste

    g = np.random.default_rng(751)
    rows = []
    # "aligned": every sequence exactly 256 tokens -> zero waste at 256
    for _ in range(10):
        rows.append(("aligned", [int(x) for x in g.integers(0, 99, 256)]))
    # "short": length 10 -> waste 246 at 256
    for _ in range(20):
        rows.append(("short", [int(x) for x in g.integers(0, 99, 10)]))
    for _ in range(60):
        rows.append(
            ("rand", [int(x) for x in g.integers(0, 99, g.integers(1, 600))])
        )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(
                    [f"s00-{i:08d}" for i in range(len(rows))]
                ),
                "tokens": pa.array(
                    [r[1] for r in rows], pa.list_(pa.int32())
                ),
                "n_tok": pa.array(
                    [len(r[1]) for r in rows], pa.int64()
                ),
                "source": pa.array([r[0] for r in rows]),
            }
        ),
        tmp_path / "part-000.parquet",
    )

    sizes = (256, 512, 1024, 2048)
    want = collections.defaultdict(lambda: [0, 0, 0])
    for s, t in rows:
        ln = len(t)
        for c in sizes:
            ch = (ln + c - 1) // c
            w = want[(s, c)]
            w[0] += ln
            w[1] += ch
            w[2] += ch * c - ln

    got = tape_chunk_waste(str(tmp_path)).to_pandas()
    got = got.set_index(["source", "chunk_len"]).sort_index()
    assert list(got.index) == sorted(want)
    for k, w in want.items():
        row = got.loc[k]
        assert row["n_tokens"] == w[0]
        assert row["n_chunks"] == w[1]
        assert row["pad_waste"] == w[2]
        assert row["waste_permille"] == 1000 * w[2] // (w[0] + w[2])
    assert got.loc[("aligned", 256), "pad_waste"] == 0
    assert got.loc[("short", 256), "pad_waste"] == 20 * 246


def test_rel_customer_months_hist_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import customer_months_hist

    g = np.random.default_rng(752)
    base = np.datetime64("2025-01-01", "us").astype(np.int64)
    n_ord = 800
    ck = g.integers(0, 150, n_ord)
    odate = base + g.integers(0, 360, n_ord) * DAY
    tp = np.round(g.uniform(1000, 90_000, n_ord), 2)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
                "o_custkey": pa.array(ck, pa.int64()),
                "o_orderstatus": pa.array(["O"] * n_ord),
                "o_totalprice": pa.array(tp),
                "o_orderdate": pa.array(odate).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n_ord),
            }
        ),
        tmp_path / "orders.parquet",
    )

    per_cust = collections.defaultdict(lambda: [set(), 0, 0])
    for o in range(n_ord):
        mo = (
            np.datetime64(int(odate[o]), "us")
            .astype("datetime64[M]")
            .astype(np.int64)
        )
        w = per_cust[int(ck[o])]
        w[0].add(int(mo))
        w[1] += 1
        w[2] += int(np.floor(tp[o]))
    want = collections.defaultdict(lambda: [0, 0, 0])
    for months, n, rev in per_cust.values():
        w = want[len(months)]
        w[0] += 1
        w[1] += n
        w[2] += rev

    got = customer_months_hist(str(tmp_path)).to_pandas()
    got = got.set_index("n_months").sort_index()
    assert list(got.index) == sorted(want)
    for k, w in want.items():
        row = got.loc[k]
        assert row["n_customers"] == w[0]
        assert row["n_orders"] == w[1]
        assert row["revenue"] == w[2]
