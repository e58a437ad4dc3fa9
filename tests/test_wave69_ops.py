"""Round-4 wave-69 operators: E116 grid run-length compressibility
board (planted constant-rate source pins one long run; gap-zero runs
counted), T123 context-length chunking-overhead curve (planted exact
multiples pin zero waste), R50 customer revenue-concentration Pareto
(planted one whale pins p50 to 1) — each vs a scalar brute-force
reference."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_grid_rle_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_grid_rle

    g = np.random.default_rng(540)
    base = np.datetime64("2026-03-01", "us").astype(np.int64)
    et, ts = [], []
    # source "steady": exactly 2 events/minute for 90 minutes -> runs: 1
    for m in range(90):
        for j in range(2):
            et.append("steady")
            ts.append(base + m * 60_000_000 + j * 1000)
    # source "gappy": 1 event at minute 0, silence 0< m <50, 1 at 50 ->
    # runs: [1], [0]x49, [1] -> 3 runs, longest 49
    et += ["gappy", "gappy"]
    ts += [base, base + 50 * 60_000_000]
    # random source for bulk coverage
    for _ in range(800):
        et.append("rand")
        ts.append(base + int(g.integers(0, 300)) * 60_000_000
                  + int(g.integers(0, 60_000_000)))
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(et),
                "ts": pa.array(np.array(ts, np.int64)).cast(
                    pa.timestamp("us")
                ),
                "value": pa.array(np.ones(len(et))),
                "event_id": pa.array(np.arange(len(et), dtype=np.int64)),
                "user_id": pa.array(np.ones(len(et), np.int64)),
            }
        ),
        tmp_path / "events.parquet",
    )

    per = collections.defaultdict(collections.Counter)
    for s, t in zip(et, ts):
        per[s][int(t) // 60_000_000] += 1
    want = {}
    for s, cnt in per.items():
        lo, hi = min(cnt), max(cnt)
        series = [cnt.get(m, 0) for m in range(lo, hi + 1)]
        runs = []
        for v in series:
            if runs and runs[-1][0] == v:
                runs[-1][1] += 1
            else:
                runs.append([v, 1])
        want[s] = (len(series), len(runs), max(r[1] for r in runs))

    got = events_grid_rle(str(tmp_path)).to_pandas()
    assert len(got) == len(want)
    for _, r in got.iterrows():
        nm, nr, lg = want[r.source]
        assert int(r.n_minutes) == nm, r.source
        assert int(r.n_runs) == nr, r.source
        assert int(r.longest_run) == lg, r.source
    assert int(got[got.source == "steady"].iloc[0].n_runs) == 1
    gp = got[got.source == "gappy"].iloc[0]
    assert int(gp.n_runs) == 3 and int(gp.longest_run) == 49


def test_doc_chunking_curve_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import chunking_curve

    g = np.random.default_rng(541)
    texts = []
    for _ in range(300):
        k = int(g.integers(1, 300))
        texts.append(" ".join("w" for _ in range(k)))
    texts.append(" ".join("x" for _ in range(256)))  # exact multiple of 128
    pq.write_table(
        pa.table({"text": pa.array(texts)}),
        tmp_path / "documents.parquet",
    )

    toks = [len(t.split(" ")) for t in texts]
    got = chunking_curve(str(tmp_path)).to_pandas().sort_values("seq_len")
    assert list(got.seq_len) == [128, 512, 2048]
    for _, r in got.iterrows():
        L = int(r.seq_len)
        ch = sum(-(-t // L) for t in toks)
        wa = sum((-(-t // L)) * L - t for t in toks)
        assert int(r.n_chunks) == ch, L
        assert int(r.pad_waste) == wa, L
        assert int(r.n_tokens) == sum(toks)


def test_rel_revenue_pareto_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import revenue_pareto

    g = np.random.default_rng(542)
    n = 2000
    ck = g.integers(1, 100, n).astype(np.int64)
    tot = g.uniform(100, 2000, n)
    # planted whale: customer 999 alone carries well over half the book
    ck = np.append(ck, [999] * 5)
    tot = np.append(tot, [1_000_000.0] * 5)
    pq.write_table(
        pa.table(
            {
                "o_custkey": pa.array(ck),
                "o_totalprice": pa.array(tot),
            }
        ),
        tmp_path / "orders.parquet",
    )

    rev = collections.Counter()
    for k, v in zip(ck, tot):
        rev[int(k)] += math.floor(v)
    vals = sorted(rev.values(), reverse=True)
    total = sum(vals)

    def pareto(p):
        need = -(-total * p // 1000)
        cum = 0
        for i, v in enumerate(vals, 1):
            cum += v
            if cum >= need:
                return i
        return len(vals)

    got = revenue_pareto(str(tmp_path)).to_pandas().iloc[0]
    assert int(got.total_customers) == len(rev)
    assert int(got.total_revenue) == total
    assert int(got.customers_p50) == pareto(500) == 1  # the whale
    assert int(got.customers_p80) == pareto(800)
    assert int(got.customers_p90) == pareto(900)
    assert int(got.customers_p99) == pareto(990)
