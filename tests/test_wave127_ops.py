"""Round-4 wave-127 operators: E174 session density-coupling stats
(planted busy-long vs idle-open sessions pin all six sums), T181
template-closure board (planted both-ends-locked forms pin every
column), R108 frequency-ticket coupling board (planted basket-splitters
pin the band sums) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_session_density_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_session_density

    base = np.datetime64("2026-07-01", "us").astype(np.int64)
    hour = 3_600_000_000
    rows = []  # (user, ts_us)
    # user 1: busy-long session (10 events over 1000 s)
    for i in range(10):
        rows.append((1, base + i * 100_000_000))
    # user 2: idle-open session (2 events, 5 h apart — same session at
    # the 6 h gap)
    rows.append((2, base))
    rows.append((2, base + 5 * hour))
    # user 2: second session next day (singleton, duration 0)
    rows.append((2, base + 30 * hour))
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(["t"] * n),
                "ts": pa.array(
                    np.array([r[1] for r in rows], np.int64)
                ).cast(pa.timestamp("us")),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(
                    np.array([r[0] for r in rows], np.int64)
                ),
                "value": pa.array(np.ones(n)),
            }
        ),
        tmp_path / "events.parquet",
    )

    got = events_session_density(str(tmp_path)).to_pandas()
    assert len(got) == 1
    row = got.iloc[0]
    # brute force sessions with 6h gap
    per = collections.defaultdict(list)
    for u, t in rows:
        per[u].append(t)
    sess = []
    for u, ts in per.items():
        ts.sort()
        start = prev = ts[0]
        cnt = 1
        for t in ts[1:]:
            if t - prev > 6 * hour:
                sess.append((cnt, (prev - start) // 1_000_000))
                start = t
                cnt = 0
            cnt += 1
            prev = t
        sess.append((cnt, (prev - start) // 1_000_000))
    assert row["n_sessions"] == len(sess)
    assert row["sum_e"] == sum(e for e, _ in sess)
    assert row["sum_e_sq"] == sum(e * e for e, _ in sess)
    assert row["sum_d"] == sum(d for _, d in sess)
    assert row["sum_d_sq"] == sum(d * d for _, d in sess)
    assert row["sum_e_d"] == sum(e * d for e, d in sess)
    assert row["n_sessions"] == 3
    assert row["sum_e_d"] == 10 * 900 + 2 * 18000


def test_doc_template_closure_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import template_closure

    filler = "x" * 30
    rows = [  # (source, text)
        # forms: same opener AND same tail (both ends locked)
        ("forms", "dear customer re account " + filler + " sincerely the team"),
        ("forms", "dear customer re billing " + filler + " sincerely the team"),
        # opener shared with forms docs? different opener here:
        ("forms", "dear customer re shipping all done differently here"),
        # free text, nothing shared
        ("free", "completely original content one of a kind today"),
        # tail-only pair
        ("free", "first unique start then " + filler + " common ending here"),
        ("free", "second unique start too " + filler + " common ending here"),
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
        template_closure(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    openers = collections.Counter(
        " ".join(t.split(" ")[:3]) for _, t in rows
    )
    tails = collections.Counter(t[-24:] for _, t in rows)
    boths = collections.Counter(
        (" ".join(t.split(" ")[:3]), t[-24:]) for _, t in rows
    )
    want = collections.defaultdict(lambda: [0, 0, 0, 0])
    for s, t in rows:
        op = " ".join(t.split(" ")[:3])
        tl = t[-24:]
        c = want[s]
        c[0] += 1
        c[1] += 1 if openers[op] > 1 else 0
        c[2] += 1 if tails[tl] > 1 else 0
        c[3] += 1 if boths[(op, tl)] > 1 else 0
    assert list(got.index) == sorted(want)
    for s, (nd, no, nt, nb) in want.items():
        row = got.loc[s]
        assert row["n_docs"] == nd
        assert row["opener_shared"] == no
        assert row["tail_shared"] == nt
        assert row["both_shared"] == nb
    assert got.loc["forms", "both_shared"] == 2
    assert got.loc["forms", "opener_shared"] == 3  # all share "dear customer re"
    assert got.loc["free", "tail_shared"] == 2
    assert got.loc["free", "both_shared"] == 0


def test_rel_frequency_ticket_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import frequency_ticket_coupling

    g = np.random.default_rng(867)
    rows = []  # (custkey, price)
    # splitters: custs 1..3 place 12 orders each of ~50 (band 4)
    for ck in (1, 2, 3):
        for _ in range(12):
            rows.append((ck, float(g.uniform(40, 60))))
    # one-shot whales: custs 10..19 place 1 order of ~1000 (band 1)
    for ck in range(10, 20):
        rows.append((ck, float(g.uniform(900, 1100))))
    # duos: custs 30..34 place 2-3 orders (bands 2)
    for ck in range(30, 35):
        for _ in range(int(g.integers(2, 4))):
            rows.append((ck, float(g.uniform(100, 500))))
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "o_custkey": pa.array(
                    np.array([r[0] for r in rows], np.int64)
                ),
                "o_orderstatus": pa.array(["O"] * n),
                "o_totalprice": pa.array(
                    np.array([r[1] for r in rows])
                ),
                "o_orderdate": pa.array(
                    np.full(n, np.datetime64("2026-01-01", "us"))
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * n),
            }
        ),
        tmp_path / "orders.parquet",
    )

    per = collections.defaultdict(list)
    for ck, p in rows:
        per[ck].append(int(np.floor(p)))
    want = collections.defaultdict(lambda: [0, 0, 0, 0])
    for ck, vs in per.items():
        band = len(bin(len(vs))) - 2
        c = want[band]
        c[0] += 1
        c[1] += len(vs)
        c[2] += sum(vs)
        c[3] += sum(v * v for v in vs)

    got = (
        frequency_ticket_coupling(str(tmp_path))
        .to_pandas()
        .set_index("frequency_band")
        .sort_index()
    )
    assert sorted(got.index) == sorted(want)
    for band, (nc, no, sv, svv) in want.items():
        row = got.loc[band]
        assert row["n_customers"] == nc
        assert row["n_orders"] == no
        assert row["sum_v"] == sv
        assert row["sum_v_sq"] == svv
    assert got.loc[4, "n_customers"] == 3   # the splitters (12 -> 4 bits)
    assert got.loc[1, "n_customers"] == 10  # the whales
