"""Round-4 wave-37 operators: E93 time-of-day quantiles, T83 near-dup
severity spectrum (the fixture plants near-dup pairs across several
Jaccard bands INCLUDING exact shingle-set matches at band 10; the dense
board must emit empty bands as zeros), R23 forgone-discount revenue
(Q6's all-fact read-predicate aggregate) — each vs a scalar brute-force
reference."""

from __future__ import annotations

import collections
import itertools
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MIN_US = 60_000_000
DAY_US = 86_400_000_000


def test_tod_quantiles_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import EVENTS_T0_US, events_tod_quantiles

    g = np.random.default_rng(240)
    n = 1100
    types = np.array(["a", "b"])[g.integers(0, 2, n)]
    day = g.integers(0, 10, n).astype(np.int64)
    mod = g.integers(0, 1440, n).astype(np.int64)
    ts = EVENTS_T0_US + day * DAY_US + mod * MIN_US + g.integers(0, 60, n) * 1_000_000
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(types.tolist()),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "value": pa.array(np.ones(n)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.zeros(n, np.int64)),
            }
        ),
        tmp_path / "events.parquet",
    )

    per = collections.defaultdict(list)
    t0_mod = (EVENTS_T0_US % DAY_US) // MIN_US
    for t, m in zip(types, mod):
        per[t].append(int((t0_mod + m) % 1440))

    got = events_tod_quantiles(str(tmp_path)).to_pandas().set_index("source")
    assert len(got) == len(per)
    for t, vals in per.items():
        sv = sorted(vals)
        nt = len(sv)
        r = got.loc[t]
        assert r.n_events == nt
        for q, col in ((500, "p50_minute"), (900, "p90_minute")):
            thr = (nt * q + 999) // 1000
            assert r[col] == sv[thr - 1], (t, col)


def test_jaccard_spectrum_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import jaccard_spectrum

    g = np.random.default_rng(241)
    vocab = [f"w{i}" for i in range(200)]
    texts = [
        " ".join(g.choice(vocab, size=14, replace=False)) for _ in range(40)
    ]
    # exact-dup pair (band 10) and graded near-dups
    texts.append(texts[0])
    base = texts[1].split(" ")
    texts.append(" ".join(base[:11] + ["zzz1", "zzz2", "zzz3"]))  # high band
    texts.append(" ".join(base[:8] + ["qq1", "qq2", "qq3", "qq4", "qq5", "qq6"]))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["s0"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    def shingles(t):
        ws = t.split(" ")
        if len(ws) < 3:
            return {t}
        return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

    sh = [shingles(t) for t in texts]
    want = collections.Counter()
    for i, j in itertools.combinations(range(len(texts)), 2):
        inter = len(sh[i] & sh[j])
        if not inter:
            continue
        jp = int(math.floor(1000.0 * inter / (len(sh[i]) + len(sh[j]) - inter)))
        if jp >= 200:
            want[jp // 100] += 1
    assert 10 in want and len(want) >= 3  # exact + graded bands present

    got = jaccard_spectrum(str(tmp_path)).to_pandas().set_index("band")
    assert len(got) == 9  # dense 2..10
    for b in range(2, 11):
        assert got.loc[b].n_pairs == want.get(b, 0), b


def test_discount_revenue_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import discount_revenue

    g = np.random.default_rng(242)
    n = 800
    ext = g.uniform(10, 5000, n)
    dis = g.integers(0, 11, n) / 100.0
    qty = g.integers(1, 50, n).astype(np.float64)
    ship = (
        np.datetime64("1995-06-01")
        + g.integers(0, 900, n).astype("timedelta64[D]")
    ).astype("datetime64[us]")
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "l_partkey": pa.array(np.zeros(n, np.int64)),
                "l_suppkey": pa.array(np.zeros(n, np.int64)),
                "l_linenumber": pa.array(np.zeros(n, np.int32)),
                "l_quantity": pa.array(qty),
                "l_extendedprice": pa.array(ext),
                "l_discount": pa.array(dis),
                "l_tax": pa.array(np.zeros(n)),
                "l_returnflag": pa.array(["N"] * n),
                "l_linestatus": pa.array(["O"] * n),
                "l_shipdate": pa.array(
                    ship.astype(np.int64), pa.int64()
                ).cast(pa.timestamp("us")),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    lo = np.datetime64("1996-01-01", "us")
    hi = np.datetime64("1997-01-01", "us")
    nl = rev = 0
    for e, d, q, s in zip(ext, dis, qty, ship):
        if lo <= s < hi and 0.05 <= d <= 0.07 and q < 24:
            nl += 1
            rev += int(math.floor(e * d))
    assert nl > 10

    got = discount_revenue(str(tmp_path)).to_pandas()
    assert len(got) == 1
    assert (got.iloc[0].n_lines, got.iloc[0].discount_rev_floor) == (nl, rev)
