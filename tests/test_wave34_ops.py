"""Round-4 wave-34 operators: E90 daily churn decomposition (flow
identities dau = new + retained and yesterday's dau = retained +
churned(today) must hold), T81 language-ID confusion matrix (the fixture
plants texts that MISCLASSIFY), R21 repeat-order gap quantiles — each vs
a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY_US = 86_400_000_000


def test_daily_churn_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import EVENTS_T0_US, events_daily_churn

    g = np.random.default_rng(220)
    n = 1800
    users = (g.zipf(1.5, n) % 40).astype(np.int64)
    day = g.integers(0, 25, n).astype(np.int64)
    ts = EVENTS_T0_US + day * DAY_US + g.integers(0, 86_400, n) * 1_000_000
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(["a"] * n),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "value": pa.array(np.ones(n)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(users),
            }
        ),
        tmp_path / "events.parquet",
    )

    active = collections.defaultdict(set)  # day -> users
    for u, d in zip(users, day):
        active[int(d)].add(int(u))
    days = sorted(active)
    want = {}
    for d in days:
        prev = active.get(d - 1, set())
        cur = active[d]
        want[d] = (
            len(cur),
            len(cur - prev),
            len(cur & prev),
            len(prev - cur),
        )

    got = events_daily_churn(str(tmp_path)).to_pandas()
    assert len(got) == len(days)
    for r in got.itertuples():
        d = int(r.day_id - EVENTS_T0_US // DAY_US)
        dau, nn, ret, chn = want[d]
        assert (r.dau, r.n_new, r.n_retained, r.n_churned) == (
            dau, nn, ret, chn,
        ), d
        assert r.dau == r.n_new + r.n_retained  # flow identity
    # at this density every adjacent pair churns somebody
    assert got.n_churned.sum() > 0


def test_lang_confusion_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.functions.textstats import lang_id as scalar_lang_id
    from mq_to_db_ray.pipelines.training_data import lang_confusion

    g = np.random.default_rng(221)
    # mixed-language word soup so predictions disagree with labels
    pool = [
        "the", "and", "der", "die", "le", "la", "les", "of", "und",
        "est", "data", "rows", "xyz",
    ]
    texts, labels = [], []
    for i in range(300):
        texts.append(" ".join(g.choice(pool, size=g.integers(1, 15))))
        labels.append(["en", "de", "fr", "zh"][i % 4])
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts),
                "lang": pa.array(labels),
                "source": pa.array(["s0"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    want = collections.Counter(
        (lg, scalar_lang_id(t)) for lg, t in zip(labels, texts)
    )
    preds = {p for _lg, p in want}
    assert len(preds) >= 3  # several prediction classes hit

    got = lang_confusion(str(tmp_path)).to_pandas()
    assert {
        (r.lang, r.lang_pred): int(r.n_docs) for r in got.itertuples()
    } == dict(want)


def test_order_gaps_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import order_gap_quantiles

    g = np.random.default_rng(222)
    n_cust, n_orders = 25, 300
    ocust = g.integers(1, n_cust + 1, n_orders).astype(np.int64)
    odate = (
        np.datetime64("1996-01-01")
        + g.integers(0, 900, n_orders).astype("timedelta64[D]")
    ).astype("datetime64[us]")
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(
                    np.arange(1, n_orders + 1, dtype=np.int64)
                ),
                "o_custkey": pa.array(ocust),
                "o_orderstatus": pa.array(["O"] * n_orders),
                "o_totalprice": pa.array(np.zeros(n_orders)),
                "o_orderdate": pa.array(
                    odate.astype(np.int64), pa.int64()
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n_orders),
            }
        ),
        tmp_path / "orders.parquet",
    )

    per = collections.defaultdict(list)
    for i, (c, d) in enumerate(zip(ocust, odate)):
        per[int(c)].append((int(d.astype(np.int64)), i + 1))
    gaps = []
    for evs in per.values():
        evs.sort()
        gaps += [
            (b[0] - a[0]) // DAY_US for a, b in zip(evs[:-1], evs[1:])
        ]
    gaps.sort()
    nt = len(gaps)
    assert nt > 200

    got = order_gap_quantiles(str(tmp_path)).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert r.n_gaps == nt
    for q, col in ((500, "p50_days"), (900, "p90_days")):
        thr = (nt * q + 999) // 1000
        assert r[col] == gaps[thr - 1], col
