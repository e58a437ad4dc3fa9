"""Round-5 wave-167 operators: E214 payload-k spectrum, T220 language ×
length matrix, R147 order-value mix trend — each vs a scalar brute-force
reference on planted fixtures."""

from __future__ import annotations

import collections
import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY_US = 86_400_000_000


def test_props_spectrum_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_props_spectrum

    g = np.random.default_rng(367)
    n = 2000
    types = np.array(["click", "view"])
    ty = g.integers(0, 2, n)
    kk = g.integers(-300, 300, n)
    props = [
        json.dumps({"k": int(k)}) if i % 17 != 0 else "garbage"
        for i, k in enumerate(kk)
    ]
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(g.integers(1, 30, n).astype(np.int64)),
            "ts": pa.array(
                np.sort(g.integers(0, DAY_US, n).astype(np.int64)),
                pa.int64(),
            ).cast(pa.timestamp("us")),
            "value": pa.array(g.uniform(0, 10, n)),
            "event_type": pa.array(types[ty]),
            "props": pa.array(props),
        }),
        tmp_path / "events.parquet",
    )

    agg = collections.Counter()
    for i, (k, t) in enumerate(zip(kk, ty)):
        if i % 17 == 0:
            band = 99
        elif k == 0:
            band = 0
        elif k > 0:
            band = int(k).bit_length()
        else:
            band = -int(-k).bit_length()
        agg[(int(t), band)] += 1

    got = events_props_spectrum(str(tmp_path)).to_pandas()
    assert len(got) == len(agg)
    for _, row in got.iterrows():
        k = int(np.where(types == row["source"])[0][0])
        assert int(row["n_events"]) == agg[(k, int(row["k_band"]))]


def test_lang_length_matrix_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import lang_length_matrix

    g = np.random.default_rng(373)
    langs = ["en", "zh", "es"]
    rows = []
    for i in range(400):
        lang = langs[int(g.integers(0, 3))]
        n_words = int(g.integers(1, 200))
        rows.append({"doc_id": i,
                     "text": " ".join("w" for _ in range(n_words)),
                     "lang": lang, "source": "s0", "n_chars": 0})
    pq.write_table(pa.Table.from_pylist(rows), tmp_path / "documents.parquet")

    agg = collections.defaultdict(lambda: [0, 0])
    for r in rows:
        nw = len(r["text"].split(" "))
        a = agg[(r["lang"], nw.bit_length())]
        a[0] += 1
        a[1] += nw

    got = lang_length_matrix(str(tmp_path)).to_pandas()
    assert len(got) == len(agg)
    for _, row in got.iterrows():
        nd, nw = agg[(row["lang"], int(row["len_band"]))]
        assert int(row["n_docs"]) == nd
        assert int(row["n_words"]) == nw


def test_value_mix_trend_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import value_mix_trend

    g = np.random.default_rng(379)
    n_ord = 500
    day = g.integers(9000, 12000, n_ord).astype(np.int64)
    price = np.exp(g.uniform(3, 10, n_ord))  # wide band spread
    pq.write_table(
        pa.table({
            "o_orderdate": pa.array(day * DAY_US, pa.int64()).cast(
                pa.timestamp("us")
            ),
            "o_totalprice": pa.array(price),
        }),
        tmp_path / "orders.parquet",
    )

    agg = collections.defaultdict(lambda: [0, 0])
    for d, p in zip(day, price):
        yr = int(np.datetime64(int(d), "D").astype("datetime64[Y]")
                 .astype(int)) + 1970
        rv = int(np.floor(p))
        band = rv.bit_length() if rv > 0 else 0
        a = agg[(yr, band)]
        a[0] += 1
        a[1] += rv

    got = value_mix_trend(str(tmp_path)).to_pandas()
    assert len(got) == len(agg)
    for _, row in got.iterrows():
        n, v = agg[(int(row["order_year"]), int(row["value_band"]))]
        assert int(row["n_orders"]) == n
        assert int(row["revenue_floor"]) == v
