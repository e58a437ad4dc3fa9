"""Round-4 wave-60 operators: E108 user lifetime-value band histogram
(planted zero-value and whale users exercise band 0 and a high band),
T113 whitespace-hygiene lint board (planted dirty docs exercise every
lint column), R41 tax-exposure board (planted zero-tax lines exercise
the taxed_lines split) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_user_value_bands_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_user_value_bands

    g = np.random.default_rng(450)
    n = 4000
    uid = g.integers(1, 40, n).astype(np.int64)
    val = g.uniform(0, 120, n)
    # planted: user 0 emits two near-zero events (band 0); user 99 is a
    # whale with 30 events of value 400 (a high, otherwise-empty band)
    uid = np.append(uid, [0, 0] + [99] * 30)
    val = np.append(val, [0.2, 0.7] + [400.0] * 30)
    ts = np.datetime64("2026-03-01", "us").astype(np.int64) + np.arange(
        len(uid), dtype=np.int64
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(len(uid), dtype=np.int64)),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "user_id": pa.array(uid),
                "event_type": pa.array(["t"] * len(uid)),
                "value": pa.array(val),
            }
        ),
        tmp_path / "events.parquet",
    )

    per_n = collections.Counter()
    per_v = collections.Counter()
    for u, v in zip(uid, val):
        per_n[int(u)] += 1
        per_v[int(u)] += math.floor(v)
    want = {}
    for u in per_n:
        b = per_v[u] // 500
        w = want.setdefault(b, [0, 0, 0])
        w[0] += 1
        w[1] += per_n[u]
        w[2] += per_v[u]

    got = events_user_value_bands(str(tmp_path)).to_pandas()
    assert len(got) == len(want)
    for _, r in got.iterrows():
        nu, ne, vu = want[int(r.band)]
        assert int(r.n_users) == nu, r.band
        assert int(r.n_events) == ne, r.band
        assert int(r.value_units) == vu, r.band
    assert 0 in want and (30 * 400) // 500 in want  # plants landed


def test_doc_hygiene_board_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import hygiene_board

    g = np.random.default_rng(451)
    texts = [f"clean doc number {int(g.integers(0, 50))}" for _ in range(300)]
    srcs = [f"s{int(g.integers(0, 3))}" for _ in range(300)]
    # planted dirty docs in source "dirty", one per lint column plus a
    # doc that trips several at once
    plants = [
        "",  # empty
        " leading space",  # lead
        "trailing space ",  # trail
        "double  space inside",  # double
        "tab\there",  # ctl
        "line\nbreak",  # ctl
        " both  kinds \t",  # lead+trail+double+ctl
        "totally clean",
    ]
    texts += plants
    srcs += ["dirty"] * len(plants)
    pq.write_table(
        pa.table({"text": pa.array(texts), "source": pa.array(srcs)}),
        tmp_path / "documents.parquet",
    )

    want = collections.defaultdict(lambda: [0] * 6)
    for t, s in zip(texts, srcs):
        w = want[s]
        w[0] += 1
        w[1] += t == ""
        w[2] += t.startswith(" ")
        w[3] += t.endswith(" ")
        w[4] += "  " in t
        w[5] += "\t" in t or "\n" in t

    got = hygiene_board(str(tmp_path)).to_pandas()
    assert len(got) == len(want)
    for _, r in got.iterrows():
        nd, ne, nl, nt, n2, nc = want[r.source]
        assert int(r.n_docs) == nd, r.source
        assert int(r.n_empty) == ne, r.source
        assert int(r.n_lead_ws) == nl, r.source
        assert int(r.n_trail_ws) == nt, r.source
        assert int(r.n_double_space) == n2, r.source
        assert int(r.n_ctl) == nc, r.source
    d = got[got.source == "dirty"].iloc[0]
    assert (
        int(d.n_empty),
        int(d.n_lead_ws),
        int(d.n_trail_ws),
        int(d.n_double_space),
        int(d.n_ctl),
    ) == (1, 2, 1, 2, 3)  # " both  kinds \t" ends in TAB, not space
    # clean sources show all-zero lint columns
    assert int(got[got.source == "s0"].iloc[0].n_ctl) == 0


def test_rel_tax_board_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import tax_board

    g = np.random.default_rng(452)
    n = 5000
    rf = np.array(["R", "A", "N"])[g.integers(0, 3, n)]
    ls = np.array(["O", "F"])[g.integers(0, 2, n)]
    ext = g.uniform(900, 90000, n)
    tax = g.integers(0, 9, n) / 100.0  # 0.00..0.08, zeros included
    pq.write_table(
        pa.table(
            {
                "l_returnflag": pa.array(rf),
                "l_linestatus": pa.array(ls),
                "l_extendedprice": pa.array(ext),
                "l_tax": pa.array(tax),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    want = collections.defaultdict(lambda: [0, 0, 0, 0])
    for f, s, e, t in zip(rf, ls, ext, tax):
        cents = math.floor(100.0 * e)
        taxpm = math.floor(1000.0 * t)
        w = want[(f, s)]
        w[0] += 1
        w[1] += taxpm > 0
        w[2] += cents
        w[3] += (cents * taxpm) // 1000

    got = tax_board(str(tmp_path)).to_pandas()
    assert len(got) == len(want)
    for _, r in got.iterrows():
        nl, tl, rv, tc = want[(r.l_returnflag, r.l_linestatus)]
        assert int(r.n_lines) == nl
        assert int(r.taxed_lines) == tl and tl < nl  # zero-tax plant held
        assert int(r.rev_cents) == rv
        assert int(r.tax_cents) == tc
