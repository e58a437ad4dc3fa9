"""Round-4 wave-102 operators: E149 gap-value coupling sufficient stats
(planted gap/value pairs — including a window-boundary pair and ts ties —
pin all six sums), T156 word source-breadth
spectrum (planted shared/exclusive words pin every band), R83
dimension name-key coherence audit (planted key drifts and a parse
failure pin every counter) — each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_gap_value_coupling_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_gap_value_coupling

    base = np.datetime64("2026-07-01", "us").astype(np.int64)
    rows = []  # (source, ts_us, event_id, value)

    # "meter": long silences then big payloads (positive coupling);
    # gaps 100s/3600s/5s with values 10/500/2 after each gap
    t = base
    rows.append(("meter", t, 0, 1.0))
    for gap_s, v in ((100, 10.5), (3600, 500.25), (5, 2.0)):
        t += gap_s * 1_000_000
        rows.append(("meter", t, len(rows), float(v)))

    # "tied": two events at the SAME ts (ids 7, 8 break the tie), then
    # one more; negative value exercises floor semantics
    rows.append(("tied", base + 50, 7, 3.9))
    rows.append(("tied", base + 50, 8, -2.3))   # floor -> -3
    rows.append(("tied", base + 2_000_000, 9, 1.0))

    # "lone": single event -> zero pairs, all sums zero
    rows.append(("lone", base, 99, 42.0))

    # window-boundary crossing: small window (60s) forces the pair
    # between the last two "span" events through the carry machinery
    rows.append(("span", base + 10_000_000, 20, 7.0))
    rows.append(("span", base + 130_000_000, 21, 9.0))  # 120s later

    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows]),
                "ts": pa.array(
                    np.array([r[1] for r in rows], np.int64)
                ).cast(pa.timestamp("us")),
                "event_id": pa.array(
                    np.array([r[2] for r in rows], np.int64)
                ),
                "user_id": pa.array(np.zeros(n, np.int64)),
                "value": pa.array(np.array([r[3] for r in rows])),
            }
        ),
        tmp_path / "events.parquet",
    )

    got = (
        events_gap_value_coupling(str(tmp_path), window_us=60_000_000)
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    per = collections.defaultdict(list)
    for s, ts, eid, v in rows:
        per[s].append((ts, eid, int(np.floor(v))))
    assert list(got.index) == sorted(per)
    for s, evs in per.items():
        evs.sort()
        pairs = list(zip(evs, evs[1:]))
        g = [(b[0] - a[0]) // 1_000_000 for a, b in pairs]
        v = [b[2] for a, b in pairs]
        row = got.loc[s]
        assert row["n_pairs"] == len(pairs)
        assert row["sum_gap_s"] == sum(g)
        assert row["sum_gap_sq"] == sum(x * x for x in g)
        assert row["sum_v"] == sum(v)
        assert row["sum_v_sq"] == sum(x * x for x in v)
        assert row["sum_gap_v"] == sum(a * b for a, b in zip(g, v))
    assert got.loc["lone", "n_pairs"] == 0
    assert got.loc["span", "sum_gap_v"] == 120 * 9
    assert got.loc["tied", "sum_v"] == -3 + 1  # tie pair then 2s pair


def test_doc_word_breadth_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import word_breadth_spectrum

    rows = [  # (source, text)
        # "the" in all 3 sources; "fox" in s1+s2; "onlyone" in s1 only
        ("s1", "the quick fox onlyone the"),
        ("s1", "the fox again"),
        ("s2", "the lazy fox"),
        ("s2", "the dog"),
        ("s3", "the cat naps"),
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
        word_breadth_spectrum(str(tmp_path))
        .to_pandas()
        .set_index("n_sources")
        .sort_index()
    )
    per = collections.defaultdict(lambda: [set(), 0])  # w -> [srcs, occ]
    for s, txt in rows:
        for w in txt.split(" "):
            per[w][0].add(s)
            per[w][1] += 1
    want = collections.defaultdict(lambda: [0, 0])
    for w, (ss, occ) in per.items():
        want[len(ss)][0] += 1
        want[len(ss)][1] += occ
    assert list(got.index) == sorted(want)
    for k, (nw, occ) in want.items():
        assert got.loc[k, "n_words"] == nw
        assert got.loc[k, "n_occurrences"] == occ
    assert got.loc[3, "n_words"] == 1          # "the"
    assert got.loc[3, "n_occurrences"] == 6
    assert got.loc[2, "n_words"] == 1          # "fox"


def test_rel_dim_name_audit_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import dim_name_audit

    # customer: keys 0..9; plant 2 mismatches (+5, -3) and 1 parse fail
    ck = np.arange(10, dtype=np.int64)
    cnames = [f"Customer#{k:09d}" for k in ck]
    cnames[3] = f"Customer#{3 + 5:09d}"   # dev +5
    cnames[7] = f"Customer#{7 - 3:09d}"   # dev 3
    cnames[9] = "Customer#broken"          # parse fail
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(ck),
                "c_name": pa.array(cnames),
                "c_nationkey": pa.array(np.zeros(10, np.int64)),
                "c_acctbal": pa.array(np.zeros(10)),
                "c_mktsegment": pa.array(["BUILDING"] * 10),
            }
        ),
        tmp_path / "customer.parquet",
    )
    # supplier: keys 0..4, all clean (leading zeros must cast away)
    sk = np.arange(5, dtype=np.int64)
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(sk),
                "s_name": pa.array([f"Supplier#{k:09d}" for k in sk]),
                "s_nationkey": pa.array(np.zeros(5, np.int64)),
                "s_acctbal": pa.array(np.zeros(5)),
            }
        ),
        tmp_path / "supplier.parquet",
    )

    got = (
        dim_name_audit(str(tmp_path))
        .to_pandas()
        .set_index("dim")
        .sort_index()
    )
    assert list(got.index) == ["customer", "supplier"]
    c = got.loc["customer"]
    assert c["n_rows"] == 10
    assert c["n_parse_fail"] == 1
    assert c["n_mismatch"] == 2
    assert c["max_abs_dev"] == 5
    s = got.loc["supplier"]
    assert s["n_rows"] == 5
    assert s["n_parse_fail"] == 0
    assert s["n_mismatch"] == 0
    assert s["max_abs_dev"] == 0
