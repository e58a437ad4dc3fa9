"""Round-4 wave-99 operators: E146 payload IQR-fence outlier audit
(planted spike/clean/constant sources pin q1/q3 and both fence counts),
T153/F rare-token exposure board (planted global-tail ids pin the hit
and occurrence counts), R80 dominant-line concentration histogram
(planted single-line / dominant / balanced orders pin their bands) —
each vs a scalar brute-force reference."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _qdisc(sorted_vals: list[int], permille: int) -> int:
    """The repo's quantile_disc rank rule: smallest value whose
    cumulative count >= ceil(n * permille / 1000)."""
    n = len(sorted_vals)
    return sorted_vals[(n * permille + 999) // 1000 - 1]


def test_events_value_iqr_outliers_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_value_iqr_outliers

    g = np.random.default_rng(831)
    base = np.datetime64("2026-07-01", "us").astype(np.int64)
    et, val = [], []
    # "spiky": tight body around 10.00 plus planted far outliers
    for i in range(80):
        et.append("spiky")
        val.append(10.0 + (i % 5) * 0.01)
    for v in (500.0, 600.0, -400.0):  # 2 high + 1 low escapee
        et.append("spiky")
        val.append(v)
    # "const": IQR = 0 -> fences collapse to the point; nothing escapes
    for _ in range(30):
        et.append("const")
        val.append(7.25)
    # "mixed": random cents values
    for _ in range(300):
        et.append("mixed")
        val.append(float(np.round(g.uniform(-20, 20), 2)))
    n = len(et)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(et),
                "ts": pa.array(
                    base + np.arange(n, dtype=np.int64) * 1000
                ).cast(pa.timestamp("us")),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.zeros(n, np.int64)),
                "value": pa.array(np.array(val)),
            }
        ),
        tmp_path / "events.parquet",
    )

    got = (
        events_value_iqr_outliers(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    per = collections.defaultdict(list)
    for s, v in zip(et, val):
        per[s].append(int(np.rint(v * 100)))
    assert list(got.index) == sorted(per)
    for s, cents in per.items():
        cents.sort()
        q1 = _qdisc(cents, 250)
        q3 = _qdisc(cents, 750)
        row = got.loc[s]
        assert row["n_events"] == len(cents)
        assert row["q1_cents"] == q1
        assert row["q3_cents"] == q3
        assert row["n_low"] == sum(1 for c in cents if 2 * c < 5 * q1 - 3 * q3)
        assert row["n_high"] == sum(1 for c in cents if 2 * c > 5 * q3 - 3 * q1)
    assert got.loc["spiky", "n_high"] == 2
    assert got.loc["spiky", "n_low"] == 1
    assert got.loc["const", "n_low"] == 0
    assert got.loc["const", "n_high"] == 0


def test_tape_rare_token_docs_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import tape_rare_token_docs

    # vocab plan (max_df=5 counts total OCCURRENCES):
    #   id 1: everywhere (common)    id 77: exactly 3 occurrences (rare)
    #   id 88: exactly 5 (rare, at the fence)   id 99: 6 (NOT rare)
    rows = [
        ("s01", [1, 1, 77, 1]),          # hit (one 77)
        ("s01", [1, 1, 1]),              # clean
        ("s01", [77, 77, 88]),           # hit (two 77 + one 88)
        ("s02", [1, 88, 88, 1]),         # hit (two 88)
        ("s02", [99, 99, 99]),           # clean (99 not rare)
        ("s02", [1, 99, 99, 99]),        # clean
        ("s03", [88, 88]),               # hit (two 88)
        ("s03", []),                     # empty list: clean
    ]
    for i in range(10):  # bulk common filler so id 1 is clearly common
        rows.append(("s03", [1] * 4))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([f"{s}-{i:08d}" for i, (s, _) in enumerate(rows)]),
                "tokens": pa.array([r[1] for r in rows], pa.list_(pa.int32())),
                "n_tok": pa.array([len(r[1]) for r in rows], pa.int32()),
                "source": pa.array([r[0] for r in rows]),
            }
        ),
        tmp_path / "part-00000.parquet",
    )

    flat = [t for _, tk in rows for t in tk]
    cnt = collections.Counter(flat)
    rare = {t for t, c in cnt.items() if c <= 5}
    assert rare == {77, 88}

    got = (
        tape_rare_token_docs(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    per = collections.defaultdict(list)
    for s, tk in rows:
        per[s].append(tk)
    assert list(got.index) == sorted(per)
    for s, lists in per.items():
        hit = sum(1 for tk in lists if any(t in rare for t in tk))
        occ = sum(sum(1 for t in tk if t in rare) for tk in lists)
        row = got.loc[s]
        assert row["n_seqs"] == len(lists)
        assert row["hit_seqs"] == hit
        assert row["rare_occurrences"] == occ
        assert row["hit_permille"] == 1000 * hit // len(lists)
    assert got.loc["s01", "rare_occurrences"] == 4
    assert got.loc["s02", "hit_seqs"] == 1
    assert got.loc["s03", "hit_seqs"] == 1


def test_rel_dominant_line_hist_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.relational import dominant_line_hist

    g = np.random.default_rng(832)
    ok, qty = [], []
    # planted: 12 single-line orders -> band 10
    for i in range(12):
        ok.append(1000 + i)
        qty.append(float(g.integers(1, 50)))
    # planted: dominant orders (49 + 1) -> band 10*49//50 = 9
    for i in range(7):
        ok.append(2000 + i)
        qty.extend([49.0, 1.0])
        ok.append(2000 + i)
    # planted: perfectly balanced 4-line orders (5,5,5,5) -> band 2
    for i in range(5):
        for _ in range(4):
            ok.append(3000 + i)
            qty.append(5.0)
    # random tail
    for i in range(60):
        nl = int(g.integers(1, 8))
        for _ in range(nl):
            ok.append(9000 + i)
            qty.append(float(g.integers(1, 50)))
    n = len(ok)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.array(ok, np.int64)),
                "l_partkey": pa.array(np.ones(n, np.int64)),
                "l_suppkey": pa.array(np.ones(n, np.int64)),
                "l_linenumber": pa.array(np.ones(n, np.int32)),
                "l_quantity": pa.array(np.array(qty)),
                "l_extendedprice": pa.array(np.full(n, 100.0)),
                "l_discount": pa.array(np.zeros(n)),
                "l_tax": pa.array(np.zeros(n)),
                "l_returnflag": pa.array(["N"] * n),
                "l_linestatus": pa.array(["O"] * n),
                "l_shipdate": pa.array(
                    np.full(n, np.datetime64("2026-01-01", "us"))
                ),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    per = collections.defaultdict(list)
    for k, q in zip(ok, qty):
        per[k].append(int(np.floor(q)))
    want = collections.defaultdict(lambda: [0, 0, 0])
    for k, qs in per.items():
        band = 10 * max(qs) // sum(qs)
        w = want[band]
        w[0] += 1
        w[1] += len(qs)
        w[2] += sum(qs)

    got = (
        dominant_line_hist(str(tmp_path))
        .to_pandas()
        .set_index("dominance_band")
        .sort_index()
    )
    assert list(got.index) == sorted(want)
    for band, (no, nl, qf) in want.items():
        row = got.loc[band]
        assert row["n_orders"] == no
        assert row["n_lines"] == nl
        assert row["qty_floor"] == qf
    assert got.loc[10, "n_orders"] >= 12
    assert got.loc[9, "n_orders"] >= 7
    assert got.loc[2, "n_orders"] >= 5
