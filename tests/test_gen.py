"""Generator determinism + FIXTURES.md §1 invariants."""

from __future__ import annotations

import numpy as np
import pyarrow.compute as pc

from mq_to_db_ray.gen import (
    f1_table,
    f3_table,
    h,
    make_pairs,
    mix,
    source_weights,
)


def h_scalar(*parts: int, seed: int = 42) -> int:
    """Reference (non-vectorized) splitmix64 fold from FIXTURES.md §1.1."""

    def m(x: int) -> int:
        x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 % 2**64
        x = (x ^ (x >> 27)) * 0x94D049BB133111EB % 2**64
        return x ^ (x >> 31)

    acc = seed
    for p in parts:
        acc = m(acc ^ p)
    return acc


def test_mix_matches_scalar_spec():
    xs = np.array([0, 1, 42, 2**63, 2**64 - 1], dtype=np.uint64)
    got = mix(xs)
    for x, g in zip(xs.tolist(), got.tolist()):
        want = h_scalar(int(x) ^ 42)  # mix(x) == one fold step from acc=x? no:
        # direct check of mix itself:
        def m(v):
            v = (v ^ (v >> 30)) * 0xBF58476D1CE4E5B9 % 2**64
            v = (v ^ (v >> 27)) * 0x94D049BB133111EB % 2**64
            return v ^ (v >> 31)

        assert g == m(int(x))


def test_h_matches_scalar():
    ks = np.array([3, 3, 5], dtype=np.uint64)
    seqs = np.array([0, 1, 999], dtype=np.uint64)
    got = h(ks, seqs).tolist()
    for (k, s), g in zip([(3, 0), (3, 1), (5, 999)], got):
        assert g == h_scalar(k, s)


def test_weights_sum_and_skew():
    w = source_weights(100_000)
    assert sum(w) == 100_000
    assert w[0] > 0.3 * 100_000  # s00 owns ~37% — the skew axis
    assert w == source_weights(100_000)


def test_gap_rule():
    ks, seqs = make_pairs(100_000)
    s5 = seqs[ks == 5]
    minutes = set((s5 // 60).tolist())
    missing = [m for m in range(max(minutes)) if m not in minutes]
    assert missing and all(m % 7 == 3 for m in missing)
    # all other sources dense
    for k in (0, 3, 7):
        sk = seqs[ks == k]
        assert len(sk) == sk.max() + 1


def test_table_deterministic_and_valid(f1_micro):
    t2 = f1_table(1000)
    assert f1_micro.equals(t2)
    # n_tok == len(tokens) always in F1
    lens = pc.list_value_length(f1_micro["tokens"])
    assert pc.all(pc.equal(lens, pc.cast(f1_micro["n_tok"], "int32"))).as_py()
    # doc_id encodes (source, seq)
    row = f1_micro.slice(0, 1).to_pylist()[0]
    assert row["doc_id"].startswith(row["source"] + "-")


def test_worked_micro_example(f1_micro):
    # FIXTURES §2: for k=3, seq=0..2, n_tok = 1 + h(3, seq) % 512
    t = f1_micro.filter(pc.equal(f1_micro["source"], "s03")).sort_by("doc_id")
    got = t["n_tok"].to_pylist()[:3]
    want = [1 + h_scalar(3, s) % 512 for s in range(3)]
    assert got == want
    toks = t["tokens"].to_pylist()[0]
    assert toks == [h_scalar(3, 0, i) % 50257 for i in range(want[0])]


def test_f3_shape():
    t = f3_table(1000)
    assert t.num_rows == f1_table(1000).num_rows + 40
