"""Deterministic F1 ingest-table generator (FIXTURES.md §1).

Fully vectorized (numpy uint64 splitmix64), so f1_bench at tens of millions of
rows generates in seconds.  Any N gives byte-identical tables across runs —
the test oracle and the engine must agree on these inputs.

Schema (order matters, FIXTURES.md §1):
    doc_id : string      "{source}-{seq:08d}"
    tokens : list<int32>
    n_tok  : int32       == len(tokens)
    source : string      "s00".."s07"
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = np.uint64(42)
N_SOURCES = 8
VOCAB = 50257
_A = np.uint64(0xBF58476D1CE4E5B9)
_B = np.uint64(0x94D049BB133111EB)

INGEST_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)


def mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, elementwise over uint64 (wrapping arithmetic)."""
    x = np.asarray(x, dtype=np.uint64)
    x = (x ^ (x >> np.uint64(30))) * _A
    x = (x ^ (x >> np.uint64(27))) * _B
    return x ^ (x >> np.uint64(31))


def h(*parts: np.ndarray) -> np.ndarray:
    """h(p0, p1, ...) = fold of mix(acc ^ p) starting from SEED (FIXTURES §1.1)."""
    acc = None
    for p in parts:
        p = np.asarray(p, dtype=np.uint64)
        acc = mix((np.uint64(SEED) if acc is None else acc) ^ p)
    return acc


def source_weights(n_rows: int) -> list[int]:
    """Zipf-ish row ownership: W[k] = floor(N/(k+1)/H8); remainder to s00."""
    h8 = sum(1.0 / (i + 1) for i in range(N_SOURCES))
    w = [int(n_rows / (k + 1) / h8) for k in range(N_SOURCES)]
    w[0] += n_rows - sum(w)
    return w


def make_pairs(n_rows: int, with_gaps: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """All surviving (k, seq) pairs sorted by (seq, k) (FIXTURES row order)."""
    w = source_weights(n_rows)
    ks = np.concatenate([np.full(w[k], k, dtype=np.int64) for k in range(N_SOURCES)])
    seqs = np.concatenate([np.arange(w[k], dtype=np.int64) for k in range(N_SOURCES)])
    if with_gaps:
        # source s05 misses every 7th minute bucket: drop iff (seq//60) % 7 == 3
        drop = (ks == 5) & ((seqs // 60) % 7 == 3)
        ks, seqs = ks[~drop], seqs[~drop]
    order = np.lexsort((ks, seqs))  # primary: seq, secondary: k
    return ks[order], seqs[order]


def n_tok_for(ks: np.ndarray, seqs: np.ndarray, max_tok: int = 512) -> np.ndarray:
    return (np.uint64(1) + h(ks, seqs) % np.uint64(max_tok)).astype(np.int64)


def tokens_for(ks: np.ndarray, seqs: np.ndarray, n_tok: np.ndarray) -> pa.ListArray:
    """tokens[i] = int32(h(k, seq, i) % 50257), vectorized via repeat+arange."""
    total = int(n_tok.sum())
    rep_k = np.repeat(ks, n_tok)
    rep_s = np.repeat(seqs, n_tok)
    offs = np.zeros(len(n_tok) + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offs[1:])
    idx = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], n_tok)
    vals = (h(rep_k, rep_s, idx) % np.uint64(VOCAB)).astype(np.int32)
    return pa.ListArray.from_arrays(pa.array(offs, type=pa.int32()), pa.array(vals))


def f1_table(n_rows: int, with_gaps: bool = True, max_tok: int = 512) -> pa.Table:
    """The full F1 table as one Arrow table (small fixtures / tests)."""
    ks, seqs = make_pairs(n_rows, with_gaps)
    return _rows_table(ks, seqs, max_tok)


def _rows_table(ks: np.ndarray, seqs: np.ndarray, max_tok: int) -> pa.Table:
    n_tok = n_tok_for(ks, seqs, max_tok)
    src = np.char.add("s0", ks.astype("U1"))
    doc_id = np.char.add(np.char.add(src, "-"), np.char.zfill(seqs.astype("U8"), 8))
    return pa.Table.from_arrays(
        [
            pa.array(doc_id, type=pa.string()),
            tokens_for(ks, seqs, n_tok),
            pa.array(n_tok.astype(np.int32)),
            pa.array(src, type=pa.string()),
        ],
        schema=INGEST_SCHEMA,
    )


def f3_table(n_rows: int = 1000) -> pa.Table:
    """f1_micro + 40 malformed rows exercising the reject taxonomy (FIXTURES §3)."""
    good = f1_table(n_rows)
    k = np.full(10, 1, dtype=np.int64)
    seq = np.arange(10, dtype=np.int64) + 10_000_000
    bad_ntok = _rows_table(k, seq, 512)  # n_tok off by +1 -> reason=validate
    bad_ntok = bad_ntok.set_column(
        2, "n_tok", pa.array((n_tok_for(k, seq) + 1).astype(np.int32))
    )
    bad_src = _rows_table(k, seq + 10, 512).set_column(
        3, "source", pa.array([""] * 10, type=pa.string())
    )  # source="" -> reason=validate
    nul_tok = _rows_table(k, seq + 20, 512).set_column(
        1, "tokens", pa.array([None] * 10, type=pa.list_(pa.int32()))
    )  # tokens=null -> reason=parse
    bad_id = _rows_table(k, seq + 30, 512).set_column(
        0, "doc_id", pa.array([f"noseq_{i}" for i in range(10)], type=pa.string())
    )  # seq underivable -> reason=parse
    return pa.concat_tables([good, bad_ntok, bad_src, nul_tok, bad_id])


def write_f1_parquet(
    out_dir: str,
    n_rows: int,
    shards: int = 1,
    with_gaps: bool = True,
    max_tok: int = 512,
    row_group_size: int = 64 * 1024,
    layout: str = "roundrobin",
) -> list[str]:
    """Write F1 as `shards` parquet files.  Deterministic.

    layout="roundrobin": shard s takes rows s::shards of the (seq,k) order —
    every shard mixes the whole seq range (N competing consumers on one
    queue, /root/reference/docker-compose.yaml:88-146; worst case for
    rollup locality).
    layout="contiguous": shard s takes a contiguous slice of the (seq,k)
    order — each file covers a bounded time window, like epoch files cut
    from a FIFO queue in arrival order (rmq.go FIFO per consumer).  Rollup
    partials then contract by ~tier_s per batch."""
    os.makedirs(out_dir, exist_ok=True)
    ks, seqs = make_pairs(n_rows, with_gaps)
    n = len(ks)
    paths = []
    for s in range(shards):
        if layout == "contiguous":
            lo, hi = n * s // shards, n * (s + 1) // shards
            sk, ss = ks[lo:hi], seqs[lo:hi]
        else:
            sk, ss = ks[s::shards], seqs[s::shards]
        t = _rows_table(sk, ss, max_tok)
        p = os.path.join(out_dir, f"part-{s:05d}.parquet")
        pq.write_table(t, p, row_group_size=row_group_size)
        paths.append(p)
    return paths
