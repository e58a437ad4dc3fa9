"""Vectorized HyperLogLog for distinct-cardinality rollups.

The approximate path of the E23/E24 pair (exact distinct via dedupe
combiner + one shuffle; HLL via mergeable register state): the exact
path's exchange is bounded by the number of TRUE distinct (group, id)
pairs — still corpus-sized for high-cardinality ids — while HLL state is
capped at ``m = 2**p`` registers per group regardless of cardinality, and
registers merge by elementwise max (associative and commutative, so any
combine tree is correct).

The representation is SPARSE end to end: a (group, register, max-rank)
row only exists for registers that were hit, so a batch never allocates a
dense (groups x m) matrix (which is allocation-bound when a batch spans
many groups, i.e. always under random arrival order), and the estimator
reconstructs the dense sum as ``sum(2^-rank over present) + (m - present)``
(absent registers contribute 2^0 each).

Standard estimator (Flajolet et al. 2007): ``alpha_m * m^2 / sum(2^-M)``
with linear counting below 2.5*m when empty registers exist.  p=12 gives
m=4096 registers -> ~1.6% typical relative error.
"""

from __future__ import annotations

import numpy as np

# splitmix64 finalizer constants — the standard public-domain mixer.
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over an int64/uint64 array (vectorized)."""
    z = x.astype(np.uint64)
    z ^= z >> np.uint64(30)
    z *= _M1
    z ^= z >> np.uint64(27)
    z *= _M2
    z ^= z >> np.uint64(31)
    return z


def hll_ranks(ids: np.ndarray, p: int = 12) -> tuple[np.ndarray, np.ndarray]:
    """Per-id (register index, rank): register = top ``p`` hash bits,
    rank = leading zeros of the remaining bits + 1 (capped at 64-p+1).

    Leading zeros via floor(log2): exact for any nonzero uint64 — log2 of
    a value with its top bit at position b lands in [b, b+1) and floors
    to b exactly (float64 rounding cannot cross a power of two here)."""
    h = mix64(ids)
    reg = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)
    nz = rest != 0
    lead = np.full(len(rest), 64 - p, dtype=np.int64)
    if nz.any():
        lead[nz] = 63 - np.floor(
            np.log2(rest[nz].astype(np.float64))
        ).astype(np.int64)
    return reg, lead + 1


def hll_estimate_sparse(
    inv_sum: np.ndarray, present: np.ndarray, p: int = 12
) -> np.ndarray:
    """Cardinality estimates from per-group sparse state: ``inv_sum`` =
    sum of 2^-rank over PRESENT registers, ``present`` = how many of the
    m registers were hit."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    zeros = m - present
    est = alpha * m * m / (inv_sum + zeros)  # absent registers add 2^0
    small = (est <= 2.5 * m) & (zeros > 0)
    if small.any():
        lin = m * np.log(m / np.maximum(zeros, 1))
        est = np.where(small, lin, est)
    return np.rint(est).astype(np.int64)
