"""Gorilla XOR float64 series codec (Pelkonen et al., VLDB 2015, §4.1.2 —
public paper; from-scratch implementation).

Blob layout (MSB-first bit stream):
    [u32 count] [64 bits: IEEE-754 of first value]
    per subsequent value, x = bits(v) XOR bits(prev):
        '0'                                  x == 0
        '10' + meaningful bits               x fits inside the previous
                                             (leading, length) window
        '11' + 5 bits leading (capped at 31)
             + 6 bits (meaningful_len - 1)
             + meaningful bits               new window

NaNs round-trip bit-exactly (we compare bit patterns, not float equality).
"""

from __future__ import annotations

import struct
from typing import Sequence

import numpy as np

from .bitio import BitReader, pack_tokens


def _bits(v: float) -> int:
    return struct.unpack(">Q", struct.pack(">d", v))[0]


def _float(b: int) -> float:
    return struct.unpack(">d", struct.pack(">Q", b))[0]


def _bitlen32(a: "np.ndarray") -> "np.ndarray":
    """bit_length of uint values < 2^32, exact (float64 mantissa > 32 bits)."""
    return np.frexp(a.astype(np.float64))[1]


def gorilla_encode(values: Sequence[float]) -> bytes:
    """Semi-vectorized: XORs, leading/trailing-zero counts and the full
    reset-token values are numpy kernels; only the (lead, mlen) window state
    machine — sequential by construction — runs as a tight Python loop over
    plain ints, and the bit stream is packed once by ``pack_tokens``.
    Byte-identical to the sequential reference encoder."""
    n = len(values)
    if n == 0:
        return pack_tokens(np.array([0], np.uint64), np.array([32], np.int64))
    b = np.ascontiguousarray(values, dtype=np.float64).view(np.uint64)
    if n == 1:
        return pack_tokens(
            np.array([n & 0xFFFFFFFF, int(b[0])], np.uint64),
            np.array([32, 64], np.int64),
        )
    x = b[1:] ^ b[:-1]
    hi = x >> np.uint64(32)
    lo = x & np.uint64(0xFFFFFFFF)
    clz = np.where(hi != 0, 32 - _bitlen32(hi), 64 - _bitlen32(lo))
    lowbit = x & (~x + np.uint64(1))
    lbh = lowbit >> np.uint64(32)
    ctz = np.where(
        lbh != 0,
        31 + _bitlen32(lbh),
        _bitlen32(lowbit & np.uint64(0xFFFFFFFF)) - 1,
    )
    l_cap = np.minimum(clz, 31)
    m_reset = 64 - l_cap - ctz
    # reset token = '11' + 5b lead + 6b (mlen-1) + mlen payload.  The full
    # token is 13+mlen <= 77 bits — too wide for a uint64 precompute — so
    # the 13-bit header and the payload are precomputed separately and
    # combined as (unbounded) Python ints in the loop.
    reset_hdr = (
        np.uint64(0b11 << 11)
        | (l_cap.astype(np.uint64) << np.uint64(6))
        | (m_reset - 1).astype(np.uint64)
    )
    payload = x >> ctz.astype(np.uint64)

    from itertools import repeat

    # zero-run fast path: the loop visits only NONZERO xors; runs of
    # identical values ('0' control bits) are emitted in bulk at C speed.
    # Plateaued series (steady rollup sums, gap-filled zeros) are mostly
    # zero-xor, so this often skips the Python loop almost entirely.
    nz = np.flatnonzero(x)
    gaps = np.diff(nz, prepend=-1) - 1  # zero-run length before each nonzero
    tail = (n - 1) - (int(nz[-1]) + 1) if len(nz) else (n - 1)

    out_v = [n & 0xFFFFFFFF, int(b[0])]
    out_n = [32, 64]
    av, an = out_v.append, out_n.append
    ev, en = out_v.extend, out_n.extend
    lead, mlen, shift = -1, 0, 64  # shift = 64-lead-mlen = min valid trail
    for xi, li, ti, mi, hd, pl, gap in zip(
        x[nz].tolist(), l_cap[nz].tolist(), ctz[nz].tolist(),
        m_reset[nz].tolist(), reset_hdr[nz].tolist(), payload[nz].tolist(),
        gaps.tolist(),
    ):
        if gap:
            ev(repeat(0, gap))
            en(repeat(1, gap))
        if li >= lead >= 0 and ti >= shift:
            v = (2 << mlen) | (xi >> shift)
            nb = 2 + mlen
        else:
            lead, mlen = li, mi
            shift = 64 - lead - mlen
            v = (hd << mlen) | pl
            nb = 13 + mlen
        if nb > 64:  # token splitting keeps pack_tokens in uint64
            av(v >> 32)
            an(nb - 32)
            av(v & 0xFFFFFFFF)
            an(32)
        else:
            av(v)
            an(nb)
    if tail:
        ev(repeat(0, tail))
        en(repeat(1, tail))
    return pack_tokens(
        np.array(out_v, dtype=np.uint64), np.array(out_n, dtype=np.int64),
        pre_masked=True,
    )


def gorilla_decode(blob: bytes) -> list[float]:
    r = BitReader(blob)
    n = r.read(32)
    if n == 0:
        return []
    prev = r.read(64)
    out = [_float(prev)]
    lead, mlen = 0, 0
    for _ in range(n - 1):
        if r.read(1) == 0:
            out.append(_float(prev))
            continue
        if r.read(1) == 1:
            lead = r.read(5)
            mlen = r.read(6) + 1
        x = r.read(mlen) << (64 - lead - mlen)
        prev ^= x
        out.append(_float(prev))
    return out
