"""Delta-of-delta integer series codec (Gorilla §4.1.1 timestamp scheme,
Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory Time Series Database",
VLDB 2015 — public paper; adapted for int64 values with two extra rungs).

Blob layout (MSB-first bit stream):
    [u32 count] [i64 first value, two's complement]
    then per subsequent value, with delta_prev starting at 0,
    dod = (v[i]-v[i-1]) - delta_prev encoded as:
        '0'                          dod == 0
        '10'    + 7  bits (dod+63)   dod in [-63, 64]
        '110'   + 9  bits (dod+255)  dod in [-255, 256]
        '1110'  + 12 bits (dod+2047) dod in [-2047, 2048]
        '11110' + 32 bits (dod+2^31) dod in [-2^31, 2^31-1]
        '11111' + 64 bits (dod+2^63) anything else (int64 range)

Deterministic: encode(decode(b)) == b and decode(encode(x)) == x for any
int64 sequence.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from .bitio import BitReader, pack_tokens

_U64 = (1 << 64) - 1


def _wrap(x: int) -> int:
    """Wrap to signed int64 (two's complement) — deltas of extreme int64
    values exceed 64 bits; wrapping keeps every rung at <=64 bits while still
    round-tripping any int64 sequence exactly."""
    return ((x + (1 << 63)) & _U64) - (1 << 63)


def dod_encode(values: Sequence[int]) -> bytes:
    """Fully vectorized: deltas/dods, rung selection and token values are
    numpy kernels; the bit stream is packed by ``pack_tokens``.  Wrapping
    int64 subtraction == ``_wrap``; byte-identical to the sequential
    reference encoder (golden vectors in tests/test_encoders.py)."""
    n = len(values)
    if n == 0:
        return pack_tokens(np.array([0], np.uint64), np.array([32], np.int64))
    vals = np.ascontiguousarray(values, dtype=np.int64)
    header_v = np.array([n & 0xFFFFFFFF, int(vals[0]) & _U64], dtype=np.uint64)
    header_n = np.array([32, 64], dtype=np.int64)
    if n == 1:
        return pack_tokens(header_v, header_n)
    with np.errstate(over="ignore"):
        deltas = vals[1:] - vals[:-1]
        dods = np.concatenate([deltas[:1], deltas[1:] - deltas[:-1]])
    d = dods
    c0 = d == 0
    c1 = (d >= -63) & (d <= 64)
    c2 = (d >= -255) & (d <= 256)
    c3 = (d >= -2047) & (d <= 2048)
    c4 = (d >= -(1 << 31)) & (d <= (1 << 31) - 1)
    with np.errstate(over="ignore"):
        tok1 = np.uint64(0b10 << 7) | (d + 63).view(np.uint64)
        tok2 = np.uint64(0b110 << 9) | (d + 255).view(np.uint64)
        tok3 = np.uint64(0b1110 << 12) | (d + 2047).view(np.uint64)
        tok4 = np.uint64(0b11110 << 32) | (d + (1 << 31)).view(np.uint64)
    off64 = d.view(np.uint64) ^ np.uint64(1 << 63)  # == (dod + 2^63) mod 2^64
    tok5a = np.uint64(0b11111 << 32) | (off64 >> np.uint64(32))
    tok5b = off64 & np.uint64(0xFFFFFFFF)
    conds = [c0, c1, c2, c3, c4]
    primary = np.select(conds, [np.uint64(0), tok1, tok2, tok3, tok4], tok5a)
    pn = np.select(conds, [1, 9, 12, 16, 37], 37)
    small = c0 | c1 | c2 | c3 | c4
    if small.all():  # common case: no 64-bit rung -> no secondary tokens
        return pack_tokens(
            np.concatenate([header_v, primary]),
            np.concatenate([header_n, pn]),
            pre_masked=True,
        )
    sec_n = np.where(small, 0, 32)
    inter_v = np.stack([primary, tok5b], axis=1).reshape(-1)
    inter_n = np.stack([pn, sec_n], axis=1).reshape(-1)
    keep = inter_n > 0
    return pack_tokens(
        np.concatenate([header_v, inter_v[keep]]),
        np.concatenate([header_n, inter_n[keep]]),
        pre_masked=True,
    )


def dod_decode(blob: bytes) -> list[int]:
    r = BitReader(blob)
    n = r.read(32)
    if n == 0:
        return []
    first = r.read(64)
    if first >= 1 << 63:
        first -= 1 << 64
    out = [first]
    prev, delta_prev = first, 0
    for _ in range(n - 1):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        elif r.read(1) == 0:
            dod = r.read(32) - (1 << 31)
        else:
            dod = r.read(64) - (1 << 63)
        delta = _wrap(delta_prev + dod)
        v = _wrap(prev + delta)
        out.append(v)
        prev, delta_prev = v, delta
    return out
