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

from .bitio import BitReader, BitWriter


def _bits(v: float) -> int:
    return struct.unpack(">Q", struct.pack(">d", v))[0]


def _float(b: int) -> float:
    return struct.unpack(">d", struct.pack(">Q", b))[0]


def _clz64(x: int) -> int:
    return 64 - x.bit_length()


def _ctz64(x: int) -> int:
    return (x & -x).bit_length() - 1


def gorilla_encode(values: Sequence[float]) -> bytes:
    w = BitWriter()
    n = len(values)
    w.write(n, 32)
    if n == 0:
        return w.getvalue()
    prev = _bits(float(values[0]))
    w.write(prev, 64)
    lead, mlen = -1, 0  # previous meaningful window; -1 = invalid
    for i in range(1, n):
        cur = _bits(float(values[i]))
        x = cur ^ prev
        if x == 0:
            w.write(0b0, 1)
        else:
            l = min(_clz64(x), 31)
            t = _ctz64(x)
            if lead >= 0 and l >= lead and t >= 64 - lead - mlen:
                w.write(0b10, 2)
                w.write(x >> (64 - lead - mlen), mlen)
            else:
                mlen = 64 - l - t
                lead = l
                w.write(0b11, 2)
                w.write(lead, 5)
                w.write(mlen - 1, 6)
                w.write(x >> t, mlen)
        prev = cur
    return w.getvalue()


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
