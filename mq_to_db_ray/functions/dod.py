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

from .bitio import BitReader, BitWriter

_U64 = (1 << 64) - 1


def _wrap(x: int) -> int:
    """Wrap to signed int64 (two's complement) — deltas of extreme int64
    values exceed 64 bits; wrapping keeps every rung at <=64 bits while still
    round-tripping any int64 sequence exactly."""
    return ((x + (1 << 63)) & _U64) - (1 << 63)


def dod_encode(values: Sequence[int]) -> bytes:
    w = BitWriter()
    n = len(values)
    w.write(n, 32)
    if n == 0:
        return w.getvalue()
    first = int(values[0])
    w.write(first & _U64, 64)
    prev = first
    delta_prev = 0
    for i in range(1, n):
        v = int(values[i])
        delta = _wrap(v - prev)
        dod = _wrap(delta - delta_prev)
        if dod == 0:
            w.write(0b0, 1)
        elif -63 <= dod <= 64:
            w.write(0b10, 2)
            w.write(dod + 63, 7)
        elif -255 <= dod <= 256:
            w.write(0b110, 3)
            w.write(dod + 255, 9)
        elif -2047 <= dod <= 2048:
            w.write(0b1110, 4)
            w.write(dod + 2047, 12)
        elif -(1 << 31) <= dod <= (1 << 31) - 1:
            w.write(0b11110, 5)
            w.write(dod + (1 << 31), 32)
        else:
            w.write(0b11111, 5)
            w.write((dod + (1 << 63)) & _U64, 64)
        prev, delta_prev = v, delta
    return w.getvalue()


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
