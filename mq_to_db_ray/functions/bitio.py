"""Minimal MSB-first bit stream reader/writer for the series codecs.

Pure Python over ``int`` (arbitrary precision), used only on rolled-up points
(one value per bucket per source), never on raw rows — so the per-point
Python cost is amortized over the 60×/3600×/86400× reduction of the rollup.
"""

from __future__ import annotations


class BitWriter:
    __slots__ = ("_buf", "_acc", "_n")

    def __init__(self) -> None:
        self._buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, bits: int) -> None:
        """Append the low `bits` bits of `value` (MSB first)."""
        self._acc = (self._acc << bits) | (value & ((1 << bits) - 1))
        self._n += bits
        while self._n >= 8:
            self._n -= 8
            self._buf.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def getvalue(self) -> bytes:
        """Byte string, final partial byte zero-padded on the right."""
        if self._n:
            return bytes(self._buf) + bytes([(self._acc << (8 - self._n)) & 0xFF])
        return bytes(self._buf)


class BitReader:
    __slots__ = ("_data", "_pos")

    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0  # bit position

    def read(self, bits: int) -> int:
        out = 0
        pos = self._pos
        data = self._data
        end = pos + bits
        if end > len(data) * 8:
            raise EOFError("bit stream exhausted")
        while bits > 0:
            byte = data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, bits)
            shift = avail - take
            out = (out << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
            bits -= take
        self._pos = pos
        return out
