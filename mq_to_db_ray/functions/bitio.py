"""MSB-first bit stream primitives for the series codecs.

``pack_tokens`` is the vectorized writer: encoders express their output as
(value, nbits) token arrays and the whole stream is packed with ~8 numpy
kernels (token bits expanded positionally, then ``np.packbits``) instead of
a per-value Python loop — byte-identical to the sequential ``BitWriter``
(same MSB-first order, same right-zero-padded final byte).

``BitWriter``/``BitReader`` remain for the decoders (control prefixes are
sequential by nature) and as the semantics reference.
"""

from __future__ import annotations

import numpy as np


def pack_tokens(
    values: "np.ndarray", nbits: "np.ndarray", *, pre_masked: bool = False
) -> bytes:
    """Pack tokens MSB-first: token i contributes the low ``nbits[i]`` bits
    of ``values[i]`` (uint64), most-significant first, concatenated in order;
    the final partial byte is zero-padded on the right (== BitWriter).

    Lane algorithm (no per-bit expansion — transient memory is a few
    uint64 arrays of len(tokens)): each token lands in one 64-bit big-endian
    output lane, spilling at most its tail into the next lane; per-lane
    contributions are OR-combined with ``bitwise_or.reduceat`` (token bit
    offsets are monotone, so each lane's contributions are contiguous).

    ``pre_masked=True`` skips the defensive low-n-bits mask when the caller
    guarantees every value already fits its width (both codecs do).
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = np.ascontiguousarray(nbits, dtype=np.int64)
    total = int(n.sum())
    if total == 0:
        return b""
    if not pre_masked:
        # mask each value to its low n bits (BitWriter semantics); n == 64
        # keeps the full value (1<<64 would overflow the shift, hence where)
        mask = np.where(n >= 64, np.uint64(0xFFFFFFFFFFFFFFFF),
                        (np.uint64(1) << np.where(n >= 64, 0, n).astype(np.uint64))
                        - np.uint64(1))
        v = v & mask
    ends = np.cumsum(n)
    starts = ends - n
    lane = starts >> 6
    off = starts & 63
    s1 = 64 - n - off  # >=0: token fits lane; <0: top -s1 bits spill next
    fits = s1 >= 0
    p1 = np.where(
        fits,
        v << np.where(fits, s1, 0).astype(np.uint64),
        v >> np.where(fits, 0, -s1).astype(np.uint64),
    )
    nlanes = (total + 63) >> 6
    lanes = np.zeros(nlanes, dtype=np.uint64)
    b1 = np.flatnonzero(np.r_[True, lane[1:] != lane[:-1]])
    lanes[lane[b1]] = np.bitwise_or.reduceat(p1, b1)
    spill = ~fits
    if spill.any():
        sl = lane[spill] + 1
        p2 = v[spill] << (64 + s1[spill]).astype(np.uint64)  # s1 in [-63,-1]
        b2 = np.flatnonzero(np.r_[True, sl[1:] != sl[:-1]])
        lanes[sl[b2]] |= np.bitwise_or.reduceat(p2, b2)
    nbytes = (total + 7) >> 3
    return lanes.byteswap().tobytes()[:nbytes]


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
    """Word-buffered MSB-first reader: refills an accumulator 8 bytes at a
    time (one ``int.from_bytes`` per 64 bits instead of per-byte loops), so
    short control-prefix reads are a shift+mask."""

    __slots__ = ("_data", "_pos", "_acc", "_n")

    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0  # byte position of the next refill
        self._acc = 0
        self._n = 0  # bits currently buffered in _acc

    def read(self, bits: int) -> int:
        acc = self._acc
        n = self._n
        while n < bits:
            chunk = self._data[self._pos : self._pos + 8]
            if not chunk:
                raise EOFError("bit stream exhausted")
            acc = (acc << (8 * len(chunk))) | int.from_bytes(chunk, "big")
            n += 8 * len(chunk)
            self._pos += len(chunk)
        shift = n - bits
        self._n = shift
        out = acc >> shift
        self._acc = acc & ((1 << shift) - 1)
        return out
