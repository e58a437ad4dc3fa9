"""DoD + Gorilla codecs: round-trip, property, and golden byte vectors.

Mirrors the reference's table-driven unit-test style
(/root/reference/internal/messages/sql_test.go golden JSON/YAML strings).
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mq_to_db_ray.functions.dod import dod_decode, dod_encode
from mq_to_db_ray.functions.gorilla import gorilla_decode, gorilla_encode

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@pytest.mark.parametrize(
    "values",
    [
        [],
        [0],
        [42],
        [-1],
        [2**63 - 1, -(2**63), 0],
        [5, 5, 5, 5],
        [1, 2, 3, 4, 5],
        [1000, 940, 880, 820],  # constant delta -> all '0' bits
        [0, 64, 128, 64, -63],
        list(range(0, 100000, 997)),
    ],
)
def test_dod_roundtrip(values):
    assert dod_decode(dod_encode(values)) == values


@given(st.lists(I64, max_size=200))
@settings(max_examples=200, deadline=None)
def test_dod_roundtrip_property(values):
    assert dod_decode(dod_encode(values)) == values


def test_dod_compresses_regular_series():
    # A regular counter (constant delta) must cost ~1 bit per point.
    values = list(range(0, 600000, 60))
    blob = dod_encode(values)
    assert len(blob) < 4 + 8 + 2 + len(values) // 8 + 8


def test_dod_golden_bytes():
    # Hand-derived: n=3, first=1000 (64b), deltas -60,-60 -> dod -60 ('10'+7b),
    # then dod 0 ('0').  Committed golden hex — codec must stay bit-exact.
    assert dod_encode([1000, 940, 880]).hex() == (
        "00000003" + "00000000000003e8" + "8180"
    )
    assert dod_encode([]).hex() == "00000000"
    assert dod_encode([-1]).hex() == "00000001" + "ffffffffffffffff"


@pytest.mark.parametrize(
    "values",
    [
        [],
        [0.0],
        [12.0, 12.0, 12.0],
        [12.0, 24.0, 15.0, 12.0, 35.0],
        [1.5, -1.5, float("inf"), float("-inf")],
        [0.1 * i for i in range(100)],
    ],
)
def test_gorilla_roundtrip(values):
    assert gorilla_decode(gorilla_encode(values)) == values


def test_gorilla_nan_roundtrip():
    out = gorilla_decode(gorilla_encode([1.0, float("nan"), 2.0]))
    assert out[0] == 1.0 and math.isnan(out[1]) and out[2] == 2.0


@given(st.lists(st.floats(allow_nan=False), max_size=200))
@settings(max_examples=200, deadline=None)
def test_gorilla_roundtrip_property(values):
    assert gorilla_decode(gorilla_encode(values)) == values


def test_gorilla_repeated_values_compress():
    values = [7.25] * 1000
    blob = gorilla_encode(values)
    # 4 count + 8 first + ~999 single '0' bits
    assert len(blob) <= 4 + 8 + 999 // 8 + 2


def test_gorilla_golden_bytes():
    # n=2, first=12.0; 24.0 differs in one exponent bit:
    # bits(12)=0x4028..., bits(24)=0x4038..., xor=0x0010_0000_0000_0000
    # lead=11, mlen=1 -> bits '11 01011 000000 1' + 2 pad = 0xd6 0x04
    assert gorilla_encode([12.0, 24.0]).hex() == (
        "00000002" + "4028000000000000" + "d604"
    )


def test_encoders_on_generated_series(f1_micro):
    # The real use: per-source sum_n_tok series from the fixture.
    import pyarrow.compute as pc

    t = f1_micro
    mask = pc.equal(t["source"], "s03")
    n = t.filter(mask)["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
    vals = [int(x) for x in n]
    assert dod_decode(dod_encode(vals)) == vals
    f = [float(x) for x in n]
    assert gorilla_decode(gorilla_encode(f)) == f
