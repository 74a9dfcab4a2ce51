"""const_double_array / const_double_matrix: the one-py4j-call literal
builders must be BIT-identical to the per-element F.array(*[F.lit(...)])
construction they replace — including -0.0, denormals, extreme exponents —
and must fall back (not crash, not change type) on empties and
non-finite values."""

from __future__ import annotations

import math
import struct

import pytest
from pyspark.sql import functions as F

from ophidia_server_spark.functions.lits import (
    const_double_array,
    const_double_matrix,
)


def _bits(x: float) -> int:
    return struct.unpack("<Q", struct.pack("<d", x))[0]


CASES = [
    [0.0, -0.0, 1.0, -1.0],
    [0.1, 1 / 3, math.pi, -math.e],
    [1e-300, 5e-324, -2.5e17, 1e21, 9.007199254740993e15],
    [float(i) / 7 for i in range(64)],
]


@pytest.mark.parametrize("vals", CASES)
def test_const_double_array_bit_exact(spark, vals):
    df = spark.range(1)
    old = df.select(
        F.array(*[F.lit(float(v)) for v in vals]).alias("q")
    ).first()["q"]
    new = df.select(const_double_array(vals).alias("q")).first()["q"]
    assert [_bits(x) for x in old] == [_bits(x) for x in new]


def test_const_double_array_fallbacks(spark):
    df = spark.range(1)
    # empty: same per-element construction (array<void>), not a parse error
    assert df.select(const_double_array([]).alias("q")).first()["q"] == []
    # non-finite: falls back to F.lit elements and keeps the values
    got = df.select(
        const_double_array([float("inf"), float("-inf"), 1.5]).alias("q")
    ).first()["q"]
    assert got[0] == float("inf") and got[1] == float("-inf") and got[2] == 1.5
    nan = df.select(const_double_array([float("nan")]).alias("q")).first()["q"]
    assert math.isnan(nan[0])


def test_const_double_matrix_bit_exact(spark):
    mat = [[0.1, -0.0, 1e-300], [math.pi, 2 / 3, -4.25]]
    df = spark.range(1)
    old = df.select(
        F.array(*[F.array(*[F.lit(float(v)) for v in r]) for r in mat])
        .alias("m")
    ).first()["m"]
    new = df.select(const_double_matrix(mat).alias("m")).first()["m"]
    assert [[_bits(x) for x in r] for r in old] == [
        [_bits(x) for x in r] for r in new
    ]
