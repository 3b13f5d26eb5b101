"""litfast.array_lit must be a drop-in for F.lit(nested_list): the
same values bit-for-bit, the same data type, and loud failures on the
components it refuses (non-finite floats, bools, empties)."""

import math
import struct

import pytest
from pyspark.sql import functions as F

from certa_spark.functions.litfast import array_lit


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


def test_nested_double_bit_identity(spark):
    vals = [
        [1e-17, -0.0, 3.141592653589793, 2.2250738585072014e-308],
        [1.0, -1.0, 0.1, 123456789.123456789],
        [5e-324, -5e-324, 1.7976931348623157e308, 0.5],
    ]
    row = (
        spark.range(1)
        .select(F.lit(vals).alias("a"), array_lit(vals).alias("b"))
        .first()
    )
    for i, sub in enumerate(vals):
        for j, _ in enumerate(sub):
            assert _bits(row["a"][i][j]) == _bits(row["b"][i][j]), (i, j)


def test_dtype_matches_f_lit(spark):
    vals = [[[1.0, 2.0], [3.0, 4.0]], [[5.0, 6.0], [7.0, 8.0]]]
    df = spark.range(1).select(
        F.lit(vals).alias("a"), array_lit(vals).alias("b")
    )
    assert df.schema["a"].dataType == df.schema["b"].dataType


def test_int_and_string_components(spark):
    ints = [1, -7, 2**60]
    strs = ["plain", "it's", 'back\\slash', "tab\tand'quote"]
    row = (
        spark.range(1)
        .select(
            F.lit(ints).alias("ia"),
            array_lit(ints).alias("ib"),
            F.lit(strs).alias("sa"),
            array_lit(strs).alias("sb"),
        )
        .first()
    )
    assert list(row["ia"]) == list(row["ib"]) == ints
    assert list(row["sa"]) == list(row["sb"]) == strs


def test_refusals():
    with pytest.raises(ValueError):
        array_lit([[math.nan]])
    with pytest.raises(ValueError):
        array_lit([[math.inf]])
    with pytest.raises(ValueError):
        array_lit([])
    with pytest.raises(TypeError):
        array_lit([True])
    with pytest.raises(TypeError):
        array_lit(3.0)
