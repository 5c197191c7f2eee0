"""NumberTools lexicographic long encoding (Document/NumberTools.cs):
reference golden constants, order preservation, round-trip, and
scalar==column parity."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucenenet_spark.functions.numbertools import (
    MAX_STRING_VALUE, MIN_STRING_VALUE, STR_SIZE, long_to_string,
    long_to_string_col, string_to_long, string_to_long_col)

I64 = st.integers(-(1 << 63), (1 << 63) - 1)


def test_reference_golden_constants():
    """MIN/MAX_STRING_VALUE transcribed from NumberTools.cs:62,69."""
    assert long_to_string(-(1 << 63)) == MIN_STRING_VALUE == "-0000000000000"
    assert long_to_string((1 << 63) - 1) == MAX_STRING_VALUE == "01y2p0ij32e8e7"
    assert long_to_string(0) == "00000000000000"
    assert len(MIN_STRING_VALUE) == STR_SIZE


@given(I64, I64)
@settings(max_examples=300, deadline=None)
def test_order_preserved(a, b):
    sa, sb = long_to_string(a), long_to_string(b)
    assert (a < b) == (sa < sb) and (a == b) == (sa == sb)


@given(I64)
@settings(max_examples=300, deadline=None)
def test_roundtrip(l):
    assert string_to_long(long_to_string(l)) == l


def test_bad_strings_rejected():
    with pytest.raises(ValueError):
        string_to_long("too short")
    with pytest.raises(ValueError):
        string_to_long("X0000000000000")  # bad prefix


def test_column_expr_matches_scalar(spark):
    vals = [-(1 << 63), -(1 << 62), -37, -1, 0, 1, 35, 36, 12345,
            (1 << 62), (1 << 63) - 1]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    rows = (df.select("v", long_to_string_col(df.v).alias("s"))
            .withColumn("back", string_to_long_col("s"))  # type: ignore
            .collect())
    for r in rows:
        assert r["s"] == long_to_string(r["v"])
        assert r["back"] == r["v"]
