"""The reference's OWN test expectations (test/step0_test.py:30-39) must
hold for our coercion columns — including the substring quirk of its
to_bool (src/modules/step0/00_type_utils.py:19-23)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dd_ops_ocr_spark.operators.typeutils import (
    coerce_bool,
    coerce_float,
    coerce_int,
)


def _eval(spark, raws, col):
    df = spark.createDataFrame([(r,) for r in raws], "raw string")
    return [r[0] for r in df.select(col(F.col("raw"))).collect()]


def test_reference_own_assertions(spark):
    # test/step0_test.py:30-39, string-typed inputs
    assert _eval(spark, ["true"], coerce_bool) == [True]
    assert _eval(spark, ["false"], coerce_bool) == [False]
    assert _eval(spark, ["1"], lambda c: coerce_int(c)) == [1]
    assert _eval(spark, ["0"], lambda c: coerce_int(c)) == [0]
    assert _eval(spark, ["123"], lambda c: coerce_int(c)) == [123]
    assert _eval(spark, ["123.45"], lambda c: coerce_int(c)) == [123]
    assert _eval(spark, [None], lambda c: coerce_int(c, 999)) == [999]
    assert _eval(spark, ["123.45"], lambda c: coerce_float(c)) == [123.45]
    assert _eval(spark, [None], lambda c: coerce_float(c, 999.0)) == [999.0]


def test_reference_substring_quirk(spark):
    """`if s in ("true")` is a substring test in the reference; we
    reproduce it faithfully."""
    assert _eval(spark, ["r", "", "ue", "tru"], coerce_bool) == [
        True, True, True, True,
    ]
    assert _eval(spark, ["als", "fal"], coerce_bool) == [False, False]
    assert _eval(spark, ["xyz"], coerce_bool) == [False]


def test_truncation_toward_zero(spark):
    assert _eval(spark, ["-2.7", "2.7"], lambda c: coerce_int(c)) == [-2, 2]
