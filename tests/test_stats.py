"""Exact group quantiles (operators/stats.py)."""

from __future__ import annotations

from dd_ops_ocr_spark.operators.stats import group_quantiles


def _df(spark, rows):
    return spark.createDataFrame(rows, "grp string, value double")


def test_interpolated_quantiles_exact(spark):
    # group a: sorted [1, 2, 3, 10] -> p50 = 2 + 0.5*(3-2) = 2.5;
    # p95 at rank 0.95*(4-1)=2.85 -> 3 + 0.85*(10-3) = 8.95
    rows = [("a", 1.0), ("a", 3.0), ("a", 2.0), ("a", 10.0), ("b", 7.0)]
    out = {r["grp"]: r for r in group_quantiles(_df(spark, rows), "grp", "value").collect()}
    assert out["a"]["n"] == 4 and out["a"]["v_sum"] == 16.0
    assert out["a"]["p50"] == 2.5
    assert abs(out["a"]["p95"] - 8.95) < 1e-12
    # single-value group: every quantile is that value
    assert out["b"]["p50"] == 7.0 and out["b"]["p95"] == 7.0


def test_odd_count_median_is_middle(spark):
    rows = [("a", 5.0), ("a", 1.0), ("a", 9.0)]
    out = group_quantiles(_df(spark, rows), "grp", "value").collect()[0]
    assert out["p50"] == 5.0
