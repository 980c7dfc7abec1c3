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


def test_cardinality_exact(spark):
    from dd_ops_ocr_spark.operators.stats import group_cardinality

    rows = [("a", 1), ("a", 1), ("a", 2), ("b", 9)]
    df = spark.createDataFrame(rows, "grp string, k long")
    out = {r.grp: r for r in group_cardinality(df, "grp", "k").collect()}
    assert (out["a"].n_rows, out["a"].n_distinct) == (3, 2)
    assert (out["b"].n_rows, out["b"].n_distinct) == (1, 1)


def test_approx_cardinality_within_hll_bound(spark):
    """The production twin (approx_count_distinct, HLL++) must land
    within a generous multiple of its rsd on the same plan — pinning
    the audit relationship the exact op documents."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_SMOKE

    from dd_ops_ocr_spark.operators.stats import group_cardinality

    e = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    exact = {
        r.grp: r.n_distinct
        for r in group_cardinality(e, "event_type", "user_id").collect()
    }
    approx = {
        r.grp: r.n_approx
        for r in e.groupBy(F.col("event_type").alias("grp"))
        .agg(F.approx_count_distinct("user_id", rsd=0.05).alias("n_approx"))
        .collect()
    }
    assert set(approx) == set(exact)
    for g, n in exact.items():
        assert abs(approx[g] - n) <= max(3, 0.2 * n), (g, n, approx[g])


def test_histogram_bins_and_cap(spark):
    from dd_ops_ocr_spark.operators.stats import group_histogram

    rows = [
        ("a", 0.01),    # bin 0
        ("a", 49.99),   # bin 0 (4999 cents // 5000)
        ("a", 50.00),   # bin 1 boundary lands UP
        ("a", 7777.0),  # far past the last edge -> capped bin 9
        ("b", 125.0),   # bin 2
    ]
    df = spark.createDataFrame(rows, "grp string, value double")
    got = {(r.grp, r.bin): r.n for r in group_histogram(df, "grp", "value").collect()}
    assert got == {("a", 0): 2, ("a", 1): 1, ("a", 9): 1, ("b", 2): 1}


def test_histogram_negative_values_floor_to_own_bins(spark):
    """Negatives must NOT silently merge into bin 0: floor division
    sends -25.00 to bin -1 and -50.01 to bin -2, keeping the shape
    visible (cast-truncation toward zero would fold them into [0,50))."""
    from dd_ops_ocr_spark.operators.stats import group_histogram

    rows = [
        ("a", -25.00),   # -2500 cents -> floor(-0.5) = bin -1
        ("a", -50.00),   # exactly one width below zero -> bin -1
        ("a", -50.01),   # just past the edge -> bin -2
        ("a", 0.00),     # bin 0 stays pure
    ]
    df = spark.createDataFrame(rows, "grp string, value double")
    got = {(r.grp, r.bin): r.n for r in group_histogram(df, "grp", "value").collect()}
    assert got == {("a", -1): 2, ("a", -2): 1, ("a", 0): 1}


def test_outliers_integer_verdict_matches_float_referee(spark):
    """The integer inequality must agree with the textbook float
    z-score on a corpus where the boundary is exercised."""
    import math
    import random

    from dd_ops_ocr_spark.operators.stats import value_outliers

    rng = random.Random(7)
    rows = [(i, "g", round(rng.gauss(100.0, 10.0), 2)) for i in range(500)]
    rows += [(1000, "g", 500.0), (1001, "g", -300.0)]  # planted outliers
    df = spark.createDataFrame(rows, "event_id long, grp string, value double")
    got = {r.event_id for r in value_outliers(df, "grp", "value").collect()}
    # float referee (population stddev, cents domain)
    cents = [round(v * 100) for _, _, v in rows]
    n = len(cents)
    mu = sum(cents) / n
    sd = math.sqrt(sum((c - mu) ** 2 for c in cents) / n)
    ref = {eid for (eid, _, v) in rows if abs(round(v * 100) - mu) > 3 * sd}
    assert got == ref
    assert {1000, 1001} <= got


def test_outliers_group_isolation(spark):
    """An extreme value in one group never flags rows in another."""
    from dd_ops_ocr_spark.operators.stats import value_outliers

    rows = [(i, "a", 10.0 + (i % 3)) for i in range(60)]
    rows += [(100, "a", 9000.0)]
    rows += [(200 + i, "b", 10.0 + (i % 3)) for i in range(60)]
    df = spark.createDataFrame(rows, "event_id long, grp string, value double")
    got = {r.event_id for r in value_outliers(df, "grp", "value").collect()}
    assert got == {100}


def test_rollup_report_levels_and_reconciliation(spark):
    """lvl disambiguates subtotal NULLs from data NULLs; every subtotal
    must equal the sum of its leaf cells, and the grand total the sum
    of everything — the hierarchy invariant ROLLUP promises."""
    from pyspark.sql import functions as F

    from dd_ops_ocr_spark.operators.stats import rollup_report

    rows = [
        ("a", 1, 10.00), ("a", 1, 2.50), ("a", 2, 1.00),
        ("b", 1, 5.00), ("b", 3, 0.25),
    ]
    df = spark.createDataFrame(rows, "et string, d long, value double")
    got = {
        (r.d1, r.day, r.lvl): (r.n, r.v_cents)
        for r in rollup_report(df, "et", F.col("d"), "value").collect()
    }
    # leaves (lvl 0)
    assert got[("a", 1, 0)] == (2, 1250)
    assert got[("a", 2, 0)] == (1, 100)
    assert got[("b", 1, 0)] == (1, 500)
    assert got[("b", 3, 0)] == (1, 25)
    # per-type subtotals (lvl 1: day aggregated away)
    assert got[("a", None, 1)] == (3, 1350)
    assert got[("b", None, 1)] == (2, 525)
    # grand total (lvl 3)
    assert got[(None, None, 3)] == (5, 1875)
    assert len(got) == 7


def test_gap_fill_plants_zero_days(spark):
    """Missing (dim, day) cells must surface as explicit zero rows over
    the GLOBAL day extent — including a dim entirely absent on days
    only other dims cover."""
    from pyspark.sql import functions as F

    from dd_ops_ocr_spark.operators.stats import timeseries_gap_fill

    rows = [("a", 10), ("a", 10), ("a", 13), ("b", 11)]
    df = spark.createDataFrame(rows, "et string, d long")
    got = {
        (r.d1, r.day): r.n
        for r in timeseries_gap_fill(df, "et", F.col("d")).collect()
    }
    assert len(got) == 8  # 2 dims x days 10..13
    assert got[("a", 10)] == 2 and got[("a", 13)] == 1
    assert got[("a", 11)] == 0 and got[("a", 12)] == 0  # a's gap
    assert got[("b", 11)] == 1
    # b exists only on day 11 but gets the full global extent
    assert got[("b", 10)] == 0 and got[("b", 12)] == 0 and got[("b", 13)] == 0


def test_table_profile_nulls_distinct_bounds(spark):
    """Null counts, exact distincts, and lexicographic bounds over the
    string rendering; a fully-null column keeps NULL min/max and zero
    distincts."""
    from dd_ops_ocr_spark.operators.stats import table_profile

    rows = [
        (1, "a", None), (2, "b", None), (2, None, None), (10, "a", None),
    ]
    df = spark.createDataFrame(rows, "k long, s string, z string")
    got = {r.column: r for r in table_profile(df, ("k", "s", "z")).collect()}
    assert got["k"].n_rows == 4 and got["k"].n_null == 0
    assert got["k"].n_distinct == 3
    # lexicographic over STRINGS: "10" < "2"
    assert (got["k"].min_str, got["k"].max_str) == ("1", "2")
    assert got["s"].n_null == 1 and got["s"].n_distinct == 2
    assert (got["s"].min_str, got["s"].max_str) == ("a", "b")
    assert got["z"].n_null == 4 and got["z"].n_distinct == 0
    assert got["z"].min_str is None and got["z"].max_str is None


def test_hopping_counts_window_membership(spark):
    """Every event lands in exactly WIN/SLIDE hop windows; an event on
    an exact hop boundary belongs to the window STARTING there and not
    to the one ENDING there (start-inclusive, end-exclusive)."""
    from dd_ops_ocr_spark.operators.stats import (
        HOP_SLIDE_MIN,
        HOP_WIN_MIN,
        hopping_counts,
    )

    rows = [
        (1, "a", "2024-01-01 10:07:00"),   # mid-window event
        (2, "a", "2024-01-01 11:00:00"),   # exact hop boundary
    ]
    df = spark.createDataFrame(rows, "event_id long, et string, ts string")
    got = {(r.d1, r.win_start_us): r.n
           for r in hopping_counts(df, "et").collect()}
    per_event = HOP_WIN_MIN // HOP_SLIDE_MIN
    assert sum(got.values()) == 2 * per_event
    h11 = 1704106800000000  # 2024-01-01 11:00:00 UTC in micros
    # boundary event: member of [11:00, 12:00) ...
    assert got[("a", h11)] >= 1
    # ... but NOT of [10:00, 11:00) (end-exclusive)
    h10 = h11 - 3600 * 1_000_000
    assert ("a", h10) in got and got[("a", h10)] == 1  # only event 1


def test_equidepth_ntile_split_and_edges(spark):
    """Standard NTILE split (first n MOD k tiles get the extra row)
    with deterministic tie order; bucket edges are the min/max cents."""
    from dd_ops_ocr_spark.operators.stats import equidepth_profile

    # 6 rows, k=4 -> tiles of 2,2,1,1
    rows = [(i, "g", v) for i, v in enumerate([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])]
    df = spark.createDataFrame(rows, "event_id long, d string, value double")
    got = {r.tile: (r.n, r.lo_cents, r.hi_cents)
           for r in equidepth_profile(df, "d", "value").collect()}
    assert got == {1: (2, 100, 200), 2: (2, 300, 400),
                   3: (1, 500, 500), 4: (1, 600, 600)}


def test_pivot_counts_dense_and_ordered(spark):
    """Absent (row, value) combinations are 0, never null, and pinned
    values control the schema — no hidden distinct pass."""
    from dd_ops_ocr_spark.operators.stats import pivot_counts

    df = spark.createDataFrame(
        [("a", "F"), ("a", "F"), ("a", "O"), ("b", "P")],
        "k string, s string",
    )
    wide = pivot_counts(df, "k", "s", ["F", "O", "P"])
    assert wide.columns == ["k", "n_f", "n_o", "n_p"]
    got = {r.k: (r.n_f, r.n_o, r.n_p) for r in wide.collect()}
    assert got == {"a": (2, 1, 0), "b": (0, 0, 1)}


def test_pivot_plan_single_exchange(spark):
    """Pinned pivot values compile to one groupBy exchange of
    conditional partial aggregates — same cost model as a plain
    groupBy, no collect-distinct job, no join."""
    from tests.conftest import SF_SMOKE

    from dd_ops_ocr_spark.operators.stats import q_status_pivot

    plan = q_status_pivot(spark, SF_SMOKE)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
