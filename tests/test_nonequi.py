"""As-of join + interval (range) join (operators/nonequi.py)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from dd_ops_ocr_spark.operators.nonequi import asof_join, interval_join


def _ts(s):
    return datetime.fromisoformat(s)


def _left(spark):
    return spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-05")),
            (2, 100, _ts("2024-01-10")),
            (3, 100, _ts("2024-01-15")),
            (4, 200, _ts("2024-01-02")),  # before every snapshot of 200
        ],
        "event_id long, user_id long, ts timestamp",
    )


def _right(spark):
    return spark.createDataFrame(
        [
            (100, _ts("2024-01-01"), 1),
            (100, _ts("2024-01-10"), 2),  # equal-ts: must match inclusively
            (200, _ts("2024-01-03"), 9),
        ],
        "user_id long, snap_ts timestamp, tier int",
    )


def test_asof_picks_latest_at_or_before(spark):
    out = {
        r["event_id"]: (r["tier"], r["snap_ts"])
        for r in asof_join(
            _left(spark), _right(spark), "user_id", "ts", "snap_ts", ["tier"]
        ).collect()
    }
    assert out[1] == (1, _ts("2024-01-01"))
    assert out[2] == (2, _ts("2024-01-10"))  # inclusive at equal ts
    assert out[3] == (2, _ts("2024-01-10"))
    assert out[4] == (None, None)  # no snapshot precedes -> left semantics


def test_asof_no_nested_loop_join(spark):
    plan = (
        asof_join(_left(spark), _right(spark), "user_id", "ts", "snap_ts", ["tier"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the whole point: union+window, never a join operator at all
    assert "Join" not in plan and "CartesianProduct" not in plan


def _bands(spark):
    return spark.createDataFrame(
        [(0.0, 10.0, "low"), (10.0, 100.0, "mid"), (100.0, 1000.0, "high")],
        "lo double, hi double, label string",
    )


def test_interval_join_boundaries(spark):
    rows = spark.createDataFrame(
        [(1, 0.0), (2, 9.99), (3, 10.0), (4, 99.9), (5, 100.0), (6, 999.9), (7, 1000.0)],
        "event_id long, value double",
    )
    got = {
        r["event_id"]: r["label"]
        for r in interval_join(rows, _bands(spark), "value", step=25.0).collect()
    }
    # lo inclusive, hi exclusive; 1000.0 beyond the last band drops out
    assert got == {1: "low", 2: "low", 3: "mid", 4: "mid", 5: "high", 6: "high"}


def test_interval_join_is_hash_join(spark):
    rows = spark.createDataFrame([(1, 5.0)], "event_id long, value double")
    plan = (
        interval_join(rows, _bands(spark), "value", step=25.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_join_wide_interval_many_bins(spark):
    # the "high" band covers 36 bins at step 25 — the bin explosion must
    # not duplicate matches (one row per (row, interval) pair)
    rows = spark.createDataFrame(
        [(1, 150.0), (2, 999.0)], "event_id long, value double"
    )
    out = interval_join(rows, _bands(spark), "value", step=25.0).collect()
    assert sorted((r["event_id"], r["label"]) for r in out) == [
        (1, "high"),
        (2, "high"),
    ]


def test_asof_multiple_attrs_and_key_isolation(spark):
    right = spark.createDataFrame(
        [(100, _ts("2024-01-01"), 1, "a"), (300, _ts("2024-01-01"), 7, "z")],
        "user_id long, snap_ts timestamp, tier int, grade string",
    )
    out = {
        r["event_id"]: (r["tier"], r["grade"])
        for r in asof_join(
            _left(spark), right, "user_id", "ts", "snap_ts", ["tier", "grade"]
        ).collect()
    }
    # user 100 sees only its own snapshots; user 200 has none (300's
    # must not leak across keys)
    assert out[1] == (1, "a") and out[4] == (None, None)
